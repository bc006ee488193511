"""Migration-directory source: versioned .sql files → migrations DataFrame.

Spark-first form of the reference's loader (S1–S3, SURVEY.md §2.A):
``spark.read.format("text").option("wholetext", true)`` over the directory,
filename features via ``regexp_extract`` on ``input_file_name()``, up/down
pairing via groupBy+pivot, orphan down-files dropped, content trimmed,
SHA-256 checksum via ``sha2``.

Filename grammar (reference internal/migration/loader.go:15-30):
``^(?:V(\\d+)|(\\d{14}))_(.+)\\.(up|down)\\.sql$`` — a ``V``-prefixed
numeric version or a 14-digit timestamp, an underscore, a name, and the
direction. Non-matching files are silently skipped; versions sort
lexicographically as strings (reference internal/migration/sorter.go:7-16).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# basename pattern; group 1 = V-version digits, 2 = timestamp version,
# 3 = name, 4 = direction
FILE_RE = r"^(?:V(\d+)|(\d{14}))_(.+)\.(up|down)\.sql$"


def load_from_dir(spark: SparkSession, directory: str) -> DataFrame:
    """Scan a migrations directory into the canonical migrations schema.

    Wholetext read keeps one row per file (a migration file is a unit, not
    lines); at scale this is a listing-bound operation — thousands of tiny
    files, driver lists once, executors read in parallel.
    """
    files = (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(f"{directory}/*.sql")
        .select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("fname"),
            F.col("value").alias("content"),
        )
    )
    parsed = files.select(
        "fname",
        "content",
        F.regexp_extract("fname", FILE_RE, 1).alias("v_num"),
        F.regexp_extract("fname", FILE_RE, 2).alias("v_ts"),
        F.regexp_extract("fname", FILE_RE, 3).alias("name"),
        F.regexp_extract("fname", FILE_RE, 4).alias("direction"),
    ).filter(F.col("direction") != "")  # non-matching files silently skipped
    keyed = parsed.select(
        F.when(F.col("v_num") != "", F.col("v_num"))
        .otherwise(F.col("v_ts"))
        .alias("version"),
        "name",
        "direction",
        # full whitespace trim (Spark's trim() strips only spaces; the
        # reference strips all whitespace, loader.go:100-131)
        F.regexp_replace(F.col("content"), r"^\s+|\s+$", "").alias("content"),
        "fname",
    )
    paired = (
        keyed.groupBy("version", "name")
        .pivot("direction", ["up", "down"])
        .agg(F.first("content"))
    )
    up_fname = F.concat(
        F.lit(""),
        F.when(
            F.length("version") == 14, F.col("version")
        ).otherwise(F.concat(F.lit("V"), F.col("version"))),
        F.lit("_"), F.col("name"), F.lit(".up.sql"),
    )
    return (
        # orphan .down.sql files (no matching up) are dropped
        # (reference internal/migration/loader.go:84-86)
        paired.filter(F.col("up").isNotNull())
        .select(
            "version",
            "name",
            F.col("up").alias("up_sql"),
            F.col("down").alias("down_sql"),
            F.sha2(F.col("up"), 256).alias("checksum"),
            F.concat(F.lit(f"{directory}/"), up_fname).alias("file_path"),
        )
        .orderBy("version")  # lexicographic string sort (P1)
    )
