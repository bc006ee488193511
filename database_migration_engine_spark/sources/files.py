"""File-format sources/sinks beyond parquet: CSV, JSON-lines, and the
partitioned-parquet ETL load path.

The reference reads only ``.sql`` text files (SURVEY.md §2.A S1–S3); an
ETL engine needs the standard interchange formats on both ends. Rules
that hold at 100 TB:

* **Explicit schemas, never inference.** Schema inference is an extra
  full pass over the data and can flip types between runs; every reader
  here requires a ``StructType``.
* **Partitioned layout is the load-side contract.** ``partitionBy``
  columns become directory keys (``col=value/``), which is what makes
  downstream partition pruning possible; ``maxRecordsPerFile`` bounds
  file sizes so a skewed partition cannot produce one giant file.
* **Sort within partitions before writing** when downstream scans filter
  on a secondary column — parquet min/max row-group stats only prune if
  the writer clustered the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV with an explicit schema (no inference pass, no type drift)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "FAILFAST")  # malformed rows fail loudly, not NULL
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines with an explicit schema; unknown fields are dropped,
    missing ones become NULL (standard semi-structured contract)."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    max_records_per_file: int = 5_000_000,
) -> None:
    """Partitioned parquet load: directory-keyed on ``partition_cols``
    (enables partition pruning), optionally clustered on ``sort_cols``
    (enables row-group stat pruning), file sizes bounded."""
    out = df
    if sort_cols:
        out = out.sortWithinPartitions(*partition_cols, *sort_cols)
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_orc(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """ORC reader (explicit schema, same contract as read_csv/read_jsonl).
    ORC carries the same columnar pushdown/pruning properties as parquet
    (predicate pushdown into stripes, column projection), so the scan
    behavior documented for parquet holds unchanged."""
    return spark.read.schema(schema).orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC writer — the interchange format for Hive-lineage warehouses."""
    df.write.mode("overwrite").orc(path)
