"""Bucketed warehouse tables for shuffle-free co-located joins.

A join between two tables bucketed by the same key into the same bucket
count needs NO shuffle: each task reads matching buckets from both sides.
At 100 TB this converts the orders⋈lineitem fact-fact join — the dominant
shuffle in the TPC-H-shaped plans — into a scan-side merge, amortizing one
write-time shuffle across every subsequent join on that key.

Spark's bucketing requires ``saveAsTable`` (bucket metadata lives in the
catalog); tests point ``spark.sql.warehouse.dir`` at a tmpdir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    num_buckets: int = 16,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def bucketed_join_ready(
    spark: SparkSession, left_table: str, right_table: str
) -> bool:
    """True when both catalog tables exist (bucket co-location is then
    decided by Catalyst from their metadata)."""
    return spark.catalog.tableExists(left_table) and spark.catalog.tableExists(
        right_table
    )


def shuffle_free_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key. With equal
    bucket counts the physical plan has no Exchange on either side
    (asserted in tests via the explain string)."""
    return spark.table(left_table).join(spark.table(right_table), key)
