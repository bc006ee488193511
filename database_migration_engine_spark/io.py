"""Fixture-table readers.

Every read declares its schema from :mod:`schemas` — the reference never
infers schemas (SURVEY.md §1.3) and neither do we. Declared schemas also
make column pruning exact: a query touching 2 of lineitem's 11 columns
produces a parquet scan whose ReadSchema carries exactly those 2 columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from .schemas import EVENTS_RAW, TABLE_SCHEMAS

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = tuple(TABLE_SCHEMAS)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with its declared schema."""
    if name not in TABLE_SCHEMAS:
        raise KeyError(f"unknown fixture table {name!r}; one of {sorted(TABLE_SCHEMAS)}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events" and events_ts_unit(path) == "ns":
        # ts is parquet timestamp[ns]: read the raw int64 nanos and truncate
        # to microseconds with integer division (`div`, not `/` — ns since
        # 2024 exceeds double's 2^53 integer range), matching DuckDB's
        # ns→us truncation. The driver has shipped both ns and us fixtures
        # across rounds, so the unit is sniffed per file — assuming ns on a
        # us file silently shifts every timestamp to 1970 (r02 regression).
        return (
            spark.read.schema(EVENTS_RAW)
            .parquet(path)
            .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        )
    return spark.read.schema(TABLE_SCHEMAS[name]).parquet(path)


def events_ts_unit(path: str) -> str:
    """Physical unit of the events table's ts column ('ns' or 'us'),
    sniffed from parquet footer metadata (cheap: footer only, no data)."""
    import pyarrow.parquet as pq

    try:
        return pq.read_schema(path).field("ts").type.unit
    except Exception:
        return "us"


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql plans)."""
    for name in TABLE_SCHEMAS:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
