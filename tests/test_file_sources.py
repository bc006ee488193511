"""CSV / JSON-lines round-trips and the partitioned-parquet load path."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from database_migration_engine_spark.io import read_table
from database_migration_engine_spark.sources import files as FS

from .conftest import SF_DIR

SLIM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="dbmig_files_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _slim_events(spark):
    return read_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )


def _as_set(df):
    return {tuple(r) for r in df.collect()}


def test_csv_round_trip(spark, tmpdir):
    ev = _slim_events(spark)
    path = os.path.join(tmpdir, "ev_csv")
    FS.write_csv(ev, path)
    back = FS.read_csv(spark, path, SLIM_SCHEMA)
    assert back.schema == SLIM_SCHEMA
    assert _as_set(back) == _as_set(ev)


def test_jsonl_round_trip(spark, tmpdir):
    ev = _slim_events(spark)
    path = os.path.join(tmpdir, "ev_json")
    FS.write_jsonl(ev, path)
    back = FS.read_jsonl(spark, path, SLIM_SCHEMA)
    assert _as_set(back) == _as_set(ev)


def test_jsonl_missing_field_becomes_null(spark, tmpdir):
    ev = _slim_events(spark).drop("value")
    path = os.path.join(tmpdir, "ev_nofield")
    FS.write_jsonl(ev, path)
    back = FS.read_jsonl(spark, path, SLIM_SCHEMA)
    assert back.filter(F.col("value").isNotNull()).count() == 0
    assert back.count() == ev.count()


def test_partitioned_write_layout_and_pruning(spark, tmpdir):
    ev = _slim_events(spark)
    path = os.path.join(tmpdir, "ev_part")
    FS.write_partitioned(ev, path, ["event_type"], sort_cols=["user_id"])
    # directory keys per partition value
    kinds = {d for d in os.listdir(path) if d.startswith("event_type=")}
    assert kinds == {
        f"event_type={r.event_type}"
        for r in ev.select("event_type").distinct().collect()
    }
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    # a filter on the partition column prunes to one directory's files
    one = back.filter(F.col("event_type") == "click")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert one.count() == ev.filter(F.col("event_type") == "click").count()
