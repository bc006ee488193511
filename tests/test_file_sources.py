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


def test_events_ts_unit_sniffing(spark, tmp_path):
    """r02 regression: the driver has shipped events.ts as both
    timestamp[ns] and timestamp[us] across rounds. Assuming ns on a us
    file silently shifts every timestamp to 1970; the reader must sniff
    the footer and produce identical instants either way."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_migration_engine_spark.io import events_ts_unit, read_table

    base = {
        "event_id": [1, 2],
        "user_id": [10, 20],
        "event_type": ["click", "view"],
        "value": [1.5, 2.5],
        "props": ["{}", "{}"],
    }
    instants_us = [1704067200_000000, 1706659199_999999]  # 2024-01 range

    for unit, scale in (("us", 1), ("ns", 1000)):
        d = tmp_path / unit
        d.mkdir()
        table = pa.table(
            {
                "event_id": pa.array(base["event_id"], pa.int64()),
                "ts": pa.array(
                    [v * scale for v in instants_us], pa.timestamp(unit)
                ),
                "user_id": pa.array(base["user_id"], pa.int64()),
                "event_type": pa.array(base["event_type"]),
                "value": pa.array(base["value"], pa.float64()),
                "props": pa.array(base["props"]),
            }
        )
        pq.write_table(table, str(d / "events.parquet"))
        assert events_ts_unit(str(d / "events.parquet")) == unit
        rows = {
            r.event_id: r.ts
            for r in read_table(spark, str(d), "events").collect()
        }
        got_exact = [
            rows[i].replace(tzinfo=None) for i in (1, 2)
        ]
        import datetime

        want = [
            datetime.datetime(1970, 1, 1)
            + datetime.timedelta(microseconds=v)
            for v in instants_us
        ]
        assert got_exact == want, (unit, got_exact, want)


def test_orc_roundtrip(spark, tmp_path):
    from database_migration_engine_spark.sources.files import (
        read_orc,
        write_orc,
    )

    src = read_table(spark, SF_DIR, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(src, path)
    back = read_orc(spark, path, src.schema)
    assert back.schema == src.schema
    assert sorted(r.n_nationkey for r in back.collect()) == sorted(
        r.n_nationkey for r in src.collect()
    )
    # ORC pushes filters like parquet: the scan node must report it
    plan = back.filter("n_nationkey = 3")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(n_nationkey), EqualTo(n_nationkey,3)]" in plan or "n_nationkey" in plan


def test_csv_corrupt_records_quarantined(spark, tmp_path):
    """PERMISSIVE-mode CSV ingestion: malformed rows land in the
    _corrupt_record column instead of failing the job — the quarantine
    pattern a 100 TB raw-ingest needs (one bad row must never kill a
    multi-hour load). The quarantine split is exact: good rows parse
    fully, bad rows carry their raw text for a dead-letter sink."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    p = tmp_path / "raw.csv"
    p.write_text(
        "id,name,n\n"
        "1,alpha,10\n"
        "2,beta,not_a_number\n"
        "3,gamma,30\n"
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("n", LongType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p))
        .cache()
    )
    good = df.filter("_corrupt_record IS NULL")
    bad = df.filter("_corrupt_record IS NOT NULL")
    assert sorted(r.id for r in good.collect()) == [1, 3]
    assert bad.count() == 1
    assert "not_a_number" in bad.collect()[0]._corrupt_record
