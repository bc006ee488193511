"""foreachBatch ledger-upsert sink: micro-batched MERGE, idempotent
replay, within-batch version dedupe."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from database_migration_engine_spark import schemas
from database_migration_engine_spark.executor.orchestrator import ParquetLedger
from database_migration_engine_spark.streaming import sink as SK

from .conftest import SF_DIR


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="dbmig_sink_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _ledger_rows_sql(spark, rows: list[tuple[str, str, str]]):
    """(version, filename, status) → SCHEMA_MIGRATIONS-shaped DataFrame
    via an inline VALUES relation."""
    values = ",".join(
        f"('{v}', '{f}', 'cs-{v}', TIMESTAMP '2026-01-01 00:00:00',"
        f" CAST(5 AS INT), '{s}')"
        for v, f, s in rows
    )
    return spark.sql(
        f"SELECT * FROM (VALUES {values}) AS t"
        "(version, filename, checksum, applied_at, duration_ms, status)"
    )


def test_ledger_upsert_sink_merges_batches(spark, tmpdir):
    src = os.path.join(tmpdir, "incoming")
    os.makedirs(src)
    # two input files → two micro-batches (maxFilesPerTrigger=1)
    _ledger_rows_sql(
        spark, [("001", "V001.up.sql", "applied"), ("002", "V002.up.sql", "applied")]
    ).coalesce(1).write.parquet(os.path.join(src, "batch_a"))
    _ledger_rows_sql(
        spark, [("003", "V003.up.sql", "applied")]
    ).coalesce(1).write.parquet(os.path.join(src, "batch_b"))

    ledger = ParquetLedger(spark, os.path.join(tmpdir, "ledger"))
    stream = (
        spark.readStream.schema(schemas.SCHEMA_MIGRATIONS)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    n_batches = SK.run_ledger_upsert(stream, ledger)
    assert n_batches >= 1
    got = {
        (r.version, r.filename, r.status) for r in ledger.df().collect()
    }
    assert got == {
        ("001", "V001.up.sql", "applied"),
        ("002", "V002.up.sql", "applied"),
        ("003", "V003.up.sql", "applied"),
    }

    # replaying the same input is idempotent (at-least-once safety)
    stream2 = (
        spark.readStream.schema(schemas.SCHEMA_MIGRATIONS).parquet(src + "/*")
    )
    SK.run_ledger_upsert(stream2, ledger)
    assert {
        (r.version, r.filename, r.status) for r in ledger.df().collect()
    } == got


def test_sink_dedupes_versions_within_batch(spark, tmpdir):
    ledger = ParquetLedger(spark, os.path.join(tmpdir, "ledger"))
    ledger.ensure()
    src = os.path.join(tmpdir, "incoming")
    os.makedirs(src)
    _ledger_rows_sql(
        spark,
        [("001", "V001_a.up.sql", "applied"), ("001", "V001_b.up.sql", "applied")],
    ).coalesce(1).write.parquet(os.path.join(src, "batch"))
    stream = (
        spark.readStream.schema(schemas.SCHEMA_MIGRATIONS).parquet(src + "/*")
    )
    SK.run_ledger_upsert(stream, ledger)
    rows = ledger.df().collect()
    assert len(rows) == 1
    # deterministic winner: greatest filename
    assert rows[0].filename == "V001_b.up.sql"


def test_checkpoint_restart_exactly_once(spark, tmp_path):
    """Fault-tolerance contract: a file-source → parquet-sink stream with
    a checkpoint processes each input file exactly once across restarts.
    Run 1 drains file A; file B arrives; run 2 (same checkpoint) must
    pick up ONLY file B; run 3 with no new data must add nothing. The
    final sink equals the batch union with no duplicates — this is the
    recovery semantics a multi-hour 100 TB ingest depends on."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    from database_migration_engine_spark.io import read_table

    src = read_table(spark, SF_DIR, "events").select("event_id", "user_id")
    half_a = src.filter("event_id % 2 = 0").toPandas()
    half_b = src.filter("event_id % 2 = 1").toPandas()
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    pq.write_table(pa.Table.from_pandas(half_a), str(in_dir / "a.parquet"))

    def run_once():
        stream = (
            spark.readStream.schema("event_id long, user_id long")
            .parquet(str(in_dir))
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(sink).count()
    assert n1 == len(half_a)

    pq.write_table(pa.Table.from_pandas(half_b), str(in_dir / "b.parquet"))
    run_once()
    out2 = spark.read.parquet(sink)
    assert out2.count() == len(half_a) + len(half_b)
    # exactly-once: no event duplicated across the restart boundary
    assert out2.select("event_id").distinct().count() == out2.count()

    run_once()  # no new data: idempotent
    assert spark.read.parquet(sink).count() == len(half_a) + len(half_b)
