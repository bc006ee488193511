"""Streaming incremental dedup (r08, r07 verdict stretch item 8): the
index-maintaining foreachBatch pipeline must drain to EXACTLY the batch
dedup_incremental result, for any partitioning of the arrivals into
micro-batches — the exactness decomposition in streaming/dedup.py."""

from __future__ import annotations

from database_migration_engine_spark.io import read_table
from database_migration_engine_spark.streaming.dedup import (
    run_incremental_dedup_stream,
)

from .conftest import SF_DIR


def _batch_pairs(spark, sf_dir):
    from database_migration_engine_spark.plans import QUERIES

    return [
        tuple(r) for r in QUERIES["dedup_incremental"](spark, sf_dir).collect()
    ]


def test_incremental_dedup_stream_equals_batch(spark):
    from database_migration_engine_spark.plans import QUERIES

    got = [
        tuple(r)
        for r in QUERIES["dedup_incremental_stream"](spark, SF_DIR).collect()
    ]
    want = _batch_pairs(spark, SF_DIR)
    assert got == want
    assert len(got) > 0  # the mirror guarantees every new doc pairs


def test_incremental_dedup_stream_batch_partition_invariant(spark):
    """The drained pair set must not depend on how the stream chops the
    arrivals into micro-batches: 1 file (single batch, pure pairs1
    path) and 4 files paced 1 per trigger (4 batches, heavy pairs2
    path) both equal the batch result."""
    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    want = sorted(_batch_pairs(spark, SF_DIR))
    for n_files, per_trigger in [(1, 2), (4, 1)]:
        got = sorted(
            tuple(r)
            for r in run_incremental_dedup_stream(
                spark, docs, n_files=n_files, files_per_trigger=per_trigger
            ).collect()
        )
        assert got == want, (n_files, per_trigger)


def test_empty_drain_returns_typed_empty_frame(spark):
    """ADVICE r08: a drain that ships ZERO new documents must return an
    empty, correctly-typed frame instead of failing parquet schema
    inference over a data-file-less sink dir — the pairs read now uses
    an explicit schema (and falls back to a typed empty frame when no
    micro-batch ever fired). Note a drain with a NONEMPTY batch can
    never be zero-pair by design: every arriving doc collides with its
    own +1e6 mirror on all bands, so the empty-arrivals slice is the
    one reachable empty-sink scenario."""
    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    out = run_incremental_dedup_stream(spark, docs, new_min_id=10_000_000)
    assert out.columns == ["new_doc", "index_doc", "est_jaccard"]
    assert out.count() == 0


def test_probe_join_is_exchange_free_on_index_side(spark, tmp_path):
    """r09 verdict item 2 (plan-pinned): with the maintained index
    stored BUCKETED on the band join key, the per-batch probe join must
    shuffle ONLY the micro-batch side — exactly one Exchange in the
    physical plan, and the index side read through its bucketed scan.
    Exercises the drain's real writer (_write_bucketed) and join shape
    (_pairs)."""
    from pyspark.sql import functions as F

    from database_migration_engine_spark.streaming import dedup as SD

    docs = (
        read_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 200)
    )
    corpus_bands = SD._bands_of(docs.filter(F.col("doc_id") < 150))
    batch_bands = SD._bands_of(docs.filter(F.col("doc_id") >= 150))
    SD._write_bucketed(
        corpus_bands, "t_probe_sidx", str(tmp_path / "sidx"), "overwrite"
    )
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        corpus_b = spark.table("t_probe_sidx")
        # force the sort-merge shape: at fixture scale Spark happily
        # broadcasts the tiny batch side (zero band exchanges — also
        # fine), but the claim under test is the SCALE shape, where the
        # batch is too big to broadcast and the bucketed index side
        # must still elide ITS exchange
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = SD._pairs(batch_bands, corpus_b)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # exchanges ON THE BAND JOIN KEY: exactly one — the micro-batch
        # side; the index side must reach the join through its bucketed
        # scan. (The pair-dedup aggregation downstream exchanges on
        # (new_doc, index_doc) — a different key, not counted here.)
        n_band_exchanges = plan.count("Exchange hashpartitioning(band_id")
        assert n_band_exchanges == 1, plan
        assert "Bucketed: true" in plan, plan
        # and the join is correct, not just well-shaped: every batch
        # doc collides with SOME corpus doc only where bands agree —
        # spot-check against the unbucketed join
        unbucketed = SD._pairs(batch_bands, corpus_bands)
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, unbucketed.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.sql("DROP TABLE IF EXISTS t_probe_sidx")
