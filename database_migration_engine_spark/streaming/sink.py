"""Streaming load path: foreachBatch upserts into the parquet ledger.

``foreachBatch`` hands each micro-batch to arbitrary batch code — the
standard Structured Streaming escape hatch for sinks with MERGE
semantics that no built-in sink offers (here: the reference's
INSERT … ON CONFLICT ledger upsert, tracker.go:96-113, applied
continuously instead of per CLI invocation).

Exactly-once story: foreachBatch is at-least-once across restarts, so
the handler MUST be idempotent — ours is, because the MERGE is keyed on
version and new-wins (replaying a batch rewrites identical rows). That
is the same idempotency-by-key design the batch orchestrator uses for
re-applied migrations (E2 skip semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..executor.orchestrator import ParquetLedger


def run_ledger_upsert(stream_df: DataFrame, ledger: ParquetLedger) -> int:
    """Drain all available input, merging every micro-batch into the
    ledger; returns the number of micro-batches processed. The ledger's
    single-writer contract holds: ONE streaming query owns the path."""
    ledger.ensure()
    batches = {"n": 0}

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # dedupe within the batch by version (ON CONFLICT is keyed);
        # deterministic winner: the lexicographically greatest filename
        # (orderBy+dropDuplicates would NOT guarantee the winner)
        w = Window.partitionBy("version").orderBy(F.desc("filename"))
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        ledger.merge_batch(latest)
        batches["n"] += 1

    query = (
        stream_df.writeStream.foreachBatch(handle)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return batches["n"]
