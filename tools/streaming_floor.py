"""Streaming cost-model sweep (r08 verdict item 7): for every streaming
query in the registry, measure

- the ZERO-DATA FLOOR: the same plan drained at sf0.001 (events 2,002
  rows, documents 500, assets unchanged — data volume ~0 relative to
  the bench SF), the generalization of the r07 copair floor experiment;
- the FULL-DATA cost at the bench SF (default sf0.1) — the difference
  is the data-dependent marginal cost;
- the drain shape: micro-batch count and per-operator state partition
  counts from the final StreamingQueryProgress, from which the commit
  slots per drain = Σ_ops (batches × partitions × internal stores per
  operator) — every state store commits once per micro-batch per
  partition, and a symmetric stream-stream join carries FOUR internal
  stores per partition (two keyToNumValues + two keyWithIndexToValue),
  everything else one (the SCALE.md arithmetic; ADVICE r09 — the tool
  previously omitted the multiplier and printed 16 where the table
  says 64). foreachBatch queries (dedup_incremental_stream) have no
  state stores; their per-batch commit cost is the offsets WAL + their
  own sink writes, reported as n_batches with state_ops
  "none (foreachBatch)".

n_batches comes from len(query.recentProgress), which Spark caps at
spark.sql.streaming.numRecentProgressUpdates (default 100); the
session below raises the retention so long drains report true batch
counts, and the row is marked if the cap is ever the binding value
(ADVICE r09).

Usage: python tools/streaming_floor.py [query ...] — default: all
streaming queries. Each (query, sf) runs REPS times after one warmup;
the MIN is the floor/cost estimate (host noise only adds). One quiet
box required: do not overlap with bench.py or other Spark work.

Output: one markdown table on stdout (paste into SCALE.md) plus a JSON
line per row on stderr for the record.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

REPS = 3
FLOOR_SF = "/root/testdata/sf0.001"
FULL_SF = "/root/testdata/sf0.1"

STREAM_QUERIES = [
    "events_tumbling_stream",
    "events_sessionize_stream",
    "events_hopping_stream",
    "events_copair_stream",
    "events_copair_hourly_stream",
    "events_dedup_stream",
    "events_rate_limited_stream",
    "events_enrich_stream",
    "events_attribution_stream",
    "user_profiles_stream",
    "multimodal_decode_stream",
    "dedup_incremental_stream",
]


def _stores_per_op(operator_name: str | None) -> int:
    """Internal state stores per partition for a streaming operator."""
    if operator_name and "symmetrichashjoin" in operator_name.lower():
        return 4
    return 1


def main() -> int:
    names = sys.argv[1:] or STREAM_QUERIES

    from database_migration_engine_spark.plans import QUERIES
    from database_migration_engine_spark.session import build_session
    from database_migration_engine_spark.streaming import events as SE

    spark = build_session(app_name="dbmig-streaming-floor")
    spark.sparkContext.setLogLevel("ERROR")
    # raise the recentProgress retention above any real drain's batch
    # count so n_batches = len(recentProgress) is never silently capped
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
    progress_cap = 10_000

    rows = []
    for name in names:
        fn = QUERIES[name]
        rec: dict = {"query": name}
        for label, sf_dir in (("floor", FLOOR_SF), ("full", FULL_SF)):
            SE.LAST_DRAIN_PROGRESS = {}
            fn(spark, sf_dir).collect()  # warmup (staging, codegen)
            times = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                times.append(round(time.perf_counter() - t0, 2))
            rec[label] = min(times)
            rec[f"{label}_reps"] = times
            if label == "full":
                prog = SE.LAST_DRAIN_PROGRESS or {}
                nb = prog.get("n_batches")
                ops = prog.get("state_ops") or []
                if name == "dedup_incremental_stream":
                    # foreachBatch: 6 files / maxFilesPerTrigger=2
                    rec["n_batches"] = 3
                    rec["state_ops"] = "none (foreachBatch)"
                    rec["commit_slots"] = "3 batches x (WAL + 2 sink writes)"
                else:
                    rec["n_batches"] = nb
                    if nb is not None and nb >= progress_cap:
                        rec["n_batches_capped"] = True
                    parts = [
                        (op.get("operatorName"),
                         op.get("numShufflePartitions"))
                        for op in ops
                    ]
                    rec["state_ops"] = parts
                    # internal stores per operator: symmetric
                    # stream-stream joins hold 4 per partition (two
                    # keyToNumValues + two keyWithIndexToValue),
                    # everything else 1 — matches SCALE.md's table
                    slots = sum(
                        (nb or 0) * (p or 0) * _stores_per_op(n)
                        for n, p in parts
                    )
                    rec["commit_slots"] = slots
        rec["marginal"] = round(rec["full"] - rec["floor"], 2)
        rows.append(rec)
        print(json.dumps(rec), file=sys.stderr)

    print("| query | floor sf0.001 (s) | full sf0.1 (s) | marginal (s) "
          "| batches | state ops (partitions) | commit slots |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        ops = r.get("state_ops")
        if isinstance(ops, list):
            ops_txt = ", ".join(
                f"{(n or 'op').split('(')[0].strip()}×{p}" for n, p in ops
            ) or "none (stateless)"
        else:
            ops_txt = str(ops)
        print(
            f"| `{r['query']}` | {r['floor']} | {r['full']} | "
            f"{r['marginal']} | {r.get('n_batches')} | {ops_txt} | "
            f"{r.get('commit_slots')} |"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
