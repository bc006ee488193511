"""Certify every streaming registry query under the RocksDB state-store
provider (r05 verdict item 4): same DuckDB value oracles as the driver
gate, session built with SPARK_GRAFT_STATE_STORE=rocksdb semantics, plus
recorded state-store metrics (rows / memory-or-sst bytes per stateful
operator) so the 100 TB state-sizing story is measured, not assumed.

Usage:  python tools/statestore_cert.py [sf_dir] [round_tag]
        (defaults: sf0.01, r07)
Writes: CERT_ROCKSDB_<round_tag>.txt in the repo root.
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from database_migration_engine_spark.plans import ORACLES, QUERIES  # noqa: E402
from database_migration_engine_spark.session import build_session  # noqa: E402

STREAMING = [
    "events_tumbling_stream",
    "events_sessionize_stream",
    "events_hopping_stream",
    "events_copair_stream",
    "user_profiles_stream",
    "events_dedup_stream",
    "events_rate_limited_stream",
    "events_enrich_stream",
    "events_attribution_stream",
    "events_copair_hourly_stream",
    "events_late_audit",
    # r07/r08 additions: the multimodal file-stream decode (stateless
    # transform) and the index-maintaining foreachBatch dedup — neither
    # holds store state, but both must DRAIN correctly under the
    # RocksDB provider conf (checkpoint/commit path differs)
    "multimodal_decode_stream",
    "dedup_incremental_stream",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def vhash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return hashlib.sha256(
        pd.util.hash_pandas_object(df.astype(str), index=False)
        .values.tobytes()
    ).hexdigest()[:12]


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.environ["SPARK_GRAFT_STATE_STORE"] = "rocksdb"
    spark = build_session(app_name="dbmig-rocksdb-cert")
    spark.sparkContext.setLogLevel("ERROR")
    provider = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    assert "RocksDB" in provider, provider

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )

    lines = [f"# RocksDB state-store certification — sf_dir={sf}",
             f"# provider={provider}"]
    fails = []
    for name in STREAMING:
        try:
            got = QUERIES[name](spark, sf).toPandas()
            want = con.sql(ORACLES[name]).df()
            ok = (
                len(got) == len(want)
                and sorted(got.columns) == sorted(want.columns)
                and vhash(got) == vhash(want)
            )
            # state metrics captured by run_to_memory from the drain's
            # lastProgress (the query is stopped by the time we get here,
            # so the module-level snapshot is the only readable record)
            from database_migration_engine_spark.streaming import events as SE
            parts = []
            for op in SE.LAST_DRAIN_STATE_METRICS:
                sst = sum(
                    int(v) for k, v in op["customMetrics"].items()
                    if "SSTFiles" in k
                )
                mem = op["memoryUsedBytes"] or 0
                parts.append(
                    f"{op['operatorName']}:rows={op['numRowsTotal']}"
                    f",bytes={max(int(mem), sst)}"
                )
            metrics = f" state[{'; '.join(parts)}]" if parts else ""
            line = (
                f"{name}: {'OK' if ok else 'MISMATCH'} "
                f"rows={len(got)}/{len(want)}{metrics}"
            )
        except Exception as exc:  # noqa: BLE001
            ok = False
            line = f"{name}: ERROR {type(exc).__name__}: {str(exc)[:160]}"
        print(line, file=sys.stderr)
        lines.append(line)
        if not ok:
            fails.append(name)
    lines.append(f"FAILS: {', '.join(fails) if fails else 'none'}")
    tag = sys.argv[2] if len(sys.argv) > 2 else "r07"
    out = os.path.join("/root/repo", f"CERT_ROCKSDB_{tag}.txt")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[-2:]))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
