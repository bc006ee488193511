"""Scale-evidence sweep (r04 verdict item 8): run a query subset at a
larger-than-sf0.1 fixture (tools/gen_scale_fixture.py) with the SAME
vanilla-session + DuckDB-oracle comparison as driver_sim, and record
per-query Spark/oracle wall times alongside the hash verdicts. The
artifact (CERT_SF1_r05.txt) is the proof that the dedup/similarity
family's sub-quadratic claims hold an order of magnitude above the
bench scale — measured, not asserted.

Usage: python tools/scale_sweep.py <sf_dir> <query> [query ...]
"""

import hashlib
import sys
import time

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e  # noqa: E402

sf = sys.argv[1]
names = sys.argv[2:]

spark = (
    SparkSession.builder.master("local[8]")
    .appName("scale-sweep")
    # resource allocation, not a plan conf: local-mode's default 1 GB
    # heap is sf0.01-sized; at the ×10 fixture the embedding-LSH chain
    # OOMs it. Plans stay vanilla (default shuffle partitions, no
    # engine confs) — a real executor has tens of GB.
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
# Spill discipline for the ×10 oracles: a bounded memory budget (the
# Spark JVM shares the box), an explicit temp dir on the big partition,
# and no insertion-order guarantee (vhash sorts anyway). Without these
# the composed dedup_consensus oracle exhausted the sandbox disk.
con.execute("SET memory_limit='40GB'")
con.execute("SET temp_directory='/tmp/duck_spill'")
con.execute("SET preserve_insertion_order=false")
for t in [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
    )


def vhash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return hashlib.sha256(
        pd.util.hash_pandas_object(df.astype(str), index=False)
        .values.tobytes()
    ).hexdigest()[:12]


qs, oracles = e.queries(), e.oracle_sql()
# scale-adaptive oracles (r08): the embedding-LSH queries pick num_bits
# from N at plan time; rebuild their oracles at the matching width (a
# byte-identical no-op at fixture scale, where bits clamps to the floor)
from database_migration_engine_spark.plans.oracles import (  # noqa: E402
    adaptive_oracle_overrides,
)

n_emb = con.sql("SELECT COUNT(*) FROM embeddings").fetchone()[0]
oracles = {**oracles, **adaptive_oracle_overrides(n_emb)}
unknown = [a for a in names if a not in qs]
assert not unknown, f"unknown queries: {unknown}"
fails = []
for name in names:
    t0 = time.perf_counter()
    got = qs[name](spark, sf).toPandas()
    t_spark = time.perf_counter() - t0
    if name not in oracles:
        print(f"{name}: rows-only, {len(got)} rows, spark={t_spark:.2f}s")
        continue
    t0 = time.perf_counter()
    want = con.sql(oracles[name]).df()
    t_duck = time.perf_counter() - t0
    ok_cols = sorted(got.columns) == sorted(want.columns)
    ok_rows = len(got) == len(want)
    ok_vals = vhash(got) == vhash(want) if ok_cols and ok_rows else False
    status = "OK" if (ok_cols and ok_rows and ok_vals) else "MISMATCH"
    if status != "OK":
        fails.append(name)
    print(
        f"{name}: {status} rows={len(got)}/{len(want)} vals_ok={ok_vals} "
        f"spark={t_spark:.2f}s oracle={t_duck:.2f}s"
    )
print("FAILS:", fails or "none")
spark.stop()
sys.exit(1 if fails else 0)
