"""Driver simulation: vanilla SparkSession (no engine confs), sf0.01,
import __spark_entry__ exactly as the driver would, compare to DuckDB.

Set DRIVER_SIM_SF_DIR to certify against a different scale factor (the
per-round habit: full sweep at sf0.01, heavy-query spot sweep at sf0.1
so scale-up correctness is evidenced, not assumed)."""
import os, sys, hashlib
import duckdb, pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e

# Vanilla session: default 200 shuffle partitions, no UTC pin, no AQE tweaks.
spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

df = e.entry(spark)
n = df.count()
print(f"entry(): {n} rows, schema={df.columns}")
assert n > 0

sf = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

def vhash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return hashlib.sha256(pd.util.hash_pandas_object(df.astype(str), index=False).values.tobytes()).hexdigest()[:12]

qs, oracles = e.queries(), e.oracle_sql()
if len(sys.argv) > 1:  # optional subset: driver_sim.py q1 q2 ...
    unknown = [a for a in sys.argv[1:] if a not in qs]
    assert not unknown, f"unknown queries: {unknown}"
    qs = {n: qs[n] for n in sys.argv[1:]}
fails = []
for name, fn in qs.items():
    got = fn(spark, sf).toPandas()
    if name not in oracles:
        print(f"{name}: rows-only, {len(got)} rows")
        continue
    want = con.sql(oracles[name]).df()
    ok_cols = sorted(got.columns) == sorted(want.columns)
    ok_rows = len(got) == len(want)
    ok_vals = vhash(got) == vhash(want) if ok_cols and ok_rows else False
    status = "OK" if (ok_cols and ok_rows and ok_vals) else "MISMATCH"
    if status != "OK":
        fails.append(name)
    print(f"{name}: {status} rows={len(got)}/{len(want)} cols_ok={ok_cols} vals_ok={ok_vals}")
print("FAILS:", fails or "none")
spark.stop()
sys.exit(1 if fails else 0)
