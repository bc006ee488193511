"""×10 scale verification for the connected-components family.

The registry oracle for dedup_clusters / dedup_clusters_star computes CC
by recursive REACHABILITY (every (node, seed-root) pair) — exact and
fine at the driver's sf0.01, but Σ s² state per component: at the ×10
fixture (~1M edges) DuckDB 1.0 needs a >16 GiB single allocation and
dies (key-based recursion that would make it O(N) landed only in
DuckDB 1.3). So at sweep scale the value oracle is computed
INDEPENDENTLY instead: the edge list comes from the same certified
_JACC_CTES SQL pair graph, and the min-label components come from a
plain union-find here — a different algorithm and engine than BOTH the
Spark large/small-star implementation and the recursive SQL, agreeing
on the identical output contract (doc_id, cluster_id = min member,
cluster_size).

Usage: python tools/cc_sweep.py <sf_dir>
"""

import hashlib
import sys
import time

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e  # noqa: E402
from database_migration_engine_spark.plans.oracles import (  # noqa: E402
    _JACC_CTES,
)

sf = sys.argv[1]

spark = (
    SparkSession.builder.master("local[8]")
    .appName("cc-sweep")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
con.execute("SET memory_limit='40GB'")
con.execute("SET temp_directory='/tmp/duck_spill'")
con.execute(
    "CREATE VIEW documents AS "
    f"SELECT * FROM read_parquet('{sf}/documents.parquet')"
)


def vhash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return hashlib.sha256(
        pd.util.hash_pandas_object(df.astype(str), index=False)
        .values.tobytes()
    ).hexdigest()[:12]


t0 = time.perf_counter()
got = e.queries()["dedup_clusters_star"](spark, sf).toPandas()
t_spark = time.perf_counter() - t0

t0 = time.perf_counter()
edges = con.sql(
    f"WITH {_JACC_CTES} SELECT doc_a, doc_b FROM jacc"
).fetchall()
all_docs = [r[0] for r in con.sql("SELECT doc_id FROM documents").fetchall()]

parent: dict[int, int] = {}


def find(x: int) -> int:
    r = x
    while parent.get(r, r) != r:
        r = parent[r]
    while parent.get(x, x) != x:
        parent[x], x = r, parent[x]
    return r


for a, b in edges:
    ra, rb = find(a), find(b)
    if ra != rb:
        # min-label union so cluster_id is the component's min member
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        parent[hi] = lo

label = {d: find(d) for d in all_docs}
sizes: dict[int, int] = {}
for lab in label.values():
    sizes[lab] = sizes.get(lab, 0) + 1
want = pd.DataFrame(
    {
        "doc_id": all_docs,
        "cluster_id": [label[d] for d in all_docs],
        "cluster_size": [sizes[label[d]] for d in all_docs],
    }
)
t_duck = time.perf_counter() - t0

ok_cols = sorted(got.columns) == sorted(want.columns)
ok_rows = len(got) == len(want)
ok_vals = vhash(got) == vhash(want) if ok_cols and ok_rows else False
status = "OK" if (ok_cols and ok_rows and ok_vals) else "MISMATCH"
print(
    f"dedup_clusters_star: {status} rows={len(got)}/{len(want)} "
    f"vals_ok={ok_vals} spark={t_spark:.2f}s "
    f"oracle={t_duck:.2f}s (edges={len(edges)}, union-find)"
)
spark.stop()
sys.exit(0 if status == "OK" else 1)
