"""×10 scale verification for the connected-components-LABEL family.

The registry oracles for dedup_clusters / dedup_clusters_star /
clean_corpus / dedup_aware_split compute CC by recursive REACHABILITY
(every (node, seed-root) pair) — exact and fine at the driver's sf0.01,
but Σ s² state per component: at the ×10 fixture (~1M edges) DuckDB 1.0
needs a >16 GiB single allocation and dies, or grinds indefinitely
(key-based recursion that would make it O(N) landed only in DuckDB
1.3). So at sweep scale the `comp(doc_id, cluster_id)` relation is
computed INDEPENDENTLY: the edge list comes from the same certified
_JACC_CTES SQL pair graph, min-label components from a plain union-find
here, and each query's REMAINING oracle SQL (quality ranking, retention
rollup, split hashing — lifted verbatim from plans/oracles.py) runs in
DuckDB over that temp table. A third algorithm and engine agreeing on
the identical output contract.

Usage: python tools/cc_sweep.py <sf_dir> [query ...]
Default queries: dedup_clusters_star dedup_clusters dedup_aware_split
clean_corpus
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
    ORACLES,
    _JACC_CTES,
    _QF_CTES,
    _QF_PASS,
    _TOKS,
)

sf = sys.argv[1]
names = sys.argv[2:] or [
    "dedup_clusters_star", "dedup_clusters", "dedup_aware_split",
    "clean_corpus",
]

# the post-`comp` remainder of each registry oracle, verbatim
_FINAL_SQL = {
    "dedup_clusters": """
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM comp
ORDER BY doc_id
""",
    "dedup_aware_split": """
SELECT doc_id, cluster_id,
       CASE WHEN SUBSTRING(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < '1a'
            THEN 'test'
            WHEN SUBSTRING(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < '34'
            THEN 'val'
            ELSE 'train' END AS split
FROM comp
ORDER BY doc_id
""",
    "clean_corpus": f"""
, quality AS ({ORACLES["quality_score"]}),
ranked AS (
    SELECT c.cluster_id, q.doc_id,
           ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                              ORDER BY q.score DESC, q.doc_id ASC) AS rnk
    FROM comp c JOIN quality q USING (doc_id)
),
reps AS (SELECT doc_id FROM ranked WHERE rnk = 1),
{_QF_CTES},
perdoc AS (
    SELECT f.doc_id, f.source,
           {_QF_PASS} AS passes,
           CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END AS is_rep
    FROM qf_flags f LEFT JOIN reps r USING (doc_id)
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(is_rep) AS BIGINT) AS n_after_dedup,
       CAST(SUM(is_rep * passes) AS BIGINT) AS n_retained,
       CAST(SUM(is_rep * passes) AS DOUBLE) / COUNT(*) AS retention_rate
FROM perdoc GROUP BY source ORDER BY source
""",
    "cluster_representatives": f"""
, quality AS ({ORACLES["quality_score"]}),
ranked AS (
    SELECT c.cluster_id, q.doc_id, q.score,
           ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                              ORDER BY q.score DESC, q.doc_id ASC) AS rnk
    FROM comp c JOIN quality q USING (doc_id)
)
SELECT cluster_id, doc_id AS rep_doc_id, score AS rep_score
FROM ranked WHERE rnk = 1
ORDER BY cluster_id
""",
}
_FINAL_SQL["corpus_capstone"] = f"""
, {_QF_CTES},
qual AS (
    SELECT doc_id FROM qf_flags WHERE {_QF_PASS} = 1
),
keep AS (
    SELECT c.cluster_id, MIN(c.doc_id) AS doc_id
    FROM comp c JOIN qual q USING (doc_id)
    GROUP BY c.cluster_id
),
kd AS (
    SELECT k.doc_id, d.source, len({_TOKS}) AS n_tokens,
           CASE WHEN SUBSTRING(md5(CAST(k.cluster_id AS VARCHAR)), 1, 2)
                     < '1a' THEN 'test'
                WHEN SUBSTRING(md5(CAST(k.cluster_id AS VARCHAR)), 1, 2)
                     < '34' THEN 'val'
                ELSE 'train' END AS split
    FROM keep k JOIN documents d USING (doc_id)
),
c2 AS (
    SELECT split, source, n_tokens,
           COALESCE(SUM(n_tokens) OVER (
               PARTITION BY split, source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
    FROM kd
)
SELECT split, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(MAX(CAST(FLOOR(cum_before / 2048.0) AS BIGINT)) + 1 AS BIGINT)
           AS n_bins
FROM c2 GROUP BY split, source ORDER BY split, source
"""
_FINAL_SQL["dedup_clusters_star"] = _FINAL_SQL["dedup_clusters"]
_FINAL_SQL["dedup_embedding_sharded"] = """
SELECT vec_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM comp_emb
ORDER BY vec_id
"""

spark = (
    SparkSession.builder.master("local[8]")
    .appName("cc-sweep")
    # resource allocation, not a plan conf (same note as scale_sweep):
    # local-mode's 1 GB default heap is sf0.01-sized; the x30 sharded
    # embedding leg OOMs it. Plans stay vanilla.
    .config("spark.driver.memory", "8g")
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


# --- union-find comp over the certified SQL edge lists ---------------


def _uf_components(edges, all_nodes):
    """Min-label union-find: cluster_id = the component's min member."""
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
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return [find(n) for n in all_nodes]


t_uf = time.perf_counter()
edges = []
if any(n != "dedup_embedding_sharded" for n in names):
    edges = con.sql(
        f"WITH {_JACC_CTES} SELECT doc_a, doc_b FROM jacc"
    ).fetchall()
    all_docs = [
        r[0] for r in con.sql("SELECT doc_id FROM documents").fetchall()
    ]
    comp = pd.DataFrame(
        {"doc_id": all_docs, "cluster_id": _uf_components(edges, all_docs)}
    )
    con.register("comp_py", comp)
    con.execute("CREATE TEMP TABLE comp AS SELECT * FROM comp_py")

# the EMBEDDING pair graph's CC family (dedup_embedding_sharded, r10):
# same recursive-oracle limitation at sweep scale, same remedy — the
# certified pair SQL at the query's own (job-sized) bit-width closed by
# union-find, remainder in DuckDB
emb_edges = []
if "dedup_embedding_sharded" in names:
    import math

    from database_migration_engine_spark.operators.similarity import (
        adaptive_lsh_bits,
    )
    from database_migration_engine_spark.plans.oracles import (
        build_emb_pair_graph_ctes,
    )

    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    n_emb = con.sql("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    emb_bits = adaptive_lsh_bits(math.ceil(2 * n_emb / 4))
    emb_edges = con.sql(
        f"WITH {build_emb_pair_graph_ctes(emb_bits)} "
        "SELECT id_a, id_b FROM pairs"
    ).fetchall()
    all_vecs = [
        r[0] for r in con.sql("SELECT vec_id FROM embeddings").fetchall()
    ]
    comp_e = pd.DataFrame(
        {"vec_id": all_vecs, "cluster_id": _uf_components(emb_edges, all_vecs)}
    )
    con.register("comp_emb_py", comp_e)
    con.execute("CREATE TEMP TABLE comp_emb AS SELECT * FROM comp_emb_py")
t_uf = time.perf_counter() - t_uf

qs = e.queries()
fails = []
for name in names:
    t0 = time.perf_counter()
    got = qs[name](spark, sf).toPandas()
    t_spark = time.perf_counter() - t0
    t0 = time.perf_counter()
    final = _FINAL_SQL[name]
    # a remainder starting with "," continued the original WITH chain
    # after `comp`; with comp now a temp table it opens its own WITH
    sql = "WITH " + final.lstrip()[1:].lstrip() if final.lstrip().startswith(",") else final
    want = con.sql(sql).df()
    t_duck = time.perf_counter() - t0 + (t_uf if name == names[0] else 0)
    ok_cols = sorted(got.columns) == sorted(want.columns)
    ok_rows = len(got) == len(want)
    ok_vals = vhash(got) == vhash(want) if ok_cols and ok_rows else False
    status = "OK" if (ok_cols and ok_rows and ok_vals) else "MISMATCH"
    if status != "OK":
        fails.append(name)
    n_edges = (
        len(emb_edges) if name == "dedup_embedding_sharded" else len(edges)
    )
    print(
        f"{name}: {status} rows={len(got)}/{len(want)} "
        f"vals_ok={ok_vals} spark={t_spark:.2f}s "
        f"oracle={t_duck:.2f}s (edges={n_edges}, union-find)"
    )
print("FAILS:", fails or "none")
spark.stop()
sys.exit(1 if fails else 0)
