"""×10 scale verification for dedup_consensus.

The registry oracle composes THREE candidate-generator chains (banded
MinHash, capped 3-gram Jaccard, embedding-LSH) into one statement —
fine at the driver's sf0.01, but at the ×10 fixture DuckDB must keep
all three materialized chains alive at once (the MinHash mseeded stage
alone is ~300M md5 rows) and spills past the sandbox disk. Here the
SAME SQL text runs STAGED: each generator's pair set materializes into
its own temp table sequentially — peak state is one chain at a time,
exactly the footprint the per-generator sweeps already certified — and
the final consensus statement joins the three (small) pair tables.
Statement text for each stage is lifted verbatim from the composed
oracle's CTEs, so the semantics are the registry oracle's, not a
re-derivation.

Usage: python tools/consensus_sweep.py <sf_dir>
"""

import hashlib
import sys
import time

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e  # noqa: E402
from database_migration_engine_spark.functions import text as TX  # noqa: E402
from database_migration_engine_spark.operators.similarity import (  # noqa: E402
    adaptive_lsh_bits,
)
from database_migration_engine_spark.plans.oracles import (  # noqa: E402
    _JACC_CTES,
    build_dedup_embedding_oracle,
)

sf = sys.argv[1]

spark = (
    SparkSession.builder.master("local[8]")
    .appName("consensus-sweep")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
con.execute("SET memory_limit='60GB'")
con.execute("SET temp_directory='/tmp/duck_spill'")
con.execute("SET preserve_insertion_order=false")
for t in ["documents", "embeddings"]:
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


t0 = time.perf_counter()
got = e.queries()["dedup_consensus"](spark, sf).toPandas()
t_spark = time.perf_counter() - t0

# --- staged oracle: one generator chain per statement ---------------
t0 = time.perf_counter()
con.execute(
    f"CREATE TEMP TABLE _ng AS WITH {_JACC_CTES} "
    "SELECT doc_a, doc_b FROM jacc"
)
con.execute(f"""
CREATE TEMP TABLE _mh AS
WITH mtoks AS (
    SELECT doc_id AS doc, {TX.sql_tokens("text")} AS t FROM documents
),
msh AS (
    SELECT doc, unnest(
        CASE WHEN len(t) >= 3
             THEN list_distinct(list_transform(range(1, len(t) - 1),
                  i -> array_to_string(list_slice(t, i, i + 2), ' ')))
             ELSE [] END) AS shingle
    FROM mtoks
),
mshx AS (SELECT doc, md5(shingle) AS shex FROM msh),
mseeded AS (
    SELECT doc, i, md5(CAST(i AS VARCHAR) || ':' || shex) AS hx
    FROM mshx CROSS JOIN range(32) r(i)
),
msigs AS (
    SELECT doc, i, MIN(substr(hx, 1, 16)) AS h
    FROM mseeded GROUP BY doc, i
),
mbands AS (
    SELECT doc, CAST(i // 4 AS INTEGER) AS band_id,
           md5(string_agg(h, ',' ORDER BY i)) AS band_hash
    FROM msigs GROUP BY doc, i // 4
)
SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
FROM mbands a JOIN mbands b
  ON a.band_id = b.band_id AND a.band_hash = b.band_hash
 AND a.doc < b.doc
""")
n_emb = con.sql("SELECT COUNT(*) FROM embeddings").fetchone()[0]
con.execute(
    "CREATE TEMP TABLE _em AS SELECT id_a AS doc_a, id_b AS doc_b FROM ("
    + build_dedup_embedding_oracle(adaptive_lsh_bits(n_emb))
    + ")"
)
want = con.sql("""
WITH allp AS (
    SELECT doc_a, doc_b FROM _mh
    UNION SELECT doc_a, doc_b FROM _ng
    UNION SELECT doc_a, doc_b FROM _em
)
SELECT p.doc_a, p.doc_b,
       m.doc_a IS NOT NULL AS by_minhash,
       n.doc_a IS NOT NULL AS by_ngram,
       e.doc_a IS NOT NULL AS by_embedding,
       CAST(m.doc_a IS NOT NULL AS INT)
         + CAST(n.doc_a IS NOT NULL AS INT)
         + CAST(e.doc_a IS NOT NULL AS INT) AS n_methods
FROM allp p
LEFT JOIN _mh m ON p.doc_a = m.doc_a AND p.doc_b = m.doc_b
LEFT JOIN _ng n ON p.doc_a = n.doc_a AND p.doc_b = n.doc_b
LEFT JOIN _em e ON p.doc_a = e.doc_a AND p.doc_b = e.doc_b
ORDER BY p.doc_a, p.doc_b
""").df()
t_duck = time.perf_counter() - t0

ok_cols = sorted(got.columns) == sorted(want.columns)
ok_rows = len(got) == len(want)
ok_vals = vhash(got) == vhash(want) if ok_cols and ok_rows else False
status = "OK" if (ok_cols and ok_rows and ok_vals) else "MISMATCH"
print(
    f"dedup_consensus: {status} rows={len(got)}/{len(want)} "
    f"vals_ok={ok_vals} spark={t_spark:.2f}s oracle={t_duck:.2f}s (staged)"
)
spark.stop()
sys.exit(0 if status == "OK" else 1)
