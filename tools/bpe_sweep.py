"""×10 certification for bpe_merge_table with a STAGED oracle (r07
verdict item 2: the monolithic 10-stage unrolled DuckDB oracle
materializes ~7 GB per merge stage and exhausts the sandbox spill disk;
the Spark leg completed at ×10 — the hole was oracle-side only).

The staging applies the `tools/consensus_sweep.py` pattern: one merge
step per statement, each stage's result fed forward through a temp
table, so peak oracle state is ONE stage. Additionally the encoding
table is held FREQUENCY-WEIGHTED — `(enc, w)` over distinct encoded
tokens instead of one row per token instance — the same algebraic
regrouping the Spark trainer itself uses (r07 re-derivation): instance
pair counts equal weight-summed distinct-token pair counts, so the
per-step argmax rows (step, left_sym, right_sym, pair_count) are
IDENTICAL to the registry oracle's (`_bpe_merge_table_sql`), verified
by this tool at sf0.01 against the monolithic form before every sweep.

Merge symbols are passed as bound parameters (never interpolated), so
arbitrary token text cannot break the statement.

Usage: python tools/bpe_sweep.py <sf_dir> [--check-monolithic]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e  # noqa: E402
from database_migration_engine_spark.plans.oracles import (  # noqa: E402
    _TOKS,
    _bpe_merge_table_sql,
)

N_STEPS = 10

sf = sys.argv[1]
check_monolithic = "--check-monolithic" in sys.argv

spark = (
    SparkSession.builder.master("local[8]")
    .appName("bpe-sweep")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
con.execute("SET memory_limit='40GB'")
con.execute("SET temp_directory='/tmp/duck_spill'")
con.execute("SET preserve_insertion_order=false")
con.execute(
    f"CREATE VIEW documents AS "
    f"SELECT * FROM read_parquet('{sf}/documents.parquet')"
)


def vhash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return hashlib.sha256(
        pd.util.hash_pandas_object(df.astype(str), index=False)
        .values.tobytes()
    ).hexdigest()[:12]


def staged_oracle(con: duckdb.DuckDBPyConnection) -> pd.DataFrame:
    """The registry oracle's semantics, one stage at a time over the
    weighted vocabulary."""
    con.execute("DROP TABLE IF EXISTS enc_w")
    con.execute(f"""
CREATE TEMP TABLE enc_w AS
WITH toks AS (SELECT unnest({_TOKS}) AS tok FROM documents),
t2 AS (SELECT tok FROM toks WHERE len(tok) >= 2),
enc0 AS (
    SELECT '||' || regexp_replace(tok, '(.)', '\\1||', 'g') AS enc FROM t2
)
SELECT enc, CAST(COUNT(*) AS BIGINT) AS w FROM enc0 GROUP BY enc
""")
    rows = []
    for k in range(1, N_STEPS + 1):
        best = con.execute("""
WITH syms AS (
    SELECT list_filter(string_split(enc, '||'), x -> x != '') AS syms, w
    FROM enc_w
),
pairs AS (
    SELECT syms[i] AS l, syms[i + 1] AS r, w
    FROM syms, LATERAL unnest(range(1, len(syms))) t(i)
)
SELECT l, r, CAST(SUM(w) AS BIGINT) AS n
FROM pairs GROUP BY l, r
ORDER BY n DESC, l, r LIMIT 1
""").fetchone()
        left, right, n = best
        rows.append((k, left, right, n))
        con.execute(
            """
CREATE TEMP TABLE enc_next AS
SELECT enc, CAST(SUM(w) AS BIGINT) AS w FROM (
    SELECT replace(enc, '|' || ? || '||' || ? || '|',
                   '|' || ? || '|') AS enc, w
    FROM enc_w
) GROUP BY enc
""",
            [left, right, left + right],
        )
        con.execute("DROP TABLE enc_w")
        con.execute("ALTER TABLE enc_next RENAME TO enc_w")
    return pd.DataFrame(
        rows, columns=["step", "left_sym", "right_sym", "pair_count"]
    )


if check_monolithic:
    # semantic anchor: staged == monolithic on THIS fixture (cheap only
    # at sf0.01/sf0.001 — that is the point of staging)
    mono = con.sql(_bpe_merge_table_sql()).df()
    staged = staged_oracle(con)
    assert vhash(mono) == vhash(staged), "staged oracle != monolithic"
    print("staged == monolithic: OK", file=sys.stderr)

t0 = time.perf_counter()
got = e.queries()["bpe_merge_table"](spark, sf).toPandas()
t_spark = time.perf_counter() - t0

t0 = time.perf_counter()
want = staged_oracle(con)
t_duck = time.perf_counter() - t0

ok_cols = sorted(got.columns) == sorted(want.columns)
ok_rows = len(got) == len(want)
ok_vals = vhash(got) == vhash(want) if ok_cols and ok_rows else False
status = "OK" if (ok_cols and ok_rows and ok_vals) else "MISMATCH"
print(
    f"bpe_merge_table: {status} rows={len(got)}/{len(want)} "
    f"vals_ok={ok_vals} spark={t_spark:.2f}s oracle={t_duck:.2f}s (staged)"
)
spark.stop()
sys.exit(0 if status == "OK" else 1)
