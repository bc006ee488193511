"""Deterministic scale-up fixture for the sf1 dedup/similarity sweep
(r04 verdict item 8): replicate sf0.1's documents/embeddings/customer
10x with seeded mutations that preserve the distributions the family's
sub-quadratic claims depend on (near-dup clusters for MinHash/winnowing
/SemDeDup, exact cross-copy dups, distance-1 name variants for the
FastSS join). Remaining tables are byte-copied — the sweep only targets
the document/embedding/customer queries.

Everything is a pure function of (row, copy index): re-running the
generator reproduces identical parquet values, so the DuckDB-vs-Spark
value hashes recorded in CERT_SF1_r05.txt are reproducible evidence.

Writes to /tmp/dbmig_sf1 (never under /root/testdata, which is
read-only by contract).
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get("SCALE_FIXTURE_DIR", "/tmp/dbmig_sf1")
COPIES = int(os.environ.get("SCALE_FIXTURE_COPIES", "10"))


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count() or 8}")

    n_docs = con.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    n_vecs = con.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0]
    n_cust = con.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SRC}/customer.parquet')"
    ).fetchone()[0]

    # documents: copy 0 verbatim; other copies either stay exact dups
    # (every 10th (doc_id+k)) or get every (k+3)rd token replaced by a
    # copy marker — high-Jaccard near-dups the LSH/winnowing paths must
    # catch, with enough replaced tokens to keep fingerprints distinct.
    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + k.k * {n_docs} AS doc_id,
                 CASE
                   WHEN k.k = 0 OR (d.doc_id + k.k) % 10 = 0 THEN d.text
                   ELSE array_to_string(
                     list_transform(
                       string_split(d.text, ' '),
                       (t, i) -> CASE WHEN i % (k.k + 3) = 0
                                      THEN 'c' || CAST(k.k AS VARCHAR)
                                      ELSE t END
                     ), ' ')
                 END AS text,
                 d.lang,
                 d.source,
                 d.n_chars
          FROM read_parquet('{SRC}/documents.parquet') d
          CROSS JOIN (SELECT unnest(range({COPIES})) AS k) k
          ORDER BY doc_id
        ) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
        """
    )

    # embeddings: copy 0 verbatim; every 7th (vec_id+k) an exact dup;
    # otherwise nudge one deterministic component by a small fixed-point
    # delta — cosine stays near 1 (SemDeDup-range near-dups) without
    # collapsing to exact equality.
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id + k.k * {n_vecs} AS vec_id,
                 CASE
                   WHEN k.k = 0 OR (e.vec_id + k.k) % 7 = 0 THEN e.embedding
                   ELSE list_transform(
                     e.embedding,
                     (v, i) -> CASE
                       WHEN i = 1 + ((e.vec_id + k.k) % 64)
                       THEN CAST(v + 0.001 * (1 + ((e.vec_id * 131 + k.k) % 5))
                                 AS FLOAT)
                       ELSE v END
                   )
                 END AS embedding,
                 e.label
          FROM read_parquet('{SRC}/embeddings.parquet') e
          CROSS JOIN (SELECT unnest(range({COPIES})) AS k) k
          ORDER BY vec_id
        ) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)
        """
    )

    # customer: copy 0 verbatim; other copies flip one deterministic
    # character of c_name to '#' — distance-1 variants of the original
    # (FastSS delete-1 join fodder), distance-2 from each other.
    con.execute(
        f"""
        COPY (
          SELECT c.c_custkey + k.k * {n_cust} AS c_custkey,
                 CASE WHEN k.k = 0 THEN c.c_name
                      ELSE substr(c.c_name, 1,
                               1 + ((c.c_custkey + k.k) % len(c.c_name)) - 1)
                           || '#'
                           || substr(c.c_name,
                               1 + ((c.c_custkey + k.k) % len(c.c_name)) + 1)
                 END AS c_name,
                 c.c_nationkey, c.c_acctbal, c.c_mktsegment
          FROM read_parquet('{SRC}/customer.parquet') c
          CROSS JOIN (SELECT unnest(range({COPIES})) AS k) k
          ORDER BY c_custkey
        ) TO '{OUT}/customer.parquet' (FORMAT PARQUET)
        """
    )

    for t in ["region", "nation", "supplier", "part"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")

    # events (v2): replicate through pyarrow, NOT DuckDB — the fixture
    # stores ts as parquet timestamp[ns] (int64) and a DuckDB COPY would
    # rewrite it as microseconds, silently un-exercising the ns-sniffing
    # read path. Copy k shifts event ids by k*N and user ids by
    # k*(max_user+1): a fresh user population with the SAME temporal
    # patterns, so per-user windows, sessionizers, interval-join state,
    # and the rank machinery all scale ×COPIES while every per-user
    # answer stays the shape the sf0.1 oracles certified.
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    # orders + lineitem (v3): replicate with JOIN-CONSISTENT strides —
    # o_orderkey and l_orderkey shift by k*N_orders together, and
    # o_custkey shifts by k*N_cust, the same stride the customer block
    # above used — so every FK edge (lineitem→orders→customer) holds in
    # every copy and the whole TPC-H-shaped relational family can be
    # value-certified at ×COPIES (≈ sf1). Values/dates unchanged:
    # per-copy answers keep the certified shape, global aggregates
    # scale. pyarrow (not DuckDB COPY) so timestamp storage units
    # survive byte-for-byte.
    def _replicate(src_path, out_path, shifts):
        t = pq.read_table(src_path)
        parts = []
        for k in range(COPIES):
            cols = {}
            for name in t.column_names:
                col = t[name]
                if name in shifts and k:
                    col = pc.add(col, k * shifts[name])
                cols[name] = col
            parts.append(pa.table(cols, schema=t.schema))
        pq.write_table(pa.concat_tables(parts), out_path)

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    n_ord = con.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SRC}/orders.parquet')"
    ).fetchone()[0]
    _replicate(
        f"{SRC}/orders.parquet", f"{OUT}/orders.parquet",
        {"o_orderkey": n_ord, "o_custkey": n_cust},
    )
    _replicate(
        f"{SRC}/lineitem.parquet", f"{OUT}/lineitem.parquet",
        {"l_orderkey": n_ord},
    )

    ev = pq.read_table(f"{SRC}/events.parquet")
    n_ev = ev.num_rows
    u_stride = pc.max(ev["user_id"]).as_py() + 1
    parts = []
    for k in range(COPIES):
        parts.append(
            pa.table(
                {
                    "event_id": pc.add(ev["event_id"], k * n_ev),
                    "ts": ev["ts"],
                    "user_id": pc.add(ev["user_id"], k * u_stride),
                    "event_type": ev["event_type"],
                    "value": ev["value"],
                    "props": ev["props"],
                },
                schema=ev.schema,
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{OUT}/events.parquet")

    for t in ["documents", "embeddings", "customer", "events"]:
        n = con.sql(
            f"SELECT COUNT(*) FROM read_parquet('{OUT}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows", file=sys.stderr)
    print(OUT)


if __name__ == "__main__":
    main()
