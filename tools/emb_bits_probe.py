"""Measured remediation for the embedding-LSH bucket-saturation finding
(r07 growth sweep): the registry's `lsh_near_dup_pairs` pins num_bits=6
so its static DuckDB oracle can rebuild identical buckets — but a fixed
64-bucket grid saturates as N grows (E[bucket] ∝ N, in-bucket scored
pairs ∝ N² — measured 0.02B at ×1 → 16.9B at ×30). The operator's
documented scaling knob is num_bits: raise it with log N to hold
E[bucket] constant. This probe MEASURES that the knob works at ×30:
runtime at num_bits=B, plus recall against construction-known ground
truth (the ×30 fixture's embedding copies are one-component nudges of a
base vector, so within-family cosines are ≈1 and the true high-cos pair
set is computable exactly in numpy without any N² sweep).

Usage: python tools/emb_bits_probe.py [fixture_dir] [num_bits] [threshold]
       (defaults: /tmp/dbmig_sf3, 11, 0.8)
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from database_migration_engine_spark.functions.portable_hash import (  # noqa: E402
    lsh_component,
)
from database_migration_engine_spark.io import read_table  # noqa: E402
from database_migration_engine_spark.operators import similarity as SIM  # noqa: E402
from database_migration_engine_spark.session import build_session  # noqa: E402

N_BASE = 2000  # sf0.1 embedding count; scale copies are vec_id + k*N_BASE


def family_truth(fixture: str, threshold: float) -> set[tuple[int, int]]:
    tbl = pq.read_table(f"{fixture}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = np.asarray(tbl.column("vec_id").to_pylist())
    vecs = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(vecs, axis=1)
    truth: set[tuple[int, int]] = set()
    for fam in range(N_BASE):
        idx = np.where(ids % N_BASE == fam)[0]
        if len(idx) < 2:
            continue
        v = vecs[idx]
        nn = norms[idx]
        cos = (v @ v.T) / np.outer(nn, nn)
        ii, jj = np.where(np.triu(cos >= threshold, k=1))
        for a, b in zip(idx[ii], idx[jj]):
            x, y = int(ids[a]), int(ids[b])
            truth.add((min(x, y), max(x, y)))
    return truth


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dbmig_sf3"
    bits = int(sys.argv[2]) if len(sys.argv) > 2 else 11
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 0.8

    spark = build_session(app_name="emb-bits-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, fixture, "embeddings")
    n = emb.count()

    t0 = time.perf_counter()
    pairs = SIM.lsh_near_dup_pairs(
        emb, threshold=threshold, num_bits=bits, components=lsh_component
    )
    found = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b)) for r in pairs.collect()
    }
    dt = time.perf_counter() - t0

    truth = family_truth(fixture, threshold)
    hit = len(found & truth)
    recall = hit / len(truth) if truth else 1.0
    eb = n * 5 / (1 << bits)
    print(
        f"fixture={fixture} n={n} bits={bits} threshold={threshold} "
        f"E[bucket]={eb:.0f} time={dt:.1f}s found={len(found)} "
        f"family_truth={len(truth)} family_recall={recall:.4f}"
    )
    spark.stop()
    sys.exit(0 if recall >= 0.999 else 1)


if __name__ == "__main__":
    main()
