"""Reference-equality tests for the round-4 fingerprint/semantic-dedup
operators: robust winnowing vs a pure-Python replay of the SIGMOD'03
algorithm, and SemDeDup keep flags vs a numpy brute-force over the
operator's own (oracle-verified) cluster assignment."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pytest

from database_migration_engine_spark.functions.text import TOKEN_SPLIT_RE
from database_migration_engine_spark.io import read_table
from database_migration_engine_spark.operators import dedup as DD
from database_migration_engine_spark.operators import kmeans as KM
from database_migration_engine_spark.operators import similarity as SIM

from .conftest import SF_DIR

K, W = 4, 4


def _py_tokens(text: str) -> list[str]:
    return [t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t]


def _py_hash(gram: str) -> int:
    raw = int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:16], 16)
    return raw - (1 << 64) if raw >= (1 << 63) else raw


def _py_winnow(text: str) -> set[tuple[int, int]]:
    """Robust winnowing, straight from the paper: slide a window of W
    gram hashes; record the min, rightmost on ties; dedupe records."""
    toks = _py_tokens(text)
    grams = [
        " ".join(toks[i : i + K]) for i in range(len(toks) - K + 1)
    ]
    hs = [_py_hash(g) for g in grams]
    if not hs:
        return set()
    out: set[tuple[int, int]] = set()
    n_windows = max(len(hs) - W + 1, 1)
    for s in range(n_windows):
        win = hs[s : s + W]
        m = min(win)
        # rightmost occurrence of the min within the window
        ridx = max(i for i, h in enumerate(win) if h == m)
        out.add((s + ridx + 1, m))  # 1-based gram position
    return out


def test_winnowing_matches_python_reference(spark):
    docs = read_table(spark, SF_DIR, "documents").filter("doc_id < 40")
    got = {
        (r["doc"], r["pos"], r["hval"])
        for r in DD.winnow_fingerprints(docs, k=K, w=W).collect()
    }
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
    }
    want = {
        (doc, pos, h)
        for doc, text in texts.items()
        for (pos, h) in _py_winnow(text)
    }
    assert got == want


def test_winnowing_window_guarantee(spark):
    """Every window of W consecutive grams contains >= 1 fingerprint —
    the coverage guarantee that makes winnowing usable for matching:
    any shared run of W+K-1 tokens shares a fingerprint."""
    docs = read_table(spark, SF_DIR, "documents").filter("doc_id < 40")
    sel = DD.winnow_fingerprints(docs, k=K, w=W).collect()
    by_doc: dict[int, set[int]] = {}
    for r in sel:
        by_doc.setdefault(r["doc"], set()).add(r["pos"])
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
    }
    for doc, text in texts.items():
        ng = max(len(_py_tokens(text)) - K + 1, 0)
        if ng == 0:
            assert doc not in by_doc
            continue
        poss = by_doc[doc]
        for s in range(1, max(ng - W + 1, 1) + 1):
            assert any(s <= p <= s + W - 1 for p in poss), (doc, s)


def test_winnowing_density_near_theoretical(spark):
    """Expected density of robust winnowing on random-ish hashes is
    2/(w+1) (SIGMOD'03 §5); the fixture corpus should land near it."""
    docs = read_table(spark, SF_DIR, "documents")
    sel = DD.winnow_fingerprints(docs, k=K, w=W)
    n_fps = sel.count()
    import pyspark.sql.functions as F

    from database_migration_engine_spark.functions import text as TX

    n_grams = (
        docs.select(
            F.greatest(
                F.size(TX.tokens("text")) - F.lit(K - 1), F.lit(0)
            ).alias("ng")
        )
        .agg(F.sum("ng"))
        .collect()[0][0]
    )
    density = n_fps / n_grams
    assert 0.3 < density < 0.5, density


def test_semdedup_flags_brute_force(spark):
    """keep/max_sim_prev replayed with numpy inside the operator's own
    cluster assignment (the assignment itself is oracle-verified via
    kmeans_embeddings)."""
    emb = read_table(spark, SF_DIR, "embeddings")
    tau = 0.3
    got = {
        r["vec_id"]: (r["cid"], r["max_sim_prev"], r["keep"])
        for r in SIM.semdedup_flags(emb, tau=tau).collect()
    }
    asg, _ = KM.kmeans_fixed_point(emb, k=4, dims=16, iters=2)
    cids = {r["pid"]: r["cid"] for r in asg.collect()}
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    nrm = np.sqrt((mat * mat).sum(axis=1))
    assert len(got) == len(ids)
    for j, vid in enumerate(ids):
        cid = cids[int(vid)]
        prev = [
            i
            for i in range(len(ids))
            if ids[i] < vid and cids[int(ids[i])] == cid
        ]
        if prev:
            sims = (mat[prev] @ mat[j]) / (nrm[prev] * nrm[j])
            want_max = float(np.max(sims))
            want_keep = 1 if want_max < tau else 0
            g_cid, g_max, g_keep = got[int(vid)]
            assert g_cid == cid
            assert g_max == pytest.approx(want_max, abs=1e-9)
            assert g_keep == want_keep
        else:
            assert got[int(vid)] == (cid, -1.0, 1)


def test_semdedup_removals_nontrivial(spark):
    """τ=0.3 must actually split the fixture corpus (guards against a
    threshold that silently keeps everything)."""
    emb = read_table(spark, SF_DIR, "embeddings")
    flags = SIM.semdedup_flags(emb, tau=0.3)
    kept = flags.filter("keep = 1").count()
    total = flags.count()
    assert 0 < kept < total
