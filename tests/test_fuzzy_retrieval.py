"""Reference-equality tests for the round-4 fuzzy-join / retrieval
operators: FastSS edit-distance-1 pairs vs a brute-force Levenshtein
sweep, the MOSS match step vs a pure-Python pair count over the
(separately reference-tested) winnow fingerprints, and BM25 scores vs a
scalar Python replay of the exact formula."""

from __future__ import annotations

import hashlib
import re

import pytest

from database_migration_engine_spark.functions.text import TOKEN_SPLIT_RE
from database_migration_engine_spark.io import read_table
from database_migration_engine_spark.operators import dedup as DD
from database_migration_engine_spark.plans.queries import QUERIES

from .conftest import SF_DIR


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fastss_pairs_equal_bruteforce(spark):
    cust = (
        read_table(spark, SF_DIR, "customer")
        .filter("c_custkey < 120")
        .select("c_name")
    )
    names = sorted(r["c_name"] for r in cust.collect())
    want = {
        (a, b)
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if _lev(a, b) == 1
    }
    got = {
        (r["term_a"], r["term_b"])
        for r in DD.fastss_pairs(
            cust.select(cust.c_name.alias("term"))
        ).collect()
    }
    assert got == want
    assert want, "fixture must produce at least one distance-1 pair"


def test_fastss_min_len_filters_short_terms(spark):
    vocab = spark.sql(
        "SELECT * FROM VALUES ('abc'), ('abcd'), ('abce'), ('ab')"
        " AS t(term)"
    )
    got = {
        (r["term_a"], r["term_b"])
        for r in DD.fastss_pairs(vocab, min_len=4).collect()
    }
    assert got == {("abcd", "abce")}


def _py_tokens(text: str) -> list[str]:
    return [t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t]


def _py_hash(gram: str) -> int:
    raw = int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:16], 16)
    return raw - (1 << 64) if raw >= (1 << 63) else raw


def _py_winnow_set(text: str, k: int = 4, w: int = 4) -> set[int]:
    toks = _py_tokens(text)
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [_py_hash(g) for g in grams]
    if not hs:
        return set()
    out: set[int] = set()
    for s in range(max(len(hs) - w + 1, 1)):
        win = hs[s : s + w]
        out.add(min(win))
    return out


def test_moss_match_pairs_equal_python(spark):
    docs = read_table(spark, SF_DIR, "documents").filter("doc_id < 60")
    rows = docs.select("doc_id", "text").collect()
    fps = {r["doc_id"]: _py_winnow_set(r["text"]) for r in rows}
    # df cap at 50 — replicate before pairing
    from collections import Counter

    df_count = Counter(h for s in fps.values() for h in s)
    fps = {
        d: {h for h in s if df_count[h] <= 50} for d, s in fps.items()
    }
    ids = sorted(fps)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = len(fps[a] & fps[b])
            if shared:
                want[(a, b)] = (
                    shared,
                    len(fps[a]),
                    len(fps[b]),
                    shared / min(len(fps[a]), len(fps[b])),
                )
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["shared"],
            r["n_a"],
            r["n_b"],
            r["match_ratio"],
        )
        for r in DD.moss_match_pairs(docs, max_df=50).collect()
    }
    assert got == want
    assert want, "fixture must produce at least one matching pair"


def test_moss_guarantee_long_shared_run_is_caught(spark):
    """The winnowing guarantee: a shared token run of w + k - 1 = 7
    tokens MUST yield at least one shared fingerprint."""
    a = "alpha beta gamma delta epsilon zeta eta unique1 tail1"
    b = "head2 alpha beta gamma delta epsilon zeta eta other2"
    df = spark.sql(
        f"SELECT * FROM VALUES (1, '{a}'), (2, '{b}') AS t(doc_id, text)"
    )
    pairs = DD.moss_match_pairs(df, max_df=50).collect()
    assert len(pairs) == 1 and pairs[0]["shared"] >= 1


def test_bm25_matches_python_replay(spark):
    res = QUERIES["bm25_search"](spark, SF_DIR).collect()
    assert len(res) == 20
    docs = read_table(spark, SF_DIR, "documents").collect()
    toklists = {r["doc_id"]: _py_tokens(r["text"]) for r in docs}
    n = len(toklists)
    total = sum(len(t) for t in toklists.values())
    avgdl = total / n
    terms = ["hash", "join", "stream"]
    dfs = {
        t: sum(1 for toks in toklists.values() if t in toks)
        for t in terms
    }
    idf = {t: (10**9 * n) // dfs[t] / 1e9 for t in terms if dfs[t]}
    for row in res:
        toks = toklists[row["doc_id"]]
        dl = len(toks)
        score = 0.0
        for t in terms:
            tf = toks.count(t)
            if tf:
                norm = 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)
                score += idf[t] * (tf * 2.2) / (tf + norm)
        assert row["dl"] == dl
        assert row["bm25"] == pytest.approx(score, abs=0, rel=0), (
            row["doc_id"]
        )
        # saturation sanity: score bounded by sum of idf * (k1 + 1)
        assert row["bm25"] <= sum(idf.values()) * 2.2
