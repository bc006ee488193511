"""Independent replay of the bpe_merge_table artifact (r07): a pure
Python list-greedy BPE trainer — symbol LISTS and an explicit
left-to-right scan, no string-replace encoding — must learn the exact
same 10 merges with the same counts as the Spark plan's
double-delimiter replace chain. This is the third leg of the triangle:
Spark plan ≡ DuckDB unrolled oracle (driver/driver_sim) ≡ naive
reference implementation (here)."""

from __future__ import annotations

import re
from collections import Counter

import pyarrow.parquet as pq

from tests.conftest import SF_DIR


def _tokens(sf_dir: str) -> list[str]:
    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    out: list[str] = []
    for t in texts.column("text").to_pylist():
        out.extend(w for w in re.split("[^a-z]+", (t or "").lower()) if w)
    return [t for t in out if len(t) >= 2]


def _greedy_apply(syms: list[str], l: str, r: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _train(tokens: list[str], n_steps: int) -> list[tuple[int, str, str, int]]:
    corpus = [list(t) for t in tokens]
    merges = []
    for step in range(1, n_steps + 1):
        counts: Counter = Counter()
        for syms in corpus:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += 1
        if not counts:
            break
        # (count desc, left asc, right asc) — the two-column tiebreak
        (l, r), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, l, r, n))
        corpus = [_greedy_apply(s, l, r) for s in corpus]
    return merges


def test_bpe_merge_table_matches_pure_python(spark):
    from database_migration_engine_spark.plans import QUERIES

    got = [
        (row["step"], row["left_sym"], row["right_sym"], row["pair_count"])
        for row in QUERIES["bpe_merge_table"](spark, SF_DIR).collect()
    ]
    want = _train(_tokens(SF_DIR), 10)
    assert got == want


def test_greedy_apply_edge_cases():
    # adjacent non-overlapping matches BOTH merge
    assert _greedy_apply(list("abab"), "a", "b") == ["ab", "ab"]
    # overlapping same-symbol run merges floor(k/2) from the left
    assert _greedy_apply(list("aaa"), "a", "a") == ["aa", "a"]
    assert _greedy_apply(list("aaaa"), "a", "a") == ["aa", "aa"]
    # multi-char symbols never match mid-symbol
    assert _greedy_apply(["dab", "c"], "ab", "c") == ["dab", "c"]
