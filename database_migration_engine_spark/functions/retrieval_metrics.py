"""Shared ranking-metric constants for `retrieval_eval`.

NDCG's per-position discount 1/log2(pos+1) is the ONE place a retrieval
evaluation normally lets an engine's ``log`` into the pipeline — and
libm implementations are free to differ in the last bit. The unigram /
BM25 discipline applies here too: compute the discounts ONCE, driver
side, freeze them as integer literals at 10^12 scale, and hand the SAME
literals to the Spark plan and the DuckDB oracle. DCG then becomes an
exact integer dot product (max ≈ 4·10^13, far inside exact-double
range), and NDCG/MRR are each one division of exactly representable
integers — bit-identical on any engine.

Reference anchor: the reference engine has no retrieval surface at all
(SURVEY.md §2.A is ledger CRUD); this module serves the §2.B
retrieval-evaluation query the r04 verdict's stretch item asked for.
"""

from __future__ import annotations

import math

K_EVAL = 10
"""Evaluation depth: metrics are @10."""

DISC_SCALE = 10**12

DISCOUNTS_INT: list[int] = [
    int(DISC_SCALE / math.log2(pos + 1)) for pos in range(1, K_EVAL + 1)
]
"""Frozen integer NDCG discounts for positions 1..K_EVAL."""

IDCG_INT: int = sum(
    (K_EVAL + 1 - pos) * DISCOUNTS_INT[pos - 1] for pos in range(1, K_EVAL + 1)
)
"""Ideal DCG for the graded gains (K_EVAL..1) this eval assigns the
exact-cosine top-K_EVAL — a Python-exact integer both engines receive
as a literal."""
