"""Vector math over `array<float>` embedding columns — pure column
expressions (zip_with / aggregate / transform), no UDFs.

Floats are cast to double element-wise before any arithmetic; both Spark's
``aggregate`` and DuckDB's ``list_dot_product`` reduce sequentially
left-to-right in double, so cosine values are bit-identical across engines
(verified empirically on all 2495 pairs of the sf0.01 fixture).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: str) -> Column:
    return F.expr(f"transform({col}, x -> CAST(x AS DOUBLE))")


def dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D,"
        f" (acc, x) -> acc + x)"
    )


def norm(a: str) -> Column:
    return F.expr(
        f"sqrt(aggregate(transform({a}, x -> x * x), 0D, (acc, x) -> acc + x))"
    )


def cosine(a: str, b: str, norm_a: str | None = None, norm_b: str | None = None) -> Column:
    """Cosine similarity; pass precomputed norm column names to avoid
    recomputing norms inside an N×M join."""
    na = F.col(norm_a) if norm_a else norm(a)
    nb = F.col(norm_b) if norm_b else norm(b)
    return dot(a, b) / (na * nb)


# --- unrolled fixed-dimension variants -------------------------------------
# Catalyst interprets higher-order-function lambdas (zip_with/aggregate)
# per element — fine for one pass over a column, slow inside an N×M
# similarity join. For a known dimension, unrolling into a flat
# element_at-product chain stays inside whole-stage codegen and preserves
# the exact left-to-right addition order (bit-identical results).


def dot_unrolled(a: str, b: str, dim: int) -> Column:
    """Dot product over raw float arrays with per-element double casts.

    Deliberately NOT a `transform(arr, CAST)` pre-pass: Catalyst's
    projection collapse inlines such a transform into every element_at
    consumer, re-running the 64-cast array build once per term (measured
    ~40× slowdown inside an N×M join). Per-element casts keep each term a
    2-op expression, and float→double is exact so the sum is unchanged.
    """
    terms = " + ".join(
        f"CAST(element_at({a}, {i}) AS DOUBLE) *"
        f" CAST(element_at({b}, {i}) AS DOUBLE)"
        for i in range(1, dim + 1)
    )
    return F.expr(terms)


def norm_unrolled(a: str, dim: int) -> Column:
    terms = " + ".join(
        f"CAST(element_at({a}, {i}) AS DOUBLE) *"
        f" CAST(element_at({a}, {i}) AS DOUBLE)"
        for i in range(1, dim + 1)
    )
    return F.expr(f"sqrt({terms})")
