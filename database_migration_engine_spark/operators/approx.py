"""Approximate aggregation sketches — the scale substitutes for exact
distinct/quantile when error tolerance is acceptable.

The reference has no approximate algorithms (SURVEY.md §2.A explicit
negatives); these are north-star additions: HyperLogLog++ distinct counts
(`approx_count_distinct`) and t-digest-style quantiles
(`percentile_approx`). Not oracle-checkable (sketch internals differ per
engine) — tests assert relative-error bounds against the exact answers
instead.

At 100 TB the exact forms are the expensive path: COUNT(DISTINCT) is a
two-level shuffle over every distinct value, exact percentiles need a full
sort; both sketches are single-pass, mergeable, fixed-memory — they
composed into partial aggregation like any algebraic agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, group_col: str, value_col: str, rsd: float = 0.02
) -> DataFrame:
    """HLL++ distinct count per group with target relative std deviation."""
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias("approx_distinct"),
    )


def approx_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probabilities: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Approximate per-group quantiles (single pass, mergeable)."""
    return df.groupBy(group_col).agg(
        F.percentile_approx(
            value_col, list(probabilities), accuracy
        ).alias("quantiles")
    )
