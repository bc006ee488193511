"""Approximate sketches stay within their error bounds vs exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_migration_engine_spark.io import read_table
from database_migration_engine_spark.operators import approx as AP

from .conftest import SF_DIR_MID


def test_approx_distinct_within_rsd(spark):
    li = read_table(spark, SF_DIR_MID, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    approx = {
        r.l_returnflag: r.approx_distinct
        for r in AP.approx_distinct(li, "l_returnflag", "l_partkey").collect()
    }
    for flag, n in exact.items():
        rel_err = abs(approx[flag] - n) / n
        assert rel_err < 0.05, f"{flag}: {approx[flag]} vs {n} ({rel_err:.3f})"


def test_approx_quantiles_ordered_and_bounded(spark):
    orders = read_table(spark, SF_DIR_MID, "orders")
    rows = AP.approx_quantiles(orders, "o_orderstatus", "o_totalprice").collect()
    bounds = {
        r.o_orderstatus: (r.lo, r.hi)
        for r in orders.groupBy("o_orderstatus")
        .agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
        .collect()
    }
    for r in rows:
        p50, p90, p99 = r.quantiles
        lo, hi = bounds[r.o_orderstatus]
        assert lo <= p50 <= p90 <= p99 <= hi


def test_approx_events_profile_bounds(spark):
    """The registry sketch query stays within HLL rsd and quantile-rank
    tolerance of the exact answers."""
    from database_migration_engine_spark.plans.queries import QUERIES

    ev = read_table(spark, SF_DIR_MID, "events")
    exact_users = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact_vals = {
        t: sorted(r.value for r in ev.filter(F.col("event_type") == t).collect())
        for t in exact_users
    }
    for r in QUERIES["approx_events_profile"](spark, SF_DIR_MID).collect():
        assert abs(r.approx_users - exact_users[r.event_type]) <= max(
            2, 0.05 * exact_users[r.event_type]
        )
        vals = exact_vals[r.event_type]
        n = len(vals)
        for p, got in ((0.5, r.p50), (0.9, r.p90), (0.99, r.p99)):
            # rank tolerance: the sketch's answer must sit within ±1% of
            # the target rank in the exact sorted order
            import bisect
            lo = bisect.bisect_left(vals, got)
            hi = bisect.bisect_right(vals, got)
            target = p * n
            assert lo - 0.02 * n <= target <= hi + 0.02 * n, (
                r.event_type, p, got, lo, hi, target, n,
            )
