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
