"""Physical-plan regression tests: the properties that make these queries
scale (pushdown, pruning, broadcast, partial aggregation) are asserted so
a refactor can't silently trade them away."""

from __future__ import annotations

from database_migration_engine_spark.plans import QUERIES

from .conftest import SF_DIR


def _plan(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_revenue_agg_pushdown_and_pruning(spark):
    plan = _plan(spark, "revenue_agg")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # pruned scan: never reads the join keys it doesn't use
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]
    # two-phase aggregation: partial + final HashAggregate
    assert plan.count("HashAggregate") >= 2


def test_topk_orders_broadcasts_dimension(spark):
    plan = _plan(spark, "topk_orders")
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan


def test_region_rollup_broadcasts_both_dims(spark):
    plan = _plan(spark, "region_rollup")
    assert plan.count("BroadcastHashJoin") == 2
    # customer scan reads only the two columns the query needs
    customer_scan = next(
        seg for seg in plan.split("FileScan parquet")[1:] if "c_acctbal" in seg
    )
    read_schema = customer_scan.split("ReadSchema:")[1].split("\n")[0]
    assert "c_name" not in read_schema and "c_mktsegment" not in read_schema


def test_dedup_exact_shuffles_hash_not_content(spark):
    plan = _plan(spark, "dedup_exact")
    # the exchange operates on the sha2 digest, not the text column
    exchange = plan.split("Exchange hashpartitioning")[1][:200]
    assert "text_hash" in exchange
    assert "text#" not in exchange


def test_window_rank_single_shuffle(spark):
    plan = _plan(spark, "window_rank")
    assert plan.count("Exchange hashpartitioning") == 1
