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


def test_asof_join_single_key_shuffle(spark):
    """The as-of join must shuffle once on the key — no join explosion,
    no extra exchanges before the window."""
    plan = _plan(spark, "events_asof_purchase")
    # exactly one hash exchange (on _k) + the final sort; no Join operator
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "Window" in plan


def test_copair_banded_equijoin_not_cartesian(spark):
    """The range self-join must decompose to an equi-join keyed on
    (user_id, bucket) — never a cartesian/nested-loop."""
    plan = _plan(spark, "events_copair_60s")
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan
    assert "HashJoin" in plan  # broadcast at test scale, shuffle at 100 TB


def test_price_band_join_broadcasts_dimension(spark):
    plan = _plan(spark, "price_band_join")
    assert "BroadcastNestedLoopJoin" in plan
    # the 10-row band dim is the build side, never the fact table
    assert "BuildRight" in plan


def test_supplier_stats_single_aggregation_pass(spark):
    """All six power sums must come from ONE two-phase aggregation —
    adding moments must not add scans or shuffles."""
    plan = _plan(spark, "supplier_stats")
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_zscore_broadcasts_moments(spark):
    """The per-group moments (5 rows) join back via broadcast; the event
    scan happens twice (moments + join) but shuffles zero times."""
    plan = _plan(spark, "zscore_events")
    assert "BroadcastHashJoin" in plan


def test_top_supplier_agg_before_window(spark):
    """Argmax ranks the (part, supplier) aggregate — the window must see
    grouped rows, not raw lineitem (HashAggregate below Window)."""
    plan = _plan(spark, "top_supplier_per_part")
    assert plan.index("HashAggregate") > plan.index("Window")  # physical plans print top-down


def test_rich_idle_customers_stays_distributed(spark):
    """The scalar threshold must enter the plan as a broadcast join —
    no driver-side collect materializes it."""
    plan = _plan(spark, "rich_idle_customers")
    assert "BroadcastNestedLoopJoin" in plan


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """100 TB knob: with a selective dimension filter, Spark injects a
    runtime bloom filter on the fact side of the shuffle join (fact rows
    that cannot match are dropped at the scan). Size thresholds are
    production-scaled, so this test lowers them to prove the mechanism
    on fixture-sized data."""
    from pyspark.sql import functions as F

    from database_migration_engine_spark.io import read_table

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = read_table(spark, SF_DIR, "lineitem")
        orders = read_table(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan or "BloomFilter" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_join_hints_are_respected(spark):
    """Strategy hints override the optimizer's choice: a merge hint on a
    broadcastable dimension must yield SortMergeJoin, and a broadcast
    hint on the same join must yield BroadcastHashJoin."""
    from pyspark.sql import functions as F

    from database_migration_engine_spark.io import read_table

    orders = read_table(spark, SF_DIR, "orders")
    cust = read_table(spark, SF_DIR, "customer")
    merged = orders.join(
        cust.hint("merge"), orders["o_custkey"] == cust["c_custkey"]
    ).groupBy("c_mktsegment").count()
    assert "SortMergeJoin" in merged._jdf.queryExecution().executedPlan().toString()
    bcast = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    ).groupBy("c_mktsegment").count()
    assert "BroadcastHashJoin" in bcast._jdf.queryExecution().executedPlan().toString()


def test_duplicate_spans_codegen_and_no_python(spark):
    """Shingle enumeration must stay JVM-side (posexplode + window leads
    + codegen md5) — the transform-lambda regression cost 7x at sf0.1."""
    plan = _plan(spark, "duplicate_spans")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan  # no Python at all in this one
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    # the dup-shingle membership join is an equi-join on the digest
    assert "HashJoin" in plan


def test_pack_sequences_no_global_sort(spark):
    """Packing windows sort within each source partition; a global Sort
    before the window would serialize the 100 TB case."""
    plan = _plan(spark, "pack_sequences")
    # exactly one hash exchange for the source-window; rangepartitioning
    # appears only for the final presentation orderBy
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan


def test_source_mixture_sample_broadcasts_rates(spark):
    plan = _plan(spark, "source_mixture_sample")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_events_ks_drift_broadcasts_pairs_and_partitions_cdf(spark):
    plan = _plan(spark, "events_ks_drift")
    assert plan.count("BroadcastHashJoin") >= 2  # both tagged sides
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_source_overlap_equijoin_on_digest(spark):
    plan = _plan(spark, "source_overlap")
    assert "CartesianProduct" not in plan
    # the shingle-set self-join is keyed on the md5 digest
    assert "HashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_price_deciles_no_unpartitioned_window(spark):
    """r03 verdict item 2: the global ntile used to funnel every order
    through one task's sort. The two-pass bucket rank must keep every
    window partitioned (by _bkt) — no single-partition exchange
    anywhere in the plan."""
    plan = _plan(spark, "price_deciles")
    assert "SinglePartition" not in plan
    assert "Window" in plan  # still windowed, but bucket-partitioned


def test_priority_price_distribution_no_unpartitioned_window(spark):
    """r03 verdict item 3: percent_rank over a 5-value partition key is
    a 20%-of-the-table single-task sort at scale; the bucketed rewrite
    partitions every window by (class, price bucket)."""
    plan = _plan(spark, "priority_price_distribution")
    assert "SinglePartition" not in plan


def test_orders_pareto_topk_before_window(spark):
    """r03 verdict item 2: the running-share window may only ever see
    the bounded top-100 — distributed TakeOrderedAndProject first, then
    the (legitimately single-partition) window over 100 rows."""
    plan = _plan(spark, "orders_pareto")
    assert "TakeOrderedAndProject" in plan
    # the window's single-partition exchange sits above the limit, so
    # exactly one is allowed and none may touch the unbounded scan side
    assert plan.count("SinglePartition") == 1


def test_order_price_quartiles_no_low_cardinality_window(spark):
    """r04 verdict item 2: the 5-value priority key made each window
    partition ~20% of the fact table in one task. The bucketed-rank
    rewrite partitions every window by (class, price bucket) — no
    single-partition exchange may appear."""
    plan = _plan(spark, "order_price_quartiles")
    assert "SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan  # probe indices join by broadcast


def test_top_terms_two_phase_no_vocab_window(spark):
    """r04 verdict item 3: per-source row_number over the full vocab
    holds tens of millions of rows in one window partition at corpus
    scale. The two-phase top-k has no Window at all — partial top-5 per
    shuffle partition, then a ≤5×P-row merge."""
    plan = _plan(spark, "top_terms")
    assert "Window" not in plan
    assert "SinglePartition" not in plan


def test_kmeans_broadcasts_centroids_no_cartesian(spark):
    """Each Lloyd iteration joins the k·dims centroid table by
    broadcast; a shuffle or cartesian there would serialize training."""
    plan = _plan(spark, "kmeans_embeddings")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_sf_scaled_dims_join_without_forced_broadcast(spark):
    """r05: customer/part/supplier and per-user aggregates grow with SF,
    so their joins must NOT carry a hard broadcast hint — the hint
    overrides Catalyst's size check and would pin a multi-TB table onto
    every executor at production scale. With auto-broadcast disabled,
    these plans must therefore contain no BroadcastHashJoin at all
    (bounded dims like nation/region keep explicit F.broadcast and are
    absent from these particular queries)."""
    conf = spark.conf
    saved = conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for name in ("topk_orders", "user_retention_cohorts",
                     "suppliers_kept_waiting"):
            plan = _plan(spark, name)
            assert "BroadcastHashJoin" not in plan, name
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, name
    finally:
        if saved is None:
            conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_vocab_coverage_window_only_after_limit(spark):
    """The coverage curve's rank/cumsum window runs strictly over the
    distributed top-1000 (TakeOrderedAndProject), never the full
    vocabulary — the `top_terms` lesson applied by construction."""
    plan = _plan(spark, "vocab_coverage")
    assert "TakeOrderedAndProject" in plan
    # the limit's single-partition exchange is the only one feeding the
    # window; the token-count aggregate below stays hash-partitioned
    assert plan.count("SinglePartition") == 1
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row total attach


def test_scurve_merge_joins_no_cartesian(spark):
    """Truth x candidate pair-graph join is a pair-keyed sort-merge at
    corpus scale — no broadcast, no cartesian. corpus_join waives the
    merge pin below its backing-bytes threshold (r06 size-adaptivity),
    so the corpus-scale shape is asserted by forcing the threshold to 0
    (the exact conf a >threshold input resolves to)."""
    conf = spark.conf
    try:
        conf.set("spark.dbme.corpusJoin.smallBytes", "0")
        plan = _plan(spark, "minhash_band_scurve")
    finally:
        conf.unset("spark.dbme.corpusJoin.smallBytes")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin LeftOuter" in plan or (
        "SortMergeJoin" in plan and "LeftOuter" in plan
    )
    # fixture-scale inputs (sub-threshold backing files) may broadcast
    # instead — but never cartesian
    assert "CartesianProduct" not in _plan(spark, "minhash_band_scurve")


def test_corpus_join_size_gate(spark):
    """The merge pin engages exactly when a side's backing files exceed
    the threshold (or are unknown); both-sides-small frees AQE."""
    from pyspark.sql import functions as F

    from database_migration_engine_spark.io import read_table
    from database_migration_engine_spark.operators.joins import corpus_join

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    a = docs.select("doc_id", F.length("text").alias("n"))
    b = docs.select("doc_id", F.md5("text").alias("h"))

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    # sf0.001 documents.parquet is far below 2 MiB: no pin, Catalyst
    # broadcasts one side
    assert "BroadcastHashJoin" in plan_of(corpus_join(a, b, "doc_id"))
    conf = spark.conf
    try:
        # a tiny threshold simulates corpus-scale backing files
        conf.set("spark.dbme.corpusJoin.smallBytes", "1")
        pinned = plan_of(corpus_join(a, b, "doc_id"))
    finally:
        conf.unset("spark.dbme.corpusJoin.smallBytes")
    assert "SortMergeJoin" in pinned
    # unknown backing (no file source anywhere in the plan) stays pinned
    local = spark.sql("SELECT * FROM (VALUES (1, 'x'), (2, 'y')) t(doc_id, h)")
    assert "SortMergeJoin" in plan_of(corpus_join(local, local, "doc_id"))


def test_dedup_rate_no_window_one_aggregate(spark):
    """Per-source rates come from a groupBy (map-side combinable), not a
    source-partitioned window."""
    plan = _plan(spark, "dedup_rate_by_source")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_bucketed_join_revenue_zero_exchange(spark):
    """r06: the bucketed fact-fact join must run with ZERO exchanges —
    bucketed scans satisfy the SMJ distribution, the orderkey groupBy
    rides the join's partitioning (group keys ⊇ bucket key), and the
    top-20 is TakeOrderedAndProject. One write-time shuffle at ingest,
    none at query time."""
    plan = _plan(spark, "bucketed_join_revenue")
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "Bucketed: true" in plan


def test_approx_join_size_topk_not_global_window(spark):
    """The KMV min-k must be a distributed top-k, never a global
    row_number window (the scale-killer shape the registry bans)."""
    plan = _plan(spark, "approx_join_size")
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_events_corr_hourly_bounded_self_join(spark):
    """The pair join is an hour-key equi-join over the bounded spine —
    no cartesian product, no row-at-a-time Python."""
    plan = _plan(spark, "events_corr_hourly")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_partition_pruned_revenue_scans_one_partition(spark):
    """r06: the o_year filter must resolve as a PartitionFilter against
    the directory listing — exactly one partition scanned, no data-side
    year predicate needed."""
    plan = _plan(spark, "partition_pruned_revenue")
    assert "(o_year" in plan and "= 1997)" in plan
    assert "PartitionFilters: [isnotnull(o_year" in plan, plan
    # the year predicate is resolved ENTIRELY against the listing: no
    # data-side filter remains on the scan
    assert "DataFilters: []" in plan, plan


def test_layout_composed_prunes_and_zero_exchange(spark):
    """r07: the composed partitioned+bucketed lineitem layout must show
    BOTH certified layout properties in ONE physical plan — the ship-year
    filter resolved entirely as a PartitionFilter (no data-side year
    predicate) AND a fully exchange-free bucketed join + per-order
    rollup."""
    plan = _plan(spark, "layout_composed_revenue")
    # partition pruning: listing-level, not data-level — the year
    # predicate lives ONLY in PartitionFilters; DataFilters carry just
    # the join-key null guard
    assert "PartitionFilters: [isnotnull(l_shipyear" in plan, plan
    assert "= 1997)" in plan
    for seg in plan.split("DataFilters: ")[1:]:
        assert "l_shipyear" not in seg.split("]")[0], plan
    # bucketed co-located join: zero exchanges anywhere
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    assert "TakeOrderedAndProject" in plan
