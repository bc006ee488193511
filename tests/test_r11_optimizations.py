"""Round-11 optimization internals (guide §4.2 / §2.5 + verdict r10):

* ``pq_assign`` moved from a posexplode → broadcast-join → rank-1 window
  plan to ONE Arrow ``mapInPandas`` kernel — parity-tested bit-for-bit
  against the former SQL formulation (same left-assoc distance chains,
  same (dist, j) tie-break).
* ``mmr_rerank`` gained an explicit driver-collect bound (verdict item
  4): a corpus-sized queries side must fail fast, not OOM the driver.
* ``spread_input`` gates on exact backing-file bytes (ADVICE r10), not
  on ``df.rdd`` physical planning: small file-backed inputs spread,
  large or unknown-size inputs pass through unchanged.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from database_migration_engine_spark.io import read_table
from database_migration_engine_spark.operators import dedup as DD
from database_migration_engine_spark.operators import similarity as SIM

SF_DIR = "/root/testdata/sf0.001"


def _pq_assign_sql_reference(corpus, codebook, m=8, dim=64):
    """The pre-r11 pq_assign plan, kept verbatim as the parity oracle."""
    sub = dim // m
    sv = corpus.select(
        F.col("vec_id"),
        F.posexplode(
            F.array(*[SIM.subvec_expr(s, "embedding", sub) for s in range(m)])
        ).alias("s", "u"),
    )
    cb = codebook.select(
        F.col("vec_id").alias("j"),
        F.posexplode(
            F.array(*[SIM.subvec_expr(s, "embedding", sub) for s in range(m)])
        ).alias("s", "c"),
    )
    diff2 = [
        (F.col("u")[d] - F.col("c")[d]) * (F.col("u")[d] - F.col("c")[d])
        for d in range(sub)
    ]
    dist = diff2[0]
    for term in diff2[1:]:
        dist = dist + term
    return (
        sv.join(F.broadcast(cb), "s")
        .withColumn("dist", dist)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id", "s").orderBy("dist", "j")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("vec_id", "s", "j", "dist")
    )


class TestPqAssignArrowParity:
    def test_bit_identical_to_window_formulation(self, spark):
        emb = read_table(spark, SF_DIR, "embeddings")
        cb = emb.filter(F.col("vec_id") < 16)
        got = {
            (r.vec_id, r.s): (r.j, r.dist)
            for r in SIM.pq_assign(emb, cb).collect()
        }
        want = {
            (r.vec_id, r.s): (r.j, r.dist)
            for r in _pq_assign_sql_reference(emb, cb).collect()
        }
        assert got.keys() == want.keys()
        for key in want:
            assert got[key][0] == want[key][0], key
            # bit-exact: the kernel accumulates the same IEEE sequence
            assert got[key][1] == want[key][1], key

    def test_schema_unchanged(self, spark):
        emb = read_table(spark, SF_DIR, "embeddings")
        cb = emb.filter(F.col("vec_id") < 16)
        fields = {
            f.name: f.dataType.simpleString()
            for f in SIM.pq_assign(emb, cb).schema.fields
        }
        assert fields == {
            "vec_id": "bigint", "s": "int", "j": "bigint", "dist": "double"
        }


class TestMmrCollectGuard:
    def test_oversized_pool_fails_fast(self, spark, monkeypatch):
        emb = read_table(spark, SF_DIR, "embeddings")
        monkeypatch.setattr(SIM, "MAX_COLLECTED_QUERIES", 10)
        with pytest.raises(ValueError, match="bounded re-rank batch"):
            SIM.mmr_rerank(
                emb, emb.filter(F.col("vec_id") < 5), k=2, pool=4
            )


class TestSpreadInputGate:
    def test_small_file_backed_input_spreads(self, spark):
        docs = read_table(spark, SF_DIR, "documents")
        out = DD.spread_input(docs, "doc_id")
        assert "repartitionbyexpression" in (
            out._jdf.queryExecution().logical().toString().lower()
        )

    def test_unknown_size_passes_through(self, spark):
        docs = read_table(spark, SF_DIR, "documents").localCheckpoint(
            eager=True
        )
        out = DD.spread_input(docs, "doc_id")
        assert out is docs

    def test_large_input_passes_through(self, spark, monkeypatch):
        monkeypatch.setattr(DD, "SPREAD_SMALL_BYTES", 1)
        docs = read_table(spark, SF_DIR, "documents")
        out = DD.spread_input(docs, "doc_id")
        assert out is docs


class TestSelectAtRanks:
    """select_at_ranks must return exactly the rows with_global_ranks +
    rank filter would — the bucket pruning may only skip buckets that
    contain no target rank."""

    def test_parity_with_full_rank_filter(self, spark):
        from database_migration_engine_spark.operators import ranks as RK

        orders = read_table(spark, SF_DIR, "orders").select(
            "o_orderpriority", "o_orderkey", "o_totalprice"
        )
        ranked, totals = RK.with_global_ranks(
            orders, "o_totalprice", ["o_orderkey"],
            partition_cols=["o_orderpriority"],
        )
        targets = {
            g: sorted({1, (n + 1) // 2, n}) for g, n in totals.items()
        }
        want = {
            (r["o_orderpriority"], r["rn"]): r["o_totalprice"]
            for r in ranked.collect()
            if r["rn"] in targets[(r["o_orderpriority"],)]
        }
        sel, totals2 = RK.select_at_ranks(
            orders, "o_totalprice", ["o_orderkey"],
            lambda tot: {g: targets[g] for g in tot},
            partition_cols=["o_orderpriority"],
        )
        got = {
            (r["o_orderpriority"], r["rn"]): r["o_totalprice"]
            for r in sel.collect()
        }
        assert totals2 == totals
        assert got == want

    def test_caller_supplied_boundaries_skip_sketch(self, spark):
        from database_migration_engine_spark.operators import ranks as RK

        orders = read_table(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        # ANY monotone boundary set yields the same selected rows
        sel_a, tot_a = RK.select_at_ranks(
            orders, "o_totalprice", ["o_orderkey"],
            lambda tot: {g: [(n + 1) // 2] for g, n in tot.items()},
        )
        sel_b, tot_b = RK.select_at_ranks(
            orders, "o_totalprice", ["o_orderkey"],
            lambda tot: {g: [(n + 1) // 2] for g, n in tot.items()},
            boundaries=[1000.0, 50000.0],  # deliberately unbalanced
        )
        assert tot_a == tot_b
        assert (
            [(r["rn"], r["o_totalprice"]) for r in sel_a.collect()]
            == [(r["rn"], r["o_totalprice"]) for r in sel_b.collect()]
        )


class TestShingleWindowSpread:
    def test_small_input_window_runs_wide(self, spark):
        docs = read_table(spark, SF_DIR, "documents")
        plan = (
            DD.positioned_shingles(docs, "doc_id", "text", 4)
            ._jdf.queryExecution().logical().toString().lower()
        )
        assert "repartitionbyexpression" in plan

    def test_unknown_size_keeps_aqe_width(self, spark):
        docs = read_table(spark, SF_DIR, "documents").localCheckpoint(
            eager=True
        )
        plan = (
            DD.positioned_shingles(docs, "doc_id", "text", 4)
            ._jdf.queryExecution().logical().toString().lower()
        )
        assert "repartitionbyexpression" not in plan


class TestCcAdaptiveWidth:
    def test_tiny_graph_rounds_run_narrow(self, spark):
        """Fixture-scale graphs must iterate at width 1 (the measured
        win), and labels must be the exact component minima."""
        from database_migration_engine_spark.operators import graph as GR

        edges = RKV = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)], "a int, b int"
        )
        nodes = spark.range(1, 23).selectExpr("CAST(id AS INT) AS n")
        labels = GR.connected_components(
            edges, src="a", dst="b", nodes=nodes, node_col="n",
            shuffle_partitions=16,
        )
        got = {r["node"]: r["label"] for r in labels.collect()}
        assert got[3] == 1 and got[11] == 10 and got[22] == 20
        # the iterating label RDD was checkpointed at the adaptive width
        assert labels.rdd.getNumPartitions() == 1
        labels.unpersist()
