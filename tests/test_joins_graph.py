"""Semantic tests for temporal joins, connected components, and the
rank-arithmetic statistics queries (boundaries, tie-breaks, transitivity
— the properties the DuckDB hash-match alone doesn't localize)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from database_migration_engine_spark.io import read_table
from database_migration_engine_spark.operators import graph as GR
from database_migration_engine_spark.operators import joins as JN
from database_migration_engine_spark.plans.queries import QUERIES

from .conftest import SF_DIR


def _values_df(spark, sql: str):
    # inline VALUES → JVM LocalRelation (never createDataFrame: a
    # Python-RDD-backed plan costs seconds per evaluation)
    return spark.sql(sql)


def test_asof_join_boundary_and_ties(spark):
    right = _values_df(
        spark,
        "SELECT * FROM (VALUES (1, 10, 1, 'a'), (1, 10, 2, 'b'),"
        " (1, 20, 3, 'c')) AS r(k, t, seq, tag)",
    )
    left = _values_df(
        spark,
        "SELECT * FROM (VALUES (1, 5, 100), (1, 10, 101), (1, 15, 102),"
        " (1, 25, 103), (2, 50, 104)) AS l(k, t, seq)",
    )
    out = {
        r.seq: (r.asof.tag if r.asof is not None else None)
        for r in JN.asof_join(
            left, right, on="k", left_ts="t", right_ts="t",
            payload_cols=["seq", "tag"], left_seq="seq", right_seq="seq",
        ).collect()
    }
    assert out[100] is None          # nothing at-or-before t=5
    assert out[101] == "b"           # inclusive boundary, max-seq tie-break
    assert out[102] == "b"
    assert out[103] == "c"
    assert out[104] is None          # key with no right rows at all


def test_banded_pairs_equals_naive_range_join(spark):
    ev = read_table(spark, SF_DIR, "events").select("user_id", "event_id", "ts")
    for band_us in (60_000_000, 3_600_000_000):
        banded = {
            (r.a_event_id, r.b_event_id, r.gap_us)
            for r in JN.banded_pairs(
                ev, key="user_id", ts="ts", band_us=band_us, carry=["event_id"]
            ).collect()
        }
        a, b = ev.alias("a"), ev.alias("b")
        naive = {
            (r.a_id, r.b_id, r.gap)
            for r in a.join(b, "user_id")
            .filter(
                (F.col("b.ts") > F.col("a.ts"))
                & (
                    F.unix_micros(F.col("b.ts"))
                    <= F.unix_micros(F.col("a.ts")) + band_us
                )
            )
            .select(
                F.col("a.event_id").alias("a_id"),
                F.col("b.event_id").alias("b_id"),
                (
                    F.unix_micros(F.col("b.ts")) - F.unix_micros(F.col("a.ts"))
                ).alias("gap"),
            )
            .collect()
        }
        assert banded == naive
        assert banded  # non-vacuous


def test_connected_components_path_graph(spark):
    # path 1-2-3-4-5 has diameter 4 → exercises multiple propagation
    # rounds; (10,11) is a separate component; 99 is a singleton
    edges = _values_df(
        spark,
        "SELECT * FROM (VALUES (1, 2), (2, 3), (3, 4), (4, 5), (10, 11))"
        " AS e(a, b)",
    )
    nodes = _values_df(
        spark,
        "SELECT * FROM (VALUES (1), (2), (3), (4), (5), (10), (11), (99))"
        " AS n(node_id)",
    )
    labels = {
        r.node: r.label
        for r in GR.connected_components(
            edges, src="a", dst="b", nodes=nodes, node_col="node_id"
        ).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 99: 99}


def test_dedup_clusters_contain_every_pair(spark):
    from database_migration_engine_spark.operators import dedup as DD

    docs = read_table(spark, SF_DIR, "documents")
    cluster_of = {
        r.doc_id: r.cluster_id
        for r in QUERIES["dedup_clusters"](spark, SF_DIR).collect()
    }
    pairs = DD.ngram_jaccard_pairs(docs, threshold=0.1, max_df=50).collect()
    assert pairs, "fixture should contain near-dup pairs"
    for p in pairs:
        assert cluster_of[p.doc_a] == cluster_of[p.doc_b]
    # cluster_id is the min member (canonical keep-one representative)
    members: dict[int, list[int]] = {}
    for doc, cl in cluster_of.items():
        members.setdefault(cl, []).append(doc)
    for cl, docs_in in members.items():
        assert cl == min(docs_in)


def test_supplier_stats_matches_builtin_moments(spark):
    li = read_table(spark, SF_DIR, "lineitem")
    builtin = {
        r.l_suppkey: r
        for r in li.groupBy("l_suppkey")
        .agg(
            F.var_samp("l_quantity").alias("v"),
            F.corr("l_quantity", "l_extendedprice").alias("c"),
        )
        .collect()
    }
    for r in QUERIES["supplier_stats"](spark, SF_DIR).collect():
        want = builtin[r.l_suppkey]
        assert math.isclose(r.var_qty, want.v, rel_tol=1e-9)
        assert math.isclose(r.std_qty, math.sqrt(want.v), rel_tol=1e-9)
        assert math.isclose(r.corr_qty_price, want.c, rel_tol=1e-6)


def test_order_price_quartiles_rank_arithmetic(spark):
    orders = read_table(spark, SF_DIR, "orders").collect()
    by_prio: dict[str, list[float]] = {}
    for r in orders:
        by_prio.setdefault(r.o_orderpriority, []).append(r.o_totalprice)
    for r in QUERIES["order_price_quartiles"](spark, SF_DIR).collect():
        vals = sorted(by_prio[r.o_orderpriority])
        n = len(vals)
        assert r.n_orders == n
        assert r.q1_price == vals[(n + 3) // 4 - 1]
        assert r.median_price == (
            vals[(n + 1) // 2 - 1] + vals[(n + 2) // 2 - 1]
        ) / 2
        assert r.q3_price == vals[(3 * n + 3) // 4 - 1]


def test_hopping_windows_cover_each_event_twice(spark):
    ev_count = read_table(spark, SF_DIR, "events").count()
    hopped = QUERIES["events_hopping"](spark, SF_DIR)
    total = hopped.agg(F.sum("n_events")).first()[0]
    assert total == 2 * ev_count
    # each window is exactly 10 minutes wide
    widths = hopped.select(
        (
            F.unix_micros(F.to_timestamp("win_end"))
            - F.unix_micros(F.to_timestamp("win_start"))
        ).alias("w")
    ).distinct().collect()
    assert {r.w for r in widths} == {600_000_000}


def test_top_terms_excludes_stopwords_and_ranks(spark):
    from database_migration_engine_spark.functions.text import STOPWORDS

    stops = {w for words in STOPWORDS.values() for w in words}
    rows = QUERIES["top_terms"](spark, SF_DIR).collect()
    assert rows
    by_source: dict[str, list] = {}
    for r in rows:
        assert r.token not in stops
        by_source.setdefault(r.source, []).append(r)
    for src, rs in by_source.items():
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        dfs = [r.df for r in rs]
        assert dfs == sorted(dfs, reverse=True)


def test_asof_join_equals_naive_on_random_data(spark):
    """Seeded-random equivalence: the union+window as-of must agree with
    the naive join-then-rank formulation on ties, boundaries, and
    missing-key cases alike."""
    import random

    rng = random.Random(20260813)
    rights = [
        (rng.randrange(8), rng.randrange(50), seq) for seq in range(120)
    ]
    lefts = [
        (rng.randrange(10), rng.randrange(50), 1000 + seq)
        for seq in range(200)
    ]
    right = _values_df(
        spark,
        "SELECT * FROM (VALUES "
        + ",".join(f"({k},{t},{s})" for k, t, s in rights)
        + ") AS r(k, t, seq)",
    )
    left = _values_df(
        spark,
        "SELECT * FROM (VALUES "
        + ",".join(f"({k},{t},{s})" for k, t, s in lefts)
        + ") AS l(k, t, seq)",
    )
    got = {
        r.seq: (r.asof.seq if r.asof is not None else None)
        for r in JN.asof_join(
            left, right, on="k", left_ts="t", right_ts="t",
            payload_cols=["seq"], left_seq="seq", right_seq="seq",
        ).collect()
    }
    naive = {
        r.lseq: r.rseq
        for r in spark.sql(
            "SELECT lseq, rseq FROM ("
            "  SELECT l.seq AS lseq, r.seq AS rseq,"
            "         ROW_NUMBER() OVER (PARTITION BY l.seq"
            "             ORDER BY r.t DESC, r.seq DESC) AS rn"
            "  FROM {l} l JOIN {r} r ON r.k = l.k AND r.t <= l.t"
            ") WHERE rn = 1",
            l=left,
            r=right,
        ).collect()
    }
    for lseq, want in naive.items():
        assert got[lseq] == want
    for lseq, val in got.items():
        if lseq not in naive:
            assert val is None


def test_connected_components_no_edges_all_singletons(spark):
    edges = _values_df(
        spark, "SELECT * FROM (VALUES (1, 2)) AS e(a, b)"
    ).filter("a > 100")  # empty edge set with a stable schema
    nodes = _values_df(
        spark, "SELECT * FROM (VALUES (7), (8), (9)) AS n(node_id)"
    )
    labels = {
        r.node: r.label
        for r in GR.connected_components(
            edges, src="a", dst="b", nodes=nodes, node_col="node_id"
        ).collect()
    }
    assert labels == {7: 7, 8: 8, 9: 9}


def test_star_cc_matches_propagation_and_converges_on_long_path(spark):
    """large-star/small-star must agree with min-propagation on a random
    graph AND converge on a path graph whose diameter exceeds the
    propagation round cap — the property that makes it the 100 TB path."""
    import random

    rng = random.Random(7)
    edge_list = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(40)
    ]
    edge_list = [(a, b) for a, b in edge_list if a != b]
    edges = _values_df(
        spark,
        "SELECT * FROM (VALUES "
        + ",".join(f"({a},{b})" for a, b in edge_list)
        + ") AS e(a, b)",
    )
    nodes = _values_df(
        spark,
        "SELECT explode(sequence(0, 59)) AS node_id",
    )
    simple = {
        r.node: r.label
        for r in GR.connected_components(
            edges, "a", "b", nodes, "node_id"
        ).collect()
    }
    star = {
        r.node: r.label
        for r in GR.connected_components_star(
            edges, "a", "b", nodes, "node_id"
        ).collect()
    }
    assert star == simple

    # path 0-1-2-...-63: diameter 63 > propagation's 25-round cap; the
    # star algorithm must still fully converge (all nodes label 0)
    path = _values_df(
        spark,
        "SELECT id AS a, id + 1 AS b FROM range(63)",
    )
    path_nodes = _values_df(spark, "SELECT explode(sequence(0, 63)) AS node_id")
    star_path = {
        r.node: r.label
        for r in GR.connected_components_star(
            path, "a", "b", path_nodes, "node_id"
        ).collect()
    }
    assert star_path == {i: 0 for i in range(64)}


class TestLabelPropagation:
    def test_frontier_frozen_majority(self, spark):
        """Chain 0-1-2-3-4 with seeds at the ends: node 1 takes 0's
        label in round 1 and FREEZES; node 2 ties between the two
        frontiers in round 2 and takes the lexicographically smaller
        label; unreachable nodes stay NULL."""
        from database_migration_engine_spark.operators.graph import (
            label_propagation,
        )

        edges = spark.sql(
            "SELECT * FROM (VALUES (0,1),(1,2),(2,3),(3,4),(9,9)) "
            "t(src, dst)"
        )
        seeds = spark.sql(
            "SELECT * FROM (VALUES "
            "(0, 'aa'), (4, 'zz'), (1, CAST(NULL AS STRING)), "
            "(2, CAST(NULL AS STRING)), (3, CAST(NULL AS STRING)), "
            "(7, CAST(NULL AS STRING)), (9, CAST(NULL AS STRING))) "
            "t(node, lbl)"
        )
        # edges must be symmetric for propagation both ways
        sym = edges.union(edges.selectExpr("dst AS src", "src AS dst"))
        out = {
            r.node: r.lbl
            for r in label_propagation(sym, seeds, rounds=3).collect()
        }
        assert out[0] == "aa" and out[4] == "zz"  # seeds keep labels
        assert out[1] == "aa" and out[3] == "zz"  # round-1 frontier
        assert out[2] == "aa"  # tie at round 2 -> lexicographic min
        assert out[7] is None  # disconnected: never labeled
        assert out[9] is None  # self-loop only, no labeled neighbor

    def test_rounds_bound_radius(self, spark):
        from database_migration_engine_spark.operators.graph import (
            label_propagation,
        )

        edges = spark.sql(
            "SELECT * FROM (VALUES (0,1),(1,2),(2,3)) t(src, dst)"
        )
        sym = edges.union(edges.selectExpr("dst AS src", "src AS dst"))
        seeds = spark.sql(
            "SELECT * FROM (VALUES (0, 'x'), (1, CAST(NULL AS STRING)),"
            " (2, CAST(NULL AS STRING)), (3, CAST(NULL AS STRING)))"
            " t(node, lbl)"
        )
        out = {
            r.node: r.lbl
            for r in label_propagation(sym, seeds, rounds=2).collect()
        }
        assert out[1] == "x" and out[2] == "x"
        assert out[3] is None  # 3 hops away, only 2 rounds
