"""Semantic properties of the r05 curation additions: the
contamination-safe split, the entity-resolution crosswalk, and the
robust MAD outlier screen (cross-engine equality is covered by the
oracle parametrization in test_queries_oracle)."""

from pyspark.sql import functions as F

from database_migration_engine_spark.plans import QUERIES

from .conftest import SF_DIR


def test_dedup_aware_split_never_splits_a_cluster(spark):
    df = QUERIES["dedup_aware_split"](spark, SF_DIR)
    straddlers = (
        df.groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddlers == 0


def test_dedup_aware_split_pairs_share_split(spark):
    """Every near-dup PAIR (the thing eval contamination is made of)
    lands wholly inside one split."""
    pairs = QUERIES["ngram_jaccard_pairs"](spark, SF_DIR).select(
        "doc_a", "doc_b"
    )
    split = QUERIES["dedup_aware_split"](spark, SF_DIR)
    joined = (
        pairs.join(
            split.select(
                F.col("doc_id").alias("doc_a"),
                F.col("split").alias("split_a"),
            ),
            "doc_a",
        )
        .join(
            split.select(
                F.col("doc_id").alias("doc_b"),
                F.col("split").alias("split_b"),
            ),
            "doc_b",
        )
    )
    assert joined.filter(F.col("split_a") != F.col("split_b")).count() == 0
    # and the plain doc-keyed split DOES straddle some pair, or this
    # test would be vacuous on the fixture
    doc_h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    naive = F.when(doc_h2 < "1a", "test").when(doc_h2 < "34", "val").otherwise(
        "train"
    )
    naive_split = split.select("doc_id", naive.alias("split"))
    njoined = (
        pairs.join(
            naive_split.select(
                F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")
            ),
            "doc_a",
        )
        .join(
            naive_split.select(
                F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")
            ),
            "doc_b",
        )
    )
    assert njoined.filter(F.col("sa") != F.col("sb")).count() > 0


def test_entity_canonicalize_crosswalk_properties(spark):
    df = QUERIES["entity_canonicalize"](spark, SF_DIR).cache()
    rows = df.collect()
    names = {r["name"] for r in rows}
    by_name = {r["name"]: r for r in rows}
    # total: one row per qualifying name; canonical is a real name and
    # the lexicographic min of its own cluster (min custkey == min name
    # for the fixed-width names, but assert the semantic, not the trick)
    assert all(r["canon_name"] in names for r in rows)
    assert all(r["canon_name"] <= r["name"] for r in rows)
    # canonical rows are their own canonical (idempotent crosswalk)
    for r in rows:
        assert by_name[r["canon_name"]]["canon_name"] == r["canon_name"]
    # cluster_size is consistent with the group it claims
    from collections import Counter

    sizes = Counter(r["canon_name"] for r in rows)
    assert all(sizes[r["canon_name"]] == r["cluster_size"] for r in rows)
    df.unpersist()


def test_mad_outliers_matches_numpy_replay(spark):
    import numpy as np

    got = {
        r["event_type"]: r
        for r in QUERIES["mad_outliers"](spark, SF_DIR).collect()
    }
    from database_migration_engine_spark.io import read_table

    pdf = (
        read_table(spark, SF_DIR, "events")
        .select("event_id", "event_type", "value")
        .toPandas()
    )
    for etype, g in pdf.groupby("event_type"):
        g = g.sort_values(["value", "event_id"], ignore_index=True)
        n = len(g)
        med = g["value"].iloc[(n + 1) // 2 - 1]
        dev = np.abs(g["value"].to_numpy() - med)
        order = np.lexsort((g["event_id"].to_numpy(), dev))
        mad = dev[order[(n + 1) // 2 - 1]]
        r = got[etype]
        assert r["n_events"] == n
        assert r["median_value"] == med
        assert r["mad"] == mad
        assert r["n_outliers"] == int((dev > 3.0 * mad).sum())
