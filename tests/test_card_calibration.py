"""Semantic properties of the r05 dataset-card / calibration additions:
the LSH banding S-curve, the vocabulary coverage curve, and the
per-source dedup rates (cross-engine equality is covered by the oracle
parametrization in test_queries_oracle)."""

from pyspark.sql import functions as F

from database_migration_engine_spark.plans import QUERIES

from .conftest import SF_DIR


def test_scurve_buckets_and_counts_are_sane(spark):
    rows = QUERIES["minhash_band_scurve"](spark, SF_DIR).collect()
    assert rows, "fixture produced no co-shingled pairs"
    for r in rows:
        assert 0 <= r.bucket <= 9
        assert 0 <= r.n_detected <= r.n_pairs
        assert 0.0 <= r.detection_rate <= 1.0
        assert 0.0 <= r.analytic_rate <= 1.0


def test_scurve_analytic_curve_is_strictly_increasing(spark):
    rows = QUERIES["minhash_band_scurve"](spark, SF_DIR).collect()
    analytic = [r.analytic_rate for r in sorted(rows, key=lambda r: r.bucket)]
    assert all(a < b for a, b in zip(analytic, analytic[1:]))


def test_scurve_analytic_matches_closed_form(spark):
    """The squaring chain computes exactly 1 − (1 − m⁴)⁸ at the decile
    midpoint (r=4 rows, b=8 bands)."""
    for r in QUERIES["minhash_band_scurve"](spark, SF_DIR).collect():
        m = (r.bucket + 0.5) / 10.0
        m4 = (m * m) * (m * m)
        q = 1.0 - m4
        q4 = (q * q) * (q * q)
        assert r.analytic_rate == 1.0 - q4 * q4


def test_vocab_coverage_monotone_and_bounded(spark):
    rows = sorted(
        QUERIES["vocab_coverage"](spark, SF_DIR).collect(),
        key=lambda r: r.k,
    )
    assert [r.k for r in rows] == [5, 10, 25]
    cov = [r.coverage for r in rows]
    assert all(0.0 < c <= 1.0 for c in cov)
    assert cov == sorted(cov)
    for r in rows:
        assert r.covered_tokens <= r.total_tokens


def test_dedup_rates_reconcile_with_direct_counts(spark):
    from database_migration_engine_spark.io import read_table

    out = {r.source: r for r in
           QUERIES["dedup_rate_by_source"](spark, SF_DIR).collect()}
    docs = read_table(spark, SF_DIR, "documents")
    per_source = {
        r.source: r.n
        for r in docs.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert set(out) == set(per_source)
    # independent exact-dup recount: docs whose text appears >1 time
    dup_texts = {
        r.text
        for r in docs.groupBy("text").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1).collect()
    }
    exact = {
        r.source: r.n
        for r in docs.filter(F.col("text").isin(list(dup_texts)) if dup_texts
                             else F.lit(False))
        .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for src, row in out.items():
        assert row.n_docs == per_source[src]
        assert row.n_exact_dup == exact.get(src, 0)
        assert 0.0 <= row.exact_dup_rate <= 1.0
        assert 0.0 <= row.near_dup_rate <= 1.0
        assert row.n_near_dup <= row.n_docs


def test_bigram_novelty_bounds_and_reconciliation(spark):
    rows = QUERIES["bigram_novelty"](spark, SF_DIR).collect()
    assert rows
    total = sum(r.n_bigrams for r in rows)
    for r in rows:
        assert 0 <= r.n_novel <= r.n_bigrams
        assert 0.0 <= r.novel_rate <= 1.0
        # cf_sum >= n_bigrams (every bigram occurs at least once: itself)
        assert r.cf_sum >= r.n_bigrams
        assert 0.0 < r.avg_bigram_p <= 1.0
    # a bigram with corpus count 1 contributes exactly 1 to cf_sum
    # => n_novel <= cf_sum always holds strictly through the join
    assert all(r.n_novel <= r.cf_sum for r in rows)
    assert total > 0


def test_key_skew_histogram_partitions_all_rows(spark):
    from database_migration_engine_spark.io import read_table

    rows = QUERIES["key_skew_histogram"](spark, SF_DIR).collect()
    ev_total = read_table(spark, SF_DIR, "events").count()
    assert sum(r.n_rows for r in rows) == ev_total
    assert abs(sum(r.pct_rows for r in rows) - 1.0) < 1e-9
    for r in rows:
        # bucket b holds keys with 2^b <= count < 2^(b+1)
        assert (1 << r.log2_bucket) <= r.max_key_rows < (
            1 << (r.log2_bucket + 1)
        )


def test_zorder_buckets_band_both_dimensions(spark):
    """The point of the Z-curve: inside a coarse bucket BOTH dimensions
    are tight. Assert the row-weighted mean per-bucket span of each dim
    is well under half its global span (random assignment would sit at
    ~the global span for both)."""
    rows = QUERIES["zorder_locality"](spark, SF_DIR).collect()
    assert rows and sum(r.n_rows for r in rows) > 0
    g_cust = max(r.cust_max for r in rows) - min(r.cust_min for r in rows)
    g_day = max(r.day_max for r in rows) - min(r.day_min for r in rows)
    n = sum(r.n_rows for r in rows)
    w_cust = sum((r.cust_max - r.cust_min) * r.n_rows for r in rows) / n
    w_day = sum((r.day_max - r.day_min) * r.n_rows for r in rows) / n
    assert w_cust < 0.5 * g_cust
    assert w_day < 0.5 * g_day
