"""Round-3 wave-3 operators: passage-level span coverage, sequence
packing, and portable mixture sampling.

The registry queries are oracle-checked end-to-end (test_queries_oracle);
these tests pin the operator SEMANTICS on crafted inputs — exact coverage
counts for shared passages, bin-assignment invariants for packing, and
three-way (Spark = DuckDB = hashlib) portability of the uniform fraction
that drives rate-threshold sampling.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from database_migration_engine_spark.functions.portable_hash import (
    uniform_frac_sql,
)
from database_migration_engine_spark.operators import dedup as DD
from database_migration_engine_spark.plans import QUERIES

from .conftest import SF_DIR


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestSpanCoverage:
    def test_shared_8gram_covers_both_docs(self, spark):
        shared = "alpha beta gamma delta epsilon zeta eta theta"
        docs = _docs(
            spark,
            [
                f"unique one two three {shared}",
                f"{shared} other closing words here",
                "totally different content with no overlap at all whatsoever",
            ],
        )
        rows = {
            r.doc_id: r
            for r in DD.span_coverage(docs, n=8).collect()
        }
        # exactly the 8 shared tokens are covered in each sharing doc
        assert rows[0].n_dup_tokens == 8
        assert rows[1].n_dup_tokens == 8
        assert rows[2].n_dup_tokens == 0

    def test_overlapping_shingles_union_not_sum(self, spark):
        # 9 shared consecutive tokens → two overlapping 8-gram shingles;
        # coverage must be the union (9), not 2 × 8
        shared = "one two three four five six seven eight nine"
        docs = _docs(
            spark,
            [f"{shared} tail words", f"lead {shared}"],
        )
        rows = {r.doc_id: r for r in DD.span_coverage(docs, n=8).collect()}
        assert rows[0].n_dup_tokens == 9
        assert rows[1].n_dup_tokens == 9

    def test_short_docs_have_no_shingles(self, spark):
        docs = _docs(spark, ["a b c", "a b c", ""])
        for r in DD.span_coverage(docs, n=8).collect():
            assert r.n_dup_tokens == 0

    def test_within_doc_repetition_is_not_duplication(self, spark):
        # the same 8-gram twice in ONE doc is repetition, not cross-doc
        # duplication — countDistinct(doc_id) >= 2 must not fire
        span = "q w e r t y u i"
        docs = _docs(spark, [f"{span} {span}", "unrelated text entirely"])
        rows = {r.doc_id: r for r in DD.span_coverage(docs, n=8).collect()}
        assert rows[0].n_dup_tokens == 0


class TestPackSequences:
    def test_bin_invariants(self, spark):
        out = QUERIES["pack_sequences"](spark, SF_DIR).collect()
        by_source: dict[str, list] = {}
        for r in out:
            by_source.setdefault(r.source, []).append(r)
        assert by_source, "no bins produced"
        for source, rows in by_source.items():
            rows.sort(key=lambda r: r.seq_bin)
            # bins are contiguous from 0
            assert [r.seq_bin for r in rows] == list(range(len(rows)))
            # doc ranges are disjoint and ordered across bins
            for a, b in zip(rows, rows[1:]):
                assert a.last_doc_id < b.first_doc_id
            # every bin is assigned by cum_before: each non-final bin's
            # cumulative token count must reach its budget boundary
            cum = 0
            for r in rows[:-1]:
                cum += r.bin_tokens
                assert cum >= (r.seq_bin + 1) * 2048

    def test_totals_preserved(self, spark, duck):
        out = QUERIES["pack_sequences"](spark, SF_DIR)
        total = out.agg(
            F.sum("bin_tokens").alias("t"), F.sum("n_docs").alias("d")
        ).collect()[0]
        n_docs = duck.sql(
            f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet'"
        ).fetchone()[0]
        assert total.d == n_docs
        assert total.t > 0


class TestMixtureSample:
    def test_uniform_frac_three_way(self, spark, duck):
        keys = [str(i) for i in range(200)]
        expected = [
            int(hashlib.md5(k.encode()).hexdigest()[:8], 16) / 2**32
            for k in keys
        ]
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        got_spark = [
            r.u
            for r in df.select(
                F.expr(uniform_frac_sql("md5(k)")).alias("u")
            ).collect()
        ]
        assert got_spark == expected
        got_duck = [
            row[0]
            for row in duck.sql(
                "SELECT " + uniform_frac_sql("md5(CAST(i AS VARCHAR))")
                + " FROM generate_series(0, 199) AS g(i) ORDER BY i"
            ).fetchall()
        ]
        assert got_duck == expected

    def test_budget_downsamples_every_source(self, spark, duck):
        kept = QUERIES["source_mixture_sample"](spark, SF_DIR)
        kept_counts = {
            r.source: r.c
            for r in kept.groupBy("source")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        totals = dict(
            duck.sql(
                f"SELECT source, COUNT(*) FROM '{SF_DIR}/documents.parquet'"
                " GROUP BY source"
            ).fetchall()
        )
        for source, total in totals.items():
            assert kept_counts.get(source, 0) <= total
        # the sample is a real downsample overall (budget 10 per source)
        assert sum(kept_counts.values()) < sum(totals.values())

    def test_sample_is_deterministic(self, spark):
        a = sorted(
            r.doc_id
            for r in QUERIES["source_mixture_sample"](spark, SF_DIR).collect()
        )
        b = sorted(
            r.doc_id
            for r in QUERIES["source_mixture_sample"](spark, SF_DIR).collect()
        )
        assert a == b


class TestKsDrift:
    def test_identical_distribution_gives_zero(self, spark):
        # two types with the SAME value multiset → D = 0; a disjoint
        # third type → D = 1 against either
        rows = ",".join(
            f"('a', {v}), ('b', {v}), ('c', {v + 1000})"
            for v in (1.0, 2.0, 3.0, 4.0)
        )
        df = spark.sql(
            f"SELECT * FROM (VALUES {rows}) AS t(event_type, value)"
        )
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        types = df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        # reuse the registry plan's math by rebuilding it on this tiny df
        pairs = (
            types.alias("x")
            .join(types.alias("y"), F.col("x.event_type") < F.col("y.event_type"))
            .select(
                F.col("x.event_type").alias("type_a"),
                F.col("x.n").alias("n_a"),
                F.col("y.event_type").alias("type_b"),
                F.col("y.n").alias("n_b"),
            )
        )
        sa = df.join(pairs, df.event_type == F.col("type_a")).select(
            "type_a", "type_b", "n_a", "n_b", "value",
            F.lit(1).alias("ca"), F.lit(0).alias("cb"))
        sb = df.join(pairs, df.event_type == F.col("type_b")).select(
            "type_a", "type_b", "n_a", "n_b", "value",
            F.lit(0).alias("ca"), F.lit(1).alias("cb"))
        w = (
            Window.partitionBy("type_a", "type_b")
            .orderBy("value")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        ks = (
            sa.unionByName(sb)
            .groupBy("type_a", "type_b", "n_a", "n_b", "value")
            .agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
            .withColumn("cum_a", F.sum("ca").over(w))
            .withColumn("cum_b", F.sum("cb").over(w))
            .groupBy("type_a", "type_b", "n_a", "n_b")
            .agg(F.max(F.abs(F.col("cum_a") * F.col("n_b")
                             - F.col("cum_b") * F.col("n_a"))).alias("d"))
            .withColumn("ks", F.col("d") / (F.col("n_a") * F.col("n_b")))
        )
        got = {(r.type_a, r.type_b): r.ks for r in ks.collect()}
        assert got[("a", "b")] == 0.0
        assert got[("a", "c")] == 1.0
        assert got[("b", "c")] == 1.0


class TestPagerank:
    def test_rank_invariants(self, spark):
        from database_migration_engine_spark.io import read_table
        from database_migration_engine_spark.operators import dedup as DD

        out = {
            r.doc_id: r
            for r in QUERIES["pagerank_docs"](spark, SF_DIR).collect()
        }
        docs = read_table(spark, SF_DIR, "documents")
        assert len(out) == docs.count()
        pairs = DD.ngram_jaccard_pairs(
            docs, threshold=0.1, max_df=50
        ).collect()
        linked = {r.doc_a for r in pairs} | {r.doc_b for r in pairs}
        n = len(out)
        base = (15 * (10**12 // n)) // 100
        for doc_id, r in out.items():
            if doc_id not in linked:
                # isolated docs receive no contributions: exactly base
                assert r.rank_int == base, doc_id
            else:
                assert r.rank_int >= base, doc_id
        # linked docs accumulate centrality above the floor
        assert any(out[d].rank_int > base for d in linked)
        assert all(abs(r.rank - r.rank_int / 1e12) < 1e-15 for r in out.values())


class TestKmv:
    def test_kmv_estimate_accuracy(self, spark):
        rows = QUERIES["approx_distinct_kmv"](spark, SF_DIR).collect()
        assert rows, "no groups"
        for r in rows:
            if r.n_exact >= 64:
                # KMV with k=64 has ~1/sqrt(62) ≈ 13% std error;
                # 40% is a generous determinism-safe bound
                assert r.rel_error < 0.40, (r.event_type, r.rel_error)
            else:
                assert r.kmv_estimate == float(r.n_exact)


class TestExactSubstrSpans:
    def test_known_span_length_and_extents(self, spark):
        """A 12-token verbatim paragraph inside two otherwise-different
        documents: the longest run must be exactly 12 tokens with the
        exact 1-based start positions on both sides."""
        para = "the quick brown fox jumps over the lazy dog near riverbank today"
        assert len(para.split()) == 12
        docs = _docs(
            spark,
            [
                f"intro words here {para} closing remarks",      # starts at 4
                f"completely different opening sentence {para}",  # starts at 5
            ],
        )
        pairs = spark.sql("SELECT * FROM (VALUES (0, 1)) t(doc_a, doc_b)")
        out = DD.exact_substr_spans(docs, pairs, n=8).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.run_len, r.start_a, r.start_b, r.n_runs) == (12, 4, 5, 1)

    def test_catches_long_span_the_jaccard_screen_dilutes(self, spark):
        """ExactSubstr's reason to exist: a 16-token verbatim quote inside
        two large unrelated documents. Whole-doc 3-gram Jaccard is tiny
        (the screen at its default 0.1 threshold would drop the pair),
        but the span is found exactly once the pair is a candidate."""
        # letters-only words: tokens() splits on [^a-z]+, so digit
        # suffixes would collapse every word to one repeated token
        def w(prefix, i):
            return prefix + chr(97 + i // 26) + chr(97 + i % 26)

        quote = " ".join(w("quoted", i) for i in range(16))
        filler_a = " ".join(w("aword", i) for i in range(300))
        filler_b = " ".join(w("bword", i) for i in range(300))
        docs = _docs(spark, [f"{filler_a} {quote}", f"{quote} {filler_b}"])
        screened = DD.ngram_jaccard_pairs(docs, threshold=0.1, max_df=50)
        assert screened.count() == 0  # Jaccard dilution: screen misses it
        pairs = spark.sql("SELECT * FROM (VALUES (0, 1)) t(doc_a, doc_b)")
        r = DD.exact_substr_spans(docs, pairs, n=8).collect()[0]
        assert (r.run_len, r.start_a, r.start_b) == (16, 301, 1)

    def test_two_disjoint_runs_counted(self, spark):
        run1 = " ".join("first" + chr(97 + i) for i in range(9))
        run2 = " ".join("second" + chr(97 + i) for i in range(10))
        docs = _docs(
            spark,
            [
                f"{run1} middle padding words only {run2}",
                f"{run2} unrelated connective tissue {run1}",
            ],
        )
        pairs = spark.sql("SELECT * FROM (VALUES (0, 1)) t(doc_a, doc_b)")
        r = DD.exact_substr_spans(docs, pairs, n=8).collect()[0]
        assert r.run_len == 10 and r.n_runs == 2

    def test_no_shared_span_empty(self, spark):
        docs = _docs(
            spark,
            [
                " ".join("left" + chr(97 + i // 26) + chr(97 + i % 26) for i in range(40)),
                " ".join("right" + chr(97 + i // 26) + chr(97 + i % 26) for i in range(40)),
            ],
        )
        pairs = spark.sql("SELECT * FROM (VALUES (0, 1)) t(doc_a, doc_b)")
        assert DD.exact_substr_spans(docs, pairs, n=8).count() == 0
