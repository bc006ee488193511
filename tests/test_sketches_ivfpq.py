"""Portable sketch trio (Count-Min, Bloom, sampled quantiles) and the
IVF-PQ ADC retrieval capstone — semantic guarantees beyond the oracle
equality (which test_queries_oracle covers):

* CM: one-sided error (est ≥ exact, bounded overshoot)
* Bloom: no false negatives; false-positive rate sane for m/n
* sampled quantiles: estimate within the sample-size error bound
* IVF-PQ: recall@5 vs exact cosine stays above the IVF baseline floor
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from database_migration_engine_spark.io import read_table
from database_migration_engine_spark.operators import approx as AP
from database_migration_engine_spark.operators import similarity as SIM
from database_migration_engine_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


class TestCountMin:
    def test_one_sided_error(self, spark):
        out = QUERIES["count_min_users"](spark, SF_DIR).collect()
        assert len(out) > 0
        n_total = sum(r.exact_n for r in out)
        for r in out:
            assert r.cm_est >= r.exact_n  # never undercounts
            # ε = e/width ≈ 0.0425; allow 2× slack on the εN bound
            assert r.cm_est - r.exact_n <= 2 * 2.72 / 64 * n_total

    def test_sketch_is_fixed_size(self, spark):
        ev = read_table(spark, SF_DIR, "events")
        cells = AP.count_min_sketch(ev, "user_id")
        assert cells.count() <= 4 * 64


class TestBloom:
    def test_no_false_negatives(self, spark):
        out = QUERIES["bloom_screen"](spark, SF_DIR).collect()
        for r in out:
            assert r.n_bloom_hits >= r.n_true_members
            assert r.n_false_positives == r.n_bloom_hits - r.n_true_members

    def test_probe_rejects_non_members(self, spark):
        # filter over a tiny member set: most of a disjoint probe set
        # must miss (the filter is doing real work, not returning true)
        members = spark.range(0, 10).select(F.col("id").alias("user_id"))
        probes = spark.range(1000, 1200).select(F.col("id").alias("user_id"))
        bits = AP.bloom_build(members, "user_id")
        hit = AP.bloom_probe(probes, bits, "user_id")
        n_hits = hit.filter("bloom_hit").count()
        assert n_hits < 20  # 200 non-members, fp rate ≈ (30/1024*3)^3 ≪ 10%

    def test_members_always_hit(self, spark):
        members = spark.range(0, 50).select(F.col("id").alias("user_id"))
        bits = AP.bloom_build(members, "user_id")
        hit = AP.bloom_probe(members, bits, "user_id")
        assert hit.filter("bloom_hit").count() == 50


class TestSampledQuantiles:
    def test_estimates_near_exact(self, spark):
        out = QUERIES["sampled_quantiles"](spark, SF_DIR).collect()
        for r in out:
            assert r.n_sample <= 200
            spread = max(abs(r.p90_exact), 1e-9)
            # bottom-k of 200 on ~400 rows: generous rank-error bound
            assert abs(r.p50_sample - r.p50_exact) <= 0.35 * spread
            assert abs(r.p90_sample - r.p90_exact) <= 0.35 * spread


class TestIVFPQ:
    def test_recall_vs_exact(self, spark):
        emb = read_table(spark, SF_DIR, "embeddings")
        got = {
            (r.qid, r.rnk): r.nid
            for r in QUERIES["similarity_ivfpq"](spark, SF_DIR).collect()
        }
        assert len(got) > 0
        # exact cosine top-5 (same query set)
        queries_df = emb.filter(F.col("vec_id") < 50)
        exact = SIM.cosine_topk(emb, queries_df, k=5)
        exact_sets: dict[int, set] = {}
        for r in exact.collect():
            exact_sets.setdefault(r.qid, set()).add(r.nid)
        pq_sets: dict[int, set] = {}
        for (qid, _), nid in got.items():
            pq_sets.setdefault(qid, set()).add(nid)
        recalls = [
            len(pq_sets.get(q, set()) & s) / len(s)
            for q, s in exact_sets.items()
        ]
        # ADC over nprobe=2 cells on isotropic data: same candidate pool
        # as similarity_ivf, quantized distances — recall floor is loose
        # but must beat chance by far (5/500 = 1%)
        assert np.mean(recalls) > 0.25

    def test_adc_nonneg_and_rerank_order(self, spark):
        rows = QUERIES["similarity_ivfpq"](spark, SF_DIR).collect()
        by_q: dict[int, list] = {}
        for r in rows:
            assert r.adc_dist >= 0
            by_q.setdefault(r.qid, []).append((r.rnk, r.cos_sim))
        for q, pairs in by_q.items():
            pairs.sort()
            sims = [c for _, c in pairs]
            # final order is the exact-rerank order: cosine descending
            assert sims == sorted(sims, reverse=True)


class TestMMR:
    def test_diversity_tradeoff(self, spark):
        """MMR must (a) keep the top-1 relevance pick, (b) produce a
        valid permutation-free rank 1..5 per query, and (c) reduce
        within-result redundancy vs plain top-5 on at least some query
        (the whole point of the re-rank)."""
        from database_migration_engine_spark.io import read_table
        from database_migration_engine_spark.operators import (
            similarity as SIM,
        )
        from database_migration_engine_spark.plans import QUERIES

        rows = QUERIES["mmr_rerank"](spark, SF_DIR).collect()
        by_q: dict[int, list] = {}
        for r in rows:
            by_q.setdefault(r.qid, []).append(r)
        emb = read_table(spark, SF_DIR, "embeddings")
        top5 = SIM.cosine_topk(emb, emb.filter("vec_id < 10"), k=5)
        top_sets: dict[int, set] = {}
        top1: dict[int, int] = {}
        for r in top5.collect():
            top_sets.setdefault(r.qid, set()).add(r.nid)
            if r.rnk == 1:
                top1[r.qid] = r.nid
        n_diverge = 0
        for q, sel in by_q.items():
            ranks = sorted(r.mmr_rank for r in sel)
            assert ranks == [1, 2, 3, 4, 5]
            assert len({r.nid for r in sel}) == 5
            first = next(r for r in sel if r.mmr_rank == 1)
            assert first.nid == top1[q]  # rank-1 = pure relevance
            if {r.nid for r in sel} != top_sets[q]:
                n_diverge += 1
        assert n_diverge >= 1  # diversity actually changed something


class TestKMeansFixedPoint:
    def _reference(self, vecs, k, dims, iters):
        """Pure-Python replay of the fixed-point trajectory."""
        import math

        pts = {
            i: [math.floor(float(v) * 1_000_000) for v in vec[:dims]]
            for i, vec in vecs.items()
        }
        cent = {c: list(pts[i]) for c, i in enumerate(sorted(pts)[:k])}

        def assign():
            out = {}
            for i, p in pts.items():
                best = min(
                    (sum((a - b) ** 2 for a, b in zip(p, cent[c])), c)
                    for c in cent
                )
                out[i] = best  # (dist, cid)
            return out

        def update(asg):
            new = {}
            for c in set(cid for _, cid in asg.values()):
                members = [pts[i] for i, (_, cid) in asg.items() if cid == c]
                n = len(members)
                new[c] = [
                    sum(col) // n for col in zip(*members)
                ]  # Python // IS floor division — matches _floordiv
            return new

        for _ in range(iters):
            cent = update(assign())
        return assign(), cent

    def test_matches_python_reference(self, spark):
        """The Spark trajectory (assignments, centroids, distances) must
        equal a sequential pure-Python replay bit for bit — the property
        the fixed-point design buys."""
        import random

        from database_migration_engine_spark.operators import kmeans as KM

        rng = random.Random(7)
        vecs = {
            i: [rng.uniform(-0.5, 0.5) for _ in range(8)] for i in range(40)
        }
        emb = spark.createDataFrame(
            [(i, v) for i, v in vecs.items()],
            "vec_id long, embedding array<double>",
        )
        asg, cent = KM.kmeans_fixed_point(emb, k=3, dims=8, iters=2)
        got_asg = {r.pid: (r.dist, r.cid) for r in asg.collect()}
        got_cent = {}
        for r in cent.collect():
            got_cent.setdefault(r.cid, [0] * 8)[r.pos - 1] = r.cval
        want_asg, want_cent = self._reference(vecs, k=3, dims=8, iters=2)
        assert got_cent == want_cent
        assert got_asg == want_asg

    def test_inertia_non_increasing(self, spark):
        """Lloyd monotonicity: total inertia after 3 iterations ≤ after
        1 (floored-integer updates keep the descent property within one
        quantum per member; asserted non-strictly)."""
        from pyspark.sql import functions as SF

        from database_migration_engine_spark.io import read_table
        from database_migration_engine_spark.operators import kmeans as KM

        emb = read_table(spark, SF_DIR, "embeddings")
        tot = []
        for iters in (1, 3):
            asg, _ = KM.kmeans_fixed_point(emb, k=4, dims=16, iters=iters)
            tot.append(asg.agg(SF.sum("dist")).collect()[0][0])
        assert tot[1] <= tot[0]

    def test_trained_ivf_recall_vs_exact(self, spark):
        """Composition sanity: the kmeans-trained 2-probe IVF top-3 must
        recall a healthy fraction of the exact cosine top-3 (cells are
        trained on 16 of 64 dims, so perfect recall isn't expected —
        but < 50% would mean the quantizer is broken)."""
        from database_migration_engine_spark.io import read_table
        from database_migration_engine_spark.operators import similarity as SIM
        from database_migration_engine_spark.plans import QUERIES

        got = QUERIES["similarity_ivf_trained"](spark, SF_DIR).collect()
        emb = read_table(spark, SF_DIR, "embeddings")
        exact = SIM.cosine_topk(
            emb, emb.filter("vec_id < 10"), k=3, dim=64
        ).collect()
        g = {(r.qid, r.nid) for r in got}
        e = {(r.qid, r.nid) for r in exact}
        assert len(g & e) / len(e) >= 0.5


def test_ivf_probe_curve_monotone_recall(spark):
    """r06: probing more cells can only add candidates, so recall@k must
    be non-decreasing in nprobe, and nprobe=4 (a quarter of the 16
    cells) must clear a useful floor at k=10."""
    from database_migration_engine_spark.plans import QUERIES

    from .conftest import SF_DIR

    rows = QUERIES["ivf_probe_curve"](spark, SF_DIR).collect()
    assert len(rows) == 9
    by = {(r.nprobe, r.k): r.recall for r in rows}
    for k in (1, 5, 10):
        assert by[(1, k)] <= by[(2, k)] <= by[(4, k)] + 1e-12
    assert by[(4, 10)] >= 0.5, by
