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
