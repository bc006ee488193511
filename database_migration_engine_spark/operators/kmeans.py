"""Distributed Lloyd k-means in fixed-point integer arithmetic.

The iterative-TRAINING counterpart to the engine's fixed-point PageRank
(plans/queries.py pagerank_docs): clustering embeddings for IVF cell
assignment / coarse quantization is the standard pre-step of the ANN
serving pipeline (operators/similarity.py ivf_topk builds on exactly
such centroids), and k-means is the canonical iterative algorithm a
100 TB engine must express without driver-side loops over data.

Why fixed-point: float centroid means depend on reduction order (a
32-way shuffle and DuckDB sum in different orders), so a float k-means
can never have a cross-engine value oracle. Here every quantity is an
integer:

* points quantize once: ``ival = FLOOR(embedding[pos] * 1e6)`` — one
  double multiply + floor, bit-identical everywhere;
* distances are exact integer sums of squared differences;
* centroid updates use exact floored integer division
  ``(s - pmod(s, n)) / n`` (pmod = ((s % n) + n) % n handles negative
  sums identically in Spark and DuckDB — both '%' operators truncate);
* ties in the argmin break by cluster id.

So iteration N's state is a pure function of iteration N−1's state with
no rounding ambiguity, and the full trajectory is reproducible by an
unrolled SQL oracle.

Scale shape: the point set explodes to (vec_id, pos, ival) rows — the
relational embedding layout that shuffles 16-byte rows instead of
vectors; the centroid table (k × dims rows) BROADCASTS into the
distance join, so each iteration is one broadcast join + two partial
aggregations, no driver-side data loop. ``localCheckpoint`` cuts the
per-iteration lineage exactly like the connected-components rounds
(operators/graph.py).

Reference anchor: the reference has no ML/iterative surface at all
(SURVEY.md §2.A explicit negatives); this is north-star LLM-pipeline
scope (embedding-space organization for dedup/IVF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .joins import corpus_join

SCALE = 1_000_000


def quantized_points(
    emb: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, pos, ival): the first ``dims`` components, fixed-point
    quantized. pos is 1-based (matches SQL array indexing)."""
    return emb.select(
        F.col(id_col).alias("pid"),
        F.posexplode(F.slice(F.col(vec_col), 1, dims)).alias("pos0", "val"),
    ).select(
        "pid",
        (F.col("pos0") + 1).alias("pos"),
        F.floor(F.col("val").cast("double") * F.lit(float(SCALE)))
        .cast("long")
        .alias("ival"),
    )


def _floordiv(s, n):
    """Exact floored integer division for possibly-negative sums —
    identical in Spark and DuckDB because both '%' truncate and the
    adjusted dividend divides exactly. Uses SQL ``div`` (pure 64-bit
    integer division) rather than ``/`` + cast: the double round-trip
    is only exact below 2^53, and fixed-point coordinate sums of very
    large clusters can exceed that (r04 advice item). ``s``/``n`` are
    column NAMES (SQL ``div`` has no Column-API spelling)."""
    return F.expr(f"({s} - ((({s} % {n}) + {n}) % {n})) div {n}").cast("long")


def _assign(pts: DataFrame, cent: DataFrame, n_best: int = 1) -> DataFrame:
    """(pid, cid, dist): the ``n_best`` nearest centroids per point,
    ties to min cid. n_best=1 is the Lloyd assignment; n_best>1 is the
    multi-probe cell selection of IVF search."""
    d = (
        pts.join(F.broadcast(cent), "pos")
        .withColumn(
            "sq",
            (F.col("ival") - F.col("cval")) * (F.col("ival") - F.col("cval")),
        )
        .groupBy("pid", "cid")
        .agg(F.sum("sq").alias("dist"))
    )
    w = Window.partitionBy("pid").orderBy("dist", "cid")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_best)
        .select("pid", "cid", "dist")
    )


def _update(pts: DataFrame, asg: DataFrame) -> DataFrame:
    """(cid, pos, cval): exact integer-mean centroids of each cluster."""
    return (
        corpus_join(pts, asg.select("pid", "cid"), "pid")
        .groupBy("cid", "pos")
        .agg(F.sum("ival").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "cid", "pos", _floordiv("s", "n").alias("cval")
        )
    )


def kmeans_fixed_point(
    emb: DataFrame,
    k: int = 4,
    dims: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Run ``iters`` Lloyd iterations; returns (assignments, centroids).

    assignments: (pid, cid, dist) under the FINAL centroids;
    centroids:   (cid, pos, cval) after the final update.
    Init: the k smallest ids' quantized vectors (cid = rank − 1) — a
    deterministic relational seed both engines reproduce."""
    pts = quantized_points(emb, dims, id_col, vec_col).localCheckpoint(
        eager=True
    )
    seeds = (
        emb.select(F.col(id_col).alias("pid"))
        .orderBy("pid")
        .limit(k)
        .withColumn(
            "cid",
            F.row_number().over(Window.orderBy("pid")) - 1,
        )
    )
    # r11: LAZY checkpoints inside the loop (the ivf_probe_curve
    # precedent) — each iteration's assignment/centroid RDD still
    # computes exactly once and truncates lineage for the next round,
    # but the whole trajectory materializes inside the consumer's first
    # action instead of 2 eager driver-blocking jobs per iteration
    # (pts stays eager: every _assign AND _update scans it).
    cent = (
        corpus_join(pts, seeds, "pid")
        .select("cid", "pos", F.col("ival").alias("cval"))
        .localCheckpoint(eager=False)
    )
    asg = None
    for _ in range(iters):
        asg = _assign(pts, cent).localCheckpoint(eager=False)
        cent = _update(pts, asg).localCheckpoint(eager=False)
    # final assignment under the final centroids, so the reported
    # inertia describes the returned model
    asg = _assign(pts, cent)
    return asg, cent
