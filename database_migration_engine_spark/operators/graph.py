"""Connected components over a pair graph — dedup cluster formation.

Near-dup detection (operators/dedup.py) emits PAIRS; a corpus pipeline
needs CLUSTERS (keep one representative per component). The reference has
no graph surface at all (SURVEY.md §2.A explicit negatives); this extends
its exact-dedup identity (checksum grouping,
``internal/migration/migration.go:19-23``) to transitive near-dup groups.

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round every node takes the min of its own label and its
neighbors' labels; converged when the global label sum stops decreasing
(labels are monotonically non-increasing positive ints, so the sum is a
strictly decreasing convergence witness — no join-based equality check
needed).

Scale notes (100 TB posture): rounds = graph diameter. Dedup graphs are
many tiny quasi-cliques (diameter ≤ ~3), so 3–4 shuffle rounds on the
edge list — each a plain shuffle hash join keyed by node — finish the
job; that is why plain propagation is the right choice here over the
O(log n)-round large-star/small-star of Kiveris et al. "Connected
Components in MapReduce and Beyond" (SOCC'14), which wins only on
high-diameter graphs. Each round persists its labels and unpersists the
previous round's, so lineage does not grow unboundedly and executor
memory holds exactly one label set.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .joins import corpus_join


@contextmanager
def _shuffle_width(spark, n: int | None):
    """Temporarily narrow spark.sql.shuffle.partitions for the iterative
    rounds. The propagation subgraph is usually tiny relative to the
    corpus (pair-participating nodes only), and each round is a full
    shuffle — at the session's corpus-sized width most tasks are empty
    and per-task latency dominates. AQE would coalesce these in pure-SQL
    plans, but the per-round localCheckpoint boundary (required to stop
    lineage growth) materializes through the RDD path where AQE's
    coalescing does not apply, so the width is set explicitly. Callers
    size it to the expected component-graph size, not the corpus."""
    if n is None:
        yield
        return
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, old)


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    nodes: DataFrame,
    node_col: str,
    max_iter: int = 25,
    dedupe_edges: bool = True,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Label every node in ``nodes`` with the minimum node id reachable
    through ``edges`` (undirected). Isolated nodes label themselves.

    Returns a persisted DataFrame ``(node, label)``; deterministic for
    integer node ids regardless of partitioning (min is order-free).
    Pass ``dedupe_edges=False`` when the pair list is already unique
    (e.g. produced by a groupBy) — duplicate edges don't change the
    min-propagation result, only its cost, and skipping the distinct
    saves a full edge-list shuffle. ``shuffle_partitions`` narrows the
    per-round shuffle width to the component-graph's size (see
    ``_shuffle_width``).
    """
    spark = edges.sparkSession
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    if dedupe_edges:
        sym = sym.distinct()
    sym = sym.persist()
    # r11 (guide §2.2 "fewer, larger partitions", made SIZE-ADAPTIVE):
    # the caller's shuffle_partitions is a static guess; the persisted
    # edge list's real row count is one ~ms job away (it also warms the
    # cache round 1 would otherwise pay to build). Each round is a full
    # shuffle of the label graph, and the label graph is edge-bounded —
    # at fixture scale (hundreds of edges) 16-wide rounds are ~90% empty
    # tasks × rounds × stages (A/B on the sf0.1 embedding pair graph:
    # width 16 ≈ 3.2-4.3 s, width 1-2 ≈ 2.2-2.3 s for the same 13
    # rounds); at real scale the width grows with the measured edge
    # count up to the caller's cap. ~250k label/edge rows (≈6 MB of
    # (long, long)) per task is comfortably one reducer's work.
    n_edges = sym.count()
    cap = shuffle_partitions or spark.sparkContext.defaultParallelism
    width = max(1, min(cap, -(-n_edges // 250_000)))
    # Re-layout the edge cache ONCE for the rounds (guide §2.4): hash-
    # partitioned on the join key at the round width and sorted within
    # partitions, so every round's sort-merge join reads the cached side
    # exchange-free AND sort-free (outputPartitioning/-Ordering are
    # preserved through the cache), and per-round jobs stop scanning the
    # natural-width cache (32 scan tasks per round for a hundreds-of-
    # edges fixture graph). One extra tiny job (the re-layout count)
    # buys rounds × (exchange + sort + empty tasks).
    sym_w = (
        sym.repartition(width, F.col("a"))
        .sortWithinPartitions("a")
        .persist()
    )
    sym_w.count()
    sym.unpersist()
    sym = sym_w
    with _shuffle_width(spark, width):
        labels = nodes.select(
            F.col(node_col).alias("node"), F.col(node_col).alias("label")
        ).persist()
        # no up-front sum action: the first round's sum seeds the
        # convergence check (labels are monotone non-increasing, so equal
        # consecutive sums == fixpoint; one fewer Spark job per call)
        prev_sum = None
        for round_i in range(max_iter):
            propagated = sym.join(
                labels.hint("merge"), sym["a"] == labels["node"]
            ).select(F.col("b").alias("node"), F.col("label"))
            parts = [labels.select("node", "label"), propagated]
            # pointer jumping (r10 optimization round, guide §1.2): also
            # fold in the label OF each node's label — labels only ever
            # hold same-component node ids, so min(self, neighbor labels,
            # label(label)) descends to the same component-min fixpoint
            # (the neighbor-min stability condition is unchanged) in
            # O(log diameter) rounds instead of O(diameter). Deferred to
            # round 3: within the first two rounds labels have moved at
            # most 2 hops, so label(label) adds nothing a shallow graph
            # doesn't already get — and most fixture graphs (name
            # distance-1, doc near-dup) converge in ≤4 rounds, where the
            # extra label-sized join per round measured as pure overhead
            # (entity_canonicalize 3.3 → 4.7 s). Deep chains still get
            # the O(log diameter) behavior from round 3 on.
            if round_i >= 2:
                jumped = (
                    labels.select(F.col("label").alias("_j"), "node")
                    .join(
                        labels.hint("merge")
                        .select(
                            F.col("node").alias("_j"),
                            F.col("label").alias("_jl"),
                        ),
                        "_j",
                    )
                    .select("node", F.col("_jl").alias("label"))
                )
                parts.append(jumped)
            # localCheckpoint, not persist: each round references the
            # previous labels several times (union + joins), so an
            # uncheckpointed logical plan multiplies per round — 2^r
            # tree nodes OOMs the driver past ~12 rounds. Checkpointing
            # truncates lineage; the agg below is the eager
            # materialization + convergence check in one job.
            acc = parts[0]
            for p in parts[1:]:
                acc = acc.unionByName(p)
            new_labels = (
                acc.groupBy("node")
                .agg(F.min("label").alias("label"))
                .localCheckpoint(eager=False)
            )
            cur_sum = new_labels.agg(F.sum("label")).first()[0]
            labels.unpersist()
            labels = new_labels
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        sym.unpersist()
        return labels


def _neighborhood_min(sym: DataFrame) -> DataFrame:
    """Per node: min over its closed neighborhood (itself + neighbors)."""
    return sym.groupBy("a").agg(
        F.least(F.min("b"), F.col("a")).alias("m")
    )


def _star_round(sym: DataFrame, large: bool) -> DataFrame:
    """One large-star (attach strictly-greater neighbors to the
    neighborhood min) or small-star (attach ≤ neighbors) pass over a
    symmetric edge list; returns the new symmetric edge list."""
    nb = corpus_join(sym, _neighborhood_min(sym), "a")
    if large:
        emitted = nb.filter(F.col("b") > F.col("a")).select(
            F.col("b").alias("x"), F.col("m").alias("y")
        )
    else:
        emitted = nb.filter(F.col("b") <= F.col("a")).select(
            F.col("b").alias("x"), F.col("m").alias("y")
        ).unionByName(
            _neighborhood_min(sym).select(
                F.col("a").alias("x"), F.col("m").alias("y")
            )
        )
    directed = emitted.filter(F.col("x") != F.col("y")).distinct()
    return directed.select(
        F.col("x").alias("a"), F.col("y").alias("b")
    ).unionByName(
        directed.select(F.col("y").alias("a"), F.col("x").alias("b"))
    )


def connected_components_star(
    edges: DataFrame,
    src: str,
    dst: str,
    nodes: DataFrame,
    node_col: str,
    max_iter: int = 25,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SOCC'14): each round reshapes the edge list toward per-component
    stars rooted at the min node, converging in O(log n) rounds
    regardless of diameter — the scale path for long-chain graphs where
    plain min-propagation (``connected_components``) needs O(diameter)
    rounds. Same contract: returns persisted ``(node, label)`` over
    ``nodes``, singletons labeling themselves.
    """
    with _shuffle_width(edges.sparkSession, shuffle_partitions):
        # localCheckpoint (NOT persist): every star round references the
        # previous edge list several times, so the logical plan would grow
        # ~6× per round and OOM the driver by round ~10. Checkpointing
        # truncates lineage each round; on a real cluster swap in reliable
        # checkpoint(dir) for executor-failure tolerance.
        sym = (
            edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        prev_sig = None
        for _ in range(max_iter):
            stepped = _star_round(sym, large=True).localCheckpoint(eager=True)
            stepped = _star_round(stepped, large=False).localCheckpoint(eager=True)
            sig = stepped.agg(
                F.count(F.lit(1)).alias("n"),
                # decimal sum: 2^63-scale hashes overflow a long under ANSI
                F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
            ).first()
            sym = stepped
            cur_sig = (sig["n"], sig["h"])
            if cur_sig == prev_sig:
                break
            prev_sig = cur_sig
        roots = sym.groupBy("a").agg(F.min("b").alias("root")).filter(
            F.col("root") < F.col("a")
        )
        labels = (
            nodes.select(F.col(node_col).alias("node"))
            .join(roots.hint("merge"), F.col("node") == roots["a"], "left")
            .select(
                "node", F.coalesce("root", F.col("node")).alias("label")
            )
            .persist()
        )
        labels.count()
        return labels


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    label_col: str = "lbl",
    shuffle_partitions: int | None = 16,
) -> DataFrame:
    """Semi-supervised label propagation (Zhu & Ghahramani's hard-label
    variant, frontier-frozen): seeded nodes keep their label; an
    UNLABELED node takes the MAJORITY label among its currently-labeled
    neighbors (ties break to the lexicographically smallest label) and
    then freezes — so the label frontier expands monotonically, round
    count bounds the propagation radius, and the whole trajectory is
    deterministic and oracle-replayable. Nodes with no labeled neighbor
    within ``rounds`` hops stay NULL.

    ``seeds``: (node_col, label_col) for EVERY node, label NULL where
    unseeded. Per round: one join edges×labels + one count aggregate +
    one argmax window per node — the same bounded-iteration shape as
    connected_components, localCheckpoint per round."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    with _shuffle_width(edges.sparkSession, shuffle_partitions):
        labels = seeds.select(
            F.col(node_col).alias("node"),
            F.col(label_col).alias("lbl"),
            F.col(label_col).isNotNull().alias("seeded"),
        ).localCheckpoint(eager=True)
        for _ in range(rounds):
            votes = (
                corpus_join(
                    sym,
                    labels.filter(F.col("lbl").isNotNull()).select(
                        F.col("node").alias("a"), "lbl"
                    ),
                    "a",
                )
                .groupBy(F.col("b").alias("node"), "lbl")
                .agg(F.count(F.lit(1)).alias("c"))
            )
            picked = (
                votes.withColumn(
                    "rn",
                    F.row_number().over(
                        Window.partitionBy("node").orderBy(
                            F.desc("c"), F.asc("lbl")
                        )
                    ),
                )
                .filter(F.col("rn") == 1)
                .select("node", F.col("lbl").alias("voted"))
            )
            labels = (
                corpus_join(labels, picked, "node", "left")
                .select(
                    "node",
                    F.coalesce("lbl", "voted").alias("lbl"),
                    "seeded",
                )
                .localCheckpoint(eager=True)
            )
    return labels
