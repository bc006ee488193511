"""Temporal join operators: as-of join and banded interval self-join.

The reference engine has no temporal joins (SURVEY.md §2.A explicit
negatives — its only joins are ledger point lookups,
``internal/tracker/tracker.go:52-64``); these generalize its
"latest ledger row at-or-before a point" semantics (E8 top-k selection,
``internal/executor/rollback_helpers.go:12-19``) to event streams, and are
table stakes for a training-data/feature pipeline.

Scale notes (100 TB posture):

* ``asof_join`` is the union+window formulation: tag both inputs, union,
  and carry the most recent right-side payload forward with
  ``last(..., ignorenulls=True)`` over a key-partitioned window. ONE
  shuffle on the key, zero range-predicate explosion, no per-key driver
  loops — the same plan shape Flink's temporal join and Pandas
  ``merge_asof`` use, expressed in Spark windows. A naive
  join-then-rank pays |L|×|R| per key before pruning; this pays
  |L|+|R| log(|L|+|R|) per key.
* ``banded_pairs`` turns an unbounded range self-join into an equi-join
  on a coarse time bucket: each left row probes exactly two buckets
  (its own and the next), so the shuffle is keyed on (key, bucket) and
  candidate pairs are bounded by per-bucket density, not per-key row
  count. This is the standard band-join decomposition for interval
  predicates with a bounded span.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# Below this many bytes of backing parquet per side, the merge pin is
# waived and AQE/Catalyst pick the strategy (incl. broadcast). 2 MiB sits
# between the sf0.1 corpus tables (~0.6-0.8 MB, where broadcast is both
# safe and measurably faster) and the ×10 fixture (~6-8 MB, where the
# exploded shingle frames drove a ~0.5 GB mis-broadcast in the r05
# sweep). Worst-case in-memory amplification of a shingle/signature
# explode over ≤2 MiB of compressed text is bounded well inside even a
# default 1 GiB driver. Override per-session with
# ``spark.dbme.corpusJoin.smallBytes`` (0 = always pin).
CORPUS_SMALL_BYTES = 2 << 20


def _backing_bytes(df: DataFrame) -> int | None:
    """Total size of the files backing ``df``'s plan, or None when
    unknown (non-file source, unreadable path). Unlike Catalyst's
    post-explode row estimate — which can be arbitrarily wrong-small —
    leaf file sizes are exact, and corpus amplification (explode,
    self-join) only ever makes the real data LARGER than this number,
    so a "big" verdict here is never a false negative.

    Walks the ANALYZED plan's leaves, not ``df.inputFiles()``: the
    latter reads the optimized plan, where any persisted subtree has
    been substituted by InMemoryRelation and the file leaves vanish —
    every dedup operator persists its signature frame, so the optimized
    view reported "no files" for exactly the frames this gate exists
    for. Cache substitution happens after analysis, so the analyzed
    plan always retains the file relations."""
    import os
    from urllib.parse import unquote, urlparse

    files: set[str] = set()
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            cls = leaf.getClass().getSimpleName()
            if cls in ("LocalRelation", "OneRowRelation", "Range"):
                continue  # inline data: zero backing bytes
            if cls != "LogicalRelation":
                return None  # stream/JDBC/unknown source: size unknown
            files.update(leaf.relation().inputFiles())
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme not in ("", "file"):
            return None  # remote storage: size unknown from here
        try:
            total += os.path.getsize(unquote(parsed.path))
        except OSError:
            return None
    return total


def corpus_join(
    left: DataFrame,
    right: DataFrame,
    on,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two CORPUS-DERIVED frames with the join strategy pinned
    to sort-merge unless BOTH sides are provably tiny.

    Catalyst's size estimate for an explode→aggregate→filter subtree can
    be arbitrarily wrong, and a wrong small estimate turns a corpus-sized
    side into a BroadcastHashJoin build — fine at sf0.1, driver-OOM at
    10× (observed: the banded-LSH self-join planned as a ~0.5 GB
    broadcast in the r05 ×10 scale sweep), fatal at 100 TB. Every join in
    the dedup/similarity family whose BOTH sides scale with the corpus
    routes through this helper. MERGE (not SHUFFLE_HASH) because
    sort-merge is the only strategy that spills BOTH sides: the same ×10
    sweep drove shuffle-hash's per-partition build map out of execution
    memory once the persisted signature cache had claimed the storage
    pool. AQE skew-split still applies to SMJ, and the sorts feed the
    (a<b)/groupBy stages that follow every candidate join here. Bounded
    sides (centroids, probe lists, per-query top-k) keep using
    ``F.broadcast`` explicitly — the inverse declaration.

    Size-adaptivity (r05 verdict item 3): the unconditional pin taxed
    fixture-scale runs (dedup_incremental 1.90→2.94 s at sf0.1) for a
    safety margin only corpus-scale inputs need. The pin is now gated on
    the exact BACKING-FILE size of both sides — when every parquet leaf
    behind both plans totals under ``spark.dbme.corpusJoin.smallBytes``
    (default 2 MiB) per side, AQE/Catalyst choose freely; any big or
    unknown-size side keeps the pin. At 100 TB every corpus side is far
    past the threshold, so the production plan is identical to the
    always-pinned form."""
    try:
        thr = int(
            left.sparkSession.conf.get(
                "spark.dbme.corpusJoin.smallBytes", str(CORPUS_SMALL_BYTES)
            )
        )
    except Exception:
        thr = CORPUS_SMALL_BYTES
    if thr > 0:
        lb = _backing_bytes(left)
        rb = _backing_bytes(right)
        if lb is not None and rb is not None and lb <= thr and rb <= thr:
            return left.join(right, on, how)
    return left.join(right.hint("merge"), on, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    left_seq: str,
    right_seq: str,
    payload_name: str = "asof",
) -> DataFrame:
    """For every left row, attach the latest right row of the same ``on``
    key with ``right_ts <= left_ts`` (inclusive; ties among right rows
    break to the greatest ``right_seq``). Left rows with no prior right
    row carry a NULL payload struct — callers choose inner/outer by
    filtering.

    Returns all left columns plus one struct column ``payload_name``
    holding ``payload_cols`` of the matched right row.
    """
    tag = F.lit(0)
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        tag.alias("_tag"),
        F.col(right_seq).alias("_seq"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left.columns],
    )
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_tag"),
        F.col(left_seq).alias("_seq"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}"
                for c in payload_cols
            ) + ">"
        ).alias("_p"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    # Right rows sort BEFORE left rows at the same timestamp (_tag 0 < 1),
    # which is what makes the join boundary inclusive.
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_tag", "_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        r_tagged.unionByName(l_tagged)
        .withColumn(payload_name, F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
        .select(
            *[F.col(f"_l_{c}").alias(c) for c in left.columns],
            F.col(payload_name),
        )
    )


def banded_pairs(
    df: DataFrame,
    key: str,
    ts: str,
    band_us: int,
    carry: Sequence[str],
) -> DataFrame:
    """Ordered same-key pairs (a, b) with ``0 < b.ts - a.ts <= band_us``.

    Decomposes the interval predicate into an equi-join on a coarse
    bucket of width ``band_us``: b's bucket is either a's or the next
    one, so side *a* explodes into those two probe buckets and the join
    is a plain shuffle hash join on (key, bucket) — no quadratic per-key
    blowup. Output carries ``carry`` columns prefixed ``a_``/``b_`` plus
    ``gap_us``.
    """
    us = F.unix_micros(F.col(ts))
    # integer division (`div`, not `/`): epoch-µs values are near double's
    # 2^53 exact-integer ceiling, so float division is not safe here
    bucket = F.expr(f"unix_micros({ts}) div {band_us}")
    a = df.select(
        F.col(key),
        us.alias("_a_us"),
        *[F.col(c).alias(f"a_{c}") for c in carry],
        F.explode(F.array(bucket, bucket + 1)).alias("_bk"),
    )
    b = df.select(
        F.col(key),
        us.alias("_b_us"),
        *[F.col(c).alias(f"b_{c}") for c in carry],
        bucket.alias("_bk"),
    )
    return (
        a.join(b, [key, "_bk"])
        .filter(
            (F.col("_b_us") > F.col("_a_us"))
            & (F.col("_b_us") <= F.col("_a_us") + F.lit(band_us))
        )
        .select(
            F.col(key),
            *[F.col(f"a_{c}") for c in carry],
            *[F.col(f"b_{c}") for c in carry],
            (F.col("_b_us") - F.col("_a_us")).alias("gap_us"),
        )
    )


def interval_dim_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Join facts to a small interval dimension on
    ``lo <= value < hi`` via an explicit broadcast.

    With a dimension of a few dozen rows the right physical plan is a
    BroadcastNestedLoopJoin — every executor scans its fact partition
    once against the in-memory band list. When the intervals are regular
    (fixed width) this reduces to a floor-bucket equi-join; keep the
    generic form for irregular bands.
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(bands), cond)
