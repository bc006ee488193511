"""Skew mitigation: salting for hot keys, two-phase aggregation, and a
salted broadcast-free join.

AQE's skew-join splitting handles most runtime skew automatically
(session.py turns it on); these operators are for the cases AQE can't fix:
a groupBy where one key holds a large share of all rows (AQE cannot split
a hash-aggregation key), and a shuffle join against a skewed fact side
when the dimension is too big to broadcast.

Pattern: append a salt in [0, salts) → aggregate/join on (key, salt) →
reduce the salted partials. Two shuffles, each balanced, instead of one
shuffle with a straggler partition. Worth it only when a key exceeds
roughly 1/parallelism of all rows — measure first (`key_histogram`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def key_histogram(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Hot-key report: rows per key, descending — the measure-first step."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.desc("n_rows"), F.asc(key))
        .limit(top)
    )


def log2_histogram(df: DataFrame, key: str) -> list:
    """The measured skew table (the `key_skew_histogram` registry query's
    core, as an operator): per-key counts bucketed by floor(log2 n) —
    computed exactly in the integer domain as length(bin(n)) − 1, no
    libm. Returns the collected ≤64-row histogram (bucket, n_keys,
    n_rows): two aggregates, nothing global, safe to collect at any
    scale."""
    per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    return (
        per_key.withColumn(
            "bucket", (F.length(F.bin(F.col("cnt"))) - 1).cast("int")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").alias("n_rows"),
        )
        .collect()
    )


def suggest_salt_factor(
    df: DataFrame, key: str, parallelism: int, max_salts: int = 64
) -> int:
    """Derive the salting factor from the measured log2 skew histogram
    (r05 verdict item 7) instead of guessing.

    A balanced shuffle wants no single key to exceed ~1/parallelism of
    all rows. The histogram's top occupied bucket b bounds the hottest
    key at < 2^(b+1) rows, so the factor is ceil(2^(b+1) / (total /
    parallelism)), rounded up to a power of two (modulo splits stay
    balanced) and clamped to [1, max_salts]. Uniform keys resolve to 1 —
    the "measure first, don't salt" answer. One O(buckets) driver
    action, same bounded-collect class as the two-pass rank offsets."""
    hist = log2_histogram(df, key)
    if not hist:
        return 1
    total = sum(r.n_rows for r in hist)
    hot_ceiling = 1 << (max(r.bucket for r in hist) + 1)
    target = max(1, total // max(1, parallelism))
    factor = -(-hot_ceiling // target)
    pow2 = 1
    while pow2 < factor:
        pow2 <<= 1
    return max(1, min(pow2, max_salts))


def with_salt(df: DataFrame, salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt derived from a per-row spark_partition_id +
    monotonically_increasing_id mix — uniform without an RNG (results
    stay reproducible)."""
    return df.withColumn(
        salt_col,
        F.pmod(
            F.hash(F.monotonically_increasing_id(), F.spark_partition_id()),
            F.lit(salts),
        ),
    )


def salted_sum(
    df: DataFrame,
    key: str,
    value: Column | str,
    salts: int = 16,
    alias: str = "total",
) -> DataFrame:
    """Two-phase skew-proof sum: partial sum on (key, salt) — balanced even
    if one key dominates — then final sum on key. The decimal widening
    keeps the result identical to a single-phase sum regardless of how the
    salt split the rows (exact arithmetic is associative)."""
    value_col = F.col(value) if isinstance(value, str) else value
    partial = (
        with_salt(df, salts)
        .groupBy(key, "_salt")
        .agg(F.sum(value_col.cast("decimal(28,10)")).alias("_partial"))
    )
    return (
        partial.groupBy(key)
        .agg(F.sum("_partial").cast("double").alias(alias))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salts: int = 16,
) -> DataFrame:
    """Skewed equi-join without broadcast: salt the fact side, replicate
    the dim side across all salt values (explode), join on (key, salt).
    The hot fact key spreads over `salts` partitions at the cost of a
    `salts`× dim replication — use when dim is mid-sized (too big to
    broadcast, far smaller than fact).

    The join is PINNED to sort-merge: Catalyst's size estimate for a
    scan→explode subtree stays at the pre-explode size, so it happily
    plans the `salts`×-replicated dim as a BroadcastHashJoin build —
    fine at fixture scale, driver-OOM at the ×10 sweep (observed:
    orders×8 salts = 12M rows "broadcast" into a 1 GB driver). A dim
    small enough to broadcast would never need salting in the first
    place, so broadcast is never the right strategy here; SMJ spills
    both sides and still gets AQE skew-split on top of the salting."""
    salted_fact = with_salt(fact, salts)
    replicated_dim = dim.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(salts)])),
    )
    return (
        salted_fact.join(replicated_dim.hint("merge"), [key, "_salt"])
        .drop("_salt")
    )
