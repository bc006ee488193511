"""Approximate aggregation sketches — the scale substitutes for exact
distinct/quantile when error tolerance is acceptable.

The reference has no approximate algorithms (SURVEY.md §2.A explicit
negatives); these are north-star additions: HyperLogLog++ distinct counts
(`approx_count_distinct`) and t-digest-style quantiles
(`percentile_approx`). Not oracle-checkable (sketch internals differ per
engine) — tests assert relative-error bounds against the exact answers
instead.

At 100 TB the exact forms are the expensive path: COUNT(DISTINCT) is a
two-level shuffle over every distinct value, exact percentiles need a full
sort; both sketches are single-pass, mergeable, fixed-memory — they
composed into partial aggregation like any algebraic agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, group_col: str, value_col: str, rsd: float = 0.02
) -> DataFrame:
    """HLL++ distinct count per group with target relative std deviation."""
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias("approx_distinct"),
    )


def approx_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probabilities: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Approximate per-group quantiles (single pass, mergeable)."""
    return df.groupBy(group_col).agg(
        F.percentile_approx(
            value_col, list(probabilities), accuracy
        ).alias("quantiles")
    )


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """PORTABLE Count-Min sketch: ``depth`` hash rows × ``width`` buckets
    of frequency counts over ``key_col``.

    The CM sketch (Cormode & Muthukrishnan) answers point frequency
    queries in fixed memory with one-sided error: est(k) =
    min_r cell[r][h_r(k)] ≥ true(k), overshooting by at most εN with
    probability 1−δ (ε = e/width, δ = e^−depth). It is fully mergeable —
    cells add — so it composes into partial aggregation like any
    algebraic agg; at 100 TB the sketch is a 256-cell combine instead of
    a distinct-key shuffle.

    Spark ships `count_min_sketch` natively, but its internal hashing is
    engine-specific; like approx_distinct_kmv, this builds the sketch
    from md5-derived bucket indices (functions/portable_hash nibbles) so
    a DuckDB oracle reconstructs the IDENTICAL cells and estimates —
    a sketch with a full cross-engine value oracle.

    Returns the cell table (r, bucket, cnt); pair with
    ``count_min_estimate`` for point queries.
    """
    rows = F.array(
        *[
            F.expr(_cm_bucket_sql(key_col, r, width)).alias(f"b{r}")
            for r in range(depth)
        ]
    )
    return (
        df.select(F.posexplode(rows).alias("r", "bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _cm_bucket_sql(key_col: str, r: int, width: int) -> str:
    """Bucket index SQL (portable Spark/DuckDB): two md5 nibbles of the
    row-seeded key digest, mod width."""
    from ..functions.portable_hash import _nibble

    hx = f"md5(concat('{r}', ':', CAST({key_col} AS STRING)))"
    return (
        f"(({_nibble(hx, 1)} * 16 + {_nibble(hx, 2)}) % {width})"
    )


def count_min_estimate(
    keys: DataFrame,
    cells: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-frequency estimates from a count_min_sketch cell table:
    est = min over rows of the key's cell. The cell table is tiny
    (depth×width) and broadcast; the probe is an equi-join per row."""
    probes = keys.select(
        F.col(key_col),
        F.posexplode(
            F.array(
                *[
                    F.expr(_cm_bucket_sql(key_col, r, width))
                    for r in range(depth)
                ]
            )
        ).alias("r", "bucket"),
    )
    return (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("cm_est"))
    )


def bloom_bits_sql(key_col: str, k: int = 3, m: int = 1024) -> list[str]:
    """The ``k`` bit positions (0..m) of a portable Bloom filter for a
    key column — md5-nibble derived, identical SQL in Spark and DuckDB.
    Three nibbles give 4096 raw values, folded mod m."""
    from ..functions.portable_hash import _nibble

    out = []
    for r in range(k):
        hx = f"md5(concat('b{r}', ':', CAST({key_col} AS STRING)))"
        out.append(
            f"(({_nibble(hx, 1)} * 256 + {_nibble(hx, 2)} * 16"
            f" + {_nibble(hx, 3)}) % {m})"
        )
    return out


def bloom_build(
    df: DataFrame, key_col: str, k: int = 3, m: int = 1024
) -> DataFrame:
    """Set-bit table of a portable Bloom filter over ``key_col`` (one row
    per distinct set bit — at most m rows, broadcastable). Mergeable by
    UNION DISTINCT; the classic pre-join screen: at 100 TB the filter
    ships to every scan task and drops non-members before the shuffle,
    with false positives re-checked by the real join."""
    return (
        df.select(
            F.explode(
                F.array(*[F.expr(e) for e in bloom_bits_sql(key_col, k, m)])
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    df: DataFrame, bits: DataFrame, key_col: str, k: int = 3, m: int = 1024
) -> DataFrame:
    """Adds ``bloom_hit`` to ``df``: true iff ALL k bit positions of the
    key are set (possible member — false positives allowed, false
    negatives impossible)."""
    # probe DISTINCT keys (a key repeated r times would otherwise count
    # r×k joined probe rows and never equal k)
    probes = (
        df.select(key_col)
        .distinct()
        .select(
            F.col(key_col).alias("_bk"),
            F.posexplode(
                F.array(*[F.expr(e) for e in bloom_bits_sql(key_col, k, m)])
            ).alias("_i", "bit"),
        )
        .select("_bk", "bit")
    )
    hits = (
        probes.join(F.broadcast(bits), "bit")
        .groupBy("_bk")
        .agg(F.count(F.lit(1)).alias("_nset"))
        .filter(F.col("_nset") == k)
        .select(F.col("_bk"), F.lit(True).alias("bloom_hit"))
    )
    return df.join(
        hits, df[key_col] == hits["_bk"], "left"
    ).select(
        *[df[c] for c in df.columns],
        F.coalesce(F.col("bloom_hit"), F.lit(False)).alias("bloom_hit"),
    )
