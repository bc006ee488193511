"""Slowly-changing-dimension (type 2) incremental merge.

`plans/queries.scd2_user_status` DERIVES a full SCD2 history from an
event log in one batch pass; this operator MAINTAINS one incrementally —
the nightly-merge shape a warehouse dimension actually runs: a change
batch arrives, changed keys get their current row closed and a new
version opened, new keys are inserted, unchanged keys cost nothing, and
replaying an already-applied batch is a no-op.

Extends the reference's ledger-upsert idea (MERGE as anti-join + union,
`executor/orchestrator.py` L3 / `internal/tracker/tracker.go`) from
current-state-only to full version history.

Scale shape: one hash shuffle of the change batch and the CURRENT dim
slice on the key (historical rows pass through untouched via a cheap
flag filter — at 100 TB with the dim partitioned on `is_current`, the
closed history is never even scanned), window ordering only within each
key's in-batch change chain. Output is a full new dim snapshot, written
atomically by the caller (same swap contract as the parquet ledger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_merge(
    dim: DataFrame,
    changes: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str = "change_ts",
    from_col: str = "effective_from",
    to_col: str = "effective_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Apply a change batch to an SCD2 dimension; returns the new full
    dimension snapshot with the same schema.

    Semantics (per key, changes applied in ``ts_col`` order):
    * changes at or before the key's current ``effective_from`` are
      STALE and ignored — replaying an applied batch is a no-op,
    * a change whose attributes equal the key's current row (or the
      previous change in the same batch) is a no-op,
    * otherwise the open row closes at the change timestamp
      (``effective_to`` set, ``is_current`` false) and a new version
      opens at it,
    * unknown keys insert their first version,
    * NULL attribute values compare as values (null-safe equality) —
      the SQL MERGE pitfall this helper exists to get right.
    """
    attrs = list(attr_cols)

    current = dim.filter(F.col(current_col))
    history = dim.filter(~F.col(current_col))

    # 1. drop stale changes (ts <= the key's current effective_from),
    #    then collapse each key's in-batch chain: order by ts, drop
    #    changes equal to their surviving predecessor
    cur_from = current.select(
        key_col, F.col(from_col).alias("_cur_from")
    )
    live = (
        changes.select(key_col, ts_col, *attrs)
        .join(cur_from, on=key_col, how="left")
        .filter(
            F.col("_cur_from").isNull()
            | (F.col(ts_col) > F.col("_cur_from"))
        )
        .drop("_cur_from")
    )
    w = Window.partitionBy(key_col).orderBy(ts_col)
    same_as_prev = F.lit(True)
    for a in attrs:
        same_as_prev = same_as_prev & F.col(a).eqNullSafe(F.lag(a).over(w))
    chain = (
        live.withColumn(
            "_dup",
            F.when(
                F.lag(ts_col).over(w).isNull(), F.lit(False)
            ).otherwise(same_as_prev),
        )
        .filter(~F.col("_dup"))
        .drop("_dup")
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col)
    chain = chain.withColumn("_next_ts", F.lead(ts_col).over(w2)).withColumn(
        "_first", F.row_number().over(w2) == 1
    )

    def differs(left_prefix: str, right_prefix: str):
        cond = F.lit(False)
        for a in attrs:
            cond = cond | ~F.col(f"{left_prefix}.{a}").eqNullSafe(
                F.col(f"{right_prefix}.{a}")
            )
        return cond

    # 2. each key's FIRST surviving change decides the current row's fate
    first = chain.filter("_first").alias("c")
    joined = current.alias("d").join(first, on=key_col, how="left")
    untouched_current = joined.filter(F.col(f"c.{ts_col}").isNull()).select(
        [F.col(f"d.{col}").alias(col) for col in dim.columns]
    )
    # attrs equal → the current row ABSORBS the first change: it stays
    # open from its original effective_from, closing only if a later
    # chain version follows
    absorbing = joined.filter(
        F.col(f"c.{ts_col}").isNotNull() & ~differs("d", "c")
    )
    closed = joined.filter(
        F.col(f"c.{ts_col}").isNotNull() & differs("d", "c")
    ).select(
        F.col(key_col),
        *[F.col(f"d.{a}").alias(a) for a in attrs],
        F.col(f"d.{from_col}").alias(from_col),
        F.col(f"c.{ts_col}").alias(to_col),
        F.lit(False).alias(current_col),
    ).select(dim.columns)

    # 3. chain versions become dim rows. An absorbed first link re-emits
    #    the current row (original effective_from); everything else
    #    opens at its own change_ts. The last link per key is current.
    absorb_keys = absorbing.select(
        F.col(key_col), F.col(f"d.{from_col}").alias("_abs_from")
    )
    versions = (
        chain.join(absorb_keys, on=key_col, how="left")
        .withColumn(
            "_open",
            F.when(
                F.col("_first") & F.col("_abs_from").isNotNull(),
                F.col("_abs_from"),
            ).otherwise(F.col(ts_col)),
        )
        .select(
            F.col(key_col),
            *[F.col(a) for a in attrs],
            F.col("_open").alias(from_col),
            F.col("_next_ts").alias(to_col),
            F.col("_next_ts").isNull().alias(current_col),
        )
        .select(dim.columns)
    )
    return (
        history.unionByName(untouched_current)
        .unionByName(closed)
        .unionByName(versions)
    )
