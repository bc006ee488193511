"""Changelog compaction (CDC apply): reduce an ordered change stream to
the final table snapshot.

The reference's ledger is itself a tiny changelog (applied / rolled_back
rows keyed by version, `internal/tracker/tracker.go:99,118`); this
operator is the same last-writer-wins semantics generalized to an
arbitrary keyed change stream with upsert + delete ops — the shape every
warehouse CDC ingestion (Debezium → table) reduces to.

Scale design: one hash-shuffle on the key (the window partition), no
joins, no driver-side state. At 100 TB the window argmax is the
map-side-combinable `max_by` pattern; skewed keys are bounded because a
changelog key's row count is its change frequency, not data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compact_changelog(
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Last-writer-wins snapshot of a keyed change stream.

    Keeps, per key, the single row with the greatest ``order_cols`` tuple
    (total order required — callers append a unique id as tie-break),
    then drops keys whose final operation is ``delete_op``. Returns the
    surviving rows plus ``n_changes`` (total changelog rows seen for the
    key, deletes included).
    """
    w = Window.partitionBy(*key_cols)
    ranked = changes.withColumn(
        "_rn",
        F.row_number().over(
            w.orderBy(*[F.col(c).desc() for c in order_cols])
        ),
    ).withColumn("_n_changes", F.count(F.lit(1)).over(w))
    return (
        ranked.filter(F.col("_rn") == 1)
        .filter(F.col(op_col) != delete_op)
        .drop("_rn")
        .withColumnRenamed("_n_changes", "n_changes")
    )
