"""SCD2 incremental merge semantics on crafted dimensions.

Every case asserts the FULL output snapshot, not samples: version chains
must be contiguous, exactly one current row per key, and replaying an
applied batch must be byte-identical (idempotent merge — the property
the reference's ledger upsert guarantees for current-state, extended
here to full history)."""

from __future__ import annotations

from database_migration_engine_spark.operators.scd import scd2_merge

DIM_SCHEMA = (
    "user_id long, status string, tier string,"
    " effective_from timestamp, effective_to timestamp, is_current boolean"
)
CHG_SCHEMA = "user_id long, status string, tier string, change_ts timestamp"

from datetime import datetime

T0 = datetime(2026, 1, 1)
T1 = datetime(2026, 2, 1)
T2 = datetime(2026, 3, 1)
T3 = datetime(2026, 4, 1)
TPRE = datetime(2025, 12, 1)


def _dim(spark, rows):
    return spark.createDataFrame(rows, DIM_SCHEMA)


def _chg(spark, rows):
    return spark.createDataFrame(rows, CHG_SCHEMA)


def _merge(dim, chg):
    return scd2_merge(
        dim, chg, key_col="user_id", attr_cols=["status", "tier"]
    )


def _snapshot(df):
    return sorted(
        (
            r.user_id,
            str(r.status),
            str(r.tier),
            str(r.effective_from),
            str(r.effective_to),
            r.is_current,
        )
        for r in df.collect()
    )


def _base_dim(spark):
    return _dim(spark, [(1, "active", "gold", T0, None, True)])


def test_new_key_inserts_first_version(spark):
    out = _merge(_base_dim(spark), _chg(spark, [(2, "new", "free", T1)]))
    snap = _snapshot(out)
    assert (2, "new", "free", str(T1), "None", True) in snap
    assert (1, "active", "gold", str(T0), "None", True) in snap
    assert len(snap) == 2


def test_changed_attrs_close_and_open(spark):
    out = _merge(
        _base_dim(spark), _chg(spark, [(1, "active", "platinum", T1)])
    )
    assert _snapshot(out) == [
        (1, "active", "gold", str(T0), str(T1), False),
        (1, "active", "platinum", str(T1), "None", True),
    ]


def test_unchanged_attrs_are_noop(spark):
    dim = _base_dim(spark)
    out = _merge(dim, _chg(spark, [(1, "active", "gold", T1)]))
    assert _snapshot(out) == _snapshot(dim)


def test_in_batch_chain_with_dup_collapse(spark):
    out = _merge(
        _base_dim(spark),
        _chg(
            spark,
            [
                (1, "idle", "gold", T1),
                (1, "idle", "gold", T2),  # consecutive dup — collapses
                (1, "churned", "gold", T3),
            ],
        ),
    )
    assert _snapshot(out) == [
        (1, "active", "gold", str(T0), str(T1), False),
        (1, "churned", "gold", str(T3), "None", True),
        (1, "idle", "gold", str(T1), str(T3), False),
    ]


def test_absorb_then_later_change_closes_original(spark):
    # first change equals current attrs (absorbed, original
    # effective_from survives), second change opens a new version
    out = _merge(
        _base_dim(spark),
        _chg(
            spark,
            [(1, "active", "gold", T1), (1, "active", "silver", T2)],
        ),
    )
    assert _snapshot(out) == [
        (1, "active", "gold", str(T0), str(T2), False),
        (1, "active", "silver", str(T2), "None", True),
    ]


def test_replay_is_idempotent(spark):
    chg = _chg(
        spark,
        [(1, "idle", "gold", T1), (2, "new", "free", T1)],
    )
    once = _merge(_base_dim(spark), chg)
    twice = _merge(once, chg)
    assert _snapshot(twice) == _snapshot(once)


def test_null_attrs_compare_null_safe(spark):
    dim = _dim(spark, [(1, "active", None, T0, None, True)])
    # NULL -> NULL is a no-op; NULL -> value is a real change
    noop = _merge(dim, _chg(spark, [(1, "active", None, T1)]))
    assert _snapshot(noop) == _snapshot(dim)
    changed = _merge(dim, _chg(spark, [(1, "active", "gold", T1)]))
    assert _snapshot(changed) == [
        (1, "active", "None", str(T0), str(T1), False),
        (1, "active", "gold", str(T1), "None", True),
    ]


def test_history_rows_pass_through(spark):
    dim = _dim(
        spark,
        [
            (1, "trial", "free", TPRE, T0, False),
            (1, "active", "gold", T0, None, True),
        ],
    )
    out = _merge(dim, _chg(spark, [(1, "idle", "gold", T1)]))
    snap = _snapshot(out)
    assert (1, "trial", "free", str(TPRE), str(T0), False) in snap
    assert len(snap) == 3
    currents = [r for r in snap if r[5]]
    assert len(currents) == 1 and currents[0][1] == "idle"
