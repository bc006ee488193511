"""Deterministic migration-engine fixtures, emitted to BOTH engines.

The driver's DuckDB oracle pre-registers only the analytics parquet tables,
so the migration/ledger operators are made oracle-checkable by inlining the
same deterministic corpus on both sides:

* :func:`migrations_df` / :func:`ledger_df` build Spark DataFrames from the
  Python literals below;
* :func:`migrations_values_cte` / :func:`ledger_values_cte` emit the same
  rows as ANSI ``VALUES`` CTEs for the oracle SQL.

Corpus content follows the reference's test corpus of record
(reference testdata/migrations/V001–V012, SURVEY.md §5): one migration per
danger-rule trigger plus safe cases. Checksums are computed here with
hashlib so they equal ``sha2(up_sql, 256)`` in Spark and ``sha256(up_sql)``
in DuckDB by construction (reference internal/migration/migration.go:19-23).
"""

from __future__ import annotations

import datetime as _dt
import hashlib

from pyspark.sql import DataFrame, SparkSession

from . import schemas


def _checksum(sql: str) -> str:
    return hashlib.sha256(sql.encode("utf-8")).hexdigest()


# (version, name, up_sql, down_sql|None)
_CORPUS: list[tuple[str, str, str, str | None]] = [
    (
        "001",
        "create_users",
        "CREATE TABLE users (id BIGSERIAL PRIMARY KEY, email TEXT NOT NULL, "
        "created_at TIMESTAMPTZ DEFAULT NOW());",
        "DROP TABLE IF EXISTS users;",
    ),
    (
        "002",
        "add_email_index",
        "CREATE INDEX idx_users_email ON users (email);",
        "DROP INDEX IF EXISTS idx_users_email;",
    ),
    (
        "003",
        "add_column_default",
        "ALTER TABLE users ADD COLUMN status TEXT DEFAULT 'active';",
        "ALTER TABLE users DROP COLUMN IF EXISTS status;",
    ),
    (
        "004",
        "add_constraint",
        "ALTER TABLE users ADD CONSTRAINT chk_email CHECK (email ~* '^.+@.+$');",
        "ALTER TABLE users DROP CONSTRAINT IF EXISTS chk_email;",
    ),
    (
        "005",
        "alter_column_type",
        "ALTER TABLE users ALTER COLUMN email TYPE VARCHAR(255);",
        "ALTER TABLE users ALTER COLUMN email TYPE TEXT;",
    ),
    (
        "006",
        "set_not_null",
        "ALTER TABLE users ALTER COLUMN status SET NOT NULL;",
        "ALTER TABLE users ALTER COLUMN status DROP NOT NULL;",
    ),
    (
        "007",
        "drop_table",
        "DROP TABLE users;",
        "CREATE TABLE users (id BIGSERIAL PRIMARY KEY, email TEXT NOT NULL);",
    ),
    ("008", "vacuum_full", "VACUUM FULL users;", None),
    ("009", "lock_table", "LOCK TABLE users IN ACCESS EXCLUSIVE MODE;", None),
    (
        "010",
        "rename_column",
        "ALTER TABLE users RENAME COLUMN email TO email_address;",
        "ALTER TABLE users RENAME COLUMN email_address TO email;",
    ),
    (
        "011",
        "safe_concurrent_index",
        "CREATE INDEX CONCURRENTLY idx_users_status ON users (status);",
        "DROP INDEX CONCURRENTLY IF EXISTS idx_users_status;",
    ),
    ("012", "safe_add_column", "ALTER TABLE users ADD COLUMN bio TEXT;", None),
]

MIGRATION_ROWS: list[tuple[str, str, str, str | None, str, str]] = [
    (
        version,
        name,
        up_sql,
        down_sql,
        _checksum(up_sql),
        f"migrations/V{version}_{name}.up.sql",
    )
    for version, name, up_sql, down_sql in _CORPUS
]

# Ledger state exercising skip / pending / rollback paths (FIXTURES.md §2):
# 001–006 applied, 007 rolled_back, 008–012 absent (pending).
_EPOCH = _dt.datetime(2024, 1, 1, 0, 0, 0)

LEDGER_ROWS: list[tuple[str, str, str, _dt.datetime, int, str]] = [
    (
        version,
        f"V{version}_{name}.up.sql",
        _checksum(up_sql),
        _EPOCH + _dt.timedelta(minutes=int(version)),
        40 + int(version),
        "rolled_back" if version == "007" else "applied",
    )
    for version, name, up_sql, _down in _CORPUS
    if version <= "007"
]

# Tamper variant: ledger row for 003 whose checksum does NOT match the
# migration file — drives the checksum-mismatch error path
# (reference internal/executor/executor.go:376-388).
TAMPERED_LEDGER_ROWS = [
    row if row[0] != "003" else (row[0], row[1], "0" * 64, row[3], row[4], row[5])
    for row in LEDGER_ROWS
]


def migrations_df(spark: SparkSession) -> DataFrame:
    # Built from a SQL VALUES inline table, NOT createDataFrame: a local
    # Python list becomes a Python-RDD-backed plan whose every evaluation
    # round-trips through Python workers (seconds of overhead for 12 rows),
    # while an inline table is a pure JVM LocalRelation — constant-folded,
    # broadcastable, one partition.
    rows = ",\n".join(
        f"({_sql_str(v)}, {_sql_str(n)}, {_sql_str(up)}, {_sql_str(down)},"
        f" {_sql_str(ck)}, {_sql_str(fp)})"
        for v, n, up, down, ck, fp in MIGRATION_ROWS
    )
    return spark.sql(
        f"SELECT * FROM (VALUES {rows}) AS "
        f"migrations(version, name, up_sql, down_sql, checksum, file_path)"
    )


def ledger_df(spark: SparkSession, tampered: bool = False) -> DataFrame:
    source = TAMPERED_LEDGER_ROWS if tampered else LEDGER_ROWS
    rows = ",\n".join(
        f"({_sql_str(v)}, {_sql_str(fn)}, {_sql_str(ck)},"
        f" TIMESTAMP '{ts:%Y-%m-%d %H:%M:%S}', {dur}, {_sql_str(st)})"
        for v, fn, ck, ts, dur, st in source
    )
    return spark.sql(
        f"SELECT version, filename, checksum, applied_at, "
        f"CAST(duration_ms AS INT) AS duration_ms, status "
        f"FROM (VALUES {rows}) AS schema_migrations"
        f"(version, filename, checksum, applied_at, duration_ms, status)"
    )


def _sql_str(value: str | None) -> str:
    # STRING is accepted by both Spark SQL and DuckDB (VARCHAR alias).
    if value is None:
        return "CAST(NULL AS STRING)"
    return "'" + value.replace("'", "''") + "'"


def migrations_values_cte(alias: str = "migrations") -> str:
    """``alias(version, name, up_sql, down_sql, checksum, file_path)`` CTE."""
    rows = ",\n    ".join(
        f"({_sql_str(v)}, {_sql_str(n)}, {_sql_str(up)}, {_sql_str(down)},"
        f" {_sql_str(ck)}, {_sql_str(fp)})"
        for v, n, up, down, ck, fp in MIGRATION_ROWS
    )
    return (
        f"{alias}(version, name, up_sql, down_sql, checksum, file_path) AS "
        f"(VALUES\n    {rows})"
    )


def ledger_values_cte(alias: str = "schema_migrations", tampered: bool = False) -> str:
    """``alias(version, filename, checksum, applied_at, duration_ms, status)`` CTE."""
    source = TAMPERED_LEDGER_ROWS if tampered else LEDGER_ROWS
    rows = ",\n    ".join(
        f"({_sql_str(v)}, {_sql_str(fn)}, {_sql_str(ck)},"
        f" TIMESTAMP '{ts:%Y-%m-%d %H:%M:%S}', {dur}, {_sql_str(st)})"
        for v, fn, ck, ts, dur, st in source
    )
    return (
        f"{alias}(version, filename, checksum, applied_at, duration_ms, status) AS "
        f"(VALUES\n    {rows})"
    )


# --- price-band interval dimension (range-join queries) --------------------

# Ten fixed-width retail-price bands covering the part fixture's
# p_retailprice domain [900, 1000). Emitted as a VALUES literal so both
# engines inline the identical tiny dimension (JVM LocalRelation on the
# Spark side — never createDataFrame, see memory/perf notes).
PRICE_BANDS = [(i, 900.0 + 10.0 * i, 910.0 + 10.0 * i) for i in range(10)]


def price_bands_values() -> str:
    """``(band_id, lo, hi)`` VALUES body shared by Spark SQL and DuckDB."""
    return ",\n    ".join(
        f"({i}, CAST({lo:.1f} AS DOUBLE), CAST({hi:.1f} AS DOUBLE))"
        for i, lo, hi in PRICE_BANDS
    )
