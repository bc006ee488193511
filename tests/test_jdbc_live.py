"""Live-JDBC lifecycle tests against embedded Apache Derby (VERDICT r01
item 5: round 1 only ever mock-tested the JDBC path).

Derby ships on Spark's own classpath (derby*.jar, there for the Hive
metastore), so ``jdbc:derby:<dir>;create=true`` gives a real JDBC
endpoint — real connections, transactions, commits and rollbacks through
``java.sql.DriverManager`` — with no external service. This mirrors the
reference's testcontainers-Postgres lifecycle suite
(reference integration/lifecycle_test.go:49-591): apply → verify schema
objects exist → idempotent re-apply → tamper detection → rollback →
objects gone, plus the DataFrame read/write/ping path in sources/jdbc.py.

Dialect note: Derby speaks neither PostgreSQL's ``SET *_timeout`` nor
``CONCURRENTLY``, so the runner gets ``session_init=[]`` and the
tx-routing predicate is asserted against the runner contract separately
(tests/test_executor.py keeps the CONCURRENTLY routing coverage).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import types as T

from database_migration_engine_spark.executor.orchestrator import (
    ChecksumMismatchError,
    Executor,
    JdbcRunner,
    MigrationError,
    ParquetLedger,
)
from database_migration_engine_spark.sources import jdbc as J

MIG_SCHEMA = T.StructType(
    [
        T.StructField("version", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("up_sql", T.StringType()),
        T.StructField("down_sql", T.StringType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("file_path", T.StringType()),
    ]
)


def _mig(version: str, name: str, up: str, down: str | None):
    return {
        "version": version,
        "name": name,
        "up_sql": up,
        "down_sql": down,
        "checksum": hashlib.sha256(up.encode()).hexdigest(),
        "file_path": f"{version}_{name}.up.sql",
    }


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/db;create=true"


@pytest.fixture()
def runner(spark, derby_url):
    return JdbcRunner(spark, derby_url, session_init=[])


@pytest.fixture()
def executor(spark, tmp_path, runner):
    ledger = ParquetLedger(spark, str(tmp_path / "schema_migrations"))
    return Executor(ledger=ledger, runner=runner)


def _query_one(spark, url: str, sql: str):
    """Scalar query through a raw JDBC connection."""
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        rs = conn.createStatement().executeQuery(sql)
        return rs.getLong(1) if rs.next() else None
    finally:
        conn.close()


def _table_exists(spark, url: str, table: str) -> bool:
    try:
        _query_one(spark, url, f"SELECT COUNT(*) FROM {table}")
        return True
    except Exception:
        return False


def _lifecycle_migrations(spark):
    rows = [
        _mig(
            "001",
            "create_users",
            "CREATE TABLE users (id INT PRIMARY KEY, name VARCHAR(50))",
            "DROP TABLE users",
        ),
        _mig(
            "002",
            "seed_users",
            "INSERT INTO users VALUES (1, 'ada'), (2, 'grace')",
            "DELETE FROM users",
        ),
        _mig(
            "003",
            "create_audit",
            "CREATE TABLE audit (id INT PRIMARY KEY)",
            "DROP TABLE audit",
        ),
    ]
    return spark.createDataFrame(rows, MIG_SCHEMA)


def test_apply_executes_real_ddl_and_dml(spark, executor, derby_url):
    executor.apply(_lifecycle_migrations(spark))
    assert _table_exists(spark, derby_url, "users")
    assert _query_one(spark, derby_url, "SELECT COUNT(*) FROM users") == 2
    assert _table_exists(spark, derby_url, "audit")
    applied = {r.version for r in executor.ledger.applied().collect()}
    assert applied == {"001", "002", "003"}


def test_reapply_skips_everything_live(spark, executor, derby_url):
    migs = _lifecycle_migrations(spark)
    executor.apply(migs)
    executor.events.clear()
    executor.apply(migs)  # second run: real DDL would fail if re-executed
    assert [e.status for e in executor.events] == ["skipped"] * 3
    assert _query_one(spark, derby_url, "SELECT COUNT(*) FROM users") == 2


def test_tamper_detected_before_touching_database(spark, executor, derby_url):
    migs = _lifecycle_migrations(spark)
    executor.apply(migs)
    tampered = spark.createDataFrame(
        [
            _mig("001", "create_users", "CREATE TABLE users_evil (id INT)", None)
        ],
        MIG_SCHEMA,
    )
    with pytest.raises(ChecksumMismatchError):
        executor.apply(tampered)
    assert not _table_exists(spark, derby_url, "users_evil")


def test_failed_statement_fails_fast_and_skips_ledger(
    spark, executor, derby_url
):
    rows = [
        _mig("001", "ok", "CREATE TABLE t1 (id INT)", "DROP TABLE t1"),
        _mig("002", "broken", "CREATE TABLE WHERE SYNTAX (", None),
        _mig("003", "never_runs", "CREATE TABLE t3 (id INT)", "DROP TABLE t3"),
    ]
    with pytest.raises(Exception):
        executor.apply(spark.createDataFrame(rows, MIG_SCHEMA))
    assert _table_exists(spark, derby_url, "t1")
    assert not _table_exists(spark, derby_url, "t3")
    applied = {r.version for r in executor.ledger.applied().collect()}
    assert applied == {"001"}  # fail-fast: 002 failed, 003 never attempted


def test_rollback_reverses_real_schema_objects(spark, executor, derby_url):
    migs = _lifecycle_migrations(spark)
    executor.apply(migs)
    executor.rollback(migs, steps=2)  # drops audit, deletes users rows
    assert not _table_exists(spark, derby_url, "audit")
    assert _query_one(spark, derby_url, "SELECT COUNT(*) FROM users") == 0
    applied = {r.version for r in executor.ledger.applied().collect()}
    assert applied == {"001"}


def test_rollback_to_version_live(spark, executor, derby_url):
    migs = _lifecycle_migrations(spark)
    executor.apply(migs)
    executor.rollback_to_version(migs, "001")
    assert _table_exists(spark, derby_url, "users")
    assert not _table_exists(spark, derby_url, "audit")
    applied = {r.version for r in executor.ledger.applied().collect()}
    assert applied == {"001"}


def test_tx_rollback_leaves_no_partial_state(spark, runner, derby_url):
    """A failing transactional statement must roll back, and the
    connection teardown must not leak the failed work."""
    runner.run("CREATE TABLE txt (id INT PRIMARY KEY)", in_tx=True)
    runner.run("INSERT INTO txt VALUES (1)", in_tx=True)
    with pytest.raises(Exception):
        # PK violation inside a transaction → rollback path
        runner.run("INSERT INTO txt VALUES (1)", in_tx=True)
    assert _query_one(spark, derby_url, "SELECT COUNT(*) FROM txt") == 1


def test_dataframe_write_read_ping_roundtrip(spark, derby_url):
    """sources/jdbc.py against a live endpoint: bulk write → partitioned
    read-back → ping."""
    df = spark.range(100).selectExpr(
        "CAST(id AS INT) AS id", "CAST(id * 2 AS INT) AS doubled"
    )
    J.write_table(df, derby_url, "bulk_rows", mode="overwrite", num_partitions=2)
    back = J.read_table(
        spark,
        derby_url,
        "bulk_rows",
        partition_column="id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    rows = {(r.id, r.doubled) for r in back.collect()}
    assert rows == {(i, 2 * i) for i in range(100)}
    derby_probe = "SELECT 1 AS ping FROM SYSIBM.SYSDUMMY1"
    assert J.ping(spark, derby_url, probe=derby_probe) is True
    assert J.ping(spark, "jdbc:derby:/nonexistent/nope", probe=derby_probe) is False


def test_cli_apply_status_against_live_derby(spark, tmp_path, capsys):
    """The CLI product surface end-to-end against a real JDBC endpoint:
    apply a migrations dir to embedded Derby via --database-url semantics
    (Config.database_url), then verify the schema object exists and
    status reports the applied version."""
    import argparse

    from database_migration_engine_spark import cli
    from database_migration_engine_spark import config as cfg

    d = tmp_path / "migs"
    d.mkdir()
    (d / "V001_create_widgets.up.sql").write_text(
        "CREATE TABLE widgets (id INT PRIMARY KEY)"
    )
    (d / "V001_create_widgets.down.sql").write_text("DROP TABLE widgets")

    url = f"jdbc:derby:{tmp_path}/clidb;create=true"
    conf = cfg.Config(
        migrations_dir=str(d),
        ledger_path=str(tmp_path / "ledger"),
        database_url=url,
    )
    rc = cli.cmd_apply(
        spark, conf,
        argparse.Namespace(dry_run=False, force=False, echo=False),
    )
    assert rc == 0
    assert _table_exists(spark, url, "widgets")

    rc = cli.cmd_status(spark, conf, argparse.Namespace())
    assert rc == 0
    out = capsys.readouterr().out
    assert "001" in out
