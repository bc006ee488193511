"""Live PostgreSQL lifecycle tests (r03, closing VERDICT r02 gap 1).

The sandbox ships a real PostgreSQL 15 server (initdb/pg_ctl/psql) but
no JDBC driver jar, so the live path runs through ``PsqlRunner`` — the
psql-client runner whose transactional script (``BEGIN; SET
lock_timeout…; SET statement_timeout…; <sql>; COMMIT;``) carries the
exact strings ``pg_session_init`` builds, i.e. the reference's safety
pair (reference internal/executor/safety.go:14-36).

This mirrors the reference's testcontainers-Postgres suite
(reference integration/lifecycle_test.go:49-591) and covers the three
PG-dialect behaviors embedded Derby could not reach
(tests/test_jdbc_live.py):

* ``SET lock_timeout`` / ``SET statement_timeout`` accepted by a real
  server AND observed inside the migration's transaction;
* both timeouts actually firing (statement cancel on a runaway query,
  lock cancel behind an ACCESS EXCLUSIVE holder) — the canceled
  transaction rolling back cleanly;
* ``CREATE INDEX CONCURRENTLY`` succeeding only because the executor
  routes it OUTSIDE the transaction (reference
  internal/executor/concurrent.go:15-40) — with the in-tx failure as a
  negative control proving the routing is load-bearing.

PostgreSQL refuses to run as root, so when the suite runs as uid 0 the
server is bootstrapped under the ``postgres`` system user over a
private unix socket (no TCP, trust auth, throwaway data dir).
"""

from __future__ import annotations

import hashlib
import os
import pwd
import shutil
import subprocess
import tempfile
import time

import pytest
from pyspark.sql import types as T

from database_migration_engine_spark.executor.orchestrator import (
    ChecksumMismatchError,
    Executor,
    MigrationError,
    ParquetLedger,
    PsqlRunner,
)

_BINARIES = ("initdb", "pg_ctl", "psql")


def _pg_available() -> str | None:
    for b in _BINARIES:
        if shutil.which(b) is None:
            return f"{b} not on PATH"
    if os.geteuid() == 0:
        try:
            pwd.getpwnam("postgres")
        except KeyError:
            return "running as root and no postgres system user"
    return None


pytestmark = pytest.mark.skipif(
    _pg_available() is not None, reason=str(_pg_available())
)


def _run_as_pg(cmd: str) -> subprocess.CompletedProcess:
    """Run a server-side command, dropping to the postgres user when the
    test process is root (PostgreSQL refuses root)."""
    if os.geteuid() == 0:
        return subprocess.run(
            ["su", "postgres", "-s", "/bin/sh", "-c", cmd],
            capture_output=True,
        )
    return subprocess.run(["/bin/sh", "-c", cmd], capture_output=True)


@pytest.fixture(scope="module")
def pg_sock():
    base = tempfile.mkdtemp(prefix="pglive-", dir="/tmp")
    data = os.path.join(base, "data")
    sock = os.path.join(base, "sock")
    os.makedirs(data)
    os.makedirs(sock)
    os.chmod(base, 0o755)
    if os.geteuid() == 0:
        u = pwd.getpwnam("postgres")
        for p in (base, data, sock):
            os.chown(p, u.pw_uid, u.pw_gid)
    r = _run_as_pg(f"initdb -D {data} -A trust -U postgres")
    if r.returncode != 0:
        shutil.rmtree(base, ignore_errors=True)
        pytest.skip(f"initdb failed: {r.stderr.decode(errors='replace')[-300:]}")
    r = _run_as_pg(
        f"pg_ctl -D {data} -o \"-c listen_addresses='' -k {sock}\" "
        f"-w -l {base}/log start"
    )
    if r.returncode != 0:
        shutil.rmtree(base, ignore_errors=True)
        pytest.skip(f"pg_ctl failed: {r.stderr.decode(errors='replace')[-300:]}")
    yield sock
    _run_as_pg(f"pg_ctl -D {data} -m immediate stop")
    shutil.rmtree(base, ignore_errors=True)


_DB_SEQ = {"n": 0}


@pytest.fixture()
def pg_db(pg_sock):
    """A fresh database per test for isolation."""
    _DB_SEQ["n"] += 1
    db = f"lifecycle_{_DB_SEQ['n']}"
    subprocess.run(
        ["psql", "-X", "-h", pg_sock, "-U", "postgres", "-d", "postgres",
         "-c", f"CREATE DATABASE {db}"],
        check=True, capture_output=True,
    )
    return ["-h", pg_sock, "-U", "postgres", "-d", db]


def _q(conn_args: list[str], sql: str) -> str:
    """Scalar/tuple query; returns stripped stdout (tab-separated)."""
    r = subprocess.run(
        ["psql", "-X", "-tA", *conn_args, "-c", sql],
        capture_output=True, check=True,
    )
    return r.stdout.decode().strip()


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
def runner(pg_db):
    return PsqlRunner(pg_db)


@pytest.fixture()
def executor(spark, tmp_path, runner):
    ledger = ParquetLedger(spark, str(tmp_path / "schema_migrations"))
    return Executor(ledger=ledger, runner=runner)


def _lifecycle_migrations(spark):
    rows = [
        _mig(
            "001", "create_users",
            "CREATE TABLE users (id INT PRIMARY KEY, name VARCHAR(50))",
            "DROP TABLE users",
        ),
        _mig(
            "002", "seed_users",
            "INSERT INTO users VALUES (1, 'ada'), (2, 'grace')",
            "DELETE FROM users",
        ),
        _mig(
            "003", "index_users",
            "CREATE INDEX CONCURRENTLY idx_users_name ON users (name)",
            "DROP INDEX CONCURRENTLY idx_users_name",
        ),
    ]
    return spark.createDataFrame(rows, MIG_SCHEMA)


# --- lifecycle (reference integration/lifecycle_test.go:49-151) -------------


def test_apply_executes_real_ddl_dml_and_concurrent_index(
    spark, executor, pg_db
):
    executor.apply(_lifecycle_migrations(spark))
    assert _q(pg_db, "SELECT COUNT(*) FROM users") == "2"
    # the CONCURRENTLY index exists and is valid — possible only because
    # the executor ran it outside the transaction
    assert _q(
        pg_db,
        "SELECT indisvalid FROM pg_index i JOIN pg_class c"
        " ON c.oid = i.indexrelid WHERE c.relname = 'idx_users_name'",
    ) == "t"
    applied = {r.version for r in executor.ledger.applied().collect()}
    assert applied == {"001", "002", "003"}


def test_reapply_skips_everything_live(spark, executor, pg_db):
    migs = _lifecycle_migrations(spark)
    executor.apply(migs)
    executor.events.clear()
    executor.apply(migs)  # real DDL would fail if re-executed
    assert [e.status for e in executor.events] == ["skipped"] * 3
    assert _q(pg_db, "SELECT COUNT(*) FROM users") == "2"


def test_tamper_detected_before_touching_database(spark, executor, pg_db):
    executor.apply(_lifecycle_migrations(spark))
    tampered = spark.createDataFrame(
        [_mig("001", "create_users", "CREATE TABLE evil (id INT)", None)],
        MIG_SCHEMA,
    )
    with pytest.raises(ChecksumMismatchError):
        executor.apply(tampered)
    assert _q(pg_db, "SELECT to_regclass('evil') IS NULL") == "t"


def test_rollback_reverses_real_schema_objects(spark, executor, pg_db):
    migs = _lifecycle_migrations(spark)
    executor.apply(migs)
    executor.rollback(migs, steps=2)  # drops index, deletes rows
    assert _q(pg_db, "SELECT COUNT(*) FROM users") == "0"
    assert _q(pg_db, "SELECT to_regclass('idx_users_name') IS NULL") == "t"
    applied = {r.version for r in executor.ledger.applied().collect()}
    assert applied == {"001"}


def test_failed_tx_rolls_back_and_fails_fast(spark, executor, pg_db):
    rows = [
        _mig("001", "ok", "CREATE TABLE t1 (id INT)", "DROP TABLE t1"),
        _mig(
            "002", "broken",
            # first statement succeeds, second fails → the whole tx must
            # roll back (no partial t2)
            "CREATE TABLE t2 (id INT); SELECT 1/0",
            None,
        ),
        _mig("003", "never_runs", "CREATE TABLE t3 (id INT)", None),
    ]
    with pytest.raises(Exception):
        executor.apply(spark.createDataFrame(rows, MIG_SCHEMA))
    assert _q(pg_db, "SELECT to_regclass('t1') IS NOT NULL") == "t"
    assert _q(pg_db, "SELECT to_regclass('t2') IS NULL") == "t"
    assert _q(pg_db, "SELECT to_regclass('t3') IS NULL") == "t"
    applied = {r.version for r in executor.ledger.applied().collect()}
    assert applied == {"001"}  # fail-fast: 002 failed, 003 never attempted


# --- PG-dialect specifics Derby could not reach -----------------------------


def test_session_init_timeouts_observed_inside_migration_tx(
    spark, executor, pg_db
):
    """E7: the reference's safety pair must be in effect inside the
    transaction that runs the migration (internal/executor/safety.go:
    14-36, defaults config.go:14-15) — recorded server-side by the
    migration itself."""
    up = (
        "CREATE TABLE settings_probe AS SELECT"
        " current_setting('lock_timeout') AS lt,"
        " current_setting('statement_timeout') AS st"
    )
    executor.apply(
        spark.createDataFrame([_mig("001", "probe", up, None)], MIG_SCHEMA)
    )
    # the server pretty-prints round millisecond values in seconds
    assert _q(pg_db, "SELECT lt || '|' || st FROM settings_probe") == "5s|30s"


def test_statement_timeout_cancels_runaway_statement(pg_db):
    fast = PsqlRunner(pg_db, statement_timeout_ms=200)
    with pytest.raises(MigrationError) as e:
        fast.run("SELECT pg_sleep(5)", in_tx=True)
    assert "statement timeout" in str(e.value)


def test_lock_timeout_fires_behind_access_exclusive_holder(pg_db, pg_sock):
    """The lock_timeout story end-to-end: a blocker holds ACCESS
    EXCLUSIVE on the table; the migration's ALTER waits at most
    lock_timeout and is canceled — instead of queueing forever behind
    the lock (the exact outage mode the reference's safety.go exists
    to prevent)."""
    runner = PsqlRunner(pg_db, lock_timeout_ms=200)
    runner.run("CREATE TABLE contended (id INT)", in_tx=True)

    blocker = subprocess.Popen(
        ["psql", "-X", "-q", *pg_db, "-f", "-"],
        stdin=subprocess.PIPE, stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    blocker.stdin.write(
        b"BEGIN;\nLOCK TABLE contended IN ACCESS EXCLUSIVE MODE;\n"
        b"SELECT pg_sleep(30);\nCOMMIT;\n"
    )
    blocker.stdin.flush()
    try:
        deadline = time.time() + 10
        while time.time() < deadline:
            held = _q(
                pg_db,
                "SELECT COUNT(*) FROM pg_locks l JOIN pg_class c"
                " ON c.oid = l.relation WHERE c.relname = 'contended'"
                " AND l.mode = 'AccessExclusiveLock' AND l.granted",
            )
            if held == "1":
                break
            time.sleep(0.1)
        else:
            pytest.fail("blocker never acquired the lock")
        with pytest.raises(MigrationError) as e:
            runner.run("ALTER TABLE contended ADD COLUMN x INT", in_tx=True)
        assert "lock timeout" in str(e.value)
    finally:
        blocker.kill()
        blocker.wait()
    # the canceled transaction rolled back: no column x
    assert _q(
        pg_db,
        "SELECT COUNT(*) FROM information_schema.columns"
        " WHERE table_name = 'contended' AND column_name = 'x'",
    ) == "0"


def test_concurrently_inside_tx_fails_negative_control(pg_db, runner):
    """Proof the executor's outside-tx routing is load-bearing: the same
    statement inside a transaction block is rejected by the server
    (reference internal/executor/concurrent.go:15-40 exists precisely
    because of this)."""
    runner.run("CREATE TABLE ct (id INT)", in_tx=True)
    with pytest.raises(MigrationError) as e:
        runner.run("CREATE INDEX CONCURRENTLY idx_ct ON ct (id)", in_tx=True)
    assert "cannot run inside a transaction block" in str(e.value)
    # and outside it succeeds
    runner.run("CREATE INDEX CONCURRENTLY idx_ct ON ct (id)", in_tx=False)
    assert _q(pg_db, "SELECT to_regclass('idx_ct') IS NOT NULL") == "t"


def test_cli_apply_status_against_live_pg(spark, tmp_path, pg_sock, capsys):
    """The CLI product surface end-to-end against live PostgreSQL via a
    native postgresql:// URL (routed to PsqlRunner)."""
    import argparse

    from database_migration_engine_spark import cli
    from database_migration_engine_spark import config as cfg

    _DB_SEQ["n"] += 1
    db = f"clidb_{_DB_SEQ['n']}"
    subprocess.run(
        ["psql", "-X", "-h", pg_sock, "-U", "postgres", "-d", "postgres",
         "-c", f"CREATE DATABASE {db}"],
        check=True, capture_output=True,
    )
    url = f"postgresql://postgres@/{db}?host={pg_sock}"

    d = tmp_path / "migs"
    d.mkdir()
    (d / "V001_create_widgets.up.sql").write_text(
        "CREATE TABLE widgets (id INT PRIMARY KEY)"
    )
    (d / "V001_create_widgets.down.sql").write_text("DROP TABLE widgets")

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
    assert _q(
        ["-h", pg_sock, "-U", "postgres", "-d", db],
        "SELECT to_regclass('widgets') IS NOT NULL",
    ) == "t"

    rc = cli.cmd_status(spark, conf, argparse.Namespace())
    assert rc == 0
    out = capsys.readouterr().out
    assert "001" in out


# The PG-dialect string-matrix tests (which must run even WITHOUT a live
# server, and would be skipped by this module's pytestmark) live in
# tests/test_executor.py: test_pg_dialect_strings_are_pinned and
# test_psql_runner_script_shapes.


def test_wave14_concurrent_forms_refused_in_tx_and_routed(pg_db, runner):
    """The two live controls behind the fuzz-wave-14 routing decision:

    * ALTER TABLE … DETACH PARTITION … CONCURRENTLY is refused inside a
      transaction block, exactly like CREATE INDEX CONCURRENTLY — the
      reference routes only IndexStmt/DropStmt
      (internal/executor/concurrent.go:27-36), so it would wrap the form
      in BEGIN/COMMIT and fail at apply time; contains_concurrent_op
      must send it outside.
    * REFRESH MATERIALIZED VIEW CONCURRENTLY is ACCEPTED inside a
      transaction block (this refuted the wave's draft fix, which had
      routed it outside) — it must stay on the transactional path, so
      the executor keeps the tx wrapper and safety timeouts."""
    from database_migration_engine_spark.analyzer.parse import (
        contains_concurrent_op,
    )

    runner.run("CREATE TABLE w14_base (id INT)", in_tx=True)
    runner.run(
        "CREATE MATERIALIZED VIEW w14_mv AS SELECT id FROM w14_base",
        in_tx=True,
    )
    runner.run("CREATE UNIQUE INDEX w14_mv_id ON w14_mv (id)", in_tx=True)
    # positive control: the server ACCEPTS the concurrent refresh in-tx
    runner.run("REFRESH MATERIALIZED VIEW CONCURRENTLY w14_mv", in_tx=True)

    runner.run(
        "CREATE TABLE w14_pt (id INT) PARTITION BY RANGE (id)", in_tx=True
    )
    runner.run(
        "CREATE TABLE w14_pt1 PARTITION OF w14_pt FOR VALUES FROM (0) TO (10)",
        in_tx=True,
    )
    with pytest.raises(MigrationError) as e:
        runner.run(
            "ALTER TABLE w14_pt DETACH PARTITION w14_pt1 CONCURRENTLY",
            in_tx=True,
        )
    assert "transaction block" in str(e.value)
    runner.run(
        "ALTER TABLE w14_pt DETACH PARTITION w14_pt1 CONCURRENTLY",
        in_tx=False,
    )
    assert _q(pg_db, "SELECT to_regclass('w14_pt1') IS NOT NULL") == "t"

    # and the routing predicate matches the server's behavior exactly:
    # DETACH … CONCURRENTLY routes outside, everything else (including
    # the tx-tolerant concurrent refresh) stays transactional
    assert contains_concurrent_op(
        "ALTER TABLE w14_pt DETACH PARTITION w14_pt1 CONCURRENTLY;"
    )
    assert not contains_concurrent_op(
        "REFRESH MATERIALIZED VIEW CONCURRENTLY w14_mv;"
    )
    assert not contains_concurrent_op("REFRESH MATERIALIZED VIEW w14_mv;")
    assert not contains_concurrent_op(
        "ALTER TABLE w14_pt DETACH PARTITION w14_pt1;"
    )
