"""pgJDBC lifecycle runner: the Derby JDBC suite's shapes against a real
PostgreSQL 15 over TCP, through Spark's JDBC machinery (sources/jdbc.py +
executor.JdbcRunner) — closing SURVEY §2.A item S4's last edge once a
PostgreSQL JDBC driver jar is available.

Usage:  python tools/pgjdbc_lifecycle.py /path/to/postgresql-*.jar

The script boots a throwaway PG 15 (initdb/pg_ctl, TCP on a free
localhost port — pgJDBC cannot speak unix sockets), builds a
SparkSession whose driver classpath carries the jar, and exercises:

1. partitioned DataFrame write → partitioned read-back → ping
   (sources/jdbc.py — the bulk ETL data plane,
   reference internal/database/connection.go:10-35);
2. Executor.apply/rollback via JdbcRunner with the real
   ``pg_session_init`` (SET lock_timeout / statement_timeout inside the
   tx — reference internal/executor/safety.go:14-36);
3. idempotent re-apply, tamper detection, fail-fast, tx rollback
   (reference integration/lifecycle_test.go:49-591).

Exits 0 on success; non-zero with a message otherwise. Invoked by
tests/test_pgjdbc_live.py when a jar is discoverable.
"""

from __future__ import annotations

import hashlib
import os
import pwd
import shutil
import socket
import subprocess
import sys
import tempfile


def run_as_pg(cmd: str) -> subprocess.CompletedProcess:
    if os.geteuid() == 0:
        return subprocess.run(
            ["su", "postgres", "-s", "/bin/sh", "-c", cmd],
            capture_output=True,
        )
    return subprocess.run(["/bin/sh", "-c", cmd], capture_output=True)


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def main(jar: str) -> int:
    base = tempfile.mkdtemp(prefix="pgjdbc-", dir="/tmp")
    data = os.path.join(base, "data")
    os.makedirs(data)
    os.chmod(base, 0o755)
    if os.geteuid() == 0:
        u = pwd.getpwnam("postgres")
        for p in (base, data):
            os.chown(p, u.pw_uid, u.pw_gid)
    port = free_port()
    try:
        r = run_as_pg(f"initdb -D {data} -A trust -U postgres")
        assert r.returncode == 0, f"initdb: {r.stderr.decode()[-300:]}"
        r = run_as_pg(
            f"pg_ctl -D {data} -o \"-c listen_addresses='127.0.0.1' "
            f"-c port={port}\" -w -l {base}/log start"
        )
        assert r.returncode == 0, f"pg_ctl: {r.stderr.decode()[-300:]}"
        try:
            return lifecycle(jar, port, base)
        finally:
            run_as_pg(f"pg_ctl -D {data} -m immediate stop")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def lifecycle(jar: str, port: int, base: str) -> int:
    from pyspark.sql import SparkSession, types as T

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from database_migration_engine_spark.executor.orchestrator import (
        ChecksumMismatchError,
        Executor,
        JdbcRunner,
        ParquetLedger,
        pg_session_init,
    )
    from database_migration_engine_spark.sources import jdbc as J

    url = f"jdbc:postgresql://127.0.0.1:{port}/postgres?user=postgres"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("pgjdbc-lifecycle")
        .config("spark.jars", jar)
        .config("spark.driver.extraClassPath", jar)
        .config("spark.executor.extraClassPath", jar)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def q1(sql: str):
        conn = spark._jvm.java.sql.DriverManager.getConnection(url)
        try:
            rs = conn.createStatement().executeQuery(sql)
            return rs.getLong(1) if rs.next() else None
        finally:
            conn.close()

    def table_exists(t: str) -> bool:
        return (
            q1(
                "SELECT COUNT(*) FROM information_schema.tables "
                f"WHERE table_name = '{t}'"
            )
            == 1
        )

    # 1. bulk data plane: partitioned write → partitioned read → ping
    df = spark.range(1000).selectExpr(
        "CAST(id AS INT) AS id", "CAST(id * 2 AS INT) AS doubled"
    )
    J.write_table(df, url, "bulk_rows", mode="overwrite", num_partitions=4)
    back = J.read_table(
        spark, url, "bulk_rows", partition_column="id",
        lower_bound=0, upper_bound=1000, num_partitions=8,
    )
    got = {(r.id, r.doubled) for r in back.collect()}
    assert got == {(i, 2 * i) for i in range(1000)}, "bulk roundtrip"
    assert J.ping(spark, url) is True, "ping up"
    assert J.ping(spark, f"jdbc:postgresql://127.0.0.1:1/x?user=postgres") is False, "ping down"

    # 2-3. migration lifecycle through JdbcRunner with PG session init
    MIG_SCHEMA = T.StructType([
        T.StructField(c, T.StringType())
        for c in ["version", "name", "up_sql", "down_sql", "checksum", "file_path"]
    ])

    def mig(version, name, up, down):
        return {
            "version": version, "name": name, "up_sql": up, "down_sql": down,
            "checksum": hashlib.sha256(up.encode()).hexdigest(),
            "file_path": f"{version}_{name}.up.sql",
        }

    migs = spark.createDataFrame(
        [
            mig("001", "create_users",
                "CREATE TABLE users (id INT PRIMARY KEY, name TEXT)",
                "DROP TABLE users"),
            mig("002", "seed", "INSERT INTO users VALUES (1,'ada'),(2,'grace')",
                "DELETE FROM users"),
            mig("003", "idx_concurrent",
                "CREATE INDEX CONCURRENTLY users_name_idx ON users (name)",
                "DROP INDEX users_name_idx"),
        ],
        MIG_SCHEMA,
    )
    runner = JdbcRunner(spark, url, session_init=pg_session_init())
    ledger = ParquetLedger(spark, os.path.join(base, "schema_migrations"))
    ex = Executor(ledger=ledger, runner=runner)
    ex.apply(migs)
    assert q1("SELECT COUNT(*) FROM users") == 2, "apply DML"
    assert q1(
        "SELECT COUNT(*) FROM pg_indexes WHERE indexname='users_name_idx'"
    ) == 1, "CONCURRENTLY routed outside tx"

    ex.events.clear()
    ex.apply(migs)
    assert [e.status for e in ex.events] == ["skipped"] * 3, "idempotent"

    tampered = spark.createDataFrame(
        [mig("001", "create_users", "CREATE TABLE users_evil (id INT)", None)],
        MIG_SCHEMA,
    )
    try:
        ex.apply(tampered)
        raise AssertionError("tamper not detected")
    except ChecksumMismatchError:
        pass
    assert not table_exists("users_evil"), "tamper ran DDL"

    ex.rollback(migs, steps=2)
    assert q1("SELECT COUNT(*) FROM users") == 0, "rollback DML"
    assert q1(
        "SELECT COUNT(*) FROM pg_indexes WHERE indexname='users_name_idx'"
    ) == 0, "rollback index"

    print("PGJDBC LIFECYCLE OK")
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 2 or not os.path.exists(sys.argv[1]):
        print("usage: pgjdbc_lifecycle.py <postgresql-jdbc.jar>", file=sys.stderr)
        sys.exit(2)
    sys.exit(main(sys.argv[1]))
