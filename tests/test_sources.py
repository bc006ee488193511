"""Migration-directory source tests (loader behaviors S1–S3,
reference internal/migration/loader_test.go per SURVEY.md §5)."""

from __future__ import annotations

import hashlib

from database_migration_engine_spark.sources.migrations import load_from_dir


def _write(dirpath, name, content):
    (dirpath / name).write_text(content)


def test_load_from_dir(spark, tmp_path):
    d = tmp_path / "migs"
    d.mkdir()
    _write(d, "V001_create_users.up.sql", "CREATE TABLE users (id int);\n")
    _write(d, "V001_create_users.down.sql", "DROP TABLE users;\n")
    _write(d, "V002_add_index.up.sql", "CREATE INDEX i ON users(id);")
    # timestamp-style version
    _write(d, "20240101120000_ts_mig.up.sql", "SELECT 1;")
    # orphan down file → dropped
    _write(d, "V009_orphan.down.sql", "DROP TABLE orphan;")
    # non-matching files → silently skipped
    _write(d, "README.sql", "not a migration")
    _write(d, "V003_bad_direction.sideways.sql", "SELECT 2;")

    rows = {r.version: r for r in load_from_dir(spark, str(d)).collect()}
    assert set(rows) == {"001", "002", "20240101120000"}

    users = rows["001"]
    assert users.name == "create_users"
    assert users.up_sql == "CREATE TABLE users (id int);"  # trimmed
    assert users.down_sql == "DROP TABLE users;"
    assert users.checksum == hashlib.sha256(
        b"CREATE TABLE users (id int);"
    ).hexdigest()
    assert users.file_path.endswith("V001_create_users.up.sql")

    assert rows["002"].down_sql is None
    assert rows["20240101120000"].file_path.endswith(
        "20240101120000_ts_mig.up.sql"
    )


def test_version_sort_is_lexicographic(spark, tmp_path):
    """String sort, not numeric (reference internal/migration/sorter.go:11-15):
    V9 sorts after V10 numerically but '10' < '9' lexicographically."""
    d = tmp_path / "migs"
    d.mkdir()
    _write(d, "V9_nine.up.sql", "SELECT 9;")
    _write(d, "V10_ten.up.sql", "SELECT 10;")
    versions = [r.version for r in load_from_dir(spark, str(d)).collect()]
    assert versions == ["10", "9"]


def test_jdbc_partitioned_read_requires_bounds(spark):
    from database_migration_engine_spark.sources import jdbc

    import pytest

    with pytest.raises(ValueError, match="lower_bound"):
        jdbc.reader(
            spark, "jdbc:postgresql://h/db", "t", partition_column="id"
        )


def test_jdbc_ping_unreachable_is_false(spark):
    from database_migration_engine_spark.sources import jdbc

    assert jdbc.ping(spark, "jdbc:postgresql://127.0.0.1:1/nope") is False
