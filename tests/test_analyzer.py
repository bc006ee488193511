"""Analyzer pipeline tests: expected findings per corpus migration
(FIXTURES.md §1 fixes the expected rule/severity per version) and
version-aware rule behavior (R2 PG≥11, R5 PG≥12)."""

from __future__ import annotations

from database_migration_engine_spark import fixtures
from database_migration_engine_spark.analyzer.analyze import (
    analyze,
    extract_statements,
    severity_rollup,
)

EXPECTED_PG14 = {
    "002": [("create-index-not-concurrent", 3)],
    "004": [("add-constraint-without-not-valid", 3)],
    "005": [("alter-column-type", 3)],
    "006": [("set-not-null", 2)],
    "007": [("drop-table", 4)],
    "008": [("vacuum-full", 3)],
    "009": [("lock-table", 3)],
    "010": [("rename", 2)],
}


def _findings_by_version(spark, pg_version):
    rows = analyze(fixtures.migrations_df(spark), pg_version=pg_version).collect()
    out: dict[str, list[tuple[str, int]]] = {}
    for r in rows:
        out.setdefault(r.version, []).append((r.rule, r.severity))
    return out


def test_corpus_findings_pg14(spark):
    got = _findings_by_version(spark, 14)
    assert got == EXPECTED_PG14


def test_corpus_findings_pg10(spark):
    """On PG<11 any ADD COLUMN DEFAULT fires R2 (constant or not) and
    SET NOT NULL stays HIGH (reference alter_add_column.go:74-81,
    alter_set_not_null.go:44-50)."""
    got = _findings_by_version(spark, 10)
    assert got["003"] == [("add-column-volatile-default", 3)]
    assert got["006"] == [("set-not-null", 3)]


def test_safe_migrations_have_no_findings(spark):
    got = _findings_by_version(spark, 14)
    for safe_version in ("001", "003", "011", "012"):
        assert safe_version not in got


def test_statement_features_shape(spark):
    stmts = extract_statements(fixtures.migrations_df(spark)).collect()
    assert len(stmts) == 12  # single-statement corpus
    by_version = {r.version: r for r in stmts}
    assert by_version["002"].stmt_type == "create_index"
    assert by_version["011"].concurrent is True
    assert by_version["007"].stmt_type == "drop_table"


def test_rollup_gate(spark):
    rollup = {
        r.version: r
        for r in severity_rollup(fixtures.migrations_df(spark)).collect()
    }
    assert len(rollup) == 12
    assert rollup["007"].max_severity == 4
    assert rollup["007"].has_high_or_critical is True
    assert rollup["006"].max_severity == 2
    assert rollup["006"].has_high_or_critical is False
    assert rollup["001"].max_severity == 0
    assert rollup["001"].n_findings == 0


def test_statement_truncation(spark):
    """Display cap at 120 chars (reference internal/analyzer/analyzer.go:10,
    result.go:30-35)."""
    from database_migration_engine_spark import schemas

    long_sql = "DROP TABLE " + ", ".join(f"t{i}" for i in range(40)) + ";"
    mig = spark.createDataFrame(
        [("x", "n", long_sql, None, "c", "p")], schema=schemas.MIGRATIONS
    )
    [finding] = analyze(mig).collect()
    assert len(finding.statement) == 120
    assert finding.statement.endswith("...")


def test_multi_statement_migration(spark):
    """One migration containing several statements: per-statement fan-out
    with correct stmt_index (the reference iterates RawStmts in order,
    analyzer.go:63-87)."""
    from database_migration_engine_spark import schemas

    sql = (
        "CREATE TABLE t (id int);\n"
        "CREATE INDEX i ON t (id);\n"
        "DROP TABLE old_t;\n"
    )
    mig = spark.createDataFrame(
        [("x", "multi", sql, None, "c", "p")], schema=schemas.MIGRATIONS
    )
    findings = sorted(
        (r.stmt_index, r.rule, r.severity) for r in analyze(mig).collect()
    )
    assert findings == [
        (1, "create-index-not-concurrent", 3),
        (2, "drop-table", 4),
    ]


import os
import pytest


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/testdata/migrations"),
    reason="reference corpus not present",
)
def test_reference_corpus_end_to_end(spark):
    """Parity proof on the reference's OWN test corpus of record: scan its
    real migration files with our loader and assert the exact findings its
    analyzer produces (expected set fixed by the reference's rule tests,
    SURVEY.md §5)."""
    from database_migration_engine_spark.sources.migrations import load_from_dir

    migs = load_from_dir(spark, "/root/reference/testdata/migrations")
    rows = {r.version: r for r in migs.collect()}
    assert len(rows) == 12
    # orphan-less pairing: V008/V009/V012 have no down files
    assert rows["008"].down_sql is None
    assert rows["012"].down_sql is None
    assert rows["001"].down_sql is not None

    got = _findings_by_version_df(spark, migs, 14)
    assert got == EXPECTED_PG14


def _findings_by_version_df(spark, migs, pg_version):
    rows = analyze(migs, pg_version=pg_version).collect()
    out: dict[str, list[tuple[str, int]]] = {}
    for r in rows:
        out.setdefault(r.version, []).append((r.rule, r.severity))
    return out


def test_custom_rule_injection(spark):
    """The rule registry is pluggable (reference analyzer.New,
    internal/analyzer/rules.go:28-45): a user-defined rule joins the
    union like any built-in."""
    from pyspark.sql import functions as F

    from database_migration_engine_spark.analyzer.analyze import (
        extract_statements,
    )
    from database_migration_engine_spark.analyzer.rules import (
        DEFAULT_RULES,
        apply_rules,
        _finding,
    )

    def rule_no_truncate_ever(stmts, pg_version):
        hit = stmts.filter(F.col("stmt_type") == "truncate")
        return _finding(
            hit, "no-truncate-ever", F.lit(4), F.col("table"),
            F.lit("custom policy: TRUNCATE is banned"),
            F.lit("delete in batches"), "ACCESS EXCLUSIVE",
        )

    from database_migration_engine_spark import schemas

    mig = spark.createDataFrame(
        [("x", "t", "TRUNCATE audit_log;", None, "c", "p")],
        schema=schemas.MIGRATIONS,
    )
    stmts = extract_statements(mig)
    findings = apply_rules(
        stmts, rules=DEFAULT_RULES + [rule_no_truncate_ever]
    ).collect()
    rules_fired = sorted(r.rule for r in findings)
    assert rules_fired == ["drop-table", "no-truncate-ever"]
