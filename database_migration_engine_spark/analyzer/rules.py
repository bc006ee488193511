"""The 9 danger-detection rules as DataFrame expressions.

The reference dispatches each statement through an ordered rule registry
(reference internal/analyzer/rules/registry.go:6-19, analyzer.go:53-94);
each rule pattern-matches AST nodes and emits Findings. Here each rule is
a ``filter`` + ``select(struct)`` over the statement-features DataFrame —
a static fan-out of 9 small plans unioned with ``unionByName``, which
Catalyst collapses into a single pass over the (already tiny per-migration)
statement set. Version-aware behavior (R2 PG≥11, R5 PG≥12) takes
``pg_version`` as a plan-time parameter, mirroring RuleContext
(reference internal/analyzer/rules.go:20-25).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Severity scale (reference internal/analyzer/severity.go:6-35).
SAFE, LOW, MEDIUM, HIGH, CRITICAL = 0, 1, 2, 3, 4
SEVERITY_NAMES = {0: "SAFE", 1: "LOW", 2: "MEDIUM", 3: "HIGH", 4: "CRITICAL"}

MAX_STMT_DISPLAY_LEN = 120  # reference internal/analyzer/analyzer.go:10


def _severity_name(severity_col):
    return F.element_at(
        F.lit(list(SEVERITY_NAMES.values())), severity_col + 1
    )


def _truncate_sql(col):
    """Display truncation (reference internal/analyzer/result.go:30-35)."""
    return F.when(
        F.length(col) > MAX_STMT_DISPLAY_LEN,
        F.concat(F.substring(col, 1, MAX_STMT_DISPLAY_LEN - 3), F.lit("...")),
    ).otherwise(col)


def _finding(stmts: DataFrame, rule: str, severity_col, table_col, message_col,
             suggestion_col, lock_type: str) -> DataFrame:
    severity_col = severity_col.cast("int")
    return stmts.select(
        F.col("version"),
        F.lit(rule).alias("rule"),
        severity_col.alias("severity"),
        _severity_name(severity_col).alias("severity_name"),
        table_col.alias("table"),
        _truncate_sql(F.col("stmt_sql")).alias("statement"),
        message_col.alias("message"),
        suggestion_col.alias("suggestion"),
        F.lit(lock_type).alias("lock_type"),
        F.col("stmt_index"),
    )


def rule_create_index(stmts: DataFrame, pg_version: int) -> DataFrame:
    """R1 create-index-not-concurrent
    (reference internal/analyzer/rules/create_index.go:16-39)."""
    hit = stmts.filter(
        (F.col("stmt_type") == "create_index") & ~F.col("concurrent")
    )
    return _finding(
        hit,
        "create-index-not-concurrent",
        F.lit(HIGH),
        F.col("table"),
        F.concat(
            F.lit("CREATE INDEX on "),
            F.col("table"),
            F.lit(" without CONCURRENTLY holds a SHARE lock, blocking writes"
                  " for the duration of the build"),
        ),
        F.lit("Use CREATE INDEX CONCURRENTLY (outside a transaction)"),
        "SHARE",
    )


def rule_add_column_volatile_default(stmts: DataFrame, pg_version: int) -> DataFrame:
    """R2 add-column-volatile-default
    (reference internal/analyzer/rules/alter_add_column.go:18-134):
    per-command fan-out; on PG<11 any DEFAULT rewrites the table, on PG≥11
    only a volatile DEFAULT does."""
    cmds = stmts.filter(F.col("stmt_type") == "alter_table").select(
        "version", "stmt_index", "stmt_sql", "table",
        F.explode("commands").alias("cmd"),
    )
    dangerous = (
        (F.col("cmd.subtype") == "add_column")
        & F.col("cmd.has_default")
        & (F.lit(pg_version < 11) | F.col("cmd.default_volatile"))
    )
    message = (
        F.concat(
            F.lit("ADD COLUMN with a DEFAULT on "),
            F.col("table"),
            F.lit(
                " rewrites the entire table under an ACCESS EXCLUSIVE lock"
                " on PostgreSQL < 11"
                if pg_version < 11
                else " has a volatile DEFAULT, forcing a full table rewrite"
                " under an ACCESS EXCLUSIVE lock"
            ),
        )
    )
    return _finding(
        cmds.filter(dangerous),
        "add-column-volatile-default",
        F.lit(HIGH),
        F.col("table"),
        message,
        F.lit(
            "Add the column without DEFAULT, backfill in batches, then set"
            " the default"
        ),
        "ACCESS EXCLUSIVE",
    )


def rule_add_constraint(stmts: DataFrame, pg_version: int) -> DataFrame:
    """R3 add-constraint-without-not-valid: CHECK or FK only
    (reference internal/analyzer/rules/alter_add_constraint.go:16-75,
    other constraint types ignored :54-57)."""
    cmds = stmts.filter(F.col("stmt_type") == "alter_table").select(
        "version", "stmt_index", "stmt_sql", "table",
        F.explode("commands").alias("cmd"),
    )
    hit = cmds.filter(
        (F.col("cmd.subtype") == "add_constraint")
        & F.col("cmd.constraint_type").isin("check", "foreign")
        & ~F.col("cmd.skip_validation")
    )
    return _finding(
        hit,
        "add-constraint-without-not-valid",
        F.lit(HIGH),
        F.col("table"),
        F.concat(
            F.lit("ADD CONSTRAINT on "),
            F.col("table"),
            F.lit(" validates every existing row under an ACCESS EXCLUSIVE"
                  " lock"),
        ),
        F.lit("Add the constraint NOT VALID, then VALIDATE CONSTRAINT in a"
              " separate transaction"),
        "ACCESS EXCLUSIVE",
    )


def rule_alter_column_type(stmts: DataFrame, pg_version: int) -> DataFrame:
    """R4 alter-column-type
    (reference internal/analyzer/rules/alter_column_type.go:16-54)."""
    cmds = stmts.filter(F.col("stmt_type") == "alter_table").select(
        "version", "stmt_index", "stmt_sql", "table",
        F.explode("commands").alias("cmd"),
    )
    hit = cmds.filter(F.col("cmd.subtype") == "alter_column_type")
    return _finding(
        hit,
        "alter-column-type",
        F.lit(HIGH),
        F.col("table"),
        F.concat(
            F.lit("ALTER COLUMN TYPE on "),
            F.col("table"),
            F.lit(" typically rewrites the table and blocks reads and"
                  " writes"),
        ),
        F.lit("Create a new column, dual-write, backfill, then swap"),
        "ACCESS EXCLUSIVE",
    )


def rule_set_not_null(stmts: DataFrame, pg_version: int) -> DataFrame:
    """R5 set-not-null: HIGH, downgraded to MEDIUM on PG≥12 where a valid
    CHECK constraint lets the full scan be skipped
    (reference internal/analyzer/rules/alter_set_not_null.go:18-64,
    downgrade+suggestion swap :44-50)."""
    cmds = stmts.filter(F.col("stmt_type") == "alter_table").select(
        "version", "stmt_index", "stmt_sql", "table",
        F.explode("commands").alias("cmd"),
    )
    hit = cmds.filter(F.col("cmd.subtype") == "set_not_null")
    severity = MEDIUM if pg_version >= 12 else HIGH
    suggestion = (
        "Add a CHECK (col IS NOT NULL) NOT VALID constraint, validate it,"
        " then SET NOT NULL (skips the full scan on PG>=12)"
        if pg_version >= 12
        else "SET NOT NULL scans the whole table; schedule it in a low-traffic"
        " window"
    )
    return _finding(
        hit,
        "set-not-null",
        F.lit(severity),
        F.col("table"),
        F.concat(
            F.lit("SET NOT NULL on "),
            F.col("table"),
            F.lit(" requires a full-table scan under an ACCESS EXCLUSIVE"
                  " lock"),
        ),
        F.lit(suggestion),
        "ACCESS EXCLUSIVE",
    )


def rule_drop_table(stmts: DataFrame, pg_version: int) -> DataFrame:
    """R6 drop-table: DROP TABLE (message varies with IF EXISTS) and
    TRUNCATE; multi-table names joined with ", "
    (reference internal/analyzer/rules/drop_table.go:16-105)."""
    hit = stmts.filter(F.col("stmt_type").isin("drop_table", "truncate"))
    names = F.concat_ws(", ", F.col("tables"))
    message = (
        F.when(
            F.col("stmt_type") == "truncate",
            F.concat(F.lit("TRUNCATE "), names,
                     F.lit(" irreversibly deletes all rows")),
        )
        .when(
            F.col("if_exists"),
            F.concat(F.lit("DROP TABLE IF EXISTS "), names,
                     F.lit(" destroys the table and its data if present")),
        )
        .otherwise(
            F.concat(F.lit("DROP TABLE "), names,
                     F.lit(" irreversibly destroys the table and its data")),
        )
    )
    return _finding(
        hit,
        "drop-table",
        F.lit(CRITICAL),
        names,
        message,
        F.lit("Take a verified backup first; consider a soft-delete or"
              " rename instead"),
        "ACCESS EXCLUSIVE",
    )


def rule_vacuum_full(stmts: DataFrame, pg_version: int) -> DataFrame:
    """R7 vacuum-full (reference internal/analyzer/rules/vacuum_full.go:16-71;
    '<all tables>' when no table given :58-71)."""
    hit = stmts.filter((F.col("stmt_type") == "vacuum") & F.col("vacuum_full"))
    table = F.coalesce(F.col("table"), F.lit("<all tables>"))
    return _finding(
        hit,
        "vacuum-full",
        F.lit(HIGH),
        table,
        F.concat(
            F.lit("VACUUM FULL on "), table,
            F.lit(" rewrites the relation under an ACCESS EXCLUSIVE lock"),
        ),
        F.lit("Use plain VACUUM, or pg_repack for online compaction"),
        "ACCESS EXCLUSIVE",
    )


def rule_lock_table(stmts: DataFrame, pg_version: int) -> DataFrame:
    """R8 lock-table: one finding per relation
    (reference internal/analyzer/rules/lock_table.go:16-50, explode :32-47)."""
    hit = (
        stmts.filter(F.col("stmt_type") == "lock")
        .select(
            "version", "stmt_index", "stmt_sql",
            F.explode("tables").alias("locked_table"),
        )
    )
    return _finding(
        hit,
        "lock-table",
        F.lit(HIGH),
        F.col("locked_table"),
        F.concat(
            F.lit("explicit LOCK TABLE on "),
            F.col("locked_table"),
            F.lit(" blocks concurrent access until the transaction ends"),
        ),
        F.lit("Rely on the weakest lock the operation needs; avoid explicit"
              " LOCK in migrations"),
        "EXPLICIT",
    )


def rule_rename(stmts: DataFrame, pg_version: int) -> DataFrame:
    """R9 rename: table or column renames only (index/constraint renames are
    safe, reference internal/analyzer/rules/rename.go:16-55, :54)."""
    hit = stmts.filter(
        (F.col("stmt_type") == "rename")
        & F.col("rename_object").isin("table", "column")
    )
    return _finding(
        hit,
        "rename",
        F.lit(MEDIUM),
        F.col("table"),
        F.concat(
            F.lit("RENAME "), F.col("rename_object"), F.lit(" on "),
            F.col("table"),
            F.lit(" breaks application code still using the old name"),
        ),
        F.lit("Deploy code reading both names first; use a view alias during"
              " the transition"),
        "ACCESS EXCLUSIVE",
    )


# Ordered registry (reference internal/analyzer/rules/registry.go:6-19).
DEFAULT_RULES = [
    rule_create_index,
    rule_add_column_volatile_default,
    rule_add_constraint,
    rule_alter_column_type,
    rule_set_not_null,
    rule_drop_table,
    rule_vacuum_full,
    rule_lock_table,
    rule_rename,
]


def apply_rules(
    stmts: DataFrame, pg_version: int = 14, rules: list | None = None
) -> DataFrame:
    """Run every registered rule over the statements DataFrame; union of
    static sub-plans (the Spark form of the dispatcher loop,
    reference internal/analyzer/analyzer.go:53-94). The registry is
    injectable like the reference's (analyzer.New takes a rule list,
    internal/analyzer/rules.go:28-45): a custom rule is any callable
    ``(stmts_df, pg_version) -> findings_df`` with the FINDINGS columns."""
    findings = [rule(stmts, pg_version) for rule in (rules or DEFAULT_RULES)]
    return reduce(lambda a, b: a.unionByName(b), findings)
