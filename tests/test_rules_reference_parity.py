"""Per-rule parity sweep ported from the reference's rule test tables
(VERDICT r01 item 4): every (sql, pg_version) case from
reference internal/analyzer/rules/*_test.go and the statement-shape cases
from internal/parser/parser_test.go:13-147, asserted against this repo's
analyzer. Severity ints: MEDIUM=2, HIGH=3, CRITICAL=4.

All cases are analyzed in ONE analyze() call (a single DataFrame of
one-statement migrations keyed by case id) so the sweep costs one Spark
job, not ~50.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from database_migration_engine_spark.analyzer.analyze import (
    analyze,
    extract_statements,
)

# (case_id, sql, pg_version, [(rule, severity), ...])
CASES = [
    # --- add-column-volatile-default (alter_add_column_test.go) ------------
    ("ac1", "ALTER TABLE users ADD COLUMN status TEXT DEFAULT 'active';", 14, []),
    ("ac2", "ALTER TABLE users ADD COLUMN status TEXT DEFAULT 'active';", 10,
     [("add-column-volatile-default", 3)]),
    ("ac3", "ALTER TABLE users ADD COLUMN created_at TIMESTAMPTZ DEFAULT now();", 14,
     [("add-column-volatile-default", 3)]),
    ("ac4", "ALTER TABLE users ADD COLUMN created_at TIMESTAMPTZ DEFAULT now();", 10,
     [("add-column-volatile-default", 3)]),
    ("ac5", "ALTER TABLE users ADD COLUMN bio TEXT;", 14, []),
    ("ac6", "ALTER TABLE users ADD COLUMN count INT DEFAULT 0;", 14, []),
    ("ac7", "ALTER TABLE t ADD COLUMN id UUID DEFAULT gen_random_uuid();", 14,
     [("add-column-volatile-default", 3)]),
    ("ac8", "ALTER TABLE users ADD COLUMN active BOOLEAN DEFAULT true;", 11, []),
    ("ac9", "ALTER TABLE users ADD COLUMN active BOOLEAN DEFAULT true;", 10,
     [("add-column-volatile-default", 3)]),
    ("ac10", "CREATE TABLE users (id INT);", 14, []),
    # --- add-constraint-without-not-valid (alter_add_constraint_test.go) ---
    ("cn1", "ALTER TABLE users ADD CONSTRAINT chk_age CHECK (age > 0);", 14,
     [("add-constraint-without-not-valid", 3)]),
    ("cn2", "ALTER TABLE users ADD CONSTRAINT chk_age CHECK (age > 0) NOT VALID;", 14, []),
    ("cn3", "ALTER TABLE orders ADD CONSTRAINT fk_user FOREIGN KEY (user_id)"
            " REFERENCES users(id);", 14,
     [("add-constraint-without-not-valid", 3)]),
    ("cn4", "ALTER TABLE orders ADD CONSTRAINT fk_user FOREIGN KEY (user_id)"
            " REFERENCES users(id) NOT VALID;", 14, []),
    ("cn5", "ALTER TABLE users ADD CONSTRAINT uq_email UNIQUE (email);", 14, []),
    ("cn6", "ALTER TABLE t ADD CONSTRAINT pk PRIMARY KEY (id);", 14, []),
    # --- alter-column-type (alter_column_type_test.go) ---------------------
    ("ct1", "ALTER TABLE users ALTER COLUMN email TYPE VARCHAR(255);", 14,
     [("alter-column-type", 3)]),
    ("ct2", "ALTER TABLE t ALTER COLUMN id TYPE BIGINT;", 14,
     [("alter-column-type", 3)]),
    ("ct3", "ALTER TABLE t ALTER COLUMN data TYPE JSONB USING data::jsonb;", 14,
     [("alter-column-type", 3)]),
    ("ct4", "ALTER TABLE users ADD COLUMN bio TEXT;", 14, []),
    # --- set-not-null (alter_set_not_null_test.go) -------------------------
    ("nn1", "ALTER TABLE users ALTER COLUMN status SET NOT NULL;", 14,
     [("set-not-null", 2)]),
    ("nn2", "ALTER TABLE users ALTER COLUMN status SET NOT NULL;", 12,
     [("set-not-null", 2)]),
    ("nn3", "ALTER TABLE users ALTER COLUMN status SET NOT NULL;", 11,
     [("set-not-null", 3)]),
    ("nn4", "ALTER TABLE users ALTER COLUMN status SET NOT NULL;", 10,
     [("set-not-null", 3)]),
    # --- create-index-not-concurrent (create_index_test.go) ----------------
    ("ci1", "CREATE INDEX idx_users_email ON users (email);", 14,
     [("create-index-not-concurrent", 3)]),
    ("ci2", "CREATE INDEX CONCURRENTLY idx_users_email ON users (email);", 14, []),
    ("ci3", "CREATE UNIQUE INDEX idx_users_email ON users (email);", 14,
     [("create-index-not-concurrent", 3)]),
    ("ci4", "CREATE INDEX idx_active ON users (email) WHERE active = true;", 14,
     [("create-index-not-concurrent", 3)]),
    ("ci5", "CREATE INDEX idx ON myschema.users (email);", 14,
     [("create-index-not-concurrent", 3)]),
    # --- drop-table / truncate (drop_table_test.go) ------------------------
    ("dt1", "DROP TABLE users;", 14, [("drop-table", 4)]),
    ("dt2", "DROP TABLE IF EXISTS users;", 14, [("drop-table", 4)]),
    ("dt3", "TRUNCATE users;", 14, [("drop-table", 4)]),
    ("dt4", "DROP INDEX idx_users_email;", 14, []),
    ("dt5", "DROP VIEW user_view;", 14, []),
    # --- lock-table (lock_table_test.go) -----------------------------------
    ("lt1", "LOCK TABLE users IN ACCESS EXCLUSIVE MODE;", 14,
     [("lock-table", 3)]),
    ("lt2", "LOCK TABLE users IN SHARE MODE;", 14, [("lock-table", 3)]),
    ("lt3", "LOCK TABLE users IN ROW SHARE MODE;", 14, [("lock-table", 3)]),
    # --- rename (rename_test.go) -------------------------------------------
    ("rn1", "ALTER TABLE users RENAME COLUMN email TO email_address;", 14,
     [("rename", 2)]),
    ("rn2", "ALTER TABLE users RENAME TO customers;", 14, [("rename", 2)]),
    ("rn3", "ALTER INDEX idx_users RENAME TO idx_customers;", 14, []),
    # --- vacuum-full (vacuum_full_test.go) ---------------------------------
    ("vf1", "VACUUM FULL users;", 14, [("vacuum-full", 3)]),
    ("vf2", "VACUUM (FULL) users;", 14, [("vacuum-full", 3)]),
    ("vf3", "VACUUM users;", 14, []),
    ("vf4", "VACUUM ANALYZE users;", 14, []),
    # --- fuzz waves 12-16 (r09), rule-pipeline level ------------------------
    # boolean option VALUES: (FULL false) is a plain vacuum (wave 12)
    ("w12v", "VACUUM (FULL false) t;", 14, []),
    ("w12w", "VACUUM (ANALYZE, FULL) t;", 14, [("vacuum-full", 3)]),
    # identity's DEFAULT token is CONSTR_IDENTITY, not a default (wave 13)
    ("w13a", "ALTER TABLE t ADD COLUMN id bigint GENERATED BY DEFAULT"
             " AS IDENTITY;", 14, []),
    # typed-literal / bit-string constants are A_Const forms (wave 13)
    ("w13b", "ALTER TABLE t ADD COLUMN c interval DEFAULT INTERVAL '1 day';",
     14, []),
    ("w13c", "ALTER TABLE t ADD COLUMN c varbit DEFAULT B'1010';", 14, []),
    # doubled-quote identifier: rule fires, name unescaped (wave 13)
    ("w13d", 'ALTER TABLE "we""ird" ADD COLUMN c timestamptz DEFAULT now();',
     14, [("add-column-volatile-default", 3)]),
    # doNegate folds minus over numeric constants; :: binds tighter than
    # unary minus so -1::int is an A_Expr -> volatile (wave 15)
    ("w15a", "ALTER TABLE t ADD COLUMN c int DEFAULT - 1;", 14, []),
    ("w15b", "ALTER TABLE t ADD COLUMN c int DEFAULT -1::int;", 14,
     [("add-column-volatile-default", 3)]),
    # non-ASCII relation names reach the rules (wave 16)
    ("w16a", "ALTER TABLE überweisung ADD COLUMN c timestamptz"
             " DEFAULT now();", 14, [("add-column-volatile-default", 3)]),
]

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


def _df(spark, cases):
    return spark.createDataFrame(
        [
            {
                "version": cid,
                "name": cid,
                "up_sql": sql,
                "down_sql": None,
                "checksum": "0" * 64,
                "file_path": f"{cid}.up.sql",
            }
            for cid, sql, _, _ in cases
        ],
        MIG_SCHEMA,
    )


@pytest.mark.parametrize("pg_version", sorted({pgv for _, _, pgv, _ in CASES}))
def test_reference_rule_parity(spark, pg_version):
    batch = [c for c in CASES if c[2] == pg_version]
    rows = analyze(_df(spark, batch), pg_version=pg_version).collect()
    got: dict[str, list[tuple[str, int]]] = {cid: [] for cid, *_ in batch}
    for r in rows:
        got[r.version].append((r.rule, r.severity))
    for cid, sql, _, want in batch:
        assert sorted(got[cid]) == sorted(want), f"{cid}: {sql}\n got {got[cid]}, want {want}"


def test_multi_statement_split_counts(spark):
    """parser_test.go: 'multi-statement SQL returns correct count' /
    empty / whitespace-only → zero statements."""
    cases = [
        ("m3", "CREATE TABLE a (id INT); CREATE TABLE b (id INT);"
               " CREATE TABLE c (id INT);", 0, []),
        ("m0", "", 0, []),
        ("mw", "   \n\t  ", 0, []),
    ]
    stmts = extract_statements(_df(spark, cases)).collect()
    by_version: dict[str, int] = {}
    for r in stmts:
        by_version[r.version] = by_version.get(r.version, 0) + 1
    assert by_version.get("m3", 0) == 3
    assert by_version.get("m0", 0) == 0
    assert by_version.get("mw", 0) == 0


def test_statement_type_recognition(spark):
    """parser_test.go node-type checks, mapped to stmt_type features."""
    cases = [
        ("t1", "CREATE TABLE users (id SERIAL PRIMARY KEY, name TEXT NOT NULL);", 0, []),
        ("t2", "CREATE INDEX CONCURRENTLY idx_name ON users (email);", 0, []),
        ("t3", "ALTER TABLE users ADD COLUMN status TEXT;", 0, []),
        ("t4", "VACUUM FULL users;", 0, []),
        ("t5", "LOCK TABLE users IN ACCESS EXCLUSIVE MODE;", 0, []),
        ("t6", "DROP TABLE users;", 0, []),
        ("t7", "ALTER TABLE users RENAME COLUMN email TO email_address;", 0, []),
    ]
    stmts = {r.version: r for r in extract_statements(_df(spark, cases)).collect()}
    assert stmts["t1"].stmt_type == "create_table"
    assert stmts["t2"].stmt_type == "create_index"
    assert stmts["t2"].concurrent is True
    assert stmts["t3"].stmt_type == "alter_table"
    assert stmts["t4"].stmt_type == "vacuum"
    assert stmts["t5"].stmt_type == "lock"
    assert stmts["t6"].stmt_type == "drop_table"
    assert stmts["t7"].stmt_type in ("alter_table", "rename")
