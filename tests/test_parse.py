"""Table-driven parser tests, modeled on the reference's per-rule test
files (reference internal/parser/parser_test.go,
internal/analyzer/rules/*_test.go — SURVEY.md §5)."""

from __future__ import annotations

import pytest

from database_migration_engine_spark.analyzer import parse as P


class TestSplitStatements:
    def test_simple_split(self):
        stmts = P.split_statements("SELECT 1; SELECT 2;")
        assert [s for _, s in stmts] == ["SELECT 1", "SELECT 2"]

    def test_empty_and_whitespace(self):
        assert P.split_statements("") == []
        assert P.split_statements("   \n\t ") == []
        assert P.split_statements(";;;") == []

    def test_semicolon_in_string(self):
        stmts = P.split_statements("INSERT INTO t VALUES ('a;b'); SELECT 1")
        assert len(stmts) == 2
        assert stmts[0][1] == "INSERT INTO t VALUES ('a;b')"

    def test_escaped_quote(self):
        stmts = P.split_statements("SELECT 'it''s; fine'; SELECT 2")
        assert len(stmts) == 2

    def test_dollar_quoting(self):
        sql = "CREATE FUNCTION f() RETURNS int AS $$ SELECT 1; $$ LANGUAGE sql; SELECT 2"
        stmts = P.split_statements(sql)
        assert len(stmts) == 2

    def test_tagged_dollar_quoting(self):
        sql = "DO $body$ BEGIN; END $body$; SELECT 1"
        assert len(P.split_statements(sql)) == 2

    def test_line_comment_with_semicolon(self):
        stmts = P.split_statements("SELECT 1 -- no; split\n; SELECT 2")
        assert len(stmts) == 2

    def test_nested_block_comment(self):
        # semicolons inside nested comments don't split; the comment bytes
        # stay in the statement span (offset slicing, like the reference's
        # ExtractStmtSQL) and are stripped at classification time
        sql = "/* outer /* inner; */ still; */ CREATE INDEX i ON t(c)"
        stmts = P.split_statements(sql)
        assert len(stmts) == 1
        assert P.classify_statement(0, stmts[0][1]).stmt_type == "create_index"

    def test_offsets_slice_original(self):
        sql = "SELECT 1;\n  SELECT 2;"
        stmts = P.split_statements(sql)
        assert stmts[1][1] == "SELECT 2"
        assert sql[stmts[1][0]:].lstrip().startswith("SELECT 2")


class TestClassify:
    def c(self, sql):
        return P.classify_statement(0, sql)

    def test_create_index(self):
        f = self.c("CREATE INDEX idx ON users (email)")
        assert (f.stmt_type, f.table, f.concurrent) == ("create_index", "users", False)

    def test_create_index_concurrently(self):
        f = self.c("CREATE UNIQUE INDEX CONCURRENTLY IF NOT EXISTS i ON s.t (c)")
        assert (f.stmt_type, f.table, f.concurrent) == ("create_index", "s.t", True)

    def test_create_index_quoted_table(self):
        f = self.c('CREATE INDEX i ON "Users" (email)')
        assert f.table == "Users"

    def test_drop_table_multi(self):
        f = self.c("DROP TABLE a, b.c CASCADE")
        assert (f.stmt_type, f.tables, f.if_exists) == ("drop_table", ["a", "b.c"], False)

    def test_drop_table_if_exists(self):
        f = self.c("DROP TABLE IF EXISTS users")
        assert f.if_exists is True

    def test_drop_index_not_drop_table(self):
        f = self.c("DROP INDEX CONCURRENTLY idx")
        assert (f.stmt_type, f.concurrent) == ("drop_index", True)

    def test_truncate(self):
        f = self.c("TRUNCATE TABLE a, b RESTART IDENTITY CASCADE")
        assert (f.stmt_type, f.tables) == ("truncate", ["a", "b"])

    def test_vacuum_full_keyword(self):
        f = self.c("VACUUM FULL users")
        assert (f.stmt_type, f.vacuum_full, f.table) == ("vacuum", True, "users")

    def test_vacuum_full_options(self):
        assert self.c("VACUUM (FULL) users").vacuum_full is True
        assert self.c("VACUUM (FULL true) users").vacuum_full is True
        assert self.c("VACUUM (FULL false) users").vacuum_full is False
        assert self.c("VACUUM (ANALYZE, FULL) users").vacuum_full is True

    def test_vacuum_plain(self):
        f = self.c("VACUUM users")
        assert (f.vacuum_full, f.table) == (False, "users")

    def test_vacuum_all_tables(self):
        f = self.c("VACUUM FULL")
        assert (f.vacuum_full, f.table) == (True, None)

    def test_lock_table_multi(self):
        f = self.c("LOCK TABLE a, b IN ACCESS EXCLUSIVE MODE")
        assert (f.stmt_type, f.tables) == ("lock", ["a", "b"])

    def test_lock_bare(self):
        f = self.c("LOCK users")
        assert (f.stmt_type, f.tables) == ("lock", ["users"])

    def test_rename_table(self):
        f = self.c("ALTER TABLE users RENAME TO members")
        assert (f.stmt_type, f.rename_object, f.table) == ("rename", "table", "users")

    def test_rename_column(self):
        f = self.c("ALTER TABLE users RENAME COLUMN email TO mail")
        assert (f.stmt_type, f.rename_object) == ("rename", "column")

    def test_rename_column_bare(self):
        f = self.c("ALTER TABLE users RENAME email TO mail")
        assert f.rename_object == "column"

    def test_rename_constraint_safe(self):
        f = self.c("ALTER TABLE users RENAME CONSTRAINT a TO b")
        assert f.rename_object == "constraint"

    def test_alter_index_rename_safe(self):
        f = self.c("ALTER INDEX idx RENAME TO idx2")
        assert (f.stmt_type, f.rename_object) == ("rename", "index")

    def test_add_column_no_default(self):
        f = self.c("ALTER TABLE t ADD COLUMN bio TEXT")
        [cmd] = f.commands
        assert (cmd.subtype, cmd.has_default) == ("add_column", False)

    def test_add_column_constant_default(self):
        f = self.c("ALTER TABLE t ADD COLUMN s TEXT DEFAULT 'active'")
        [cmd] = f.commands
        assert (cmd.has_default, cmd.default_volatile) == (True, False)

    def test_add_column_volatile_default(self):
        f = self.c("ALTER TABLE t ADD COLUMN ts timestamptz DEFAULT now()")
        [cmd] = f.commands
        assert (cmd.has_default, cmd.default_volatile) == (True, True)

    def test_add_column_cast_constant_default(self):
        f = self.c("ALTER TABLE t ADD c jsonb DEFAULT '{}'::jsonb")
        [cmd] = f.commands
        assert cmd.default_volatile is False
        f2 = self.c("ALTER TABLE t ADD c int DEFAULT CAST(0 AS int)")
        assert f2.commands[0].default_volatile is False

    def test_add_column_default_then_not_null(self):
        f = self.c("ALTER TABLE t ADD c int DEFAULT 0 NOT NULL")
        [cmd] = f.commands
        assert (cmd.has_default, cmd.default_volatile) == (True, False)

    def test_add_constraint_check(self):
        f = self.c("ALTER TABLE t ADD CONSTRAINT c CHECK (x > 0)")
        [cmd] = f.commands
        assert (cmd.subtype, cmd.constraint_type, cmd.skip_validation) == (
            "add_constraint", "check", False)

    def test_add_constraint_not_valid(self):
        f = self.c("ALTER TABLE t ADD CONSTRAINT c CHECK (x > 0) NOT VALID")
        assert f.commands[0].skip_validation is True

    def test_add_constraint_fk(self):
        f = self.c("ALTER TABLE t ADD CONSTRAINT fk FOREIGN KEY (a) REFERENCES u(id)")
        assert f.commands[0].constraint_type == "foreign"

    def test_add_constraint_unique_ignored_type(self):
        f = self.c("ALTER TABLE t ADD CONSTRAINT u UNIQUE (a)")
        assert f.commands[0].constraint_type == "unique"

    def test_alter_column_type(self):
        f = self.c("ALTER TABLE t ALTER COLUMN c TYPE varchar(255)")
        assert f.commands[0].subtype == "alter_column_type"

    def test_alter_column_set_data_type(self):
        f = self.c("ALTER TABLE t ALTER c SET DATA TYPE text")
        assert f.commands[0].subtype == "alter_column_type"

    def test_set_not_null(self):
        f = self.c("ALTER TABLE t ALTER COLUMN c SET NOT NULL")
        assert f.commands[0].subtype == "set_not_null"

    def test_multi_command_alter(self):
        f = self.c(
            "ALTER TABLE t ADD COLUMN a int DEFAULT now_ish(), "
            "ALTER COLUMN b TYPE text, ALTER c SET NOT NULL"
        )
        assert [c.subtype for c in f.commands] == [
            "add_column", "alter_column_type", "set_not_null"]

    def test_unknown_statement(self):
        f = self.c("COMMENT ON TABLE t IS 'hi'")
        assert f.stmt_type == "other"


class TestVolatility:
    """Reference under-approximation preserved: any function call is
    volatile (internal/analyzer/rules/alter_add_column.go:112-134)."""

    @pytest.mark.parametrize("expr,volatile", [
        ("'active'", False),
        ("42", False),
        ("-1.5", False),
        ("TRUE", False),
        ("NULL", False),
        ("'{}'::jsonb", False),
        ("CAST('x' AS text)", False),
        ("now()", True),
        ("CURRENT_TIMESTAMP", True),
        ("uuid_generate_v4()", True),
        ("1 + 1", True),  # expression, conservatively volatile
    ])
    def test_volatility(self, expr, volatile):
        assert P.is_volatile_default(expr) is volatile


class TestConcurrentRouting:
    def test_fast_path_no_concurrently(self):
        assert P.contains_concurrent_op("CREATE INDEX i ON t(c)") is False

    def test_create_index_concurrently(self):
        assert P.contains_concurrent_op("CREATE INDEX CONCURRENTLY i ON t(c)")

    def test_drop_index_concurrently(self):
        assert P.contains_concurrent_op("DROP INDEX CONCURRENTLY i")

    def test_concurrently_in_string_not_concurrent(self):
        assert (
            P.contains_concurrent_op("INSERT INTO t VALUES ('CONCURRENTLY')")
            is False
        )


class TestCorpus:
    """Every corpus migration parses to the expected feature shape
    (expected findings fixed by FIXTURES.md §1)."""

    def test_corpus_parses(self):
        from database_migration_engine_spark.fixtures import MIGRATION_ROWS

        for version, _name, up_sql, *_ in MIGRATION_ROWS:
            feats = P.parse_sql(up_sql)
            assert len(feats) == 1, f"V{version}: expected single statement"


def test_splitter_pg_string_and_comment_corners():
    """r05 fuzz round 4 probes, frozen as regressions: PG-semantics
    corners that a naive splitter gets wrong — standard_conforming
    strings (backslash is LITERAL in '...'), E-string escapes, nested
    block comments, quoted identifiers holding semicolons, $ inside an
    identifier not opening a dollar quote, and -- at EOF."""
    from database_migration_engine_spark.analyzer.parse import (
        split_statements,
    )

    def texts(sql):
        return [t for _, t in split_statements(sql)]

    # backslash literal in standard strings: '\' is a COMPLETE string
    assert texts(r"SELECT '\'; DROP TABLE t; SELECT 'x'") == [
        "SELECT '\\'", "DROP TABLE t", "SELECT 'x'",
    ]
    # E-string: backslash DOES escape the quote
    assert texts(r"INSERT INTO t VALUES (E'a\';b'); DROP TABLE t;") == [
        "INSERT INTO t VALUES (E'a\\';b')", "DROP TABLE t",
    ]
    # doubled quote inside standard string
    assert texts("INSERT INTO t VALUES ('a''b;c'); DROP TABLE t;") == [
        "INSERT INTO t VALUES ('a''b;c')", "DROP TABLE t",
    ]
    # quoted identifier with semicolon
    assert texts('CREATE TABLE "a;b" (x int); DROP TABLE t;') == [
        'CREATE TABLE "a;b" (x int)', "DROP TABLE t",
    ]
    # nested block comment hides BOTH semicolons
    assert texts(
        "CREATE TABLE t (x int) /* o /* i ; */ still ; */; DROP TABLE u;"
    ) == [
        "CREATE TABLE t (x int) /* o /* i ; */ still ; */", "DROP TABLE u",
    ]
    # line comment hides the semicolon; EOF without newline is fine
    assert texts("CREATE TABLE t (x int) -- ; not a split\n; DROP TABLE u;") \
        == ["CREATE TABLE t (x int) -- ; not a split", "DROP TABLE u"]
    assert texts("CREATE TABLE t (x int) -- eof") == [
        "CREATE TABLE t (x int) -- eof",
    ]
    # $ inside an identifier does not open a dollar quote
    assert texts("CREATE TABLE a$b (x int); DROP TABLE c;") == [
        "CREATE TABLE a$b (x int)", "DROP TABLE c",
    ]
