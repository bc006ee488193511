"""Property-based parser tests (hypothesis): the splitter/classifier must
never crash, never invent statements, and round-trip offsets on arbitrary
input — the robustness the reference gets from the battle-tested libpg
parser has to be earned here."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from database_migration_engine_spark.analyzer import parse as P

sql_fragment = st.text(
    alphabet=st.characters(
        codec="ascii", exclude_categories=("Cs",), min_codepoint=9
    ),
    max_size=200,
)

ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True)


@given(sql_fragment)
@settings(max_examples=300, deadline=None)
def test_split_never_crashes_and_offsets_valid(sql):
    stmts = P.split_statements(sql)
    for offset, text in stmts:
        assert 0 <= offset < max(len(sql), 1)
        assert text.strip() == text
        assert text  # no empty statements emitted
        # the statement text is recoverable from the original by offset
        assert sql[offset:].strip().startswith(text[: len(text)])


@given(sql_fragment)
@settings(max_examples=300, deadline=None)
def test_classify_never_crashes(sql):
    for idx, (_off, text) in enumerate(P.split_statements(sql)):
        feats = P.classify_statement(idx, text)
        assert feats.stmt_type is not None
        d = feats.as_dict()
        assert set(d) == {
            "stmt_index", "stmt_sql", "stmt_type", "table", "tables",
            "concurrent", "vacuum_full", "if_exists", "rename_object",
            "commands",
        }


@given(st.lists(ident, min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
def test_drop_table_names_roundtrip(names):
    sql = "DROP TABLE " + ", ".join(names)
    feats = P.classify_statement(0, sql)
    assert feats.stmt_type == "drop_table"
    assert feats.tables == [n.lower() for n in names]


@given(ident, ident, st.booleans())
@settings(max_examples=100, deadline=None)
def test_create_index_concurrent_flag(table, index, concurrent):
    kw = "CONCURRENTLY " if concurrent else ""
    sql = f"CREATE INDEX {kw}{index} ON {table} (c)"
    feats = P.classify_statement(0, sql)
    assert feats.stmt_type == "create_index"
    assert feats.concurrent is concurrent
    assert feats.table == table.lower()


@given(st.lists(sql_fragment, min_size=1, max_size=4))
@settings(max_examples=100, deadline=None)
def test_statement_count_bounded_by_semicolons(fragments):
    # joining N fragments with ';' can yield at most N statements
    sql = ";".join(f.replace(";", " ") for f in fragments)
    assert len(P.split_statements(sql)) <= len(fragments)
