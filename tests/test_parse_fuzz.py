"""Grammar-driven parser fuzz (r03, VERDICT item 6): statements are
GENERATED from the recognizer's own grammar productions with their
expected feature vectors known by construction, then pushed through
split → strip-comments → classify. Unlike the parity tables
(tests/test_rules_reference_parity.py) and the crash-only property
sweep (tests/test_parse_properties.py), every example here asserts the
full classification, and the token stream is interleaved with the
hostile surface the parity tables never reach: block/line comments at
arbitrary token boundaries, quoted identifiers containing commas, dots,
semicolons and comment markers, multi-command ALTERs, and
scientific-notation defaults.

Recognizer fixes this suite forced (all in analyzer/parse.py):

* ``_split_top_level`` was blind to double-quoted identifiers — a comma
  inside ``"a,b"`` split one ALTER command (or DROP TABLE name list)
  into two;
* ``_strip_comments`` treated ``--``/``/*`` inside double-quoted
  identifiers or dollar-quoted bodies as comments and collapsed
  whitespace inside quotes;
* ``normalize_name`` split on dots inside quotes (``"a.b"`` is ONE
  identifier);
* the volatility const-regex rejected scientific/leading-dot numeric
  literals (``1e5``, ``.5``) that the real parser folds as A_Const.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from database_migration_engine_spark.analyzer import parse as P

# --- building blocks --------------------------------------------------------

_WS = st.sampled_from([" ", "  ", "\n", " \t ", "\n  "])

_block_comment = st.builds(
    lambda s: "/*" + s + "*/",
    st.text(alphabet=" aZ9_.,;'\"$-", max_size=12).filter(
        lambda t: "*/" not in t and "/*" not in t
    ),
)
_line_comment = st.builds(
    lambda s: "--" + s + "\n",
    st.text(alphabet=" aZ9_.,;'\"$*", max_size=12),
)
# token separator: whitespace, possibly wrapping a comment
_SEP = st.one_of(
    _WS,
    st.builds(lambda a, c, b: a + c + b, _WS, _block_comment, _WS),
    st.builds(lambda a, c: a + c, _WS, _line_comment),
)

_unquoted = st.from_regex(r"t_[a-z][a-z0-9_]{0,8}", fullmatch=True)
# quoted identifier: commas, dots, semicolons, comment markers, spaces —
# all CONTENT inside the quotes (no embedded double quotes)
_quoted_inner = st.text(
    alphabet="abXY19 _-.,;$*/", min_size=1, max_size=12
).map(lambda s: s.strip() or "q")


@st.composite
def ident_pair(draw):
    """(raw_sql_form, expected_normalized_name)"""
    if draw(st.booleans()):
        name = draw(_unquoted)
        return name, name.lower()
    inner = draw(_quoted_inner)
    return f'"{inner}"', inner


def _join(draw, tokens: list[str]) -> str:
    parts = [tokens[0]]
    for tok in tokens[1:]:
        parts.append(draw(_SEP))
        parts.append(tok)
    return "".join(parts)


# --- per-production generators: (sql, expected-feature-subset) --------------


@st.composite
def create_index_stmt(draw):
    raw, norm = draw(ident_pair())
    conc = draw(st.booleans())
    toks = ["CREATE"]
    if draw(st.booleans()):
        toks.append("UNIQUE")
    toks.append("INDEX")
    if conc:
        toks.append("CONCURRENTLY")
    if draw(st.booleans()):
        iraw, _ = draw(ident_pair())
        toks.append(iraw)
    toks += ["ON"]
    if draw(st.booleans()):
        toks.append("ONLY")
    toks += [raw, "(c)"]
    return _join(draw, toks), {
        "stmt_type": "create_index", "concurrent": conc, "table": norm,
    }


@st.composite
def drop_table_stmt(draw):
    pairs = draw(st.lists(ident_pair(), min_size=1, max_size=4))
    ifex = draw(st.booleans())
    toks = ["DROP", "TABLE"]
    if ifex:
        toks += ["IF", "EXISTS"]
    toks.append(", ".join(r for r, _ in pairs))
    if draw(st.booleans()):
        toks.append(draw(st.sampled_from(["CASCADE", "RESTRICT"])))
    return _join(draw, toks), {
        "stmt_type": "drop_table",
        "tables": [n for _, n in pairs],
        "if_exists": ifex,
    }


@st.composite
def truncate_stmt(draw):
    pairs = draw(st.lists(ident_pair(), min_size=1, max_size=3))
    toks = ["TRUNCATE"]
    if draw(st.booleans()):
        toks.append("TABLE")
    toks.append(", ".join(r for r, _ in pairs))
    if draw(st.booleans()):
        toks.append(draw(st.sampled_from(
            ["RESTART IDENTITY", "CONTINUE IDENTITY", "CASCADE"]
        )))
    return _join(draw, toks), {
        "stmt_type": "truncate", "tables": [n for _, n in pairs],
    }


@st.composite
def lock_stmt(draw):
    pairs = draw(st.lists(ident_pair(), min_size=1, max_size=3))
    toks = ["LOCK"]
    if draw(st.booleans()):
        toks.append("TABLE")
    toks.append(", ".join(r for r, _ in pairs))
    if draw(st.booleans()):
        toks += ["IN", "ACCESS", "EXCLUSIVE", "MODE"]
    if draw(st.booleans()):
        toks.append("NOWAIT")
    return _join(draw, toks), {
        "stmt_type": "lock", "tables": [n for _, n in pairs],
    }


@st.composite
def vacuum_stmt(draw):
    raw, norm = draw(ident_pair())
    form = draw(st.sampled_from([
        ("VACUUM", False, False),
        ("VACUUM FULL", True, False),
        ("VACUUM FULL VERBOSE", True, False),
        ("VACUUM ANALYZE", False, False),
        ("VACUUM (FULL)", True, True),
        ("VACUUM (FULL TRUE)", True, True),
        ("VACUUM (FULL FALSE)", False, True),
        ("VACUUM (FULL OFF)", False, True),
        ("VACUUM (ANALYZE, FULL)", True, True),
        ("VACUUM (VERBOSE)", False, True),
    ]))
    head, full, _parens = form
    with_table = draw(st.booleans())
    # table names are only generated unquoted here: the recognizer reads
    # the trailing name with a plain _QNAME match
    sql = head + (" " + raw if with_table and not raw.startswith('"') else "")
    expected = {"stmt_type": "vacuum", "vacuum_full": full}
    if with_table and not raw.startswith('"'):
        expected["table"] = norm
    return sql, expected


_CONST_DEFAULTS = [
    "42", "-7", "3.14", "1e6", "2.5e-3", ".5", "'txt'", "'it''s'",
    "TRUE", "NULL", "'x'::text", "CAST(5 AS int)", "'{}'::jsonb",
    # PostgreSQL 16 literal forms (fuzz round 6 wave 4): underscore
    # digit separators and hex/octal/binary integers are A_Const to the
    # real grammar
    "1_000_000", "0x1F", "0o17", "0b101", "-0xff", "1_0.5e1_0",
    # wave 13: typed literals (ConstTypename Sconst → TypeCast(A_Const))
    # and bit-string/Unicode-escape constants (BCONST/XCONST/Sconst)
    "INTERVAL '1 day'", "TIMESTAMP '2020-01-01'", "B'1010'", "X'FF'",
    # wave 15: doNegate folds spaced/nested unary minus over numerics
    "- 1", "-(-1)", "- .5",
    # wave 17: newline continuation resumes the same literal
    "'long'\n'text'", "'a'\n'b'::text",
]
_VOLATILE_DEFAULTS = [
    "now()", "random()", "uuid_generate_v4()", "nextval('s')",
    "random() * 10", "lower('A')",
    # wave 13/15: ArrayExpr, SQLValueFunction, NullIf, and minus-over-
    # TypeCast (:: binds tighter than unary minus) are all A_Expr-class
    # nodes the reference classifies volatile
    "ARRAY[1, 2, 3]", "CURRENT_TIMESTAMP", "nullif(1, 2)", "-1::int",
    "INTERVAL '1 day'::interval",
]


@st.composite
def alter_command(draw):
    """(command_sql, expected AlterCommand subset)"""
    kind = draw(st.sampled_from(
        ["add_col_plain", "add_col_default", "add_col_identity",
         "add_constraint", "alter_type", "set_not_null", "drop_column"]
    ))
    raw, norm = draw(ident_pair())
    if kind == "add_col_plain":
        return f"ADD COLUMN {raw} integer", {
            "subtype": "add_column", "column": norm, "has_default": False,
        }
    if kind == "add_col_identity":
        # the identity clause's DEFAULT token is CONSTR_IDENTITY, not a
        # DEFAULT constraint — never a volatile-default finding (wave 13)
        gen = draw(st.sampled_from(["ALWAYS", "BY DEFAULT"]))
        return f"ADD COLUMN {raw} bigint GENERATED {gen} AS IDENTITY", {
            "subtype": "add_column", "column": norm,
            "has_default": False, "default_volatile": False,
        }
    if kind == "add_col_default":
        volatile = draw(st.booleans())
        expr = draw(st.sampled_from(
            _VOLATILE_DEFAULTS if volatile else _CONST_DEFAULTS
        ))
        tail = draw(st.sampled_from(["", " NOT NULL"]))
        return f"ADD COLUMN {raw} text DEFAULT {expr}{tail}", {
            "subtype": "add_column", "column": norm,
            "has_default": True, "default_volatile": volatile,
        }
    if kind == "add_constraint":
        not_valid = draw(st.booleans())
        ctype, body = draw(st.sampled_from([
            ("check", "CHECK (x > 0)"),
            ("foreign", f"FOREIGN KEY (x) REFERENCES {draw(_unquoted)} (id)"),
            ("unique", "UNIQUE (x)"),
        ]))
        sql = f"ADD CONSTRAINT {raw} {body}" + (
            " NOT VALID" if not_valid else ""
        )
        return sql, {
            "subtype": "add_constraint", "constraint_type": ctype,
            "skip_validation": not_valid,
        }
    if kind == "alter_type":
        return f"ALTER COLUMN {raw} TYPE bigint", {
            "subtype": "alter_column_type", "column": norm,
        }
    if kind == "set_not_null":
        return f"ALTER COLUMN {raw} SET NOT NULL", {
            "subtype": "set_not_null", "column": norm,
        }
    return f"DROP COLUMN {raw}", {"subtype": "drop_column", "column": norm}


@st.composite
def alter_table_stmt(draw):
    traw, tnorm = draw(ident_pair())
    cmds = draw(st.lists(alter_command(), min_size=1, max_size=4))
    sql = _join(draw, ["ALTER", "TABLE", traw]) + " " + ", ".join(
        c for c, _ in cmds
    )
    return sql, {
        "stmt_type": "alter_table", "table": tnorm,
        "commands": [e for _, e in cmds],
    }


@st.composite
def rename_stmt(draw):
    traw, tnorm = draw(ident_pair())
    obj = draw(st.sampled_from(["table", "column", "constraint"]))
    new_raw, _ = draw(ident_pair())
    if obj == "table":
        toks = ["ALTER", "TABLE", traw, "RENAME", "TO", new_raw]
    elif obj == "column":
        craw, _ = draw(ident_pair())
        toks = ["ALTER", "TABLE", traw, "RENAME", "COLUMN", craw, "TO", new_raw]
    else:
        craw, _ = draw(ident_pair())
        toks = ["ALTER", "TABLE", traw, "RENAME", "CONSTRAINT", craw,
                "TO", new_raw]
    return _join(draw, toks), {
        "stmt_type": "rename", "table": tnorm, "rename_object": obj,
    }


# --- round-2 productions (r04 verdict item 8): routines, DO, COPY ----------

# rule-trigger DDL that must NOT fire when it only appears inside a
# dollar-quoted routine body / DO block / COPY payload
_TRIGGER_DDL = st.sampled_from([
    "DROP TABLE users;",
    "CREATE INDEX i ON t (c);",
    "VACUUM FULL;",
    "ALTER TABLE t ADD COLUMN c text DEFAULT now();",
    "TRUNCATE a, b;",
    "LOCK TABLE t IN ACCESS EXCLUSIVE MODE;",
    "ALTER TABLE t ALTER COLUMN c TYPE bigint;",
])

_DOLLAR_TAG = st.sampled_from(["$$", "$fn$", "$body$", "$x9_$"])


@st.composite
def create_function_stmt(draw):
    """CREATE FUNCTION/PROCEDURE with a dollar-quoted body full of
    rule-trigger DDL and semicolons: ONE statement, classified 'other',
    nothing inside the body may leak into the feature vector."""
    kind = draw(st.sampled_from(["FUNCTION", "PROCEDURE"]))
    tag = draw(_DOLLAR_TAG)
    body_stmts = draw(st.lists(_TRIGGER_DDL, min_size=1, max_size=3))
    body = " BEGIN " + " ".join(body_stmts) + " END; "
    fname, _ = draw(ident_pair())
    ret = " RETURNS void" if kind == "FUNCTION" else ""
    lang = draw(st.sampled_from(["plpgsql", "sql"]))
    sql = (
        f"CREATE {kind} {fname}(){ret} LANGUAGE {lang} AS "
        f"{tag}{body}{tag}"
    )
    return sql, {"stmt_type": "other", "table": None, "tables": []}


@st.composite
def do_block_stmt(draw):
    tag = draw(_DOLLAR_TAG)
    body_stmts = draw(st.lists(_TRIGGER_DDL, min_size=1, max_size=3))
    sql = f"DO {tag} BEGIN {' '.join(body_stmts)} END {tag}"
    return sql, {"stmt_type": "other", "table": None, "tables": []}


@st.composite
def copy_from_file_stmt(draw):
    """COPY from a file/program — no inline payload follows."""
    raw, norm = draw(ident_pair())
    src = draw(st.sampled_from(["'/tmp/data.csv'", "PROGRAM 'gen'"]))
    sql = f"COPY {raw} (a, b) FROM {src} WITH (FORMAT csv)"
    return sql, {"stmt_type": "copy", "table": norm}


_ANY_STMT = st.one_of(
    create_index_stmt(), drop_table_stmt(), truncate_stmt(), lock_stmt(),
    vacuum_stmt(), alter_table_stmt(), rename_stmt(),
    create_function_stmt(), do_block_stmt(), copy_from_file_stmt(),
)

# hostile COPY payload rows: semicolons, rule-trigger DDL as literal
# data, comment markers, quotes, dollar signs, backslashes
_PAYLOAD_ROW = st.sampled_from([
    "1\tplain row",
    "2\tDROP TABLE users;",
    "3\tVACUUM FULL; TRUNCATE a;",
    "4\t-- not a comment",
    "5\t/* not a block */",
    "6\tit's quoted \"here\"",
    "7\t$$ dollar $tag$ signs",
    "8\tback\\slash",
    "\\N\t\\N",
])


def _check_features(feats, expected: dict) -> None:
    for key, want in expected.items():
        if key == "commands":
            assert len(feats.commands) == len(want), (
                feats.stmt_sql, [c.as_dict() for c in feats.commands], want
            )
            for got_cmd, want_cmd in zip(feats.commands, want):
                got = got_cmd.as_dict()
                for ck, cv in want_cmd.items():
                    assert got[ck] == cv, (feats.stmt_sql, got, want_cmd)
        else:
            got = getattr(feats, key)
            assert got == want, (feats.stmt_sql, key, got, want)


@given(_ANY_STMT)
@settings(max_examples=400, deadline=None)
def test_single_statement_classification_by_construction(case):
    sql, expected = case
    feats = P.classify_statement(0, sql)
    _check_features(feats, expected)


@given(st.lists(_ANY_STMT, min_size=1, max_size=4), st.lists(_SEP, max_size=4))
@settings(max_examples=200, deadline=None)
def test_migration_roundtrip_with_interstatement_noise(cases, seps)  :
    """Several generated statements joined with ';' plus comment noise
    between them must split back into exactly those statements, each
    classifying to its constructed expectation."""
    pieces = []
    for i, (sql, _) in enumerate(cases):
        pieces.append(sql)
        pieces.append(";")
        if i < len(seps):
            pieces.append(seps[i])
    migration = "".join(pieces)
    parsed = P.parse_sql(migration)
    assert len(parsed) == len(cases), (migration, parsed)
    for row, (sql, expected) in zip(parsed, cases):
        feats = P.classify_statement(row["stmt_index"], row["stmt_sql"])
        _check_features(feats, expected)


@given(st.sampled_from(_CONST_DEFAULTS), st.sampled_from(_VOLATILE_DEFAULTS))
@settings(max_examples=60, deadline=None)
def test_volatility_classification_matrix(const_expr, volatile_expr):
    assert not P.is_volatile_default(const_expr), const_expr
    assert P.is_volatile_default(volatile_expr), volatile_expr


@given(
    st.lists(_ANY_STMT, min_size=0, max_size=2),
    ident_pair(),
    st.lists(_PAYLOAD_ROW, min_size=1, max_size=6),
    st.lists(_ANY_STMT, min_size=0, max_size=2),
)
@settings(max_examples=150, deadline=None)
def test_copy_stdin_payload_is_skipped(before, table, rows, after):
    """pg_dump-style COPY ... FROM STDIN; <payload> \\. inside a
    migration: the payload — including rows that look like ';'-separated
    rule-trigger DDL — must vanish entirely, and the statements around
    the COPY must keep their classification and count."""
    traw, tnorm = table
    pieces = [sql + ";\n" for sql, _ in before]
    pieces.append(f"COPY {traw} (a, b) FROM STDIN;\n")
    pieces.extend(r + "\n" for r in rows)
    pieces.append("\\.\n")
    pieces.extend(sql + ";\n" for sql, _ in after)
    parsed = P.parse_sql("".join(pieces))
    expected = [e for _, e in before] + [
        {"stmt_type": "copy", "table": tnorm}
    ] + [e for _, e in after]
    assert len(parsed) == len(expected), (pieces, parsed)
    for row, exp in zip(parsed, expected):
        feats = P.classify_statement(row["stmt_index"], row["stmt_sql"])
        _check_features(feats, exp)


@given(st.one_of(create_function_stmt(), do_block_stmt()), _ANY_STMT)
@settings(max_examples=150, deadline=None)
def test_routine_bodies_do_not_leak_rule_triggers(routine, neighbor):
    """A routine body stuffed with DROP/VACUUM/ALTER text is ONE 'other'
    statement; a real statement after it still parses independently."""
    (r_sql, r_exp), (n_sql, n_exp) = routine, neighbor
    parsed = P.parse_sql(f"{r_sql};\n{n_sql};")
    assert len(parsed) == 2, (r_sql, n_sql, parsed)
    _check_features(
        P.classify_statement(parsed[0]["stmt_index"], parsed[0]["stmt_sql"]),
        r_exp,
    )
    _check_features(
        P.classify_statement(parsed[1]["stmt_index"], parsed[1]["stmt_sql"]),
        n_exp,
    )


@given(
    ident_pair(),
    st.lists(_PAYLOAD_ROW, min_size=1, max_size=4),
    _ANY_STMT,
    st.sampled_from(["\r\n", "\n"]),
)
@settings(max_examples=80, deadline=None)
def test_copy_stdin_payload_skipped_with_crlf(table, rows, after, eol):
    """r04 advice item (medium): a CRLF dump's terminator line is
    '\\.\r\n' — the skipper must still find it, or every statement after
    the first COPY block silently vanishes from analysis."""
    traw, tnorm = table
    a_sql, a_exp = after
    text = eol.join(
        [f"COPY {traw} (a, b) FROM STDIN;", *rows, "\\.", a_sql + ";", ""]
    )
    parsed = P.parse_sql(text)
    expected = [{"stmt_type": "copy", "table": tnorm}, a_exp]
    assert len(parsed) == len(expected), (text, parsed)
    for row, exp in zip(parsed, expected):
        _check_features(
            P.classify_statement(row["stmt_index"], row["stmt_sql"]), exp
        )


# r05 fuzz round 3: nested dollar-quote tags + positional parameters.
# PostgreSQL lexing: inside a $tag$ string the content is RAW until the
# first exactly-matching close tag — differently-tagged "nested" quotes
# and $$ sequences have no meaning there; `$` followed by a digit is a
# positional parameter, never a dollar-quote opener.
_INNER_DOLLAR = st.sampled_from([
    "EXECUTE $$DROP TABLE users;$$;",
    "PERFORM $q$VACUUM FULL;$q$;",
    "x := $$ semicolon ; inside $$;",
    "y := 'quote '' and ; semi';",
    "EXECUTE format($fmt$CREATE INDEX i ON t (c);$fmt$);",
    "w := $tagx$ raw $ text $tagx$;",
])


@given(
    st.sampled_from(["$outer$", "$fn_1$", "$b0dy$"]),
    st.lists(_INNER_DOLLAR, min_size=1, max_size=3),
    _ANY_STMT,
)
@settings(max_examples=120, deadline=None)
def test_nested_dollar_quotes_stay_one_statement(outer, inner, neighbor):
    """A routine body holding $$-quoted snippets (with semicolons and
    rule-trigger DDL) inside a differently-tagged outer quote is ONE
    'other' statement; the next real statement still parses."""
    n_sql, n_exp = neighbor
    body = " BEGIN " + " ".join(inner) + " END; "
    sql = (
        f"CREATE FUNCTION nested() RETURNS void LANGUAGE plpgsql AS "
        f"{outer}{body}{outer};\n{n_sql};"
    )
    parsed = P.parse_sql(sql)
    assert len(parsed) == 2, (sql, parsed)
    _check_features(
        P.classify_statement(parsed[0]["stmt_index"], parsed[0]["stmt_sql"]),
        {"stmt_type": "other", "table": None, "tables": []},
    )
    _check_features(
        P.classify_statement(parsed[1]["stmt_index"], parsed[1]["stmt_sql"]),
        n_exp,
    )


@given(_ANY_STMT)
@settings(max_examples=60, deadline=None)
def test_positional_params_do_not_open_dollar_quotes(neighbor):
    """$1/$2 are parameters: they must not be lexed as a dollar-quote
    start (which would swallow every following statement)."""
    n_sql, n_exp = neighbor
    sql = f"PREPARE p (int) AS SELECT * FROM t WHERE id = $1 AND x > $2;\n{n_sql};"
    parsed = P.parse_sql(sql)
    assert len(parsed) == 2, (sql, parsed)
    _check_features(
        P.classify_statement(parsed[0]["stmt_index"], parsed[0]["stmt_sql"]),
        {"stmt_type": "other", "table": None, "tables": []},
    )
    _check_features(
        P.classify_statement(parsed[1]["stmt_index"], parsed[1]["stmt_sql"]),
        n_exp,
    )


@given(st.sampled_from(["$fn$", "$a$"]), _ANY_STMT)
@settings(max_examples=60, deadline=None)
def test_unterminated_dollar_quote_swallows_to_eof(tag, neighbor):
    """An unterminated dollar quote runs to EOF (PostgreSQL would raise;
    the recognizer's conservative behavior is one 'other' statement) —
    locked in so a refactor can't silently change it to resplitting.
    Only meaningful when the neighbor holds no matching tag: a matching
    tag downstream legitimately CLOSES the quote (Postgres lexing), so
    such draws are discarded."""
    from hypothesis import assume

    n_sql, _ = neighbor
    assume(tag not in n_sql)
    sql = f"CREATE FUNCTION broken() AS {tag} BEGIN SELECT 1; END;\n{n_sql};"
    parsed = P.parse_sql(sql)
    assert len(parsed) == 1, (sql, parsed)
    _check_features(
        P.classify_statement(parsed[0]["stmt_index"], parsed[0]["stmt_sql"]),
        {"stmt_type": "other", "table": None, "tables": []},
    )


# --- fuzz round 5: comment decoration noise ----------------------------
# The r05 probe corners generalized into a generator. Only comments and
# whitespace are legal BETWEEN statements (a bare string literal before
# a statement head is invalid SQL and rightly classifies as 'other' —
# the first generator draft asserted otherwise and Hypothesis caught
# it), so inter-statement noise draws from comment forms whose bodies
# hide semicolons, quotes, and nested block openers; the
# string/identifier corners live as exact-output regressions in
# test_parse.py (test_splitter_pg_string_and_comment_corners).

_NOISE_ATOM = st.sampled_from([
    "/* ; */",
    "/* outer /* inner ; */ tail ; */",
    "/* 'unclosed quote inside comment */",
    "-- line ; comment\n",
    "-- E'\\'; still a comment\n",
    " \t\n ",
])


@st.composite
def _decorated_stmt(draw):
    sql, expected = draw(_ANY_STMT)
    pre = "".join(draw(st.lists(_NOISE_ATOM, max_size=3)))
    if pre and not pre[-1].isspace() and not pre.endswith("*/"):
        pre += " "
    return pre + sql, expected


@given(st.lists(_decorated_stmt(), min_size=1, max_size=4))
@settings(max_examples=250, deadline=None)
def test_split_survives_decoration_noise(cases):
    migration = ";".join(sql for sql, _ in cases) + ";"
    parsed = P.parse_sql(migration)
    assert len(parsed) == len(cases), (migration, parsed)
    for row, (_, expected) in zip(parsed, cases):
        feats = P.classify_statement(row["stmt_index"], row["stmt_sql"])
        _check_features(feats, expected)


# --- fuzz round 6: line-ending dialects, dollar tags in COPY payloads,
# non-ASCII comment content -----------------------------------------------
# Real fixes this round forced (analyzer/parse.py): line comments and the
# COPY terminator search matched only '\n' line boundaries, so a
# classic-Mac \r-only migration's first comment (or first COPY block)
# silently swallowed every later statement — PostgreSQL's lexer defines
# newline as [\n\r] (scan.l {newline}).

_EOL = st.sampled_from(["\n", "\r\n", "\r"])

# payload rows that try to confuse the skipper: dollar tags, unclosed
# quotes, comment markers, semicolon-bearing DDL text
_HOSTILE_PAYLOAD_ROW = st.sampled_from([
    "1;DROP TABLE users;",
    "$tag$ not a quote opener",
    "'unclosed literal",
    "-- not a comment here",
    "/* nor this */",
    "plain\trow",
    "$$;$$",
])


@given(
    ident_pair(),
    st.lists(_HOSTILE_PAYLOAD_ROW, min_size=1, max_size=5),
    _ANY_STMT,
    _EOL,
)
@settings(max_examples=120, deadline=None)
def test_copy_payload_skipped_any_line_ending(table, rows, after, eol):
    """LF, CRLF and classic-Mac \\r-only dumps must all find the COPY
    terminator; payload rows full of dollar tags / quotes / DDL text
    must vanish without affecting the split."""
    traw, tnorm = table
    a_sql, a_exp = after
    text = eol.join(
        [f"COPY {traw} (a, b) FROM STDIN;", *rows, "\\.", a_sql + ";", ""]
    )
    parsed = P.parse_sql(text)
    expected = [{"stmt_type": "copy", "table": tnorm}, a_exp]
    assert len(parsed) == len(expected), (repr(text), parsed)
    for row, exp in zip(parsed, expected):
        _check_features(
            P.classify_statement(row["stmt_index"], row["stmt_sql"]), exp
        )


@given(_ANY_STMT, _EOL)
@settings(max_examples=90, deadline=None)
def test_line_comment_any_line_ending(neighbor, eol):
    """A line comment ends at [\\n\\r]: the statement after it must
    survive whatever line-ending dialect the file uses."""
    n_sql, n_exp = neighbor
    parsed = P.parse_sql(f"-- leading ; comment{eol}{n_sql};{eol}")
    assert len(parsed) == 1, (eol, parsed)
    _check_features(
        P.classify_statement(parsed[0]["stmt_index"], parsed[0]["stmt_sql"]),
        n_exp,
    )


@given(st.sampled_from(["$b$", "$fn$"]), _ANY_STMT, _EOL)
@settings(max_examples=90, deadline=None)
def test_copy_text_inside_dollar_body_is_not_payload(tag, neighbor, eol):
    """A routine body that CONTAINS 'COPY ... FROM STDIN;' text plus a
    terminator-looking line is still ONE statement — the dollar quote is
    raw content, so the payload skipper must never engage on it."""
    n_sql, n_exp = neighbor
    body = eol.join(["COPY t FROM STDIN;", "row;1", "\\.", ""])
    sql = f"CREATE FUNCTION f() AS {tag} {body} {tag};{eol}{n_sql};"
    parsed = P.parse_sql(sql)
    assert len(parsed) == 2, (repr(sql), parsed)
    _check_features(
        P.classify_statement(parsed[0]["stmt_index"], parsed[0]["stmt_sql"]),
        {"stmt_type": "other", "table": None, "tables": []},
    )
    _check_features(
        P.classify_statement(parsed[1]["stmt_index"], parsed[1]["stmt_sql"]),
        n_exp,
    )


_NONASCII_COMMENT = st.sampled_from([
    "/* café ; 中文 $x$ */",
    "/* emoji \U0001f600 ; */",
    "-- héllo ; wörld\n",
    "-- 中文注释 ;\n",
    "/* mixed é中\U0001f600 -- nested marker */",
])


@given(st.lists(st.tuples(_NONASCII_COMMENT, _ANY_STMT), min_size=1, max_size=3))
@settings(max_examples=120, deadline=None)
def test_nonascii_comment_content_is_transparent(cases):
    """Non-ASCII bytes inside comments are content: they must not shift
    offsets, break the split, or leak into classification."""
    migration = "".join(f"{c} {sql};\n" for c, (sql, _) in cases)
    parsed = P.parse_sql(migration)
    assert len(parsed) == len(cases), (migration, parsed)
    for row, (_, (_, expected)) in zip(parsed, cases):
        feats = P.classify_statement(row["stmt_index"], row["stmt_sql"])
        _check_features(feats, expected)


# --- fuzz round 6 wave 2: token-juxtaposed strings, quoted-ident quoting --
# Real fix this wave (analyzer/parse.py): E'...' opened an escape string
# even when the E was the TAIL of an identifier/keyword (LIKE'pat',
# CASE'x'). PostgreSQL's lexer forms xestart only at token start, so the
# quote opens an ORDINARY string whose backslash is literal — under the
# old rule, "...LIKE'%\';DROP TABLE users;" became ONE statement and the
# DROP was never split out or flagged.

_E_TAIL_HEAD = st.sampled_from([
    "DELETE FROM t WHERE a LIKE",
    "SELECT CASE",
    "UPDATE t SET v = v WHERE note",
    "SELECT 1 WHERE state",
])
_BACKSLASH_BODY = st.sampled_from(["%\\", "\\", "a\\b\\", "c:\\path\\"])


@given(_E_TAIL_HEAD, _BACKSLASH_BODY, _ANY_STMT)
@settings(max_examples=120, deadline=None)
def test_juxtaposed_string_after_keyword_is_ordinary(head, body, neighbor):
    """A quote glued to an identifier/keyword tail opens an ordinary
    string: its backslash is literal, the string ends at the first
    quote, and the NEXT statement must split out and classify."""
    n_sql, n_exp = neighbor
    migration = f"{head}'{body}';\n{n_sql};"
    parsed = P.parse_sql(migration)
    assert len(parsed) == 2, (migration, parsed)
    _check_features(
        P.classify_statement(parsed[1]["stmt_index"], parsed[1]["stmt_sql"]),
        n_exp,
    )


@given(st.sampled_from(["a", "%x", "pa th", "x=y"]), _ANY_STMT)
@settings(max_examples=80, deadline=None)
def test_token_start_e_string_still_escapes(body, neighbor):
    """At token start (after whitespace/punctuation) E'...' IS an escape
    string: the appended backslash-quote stays INSIDE it (a body ending
    in its own backslash would turn that into escaped-backslash + close,
    so bodies here are backslash-free); the neighbor still splits."""
    n_sql, n_exp = neighbor
    migration = f"INSERT INTO t VALUES (E'{body}\\';tail');\n{n_sql};"
    parsed = P.parse_sql(migration)
    assert len(parsed) == 2, (migration, parsed)
    _check_features(
        P.classify_statement(parsed[1]["stmt_index"], parsed[1]["stmt_sql"]),
        n_exp,
    )


_TRICKY_IDENT = st.sampled_from([
    '"a""b;c"', '"x;y"', '"$tag$;"', "\"we'ird\"", '"-- not a comment;"',
])


@given(_TRICKY_IDENT, _ANY_STMT)
@settings(max_examples=100, deadline=None)
def test_quoted_identifiers_protect_their_content(ident, neighbor):
    """Semicolons, quote runs, dollar tags and comment markers inside
    double-quoted identifiers are content: the statement splits only at
    the real top-level semicolons (doubled "" self-balances as
    close+reopen, which is split-equivalent to PG's escape rule)."""
    n_sql, n_exp = neighbor
    migration = f"CREATE TABLE {ident} (id int);\n{n_sql};"
    parsed = P.parse_sql(migration)
    assert len(parsed) == 2, (migration, parsed)
    _check_features(
        P.classify_statement(parsed[1]["stmt_index"], parsed[1]["stmt_sql"]),
        n_exp,
    )


# --- fuzz round 6 wave 3: file-level framing noise ------------------------
# Real fix this wave (analyzer/parse.py): psql strips a leading UTF-8
# BOM before the server sees the file, so a BOM-carrying dump's first
# statement must split and classify normally — previously it classified
# as 'other' and its danger rules were silently skipped.

_FRAMING = st.sampled_from(["\ufeff", "", "\x0b\x0c", "\ufeff\n\n"])


@given(_FRAMING, _ANY_STMT, _ANY_STMT)
@settings(max_examples=100, deadline=None)
def test_leading_bom_and_exotic_whitespace_are_framing(pre, first, second):
    """A leading BOM (or VT/FF whitespace) is file framing, not
    statement content: both statements classify exactly as without it."""
    (s1, e1), (s2, e2) = first, second
    parsed = P.parse_sql(f"{pre}{s1};\n{s2};")
    assert len(parsed) == 2, (pre, parsed)
    _check_features(
        P.classify_statement(parsed[0]["stmt_index"], parsed[0]["stmt_sql"]), e1
    )
    _check_features(
        P.classify_statement(parsed[1]["stmt_index"], parsed[1]["stmt_sql"]), e2
    )


@given(_ANY_STMT)
@settings(max_examples=60, deadline=None)
def test_copy_payload_midline_backslash_dot_not_terminator(neighbor):
    """Inside a COPY payload, ``\\.`` terminates only as a line of its
    own — mid-line occurrences are data."""
    n_sql, n_exp = neighbor
    sql = (
        "COPY t FROM STDIN;\n"
        "a\\tb with \\. inside\n"
        "c\\td\n"
        "\\.\n"
        f"{n_sql};"
    )
    parsed = P.parse_sql(sql)
    assert len(parsed) == 2, (sql, parsed)
    _check_features(
        P.classify_statement(parsed[1]["stmt_index"], parsed[1]["stmt_sql"]),
        n_exp,
    )


def test_malformed_pg16_literals_stay_volatile():
    """The conservative side of the wave-4 extension: trailing/leading/
    doubled underscores and bare radix prefixes are NOT valid literals,
    so they keep the volatile (HIGH-severity) classification."""
    for expr in ["1_", "_1", "1__0", "0x", "0b", "0o8", "0xG"]:
        assert P.is_volatile_default(expr), expr


# --- fuzz round 6 wave 5: concurrent-routing coverage beyond the reference
# Probe sweep found no splitter/classifier fixes (IF NOT EXISTS forms,
# ONLY variants, USING casts, multi-command ALTERs, anonymous indexes
# all already correct) — ONE deliberate superset landed: the reference
# routes only IndexStmt/DropStmt around transactions
# (internal/executor/concurrent.go:27-36), so REINDEX ... CONCURRENTLY
# would be wrapped in a transaction block PostgreSQL 12+ refuses at
# apply time. The recognizer now classifies REINDEX and routes its
# CONCURRENTLY form outside transactions.

_REINDEX_TARGET = st.sampled_from(["INDEX", "TABLE", "SCHEMA"])
# (options, options_force_concurrent): the PG 14+ parenthesized form
# can itself request concurrency — bare CONCURRENTLY defaults to true,
# explicit FALSE/OFF/0 disables (fuzz round 7: r06 ADVICE found the
# bare form misrouted into a transaction block)
_REINDEX_OPTS = st.sampled_from([
    ("", False),
    ("(VERBOSE) ", False),
    ("(CONCURRENTLY FALSE) ", False),
    ("(CONCURRENTLY OFF) ", False),
    ("(CONCURRENTLY) ", True),
    ("(CONCURRENTLY TRUE) ", True),
    ("(VERBOSE, CONCURRENTLY) ", True),
    ("(CONCURRENTLY, VERBOSE FALSE) ", True),
])


@given(_REINDEX_TARGET, _REINDEX_OPTS, st.booleans(), _ANY_STMT)
@settings(max_examples=120, deadline=None)
def test_reindex_concurrently_routes_outside_tx(target, opts, conc, neighbor):
    n_sql, n_exp = neighbor
    opt_sql, opt_conc = opts
    kw = "CONCURRENTLY " if conc else ""
    expect_conc = conc or opt_conc
    sql = f"REINDEX {opt_sql}{target} {kw}obj_name;\n{n_sql};"
    parsed = P.parse_sql(sql)
    assert len(parsed) == 2, (sql, parsed)
    feats = P.classify_statement(parsed[0]["stmt_index"], parsed[0]["stmt_sql"])
    assert feats.as_dict()["stmt_type"] == "reindex"
    assert feats.as_dict()["concurrent"] is expect_conc
    # the REINDEX alone routes iff concurrent; the combined migration
    # routes when EITHER statement does (a concurrent neighbor — e.g. a
    # generated CREATE INDEX CONCURRENTLY — legitimately routes it)
    assert P.contains_concurrent_op(
        f"REINDEX {opt_sql}{target} {kw}obj_name;"
    ) is expect_conc
    neighbor_routes = bool(n_exp.get("concurrent"))
    assert P.contains_concurrent_op(sql) is (expect_conc or neighbor_routes)
    _check_features(
        P.classify_statement(parsed[1]["stmt_index"], parsed[1]["stmt_sql"]),
        n_exp,
    )


def test_concurrently_inside_literals_does_not_route():
    """The routing predicate must parse, not substring-match: the word
    inside strings/comments is content."""
    assert not P.contains_concurrent_op("SELECT 'REINDEX INDEX CONCURRENTLY i';")
    assert not P.contains_concurrent_op("-- REINDEX INDEX CONCURRENTLY i\nSELECT 1;")
    assert not P.contains_concurrent_op(
        "CREATE FUNCTION f() RETURNS void AS $$ "
        "REINDEX INDEX CONCURRENTLY i $$ LANGUAGE sql;"
    )


# --- fuzz round 7: PG 14+ SQL-standard function bodies. Probe sweep
# covered REINDEX-in-DO routing, \r-only COPY payload terminators,
# dollar tags containing keywords ($reindex$/$end$/$do$), prefix-
# colliding tags, U& strings/identifiers, DO with single-quoted bodies,
# and nested block comments — all already correct. ONE real fix landed:
# CREATE FUNCTION/PROCEDURE ... BEGIN ATOMIC stmt; stmt; END is bare
# SQL (not a dollar-quoted literal), and the splitter fragmented it at
# the body's internal semicolons.

_ATOMIC_BODY = st.sampled_from([
    "SELECT 1; SELECT 2;",
    "SELECT CASE WHEN true THEN 1 ELSE 2 END; RETURN 1;",
    "INSERT INTO audit VALUES (1); DELETE FROM audit WHERE id = 2;",
    # nested SQL-standard body
    "CREATE FUNCTION g() RETURNS int LANGUAGE sql BEGIN ATOMIC"
    " SELECT 3; RETURN 4; END; SELECT 5;",
])


@given(_ATOMIC_BODY, _ANY_STMT)
@settings(max_examples=60, deadline=None)
def test_begin_atomic_body_is_one_statement(body, neighbor):
    n_sql, n_exp = neighbor
    sql = (
        f"CREATE PROCEDURE p() LANGUAGE sql BEGIN ATOMIC {body} END;\n"
        f"{n_sql};"
    )
    parsed = P.parse_sql(sql)
    assert len(parsed) == 2, (sql, [p["stmt_sql"][:60] for p in parsed])
    assert parsed[0]["stmt_sql"].upper().startswith("CREATE PROCEDURE")
    _check_features(
        P.classify_statement(parsed[1]["stmt_index"], parsed[1]["stmt_sql"]),
        n_exp,
    )


def test_begin_atomic_does_not_misfire():
    """Plain BEGIN/END transaction statements, CASE outside bodies,
    BEGIN ATOMIC inside strings/comments/dollar-quotes, and identifiers
    containing the keywords must all split exactly as before."""
    cases = [
        ("BEGIN;\nDROP TABLE t;\nCOMMIT;", 3),
        ("BEGIN;\nSELECT 1;\nEND;", 3),  # END == COMMIT
        ("SELECT 'BEGIN ATOMIC x; y';\nSELECT 2;", 2),
        ("-- BEGIN ATOMIC\nSELECT 1;\nSELECT 2;", 2),
        ("DO $$ BEGIN ATOMIC_HELPER(); END $$;\nSELECT 2;", 2),
        ("SELECT may_begin FROM t; SELECT 2;", 2),
        ("SELECT CASE WHEN a THEN 1 END FROM t;\nSELECT 2;", 2),
        # whitespace/newline variants between BEGIN and ATOMIC
        ("CREATE PROCEDURE p() LANGUAGE sql BEGIN\r\nATOMIC"
         " SELECT 1; END;\r\nSELECT 2;", 2),
    ]
    for sql, want in cases:
        parsed = P.parse_sql(sql)
        assert len(parsed) == want, (sql, parsed)


# --- fuzz round 7 wave 8: per-relation inheritance markers + keyword-
# collision identifiers. Probe sweep covered quoted identifiers named
# CONCURRENTLY (index name, REINDEX target, DROP INDEX target), ADD
# COLUMN IF NOT EXISTS with volatile defaults, plain-string backslash
# semantics (standard_conforming_strings), COMMENT payloads carrying
# statement-looking text, parenthesized statements, and NOT VALID split
# across newlines/comments — all already correct. ONE real fix landed:
# in the LOCK/TRUNCATE grammar every relation may carry its own
# [ONLY] name [*] inheritance markers, and the comma-list extractor
# only stripped the FIRST ONLY — "LOCK ONLY t1, ONLY t2" produced a
# finding against a relation literally named "only t2" where
# libpg_query's RangeVar walk yields clean relnames.

_LOCK_MARKED_NAMES = st.lists(
    st.tuples(
        st.sampled_from(["t1", "s.t2", '"Only T"', "only_tab", '"only"']),
        st.booleans(),  # ONLY prefix
        st.booleans(),  # * descendant suffix
    ),
    min_size=1,
    max_size=4,
)


@given(_LOCK_MARKED_NAMES, st.booleans(), st.booleans())
@settings(max_examples=120, deadline=None)
def test_lock_truncate_strip_inheritance_markers(names, use_table_kw, trunc):
    import re as _re

    parts = [
        f"{'ONLY ' if only else ''}{name}{' *' if star else ''}"
        for name, only, star in names
    ]
    kw = ("TRUNCATE" if trunc else "LOCK") + (" TABLE" if use_table_kw else "")
    tail = " CASCADE" if trunc else " IN ACCESS EXCLUSIVE MODE"
    sql = f"{kw} {', '.join(parts)}{tail};"
    parsed = P.parse_sql(sql)
    assert len(parsed) == 1
    feats = P.classify_statement(
        parsed[0]["stmt_index"], parsed[0]["stmt_sql"]
    ).as_dict()
    expected = [_re.sub(r'"', "", n) for n, _, _ in names]
    assert feats["stmt_type"] == ("truncate" if trunc else "lock"), sql
    assert feats["tables"] == expected, (sql, feats["tables"])


def test_keyword_collision_identifiers_do_not_route():
    """Quoted identifiers that spell routing keywords are names, not
    keywords: none of these are concurrent operations."""
    cases_not_concurrent = [
        'CREATE INDEX "CONCURRENTLY" ON t (c);',
        'REINDEX INDEX "CONCURRENTLY";',
    ]
    for sql in cases_not_concurrent:
        parsed = P.parse_sql(sql)
        feats = P.classify_statement(
            parsed[0]["stmt_index"], parsed[0]["stmt_sql"]
        ).as_dict()
        assert feats["concurrent"] is False, sql
        assert P.contains_concurrent_op(sql) is False, sql
    cases_concurrent = [
        'CREATE INDEX CONCURRENTLY "CONCURRENTLY" ON t (c);',
        'DROP INDEX CONCURRENTLY IF EXISTS "CONCURRENTLY";',
    ]
    for sql in cases_concurrent:
        parsed = P.parse_sql(sql)
        feats = P.classify_statement(
            parsed[0]["stmt_index"], parsed[0]["stmt_sql"]
        ).as_dict()
        assert feats["concurrent"] is True, sql
        assert P.contains_concurrent_op(sql) is True, sql


# --- fuzz round 8 wave 9: top-level DEFAULT tokenization, grouping
# parens around constant defaults, relation_expr star. Probe sweep also
# covered the r07-suggested targets that turned out already-correct:
# COPY ... FROM STDIN payloads with embedded semicolons / DROP-looking
# rows (r04 machinery), GENERATED ALWAYS AS expressions with commas and
# nested parens in multi-command ALTERs, SECURITY LABEL / COMMENT ON
# with dollar-quoted statement-looking bodies, and mixed safe/dangerous
# subcommand lists. THREE real fixes landed (analyzer/parse.py):
#
# * a bare regex search matched DEFAULT inside a CHECK constraint's
#   string literal ("CHECK (status <> 'DEFAULT value')") and raised a
#   false volatile-default finding — DEFAULT is now located as a
#   top-level token outside quotes and parens;
# * grouping parentheses around a constant default — DEFAULT (0),
#   ((42)), ('x'::text), ('x')::text — classified volatile, where the
#   real grammar drops the parens and yields the same A_Const/TypeCast
#   nodes as the bare forms;
# * ALTER TABLE t * (relation_expr descendant star) led the first
#   subcommand with "*", so the whole command list parsed as 'other'
#   and every danger rule was silently skipped.


def test_default_inside_string_literal_is_not_a_default():
    cases = [
        "ALTER TABLE t ADD COLUMN s text CHECK (s <> 'DEFAULT value');",
        "ALTER TABLE t ADD COLUMN s text CHECK (s <> 'x DEFAULT ');",
        'ALTER TABLE t ADD COLUMN "DEFAULT col" text;',
    ]
    for sql in cases:
        cmd = P.classify_statement(0, sql).commands[0]
        assert cmd.subtype == "add_column", sql
        assert cmd.has_default is False, sql
        assert cmd.default_volatile is False, sql
    # ...while a REAL default after such a constraint still registers
    sql = ("ALTER TABLE t ADD COLUMN s text "
           "CHECK (s <> 'DEFAULT value') DEFAULT 'ok';")
    # (column constraints may appear in any order; DEFAULT after CHECK
    # is grammatical)
    cmd = P.classify_statement(0, sql).commands[0]
    assert cmd.has_default is True and cmd.default_volatile is False, sql


@given(
    st.sampled_from(["0", "42", "'x'", "NULL", "TRUE", "1.5e3", "0x1F"]),
    st.integers(min_value=1, max_value=3),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_grouping_parens_around_constant_default(lit, n_parens, spaced):
    pad = " " if spaced else ""
    expr = lit
    for _ in range(n_parens):
        expr = f"({pad}{expr}{pad})"
    sql = f"ALTER TABLE t ADD COLUMN c text DEFAULT {expr};"
    cmd = P.classify_statement(0, sql).commands[0]
    assert cmd.has_default is True, sql
    assert cmd.default_volatile is False, sql


def test_parenthesized_volatile_default_stays_volatile():
    for expr in ["(random())", "((now()))", "(a + b)", "('x' || 'y')"]:
        sql = f"ALTER TABLE t ADD COLUMN c text DEFAULT {expr};"
        cmd = P.classify_statement(0, sql).commands[0]
        assert cmd.default_volatile is True, sql


def test_alter_table_descendant_star_keeps_commands():
    for star in ["*", " *", " * "]:
        sql = (f"ALTER TABLE t{star} ADD CONSTRAINT ck CHECK (x > 0),"
               f" ALTER COLUMN c SET NOT NULL;")
        feats = P.classify_statement(0, sql)
        assert feats.stmt_type == "alter_table", sql
        assert feats.table == "t", sql
        subs = [c.subtype for c in feats.commands]
        assert subs == ["add_constraint", "set_not_null"], (sql, subs)


def test_wave9_already_correct_targets():
    """The r07-suggested probes that found the recognizer already right
    — frozen so they stay right."""
    # COPY payload: semicolons + DDL-looking rows never split/classify
    sql = ("COPY t (a, b) FROM STDIN WITH (DELIMITER ';');\n"
           "1;DROP TABLE x\n2;LOCK TABLE y;\n\\.\nDROP TABLE real_t;")
    parsed = P.parse_sql(sql)
    assert [f["stmt_type"] for f in parsed] == ["copy", "drop_table"]
    assert parsed[1]["tables"] == ["real_t"]
    # GENERATED ALWAYS AS with commas/parens in a multi-command ALTER
    sql = ("ALTER TABLE t ADD COLUMN g int GENERATED ALWAYS AS "
           "(coalesce(a, b, least(c, d))) STORED, DROP COLUMN old;")
    feats = P.classify_statement(0, sql)
    assert [c.subtype for c in feats.commands] == [
        "add_column", "drop_column",
    ]
    assert feats.commands[0].has_default is False
    # SECURITY LABEL / COMMENT ON with dollar-quoted bodies: one
    # statement each, bodies inert
    sql = ("SECURITY LABEL FOR anon ON FUNCTION f(int) IS "
           "$l$MASKED; WITH x;$l$;\n"
           "COMMENT ON TABLE t IS $$drop table x; lock y;$$;\n"
           "SELECT 1;")
    parsed = P.parse_sql(sql)
    assert len(parsed) == 3
    assert all(f["stmt_type"] == "other" for f in parsed)


# --- fuzz round 8 wave 10: dollar-quoted and E-string literals in the
# ALTER command path. Waves 9 AND 10 each froze real fixes — the dry-well
# declaration (two consecutive zero-fix waves) remains unearned. FIVE
# real fixes landed (analyzer/parse.py, all sharing the new
# `_skip_quoted` scanner):
#
# * a comma inside a dollar-quoted default ($$x, y$$) split the ALTER
#   command list (phantom 'other' command);
# * an escaped quote inside an E-string default (E'a\',b') corrupted the
#   split the same way;
# * $tag$…$tag$ and E'…' defaults classified volatile, though both are
#   the SAME A_Const string node as '…' to the real parser (false R2);
# * a constraint keyword inside a dollar-quoted default body
#   ($$a CHECK b$$) cut the extracted default expression mid-literal;
# * -(1) classified volatile, though the grammar folds doNegate over the
#   parenthesized constant into A_Const(-1). Crucially $$a$$ || $$b$$
#   stays volatile — the dollar-const check is code-scanned, because a
#   regex backreference backtracks ACROSS separate $$…$$ strings.


def test_dollar_quoted_default_does_not_split_commands():
    sql = ("ALTER TABLE t ADD COLUMN c text DEFAULT $$x, y$$,"
           " ADD COLUMN d int;")
    feats = P.classify_statement(0, sql)
    assert [(c.subtype, c.column) for c in feats.commands] == [
        ("add_column", "c"), ("add_column", "d"),
    ]
    assert feats.commands[0].default_volatile is False


def test_estring_default_with_escaped_quote_and_comma():
    sql = (r"ALTER TABLE t ADD COLUMN c text DEFAULT E'a\',b',"
           " ADD COLUMN d int;")
    feats = P.classify_statement(0, sql)
    assert [c.subtype for c in feats.commands] == [
        "add_column", "add_column",
    ]
    assert feats.commands[0].default_volatile is False


def test_string_flavor_constants_are_nonvolatile():
    for expr in ["$$hello$$", "$q$it's$q$", "$$a$$::text",
                 r"E'a\nb'", "$$a CHECK b$$"]:
        sql = f"ALTER TABLE t ADD COLUMN c text DEFAULT {expr} NOT NULL;"
        cmd = P.classify_statement(0, sql).commands[0]
        assert cmd.has_default is True, expr
        assert cmd.default_volatile is False, expr


def test_dollar_concat_expression_stays_volatile():
    for expr in ["$$a$$ || $$b$$", "E'a' || E'b'", "$$a$$ || 'b'"]:
        sql = f"ALTER TABLE t ADD COLUMN c text DEFAULT {expr};"
        cmd = P.classify_statement(0, sql).commands[0]
        assert cmd.default_volatile is True, expr


def test_negated_paren_constant_folds():
    assert P.is_volatile_default("-(1)") is False
    assert P.is_volatile_default("- ( 42 )") is False
    assert P.is_volatile_default("-(random())") is True
    # doNegate folds only numeric constants; a negated string is A_Expr
    assert P.is_volatile_default("-('x')") is True


# --- fuzz round 8 wave 11: parenthesized statement bodies + cast-type
# forms. TWO real fixes (waves 9, 10, 11 all froze fixes — the dry-well
# counter stays at zero):
#
# * the splitter was paren-blind: a ';' inside a parenthesized body
#   (CREATE RULE ... DO INSTEAD (stmt; stmt);) split one statement into
#   fragments — psql and the real grammar both track paren depth. The
#   depth clamps at 0 so malformed input with a stray ')' cannot
#   swallow the rest of the file;
# * the ::type cast suffix accepted only bare multi-word names, so the
#   classic empty-array default '{}'::text[] — plus quoted ("myType")
#   and schema-qualified (schema.dom) casts — classified volatile
#   (false R2), though all are the same TypeCast-of-A_Const node.


def test_semicolons_inside_parenthesized_bodies_do_not_split():
    sql = ("CREATE RULE r AS ON INSERT TO t DO INSTEAD "
           "(UPDATE a SET x = 1; UPDATE b SET y = 2);\nDROP TABLE z;")
    parsed = P.parse_sql(sql)
    assert [f["stmt_type"] for f in parsed] == ["other", "drop_table"]
    # stray ')' in malformed input must not glue later statements
    assert len(P.parse_sql("SELECT 1); SELECT 2;\nDROP TABLE z;")) == 3
    # COPY with a column list still finds its payload
    parsed = P.parse_sql("COPY t (a, b) FROM STDIN;\n1\t2\n\\.\nDROP TABLE z;")
    assert [f["stmt_type"] for f in parsed] == ["copy", "drop_table"]


def test_cast_type_forms_on_constant_defaults():
    nonvolatile = [
        "'{}'::text[]", "'{1,2}'::int[]", "'{}'::\"myType\"",
        "'x'::schema.dom", "0::numeric(10,2)", "$$a$$::text[]",
        "'x'::character varying(255)", "'x'::timestamp with time zone",
    ]
    for expr in nonvolatile:
        assert P.is_volatile_default(expr) is False, expr
    volatile = ["now()::date", "'x'::text || 'y'", "(a + b)::int"]
    for expr in volatile:
        assert P.is_volatile_default(expr) is True, expr


# --- ADVICE r08 fixes (pre-wave-12): two classifier edges ----------------
#
# * _find_top_level_default required whitespace after the DEFAULT
#   keyword, so the legal `DEFAULT(now())` form yielded no default
#   extraction and the volatile-default rule silently skipped — a false
#   NEGATIVE in a safety rule;
# * the parenthesized-operand suffix cast used a narrower inline type
#   pattern than _CAST_SUFFIX_RE, so ('{}')::text[] / ('x')::"t" still
#   raised the false-volatile finding wave 11 fixed for the bare forms.


def test_default_paren_no_whitespace_extracts():
    cmd = "ADD COLUMN created_at timestamptz DEFAULT(now())"
    assert P._extract_default_expr(cmd) == "(now())"
    assert P.is_volatile_default("(now())") is True
    # constant in the same form stays non-volatile
    cmd2 = "ADD COLUMN n int DEFAULT(0)"
    assert P._extract_default_expr(cmd2) == "(0)"
    assert P.is_volatile_default("(0)") is False
    # DEFAULTS (identifier prefix) must NOT match the keyword
    assert P._find_top_level_default("ADD COLUMN defaults int") is None


def test_paren_operand_suffix_cast_wide_types():
    nonvolatile = [
        "('{}')::text[]",
        "('x')::\"myType\"",
        "('x')::schema.dom",
        "((0))::numeric(10,2)",
        "('x')::character varying(255)",
        "('{{1},{2}}')::int[][]",
    ]
    for expr in nonvolatile:
        assert P.is_volatile_default(expr) is False, expr
    volatile = [
        "(now())::date",
        "(a + b)::int[]",
        "('x' || 'y')::text[]",
    ]
    for expr in volatile:
        assert P.is_volatile_default(expr) is True, expr


# --- fuzz wave 12 (r09): ZERO new fixes — the first zero-fix wave ---------
#
# 31 probes across three batches, every one already correct (the two
# ADVICE-r08 classifier fixes above landed BEFORE this wave ran and are
# counted separately). Frozen here per the wave convention. Probe areas:
# SQL-standard function bodies (RETURN expr and BEGIN ATOMIC with
# interleaved comments), CREATE RULE multi-action lists with comments
# containing ';'/')', COMMENT ON literals carrying ::casts, dollar-tag
# prefix collisions, VACUUM parenthesized option VALUES
# ((FULL false/0/off) is NOT full), SET DATA TYPE, unnamed
# constraints/indexes, LOCK/RENAME keyword-optional forms, CONCURRENTLY
# routing flags, and multi-command ALTERs with hostile defaults.


def test_wave12_sql_standard_bodies_and_rules():
    cases = [
        ("CREATE FUNCTION add(a int, b int) RETURNS int LANGUAGE SQL "
         "RETURN a + b;\nDROP TABLE z;", ["other", "drop_table"]),
        ("CREATE FUNCTION f() RETURNS int LANGUAGE SQL BEGIN ATOMIC\n"
         "  -- comment with ; and ) inside\n"
         "  SELECT 1; /* block ; comment */ SELECT 2;\nEND;\nDROP TABLE z;",
         ["other", "drop_table"]),
        ("CREATE RULE r AS ON INSERT TO t DO INSTEAD (\n"
         "  INSERT INTO log VALUES (1); -- note; a semicolon ) here\n"
         "  UPDATE b SET y = 2 /* c); */ );\nDROP TABLE z;",
         ["other", "drop_table"]),
        ("COMMENT ON COLUMN t.c IS 'casts like ''{}''::text[]; and more';"
         "\nDROP TABLE z;", ["other", "drop_table"]),
        ("DO $fn$ BEGIN EXECUTE $fn_inner$DROP TABLE not_me;$fn_inner$; "
         "END $fn$;\nDROP TABLE z;", ["other", "drop_table"]),
        ('UPDATE "begin" SET "end" = 1;\nDROP TABLE z;',
         ["other", "drop_table"]),
    ]
    for sql, want in cases:
        got = [f["stmt_type"] for f in P.parse_sql(sql)]
        assert got == want, sql


def test_wave12_vacuum_option_values():
    # the parenthesized grammar takes boolean VALUES: (FULL false) is a
    # plain vacuum, (FULL) / (FULL true) / (FULL, ANALYZE) are full
    full = ["VACUUM (FULL) t;", "VACUUM (FULL true) t;",
            "VACUUM (FULL, ANALYZE) t;", "VACUUM FULL;"]
    not_full = ["VACUUM (FULL false) t;", "VACUUM (FULL 0) t;",
                "VACUUM (FULL off) t;", "VACUUM (ANALYZE) t;"]
    for sql in full:
        f = P.parse_sql(sql)[0]
        assert f["stmt_type"] == "vacuum" and f["vacuum_full"], sql
    for sql in not_full:
        f = P.parse_sql(sql)[0]
        assert f["stmt_type"] == "vacuum" and not f["vacuum_full"], sql


def test_wave12_alter_forms():
    # SET DATA TYPE synonym classifies as alter_column_type
    f = P.parse_sql(
        "ALTER TABLE t ALTER COLUMN c SET DATA TYPE bigint;"
    )[0]
    assert f["commands"][0]["subtype"] == "alter_column_type"
    # unnamed constraints still carry their kinds
    f = P.parse_sql("ALTER TABLE t ADD CHECK (x > 0);")[0]
    assert f["commands"][0]["constraint_type"] == "check"
    f = P.parse_sql(
        "ALTER TABLE t ADD FOREIGN KEY (x) REFERENCES u;"
    )[0]
    assert f["commands"][0]["constraint_type"] == "foreign"
    # keyword-optional RENAME / LOCK forms
    f = P.parse_sql("ALTER TABLE t RENAME a TO b;")[0]
    assert f["stmt_type"] == "rename"
    f = P.parse_sql("LOCK a;")[0]
    assert f["stmt_type"] == "lock" and f["table"] == "a"
    # multi-command ALTER: constraint keywords inside a string default
    # must not cut the list; the volatile third command still surfaces
    f = P.parse_sql(
        "ALTER TABLE t ADD COLUMN a text DEFAULT 'NOT NULL; CHECK', "
        "ALTER COLUMN b TYPE int, "
        "ADD COLUMN c timestamptz DEFAULT clock_timestamp();"
    )[0]
    subs = [c["subtype"] for c in f["commands"]]
    assert subs == ["add_column", "alter_column_type", "add_column"]
    assert [c["default_volatile"] for c in f["commands"]] == [
        False, False, True,
    ]


# --- fuzz wave 13 (r09): FIVE real fixes — the well is still not dry ------
#
# 37 probes across identity/generated columns, typed-literal and
# bit-string constant forms, bracketed array constructors, doubled-quote
# identifiers, REINDEX boolean option values, rename-object kinds, and
# lock/truncate suffixes. Five forced recognizer fixes (analyzer/parse.py):
#
# * ``GENERATED BY DEFAULT AS IDENTITY`` — the DEFAULT token belongs to
#   the identity clause (CONSTR_IDENTITY, no RawExpr, so the reference's
#   extractDefaultExpr returns nil); _find_top_level_default matched it
#   and raised a FALSE volatile-default finding on every by-default
#   identity column;
# * ``DEFAULT ARRAY[1, 2, 3]`` — _split_top_level tracked parens but not
#   square brackets, so the top-level commas inside the array constructor
#   cut one ADD COLUMN command into three (the classification survived by
#   luck: ArrayExpr is volatile per the reference whatever the slice);
# * typed literals ``INTERVAL '1 day'`` / ``TIMESTAMP '2020-01-01'`` /
#   ``DOUBLE PRECISION '1.5'`` — AexprConst's ConstTypename Sconst form
#   is TypeCast(A_Const) to the real grammar → NON-volatile per
#   alter_add_column.go:112-134; all classified volatile (false R2);
# * bit-string constants ``B'1010'`` / ``X'FF'`` (BCONST/XCONST) and
#   Unicode-escape strings ``U&'…'`` — A_Const, classified volatile;
# * ``ALTER TABLE "we""ird" …`` — _IDENT's quoted alternative was blind
#   to doubled-quote escapes, so the statement failed recognition
#   entirely and EVERY ALTER danger rule silently skipped (a false
#   NEGATIVE across the whole rule set — the worst failure class).


def test_wave13_identity_columns_no_default_finding():
    # CONSTR_IDENTITY carries no RawExpr — no R2 finding in the reference
    cases = [
        "ALTER TABLE t ADD COLUMN id bigint GENERATED BY DEFAULT AS IDENTITY;",
        "ALTER TABLE t ADD COLUMN id bigint GENERATED ALWAYS AS IDENTITY;",
        "ALTER TABLE t ADD COLUMN id bigint GENERATED BY DEFAULT AS IDENTITY (START 10);",
        "ALTER TABLE t ADD COLUMN c int GENERATED ALWAYS AS (random()::int) STORED;",
    ]
    for sql in cases:
        f = P.parse_sql(sql)[0]
        assert f["stmt_type"] == "alter_table", sql
        cmd = f["commands"][0]
        assert cmd["subtype"] == "add_column", sql
        assert cmd["default_volatile"] is False, sql
    # ...but a REAL default after an identity-free GENERATED keyword in a
    # string must still extract: DEFAULT 'generated by default' is constant
    f = P.parse_sql(
        "ALTER TABLE t ADD COLUMN c text DEFAULT 'GENERATED BY DEFAULT';"
    )[0]
    assert f["commands"][0]["default_volatile"] is False


def test_wave13_bracket_aware_command_split():
    f = P.parse_sql("ALTER TABLE t ADD COLUMN c int[] DEFAULT ARRAY[1, 2, 3];")[0]
    assert [c["subtype"] for c in f["commands"]] == ["add_column"]
    # ArrayExpr is not A_Const/TypeCast-of-A_Const: volatile per reference
    assert f["commands"][0]["default_volatile"] is True
    # multi-command ALTER with an array constructor mid-list
    f = P.parse_sql(
        "ALTER TABLE t ADD COLUMN a int[] DEFAULT ARRAY[1, 2], "
        "ADD COLUMN b timestamptz DEFAULT clock_timestamp();"
    )[0]
    assert [c["subtype"] for c in f["commands"]] == ["add_column", "add_column"]
    assert [c["default_volatile"] for c in f["commands"]] == [True, True]


def test_wave13_typed_literal_and_bitstring_constants():
    nonvolatile = [
        "INTERVAL '1 day'",
        "TIMESTAMP '2020-01-01'",
        "DOUBLE PRECISION '1.5'",
        "pg_catalog.text 'x'",
        "TIMESTAMP(3) '2020-01-01 00:00:00.000'",
        "B'1010'",
        "X'FF'",
        "U&'d\\0061t'",
        "'now'::timestamptz",
    ]
    for expr in nonvolatile:
        assert not P.is_volatile_default(expr), expr
    volatile = [
        # suffix cast on a typed literal nests TypeCast(TypeCast(…)):
        # outer arg is not A_Const → volatile per the reference
        "INTERVAL '1 day'::interval",
        "'x'::text::text",
        # SQLValueFunction / NullIf / ArrayExpr nodes — volatile
        "CURRENT_TIMESTAMP",
        "CURRENT_DATE",
        "CURRENT_USER",
        "nullif(1, 2)",
        "ARRAY[1, 2, 3]",
        "(now() AT TIME ZONE 'utc')",
    ]
    for expr in volatile:
        assert P.is_volatile_default(expr), expr


def test_wave13_doubled_quote_identifiers():
    f = P.parse_sql('ALTER TABLE "we""ird" ADD COLUMN c int DEFAULT 1;')[0]
    assert f["stmt_type"] == "alter_table"
    assert f["table"] == 'we"ird'
    assert f["commands"][0]["subtype"] == "add_column"
    f = P.parse_sql('DROP TABLE "a""b;c";')[0]
    assert f["stmt_type"] == "drop_table" and f["table"] == 'a"b;c'
    f = P.parse_sql('ALTER INDEX "i""x" RENAME TO j;')[0]
    assert f["stmt_type"] == "rename" and f["rename_object"] == "index"


def test_wave13_already_correct_targets():
    # SET DEFAULT is AT_ColumnDefault, not AT_AddColumn — no R2 finding
    f = P.parse_sql("ALTER TABLE t ALTER COLUMN c SET DEFAULT now();")[0]
    assert f["commands"][0]["subtype"] == "set_default"
    # suffix clauses after a constant default don't corrupt extraction
    for sql in [
        "ALTER TABLE t ADD COLUMN c text COLLATE \"C\" DEFAULT 'x';",
        "ALTER TABLE t ADD COLUMN c text DEFAULT 'x' NOT NULL;",
        "ALTER TABLE t ADD COLUMN c text DEFAULT 'x' CHECK (c <> '');",
        "ALTER TABLE t ADD COLUMN c int DEFAULT 1 REFERENCES u (id);",
    ]:
        f = P.parse_sql(sql)[0]
        assert f["commands"][0]["default_volatile"] is False, sql
    # rename-object kinds: only table/column fire R9 (rename.go:31-52)
    f = P.parse_sql("ALTER TABLE t RENAME CONSTRAINT c1 TO c2;")[0]
    assert f["rename_object"] == "constraint"
    f = P.parse_sql("ALTER INDEX i RENAME TO j;")[0]
    assert f["rename_object"] == "index"
    # REINDEX parenthesized boolean option values (mirror of the wave-12
    # VACUUM (FULL false) form)
    assert P.parse_sql("REINDEX (CONCURRENTLY) TABLE t;")[0]["concurrent"]
    assert P.parse_sql("REINDEX (CONCURRENTLY true) TABLE t;")[0]["concurrent"]
    assert not P.parse_sql("REINDEX (CONCURRENTLY false) TABLE t;")[0]["concurrent"]
    assert not P.parse_sql("REINDEX (VERBOSE, CONCURRENTLY off) TABLE t;")[0]["concurrent"]
    # lock/truncate suffix forms
    f = P.parse_sql("LOCK TABLE a IN ACCESS EXCLUSIVE MODE NOWAIT;")[0]
    assert f["stmt_type"] == "lock" and f["table"] == "a"
    f = P.parse_sql("LOCK TABLE ONLY a, b IN SHARE MODE;")[0]
    assert f["stmt_type"] == "lock" and f["tables"] == ["a", "b"]
    f = P.parse_sql("TRUNCATE a RESTART IDENTITY CASCADE;")[0]
    assert f["stmt_type"] == "truncate" and f["table"] == "a"
    # quoted name that spells a keyword
    f = P.parse_sql(
        'CREATE UNIQUE INDEX CONCURRENTLY IF NOT EXISTS "CONCURRENTLY" ON t (a);'
    )[0]
    assert f["stmt_type"] == "create_index" and f["concurrent"]


# --- fuzz wave 14 (r09): ONE real fix + one refuted assumption ------------
#
# 10 probes across partition DDL, materialized views, CLUSTER, unary-plus
# and row-constructor defaults, and multi-name concurrent drops, each
# settled against a LIVE PostgreSQL 15 server rather than recalled docs:
#
# * ``ALTER TABLE … DETACH PARTITION … CONCURRENTLY`` (PG 14+) — refused
#   inside a transaction block by the server but routed into one: the
#   reference checks only IndexStmt/DropStmt (concurrent.go:27-36) and
#   this repo had extended the superset for REINDEX only. REAL FIX: the
#   flag now surfaces through the alter_table statement. The quoted-name
#   form DETACH PARTITION "CONCURRENTLY" is NOT the keyword.
# * ``REFRESH MATERIALIZED VIEW CONCURRENTLY`` — the wave's draft fix
#   routed it outside the transaction too, and the live probe REFUTED
#   the premise: PG 15 accepts the concurrent refresh inside a tx block
#   (BEGIN; REFRESH … CONCURRENTLY; COMMIT succeeds), so the form now
#   gets a typed classification (refresh_matview + concurrent flag) but
#   deliberately stays on the transactional path.
#
# The live-PG controls (DETACH refused in-tx / succeeds outside; REFRESH
# succeeds in-tx) are tests/test_pg_live.py::
# test_wave14_concurrent_forms_refused_in_tx_and_routed.


def test_wave14_refresh_matview_classified_but_not_routed():
    f = P.parse_sql("REFRESH MATERIALIZED VIEW CONCURRENTLY mv;")[0]
    assert f["stmt_type"] == "refresh_matview" and f["concurrent"]
    # NOT in the routing superset: PG 15 accepts it inside a tx block
    # (live probe, wave 14) — routing outside would drop the tx wrapper
    # and safety timeouts for nothing
    assert not P.contains_concurrent_op(
        "REFRESH MATERIALIZED VIEW CONCURRENTLY mv;"
    )
    f = P.parse_sql("REFRESH MATERIALIZED VIEW mv;")[0]
    assert f["stmt_type"] == "refresh_matview" and not f["concurrent"]
    # the keyword inside a string literal is not an operation
    assert not P.contains_concurrent_op(
        "SELECT 'REFRESH MATERIALIZED VIEW CONCURRENTLY mv';"
    )


def test_wave14_detach_partition_routing():
    sql = "ALTER TABLE t DETACH PARTITION p CONCURRENTLY;"
    f = P.parse_sql(sql)[0]
    assert f["stmt_type"] == "alter_table" and f["concurrent"]
    assert P.contains_concurrent_op(sql)
    for benign in [
        "ALTER TABLE t DETACH PARTITION p;",
        'ALTER TABLE t DETACH PARTITION "CONCURRENTLY";',
        "ALTER TABLE t ATTACH PARTITION p FOR VALUES FROM (1) TO (10);",
        "ALTER TABLE t ADD COLUMN c int DEFAULT 1;",
    ]:
        f = P.parse_sql(benign)[0]
        assert not f["concurrent"], benign
        assert not P.contains_concurrent_op(benign), benign


def test_wave14_already_correct_targets():
    # partition DDL carries no danger rule in the reference — 'other'
    # subtypes / create_table classification, no volatile extraction
    f = P.parse_sql("CREATE TABLE p PARTITION OF t FOR VALUES IN (1, 2);")[0]
    assert f["stmt_type"] == "create_table"
    # CLUSTER has no reference rule
    assert P.parse_sql("CLUSTER t USING idx;")[0]["stmt_type"] == "other"
    # unary plus and row constructors are A_Expr / RowExpr — volatile
    assert P.is_volatile_default("+1")
    assert P.is_volatile_default("ROW(1, 2)")
    # multi-name concurrent drop still routes
    assert P.contains_concurrent_op("DROP INDEX CONCURRENTLY IF EXISTS a, b;")


# --- fuzz wave 15 (r09): TWO real fixes in doNegate fidelity --------------
#
# 19 probes across unary-minus spacing/nesting, suffix-cast precedence,
# keyword-optional ALTER COLUMN forms, VALIDATE CONSTRAINT, SET
# [UN]LOGGED, INCLUDE/USING index forms and multi-name drops. The
# classifier rows were all already correct; both fixes are in the
# volatility grammar's unary-minus handling (analyzer/parse.py):
#
# * ``DEFAULT - 1`` / ``- -1`` / ``-(-1)`` / ``-(-(2))`` — doNegate
#   folds unary minus over an Integer/Float A_Const (through grouping
#   parens, repeatedly), so the real parser sees a plain constant; the
#   old matcher required the minus glued to the digits and classified
#   every spaced/nested form volatile (false R2 findings);
# * ``DEFAULT -1::int`` — the OPPOSITE direction, and the dangerous one:
#   ``::`` binds tighter than unary minus, so this is doNegate over a
#   TypeCast — an A_Expr the reference classifies VOLATILE — but the
#   old _CONST_RE's ``-?`` numeric prefix swallowed the sign next to a
#   cast suffix and called it a constant: a false NEGATIVE in a safety
#   rule. Numeric branches are now unsigned; negation routes through
#   _folds_to_numeric_const.


def test_wave15_donegate_folds_numeric_constants():
    for expr in ["- 1", "-1", "- -1", "-(-1)", "-( - 1 )", "-(-(2))",
                 "-.5", "- 1.5e3", "-0x1F", "(-1)", "((- 2))"]:
        assert not P.is_volatile_default(expr), expr


def test_wave15_minus_over_nonconstant_is_volatile():
    for expr in ["-1::int", "- 1::int", "-1e5::float", "-'x'", "-('x')",
                 "-TRUE", "-NULL", "+1", "-((1)::int)",
                 "-CAST(1 AS int)", "-now()", "- 1 + 2"]:
        assert P.is_volatile_default(expr), expr


def test_wave15_full_statement_level():
    f = P.parse_sql("ALTER TABLE t ADD COLUMN c int DEFAULT - 1;")[0]
    assert f["commands"][0]["default_volatile"] is False
    f = P.parse_sql("ALTER TABLE t ADD COLUMN c int DEFAULT -1::int;")[0]
    assert f["commands"][0]["default_volatile"] is True


def test_wave15_already_correct_targets():
    # keyword-optional COLUMN in ALTER … TYPE / SET NOT NULL (R4/R5
    # still fire without the COLUMN keyword)
    f = P.parse_sql("ALTER TABLE t ALTER c TYPE int;")[0]
    assert f["commands"][0]["subtype"] == "alter_column_type"
    f = P.parse_sql("ALTER TABLE t ALTER c SET NOT NULL;")[0]
    assert f["commands"][0]["subtype"] == "set_not_null"
    # VALIDATE CONSTRAINT is the R3 remediation — no finding subtype
    f = P.parse_sql("ALTER TABLE t VALIDATE CONSTRAINT c;")[0]
    assert f["commands"][0]["subtype"] == "other"
    # SET LOGGED/UNLOGGED rewrite the table but carry no reference rule
    for sql in ["ALTER TABLE t SET LOGGED;", "ALTER TABLE t SET UNLOGGED;"]:
        f = P.parse_sql(sql)[0]
        assert f["stmt_type"] == "alter_table"
        assert f["commands"][0]["subtype"] == "other", sql
    # INCLUDE / USING-method index forms keep table extraction
    for sql in ["CREATE INDEX i ON t (a) INCLUDE (b);",
                "CREATE INDEX i ON t USING gin (a);"]:
        f = P.parse_sql(sql)[0]
        assert f["stmt_type"] == "create_index" and f["table"] == "t", sql
    # UNIQUE constraint: R3 is CHECK/FK-only — kind still extracted
    f = P.parse_sql("ALTER TABLE t ADD CONSTRAINT u UNIQUE (a);")[0]
    assert f["commands"][0]["constraint_type"] == "unique"
    # RESTRICT suffix on multi-name drop
    f = P.parse_sql("DROP TABLE a, b RESTRICT;")[0]
    assert f["tables"] == ["a", "b"]


# --- fuzz wave 16 (r09): non-ASCII identifier fidelity — two fixes --------
#
# The PG lexer accepts ANY byte >= 0x80 as identifier start AND
# continuation (scan.l ident_start [A-Za-z_\200-\377]; every byte of a
# multibyte UTF-8 char is a high byte), and downcase_identifier folds
# ONLY ASCII A-Z in multibyte encodings (scansup.c). Two fixes:
#
# * _IDENT / dollar-quote tags / the typed-literal matcher were
#   ASCII-first: ``ALTER TABLE überweisung ADD COLUMN …`` failed
#   recognition entirely (stmt_type 'other'), silently skipping every
#   ALTER danger rule — the same false-negative class wave 13's
#   doubled-quote fix closed, for any non-ASCII-named relation;
# * normalize_name used Python str.lower(), which folds Ü→ü where the
#   server preserves it — finding table names diverged from the real
#   parser's on uppercase non-ASCII identifiers.


def test_wave16_non_ascii_identifiers_recognized():
    cases = [
        ("ALTER TABLE überweisung ADD COLUMN c timestamptz DEFAULT now();",
         "alter_table", "überweisung"),
        ("CREATE INDEX idx ON überweisung (a);", "create_index",
         "überweisung"),
        ("DROP TABLE überweisung;", "drop_table", "überweisung"),
        ("ALTER TABLE naïve_données RENAME TO v2;", "rename",
         "naïve_données"),
        ("LOCK таблица;", "lock", "таблица"),
    ]
    for sql, want_type, want_table in cases:
        f = P.parse_sql(sql)[0]
        assert f["stmt_type"] == want_type, sql
        assert f["table"] == want_table, sql
    # the danger rule actually fires now
    f = P.parse_sql(
        "ALTER TABLE überweisung ADD COLUMN c timestamptz DEFAULT now();"
    )[0]
    assert f["commands"][0]["default_volatile"] is True


def test_wave16_unicode_dollar_tags():
    got = [
        f["stmt_type"]
        for f in P.parse_sql("DO $täg$ DROP TABLE not_me; $täg$;\nDROP TABLE z;")
    ]
    assert got == ["other", "drop_table"]


def test_wave16_ascii_only_case_folding():
    # downcase_identifier folds ASCII only: Ü survives, B/E/R/… fold
    assert P.normalize_name("ÜBERWEISUNG") == "Überweisung"
    assert P.normalize_name("TaBlE") == "table"
    assert P.normalize_name('"MiXeD"') == "MiXeD"
    f = P.parse_sql("DROP TABLE ÜBERWEISUNG;")[0]
    assert f["table"] == "Überweisung"


# --- fuzz wave 17 (r09): TWO real fixes in the literal lexer --------------
#
# * string-literal newline continuation (scan.l {quotecontinue}): a
#   quote followed by whitespace/comments CONTAINING A NEWLINE and
#   another quote resumes the SAME literal — ``'long'␤'text'`` is ONE
#   A_Const — and the continuation inherits the opening token's E-string
#   escape mode. The continued form classified volatile (false R2) and
#   left two tokens for every downstream matcher. _strip_comments now
#   fuses continuations; is_volatile_default also scans them directly.
#   Same-line adjacency ('a' 'b', no newline) is NOT continuation and
#   stays volatile/broken exactly like the server's parse error.
# * _strip_comments was E-string-blind: its inline quote scanner knew
#   only '' doubling, so ``E'it\'s --x'`` ended at the escaped quote and
#   the -- swallowed the literal's tail — corrupting the stripped
#   statement every classifier regex matches against (the command list
#   after such a literal could silently lose findings). All quote forms
#   now route through the one _skip_quoted scanner (the wave-10
#   unification, finally applied to the last holdout).


def test_wave17_literal_continuation_is_one_constant():
    for expr in ["'a'\n'b'", "'a'\n'b'::text", "'a'\n  'b'\n 'c'",
                 "'it''s'\n'fine'", "E'a\\n'\n'b'", "'a'\r\n'b'", "''\n'y'"]:
        assert not P.is_volatile_default(expr), expr
    for expr in ["'a' 'b'", "'a'\n'b'::text::text", "'a'\nnow()",
                 "'a'\n'b' || 'c'"]:
        assert P.is_volatile_default(expr), expr
    f = P.parse_sql("ALTER TABLE t ADD COLUMN c text DEFAULT 'long'\n'text';")[0]
    assert f["commands"][0]["default_volatile"] is False
    # comments are legal inside the continuation gap
    f = P.parse_sql(
        "ALTER TABLE t ADD COLUMN c text DEFAULT 'a' -- c\n'b' NOT NULL;"
    )[0]
    assert f["commands"][0]["default_volatile"] is False
    f = P.parse_sql("ALTER TABLE t ADD COLUMN c text DEFAULT 'a' 'b';")[0]
    assert f["commands"][0]["default_volatile"] is True


def test_wave17_strip_comments_escape_strings():
    s = P._strip_comments(
        "ALTER TABLE t ADD COLUMN c text DEFAULT E'it\\'s -- not a comment'"
        " NOT NULL;"
    )
    assert "not a comment" in s and "NOT NULL" in s
    # an escaped quote inside an E-string no longer corrupts the command
    # list that follows it
    f = P.parse_sql(
        "ALTER TABLE t ADD COLUMN a text DEFAULT E'\\'', "
        "ADD COLUMN b timestamptz DEFAULT now();"
    )[0]
    assert [(c["subtype"], c["default_volatile"]) for c in f["commands"]] == [
        ("add_column", False), ("add_column", True),
    ]
    # double-quoted identifiers and dollar bodies still verbatim
    assert P._strip_comments('SELECT "a  --b", $x$ keep -- this $x$;') == (
        'SELECT "a  --b", $x$ keep -- this $x$;'
    )


# --- fuzz wave 18 (r09): ONE cosmetic fix — the tail is thinning ----------
#
# 10 probes across constraint-attribute ordering (NO INHERIT NOT VALID,
# NOT VALID after key actions), combined IF EXISTS + ONLY relation
# modifiers, descendant-star forms on TRUNCATE, quoted index names with
# spaces, multi-command NOT NULL toggles, and DROP CONSTRAINT. One fix,
# cosmetic only: ``DROP CONSTRAINT c`` captured CONSTRAINT as a column
# name via the optional COLUMN keyword and classified drop_column — no
# rule fires on either subtype, but the command record was wrong. Now
# drop_constraint.


def test_wave18_drop_constraint_subtype():
    f = P.parse_sql("ALTER TABLE t DROP CONSTRAINT IF EXISTS c CASCADE;")[0]
    assert f["commands"][0]["subtype"] == "drop_constraint"
    f = P.parse_sql("ALTER TABLE t DROP COLUMN IF EXISTS c CASCADE;")[0]
    assert f["commands"][0]["subtype"] == "drop_column"
    assert f["commands"][0]["column"] == "c"
    # keyword-optional column form still wins for non-CONSTRAINT names
    f = P.parse_sql("ALTER TABLE t DROP c;")[0]
    assert f["commands"][0]["subtype"] == "drop_column"


def test_wave18_already_correct_targets():
    # constraint attributes in either legal order keep NOT VALID
    f = P.parse_sql(
        "ALTER TABLE t ADD CONSTRAINT c CHECK (x > 0) NO INHERIT NOT VALID;"
    )[0]
    assert f["commands"][0]["skip_validation"] is True
    f = P.parse_sql(
        "ALTER TABLE t ADD CONSTRAINT fk FOREIGN KEY (a) REFERENCES u (b)"
        " ON DELETE CASCADE NOT VALID;"
    )[0]
    assert f["commands"][0]["skip_validation"] is True
    # combined IF EXISTS + ONLY relation modifiers
    f = P.parse_sql(
        "ALTER TABLE IF EXISTS ONLY t ADD COLUMN c timestamptz DEFAULT now();"
    )[0]
    assert f["table"] == "t"
    assert f["commands"][0]["default_volatile"] is True
    # descendant star after a qualified name
    f = P.parse_sql("TRUNCATE a.b *;")[0]
    assert f["stmt_type"] == "truncate" and f["table"] == "a.b"
    f = P.parse_sql("TRUNCATE ONLY a, b * CASCADE;")[0]
    assert f["tables"] == ["a", "b"]
    # quoted index name containing a space
    f = P.parse_sql('CREATE INDEX CONCURRENTLY "my idx" ON t (a);')[0]
    assert f["stmt_type"] == "create_index" and f["concurrent"]
    # paired NOT NULL toggles in one command list
    f = P.parse_sql(
        "ALTER TABLE t ALTER COLUMN c SET NOT NULL, ALTER COLUMN d DROP NOT NULL;"
    )[0]
    assert [c["subtype"] for c in f["commands"]] == [
        "set_not_null", "drop_not_null",
    ]


# --- fuzz wave 19 (r09): ZERO new fixes — dry-well counter at 1 -----------
#
# 14 probes across multi-word ConstTypename literals (TIMESTAMP WITH
# TIME ZONE '…'), nested grouping + suffix casts, CREATE SCHEMA
# schema-element lists (embedded CREATE INDEX is inside
# CreateSchemaStmt.schemaElts — the reference's Node_IndexStmt cast
# fails, so no R1 finding; anchored classification agrees), GRANT /
# POLICY / two-phase-commit statements, generated tsvector columns, and
# GREATEST/COALESCE volatility. Every probe already correct; frozen per
# the wave convention. The dry-well declaration needs one more
# consecutive zero-fix wave.


def test_wave19_already_correct_targets():
    for expr in ["TIMESTAMP WITH TIME ZONE '2020-01-01'", "((1))::int",
                 "DOUBLE PRECISION '1.5'", "(B'1')"]:
        assert not P.is_volatile_default(expr), expr
    for expr in ["TIMESTAMP WITH TIME ZONE '2020-01-01'::timestamptz",
                 "GREATEST(1, 2)", "COALESCE('a', 'b')"]:
        assert P.is_volatile_default(expr), expr
    # schema-element lists stay ONE unclassified statement: the embedded
    # CREATE INDEX is not a top-level IndexStmt (rules.go parity)
    fs = P.parse_sql(
        "CREATE SCHEMA s CREATE TABLE t (i int) CREATE INDEX i1 ON t (i);"
    )
    assert [f["stmt_type"] for f in fs] == ["other"]
    # generated tsvector column: commas/strings inside the expression
    # stay inside one add_column command, no default extracted
    f = P.parse_sql(
        "ALTER TABLE t ADD COLUMN c tsvector GENERATED ALWAYS AS"
        " (to_tsvector('english', body)) STORED;"
    )[0]
    assert [c["subtype"] for c in f["commands"]] == ["add_column"]
    assert f["commands"][0]["default_volatile"] is False
    for sql, want in [
        ("GRANT SELECT ON t TO u;", "other"),
        ("CREATE POLICY p ON t USING (x IN (SELECT y FROM z));", "other"),
        ("COMMIT PREPARED 'tx1';", "other"),
    ]:
        assert P.parse_sql(sql)[0]["stmt_type"] == want, sql


# --- fuzz wave 20 (r09): ZERO new fixes — DRY-WELL DECLARED ----------------
#
# 26 probes across two batches: constraint-attribute combinations
# (DEFERRABLE INITIALLY DEFERRED NOT VALID), EXCLUDE / PRIMARY KEY USING
# INDEX constraint kinds, ALTER COLUMN ADD GENERATED identity, SET
# SCHEMA / OWNER TO, quoted-keyword rename targets, UNLOGGED tables,
# domains, VACUUM option combinations ((FULL TRUE, ANALYZE FALSE),
# (PARALLEL 4, FULL)), quoted-schema qualified names, PREPARE/EXECUTE/
# EXPLAIN wrappers, exotic whitespace (\t\f\v), case soup, empty
# statements, expression indexes, multi-index drops, ';'-adjacent
# statements, geometric literals full of commas+parens, dollar bodies
# with decoy inner tags, and trigger argument lists carrying ';' and
# DDL text. Every probe already correct.
#
# Waves 19 and 20 are the two consecutive zero-fix waves the convention
# requires: THE WELL IS DECLARED DRY for the probing methodology —
# grammar-area sweeps no longer surface recognizer divergences. The
# standing bounded-fidelity note is unchanged: the recognizer is scoped
# to what the nine danger rules inspect, and genuinely novel grammar
# (future PG releases, extension syntax) re-opens the well by
# definition.


def test_wave20_already_correct_targets():
    f = P.parse_sql(
        "ALTER TABLE t ADD CONSTRAINT fk FOREIGN KEY (a) REFERENCES u"
        " DEFERRABLE INITIALLY DEFERRED NOT VALID;"
    )[0]
    assert f["commands"][0]["skip_validation"] is True
    # EXCLUDE / PRIMARY-USING-INDEX kinds recorded; R3 is CHECK/FK-only
    f = P.parse_sql("ALTER TABLE t ADD CONSTRAINT e EXCLUDE USING gist (a WITH &&);")[0]
    assert f["commands"][0]["constraint_type"] == "exclude"
    f = P.parse_sql("ALTER TABLE t ADD CONSTRAINT pk PRIMARY KEY USING INDEX i;")[0]
    assert f["commands"][0]["constraint_type"] == "primary"
    # ALTER COLUMN ADD GENERATED is AT_AddIdentity — no rule
    f = P.parse_sql("ALTER TABLE t ALTER COLUMN c ADD GENERATED ALWAYS AS IDENTITY;")[0]
    assert f["commands"][0]["subtype"] == "other"
    # exotic whitespace and case soup
    f = P.parse_sql("ALTER TABLE t\tADD\fCOLUMN\vc int DEFAULT\t1;")[0]
    assert f["commands"][0]["subtype"] == "add_column"
    assert f["commands"][0]["default_volatile"] is False
    f = P.parse_sql("alter table T add column C timestamptz default NOW();")[0]
    assert f["table"] == "t" and f["commands"][0]["default_volatile"] is True
    # empty statements between semicolons don't shift the stream
    fs = P.parse_sql("ALTER TABLE t ADD COLUMN c int; ;; ALTER TABLE t DROP COLUMN c;")
    assert [f["stmt_type"] for f in fs] == ["alter_table", "alter_table"]
    # VACUUM option combinations
    assert P.parse_sql("VACUUM (FULL TRUE, ANALYZE FALSE) t;")[0]["vacuum_full"]
    assert P.parse_sql("VACUUM (PARALLEL 4, FULL) t;")[0]["vacuum_full"]
    assert P.parse_sql("TRUNCATE t; VACUUM FULL; LOCK z;")[1]["vacuum_full"]
    # quoted-schema qualified truncate target
    assert P.parse_sql('TRUNCATE "a.b".c;')[0]["table"] == "a.b.c"
    # geometric literal carrying commas+parens stays one constant
    f = P.parse_sql("ALTER TABLE t ADD COLUMN c box DEFAULT '((0,0),(1,1))';")[0]
    assert [c["subtype"] for c in f["commands"]] == ["add_column"]
    assert f["commands"][0]["default_volatile"] is False
    # dollar default with a decoy inner tag
    f = P.parse_sql("ALTER TABLE t ADD COLUMN c text DEFAULT $tag$v$notag$x$tag$;")[0]
    assert f["commands"][0]["default_volatile"] is False
    # trigger argument lists carrying ';' and DDL text stay one 'other'
    fs = P.parse_sql(
        "CREATE TRIGGER tr AFTER INSERT ON t FOR EACH ROW"
        " EXECUTE FUNCTION f(';', 'DROP TABLE z;');"
    )
    assert [f["stmt_type"] for f in fs] == ["other"]
    # ';'-adjacent statements split cleanly
    fs = P.parse_sql("DROP INDEX CONCURRENTLY i1;DROP TABLE z;")
    assert [f["stmt_type"] for f in fs] == ["drop_index", "drop_table"]
    assert fs[0]["concurrent"] is True


# --- ADVICE r09: quotecontinue's newline must be real whitespace ----------
#
# scan.l {whitespace_with_newline} admits only spaces and -- comments
# around its newline; a newline whose only occurrence sits INSIDE a
# /* */ block comment is comment content, so 'a' /* \n */ 'b' is two
# adjacent literals (a PG syntax error), never the fused 'ab'.


def test_advice_r09_block_comment_newline_does_not_fuse():
    # the only newline is inside the block comment: NO fusion
    assert P._strip_comments("SELECT 'a' /* \n */ 'b';") == (
        "SELECT 'a' 'b';"
    )
    # and the non-fused adjacency stays volatile as a DEFAULT
    f = P.parse_sql(
        "ALTER TABLE t ADD COLUMN c text DEFAULT 'a' /* \n */ 'b';"
    )[0]
    assert f["commands"][0]["default_volatile"] is True
    # a real newline outside the comment still fuses (documented
    # divergence: PG rejects block comments in the gap entirely —
    # conservative on invalid SQL)
    assert P._strip_comments("SELECT 'a' /* c */ \n 'b';") == (
        "SELECT 'ab';"
    )
    # line-comment gaps keep fusing (their newline is real whitespace)
    assert P._strip_comments("SELECT 'a' -- c\n'b';") == "SELECT 'ab';"
