"""PostgreSQL DDL statement splitting + feature extraction (pure Python).

The reference parses migrations with the real PostgreSQL parser via CGO
(reference internal/parser/parser.go:7,24) and its rules pattern-match
typed AST nodes. CGO is unavailable from PySpark workers, so — per
SURVEY.md §4.2 — we implement a focused recognizer scoped to exactly what
the 9 danger rules inspect, plus proper statement splitting (quotes,
dollar-quoting, nested comments), mirroring ParseResult's per-statement
stream (reference internal/parser/parser.go:11-14) and byte-offset
statement extraction (reference internal/analyzer/rules.go:61-80).

The output of :func:`extract_features` matches schemas.STATEMENT_FEATURES
field-for-field; :func:`parse_sql` is the row-level function wrapped by the
analyzer's Arrow-batched pandas UDF.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


# --- statement splitting ---------------------------------------------------


def split_statements(sql: str) -> list[tuple[int, str]]:
    """Split SQL into (start_offset, statement_text) at top-level ';'.

    State machine over: single quotes (with '' escapes and E'\\' escapes),
    double-quoted identifiers, $tag$ dollar quoting, line comments,
    nested block comments (PostgreSQL nests /* */), and PG 14+
    SQL-standard function bodies (fuzz round 7: ``CREATE FUNCTION ...
    BEGIN ATOMIC stmt; stmt; END;`` is ONE statement — the body is bare
    SQL, not a dollar-quoted literal, so without body tracking its
    internal semicolons split one CREATE into fragments and the
    danger-rule scan runs on garbage). Mirrors the statement stream +
    offset slicing of the reference
    (internal/parser/parser.go:29-32, internal/analyzer/rules.go:61-80).
    """
    statements: list[tuple[int, str]] = []
    n = len(sql)
    # psql strips a leading UTF-8 BOM before the server ever sees the
    # file (fuzz round 6 wave 3): without this, the FIRST statement of a
    # BOM-carrying dump classifies as 'other' and its danger rules are
    # silently skipped while PostgreSQL happily executes it
    i = 1 if sql.startswith("﻿") else 0
    start = i
    # BEGIN ATOMIC ... END nesting depth. While > 0, ';' does not end
    # the statement. CASE expressions inside a body pair with their own
    # END, so CASE also increments; nested BEGIN ATOMIC bodies (a
    # CREATE FUNCTION inside a body) increment via the BEGIN path.
    atomic_depth = 0
    # Parenthesis depth (outside quotes/comments/dollar bodies): a ';'
    # inside parens never ends a statement — psql and the real grammar
    # agree (fuzz wave 11: CREATE RULE ... DO INSTEAD (stmt; stmt);
    # split into fragments). Valid SQL balances parens per statement;
    # the depth is clamped at 0 so a stray ')' in malformed input
    # cannot swallow the rest of the file.
    paren_depth = 0

    def flush(end: int) -> bool:
        """Returns True when the flushed statement is COPY ... FROM
        STDIN, whose inline payload follows until a ``\\.`` line."""
        nonlocal start
        text = sql[start:end].strip()
        # comment-only segments (trailing "-- done", "/* x */;" between
        # semicolons) are not statements — the real parser's statement
        # stream skips them (r03 fuzz fix: they previously surfaced as
        # phantom stmt_type="other" rows and shifted stmt_index)
        stripped = _strip_comments(text) if text else ""
        if stripped:
            statements.append((start, text))
        start = end + 1
        return bool(
            re.match(r"COPY\b", stripped, re.IGNORECASE)
            and re.search(r"\bFROM\s+STDIN\b", stripped, re.IGNORECASE)
        )

    def skip_copy_payload(pos: int) -> int:
        """pg_dump-style inline COPY data (r04 fuzz round 2): everything
        after the COPY ... FROM STDIN; line up to the terminator line
        ``\\.`` is payload, not SQL — a data row containing ';' or
        'DROP TABLE' must neither split nor classify. psql semantics:
        data starts on the NEXT line; the terminator is a line holding
        exactly ``\\.``. Line boundaries are [\\r\\n] (r06 fuzz round:
        LF, CRLF, and classic-Mac \\r-only dumps all terminate — with
        '\\n'-only matching, everything after the first COPY block of a
        \\r-only file silently vanished from analysis)."""
        nonlocal start
        m_eol = re.search(r"[\r\n]", sql[pos:])
        if not m_eol:
            start = n
            return n
        eol = pos + m_eol.start()
        m = re.search(
            r"(?:^|[\r\n])\\\.[ \t]*(?:\r\n|[\r\n]|$)", sql[eol + 1:]
        )
        if not m:
            start = n
            return n
        after = eol + 1 + m.end()
        start = after
        return after

    while i < n:
        ch = sql[i]
        nxt = sql[i + 1] if i + 1 < n else ""
        if ch == "-" and nxt == "-":
            # PostgreSQL's lexer ends line comments at [\n\r] (scan.l's
            # {newline}); matching only '\n' made a \r-only file's first
            # comment swallow every later statement (r06 fuzz round)
            m_eol = re.search(r"[\r\n]", sql[i:])
            i = n if m_eol is None else i + m_eol.end()
        elif ch == "/" and nxt == "*":
            depth = 1
            i += 2
            while i < n and depth:
                if sql.startswith("/*", i):
                    depth += 1
                    i += 2
                elif sql.startswith("*/", i):
                    depth -= 1
                    i += 2
                else:
                    i += 1
        elif ch == "'" or (
            ch in "eE"
            and nxt == "'"
            # E'...' is an escape string only when the E BEGINS a token
            # (scan.l xestart): juxtaposed to an identifier/keyword tail
            # (LIKE'pat', CASE'x') the quote opens an ORDINARY string
            # whose backslash is literal — treating it as an E-string
            # swallowed the following statement (fuzz round 6 wave 2)
            and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] in '_$"'))
        ):
            escaped_literal = ch in "eE"
            i += 2 if escaped_literal else 1
            while i < n:
                if escaped_literal and sql[i] == "\\":
                    i += 2
                elif sql[i] == "'":
                    if i + 1 < n and sql[i + 1] == "'":
                        i += 2
                    else:
                        i += 1
                        break
                else:
                    i += 1
        elif ch == '"':
            i += 1
            while i < n:
                if sql[i] == '"':
                    i += 1
                    break
                i += 1
        elif ch == "$":
            m = re.match(r"\$([A-Za-z_\u0080-\U0010ffff][\w\u0080-\U0010ffff]*)?\$", sql[i:])
            if m:
                tag = m.group(0)
                close = sql.find(tag, i + len(tag))
                i = n if close == -1 else close + len(tag)
            else:
                i += 1
        elif ch == "(":
            paren_depth += 1
            i += 1
        elif ch == ")":
            paren_depth = max(0, paren_depth - 1)
            i += 1
        elif ch == ";":
            if atomic_depth or paren_depth:
                i += 1
            elif flush(i):
                i = skip_copy_payload(i + 1)
            else:
                i += 1
        elif ch.isalpha() or ch == "_":
            # whole-word scan so keyword tracking never fires on a
            # substring (identifiers may continue with $ — leave the $
            # to the dollar-quote branch, matching the old behavior)
            j = i + 1
            while j < n and (sql[j].isalnum() or sql[j] == "_"):
                j += 1
            word = sql[i:j].upper()
            if word == "BEGIN":
                m_at = re.match(r"\s+ATOMIC\b", sql[j:], re.IGNORECASE)
                if m_at:
                    atomic_depth += 1
                    j += m_at.end()
            elif atomic_depth:
                if word == "CASE":
                    atomic_depth += 1
                elif word == "END":
                    atomic_depth -= 1
            i = j
        else:
            i += 1
    flush(n)
    return statements


# --- identifier handling ---------------------------------------------------

# unquoted identifier start/continuation: the PG lexer accepts ANY byte
# >= 0x80 (scan.l ident_start [A-Za-z_\200-\377], and multibyte UTF-8
# chars are all high bytes) — ASCII-only classes made
# ``ALTER TABLE überweisung …`` fail recognition entirely, silently
# skipping every ALTER danger rule (fuzz wave 16)
_ID_START = r"A-Za-z_\u0080-\U0010ffff"
_ID_CONT = r"\w$\u0080-\U0010ffff"
_IDENT = rf'(?:"(?:[^"]|"")*"|[{_ID_START}][{_ID_CONT}]*)'
_QNAME = rf"{_IDENT}(?:\s*\.\s*{_IDENT})?"


def normalize_name(raw: str) -> str:
    """Lowercase unquoted identifier parts, strip quotes from quoted ones —
    PostgreSQL case-folding, so rule output matches the real parser's
    (reference internal/analyzer/rules.go:48-58). Dots INSIDE quoted
    identifiers are part of the name, not qualifiers (r03 fuzz fix:
    ``"a.b"`` is one identifier)."""
    raw = raw.strip()
    parts: list[str] = []
    cur: list[str] = []
    i, n = 0, len(raw)
    while i < n:
        ch = raw[i]
        if ch == '"':
            j = i + 1
            while j < n:
                if raw[j] == '"':
                    if j + 1 < n and raw[j + 1] == '"':
                        j += 2
                        continue
                    j += 1
                    break
                j += 1
            cur.append(raw[i:j])
            i = j
        elif ch == ".":
            parts.append("".join(cur).strip())
            cur = []
            i += 1
        else:
            cur.append(ch)
            i += 1
    parts.append("".join(cur).strip())
    out = []
    for part in parts:
        if part.startswith('"') and part.endswith('"') and len(part) >= 2:
            out.append(part[1:-1].replace('""', '"'))
        else:
            # PG's downcase_identifier folds ONLY ASCII A-Z in multibyte
            # encodings (src/backend/parser/scansup.c) — ÜBERWEISUNG
            # keeps its Ü; Python .lower() would fold it (fuzz wave 16)
            out.append(
                "".join(
                    chr(ord(c) + 32) if "A" <= c <= "Z" else c for c in part
                )
            )
    return ".".join(out)


def _strip_comments(stmt: str) -> str:
    """Remove comments and collapse whitespace for pattern matching.
    String literals, double-quoted identifiers, and dollar-quoted bodies
    are preserved VERBATIM — comment markers and whitespace runs inside
    them are content, not syntax (r03 fuzz fixes: ``"a--b"`` is an
    identifier, not a line comment; whitespace inside quotes must not
    collapse)."""
    out: list[str] = []
    i, n = 0, len(stmt)

    def pad() -> None:
        if out and out[-1] != " ":
            out.append(" ")

    while i < n:
        ch = stmt[i]
        nxt = stmt[i + 1] if i + 1 < n else ""
        if ch == "-" and nxt == "-":
            # [\r\n] boundary, same r06 fix as the splitter: a \r-only
            # statement's line comment must not swallow its tail
            m_eol = re.search(r"[\r\n]", stmt[i:])
            i = n if m_eol is None else i + m_eol.end()
            pad()
        elif ch == "/" and nxt == "*":
            depth, i = 1, i + 2
            while i < n and depth:
                if stmt.startswith("/*", i):
                    depth, i = depth + 1, i + 2
                elif stmt.startswith("*/", i):
                    depth, i = depth - 1, i + 2
                else:
                    i += 1
            pad()
        elif (j := _skip_quoted(stmt, i)) is not None:
            # ONE scanner for all quote forms ('\u2026', E'\u2026', "\u2026", $tag$\u2026$):
            # the old inline '-branch was E-string-blind, so E'it\'s --x'
            # ended at the escaped quote and the -- swallowed the
            # literal's tail \u2014 corrupting the stripped statement every
            # rule matches against (fuzz wave 17)
            chunk = stmt[i:j]
            i = j
            if chunk.endswith("'") and len(chunk) >= 2 and (
                chunk.startswith("'")
                or (chunk[:1] in "eE" and chunk[1:2] == "'")
            ):
                # literal continuation (scan.l {quotecontinue}):
                # whitespace/comments containing a newline followed by
                # another quote resume the SAME literal in the SAME
                # escape mode \u2014 fuse so downstream matchers see the one
                # A_Const the real lexer produces (fuzz wave 17).
                # (Nested block comments inside the gap stop the fusion
                # \u2014 conservative: the parts stay separate tokens.)
                escaped_mode = chunk[:1] in "eE"
                body = [chunk[:-1]]
                while True:
                    m = _QUOTE_CONT_RE.match(stmt, i)
                    # the qualifying newline must sit OUTSIDE block
                    # comments: scan.l's {whitespace_with_newline}
                    # admits only spaces and -- comments around its
                    # newline, so 'a' /* \n */ 'b' is two adjacent
                    # literals (a PG syntax error), never 'ab'
                    # (ADVICE r09)
                    if m is None or not re.search(
                        r"[\r\n]", _BLOCK_COMMENT_RE.sub(" ", m.group(0))
                    ):
                        break
                    k = m.end()  # just past the continuation's quote
                    j2 = k
                    closed = False
                    while j2 < n:
                        if escaped_mode and stmt[j2] == "\\":
                            j2 += 2
                        elif stmt[j2] == "'":
                            if stmt[j2 + 1:j2 + 2] == "'":
                                j2 += 2
                            else:
                                j2 += 1
                                closed = True
                                break
                        else:
                            j2 += 1
                    body.append(stmt[k:j2 - 1] if closed else stmt[k:j2])
                    i = j2
                    if not closed:
                        break
                out.append("".join(body) + "'")
            else:
                out.append(chunk)
        elif ch.isspace():
            pad()
            i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out).strip()


# continuation gap: horizontal/vertical whitespace, line comments and
# (non-nested) block comments, ending at a quote. The caller checks the
# gap contains a newline OUTSIDE block-comment spans \u2014 {quotecontinue}
# requires one, and a newline whose only occurrence is inside /* */ is
# comment content, not whitespace (ADVICE r09). Documented divergence,
# conservative on invalid SQL: PG's {whitespace_with_newline} admits no
# block comments at all, so 'a' /* c */ \n 'b' (real newline AND a
# block comment in the gap) is a PG syntax error; this scanner fuses it
# \u2014 harmless, since such input never reaches a healthy migration run.
_QUOTE_CONT_RE = re.compile(
    r"(?:[ \t\r\n]|--[^\r\n]*|/\*(?:[^*]|\*(?!/))*\*/)*'"
)

# non-nested block-comment spans, for masking a continuation gap before
# the newline check (nested /*\u2026*/ already stop the fusion upstream)
_BLOCK_COMMENT_RE = re.compile(r"/\*(?:[^*]|\*(?!/))*\*/")


# --- per-statement feature extraction --------------------------------------


@dataclass
class AlterCommand:
    subtype: str | None = None
    column: str | None = None
    has_default: bool = False
    default_volatile: bool = False
    constraint_type: str | None = None
    skip_validation: bool = False

    def as_dict(self) -> dict:
        return {
            "subtype": self.subtype,
            "column": self.column,
            "has_default": self.has_default,
            "default_volatile": self.default_volatile,
            "constraint_type": self.constraint_type,
            "skip_validation": self.skip_validation,
        }


@dataclass
class StatementFeatures:
    stmt_index: int
    stmt_sql: str
    stmt_type: str = "other"
    table: str | None = None
    tables: list[str] = field(default_factory=list)
    concurrent: bool = False
    vacuum_full: bool = False
    if_exists: bool = False
    rename_object: str | None = None
    commands: list[AlterCommand] = field(default_factory=list)

    def as_dict(self) -> dict:
        return {
            "stmt_index": self.stmt_index,
            "stmt_sql": self.stmt_sql,
            "stmt_type": self.stmt_type,
            "table": self.table,
            "tables": self.tables,
            "concurrent": self.concurrent,
            "vacuum_full": self.vacuum_full,
            "if_exists": self.if_exists,
            "rename_object": self.rename_object,
            "commands": [c.as_dict() for c in self.commands],
        }


_CONST_RE = re.compile(
    r"""^(?:
        '(?:[^']|'')*'            # string literal
        # E-string and dollar-quoted literals are the SAME A_Const
        # string node to the real parser (fuzz wave 10: both previously
        # classified volatile and raised false R2 findings)
      | [eE]'(?:[^'\\]|\\.|'')*'
        # (dollar-quoted literals are checked in code — a regex
        # backreference body backtracks ACROSS separate $$…$$ strings,
        # misreading '$$a$$ || $$b$$' as one constant)
        # numeric literal: 42, 3.5, 4., .001, 5e2, 1.925e-3 — all A_Const
        # to the real parser (r03 fuzz fix: scientific/leading-dot forms
        # were misclassified volatile). PostgreSQL 16 adds underscore
        # digit separators (1_000_000) and hex/octal/binary forms
        # (0x1F, 0o17, 0b101) — equally A_Const to the real grammar
        # (fuzz round 6 wave 4)
        # UNSIGNED numerics only (fuzz wave 15): the grammar applies
        # ``::`` BEFORE unary minus, so ``-1::int`` is doNegate over a
        # TypeCast — an A_Expr the reference classifies VOLATILE; the
        # old ``-?`` prefix here made it a constant, a false NEGATIVE
        # in a safety rule. Negated constants (``-1``, ``- 1``,
        # ``-(-1)`` — doNegate folds each) take the dedicated
        # _folds_to_numeric_const path in is_volatile_default.
      | 0[xX][0-9A-Fa-f](?:_?[0-9A-Fa-f])*
      | 0[oO][0-7](?:_?[0-7])*
      | 0[bB][01](?:_?[01])*
      | (?:\d(?:_?\d)*\.?(?:\d(?:_?\d)*)?|\.\d(?:_?\d)*)(?:[eE][+-]?\d(?:_?\d)*)?
        # bit-string (B'1010' / X'FF') and Unicode-escape (U&'…')
        # literals are BCONST / XCONST / Sconst — all A_Const to the
        # real parser (fuzz wave 13: both classified volatile and
        # raised false R2 findings)
      | [bBxX]'[^']*'
      | [uU]&'(?:[^']|'')*'
      | TRUE | FALSE | NULL
    )
    (?:\s*::\s*(?:"[^"]*"|[\w\s.])+     # optional ::type cast — quoted,
        (?:\(\d+(?:,\s*\d+)?\))?        # schema-qualified, multi-word,
        (?:\s*\[\s*\d*\s*\])*           # precision, and array types are
    )?                                  # all the same TypeCast node
                                        # (fuzz wave 11: '{}'::text[]
                                        # classified volatile)
    $""",
    re.IGNORECASE | re.VERBOSE,
)

# the same ::type suffix as a standalone pattern (code-side checks)
_CAST_SUFFIX_RE = re.compile(
    r'^::\s*(?:"[^"]*"|[\w\s.])+(?:\(\d+(?:,\s*\d+)?\))?'
    r"(?:\s*\[\s*\d*\s*\])*$"
)

_CAST_RE = re.compile(r"^CAST\s*\(\s*(.+)\s+AS\s+[^)]+\)$", re.IGNORECASE | re.DOTALL)

# bare unsigned numeric constant — the subset of _CONST_RE doNegate can
# fold a unary minus into (Integer / Float A_Const only; no cast suffix,
# no string/bool/NULL — doNegate wraps those in an A_Expr instead)
_BARE_NUM_RE = re.compile(
    r"""^(?:
        0[xX][0-9A-Fa-f](?:_?[0-9A-Fa-f])*
      | 0[oO][0-7](?:_?[0-7])*
      | 0[bB][01](?:_?[01])*
      | (?:\d(?:_?\d)*\.?(?:\d(?:_?\d)*)?|\.\d(?:_?\d)*)(?:[eE][+-]?\d(?:_?\d)*)?
    )$""",
    re.VERBOSE,
)


def _scan_string_continuation(expr: str) -> int | None:
    """Length of a leading string literal INCLUDING newline-separated
    continuations, or None when ``expr`` does not start with one. The PG
    lexer's {quotecontinue} rule (scan.l) resumes the SAME literal when
    a quote is followed by whitespace containing a newline and another
    quote — ``'a'␤'b'`` is ONE A_Const — and the continuation inherits
    the E-string escape mode of the opening token (fuzz wave 17: the
    continued form classified volatile and raised a false R2 finding).
    Comments may legally sit inside the continuation whitespace, but
    classify-time expressions are already comment-stripped."""
    n = len(expr)
    i = 0
    escaped = False
    if expr[:1] in "eE" and expr[1:2] == "'":
        escaped = True
        i = 1
    if expr[i:i + 1] != "'":
        return None
    i += 1
    while True:
        closed = False
        while i < n:
            if escaped and expr[i] == "\\":
                i += 2
            elif expr[i] == "'":
                if expr[i + 1:i + 2] == "'":
                    i += 2
                else:
                    i += 1
                    closed = True
                    break
            else:
                i += 1
        if not closed:
            return n  # unterminated — consumes the rest either way
        m = re.match(r"[ \t]*[\r\n][ \t\r\n]*'", expr[i:])
        if m is None:
            return i
        i += m.end()


def _folds_to_numeric_const(expr: str) -> bool:
    """True when ``expr`` reduces to a numeric A_Const under the real
    grammar's constant folding: grouping parens are transparent
    (c_expr: '(' a_expr ')') and doNegate folds unary minus over an
    Integer/Float A_Const in place — so ``-1``, ``- 1``, ``-(-1)``,
    ``-(-(2))`` are all A_Const. Anything else under a minus (a cast,
    a string, a call) keeps an A_Expr wrapper and stays volatile
    (fuzz wave 15)."""
    expr = expr.strip()
    while _outer_parens_match(expr):
        expr = expr[1:-1].strip()
    if expr.startswith("-"):
        return _folds_to_numeric_const(expr[1:])
    return bool(_BARE_NUM_RE.match(expr))

# typed literal (AexprConst: ConstTypename Sconst / func_name Sconst) —
# ``INTERVAL '1 day'``, ``TIMESTAMP(3) '2020-01-01'``, ``DOUBLE PRECISION
# '1.5'``, ``pg_catalog.text 'x'`` — the grammar reduces every one to
# TypeCast(A_Const), non-volatile per the reference's isVolatileDefault
# (alter_add_column.go:112-134). Deliberately NO ::cast suffix: a suffix
# cast on a typed literal nests TypeCast(TypeCast(A_Const)), whose outer
# arg is not A_Const — the reference classifies that VOLATILE (fuzz
# wave 13: the bare typed-literal forms classified volatile and raised
# false R2 findings).
_TYPED_LITERAL_RE = re.compile(
    rf"^[{_ID_START}][{_ID_CONT}]*(?:\s*\.\s*[{_ID_START}][{_ID_CONT}]*)?"
    rf"(?:\s+[{_ID_START}][{_ID_CONT}]*)*"
    r"(?:\s*\(\d+(?:,\s*\d+)?\))?\s*'(?:[^']|'')*'$"
)


def _outer_parens_match(expr: str) -> bool:
    """True when expr is '( ... )' with the opening paren closing at the
    LAST character (string-literal aware) — i.e. a pure grouping pair
    the real grammar drops (c_expr: '(' a_expr ')' is just a_expr)."""
    if not (expr.startswith("(") and expr.endswith(")")):
        return False
    depth, i, n = 0, 0, len(expr)
    while i < n:
        ch = expr[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if expr[j] == "'":
                    if j + 1 < n and expr[j + 1] == "'":
                        j += 2
                        continue
                    j += 1
                    break
                j += 1
            i = j
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i == n - 1
        i += 1
    return False


def is_volatile_default(expr: str) -> bool:
    """Conservative volatility classification, same under-approximation as
    the reference (internal/analyzer/rules/alter_add_column.go:112-134):
    non-volatile iff a constant or a cast of a constant; any function call
    (FuncCall) or other expression is assumed volatile.

    Grouping parentheses are stripped first (fuzz wave 9): the real
    grammar reduces ``(0)`` / ``((42))`` / ``('x'::text)`` to the same
    A_Const / TypeCast nodes as the bare forms — a textual matcher that
    keeps the parens classified them volatile and raised a false
    add-column-volatile-default finding."""
    expr = expr.strip()
    while True:
        if _outer_parens_match(expr):
            expr = expr[1:-1].strip()
            continue
        cast = _CAST_RE.match(expr)
        if cast:
            expr = cast.group(1).strip()
            continue
        # suffix cast on a parenthesized operand — ('x')::text — is the
        # same TypeCast node; volatility is the operand's. The tail is
        # checked with _CAST_SUFFIX_RE so array/quoted/schema-qualified
        # types — ('{}')::text[], ('x')::"t" — strip exactly like the
        # bare forms wave 11 fixed (ADVICE r08: the old inline [\w\s]+
        # pattern rejected them and raised the same false finding)
        if expr.startswith("("):
            depth2, i2, n2 = 0, 0, len(expr)
            close = None
            while i2 < n2:
                q = _skip_quoted(expr, i2)
                if q is not None:
                    i2 = q
                    continue
                if expr[i2] == "(":
                    depth2 += 1
                elif expr[i2] == ")":
                    depth2 -= 1
                    if depth2 == 0:
                        close = i2
                        break
                i2 += 1
            if close is not None and close < n2 - 1:
                tail = expr[close + 1:].strip()
                if _CAST_SUFFIX_RE.match(tail):
                    expr = expr[: close + 1]
                    continue
        break
    # exactly ONE dollar-quoted literal (plus an optional ::cast
    # suffix) is the same A_Const string node as '…' (fuzz wave 10);
    # scanned in code because a regex backreference backtracks across
    # separate $$…$$ strings
    if expr.startswith("$"):
        end = _skip_quoted(expr, 0)
        if end is not None and end <= len(expr):
            tail = expr[end:].strip()
            if not tail or _CAST_SUFFIX_RE.match(tail):
                return False
    # unary minus: doNegate folds it ONLY over a numeric A_Const
    # (possibly under grouping parens / repeated negation — wave 10's
    # ``-(1)`` special case, generalized by wave 15 to ``- 1`` /
    # ``- -1`` / ``-(-(2))``); a minus over anything else — including a
    # suffix-cast numeric like ``-1::int``, since ``::`` binds tighter
    # than unary minus — is an A_Expr the reference classifies volatile
    if expr.startswith("-"):
        return not _folds_to_numeric_const(expr)
    # newline-continued string literal (scan.l {quotecontinue}): one
    # A_Const, optionally cast once — same TypeCast(A_Const) shape as
    # the single-token forms (fuzz wave 17)
    j = _scan_string_continuation(expr)
    if j is not None:
        tail = expr[j:].strip()
        if not tail or _CAST_SUFFIX_RE.match(tail):
            return False
    return not (_CONST_RE.match(expr) or _TYPED_LITERAL_RE.match(expr))


def _skip_quoted(text: str, i: int) -> int | None:
    """If a quoted token starts at ``i`` — '…' (with '' doubling),
    E'…' (backslash escapes, only when the E begins a token), "…"
    identifier, or $tag$…$tag$ — return the index just past it; else
    None. The ONE quote scanner the command-level helpers share (fuzz
    wave 10: three of them each knew a different subset, so a comma or
    keyword inside a dollar-quoted or E-string default corrupted the
    command list / default extraction)."""
    n = len(text)
    ch = text[i]
    escaped = False
    if ch in "eE" and i + 1 < n and text[i + 1] == "'" and (
        i == 0 or not (text[i - 1].isalnum() or text[i - 1] in '_$"')
    ):
        escaped = True
        i += 1
        ch = "'"
    if ch == "'":
        j = i + 1
        while j < n:
            if escaped and text[j] == "\\":
                j += 2
            elif text[j] == "'":
                if j + 1 < n and text[j + 1] == "'":
                    j += 2
                else:
                    return j + 1
            else:
                j += 1
        return n
    if ch == '"':
        j = i + 1
        while j < n:
            if text[j] == '"':
                if j + 1 < n and text[j + 1] == '"':
                    j += 2
                    continue
                return j + 1
            j += 1
        return n
    if ch == "$":
        m = re.match(r"\$([A-Za-z_\u0080-\U0010ffff][\w\u0080-\U0010ffff]*)?\$", text[i:])
        if m:
            tag = m.group(0)
            close = text.find(tag, i + len(tag))
            return n if close == -1 else close + len(tag)
    return None


def _split_top_level(text: str, sep: str = ",") -> list[str]:
    """Split on `sep` outside parens, brackets and quotes (single-quoted
    strings, E-strings, double-quoted identifiers, dollar-quoted bodies —
    r03 fuzz fix for "a,b" identifiers; wave 10 extended to $tag$…$tag$
    and E'…' whose contents previously split the command list; wave 13
    added square brackets — ``DEFAULT ARRAY[1, 2, 3]`` sits at paren
    depth 0, so a paren-only tracker cut one ADD COLUMN command into
    three)."""
    parts: list[str] = []
    depth = 0
    cur: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        j = _skip_quoted(text, i)
        if j is not None:
            cur.append(text[i:j])
            i = j
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


_DEFAULT_END_KEYWORDS = (
    r"NOT\s+NULL\b|NULL\b|CHECK\b|REFERENCES\b|UNIQUE\b|PRIMARY\s+KEY|"
    r"CONSTRAINT\b|COLLATE\b|GENERATED\b"
)


def _find_top_level_default(command: str) -> int | None:
    """Offset just past a TOP-LEVEL ``DEFAULT`` keyword — outside string
    literals, quoted identifiers, and parentheses. A bare regex search
    matched DEFAULT inside a CHECK constraint's string literal
    (``CHECK (status <> 'DEFAULT value')``) and raised a false
    volatile-default finding where libpg_query sees no default at all
    (fuzz wave 9). The DEFAULT token of ``GENERATED BY DEFAULT AS
    IDENTITY`` is part of the identity clause, not a DEFAULT constraint
    — the real AST carries CONSTR_IDENTITY with no RawExpr, so the
    reference's extractDefaultExpr returns nil and no R2 finding fires;
    matching it here raised a false volatile finding on every
    by-default identity column (fuzz wave 13)."""
    i, n, depth = 0, len(command), 0
    prev_word = ""
    while i < n:
        ch = command[i]
        j = _skip_quoted(command, i)
        if j is not None:
            i = j
            prev_word = ""
        elif ch in "([":
            depth += 1
            i += 1
            prev_word = ""
        elif ch in ")]":
            depth -= 1
            i += 1
            prev_word = ""
        elif ch.isalpha() or ch == "_":
            j = i + 1
            while j < n and (command[j].isalnum() or command[j] in "_$"):
                j += 1
            word = command[i:j].upper()
            if depth == 0 and word == "DEFAULT" and prev_word != "BY":
                m_ws = re.match(r"\s+", command[j:])
                if m_ws:
                    return j + m_ws.end()
                # DEFAULT(now()) — legal without whitespace; requiring
                # \s+ silently skipped the volatile-default rule, a
                # false NEGATIVE in a safety rule (ADVICE r08)
                if j < n and command[j] == "(":
                    return j
            prev_word = word
            i = j
        elif ch.isspace():
            i += 1
        else:
            prev_word = ""
            i += 1
    return None


def _extract_default_expr(command: str) -> str | None:
    """Slice the DEFAULT expression out of an ADD COLUMN command
    (the textual analogue of walking the column's constraint list,
    reference internal/analyzer/rules/alter_add_column.go:97-110)."""
    pos = _find_top_level_default(command)
    if pos is None:
        return None
    rest = command[pos:]
    # cut at the first top-level constraint keyword
    depth = 0
    i, n = 0, len(rest)
    while i < n:
        ch = rest[i]
        j = _skip_quoted(rest, i)
        if j is not None:
            i = j
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if depth == 0 and rest[:i].strip():
            # a constraint keyword can only END a default once some
            # expression text precedes it: in `DEFAULT NULL` the NULL IS
            # the (constant) default expression, not a nullability
            # constraint (r03 fuzz fix — the empty slice classified
            # DEFAULT NULL as volatile)
            m2 = re.match(_DEFAULT_END_KEYWORDS, rest[i:], re.IGNORECASE)
            if m2:
                return rest[:i].strip()
        i += 1
    return rest.strip()


def _parse_alter_command(cmd: str) -> AlterCommand:
    out = AlterCommand()
    m = re.match(
        rf"ADD\s+CONSTRAINT\s+({_IDENT})\s+(.*)$", cmd, re.IGNORECASE | re.DOTALL
    )
    bare = re.match(
        r"ADD\s+(CHECK|FOREIGN\s+KEY|UNIQUE|PRIMARY\s+KEY|EXCLUDE)\b(.*)$",
        cmd,
        re.IGNORECASE | re.DOTALL,
    )
    if m or bare:
        body = m.group(2) if m else (bare.group(1) + bare.group(2))
        out.subtype = "add_constraint"
        head = body.lstrip().upper()
        if head.startswith("CHECK"):
            out.constraint_type = "check"
        elif head.startswith("FOREIGN KEY") or head.startswith("FOREIGN"):
            out.constraint_type = "foreign"
        elif head.startswith("UNIQUE"):
            out.constraint_type = "unique"
        elif head.startswith("PRIMARY"):
            out.constraint_type = "primary"
        elif head.startswith("EXCLUDE"):
            out.constraint_type = "exclude"
        out.skip_validation = bool(
            re.search(r"\bNOT\s+VALID\s*$", cmd, re.IGNORECASE)
        )
        return out
    m = re.match(
        rf"ADD\s+(?:COLUMN\s+)?(?:IF\s+NOT\s+EXISTS\s+)?({_IDENT})\s+(.*)$",
        cmd,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        out.subtype = "add_column"
        out.column = normalize_name(m.group(1))
        default_expr = _extract_default_expr(m.group(2))
        if default_expr is not None:
            out.has_default = True
            out.default_volatile = is_volatile_default(default_expr)
        return out
    m = re.match(
        rf"ALTER\s+(?:COLUMN\s+)?({_IDENT})\s+(?:SET\s+DATA\s+)?TYPE\b",
        cmd,
        re.IGNORECASE,
    )
    if m:
        out.subtype = "alter_column_type"
        out.column = normalize_name(m.group(1))
        return out
    m = re.match(
        rf"ALTER\s+(?:COLUMN\s+)?({_IDENT})\s+SET\s+NOT\s+NULL", cmd, re.IGNORECASE
    )
    if m:
        out.subtype = "set_not_null"
        out.column = normalize_name(m.group(1))
        return out
    m = re.match(
        rf"ALTER\s+(?:COLUMN\s+)?({_IDENT})\s+DROP\s+NOT\s+NULL", cmd, re.IGNORECASE
    )
    if m:
        out.subtype = "drop_not_null"
        out.column = normalize_name(m.group(1))
        return out
    m = re.match(
        rf"ALTER\s+(?:COLUMN\s+)?({_IDENT})\s+SET\s+DEFAULT\b", cmd, re.IGNORECASE
    )
    if m:
        out.subtype = "set_default"
        out.column = normalize_name(m.group(1))
        return out
    # DROP CONSTRAINT before the column form: the optional COLUMN keyword
    # made ``DROP CONSTRAINT c`` capture CONSTRAINT as a column name and
    # classify drop_column (fuzz wave 18 — cosmetic, no rule fires on
    # either, but the command record was wrong)
    m = re.match(
        rf"DROP\s+CONSTRAINT\s+(?:IF\s+EXISTS\s+)?({_IDENT})",
        cmd,
        re.IGNORECASE,
    )
    if m:
        out.subtype = "drop_constraint"
        return out
    m = re.match(
        rf"DROP\s+(?:COLUMN\s+)?(?:IF\s+EXISTS\s+)?({_IDENT})", cmd, re.IGNORECASE
    )
    if m:
        out.subtype = "drop_column"
        out.column = normalize_name(m.group(1))
        return out
    out.subtype = "other"
    return out


def _names_list(raw: str) -> list[str]:
    """Comma-separated relation list. In the LOCK/TRUNCATE grammar every
    element may carry its own inheritance markers — ``[ONLY] name [*]``
    — which libpg_query's RangeVar walk never surfaces as part of the
    relation name (fuzz wave 8: ``LOCK ONLY t1, ONLY t2`` produced a
    relation literally named "only t2"). ONLY is a reserved keyword, so
    stripping the unquoted prefix can never eat a real name; a quoted
    ``"only"`` identifier is untouched."""
    out = []
    for p in _split_top_level(raw):
        p = re.sub(r"^ONLY\s+", "", p.strip(), flags=re.IGNORECASE)
        p = re.sub(r"\s*\*$", "", p)
        out.append(normalize_name(p))
    return out


def classify_statement(stmt_index: int, stmt_sql: str) -> StatementFeatures:
    """Extract the feature vector one statement — the textual analogue of
    the reference's typed AST node matching (e.g. Node_IndexStmt in
    internal/analyzer/rules/create_index.go:20, Node_DropStmt in
    drop_table.go:22-29, DefElem walk in vacuum_full.go:43-56)."""
    feats = StatementFeatures(stmt_index=stmt_index, stmt_sql=stmt_sql)
    s = _strip_comments(stmt_sql).rstrip(";").strip()

    m = re.match(
        rf"CREATE\s+(?:UNIQUE\s+)?INDEX\s+(?P<conc>CONCURRENTLY\s+)?"
        rf"(?:IF\s+NOT\s+EXISTS\s+)?(?:{_IDENT}\s+)?ON\s+(?:ONLY\s+)?"
        rf"(?P<table>{_QNAME})",
        s,
        re.IGNORECASE,
    )
    if m:
        feats.stmt_type = "create_index"
        feats.concurrent = bool(m.group("conc"))
        feats.table = normalize_name(m.group("table"))
        feats.tables = [feats.table]
        return feats

    m = re.match(
        rf"CREATE\s+(?:GLOBAL\s+|LOCAL\s+)?(?:TEMPORARY\s+|TEMP\s+|UNLOGGED\s+)?"
        rf"TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<table>{_QNAME})",
        s,
        re.IGNORECASE,
    )
    if m:
        # CreateStmt parity (reference parser_test.go:24-31): no rule
        # fires on it, but the typed feature matters for statement audits
        feats.stmt_type = "create_table"
        feats.table = normalize_name(m.group("table"))
        feats.tables = [feats.table]
        return feats

    m = re.match(
        r"DROP\s+TABLE\s+(?P<ifex>IF\s+EXISTS\s+)?(?P<names>.+?)"
        r"(?:\s+(?:CASCADE|RESTRICT))?$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        feats.stmt_type = "drop_table"
        feats.tables = _names_list(m.group("names"))
        feats.table = feats.tables[0] if feats.tables else None
        feats.if_exists = bool(m.group("ifex"))
        return feats

    m = re.match(r"DROP\s+INDEX\s+(?P<conc>CONCURRENTLY\s+)?", s, re.IGNORECASE)
    if m:
        feats.stmt_type = "drop_index"
        feats.concurrent = bool(m.group("conc"))
        return feats

    # REINDEX [(options)] {INDEX|TABLE|...} [CONCURRENTLY] name — a
    # DELIBERATE superset of the reference, which routes only
    # IndexStmt/DropStmt (internal/executor/concurrent.go:27-36) and so
    # would wrap REINDEX CONCURRENTLY in a transaction block PostgreSQL
    # 12+ refuses at apply time (fuzz round 6 wave 5)
    m = re.match(
        r"REINDEX\s+(?:\((?P<opts>[^)]*)\)\s+)?"
        r"(?:INDEX|TABLE|SCHEMA|DATABASE|SYSTEM)\s+"
        r"(?P<conc>CONCURRENTLY\s+)?",
        s,
        re.IGNORECASE,
    )
    if m:
        feats.stmt_type = "reindex"
        feats.concurrent = bool(m.group("conc"))
        # PG 14+ parenthesized option form: REINDEX (CONCURRENTLY [bool])
        # TABLE t — boolean options default to true when bare; explicit
        # FALSE/OFF/0 disables (same option grammar as VACUUM below)
        if not feats.concurrent and m.group("opts"):
            for opt in _split_top_level(m.group("opts")):
                tokens = opt.split()
                if tokens and tokens[0].upper() == "CONCURRENTLY":
                    value = tokens[1].lower() if len(tokens) > 1 else "true"
                    feats.concurrent = value not in ("false", "off", "0", "no")
        return feats

    # REFRESH MATERIALIZED VIEW [CONCURRENTLY] name — classification
    # only, deliberately NOT part of the tx-routing superset: unlike
    # CREATE/DROP INDEX, REINDEX and DETACH PARTITION, the concurrent
    # refresh IS accepted inside a transaction block (proven against
    # live PostgreSQL 15 during fuzz wave 14 — BEGIN; REFRESH
    # MATERIALIZED VIEW CONCURRENTLY mv; COMMIT succeeds), so routing it
    # outside would drop the tx wrapper and safety timeouts for nothing
    m = re.match(
        r"REFRESH\s+MATERIALIZED\s+VIEW\s+(?P<conc>CONCURRENTLY\s+)?"
        rf"(?P<name>{_QNAME})",
        s,
        re.IGNORECASE,
    )
    if m:
        feats.stmt_type = "refresh_matview"
        feats.concurrent = bool(m.group("conc"))
        return feats

    m = re.match(
        r"TRUNCATE\s+(?:TABLE\s+)?(?:ONLY\s+)?(?P<names>.+?)"
        r"(?:\s+(?:RESTART\s+IDENTITY|CONTINUE\s+IDENTITY|CASCADE|RESTRICT))*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        feats.stmt_type = "truncate"
        feats.tables = _names_list(m.group("names"))
        feats.table = feats.tables[0] if feats.tables else None
        return feats

    if re.match(r"VACUUM\b", s, re.IGNORECASE):
        feats.stmt_type = "vacuum"
        paren = re.match(r"VACUUM\s*\((?P<opts>[^)]*)\)\s*(?P<rest>.*)$", s,
                         re.IGNORECASE | re.DOTALL)
        if paren:
            # option-list form: FULL [boolean] (reference vacuum_full.go:43-56)
            for opt in _split_top_level(paren.group("opts")):
                tokens = opt.split()
                if tokens and tokens[0].upper() == "FULL":
                    value = tokens[1].lower() if len(tokens) > 1 else "true"
                    feats.vacuum_full = value not in ("false", "off", "0", "no")
            rest = paren.group("rest").strip()
        else:
            # \b\s* (not \s+): bare "VACUUM" with no options or table
            # must still match (r03 fuzz fix — the old \s+ made this
            # regex fail and the .group() call below crash)
            keywords = re.match(
                r"VACUUM\b\s*(?P<kw>(?:(?:FULL|FREEZE|VERBOSE|ANALYZE)\s*)+)?"
                r"(?P<rest>.*)$",
                s,
                re.IGNORECASE | re.DOTALL,
            )
            kw = (keywords.group("kw") or "").upper().split()
            feats.vacuum_full = "FULL" in kw
            rest = keywords.group("rest").strip()
        if rest:
            name = re.match(_QNAME, rest)
            if name:
                feats.table = normalize_name(name.group(0))
                feats.tables = [feats.table]
        return feats

    m = re.match(
        r"LOCK\s+(?:TABLE\s+)?(?:ONLY\s+)?(?P<names>.+?)"
        r"(?:\s+IN\s+.+\s+MODE)?(?:\s+NOWAIT)?$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        feats.stmt_type = "lock"
        feats.tables = _names_list(m.group("names"))
        feats.table = feats.tables[0] if feats.tables else None
        return feats

    # relation_expr allows a descendant-table star after the name
    # (``ALTER TABLE t * ADD CHECK …``) — without consuming it the star
    # leads the first subcommand and the whole command list parses as
    # 'other', silently skipping every danger rule (fuzz wave 9)
    m = re.match(
        rf"ALTER\s+TABLE\s+(?:IF\s+EXISTS\s+)?(?:ONLY\s+)?"
        rf"(?P<table>{_QNAME})(?:\s*\*)?\s+(?P<rest>.*)$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        feats.table = normalize_name(m.group("table"))
        feats.tables = [feats.table]
        rest = m.group("rest").strip()
        if re.match(r"RENAME\s+TO\b", rest, re.IGNORECASE):
            feats.stmt_type = "rename"
            feats.rename_object = "table"
            return feats
        if re.match(r"RENAME\s+CONSTRAINT\b", rest, re.IGNORECASE):
            feats.stmt_type = "rename"
            feats.rename_object = "constraint"
            return feats
        rn = re.match(
            rf"RENAME\s+(?:COLUMN\s+)?({_IDENT})\s+TO\s+", rest, re.IGNORECASE
        )
        if rn:
            feats.stmt_type = "rename"
            feats.rename_object = "column"
            return feats
        feats.stmt_type = "alter_table"
        cmds = _split_top_level(rest)
        feats.commands = [_parse_alter_command(c) for c in cmds]
        # DETACH PARTITION … CONCURRENTLY cannot run inside a transaction
        # block (PostgreSQL 14+) — the same deliberate routing superset
        # as REINDEX / REFRESH MATERIALIZED VIEW: the reference routes
        # only IndexStmt/DropStmt and would wrap it (fuzz wave 14). The
        # quoted-name form DETACH PARTITION "CONCURRENTLY" is NOT the
        # keyword — _QNAME consumes it first.
        feats.concurrent = any(
            re.match(
                rf"DETACH\s+PARTITION\s+{_QNAME}\s+CONCURRENTLY\s*$",
                c,
                re.IGNORECASE,
            )
            for c in cmds
        )
        return feats

    m = re.match(
        rf"ALTER\s+INDEX\s+(?:IF\s+EXISTS\s+)?({_QNAME})\s+RENAME\s+TO\b",
        s,
        re.IGNORECASE,
    )
    if m:
        feats.stmt_type = "rename"
        feats.rename_object = "index"
        return feats

    # CopyStmt (r04): typed for statement audits; no rule fires on it.
    # The FROM STDIN payload never reaches here — split_statements skips
    # it up to the \. terminator.
    m = re.match(
        rf"COPY\s+(?:\(\s*)?(?P<table>{_QNAME})", s, re.IGNORECASE
    )
    if m and not re.match(r"COPY\s*\(", s, re.IGNORECASE):
        feats.stmt_type = "copy"
        feats.table = normalize_name(m.group("table"))
        feats.tables = [feats.table]
        return feats

    return feats


def parse_sql(sql: str | None) -> list[dict]:
    """Full parse of one migration's SQL → list of feature dicts
    (rows of schemas.STATEMENT_FEATURES)."""
    if not sql:
        return []
    return [
        classify_statement(idx, text).as_dict()
        for idx, (_offset, text) in enumerate(split_statements(sql))
    ]


def contains_concurrent_op(sql: str) -> bool:
    """Tx-routing predicate: does the SQL contain a CONCURRENTLY operation
    that must run outside a transaction? Keeps the reference's cheap
    substring prefilter before the expensive parse
    (reference internal/executor/concurrent.go:15-40)."""
    if "CONCURRENTLY" not in sql.upper():
        return False
    return any(
        f["concurrent"]
        # reindex / alter_table(DETACH … CONCURRENTLY) are a deliberate
        # superset of the reference's IndexStmt/DropStmt routing — each
        # of these concurrent forms is refused inside a transaction
        # block by PostgreSQL itself (all four proven against live
        # PG 15). REFRESH MATERIALIZED VIEW CONCURRENTLY is deliberately
        # ABSENT: the server accepts it inside a tx block, so it keeps
        # the transactional path (fuzz round 6 wave 5; fuzz wave 14)
        and f["stmt_type"] in (
            "create_index", "drop_index", "reindex", "alter_table",
        )
        for f in parse_sql(sql)
    )
