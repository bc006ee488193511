"""DuckDB oracle SQL — one entry per oracle-checkable query.

Mirrors plans/queries.py exactly: same aliases, same exact-decimal
aggregation pattern (sums/averages pass through DECIMAL(28,10) so the
double results are bit-identical to Spark's regardless of reduction
order), same string-formatted timestamps. Migration/ledger tables are
inlined as VALUES CTEs from fixtures.py so both engines see byte-identical
corpora.
"""

from __future__ import annotations

from .. import fixtures
from ..functions import text as TX

_DEC = "DECIMAL(28,10)"

# Exact-decimal price arithmetic — byte-identical expression to
# queries.DISC_PRICE / queries.CHARGE (see the comment there).
_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
)
_CHARGE = f"({_DISC_PRICE}) * (1 + CAST(l_tax AS DECIMAL(4,2)))"


# The decimal→double cast is routed through VARCHAR: DuckDB's direct
# DECIMAL→DOUBLE cast divides the int128 by 10^scale in floating point (two
# roundings, can be 1 ULP off), while VARCHAR→DOUBLE is correctly rounded —
# matching Java's BigDecimal.doubleValue on the Spark side bit-for-bit.


def _dsum(expr: str, alias: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS {_DEC})) AS VARCHAR) AS DOUBLE) AS {alias}"
    )


def _davg(expr: str, alias: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS {_DEC})) AS VARCHAR) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


ORACLES: dict[str, str] = {}

ORACLES["revenue_agg"] = f"""
SELECT
    l_returnflag,
    l_linestatus,
    {_dsum('l_quantity', 'sum_qty')},
    {_dsum('l_extendedprice', 'sum_base_price')},
    {_dsum(_DISC_PRICE, 'sum_disc_price')},
    {_dsum(_CHARGE, 'sum_charge')},
    {_davg('l_quantity', 'avg_qty')},
    {_davg('l_extendedprice', 'avg_price')},
    {_davg('l_discount', 'avg_disc')},
    COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLES["topk_orders"] = f"""
SELECT
    o_orderkey,
    {_dsum(_DISC_PRICE, 'revenue')},
    strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
    o_orderpriority
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""

ORACLES["region_rollup"] = f"""
SELECT
    r_name,
    COUNT(*) AS n_customers,
    {_dsum('c_acctbal', 'total_acctbal')},
    {_davg('c_acctbal', 'avg_acctbal')}
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""

ORACLES["window_rank"] = """
SELECT o_custkey, o_orderkey, o_totalprice, rnk
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC
           ) AS rnk
    FROM orders
)
WHERE rnk <= 3
"""

ORACLES["set_ops_users"] = """
SELECT user_id FROM (
    (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
     INTERSECT
     SELECT DISTINCT user_id FROM events WHERE event_type = 'signup')
    EXCEPT
    SELECT DISTINCT user_id FROM events
    WHERE event_type = 'error' AND value > 180
)
ORDER BY user_id
"""

ORACLES["events_tumbling"] = f"""
SELECT
    strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
    event_type,
    COUNT(*) AS n_events,
    {_dsum('value', 'sum_value')}
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""

ORACLES["events_sessionize"] = f"""
WITH flagged AS (
    SELECT
        user_id, ts, event_id, value,
        CASE
            WHEN lag(ts) OVER w IS NULL THEN 1
            WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30 * 60 * 1000000
                THEN 1
            ELSE 0
        END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT
        user_id, ts, value,
        SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_seq
    FROM flagged
)
SELECT
    user_id,
    CAST(session_seq AS BIGINT) AS session_seq,
    strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
    strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
    COUNT(*) AS n_events,
    {_dsum('value', 'sum_value')}
FROM sessions
GROUP BY user_id, session_seq
"""

# --- ledger / migration operators: corpus inlined on both sides ----------

_MIG = fixtures.migrations_values_cte()
_LEDGER = fixtures.ledger_values_cte()
_LEDGER_TAMPERED = fixtures.ledger_values_cte(tampered=True)

ORACLES["ledger_status"] = f"""
WITH {_LEDGER}
SELECT version, filename, checksum,
       strftime(applied_at, '%Y-%m-%d %H:%M:%S') AS applied_at,
       duration_ms, status
FROM schema_migrations
WHERE status = 'applied'
ORDER BY version
"""

ORACLES["pending_migrations"] = f"""
WITH {_MIG}, {_LEDGER}
SELECT m.version, m.name, m.checksum
FROM migrations m
WHERE NOT EXISTS (
    SELECT 1 FROM schema_migrations t
    WHERE t.version = m.version AND t.status = 'applied'
)
ORDER BY m.version
"""

ORACLES["applied_semi"] = f"""
WITH {_MIG}, {_LEDGER}
SELECT m.version, m.name
FROM migrations m
WHERE EXISTS (
    SELECT 1 FROM schema_migrations t
    WHERE t.version = m.version AND t.status = 'applied'
)
ORDER BY m.version
"""

ORACLES["checksum_verify"] = f"""
WITH {_MIG}, {_LEDGER_TAMPERED}
SELECT m.version,
       sha256(m.up_sql) AS computed_checksum,
       t.checksum AS recorded_checksum,
       sha256(m.up_sql) = t.checksum AS checksum_ok
FROM migrations m
JOIN schema_migrations t ON m.version = t.version
WHERE t.status = 'applied'
ORDER BY m.version
"""

ORACLES["rollback_topk"] = f"""
WITH {_LEDGER}
SELECT version, filename
FROM schema_migrations
WHERE status = 'applied'
ORDER BY version DESC
LIMIT 3
"""

ORACLES["after_version"] = f"""
WITH {_LEDGER}
SELECT version, strftime(applied_at, '%Y-%m-%d %H:%M:%S') AS applied_at
FROM schema_migrations
WHERE status = 'applied' AND version > '003'
ORDER BY version DESC
"""

# Independent SQL re-implementation of the 9 danger rules (R1–R9) over the
# inlined corpus, at PG 14. Deliberately a different mechanism from the
# Spark analyzer (LIKE/regexp vs statement parser) so agreement is a real
# cross-check. Scoped to the corpus (single-statement migrations →
# stmt_index 0).
# Single quotes doubled: this regex is embedded inside a SQL string literal.
# Mirrors parse.is_volatile_default's constant grammar on the fixture
# corpus. Negative numerics deliberately take NO cast suffix (wave 15):
# ``::`` binds tighter than unary minus, so ``-1::int`` is doNegate over
# a TypeCast — an A_Expr the rule classifies volatile — while bare
# ``-1`` folds to A_Const.
_CONST_DEFAULT = (
    r"^(''[^'']*''|[0-9.]+|TRUE|FALSE|NULL)"
    r"(\s*::\s*[A-Za-z_ ]+(\([0-9, ]*\))?)?\s*;?\s*$"
    r"|^-\s*[0-9.]+\s*;?\s*$"
)

_FINDINGS_SQL = f"""
stmts AS (
    SELECT version, trim(up_sql) AS stmt, upper(trim(up_sql)) AS us
    FROM migrations
),
findings AS (
    -- R1 create-index-not-concurrent
    SELECT version, 'create-index-not-concurrent' AS rule, 3 AS severity,
           lower(regexp_extract(stmt,
               '(?i)ON\\s+(?:ONLY\\s+)?([A-Za-z_."][\\w."]*)', 1)) AS table_name,
           'SHARE' AS lock_type, 0 AS stmt_index
    FROM stmts
    WHERE us LIKE 'CREATE%INDEX%' AND us NOT LIKE '%CONCURRENTLY%'
    UNION ALL
    -- R2 add-column-volatile-default (PG14: only volatile defaults fire)
    SELECT version, 'add-column-volatile-default', 3,
           lower(regexp_extract(stmt,
               '(?i)ALTER\\s+TABLE\\s+(?:IF\\s+EXISTS\\s+)?(?:ONLY\\s+)?([A-Za-z_."][\\w."]*)', 1)),
           'ACCESS EXCLUSIVE', 0
    FROM stmts
    WHERE us LIKE 'ALTER TABLE%ADD%COLUMN%DEFAULT%'
      AND NOT regexp_matches(
              regexp_extract(stmt, '(?i)DEFAULT\\s+(.*)$', 1),
              '(?i){_CONST_DEFAULT}')
    UNION ALL
    -- R3 add-constraint-without-not-valid (CHECK / FOREIGN KEY only)
    SELECT version, 'add-constraint-without-not-valid', 3,
           lower(regexp_extract(stmt,
               '(?i)ALTER\\s+TABLE\\s+(?:IF\\s+EXISTS\\s+)?(?:ONLY\\s+)?([A-Za-z_."][\\w."]*)', 1)),
           'ACCESS EXCLUSIVE', 0
    FROM stmts
    WHERE us LIKE 'ALTER TABLE%ADD CONSTRAINT%'
      AND (us LIKE '%CHECK%' OR us LIKE '%FOREIGN KEY%')
      AND us NOT LIKE '%NOT VALID%'
    UNION ALL
    -- R4 alter-column-type
    SELECT version, 'alter-column-type', 3,
           lower(regexp_extract(stmt,
               '(?i)ALTER\\s+TABLE\\s+(?:IF\\s+EXISTS\\s+)?(?:ONLY\\s+)?([A-Za-z_."][\\w."]*)', 1)),
           'ACCESS EXCLUSIVE', 0
    FROM stmts
    WHERE regexp_matches(stmt,
        '(?i)ALTER\\s+TABLE\\s+.*ALTER\\s+(COLUMN\\s+)?[\\w"]+\\s+(SET\\s+DATA\\s+)?TYPE\\b')
    UNION ALL
    -- R5 set-not-null (PG14 >= 12 → MEDIUM)
    SELECT version, 'set-not-null', 2,
           lower(regexp_extract(stmt,
               '(?i)ALTER\\s+TABLE\\s+(?:IF\\s+EXISTS\\s+)?(?:ONLY\\s+)?([A-Za-z_."][\\w."]*)', 1)),
           'ACCESS EXCLUSIVE', 0
    FROM stmts
    WHERE regexp_matches(stmt,
        '(?i)ALTER\\s+TABLE\\s+.*ALTER\\s+(COLUMN\\s+)?[\\w"]+\\s+SET\\s+NOT\\s+NULL')
    UNION ALL
    -- R6 drop-table (DROP TABLE or TRUNCATE) — CRITICAL
    SELECT version, 'drop-table', 4,
           lower(regexp_extract(stmt,
               '(?i)(?:DROP\\s+TABLE\\s+(?:IF\\s+EXISTS\\s+)?|TRUNCATE\\s+(?:TABLE\\s+)?(?:ONLY\\s+)?)([A-Za-z_."][\\w."]*)', 1)),
           'ACCESS EXCLUSIVE', 0
    FROM stmts
    WHERE us LIKE 'DROP TABLE%' OR us LIKE 'TRUNCATE%'
    UNION ALL
    -- R7 vacuum-full
    SELECT version, 'vacuum-full', 3,
           coalesce(nullif(lower(regexp_extract(stmt,
               '(?i)^VACUUM\\s+(?:\\([^)]*\\)\\s*|(?:FULL|FREEZE|VERBOSE|ANALYZE)\\s+)*([A-Za-z_."][\\w."]*)?', 1)), ''),
               '<all tables>'),
           'ACCESS EXCLUSIVE', 0
    FROM stmts
    -- parenthesized options take boolean VALUES (wave 12): (FULL) /
    -- (FULL true|on|1|yes) / (FULL,…) are full, (FULL false|off|0|no)
    -- is a plain vacuum. RE2 has no lookahead, so the truthy forms are
    -- enumerated: FULL followed by ',' or ')' (bare) or a truthy token.
    WHERE regexp_matches(stmt,
        '(?i)^VACUUM\\s+(\\([^)]*\\bFULL\\s*[,)]|\\([^)]*\\bFULL\\s+(TRUE|ON|1|YES)\\b|((FREEZE|VERBOSE|ANALYZE)\\s+)*FULL\\b)')
    UNION ALL
    -- R8 lock-table (one finding per relation; corpus locks one)
    SELECT version, 'lock-table', 3,
           lower(regexp_extract(stmt,
               '(?i)^LOCK\\s+(?:TABLE\\s+)?(?:ONLY\\s+)?([A-Za-z_."][\\w."]*)', 1)),
           'EXPLICIT', 0
    FROM stmts
    WHERE us LIKE 'LOCK%'
    UNION ALL
    -- R9 rename (table or column; constraint/index renames are safe)
    SELECT version, 'rename', 2,
           lower(regexp_extract(stmt,
               '(?i)ALTER\\s+TABLE\\s+(?:IF\\s+EXISTS\\s+)?(?:ONLY\\s+)?([A-Za-z_."][\\w."]*)', 1)),
           'ACCESS EXCLUSIVE', 0
    FROM stmts
    WHERE us LIKE 'ALTER TABLE%RENAME%'
      AND us NOT LIKE '%RENAME CONSTRAINT%'
)
"""

ORACLES["findings_explode"] = f"""
WITH {_MIG},
{_FINDINGS_SQL}
SELECT version, rule, severity, table_name, lock_type, stmt_index
FROM findings
ORDER BY version, rule
"""

ORACLES["severity_rollup"] = f"""
WITH {_MIG},
{_FINDINGS_SQL},
rollup AS (
    SELECT version, MAX(severity) AS max_severity,
           COUNT(*) AS n_findings
    FROM findings GROUP BY version
)
SELECT m.version,
       COALESCE(r.max_severity, 0) AS max_severity,
       COALESCE(r.n_findings, 0) AS n_findings,
       COALESCE(r.max_severity, 0) >= 3 AS has_high_or_critical
FROM migrations m
LEFT JOIN rollup r ON m.version = r.version
ORDER BY m.version
"""

ORACLES["upsert_ledger"] = f"""
WITH {_MIG}, {_LEDGER},
new_rows AS (
    SELECT version,
           'V' || version || '_' || name || '.up.sql' AS filename,
           checksum,
           TIMESTAMP '2024-02-01 00:00:00' AS applied_at,
           99 AS duration_ms,
           'applied' AS status
    FROM migrations
    WHERE version IN ('007', '008')
)
SELECT version, filename, checksum,
       strftime(applied_at, '%Y-%m-%d %H:%M:%S') AS applied_at,
       CAST(duration_ms AS INTEGER) AS duration_ms, status
FROM (
    SELECT * FROM schema_migrations s
    WHERE NOT EXISTS (SELECT 1 FROM new_rows n WHERE n.version = s.version)
    UNION ALL
    SELECT * FROM new_rows
)
ORDER BY version
"""

# --- text analysis / dedup / similarity over documents & embeddings ------
# Token expressions built from the same constants as the Spark side
# (functions/text.py) so the two cannot drift.

_TOKS = TX.sql_tokens("text")

ORACLES["text_stats"] = f"""
WITH t AS (
    SELECT lang, n_chars, len({_TOKS}) AS n_tokens FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars
FROM t GROUP BY lang ORDER BY lang
"""

ORACLES["token_count"] = f"""
WITH t AS (
    SELECT source, len({_TOKS}) AS n_tokens,
           len(regexp_extract_all(text, '{TX.BPE_ISH_RE.replace("'", "''")}')) AS n_bpe
    FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
       CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens
FROM t GROUP BY source ORDER BY source
"""

_EN_STOPS = ",".join(f"'{w}'" for w in TX.STOPWORDS["en"])

ORACLES["quality_score"] = f"""
WITH t AS (
    SELECT doc_id,
           len({_TOKS}) AS n_tokens,
           length(text) AS n_chars,
           len(list_filter({_TOKS}, t -> t IN ({_EN_STOPS}))) AS stop_hits,
           length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS punct_cnt
    FROM documents
)
SELECT doc_id,
       CAST(n_tokens AS INTEGER) AS n_tokens,
       CASE WHEN n_tokens > 0
            THEN CAST(stop_hits AS DOUBLE) / n_tokens ELSE 0.0 END AS stop_ratio,
       CASE WHEN n_chars > 0
            THEN CAST(punct_cnt AS DOUBLE) / n_chars ELSE 0.0 END AS punct_ratio,
       CAST(least(n_chars, {TX.LEN_NORM}) AS DOUBLE) / {TX.LEN_NORM} AS len_score,
       (CASE WHEN n_tokens > 0
             THEN CAST(stop_hits AS DOUBLE) / n_tokens ELSE 0.0 END) * {TX.W_STOP}
       + (CASE WHEN n_chars > 0
               THEN CAST(punct_cnt AS DOUBLE) / n_chars ELSE 0.0 END) * {TX.W_PUNCT}
       + (CAST(least(n_chars, {TX.LEN_NORM}) AS DOUBLE) / {TX.LEN_NORM}) * {TX.W_LEN}
       AS score
FROM t
"""

# Reusable per-document quality-flag CTE chain (qf_staged → qf_m →
# qf_flags carrying doc_id, source, the seven f_* flags and their
# product qf_passes) — consumed by both the quality_flags rollup and
# the clean_corpus end-to-end pipeline oracle.
_QF_CTES = f"""qf_staged AS (
    SELECT doc_id, source,
           list_filter(string_split_regex(text, '\\s+'), w -> w != '')
               AS words,
           string_split(text, chr(10)) AS lines,
           len(list_filter({_TOKS}, t -> t IN ({_EN_STOPS}))) AS stop_hits,
           len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS symbol_cnt
    FROM documents
),
qf_m AS (
    SELECT doc_id, source, stop_hits, symbol_cnt,
           len(words) AS n_words,
           len(lines) AS n_lines,
           CASE WHEN len(words) > 0
                THEN list_sum(list_transform(words, w -> len(w)))
                ELSE 0 END AS word_chars,
           len(list_filter(lines,
               l -> regexp_matches(ltrim(l), '^[-*•]'))) AS bullet_cnt,
           len(list_filter(lines,
               l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$')))
               AS ellipsis_cnt,
           len(list_filter(words,
               w -> regexp_matches(w, '[A-Za-z]'))) AS alpha_cnt
    FROM qf_staged
),
qf_flags AS (
    SELECT doc_id, source,
        CASE WHEN n_words >= {TX.QF_MIN_WORDS}
              AND n_words <= {TX.QF_MAX_WORDS} THEN 1 ELSE 0 END
            AS f_word_count,
        CASE WHEN (CASE WHEN n_words > 0
                        THEN CAST(word_chars AS DOUBLE) / n_words
                        ELSE 0.0 END) >= {TX.QF_MIN_MWL}
              AND (CASE WHEN n_words > 0
                        THEN CAST(word_chars AS DOUBLE) / n_words
                        ELSE 0.0 END) <= {TX.QF_MAX_MWL} THEN 1 ELSE 0 END
            AS f_mean_word_len,
        CASE WHEN (CASE WHEN n_words > 0
                        THEN CAST(symbol_cnt AS DOUBLE) / n_words
                        ELSE 0.0 END) <= {TX.QF_MAX_SYMBOL_RATIO}
             THEN 1 ELSE 0 END AS f_symbol_ratio,
        CASE WHEN (CASE WHEN n_lines > 0
                        THEN CAST(bullet_cnt AS DOUBLE) / n_lines
                        ELSE 0.0 END) <= {TX.QF_MAX_BULLET_FRAC}
             THEN 1 ELSE 0 END AS f_bullet_lines,
        CASE WHEN (CASE WHEN n_lines > 0
                        THEN CAST(ellipsis_cnt AS DOUBLE) / n_lines
                        ELSE 0.0 END) <= {TX.QF_MAX_ELLIPSIS_FRAC}
             THEN 1 ELSE 0 END AS f_ellipsis_lines,
        CASE WHEN (CASE WHEN n_words > 0
                        THEN CAST(alpha_cnt AS DOUBLE) / n_words
                        ELSE 0.0 END) >= {TX.QF_MIN_ALPHA_FRAC}
             THEN 1 ELSE 0 END AS f_alpha_words,
        CASE WHEN stop_hits >= {TX.QF_MIN_STOP_HITS} THEN 1 ELSE 0 END
            AS f_stopwords
    FROM qf_m
)"""

_QF_PASS = ("f_word_count * f_mean_word_len * f_symbol_ratio"
            " * f_bullet_lines * f_ellipsis_lines * f_alpha_words"
            " * f_stopwords")

ORACLES["quality_flags"] = f"""
WITH {_QF_CTES}
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM({_QF_PASS}) AS BIGINT) AS n_pass,
       CAST(SUM(1 - f_word_count) AS BIGINT) AS rej_word_count,
       CAST(SUM(1 - f_mean_word_len) AS BIGINT) AS rej_mean_word_len,
       CAST(SUM(1 - f_symbol_ratio) AS BIGINT) AS rej_symbol_ratio,
       CAST(SUM(1 - f_bullet_lines) AS BIGINT) AS rej_bullet_lines,
       CAST(SUM(1 - f_ellipsis_lines) AS BIGINT) AS rej_ellipsis_lines,
       CAST(SUM(1 - f_alpha_words) AS BIGINT) AS rej_alpha_words,
       CAST(SUM(1 - f_stopwords) AS BIGINT) AS rej_stopwords
FROM qf_flags GROUP BY source ORDER BY source
"""

_HITS = {
    lang: TX.sql_stopword_hits("toks", lang) for lang in TX.LANG_PRIORITY
}
_BEST = "greatest(" + ", ".join(_HITS[lang] for lang in TX.LANG_PRIORITY) + ")"
_PRED_CASE = "CASE " + " ".join(
    f"WHEN {_BEST} > 0 AND {_HITS[lang]} = {_BEST} THEN '{lang}'"
    for lang in TX.LANG_PRIORITY
) + " ELSE 'unknown' END"

ORACLES["lang_id_confusion"] = f"""
WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents)
SELECT lang, {_PRED_CASE} AS predicted, COUNT(*) AS n
FROM t GROUP BY lang, predicted ORDER BY lang, predicted
"""

ORACLES["doc_fingerprint"] = f"""
SELECT doc_id, md5(array_to_string({_TOKS}, ' ')) AS fp FROM documents
"""

ORACLES["dedup_exact"] = """
SELECT sha256(text) AS text_hash,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS n_dups
FROM documents GROUP BY sha256(text)
"""

ORACLES["dedup_token_sig"] = f"""
WITH t AS (
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS sig
    FROM documents
)
SELECT sig, MIN(doc_id) AS keep_id, COUNT(*) AS n_docs
FROM t GROUP BY sig HAVING COUNT(*) > 1
"""

# Shared CTE chain for the 3-gram Jaccard pair graph — consumed by both
# ngram_jaccard_pairs and dedup_clusters (jacc applies the 0.1 threshold).
_JACC_CTES = f"""toks AS (
    SELECT doc_id, {_TOKS} AS t FROM documents
),
sh AS (
    SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(t) >= 3
             THEN list_transform(range(1, len(t) - 1),
                  i -> array_to_string(list_slice(t, i, i + 2), ' '))
             ELSE [] END)) AS shingle
    FROM toks
),
rare AS (
    SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 50
),
shr AS (
    SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)
),
sizes AS (
    SELECT doc_id, COUNT(*) AS n_sh FROM shr GROUP BY doc_id
),
prs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
    FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
jacc AS (
    SELECT doc_a, doc_b, common,
           CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) AS jaccard
    FROM prs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.1
)"""

ORACLES["ngram_jaccard_pairs"] = f"""
WITH {_JACC_CTES}
SELECT doc_a, doc_b, common, jaccard FROM jacc
ORDER BY doc_a, doc_b
"""

ORACLES["similarity_topk"] = """
WITH prepared AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
pairs AS (
    SELECT q.vec_id AS qid, n.vec_id AS nid,
           list_dot_product(q.v, n.v) / (q.nrm * n.nrm) AS cos_sim
    FROM prepared q, prepared n
    WHERE q.vec_id < 50 AND q.vec_id != n.vec_id
),
ranked AS (
    SELECT qid, nid, cos_sim,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY cos_sim DESC, nid ASC) AS rnk
    FROM pairs
)
SELECT qid, nid, cos_sim, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 5 ORDER BY qid, rnk
"""

# The streaming twin shares the batch oracle: the watermarked windowed
# aggregate drained with availableNow must equal the batch group-by.
ORACLES["events_tumbling_stream"] = ORACLES["events_tumbling"]

# --- relational coverage batch -------------------------------------------

ORACLES["local_supplier_revenue"] = f"""
SELECT n_name, {_dsum(_DISC_PRICE, 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""

ORACLES["customer_order_counts"] = """
WITH per_customer AS (
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
)
SELECT n_orders, COUNT(*) AS n_customers
FROM per_customer
GROUP BY n_orders
ORDER BY n_customers DESC, n_orders DESC
"""

ORACLES["orders_with_big_discount"] = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_discount > 0.05
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLES["revenue_rollup"] = f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       {_dsum('l_quantity', 'sum_qty')}
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""

ORACLES["events_json"] = """
SELECT event_type,
       CAST(floor(CAST(json_extract_string(props, '$.k') AS INTEGER) / 10)
            AS INTEGER) AS k_bucket,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2
ORDER BY event_type, k_bucket
"""

ORACLES["orderdate_parts"] = """
SELECT year(o_orderdate) AS yr,
       quarter(o_orderdate) AS qtr,
       COUNT(*) AS n_orders,
       CAST(MIN(month(o_orderdate)) AS INTEGER) AS first_month,
       CAST(MAX(month(o_orderdate)) AS INTEGER) AS last_month,
       CAST(MAX(day(o_orderdate)) AS INTEGER) AS max_day
FROM orders
GROUP BY 1, 2
ORDER BY yr, qtr
"""

ORACLES["customer_name_funcs"] = """
SELECT c_custkey,
       upper(c_name) AS upper_name,
       substring(c_name, 1, 8) AS prefix8,
       CAST(length(c_name) AS INTEGER) AS name_len,
       c_mktsegment || '|' || c_name AS tagged,
       regexp_replace(c_name, '[0-9]', '#', 'g') AS masked
FROM customer
WHERE c_name LIKE '%1%'
ORDER BY c_custkey
"""

ORACLES["embedding_stats"] = """
WITH staged AS (
    SELECT label,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           CAST(list_max(embedding) AS DOUBLE) AS vmax
    FROM embeddings
)
SELECT label, COUNT(*) AS n,
       MIN(nrm) AS min_norm, MAX(nrm) AS max_norm,
       MIN(first_elem) AS min_first, MAX(vmax) AS max_elem
FROM staged
GROUP BY label
ORDER BY label
"""

ORACLES["rule_catalog"] = f"""
WITH {_MIG},
{_FINDINGS_SQL},
catalog(rule, default_severity, lock_type) AS (VALUES
    ('create-index-not-concurrent', 3, 'SHARE'),
    ('add-column-volatile-default', 3, 'ACCESS EXCLUSIVE'),
    ('add-constraint-without-not-valid', 3, 'ACCESS EXCLUSIVE'),
    ('alter-column-type', 3, 'ACCESS EXCLUSIVE'),
    ('set-not-null', 2, 'ACCESS EXCLUSIVE'),
    ('drop-table', 4, 'ACCESS EXCLUSIVE'),
    ('vacuum-full', 3, 'ACCESS EXCLUSIVE'),
    ('lock-table', 3, 'EXPLICIT'),
    ('rename', 2, 'ACCESS EXCLUSIVE')),
counts AS (
    SELECT rule, COUNT(*) AS n_findings FROM findings GROUP BY rule
)
SELECT c.rule, c.default_severity, c.lock_type,
       COALESCE(n.n_findings, 0) AS n_findings
FROM catalog c LEFT JOIN counts n ON c.rule = n.rule
ORDER BY c.rule
"""

# ORACLES["dedup_embedding"] is defined in the LSH section below (r03):
# it rebuilds the query's md5-literal sign buckets instead of scanning
# all pairs, so the candidate set is structurally identical (ADVICE r02).

# Streaming session_window twin: the batch gap-sessionizer definition
# without the per-user sequence number (undefined in the streaming form).
ORACLES["events_sessionize_stream"] = f"""
WITH flagged AS (
    SELECT
        user_id, ts, event_id, value,
        CASE
            WHEN lag(ts) OVER w IS NULL THEN 1
            WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30 * 60 * 1000000
                THEN 1
            ELSE 0
        END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT
        user_id, ts, value,
        SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_seq
    FROM flagged
)
SELECT
    user_id,
    strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
    strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
    COUNT(*) AS n_events,
    {_dsum('value', 'sum_value')}
FROM sessions
GROUP BY user_id, session_seq
"""

ORACLES["distinct_counts"] = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

ORACLES["conditional_aggs"] = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_big,
       {_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END",
              'finished_value')}
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


ORACLES["events_pivot"] = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events
GROUP BY user_id
ORDER BY user_id
"""

ORACLES["text_normalize"] = """
WITH t AS (
    SELECT doc_id,
           trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g')) AS norm_text
    FROM documents
)
SELECT md5(norm_text) AS norm_hash,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS n_docs,
       CAST(MIN(length(norm_text)) AS INTEGER) AS norm_len
FROM t GROUP BY md5(norm_text)
ORDER BY norm_hash
"""


# --- temporal joins, distribution stats, graph clustering ------------------

_TS_US = "%Y-%m-%d %H:%M:%S.%f"

ORACLES["events_asof_purchase"] = f"""
WITH purchases AS (
    SELECT event_id, user_id, ts, value FROM events
    WHERE event_type = 'purchase'
),
ranked AS (
    SELECT e.event_id, e.user_id, e.ts, e.event_type, e.value,
           p.event_id AS purchase_id, p.ts AS p_ts,
           p.value AS purchase_value,
           ROW_NUMBER() OVER (PARTITION BY e.event_id
                              ORDER BY p.ts DESC, p.event_id DESC) AS rn
    FROM events e
    JOIN purchases p ON p.user_id = e.user_id AND p.ts <= e.ts
    WHERE e.event_type != 'purchase'
)
SELECT event_id, user_id,
       strftime(ts, '{_TS_US}') AS ts,
       event_type, value, purchase_id,
       strftime(p_ts, '{_TS_US}') AS purchase_ts,
       purchase_value,
       epoch_us(ts) - epoch_us(p_ts) AS gap_us
FROM ranked WHERE rn = 1
ORDER BY event_id
"""

ORACLES["events_copair_60s"] = """
SELECT e.user_id,
       e.event_id AS a_id, f.event_id AS b_id,
       e.event_type AS a_type, f.event_type AS b_type,
       epoch_us(f.ts) - epoch_us(e.ts) AS gap_us
FROM events e
JOIN events f
  ON f.user_id = e.user_id
 AND f.ts > e.ts
 AND epoch_us(f.ts) <= epoch_us(e.ts) + 60000000
ORDER BY a_id, b_id
"""

_BANDS = fixtures.price_bands_values()

ORACLES["price_band_join"] = f"""
WITH bands(band_id, lo, hi) AS (VALUES
    {_BANDS})
SELECT band_id, lo, hi,
       COUNT(*) AS n_parts,
       {_davg('p_retailprice', 'avg_price')},
       {_dsum('p_retailprice', 'sum_price')}
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band_id, lo, hi
ORDER BY band_id
"""

ORACLES["supplier_stats"] = """
WITH sums AS (
    SELECT l_suppkey,
           COUNT(*) AS n,
           SUM(CAST(l_quantity AS DECIMAL(18,2))) AS _sq,
           SUM(CAST(l_quantity AS DECIMAL(18,2))
               * CAST(l_quantity AS DECIMAL(18,2))) AS _sqq,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS _sp,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_extendedprice AS DECIMAL(18,2))) AS _spp,
           SUM(CAST(l_quantity AS DECIMAL(18,2))
               * CAST(l_extendedprice AS DECIMAL(18,2))) AS _spq
    FROM lineitem GROUP BY l_suppkey HAVING COUNT(*) > 1
),
d AS (
    SELECT l_suppkey, CAST(n AS BIGINT) AS n, CAST(n AS DOUBLE) AS nd,
           CAST(CAST(_sq AS VARCHAR) AS DOUBLE) AS sq,
           CAST(CAST(_sqq AS VARCHAR) AS DOUBLE) AS sqq,
           CAST(CAST(_sp AS VARCHAR) AS DOUBLE) AS sp,
           CAST(CAST(_spp AS VARCHAR) AS DOUBLE) AS spp,
           CAST(CAST(_spq AS VARCHAR) AS DOUBLE) AS spq
    FROM sums
)
SELECT l_suppkey, n,
       (nd * sqq - sq * sq) / (nd * (nd - 1)) AS var_qty,
       sqrt((nd * sqq - sq * sq) / (nd * (nd - 1))) AS std_qty,
       (nd * spq - sq * sp)
           / (sqrt(nd * sqq - sq * sq) * sqrt(nd * spp - sp * sp))
           AS corr_qty_price
FROM d
ORDER BY l_suppkey
"""

ORACLES["order_price_quartiles"] = """
WITH staged AS (
    SELECT o_orderpriority, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS rn,
           COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM orders
)
SELECT o_orderpriority,
       MAX(n) AS n_orders,
       MAX(CASE WHEN rn = (n + 3) // 4 THEN o_totalprice END) AS q1_price,
       (MAX(CASE WHEN rn = (n + 1) // 2 THEN o_totalprice END)
        + MAX(CASE WHEN rn = (n + 2) // 2 THEN o_totalprice END)) / 2
           AS median_price,
       MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN o_totalprice END) AS q3_price
FROM staged
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLES["events_hopping"] = f"""
WITH e AS (
    SELECT event_type, value, epoch_us(ts) AS us FROM events
),
wins AS (
    SELECT event_type, value,
           (us // 300000000 - i.i) * 300000000 AS ws_us
    FROM e CROSS JOIN (VALUES (0), (1)) AS i(i)
)
SELECT strftime(make_timestamp(ws_us), '%Y-%m-%d %H:%M:%S') AS win_start,
       strftime(make_timestamp(ws_us + 600000000), '%Y-%m-%d %H:%M:%S')
           AS win_end,
       event_type, COUNT(*) AS n_events,
       {_dsum('value', 'sum_value')}
FROM wins
GROUP BY ws_us, event_type
ORDER BY win_start, event_type
"""

ORACLES["dedup_clusters"] = f"""
WITH RECURSIVE {_JACC_CTES},
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM jacc
    UNION ALL
    SELECT doc_b AS a, doc_a AS b FROM jacc
),
reach AS (
    SELECT doc_id AS node, doc_id AS root FROM documents
    UNION
    SELECT e.b AS node, r.root FROM reach r JOIN edges e ON e.a = r.node
),
comp AS (
    SELECT node AS doc_id, MIN(root) AS cluster_id FROM reach GROUP BY node
)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM comp
ORDER BY doc_id
"""

_ALL_STOPS = ",".join(
    f"'{w}'" for words in TX.STOPWORDS.values() for w in words
)

ORACLES["top_terms"] = f"""
WITH tok AS (
    SELECT source, unnest(list_distinct({_TOKS})) AS token FROM documents
),
counts AS (
    SELECT source, token, COUNT(*) AS df
    FROM tok WHERE token NOT IN ({_ALL_STOPS})
    GROUP BY source, token
),
ranked AS (
    SELECT source, token, df,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY df DESC, token ASC) AS rnk
    FROM counts
)
SELECT source, token, df, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 5
ORDER BY source, rnk
"""

# Streaming twins share their batch oracles (the streaming plans must
# produce byte-identical results when drained with availableNow).
ORACLES["events_hopping_stream"] = ORACLES["events_hopping"]
ORACLES["events_copair_stream"] = ORACLES["events_copair_60s"]


# --- relational wave 2 -----------------------------------------------------

ORACLES["cube_status_priority"] = f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
       COUNT(*) AS n_orders,
       {_dsum('o_totalprice', 'sum_price')}
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus, o_orderpriority
"""

ORACLES["orders_above_cust_avg"] = """
SELECT o_orderkey, o_custkey, o_totalprice, cust_avg
FROM (
    SELECT o_orderkey, o_custkey, o_totalprice,
           (SELECT CAST(CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(28,10)))
                             AS VARCHAR) AS DOUBLE)
                   / COUNT(o2.o_totalprice)
            FROM orders o2 WHERE o2.o_custkey = o.o_custkey) AS cust_avg
    FROM orders o
)
WHERE o_totalprice > 1.5 * cust_avg
ORDER BY o_orderkey
"""

ORACLES["nation_balance_fullouter"] = f"""
WITH c AS (
    SELECT c_nationkey,
           COUNT(*) AS _nc,
           {_dsum('c_acctbal', '_cb')}
    FROM customer GROUP BY c_nationkey
),
s AS (
    SELECT s_nationkey,
           COUNT(*) AS _ns,
           {_dsum('s_acctbal', '_sb')}
    FROM supplier GROUP BY s_nationkey
)
SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
       CAST(COALESCE(_nc, 0) AS BIGINT) AS n_customers,
       COALESCE(_cb, CAST(0 AS DOUBLE)) AS cust_bal,
       CAST(COALESCE(_ns, 0) AS BIGINT) AS n_suppliers,
       COALESCE(_sb, CAST(0 AS DOUBLE)) AS supp_bal
FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
ORDER BY nationkey
"""

ORACLES["set_ops_multiset"] = """
SELECT 'except_all' AS op, user_id FROM (
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'error'
)
UNION ALL
SELECT 'intersect_all' AS op, user_id FROM (
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT ALL
    SELECT user_id FROM events WHERE event_type = 'error'
)
ORDER BY op, user_id
"""

ORACLES["big_orders_having"] = f"""
WITH big AS (
    SELECT l_orderkey,
           {_dsum('l_quantity', 'sum_qty')}
    FROM lineitem GROUP BY l_orderkey
)
SELECT o_orderkey, o_custkey, c_name,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
       o_totalprice, sum_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE sum_qty > 250
ORDER BY o_orderkey
"""

ORACLES["promo_revenue_share"] = f"""
WITH sums AS (
    SELECT
        {_dsum(f"CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE} ELSE 0 END", 'promo_revenue')},
        {_dsum(_DISC_PRICE, 'total_revenue')}
    FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT promo_revenue, total_revenue,
       100.0 * promo_revenue / total_revenue AS promo_share
FROM sums
"""


# --- training-data pipeline primitives -------------------------------------

ORACLES["deterministic_sample"] = """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'
ORDER BY doc_id
"""

ORACLES["train_val_test_split"] = f"""
WITH tagged AS (
    SELECT CASE
               WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a' THEN 'test'
               WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '34' THEN 'val'
               ELSE 'train'
           END AS split,
           n_chars
    FROM documents
)
SELECT split, COUNT(*) AS n_docs,
       {_dsum('n_chars', 'sum_chars')},
       {_davg('n_chars', 'avg_chars')}
FROM tagged
GROUP BY split
ORDER BY split
"""

ORACLES["zscore_events"] = """
WITH moments AS (
    SELECT event_type,
           CAST(COUNT(*) AS DOUBLE) AS nd,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS s,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))
                         * CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS ss
    FROM events GROUP BY event_type
)
SELECT event_id, e.event_type, value,
       (value - s / nd) / sqrt((nd * ss - s * s) / (nd * (nd - 1))) AS zvalue
FROM events e JOIN moments m ON e.event_type = m.event_type
ORDER BY event_id
"""

ORACLES["funnel_steps"] = """
WITH views AS (
    SELECT user_id, MIN(ts) AS v_ts FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
clicks AS (
    SELECT e.user_id, MIN(e.ts) AS c_ts
    FROM events e JOIN views v ON e.user_id = v.user_id AND e.ts >= v.v_ts
    WHERE e.event_type = 'click' GROUP BY e.user_id
),
purchases AS (
    SELECT e.user_id, MIN(e.ts) AS p_ts
    FROM events e JOIN clicks c ON e.user_id = c.user_id AND e.ts >= c.c_ts
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT 1 AS stage, 'viewed' AS step, COUNT(*) AS n FROM views
UNION ALL
SELECT 2 AS stage, 'clicked_after_view' AS step, COUNT(*) AS n FROM clicks
UNION ALL
SELECT 3 AS stage, 'purchased_after_click' AS step, COUNT(*) AS n FROM purchases
ORDER BY stage
"""

ORACLES["top_supplier_per_part"] = f"""
WITH per_supp AS (
    SELECT l_partkey, l_suppkey,
           {_dsum('l_quantity', 'supplied_qty')}
    FROM lineitem GROUP BY l_partkey, l_suppkey
),
ranked AS (
    SELECT l_partkey, l_suppkey, supplied_qty,
           ROW_NUMBER() OVER (PARTITION BY l_partkey
                              ORDER BY supplied_qty DESC, l_suppkey ASC) AS rnk
    FROM per_supp
)
SELECT p_partkey, p_brand, l_suppkey AS top_suppkey, supplied_qty
FROM ranked JOIN part ON l_partkey = p_partkey
WHERE rnk = 1
ORDER BY p_partkey
"""

ORACLES["orders_exists_notexists"] = """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05
)
AND NOT EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_tax > 0.07
)
ORDER BY o_orderkey
"""

ORACLES["rich_idle_customers"] = f"""
SELECT c_mktsegment, COUNT(*) AS n_customers,
       {_dsum('c_acctbal', 'total_bal')}
FROM customer c
WHERE c_acctbal > (
    SELECT CAST(CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(28,10)))
                     AS VARCHAR) AS DOUBLE) / COUNT(c2.c_acctbal)
    FROM customer c2 WHERE c2.c_acctbal > 0
)
AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

ORACLES["price_deciles"] = f"""
WITH binned AS (
    SELECT o_totalprice,
           NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
    FROM orders
)
SELECT decile, COUNT(*) AS n_orders,
       MIN(o_totalprice) AS lo_price,
       MAX(o_totalprice) AS hi_price,
       {_davg('o_totalprice', 'avg_price')}
FROM binned
GROUP BY decile
ORDER BY decile
"""

ORACLES["user_value_moving_avg"] = """
SELECT event_id, user_id, value,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) OVER w AS VARCHAR)
            AS DOUBLE)
           / COUNT(*) OVER w AS moving_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""

ORACLES["stratified_sample"] = f"""
WITH rates(lang, cut) AS (VALUES
    ('en', '20'), ('de', '80'), ('es', '80'), ('fr', '80'),
    ('zh', 'c0'), ('unknown', 'ff')
)
SELECT d.lang, COUNT(*) AS n_kept,
       {_dsum('n_chars', 'sum_chars')}
FROM documents d LEFT JOIN rates r ON d.lang = r.lang
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < COALESCE(r.cut, 'ff')
GROUP BY d.lang
ORDER BY d.lang
"""

ORACLES["latest_event_per_user"] = """
SELECT user_id,
       arg_max(event_type, ts) AS last_type,
       arg_max(event_id, ts) AS last_event_id,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
       COUNT(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY user_id
"""

ORACLES["doc_chunks"] = f"""
WITH staged AS (
    SELECT doc_id, {_TOKS} AS toks FROM documents
    WHERE len({_TOKS}) > 0
),
chunks AS (
    SELECT doc_id,
           unnest(range(0, (len(toks) - 1) // 20 + 1)) AS chunk_idx,
           len(toks) AS n_toks
    FROM staged
)
SELECT CAST(chunk_idx AS INTEGER) AS chunk_idx,
       COUNT(*) AS n_chunks,
       CAST(MIN(LEAST(n_toks - chunk_idx * 20, 20)) AS INTEGER) AS min_tokens,
       CAST(MAX(LEAST(n_toks - chunk_idx * 20, 20)) AS INTEGER) AS max_tokens,
       CAST(SUM(LEAST(n_toks - chunk_idx * 20, 20)) AS BIGINT) AS sum_tokens
FROM chunks
GROUP BY chunk_idx
ORDER BY chunk_idx
"""

# wide→long melt over the full-outer rollup (UNION ALL is the ANSI form
# of UNPIVOT; 'side' carries the source column name like Spark's unpivot)
ORACLES["unpivot_balances"] = f"""
WITH wide AS (
    {ORACLES["nation_balance_fullouter"].replace("ORDER BY nationkey", "")}
)
SELECT nationkey, 'cust_bal' AS side, cust_bal AS balance FROM wide
UNION ALL
SELECT nationkey, 'supp_bal' AS side, supp_bal AS balance FROM wide
ORDER BY nationkey, side
"""

ORACLES["priority_price_distribution"] = """
SELECT o_orderpriority, o_orderkey, o_totalprice,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
ORDER BY o_orderkey
"""

ORACLES["user_event_types"] = """
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',')
           AS types_seen,
       CAST(len(list(DISTINCT event_type)) AS INTEGER) AS n_types
FROM events
GROUP BY user_id
ORDER BY user_id
"""

ORACLES["sql_revenue_by_nation"] = """
SELECT n_name,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS VARCHAR)
            AS DOUBLE) AS total_revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""

ORACLES["hourly_event_spine"] = f"""
WITH bounds AS (
    SELECT date_trunc('hour', MIN(ts)) AS d0,
           date_trunc('hour', MAX(ts)) AS d1
    FROM events
),
spine AS (
    SELECT unnest(generate_series(d0, d1, INTERVAL 1 HOUR)) AS hour
    FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
hourly AS (
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS _n,
           {_dsum('value', '_sv')}
    FROM events GROUP BY date_trunc('hour', ts), event_type
)
SELECT strftime(s.hour, '%Y-%m-%d %H:%M:%S') AS hour,
       t.event_type,
       CAST(COALESCE(_n, 0) AS BIGINT) AS n_events,
       COALESCE(_sv, CAST(0 AS DOUBLE)) AS sum_value
FROM spine s
CROSS JOIN types t
LEFT JOIN hourly h ON h.hour = s.hour AND h.event_type = t.event_type
ORDER BY hour, t.event_type
"""

ORACLES["orders_profile"] = """
WITH one AS (
    SELECT COUNT(*) AS _total,
           COUNT(o_orderkey) AS nn_ok, COUNT(DISTINCT o_orderkey) AS nd_ok,
           COUNT(o_custkey) AS nn_ck, COUNT(DISTINCT o_custkey) AS nd_ck,
           COUNT(o_orderstatus) AS nn_os, COUNT(DISTINCT o_orderstatus) AS nd_os,
           COUNT(o_totalprice) AS nn_tp, COUNT(DISTINCT o_totalprice) AS nd_tp,
           COUNT(o_orderdate) AS nn_od, COUNT(DISTINCT o_orderdate) AS nd_od,
           COUNT(o_orderpriority) AS nn_op, COUNT(DISTINCT o_orderpriority) AS nd_op
    FROM orders
)
SELECT 'o_orderkey' AS column_name, _total - nn_ok AS n_nulls, nd_ok AS n_distinct FROM one
UNION ALL
SELECT 'o_custkey', _total - nn_ck, nd_ck FROM one
UNION ALL
SELECT 'o_orderstatus', _total - nn_os, nd_os FROM one
UNION ALL
SELECT 'o_totalprice', _total - nn_tp, nd_tp FROM one
UNION ALL
SELECT 'o_orderdate', _total - nn_od, nd_od FROM one
UNION ALL
SELECT 'o_orderpriority', _total - nn_op, nd_op FROM one
ORDER BY column_name
"""

ORACLES["label_centroids"] = """
WITH exploded AS (
    SELECT vec_id, label,
           unnest(range(0, len(embedding))) AS dim,
           CAST(embedding[CAST(unnest(range(0, len(embedding))) AS INTEGER) + 1]
                AS DOUBLE) AS x
    FROM embeddings
),
cells AS (
    SELECT label, dim,
           list(x ORDER BY vec_id) AS xs
    FROM exploded GROUP BY label, dim
)
SELECT label, CAST(dim AS INTEGER) AS dim,
       CAST(len(xs) AS BIGINT) AS n_vecs,
       list_sum(xs) / len(xs) AS centroid
FROM cells
ORDER BY label, dim
"""

ORACLES["user_value_10min_sum"] = """
SELECT event_id, user_id, value,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) OVER w AS VARCHAR)
            AS DOUBLE) AS sum_10min,
       COUNT(*) OVER w AS n_10min
FROM (SELECT event_id, user_id, value, epoch_us(ts) AS us FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY us
             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""

ORACLES["weighted_sample"] = f"""
WITH tagged AS (
    SELECT lang, n_chars,
           lpad(substr(md5(CAST(doc_id AS VARCHAR)), 1, 6), 7, '0') AS h,
           lpad(lower(to_hex(CAST(floor(
               LEAST(n_chars, 500) / 500.0 * 16777216.0) AS BIGINT))),
               7, '0') AS thr
    FROM documents
)
SELECT lang, COUNT(*) AS n_kept,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       {_davg('n_chars', 'avg_chars')}
FROM tagged
WHERE h < thr
GROUP BY lang
ORDER BY lang
"""

ORACLES["profit_by_nation_year"] = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       {_dsum(f"({_DISC_PRICE}) - CAST(p_retailprice AS DECIMAL(18,2))"
              " * CAST(0.06 AS DECIMAL(4,2))"
              " * CAST(l_quantity AS DECIMAL(18,2))", 'sum_profit')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%a%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""

ORACLES["market_share_by_year"] = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       {_dsum(f"CASE WHEN n_name = 'NATION_5' THEN {_DISC_PRICE} ELSE 0 END",
              'target_revenue')},
       {_dsum(_DISC_PRICE, 'region_revenue')},
       CAST(CAST(SUM(CAST(CASE WHEN n_name = 'NATION_5' THEN {_DISC_PRICE}
                          ELSE 0 END AS {_DEC})) AS VARCHAR) AS DOUBLE)
           / CAST(CAST(SUM(CAST({_DISC_PRICE} AS {_DEC})) AS VARCHAR)
                  AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE n_regionkey = 0
GROUP BY year(o_orderdate)
ORDER BY o_year
"""

ORACLES["grouping_sets_orders"] = f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
       COUNT(*) AS n_orders,
       {_dsum('o_totalprice', 'sum_price')}
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
ORDER BY gid, o_orderstatus, o_orderpriority
"""

# the star-algorithm twin must produce the identical clustering
ORACLES["dedup_clusters_star"] = ORACLES["dedup_clusters"]

ORACLES["scd2_user_status"] = f"""
SELECT user_id, event_type AS status,
       strftime(ts, '{_TS_US}') AS effective_from,
       COALESCE(strftime(lead(ts) OVER w, '{_TS_US}'),
                '9999-12-31 00:00:00.000000') AS effective_to,
       lead(ts) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, effective_from
"""

ORACLES["cluster_representatives"] = f"""
WITH RECURSIVE {_JACC_CTES},
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM jacc
    UNION ALL
    SELECT doc_b AS a, doc_a AS b FROM jacc
),
reach AS (
    SELECT doc_id AS node, doc_id AS root FROM documents
    UNION
    SELECT e.b AS node, r.root FROM reach r JOIN edges e ON e.a = r.node
),
comp AS (
    SELECT node AS doc_id, MIN(root) AS cluster_id FROM reach GROUP BY node
),
quality AS ({ORACLES["quality_score"]}),
ranked AS (
    SELECT c.cluster_id, q.doc_id, q.score,
           ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                              ORDER BY q.score DESC, q.doc_id ASC) AS rnk
    FROM comp c JOIN quality q USING (doc_id)
)
SELECT cluster_id, doc_id AS rep_doc_id, score AS rep_score
FROM ranked WHERE rnk = 1
ORDER BY cluster_id
"""

ORACLES["disjunctive_revenue"] = f"""
WITH tagged AS (
    SELECT CASE WHEN p_brand = 'Brand#1' AND p_size <= 10
                     AND l_quantity <= 20
                THEN 'brand1_small' ELSE 'brand2_big' END AS clause,
           l_extendedprice, l_discount
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 25
           AND l_quantity > 20)
)
SELECT clause, COUNT(*) AS n_items,
       {_dsum(_DISC_PRICE, 'revenue')}
FROM tagged
GROUP BY clause
ORDER BY clause
"""

ORACLES["monthly_revenue_growth"] = f"""
WITH monthly AS (
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           COUNT(*) AS n_orders,
           {_dsum('o_totalprice', 'revenue')}
    FROM orders
    GROUP BY strftime(o_orderdate, '%Y-%m')
)
SELECT month, n_orders, revenue,
       revenue / lag(revenue) OVER (ORDER BY month) - 1.0 AS mom_growth
FROM monthly
ORDER BY month
"""

ORACLES["nation_pair_trade"] = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       COUNT(*) AS n_items,
       {_dsum(_DISC_PRICE, 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name < n2.n_name
GROUP BY n1.n_name, n2.n_name
ORDER BY supp_nation, cust_nation
"""

ORACLES["null_semantics"] = f"""
WITH {_MIG}
SELECT version,
       down_sql IS NULL AS no_down,
       COALESCE(down_sql, '-- irreversible') AS down_or_marker,
       NULLIF(name, 'create_users') AS name_nullified,
       down_sql IS NOT DISTINCT FROM up_sql AS down_equals_up
FROM migrations
ORDER BY version
"""

ORACLES["selective_distinct"] = """
SELECT o_orderstatus,
       COUNT(DISTINCT CASE WHEN o_totalprice > 150000
                           THEN o_custkey END) AS big_spenders,
       COUNT(DISTINCT o_custkey) AS all_customers
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""

ORACLES["user_type_overlap"] = """
WITH sets AS (
    SELECT user_id,
           list(DISTINCT CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                              THEN event_type END)
               FILTER (WHERE ts < TIMESTAMP '2024-01-16 00:00:00') AS h1,
           list(DISTINCT CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                              THEN event_type END)
               FILTER (WHERE ts >= TIMESTAMP '2024-01-16 00:00:00') AS h2
    FROM events
    GROUP BY user_id
)
SELECT user_id,
       CAST(COALESCE(len(h1), 0) AS INTEGER) AS n_types_h1,
       CAST(COALESCE(len(h2), 0) AS INTEGER) AS n_types_h2,
       CAST(COALESCE(len(list_intersect(h1, h2)), 0) AS INTEGER) AS n_common,
       CAST(COALESCE(len(list_distinct(list_concat(h1, h2))), 0) AS INTEGER)
           AS n_all
FROM sets
ORDER BY user_id
"""

# salting must be invisible to results: the oracle is the PLAIN join
ORACLES["skewed_join_salted"] = f"""
SELECT o_orderpriority, COUNT(*) AS n_items,
       {_dsum(_DISC_PRICE, 'revenue')}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLES["typo_distance"] = """
SELECT n_nationkey, n_name,
       CAST(levenshtein(lower(n_name), 'nation_1') AS INTEGER) AS edit_dist
FROM nation
ORDER BY n_nationkey
"""

ORACLES["corpus_summary"] = f"""
WITH quality AS ({ORACLES["quality_score"]}),
staged AS (
    SELECT d.source, d.lang,
           md5(array_to_string({_TOKS}, ' ')) AS fp,
           len({_TOKS}) AS n_tokens,
           q.score
    FROM documents d JOIN quality q USING (doc_id)
)
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT fp) AS n_unique,
       CAST(COUNT(*) - COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*) AS dup_ratio,
       COUNT(DISTINCT lang) AS n_langs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(score) AS min_quality,
       MAX(score) AS max_quality
FROM staged
GROUP BY source
ORDER BY source
"""

# label_propagation_lang: three frontier-frozen majority rounds over
# the jacc near-dup graph, unrolled (same freeze/tie rules as
# operators/graph.py label_propagation).
ORACLES["label_propagation_lang"] = f"""
WITH {_JACC_CTES},
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM jacc
    UNION ALL SELECT doc_b AS a, doc_a AS b FROM jacc
),
l0 AS (
    SELECT doc_id AS node,
           CASE WHEN doc_id % 5 = 0 THEN lang END AS lbl,
           (doc_id % 5 = 0) AS seeded
    FROM documents
),
v1 AS (
    SELECT e.b AS node, l.lbl, COUNT(*) AS c
    FROM edges e JOIN l0 l ON l.node = e.a
    WHERE l.lbl IS NOT NULL
    GROUP BY e.b, l.lbl
),
p1 AS (
    SELECT node, lbl AS voted FROM (
        SELECT node, lbl,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, lbl) AS rn
        FROM v1
    ) WHERE rn = 1
),
l1 AS (
    SELECT l0.node, COALESCE(l0.lbl, p1.voted) AS lbl, l0.seeded
    FROM l0 LEFT JOIN p1 USING (node)
),
v2 AS (
    SELECT e.b AS node, l.lbl, COUNT(*) AS c
    FROM edges e JOIN l1 l ON l.node = e.a
    WHERE l.lbl IS NOT NULL
    GROUP BY e.b, l.lbl
),
p2 AS (
    SELECT node, lbl AS voted FROM (
        SELECT node, lbl,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, lbl) AS rn
        FROM v2
    ) WHERE rn = 1
),
l2 AS (
    SELECT l1.node, COALESCE(l1.lbl, p2.voted) AS lbl, l1.seeded
    FROM l1 LEFT JOIN p2 USING (node)
),
v3 AS (
    SELECT e.b AS node, l.lbl, COUNT(*) AS c
    FROM edges e JOIN l2 l ON l.node = e.a
    WHERE l.lbl IS NOT NULL
    GROUP BY e.b, l.lbl
),
p3 AS (
    SELECT node, lbl AS voted FROM (
        SELECT node, lbl,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, lbl) AS rn
        FROM v3
    ) WHERE rn = 1
),
l3 AS (
    SELECT l2.node, COALESCE(l2.lbl, p3.voted) AS lbl, l2.seeded
    FROM l2 LEFT JOIN p3 USING (node)
),
final AS (
    SELECT l3.node, l3.lbl, l3.seeded, d.lang
    FROM l3 JOIN documents d ON d.doc_id = l3.node
)
SELECT COALESCE(lbl, '<unlabeled>') AS label,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN seeded THEN 1 ELSE 0 END) AS BIGINT) AS n_seeds,
       CAST(SUM(CASE WHEN NOT seeded AND lbl IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_propagated,
       CAST(SUM(CASE WHEN NOT seeded AND lbl = lang THEN 1 ELSE 0 END)
            AS BIGINT) AS n_propagated_correct
FROM final
GROUP BY 1 ORDER BY label
"""

ORACLES["user_first_last_events"] = """
SELECT DISTINCT user_id,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type) OVER w AS last_type,
       nth_value(event_type, 2) OVER w AS second_type,
       first_value(value) OVER w AS first_value,
       last_value(value) OVER w AS last_value,
       COUNT(*) OVER w AS n_events
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY user_id
"""

# hourly_interpolate: spine + IGNORE NULLS neighbor frames; the
# interpolation expression tree mirrors Spark's operation order.
ORACLES["hourly_interpolate"] = """
WITH bounds AS (
    SELECT date_trunc('hour', MIN(ts)) AS d0,
           date_trunc('hour', MAX(ts)) AS d1
    FROM events
),
spine AS (
    SELECT unnest(generate_series(d0, d1, INTERVAL 1 HOUR)) AS hour
    FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
hourly AS (
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS _n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR)
                AS DOUBLE) / COUNT(value) AS _v
    FROM events GROUP BY date_trunc('hour', ts), event_type
),
grid AS (
    SELECT s.hour, t.event_type, h._n, h._v,
           CAST(epoch(s.hour) AS BIGINT) // 3600 AS idx
    FROM spine s
    CROSS JOIN types t
    LEFT JOIN hourly h ON h.hour = s.hour AND h.event_type = t.event_type
),
nb AS (
    SELECT *,
           last_value(CASE WHEN _v IS NOT NULL THEN idx END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS p_idx,
           last_value(CASE WHEN _v IS NOT NULL THEN _v END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS p_v,
           first_value(CASE WHEN _v IS NOT NULL THEN idx END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY idx
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS n_idx,
           first_value(CASE WHEN _v IS NOT NULL THEN _v END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY idx
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS n_v
    FROM grid
)
SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       CAST(COALESCE(_n, 0) AS BIGINT) AS n_events,
       _v AS avg_value,
       CASE WHEN _v IS NOT NULL THEN _v
            ELSE p_v + (n_v - p_v)
                 * CAST(idx - p_idx AS DOUBLE)
                 / CAST(n_idx - p_idx AS DOUBLE)
       END AS value_filled,
       (_v IS NULL AND (CASE WHEN _v IS NOT NULL THEN _v
            ELSE p_v + (n_v - p_v)
                 * CAST(idx - p_idx AS DOUBLE)
                 / CAST(n_idx - p_idx AS DOUBLE) END) IS NOT NULL)
           AS is_interpolated
FROM nb
ORDER BY hour, event_type
"""

# price_percentiles_cont: explicit interpolation arithmetic (NOT the
# engine's percentile_cont builtin) mirroring the Spark expression
# order, over the same rank positions.
ORACLES["price_percentiles_cont"] = """
WITH ranked AS (
    SELECT o_orderpriority, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS rn,
           COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM orders
),
classes AS (SELECT DISTINCT o_orderpriority, n FROM ranked),
pv AS (
    SELECT * FROM (VALUES
        ('p25', CAST(0.25 AS DOUBLE)),
        ('p50', CAST(0.5 AS DOUBLE)),
        ('p75', CAST(0.75 AS DOUBLE))) v(p_label, p)
),
probes AS (
    SELECT c.o_orderpriority, pv.p_label,
           CAST(FLOOR(pv.p * CAST(c.n - 1 AS DOUBLE) + 1) AS BIGINT)
               AS lo_rn,
           LEAST(CAST(FLOOR(pv.p * CAST(c.n - 1 AS DOUBLE) + 1) AS BIGINT)
                 + 1, c.n) AS hi_rn,
           (pv.p * CAST(c.n - 1 AS DOUBLE) + 1)
           - FLOOR(pv.p * CAST(c.n - 1 AS DOUBLE) + 1) AS frac
    FROM classes c CROSS JOIN pv
),
hit AS (
    SELECT pr.o_orderpriority, pr.p_label, pr.frac,
           MIN(CASE WHEN r.rn = pr.lo_rn THEN r.o_totalprice END) AS v_lo,
           MIN(CASE WHEN r.rn = pr.hi_rn THEN r.o_totalprice END) AS v_hi
    FROM probes pr
    JOIN ranked r ON r.o_orderpriority = pr.o_orderpriority
               AND (r.rn = pr.lo_rn OR r.rn = pr.hi_rn)
    GROUP BY pr.o_orderpriority, pr.p_label, pr.frac
)
SELECT o_orderpriority,
       MIN(CASE WHEN p_label = 'p25'
                THEN v_lo + (v_hi - v_lo) * frac END) AS p25,
       MIN(CASE WHEN p_label = 'p50'
                THEN v_lo + (v_hi - v_lo) * frac END) AS p50,
       MIN(CASE WHEN p_label = 'p75'
                THEN v_lo + (v_hi - v_lo) * frac END) AS p75
FROM hit
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

# events_chi2: per-cell doubles from integer cross-products, summed
# order-free via decimal(38,18) staging. Spark dayofweek is 1-based
# (Sunday=1), DuckDB 0-based — hence the +1.
ORACLES["events_chi2"] = """
WITH cells AS (
    SELECT event_type, dayofweek(ts) + 1 AS dow, COUNT(*) AS o
    FROM events GROUP BY 1, 2
),
rm AS (SELECT event_type, SUM(o) AS r FROM cells GROUP BY event_type),
cm AS (SELECT dow, SUM(o) AS c FROM cells GROUP BY dow),
tm AS (SELECT SUM(o) AS t FROM cells),
staged AS (
    SELECT ce.event_type, ce.dow,
           CAST(ce.o * tm.t - rm.r * cm.c AS DOUBLE) AS num,
           CAST(rm.r * cm.c AS DOUBLE) AS rc,
           CAST(tm.t AS DOUBLE) AS td,
           tm.t AS t
    FROM cells ce
    JOIN rm ON ce.event_type = rm.event_type
    JOIN cm ON ce.dow = cm.dow
    CROSS JOIN tm
),
terms AS (
    SELECT event_type, dow, t, (num * num) / rc / td AS term FROM staged
)
-- double->decimal must route through VARCHAR: DuckDB's direct cast
-- scales in floating point (drift ~1e-15 over 35 cells), while
-- Spark's cast parses the shortest string repr with HALF_UP --
-- the VARCHAR bridge reproduces exactly that
SELECT CAST(CAST(SUM(CAST(CAST(term AS VARCHAR) AS DECIMAL(38,18)))
                 AS VARCHAR) AS DOUBLE)
           AS chi2,
       COUNT(*) AS n_cells,
       CAST((COUNT(DISTINCT event_type) - 1) * (COUNT(DISTINCT dow) - 1)
            AS BIGINT) AS dof,
       CAST(MAX(t) AS BIGINT) AS n_events
FROM terms
"""

# revenue_trend_ols: sufficient statistics in integer cents (scale-0
# decimals — exact), doubles only in the final expression tree, which
# mirrors the Spark expression ORDER exactly (intercept re-derives
# slope inline the way the Spark plan does). Integer→DOUBLE conversions
# route through VARCHAR (DuckDB's DECIMAL→DOUBLE is not correctly
# rounded).
ORACLES["revenue_trend_ols"] = """
WITH m AS (
    SELECT (year(o_orderdate) * 12 + month(o_orderdate)) AS x,
           SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS DECIMAL(18,0))) AS y
    FROM orders GROUP BY 1
),
s AS (
    SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx,
           SUM(y) AS sy, SUM(x * y) AS sxy, SUM(y * y) AS syy
    FROM m
),
d AS (
    SELECT n,
           CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS numd,
           CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS denxd,
           CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS denyd,
           CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
           CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd
    FROM s
)
SELECT n AS n_months,
       numd / denxd AS slope,
       (syd - (numd / denxd) * sxd) / n AS intercept,
       (numd * numd) / (denxd * denyd) AS r2
FROM d
"""

# hybrid_search_rrf: keyword leg = keyword_search's integer TF-IDF;
# vector leg = exact cosine vs doc 0; RRF K=60 with explicit DOUBLE
# division (a bare 1.0 literal is DECIMAL in DuckDB).
ORACLES["hybrid_search_rrf"] = f"""
WITH toks AS (
    SELECT doc_id, unnest(list_filter(string_split_regex(lower(text),
        '[^a-z]+'), x -> x != '')) AS tok FROM documents
),
hits AS (
    SELECT doc_id, tok FROM toks WHERE tok IN ('hash', 'join', 'stream')
),
tf AS (
    SELECT doc_id, tok, COUNT(*) AS tf FROM hits GROUP BY doc_id, tok
),
idf AS (
    SELECT tok,
           (CAST(1000000000 AS BIGINT)
            * (SELECT COUNT(*) FROM documents)) // COUNT(*) AS idf_int
    FROM tf GROUP BY tok
),
scored AS (
    SELECT t.doc_id, CAST(SUM(t.tf * i.idf_int) AS BIGINT) AS score_int
    FROM tf t JOIN idf i USING (tok) GROUP BY t.doc_id
),
kw AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY score_int DESC, doc_id) AS kw_rank
    FROM (SELECT * FROM scored ORDER BY score_int DESC, doc_id LIMIT 50)
),
prepared AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
vpairs AS (
    SELECT n.vec_id AS doc_id,
           list_dot_product(q.v, n.v) / (q.nrm * n.nrm) AS cos_sim
    FROM prepared q, prepared n
    WHERE q.vec_id = 0 AND n.vec_id != 0
),
vec AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS vec_rank
    FROM (SELECT * FROM vpairs ORDER BY cos_sim DESC, doc_id LIMIT 50)
),
fused AS (
    SELECT COALESCE(k.doc_id, v.doc_id) AS doc_id, k.kw_rank, v.vec_rank,
           COALESCE(CAST(1 AS DOUBLE) / (60 + k.kw_rank), 0.0)
           + COALESCE(CAST(1 AS DOUBLE) / (60 + v.vec_rank), 0.0)
               AS rrf_score
    FROM kw k FULL OUTER JOIN vec v ON k.doc_id = v.doc_id
)
SELECT doc_id, CAST(kw_rank AS INT) AS kw_rank,
       CAST(vec_rank AS INT) AS vec_rank, rrf_score
FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10
"""

# kmeans_embeddings: the 2-iteration fixed-point Lloyd trajectory
# unrolled — every quantity is an integer (quantize once, exact integer
# distances, floored integer-mean updates via the pmod trick), so the
# SQL replays the identical state sequence. Mirrors
# operators/kmeans.py assign/update exactly.
_KM_ASSIGN = """
    SELECT pid, cid, dist FROM (
        SELECT p.pid, c.cid,
               SUM((p.ival - c.cval) * (p.ival - c.cval)) AS dist,
               ROW_NUMBER() OVER (
                   PARTITION BY p.pid
                   ORDER BY SUM((p.ival - c.cval) * (p.ival - c.cval)),
                            c.cid) AS rn
        FROM pts p JOIN {cent} c ON p.pos = c.pos
        GROUP BY p.pid, c.cid
    ) WHERE rn = 1
"""

_KM_UPDATE = """
    SELECT a.cid, p.pos,
           (SUM(p.ival) - ((SUM(p.ival) % COUNT(*)) + COUNT(*)) % COUNT(*))
               // COUNT(*) AS cval
    FROM {asg} a JOIN pts p ON a.pid = p.pid
    GROUP BY a.cid, p.pos
"""

ORACLES["kmeans_embeddings"] = f"""
WITH pts AS (
    SELECT vec_id AS pid, u.pos,
           -- CAST both operands: DuckDB parses 1000000.0 as DECIMAL,
           -- and FLOAT * DECIMAL rounds differently from the engine's
           -- float->double * double (33 off-by-one floors at sf0.001)
           CAST(FLOOR(CAST(embedding[u.pos] AS DOUBLE)
                      * CAST(1000000 AS DOUBLE)) AS BIGINT) AS ival
    FROM embeddings, LATERAL generate_series(1, 16) AS u(pos)
),
seeds AS (
    SELECT pid, ROW_NUMBER() OVER (ORDER BY pid) - 1 AS cid
    FROM (SELECT pid FROM pts GROUP BY pid ORDER BY pid LIMIT 4)
),
c0 AS (
    SELECT s.cid, p.pos, p.ival AS cval
    FROM seeds s JOIN pts p ON s.pid = p.pid
),
a1 AS ({_KM_ASSIGN.format(cent="c0")}),
c1 AS ({_KM_UPDATE.format(asg="a1")}),
a2 AS ({_KM_ASSIGN.format(cent="c1")}),
c2 AS ({_KM_UPDATE.format(asg="a2")}),
af AS ({_KM_ASSIGN.format(cent="c2")}),
csums AS (SELECT cid, CAST(SUM(cval) AS BIGINT) AS c_sum FROM c2 GROUP BY cid)
SELECT CAST(a.cid AS INT) AS cid,
       COUNT(*) AS n_members,
       CAST(SUM(a.dist) AS BIGINT) AS inertia,
       MIN(cs.c_sum) AS c_sum
FROM af a JOIN csums cs ON a.cid = cs.cid
GROUP BY a.cid
ORDER BY cid
"""

# similarity_ivf_trained: the kmeans trajectory (same CTE fragments) →
# query multi-probe (2 nearest trained cells, integer metric) → exact
# 64-dim cosine re-rank inside probed cells only.
ORACLES["similarity_ivf_trained"] = f"""
WITH pts AS (
    SELECT vec_id AS pid, u.pos,
           CAST(FLOOR(CAST(embedding[u.pos] AS DOUBLE)
                      * CAST(1000000 AS DOUBLE)) AS BIGINT) AS ival
    FROM embeddings, LATERAL generate_series(1, 16) AS u(pos)
),
seeds AS (
    SELECT pid, ROW_NUMBER() OVER (ORDER BY pid) - 1 AS cid
    FROM (SELECT pid FROM pts GROUP BY pid ORDER BY pid LIMIT 4)
),
c0 AS (
    SELECT s.cid, p.pos, p.ival AS cval
    FROM seeds s JOIN pts p ON s.pid = p.pid
),
a1 AS ({_KM_ASSIGN.format(cent="c0")}),
c1 AS ({_KM_UPDATE.format(asg="a1")}),
a2 AS ({_KM_ASSIGN.format(cent="c1")}),
c2 AS ({_KM_UPDATE.format(asg="a2")}),
lists AS ({_KM_ASSIGN.format(cent="c2")}),
probes AS (
    SELECT pid AS qid, cid FROM (
        SELECT p.pid, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY p.pid
                   ORDER BY SUM((p.ival - c.cval) * (p.ival - c.cval)),
                            c.cid) AS rn
        FROM pts p JOIN c2 c ON p.pos = c.pos
        WHERE p.pid < 10
        GROUP BY p.pid, c.cid
    ) WHERE rn <= 2
),
cand AS (
    SELECT DISTINCT pr.qid, l.pid AS nid
    FROM probes pr JOIN lists l ON pr.cid = l.cid
    WHERE pr.qid != l.pid
),
prepared AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
scored AS (
    SELECT c.qid, c.nid,
           list_dot_product(q.v, n.v) / (q.nrm * n.nrm) AS cos_sim
    FROM cand c
    JOIN prepared q ON q.vec_id = c.qid
    JOIN prepared n ON n.vec_id = c.nid
),
ranked AS (
    SELECT qid, nid, cos_sim,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY cos_sim DESC, nid ASC) AS rnk
    FROM scored
)
SELECT qid, nid, cos_sim, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 3 ORDER BY qid, rnk
"""

ORACLES["corpus_diff"] = f"""
WITH t AS (
    SELECT source, lang, len({_TOKS}) AS n_tokens,
           CASE WHEN doc_id % 7 != 0 THEN 1 ELSE 0 END AS in_prev,
           CASE WHEN doc_id % 5 != 0 THEN 1 ELSE 0 END AS in_curr
    FROM documents
),
base AS (
    SELECT source,
           SUM(in_prev) AS n_prev,
           SUM(in_curr) AS n_curr,
           SUM(CASE WHEN in_curr = 1 AND in_prev = 0 THEN 1 ELSE 0 END)
               AS n_added,
           SUM(CASE WHEN in_prev = 1 AND in_curr = 0 THEN 1 ELSE 0 END)
               AS n_removed,
           SUM(in_prev * n_tokens) AS tokens_prev,
           SUM(in_curr * n_tokens) AS tokens_curr
    FROM t GROUP BY source
),
lc AS (
    SELECT source, lang, SUM(in_prev) AS c_prev, SUM(in_curr) AS c_curr
    FROM t GROUP BY source, lang
),
drift AS (
    SELECT lc.source,
           SUM(ABS(c_prev * b.n_curr - c_curr * b.n_prev)) AS num
    FROM lc JOIN base b ON lc.source = b.source
    GROUP BY lc.source
)
SELECT b.source,
       CAST(n_prev AS BIGINT) AS n_prev,
       CAST(n_curr AS BIGINT) AS n_curr,
       CAST(n_added AS BIGINT) AS n_added,
       CAST(n_removed AS BIGINT) AS n_removed,
       CAST(tokens_curr - tokens_prev AS BIGINT) AS token_delta,
       CASE WHEN n_prev * n_curr > 0
            THEN CAST(num AS DOUBLE) / CAST(n_prev * n_curr AS DOUBLE)
            END AS lang_l1
FROM base b JOIN drift d ON b.source = d.source
ORDER BY b.source
"""

ORACLES["source_drift"] = """
WITH counts AS (
    SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY source, lang
),
totals AS (
    SELECT source, COUNT(*) AS n FROM documents GROUP BY source
),
grid AS (
    SELECT s.source, l.lang, COALESCE(c.c, 0) AS c, t.n
    FROM (SELECT DISTINCT source FROM documents) s
    CROSS JOIN (SELECT DISTINCT lang FROM documents) l
    LEFT JOIN counts c ON c.source = s.source AND c.lang = l.lang
    JOIN totals t ON t.source = s.source
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(CAST(SUM(ABS(a.c * b.n - b.c * a.n)) AS BIGINT) AS DOUBLE)
           / CAST(MAX(a.n) * MAX(b.n) AS DOUBLE) AS l1_distance
FROM grid a
JOIN grid b ON a.lang = b.lang AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY source_a, source_b
"""

ORACLES["embedding_norm_check"] = """
WITH staged AS (
    SELECT label,
           sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                        x -> x * x))) AS nrm
    FROM embeddings
)
SELECT label, COUNT(*) AS n_vecs,
       MIN(nrm) AS min_norm, MAX(nrm) AS max_norm,
       CAST(SUM(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_zero_norm
FROM staged
GROUP BY label
ORDER BY label
"""

ORACLES["events_rate_limited"] = f"""
WITH staged AS (
    SELECT event_id, user_id, ts, event_type,
           ROW_NUMBER() OVER (
               PARTITION BY user_id, epoch_us(ts) // 300000000
               ORDER BY ts, event_id) AS rn
    FROM events
)
SELECT event_id, user_id, strftime(ts, '{_TS_US}') AS ts, event_type
FROM staged WHERE rn = 1
ORDER BY event_id
"""

ORACLES["orders_pareto"] = """
WITH t AS (
    SELECT SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS _t FROM orders
),
ranked AS (
    SELECT o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC)
               AS rnk,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) OVER (
                    ORDER BY o_totalprice DESC, o_orderkey ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS VARCHAR) AS DOUBLE) AS cum
    FROM orders
)
SELECT o_orderkey, o_totalprice, CAST(rnk AS INTEGER) AS rnk,
       cum / CAST(CAST(_t AS VARCHAR) AS DOUBLE) AS cum_share
FROM ranked CROSS JOIN t
WHERE rnk <= 100
ORDER BY rnk
"""

ORACLES["event_transitions"] = """
WITH bigrams AS (
    SELECT lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type,
           event_type AS next_type
    FROM events
),
counts AS (
    SELECT prev_type, next_type, COUNT(*) AS n
    FROM bigrams WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       CAST(n AS DOUBLE)
           / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
FROM counts
ORDER BY prev_type, next_type
"""


# --- md5-portable LSH fingerprints (r02: VERDICT item 3) --------------------
# These rebuild the full Spark pipelines — token/shingle hashing, seeded
# minhash family, band hashes, candidate join — from the SAME md5-derived
# signed-64 values (functions/portable_hash.py emits dialect-neutral SQL),
# promoting both queries from rows-only to full hash-match checks.

from ..functions.portable_hash import hex_bit_sql as _hex_bit  # noqa: E402

_SIMHASH_BITS = ",\n       ".join(
    f"SUM(CASE WHEN {_hex_bit('thx', b)} = 1 THEN 1 ELSE -1 END) AS b{b}"
    for b in range(64)
)
# bit 63 lands on INT64_MIN directly; bits 0..62 sum to < 2^63 first, so
# strict left-to-right addition never leaves the signed-64 range.
_SIMHASH_FP = (
    " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(63)
    )
    + " + (CASE WHEN b63 > 0 THEN -9223372036854775807 - 1 ELSE 0 END)"
)

ORACLES["simhash_fingerprint"] = f"""
WITH tk AS (
    SELECT doc_id, unnest({TX.sql_tokens("text")}) AS tok FROM documents
),
th AS (SELECT doc_id, md5(tok) AS thx FROM tk),
bits AS (
    SELECT doc_id,
       {_SIMHASH_BITS}
    FROM th GROUP BY doc_id
)
SELECT doc_id, CAST({_SIMHASH_FP} AS BIGINT) AS simhash
FROM bits ORDER BY doc_id
"""

ORACLES["dedup_near_minhash"] = f"""
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents
),
toks AS (SELECT doc_id AS doc, {TX.sql_tokens("text")} AS t FROM corpus),
sh AS (
    SELECT doc, unnest(
        CASE WHEN len(t) >= 3
             THEN list_distinct(list_transform(range(1, len(t) - 1),
                  i -> array_to_string(list_slice(t, i, i + 2), ' ')))
             ELSE [] END) AS shingle
    FROM toks
),
shx AS (SELECT doc, md5(shingle) AS shex FROM sh),
seeded AS (
    SELECT doc, i, md5(CAST(i AS VARCHAR) || ':' || shex) AS hx
    FROM shx CROSS JOIN range(32) r(i)
),
sigs AS (
    SELECT doc, i, MIN(substr(hx, 1, 16)) AS h
    FROM seeded GROUP BY doc, i
),
bandraw AS (
    SELECT doc, CAST(i // 4 AS INTEGER) AS band_id,
           md5(string_agg(h, ',' ORDER BY i)) AS bhx
    FROM sigs GROUP BY doc, i // 4
),
bands AS (
    SELECT doc, band_id, bhx AS band_hash FROM bandraw
),
cand AS (
    SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_hash = b.band_hash
     AND a.doc < b.doc
)
SELECT c.doc_a, c.doc_b,
       CAST(SUM(CASE WHEN sa.h = sb.h THEN 1 ELSE 0 END) AS DOUBLE) / 32
           AS est_jaccard
FROM cand c
JOIN sigs sa ON sa.doc = c.doc_a
JOIN sigs sb ON sb.doc = c.doc_b AND sb.i = sa.i
GROUP BY c.doc_a, c.doc_b
ORDER BY doc_a, doc_b
"""


# --- IVF top-k (r02): fully oracle-expressible -----------------------------
# Centroids are the table's own first 16 vectors; assignment, probing, and
# scoring are all sequential-fold cosine math (list_dot_product) that is
# bit-identical to the Arrow kernel's dimension-loop accumulation.

ORACLES["similarity_ivf"] = """
WITH p AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
cent AS (
    SELECT vec_id AS cell_id, v AS cv, nrm AS cnrm FROM p WHERE vec_id < 16
),
corpus_assign AS (
    SELECT vec_id, cell_id FROM (
        SELECT p.vec_id, c.cell_id,
               row_number() OVER (
                   PARTITION BY p.vec_id
                   ORDER BY list_dot_product(p.v, c.cv) / (p.nrm * c.cnrm)
                            DESC, c.cell_id ASC) AS rn
        FROM p CROSS JOIN cent c
    ) WHERE rn = 1
),
query_assign AS (
    SELECT vec_id, cell_id FROM (
        SELECT p.vec_id, c.cell_id,
               row_number() OVER (
                   PARTITION BY p.vec_id
                   ORDER BY list_dot_product(p.v, c.cv) / (p.nrm * c.cnrm)
                            DESC, c.cell_id ASC) AS rn
        FROM p CROSS JOIN cent c WHERE p.vec_id < 50
    ) WHERE rn <= 2
),
cand AS (
    SELECT DISTINCT q.vec_id AS qid, a.vec_id AS nid
    FROM query_assign q JOIN corpus_assign a USING (cell_id)
    WHERE a.vec_id != q.vec_id
),
scored AS (
    SELECT c.qid, c.nid,
           list_dot_product(pq.v, pn.v) / (pq.nrm * pn.nrm) AS cos_sim
    FROM cand c
    JOIN p pq ON pq.vec_id = c.qid
    JOIN p pn ON pn.vec_id = c.nid
)
SELECT qid, nid, cos_sim, CAST(rnk AS INTEGER) AS rnk FROM (
    SELECT qid, nid, cos_sim,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cos_sim DESC, nid ASC) AS rnk
    FROM scored
) WHERE rnk <= 5 ORDER BY qid, rnk
"""


# --- ANN LSH top-k (r02): md5-literal hyperplanes --------------------------
# The hyperplane components are pure-Python md5-derived literals
# (portable_hash.lsh_component) — the SAME floats the Spark expression
# bakes in — so bucket keys, one-bit query probes, and in-bucket ranking
# are all reproducible here. XOR with 1 is written as arithmetic
# (+1/-1 on the low bit) to stay dialect-neutral.

from ..functions.portable_hash import lsh_component as _lshc  # noqa: E402

_ANN_BITS, _ANN_TABLES, _ANN_DIM = 8, 2, 64


def _ann_bucket_sql(table: int) -> str:
    bit_terms = []
    for b in range(_ANN_BITS):
        comps = ", ".join(repr(_lshc(table, b, d)) for d in range(_ANN_DIM))
        proj = f"list_dot_product(v, [{comps}])"
        bit_terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << b} ELSE 0 END)")
    return f"({' + '.join(bit_terms)} + {table << _ANN_BITS})"


ORACLES["similarity_ann_lsh"] = f"""
WITH p AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
ckeys AS (
    SELECT vec_id, {_ann_bucket_sql(0)} AS bucket FROM p
    UNION ALL
    SELECT vec_id, {_ann_bucket_sql(1)} AS bucket FROM p
),
qbase AS (
    SELECT vec_id, bucket FROM ckeys WHERE vec_id < 50
),
qkeys AS (
    SELECT vec_id, bucket FROM qbase
    UNION ALL
    SELECT vec_id,
           bucket + CASE WHEN bucket % 2 = 0 THEN 1 ELSE -1 END AS bucket
    FROM qbase
),
cand AS (
    SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
    FROM qkeys q JOIN ckeys c USING (bucket)
    WHERE c.vec_id != q.vec_id
),
scored AS (
    SELECT c.qid, c.nid,
           list_dot_product(pq.v, pn.v) / (pq.nrm * pn.nrm) AS cos_sim
    FROM cand c
    JOIN p pq ON pq.vec_id = c.qid
    JOIN p pn ON pn.vec_id = c.nid
)
SELECT qid, nid, cos_sim, CAST(rnk AS INTEGER) AS rnk FROM (
    SELECT qid, nid, cos_sim,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cos_sim DESC, nid ASC) AS rnk
    FROM scored
) WHERE rnk <= 5 ORDER BY qid, rnk
"""


# --- dedup_embedding (r03): structurally identical LSH gate ---------------
# The query's hyperplanes are md5-derived literals (lsh_component), so the
# oracle rebuilds the SAME sign buckets (num_bits × 24 tables), applies
# the SAME 4 one-bit probes to every vector (both sides probe), equi-joins
# on bucket key, and scores candidates with sequential-fold cosine. No
# recall assumption anywhere — query and oracle enumerate the same
# candidate set by construction (ADVICE r02 medium).
#
# r08: the builder is parametric in num_bits — the query side now picks
# bits from N at plan time (adaptive_lsh_bits, floor 6), so the scale
# sweeps rebuild this oracle at the matching bit-width via
# `adaptive_oracle_overrides` below. The static ORACLES entries keep the
# fixture-scale value (6): at sf ≤ 0.1 the adaptive formula clamps to
# the floor, so every existing driver/cert hash is byte-identical.

_EMB_BITS, _EMB_TABLES, _EMB_PROBES, _EMB_DIM = 6, 24, 4, 64


def _emb_bucket_sql(table: int, bits: int = _EMB_BITS) -> str:
    bit_terms = []
    for b in range(bits):
        comps = ", ".join(repr(_lshc(table, b, d)) for d in range(_EMB_DIM))
        proj = f"list_dot_product(v, [{comps}])"
        bit_terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << b} ELSE 0 END)")
    return f"({' + '.join(bit_terms)} + {table << bits})"


def _emb_probe_arm(p: int) -> str:
    """Flip bit p of the bucket key with dialect-neutral arithmetic."""
    w = 1 << p
    return (
        "SELECT vec_id, bucket + CASE WHEN (bucket // {w}) % 2 = 0 "
        "THEN {w} ELSE -{w} END AS bucket FROM base_keys".format(w=w)
    )


def build_dedup_embedding_oracle(bits: int = _EMB_BITS) -> str:
    """dedup_embedding oracle SQL at an explicit hyperplane bit-width —
    same structure for every width; only the per-table CASE-term count
    and the table tag shift change, mirroring lsh_near_dup_pairs."""
    return f"""
WITH p AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
base_keys AS (
    {" UNION ALL ".join(
        f"SELECT vec_id, {_emb_bucket_sql(t, bits)} AS bucket FROM p"
        for t in range(_EMB_TABLES)
    )}
),
all_keys AS (
    SELECT vec_id, bucket FROM base_keys
    {"".join(" UNION ALL " + _emb_probe_arm(pr) for pr in range(_EMB_PROBES))}
),
cand AS (
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
    FROM all_keys a JOIN all_keys b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT c.id_a, c.id_b,
       list_dot_product(pa.v, pb.v) / (pa.nrm * pb.nrm) AS cos_sim
FROM cand c
JOIN p pa ON pa.vec_id = c.id_a
JOIN p pb ON pb.vec_id = c.id_b
WHERE list_dot_product(pa.v, pb.v) / (pa.nrm * pb.nrm) >= 0.4
ORDER BY id_a, id_b
"""


ORACLES["dedup_embedding"] = build_dedup_embedding_oracle(_EMB_BITS)


def build_emb_pair_graph_ctes(bits: int = _EMB_BITS) -> str:
    """The CTE chain p → base_keys → all_keys → cand → pairs: the
    threshold-0.4 embedding pair graph at ``bits`` — shared between the
    sharded-CC oracle below (which closes it recursively) and the ×10
    cc-sweep harness (which closes it with a Python union-find, because
    DuckDB's recursive reachability is Σs² state at sweep scale)."""
    return f"""p AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
base_keys AS (
    {" UNION ALL ".join(
        f"SELECT vec_id, {_emb_bucket_sql(t, bits)} AS bucket FROM p"
        for t in range(_EMB_TABLES)
    )}
),
all_keys AS (
    SELECT vec_id, bucket FROM base_keys
    {"".join(" UNION ALL " + _emb_probe_arm(pr) for pr in range(_EMB_PROBES))}
),
cand AS (
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
    FROM all_keys a JOIN all_keys b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
pairs AS (
    SELECT c.id_a, c.id_b
    FROM cand c
    JOIN p pa ON pa.vec_id = c.id_a
    JOIN p pb ON pb.vec_id = c.id_b
    WHERE list_dot_product(pa.v, pb.v) / (pa.nrm * pb.nrm) >= 0.4
)"""


def build_dedup_embedding_sharded_oracle(bits: int = _EMB_BITS) -> str:
    """dedup_embedding_sharded oracle: recursive connected-component
    closure over the SAME candidate-pair graph the unsharded SQL
    enumerates at ``bits`` — the shard-pair partitioning is execution
    layout only (every same-bucket pair is scored in exactly one job),
    so the oracle needs no shard function at all: equality against this
    SQL IS the statement that sharding changed nothing semantically.
    cluster_id = min member (min-label closure), singletons self-label,
    the dedup_clusters output shape."""
    return f"""
WITH RECURSIVE {build_emb_pair_graph_ctes(bits)},
edges AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION ALL
    SELECT id_b AS a, id_a AS b FROM pairs
),
reach AS (
    SELECT vec_id AS node, vec_id AS root FROM embeddings
    UNION
    SELECT e.b AS node, r.root FROM reach r JOIN edges e ON e.a = r.node
),
comp AS (
    SELECT node AS vec_id, MIN(root) AS cluster_id FROM reach GROUP BY node
)
SELECT vec_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM comp
ORDER BY vec_id
"""


ORACLES["dedup_embedding_sharded"] = build_dedup_embedding_sharded_oracle(
    _EMB_BITS
)


ORACLES["dedup_incremental"] = f"""
WITH new_docs AS (
    SELECT doc_id AS doc, text FROM documents WHERE doc_id >= 400
),
index_docs AS (
    SELECT doc_id AS doc, text FROM documents WHERE doc_id < 400
    UNION ALL
    SELECT doc_id + 1000000 AS doc, text FROM documents WHERE doc_id >= 400
),
corpus AS (
    SELECT 'n' AS side, doc, text FROM new_docs
    UNION ALL
    SELECT 'i' AS side, doc, text FROM index_docs
),
toks AS (SELECT side, doc, {TX.sql_tokens("text")} AS t FROM corpus),
sh AS (
    SELECT side, doc, unnest(
        CASE WHEN len(t) >= 3
             THEN list_distinct(list_transform(range(1, len(t) - 1),
                  i -> array_to_string(list_slice(t, i, i + 2), ' ')))
             ELSE [] END) AS shingle
    FROM toks
),
shx AS (SELECT side, doc, md5(shingle) AS shex FROM sh),
seeded AS (
    SELECT side, doc, i, md5(CAST(i AS VARCHAR) || ':' || shex) AS hx
    FROM shx CROSS JOIN range(32) r(i)
),
sigs AS (
    SELECT side, doc, i, MIN(substr(hx, 1, 16)) AS h
    FROM seeded GROUP BY side, doc, i
),
bandraw AS (
    SELECT side, doc, CAST(i // 4 AS INTEGER) AS band_id,
           md5(string_agg(h, ',' ORDER BY i)) AS bhx
    FROM sigs GROUP BY side, doc, i // 4
),
bands AS (
    SELECT side, doc, band_id, bhx AS band_hash FROM bandraw
),
cand AS (
    SELECT DISTINCT a.doc AS new_doc, b.doc AS index_doc
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_hash = b.band_hash
    WHERE a.side = 'n' AND b.side = 'i'
)
SELECT c.new_doc, c.index_doc,
       CAST(SUM(CASE WHEN sa.h = sb.h THEN 1 ELSE 0 END) AS DOUBLE) / 32
           AS est_jaccard
FROM cand c
JOIN sigs sa ON sa.side = 'n' AND sa.doc = c.new_doc
JOIN sigs sb ON sb.side = 'i' AND sb.doc = c.index_doc AND sb.i = sa.i
GROUP BY c.new_doc, c.index_doc
ORDER BY new_doc, index_doc
"""


# dedup_incremental_stream (r08): a drained index-maintaining
# foreachBatch pipeline must equal the batch incremental dedup
# row-for-row — oracle shared verbatim (the multimodal_decode_stream
# precedent; exactness argument in streaming/dedup.py).
ORACLES["dedup_incremental_stream"] = ORACLES["dedup_incremental"]


ORACLES["similarity_incremental"] = f"""
WITH base AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
newv AS (SELECT vec_id, v, nrm FROM base WHERE vec_id >= 400),
p AS (
    SELECT vec_id, v, nrm FROM base WHERE vec_id < 400
    UNION ALL
    SELECT vec_id + 1000000 AS vec_id, v, nrm FROM newv
),
ckeys AS (
    SELECT vec_id, {_ann_bucket_sql(0)} AS bucket FROM p
    UNION ALL
    SELECT vec_id, {_ann_bucket_sql(1)} AS bucket FROM p
),
qbase AS (
    SELECT vec_id, {_ann_bucket_sql(0)} AS bucket FROM newv
    UNION ALL
    SELECT vec_id, {_ann_bucket_sql(1)} AS bucket FROM newv
),
qkeys AS (
    SELECT vec_id, bucket FROM qbase
    UNION ALL
    SELECT vec_id,
           bucket + CASE WHEN bucket % 2 = 0 THEN 1 ELSE -1 END AS bucket
    FROM qbase
),
cand AS (
    SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
    FROM qkeys q JOIN ckeys c USING (bucket)
    WHERE c.vec_id != q.vec_id
),
scored AS (
    SELECT c.qid, c.nid,
           list_dot_product(pq.v, pn.v) / (pq.nrm * pn.nrm) AS cos_sim
    FROM cand c
    JOIN newv pq ON pq.vec_id = c.qid
    JOIN p pn ON pn.vec_id = c.nid
)
SELECT qid, nid, cos_sim, CAST(rnk AS INTEGER) AS rnk FROM (
    SELECT qid, nid, cos_sim,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cos_sim DESC, nid ASC) AS rnk
    FROM scored
) WHERE rnk <= 5 ORDER BY qid, rnk
"""


ORACLES["contamination_check"] = f"""
WITH tk AS (
    SELECT doc_id, {TX.sql_tokens("text")} AS t FROM documents
),
esh AS (
    SELECT doc_id, unnest(
        CASE WHEN len(t) >= 3
             THEN list_distinct(list_transform(range(1, len(t) - 1),
                  i -> array_to_string(list_slice(t, i, i + 2), ' ')))
             ELSE [] END) AS shingle
    FROM tk WHERE doc_id >= 480
),
csh AS (
    SELECT DISTINCT unnest(
        CASE WHEN len(t) >= 3
             THEN list_distinct(list_transform(range(1, len(t) - 1),
                  i -> array_to_string(list_slice(t, i, i + 2), ' ')))
             ELSE [] END) AS shingle
    FROM tk WHERE doc_id < 480
),
hits AS (
    SELECT e.doc_id,
           COUNT(*) AS n_shingles,
           COUNT(c.shingle) AS n_contaminated
    FROM esh e LEFT JOIN csh c USING (shingle)
    GROUP BY e.doc_id
)
SELECT d.doc_id,
       COALESCE(h.n_shingles, 0) AS n_shingles,
       COALESCE(h.n_contaminated, 0) AS n_contaminated,
       CASE WHEN COALESCE(h.n_shingles, 0) > 0
            THEN CAST(h.n_contaminated AS DOUBLE) / h.n_shingles
            ELSE 0.0 END AS contamination_rate
FROM (SELECT doc_id FROM documents WHERE doc_id >= 480) d
LEFT JOIN hits h USING (doc_id)
ORDER BY doc_id
"""


ORACLES["suppliers_kept_waiting"] = """
WITH li AS (
    SELECT l_orderkey, l_suppkey,
           l_shipdate > TIMESTAMP '1997-06-30' AS late
    FROM lineitem
),
per_order AS (
    SELECT l_orderkey,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
    FROM li GROUP BY l_orderkey
),
target AS (
    SELECT l_orderkey FROM per_order
    WHERE n_supp >= 2 AND n_late_supp = 1
),
late_supp AS (
    SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE late
)
SELECT s.s_name, COUNT(*) AS numwait
FROM target t
JOIN late_supp ls USING (l_orderkey)
JOIN supplier s ON s.s_suppkey = ls.l_suppkey
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


# --- TPC-H completion (r03): Q6, Q10, Q11, Q12, Q15, Q16, Q20 shapes --------

ORACLES["forecast_revenue"] = f"""
SELECT {_dsum(
    "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))",
    "revenue",
)}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

ORACLES["returned_items"] = f"""
SELECT c_custkey, c_name, c_acctbal, n_name, {_dsum(_DISC_PRICE, "revenue")}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

ORACLES["important_parts_share"] = f"""
WITH per_part AS (
    SELECT l_partkey, {_dsum(_DISC_PRICE, "part_value")}
    FROM lineitem GROUP BY l_partkey
),
total AS (
    SELECT {_dsum(_DISC_PRICE, "total_value")} FROM lineitem
)
SELECT l_partkey, part_value
FROM per_part, total
WHERE part_value > total_value * 0.0007
ORDER BY part_value DESC, l_partkey ASC
"""

ORACLES["priority_line_counts"] = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""

ORACLES["top_revenue_supplier"] = f"""
WITH rev AS (
    SELECT l_suppkey, {_dsum(_DISC_PRICE, "total_revenue")}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
"""

ORACLES["brand_supplier_counts"] = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""

ORACLES["promotion_part_suppliers"] = f"""
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey FROM (
        SELECT l_suppkey, l_partkey, {_dsum("l_quantity", "ship_qty")}
        FROM lineitem
        WHERE l_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
          )
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
    ) WHERE ship_qty > 50
)
ORDER BY s_suppkey
"""


# --- repetition + PII (r03 wave 2) -----------------------------------------

ORACLES["repetition_stats"] = """
WITH t AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\\s+'), x -> x != '') AS w
    FROM documents
),
staged AS (
    SELECT doc_id, w,
           len(w) AS n_words,
           len(list_distinct(w)) AS n_distinct,
           len(list_distinct(list_transform(range(1, len(w)),
               i -> w[i] || ' ' || w[i + 1]))) AS n_distinct_2g,
           len(list_distinct(list_transform(range(1, len(w) - 1),
               i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])))
               AS n_distinct_3g
    FROM t WHERE len(w) >= 3
),
wc AS (
    SELECT doc_id, tok, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(w) AS tok FROM t WHERE len(w) >= 3)
    GROUP BY doc_id, tok
),
top AS (SELECT doc_id, MAX(c) AS top_c FROM wc GROUP BY doc_id)
SELECT s.doc_id,
       CAST(n_words AS INTEGER) AS n_words,
       CAST(n_distinct AS DOUBLE) / n_words AS distinct_word_frac,
       CAST(top_c AS DOUBLE) / n_words AS top_word_frac,
       1.0 - CAST(n_distinct_2g AS DOUBLE) / (n_words - 1)
           AS dup_bigram_frac,
       1.0 - CAST(n_distinct_3g AS DOUBLE) / (n_words - 2)
           AS dup_trigram_frac
FROM staged s JOIN top USING (doc_id)
ORDER BY doc_id
"""

_PII_VALUES = ", ".join(
    f"({i}, '{t}', '{s}')" for i, t, s in TX.PII_FIXTURE_ROWS
)
_PII_COUNT_COLS = ",\n           ".join(
    f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
    for name, pat in TX.PII_PATTERNS.items()
)
_PII_AGGS = ",\n       ".join(
    f"CAST(SUM(CASE WHEN n_{name} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS docs_with_{name},\n       "
    f"CAST(SUM(n_{name}) AS BIGINT) AS total_{name}"
    for name in TX.PII_PATTERNS
)

ORACLES["pii_scan"] = f"""
WITH all_docs AS (
    SELECT doc_id, text, source FROM documents
    UNION ALL
    SELECT * FROM (VALUES {_PII_VALUES}) v(doc_id, text, source)
),
counted AS (
    SELECT source,
           {_PII_COUNT_COLS}
    FROM all_docs
)
SELECT source,
       COUNT(*) AS n_docs,
       {_PII_AGGS}
FROM counted GROUP BY source ORDER BY source
"""


# --- clean_corpus (r03 capstone): dedup + quality retention ----------------

ORACLES["clean_corpus"] = f"""
WITH RECURSIVE {_JACC_CTES},
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM jacc
    UNION ALL
    SELECT doc_b AS a, doc_a AS b FROM jacc
),
reach AS (
    SELECT doc_id AS node, doc_id AS root FROM documents
    UNION
    SELECT e.b AS node, r.root FROM reach r JOIN edges e ON e.a = r.node
),
comp AS (
    SELECT node AS doc_id, MIN(root) AS cluster_id FROM reach GROUP BY node
),
quality AS ({ORACLES["quality_score"]}),
ranked AS (
    SELECT c.cluster_id, q.doc_id,
           ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                              ORDER BY q.score DESC, q.doc_id ASC) AS rnk
    FROM comp c JOIN quality q USING (doc_id)
),
reps AS (SELECT doc_id FROM ranked WHERE rnk = 1),
{_QF_CTES},
perdoc AS (
    SELECT f.doc_id, f.source,
           {_QF_PASS} AS passes,
           CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END AS is_rep
    FROM qf_flags f LEFT JOIN reps r USING (doc_id)
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(is_rep) AS BIGINT) AS n_after_dedup,
       CAST(SUM(is_rep * passes) AS BIGINT) AS n_retained,
       CAST(SUM(is_rep * passes) AS DOUBLE) / COUNT(*) AS retention_rate
FROM perdoc GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# Round-3 session additions (mirrors plans/queries.py tail).
# ---------------------------------------------------------------------------

ORACLES["duplicate_spans"] = f"""
WITH base AS (
    SELECT doc_id, source, {_TOKS} AS toks FROM documents
),
sized AS (
    SELECT doc_id, source, len(toks) AS n_tokens, toks FROM base
),
pos_t AS (
    SELECT doc_id, toks,
           unnest(generate_series(1, len(toks) - 7)) AS pos
    FROM sized WHERE len(toks) >= 8
),
sh AS (
    SELECT doc_id, pos,
           md5(array_to_string(list_slice(toks, pos, pos + 7), ' ')) AS h
    FROM pos_t
),
dup AS (
    SELECT h FROM sh GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
),
cov AS (
    SELECT doc_id, COUNT(*) AS n_dup_tokens FROM (
        SELECT DISTINCT s.doc_id, s.pos + o.off AS idx
        FROM sh s JOIN dup USING (h), LATERAL generate_series(0, 7) AS o(off)
    ) GROUP BY doc_id
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN COALESCE(n_dup_tokens, 0) > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS docs_with_dup_spans,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(COALESCE(n_dup_tokens, 0)) AS BIGINT) AS dup_tokens,
       CAST(SUM(COALESCE(n_dup_tokens, 0)) AS DOUBLE) / SUM(n_tokens)
           AS dup_token_rate
FROM sized LEFT JOIN cov USING (doc_id)
GROUP BY source ORDER BY source
"""

# exact_substr_spans: anchor chaining in SQL — equal 8-token shingles
# between a candidate pair are (pa, pb) anchors; maximal consecutive
# anchor runs on a diagonal (pb - pa) are exactly the maximal common
# substrings (run_len = anchors + 7). Gaps-and-islands per (pair, diag).
_XSPAN_CTES = """toks8 AS (
    SELECT doc_id, {toks} AS t FROM documents
),
pos8 AS (
    SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS pos
    FROM toks8 WHERE len(t) >= 8
),
sh8 AS (
    SELECT doc_id, pos,
           md5(array_to_string(list_slice(t, pos, pos + 7), ' ')) AS h
    FROM pos8
),
anchors AS (
    SELECT j.doc_a, j.doc_b, a.pos AS pa, b.pos AS pb
    FROM jacc j
    JOIN sh8 a ON a.doc_id = j.doc_a
    JOIN sh8 b ON b.doc_id = j.doc_b AND b.h = a.h
),
isl AS (
    SELECT doc_a, doc_b, pb - pa AS diag, pa, pb,
           pa - ROW_NUMBER() OVER (
               PARTITION BY doc_a, doc_b, pb - pa ORDER BY pa) AS grp
    FROM anchors
),
runs AS (
    SELECT doc_a, doc_b, diag, grp,
           MIN(pa) AS start_a, MIN(pb) AS start_b,
           COUNT(*) + 7 AS run_len
    FROM isl GROUP BY doc_a, doc_b, diag, grp
),
best AS (
    SELECT doc_a, doc_b, run_len, start_a, start_b,
           COUNT(*) OVER (PARTITION BY doc_a, doc_b) AS n_runs,
           ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b
                              ORDER BY run_len DESC, start_a, start_b) AS rn
    FROM runs
)""".format(toks=_TOKS)

ORACLES["exact_substr_spans"] = f"""
WITH {_JACC_CTES},
{_XSPAN_CTES}
SELECT doc_a, doc_b,
       CAST(run_len AS BIGINT) AS run_len,
       CAST(start_a AS BIGINT) AS start_a,
       CAST(start_b AS BIGINT) AS start_b,
       CAST(n_runs AS BIGINT) AS n_runs
FROM best WHERE rn = 1
ORDER BY doc_a, doc_b
"""

ORACLES["strip_dup_spans"] = f"""
WITH {_JACC_CTES},
{_XSPAN_CTES},
bspan AS (
    SELECT doc_id, source_doc, span_len, start_b FROM (
        SELECT doc_b AS doc_id, doc_a AS source_doc,
               run_len AS span_len, start_b,
               ROW_NUMBER() OVER (PARTITION BY doc_b
                                  ORDER BY run_len DESC, doc_a, start_b)
                   AS brn
        FROM best WHERE rn = 1 AND run_len >= 12
    ) WHERE brn = 1
)
SELECT b.doc_id, b.source_doc,
       CAST(b.span_len AS BIGINT) AS span_len,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(len(t.t) - b.span_len AS BIGINT) AS n_remaining,
       md5(COALESCE(array_to_string(
           list_slice(t.t, 1, b.start_b - 1)
           || list_slice(t.t, b.start_b + b.span_len, len(t.t)), ' '), ''))
           AS residual_fp
FROM bspan b JOIN toks8 t ON t.doc_id = b.doc_id
ORDER BY b.doc_id
"""

ORACLES["pack_sequences"] = f"""
WITH t AS (
    SELECT doc_id, source, len({_TOKS}) AS n_tokens FROM documents
),
c AS (
    SELECT doc_id, source, n_tokens,
           COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
    FROM t
)
SELECT source,
       CAST(FLOOR(cum_before / 2048.0) AS BIGINT) AS seq_bin,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       MIN(doc_id) AS first_doc_id,
       MAX(doc_id) AS last_doc_id
FROM c GROUP BY source, seq_bin ORDER BY source, seq_bin
"""

from ..functions.portable_hash import uniform_frac_sql as _UFRAC  # noqa: E402

ORACLES["source_mixture_sample"] = f"""
WITH rated AS (
    SELECT source, LEAST(1.0, 10.0 / COUNT(*)) AS rate
    FROM documents GROUP BY source
),
h AS (
    SELECT d.doc_id, d.lang, d.source, d.n_chars, r.rate,
           md5(CAST(d.doc_id AS VARCHAR)) AS hx
    FROM documents d JOIN rated r USING (source)
)
SELECT doc_id, lang, source, n_chars
FROM h WHERE {_UFRAC('hx')} < rate
ORDER BY doc_id
"""

ORACLES["events_dedup_stream"] = f"""
SELECT event_type,
       COUNT(*) AS n_events,
       {_dsum('value', 'sum_value')}
FROM events
GROUP BY event_type ORDER BY event_type
"""

ORACLES["source_overlap"] = f"""
WITH t AS (
    SELECT source, {_TOKS} AS toks FROM documents
),
sh AS (
    SELECT DISTINCT source, md5(shingle) AS h FROM (
        SELECT source, unnest(
            CASE WHEN len(toks) >= 3
                 THEN list_distinct(list_transform(range(1, len(toks) - 1),
                      i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
                 ELSE [] END) AS shingle
        FROM t
    )
),
counts AS (
    SELECT source, COUNT(*) AS n FROM sh GROUP BY source
),
inter AS (
    SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_inter
    FROM sh a JOIN sh b USING (h)
    WHERE a.source < b.source
    GROUP BY a.source, b.source
),
grid AS (
    SELECT x.source AS source_a, y.source AS source_b,
           x.n AS n_a, y.n AS n_b
    FROM counts x JOIN counts y ON x.source < y.source
)
SELECT g.source_a, g.source_b,
       COALESCE(i.n_inter, 0) AS n_inter,
       g.n_a + g.n_b - COALESCE(i.n_inter, 0) AS n_union,
       CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
           / (g.n_a + g.n_b - COALESCE(i.n_inter, 0)) AS jaccard
FROM grid g LEFT JOIN inter i USING (source_a, source_b)
ORDER BY source_a, source_b
"""

ORACLES["events_ks_drift"] = """
WITH types AS (
    SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
),
pairs AS (
    SELECT a.event_type AS type_a, a.n AS n_a,
           b.event_type AS type_b, b.n AS n_b
    FROM types a JOIN types b ON a.event_type < b.event_type
),
tagged AS (
    SELECT p.type_a, p.type_b, p.n_a, p.n_b, e.value,
           1 AS ca, 0 AS cb
    FROM events e JOIN pairs p ON e.event_type = p.type_a
    UNION ALL
    SELECT p.type_a, p.type_b, p.n_a, p.n_b, e.value,
           0 AS ca, 1 AS cb
    FROM events e JOIN pairs p ON e.event_type = p.type_b
),
per_value AS (
    SELECT type_a, type_b, n_a, n_b, value,
           SUM(ca) AS ca, SUM(cb) AS cb
    FROM tagged GROUP BY type_a, type_b, n_a, n_b, value
),
cdf AS (
    SELECT type_a, type_b, n_a, n_b,
           SUM(ca) OVER (PARTITION BY type_a, type_b ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
           SUM(cb) OVER (PARTITION BY type_a, type_b ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
    FROM per_value
)
SELECT type_a, type_b,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(MAX(ABS(cum_a * n_b - cum_b * n_a)) AS DOUBLE) / (n_a * n_b)
           AS ks_stat
FROM cdf GROUP BY type_a, type_b, n_a, n_b
ORDER BY type_a, type_b
"""


_PR_HEAD = """pedges AS (
    SELECT doc_a AS src, doc_b AS dst FROM jacc
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM jacc
),
pdegs AS (SELECT src, COUNT(*) AS deg FROM pedges GROUP BY src),
alledges AS (
    SELECT e.src, e.dst, d.deg, FALSE AS self
    FROM pedges e JOIN pdegs d USING (src)
    UNION ALL
    SELECT doc_id, doc_id, CAST(1 AS BIGINT), TRUE FROM documents
),
params AS (
    SELECT 1000000000000 // COUNT(*) AS r0,
           (15 * (1000000000000 // COUNT(*))) // 100 AS base
    FROM documents
),
pr0 AS (
    SELECT doc_id AS doc, p.r0 AS r FROM documents CROSS JOIN params p
)"""

_PR_ITERS = "".join(
    f""",
pr{i} AS (
    SELECT e.dst AS doc,
           p.base + (85 * SUM(CASE WHEN e.self THEN 0
                                   ELSE pr{i - 1}.r // e.deg END)) // 100 AS r
    FROM pr{i - 1} JOIN alledges e ON e.src = pr{i - 1}.doc
    CROSS JOIN params p
    GROUP BY e.dst, p.base
)"""
    for i in range(1, 9)
)

ORACLES["pagerank_docs"] = f"""
WITH {_JACC_CTES},
{_PR_HEAD}{_PR_ITERS}
SELECT doc AS doc_id, CAST(r AS BIGINT) AS rank_int,
       CAST(r AS DOUBLE) / CAST(1000000000000 AS DOUBLE) AS rank
FROM pr8 ORDER BY doc_id
"""

ORACLES["events_rate_limited_stream"] = ORACLES["events_rate_limited"]


ORACLES["approx_distinct_kmv"] = f"""
WITH pairs AS (
    SELECT DISTINCT event_type, user_id FROM events
),
hashed AS (
    SELECT event_type, user_id,
           {_UFRAC("md5(CAST(user_id AS VARCHAR))")} AS u
    FROM pairs
),
ranked AS (
    SELECT event_type, u,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY u, user_id) AS rn
    FROM hashed
),
kth AS (
    SELECT event_type, u AS u_k FROM ranked WHERE rn = 64
),
exact AS (
    SELECT event_type, COUNT(*) AS n_exact FROM pairs GROUP BY event_type
)
SELECT e.event_type, e.n_exact,
       CASE WHEN k.u_k IS NOT NULL THEN 63.0 / k.u_k
            ELSE CAST(e.n_exact AS DOUBLE) END AS kmv_estimate,
       ABS(CASE WHEN k.u_k IS NOT NULL THEN 63.0 / k.u_k
                ELSE CAST(e.n_exact AS DOUBLE) END - e.n_exact)
           / e.n_exact AS rel_error
FROM exact e LEFT JOIN kth k USING (event_type)
ORDER BY event_type
"""


ORACLES["hash_embed"] = f"""
WITH toks AS (
    SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
bucketed AS (
    SELECT doc_id,
           (CAST(instr('0123456789abcdef', substr(md5(tok), 1, 1)) - 1
                 AS INT)) % 16 AS bucket
    FROM toks
),
counts AS (
    SELECT doc_id, bucket, COUNT(*) AS c
    FROM bucketed GROUP BY doc_id, bucket
),
vec AS (
    SELECT doc_id,
           SUM(CASE WHEN bucket = 0 THEN c ELSE 0 END) AS d0,
           SUM(CASE WHEN bucket = 1 THEN c ELSE 0 END) AS d1,
           SUM(CASE WHEN bucket = 2 THEN c ELSE 0 END) AS d2,
           SUM(CASE WHEN bucket = 3 THEN c ELSE 0 END) AS d3,
           SUM(CASE WHEN bucket = 4 THEN c ELSE 0 END) AS d4,
           SUM(CASE WHEN bucket = 5 THEN c ELSE 0 END) AS d5,
           SUM(CASE WHEN bucket = 6 THEN c ELSE 0 END) AS d6,
           SUM(CASE WHEN bucket = 7 THEN c ELSE 0 END) AS d7,
           SUM(CASE WHEN bucket = 8 THEN c ELSE 0 END) AS d8,
           SUM(CASE WHEN bucket = 9 THEN c ELSE 0 END) AS d9,
           SUM(CASE WHEN bucket = 10 THEN c ELSE 0 END) AS d10,
           SUM(CASE WHEN bucket = 11 THEN c ELSE 0 END) AS d11,
           SUM(CASE WHEN bucket = 12 THEN c ELSE 0 END) AS d12,
           SUM(CASE WHEN bucket = 13 THEN c ELSE 0 END) AS d13,
           SUM(CASE WHEN bucket = 14 THEN c ELSE 0 END) AS d14,
           SUM(CASE WHEN bucket = 15 THEN c ELSE 0 END) AS d15
    FROM counts GROUP BY doc_id
),
normed AS (
    SELECT doc_id, sqrt(CAST(d0 * d0 + d1 * d1 + d2 * d2 + d3 * d3 + d4 * d4 + d5 * d5 + d6 * d6 + d7 * d7 + d8 * d8 + d9 * d9 + d10 * d10 + d11 * d11 + d12 * d12 + d13 * d13 + d14 * d14 + d15 * d15 AS DOUBLE)) AS nrm, *
    FROM vec
)
SELECT doc_id, CAST(d0 AS DOUBLE) / nrm AS e0, CAST(d1 AS DOUBLE) / nrm AS e1, CAST(d2 AS DOUBLE) / nrm AS e2, CAST(d3 AS DOUBLE) / nrm AS e3, CAST(d4 AS DOUBLE) / nrm AS e4, CAST(d5 AS DOUBLE) / nrm AS e5, CAST(d6 AS DOUBLE) / nrm AS e6, CAST(d7 AS DOUBLE) / nrm AS e7, CAST(d8 AS DOUBLE) / nrm AS e8, CAST(d9 AS DOUBLE) / nrm AS e9, CAST(d10 AS DOUBLE) / nrm AS e10, CAST(d11 AS DOUBLE) / nrm AS e11, CAST(d12 AS DOUBLE) / nrm AS e12, CAST(d13 AS DOUBLE) / nrm AS e13, CAST(d14 AS DOUBLE) / nrm AS e14, CAST(d15 AS DOUBLE) / nrm AS e15, nrm AS raw_norm
FROM normed
UNION ALL
SELECT d.doc_id,
       0.0 AS e0, 0.0 AS e1, 0.0 AS e2, 0.0 AS e3, 0.0 AS e4, 0.0 AS e5, 0.0 AS e6, 0.0 AS e7, 0.0 AS e8, 0.0 AS e9, 0.0 AS e10, 0.0 AS e11, 0.0 AS e12, 0.0 AS e13, 0.0 AS e14, 0.0 AS e15,
       0.0 AS raw_norm
FROM documents d LEFT JOIN vec USING (doc_id)
WHERE vec.doc_id IS NULL
ORDER BY doc_id
"""


ORACLES["keyword_search"] = f"""
WITH toks AS (
    SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
hits AS (
    SELECT doc_id, tok FROM toks WHERE tok IN ('hash', 'join', 'stream')
),
tf AS (
    SELECT doc_id, tok, COUNT(*) AS tf FROM hits GROUP BY doc_id, tok
),
idf AS (
    SELECT tok,
           (CAST(1000000000 AS BIGINT)
            * (SELECT COUNT(*) FROM documents)) // COUNT(*) AS idf_int
    FROM tf GROUP BY tok
),
scored AS (
    SELECT t.doc_id,
           CAST(SUM(t.tf * i.idf_int) AS BIGINT) AS score_int,
           COUNT(*) AS n_terms_hit
    FROM tf t JOIN idf i USING (tok)
    GROUP BY t.doc_id
)
SELECT doc_id, n_terms_hit, score_int,
       CAST(score_int AS DOUBLE) / 1000000000.0 AS score
FROM scored
ORDER BY score_int DESC, doc_id ASC
LIMIT 20
"""


# multimodal_decode: the synthetic payload for asset i is
# unhex(sha256(i) || sha256(i||'x') || sha256(i||'y')) — 96 deterministic
# bytes (operators/multimodal.py:synth_assets). DuckDB cannot hash BLOBs,
# so the engine fingerprints the *lowercase hex* of the payload
# (operators/multimodal.py:_payload_sha) which both engines can rebuild
# as plain strings. Byte values (for the fake-decode width/height and the
# mean) are parsed from hex pairs via a 256-row lookup CTE — no custom
# functions needed.
ORACLES["multimodal_decode"] = """
WITH nib AS (
    SELECT v, substr('0123456789abcdef', v + 1, 1) AS c
    FROM (SELECT unnest(range(16)) AS v)
),
hexpair AS (
    SELECT h.v * 16 + l.v AS val, h.c || l.c AS pair
    FROM nib h CROSS JOIN nib l
),
ids AS (SELECT unnest(range(200)) AS i),
payload AS (
    SELECT i,
           sha256(i::VARCHAR)
           || sha256(i::VARCHAR || 'x')
           || sha256(i::VARCHAR || 'y') AS fh
    FROM ids
),
bytes AS (
    SELECT p.i, j.j, hp.val
    FROM payload p
    CROSS JOIN (SELECT unnest(range(96)) AS j) j
    JOIN hexpair hp ON hp.pair = substr(p.fh, 2 * j.j + 1, 2)
),
stats AS (
    SELECT i, CAST(SUM(val) AS DOUBLE) / 96 AS mean_byte FROM bytes GROUP BY i
)
SELECT p.i AS asset_id,
       (['image', 'audio', 'video'])[CAST(p.i % 3 AS INT) + 1] AS modality,
       CAST(96 AS INT) AS n_bytes,
       sha256(p.fh) AS payload_sha,
       CAST(64 + b0.val % 192 AS INT) AS width,
       CAST(64 + b1.val % 192 AS INT) AS height,
       s.mean_byte
FROM payload p
JOIN bytes b0 ON b0.i = p.i AND b0.j = 0
JOIN bytes b1 ON b1.i = p.i AND b1.j = 1
JOIN stats s ON s.i = p.i
ORDER BY asset_id
"""


# multimodal_pixel_stats: the engine decodes REAL bytes (BMP pixel
# arrays / WAV PCM frames, operators/multimodal.py); the oracle
# recomputes identical integer statistics from the generative formulas
# (bmp_pixel / make_wav ramp) — decode correctness is certified without
# a reference media library. -1 sentinels mirror the query's coalesce
# for WAV's missing g/r channels.
ORACLES["multimodal_pixel_stats"] = """
WITH ids AS (SELECT unnest(range(80)) AS i),
bmp AS (SELECT i, 5 + i % 13 AS w, 3 + i % 7 AS h FROM ids WHERE i % 6 = 0),
px AS (
    SELECT b.i,
           (x.x * 7 + y.y * 13) % 256 AS vb,
           (x.x * 11 + y.y * 3) % 256 AS vg,
           (x.x * 5 + y.y * 17) % 256 AS vr
    FROM bmp b
    JOIN (SELECT unnest(range(18)) AS x) x ON x.x < b.w
    JOIN (SELECT unnest(range(10)) AS y) y ON y.y < b.h
),
bmp_stats AS (
    SELECT i, 'bmp' AS kind, CAST(COUNT(*) AS BIGINT) AS n_units,
           CAST(SUM(vb) AS BIGINT) AS sum_b,
           CAST(MIN(vb) AS BIGINT) AS min_b,
           CAST(MAX(vb) AS BIGINT) AS max_b,
           CAST(SUM(vg) AS BIGINT) AS sum_g,
           CAST(MIN(vg) AS BIGINT) AS min_g,
           CAST(MAX(vg) AS BIGINT) AS max_g,
           CAST(SUM(vr) AS BIGINT) AS sum_r,
           CAST(MIN(vr) AS BIGINT) AS min_r,
           CAST(MAX(vr) AS BIGINT) AS max_r
    FROM px GROUP BY i
),
wav AS (SELECT i, 40 + i % 160 AS n, 1 + i % 9 AS a FROM ids WHERE i % 6 = 1),
smp AS (
    SELECT w.i, 128 + (j.j * w.a) % 64 AS s
    FROM wav w JOIN (SELECT unnest(range(200)) AS j) j ON j.j < w.n
),
wav_stats AS (
    SELECT i, 'wav' AS kind, CAST(COUNT(*) AS BIGINT) AS n_units,
           CAST(SUM(s) AS BIGINT) AS sum_b,
           CAST(MIN(s) AS BIGINT) AS min_b,
           CAST(MAX(s) AS BIGINT) AS max_b,
           CAST(-1 AS BIGINT) AS sum_g, CAST(-1 AS BIGINT) AS min_g,
           CAST(-1 AS BIGINT) AS max_g, CAST(-1 AS BIGINT) AS sum_r,
           CAST(-1 AS BIGINT) AS min_r, CAST(-1 AS BIGINT) AS max_r
    FROM smp GROUP BY i
),
png AS (SELECT i, 6 + i % 12 AS w, 4 + i % 6 AS h FROM ids WHERE i % 6 = 2),
gpx AS (
    SELECT g.i, (x.x * 3 + y.y * 7) % 256 AS v
    FROM png g
    JOIN (SELECT unnest(range(18)) AS x) x ON x.x < g.w
    JOIN (SELECT unnest(range(10)) AS y) y ON y.y < g.h
),
png_stats AS (
    SELECT i, 'png' AS kind, CAST(COUNT(*) AS BIGINT) AS n_units,
           CAST(SUM(v) AS BIGINT) AS sum_b,
           CAST(MIN(v) AS BIGINT) AS min_b,
           CAST(MAX(v) AS BIGINT) AS max_b,
           CAST(-1 AS BIGINT) AS sum_g, CAST(-1 AS BIGINT) AS min_g,
           CAST(-1 AS BIGINT) AS max_g, CAST(-1 AS BIGINT) AS sum_r,
           CAST(-1 AS BIGINT) AS min_r, CAST(-1 AS BIGINT) AS max_r
    FROM gpx GROUP BY i
),
gif AS (SELECT i, 4 + i % 14 AS w, 3 + i % 8 AS h FROM ids WHERE i % 6 = 3),
fpx AS (
    SELECT g.i, (x.x * 5 + y.y * 11) % 256 AS v
    FROM gif g
    JOIN (SELECT unnest(range(18)) AS x) x ON x.x < g.w
    JOIN (SELECT unnest(range(11)) AS y) y ON y.y < g.h
),
gif_stats AS (
    SELECT i, 'gif' AS kind, CAST(COUNT(*) AS BIGINT) AS n_units,
           CAST(SUM(v) AS BIGINT) AS sum_b,
           CAST(MIN(v) AS BIGINT) AS min_b,
           CAST(MAX(v) AS BIGINT) AS max_b,
           CAST(-1 AS BIGINT) AS sum_g, CAST(-1 AS BIGINT) AS min_g,
           CAST(-1 AS BIGINT) AS max_g, CAST(-1 AS BIGINT) AS sum_r,
           CAST(-1 AS BIGINT) AS min_r, CAST(-1 AS BIGINT) AS max_r
    FROM fpx GROUP BY i
),
jpg AS (SELECT i, 9 + i % 24 AS w, 7 + i % 19 AS h FROM ids WHERE i % 6 = 4),
jpx AS (
    SELECT j.i, ((x.x // 8) * 13 + (y.y // 8) * 29 + 7) % 256 AS v
    FROM jpg j
    JOIN (SELECT unnest(range(33)) AS x) x ON x.x < j.w
    JOIN (SELECT unnest(range(26)) AS y) y ON y.y < j.h
),
jpg_stats AS (
    SELECT i, 'jpeg' AS kind, CAST(COUNT(*) AS BIGINT) AS n_units,
           CAST(SUM(v) AS BIGINT) AS sum_b,
           CAST(MIN(v) AS BIGINT) AS min_b,
           CAST(MAX(v) AS BIGINT) AS max_b,
           CAST(-1 AS BIGINT) AS sum_g, CAST(-1 AS BIGINT) AS min_g,
           CAST(-1 AS BIGINT) AS max_g, CAST(-1 AS BIGINT) AS sum_r,
           CAST(-1 AS BIGINT) AS min_r, CAST(-1 AS BIGINT) AS max_r
    FROM jpx GROUP BY i),
avi AS (SELECT i, 4 + i % 9 AS w, 3 + i % 6 AS h, 2 + i % 4 AS n
        FROM ids WHERE i % 6 = 5),
apx AS (
    SELECT a.i,
           (x.x * 7 + y.y * 13 + f.f * 19) % 256 AS vb,
           (x.x * 11 + y.y * 3 + f.f * 23) % 256 AS vg,
           (x.x * 5 + y.y * 17 + f.f * 29) % 256 AS vr
    FROM avi a
    JOIN (SELECT unnest(range(13)) AS x) x ON x.x < a.w
    JOIN (SELECT unnest(range(9)) AS y) y ON y.y < a.h
    JOIN (SELECT unnest(range(6)) AS f) f ON f.f < a.n
),
avi_stats AS (
    SELECT i, 'avi' AS kind, CAST(COUNT(*) AS BIGINT) AS n_units,
           CAST(SUM(vb) AS BIGINT) AS sum_b,
           CAST(MIN(vb) AS BIGINT) AS min_b,
           CAST(MAX(vb) AS BIGINT) AS max_b,
           CAST(SUM(vg) AS BIGINT) AS sum_g,
           CAST(MIN(vg) AS BIGINT) AS min_g,
           CAST(MAX(vg) AS BIGINT) AS max_g,
           CAST(SUM(vr) AS BIGINT) AS sum_r,
           CAST(MIN(vr) AS BIGINT) AS min_r,
           CAST(MAX(vr) AS BIGINT) AS max_r
    FROM apx GROUP BY i
)
SELECT i AS asset_id, kind, n_units,
       sum_b, min_b, max_b, sum_g, min_g, max_g, sum_r, min_r, max_r
FROM (SELECT * FROM bmp_stats UNION ALL SELECT * FROM wav_stats
      UNION ALL SELECT * FROM png_stats UNION ALL SELECT * FROM gif_stats
      UNION ALL SELECT * FROM jpg_stats UNION ALL SELECT * FROM avi_stats)
ORDER BY asset_id
"""


# multimodal_decode_stream: a drained stateless file-stream decode must
# equal the batch multimodal_decode row-for-row, so it shares that
# oracle verbatim.
ORACLES["multimodal_decode_stream"] = ORACLES["multimodal_decode"]


# video_frame_stats: the engine demuxes real AVI movi LISTs and decodes
# every 2nd frame's pixels — even assets uncompressed DIB, odd assets
# Motion-JPEG (each 00dc frame a real baseline JPEG, block-constant so
# the lossy round trip is bit-exact); the oracle recomputes identical
# integer statistics from the avi_pixel / mjpeg_pixel generative
# formulas — both codec paths certified without ffmpeg.
ORACLES["video_frame_stats"] = """
WITH ids AS (SELECT unnest(range(40)) AS i),
avi AS (SELECT i, 4 + i % 9 AS w, 3 + i % 6 AS h, 2 + i % 7 AS n FROM ids),
fr AS (
    SELECT a.i, a.w, a.h, f.f
    FROM avi a
    JOIN (SELECT unnest(range(9)) AS f) f ON f.f < a.n AND f.f % 2 = 0
),
px AS (
    SELECT fr.i, fr.f,
           (x.x * 7 + y.y * 13 + fr.f * 19) % 256 AS vb,
           (x.x * 11 + y.y * 3 + fr.f * 23) % 256 AS vg,
           (x.x * 5 + y.y * 17 + fr.f * 29) % 256 AS vr,
           ((x.x // 8) * 13 + (y.y // 8) * 29 + 7 + fr.f * 31) % 256 AS vj
    FROM fr
    JOIN (SELECT unnest(range(13)) AS x) x ON x.x < fr.w
    JOIN (SELECT unnest(range(9)) AS y) y ON y.y < fr.h
)
SELECT i AS asset_id, CAST(f AS BIGINT) AS frame_idx,
       CAST(COUNT(*) AS BIGINT) AS n_px,
       CAST(SUM(CASE WHEN i % 2 = 0 THEN vb ELSE vj END) AS BIGINT) AS sum_b,
       CAST(MIN(CASE WHEN i % 2 = 0 THEN vb ELSE vj END) AS BIGINT) AS min_b,
       CAST(MAX(CASE WHEN i % 2 = 0 THEN vb ELSE vj END) AS BIGINT) AS max_b,
       CAST(CASE WHEN i % 2 = 0 THEN SUM(vg) ELSE -1 END AS BIGINT) AS sum_g,
       CAST(CASE WHEN i % 2 = 0 THEN MIN(vg) ELSE -1 END AS BIGINT) AS min_g,
       CAST(CASE WHEN i % 2 = 0 THEN MAX(vg) ELSE -1 END AS BIGINT) AS max_g,
       CAST(CASE WHEN i % 2 = 0 THEN SUM(vr) ELSE -1 END AS BIGINT) AS sum_r,
       CAST(CASE WHEN i % 2 = 0 THEN MIN(vr) ELSE -1 END AS BIGINT) AS min_r,
       CAST(CASE WHEN i % 2 = 0 THEN MAX(vr) ELSE -1 END AS BIGINT) AS max_r
FROM px GROUP BY i, f
ORDER BY asset_id, frame_idx
"""


ORACLES["cdc_snapshot"] = """
WITH ch AS (
    SELECT user_id, ts, event_id, event_type, value,
           CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn,
           COUNT(*) OVER (PARTITION BY user_id) AS n_changes
    FROM events
)
SELECT user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
       event_type AS last_type,
       value AS last_value,
       n_changes
FROM ch
WHERE rn = 1 AND op != 'D'
ORDER BY user_id
"""

ORACLES["triangle_count"] = f"""
WITH {_JACC_CTES},
e AS (SELECT doc_a AS a, doc_b AS b FROM jacc),
tri AS (
    SELECT e1.a, e1.b, e2.b AS c
    FROM e e1
    JOIN e e2 ON e2.a = e1.b
    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
nodes AS (
    SELECT a AS doc_id FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
)
SELECT doc_id, COUNT(*) AS n_triangles
FROM nodes GROUP BY doc_id ORDER BY doc_id
"""

# Stream-static enrichment drained with availableNow equals the batch join.
ORACLES["events_enrich_stream"] = f"""
SELECT n_name,
       COUNT(*) AS n_events,
       {_dsum('value', 'sum_value')}
FROM events
JOIN customer ON user_id = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


# containment_pairs reuses the capped-shingle CTE chain (toks..prs); the
# jacc CTE rides along unused — containment applies its own threshold.
ORACLES["containment_pairs"] = f"""
WITH {_JACC_CTES},
cont AS (
    SELECT doc_a, doc_b, common,
           sa.n_sh AS n_a, sb.n_sh AS n_b,
           CAST(common AS DOUBLE) / sa.n_sh AS cont_a,
           CAST(common AS DOUBLE) / sb.n_sh AS cont_b
    FROM prs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
)
SELECT doc_a, doc_b, common, n_a, n_b, cont_a, cont_b,
       greatest(cont_a, cont_b) >= 0.8 AS subsumed
FROM cont
WHERE greatest(cont_a, cont_b) >= 0.5
ORDER BY doc_a, doc_b
"""

# pq_codes: codebook = the first 16 corpus vectors, 8 subspaces of 8 dims;
# distances and the final distortion are explicit left-associated add
# chains (same evaluation order as the Spark expressions → bit-exact).
_PQ_DIST = " + ".join(
    f"(u[{d}] - c[{d}]) * (u[{d}] - c[{d}])" for d in range(1, 9)
)
_PQ_CODE = " || ".join(f"printf('%x', j{s})" for s in range(8))
_PQ_JMAX = ", ".join(
    f"MAX(CASE WHEN s = {s} THEN j END) AS j{s}" for s in range(8)
)
_PQ_DMAX = ", ".join(
    f"MAX(CASE WHEN s = {s} THEN dist END) AS d{s}" for s in range(8)
)
_PQ_DISTORT = " + ".join(f"d{s}" for s in range(8))
ORACLES["pq_codes"] = f"""
WITH emb AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
subs AS (SELECT unnest(range(8)) AS s),
sv AS (
    SELECT vec_id, s, list_slice(v, s * 8 + 1, s * 8 + 8) AS u
    FROM emb CROSS JOIN subs
),
cb AS (
    SELECT vec_id AS j, s, list_slice(v, s * 8 + 1, s * 8 + 8) AS c
    FROM emb CROSS JOIN subs WHERE vec_id < 16
),
d AS (
    SELECT sv.vec_id, sv.s, cb.j, {_PQ_DIST} AS dist
    FROM sv JOIN cb ON sv.s = cb.s
),
r AS (
    SELECT vec_id, s, j, dist,
           ROW_NUMBER() OVER (PARTITION BY vec_id, s
                              ORDER BY dist, j) AS rn
    FROM d
),
p AS (
    SELECT vec_id, {_PQ_JMAX}, {_PQ_DMAX}
    FROM r WHERE rn = 1 GROUP BY vec_id
)
SELECT vec_id, {_PQ_CODE} AS code, {_PQ_DISTORT} AS distortion
FROM p ORDER BY vec_id
"""

ORACLES["value_outliers"] = """
WITH ranked AS (
    SELECT event_type, value,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM events
),
q AS (
    SELECT event_type,
           MIN(CASE WHEN rn = (n + 3) // 4 THEN value END) AS q1,
           MIN(CASE WHEN rn = (n * 3 + 3) // 4 THEN value END) AS q3
    FROM ranked
    WHERE rn = (n + 3) // 4 OR rn = (n * 3 + 3) // 4
    GROUP BY event_type
),
fences AS (
    SELECT event_type, q1, q3,
           q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
    FROM q
)
SELECT e.event_type,
       COUNT(*) AS n_events,
       MIN(q1) AS q1,
       MIN(q3) AS q3,
       CAST(SUM(CAST(e.value < f.lo AS BIGINT)) AS BIGINT) AS n_low,
       CAST(SUM(CAST(e.value > f.hi AS BIGINT)) AS BIGINT) AS n_high
FROM events e JOIN fences f ON e.event_type = f.event_type
GROUP BY e.event_type
ORDER BY e.event_type
"""


# Streaming left-outer attribution equals the batch left join once the
# heartbeat-driven watermark flush has emitted every unmatched purchase.
ORACLES["events_attribution_stream"] = """
SELECT p.event_id AS purchase_id, p.user_id,
       COUNT(c.event_id) AS n_clicks
FROM events p
LEFT JOIN events c
  ON c.user_id = p.user_id AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY 1, 2
ORDER BY purchase_id
"""


# count_min_users rebuilds the identical md5-bucketed CM sketch in SQL:
# the bucket expression strings are generated by the same helper the
# Spark plan uses (operators/approx._cm_bucket_sql), so cells and
# estimates agree cell-for-cell.
from ..operators.approx import _cm_bucket_sql as _cmb

_CM_CELLS = " UNION ALL ".join(
    f"SELECT {r} AS r, {_cmb('user_id', r, 64)} AS bucket FROM events"
    for r in range(4)
)
ORACLES["count_min_users"] = f"""
WITH probes AS ({_CM_CELLS}),
cells AS (
    SELECT r, bucket, COUNT(*) AS cnt FROM probes GROUP BY r, bucket
),
exact AS (
    SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY user_id
),
keyprobe AS (
    SELECT user_id, r, bucket FROM (
        {" UNION ALL ".join(f"SELECT user_id, {r} AS r, {_cmb('user_id', r, 64)} AS bucket FROM exact" for r in range(4))}
    )
),
est AS (
    SELECT k.user_id, MIN(c.cnt) AS cm_est
    FROM keyprobe k JOIN cells c ON k.r = c.r AND k.bucket = c.bucket
    GROUP BY k.user_id
)
SELECT e.user_id, e.exact_n, s.cm_est
FROM exact e JOIN est s ON e.user_id = s.user_id
ORDER BY e.user_id
"""


ORACLES["sampled_quantiles"] = """
WITH ev AS (
    SELECT event_type, event_id, value,
           md5(CAST(event_id AS STRING)) AS coin
    FROM events
),
samp AS (
    SELECT event_type, event_id, value
    FROM (
        SELECT event_type, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY coin, event_id) AS srn
        FROM ev
    ) WHERE srn <= 200
),
exact_r AS (
    SELECT event_type, value,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM ev
),
exact AS (
    SELECT event_type,
           MIN(CASE WHEN rn = CEIL(n * 0.5) THEN value END) AS p50_exact,
           MIN(CASE WHEN rn = CEIL(n * 0.9) THEN value END) AS p90_exact,
           CAST(MAX(n) AS BIGINT) AS n_exact
    FROM exact_r GROUP BY event_type
),
samp_r AS (
    SELECT event_type, value,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM samp
),
est AS (
    SELECT event_type,
           MIN(CASE WHEN rn = CEIL(n * 0.5) THEN value END) AS p50_sample,
           MIN(CASE WHEN rn = CEIL(n * 0.9) THEN value END) AS p90_sample,
           CAST(MAX(n) AS BIGINT) AS n_sample
    FROM samp_r GROUP BY event_type
)
SELECT e.event_type, e.n_exact, s.n_sample,
       e.p50_exact, s.p50_sample, e.p90_exact, s.p90_sample
FROM exact e JOIN est s ON e.event_type = s.event_type
ORDER BY e.event_type
"""


# bloom_screen shares its bit-position SQL with the Spark plan
# (operators/approx.bloom_bits_sql) — filter construction, probes, and
# false-positive accounting are structurally identical.
from ..operators.approx import bloom_bits_sql as _bbits

_B_EXPRS = _bbits("user_id", 3, 1024)
ORACLES["bloom_screen"] = f"""
WITH flagged AS (
    SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
),
bits AS (
    {" UNION ".join(f"SELECT DISTINCT {e} AS bit FROM flagged" for e in _B_EXPRS)}
),
keys AS (SELECT DISTINCT user_id FROM events),
probes AS (
    {" UNION ALL ".join(f"SELECT user_id, {e} AS bit FROM keys" for e in _B_EXPRS)}
),
hits AS (
    SELECT p.user_id, COUNT(*) AS nset
    FROM probes p JOIN bits b ON p.bit = b.bit
    GROUP BY p.user_id
),
screened AS (
    SELECT e.event_type,
           COALESCE(h.nset, 0) = 3 AS bloom_hit,
           f.user_id IS NOT NULL AS is_member
    FROM events e
    LEFT JOIN hits h ON e.user_id = h.user_id
    LEFT JOIN flagged f ON e.user_id = f.user_id
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(bloom_hit AS BIGINT)) AS BIGINT) AS n_bloom_hits,
       CAST(SUM(CAST(is_member AS BIGINT)) AS BIGINT) AS n_true_members,
       CAST(SUM(CAST(bloom_hit AND NOT is_member AS BIGINT)) AS BIGINT)
           AS n_false_positives
FROM screened
GROUP BY event_type
ORDER BY event_type
"""


# similarity_ivfpq: IVF cell CTEs from similarity_ivf + PQ winner CTEs
# from pq_codes + the asymmetric-distance ranking. Sub-distances reuse
# the same left-assoc chain string (_PQ_DIST) over (query subvector,
# codeword) pairs.
ORACLES["similarity_ivfpq"] = f"""
WITH p AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
cent AS (
    SELECT vec_id AS cell_id, v AS cv, nrm AS cnrm FROM p WHERE vec_id < 16
),
corpus_assign AS (
    SELECT vec_id, cell_id FROM (
        SELECT p.vec_id, c.cell_id,
               row_number() OVER (
                   PARTITION BY p.vec_id
                   ORDER BY list_dot_product(p.v, c.cv) / (p.nrm * c.cnrm)
                            DESC, c.cell_id ASC) AS rn
        FROM p CROSS JOIN cent c
    ) WHERE rn = 1
),
query_assign AS (
    SELECT vec_id, cell_id FROM (
        SELECT p.vec_id, c.cell_id,
               row_number() OVER (
                   PARTITION BY p.vec_id
                   ORDER BY list_dot_product(p.v, c.cv) / (p.nrm * c.cnrm)
                            DESC, c.cell_id ASC) AS rn
        FROM p CROSS JOIN cent c WHERE p.vec_id < 50
    ) WHERE rn <= 2
),
cand AS (
    SELECT DISTINCT q.vec_id AS qid, a.vec_id AS nid
    FROM query_assign q JOIN corpus_assign a USING (cell_id)
    WHERE a.vec_id != q.vec_id
),
subs AS (SELECT unnest(range(8)) AS s),
sv AS (
    SELECT vec_id, s, list_slice(v, s * 8 + 1, s * 8 + 8) AS u
    FROM p CROSS JOIN subs
),
cb AS (
    SELECT vec_id AS j, s, list_slice(v, s * 8 + 1, s * 8 + 8) AS c
    FROM p CROSS JOIN subs WHERE vec_id < 16
),
pqd AS (
    SELECT sv.vec_id, sv.s, cb.j, {_PQ_DIST} AS dist
    FROM sv JOIN cb ON sv.s = cb.s
),
codes AS (
    SELECT vec_id AS nid, s, j FROM (
        SELECT vec_id, s, j,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY dist, j) AS rn
        FROM pqd
    ) WHERE rn = 1
),
persub AS (
    SELECT cd.qid, cd.nid, q.s, {_PQ_DIST} AS sdist
    FROM cand cd
    JOIN sv q ON q.vec_id = cd.qid
    JOIN codes k ON k.nid = cd.nid AND k.s = q.s
    JOIN cb ON cb.j = k.j AND cb.s = q.s
),
pv AS (
    SELECT qid, nid,
           {", ".join(f"MAX(CASE WHEN s = {s} THEN sdist END) AS d{s}" for s in range(8))}
    FROM persub GROUP BY qid, nid
),
short AS (
    SELECT qid, nid, adc_dist FROM (
        SELECT qid, nid, {" + ".join(f"d{s}" for s in range(8))} AS adc_dist,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY {" + ".join(f"d{s}" for s in range(8))},
                                           nid) AS adc_rnk
        FROM pv
    ) WHERE adc_rnk <= 20
),
rer AS (
    SELECT sh.qid, sh.nid, sh.adc_dist,
           list_dot_product(pq.v, pn.v) / (pq.nrm * pn.nrm) AS cos_sim
    FROM short sh
    JOIN p pq ON pq.vec_id = sh.qid
    JOIN p pn ON pn.vec_id = sh.nid
)
SELECT qid, nid, adc_dist, cos_sim, CAST(rnk AS INTEGER) AS rnk FROM (
    SELECT qid, nid, adc_dist, cos_sim,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY cos_sim DESC, nid) AS rnk
    FROM rer
) WHERE rnk <= 5 ORDER BY qid, rnk
"""


ORACLES["ledger_asof"] = f"""
WITH {fixtures.ledger_values_cte()},
ev AS (
    SELECT version, applied_at AS ev_ts, 'applied' AS ev_status
    FROM schema_migrations
    UNION ALL
    SELECT version, applied_at + INTERVAL 5 MINUTE, 'rolled_back'
    FROM schema_migrations WHERE status = 'rolled_back'
),
ranked AS (
    SELECT version, ev_ts, ev_status,
           ROW_NUMBER() OVER (PARTITION BY version
                              ORDER BY ev_ts DESC, ev_status) AS rn
    FROM ev
    WHERE ev_ts <= TIMESTAMP '2024-01-01 00:06:30'
)
SELECT version, ev_status AS status_asof,
       strftime(ev_ts, '%Y-%m-%d %H:%M:%S') AS as_of_ts
FROM ranked WHERE rn = 1
ORDER BY version
"""

# hierarchical_rollup's oracle aggregates the DAILY result directly from
# raw events — equality proves re-aggregating hourly partials loses
# nothing (exact-decimal partials are associative).
ORACLES["hierarchical_rollup"] = f"""
WITH hourly AS (
    SELECT date_trunc('hour', ts) AS hour_ts, event_type
    FROM events GROUP BY 1, 2
),
hcount AS (
    SELECT date_trunc('day', hour_ts) AS day_ts, event_type,
           COUNT(*) AS n_hours
    FROM hourly GROUP BY 1, 2
),
daily AS (
    SELECT date_trunc('day', ts) AS day_ts, event_type,
           COUNT(*) AS n_events,
           {_dsum('value', 'sum_value')}
    FROM events GROUP BY 1, 2
)
SELECT strftime(d.day_ts, '%Y-%m-%d %H:%M:%S') AS day,
       d.event_type, d.n_events, d.sum_value, h.n_hours
FROM daily d
JOIN hcount h ON d.day_ts = h.day_ts AND d.event_type = h.event_type
ORDER BY day, d.event_type
"""


# user_profiles_stream (full oracle since r03): the stateful kernel sums
# exact scaled integers, so the drained profiles equal the batch decimal
# aggregate with one final double division on both sides.
ORACLES["user_profiles_stream"] = """
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(CAST(value AS DECIMAL(28,10)) * 10000000000
                     AS BIGINT)) AS DOUBLE) / 10000000000 AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


ORACLES["user_retention_cohorts"] = """
WITH ev AS (
    SELECT user_id,
           CAST(epoch_us(ts) AS BIGINT) // CAST(604800000000 AS BIGINT) AS wk
    FROM events
),
first AS (
    SELECT user_id, MIN(wk) AS cohort_wk FROM ev GROUP BY user_id
)
SELECT f.cohort_wk,
       e.wk - f.cohort_wk AS weeks_since,
       COUNT(DISTINCT e.user_id) AS n_active
FROM ev e JOIN first f ON e.user_id = f.user_id
GROUP BY f.cohort_wk, e.wk - f.cohort_wk
ORDER BY cohort_wk, weeks_since
"""


# dedup_consensus: the three candidate generators' oracles composed into
# one statement — the minhash band chain inlined without the mirror
# corpus (renamed CTEs to avoid clashing with the shared Jaccard chain),
# the Jaccard chain reused verbatim, and the embedding-LSH oracle nested
# as a subquery (its own WITH scope). r08: parametric in the embedding
# leg's bit-width (see build_dedup_embedding_oracle).
def build_dedup_consensus_oracle(bits: int = _EMB_BITS) -> str:
    return _DEDUP_CONSENSUS_TEMPLATE.replace(
        "__EMB_ORACLE__", build_dedup_embedding_oracle(bits)
    )


_DEDUP_CONSENSUS_TEMPLATE = f"""
WITH {_JACC_CTES},
mtoks AS (SELECT doc_id AS doc, {TX.sql_tokens("text")} AS t FROM documents),
msh AS (
    SELECT doc, unnest(
        CASE WHEN len(t) >= 3
             THEN list_distinct(list_transform(range(1, len(t) - 1),
                  i -> array_to_string(list_slice(t, i, i + 2), ' ')))
             ELSE [] END) AS shingle
    FROM mtoks
),
mshx AS (SELECT doc, md5(shingle) AS shex FROM msh),
mseeded AS (
    SELECT doc, i, md5(CAST(i AS VARCHAR) || ':' || shex) AS hx
    FROM mshx CROSS JOIN range(32) r(i)
),
msigs AS (
    SELECT doc, i, MIN(substr(hx, 1, 16)) AS h
    FROM mseeded GROUP BY doc, i
),
mbands AS (
    SELECT doc, CAST(i // 4 AS INTEGER) AS band_id,
           md5(string_agg(h, ',' ORDER BY i)) AS band_hash
    FROM msigs GROUP BY doc, i // 4
),
mh AS MATERIALIZED (
    SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
    FROM mbands a JOIN mbands b
      ON a.band_id = b.band_id AND a.band_hash = b.band_hash
     AND a.doc < b.doc
),
ng AS MATERIALIZED (SELECT doc_a, doc_b FROM jacc),
-- CTE (not inline subquery) so DuckDB materializes the embedding-LSH
-- chain ONCE for its two references below; at the ×10 sweep scale the
-- doubly-evaluated subquery form spilled past the sandbox disk.
em AS MATERIALIZED (
    SELECT id_a AS doc_a, id_b AS doc_b FROM (__EMB_ORACLE__)
),
allp AS (
    SELECT doc_a, doc_b FROM mh
    UNION SELECT doc_a, doc_b FROM ng
    UNION SELECT doc_a, doc_b FROM em
)
SELECT p.doc_a, p.doc_b,
       m.doc_a IS NOT NULL AS by_minhash,
       n.doc_a IS NOT NULL AS by_ngram,
       e.doc_a IS NOT NULL AS by_embedding,
       CAST(m.doc_a IS NOT NULL AS INT)
         + CAST(n.doc_a IS NOT NULL AS INT)
         + CAST(e.doc_a IS NOT NULL AS INT) AS n_methods
FROM allp p
LEFT JOIN mh m ON p.doc_a = m.doc_a AND p.doc_b = m.doc_b
LEFT JOIN ng n ON p.doc_a = n.doc_a AND p.doc_b = n.doc_b
LEFT JOIN em e ON p.doc_a = e.doc_a AND p.doc_b = e.doc_b
ORDER BY p.doc_a, p.doc_b
"""

ORACLES["dedup_consensus"] = build_dedup_consensus_oracle(_EMB_BITS)


def adaptive_oracle_overrides(n_embeddings: int) -> dict:
    """Oracle entries whose SQL depends on the input scale, rebuilt for
    an embeddings table of ``n_embeddings`` rows with the SAME bit-width
    formula the query side uses (`adaptive_lsh_bits`). The scale sweeps
    (tools/scale_sweep.py) merge these over the static ORACLES before
    comparing; at fixture scale (n ≤ 2048·…, bits floor 6) the rebuilt
    strings are byte-identical to the static entries, so this is a no-op
    for the driver's sf0.01 gate and the sf0.1 cert."""
    import math

    from ..operators.similarity import adaptive_lsh_bits

    bits = adaptive_lsh_bits(n_embeddings)
    # the sharded path sizes bits to the shard-pair JOB (2N/S, S=4 in
    # the registry query), not to N — mirror that formula exactly
    sharded_bits = adaptive_lsh_bits(math.ceil(2 * n_embeddings / 4))
    return {
        "dedup_embedding": build_dedup_embedding_oracle(bits),
        "dedup_consensus": build_dedup_consensus_oracle(bits),
        "dedup_embedding_sharded": build_dedup_embedding_sharded_oracle(
            sharded_bits
        ),
    }


# orders_nested: canonical-JSON nested round trip. Field order inside
# struct_pack matches the Spark struct, list_sort matches array_sort
# (field-wise lexicographic), and both engines serialize compact JSON
# with insertion-ordered keys.
ORACLES["orders_nested"] = """
WITH lines AS (
    SELECT l_orderkey,
           struct_pack(
               ln := l_linenumber,
               qty := CAST(l_quantity AS BIGINT),
               pk := l_partkey
           ) AS line
    FROM lineitem WHERE l_orderkey < 5000
)
SELECT l_orderkey,
       COUNT(*) AS n_lines,
       CAST(SUM(line.qty) AS BIGINT) AS total_qty,
       CAST(to_json(list_sort(list(line))) AS VARCHAR) AS lines_json
FROM lines
GROUP BY l_orderkey
ORDER BY l_orderkey
"""


# Chained stateful streaming twin: batch interval join grouped by hour.
ORACLES["events_copair_hourly_stream"] = """
SELECT strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:%M:%S')
           AS hour_bucket,
       e.event_type AS a_type, f.event_type AS b_type,
       COUNT(*) AS n_pairs
FROM events e
JOIN events f
  ON f.user_id = e.user_id
 AND f.ts > e.ts
 AND epoch_us(f.ts) <= epoch_us(e.ts) + 60000000
GROUP BY 1, 2, 3
ORDER BY hour_bucket, a_type, b_type
"""


ORACLES["augment_dropout"] = f"""
WITH toks AS (
    SELECT doc_id, unnest({TX.sql_tokens("text")}) AS tok,
           generate_subscripts({TX.sql_tokens("text")}, 1) - 1 AS pos
    FROM documents
),
kept AS (
    SELECT doc_id, pos, tok FROM toks
    WHERE substr(md5(doc_id || ':' || pos), 1, 1) != '0'
),
agg AS (
    SELECT doc_id, COUNT(*) AS n_kept,
           md5(string_agg(tok, ' ' ORDER BY pos)) AS aug_hash
    FROM kept GROUP BY doc_id
),
sizes AS (
    SELECT doc_id, len({TX.sql_tokens("text")}) AS n_tokens FROM documents
)
SELECT a.doc_id, s.n_tokens, a.n_kept, a.aug_hash
FROM agg a JOIN sizes s ON a.doc_id = s.doc_id
ORDER BY a.doc_id
"""


ORACLES["bpe_first_merges"] = f"""
WITH toks AS (
    SELECT unnest({TX.sql_tokens("text")}) AS tok FROM documents
),
pairs AS (
    SELECT substr(tok, i, 2) AS pair
    FROM toks, LATERAL unnest(range(1, len(tok))) t(i)
    WHERE len(tok) >= 2
)
SELECT pair, COUNT(*) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair
LIMIT 20
"""


ORACLES["unigram_score"] = f"""
WITH toks AS (
    SELECT doc_id, unnest({TX.sql_tokens("text")}) AS tok FROM documents
),
freq AS (SELECT tok, COUNT(*) AS cf FROM toks GROUP BY tok),
total AS (SELECT COUNT(*) AS n FROM toks)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(f.cf) AS BIGINT) AS cf_sum,
       CAST(CAST(SUM(f.cf) AS BIGINT) AS DOUBLE)
           / CAST(COUNT(*) * (SELECT n FROM total) AS DOUBLE)
           AS avg_unigram_p
FROM toks t JOIN freq f ON t.tok = f.tok
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


# jaccard_est_error: minhash signature chain (no mirror) + the capped
# shingle pair counts, error terms kept rational (integer numerators).
ORACLES["jaccard_est_error"] = f"""
WITH {_JACC_CTES},
mtoks AS (SELECT doc_id AS doc, {TX.sql_tokens("text")} AS t FROM documents),
msh AS (
    SELECT doc, unnest(
        CASE WHEN len(t) >= 3
             THEN list_distinct(list_transform(range(1, len(t) - 1),
                  i -> array_to_string(list_slice(t, i, i + 2), ' ')))
             ELSE [] END) AS shingle
    FROM mtoks
),
mshx AS (SELECT doc, md5(shingle) AS shex FROM msh),
mseeded AS (
    SELECT doc, i, md5(CAST(i AS VARCHAR) || ':' || shex) AS hx
    FROM mshx CROSS JOIN range(32) r(i)
),
msigs AS (
    SELECT doc, i, MIN(substr(hx, 1, 16)) AS h
    FROM mseeded GROUP BY doc, i
),
mbands AS (
    SELECT doc, CAST(i // 4 AS INTEGER) AS band_id,
           md5(string_agg(h, ',' ORDER BY i)) AS band_hash
    FROM msigs GROUP BY doc, i // 4
),
mcand AS (
    SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
    FROM mbands a JOIN mbands b
      ON a.band_id = b.band_id AND a.band_hash = b.band_hash
     AND a.doc < b.doc
),
mh AS (
    SELECT c.doc_a, c.doc_b,
           CAST(SUM(CASE WHEN sa.h = sb.h THEN 1 ELSE 0 END) AS BIGINT) AS k
    FROM mcand c
    JOIN msigs sa ON sa.doc = c.doc_a
    JOIN msigs sb ON sb.doc = c.doc_b AND sb.i = sa.i
    GROUP BY c.doc_a, c.doc_b
),
exact AS (
    SELECT doc_a, doc_b, common,
           sa.n_sh + sb.n_sh - common AS u
    FROM prs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
),
per_pair AS (
    SELECT CAST((10 * m.k) // 32 AS INT) AS est_decile,
           abs(m.k * e.u - 32 * e.common) AS num,
           32 * e.u AS den,
           CAST(abs(m.k * e.u - 32 * e.common) AS DOUBLE)
               / (32 * e.u) AS abs_err
    FROM mh m JOIN exact e
      ON m.doc_a = e.doc_a AND m.doc_b = e.doc_b
)
SELECT est_decile,
       COUNT(*) AS n_pairs,
       {_dsum('abs_err', 'sum_abs_err')},
       CAST(CAST(SUM(CAST(abs_err AS {_DEC})) AS VARCHAR) AS DOUBLE)
           / COUNT(*) AS mean_abs_err
FROM per_pair
GROUP BY est_decile
ORDER BY est_decile
"""



# mmr_rerank: the greedy MMR loop unrolled into five SQL stages —
# structurally identical to the Spark plan stages.
ORACLES["mmr_rerank"] = """
WITH prepared AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
pool AS (
    SELECT qid, nid, rel FROM (
        SELECT q.vec_id AS qid, n.vec_id AS nid,
               list_dot_product(q.v, n.v) / (q.nrm * n.nrm) AS rel,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_dot_product(q.v, n.v) / (q.nrm * n.nrm)
                            DESC, n.vec_id ASC) AS rnk
        FROM prepared q CROSS JOIN prepared n
        WHERE q.vec_id < 10 AND q.vec_id != n.vec_id
    ) WHERE rnk <= 20
),
psim AS (
    SELECT a.qid, a.nid AS na, b.nid AS nb,
           list_dot_product(pa.v, pb.v) / (pa.nrm * pb.nrm) AS sim
    FROM pool a
    JOIN pool b ON a.qid = b.qid AND a.nid != b.nid
    JOIN prepared pa ON pa.vec_id = a.nid
    JOIN prepared pb ON pb.vec_id = b.nid
),
sel1 AS (
    SELECT qid, nid, rel, 1 AS mmr_rank FROM (
        SELECT qid, nid, rel,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY rel DESC, nid) AS rn
        FROM pool
    ) WHERE rn = 1
),
rem2 AS (
    SELECT c.qid, c.nid, c.rel FROM pool c
    LEFT JOIN sel1 s ON c.qid = s.qid AND c.nid = s.nid
    WHERE s.nid IS NULL
),
div2 AS (
    SELECT r.qid, r.nid, r.rel, MAX(p.sim) AS max_sim
    FROM rem2 r
    JOIN psim p ON p.qid = r.qid AND p.na = r.nid
    JOIN sel1 s ON s.qid = p.qid AND s.nid = p.nb
    GROUP BY r.qid, r.nid, r.rel
),
pick2 AS (
    SELECT qid, nid, rel, 2 AS mmr_rank FROM (
        SELECT qid, nid, rel,
               ROW_NUMBER() OVER (
                   PARTITION BY qid
                   ORDER BY 0.7 * rel - 0.3 * max_sim DESC, nid) AS rn
        FROM div2
    ) WHERE rn = 1
),
sel2 AS (
    SELECT qid, nid, rel, mmr_rank FROM sel1
    UNION ALL SELECT qid, nid, rel, mmr_rank FROM pick2
),
rem3 AS (
    SELECT c.qid, c.nid, c.rel FROM pool c
    LEFT JOIN sel2 s ON c.qid = s.qid AND c.nid = s.nid
    WHERE s.nid IS NULL
),
div3 AS (
    SELECT r.qid, r.nid, r.rel, MAX(p.sim) AS max_sim
    FROM rem3 r
    JOIN psim p ON p.qid = r.qid AND p.na = r.nid
    JOIN sel2 s ON s.qid = p.qid AND s.nid = p.nb
    GROUP BY r.qid, r.nid, r.rel
),
pick3 AS (
    SELECT qid, nid, rel, 3 AS mmr_rank FROM (
        SELECT qid, nid, rel,
               ROW_NUMBER() OVER (
                   PARTITION BY qid
                   ORDER BY 0.7 * rel - 0.3 * max_sim DESC, nid) AS rn
        FROM div3
    ) WHERE rn = 1
),
sel3 AS (
    SELECT qid, nid, rel, mmr_rank FROM sel2
    UNION ALL SELECT qid, nid, rel, mmr_rank FROM pick3
),
rem4 AS (
    SELECT c.qid, c.nid, c.rel FROM pool c
    LEFT JOIN sel3 s ON c.qid = s.qid AND c.nid = s.nid
    WHERE s.nid IS NULL
),
div4 AS (
    SELECT r.qid, r.nid, r.rel, MAX(p.sim) AS max_sim
    FROM rem4 r
    JOIN psim p ON p.qid = r.qid AND p.na = r.nid
    JOIN sel3 s ON s.qid = p.qid AND s.nid = p.nb
    GROUP BY r.qid, r.nid, r.rel
),
pick4 AS (
    SELECT qid, nid, rel, 4 AS mmr_rank FROM (
        SELECT qid, nid, rel,
               ROW_NUMBER() OVER (
                   PARTITION BY qid
                   ORDER BY 0.7 * rel - 0.3 * max_sim DESC, nid) AS rn
        FROM div4
    ) WHERE rn = 1
),
sel4 AS (
    SELECT qid, nid, rel, mmr_rank FROM sel3
    UNION ALL SELECT qid, nid, rel, mmr_rank FROM pick4
),
rem5 AS (
    SELECT c.qid, c.nid, c.rel FROM pool c
    LEFT JOIN sel4 s ON c.qid = s.qid AND c.nid = s.nid
    WHERE s.nid IS NULL
),
div5 AS (
    SELECT r.qid, r.nid, r.rel, MAX(p.sim) AS max_sim
    FROM rem5 r
    JOIN psim p ON p.qid = r.qid AND p.na = r.nid
    JOIN sel4 s ON s.qid = p.qid AND s.nid = p.nb
    GROUP BY r.qid, r.nid, r.rel
),
pick5 AS (
    SELECT qid, nid, rel, 5 AS mmr_rank FROM (
        SELECT qid, nid, rel,
               ROW_NUMBER() OVER (
                   PARTITION BY qid
                   ORDER BY 0.7 * rel - 0.3 * max_sim DESC, nid) AS rn
        FROM div5
    ) WHERE rn = 1
),
sel5 AS (
    SELECT qid, nid, rel, mmr_rank FROM sel4
    UNION ALL SELECT qid, nid, rel, mmr_rank FROM pick5
)
SELECT qid, nid, rel, CAST(mmr_rank AS INT) AS mmr_rank
FROM sel5
ORDER BY qid, mmr_rank
"""


# --- winnowing_fingerprints (r04) ------------------------------------------
# Robust winnowing replayed relationally: 4-gram md5 positions → signed-64
# heads → window starts s ∈ [1, max(ng-3, 1)] → per-window argmin with
# rightmost tie-break → distinct selected fingerprints → per-doc profile.
# Gram strings match operators/dedup.positioned_shingles exactly
# (array_to_string(list_slice) == concat_ws(slice)).
from ..functions.portable_hash import signed64_from_hex_sql as _S64  # noqa: E402

# Shared winnow-selection CTE chain (k=4, w=4) — used verbatim by
# winnowing_fingerprints (per-doc profile) and moss_matches (pair join),
# so both oracles replay the identical fingerprint selection.
_WINNOW_SEL = f"""toks AS (
    SELECT doc_id AS doc, {_TOKS} AS t FROM documents
),
g AS (
    SELECT doc, unnest(generate_series(1, len(t) - 3)) AS pos, t
    FROM toks WHERE len(t) >= 4
),
h AS (
    SELECT doc, pos,
           {_S64("md5(array_to_string(list_slice(t, pos, pos + 3), ' '))")}
               AS hval
    FROM g
),
ng AS (SELECT doc, MAX(pos) AS max_pos FROM h GROUP BY doc),
starts AS (
    SELECT h.doc, h.pos AS s
    FROM h JOIN ng USING (doc)
    WHERE h.pos <= GREATEST(ng.max_pos - 3, 1)
),
members AS (
    SELECT st.doc, st.s, h.pos, h.hval
    FROM starts st
    JOIN h ON h.doc = st.doc AND h.pos BETWEEN st.s AND st.s + 3
),
sel AS (
    SELECT DISTINCT doc, pos, hval FROM (
        SELECT doc, s, pos, hval,
               ROW_NUMBER() OVER (
                   PARTITION BY doc, s ORDER BY hval, pos DESC) AS rn
        FROM members
    ) WHERE rn = 1
)"""

ORACLES["winnowing_fingerprints"] = f"""
WITH {_WINNOW_SEL},
agg AS (
    SELECT doc,
           COUNT(*) AS n_fps,
           SUM(hval % 1000000007) AS fp_modsum,
           MIN(hval) AS fp_min,
           MAX(hval) AS fp_max
    FROM sel GROUP BY doc
)
SELECT t.doc AS doc_id,
       CAST(GREATEST(len(t.t) - 3, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(a.n_fps, 0) AS BIGINT) AS n_fps,
       CASE WHEN len(t.t) - 3 > 0
            THEN CAST(COALESCE(a.n_fps, 0) AS DOUBLE)
                 / CAST(len(t.t) - 3 AS DOUBLE)
            ELSE CAST(0 AS DOUBLE) END AS fp_density,
       CAST(COALESCE(a.fp_modsum, 0) AS BIGINT) AS fp_modsum,
       CAST(COALESCE(a.fp_min, 0) AS BIGINT) AS fp_min,
       CAST(COALESCE(a.fp_max, 0) AS BIGINT) AS fp_max
FROM toks t LEFT JOIN agg a ON a.doc = t.doc
ORDER BY doc_id
"""


# --- semdedup_embeddings (r04) ---------------------------------------------
# The kmeans trajectory CTEs (same fragments as kmeans_embeddings) give the
# final cluster assignment; pruning is a within-cluster (a < b) pair join
# with sequential-fold cosine — max over a smaller-id cluster-mate, keep
# iff below τ. COALESCE/τ constants are explicit DOUBLE casts so neither
# engine parses them as DECIMAL (the mmr_rerank r03 lesson).
ORACLES["semdedup_embeddings"] = f"""
WITH pts AS (
    SELECT vec_id AS pid, u.pos,
           CAST(FLOOR(CAST(embedding[u.pos] AS DOUBLE)
                      * CAST(1000000 AS DOUBLE)) AS BIGINT) AS ival
    FROM embeddings, LATERAL generate_series(1, 16) AS u(pos)
),
kv AS (
    -- k = max(4, ceil(N/500)): the same scaled cluster count the Spark
    -- side computes (r06 growth fix — fixed k made clusters grow with
    -- the corpus and the within-cluster pair join quadratic)
    SELECT GREATEST(4, CAST(CEIL(COUNT(*) / 500.0) AS INT)) AS k
    FROM embeddings
),
seeds AS (
    SELECT pid, rn - 1 AS cid FROM (
        SELECT pid, ROW_NUMBER() OVER (ORDER BY pid) AS rn
        FROM (SELECT pid FROM pts GROUP BY pid)
    ), kv WHERE rn <= kv.k
),
c0 AS (
    SELECT s.cid, p.pos, p.ival AS cval
    FROM seeds s JOIN pts p ON s.pid = p.pid
),
a1 AS ({_KM_ASSIGN.format(cent="c0")}),
c1 AS ({_KM_UPDATE.format(asg="a1")}),
a2 AS ({_KM_ASSIGN.format(cent="c1")}),
c2 AS ({_KM_UPDATE.format(asg="a2")}),
af AS ({_KM_ASSIGN.format(cent="c2")}),
p AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
pc AS (
    SELECT p.vec_id, a.cid, p.v, p.nrm
    FROM p JOIN af a ON a.pid = p.vec_id
),
prev AS (
    SELECT b.vec_id,
           MAX(list_dot_product(a.v, b.v) / (a.nrm * b.nrm))
               AS max_sim_prev
    FROM pc a JOIN pc b ON a.cid = b.cid AND a.vec_id < b.vec_id
    GROUP BY b.vec_id
)
SELECT pc.vec_id,
       CAST(pc.cid AS INT) AS cid,
       COALESCE(prev.max_sim_prev, CAST(-1 AS DOUBLE)) AS max_sim_prev,
       CAST(CASE WHEN COALESCE(prev.max_sim_prev, CAST(-1 AS DOUBLE))
                      < CAST(0.3 AS DOUBLE)
                 THEN 1 ELSE 0 END AS INT) AS keep
FROM pc LEFT JOIN prev ON prev.vec_id = pc.vec_id
ORDER BY pc.vec_id
"""


# --- moss_matches (r04) ------------------------------------------------------
# MOSS match step: the shared _WINNOW_SEL selection, distinct (doc, hval),
# df cap at 50, (a < b) pair join, sizes counted after the cap, top-25 by
# shared DESC with (doc_a, doc_b) tiebreak — mirrors dedup.moss_match_pairs.
ORACLES["moss_matches"] = f"""
WITH {_WINNOW_SEL},
fp0 AS (SELECT DISTINCT doc, hval FROM sel),
rare AS (
    SELECT hval FROM fp0 GROUP BY hval HAVING COUNT(*) <= 50
),
fp AS (SELECT f.doc, f.hval FROM fp0 f JOIN rare USING (hval)),
sizes AS (SELECT doc, COUNT(*) AS n_fp FROM fp GROUP BY doc),
pairs AS (
    SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS shared
    FROM fp a JOIN fp b ON a.hval = b.hval AND a.doc < b.doc
    GROUP BY a.doc, b.doc
)
SELECT p.doc_a, p.doc_b, p.shared,
       sa.n_fp AS n_a, sb.n_fp AS n_b,
       CAST(p.shared AS DOUBLE) / LEAST(sa.n_fp, sb.n_fp) AS match_ratio
FROM pairs p
JOIN sizes sa ON sa.doc = p.doc_a
JOIN sizes sb ON sb.doc = p.doc_b
ORDER BY p.shared DESC, p.doc_a ASC, p.doc_b ASC
LIMIT 25
"""


# --- fuzzy_name_pairs (r04) --------------------------------------------------
# FastSS delete-1 neighborhood: signature 0 is the term itself, signature i
# deletes character i; candidate pairs share a signature, verification is
# levenshtein == 1 (the same integer DP in both engines). The vocabulary is
# the c_custkey < 1000 reconciliation batch of customer names.
ORACLES["fuzzy_name_pairs"] = """
WITH cust AS (
    SELECT c_name, c_acctbal, c_mktsegment FROM customer
    WHERE c_custkey < 1000
),
t AS (SELECT c_name AS term FROM cust WHERE LENGTH(c_name) >= 4),
sigs AS (
    SELECT term,
           CASE WHEN i = 0 THEN term
                ELSE SUBSTRING(term, 1, i - 1)
                     || SUBSTRING(term, i + 1, LENGTH(term)) END AS sig
    FROM (SELECT term, unnest(generate_series(0, LENGTH(term))) AS i FROM t)
),
cand AS (
    SELECT DISTINCT a.term AS term_a, b.term AS term_b
    FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.term < b.term
),
pairs AS (
    SELECT term_a, term_b FROM cand
    WHERE levenshtein(term_a, term_b) = 1
)
SELECT p.term_a AS name_a, p.term_b AS name_b,
       ca.c_acctbal AS bal_a, cb.c_acctbal AS bal_b,
       CAST(CASE WHEN ca.c_mktsegment = cb.c_mktsegment
                 THEN 1 ELSE 0 END AS INT) AS same_segment
FROM pairs p
JOIN cust ca ON ca.c_name = p.term_a
JOIN cust cb ON cb.c_name = p.term_b
ORDER BY name_a, name_b
"""


# --- bm25_search (r04) -------------------------------------------------------
# Log-free BM25 (k1=1.2, b=0.75): integer idf = (10^9 * N) // df scaled back
# by 1e9, per-term saturation ratio and the fixed-order 3-term sum written
# with the exact literals and left-to-right order queries.bm25_search uses —
# every double op identical, so scores are bit-equal. (1.2 + 1.0 == 2.2
# exactly in binary64, so the 2.2 literal below IS Spark's F.lit(K1 + 1.0).)
_BM25_NORM = (
    "1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE)"
    " / (CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))"
)


def _bm25_term(t: str) -> str:
    idf = (
        f"CAST(COALESCE((SELECT idf_int FROM idf WHERE tok = '{t}'), 0)"
        f" AS DOUBLE) / 1000000000.0"
    )
    return (
        f"CASE WHEN tf_{t} > 0 THEN ({idf})"
        f" * (CAST(tf_{t} AS DOUBLE) * 2.2)"
        f" / (CAST(tf_{t} AS DOUBLE) + {_BM25_NORM})"
        f" ELSE 0.0 END"
    )


ORACLES["bm25_search"] = f"""
WITH dl AS (
    SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS dl FROM documents
),
stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dl),
toks AS (
    SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
tf AS (
    SELECT doc_id, tok, COUNT(*) AS tf FROM toks
    WHERE tok IN ('hash', 'join', 'stream') GROUP BY doc_id, tok
),
idf AS (
    SELECT tok,
           (CAST(1000000000 AS BIGINT)
            * (SELECT n_docs FROM stats)) // COUNT(*) AS idf_int
    FROM tf GROUP BY tok
),
wide AS (
    SELECT doc_id,
           SUM(CASE WHEN tok = 'hash' THEN tf ELSE 0 END) AS tf_hash,
           SUM(CASE WHEN tok = 'join' THEN tf ELSE 0 END) AS tf_join,
           SUM(CASE WHEN tok = 'stream' THEN tf ELSE 0 END) AS tf_stream
    FROM tf GROUP BY doc_id
),
scored AS (
    SELECT w.doc_id, d.dl,
           CAST(w.tf_hash AS BIGINT) AS tf_hash,
           CAST(w.tf_join AS BIGINT) AS tf_join,
           CAST(w.tf_stream AS BIGINT) AS tf_stream,
           {_bm25_term("hash")} + {_bm25_term("join")}
               + {_bm25_term("stream")} AS bm25
    FROM wide w JOIN dl d USING (doc_id), stats
)
SELECT doc_id, dl, tf_hash, tf_join, tf_stream, bm25
FROM scored
ORDER BY bm25 DESC, doc_id ASC
LIMIT 20
"""


# --- ann_recall_curve (r04) --------------------------------------------------
# Recall@k of the LSH index vs exact top-10: the exact leg is the
# similarity_topk oracle at k=10; the ANN leg replays the identical
# md5-literal hyperplane buckets (same fragments as similarity_ann_lsh);
# hits are exact integer counts per k; recall is one double division.
ORACLES["ann_recall_curve"] = f"""
WITH p AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
epairs AS (
    SELECT q.vec_id AS qid, n.vec_id AS nid,
           list_dot_product(q.v, n.v) / (q.nrm * n.nrm) AS cos_sim
    FROM p q, p n
    WHERE q.vec_id < 50 AND q.vec_id != n.vec_id
),
exact AS (
    SELECT qid, nid, rnk AS e_rnk FROM (
        SELECT qid, nid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cos_sim DESC, nid ASC) AS rnk
        FROM epairs
    ) WHERE rnk <= 10
),
ckeys AS (
    SELECT vec_id, {_ann_bucket_sql(0)} AS bucket FROM p
    UNION ALL
    SELECT vec_id, {_ann_bucket_sql(1)} AS bucket FROM p
),
qbase AS (
    SELECT vec_id, bucket FROM ckeys WHERE vec_id < 50
),
qkeys AS (
    SELECT vec_id, bucket FROM qbase
    UNION ALL
    SELECT vec_id,
           bucket + CASE WHEN bucket % 2 = 0 THEN 1 ELSE -1 END AS bucket
    FROM qbase
),
cand AS (
    SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
    FROM qkeys q JOIN ckeys c USING (bucket)
    WHERE c.vec_id != q.vec_id
),
ascored AS (
    SELECT c.qid, c.nid,
           list_dot_product(pq.v, pn.v) / (pq.nrm * pn.nrm) AS cos_sim
    FROM cand c
    JOIN p pq ON pq.vec_id = c.qid
    JOIN p pn ON pn.vec_id = c.nid
),
ann AS (
    SELECT qid, nid, rnk AS a_rnk FROM (
        SELECT qid, nid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cos_sim DESC, nid ASC) AS rnk
        FROM ascored
    ) WHERE rnk <= 10
),
joined AS (
    SELECT e.qid, e.nid, e.e_rnk, a.a_rnk
    FROM exact e JOIN ann a ON a.qid = e.qid AND a.nid = e.nid
),
nqv AS (SELECT COUNT(DISTINCT vec_id) AS n_queries FROM p WHERE vec_id < 50),
hits AS (
    SELECT k.k,
           SUM(CASE WHEN j.e_rnk <= k.k AND j.a_rnk <= k.k
                    THEN 1 ELSE 0 END) AS hits
    FROM (VALUES (1), (5), (10)) k(k)
    LEFT JOIN joined j ON TRUE
    GROUP BY k.k
)
SELECT CAST(h.k AS INT) AS k,
       CAST(h.hits AS BIGINT) AS hits,
       CAST(n.n_queries AS BIGINT) AS n_queries,
       CAST(h.hits AS DOUBLE) / CAST(n.n_queries * h.k AS DOUBLE) AS recall
FROM hits h, nqv n
ORDER BY k
"""


# --- retrieval_eval (r05) ---------------------------------------------------
# MRR/NDCG@10 of keyword / bm25 / hybrid-RRF vs exact-cosine relevance.
# The NDCG discounts and IDCG are the SAME frozen Python integers the
# Spark plan uses (functions/retrieval_metrics.py), so DCG is an exact
# integer sum and each float is one division of exact integers.
from ..functions.retrieval_metrics import (  # noqa: E402
    DISCOUNTS_INT as _RE_DISC,
    IDCG_INT as _RE_IDCG,
    K_EVAL as _RE_K,
)

_RE_DISC_VALUES = ", ".join(
    f"({pos}, {_RE_DISC[pos - 1]})" for pos in range(1, _RE_K + 1)
)

ORACLES["retrieval_eval"] = f"""
WITH toks AS (
    SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
hits_t AS (
    SELECT doc_id, tok FROM toks WHERE tok IN ('hash', 'join', 'stream')
),
tf AS (
    SELECT doc_id, tok, COUNT(*) AS tf FROM hits_t GROUP BY doc_id, tok
),
idf AS (
    SELECT tok,
           (CAST(1000000000 AS BIGINT)
            * (SELECT COUNT(*) FROM documents)) // COUNT(*) AS idf_int
    FROM tf GROUP BY tok
),
kw_scored AS (
    SELECT t.doc_id, CAST(SUM(t.tf * i.idf_int) AS BIGINT) AS score_int
    FROM tf t JOIN idf i USING (tok) GROUP BY t.doc_id
),
kw50 AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY score_int DESC, doc_id) AS rnk
    FROM (SELECT * FROM kw_scored ORDER BY score_int DESC, doc_id LIMIT 50)
),
prepared AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
vpairs AS (
    SELECT n.vec_id AS doc_id,
           list_dot_product(q.v, n.v) / (q.nrm * n.nrm) AS cos_sim
    FROM prepared q, prepared n
    WHERE q.vec_id = 0 AND n.vec_id != 0
),
vec50 AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS rnk
    FROM (SELECT * FROM vpairs ORDER BY cos_sim DESC, doc_id LIMIT 50)
),
rel AS (
    SELECT doc_id, {_RE_K} + 1 - rnk AS gain FROM vec50 WHERE rnk <= {_RE_K}
),
dl AS (
    SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS dl FROM documents
),
stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dl),
wide AS (
    SELECT doc_id,
           SUM(CASE WHEN tok = 'hash' THEN tf ELSE 0 END) AS tf_hash,
           SUM(CASE WHEN tok = 'join' THEN tf ELSE 0 END) AS tf_join,
           SUM(CASE WHEN tok = 'stream' THEN tf ELSE 0 END) AS tf_stream
    FROM tf GROUP BY doc_id
),
bscored AS (
    SELECT w.doc_id,
           {_bm25_term("hash")} + {_bm25_term("join")}
               + {_bm25_term("stream")} AS bm25
    FROM wide w JOIN dl d USING (doc_id), stats
),
bm10 AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
    FROM (SELECT * FROM bscored ORDER BY bm25 DESC, doc_id LIMIT {_RE_K})
),
fused AS (
    SELECT COALESCE(k.doc_id, v.doc_id) AS doc_id,
           COALESCE(CAST(1 AS DOUBLE) / (60 + k.rnk), 0.0)
           + COALESCE(CAST(1 AS DOUBLE) / (60 + v.rnk), 0.0) AS rrf_score
    FROM kw50 k FULL OUTER JOIN vec50 v ON k.doc_id = v.doc_id
),
hy10 AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS rnk
    FROM (SELECT * FROM fused ORDER BY rrf_score DESC, doc_id LIMIT {_RE_K})
),
systems AS (
    SELECT 'keyword' AS system, doc_id, rnk FROM kw50 WHERE rnk <= {_RE_K}
    UNION ALL
    SELECT 'bm25' AS system, doc_id, rnk FROM bm10
    UNION ALL
    SELECT 'hybrid_rrf' AS system, doc_id, rnk FROM hy10
),
disc (rnk, disc_int) AS (VALUES {_RE_DISC_VALUES}),
joined AS (
    SELECT s.system, s.rnk, r.gain, d.disc_int
    FROM systems s
    JOIN disc d USING (rnk)
    LEFT JOIN rel r USING (doc_id)
),
per AS (
    SELECT system,
           SUM(CASE WHEN gain IS NOT NULL
                    THEN gain * disc_int ELSE 0 END) AS dcg_int,
           MIN(CASE WHEN gain IS NOT NULL THEN rnk END) AS first_rel,
           SUM(CASE WHEN gain IS NOT NULL THEN 1 ELSE 0 END) AS hits
    FROM joined GROUP BY system
)
SELECT system,
       CAST(COALESCE(first_rel, 0) AS INT) AS first_rel_rank,
       CAST(hits AS BIGINT) AS hits_at_k,
       CASE WHEN first_rel IS NOT NULL
            THEN CAST(1 AS DOUBLE) / first_rel ELSE 0.0 END AS mrr,
       CAST(dcg_int AS BIGINT) AS dcg_int,
       CAST(dcg_int AS DOUBLE) / CAST({_RE_IDCG} AS DOUBLE) AS ndcg
FROM per ORDER BY system
"""


# --- dedup_aware_split (r05) -------------------------------------------------
# Cluster-level split: the dedup_clusters component replay feeds the same
# md5-prefix bucketing train_val_test_split uses, keyed on cluster_id.
ORACLES["dedup_aware_split"] = f"""
WITH RECURSIVE {_JACC_CTES},
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM jacc
    UNION ALL
    SELECT doc_b AS a, doc_a AS b FROM jacc
),
reach AS (
    SELECT doc_id AS node, doc_id AS root FROM documents
    UNION
    SELECT e.b AS node, r.root FROM reach r JOIN edges e ON e.a = r.node
),
comp AS (
    SELECT node AS doc_id, MIN(root) AS cluster_id FROM reach GROUP BY node
)
SELECT doc_id, cluster_id,
       CASE WHEN SUBSTRING(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < '1a'
            THEN 'test'
            WHEN SUBSTRING(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < '34'
            THEN 'val'
            ELSE 'train' END AS split
FROM comp
ORDER BY doc_id
"""


# --- entity_canonicalize (r05) -----------------------------------------------
# FastSS pair replay (fuzzy_name_pairs CTEs) + recursive min-root components
# over the distance-1 name graph; canonical form = min name per component.
ORACLES["entity_canonicalize"] = """
WITH RECURSIVE t AS (
    SELECT c_custkey AS k, c_name AS term FROM customer
    WHERE c_custkey < 1000 AND LENGTH(c_name) >= 4
),
sigs AS (
    SELECT term,
           CASE WHEN i = 0 THEN term
                ELSE SUBSTRING(term, 1, i - 1)
                     || SUBSTRING(term, i + 1, LENGTH(term)) END AS sig
    FROM (SELECT term, unnest(generate_series(0, LENGTH(term))) AS i FROM t)
),
cand AS (
    SELECT DISTINCT a.term AS term_a, b.term AS term_b
    FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.term < b.term
),
pairs AS (
    SELECT term_a, term_b FROM cand
    WHERE levenshtein(term_a, term_b) = 1
),
kp AS (
    SELECT ta.k AS ka, tb.k AS kb
    FROM pairs
    JOIN t ta ON ta.term = pairs.term_a
    JOIN t tb ON tb.term = pairs.term_b
),
edges AS (
    SELECT ka AS a, kb AS b FROM kp
    UNION ALL
    SELECT kb AS a, ka AS b FROM kp
),
reach AS (
    SELECT k AS node, k AS root FROM t
    UNION
    SELECT e.b AS node, r.root FROM reach r JOIN edges e ON e.a = r.node
),
comp AS (
    SELECT node, MIN(root) AS label FROM reach GROUP BY node
)
SELECT tn.term AS name, tc.term AS canon_name,
       COUNT(*) OVER (PARTITION BY comp.label) AS cluster_size
FROM comp
JOIN t tn ON tn.k = comp.node
JOIN t tc ON tc.k = comp.label
ORDER BY name
"""


# --- mad_outliers (r05) ------------------------------------------------------
# Nearest-rank lower median and MAD per event_type, (value|dev, event_id)
# total order - exact row values, so the double arithmetic downstream is the
# identical IEEE tree in both engines.
ORACLES["mad_outliers"] = """
WITH e AS (SELECT event_id, event_type, value FROM events),
r1 AS (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM e
),
med AS (
    SELECT event_type, value AS med FROM r1 WHERE rn = (n + 1) // 2
),
d AS (
    SELECT e.event_id, e.event_type, e.value, m.med,
           ABS(e.value - m.med) AS dev
    FROM e JOIN med m USING (event_type)
),
r2 AS (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY dev, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM d
),
mad AS (
    SELECT event_type, dev AS mad FROM r2 WHERE rn = (n + 1) // 2
)
SELECT d.event_type,
       COUNT(*) AS n_events,
       MAX(d.med) AS median_value,
       MAX(m.mad) AS mad,
       CAST(SUM(CASE WHEN d.dev > 3.0 * m.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM d JOIN mad m USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
"""


# minhash_band_scurve: truth = unthresholded capped-shingle pair graph
# (prs/sizes from the shared chain); candidates = the md5 banded index
# (same chain as jaccard_est_error, mcand); analytic curve built by the
# same explicit-squaring IEEE tree as the Spark plan.
ORACLES["minhash_band_scurve"] = f"""
WITH {_JACC_CTES},
mtoks AS (SELECT doc_id AS doc, {TX.sql_tokens("text")} AS t FROM documents),
msh AS (
    SELECT doc, unnest(
        CASE WHEN len(t) >= 3
             THEN list_distinct(list_transform(range(1, len(t) - 1),
                  i -> array_to_string(list_slice(t, i, i + 2), ' ')))
             ELSE [] END) AS shingle
    FROM mtoks
),
mshx AS (SELECT doc, md5(shingle) AS shex FROM msh),
mseeded AS (
    SELECT doc, i, md5(CAST(i AS VARCHAR) || ':' || shex) AS hx
    FROM mshx CROSS JOIN range(32) r(i)
),
msigs AS (
    SELECT doc, i, MIN(substr(hx, 1, 16)) AS h
    FROM mseeded GROUP BY doc, i
),
mbands AS (
    SELECT doc, CAST(i // 4 AS INTEGER) AS band_id,
           md5(string_agg(h, ',' ORDER BY i)) AS band_hash
    FROM msigs GROUP BY doc, i // 4
),
mcand AS (
    SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
    FROM mbands a JOIN mbands b
      ON a.band_id = b.band_id AND a.band_hash = b.band_hash
     AND a.doc < b.doc
),
truth AS (
    SELECT p.doc_a, p.doc_b, p.common,
           sa.n_sh + sb.n_sh - p.common AS u
    FROM prs p
    JOIN sizes sa ON p.doc_a = sa.doc_id
    JOIN sizes sb ON p.doc_b = sb.doc_id
),
per_pair AS (
    SELECT LEAST(9, CAST((10 * t.common) // t.u AS INT)) AS bucket,
           CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
    FROM truth t
    LEFT JOIN mcand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
),
agg AS (
    SELECT bucket, COUNT(*) AS n_pairs,
           CAST(SUM(hit) AS BIGINT) AS n_detected
    FROM per_pair GROUP BY bucket
)
SELECT bucket, n_pairs, n_detected,
       CAST(n_detected AS DOUBLE) / n_pairs AS detection_rate,
       1.0 - q4 * q4 AS analytic_rate
FROM (
    SELECT *, q2 * q2 AS q4 FROM (
        SELECT *, q * q AS q2 FROM (
            SELECT *, 1.0 - m4 AS q FROM (
                SELECT *, m2 * m2 AS m4 FROM (
                    SELECT *, m * m AS m2 FROM (
                        SELECT *,
                               (CAST(bucket AS DOUBLE) + 0.5) / 10.0 AS m
                        FROM agg))))))
ORDER BY bucket
"""


# vocab_coverage: rank + running sum over the FULL vocabulary is fine in
# the single-node oracle; the Spark plan bounds the window to the
# distributed top-1000 — identical rows at k in (10, 100, 1000).
ORACLES["vocab_coverage"] = f"""
WITH toks AS (SELECT unnest({_TOKS}) AS token FROM documents),
counts AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens FROM counts),
ranked AS (
    SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS k,
           CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS covered_tokens
    FROM counts
)
SELECT k, covered_tokens, total_tokens,
       CAST(covered_tokens AS DOUBLE) / total_tokens AS coverage
FROM ranked, total
WHERE k IN (5, 10, 25)
ORDER BY k
"""


# dedup_rate_by_source: exact leg = sha256 text identity (same function
# family the ledger checksum oracle uses); near leg = the shared jacc
# pair graph (threshold 0.1) projected to member ids.
ORACLES["dedup_rate_by_source"] = f"""
WITH {_JACC_CTES},
hx AS (SELECT doc_id, source, sha256(text) AS h FROM documents),
hn AS (SELECT h, COUNT(*) AS n FROM hx GROUP BY h),
near_ids AS (
    SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM jacc
        UNION ALL
        SELECT doc_b AS doc_id FROM jacc
    )
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN hn.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_exact_dup,
       CAST(SUM(CASE WHEN ni.doc_id IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS n_near_dup,
       CAST(SUM(CASE WHEN hn.n > 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS exact_dup_rate,
       CAST(SUM(CASE WHEN ni.doc_id IS NOT NULL THEN 1 ELSE 0 END)
           AS DOUBLE) / COUNT(*) AS near_dup_rate
FROM hx
JOIN hn USING (h)
LEFT JOIN near_ids ni USING (doc_id)
GROUP BY source
ORDER BY source
"""


# bigram_novelty: DuckDB lists are 1-based — range(1, len(t)) yields the
# len-1 adjacent positions; same rational-integer shape as unigram_score.
ORACLES["bigram_novelty"] = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
big AS (
    SELECT doc_id, unnest(
        CASE WHEN len(t) >= 2
             THEN list_transform(range(1, len(t)),
                  i -> t[i] || ' ' || t[i + 1])
             ELSE [] END) AS bigram
    FROM toks
),
freq AS (SELECT bigram, COUNT(*) AS cf FROM big GROUP BY bigram),
tot AS (SELECT COUNT(*) AS n FROM big)
SELECT b.doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(f.cf) AS BIGINT) AS cf_sum,
       CAST(SUM(CASE WHEN f.cf = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel,
       CAST(SUM(CASE WHEN f.cf = 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS novel_rate,
       CAST(CAST(SUM(f.cf) AS BIGINT) AS DOUBLE)
           / CAST(COUNT(*) * (SELECT n FROM tot) AS DOUBLE) AS avg_bigram_p
FROM big b JOIN freq f USING (bigram)
GROUP BY b.doc_id
ORDER BY b.doc_id
"""


# key_skew_histogram: floor(log2 n) = length(bin(n)) - 1, exact in the
# integer domain in both engines (no libm).
ORACLES["key_skew_histogram"] = """
WITH per_key AS (
    SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
),
tot AS (SELECT COUNT(*) AS n FROM events)
SELECT CAST(length(bin(cnt)) - 1 AS INT) AS log2_bucket,
       COUNT(*) AS n_keys,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       MAX(cnt) AS max_key_rows,
       CAST(CAST(SUM(cnt) AS BIGINT) AS DOUBLE)
           / (SELECT CAST(n AS DOUBLE) FROM tot) AS pct_rows
FROM per_key
GROUP BY 1
ORDER BY 1
"""


# events_late_audit: the relational replay of the watermark drop rule —
# batch-1 (even users) rows always count; a batch-2 (odd users) row
# counts iff its hour window's end is after the batch-1 watermark.
ORACLES["events_late_audit"] = f"""
WITH wm AS (
    SELECT max(ts) - INTERVAL 1801 SECOND AS w
    FROM events WHERE user_id % 2 = 0
),
accepted AS (
    SELECT ts, event_type, value FROM events WHERE user_id % 2 = 0
    UNION ALL
    SELECT e.ts, e.event_type, e.value
    FROM events e, wm
    WHERE e.user_id % 2 = 1
      AND date_trunc('hour', e.ts) + INTERVAL 1 HOUR > wm.w
)
SELECT
    strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
    event_type,
    COUNT(*) AS n_events,
    {_dsum('value', 'sum_value')}
FROM accepted
GROUP BY date_trunc('hour', ts), event_type
ORDER BY hour_bucket, event_type
"""


# zorder_locality: the Morton interleave written out as 16 shift/and/or
# terms (bits=8, cols=(custkey, day)) — identical bit placement to
# sources/layout.py:zorder_key (bit b of column i -> position b*2+i).
_MORTON = " | ".join(
    f"((({c} >> {b}) & 1) << {b * 2 + i})"
    for i, c in enumerate(("ca", "cb"))
    for b in range(8)
)
ORACLES["zorder_locality"] = f"""
WITH base AS (
    SELECT o_custkey,
           CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT)
               AS day
    FROM orders
),
stats AS (
    SELECT min(o_custkey) AS mn_c, max(o_custkey) AS mx_c,
           min(day) AS mn_d, max(day) AS mx_d
    FROM base
),
scaled AS (
    SELECT o_custkey, day,
           LEAST(255, CAST(floor(
               CAST(o_custkey - mn_c AS DOUBLE) * 256.0
               / (CASE WHEN CAST(mx_c - mn_c AS DOUBLE) = 0.0
                       THEN 1.0 ELSE CAST(mx_c - mn_c AS DOUBLE) END)
           ) AS BIGINT)) AS ca,
           LEAST(255, CAST(floor(
               CAST(day - mn_d AS DOUBLE) * 256.0
               / (CASE WHEN CAST(mx_d - mn_d AS DOUBLE) = 0.0
                       THEN 1.0 ELSE CAST(mx_d - mn_d AS DOUBLE) END)
           ) AS BIGINT)) AS cb
    FROM base, stats
),
keyed AS (
    SELECT o_custkey, day, ({_MORTON}) AS zkey FROM scaled
)
SELECT zkey >> 8 AS zbucket,
       COUNT(*) AS n_rows,
       MIN(o_custkey) AS cust_min,
       MAX(o_custkey) AS cust_max,
       MIN(day) AS day_min,
       MAX(day) AS day_max
FROM keyed
GROUP BY zkey >> 8
ORDER BY zbucket
"""


# --- corpus_capstone (r06): the composed pipeline oracle ---------------------
# quality gate (_QF_CTES) -> near-dup components (recursive min-root over
# the jacc pair graph) -> keep-one quality-passing doc per cluster ->
# md5(cluster) split -> per-(split, source) 2048-token packing report.
ORACLES["corpus_capstone"] = f"""
WITH RECURSIVE {_JACC_CTES},
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM jacc
    UNION ALL
    SELECT doc_b AS a, doc_a AS b FROM jacc
),
reach AS (
    SELECT doc_id AS node, doc_id AS root FROM documents
    UNION
    SELECT e.b AS node, r.root FROM reach r JOIN edges e ON e.a = r.node
),
comp AS (
    SELECT node AS doc_id, MIN(root) AS cluster_id FROM reach GROUP BY node
),
{_QF_CTES},
qual AS (
    SELECT doc_id FROM qf_flags WHERE {_QF_PASS} = 1
),
keep AS (
    SELECT c.cluster_id, MIN(c.doc_id) AS doc_id
    FROM comp c JOIN qual q USING (doc_id)
    GROUP BY c.cluster_id
),
kd AS (
    SELECT k.doc_id, d.source, len({_TOKS}) AS n_tokens,
           CASE WHEN SUBSTRING(md5(CAST(k.cluster_id AS VARCHAR)), 1, 2)
                     < '1a' THEN 'test'
                WHEN SUBSTRING(md5(CAST(k.cluster_id AS VARCHAR)), 1, 2)
                     < '34' THEN 'val'
                ELSE 'train' END AS split
    FROM keep k JOIN documents d USING (doc_id)
),
c2 AS (
    SELECT split, source, n_tokens,
           COALESCE(SUM(n_tokens) OVER (
               PARTITION BY split, source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
    FROM kd
)
SELECT split, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(MAX(CAST(FLOOR(cum_before / 2048.0) AS BIGINT)) + 1 AS BIGINT)
           AS n_bins
FROM c2 GROUP BY split, source ORDER BY split, source
"""


# --- round-6 second wave: layout, incremental MV, correlation, join KMV ---

ORACLES["bucketed_join_revenue"] = f"""
SELECT o_orderkey, o_orderstatus, o_orderpriority,
       COUNT(*) AS n_lines,
       {_dsum(_DISC_PRICE, 'revenue')}
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderkey, o_orderstatus, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 20
"""

ORACLES["incremental_mv_revenue"] = f"""
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders,
       {_dsum('o_totalprice', 'total_revenue')}
FROM orders
GROUP BY strftime(o_orderdate, '%Y-%m')
ORDER BY month
"""

ORACLES["events_corr_hourly"] = """
WITH bounds AS (
    SELECT date_trunc('hour', MIN(ts)) AS d0,
           date_trunc('hour', MAX(ts)) AS d1
    FROM events
),
spine AS (
    SELECT unnest(generate_series(d0, d1, INTERVAL 1 HOUR)) AS hour
    FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
hourly AS (
    SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS _n
    FROM events GROUP BY date_trunc('hour', ts), event_type
),
filled AS (
    SELECT s.hour, t.event_type, CAST(COALESCE(_n, 0) AS BIGINT) AS n
    FROM spine s
    CROSS JOIN types t
    LEFT JOIN hourly h ON h.hour = s.hour AND h.event_type = t.event_type
),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           a.n AS x, b.n AS y
    FROM filled a JOIN filled b
      ON a.hour = b.hour AND a.event_type < b.event_type
),
m AS (
    SELECT type_a, type_b,
           COUNT(*) AS n_hours,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * y) AS BIGINT) AS sxy,
           CAST(SUM(x * x) AS BIGINT) AS sx2,
           CAST(SUM(y * y) AS BIGINT) AS sy2
    FROM pairs GROUP BY type_a, type_b
)
SELECT type_a, type_b, n_hours, sx, sy, sxy, sx2, sy2,
       CASE WHEN (n_hours * sx2 - sx * sx) > 0
             AND (n_hours * sy2 - sy * sy) > 0
            THEN CAST(n_hours * sxy - sx * sy AS DOUBLE)
                 / (SQRT(CAST(n_hours * sx2 - sx * sx AS DOUBLE))
                    * SQRT(CAST(n_hours * sy2 - sy * sy AS DOUBLE)))
       END AS corr
FROM m
ORDER BY type_a, type_b
"""

ORACLES["approx_join_size"] = f"""
WITH a AS (
    SELECT l_orderkey AS okey, COUNT(*) AS a_k
    FROM lineitem GROUP BY l_orderkey
),
b AS (
    SELECT o_orderkey AS okey, COUNT(*) AS b_k
    FROM orders GROUP BY o_orderkey
),
keys AS (
    SELECT COALESCE(a.okey, b.okey) AS okey,
           CAST(COALESCE(a_k, 0) AS BIGINT) AS a_k,
           CAST(COALESCE(b_k, 0) AS BIGINT) AS b_k
    FROM a FULL OUTER JOIN b ON a.okey = b.okey
),
hashed AS (
    SELECT okey, a_k, b_k,
           {{UFRAC}} AS u
    FROM keys
),
samp AS (SELECT * FROM hashed ORDER BY u, okey LIMIT 128),
est AS (
    SELECT COUNT(*) AS n_samp, MAX(u) AS u_k,
           CAST(SUM(a_k * b_k) AS BIGINT) AS s_samp
    FROM samp
),
totals AS (
    SELECT COUNT(*) AS n_keys_union,
           CAST(SUM(a_k * b_k) AS BIGINT) AS exact_join_rows
    FROM hashed
),
d AS (
    SELECT *,
           CASE WHEN n_samp = 128 THEN CAST(127 AS DOUBLE) / u_k
                ELSE CAST(n_keys_union AS DOUBLE) END AS d_hat
    FROM est CROSS JOIN totals
),
e AS (
    SELECT *,
           CASE WHEN n_samp = 128
                THEN (d_hat / CAST(128 AS DOUBLE)) * CAST(s_samp AS DOUBLE)
                ELSE CAST(exact_join_rows AS DOUBLE) END AS est_join
    FROM d
)
SELECT n_keys_union,
       d_hat AS kmv_distinct_keys,
       exact_join_rows,
       est_join AS est_join_rows,
       ABS(est_join - CAST(exact_join_rows AS DOUBLE))
           / CAST(exact_join_rows AS DOUBLE) AS rel_error
FROM e
"""
ORACLES["approx_join_size"] = ORACLES["approx_join_size"].replace(
    "{UFRAC}", _UFRAC("md5(CAST(okey AS VARCHAR))")
)

ORACLES["partition_pruned_revenue"] = f"""
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders,
       {_dsum('o_totalprice', 'total_revenue')}
FROM orders
WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
GROUP BY strftime(o_orderdate, '%Y-%m')
ORDER BY month
"""


# --- ivf_probe_curve: recall-vs-nprobe calibration (r06 wave 2) -----------
# Shares the exact-leg CTEs with ann_recall_curve and the IVF assignment
# CTEs with similarity_ivf; one candidate/top-10/hits block per nprobe.

def _ivf_curve_sql() -> str:
    blocks = []
    finals = []
    for np_ in (1, 2, 4):
        blocks.append(f"""
cand{np_} AS (
    SELECT DISTINCT q.vec_id AS qid, a.vec_id AS nid
    FROM qa q JOIN corpus_assign a USING (cell_id)
    WHERE q.rn <= {np_} AND a.vec_id != q.vec_id
),
scored{np_} AS (
    SELECT c.qid, c.nid,
           list_dot_product(pq.v, pn.v) / (pq.nrm * pn.nrm) AS cos_sim
    FROM cand{np_} c
    JOIN p pq ON pq.vec_id = c.qid
    JOIN p pn ON pn.vec_id = c.nid
),
ivf{np_} AS (
    SELECT qid, nid, rnk AS a_rnk FROM (
        SELECT qid, nid,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cos_sim DESC, nid ASC) AS rnk
        FROM scored{np_}
    ) WHERE rnk <= 10
),
hits{np_} AS (
    SELECT
        SUM(CASE WHEN e_rnk <= 1 AND a_rnk <= 1 THEN 1 ELSE 0 END) AS h1,
        SUM(CASE WHEN e_rnk <= 5 AND a_rnk <= 5 THEN 1 ELSE 0 END) AS h5,
        SUM(CASE WHEN e_rnk <= 10 AND a_rnk <= 10 THEN 1 ELSE 0 END) AS h10
    FROM exact e JOIN ivf{np_} i USING (qid, nid)
)""")
        for kk in (1, 5, 10):
            finals.append(
                f"SELECT {np_} AS nprobe, {kk} AS k,"
                f" CAST(h{kk} AS BIGINT) AS hits,"
                f" CAST(n_queries AS BIGINT) AS n_queries,"
                f" CAST(h{kk} AS DOUBLE) / CAST(n_queries * {kk} AS DOUBLE)"
                f" AS recall"
                f" FROM hits{np_} CROSS JOIN nq"
            )
    return (
        """
WITH p AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
epairs AS (
    SELECT q.vec_id AS qid, n.vec_id AS nid,
           list_dot_product(q.v, n.v) / (q.nrm * n.nrm) AS cos_sim
    FROM p q, p n
    WHERE q.vec_id < 50 AND q.vec_id != n.vec_id
),
exact AS (
    SELECT qid, nid, rnk AS e_rnk FROM (
        SELECT qid, nid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cos_sim DESC, nid ASC) AS rnk
        FROM epairs
    ) WHERE rnk <= 10
),
cent AS (
    SELECT vec_id AS cell_id, v AS cv, nrm AS cnrm FROM p WHERE vec_id < 16
),
corpus_assign AS (
    SELECT vec_id, cell_id FROM (
        SELECT p.vec_id, c.cell_id,
               row_number() OVER (
                   PARTITION BY p.vec_id
                   ORDER BY list_dot_product(p.v, c.cv) / (p.nrm * c.cnrm)
                            DESC, c.cell_id ASC) AS rn
        FROM p CROSS JOIN cent c
    ) WHERE rn = 1
),
qa AS (
    SELECT vec_id, cell_id, rn FROM (
        SELECT p.vec_id, c.cell_id,
               row_number() OVER (
                   PARTITION BY p.vec_id
                   ORDER BY list_dot_product(p.v, c.cv) / (p.nrm * c.cnrm)
                            DESC, c.cell_id ASC) AS rn
        FROM p CROSS JOIN cent c WHERE p.vec_id < 50
    ) WHERE rn <= 4
),
nq AS (SELECT COUNT(DISTINCT vec_id) AS n_queries FROM p WHERE vec_id < 50),"""
        + ",".join(blocks)
        + "\nSELECT * FROM (\n"
        + "\nUNION ALL\n".join(finals)
        + "\n) ORDER BY nprobe, k"
    )


ORACLES["ivf_probe_curve"] = _ivf_curve_sql()


ORACLES["tfidf_doc_pairs"] = f"""
WITH t AS (
    SELECT doc_id, {_TOKS} AS toks FROM documents
),
bg AS (
    SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS term
    FROM t, UNNEST(range(1, len(toks))) AS u(i)
),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM bg GROUP BY doc_id, term
),
dft AS (
    SELECT term, COUNT(*) AS df FROM tf GROUP BY term HAVING COUNT(*) <= 50
),
idf AS (
    SELECT term, df,
           (CAST(10 AS BIGINT) * (SELECT COUNT(*) FROM documents)) // df
               AS idf_int
    FROM dft
),
w AS (
    SELECT t2.doc_id, t2.term, i.df,
           CAST(t2.tf * i.idf_int AS DECIMAL(19,0)) AS wt
    FROM tf t2 JOIN idf i USING (term)
),
norms AS (SELECT doc_id, SUM(wt * wt) AS n2 FROM w GROUP BY doc_id),
num AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           SUM(a.wt * b.wt) AS num, COUNT(*) AS n_shared
    FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
    WHERE a.df >= 2
    GROUP BY a.doc_id, b.doc_id
),
c AS (
    SELECT doc_a, doc_b, n_shared,
           CAST(CAST(num AS VARCHAR) AS DOUBLE)
           / (SQRT(CAST(CAST(na.n2 AS VARCHAR) AS DOUBLE))
              * SQRT(CAST(CAST(nb.n2 AS VARCHAR) AS DOUBLE))) AS cos
    FROM num
    JOIN norms na ON na.doc_id = num.doc_a
    JOIN norms nb ON nb.doc_id = num.doc_b
)
SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared, cos
FROM c WHERE cos >= 0.5
ORDER BY doc_a, doc_b
"""


ORACLES["bpe_apply_merge"] = f"""
WITH toks AS (
    SELECT unnest({_TOKS}) AS tok FROM documents
),
t2 AS (SELECT tok FROM toks WHERE len(tok) >= 2),
first_pairs AS (
    SELECT substr(tok, i, 2) AS pair, COUNT(*) AS n
    FROM t2, LATERAL unnest(range(1, len(tok))) t(i)
    GROUP BY pair
),
m AS (
    SELECT pair,
           substr(pair, 1, 1) || ' ' || substr(pair, 2, 1) AS pat
    FROM first_pairs ORDER BY n DESC, pair LIMIT 1
),
merged AS (
    SELECT string_split(
               replace(trim(regexp_replace(tok, '(.)', '\\1 ', 'g')),
                       (SELECT pat FROM m), (SELECT pair FROM m)),
               ' ') AS syms
    FROM toks
),
sym_pairs AS (
    SELECT syms[i] || ' ' || syms[i + 1] AS pair
    FROM merged, LATERAL unnest(range(1, len(syms))) t(i)
    WHERE len(syms) >= 2
)
SELECT (SELECT pair FROM m) AS applied_merge, pair, COUNT(*) AS n
FROM sym_pairs GROUP BY pair
ORDER BY n DESC, pair
LIMIT 20
"""


ORACLES["graph_bfs_hops"] = f"""
WITH {_JACC_CTES},
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM jacc
    UNION ALL
    SELECT doc_b AS a, doc_a AS b FROM jacc
),
seeds AS (
    SELECT DISTINCT a AS node FROM edges ORDER BY node LIMIT 5
),
d0 AS (SELECT node FROM seeds),
d1 AS (SELECT DISTINCT e.b AS node FROM d0 JOIN edges e ON e.a = d0.node),
d2 AS (SELECT DISTINCT e.b AS node FROM d1 JOIN edges e ON e.a = d1.node),
d3 AS (SELECT DISTINCT e.b AS node FROM d2 JOIN edges e ON e.a = d2.node),
allhops AS (
    SELECT node, 0 AS dist FROM d0
    UNION ALL SELECT node, 1 FROM d1
    UNION ALL SELECT node, 2 FROM d2
    UNION ALL SELECT node, 3 FROM d3
)
SELECT node AS doc_id, CAST(MIN(dist) AS INTEGER) AS dist
FROM allhops GROUP BY node ORDER BY doc_id
"""


ORACLES["events_twa"] = f"""
WITH rows_w AS (
    SELECT user_id,
           strftime(ts, '%Y-%m-%d') AS day,
           value, event_id,
           epoch_us(ts) AS us,
           LEAD(epoch_us(ts)) OVER (
               PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
               ORDER BY ts, event_id) AS next_us
    FROM events
),
g AS (
    SELECT user_id, day,
           COUNT(*) AS n_events,
           SUM(CAST((next_us - us) // 1000000 AS BIGINT)) AS span_sec,
           SUM(CAST(value AS DECIMAL(28,10))
               * CAST((next_us - us) // 1000000 AS DECIMAL(6,0))) AS num
    FROM rows_w GROUP BY user_id, day
)
SELECT user_id, day, n_events,
       CAST(COALESCE(span_sec, 0) AS BIGINT) AS span_sec,
       CASE WHEN span_sec > 0
            THEN CAST(CAST(num AS VARCHAR) AS DOUBLE)
                 / CAST(span_sec AS DOUBLE)
       END AS twa
FROM g
ORDER BY user_id, day
"""


ORACLES["session_paths"] = """
WITH flagged AS (
    SELECT user_id, ts, event_id, event_type,
        CASE
            WHEN lag(ts) OVER w IS NULL THEN 1
            WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30 * 60 * 1000000
                THEN 1
            ELSE 0
        END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, ts, event_id, event_type,
        SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_seq
    FROM flagged
),
seqs AS (
    SELECT user_id, session_seq,
           list(event_type ORDER BY ts, event_id) AS seq
    FROM sessions GROUP BY user_id, session_seq
),
paths AS (
    SELECT array_to_string(seq[1:5], '>') AS path,
           CAST(len(seq) > 5 AS INTEGER) AS truncated
    FROM seqs
)
SELECT path, truncated, COUNT(*) AS n_sessions
FROM paths GROUP BY path, truncated
ORDER BY n_sessions DESC, path, truncated
LIMIT 20
"""


ORACLES["customer_rfm"] = f"""
WITH ref AS (SELECT CAST(MAX(o_orderdate) AS DATE) AS maxd FROM orders),
c AS (
    SELECT o_custkey,
           CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                          (SELECT maxd FROM ref)) AS INTEGER)
               AS recency_days,
           COUNT(*) AS n_orders,
           {_dsum('o_totalprice', 'monetary')}
    FROM orders GROUP BY o_custkey
),
s AS (
    SELECT *,
           NTILE(5) OVER (ORDER BY recency_days, o_custkey) AS r_tile,
           NTILE(5) OVER (ORDER BY n_orders, o_custkey) AS f_tile,
           NTILE(5) OVER (ORDER BY monetary, o_custkey) AS m_tile
    FROM c
)
SELECT o_custkey, recency_days, n_orders, monetary,
       CAST(6 - r_tile AS INTEGER) AS r_score,
       CAST(f_tile AS INTEGER) AS f_score,
       CAST(m_tile AS INTEGER) AS m_score,
       CAST((6 - r_tile) * 100 + f_tile * 10 + m_tile AS INTEGER)
           AS rfm_cell
FROM s ORDER BY o_custkey
"""


ORACLES["order_backlog_monthly"] = """
WITH placed AS (
    SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n_placed
    FROM orders GROUP BY strftime(o_orderdate, '%Y-%m')
),
closed AS (
    SELECT strftime(last_ship, '%Y-%m') AS month, COUNT(*) AS n_closed
    FROM (
        SELECT l_orderkey, MAX(l_shipdate) AS last_ship
        FROM lineitem GROUP BY l_orderkey
    ) GROUP BY strftime(last_ship, '%Y-%m')
),
bounds AS (
    SELECT date_trunc('month', (SELECT MIN(o_orderdate) FROM orders)) AS d0,
           date_trunc('month',
               greatest((SELECT MAX(o_orderdate) FROM orders),
                        (SELECT MAX(l_shipdate) FROM lineitem))) AS d1
),
spine AS (
    SELECT strftime(unnest(generate_series(d0, d1, INTERVAL 1 MONTH)),
                    '%Y-%m') AS month
    FROM bounds
),
filled AS (
    SELECT s.month,
           CAST(COALESCE(p.n_placed, 0) AS BIGINT) AS n_placed,
           CAST(COALESCE(c.n_closed, 0) AS BIGINT) AS n_closed
    FROM spine s
    LEFT JOIN placed p ON p.month = s.month
    LEFT JOIN closed c ON c.month = s.month
)
SELECT month, n_placed, n_closed,
       CAST(SUM(n_placed) OVER w AS BIGINT) AS cum_placed,
       CAST(SUM(n_closed) OVER w AS BIGINT) AS cum_closed,
       CAST(SUM(n_placed) OVER w - SUM(n_closed) OVER w AS BIGINT)
           AS backlog
FROM filled
WINDOW w AS (ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)
ORDER BY month
"""


ORACLES["events_streak_lengths"] = """
WITH days AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
numbered AS (
    SELECT user_id,
           date_diff('day', DATE '1970-01-01', d) AS dn,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY
               date_diff('day', DATE '1970-01-01', d)) AS rn
    FROM days
),
streaks AS (
    SELECT user_id, dn - rn AS island, COUNT(*) AS len
    FROM numbered GROUP BY user_id, dn - rn
),
per_user AS (
    SELECT user_id, CAST(MAX(len) AS INTEGER) AS max_streak
    FROM streaks GROUP BY user_id
)
SELECT max_streak, COUNT(*) AS n_users
FROM per_user GROUP BY max_streak ORDER BY max_streak
"""


ORACLES["layout_composed_revenue"] = f"""
SELECT o_orderkey, o_orderpriority,
       COUNT(*) AS n_lines,
       {_dsum(_DISC_PRICE, 'revenue')}
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE EXTRACT(year FROM l_shipdate) = 1997
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 20
"""


def _bpe_merge_table_sql(n_steps: int = 10) -> str:
    """Unrolled n-step BPE trainer (pagerank/kmeans unrolled-oracle
    precedent): each step recounts symbol pairs, picks the argmax with
    the (count desc, left, right) two-column tiebreak, and applies the
    merge with the same double-delimiter plain-replace encoding the
    Spark plan uses (|l||r| -> |lr| — exact greedy non-overlapping
    semantics in both engines)."""
    ctes = [
        f"""toks AS (
    SELECT unnest({_TOKS}) AS tok FROM documents
),
t2 AS (SELECT tok FROM toks WHERE len(tok) >= 2),
enc0 AS (
    SELECT '||' || regexp_replace(tok, '(.)', '\\1||', 'g') AS enc FROM t2
)"""
    ]
    for k in range(1, n_steps + 1):
        ctes.append(f"""syms{k} AS (
    SELECT list_filter(string_split(enc, '||'), x -> x != '') AS syms
    FROM enc{k - 1}
),
pairs{k} AS (
    SELECT syms[i] AS l, syms[i + 1] AS r
    FROM syms{k}, LATERAL unnest(range(1, len(syms))) t(i)
),
best{k} AS (
    SELECT {k} AS step, l, r, COUNT(*) AS n
    FROM pairs{k} GROUP BY l, r
    ORDER BY n DESC, l, r LIMIT 1
),
enc{k} AS (
    SELECT replace(e.enc, '|' || b.l || '||' || b.r || '|',
                   '|' || b.l || b.r || '|') AS enc
    FROM enc{k - 1} e, best{k} b
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM best{k}" for k in range(1, n_steps + 1)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT step, l AS left_sym, r AS right_sym, n AS pair_count"
        f"\nFROM ({union})\nORDER BY step"
    )


ORACLES["bpe_merge_table"] = _bpe_merge_table_sql()
