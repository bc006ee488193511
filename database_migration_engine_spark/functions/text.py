"""Text-analysis column builders for the `documents` table.

Shared constants (token split regex, stopword lists, quality weights) are
consumed by BOTH the Spark plans and the DuckDB oracle SQL so the two
implementations cannot drift.

Everything here is JVM-side column expressions (split/filter/transform/
aggregate) — no Python UDFs in the hot path; at 100 TB these run inside
whole-stage codegen on the executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokenization: lowercase, split on runs of non-letters, drop empties.
TOKEN_SPLIT_RE = "[^a-z]+"

# Tiny deterministic stopword lists for the n-gram language-ID heuristic.
# Order matters: ties resolve to the earliest language in LANG_PRIORITY.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "por", "para"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "pour", "dans"),
    "zh": ("de", "shi", "bu", "le", "wo", "ni", "ta", "zai", "you"),
}
LANG_PRIORITY: tuple[str, ...] = ("en", "de", "es", "fr", "zh")

# Quality-score weights: score = W_STOP*stop_ratio + W_PUNCT*punct_ratio
# + W_LEN*len_score. Components are ratios of integers (IEEE double
# division — bit-identical across engines); no rounding anywhere.
W_STOP, W_PUNCT, W_LEN = 0.3, 0.2, 0.5
LEN_NORM = 500  # len_score = min(n_chars, LEN_NORM) / LEN_NORM
PUNCT_CLASS = "[.!?,;:]"


def tokens(text_col: str = "text") -> Column:
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
        lambda x: x != F.lit(""),
    )


def token_count(text_col: str = "text") -> Column:
    return F.size(tokens(text_col))


# BPE-ish pre-tokenizer pattern (GPT-2 style, lookahead-free so both Java
# regex and RE2 accept it): contractions, space-prefixed letter runs,
# digit runs, punctuation runs, whitespace runs.
BPE_ISH_RE = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
)


def bpe_ish_count(text_col: str = "text") -> Column:
    """Token count under the BPE-ish pre-tokenization regex — the
    LLM-pipeline proxy for 'how many tokens will the tokenizer emit'."""
    return F.regexp_count(F.col(text_col), F.lit(BPE_ISH_RE))


def shingles(tokens_col: str, n: int = 3) -> Column:
    """Distinct n-token shingles as space-joined strings; empty array for
    docs shorter than n tokens."""
    return F.expr(
        f"CASE WHEN size({tokens_col}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size({tokens_col}) - {n - 1}),"
        f" i -> concat_ws(' ', slice({tokens_col}, i, {n})))) "
        f"ELSE CAST(array() AS array<string>) END"
    )


def stopword_hits(tokens_col: str, lang: str) -> Column:
    """Non-distinct count of tokens that are stopwords of `lang`."""
    stops = ",".join(f"'{w}'" for w in STOPWORDS[lang])
    return F.expr(
        f"size(filter({tokens_col}, t -> t IN ({stops})))"
    )


def predicted_lang(tokens_col: str) -> Column:
    """Stopword-voting language ID with deterministic priority tie-break;
    'unknown' when no stopword of any language appears."""
    hits = {lang: stopword_hits(tokens_col, lang) for lang in LANG_PRIORITY}
    best = F.greatest(*hits.values())
    expr = F.lit("unknown")
    # fold right-to-left so earlier languages win ties
    for lang in reversed(LANG_PRIORITY):
        expr = F.when((best > 0) & (hits[lang] == best), F.lit(lang)).otherwise(
            expr
        )
    return expr


def punct_count(text_col: str = "text") -> Column:
    return F.length(
        F.regexp_replace(F.col(text_col), f"[^{PUNCT_CLASS[1:-1]}]", "")
    )


def quality_components(text_col: str = "text") -> dict[str, Column]:
    """Per-document quality features; `score` composes them with the
    module weights. All doubles derive from integer ratios — deterministic
    across engines without rounding."""
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stops = ",".join(f"'{w}'" for w in STOPWORDS["en"])
    stop_hits = F.expr(
        f"size(filter(filter(split(lower({text_col}), '{TOKEN_SPLIT_RE}'),"
        f" t -> t != ''), t -> t IN ({stops})))"
    )
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0, punct_count(text_col) / n_chars
    ).otherwise(F.lit(0.0))
    len_score = F.least(n_chars, F.lit(LEN_NORM)) / F.lit(LEN_NORM).cast(
        "double"
    )
    score = (
        stop_ratio * F.lit(W_STOP)
        + punct_ratio * F.lit(W_PUNCT)
        + len_score * F.lit(W_LEN)
    )
    return {
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "stop_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "len_score": len_score,
        "score": score,
    }


def fingerprint(text_col: str = "text") -> Column:
    """Whitespace-normalized content fingerprint: md5 over the token
    stream. Same digest as the oracle's md5(array_to_string(tokens, ' '))."""
    return F.md5(F.concat_ws(" ", tokens(text_col)))


# --- SQL twins (DuckDB) ----------------------------------------------------


def sql_tokens(text_col: str = "text") -> str:
    return (
        f"list_filter(string_split_regex(lower({text_col}),"
        f" '{TOKEN_SPLIT_RE}'), x -> x != '')"
    )


def sql_stopword_hits(tokens_sql: str, lang: str) -> str:
    stops = ",".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({tokens_sql}, t -> t IN ({stops})))"
