"""Edge cases for the Gopher-style quality filter
(functions/text.quality_flag_components, r03): each rule triggered in
isolation on crafted documents, plus the degenerate empty/whitespace
inputs. The registered `quality_flags` query is oracle-checked
separately (tests/test_queries_oracle.py + driver CORRECTNESS)."""

from __future__ import annotations

import pytest

from database_migration_engine_spark.functions.text import (
    QF_MIN_WORDS,
    quality_flag_components,
)

# A base document that passes every rule: enough common-English words
# (stopword hits, alpha words, sane word lengths), no bullets/ellipses.
_GOOD = " ".join(
    ["the quick brown fox jumps over a lazy dog and it is fine that"] * 5
)
assert len(_GOOD.split()) >= QF_MIN_WORDS


def _flags(spark, text: str) -> dict:
    esc = text.replace("\\", "\\\\").replace("'", "''").replace("\n", "\\n")
    df = spark.sql(f"SELECT '{esc}' AS text")
    comps = quality_flag_components("text")
    row = df.select(
        *[c.alias(k) for k, c in comps.items()]
    ).collect()[0]
    return row.asDict()


def test_good_document_passes_all(spark):
    f = _flags(spark, _GOOD)
    assert f["passes"] == 1
    assert all(
        f[k] == 1 for k in f if k.startswith("f_")
    ), {k: v for k, v in f.items() if k.startswith("f_")}


def test_empty_and_whitespace_documents(spark):
    for text in ["", "   ", "\n\n\n"]:
        f = _flags(spark, text)
        assert f["n_words"] == 0
        assert f["mean_word_len"] == 0.0
        assert f["f_word_count"] == 0  # below the minimum
        assert f["f_mean_word_len"] == 0  # 0 < lower bound
        assert f["f_stopwords"] == 0
        assert f["passes"] == 0


def test_short_document_fails_only_word_count_rules(spark):
    f = _flags(spark, "the cat sat on the mat and it is fine")
    assert f["f_word_count"] == 0
    # everything content-shaped still passes
    assert f["f_symbol_ratio"] == 1
    assert f["f_bullet_lines"] == 1
    assert f["f_alpha_words"] == 1
    assert f["f_stopwords"] == 1
    assert f["passes"] == 0


def test_bullet_heavy_document_fails_bullet_rule(spark):
    text = "\n".join(f"- {_GOOD}" for _ in range(5))
    f = _flags(spark, text)
    assert f["bullet_line_frac"] == 1.0
    assert f["f_bullet_lines"] == 0
    # and the list markers * and • count too
    for marker in ("*", "•", "  - indented"):
        t2 = "\n".join(f"{marker} item" for _ in range(4))
        assert _flags(spark, t2)["f_bullet_lines"] == 0


def test_ellipsis_heavy_document_fails_ellipsis_rule(spark):
    # 2 of 4 lines end with an ellipsis (ascii and unicode) → 0.5 > 0.3
    text = "\n".join([f"{_GOOD} ...", _GOOD, f"{_GOOD} …", _GOOD])
    f = _flags(spark, text)
    assert f["ellipsis_line_frac"] == 0.5
    assert f["f_ellipsis_lines"] == 0


def test_symbol_heavy_document_fails_symbol_rule(spark):
    text = _GOOD + " " + "#tag " * 10
    f = _flags(spark, text)
    assert f["symbol_ratio"] > 0.1
    assert f["f_symbol_ratio"] == 0


def test_numeric_document_fails_alpha_rule(spark):
    text = " ".join(str(i) for i in range(100))
    f = _flags(spark, text)
    assert f["alpha_word_frac"] == 0.0
    assert f["f_alpha_words"] == 0


def test_long_words_fail_mean_word_length(spark):
    text = " ".join(["pneumonoultramicroscopic"] * 60)
    f = _flags(spark, text)
    assert f["mean_word_len"] > 10
    assert f["f_mean_word_len"] == 0


def test_no_stopwords_fails_stopword_rule(spark):
    text = " ".join(["lorem ipsum dolor sit amet consectetur"] * 10)
    f = _flags(spark, text)
    assert f["stop_hits"] < 2
    assert f["f_stopwords"] == 0


@pytest.mark.parametrize(
    "key",
    [
        "n_words", "mean_word_len", "symbol_ratio", "bullet_line_frac",
        "ellipsis_line_frac", "alpha_word_frac", "stop_hits",
        "f_word_count", "f_mean_word_len", "f_symbol_ratio",
        "f_bullet_lines", "f_ellipsis_lines", "f_alpha_words",
        "f_stopwords", "passes",
    ],
)
def test_components_exposes_all_columns(spark, key):
    assert key in _flags(spark, _GOOD)
