"""PII detection/redaction + repetition metrics (r03 wave 2). The
registry queries are oracle-checked; these tests pin the operator
behavior on crafted documents — match counts per class, redaction
placeholders, non-PII text untouched, and repetition fractions on
documents with known structure."""

from __future__ import annotations

import pytest

from database_migration_engine_spark.functions.text import (
    PII_PATTERNS,
    pii_counts,
    redact_pii,
)


def _scan(spark, text: str):
    esc = text.replace("'", "''")
    df = spark.sql(f"SELECT '{esc}' AS text")
    counts = pii_counts("text")
    row = df.select(
        redact_pii("text").alias("redacted"),
        *[c.alias(k) for k, c in counts.items()],
    ).collect()[0]
    return row


def test_email_detection_and_redaction(spark):
    r = _scan(spark, "mail alice.smith+tag@sub.example.co.uk and b@x.io now")
    assert r.email == 2
    assert "[EMAIL]" in r.redacted
    assert "@" not in r.redacted


def test_ipv4_detection(spark):
    r = _scan(spark, "hosts 10.0.0.1 192.168.255.254 and version 1.2 only")
    assert r.ipv4 == 2
    assert r.redacted.count("[IPV4]") == 2
    assert "version 1.2" in r.redacted  # two-octet version strings survive


def test_ssn_detection(spark):
    # the SSN also matches the broad phone heuristic — redaction order
    # (SSN before phone) decides, so the typed placeholder wins
    r = _scan(spark, "ssn 123-45-6789 but order 12-34 is not one")
    assert r.ssn == 1
    assert "[SSN]" in r.redacted
    assert "12-34 " in r.redacted  # short digit runs survive


def test_phone_detection(spark):
    r = _scan(spark, "call +1 (415) 555-0199 or 020 7946 0958 thanks")
    assert r.phone == 2
    assert r.redacted.count("[PHONE]") == 2


def test_clean_text_untouched(spark):
    text = "a perfectly ordinary sentence with no sensitive data"
    r = _scan(spark, text)
    assert (r.email, r.ipv4, r.ssn, r.phone) == (0, 0, 0, 0)
    assert r.redacted == text


def test_redaction_order_no_partial_leftovers(spark):
    # an email whose local part is all digits must redact as EMAIL, not
    # leave a digit run for the phone pass
    r = _scan(spark, "reach 4155550199@txt.example.com today")
    assert r.redacted == "reach [EMAIL] today"


def test_patterns_have_no_lookaround_or_backrefs():
    """The RE2-compatibility contract the oracle relies on."""
    for name, pat in PII_PATTERNS.items():
        assert "(?=" not in pat and "(?!" not in pat and "(?<" not in pat, name
        assert "\\1" not in pat, name


@pytest.mark.parametrize(
    "text,n_words,distinct_frac,top_frac,dup_bigram",
    [
        # "a a a a" → 4 words, 1 distinct, top 4/4, bigrams all "a a"
        ("a a a a", 4, 0.25, 1.0, 1 - 1 / 3),
        # all-distinct words → no repetition anywhere
        ("one two three four five", 5, 1.0, 0.2, 0.0),
    ],
)
def test_repetition_fractions_by_construction(
    spark, tmp_path, text, n_words, distinct_frac, top_frac, dup_bigram
):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from database_migration_engine_spark.plans import QUERIES

    d = tmp_path / "sfrep"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": [text],
                "lang": ["en"],
                "source": ["s"],
                "n_chars": pa.array([len(text)], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    row = QUERIES["repetition_stats"](spark, str(d)).collect()[0]
    assert row.n_words == n_words
    assert row.distinct_word_frac == pytest.approx(distinct_frac)
    assert row.top_word_frac == pytest.approx(top_frac)
    assert row.dup_bigram_frac == pytest.approx(dup_bigram)
