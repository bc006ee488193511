"""Engine-portable 64-bit hashing derived from md5 hex digests.

Spark's ``hash``/``xxhash64`` (Murmur3/xxHash) have no DuckDB equivalent,
which forced the LSH fingerprint queries into rows-only correctness checks
in round 1. ``md5`` IS available in both engines with identical output, so
deriving the 64-bit values from the first 16 hex chars of an md5 digest
makes every signature reproducible by the oracle (VERDICT.md r01 item 3).

Everything here emits SQL *strings* that parse identically in Spark SQL
and DuckDB — the query side wraps them in ``F.expr`` while the oracle
interpolates them into its SQL. The dialect-neutral subset used:
``md5``, ``substr``, ``instr``, ``CASE``, ``floor``, integer ``* + - %``.
All integer math is kept inside signed-64 range explicitly (both engines
run with overflow checks: Spark ANSI mode, DuckDB always), verified
three-way (Spark = DuckDB = hashlib) in tests/test_dedup_similarity.py.

Cost note: parsing 16 nibbles is ~50 scalar ops per hash — roughly 2-3×
an xxhash64 call. The fast engine-local variants remain the default for
every operator; callers opt into ``hash_fn="md5"`` where oracle
reproducibility is worth the portability tax.
"""

from __future__ import annotations

_HEX = "0123456789abcdef"


def _nibble(hex_col: str, i: int) -> str:
    """Value 0-15 of 1-indexed char ``i`` of a lowercase hex string."""
    return f"CAST(instr('{_HEX}', substr({hex_col}, {i}, 1)) - 1 AS BIGINT)"


def signed64_from_hex_sql(hex_col: str) -> str:
    """Signed 64-bit integer from the first 16 chars of a hex-string
    column (two's complement, big-endian — matches
    ``int(hexdigest[:16], 16)`` reinterpreted as int64).

    Assembled from two 32-bit halves so no intermediate product exceeds
    the signed-64 range: the high half is recentred to [-2^31, 2^31)
    before the 2^32 scale-up, making the extremes land exactly on
    INT64_MIN/MAX without tripping either engine's overflow checks."""
    hi = " + ".join(f"{_nibble(hex_col, i)} * {16 ** (8 - i)}" for i in range(1, 9))
    lo = " + ".join(
        f"{_nibble(hex_col, i)} * {16 ** (16 - i)}" for i in range(9, 17)
    )
    return (
        f"((CASE WHEN ({hi}) >= 2147483648 THEN ({hi}) - 4294967296 "
        f"ELSE ({hi}) END) * 4294967296 + ({lo}))"
    )


def hex_bit_sql(hex_col: str, bit: int) -> str:
    """Bit ``bit`` (0 = LSB) of the 64-bit value encoded by the first 16
    chars of ``hex_col`` — touches only the owning nibble, so a single
    substr/instr per bit probe."""
    assert 0 <= bit < 64
    char_idx = 16 - bit // 4
    shift = bit % 4
    nib = _nibble(hex_col, char_idx)
    if shift == 0:
        return f"({nib} % 2)"
    return f"(CAST(floor({nib} / {2 ** shift}) AS BIGINT) % 2)"


def uniform_frac_sql(hex_col: str) -> str:
    """Uniform double in [0, 1) from the first 8 hex chars of ``hex_col``
    (value / 2^32). The 32-bit magnitude keeps the nibble sum positive and
    far inside exact-double range, so both engines compute the identical
    quotient — the portable replacement for ``rand()`` in rate-threshold
    sampling (keep row iff frac < rate)."""
    val = " + ".join(f"{_nibble(hex_col, i)} * {16 ** (8 - i)}" for i in range(1, 9))
    # divide by an explicit DOUBLE: a bare `4294967296.0` literal parses
    # as DECIMAL in Spark SQL, which would round the quotient to the
    # literal's scale instead of computing the exact double quotient
    return f"(({val}) / CAST(4294967296 AS DOUBLE))"


def md5_uniform(key: str) -> float:
    """Deterministic uniform value in [-1, 1) derived from md5(key) —
    computed in pure Python and baked into SQL as a plain decimal
    literal, which both Spark and DuckDB parse to the identical double
    (correctly-rounded shortest repr). Used for stored-model-free LSH
    hyperplanes that the oracle can reproduce."""
    import hashlib

    v = int(hashlib.md5(key.encode("utf-8")).hexdigest()[:16], 16)
    return (v % 1_000_000) / 500_000.0 - 1.0


def lsh_component(table: int, bit: int, dim: int) -> float:
    """Canonical hyperplane component for the oracle-reproducible LSH
    path — shared by the Spark query and the DuckDB oracle so both bake
    the same literal."""
    return md5_uniform(f"{table}:{bit}:{dim}")
