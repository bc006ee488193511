"""Every registered query matches its DuckDB oracle exactly at sf0.001.

This mirrors the driver's CORRECTNESS gate (row-count + column names +
exact values, order-insensitive) so regressions surface locally first.
"""

from __future__ import annotations

import pytest

from database_migration_engine_spark.plans import ORACLES, QUERIES

from .conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    assert name in QUERIES, f"oracle {name} has no Spark implementation"
    df = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name])


def test_every_query_runs(spark):
    """Queries without oracles still execute and return a stable schema."""
    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR)
        assert df.columns, f"{name} returned no columns"
        assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
