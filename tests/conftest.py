"""Shared Spark session + oracle-comparison helpers for the test suite."""

from __future__ import annotations

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from database_migration_engine_spark.io import TABLES  # noqa: E402
from database_migration_engine_spark.session import build_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="dbmig-spark-tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive canonical form: sort columns by name, then rows."""
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_matches_oracle(spark_df, duck_con, sql: str) -> None:
    """Mirror of the driver's check: row count, column names, values.

    Values compare as strings (like a value-hash would): 19525 vs 19525.0
    must FAIL even though numerically equal — dtype drift between engines
    (e.g. DuckDB HUGEINT → float64) changes the driver's hash.
    """
    got = normalize(spark_df.toPandas())
    want = normalize(duck_con.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(
        got.astype(str), want.astype(str), check_exact=True
    )
