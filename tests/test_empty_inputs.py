"""Empty-input robustness for the two-pass-rank queries (r05 advice):
`with_global_ranks` on zero rows returns empty totals, and the callers
must short-circuit to an empty correctly-typed frame instead of handing
`values_df` an empty VALUES list (invalid SQL). Also pins the DOUBLE
literal round-trip in `values_df` (bare decimal literals parse as
DECIMAL in Spark SQL, silently changing type and value)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from database_migration_engine_spark.operators import ranks as RK
from database_migration_engine_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """A fixture dir whose tables have the real schemas but zero rows."""
    out = tmp_path_factory.mktemp("empty_sf")
    for name in ("orders", "events"):
        src = os.path.join(SF_DIR, f"{name}.parquet")
        tbl = pq.read_table(src).slice(0, 0)
        pq.write_table(tbl, str(out / f"{name}.parquet"))
    return str(out)


@pytest.mark.parametrize(
    "qname",
    [
        "order_price_quartiles",
        "priority_price_distribution",
        "price_percentiles_cont",
        "mad_outliers",
    ],
)
def test_rank_queries_empty_input(spark, empty_sf_dir, qname):
    df = QUERIES[qname](spark, empty_sf_dir)
    assert df.count() == 0
    # the short-circuit frame must keep the non-empty output columns
    nonempty = QUERIES[qname](spark, SF_DIR)
    assert df.columns == nonempty.columns


def test_values_df_float_is_double_exact(spark):
    # 0.1 as DECIMAL(1,1) != binary64 0.1; the CAST-from-repr rendering
    # must round-trip the exact double and type the column DOUBLE
    vals = [0.1, 1e-05, 2.0 / 3.0, 123456.789]
    df = RK.values_df(spark, [(i, v) for i, v in enumerate(vals)], ["i", "v"])
    assert dict(df.dtypes)["v"] == "double"
    got = {r.i: r.v for r in df.collect()}
    for i, v in enumerate(vals):
        assert got[i] == v  # bit-exact


def test_values_df_rejects_nonfinite(spark):
    with pytest.raises(TypeError):
        RK.values_df(spark, [(float("nan"),)], ["v"])
    with pytest.raises(ValueError):
        RK.values_df(spark, [], ["v"])
