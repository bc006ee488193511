"""Storage-layout operators: compaction and Z-order data-skipping.

These are verified against REAL parquet footer statistics, not plan
text: compaction must preserve content exactly while hitting the target
file count, and the Z-order layout must let a range filter on EITHER
interleaved column skip most row groups — strictly better than the
unsorted layout on both columns, and better than a single-column sort on
the column that sort neglects.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from database_migration_engine_spark.sources import layout as LY

from .conftest import SF_DIR


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="dbmig_layout_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _fingerprint(spark, path):
    df = spark.read.parquet(path)
    return (
        df.count(),
        df.agg(
            F.sum(F.crc32(F.to_json(F.struct(*sorted(df.columns))))).alias("h")
        ).collect()[0].h,
    )


class TestCompaction:
    def test_compacts_small_files_and_preserves_content(self, spark, tmpdir):
        src = os.path.join(tmpdir, "events")
        spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).repartition(
            64
        ).write.parquet(src)
        before = _fingerprint(spark, src)
        n_files_before = len(LY.dataset_files(src))
        assert n_files_before >= 64

        total = sum(os.path.getsize(f) for f in LY.dataset_files(src))
        result = LY.compact_parquet(spark, src, target_file_bytes=total // 2 + 1)
        assert result["files_before"] == n_files_before
        assert result["files_after"] <= 2
        assert _fingerprint(spark, src) == before
        # no tmp/old residue next to the dataset
        residue = [
            p for p in os.listdir(tmpdir)
            if p.startswith("events.compact")
        ]
        assert residue == []

    def test_partitioned_compaction_keeps_directory_keys(self, spark, tmpdir):
        src = os.path.join(tmpdir, "docs")
        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        docs.repartition(16).write.partitionBy("lang").parquet(src)
        before = _fingerprint(spark, src)
        LY.compact_parquet(
            spark, src, target_file_bytes=1 << 30, partition_cols=["lang"]
        )
        langs = {d for d in os.listdir(src) if d.startswith("lang=")}
        assert langs, "partition directories lost"
        assert _fingerprint(spark, src) == before
        # one target file per partition at this target size
        per_dir = {
            d: len(LY.dataset_files(os.path.join(src, d))) for d in langs
        }
        assert all(n == 1 for n in per_dir.values()), per_dir


class TestZOrder:
    @pytest.fixture()
    def layouts(self, spark, tmpdir):
        li = (
            spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
            .select("l_orderkey", "l_partkey", "l_quantity")
        )
        unsorted = os.path.join(tmpdir, "unsorted")
        bysort = os.path.join(tmpdir, "bysort")
        byz = os.path.join(tmpdir, "byz")
        li.repartition(8).write.parquet(unsorted)
        (
            li.repartitionByRange(8, "l_orderkey")
            .sortWithinPartitions("l_orderkey")
            .write.parquet(bysort)
        )
        LY.zorder_write(li, byz, ["l_orderkey", "l_partkey"], num_files=8)
        return li, unsorted, bysort, byz

    def test_zorder_prunes_on_both_columns(self, spark, layouts):
        li, unsorted, bysort, byz = layouts
        stats = li.agg(
            F.min("l_orderkey"), F.max("l_orderkey"),
            F.min("l_partkey"), F.max("l_partkey"),
        ).collect()[0]
        ok_lo, ok_hi = stats[0], stats[1]
        pk_lo, pk_hi = stats[2], stats[3]
        # ~3% range filter on each column
        ok_f = (ok_lo, ok_lo + max(1, (ok_hi - ok_lo) // 32))
        pk_f = (pk_lo, pk_lo + max(1, (pk_hi - pk_lo) // 32))

        # unsorted layout: every row group overlaps both filters
        assert LY.pruned_fraction(unsorted, "l_orderkey", *ok_f) == 0.0
        assert LY.pruned_fraction(unsorted, "l_partkey", *pk_f) == 0.0

        # single-column sort: prunes its own column, not the other
        assert LY.pruned_fraction(bysort, "l_orderkey", *ok_f) >= 0.5
        assert LY.pruned_fraction(bysort, "l_partkey", *pk_f) == 0.0

        # z-order: prunes BOTH
        z_ok = LY.pruned_fraction(byz, "l_orderkey", *ok_f)
        z_pk = LY.pruned_fraction(byz, "l_partkey", *pk_f)
        assert z_ok >= 0.25, z_ok
        assert z_pk >= 0.25, z_pk

    def test_zorder_preserves_content(self, spark, layouts):
        li, _unsorted, _bysort, byz = layouts
        got = spark.read.parquet(byz)
        assert got.count() == li.count()
        assert sorted(got.columns) == sorted(li.columns)
        a = li.agg(F.sum("l_quantity"), F.sum("l_partkey")).collect()[0]
        b = got.agg(F.sum("l_quantity"), F.sum("l_partkey")).collect()[0]
        assert a == b
