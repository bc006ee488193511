"""Per-task boundedness evidence for `lsh_near_dup_pairs_sharded`
(r10): measure the (bucket key, shard pair) GROUP sizes — the unit of
in-task all-pairs work — across fixture scales. The design claim is
that the job-sized bit formula (`adaptive_lsh_bits(ceil(2N/S))`) holds
E[group] roughly constant while N grows, so per-task scored pairs stay
bucket-bounded at ANY corpus size; this prints the measured mean / p99
/ max group member counts per scale so the claim is a number, not
prose.

Usage: python tools/sharded_group_probe.py [sf_dir ...]
Default: sf0.1 (x1), /tmp/dbmig_sf03 (x3), /tmp/dbmig_sf1 (x10), and
/tmp/dbmig_sf3 (x30) when present.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from database_migration_engine_spark.functions.portable_hash import (  # noqa: E402
    lsh_component,
)
from database_migration_engine_spark.io import read_table  # noqa: E402
from database_migration_engine_spark.operators import (  # noqa: E402
    similarity as SIM,
)
from database_migration_engine_spark.session import build_session  # noqa: E402

NUM_SHARDS = 4


def main() -> int:
    dirs = sys.argv[1:] or [
        d
        for d in (
            "/root/testdata/sf0.1",
            "/tmp/dbmig_sf03",
            "/tmp/dbmig_sf1",
            "/tmp/dbmig_sf3",
        )
        if os.path.isdir(d)
    ]
    spark = build_session(app_name="dbmig-sharded-group-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import numpy as np

    print("| fixture | N | job bits | groups | mean members | p99 | max |")
    print("|---|---|---|---|---|---|---|")
    for sf_dir in dirs:
        emb = read_table(spark, sf_dir, "embeddings")
        n = emb.count()
        bits = SIM.adaptive_lsh_bits(math.ceil(2 * n / NUM_SHARDS))
        hyperplanes = np.array(
            [
                [
                    [lsh_component(t, b, d) for d in range(64)]
                    for b in range(bits)
                ]
                for t in range(24)
            ],
            dtype=np.float64,
        )
        # the operator's exact replication shape, stopped at the group
        # size aggregation instead of the pair kernel
        index = SIM.lsh_signature_keys(
            emb, hyperplanes, num_probes=4, carry_vec=False
        ).withColumn("shard", SIM.shard_of("id", NUM_SHARDS))
        groups = (
            index.withColumn(
                "partner",
                F.explode(
                    F.array(*[F.lit(t) for t in range(NUM_SHARDS)])
                ),
            )
            .groupBy(
                "key",
                F.least("shard", "partner").alias("jmin"),
                F.greatest("shard", "partner").alias("jmax"),
            )
            .agg(F.count_distinct("id").alias("members"))
        )
        stats = groups.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.avg("members").alias("mean"),
            F.expr("percentile_approx(members, 0.99)").alias("p99"),
            F.max("members").alias("mx"),
        ).collect()[0]
        print(
            f"| {sf_dir} | {n} | {bits} | {stats['n_groups']} | "
            f"{stats['mean']:.1f} | {stats['p99']} | {stats['mx']} |"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
