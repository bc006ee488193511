"""Growth-exponent measurement for the heaviest dedup/similarity sweeps
(r05 verdict item 6): time each query at x1 (sf0.1), x3 and x10
fixtures on the SAME session/config and fit t ~ n^k per adjacent pair
and over the full span. Sub-quadratic claims become measured exponents.

The corpus_join size gate is pinned OFF (smallBytes=0) so every scale
runs the identical merge-pinned plan — otherwise the x1/x3 points would
run broadcast plans and the fit would mix plan shapes.

Usage: python tools/growth_sweep.py [query ...]   (default: the r05 four)
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

from database_migration_engine_spark.plans import QUERIES  # noqa: E402
from database_migration_engine_spark.session import build_session  # noqa: E402

FIXTURES = [
    (1, "/root/testdata/sf0.1"),
    (3, "/tmp/dbmig_sf03"),
    (10, "/tmp/dbmig_sf1"),
]
DEFAULT = [
    "dedup_incremental",
    "dedup_near_minhash",
    "semdedup_embeddings",
    "dedup_consensus",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = build_session(app_name="dbmig-growth-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.dbme.corpusJoin.smallBytes", "0")
    for name in names:
        QUERIES[name](spark, "/root/testdata/sf0.001").collect()  # warm
        pts = []
        for scale, sf in FIXTURES:
            t0 = time.perf_counter()
            n_out = len(QUERIES[name](spark, sf).collect())
            dt = time.perf_counter() - t0
            pts.append((scale, dt, n_out))
            print(f"{name} x{scale}: {dt:.1f}s out_rows={n_out}",
                  file=sys.stderr)
        (s1, t1, _), (s3, t3, _), (s10, t10, _) = pts
        k13 = math.log(t3 / t1) / math.log(s3 / s1)
        k310 = math.log(t10 / t3) / math.log(s10 / s3)
        k110 = math.log(t10 / t1) / math.log(s10 / s1)
        rows = " ".join(f"x{s}:{t:.1f}s(out={n})" for s, t, n in pts)
        print(
            f"{name}: {rows} | exponent 1->3: {k13:.2f}, 3->10: {k310:.2f},"
            f" overall: {k110:.2f}"
        )


if __name__ == "__main__":
    main()
