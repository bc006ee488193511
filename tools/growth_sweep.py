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

import os

FIXTURES = [
    (1, "/root/testdata/sf0.1"),
    (3, "/tmp/dbmig_sf03"),
    (10, "/tmp/dbmig_sf1"),
]
# r07 (verdict item 4): one more octave for the legs whose exponent
# rose with scale — present only when the x30 fixture was generated
# (SCALE_FIXTURE_DIR=/tmp/dbmig_sf3 SCALE_FIXTURE_COPIES=30
#  python tools/gen_scale_fixture.py)
if os.path.isdir("/tmp/dbmig_sf3"):
    FIXTURES.append((30, "/tmp/dbmig_sf3"))
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
        ks = [
            (
                f"{sa}->{sb}",
                math.log(tb / ta) / math.log(sb / sa),
            )
            for (sa, ta, _), (sb, tb, _) in zip(pts, pts[1:])
        ]
        (s_lo, t_lo, _), (s_hi, t_hi, _) = pts[0], pts[-1]
        k_all = math.log(t_hi / t_lo) / math.log(s_hi / s_lo)
        rows = " ".join(f"x{s}:{t:.1f}s(out={n})" for s, t, n in pts)
        exps = ", ".join(f"{lbl}: {k:.2f}" for lbl, k in ks)
        print(f"{name}: {rows} | exponent {exps}, overall: {k_all:.2f}")


if __name__ == "__main__":
    main()
