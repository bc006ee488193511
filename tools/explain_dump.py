#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries to
plans/r10/<query>_<tag>.txt (optimization-round before/after evidence).

Usage: python tools/explain_dump.py <before|after> q1 q2 ...
Builds each query at sf0.1 (the bench SF) on the engine session and
captures the FORMATTED physical plan of the returned DataFrame. Queries
that run driver actions while building (rank machinery, BPE argmax, CC
rounds) execute those actions here too — the captured plan is the final
collect's plan, and the build-phase job structure is documented in
OPTIMIZATION_r10.md via tools/profile_queries.py instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from database_migration_engine_spark.plans import QUERIES  # noqa: E402
from database_migration_engine_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("PLANS_ROUND", "r11"))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = build_session(app_name="dbmig-explain")
    spark.sparkContext.setLogLevel("ERROR")
    for nm in names:
        df = QUERIES[nm](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{nm}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
