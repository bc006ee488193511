#!/usr/bin/env python
"""Job-level breakdown of one query (optimization rounds, guide §1):
prints every Spark job the query launches — description, duration,
stage/task counts — plus the build/collect wall split, so the
recompute multiplier and per-action floors are visible job by job."""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from database_migration_engine_spark.plans import QUERIES  # noqa: E402
from database_migration_engine_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"


def _rest(url: str):
    with urllib.request.urlopen(url, timeout=10) as fh:
        return json.loads(fh.read().decode())


def main() -> None:
    names = sys.argv[1:]
    spark = build_session(app_name="dbmig-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    for nm in names:
        try:
            QUERIES[nm](spark, WARM_DIR).collect()
        except Exception:
            pass
    for warm_q in ("dedup_embedding", "dedup_clusters"):
        try:
            QUERIES[warm_q](spark, SF_DIR).collect()
        except Exception:
            pass
    for nm in names:
        jobs0 = {j["jobId"] for j in _rest(
            f"{base}/api/v1/applications/{app_id}/jobs")}
        t0 = time.perf_counter()
        df = QUERIES[nm](spark, SF_DIR)
        t1 = time.perf_counter()
        df.collect()
        t2 = time.perf_counter()
        time.sleep(0.3)
        jobs = [j for j in _rest(
            f"{base}/api/v1/applications/{app_id}/jobs")
            if j["jobId"] not in jobs0]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"=== {nm}: build={t1-t0:.3f}s collect={t2-t1:.3f}s "
              f"jobs={len(jobs)}")
        for j in jobs:
            sub = j.get("submissionTime", "")
            comp = j.get("completionTime", "")
            def ms(s):
                from datetime import datetime
                return datetime.strptime(
                    s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
                ).timestamp()
            dur = (ms(comp) - ms(sub)) if sub and comp else -1
            desc = (j.get("description") or j.get("name") or "")[:100]
            print(f"  job {j['jobId']:>4} {dur:7.3f}s stages="
                  f"{len(j.get('stageIds', [])):>3} tasks="
                  f"{j.get('numCompletedTasks', 0):>4}  {desc}")
    spark.stop()


if __name__ == "__main__":
    main()
