#!/usr/bin/env python
"""Per-query profiling for the optimization rounds (guide §1: measure
first). For each named query (or the full registry), against
$SPARK_GRAFT_SF_DIR (default sf0.1), measures on a warm session:

* ``build_s``   — Python-side DataFrame construction time. This INCLUDES
  any driver actions the query runs while building (rank-machinery
  approxQuantile/counts, centroid collects, BPE argmax steps), so a
  large build_s means the query's cost is in its *pre-actions*, not the
  final collect.
* ``collect_s`` — time of the final ``df.collect()``.
* ``jobs / stages / tasks`` — Spark jobs launched by the whole query
  (build + collect), via the UI REST API; the dominant per-query fixed
  cost at fixture scale is job/stage count, not bytes.

Output: one TSV line per query to stdout, sorted by total desc.
"""

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


def job_stats(base: str, app_id: str, since_job: int) -> tuple[int, int, int]:
    jobs = _rest(f"{base}/api/v1/applications/{app_id}/jobs?status=succeeded")
    jobs = [j for j in jobs if j["jobId"] > since_job]
    njobs = len(jobs)
    nstages = sum(len(j.get("stageIds", [])) for j in jobs)
    ntasks = sum(j.get("numCompletedTasks", 0) for j in jobs)
    return njobs, nstages, ntasks


def max_job_id(base: str, app_id: str) -> int:
    jobs = _rest(f"{base}/api/v1/applications/{app_id}/jobs")
    return max((j["jobId"] for j in jobs), default=-1)


def main() -> None:
    names = sys.argv[1:] or list(QUERIES)
    spark = build_session(app_name="dbmig-profile")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    # Warmup: codegen + Arrow init, plus the session-shared caches for
    # the PROFILED sf (mirrors bench.py so numbers are marginal costs).
    for nm in names:
        try:
            QUERIES[nm](spark, WARM_DIR).collect()
        except Exception:
            pass
    for warm_q in ("dedup_embedding", "dedup_clusters"):
        if warm_q in QUERIES:
            try:
                QUERIES[warm_q](spark, SF_DIR).collect()
            except Exception:
                pass

    rows = []
    for nm in names:
        fn = QUERIES[nm]
        j0 = max_job_id(base, app_id)
        spark.sparkContext.setJobDescription(f"profile:{nm}")
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t1 = time.perf_counter()
        df.collect()
        t2 = time.perf_counter()
        spark.sparkContext.setJobDescription(None)
        time.sleep(0.2)  # let the UI catch up
        njobs, nstages, ntasks = job_stats(base, app_id, j0)
        rows.append((nm, t2 - t0, t1 - t0, t2 - t1, njobs, nstages, ntasks))

    rows.sort(key=lambda r: -r[1])
    print("query\ttotal_s\tbuild_s\tcollect_s\tjobs\tstages\ttasks")
    for nm, tot, b, c, nj, ns, nt in rows:
        print(f"{nm}\t{tot:.3f}\t{b:.3f}\t{c:.3f}\t{nj}\t{ns}\t{nt}")
    spark.stop()


if __name__ == "__main__":
    main()
