"""pgJDBC against live PostgreSQL — SURVEY §2.A S4's last edge.

The partitioned JDBC reader/writer and JdbcRunner are proven against
embedded Derby (tests/test_jdbc_live.py) and the full migration
lifecycle against a live PG 15 via psql (tests/test_pg_live.py); this
module closes the remaining combination — Spark's JDBC machinery
against PostgreSQL itself — whenever a PostgreSQL JDBC driver jar can
be found. The sandbox has no such jar and no network (Maven Central
does not resolve), so here the suite documents that exact blocker as a
skip; drop a jar at any probed location (or set SPARK_PG_JDBC_JAR) and
the full lifecycle runs with zero code changes.

The lifecycle itself lives in tools/pgjdbc_lifecycle.py and runs in a
subprocess because the driver jar must be on the JVM classpath at
session build time — it cannot be injected into the already-running
test session's DriverManager.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest

_PROBE_PATHS = [
    os.environ.get("SPARK_PG_JDBC_JAR", ""),
    "/opt/jars/postgresql*.jar",
    "/usr/share/java/postgresql*.jar",
    "/root/jars/postgresql*.jar",
]


def _find_jar() -> str | None:
    import pyspark

    paths = list(_PROBE_PATHS)
    paths.append(
        os.path.join(os.path.dirname(pyspark.__file__), "jars", "postgresql*.jar")
    )
    for pat in paths:
        if not pat:
            continue
        hits = sorted(glob.glob(pat))
        if hits:
            return hits[0]
    return None


_BLOCKER = (
    "PostgreSQL JDBC driver jar unobtainable in-sandbox: not on Spark's "
    "classpath, none at the probed locations, SPARK_PG_JDBC_JAR unset, "
    "and no network egress (repo1.maven.org does not resolve). "
    "PsqlRunner covers the live-PG lifecycle (tests/test_pg_live.py); "
    "set SPARK_PG_JDBC_JAR to a pgJDBC jar to run this suite."
)


@pytest.mark.skipif(_find_jar() is None, reason=_BLOCKER)
def test_pgjdbc_full_lifecycle_against_live_pg():
    jar = _find_jar()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "pgjdbc_lifecycle.py"), jar],
        capture_output=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr.decode(errors="replace")[-2000:]
    assert b"PGJDBC LIFECYCLE OK" in r.stdout
