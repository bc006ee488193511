"""Analysis pipeline: migrations → statements → findings → rollup.

Spark shape of the reference's analyze lifecycle (SURVEY.md §3.1):
``files_df → migrations_df → statements_df (parse UDF + explode) →
findings_df (9 rule exprs, union) → rollup_df``. All narrow
transformations except the final rollup groupBy — one shuffle.

The parse step is an Arrow-batched pandas UDF: per-row Python string
parsing is unavoidable (Spark cannot parse PostgreSQL DDL), but batching
through Arrow keeps the exchange columnar. The cheap ``CONCURRENTLY``
substring prefilter before invoking the parser in the tx-routing path
mirrors the reference's fast path (internal/executor/concurrent.go:16-19) —
placed manually because Catalyst will not reorder around a Python UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .. import schemas
from ..session import ensure_worker_imports
from . import parse as _parse
from .rules import HIGH, SEVERITY_NAMES, apply_rules


@pandas_udf(T.ArrayType(schemas.STATEMENT_FEATURES))
def _parse_udf(sql: pd.Series) -> pd.Series:
    return sql.map(_parse.parse_sql)


def extract_statements(migrations: DataFrame, sql_col: str = "up_sql") -> DataFrame:
    """migrations → one row per (version, statement) with feature columns.

    The Spark analogue of ParseResult's statement stream
    (reference internal/parser/parser.go:29-32) followed by the per-statement
    dispatcher iteration (reference internal/analyzer/analyzer.go:63-87).
    """
    # the parse UDF unpickles on workers by importing this package —
    # ship it so plans work regardless of the host process's cwd
    ensure_worker_imports(migrations.sparkSession)
    return (
        migrations.select(
            "version", F.explode(_parse_udf(F.col(sql_col))).alias("stmt")
        )
        .select("version", "stmt.*")
    )


def analyze(migrations: DataFrame, pg_version: int = 14) -> DataFrame:
    """Full findings DataFrame for a migrations DataFrame.

    The statements DataFrame is persisted with a bounded lifetime
    (session.persist_bounded — the previous analyze() call's cache is
    released, so repeated calls don't leak): the 9-rule union would
    otherwise re-run the whole parse subtree (including the Python UDF)
    once per rule branch — at any scale that is 9 parses of every
    migration.
    """
    from ..session import persist_bounded

    stmts = persist_bounded(
        "analyzer.stmts", extract_statements(migrations)
    )
    return apply_rules(stmts, pg_version=pg_version)


def severity_rollup(
    migrations: DataFrame, findings: DataFrame | None = None, pg_version: int = 14
) -> DataFrame:
    """Per-migration rollup: max severity, counts, danger gate flag.

    AnalysisResult's running-max + HasHighOrCritical
    (reference internal/analyzer/analyzer.go:80-82, result.go:25-27) as one
    groupBy; migrations with no findings roll up to SAFE via the left join.
    """
    if findings is None:
        findings = analyze(migrations, pg_version=pg_version)
    per_version = findings.groupBy("version").agg(
        F.max("severity").alias("max_severity"),
        F.count(F.lit(1)).alias("n_findings"),
    )
    return (
        migrations.select("version")
        .join(per_version, "version", "left")
        .select(
            "version",
            F.coalesce(F.col("max_severity"), F.lit(0)).alias("max_severity"),
            F.coalesce(F.col("n_findings"), F.lit(0))
            .cast("long")
            .alias("n_findings"),
            (F.coalesce(F.col("max_severity"), F.lit(0)) >= HIGH).alias(
                "has_high_or_critical"
            ),
        )
    )


def severity_name(severity: int) -> str:
    return SEVERITY_NAMES.get(severity, "UNKNOWN")
