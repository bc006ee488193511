"""JDBC source/sink wrappers (S4/S6, SURVEY.md §2.A).

The reference talks to PostgreSQL through a 5-connection pgx pool
(reference internal/database/connection.go:10-35); the Spark-native
equivalent is the JDBC data source with bounded parallelism
(``numPartitions`` caps concurrent connections exactly like MaxConns) and
partitioned range reads for bulk extraction. Arbitrary-statement execution
(the migration DDL path) lives in executor.orchestrator.JdbcRunner — the
DataFrame API here is for the data-bearing ETL phase.

These wrappers only build option maps + invoke the built-in source, so
they are unit-testable without a live database; ``ping`` is the 1-row
probe standing in for pool ping-verify."""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

DEFAULT_MAX_CONNECTIONS = 5  # reference internal/database/connection.go:10


def reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = DEFAULT_MAX_CONNECTIONS,
    fetch_size: int = 10_000,
    predicate_pushdown: bool = True,
    session_init: str | None = None,
) -> DataFrameReader:
    """Configured JDBC reader. With a partition column the scan issues
    ``num_partitions`` parallel range queries (the bulk-extract path); at
    100 TB pick a clustered integer key and bounds from min/max so ranges
    are balanced."""
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetch_size))
        .option("pushDownPredicate", str(predicate_pushdown).lower())
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned reads need lower_bound/upper_bound")
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    if session_init:
        # per-connection setup, e.g. SET statement_timeout (E7 analogue)
        r = r.option("sessionInitStatement", session_init)
    return r


def read_table(spark: SparkSession, url: str, table: str, **kwargs) -> DataFrame:
    return reader(spark, url, table, **kwargs).load()


def write_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    num_partitions: int = DEFAULT_MAX_CONNECTIONS,
    batch_size: int = 10_000,
    isolation_level: str = "READ_COMMITTED",
) -> None:
    """Bulk load (the ETL load phase). numPartitions bounds concurrent
    connections like the reference's pool cap; batchsize controls insert
    batching."""
    (
        df.repartition(num_partitions)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .option("isolationLevel", isolation_level)
        .mode(mode)
        .save()
    )


def ping(spark: SparkSession, url: str, probe: str = "SELECT 1") -> bool:
    """Connection verify — the pool-ping analogue
    (reference internal/database/connection.go:23-33). ``probe`` is the
    dialect's cheapest no-table query: the default suits PostgreSQL/MySQL;
    Derby needs ``SELECT 1 AS ping FROM SYSIBM.SYSDUMMY1`` (aliased: Spark re-selects the probe column by name), Oracle ``... FROM
    DUAL``."""
    try:
        (
            spark.read.format("jdbc")
            .option("url", url)
            .option("query", probe)
            .load()
            .collect()
        )
        return True
    except Exception:
        return False
