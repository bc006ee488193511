"""Explicit StructTypes for every table the engine reads or builds.

The reference compiles its schemas into Go structs and one DDL literal
(reference internal/tracker/schema.go:4-11, internal/migration/migration.go:9-16);
there is no inference anywhere. We keep that property: every scan declares
its schema so (a) oracle comparisons are deterministic, (b) Spark skips the
footer-sampling inference job, and (c) column pruning is exact.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- analytics fixture tables (driver-generated parquet, FIXTURES.md §3) ---

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

# events.ts fixtures have shipped as both parquet timestamp[ns] and
# timestamp[us] across driver rounds. io.read_table sniffs the footer:
# ns files are read with this raw int64 schema and converted via integer
# division (matching DuckDB's ns→us truncation); us files use the plain
# EVENTS schema below.
EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# --- migration-engine tables (reference data model, SURVEY.md §1.1) ---

# Mirrors the reference Migration struct
# (reference internal/migration/migration.go:9-16).
MIGRATIONS = T.StructType(
    [
        T.StructField("version", T.StringType(), nullable=False),
        T.StructField("name", T.StringType(), nullable=False),
        T.StructField("up_sql", T.StringType(), nullable=False),
        T.StructField("down_sql", T.StringType(), nullable=True),
        T.StructField("checksum", T.StringType(), nullable=False),
        T.StructField("file_path", T.StringType(), nullable=False),
    ]
)

# Mirrors the reference schema_migrations DDL
# (reference internal/tracker/schema.go:4-11).
SCHEMA_MIGRATIONS = T.StructType(
    [
        T.StructField("version", T.StringType(), nullable=False),
        T.StructField("filename", T.StringType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("applied_at", T.TimestampType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("status", T.StringType()),
    ]
)

# One row per (migration, statement) produced by the analyzer's parse stage
# (the Spark analogue of ParseResult, reference internal/parser/parser.go:11-14).
ALTER_COMMAND = T.StructType(
    [
        T.StructField("subtype", T.StringType()),
        T.StructField("column", T.StringType()),
        T.StructField("has_default", T.BooleanType()),
        T.StructField("default_volatile", T.BooleanType()),
        T.StructField("constraint_type", T.StringType()),
        T.StructField("skip_validation", T.BooleanType()),
    ]
)

STATEMENT_FEATURES = T.StructType(
    [
        T.StructField("stmt_index", T.IntegerType()),
        T.StructField("stmt_sql", T.StringType()),
        T.StructField("stmt_type", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("tables", T.ArrayType(T.StringType())),
        T.StructField("concurrent", T.BooleanType()),
        T.StructField("vacuum_full", T.BooleanType()),
        T.StructField("if_exists", T.BooleanType()),
        T.StructField("rename_object", T.StringType()),
        T.StructField("commands", T.ArrayType(ALTER_COMMAND)),
    ]
)

# One row per Finding (reference internal/analyzer/result.go:6-15).
FINDINGS = T.StructType(
    [
        T.StructField("version", T.StringType()),
        T.StructField("rule", T.StringType()),
        T.StructField("severity", T.IntegerType()),
        T.StructField("severity_name", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("statement", T.StringType()),
        T.StructField("message", T.StringType()),
        T.StructField("suggestion", T.StringType()),
        T.StructField("lock_type", T.StringType()),
        T.StructField("stmt_index", T.IntegerType()),
    ]
)
