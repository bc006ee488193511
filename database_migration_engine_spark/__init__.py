"""database_migration_engine_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``aqasim81/database-migration-engine`` (a zero-downtime PostgreSQL
schema-migration CLI), re-expressed Spark-first:

* the reference's relational surface (migration loading, SHA-256 checksums,
  ledger queries/upserts, rollback top-k selection, danger-rule analysis)
  becomes declarative DataFrame plans optimized by Catalyst;
* the ETL north star extends that surface with large-scale analytics
  operators: joins/aggregations/windows, exact + near dedup (MinHash-LSH,
  SimHash, n-gram Jaccard), embedding similarity search, text analysis and
  streaming-shaped event windowing — all designed for a 1000-executor
  cluster even though tests run on local[*].

Layout:
  session     SparkSession factory with scale-oriented defaults (AQE etc.)
  schemas     explicit StructTypes for every fixture table (never infer)
  io          parquet readers for the sf* fixture dirs
  fixtures    deterministic migration corpus + ledger rows (+ SQL VALUES)
  sources/    migration-directory scanner, JDBC wrappers
  analyzer/   PG DDL statement splitter, feature extractor, 9 danger rules
  operators/  ledger ops, dedup family, similarity search, sessionization
  functions/  scalar column helpers (text stats, vector math, redaction)
  plans/      the queries()/oracle_sql() registry served to the driver
  streaming/  Structured Streaming forms of the event operators
  executor/   driver-side apply/rollback orchestrator (ordered, fail-fast)
"""

__version__ = "0.1.0"
