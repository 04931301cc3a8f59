"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference fraud-transactions ETL
(NGeraskina/ETL-process-for-fraud-transactions, surveyed in SURVEY.md).

Architecture (Spark-first, not a port):

- ``sources``   — dated-file discovery, comma-decimal CSV, xlsx shim,
                  parquet warehouse with atomic snapshot overwrite.
- ``operators`` — SCD2 history maintenance, bucketed range/theta
                  self-joins, the five fraud rules, report assembly,
                  plus LLM-data-pipeline operators (dedup, similarity
                  search, text analysis, multimodal plumbing).
- ``functions`` — scalar helpers with PostgreSQL-parity semantics
                  (null-propagating concat, comma-decimal parsing,
                  epoch extraction on ntz timestamps).
- ``plans``     — the driver-facing query inventory over the test
                  tables, with DuckDB oracle SQL twins.
- ``streaming`` — Structured-Streaming analog of the dated-file batch
                  ingest (Trigger.AvailableNow).
- ``jobs``      — per-batch-date orchestration (daily ETL driver).

Everything is expressed with the public DataFrame API so Catalyst keeps
predicate pushdown, column pruning, broadcast selection, AQE and
whole-stage codegen; no RDDs and no row-at-a-time Python UDFs in any
hot path.
"""

__version__ = "0.1.0"
