"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship five-rule fraud report on sf0.001, with the
               dimension chain built through the real SCD2 operator.
queries()    — the operator inventory (SURVEY.md §2) over the driver's
               parquet tables.
oracle_sql() — DuckDB twins for every SQL-expressible entry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from etl_process_for_fraud_transactions_spark.plans.flagship import flagship_report

    return flagship_report(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from etl_process_for_fraud_transactions_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from etl_process_for_fraud_transactions_spark.plans import ORACLE

    return dict(ORACLE)
