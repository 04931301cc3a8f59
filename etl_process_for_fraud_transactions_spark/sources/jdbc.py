"""JDBC source (SURVEY.md §2.1 S6): the reference reads its
info.clients / info.accounts / info.cards tables from a live
PostgreSQL (main.py:75,84,92). Engine-native deployments read parquet
snapshots instead (jobs.daily); this wrapper provides literal parity
for deployments that must pull from a JDBC database.

Scale notes baked into the defaults: predicate-partitioned reads
(numPartitions + partitionColumn) so the pull parallelizes across
executors instead of a single connection, and fetchsize large enough
to amortize round-trips. Credentials come from the caller/environment,
never hardcoded (the reference embeds them — SURVEY.md §7.4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetchsize: int = 10_000,
) -> DataFrame:
    """`spark.read.jdbc` with partitioned-pull defaults. Requires the
    JDBC driver jar on the classpath (not bundled here)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()
