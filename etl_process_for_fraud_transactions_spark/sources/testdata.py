"""Loaders for the driver's test tables (/root/testdata/sf*/).

`events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark's reader
rejects outright; with spark.sql.legacy.parquet.nanosAsLong=true it
arrives as a long of epoch-nanoseconds. We floor-divide to microseconds
(`ts div 1000`) and build a timestamp_ntz — exactly matching DuckDB,
which truncates nanos to its microsecond TIMESTAMP on read. Integer
`div` (not `/1000` via double) is essential: epoch-nanos ~1.7e18
exceeds double's 53-bit exact-integer range.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes)["ts"] in ("bigint", "long"):
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    apply_runtime_confs(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
