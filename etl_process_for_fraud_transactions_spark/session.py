"""SparkSession construction and session-level tuning.

The engine is designed for a large multi-executor cluster (the local
``local[N]`` master is only the test harness): AQE handles runtime
shuffle-partition coalescing and skew-join splitting, broadcast joins
are used for dimension tables, and shuffle partitioning defaults are
sized by ``SPARK_GRAFT_CPUS`` locally but should be raised (or left to
AQE) on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are safe (and required) to set at runtime on any session,
#: including one the test driver built for us.
RUNTIME_CONFS = {
    # The driver's events.parquet uses INT64 TIMESTAMP(NANOS) which the
    # vectorized reader rejects; read nanos as long and convert (see
    # sources.testdata.load_events).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic wall-clock semantics, matching a naive-timestamp
    # oracle (DuckDB).
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally built session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime conf on this build; defaults acceptable
    return spark


def get_spark(app_name: str = "etl-fraud-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Local test default: ``local[$SPARK_GRAFT_CPUS]`` with
    shuffle.partitions = cpus (AQE coalesces further at runtime). On a
    real cluster, pass ``master=None`` under spark-submit and size
    ``spark.sql.shuffle.partitions`` to ~2-3x total cores; AQE then
    right-sizes each stage from runtime statistics.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Arrow for any pandas interchange (xlsx shim, pandas UDFs).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # In case an existing session was reused with different confs:
    return apply_runtime_confs(spark)
