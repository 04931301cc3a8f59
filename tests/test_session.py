"""Session construction: the cluster profile is executable (the
builder honors overrides), not just prose."""

from __future__ import annotations

from etl_process_for_fraud_transactions_spark.session import (
    cluster_profile,
    get_spark,
)


def test_cluster_profile_shape():
    p = cluster_profile(executors=1000, cores_per_executor=4)
    assert p["spark.sql.shuffle.partitions"] == str(3 * 4000)
    assert p["spark.sql.files.maxPartitionBytes"] == str(128 * 1024 * 1024)
    assert p["spark.sql.adaptive.enabled"] == "true"
    assert p["spark.dynamicAllocation.maxExecutors"] == "1000"
    # the broadcast threshold is deliberately ABSENT: bounded dims sit
    # under the default and fact-growth tables must rely on AQE, never
    # a raised threshold or a hint (multihop_revenue lesson)
    assert "spark.sql.autoBroadcastJoinThreshold" not in p


def test_get_spark_honors_extra_confs(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        s = get_spark(extra_confs={"spark.sql.shuffle.partitions": "7"})
        assert s.conf.get("spark.sql.shuffle.partitions") == "7"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_profile_scales_with_fleet():
    small = cluster_profile(executors=10, cores_per_executor=8)
    assert small["spark.sql.shuffle.partitions"] == str(3 * 80)
    assert small["spark.executor.cores"] == "8"
