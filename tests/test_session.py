"""Session construction: the cluster profile is executable (the
builder honors overrides), not just prose."""

from __future__ import annotations

import pytest

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


def test_scratch_shuffle_partitions_scopes_and_restores(spark):
    """The r15 maintenance-scope context manager: sets the conf inside
    the block, restores the caller's value on exit — including on an
    exception (the maintenance cycle raising must not leave a served
    plan at 8 partitions)."""
    from etl_process_for_fraud_transactions_spark.session import (
        scratch_shuffle_partitions,
    )

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with scratch_shuffle_partitions(spark, 8):
        assert spark.conf.get(key) == "8"
    assert spark.conf.get(key) == before

    with pytest.raises(RuntimeError):
        with scratch_shuffle_partitions(spark, 8):
            assert spark.conf.get(key) == "8"
            raise RuntimeError("maintenance failed")
    assert spark.conf.get(key) == before
