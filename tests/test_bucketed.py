"""Bucketed co-located joins: same-key/same-count bucketed tables must
join with zero shuffle exchanges."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_process_for_fraud_transactions_spark.sources.warehouse import Warehouse


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    li = spark.range(0, 1000).selectExpr("id % 100 as orderkey", "id as item")
    o = spark.range(0, 100).selectExpr("id as orderkey", "id * 10 as total")
    wh.write_bucketed("t_lineitem_b", li, ["orderkey"], 8, sort_cols=["orderkey"])
    wh.write_bucketed("t_orders_b", o, ["orderkey"], 8, sort_cols=["orderkey"])
    try:
        a = wh.read_bucketed("t_lineitem_b")
        b = wh.read_bucketed("t_orders_b")
        # disable broadcast so the join would otherwise shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = a.join(b, "orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert joined.count() == 1000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")


def test_compact_reduces_files(spark, tmp_path):
    import os

    wh = Warehouse(spark, str(tmp_path))
    df = spark.range(0, 1000).repartition(16)
    wh.append("many_files", df)
    n_before = len([f for f in os.listdir(wh.path("many_files")) if f.startswith("part-")])
    wh.compact("many_files", 2)
    n_after = len([f for f in os.listdir(wh.path("many_files")) if f.startswith("part-")])
    assert n_before >= 16 and n_after <= 2
    assert wh.read("many_files").count() == 1000


def test_write_clustered_range_disjoint(spark, tmp_path):
    """Files from a clustered write cover disjoint key ranges — the
    property min/max row-group pruning depends on."""
    import glob

    from etl_process_for_fraud_transactions_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.range(0, 10_000).select(
        (F.col("id") * 37 % 10_000).alias("k"), F.col("id").alias("v")
    )
    wh.write_clustered("clustered", df, ["k"], n_files=8)

    # correctness: same rows back
    assert wh.read("clustered").count() == 10_000

    ranges = []
    for f in glob.glob(str(tmp_path / "wh" / "clustered" / "*.parquet")):
        pdf = spark.read.parquet(f).agg(
            F.min("k").alias("lo"), F.max("k").alias("hi")
        ).collect()[0]
        ranges.append((pdf.lo, pdf.hi))
    ranges.sort()
    assert len(ranges) > 1
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next  # disjoint (boundary may touch)
