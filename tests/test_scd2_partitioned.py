"""Partitioned SCD2 equals the snapshot operator on multi-batch
histories (and only rewrites the bounded current partition)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_process_for_fraud_transactions_spark.operators.scd2 import scd2_apply
from etl_process_for_fraud_transactions_spark.operators.scd2_partitioned import (
    PartitionedScd2,
)
from etl_process_for_fraud_transactions_spark.sources.warehouse import Warehouse

BATCHES = [
    [("c1", "111"), ("c2", "222")],
    [("c1", "111x"), ("c2", "222"), ("c3", "333")],
    [("c1", "111y"), ("c3", "333x")],
]


def _snap(df):
    return sorted(
        (r.client_id, r.phone, str(r.effective_from), str(r.effective_to), r.deleted_flg)
        for r in df.collect()
    )


def test_partitioned_matches_snapshot(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    part = PartitionedScd2(wh, "dim_clients", ["client_id"], ["phone"])
    snap = None
    for i, rows in enumerate(BATCHES):
        b = F.lit(dt.date(2024, 1, 1) + dt.timedelta(days=i))
        stg = spark.createDataFrame(rows, "client_id string, phone string")
        part.apply_batch(stg, b)
        snap = scd2_apply(snap, stg, ["client_id"], ["phone"], b)
    assert _snap(part.history()) == _snap(snap)
    assert _snap(part.current()) == _snap(snap.filter("deleted_flg = false"))


def test_closed_partition_is_append_only(spark, tmp_path):
    import os

    wh = Warehouse(spark, str(tmp_path))
    part = PartitionedScd2(wh, "dim", ["client_id"], ["phone"])
    part.apply_batch(
        spark.createDataFrame([("c1", "1")], "client_id string, phone string"),
        F.lit(dt.date(2024, 1, 1)),
    )
    part.apply_batch(
        spark.createDataFrame([("c1", "2")], "client_id string, phone string"),
        F.lit(dt.date(2024, 1, 2)),
    )
    closed_files = set(os.listdir(wh.path("dim_closed")))
    part.apply_batch(
        spark.createDataFrame([("c1", "3")], "client_id string, phone string"),
        F.lit(dt.date(2024, 1, 3)),
    )
    # batch 3 only ADDED files to the closed partition
    assert closed_files <= set(os.listdir(wh.path("dim_closed")))
    assert part.history().count() == 3
