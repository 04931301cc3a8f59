"""Partitioned SCD2 equals the snapshot operator on multi-batch
histories (and only rewrites the bounded current partition)."""

from __future__ import annotations

import datetime as dt
import os

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


def _hist_rows(df):
    return sorted(
        (r.client_id, r.phone, str(r.effective_from), str(r.effective_to), r.deleted_flg)
        for r in df.collect()
    )


def test_five_batch_daily_job_modes_equivalent(spark, tmp_path):
    """Full daily job over 5 batch dates in BOTH SCD2 modes (snapshot =
    reference-exact full rewrite; partitioned = append-only closed +
    bounded current): dim histories and fraud reports must agree row
    for row when attribute tuples don't repeat across versions."""
    import shutil

    from pyspark.sql import functions as F

    from etl_process_for_fraud_transactions_spark.jobs.daily import DailyFraudJob
    from etl_process_for_fraud_transactions_spark.schemas import DIMENSIONS

    input_dir = tmp_path / "incoming"
    source_dir = tmp_path / "sourcedb"
    input_dir.mkdir()

    def write_clients(phones):
        rows = [
            (f"c{i}", f"Last{i}", f"First{i}", "M", dt.date(1980, 1, 1 + i),
             f"P{i}00", dt.date(2030, 1, 1), phones[i])
            for i in range(len(phones))
        ]
        tmp = str(tmp_path / "cl_tmp.parquet")
        spark.createDataFrame(
            rows,
            "client_id string, last_name string, first_name string, patronymic string, "
            "date_of_birth date, passport_num string, passport_valid_to date, phone string",
        ).write.mode("overwrite").parquet(tmp)
        target = str(source_dir / "clients.parquet")
        if os.path.exists(target):
            shutil.rmtree(target)
        shutil.move(tmp, target)

    write_clients(["+70", "+71", "+72"])
    spark.createDataFrame(
        [("a0", dt.date(2030, 1, 1), "c0"), ("a1", dt.date(2030, 1, 1), "c1"),
         ("a2", dt.date(2030, 1, 1), "c2")],
        "account string, valid_to date, client string",
    ).write.parquet(str(source_dir / "accounts.parquet"))
    spark.createDataFrame(
        [("card0", "a0"), ("card1", "a1"), ("card2", "a2")],
        "card_num string, account string",
    ).write.parquet(str(source_dir / "cards.parquet"))

    def write_batch(date, trans_rows):
        (input_dir / f"transactions_{date}.txt").write_text(
            "transaction_id;transaction_date;card_num;oper_type;amount;oper_result;terminal\n"
            + "\n".join(trans_rows) + "\n"
        )
        (input_dir / f"terminals_{date}.csv").write_text(
            "terminal_id,terminal_type,terminal_city,terminal_address\n"
            "t1,ATM,Moscow,addr1\nt2,POS,Kazan,addr2\n"
        )
        (input_dir / f"passport_blacklist_{date}.csv").write_text("passport,date\n")

    snap = DailyFraudJob(spark, str(input_dir), str(source_dir),
                         str(tmp_path / "wh_snap"), archive=False,
                         scd2_mode="snapshot")
    part = DailyFraudJob(spark, str(input_dir), str(source_dir),
                         str(tmp_path / "wh_part"), archive=False,
                         scd2_mode="partitioned")

    # phone histories never repeat a prior value per client, so the
    # documented tuple-IN divergence cannot trigger here
    phone_plan = [
        ["+70", "+71", "+72"],
        ["+70a", "+71", "+72"],        # c0 changes
        ["+70a", "+71a", "+72"],       # c1 changes
        ["+70b", "+71a", "+72a"],      # c0 + c2 change
        ["+70b", "+71a", "+72a"],      # no change
    ]
    for i, phones in enumerate(phone_plan):
        date = f"{i + 1:02d}012024"
        write_clients(phones)
        write_batch(date, [
            f"tx{i}a;2024-01-{i + 1:02d} 10:00:00;card0;PAY;10,00;SUCCESS;t1",
            f"tx{i}b;2024-01-{i + 1:02d} 10:30:00;card0;PAY;20,00;SUCCESS;t2",
        ])
        snap.run_batch(date)
        part.run_batch(date)

    assert _hist_rows(snap.wh.read("dim_clients_hist")) == _hist_rows(
        part._read_dim_history("clients")
    )
    # every dim agrees, not just clients
    for name in DIMENSIONS:
        s_rows = sorted(map(tuple, snap.wh.read(f"dim_{name}_hist").collect()))
        p_rows = sorted(map(tuple, part._read_dim_history(name).collect()))
        assert s_rows == p_rows, name

    rep_s = sorted(map(tuple, snap.wh.read("rep_fraud").collect()))
    rep_p = sorted(map(tuple, part.wh.read("rep_fraud").collect()))
    assert rep_s == rep_p
    # c0's diff-city pairs fire every day in both modes
    assert len(rep_s) > 0


def test_tuple_repeat_divergence_documented(spark, tmp_path):
    """The ONE case the two modes legitimately differ on (documented in
    operators/scd2_partitioned.py): a key whose attribute tuple repeats
    an older version's tuple. The snapshot operator reproduces the
    reference's tuple-IN close-out (main.py:144-145), which re-stamps
    the coinciding HISTORICAL row too; the partitioned variant closes
    by key — the intended SCD2 semantics — leaving history immutable."""
    wh = Warehouse(spark, str(tmp_path))
    part = PartitionedScd2(wh, "dim", ["client_id"], ["phone"])

    # A -> B -> A -> C : closing the day-3 current row (tuple (c1, A))
    # also matches the day-1 historical row (c1, A)
    snap = None
    for i, phone in enumerate(["A", "B", "A", "C"]):
        b = F.lit(dt.date(2024, 1, 1 + i))
        stg = spark.createDataFrame([("c1", phone)], "client_id string, phone string")
        part.apply_batch(stg, b)
        snap = scd2_apply(snap, stg, ["client_id"], ["phone"], b)

    part_hist = _hist_rows(part.history())
    snap_hist = _hist_rows(snap)

    # partitioned: clean 4-version history, each closed at its true date
    assert part_hist == [
        ("c1", "A", "2024-01-01", "2024-01-02", True),
        ("c1", "A", "2024-01-03", "2024-01-04", True),
        ("c1", "B", "2024-01-02", "2024-01-03", True),
        ("c1", "C", "2024-01-04", "3000-01-01", False),
    ]
    # snapshot (reference quirk): the day-1 (c1, A) row was re-stamped
    # by day 4's tuple-IN close-out, so its effective_to moved to 01-04
    assert snap_hist == [
        ("c1", "A", "2024-01-01", "2024-01-04", True),
        ("c1", "A", "2024-01-03", "2024-01-04", True),
        ("c1", "B", "2024-01-02", "2024-01-03", True),
        ("c1", "C", "2024-01-04", "3000-01-01", False),
    ]
    assert part_hist != snap_hist
