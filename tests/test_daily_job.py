"""End-to-end daily-batch test: two dated batches through staging,
SCD2, facts and the five-rule report — the reference's whole main loop
on crafted fixtures with known fraud labels."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from etl_process_for_fraud_transactions_spark.jobs.daily import DailyFraudJob


@pytest.fixture()
def fixture_dirs(spark, tmp_path):
    input_dir = tmp_path / "incoming"
    source_dir = tmp_path / "sourcedb"
    wh_dir = tmp_path / "wh"
    input_dir.mkdir()

    # source DB tables (note source-side names: patronymic, account)
    spark.createDataFrame(
        [
            ("c1", "Ivanov", "Ivan", "I", dt.date(1980, 1, 1), "P100", dt.date(2030, 1, 1), "+71"),
            ("c2", "Petrov", "Petr", "P", dt.date(1981, 1, 1), "P200", dt.date(2020, 1, 1), "+72"),  # expired passport
            ("c3", "Blk", "Boris", "B", dt.date(1982, 1, 1), "P300", dt.date(2030, 1, 1), "+73"),  # blacklisted
        ],
        "client_id string, last_name string, first_name string, patronymic string, "
        "date_of_birth date, passport_num string, passport_valid_to date, phone string",
    ).write.parquet(str(source_dir / "clients.parquet"))
    spark.createDataFrame(
        [
            ("a1", dt.date(2030, 1, 1), "c1"),
            ("a2", dt.date(2030, 1, 1), "c2"),
            ("a3", dt.date(2030, 1, 1), "c3"),
        ],
        "account string, valid_to date, client string",
    ).write.parquet(str(source_dir / "accounts.parquet"))
    spark.createDataFrame(
        [("card1", "a1"), ("card2", "a2"), ("card3", "a3")],
        "card_num string, account string",
    ).write.parquet(str(source_dir / "cards.parquet"))

    def write_batch(date: str, trans_rows: list[str], blacklist_rows: list[str]):
        (input_dir / f"transactions_{date}.txt").write_text(
            "transaction_id;transaction_date;card_num;oper_type;amount;oper_result;terminal\n"
            + "\n".join(trans_rows)
            + "\n"
        )
        (input_dir / f"terminals_{date}.csv").write_text(
            "terminal_id,terminal_type,terminal_city,terminal_address\n"
            "t1,ATM,Moscow,addr1\n"
            "t2,POS,Kazan,addr2\n"
        )
        (input_dir / f"passport_blacklist_{date}.csv").write_text(
            "passport,date\n" + "\n".join(blacklist_rows) + ("\n" if blacklist_rows else "")
        )

    # batch 1: c2 expired-passport txn; c1 diff-city pair within 1h
    write_batch(
        "01012024",
        [
            "tx1;2024-01-01 10:00:00;card2;PAY;100,50;SUCCESS;t1",
            "tx2;2024-01-01 11:00:00;card1;PAY;50,00;SUCCESS;t1",
            "tx3;2024-01-01 11:30:00;card1;PAY;60,00;SUCCESS;t2",
        ],
        ["P300,2023-12-01"],
    )
    return str(input_dir), str(source_dir), str(wh_dir), write_batch


def test_two_batch_pipeline(spark, fixture_dirs):
    input_dir, source_dir, wh_dir, write_batch = fixture_dirs
    job = DailyFraudJob(spark, input_dir, source_dir, wh_dir)
    dates = job.run()
    assert dates == ["01012024"]

    rep = job.wh.read("rep_fraud")
    by_type = {
        (r.passport, r.event_type) for r in rep.collect()
    }
    # c2: expired passport fires on tx1; c1: diff-city on tx2/tx3
    assert ("P200", "EXPIRED_PASSPORT") in by_type
    assert ("P100", "DIFF_CITY_SHORT_TIME") in by_type
    # files archived after consumption
    assert os.path.exists(os.path.join(input_dir, "archive"))

    # batch 2: c3 transacts on a blacklisted passport; blacklist file empty
    write_batch(
        "02012024",
        ["tx4;2024-01-02 09:00:00;card3;PAY;10,00;SUCCESS;t1"],
        [],
    )
    job.run()

    hist = job._read_dim_history("clients")
    # no attribute changed between batches -> still exactly one version per client
    assert hist.count() == 3

    rep2 = job.wh.read("rep_fraud")
    rows2 = {(r.passport, r.event_type) for r in rep2.collect()}
    assert ("P300", "BLOCKED_PASSPORT") in rows2

    # report partitions: one per report_dt; day-1 rows re-derived on day 2
    # (full-fact rescan, as the reference does) land in day-2's partition
    fact = job.wh.read("fact_transactions")
    assert fact.count() == 4


def test_partitioned_scd2_mode_equivalent_report(spark, fixture_dirs):
    input_dir, source_dir, wh_dir, write_batch = fixture_dirs
    # archive must stay on: with unconsumed batch-1 files still in the
    # inbox, run() would re-discover and re-apply 01012024 against the
    # mutated source before reaching batch 2
    job = DailyFraudJob(
        spark, input_dir, source_dir, wh_dir + "_p", scd2_mode="partitioned"
    )
    job.run()
    rep = {(r.passport, r.event_type) for r in job.wh.read("rep_fraud").collect()}
    assert ("P200", "EXPIRED_PASSPORT") in rep
    assert ("P100", "DIFF_CITY_SHORT_TIME") in rep
    # second batch with a source change -> history via current∪closed
    import pyspark.sql.functions as F
    import shutil, os

    clients = spark.read.parquet(os.path.join(source_dir, "clients.parquet"))
    mutated = clients.withColumn(
        "phone", F.when(F.col("client_id") == "c1", "+71P").otherwise(F.col("phone"))
    )
    tmp = wh_dir + "_ptmp"
    mutated.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(os.path.join(source_dir, "clients.parquet"))
    shutil.move(tmp, os.path.join(source_dir, "clients.parquet"))
    write_batch("02012024", ["tx8;2024-01-02 09:00:00;card1;PAY;5,00;SUCCESS;t1"], [])
    job.run()
    hist = job._read_dim_history("clients")
    c1 = sorted((r.phone, str(r.effective_to), r.deleted_flg) for r in hist.filter("client_id='c1'").collect())
    assert c1 == [("+71", "2024-01-02", True), ("+71P", "3000-01-01", False)]


def test_incremental_report_only_batch_rows(spark, fixture_dirs):
    input_dir, source_dir, wh_dir, write_batch = fixture_dirs
    job = DailyFraudJob(
        spark, input_dir, source_dir, wh_dir + "_inc", incremental_report=True
    )
    job.run()
    write_batch(
        "02012024",
        ["tx4;2024-01-02 09:00:00;card2;PAY;10,00;SUCCESS;t1"],
        [],
    )
    job.run()
    rep = job.wh.read("rep_fraud")
    # day-2 partition holds ONLY day-2's transaction (tx4: expired
    # passport for c2), not re-derived day-1 rows
    day2 = rep.filter("report_dt = date'2024-01-02'").collect()
    assert {str(r.event_dt) for r in day2} == {"2024-01-02 09:00:00"}
    day1 = rep.filter("report_dt = date'2024-01-01'")
    assert day1.count() > 0  # day-1 partition intact


def test_scd2_change_across_batches(spark, fixture_dirs, tmp_path):
    input_dir, source_dir, wh_dir, write_batch = fixture_dirs
    job = DailyFraudJob(spark, input_dir, source_dir, wh_dir)
    job.run()

    # mutate source: c1 changes phone
    import pyspark.sql.functions as F

    clients = spark.read.parquet(os.path.join(source_dir, "clients.parquet"))
    mutated = clients.withColumn(
        "phone", F.when(F.col("client_id") == "c1", "+71NEW").otherwise(F.col("phone"))
    )
    mutated.write.mode("overwrite").parquet(str(tmp_path / "clients2.parquet"))
    import shutil

    shutil.rmtree(os.path.join(source_dir, "clients.parquet"))
    shutil.move(str(tmp_path / "clients2.parquet"), os.path.join(source_dir, "clients.parquet"))

    write_batch("02012024", ["tx9;2024-01-02 09:00:00;card1;PAY;5,00;SUCCESS;t1"], [])
    job.run()

    hist = job._read_dim_history("clients")
    c1 = sorted(
        (r.phone, str(r.effective_from), str(r.effective_to), r.deleted_flg)
        for r in hist.filter("client_id = 'c1'").collect()
    )
    assert c1 == [
        ("+71", "2024-01-01", "2024-01-02", True),
        ("+71NEW", "2024-01-02", "3000-01-01", False),
    ]
