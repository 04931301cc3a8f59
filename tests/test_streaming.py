"""Structured-Streaming ingest: dated files -> AvailableNow -> parquet
partitioned by extracted batch date."""

from __future__ import annotations

import decimal

from etl_process_for_fraud_transactions_spark.streaming.filestream import (
    ingest_available_now,
    stream_transactions,
)

HEADER = "transaction_id;transaction_date;card_num;oper_type;amount;oper_result;terminal\n"


def test_available_now_ingest(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    (src / "transactions_01012024.txt").write_text(
        HEADER + "tx1;2024-01-01 10:00:00;card1;PAY;12,34;SUCCESS;t1\n"
    )
    (src / "transactions_02012024.txt").write_text(
        HEADER + "tx2;2024-01-02 10:00:00;card2;PAY;56,78;REJECT;t2\n"
    )

    stream = stream_transactions(spark, str(src / "transactions_*.txt"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    ingest_available_now(stream, out, ckpt)

    df = spark.read.parquet(out)
    rows = {r.trans_id: (r.amt, str(r.batch_date)) for r in df.collect()}
    assert rows == {
        "tx1": (decimal.Decimal("12.34"), "2024-01-01"),
        "tx2": (decimal.Decimal("56.78"), "2024-01-02"),
    }

    # incremental: a new file arrives; checkpoint skips the consumed ones
    (src / "transactions_03012024.txt").write_text(
        HEADER + "tx3;2024-01-03 10:00:00;card3;PAY;1,00;SUCCESS;t1\n"
    )
    ingest_available_now(
        stream_transactions(spark, str(src / "transactions_*.txt")), out, ckpt
    )
    assert spark.read.parquet(out).count() == 3
