"""applyInPandasWithState: consecutive-REJECT streak detector.

Semantics pinned two ways: a hand-built fixture with known alert
points, and state carry-over across two checkpointed runs (the streak
spans a micro-batch boundary)."""

from __future__ import annotations

import json

from etl_process_for_fraud_transactions_spark.streaming.stateful import (
    consecutive_reject_alerts,
)

SCHEMA = "card_num long, trans_id long, ts timestamp_ntz, oper_result string"


def _write(src, name, rows):
    (src / name).write_text("\n".join(json.dumps(r) for r in rows))


def _run(spark, src, out_path, ckpt, threshold=3):
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        consecutive_reject_alerts(stream, threshold=threshold)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        (r.card_num, str(r.alert_ts), r.streak)
        for r in spark.read.parquet(out_path).collect()
    }


def test_streak_alerts_within_one_batch(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write(
        src,
        "t1.jsonl",
        [
            # card 1: R R S R R R -> alert at trans 15 (3rd consecutive)
            {"card_num": 1, "trans_id": 10, "ts": "2024-01-01 10:00:00", "oper_result": "REJECT"},
            {"card_num": 1, "trans_id": 11, "ts": "2024-01-01 10:01:00", "oper_result": "REJECT"},
            {"card_num": 1, "trans_id": 12, "ts": "2024-01-01 10:02:00", "oper_result": "SUCCESS"},
            {"card_num": 1, "trans_id": 13, "ts": "2024-01-01 10:03:00", "oper_result": "REJECT"},
            {"card_num": 1, "trans_id": 14, "ts": "2024-01-01 10:04:00", "oper_result": "REJECT"},
            {"card_num": 1, "trans_id": 15, "ts": "2024-01-01 10:05:00", "oper_result": "REJECT"},
            # card 2: only 2 rejects -> no alert
            {"card_num": 2, "trans_id": 20, "ts": "2024-01-01 10:00:00", "oper_result": "REJECT"},
            {"card_num": 2, "trans_id": 21, "ts": "2024-01-01 10:01:00", "oper_result": "REJECT"},
        ],
    )
    got = _run(spark, src, str(tmp_path / "out"), str(tmp_path / "ck"))
    assert got == {(1, "2024-01-01 10:05:00", 3)}


def test_streak_spans_micro_batches(spark, tmp_path):
    """2 rejects in run 1, the 3rd in run 2: the alert fires only if the
    streak counter survived the checkpoint."""
    src = tmp_path / "in"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    _write(
        src,
        "t1.jsonl",
        [
            {"card_num": 7, "trans_id": 1, "ts": "2024-01-01 09:00:00", "oper_result": "REJECT"},
            {"card_num": 7, "trans_id": 2, "ts": "2024-01-01 09:01:00", "oper_result": "REJECT"},
        ],
    )
    assert _run(spark, src, out, ckpt) == set()

    _write(
        src,
        "t2.jsonl",
        [
            {"card_num": 7, "trans_id": 3, "ts": "2024-01-01 09:02:00", "oper_result": "REJECT"},
            # and a reset + fresh streak that does NOT reach 3
            {"card_num": 7, "trans_id": 4, "ts": "2024-01-01 09:03:00", "oper_result": "SUCCESS"},
            {"card_num": 7, "trans_id": 5, "ts": "2024-01-01 09:04:00", "oper_result": "REJECT"},
        ],
    )
    got = _run(spark, src, out, ckpt)
    assert got == {(7, "2024-01-01 09:02:00", 3)}
