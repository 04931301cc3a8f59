"""Streaming session windows: end-to-end through a file stream with
AvailableNow, plus batch-mode semantic pinning."""

from __future__ import annotations

import datetime as dt
import json

from etl_process_for_fraud_transactions_spark.streaming.sessions import (
    streaming_session_stats,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _rows():
    return [
        {"user_id": 7, "ts": (T0 + dt.timedelta(minutes=m)).isoformat(sep=" "), "value": v}
        for m, v in [(0, 1.0), (10, 2.0), (50, 4.0), (55, 8.0)]
    ] + [{"user_id": 8, "ts": T0.isoformat(sep=" "), "value": 16.0}]


def test_batch_mode_semantics(spark):
    df = spark.createDataFrame(
        [(r["user_id"], dt.datetime.fromisoformat(r["ts"]), r["value"]) for r in _rows()],
        "user_id long, ts timestamp_ntz, value double",
    )
    out = {
        (r.user_id, str(r.session_start)): (r.n_events, r.total_value)
        for r in streaming_session_stats(df).collect()
    }
    # user 7: [12:00,12:10] and [12:50,12:55]; user 8: singleton
    assert out[(7, "2024-01-01 12:00:00")] == (2, 3.0)
    assert out[(7, "2024-01-01 12:50:00")] == (2, 12.0)
    assert out[(8, "2024-01-01 12:00:00")] == (1, 16.0)


def test_streaming_available_now(spark, tmp_path):
    """Append-mode session output follows the watermark protocol: a
    session is emitted only once a LATER batch's watermark passes its
    end (eviction uses the previous batch's watermark). Three files,
    one micro-batch each, with progressively later events driving the
    watermark forward."""
    src = tmp_path / "in"
    src.mkdir()
    (src / "f1.jsonl").write_text("\n".join(json.dumps(r) for r in _rows()))
    late1 = {"user_id": 9, "ts": "2024-01-01 14:30:00", "value": 0.0}
    late2 = {"user_id": 9, "ts": "2024-01-01 16:30:00", "value": 0.0}
    (src / "f2.jsonl").write_text(json.dumps(late1))
    (src / "f3.jsonl").write_text(json.dumps(late2))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp_ntz, value double")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    out_path, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        streaming_session_stats(stream)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, str(r.session_start)): (r.n_events, r.total_value)
        for r in spark.read.parquet(out_path).collect()
    }
    # f2's 14:30 event sets watermark 13:30 (60-min delay); batch 3
    # evicts every session that ended before it:
    assert got[(7, "2024-01-01 12:00:00")] == (2, 3.0)
    assert got[(7, "2024-01-01 12:50:00")] == (2, 12.0)
    assert got[(8, "2024-01-01 12:00:00")] == (1, 16.0)
    # the final watermark tops out at 15:30 (16:30 - 60 min), so the
    # last driver event's own session (ends 17:00) can never be
    # emitted. (The 14:30 session MAY appear: AvailableNow can run a
    # trailing no-data micro-batch whose watermark evicts it — racy,
    # so no assertion either way.)
    assert (9, "2024-01-01 16:30:00") not in got
