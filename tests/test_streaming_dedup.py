"""dropDuplicatesWithinWatermark: duplicates across micro-batches
inside the watermark horizon are suppressed."""

from __future__ import annotations

import json

from etl_process_for_fraud_transactions_spark.streaming.dedup import streaming_dedup

SCHEMA = "event_id long, ts timestamp_ntz, user_id long"


def _write(src, name, rows):
    (src / name).write_text("\n".join(json.dumps(r) for r in rows))


def _run(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        streaming_dedup(stream, ["event_id"], watermark_minutes=60)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(r.event_id for r in spark.read.parquet(out).collect())


def test_duplicates_across_batches_suppressed(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    _write(
        src,
        "b1.jsonl",
        [
            {"event_id": 1, "ts": "2024-01-01 10:00:00", "user_id": 5},
            {"event_id": 1, "ts": "2024-01-01 10:00:00", "user_id": 5},  # in-batch dup
            {"event_id": 2, "ts": "2024-01-01 10:01:00", "user_id": 6},
        ],
    )
    assert _run(spark, src, out, ckpt) == [1, 2]

    # replayed event 2 in a later run, within the watermark: suppressed
    _write(
        src,
        "b2.jsonl",
        [
            {"event_id": 2, "ts": "2024-01-01 10:01:00", "user_id": 6},
            {"event_id": 3, "ts": "2024-01-01 10:02:00", "user_id": 7},
        ],
    )
    assert _run(spark, src, out, ckpt) == [1, 2, 3]
