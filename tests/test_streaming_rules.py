"""Streaming rule 4: watermarked stream-stream self-join."""

from __future__ import annotations

import json

from etl_process_for_fraud_transactions_spark.streaming.rules import (
    streaming_diff_city_pairs,
)


def _write(src, name, rows):
    (src / name).write_text("\n".join(json.dumps(r) for r in rows))


def test_streaming_diff_city(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write(
        src,
        "e1.jsonl",
        [
            {"card_num": 1, "trans_id": 10, "trans_date": "2024-01-01 12:00:00", "terminal_city": "A"},
            {"card_num": 1, "trans_id": 11, "trans_date": "2024-01-01 12:30:00", "terminal_city": "B"},  # pair with 10
            {"card_num": 1, "trans_id": 12, "trans_date": "2024-01-01 15:00:00", "terminal_city": "C"},  # >1h from both
            {"card_num": 2, "trans_id": 20, "trans_date": "2024-01-01 12:10:00", "terminal_city": "A"},
            {"card_num": 2, "trans_id": 21, "trans_date": "2024-01-01 12:20:00", "terminal_city": "A"},  # same city
        ],
    )
    stream = spark.readStream.schema(
        "card_num long, trans_id long, trans_date timestamp_ntz, terminal_city string"
    ).json(str(src))
    out_path, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        streaming_diff_city_pairs(stream)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.card_num, r.trans_id_a, r.trans_id_b)
        for r in spark.read.parquet(out_path).collect()
    }
    assert got == {(1, 10, 11)}

    # a later file: new pair arrives within window of an OLD buffered row
    _write(
        src,
        "e2.jsonl",
        [
            {"card_num": 1, "trans_id": 13, "trans_date": "2024-01-01 15:30:00", "terminal_city": "D"},  # pairs with 12
        ],
    )
    q = (
        streaming_diff_city_pairs(
            spark.readStream.schema(
                "card_num long, trans_id long, trans_date timestamp_ntz, terminal_city string"
            ).json(str(src))
        )
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.card_num, r.trans_id_a, r.trans_id_b)
        for r in spark.read.parquet(out_path).collect()
    }
    assert got == {(1, 10, 11), (1, 12, 13)}  # state carried across runs
