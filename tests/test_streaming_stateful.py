"""applyInPandasWithState: consecutive-REJECT streak detector.

Semantics pinned three ways: a hand-built fixture with known alert
points, state carry-over across two checkpointed runs (the streak
spans a micro-batch boundary), and a late-arrival fixture where only
the watermark-gated exact mode counts events in true order.

Exact mode finalizes events only once the watermark passes them, so
each fixture carries a far-future sentinel row (an unused card) that
advances the watermark; pending events then flush through the
event-time timeout in the trailing no-data micro-batch."""

from __future__ import annotations

import json
import os

from etl_process_for_fraud_transactions_spark.streaming.stateful import (
    consecutive_reject_alerts,
)

SCHEMA = "card_num long, trans_id long, ts timestamp_ntz, oper_result string"

# watermark-advancing sentinel: far future, unused card, never alerts
SENTINEL = {"card_num": 99, "trans_id": 99_999, "ts": "2024-01-03 00:00:00", "oper_result": "SUCCESS"}


def _write(src, name, rows, mtime=None):
    p = src / name
    p.write_text("\n".join(json.dumps(r) for r in rows))
    if mtime is not None:
        os.utime(p, (mtime, mtime))


def _run(spark, src, out_path, ckpt, threshold=3, **kw):
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        consecutive_reject_alerts(stream, threshold=threshold, **kw)
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
            SENTINEL,
        ],
    )
    got = _run(spark, src, str(tmp_path / "out"), str(tmp_path / "ck"))
    assert got == {(1, "2024-01-01 10:05:00", 3)}


def test_streak_prompt_arrival_order_mode(spark, tmp_path):
    """exact_event_time_order=False emits in the data batch itself — no
    sentinel / watermark advance needed (time-ordered replay contract)."""
    src = tmp_path / "in"
    src.mkdir()
    _write(
        src,
        "t1.jsonl",
        [
            {"card_num": 1, "trans_id": 10, "ts": "2024-01-01 10:00:00", "oper_result": "REJECT"},
            {"card_num": 1, "trans_id": 11, "ts": "2024-01-01 10:01:00", "oper_result": "REJECT"},
            {"card_num": 1, "trans_id": 12, "ts": "2024-01-01 10:02:00", "oper_result": "REJECT"},
        ],
    )
    got = _run(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ck"),
        exact_event_time_order=False,
    )
    assert got == {(1, "2024-01-01 10:02:00", 3)}


def test_streak_matches_model_across_forced_micro_batches(spark, tmp_path):
    """Seeded random event stream, split ts-ordered into 4 files forced
    through separate micro-batches (maxFilesPerTrigger=1): alerts must
    equal a naive single-pass model — the state machine is exact across
    batch boundaries wherever they fall."""
    import random

    rng = random.Random(42)
    events = []
    t = 0
    for trans_id in range(200):
        t += rng.randint(10, 120)
        events.append(
            {
                "card_num": rng.randint(1, 8),
                "trans_id": trans_id,
                "ts": f"2024-01-01 {t // 3600:02d}:{t % 3600 // 60:02d}:{t % 60:02d}",
                "oper_result": rng.choice(["REJECT", "SUCCESS"]),
            }
        )

    # naive model: per card in global ts order, streak resets on SUCCESS
    expected = set()
    streaks: dict[int, int] = {}
    for e in events:
        if e["oper_result"] == "REJECT":
            streaks[e["card_num"]] = streaks.get(e["card_num"], 0) + 1
            if streaks[e["card_num"]] == 3:
                expected.add((e["card_num"], e["ts"], 3))
        else:
            streaks[e["card_num"]] = 0

    src = tmp_path / "in"
    src.mkdir()
    for i in range(4):
        # the file source orders micro-batches by modification time;
        # sub-ms writes tie and break the time-ordered-replay contract,
        # so pin strictly increasing mtimes
        _write(src, f"part{i}.jsonl", events[i * 50 : (i + 1) * 50], 1_700_000_000 + i * 10)
    _write(src, "part4.jsonl", [SENTINEL], 1_700_000_040)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        consecutive_reject_alerts(stream, threshold=3)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.card_num, str(r.alert_ts), r.streak)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == expected


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
        1_700_000_000,
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
            SENTINEL,
        ],
        1_700_000_010,
    )
    got = _run(spark, src, out, ckpt)
    assert got == {(7, "2024-01-01 09:02:00", 3)}


def test_late_event_counted_in_true_order(spark, tmp_path):
    """A SUCCESS that arrives one micro-batch late (but inside the
    watermark) must still break the streak at its event-time position.
    True order: R(10:00) R(10:01) S(10:02) R(10:03) -> no alert.
    Arrival order would see R R R first and fire a false alert."""
    src = tmp_path / "in"
    src.mkdir()
    _write(
        src,
        "early.jsonl",
        [
            {"card_num": 5, "trans_id": 1, "ts": "2024-01-01 10:00:00", "oper_result": "REJECT"},
            {"card_num": 5, "trans_id": 2, "ts": "2024-01-01 10:01:00", "oper_result": "REJECT"},
            {"card_num": 5, "trans_id": 4, "ts": "2024-01-01 10:03:00", "oper_result": "REJECT"},
        ],
        1_700_000_000,
    )
    _write(
        src,
        "late.jsonl",
        [
            # the missing SUCCESS arrives a batch late, within the watermark
            {"card_num": 5, "trans_id": 3, "ts": "2024-01-01 10:02:00", "oper_result": "SUCCESS"},
            SENTINEL,
        ],
        1_700_000_010,
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        consecutive_reject_alerts(stream, threshold=3)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.card_num, str(r.alert_ts), r.streak)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == set()


def test_mode_switch_restart_folds_pending_buffer(spark, tmp_path):
    """Restarting from a checkpoint written with exact=True using
    exact=False must fold the buffered (above-watermark) events into
    the streak instead of silently dropping them: two pending REJECTs
    from run 1 plus one fresh REJECT in run 2 -> alert at streak 3."""
    src = tmp_path / "in"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    # run 1 (exact): no sentinel, so the watermark never passes these
    # two REJECTs -> they stay in the per-key pending buffer
    _write(
        src,
        "t1.jsonl",
        [
            {"card_num": 1, "trans_id": 10, "ts": "2024-01-01 10:00:00", "oper_result": "REJECT"},
            {"card_num": 1, "trans_id": 11, "ts": "2024-01-01 10:01:00", "oper_result": "REJECT"},
        ],
    )
    got = _run(spark, src, out, ckpt, exact_event_time_order=True)
    assert got == set()  # still pending, nothing final

    # run 2 (arrival mode) on the SAME checkpoint: one more REJECT
    _write(
        src,
        "t2.jsonl",
        [
            {"card_num": 1, "trans_id": 12, "ts": "2024-01-01 10:02:00", "oper_result": "REJECT"},
        ],
    )
    got = _run(spark, src, out, ckpt, exact_event_time_order=False)
    assert got == {(1, "2024-01-01 10:02:00", 3)}
