"""Custom per-key stateful streaming via applyInPandasWithState.

The session/tumbling windows in streaming/sessions.py and
streaming/rules.py cover everything Spark's built-in stateful
operators express. This module is the escape hatch the reference's
rule 5 (brute-force PIN guessing, main.py:444-530) needs in a
*streaming* setting: "N consecutive REJECTs on one card" is a per-key
state machine — the streak counter must survive micro-batch
boundaries, which no built-in windowed aggregate expresses.

Two orderings are offered:

- ``exact_event_time_order=True`` (default): per-key events are
  buffered in state and folded into the streak only once the watermark
  has passed them, in event-time order. A late event that lands in a
  later micro-batch (but inside the watermark) is still counted in its
  true position. Alerts are therefore delayed by up to the watermark
  lag — the price of exactness on an out-of-order stream.
- ``exact_event_time_order=False``: fold rows in micro-batch arrival
  order (sorted within each batch). Exact when the source replays in
  time order (dated files, kafka per-partition); prompt but
  best-effort otherwise.

Scale model: state lives in the state store, partitioned by the
grouping key across executors exactly like a shuffle — one key's
state is the streak counter plus only the *pending* (above-watermark)
events, never the full history. The event-time timeout bounds state
size: a card silent past the watermark + expiry gap is flushed
(pending events finalized, remaining alerts emitted) and evicted, so
total state is O(active keys × watermark-lag density), not O(events
ever seen). Arrow batches move rows into Python in columnar chunks
(the slow path is amortized, not per-row).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

ALERT_SCHEMA = StructType(
    [
        StructField("card_num", LongType()),
        StructField("alert_ts", TimestampType()),
        StructField("streak", IntegerType()),
    ]
)

# (current streak length, epoch-us of the last finalized event, pending
#  above-watermark events as parallel arrays: epoch-us / trans_id / is-reject)
_STATE_SCHEMA = StructType(
    [
        StructField("streak", IntegerType()),
        StructField("last_us", LongType()),
        StructField("buf_us", ArrayType(LongType())),
        StructField("buf_id", ArrayType(LongType())),
        StructField("buf_rej", ArrayType(BooleanType())),
    ]
)


def _fold(events: list[tuple], streak: int, last_us: int, threshold: int, card_num):
    """Fold (us, trans_id, is_reject) events — already event-time
    sorted — into the streak counter; returns (alerts, streak, last_us)."""
    alerts: list[tuple] = []
    for us, _tid, is_rej in events:
        if is_rej:
            streak += 1
            if streak == threshold:
                alerts.append((card_num, pd.Timestamp(us * 1_000), streak))
        else:
            streak = 0
        last_us = us
    return alerts, streak, last_us


def _make_streak_fn(threshold: int, expiry_minutes: int, exact: bool):
    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (card_num,) = key
        streak, last_us, buf_us, buf_id, buf_rej = (
            state.get if state.exists else (0, 0, [], [], [])
        )
        pending = sorted(zip(buf_us or (), buf_id or (), buf_rej or ()))

        if state.hasTimedOut:
            # watermark passed last activity + expiry: every pending
            # event is final — flush any remaining alerts and evict.
            alerts, _, _ = _fold(pending, streak, last_us, threshold, card_num)
            state.remove()
            if alerts:
                yield pd.DataFrame(alerts, columns=["card_num", "alert_ts", "streak"])
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "trans_id"], kind="mergesort")
        fresh = [
            (int(pd.Timestamp(ts).value // 1_000), int(tid), result == "REJECT")
            for ts, tid, result in zip(
                batch["ts"], batch["trans_id"], batch["oper_result"]
            )
        ]

        if exact:
            # merge pending + fresh in event-time order and finalize only
            # the prefix the watermark has passed; the rest stays in
            # state so a late (within-watermark) arrival in a future
            # batch can still take its true position.
            events = sorted(pending + fresh)
            wm_us = state.getCurrentWatermarkMs() * 1_000
            final = [e for e in events if e[0] < wm_us]
            keep = [e for e in events if e[0] >= wm_us]
        else:
            # arrival-order fold. This mode never *writes* a pending
            # buffer, but one can be loaded from state if the query was
            # restarted from a checkpoint written with exact=True —
            # fold it first (event-time sorted) instead of silently
            # dropping those buffered events' streak contributions.
            final, keep = pending + fresh, []

        alerts, streak, last_us = _fold(final, streak, last_us, threshold, card_num)
        state.update(
            (
                streak,
                last_us,
                [e[0] for e in keep],
                [e[1] for e in keep],
                [e[2] for e in keep],
            )
        )
        # evict once the watermark passes the newest event by the expiry
        # gap (the no-data micro-batch after the last file fires this,
        # flushing still-pending events through the hasTimedOut branch)
        newest_us = max([last_us] + [e[0] for e in keep])
        state.setTimeoutTimestamp(newest_us // 1_000 + expiry_minutes * 60_000)
        if alerts:
            yield pd.DataFrame(alerts, columns=["card_num", "alert_ts", "streak"])

    return fn


def consecutive_reject_alerts(
    transactions: DataFrame,
    threshold: int = 3,
    watermark_minutes: int = 60,
    expiry_minutes: int = 120,
    exact_event_time_order: bool = True,
) -> DataFrame:
    """Emit one alert per card on its `threshold`-th consecutive REJECT
    (streaming analog of the reference's brute-force rule,
    main.py:444-530, without the fixed 20-minute pairing window — the
    streak itself is the signal and the state machine is exact across
    micro-batches).

    With ``exact_event_time_order`` (default) the fold is watermark-
    gated: events above the watermark wait in per-key state, so
    out-of-order arrivals within the watermark are counted in true
    event-time order; alerts trail the watermark. Set it to False for
    prompt arrival-order folding when the source replays in time order.

    Input columns: card_num long, trans_id long, ts, oper_result string.
    """
    tx = transactions.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        tx.withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy("card_num")
        .applyInPandasWithState(
            _make_streak_fn(threshold, expiry_minutes, exact_event_time_order),
            outputStructType=ALERT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
