"""Custom per-key stateful streaming via applyInPandasWithState.

The session/tumbling windows in streaming/sessions.py and
streaming/rules.py cover everything Spark's built-in stateful
operators express. This module is the escape hatch the reference's
rule 5 (brute-force PIN guessing, main.py:444-530) needs in a
*streaming* setting: "N consecutive REJECTs on one card" is a per-key
state machine — the streak counter must survive micro-batch
boundaries, which no built-in windowed aggregate expresses.

Scale model: state lives in the state store, partitioned by the
grouping key across executors exactly like a shuffle — one key's
state is one small tuple, never a buffer of raw events. The event-time
timeout bounds state size: a card silent past the watermark + expiry
gap is finalized and evicted, so total state is O(active keys), not
O(keys ever seen). Arrow batches move rows into Python in columnar
chunks (the slow path is amortized, not per-row).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
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

# (current streak length, epoch-us of the last event folded into it)
_STATE_SCHEMA = StructType(
    [StructField("streak", IntegerType()), StructField("last_us", LongType())]
)


def _make_streak_fn(threshold: int, expiry_minutes: int):
    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (card_num,) = key
        if state.hasTimedOut:
            state.remove()
            return
        streak, last_us = state.get if state.exists else (0, 0)

        batch = pd.concat(list(pdfs), ignore_index=True)
        # micro-batch rows arrive unordered; event-time order within the
        # batch is restored here. Cross-batch order is the arrival order
        # of micro-batches — exact when the source replays in time order
        # (dated files, kafka per-partition), best-effort otherwise.
        batch = batch.sort_values(["ts", "trans_id"], kind="mergesort")

        alerts: list[tuple] = []
        for ts, trans_id, result in zip(
            batch["ts"], batch["trans_id"], batch["oper_result"]
        ):
            if result == "REJECT":
                streak += 1
                if streak == threshold:
                    alerts.append((card_num, ts, streak))
            else:
                streak = 0
            last_us = int(pd.Timestamp(ts).value // 1_000)

        state.update((streak, last_us))
        # evict once the watermark passes the last event by the expiry gap
        state.setTimeoutTimestamp(last_us // 1_000 + expiry_minutes * 60_000)
        if alerts:
            yield pd.DataFrame(alerts, columns=["card_num", "alert_ts", "streak"])

    return fn


def consecutive_reject_alerts(
    transactions: DataFrame,
    threshold: int = 3,
    watermark_minutes: int = 60,
    expiry_minutes: int = 120,
) -> DataFrame:
    """Emit one alert per card the moment its `threshold`-th consecutive
    REJECT arrives (streaming analog of the reference's brute-force
    rule, main.py:444-530, without the fixed 20-minute pairing window —
    the streak itself is the signal and the state machine is exact
    across micro-batches).

    Input columns: card_num long, trans_id long, ts, oper_result string.
    """
    tx = transactions.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        tx.withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy("card_num")
        .applyInPandasWithState(
            _make_streak_fn(threshold, expiry_minutes),
            outputStructType=ALERT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
