"""Gap-based sessionization over event streams — the batch form of a
session window (SURVEY.md §2.10 notes the reference has no streaming;
this is the standard lag + cumulative-sum rewrite, one shuffle on the
user key, no stateful processing needed).

The same semantics in Structured Streaming is
`F.session_window(ts, gap)` — see streaming.filestream for the
ingestion seam."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.core import epoch_us


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    id_col: str = "event_id",
) -> DataFrame:
    """Assign a session_id (1-based per key) to every event: a new
    session starts when the gap to the previous event exceeds
    `gap_minutes`. Deterministic tie-break on id_col."""
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(id_col))
    gap_us = gap_minutes * 60 * 1_000_000
    prev_ts = F.lag(ts_col).over(w)
    new_session = F.when(
        prev_ts.isNull() | (epoch_us(F.col(ts_col)) - epoch_us(prev_ts) > gap_us), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id", F.sum(new_session).over(w)
    )


def session_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    id_col: str = "event_id",
) -> DataFrame:
    """Per-session aggregates: event count and duration in seconds
    (exact integer microsecond arithmetic)."""
    s = sessionize(df, key_col, ts_col, gap_minutes, id_col)
    return (
        s.groupBy(key_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                (F.max(epoch_us(F.col(ts_col))) - F.min(epoch_us(F.col(ts_col))))
                / F.lit(1_000_000)
            ).alias("duration_sec"),
        )
    )
