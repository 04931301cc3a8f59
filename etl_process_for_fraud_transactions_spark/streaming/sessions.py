"""Streaming session windows with late-data handling.

The streaming counterpart of operators.sessions: `F.session_window`
merges events into gap-based sessions incrementally, the watermark
bounds state (sessions older than the watermark are finalized and
dropped from the state store), and output lands per completed session.

At scale: state is partitioned by the grouping key across executors;
the watermark delay is the knob trading completeness under lateness
against state size. For custom per-key state machines beyond gap
sessions, `applyInPandasWithState` is the escape hatch — same
partitioning model, arbitrary Python state."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark_minutes: int = 60,
) -> DataFrame:
    """Per-session aggregates over a *streaming* DataFrame: session
    start/end, event count, value sum. Works identically on a batch
    frame (session_window is supported in both modes), which is how
    the unit test pins semantics against the batch sessionizer."""
    # watermarks require TIMESTAMP (with local tz); session tz is pinned
    # to UTC so the ntz -> ltz cast is wall-clock exact
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, f"{watermark_minutes} minutes")
        .groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes").alias("session"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            key_col,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
