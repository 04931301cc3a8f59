"""Streaming exact dedup for at-least-once sources.

Kafka/file replay delivers duplicates; `dropDuplicatesWithinWatermark`
keeps one row per key while holding state only until the watermark
passes the key's event time — state is O(keys per watermark window),
not O(keys ever seen), which is what makes exactly-once-by-key viable
on an unbounded stream. The batch twin is operators/dedup.py
(dedup_exact / dedup_against_corpus): same key discipline, unbounded
retention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark_minutes: int = 60,
) -> DataFrame:
    """One row per key within the watermark horizon. A duplicate
    arriving later than `watermark_minutes` after the original's event
    time may be re-emitted (its state was already evicted) — the
    standard completeness/state-size trade; size the watermark to the
    source's real replay window."""
    key_cols = key_cols or ["event_id"]
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events.withWatermark(ts_col, f"{watermark_minutes} minutes").dropDuplicatesWithinWatermark(key_cols)
