"""Streaming fraud rules: the reference's batch event-time windows
(SURVEY.md §2.10) expressed as true Structured Streaming operators.

Rule 4 ("same card, different cities, within one hour",
main.py:428-436) becomes a watermarked stream-stream self-join: both
sides buffer rows in the state store, the time-interval join condition
bounds how long a row must be retained, and the watermark evicts
state older than the interval — the streaming analog of the batch
bucketed self-join, with the same pairing semantics.

State sizing at scale: each side retains up to (watermark delay +
window) of events per card — exactly the bucket-density bound of the
batch rewrite, so hot cards cost window-density, not history."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_diff_city_pairs(
    city_events: DataFrame,
    window_minutes: int = 60,
    watermark_minutes: int = 120,
) -> DataFrame:
    """Pairs of same-card different-city transactions within the
    window, from a streaming frame with columns
    (card_num, trans_id, trans_date, terminal_city).

    Emits each ordered pair once (a.trans_id < b.trans_id de-dups the
    symmetric match); downstream consumers dedup per transaction as the
    batch rule does with DISTINCT."""
    base = city_events.withColumn(
        "trans_date", F.col("trans_date").cast("timestamp")
    ).withWatermark("trans_date", f"{watermark_minutes} minutes")
    a = base.alias("a")
    # second branch of the self-join: the watermark propagates through
    # the projection — re-declaring it on the same lineage is an error
    b = base.select(
        F.col("card_num").alias("b_card_num"),
        F.col("trans_id").alias("b_trans_id"),
        F.col("trans_date").alias("b_trans_date"),
        F.col("terminal_city").alias("b_terminal_city"),
    ).alias("b")
    w = f"interval {window_minutes} minutes"
    return a.join(
        b,
        F.expr(
            f"""
            card_num = b_card_num
            AND terminal_city != b_terminal_city
            AND trans_id < b_trans_id
            AND b_trans_date BETWEEN trans_date - {w} AND trans_date + {w}
            """
        ),
        "inner",
    ).select(
        F.col("card_num"),
        F.col("trans_id").alias("trans_id_a"),
        F.col("b_trans_id").alias("trans_id_b"),
        F.col("trans_date").alias("ts_a"),
        F.col("b_trans_date").alias("ts_b"),
        F.col("terminal_city").alias("city_a"),
        F.col("b_terminal_city").alias("city_b"),
    )
