"""Known-answer test for the gap-fill densifier."""

from __future__ import annotations

from etl_process_for_fraud_transactions_spark.operators.timeseries import (
    gap_fill_hourly,
)


def test_gap_fill_hourly(spark):
    events = spark.createDataFrame(
        [
            (1, "2024-01-01 10:15:00", 10.0),
            (1, "2024-01-01 10:45:00", 5.0),
            # 11:00 and 12:00 empty -> forward-filled with 15.0
            (1, "2024-01-01 13:05:00", 2.0),
            (2, "2024-01-01 09:30:00", 7.0),  # single-hour key: no fill rows
        ],
        "user_id long, ts string, value double",
    ).selectExpr("user_id", "cast(ts as timestamp_ntz) ts", "value")

    rows = {
        (r.user_id, str(r.hour_start)): (r.filled_sum, r.observed)
        for r in gap_fill_hourly(events).collect()
    }
    assert rows == {
        (1, "2024-01-01 10:00:00"): (15.0, True),
        (1, "2024-01-01 11:00:00"): (15.0, False),
        (1, "2024-01-01 12:00:00"): (15.0, False),
        (1, "2024-01-01 13:00:00"): (2.0, True),
        (2, "2024-01-01 09:00:00"): (7.0, True),
    }


def test_gap_fill_empty_input(spark):
    empty = spark.createDataFrame(
        [], "user_id long, ts timestamp_ntz, value double"
    )
    assert gap_fill_hourly(empty).count() == 0
