"""Time-series densification: per-key periodic spine + forward fill.

The hypertable-rollup shape (continuous per-key hourly series from
irregular events) has no single Spark primitive; this composes one
from sequence+explode and an ignore-nulls window — no UDFs, all
codegen. Downstream consumers (feature stores, trend models) index by
(key, hour) without handling holes.

Scale: the spine is generated, not shuffled — sequence+explode runs
map-side off each key's (min, max) bounds, so spine size is
O(keys x span/step) rows that never existed on disk. The fill is one
window per key (single shuffle on the key, same partitioning as the
rollup itself). A key with a years-long gap inflates only its own
partition; cap spans upstream if keys can be arbitrarily stale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gap_fill_hourly(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Dense per-key hourly series over [min hour, max hour] of each
    key, with sums forward-filled across empty hours.

    Returns (key, hour_start, filled_sum, observed): `filled_sum` is
    the hour's own sum where events exist, else the most recent
    earlier hour's sum; `observed` marks real vs filled rows. Decimal
    accumulation keeps the fill value hash-exact across engines.
    """
    hourly = events.groupBy(
        F.col(key_col), F.date_trunc("hour", ts_col).alias("hour_start")
    ).agg(F.sum(F.col(value_col).cast("decimal(18,4)")).cast("double").alias("hour_sum"))

    spine = (
        hourly.groupBy(key_col)
        .agg(F.min("hour_start").alias("h0"), F.max("hour_start").alias("h1"))
        .select(
            key_col,
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour_start"),
        )
    )

    w = (
        Window.partitionBy(key_col)
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spine.join(hourly, [key_col, "hour_start"], "left").select(
        key_col,
        "hour_start",
        F.last("hour_sum", ignorenulls=True).over(w).alias("filled_sum"),
        F.col("hour_sum").isNotNull().alias("observed"),
    )
