"""Event-pipeline query inventory: sessionization and anomaly scoring
(the MLlib north-star surface plus deterministic baselines)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.anomaly import centroid_distance_scores, zscore_outliers
from ..operators.sessions import session_stats
from ..sources.testdata import load_events
from .queries import query


@query(
    "user_sessions",
    """
    WITH marks AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS ns
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    sess AS (
        SELECT user_id, ts,
               -- BIGINT cast: DuckDB window SUM(int) yields HUGEINT,
               -- which pandas renders as float
               CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS BIGINT) AS session_id
        FROM marks
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) / 1000000.0 AS duration_sec
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap): lag + cumulative sum, one
    shuffle on the user key — the batch form of a session window."""
    ev = load_events(spark, sf_dir)
    return session_stats(ev, gap_minutes=30)


@query(
    "amount_zscore_outliers",
    """
    WITH stats AS (
        SELECT user_id, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE) AS s2
        FROM events GROUP BY user_id HAVING COUNT(*) >= 2
    )
    SELECT e.user_id AS user_id, e.value AS value,
           (e.value - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)) AS zscore
    FROM events e JOIN stats USING (user_id)
    WHERE abs((e.value - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1))) > 3.0
    """,
)
def amount_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user amount outliers beyond 3 sigma, from decimal-exact
    moments (deterministic baseline of the anomaly tier; the per-key
    stats broadcast back onto the fact)."""
    ev = load_events(spark, sf_dir).select("user_id", "value")
    return zscore_outliers(ev, "user_id", "value", threshold=3.0)


#: Frozen scorecard centroids over (amount, hour_of_day,
#: events_per_day) — the registered-literal quantizer both engines
#: replay: low-amount morning / low-amount evening / mid-amount /
#: high-amount (the anomalous tail; amounts top out near 490).
_SCORE_CENTROIDS: list[tuple[float, float, float]] = [
    (25.0, 6.0, 2.2),
    (25.0, 18.0, 2.6),
    (120.0, 12.0, 2.5),
    (400.0, 12.0, 2.5),
]


def _centroid_oracle_sql() -> str:
    d_exprs = []
    for cen in _SCORE_CENTROIDS:
        a, h, e = (repr(float(x)) for x in cen)
        d_exprs.append(
            f"sqrt((((amount - {a}) * (amount - {a}))"
            f" + ((hour_of_day - {h}) * (hour_of_day - {h})))"
            f" + ((events_per_day - {e}) * (events_per_day - {e})))"
        )
    ds = ", ".join(f"{ex} AS d{i}" for i, ex in enumerate(d_exprs))
    return f"""
    WITH rate AS (
        SELECT user_id, COUNT(*) / COUNT(DISTINCT CAST(ts AS DATE)) AS events_per_day
        FROM events GROUP BY user_id
    ),
    feats AS (
        SELECT e.event_id AS event_id, e.user_id AS user_id,
               e.value AS amount,
               CAST(hour(e.ts) AS DOUBLE) AS hour_of_day,
               r.events_per_day AS events_per_day
        FROM events e JOIN rate r USING (user_id)
    ),
    scored AS (SELECT event_id, user_id, {ds} FROM feats)
    SELECT event_id, user_id,
           CASE WHEN d0 <= d1 AND d0 <= d2 AND d0 <= d3 THEN 0
                WHEN d1 <= d2 AND d1 <= d3 THEN 1
                WHEN d2 <= d3 THEN 2
                ELSE 3 END AS cluster,
           round(least(d0, d1, d2, d3), 6) AS anomaly_score
    FROM scored
    """


@query("kmeans_anomaly_scores", _centroid_oracle_sql())
def kmeans_anomaly_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly scoring over engineered event features (amount,
    hour-of-day, per-user event rate) against the frozen scorecard
    centroids — distance math is deterministic and the DuckDB twin
    replays the identical literals/fold order, so the row is fully
    hash-checked (upgraded from rows-only, VERDICT.md r3 item 4). The
    CASE chain in the twin is exactly argmin-with-first-index-ties,
    matching array_position(arr, array_min(arr)). The MLlib-trained
    variant (operators/anomaly.py::kmeans_anomaly_scores) remains the
    engine default for learned centroids, pinned by the
    planted-outlier pytest."""
    ev = load_events(spark, sf_dir)
    rate = ev.groupBy("user_id").agg(
        (F.count(F.lit(1)) / F.countDistinct(F.to_date("ts"))).alias("events_per_day")
    )
    # no broadcast hint: `rate` is one row per user — it SCALES with
    # the fact, so a hinted broadcast is the forced multi-GB build
    # the round-9 demo-query fix removed; AQE re-derives the
    # broadcast from runtime stats at any SF where it actually fits
    feats = ev.join(rate, "user_id").select(
        "event_id",
        "user_id",
        F.col("value").alias("amount"),
        F.hour("ts").cast("double").alias("hour_of_day"),
        "events_per_day",
    )
    scored = centroid_distance_scores(
        feats,
        ["amount", "hour_of_day", "events_per_day"],
        _SCORE_CENTROIDS,
        score_round=6,
    )
    return scored.select("event_id", "user_id", "cluster", "anomaly_score")


@query(
    "hourly_gap_fill",
    """
    WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS hour_start,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS hour_sum
        FROM events GROUP BY 1, 2
    ),
    spine AS (
        SELECT user_id,
               unnest(generate_series(min(hour_start), max(hour_start), INTERVAL 1 HOUR)) AS hour_start
        FROM hourly GROUP BY user_id
    )
    SELECT s.user_id AS user_id, s.hour_start AS hour_start,
           last_value(h.hour_sum IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.hour_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum,
           h.hour_sum IS NOT NULL AS observed
    FROM spine s LEFT JOIN hourly h
      ON s.user_id = h.user_id AND s.hour_start = h.hour_start
    """,
)
def hourly_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user dense hourly series with forward fill
    (operators/timeseries.py::gap_fill_hourly): sequence+explode spine,
    ignore-nulls last() window — the hypertable-rollup shape."""
    from ..operators.timeseries import gap_fill_hourly

    return gap_fill_hourly(load_events(spark, sf_dir))
