"""Known-answer tests for sessionization and anomaly scoring."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import types as T

from etl_process_for_fraud_transactions_spark.operators.anomaly import (
    kmeans_anomaly_scores,
    zscore_outliers,
)
from etl_process_for_fraud_transactions_spark.operators.sessions import (
    session_stats,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_sessionize_gap_splits(spark):
    rows = [
        (1, 7, T0),
        (2, 7, T0 + dt.timedelta(minutes=10)),   # same session
        (3, 7, T0 + dt.timedelta(minutes=50)),   # 40-min gap -> new session
        (4, 7, T0 + dt.timedelta(minutes=55)),
        (5, 8, T0),                               # other user independent
    ]
    out = {r.event_id: r.session_id for r in sessionize(_events(spark, rows)).collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_sessionize_boundary_exactly_gap(spark):
    rows = [(1, 7, T0), (2, 7, T0 + dt.timedelta(minutes=30))]  # == gap: same session
    out = {r.event_id: r.session_id for r in sessionize(_events(spark, rows)).collect()}
    assert out == {1: 1, 2: 1}


def test_session_stats(spark):
    rows = [
        (1, 7, T0),
        (2, 7, T0 + dt.timedelta(minutes=10)),
        (3, 7, T0 + dt.timedelta(minutes=50)),
    ]
    stats = {
        (r.user_id, r.session_id): (r.n_events, r.duration_sec)
        for r in session_stats(_events(spark, rows)).collect()
    }
    assert stats == {(7, 1): (2, 600.0), (7, 2): (1, 0.0)}


def test_zscore_outliers(spark):
    rows = [(1, float(v)) for v in [10, 11, 9, 10, 11, 9, 10, 100]]
    df = spark.createDataFrame(
        [(k, v) for k, v in rows], "user_id long, value double"
    )
    out = zscore_outliers(df, "user_id", "value", threshold=2.0).collect()
    assert len(out) == 1 and out[0].value == 100.0 and out[0].zscore > 2


def test_zscore_small_groups_skipped(spark):
    df = spark.createDataFrame([(1, 5.0)], "user_id long, value double")
    assert zscore_outliers(df, "user_id", "value").count() == 0


def test_kmeans_anomaly_scores(spark):
    try:
        import numpy  # noqa: F401
    except ImportError:
        pytest.skip("numpy required for pyspark.ml")
    # three tight clusters + an outlier near (but not in) the third —
    # far enough to be anomalous, close enough that giving it its own
    # centroid would cost more SSE than merging clusters
    rows = (
        [(i, 0.0 + i * 0.01, 1.0) for i in range(10)]
        + [(i + 10, 100.0 + i * 0.01, 1.0) for i in range(10)]
        + [(i + 20, 200.0 + i * 0.01, 1.0) for i in range(10)]
        + [(99, 260.0, 1.0)]
    )
    df = spark.createDataFrame(rows, "id long, x double, y double")
    scored = kmeans_anomaly_scores(df, ["x", "y"], k=3, seed=42)
    top = scored.orderBy(scored.anomaly_score.desc()).first()
    assert top.id == 99  # the planted outlier has the max distance
    # determinism: same seed -> same clusters
    again = kmeans_anomaly_scores(df, ["x", "y"], k=3, seed=42)
    a = sorted((r.id, r.cluster) for r in scored.collect())
    b = sorted((r.id, r.cluster) for r in again.collect())
    assert a == b
