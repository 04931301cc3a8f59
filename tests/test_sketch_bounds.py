"""Quantitative bounds for the rows-only (no-SQL-oracle) queries:

- approx_sketch_stats: HLL++ distinct counts within the configured
  rsd of the exact counts; percentile_approx values within the
  documented rank-error bound (n/accuracy) of the exact order
  statistics.
- kmeans_anomaly_scores: planted far outliers receive the top anomaly
  scores on a fixture with known cluster structure.

These turn the driver's rows-only checks into falsifiable accuracy
contracts (VERDICT.md r2 item 6).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_process_for_fraud_transactions_spark.plans import QUERIES

from .conftest import SF_SMALL


def test_approx_sketch_stats_verdicts_all_true(spark):
    """The registered query's hash-checked contract: every bound
    verdict TRUE and the exact counts right."""
    rows = QUERIES["approx_sketch_stats"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.users_within_bound, r
        assert r.p50_within_bound and r.p90_within_bound and r.p99_within_bound, r


def test_approx_sketch_stats_within_bounds(spark):
    """Finer instrument than the registered verdicts: replay the raw
    sketches and pin them to the documented rank-error bounds."""
    from etl_process_for_fraud_transactions_spark.sources.testdata import (
        load_events as _load_events,
    )

    ev = _load_events(spark, SF_SMALL)
    approx = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.percentile_approx("value", [0.5, 0.9, 0.99], 10_000).alias("pcts"),
        )
        .select(
            "event_type",
            "approx_users",
            F.element_at("pcts", 1).alias("p50_approx"),
            F.element_at("pcts", 2).alias("p90_approx"),
            F.element_at("pcts", 3).alias("p99_approx"),
        )
        .collect()
    }
    exact = {
        r.event_type: r
        for r in QUERIES["value_percentiles_per_type"](spark, SF_SMALL).collect()
    }
    assert set(approx) == set(exact) and approx

    # exact per-type sorted values for the rank-error bound
    from etl_process_for_fraud_transactions_spark.sources.testdata import load_events

    values = {}
    for r in (
        load_events(spark, SF_SMALL)
        .groupBy("event_type")
        .agg(F.sort_array(F.collect_list("value")).alias("vals"))
        .collect()
    ):
        values[r.event_type] = r.vals

    for et, a in approx.items():
        e = exact[et]
        # HLL++ with rsd=0.02: allow 5 standard errors
        assert abs(a.approx_users - e.n_users) <= max(5 * 0.02 * e.n_users, 1.0), et

        # percentile_approx(accuracy=10_000) guarantees rank error
        # <= n/accuracy: the approx value must fall between the order
        # statistics at rank floor(q*n)-d-1 and ceil(q*n)+d
        vals = values[et]
        n = len(vals)
        d = math.ceil(n / 10_000)
        for q, approx_v in ((0.5, a.p50_approx), (0.9, a.p90_approx), (0.99, a.p99_approx)):
            lo = vals[max(0, math.floor(q * n) - d - 1)]
            hi = vals[min(n - 1, math.ceil(q * n) + d)]
            assert lo <= approx_v <= hi, (et, q, approx_v, lo, hi)


def test_centroid_distance_scores_known_answer(spark):
    """Fixed-centroid scorer: hand-computable assignments and
    distances, first-index tie-break."""
    from etl_process_for_fraud_transactions_spark.operators.anomaly import (
        centroid_distance_scores,
    )

    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 10.0, 0.0), (3, 5.0, 0.0), (4, 9.0, 12.0)],
        "row_id long, fx double, fy double",
    )
    out = {
        r.row_id: (r.cluster, r.anomaly_score)
        for r in centroid_distance_scores(
            df, ["fx", "fy"], [(0.0, 0.0), (10.0, 0.0)]
        ).collect()
    }
    assert out[1] == (0, 0.0)
    assert out[2] == (1, 0.0)
    assert out[3] == (0, 5.0)  # equidistant -> first centroid wins
    assert out[4] == (1, pytest.approx(math.hypot(1.0, 12.0)))


def test_kmeans_planted_outliers_score_highest(spark):
    pytest.importorskip("numpy")
    pytest.importorskip("pyspark.ml")
    from etl_process_for_fraud_transactions_spark.operators.anomaly import (
        kmeans_anomaly_scores,
    )

    import random

    rng = random.Random(3)
    rows = []
    rid = 0
    for cx, cy in ((0.0, 0.0), (10.0, 10.0), (0.0, 10.0)):
        for _ in range(60):
            rows.append((rid, cx + rng.gauss(0, 0.2), cy + rng.gauss(0, 0.2)))
            rid += 1
    # moderate outliers: far enough to dominate every inlier's score,
    # close enough that granting one its own centroid (and merging two
    # 60-point blobs) would RAISE total SSE — so k=3 keeps the blob
    # centroids and the planted rows stay outliers
    outlier_ids = {rid, rid + 1}
    rows.append((rid, 20.0, 20.0))
    rows.append((rid + 1, -12.0, -9.0))
    df = spark.createDataFrame(rows, "row_id long, fx double, fy double")

    scored = kmeans_anomaly_scores(df, ["fx", "fy"], k=3, seed=42)
    got = sorted(
        ((r.anomaly_score, r.row_id) for r in scored.collect()), reverse=True
    )
    top2 = {rid for _, rid in got[:2]}
    assert top2 == outlier_ids
    # separation: planted outliers score far above every inlier
    worst_outlier = got[1][0]
    best_inlier = got[2][0]
    assert worst_outlier > 10 * best_inlier
