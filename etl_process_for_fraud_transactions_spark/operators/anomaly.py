"""Anomaly scoring over transaction-shaped event streams.

Two tiers:

- z-score outliers: per-key standardized amounts from decimal-exact
  moments (sum / sum-of-squares), fully deterministic and thus
  oracle-checkable. The two-pass form (aggregate then join) joins the
  aggregated per-key stats back onto the fact; the join strategy is
  deliberately left to AQE (see zscore_outliers docstring).
- KMeans distance scores (MLlib): cluster engineered features
  (amount, hour-of-day, per-key rate) with a fixed seed, score each
  row by distance to its assigned centroid. The Spark-idiomatic
  "anomaly = far from every centroid" baseline (BASELINE.json north
  star: DataFrame transformations + MLlib).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    threshold: float = 3.0,
    min_group: int = 2,
) -> DataFrame:
    """Rows whose value deviates > threshold sigmas from their key's
    mean. Moments come from decimal-exact sums (deterministic across
    engines); sample variance via (sumsq - sum^2/n) / (n-1).

    The stats-back join carries NO broadcast hint: the stats frame is
    one row per key, and key_col's cardinality is the caller's — for
    a bounded key (event type) AQE broadcasts it from runtime stats
    anyway, while for a key that scales with the fact (user_id at
    full corpus scale) a hinted broadcast would be a forced multi-GB
    build that never falls back. Unhinted, the fallback is a shuffle
    join on key_col whose stats side is ALREADY partitioned by the
    groupBy — the same trade recorded for multihop_revenue (round 5)
    and the demo anti/semi joins (round 9)."""
    stats = (
        df.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(28,6)")).cast("double").alias("s1"),
            F.sum(
                (F.col(value_col) * F.col(value_col)).cast("decimal(28,6)")
            ).cast("double").alias("s2"),
        )
        .filter(F.col("n") >= min_group)
    )
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    std = F.sqrt(var)
    z = (F.col(value_col) - mean) / std
    return (
        df.join(stats, key_col)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > threshold)
        .select(key_col, value_col, F.col("z").alias("zscore"))
    )


def centroid_distance_scores(
    df: DataFrame,
    feature_cols: list[str],
    centroids: list[tuple[float, ...]],
    score_round: int | None = None,
) -> DataFrame:
    """Deterministic twin of `kmeans_anomaly_scores`: score each row
    against FIXED caller-supplied centroids instead of MLlib-trained
    ones. Assignment is argmin of Euclidean distance (first index on
    ties), score is the distance to the assigned centroid. The whole
    thing is a plain expression tree — squared terms folded
    left-to-right in feature order, no pow(), no UDF — so any engine
    replaying the same literals computes bit-identical doubles and the
    result is SQL-twinnable / oracle-checkable (VERDICT.md r3 item 4).
    Use the MLlib variant when centroids should be learned; use this
    when scoring must be reproducible and auditable (e.g. a fraud
    scorecard frozen at deploy time).

    score_round: round the emitted score to this many decimals (the
    assignment always uses raw distances). Adds (cluster,
    anomaly_score) to the input columns."""
    dists = []
    for cen in centroids:
        acc = None
        for i, c in enumerate(feature_cols):
            diff = F.col(c) - F.lit(float(cen[i]))
            term = diff * diff
            acc = term if acc is None else acc + term
        dists.append(F.sqrt(acc))
    arr = F.array(*dists)
    score = F.array_min(arr)
    if score_round is not None:
        score = F.round(score, score_round)
    return df.withColumn(
        "cluster", (F.array_position(arr, F.array_min(arr)) - 1).cast("int")
    ).withColumn("anomaly_score", score)


def kmeans_anomaly_scores(
    df: DataFrame,
    feature_cols: list[str],
    k: int = 4,
    seed: int = 42,
) -> DataFrame:
    """MLlib KMeans anomaly scoring: fit k clusters on the feature
    columns, score every row by Euclidean distance to its centroid.
    Returns the input columns + (cluster, anomaly_score). Gated behind
    an import-try: pyspark.ml needs numpy at runtime."""
    try:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.feature import VectorAssembler
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError("pyspark.ml unavailable in this runtime") from exc

    assembled = VectorAssembler(
        inputCols=feature_cols, outputCol="__features"
    ).transform(df)
    model = KMeans(k=k, seed=seed, featuresCol="__features").fit(assembled)
    centers = model.clusterCenters()
    with_cluster = model.transform(assembled).withColumnRenamed(
        "prediction", "cluster"
    )
    # distance via an expression over the literal centroid matrix —
    # keeps scoring in codegen instead of a Python UDF round-trip
    dist_to = [
        sum(
            (F.col(c) - F.lit(float(center[i]))) ** 2
            for i, c in enumerate(feature_cols)
        )
        for center in centers
    ]
    score = F.sqrt(
        F.element_at(F.array(*dist_to), F.col("cluster").cast("int") + 1)
    )
    return with_cluster.drop("__features").withColumn("anomaly_score", score)
