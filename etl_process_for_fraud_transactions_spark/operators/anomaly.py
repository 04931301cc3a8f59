"""Anomaly scoring over transaction-shaped event streams.

Two tiers:

- z-score outliers: per-key standardized amounts from decimal-exact
  moments (sum / sum-of-squares), fully deterministic and thus
  oracle-checkable. The two-pass form (aggregate then join) is a
  broadcast join of tiny per-key stats back onto the fact — the fact
  itself never reshuffles.
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
    engines); sample variance via (sumsq - sum^2/n) / (n-1)."""
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
        df.join(F.broadcast(stats), key_col)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > threshold)
        .select(key_col, value_col, F.col("z").alias("zscore"))
    )


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
