#!/usr/bin/env python
"""Planted hot-key skew measurement for the bucketed self-joins.

Builds a fixture from the sf0.1 events table with ONE pathological
card holding N_HOT (default 10,000) events inside a single one-hour
window — the shape where an unsalted (key, bucket) join does all
~N_HOT^2 pair comparisons in one reducer partition while every other
partition sits idle — then times the 1-hour abs-window self-join
unsalted (AQE path) and with salt='auto' (runtime-derived scatter).

Prints one JSON line:
  {"metric": "hot_key_abs_window_join", "n_hot": ..., "pairs": ...,
   "unsalted_sec": ..., "auto_salted_sec": ..., "salt_factor": ...}

The recorded numbers live in BASELINE.md ("Skew" table); the plan
invariant (salted straggler bounded) is pinned by
tests/test_skew.py::test_auto_salt_bounds_straggler_partition.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_HOT = int(os.environ.get("SPARK_GRAFT_SKEW_N_HOT", "10000"))
WINDOW_US = 60 * 60 * 1_000_000  # 1 hour


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from etl_process_for_fraud_transactions_spark.operators.rangejoin import (
        bucketed_abs_window_self_join,
    )
    from etl_process_for_fraud_transactions_spark.session import get_spark
    from etl_process_for_fraud_transactions_spark.sources.testdata import load_events

    spark = get_spark("etl-fraud-skew-bench")

    # background load: real event traffic, one event-card per user
    base = load_events(spark, sf_dir).select(
        F.col("user_id").cast("long").alias("card_num"), "ts"
    )
    # the hot card: N_HOT events spread deterministically inside one
    # hour, bucket-aligned so every pair lands in one (key, bucket)
    hot = spark.range(N_HOT).select(
        F.lit(999_999_999).alias("card_num"),
        (
            F.to_timestamp(F.lit("2024-06-01 12:00:00"))
            + F.make_dt_interval(secs=(F.col("id") % 3600).cast("double"))
        ).cast("timestamp_ntz").alias("ts"),
    )
    df = base.unionByName(hot).persist()
    df.count()  # materialize the input out of the measurement

    # three configs: AQE skew-split ON is the engine default (it
    # sub-splits even a single hot key's partition for inner joins);
    # skew-split OFF shows the naive single-straggler cost — the
    # regime explicit salting exists for (streaming joins, engines or
    # plans where adaptive re-splitting is unavailable); salted runs
    # with skew-split off to isolate what the scatter itself buys.
    cases = (
        ("unsalted_aqe_skew", None, "true"),
        ("unsalted_no_skew_split", None, "false"),
        ("auto_salted_no_skew_split", "auto", "false"),
    )
    import statistics

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    samples: dict[str, list[float]] = {label: [] for label, _, _ in cases}
    pairs: dict[str, int] = {}
    # round-robin reps (A,B,C,A,B,C) so a transient load spike inflates
    # at most one sample per config; median reported
    for _ in range(max(reps, 1)):
        for label, salt, skew_conf in cases:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_conf)
            out = bucketed_abs_window_self_join(
                df, ["card_num"], "ts", WINDOW_US, salt=salt
            )
            t0 = time.perf_counter()
            pairs[label] = out.count()
            samples[label].append(time.perf_counter() - t0)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    results = {
        label: round(statistics.median(ts), 3) for label, ts in samples.items()
    }
    spread = {
        label: [round(min(ts), 3), round(max(ts), 3)]
        for label, ts in samples.items()
    }

    assert len(set(pairs.values())) == 1, pairs

    from etl_process_for_fraud_transactions_spark.operators.rangejoin import (
        AUTO_SALT_PAIR_BUDGET,
        _resolve_salt,
    )

    left = df.withColumn(
        "__bucket",
        F.floor(
            (F.unix_timestamp("ts").cast("long") * 1_000_000) / F.lit(WINDOW_US)
        ),
    )
    factor = _resolve_salt(left, ["card_num"], "auto", AUTO_SALT_PAIR_BUDGET)

    print(
        json.dumps(
            {
                "metric": "hot_key_abs_window_join",
                "n_hot": N_HOT,
                "n_rows": df.count(),
                "pairs": pairs["unsalted_aqe_skew"],
                "timings_sec": results,
                "spread": spread,
                "salt_factor": factor,
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
