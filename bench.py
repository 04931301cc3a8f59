#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs each headline query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized through the noop sink: full computation on
the executors, no driver-side collect skewing the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "multihop_revenue",
    "top_orders_per_customer",
    "grouped_result_mix",
    "diff_city_short_time",
    "brute_force_candidates",
    "brute_force_hits",
    "fraud_report",
    "user_sessions",
    "amount_zscore_outliers",
    "dedup_exact_survivors",
    "text_quality_stats",
    "ann_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = sf

    from etl_process_for_fraud_transactions_spark.plans import QUERIES
    from etl_process_for_fraud_transactions_spark.session import get_spark

    spark = get_spark("etl-fraud-bench")
    # Warm-up: run each headline plan once at the smallest SF so
    # whole-stage codegen compiles and the JVM JIT warms before
    # measurement (identical plan shapes -> Janino cache hits). The
    # reported numbers are steady-state wall times at the target SF.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            if name in QUERIES:
                QUERIES[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_num,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
