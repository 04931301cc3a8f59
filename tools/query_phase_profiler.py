#!/usr/bin/env python
"""Per-phase wall breakdown for a registered driver row under a
DRIVER-LIKE plain session: plan construction (the query function call,
including any plan-time probes/persists), Catalyst analysis
(df.schema), optimization (optimizedPlan), physical planning
(executedPlan), and execution (noop sink) — the §1 instrument for
rows whose cost is suspected to be DRIVER-side (Catalyst over large
expression trees) rather than data work.

Usage: python tools/query_phase_profiler.py [sf_dir] row [row ...]
Reps via SPARK_GRAFT_ROW_REPS (default 3). Note the noop write builds
its own QueryExecution, so `exec` includes a second analysis/planning
pass of the same tree — the phase columns are a breakdown instrument,
not additive accounting.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    reps = int(os.environ.get("SPARK_GRAFT_ROW_REPS", "3"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("query-phase-profiler")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from etl_process_for_fraud_transactions_spark.plans import QUERIES

    for name in args:
        for r in range(reps):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            _ = df.schema  # forces analysis
            t2 = time.perf_counter()
            qe = df._jdf.queryExecution()
            _ = qe.optimizedPlan()
            t3 = time.perf_counter()
            _ = qe.executedPlan()
            t4 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t5 = time.perf_counter()
            print(
                f"{name} rep{r}: construct {t1 - t0:.2f}"
                f" analyze {t2 - t1:.2f} optimize {t3 - t2:.2f}"
                f" physplan {t4 - t3:.2f} exec {t5 - t4:.2f}"
                f" TOTAL {t5 - t0:.2f}",
                flush=True,
            )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
