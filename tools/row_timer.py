#!/usr/bin/env python
"""Time individual registered driver rows under a DRIVER-LIKE plain
session (default 200 shuffle partitions, none of our confs) — the
sandbox for right-sizing in-row maintenance cycles (VERDICT r14
directive #2) without guessing from the full-sweep number.

Usage: python tools/row_timer.py [sf_dir] row [row ...]   (reps via
SPARK_GRAFT_ROW_REPS, default 1)
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
    reps = int(os.environ.get("SPARK_GRAFT_ROW_REPS", "1"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("row-timer")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from etl_process_for_fraud_transactions_spark.plans import QUERIES

    rows = args or list(QUERIES)
    for name in rows:
        for r in range(reps):
            t0 = time.perf_counter()
            n = QUERIES[name](spark, sf_dir).count()
            print(
                f"{name} rep{r}: {time.perf_counter() - t0:.2f} s"
                f" ({n} rows)",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
