#!/usr/bin/env python
"""Capture `.explain("formatted")` (executed, AQE-final where
applicable) for named driver rows into plans/r16/<query>_<tag>.txt —
the optimization round's before/after plan evidence.

Usage: python tools/capture_plans_r16.py <tag> <out_dir> [query ...]
Run from a checkout whose plans registry you want to capture (the
pre-round worktree for `before`, HEAD for `after`).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "pricing_summary",
    "multihop_revenue",
    "diff_city_short_time",
    "brute_force_hits",
    "fraud_report",
    "user_sessions",
    "amount_zscore_outliers",
    "dedup_exact_survivors",
    "text_quality_stats",
    "ann_cosine_topk",
    "top_orders_per_customer",
    "grouped_result_mix",
    "bm25_topk_docs",
    "ivf_cosine_topk",
    "neardup_incremental_filter",
    "url_curation",
    "scd2_replay",
    "minhash_near_duplicates",
    "simhash_near_duplicates",
    "lsh_embedding_neighbors",
    "corpus_curation_pipeline",
    "corpus_health_report",
    "document_chunks",
    "brute_force_hits_dense",
]


def main() -> None:
    tag = sys.argv[1]
    out_dir = sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_PLANS", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"capture-plans-{tag}")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from etl_process_for_fraud_transactions_spark.plans import QUERIES

    for name in names:
        df = QUERIES[name](spark, sf_dir)
        # execute through the DataFrame's own QueryExecution so the
        # AdaptiveSparkPlan finalizes (tools/explain_plans.py note)
        df.collect()
        qe = df._jdf.queryExecution()
        text = (
            f"# {name} [{tag}] formatted physical plan (sf0.01, "
            "driver-like plain local[8] session)\n\n"
            + qe.explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            + "\n\n== executed (AQE-final) ==\n"
            + qe.executedPlan().toString().split("== Initial Plan ==")[0]
        )
        text = re.sub(
            r"[\x00-\x08\x0b\x0c\x0e-\x1f]",
            lambda m: f"\\x{ord(m.group(0)):02x}",
            text,
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(text)
        print(f"wrote {name}_{tag}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
