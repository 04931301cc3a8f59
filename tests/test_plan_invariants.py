"""Physical-plan invariants for the headline queries — the properties
PLANS.md documents, pinned as tests so a regression in join strategy,
filter pushdown or shuffle count fails CI instead of silently shipping
a 100 TB-hostile plan.

All assertions run on the ANALYZED/physical plan string at sf0.001 —
plan shape, not data — so the suite is fast.
"""

from __future__ import annotations

import re

import pytest

from etl_process_for_fraud_transactions_spark.plans import QUERIES

from .conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMALL)
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_scan_pushdown(spark):
    plan = _plan(spark, "pricing_summary")
    # filter reaches the parquet scan; projection pruned to used columns
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    m = re.search(r"ReadSchema: struct<([^>]*)", plan)
    assert m and "l_comment" not in m.group(1)
    assert "l_quantity" in m.group(1)
    # no join, two-phase aggregate (partial + final)
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2


def test_multihop_revenue_hints_only_bounded_dims(spark):
    """Broadcast hints must sit ONLY on the bounded dims (nation: 25
    rows, region: 5) — never on fact-growth tables (orders, customer).
    A hinted broadcast does not fall back past
    autoBroadcastJoinThreshold, so a hint on a fact-sized side is a
    scale-killer by construction; those joins are left to AQE."""
    df = QUERIES["multihop_revenue"](spark, SF_SMALL)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    # exactly the two dim joins are hinted
    assert opt.count("strategy=broadcast") == 2
    # the fact-side joins (lineitem⋈orders on l_orderkey, ⋈customer on
    # o_custkey) carry no join hint of any kind
    for line in opt.splitlines():
        if "Join Inner, (l_orderkey" in line or "Join Inner, (o_custkey" in line:
            assert "Hint" not in line, line


def test_multihop_revenue_physical_shape(spark):
    # at test scale every side is under the threshold, so AQE still
    # picks broadcast for all joins at runtime — but now gracefully
    # (runtime stats), not forced by a hint that can't fall back
    df = QUERIES["multihop_revenue"](spark, SF_SMALL)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    final = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final


def test_no_broadcast_hint_on_fact_derived_frames(spark):
    """Round 9: the anti/semi-join demos and brute_force_hits derive
    their small side from a FACT table (events / transactions) — those
    frames scale with the data, so they must carry NO broadcast hint
    (a hint never falls back past autoBroadcastJoinThreshold; a 100×
    day would force a multi-GB broadcast and abort). AQE re-derives
    the broadcast from runtime stats instead."""
    # the pure anti/semi demos have no bounded dim anywhere — zero hints
    # no bounded dim anywhere in these rows — zero hints allowed:
    # the anti/semi demos (r9) and the anomaly tier (late r9: per-key
    # stats / per-user rate frames also scale with the fact)
    for name in (
        "orders_without_recent_events",
        "customers_with_high_value_events",
        "amount_zscore_outliers",
        "kmeans_anomaly_scores",
    ):
        df = QUERIES[name](spark, SF_SMALL)
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        assert "strategy=broadcast" not in opt, name
    # brute_force_hits keeps its bounded-dim hints (cards/accounts/
    # clients are SCD2 dims) but the hits-frame join (__hit_client)
    # must not be hinted
    opt = (
        QUERIES["brute_force_hits"](spark, SF_SMALL)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    for line in opt.splitlines():
        if "__hit_client" in line and "Join" in line:
            assert "strategy=broadcast" not in line, line


def test_fact_derived_joins_still_broadcast_via_aqe(spark):
    """...and at test scale AQE still picks broadcast for those sides
    at runtime — dropping the hint costs nothing when the side is
    genuinely small; it only removes the scale abort."""
    for name in (
        "orders_without_recent_events",
        "customers_with_high_value_events",
    ):
        df = QUERIES[name](spark, SF_SMALL)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        # AQE either broadcasts the runtime-small side, or — when the
        # filtered side is empty at this SF — eliminates the join
        # outright (EmptyRelation). Both beat a forced hint; what must
        # NOT appear is a shuffled sort-merge join.
        assert (
            "BroadcastHashJoin" in final or "EmptyRelation" in final
        ), name
        assert "SortMergeJoin" not in final, name


def test_no_cartesian_products_anywhere(spark):
    """CartesianProduct must never appear; BroadcastNestedLoopJoin only
    for the deliberate tiny-side cross joins (region grid, ANN query
    broadcast, and the LSH one-row hyperplane-constant frame)."""
    allowed_nlj = {
        "region_nation_grid",
        "ann_cosine_topk",
        "ivf_cosine_topk",
        "lsh_embedding_neighbors",
    }
    for name in (
        "pricing_summary",
        "multihop_revenue",
        "diff_city_short_time",
        "brute_force_hits",
        "fraud_report",
        "ngram_jaccard_same_source",
        "lsh_embedding_neighbors",
        "minhash_near_duplicates",
        "asof_prev_hour_stats",
        "user_sessions",
    ):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        if name not in allowed_nlj:
            assert "BroadcastNestedLoopJoin" not in plan, name


def test_text_profile_is_map_only(spark):
    plan = _plan(spark, "text_quality_stats")
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_doc_fingerprints_is_map_only(spark):
    plan = _plan(spark, "doc_fingerprints")
    assert "Exchange" not in plan


def test_document_chunks_single_pack_exchange(spark):
    """Chunking itself is a generator (no join); since round 9 the row
    also assigns pack_ids, whose running-sum window is the operator's
    ONE documented shuffle — exactly one hash exchange on the shard
    key, never a range/global sort."""
    plan = _plan(spark, "document_chunks")
    assert "Generate explode" in plan  # generator, not a join
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan


def test_global_top_orders_takeordered(spark):
    # per-partition top-k + driver merge, NOT a global sort exchange
    plan = _plan(spark, "global_top_orders")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_bucketed_self_joins_are_equi_joins(spark):
    """The 1h/20min self-joins must plan as hash equi-joins on the
    (bucket, key) composite — the O(n^2)-per-key theta join shape
    (nested loop / cartesian) must not come back."""
    for name in ("diff_city_short_time", "brute_force_hits"):
        plan = _plan(spark, name)
        assert ("ShuffledHashJoin" in plan) or ("SortMergeJoin" in plan), name
        assert "__bucket" in plan, name


def test_asof_join_has_no_pair_explosion(spark):
    """The as-of join is the union + last-ignore-nulls rewrite: no join
    node at all, one window over the union."""
    plan = _plan(spark, "asof_prev_hour_stats")
    assert "Join" not in plan
    assert "Window" in plan
    assert "Union" in plan


def test_fraud_report_rule_hit_hints_are_measured(spark):
    """assemble_report's measured mode (broadcast_rule_hits=None, the
    jobs/daily.py production default — late round 9, the
    cap_per_domain precedent) gates the rule-hit broadcasts on a
    counted size: at test scale the hits fit and both hints fire;
    with broadcast_max_rows=-1 (unsatisfiable — at sf0.001 one rule
    has ZERO hits, and an empty frame provably fits any cap >= 0) the
    SAME plan drops exactly those two hints (dim hints stay) and the
    result is unchanged."""
    from etl_process_for_fraud_transactions_spark.operators.report import (
        assemble_report,
    )
    from etl_process_for_fraud_transactions_spark.plans import analog
    from pyspark.sql import functions as F

    d = analog.domain_frames(spark, SF_SMALL)
    args = (d["transactions"], d["cards"], d["accounts"], d["clients"],
            d["terminals"], d["blacklist"])

    hinted = assemble_report(
        *args, report_dt=F.lit("2024-01-31"), broadcast_rule_hits=None
    )
    unhinted = assemble_report(
        *args, report_dt=F.lit("2024-01-31"), broadcast_rule_hits=None,
        broadcast_max_rows=-1,
    )
    n_hints = lambda df: (
        df._jdf.queryExecution().optimizedPlan().toString()
        .count("strategy=broadcast")
    )
    # exactly the two rule-hit hints are measurement-dependent
    assert n_hints(hinted) - n_hints(unhinted) == 2
    key = lambda r: tuple(str(v) for v in r)
    assert sorted(map(key, hinted.collect())) == sorted(
        map(key, unhinted.collect())
    )


def test_zscore_stats_back_join_broadcasts_via_aqe(spark):
    """The per-key stats frame scales with key cardinality, so the
    operator carries no broadcast hint (late round 9) — at test scale
    AQE must still pick the broadcast from runtime stats, so dropping
    the hint costs nothing; it only removes the scale abort."""
    df = QUERIES["amount_zscore_outliers"](spark, SF_SMALL)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    final = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final


def test_cap_per_domain_text_never_shuffles_on_domain(spark):
    """Hot-domain isolation (round 7): the corpus' text column must
    never enter a domain-keyed exchange — only the (id, domain)
    projection shuffles (count + over-cap ranking); the full-row pass
    is two broadcast joins + a filter."""
    from pyspark.sql import functions as F

    from etl_process_for_fraud_transactions_spark.operators.web import (
        cap_per_domain,
    )

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("https://d"), F.col("id") % 5, F.lit(".org/x")).alias(
            "url"
        ),
        F.lit("some document text payload").alias("text"),
    )
    out = cap_per_domain(df, max_docs=10)
    qe = out._jdf.queryExecution()
    formatted = qe.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # formatted explain lists each node's Input attributes: every
    # shuffle Exchange must carry only projected short columns — the
    # text attribute rides only through broadcast joins
    blocks = re.split(r"\n\(\d+\) ", formatted)
    shuffle_blocks = [b for b in blocks if b.startswith("Exchange")]
    assert shuffle_blocks, formatted
    for b in shuffle_blocks:
        m = re.search(r"Input \[\d+\]: \[([^\]]*)\]", b)
        assert m and "text" not in m.group(1), b
    assert "BroadcastHashJoin" in formatted
