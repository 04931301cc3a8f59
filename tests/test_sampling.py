"""Deterministic sampling: python md5 replays, composition laws, and
stratified rates."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_process_for_fraud_transactions_spark.operators.sampling import (
    deterministic_sample,
    hash_fraction,
    stratified_sample,
)


def _py_frac(id_val, seed="0"):
    h = hashlib.md5(f"{seed}:{id_val}".encode()).hexdigest()
    return int(h[:15], 16) / float(1 << 60)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")


def test_hash_fraction_matches_python_md5(spark, ids):
    got = {
        r.doc_id: r.f
        for r in ids.select("doc_id", hash_fraction("doc_id", "7").alias("f"))
        .limit(50)
        .collect()
    }
    for i, f in got.items():
        assert f == pytest.approx(_py_frac(i, "7"), abs=1e-15)


def test_deterministic_sample_exact_membership_and_rate(spark, ids):
    kept = {r.doc_id for r in deterministic_sample(ids, 0.25, seed="3").collect()}
    want = {i for i in range(2000) if _py_frac(i, "3") < 0.25}
    assert kept == want
    assert 0.2 < len(kept) / 2000 < 0.3  # ~25%
    # stability: same call, same rows
    again = {r.doc_id for r in deterministic_sample(ids, 0.25, seed="3").collect()}
    assert again == kept


def test_nested_samples_compose(spark, ids):
    half = deterministic_sample(ids, 0.5, seed="9")
    fifth_of_half = {r.doc_id for r in deterministic_sample(half, 0.2, seed="9").collect()}
    fifth_direct = {r.doc_id for r in deterministic_sample(ids, 0.2, seed="9").collect()}
    assert fifth_of_half == fifth_direct  # {h<0.2} subset of {h<0.5}


def test_seeds_are_independent(spark, ids):
    a = {r.doc_id for r in deterministic_sample(ids, 0.5, seed="1").collect()}
    b = {r.doc_id for r in deterministic_sample(ids, 0.5, seed="2").collect()}
    overlap = len(a & b) / 2000
    assert 0.15 < overlap < 0.35  # ~25% under independence, not ~50%


def test_stratified_sample_rates_and_membership(spark):
    rows = [(i, "rare" if i % 10 == 0 else "common") for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, kind string")
    out = stratified_sample(
        df, {"rare": 1.0, "common": 0.1}, "kind", seed="4"
    ).collect()
    rare = [r for r in out if r.kind == "rare"]
    common = [r for r in out if r.kind == "common"]
    assert len(rare) == 500  # all rare rows kept
    assert 300 <= len(common) <= 600  # ~10% of 4500
    # exact membership replay for the sampled stratum
    want = {i for i, k in rows if k == "common" and _py_frac(i, "4") < 0.1}
    assert {r.doc_id for r in common} == want
    # unlisted strata default to dropped
    none_kept = stratified_sample(df, {"rare": 1.0}, "kind", seed="4").filter(
        F.col("kind") == "common"
    )
    assert none_kept.count() == 0


def test_sample_plan_is_narrow(spark, ids):
    plan = (
        deterministic_sample(ids, 0.5)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


class TestShuffleDeterministic:
    def test_stable_pseudo_random_permutation(self, spark, ids):
        from etl_process_for_fraud_transactions_spark.operators.sampling import (
            shuffle_deterministic,
        )

        order1 = [r.doc_id for r in shuffle_deterministic(ids).collect()]
        # same seed, different physical layout -> same order
        order2 = [
            r.doc_id
            for r in shuffle_deterministic(ids.repartition(7)).collect()
        ]
        assert order1 == order2
        assert sorted(order1) == sorted(r.doc_id for r in ids.collect())
        assert order1 != sorted(order1)  # actually permuted
        # different seed -> different permutation
        order3 = [
            r.doc_id for r in shuffle_deterministic(ids, seed="1").collect()
        ]
        assert order3 != order1 and sorted(order3) == sorted(order1)


class TestSampleToMixture:
    def test_mixture_proportions(self, spark):
        from etl_process_for_fraud_transactions_spark.operators.sampling import (
            sample_to_mixture,
        )

        rows = (
            [(i, "web") for i in range(6000)]
            + [(10_000 + i, "books") for i in range(1000)]
            + [(20_000 + i, "code") for i in range(3000)]
        )
        df = spark.createDataFrame(rows, "doc_id long, source string")
        # books is binding: 1000/0.25 -> target total ~4000
        out = sample_to_mixture(
            df, {"web": 0.5, "books": 0.25, "code": 0.25}
        )
        got = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
        assert got["books"] == 1000  # binding source kept whole
        assert abs(got["web"] - 2000) < 200   # hash sampling tolerance
        assert abs(got["code"] - 1000) < 150
        # deterministic
        again = sample_to_mixture(df, {"web": 0.5, "books": 0.25, "code": 0.25})
        assert sorted(r.doc_id for r in out.collect()) == sorted(
            r.doc_id for r in again.collect()
        )

    def test_binding_source_kept_whole_at_non_dyadic_shares(self, spark):
        """The binding source's fraction is pinned to exactly 1.0, not
        recovered through the norm*target/count float roundtrip: with
        shares like 1/3 the roundtrip can land one ulp below 1.0 and
        hash_fraction < 1-ulp would drop a 'kept whole' row."""
        from etl_process_for_fraud_transactions_spark.operators.sampling import (
            sample_to_mixture,
        )

        rows = (
            [(i, "web") for i in range(900)]
            + [(10_000 + i, "books") for i in range(100)]
        )
        df = spark.createDataFrame(rows, "doc_id long, source string")
        # non-dyadic shares (2/3, 1/3): books binding at 100/(1/3)=300
        out = sample_to_mixture(df, {"web": 2.0, "books": 1.0})
        got = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
        assert got["books"] == 100  # exactly whole, ulp-proof

    def test_unlisted_sources_dropped_and_empty_raises(self, spark):
        from etl_process_for_fraud_transactions_spark.operators.sampling import (
            sample_to_mixture,
        )

        df = spark.createDataFrame(
            [(1, "web"), (2, "spam")], "doc_id long, source string"
        )
        out = sample_to_mixture(df, {"web": 1.0})
        assert [r.source for r in out.collect()] == ["web"]
        with pytest.raises(ValueError, match="unsatisfiable"):
            sample_to_mixture(df, {"web": 0.5, "absent": 0.5})


def test_token_weighted_mixture(spark):
    """weight_col='n_tokens' targets the TOKEN mix: long-doc and
    short-doc sources with equal doc counts must downsample to
    near-equal token totals, which a doc-count mixture would miss by
    the length ratio."""
    from etl_process_for_fraud_transactions_spark.operators.sampling import (
        sample_to_mixture,
    )

    rows = [(i, "books", 1000) for i in range(500)]
    rows += [(10_000 + i, "web", 100) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = sample_to_mixture(
        df, {"books": 1.0, "web": 1.0}, weight_col="n_tokens"
    )
    got = {
        r.source: r.toks
        for r in out.groupBy("source").agg(
            F.sum("n_tokens").alias("toks")
        ).collect()
    }
    # web (50k tokens) binds and is kept whole; books downsamples to
    # ~50k tokens (=~50 of its 500 docs, hash-sampled: allow slack)
    assert got["web"] == 50_000
    assert abs(got["books"] - got["web"]) / got["web"] < 0.35
    # doc-count mixture on the same frame keeps everything (counts are
    # already equal) — the token mix stays 10:1, proving the two
    # targets genuinely differ
    out_docs = sample_to_mixture(df, {"books": 1.0, "web": 1.0})
    doc_toks = {
        r.source: r.toks
        for r in out_docs.groupBy("source").agg(
            F.sum("n_tokens").alias("toks")
        ).collect()
    }
    assert doc_toks["books"] == 10 * doc_toks["web"]


def test_mixture_all_null_weights_fail_loudly(spark):
    """A source whose every weight is NULL is unsatisfiable — the
    descriptive ValueError, not a TypeError from None arithmetic."""
    from etl_process_for_fraud_transactions_spark.operators.sampling import (
        sample_to_mixture,
    )

    df = spark.createDataFrame(
        [(1, "web", 100), (2, "books", None)],
        "doc_id long, source string, n_tokens long",
    )
    with pytest.raises(ValueError, match="books"):
        sample_to_mixture(
            df, {"web": 1.0, "books": 1.0}, weight_col="n_tokens"
        )
