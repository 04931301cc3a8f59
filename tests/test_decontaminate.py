"""Benchmark decontamination: known answers and a pure-python
brute-force oracle replay on seeded random text."""

from __future__ import annotations

import random
import re

import pytest

from etl_process_for_fraud_transactions_spark.operators.decontaminate import (
    contamination_report,
    decontaminate,
)


def _py_shingles(text: str, k: int) -> set[str]:
    """Independent replay of the engine's normalization + shingling."""
    toks = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ") if t != ""]
    if not toks:
        return set()
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


@pytest.fixture(scope="module")
def fixture(spark):
    bench_rows = [
        (100, "What is the capital of France? Paris is the capital."),
        (200, "Solve for x: two x plus three equals seven."),
    ]
    docs_rows = [
        # verbatim leak of bench 100 inside a longer document
        (1, "Intro text here. What is the capital of France? Paris is the capital. More filler."),
        # partial overlap with bench 200: shares the "solve for x two x
        # plus" prefix windows, then diverges (five != three)
        (2, "Homework help: solve for x: two x plus five equals nine thanks"),
        # clean
        (3, "completely unrelated discussion of spark shuffle partitions"),
        (4, "another clean document about parquet row groups and pruning"),
    ]
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "bench_id long, text string")
    return docs_rows, bench_rows, docs, bench


def test_contamination_report_known_answer(spark, fixture):
    docs_rows, bench_rows, docs, bench = fixture
    got = {
        (r.doc_id, r.bench_id): (r.n_shared, r.bench_frac)
        for r in contamination_report(docs, bench, k=5).collect()
    }
    # doc 1 contains bench 100 verbatim: every bench shingle is shared
    assert (1, 100) in got
    n_shared, frac = got[(1, 100)]
    assert frac == 1.0 and n_shared == len(_py_shingles(bench_rows[0][1], 5))
    # doc 2 overlaps bench 200 partially (2 of 5 shingles)
    assert (2, 200) in got and 0 < got[(2, 200)][1] < 1.0
    # clean docs never appear
    assert not any(d in (3, 4) for d, _ in got)


def test_decontaminate_drops_flagged(spark, fixture):
    _, _, docs, bench = fixture
    kept = sorted(r.doc_id for r in decontaminate(docs, bench, k=5).collect())
    assert kept == [3, 4]
    # relative policy: requiring full verbatim inclusion keeps doc 2
    kept_strict = sorted(
        r.doc_id for r in decontaminate(docs, bench, k=5, min_bench_frac=1.0).collect()
    )
    assert kept_strict == [2, 3, 4]


def test_contamination_matches_bruteforce_oracle(spark):
    """Seeded random word soup: the report must equal the exact
    all-pairs shingle-set intersection computed in python."""
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(30)]
    mk = lambda n: " ".join(rng.choice(vocab) for _ in range(n))
    docs_rows = [(i, mk(rng.randint(3, 40))) for i in range(40)]
    bench_rows = [(i, mk(rng.randint(3, 12))) for i in range(8)]
    k = 3

    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "bench_id long, text string")
    got = {
        (r.doc_id, r.bench_id): (r.n_shared, round(r.bench_frac, 9))
        for r in contamination_report(docs, bench, k=k).collect()
    }

    want = {}
    for did, dtext in docs_rows:
        ds = _py_shingles(dtext, k)
        for bid, btext in bench_rows:
            bs = _py_shingles(btext, k)
            shared = len(ds & bs)
            if shared >= 1:
                want[(did, bid)] = (shared, round(shared / len(bs), 9))
    assert got == want and want  # non-trivial fixture


def test_benchmark_side_broadcasts(spark, fixture):
    """Scale invariant: the corpus must hit a broadcast join — no
    shuffle of the exploded corpus shingles before the match."""
    _, _, docs, bench = fixture
    plan = (
        contamination_report(docs, bench, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_empty_benchmark_flags_nothing(spark, fixture):
    _, _, docs, bench = fixture
    empty_bench = bench.limit(0)
    assert contamination_report(docs, empty_bench).count() == 0
    assert decontaminate(docs, empty_bench).count() == docs.count()


class TestBloomPrefilter:
    def test_bloom_no_false_negatives_and_bounded_fpp(self, spark):
        """Every inserted key probes positive; random non-members
        probe positive at roughly the built fpp (loose 5x bound)."""
        from pyspark.sql import functions as F

        from etl_process_for_fraud_transactions_spark.operators.bloom import (
            bloom_build,
            bloom_might_contain,
        )

        rng = random.Random(13)
        members = [f"key-{i}-{rng.randrange(10**9)}" for i in range(2000)]
        others = [f"other-{i}-{rng.randrange(10**9)}" for i in range(4000)]
        keys = spark.createDataFrame([(m,) for m in members], "k string")
        bits_df, m, kh = bloom_build(keys, "k", fpp=0.01)
        assert m % 64 == 0 and kh >= 1

        probe = spark.createDataFrame(
            [(v, v in set(members)) for v in members + others],
            "k string, is_member boolean",
        )
        got = (
            probe.crossJoin(F.broadcast(bits_df))
            .select(
                "is_member",
                bloom_might_contain(F.col("k"), F.col("__bloom_bits"), m, kh).alias(
                    "hit"
                ),
            )
            .collect()
        )
        assert all(r.hit for r in got if r.is_member)  # no false negatives
        fp = sum(1 for r in got if r.hit and not r.is_member)
        assert fp <= 0.05 * 4000, fp  # 5x the 1% design point

    def test_bloom_prefiltered_report_identical_to_exact(self, spark):
        """The cascade must change the memory/shuffle envelope only:
        bloom false positives die in the exact verify join, so the
        report is row-identical to the exact broadcast path on a
        corpus large enough for real fpp exposure."""
        from etl_process_for_fraud_transactions_spark.sources.testdata import (
            load_table,
        )
        from tests.conftest import SF_ORACLE

        docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
        bench = (
            docs.filter(docs.doc_id % 101 == 7)
            .selectExpr("doc_id AS bench_id", "text")
        )
        key = lambda r: (r.doc_id, r.bench_id, r.n_shared, round(r.bench_frac, 9))
        exact = sorted(map(key, contamination_report(docs, bench, k=8).collect()))
        bloomed = sorted(
            map(
                key,
                contamination_report(
                    docs, bench, k=8, prefilter="bloom", bloom_fpp=0.01
                ).collect(),
            )
        )
        assert exact == bloomed and len(exact) > 0

        # prebuilt-bloom reuse path: identical again
        from etl_process_for_fraud_transactions_spark.operators.decontaminate import (
            build_benchmark_bloom,
        )

        triple = build_benchmark_bloom(bench, k=8, fpp=0.01)
        reused = sorted(
            map(
                key,
                contamination_report(
                    docs, bench, k=8, prefilter="bloom", bloom=triple
                ).collect(),
            )
        )
        assert reused == exact

    def test_bloom_probe_plan_is_mapside_and_udf_free(self, spark):
        """The prune stage must be a broadcast + filter on the corpus
        scan — no hash-partition Exchange before the bloom test, no
        Python evals anywhere."""
        from pyspark.sql import functions as F

        from etl_process_for_fraud_transactions_spark.operators.bloom import (
            bloom_build,
            bloom_might_contain,
        )

        keys = spark.createDataFrame([(f"k{i}",) for i in range(50)], "k string")
        bits_df, m, kh = bloom_build(keys, "k", fpp=0.01)
        probe = spark.createDataFrame([(f"p{i}",) for i in range(10)], "k string")
        plan = (
            probe.crossJoin(F.broadcast(bits_df))
            .filter(bloom_might_contain(F.col("k"), F.col("__bloom_bits"), m, kh))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
        assert "hashpartitioning" not in plan  # prune is map-side only

    def test_decontaminate_threads_prebuilt_bloom(self, spark, fixture):
        """The drop-side twin accepts the prebuilt triple exactly as
        contamination_report does — one bitset build per benchmark
        suite, reused across every screened corpus."""
        from etl_process_for_fraud_transactions_spark.operators.decontaminate import (
            build_benchmark_bloom,
        )

        _, _, docs, bench = fixture
        triple = build_benchmark_bloom(bench, k=8, fpp=0.01)
        exact = sorted(r.doc_id for r in decontaminate(docs, bench, k=8).collect())
        reused = sorted(
            r.doc_id
            for r in decontaminate(
                docs, bench, k=8, prefilter="bloom", bloom=triple
            ).collect()
        )
        assert reused == exact

    def test_undersized_bloom_stays_exact(self, spark):
        """An undersized bitset (the clamp's effect: effective fpp far
        above the request) only weakens the PRUNE — the verify join
        still removes every false positive, so results are identical
        to the exact path."""
        from pyspark.sql import functions as F

        from etl_process_for_fraud_transactions_spark.operators.bloom import (
            bloom_build,
            bloom_might_contain,
        )

        rng = random.Random(5)
        members = [f"m-{i}-{rng.randrange(10**9)}" for i in range(500)]
        others = [f"o-{i}-{rng.randrange(10**9)}" for i in range(2000)]
        keys = spark.createDataFrame([(m,) for m in members], "k string")
        # lie about the cardinality: 10 items' worth of bits for 500 keys
        bits_df, m, kh = bloom_build(keys, "k", fpp=0.01, n_items=10)
        probe = spark.createDataFrame(
            [(v,) for v in members + others], "k string"
        )
        pruned = (
            probe.crossJoin(F.broadcast(bits_df))
            .filter(bloom_might_contain(F.col("k"), F.col("__bloom_bits"), m, kh))
            .drop("__bloom_bits")
        )
        # no false negatives even though the filter is saturated
        hits = {r.k for r in pruned.collect()}
        assert set(members) <= hits
        # cascade: exact verify after the weak prune == exact join
        verified = sorted(
            r.k for r in pruned.join(keys, "k", "left_semi").collect()
        )
        assert verified == sorted(members)

    def test_bloom_params_clamp_warns(self):
        import warnings

        from etl_process_for_fraud_transactions_spark.operators.bloom import (
            _MAX_BITS,
            bloom_params,
        )

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            m, k = bloom_params(10**10, 0.001)
        assert m == _MAX_BITS
        assert any("effective fpp" in str(x.message) for x in w)
        # unclamped sizing stays silent
        with warnings.catch_warnings(record=True) as w2:
            warnings.simplefilter("always")
            bloom_params(1000, 0.01)
        assert not w2
