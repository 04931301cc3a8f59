"""Learned quality classifier: separability on a planted fixture,
expression-scoring vs driver-side sigmoid replay, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

pytest.importorskip("numpy")

from etl_process_for_fraud_transactions_spark.operators.quality_model import (  # noqa: E402
    FEATURE_COLS,
    QualityModel,
    quality_features,
    score_quality,
    train_quality_model,
)

GOOD_TEXTS = [
    "the quiet harbor town wakes early as fishing boats slip past the "
    "breakwater and the bakery fills the narrow street with warm bread",
    "careful observation over many seasons taught the farmers when the "
    "river would rise and which fields would hold the water longest",
    "she explained the experiment twice so that every student could "
    "repeat the measurement and understand where the uncertainty came from",
    "the committee reviewed the proposal in detail and suggested three "
    "changes that would make the study easier to reproduce next year",
    "long walks through the old forest reveal how the light changes "
    "with the hours and the seasons in ways a photograph rarely holds",
]
JUNK_TEXTS = [
    "$$$ CLICK NOW!!! %%% @@@ ### !!! $$$ WIN WIN WIN !!! ### @@@ %%%",
    "xqz jjf kkp zzw vvb nnm qqr ttl ppd ssk xqz jjf kkp zzw vvb nnm",
    "!!!! ???? #### $$$$ %%%% ^^^^ &&&& **** (((( )))) ____ ++++ ====",
    "BUY BUY BUY CHEAP CHEAP CHEAP NOW NOW NOW WOW WOW WOW AAA BBB CCC",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z a b c d e f",
]


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [(i, t, 1.0) for i, t in enumerate(GOOD_TEXTS)]
    rows += [(100 + i, t, 0.0) for i, t in enumerate(JUNK_TEXTS)]
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


def test_model_separates_planted_classes(spark, labeled):
    model = train_quality_model(labeled)
    scored = {
        r.doc_id: r.quality_score
        for r in score_quality(labeled, model).collect()
    }
    for i in range(len(GOOD_TEXTS)):
        assert scored[i] > 0.5, (i, scored[i])
    for i in range(len(JUNK_TEXTS)):
        assert scored[100 + i] < 0.5, (100 + i, scored[100 + i])


def test_expression_score_matches_python_replay(spark, labeled):
    """The folded sigmoid expression must equal the driver-side
    score_py over the same features — the portability contract."""
    model = train_quality_model(labeled)
    feats = {
        r["doc_id"]: {n: float(r[n]) for n in FEATURE_COLS}
        for r in quality_features(labeled).collect()
    }
    scored = {
        r.doc_id: r.quality_score
        for r in score_quality(labeled, model).collect()
    }
    for doc_id, f in feats.items():
        assert abs(scored[doc_id] - model.score_py(f)) < 1e-9


def test_scoring_plan_is_narrow_and_udf_free(spark, labeled):
    model = QualityModel(weights=(0.0,) * len(FEATURE_COLS), intercept=0.3)
    plan = (
        score_quality(labeled, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_curate_corpus_quality_gate(spark, labeled):
    """curate_corpus(quality_model=...) drops model-flagged junk that
    the structural gates alone let through."""
    from etl_process_for_fraud_transactions_spark.operators.pipeline import (
        curate_corpus,
    )

    model = train_quality_model(labeled)
    # junk crafted to pass every STRUCTURAL gate (8 normalized tokens
    # >= min_tokens, one 'the' -> detected en) while the model's
    # punct/upper features sink it (scores ~0.21 under this fixture)
    sneaky = (
        "the BUY BUY CHEAP CHEAP WOW NOW WIN $$$ ### !!! %%% @@@ "
        "^^^ &&& *** ((( ))) ++++ ===="
    )
    docs = spark.createDataFrame(
        [(1, GOOD_TEXTS[0]), (2, GOOD_TEXTS[1]), (3, sneaky)],
        "doc_id long, text string",
    )
    base = {r.doc_id for r in curate_corpus(docs, min_tokens=5).collect()}
    assert base == {1, 2, 3}  # structural gates admit the junk
    gated = {
        r.doc_id
        for r in curate_corpus(docs, min_tokens=5, quality_model=model).collect()
    }
    assert gated == {1, 2}  # only the model catches it


def test_model_is_portable_plain_floats(spark, labeled):
    model = train_quality_model(labeled)
    assert len(model.weights) == len(FEATURE_COLS)
    assert all(isinstance(w, float) for w in model.weights)
    assert isinstance(model.intercept, float)
    # passthrough: scoring keeps every input column
    cols = set(score_quality(labeled, model).columns)
    assert cols == {"doc_id", "text", "label", "quality_score"}


class TestUnigramLM:
    def test_scores_match_python_replay(self, spark):
        import math

        from etl_process_for_fraud_transactions_spark.operators.quality_model import (
            train_unigram_lm,
            unigram_logprob_score,
        )

        ref = spark.createDataFrame(
            [(1, "the cat sat on the mat"), (2, "the dog sat on the log")],
            "doc_id long, text string",
        )
        lm = train_unigram_lm(ref, vocab_size=100, alpha=0.5)

        # python replay of the smoothing
        toks = "the cat sat on the mat the dog sat on the log".split()
        from collections import Counter

        c = Counter(toks)
        total = sum(c.values())
        denom = total + 0.5 * (len(c) + 1)
        logp = {t: math.log((n + 0.5) / denom) for t, n in c.items()}
        oov = math.log(0.5 / denom)

        docs = spark.createDataFrame(
            [
                (10, "the cat sat"),            # all in-vocab
                (11, "quantum flux capacitor"),  # all OOV
                (12, ""),                        # empty -> oov_logp
            ],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r.lm_logprob
            for r in unigram_logprob_score(docs, lm).collect()
        }
        want10 = (logp["the"] + logp["cat"] + logp["sat"]) / 3
        assert abs(got[10] - want10) < 1e-12
        assert abs(got[11] - oov) < 1e-12
        assert abs(got[12] - oov) < 1e-12
        # reference-like text outranks word soup
        assert got[10] > got[11]

    def test_vocab_cap_and_determinism(self, spark):
        from etl_process_for_fraud_transactions_spark.operators.quality_model import (
            train_unigram_lm,
        )

        ref = spark.createDataFrame(
            [(i, f"tok{i % 7} tok{i % 3} common") for i in range(50)],
            "doc_id long, text string",
        )
        lm1 = train_unigram_lm(ref, vocab_size=4).collect()[0]
        lm2 = train_unigram_lm(ref.repartition(5), vocab_size=4).collect()[0]
        assert len(lm1["__lm_vocab"]) == 4
        assert lm1["__lm_vocab"] == lm2["__lm_vocab"]  # layout-independent
        assert lm1["__lm_logp"] == lm2["__lm_logp"]

    def test_curate_corpus_lm_gate(self, spark):
        from etl_process_for_fraud_transactions_spark.operators.pipeline import (
            curate_corpus,
        )
        from etl_process_for_fraud_transactions_spark.operators.quality_model import (
            train_unigram_lm,
            unigram_logprob_score,
        )

        ref = spark.createDataFrame(
            [(i, t) for i, t in enumerate(GOOD_TEXTS)], "doc_id long, text string"
        )
        lm = train_unigram_lm(ref, vocab_size=1000)
        # threshold between reference-like text and OOV word soup
        soup = "zxqv wjfk plmd qrtx yhbn zxqv wjfk plmd qrtx yhbn the"
        docs = spark.createDataFrame(
            [(1, GOOD_TEXTS[0]), (2, soup)], "doc_id long, text string"
        )
        scores = {
            r.doc_id: r.lm_logprob
            for r in unigram_logprob_score(docs, lm).collect()
        }
        thr = (scores[1] + scores[2]) / 2
        kept = {
            r.doc_id
            for r in curate_corpus(
                docs,
                min_tokens=5,
                languages=("en", "und"),
                unigram_lm=lm,
                min_lm_logprob=thr,
            ).collect()
        }
        assert kept == {1}
        with pytest.raises(ValueError, match="min_lm_logprob"):
            curate_corpus(docs, unigram_lm=lm)

    def test_curate_corpus_bigram_gate_catches_word_order_junk(self, spark):
        """A train_bigram_lm model passed as unigram_lm= upgrades the
        pipeline's LM gate to the bigram scorer: a doc that is a
        word-ORDER scramble of reference text (identical unigram bag —
        the unigram rung cannot tell them apart) is separable and
        dropped."""
        from etl_process_for_fraud_transactions_spark.operators.pipeline import (
            curate_corpus,
        )
        from etl_process_for_fraud_transactions_spark.operators.quality_model import (
            bigram_logprob_score,
            train_bigram_lm,
        )

        ref = spark.createDataFrame(
            [(i, t) for i, t in enumerate(GOOD_TEXTS)], "doc_id long, text string"
        )
        lm = train_bigram_lm(ref, vocab_size=1000, bigram_size=1000)
        ordered = GOOD_TEXTS[0]
        toks = ordered.split()
        scrambled = " ".join(toks[::2] + toks[1::2])
        docs = spark.createDataFrame(
            [(1, ordered), (2, scrambled)], "doc_id long, text string"
        )
        scores = {
            r.doc_id: r.lm2_logprob
            for r in bigram_logprob_score(docs, lm).collect()
        }
        assert scores[1] > scores[2]  # unigram bag identical; order differs
        thr = (scores[1] + scores[2]) / 2
        kept = {
            r.doc_id
            for r in curate_corpus(
                docs,
                min_tokens=5,
                languages=("en", "und"),
                unigram_lm=lm,
                min_lm_logprob=thr,
            ).collect()
        }
        assert kept == {1}

    def test_scoring_plan_narrow_and_udf_free(self, spark):
        from etl_process_for_fraud_transactions_spark.operators.quality_model import (
            train_unigram_lm,
            unigram_logprob_score,
        )

        ref = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        lm = train_unigram_lm(ref, vocab_size=10)
        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        plan = (
            unigram_logprob_score(docs, lm)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
        # scoring side: broadcast + project only, no hash repartition
        assert "hashpartitioning" not in plan


class TestBigramLM:
    REF = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
    ]

    def _models(self, spark):
        from etl_process_for_fraud_transactions_spark.operators.quality_model import (
            train_bigram_lm,
        )

        ref = spark.createDataFrame(self.REF, "doc_id long, text string")
        return train_bigram_lm(ref, vocab_size=100, bigram_size=100, alpha=0.5)

    @staticmethod
    def _python_model(alpha=0.5, backoff=0.4):
        import math
        from collections import Counter

        toks = ("the cat sat on the mat " "the dog sat on the log").split()
        uni = Counter(toks)
        bg = Counter(
            f"{a} {b}"
            for doc in ("the cat sat on the mat", "the dog sat on the log")
            for a, b in zip(doc.split(), doc.split()[1:])
        )
        total = sum(uni.values())
        denom = total + alpha * (len(uni) + 1)
        logp = {t: math.log((n + alpha) / denom) for t, n in uni.items()}
        oov = math.log(alpha / denom)
        v1 = len(uni) + 1
        bglogp = {
            k: math.log((n + alpha) / (uni[k.split(" ", 1)[0]] + alpha * v1))
            for k, n in bg.items()
        }

        def score(text):
            ts = text.split()
            if not ts:
                return oov
            s = logp.get(ts[0], oov)
            for a, b in zip(ts, ts[1:]):
                key = f"{a} {b}"
                if key in bglogp:
                    s += bglogp[key]
                else:
                    s += math.log(backoff) + logp.get(b, oov)
            return s / len(ts)

        return score, oov

    def test_scores_match_python_replay(self, spark):
        from etl_process_for_fraud_transactions_spark.operators.quality_model import (
            bigram_logprob_score,
        )

        lm = self._models(spark)
        score, oov = self._python_model()
        docs = spark.createDataFrame(
            [
                (10, "the cat sat"),        # seen bigrams throughout
                (11, "cat the sat"),        # same unigrams, broken order
                (12, "quantum flux"),       # OOV + backoff
                (13, ""),                   # empty -> oov
                (14, "mat"),                # single token: unigram only
            ],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r.lm2_logprob
            for r in bigram_logprob_score(docs, lm).collect()
        }
        for doc_id, text in [
            (10, "the cat sat"), (11, "cat the sat"),
            (12, "quantum flux"), (14, "mat"),
        ]:
            assert abs(got[doc_id] - score(text)) < 1e-12, doc_id
        assert abs(got[13] - oov) < 1e-12
        # word-order sharpness: same unigram bag, in-order text wins
        assert got[10] > got[11]

    def test_composes_with_unigram_scorer(self, spark):
        """The bigram model carries the unigram columns, so
        unigram_logprob_score accepts it and must produce EXACTLY the
        unigram model's scores — one trained artifact serves both
        rungs."""
        from etl_process_for_fraud_transactions_spark.operators.quality_model import (
            train_unigram_lm,
            unigram_logprob_score,
        )

        ref = spark.createDataFrame(self.REF, "doc_id long, text string")
        uni = train_unigram_lm(ref, vocab_size=100, alpha=0.5)
        bi = self._models(spark)
        docs = spark.createDataFrame(
            [(1, "the cat on quantum"), (2, "")], "doc_id long, text string"
        )
        a = {r.doc_id: r.lm_logprob for r in unigram_logprob_score(docs, uni).collect()}
        b = {r.doc_id: r.lm_logprob for r in unigram_logprob_score(docs, bi).collect()}
        assert a == b

    def test_scoring_plan_narrow_and_udf_free(self, spark):
        from etl_process_for_fraud_transactions_spark.operators.quality_model import (
            bigram_logprob_score,
        )

        lm = self._models(spark)
        docs = spark.createDataFrame([(1, "the cat")], "doc_id long, text string")
        plan = (
            bigram_logprob_score(docs, lm)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
        assert "hashpartitioning" not in plan


def test_curation_row_bigram_leg_has_active_seen_arm(spark):
    """The corpus_curation_pipeline lm2_logprob column must exercise
    BOTH stupid-backoff arms at the smoke scale. Derived purely from
    row outputs: over the same (masked) text the unigram mean `lm`
    satisfies backoff_only_lm2 = lm + backoff*(n-1)/n, and every seen
    bigram strictly RAISES the score (seen log-probs -1..-2.75 vs
    backoff + unigram <= -3.75), so lm2 == backoff_only marks a
    no-hit document and lm2 > backoff_only marks a hit."""
    from etl_process_for_fraud_transactions_spark.plans import QUERIES
    from etl_process_for_fraud_transactions_spark.plans.queries_llm import (
        _CUR_BG_BACKOFF,
    )

    from .conftest import SF_SMALL

    rows = QUERIES["corpus_curation_pipeline"](spark, SF_SMALL).collect()
    assert rows, "smoke corpus produced no survivors"
    saw_seen = saw_backoff_only = False
    for r in rows:
        n = r.n_tokens
        backoff_only = r.lm_logprob + _CUR_BG_BACKOFF * (n - 1) / n
        delta = r.lm2_logprob - backoff_only
        assert delta > -2e-6, r  # seen bigrams can only raise the score
        if delta > 1e-4:
            saw_seen = True
        elif abs(delta) <= 2e-6:
            saw_backoff_only = True
    assert saw_seen and saw_backoff_only
