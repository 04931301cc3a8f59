"""Learned document-quality scoring — the classifier stage of
web-corpus curation (the GPT-3 "similarity to high-quality reference"
filter, FineWeb/RefinedWeb quality models): heuristic gates
(operators/text.py::gopher_quality_flags) catch structural junk, a
trained model ranks the gray zone.

Pipeline contract:

    feats   = quality_features(docs)                # map-only
    model   = train_quality_model(labeled_feats)    # small labeled set
    scored  = score_quality(docs, model)            # map-only
    kept    = scored.filter(F.col("quality_score") >= 0.5)

Features are the engine's cheap per-document statistics (length,
token count, mean token length, punctuation / uppercase / stopword
ratios) — all JVM expressions, no tokenizer model, so FEATURIZING THE
100 TB CORPUS IS A NARROW PROJECTION. Training runs on the labeled
subset only (human or LLM judgments — thousands of rows, not
billions): MLlib LogisticRegression, one small iterative map-reduce.
Scoring broadcasts the coefficient vector inside the plan: the model
is folded into a single sigmoid(w.x + b) EXPRESSION, so the corpus
pass stays whole-stage-codegen — no MLlib transform (and its VectorUDT
conversion) in the hot path, no Python.

Gated behind an import-try like ivf_build (pyspark.ml needs numpy).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import quality_stats

#: Feature order is part of the model contract: scoring folds
#: coefficients positionally.
FEATURE_COLS = (
    "n_chars",
    "n_tokens",
    "mean_token_len",
    "punct_ratio",
    "upper_ratio",
    "stopword_ratio",
)


@dataclass(frozen=True)
class QualityModel:
    """Portable fitted model: plain floats, engine-independent. Keep it
    with the corpus version — scores are comparable only under one
    model."""

    weights: tuple[float, ...]
    intercept: float
    feature_cols: tuple[str, ...] = FEATURE_COLS

    def score_expr(self, feature_of) -> Column:
        """sigmoid(w.x + b) over feature COLUMNS (feature_of maps a
        feature name to its Column) — one codegen'd expression."""
        z = F.lit(float(self.intercept))
        for w, name in zip(self.weights, self.feature_cols):
            z = z + F.lit(float(w)) * feature_of(name).cast("double")
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))

    def score_py(self, feats: dict[str, float]) -> float:
        """Driver-side replay (tests / spot audits)."""
        z = self.intercept + sum(
            w * feats[n] for w, n in zip(self.weights, self.feature_cols)
        )
        return 1.0 / (1.0 + math.exp(-z))


def quality_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, *FEATURE_COLS) — the model's input view; identical to
    quality_stats, re-exported under the model contract name."""
    return quality_stats(df, text_col, id_col)


def train_quality_model(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_iter: int = 50,
    reg_param: float = 0.01,
    standardize: bool = True,
) -> QualityModel:
    """Fit logistic regression on the labeled frame (id, text, label
    in {0,1}) and return the portable QualityModel. The labeled set is
    the small side by construction; featurization is the same narrow
    projection the corpus pass uses, so train/serve skew is zero by
    code identity."""
    try:
        from pyspark.ml.classification import LogisticRegression
        from pyspark.ml.feature import VectorAssembler
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError("pyspark.ml unavailable in this runtime") from exc

    feats = quality_features(labeled, text_col, id_col).join(
        labeled.select(id_col, label_col), id_col
    )
    assembled = VectorAssembler(
        inputCols=list(FEATURE_COLS), outputCol="__features"
    ).transform(feats)
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        standardization=standardize,
    )
    m = lr.fit(assembled)
    return QualityModel(
        weights=tuple(float(w) for w in m.coefficients),
        intercept=float(m.intercept),
    )


def score_quality(
    df: DataFrame,
    model: QualityModel,
    text_col: str = "text",
    out_col: str = "quality_score",
) -> DataFrame:
    """Adds `out_col` = P(high quality) to every row — the 100 TB hot
    path: featurize + sigmoid folded into ONE let-bound expression
    (the token array evaluates once per row), zero shuffles, zero
    joins, zero Python, no MLlib in the plan (coefficients ride as
    literals). All other columns pass through untouched."""
    from .dedup import _let
    from .text import _quality_expr_map, tokens

    c = F.col(text_col)

    def body(toks: Column) -> Column:
        feats = _quality_expr_map(c, toks)
        return model.score_expr(lambda n: feats[n])

    return df.withColumn(out_col, _let(tokens(c), body))


# --- unigram LM scoring (perplexity-proxy filter) --------------------------

def train_unigram_lm(
    corpus: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
    alpha: float = 0.5,
) -> DataFrame:
    """Fit the reference language model of a CCNet-style perplexity
    filter, reduced to its scalable core: token unigram
    log-probabilities over a trusted reference corpus (the real CCNet
    uses a KenLM 5-gram; the unigram reduction keeps the shape — rank
    documents by how "reference-like" their token distribution is —
    while staying a pure aggregation). Lidstone-smoothed:
    p(t) = (count + alpha) / (total + alpha * (V + 1)), with the +1
    reserving mass for the OOV bucket.

    Returns a ONE-ROW frame carrying (vocab array<string>,
    logp array<double>, oov_logp double) — the same broadcast-one-row
    pattern as the LSH hyperplanes and bloom bitset: constant plan
    size, no literal explosion, ready for
    `unigram_logprob_score(docs, lm)`. Training is one token explode +
    one count shuffle, top-`vocab_size` by frequency (ties broken by
    token for determinism)."""
    import math

    from .text import tokens

    counts = (
        corpus.select(F.explode(tokens(F.col(text_col))).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t")
        .count()
    )
    top = counts.orderBy(F.desc("count"), F.asc("t")).limit(vocab_size).collect()
    total = sum(r["count"] for r in top)
    denom = total + alpha * (len(top) + 1)
    vocab = [r["t"] for r in top]
    logp = [math.log((r["count"] + alpha) / denom) for r in top]
    oov = math.log(alpha / denom)
    return corpus.sparkSession.createDataFrame(
        [(vocab, logp, oov)],
        "__lm_vocab: array<string>, __lm_logp: array<double>, "
        "__lm_oov: double",
    )


def unigram_logprob_score(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    out_col: str = "lm_logprob",
) -> DataFrame:
    """Adds `out_col` = mean token log-probability under the reference
    unigram LM (higher = more reference-like; gate with
    `F.col('lm_logprob') >= threshold`, threshold chosen from the
    reference corpus' own score distribution). The vocab rides as one
    broadcast map value; scoring is a single let-bound fold over the
    token array — zero shuffles, zero Python, O(log V) per token via
    map lookup. Empty documents score the OOV log-probability."""
    from .dedup import _let
    from .text import tokens

    lm_map = lm.select(
        F.map_from_arrays(F.col("__lm_vocab"), F.col("__lm_logp")).alias("__lm"),
        "__lm_oov",
    )

    def body(toks: Column) -> Column:
        toks_ne = F.filter(toks, lambda t: t != "")
        n = F.size(toks_ne)
        s = F.aggregate(
            toks_ne,
            F.lit(0.0),
            lambda acc, t: acc
            + F.coalesce(
                F.element_at(F.col("__lm"), t), F.col("__lm_oov")
            ),
        )
        return F.when(n > 0, s / n).otherwise(F.col("__lm_oov"))

    return (
        df.crossJoin(F.broadcast(lm_map))
        .withColumn(out_col, _let(tokens(F.col(text_col)), body))
        .drop("__lm", "__lm_oov")
    )


def train_bigram_lm(
    corpus: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
    bigram_size: int = 200_000,
    alpha: float = 0.5,
    backoff: float = 0.4,
) -> DataFrame:
    """Fit the bigram rung of the perplexity filter: unigram
    log-probabilities (exactly `train_unigram_lm`'s model) PLUS
    conditional bigram log-probabilities with STUPID BACKOFF (Brants
    et al., EMNLP 2007, "Large Language Models in Machine
    Translation") — the smoothing scheme published FOR web-scale LMs:
    no normalization pass over contexts, a fixed penalty `backoff`
    (0.4 in the paper) times the unigram probability whenever the
    bigram is unseen, so training stays two counting aggregations.

    p(w2|w1) = (count(w1 w2) + alpha) / (count(w1) + alpha * (V + 1))
    for the kept top-`bigram_size` bigrams (Lidstone in the
    conditional, consistent with the unigram rung); score backs off
    to log(backoff) + logp_unigram(w2) otherwise.

    Returns a ONE-ROW frame: the three unigram columns (so the model
    COMPOSES — `unigram_logprob_score(docs, bigram_lm)` also works)
    plus (__bg_keys array<string> "w1 w2", __bg_logp array<double>,
    __bg_backoff double). Same broadcast-one-row pattern as the LSH
    hyperplanes: constant plan size at any corpus size. Training is
    one token explode + one pair explode + two count shuffles; the
    collected model is bounded by vocab_size + bigram_size rows, the
    same driver-side budget class as the unigram vocab."""
    import math

    from .dedup import _let
    from .text import tokens

    counts = (
        corpus.select(F.explode(tokens(F.col(text_col))).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t")
        .count()
    )
    # ONE bounded collect (top vocab_size rows) feeds BOTH rungs: the
    # unigram model (identical math to train_unigram_lm) and the
    # bigram conditional denominators
    top = counts.orderBy(F.desc("count"), F.asc("t")).limit(vocab_size).collect()
    total = sum(r["count"] for r in top)
    denom = total + alpha * (len(top) + 1)
    uni_vocab = [r["t"] for r in top]
    uni_logp = [math.log((r["count"] + alpha) / denom) for r in top]
    uni_oov = math.log(alpha / denom)
    uni_counts = {r["t"]: r["count"] for r in top}

    def pair_keys(toks: Column) -> Column:
        toks_ne = F.filter(toks, lambda t: t != "")
        n = F.size(toks_ne)
        return F.zip_with(
            F.slice(toks_ne, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks_ne, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )

    pair_counts = (
        corpus.select(
            F.explode(_let(tokens(F.col(text_col)), pair_keys)).alias("bg")
        )
        .groupBy("bg")
        .count()
        .orderBy(F.desc("count"), F.asc("bg"))
        .limit(bigram_size)
        .collect()
    )
    v1 = len(uni_counts) + 1
    keys, logps = [], []
    for r in pair_counts:
        w1 = r["bg"].split(" ", 1)[0]
        if w1 not in uni_counts:
            # context outside the kept vocab: the serving fold would
            # back off for w1 itself anyway — keep the table closed
            # under the vocab so the conditional denominator is exact
            continue
        keys.append(r["bg"])
        logps.append(
            math.log((r["count"] + alpha) / (uni_counts[w1] + alpha * v1))
        )
    return corpus.sparkSession.createDataFrame(
        [
            (
                uni_vocab,
                uni_logp,
                uni_oov,
                keys,
                logps,
                math.log(backoff),
            )
        ],
        "__lm_vocab: array<string>, __lm_logp: array<double>, "
        "__lm_oov: double, __bg_keys: array<string>, "
        "__bg_logp: array<double>, __bg_backoff: double",
    )


def bigram_logprob_score(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    out_col: str = "lm2_logprob",
) -> DataFrame:
    """Adds `out_col` = mean per-token log-probability under the
    stupid-backoff bigram LM from `train_bigram_lm`: the first token
    scores its unigram log-probability, every following token scores
    its seen-bigram conditional or log(backoff) + unigram. Higher =
    more reference-like; same gating contract as
    `unigram_logprob_score`, strictly sharper on word-order junk
    (shuffled or template text keeps its unigram distribution but
    loses its bigrams). Both maps ride one broadcast row; scoring is
    two let-bound folds over the token array — zero shuffles, zero
    Python, whole-stage codegen. Empty documents score the OOV
    log-probability."""
    from .dedup import _let
    from .text import tokens

    lm_map = lm.select(
        F.map_from_arrays(F.col("__lm_vocab"), F.col("__lm_logp")).alias("__lm"),
        "__lm_oov",
        F.map_from_arrays(F.col("__bg_keys"), F.col("__bg_logp")).alias("__bg"),
        "__bg_backoff",
    )

    def unigram_of(t: Column) -> Column:
        return F.coalesce(F.element_at(F.col("__lm"), t), F.col("__lm_oov"))

    def body(toks: Column) -> Column:
        toks_ne = F.filter(toks, lambda t: t != "")
        n = F.size(toks_ne)
        first = unigram_of(F.element_at(toks_ne, 1))
        pair_sum = F.aggregate(
            F.zip_with(
                F.slice(toks_ne, 1, F.greatest(n - 1, F.lit(0))),
                F.slice(toks_ne, 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("p"), b.alias("c")),
            ),
            F.lit(0.0),
            lambda acc, pr: acc
            + F.coalesce(
                F.element_at(
                    F.col("__bg"),
                    F.concat(pr["p"], F.lit(" "), pr["c"]),
                ),
                F.col("__bg_backoff") + unigram_of(pr["c"]),
            ),
        )
        return F.when(n > 0, (first + pair_sum) / n).otherwise(
            F.col("__lm_oov")
        )

    return (
        df.crossJoin(F.broadcast(lm_map))
        .withColumn(out_col, _let(tokens(F.col(text_col)), body))
        .drop("__lm", "__lm_oov", "__bg", "__bg_backoff")
    )
