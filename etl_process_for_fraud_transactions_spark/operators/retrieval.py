"""BM25 keyword retrieval over a document corpus.

Reference surface: none — the reference ETL (`/root/reference/main.py`)
has no text-retrieval path; this module is part of the LLM-training-
data extension (SURVEY.md §2 "beyond the reference"), where ranked
keyword retrieval is the standard tool for data selection ("find the
docs most like this probe set"), contamination triage ("which corpus
docs score highest against this benchmark question") and corpus QA.

Scoring is Okapi BM25 with the Lucene/Robertson idf:

    idf(t)  = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))
    s(q, d) = sum over t in q of
              idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

Scale design (the 100 TB framing):

- The query workload is BOUNDED BY CONSTRUCTION (a user-supplied term
  list, not data-derived), so the distinct query-term set broadcasts
  unconditionally — the one hint in this module that is safe by the
  repo's own broadcast-audit standard (BASELINE.md round-9 audit,
  class 1).
- Postings are pruned to query terms MAP-SIDE, before any exchange:
  explode -> broadcast-hash semi join -> partial aggregate. The
  shuffle therefore carries only (doc_id, matched-term) pairs — for a
  realistic query (tens of terms) that is a vanishing fraction of the
  corpus; the document text itself never enters an exchange.
- df / N / avgdl are bounded rollups: |query vocab| rows and one
  global pair, rejoined by broadcast.
- No Python in the plan: tokenization, tf, idf and the score are all
  built-in expressions inside whole-stage codegen.

Cross-engine determinism (the oracle contract): every arithmetic step
is a single IEEE-754 op (identical in any engine) except ln() — 1-ulp
libm divergence — and the per-(query, doc) sum.  The sum is made
order-independent by the repo's dsum trick (per-term contribution cast
to DECIMAL, exact decimal sum, cast back); the ln residual is absorbed
by reporting round(score, 6) and by ranking on the ROUNDED score with
a doc-id tie-break, so rank is fully determined by values both engines
agree on. Same residual-risk class as ivf_centroids' documented ulp
caveat.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import tokens

__all__ = ["terms_frame", "bm25_scores", "bm25_topk"]

#: decimal scale for the exact contribution sum (dsum pattern,
#: plans/queries.py): BM25 contributions are O(0..20), so
#: DECIMAL(18,9) keeps 9 exact fractional digits with no overflow
#: until ~10^9 summed terms per (query, doc) — far past any real
#: query length.
_SUM_SCALE = 9


def terms_frame(
    spark: SparkSession, queries: Mapping[str, Sequence[str]]
) -> DataFrame:
    """(query_id, term) pairs from a {query_id: [term, ...]} mapping —
    the bounded query-workload frame `bm25_scores` consumes. Terms are
    normalized with the corpus tokenizer's conventions (lowercase) so
    a caller's 'Hash' matches the normalized corpus token 'hash'."""
    rows = [
        (qid, term.lower())
        for qid, terms in sorted(queries.items())
        for term in terms
    ]
    return spark.createDataFrame(rows, "query_id: string, term: string")


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.5,
    b: float = 0.75,
) -> DataFrame:
    """Score every document against every query it shares a term with:
    (query_id, <id_col>, n_terms_matched, score), score rounded to
    6 dp (see module docstring for why). Documents matching no term of
    a query are absent — BM25 gives them score 0 and a retrieval
    system never materializes the zero set.

    `queries` is a (query_id, term) frame — build one with
    `terms_frame`. k1/b default to the standard 1.5/0.75; keep them
    dyadic if the oracle-exactness argument should stay airtight."""
    toks_ne = F.filter(tokens(F.col(text_col)), lambda t: t != "")

    # one corpus pass: dl carried alongside the explode so no second
    # join against a doc-length relation is needed
    exploded = docs.select(
        F.col(id_col),
        F.size(toks_ne).alias("__dl"),
        F.explode(toks_ne).alias("term"),
    )
    qterms = queries.select("term").distinct()
    # map-side prune BEFORE the (doc, term) shuffle — the broadcast is
    # bounded by construction (user query workload)
    post = (
        exploded.join(F.broadcast(qterms), "term")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("__tf"), F.max("__dl").alias("__dl"))
    )
    # global stats: exact integer sum / count, ONE double division —
    # bit-identical in any IEEE engine (avg() folds doubles in
    # partition order, so it is NOT used)
    stats = docs.select(
        F.count(F.lit(1)).alias("__n"),
        (
            F.sum(F.size(toks_ne)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("__avgdl"),
    )
    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))

    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
    )
    tf = F.col("__tf").cast("double")
    norm_len = F.lit(1.0 - b) + F.lit(b) * (
        F.col("__dl").cast("double") / F.col("__avgdl")
    )
    contrib = idf * (tf * F.lit(k1 + 1.0)) / (tf + F.lit(k1) * norm_len)

    scored = (
        post.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(queries), "term")
        .groupBy("query_id", id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            # dsum: exact decimal sum -> order-independent
            F.round(
                F.sum(
                    contrib.cast(f"decimal(18,{_SUM_SCALE})")
                ).cast("double"),
                6,
            ).alias("score"),
        )
    )
    return scored


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    topk: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.5,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents per query by BM25: (query_id, rank, <id_col>,
    n_terms_matched, score). Rank is a row_number over (rounded score
    DESC, <id_col> ASC) — deterministic, and WindowGroupLimit keeps the
    per-partition state at k rows (the top_orders_per_customer plan
    shape), so the ranking never materializes the full scored set."""
    from pyspark.sql.window import Window

    scored = bm25_scores(
        docs, queries, text_col=text_col, id_col=id_col, k1=k1, b=b
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", id_col, "n_terms_matched", "score")
    )
