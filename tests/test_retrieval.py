"""BM25 retrieval (operators/retrieval.py): exact scores on a
hand-computed corpus, ranking properties, and the map-side-prune plan
invariant. The cross-engine hash gate is the `bm25_topk_docs` driver
row (tests/test_queries_oracle.py replays it at sf0.001)."""

from __future__ import annotations

import math

from etl_process_for_fraud_transactions_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
    terms_frame,
)


def _corpus(spark):
    rows = [
        (1, "hash join hash join hash"),       # dl 5, tf(hash)=3 tf(join)=2
        (2, "hash scan scan scan scan"),        # dl 5, tf(hash)=1
        (3, "merge sort merge sort"),           # dl 4, no query terms for q1' hash
        (4, "hash"),                            # dl 1, tf(hash)=1 (short doc)
    ]
    return spark.createDataFrame(rows, "doc_id: int, text: string")


def _expected_bm25(tf, dl, df, n, avgdl, k1=1.5, b=0.75):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_bm25_scores_match_hand_computation(spark):
    docs = _corpus(spark)
    q = terms_frame(spark, {"q": ["hash", "join"]})
    got = {
        r["doc_id"]: (r["n_terms_matched"], r["score"])
        for r in bm25_scores(docs, q).collect()
    }
    n, avgdl = 4, (5 + 5 + 4 + 1) / 4.0
    exp1 = _expected_bm25(3, 5, 3, n, avgdl) + _expected_bm25(2, 5, 1, n, avgdl)
    exp2 = _expected_bm25(1, 5, 3, n, avgdl)
    exp4 = _expected_bm25(1, 1, 3, n, avgdl)
    assert set(got) == {1, 2, 4}  # doc 3 matches no term -> absent
    assert got[1][0] == 2 and got[2][0] == 1 and got[4][0] == 1
    for doc, exp in ((1, exp1), (2, exp2), (4, exp4)):
        assert abs(got[doc][1] - round(exp, 6)) < 2e-6, (doc, got[doc], exp)


def test_bm25_ranking_properties(spark):
    """Rarer term outranks common term at equal tf/dl; shorter doc
    outranks longer at equal tf; rank is dense 1..k with the doc_id
    tie-break."""
    rows = [
        (1, "rare common filler filler"),
        (2, "common filler filler filler"),
        (3, "common filler filler filler"),  # tie with doc 2
        (4, "rare common"),                  # shorter: beats doc 1 on both
    ]
    docs = spark.createDataFrame(rows, "doc_id: int, text: string")
    q = terms_frame(spark, {"q": ["rare", "common"]})
    top = bm25_topk(docs, q, topk=10).collect()
    ranked = [r["doc_id"] for r in sorted(top, key=lambda r: r["rank"])]
    assert ranked[0] == 4  # shorter doc with the rare term wins
    assert ranked[1] == 1  # rare-term doc beats common-only docs
    assert ranked[2:] == [2, 3]  # exact tie broken by doc_id
    assert [r["rank"] for r in sorted(top, key=lambda r: r["rank"])] == [
        1, 2, 3, 4,
    ]
    scores = {r["doc_id"]: r["score"] for r in top}
    assert scores[2] == scores[3]


def test_terms_frame_normalizes_case(spark):
    docs = spark.createDataFrame(
        [(1, "hash join")], "doc_id: int, text: string"
    )
    got = bm25_scores(docs, terms_frame(spark, {"q": ["HASH"]})).collect()
    assert len(got) == 1 and got[0]["n_terms_matched"] == 1


def test_bm25_absent_terms_and_empty_query_results(spark):
    docs = _corpus(spark)
    got = bm25_scores(
        docs, terms_frame(spark, {"q": ["zzz_not_in_corpus"]})
    ).collect()
    assert got == []


def test_bm25_postings_pruned_before_exchange(spark):
    """The 100 TB invariant: the broadcast semi-join against the query
    terms sits BELOW the first Exchange, so the shuffle carries only
    matched postings — and the raw text column never enters any
    Exchange."""
    docs = _corpus(spark)
    q = terms_frame(spark, {"q": ["hash", "join"]})
    plan = (
        bm25_topk(docs, q)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    first_exchange = plan.index("Exchange")
    first_bcast_join = plan.index("BroadcastHashJoin")
    # toString prints parents above children: the pruning join must
    # appear AFTER (= deeper than) the first exchange in the tree walk
    assert first_bcast_join > first_exchange
    for line in plan.splitlines():
        if line.strip().startswith("Exchange"):
            assert "text#" not in line, line
