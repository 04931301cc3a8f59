"""Repetition removal: within-document paragraph dedup and corpus
boilerplate stripping, with python brute-force replays."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from etl_process_for_fraud_transactions_spark.operators.text import (
    dedup_paragraphs_within,
    paragraph_doc_frequencies,
    strip_boilerplate_paragraphs,
)


def _norm(p: str) -> str:
    return re.sub(r"[^a-z0-9]+", " ", p.lower()).strip()


def test_dedup_paragraphs_within_known_answer(spark):
    text = "Alpha one.\n\nBeta two.\n\nALPHA one!\n\nGamma.\n\nBeta two."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = dedup_paragraphs_within(df).collect()[0]
    # normalized repeats of alpha and beta dropped, first forms kept,
    # order preserved
    assert out.text == "Alpha one.\n\nBeta two.\n\nGamma."
    assert out.n_paragraphs_dropped == 2


def test_dedup_paragraphs_within_bruteforce(spark):
    import random

    rng = random.Random(9)
    paras = [f"para {i} body" for i in range(6)]
    rows = []
    for d in range(25):
        seq = [rng.choice(paras) for _ in range(rng.randint(1, 10))]
        rows.append((d, "\n\n".join(seq)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.text, r.n_paragraphs_dropped) for r in dedup_paragraphs_within(df).collect()}
    for d, text in rows:
        seen, kept = set(), []
        for p in text.split("\n\n"):
            n = _norm(p)
            if n and n not in seen:
                seen.add(n)
                kept.append(p)
        assert got[d] == ("\n\n".join(kept), len(text.split("\n\n")) - len(kept)), d


def test_dedup_paragraphs_is_map_only(spark):
    df = spark.createDataFrame([(1, "a\n\nb")], "doc_id long, text string")
    plan = (
        dedup_paragraphs_within(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_boilerplate_strip(spark):
    footer = "Subscribe to our newsletter today"
    rows = [
        (i, f"Unique content number {i}.\n\n{footer}") for i in range(12)
    ] + [(99, "A document with no footer at all")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    freqs = {
        r.sample: r.n_docs for r in paragraph_doc_frequencies(df).collect()
    }
    assert freqs[footer] == 12

    out = {r.doc_id: (r.text, r.n_paragraphs_dropped) for r in
           strip_boilerplate_paragraphs(df, min_docs=10).collect()}
    assert len(out) == 13  # every document survives, text rewritten
    for i in range(12):
        assert out[i] == (f"Unique content number {i}.", 1)
    assert out[99] == ("A document with no footer at all", 0)
    # below threshold: nothing stripped
    untouched = {r.doc_id: r.n_paragraphs_dropped for r in
                 strip_boilerplate_paragraphs(df, min_docs=13).collect()}
    assert all(v == 0 for v in untouched.values())


def test_boilerplate_strip_no_doc_shuffle(spark):
    """The frequent set broadcasts; documents themselves never hit a
    hash-partition exchange."""
    df = spark.createDataFrame([(1, "a\n\nb"), (2, "a\n\nc")], "doc_id long, text string")
    plan = (
        strip_boilerplate_paragraphs(df, min_docs=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan  # one-row frequent set
    assert "SortMergeJoin" not in plan


def test_chained_stages_single_cumulative_drop_count(spark):
    """ADVICE r4: strip_boilerplate after dedup_paragraphs_within must
    produce ONE n_paragraphs_dropped column holding the cumulative
    count, not two ambiguous same-named columns."""
    footer = "shared footer line"
    rows = [(i, f"unique text {i}\n\n{footer}") for i in range(10)]
    # doc 50 additionally repeats its own paragraph (1 within-doc drop)
    rows.append((50, f"repeated para\n\nrepeated para\n\n{footer}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = strip_boilerplate_paragraphs(
        dedup_paragraphs_within(df), min_docs=10
    )
    assert out.columns.count("n_paragraphs_dropped") == 1
    got = {r.doc_id: r.n_paragraphs_dropped for r in out.collect()}
    assert got[50] == 2  # 1 within-doc + 1 boilerplate
    assert all(got[i] == 1 for i in range(10))  # boilerplate only


class TestFrequentSpans:
    def _docs(self, spark):
        boiler = (
            "this message and any attachments are confidential and intended "
            "solely for the named recipient please delete it immediately"
        )  # 19 tokens > span_tokens=16
        rows = [
            (1, "alpha beta gamma " + boiler + " delta epsilon zeta"),
            (2, "one two three four five " + boiler),
            (3, boiler + " completely different tail content here"),
            (4, "clean document about spark adaptive execution with no "
                "shared material inside it at all whatsoever today friends"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string"), boiler

    def test_span_doc_frequencies_finds_cross_doc_windows(self, spark):
        from etl_process_for_fraud_transactions_spark.operators.text import (
            span_doc_frequencies,
        )

        docs, _ = self._docs(spark)
        freq = span_doc_frequencies(docs, span_tokens=16, min_docs=3).collect()
        assert len(freq) >= 1
        assert all(r.n_docs == 3 for r in freq)

    def test_mask_frequent_spans_removes_all_copies(self, spark):
        from etl_process_for_fraud_transactions_spark.operators.text import (
            mask_frequent_spans,
        )

        docs, boiler = self._docs(spark)
        out = {
            r.doc_id: r
            for r in mask_frequent_spans(
                docs, span_tokens=16, min_docs=3
            ).collect()
        }
        for d in (1, 2, 3):
            assert "confidential" not in out[d].text, out[d].text
            assert out[d].n_span_tokens_dropped >= 16
        # unique content survives
        assert "alpha beta gamma" in out[1].text
        assert "delta epsilon zeta" in out[1].text
        assert "one two three four five" in out[2].text
        assert "completely different tail content" in out[3].text
        # untouched doc: identical normalized text, zero dropped
        assert out[4].n_span_tokens_dropped == 0
        assert "spark adaptive execution" in out[4].text

    def test_mask_matches_python_bruteforce(self, spark):
        """Seeded random corpus with planted shared runs vs an
        independent python replay of the same window semantics."""
        import random

        from etl_process_for_fraud_transactions_spark.operators.text import (
            mask_frequent_spans,
        )

        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(40)]
        shared = [f"s{i}" for i in range(8)]  # planted 8-token run
        rows = []
        for d in range(12):
            toks = [rng.choice(vocab) for _ in range(rng.randrange(10, 25))]
            if d < 5:  # plant the shared run in 5 docs
                at = rng.randrange(0, len(toks))
                toks = toks[:at] + shared + toks[at:]
            rows.append((d, " ".join(toks)))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        L, M = 8, 4

        # python replay
        def windows(toks):
            return [tuple(toks[i : i + L]) for i in range(len(toks) - L + 1)]

        from collections import Counter

        dfreq = Counter()
        for _, t in rows:
            for w in set(windows(t.split())):
                dfreq[w] += 1
        frequent = {w for w, c in dfreq.items() if c >= M}
        expect = {}
        for d, t in rows:
            toks = t.split()
            cov = set()
            for i, w in enumerate(windows(toks)):
                if w in frequent:
                    cov.update(range(i, i + L))
            expect[d] = " ".join(
                t for i, t in enumerate(toks) if i not in cov
            )

        got = {
            r.doc_id: r.text
            for r in mask_frequent_spans(docs, span_tokens=L, min_docs=M).collect()
        }
        assert got == expect

    def test_portable_hash_mode_same_verdicts(self, spark):
        """portable=True (md5-derived window hashes, the oracle-
        replayable twin) must mask exactly the same tokens as the
        xxhash64 default — only the hash VALUES differ, never the
        frequency verdicts or the rewritten text."""
        from etl_process_for_fraud_transactions_spark.operators.text import (
            mask_frequent_spans,
            span_doc_frequencies,
        )

        docs, _ = self._docs(spark)
        fast = {
            r.doc_id: (r.text, r.n_span_tokens_dropped)
            for r in mask_frequent_spans(
                docs, span_tokens=16, min_docs=3, portable=False
            ).collect()
        }
        port = {
            r.doc_id: (r.text, r.n_span_tokens_dropped)
            for r in mask_frequent_spans(
                docs, span_tokens=16, min_docs=3, portable=True
            ).collect()
        }
        assert fast == port
        # frequency tables agree on (count, multiplicity) shape
        f1 = sorted(
            r.n_docs
            for r in span_doc_frequencies(
                docs, span_tokens=16, min_docs=3, portable=False
            ).collect()
        )
        f2 = sorted(
            r.n_docs
            for r in span_doc_frequencies(
                docs, span_tokens=16, min_docs=3, portable=True
            ).collect()
        )
        assert f1 == f2 and len(f1) >= 1

    def test_short_docs_pass_through_untouched(self, spark):
        """Documents shorter than one window must flow through both
        span operators unharmed — regression: sequence(1, 0) is a
        DESCENDING [1, 0] in Spark and slice(toks, 0, L) raises."""
        from etl_process_for_fraud_transactions_spark.operators.text import (
            mask_frequent_spans,
            span_doc_frequencies,
        )

        docs = spark.createDataFrame(
            [(1, "short doc"), (2, "also tiny"), (3, "")],
            "doc_id long, text string",
        )
        assert span_doc_frequencies(docs, span_tokens=16, min_docs=1).count() == 0
        out = {
            r.doc_id: r
            for r in mask_frequent_spans(docs, span_tokens=16, min_docs=2).collect()
        }
        assert out[1].text == "short doc"
        assert all(r.n_span_tokens_dropped == 0 for r in out.values())

    def test_curate_corpus_span_mask_stage(self, spark):
        """curate_corpus(span_mask_min_docs=...) strips planted
        mid-text boilerplate that paragraph-level stripping misses."""
        from etl_process_for_fraud_transactions_spark.operators.pipeline import (
            curate_corpus,
        )

        docs, boiler = self._docs(spark)
        out = {
            r.doc_id: r.text
            for r in curate_corpus(
                docs,
                min_tokens=3,
                span_mask_min_docs=3,
                # fixture docs are stopword-light: some detect as 'und'
                languages=("en", "und"),
            ).collect()
        }
        assert all("confidential" not in t for t in out.values())
        assert 4 in out  # clean doc survives


class TestMultiLengthSpanMaskCascade:
    """Round 11: the (L, min_docs) cascade — evidence scales with
    length, so the long rung masks at a lower frequency threshold
    than the short rung could afford."""

    def _docs(self, spark):
        shared = " ".join(f"shared{i:03d}" for i in range(128))
        rows = [
            (1, f"alpha one two {shared} omega one"),
            (2, f"beta three four {shared} kappa two"),
            (3, "gamma entirely distinct prose with no repeats at all"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_long_rung_catches_what_short_rung_misses(self, spark):
        """A 128-token run shared by exactly TWO documents: invisible
        to a single (64, min_docs=3) pass — only 2 witnesses — but
        caught by the (128, min_docs=2) rung of the cascade."""
        from etl_process_for_fraud_transactions_spark.operators.text import (
            mask_frequent_spans,
            mask_frequent_spans_multi,
        )

        docs = self._docs(spark)
        single = {
            r.doc_id: r.n_span_tokens_dropped
            for r in mask_frequent_spans(
                docs, span_tokens=64, min_docs=3
            ).collect()
        }
        assert single == {1: 0, 2: 0, 3: 0}  # 2 witnesses < 3: missed

        cascade = {
            r.doc_id: r
            for r in mask_frequent_spans_multi(
                docs, rungs=((64, 3), (128, 2))
            ).collect()
        }
        # the shared 128-token run (and only it) is masked from both
        assert cascade[1].n_span_tokens_dropped == 128
        assert cascade[2].n_span_tokens_dropped == 128
        assert cascade[3].n_span_tokens_dropped == 0
        assert "shared000" not in cascade[1].text
        assert cascade[1].text == "alpha one two omega one"
        assert cascade[2].text == "beta three four kappa two"

    def test_cumulative_counts_are_union_coverage(self, spark):
        """Overlapping rungs count each masked token ONCE: with both
        (64, 2) and (128, 2) flagging the same shared run, the drop
        count equals the run length, not the sum over rungs, and
        always equals len(tokens) - len(kept)."""
        from etl_process_for_fraud_transactions_spark.operators.text import (
            mask_frequent_spans,
            mask_frequent_spans_multi,
        )

        docs = self._docs(spark)
        got = {
            r.doc_id: r
            for r in mask_frequent_spans_multi(
                docs, rungs=((64, 2), (128, 2))
            ).collect()
        }
        for doc_id, masked in ((1, 128), (2, 128), (3, 0)):
            r = got[doc_id]
            assert r.n_span_tokens_dropped == masked
            orig = [
                x.text
                for x in docs.filter(F.col("doc_id") == doc_id).collect()
            ][0]
            assert (
                len(orig.split()) - len(r.text.split() if r.text else [])
                == masked
            )
        # and the cascade is a superset of each single rung's mask
        single64 = {
            r.doc_id: r.n_span_tokens_dropped
            for r in mask_frequent_spans(
                docs, span_tokens=64, min_docs=2
            ).collect()
        }
        for d in (1, 2, 3):
            assert got[d].n_span_tokens_dropped >= single64[d]

    def test_rung_validation(self, spark):
        import pytest

        from etl_process_for_fraud_transactions_spark.operators.text import (
            mask_frequent_spans_multi,
        )

        docs = self._docs(spark)
        with pytest.raises(ValueError, match="non-empty"):
            mask_frequent_spans_multi(docs, rungs=())
        with pytest.raises(ValueError, match="duplicate"):
            mask_frequent_spans_multi(docs, rungs=((64, 2), (64, 3)))


def test_span_cascade_persist_registry_opt_in(spark):
    """Round 12 (ADVICE r11): the cascade's tokenized base caches ONLY
    when the caller passes a persist_registry (release handle), the
    cached run returns identical rows to the lazy run, and releasing
    the registry restores the cache to its prior state."""
    from etl_process_for_fraud_transactions_spark.operators.text import (
        mask_frequent_spans_multi,
    )

    words = lambda n, tag: " ".join(f"{tag}{i}" for i in range(n))
    shared = words(40, "dup")
    docs = spark.createDataFrame(
        [
            (1, f"{shared} {words(10, 'a')}"),
            (2, f"{shared} {words(10, 'b')}"),
            (3, words(50, "c")),
        ],
        "doc_id: long, text: string",
    )
    rungs = ((8, 2), (16, 2))
    key = lambda out: sorted(
        (r["doc_id"], r["text"], r["n_span_tokens_dropped"])
        for r in out.collect()
    )
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()

    lazy = key(mask_frequent_spans_multi(docs, rungs=rungs))
    # no opt-in: no NEW cache (<=, not ==: Spark's async ContextCleaner
    # may shrink the global count while this test runs — asserting
    # equality against a global snapshot is flaky in a full-suite
    # session; the cached path below asserts on ITS OWN frame instead)
    assert jsc.getPersistentRDDs().size() <= before

    registry: list = []
    cached_df = mask_frequent_spans_multi(
        docs, rungs=rungs, persist_registry=registry
    )
    assert key(cached_df) == lazy
    assert len(registry) == 1
    frame = registry[0]
    lvl = frame.storageLevel
    assert lvl.useMemory or lvl.useDisk  # genuinely persisted
    frame.unpersist(blocking=True)
    lvl = frame.storageLevel
    assert not (lvl.useMemory or lvl.useDisk)  # release handle works
