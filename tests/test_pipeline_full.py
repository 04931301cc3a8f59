"""End-to-end corpus curation: a fixture with one defect of each kind
must come out with exactly the clean survivors."""

from __future__ import annotations

import pytest

from etl_process_for_fraud_transactions_spark.operators.pipeline import curate_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and then the fox "
    "runs far away into the green hills to rest for the day"
)
NEAR_GOOD = GOOD.replace("green hills", "blue hills")
FOOTER = "subscribe to the newsletter for more of the best updates"
LEAK = "what is the capital of france paris is the capital of france"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # 1: clean survivor
        (1, GOOD),
        # 2: exact duplicate of 1 (after normalization) -> dropped
        (2, GOOD.upper() + "!"),
        # 3: near duplicate of 1 -> dropped by near-dup clustering
        (3, NEAR_GOOD),
        # 4: repeated paragraph within the doc -> cleaned, kept
        (4, "the red cat sat on the old mat near the warm door today\n\n"
            "the red cat sat on the old mat near the warm door today"),
        # 5: too short after cleaning -> dropped by quality gate
        (5, "tiny text"),
        # 6: German -> dropped by language filter
        (6, "der schnelle braune fuchs und der faule hund ist da und "
            "der hund ist nicht schnell aber der fuchs ist sehr gut"),
        # 7: contains the benchmark answer -> dropped by decontamination
        (7, "quiz answers follow here " + LEAK + " and that is the end "
            "of the quiz answers for the day my friends"),
    ]
    # footer boilerplate on 12 filler docs so it crosses min_docs=10;
    # fillers are long, English and MUTUALLY DISTINCT (template fillers
    # differing only in a number are near-duplicates of each other and
    # would — correctly — collapse to one survivor)
    topics = [
        "cook rice and beans with garlic in the small red kitchen pot",
        "train dogs to sit and wait before the long morning walk begins",
        "plant roses and tulips along the sunny side of the wooden fence",
        "repair old bicycles with simple tools from the corner shop",
        "paint wide landscapes of the sea during the cold winter months",
        "brew strong coffee from fresh beans ground early every morning",
        "build wooden tables with joints that need no nails or screws",
        "study distant stars through a small telescope on the dark hill",
        "knit warm sweaters from thick wool bought at the spring fair",
        "sail small boats across the bay when the west wind is steady",
        "bake sour bread with a starter kept alive for twenty years",
        "climb steep granite walls with ropes and a careful old friend",
    ]
    rows += [
        (100 + i,
         f"this filler document talks at length about how to {topic}\n\n"
         + FOOTER)
        for i, topic in enumerate(topics)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_corpus_end_to_end(spark, corpus):
    bench = spark.createDataFrame([(1, LEAK)], "bench_id long, text string")
    out = {
        r.doc_id: r
        for r in curate_corpus(
            corpus, benchmark=bench, near_dup_threshold=0.5, min_tokens=10
        ).collect()
    }
    # survivors: 1 (clean), 4 (cleaned), all 12 fillers; dropped: 2
    # (exact dup), 3 (near dup), 5 (short), 6 (German), 7 (leak)
    assert set(out) == {1, 4} | {100 + i for i in range(12)}
    # 4's repeated paragraph was removed before token counting
    # (13 tokens = one copy, not 26)
    assert out[4].n_tokens == 13
    # the footer is gone from the fillers' curated text
    assert all(FOOTER not in out[100 + i].text for i in range(12))
    # split labels are deterministic hash buckets
    assert all(r.split in ("train", "val") for r in out.values())
    assert all(r.pred_lang == "en" for r in out.values())


def test_curate_corpus_without_benchmark_keeps_leak(spark, corpus):
    out = curate_corpus(corpus, near_dup_threshold=0.5, min_tokens=10)
    assert 7 in {r.doc_id for r in out.collect()}


def test_curate_corpus_custom_id_col(spark, corpus):
    """ADVICE r4: id_col != 'doc_id' must work end to end (every stage,
    including the token projection, threads the caller's id column)."""
    renamed = corpus.withColumnRenamed("doc_id", "page_id")
    bench = spark.createDataFrame([(1, LEAK)], "bench_id long, text string")
    out = curate_corpus(
        renamed,
        benchmark=bench,
        id_col="page_id",
        near_dup_threshold=0.5,
        min_tokens=10,
    )
    assert out.columns[0] == "page_id"
    ids = {r.page_id for r in out.collect()}
    assert ids == {1, 4} | {100 + i for i in range(12)}


def test_curate_corpus_gopher_gate(spark, corpus):
    """gopher_gate=True additionally drops documents failing the
    published Gopher rules (every fixture doc is < 50 words, so the
    word-count rule empties the corpus — proving the gate engages)."""
    strict = curate_corpus(
        corpus, near_dup_threshold=0.5, min_tokens=10, gopher_gate=True
    )
    assert strict.count() == 0
    relaxed = curate_corpus(corpus, near_dup_threshold=0.5, min_tokens=10)
    assert relaxed.count() > 0


def test_corpus_report_known_answers(spark):
    from pyspark.sql import functions as F

    from etl_process_for_fraud_transactions_spark.operators.pipeline import (
        corpus_report,
    )

    rows = [
        (1, "the cat sat on the mat and the dog sat too", "web"),
        (2, "the cat sat on the mat and the dog sat too", "web"),   # exact dup
        (3, "der schnelle braune fuchs und der faule hund ist da", "web"),
        (4, "plant roses and tulips along the sunny side of the fence", "books"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in corpus_report(docs).collect()}

    assert set(got) == {"web", "books", None}
    web = got["web"]
    assert web.n_docs == 3
    assert abs(web.exact_dup_rate - (1 - 2 / 3)) < 1e-12
    assert abs(web.pct_en - 2 / 3) < 1e-12  # doc 3 is German
    assert got["books"].n_docs == 1 and got["books"].exact_dup_rate == 0.0
    total = got[None]
    assert total.n_docs == 4
    assert total.total_tokens == sum(len(t.split()) for _, t, _ in rows)

    # global-only mode
    one = corpus_report(docs, source_col=None).collect()
    assert len(one) == 1 and one[0].n_docs == 4

    # one-shuffle shape: a single Expand+aggregate, no joins
    plan = corpus_report(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_curate_corpus_html_entry(spark):
    """html_col runs strip_html before the ladder — the batch twin of
    curate_stream's HTML entry point."""
    from etl_process_for_fraud_transactions_spark.operators.pipeline import (
        curate_corpus,
    )

    rows = [
        (1, "<html><head><style>p{}</style></head><body><p>the quick "
            "brown fox jumps over the lazy dog and then the fox runs "
            "far away into the green hills to rest</p></body></html>"),
        (2, "<p>tiny</p>"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, html string")
    out = curate_corpus(docs, html_col="html").collect()
    assert [r.doc_id for r in out] == [1]
    assert "<p>" not in out[0].text and "fox" in out[0].text


def test_curate_corpus_html_extractor_validated_unconditionally(spark):
    """Round 9 (ADVICE r8): a typo'd html_extractor must raise even
    when html_col is None — not silently no-op."""
    import pytest

    from etl_process_for_fraud_transactions_spark.operators.pipeline import (
        curate_corpus,
    )

    docs = spark.createDataFrame([(1, "some text")], "doc_id long, text string")
    with pytest.raises(ValueError, match="regex|dom"):
        curate_corpus(docs, html_extractor="bogus")


def test_curate_corpus_compression_gate(spark):
    """min_compression_ratio drops machine-repetitive text the other
    gates pass (valid tokens, valid language, plausible lengths)."""
    from etl_process_for_fraud_transactions_spark.operators.pipeline import (
        curate_corpus,
    )

    prose = (
        "the committee reviewed seventeen proposals and the board is "
        "expected to announce the final decision before the end of "
        "the quarter according to people familiar with the matter"
    )
    spam = ("the best offer is the best offer is " * 12).strip()
    docs = spark.createDataFrame(
        [(1, prose), (2, spam)], "doc_id long, text string"
    )
    out = curate_corpus(docs, min_compression_ratio=0.35).collect()
    assert [r.doc_id for r in out] == [1]
    # without the gate the spam passes (en markers + enough tokens)
    assert sorted(
        r.doc_id for r in curate_corpus(docs).collect()
    ) == [1, 2]


def test_curate_corpus_langid_stage(spark):
    """Round 10: the in-script langid stage annotates `langid` after
    the stopword route and filters to langid_languages — sibling
    Romance docs the stopword heuristic cannot split are routed by
    the frozen classifier."""
    from etl_process_for_fraud_transactions_spark.operators.langid import (
        FROZEN_ROMANCE,
        HELDOUT_SENTENCES,
    )

    rows = [
        (i * 10 + j, f"{s} {s}")
        for i, lang in enumerate(sorted(HELDOUT_SENTENCES))
        for j, s in enumerate(HELDOUT_SENTENCES[lang][:2])
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = curate_corpus(
        docs,
        min_tokens=3,
        languages=("en", "es", "fr", "de", "und"),
        near_dup_threshold=0.9,
        langid_model=FROZEN_ROMANCE,
        langid_languages=("pt",),
    ).collect()
    assert out, "pt docs must survive"
    assert {r["langid"] for r in out} == {"pt"}
    assert {r["doc_id"] for r in out} <= {20, 21}  # the pt rows
    # annotate-only mode: no filter, every surviving doc labeled
    ann = curate_corpus(
        docs,
        min_tokens=3,
        languages=("en", "es", "fr", "de", "und"),
        near_dup_threshold=0.9,
        langid_model=FROZEN_ROMANCE,
    ).collect()
    langs = {r["doc_id"]: r["langid"] for r in ann}
    for doc_id, lid in langs.items():
        assert lid == sorted(HELDOUT_SENTENCES)[doc_id // 10]


def test_curate_corpus_routed_langid_mapping(spark):
    """Round 11: passing a {dominant_script: model} mapping (e.g.
    langid.SCRIPT_FAMILIES) routes each doc to its script's frozen
    family — Latin, Cyrillic and Han docs annotate from three
    different profiles in one ladder run."""
    from etl_process_for_fraud_transactions_spark.operators.langid import (
        HELDOUT_SENTENCES,
        HELDOUT_SENTENCES_CYRILLIC,
        HELDOUT_SENTENCES_HAN,
        SCRIPT_FAMILIES,
    )

    # each doc carries a distinct ASCII anchor ("2023"/"2024"/"2025"):
    # the batch ladder's repetition stage normalizes paragraphs with
    # the ASCII default, so a paragraph with NO ASCII alphanumerics at
    # all normalizes empty and is dropped as noise (documented
    # curate_corpus limitation) — realistic non-Latin prose virtually
    # always contains digits/Latin tokens, and the anchors also keep
    # the ASCII-shingle near-dedup from collapsing the three docs
    rows = [
        (1, f"2023 {HELDOUT_SENTENCES['pt'][0]} {HELDOUT_SENTENCES['pt'][1]}"),
        (2, f"2024 {HELDOUT_SENTENCES_CYRILLIC['uk'][0]} "
            f"{HELDOUT_SENTENCES_CYRILLIC['uk'][1]}"),
        (3, f"2025 {HELDOUT_SENTENCES_HAN['ja'][0]} "
            f"{HELDOUT_SENTENCES_HAN['ja'][1]}"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = curate_corpus(
        docs,
        min_tokens=1,
        languages=("en", "es", "fr", "de", "und"),
        near_dup_threshold=0.9,
        langid_model=SCRIPT_FAMILIES,
    ).collect()
    langs = {r["doc_id"]: r["langid"] for r in out}
    assert langs == {1: "pt", 2: "uk", 3: "ja"}
    # and the filter leg composes with the routed verdicts
    kept = curate_corpus(
        docs,
        min_tokens=1,
        languages=("en", "es", "fr", "de", "und"),
        near_dup_threshold=0.9,
        langid_model=SCRIPT_FAMILIES,
        langid_languages=("ja",),
    ).collect()
    assert [r["doc_id"] for r in kept] == [3]


def test_curate_corpus_span_mask_cascade_option(spark):
    """span_mask_rungs routes the ladder's span stage through the
    multi-length cascade; passing both span knobs fails loudly."""
    import pytest

    shared = " ".join(f"dup{i:03d}" for i in range(70))
    docs = spark.createDataFrame(
        [
            (1, f"alpha prose begins here {shared} first ending words"),
            (2, f"beta prose starts over {shared} second closing words"),
            (3, "gamma wholly original material with nothing repeated"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.text
        for r in curate_corpus(
            docs,
            min_tokens=2,
            languages=("en", "und"),
            near_dup_threshold=0.95,
            span_mask_rungs=((64, 2),),
        ).collect()
    }
    assert "dup000" not in out[1] and "dup000" not in out[2]
    assert "original" in out[3]
    with pytest.raises(ValueError, match="not both"):
        curate_corpus(docs, span_mask_min_docs=3, span_mask_rungs=((64, 2),))
