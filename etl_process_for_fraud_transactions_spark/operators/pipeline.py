"""The full corpus-curation recipe: every cleaning stage this engine
provides, composed in the order a production training-data pipeline
runs them.

    raw documents
      -> within-document paragraph dedup      (map-only)
      -> corpus boilerplate stripping          (freq shuffle + broadcast)
      -> optional repeated-span masking        (hash shuffle, span_mask_min_docs=)
      -> exact dedup                           (fingerprint shuffle)
      -> near-dup clustering, keep survivors   (LSH bands + components)
      -> quality gate (token count)            (narrow)
      -> optional Gopher-rule gate             (narrow, gopher_gate=True)
      -> optional learned quality gate         (narrow, quality_model=)
      -> optional LM perplexity gate            (narrow, unigram_lm= — a
         train_bigram_lm model upgrades it to the stupid-backoff bigram rung)
      -> language filter                       (narrow)
      -> benchmark decontamination             (broadcast join)
      -> deterministic train/val split         (narrow)

Stage order matters: repetition removal runs FIRST so boilerplate
can't dominate shingle sets and mask real near-duplicates; exact dedup
runs before near-dup so identical texts collapse cheaply (one
fingerprint shuffle) instead of flooding the LSH candidate join; and
decontamination runs on the deduplicated corpus so each leaked
benchmark item is reported once, not once per copy.

The registered `corpus_curation_pipeline` query remains the
oracle-checked core (exact dedup + quality + language + split, fully
SQL-twinnable); this module is the superset recipe whose extra stages
(zlib-free but hash/iteration-based) are pinned by the e2e pytest
instead of a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decontaminate import decontaminate
from .dedup import dedup_exact, near_dedup
from .sampling import train_val_split
from .text import (
    _lang_exprs_from,
    _with_tokens,
    dedup_paragraphs_within,
    strip_boilerplate_paragraphs,
)


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    languages: tuple[str, ...] = ("en",),
    near_dup_threshold: float = 0.6,
    boilerplate_min_docs: int = 10,
    decontaminate_k: int = 8,
    val_buckets: int = 2,
    gopher_gate: bool = False,
    quality_model=None,
    min_quality: float = 0.5,
    span_mask_min_docs: int | None = None,
    span_mask_rungs: tuple[tuple[int, int], ...] | None = None,
    unigram_lm=None,
    min_lm_logprob: float | None = None,
    decontaminate_prefilter: str | None = None,
    decontaminate_bloom=None,
    html_col: str | None = None,
    min_compression_ratio: float | None = None,
    html_extractor: str = "regex",
    langid_model=None,
    langid_languages: tuple[str, ...] | None = None,
    langid_abstain_label: str | None = None,
) -> DataFrame:
    """Returns (id, text, n_tokens, pred_lang[, langid], split) — the
    curated,
    deduplicated, decontaminated, split corpus. `benchmark` (optional)
    is an eval-set frame with (bench_id, text) used for leakage
    removal. `html_col` (optional) runs HTML->text extraction first,
    so a raw web-crawl corpus enters the ladder as visible text — the
    batch twin of streaming.curation.curate_stream(html_col=...).
    Known ASCII-default limitation: the repetition stages normalize
    paragraphs with the ASCII `normalize_text`, so a paragraph with
    ZERO ASCII alphanumerics (pure non-Latin prose carrying no digits
    or Latin tokens at all) normalizes empty and drops as noise —
    realistic web documents virtually always carry some; a fully
    non-Latin corpus should enter via curate_stream's stateless gates
    or the unicode tokenizer family instead.
    `html_extractor` picks the extraction rung: 'regex' (strip_html —
    keep-everything chained expressions, one codegen stage) or 'dom'
    (extract.extract_main_content — boilerpipe-classifier +
    semantic-chrome pruning via Arrow-batched mapInPandas, drops
    nav/sidebar/footer chrome at the price of a Python stage). See
    module docstring for stage order rationale; each stage is
    individually tested and plan-audited in its own module."""
    # validated unconditionally: a typo'd extractor with no html_col
    # must fail loudly, not silently no-op (ADVICE r8)
    if html_extractor not in ("regex", "dom"):
        raise ValueError(
            f"html_extractor must be regex|dom, got {html_extractor!r}"
        )
    if html_col is not None:
        if html_extractor == "regex":
            from .text import strip_html

            docs = strip_html(docs, html_col, text_col)
        else:
            from .extract import extract_main_content

            docs = extract_main_content(docs, html_col, text_col).drop(
                "n_content_blocks", "n_boilerplate_blocks"
            )
    cleaned = strip_boilerplate_paragraphs(
        dedup_paragraphs_within(docs, text_col, id_col),
        text_col,
        id_col,
        min_docs=boilerplate_min_docs,
    ).drop("n_paragraphs_dropped")

    if span_mask_min_docs is not None and span_mask_rungs is not None:
        raise ValueError(
            "pass span_mask_min_docs (single fixed-L pass) OR "
            "span_mask_rungs (multi-length cascade), not both"
        )
    if span_mask_min_docs is not None:
        # sub-paragraph boilerplate (templated sentences, mid-text
        # disclaimers); rewrites text to normalized tokens, so the
        # char-level quality features downstream see normalized text
        # when this stage is on
        from .text import mask_frequent_spans

        cleaned = mask_frequent_spans(
            cleaned, text_col, id_col, min_docs=span_mask_min_docs
        ).drop("n_span_tokens_dropped")
    elif span_mask_rungs is not None:
        # the multi-length cascade (round 11): (L, min_docs) rungs
        # sharing one tokenization — the Spark-native approximation of
        # substring-level dedup; see text.mask_frequent_spans_multi
        from .text import mask_frequent_spans_multi

        cleaned = mask_frequent_spans_multi(
            cleaned, text_col, id_col, rungs=span_mask_rungs
        ).drop("n_span_tokens_dropped")

    exact = dedup_exact(cleaned, text_col, id_col)
    survivors = near_dedup(
        exact, text_col, id_col, threshold=near_dup_threshold
    ).filter(F.col("is_survivor"))
    kept = exact.join(survivors.select(id_col), id_col, "left_semi")

    # _with_tokens projects (id, __text, __toks): metrics reference
    # the materialized token attribute, then the text gets its name back
    toksed = _with_tokens(kept, text_col, id_col)
    _, pred = _lang_exprs_from(F.col("__toks"))
    gated = (
        toksed.withColumn("n_tokens", F.size(F.col("__toks")))
        .withColumn("pred_lang", pred)
        .select(
            id_col,
            F.col("__text").alias(text_col),
            "n_tokens",
            "pred_lang",
        )
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & F.col("pred_lang").isin(list(languages))
        )
    )

    if langid_model is not None:
        # in-script language ID (the CCNet ordering: the cheap
        # stopword/script route above, THEN the frozen n-gram
        # classifier within the surviving family) — one broadcast of
        # the one-row model + a let-bound gram fold, annotating
        # `langid` and optionally filtering to `langid_languages`.
        # A Mapping {dominant_script: LangIdModel} (e.g.
        # langid.SCRIPT_FAMILIES) routes each document to its
        # script's family first (round 11); a bare LangIdModel
        # applies one family to every row.
        from collections.abc import Mapping as _Mapping

        from .langid import classify_language, classify_language_routed

        # langid_abstain_label (round 12): below-confidence verdicts
        # come out as the abstain token instead of a forced in-family
        # language — so a langid_languages filter on a multilingual
        # crawl drops out-of-family docs rather than silently keeping
        # them under a sibling label (VERDICT r11 item 2).
        if isinstance(langid_model, _Mapping):
            gated = classify_language_routed(
                gated,
                langid_model,
                text_col,
                out_col="langid",
                abstain_label=langid_abstain_label,
            ).drop("langid_script")
        else:
            gated = classify_language(
                gated,
                langid_model,
                text_col,
                out_col="langid",
                abstain_label=langid_abstain_label,
            )
        if langid_languages is not None:
            gated = gated.filter(
                F.col("langid").isin(list(langid_languages))
            )

    if gopher_gate:
        # hard document-quality gate (published Gopher rules) on top of
        # the min_tokens floor; map-only, so it fuses into the same stage
        from .text import gopher_quality_flags

        ok = gopher_quality_flags(gated, text_col, id_col).filter(
            F.col("passes_gopher")
        )
        gated = gated.join(ok.select(id_col), id_col, "left_semi")

    if quality_model is not None:
        # learned gray-zone ranking on top of the structural gates —
        # one folded sigmoid expression, fuses into the same stage
        from .quality_model import score_quality

        gated = (
            score_quality(gated, quality_model, text_col)
            .filter(F.col("quality_score") >= min_quality)
            .drop("quality_score")
        )

    if unigram_lm is not None:
        # perplexity-proxy gate: mean token log-prob under a trusted
        # reference LM; threshold chosen from the reference's own
        # score distribution. A model from train_bigram_lm upgrades
        # the gate to the stupid-backoff bigram scorer (sharper on
        # word-order junk) — detected by its extra columns, so one
        # parameter serves both rungs and thresholds stay the
        # caller's responsibility per model.
        if min_lm_logprob is None:
            raise ValueError("unigram_lm needs min_lm_logprob")
        if "__bg_keys" in unigram_lm.columns:
            from .quality_model import bigram_logprob_score

            gated = (
                bigram_logprob_score(gated, unigram_lm, text_col)
                .filter(F.col("lm2_logprob") >= min_lm_logprob)
                .drop("lm2_logprob")
            )
        else:
            from .quality_model import unigram_logprob_score

            gated = (
                unigram_logprob_score(gated, unigram_lm, text_col)
                .filter(F.col("lm_logprob") >= min_lm_logprob)
                .drop("lm_logprob")
            )

    if min_compression_ratio is not None:
        # zlib repetitiveness gate — the one Python (Arrow-batched)
        # stage in the ladder, so it runs LAST among the quality
        # gates, over the already-thinned corpus
        from .text import compression_ratio

        gated = (
            compression_ratio(gated, text_col)
            .filter(F.col("compression_ratio") >= min_compression_ratio)
            .drop("compression_ratio")
        )

    if benchmark is not None:
        # prefilter/bloom: the mega-benchmark cascade, threaded through
        # so one prebuilt bitset serves every screened corpus
        gated = decontaminate(
            gated,
            benchmark,
            text_col,
            id_col,
            k=decontaminate_k,
            prefilter=decontaminate_prefilter,
            bloom=decontaminate_bloom,
        )

    out_cols = [id_col, text_col, "n_tokens", "pred_lang"]
    if langid_model is not None:
        out_cols.append("langid")
    return train_val_split(gated, id_col, val_buckets=val_buckets).select(
        *out_cols, "split"
    )


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str | None = "source",
) -> DataFrame:
    """One-pass corpus health summary — the numbers a curation run
    should log and alert on, per source plus an all-sources rollup
    row (source = NULL):

      n_docs, total_tokens, avg_doc_tokens, p50/p95_doc_tokens,
      exact_dup_rate (1 - distinct fingerprints / docs),
      pct_en (stopword language-ID), avg_quality-ish stopword ratio.

    Shuffle shape: one map-side projection computes every per-doc
    metric (fingerprint, token count, language) in a single codegen
    stage, then ONE rollup aggregate keyed on the source — the only
    shuffle, output rows = #sources + 1. source_col=None reports the
    single global row."""
    from .text import (
        _lang_exprs_from,
        _marker_filter,
        LANG_MARKERS,
        fingerprint_md5,
        tokens,
    )

    toks = tokens(F.col(text_col))
    _, pred = _lang_exprs_from(toks)
    per_doc = docs.select(
        *( [F.col(source_col)] if source_col else [] ),
        fingerprint_md5(F.col(text_col)).alias("__fp"),
        F.size(toks).alias("__n_tokens"),
        pred.alias("__lang"),
        (
            F.size(F.filter(toks, _marker_filter(LANG_MARKERS["en"]))).cast("double")
            / F.greatest(F.size(toks), F.lit(1))
        ).alias("__stop_ratio"),
    )
    grouping = (
        per_doc.rollup(source_col) if source_col else per_doc.groupBy()
    )
    out = grouping.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__n_tokens").alias("total_tokens"),
        F.avg("__n_tokens").alias("avg_doc_tokens"),
        F.percentile_approx("__n_tokens", 0.5).alias("p50_doc_tokens"),
        F.percentile_approx("__n_tokens", 0.95).alias("p95_doc_tokens"),
        (
            F.lit(1.0)
            - F.count_distinct("__fp").cast("double") / F.count(F.lit(1))
        ).alias("exact_dup_rate"),
        F.avg((F.col("__lang") == "en").cast("double")).alias("pct_en"),
        F.avg("__stop_ratio").alias("avg_stopword_ratio"),
    )
    return out
