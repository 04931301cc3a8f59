"""Streaming corpus curation: the stateless rungs of the curation
ladder applied as streaming-native narrow expressions, composing with
the stateful incremental near-dedup sink.

Split of labor, because Structured Streaming distinguishes the two
sharply:

- strip_html, the token-count floor, language / script gates, the
  learned quality gate, the unigram-LM gate and PII scrubbing are all
  pure per-row expressions (or stream-static broadcast joins, for the
  LM's vocab row) — they run INSIDE the streaming plan, fused by
  codegen, with no state store and no watermark;
- anything that compares documents to OTHER documents (exact/near
  dedup, decontamination against a growing index) is stateful and
  lives in `streaming.upsert.near_dedup_sink`'s foreachBatch, where
  the persisted NearDupIndex provides exactly-once epoch semantics.

So the full streaming pipeline is:

    raw = spark.readStream...                 # html or text rows
    clean = curate_stream(raw, quality_model=..., unigram_lm=...)
    run_foreach_batch(clean, near_dedup_sink(idx, "curated"), ckpt)

and every micro-batch lands deduplicated-against-history in the
curated table. Cf. jobs/training_data.py for the batch twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import (
    _lang_exprs_from,
    scrub_pii,
    strip_html,
    tokens,
)


def curate_stream(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    html_col: str | None = None,
    html_extractor: str = "regex",
    min_tokens: int = 10,
    languages: tuple[str, ...] = ("en",),
    quality_model=None,
    min_quality: float = 0.5,
    unigram_lm=None,
    min_lm_logprob: float | None = None,
    pii: bool = True,
    langid_model=None,
    langid_languages: tuple[str, ...] | None = None,
    langid_abstain_label: str | None = None,
) -> DataFrame:
    """Apply every STATELESS curation gate to a streaming DataFrame —
    returns a stream of (id, text, n_tokens, pred_lang[, ...]) rows
    that passed, ready for the stateful dedup sink. Works identically
    on a batch frame (the expressions don't know the difference),
    which is how the equivalence test pins batch/stream parity.

    html_col: when set, HTML->text extraction produces `text_col`
    first — 'regex' (strip_html, in-plan chained expressions) or
    'dom' (extract.extract_main_content; mapInPandas is
    streaming-legal as a stateless map, so boilerplate pruning works
    in-stream too). Same switch as curate_corpus(html_extractor=...).
    quality_model / unigram_lm: the same frozen-serving objects
    curate_corpus takes; their serving paths are pure expressions /
    one broadcast row, so they are streaming-legal as-is."""
    df = stream
    if html_col is not None:
        if html_extractor == "regex":
            df = strip_html(df, html_col, text_col)
        elif html_extractor == "dom":
            from ..operators.extract import extract_main_content

            df = extract_main_content(df, html_col, text_col).drop(
                "n_content_blocks", "n_boilerplate_blocks"
            )
        else:
            raise ValueError(
                f"html_extractor must be regex|dom, got {html_extractor!r}"
            )

    toks = tokens(F.col(text_col))
    _, pred = _lang_exprs_from(toks)
    df = (
        df.withColumn("n_tokens", F.size(toks))
        .withColumn("pred_lang", pred)
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & F.col("pred_lang").isin(list(languages))
        )
    )

    if langid_model is not None:
        # in-script language ID — the model is a one-row static frame,
        # so classification is a stream-static broadcast + narrow
        # expressions: stateless in-stream like the LM gates. A
        # Mapping {dominant_script: LangIdModel} (round 11, e.g.
        # langid.SCRIPT_FAMILIES) routes per-document by script; the
        # router's per-family broadcasts are equally stream-legal.
        from collections.abc import Mapping as _Mapping

        from ..operators.langid import (
            classify_language,
            classify_language_routed,
        )

        # langid_abstain_label (round 12): same abstain contract as
        # curate_corpus — below-confidence verdicts become the abstain
        # token, so the language filter drops out-of-family docs
        # instead of keeping them under a forced sibling label.
        if isinstance(langid_model, _Mapping):
            df = classify_language_routed(
                df,
                langid_model,
                text_col,
                out_col="langid",
                abstain_label=langid_abstain_label,
            ).drop("langid_script")
        else:
            df = classify_language(
                df,
                langid_model,
                text_col,
                out_col="langid",
                abstain_label=langid_abstain_label,
            )
        if langid_languages is not None:
            df = df.filter(F.col("langid").isin(list(langid_languages)))

    if quality_model is not None:
        from ..operators.quality_model import score_quality

        df = score_quality(df, quality_model, text_col).filter(
            F.col("quality_score") >= min_quality
        ).drop("quality_score")

    if unigram_lm is not None:
        if min_lm_logprob is None:
            raise ValueError("unigram_lm needs min_lm_logprob")
        # same rung auto-detection as curate_corpus: a train_bigram_lm
        # model upgrades the gate to the stupid-backoff bigram scorer;
        # both serve as a stream-static broadcast + let-bound fold, so
        # the stage stays stateless in-stream either way
        if "__bg_keys" in unigram_lm.columns:
            from ..operators.quality_model import bigram_logprob_score

            df = bigram_logprob_score(df, unigram_lm, text_col).filter(
                F.col("lm2_logprob") >= min_lm_logprob
            ).drop("lm2_logprob")
        else:
            from ..operators.quality_model import unigram_logprob_score

            df = unigram_logprob_score(df, unigram_lm, text_col).filter(
                F.col("lm_logprob") >= min_lm_logprob
            ).drop("lm_logprob")

    if pii:
        df = scrub_pii(df, text_col)
    return df
