"""End-to-end training-data job: raw documents -> packed, split,
mixture-correct training shards on disk — the artifact a trainer
actually consumes, composed from the curation ladder this engine
provides:

    raw docs
      -> curate_corpus        (repetition strip, exact + near dedup,
                               quality/Gopher/language gates,
                               decontamination, train/val split)
      -> scrub_pii            (typed placeholder masking, map-only)
      -> sample_to_mixture    (optional source-share rebalance,
                               binding source kept whole)
      -> chunk_documents      (overlapping token windows, map-only)
      -> pack_chunks          (fixed-budget sequences, per split)
      -> range-clustered, split-partitioned parquet

Scale shape: every stage is the already-plan-audited operator; the
job adds ONE doc-level persist (the curated corpus — orders of
magnitude smaller than raw input — reused by the stats pass, the
split-attach join and both pack passes) and writes once through an
atomic snapshot. Packing runs PER SPLIT so a training sequence never
mixes train and val chunks; pack ids are re-keyed (pack*2 + split
index) to stay globally unique. The output layout is partitioned by
split (each split its own prune-able prefix) and range-clustered by
pack_id, so a trainer's sequential read of one pack touches one file
neighborhood.

Returns a small stats dict (driver-side, bounded aggregates): the
per-stage row counts a pipeline run should log and alert on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.pipeline import curate_corpus
from ..operators.sampling import sample_to_mixture
from ..operators.text import chunk_documents, pack_chunks, scrub_pii
from ..sources.warehouse import Warehouse, atomic_overwrite


def build_training_shards(
    wh: Warehouse,
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    shares: dict[str, float] | None = None,
    mixture_weight_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    min_tokens: int = 10,
    languages: tuple[str, ...] = ("en",),
    near_dup_threshold: float = 0.6,
    gopher_gate: bool = False,
    quality_model=None,
    min_quality: float = 0.5,
    unigram_lm=None,
    min_lm_logprob: float | None = None,
    span_mask_min_docs: int | None = None,
    decontaminate_prefilter: str | None = None,
    decontaminate_bloom=None,
    chunk_tokens: int = 512,
    overlap: int = 64,
    max_tokens: int = 2048,
    seed: str = "0",
    out_table: str = "training_shards",
    bpe_tokenizer=None,
) -> dict:
    """Run the whole pipeline and write `out_table`. See module
    docstring. `shares` (optional) is the sample_to_mixture spec over
    `source_col`; None skips mixing. Returns stage-count stats.

    `bpe_tokenizer` (optional): a byte-level operators.bpe
    BpeTokenizer — the shards then also carry `input_ids`
    (array<int>, the trainer-ready token ids) and `n_bpe_tokens`
    (the REAL tokenizer budget) per chunk, produced by one
    Arrow-batched map stage before the write. Chunk boundaries and
    pack bins still come from the regex token count (`chunk_tokens` /
    `max_tokens` budgets keep their round-9 oracle-replayable
    semantics); pass the real counts to downstream re-packing when
    exact-budget packing under the production tokenizer matters."""
    n_raw = docs.count()

    curated = curate_corpus(
        docs,
        benchmark,
        text_col,
        id_col,
        min_tokens=min_tokens,
        languages=languages,
        near_dup_threshold=near_dup_threshold,
        gopher_gate=gopher_gate,
        quality_model=quality_model,
        min_quality=min_quality,
        unigram_lm=unigram_lm,
        min_lm_logprob=min_lm_logprob,
        span_mask_min_docs=span_mask_min_docs,
        decontaminate_prefilter=decontaminate_prefilter,
        decontaminate_bloom=decontaminate_bloom,
    )
    scrubbed = scrub_pii(curated, text_col)

    if shares is not None:
        # curate_corpus projects source away; re-attach for the mixer
        scrubbed = scrubbed.join(
            docs.select(id_col, source_col), id_col
        )
        # mixture_weight_col='n_tokens' targets the TOKEN mix the
        # trainer budgets rather than doc counts (curate_corpus always
        # emits n_tokens)
        scrubbed = sample_to_mixture(
            scrubbed,
            shares,
            source_col=source_col,
            id_col=id_col,
            seed=seed,
            weight_col=mixture_weight_col,
        ).drop(source_col)

    # the curated doc-level corpus is reused by the stats aggregate,
    # the split-attach join and both per-split pack passes — persist
    # once instead of re-running the dedup ladder for each
    scrubbed = scrubbed.persist()
    try:
        doc_stats = scrubbed.groupBy("split").agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").alias("doc_tokens"),
            F.sum("n_pii_masked").alias("pii_masked"),
        )
        doc_rows = {r["split"]: r.asDict() for r in doc_stats.collect()}

        # split rides through the explode map-side (keep_cols) — no
        # chunk-level join back to the doc frame
        chunks = chunk_documents(
            scrubbed,
            text_col,
            id_col,
            chunk_tokens=chunk_tokens,
            overlap=overlap,
            keep_cols=("split",),
        )

        parts = []
        for i, split in enumerate(("train", "val")):
            # order_cols must follow id_col: the default ('doc_id',
            # 'chunk_id') raises AnalysisException under any renamed id
            packed = pack_chunks(
                chunks.filter(F.col("split") == split),
                max_tokens=max_tokens,
                order_cols=(id_col, "chunk_id"),
            )
            parts.append(
                packed.withColumn(
                    "pack_id", F.col("pack_id") * 2 + F.lit(i)
                )
            )
        out = parts[0].unionByName(parts[1])
        if bpe_tokenizer is not None:
            from ..operators.bpe import bpe_encode, bpe_token_count

            out = bpe_token_count(
                bpe_encode(out, bpe_tokenizer, "chunk_text", "input_ids"),
                bpe_tokenizer,
                "chunk_text",
                "n_bpe_tokens",
            )
        out = out.repartitionByRange("split", "pack_id").sortWithinPartitions(
            "split", "pack_id", id_col, "chunk_id"
        )
        atomic_overwrite(out, wh.path(out_table), partition_by=["split"])
    finally:
        scrubbed.unpersist()

    # schema-explicit read: an all-dropped corpus writes zero parquet
    # files (only _SUCCESS) and schema inference would fail — the job
    # should report zeros, not crash, when every stage filters out
    shard_stats = (
        wh.spark.read.schema(out.schema).parquet(wh.path(out_table))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("chunks"),
            F.count_distinct("pack_id").alias("packs"),
            F.sum("n_chunk_tokens").alias("chunk_tokens"),
        )
    )
    shard_rows = {r["split"]: r.asDict() for r in shard_stats.collect()}
    return {
        "n_raw_docs": n_raw,
        "n_curated_docs": sum(v["docs"] for v in doc_rows.values()),
        "n_pii_masked": sum(v["pii_masked"] or 0 for v in doc_rows.values()),
        "per_split": {
            s: {**doc_rows.get(s, {}), **shard_rows.get(s, {})}
            for s in set(doc_rows) | set(shard_rows)
        },
        "out_table": out_table,
    }
