"""End-to-end training-shards job: raw docs with one defect of each
kind -> curated, scrubbed, mixed, chunked, packed, split-partitioned
parquet + stage stats."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_process_for_fraud_transactions_spark.jobs.training_data import (
    build_training_shards,
)
from etl_process_for_fraud_transactions_spark.sources.warehouse import Warehouse

GOOD = (
    "the quick brown fox jumps over the lazy dog and then the fox "
    "runs far away into the green hills to rest for the day"
)
LEAK = "what is the capital of france paris is the capital of france"

TOPICS = [
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


@pytest.fixture(scope="module")
def raw_docs(spark):
    rows = [
        (1, GOOD, "web"),
        (2, GOOD.upper() + "!", "web"),               # exact dup -> dropped
        (3, GOOD.replace("green", "blue"), "web"),    # near dup -> dropped
        (5, "tiny text", "web"),                      # short -> dropped
        (7, "quiz answers follow here " + LEAK + " and that is the end "
            "of the quiz answers for the day my friends", "web"),  # leak
        # PII doc: email must be masked in the shards
        (9, "please contact the author at jane.doe@example.com for the "
            "full dataset and the extended appendix of the paper today",
            "web"),
    ]
    rows += [
        (100 + i,
         f"this filler document number {i} talks at length about how to {t} "
         "and why the craft still matters to the people who practice it",
         "web" if i % 2 == 0 else "books")
        for i, t in enumerate(TOPICS)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_build_training_shards_end_to_end(spark, raw_docs, tmp_path_factory):
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("wh")))
    bench = spark.createDataFrame([(1, LEAK)], "bench_id long, text string")
    stats = build_training_shards(
        wh,
        raw_docs,
        benchmark=bench,
        text_col="text",
        min_tokens=10,
        near_dup_threshold=0.5,
        chunk_tokens=16,
        overlap=4,
        max_tokens=64,
    )
    # defects dropped: 2 (exact), 3 (near), 5 (short), 7 (leak)
    assert stats["n_raw_docs"] == 18
    assert stats["n_curated_docs"] == 14
    assert stats["n_pii_masked"] >= 1

    out = wh.read("training_shards")
    # PII never reaches the shards: chunk text is token-normalized, so
    # an unscrubbed address would surface as "jane doe example com";
    # the scrubbed placeholder [EMAIL] normalizes to the token "email"
    assert out.filter(F.col("chunk_text").contains("example com")).count() == 0
    assert out.filter(F.col("chunk_text").contains(" email ")
                      | F.col("chunk_text").startswith("email ")
                      | F.col("chunk_text").endswith(" email")).count() > 0

    # split partitioning on disk; both splits nonempty at this fixture
    dirs = {p for p in os.listdir(wh.path("training_shards")) if p.startswith("split=")}
    assert "split=train" in dirs

    # packing: bounded totals, packs never span splits, ids unique
    rows = out.collect()
    totals, split_of = {}, {}
    for r in rows:
        totals[r.pack_id] = totals.get(r.pack_id, 0) + r.n_chunk_tokens
        assert split_of.setdefault(r.pack_id, r.split) == r.split
    assert all(t < 64 + 16 for t in totals.values())

    # stats agree with the written table
    per = stats["per_split"]
    got_chunks = {s: sum(1 for r in rows if r.split == s) for s in per}
    for s in per:
        if "chunks" in per[s]:
            assert per[s]["chunks"] == got_chunks[s]

    # deterministic: re-running the job reproduces the same shards
    stats2 = build_training_shards(
        wh,
        raw_docs,
        benchmark=bench,
        text_col="text",
        min_tokens=10,
        near_dup_threshold=0.5,
        chunk_tokens=16,
        overlap=4,
        max_tokens=64,
    )
    assert stats2 == stats
    again = sorted(
        (r.doc_id, r.chunk_id, r.pack_id, r.split)
        for r in wh.read("training_shards").collect()
    )
    assert again == sorted((r.doc_id, r.chunk_id, r.pack_id, r.split) for r in rows)


def test_all_dropped_corpus_reports_zeros(spark, tmp_path_factory):
    """When every stage filters out (here: nothing passes min_tokens)
    the job writes an empty table and reports zeros instead of
    crashing on schema inference over a file-less parquet dir."""
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("wh")))
    docs = spark.createDataFrame(
        [(1, "tiny", "web"), (2, "small", "web")],
        "doc_id long, text string, source string",
    )
    stats = build_training_shards(wh, docs, min_tokens=10)
    assert stats["n_raw_docs"] == 2 and stats["n_curated_docs"] == 0
    assert stats["per_split"] == {}


def test_mixture_shares_respected(spark, raw_docs, tmp_path_factory):
    """With shares, the curated corpus is rebalanced by source before
    chunking; the binding source is kept whole."""
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("wh")))
    stats = build_training_shards(
        wh,
        raw_docs,
        shares={"web": 1.0, "books": 1.0},
        min_tokens=10,
        near_dup_threshold=0.5,
        chunk_tokens=16,
        overlap=4,
        max_tokens=64,
    )
    assert 0 < stats["n_curated_docs"] <= 14


def test_renamed_id_col_packs_without_error(spark, raw_docs, tmp_path_factory):
    """pack_chunks must receive order_cols derived from the job's
    id_col — with the hard-coded ('doc_id', 'chunk_id') default a
    renamed id raised AnalysisException at the packing stage."""
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("wh")))
    docs = raw_docs.withColumnRenamed("doc_id", "uid")
    stats = build_training_shards(
        wh,
        docs,
        id_col="uid",
        min_tokens=10,
        near_dup_threshold=0.5,
        chunk_tokens=16,
        overlap=4,
        max_tokens=64,
    )
    assert stats["n_curated_docs"] > 0
    out = spark.read.parquet(wh.path("training_shards"))
    assert "uid" in out.columns and out.count() > 0
