"""Streaming curation: the stateless gates run inside the streaming
plan; the stateful near-dedup runs in the foreachBatch sink; batch
and stream agree on the gate verdicts."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from etl_process_for_fraud_transactions_spark.streaming.curation import curate_stream

SCHEMA = "doc_id long, html string"

GOOD = (
    "<p>the quick brown fox jumps over the lazy dog and then the fox "
    "runs far away into the green hills to rest for the day</p>"
)
NEAR = (
    "<p>the quick brown fox jumps over the lazy dog and then the fox "
    "runs far away into the blue hills to rest for the day</p>"
)
OTHER = (
    "<p>cook rice and beans with garlic in the small red kitchen pot "
    "while the bread bakes and the soup simmers on the stove top</p>"
)


def _write(src, name, rows):
    (src / name).write_text("\n".join(json.dumps(r) for r in rows))


def test_stateless_gates_stream_and_match_batch(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    rows = [
        {"doc_id": 1, "html": GOOD},
        {"doc_id": 2, "html": "<p>tiny</p>"},                      #短 -> token floor
        {"doc_id": 3, "html": "<p>der hund und die katze ist das "
                              "haus und der baum und die sonne</p>"},  # de
        {"doc_id": 4, "html": OTHER},
    ]
    _write(src, "b1.jsonl", rows)

    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        curate_stream(stream, html_col="html")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert sorted(got) == [1, 4]          # token floor + language gate fired
    assert "<p>" not in got[1].text       # html stripped in-stream
    assert got[1].pred_lang == "en"

    # batch/stream parity: the same frame through the same function
    batch = spark.createDataFrame(
        [(r["doc_id"], r["html"]) for r in rows], SCHEMA
    )
    bgot = {
        r.doc_id: (r.text, r.n_tokens, r.pred_lang)
        for r in curate_stream(batch, html_col="html").collect()
    }
    assert bgot == {
        d: (r.text, r.n_tokens, r.pred_lang) for d, r in got.items()
    }


def test_full_streaming_pipeline_with_near_dedup_sink(spark, tmp_path):
    """curate_stream -> near_dedup_sink: gates drop junk in-stream,
    the index drops a cross-micro-batch near duplicate, and the
    curated table accumulates exactly the survivors."""
    from etl_process_for_fraud_transactions_spark.operators.dedup_incremental import (
        NearDupIndex,
    )
    from etl_process_for_fraud_transactions_spark.sources.warehouse import Warehouse
    from etl_process_for_fraud_transactions_spark.streaming.upsert import (
        near_dedup_sink,
        run_foreach_batch,
    )

    src = tmp_path / "in"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    idx = NearDupIndex(wh, partitioned=True)
    # empty bootstrap: the stream IS the corpus from day one
    idx.bootstrap(
        spark.createDataFrame([], "doc_id long, text string")
    )
    ckpt = str(tmp_path / "ck")

    def run():
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        run_foreach_batch(
            curate_stream(stream, html_col="html"),
            near_dedup_sink(idx, "curated", threshold=0.5),
            ckpt,
        )
        return sorted(
            r.doc_id for r in wh.read("curated").collect()
        )

    _write(src, "b1.jsonl", [{"doc_id": 1, "html": GOOD},
                             {"doc_id": 2, "html": "<p>tiny</p>"}])
    assert run() == [1]

    # second micro-batch: a near-dup of doc 1 (dropped by the INDEX,
    # across epochs) and a genuinely new doc (kept)
    _write(src, "b2.jsonl", [{"doc_id": 5, "html": NEAR},
                             {"doc_id": 6, "html": OTHER}])
    assert run() == [1, 6]


def test_dom_extractor_runs_in_stream_and_matches_batch(spark, tmp_path):
    """html_extractor='dom' (Arrow-batched mapInPandas) is a stateless
    map — streaming-legal — and drops page chrome in-stream; batch and
    stream agree."""
    chrome = "<nav><a href='/'>Home</a> <a href='/a'>A</a></nav>"
    footer = "<footer>Copyright Example Media editorial board</footer>"
    rows = [
        {"doc_id": 1, "html": chrome + GOOD + footer},
        {"doc_id": 4, "html": chrome + OTHER + footer},
    ]
    src = tmp_path / "in"
    src.mkdir()
    _write(src, "b1.jsonl", rows)

    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        curate_stream(stream, html_col="html", html_extractor="dom")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert sorted(got) == [1, 4]
    for r in got.values():
        assert "Home" not in r.text and "Copyright" not in r.text
    batch = spark.createDataFrame(
        [(r["doc_id"], r["html"]) for r in rows], SCHEMA
    )
    bgot = {
        r.doc_id: (r.text, r.n_tokens, r.pred_lang)
        for r in curate_stream(batch, html_col="html", html_extractor="dom").collect()
    }
    assert bgot == {d: (r.text, r.n_tokens, r.pred_lang) for d, r in got.items()}


def test_bigram_lm_gate_runs_in_stream(spark, tmp_path):
    """The bigram rung of the LM gate (train_bigram_lm passed as
    unigram_lm=) is stateless in-stream: a word-order scramble of
    reference text — invisible to the unigram rung — is dropped by
    the streaming plan, and batch parity holds."""
    from etl_process_for_fraud_transactions_spark.operators.quality_model import (
        bigram_logprob_score,
        train_bigram_lm,
    )

    plain = GOOD[3:-4]  # strip <p> tags: reference is clean text
    toks = plain.split()
    scrambled = " ".join(toks[::2] + toks[1::2])
    ref = spark.createDataFrame([(1, plain)], "doc_id long, text string")
    lm = train_bigram_lm(ref, vocab_size=1000, bigram_size=1000)
    scores = {
        r.doc_id: r.lm2_logprob
        for r in bigram_logprob_score(
            spark.createDataFrame(
                [(1, plain), (2, scrambled)], "doc_id long, text string"
            ),
            lm,
        ).collect()
    }
    assert scores[1] > scores[2]
    thr = (scores[1] + scores[2]) / 2

    src = tmp_path / "in"
    src.mkdir()
    _write(src, "b1.jsonl", [
        {"doc_id": 1, "html": f"<p>{plain}</p>"},
        {"doc_id": 2, "html": f"<p>{scrambled}</p>"},
    ])
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        curate_stream(
            stream, html_col="html", unigram_lm=lm, min_lm_logprob=thr
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert [r.doc_id for r in spark.read.parquet(out).collect()] == [1]

    batch = spark.createDataFrame(
        [(1, f"<p>{plain}</p>"), (2, f"<p>{scrambled}</p>")], SCHEMA
    )
    bkept = [
        r.doc_id
        for r in curate_stream(
            batch, html_col="html", unigram_lm=lm, min_lm_logprob=thr
        ).collect()
    ]
    assert bkept == [1]


def test_langid_gate_runs_in_stream(spark, tmp_path):
    """The in-script langid stage (round 10) is stateless in-stream:
    the one-row frozen-profile model joins stream-static, sibling
    Romance languages separate per row, langid_languages filters, and
    batch parity holds."""
    from etl_process_for_fraud_transactions_spark.operators.langid import (
        FROZEN_ROMANCE,
        HELDOUT_SENTENCES,
    )

    rows = [
        {"doc_id": 1, "html": f"<p>{HELDOUT_SENTENCES['es'][0]}</p>"},
        {"doc_id": 2, "html": f"<p>{HELDOUT_SENTENCES['it'][0]}</p>"},
        {"doc_id": 3, "html": f"<p>{HELDOUT_SENTENCES['pt'][0]}</p>"},
    ]
    kw = dict(
        html_col="html",
        min_tokens=3,
        languages=("en", "es", "fr", "de", "und"),
        langid_model=FROZEN_ROMANCE,
        langid_languages=("es", "it"),
        pii=False,
    )

    src = tmp_path / "in"
    src.mkdir()
    _write(src, "b1.jsonl", rows)
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        curate_stream(stream, **kw)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.doc_id: r.langid for r in spark.read.parquet(out).collect()}
    assert got == {1: "es", 2: "it"}  # pt filtered, verdicts correct

    batch = spark.createDataFrame(
        [(r["doc_id"], r["html"]) for r in rows], SCHEMA
    )
    bgot = {r.doc_id: r.langid for r in curate_stream(batch, **kw).collect()}
    assert bgot == got


def test_routed_langid_mapping_runs_in_stream(spark, tmp_path):
    """Round 11: the script-routed langid mapping is stream-legal —
    the per-family one-row broadcasts join stream-static and a Han
    doc routes to the zh/ja/ko family while a Latin doc routes to
    the Romance one, in the same micro-batch."""
    from etl_process_for_fraud_transactions_spark.operators.langid import (
        HELDOUT_SENTENCES,
        HELDOUT_SENTENCES_HAN,
        SCRIPT_FAMILIES,
    )

    rows = [
        {"doc_id": 1, "html": f"<p>{HELDOUT_SENTENCES['es'][0]}</p>"},
        {"doc_id": 2, "html": f"<p>{HELDOUT_SENTENCES_HAN['zh'][0]}</p>"},
    ]
    kw = dict(
        html_col="html",
        min_tokens=1,
        languages=("en", "es", "fr", "de", "und"),
        langid_model=SCRIPT_FAMILIES,
        pii=False,
    )
    src = tmp_path / "in"
    src.mkdir()
    _write(src, "b1.jsonl", rows)
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        curate_stream(stream, **kw)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.doc_id: r.langid for r in spark.read.parquet(out).collect()}
    assert got == {1: "es", 2: "zh"}
    # batch parity through the identical expression ladder
    batch = spark.createDataFrame(
        [(r["doc_id"], r["html"]) for r in rows], "doc_id long, html string"
    )
    bgot = {r.doc_id: r.langid for r in curate_stream(batch, **kw).collect()}
    assert bgot == got


def test_stream_ladder_langid_abstain_drops_out_of_family(spark):
    """Round 12: the streaming ladder's langid_abstain_label wiring —
    curate_stream's gates are pure expressions, so the batch-frame
    call pins the exact stream behavior (the module's parity
    convention): a German doc under the Romance family is KEPT
    mislabeled without the abstain and DROPPED with it."""
    from etl_process_for_fraud_transactions_spark.operators.langid import (
        SCRIPT_FAMILIES,
    )

    es = (
        "la casa es grande y la familia come pan con queso cada "
        "domingo porque la cocina de la abuela siempre esta llena de "
        "invitados y todos salen a caminar bajo el sol de la ciudad"
    )
    de = (
        "das haus ist gross und die familie isst jeden sonntag brot "
        "mit kaese weil die kueche der grossmutter immer voller "
        "gaeste ist und alle unter der sonne der stadt spazieren gehen"
    )
    batch = spark.createDataFrame(
        [(1, es), (2, de)], "doc_id: long, text: string"
    )
    kw = dict(
        min_tokens=5,
        languages=("es", "pt", "it", "en", "de", "und"),
        langid_model=SCRIPT_FAMILIES,
        langid_languages=("es", "pt", "it"),
    )
    forced = curate_stream(batch, **kw)
    assert {r["doc_id"] for r in forced.collect()} == {1, 2}
    gated = curate_stream(batch, langid_abstain_label="und", **kw)
    assert {r["doc_id"] for r in gated.collect()} == {1}
