"""Epoch-partition compaction (operators/epochs.py + the per-family
compact() methods): the small-files maintenance rewrite and its
replay-watermark contract.

The invariants pinned here, for each index family:

1. compact() is a pure LAYOUT rewrite — serving output is
   bit-identical before and after, the leading pruning level (cell /
   term bucket) survives, and the data-file count drops.
2. The replay watermark makes it replay-safe: after compaction, a
   re-offered epoch <= compacted_through is a NO-OP (its rows already
   live in the __compacted__ partition), a NEW epoch still absorbs,
   and a non-integer epoch id fails loudly instead of guessing.
3. Crash ordering (non-versioned): the watermark persists BEFORE the
   data swap — the watermark-only intermediate state (simulated here)
   already serves correctly and replays already skip.
4. Versioned stores commit collapsed tables + watermark in one
   pointer flip; the old version stays on disk until prune_versions.
"""

import pytest

from etl_process_for_fraud_transactions_spark.operators import epochs as E


def _ivf(spark, tmp_path, **kw):
    from etl_process_for_fraud_transactions_spark.operators import (
        similarity as S,
    )
    from etl_process_for_fraud_transactions_spark.sources.warehouse import (
        Warehouse,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    idx = S.IvfIndex(wh, partitioned=True, **kw)
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0]),
            (3, [0.0, 1.0, 0.0]),
            (4, [0.0, 0.9, 0.1]),
            (5, [0.0, 0.0, 1.0]),
            (6, [-1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    idx.build(corpus, n_cells=3, seed=42)
    return wh, idx


def _epoch(spark, ids):
    return spark.createDataFrame(
        [(i, [1.0, 0.01 * i, 0.0]) for i in ids],
        "vec_id long, embedding array<double>",
    )


def _topk_snapshot(idx, spark):
    queries = spark.createDataFrame(
        [(100, [1.0, 0.05, 0.0]), (200, [0.0, 1.0, 0.05])],
        "query_id long, query_vec array<double>",
    )
    return sorted(
        (r.query_id, r.rank, r.vec_id, round(r.cos_sim, 9))
        for r in idx.topk(queries, k=3, nprobe=3).collect()
    )


def test_epoch_watermark_helpers():
    assert E.epoch_watermark(["1", "7", "3"]) == 7
    assert E.epoch_watermark(["__build__", "__compacted__"]) is None
    assert E.epoch_watermark(["__build__", "2"], prev=9) == 9
    assert E.epoch_watermark([], prev=4) == 4
    with pytest.raises(ValueError, match="not an integer"):
        E.epoch_watermark(["2024-01-01"])
    assert E.replay_skippable(3, 3) and E.replay_skippable("2", 3)
    assert not E.replay_skippable(4, 3)
    assert not E.replay_skippable("anything", None)
    with pytest.raises(ValueError, match="compacted through"):
        E.replay_skippable("b1", 3)
    with pytest.raises(ValueError, match="reserved"):
        E.guard_sentinel_batch("__compacted__")


def test_ivf_compact_layout_replay_and_crash_window(spark, tmp_path):
    import os

    wh, idx = _ivf(spark, tmp_path)
    for b in (1, 2, 3, 4):
        idx.absorb(_epoch(spark, [100 + b]), batch=b)
    before = _topk_snapshot(idx, spark)
    rows_before = sorted(
        r.vec_id for r in wh.read(idx.vectors_table).collect()
    )
    files_before = E.parquet_file_count(wh.path(idx.vectors_table))

    report = idx.compact()
    # layout: fewer files, cell level intact, one __compacted__ stamp
    assert report["compacted_through"] == 4
    assert report["files_after"] < files_before
    assert report["files_after"] <= 3  # one file per occupied cell
    cells = os.listdir(wh.path(idx.vectors_table))
    batch_dirs = {
        d
        for c in cells
        if c.startswith("ivf_cell=")
        for d in os.listdir(os.path.join(wh.path(idx.vectors_table), c))
        if d.startswith("__batch=")
    }
    assert batch_dirs == {"__batch=__compacted__"}
    # serving: bit-identical rows and scores
    assert _topk_snapshot(idx, spark) == before
    assert (
        sorted(r.vec_id for r in wh.read(idx.vectors_table).collect())
        == rows_before
    )

    # replayed epoch <= watermark: NO-OP (no duplicates, no new dirs)
    idx.absorb(_epoch(spark, [103]), batch=3)
    assert (
        sorted(r.vec_id for r in wh.read(idx.vectors_table).collect())
        == rows_before
    )
    # fresh epoch > watermark still absorbs
    idx.absorb(_epoch(spark, [105]), batch=5)
    assert 105 in {r.vec_id for r in wh.read(idx.vectors_table).collect()}
    # second compaction folds it in monotonically
    report2 = idx.compact()
    assert report2["compacted_through"] == 5
    idx.absorb(_epoch(spark, [105]), batch=5)  # replay again: no-op
    assert (
        len([r for r in wh.read(idx.vectors_table).collect() if r.vec_id == 105])
        == 1
    )
    # non-integer epoch id on a compacted store fails loudly
    with pytest.raises(ValueError, match="compacted through"):
        idx.absorb(_epoch(spark, [106]), batch="b6")
    # reserved stamps always refused
    with pytest.raises(ValueError, match="reserved"):
        idx.absorb(_epoch(spark, [106]), batch="__build__")

    # crash window: watermark persisted, swap never ran — simulate by
    # hand-writing the watermark ahead of the data (exactly compact()'s
    # first step), then replaying an already-present epoch
    meta = idx._stored_meta
    idx._write_meta(
        meta["n_cells"], meta["dim"], compacted_through=99
    )
    snap = sorted(r.vec_id for r in wh.read(idx.vectors_table).collect())
    idx.absorb(_epoch(spark, [105]), batch=5)  # skipped: <= 99
    assert (
        sorted(r.vec_id for r in wh.read(idx.vectors_table).collect())
        == snap
    )
    assert _topk_snapshot(idx, spark) is not None  # still serves

    # a flat store has no epochs to compact
    from etl_process_for_fraud_transactions_spark.operators import (
        similarity as S,
    )
    from etl_process_for_fraud_transactions_spark.sources.warehouse import (
        Warehouse,
    )

    flat = S.IvfIndex(Warehouse(spark, str(tmp_path / "whflat")))
    flat.build(_epoch(spark, [1, 2, 3]), n_cells=2, seed=1)
    with pytest.raises(ValueError, match="partitioned"):
        flat.compact()


def test_ivf_versioned_compact_flips_pointer_and_retrain_carries_wm(
    spark, tmp_path
):
    import os

    wh, idx = _ivf(spark, tmp_path, versioned=True)
    for b in (1, 2):
        idx.absorb(_epoch(spark, [100 + b]), batch=b)
    before = _topk_snapshot(idx, spark)
    v0 = idx._current_version()

    report = idx.compact()
    assert idx._current_version() == v0 + 1
    assert idx._watermark() == 2 == report["compacted_through"]
    # old version intact until pruned (lagging readers)
    assert os.path.isdir(wh.path(f"{idx.name}_vectors_v{v0}"))
    assert _topk_snapshot(idx, spark) == before
    idx.absorb(_epoch(spark, [101]), batch=1)  # replay: no-op
    n = wh.read(idx.vectors_table).count()
    assert n == 8  # 6 build + 2 absorbed, no duplicate

    # retrain PRESERVES the watermark (stamps survive the re-shard)
    idx.retrain(n_cells=3, seed=7)
    assert idx._watermark() == 2
    idx.absorb(_epoch(spark, [102]), batch=2)  # still a replay
    assert wh.read(idx.vectors_table).count() == 8

    removed = idx.prune_versions()
    assert removed  # superseded versions collected

    # build() resets the watermark: fresh lineage (versioned IvfIndex
    # rebuilds go through retrain(); build() recommits v1)
    idx.build(_epoch(spark, [1, 2, 3, 4]), n_cells=2, seed=1)
    assert idx._watermark() is None
    idx.absorb(_epoch(spark, [50]), batch=1)  # epoch ids start over
    assert 50 in {r.vec_id for r in wh.read(idx.vectors_table).collect()}
