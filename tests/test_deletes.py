"""Deletion propagation (round 13): tombstone-based deletes on the
index families' immutable parquet layouts.

The contract pinned here:

1. delete() is EXACT: serving after a delete is bit-identical to an
   index built without the deleted docs — for BM25 that includes
   N/avgdl/idf, which subtract the tombstones' integer (count, sum dl)
   from the stats fold, not just the filtered postings.
2. delete() is idempotent (a second delete of the same ids tombstones
   nothing) and ignores ids that were never indexed.
3. A deleted id stays deleted: absorb() filters it from later batches
   (re-admitting it would double-count stats and violate a takedown).
4. Physical purge is atomic: a FULL compaction on a VERSIONED store
   rewrites the tables without the deleted rows, folds the stats
   down, and commits "tombstones applied" inside the pointer flip by
   not creating a tombstone table for the new version. A bounded
   (through=) compaction carries the tombstones live instead.
5. A rebuild starts from the caller's corpus with no tombstones.
"""

from __future__ import annotations

import pytest

from etl_process_for_fraud_transactions_spark.operators.retrieval import (
    Bm25Index,
)
from etl_process_for_fraud_transactions_spark.sources.warehouse import (
    Warehouse,
)

DOCS = [
    (1, "hash join hash join hash"),
    (2, "hash scan scan scan scan"),
    (3, "merge sort merge sort"),
    (4, "hash"),
    (5, "hash probe build probe"),
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: int, text: string")


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id: int")


def _served(idx):
    return sorted(
        tuple(r) for r in idx.topk({"q": ["hash", "probe"]}).collect()
    )


def test_bm25_delete_exact_parity_idempotence_and_absorb_ban(
    spark, tmp_path
):
    idx = Bm25Index(Warehouse(spark, str(tmp_path / "wh")))
    idx.build(_docs(spark, DOCS))

    report = idx.delete(_ids(spark, [2, 4, 999]))  # 999 never indexed
    assert report == {"deleted_docs": 2, "deleted_dl": 6}

    # EXACT parity: scores equal an index that never held docs 2 and 4
    # (same N, same avgdl, same df -> same idf -> same doubles)
    ref = Bm25Index(Warehouse(spark, str(tmp_path / "whref")))
    ref.build(_docs(spark, [d for d in DOCS if d[0] not in (2, 4)]))
    assert _served(idx) == _served(ref)

    # idempotent: nothing tombstoned twice, serving unchanged
    again = idx.delete(_ids(spark, [2, 4]))
    assert again == {"deleted_docs": 0, "deleted_dl": 0}
    assert _served(idx) == _served(ref)

    # a deleted id stays deleted: absorb filters it out...
    idx.absorb(_docs(spark, [(2, "hash hash hash probe")]))
    assert _served(idx) == _served(ref)
    # ...while a fresh id in the same shape of batch still lands
    idx.absorb(_docs(spark, [(6, "hash hash hash probe")]))
    ref.absorb(_docs(spark, [(6, "hash hash hash probe")]))
    assert _served(idx) == _served(ref)

    # a rebuild is the caller's statement of record: tombstones reset
    idx.build(_docs(spark, DOCS))
    fresh = Bm25Index(Warehouse(spark, str(tmp_path / "whf")))
    fresh.build(_docs(spark, DOCS))
    assert _served(idx) == _served(fresh)


def test_bm25_versioned_purge_is_atomic_in_the_pointer_flip(
    spark, tmp_path
):
    import os

    wh = Warehouse(spark, str(tmp_path / "wh"))
    idx = Bm25Index(wh, partitioned=True, versioned=True)
    idx.build(_docs(spark, DOCS[:3]))
    idx.absorb(_docs(spark, DOCS[3:]), batch=1)

    idx.delete(_ids(spark, [2]))
    ref = Bm25Index(Warehouse(spark, str(tmp_path / "whref")))
    ref.build(_docs(spark, [d for d in DOCS if d[0] != 2]))
    assert _served(idx) == _served(ref)

    # bounded compaction: tombstones carry to the new version LIVE
    v0 = idx._current_version()
    report = idx.compact(through=0)
    assert report["purged"] is False
    assert idx._current_version() == v0 + 1
    assert wh.exists(idx._tombstones_table(v0 + 1))
    assert _served(idx) == _served(ref)
    # doc 2's postings are still physically present (filtered only)
    assert (
        wh.read(idx.postings_table).filter("doc_id = 2").count() > 0
    )

    # FULL compaction: physical purge behind one pointer flip
    report = idx.compact()
    assert report["purged"] is True
    v2 = idx._current_version()
    assert not wh.exists(idx._tombstones_table(v2))
    assert wh.read(idx.postings_table).filter("doc_id = 2").count() == 0
    assert wh.read(idx.doclens_table).filter("doc_id = 2").count() == 0
    # stats folded down exactly: one row, minus doc 2's dl
    stats = wh.read(idx.stats_table).collect()
    assert len(stats) == 1
    assert stats[0]["n_docs"] == 4
    assert stats[0]["sum_dl"] == sum(
        len(t.split()) for i, t in DOCS if i != 2
    )
    assert _served(idx) == _served(ref)

    # the old versions' tombstones are GC'd with them
    removed = idx.prune_versions()
    assert any("tombstones" in t for t in removed)
    # deleting the already-purged id again is a no-op (not an error)
    assert idx.delete(_ids(spark, [2]))["deleted_docs"] == 0
    # and the id may legitimately be re-absorbed after the purge
    idx.absorb(_docs(spark, [(2, "hash scan scan scan scan")]), batch=9)
    full = Bm25Index(Warehouse(spark, str(tmp_path / "whfull")))
    full.build(_docs(spark, DOCS))
    assert _served(idx) == _served(full)


def test_bm25_delete_duplicate_occurrences_all_tombstoned(spark, tmp_path):
    """The caller-owns-duplicates contract: an id absorbed twice has
    two doclens occurrences — delete() tombstones BOTH (stats
    subtract both), serving drops every copy."""
    idx = Bm25Index(Warehouse(spark, str(tmp_path / "wh")))
    idx.build(_docs(spark, DOCS))
    idx.absorb(_docs(spark, [(4, "probe probe")]))  # duplicate id 4

    report = idx.delete(_ids(spark, [4]))
    assert report["deleted_docs"] == 2
    assert report["deleted_dl"] == 1 + 2
    ref = Bm25Index(Warehouse(spark, str(tmp_path / "whref")))
    ref.build(_docs(spark, [d for d in DOCS if d[0] != 4]))
    assert _served(idx) == _served(ref)
