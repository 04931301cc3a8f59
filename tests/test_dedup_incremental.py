"""Incremental near-dedup against the persisted signature store:
equivalence with the batch-side verdicts of near_dedup over
corpus ∪ batch, the transitive chain case, the daily absorb cycle,
and the broadcast plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_process_for_fraud_transactions_spark.operators.dedup import near_dedup
from etl_process_for_fraud_transactions_spark.operators.dedup_incremental import (
    NearDupIndex,
)
from etl_process_for_fraud_transactions_spark.sources.warehouse import Warehouse

BASE = [
    "the quick brown fox jumps over the lazy dog and runs far away today",
    "cook rice and beans with garlic in the small red kitchen pot tonight",
    "train dogs to sit and wait before the long morning walk begins daily",
    "plant roses and tulips along the sunny side of the wooden fence line",
    "sail small boats across the bay when the west wind is steady enough",
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def test_filter_new_matches_union_near_dedup(spark, wh):
    """Batch verdicts must equal near_dedup(corpus ∪ batch) survivors
    restricted to batch ids (corpus ids < batch ids)."""
    corpus = _docs(spark, [(i, t) for i, t in enumerate(BASE)])
    batch = _docs(
        spark,
        [
            (100, BASE[0]),                                # exact corpus dup
            (101, BASE[1].replace("tonight", "tomorrow")),  # near corpus dup
            (102, "completely novel text about spark adaptive query execution plans"),
            (103, "completely novel text about spark adaptive query execution plans indeed"),  # near-dup of 102
            (104, "another fresh document on parquet row group pruning and stats"),
        ],
    )
    idx = NearDupIndex(wh)
    idx.bootstrap(corpus)
    got = sorted(r.doc_id for r in idx.filter_new(batch, threshold=0.5).collect())

    union = corpus.unionByName(batch)
    want = sorted(
        r.doc_id
        for r in near_dedup(union, threshold=0.5).collect()
        if r.is_survivor and r.doc_id >= 100
    )
    assert got == want
    assert got == [102, 104]  # 100/101 corpus dups; 103 loses to 102


def test_transitive_chain_through_batch_drops_whole_cluster(spark, wh):
    """batch_a ~ batch_b and batch_b ~ corpus (batch_a never matches
    the corpus directly): the union survivor is the corpus doc, so
    BOTH batch docs must be dropped — the case a naive
    corpus-check-then-batch-dedup gets wrong."""
    anchor = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    corpus = _docs(spark, [(1, anchor)])
    b = anchor.replace("mu", "nu")          # ~corpus
    a = b.replace("alpha beta", "alpha bet")  # ~b, farther from corpus
    batch = _docs(spark, [(100, a), (101, b)])

    idx = NearDupIndex(wh)
    idx.bootstrap(corpus)
    # threshold picked so a~b and b~corpus pass but a~corpus fails
    got = {r.doc_id for r in idx.filter_new(batch, threshold=0.8).collect()}
    union_surv = {
        r.doc_id
        for r in near_dedup(corpus.unionByName(batch), threshold=0.8).collect()
        if r.is_survivor
    }
    assert got == {d for d in union_surv if d >= 100}


def test_absorb_extends_the_index(spark, wh):
    """Day-2 batch must be checked against day-1 accepted docs too."""
    corpus = _docs(spark, [(i, t) for i, t in enumerate(BASE)])
    idx = NearDupIndex(wh)
    idx.bootstrap(corpus)

    day1 = _docs(spark, [(100, "fresh day one text about broadcast joins and bucketed tables here")])
    kept1 = idx.filter_new(day1, threshold=0.5)
    assert kept1.count() == 1
    idx.absorb(kept1)

    day2 = _docs(
        spark,
        [
            (200, "fresh day one text about broadcast joins and bucketed tables here indeed"),
            (201, "entirely different prose regarding watermark semantics in streams"),
        ],
    )
    got = sorted(r.doc_id for r in idx.filter_new(day2, threshold=0.5).collect())
    assert got == [201]  # 200 near-duplicates the absorbed day-1 doc


def test_check_reports_pair_evidence(spark, wh):
    corpus = _docs(spark, [(1, BASE[0])])
    idx = NearDupIndex(wh)
    idx.bootstrap(corpus)
    batch = _docs(spark, [(100, BASE[0].replace("today", "tonight"))])
    rows = idx.check(batch, threshold=0.5).collect()
    assert [(r.new_id, r.dup_id) for r in rows] == [(100, 1)]
    assert 0.5 <= rows[0].jaccard <= 1.0


def test_corpus_index_never_shuffles(spark, wh):
    """Plan shape: the batch bucket frame broadcasts into the corpus
    bucket scan — no hash-partition exchange on the corpus index side
    of the candidate join."""
    corpus = _docs(spark, [(i, t) for i, t in enumerate(BASE)])
    idx = NearDupIndex(wh)
    idx.bootstrap(corpus)
    batch = _docs(spark, [(100, BASE[0])])
    plan = (
        idx.check(batch, threshold=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin [band_id" in plan or "BroadcastHashJoin [band_hash" in plan


def test_over_cap_batch_degrades_to_shuffle_join(spark, wh):
    """The batch broadcast is gated on a measured size (late round 9:
    n_docs * bands <= broadcast_max_rows). An over-cap batch must
    produce the SAME duplicate verdicts through the unhinted
    band-keyed shuffle join — degrade, never abort."""
    corpus = _docs(spark, [(i, t) for i, t in enumerate(BASE)])
    idx = NearDupIndex(wh, broadcast_max_rows=0)
    idx.bootstrap(corpus)
    batch = _docs(
        spark,
        [(100, BASE[0]), (101, "wholly unrelated prose about accordion maintenance routines")],
    )
    plan = (
        idx.check(batch, threshold=0.5)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "strategy=broadcast" not in plan
    rows = idx.check(batch, threshold=0.5).collect()
    assert sorted((r.new_id, r.dup_id) for r in rows) == [(100, 0)]
    got = sorted(r.doc_id for r in idx.filter_new(batch, threshold=0.5).collect())
    assert got == [101]


def test_cross_day_closure_with_absorb_all(spark, wh, tmp_path):
    """Pins the documented cross-day caveat AND its documented fix.
    Day-1 doc B near-duplicates the corpus (dropped). Day-2 doc C
    near-duplicates B but nothing indexed. Default cycle (absorb only
    survivors): C survives — per-batch equivalence, weaker than a
    global near_dedup. absorb(full batch) instead: C is dropped,
    matching the global multi-day closure."""
    anchor = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    b = anchor.replace("mu", "nu")            # ~corpus
    c = b.replace("alpha beta", "alpha bet")  # ~b, farther from corpus
    corpus = _docs(spark, [(1, anchor)])
    day1 = _docs(spark, [(100, b)])
    day2 = _docs(spark, [(200, c)])

    # default survivor-only cycle: C leaks through
    idx = NearDupIndex(wh)
    idx.bootstrap(corpus)
    kept1 = idx.filter_new(day1, threshold=0.6)
    assert kept1.count() == 0  # B is a corpus near-dup
    idx.absorb(kept1)
    assert [r.doc_id for r in idx.filter_new(day2, 0.6).collect()] == [200]

    # absorb-all cycle: B's signatures are indexed despite being
    # dropped, so day-2's C matches and is dropped too
    wh2 = Warehouse(spark, str(tmp_path / "wh2"))
    idx2 = NearDupIndex(wh2)
    idx2.bootstrap(corpus)
    assert idx2.filter_new(day1, 0.6).count() == 0
    idx2.absorb(day1)  # full batch, survivors or not
    assert idx2.filter_new(day2, 0.6).count() == 0


def test_hashed_store_equivalent_and_smaller(spark, wh, tmp_path):
    """store='hashed' (xxhash64 per shingle, array<bigint>) must give
    identical check/filter_new verdicts to the raw string store —
    Jaccard is a set measure, so hashing elements preserves it up to
    64-bit collisions — while persisting far fewer bytes."""
    import os

    from etl_process_for_fraud_transactions_spark.sources.testdata import (
        load_table,
    )
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text", "source")
    corpus = docs.filter(F.col("source") != "src0").drop("source")
    batch = docs.filter(F.col("source") == "src0").drop("source")

    wh_raw = Warehouse(spark, str(tmp_path / "raw"))
    wh_hashed = Warehouse(spark, str(tmp_path / "hashed"))
    raw = NearDupIndex(wh_raw, store="raw")
    hashed = NearDupIndex(wh_hashed, store="hashed")
    raw.bootstrap(corpus)
    hashed.bootstrap(corpus)

    key = lambda r: (r.new_id, r.dup_id, round(r.jaccard, 9))
    got_raw = sorted(map(key, raw.check(batch, threshold=0.5).collect()))
    got_hashed = sorted(map(key, hashed.check(batch, threshold=0.5).collect()))
    assert got_raw == got_hashed and len(got_raw) > 0

    kept_raw = sorted(r.doc_id for r in raw.filter_new(batch, 0.5).collect())
    kept_hashed = sorted(r.doc_id for r in hashed.filter_new(batch, 0.5).collect())
    assert kept_raw == kept_hashed

    # size: the scale cost of the verify store is its LOGICAL bytes —
    # what every verify fetch moves over the wire — not the parquet
    # at-rest size (dictionary encoding can crush this fixture's
    # low-vocab synthetic strings below 8 B/shingle; real prose
    # shingles are diverse and don't dictionary-compress like that).
    raw_b, n_sh = (
        wh_raw.read(raw.shingles_table)
        .select(
            F.sum(
                F.aggregate(
                    "sh", F.lit(0).cast("long"), lambda a, s: a + F.length(s)
                )
            ),
            F.sum(F.size("sh")),
        )
        .first()
    )
    hashed_b = 8 * n_sh
    assert hashed_b < raw_b * 0.6, (hashed_b, raw_b)

    # the layout is a frozen parameter: a raw reader on a hashed store
    # (or vice versa) must refuse, not silently verify garbage
    with pytest.raises(ValueError, match="hash famil"):
        NearDupIndex(wh_hashed, store="raw").check(batch, threshold=0.5)


def test_parameter_mismatch_fails_loudly(spark, wh):
    """A store bootstrapped under one hash family must refuse an
    instance with different LSH parameters — mismatched candidates
    silently vanish otherwise."""
    corpus = _docs(spark, [(i, t) for i, t in enumerate(BASE)])
    NearDupIndex(wh, num_hashes=32, bands=8).bootstrap(corpus)
    wrong = NearDupIndex(wh, num_hashes=16, bands=4)
    with pytest.raises(ValueError, match="hash famil"):
        wrong.check(_docs(spark, [(100, BASE[0])]), threshold=0.5)


def test_unbootstrapped_index_fails_loudly(spark, wh):
    """Round 8: an index with NO bootstrap marker must not be treated
    as an empty corpus — a wrong warehouse root would otherwise
    silently admit every near-duplicate of the indexed corpus."""
    idx = NearDupIndex(wh)
    batch = _docs(spark, [(100, BASE[0])])
    with pytest.raises(ValueError, match="bootstrap marker"):
        idx.check(batch, threshold=0.5).collect()


def test_empty_corpus_bootstrap_is_legitimate_day_zero(spark, wh):
    """bootstrap() of an EMPTY corpus writes the meta marker even
    though the index tables have no parquet files — check() then
    correctly reports zero duplicates instead of raising."""
    idx = NearDupIndex(wh, partitioned=True)
    idx.bootstrap(_docs(spark, []).limit(0), batch="bootstrap")
    batch = _docs(spark, [(100, BASE[0]), (101, BASE[1])])
    assert idx.check(batch, threshold=0.5).count() == 0
    kept = sorted(r.doc_id for r in idx.filter_new(batch, threshold=0.5).collect())
    assert kept == [100, 101]


def test_auto_band_threshold_tunes_family_and_meta_guards(spark, wh):
    """Round 8: auto_band_threshold derives (num_hashes, bands) via
    minhash_band_params, freezes them in the meta, defaults the verify
    threshold, and the guard still rejects a default-family reader."""
    from etl_process_for_fraud_transactions_spark.operators.dedup import (
        minhash_band_params,
    )

    n, b, _ = minhash_band_params(0.8)
    assert (n, b) != (32, 8)  # a non-default threshold gets a new family
    idx = NearDupIndex(wh, auto_band_threshold=0.8)
    assert (idx.num_hashes, idx.bands) == (n, b)
    corpus = _docs(spark, [(i, t) for i, t in enumerate(BASE)])
    idx.bootstrap(corpus)
    # same threshold -> same derived family -> accepted
    twin = NearDupIndex(wh, auto_band_threshold=0.8)
    near = _docs(spark, [(100, BASE[0] + " indeed")])
    got = twin.check(near).collect()  # threshold defaults to 0.8
    assert {r.new_id for r in got} <= {100}
    # explicit default family mismatches the tuned one -> loud failure
    wrong = NearDupIndex(wh)
    with pytest.raises(ValueError, match="hash famil"):
        wrong.check(near, threshold=0.8)


def test_auto_band_threshold_rejects_explicit_family(wh):
    """Round 9 (ADVICE r8): a hand-picked (num_hashes, bands) alongside
    auto_band_threshold was silently discarded — now it raises."""
    with pytest.raises(ValueError, match="one or the other"):
        NearDupIndex(wh, auto_band_threshold=0.8, num_hashes=64)
    with pytest.raises(ValueError, match="one or the other"):
        NearDupIndex(wh, auto_band_threshold=0.8, bands=16)
    # explicit family WITHOUT a derivation target still works
    idx = NearDupIndex(wh, num_hashes=64, bands=16)
    assert (idx.num_hashes, idx.bands) == (64, 16)
    # and the bare default remains 32/8
    assert (NearDupIndex(wh).num_hashes, NearDupIndex(wh).bands) == (32, 8)
