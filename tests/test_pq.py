"""Product quantization (operators/pq.py): lossless corpora recall
100%, measured recall floors with and without exact rerank, the
meta-guarded versioned store, and encode determinism. MLlib-backed
training is import-gated like ivf_build."""

from __future__ import annotations

import math
import random

import pytest

from pyspark.sql import functions as F


def _ml_available():
    try:
        import numpy  # noqa: F401
        from pyspark.ml.clustering import KMeans  # noqa: F401

        return True
    except ImportError:  # pragma: no cover
        return False


pytestmark = pytest.mark.skipif(
    not _ml_available(), reason="pyspark.ml/numpy unavailable"
)


def _random_corpus(spark, n=200, dim=16, seed=0):
    rnd = random.Random(seed)
    rows = [
        (i, [rnd.gauss(0, 1) for _ in range(dim)]) for i in range(n)
    ]
    return rows, spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>"
    )


def _exact_top10(spark, corpus, queries):
    from pyspark.sql.window import Window

    from etl_process_for_fraud_transactions_spark.operators.similarity import (
        cosine,
    )

    w = Window.partitionBy("query_id").orderBy(
        F.desc("s"), F.asc("vec_id")
    )
    return {
        (r["query_id"], r["vec_id"])
        for r in corpus.crossJoin(F.broadcast(queries))
        .select(
            "query_id",
            "vec_id",
            F.round(
                cosine(F.col("embedding"), F.col("query_vec")), 6
            ).alias("s"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter("rk <= 10")
        .collect()
    }


def test_pq_lossless_corpus_recalls_exactly(spark):
    """Vectors drawn FROM a tiny per-sub-space alphabet encode with
    zero distortion, so ADC ordering equals exact cosine ordering and
    recall@k is 1.0 — the correctness pin that isolates the machinery
    from quantization error."""
    from etl_process_for_fraud_transactions_spark.operators.pq import (
        pq_encode,
        pq_topk,
        train_pq,
    )

    # each 2-dim sub-vector is one of 3 fixed patterns -> a 3-entry
    # codebook reconstructs every vector exactly
    pats = [(1.0, 0.0), (0.0, 1.0), (1.0, 1.0)]
    rnd = random.Random(7)
    rows = [
        (
            i,
            [x for _ in range(4) for x in pats[rnd.randrange(3)]],
        )
        for i in range(60)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>"
    )
    model = train_pq(corpus, m=4, n_codes=3, seed=1, max_iter=20)
    codes = pq_encode(corpus, model)
    queries = spark.createDataFrame(
        [(i, rows[i][1]) for i in (0, 10, 20)],
        "query_id: long, query_vec: array<double>",
    )
    exact = _exact_top10(spark, corpus, queries)
    got = {
        (r["query_id"], r["vec_id"])
        for r in pq_topk(codes, queries, model, k=10).collect()
    }
    assert got == exact
    # and every rank-1 hit is the query vector itself
    firsts = {
        r["query_id"]: r["vec_id"]
        for r in pq_topk(codes, queries, model, k=10).collect()
        if r["rank"] == 1
    }
    assert firsts == {0: 0, 10: 10, 20: 20}


def test_pq_rerank_recall_floor_on_random_corpus(spark):
    """The hard case — iid gaussian vectors (high intrinsic dimension,
    the adversarial corpus for PQ): raw ADC ordering is noisy, and the
    published shortlist-then-exact-rerank recovers it. Floors, not
    exact pins: kmeans assignments can shift with partitioning."""
    from etl_process_for_fraud_transactions_spark.operators.pq import (
        pq_encode,
        pq_topk,
        train_pq,
    )

    rows, corpus = _random_corpus(spark, n=200, dim=16, seed=0)
    queries = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(0, 200, 40)],
        "query_id: long, query_vec: array<double>",
    )
    model = train_pq(corpus, m=4, n_codes=16, seed=1, max_iter=10)
    codes = pq_encode(corpus, model)
    exact = _exact_top10(spark, corpus, queries)

    raw = {
        (r["query_id"], r["vec_id"])
        for r in pq_topk(codes, queries, model, k=10).collect()
    }
    raw_recall = len(raw & exact) / len(exact)

    reranked = {
        (r["query_id"], r["vec_id"])
        for r in pq_topk(
            codes, queries, model, k=10, rerank=corpus, shortlist=60
        ).collect()
    }
    rr_recall = len(reranked & exact) / len(exact)
    assert raw_recall >= 0.3  # sanity: far above random (10/200)
    assert rr_recall >= 0.8
    assert rr_recall >= raw_recall  # rerank never hurts


def test_pq_index_store_guard_and_versioned_flip(spark, tmp_path):
    """PqIndex behind the repo's index conventions: serving parity
    with the in-plan form, loud meta-guard failures, atomic versioned
    rebuild + keep-aware pruning."""
    from etl_process_for_fraud_transactions_spark.operators.pq import (
        PqIndex,
        pq_encode,
        pq_topk,
        train_pq,
    )
    from etl_process_for_fraud_transactions_spark.sources.warehouse import (
        Warehouse,
    )

    rows, corpus = _random_corpus(spark, n=120, dim=8, seed=3)
    queries = spark.createDataFrame(
        [(0, rows[5][1]), (1, rows[50][1])],
        "query_id: long, query_vec: array<double>",
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    idx = PqIndex(wh, versioned=True)
    model = idx.build(corpus, m=4, n_codes=8, seed=2, max_iter=10)

    served = sorted(tuple(r) for r in idx.topk(queries, k=5).collect())
    fresh = sorted(
        tuple(r)
        for r in pq_topk(
            pq_encode(corpus, model), queries, model, k=5
        ).collect()
    )
    assert served == fresh

    with pytest.raises(ValueError, match="rebuild or match"):
        PqIndex(wh, id_col="other_id", versioned=True).topk(queries)
    with pytest.raises(ValueError, match="no meta marker"):
        PqIndex(Warehouse(spark, str(tmp_path / "empty"))).topk(queries)

    idx.build(corpus, m=4, n_codes=8, seed=9, max_iter=10)  # v2 flip
    assert idx.codes_table == "pq_codes_v2"
    assert idx.topk(queries, k=5).count() == 10
    removed = idx.prune_versions(keep=2)
    assert removed == []  # both versions retained
    removed = idx.prune_versions()
    assert sorted(removed) == ["pq_codebooks_v1", "pq_codes_v1"]

    # absorb: encoded against the FROZEN codebooks, O(batch) append
    extra = spark.createDataFrame(
        [(1000, rows[5][1])], "vec_id: long, embedding: array<double>"
    )
    idx.absorb(extra)
    top1 = {
        r["query_id"]: {r["vec_id"]}
        for r in idx.topk(queries, k=1).collect()
    }
    assert top1[0] <= {5, 1000}  # the duplicate vector ties the query


def test_pq_encode_determinism_and_edge_rows(spark):
    """Identical vectors get identical codes; the stored norm is the
    exact float norm; a zero vector scores 0.0 (the cosine
    convention); model rows round-trip through the persisted layout."""
    from etl_process_for_fraud_transactions_spark.operators.pq import (
        PqModel,
        pq_encode,
        pq_topk,
        train_pq,
    )

    rows, corpus = _random_corpus(spark, n=50, dim=8, seed=1)
    model = train_pq(corpus, m=2, n_codes=4, seed=1, max_iter=10)

    dup = spark.createDataFrame(
        [(1, rows[3][1]), (2, rows[3][1]), (3, [0.0] * 8)],
        "vec_id: long, embedding: array<double>",
    )
    enc = {r["vec_id"]: r for r in pq_encode(dup, model).collect()}
    assert enc[1]["pq_codes"] == enc[2]["pq_codes"]
    assert enc[1]["pq_norm"] == pytest.approx(
        math.sqrt(sum(x * x for x in rows[3][1]))
    )
    assert enc[3]["pq_norm"] == 0.0

    q = spark.createDataFrame(
        [(0, rows[3][1])], "query_id: long, query_vec: array<double>"
    )
    scored = pq_topk(pq_encode(dup, model), q, model, k=3).collect()
    zero_row = [r for r in scored if r["vec_id"] == 3]
    assert zero_row and zero_row[0]["adc_sim"] == 0.0

    rt = PqModel.from_rows(
        [
            {"sub_space": j, "code": c, "centroid": list(cent)}
            for j, book in enumerate(model.codebooks)
            for c, cent in enumerate(book)
        ]
    )
    assert rt == model


def test_ivf_pq_composition(spark):
    """IVF-PQ (round 12): cells bound WHAT is scanned, codes bound
    how wide each row is. Pins: (a) a full probe (nprobe = n_cells)
    equals the flat PQ ranking exactly — the composition changes
    pruning, never arithmetic; (b) the probed scan carries a
    file-level PartitionFilter on the cell id; (c) absorb assigns
    against the frozen centroids and the new vector is servable."""
    import shutil
    import tempfile

    from etl_process_for_fraud_transactions_spark.operators.pq import (
        PqIndex,
        pq_encode,
        pq_topk,
        train_pq,
    )
    from etl_process_for_fraud_transactions_spark.sources.warehouse import (
        Warehouse,
    )

    rows, corpus = _random_corpus(spark, n=150, dim=8, seed=11)
    queries = spark.createDataFrame(
        [(0, rows[3][1]), (1, rows[77][1])],
        "query_id: long, query_vec: array<double>",
    )
    root = tempfile.mkdtemp(dir="/tmp")
    try:
        wh = Warehouse(spark, root)
        idx = PqIndex(wh)
        idx.build(corpus, m=4, n_codes=8, seed=2, max_iter=10, n_cells=4)
        stored = wh.read(idx.meta_table).collect()[0]
        assert stored["n_cells"] == 4 and stored["cell_col"] == "pq_cell"

        # (a) full probe == flat PQ (same model, same corpus)
        model = train_pq(corpus, m=4, n_codes=8, seed=2, max_iter=10)
        flat = sorted(
            tuple(r)
            for r in pq_topk(
                pq_encode(corpus, model), queries, model, k=8
            ).collect()
        )
        full_probe = sorted(
            tuple(r) for r in idx.topk(queries, k=8, nprobe=4).collect()
        )
        assert full_probe == flat

        # (b) probed serving prunes at the file level
        probed = idx.topk(queries, k=8, nprobe=1)
        probed.collect()
        plan = probed._jdf.queryExecution().executedPlan().toString()
        part = plan.split("PartitionFilters", 1)
        assert len(part) == 2 and "pq_cell" in part[1][:300]

        # narrower probes return a subset-or-equal hit quality: the
        # probed ranking is the flat ranking restricted to probed
        # cells, so every returned (query, id) is in the flat scored
        # set with the same adc_sim
        flat_scores = {
            (r[0], r[2]): r[3]
            for r in pq_topk(
                pq_encode(corpus, model), queries, model, k=150
            ).collect()
        }
        for r in probed.collect():
            assert flat_scores[(r["query_id"], r["vec_id"])] == r["adc_sim"]

        # (c) absorb: frozen-centroid assignment, new vector servable.
        # Raw ADC rank-1 self-hits are NOT guaranteed on random data
        # (quantization noise), so the pin goes through the exact
        # rerank: cosine(query 0, vec 999) == 1.0 by construction
        extra = spark.createDataFrame(
            [(999, rows[3][1])], "vec_id: long, embedding: array<double>"
        )
        idx.absorb(extra)
        assert (
            wh.read(idx.codes_table).filter("vec_id = 999").count() == 1
        )
        top = {
            r["vec_id"]
            for r in idx.topk(
                queries, k=2, nprobe=4,
                rerank=corpus.unionByName(extra), shortlist=151,
            ).collect()
            if r["query_id"] == 0
        }
        assert top == {3, 999}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_train_pq_rejects_ragged_and_indivisible(spark):
    from etl_process_for_fraud_transactions_spark.operators.pq import (
        train_pq,
    )

    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id: long, embedding: array<double>",
    )
    with pytest.raises(ValueError, match="ragged"):
        train_pq(ragged, m=1, n_codes=2)
    ok = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id: long, embedding: array<double>"
    )
    with pytest.raises(ValueError, match="divisible"):
        train_pq(ok, m=2, n_codes=2)
    empty = spark.createDataFrame(
        [], "vec_id: long, embedding: array<double>"
    )
    with pytest.raises(ValueError, match="empty"):
        train_pq(empty, m=1, n_codes=2)
