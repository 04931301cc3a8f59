"""Connected components: known answers, a DuckDB recursive-CTE oracle
on a seeded random graph, and the near-dup composition."""

from __future__ import annotations

import random

import pytest

from etl_process_for_fraud_transactions_spark.operators.graph import (
    connected_components,
    dedup_components,
)


def _components(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r.node: r.component for r in connected_components(df, **kw).collect()
    }


@pytest.mark.parametrize("algorithm", ["label", "star"])
def test_components_known_answer(spark, algorithm):
    # {1,2,3} via chain (1-2, 2-3): transitive closure the pairs never
    # stated; {7,9} a separate pair; 5 isolated by self-loop
    got = _components(
        spark, [(1, 2), (2, 3), (7, 9), (5, 5)], algorithm=algorithm
    )
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7, 5: 5}


def test_components_long_chain_converges(spark):
    # path graph 0-1-2-...-12: worst diameter shape for min propagation
    got = _components(spark, [(i, i + 1) for i in range(12)])
    assert set(got.values()) == {0} and len(got) == 13


def test_components_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(12)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(df, max_iter=2)


@pytest.mark.parametrize("algorithm", ["label", "star"])
def test_components_match_duckdb_recursive_oracle(spark, algorithm):
    """Seeded sparse random graph vs an independent DuckDB
    WITH RECURSIVE reachability replay."""
    duckdb = pytest.importorskip("duckdb")

    rng = random.Random(11)
    n = 120
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(90)
    ]
    got = _components(spark, edges, algorithm=algorithm)

    con = duckdb.connect()
    con.execute("CREATE TABLE edges(u BIGINT, v BIGINT)")
    con.executemany("INSERT INTO edges VALUES (?, ?)", edges)
    oracle = dict(
        con.execute(
            """
            WITH RECURSIVE sym AS (
                SELECT u, v FROM edges UNION SELECT v, u FROM edges
            ),
            reach(id, r) AS (
                SELECT DISTINCT u, u FROM sym
                UNION
                SELECT s.v, reach.r FROM reach JOIN sym s ON reach.id = s.u
            )
            SELECT id, MIN(r) FROM reach GROUP BY id
            """
        ).fetchall()
    )
    assert got == oracle


def test_small_graph_shortcut_matches_distributed(spark):
    """The measured driver union-find (round 10) must produce the
    identical (node, component) map as label propagation — including
    chains, self-loops and seeded random graphs — and must fall back
    to the distributed path when the edge probe overflows the cap."""
    cases = [
        [(1, 2), (2, 3), (7, 9), (5, 5)],
        [(i, i + 1) for i in range(12)],
        [(1, 2)],
    ]
    rng = random.Random(7)
    cases.append(
        [(rng.randrange(40), rng.randrange(40)) for _ in range(60)]
    )
    for edges in cases:
        want = _components(spark, edges)
        got = _components(spark, edges, small_graph_max_edges=100_000)
        assert got == want, edges
    # over-cap probe: falls back to the distributed answer
    edges = [(i, i + 1) for i in range(12)]
    got = _components(spark, edges, small_graph_max_edges=3)
    assert got == _components(spark, edges)


def test_small_graph_shortcut_empty_and_null_edges(spark):
    got = _components(
        spark,
        [(None, 3), (4, None), (8, 9)],
        small_graph_max_edges=10,
    )
    assert got == {8: 8, 9: 8}
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(
        df, small_graph_max_edges=10
    ).collect() == []


def test_near_dedup_end_to_end(spark):
    """The full cascade on real text: exact dup + transitive near-dups
    cluster together; the clean document survives alone."""
    from etl_process_for_fraud_transactions_spark.operators.dedup import near_dedup

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs away fast"),
        (2, "the quick brown fox jumps over the lazy dog and runs away fast"),
        (3, "the quick brown fox jumps over the lazy dog and runs away slowly"),
        (4, "completely unrelated text about spark shuffle partitions and joins"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.survivor_id, r.is_survivor)
        for r in near_dedup(docs, threshold=0.5).collect()
    }
    assert got == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        4: (4, True),
    }


def test_dedup_components_composes_with_near_dup_pairs(spark):
    """The full last-mile: near-dup pairs + the corpus id list ->
    per-document cluster verdicts including singletons."""
    pairs = spark.createDataFrame([(2, 1), (2, 3)], "id_a long, id_b long")
    ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "doc_id long")
    got = {
        r.doc_id: (r.survivor_id, r.is_survivor)
        for r in dedup_components(pairs, all_ids=ids).collect()
    }
    assert got == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        4: (4, True),  # singleton: appears in no pair, survives alone
    }


def test_components_empty_edges(spark):
    """No pairs at all: components returns empty, dedup_components
    still emits every corpus id as its own singleton survivor."""
    from etl_process_for_fraud_transactions_spark.operators.graph import (
        dedup_components,
    )

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0
    ids = spark.createDataFrame([(1,), (2,)], "doc_id long")
    got = {
        r.doc_id: (r.survivor_id, r.is_survivor)
        for r in dedup_components(empty, all_ids=ids).collect()
    }
    assert got == {1: (1, True), 2: (2, True)}


def test_star_contraction_converges_on_10k_path(spark):
    """The chain case label propagation cannot touch: a 10,000-node
    path graph has diameter 9,999, so min-label propagation needs
    ~10k rounds (it raises at max_iter=25); star contraction is
    O(log n) rounds and must converge comfortably within 40."""
    edges = spark.range(9_999).selectExpr("id AS id_a", "id + 1 AS id_b")
    labels = connected_components(edges, max_iter=40, algorithm="star")
    agg = labels.selectExpr(
        "count(*) AS n", "count(distinct component) AS c", "min(component) AS m"
    ).collect()[0]
    assert (agg.n, agg.c, agg.m) == (10_000, 1, 0)


def test_star_nonconvergence_guard_still_raises(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="star contraction"):
        connected_components(edges, max_iter=1, algorithm="star")


def test_star_equivalent_to_label_on_near_dup_shapes(spark):
    """On the dense tiny clusters near-dup actually produces, both
    algorithms must give identical labelings."""
    rng = random.Random(7)
    edges = []
    base = 0
    for _ in range(20):  # 20 clusters of 2-6 nodes, near-clique
        size = rng.randrange(2, 7)
        members = list(range(base, base + size))
        for i in members:
            for j in members:
                if i < j and rng.random() < 0.8:
                    edges.append((j, i))
        edges.append((members[-1], members[0]))  # keep it connected
        base += size + rng.randrange(0, 3)
    assert _components(spark, edges) == _components(
        spark, edges, algorithm="star"
    )
