"""Connected components over candidate-pair edges.

The missing last step of every near-dup pipeline: MinHash/SimHash/LSH
emit PAIRS (a, b), but "keep one document per duplicate cluster"
needs the transitive closure — if a~b and b~c, then {a, b, c} is one
group even though (a, c) never surfaced as a candidate. The component
id (minimum reachable node id) is the cluster's canonical survivor,
which composes with `dedup_survivor_map`-style attribution.

Two algorithms behind one API (`algorithm=` on every entry point):

- min-label propagation (default): each round every node adopts the
  smallest label among itself and its neighbors; convergence in
  O(longest shortest-path) rounds. Near-dup clusters are
  overwhelmingly tiny and dense (a boilerplate text's pairs form a
  near-clique), so 3-5 rounds finish real corpora at the cheapest
  per-round cost.
- alternating star contraction ('star'): large-star/small-star
  restructuring (Kiveris et al., "Connected Components in MapReduce
  and Beyond") — O(log n) rounds regardless of component diameter.
  The chain-graph insurance: a 10k-node path converges in ~15 rounds
  where label propagation needs 10k (and would hit max_iter).

Spark mechanics that matter in a loop:
- each round's labels are localCheckpoint()ed, not merely persisted:
  the round's plan references the previous labels TWICE (own label ∪
  neighbor labels), so the logical plan doubles per round and a
  persist-only loop drives Catalyst analysis — and the driver heap —
  exponential (observed: OOM at ~12 rounds on a 13-node path graph).
  localCheckpoint truncates the lineage to the materialized RDD, so
  the per-round plan is constant-size. On a production cluster prefer
  reliable checkpoint(dir) if executor loss during the loop must be
  survivable;
- the convergence probe is one small aggregate per round — iterative
  algorithms are inherently action-driven (MLlib's KMeans does the
  same); the per-round shuffle is keyed on the node id and AQE
  handles hub skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _union_find_components(edges: list[tuple]) -> dict:
    """Driver-side union-find with path compression: node -> min
    reachable node. The exact semantics of the distributed paths."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for u, v in edges:
        if u is None or v is None:
            continue
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by MIN so every root is its component's minimum
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    algorithm: str = "label",
    small_graph_max_edges: int | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in `edges`, where
    component = the minimum node id reachable through the undirected
    edge set. Deterministic; raises if `max_iter` rounds don't
    converge (rather than silently returning partial closures).

    algorithm:
    - "label" (default): per-round min-label propagation — rounds =
      component diameter. The right default for near-dup clusters,
      which are tiny near-cliques (3-5 rounds), with the cheapest
      per-round cost.
    - "star": alternating large-star/small-star contraction (Kiveris
      et al., "Connected Components in MapReduce and Beyond") —
      rounds = O(log n) regardless of diameter. Use for chain-shaped
      graphs (templated spam mutation chains, citation paths) where
      label propagation's diameter-many rounds explode: a 10k-node
      path converges in ~15 star rounds vs 10k label rounds
      (tests/test_graph.py pins this).

    small_graph_max_edges: MEASURED driver shortcut (off by default).
    Every distributed round costs jobs (checkpoint + convergence
    count) whose fixed overhead dwarfs the work when the pair graph
    is small — the common case for per-batch near-dup clustering,
    where edges are O(batch duplicates), not O(corpus). When set, the
    edge set is probed with limit(cap+1): if it FITS, union-find
    finishes on the driver in microseconds (identical min-component
    semantics, pinned by parity test); if the probe overflows, the
    distributed path runs as if the cap were never set — measured
    degrade, never an assumed bound (the broadcast-gate contract)."""
    if small_graph_max_edges is not None and small_graph_max_edges > 0:
        probe = (
            edges.select(src, dst)
            .limit(small_graph_max_edges + 1)
            .collect()
        )
        if len(probe) <= small_graph_max_edges:
            comp = _union_find_components([tuple(r) for r in probe])
            node_t = dict(edges.dtypes)[src]
            return edges.sparkSession.createDataFrame(
                sorted(comp.items()),
                f"node: {node_t}, component: {node_t}",
            )
    if algorithm == "star":
        return _connected_components_star(edges, src, dst, max_iter)
    if algorithm != "label":
        raise ValueError(f"algorithm must be label|star, got {algorithm!r}")
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    try:
        for _ in range(max_iter):
            # every node's candidate label: its own + each neighbor's
            neighbor_labels = sym.join(
                labels, sym["v"] == labels["node"], "inner"
            ).select(F.col("u").alias("node"), "component")
            # localCheckpoint (not persist): this plan reads `labels`
            # twice, so without lineage truncation the logical plan —
            # and Catalyst analysis time and driver heap — doubles
            # every round (see module docstring)
            new_labels = (
                labels.select("node", "component")
                .union(neighbor_labels)
                .groupBy("node")
                .agg(F.min("component").alias("component"))
                .localCheckpoint()
            )
            changed = (
                new_labels.join(
                    labels.withColumnRenamed("component", "old"), "node"
                )
                .filter(F.col("component") != F.col("old"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                return labels.select("node", "component")
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "the edge set has a longer-diameter component than near-dup "
            "clusters produce — raise max_iter or pass algorithm='star' "
            "(O(log n) rounds at any diameter)"
        )
    finally:
        sym.unpersist()


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every node u connects its strictly-larger
    neighbors to min(N(u) ∪ {u}). Preserves connectivity; strictly
    decreases large-star potential (Kiveris et al., Lemma 4.1)."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("__mn"))
        .select("u", F.least(F.col("__mn"), F.col("u")).alias("m"))
    )
    # m <= u < v, so no self-loops by construction
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: orient every edge toward the smaller id, then
    every node u connects all its smaller neighbors AND itself to the
    minimum one. Output edges are canonical (u > v)."""
    oriented = e.select(
        F.greatest(F.col("u"), F.col("v")).alias("u"),
        F.least(F.col("u"), F.col("v")).alias("v"),
    ).filter(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    return (
        oriented.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _connected_components_star(
    edges: DataFrame, src: str, dst: str, max_iter: int
) -> DataFrame:
    """Alternating star contraction: large-star then small-star per
    round until the canonical edge set reaches its fixed point — a
    forest of depth-1 stars rooted at each component's minimum id.
    Round count is O(log n) w.h.p. regardless of component diameter
    (vs diameter rounds for label propagation), at the price of a
    slightly heavier round (two groupBy+join phases).

    Same loop mechanics as label propagation: per-round
    localCheckpoint truncates the doubling lineage. Convergence is
    exact set equality, probed cheaply: the edge set shrinks toward
    the star forest, so while the loop is making progress the edge
    COUNT almost always changes — one cheap aggregate decides
    "changed" and skips the two wide exceptAll set-differences; only
    when counts agree (the candidate fixed point) does the
    bidirectional exceptAll confirm true equality. The count is
    cached across rounds so each round pays exactly one count() of
    the new frame while converging."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
        .persist()
    )
    nodes = sym.select(F.col("u").alias("node")).distinct().localCheckpoint()
    # canonical starting edge set (u > v, no self-loops)
    e = (
        sym.select(
            F.greatest(F.col("u"), F.col("v")).alias("u"),
            F.least(F.col("u"), F.col("v")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    try:
        n_e = e.count()
        for _ in range(max_iter):
            new_e = _small_star(_large_star(e)).localCheckpoint()
            n_new = new_e.count()
            if n_new != n_e:
                # still contracting: counts differ => sets differ, no
                # need for the two wide exceptAll set-differences
                e, n_e = new_e, n_new
                continue
            changed = (
                new_e.exceptAll(e).limit(1).count()
                + e.exceptAll(new_e).limit(1).count()
            )
            e, n_e = new_e, n_new
            if changed == 0:
                # fixed point: e is (child, root) for every non-root
                labels = nodes.join(
                    e.select(F.col("u").alias("node"), F.col("v").alias("component")),
                    "node",
                    "left",
                ).select(
                    "node",
                    F.coalesce(F.col("component"), F.col("node")).alias("component"),
                )
                return labels
        raise RuntimeError(
            f"star contraction did not converge in {max_iter} rounds — "
            "O(log n) expected; raise max_iter for astronomically large "
            "node-id ranges or inspect the edge set for pathologies"
        )
    finally:
        sym.unpersist()


def dedup_components(
    pairs: DataFrame,
    all_ids: DataFrame | None = None,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    algorithm: str = "label",
    small_graph_max_edges: int | None = None,
) -> DataFrame:
    """Near-dup pairs -> (doc_id, survivor_id, is_survivor): the
    transitive duplicate clusters with the minimum member as survivor.
    Pass `all_ids` (a frame with `id_col`) to also emit singleton rows
    for documents that appear in no pair — the full corpus verdict a
    curation pipeline filters on. `algorithm` /
    `small_graph_max_edges` as in connected_components ('star' for
    chain-shaped clusters; the measured driver shortcut for per-batch
    graphs)."""
    comp = connected_components(
        pairs, src=src, dst=dst, max_iter=max_iter, algorithm=algorithm,
        small_graph_max_edges=small_graph_max_edges,
    ).select(
        F.col("node").alias(id_col), F.col("component").alias("survivor_id")
    )
    if all_ids is not None:
        singles = (
            all_ids.select(id_col)
            .join(comp.select(id_col), id_col, "left_anti")
            .withColumn("survivor_id", F.col(id_col))
        )
        comp = comp.unionByName(singles)
    return comp.withColumn("is_survivor", F.col(id_col) == F.col("survivor_id"))
