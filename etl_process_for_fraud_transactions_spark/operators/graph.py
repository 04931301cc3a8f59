"""Connected components over candidate-pair edges.

The missing last step of every near-dup pipeline: MinHash/SimHash/LSH
emit PAIRS (a, b), but "keep one document per duplicate cluster"
needs the transitive closure — if a~b and b~c, then {a, b, c} is one
group even though (a, c) never surfaced as a candidate. The component
id (minimum reachable node id) is the cluster's canonical survivor,
which composes with `dedup_survivor_map`-style attribution.

Algorithm: iterative min-label propagation expressed as DataFrame
joins — each round every node adopts the smallest label among itself
and its neighbors; convergence in O(longest shortest-path) rounds.
Near-dup clusters are overwhelmingly tiny and dense (a boilerplate
text's pairs form a near-clique), so 3-5 rounds finish real corpora;
`max_iter` guards the adversarial chain case, and the large-star/
small-star restructuring (Kiveris et al., "Connected Components in
MapReduce and Beyond") is the published upgrade path if a corpus ever
exhibits O(log n)-diameter components at scale.

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


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in `edges`, where
    component = the minimum node id reachable through the undirected
    edge set. Deterministic; raises if `max_iter` rounds don't
    converge (rather than silently returning partial closures)."""
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
            "clusters produce — raise max_iter or switch to a "
            "star-contraction variant"
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
) -> DataFrame:
    """Near-dup pairs -> (doc_id, survivor_id, is_survivor): the
    transitive duplicate clusters with the minimum member as survivor.
    Pass `all_ids` (a frame with `id_col`) to also emit singleton rows
    for documents that appear in no pair — the full corpus verdict a
    curation pipeline filters on."""
    comp = connected_components(pairs, src=src, dst=dst, max_iter=max_iter).select(
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
