"""Relational-surface extensions beyond the reference's own operator
set (SURVEY.md §2 'not present' lists): set ops, multi-dimensional
aggregation, pivot, analytic lag — a user of the reference switching
to this engine gets the full SQL surface, not just parity."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.core import epoch_us
from ..sources.testdata import load_events, load_table
from .queries import query
from .queries_llm import _IVF_COS


@query(
    "event_type_set_ops",
    """
    SELECT user_id, 'purchase_and_error' AS set_kind FROM (
        SELECT user_id FROM events WHERE event_type = 'purchase'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'error'
    )
    UNION ALL
    SELECT user_id, 'no_purchase' AS set_kind FROM (
        SELECT DISTINCT user_id FROM events
        EXCEPT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    )
    """,
)
def event_type_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op surface in one compound query (U1 + the EXCEPT/UNION ALL
    extensions): INTERSECT-distinct of purchase∩error users, EXCEPT of
    all-minus-purchase users, UNION ALL stitching both branches with a
    marker column. Each branch is a distinct aggregate re-using the
    user_id exchange; the union is append-only (no extra shuffle).

    Round 3: folds the former `event_type_sessions_intersect`,
    `users_without_purchases` and `union_purchases_and_errors` entries
    into one driver slot (50-query cap)."""
    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id")
    errors = ev.filter(F.col("event_type") == "error").select("user_id")
    both = purchases.intersect(errors).select(
        "user_id", F.lit("purchase_and_error").alias("set_kind")
    )
    without = (
        ev.select("user_id")
        .distinct()
        .exceptAll(purchases.distinct())
        .select("user_id", F.lit("no_purchase").alias("set_kind"))
    )
    return both.unionByName(without)


@query(
    "pivot_event_counts",
    """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events
    GROUP BY user_id
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (single-pass; omitting the
    list would cost an extra distinct scan to discover columns)."""
    ev = load_events(spark, sf_dir)
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
    )
    # pivot yields nulls for absent combinations; the oracle's SUM(CASE)
    # yields 0 — align
    return out.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ["click", "error", "purchase", "signup", "view"]],
    )


@query(
    "running_user_totals",
    """
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4)))
                OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           CAST(SUM(CAST(value AS DECIMAL(18,4)))
                OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS window3_sum
    FROM events
    """,
)
def running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame specs (rowsBetween): cumulative and 3-row sliding
    sums per user — decimal-exact accumulation so the running values
    hash-match across engines."""
    ev = load_events(spark, sf_dir)
    order = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w3 = order.rowsBetween(-2, Window.currentRow)
    dec = F.col("value").cast("decimal(18,4)")
    return ev.select(
        "user_id",
        "event_id",
        F.sum(dec).over(cum).cast("double").alias("running_total"),
        F.sum(dec).over(w3).cast("double").alias("window3_sum"),
    )


@query(
    "region_nation_grid",
    """
    SELECT n.n_name AS nation, r.r_name AS region,
           (n.n_regionkey = r.r_regionkey) AS is_home
    FROM nation n CROSS JOIN region r
    """,
)
def region_nation_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN surface (absent from the reference, SURVEY §2.3).
    Plans as BroadcastNestedLoopJoin with the 5-row side broadcast —
    the only join shape where NLJ is the right answer. Guard rail at
    scale: cross joins are for dimension grids, never two facts."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return nation.crossJoin(F.broadcast(region)).select(
        F.col("n_name").alias("nation"),
        F.col("r_name").alias("region"),
        (F.col("n_regionkey") == F.col("r_regionkey")).alias("is_home"),
    )


@query(
    "full_outer_user_activity",
    """
    WITH p AS (
        SELECT user_id, COUNT(*) AS n_purchases FROM events
        WHERE event_type = 'purchase' GROUP BY user_id
    ),
    e AS (
        SELECT user_id, COUNT(*) AS n_errors FROM events
        WHERE event_type = 'error' GROUP BY user_id
    )
    SELECT coalesce(p.user_id, e.user_id) AS user_id,
           coalesce(n_purchases, 0) AS n_purchases,
           coalesce(n_errors, 0) AS n_errors
    FROM p FULL OUTER JOIN e ON p.user_id = e.user_id
    """,
)
def full_outer_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER JOIN surface (absent from the reference): users with
    purchases and/or errors, zero-filled on the missing side. Both
    inputs are aggregates already partitioned on the join key, so the
    join reuses the aggregation exchange (no extra shuffle)."""
    ev = load_events(spark, sf_dir)
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    e = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )
    return (
        p.join(e, "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
            F.coalesce("n_errors", F.lit(0)).alias("n_errors"),
        )
    )


@query(
    "value_rank_functions",
    """
    SELECT event_id, event_type,
           ntile(10) OVER w AS decile,
           dense_rank() OVER w AS drank,
           round(percent_rank() OVER w, 6) AS prank
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
    """,
)
def value_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function surface (ntile / dense_rank / percent_rank).
    Deliberately PARTITIONED by event_type: a global ORDER BY window
    would serialize every row through one partition — the per-group
    form is the shape that survives scale-up, and event_id tie-breaks
    keep ranks deterministic."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.asc("value"), F.asc("event_id"))
    return ev.select(
        "event_id",
        "event_type",
        F.ntile(10).over(w).alias("decile"),
        F.dense_rank().over(w).alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
    )


@query(
    "approx_sketch_stats",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events,
           TRUE AS users_within_bound,
           TRUE AS p50_within_bound,
           TRUE AS p90_within_bound,
           TRUE AS p99_within_bound
    FROM events
    GROUP BY event_type
    """,
)
def approx_sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based approximate aggregates — HLL++ distinct counts and
    quantile sketches, the 100 TB path where exact distinct/percentile
    shuffles are unaffordable. The sketch values themselves are
    engine-specific, so the hash-checked output carries (a) the exact
    counts both engines agree on and (b) *bound verdicts*: booleans
    asserting each sketch landed within its documented error bound of
    the exact statistic, computed in the same aggregate pass. The
    DuckDB twin computes the same exact values and expects every
    verdict TRUE — a sketch drifting out of bounds flips a boolean and
    fails the value hash (VERDICT.md r3 item 3; the quantitative
    rank-error pytest in test_sketch_bounds.py stays as the finer
    instrument).

    Bounds: HLL++ rsd=0.02 allowed 5 standard errors (10%, floor of
    1); percentile_approx(accuracy=10_000) guarantees rank error
    <= n/accuracy = 1e-4*n, checked against exact interpolated
    percentiles at q +/- 0.005 — a 50x-slack envelope that still
    catches a broken sketch. Groups with fewer than MIN_BAND_ROWS rows
    are gated TRUE: below that, eps*n < ~2 ranks and the interpolated
    band can be narrower than one discrete rank step, so a perfectly
    correct sketch (which returns an exact element) could land outside
    it — the verdict is only meaningful where the band spans ranks."""
    ev = load_events(spark, sf_dir)
    eps = 0.005
    MIN_BAND_ROWS = 400  # eps * 400 = 2 ranks: narrowest meaningful band
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("__approx_users"),
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.percentile_approx("value", [0.5, 0.9, 0.99], 10_000).alias("__approx_pcts"),
        F.percentile(
            "value",
            F.array(*[F.lit(q) for q in (0.5 - eps, 0.5 + eps,
                                         0.9 - eps, 0.9 + eps,
                                         0.99 - eps, 0.99 + eps)]),
        ).alias("__exact_band"),
    )

    def pct_ok(i: int):
        approx_v = F.element_at("__approx_pcts", i + 1)
        lo = F.element_at("__exact_band", 2 * i + 1)
        hi = F.element_at("__exact_band", 2 * i + 2)
        return ((approx_v >= lo) & (approx_v <= hi)) | (
            F.col("n_events") < MIN_BAND_ROWS
        )

    users_ok = (
        F.abs(F.col("__approx_users") - F.col("n_users"))
        <= F.greatest(F.lit(5 * 0.02) * F.col("n_users"), F.lit(1.0))
    )
    return agg.select(
        "event_type",
        "n_users",
        "n_events",
        users_ok.alias("users_within_bound"),
        pct_ok(0).alias("p50_within_bound"),
        pct_ok(1).alias("p90_within_bound"),
        pct_ok(2).alias("p99_within_bound"),
    )


@query(
    "value_percentiles_per_type",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events
    GROUP BY event_type
    """,
)
def value_percentiles_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (PERCENTILE_CONT semantics in
    both engines) plus exact distinct counts (two-phase expand under
    the hood) — the exact twins of approx_sketch_stats' HLL++/quantile
    sketches, which have no cross-engine-exact oracle.

    Round 3: absorbs the former `distinct_users_per_type` entry (same
    groupBy key, one aggregate pass — driver 50-query cap)."""
    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )


#: the fixed probe workload for the bm25_topk_docs row: three queries
#: over the fixture vocabulary, lengths 3/4/4, chosen so every query
#: matches many docs (tiny synthetic vocab) and ranking is decided by
#: tf / dl, not mere term presence.
_BM25_QUERIES = {
    "q_join_path": ("hash", "join", "merge"),
    "q_window_sort": ("window", "group", "sort", "order"),
    "q_stream": ("spark", "stream", "batch", "vector"),
}

_SQL_BM25_TOKS = (
    "list_filter(string_split(trim(regexp_replace(lower(text), "
    "'[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '')"
)

_SQL_BM25_QUERY_ROWS = ", ".join(
    f"('{qid}', '{t}')"
    for qid, terms in sorted(_BM25_QUERIES.items())
    for t in terms
)

#: corpus split for the PERSISTED-index serving row (round 14): docs
#: below _BM25_SPLITS[0] are the build() corpus, [s1, s2) is streaming
#: epoch 1, >= s2 is epoch 2 — per-batch stats rows SUM to the exact
#: global aggregate (pinned), so the split itself is score-invariant;
#: what it buys is making absorb, the epoch layout, and the compaction
#: watermark all load-bearing under the driver hash.
_BM25_SPLITS = (300, 400)
#: docs taken down via the REAL Bm25Index.delete() after indexing:
#: 237 (rank-1 of q_join_path at sf0.01, in the compacted build
#: segment) and 321 (rank-1 of q_stream, in merged epoch 1) — their
#: removal flips top-10 membership AND shifts N/avgdl/df for every
#: query, so the tombstone stats subtraction is load-bearing. The
#: oracle replays the takedown by scoring over corpus-minus-deleted
#: (delete() parity with a never-held-the-docs build is the r13
#: bit-identity pin).
_BM25_DELETED = (237, 321)
_BM25_DELETED_SQL = ", ".join(str(i) for i in _BM25_DELETED)


@query(
    "bm25_topk_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_BM25_TOKS} AS t FROM documents
      WHERE doc_id NOT IN ({_BM25_DELETED_SQL})
    ),
    q(query_id, term) AS (VALUES {_SQL_BM25_QUERY_ROWS}),
    exploded AS (
      SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks
    ),
    stats AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(len(t)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS avgdl
      FROM toks
    ),
    dfreq AS (
      SELECT term, COUNT(*) AS df
      FROM (SELECT DISTINCT doc_id, term
            FROM (SELECT doc_id, unnest(t) AS term FROM toks)) dt
      JOIN (SELECT DISTINCT term FROM q) qt USING (term)
      GROUP BY term
    ),
    kept AS (
      SELECT d.term, d.df FROM dfreq d CROSS JOIN stats s
      WHERE CAST(d.df AS DOUBLE) <= 0.8 * CAST(s.n AS DOUBLE)
    ),
    post AS (
      SELECT e.doc_id, e.term,
             COUNT(*) AS tf, MAX(e.dl) AS dl, MAX(k.df) AS df
      FROM exploded e
      JOIN kept k USING (term)
      GROUP BY e.doc_id, e.term
    ),
    contrib AS (
      SELECT q.query_id, p.doc_id,
             ln(1.0 + (s.n - p.df + 0.5) / (p.df + 0.5))
               * (CAST(p.tf AS DOUBLE) * 2.5)
               / (CAST(p.tf AS DOUBLE)
                  + 1.5 * (0.25 + 0.75 * (CAST(p.dl AS DOUBLE) / s.avgdl)))
               AS c
      FROM post p
      JOIN q USING (term)
      CROSS JOIN stats s
    ),
    scored AS (
      SELECT query_id, doc_id,
             COUNT(*) AS n_terms_matched,
             round(CAST(SUM(CAST(c AS DECIMAL(18,9))) AS DOUBLE), 6)
               AS score
      FROM contrib GROUP BY query_id, doc_id
    ),
    bleg AS (
      SELECT query_id, doc_id, n_terms_matched, score, brank
      FROM (
        SELECT query_id, doc_id, n_terms_matched, score,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY score DESC, doc_id ASC
               ) AS brank
        FROM scored
      )
      WHERE brank <= 50
    ),
    corpusv AS (
      SELECT vec_id AS doc_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings
    ),
    qv(query_id, m) AS (VALUES ('q_join_path', 0),
                               ('q_window_sort', 1),
                               ('q_stream', 2)),
    qvec AS (
      SELECT qv.query_id, c.vec FROM qv JOIN corpusv c ON c.doc_id = qv.m
    ),
    -- IVF replay (round 15, persisted-persisted hybrid): per-cell
    -- mean centroids over the label-assigned store, top-3 probed
    -- cells per query by rounded centroid cosine, exact cosine
    -- WITHIN probed cells only — the IvfIndex serving cascade
    vexpl AS (
      SELECT label, generate_subscripts(vec, 1) AS pos, unnest(vec) AS val
      FROM corpusv
    ),
    cmeans AS (
      SELECT label, pos, avg(val) AS mean_val FROM vexpl GROUP BY label, pos
    ),
    cents AS (
      SELECT label, list(mean_val ORDER BY pos) AS centroid
      FROM cmeans GROUP BY label
    ),
    probescored AS (
      SELECT q.query_id, c.label, q.vec AS qvec,
             {_IVF_COS.format(a="c.centroid", b="q.vec")} AS cent_sim
      FROM cents c CROSS JOIN qvec q
    ),
    probes AS (
      SELECT query_id, label, qvec FROM (
        SELECT query_id, label, qvec,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cent_sim DESC, label ASC) AS pr
        FROM probescored)
      WHERE pr <= 3
    ),
    vscored AS (
      SELECT p.query_id, a.doc_id,
             {_IVF_COS.format(a="a.vec", b="p.qvec")} AS cos_sim
      FROM corpusv a JOIN probes p ON a.label = p.label
    ),
    vleg AS (
      SELECT query_id, doc_id, cos_sim, vrank
      FROM (
        SELECT query_id, doc_id, cos_sim,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY cos_sim DESC, doc_id ASC
               ) AS vrank
        FROM vscored
      )
      WHERE vrank <= 50
    ),
    fusedall AS (
      SELECT coalesce(b.query_id, v.query_id) AS query_id,
             coalesce(b.doc_id, v.doc_id) AS doc_id,
             b.brank AS bm25_rank, v.vrank AS vec_rank,
             b.n_terms_matched, b.score AS bm25_score, v.cos_sim,
             round((CASE WHEN b.brank IS NULL THEN 0.0
                         ELSE 1.0 / (60.0 + CAST(b.brank AS DOUBLE)) END)
                   + (CASE WHEN v.vrank IS NULL THEN 0.0
                           ELSE 1.0 / (60.0 + CAST(v.vrank AS DOUBLE)) END),
                   9) AS rrf_score
      FROM bleg b
      FULL OUTER JOIN vleg v
        ON b.query_id = v.query_id AND b.doc_id = v.doc_id
    )
    SELECT query_id, rank, doc_id, bm25_rank, vec_rank,
           n_terms_matched, bm25_score, cos_sim, rrf_score
    FROM (
      SELECT *,
             row_number() OVER (
               PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC
             ) AS rank
      FROM fusedall
    )
    WHERE rank <= 10
    """,
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi-BM25 top-10 per probe query (operators/retrieval.py) —
    ranked keyword retrieval, the data-selection / contamination-triage
    workhorse of a training-data pipeline.

    Subsumes the former `token_frequencies` wordcount row (round 9,
    driver 50-query cap): the explode -> hash-aggregate token surface
    lives on inside the postings/df computation, now with the shuffle
    pruned to query terms MAP-SIDE by a bounded broadcast — at 100 TB
    the exchange carries only matched (doc, term) postings, the
    dictionary-not-corpus argument strengthened to
    query-vocabulary-not-dictionary. Score sums use the dsum exact-
    decimal trick so fold order cannot flip a hash; ranks order by the
    ROUNDED score with a doc-id tie-break so the window is decided
    entirely by values both engines agree on (module docstring has the
    full determinism argument; ln()'s 1-ulp libm residual is the
    accepted ivf_centroids class).

    Round 10: runs the max-df scale guard (max_df_frac=0.8) — terms
    matching >80% of the corpus are dropped BEFORE the postings
    shuffle (stopword treatment; the df pre-pass's partial aggregation
    keeps its own exchange at |query vocab| rows per task). On the
    fixture the guard demonstrably fires: at sf0.01 it drops 'batch'
    (df 402/500), at sf0.001 'window'/'merge'/'sort' — the oracle's
    `kept` CTE replays the same double-precision df <= 0.8*N cut.

    Round 11 (VERDICT r10 item 4): the row is now the HYBRID
    retrieval surface — each probe query also carries a vector
    (embeddings vec_id 0/1/2; vec_id aligns with doc_id in the
    fixture), the keyword leg (top-50, guard active) and the exact
    cosine leg (top-50, rounded 6 dp before ranking) fuse by
    reciprocal-rank fusion (operators/retrieval.py::rrf_fuse,
    k_rrf=60), and the output is the fused top-10 with BOTH leg ranks
    alongside (nullable where a leg missed the doc). rrf_score is a
    fixed-order two-term sum of single IEEE divisions, rounded to
    9 dp before the rank window — exactly replayed by the oracle's
    FULL OUTER JOIN. Fusion-only hits (docs neither leg ranked top-10
    alone) are pinned in tests/test_retrieval.py.

    Round 14 (VERDICT r13 item 1 — the production serving shape under
    the driver hash, replacing the retired in-plan <=2 s target): the
    keyword leg now serves from a PERSISTED `Bm25Index`
    (operators/retrieval.py:380) built inside the row, the
    neardup_incremental_filter precedent. The full maintenance cycle
    runs against a deterministic scratch warehouse: build(docs < 300)
    -> absorb(epoch 1: 300..399) -> absorb(epoch 2: >= 400) ->
    delete() two docs that each held a rank-1 slot (_BM25_DELETED;
    exact integer stats subtraction shifts N/avgdl/idf for EVERY
    score) -> compact(through=1) (merges __build__ + epoch 1, records
    the replay watermark) -> a deliberate REPLAY of epoch 1, which the
    watermark must skip (a broken skip re-appends the merged epoch's
    postings and stats row — double-counted tf/df/N flip the hash) ->
    topk over the pruned term buckets, summed per-batch stats rows,
    and the tombstone-subtracted fold. Each mechanism is load-bearing
    under the oracle, which independently scores corpus-minus-deleted
    in DuckDB (the r13 delete-parity bit-identity pin is what makes
    that replay exact; delete-disabled negative control measured —
    the hash flips). The former in-plan bm25_scores path keeps its
    pytest parity pin (tests/test_retrieval.py) — in-plan and
    persisted serving are bit-identical by construction, they share
    `_score_postings`.

    Round 15 (VERDICT r14 item 3 — persisted-persisted hybrid under
    the hash): the vector leg swaps its in-plan exact-cosine
    crossJoin for a PERSISTED IvfIndex (float store, label cells via
    build(assigned=True), nprobe=3) built in-row, and the fusion runs
    through the REAL `hybrid_topk` operator
    (operators/retrieval.py) composing the two index stores — the
    production keyword+vector serving path, previously pytest-only.
    The oracle replays the IVF cascade (per-cell mean centroids ->
    top-3 probed cells by rounded centroid cosine -> exact cosine
    within probed cells) in the cents/probes/vscored CTEs next to the
    BM25 replay and the RRF arithmetic; cell pruning is load-bearing
    (a doc outside the probed cells cannot appear in the vector leg,
    shifting vec_rank and rrf_score for every fused row vs the old
    brute-force leg). Fusion-only hits on the persisted pair plus a
    store-replay rank identity are pinned in tests/test_retrieval.py."""
    import os
    import re
    import tempfile

    from ..operators.retrieval import Bm25Index, hybrid_topk
    from ..sources.warehouse import Warehouse

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    s1, s2 = _BM25_SPLITS
    epoch1 = docs.filter(
        (F.col("doc_id") >= s1) & (F.col("doc_id") < s2)
    )
    # deterministic per-sf scratch path (the neardup row's contract):
    # the returned frame lazily reads the index tables, so the store
    # must outlive this call; build() re-overwrites atomically on
    # every run and resets watermark + tombstones — no temp growth,
    # no cross-run state
    scratch = os.path.join(
        tempfile.gettempdir(),
        "bm25_idx_" + re.sub(r"\W+", "_", sf_dir).strip("_"),
    )
    idx = Bm25Index(Warehouse(spark, scratch), partitioned=True)
    # r15 (VERDICT r14 item 3): the vector leg ALSO serves from a
    # persisted store — an IvfIndex built in-row on the label-assigned
    # embeddings (assigned=True: the bring-your-own-quantizer path;
    # float store, per-cell mean centroids, nprobe=3 cell-pruned exact
    # cosine) — so the row is the PERSISTED-PERSISTED hybrid: both
    # legs read index tables and the fusion runs through the REAL
    # hybrid_topk operator, with the oracle replaying the IVF cascade
    # (cents/probes CTEs) next to the corpus-minus-deleted BM25
    # scoring and the RRF arithmetic. A fusion-only hit on the
    # persisted pair stays pinned in tests/test_retrieval.py.
    iscratch = os.path.join(
        tempfile.gettempdir(),
        "bm25hyb_ivf_" + re.sub(r"\W+", "_", sf_dir).strip("_"),
    )
    from ..operators.similarity import IvfIndex

    hivf = IvfIndex(
        Warehouse(spark, iscratch), name="hybivf", cell_col="label"
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    # The maintenance cycle (7 sequential bm25 job groups + the ivf
    # build over a ~500-doc fixture) is EAGER — right-size its
    # shuffles instead of running them at an external session's
    # 200-partition default. MEASURED (r15, BASELINE): flat on an
    # AQE-on session (AQE already coalesces these tiny shuffles; the
    # warm floor is ~25 job barriers at ~0.4 s each, not partition
    # width) — the scope's value is sessions with AQE disabled, where
    # 200 real tasks per shuffle would be scheduled. The served plan
    # below executes after the scope exits, so its shape is untouched
    # either way.
    from ..session import run_concurrently, scratch_shuffle_partitions

    def _bm25_cycle():
        idx.build(docs.filter(F.col("doc_id") < s1))
        idx.absorb(epoch1, batch=1)
        idx.absorb(docs.filter(F.col("doc_id") >= s2), batch=2)
        idx.delete(
            spark.createDataFrame(
                [(int(i),) for i in _BM25_DELETED], "doc_id: long"
            )
        )
        idx.compact(through=1)
        # replay of the already-merged epoch: the compaction watermark
        # must no-op this (skip broken -> epoch-1 rows land alongside
        # their __compacted__ copies -> hash flips)
        idx.absorb(epoch1, batch=1)

    with scratch_shuffle_partitions(spark, 8):
        # the keyword-index cycle and the vector-index build touch
        # DISJOINT scratch stores — overlapping them fills the
        # fixture-scale job-barrier gaps (guide §2.6) without changing
        # either store's contents or the served plan
        run_concurrently(_bm25_cycle, lambda: hivf.build(emb, assigned=True))

    qmap = {"q_join_path": 0, "q_window_sort": 1, "q_stream": 2}
    qv = spark.createDataFrame(
        sorted(qmap.items()), "query_id: string, m: long"
    )
    qvec = emb.join(F.broadcast(qv), emb["vec_id"] == qv["m"]).select(
        "query_id", F.col("embedding").alias("query_vec")
    )
    # the composed persisted-persisted serving path: Bm25Index keyword
    # leg + IvfIndex vector leg, RRF-fused by the real operator; leg
    # evidence rides THROUGH the fusion join (keep columns) — re-
    # joining a leg afterwards would duplicate its whole subtree (the
    # postings scan, the probe broadcast) in the physical plan
    fused = hybrid_topk(
        _BM25_QUERIES,
        qvec,
        idx,
        hivf,
        k=10,
        k_rrf=60,
        leg_k=50,
        nprobe=3,
        max_df_frac=0.8,
        sim_round=6,
        keep_bm25=("n_terms_matched", "score"),
        keep_vec=("cos_sim",),
    )
    return fused.select(
        "query_id", "rank", "doc_id", "bm25_rank", "vec_rank",
        "n_terms_matched",
        F.col("score").alias("bm25_score"),
        "cos_sim", "rrf_score",
    )


# (The former `user_event_type_arrays` row was folded out in round 7
# under the driver's 50-query cap: its collect_set -> sort_array ->
# array_join surface is already hash-checked by `grouped_result_mix`
# (array_agg + ANY membership) and `event_type_set_ops`; the slot now
# carries `corpus_health_report` in queries_llm.py.)


@query(
    "global_top_orders",
    """
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def global_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT (absent from the reference, SURVEY §2.7).
    Spark plans this as TakeOrderedAndProject — a per-partition top-k
    then a driver merge of k-sized heaps, NOT a global sort: at 100 TB
    no full shuffle happens. o_orderkey tie-break keeps the row set
    deterministic for the oracle."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey", "o_custkey", F.col("o_totalprice").cast("double").alias("totalprice")
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "docs_pattern_extract",
    """
    SELECT doc_id,
           upper(substr(text, 1, 8)) AS head8,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           length(text) AS n_chars_seen
    FROM documents
    WHERE text LIKE '%spark%' AND lang IS NOT NULL
    """,
)
def docs_pattern_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface (LIKE / substr / upper / length /
    regexp_extract — none exist in the reference SQL, SURVEY §2.9).
    All stay in whole-stage codegen; LIKE '%spark%' is evaluated as a
    contains() after pushdown, no Python in the loop."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").like("%spark%") & F.col("lang").isNotNull())
        .select(
            "doc_id",
            F.upper(F.substring("text", 1, 8)).alias("head8"),
            F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
            F.length("text").alias("n_chars_seen"),
        )
    )


@query(
    "json_props_by_type",
    """
    SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) % 5 AS k_mod,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type, k_mod
    """,
)
def json_props_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column access: `events.props` is a JSON
    string; from_json with an explicit schema keeps the extraction in
    codegen (vs per-row Python). At 100 TB the typed struct projects/
    prunes like any other column; schema-on-read, no reparse per use."""
    ev = load_events(spark, sf_dir)
    k = F.from_json(F.col("props"), "k INT").getField("k")
    return (
        ev.select("event_type", (k % 5).alias("k_mod"), "value")
        .groupBy("event_type", "k_mod")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
    )


@query(
    "hourly_event_windows",
    """
    SELECT date_trunc('hour', ts) AS hour_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY hour_start, event_type
    """,
)
def hourly_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time windows via F.window — the batch twin of the
    Structured Streaming windowed aggregation (streaming/rules.py); the
    oracle expresses the same bucketing as date_trunc. One shuffle on
    (window, event_type); partial aggregation is map-side."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"), "event_type", "n_events", "sum_value"
        )
    )


@query(
    "cube_revenue",
    """
    SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
           coalesce(l_returnflag, '<all>') AS returnflag,
           coalesce(l_linestatus, '<all>') AS linestatus,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over both flag dimensions with the standard GROUPING bitmap
    (bit set where the column is aggregated away — same encoding both
    engines). Spark expands grouping sets before the hash aggregate, so
    it's still a single shuffle.

    Round 3: supersedes the former `rollup_revenue` entry — the ROLLUP
    grouping sets {(a,b),(a),()} are exactly the CUBE rows with gid in
    (0,1,3), so the hash-match here covers the ROLLUP surface too
    (driver 50-query cap)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "gid",
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "revenue",
            "n_items",
        )
    )


@query(
    "asof_prev_hour_stats",
    """
    WITH hourly AS (
        SELECT user_id,
               date_trunc('hour', ts) + INTERVAL 1 HOUR AS ts,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS prev_hour_sum
        FROM events GROUP BY 1, 2
    )
    SELECT e.event_id AS event_id, e.user_id AS user_id, h.prev_hour_sum AS prev_hour_sum
    FROM events e ASOF LEFT JOIN hourly h
      ON e.user_id = h.user_id AND e.ts >= h.ts
    """,
)
def asof_prev_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each event picks its user's most
    recent COMPLETED hourly aggregate. The Spark rewrite is a
    union + last-ignore-nulls window — one shuffle, no pair explosion —
    while the oracle uses DuckDB's native ASOF LEFT JOIN."""
    from ..operators.asof import asof_join

    ev = load_events(spark, sf_dir)
    hourly = (
        ev.groupBy(
            "user_id",
            (F.date_trunc("hour", "ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("prev_hour_sum"))
    )
    left = ev.select("event_id", "user_id", "ts")
    return asof_join(
        left, hourly, ["user_id"], "ts", ["prev_hour_sum"], tiebreak_col="event_id"
    ).select("event_id", "user_id", "prev_hour_sum")


@query(
    "event_time_gaps",
    """
    SELECT user_id, event_id,
           CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS BIGINT) AS gap_us,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def event_time_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics (the idiomatic rewrite SURVEY §2.6 notes for
    the decreasing-amount check): inter-event gap + next event type."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return ev.select(
        "user_id",
        "event_id",
        (epoch_us(F.col("ts")) - epoch_us(F.lag("ts").over(w))).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )
