"""URL/domain curation operators: known answers + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_process_for_fraud_transactions_spark.operators.web import (
    AGGRESSIVE_TRACKING_PARAMS,
    cap_per_domain,
    dedup_by_url,
    filter_blocklisted_domains,
    normalize_url,
    registered_domain,
    url_features,
)


def _one(spark, url, expr):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(expr.alias("v")).first().v


def test_registered_domain_heuristic_and_psl_suffixes(spark):
    cases = {
        "https://www.example.com/a": "example.com",
        "http://news.bbc.co.uk/page": "bbc.co.uk",
        "https://a.b.deep.example.com/": "example.com",
        "http://shop.com.au.evil.org/x": "evil.org",
        "http://192.168.10.1/admin": "192.168.10.1",
    }
    for url, want in cases.items():
        got = _one(spark, url, registered_domain(F.col("url")))
        assert got == want, (url, got, want)


def test_registered_domain_single_label_and_malformed_fallback(spark):
    """Single-label hosts are their own domain; host-less URLs fall
    back to the raw string — no ''/null mega-group under the cap or
    the blocklist."""
    cases = {
        "http://localhost/admin": "localhost",
        "http://intranet:8080/wiki": "intranet",
        "not a url at all": "not a url at all",
    }
    for url, want in cases.items():
        got = _one(spark, url, registered_domain(F.col("url")))
        assert got == want, (url, got, want)


def test_url_features(spark):
    df = spark.createDataFrame(
        [(1, "https://www.Example.com/a/b/c?x=1"), (2, "http://ex.org")],
        "doc_id long, url string",
    )
    got = {r.doc_id: r for r in url_features(df).collect()}
    assert got[1].url_host == "example.com"
    assert got[1].url_path_depth == 3 and got[1].url_has_query
    assert got[2].url_path_depth == 0 and not got[2].url_has_query


def test_normalize_url_collapses_tracking_variants(spark):
    a = "https://www.example.com/story/?utm_source=x&utm_medium=y"
    b = "http://example.com/story"
    c = "https://example.com/story?id=7&utm_source=z"
    na = _one(spark, a, normalize_url(F.col("url")))
    nb = _one(spark, b, normalize_url(F.col("url")))
    nc = _one(spark, c, normalize_url(F.col("url")))
    assert na == nb == "example.com/story"
    assert nc == "example.com/story?id=7"  # real params survive


def test_normalize_url_keeps_nondefault_port(spark):
    """host:8080 is a distinct origin; :80/:443 collapse to host."""
    assert (
        _one(spark, "http://example.com:8080/x", normalize_url(F.col("url")))
        == "example.com:8080/x"
    )
    assert (
        _one(spark, "http://example.com:80/x", normalize_url(F.col("url")))
        == "example.com/x"
    )
    assert (
        _one(spark, "https://example.com:443/x", normalize_url(F.col("url")))
        == "example.com/x"
    )


def test_normalize_url_ref_param_survives_by_default(spark):
    """GitHub-style ?ref=branch selects a distinct resource — kept
    unless the caller opts into AGGRESSIVE_TRACKING_PARAMS."""
    u = "https://example.com/tree?ref=main"
    assert _one(spark, u, normalize_url(F.col("url"))) == "example.com/tree?ref=main"
    assert (
        _one(spark, u, normalize_url(F.col("url"), AGGRESSIVE_TRACKING_PARAMS))
        == "example.com/tree"
    )


def test_dedup_by_url_keeps_min_id(spark):
    df = spark.createDataFrame(
        [
            (3, "https://www.example.com/story/?utm_source=x"),
            (1, "http://example.com/story"),
            (2, "http://example.com/other"),
        ],
        "doc_id long, url string",
    )
    kept = sorted(r.doc_id for r in dedup_by_url(df).collect())
    assert kept == [1, 2]


def test_filter_blocklisted_domains_covers_subdomains(spark):
    df = spark.createDataFrame(
        [
            (1, "https://spam.example.com/x"),
            (2, "https://deep.a.spam-site.org/y"),
            (3, "https://fine.org/z"),
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame(
        [("example.com",), ("SPAM-SITE.org",)], "domain string"
    )
    kept = [r.doc_id for r in filter_blocklisted_domains(df, bl).collect()]
    assert kept == [3]
    # plan: the blocklist side joins as a broadcast hash join
    plan = (
        filter_blocklisted_domains(df, bl)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Broadcast" in plan


def test_filter_blocklisted_domains_host_level_entry_blocks_subtree(spark):
    """An entry finer than eTLD+1 (the UT1 shape) blocks exactly its
    subtree; sibling subdomains of the same registered domain and an
    IP host whose partial suffix resembles an entry both survive."""
    df = spark.createDataFrame(
        [
            (1, "https://spam.blogspot.com/p/1"),
            (2, "https://x.spam.blogspot.com/p/2"),
            (3, "https://nice.blogspot.com/p/3"),
            (4, "http://10.20.3.4/x"),
            (5, "http://localhost/x"),
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame(
        [("spam.blogspot.com",), ("3.4",), ("localhost",)], "domain string"
    )
    kept = sorted(r.doc_id for r in filter_blocklisted_domains(df, bl).collect())
    assert kept == [3, 4]  # subtree blocked; sibling + IP survive; localhost exact-matches


def test_cap_per_domain(spark):
    rows = [(i, f"https://big.example.com/p{i}") for i in range(10)]
    rows += [(100, "https://small.org/x"), (101, "https://small.org/y")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = sorted(r.doc_id for r in cap_per_domain(df, max_docs=3).collect())
    assert kept == [0, 1, 2, 100, 101]  # min ids win; small.org untouched


def test_cap_per_domain_exposes_persisted_frame_for_release(spark):
    """Cache-lifetime contract (round 10, ADVICE r8 close-out): each
    call persists exactly one bounded aggregate and hands it back via
    `_persisted_frames`, so a batch loop releases it deterministically
    instead of accumulating LRU-evictable frames."""
    # assert on the persisted frame's OWN storage level, not the
    # session-global persistent-RDD count: Spark's async
    # ContextCleaner shrinks the global set mid-test (the exact flake
    # class de-flaked in round 12's cache-release tests; it recurred
    # here in round 13's full-suite run)
    def _live(frame):
        lvl = frame.storageLevel
        return lvl.useMemory or lvl.useDisk

    rows = [(i, f"https://big.example.com/p{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    for _ in range(3):
        out = cap_per_domain(df, max_docs=3)
        out.collect()
        # r17: the over-cap aggregate AND the materialized (id, domain)
        # proxy (a _LocalCheckpointHandle — its storageLevel property
        # reflects the checkpoint RDD, so _live covers both kinds)
        assert len(out._persisted_frames) == 2
        assert all(_live(f) for f in out._persisted_frames)
        for f in out._persisted_frames:
            f.unpersist(blocking=True)
        assert not any(_live(f) for f in out._persisted_frames)


def test_cap_per_domain_two_phase_matches_single_window(spark):
    """The salted two-phase top-k must equal the plain global window
    answer on a planted mega-domain regardless of salt fan-out."""
    from pyspark.sql.window import Window

    rows = [(i * 13 % 997, f"https://mega.example.com/p{i}") for i in range(400)]
    rows += [(10_000 + i, f"https://site{i % 7}.org/x{i}") for i in range(70)]
    rows = [(i, u) for i, u in dict(rows).items()]  # unique ids
    df = spark.createDataFrame(rows, "doc_id long, url string")
    for salt in (1, 4, 64):
        got = sorted(
            r.doc_id
            for r in cap_per_domain(df, max_docs=5, salt_buckets=salt).collect()
        )
        w = Window.partitionBy("__d").orderBy(F.asc("doc_id"))
        want = sorted(
            r.doc_id
            for r in df.withColumn("__d", registered_domain(F.col("url")))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= 5)
            .collect()
        )
        assert got == want, salt


def test_malformed_urls_never_merge(spark):
    """Scheme-less URLs have no parseable host; they must dedup only
    against identical raw strings, never collapse as a null group."""
    df = spark.createDataFrame(
        [(1, "example.com/x"), (2, "other.org/y"), (3, "example.com/x")],
        "doc_id long, url string",
    )
    kept = sorted(r.doc_id for r in dedup_by_url(df).collect())
    assert kept == [1, 2]


def test_url_quality_flags(spark):
    from etl_process_for_fraud_transactions_spark.operators.web import (
        url_quality_flags,
    )

    rows = [
        (1, "https://example.com/articles/how-to-cook-rice"),
        (2, "https://example.com/static/site.css"),
        (3, "https://example.com/" + "/".join(f"d{i}" for i in range(12))),
        (4, "https://example.com/p?" + "&".join(f"k{i}=v{i}" for i in range(40))),
        (5, "https://123456789012.example.com/x"),
        (6, "https://example.com/photo.jpg"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.doc_id: r for r in url_quality_flags(df).collect()}
    assert got[1].url_ok
    assert not got[2].url_is_content and not got[2].url_ok
    assert not got[3].url_depth_ok
    assert not got[4].url_query_ok
    assert not got[5].url_host_digits_ok
    assert not got[6].url_is_content
    # flags are expressions only: map-side plan
    plan = url_quality_flags(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_null_urls_pass_dedup_and_get_capped(spark):
    """NULL urls have no fetch identity: dedup passes them through
    untouched (they must never merge into one survivor), while the
    cap treats them as ONE url-less group (they must not bypass the
    anti-dominance policy)."""
    rows = [(i, None) for i in range(10)]
    rows += [(100, "https://a.org/x"), (101, "https://a.org/x")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    deduped = sorted(r.doc_id for r in dedup_by_url(df).collect())
    assert deduped == list(range(10)) + [100]   # nulls kept, real dup merged
    capped = sorted(
        r.doc_id for r in cap_per_domain(df, max_docs=3).collect()
    )
    assert capped == [0, 1, 2, 100, 101]        # url-less group capped at 3


def test_blocklist_filter_is_fully_map_side(spark):
    """The round-7 rewrite's contract: chained broadcast anti joins,
    no shuffle Exchange anywhere — the corpus text never moves."""
    df = spark.createDataFrame(
        [(1, "https://spam.example.com/x"), (2, "https://fine.org/y")],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("example.com",)], "domain string")
    out = filter_blocklisted_domains(df, bl)
    assert [r.doc_id for r in out.collect()] == [2]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    # the only shuffle allowed is the tiny blocklist's distinct();
    # no exchange may be keyed on a corpus column
    import re as _re

    for m in _re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "__blocked" in m.group(1), m.group(0)
    assert "BroadcastHashJoin" in plan


def test_blocklist_deep_entry_matches_exact_host(spark):
    """Entries deeper than _MAX_SUFFIX_LABELS still match their exact
    host (via the full-host probe), just not their subtree."""
    deep = "a.b.c.d.e.f.g.example.com"
    df = spark.createDataFrame(
        [(1, f"https://{deep}/x"), (2, f"https://extra.{deep}/y")],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([(deep,)], "domain string")
    kept = sorted(r.doc_id for r in filter_blocklisted_domains(df, bl).collect())
    assert kept == [2]  # exact host blocked; 10-label subtree child documented as kept


def test_cap_per_domain_unhinted_path_matches_and_adapts(spark):
    """Round 8: the broadcast hints are gated on the MEASURED over-cap
    count — with the gate forced shut (broadcast_max_rows=0) the
    answer is identical and the plan still converges (AQE picks
    broadcast at this scale from runtime stats instead of a forced
    hint that cannot fall back; at genuine web scale the same path
    degrades to an id-keyed shuffle join rather than an OOM)."""
    rows = [(i, f"https://mega.example.com/p{i}") for i in range(50)]
    rows += [(1000 + i, f"https://site{i % 5}.org/x{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, url string").withColumn(
        "text", F.lit("payload text")
    )
    hinted = sorted(r.doc_id for r in cap_per_domain(df, max_docs=7).collect())
    out = cap_per_domain(df, max_docs=7, broadcast_max_rows=0)
    unhinted = sorted(r.doc_id for r in out.collect())
    assert hinted == unhinted
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # no broadcast HINT survives in the optimized plan — whatever
    # broadcasting happens is AQE's runtime choice, which CAN fall back
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in opt


def test_cap_per_domain_gated_broadcast_still_keeps_text_map_side(spark):
    """With the gate open (the default budget), the policy joins stay
    broadcast and the corpus text never enters any exchange — the
    round-7 invariant is unchanged by the round-8 gating."""
    import re as _re

    rows = [(i, f"https://d{i % 3}.org/p{i}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, url string").withColumn(
        "text", F.lit("payload text")
    )
    out = cap_per_domain(df, max_docs=10)
    qe = out._jdf.queryExecution()
    formatted = qe.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    blocks = _re.split(r"\n\(\d+\) ", formatted)
    for b in [b for b in blocks if b.startswith("Exchange")]:
        m = _re.search(r"Input \[\d+\]: \[([^\]]*)\]", b)
        assert m and "text" not in m.group(1), b
    assert "BroadcastHashJoin" in formatted


def test_blocklist_public_suffix_entry_is_inert(spark):
    """Round 8: a junk blocklist entry that IS a public suffix
    ('co.uk' — real lists like UT1 do contain such rows) must not
    wipe every host under that suffix; it still matches a host
    EXACTLY equal to it, and ordinary entries keep working."""
    df = spark.createDataFrame(
        [
            (1, "https://news.bbc.co.uk/page"),
            (2, "https://www.gov.scot.co.uk/x"),
            (3, "http://co.uk/landing"),
            (4, "https://spam.example.com/y"),
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame(
        [("co.uk",), ("example.com",)], "domain string"
    )
    kept = sorted(r.doc_id for r in filter_blocklisted_domains(df, bl).collect())
    # subtree survives the suffix entry; the exact host and the
    # ordinary entry's subtree are blocked
    assert kept == [1, 2]


def test_url_quality_flags_null_url_is_defined_false(spark):
    """Round 8: a NULL url yields explicit FALSE on every flag and on
    url_ok — never NULL — so filter(url_ok) and flag-rate audits see
    defined semantics (the dedup_by_url/cap_per_domain precedent)."""
    from etl_process_for_fraud_transactions_spark.operators.web import (
        url_quality_flags,
    )

    df = spark.createDataFrame(
        [(1, None), (2, "https://example.com/fine")],
        "doc_id long, url string",
    )
    got = {r.doc_id: r for r in url_quality_flags(df).collect()}
    for flag in (
        "url_is_content",
        "url_depth_ok",
        "url_query_ok",
        "url_host_digits_ok",
        "url_ok",
    ):
        assert getattr(got[1], flag) is False, flag
        assert getattr(got[2], flag) is True, flag


def test_cap_per_domain_return_persisted_tuple(spark):
    """`return_persisted=True` hands the persisted frames back
    explicitly (ADVICE r10): unlike the `_persisted_frames` attribute
    — which any further transformation silently drops, leaking cache
    until LRU eviction — the tuple survives arbitrary wrapping of the
    result."""
    jsc = spark.sparkContext._jsc.sc()
    rows = [(i, f"https://big.example.com/p{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    before = jsc.getPersistentRDDs().size()
    out, persisted = cap_per_domain(df, max_docs=3, return_persisted=True)
    wrapped = out.filter(F.col("doc_id") >= 0)  # attribute is gone here
    assert not hasattr(wrapped, "_persisted_frames")
    assert sorted(r.doc_id for r in wrapped.collect()) == [0, 1, 2]
    # r17: the over-cap aggregate AND the materialized (id, domain)
    # proxy (a localCheckpoint whose RDD DataFrame.unpersist cannot
    # release — the handle can; its unpersist kills the proxy frame,
    # which is fine exactly here: every output has materialized)
    assert len(persisted) == 2
    for f in persisted:
        f.unpersist(blocking=True)
    assert jsc.getPersistentRDDs().size() == before
    # the lineage-backed opt-out keeps the old single-frame contract
    out2, persisted2 = cap_per_domain(
        df, max_docs=3, return_persisted=True, materialize_ids=False
    )
    assert sorted(r.doc_id for r in out2.collect()) == [0, 1, 2]
    assert len(persisted2) == 1
    for f in persisted2:
        f.unpersist(blocking=True)
    assert jsc.getPersistentRDDs().size() == before


def test_cap_per_domain_over_cap_rows_hint_skips_probe(spark):
    """over_cap_rows_hint (round 14): the caller-asserted bound skips
    the plan-time count() probe (measured: ~2.7 s of the url_curation
    driver row) while producing the identical row set, and the bound
    still drives BOTH hint gates — an over-budget assertion turns the
    hints off exactly like an over-budget measurement."""
    rows = [(i, f"https://big.example.com/p{i}") for i in range(10)]
    rows += [(100, "https://small.org/x"), (101, "https://small.org/y")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    measured = sorted(
        r.doc_id for r in cap_per_domain(df, max_docs=3).collect()
    )
    hinted = sorted(
        r.doc_id
        for r in cap_per_domain(
            df, max_docs=3, over_cap_rows_hint=4
        ).collect()
    )
    assert hinted == measured == [0, 1, 2, 100, 101]
    # an over-budget bound degrades to the unhinted (AQE) path but
    # filters exactly the same rows
    unhinted = sorted(
        r.doc_id
        for r in cap_per_domain(
            df,
            max_docs=3,
            over_cap_rows_hint=10_000_000,
            broadcast_max_rows=100,
        ).collect()
    )
    assert unhinted == measured
