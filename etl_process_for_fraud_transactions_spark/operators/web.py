"""URL/domain operators for web-corpus curation — the provenance
rung of a training-data pipeline (FineWeb/RefinedWeb-style): domain
blocklists, URL-identity dedup, per-domain caps. Everything is
`parse_url` + regexp expressions (JVM, whole-stage codegen); the only
shuffles are keyed on short domain/URL-hash strings, never the text.

Registered-domain caveat: the default extraction is the last-two-label
heuristic ('news.example.co.uk' -> 'co.uk' is WRONG for public-suffix
domains). It is deliberate — correct suffix handling needs the Public
Suffix List, a data file, not an algorithm. Production should pass
`suffixes=` with the PSL's multi-label suffixes; the tests pin the
built-in handful (co.uk, com.au, co.jp, ...) so the mechanism is real
and the default honest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: small built-in multi-label public suffixes; production passes the
#: full PSL-derived set via `suffixes=`.
MULTI_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)

#: tracking query parameters stripped by normalize_url
TRACKING_PARAMS = ("utm_source", "utm_medium", "utm_campaign", "utm_term",
                   "utm_content", "gclid", "fbclid", "ref")


def url_host(url: Column | str) -> Column:
    """Lowercased host with any leading 'www.' stripped."""
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_replace(
        F.lower(F.parse_url(c, F.lit("HOST"))), r"^www\.", ""
    )


def registered_domain(
    url: Column | str, suffixes: tuple[str, ...] = MULTI_LABEL_SUFFIXES
) -> Column:
    """eTLD+1: the last two host labels, or three when the last two
    form a known multi-label suffix (see module docstring re the PSL)."""
    h = url_host(url)
    two = F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    three = F.regexp_extract(h, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    is_multi = two.isin(*suffixes)
    # IP hosts have no registered domain concept: pass through whole
    is_ip = h.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    return F.when(is_ip, h).when(is_multi & (three != ""), three).otherwise(two)


def url_features(
    df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Adds host, registered domain, path depth, and query-string
    presence — the planning-time columns URL policies filter on
    (per-domain caps, path-depth heuristics) without touching text."""
    c = F.col(url_col)
    path = F.coalesce(F.parse_url(c, F.lit("PATH")), F.lit(""))
    return (
        df.withColumn("url_host", url_host(c))
        .withColumn("url_domain", registered_domain(c))
        .withColumn(
            "url_path_depth",
            F.size(F.filter(F.split(path, "/"), lambda p: p != "")),
        )
        .withColumn(
            "url_has_query", F.parse_url(c, F.lit("QUERY")).isNotNull()
        )
    )


def normalize_url(url: Column | str) -> Column:
    """Canonical URL identity for exact URL dedup: lowercase scheme
    and host, strip 'www.', drop fragments, drop tracking parameters
    (TRACKING_PARAMS), strip a trailing slash. Two fetches of the same
    logical page under different tracking decorations collapse."""
    c = F.col(url) if isinstance(url, str) else url
    path = F.coalesce(F.parse_url(c, F.lit("PATH")), F.lit(""))
    query = F.coalesce(F.parse_url(c, F.lit("QUERY")), F.lit(""))
    kept_q = F.array_join(
        F.filter(
            F.split(query, "&"),
            lambda kv: (kv != "")
            & ~F.split(kv, "=")[0].isin(*TRACKING_PARAMS),
        ),
        "&",
    )
    base = F.concat(
        url_host(c), F.regexp_replace(path, r"/$", "")
    )
    norm = F.when(kept_q != "", F.concat(base, F.lit("?"), kept_q)).otherwise(base)
    # a scheme-less/malformed URL has no parseable host -> norm is
    # NULL, and a null-keyed dedup would collapse ALL malformed rows
    # into one survivor; fall back to the raw string (identity only
    # with itself) so malformed rows are never merged
    return F.coalesce(norm, F.lower(c))


def dedup_by_url(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row (min id) per normalized URL — the cheapest dedup
    rung, upstream of content fingerprints: refetches and tracking
    variants collapse before any text is hashed. One shuffle keyed on
    the normalized URL string."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("__nurl").orderBy(F.asc(id_col))
    return (
        df.withColumn("__nurl", normalize_url(F.col(url_col)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__nurl", "__rn")
    )


def filter_blocklisted_domains(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Drop rows whose registered domain (or any parent domain: a
    block on 'example.com' also blocks 'a.b.example.com') appears in
    the blocklist. The blocklist broadcasts (domain lists are
    millions of short strings at worst — MBs); the corpus side stays
    map-side with a left_anti join on the extracted domain. For
    blocklists too big to broadcast, build a bloom over the domains
    (operators/bloom.py) and exact-verify the hits — same cascade as
    decontamination."""
    dom = registered_domain(F.col(url_col))
    b = blocklist.select(F.lower(F.col(domain_col)).alias("__blocked")).distinct()
    return (
        df.withColumn("__dom", dom)
        .join(F.broadcast(b), F.col("__dom") == F.col("__blocked"), "left_anti")
        .drop("__dom")
    )


def cap_per_domain(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    max_docs: int = 1000,
) -> DataFrame:
    """Keep at most `max_docs` documents per registered domain
    (deterministic: smallest ids win) — the anti-dominance policy of
    web-corpus assembly: without it a handful of mega-domains
    (user-content farms, mirrors) supply an outsized share of the
    corpus. One shuffle keyed on the short domain string; a hot
    mega-domain partition holds only (id, domain) pairs plus the
    row_number state, and AQE skew-join/partition handling covers the
    rest. Compose with `deterministic_sample` instead when a RANDOM
    per-domain subsample is wanted rather than the min-id prefix."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("__dom").orderBy(F.asc(id_col))
    return (
        df.withColumn("__dom", registered_domain(F.col(url_col)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_docs)
        .drop("__dom", "__rn")
    )
