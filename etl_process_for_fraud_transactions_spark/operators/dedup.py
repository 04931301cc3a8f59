"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard. Designed for the 100 TB regime:

- exact: hash-groupBy on a normalized fingerprint — one shuffle keyed
  by the fingerprint, no full-text comparisons.
- MinHash+LSH: shingles -> H seeded min-hashes -> band buckets; only
  rows sharing a band bucket are joined, so the candidate set is
  near-linear instead of O(n^2). Signatures and bands are computed with
  higher-order array functions (JVM codegen, no UDFs).
- SimHash: 64-bit majority-vote signature via aggregate/zip_with;
  near-dups = equal band slices + small Hamming distance.
- n-gram Jaccard: exact verification on LSH candidates only.

Citations: the reference repo has no dedup surface (SURVEY.md §7.6);
these follow the standard MinHash/SimHash constructions from the
dedup literature (Broder; Charikar) expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import fingerprint_md5, portable_hash60, tokens


# --- exact -----------------------------------------------------------------

def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of documents with identical normalized text. Returns
    (fingerprint, n_docs, doc_ids sorted). One shuffle on the 128-bit
    fingerprint; text never leaves the map side."""
    return (
        df.select(F.col(id_col), fingerprint_md5(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per identical normalized text (deterministic
    survivor), via min-aggregation — cheaper than dropDuplicates on the
    raw text because only (fingerprint, id) shuffles."""
    keep = (
        df.select(F.col(id_col), fingerprint_md5(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def dedup_survivor_map(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Every document mapped to its dedup survivor: (id, survivor_id =
    min id sharing its fingerprint, group_size). The attribution
    record a training-data pipeline needs — `dedup_exact` alone keeps
    the survivors but silently drops WHICH survivor replaced each
    duplicate, which is what provenance/takedown tooling has to know.

    Shape: aggregate-then-join on the fingerprint rather than a window
    — a boilerplate text duplicated millions of times makes a window
    partition a straggler, while the aggregate keeps bounded state via
    map-side partials and the equi-join back is co-partitioned with
    the aggregation exchange (AQE covers residual skew). Only
    (fingerprint, id) ever shuffles; text stays map-side."""
    fp = df.select(F.col(id_col), fingerprint_md5(text_col).alias("__fp"))
    groups = fp.groupBy("__fp").agg(
        F.min(id_col).alias("survivor_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return fp.join(groups, "__fp").select(id_col, "survivor_id", "group_size")


def dedup_lineage(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(dropped_id, survivor_id) pairs only — the rows `dedup_exact`
    removes, each attributed to the surviving document."""
    m = dedup_survivor_map(df, text_col, id_col)
    return m.filter(F.col(id_col) != F.col("survivor_id")).select(
        F.col(id_col).alias("dropped_id"), "survivor_id"
    )


def dedup_against_corpus(
    new_docs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental-ingestion dedup: rows of `new_docs` whose normalized
    text does not already exist in `corpus`, also deduped within the
    batch (smallest-id survivor). The shape every growing training
    corpus needs daily — and the anti-join ships only 128-bit
    fingerprints, never text, so the shuffle is O(ids), not O(bytes).
    At 100 TB the corpus side is a fingerprint-only scan of a column
    pruned to one md5 per doc; with the corpus stored fingerprint-
    bucketed the anti-join is co-located and shuffle-free."""
    corpus_fp = corpus.select(fingerprint_md5(text_col).alias("fp")).distinct()
    fresh = (
        new_docs.select(F.col(id_col), fingerprint_md5(text_col).alias("fp"))
        .join(corpus_fp, "fp", "left_anti")
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return new_docs.join(fresh, id_col, "left_semi")


# --- shingles & minhash ----------------------------------------------------

def _let(value: Column, body) -> Column:
    """Bind `value` once as a higher-order-function lambda variable and
    evaluate `body` against the BOUND variable. Spark re-evaluates a
    captured expression tree on every lambda invocation (no
    common-subexpression elimination inside HOF lambdas), so e.g.
    slice(tokens(text), i, k) re-tokenizes the document for every i —
    O(shingles x tokenize) per row. transform(array(x), f)[0] is the
    standard let-binding: x evaluates exactly once per row."""
    return F.element_at(F.transform(F.array(value), body), 1)


def shingles(col: Column | str, k: int = 3, unicode: bool = False) -> Column:
    """k-token shingles (space-joined) of the normalized text; documents
    shorter than k tokens contribute their full token string. The token
    array is let-bound so tokenization runs once per document, not once
    per shingle position (measured 2x end-to-end on the documents
    table).

    unicode=True tokenizes with text.tokens_unicode (Latin word runs +
    one token per CJK character) instead of the ASCII default — the
    ASCII normalizer DELETES non-Latin text, so CJK/Cyrillic corpora
    near-dedup to nothing without it; a k-token shingle then spans k
    CJK characters, which is exactly the granularity CJK substring
    overlap needs."""

    def body(toks: Column) -> Column:
        n = F.size(toks)
        return F.when(
            n <= k, F.array(F.concat_ws(" ", toks))
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), n - k + 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            )
        )

    from .text import tokens_unicode

    return _let(tokens_unicode(col) if unicode else tokens(col), body)


def minhash_signature(
    shingle_col: Column, num_hashes: int = 32, portable: bool = False
) -> Column:
    """MinHash signature: for each seed s, min over shingles of
    hash(shingle, s). Distinct shingles not required — min is
    idempotent under duplicates.

    Both modes use double hashing (Kirsch & Mitzenmacher 2006): two
    base hashes per shingle — h1 < 2^60 and h2 < 2^56, so max
    h1 + 31*h2 < 2^62 and the arithmetic never overflows a BIGINT
    (Spark 4's default ANSI mode would raise on wrap) — and seed s's
    hash is h1 + s*h2. That's 2 hash evaluations per shingle instead
    of num_hashes (measured 5.3x end-to-end on the portable path).

    portable=False (default): h1/h2 from xxhash64(x, 0|1), pmod-masked
    into range — the fast engine-internal path.
    portable=True: h1/h2 from ONE md5's hex chars (1-15 / 16-29),
    bit-for-bit reproducible by an external SQL oracle — the
    verification mode (the DuckDB twin replays the same split).

    The shingle array is let-bound (see _let): a caller passing the
    shingles(...) EXPRESSION would otherwise have it re-evaluated once
    per seed — num_hashes full re-shinglings per row."""

    # overflow guard: h1 < 2^60 and h2 < 2^56, so h1 + s*h2 stays under
    # the BIGINT limit only for s < (2^63 - 2^60)/2^56 = 112 — beyond
    # that Spark 4's ANSI mode raises mid-job; fail at build time instead
    if num_hashes > 112:
        raise ValueError(
            "num_hashes must be <= 112 (h1 + s*h2 would overflow BIGINT)"
        )

    # NB: seed binding must be a closure FACTORY, never `lambda x, s=s:`
    # — a second parameter (even defaulted) makes PySpark pass the HOF's
    # two-argument (element, index) form, silently binding the "seed" to
    # the array index column (caught by test_minhash_seeds_are_distinct)
    def _seeded(s: int):
        return lambda h: h["h1"] + F.lit(s) * h["h2"]

    if portable:
        def per_shingle(x: Column) -> Column:
            return _let(
                F.md5(x),
                lambda m: F.struct(
                    F.conv(F.substring(m, 1, 15), 16, 10)
                    .cast("long")
                    .alias("h1"),
                    F.conv(F.substring(m, 16, 14), 16, 10)
                    .cast("long")
                    .alias("h2"),
                ),
            )
    else:
        def per_shingle(x: Column) -> Column:
            return F.struct(
                F.pmod(F.xxhash64(x, F.lit(0)), F.lit(1 << 60)).alias("h1"),
                F.pmod(F.xxhash64(x, F.lit(1)), F.lit(1 << 56)).alias("h2"),
            )

    def body(sh: Column) -> Column:
        return _let(
            F.transform(sh, per_shingle),
            lambda hp: F.array(
                *[
                    F.array_min(F.transform(hp, _seeded(s)))
                    for s in range(num_hashes)
                ]
            ),
        )

    return _let(shingle_col, body)


def minhash_band_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    portable: bool = False,
    unicode: bool = False,
) -> DataFrame:
    """(id, band_id, band_hash) — one row per document per band. Rows
    sharing (band_id, band_hash) are near-dup candidates. The band key
    is always re-hashed to a fixed 8-byte xxhash64 so the shuffle ships
    8 bytes/band instead of width*20 chars — including in portable
    mode: an external oracle replays its own banding and compares only
    the post-verify pairs, and a band-key hash collision can only ADD a
    candidate that the exact-Jaccard verify then filters, so the result
    set is unchanged."""
    rows_per_band = num_hashes // bands
    sig = minhash_signature(
        shingles(text_col, k, unicode=unicode), num_hashes, portable=portable
    )
    with_sig = df.select(F.col(id_col), sig.alias("sig"))

    def _band_key(b):
        joined = F.concat_ws(
            ",",
            F.transform(
                F.slice("sig", b * rows_per_band + 1, rows_per_band),
                lambda v: v.cast("string"),
            ),
        )
        return F.xxhash64(joined)

    band = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(b.alias("band_id"), _band_key(b).alias("band_hash")),
        )
    )
    return with_sig.select(id_col, band.alias("band")).select(
        id_col, "band.band_id", "band.band_hash"
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two shingle arrays (as sets)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter.cast("double") / F.greatest(union, F.lit(1))


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.6,
    portable: bool = False,
    persist_signatures: bool = True,
    unicode: bool = False,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold):
    LSH band-bucket join for candidates, exact n-gram Jaccard verify.
    The self-join is on (band_id, band_hash) — candidates only, never
    all pairs; duplicate candidate pairs from multiple bands are
    dropped before the (expensive) verification.

    persist_signatures: cache the banded-signature frame across the
    self-join (both sides of a self-join otherwise recompute the full
    shingle->signature pipeline — measured ~2x end-to-end). The frame
    is (id, band_id, band_hash), tiny relative to the corpus; the same
    pattern MLlib's MinHashLSH uses. Spark evicts it LRU; pass False
    for one-shot plans embedded in larger cached pipelines."""
    buckets = minhash_band_buckets(
        df, text_col, id_col, k, num_hashes, bands,
        portable=portable, unicode=unicode,
    )
    if persist_signatures:
        buckets = buckets.persist()
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    sh = df.select(
        F.col(id_col), shingles(text_col, k, unicode=unicode).alias("sh")
    )
    return (
        cand.join(sh.withColumnsRenamed({id_col: "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({id_col: "id_b", "sh": "sh_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --- exact set-similarity join (prefix filtering) --------------------------

def ngram_jaccard_pairs_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    group_col: str | None = None,
    unicode: bool = False,
) -> DataFrame:
    """EXACT Jaccard >= threshold pairs (id_a < id_b) via prefix
    filtering (the AllPairs/PPJoin candidate scheme: Bayardo et al.,
    WWW'07) — 100% recall, unlike MinHash banding, whose per-pair
    collision probability at J=t is 1-(1-t^r)^b (~40% at the r=4/b=8
    default for t=0.5).

    Why it is lossless: fix any global order on shingles. If
    J(A,B) >= t then |A∩B| >= ceil(t*|A|) (since |A∪B| >= |A|), so the
    first common shingle in the order sits within the first
    |A| - ceil(t*|A|) + 1 shingles of A — and symmetrically for B.
    Joining only on those prefixes therefore cannot drop a qualifying
    pair, for ANY global order. We order by (corpus frequency asc,
    hash) so prefixes hold each document's RAREST shingles, which is
    what bounds the candidate fan-out.

    Scale shape: one shuffle to build the shingle-frequency dictionary
    (carries the dictionary, not the corpus), one window shuffle on
    doc id to rank prefixes, an equi-join on (group, shingle) whose
    fan-out is per-rare-shingle doc counts, and an id-keyed verify
    join over hashed shingle sets. At 100 TB the exact dictionary can
    be replaced by an approximate one (count-min / sampled counts):
    the ordering only tunes candidate counts, never correctness.

    group_col: restrict pairs to equal values (e.g. same source) —
    pushed into the candidate join, not the verify."""
    grp = [group_col] if group_col else []
    sh = df.select(
        F.col(id_col),
        *[F.col(g) for g in grp],
        F.array_distinct(
            F.transform(
                shingles(text_col, k, unicode=unicode),
                lambda s: F.xxhash64(s),
            )
        ).alias("shd"),
    ).withColumn("n_sh", F.size("shd"))
    ex = sh.select(id_col, *grp, F.explode("shd").alias("s"), "n_sh")
    freq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df_s"))
    w = Window.partitionBy(id_col).orderBy(F.asc("df_s"), F.asc("s"))
    prefix_len = F.col("n_sh") - F.ceil(F.col("n_sh") * F.lit(threshold)) + 1
    pref = (
        ex.join(freq, "s")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= prefix_len)
        .select(id_col, *grp, "s")
    )
    a, b = pref.alias("a"), pref.alias("b")
    join_cond = (F.col("a.s") == F.col("b.s")) & (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    for g in grp:
        join_cond = join_cond & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    cand = (
        a.join(b, join_cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    side = sh.select(F.col(id_col), F.col("shd"), F.col("n_sh"))
    pairs = (
        cand.join(
            side.withColumnsRenamed({id_col: "id_a", "shd": "shd_a", "n_sh": "n_a"}),
            "id_a",
        )
        .join(
            side.withColumnsRenamed({id_col: "id_b", "shd": "shd_b", "n_sh": "n_b"}),
            "id_b",
        )
        # lossless size prefilter: J <= min/max, so J >= t needs sizes
        # within 1/t of each other — skips the array intersect early
        .filter(
            F.least("n_a", "n_b").cast("double") / F.greatest("n_a", "n_b")
            >= F.lit(threshold)
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("shd_a", "shd_b")).alias("n_inter"),
            (F.col("n_a") + F.col("n_b")).alias("n_total"),
        )
    )
    jac = F.col("n_inter").cast("double") / F.greatest(
        F.col("n_total") - F.col("n_inter"), F.lit(1)
    )
    return pairs.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= F.lit(threshold)
    )


# --- simhash ---------------------------------------------------------------

def simhash_signature(
    col: Column | str, bits: int = 64, portable: bool = False,
    unicode: bool = False,
) -> Column:
    """SimHash: per token, a 64-bit hash contributes ±1 to each bit
    position; signature bit = 1 where the sum is positive. Returns an
    array<int> of 0/1 of length `bits` (bit order: LSB first). Pure
    higher-order expressions: aggregate(zip_with(...)) — no UDF.

    The token hash is computed ONCE per token (a transform over the
    token array), then each bit extraction unrolls at plan-build time
    (shiftright requires a literal shift amount) — the expression tree
    grows with `bits` but carries `bits` shift-and-mask ops per token,
    not `bits` hash invocations.

    portable=True swaps xxhash64 for the md5-derived 60-bit hash
    (text.portable_hash60; requires bits <= 60) so an external SQL
    oracle can replay the signature bit-for-bit.

    Bit votes are computed as per-bit popcounts over the let-bound
    token-hash array (`ones*2 > n` ⟺ `sum(±1) > 0`): the naive
    formulation allocates a ±1 array of length `bits` per TOKEN inside
    the fold, which measured ~1.6x slower for identical output."""
    if portable and bits > 60:
        raise ValueError("portable simhash supports at most 60 bits")
    from .text import tokens_unicode

    toks = tokens_unicode(col) if unicode else tokens(col)

    def body(th: Column) -> Column:
        n = F.size(th)

        def vote(b: int) -> Column:
            ones = F.aggregate(
                th,
                F.lit(0),
                lambda acc, h: acc + F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("int"),
            )
            return F.when(ones * 2 > n, 1).otherwise(0)

        return F.array(*[vote(b) for b in range(bits)])

    return _let(
        F.transform(
            toks,
            (lambda t: portable_hash60(t)) if portable else (lambda t: F.xxhash64(t)),
        ),
        body,
    )


def simhash_signature_packed(
    col: Column | str, bits: int = 64, portable: bool = False,
    unicode: bool = False,
) -> Column:
    """SimHash signature packed into ONE long (bit b of the long is
    bit b of the signature; requires bits <= 64). The packed form is
    what the near-dup join wants: band keys are integer shift/mask
    expressions (8-byte shuffle keys instead of 15-char strings) and
    Hamming distance is the codegen'd bit_count(xor) intrinsic instead
    of an interpreted 60-element array fold per candidate pair."""
    if bits > 64:
        raise ValueError("packed simhash supports at most 64 bits")
    if portable and bits > 60:
        raise ValueError("portable simhash supports at most 60 bits")
    from .text import tokens_unicode

    toks = tokens_unicode(col) if unicode else tokens(col)

    def body(th: Column) -> Column:
        n = F.size(th)

        def vote(b: int) -> Column:
            ones = F.aggregate(
                th,
                F.lit(0),
                lambda acc, h: acc + F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("int"),
            )
            return F.when(ones * 2 > n, F.lit(1)).otherwise(F.lit(0)).cast("long")

        packed = F.lit(0).cast("long")
        for b in range(bits):
            packed = packed.bitwiseOR(F.shiftleft(vote(b), b))
        return packed

    return _let(
        F.transform(
            toks,
            (lambda t: portable_hash60(t)) if portable else (lambda t: F.xxhash64(t)),
        ),
        body,
    )


def simhash_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two 0/1 signature arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x - y)),
        F.lit(0),
        lambda acc, v: acc + v,
    )


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
    portable: bool = False,
    persist_signatures: bool = True,
    unicode: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the signature into `bands`
    chunks (a pair within Hamming distance < bands must share at least
    one exact chunk — pigeonhole), join on matching chunks, verify the
    full Hamming distance. persist_signatures: see
    minhash_near_duplicates (same self-join recompute economics).

    Internals run on the PACKED long signature: integer band keys
    (shift/mask) and bit_count(xor) Hamming — the interpreted
    array-fold verify was the dominant cost on homogeneous corpora
    where band collisions are common (measured ~1M candidates from
    5k docs at sf0.1; the packed verify is a codegen intrinsic)."""
    chunk = bits // bands
    mask = (1 << chunk) - 1
    sig_df = df.select(
        F.col(id_col),
        simhash_signature_packed(
            text_col, bits, portable=portable, unicode=unicode
        ).alias("sig"),
    )
    if persist_signatures:
        sig_df = sig_df.persist()
    banded = sig_df.select(
        id_col,
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftrightunsigned(F.col("sig"), b * chunk)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "sig", "band.band_id", "band.band_key")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def near_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.6,
    portable: bool = False,
    max_iter: int = 25,
    cc_algorithm: str = "label",
    auto_band: bool = False,
    unicode: bool = False,
) -> DataFrame:
    """End-to-end near-duplicate clustering: MinHash+LSH candidate
    pairs -> exact-Jaccard verify -> connected components (transitive
    closure: a~b, b~c clusters {a,b,c} even though (a,c) never
    surfaced) -> per-document verdict (doc_id, survivor_id,
    is_survivor), singletons included. Filter on is_survivor for the
    deduplicated corpus; the non-survivor rows are the attribution
    lineage. Composes minhash_near_duplicates with
    operators.graph.dedup_components — see both for the scale
    arguments (banded candidate join; checkpointed label
    propagation).

    auto_band=True derives (num_hashes, bands) from the threshold via
    minhash_band_params instead of the 32/8 default — recall does not
    silently degrade when the caller moves the threshold far from the
    default curve's ~0.55 crossover. Exact-Jaccard verification makes
    precision threshold-exact either way; banding only controls which
    candidate pairs surface."""
    from .graph import dedup_components

    if auto_band:
        num_hashes, bands, _ = minhash_band_params(threshold)
    pairs = minhash_near_duplicates(
        df, text_col, id_col, k, num_hashes, bands, threshold,
        portable=portable, unicode=unicode,
    )
    return dedup_components(
        pairs.select("id_a", "id_b"),
        all_ids=df.select(id_col),
        id_col=id_col,
        max_iter=max_iter,
        algorithm=cc_algorithm,
    )


def minhash_band_params(
    threshold: float,
    max_hashes: int = 112,
    fp_weight: float = 1.0,
    fn_weight: float = 1.0,
) -> tuple[int, int, int]:
    """Choose (num_hashes, bands, rows_per_band) for the banding
    S-curve at a target Jaccard `threshold` — the datasketch-style
    parameter sweep, so callers stop hand-picking 32/8 for thresholds
    the default curve is wrong for.

    A (b bands x r rows) scheme makes a pair with similarity s a
    candidate with p(s) = 1 - (1 - s^r)^b; its crossover sits near
    (1/b)^(1/r). This sweeps every (b, r) with b*r <= max_hashes and
    minimizes the weighted integral of false positives below the
    threshold plus false negatives above it (trapezoid over a fixed
    s-grid — deterministic, no RNG). fp_weight > fn_weight biases
    toward fewer spurious candidates (cheaper verify stage);
    fn_weight > fp_weight toward recall. The 112-hash cap mirrors
    minhash_signature's BIGINT overflow guard.

    Returns (num_hashes, bands, rows_per_band) with
    num_hashes = bands * rows_per_band; feed them straight into
    minhash_near_duplicates / near_dedup."""
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    grid = [i / 200.0 for i in range(1, 200)]
    best = None
    for r in range(1, max_hashes + 1):
        for b in range(1, max_hashes // r + 1):
            err = 0.0
            for s in grid:
                p = 1.0 - (1.0 - s**r) ** b
                if s < threshold:
                    err += fp_weight * p
                else:
                    err += fn_weight * (1.0 - p)
            err /= len(grid)
            # prefer smaller hash budgets on ties: cheaper signatures
            key = (err, b * r)
            if best is None or key < best[0]:
                best = (key, (b * r, b, r))
    return best[1]
