"""Deterministic dataset splitting and sampling for training pipelines.

randomSplit() re-rolls on every recomputation and cluster layout;
training corpora need splits that are a pure function of the row, so
the same document lands in the same split across runs, engines and
re-shards. The split here keys on md5 of the id — portable (identical
in DuckDB/Postgres/Spark), stable under repartition, and joins-free.

At 100 TB: a narrow projection, no shuffle, no state; the split label
can be a partition column on write so each split is its own prune-able
prefix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def hash_bucket(id_col: Column | str, buckets: int = 16) -> Column:
    """Stable bucket in [0, buckets) from the md5 hex of the id
    rendered as a string.

    Divisors of 16 (2/4/8/16) take the single-hex-char fast path —
    unchanged from day one, so existing splits are stable. Any other
    bucket count folds the first 15 hex chars (60 bits) through
    conv(hex, 16, 10) modulo buckets; the DuckDB/Postgres twin is
    ('0x' || substr(md5(id), 1, 15))::ubigint % buckets."""
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(c.cast("string"))
    if buckets <= 16 and 16 % buckets == 0:
        nibble = F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1
        return (nibble / (16 // buckets)).cast("int")
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % buckets).cast("int")


def train_val_split(
    df: DataFrame, id_col: str = "doc_id", val_buckets: int = 2
) -> DataFrame:
    """Adds a `split` column: 'val' for `val_buckets` of 16 hash
    buckets (default 2/16 = 12.5%), 'train' otherwise."""
    bucket = hash_bucket(id_col, 16)
    return df.withColumn(
        "split",
        F.when(bucket >= 16 - val_buckets, F.lit("val")).otherwise(F.lit("train")),
    )


def hash_fraction(id_col: Column | str, seed: str = "0") -> Column:
    """Stable uniform-ish fraction in [0, 1) from md5(seed || ':' ||
    id): the first 15 hex chars (60 bits) divided by 2^60. Portable —
    the DuckDB/Postgres twin is
    ('0x' || substr(md5(seed || ':' || id), 1, 15))::ubigint
    / 1152921504606846976.0 — and a pure function of (seed, id), so
    the same row is sampled identically across runs, engines, and
    repartitions (randomSplit/sample re-roll on recomputation)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(F.lit(f"{seed}:"), c.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("double") / F.lit(
        float(1 << 60)
    )


def deterministic_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", seed: str = "0"
) -> DataFrame:
    """Keep ~`fraction` of rows, chosen by row identity instead of
    randomness: filter hash_fraction(id, seed) < fraction. Narrow
    (no shuffle, no state); different seeds give independent samples
    of the same table; nested samples compose (fraction 0.5 then 0.2
    of the SAME seed is the 0.2 sample, since {h < 0.2} ⊂ {h < 0.5})."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(hash_fraction(id_col, seed) < F.lit(fraction))


def sample_to_mixture(
    df: DataFrame,
    shares: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "0",
    weight_col: str | None = None,
) -> DataFrame:
    """Downsample so the output follows a target source mixture — the
    data-mixing step of training-corpus assembly ("60% web, 30% books,
    10% code"). Sources absent from `shares` are dropped.

    weight_col (e.g. 'n_tokens') switches the mixture target from DOC
    COUNTS to the WEIGHT TOTALS — what trainers actually budget: a
    source of long books and a source of short posts with equal doc
    counts are nowhere near a 50/50 token mix. Availability per
    source becomes SUM(weight); sampling stays row-level and
    deterministic (hash_fraction), so the realized weighted share is
    the expectation fraction * weight_s, concentrated by the usual
    bounded-increment argument when no single document dominates its
    source's weight.

    The output is the LARGEST mixture-correct subset: the binding
    source (smallest availability/share ratio) is kept whole and every
    other source is deterministically downsampled to match — no source
    is ever upsampled (duplication is the dedup ladder's enemy).
    Source counts come from one aggregate (rows = #sources, driver
    cost bounded by the dict); membership is then a pure function of
    (seed, id) via hash_fraction, so the mixture is reproducible
    across runs and re-shards. Expected output size:
    total_kept ≈ min_s(count_s / share_s).

    Shares are normalized, so {web: 6, books: 3, code: 1} works."""
    if not shares:
        raise ValueError("shares must be non-empty")
    if any(s <= 0 for s in shares.values()):
        raise ValueError("shares must be positive")
    total_share = float(sum(shares.values()))
    norm = {k: v / total_share for k, v in shares.items()}
    avail = (
        F.sum(F.col(weight_col)).alias("n")
        if weight_col
        else F.count(F.lit(1)).alias("n")
    )
    # `or 0`: a source whose every weight is NULL sums to None — fold
    # it into the unsatisfiable-mixture error below instead of letting
    # the binding-source arithmetic raise a raw TypeError
    counts = {
        r[0]: r[1] or 0
        for r in df.filter(F.col(source_col).isin(list(shares)))
        .groupBy(source_col)
        .agg(avail)
        .collect()
    }
    missing = [s for s in shares if counts.get(s, 0) == 0]
    if missing:
        raise ValueError(
            f"sources {missing} have no rows — a mixture containing "
            "them is unsatisfiable without upsampling"
        )
    # The binding source (smallest availability/share ratio) determines
    # the achievable total and is pinned to fraction EXACTLY 1.0: the
    # algebraic roundtrip norm[s]*(counts[s]/norm[s])/counts[s] can land
    # one float ulp below 1.0, and hash_fraction < 1-ulp would then drop
    # a row of the source the docstring guarantees is kept whole.
    # (Sources tied with the binding one get the computed ~1.0 value —
    # only the argmin carries the kept-whole guarantee.)
    binding = min(sorted(shares), key=lambda s: counts[s] / norm[s])
    target_total = counts[binding] / norm[binding]
    fractions = {
        s: 1.0 if s == binding else min(1.0, (norm[s] * target_total) / counts[s])
        for s in shares
    }
    return stratified_sample(
        df.filter(F.col(source_col).isin(list(shares))),
        fractions,
        strata_col=source_col,
        id_col=id_col,
        default_fraction=0.0,
        seed=seed,
    )


def shuffle_deterministic(
    df: DataFrame, id_col: str = "doc_id", seed: str = "0"
) -> DataFrame:
    """Reproducible global shuffle — the training-order primitive: a
    trainer reading the output sequentially sees a pseudo-random
    document order that is a PURE FUNCTION of (seed, id), so the same
    corpus + seed yields the same order across runs, engines, cluster
    layouts and restarts (resuming a crashed epoch mid-corpus stays
    coherent), and a different seed is an independent permutation for
    the next epoch. DataFrame.orderBy(rand()) re-rolls on every
    recomputation; this doesn't.

    Cost: ONE range shuffle (Spark's global sort = range partition +
    in-partition sort), the same envelope as any write-time
    re-clustering; compose with Warehouse-style partitioned writes so
    each output file covers a contiguous slice of the shuffled order.
    The id tie-break makes the order total even under (vanishingly
    rare) 60-bit hash collisions."""
    return df.orderBy(hash_fraction(id_col, seed), F.col(id_col))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    seed: str = "0",
) -> DataFrame:
    """Per-stratum deterministic sampling — the eval-slice /
    class-rebalance primitive (e.g. keep 100% of rare 'error' events,
    1% of 'click'): each stratum keeps rows with
    hash_fraction(id, seed) < fractions[stratum]. Unlike
    DataFrame.sampleBy, membership is a pure function of the row, so
    slices are reproducible across engines and re-shards, and the
    per-stratum thresholds ride in one CASE expression — narrow plan,
    no shuffle, no join, strata never enumerated driver-side beyond
    the fraction dict itself."""
    frac = F.lit(float(default_fraction))
    for value, f in sorted(fractions.items()):
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0, 1]")
        frac = F.when(F.col(strata_col) == value, F.lit(float(f))).otherwise(frac)
    return df.filter(hash_fraction(id_col, seed) < frac)
