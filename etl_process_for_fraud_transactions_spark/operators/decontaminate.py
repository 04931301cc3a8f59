"""Benchmark decontamination: flag training documents that overlap an
evaluation set.

The training-data hygiene step every LLM pipeline runs before a
training job: any document sharing enough k-token shingles with a
benchmark item leaks evaluation data into the training set and must be
dropped (or at least audited). Same shingle machinery as the near-dup
ladder (`operators/dedup.py::shingles` — normalized, let-bound
tokenization), different join shape:

- the BENCHMARK side is small by construction (eval sets are
  thousands of items, not billions), so its exploded shingle set is
  broadcast — the 100 TB corpus side never shuffles for the match;
- corpus shingles explode map-side and hit the broadcast hash join,
  then one aggregation keyed on (doc, benchmark item) counts distinct
  shared shingles — the only shuffle, sized by matched pairs (rare),
  not by the corpus.

Contamination is reported per (doc, benchmark item) with the shared
shingle count and the fraction of that item's shingles covered, so
callers can apply either an absolute (n >= 1 for exact leakage
auditing) or relative (frac >= 0.8 for near-verbatim inclusion)
policy. Cf. the n-gram overlap decontamination procedure described in
the GPT-3 and PaLM papers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles


def _distinct_shingles(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(text_col, k))).alias("__shingle"),
    )


def build_benchmark_bloom(
    benchmark: DataFrame,
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    k: int = 8,
    fpp: float = 0.001,
):
    """Prebuild the benchmark-shingle Bloom triple (bits_df, m_bits,
    k_hashes) for reuse across many `contamination_report(...,
    prefilter='bloom', bloom=...)` calls — one pass over the benchmark
    per suite version instead of per screened corpus. `k` must match
    the report's shingle size or candidates silently vanish."""
    from .bloom import bloom_build

    b = _distinct_shingles(benchmark, bench_id_col, bench_text_col, k)
    return bloom_build(b.select("__shingle"), "__shingle", fpp=fpp)


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    k: int = 8,
    min_shared: int = 1,
    prefilter: str | None = None,
    bloom_fpp: float = 0.001,
    bloom=None,
) -> DataFrame:
    """(doc_id, bench_id, n_shared, bench_frac) for every document
    sharing >= min_shared distinct k-token shingles with a benchmark
    item. bench_frac = n_shared / that item's distinct-shingle count
    (1.0 = the document contains the whole item verbatim, modulo
    normalization). Benchmark shingles broadcast; the corpus never
    shuffles before the match.

    prefilter='bloom': the big-benchmark scale path. The default exact
    broadcast needs the whole benchmark shingle set as a hash relation
    on every executor — fine for thousands of eval items, not for a
    mega-benchmark suite (10^8 shingles ~ GBs). The bloom cascade
    broadcasts a ~1.2-bytes/key bitset instead (operators/bloom.py,
    expression-only probe), prunes corpus shingles MAP-SIDE (no false
    negatives), and exact-verifies only the survivors (true hits +
    fpp of the probes) through a join AQE sizes from runtime stats.
    Results are IDENTICAL to the exact path (pytest-pinned); only the
    memory/shuffle envelope changes.

    bloom: a prebuilt (bits_df, m, k) triple from
    `build_benchmark_bloom` — the bitset build costs one pass over the
    benchmark shingles, so callers screening MANY corpora against one
    benchmark suite should build once and reuse; None builds per
    call."""
    d = _distinct_shingles(docs, id_col, text_col, k)
    b = _distinct_shingles(benchmark, bench_id_col, bench_text_col, k)
    sizes = b.groupBy(bench_id_col).agg(F.count(F.lit(1)).alias("__n_bench"))
    if prefilter == "bloom":
        from .bloom import bloom_build, bloom_might_contain

        bits_df, m, kh = bloom or bloom_build(
            b.select("__shingle"), "__shingle", fpp=bloom_fpp
        )
        d = (
            d.crossJoin(F.broadcast(bits_df))
            .filter(
                bloom_might_contain(F.col("__shingle"), F.col("__bloom_bits"), m, kh)
            )
            .drop("__bloom_bits")
        )
        matched = d.join(b, "__shingle")  # AQE picks the strategy
    elif prefilter is None:
        matched = d.join(F.broadcast(b), "__shingle")
    else:
        raise ValueError(f"prefilter must be None|'bloom', got {prefilter!r}")
    hits = (
        matched.groupBy(id_col, bench_id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return hits.join(F.broadcast(sizes), bench_id_col).select(
        id_col,
        bench_id_col,
        "n_shared",
        (F.col("n_shared") / F.col("__n_bench")).alias("bench_frac"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    k: int = 8,
    min_shared: int = 1,
    min_bench_frac: float = 0.0,
    prefilter: str | None = None,
    bloom_fpp: float = 0.001,
    bloom=None,
) -> DataFrame:
    """`docs` minus every document the contamination report flags
    (n_shared >= min_shared AND bench_frac >= min_bench_frac) — the
    drop-side twin of `contamination_report`, as a left-anti join on
    the flagged id set. prefilter='bloom' for mega-benchmark suites;
    `bloom` is the prebuilt build_benchmark_bloom triple, threaded
    through exactly as contamination_report accepts it (one bitset
    build per benchmark suite, reused across screened corpora)."""
    flagged = (
        contamination_report(
            docs,
            benchmark,
            text_col,
            id_col,
            bench_text_col,
            bench_id_col,
            k,
            min_shared,
            prefilter=prefilter,
            bloom_fpp=bloom_fpp,
            bloom=bloom,
        )
        .filter(F.col("bench_frac") >= min_bench_frac)
        .select(id_col)
        .distinct()
    )
    return docs.join(flagged, id_col, "left_anti")
