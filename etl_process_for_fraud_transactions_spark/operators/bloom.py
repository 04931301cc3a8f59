"""Expression-only Bloom filter: build a bitset over a column
distributed, probe it map-side with zero Python UDFs.

Why this exists: the decontamination / blocklist / seen-id prefilter
shape at 100 TB is "is this value in a set of ~10^6..10^8 keys?" asked
once per corpus row (or per corpus SHINGLE — billions of probes). An
exact broadcast hash join needs the whole key set as a hash relation
on every executor (GBs at 10^8 strings); a Bloom filter at 1% fpp is
~1.2 bytes/key — 10^8 keys in ~120 MB, 10^6 in ~1.2 MB — and turns
the exact join into a two-stage cascade: map-side bloom prune (no
shuffle, no false negatives) then an exact join over the rare
survivors (true hits + fpp of the probes), which AQE sizes from
runtime stats. Results are identical to the exact join because the
verify stage removes the false positives.

Spark mechanics (mirrors the LSH hyperplane pattern,
operators/similarity.py::rp_band_buckets): the bitset rides as ONE
array<bigint> value on a broadcast one-row frame — constant plan size
at any filter size, never n-literal expression nodes. Bit positions
use Kirsch-Mitzenmacher double hashing (pos_i = h1 + i*h2 mod m) from
two xxhash64 evaluations per probe, all inside whole-stage codegen.
PySpark exposes DataFrame.stat.bloomFilter but no might_contain
expression, so the probe side here is plain column algebra instead.

Build is distributed: each key maps to its k (word, mask) pairs,
bit_or-aggregated per word — one shuffle keyed on the word index, at
most m/64 rows out; only the NONZERO words are collected and
densified driver-side (bounded by the bitset size, not the key
count)."""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Hard cap on bitset size: 2^31 bits = 256 MB of longs — past this a
#: broadcast stops being the right tool; shard the filter instead.
_MAX_BITS = 1 << 31


def bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """Optimal (m_bits, k_hashes) for `n_items` at false-positive rate
    `fpp`: m = -n ln p / (ln 2)^2, k = (m/n) ln 2. m is rounded up to
    a multiple of 64 (whole words)."""
    if n_items < 1:
        n_items = 1
    if not 0.0 < fpp < 1.0:
        raise ValueError("fpp must be in (0, 1)")
    m = int(-n_items * math.log(fpp) / (math.log(2) ** 2))
    if m > _MAX_BITS:
        # clamping raises the EFFECTIVE fpp above the request — still
        # correct (verify removes false positives) but the prune gets
        # weaker; say so instead of degrading silently
        import warnings

        eff = math.exp(-(_MAX_BITS / n_items) * (math.log(2) ** 2))
        warnings.warn(
            f"bloom filter clamped to {_MAX_BITS} bits for {n_items} "
            f"items: effective fpp ~{eff:.3g} > requested {fpp:.3g}; "
            "shard the filter or raise fpp explicitly",
            stacklevel=3,
        )
    m = min(_MAX_BITS, ((m + 63) // 64) * 64)
    k = max(1, round(m / n_items * math.log(2)))
    return m, min(k, 32)


def _positions(value: Column, m: int, k: int) -> list[tuple[Column, Column]]:
    """k (word_index, bit_mask) pairs for a value. h1/h2 reduced mod m
    BEFORE the Kirsch-Mitzenmacher combination so h1 + i*h2 stays far
    from the BIGINT edge (ANSI mode raises on overflow): both < 2^31,
    i <= 32 -> max < 2^37."""
    h1 = F.pmod(F.xxhash64(value), F.lit(m))
    h2 = F.pmod(F.xxhash64(value, F.lit(1)), F.lit(m))
    out = []
    for i in range(k):
        pos = F.pmod(h1 + F.lit(i) * h2, F.lit(m))
        # the PySpark shiftleft wrapper takes only a literal bit count;
        # the SQL function itself accepts a column — call it directly
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
        )
        out.append(((pos / 64).cast("int"), mask))
    return out


def bloom_build(
    keys: DataFrame,
    key_col: str,
    fpp: float = 0.01,
    n_items: int | None = None,
    bits_col: str = "__bloom_bits",
) -> tuple[DataFrame, int, int]:
    """Build the filter over `keys[key_col]` (distinct not required —
    bit_or is idempotent). Returns (one-row frame carrying the dense
    bitset as array<bigint> `bits_col`, m_bits, k_hashes). Pass the
    result frame to probes via crossJoin(broadcast(...)) and test with
    bloom_might_contain.

    n_items: sizing count; None runs one countDistinct over the keys
    (the honest default — undersizing a bloom silently raises fpp)."""
    if n_items is None:
        n_items = keys.select(
            F.count_distinct(F.col(key_col)).alias("n")
        ).first()[0]
    m, k = bloom_params(n_items, fpp)
    pairs = _positions(F.col(key_col), m, k)
    words = (
        keys.select(
            F.explode(
                F.array(
                    *[
                        F.struct(w.alias("w"), b.alias("b"))
                        for w, b in pairs
                    ]
                )
            ).alias("p")
        )
        .select(F.col("p.w").alias("w"), F.col("p.b").alias("b"))
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
        .collect()
    )
    dense = [0] * (m // 64)
    for r in words:
        dense[r["w"]] = r["word"]
    spark = keys.sparkSession
    bits_df = spark.createDataFrame([(dense,)], f"{bits_col}: array<bigint>")
    return bits_df, m, k


def bloom_might_contain(
    value: Column, bits: Column, m: int, k: int
) -> Column:
    """True iff all k bits for `value` are set — no false negatives;
    false positives at the built fpp, removed downstream by the exact
    verify join. `bits` is the array column from bloom_build's one-row
    frame (crossJoin(broadcast(bits_df)) puts it in scope)."""
    test = None
    for w, b in _positions(value, m, k):
        hit = (F.element_at(bits, w + F.lit(1)).bitwiseAND(b)) != 0
        test = hit if test is None else (test & hit)
    return test
