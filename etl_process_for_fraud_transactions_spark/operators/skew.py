"""Skew-mitigation utilities: salted aggregation and salted joins.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew, but two patterns still need explicit salting at 100 TB:

- single-key hot aggregation: one key holding 1% of a 100 TB fact
  lands 1 TB on one reducer. Two-phase salted aggregation splits the
  key across `salt` partial groups, then merges — works for any
  algebraic aggregate (sum/count/min/max) expressed as (partial, merge)
  pairs.
- broadcast-impossible skewed join: when the hot side's key histogram
  is known (or sampled), replicate the small side `salt` times and
  scatter the big side — the classic salted join. AQE cannot do this
  for aggregations or for non-shuffle-join plans.

Both are pure DataFrame rewrites (no RDDs), and both keep map-side
partial aggregation intact.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    salt: int = 16,
) -> DataFrame:
    """groupBy(key).agg(sum(value), count(*)) with two-phase salting:
    phase 1 groups on (key, random-ish salt) so a hot key spreads over
    `salt` reducers; phase 2 merges the partials per key. The salt is
    derived from a hash of monotonically varying columns rather than
    rand() so re-runs are deterministic."""
    keys = list(key_cols)
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("__s"),
        F.count(F.lit(1)).alias("__n"),
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.sum("__s").cast("double").alias(f"sum_{value_col}"),
            F.sum("__n").alias("n_rows"),
        )
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `big` has skewed keys and `small` is too large
    to broadcast: scatter `big` over `salt` sub-keys, replicate
    `small` across all of them, join on (key, sub-key). Output columns
    match big.join(small, on, how)."""
    keys = list(on)
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    small_r = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_s.join(small_r, [*keys, "__salt"], how)
    return out.drop("__salt")
