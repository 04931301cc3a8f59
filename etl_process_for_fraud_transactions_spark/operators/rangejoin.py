"""Bucketed interval / theta self-joins over event time.

The reference's two expensive self-joins (SURVEY.md §2.3 J5/J6):

- J6 "interval": pairs (r1, r2) with the same key and
  r2.ts ∈ [r1.ts, r1.ts + D]                      (main.py:456)
- J5 "abs-window": pairs with the same key and
  |r1.ts - r2.ts| <= W, plus extra theta residuals (main.py:435)

Naively Catalyst plans `JOIN ON key` + a time residual filter, which is
O(n²) per key — fatal when one key holds millions of rows at 100 TB.
The rewrite adds a conjunctive time-bucket equi-key of width equal to
the window: a row at bucket b can only match rows in buckets
{b-1, b, b+1} (or {b, b+1} for the one-sided interval), so the join
key becomes (key, bucket) — bounded candidate sets, normal shuffle
hash/sort-merge join, and the bucket component also spreads hot keys
across partitions. Each candidate pair is produced exactly once
because the right side is exploded to distinct tag values. The time
predicate is then applied as an exact residual.

This is a query-level rewrite (SURVEY.md §4.3.1) — no custom Catalyst
rule needed, and AQE still handles any remaining skew.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.core import epoch_us


def _tag_buckets(df: DataFrame, ts_col: str, width_us: int, offsets: Sequence[int]) -> DataFrame:
    b = F.floor(epoch_us(ts_col) / F.lit(width_us))
    return df.withColumn(
        "__bucket", F.explode(F.array(*[b + F.lit(o) for o in offsets]))
    )


def _salt_sides(
    left: DataFrame, right: DataFrame, salt: int | None
) -> tuple[DataFrame, DataFrame, Column | None]:
    """Deterministic self-join salting: the left side scatters into
    `salt` sub-groups (hash of the full row, so re-runs agree), the
    right side replicates across all of them — every (l, r) pair meets
    exactly once, but a hot (key, bucket) group's pair work now spreads
    over `salt` reducer partitions instead of one straggler.

    Cost: the right side's shuffle volume multiplies by `salt`, so this
    is an opt-in for known-pathological densities (one card with 10^4+
    events per window); the default path leaves skew to AQE's
    skew-join splitting. Returns (left, right, salted?)."""
    if not salt or salt <= 1:
        return left, right, False
    l2 = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    r2 = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l2, r2, True


#: Default physical strategy for the bucketed self-joins: the bucket
#: equi-key already bounds per-partition build sizes (a partition holds
#: whole (key, bucket) groups whose cardinality is the key's
#: per-window density), so a shuffled hash join skips the sort that
#: sort-merge would pay on both sides. Pass join_hint=None to let
#: Catalyst choose (sort-merge) when window density is unbounded.
DEFAULT_JOIN_HINT = "shuffle_hash"


def bucketed_interval_self_join(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    window_us: int,
    left_alias: str = "r1",
    right_alias: str = "r2",
    join_hint: str | None = DEFAULT_JOIN_HINT,
    salt: int | None = None,
) -> DataFrame:
    """All pairs (r1, r2) sharing `key_cols` with
    r2.ts in [r1.ts, r1.ts + window] (closed interval, matching SQL
    BETWEEN at main.py:456). Result columns are the originals of both
    sides, accessible via the aliases. `salt` (opt-in) additionally
    scatters each (key, bucket) group over that many sub-partitions —
    see _salt_sides for when that beats AQE."""
    if join_hint:
        df = df.hint(join_hint)
    left = df.withColumn(
        "__bucket", F.floor(epoch_us(ts_col) / F.lit(window_us))
    )
    # r2 can be in r1's bucket or the next one; tag r2 with (b2-1, b2)
    # so the equi-join on r1.bucket covers both without duplicates.
    right = _tag_buckets(df, ts_col, window_us, (-1, 0))
    left, right, salted = _salt_sides(left, right, salt)
    left, right = left.alias(left_alias), right.alias(right_alias)
    r1ts = F.col(f"{left_alias}.{ts_col}")
    r2ts = F.col(f"{right_alias}.{ts_col}")
    cond = (
        F.col(f"{left_alias}.__bucket") == F.col(f"{right_alias}.__bucket")
    )
    if salted:
        cond = cond & (
            F.col(f"{left_alias}.__salt") == F.col(f"{right_alias}.__salt")
        )
    for k in key_cols:
        cond = cond & (F.col(f"{left_alias}.{k}") == F.col(f"{right_alias}.{k}"))
    residual = (r2ts >= r1ts) & (
        epoch_us(r2ts) <= epoch_us(r1ts) + F.lit(window_us)
    )
    out = left.join(right, cond & residual, "inner").drop("__bucket")
    return out.drop("__salt") if salted else out


def bucketed_abs_window_self_join(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    window_us: int,
    residual: Column | None = None,
    left_alias: str = "a",
    right_alias: str = "b",
    join_hint: str | None = DEFAULT_JOIN_HINT,
    salt: int | None = None,
) -> DataFrame:
    """All pairs (a, b) sharing `key_cols` with |a.ts - b.ts| <= window
    (closed, matching `abs(extract(epoch ...)) <= 60*60` at main.py:435),
    optionally with extra theta residuals (e.g. different city).
    `salt` scatters hot (key, bucket) groups — see _salt_sides."""
    if join_hint:
        df = df.hint(join_hint)
    left = df.withColumn(
        "__bucket", F.floor(epoch_us(ts_col) / F.lit(window_us))
    )
    right = _tag_buckets(df, ts_col, window_us, (-1, 0, 1))
    left, right, salted = _salt_sides(left, right, salt)
    left, right = left.alias(left_alias), right.alias(right_alias)
    cond = (
        F.col(f"{left_alias}.__bucket") == F.col(f"{right_alias}.__bucket")
    )
    if salted:
        cond = cond & (
            F.col(f"{left_alias}.__salt") == F.col(f"{right_alias}.__salt")
        )
    for k in key_cols:
        cond = cond & (F.col(f"{left_alias}.{k}") == F.col(f"{right_alias}.{k}"))
    time_pred = (
        F.abs(
            epoch_us(F.col(f"{left_alias}.{ts_col}"))
            - epoch_us(F.col(f"{right_alias}.{ts_col}"))
        )
        <= F.lit(window_us)
    )
    if residual is not None:
        time_pred = time_pred & residual
    out = left.join(right, cond & time_pred, "inner").drop("__bucket")
    return out.drop("__salt") if salted else out
