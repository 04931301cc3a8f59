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

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.core import epoch_us

#: internal column names added by the rewrite; inputs must not use them
_RESERVED = ("__bucket", "__salt", "__salt_n")

#: auto-salt targets: scatter a (key, bucket) group until its pair work
#: per sub-partition drops under the budget; cap the replication factor
AUTO_SALT_PAIR_BUDGET = 4_000_000
AUTO_SALT_MAX = 64


def _check_reserved(df: DataFrame) -> None:
    clash = [c for c in df.columns if c in _RESERVED]
    if clash:
        raise ValueError(
            f"input columns {clash} collide with the rewrite's internal "
            f"names {_RESERVED}; rename them before the self-join"
        )


def _tag_buckets(df: DataFrame, ts_col: str, width_us: int, offsets: Sequence[int]) -> DataFrame:
    b = F.floor(epoch_us(ts_col) / F.lit(width_us))
    return df.withColumn(
        "__bucket", F.explode(F.array(*[b + F.lit(o) for o in offsets]))
    )


def _resolve_salt(
    left_bucketed: DataFrame,
    key_cols: Sequence[str],
    salt: int | str | None,
    pair_budget: int = AUTO_SALT_PAIR_BUDGET,
) -> int | None:
    """Eager diagnostic twin of `_auto_salt_factor`: measure the max
    (key, bucket) density d with a driver-side action and return the
    derived scatter factor as an int. Useful for inspecting what
    salt='auto' will decide; the join wrappers themselves do NOT call
    this — they fold the same derivation into the plan via
    `_auto_salt_factor`, so plan construction never runs a job."""
    if salt != "auto":
        return salt  # type: ignore[return-value]
    d_row = (
        left_bucketed.groupBy(*key_cols, "__bucket")
        .agg(F.count(F.lit(1)).alias("__d"))
        .agg(F.max("__d"))
        .first()
    )
    d = d_row[0] or 0
    return min(AUTO_SALT_MAX, max(1, math.ceil(d * d / max(pair_budget, 1))))


def _auto_salt_factor(
    left_bucketed: DataFrame,
    key_cols: Sequence[str],
    pair_budget: int = AUTO_SALT_PAIR_BUDGET,
) -> DataFrame:
    """salt='auto', the lazy form: a one-row frame holding the scatter
    factor s = min(cap, max(1, ceil(d^2 / budget))) for d = the maximum
    observed (key, bucket) density — pair work per group is ~d^2, and
    salting by s splits it to ~d^2/s per reducer. The density
    aggregation ships only (key, bucket, count), never rows, and joins
    into the consumer plan as a broadcast, so it executes INSIDE the
    job at action time — building the join never triggers a Spark job
    (pinned by tests/test_skew.py::test_auto_salt_is_lazy). Both sides
    broadcast the same subtree, so ReuseExchange computes it once."""
    d2 = F.col("__d").cast("double") * F.col("__d")  # double: d^2 can pass long range
    return (
        left_bucketed.groupBy(*key_cols, "__bucket")
        .agg(F.count(F.lit(1)).alias("__d"))
        .agg(F.coalesce(F.max("__d"), F.lit(0)).alias("__d"))
        .select(
            F.least(
                F.lit(AUTO_SALT_MAX),
                F.greatest(
                    F.lit(1), F.ceil(d2 / F.lit(max(pair_budget, 1)))
                ),
            )
            .cast("int")
            .alias("__salt_n")
        )
    )


def _salt_sides(
    left: DataFrame,
    right: DataFrame,
    salt: int | str | None,
    factor_df: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, bool]:
    """Deterministic self-join salting: the left side scatters into
    `salt` sub-groups (hash of the full row, so re-runs agree), the
    right side replicates across all of them — every (l, r) pair meets
    exactly once, but a hot (key, bucket) group's pair work now spreads
    over `salt` reducer partitions instead of one straggler.

    salt='auto' (with `factor_df` from `_auto_salt_factor`) reads the
    factor from a broadcast one-row frame instead of a literal, so the
    density measurement runs inside the job, not at plan-build time; a
    runtime factor of 1 degenerates to pmod(...,1)=0 / replicate-once —
    identical pairs, one no-op column of overhead.

    Cost: the right side's shuffle volume multiplies by the factor, so
    this is for known-pathological densities (one card with 10^4+
    events per window); the default path leaves skew to AQE's skew-join
    splitting. Returns (left, right, salted?)."""
    if salt == "auto":
        assert factor_df is not None
        lcols = [F.col(c) for c in left.columns]
        l2 = (
            left.crossJoin(F.broadcast(factor_df))
            .withColumn("__salt", F.pmod(F.xxhash64(*lcols), F.col("__salt_n")))
            .drop("__salt_n")
        )
        r2 = (
            right.crossJoin(F.broadcast(factor_df))
            .withColumn(
                "__salt", F.explode(F.sequence(F.lit(0), F.col("__salt_n") - 1))
            )
            .drop("__salt_n")
        )
        return l2, r2, True
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
    salt: int | str | None = None,
    auto_salt_pair_budget: int = AUTO_SALT_PAIR_BUDGET,
) -> DataFrame:
    """All pairs (r1, r2) sharing `key_cols` with
    r2.ts in [r1.ts, r1.ts + window] (closed interval, matching SQL
    BETWEEN at main.py:456). Result columns are the originals of both
    sides, accessible via the aliases. `salt` (opt-in) additionally
    scatters each (key, bucket) group over that many sub-partitions;
    salt='auto' derives the factor from the max per-(key,bucket)
    density measured INSIDE the job (a broadcast one-row aggregate —
    plan construction stays lazy); see _salt_sides for when explicit
    salting beats AQE."""
    _check_reserved(df)
    if join_hint:
        df = df.hint(join_hint)
    left = df.withColumn(
        "__bucket", F.floor(epoch_us(ts_col) / F.lit(window_us))
    )
    # r2 can be in r1's bucket or the next one; tag r2 with (b2-1, b2)
    # so the equi-join on r1.bucket covers both without duplicates.
    right = _tag_buckets(df, ts_col, window_us, (-1, 0))
    factor_df = (
        _auto_salt_factor(left, key_cols, auto_salt_pair_budget)
        if salt == "auto"
        else None
    )
    left, right, salted = _salt_sides(left, right, salt, factor_df)
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


def bucketed_interval_join(
    left_df: DataFrame,
    right_df: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    window_us: int,
    left_alias: str = "r1",
    right_alias: str = "r2",
    join_hint: str | None = None,
) -> DataFrame:
    """All pairs (l, r) sharing `key_cols` with
    r.ts in [l.ts, l.ts + window] (closed) across TWO frames — the
    asymmetric twin of `bucketed_interval_self_join`, for anchoring a
    SPARSE frame (e.g. rule-5 candidate windows) to the dense base:
    the join work is |anchors| x per-window density, never the
    all-pairs square. Same bucketing: the left row's bucket must
    equal the right row's (b) or precede it by one, handled by
    tagging the right side with (b-1, b). join_hint=None leaves the
    strategy to Catalyst/AQE — a runtime-small anchor side broadcasts
    on its own; no forced hint (the broadcast-audit contract)."""
    _check_reserved(left_df)
    _check_reserved(right_df)
    if join_hint:
        left_df = left_df.hint(join_hint)
    left = left_df.withColumn(
        "__bucket", F.floor(epoch_us(left_ts) / F.lit(window_us))
    )
    right = _tag_buckets(right_df, right_ts, window_us, (-1, 0))
    left, right = left.alias(left_alias), right.alias(right_alias)
    cond = (
        F.col(f"{left_alias}.__bucket") == F.col(f"{right_alias}.__bucket")
    )
    for k in key_cols:
        cond = cond & (F.col(f"{left_alias}.{k}") == F.col(f"{right_alias}.{k}"))
    r1ts = F.col(f"{left_alias}.{left_ts}")
    r2ts = F.col(f"{right_alias}.{right_ts}")
    residual = (r2ts >= r1ts) & (
        epoch_us(r2ts) <= epoch_us(r1ts) + F.lit(window_us)
    )
    return left.join(right, cond & residual, "inner").drop("__bucket")


def bucketed_abs_window_self_join(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    window_us: int,
    residual: Column | None = None,
    left_alias: str = "a",
    right_alias: str = "b",
    join_hint: str | None = DEFAULT_JOIN_HINT,
    salt: int | str | None = None,
    auto_salt_pair_budget: int = AUTO_SALT_PAIR_BUDGET,
) -> DataFrame:
    """All pairs (a, b) sharing `key_cols` with |a.ts - b.ts| <= window
    (closed, matching `abs(extract(epoch ...)) <= 60*60` at main.py:435),
    optionally with extra theta residuals (e.g. different city).
    `salt` scatters hot (key, bucket) groups ('auto' derives the factor
    from the density measured inside the job, never at plan-build
    time) — see _salt_sides / _auto_salt_factor."""
    _check_reserved(df)
    if join_hint:
        df = df.hint(join_hint)
    left = df.withColumn(
        "__bucket", F.floor(epoch_us(ts_col) / F.lit(window_us))
    )
    right = _tag_buckets(df, ts_col, window_us, (-1, 0, 1))
    factor_df = (
        _auto_salt_factor(left, key_cols, auto_salt_pair_budget)
        if salt == "auto"
        else None
    )
    left, right, salted = _salt_sides(left, right, salt, factor_df)
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
