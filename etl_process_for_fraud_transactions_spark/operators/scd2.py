"""SCD2 (slowly-changing-dimension type 2) history maintenance.

Re-expresses the reference's repeated PL/pgSQL block (main.py:121-379;
structure per SURVEY.md §2.4) as a pure DataFrame snapshot rewrite:

1. bootstrap      — dim empty: all staging rows become current
                    (effective_from=batch, effective_to=3000-01-01,
                    deleted_flg=false)            [main.py:125-140]
2. close-out      — rows whose full attribute tuple appears in
                    (current ⋈ staging with any tracked attr changed)
                    get effective_to=batch, deleted_flg=true
                    [main.py:142-160; tuple-IN == left-semi join]
3. insert-new     — staging rows that are new keys OR changed get a
                    fresh current version        [main.py:162-191]

Semantics preserved exactly, including the reference's quirks:
- the change predicate uses null-unsafe `<>` (a NULL attribute never
  counts as changed) — functions.any_attr_differs;
- the close-out matches on the FULL tuple, not just the key, so a
  historical row whose tuple coincides with a closing current row is
  also re-stamped (tuple-IN semantics, main.py:144-145);
- superseded versions get deleted_flg=true ("not current"), which is
  what downstream reads filter on (main.py:423-426).

Scale design: the dim is re-derived as `untouched ∪ closed ∪ fresh` and
snapshot-swapped (sources.warehouse.atomic_overwrite). All three legs
are hash joins on the business key (or the attribute tuple); with dims
orders of magnitude smaller than facts these broadcast, and even at
dimension cardinalities of 1e9 they are single-shuffle equi-joins.
There is no UPDATE-in-place, so the operation parallelizes trivially
and is idempotent per batch date.
"""

from __future__ import annotations

from functools import reduce
from operator import or_
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.core import open_ended_date


def _changed(attrs: Sequence[str]) -> Column:
    """Null-unsafe `<>` OR-chain (main.py:151-157)."""
    return reduce(or_, [F.col(f"d.{a}") != F.col(f"s.{a}") for a in attrs])


def scd2_bootstrap(stg: DataFrame, batch_date: Column) -> DataFrame:
    """Initial load of an empty dimension (main.py:125-140)."""
    return stg.select(
        "*",
        batch_date.alias("effective_from"),
        open_ended_date().alias("effective_to"),
        F.lit(False).alias("deleted_flg"),
    )


def scd2_apply(
    dim: DataFrame | None,
    stg: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    batch_date: Column,
) -> DataFrame:
    """One batch of SCD2 maintenance; returns the full new history.

    `dim` is the existing history (or None/empty for bootstrap); `stg`
    is this batch's staging snapshot. Both must carry exactly
    key_cols + attr_cols (+ SCD2 cols on dim).
    """
    if dim is None or dim.isEmpty():
        return scd2_bootstrap(stg, batch_date)

    all_cols = [*key_cols, *attr_cols]
    key = list(key_cols)
    cur_filter = F.col("d.effective_to") == open_ended_date()

    d = dim.alias("d")
    s = stg.alias("s")

    # Tuples to close: current rows joined to staging on the key where
    # any tracked attribute differs (main.py:144-160). distinct mirrors
    # IN-subquery set semantics.
    close_tuples = (
        d.filter(cur_filter)
        .join(s, on=[F.col(f"d.{k}") == F.col(f"s.{k}") for k in key], how="inner")
        .filter(_changed(attr_cols))
        .select(*[F.col(f"d.{c}").alias(c) for c in all_cols])
        .distinct()
    )

    closing = dim.join(close_tuples, on=all_cols, how="left_semi").select(
        *all_cols,
        F.col("effective_from"),
        batch_date.alias("effective_to"),
        F.lit(True).alias("deleted_flg"),
    )
    untouched = dim.join(close_tuples, on=all_cols, how="left_anti").select(
        *all_cols, "effective_from", "effective_to", "deleted_flg"
    )

    # New versions: staging rows with no current row for the key, or a
    # current row with changed attributes (main.py:162-191).
    cur = d.filter(cur_filter)
    key_match = [F.col(f"s.{k}") == F.col(f"d.{k}") for k in key]
    fresh = (
        s.join(cur, on=key_match, how="left")
        .filter(F.col(f"d.{key[0]}").isNull() | _changed(attr_cols))
        .select(
            *[F.col(f"s.{c}").alias(c) for c in all_cols],
            batch_date.alias("effective_from"),
            open_ended_date().alias("effective_to"),
            F.lit(False).alias("deleted_flg"),
        )
    )

    return untouched.unionByName(closing).unionByName(fresh)


def scd2_current(dim: DataFrame) -> DataFrame:
    """Current (not superseded) rows, as downstream queries read them
    (main.py:423-426)."""
    return dim.filter(F.col("deleted_flg") == F.lit(False))
