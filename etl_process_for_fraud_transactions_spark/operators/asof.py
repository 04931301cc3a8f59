"""As-of (nearest-match) join: each left row picks the most recent
right row with right.ts <= left.ts on the same key.

Spark has no native ASOF JOIN. The naive formulations are
range-join + row_number (quadratic per key) or per-key mapInPandas
(Python in the hot path). This implementation is the merge-style
union rewrite:

    union(right-tagged, left-tagged)
      -> window over (key) ordered by (ts, side, tiebreak)
      -> last(right payload, ignorenulls=True) rowsBetween(-inf, 0)
      -> keep left rows

One shuffle on the key, one sort — O(n log n) per partition and no
pair explosion, so a key with millions of rows costs the same as a
sort. Ties (right.ts == left.ts) match, like SQL ASOF JOIN's `>=`.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Left as-of join. Output = all left columns + `payload_cols`
    (null when no right row precedes). `right` must be unique per
    (key, ts) — pre-aggregate otherwise; `tiebreak_col` (a left
    column) makes the window ordering total when left rows can share a
    timestamp."""
    keys = list(key_cols)
    payload = list(payload_cols)
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"payload columns collide with left columns: {sorted(clash)}")

    l_cols = [c for c in left.columns]
    r_tagged = right.select(
        *keys,
        F.col(ts_col).alias(ts_col),
        *[F.col(c) for c in payload],
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"__l_{c}") for c in l_cols],
    )
    l_tagged = left.select(
        *keys,
        F.col(ts_col).alias(ts_col),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in payload],
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in l_cols],
    )
    order = [F.asc(ts_col), F.asc("__side")]
    if tiebreak_col:
        order.append(F.asc(f"__l_{tiebreak_col}"))
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r_tagged.unionByName(l_tagged).select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in payload
        ],
    )
    return filled.filter(F.col("__side") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in l_cols],
        *[F.col(f"__f_{c}").alias(c) for c in payload],
    )
