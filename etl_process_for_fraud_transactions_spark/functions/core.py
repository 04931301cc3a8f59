"""Scalar expression helpers with PostgreSQL-parity semantics.

Every helper returns a Catalyst Column built from `pyspark.sql.functions`
so expressions stay inside whole-stage codegen (no Python UDFs).

Reference semantics covered (SURVEY.md §2.9):
- F1  to_date(text,'DDMMYYYY')           -> ddmmyyyy_to_date
- F2  '3000-01-01'::DATE sentinel        -> open_ended_date
- F3  extract(epoch from a - b)          -> epoch_us (microsecond longs)
- F6  null-propagating '||' concat       -> null_safe_concat_ws
- S3  comma-decimal CSV amounts          -> comma_decimal
- P4  null-unsafe '<>' attribute diff    -> any_attr_differs
"""

from __future__ import annotations

import datetime as _dt
from functools import reduce
from operator import or_
from typing import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

#: SCD2 open-row sentinel used by the reference (main.py:138).
OPEN_END = _dt.date(3000, 1, 1)


def open_ended_date() -> Column:
    """`'3000-01-01'::DATE` sentinel (reference main.py:138)."""
    return F.lit("3000-01-01").cast("date")


def ddmmyyyy_to_date(value: str) -> Column:
    """`to_date('{date}','DDMMYYYY')` for a driver-side batch-date string
    (reference main.py:137). Java pattern is lowercase dd/MM/yyyy."""
    return F.to_date(F.lit(value), "ddMMyyyy")


def null_safe_concat_ws(sep: str, *cols: Column | str) -> Column:
    """PostgreSQL `a || ' ' || b` parity: NULL if ANY operand is null
    (reference main.py:535). Spark's concat_ws skips nulls, so use
    plain concat with explicit separators, which null-propagates."""
    parts: list[Column] = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit(sep))
        parts.append(F.col(c) if isinstance(c, str) else c)
    return F.concat(*parts)


def comma_decimal(col: Column | str, precision: int = 22, scale: int = 2) -> Column:
    """Parse a comma-decimal-separator string amount (`decimal=','`,
    reference main.py:103) into DecimalType."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, ",", ".").cast(f"decimal({precision},{scale})")


def epoch_us(col: Column | str) -> Column:
    """Epoch microseconds as a long, for exact-integer time arithmetic
    (parity with Postgres `extract(epoch from ...)`, main.py:435, at the
    microsecond granularity both engines store). Works for timestamp and
    timestamp_ntz (session tz is pinned to UTC, session.py)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def ts_bucket(col: Column | str, width_us: int) -> Column:
    """Time bucket index (floor of epoch-us / width) used by the
    bucketed range-join rewrite (SURVEY.md §4.3.1)."""
    return F.floor(epoch_us(col) / F.lit(width_us))


def any_attr_differs(left_prefix: str, right_prefix: str, attrs: Iterable[str]) -> Column:
    """OR-chain of null-unsafe `<>` over tracked attributes, exactly as
    the reference's SCD2 change predicate (main.py:151-157). A NULL on
    either side makes that term NULL (not TRUE) — Postgres parity; do
    NOT use eqNullSafe here."""
    terms = [
        F.col(f"{left_prefix}.{a}") != F.col(f"{right_prefix}.{a}") for a in attrs
    ]
    return reduce(or_, terms)
