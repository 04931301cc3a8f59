"""Partitioned SCD2 maintenance: O(current + changes) per batch
instead of O(full history).

operators.scd2 rewrites the whole history table per batch — simple and
correct, but at 1e9-row dimensions with years of versions the rewrite
cost is dominated by rows that can never change again. This variant
exploits the SCD2 state machine: a CLOSED row (deleted_flg=true,
effective_to != open sentinel) is immutable*, so the table is stored
partitioned by `is_current`:

- closed partition : append-only — each batch appends just the newly
  closed versions;
- current partition: rewritten — bounded by the live key count, not by
  history depth.

(*) The reference's tuple-IN close-out (main.py:144-145) can, in a
pathological case, re-stamp a historical row whose full attribute
tuple coincides with a closing current row. The snapshot operator
reproduces that quirk bit-for-bit; this partitioned variant
deliberately uses key-based close-out (the intended semantics, and
what every SCD2 implementation does) — equivalent whenever attribute
tuples don't repeat across versions of the same key, which the golden
and property tests assert for realistic histories.
"""

from __future__ import annotations

from functools import reduce
from operator import or_
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.core import open_ended_date
from ..sources.warehouse import Warehouse
from .scd2 import scd2_bootstrap


def _changed(attrs: Sequence[str]) -> Column:
    return reduce(or_, [F.col(f"d.{a}") != F.col(f"s.{a}") for a in attrs])


class PartitionedScd2:
    """SCD2 over a warehouse table stored as <table>_current (rewritten
    per batch) and <table>_closed (append-only)."""

    def __init__(self, wh: Warehouse, table: str, key_cols: Sequence[str], attr_cols: Sequence[str]):
        self.wh = wh
        self.table = table
        self.keys = list(key_cols)
        self.attrs = list(attr_cols)

    @property
    def _cur(self) -> str:
        return f"{self.table}_current"

    @property
    def _closed(self) -> str:
        return f"{self.table}_closed"

    def apply_batch(self, stg: DataFrame, batch_date: Column) -> None:
        if not self.wh.exists(self._cur):
            self.wh.overwrite(self._cur, scd2_bootstrap(stg, batch_date))
            return
        cur = self.wh.read(self._cur)
        d, s = cur.alias("d"), stg.alias("s")
        key_match = [F.col(f"d.{k}") == F.col(f"s.{k}") for k in self.keys]

        all_cols = [*self.keys, *self.attrs]
        changed_keys = (
            d.join(s, on=key_match, how="inner")
            .filter(_changed(self.attrs))
            .select(*[F.col(f"d.{k}").alias(k) for k in self.keys])
            .distinct()
        )
        # newly closed versions -> append to the immutable partition
        closing = cur.join(changed_keys, self.keys, "left_semi").select(
            *all_cols,
            F.col("effective_from"),
            batch_date.alias("effective_to"),
            F.lit(True).alias("deleted_flg"),
        )
        self.wh.append(self._closed, closing)

        # surviving current rows + fresh versions -> rewrite current
        untouched = cur.join(changed_keys, self.keys, "left_anti")
        fresh = (
            s.join(d.filter(F.col("d.effective_to") == open_ended_date()), on=key_match, how="left")
            .filter(F.col(f"d.{self.keys[0]}").isNull() | _changed(self.attrs))
            .select(
                *[F.col(f"s.{c}").alias(c) for c in all_cols],
                batch_date.alias("effective_from"),
                open_ended_date().alias("effective_to"),
                F.lit(False).alias("deleted_flg"),
            )
        )
        self.wh.overwrite(self._cur, untouched.unionByName(fresh))

    def history(self) -> DataFrame:
        """Full history view (current ∪ closed) — same schema as the
        snapshot operator's output."""
        cur = self.wh.read(self._cur)
        if self.wh.exists(self._closed):
            return cur.unionByName(self.wh.read(self._closed))
        return cur

    def current(self) -> DataFrame:
        return self.wh.read(self._cur)
