"""SCD2 golden-sequence tests (SURVEY.md §5.2): 3 consecutive batches
with unchanged / changed / new / re-changed keys, validated against the
reference's PL/pgSQL semantics (main.py:121-379)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_process_for_fraud_transactions_spark.operators.scd2 import (
    scd2_apply,
    scd2_current,
)

OPEN = dt.date(3000, 1, 1)
B1, B2, B3 = dt.date(2024, 1, 1), dt.date(2024, 1, 2), dt.date(2024, 1, 3)


def _stg(spark, rows):
    return spark.createDataFrame(rows, "client_id string, phone string")


def _apply(spark, dim, rows, batch):
    return scd2_apply(dim, _stg(spark, rows), ["client_id"], ["phone"], F.lit(batch))


def _snap(df):
    return sorted(
        (r.client_id, r.phone, r.effective_from, r.effective_to, r.deleted_flg)
        for r in df.collect()
    )


def test_bootstrap(spark):
    hist = _apply(spark, None, [("c1", "111"), ("c2", "222")], B1)
    assert _snap(hist) == [
        ("c1", "111", B1, OPEN, False),
        ("c2", "222", B1, OPEN, False),
    ]


def test_three_batch_replay(spark):
    h1 = _apply(spark, None, [("c1", "111"), ("c2", "222")], B1)
    # batch 2: c1 changed, c2 unchanged, c3 new
    h2 = _apply(spark, h1, [("c1", "111x"), ("c2", "222"), ("c3", "333")], B2)
    assert _snap(h2) == [
        ("c1", "111", B1, B2, True),      # closed out
        ("c1", "111x", B2, OPEN, False),  # new version
        ("c2", "222", B1, OPEN, False),   # untouched
        ("c3", "333", B2, OPEN, False),   # new key
    ]
    # batch 3: c1 re-changed; c2 absent from staging (reference semantics:
    # absence is NOT a delete — row stays current); c3 unchanged
    h3 = _apply(spark, h2, [("c1", "111y"), ("c3", "333")], B3)
    assert _snap(h3) == [
        ("c1", "111", B1, B2, True),
        ("c1", "111x", B2, B3, True),
        ("c1", "111y", B3, OPEN, False),
        ("c2", "222", B1, OPEN, False),
        ("c3", "333", B2, OPEN, False),
    ]
    cur = _snap(scd2_current(h3))
    assert cur == [
        ("c1", "111y", B3, OPEN, False),
        ("c2", "222", B1, OPEN, False),
        ("c3", "333", B2, OPEN, False),
    ]


def test_null_attr_is_not_a_change(spark):
    """Postgres `<>` is null-unsafe: NULL attr on either side never
    fires the close-out (main.py:151-157 parity)."""
    h1 = _apply(spark, None, [("c1", None)], B1)
    h2 = _apply(spark, h1, [("c1", "111")], B2)  # NULL -> value: <> is NULL, no change detected
    assert _snap(h2) == [("c1", None, B1, OPEN, False)]
    h2b = _apply(spark, h1, [("c1", None)], B2)  # NULL -> NULL: also no change
    assert _snap(h2b) == [("c1", None, B1, OPEN, False)]


def test_idempotent_reapply(spark):
    """Re-running the same batch must not create new versions."""
    h1 = _apply(spark, None, [("c1", "111")], B1)
    h1b = _apply(spark, h1, [("c1", "111")], B1)
    assert _snap(h1b) == _snap(h1)
