"""Zero-cost pipeline metrics via Observation.

A daily job at 100 TB cannot afford audit `count()`s — each is a full
second pass over the data. `df.observe` piggybacks accumulator-style
metrics on the write action itself: the rows are counted/summed as
they flow to the sink, so the audit is free and exact, and the numbers
describe the rows actually written (not a re-computation that could
race a concurrent change).

Reference analog: the print-checkpoint counts after each load
(/root/reference/main.py:57,77,100,...) — but exact, structured, and
without a second scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed_counts(
    df: DataFrame, name: str, *extra_metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach an Observation counting rows (plus any caller metrics) to
    `df`. Run an action on the returned frame, then read
    `observation.get` — blocks until the action completes.

    >>> df, obs = observed_counts(staged, "stage_transactions",
    ...                           F.sum("amt").alias("total_amt"))
    >>> df.write.parquet(path)
    >>> obs.get  # {'n_rows': ..., 'total_amt': ...}
    """
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("n_rows"), *extra_metrics), obs
