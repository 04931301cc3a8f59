"""Deterministic dataset splitting and sampling for training pipelines.

randomSplit() re-rolls on every recomputation and cluster layout;
training corpora need splits that are a pure function of the row, so
the same document lands in the same split across runs, engines and
re-shards. The split here keys on md5 of the id — portable (identical
in DuckDB/Postgres/Spark), stable under repartition, and joins-free.

At 100 TB: a narrow projection, no shuffle, no state; the split label
can be a partition column on write so each split is its own prune-able
prefix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def hash_bucket(id_col: Column | str, buckets: int = 16) -> Column:
    """Stable bucket in [0, buckets) from the md5 hex of the id
    rendered as a string.

    Divisors of 16 (2/4/8/16) take the single-hex-char fast path —
    unchanged from day one, so existing splits are stable. Any other
    bucket count folds the first 15 hex chars (60 bits) through
    conv(hex, 16, 10) modulo buckets; the DuckDB/Postgres twin is
    ('0x' || substr(md5(id), 1, 15))::ubigint % buckets."""
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(c.cast("string"))
    if buckets <= 16 and 16 % buckets == 0:
        nibble = F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1
        return (nibble / (16 // buckets)).cast("int")
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % buckets).cast("int")


def train_val_split(
    df: DataFrame, id_col: str = "doc_id", val_buckets: int = 2
) -> DataFrame:
    """Adds a `split` column: 'val' for `val_buckets` of 16 hash
    buckets (default 2/16 = 12.5%), 'train' otherwise."""
    bucket = hash_bucket(id_col, 16)
    return df.withColumn(
        "split",
        F.when(bucket >= 16 - val_buckets, F.lit("val")).otherwise(F.lit("train")),
    )
