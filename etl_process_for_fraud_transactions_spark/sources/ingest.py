"""File ingestion: semicolon CSV with comma decimals, xlsx shim.

Reference behaviors covered (SURVEY.md §2.1 S3-S5):
- transactions_{date}.txt : CSV `sep=';'`, `decimal=','` (main.py:103)
- terminals_{date}.xlsx / passport_blacklist_{date}.xlsx (main.py:98,111)

The CSV path is fully distributed (`spark.read.csv`); Spark's CSV
reader has no comma-decimal option, so amounts are read as string and
parsed with functions.comma_decimal — still JVM-side codegen.

The xlsx path is a driver-side pandas shim (openpyxl is not available
in every runtime, and xlsx is not a distributed format anyway — the
reference reads it with pandas too). Gated behind an import-try.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.core import comma_decimal


def read_semicolon_csv(
    spark: SparkSession,
    path: str,
    decimal_cols: Sequence[str] = (),
    renames: dict[str, str] | None = None,
    select: Sequence[str] | None = None,
    quarantine: bool = False,
) -> DataFrame:
    """Distributed read of the reference's `;`-separated, `,`-decimal
    CSV (main.py:103-107). `decimal_cols` are parsed via comma_decimal;
    `renames` applies the staging-contract projection
    (e.g. transaction_id -> trans_id).

    `quarantine=True` adds a `_corrupt_record` column capturing rows
    that fail to parse instead of silently null-filling them (Spark's
    default PERMISSIVE mode) — audit-friendly at scale, where a bad
    upstream export should be quantified, not swallowed. Spark refuses
    scans whose pruned column set is ONLY the corrupt column (e.g. a
    bare corrupt-row count), so the quarantined frame is returned
    cached, per Spark's documented workaround; staging batches are
    bounded, and the consumer may unpersist after auditing."""
    reader = (
        spark.read.option("header", "true")
        .option("sep", ";")
        .option("inferSchema", "false")
    )
    if quarantine:
        # the corrupt-record column only materializes when it is part
        # of an EXPLICIT schema — the option alone is silently ignored
        # under a header-derived schema. Probe the header (cheap: reads
        # one file's first line) and declare string columns + the
        # quarantine column.
        from pyspark.sql import types as T

        header_cols = spark.read.option("header", "true").option("sep", ";").csv(path).columns
        schema = T.StructType(
            [T.StructField(c, T.StringType()) for c in header_cols]
            + [T.StructField("_corrupt_record", T.StringType())]
        )
        reader = (
            reader.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
        )
    df = reader.csv(path)
    if quarantine:
        df = df.cache()
    if select:
        keep = list(select) + (
            ["_corrupt_record"] if quarantine and "_corrupt_record" in df.columns else []
        )
        df = df.select(*keep)
    for c in decimal_cols:
        df = df.withColumn(c, comma_decimal(c))
    if renames:
        df = df.withColumnsRenamed(renames)
    return df


def read_excel_sheet(
    spark: SparkSession,
    path: str,
    sheet_name: str,
    select: Sequence[str] | None = None,
    renames: dict[str, str] | None = None,
) -> DataFrame:
    """xlsx ingest shim (reference main.py:98,111): pandas.read_excel on
    the driver, then Arrow-backed createDataFrame. Raises a clear error
    when no xlsx engine is installed (tests use CSV fixtures instead,
    per SURVEY.md §7.3)."""
    try:
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet_name, header=0, index_col=None)
    except ImportError as exc:  # openpyxl/xlrd missing
        raise NotImplementedError(
            "xlsx ingestion requires pandas with an Excel engine "
            "(openpyxl); install it or provide CSV inputs"
        ) from exc
    if select:
        pdf = pdf[list(select)]
    df = spark.createDataFrame(pdf)
    if renames:
        df = df.withColumnsRenamed(renames)
    return df
