"""Structured-Streaming analog of the dated-file batch ingest.

The reference's ingestion seam (discover dated files -> load -> archive,
main.py:8-33,117) maps naturally onto a file-source stream (SURVEY.md
§2.10): Spark tracks processed files in the checkpoint, `cleanSource=
archive` replaces the manual shutil.move, and Trigger.AvailableNow
gives the same run-to-completion batch semantics on a cron cadence —
but the identical pipeline keeps running if pointed at a live
directory. The batch date is recovered distributed-side with
regexp_extract over input_file_name() (the S1 operator's streaming
form)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.core import comma_decimal

#: raw columns of transactions_{DDMMYYYY}.txt (FIXTURES.md §A1)
_RAW_SCHEMA = T.StructType(
    [
        T.StructField("transaction_id", T.StringType()),
        T.StructField("transaction_date", T.StringType()),
        T.StructField("card_num", T.StringType()),
        T.StructField("oper_type", T.StringType()),
        T.StructField("amount", T.StringType()),
        T.StructField("oper_result", T.StringType()),
        T.StructField("terminal", T.StringType()),
    ]
)


def stream_transactions(
    spark: SparkSession,
    input_glob: str,
    archive_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming read of dated transaction files into the staging
    contract (trans_id/trans_date/card_num/oper_type/amt/oper_result/
    terminal + batch_date)."""
    reader = (
        spark.readStream.schema(_RAW_SCHEMA)
        .option("header", "true")
        .option("sep", ";")
    )
    if archive_dir:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.csv(input_glob)
    return raw.select(
        F.col("transaction_id").alias("trans_id"),
        F.col("transaction_date").cast("timestamp_ntz").alias("trans_date"),
        "card_num",
        "oper_type",
        comma_decimal("amount").alias("amt"),
        "oper_result",
        "terminal",
        F.to_date(
            F.regexp_extract(F.input_file_name(), r"(\d{8})", 1), "ddMMyyyy"
        ).alias("batch_date"),
    )


def ingest_available_now(
    stream: DataFrame, out_path: str, checkpoint: str
) -> None:
    """Run the stream to completion over currently-available files
    (Trigger.AvailableNow), appending parquet partitioned by batch
    date — the cron-batch execution mode."""
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("batch_date")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
