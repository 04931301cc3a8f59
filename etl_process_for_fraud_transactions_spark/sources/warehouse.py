"""Parquet warehouse: append facts, atomically snapshot-overwrite dims.

Parquet is immutable, so the reference's SCD2 close-out UPDATE
(main.py:142-160) becomes read -> rewrite -> atomic swap. The hazard is
reading and overwriting the same path within one lazy plan (SURVEY.md
§4.3.2): `atomic_overwrite` materializes to a temp dir first, then
swaps directories on the driver, so the input is fully consumed before
the target is touched and a crash mid-write never corrupts the table.

At cluster scale the same pattern holds on an object store (write to a
new prefix, flip a pointer/manifest); Delta/Iceberg MERGE is the
managed-table equivalent, deliberately not required here to keep the
engine dependency-free.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def atomic_overwrite(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Write `df` to `path` via temp-dir + atomic swap. Safe when `df`
    was itself read from `path` (the temp write materializes it)."""
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)
    # drop Spark's cached file listing for the swapped path, or the next
    # read resolves the pre-swap part files and fails
    df.sparkSession.catalog.refreshByPath(path)


class Warehouse:
    """Minimal warehouse over a directory of parquet tables.

    - dims: snapshot-overwritten (SCD2 rewrite, operators.scd2)
    - facts: append-only (reference main.py:382-410), partitioned by the
      batch date so a re-run of one date is an idempotent overwrite of
      that partition rather than a duplicate append.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.exists(p) and any(
            f.endswith(".parquet") or f.startswith("part-") or f == "_SUCCESS"
            for root_, _, files in os.walk(p)
            for f in files
        )

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def overwrite(self, table: str, df: DataFrame) -> None:
        atomic_overwrite(df, self.path(table))

    def append(self, table: str, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.path(table))

    def append_partitioned(
        self, table: str, df: DataFrame, partition_col: str | list[str]
    ) -> None:
        """Idempotent per-batch append: dynamic partition overwrite of
        just the partitions present in `df`. Accepts one column or a
        list (e.g. [cell, batch] for an index that is both
        cell-pruned and epoch-replayable); the column set must match
        the table's existing partition layout."""
        cols = [partition_col] if isinstance(partition_col, str) else list(partition_col)
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*cols)
            .parquet(self.path(table))
        )

    def write_bucketed(
        self,
        table: str,
        df: DataFrame,
        bucket_cols: list[str],
        n_buckets: int,
        sort_cols: list[str] | None = None,
    ) -> None:
        """Persist as a bucketed catalog table (`bucketBy` +
        saveAsTable): two tables bucketed on the same key with the same
        bucket count join WITHOUT a shuffle — the co-located-join
        strategy for repeatedly-joined 100 TB facts. Parquet files land
        under spark.sql.warehouse.dir; metadata in the session catalog."""
        writer = df.write.mode("overwrite").format("parquet").bucketBy(
            n_buckets, *bucket_cols
        )
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        writer.saveAsTable(table)

    def read_bucketed(self, table: str) -> DataFrame:
        return self.spark.table(table)

    def write_clustered(
        self,
        table: str,
        df: DataFrame,
        cluster_cols: list[str],
        n_files: int | None = None,
    ) -> None:
        """Range-clustered layout: repartitionByRange + in-partition
        sort on the cluster columns before writing. Each parquet file
        then covers a disjoint range of the cluster key, so its
        row-group min/max statistics prune point and range predicates
        at planning time — the poor-man's Z-order, and the right
        layout for columns that dominate WHERE clauses (event time,
        tenant id). Cost: one range shuffle at write time, paid once,
        amortized over every subsequent pruned scan."""
        parts = [F.col(c) for c in cluster_cols]
        out = (
            df.repartitionByRange(*(([n_files] if n_files else []) + parts))
            .sortWithinPartitions(*cluster_cols)
        )
        atomic_overwrite(out, self.path(table))

    def compact(self, table: str, target_partitions: int) -> None:
        """Small-files maintenance: rewrite a table at a bounded file
        count (per-batch appends accumulate small files; scan cost at
        scale is dominated by file-open overhead once files < ~32 MB)."""
        df = self.read(table).repartition(target_partitions)
        atomic_overwrite(df, self.path(table))
