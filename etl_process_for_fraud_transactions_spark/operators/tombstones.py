"""Shared tombstone-filter plumbing for the index families (round 13).

Deletion tombstones are "bounded between compactions" in the normal
takedown regime (tens to thousands of ids), so the serving filter is a
broadcast hash anti-join over the pruned scan — verified to compile to
`BroadcastHashJoin LeftAnti BuildRight` inside whole-stage codegen.
But "bounded" is an assumption, and the repo's broadcast-audit
standard (BASELINE round 9; NearDupIndex.broadcast_max_rows) is that
no unbounded frame is ever FORCED to broadcast: a mass takedown
(every doc of a revoked license, 10^8 ids) must degrade to a plan the
engine can execute, not OOM the driver.

The gate here is a DRIVER-SIDE FILE-SIZE probe, not a count job: the
tombstone table is parquet on disk, its byte size is one os.walk away,
and serving must not pay an extra Spark job per query for a gate that
almost never trips. Under the cap (default 256 MB at rest — roughly
64 MB/executor-core of hash table after decompression, the same order
as Spark's own broadcast comfort zone) the join is hinted broadcast;
over the cap the hint is simply omitted and Catalyst/AQE pick the
strategy from its own statistics (a shuffle anti-join at true mass-
takedown scale). Either plan filters exactly the same rows."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the walk itself lives behind the warehouse FS boundary (r17 pin);
# re-exported here because this module is the probe's historical home
from ..sources.warehouse import table_bytes_path as table_bytes

#: at-rest parquet bytes above which the tombstone id set is no longer
#: hint-forced to broadcast (Catalyst/AQE decide instead)
TOMBSTONE_BROADCAST_MAX_BYTES = 256 << 20


def anti_join_tombstones(
    df: DataFrame,
    wh,
    tomb_table: str,
    id_col: str,
    max_bytes: int = TOMBSTONE_BROADCAST_MAX_BYTES,
    tombs: DataFrame | None = None,
) -> DataFrame:
    """`df` minus rows whose `id_col` is tombstoned — the one serving
    filter every index family applies. No-op (and no plan change at
    all) when the tombstone table does not exist.

    `tombs` (r17, §1.2): a caller that already read the tombstone
    table for its own arithmetic (Bm25Index.topk reads it for the
    stats subtraction) passes the frame in, skipping a second
    spark.read.parquet resolution of the same path (~0.15-0.2 s of
    driver-side listing/inference per serve on the measured box). The
    caller must have exists()-checked; the produced plan is identical
    to the re-read — same source, same projection."""
    if tombs is None:
        if not wh.exists(tomb_table):
            return df
        tombs = wh.read(tomb_table)
    ids = tombs.select(id_col).distinct()
    if table_bytes(wh.path(tomb_table)) <= max_bytes:
        ids = F.broadcast(ids)
    return df.join(ids, id_col, "left_anti")
