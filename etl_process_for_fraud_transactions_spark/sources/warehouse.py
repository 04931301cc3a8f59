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


#: DDL scalar type -> pyarrow type, for the driver-side metadata I/O
#: fast path below. Only the types the one-row pointer/meta schemas
#: actually use — anything else must take the Spark writer.
_DDL_ARROW_TYPES: dict[str, "object"] = {}


def _ddl_arrow_schema(ddl: str):
    """Parse a Spark DDL string ("name type, ..." or "name: type, ...")
    into a pyarrow schema with EXACTLY the physical types Spark's own
    parquet writer would produce for it, so readers cannot tell the two
    writers apart. Raises KeyError on a type outside the supported
    scalar set — callers then belong on the Spark path."""
    import pyarrow as pa

    if not _DDL_ARROW_TYPES:
        _DDL_ARROW_TYPES.update(
            {
                "int": pa.int32(),
                "integer": pa.int32(),
                "long": pa.int64(),
                "bigint": pa.int64(),
                "short": pa.int16(),
                "smallint": pa.int16(),
                "float": pa.float32(),
                "real": pa.float32(),
                "double": pa.float64(),
                "string": pa.string(),
                "boolean": pa.bool_(),
            }
        )
    fields = []
    depth = 0
    part = ""
    parts = []
    for ch in ddl:  # split on top-level commas only (array<...> nests)
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append(part)
            part = ""
        else:
            part += ch
    parts.append(part)
    for part in parts:
        name, typ = part.replace(":", " ").split()
        typ = typ.lower()
        if typ.startswith("array<") and typ.endswith(">"):
            # Spark writes arrays as 3-level compliant lists with the
            # element field named "element"; match it exactly so the
            # files are indistinguishable from Spark-written ones
            elem = _DDL_ARROW_TYPES[typ[6:-1]]
            fields.append(
                pa.field(name, pa.list_(pa.field("element", elem)))
            )
        else:
            fields.append(pa.field(name, _DDL_ARROW_TYPES[typ]))
    return pa.schema(fields)


def write_rows_atomic(spark: SparkSession, path: str, rows, ddl: str) -> None:
    """Driver-side atomic overwrite for BOUNDED literal metadata rows
    (version pointers, meta markers, watermark rows). Same tmp-dir +
    rename-swap crash semantics as `atomic_overwrite`, but the parquet
    file is written by pyarrow in the driver process: a one-row pointer
    flip costs a file write, not a full Spark job (measured on the test
    box: ~1.7 s for a one-row `createDataFrame(...).write.parquet` —
    RDD-backed plan, task scheduling, commit protocol — vs ~2 ms here;
    an index maintenance cycle flips several such rows). The schema is
    the same DDL string the Spark writer was given, mapped to identical
    parquet physical types, so downstream Spark reads see byte-for-byte
    equivalent metadata. Scale shape: these tables are one row at ANY
    corpus size — metadata belongs on the driver (guide §5), exactly
    like `table_inventory`'s listing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = _ddl_arrow_schema(ddl)
    cols = {
        f.name: pa.array([r[i] for r in rows], type=f.type)
        for i, f in enumerate(schema)
    }
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp)
    pq.write_table(
        pa.table(cols, schema=schema),
        os.path.join(tmp, "part-00000.parquet"),
        compression="snappy",
    )
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)
    spark.catalog.refreshByPath(path)


def count_rows_path(path: str) -> int:
    """Exact row count of a parquet table directory from the file
    FOOTERS (parquet metadata carries num_rows) — no data read, no
    Spark job. The count a `spark.read.parquet(path).count()` returns,
    for bounded tables whose count gates driver-side decisions
    (e.g. the occupied-cell count of a centroids table)."""
    import pyarrow.parquet as pq

    total = 0
    for root_, _, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")) or not (
                f.endswith(".parquet") or f.startswith("part-")
            ):
                continue
            total += pq.ParquetFile(os.path.join(root_, f)).metadata.num_rows
    return total


def table_bytes_path(path: str) -> int:
    """At-rest data bytes under a table directory (driver-side stat —
    no Spark job). `_temporary` staging trees are pruned: uncommitted
    in-flight files are not part of the table."""
    total = 0
    for root_, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if d != "_temporary"]
        for f in files:
            if f.startswith("part-"):
                try:
                    total += os.path.getsize(os.path.join(root_, f))
                except OSError:
                    pass
    return total


def copy_table_atomic(spark: SparkSession, src: str, dst: str) -> None:
    """Byte-identical table copy via driver-side file copy + atomic
    swap. A version-carry (codebooks/centroids/tombstones copied
    unchanged to the next version's table name during compact/retrain)
    was a Spark read+rewrite job per table; the files already ARE the
    rows, so copying them is strictly cheaper at any scale (an object
    store's server-side copy is the cluster analog). Same tmp-dir +
    rename crash semantics as `atomic_overwrite`."""
    tmp = f"{dst}__tmp_{uuid.uuid4().hex[:8]}"
    shutil.copytree(src, tmp)
    old = f"{dst}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(dst):
        os.rename(dst, old)
    os.rename(tmp, dst)
    if os.path.exists(old):
        shutil.rmtree(old)
    spark.catalog.refreshByPath(dst)


def read_rows_path(path: str) -> list[dict]:
    """Driver-side read of a small, unpartitioned parquet table
    directory -> list of row dicts (the `.collect()[0].asDict()`
    shape). The one-row pointer/meta reads each cost a Spark job
    (~0.7 s measured) through `spark.read.parquet(...).collect()`;
    pyarrow reads the same files in ~2 ms. Reads Spark-written and
    pyarrow-written files alike; row order across part files is not
    defined (callers read one-row tables or treat rows as a set)."""
    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if not f.startswith(("_", "."))
        and (f.endswith(".parquet") or f.startswith("part-"))
    )
    # a hive-PARTITIONED (or mixed-layout) table holds data files in
    # subdirectories this flat reader never lists — it would silently
    # return [] (or, worse, only the top-level rows, ADVICE r16) —
    # refuse loudly; partitioned tables belong on the Spark reader.
    # `_temporary`/hidden staging trees are not table data (the
    # table_inventory convention) and must not trigger the refusal.
    for d in os.listdir(path):
        sub = os.path.join(path, d)
        if d.startswith(("_", ".")) or not os.path.isdir(sub):
            continue
        for sub_root, sub_dirs, sub_files in os.walk(sub):
            sub_dirs[:] = [
                x for x in sub_dirs if not x.startswith(("_", "."))
            ]
            if any(
                not f.startswith(("_", "."))
                and (f.endswith(".parquet") or f.startswith("part-"))
                for f in sub_files
            ):
                raise ValueError(
                    f"read_rows_path: '{path}' holds partitioned data "
                    f"(data files under subdirectory '{d}') — use "
                    "wh.read()"
                )
    if not files and any(
        os.path.isdir(os.path.join(path, d)) for d in os.listdir(path)
    ):
        # no committed top-level data at all but subdirectories exist
        # (hidden/staging ones included): nothing this reader could
        # return is the table — refuse rather than hand back []
        raise ValueError(
            f"read_rows_path: '{path}' holds partitioned data "
            "(subdirectories, no top-level files) — use wh.read()"
        )
    out: list[dict] = []
    for f in files:
        out.extend(pq.read_table(f).to_pylist())
    return out


class ConcurrentMaintenanceError(RuntimeError):
    """A versioned maintenance op (build/compact/retrain) refused its
    pointer flip because the version pointer MOVED while it ran —
    another maintainer's flip landed first. Flipping anyway would
    clobber the winner's committed version (lost update; and for ops
    that share target table names, possibly interleaved writes).
    Nothing is lost on refusal: the winner's version is serving;
    re-run this op against it. Versioned indexes assume a
    single-maintainer schedule — this guard makes a violation loud
    instead of silent."""


class ConcurrentWriteError(RuntimeError):
    """A versioned rebuild refused its pointer flip because another
    writer (absorb/delete) landed rows in the CURRENT version's tables
    after the rebuild snapshotted them — flipping would abandon those
    rows in tables the new pointer never reads (silent data loss).
    The pointer is left on the current version, where the concurrent
    write IS visible; re-run the maintenance op to pick it up."""


def table_inventory(wh: "Warehouse", tables) -> frozenset[str]:
    """Driver-side data-file inventory of `tables` (relative paths
    under the warehouse root, metadata/_temporary files excluded).
    O(files of those tables) pure listing, no Spark jobs — a rebuild
    that is about to read all of them anyway pays strictly less here
    than in its own scan. Appends write fresh uniquely-named part
    files, so any concurrent absorb/delete shows up as inventory
    growth between two calls."""
    inv = set()
    for t in tables:
        root = wh.path(t)
        if not os.path.isdir(root):
            continue
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = [d for d in dirnames if d != "_temporary"]
            for f in filenames:
                if f.startswith(("_", ".")):
                    continue
                inv.add(
                    os.path.relpath(os.path.join(dirpath, f), wh.root)
                )
    return frozenset(inv)


def guard_pointer_unmoved(
    current: int | None, expected: int | None, op: str
) -> None:
    """The maintenance-vs-maintenance sibling of
    `guard_concurrent_writes` (same flip sites, different adversary):
    `expected` is the version the op resolved when it started (None =
    no pointer existed yet), `current` is a fresh read immediately
    before the flip. A moved pointer means a competing maintainer
    committed first — refuse loudly rather than clobber its version.
    The two guards divide the space: file inventory catches absorbs/
    deletes into the CURRENT version's tables (which never move the
    pointer); this catches rebuild/compact/retrain (which only ever
    move the pointer).

    Call sites check TWICE: once immediately before the first write
    into the shared v(cur+1) table paths (so a maintainer that lost
    the race during its long compute phase refuses BEFORE clobbering
    the winner's committed tables) and once immediately before the
    flip. Residual caveat, documented not hidden: two maintainers
    simultaneously inside the write window itself (both passed the
    early check, neither flipped yet) can interleave writes into the
    same v(cur+1) paths — whichever flips second refuses, but the
    winner's tables may contain the loser's scratch output. Closing
    that window needs per-attempt unique table names carried in the
    pointer row or an external lock; versioned indexes therefore keep
    the single-MAINTAINER contract (absorbs/deletes from other
    writers are fully guarded), and these checks exist to make a
    schedule violation loud in every interleave where the ops do not
    physically overlap in the write phase."""
    if current != expected:
        raise ConcurrentMaintenanceError(
            f"{op}: refusing the version pointer flip — the pointer "
            f"moved from {expected!r} to {current!r} while this op "
            "ran, so a competing maintenance op committed first. Its "
            "version is serving and nothing is lost; re-run this op "
            "against it (versioned indexes assume a single-maintainer "
            "schedule)."
        )


def guard_concurrent_writes(
    wh: "Warehouse",
    tables,
    pre_inventory: frozenset[str],
    op: str,
) -> None:
    """The pre-flip re-check of a versioned rebuild (VERDICT r15 #1):
    compare the current version's file inventory NOW against the
    snapshot taken when the rebuild started reading. New files mean a
    concurrent absorb/delete wrote into tables the imminent pointer
    flip would abandon — refuse LOUDLY instead of silently dropping
    the epoch. Refusing is the only always-correct action: the new
    version may have been built under different analyzer/geometry
    conventions, so copying the late rows over verbatim can be wrong;
    the pointer stays on the current version, where the late write is
    fully visible, and re-running the op converges (its fresh
    snapshot includes the late rows). Conservative by design: a write
    that landed after the snapshot but still made it into the
    rebuild's scan triggers a false refusal — a wasted rebuild, never
    a lost row."""
    late = sorted(table_inventory(wh, tables) - pre_inventory)
    if late:
        preview = ", ".join(late[:5]) + (
            f", … (+{len(late) - 5} more)" if len(late) > 5 else ""
        )
        raise ConcurrentWriteError(
            f"{op}: refusing the version pointer flip — a concurrent "
            f"writer added {len(late)} file(s) to the current "
            f"version's tables after this rebuild snapshotted them "
            f"({preview}). Those rows would be silently lost in the "
            "new version. The pointer remains on the current version "
            "(the concurrent write is visible there); re-run this "
            "maintenance op to include it, or enforce a "
            "single-maintainer schedule."
        )


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

    def overwrite_rows(self, table: str, rows, ddl: str) -> None:
        """Atomic overwrite of a BOUNDED literal row set (version
        pointers, meta markers) without a Spark job — see
        `write_rows_atomic`. `rows` is a list of tuples in `ddl`
        column order, exactly what `spark.createDataFrame(rows, ddl)`
        would take."""
        write_rows_atomic(self.spark, self.path(table), rows, ddl)

    def read_rows(self, table: str) -> list[dict]:
        """Driver-side read of a small metadata table -> row dicts,
        without a Spark job — see `read_rows_path`. Callers must
        `exists()`-check first, like `read`."""
        return read_rows_path(self.path(table))

    def copy_table(self, src: str, dst: str) -> None:
        """Byte-identical atomic table copy without a Spark job — see
        `copy_table_atomic`."""
        copy_table_atomic(self.spark, self.path(src), self.path(dst))

    def count_rows(self, table: str) -> int:
        """Exact row count from parquet footers, no Spark job — see
        `count_rows_path`."""
        return count_rows_path(self.path(table))

    def remove_table(self, table: str) -> bool:
        """Remove a table directory outright (version pruning, the
        tombstone purge after a full rebuild/compaction). No-op on an
        absent table; returns whether anything was removed. The
        recursive delete here is the warehouse's storage coupling
        (the atomic_overwrite/os.rename posture — an object store's
        recursive delete is the analog); operators call THIS instead
        of touching the filesystem, the r17 FS-boundary pin
        (tests/test_plan_invariants.py)."""
        p = self.path(table)
        if os.path.isdir(p):
            shutil.rmtree(p)
            return True
        return False

    def table_bytes(self, table: str) -> int:
        """At-rest data bytes of a table (driver-side stat, no Spark
        job) — the broadcast-gate probe (operators/tombstones.py)."""
        return table_bytes_path(self.path(table))

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

    def gc_orphans(self, min_age_sec: float = 3600.0) -> list[str]:
        """Remove crash leftovers of `atomic_overwrite`: a crash
        before the temp→target rename strands a `<table>__tmp_<hex>`
        directory, a crash between the two renames strands
        `<table>__old_<hex>` — both invisible to readers (the target
        path is either the old or the new table throughout) but
        accumulating disk forever on a long-lived warehouse.

        `min_age_sec` (default 1 h) guards a CONCURRENT in-flight
        overwrite two ways: the age gate uses the MAX mtime across
        the candidate's whole tree (a long `df.write.parquet(tmp)`
        keeps landing part files under `_temporary/` subdirs without
        necessarily touching the top-level dir's mtime, so a write
        legitimately longer than the threshold would look stale at
        the root), and any dir still containing a live Hadoop
        `_temporary` staging subdir is skipped outright regardless of
        age — orphans are exactly the dirs with no staging activity
        and nothing written for `min_age_sec`. Pure driver-side
        filesystem work, no Spark jobs; returns the names of dirs
        that are VERIFIED gone after removal (a partially-failed
        rmtree — e.g. permissions — is not reported as reclaimed)."""
        import re as _re
        import time as _time

        pat = _re.compile(r"__(tmp|old)_[0-9a-f]{8}$")
        now = _time.time()
        removed = []
        for name in sorted(os.listdir(self.root)):
            if not pat.search(name):
                continue
            p = os.path.join(self.root, name)
            if not os.path.isdir(p):
                continue
            newest = os.path.getmtime(p)
            in_flight = False
            for dirpath, dirnames, filenames in os.walk(p):
                if "_temporary" in dirnames:
                    in_flight = True
                    break
                for entry in dirnames + filenames:
                    try:
                        m = os.path.getmtime(
                            os.path.join(dirpath, entry)
                        )
                    except OSError:
                        continue
                    if m > newest:
                        newest = m
            if in_flight or now - newest < min_age_sec:
                continue
            shutil.rmtree(p, ignore_errors=True)
            if not os.path.exists(p):
                removed.append(name)
        return removed

    def erase_keys(
        self,
        table: str,
        key_cols: list[str] | str,
        keys: DataFrame,
        partition_cols: list[str] | str | None = None,
    ) -> dict:
        """Right-to-erasure on the warehouse layouts (round 13 — the
        warehouse twin of the index families' delete()): remove every
        row of `table` matching `keys` on `key_cols`. For an SCD2
        dimension that is the key's WHOLE history (erasure means the
        subject's record goes away, not just the current row); for a
        fact table, every event of the key.

        Scale shape: with `partition_cols` (the batch-date-partitioned
        facts), only the partitions that actually CONTAIN matching
        rows are rewritten — discovered by one semi-joined distinct
        over the partition columns (bounded by the partition count) —
        via dynamic partition overwrite; untouched partitions' files
        are never opened for write. Without `partition_cols` (snapshot
        dims) the table is one anti-joined atomic rewrite. The key
        join is hint-free: a handful of erasure subjects broadcasts
        under Spark's own threshold, a mass erasure (revoked-license
        scale) degrades to a shuffle join instead of a forced
        broadcast.

        A partition whose every row is erased is REMOVED outright:
        dynamic overwrite only replaces partitions present in the new
        data, so an all-erased partition would otherwise keep its old
        files — silent resurrection. Removal happens AFTER the
        rewrite; a crash in between leaves the old files in place and
        a RE-RUN converges (the leftover partition still matches
        `keys`, is re-discovered as affected, and is removed).
        Partition values must round-trip through their hive directory
        names (dates/ints/simple strings — the layouts this warehouse
        writes); a NULL partition value is matched null-safely and its
        directory is hive's `__HIVE_DEFAULT_PARTITION__`.

        Returns {"rows_erased", "partitions_rewritten",
        "partitions_removed"}."""
        kcols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        pcols = (
            [partition_cols]
            if isinstance(partition_cols, str)
            else list(partition_cols or [])
        )
        if not self.exists(table):
            return {
                "rows_erased": 0,
                "partitions_rewritten": 0,
                "partitions_removed": 0,
            }
        df = self.read(table)
        kset = keys.select(*kcols).distinct().localCheckpoint()
        matches = df.join(kset, kcols, "left_semi")
        if not pcols:
            n = matches.count()
            if n:
                atomic_overwrite(
                    df.join(kset, kcols, "left_anti"), self.path(table)
                )
            return {
                "rows_erased": int(n),
                "partitions_rewritten": 1 if n else 0,
                "partitions_removed": 0,
            }
        # bounded: one collect of (#affected partitions) rows carrying
        # the per-partition erase counts
        hit_rows = (
            matches.groupBy(*pcols)
            .agg(F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        affected = [tuple(r)[:-1] for r in hit_rows]
        n = sum(r["__n"] for r in hit_rows)
        if not affected:
            return {
                "rows_erased": 0,
                "partitions_rewritten": 0,
                "partitions_removed": 0,
            }

        def _pred(values):
            # null-SAFE (ADVICE r13): a null partition value under a
            # null-unsafe == evaluates to NULL, so matching rows would
            # be counted in rows_erased but never rewritten — the data
            # silently survives the erasure request
            c = F.lit(True)
            for col, v in zip(pcols, values):
                c = c & (
                    F.col(col).isNull()
                    if v is None
                    else F.col(col).eqNullSafe(F.lit(v))
                )
            return c

        import functools

        in_affected = functools.reduce(
            lambda a, b: a | b, (_pred(v) for v in affected)
        )
        # localCheckpoint: the rewrite reads the same path the dynamic
        # overwrite replaces — the read-your-own-overwrite hazard the
        # module docstring warns about; pinning the surviving rows
        # first fully consumes the input before any partition is
        # touched (and the remaining-counts collect rides the same
        # materialization)
        kept = (
            df.filter(in_affected)
            .join(kset, kcols, "left_anti")
            .localCheckpoint()
        )
        remaining = {
            tuple(r)[:-1]: r["__n"]
            for r in kept.groupBy(*pcols)
            .agg(F.count(F.lit(1)).alias("__n"))
            .collect()
        }
        survivors = [v for v in affected if remaining.get(v)]
        if survivors:
            write_df = kept
            if len(survivors) != len(affected):
                write_df = kept.filter(
                    functools.reduce(
                        lambda a, b: a | b, (_pred(v) for v in survivors)
                    )
                )
            self.append_partitioned(table, write_df, pcols)
        # all-erased partitions: removed LAST (see docstring)
        removed = 0
        for values in affected:
            if remaining.get(values):
                continue
            # null partition values live under hive's sentinel
            # directory name, not 'col=None' (ADVICE r13)
            p = os.path.join(
                self.path(table),
                *(
                    f"{c}={'__HIVE_DEFAULT_PARTITION__' if v is None else v}"
                    for c, v in zip(pcols, values)
                ),
            )
            if os.path.isdir(p):
                shutil.rmtree(p)
                removed += 1
        self.spark.catalog.refreshByPath(self.path(table))
        return {
            "rows_erased": int(n),
            "partitions_rewritten": len(survivors),
            "partitions_removed": removed,
        }
