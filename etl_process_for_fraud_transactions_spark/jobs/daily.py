"""Daily batch orchestration — the engine-native analog of the
reference's whole main.py flow (discover dates -> stage -> archive ->
SCD2 x4 -> facts -> five-rule report), per SURVEY.md §3.1.

Differences by design (SURVEY.md §1.3, §2.12):
- staging is ephemeral DataFrames (no truncate/reload dance);
- dims are snapshot-rewritten atomically; facts are appended with
  dynamic partition overwrite on the batch date, so re-running a date
  is idempotent instead of silently duplicating (reference T1/T2);
- errors fail fast (the reference swallows staging-cleanup errors and
  keeps going, main.py:52-60 — a defect, not a capability).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.core import ddmmyyyy_to_date
from ..functions.observability import observed_counts
from ..operators.report import assemble_report
from ..operators.scd2 import scd2_apply
from ..schemas import DIMENSIONS
from ..sources.files import archive_batch_files, discover_batch_dates
from ..sources.ingest import read_excel_sheet, read_semicolon_csv
from ..sources.warehouse import Warehouse


class DailyFraudJob:
    """Per-date pipeline over a directory of dated input files plus a
    parquet 'source DB' directory (the info.clients/accounts/cards
    analog, reference main.py:75-92)."""

    def __init__(
        self,
        spark: SparkSession,
        input_dir: str,
        source_dir: str,
        warehouse_root: str,
        archive: bool = True,
        incremental_report: bool = False,
        scd2_mode: str = "partitioned",
    ):
        self.spark = spark
        self.input_dir = input_dir
        self.source_dir = source_dir
        self.wh = Warehouse(spark, warehouse_root)
        self.archive = archive
        #: per-batch write metrics keyed by '<table>_<date>' (observe-based)
        self.metrics: dict[str, dict] = {}
        # "partitioned" (default): append-only closed partition +
        # bounded current rewrite (operators.scd2_partitioned) — the
        # at-scale mode where the per-batch cost stops growing with
        # history depth (BASELINE.md growth table: flat vs snapshot's
        # linear climb; 5-batch equivalence proven in
        # test_scd2_partitioned.py). "snapshot": full-history rewrite
        # per batch (reference-exact tuple-IN semantics,
        # operators.scd2) — kept for reference-faithful replay.
        if scd2_mode not in ("snapshot", "partitioned"):
            raise ValueError(f"scd2_mode must be snapshot|partitioned, got {scd2_mode!r}")
        self.scd2_mode = scd2_mode
        # The reference re-scans the FULL transaction fact for every
        # daily report (main.py:544), re-flagging all history into each
        # new report_dt partition — O(total history) per day. The
        # incremental mode restricts rules 1-3 and the final assembly
        # to the batch date's partition (partition-pruned scan) while
        # the self-join rules still see the full fact for window
        # context. At 100 TB the full-rescan mode is not viable; the
        # default stays reference-faithful.
        self.incremental_report = incremental_report

    # -- staging ------------------------------------------------------------

    def _stage_transactions(self, date: str) -> DataFrame:
        path = os.path.join(self.input_dir, f"transactions_{date}.txt")
        df = read_semicolon_csv(
            self.spark,
            path,
            decimal_cols=["amount"],
            renames={
                "transaction_id": "trans_id",
                "transaction_date": "trans_date",
                "amount": "amt",
            },
            select=[
                "transaction_id",
                "transaction_date",
                "card_num",
                "oper_type",
                "amount",
                "oper_result",
                "terminal",
            ],
        )
        return df.withColumn("trans_date", F.col("trans_date").cast("timestamp_ntz"))

    def _stage_sheet(
        self, date: str, stem: str, sheet: str, date_cols: list[str] | None = None
    ) -> DataFrame:
        """terminals_/passport_blacklist_ file: xlsx when present
        (reference format), else a CSV fallback with the same columns.
        date_cols marks Excel date-serial columns (see read_excel_sheet)
        — ignored on the CSV path, where dates arrive as strings."""
        xlsx = os.path.join(self.input_dir, f"{stem}_{date}.xlsx")
        if os.path.exists(xlsx):
            return read_excel_sheet(self.spark, xlsx, sheet, date_cols=date_cols)
        csv = os.path.join(self.input_dir, f"{stem}_{date}.csv")
        return (
            self.spark.read.option("header", "true").option("inferSchema", "false").csv(csv)
        )

    def _stage_terminals(self, date: str) -> DataFrame:
        return self._stage_sheet(date, "terminals", "terminals")

    def _stage_blacklist(self, date: str) -> DataFrame:
        # `date` is an Excel date-serial column in the reference's real
        # workbook (main.py:111-113); declared so the stdlib reader
        # converts serials instead of cast("date") nulling doubles
        df = self._stage_sheet(date, "passport_blacklist", "blacklist", date_cols=["date"])
        return df.select(
            F.col("passport").alias("passport_num"),
            F.col("date").cast("date").alias("entry_dt"),
        )

    def _stage_source_table(self, name: str) -> DataFrame:
        df = self.spark.read.parquet(os.path.join(self.source_dir, f"{name}.parquet"))
        if name == "clients":
            return df.select(
                "client_id",
                "last_name",
                "first_name",
                F.col("patronymic").alias("patrinymic"),
                "date_of_birth",
                "passport_num",
                "passport_valid_to",
                "phone",
            )
        if name == "accounts":
            return df.select(
                F.col("account").alias("account_num"), "valid_to", "client"
            )
        if name == "cards":
            return df.select("card_num", F.col("account").alias("account_num"))
        raise ValueError(name)

    def read_dim_history(self, name: str) -> DataFrame:
        """The stable, layout-independent read API for dimension
        history. Since the default flipped to scd2_mode='partitioned'
        (round 4), the on-disk layout differs by mode — snapshot mode
        keeps the single `dim_<name>_hist` table, partitioned mode
        stores append-only closed partitions plus a current table —
        so external consumers should read through this method (or pin
        scd2_mode='snapshot') instead of wh.read('dim_<name>_hist').
        Identical rows either way (5-batch equivalence,
        test_scd2_partitioned.py)."""
        if self.scd2_mode == "partitioned":
            from ..operators.scd2_partitioned import PartitionedScd2

            keys, attrs = DIMENSIONS[name]
            return PartitionedScd2(self.wh, f"dim_{name}", keys, attrs).history()
        return self.wh.read(f"dim_{name}_hist")

    # backwards-compatible private alias (pre-round-5 callers)
    _read_dim_history = read_dim_history

    # -- per-date pipeline --------------------------------------------------

    def run_batch(self, date: str) -> DataFrame:
        batch = ddmmyyyy_to_date(date)

        staging = {
            "clients": self._stage_source_table("clients"),
            "accounts": self._stage_source_table("accounts"),
            "cards": self._stage_source_table("cards"),
            "terminals": self._stage_terminals(date),
        }

        trans = self._stage_transactions(date)
        blacklist = self._stage_blacklist(date)

        # NB: the reference archives right after pandas' eager read
        # (main.py:117); Spark reads lazily, so archival must wait until
        # every write below has actually consumed the input files.

        # SCD2 x4 (main.py:121-379)
        for name, (keys, attrs) in DIMENSIONS.items():
            if self.scd2_mode == "partitioned":
                from ..operators.scd2_partitioned import PartitionedScd2

                PartitionedScd2(self.wh, f"dim_{name}", keys, attrs).apply_batch(
                    staging[name], batch
                )
            else:
                dim = (
                    self.wh.read(f"dim_{name}_hist")
                    if self.wh.exists(f"dim_{name}_hist")
                    else None
                )
                hist = scd2_apply(dim, staging[name], keys, attrs, batch)
                self.wh.overwrite(f"dim_{name}_hist", hist)

        # blacklist fact: insert-if-absent (J9, main.py:382-394)
        if self.wh.exists("fact_passport_blacklist"):
            existing = self.wh.read("fact_passport_blacklist")
            fresh = blacklist.join(existing, "passport_num", "left_anti")
            self.wh.append("fact_passport_blacklist", fresh)
        else:
            self.wh.append("fact_passport_blacklist", blacklist)

        # transactions fact: append, partitioned by batch date for
        # idempotent re-runs (main.py:397-409); row count + amount sum
        # observed on the write itself (the reference's print-audit,
        # main.py:410, without a second scan)
        observed, obs = observed_counts(
            trans.withColumn("batch_dt", batch),
            f"fact_transactions_{date}",
            F.sum("amt").alias("total_amt"),
        )
        self.wh.append_partitioned("fact_transactions", observed, "batch_dt")
        self.metrics[f"fact_transactions_{date}"] = obs.get

        # all file-backed frames are persisted to the warehouse now —
        # safe to archive the consumed inputs (main.py:20-30,117)
        if self.archive:
            archive_batch_files(self.input_dir, date)

        # five-rule report over the full fact vs current dims (lazy
        # current∪closed union in partitioned mode — never materialized)
        dims = {name: self._read_dim_history(name) for name in DIMENSIONS}
        fact = self.wh.read("fact_transactions")
        report = assemble_report(
            fact.drop("batch_dt"),
            dims["cards"],
            dims["accounts"],
            dims["clients"],
            dims["terminals"],
            self.wh.read("fact_passport_blacklist"),
            report_dt=batch,
            # incremental: only this batch's partition feeds the final
            # assembly (pruned scan); rules keep full window context
            report_trans=(
                fact.filter(F.col("batch_dt") == batch).drop("batch_dt")
                if self.incremental_report
                else None
            ),
            # production job: measure before hinting — an unattended
            # daily run must degrade to a shuffle join on a
            # pathological day, not abort on a forced broadcast (the
            # ~2x single-shot cost of the gate's persist barriers is
            # the right trade here, unlike the interactive/bench path
            # which keeps the single-tree True default)
            broadcast_rule_hits=None,
        )
        self.wh.append_partitioned("rep_fraud", report, "report_dt")
        # the measured hint gate persisted the two rule-hit frames;
        # release them now that the report is materialized — a
        # multi-date run would otherwise accumulate one cached pair
        # per batch until LRU pressure (re-collecting the returned
        # report recomputes the rules, correctly, just uncached)
        for frame in getattr(report, "_rule_hit_frames", ()):
            frame.unpersist()
        return report

    def run(self) -> list[str]:
        dates = discover_batch_dates(self.input_dir)
        for date in dates:
            self.run_batch(date)
        return dates
