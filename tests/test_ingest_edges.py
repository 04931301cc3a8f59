"""Ingest edge paths: xlsx without an Excel engine, streaming
cleanSource=archive side effect."""

from __future__ import annotations

import os
import zipfile

import pytest

from etl_process_for_fraud_transactions_spark.sources.ingest import read_excel_sheet
from etl_process_for_fraud_transactions_spark.streaming.filestream import (
    ingest_available_now,
    stream_transactions,
)

HEADER = "transaction_id;transaction_date;card_num;oper_type;amount;oper_result;terminal\n"


def test_excel_without_engine_falls_back_to_stdlib_reader(spark, tmp_path):
    """Without openpyxl, read_excel_sheet parses the workbook with the
    vendored stdlib reader; a workbook missing the requested sheet
    surfaces the reader's clear error (full round-trip coverage lives
    in tests/test_xlsx.py)."""
    try:
        import openpyxl  # noqa: F401

        pytest.skip("openpyxl installed; stdlib fallback not reachable")
    except ImportError:
        pass
    p = tmp_path / "terminals_01012024.xlsx"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr(
            "xl/workbook.xml",
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            "<sheets/></workbook>",
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"/>',
        )
    with pytest.raises(ValueError, match="terminals"):
        read_excel_sheet(spark, str(p), "terminals")


def test_stream_archives_consumed_files(spark, tmp_path):
    """Spark's cleanSource=archive moves consumed files lazily, in a
    LATER micro-batch — a single AvailableNow run leaves its own input
    in place; the next run (new file arrived) archives it."""
    src = tmp_path / "in"
    src.mkdir()
    f1 = src / "transactions_01012024.txt"
    f1.write_text(HEADER + "tx1;2024-01-01 10:00:00;c1;PAY;1,00;SUCCESS;t1\n")
    archive = tmp_path / "arch"

    def run():
        ingest_available_now(
            stream_transactions(
                spark, str(src / "transactions_*.txt"), archive_dir=str(archive)
            ),
            str(tmp_path / "out"),
            str(tmp_path / "ck"),
        )

    run()
    assert f1.exists()  # own batch not yet cleaned — documented laziness

    f2 = src / "transactions_02012024.txt"
    f2.write_text(HEADER + "tx2;2024-01-02 10:00:00;c2;PAY;2,00;SUCCESS;t2\n")
    run()
    assert spark.read.parquet(str(tmp_path / "out")).count() == 2
    archived = [
        os.path.join(r, n)
        for r, _, files in os.walk(archive)
        for n in files
        if n.endswith(".txt")
    ]
    assert archived and not f1.exists()
