"""Real .xlsx ingestion through the stdlib reader (no openpyxl in this
container, so pandas.read_excel raises ImportError and read_excel_sheet
falls back to read_xlsx_rows — the same file round-trips through
openpyxl-based pandas where it is installed)."""

from __future__ import annotations

import zipfile

import pytest

from etl_process_for_fraud_transactions_spark.sources.ingest import (
    _col_index,
    read_excel_sheet,
    read_xlsx_rows,
)

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
  <Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
  <Default Extension="xml" ContentType="application/xml"/>
  <Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
  <Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
  <Override PartName="/xl/worksheets/sheet2.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
  <Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
  <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
  <sheets>
    <sheet name="terminals" sheetId="1" r:id="rId1"/>
    <sheet name="blacklist" sheetId="2" r:id="rId2"/>
  </sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
  <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
  <Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""

_SHARED = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="5" uniqueCount="5">
  <si><t>terminal_id</t></si>
  <si><t>terminal_type</t></si>
  <si><t>terminal_city</t></si>
  <si><t>ATM</t></si>
  <si><r><t>Sankt-</t></r><r><t>Peterburg</t></r></si>
</sst>"""

# header via shared strings; data mixes shared, inline, numeric cells;
# one sparse row (missing B) and rich-text shared string (split runs)
_SHEET1 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
  <sheetData>
    <row r="1">
      <c r="A1" t="s"><v>0</v></c>
      <c r="B1" t="s"><v>1</v></c>
      <c r="C1" t="s"><v>2</v></c>
    </row>
    <row r="2">
      <c r="A2" t="inlineStr"><is><t>T001</t></is></c>
      <c r="B2" t="s"><v>3</v></c>
      <c r="C2" t="s"><v>4</v></c>
    </row>
    <row r="3">
      <c r="A3" t="inlineStr"><is><t>T002</t></is></c>
      <c r="C3" t="inlineStr"><is><t>Moskva</t></is></c>
    </row>
  </sheetData>
</worksheet>"""

_SHEET2 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
  <sheetData>
    <row r="1">
      <c r="A1" t="inlineStr"><is><t>passport</t></is></c>
      <c r="B1" t="inlineStr"><is><t>amount</t></is></c>
      <c r="C1" t="inlineStr"><is><t>flagged</t></is></c>
    </row>
    <row r="2">
      <c r="A2" t="inlineStr"><is><t>12 34 567890</t></is></c>
      <c r="B2"><v>1234.5</v></c>
      <c r="C2" t="b"><v>1</v></c>
    </row>
    <row r="3">
      <c r="A3" t="inlineStr"><is><t>98 76 543210</t></is></c>
      <c r="B3"><v>42</v></c>
      <c r="C3" t="b"><v>0</v></c>
    </row>
  </sheetData>
</worksheet>"""


@pytest.fixture()
def xlsx_path(tmp_path):
    p = tmp_path / "terminals_01012024.xlsx"
    with zipfile.ZipFile(p, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/sharedStrings.xml", _SHARED)
        z.writestr("xl/worksheets/sheet1.xml", _SHEET1)
        z.writestr("xl/worksheets/sheet2.xml", _SHEET2)
    return str(p)


def test_col_index():
    assert _col_index("A1") == 0
    assert _col_index("Z9") == 25
    assert _col_index("AA10") == 26
    assert _col_index("BC12") == 54


def test_read_xlsx_rows_terminals(xlsx_path):
    header, rows = read_xlsx_rows(xlsx_path, "terminals")
    assert header == ["terminal_id", "terminal_type", "terminal_city"]
    # rich-text shared string reassembled from runs; sparse row -> None
    assert rows == [
        ["T001", "ATM", "Sankt-Peterburg"],
        ["T002", None, "Moskva"],
    ]


def test_read_xlsx_rows_second_sheet_types(xlsx_path):
    header, rows = read_xlsx_rows(xlsx_path, "blacklist")
    assert header == ["passport", "amount", "flagged"]
    assert rows == [
        ["12 34 567890", 1234.5, True],
        ["98 76 543210", 42, False],
    ]
    assert isinstance(rows[1][1], int)  # exact ints stay ints


def test_read_xlsx_rows_missing_sheet(xlsx_path):
    with pytest.raises(ValueError, match="nope"):
        read_xlsx_rows(xlsx_path, "nope")


def test_read_excel_sheet_spark(spark, xlsx_path):
    df = read_excel_sheet(
        spark,
        xlsx_path,
        "terminals",
        renames={"terminal_id": "tid"},
    )
    got = sorted((r.tid, r.terminal_type, r.terminal_city) for r in df.collect())
    assert got == [
        ("T001", "ATM", "Sankt-Peterburg"),
        ("T002", None, "Moskva"),
    ]


def test_read_excel_sheet_numeric_column(spark, xlsx_path):
    df = read_excel_sheet(spark, xlsx_path, "blacklist", select=["passport", "amount"])
    got = {r.passport: r.amount for r in df.collect()}
    assert got == {"12 34 567890": 1234.5, "98 76 543210": 42.0}


_SHEET3 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
  <sheetData>
    <row r="1">
      <c r="A1" t="inlineStr"><is><t>passport_num</t></is></c>
      <c r="B1" t="inlineStr"><is><t>entry_dt</t></is></c>
    </row>
    <row r="2">
      <c r="A2" t="inlineStr"><is><t>11 22 334455</t></is></c>
      <c r="B2"><v>45292</v></c>
    </row>
    <row r="3">
      <c r="A3" t="inlineStr"><is><t>22 33 445566</t></is></c>
      <c r="B3"><v>45323.5</v></c>
    </row>
  </sheetData>
</worksheet>"""


def test_excel_date_serials(spark, tmp_path):
    import datetime as dt

    p = tmp_path / "passport_blacklist_01012024.xlsx"
    wb = _WORKBOOK.replace('name="terminals"', 'name="blacklist_dates"').replace(
        '<sheet name="blacklist" sheetId="2" r:id="rId2"/>', ""
    )
    with zipfile.ZipFile(p, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", _SHEET3)
    df = read_excel_sheet(
        spark, str(p), "blacklist_dates", date_cols=["entry_dt"]
    )
    got = {r.passport_num: r.entry_dt for r in df.collect()}
    # Excel 1900-system: 45292 = 2024-01-01; fractional time dropped
    assert got == {
        "11 22 334455": dt.date(2024, 1, 1),
        "22 33 445566": dt.date(2024, 2, 1),
    }


def test_daily_job_stages_real_xlsx_blacklist(spark, tmp_path):
    """The daily job's blacklist staging on a REAL xlsx with an Excel
    date-serial column: serials must convert to dates, not null out
    through cast('date')."""
    import datetime as dt

    from etl_process_for_fraud_transactions_spark.jobs.daily import DailyFraudJob

    sheet = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
  <sheetData>
    <row r="1">
      <c r="A1" t="inlineStr"><is><t>passport</t></is></c>
      <c r="B1" t="inlineStr"><is><t>date</t></is></c>
    </row>
    <row r="2">
      <c r="A2" t="inlineStr"><is><t>55 44 332211</t></is></c>
      <c r="B2"><v>45292</v></c>
    </row>
  </sheetData>
</worksheet>"""
    wb = _WORKBOOK.replace('name="terminals"', 'name="blacklist"').replace(
        '<sheet name="blacklist" sheetId="2" r:id="rId2"/>', ""
    )
    p = tmp_path / "passport_blacklist_01012024.xlsx"
    with zipfile.ZipFile(p, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)

    job = DailyFraudJob(
        spark,
        input_dir=str(tmp_path),
        source_dir=str(tmp_path),
        warehouse_root=str(tmp_path / "wh"),
        archive=False,
    )
    rows = job._stage_blacklist("01012024").collect()
    assert [(r.passport_num, r.entry_dt) for r in rows] == [
        ("55 44 332211", dt.date(2024, 1, 1))
    ]
