"""Excel source/sink tests: round-trip through the stdlib OOXML
writer/reader, distributed scan semantics (sheet filter, header skip,
positional mapping, short-row padding), the full Excel→pipeline flow, and
the S9/S10 tools."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shuttlestandalonedbcreator_spark.plans.transfer_pipeline import RAW_COLUMNS, ingest
from shuttlestandalonedbcreator_spark.sources.excel import (
    extract_sheet,
    inspect_columns,
    read_transfer_reports,
    read_workbook_rows,
    write_workbook,
)


def _report_rows(rows):
    header = [c.replace("_", " ").title() for c in RAW_COLUMNS]
    return [header, *rows]


@pytest.fixture(scope="module")
def workbook_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("workbooks")
    r1 = ["/A", "", "", "10"] + [""] * 15
    r2 = ["/A/f1.pdf", "100", "90", "11"] + [""] * 11 + ["success", "", "", ""]
    short = ["/A/short.pdf", "5", "", "12"]  # trailing cells absent
    write_workbook(
        {
            "Transfer Report 1": _report_rows([r1, r2]),
            "Transfer Report 2": _report_rows([short]),
            "Overview": [["summary", "ignored"], ["x", "y"]],
        },
        str(d / "JobA.xlsx"),
    )
    write_workbook(
        {"Transfer Report": _report_rows([["/B/f9.pdf", "7", "", "20"] + [""] * 15])},
        str(d / "JobB.xlsx"),
    )
    # temp lock file must be skipped (S1, reference :226-248)
    write_workbook({"Transfer Report": _report_rows([["/X", "1", "", "9"]])}, str(d / "~lock.xlsx"))
    return str(d)


def test_raw_scan_sheets_and_rows(spark, workbook_dir):
    df = read_workbook_rows(spark, workbook_dir, sheet_prefix="Transfer Report")
    got = df.groupBy("_source_file", "_sheet").count().collect()
    by_key = {(r["_source_file"], r["_sheet"]): r["count"] for r in got}
    # Overview filtered out; ~lock.xlsx skipped; header rows still counted here
    assert by_key == {
        ("JobA.xlsx", "Transfer Report 1"): 3,
        ("JobA.xlsx", "Transfer Report 2"): 2,
        ("JobB.xlsx", "Transfer Report"): 2,
    }


def test_transfer_scan_positional_and_padding(spark, workbook_dir):
    df = read_transfer_reports(spark, workbook_dir)
    rows = {r["file_name"]: r for r in df.collect()}
    assert len(rows) == 4  # headers dropped per sheet
    assert rows["/A/f1.pdf"]["file_status"] == "success"  # position 15
    assert rows["/A/short.pdf"]["errors"] == ""  # short row padded with ''
    assert rows["/A/short.pdf"]["target_file_id"] == "12"
    assert rows["/B/f9.pdf"]["_source_file"] == "JobB.xlsx"


def test_excel_to_pipeline_end_to_end(spark, workbook_dir):
    out = ingest(read_transfer_reports(spark, workbook_dir))
    rows = {r["file_name"]: r for r in out.collect()}
    assert rows["/A/f1.pdf"]["source_file_size"] == 100  # typed
    assert rows["/A/f1.pdf"]["parent_id"] == "10"  # J1 resolved
    assert rows["/A/f1.pdf"]["job_name"] == "JobA"  # F3 from workbook name
    assert rows["/A/f1.pdf"]["level"] == 2


def test_extract_overview_sheet(spark, workbook_dir, tmp_path):
    out_path = str(tmp_path / "Overview-JobA.xlsx")
    n = extract_sheet(spark, workbook_dir + "/JobA.xlsx", out_path, "Overview")
    assert n == 2
    back = read_workbook_rows(spark, out_path).collect()
    assert {r["_sheet"] for r in back} == {"Overview"}
    assert sorted(r["_cells"] for r in back) == [["summary", "ignored"], ["x", "y"]]


def test_inspect_columns_caps(spark, workbook_dir):
    df = inspect_columns(spark, workbook_dir + "/JobA.xlsx", max_rows=2, max_cols=3)
    rows = df.collect()
    assert all(r["_row_index"] < 2 for r in rows)
    assert all(len(r["_cells"]) <= 3 for r in rows)


def test_xls_binary_gated(spark, tmp_path):
    # BIFF .xls is explicitly unsupported (stdlib cannot parse it): the
    # scan must fail loudly, not silently drop data
    bogus = tmp_path / "old.xls"
    bogus.write_bytes(b"\xd0\xcf\x11\xe0" + b"\x00" * 64)
    df = read_workbook_rows(spark, str(tmp_path), glob="*.xls")
    with pytest.raises(Exception, match="(?i)xls|NotImplemented"):
        df.collect()
