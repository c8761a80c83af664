"""Excel parser fidelity (FIXTURES A7, excel_parser.rs semantics)."""

from __future__ import annotations

from data_ingestion_spark.sources import read_excel
from data_ingestion_spark.sources.excel_source import read_xlsx_rows, rows_to_documents

from xlsx_helper import make_xlsx


def as_dicts(df):
    return [r.asDict() for r in df.collect()]


A7 = [
    ["name", "age", "department"],
    ["Alice", 28, "HR"],
    ["Charlie", 32, "Finance"],
]


def test_headers_and_stringify(spark, tmp_path):
    # excel_parser.rs:19-24,33 — first row headers, every cell a string
    p = make_xlsx(str(tmp_path / "a7.xlsx"), [A7])
    df = read_excel(spark, p)
    assert df.columns == ["name", "age", "department"]
    rows = sorted(as_dicts(df), key=lambda r: r["name"])
    assert rows == [
        {"name": "Alice", "age": "28", "department": "HR"},
        {"name": "Charlie", "age": "32", "department": "Finance"},
    ]


def test_shared_strings(spark, tmp_path):
    p = make_xlsx(str(tmp_path / "ss.xlsx"), [A7], shared=True)
    rows = sorted(as_dicts(read_excel(spark, p)), key=lambda r: r["name"])
    assert rows[0]["department"] == "HR"


def test_overflow_cells_dropped():
    # excel_parser.rs:31-35 — contrast CSV's column_{i} keep
    rows = [["a", "b"], ["1", "2", "EXTRA"]]
    headers, docs = rows_to_documents(rows)
    assert headers == ["a", "b"]
    assert docs == [["1", "2"]]


def test_sheet_zero_only(spark, tmp_path):
    # excel_parser.rs:16 — second sheet invisible by default
    p = make_xlsx(
        str(tmp_path / "two.xlsx"),
        [A7, [["other"], ["ignored"]]],
    )
    df = read_excel(spark, p)
    assert df.columns == ["name", "age", "department"]
    # upgrade path: sheet_index honored when configured
    df2 = read_excel(spark, p, {"sheet_index": 1})
    assert df2.columns == ["other"]
    assert as_dicts(df2) == [{"other": "ignored"}]


def test_empty_sheet_empty_result(spark, tmp_path):
    # excel_parser.rs:26-29 — empty result, NOT an error
    p = make_xlsx(str(tmp_path / "empty.xlsx"), [[]])
    df = read_excel(spark, p)
    assert df.count() == 0


def test_short_rows_padded():
    headers, docs = rows_to_documents([["a", "b", "c"], ["1"]])
    assert docs == [["1", "", ""]]


def test_read_xlsx_rows_numbers_and_gaps(tmp_path):
    # sparse row: cell C only → A/B backfilled empty
    import zipfile

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    xml = (
        f'<worksheet {ns}><sheetData>'
        '<row r="1"><c r="C1"><v>7</v></c></row>'
        "</sheetData></worksheet>"
    )
    p = str(tmp_path / "gap.xlsx")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("xl/worksheets/sheet1.xml", xml)
    assert read_xlsx_rows(open(p, "rb").read()) == [["", "", "7"]]


def test_duplicate_headers_last_wins(spark, tmp_path):
    # reference map-insert: duplicate header names collapse to one column,
    # the LAST duplicate's value wins per row
    p = make_xlsx(
        str(tmp_path / "dup.xlsx"),
        [[["name", "val", "name"], ["first", "1", "second"], ["x", "2", "y"]]],
    )
    rows = sorted(as_dicts(read_excel(spark, p)), key=lambda r: r["val"])
    assert list(rows[0].keys()) == ["name", "val"]
    assert rows == [{"name": "second", "val": "1"}, {"name": "y", "val": "2"}]
