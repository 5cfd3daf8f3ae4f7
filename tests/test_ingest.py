"""CSV ingestion: sanitation (P1/P2), ''→NULL (P3), date upgrade
(§1.2), separator sniffing (S1), compression (S2), small-table filter
(P5)."""

from __future__ import annotations

import bz2

from tabsketchfm_spark.sources.csv_ingest import (
    ingest_directory,
    logical_types,
    read_csv_robust,
    sanitize_name,
    sniff_separator,
)


def test_sanitize_name():
    assert sanitize_name(' "First Name" ') == "first name"
    assert sanitize_name("Amount, USD") == "amount usd"
    assert sanitize_name("a\nb") == "ab"


def test_ingest_quirky_csv(spark, tmp_path):
    p = tmp_path / "people.csv"
    p.write_text(
        '"First Name", Amount USD ,row_index,joined\n'
        "alice,10.5,0,2021-01-02\n"
        "bob,,1,2021-05-06\n"
        ",3.25,2,2021-07-08\n"
        "carol,7.0,3,2021-09-10\n"
        "dan,1.0,4,2021-11-12\n"
    )
    tables = ingest_directory(spark, str(tmp_path))
    df = tables["people"]
    assert "row_index" not in df.columns
    assert "first name" in df.columns and "amount usd" in df.columns
    # date typing: either inferSchema already made `joined` a date, or
    # the all-values-parse upgrade derived `joined_date`
    lt = logical_types(df)
    assert lt["joined"] == "date" or lt.get("joined_date") == "date"
    assert lt["amount usd"] == "float"
    # '' → NULL
    rows = df.orderBy("row_index") if False else df
    assert df.where(df["first name"].isNull()).count() == 1


def test_small_table_filtered(spark, tmp_path):
    (tmp_path / "tiny.csv").write_text("a,b\n1,2\n3,4\n")
    tables = ingest_directory(spark, str(tmp_path))
    assert "tiny" not in tables


def test_semicolon_sniff_and_bz2(spark, tmp_path):
    raw = "x;y\n1;2\n3;4\n5;6\n7;8\n9;10\n"
    p = tmp_path / "semi.csv.bz2"
    p.write_bytes(bz2.compress(raw.encode()))
    assert sniff_separator(str(p)) == ";"
    df = read_csv_robust(spark, str(p))
    assert df.columns == ["x", "y"]
    assert df.count() == 5


def test_excel_fallback_stdlib_reader(spark, tmp_path):
    """S3: the native zip+XML xlsx path — works with NO Excel engine
    installed (pandas raises, the stdlib parser takes over). Covers
    sharedStrings, inline strings, numeric cells, and sparse rows."""
    import zipfile

    from tabsketchfm_spark.sources.csv_ingest import read_excel_fallback

    path = str(tmp_path / "book.xlsx")
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    shared = (
        f'<?xml version="1.0"?><sst {ns} count="3" uniqueCount="3">'
        "<si><t>Name</t></si><si><t>Qty</t></si><si><t>widget a</t></si></sst>"
    )
    sheet = (
        f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>7</v></c></row>'
        # sparse row: only column B present (A missing -> None)
        '<row r="3"><c r="B3" t="inlineStr"><is><t>nine</t></is></c></row>'
        "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    df = read_excel_fallback(spark, path)
    assert df is not None
    rows = {tuple(r) for r in df.collect()}
    assert df.columns == ["name", "qty"]
    assert rows == {("widget a", "7"), (None, "nine")}


def test_jsonl_robust_captures_corrupt_lines(spark, tmp_path):
    """JSONL ingest: valid lines parse into columns, malformed lines
    land in _corrupt_json instead of failing or vanishing."""
    from tabsketchfm_spark.sources.csv_ingest import read_jsonl_robust

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        '{"doc_id": 2, "text": "ok"}\n'
        "{not valid json at all\n"
        '{"doc_id": 4, "text": "fine"}\n'
    )
    df = read_jsonl_robust(
        spark, str(p), schema="doc_id bigint, text string"
    )
    rows = df.collect()
    good = [r for r in rows if r._corrupt_json is None]
    bad = [r for r in rows if r._corrupt_json is not None]
    assert {r.doc_id for r in good} == {1, 2, 4}
    assert len(bad) == 1 and "not valid" in bad[0]._corrupt_json


def test_native_xlsx_multi_sheet_order_and_rless_cells(spark, tmp_path):
    """Regression (round-4 ADVICE): (a) a multi-sheet workbook must
    yield the workbook's FIRST tab even when the zip directory lists
    another sheet file earlier; (b) cells without the optional r
    attribute occupy the implied next column instead of corrupting
    the row at key -1."""
    import zipfile

    from tabsketchfm_spark.sources.csv_ingest import read_excel_fallback

    path = str(tmp_path / "multi.xlsx")
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = 'xmlns="http://schemas.openxmlformats.org/package/2006/relationships"'
    wb = (
        f'<?xml version="1.0"?><workbook {ns} '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Main" sheetId="1" r:id="rId1"/>'
        '<sheet name="Extra" sheetId="2" r:id="rId2"/></sheets></workbook>'
    )
    rels = (
        f'<?xml version="1.0"?><Relationships {rns}>'
        '<Relationship Id="rId1" Type="x" Target="worksheets/sheet2.xml"/>'
        '<Relationship Id="rId2" Type="x" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    # the FIRST tab lives in sheet2.xml; its data row uses r-less cells
    main = (
        f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>a</t></is></c>'
        '<c r="B1" t="inlineStr"><is><t>b</t></is></c></row>'
        "<row><c><v>1</v></c><c><v>2</v></c></row>"
        "</sheetData></worksheet>"
    )
    decoy = (
        f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>wrong_sheet</t></is></c></row>'
        "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w") as z:
        # zip order deliberately lists the decoy (sheet1.xml) first
        z.writestr("xl/worksheets/sheet1.xml", decoy)
        z.writestr("xl/worksheets/sheet2.xml", main)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
    df = read_excel_fallback(spark, path)
    assert df is not None
    assert df.columns == ["a", "b"]
    assert [tuple(r) for r in df.collect()] == [("1", "2")]
