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
