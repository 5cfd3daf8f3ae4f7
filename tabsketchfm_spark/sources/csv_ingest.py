"""Robust CSV ingestion with the reference's sanitation + typing rules.

Re-designs S1-S6 (reference data_prep.py:51-125, SURVEY §2.1/§2.2):
malformed-line tolerance, separator sniffing, transparent compression,
metadata sidecars, column-name sanitation (P1), synthetic-column drop
(P2), ''→NULL (P3), and the 4-type system with the all-values-parse
date upgrade (§1.2, data_prep.py:87-112).

Spark-first: `spark.read.csv` with DROPMALFORMED + inferSchema does
the heavy lifting; the only driver-side work is a one-file separator/
encoding sniff (bounded bytes, never the data path). The reference's
10k-row cap becomes an explicit optional ``sample_rows`` (T6) rather
than a silent default — full-table semantics are the engine default.
"""

from __future__ import annotations

import bz2
import csv as _csv
import gzip
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def sniff_separator(path: str, n_bytes: int = 8192) -> str:
    """Driver-side separator sniff of the first file bytes (S1's
    ``sep=None`` python-engine fallback, data_prep.py:66-77)."""
    if path.endswith(".bz2"):
        opener = bz2.open
    elif path.endswith(".gz"):
        opener = gzip.open
    else:
        opener = open
    try:
        with opener(path, "rt", encoding="utf-8", errors="replace") as f:
            sample = f.read(n_bytes)
        return _csv.Sniffer().sniff(sample, delimiters=",;\t|").delimiter
    except Exception:
        return ","


def detect_encoding(path: str, n_bytes: int = 65536) -> str:
    """S4 (reference get_encoding, data_prep.py:114-117 — chardet).
    chardet isn't in this environment; the fallback heuristic covers
    the common cases: BOM sniff, strict-UTF-8 probe, else latin-1
    (which never fails to decode)."""
    try:
        import chardet  # type: ignore

        with open(path, "rb") as f:
            raw = f.read(n_bytes)
        got = chardet.detect(raw).get("encoding")
        if got:
            return got
    except ImportError:
        pass
    with open(path, "rb") as f:
        raw = f.read(n_bytes)
    if raw.startswith(b"\xef\xbb\xbf"):
        return "UTF-8"
    if raw.startswith((b"\xff\xfe", b"\xfe\xff")):
        return "UTF-16"
    try:
        raw.decode("utf-8")
        return "UTF-8"
    except UnicodeDecodeError:
        return "ISO-8859-1"


def _read_xlsx_rows(path: str) -> list[list[str | None]]:
    """Minimal native .xlsx reader — an xlsx is a zip of XML, so the
    stdlib (zipfile + ElementTree) suffices for the plain tabular
    sheets the reference's Excel fallback targets: sheet1 cells with
    inline/shared strings and numbers. Supports the sharedStrings
    table, cell types s/str/inlineStr/n/b, and sparse rows (missing
    cells become None by column-reference decoding)."""
    import re
    import zipfile
    import xml.etree.ElementTree as ET

    NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{NS}t")))
        sheet = _first_sheet_path(z, NS)
        root = ET.fromstring(z.read(sheet))
    rows: list[list[str | None]] = []
    for row in root.iter(f"{NS}row"):
        cells: dict[int, str | None] = {}
        next_col = 0  # implied position for cells without an r attribute
        for c in row.findall(f"{NS}c"):
            ref = c.get("r", "")
            col = 0
            for ch in ref:
                if ch.isalpha():
                    col = col * 26 + (ord(ch.upper()) - 64)
                else:
                    break
            # the r attribute is optional in OOXML — position is then
            # implied as one past the previous cell in the row
            if col == 0:
                col = next_col + 1
            next_col = col
            ctype = c.get("t", "n")
            if ctype == "inlineStr":
                v = "".join(t.text or "" for t in c.iter(f"{NS}t"))
            else:
                ve = c.find(f"{NS}v")
                v = ve.text if ve is not None else None
                if ctype == "s" and v is not None:
                    v = shared[int(v)]
            cells[col - 1] = v
        width = max(cells) + 1 if cells else 0
        rows.append([cells.get(i) for i in range(width)])
    width = max((len(r) for r in rows), default=0)
    return [r + [None] * (width - len(r)) for r in rows]


def _first_sheet_path(z, NS: str) -> str:
    """Resolve the workbook's FIRST sheet (tab order), not whatever
    xl/worksheets/sheetN.xml happens to come first in the zip
    directory: xl/workbook.xml lists sheets in order with r:id refs
    that xl/_rels/workbook.xml.rels maps to worksheet targets. Falls
    back to the lowest sheet number when either part is missing."""
    import re
    import xml.etree.ElementTree as ET

    R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
    try:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        RNS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
        targets = {
            rel.get("Id"): rel.get("Target", "") for rel in rels.iter(f"{RNS}Relationship")
        }
        first = next(iter(wb.iter(f"{NS}sheet")))
        target = targets[first.get(f"{R}id")]
        if target.startswith("/"):
            return target.lstrip("/")
        return "xl/" + target
    except Exception:
        sheets = sorted(
            (n for n in z.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
            key=lambda n: int(re.search(r"(\d+)", n).group(1)),
        )
        return sheets[0]


def read_excel_fallback(spark: SparkSession, path: str) -> DataFrame | None:
    """S3 (reference data_prep.py:78): Excel ingestion when CSV parsing
    fails. Tries pandas' reader first (openpyxl/xlrd when available),
    then the stdlib zip+XML parser above — so the path works even in
    environments with no Excel engine installed. Driver-side by
    design: spreadsheets are human-authored small files, not lake
    tables; the frame enters Spark via createDataFrame. Returns None
    only when the file is genuinely unreadable."""
    try:
        import pandas as pd

        pdf = pd.read_excel(path)
        return sanitize_columns(spark.createDataFrame(pdf))
    except Exception:
        pass
    try:
        rows = _read_xlsx_rows(path)
    except Exception:
        return None
    if not rows:
        return None
    header = [str(h) if h is not None else f"col_{i}" for i, h in enumerate(rows[0])]
    df = spark.createDataFrame(
        [tuple(r) for r in rows[1:]],
        schema=", ".join(f"`{h}` string" for h in header),
    )
    return sanitize_columns(df)


def sanitize_name(name: str) -> str:
    """P1 (data_prep.py:119-125): strip quotes/whitespace, drop
    newlines and commas, lowercase."""
    return (
        name.strip().strip("'\"").strip().replace("\n", "").replace(",", "").lower()
    )


def read_csv_robust(
    spark: SparkSession,
    path: str,
    sep: str | None = None,
    encoding: str = "UTF-8",
    sample_rows: int | None = None,
) -> DataFrame:
    """S1/S2: tolerant CSV scan. Bad lines dropped (DROPMALFORMED =
    the reference's on_bad_lines='skip'), schema inferred, .gz/.bz2
    transparent. ``sample_rows`` reproduces the reference's NROWS cap
    as an explicit limit (T6)."""
    if sep is None:
        first = path
        if os.path.isdir(path):
            csvs = [p for p in sorted(os.listdir(path)) if ".csv" in p]
            first = os.path.join(path, csvs[0]) if csvs else path
        sep = sniff_separator(first)
    df = (
        spark.read.options(
            header=True,
            inferSchema=True,
            mode="DROPMALFORMED",
            sep=sep,
            encoding=encoding,
            multiLine=False,
        ).csv(path)
    )
    df = sanitize_columns(df)
    if sample_rows is not None:
        df = df.limit(sample_rows)
    return df


def sanitize_columns(df: DataFrame) -> DataFrame:
    """P1 + P2: sanitized, de-duplicated column names; synthetic
    ``row_index`` dropped (data_prep.py:80)."""
    seen: dict[str, int] = {}
    cols = []
    for c in df.columns:
        name = sanitize_name(c)
        if name in seen:
            seen[name] += 1
            name = f"{name}_{seen[name]}"
        else:
            seen[name] = 0
        cols.append(F.col(f"`{c}`").alias(name))
    out = df.select(*cols)
    if "row_index" in out.columns:
        out = out.drop("row_index")
    return out


def normalize_empty_strings(df: DataFrame) -> DataFrame:
    """P3 (data_prep.py:202): '' → NULL on every string column."""
    reps = {
        c: F.nullif(F.col(c), F.lit("")) for c, t in df.dtypes if t == "string"
    }
    return df.withColumns(reps) if reps else df


def upgrade_date_columns(df: DataFrame, min_parse_frac: float = 1.0) -> DataFrame:
    """§1.2 date upgrade (data_prep.py:92-98): for each string column
    where ALL non-null values parse as dates/timestamps, add a derived
    ``<col>_date`` timestamp column. One aggregation pass decides all
    columns; parsing stays JVM-side (``try_to_timestamp`` over a small
    set of formats, mirroring dateutil's common cases)."""
    FORMATS = ["yyyy-MM-dd", "yyyy/MM/dd", "MM/dd/yyyy", "yyyy-MM-dd HH:mm:ss"]

    def parse_expr(c: str):
        e = F.try_to_timestamp(F.col(c))
        for fmt in FORMATS:
            e = F.coalesce(e, F.try_to_timestamp(F.col(c), F.lit(fmt)))
        return e

    str_cols = [c for c, t in df.dtypes if t == "string"]
    if not str_cols:
        return df
    checks = df.agg(
        *[
            (
                F.count(F.when(parse_expr(c).isNotNull(), 1))
                / F.greatest(F.count(F.when(F.col(c).isNotNull(), 1)), F.lit(1))
            ).alias(c)
            for c in str_cols
        ]
    ).first()
    out = df
    for c in str_cols:
        if checks[c] is not None and checks[c] >= min_parse_frac:
            nonnull = df.where(F.col(c).isNotNull()).limit(1).count()
            if nonnull:
                out = out.withColumn(f"{c}_date", parse_expr(c))
    return out


def logical_types(df: DataFrame) -> dict[str, str]:
    """The 4-type view of a frame (data_prep.py:45-49)."""
    from tabsketchfm_spark.operators.profile import spark_logical_type

    return {c: spark_logical_type(t) for c, t in df.dtypes}


def read_metadata_sidecars(spark: SparkSession, meta_dir: str) -> DataFrame:
    """S5 (data_prep.py:53-58): one row per ``.meta`` JSON sidecar with
    its table file name attached."""
    df = spark.read.option("recursiveFileLookup", "true").json(
        os.path.join(meta_dir, "*.meta")
    )
    return df.withColumn(
        "file_name",
        F.regexp_replace(
            F.element_at(F.split(F.input_file_name(), "/"), -1), r"\.meta$", ""
        ),
    )


def ingest_directory(
    spark: SparkSession,
    input_dir: str,
    sample_rows: int | None = None,
    min_rows: int = 5,
) -> dict[str, DataFrame]:
    """S6 (batch_fastdata_opendata.py:5-23): every CSV under a
    directory → sanitized, typed DataFrame; tables with fewer than
    ``min_rows`` rows are skipped (P5, data_prep.py:139-141)."""
    out: dict[str, DataFrame] = {}
    for root, _dirs, files in os.walk(input_dir):
        for fn in sorted(files):
            if ".csv" not in fn:
                continue
            path = os.path.join(root, fn)
            df = read_csv_robust(spark, path, sample_rows=sample_rows)
            df = normalize_empty_strings(df)
            df = upgrade_date_columns(df)
            if df.limit(min_rows).count() < min_rows:
                continue
            out[fn.split(".csv")[0]] = df
    return out


def read_jsonl_robust(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    sample_rows: int | None = None,
) -> DataFrame:
    """Robust JSON-lines ingestion — the de-facto interchange format of
    training-data pipelines (one document object per line). PERMISSIVE
    mode with a ``_corrupt_json`` capture column: malformed lines land
    there instead of failing the scan or being silently dropped, so a
    curation pipeline can count/route them (the same
    never-lose-a-record posture as the CSV path). Schema is inferred
    from the data unless given explicitly — at 100 TB pass ``schema``
    to skip the inference scan. Multiline objects are out of scope by
    design (JSONL contract: newline-delimited)."""
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_json")
    )
    if schema is not None:
        df = reader.schema(f"{schema}, _corrupt_json string").json(path)
    else:
        df = reader.json(path)
        if "_corrupt_json" not in df.columns:
            df = df.withColumn("_corrupt_json", F.lit(None).cast("string"))
        # Spark requires caching/re-reading to SELECT only the corrupt
        # column; keeping it alongside data columns (as here) is the
        # supported access pattern.
    df = sanitize_columns(df.select(*[c for c in df.columns if c != "_corrupt_json"], "_corrupt_json"))
    if sample_rows:
        df = df.limit(sample_rows)
    return df
