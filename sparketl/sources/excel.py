"""Excel source (SRC-01 — SURVEY §2.1, tool:555-577/782-804).

The reference opens a workbook with pandas.ExcelFile, lists sheets,
and parses one sheet with inferred dtypes. Two paths here:

- ``read_excel``: driver-side parse → ``spark.createDataFrame``
  (Arrow). Right for the reference's use case (one spreadsheet).
- ``read_excel_many``: the scale path — ``binaryFile`` scan +
  ``mapInPandas`` parses many workbooks in parallel across executors.

Parsing uses pandas+openpyxl when available; otherwise a built-in
minimal .xlsx reader (xlsx is zipped XML — zipfile + ElementTree, no
third-party codec) handles the standard sharedStrings/inline-string/
numeric/boolean cell types, so the source works end-to-end even in
images without openpyxl. Legacy .xls/.xlsm still require the codec.
"""

from __future__ import annotations

import io
import re
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

EXCEL_EXTENSIONS = (".xlsx", ".xls", ".xlsm")  # tool:557

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_NS_PKG = "{http://schemas.openxmlformats.org/package/2006/relationships}"


class ExcelNotAvailable(ImportError):
    pass


def _have_openpyxl() -> bool:
    try:
        import openpyxl  # noqa: F401

        return True
    except ImportError:
        return False


# ---------------------------------------------------------------- minimal xlsx


def _col_index(ref: str) -> int:
    """'C7' → 2 (zero-based column index from the A1-style reference)."""
    letters = re.match(r"[A-Z]+", ref)
    idx = 0
    for ch in letters.group() if letters else "A":
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out = []
    for si in root.findall(f"{_NS}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _sheet_targets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """Workbook sheet order: [(sheet_name, zip path of its XML), ...]."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        rel.get("Id"): rel.get("Target")
        for rel in rels.findall(f"{_NS_PKG}Relationship")
    }
    out = []
    for sheet in wb.find(f"{_NS}sheets").findall(f"{_NS}sheet"):
        target = rid_to_target[sheet.get(f"{_NS_REL}id")]
        if not target.startswith("xl/"):
            target = "xl/" + target.lstrip("/")
        out.append((sheet.get("name"), target))
    return out


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        return "".join(tt.text or "" for tt in is_el.iter(f"{_NS}t")) if is_el is not None else None
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text == "1"
    if t == "str":
        return v.text
    num = float(v.text)
    return int(num) if num.is_integer() else num


def _parse_xlsx_minimal(content: bytes, sheet: str | int = 0):
    """Parse one sheet of an .xlsx from bytes into a pandas DataFrame
    (first row = header, like pandas.ExcelFile.parse's default)."""
    import pandas as pd

    with zipfile.ZipFile(io.BytesIO(content)) as zf:
        sheets = _sheet_targets(zf)
        if isinstance(sheet, int):
            name, target = sheets[sheet]
        else:
            match = [s for s in sheets if s[0] == sheet]
            if not match:
                raise KeyError(f"sheet '{sheet}' not in workbook")
            name, target = match[0]
        shared = _shared_strings(zf)
        root = ET.fromstring(zf.read(target))
        rows: list[dict[int, object]] = []
        for row in root.iter(f"{_NS}row"):
            cells: dict[int, object] = {}
            for j, c in enumerate(row.findall(f"{_NS}c")):
                ref = c.get("r")
                cells[_col_index(ref) if ref else j] = _cell_value(c, shared)
            rows.append(cells)
    if not rows:
        return pd.DataFrame()
    width = max(max(r) for r in rows if r) + 1
    grid = [[r.get(j) for j in range(width)] for r in rows]
    header = [str(h) if h is not None else f"col{j}" for j, h in enumerate(grid[0])]
    return pd.DataFrame(grid[1:], columns=header).infer_objects()


def parse_workbook(content: bytes, sheet: str | int = 0):
    """Bytes → pandas DataFrame: openpyxl when present, else the
    built-in minimal .xlsx reader. Shared by driver and executor paths."""
    if _have_openpyxl():
        import pandas as pd

        return pd.ExcelFile(io.BytesIO(content)).parse(sheet)
    return _parse_xlsx_minimal(content, sheet)


# ------------------------------------------------------------------- public


def list_sheets(path: str) -> list[str]:
    """tool:562 — enumerate workbook sheets."""
    if _have_openpyxl():
        import pandas as pd

        return pd.ExcelFile(path).sheet_names
    with open(path, "rb") as f:
        with zipfile.ZipFile(f) as zf:
            return [name for name, _ in _sheet_targets(zf)]


def read_excel(spark: SparkSession, path: str, sheet: str | int = 0) -> DataFrame:
    """tool:572 — parse one sheet, inferred schema, as a DataFrame."""
    with open(path, "rb") as f:
        pdf = parse_workbook(f.read(), sheet)
    return spark.createDataFrame(pdf)


def read_excel_many(
    spark: SparkSession, glob_path: str, sheet: str | int = 0
) -> DataFrame:
    """Scale path: parse many workbooks in parallel. Each executor
    parses whole files from Arrow-delivered binary content."""
    binaries = spark.read.format("binaryFile").load(glob_path)

    def parse(batches: Iterator, /):
        from sparketl.sources.excel import parse_workbook as pw

        for pdf in batches:
            for _, row in pdf.iterrows():
                parsed = pw(bytes(row["content"]), sheet)
                parsed.insert(0, "_source_file", row["path"])
                yield parsed

    sample = binaries.limit(1).collect()
    if not sample:
        raise FileNotFoundError(glob_path)
    head = parse_workbook(bytes(sample[0]["content"]), sheet)
    head.insert(0, "_source_file", "")
    schema = spark.createDataFrame(head).schema
    return binaries.select("path", "content").mapInPandas(parse, schema=schema)
