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
images without openpyxl. Legacy binary .xls (BIFF8 inside an OLE2
compound file, the format the reference's file filter accepts at
tool:557) gets the same treatment since r11: pandas+xlrd when
installed, else a built-in minimal reader — a CFB container walk
(FAT + miniFAT chains) to the Workbook stream, then the common BIFF8
cell records (LABELSST/SST, LABEL, NUMBER, RK, MULRK, BOOLERR,
BLANK). Unsupported shapes (BIFF5, encrypted workbooks, SST
continuation records) raise a loud ``ExcelNotAvailable`` instead of
mis-parsing.
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


# ------------------------------------------------------- minimal .xls (BIFF8)

_OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE


def _have_xlrd() -> bool:
    try:
        import xlrd  # noqa: F401

        return True
    except ImportError:
        return False


def _cfb_chain(fat: list[int], start: int) -> list[int]:
    """Follow a FAT/miniFAT chain from *start* to ENDOFCHAIN."""
    chain, sid, seen = [], start, set()
    while sid not in (_ENDOFCHAIN, _FREESECT) and sid < len(fat):
        if sid in seen:
            raise ExcelNotAvailable("cyclic sector chain in .xls container")
        seen.add(sid)
        chain.append(sid)
        sid = fat[sid]
    return chain


def _cfb_stream(content: bytes, names: tuple[str, ...]) -> bytes:
    """Extract a named stream from an OLE2/CFB compound file — the
    container format of legacy .xls. Handles both regular-FAT streams
    and small streams stored in the root entry's mini stream
    (< mini cutoff, the common case for small workbooks)."""
    import struct

    if content[:8] != _OLE_MAGIC:
        raise ExcelNotAvailable("not an OLE2 compound file")
    sec_shift = struct.unpack_from("<H", content, 30)[0]
    mini_shift = struct.unpack_from("<H", content, 32)[0]
    sec, mini = 1 << sec_shift, 1 << mini_shift
    first_dir = struct.unpack_from("<I", content, 48)[0]
    mini_cutoff = struct.unpack_from("<I", content, 56)[0]
    first_minifat = struct.unpack_from("<I", content, 60)[0]
    n_minifat = struct.unpack_from("<I", content, 64)[0]
    n_difat = struct.unpack_from("<I", content, 72)[0]
    if n_difat:
        raise ExcelNotAvailable(
            ".xls container uses DIFAT overflow sectors (> 6.8 MB FAT) — "
            "install xlrd for large legacy workbooks"
        )
    difat = struct.unpack_from("<109I", content, 76)

    def sector(sid: int) -> bytes:
        off = (sid + 1) * sec
        return content[off : off + sec]

    fat: list[int] = []
    for sid in difat:
        if sid == _FREESECT:
            break
        fat.extend(struct.unpack(f"<{sec // 4}I", sector(sid)))

    dir_data = b"".join(sector(s) for s in _cfb_chain(fat, first_dir))
    entries = []
    for off in range(0, len(dir_data), 128):
        e = dir_data[off : off + 128]
        if len(e) < 128:
            break
        name_len = struct.unpack_from("<H", e, 64)[0]
        if name_len < 2:
            continue
        name = e[: name_len - 2].decode("utf-16-le")
        obj_type = e[66]
        start = struct.unpack_from("<I", e, 116)[0]
        size = struct.unpack_from("<Q", e, 120)[0]
        entries.append((name, obj_type, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    target = next((e for e in entries if e[1] == 2 and e[0] in names), None)
    if target is None:
        raise ExcelNotAvailable(
            f"no {'/'.join(names)} stream in the .xls container"
        )
    _, _, start, size = target
    if size >= mini_cutoff:
        data = b"".join(sector(s) for s in _cfb_chain(fat, start))
        return data[:size]
    # mini stream: root entry's regular-FAT stream sliced by miniFAT
    if root is None:
        raise ExcelNotAvailable(".xls container has no root entry")
    mini_data = b"".join(sector(s) for s in _cfb_chain(fat, root[2]))
    minifat: list[int] = []
    for sid in _cfb_chain(fat, first_minifat)[:n_minifat or None]:
        minifat.extend(struct.unpack(f"<{sec // 4}I", sector(sid)))
    out = b"".join(
        mini_data[sid * mini : (sid + 1) * mini]
        for sid in _cfb_chain(minifat, start)
    )
    return out[:size]


def _biff_records(stream: bytes, pos: int = 0):
    """Yield (opcode, payload, offset) BIFF records from *pos*."""
    import struct

    while pos + 4 <= len(stream):
        op, ln = struct.unpack_from("<HH", stream, pos)
        yield op, stream[pos + 4 : pos + 4 + ln], pos
        pos += 4 + ln


def _biff8_string(data: bytes, off: int, cch_bytes: int) -> tuple[str, int]:
    """Decode a BIFF8 XLUnicodeString at *off*; returns (text, next)."""
    import struct

    cch = (
        data[off]
        if cch_bytes == 1
        else struct.unpack_from("<H", data, off)[0]
    )
    off += cch_bytes
    grbit = data[off]
    off += 1
    if grbit & 0x08:  # rich-text runs
        n_runs = struct.unpack_from("<H", data, off)[0]
        off += 2
    else:
        n_runs = 0
    if grbit & 0x04:  # far-east ext
        ext = struct.unpack_from("<I", data, off)[0]
        off += 4
    else:
        ext = 0
    if grbit & 0x01:  # 16-bit chars
        text = data[off : off + 2 * cch].decode("utf-16-le")
        off += 2 * cch
    else:
        text = data[off : off + cch].decode("latin-1")
        off += cch
    return text, off + 4 * n_runs + ext


def _rk_number(rk: int):
    import struct

    if rk & 0x02:  # fInt: signed 30-bit integer in bits 2..31
        val = rk >> 2
        if rk & 0x80000000:
            val -= 1 << 30
    else:  # bits 2..31 are the top 30 bits of an IEEE double
        val = struct.unpack(
            "<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32)
        )[0]
    if rk & 0x01:  # fDiv100
        val = val / 100
    if isinstance(val, float) and val.is_integer():
        return int(val)
    return val


def _xls_globals(stream: bytes) -> tuple[list[tuple[str, int]], list[str]]:
    """Parse the workbook-globals substream: returns
    ([(sheet_name, substream_offset), ...], shared_string_table)."""
    import struct

    op0, payload0, _ = next(_biff_records(stream))
    if op0 != 0x0809 or struct.unpack_from("<H", payload0, 0)[0] < 0x0600:
        raise ExcelNotAvailable(
            "only BIFF8 .xls is supported by the built-in reader — "
            "install xlrd for BIFF5 and older workbooks"
        )
    sheets: list[tuple[str, int]] = []
    sst: list[str] = []
    for op, data, _off in _biff_records(stream):
        if op == 0x000A:  # EOF of the workbook-globals substream
            break
        if op == 0x0085:  # BOUNDSHEET
            pos = struct.unpack_from("<I", data, 0)[0]
            name, _ = _biff8_string(data, 6, 1)
            sheets.append((name, pos))
        elif op == 0x002F:  # FILEPASS — encrypted
            raise ExcelNotAvailable("encrypted .xls is not supported")
        elif op == 0x00FC:  # SST
            n_unique = struct.unpack_from("<I", data, 4)[0]
            off = 8
            for _ in range(n_unique):
                if off >= len(data):
                    raise ExcelNotAvailable(
                        ".xls SST spans CONTINUE records — install xlrd "
                        "for workbooks with large shared-string tables"
                    )
                s, off = _biff8_string(data, off, 2)
                sst.append(s)
    if not sheets:
        raise ExcelNotAvailable("no BOUNDSHEET records in .xls workbook")
    return sheets, sst


def _parse_xls_minimal(content: bytes, sheet: str | int = 0):
    """Parse one sheet of a legacy BIFF8 .xls from bytes into a pandas
    DataFrame (first row = header, like pandas.ExcelFile.parse)."""
    import struct

    import pandas as pd

    stream = _cfb_stream(content, ("Workbook", "Book"))
    sheets, sst = _xls_globals(stream)
    if isinstance(sheet, int):
        _name, start = sheets[sheet]
    else:
        match = [s for s in sheets if s[0] == sheet]
        if not match:
            raise KeyError(f"sheet '{sheet}' not in workbook")
        _name, start = match[0]

    rows: dict[int, dict[int, object]] = {}

    def put(rw: int, col: int, val) -> None:
        rows.setdefault(rw, {})[col] = val

    it = _biff_records(stream, start)
    op, _, _ = next(it)
    if op != 0x0809:
        raise ExcelNotAvailable("BOUNDSHEET position is not a BOF record")
    for op, data, _off in it:
        if op == 0x000A:  # EOF of this sheet substream
            break
        if op == 0x00FD:  # LABELSST
            rw, col, _ixfe, isst = struct.unpack_from("<HHHI", data, 0)
            put(rw, col, sst[isst])
        elif op == 0x0203:  # NUMBER
            rw, col, _ixfe = struct.unpack_from("<HHH", data, 0)
            num = struct.unpack_from("<d", data, 6)[0]
            put(rw, col, int(num) if num.is_integer() else num)
        elif op == 0x027E:  # RK
            rw, col, _ixfe, rk = struct.unpack_from("<HHHI", data, 0)
            put(rw, col, _rk_number(rk))
        elif op == 0x00BD:  # MULRK
            rw, col_first = struct.unpack_from("<HH", data, 0)
            n = (len(data) - 6) // 6
            for i in range(n):
                rk = struct.unpack_from("<I", data, 4 + 6 * i + 2)[0]
                put(rw, col_first + i, _rk_number(rk))
        elif op == 0x0204:  # LABEL (inline string)
            rw, col, _ixfe = struct.unpack_from("<HHH", data, 0)
            put(rw, col, _biff8_string(data, 6, 2)[0])
        elif op == 0x0205:  # BOOLERR
            rw, col, _ixfe, b, is_err = struct.unpack_from("<HHHBB", data, 0)
            put(rw, col, None if is_err else bool(b))
    if not rows:
        return pd.DataFrame()
    width = max(max(c) for c in rows.values() if c) + 1
    n_rows = max(rows) + 1
    grid = [[rows.get(i, {}).get(j) for j in range(width)] for i in range(n_rows)]
    header = [
        str(h) if h is not None else f"col{j}" for j, h in enumerate(grid[0])
    ]
    return pd.DataFrame(grid[1:], columns=header).infer_objects()


def parse_workbook(content: bytes, sheet: str | int = 0):
    """Bytes → pandas DataFrame: pandas with the right codec when
    present, else the built-in minimal reader for the detected format
    (zip magic → .xlsx, OLE2 magic → BIFF8 .xls). Shared by driver and
    executor paths."""
    if content[:8] == _OLE_MAGIC:
        if _have_xlrd():
            import pandas as pd

            return pd.ExcelFile(io.BytesIO(content)).parse(sheet)
        return _parse_xls_minimal(content, sheet)
    if _have_openpyxl():
        import pandas as pd

        return pd.ExcelFile(io.BytesIO(content)).parse(sheet)
    return _parse_xlsx_minimal(content, sheet)


# ------------------------------------------------------------------- public


def list_sheets(path: str) -> list[str]:
    """tool:562 — enumerate workbook sheets (.xlsx/.xlsm or BIFF8 .xls)."""
    with open(path, "rb") as f:
        content = f.read()
    if content[:8] == _OLE_MAGIC:
        if _have_xlrd():
            import pandas as pd

            return pd.ExcelFile(path).sheet_names
        sheets, _ = _xls_globals(_cfb_stream(content, ("Workbook", "Book")))
        return [name for name, _pos in sheets]
    if _have_openpyxl():
        import pandas as pd

        return pd.ExcelFile(path).sheet_names
    with zipfile.ZipFile(io.BytesIO(content)) as zf:
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
