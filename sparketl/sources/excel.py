"""Excel source (SRC-01 — SURVEY §2.1, tool:555-577/782-804).

The reference opens a workbook with pandas.ExcelFile, lists sheets,
and parses one sheet with inferred dtypes. Two paths here:

- ``read_excel``: driver-side pandas parse → ``spark.createDataFrame``
  (Arrow). Right for the reference's use case (one spreadsheet).
- ``read_excel_many``: the scale path — ``binaryFile`` scan +
  ``mapInPandas`` parses many workbooks in parallel across executors.

Both require openpyxl/xlrd, which this container lacks → gated behind
an import-try with a clear error; tests exercise the mapping/cast
pipeline through createDataFrame instead (the pipeline is
source-agnostic).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

EXCEL_EXTENSIONS = (".xlsx", ".xls", ".xlsm")  # tool:557


class ExcelNotAvailable(ImportError):
    pass


def _pandas_excel():
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:
        raise ExcelNotAvailable(
            "Excel ingest requires openpyxl (not installed in this image); "
            "use CSV/parquet sources or install openpyxl"
        ) from e
    import pandas as pd

    return pd


def list_sheets(path: str) -> list[str]:
    """tool:562 — enumerate workbook sheets."""
    pd = _pandas_excel()
    return pd.ExcelFile(path).sheet_names


def read_excel(spark: SparkSession, path: str, sheet: str | int = 0) -> DataFrame:
    """tool:572 — parse one sheet, inferred schema, as a DataFrame."""
    pd = _pandas_excel()
    pdf = pd.ExcelFile(path).parse(sheet)
    return spark.createDataFrame(pdf)


def read_excel_many(
    spark: SparkSession, glob_path: str, sheet: str | int = 0
) -> DataFrame:
    """Scale path: parse many workbooks in parallel. Each executor
    parses whole files from Arrow-delivered binary content."""
    _pandas_excel()  # fail fast on the driver if the codec is missing
    binaries = spark.read.format("binaryFile").load(glob_path)

    def parse(batches: Iterator, /):
        import io

        import pandas as pd

        for pdf in batches:
            for _, row in pdf.iterrows():
                parsed = pd.ExcelFile(io.BytesIO(row["content"])).parse(sheet)
                parsed.insert(0, "_source_file", row["path"])
                yield parsed

    sample = binaries.limit(1).collect()
    if not sample:
        raise FileNotFoundError(glob_path)
    import io as _io

    import pandas as _pd

    head = _pd.ExcelFile(_io.BytesIO(sample[0]["content"])).parse(sheet)
    head.insert(0, "_source_file", "")
    schema = spark.createDataFrame(head.head(0)).schema
    return binaries.select("path", "content").mapInPandas(parse, schema=schema)
