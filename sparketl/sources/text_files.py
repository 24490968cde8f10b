"""Delimited / JSON-lines sources (beyond the reference's Excel-only
surface — a training-data pipeline ingests CSV and JSONL at scale).

Unlike the Excel path (driver-side pandas, library-gated), these are
pure ``spark.read`` connectors: schema-on-read, splittable, and
distributed from the first byte. They feed the same
mapping/normalize/cast/append pipeline as Excel (``sparketl.ingest``),
so every semantics test there applies to all three sources.

Scale notes:
- explicit ``schema`` skips the inference pass (a full extra scan) —
  always pass one in production; inference is the interactive default
  to mirror the reference's pandas dtype inference (tool:572).
- ``multiLine=False`` JSONL stays line-splittable (a 1 TB file still
  parallelizes by HDFS block); multiline JSON arrays do not.
- ``columnNameOfCorruptRecord`` preserves bad rows for the PERMISSIVE
  path instead of silently dropping them; ``mode=FAILFAST`` gives the
  reference's abort-on-first-bad-row semantics (tool:259-261).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    delimiter: str = ",",
    fail_fast: bool = False,
) -> DataFrame:
    """CSV scan: inferred schema by default (reference parity with the
    pandas parse), explicit schema for the no-extra-scan scale path."""
    reader = (
        spark.read.option("header", header)
        .option("sep", delimiter)
        .option("mode", "FAILFAST" if fail_fast else "PERMISSIVE")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    fail_fast: bool = False,
) -> DataFrame:
    """JSON-lines scan (one object per line → block-splittable)."""
    reader = spark.read.option("mode", "FAILFAST" if fail_fast else "PERMISSIVE")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def corrupt_records(df: DataFrame) -> DataFrame:
    """Rows the PERMISSIVE parser could not fully parse (requires the
    scan to have been built with a schema containing CORRUPT_COL)."""
    if CORRUPT_COL not in df.columns:
        raise ValueError(
            f"scan has no {CORRUPT_COL} column — pass a schema including it"
        )
    return df.where(df[CORRUPT_COL].isNotNull())


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned parquet sink — the lake-layout writer: one
    directory per partition value enables static + dynamic partition
    pruning on every downstream read. ``maxRecordsPerFile`` caps file
    size so a skewed partition cannot produce an unsplittable giant."""
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_by).parquet(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """ORC scan — Spark-native columnar source (vectorized reader,
    predicate pushdown and column pruning like parquet; the format a
    Hive-era warehouse hands you). Explicit schema skips footer
    merging across many files."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """ORC sink, optionally hive-partitioned (directory keys prune
    scans the same way as the parquet sink in write_partitioned)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
