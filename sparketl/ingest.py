"""Ingest pipeline: mapping → null-normalize → validate → cast → append.

Reproduces the reference's import/update flow semantics (SURVEY §3.2):

- column mapping with drop-sentinel (tool:591-614, "Do not import")
- ``pd.isnull → None`` null normalization (tool:648-649)
- all-NULL batch rejection (VAL-01, tool:652-654)
- empty-mapping / empty-batch guards (VAL-02, tool:633-635)
- cast to the target schema with abort-on-error parity: the reference
  lets SQL Server reject a bad row and aborts the whole batch
  (tool:259-261); here a cast that would corrupt data (non-null in,
  null out) fails the job before anything commits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparketl.operators.relational import apply_column_mapping, normalize_nulls
from sparketl.tables import ManagedTable

DROP_SENTINELS = {"Do not import", "Do not map"}  # tool:591, 818


class IngestError(Exception):
    pass


def clean_mapping(raw_mapping: dict[str, str]) -> dict[str, str]:
    """Drop sentinel entries (tool:630, 857)."""
    return {s: d for s, d in raw_mapping.items() if d not in DROP_SENTINELS}


def validate_batch(df: DataFrame, mapping: dict[str, str]) -> None:
    if not mapping:
        raise IngestError("No columns mapped")  # tool:633-635
    if df.na.drop(how="all").isEmpty():
        raise IngestError("All records are NULL")  # VAL-01, tool:652-654


def cast_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Cast each mapped column to the target type; fail the batch if a
    cast silently nulls a non-null value (abort parity, tool:259-261)."""
    missing = [f.name for f in target.fields if f.name not in df.columns]
    if missing:
        raise IngestError(f"mapped batch lacks target columns: {missing}")
    casted = df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in target.fields]
    )
    checks = [
        F.sum(
            F.when(
                F.col(f.name).isNotNull() & F.col(f.name).cast(f.dataType).isNull(), 1
            ).otherwise(0)
        ).alias(f.name)
        for f in target.fields
    ]
    bad = df.select(checks).collect()[0].asDict()
    offenders = {c: n for c, n in bad.items() if n}
    if offenders:
        raise IngestError(f"cast would corrupt values (col: bad-row count): {offenders}")
    return casted


def _tracked(table: ManagedTable, progress, description: str):
    """Progress scope for the write action (SURVEY §7.2): the reference
    reports per-row progress (tool:257-258, 302-303); Spark's unit of
    observable work is the task, so ``progress`` receives task-level
    ProgressEvents instead — see :mod:`sparketl.progress`."""
    from contextlib import nullcontext

    if progress is None:
        return nullcontext()
    from sparketl.progress import ProgressReporter

    return ProgressReporter(table.spark, progress).track(description)


def ingest_append(
    table: ManagedTable,
    source: DataFrame,
    raw_mapping: dict[str, str],
    progress=None,
) -> int:
    """The full import path (SURVEY §3.2): returns the new version.
    ``progress``: optional callback receiving task-level
    :class:`~sparketl.progress.ProgressEvent`s during the write."""
    mapping = clean_mapping(raw_mapping)
    if not mapping:
        raise IngestError("No columns mapped")
    mapped = normalize_nulls(apply_column_mapping(source, mapping))
    validate_batch(mapped, mapping)
    target_fields = [f for f in table.schema().fields if f.name in mapped.columns]
    casted = cast_to_schema(mapped, T.StructType(target_fields))
    # unmapped target columns arrive as NULL (the reference only inserts
    # mapped columns; the server fills the rest with defaults/NULL)
    full = casted
    for f in table.schema().fields:
        if f.name not in casted.columns:
            full = full.withColumn(f.name, F.lit(None).cast(f.dataType))
    with _tracked(table, progress, "ingest_append"):
        return table.append(full.select([f.name for f in table.schema().fields]))


def ingest_update(
    table: ManagedTable,
    source: DataFrame,
    raw_mapping: dict[str, str],
    identifier: str,
    progress=None,
) -> int:
    """The keyed-update path (SURVEY §3.3): identifier must be among
    the mapped targets (tool:864-867). ``progress``: optional callback
    receiving task-level ProgressEvents during the write."""
    mapping = clean_mapping(raw_mapping)
    if identifier not in mapping.values():
        raise IngestError(
            f"identifier '{identifier}' is not a mapped column"
        )  # tool:864-867
    mapped = normalize_nulls(apply_column_mapping(source, mapping))
    validate_batch(mapped, mapping)
    target_fields = [f for f in table.schema().fields if f.name in mapped.columns]
    casted = cast_to_schema(mapped, T.StructType(target_fields))
    set_cols = [c for c in casted.columns if c != identifier]
    with _tracked(table, progress, "ingest_update"):
        return table.keyed_update(casted, identifier, set_cols)


def observed_append(
    table: ManagedTable,
    source: DataFrame,
    raw_mapping: dict[str, str],
    progress=None,
) -> tuple[int, dict]:
    """``ingest_append`` with in-flight data-quality counters via
    Spark's ``Observation`` API: row count and null-cell totals of the
    rows AS WRITTEN accumulate during the write job itself — zero
    extra scans, unlike a separate audit query which would read the
    batch twice (the difference between 1× and 2× input cost on a
    100 TB ingest). Returns ``(new_version, metrics)``.

    Placement subtlety: ``Observation.get`` keeps the FIRST action's
    metrics, and the validation step runs a ``limit(1)``-style scan —
    so the observe node attaches to the final written frame, after
    validation, where the append write is the first (and only) action
    through it. The reference logs only a row count after import
    (tool:668-672); this is the engine-side upgrade.
    """
    from pyspark.sql import Observation

    mapping = clean_mapping(raw_mapping)
    if not mapping:
        raise IngestError("No columns mapped")
    mapped = normalize_nulls(apply_column_mapping(source, mapping))
    validate_batch(mapped, mapping)
    target_fields = [f for f in table.schema().fields if f.name in mapped.columns]
    casted = cast_to_schema(mapped, T.StructType(target_fields))
    full = casted
    for f in table.schema().fields:
        if f.name not in casted.columns:
            full = full.withColumn(f.name, F.lit(None).cast(f.dataType))
    sel = full.select([f.name for f in table.schema().fields])

    cols = [F.col(c) for c in sel.columns]
    null_cells = sum((c.isNull().cast("long") for c in cols), F.lit(0))
    obs = Observation("ingest_quality")
    observed = sel.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(null_cells).alias("n_null_cells"),
        F.max(null_cells).alias("max_null_cells_in_row"),
    )
    with _tracked(table, progress, "observed_append"):
        v = table.append(observed)
    return v, dict(obs.get)
