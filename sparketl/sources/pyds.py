"""Custom Python DataSource connector (PySpark 4 DataSource V2 API).

The reference tool's extensibility story is "type SQL at the server"
(SQL_DATA_INTEGRATION_TOOL.py:273); the Spark-native equivalent of a
bespoke connector is the Python DataSource API — this module ships a
real one (``sparketl_jsonl``: partitioned newline-delimited JSON, the
interchange format LLM training corpora actually ship in) both as a
useful source and as the documented template for attaching any format
or system Spark lacks a reader for.

Scale shape: one :class:`InputPartition` per file — the same
parallelism unit as Spark's built-in file sources, so a million-file
corpus fans out across executors with no driver bottleneck beyond the
file listing (at real scale the listing itself comes from the
catalog/manifest, as ManagedTable does). Parsing is stdlib ``json``
per line inside the executor; projection happens at parse time (only
schema fields are extracted), so adding columns to the files never
costs the reader anything.

Engine-exactness: values pass through as parsed (int/float/str/bool);
missing keys and JSON nulls surface as SQL NULLs; field order follows
the user schema, never the JSON key order.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _JsonlReader(DataSourceReader):
    def __init__(self, options, schema):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("sparketl_jsonl requires a 'path' option")
        self._fields = [f.name for f in schema.fields]

    def partitions(self):
        if os.path.isdir(self._path):
            files = sorted(
                os.path.join(self._path, f)
                for f in os.listdir(self._path)
                if f.endswith((".jsonl", ".json", ".txt"))
            )
        else:
            files = [self._path]
        return [_FilePartition(p) for p in files]

    def read(self, partition):
        fields = self._fields
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                yield tuple(rec.get(k) for k in fields)


class JsonlDataSource(DataSource):
    """``spark.read.format("sparketl_jsonl").schema(...).option("path",
    dir).load()`` — register once per session via :func:`register`."""

    @classmethod
    def name(cls) -> str:
        return "sparketl_jsonl"

    def schema(self):
        # schema inference: first non-empty line of the first file
        # (documented convenience — production readers pass .schema())
        reader = _JsonlReader(self.options, type("S", (), {"fields": []})())
        first = reader.partitions()[0]
        with open(first.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                parts = []
                for k, v in rec.items():
                    if isinstance(v, bool):
                        t = "boolean"
                    elif isinstance(v, int):
                        t = "bigint"
                    elif isinstance(v, float):
                        t = "double"
                    else:
                        t = "string"
                    parts.append(f"{k} {t}")
                return ", ".join(parts)
        raise ValueError(f"no records in {first.path} to infer a schema from")

    def reader(self, schema):
        return _JsonlReader(self.options, schema)

    def streamReader(self, schema):
        return _JsonlStreamReader(self.options, schema)

    def writer(self, schema, overwrite: bool):
        return _JsonlWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotently register the connector on a session."""
    spark.dataSource.register(JsonlDataSource)


class _JsonlStreamReader(DataSourceStreamReader):
    """Partitioned streaming reader: the sorted file list is the offset
    log (offset = number of files consumed), one file per micro-batch —
    the custom-connector equivalent of the built-in file source's
    ``maxFilesPerTrigger=1``. Offsets are planned on the driver (a file
    count, never file contents); each batch's rows are parsed on
    EXECUTORS via the same per-file partitions as the batch reader, so
    throughput scales with the cluster (this is why the partitioned
    ``DataSourceStreamReader`` is used rather than the driver-side
    ``SimpleDataSourceStreamReader``, which reads records on the
    driver). Recovery replay falls out of offsets being list indexes:
    ``partitions(start, end)`` re-plans exactly the same files.
    """

    def __init__(self, options, schema):
        self._inner = _JsonlReader(options, schema)
        self._planned = 0

    def _files(self):
        return [p.path for p in self._inner.partitions()]

    def initialOffset(self) -> dict:
        return {"i": 0}

    def latestOffset(self) -> dict:
        # advance one file per trigger so multi-batch state is real;
        # monotone regardless of commit() timing (a re-listed directory
        # can only grow the tail)
        self._planned = min(len(self._files()), self._planned + 1)
        return {"i": self._planned}

    def commit(self, end: dict) -> None:
        pass  # offsets derive from the immutable file-list prefix

    def partitions(self, start: dict, end: dict):
        files = self._files()
        return [_FilePartition(p) for p in files[start["i"] : end["i"]]]

    def read(self, partition):
        return self._inner.read(partition)

    def stop(self) -> None:
        pass


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, n_rows: int):
        self.tmp_path = tmp_path
        self.n_rows = n_rows


class _JsonlWriter(DataSourceWriter):
    """Task-then-driver two-phase commit, the same atomicity contract as
    ManagedTable: each task writes a uuid-named ``.tmp`` file and
    reports it in its commit message; only the DRIVER's ``commit``
    renames the batch into visibility (``.tmp`` → ``part-NNNNN.jsonl``,
    in one deterministic order), and ``abort`` removes
    every temp file — a reader never observes a torn multi-task write.
    Speculative/retried tasks each write their own uuid file; only the
    attempt whose message reaches commit() gets renamed, the rest stay
    ``.tmp`` (ignored by the reader's extension filter) for vacuum.
    """

    def __init__(self, options, overwrite: bool):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("sparketl_jsonl requires a 'path' option")
        self._overwrite = overwrite

    def write(self, iterator):
        import uuid as _uuid

        os.makedirs(self._path, exist_ok=True)
        tmp = os.path.join(self._path, f"_{_uuid.uuid4().hex}.tmp")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), ensure_ascii=False))
                fh.write("\n")
                n += 1
        return _JsonlCommit(tmp, n)

    def commit(self, messages):
        if self._overwrite:
            for f in os.listdir(self._path):
                if f.endswith((".jsonl", ".json", ".txt")):
                    os.unlink(os.path.join(self._path, f))
        for i, m in enumerate(sorted(
            (m for m in messages if m is not None), key=lambda m: m.tmp_path
        )):
            os.replace(
                m.tmp_path, os.path.join(self._path, f"part-{i:05d}.jsonl")
            )

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.unlink(m.tmp_path)
