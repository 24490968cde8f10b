"""Managed mutable tables: copy-on-write parquet with a manifest log.

Spark parquet tables are immutable; the reference's INSERT/UPDATE/
DELETE semantics (SNK-01/02, DML-01..03 — SURVEY §2.1/§3.2/§3.3) need
transactions. Delta Lake is the production answer; its jars are not in
this image, so this module implements the same core idea natively:

- every table version is a JSON DELTA manifest recording only the
  files it adds/removes relative to its parent (like a Delta log
  entry) — a commit writes O(changed files) bytes, never the full
  list;
- every ``_CKPT_EVERY`` commits a compacted PARQUET checkpoint of the
  full snapshot is written (Delta's checkpoint pattern): readers load
  the nearest checkpoint plus at most ``_CKPT_EVERY`` deltas, never
  the whole history, and the columnar layout means a stats-less read
  (schema + file list) never parses the per-file stats/bloom blobs;
- appends add files and write a new delta — O(new data), no rewrite;
- update/delete/overwrite write replacement files + a new delta;
- a version is COMMITTED the instant its fully-written manifest is
  ``os.link``ed to its final name — link is atomic and exclusive, so
  readers never see a partial manifest and two writers can never both
  own a version number (optimistic concurrency: appends rebase and
  retry, rewrites raise ConcurrentWriteError). A crashed writer leaves
  only orphaned data dirs/tmp files, never a corrupt table; the
  ``_LATEST`` pointer survives as a monotonic best-effort cache.

At cluster scale the manifest log lives on shared storage and the data
files are written by distributed Spark jobs — the commit is still one
exclusive small-file publication, which is exactly Delta's design
(its _delta_log uses the same put-if-absent primitive).

Keyed-update semantics reproduce the reference's row loop
(tool:282-312, SURVEY §3.3): null-identifier source rows are skipped
(not fatal), unmatched target rows pass through, unmatched source rows
are dropped (update-only, NOT upsert), and duplicate source keys
resolve last-write-wins in source order.
"""

from __future__ import annotations

import json
import math
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


class TableError(Exception):
    pass


class ConcurrentWriteError(TableError):
    """Another writer committed between this writer's snapshot read and
    its commit attempt. Appends rebase-and-retry automatically (they
    are logically conflict-free); rewrites (overwrite / update / delete
    / upsert / compact) surface this so the caller re-runs against the
    new snapshot — the same contract as Delta's optimistic concurrency."""


def _is_nan(v) -> bool:
    return isinstance(v, float) and math.isnan(v)


def _fold_min(a, b):
    """Min across row groups under Spark's total order (NaN > every
    real): the file min is the smallest REAL value, and NaN only when
    every row group is all-NaN. Plain ``min()`` is order-dependent with
    NaN (``min(nan, 5.0)`` keeps nan), which would break </<= prunes
    when an all-NaN row group happens to come first."""
    if _is_nan(a):
        return b
    if _is_nan(b):
        return a
    return min(a, b)


def _fold_max(a, b):
    """Max across row groups under Spark's total order: NaN is sticky.
    Plain ``max()`` drops NaN depending on argument order
    (``max(7.0, nan)`` == 7.0), so a NaN in a LATER row group would be
    erased and ``_file_might_match`` — which reads a real max as proof
    the file is NaN-free — would wrongly prune the file for >/>=/=.
    That made ``read(where='v > 200000')`` miss NaN rows (NaN > every
    literal in Spark) and the same pruning underlies delete/update."""
    if _is_nan(a) or _is_nan(b):
        return float("nan")
    return max(a, b)


def _collect_file_stats(path: str) -> dict:
    """Per-file numeric column min/max from the parquet FOOTER (row-group
    statistics — no data scan). Only int/float columns are recorded;
    columns without footer stats are simply absent, which the pruner
    treats as 'cannot prune' (always safe). Row-group stats are folded
    NaN-aware (see ``_fold_min``/``_fold_max``) so the file-level
    [min,max] matches Spark's total order regardless of which row group
    holds the NaN rows."""
    import pyarrow.parquet as pq

    cols: dict[str, list] = {}
    md = pq.ParquetFile(path).metadata
    for rg in range(md.num_row_groups):
        row = md.row_group(rg)
        for ci in range(row.num_columns):
            c = row.column(ci)
            st = c.statistics
            if st is None or not st.has_min_max:
                continue
            mn, mx = st.min, st.max
            if isinstance(mn, bool) or not isinstance(mn, (int, float)):
                continue
            name = ".".join(c.path_in_schema.split("."))
            if name in cols:
                cols[name] = [_fold_min(cols[name][0], mn), _fold_max(cols[name][1], mx)]
            else:
                cols[name] = [mn, mx]
    return cols


# `col op numeric-literal` conjunct, the main form the pruner handles;
# anything else in the predicate disables pruning for that conjunct.
_PRUNABLE = re.compile(
    r"^\s*([A-Za-z_][A-Za-z_0-9]*)\s*(<=|>=|==|=|<|>)\s*(-?\d+(?:\.\d+)?)\s*$"
)

# `col = 'string-literal'` conjunct — pruned via per-file Bloom filters
# (footer min/max covers only numerics). Literals containing quotes do
# not parse → that conjunct simply never prunes (safe).
_PRUNABLE_STR = re.compile(
    r"^\s*([A-Za-z_][A-Za-z_0-9]*)\s*(?:==|=)\s*'([^']*)'\s*$"
)

# `col IN (items)` — the one parenthesized form the pruner parses;
# items are comma-separated numeric or 'string' literals
_IN_LIST = re.compile(r"(?i)\b([A-Za-z_]\w*)\s+IN\s*\(([^()]*)\)")

# commits between compacted parquet checkpoints of the manifest log —
# readers replay at most this many deltas above the nearest checkpoint
_CKPT_EVERY = 20

_BLOOM_M = 8192  # bits per (file, column) filter — 1 KiB in the manifest
_BLOOM_K = 3
_BLOOM_MAX_DISTINCT = 4096  # beyond this the filter saturates; skip it


def _bloom_hashes(value: str) -> list[int]:
    """k bit positions via double hashing of a stable md5 — identical
    across processes/machines (unlike Python's salted hash())."""
    import hashlib

    d = hashlib.md5(value.encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return [(h1 + i * h2) % _BLOOM_M for i in range(_BLOOM_K)]


def _collect_file_blooms(path: str) -> dict:
    """Per-file Bloom filters over each low-cardinality STRING column —
    the Delta bloom-index pattern extending file skipping to string
    equality, which min/max stats cannot serve. Built once per newly
    written file (a local column read here; in a distributed write the
    same bits fall out of the write job) and carried forward in the
    manifest like the numeric stats. ~1 KiB per (file, column); a
    column with > _BLOOM_MAX_DISTINCT distinct values is skipped (a
    saturated filter prunes nothing)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    str_cols = [
        f.name
        for f in pf.schema_arrow
        if str(f.type) in ("string", "large_string")
    ]
    if not str_cols:
        return {}
    tbl = pf.read(columns=str_cols)
    out: dict[str, str] = {}
    for name in str_cols:
        vals = {v for v in tbl.column(name).to_pylist() if v is not None}
        if len(vals) > _BLOOM_MAX_DISTINCT:
            continue
        bits = bytearray(_BLOOM_M // 8)
        for v in vals:
            for h in _bloom_hashes(v):
                bits[h >> 3] |= 1 << (h & 7)
        out[name] = bits.hex()
    return out


def _bloom_might_contain(bloom_hex: str, value: str) -> bool:
    bits = bytes.fromhex(bloom_hex)
    return all(bits[h >> 3] & (1 << (h & 7)) for h in _bloom_hashes(value))


def _arrow_type_of(dt: T.DataType):
    """Arrow type for a Spark type — the small closed set ManagedTable
    schemas use. Raises for anything else; callers fall back to the
    Spark-job write path."""
    import pyarrow as pa

    if isinstance(dt, T.LongType):
        return pa.int64()
    if isinstance(dt, T.IntegerType):
        return pa.int32()
    if isinstance(dt, T.ShortType):
        return pa.int16()
    if isinstance(dt, T.ByteType):
        return pa.int8()
    if isinstance(dt, T.DoubleType):
        return pa.float64()
    if isinstance(dt, T.FloatType):
        return pa.float32()
    if isinstance(dt, T.StringType):
        return pa.string()
    if isinstance(dt, T.BooleanType):
        return pa.bool_()
    if isinstance(dt, T.BinaryType):
        return pa.binary()
    if isinstance(dt, T.DateType):
        return pa.date32()
    if isinstance(dt, T.TimestampType):
        return pa.timestamp("us", tz="UTC")
    if isinstance(dt, T.DecimalType):
        return pa.decimal128(dt.precision, dt.scale)
    raise TypeError(f"no local-write arrow mapping for {dt}")


def _stats_of_values(schema: T.StructType, columns: dict) -> tuple[dict, dict]:
    """NaN-aware min/max stats + Bloom bits over driver-held column
    value lists — the same semantics ``_make_part_writer`` folds on
    executors (Spark total order: max is NaN-sticky, min is the
    smallest real unless all-NaN; all-null columns absent)."""
    stats: dict = {}
    blooms: dict = {}
    for f in schema.fields:
        vals = [v for v in columns[f.name] if v is not None]
        if not vals:
            continue
        if isinstance(f.dataType, (T.FloatType, T.DoubleType)):
            real = [v for v in vals if not math.isnan(v)]
            if real:
                mx = float("nan") if len(real) < len(vals) else max(real)
                stats[f.name] = [min(real), mx]
            else:
                stats[f.name] = [float("nan"), float("nan")]
        elif isinstance(
            f.dataType, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        ):
            stats[f.name] = [int(min(vals)), int(max(vals))]
        elif isinstance(f.dataType, T.StringType):
            distinct = set(vals)
            if len(distinct) <= _BLOOM_MAX_DISTINCT:
                bits = bytearray(_BLOOM_M // 8)
                for v in distinct:
                    for h in _bloom_hashes(v):
                        bits[h >> 3] |= 1 << (h & 7)
                blooms[f.name] = bits.hex()
    return stats, blooms


# -- distributed write-side stats (r15) --------------------------------------
# The per-file min/max stats and Bloom filters used to be computed by a
# DRIVER read-back of every newly committed file (_collect_file_stats /
# _collect_file_blooms): footer-only for numerics but a real column
# read for the blooms — driver data work per commit, the §5 hazard the
# r14 verdict deferred. They are now folded INSIDE the write job: each
# task writes its own parquet file (pyarrow) and returns one tiny
# (file, stats, blooms) row, so the driver only ever sees the metadata.
# The driver read-back functions above remain as the fallback for
# files that enter a manifest without passing through _write_data
# (legacy tables, foreign files).


def _make_part_writer(
    out_dir: str, fields: list, capture: bool
):
    """Build the mapInArrow body for ``_write_data``: writes this
    task's rows as ONE parquet file under ``out_dir`` and yields a
    single metadata row ``(file, stats_json, blooms_json, cap_json)``.

    Stats replicate ``_collect_file_stats``'s semantics from the DATA
    (not the footer): numeric top-level columns only, min = smallest
    real value (NaN only when all-NaN), max = NaN-sticky — Spark's
    total order, the contract ``_file_might_match`` prunes under.
    Blooms replicate ``_collect_file_blooms``: per low-cardinality
    string column, the same md5 double-hash bits.

    ``capture``: the input carries two trailing internal columns —
    ``_sparketl_omit`` (row excluded from the file; MERGE deletes) and
    ``_sparketl_cap`` (a value to report back; MERGE matched-row
    pre-image) — stripped before writing; distinct non-null cap values
    ride back in ``cap_json``. Bounded by the caller (micro-batch key
    sets), never table-sized.
    """
    numeric = {
        f.name
        for f in fields
        if isinstance(
            f.dataType,
            (
                T.ByteType,
                T.ShortType,
                T.IntegerType,
                T.LongType,
                T.FloatType,
                T.DoubleType,
            ),
        )
    }
    stringy = {f.name for f in fields if isinstance(f.dataType, T.StringType)}
    floaty = {
        f.name
        for f in fields
        if isinstance(f.dataType, (T.FloatType, T.DoubleType))
    }
    names = [f.name for f in fields]

    def write_part(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        writer = None
        path = None
        tmp = None
        buf: list = []
        buf_bytes = 0
        mins: dict = {}
        maxs: dict = {}
        saw_nan: set = set()
        bloom_vals: dict = {c: set() for c in stringy}
        bloom_dead: set = set()
        cap_vals: set = set()

        def flush():
            nonlocal writer, buf, buf_bytes
            if not buf:
                return
            tbl = pa.Table.from_batches(buf)
            writer.write_table(tbl, row_group_size=max(1, tbl.num_rows))
            buf = []
            buf_bytes = 0

        for batch in batches:
            if batch.num_rows == 0:
                continue
            if capture:
                cap_col = batch.column(batch.schema.get_field_index("_sparketl_cap"))
                for v in cap_col.drop_null().to_pylist():
                    # struct captures arrive as dicts — dedup via a
                    # canonical JSON encoding (values are key-sized)
                    cap_vals.add(json.dumps(v, sort_keys=True))
                omit = batch.column(
                    batch.schema.get_field_index("_sparketl_omit")
                )
                import pyarrow.compute as pc

                keep = pc.fill_null(pc.invert(omit), True)
                batch = batch.select(names).filter(keep)
                if batch.num_rows == 0:
                    continue
            if writer is None:
                fname = f"part-{pid:05d}-{uuid.uuid4().hex}.parquet"
                path = os.path.join(out_dir, fname)
                tmp = path + ".inprogress"
                # float/double columns get NO footer statistics:
                # pyarrow computes min/max IGNORING NaN, and Spark's
                # row-group pushdown would then wrongly prune row
                # groups whose only matching rows are NaN (NaN > lit is
                # true under Spark's total order). The manifest-level
                # stats computed below are NaN-aware and do the file
                # skipping; int/string footer stats stay on for
                # readers' row-group pruning.
                stat_cols = [
                    f2.name for f2 in fields if f2.name not in floaty
                ]
                writer = pq.ParquetWriter(
                    tmp, batch.schema, write_statistics=stat_cols
                )
            # fold stats from the data itself (exact, footer-free)
            for col in numeric:
                arr = batch.column(batch.schema.get_field_index(col))
                valid = arr.drop_null()
                if len(valid) == 0:
                    continue
                vals = valid.to_numpy(zero_copy_only=False)
                if col in floaty:
                    import numpy as np

                    nan_mask = np.isnan(vals)
                    if nan_mask.any():
                        saw_nan.add(col)
                    real = vals[~nan_mask]
                    if real.size == 0:
                        continue
                    lo, hi = float(real.min()), float(real.max())
                else:
                    lo, hi = int(vals.min()), int(vals.max())
                mins[col] = lo if col not in mins else min(mins[col], lo)
                maxs[col] = hi if col not in maxs else max(maxs[col], hi)
            for col in list(bloom_vals):
                if col in bloom_dead:
                    continue
                arr = batch.column(batch.schema.get_field_index(col))
                s = bloom_vals[col]
                for v in arr.drop_null().to_pylist():
                    s.add(v)
                if len(s) > _BLOOM_MAX_DISTINCT:
                    bloom_dead.add(col)
                    bloom_vals[col] = set()
            buf.append(batch)
            buf_bytes += batch.nbytes
            if buf_bytes >= 128 << 20:
                flush()
        if writer is None and not cap_vals:
            return
        if writer is not None:
            flush()
            writer.close()
            os.rename(tmp, path)
        else:
            # every row of this task was omitted (e.g. an all-delete
            # MERGE partition): no file, but the captured pre-image
            # values must still reach the driver
            path = None
        stats = {}
        for col in mins:
            lo = mins[col]
            hi = float("nan") if col in saw_nan else maxs[col]
            if isinstance(lo, float) or isinstance(hi, float):
                stats[col] = [float(lo), float(hi)]
            else:
                stats[col] = [int(lo), int(hi)]
        for col in saw_nan:
            if col not in stats:  # all-NaN column: min is NaN too
                stats[col] = [float("nan"), float("nan")]
        blooms = {}
        for col, vals in bloom_vals.items():
            if col in bloom_dead or not vals:
                continue
            bits = bytearray(_BLOOM_M // 8)
            for v in vals:
                for h in _bloom_hashes(v):
                    bits[h >> 3] |= 1 << (h & 7)
            blooms[col] = bits.hex()
        yield pa.RecordBatch.from_pylist(
            [
                {
                    "file": path,
                    "stats": json.dumps(stats),
                    "blooms": json.dumps(blooms),
                    "cap": "[%s]" % ",".join(sorted(cap_vals)) if capture else "[]",
                }
            ],
            schema=pa.schema(
                [
                    ("file", pa.string()),
                    ("stats", pa.string()),
                    ("blooms", pa.string()),
                    ("cap", pa.string()),
                ]
            ),
        )

    return write_part


def _file_might_match(stats: dict, col: str, op: str, lit: float) -> bool:
    """Conservative: True unless the file's [min,max] interval proves no
    row can satisfy ``col op lit``. NULL rows never satisfy a
    comparison, so dropping a file on its non-null min/max is sound.

    Floating-point / NaN: Spark SQL orders NaN greater than every
    double, and Spark's parquet writer uses the same total order when
    computing footer stats — so a file containing any NaN row records
    ``max = NaN`` (verified against this container's writer; these
    files are always written by ``_write_data``, never foreign). Hence:
    a real (non-NaN) max proves the file is NaN-free and all four
    comparison prunes are sound; ``max = NaN`` means NaN rows exist,
    which satisfy ``>``/``>=`` for every literal and defeat ``=``
    pruning, so only the ``<``/``<=`` prunes (driven by min, which is
    real unless the file is all-NaN) remain. An all-NaN file has
    ``min = NaN`` and ``NaN < lit`` is False both here and in Spark, so
    the lower-bound prune stays sound there too."""
    if col not in stats:
        return True
    mn, mx = stats[col]
    if op == "<":
        return mn < lit
    if op == "<=":
        return mn <= lit
    if isinstance(mx, float) and math.isnan(mx):
        return True  # NaN rows present: they satisfy >, >=; = can't prune
    if op == ">":
        return mx > lit
    if op == ">=":
        return mx >= lit
    return mn <= lit <= mx  # = / ==


def _compile_prune_predicate(where: str):
    """Compile ``where`` into prunable disjuncts-of-conjuncts, or None
    when the predicate cannot be pruned at all (NOT / free parens).
    Module-level and returning only plain tuples so the compiled form
    ships to executors for distributed checkpoint pruning."""
    stripped = _IN_LIST.sub("", where)
    if re.search(r"(?i)\bNOT\b|[()]", stripped):
        return None
    # BETWEEN rewrites before the AND split would misparse it
    where2 = re.sub(
        r"(?i)\b([A-Za-z_]\w*)\s+BETWEEN\s+(-?\d+(?:\.\d+)?)"
        r"\s+AND\s+(-?\d+(?:\.\d+)?)",
        r"\1 >= \2 AND \1 <= \3",
        where,
    )

    def parse_conjunct(c: str):
        num = _PRUNABLE.match(c)
        if num:
            return ("num", num.group(1), num.group(2), float(num.group(3)))
        s = _PRUNABLE_STR.match(c)
        if s:
            return ("str", s.group(1), "=", s.group(2))
        i = _IN_LIST.fullmatch(c.strip())
        if i:
            items = []
            for raw in i.group(2).split(","):
                raw = raw.strip()
                sm = re.fullmatch(r"'([^']*)'", raw)
                if sm:
                    items.append(("str", sm.group(1)))
                    continue
                nm = re.fullmatch(r"-?\d+(?:\.\d+)?", raw)
                if nm:
                    items.append(("num", float(raw)))
                    continue
                return None  # unparsable item — conjunct never prunes
            if items:
                return ("in", i.group(1), None, items)
        return None

    disjuncts = []
    for d in re.split(r"(?i)\bOR\b", where2):
        conjuncts = []
        for c in re.split(r"(?i)\bAND\b", d):
            parsed = parse_conjunct(c)
            if parsed is not None:
                conjuncts.append(parsed)
        disjuncts.append(conjuncts)
    return disjuncts


def _prune_admits(disjuncts, fs: dict, fb: dict) -> bool:
    """True iff the file (stats ``fs``, blooms ``fb``) might contain a
    matching row under the compiled predicate."""

    def conjunct_admits(kind, col, op, lit) -> bool:
        if kind == "num":
            return _file_might_match(fs, col, op, lit)
        if kind == "str":
            return col not in fb or _bloom_might_contain(fb[col], lit)
        # IN: any item might match
        for item_kind, v in lit:
            if item_kind == "num":
                if _file_might_match(fs, col, "=", v):
                    return True
            else:
                if col not in fb or _bloom_might_contain(fb[col], v):
                    return True
        return False

    return any(
        all(conjunct_admits(*c) for c in conj) for conj in disjuncts
    )


class ManagedTable:
    """A versioned, mutable table rooted at a directory."""

    # checkpoints larger than this many files prune distributed (as a
    # Spark job over the checkpoint parquet) instead of materializing
    # the full stats map on the driver; class-level so tests can lower
    # it against synthetic manifests
    DIST_PRUNE_FILES = 50_000

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._snap_cache: dict[int, dict] = {}

    # -- layout ------------------------------------------------------------
    @property
    def _manifest_dir(self) -> str:
        return os.path.join(self.root, "_manifests")

    @property
    def _pointer(self) -> str:
        return os.path.join(self.root, "_LATEST")

    def exists(self) -> bool:
        return os.path.exists(self._pointer)

    def _current_version(self) -> int:
        """Highest published manifest. The manifest DIRECTORY is the
        source of truth (exclusive-create publication serializes
        writers — see ``_publish``); the ``_LATEST`` pointer is a
        best-effort cache kept for ``exists()`` and older layouts."""
        try:
            versions = [
                int(n[1:7])
                for n in os.listdir(self._manifest_dir)
                if re.fullmatch(r"v\d{6}\.json", n)
            ]
            if versions:
                return max(versions)
        except FileNotFoundError:
            pass
        with open(self._pointer, encoding="utf-8") as f:
            return int(f.read().strip())

    def _ckpt_path(self, v: int) -> str:
        return os.path.join(self._manifest_dir, f"v{v:06d}.ckpt.parquet")

    def _read_log_entry(self, v: int) -> dict:
        with open(
            os.path.join(self._manifest_dir, f"v{v:06d}.json"), encoding="utf-8"
        ) as f:
            return json.load(f)

    def _write_checkpoint(self, snap: dict) -> None:
        """Best-effort compacted checkpoint: the full snapshot at one
        version as PARQUET (one row per file; stats/blooms as JSON
        string columns; schema/properties/version in the key-value
        metadata). Columnar, so a stats-less load reads only the
        ``file`` column; written to a tmp name then os.replace'd, so
        readers see a whole checkpoint or none. Losing it is harmless —
        reconstruction falls back to the previous base + deltas."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        files = snap["files"]
        tbl = pa.table(
            {
                "file": files,
                "stats": [json.dumps(snap["file_stats"].get(f, {})) for f in files],
                "blooms": [json.dumps(snap["file_blooms"].get(f, {})) for f in files],
            }
        ).replace_schema_metadata(
            {
                "version": str(snap["version"]),
                "schema": snap["schema"],
                "properties": json.dumps(snap["properties"]),
            }
        )
        path = self._ckpt_path(snap["version"])
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)

    def _read_checkpoint(self, v: int, need_stats: bool) -> dict:
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(self._ckpt_path(v))
        meta = pf.schema_arrow.metadata or {}
        cols = ["file", "stats", "blooms"] if need_stats else ["file"]
        tbl = pf.read(columns=cols)
        files = tbl.column("file").to_pylist()
        snap = {
            "version": v,
            "files": files,
            "schema": meta[b"schema"].decode(),
            "properties": json.loads(meta[b"properties"].decode()),
            "file_stats": {},
            "file_blooms": {},
        }
        if need_stats:
            snap["file_stats"] = dict(
                zip(files, (json.loads(s) for s in tbl.column("stats").to_pylist()))
            )
            snap["file_blooms"] = dict(
                zip(files, (json.loads(s) for s in tbl.column("blooms").to_pylist()))
            )
        return snap

    def _manifest(self, version: int | None = None, need_stats: bool = True) -> dict:
        """Reconstruct the FULL snapshot at ``version`` from the nearest
        base (parquet checkpoint, or a legacy full-JSON manifest) plus
        the delta entries above it — never the whole history. Snapshots
        of a published version are immutable, so they cache per
        instance; callers must not mutate the returned dict.

        ``need_stats=False`` skips loading per-file stats/bloom blobs
        (read()/schema()/diff() don't need them) — against a checkpoint
        base that is a single columnar read of file paths."""
        v = version if version is not None else self._current_version()
        cache = self._snap_cache
        hit = cache.get(v)
        if hit is not None and (not need_stats or hit["_has_stats"]):
            return hit
        # walk down from v collecting deltas until a base is found
        deltas: list[dict] = []
        base: dict | None = None
        w = v
        while w >= 1:
            if os.path.exists(self._ckpt_path(w)):
                base = self._read_checkpoint(w, need_stats)
                break
            entry = self._read_log_entry(w)
            if "files" in entry:  # legacy full manifest IS a snapshot
                base = entry
                base.setdefault("file_stats", {})
                base.setdefault("file_blooms", {})
                break
            deltas.append(entry)
            w -= 1
        if base is None:
            base = {
                "files": [],
                "file_stats": {},
                "file_blooms": {},
                "schema": None,
                "properties": {},
            }
        files = list(base["files"])
        stats = dict(base["file_stats"])
        blooms = dict(base["file_blooms"])
        schema_json = base["schema"]
        properties = base["properties"]
        for d in reversed(deltas):
            removed = set(d["removes"])
            if removed:
                files = [f for f in files if f not in removed]
                for f in removed:
                    stats.pop(f, None)
                    blooms.pop(f, None)
            files.extend(d["adds"])
            if need_stats:
                for f, sb in d["adds"].items():
                    stats[f] = sb["s"]
                    blooms[f] = sb["b"]
            schema_json = d["schema"]
            properties = d["properties"]
        snap = {
            "version": v,
            "files": files,
            "schema": schema_json,
            "properties": properties,
            "file_stats": stats,
            "file_blooms": blooms,
            "_has_stats": need_stats,
        }
        cache[v] = snap
        if len(cache) > 8:  # keep the instance cache tiny
            cache.pop(next(iter(cache)))
        return snap

    def _publish(self, manifest: dict, new_v: int) -> bool:
        """Atomically publish manifest ``new_v``; False if a concurrent
        writer already owns that version number. The manifest is fully
        written to a tmp file, then ``os.link``ed to its final name —
        link is atomic AND exclusive (fails if the name exists), so (a)
        readers never see a partial manifest and (b) two writers can
        never both publish the same version. Linking IS the commit
        point; the ``_LATEST`` pointer is refreshed afterwards as a
        monotonic best-effort cache."""
        path = os.path.join(self._manifest_dir, f"v{new_v:06d}.json")
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f)
        try:
            os.link(tmp, path)
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)
        try:
            cur = 0
            if os.path.exists(self._pointer):
                with open(self._pointer, encoding="utf-8") as f:
                    cur = int(f.read().strip())
            if new_v > cur:
                ptr_tmp = self._pointer + f".tmp-{uuid.uuid4().hex}"
                with open(ptr_tmp, "w", encoding="utf-8") as f:
                    f.write(str(new_v))
                os.replace(ptr_tmp, self._pointer)
        except OSError:
            pass  # cache only; _current_version derives from the dir
        return True

    def _commit(
        self,
        files: list[str],
        schema_json: str,
        properties: dict,
        base_version: int | None = None,
        new_stats: dict | None = None,
    ) -> int:
        """Commit a new version on top of ``base_version`` (the version
        the caller's snapshot was read at). Raises ConcurrentWriteError
        if another writer published base_version+1 first — optimistic
        concurrency; ``append`` rebases and retries, rewrites surface
        the conflict. ``base_version=None`` keeps the legacy
        last-writer-wins behavior for internal single-writer paths.

        ``new_stats``: per-file ``{"s": stats, "b": blooms}`` computed
        by the write job itself (``_write_data``) — the normal path
        since r15; the driver-side footer/column read below is only the
        fallback for files that entered the manifest without passing
        through ``_write_data``."""
        if base_version is None:
            base_version = self._current_version() if self.exists() else 0
        new_v = base_version + 1
        os.makedirs(self._manifest_dir, exist_ok=True)
        # min/max stats ride in the log (Delta-style data skipping);
        # retained files carry their stats forward through the delta
        # replay; newly ADDED files bring their stats from the write
        # job — O(new files) metadata per commit, no driver data scan.
        base_m = (
            self._manifest(base_version)
            if base_version >= 1
            else {"files": [], "file_stats": {}, "file_blooms": {}}
        )
        base_set = set(base_m["files"])
        files_set = set(files)
        prev_stats = base_m["file_stats"]
        prev_blooms = base_m["file_blooms"]
        new_stats = new_stats or {}

        # `get(f) is not None` (not truthiness): a file with no numeric
        # columns has stats {} which must still carry forward, or its
        # footer would be re-read on every subsequent commit
        def _s(f: str):
            if f in new_stats:
                return new_stats[f]["s"]
            if prev_stats.get(f) is not None:
                return prev_stats[f]
            return _collect_file_stats(f)

        def _b(f: str):
            if f in new_stats:
                return new_stats[f]["b"]
            if prev_blooms.get(f) is not None:
                return prev_blooms[f]
            return _collect_file_blooms(f)

        adds = {
            f: {"s": _s(f), "b": _b(f)} for f in files if f not in base_set
        }
        manifest = {
            "version": new_v,
            "schema": schema_json,
            "properties": properties,
            "adds": adds,
            "removes": [f for f in base_m["files"] if f not in files_set],
        }
        if not self._publish(manifest, new_v):
            raise ConcurrentWriteError(
                f"version {new_v} was committed by a concurrent writer "
                f"(snapshot read at v{base_version})"
            )
        if new_v % _CKPT_EVERY == 0:
            # compacted checkpoint: O(files) once per _CKPT_EVERY
            # commits, amortized O(files/K) per commit; best-effort
            # (a failed checkpoint only means readers replay more
            # deltas from the previous base)
            try:
                file_stats = {
                    f: adds[f]["s"] if f in adds else prev_stats.get(f, {})
                    for f in files
                }
                file_blooms = {
                    f: adds[f]["b"] if f in adds else prev_blooms.get(f, {})
                    for f in files
                }
                self._write_checkpoint(
                    {
                        "version": new_v,
                        "files": files,
                        "schema": schema_json,
                        "properties": properties,
                        "file_stats": file_stats,
                        "file_blooms": file_blooms,
                    }
                )
            except Exception:
                # best-effort by design, and the version is ALREADY
                # durably published via os.link above — any error here
                # (OSError, pyarrow ArrowException, encoding) must not
                # surface as a failed commit, or the caller would retry
                # an append that landed and duplicate data
                pass
        return new_v

    def _write_local_rows(
        self, dicts: list[dict], schema: T.StructType
    ) -> tuple[list[str], dict]:
        """Write DRIVER-HELD rows (list of {col: value}) as one parquet
        file with the same stats/bloom manifest metadata the
        distributed writer produces. Used for the insert side of
        small-source MERGEs: the rows were already collected for the
        broadcast, so writing them here costs no Spark job at all —
        O(batch) driver work, the same class as the broadcast itself.
        Raises TypeError for types outside the supported mapping
        (callers fall back to the Spark-job shape)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not dicts:
            return [], {}
        arrow_schema = pa.schema(
            [(f.name, _arrow_type_of(f.dataType)) for f in schema.fields]
        )
        tbl = pa.Table.from_pylist(dicts, schema=arrow_schema)
        out = os.path.join(self.root, f"d-{uuid.uuid4().hex}")
        os.makedirs(out, exist_ok=True)
        path = os.path.join(out, f"part-local-{uuid.uuid4().hex}.parquet")
        floaty = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (T.FloatType, T.DoubleType))
        ]
        stat_cols = [f.name for f in schema.fields if f.name not in floaty]
        pq.write_table(
            tbl, path, write_statistics=stat_cols, row_group_size=max(1, len(dicts))
        )
        cols = {
            f.name: [d.get(f.name) for d in dicts] for f in schema.fields
        }
        s, b = _stats_of_values(schema, cols)
        return [path], {path: {"s": s, "b": b}}

    def _write_data(
        self, df: DataFrame, capture: bool = False
    ) -> tuple[list[str], dict, list]:
        """Write ``df`` as one parquet file per non-empty partition and
        return ``(files, {file: {"s": stats, "b": blooms}}, captured)``.
        The per-file min/max stats and Bloom bits are folded INSIDE the
        write tasks (r15) — the commit path no longer reads any data
        column on the driver; only the small metadata rows come back.
        ``capture=True``: ``df`` carries the internal ``_sparketl_omit``
        / ``_sparketl_cap`` columns (see ``_make_part_writer``); omitted
        rows are excluded from the file and the distinct cap values are
        returned — the mechanism MERGE uses to report matched-row
        pre-images from the same single write job.

        Writer dispatch (r15): schemas with a string column go through
        the Arrow task writer — per-file Bloom bits need the column
        data, which must never be read back on the driver. All-numeric
        schemas (the hot CDC/IVM tables) use Spark's native parquet
        writer — no Python boundary — with capture riding on a
        ``df.observe(collect_set(...))`` inside the SAME job and the
        numeric min/max coming from a driver FOOTER read (O(KB)
        metadata per file, not a column read; Spark's footers are
        NaN-aware per ``_collect_file_stats``)."""
        out = os.path.join(self.root, f"d-{uuid.uuid4().hex}")
        os.makedirs(out, exist_ok=True)
        data_fields = [
            f
            for f in df.schema.fields
            if f.name not in ("_sparketl_omit", "_sparketl_cap")
        ]
        if not any(
            isinstance(f.dataType, (T.StringType, T.BinaryType))
            for f in data_fields
        ):
            from pyspark.sql import Observation

            captured: list = []
            w = df
            if capture:
                obs = Observation()
                w = df.observe(
                    obs, F.collect_set(F.col("_sparketl_cap")).alias("cap")
                ).filter(
                    ~F.coalesce(F.col("_sparketl_omit"), F.lit(False))
                ).drop("_sparketl_omit", "_sparketl_cap")
            w.write.mode("overwrite").parquet(out)
            files = sorted(
                os.path.join(out, f)
                for f in os.listdir(out)
                if f.endswith(".parquet")
            )
            adds = {
                f: {"s": _collect_file_stats(f), "b": {}} for f in files
            }
            if capture:
                captured = list(obs.get["cap"])
            return files, adds, captured
        fn = _make_part_writer(out, data_fields, capture)
        rows = df.mapInArrow(
            fn, "file string, stats string, blooms string, cap string"
        ).collect()
        files = sorted(r["file"] for r in rows if r["file"] is not None)
        adds = {
            r["file"]: {
                "s": json.loads(r["stats"]),
                "b": json.loads(r["blooms"]),
            }
            for r in rows
            if r["file"] is not None
        }
        cap_seen: set = set()
        captured: list = []
        for r in rows:
            for v in json.loads(r["cap"]):
                k = json.dumps(v, sort_keys=True)
                if k not in cap_seen:
                    cap_seen.add(k)
                    captured.append(v)
        return files, adds, captured

    # -- DDL ----------------------------------------------------------------
    def create(self, schema: T.StructType, properties: dict | None = None) -> None:
        if self.exists():
            raise TableError(f"table already exists at {self.root}")
        os.makedirs(self.root, exist_ok=True)
        self._commit([], schema.json(), properties or {}, base_version=0)

    def drop(self) -> None:
        import shutil

        if os.path.exists(self.root):
            shutil.rmtree(self.root)

    # -- reads --------------------------------------------------------------
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(
            json.loads(self._manifest(need_stats=False)["schema"])
        )

    def properties(self) -> dict:
        return self._manifest(need_stats=False)["properties"]

    def primary_key(self) -> list[str]:
        raw = self.properties().get("primary_key", "")
        return [c for c in raw.split(",") if c]

    def read(
        self,
        version: int | None = None,
        where: str | None = None,
        prune_only: bool = False,
    ) -> DataFrame:
        """Read a version (default: latest). With ``where``, files whose
        footer min/max prove no match are skipped BEFORE Spark ever
        lists them (manifest-level data skipping, the Delta pattern);
        the predicate is then still applied to the surviving files, so
        the result is exactly ``read().filter(where)`` — pruning only
        changes how much is scanned. At 100 TB this is the difference
        between touching 3 files and 30 000.

        ``prune_only=True`` skips that row-level re-filter and returns
        the SUPERSET held by the surviving files — for callers that
        apply their own exact filter (e.g. a broadcast semi-join
        against the key frame the predicate was derived from). The
        point is cost: ``k IN (25 000 literals)`` prices the manifest
        prune at ~0.1 s but its Catalyst parse/analysis at 2-10 s PER
        READ (r14 measurement); a semi-join is exact and cheap, so
        the string predicate only pays for what it is good at — file
        skipping.

        With ``where``, the schema comes from the commit-log entry
        alone (every delta carries it) and the file list from
        ``candidate_files`` — so a pruned read of a huge-checkpoint
        table never builds the full driver-side snapshot."""
        if where:
            v = version if version is not None else self._current_version()
            schema = T.StructType.fromJson(
                json.loads(self._read_log_entry(v)["schema"])
            )
            files = self.candidate_files(where, v)
        else:
            m = self._manifest(version, need_stats=False)
            schema = T.StructType.fromJson(json.loads(m["schema"]))
            files = m["files"]
        apply_filter = bool(where) and not prune_only
        if not files:
            df = self.spark.createDataFrame([], schema)
            return df.filter(where) if apply_filter else df
        df = self.spark.read.schema(schema).parquet(*files)
        return df.filter(where) if apply_filter else df

    def data_files(self, version: int | None = None) -> list[str]:
        """Public accessor for the snapshot's data-file list (the
        denominator of any skipping claim). ``candidate_files(where)``
        over ``data_files()`` is the manifest-level selectivity a
        layout query can assert on without reaching into the private
        ``_manifest`` structure (r12 advisor)."""
        return list(self._manifest(version, need_stats=False)["files"])

    def candidate_files(self, where: str | None, version: int | None = None) -> list[str]:
        """Manifest files that might contain rows matching ``where`` —
        AND-of-comparisons prune on footer min/max stats (numeric
        comparisons) and per-file Bloom filters (string equality); any
        conjunct the pruner cannot parse is ignored (never prunes), so
        the result is always a superset of the matching files.

        Structure handled (r6): SQL precedence is honored by splitting
        on top-level OR first (a file survives if ANY disjunct admits
        it), then AND within each disjunct; ``BETWEEN a AND b`` with
        numeric bounds rewrites to its two comparisons BEFORE the AND
        split; ``col IN (…)`` prunes as a disjunction of equality
        checks (numeric via min/max, strings via the Bloom filter).
        NOT — and any parenthesis outside an IN list — still disables
        pruning entirely: a free-form boolean tree needs a real parser,
        and an unparsable predicate must stay conservative. Any
        conjunct (or IN item) the pruner cannot parse simply never
        prunes, preserving the superset guarantee.

        Scale (r7): when the snapshot's nearest checkpoint holds more
        than ``DIST_PRUNE_FILES`` files, the prune runs as a SPARK JOB
        over the checkpoint parquet (the Delta pattern): executors
        evaluate the compiled predicate against each row's stats/bloom
        JSON and only the SURVIVING paths return to the driver, which
        then replays the ≤ _CKPT_EVERY delta entries above the
        checkpoint. The driver never materializes the full
        million-file stats map — only the (pruned) candidate list."""
        v = version if version is not None else self._current_version()
        if not where:
            return list(self._manifest(v)["files"])
        disjuncts = _compile_prune_predicate(where)
        if disjuncts is None or all(not c for c in disjuncts):
            return list(self._manifest(v)["files"])
        ckpt_v = self._nearest_ckpt_version(v)
        if (
            ckpt_v is not None
            and self._ckpt_num_files(ckpt_v) > self.DIST_PRUNE_FILES
        ):
            return self._candidate_files_distributed(v, ckpt_v, disjuncts)
        m = self._manifest(v)
        stats = m.get("file_stats", {})
        blooms = m.get("file_blooms", {})
        return [
            f
            for f in m["files"]
            if _prune_admits(disjuncts, stats.get(f, {}), blooms.get(f, {}))
        ]

    def _nearest_ckpt_version(self, v: int) -> int | None:
        """Checkpoint version the snapshot at ``v`` would rebuild from,
        or None when the base is a legacy full-JSON manifest (or the
        empty table)."""
        w = v
        while w >= 1:
            if os.path.exists(self._ckpt_path(w)):
                return w
            if "files" in self._read_log_entry(w):
                return None
            w -= 1
        return None

    def _ckpt_num_files(self, w: int) -> int:
        """File count of a checkpoint from its parquet FOOTER only —
        no row data touches the driver for the threshold decision."""
        import pyarrow.parquet as pq

        return pq.ParquetFile(self._ckpt_path(w)).metadata.num_rows

    def _candidate_files_distributed(
        self, v: int, ckpt_v: int, disjuncts
    ) -> list[str]:
        """Distributed footer-stat prune: map the compiled predicate
        over the checkpoint parquet's (file, stats, blooms) rows on
        executors, collect only survivors, then apply the small delta
        tail driver-side (removes drop survivors; added files carry
        their stats inline in the delta entry and are pruned here)."""
        dj = disjuncts

        def prune_part(it):
            for pdf in it:
                keep = [
                    _prune_admits(
                        dj,
                        json.loads(s) if s else {},
                        json.loads(b) if b else {},
                    )
                    for s, b in zip(pdf["stats"], pdf["blooms"])
                ]
                yield pdf.loc[keep, ["file"]]

        ck = self.spark.read.parquet(self._ckpt_path(ckpt_v)).select(
            "file", "stats", "blooms"
        )
        files = [r["file"] for r in ck.mapInPandas(prune_part, "file string").collect()]
        for w in range(ckpt_v + 1, v + 1):
            d = self._read_log_entry(w)
            removed = set(d["removes"])
            if removed:
                files = [f for f in files if f not in removed]
            for f, sb in d["adds"].items():
                if _prune_admits(dj, sb["s"], sb["b"]):
                    files.append(f)
        return files

    def history(self) -> list[int]:
        if not os.path.isdir(self._manifest_dir):
            return []
        return sorted(
            int(f[1:7]) for f in os.listdir(self._manifest_dir) if f.endswith(".json")
        )

    def diff(self, v_from: int, v_to: int | None = None) -> DataFrame:
        """Row-level change feed between two versions: each output row
        is a table row plus ``_change`` = 'insert' | 'delete' (an update
        appears as its delete+insert pair).

        Data files are immutable, so files shared by both manifests
        cannot contribute changes and are never read: an append-only
        history diffs by scanning ONLY the new files — O(changed data),
        not O(table) — the same pruning Delta's change-data-feed does."""
        m_from = self._manifest(v_from, need_stats=False)
        m_to = self._manifest(
            v_to if v_to is not None else self._current_version(),
            need_stats=False,
        )
        schema = T.StructType.fromJson(json.loads(m_to["schema"]))
        shared = set(m_from["files"]) & set(m_to["files"])
        from_only = [f for f in m_from["files"] if f not in shared]
        to_only = [f for f in m_to["files"] if f not in shared]

        def _read(files: list[str]) -> DataFrame:
            if not files:
                return self.spark.createDataFrame([], schema)
            return self.spark.read.schema(schema).parquet(*files)

        old, new = _read(from_only), _read(to_only)
        return new.exceptAll(old).withColumn("_change", F.lit("insert")).unionByName(
            old.exceptAll(new).withColumn("_change", F.lit("delete"))
        )

    def changes(
        self, key_cols: list[str], v_from: int, v_to: int | None = None
    ) -> DataFrame:
        """Keyed change-data-feed between two versions: ``diff``'s
        insert/delete pairs reclassified through the key —
        ``_change`` ∈ 'insert' (key only in the new version), 'delete'
        (key only in the old), 'update_preimage'/'update_postimage'
        (key in both with changed content) — Delta CDF's four row
        types. One self-join of the diff on the key (the diff is
        already O(changed data) via shared-file pruning, so this join
        is changed-keys-sized, not table-sized)."""
        d = self.diff(v_from, v_to)
        keys_of = (
            d.groupBy(*key_cols)
            .agg(
                F.sum((F.col("_change") == "insert").cast("int")).alias("_ni"),
                F.sum((F.col("_change") == "delete").cast("int")).alias("_nd"),
            )
        )
        both = (F.col("_ni") > 0) & (F.col("_nd") > 0)
        reclass = (
            F.when(both & (F.col("_change") == "delete"), F.lit("update_preimage"))
            .when(both & (F.col("_change") == "insert"), F.lit("update_postimage"))
            .otherwise(F.col("_change"))
        )
        return (
            d.join(F.broadcast(keys_of), key_cols)
            .withColumn("_change", reclass)
            .drop("_ni", "_nd")
        )

    def set_properties(self, updates: dict) -> int:
        """Merge properties in a new (data-unchanged) version."""
        m = self._manifest()
        return self._commit(
            m["files"],
            m["schema"],
            {**m["properties"], **updates},
            base_version=m["version"],
        )

    # -- schema evolution ---------------------------------------------------
    def add_column(self, name: str, data_type: T.DataType) -> int:
        """ALTER TABLE ADD COLUMN — METADATA-ONLY (DDL-01 family,
        tool:387-393 advertises ALTER): no data file is touched; the
        new manifest's schema gains a nullable field, and Spark's
        name-based parquet resolution fills it with NULL for every
        existing file. O(1) commit at any table size — the Delta/
        Iceberg evolution model, not a table rewrite."""
        m = self._manifest()
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        if name in schema.fieldNames():
            raise TableError(f"column '{name}' already exists")
        new_schema = T.StructType(
            [*schema.fields, T.StructField(name, data_type, True)]
        )
        return self._commit(
            m["files"], new_schema.json(), m["properties"],
            base_version=m["version"],
        )

    def drop_column(self, name: str) -> int:
        """ALTER TABLE DROP COLUMN — metadata-only: the column leaves
        the schema; bytes stay in the files (reclaimed by the next
        compact) but no read path can see them. Dropping a primary-key
        column is refused — the PK is the update identifier
        (tool:288)."""
        m = self._manifest()
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        if name not in schema.fieldNames():
            raise TableError(f"column '{name}' does not exist")
        pk = [c for c in m["properties"].get("primary_key", "").split(",") if c]
        if name in pk:
            raise TableError(f"cannot drop primary-key column '{name}'")
        new_schema = T.StructType([f for f in schema.fields if f.name != name])
        if not new_schema.fields:
            raise TableError("cannot drop the last column")
        return self._commit(
            m["files"], new_schema.json(), m["properties"],
            base_version=m["version"],
        )

    # -- writes -------------------------------------------------------------
    def append(self, df: DataFrame, properties_update: dict | None = None) -> int:
        """SNK-01: atomic batch append — all rows or none (tool:241-267).

        ``properties_update`` merges into the table properties in the
        SAME commit — used by streaming ingest to record the batch id
        atomically with its data (idempotent re-delivery).

        Concurrency: appends are logically conflict-free, so a commit
        race is resolved by REBASING — re-read the latest manifest,
        splice this append's (already-written, immutable) data files on
        top of the winner's file list, retry. Data is written exactly
        once regardless of retries; only the manifest attempt repeats."""
        target = T.StructType.fromJson(json.loads(self._manifest()["schema"]))
        aligned = df.select([F.col(f.name).cast(f.dataType) for f in target.fields])
        new_files, new_stats, _ = self._write_data(aligned)
        last_err: Exception | None = None
        for _ in range(20):
            m = self._manifest()
            props = {**m["properties"], **(properties_update or {})}
            try:
                return self._commit(
                    m["files"] + new_files,
                    m["schema"],
                    props,
                    base_version=m["version"],
                    new_stats=new_stats,
                )
            except ConcurrentWriteError as e:
                last_err = e
        raise ConcurrentWriteError(
            f"append could not commit after 20 rebases: {last_err}"
        )

    def overwrite(self, df: DataFrame) -> int:
        m = self._manifest()
        target = T.StructType.fromJson(json.loads(m["schema"]))
        aligned = df.select([F.col(f.name).cast(f.dataType) for f in target.fields])
        new_files, new_stats, _ = self._write_data(aligned)
        return self._commit(
            new_files,
            m["schema"],
            m["properties"],
            base_version=m["version"],
            new_stats=new_stats,
        )

    def _pruned_rewrite(
        self,
        prune_where: str | None,
        transform,
        may_create_rows: bool = False,
        capture: bool = False,
        extra_files=None,
    ):
        """Copy-on-write that rewrites ONLY the files that might hold
        affected rows (footer-stat pruning via candidate_files); every
        other file carries into the new manifest untouched — the Delta
        MERGE/DELETE file-pruning pattern. ``transform`` maps the
        candidate-file DataFrame to its replacement. With an
        unprunable predicate this degrades to a full rewrite, never to
        a wrong answer (candidate_files is always a superset).

        ``may_create_rows``: set when ``transform`` can emit rows even
        from an EMPTY input (upsert's insert side) — then the transform
        runs and writes even with zero candidate files; delete/update
        transforms are row-filters, so zero candidates means a pure
        metadata commit.

        ``capture=True``: ``transform``'s output carries the internal
        ``_sparketl_omit`` / ``_sparketl_cap`` columns (rows to exclude
        from the written files; values to report back from the same
        write job — see ``_write_data``); the return value becomes
        ``(version, captured_values)``."""
        m = self._manifest()
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        all_files = list(m["files"])
        cand = self.candidate_files(prune_where) if prune_where else all_files
        cand_set = set(cand)
        retained = [f for f in all_files if f not in cand_set]
        captured: list = []
        if cand or may_create_rows:
            if cand:
                df = self.spark.read.schema(schema).parquet(*cand)
            else:
                df = self.spark.createDataFrame([], schema)
            out = transform(df)
            cols = [F.col(f.name).cast(f.dataType) for f in schema.fields]
            if capture:
                cols += [F.col("_sparketl_omit"), F.col("_sparketl_cap")]
            aligned = out.select(cols)
            new_files, new_stats, captured = self._write_data(
                aligned, capture=capture
            )
        else:
            new_files, new_stats = [], {}
        if extra_files is not None:
            # driver-side companion files for the SAME commit (the
            # insert side of small-source MERGEs — see _write_local_rows);
            # runs even with zero candidate files, where everything
            # inserts and the Spark job was skipped entirely
            xf, xs = extra_files(captured)
            new_files = new_files + xf
            new_stats = {**new_stats, **xs}
        v = self._commit(
            retained + new_files,
            m["schema"],
            m["properties"],
            base_version=m["version"],
            new_stats=new_stats,
        )
        return (v, captured) if capture else v

    def keyed_update(
        self,
        source: DataFrame,
        key: str,
        set_columns: list[str] | None = None,
        order_by: str | None = None,
    ) -> int:
        """SNK-02 (tool:282-312): MERGE-style keyed update.

        - source rows with NULL ``key`` are skipped silently (tool:295-297)
        - duplicate source keys resolve last-write-wins in source order
          (the reference fires per-row UPDATEs sequentially, §3.3 item 4).
          "Source order" is the order an ``order_by`` column gives, when
          provided; without one it falls back to the physical row order
          (monotonically_increasing_id), which is only deterministic for
          a freshly read/created source — a shuffled source should pass
          an explicit ``order_by``.
        - target rows with no source match pass through unchanged
        - source rows with no target match are dropped (update-only)

        File-pruned (the Delta MERGE pattern): only data files whose
        footer key range intersects the source's [min, max] key are
        rewritten — every other file cannot hold a matched row and
        carries into the new manifest untouched. Non-numeric keys fall
        back to a full rewrite (footer pruning is numeric-only here).
        """
        table_cols = [f.name for f in self.schema().fields]
        if key not in table_cols:
            raise TableError(f"identifier column '{key}' not in table")
        set_columns = set_columns or [c for c in source.columns if c != key]
        missing = [c for c in set_columns if c not in table_cols]
        if missing:
            raise TableError(f"unknown columns in update: {missing}")

        # last-write-wins: keep the final source occurrence per key
        if order_by is not None:
            if order_by not in source.columns:
                raise TableError(f"order column '{order_by}' not in source")
            ordered = source.withColumn("_src_order", F.col(order_by))
        else:
            ordered = source.withColumn(
                "_src_order", F.monotonically_increasing_id()
            )
        w = W.partitionBy(key).orderBy(F.desc("_src_order"))
        src = (
            ordered.filter(F.col(key).isNotNull())  # skip-null semantics
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                F.col(key).alias("_k"),
                *[F.col(c).alias(f"_set_{c}") for c in set_columns],
            )
        )
        # ONE bounded job for the common (micro-batch-sized) source:
        # collect the deduped rows (they cross the driver anyway as a
        # broadcast relation) and rebuild them as a literal broadcast
        # frame — the r14 checkpoint + stats-agg jobs fold into this
        # single collect. limit(N+1) bounds the collect by construction;
        # a giant source truncates and falls back to the r14 shape
        # (one checkpoint materialization, one cheap agg over it).
        rows = src.limit(_DRIVER_SOURCE_ROWS + 1).collect()
        if len(rows) <= _DRIVER_SOURCE_ROWS:
            ks = [r["_k"] for r in rows]
            mn = min(ks) if ks else None
            mx = max(ks) if ks else None
            small = True
            src = self.spark.createDataFrame(rows, src.schema)
        else:
            src = src.localCheckpoint(eager=True)
            stats = src.agg(
                F.count(F.lit(1)).alias("n"),
                F.min("_k").alias("mn"),
                F.max("_k").alias("mx"),
            ).first()
            mn, mx = stats["mn"], stats["mx"]
            small = stats["n"] <= _SMALL_SOURCE_ROWS
        prune = None
        if (
            mn is not None
            and isinstance(mn, (int, float))
            and not isinstance(mn, bool)
        ):
            prune = f"{key} >= {mn} AND {key} <= {mx}"

        def transform(target: DataFrame) -> DataFrame:
            merged = target.join(
                F.broadcast(src) if small else src,
                target[key] == F.col("_k"),
                "left",
            )
            out_cols = []
            for c in target.columns:
                if c in set_columns:
                    out_cols.append(
                        F.when(F.col("_k").isNotNull(), F.col(f"_set_{c}"))
                        .otherwise(F.col(c))
                        .alias(c)
                    )
                else:
                    out_cols.append(F.col(c))
            return merged.select(out_cols)

        return self._pruned_rewrite(prune, transform)

    def upsert(
        self,
        source: DataFrame,
        key: str,
        order_by: str | None = None,
    ) -> int:
        """MERGE upsert: matched target rows take the source's values,
        unmatched source rows insert, unmatched target rows pass
        through — one atomic version commit. Source must carry the full
        table schema (inserts need every column). NULL-key source rows
        are skipped and duplicate source keys resolve last-write-wins,
        matching keyed_update (SNK-02, tool:282-312); the insert side
        is the same left-anti + append shape as SNK-01.

        File-pruned like keyed_update: files outside the source's
        [min, max] key range can hold neither a match nor decide an
        insert (every source key falls inside the candidate range by
        construction), so they carry forward untouched.
        """
        table_cols = [f.name for f in self.schema().fields]
        if key not in table_cols:
            raise TableError(f"identifier column '{key}' not in table")
        missing = [c for c in table_cols if c not in source.columns]
        if missing:
            raise TableError(f"upsert source lacks table columns: {missing}")

        if order_by is not None:
            if order_by not in source.columns:
                raise TableError(f"order column '{order_by}' not in source")
            ordered = source.withColumn("_src_order", F.col(order_by))
        else:
            ordered = source.withColumn(
                "_src_order", F.monotonically_increasing_id()
            )
        schema = self.schema()
        w = W.partitionBy(key).orderBy(F.desc("_src_order"))
        src = (
            ordered.filter(F.col(key).isNotNull())
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            # cast to the table schema HERE (the rewrite's aligned
            # select did it post-merge before; doing it pre-merge keeps
            # the small and large paths' join semantics identical)
            .select(
                *[
                    F.col(f.name).cast(f.dataType).alias(f"_s_{f.name}")
                    for f in schema.fields
                ]
            )
        )
        # ONE bounded job for the common (micro-batch-sized) source:
        # pull the deduped rows to the driver — they would cross the
        # driver anyway as a broadcast relation. The rewrite then needs
        # NO shuffle at all: matched rows rewrite via a broadcast LEFT
        # join over the candidate files only (a full-outer join cannot
        # broadcast and forced a 2-exchange sort-merge join per commit —
        # r15 measurement), the matched keys are CAPTURED from that same
        # write job, and the unmatched source rows — already on the
        # driver — are written as one local parquet file in the SAME
        # commit (O(batch) driver work, the class the broadcast already
        # pays). limit(N+1) bounds the collect by construction; a giant
        # source truncates and falls back to the r14 full-join shape.
        key_t = next(f.dataType for f in schema.fields if f.name == key)
        small_ok = isinstance(
            key_t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.StringType)
        )
        try:
            for f in schema.fields:
                _arrow_type_of(f.dataType)
        except TypeError:
            small_ok = False
        rows = src.limit(_DRIVER_SOURCE_ROWS + 1).collect() if small_ok else []
        if small_ok and len(rows) <= _DRIVER_SOURCE_ROWS:
            keys = [r[f"_s_{key}"] for r in rows]
            mn = min(keys) if keys else None
            mx = max(keys) if keys else None
            src_lit = F.broadcast(self.spark.createDataFrame(rows, src.schema))
            prune = None
            if (
                mn is not None
                and isinstance(mn, (int, float))
                and not isinstance(mn, bool)
            ):
                prune = f"{key} >= {mn} AND {key} <= {mx}"

            def transform(target: DataFrame) -> DataFrame:
                merged = target.join(
                    src_lit, target[key] == F.col(f"_s_{key}"), "left"
                )
                # source-present ⇔ _s_<key> non-null (null keys were
                # dropped) — a matched row takes the source value even
                # when that value is NULL (coalesce would keep the
                # stale target value)
                matched = F.col(f"_s_{key}").isNotNull()
                out_cols = [
                    F.when(matched, F.col(f"_s_{c}")).otherwise(F.col(c)).alias(c)
                    for c in table_cols
                ]
                return merged.select(
                    *out_cols,
                    F.lit(False).alias("_sparketl_omit"),
                    F.when(matched, F.col(f"_s_{key}")).alias("_sparketl_cap"),
                )

            def extra_files(captured):
                matched_keys = set(captured)
                ins = [
                    {c: r[f"_s_{c}"] for c in table_cols}
                    for r in rows
                    if r[f"_s_{key}"] not in matched_keys
                ]
                return self._write_local_rows(ins, schema)

            v, _ = self._pruned_rewrite(
                prune, transform, capture=True, extra_files=extra_files
            )
            return v

        # large / exotic-typed source: the r14 shape — one checkpoint
        # materialization, one cheap agg over it, full-outer rewrite
        src = src.localCheckpoint(eager=True)
        stats = src.agg(
            F.count(F.lit(1)).alias("n"),
            F.min(f"_s_{key}").alias("mn"),
            F.max(f"_s_{key}").alias("mx"),
        ).first()
        n, mn, mx = stats["n"], stats["mn"], stats["mx"]
        if n <= _SMALL_SOURCE_ROWS:
            src = F.broadcast(src)
        prune = None
        if (
            mn is not None
            and isinstance(mn, (int, float))
            and not isinstance(mn, bool)
        ):
            prune = f"{key} >= {mn} AND {key} <= {mx}"

        def transform(target: DataFrame) -> DataFrame:
            merged = target.join(src, target[key] == F.col(f"_s_{key}"), "full")
            # source-present ⇔ _s_<key> non-null (null keys were dropped)
            # — a matched row takes the source value even when that value
            # is NULL (coalesce would silently keep the stale target value)
            matched = F.col(f"_s_{key}").isNotNull()
            out_cols = [
                F.when(matched, F.col(f"_s_{c}")).otherwise(F.col(c)).alias(c)
                for c in target.columns
            ]
            return merged.select(out_cols)

        return self._pruned_rewrite(prune, transform, may_create_rows=True)

    def merge(
        self,
        source: DataFrame,
        condition: str,
        source_is_unique: bool = False,
        key_bounds: tuple[float, float] | None = None,
    ) -> "MergeBuilder":
        """General MERGE (T-SQL ``MERGE INTO`` / Delta ``merge``):
        returns a builder that accumulates WHEN clauses and executes
        them as ONE atomic copy-on-write commit. ``condition``
        references columns as ``target.<col>`` / ``source.<col>``.

        The reference's surface is SQL Server, where MERGE is the
        standard upsert/sync statement (tool:273 ships arbitrary
        user SQL); ``keyed_update``/``upsert`` cover its two common
        shapes, this covers the general statement — conditional
        clauses, DELETE actions, and T-SQL's WHEN NOT MATCHED BY
        SOURCE. See ``Engine.execute`` for the SQL-string front-end.

        ``source_is_unique=True`` is the caller's proof that no target
        row can match two source rows (e.g. the source was deduped to
        one row per join key with ``row_number() = 1``); it skips the
        duplicate-match validation pass — one fewer target-sized join
        per MERGE (r14). Leave it False for arbitrary sources: the
        check then runs, file-pruned to the candidate key range.

        ``key_bounds=(lo, hi)``: a caller-guaranteed SUPERSET of the
        source's join-key range (numeric single-key equality conditions
        only). Skips the bounds aggregation job the file prune
        otherwise runs over the source — callers that just collected
        the key set (CDC appliers) already hold exact bounds. Sound
        because a too-wide range only prunes fewer files; a range that
        misses a source key would corrupt the rewrite, hence
        caller-guaranteed.
        """
        return MergeBuilder(
            self, source, condition, source_is_unique, key_bounds
        )

    def _zorder_bounds_from_manifest(self, cols: list[str]):
        """Exact global [min, max] of the z-order columns folded from
        the manifest's per-file stats — no data pass at all. None when
        any live file lacks finite stats for either column (caller
        falls back to the in-plan aggregate)."""
        m = self._manifest()
        if not m["files"]:
            return None
        out = []
        for c in cols:
            mn = mx = None
            for f in m["files"]:
                st = (m["file_stats"].get(f) or {}).get(c)
                if not st:
                    return None
                lo, hi = st
                if not all(
                    isinstance(v, (int, float))
                    and not isinstance(v, bool)
                    and math.isfinite(v)
                    for v in (lo, hi)
                ):
                    return None
                mn = lo if mn is None else min(mn, lo)
                mx = hi if mx is None else max(mx, hi)
            out.append((float(mn), float(mx)))
        return out

    @staticmethod
    def _zorder_col(df: DataFrame, cols: list[str], bounds_vals=None):
        """Morton (Z-order) key over exactly two numeric columns: each
        value min-max-scales to a 16-bit rank, then the bits interleave
        via the standard mask-spreading closed form — five bitwise ops
        per operand, all inside whole-stage codegen (no per-row loop).
        Scaling bounds come from the manifest's per-file stats when the
        caller has them (``bounds_vals`` — zero extra passes, r15) or
        from one tiny aggregate broadcast onto the scan."""
        if len(cols) != 2:
            raise TableError("zorder_by takes exactly two columns")
        x, y = cols
        if bounds_vals is not None:
            (xmn, xmx), (ymn, ymx) = bounds_vals
            bounds = df.sparkSession.range(1).select(
                F.lit(xmn).alias("__xmn"),
                F.lit(xmx).alias("__xmx"),
                F.lit(ymn).alias("__ymn"),
                F.lit(ymx).alias("__ymx"),
            )
        else:
            bounds = df.agg(
                F.min(F.col(x).cast("double")).alias("__xmn"),
                F.max(F.col(x).cast("double")).alias("__xmx"),
                F.min(F.col(y).cast("double")).alias("__ymn"),
                F.max(F.col(y).cast("double")).alias("__ymx"),
            )

        def rank16(col, mn, mx):
            span = F.when(F.col(mx) > F.col(mn), F.col(mx) - F.col(mn)).otherwise(
                F.lit(1.0)
            )
            return F.floor(
                (F.col(col).cast("double") - F.col(mn)) * 65535.0 / span
            ).cast("long")

        def spread16(c):
            c = c.bitwiseOR(F.shiftleft(c, 8)).bitwiseAND(F.lit(0x00FF00FF))
            c = c.bitwiseOR(F.shiftleft(c, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
            c = c.bitwiseOR(F.shiftleft(c, 2)).bitwiseAND(F.lit(0x33333333))
            c = c.bitwiseOR(F.shiftleft(c, 1)).bitwiseAND(F.lit(0x55555555))
            return c

        with_z = df.join(F.broadcast(bounds)).withColumn(
            "__zorder",
            spread16(rank16(x, "__xmn", "__xmx")).bitwiseOR(
                F.shiftleft(spread16(rank16(y, "__ymn", "__ymx")), 1)
            ),
        )
        return with_z.drop("__xmn", "__xmx", "__ymn", "__ymx")

    def compact(
        self,
        target_partitions: int | None = None,
        sort_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
    ) -> int:
        """OPTIMIZE-style small-file compaction: rewrite the current
        snapshot into ``target_partitions`` files, optionally
        range-sorted by ``sort_by`` so parquet footer min/max stats
        prune scans on those keys — committed as one atomic version
        (readers see the old layout or the new, never a mix), with data
        unchanged and prior versions still readable.

        Append-heavy ingest (the reference's batch ingest pattern,
        tool:241-267) accretes one file per batch; at 100 TB the
        resulting tiny-file scans are task-scheduling-bound. Production
        systems compact per partition directory and only files under a
        size threshold; the commit path — rewrite + atomic manifest
        swap — is identical."""
        df = self.read()
        if target_partitions is None:
            target_partitions = max(
                1, df.sparkSession.sparkContext.defaultParallelism
            )
        if zorder_by:
            # Z-order: partition + sort on the interleaved key so every
            # file covers a small 2-D tile — footer min/max then prunes
            # on BOTH columns (a linear sort prunes only its leading
            # column; the trailing column's stats span every file).
            # r15: scaling bounds fold from the manifest's per-file
            # stats — no in-job bounds aggregate, one fewer pass over
            # the table per compact. The equal-COUNT tile boundaries
            # still come from repartitionByRange: an r15 A/B replacing
            # it with uniform z-range slices + exact hash keys removed
            # the sampling pass but collapsed 16 target tiles to 4 on
            # clustered data (uniform z-RANGE ≠ equal-count), degrading
            # exactly the footer-tile pruning the compact exists for —
            # reverted; the sampler's extra key-column pass is the
            # price of balanced tiles.
            bounds_vals = self._zorder_bounds_from_manifest(zorder_by)
            df = (
                self._zorder_col(df, zorder_by, bounds_vals)
                .repartitionByRange(target_partitions, "__zorder")
                .sortWithinPartitions("__zorder")
                .drop("__zorder")
            )
        elif sort_by:
            df = df.repartitionByRange(
                target_partitions, *sort_by
            ).sortWithinPartitions(*sort_by)
        else:
            df = df.coalesce(target_partitions)
        return self.overwrite(df)

    def vacuum(self, keep_versions: int = 1) -> int:
        """Remove data files (and manifests) no longer referenced by the
        newest ``keep_versions`` versions — the storage-reclaim half of
        compaction. Returns the number of data files deleted.

        Safe by construction: the live pointer is never touched, kept
        manifests keep every file they reference, and deleting an
        orphan is idempotent (a crashed vacuum just leaves orphans for
        the next run) — the same contract as Delta's VACUUM."""
        if keep_versions < 1:
            raise TableError("keep_versions must be >= 1")
        versions = self.history()
        keep = set(versions[-keep_versions:])
        keep.add(self._current_version())
        # deleting a delta entry breaks reconstruction of every LATER
        # version, so each kept version gets its own compacted
        # checkpoint first — then the delta chain beneath it is free
        for v in sorted(keep):
            if not os.path.exists(self._ckpt_path(v)):
                self._write_checkpoint(self._manifest(v))
        referenced: set[str] = set()
        for v in keep:
            referenced.update(self._manifest(v, need_stats=False)["files"])
        removed = 0
        for d in os.listdir(self.root):
            dpath = os.path.join(self.root, d)
            if not (d.startswith("d-") and os.path.isdir(dpath)):
                continue
            for f in os.listdir(dpath):
                fpath = os.path.join(dpath, f)
                if f.endswith(".parquet") and fpath not in referenced:
                    os.remove(fpath)
                    removed += 1
            if not any(f.endswith(".parquet") for f in os.listdir(dpath)):
                import shutil

                shutil.rmtree(dpath)
        for v in versions:
            if v not in keep:
                os.remove(os.path.join(self._manifest_dir, f"v{v:06d}.json"))
                ckpt = self._ckpt_path(v)
                if os.path.exists(ckpt):
                    os.remove(ckpt)
        # vacuumed versions must stop being readable, cached or not
        self._snap_cache = {
            v: s for v, s in self._snap_cache.items() if v in keep
        }
        return removed

    def delete_where(self, predicate: str) -> int:
        """DML-03: DELETE FROM t WHERE predicate.

        SQL DELETE removes only rows where the predicate is TRUE; rows
        where it evaluates to NULL must survive. A bare
        ``NOT (predicate)`` would drop them (NOT NULL is NULL → filtered
        out), so keep rows where the predicate is not-true instead.

        File-pruned: only files whose footer stats admit a TRUE row are
        rewritten (a pruned-out file cannot contain a deleted row);
        unprunable predicates fall back to a full rewrite."""
        return self._pruned_rewrite(
            predicate,
            lambda df: df.filter(F.expr(f"NOT coalesce(({predicate}), false)")),
        )


# broadcast gate for MERGE/update sources (typically spreadsheet- or
# micro-batch-sized); sources above this row count join distributed
_SMALL_SOURCE_ROWS = 1_000_000

# Sources up to this many (deduped) rows are pulled to the driver and
# rebuilt as a literal broadcast frame — one bounded job replaces the
# r14 checkpoint + stats-agg pair. Small enough that the collect is
# never heavier than the broadcast those sources get anyway.
_DRIVER_SOURCE_ROWS = 100_000


def _is_small(df: DataFrame, limit: int = _SMALL_SOURCE_ROWS) -> bool:
    """Heuristic broadcast gate for the update source (typically a
    spreadsheet-sized batch)."""
    n = df.limit(limit + 1).count()
    return n <= limit


def incremental_agg(
    table: ManagedTable,
    prev_agg: DataFrame,
    v_from: int,
    group_cols: list[str],
    count_col: str = "n",
    sum_col: str | None = None,
    sum_expr: str | None = None,
) -> DataFrame:
    """Maintain a grouped count/sum aggregate incrementally from the
    table's change feed: ``new_agg = prev_agg ⊎ agg(diff)``, where
    inserts contribute +1/+x and deletes −1/−x.

    Cost is O(changed data) — ``diff`` reads only files not shared by
    the two manifests — versus O(table) for a full recompute: the
    materialized-view maintenance pattern that keeps a 100 TB rollup
    fresh after each ingest batch. Counts/sums are the self-maintainable
    aggregates; min/max are not (a delete of the current extremum needs
    a rescan of its group) — ``incremental_extremum`` maintains those
    with group-targeted rescans.

    ``sum_expr`` is a SQL expression evaluated per changed row (cast to
    an exact decimal inside to keep merge order irrelevant); the output
    sum column is named ``sum_col``."""
    delta = table.diff(v_from)
    sign = F.when(F.col("_change") == F.lit("insert"), F.lit(1)).otherwise(
        F.lit(-1)
    )
    aggs = [F.sum(sign).alias(count_col)]
    cols = [*group_cols, count_col]
    if sum_col is not None:
        expr = sum_expr if sum_expr is not None else sum_col
        aggs.append(
            F.sum(sign.cast("decimal(20,2)") * F.expr(expr).cast("decimal(20,2)"))
            .alias(sum_col)
        )
        cols.append(sum_col)
    d_agg = delta.groupBy(*group_cols).agg(*aggs)
    prev = prev_agg.select(*cols)
    merged = (
        prev.unionByName(d_agg.select(*cols))
        .groupBy(*group_cols)
        .agg(
            *(
                [F.sum(count_col).alias(count_col)]
                + ([F.sum(sum_col).alias(sum_col)] if sum_col else [])
            )
        )
        .filter(F.col(count_col) > 0)
    )
    return merged


def incremental_join_agg(
    table_a: "ManagedTable",
    table_b: "ManagedTable",
    prev_agg: DataFrame,
    va_from: int,
    vb_from: int,
    join_key: str,
    group_cols: list[str],
    count_col: str = "n",
    sum_col: str | None = None,
    sum_expr: str | None = None,
) -> DataFrame:
    """Maintain a grouped aggregate over an EQUI-JOIN VIEW
    ``A ⋈_key B`` incrementally from both tables' change feeds — the
    counting algorithm (Gupta & Mumick): with signed row deltas
    (insert = +1, delete = −1; an update is its ±pair),

        V_new = V_old  +  ΔA ⋈ B_new  +  A_new ⋈ ΔB  −  ΔA ⋈ ΔB

    holds as a signed multiset identity (the −ΔA⋈ΔB term removes the
    double count when both sides of a pair changed in the same batch).
    The maintained artifact here is the aggregate of V, so the three
    delta joins feed signed count/sum contributions into the same
    ``prev ⊎ delta`` combine as ``incremental_agg``.

    Cost is O(changed data): each delta term joins a diff (shared-file
    pruned, delta-sized) against the other table — at 100 TB that is a
    broadcast or bucket-pruned join on the equi-key, never a rescan of
    the unchanged view; a full recompute would re-shuffle both fact
    tables. Counts and sums are the self-maintainable aggregates
    (same caveat as ``incremental_agg``: min/max are not).

    ``sum_expr`` may reference columns of either side (evaluated on
    the joined row, cast to exact decimal so merge order is
    irrelevant). ``group_cols`` may also come from either side —
    including the B side, so a dimension UPDATE that moves a row
    between groups maintains correctly (its −pre/+post pair lands in
    both groups)."""
    return signed_join_agg(
        table_a.diff(va_from).withColumnRenamed("_change", "_ch_a"),
        table_b.diff(vb_from).withColumnRenamed("_change", "_ch_b"),
        table_a.read(),
        table_b.read(),
        prev_agg,
        join_key,
        group_cols,
        count_col=count_col,
        sum_col=sum_col,
        sum_expr=sum_expr,
    )


def incremental_extremum(
    table: "ManagedTable",
    prev_agg: DataFrame,
    v_from: int,
    group_cols: list[str],
    value_col: str,
    agg: str = "min",
    out_col: str | None = None,
) -> DataFrame:
    """Maintain a grouped MIN/MAX incrementally — the aggregate class
    ``incremental_agg`` documents as NOT self-maintainable (a delete
    of the current extremum invalidates the stored value). The
    standard fix: inserts tighten the extremum for free
    (``least``/``greatest`` with the batch's own extremum); deletes
    are checked against the stored extremum, and ONLY the groups
    where a delete ties-or-beats it are re-scanned — a group-targeted
    recompute, pushed down as a semi-join on the group key, so at
    100 TB it prunes to the affected groups' partitions instead of
    rescanning the table. Groups whose rows all vanish necessarily
    had their extremum deleted, land in the rescan set, and drop out
    naturally (the rescan returns no row for them). A stored extremum
    of NULL (every row of the group had a NULL value) beats nothing
    under ``<=``/``>=`` three-valued logic, so such groups are routed
    to the rescan on ANY delete explicitly — otherwise deleting the
    group's last rows would leave a stale (group, NULL) row that a
    full recompute drops (r10 advisor finding).
    """
    out_col = out_col or f"{agg}_{value_col}"
    lo = agg.lower()
    if lo not in ("min", "max"):
        raise TableError("incremental_extremum supports min/max only")
    fold = F.least if lo == "min" else F.greatest
    agg_fn = F.min if lo == "min" else F.max
    beats = "<=" if lo == "min" else ">="

    delta = table.diff(v_from)
    ins = (
        delta.filter(F.col("_change") == "insert")
        .groupBy(*group_cols)
        .agg(agg_fn(value_col).alias("_ins_ext"))
    )
    # groups where a deleted value ties-or-beats the stored extremum
    affected = (
        delta.filter(F.col("_change") == "delete")
        .join(prev_agg.select(*group_cols, F.col(out_col).alias("_prev")),
              group_cols)
        .filter(F.expr(f"_prev IS NULL OR {value_col} {beats} _prev"))
        .select(*group_cols)
        .distinct()
    )
    rescanned = (
        table.read()
        .join(affected, group_cols, "left_semi")
        .groupBy(*group_cols)
        .agg(agg_fn(value_col).alias(out_col))
    )
    unaffected = (
        prev_agg.select(*group_cols, F.col(out_col).alias("_prev"))
        .join(affected, group_cols, "left_anti")
        # inserts into an AFFECTED group are covered by its rescan —
        # anti-join them out or the full_outer would re-admit the group
        .join(ins.join(affected, group_cols, "left_anti"), group_cols,
              "full_outer")
        .select(
            *group_cols,
            fold(
                F.coalesce("_prev", "_ins_ext"),
                F.coalesce("_ins_ext", "_prev"),
            ).alias(out_col),
        )
        # a brand-new group whose inserts were ALSO all deleted in the
        # same span never reaches prev_agg or the rescan set; diff's
        # exceptAll already cancels such pairs, so _ins_ext is real
    )
    return unaffected.unionByName(rescanned)


def incremental_hll_registers(
    table: "ManagedTable",
    prev_regs: DataFrame,
    v_from: int,
    group_cols: list[str],
    value_col: str,
    salt: str = "hllu:",
) -> DataFrame:
    """Maintain a per-group HLL NDV register table from the change
    feed (r10, judge task 7 — ext_144's persistable registers meet
    ext_87/142's delta pattern): the batch's INSERT rows build delta
    registers in one pass over the DELTA only, which fold into the
    stored table by max per (group, idx) — O(changed data +
    groups×256), never a rescan of old data. Register max is
    insert-only-monotone, so the fold equals the full recompute
    exactly (max is associative; ext_146's oracle hash-checks this).

    DELETE CAVEAT (by design): registers cannot shrink, so deletes in
    the feed are IGNORED and the sketch estimates EVER-SEEN NDV — the
    standard HLL limitation. If live-set NDV under deletion is
    required, rebuild the group's registers from a rescan (the
    incremental_extremum rescan pattern) or use a counting sketch.
    """
    from sparketl.operators.text import hll_registers, merge_hll_registers

    ins = table.diff(v_from).filter(F.col("_change") == "insert")
    delta = hll_registers(ins, group_cols, value_col, salt)
    return merge_hll_registers(prev_regs, delta, group_cols)


def signed_join_agg(
    da: DataFrame,
    db: DataFrame,
    a_new: DataFrame,
    b_new: DataFrame,
    prev_agg: DataFrame,
    join_key: str,
    group_cols: list[str],
    count_col: str = "n",
    sum_col: str | None = None,
    sum_expr: str | None = None,
) -> DataFrame:
    """The counting-algorithm combine behind ``incremental_join_agg``,
    over explicit signed-delta frames (``_ch_a`` / ``_ch_b`` ∈
    'insert' | 'delete') — callers without a ManagedTable change feed
    (e.g. the ext_142 fixture query) derive their deltas elsewhere and
    reuse the identical algebra."""
    sign_a = F.when(F.col("_ch_a") == "insert", F.lit(1)).otherwise(F.lit(-1))
    sign_b = F.when(F.col("_ch_b") == "insert", F.lit(1)).otherwise(F.lit(-1))

    terms = [
        (da.join(b_new, join_key), sign_a),
        (a_new.join(db, join_key), sign_b),
        (da.join(db, join_key), -(sign_a * sign_b)),
    ]
    parts = []
    for joined, sign in terms:
        aggs = [F.sum(sign).alias(count_col)]
        cols = [*group_cols, count_col]
        if sum_col is not None:
            expr = sum_expr if sum_expr is not None else sum_col
            aggs.append(
                F.sum(
                    sign.cast("decimal(20,2)")
                    * F.expr(expr).cast("decimal(20,2)")
                ).alias(sum_col)
            )
            cols.append(sum_col)
        parts.append(joined.groupBy(*group_cols).agg(*aggs).select(*cols))
    cols = [*group_cols, count_col] + ([sum_col] if sum_col else [])
    delta = parts[0].unionByName(parts[1]).unionByName(parts[2])
    merged = (
        prev_agg.select(*cols)
        .unionByName(delta)
        .groupBy(*group_cols)
        .agg(
            *(
                [F.sum(count_col).alias(count_col)]
                + ([F.sum(sum_col).alias(sum_col)] if sum_col else [])
            )
        )
        .filter(F.col(count_col) > 0)
    )
    return merged


class MergeBuilder:
    """Accumulates MERGE ``WHEN`` clauses and executes them as one
    atomic copy-on-write commit (T-SQL MERGE semantics, SQL Server's
    general upsert statement — the reference's pass-through surface).

    Clause semantics (all T-SQL):

    - clauses are tried in DECLARATION order within their row
      category; the first clause whose condition holds fires, the
      rest are skipped for that row;
    - a matched target row that no matched-clause fires on (or with
      no matched clauses at all) carries through unchanged, as does
      a target-only row with no BY SOURCE clause;
    - a source-only row that no insert clause fires on is dropped;
    - a target row matched by MORE THAN ONE source row raises
      ``TableError`` when any WHEN MATCHED clause exists — SQL
      Server's "attempted to UPDATE or DELETE the same row more than
      once" rule (Delta enforces the same);
    - assignment / condition / value expressions are Spark SQL
      referencing ``target.<col>`` and ``source.<col>``; unqualified
      names are resolved by Spark only when unambiguous.

    Scale: the rewrite is file-pruned exactly like ``upsert`` when
    the ON condition is a single numeric-key equality — only files
    whose footer range intersects the source's [min, max] key are
    read and rewritten. WHEN NOT MATCHED BY SOURCE clauses act on
    target rows in NON-candidate files too, so their presence forces
    a full rewrite (correctness over pruning).
    """

    def __init__(
        self,
        table: ManagedTable,
        source: DataFrame,
        condition: str,
        source_is_unique: bool = False,
        key_bounds: tuple[float, float] | None = None,
    ):
        self.table = table
        self.source = source
        self.condition = condition
        self.source_is_unique = source_is_unique
        self.key_bounds = key_bounds
        # (category, action, assignments, clause_condition)
        self._clauses: list[tuple[str, str, dict | None, str | None]] = []

    # -- clause builders (each returns self for chaining) -------------------

    def when_matched_update(
        self, assignments: dict[str, str], condition: str | None = None
    ) -> "MergeBuilder":
        self._clauses.append(("matched", "update", dict(assignments), condition))
        return self

    def when_matched_delete(self, condition: str | None = None) -> "MergeBuilder":
        self._clauses.append(("matched", "delete", None, condition))
        return self

    def when_not_matched_insert(
        self,
        values: dict[str, str] | None = None,
        condition: str | None = None,
    ) -> "MergeBuilder":
        """``values=None`` is INSERT-by-name (Delta's ``INSERT *``):
        every target column takes ``source.<col>``."""
        self._clauses.append(
            ("not_matched", "insert", dict(values) if values else None, condition)
        )
        return self

    def when_not_matched_by_source_update(
        self, assignments: dict[str, str], condition: str | None = None
    ) -> "MergeBuilder":
        self._clauses.append(
            ("by_source", "update", dict(assignments), condition)
        )
        return self

    def when_not_matched_by_source_delete(
        self, condition: str | None = None
    ) -> "MergeBuilder":
        self._clauses.append(("by_source", "delete", None, condition))
        return self

    # -- execution -----------------------------------------------------------

    _EQ_COND = re.compile(
        r"^\s*(?:target\.(\w+)\s*=\s*source\.(\w+)"
        r"|source\.(\w+)\s*=\s*target\.(\w+))\s*$",
        re.IGNORECASE,
    )

    def _validate(self) -> None:
        if not self._clauses:
            raise TableError("MERGE requires at least one WHEN clause")
        table_cols = {f.name for f in self.table.schema().fields}
        for cat, action, assigns, _cond in self._clauses:
            if action == "update":
                bad = [c for c in assigns if c not in table_cols]
                if bad:
                    raise TableError(f"unknown columns in UPDATE SET: {bad}")
            if action == "insert" and assigns is not None:
                bad = [c for c in assigns if c not in table_cols]
                if bad:
                    raise TableError(f"unknown columns in INSERT: {bad}")

    def _check_duplicate_matches(self, prune: str | None = None) -> None:
        """SQL Server rule: error when any WHEN MATCHED clause exists
        and one target row is matched by multiple source rows.

        With a prunable equality condition the check reads only the
        candidate files (r14): a matched target row must carry a key
        inside the source's [min, max] range, and ``candidate_files``
        is a superset of the files whose footer range admits such a
        key — so non-candidate files cannot hold a matched row and the
        duplicate count over the pruned read equals the full-scan
        count. Previously this validation was an unpruned full pass
        over the target per MERGE."""
        tgt = (
            (
                self.table.read(where=prune, prune_only=True)
                if prune
                else self.table.read()
            )
            .withColumn("_sparketl_tid", F.monotonically_increasing_id())
            .alias("target")
        )
        src = self.source.alias("source")
        dup = (
            tgt.join(src, F.expr(self.condition), "inner")
            .groupBy("_sparketl_tid")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise TableError(
                "MERGE attempted to UPDATE or DELETE the same target row "
                "more than once (a target row matches multiple source rows)"
            )

    def execute(
        self,
        capture_matched: str | None = None,
        driver_inserts: bool = False,
        insert_candidates: list[dict] | None = None,
    ):
        """Run the MERGE as one atomic commit; returns the new version.

        ``capture_matched``: a Spark SQL expression over ``target.``/
        ``source.`` columns evaluated on every MATCHED row (pre-image
        visible) during the MERGE's own candidate-file read — its
        distinct values ride back from the write job and the return
        value becomes ``(version, captured_values)``. This is how a CDC
        applier learns the matched rows' OLD group keys without a
        separate pre-merge lookup job (r15); requires at least one
        WHEN MATCHED clause.

        ``driver_inserts=True`` (r15): for a DRIVER-SIZED source (a
        literal frame the caller built from collected micro-batch rows)
        the full-outer rewrite join — which can never broadcast and
        forces a 2-exchange sort-merge join of the candidate files per
        commit — is replaced by a broadcast LEFT join (map-only over
        candidate files): matched source keys are captured from the
        write job, the single WHEN NOT MATCHED INSERT clause is
        evaluated on the local source relation (no Spark job), and the
        surviving insert rows are written driver-side into the SAME
        commit. Requires a single-key equality condition and exactly
        one insert clause; the source must be local-collectable.

        ``insert_candidates``: caller-pre-evaluated insert rows for the
        driver_inserts path — a list of ``{table_col: value, ...,
        "_sparketl_k": source_key}`` dicts that MUST equal what the
        single insert clause would produce for every source row whose
        clause condition holds (callers that just built the source rows
        can produce this trivially). Skips the clause-evaluation job a
        generic expression needs."""
        self._validate()
        has_matched = any(c[0] == "matched" for c in self._clauses)
        has_by_source = any(c[0] == "by_source" for c in self._clauses)
        if capture_matched is not None and not has_matched:
            raise TableError(
                "capture_matched requires a WHEN MATCHED clause"
            )

        # file pruning: single numeric-key equality AND no BY SOURCE
        # clauses (those must see target rows in non-candidate files).
        # Computed BEFORE the duplicate-match validation so the check
        # can read only the candidate files (r14).
        prune = None
        src_key = None
        m = self._EQ_COND.match(self.condition)
        if m is not None and not has_by_source:
            key = m.group(1) or m.group(4)
            src_key = m.group(2) or m.group(3)
            mn = mx = None
            if self.key_bounds is not None:
                lo, hi = self.key_bounds  # caller-guaranteed superset
                if (
                    isinstance(lo, (int, float))
                    and isinstance(hi, (int, float))
                    and not isinstance(lo, bool)
                    and not isinstance(hi, bool)
                ):
                    if lo > hi:
                        # a swapped tuple would silently prune EVERY
                        # candidate file (matched rows carried forward
                        # untouched while inserts append) — the worst
                        # failure mode, so it is an error, not a fallback
                        raise TableError(
                            f"key_bounds lower bound {lo} exceeds upper "
                            f"bound {hi} — pass (lo, hi)"
                        )
                    mn, mx = lo, hi
                # non-numeric bounds: fall through to computed bounds
            if mn is None:
                bounds = self.source.agg(
                    F.min(src_key).alias("mn"), F.max(src_key).alias("mx")
                ).first()
                mn, mx = bounds["mn"], bounds["mx"]
            if (
                mn is not None
                and isinstance(mn, (int, float))
                and not isinstance(mn, bool)
            ):
                prune = f"{key} >= {mn} AND {key} <= {mx}"

        if has_matched and not self.source_is_unique:
            self._check_duplicate_matches(prune)

        table_schema = self.table.schema()
        table_cols = [f.name for f in table_schema.fields]
        clauses = list(self._clauses)
        condition = self.condition
        source = self.source
        has_insert = any(c[1] == "insert" for c in clauses)
        use_capture = capture_matched is not None or driver_inserts

        ins_rows: list = []
        if driver_inserts:
            insert_clauses = [c for c in clauses if c[1] == "insert"]
            if src_key is None:
                raise TableError(
                    "driver_inserts requires a single-key equality ON condition"
                )
            if len(insert_clauses) != 1:
                raise TableError(
                    "driver_inserts requires exactly one WHEN NOT MATCHED clause"
                )
            for f in table_schema.fields:
                _arrow_type_of(f.dataType)  # raises for exotic types
            if insert_candidates is not None:
                # caller-pre-evaluated (no job)
                ins_rows = insert_candidates
            else:
                # evaluate the insert clause with Spark on the (tiny,
                # single-partition) source — one 1-task job; callers on
                # a hot path pass insert_candidates instead
                _, _, iassigns, icond = insert_clauses[0]
                s = source.alias("source")
                flt = s.filter(F.expr(icond)) if icond is not None else s
                sel = []
                for f in table_schema.fields:
                    if iassigns is None:
                        v = F.col(f"source.{f.name}")
                    elif f.name in iassigns:
                        v = F.expr(iassigns[f.name])
                    else:
                        v = F.lit(None)
                    sel.append(v.cast(f.dataType).alias(f.name))
                sel.append(F.col(f"source.{src_key}").alias("_sparketl_k"))
                ins_rows = flt.select(sel).collect()

        def transform(target_df: DataFrame) -> DataFrame:
            tgt = (
                target_df.withColumn("_sparketl_t", F.lit(1))
                .withColumn("_sparketl_tid", F.monotonically_increasing_id())
                .alias("target")
            )
            src = source.withColumn("_sparketl_s", F.lit(1)).alias("source")
            if driver_inserts:
                # inserts are handled driver-side from the collected
                # source; the join only needs matched rows → broadcast
                # LEFT join, map-only over the candidate files (a full
                # outer join can never broadcast)
                src = F.broadcast(src)
                how = "left"
            else:
                how = "full" if has_insert else "left"
            joined = tgt.join(src, F.expr(condition), how)
            t_here = F.col("target._sparketl_t").isNotNull()
            s_here = F.col("source._sparketl_s").isNotNull()
            cat_pred = {
                "matched": t_here & s_here,
                "not_matched": s_here & ~t_here,
                "by_source": t_here & ~s_here,
            }
            # first-match-wins action id per row; 0 = no clause fires
            action = None
            for i, (cat, _act, _assigns, cond) in enumerate(clauses, start=1):
                pred = cat_pred[cat]
                if cond is not None:
                    pred = pred & F.expr(cond)
                action = (
                    F.when(pred, F.lit(i))
                    if action is None
                    else action.when(pred, F.lit(i))
                )
            joined = joined.withColumn("_sparketl_a", action.otherwise(F.lit(0)))
            # drop deletes and unfired source-only rows
            delete_ids = [
                i for i, c in enumerate(clauses, start=1) if c[1] == "delete"
            ]
            keep = ~F.col("_sparketl_a").isin(delete_ids) if delete_ids else F.lit(True)
            keep = keep & (t_here | (F.col("_sparketl_a") != 0))
            if use_capture:
                # dropped rows must still REACH the write job so their
                # captured pre-image comes back: mark instead of filter
                # (the writer excludes _sparketl_omit rows from the file)
                if driver_inserts:
                    cap_val = F.struct(
                        F.col(f"source.{src_key}").alias("k"),
                        (
                            F.expr(capture_matched)
                            if capture_matched is not None
                            else F.lit(None).cast("string")
                        ).alias("c"),
                    )
                else:
                    cap_val = F.expr(capture_matched)
                joined = joined.withColumn(
                    "_sparketl_omit", ~keep
                ).withColumn(
                    "_sparketl_cap", F.when(t_here & s_here, cap_val)
                )
            else:
                joined = joined.filter(keep)
            # output columns: per target column, CASE over fired clause
            out_cols = []
            for c in table_cols:
                col = F.col(f"target.{c}")
                for i, (cat, act, assigns, _cond) in enumerate(clauses, start=1):
                    if act == "update" and c in assigns:
                        col = F.when(
                            F.col("_sparketl_a") == i, F.expr(assigns[c])
                        ).otherwise(col)
                    elif act == "insert":
                        if assigns is None:
                            val = F.col(f"source.{c}")
                        elif c in assigns:
                            val = F.expr(assigns[c])
                        else:
                            val = F.lit(None)
                        col = F.when(
                            F.col("_sparketl_a") == i, val
                        ).otherwise(col)
                out_cols.append(col.alias(c))
            extra = (
                [F.col("_sparketl_omit"), F.col("_sparketl_cap")]
                if use_capture
                else []
            )
            projected = joined.select(
                t_here.alias("_sparketl_th"),
                F.col("_sparketl_a"),
                F.col("target._sparketl_tid").alias("_sparketl_tid"),
                *out_cols,
                *extra,
            )
            if not has_matched:
                # without matched clauses a target row matched by k
                # source rows fans out to k identical pass-through
                # copies (with matched clauses the duplicate-match
                # check already forbade fan-out) — keep one per target
                # row id; the dedup shuffle keys on the unique tid, so
                # there is no skew, and fired rows (inserts/by-source)
                # bypass it untouched
                fired = projected.filter(
                    ~F.col("_sparketl_th") | (F.col("_sparketl_a") != 0)
                )
                passthrough = projected.filter(
                    F.col("_sparketl_th") & (F.col("_sparketl_a") == 0)
                ).dropDuplicates(["_sparketl_tid"])
                projected = fired.unionByName(passthrough)
            out_names = table_cols + (
                ["_sparketl_omit", "_sparketl_cap"] if use_capture else []
            )
            return projected.select(out_names)

        cap_out: list = []

        def extra_files(captured):
            # driver-side insert file for the SAME commit: source rows
            # whose key matched no target row (the captured set) insert
            matched_keys = set()
            for v in captured:
                matched_keys.add(v["k"])
                if v["c"] is not None:
                    cap_out.append(v["c"])
            ins = [
                {c: r[c] for c in table_cols}
                for r in ins_rows
                if r["_sparketl_k"] not in matched_keys
            ]
            return self.table._write_local_rows(ins, table_schema)

        res = self.table._pruned_rewrite(
            prune,
            transform,
            may_create_rows=has_insert and not driver_inserts,
            capture=use_capture,
            extra_files=extra_files if driver_inserts else None,
        )
        if not use_capture:
            return res
        v, captured = res
        if driver_inserts:
            # extra_files already split the struct captures
            seen: set = set()
            captured = [
                c for c in cap_out if not (c in seen or seen.add(c))
            ]
        return (v, captured) if capture_matched is not None else v
