"""Fixture-table loading and view registration.

Mirrors the reference's "connect → pick database → tables become
queryable" flow (SQL_DATA_INTEGRATION_TOOL.py:146-181) for the parquet
fixture layout: every table in a directory becomes a temp view, so both
the DataFrame API and ``spark.sql`` see the same names.

Scans stay declarative (``spark.read.parquet``) so Catalyst pushes
filters/column pruning into the parquet reader — at 100 TB this is the
difference between reading 3 columns and reading 40.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always broadcast in joins. On a
# real cluster these are a few MB even at sf100 — broadcasting them
# removes the shuffle on the fact side entirely.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _murmur3_int32(x: int, seed: int = 42) -> int:
    """MurmurHash3 x86_32 of one 32-bit int — bit-exact with Spark's
    ``hash()``/``HashPartitioning`` for an IntegerType column (Austin
    Appleby's public-domain algorithm, the hashInt fast path). Pinned
    against ``F.hash`` by pytest so ``exact_hash_partition_keys`` can
    never silently drift from the engine."""
    m = 0xFFFFFFFF

    def rotl(v: int, r: int) -> int:
        return ((v << r) | (v >> (32 - r))) & m

    k1 = (x & m) * 0xCC9E2D51 & m
    k1 = rotl(k1, 15)
    k1 = (k1 * 0x1B873593) & m
    h1 = (seed & m) ^ k1
    h1 = rotl(h1, 13)
    h1 = (h1 * 5 + 0xE6546B64) & m
    h1 ^= 4  # total byte length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & m
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & m
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def exact_hash_partition_keys(n: int) -> list[int]:
    """Small ints ``k_0..k_{n-1}`` with ``pmod(hash(k_i), n) == i`` —
    tagging a row with ``k_c`` and ``repartition(n, tag)`` places it in
    partition ``c`` EXACTLY, with no RangePartitioner sampling pass and
    no hash-collision imbalance (guide §2.5: n distinct values hashed
    into n partitions collide; these keys are chosen not to)."""
    found: dict[int, int] = {}
    i = 0
    while len(found) < n:
        p = _murmur3_int32(i) % n
        if p not in found:
            found[p] = i
        i += 1
    return [found[p] for p in range(n)]


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Make ``events.ts`` a plain µs TimestampType regardless of how the
    session read the parquet TIMESTAMP(NANOS) column.

    Spark versions differ here: with ``spark.sql.legacy.parquet.nanosAsLong``
    honored the column arrives as epoch-ns LongType; newer readers (this
    container's 4.1.x) surface it natively as TIMESTAMP_NTZ and ignore the
    legacy conf. Downstream operators use ``unix_micros`` (TIMESTAMP-only),
    so both shapes are normalized to TimestampType. The NTZ→LTZ cast uses
    the session time zone, so it is pinned to UTC HERE — not only in
    ``load_table`` — because the streaming readers (``read_event_stream``,
    ``read_staged_stream``) stage the raw fixture themselves and would
    otherwise shift wall-clock values on a non-UTC session, diverging
    from DuckDB's tz-naive reading of the same file.
    """
    df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":  # legacy nanos-as-long: ns → µs integer truncation
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Every entry point must be self-sufficient under an externally
    # constructed vanilla SparkSession (the driver's), so session-level
    # prerequisites are (re)applied here, not only in the session factory.
    # UTC makes the TIMESTAMP_NTZ→TIMESTAMP cast in normalize_events_ts a
    # wall-clock identity, matching DuckDB's tz-naive view of the parquet.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        # Honored on older readers (nanos → LongType); silently ignored on
        # readers that support TIMESTAMP(NANOS) natively as NTZ.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_events_ts(df)
    return df


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure enough partitions for compute-heavy per-row operators.

    Small fixture tables arrive as one parquet file → one partition →
    one core. On a real cluster the input is thousands of files, so
    parallelism is natural; locally this round-robin repartition stands
    in for that. Only used ahead of expensive per-row work (hashing,
    shingling, vector math) where the shuffle cost is trivially repaid.
    """
    if min_partitions is None:
        min_partitions = df.sparkSession.sparkContext.defaultParallelism
    # Pure-metadata parallelism probe — no job, no DataFrame→RDD
    # lineage conversion anywhere (df.rdd.getNumPartitions() would
    # force one on every call). The leaf file COUNT bounds scan
    # parallelism from below; large files additionally split at
    # maxPartitionBytes, so estimated splits = Σ ceil(size/split) per
    # file. A many-file or big-file input (the cluster case)
    # short-circuits untouched; only genuinely narrow scans — and
    # fileless in-memory frames, which at fixture scale shuffle for
    # pennies — pay the round-robin repartition.
    files = df.inputFiles()
    if len(files) >= min_partitions:
        return df
    if files:
        raw = df.sparkSession.conf.get(
            "spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024)
        ).strip().lower()
        units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
        digits = raw.rstrip("kmgb")
        suffix = raw[len(digits):].rstrip("b")
        max_split = int(digits) * units.get(suffix, 1) if digits else 128 << 20
        est = 0
        for f in files:
            p = f[7:] if f.startswith("file:") and f[5:7] == "//" else f
            try:
                size = os.path.getsize(p)
            except OSError:
                size = 0
            est += max(1, -(-size // max_split))
            if est >= min_partitions:
                return df
    return df.repartition(min_partitions)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Load every fixture table and register it as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in names:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
