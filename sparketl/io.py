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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.ts is parquet TIMESTAMP(NANOS), which a vanilla Spark 4
    # session refuses to read (PARQUET_TYPE_ILLEGAL). The legacy conf is
    # runtime-settable, so set it here rather than in the session
    # factory: every entry point (including an externally constructed
    # SparkSession handed to queries()) must be self-sufficient.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    # events.ts is parquet TIMESTAMP(NANOS): with
    # spark.sql.legacy.parquet.nanosAsLong it arrives as epoch-ns long;
    # convert to µs-precision TimestampType (integer div — same
    # truncation DuckDB's epoch_us applies).
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
    if df.rdd.getNumPartitions() >= min_partitions:
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
