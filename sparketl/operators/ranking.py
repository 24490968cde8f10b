"""Distributed total-order ranking without a single-task window.

``row_number() OVER (ORDER BY …)`` with no partition spec moves the
whole table through ONE task — the unpartitioned-window trap this repo
bans from every hot path. This module assigns exact 1-based global
ranks the scale-safe way (the classic two-phase distributed ranking):

1. range-repartition on the order key (Spark's distributed sort
   machinery picks balanced boundaries by sampling);
2. rank locally inside each partition (a window PARTITIONED by the
   physical partition id — bounded by one partition's rows);
3. add each partition's starting offset, computed from a per-partition
   count aggregate (≤ num-partitions rows) broadcast back.

The partitioning itself is pinned with a lazy localCheckpoint: range
boundaries come from sampling, so the offsets job and the rank job
must see the SAME placement — ranks are a pure function of the data
either way, but only if both phases agree on who holds what.

The reference delegates ranking to SQL Server (ROW_NUMBER in
passthrough queries, SQL_DATA_INTEGRATION_TOOL.py:273); this is the
engine-side equivalent that still works when one group is the whole
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "_rank",
    partitions: int | None = None,
) -> DataFrame:
    """Add an exact 1-based row_number-style permutation rank over
    ``order_cols``.

    The combined ``order_cols`` key must be unique (append a tiebreak
    column if needed) — ranks are then a deterministic permutation,
    identical to ``ROW_NUMBER() OVER (ORDER BY order_cols)`` in any
    engine, with no global single-task sort.
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    if partitions is None:
        partitions = df.sparkSession.sparkContext.defaultParallelism
    ranked = (
        df.repartitionByRange(partitions, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = ranked.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    # cumulative offsets via a triangular self-join over the
    # ≤ `partitions`-row counts frame — a constant-partition window
    # would be constant-folded into the unpartitioned-window trap this
    # module exists to avoid, and the join is O(partitions²) on a
    # frame bounded by the shuffle width
    offs = (
        counts.alias("a")
        .join(
            counts.alias("b"),
            F.col("b._pid") < F.col("a._pid"),
            "left",
        )
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("b._c"), F.lit(0)).alias("_off"))
    )
    wl = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        ranked.join(F.broadcast(offs), "_pid")
        .withColumn(rank_col, F.row_number().over(wl) + F.col("_off"))
        .drop("_pid")
    )


def with_global_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "_before",
    partitions: int | None = None,
) -> DataFrame:
    """Add the exclusive global prefix sum of ``value_col`` over the
    total order given by ``order_cols`` (which must be unique) — i.e.
    ``SUM(value) OVER (ORDER BY order_cols ROWS UNBOUNDED PRECEDING)
    - value`` — with the same two-phase layout as
    :func:`with_global_rank`: range partitions carry local running
    sums, and each partition adds the broadcast total of every
    partition before it. No single-task window ever sees the table.
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    if partitions is None:
        partitions = df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(partitions, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    totals = ranged.groupBy("_pid").agg(F.sum(value_col).alias("_t"))
    offs = (
        totals.alias("a")
        .join(
            totals.alias("b"),
            F.col("b._pid") < F.col("a._pid"),
            "left",
        )
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("b._t"), F.lit(0)).alias("_off"))
    )
    wl = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        ranged.join(F.broadcast(offs), "_pid")
        .withColumn(
            out_col,
            F.sum(value_col).over(wl) - F.col(value_col) + F.col("_off"),
        )
        .drop("_pid")
    )
