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


# ---------------------------------------------------------------------------
# ext_137: exact one-vs-rest AUC over the embedding table
# ---------------------------------------------------------------------------


def one_vs_rest_auc(emb: DataFrame) -> DataFrame:
    """Exact ROC-AUC of a deterministic linear score for each label
    (one-vs-rest) — the model-eval primitive (AUC = the Mann-Whitney
    U statistic normalized, so ext_123's 2x-scaled tie-rank device
    makes it EXACT): auc = (R_pos − n_pos(n_pos+1)/2) / (n_pos·n_neg)
    with tie-averaged ranks carried as the exact integer
    rank2 = 2·c_less + t + 1 per distinct score.

    The score is the milli-quantized alternating-sign dimension sum
    (exact bigint — a stand-in for any model margin). The cumulative
    rank pass runs over the DISTINCT-score frame (CDF shape, ext_123's
    pattern): compressed to at most |distinct scores| rows, which is
    why the single-partition window is acceptable — at 100 TB the
    distinct margin values after milli quantization stay bounded while
    the raw table does not; all heavy aggregation is map-combinable.
    """
    # alternating-sign milli dot product over the exploded cells —
    # exact bigint terms, map-combinable per-vector sum
    scores = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("d", "xf"),
    ).select(
        "vec_id",
        "label",
        F.expr(
            "CASE WHEN d % 2 = 0 THEN 1 ELSE -1 END"
            " * CAST(FLOOR(CAST(xf AS DOUBLE) * 1000.0) AS BIGINT)"
        ).alias("term"),
    ).groupBy("vec_id", "label").agg(F.sum("term").alias("s"))

    vc = scores.groupBy("s").agg(F.count(F.lit(1)).alias("t"))
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    rank2 = vc.select(
        "s",
        (2 * F.coalesce(F.sum("t").over(w), F.lit(0)) + F.col("t") + 1).alias(
            "rank2"
        ),
    )
    per_label_val = scores.groupBy("label", "s").agg(
        F.count(F.lit(1)).alias("n_at")
    )
    totals = scores.agg(F.count(F.lit(1)).alias("n_all"))
    return (
        per_label_val.join(F.broadcast(rank2), "s")
        .groupBy("label")
        .agg(
            F.sum(F.col("n_at") * F.col("rank2")).alias("s2"),
            F.sum("n_at").alias("n_pos"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "label",
            "n_pos",
            (F.col("n_all") - F.col("n_pos")).alias("n_neg"),
            F.expr(
                "(1000000 * (s2 - n_pos * (n_pos + 1)))"
                " div (2 * n_pos * (n_all - n_pos))"
            ).alias("auc_micro"),
        )
        .orderBy("label")
    )


def q_ext_137_auc(spark, sf_dir: str) -> DataFrame:
    from sparketl.io import load_table

    return one_vs_rest_auc(load_table(spark, sf_dir, "embeddings"))
