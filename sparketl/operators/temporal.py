"""Temporal join operators: as-of join and event-in-range join (EXT).

The reference has no time-series operators (its only join surface is
SURVEY §2.3); these are north-star extensions for event/order
correlation — the canonical "enrich a fact stream with the latest
dimension state" primitive every large-scale pipeline needs.

As-of join, Spark-first: Spark has no ASOF JOIN, and the naive
formulation (inequality join + per-left-row argmax) is a broadcast
nested loop + giant intermediate. Instead we use the union-scan
technique used by time-series stores: tag both sides, union them,
sort within each key partition by (time, side), and carry the last
seen right-side row forward with ``last(..., ignorenulls=True)`` over
an unbounded-preceding window. Cost = ONE shuffle on the join key —
the same layout a sort-merge join would need anyway — and it scales
to arbitrarily many rows per key without any cross product.

Range join: equi-key + bounded time predicate. Spark executes this as
a hash/sort-merge equi-join on the key with the range as a residual
filter — linear, no BNLJ, because the equi-key is extracted by
Catalyst (ExtractEquiJoinKeys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sparketl.io import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    tie_break: str,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_time <= left_time`` for the same key (inclusive match).

    Ties on ``right_time`` resolve to the greatest ``tie_break`` value
    so the result is deterministic. Right columns come back
    null-filled when no prior right row exists (left-outer as-of).

    One shuffle on the key column; per-key state is a single running
    "last right row" struct, so memory is O(1) per group scan.
    """
    rv_cols = list(dict.fromkeys(right_values + [tie_break]))
    rv_struct = F.struct(*[F.col(c) for c in rv_cols])
    null_left = [
        F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns
    ]
    r = right.select(
        *null_left,
        F.col(right_key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        rv_struct.alias("__rv"),
        F.col(tie_break).alias("__tb"),
    )
    l = left.select(
        *left.columns,
        F.col(left_key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
        F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb"),
    )
    merged = l.unionByName(r)
    # Order: time asc, right rows before left rows at equal time
    # (inclusive <=), ties among right rows by tie_break asc so the
    # LAST one carried forward is the max tie_break.
    w = (
        W.partitionBy("__k")
        .orderBy("__t", "__side", "__tb")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = merged.withColumn("__match", F.last("__rv", ignorenulls=True).over(w))
    out_cols = [c for c in left.columns] + [
        F.col(f"__match.{c}").alias(c) for c in right_values
    ]
    return carried.where(F.col("__side") == 1).select(*out_cols)


def q_ext_07_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event joined to the user's most recent order at-or-before
    the event time (events.user_id ↔ orders.o_custkey)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    o = load_table(spark, sf_dir, "orders")
    joined = asof_join(
        e,
        o,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_values=["o_orderkey", "o_totalprice"],
        tie_break="o_orderkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_totalprice").alias("asof_totalprice"),
    ).orderBy("event_id")


def q_ext_07_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders joined to the same user's events in a 3-day window after
    a per-order anchor timestamp: equi-join on the user key with the
    time range as a residual predicate (no nested-loop join — Catalyst
    extracts the equi-key), aggregated to per-order event stats.

    The anchor folds each order date into the events fixture's time
    domain (orders span 1995–2001, events span Jan 2024 — the raw
    dates never overlap, which made the original 30-days-after-order
    binding vacuously all-NULL; caught by verify_oracle's ALL-NULL
    tripwire): anchor = 2024-01-01 + (days-since-1995 mod 25) days,
    deterministic and expressible identically in DuckDB."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders").withColumn(
        "anchor",
        F.expr(
            "timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, "
            "CAST(datediff(o_orderdate, date'1995-01-01') % 25 AS INT), 0, 0, 0)"
        ),
    )
    cond = (
        (o.o_custkey == e.user_id)
        & (e.ts >= o.anchor)
        & (e.ts < o.anchor + F.expr("INTERVAL 3 DAYS"))
    )
    return (
        o.join(e, cond, "left")
        .groupBy("o_orderkey")
        .agg(
            F.count("event_id").alias("n_events_3d"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
                "event_value_3d"
            ),
        )
        .orderBy("o_orderkey")
    )


TEMPORAL_QUERIES = {
    "ext_07_asof_join": q_ext_07_asof_join,
    "ext_07_range_join": q_ext_07_range_join,
}

TEMPORAL_ORACLES = {
    # Deterministic ANSI formulation of the as-of: rank candidate
    # orders per event by (o_orderdate DESC, o_orderkey DESC), keep
    # rank 1; LEFT JOIN keeps no-match events with NULLs.
    "ext_07_asof_join": """
        SELECT event_id, user_id, ts_us, event_type, asof_orderkey, asof_totalprice
        FROM (
          SELECT e.event_id, e.user_id,
                 epoch_us(CAST(e.ts AS TIMESTAMP)) AS ts_us,
                 e.event_type,
                 o.o_orderkey AS asof_orderkey,
                 o.o_totalprice AS asof_totalprice,
                 ROW_NUMBER() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC NULLS LAST,
                            o.o_orderkey DESC NULLS LAST
                 ) AS rn
          FROM events e
          LEFT JOIN orders o
            ON e.user_id = o.o_custkey AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP)
        ) WHERE rn = 1
        ORDER BY event_id
    """,
    "ext_07_range_join": """
        WITH oo AS (
          SELECT o_orderkey, o_custkey,
                 TIMESTAMP '2024-01-01 00:00:00'
                   + (datediff('day', DATE '1995-01-01',
                               CAST(o_orderdate AS DATE)) % 25)
                     * INTERVAL 1 DAY AS anchor
          FROM orders
        )
        SELECT oo.o_orderkey,
               COUNT(e.event_id) AS n_events_3d,
               CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS event_value_3d
        FROM oo
        LEFT JOIN events e
          ON oo.o_custkey = e.user_id
         AND CAST(e.ts AS TIMESTAMP) >= oo.anchor
         AND CAST(e.ts AS TIMESTAMP) < oo.anchor + INTERVAL 3 DAY
        GROUP BY oo.o_orderkey
        ORDER BY oo.o_orderkey
    """,
}
