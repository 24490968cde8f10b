"""Event-stream operators, batch form (EXT-05/06 — SURVEY §2.10/§2.12).

- JSON property extraction from the ``props`` string column
- tumbling time-window aggregation (F.window in batch mode — the same
  expression the streaming variant uses, see sparketl.streaming)
- sessionization: gap-based session assignment via lag + running sum

Timestamps are surfaced as epoch-microsecond BIGINTs (the fixture's
ns-precision ts is truncated to µs on load — matching DuckDB's
CAST(ts AS TIMESTAMP); see FIXTURES.md precision note).

Scale: window/session aggs shuffle once on (user/window) keys —
exactly the Structured Streaming state layout, so the batch plan and
the streaming plan scale the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sparketl.io import load_table, spread


def q_ext_05_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object on the props column → per-type stats of $.k."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("k").cast("long")).alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def tumbling_window_agg(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling event-time windows (batch form of the streaming agg)."""
    return (
        events.groupBy(F.window("ts", width), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def q_ext_06_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return tumbling_window_agg(e, "1 hour").orderBy("window_start_us", "event_type")


def sessionize(
    events: DataFrame, gap_minutes: int = 30, user_col: str = "user_id"
) -> DataFrame:
    """Assign gap-based sessions per user: a new session starts when
    the time since the previous event exceeds the gap. One shuffle on
    the user key; the running sum is a per-partition scan."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = W.partitionBy(user_col).orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts"))
    prev = F.lag(ts_us).over(w)
    is_new = F.when(prev.isNull() | ((ts_us - prev) > gap_us), 1).otherwise(0)
    return events.withColumn(
        "session_idx",
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )


def q_ext_06_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session summary: per (user, session) event count, value total,
    and start time."""
    e = load_table(spark, sf_dir, "events")
    s = sessionize(e, gap_minutes=30)
    return (
        s.groupBy("user_id", "session_idx")
        .agg(
            F.min(F.unix_micros("ts")).alias("session_start_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .orderBy("user_id", "session_idx")
    )


def q_ext_05_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON parsing: from_json into a typed struct
    (vs the path-probe get_json_object of ext_05_json_extract).
    One parse per row yields every field at once — the right call
    when extracting multiple properties at scale."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.withColumn(
        "p", F.from_json("props", "k INT")
    )
    return (
        parsed.select("user_id", F.col("p.k").alias("k"))
        .where(F.col("k").isNotNull() & (F.col("k") % 7 == 0))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_k7"),
            F.sum(F.col("k").cast("long")).alias("sum_k7"),
        )
        .orderBy("user_id")
    )


def scd2_intervals(events: DataFrame) -> DataFrame:
    """SCD Type-2 interval construction: collapse each user's event
    stream into contiguous same-state intervals with validity bounds —
    the standard dimension-history build in a warehouse ETL.

    Two windows over ONE shuffle on user_id (lag → change marker →
    running-sum group id, then lead for the closing bound share the
    same (user_id, ts) sort), plus one groupBy on (user_id, grp) that
    AQE plans shuffle-free after the window's partitioning. Per-user
    event counts bound the window state — the same layout Structured
    Streaming would use for this at 100 TB.

    Open intervals carry the SCD2 "high date" sentinel (9999-12-31 in
    epoch-µs) rather than NULL: the warehouse convention, and it keeps
    valid_to_us a non-null int64 through any pandas-mediated comparison
    (nullable ints decay to float64 there)."""
    HIGH_DATE_US = 253402300799999999  # 9999-12-31 23:59:59.999999
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    e = events.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("ts_us"),
    )
    prev = F.lag("state").over(w)
    marked = e.withColumn(
        "chg", (prev.isNull() | (prev != F.col("state"))).cast("long")
    )
    grp = marked.withColumn(
        "grp", F.sum("chg").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    iv = grp.groupBy("user_id", "grp", "state").agg(
        F.min("ts_us").alias("valid_from_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wi = W.partitionBy("user_id").orderBy("valid_from_us")
    nxt = F.lead("valid_from_us").over(wi)
    return iv.select(
        "user_id",
        "state",
        "valid_from_us",
        F.coalesce(nxt, F.lit(HIGH_DATE_US)).alias("valid_to_us"),
        "n_events",
        nxt.isNull().alias("is_current"),
    )


def q_ext_19_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return scd2_intervals(e).orderBy("user_id", "valid_from_us")


def funnel_counts(
    events: DataFrame, steps: tuple[str, str, str] = ("view", "click", "purchase")
) -> DataFrame:
    """Ordered funnel conversion: how many users did step1, then step2
    strictly after it, then step3 after that — the classic product-
    analytics query, expressed as ONE shuffle on user_id.

    Each user's events collapse to a sorted (ts, type) array
    (collect_list + array_sort inside the user aggregate), and the
    step timestamps fall out of three chained array filters — all JVM
    array expressions, no UDF, no re-join per step. Per-user event
    counts bound the array (app-domain bounded here; for pathological
    hot users the equivalent 3-phase co-partitioned join formulation
    trades 2 extra same-key shuffles for O(1) row width)."""
    s1, s2, s3 = steps
    per_user = (
        events.select(
            "user_id",
            F.struct(F.unix_micros("ts").alias("ts_us"), "event_type").alias("e"),
        )
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("e")).alias("arr"))
    )
    t1 = F.expr(
        f"array_min(transform(filter(arr, x -> x.event_type = '{s1}'),"
        " x -> x.ts_us))"
    )
    with_t1 = per_user.select("user_id", "arr", t1.alias("t1"))
    t2 = F.expr(
        f"array_min(transform(filter(arr, x -> x.event_type = '{s2}'"
        " AND x.ts_us > t1), x -> x.ts_us))"
    )
    with_t2 = with_t1.select("user_id", "arr", "t1", t2.alias("t2"))
    t3 = F.expr(
        f"array_min(transform(filter(arr, x -> x.event_type = '{s3}'"
        " AND x.ts_us > t2), x -> x.ts_us))"
    )
    flags = with_t2.select("user_id", "t1", "t2", t3.alias("t3"))
    return flags.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("t1").isNotNull().cast("long")).alias("n_step1"),
        F.sum(F.col("t2").isNotNull().cast("long")).alias("n_step2"),
        F.sum(F.col("t3").isNotNull().cast("long")).alias("n_step3"),
    )


def q_ext_22_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return funnel_counts(e)


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Day-N retention by signup cohort: users grouped by their first
    active day, counted again on each later day they return.

    Two aggregates that share the user_id key (first-day per user,
    distinct user-days) and one co-partitioned join — no window over
    the whole stream, no per-user state. At 100 TB both aggregates are
    map-side combinable and the join keys are already co-partitioned
    from the first shuffle; the output is cohort×offset sized
    (days², tiny)."""
    days = events.select(
        "user_id", F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).distinct()
    first_day = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(first_day, "user_id")
        .select(
            "user_id",
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def q_ext_23_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return retention_cohorts(e).orderBy("cohort_day", "day_offset")


def hopping_window_agg(
    events: DataFrame, width: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Hopping (sliding) windows: each event lands in width/slide
    overlapping windows (here 4). Spark's window() expands the rows
    map-side — ×4 volume into one shuffle, same cost shape as the
    tumbling twin (ext_06_hourly_window) times the overlap factor;
    state never accumulates because windows are bounded. Output keys
    by the window-start epoch-µs bigint (never raw timestamps — oracle
    hashing)."""
    return (
        events.groupBy(F.window("ts", width, slide), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start_us", "event_type")
    )


def q_ext_53_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hopping_window_agg(load_table(spark, sf_dir, "events"))


def session_window_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessions via the BUILT-IN session_window aggregate —
    the declarative twin of the manual lag/running-sum sessionize
    (ext_06): Catalyst merges adjacent events whose gap is under the
    threshold inside one aggregation, no window-function pass at all,
    and the same expression works under Structured Streaming with
    state merge. Boundary semantics: an event exactly ``gap`` after
    its predecessor starts a NEW session (window is [start, last+gap)),
    i.e. ≥ where the manual operator uses >."""
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start_us")
    )


def q_ext_54_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_window_agg(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# ext_100: TTL-windowed dedup (batch twin of dropDuplicatesWithinWatermark)
# ---------------------------------------------------------------------------


def ttl_dedup_report(events: DataFrame, ttl_us: int = 600_000_000) -> DataFrame:
    """Dedup with a time-to-live: a (user, event_type) occurrence is a
    DUPLICATE only if the same key fired within the previous
    ``ttl_us`` — the batch semantics of streaming's
    ``dropDuplicatesWithinWatermark`` (streaming/windows.py), where
    dedup state expires with the watermark. Batch and stream agree on
    which rows survive, so this is the replayable/backfill form of the
    streaming dedup (run it over history, get the same kept set the
    stream would have produced).

    One shuffle: the lag window partitions by the dedup key, so
    per-task state is one key's stream; "kept" = first occurrence or
    gap > TTL, a pure map over the lag. Output is the per-type
    kept/dropped accounting. (ts, event_id) ordering makes lag
    deterministic under timestamp ties; µs bigints keep the oracle
    hashable."""
    ev = spread(events).select(
        "user_id",
        "event_type",
        "event_id",
        F.expr("unix_micros(ts)").alias("us"),
    )
    w = W.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    g = ev.withColumn("gap_us", F.col("us") - F.lag("us").over(w))
    kept = F.col("gap_us").isNull() | (F.col("gap_us") > F.lit(ttl_us))
    return (
        g.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum((~kept).cast("long")).alias("n_dropped"),
        )
        .orderBy("event_type")
    )


def q_ext_100_ttl_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ttl_dedup_report(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# ext_126: first/last-touch conversion attribution
# ---------------------------------------------------------------------------


def touch_attribution(
    events: DataFrame, conversion: str = "purchase"
) -> DataFrame:
    """Marketing-style conversion attribution: for every ``conversion``
    event, the user's FIRST preceding non-conversion event type
    (first-touch) and the LAST one (last-touch), rolled up to a
    (first_touch × last_touch) matrix with purchase and unique-user
    counts. Conversions with no preceding activity attribute to
    'none'. The standard report a funnel analyst reads next to ext_22
    (which counts stage reach, not credit assignment).

    Both touches ride ONE user-partitioned window pass
    (rows unbounded-preceding → 1-preceding, ordered by (ts,
    event_id) — the unique tiebreaker makes first/last deterministic
    under timestamp ties); per-partition state is one user's stream,
    so the window never concentrates the table. The rollup is a
    small categorical matrix — map-combinable counts.
    """
    ev = spread(events).select(
        "user_id",
        "event_type",
        "event_id",
        F.expr("unix_micros(ts)").alias("us"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    nonconv = F.when(F.col("event_type") != conversion, F.col("event_type"))
    tagged = ev.select(
        "event_type",
        F.last(nonconv, ignorenulls=True).over(w).alias("lt"),
        F.first(nonconv, ignorenulls=True).over(w).alias("ft"),
        "user_id",
    )
    return (
        tagged.where(F.col("event_type") == conversion)
        .select(
            F.coalesce("ft", F.lit("none")).alias("first_touch"),
            F.coalesce("lt", F.lit("none")).alias("last_touch"),
            "user_id",
        )
        .groupBy("first_touch", "last_touch")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("first_touch", "last_touch")
    )


def q_ext_126_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return touch_attribution(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# ext_127: first-view → first-purchase conversion-lag percentiles
# ---------------------------------------------------------------------------


def conversion_lag_profile(
    events: DataFrame, from_type: str = "view", to_type: str = "purchase"
) -> DataFrame:
    """Exact p50/p90 of the per-user lag (µs) from first ``from_type``
    to first ``to_type`` — "how long does a converting user take?"
    Composes the funnel derivation with the MSD radix quantile
    machinery: the per-user frame GROWS with the corpus (user
    cardinality), so a percentile() buffer over it is exactly the
    scale trap the plan audit bans; `exact_group_quantiles` keeps
    per-task state ≤ 2^16 counters while reproducing ``percentile``
    ≡ DuckDB ``quantile_cont`` bit-for-bit on the bigint gaps.
    """
    from sparketl.operators.quantiles import exact_group_quantiles

    ev = spread(events).select(
        "user_id", "event_type", F.expr("unix_micros(ts)").alias("us")
    )
    pu = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == from_type, F.col("us"))).alias(
            "fv"
        ),
        F.min(F.when(F.col("event_type") == to_type, F.col("us"))).alias(
            "fp"
        ),
    )
    gaps = pu.where(
        F.col("fv").isNotNull()
        & F.col("fp").isNotNull()
        & (F.col("fp") > F.col("fv"))
    ).select((F.col("fp") - F.col("fv")).alias("gap_us"))
    qs = exact_group_quantiles(
        gaps, [], "gap_us", [0.5, 0.9], value_kind="bigint"
    )
    return qs.select(
        F.col("n_values").alias("n_users"),
        F.col("qs")[0].alias("p50_us"),
        F.col("qs")[1].alias("p90_us"),
    )


def q_ext_127_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conversion_lag_profile(load_table(spark, sf_dir, "events"))
