"""Semantics tests for the analytics operators (sparketl.operators.
analytics): salted join ≡ plain join, gap fill, interval islands,
transitions, fuzzy blocking, path mining, quantile outliers."""

from pyspark.sql import functions as F

from sparketl.operators.analytics import (
    event_transitions,
    fuzzy_name_pairs,
    gapfill_daily_counts,
    merge_intervals,
    quantile_outliers,
    top_paths,
)
from sparketl.operators.scale import salted_join
from tests.conftest import SF_SMOKE

DAY = 86_400_000_000


def _events(spark, rows):
    """rows: (event_id, user_id, event_type, ts_us[, value])."""
    has_value = rows and len(rows[0]) == 5
    schema = "event_id long, user_id long, event_type string, ts_us long"
    if has_value:
        schema += ", value double"
    df = spark.createDataFrame(rows, schema)
    return df.withColumn("ts", F.timestamp_micros("ts_us")).drop("ts_us")


def test_salted_join_equals_plain_join(spark):
    fact = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0), (3, 7.0), (1, 1.0)], "k long, v double"
    )
    dim = spark.createDataFrame([(1, "a"), (2, "b"), (4, "d")], "dk long, grp string")
    got = sorted(
        tuple(r) for r in salted_join(fact, dim, "k", "dk", n_salts=4).collect()
    )
    want = sorted(tuple(r) for r in fact.join(dim, fact.k == dim.dk).collect())
    assert got == want and len(got) == 4


def test_gapfill_fills_missing_days_with_zero(spark):
    e = _events(
        spark,
        [(1, 1, "view", 0), (2, 1, "view", 3 * DAY), (3, 1, "click", DAY)],
    )
    got = {
        (r["event_type"], r["day"]): r["n_events"]
        for r in gapfill_daily_counts(e).collect()
    }
    # view spans days 0..3 with gaps at 1, 2; click is a single day.
    assert got == {
        ("view", 0): 1,
        ("view", 1): 0,
        ("view", 2): 0,
        ("view", 3): 1,
        ("click", 1): 1,
    }


def test_merge_intervals_islands(spark):
    m = 60_000_000  # one minute in µs
    e = _events(
        spark,
        [
            # u1: two events 5 min apart (overlap at 10-min length) then
            # one 30 min later → two islands.
            (1, 1, "a", 0),
            (2, 1, "a", 5 * m),
            (3, 1, "a", 45 * m),
            # u2: single event → one island.
            (4, 2, "a", 0),
        ],
    )
    rows = merge_intervals(e, length_us=10 * m).collect()
    got = [
        (r["user_id"], r["island"], r["island_start_us"], r["island_end_us"], r["n_events"])
        for r in rows
    ]
    assert got == [
        (1, 1, 0, 15 * m, 2),
        (1, 2, 45 * m, 55 * m, 1),
        (2, 1, 0, 10 * m, 1),
    ]


def test_transitions_counts_and_probs(spark):
    e = _events(
        spark,
        [
            (1, 1, "view", 1), (2, 1, "click", 2), (3, 1, "view", 3),
            (4, 2, "view", 1), (5, 2, "view", 2),
        ],
    )
    got = {
        (r["prev_type"], r["next_type"]): (r["n"], r["p"])
        for r in event_transitions(e).collect()
    }
    # u1: view→click, click→view; u2: view→view. Row-normalized over
    # each prev_type.
    assert got == {
        ("view", "click"): (1, 0.5),
        ("view", "view"): (1, 0.5),
        ("click", "view"): (1, 1.0),
    }


def test_fuzzy_pairs_respect_block_and_threshold(spark):
    part = spark.createDataFrame(
        [("red ring",), ("red wing",), ("blue ring",), ("red gear",)],
        "p_name string",
    )
    rows = fuzzy_name_pairs(part, max_dist=4).collect()
    got = {(r["name_a"], r["name_b"]): r["dist"] for r in rows}
    # "red wing" blocks under "wing" — never compared to the rings;
    # "red gear" blocks under "gear". blue ring↔red ring dist 4 ≤ 4.
    assert got == {("blue ring", "red ring"): 4}


def test_top_paths_orders_and_slices(spark):
    e = _events(
        spark,
        [
            (1, 1, "a", 1), (2, 1, "b", 2),
            (3, 2, "a", 1), (4, 2, "b", 2),
            (5, 3, "b", 1), (6, 3, "a", 2), (7, 3, "c", 3),
            (8, 3, "c", 4), (9, 3, "c", 5), (10, 3, "c", 6),  # 6th event dropped
        ],
    )
    rows = top_paths(e, depth=5, k=10).collect()
    assert [(r["path"], r["n_users"]) for r in rows] == [
        ("a>b", 2),
        ("b>a>c>c>c", 1),
    ]


def test_quantile_outliers_simple(spark):
    # 100 values 1..100 of one type: p50 = 50.5 → 50 rows above it.
    rows = [(i, 1, "x", i, float(i)) for i in range(1, 101)]
    e = _events(spark, rows)
    r = quantile_outliers(e, q=0.5).collect()
    assert len(r) == 1
    assert r[0]["p99"] == 50.5 and r[0]["n_outliers"] == 50


def test_window_suite_rank_invariants(spark):
    from sparketl.operators.analytics import window_suite
    from sparketl.io import load_table

    df = window_suite(load_table(spark, SF_SMOKE, "orders"))
    rows = df.collect()
    assert rows, "window suite empty at smoke scale"
    by_part = {}
    for r in rows:
        by_part.setdefault(r["o_orderpriority"], []).append(r)
    for part_rows in by_part.values():
        assert [r["rn"] for r in part_rows] == list(range(1, len(part_rows) + 1))
        assert all(1 <= r["quartile"] <= 4 for r in part_rows)
        assert part_rows[0]["prev_key"] == -1
        assert part_rows[-1]["next_key"] == -1
        assert all(r["first_key"] == part_rows[0]["o_orderkey"] for r in part_rows)
        assert abs(part_rows[-1]["cd"] - 1.0) < 1e-12


def test_moment_stats_matches_builtin_corr(spark):
    from sparketl.operators.analytics import moment_stats
    from sparketl.io import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    got = {r["l_returnflag"]: r for r in moment_stats(li).collect()}
    ref = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.corr("l_quantity", "l_extendedprice").alias("c"),
            F.stddev_samp("l_quantity").alias("s"),
            F.covar_samp("l_quantity", "l_extendedprice").alias("v"),
        )
        .collect()
    }
    for flag, r in got.items():
        assert abs(r["corr_qty_price"] - ref[flag]["c"]) < 1e-9
        assert abs(r["stddev_qty"] - ref[flag]["s"]) < 1e-9
        assert abs(r["covar_qty_price"] - ref[flag]["v"]) < 1e-6 * abs(ref[flag]["v"])


def test_exact_percentiles_monotone(spark):
    from sparketl.operators.analytics import exact_percentiles
    from sparketl.io import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    for r in exact_percentiles(ev).collect():
        assert r["p25"] <= r["p50"] <= r["p75"] <= r["p95"] <= r["p99"]


def test_histogram_partitions_all_rows(spark):
    from sparketl.operators.analytics import price_histogram
    from sparketl.io import load_table

    o = load_table(spark, SF_SMOKE, "orders")
    rows = price_histogram(o).collect()
    assert sum(r["n"] for r in rows) == o.count()
    for r in rows:
        assert r["bin"] * 25_000.0 <= r["lo"] <= r["hi"] < (r["bin"] + 1) * 25_000.0


def test_orphan_audit_clean_fixture_and_detects_injection(spark):
    from sparketl.operators.analytics import orphan_audit
    from sparketl.operators.analytics import q_ext_46_orphan_audit

    rows = q_ext_46_orphan_audit(spark, SF_SMOKE).collect()
    assert len(rows) == 4
    assert all(r["n_orphan"] == 0 for r in rows)
    # injection: a child key with no parent must be counted
    from sparketl.io import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, SF_SMOKE, "lineitem")
    bad = li.limit(1).withColumn("l_orderkey", F.lit(-999))
    orphans = bad.union(li).join(
        load_table(spark, SF_SMOKE, "orders").select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_anti",
    )
    assert orphans.count() == 1


def test_dow_entropy_bounded_by_uniform(spark):
    import math

    from sparketl.operators.analytics import dow_entropy
    from sparketl.io import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    for r in dow_entropy(ev).collect():
        assert 0.0 <= r["entropy_nats"] <= math.log(7) + 1e-9
        assert r["n_buckets"] <= 7


def test_rfm_segments_cover_all_customers(spark):
    from sparketl.operators.analytics import rfm_segments
    from sparketl.io import load_table

    o = load_table(spark, SF_SMOKE, "orders")
    rows = rfm_segments(o).collect()
    assert sum(r["n_customers"] for r in rows) == o.select("o_custkey").distinct().count()
    for r in rows:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5


def test_skew_report_hot_ratio_consistency(spark):
    from sparketl.operators.analytics import skew_report
    from sparketl.io import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    rows = skew_report(li, k=10).collect()
    assert len(rows) == 10
    total = li.count()
    n_keys = li.select("l_suppkey").distinct().count()
    for r in rows:
        assert abs(r["pct_of_total"] - r["n_rows"] * 100.0 / total) < 1e-9
        assert abs(r["hot_ratio"] - r["n_rows"] / (total / n_keys)) < 1e-9
    # descending by count
    assert [r["n_rows"] for r in rows] == sorted(
        (r["n_rows"] for r in rows), reverse=True
    )


def test_trend_slope_on_synthetic_line(spark):
    from sparketl.operators.analytics import revenue_trend

    # priority 'P': revenue rises exactly 10/day → slope 10, and the
    # day index offset only shifts the intercept.
    rows = [
        (i, 1, "F", 100.0 + 10.0 * d, f"19{70}-01-0{d+1}", "P")
        for i, d in enumerate(range(5))
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    out = revenue_trend(orders).collect()
    assert len(out) == 1
    assert abs(out[0]["slope_per_day"] - 10.0) < 1e-9


def test_countmin_overestimates_within_bound(spark):
    from sparketl.io import load_table
    from sparketl.operators.text import countmin_token_estimates

    docs = load_table(spark, SF_SMOKE, "documents")
    rows = countmin_token_estimates(docs, depth=4, width=1 << 14, k=20).collect()
    assert len(rows) == 20
    total = sum(r["exact_n"] for r in rows)  # lower bound on N
    for r in rows:
        assert r["cm_estimate"] >= r["exact_n"]  # CM never undercounts
        # loose εN bound with ε = e/width on the true stream size; use
        # 10× slack since we only lower-bound N here
        assert r["overcount"] <= max(50, total)


def test_expectations_counts_violations_exactly(spark):
    from sparketl.operators.analytics import expectations_report

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (None, 3.0), (4, None)], "id long, v double"
    )
    got = {
        r["rule"]: (r["n_violations"], r["violation_rate"])
        for r in expectations_report(
            df, [("id_not_null", "id IS NOT NULL"), ("v_positive", "v > 0")]
        ).collect()
    }
    # NULL rule results count as violations (row 4 for v_positive)
    assert got == {"id_not_null": (1, 0.25), "v_positive": (2, 0.5)}


def test_cumulative_users_equals_prefix_distinct(spark):
    from sparketl.operators.analytics import cumulative_users

    day = 86_400_000_000
    # u1 on days 0,2; u2 on day 1; u3 on days 1,3 → cum: 1,3,3,3
    rows = [
        (1, 1, "a", 0), (2, 2, "a", day), (3, 3, "a", day + 1),
        (4, 1, "a", 2 * day), (5, 3, "a", 3 * day),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long"
    ).select("event_id", "user_id", "event_type", F.timestamp_micros("ts_us").alias("ts"))
    got = [(r["day"], r["new_users"], r["cumulative_users"])
           for r in cumulative_users(e).collect()]
    # only first-appearance days emit rows by design
    assert got == [(0, 1, 1), (1, 2, 3)]


def test_ttl_dedup_matches_python_recompute(spark):
    """ext_100: TTL dedup kept/dropped accounting vs a direct Python
    replay of each (user, type) stream."""
    from sparketl.io import load_table
    from sparketl.operators.events_ops import ttl_dedup_report
    from tests.conftest import SF_SMOKE

    ttl = 600_000_000
    ev = load_table(spark, SF_SMOKE, "events")
    rows = ev.selectExpr(
        "user_id", "event_type", "event_id", "unix_micros(ts) AS us"
    ).collect()
    streams = {}
    for r in rows:
        streams.setdefault((r["user_id"], r["event_type"]), []).append(r)
    kept = {}
    total = {}
    for (_, etype), s in streams.items():
        s.sort(key=lambda r: (r["us"], r["event_id"]))
        prev = None
        for r in s:
            total[etype] = total.get(etype, 0) + 1
            if prev is None or r["us"] - prev > ttl:
                kept[etype] = kept.get(etype, 0) + 1
            prev = r["us"]
    got = ttl_dedup_report(ev, ttl_us=ttl).collect()
    assert {r["event_type"] for r in got} == set(total)
    for r in got:
        assert r["n_events"] == total[r["event_type"]]
        assert r["n_kept"] == kept[r["event_type"]]
        assert r["n_dropped"] == total[r["event_type"]] - kept[r["event_type"]]


def test_grouped_ols2_matches_numpy(spark):
    """Per-group normal-equation OLS coefficients ≡ numpy lstsq on the
    same design matrix (rel tol — numpy solves via SVD, we use exact
    bigint gram sums + Cramer)."""
    import numpy as np

    from sparketl.io import load_table
    from sparketl.operators.analytics import grouped_ols2

    docs = load_table(spark, SF_SMOKE, "documents")
    toks = F.split("text", " ")
    got = {
        r["lang"]: (r["b0"], r["b1_chars"], r["b2_chars"])
        for r in grouped_ols2(
            docs,
            ["lang"],
            F.col("n_chars"),
            F.size(toks),
            F.size(F.array_distinct(toks)),
            y_name="chars",
        ).collect()
    }
    rows = docs.select(
        "lang",
        F.size(toks).alias("x1"),
        F.size(F.array_distinct(toks)).alias("x2"),
        "n_chars",
    ).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((r["x1"], r["x2"], r["n_chars"]))
    assert set(got) == set(by_lang) and len(got) >= 2
    for lang, pts in by_lang.items():
        a = np.array([[1.0, x1, x2] for x1, x2, _ in pts])
        y = np.array([float(v) for _, _, v in pts])
        ref, *_ = np.linalg.lstsq(a, y, rcond=None)
        for mine, theirs in zip(got[lang], ref):
            assert abs(mine - theirs) <= 1e-6 * max(1.0, abs(theirs))


def test_ewma_matches_pandas_ewm(spark):
    """Grouped EWMA recurrence ≡ pandas ewm(adjust=False) on each
    group's day-ordered series (rel tol — pandas may associate the
    two-product step differently in its C kernel)."""
    from sparketl.io import load_table
    from sparketl.operators.analytics import ewma_daily_revenue

    got = ewma_daily_revenue(load_table(spark, SF_SMOKE, "orders")).collect()
    assert len(got) > 100
    import pandas as pd

    df = pd.DataFrame(
        [(r.o_orderpriority, r.day, r.rev_cents, r.ewma_cents) for r in got],
        columns=["prio", "day", "rev", "ewma"],
    )
    for _, grp in df.groupby("prio"):
        grp = grp.sort_values("day")
        ref = grp["rev"].astype(float).ewm(alpha=0.25, adjust=False).mean()
        assert (
            (grp["ewma"] - ref).abs()
            <= 1e-9 * ref.abs().clip(lower=1.0)
        ).all()
        # day-ordered output within each group
        assert grp["day"].is_monotonic_increasing


def test_cusum_changepoint_planted_shift(spark):
    """CUSUM argmax lands exactly on a planted level shift, and the
    scaled statistic matches a pure-Python recompute."""
    from pyspark.sql import functions as F

    from sparketl.operators.analytics import cusum_changepoint

    # 20 days at 100 cents, then 20 days at 500 cents → shift at day 19
    rows = []
    oid = 0
    for day, cents in [(d, 100) for d in range(20)] + [
        (d, 500) for d in range(20, 40)
    ]:
        rows.append((oid, float(cents) / 100.0, f"1994-01-{1:02d}", "P"))
        oid += 1
        rows[-1] = (oid, float(cents) / 100.0, day, "P")
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, d long, o_orderpriority string"
    ).select(
        "o_orderkey",
        "o_totalprice",
        "o_orderpriority",
        F.expr("date_add(DATE '1970-01-01', cast(d as int))").alias(
            "o_orderdate"
        ),
    )
    got = cusum_changepoint(df).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_days == 40
    # pure python: x_t = 100 or 500 cents, D_t = n*S_t - t*total
    xs = [100] * 20 + [500] * 20
    total = sum(xs)
    best = None
    s = 0
    for t, x in enumerate(xs, start=1):
        s += x
        d = 40 * s - t * total
        if best is None or abs(d) > abs(best[1]):
            best = (t - 1, d)  # day index
    assert r.cp_day == best[0] and r.d_scaled == best[1]
    assert r.cp_day == 19  # the planted shift boundary


def test_touch_attribution_first_last_and_none(spark):
    from sparketl.operators.events_ops import touch_attribution

    # user 1: view → click → purchase  (first=view, last=click)
    # user 2: purchase with no prior activity → none/none
    # user 3: click → purchase → view → purchase
    #         (1st conv: first=click,last=click; 2nd: first=click,last=view)
    e = _events(
        spark,
        [
            (1, 1, "view", 1_000_000),
            (2, 1, "click", 2_000_000),
            (3, 1, "purchase", 3_000_000),
            (4, 2, "purchase", 1_000_000),
            (5, 3, "click", 1_000_000),
            (6, 3, "purchase", 2_000_000),
            (7, 3, "view", 3_000_000),
            (8, 3, "purchase", 4_000_000),
        ],
    )
    got = {
        (r["first_touch"], r["last_touch"]): (r["n_purchases"], r["n_users"])
        for r in touch_attribution(e).collect()
    }
    assert got == {
        ("view", "click"): (1, 1),
        ("none", "none"): (1, 1),
        ("click", "click"): (1, 1),
        ("click", "view"): (1, 1),
    }


def test_conversion_lag_percentile_semantics(spark):
    from sparketl.operators.events_ops import conversion_lag_profile

    # converting users with gaps 10, 20, 30 µs; user 4 purchases BEFORE
    # viewing (excluded); user 5 never purchases (excluded)
    e = _events(
        spark,
        [
            (1, 1, "view", 100), (2, 1, "purchase", 110),
            (3, 2, "view", 100), (4, 2, "purchase", 120),
            (5, 3, "view", 100), (6, 3, "purchase", 130),
            (7, 4, "purchase", 50), (8, 4, "view", 60),
            (9, 5, "view", 100),
        ],
    )
    r = conversion_lag_profile(e).collect()[0]
    # percentile() interpolation over [10, 20, 30]: p50=20, p90=28
    assert r["n_users"] == 3
    assert r["p50_us"] == 20.0 and r["p90_us"] == 28.0


def test_resample_interpolate_known_midpoints(spark):
    """Hand-computed grid: events at 00:30 (10.0) and 02:30 (30.0)
    give 15.0 at 01:00 and 25.0 at 02:00; an event exactly ON a grid
    instant degenerates to its own value."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    mk = lambda m: t0 + datetime.timedelta(minutes=m)  # noqa: E731
    rows = [
        (1, mk(30), 1, "a", 10.0, None),
        (2, mk(150), 1, "a", 30.0, None),
        (3, mk(0), 1, "b", 5.0, None),     # exactly on the grid... but
        (4, mk(60), 1, "b", 7.0, None),    # grid starts AFTER lo -> 01:00
        (5, mk(125), 1, "b", 9.0, None),
        # type c: the series MAX falls exactly on a grid instant —
        # the ADVICE-r8 boundary case where the forward scan sees the
        # grid marker before the same-instant event (nu NULL)
        (6, mk(30), 1, "c", 10.0, None),
        (7, mk(120), 1, "c", 20.0, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from sparketl.operators.analytics import resample_interpolate

    got = {
        (r["event_type"], r["grid_us"]): r["interp_micro"]
        for r in resample_interpolate(ev).collect()
    }
    h = 3_600_000_000
    base = 1_704_067_200_000_000  # 2024-01-01 00:00 UTC in epoch-us
    assert got[("a", base + h)] == 15_000_000
    assert got[("a", base + 2 * h)] == 25_000_000
    # type b: grid 01:00 hits event 4 exactly -> its own value 7.0
    assert got[("b", base + h)] == 7_000_000
    import math

    expect = math.floor((7.0 + (9.0 - 7.0) * ((120 - 60) / (125 - 60))) * 1e6)
    assert got[("b", base + 2 * h)] == expect
    # type c: max event exactly on the 02:00 grid instant must emit
    # the exact event value, not NULL (pre-fix this was None)
    assert got[("c", base + h)] == 13_333_333  # 10 + (20-10)*(30/90)
    assert got[("c", base + 2 * h)] == 20_000_000


def test_cohort_retention_and_funnel_semantics(spark):
    """Hand-built 3-user journey: retention cohorts by first week and
    the funnel's strict AFTER-ordering (a purchase before the click
    must NOT count as a funnel completion)."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    d = lambda days: t0 + datetime.timedelta(days=days)  # noqa: E731
    rows = [
        # user 1: view d0 -> click d1 -> purchase d2 (full funnel);
        # active weeks 0 and 1
        (1, d(0), 1, "view", 1.0, None),
        (2, d(1), 1, "click", 1.0, None),
        (3, d(2), 1, "purchase", 1.0, None),
        (4, d(8), 1, "view", 1.0, None),
        # user 2: purchase BEFORE click -> reaches click, not purchase
        (5, d(0), 2, "view", 1.0, None),
        (6, d(1), 2, "purchase", 1.0, None),
        (7, d(2), 2, "click", 1.0, None),
        # user 3: joins week 1, view only
        (8, d(7), 3, "view", 1.0, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from sparketl.operators.analytics import cohort_retention, conversion_funnel

    ret = {
        (r["cohort_week"], r["week_offset"]): (
            r["n_active"],
            r["retention_permille"],
        )
        for r in cohort_retention(ev).collect()
    }
    # cohort of week w0: users 1,2 -> offset 0: 2 active; offset 1: user 1
    w0 = min(k[0] for k in ret)
    assert ret[(w0, 0)] == (2, 1000)
    assert ret[(w0, 1)] == (1, 500)
    assert ret[(w0 + 1, 0)] == (1, 1000)

    fun = {r["step"]: (r["n_users"], r["conversion_permille"])
           for r in conversion_funnel(ev).collect()}
    assert fun["view"] == (3, 1000)
    assert fun["click"] == (2, 666)
    assert fun["purchase"] == (1, 500)
