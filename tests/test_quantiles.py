"""MSD radix-selection exact quantiles (operators/quantiles.py).

The contract is bit-for-bit equality with Spark's ``percentile()``
(and therefore DuckDB's ``quantile_cont``), achieved WITHOUT the
built-in's whole-column-per-group aggregation buffer. Each test
compares against ``percentile()`` as the semantic twin on shapes that
exercise the digit descent: negatives, heavy ties, single-element
groups, exactly-integral rank positions, and the bigint key path.
"""

import random

import pytest
from pyspark.sql import functions as F


def _percentile_ref(df, group_col, value_col, pcts):
    arr = ", ".join(f"{p}D" for p in pcts)
    return {
        r[group_col]: (list(r["q"]), r["n"])
        for r in df.groupBy(group_col)
        .agg(
            F.expr(f"percentile({value_col}, array({arr}))").alias("q"),
            F.count(value_col).alias("n"),
        )
        .collect()
    }


def _radix(df, group_cols, value_col, pcts, **kw):
    from sparketl.operators.quantiles import exact_group_quantiles

    return exact_group_quantiles(df, group_cols, value_col, pcts, **kw)


def test_doubles_match_percentile_bit_for_bit(spark):
    random.seed(7)
    rows = []
    for grp, n in (("one", 1), ("few", 9), ("ties", 400), ("wide", 3000)):
        for _ in range(n):
            if grp == "ties":
                v = float(random.randint(-3, 3))
            else:
                v = random.choice(
                    [
                        round(random.uniform(-1e4, 1e4), 2),
                        random.uniform(-1e12, 1e12),
                        random.uniform(-1e-6, 1e-6),
                    ]
                )
            rows.append((grp, v))
    df = spark.createDataFrame(rows, "g string, v double")
    pcts = [0.01, 0.25, 0.5, 0.75, 0.95, 0.99]
    ref = _percentile_ref(df, "g", "v", pcts)
    got = _radix(df, ["g"], "v", pcts).collect()
    assert len(got) == len(ref)
    for r in got:
        exp_q, exp_n = ref[r["g"]]
        assert r["n_values"] == exp_n
        # exact float equality on purpose: the driver hash uses repr()
        assert list(r["qs"]) == exp_q, r["g"]


def test_bigints_match_percentile_including_negatives(spark):
    random.seed(11)
    rows = [("a", random.randint(-(10**14), 10**14)) for _ in range(513)]
    rows.append(("b", 42))
    df = spark.createDataFrame(rows, "g string, v long")
    pcts = [0.1, 0.5, 0.9]
    ref = _percentile_ref(df, "g", "v", pcts)
    got = _radix(df, ["g"], "v", pcts, value_kind="bigint").collect()
    for r in got:
        assert list(r["qs"]) == ref[r["g"]][0], r["g"]


def test_integral_positions_hit_exact_order_statistics(spark):
    # n = 5, p = 0.25 -> pos = 1.0 exactly: lower == higher, the result
    # must be the order statistic itself with NO interpolation rounding
    df = spark.createDataFrame(
        [("g", v) for v in (10.0, 1.0, 7.0, 3.0, 5.0)], "g string, v double"
    )
    got = _radix(df, ["g"], "v", [0.0, 0.25, 0.5, 0.75, 1.0]).collect()[0]
    assert list(got["qs"]) == [1.0, 3.0, 5.0, 7.0, 10.0]


def test_nulls_are_skipped_like_percentile(spark):
    df = spark.createDataFrame(
        [("g", 1.0), ("g", None), ("g", 3.0), ("g", None), ("g", 2.0)],
        "g string, v double",
    )
    got = _radix(df, ["g"], "v", [0.5]).collect()[0]
    assert got["n_values"] == 3
    assert list(got["qs"]) == [2.0]


def test_ungrouped_mode_has_no_group_column(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    out = _radix(df, [], "v", [0.5, 0.9])
    assert out.columns == ["n_values", "qs"]
    row = out.collect()[0]
    ref = df.agg(F.expr("percentile(v, array(0.5D, 0.9D))").alias("q")).collect()[0]
    assert list(row["qs"]) == list(ref["q"])


def test_no_full_column_aggregation_buffer_in_plan(spark):
    """The executed plan must not contain the ObjectHashAggregate that
    percentile() uses (its buffer is O(group) values) — the whole point
    of the radix path. Counts/sums via hash aggregate are fine."""
    df = spark.createDataFrame(
        [("g", float(i % 97)) for i in range(5000)], "g string, v double"
    )
    out = _radix(df, ["g"], "v", [0.5, 0.99])
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "percentile" not in plan.lower()
    assert "ObjectHashAggregate" not in plan


def test_rejects_unknown_value_kind(spark):
    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        _radix(df, ["g"], "v", [0.5], value_kind="decimal")


def test_weighted_quantiles_match_python_recompute(spark):
    """Lower weighted quantile: smallest v with cumweight >= ceil(q*W).
    Engine result must equal a direct Python recompute, including
    negative values, duplicate values, and the bigint path."""
    import random

    from sparketl.operators.quantiles import exact_group_weighted_quantiles

    random.seed(13)
    rows = []
    for grp, n in (("a", 1), ("b", 500), ("c", 2000)):
        for _ in range(n):
            rows.append(
                (grp, random.randint(-1000, 1000), random.randint(1, 50))
            )
    df = spark.createDataFrame(rows, "g string, v long, w long")
    pcts = [(1, 2), (9, 10), (99, 100)]
    got = {
        r["g"]: (r["total_weight"], list(r["qs"]))
        for r in exact_group_weighted_quantiles(
            df, ["g"], "v", "w", pcts, value_kind="bigint"
        ).collect()
    }
    by_g = {}
    for grp, v, w in rows:
        by_g.setdefault(grp, []).append((v, w))
    for grp, vw in by_g.items():
        vw.sort()
        total = sum(w for _, w in vw)
        expect = []
        for num, den in pcts:
            k = -(-num * total // den)  # ceil
            cum = 0
            for v, w in vw:
                cum += w
                if cum >= k:
                    expect.append(v)
                    break
        assert got[grp] == (total, expect), grp


def test_weighted_quantiles_double_values_and_zero_weights(spark):
    from sparketl.operators.quantiles import exact_group_weighted_quantiles

    df = spark.createDataFrame(
        [
            ("g", -2.5, 1),
            ("g", 0.5, 0),  # zero weight: carries no mass, ignored
            ("g", 1.25, 2),
            ("g", 7.0, 1),
            ("g", None, 9),  # null value ignored
        ],
        "g string, v double, w long",
    )
    row = exact_group_weighted_quantiles(
        df, ["g"], "v", "w", [(1, 2), (1, 1)], value_kind="double"
    ).collect()[0]
    # W=4; median threshold ceil(2)=2 -> cum: -2.5(1), 1.25(3) -> 1.25
    assert row["total_weight"] == 4
    assert list(row["qs"]) == [1.25, 7.0]


def test_weighted_quantiles_ungrouped(spark):
    from sparketl.operators.quantiles import exact_group_weighted_quantiles

    df = spark.createDataFrame(
        [(float(i), 1) for i in range(1, 101)], "v double, w long"
    )
    out = exact_group_weighted_quantiles(df, [], "v", "w", [(1, 2)])
    assert out.columns == ["total_weight", "qs"]
    assert list(out.collect()[0]["qs"]) == [50.0]


def test_adversarial_float_shapes_property(spark):
    """Property check on hostile IEEE shapes: subnormals, ±0.0,
    extreme exponents, dense ties — the radix keys must order exactly
    like Spark's percentile() and reproduce its doubles bit for bit."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    values = st.one_of(
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.sampled_from(
            [0.0, -0.0, 5e-324, -5e-324, 1.7976931348623157e308, -1.0, 1.0]
        ),
        st.integers(min_value=-5, max_value=5).map(float),
    )

    @settings(max_examples=12, deadline=None)
    @given(st.lists(values, min_size=1, max_size=40))
    def check(xs):
        df = spark.createDataFrame([("g", float(v)) for v in xs], "g string, v double")
        pcts = [0.0, 0.37, 0.5, 0.93, 1.0]
        arr = ", ".join(f"{p}D" for p in pcts)
        ref = (
            df.groupBy("g")
            .agg(F.expr(f"percentile(v, array({arr}))").alias("q"))
            .collect()[0]["q"]
        )
        got = _radix(df, ["g"], "v", pcts).collect()[0]["qs"]
        for a, b in zip(ref, got):
            # repr-level equality, matching the driver hash; +0.0/-0.0
            # must round-trip distinctly
            assert repr(a) == repr(b), (xs, list(ref), list(got))

    check()


def test_multi_group_quantiles_matches_singles(spark):
    """Phase-fused selection: k columns in ONE 4-pass run must equal k
    independent exact_group_quantiles calls (and thus percentile()),
    across mixed value kinds, per-column nulls, and uneven pct lists."""
    import random

    from sparketl.operators.quantiles import exact_multi_group_quantiles

    random.seed(23)
    rows = []
    for grp, n in (("a", 7), ("b", 900)):
        for i in range(n):
            rows.append(
                (
                    grp,
                    round(random.uniform(-1e5, 1e5), 3),
                    random.randint(-(10**9), 10**9),
                    None if i % 11 == 0 else random.uniform(-1.0, 1.0),
                )
            )
    df = spark.createDataFrame(rows, "g string, x double, y long, z double")
    specs = [
        ("x", "double", [0.2, 0.4, 0.6, 0.8]),
        ("y", "bigint", [0.5, 0.99]),
        ("z", "double", [0.1, 0.5, 0.9]),
    ]
    fused = {
        (r["g"], r["_ph"]): (r["n_values"], list(r["qs"]))
        for r in exact_multi_group_quantiles(df, ["g"], specs).collect()
    }
    n_q = max(len(p) for _, _, p in specs)
    for ph, (col, kind, pcts) in enumerate(specs):
        single = _radix(df, ["g"], col, pcts, value_kind=kind).collect()
        for r in single:
            n, qs = fused[(r["g"], ph)]
            assert n == r["n_values"], (ph, r["g"])
            assert qs[: len(pcts)] == list(r["qs"]), (ph, r["g"])
            assert all(q is None for q in qs[len(pcts) :]), (ph, r["g"])
    assert len(fused) == 2 * len(specs)


def test_multi_group_quantiles_ungrouped(spark):
    from sparketl.operators.quantiles import exact_multi_group_quantiles

    df = spark.createDataFrame(
        [(float(i), i * 10) for i in range(101)], "x double, y long"
    )
    out = exact_multi_group_quantiles(
        df, [], [("x", "double", [0.5]), ("y", "bigint", [0.5])]
    )
    assert out.columns == ["_ph", "n_values", "qs"]
    got = {r["_ph"]: list(r["qs"]) for r in out.collect()}
    assert got == {0: [50.0], 1: [500.0]}


def test_multi_no_object_hash_aggregate(spark):
    from sparketl.operators.quantiles import exact_multi_group_quantiles

    df = spark.createDataFrame(
        [("g", float(i % 97), i % 13) for i in range(4000)],
        "g string, x double, y long",
    )
    out = exact_multi_group_quantiles(
        df, ["g"], [("x", "double", [0.5]), ("y", "bigint", [0.9])]
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "percentile" not in plan.lower()
    assert "ObjectHashAggregate" not in plan


def test_weighted_interp_matches_percentile_on_expanded(spark):
    """quantile_cont semantics over the weight-expanded multiset,
    WITHOUT expanding: must equal percentile() run on the literally
    expanded table, bit for bit (same interpolation arithmetic)."""
    import random

    from sparketl.operators.quantiles import (
        exact_group_weighted_quantiles_interp,
    )

    random.seed(31)
    rows = []
    for grp, n in (("one", 1), ("b", 400)):
        for _ in range(n):
            rows.append(
                (grp, round(random.uniform(-100.0, 100.0), 4), random.randint(1, 9))
            )
    df = spark.createDataFrame(rows, "g string, v double, w int")
    pcts = [0.0, 0.25, 0.5, 0.777, 1.0]
    arr = ", ".join(f"{p}D" for p in pcts)
    expanded = df.select(
        "g", F.explode(F.expr("array_repeat(v, w)")).alias("v")
    )
    ref = {
        r["g"]: list(r["q"])
        for r in expanded.groupBy("g")
        .agg(F.expr(f"percentile(v, array({arr}))").alias("q"))
        .collect()
    }
    got = exact_group_weighted_quantiles_interp(
        df, ["g"], "v", "w", pcts
    ).collect()
    for r in got:
        assert [repr(a) for a in r["qs"]] == [repr(b) for b in ref[r["g"]]], r["g"]


def test_weighted_interp_unit_weights_reduce_to_unweighted(spark):
    from sparketl.operators.quantiles import (
        exact_group_weighted_quantiles_interp,
    )

    df = spark.createDataFrame(
        [("g", float(i), 1) for i in range(10)], "g string, v double, w int"
    )
    pcts = [0.15, 0.5, 0.85]
    got = exact_group_weighted_quantiles_interp(
        df, ["g"], "v", "w", pcts
    ).collect()[0]
    ref = _radix(df, ["g"], "v", pcts).collect()[0]
    assert list(got["qs"]) == list(ref["qs"])
    assert got["total_weight"] == 10


def test_weighted_interp_drops_nulls_and_nonpositive_weights(spark):
    from sparketl.operators.quantiles import (
        exact_group_weighted_quantiles_interp,
    )

    df = spark.createDataFrame(
        [("g", 1.0, 3), ("g", None, 5), ("g", 2.0, 0), ("g", 3.0, 1)],
        "g string, v double, w int",
    )
    row = exact_group_weighted_quantiles_interp(
        df, ["g"], "v", "w", [0.5]
    ).collect()[0]
    # expanded multiset = [1,1,1,3]; pos = 0.5*3 = 1.5 -> (1+1)/2 = 1.0
    assert row["total_weight"] == 4
    assert list(row["qs"]) == [1.0]


def test_histogram_sketch_error_bound_and_merge(spark):
    """ext_147 (r11): the histogram sketch's estimate is the lower
    edge of the bucket containing the target rank, so the exact
    rank-r value must lie in [est, est + bucket_width). Also asserts
    the mergeability premise: bucket counts from two disjoint shards
    sum to the full histogram (the sketch is order-free)."""
    from sparketl.io import load_table
    from sparketl.operators.quantiles import histogram_quantile_sketch

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    out = {
        r["q_permille"]: r
        for r in histogram_quantile_sketch(li).collect()
    }
    cents = sorted(
        r[0]
        for r in li.selectExpr(
            "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
        ).collect()
    )
    n = len(cents)
    for p, num, den in ((500, 1, 2), (900, 9, 10), (990, 99, 100)):
        row = out[p]
        rank = -(-(num * n) // den)  # ceil
        assert row["target_rank"] == rank
        exact = cents[rank - 1]
        assert row["est_cents"] <= exact < row["est_cents"] + row[
            "bucket_width_cents"
        ], (p, exact, dict(row.asDict()))
    # order-freedom / mergeability: shard histograms sum to the whole
    from pyspark.sql import functions as F

    h_all = (
        histogram_quantile_sketch(li)
        .select(F.sum("cum_count"))
    )  # smoke the plan; the real merge check is on raw counts:
    a = li.where("l_orderkey % 2 = 0")
    b = li.where("l_orderkey % 2 = 1")

    def hist(df):
        vals = df.selectExpr(
            "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c"
        )
        lo, hi = li.selectExpr(
            "MIN(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT))",
            "MAX(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT))",
        ).first()
        return {
            r[0]: r[1]
            for r in vals.selectExpr(
                f"least(255, ((c - {lo}) * 256) div ({hi} - {lo} + 1)) AS i"
            )
            .groupBy("i")
            .count()
            .collect()
        }
    ha, hb, hfull = hist(a), hist(b), hist(li)
    merged = {k: ha.get(k, 0) + hb.get(k, 0) for k in set(ha) | set(hb)}
    assert merged == hfull


def test_grouped_quantile_bands_pane_merge_equals_direct(spark):
    """ext_164: the shard-mergeability claim, exercised end to end —
    per-half grouped histograms under the group's SHARED bounds sum
    into the full histogram, and band selection on the MERGED
    histogram equals the direct computation row for row (the
    persisted-sketch fold at 100 TB: hourly histograms sum into daily
    bands without re-reading values)."""
    from pyspark.sql import functions as F

    from sparketl.io import load_table
    from sparketl.operators.quantiles import (
        bands_from_histogram,
        grouped_bounds,
        grouped_cents,
        grouped_histogram,
        grouped_quantile_bands,
    )
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    direct = [
        tuple(r) for r in grouped_quantile_bands(ev).collect()
    ]

    vals = grouped_cents(ev, "event_type", "value")
    bounds = grouped_bounds(vals)  # SHARED edges — the merge contract
    a = grouped_histogram(
        vals.where(F.col("c") % 2 == 0), bounds
    )
    b = grouped_histogram(
        vals.where(F.col("c") % 2 != 0), bounds
    )
    merged = (
        a.unionByName(b)
        .groupBy("g", "bucket_idx")
        .agg(F.sum("n_in_bucket").alias("n_in_bucket"))
    )
    folded = [
        tuple(r) for r in bands_from_histogram(merged, bounds).collect()
    ]
    assert folded == direct and len(direct) > 0


def test_grouped_quantile_bands_error_bound(spark):
    """Each band estimate must sit within one bucket width of the
    exact per-group percentile (the ext_147 bound, per group)."""
    from sparketl.io import load_table
    from sparketl.operators.quantiles import grouped_quantile_bands
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    got = grouped_quantile_bands(ev).collect()
    import duckdb

    from sparketl.io import table_path

    con = duckdb.connect()
    exact = {}
    for g, q5, q9, q99 in con.execute(
        f"""
        SELECT event_type,
               CAST(quantile_disc(c, 0.5) AS BIGINT),
               CAST(quantile_disc(c, 0.9) AS BIGINT),
               CAST(quantile_disc(c, 0.99) AS BIGINT)
        FROM (SELECT event_type,
                     CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
              FROM read_parquet('{table_path(SF_SMOKE, "events")}'))
        GROUP BY event_type
        """
    ).fetchall():
        exact[(g, 500)], exact[(g, 900)], exact[(g, 990)] = q5, q9, q99
    assert len(got) > 0
    for r in got:
        true = exact[(r["group_key"], r["q_permille"])]
        assert (
            r["est_cents"] <= true < r["est_cents"] + r["bucket_width_cents"]
        ), (r["group_key"], r["q_permille"], true, tuple(r))
