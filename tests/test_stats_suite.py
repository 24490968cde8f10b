"""Semantics tests for the round-7 statistical-audit suite: grouped
one-way ANOVA, chi-squared independence, temperature-based mixture
weights, sorted-neighborhood ER blocking, and the Benford first-digit
audit. Each test recomputes the exact integer-quantized statistic in
pure Python over a small frame (the formulas use integer division, so
Python's ``//`` mirrors Spark's ``div`` and DuckDB's ``//`` exactly).
"""

import math

from sparketl.operators.analytics import (
    benford_audit,
    chi2_independence,
    grouped_anova,
)
from sparketl.operators.dedup import sorted_neighborhood_blocking
from sparketl.operators.pipeline_ops import temperature_mixture


def _docs(spark, rows):
    """rows: (doc_id, lang, source, n_chars, text)."""
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars int, text string"
    )


def test_grouped_anova_matches_integer_recompute(spark):
    rows = [
        (1, "en", "a", 100, "x"),
        (2, "en", "a", 140, "x"),
        (3, "en", "b", 300, "x"),
        (4, "en", "b", 340, "x"),
        (5, "en", "b", 320, "x"),
        (6, "de", "a", 50, "x"),  # k=1 → filtered out
    ]
    got = {r["lang"]: r for r in grouped_anova(_docs(spark, rows)).collect()}
    assert list(got) == ["en"]
    # exact integer recompute
    groups = {"a": [100, 140], "b": [300, 340, 320]}
    n = sum(len(v) for v in groups.values())
    s = sum(sum(v) for v in groups.values())
    ss = sum(x * x for v in groups.values() for x in v)
    t_micro = sum((1_000_000 * sum(v) * sum(v)) // len(v) for v in groups.values())
    ssb = t_micro - (1_000_000 * s * s) // n
    ssw = 1_000_000 * ss - t_micro
    r = got["en"]
    assert (r["k"], r["n"], r["ssb_micro"], r["ssw_micro"]) == (2, n, ssb, ssw)
    assert r["f_stat"] == (ssb / (2 - 1)) / (ssw / (n - 2))


def test_grouped_anova_equal_means_gives_zero_ssb(spark):
    # both sources have identical values → between-group SS is exactly 0
    rows = [
        (i, "en", src, v, "x")
        for i, (src, v) in enumerate(
            [("a", 100), ("a", 200), ("b", 100), ("b", 200)]
        )
    ]
    r = grouped_anova(_docs(spark, rows)).collect()[0]
    assert r["ssb_micro"] == 0 and r["f_stat"] == 0.0


def test_chi2_independence_zero_under_exact_independence(spark):
    # balanced 2×2 design: o = r*c/N exactly → every partial is 0
    rows = []
    i = 0
    for src in ("a", "b"):
        for n_chars in (100, 600):  # buckets 0 and 1
            for _ in range(4):
                rows.append((i, "en", src, n_chars, "x"))
                i += 1
    out = chi2_independence(_docs(spark, rows)).collect()
    assert {r["source"] for r in out} == {"a", "b"}
    assert all(r["partial_chi2_milli"] == 0 for r in out)
    assert all(r["n_docs"] == 8 and r["n_buckets"] == 2 for r in out)


def test_chi2_independence_matches_integer_recompute(spark):
    import collections

    rows = [
        (1, "en", "a", 100, "x"),
        (2, "en", "a", 120, "x"),
        (3, "en", "a", 700, "x"),
        (4, "en", "b", 900, "x"),
        (5, "en", "b", 800, "x"),
        (6, "en", "b", 50, "x"),
        (7, "en", "b", 60, "x"),
    ]
    o = collections.Counter((src, nc // 500) for _, _, src, nc, _ in rows)
    r_m = collections.Counter(src for _, _, src, _, _ in rows)
    c_m = collections.Counter(nc // 500 for _, _, src, nc, _ in rows)
    n = len(rows)
    want = {
        src: sum(
            (1000 * n * o[(src, b)] * o[(src, b)]) // (r_m[src] * c_m[b])
            for b in c_m
            if (src, b) in o
        )
        - 1000 * r_m[src]
        for src in r_m
    }
    got = {
        r["source"]: r["partial_chi2_milli"]
        for r in chi2_independence(_docs(spark, rows)).collect()
    }
    assert got == want


def test_temperature_mixture_matches_python_recompute(spark):
    rows = [
        (1, "en", "a", 10, "w w w w"),          # 4 tokens
        (2, "en", "b", 10, "w w w w w w w w"),  # 8 tokens
        (3, "en", "c", 10, "w w w w"),          # 4 tokens
    ]
    out = {r["source"]: r for r in temperature_mixture(_docs(spark, rows)).collect()}
    toks = {"a": 4, "b": 8, "c": 4}
    total = sum(toks.values())
    sq = {s: math.floor(math.sqrt(t / total) * 1_000_000) for s, t in toks.items()}
    z = sum(sq.values())
    for s, t in toks.items():
        r = out[s]
        assert r["n_tokens"] == t
        assert r["p_ppm"] == (1_000_000 * t) // total
        assert r["weight_ppm"] == (1_000_000 * sq[s]) // z
        assert r["boost_milli"] == (1000 * r["weight_ppm"]) // r["p_ppm"]
    # temperature flattening: the rare sources get boosted above their
    # natural share, the dominant one is downweighted
    assert out["a"]["boost_milli"] > 1000 > out["b"]["boost_milli"]


def test_sorted_neighborhood_candidate_count_and_match(spark):
    # 5 en docs → window-3 candidates = 3n-6 = 9; one planted near-dup
    # pair adjacent in length order must verify (Jaccard ≥ 0.5)
    rows = [
        (1, "en", "a", 10, "alpha beta gamma delta"),
        (2, "en", "a", 11, "alpha beta gamma epsilon"),  # near-dup of 1
        (3, "en", "a", 50, "zeta eta theta iota"),
        (4, "en", "a", 90, "kappa lambda mu nu"),
        (5, "en", "a", 130, "xi omicron pi rho"),
        (6, "de", "b", 10, "eins zwei"),
        (7, "de", "b", 20, "drei vier"),
    ]
    out = {r["lang"]: r for r in sorted_neighborhood_blocking(_docs(spark, rows)).collect()}
    assert out["en"]["n_candidates"] == 3 * 5 - 6
    assert out["en"]["n_matched"] == 1
    # de: n=2 → only the j=1 pair
    assert out["de"]["n_candidates"] == 1 and out["de"]["n_matched"] == 0


def test_benford_audit_matches_integer_recompute(spark):
    import collections

    vals = [1.5, 19.0, 23.0, 29.99, 310.0, 35.0, 41.0, 99.0, 912.5]
    df = spark.createDataFrame([(v,) for v in vals], "amount double")
    out = {r["digit"]: r for r in benford_audit(df, "amount").collect()}
    obs = collections.Counter(int(str(int(math.floor(v)))[0]) for v in vals)
    n = len(vals)
    e = {1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
         6: 66946, 7: 57991, 8: 51152, 9: 45757}
    assert set(out) == set(obs)
    for d, r in out.items():
        assert r["observed"] == obs[d]
        assert r["expected_micro"] == n * e[d]
        exp = n * e[d] / 1_000_000.0
        assert r["chi2_contrib_milli"] == math.floor(
            (obs[d] - exp) * (obs[d] - exp) / exp * 1000.0
        )


def test_mann_whitney_matches_exact_recompute(spark):
    from sparketl.operators.analytics import mann_whitney_u

    # sample A = source "a" (min), B = source "z" (max); "m" excluded
    rows = [
        (1, "en", "a", 10, "x"),
        (2, "en", "a", 20, "x"),
        (3, "en", "a", 20, "x"),
        (4, "en", "z", 20, "x"),
        (5, "en", "z", 30, "x"),
        (6, "en", "m", 999, "x"),  # not min/max source → excluded
    ]
    r = mann_whitney_u(_docs(spark, rows)).collect()[0]
    a_vals, b_vals = [10, 20, 20], [20, 30]
    # exact 2x-scaled rank-sum recompute
    allv = sorted(a_vals + b_vals)
    def dr2(v):
        less = sum(1 for x in allv if x < v)
        ties = sum(1 for x in allv if x == v)
        return 2 * less + ties + 1
    r2_a = sum(dr2(v) for v in a_vals)
    u2_a = r2_a - len(a_vals) * (len(a_vals) + 1)
    assert (r["n_a"], r["n_b"]) == (3, 2)
    assert r["u2_a"] == u2_a
    assert r["u2_a"] + r["u2_b"] == 2 * r["n_a"] * r["n_b"]


def test_mann_whitney_detects_stochastic_shift(spark):
    from sparketl.operators.analytics import mann_whitney_u

    # B entirely above A → U_A = 0 (A never wins a pairwise comparison)
    rows = [(i, "en", "a", v, "x") for i, v in enumerate([1, 2, 3])] + [
        (10 + i, "en", "z", v, "x") for i, v in enumerate([100, 200, 300])
    ]
    r = mann_whitney_u(_docs(spark, rows)).collect()[0]
    assert r["u2_a"] == 0 and r["u2_b"] == 2 * 9


def test_ks_zero_for_identical_and_full_for_disjoint(spark):
    from sparketl.operators.analytics import ks_two_sample

    same = [(i, "en", "a", v, "x") for i, v in enumerate([5, 10, 15])] + [
        (10 + i, "en", "z", v, "x") for i, v in enumerate([5, 10, 15])
    ]
    r = ks_two_sample(_docs(spark, same)).collect()[0]
    assert r["d_num"] == 0 and r["d_milli"] == 0
    disjoint = [(i, "en", "a", v, "x") for i, v in enumerate([1, 2])] + [
        (10 + i, "en", "z", v, "x") for i, v in enumerate([50, 60])
    ]
    r = ks_two_sample(_docs(spark, disjoint)).collect()[0]
    # at v=2: cum_a=2, cum_b=0 → D = 2*2 = n_a*n_b → d_milli = 1000
    assert r["d_num"] == r["n_a"] * r["n_b"] and r["d_milli"] == 1000


def test_concentration_uniform_vs_single_source(spark):
    from sparketl.operators.analytics import source_concentration

    # en: 4 equal sources → HHI = 1/4, Gini = 0
    # de: everything in one source → HHI = 1, Gini → 0 (n=1)
    rows = [(i, "en", f"s{i}", 10, "w w") for i in range(4)] + [
        (10, "de", "only", 10, "w w w w")
    ]
    out = {r["lang"]: r for r in source_concentration(_docs(spark, rows)).collect()}
    assert out["en"]["hhi_ppm"] == 250_000 and out["en"]["gini_milli"] == 0
    assert out["de"]["hhi_ppm"] == 1_000_000 and out["de"]["n_sources"] == 1


def test_concentration_gini_matches_recompute(spark):
    from sparketl.operators.analytics import source_concentration

    toks = {"a": 1, "b": 2, "c": 7}  # tokens per source (n_words)
    rows = [
        (i, "en", s, 10, " ".join(["w"] * t))
        for i, (s, t) in enumerate(toks.items())
    ]
    r = source_concentration(_docs(spark, rows)).collect()[0]
    total = sum(toks.values())
    n = len(toks)
    iws = sum((i + 1) * t for i, t in enumerate(sorted(toks.values())))
    assert r["total_tokens"] == total
    assert r["hhi_ppm"] == (1_000_000 * sum(t * t for t in toks.values())) // (total * total)
    assert r["gini_milli"] == (1000 * (2 * iws - (n + 1) * total)) // (n * total)


# -- round 8: Welch t-test, autocorrelation, triangles, k-means --------------


def test_welch_ttest_matches_python_recompute(spark):
    """One source shifted far above the rest: its one-vs-rest t must
    be large-positive and match a pure-Python Welch recompute through
    the same quantization."""
    rows = []
    did = 0
    for src, base in (("a", 100), ("b", 100), ("c", 500)):
        for i in range(8):
            rows.append((did, "en", src, base + i, "t"))
            did += 1
    df = _docs(spark, rows)
    from sparketl.operators.analytics import welch_ttest_one_vs_rest

    got = {r["source"]: r for r in welch_ttest_one_vs_rest(df).collect()}

    vals = {s: [base + i for i in range(8)] for s, base in
            (("a", 100), ("b", 100), ("c", 500))}
    for src in vals:
        xs = vals[src]
        rest = [v for s in vals if s != src for v in vals[s]]
        n, m = len(xs), sum(xs) / len(xs)
        nr, mr = len(rest), sum(rest) / len(rest)
        va = sum((v - m) ** 2 for v in xs) / (n - 1)
        vr = sum((v - mr) ** 2 for v in rest) / (nr - 1)
        ua, ub = va / n, vr / nr
        t = (m - mr) / math.sqrt(ua + ub)
        r = got[src]
        assert abs(r["t_micro"] / 1e6 - t) < 1e-4, (src, r["t_micro"], t)
    assert got["c"]["t_micro"] > 0 and got["a"]["t_micro"] < 0


def test_autocorrelation_signs_on_known_series(spark):
    """An alternating series has lag-1 ACF near −1; a slow ramp has
    lag-1 ACF near +1."""
    import datetime

    rows = []
    t0 = datetime.datetime(2024, 1, 1)
    for i in range(40):
        rows.append((i, t0 + datetime.timedelta(minutes=i), 1,
                     "alt", 10.0 if i % 2 == 0 else 20.0, None))
        rows.append((1000 + i, t0 + datetime.timedelta(minutes=i), 2,
                     "ramp", float(i), None))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from sparketl.operators.analytics import grouped_autocorrelation

    got = {(r["event_type"], r["lag"]): r["acf_micro"] / 1e6
           for r in grouped_autocorrelation(ev, lags=(1,)).collect()}
    assert got[("alt", 1)] < -0.9
    assert got[("ramp", 1)] > 0.85


def test_triangles_on_known_graph(spark):
    """K4 built from co-purchase: 4 customers, each pair sharing 4
    dedicated parts → 6 edges, 4 triangles, clustering 1.0; a 5th
    customer sharing only 3 parts with customer 0 stays below the
    edge bar."""
    li_rows, part = [], 0
    for a in range(4):
        for b in range(a + 1, 4):
            for _ in range(4):
                li_rows.append((a, part))
                li_rows.append((b, part))
                part += 1
    for _ in range(3):  # sub-threshold pair (0, 4)
        li_rows.append((0, part))
        li_rows.append((4, part))
        part += 1
    # one order per customer: orderkey == custkey
    li = spark.createDataFrame(li_rows, "l_orderkey long, l_partkey long")
    orders = spark.createDataFrame(
        [(c, c) for c in range(5)], "o_orderkey long, o_custkey long"
    )
    from sparketl.operators.analytics import global_clustering

    r = global_clustering(li, orders).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)
    assert r["clustering_micro"] == 1_000_000
    assert r["n_dropped_parts"] == 0


def test_clustering_hot_part_fanout_cap(spark):
    """A viral part bought by every customer would cost buyers² pairs
    in generation; with the per-part cap it is dropped BEFORE the
    self-join, the drop is surfaced (no-silent-caps), and the rest of
    the graph is unaffected: the K4 from the test above plus one part
    shared by all 30 customers yields identical census numbers with
    n_dropped_parts = 1."""
    li_rows, part = [], 0
    for a in range(4):
        for b in range(a + 1, 4):
            for _ in range(4):
                li_rows.append((a, part))
                li_rows.append((b, part))
                part += 1
    hot = part
    for c in range(30):  # viral part: every customer bought it
        li_rows.append((c, hot))
    li = spark.createDataFrame(li_rows, "l_orderkey long, l_partkey long")
    orders = spark.createDataFrame(
        [(c, c) for c in range(30)], "o_orderkey long, o_custkey long"
    )
    from sparketl.operators.analytics import global_clustering

    r = global_clustering(li, orders, max_part_buyers=10).collect()[0]
    assert r["n_dropped_parts"] == 1
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)
    assert r["clustering_micro"] == 1_000_000
    # without the cap, the viral part alone adds 30*29/2 = 435 pairs
    # but still no edges (1 shared part < bar); the census must agree
    r2 = global_clustering(li, orders).collect()[0]
    assert (r2["n_edges"], r2["n_triangles"], r2["n_dropped_parts"]) == (
        6, 4, 0,
    )


def test_kmeans_recovers_planted_clusters(spark):
    """Two well-separated planted blobs in 4-d (padded to a list col):
    the fixed-iteration k-means with k=2 must put each blob in one
    cluster."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for i in range(30):
        center = [5.0, 5.0, -5.0, -5.0] if i % 2 == 0 else [-5.0, -5.0, 5.0, 5.0]
        vec = (np.array(center) + rng.normal(0, 0.1, 4)).tolist()
        rows.append((i, [float(v) for v in vec], i % 2))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    from sparketl.operators.similarity import kmeans_fixed

    out = {r["c"]: r for r in kmeans_fixed(emb, k=2, iters=2).collect()}
    assert sorted(r["n_members"] for r in out.values()) == [15, 15]
    # centroid dim 0 separates the blobs: one ≈ +5000 milli, one ≈ −5000
    c0s = sorted(r["c0"] for r in out.values())
    assert c0s[0] < -4_000_000 // 1000 and c0s[1] > 4_000_000 // 1000
