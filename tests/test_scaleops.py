"""Semantics of the scale-technique operators: Bloom pre-filter
equivalence + actual pruning, sampler determinism/stratum rates, and
PageRank fixed-point on a hand-computed graph."""

from pyspark.sql import functions as F

from sparketl.io import load_table
from sparketl.operators.scaleops import (
    _SCALE,
    bloom_prefilter_join,
    hash_stratified_sample,
    pagerank_fixed,
)
from tests.conftest import SF_SMOKE


def test_bloom_join_equals_plain_join(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_partkey", "l_quantity")
    small = load_table(spark, SF_SMOKE, "part").where(F.col("p_size") >= 48)
    got = bloom_prefilter_join(li, small, "l_partkey", "p_partkey")
    want = li.join(small, li.l_partkey == small.p_partkey)
    assert got.count() == want.count() > 0
    assert (
        got.groupBy("p_brand").count().orderBy("p_brand").collect()
        == want.groupBy("p_brand").count().orderBy("p_brand").collect()
    )


def test_bloom_prefilter_actually_prunes(spark):
    """The semi-join stage alone must drop most non-matching probe rows
    (false-positive rate ≪ 1 at these sizes)."""
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_partkey")
    small = load_table(spark, SF_SMOKE, "part").where(F.col("p_size") >= 48)
    n_bits = 1 << 22
    pruned = li
    for seed in range(2):
        buckets = small.select(
            F.pmod(F.xxhash64(F.col("p_partkey"), F.lit(seed)), F.lit(n_bits)).alias(
                "__bucket"
            )
        ).distinct()
        probe = F.pmod(F.xxhash64(F.col("l_partkey"), F.lit(seed)), F.lit(n_bits))
        pruned = pruned.join(F.broadcast(buckets), probe == F.col("__bucket"), "left_semi")
    exact = li.join(
        small.select("p_partkey"), li.l_partkey == F.col("p_partkey"), "left_semi"
    ).count()
    total = li.count()
    kept = pruned.count()
    assert exact <= kept < total  # conservative, but a real reduction


def test_hash_sample_deterministic_and_stratified(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    s1 = hash_stratified_sample(o, {"1-URGENT": 20, "5-LOW": 5})
    s2 = hash_stratified_sample(o, {"1-URGENT": 20, "5-LOW": 5})
    k1 = sorted(r["o_orderkey"] for r in s1.select("o_orderkey").collect())
    k2 = sorted(r["o_orderkey"] for r in s2.select("o_orderkey").collect())
    assert k1 == k2 and len(k1) > 0
    # observed per-stratum rates within loose binomial bounds
    tot = {
        r["o_orderpriority"]: r["n"]
        for r in o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {
        r["o_orderpriority"]: r["n"]
        for r in s1.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    urgent = got.get("1-URGENT", 0) / tot["1-URGENT"]
    low = got.get("5-LOW", 0) / tot["5-LOW"]
    assert 0.10 < urgent < 0.30
    assert low < 0.15


def test_pagerank_hand_computed_triangle(spark):
    # a -> b, a -> c, b -> a, c -> a   (a is the hub)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 1), (3, 1)], ["src", "dst"]
    )
    got = {r["node"]: r["rank"] for r in pagerank_fixed(edges, n_iters=1).collect()}
    base = int(0.15 * _SCALE)
    # iter 1: a gets SCALE/1 from b and from c; b,c each get SCALE/2 from a
    want_a = base + 85 * (2 * _SCALE) // 100
    want_bc = base + 85 * (_SCALE // 2) // 100
    assert got[1] == want_a
    assert got[2] == got[3] == want_bc
    assert got[1] > got[2]


def test_pagerank_two_iters_hub_stays_on_top(spark):
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 1), (3, 1)], ["src", "dst"]
    )
    rows = pagerank_fixed(edges, n_iters=2).collect()
    assert rows[0]["node"] == 1


def test_zorder_interleave_matches_python(spark):
    """Morton-code SQL expression ≡ pure-Python bit interleave."""
    from pyspark.sql import functions as F

    from sparketl.operators.scaleops import zorder_expr

    pts = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (40000, 7)]
    df = spark.createDataFrame(pts, "x long, y long").select(
        "x", "y", F.expr(zorder_expr("x", "y")).alias("z")
    )
    for r in df.collect():
        want = 0
        for k in range(16):
            want |= ((r.x >> k) & 1) << (2 * k)
            want |= ((r.y >> k) & 1) << (2 * k + 1)
        assert r.z == want, (r.x, r.y)


def test_zorder_buckets_bound_both_dimensions(spark):
    """The point of z-ordering: per-bucket spans shrink on BOTH columns
    (a 1-D sort bounds only its leading column). Median bucket span
    must be well under the global range on each dimension, and all
    rows must land in a bucket."""
    from sparketl.io import load_table
    from sparketl.operators.scaleops import zorder_layout_stats

    orders = load_table(spark, SF_SMOKE, "orders")
    rows = zorder_layout_stats(orders).collect()
    assert sum(r.n for r in rows) == orders.count()
    gmin_d = min(r.min_day for r in rows)
    gmax_d = max(r.max_day for r in rows)
    gmin_c = min(r.min_cents for r in rows)
    gmax_c = max(r.max_cents for r in rows)
    day_spans = sorted(r.max_day - r.min_day for r in rows)
    cent_spans = sorted(r.max_cents - r.min_cents for r in rows)
    med_d = day_spans[len(day_spans) // 2]
    med_c = cent_spans[len(cent_spans) // 2]
    assert med_d <= (gmax_d - gmin_d) / 3, (med_d, gmax_d - gmin_d)
    assert med_c <= (gmax_c - gmin_c) / 3, (med_c, gmax_c - gmin_c)


# --------------------------------------------------------- ext_148 CC


def _labels_dict(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_cc_star_path_graph_logarithmic_rounds(spark):
    """A 200-node path — the adversarial diameter case. Large-star/
    small-star must find the single component in O(log n) rounds
    (min-label propagation would need ~200)."""
    from sparketl.operators.scaleops import connected_components_star

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "a long, b long"
    )
    labels, rounds = connected_components_star(edges, return_rounds=True)
    got = _labels_dict(labels)
    assert got == {i: 0 for i in range(201)}
    assert rounds <= 12, f"path graph took {rounds} rounds"


def test_cc_star_matches_min_label_propagation(spark):
    """Algorithm cross-check: large-star/small-star ≡ dedup.dup_clusters
    min-label propagation on a multi-component random-ish graph."""
    from sparketl.operators.dedup import dup_clusters
    from sparketl.operators.scaleops import connected_components_star

    pairs = [
        (1, 5), (5, 9), (9, 3),          # component min 1
        (20, 21), (21, 22),              # component min 20
        (40, 41),                        # component min 40
        (7, 1), (3, 7),                  # cycle back into component 1
    ]
    edges = spark.createDataFrame(pairs, "a long, b long")
    star = _labels_dict(connected_components_star(edges))
    minlab = {
        r["doc_id"]: r["cluster_id"]
        for r in dup_clusters(
            edges.select(
                F.col("a").alias("doc_a"), F.col("b").alias("doc_b")
            )
        ).collect()
    }
    assert star == minlab
    assert star[9] == 1 and star[22] == 20 and star[41] == 40


def test_cc_star_raises_loudly_when_rounds_exhausted(spark):
    """r12 (advisor): exhausting max_rounds mid-iteration must RAISE,
    not return a possibly multi-labeled edge set that a downstream
    left join would silently duplicate."""
    import pytest

    from sparketl.operators.scaleops import connected_components_star

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "a long, b long"
    )
    with pytest.raises(RuntimeError, match="max_rounds"):
        connected_components_star(edges, max_rounds=1)


def test_star_forest_check_rejects_chain_state(spark):
    """r13 (r12 advisor): single-labeling alone passes a
    mid-convergence chain state (E={(2,1),(3,2)} labels each hi once,
    but node 2 is both hi and lo), so a checksum collision there would
    return inconsistent components. The fixed-point check must also
    require hi-set disjoint from lo-set — exactly the star forest."""
    from sparketl.operators.scaleops import _is_star_forest

    def edges(pairs):
        return spark.createDataFrame(pairs, "hi long, lo long")

    assert not _is_star_forest(edges([(2, 1), (3, 2)]))  # chain
    assert not _is_star_forest(edges([(3, 1), (3, 2)]))  # double label
    assert _is_star_forest(edges([(2, 1), (3, 1), (5, 4)]))  # star forest
    assert _is_star_forest(edges([]).limit(0))  # vacuous


def test_cc_star_empty_and_self_loops(spark):
    from sparketl.operators.scaleops import connected_components_star

    empty = spark.createDataFrame([], "a long, b long")
    assert connected_components_star(empty).count() == 0
    loops = spark.createDataFrame([(3, 3), (4, 4), (3, 4)], "a long, b long")
    assert _labels_dict(connected_components_star(loops)) == {3: 3, 4: 3}


def test_length_chain_components_segments(spark):
    """Hand-built corpus: two chains and a singleton in one lang,
    one chain in another; component = maximal run with gap <= 2."""
    from sparketl.operators.scaleops import length_chain_components

    rows = [
        # lang en: lengths 10, 11, 13 chain (gaps 1,2); 20 singleton;
        # 30, 31 chain
        (1, "en", 10), (2, "en", 11), (3, "en", 13),
        (4, "en", 20),
        (5, "en", 30), (6, "en", 31),
        # lang fr: 10, 12 chain — must NOT merge with en's 10..13
        (7, "fr", 10), (8, "fr", 12),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long"
    )
    got = {
        r["component_id"]: (r["lang"], r["n_members"], r["min_chars"], r["max_chars"])
        for r in length_chain_components(docs).collect()
    }
    assert got == {
        1: ("en", 3, 10, 13),
        4: ("en", 1, 20, 20),
        5: ("en", 2, 30, 31),
        7: ("fr", 2, 10, 12),
    }
