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
