"""Scale utilities: salted join ≡ plain join; bucketed join is
exchange-free."""

import pytest
from pyspark.sql import functions as F

from sparketl.io import load_table
from sparketl.operators.scale import bucketed_join, salted_join, write_bucketed
from tests.conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    plain = sorted(
        tuple(r)
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_linenumber", "o_totalprice")
        .collect()
    )
    salted = sorted(
        tuple(r)
        for r in salted_join(li, o, "l_orderkey", "o_orderkey", n_salts=8)
        .select("l_orderkey", "l_linenumber", "o_totalprice")
        .collect()
    )
    assert plain == salted and len(plain) > 0


def test_salted_join_splits_hot_key(spark):
    """A 90%-hot key must land in multiple salt groups."""
    hot = spark.range(0, 1000).select(
        F.when(F.col("id") < 900, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 2000).select(F.col("id").alias("k2"), F.lit("d").alias("attr"))
    out = salted_join(hot, dim, "k", "k2", n_salts=8)
    assert out.count() == 1000
    # the salt itself must spread the hot key: recompute it as the join did
    salts = (
        hot.withColumn(
            "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in hot.columns]), F.lit(8))
        )
        .where(F.col("k") == 1)
        .select("__salt")
        .distinct()
        .count()
    )
    assert salts >= 4, f"hot key only spread over {salts} salts"


@pytest.fixture()
def warehouse_tables(spark):
    yield
    for t in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, warehouse_tables):
    o = load_table(spark, SF_SMOKE, "orders")
    c = load_table(spark, SF_SMOKE, "customer")
    write_bucketed(o, "b_orders", "o_custkey", n_buckets=8)
    write_bucketed(c, "b_customer", "c_custkey", n_buckets=8)
    # disable auto-broadcast so the test proves bucketing (not
    # broadcast) removed the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "b_orders", "b_customer", "o_custkey", "c_custkey")
        n = j.count()
        assert n == o.join(c, o.o_custkey == c.c_custkey).count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join still shuffles"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_partition_pruning_static_and_dynamic(spark, tmp_path):
    """Partition-layout pruning end to end: a hive-partitioned write
    (sources.write_parquet partition_by) serves (a) static pruning — a
    literal partition predicate lists only that directory — and (b)
    DYNAMIC partition pruning, where the partition filter is a runtime
    subquery fed by the broadcast dim side of a join. At 100 TB the
    partitioned layout is what turns a full scan into reading one
    day/type directory."""
    ev = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "ev_by_type")
    ev.write.partitionBy("event_type").parquet(path)
    fact = spark.read.parquet(path)
    types = sorted(r[0] for r in ev.select("event_type").distinct().collect())
    assert len(types) >= 3

    # (a) static: the scan's PartitionFilters carry the literal and the
    # file index lists only the matching directory
    one = fact.where(F.col("event_type") == types[0]).groupBy().count()
    n_one = one.collect()[0][0]
    assert n_one == ev.where(F.col("event_type") == types[0]).count()
    static_plan = one._jdf.queryExecution().executedPlan().toString()
    # the literal lands in PartitionFilters (directory listing), not a
    # post-scan DataFilter
    pf_line = next(
        ln for ln in static_plan.splitlines() if "PartitionFilters" in ln
    )
    assert f"= {types[0]}" in pf_line or f"= {types[0]})" in static_plan

    # (b) dynamic: joining against a filtered (broadcastable) dim frame
    # injects a dynamicpruning subquery into the scan's PartitionFilters
    dim = spark.createDataFrame(
        [(t, i) for i, t in enumerate(types)], "event_type string, w int"
    )
    j = (
        fact.join(dim.where(F.col("w") < 1), "event_type")
        .groupBy("event_type")
        .count()
    )
    rows = j.collect()
    assert [r["event_type"] for r in rows] == [types[0]]
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
