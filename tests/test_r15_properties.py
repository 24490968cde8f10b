"""Round-15 optimization-mechanism tests.

Pins the r15 write/merge machinery: write-job stats (arrow task writer
for string-bearing schemas, observe+footer path for numeric ones),
driver-insert MERGEs (broadcast-left + local insert file), the
capture_matched pre-image channel, key_bounds validation (r14 advisor),
and the exact-hash partition keys behind the sampling-free staging and
z-order compact.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparketl.tables import ManagedTable, TableError


def _mk(spark, tmp_path, name, fields):
    t = ManagedTable(spark, str(tmp_path / name))
    t.create(T.StructType(fields))
    return t


def _num_table(spark, tmp_path, name="t"):
    t = _mk(
        spark,
        tmp_path,
        name,
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.LongType()),
        ],
    )
    t.append(
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30)], "k long, v long"
        ).coalesce(1)
    )
    return t


# -- write-job stats -----------------------------------------------------


def test_write_stats_numeric_schema_no_arrow_writer(spark, tmp_path):
    """All-numeric schemas take the JVM writer: manifest stats come
    from the footer read and match the data exactly."""
    t = _num_table(spark, tmp_path)
    m = t._manifest()
    (f,) = m["files"]
    assert m["file_stats"][f]["k"] == [1, 3]
    assert m["file_stats"][f]["v"] == [10, 30]
    assert m["file_blooms"][f] == {}


def test_write_stats_string_schema_has_blooms(spark, tmp_path):
    """String-bearing schemas take the Arrow task writer: bloom bits
    are computed inside the write job (never a driver column read) and
    string-equality pruning works off them."""
    t = _mk(
        spark,
        tmp_path,
        "s",
        [
            T.StructField("k", T.LongType()),
            T.StructField("s", T.StringType()),
        ],
    )
    t.append(
        spark.createDataFrame([(1, "aa"), (2, "bb")], "k long, s string").coalesce(1)
    )
    t.append(
        spark.createDataFrame([(3, "cc"), (4, "dd")], "k long, s string").coalesce(1)
    )
    m = t._manifest()
    assert all(m["file_blooms"][f].get("s") for f in m["files"])
    assert len(t.candidate_files("s = 'aa'")) == 1
    assert {r["k"] for r in t.read(where="s = 'aa'").collect()} == {1}


def test_write_stats_nan_semantics_match_both_paths(spark, tmp_path):
    """Both writers produce Spark-total-order NaN stats: max is
    NaN-sticky, min is the smallest real."""
    rows = [(1, 1.0, "x"), (2, float("nan"), "y")]
    # arrow path (string col present)
    ta = _mk(
        spark,
        tmp_path,
        "a",
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("s", T.StringType()),
        ],
    )
    ta.append(spark.createDataFrame(rows, "k long, v double, s string").coalesce(1))
    # jvm/footer path (numeric only)
    tj = _mk(
        spark,
        tmp_path,
        "j",
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.DoubleType()),
        ],
    )
    tj.append(
        spark.createDataFrame([r[:2] for r in rows], "k long, v double").coalesce(1)
    )
    for t in (ta, tj):
        (f,) = t._manifest()["files"]
        mn, mx = t._manifest()["file_stats"][f]["v"]
        assert mn == 1.0 and math.isnan(mx)
        # NaN row reachable through an upper-bound prune
        assert {r["k"] for r in t.read(where="v > 100").collect()} == {2}


# -- MergeBuilder: key_bounds validation (r14 advisor) ---------------------


def test_merge_key_bounds_swapped_raises(spark, tmp_path):
    t = _num_table(spark, tmp_path)
    src = spark.createDataFrame([(2, 99)], "k long, v long")
    with pytest.raises(TableError, match="key_bounds"):
        (
            t.merge(src, "target.k = source.k", key_bounds=(5, 1))
            .when_matched_update({"v": "source.v"})
            .execute()
        )


def test_merge_key_bounds_non_numeric_falls_back(spark, tmp_path):
    """Non-numeric key_bounds fall back to computed bounds instead of
    silently mispruning."""
    t = _num_table(spark, tmp_path)
    src = spark.createDataFrame([(2, 99)], "k long, v long")
    (
        t.merge(src, "target.k = source.k", key_bounds=("a", "b"))
        .when_matched_update({"v": "source.v"})
        .execute()
    )
    got = {(r["k"], r["v"]) for r in t.read().collect()}
    assert got == {(1, 10), (2, 99), (3, 30)}


def test_merge_duplicate_source_raises_through_pruned_check(spark, tmp_path):
    """The duplicate-match validation still fires when it reads only
    the candidate files (r14 advisor: no direct test existed)."""
    t = _num_table(spark, tmp_path)
    dup = spark.createDataFrame([(2, 1), (2, 2)], "k long, v long")
    with pytest.raises(TableError, match="more than once"):
        (
            t.merge(dup, "target.k = source.k")
            .when_matched_update({"v": "source.v"})
            .execute()
        )


def test_merge_source_is_unique_skips_check(spark, tmp_path):
    """source_is_unique really skips the validation: the same duplicate
    source goes through (documented caller-proof contract)."""
    t = _num_table(spark, tmp_path)
    dup = spark.createDataFrame([(2, 1), (2, 2)], "k long, v long")
    (
        t.merge(dup, "target.k = source.k", source_is_unique=True)
        .when_matched_update({"v": "source.v"})
        .execute()
    )  # no raise; state is last-clause-evaluation defined, not checked here


def test_merge_key_bounds_equiv_computed(spark, tmp_path):
    """Exact key_bounds produce the same table state as computed
    bounds (r14 advisor test ask)."""
    ta = _num_table(spark, tmp_path, "ka")
    tb = _num_table(spark, tmp_path, "kb")
    for t, kb in ((ta, None), (tb, (2, 2))):
        m = t.merge(
            spark.createDataFrame([(2, 99)], "k long, v long"),
            "target.k = source.k",
            source_is_unique=True,
            key_bounds=kb,
        )
        m.when_matched_update({"v": "source.v"}).when_not_matched_insert().execute()
    assert sorted(map(tuple, ta.read().collect())) == sorted(
        map(tuple, tb.read().collect())
    )


# -- driver-insert MERGE path ----------------------------------------------


def _merge_state(spark, t, src, **kw):
    (
        t.merge(src, "target.k = source.k", source_is_unique=True)
        .when_matched_delete("source.v < 0")
        .when_matched_update({"v": "source.v"}, "source.v >= 0")
        .when_not_matched_insert(condition="source.v >= 0")
        .execute(**kw)
    )
    return sorted(map(tuple, t.read().select("k", "v").collect()))


def test_driver_inserts_equivalent_to_full_join_merge(spark, tmp_path):
    """The broadcast-left + local-insert-file path produces exactly the
    full-outer path's table state (update, delete and insert rows)."""
    rows = [(2, 99), (3, -1), (7, 70), (9, -5)]
    src = spark.createDataFrame(rows, "k long, v long")
    ta = _num_table(spark, tmp_path, "full")
    tb = _num_table(spark, tmp_path, "driver")
    a = _merge_state(spark, ta, src)
    cand = [
        {"k": k, "v": v, "_sparketl_k": k} for k, v in rows if v >= 0
    ]
    b = _merge_state(
        spark, tb, src, driver_inserts=True, insert_candidates=cand
    )
    assert a == b == [(1, 10), (2, 99), (7, 70)]


def test_driver_inserts_evaluates_clause_without_candidates(spark, tmp_path):
    """Without insert_candidates the clause is evaluated with Spark on
    the source — same final state."""
    rows = [(2, 99), (3, -1), (7, 70)]
    src = spark.createDataFrame(rows, "k long, v long")
    t = _num_table(spark, tmp_path)
    got = _merge_state(spark, t, src, driver_inserts=True)
    assert got == [(1, 10), (2, 99), (7, 70)]


def test_capture_matched_returns_pre_image(spark, tmp_path):
    """capture_matched reports every matched row's pre-image — deleted
    rows included (their groups must re-rank in the CDC applier)."""
    t = _num_table(spark, tmp_path)
    src = spark.createDataFrame([(2, 99), (3, -1), (7, 70)], "k long, v long")
    _, captured = (
        t.merge(src, "target.k = source.k", source_is_unique=True)
        .when_matched_delete("source.v < 0")
        .when_matched_update({"v": "source.v"}, "source.v >= 0")
        .when_not_matched_insert(condition="source.v >= 0")
        .execute(capture_matched="target.v", driver_inserts=True)
    )
    # pre-images of matched keys 2 (v=20) and 3 (v=30, deleted)
    assert sorted(captured) == [20, 30]


def test_upsert_insert_only_commits_without_spark_write_job(spark, tmp_path):
    """A small-source upsert into an empty key range writes only the
    driver-side local file — and the rows come back exactly."""
    t = _mk(
        spark,
        tmp_path,
        "ins",
        [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())],
    )
    src = spark.createDataFrame([(5, 50), (6, 60)], "k long, v long")
    t.upsert(src, key="k")
    assert sorted(map(tuple, t.read().collect())) == [(5, 50), (6, 60)]
    # the inserted file carries write-side stats usable for pruning
    assert len(t.candidate_files("k = 5")) == 1


def test_cdc_over_threshold_batch_uses_distributed_path(spark, tmp_path):
    """A batch above CDC_INLIST_MAX never collects the full key set
    (r14 verdict item 5): the distributed path runs and the view still
    matches the declarative top-k."""
    import datetime as dt

    import sparketl.operators.curation as cur
    from sparketl.operators.curation import cdc_rank_apply_batch
    from tests.test_r13_properties import _mk_cdc_tables
    from pyspark.sql import Window

    base, view = _mk_cdc_tables(spark, tmp_path)
    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        (u, 1000 + u * 7 + (1 if (1000 + u * 7) % 9 == 0 else 0), t0, float(u))
        for u in range(1, 41)
    ]
    batch = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    old_max = cur.CDC_INLIST_MAX
    collected = []
    cls = type(batch)  # the concrete (classic) DataFrame class
    orig_limit = cls.limit

    def spy_limit(self, n):
        collected.append(n)
        return orig_limit(self, n)

    cur.CDC_INLIST_MAX = 10  # force the over-threshold branch
    cls.limit = spy_limit
    try:
        cdc_rank_apply_batch(base, view, batch, k=3)
    finally:
        cur.CDC_INLIST_MAX = old_max
        cls.limit = orig_limit
    # the bounded probe used limit(MAX+1) — never an unbounded collect
    assert 11 in collected
    got = {
        (r["user_id"], r["rank"], r["event_id"])
        for r in view.read().collect()
    }
    w = Window.partitionBy("user_id").orderBy(F.desc("value_cents"), "event_id")
    want = {
        (r["user_id"], r["rank"], r["event_id"])
        for r in base.read()
        .withColumn("rank", F.row_number().over(w))
        .filter("rank <= 3")
        .collect()
    }
    assert got == want


def test_cdc_k_out_of_range_raises(spark, tmp_path):
    from sparketl.operators.curation import cdc_rank_apply_batch
    from tests.test_r13_properties import _mk_cdc_tables

    base, view = _mk_cdc_tables(spark, tmp_path)
    batch = spark.createDataFrame(
        [], "user_id long, event_id long, ts timestamp, value double"
    )
    with pytest.raises(ValueError, match="k < 100"):
        cdc_rank_apply_batch(base, view, batch, k=100)


# -- exact hash partition keys ----------------------------------------------


def test_exact_hash_partition_keys_match_spark(spark):
    """The pure-Python Murmur3 pin: for every n used by the staging and
    compact paths, key i lands in partition i under Spark's own hash
    partitioning."""
    from sparketl.io import exact_hash_partition_keys

    for n in (2, 3, 4, 8, 16, 32):
        keys = exact_hash_partition_keys(n)
        rows = (
            spark.createDataFrame(
                [(i, k) for i, k in enumerate(keys)], "i int, k int"
            )
            .select("i", F.pmod(F.hash("k"), F.lit(n)).alias("p"))
            .collect()
        )
        assert all(r["i"] == r["p"] for r in rows), (n, keys)


def test_stage_event_chunks_time_ordered(spark):
    """The sampling-free staging still yields time-ordered contiguous
    chunk files (the property every staged stream relies on)."""
    import os

    import pyarrow.parquet as pq

    from sparketl.streaming.stateful import stage_event_chunks

    stage = stage_event_chunks(spark, "/root/testdata/sf0.01", n_chunks=4)
    try:
        prev_hi = None
        for f in sorted(os.listdir(stage)):
            ts = pq.read_table(
                os.path.join(stage, f), columns=["ts"]
            ).column("ts").to_pylist()
            assert ts == sorted(ts)
            if prev_hi is not None and ts:
                assert prev_hi <= ts[0]
            if ts:
                prev_hi = ts[-1]
    finally:
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
