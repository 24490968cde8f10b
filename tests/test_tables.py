import pytest
from pyspark.sql import types as T

from sparketl.tables import ManagedTable, TableError

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("bal", T.DoubleType(), True),
    ]
)


def _rows(table):
    return sorted(tuple(r) for r in table.read().collect())


def make(spark, root):
    t = ManagedTable(spark, root)
    t.create(SCHEMA, properties={"primary_key": "id"})
    return t


def test_create_read_empty(spark, tmp_table_root):
    t = make(spark, tmp_table_root)
    assert t.read().count() == 0
    assert t.primary_key() == ["id"]


def test_create_twice_fails(spark, tmp_table_root):
    t = make(spark, tmp_table_root)
    with pytest.raises(TableError):
        t.create(SCHEMA)


def test_append_accumulates_and_versions(spark, tmp_table_root):
    t = make(spark, tmp_table_root)
    df1 = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], SCHEMA)
    df2 = spark.createDataFrame([(3, "c", 3.0)], SCHEMA)
    v1 = t.append(df1)
    v2 = t.append(df2)
    assert v2 == v1 + 1
    assert _rows(t) == [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]
    # time travel: previous version still readable
    assert t.read(version=v1).count() == 2
    assert t.history() == [1, v1, v2]


def test_keyed_update_semantics(spark, tmp_table_root):
    """The §3.3 contract: null-id skip, update-only, last-write-wins."""
    t = make(spark, tmp_table_root)
    t.append(spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], SCHEMA))
    src = spark.createDataFrame(
        [
            (1, "a1", 10.0),   # normal update
            (None, "zz", 0.0), # null id -> silently skipped (tool:295-297)
            (9, "no", 9.0),    # no target match -> dropped (update-only)
            (2, "b1", 20.0),   # first write for id=2 ...
            (2, "b2", 21.0),   # ... duplicate: LAST wins (source order)
        ],
        "id long, name string, bal double",
    )
    t.keyed_update(src, "id")
    assert _rows(t) == [(1, "a1", 10.0), (2, "b2", 21.0), (3, "c", 3.0)]


def test_keyed_update_unknown_column(spark, tmp_table_root):
    t = make(spark, tmp_table_root)
    t.append(spark.createDataFrame([(1, "a", 1.0)], SCHEMA))
    src = spark.createDataFrame([(1, "x")], "id long, nope string")
    with pytest.raises(TableError):
        t.keyed_update(src, "id")


def test_keyed_update_partial_columns(spark, tmp_table_root):
    t = make(spark, tmp_table_root)
    t.append(spark.createDataFrame([(1, "a", 1.0)], SCHEMA))
    src = spark.createDataFrame([(1, 99.0)], "id long, bal double")
    t.keyed_update(src, "id", ["bal"])
    assert _rows(t) == [(1, "a", 99.0)]  # name untouched


def test_delete_where(spark, tmp_table_root):
    t = make(spark, tmp_table_root)
    t.append(spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], SCHEMA))
    t.delete_where("bal > 1.5")
    assert _rows(t) == [(1, "a", 1.0)]


def test_overwrite(spark, tmp_table_root):
    t = make(spark, tmp_table_root)
    t.append(spark.createDataFrame([(1, "a", 1.0)], SCHEMA))
    t.overwrite(spark.createDataFrame([(5, "e", 5.0)], SCHEMA))
    assert _rows(t) == [(5, "e", 5.0)]


def test_delete_where_null_predicate_keeps_rows(spark, tmp_table_root):
    # SQL DELETE only removes rows where the predicate is TRUE; a NULL
    # predicate (here: bal IS NULL) must leave the row in place.
    t = make(spark, tmp_table_root)
    t.append(spark.createDataFrame([(1, "a", 1.0), (2, "b", None), (3, "c", 9.0)], SCHEMA))
    t.delete_where("bal > 1.5")
    assert _rows(t) == [(1, "a", 1.0), (2, "b", None)]


def test_keyed_update_explicit_order(spark, tmp_table_root):
    # With an explicit order column, last-write-wins follows it even if
    # the physical row order disagrees (e.g. after a shuffle).
    t = make(spark, tmp_table_root)
    t.append(spark.createDataFrame([(1, "a", 1.0)], SCHEMA))
    src = spark.createDataFrame(
        [(1, "late", 9.0, 2), (1, "early", 5.0, 1)],
        "id long, name string, bal double, seq long",
    )
    t.keyed_update(src, "id", ["name", "bal"], order_by="seq")
    assert _rows(t) == [(1, "late", 9.0)]


def test_keyed_update_order_column_missing(spark, tmp_table_root):
    t = make(spark, tmp_table_root)
    t.append(spark.createDataFrame([(1, "a", 1.0)], SCHEMA))
    src = spark.createDataFrame([(1, "x", 2.0)], SCHEMA)
    with pytest.raises(TableError):
        t.keyed_update(src, "id", order_by="nope")


def test_diff_append_only_inserts(spark, tmp_table_root):
    t = make(spark, tmp_table_root)  # v1: empty
    t.append(spark.createDataFrame([(1, "a", 1.0)], SCHEMA))  # v2
    t.append(spark.createDataFrame([(2, "b", 2.0)], SCHEMA))  # v3
    d = t.diff(2, 3).collect()
    assert [(r["id"], r["_change"]) for r in d] == [(2, "insert")]
    # full-history diff sees both appends
    assert sorted((r["id"], r["_change"]) for r in t.diff(1).collect()) == [
        (1, "insert"),
        (2, "insert"),
    ]


def test_diff_update_is_delete_plus_insert(spark, tmp_table_root):
    t = make(spark, tmp_table_root)
    t.append(spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], SCHEMA))  # v2
    src = spark.createDataFrame([(1, "a2", 9.0)], SCHEMA)
    t.keyed_update(src, "id")  # v3: rewrite
    d = sorted((r["id"], r["name"], r["_change"]) for r in t.diff(2, 3).collect())
    assert d == [(1, "a", "delete"), (1, "a2", "insert")]
