"""General MERGE: ManagedTable.MergeBuilder + the T-SQL MERGE
statement front-end (dialect.parse_merge → Engine.execute).

T-SQL semantics verified: clause order / first-match-wins, conditional
UPDATE/DELETE, INSERT with and without a column list, WHEN NOT MATCHED
BY SOURCE, the multiple-source-match error, and Delta-style file
pruning for equality-key merges."""

import pytest
from pyspark.sql import types as T

from sparketl.engine import Engine, QueryError
from sparketl.tables import ManagedTable, TableError

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("bal", T.DoubleType(), True),
    ]
)


def make(spark, root, rows=((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0))):
    t = ManagedTable(spark, str(root))
    t.create(SCHEMA)
    t.append(spark.createDataFrame(list(rows), SCHEMA))
    return t


def state(t):
    return sorted(tuple(r) for r in t.read().collect())


def test_merge_upsert_shape(spark, tmp_path):
    t = make(spark, tmp_path / "t")
    src = spark.createDataFrame([(2, "B", 20.0), (9, "i", 9.0)], SCHEMA)
    v = (
        t.merge(src, "target.id = source.id")
        .when_matched_update({"name": "source.name", "bal": "source.bal"})
        .when_not_matched_insert()
        .execute()
    )
    assert v == t.history()[-1]
    assert state(t) == [
        (1, "a", 1.0),
        (2, "B", 20.0),
        (3, "c", 3.0),
        (9, "i", 9.0),
    ]


def test_merge_conditional_clauses_first_match_wins(spark, tmp_path):
    t = make(spark, tmp_path / "t")
    src = spark.createDataFrame(
        [(1, "x", 100.0), (2, "y", -5.0), (3, "z", 0.5)], SCHEMA
    )
    # clause order: delete negative-bal matches first, then a guarded
    # update; id=3 matches neither condition and must pass through
    (
        t.merge(src, "target.id = source.id")
        .when_matched_delete("source.bal < 0")
        .when_matched_update({"bal": "source.bal"}, "source.bal >= 1.0")
        .execute()
    )
    assert state(t) == [(1, "a", 100.0), (3, "c", 3.0)]


def test_merge_update_expressions_combine_both_sides(spark, tmp_path):
    t = make(spark, tmp_path / "t")
    src = spark.createDataFrame([(1, "whatever", 10.0)], SCHEMA)
    (
        t.merge(src, "target.id = source.id")
        .when_matched_update({"bal": "target.bal + source.bal"})
        .execute()
    )
    assert state(t)[0] == (1, "a", 11.0)


def test_merge_not_matched_by_source(spark, tmp_path):
    """T-SQL full-sync: rows absent from the source are deleted, rows
    present are updated, new rows insert — one statement."""
    t = make(spark, tmp_path / "t")
    src = spark.createDataFrame([(2, "B", 20.0), (4, "d", 4.0)], SCHEMA)
    (
        t.merge(src, "target.id = source.id")
        .when_matched_update({"name": "source.name", "bal": "source.bal"})
        .when_not_matched_insert()
        .when_not_matched_by_source_delete()
        .execute()
    )
    assert state(t) == [(2, "B", 20.0), (4, "d", 4.0)]


def test_merge_by_source_update_condition(spark, tmp_path):
    t = make(spark, tmp_path / "t")
    src = spark.createDataFrame([(1, "a", 1.0)], SCHEMA)
    (
        t.merge(src, "target.id = source.id")
        .when_not_matched_by_source_update(
            {"name": "'stale'"}, "target.id > 2"
        )
        .execute()
    )
    assert state(t) == [(1, "a", 1.0), (2, "b", 2.0), (3, "stale", 3.0)]


def test_merge_duplicate_source_matches_raise(spark, tmp_path):
    t = make(spark, tmp_path / "t")
    src = spark.createDataFrame([(2, "y1", 1.0), (2, "y2", 2.0)], SCHEMA)
    with pytest.raises(TableError, match="more than once"):
        (
            t.merge(src, "target.id = source.id")
            .when_matched_update({"name": "source.name"})
            .execute()
        )
    # insert-only merges tolerate duplicate matches (nothing fires twice
    # on one target row); both duplicates are matched so neither inserts
    v = (
        t.merge(src, "target.id = source.id")
        .when_not_matched_insert()
        .execute()
    )
    assert v and state(t) == [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]


def test_merge_requires_a_clause_and_known_columns(spark, tmp_path):
    t = make(spark, tmp_path / "t")
    src = spark.createDataFrame([(1, "a", 1.0)], SCHEMA)
    with pytest.raises(TableError, match="WHEN clause"):
        t.merge(src, "target.id = source.id").execute()
    with pytest.raises(TableError, match="unknown columns"):
        (
            t.merge(src, "target.id = source.id")
            .when_matched_update({"nope": "1"})
            .execute()
        )


def test_merge_file_pruning_equality_key(spark, tmp_path):
    """Equality-key merges rewrite only the files whose footer range
    intersects the source keys; BY SOURCE clauses force a full
    rewrite (they act on rows in non-candidate files)."""
    t = ManagedTable(spark, str(tmp_path / "t"))
    t.create(T.StructType.fromDDL("id long, v double"))
    for lo in range(0, 100, 25):
        t.append(
            spark.createDataFrame(
                [(i, float(i)) for i in range(lo, lo + 25)], "id long, v double"
            ).coalesce(1)
        )
    before = set(t.candidate_files(None))
    src = spark.createDataFrame([(80, -1.0), (90, -2.0)], "id long, v double")
    (
        t.merge(src, "target.id = source.id")
        .when_matched_update({"v": "source.v"})
        .execute()
    )
    after = set(t.candidate_files(None))
    # three of the four files are carried over untouched
    assert len(before & after) == 3
    got = dict((r["id"], r["v"]) for r in t.read().collect())
    assert got[80] == -1.0 and got[90] == -2.0 and got[10] == 10.0


def test_merge_sql_statement_tsql_spellings(spark, tmp_path):
    """The full T-SQL statement through Engine.execute: aliases,
    bracket identifiers, a conditional DELETE, an INSERT column list,
    and a T-SQL function (ISNULL) inside an assignment."""
    eng = Engine(spark, saved_queries_path=str(tmp_path / "q.json"))
    t = make(spark, tmp_path / "t")
    eng.register_managed("accounts", t)
    src = spark.createDataFrame(
        [(2, None, 20.0), (3, "zap", -1.0), (7, "g", 7.0)], SCHEMA
    )
    src.createOrReplaceTempView("changes")
    out = eng.execute(
        """
        MERGE INTO accounts AS tgt
        USING changes AS s
        ON tgt.[id] = s.[id]
        WHEN MATCHED AND s.bal < 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET name = ISNULL(s.name, tgt.name),
                                     [bal] = s.bal
        WHEN NOT MATCHED THEN INSERT (id, name, bal)
            VALUES (s.id, s.name, s.bal * 2)
        """
    )
    assert out.collect()[0]["version"] == t.history()[-1]
    assert state(t) == [(1, "a", 1.0), (2, "b", 20.0), (7, "g", 14.0)]


def test_merge_sql_subquery_source_and_insert_star(spark, tmp_path):
    eng = Engine(spark, saved_queries_path=str(tmp_path / "q.json"))
    t = make(spark, tmp_path / "t")
    eng.register_managed("accounts", t)
    spark.createDataFrame(
        [(5, "e", 5.0), (6, "f", 6.0)], SCHEMA
    ).createOrReplaceTempView("raw_changes")
    eng.execute(
        """
        MERGE accounts t
        USING (SELECT TOP 1 * FROM raw_changes ORDER BY id) s
        ON t.id = s.id
        WHEN NOT MATCHED THEN INSERT *
        """
    )
    assert state(t)[-1] == (5, "e", 5.0)


def test_merge_sql_positional_values_and_errors(spark, tmp_path):
    eng = Engine(spark, saved_queries_path=str(tmp_path / "q.json"))
    t = make(spark, tmp_path / "t")
    eng.register_managed("accounts", t)
    spark.createDataFrame([(8, "h", 8.0)], SCHEMA).createOrReplaceTempView(
        "chg"
    )
    eng.execute(
        "MERGE INTO accounts USING chg ON accounts.id = chg.id "
        "WHEN NOT MATCHED THEN INSERT VALUES (chg.id, chg.name, chg.bal)"
    )
    assert state(t)[-1] == (8, "h", 8.0)
    with pytest.raises(QueryError, match="registered managed table"):
        eng.execute(
            "MERGE INTO nope USING chg ON nope.id = chg.id "
            "WHEN NOT MATCHED THEN INSERT *"
        )
    # a parameterized MERGE must refuse loudly, not silently drop the
    # bound params (ADVICE r8: the MERGE path bypasses spark.sql args)
    with pytest.raises(QueryError, match="bound parameters"):
        eng.execute(
            "MERGE INTO accounts USING chg ON accounts.id = chg.id "
            "WHEN MATCHED AND accounts.bal > ? THEN DELETE",
            params=[100.0],
        )


def test_merge_parse_errors(spark):
    from sparketl.dialect import DialectError, parse_merge

    assert parse_merge("SELECT 1") is None
    with pytest.raises(DialectError, match="only INSERT"):
        parse_merge(
            "MERGE INTO t USING s ON t.id = s.id "
            "WHEN NOT MATCHED THEN DELETE"
        )
    with pytest.raises(DialectError, match="WHEN clause"):
        parse_merge("MERGE INTO t USING s ON t.id = s.id")
    with pytest.raises(DialectError, match="lengths differ"):
        parse_merge(
            "MERGE INTO t USING s ON t.id = s.id "
            "WHEN NOT MATCHED THEN INSERT (a, b) VALUES (1)"
        )
