import pytest
from pyspark.sql import types as T

from sparketl.ingest import IngestError, clean_mapping, ingest_append, ingest_update
from sparketl.tables import ManagedTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("qty", T.IntegerType(), True),
    ]
)


@pytest.fixture()
def table(spark, tmp_table_root):
    t = ManagedTable(spark, tmp_table_root)
    t.create(SCHEMA, properties={"primary_key": "id"})
    return t


def test_clean_mapping_drops_sentinels():
    raw = {"A": "id", "B": "Do not import", "C": "name", "D": "Do not map"}
    assert clean_mapping(raw) == {"A": "id", "C": "name"}


def test_ingest_append_maps_and_casts(spark, table):
    src = spark.createDataFrame(
        [("1", "x", "10"), ("2", "y", "20")], "A string, B string, C string"
    )
    ingest_append(table, src, {"A": "id", "B": "name", "C": "qty"})
    rows = sorted(tuple(r) for r in table.read().collect())
    assert rows == [(1, "x", 10), (2, "y", 20)]
    # schema respected (string source casted to target types)
    assert table.read().schema["qty"].dataType == T.IntegerType()


def test_ingest_append_unmapped_target_is_null(spark, table):
    src = spark.createDataFrame([("1", "x")], "A string, B string")
    ingest_append(table, src, {"A": "id", "B": "name"})
    assert table.read().collect()[0]["qty"] is None


def test_all_null_batch_rejected(spark, table):
    src = spark.createDataFrame(
        [(None, None), (None, None)], "A string, B string"
    )
    with pytest.raises(IngestError, match="NULL"):
        ingest_append(table, src, {"A": "id", "B": "name"})


def test_empty_mapping_rejected(spark, table):
    src = spark.createDataFrame([("1",)], "A string")
    with pytest.raises(IngestError, match="mapped"):
        ingest_append(table, src, {"A": "Do not import"})


def test_bad_cast_aborts_batch(spark, table):
    """Abort-on-first-error parity (tool:259-261): nothing commits."""
    src = spark.createDataFrame(
        [("1", "ok", "10"), ("2", "bad", "not_a_number")],
        "A string, B string, C string",
    )
    with pytest.raises(IngestError, match="corrupt"):
        ingest_append(table, src, {"A": "id", "B": "name", "C": "qty"})
    assert table.read().count() == 0  # atomic: no partial batch


def test_blank_strings_normalized_to_null(spark, table):
    src = spark.createDataFrame([("1", "  ", "5")], "A string, B string, C string")
    ingest_append(table, src, {"A": "id", "B": "name", "C": "qty"})
    assert table.read().collect()[0]["name"] is None  # tool:648-649


def test_ingest_update_requires_mapped_identifier(spark, table):
    src = spark.createDataFrame([("1", "x")], "A string, B string")
    with pytest.raises(IngestError, match="identifier"):
        ingest_update(table, src, {"A": "id", "B": "name"}, identifier="qty")


def test_ingest_update_end_to_end(spark, table):
    table.append(spark.createDataFrame([(1, "a", 1), (2, "b", 2)], SCHEMA))
    src = spark.createDataFrame(
        [("1", "a2"), (None, "skip")], "A string, B string"
    )
    ingest_update(table, src, {"A": "id", "B": "name"}, identifier="id")
    rows = sorted(tuple(r) for r in table.read().collect())
    assert rows == [(1, "a2", 1), (2, "b", 2)]


# ---------------------------------------------------------------------------
# CSV / JSONL sources feed the same mapping→normalize→cast→append
# pipeline as Excel (source-agnostic ingest).
# ---------------------------------------------------------------------------


def test_csv_roundtrip_with_inference(spark, tmp_path):
    from sparketl.sources.text_files import read_csv

    p = tmp_path / "in.csv"
    p.write_text("id,name,score\n1,alpha,1.5\n2,beta,2.5\n3,gamma,\n")
    df = read_csv(spark, str(p))
    assert [f.name for f in df.schema.fields] == ["id", "name", "score"]
    rows = {r["id"]: (r["name"], r["score"]) for r in df.collect()}
    assert rows[1] == ("alpha", 1.5) and rows[3][1] is None


def test_jsonl_explicit_schema_and_corrupt_capture(spark, tmp_path):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from sparketl.sources.text_files import CORRUPT_COL, corrupt_records, read_jsonl

    p = tmp_path / "in.jsonl"
    p.write_text('{"id": 1, "name": "a"}\n{"id": 2, "name": "b"}\nnot-json\n')
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField(CORRUPT_COL, StringType()),
        ]
    )
    df = read_jsonl(spark, str(p), schema=schema).cache()
    assert df.count() == 3
    bad = corrupt_records(df).collect()
    assert len(bad) == 1 and bad[0][CORRUPT_COL] == "not-json"


def test_jsonl_failfast_aborts(spark, tmp_path):
    import pytest as _pytest
    from pyspark.sql.types import LongType, StructField, StructType

    from sparketl.sources.text_files import read_jsonl

    p = tmp_path / "bad.jsonl"
    p.write_text('{"id": 1}\nnope\n')
    schema = StructType([StructField("id", LongType())])
    with _pytest.raises(Exception):
        read_jsonl(spark, str(p), schema=schema, fail_fast=True).collect()


def test_csv_ingest_append_pipeline(spark, tmp_path, tmp_table_root):
    """CSV → mapping → normalize → cast → atomic append, end to end."""
    from sparketl.ingest import ingest_append
    from sparketl.sources.text_files import read_csv
    from sparketl.tables import ManagedTable
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    p = tmp_path / "cust.csv"
    p.write_text("cust,name,bal,junk\n10,x,5.5,z\n11,y,6.5,z\n")
    src = read_csv(spark, str(p))
    target = StructType(
        [
            StructField("id", LongType()),
            StructField("customer_name", StringType()),
            StructField("balance", DoubleType()),
        ]
    )
    tbl = ManagedTable(spark, tmp_table_root)
    tbl.create(target)
    ingest_append(
        tbl, src, {"cust": "id", "name": "customer_name", "bal": "balance", "junk": ""}
    )
    got = {r["id"]: r["balance"] for r in tbl.read().collect()}
    assert got == {10: 5.5, 11: 6.5}


def test_write_partitioned_prunes(spark, tmp_path):
    """Partitioned sink → reading one partition scans one directory."""
    from sparketl.io import load_table
    from sparketl.sources.text_files import write_partitioned
    from tests.conftest import SF_SMOKE

    out = str(tmp_path / "lake")
    orders = load_table(spark, SF_SMOKE, "orders")
    write_partitioned(orders, out, ["o_orderstatus"])
    one = spark.read.parquet(out).where("o_orderstatus = 'F'")
    assert one.count() == orders.where("o_orderstatus = 'F'").count()
    # static partition pruning reaches the scan
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan


def test_ingest_append_reports_task_progress(spark, table):
    """SURVEY §7.2: the reference's per-row INSERT progress callbacks
    (tool:257-258, 616-626) map to task-granularity events in Spark.
    The callback must see ≥1 event, counts must be sane/monotonic in
    the done counter, and the final event is marked done with every
    submitted task accounted for."""
    events = []
    src = spark.createDataFrame(
        [(i, f"n{i}", i % 7) for i in range(5000)], "A long, B string, C int"
    ).repartition(8)
    v = ingest_append(
        table,
        src,
        {"A": "id", "B": "name", "C": "qty"},
        progress=events.append,
    )
    assert v >= 1
    assert len(events) >= 1
    final = events[-1]
    assert final.done and final.tasks_total > 0
    assert final.tasks_done == final.tasks_total
    assert 0.0 <= final.fraction <= 1.0
    for e in events:
        assert e.description == "ingest_append"
        assert 0 <= e.tasks_done <= e.tasks_total
    # the table really got the rows — progress is an observer, not a gate
    assert table.read().count() == 5000


def test_ingest_update_reports_progress_and_group_cleanup(spark, table):
    events = []
    ingest_append(
        table,
        spark.createDataFrame([(1, "a", 1), (2, "b", 2)], "A long, B string, C int"),
        {"A": "id", "B": "name", "C": "qty"},
    )
    ingest_update(
        table,
        spark.createDataFrame([(1, "upd")], "A long, B string"),
        {"A": "id", "B": "name"},
        identifier="id",
        progress=events.append,
    )
    assert events and events[-1].done and events[-1].tasks_done > 0
    # tracked job group must not leak onto the caller's thread
    assert spark.sparkContext.getLocalProperty("spark.jobGroup.id") is None
    got = {r["id"]: r["name"] for r in table.read().collect()}
    assert got == {1: "upd", 2: "b"}


def test_observed_append_counts_ride_the_write(spark, table):
    """Observation counters reflect the FULL written batch (not the
    validation limit scan), with exact null-cell totals."""
    from sparketl.ingest import observed_append

    src = spark.createDataFrame(
        [("1", "x", None), ("2", None, None), ("3", "z", "30")],
        "A string, B string, C string",
    )
    v, metrics = observed_append(
        table, src, {"A": "id", "B": "name", "C": "qty"}
    )
    assert v >= 1
    assert metrics["n_rows"] == 3
    # written rows: (1,x,NULL)=1 null, (2,NULL,NULL)=2, (3,z,30)=0
    assert metrics["n_null_cells"] == 3
    assert metrics["max_null_cells_in_row"] == 2
    assert table.read().count() == 3
