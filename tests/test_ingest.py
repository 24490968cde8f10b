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
