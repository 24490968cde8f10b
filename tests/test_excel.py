"""SRC-01 end-to-end: the Excel parse path actually executes.

openpyxl is absent in this image, so these tests exercise the built-in
minimal .xlsx reader on a hand-rolled workbook (xlsx is just zipped
XML) — covering sheet enumeration, typed cells (shared strings, inline
strings, numbers, booleans, blanks), the parallel binaryFile +
mapInPandas path, and the source-agnostic mapping/cast pipeline on top
(tool:555-577 parity).
"""

import zipfile

import pytest

from sparketl.sources.excel import list_sheets, read_excel, read_excel_many

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <sheets>
  <sheet name="People" sheetId="1" r:id="rId1"/>
  <sheet name="Empty" sheetId="2" r:id="rId2"/>
 </sheets>
</workbook>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
 <Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""

_SHARED = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
 <si><t>id</t></si><si><t>name</t></si><si><t>bal</t></si><si><t>alice</t></si>
</sst>"""

# header row from shared strings; data rows mix shared strings, an
# inline string, ints, floats, a boolean, and a missing (sparse) cell
_SHEET1 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1">
   <c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c>
  </row>
  <row r="2">
   <c r="A2"><v>1</v></c><c r="B2" t="s"><v>3</v></c><c r="C2"><v>10.5</v></c>
  </row>
  <row r="3">
   <c r="A3"><v>2</v></c><c r="B3" t="inlineStr"><is><t>bob</t></is></c><c r="C3"><v>20</v></c>
  </row>
  <row r="4">
   <c r="A4"><v>3</v></c><c r="C4"><v>30</v></c>
  </row>
 </sheetData>
</worksheet>"""

_SHEET2 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData/>
</worksheet>"""


def _write_xlsx(path):
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.xml", _WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", _RELS)
        zf.writestr("xl/sharedStrings.xml", _SHARED)
        zf.writestr("xl/worksheets/sheet1.xml", _SHEET1)
        zf.writestr("xl/worksheets/sheet2.xml", _SHEET2)
    return str(path)


@pytest.fixture()
def xlsx(tmp_path):
    return _write_xlsx(tmp_path / "book.xlsx")


def test_list_sheets(xlsx):
    assert list_sheets(xlsx) == ["People", "Empty"]


def test_read_excel_typed_cells(spark, xlsx):
    df = read_excel(spark, xlsx, sheet="People")
    assert df.columns == ["id", "name", "bal"]
    rows = {r["id"]: (r["name"], r["bal"]) for r in df.collect()}
    assert rows[1] == ("alice", 10.5)
    assert rows[2] == ("bob", 20.0)
    assert rows[3] == (None, 30.0)  # sparse cell → null


def test_read_excel_by_index(spark, xlsx):
    assert read_excel(spark, xlsx, sheet=0).count() == 3


def test_read_excel_many_parallel(spark, tmp_path):
    for i in range(3):
        _write_xlsx(tmp_path / f"book{i}.xlsx")
    df = read_excel_many(spark, str(tmp_path / "*.xlsx"), sheet="People")
    assert df.columns[0] == "_source_file"
    assert df.count() == 9
    assert df.select("_source_file").distinct().count() == 3


def test_excel_into_mapping_pipeline(spark, xlsx):
    # the reference's ingest flow: parse sheet → column mapping/rename →
    # cast to target types (tool:555-577 then the SNK-01 path)
    from pyspark.sql import functions as F

    df = read_excel(spark, xlsx, sheet="People")
    mapped = df.select(
        F.col("id").cast("long").alias("person_id"),
        F.col("name").cast("string").alias("person_name"),
        F.col("bal").cast("decimal(12,2)").alias("balance"),
    )
    assert [f.simpleString() for f in mapped.schema.fields] == [
        "person_id:bigint",
        "person_name:string",
        "balance:decimal(12,2)",
    ]
    assert mapped.count() == 3


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC write → read roundtrip; filters and pruning reach the ORC
    scan like parquet."""
    from sparketl.io import load_table
    from sparketl.sources.text_files import read_orc, write_orc
    from tests.conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path, partition_by=["o_orderpriority"])
    back = read_orc(spark, path)
    assert back.count() == orders.count()
    sub = back.where("o_orderpriority = '1-URGENT'").select("o_orderkey")
    want = orders.where("o_orderpriority = '1-URGENT'").count()
    assert sub.count() == want
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "o_orderpriority" in plan

def test_jsonl_datasource_roundtrip_nulls_and_inference(spark, tmp_path):
    """Custom Python DataSource: full-row fidelity, missing-key and
    JSON-null handling, multi-file partitioning, and schema
    inference from the first record."""
    import json

    from sparketl.sources.pyds import register

    f1 = tmp_path / "a.jsonl"
    f2 = tmp_path / "b.jsonl"
    f1.write_text(
        "\n".join(
            [
                json.dumps({"id": 1, "name": "x", "score": 1.5, "ok": True}),
                "",
                json.dumps({"id": 2, "name": None, "score": 2.0, "ok": False}),
            ]
        )
    )
    f2.write_text(json.dumps({"id": 3, "score": 0.25}))  # name/ok missing

    register(spark)
    df = (
        spark.read.format("sparketl_jsonl")
        .schema("id bigint, name string, score double, ok boolean")
        .option("path", str(tmp_path))
        .load()
    )
    assert df.rdd.getNumPartitions() == 2  # one per file
    rows = sorted((r.id, r.name, r.score, r.ok) for r in df.collect())
    assert rows == [
        (1, "x", 1.5, True),
        (2, None, 2.0, False),
        (3, None, 0.25, None),
    ]

    # schema inference from the first record of the first file
    inferred = (
        spark.read.format("sparketl_jsonl").option("path", str(tmp_path)).load()
    )
    assert [f.name for f in inferred.schema.fields] == [
        "id",
        "name",
        "score",
        "ok",
    ]
    assert dict(inferred.dtypes) == {
        "id": "bigint",
        "name": "string",
        "score": "double",
        "ok": "boolean",
    }


def test_jsonl_datasource_stream_equals_batch(spark, tmp_path):
    """Custom-connector streaming read ≡ its batch read: one file per
    micro-batch, all files drained, same rows."""
    import json

    from sparketl.sources.pyds import register

    for i in range(3):
        (tmp_path / f"c{i}.jsonl").write_text(
            "\n".join(
                json.dumps({"id": i * 4 + j, "v": float(j)}) for j in range(4)
            )
        )
    register(spark)
    schema = "id bigint, v double"
    batch = (
        spark.read.format("sparketl_jsonl")
        .schema(schema)
        .option("path", str(tmp_path))
        .load()
    )
    stream = (
        spark.readStream.format("sparketl_jsonl")
        .schema(schema)
        .option("path", str(tmp_path))
        .load()
    )
    import uuid

    name = f"jls_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect())
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want and len(got) == 12


def test_jsonl_datasource_writer_roundtrip_and_overwrite(spark, tmp_path):
    """Custom-connector writer: two-phase commit leaves only committed
    part files (no .tmp debris), round trip preserves rows, and
    overwrite mode replaces prior visible files."""
    import os

    from sparketl.sources.pyds import register

    register(spark)
    out = str(tmp_path / "out")
    schema = "id bigint, name string, score double"
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.0), (3, "c", 0.25)], schema
    ).repartition(2)
    df.write.format("sparketl_jsonl").option("path", out).mode(
        "append"
    ).save()
    files = sorted(os.listdir(out))
    assert all(f.endswith(".jsonl") for f in files), files
    assert not any(f.endswith(".tmp") for f in files)
    back = (
        spark.read.format("sparketl_jsonl")
        .schema(schema)
        .option("path", out)
        .load()
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))

    # overwrite replaces the visible set
    df2 = spark.createDataFrame([(9, "z", 9.0)], schema)
    df2.write.format("sparketl_jsonl").option("path", out).mode(
        "overwrite"
    ).save()
    back2 = (
        spark.read.format("sparketl_jsonl")
        .schema(schema)
        .option("path", out)
        .load()
    )
    assert [tuple(r) for r in back2.collect()] == [(9, "z", 9.0)]
