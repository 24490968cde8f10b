import pytest

from sparketl.catalog import Catalog


@pytest.fixture(scope="module")
def cat(spark):
    return Catalog(spark)


def test_databases_lists_default(cat):
    assert "default" in cat.databases()


def test_table_design_via_view(spark, cat):
    spark.createDataFrame([(1, "x")], "id long, name string").createOrReplaceTempView(
        "design_probe"
    )
    design = cat.table_design("design_probe")
    assert design["id"].type == "bigint"
    assert design["name"].type == "string"


def test_pk_roundtrip_on_managed_table(spark, cat, tmp_path):
    spark.sql(
        f"CREATE TABLE pk_probe (id BIGINT, v STRING) USING parquet "
        f"LOCATION '{tmp_path}/pk_probe'"
    )
    try:
        cat.set_primary_key("pk_probe", ["id"])
        assert cat.primary_keys("pk_probe") == ["id"]
        spark.sql("INSERT INTO pk_probe VALUES (1, 'a'), (2, 'b')")
        assert cat.validate_primary_key("pk_probe", ["id"])
        spark.sql("INSERT INTO pk_probe VALUES (1, 'dup')")
        assert not cat.validate_primary_key("pk_probe", ["id"])
        assert "pk_probe" in cat.tables("default")
    finally:
        spark.sql("DROP TABLE IF EXISTS pk_probe")


def test_table_design_surfaces_column_defaults(spark, cat, tmp_path):
    """SRC-04 parity with the reference's get_table_columns
    (COLUMN_DEFAULT at tool:204): a DDL DEFAULT round-trips through
    table_design, applies on INSERT with omitted columns, and columns
    without a default report None."""
    spark.sql(
        f"CREATE TABLE def_probe (id BIGINT, status STRING DEFAULT 'new', "
        f"score DOUBLE DEFAULT 0.0) USING parquet "
        f"LOCATION '{tmp_path}/def_probe'"
    )
    try:
        design = cat.table_design("def_probe")
        assert design["id"].default is None
        assert design["status"].default == "'new'"
        assert design["score"].default == "0.0"
        # the surfaced default is the live one: inserts honor it
        spark.sql("INSERT INTO def_probe (id) VALUES (1)")
        row = spark.table("def_probe").collect()[0]
        assert (row["status"], row["score"]) == ("new", 0.0)
        # a view still resolves (no defaults, but no crash either)
        spark.createDataFrame([(1,)], "x long").createOrReplaceTempView("def_view")
        assert cat.table_design("def_view")["x"].default is None
    finally:
        spark.sql("DROP TABLE IF EXISTS def_probe")
