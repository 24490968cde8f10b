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
