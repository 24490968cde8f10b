"""Tier B DDL/DML surface (SURVEY §2.9) through Engine.execute."""

import pytest

from sparketl.engine import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, saved_queries_path=str(tmp_path / "q.json"))


def test_create_insert_select_drop(spark, eng, tmp_path):
    eng.execute(
        f"CREATE TABLE ddl_probe (id BIGINT, name STRING) USING parquet "
        f"LOCATION '{tmp_path}/ddl_probe'"
    )
    try:
        # DML-01: INSERT ... VALUES (declared + emitted, tool:248)
        eng.execute("INSERT INTO ddl_probe VALUES (1, 'a'), (2, 'b')")
        out = eng.execute("SELECT * FROM ddl_probe ORDER BY id").collect()
        assert [tuple(r) for r in out] == [(1, "a"), (2, "b")]
        # DDL-01: ALTER
        eng.execute("ALTER TABLE ddl_probe SET TBLPROPERTIES ('k'='v')")
        props = {
            r["key"]: r["value"]
            for r in eng.execute("SHOW TBLPROPERTIES ddl_probe").collect()
        }
        assert props.get("k") == "v"
    finally:
        eng.execute("DROP TABLE IF EXISTS ddl_probe")
    assert "ddl_probe" not in [t.name for t in spark.catalog.listTables()]


def test_use_database(spark, eng):
    # DDL-02: USE [db] (tool:149) via the shim's bracket rewrite
    eng.execute("USE [default]")
    assert spark.catalog.currentDatabase() == "default"


def test_logging_sink(tmp_path):
    # SNK-06 (tool:21-27): append-mode, level+timestamp format
    import logging

    from sparketl.logging_setup import configure_logging

    log_file = str(tmp_path / "err.log")
    logger = configure_logging(log_file)
    logger.error("boom")
    logger.handlers[-1].flush()
    line = open(log_file, encoding="utf-8").read().strip()
    assert " - ERROR - boom" in line
    logger.handlers[-1].close()
    logging.getLogger("sparketl").handlers.clear()
