"""Oracle type-drift audit (round-1 regression).

The driver compares Spark results to DuckDB oracle results THROUGH
pandas. DuckDB types that pandas cannot hold natively silently change
rendering — the round-1 failure was ``SUM(CASE …)`` → HUGEINT →
float64 → ``"0.0"`` vs Spark bigint ``"0"``. ``fetchall()``-based
verification (tools/verify_oracle.py) cannot see this, so this test
audits every oracle two ways:

1. ``DESCRIBE <oracle sql>``: DuckDB's declared column types must map
   to the same type-kind as the Spark result schema (and HUGEINT is
   never allowed — pandas demotes it to float64 unconditionally).
2. ``.df()`` at sf0.001: no pandas float dtype where Spark declares an
   integer column (catches null-induced int→float demotion on real
   data).
"""

from __future__ import annotations

import re

import duckdb
import pytest

from tests.conftest import SF_SMOKE

from sparketl.io import TABLE_NAMES, table_path


def _duck_kind(t: str) -> str:
    t = t.upper()
    if t == "HUGEINT" or t == "UHUGEINT":
        return "hugeint"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("VARCHAR", "TEXT", "STRING"):
        return "str"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t == "BOOLEAN":
        return "bool"
    if t.endswith("[]") or t.startswith("STRUCT") or t.startswith("MAP"):
        return "nested"
    return t.lower()


def _spark_kind(t: str) -> str:
    if t in ("bigint", "int", "smallint", "tinyint"):
        return "int"
    if t in ("double", "float"):
        return "float"
    if t.startswith("decimal"):
        return "decimal"
    if t == "string":
        return "str"
    if t == "date":
        return "date"
    if t.startswith("timestamp"):
        return "ts"
    if t == "boolean":
        return "bool"
    if re.match(r"^(array|struct|map)<", t):
        return "nested"
    return t


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_SMOKE, t)}')"
        )
    yield con
    con.close()


@pytest.fixture(scope="module")
def oracle_cases(spark):
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    cases = {}
    for name, sql in oracles.items():
        sdf = qs[name](spark, SF_SMOKE)
        cases[name] = (sql, [(f.name, f.dataType.simpleString()) for f in sdf.schema.fields])
    return cases


def test_declared_types_match(duck, oracle_cases):
    """DuckDB DESCRIBE types must kind-match the Spark schema; HUGEINT banned."""
    problems = []
    for name, (sql, sfields) in sorted(oracle_cases.items()):
        desc = duck.execute(f"DESCRIBE {sql}").fetchall()
        dtypes = {r[0]: r[1] for r in desc}
        for col, stype in sfields:
            if col not in dtypes:
                problems.append(f"{name}.{col}: missing from oracle")
                continue
            dk, sk = _duck_kind(dtypes[col]), _spark_kind(stype)
            if dk == "hugeint":
                problems.append(
                    f"{name}.{col}: DuckDB HUGEINT (pandas demotes to float64) — CAST AS BIGINT"
                )
            elif dk != sk:
                problems.append(f"{name}.{col}: duckdb {dtypes[col]} ({dk}) vs spark {stype} ({sk})")
    assert not problems, "\n".join(problems)


def test_pandas_dtypes_no_int_demotion(duck, oracle_cases):
    """Materialized .df() must not turn a Spark-integer column into pandas float."""
    problems = []
    for name, (sql, sfields) in sorted(oracle_cases.items()):
        pdf = duck.execute(sql).df()
        for col, stype in sfields:
            if _spark_kind(stype) == "int" and col in pdf.columns:
                if pdf[col].dtype.kind == "f":
                    problems.append(f"{name}.{col}: spark {stype} but pandas {pdf[col].dtype}")
    assert not problems, "\n".join(problems)
