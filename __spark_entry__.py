"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()``
exposes one callable per implemented operator from SURVEY.md §2;
``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for each
(omitted for non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

import inspect
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    from sparketl.operators.relational import q_flagship_pricing_summary

    return q_flagship_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from sparketl.operators import relational

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (relational,):
        for name, fn in inspect.getmembers(mod, inspect.isfunction):
            if name.startswith("q_"):
                out[name[2:]] = fn
    try:
        from sparketl.operators import ext_queries

        out.update(ext_queries.EXT_QUERIES)
    except ImportError:
        pass
    try:
        from sparketl.operators import engine_queries

        out.update(engine_queries.ENGINE_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    from sparketl.oracles import all_oracles

    return {k: v for k, v in all_oracles().items() if k in queries()}
