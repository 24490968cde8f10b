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


# Round-3 rotation: the driver checks the FIRST 50 entries in iteration
# order. Positions 1-5 are re-checks of queries that last ran red at the
# driver (since fixed; all green locally); positions 6-50 are queries
# that have never received a driver verdict in rounds 1-2. Everything
# after slot 50 is queued for the round-4 window; previously-green
# entries keep a stable order at the back.
_FRONT = [
    # red-in-r1/r2, fixed — need a green driver row
    "ext_17_quantize",
    "agg_02_value_counts",
    "agg_06_pivot",
    "ext_01_exact_dedup",
    "prof_01_table_profile",
    # never driver-checked (rounds 1-2)
    "ext_25_gapfill",
    "ext_26_merge_intervals",
    "ext_27_transitions",
    "ext_28_cdf",
    "ext_29_fuzzy_join",
    "ext_30_top_paths",
    "ext_31_outliers",
    "ext_32_unpivot",
    "ext_33_props_numbers",
    "ext_34_trigram_lm",
    "ext_35_chunk_overlap",
    "ext_36_bag_dedup",
    "ext_37_containment",
    "ext_38_chisq",
    "ext_39_bloom_join",
    "ext_40_hash_sample",
    "ext_41_pagerank",
    "ext_42_window_suite",
    "ext_43_moment_stats",
    "ext_44_exact_percentiles",
    "ext_45_histogram",
    "ext_46_orphan_audit",
    "ext_47_dow_entropy",
    "ext_48_lm_score",
    "ext_49_rfm",
    "ext_50_skew_report",
    "ext_51_trend",
    "ext_52_prefix_jaccard",
    "tierc_acct_screening",
    "tierc_custdist",
    "tierc_disjunctive_revenue",
    "tierc_forecast_revenue",
    "tierc_lateral_topn",
    "tierc_market_share",
    "tierc_min_cost_supplier",
    "tierc_priority_semijoin",
    "tierc_product_profit",
    "tierc_returned_items",
    "tierc_scalar_funcs",
    "tierc_small_qty_revenue",
    "tierc_supplier_cnt",
    "tierc_top_revenue_supplier",
    "tierc_tsql_pagination",
    "tierc_volume_customers",
    "tierc_waiting_orders",
    # ---- end of the round-3 driver window (50 entries above) ----
    # queued for round 4: round-2 late adds + anything new this round
    "ext_53_hopping_window",
    "ext_54_session_window",
    "ext_55_countmin",
    "ext_56_expectations",
    "ext_57_cumulative_users",
]


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
    front = [n for n in _FRONT if n in out]
    rest = sorted(n for n in out if n not in _FRONT)
    return {n: out[n] for n in [*front, *rest]}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    from sparketl.oracles import all_oracles

    return {k: v for k, v in all_oracles().items() if k in queries()}
