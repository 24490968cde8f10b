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


# Round-8 rotation: the driver checks the FIRST 50 entries in
# iteration order. Window layout: (a) the 12 round-8 additions and
# re-implementations, none of which has a driver verdict on the new
# code — the portable-md5 sketch upgrades (ext_09_hll_ndv,
# ext_55_countmin: rows-only → full oracle), the QUALIFY/APPLY
# planner shapes, T-SQL funcs6, and the stats/graph/ML batch
# (Welch, autocorrelation, triangles, k-means, flush-sessionize,
# interval RANGE window); (b) the 29 stalest driver greens — the
# full round-3 cohort plus the oldest round-4 entries, oldest first
# (the radix-family members here were re-verified green at sf0.1 in
# round 7 but their last DRIVER verdict predates the r7 machinery
# change). The remaining 15 round-4 tierc entries queue for round 9.
_FRONT = [
    # (a) new or re-implemented in round 8
    "ext_09_hll_ndv",
    "ext_55_countmin",
    "tierc_qualify",
    "tierc_cross_apply",
    "tierc_outer_apply",
    "tierc_tsql_funcs6",
    "ext_130_welch_ttest",
    "ext_131_autocorr",
    "ext_132_clustering",
    "ext_133_kmeans",
    "ext_134_stream_sessions",
    "ext_135_trailing_window",
    "ext_136_image_neardup",
    "tierc_groupby_all",
    "tierc_unpivot_sql",
    "ext_137_auc",
    "ext_138_stream_enrich",
    "ext_139_resample",
    "tierc_asof_sql",
    "ext_140_retention",
    "ext_141_funnel",
    # (b) stalest driver verdicts, oldest first
    "ext_09_approx_quantiles",
    "ext_20_winsorize",
    "ext_44_exact_percentiles",
    "ext_59_quality_buckets",
    "ext_60_embedding_outliers",
    "ext_85_decile_binning",
    "ext_95_interevent_gaps",
    "agg_02_value_counts",
    "agg_06_pivot",
    "ext_01_exact_dedup",
    "ext_17_quantize",
    "ext_27_transitions",
    "ext_28_cdf",
    "ext_29_fuzzy_join",
    "ext_32_unpivot",
    "ext_33_props_numbers",
    "ext_34_trigram_lm",
    "ext_35_chunk_overlap",
    "ext_36_bag_dedup",
    "ext_37_containment",
    "ext_39_bloom_join",
    "ext_40_hash_sample",
    "ext_41_pagerank",
    "ext_42_window_suite",
    "ext_43_moment_stats",
    "ext_52_prefix_jaccard",
    "prof_01_table_profile",
    "tierc_acct_screening",
    "tierc_custdist",
    # ---- end of the round-8 driver window (50 entries above) ----
    # queued for round 9: the remaining round-4 cohort
    "ext_45_histogram",
    "ext_46_orphan_audit",
    "ext_48_lm_score",
    "ext_51_trend",
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
