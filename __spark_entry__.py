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


# Queries the round-1 correctness run never reached (the driver checks a
# window of entries in iteration order), plus anything newly added this
# round. Listed FIRST so every query accumulates at least one driver-side
# verdict across rounds; the remainder follows in stable sorted order.
_FRONT = [
    "tierc_shipping_priority",
    "tierc_local_supplier_volume",
    "tierc_sql_passthrough",
    "tierc_tsql_top",
    "tierc_tsql_funcs",
    "tierc_tsql_concat",
    "tierc_exists_subquery",
    "tierc_scalar_subquery",
    "ext_05_json_extract",
    "ext_05_from_json_struct",
    "ext_06_hourly_window",
    "ext_06_sessionize",
    "ext_06_sessionize_stateful",
    "ext_07_asof_join",
    "ext_07_range_join",
    "ext_02_dup_clusters",
    "ext_02_canonical_docs",
    "ext_03_ann_ivf",
    "ext_03_label_centroids",
    "ext_04_fingerprint",
    "ext_04_length_histogram",
    "ext_09_hll_ndv",
    "ext_10_tfidf_topk",
    "ext_04_gopher_flags",
    "ext_04_repetition",
    "ext_11_rolling_7d",
    "ext_12_decontaminate",
    "ext_13_pii_scrub",
    "ext_mm_decode",
    "ext_mm_frames",
    "ext_mm_resize",
    "ext_14_passage_dedup",
    "ext_15_pack_positions",
    "ext_15_chunk_stats",
    "ext_16_heavy_hitters",
    "ext_17_quantize",
    "ext_18_mix_sources",
    "ext_19_scd2",
    "ext_09_approx_quantiles",
    "ext_08_reservoir_per_group",
    "ext_20_winsorize",
    "tierc_nation_volume",
    "tierc_line_status",
    "tierc_promo_revenue",
    "ext_21_collocations",
    "tierc_tsql_dates",
    "ext_15_pack_bins",
    "ext_22_funnel",
    "ext_23_retention",
    "ext_24_salted_join",
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
    "tierc_tsql_pagination",
    "tierc_min_cost_supplier",
    "tierc_top_revenue_supplier",
    "tierc_waiting_orders",
    "ext_49_rfm",
    "ext_50_skew_report",
    "ext_51_trend",
    "ext_52_prefix_jaccard",
    "ext_53_hopping_window",
    "ext_54_session_window",
    "tierc_lateral_topn",
    "tierc_product_profit",
    "tierc_returned_items",
    "tierc_custdist",
    "tierc_scalar_funcs",
    "ext_55_countmin",
    "ext_56_expectations",
    "tierc_forecast_revenue",
    "tierc_market_share",
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
