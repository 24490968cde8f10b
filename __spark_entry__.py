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


# Round-9 rotation: the driver checks the FIRST 50 entries in
# iteration order. Window layout: (a) the 9 round-9 additions and
# re-implementations with no driver verdict on the new code — the
# new tierc_qualify_cte / ext_142 entries, the four rows-only →
# full-oracle upgrades (portable-md5 MinHash family: ext_02/82/117;
# flush-sentinel sessionize: ext_06), and the three r8-verdicted
# entries whose output or code changed this round (ext_132 gained
# the fan-out cap + n_dropped_parts column, ext_139's grid-boundary
# fix, ext_136's 8×8 banding + its r9 byte-exact SQL oracle); (b) judge task 1:
# the 19 round-3-stale entries queued last round; (c) the 22 oldest
# round-4-stale entries in the judge's order. The remaining 20
# round-4 entries (ext_53/54/56/57/58/61-65, ext_01_dedup_documents,
# ext_08, flagship, flt_*, fn_01, join_01/02) queue for round 10.
_FRONT = [
    # (a) new or changed in round 9
    "tierc_qualify_cte",
    "ext_142_incremental_join",
    "ext_02_minhash_lsh",
    "ext_82_lsh_dedup_pipeline",
    "ext_117_incremental_lsh",
    "ext_06_sessionize_stateful",
    "ext_132_clustering",
    "ext_139_resample",
    "ext_136_image_neardup",
    # (b) the queued round-3 cohort (judge-verified 19/19 in r8)
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
    # (c) oldest round-4-stale entries
    "agg_01_group_sum",
    "agg_03_count_avg",
    "agg_04_distinct",
    "agg_04_having",
    "agg_05_cube",
    "agg_05_grouping_sets",
    "agg_05_rollup",
    "agg_05_stats",
    "ext_02_ngram_jaccard",
    "ext_03_cosine_topk",
    "ext_03_embedding_near_dup",
    "ext_04_lang_id",
    "ext_04_quality",
    "ext_04_text_stats",
    "ext_04_token_count_bpe",
    # late r9 upgrades (code changed → need fresh verdicts; they
    # displace the youngest (c)-cohort picks to the r10 queue)
    "ext_02_simhash",
    "ext_99_pca_top_component",
    "ext_03_ann_lsh",
    "ext_03_ann_ivf",
    "ext_143_epoch_shuffle",
    "tierc_tsql_funcs7",
    "ext_144_hll_union",
    # ---- end of the round-9 driver window (50 entries above) ----
    # queued for round 10: the remaining round-4 cohort
    "ext_04_token_counts",
    "ext_25_gapfill",
    "ext_26_merge_intervals",
    "ext_30_top_paths",
    "ext_38_chisq",
    "ext_47_dow_entropy",
    "ext_50_skew_report",
    "ext_53_hopping_window",
    "ext_54_session_window",
    "ext_56_expectations",
    "ext_57_cumulative_users",
    "ext_58_vocab_coverage",
    "ext_61_stream_dedup",
    "ext_62_source_cap",
    "ext_63_curation_funnel",
    "ext_64_dataset_card",
    "ext_65_incremental_dedup",
    "ext_01_dedup_documents",
    "ext_08_stratified_sample",
    "flagship_pricing_summary",
    "flt_01_eq_and",
    "flt_03_not_in",
    "flt_04_param_eq",
    "flt_05_range",
    "fn_01_year_month",
    "join_01_inner",
    "join_02_full",
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
