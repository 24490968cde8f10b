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


# Round-4 rotation: the driver checks the FIRST 50 entries in iteration
# order. Window layout: (a) queries with NO driver verdict in any round
# (round-2/3 late adds + this round's new operators), (b) queries that
# ran red in round 3 (the TIMESTAMP_NTZ loader bug, since fixed), (c)
# queries whose semantics changed this round (RFM percentile scoring,
# skew-report broadcast totals), (d) stalest previously-green entries —
# last checked in round 1. The 12 remaining round-1-only entries queue
# for the round-5 window.
_FRONT = [
    # (a) never driver-checked
    "ext_53_hopping_window",
    "ext_54_session_window",
    "ext_55_countmin",
    "ext_56_expectations",
    "ext_57_cumulative_users",
    "ext_58_vocab_coverage",
    "ext_59_quality_buckets",
    "ext_60_embedding_outliers",
    "ext_61_stream_dedup",
    "ext_62_source_cap",
    "ext_63_curation_funnel",
    "ext_64_dataset_card",
    "ext_65_incremental_dedup",
    # (b) red in round 3 (NTZ loader bug), fixed — need a green row
    "ext_25_gapfill",
    "ext_26_merge_intervals",
    "ext_30_top_paths",
    "ext_38_chisq",
    "ext_47_dow_entropy",
    # (c) semantics changed this round — need a fresh verdict
    "ext_49_rfm",
    "ext_50_skew_report",
    # (d) stalest green (round-1 verdict only)
    "flagship_pricing_summary",
    "agg_01_group_sum",
    "agg_03_count_avg",
    "agg_04_distinct",
    "agg_04_having",
    "agg_05_cube",
    "agg_05_grouping_sets",
    "agg_05_rollup",
    "agg_05_stats",
    "agg_07_quantiles",
    "ext_01_dedup_documents",
    "ext_02_minhash_lsh",
    "ext_02_ngram_jaccard",
    "ext_02_simhash",
    "ext_03_ann_lsh",
    "ext_03_cosine_topk",
    "ext_03_embedding_near_dup",
    "ext_04_lang_id",
    "ext_04_quality",
    "ext_04_text_stats",
    "ext_04_token_count_bpe",
    "ext_04_token_counts",
    "ext_08_stratified_sample",
    "flt_01_eq_and",
    "flt_03_not_in",
    "flt_04_param_eq",
    "flt_05_range",
    "fn_01_year_month",
    "join_01_inner",
    "join_02_full",
    # ---- end of the round-4 driver window (50 entries above) ----
    # queued for round 5: the remaining round-1-only entries
    "join_02_left",
    "join_03_star",
    "join_semi_anti",
    "lim_01_preview",
    "lim_02_topk",
    "prj_01_projection",
    "prj_02_mapping_rename",
    "prj_03_null_normalize",
    "prj_04_stringify",
    "set_intersect_except",
    "set_union",
    "srt_01_order_by",
    "srt_02_limit_offset",
    "subquery_above_avg",
    "window_rank",
    "window_running_sum",
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
