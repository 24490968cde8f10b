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


# Round-10 rotation: the driver checks the FIRST 50 entries in
# iteration order. Window layout: (a) the 15 entries that are new or
# whose code changed in round 10 and need fresh driver verdicts — the
# four new entries (exact heavy-hitters twin, QUALIFY-in-derived-
# table, stream-stream FULL OUTER interval join, incremental NDV),
# representatives of the shared radix-descent broadcast change
# (ext_85/86/49/96 — the remaining radix callers were verified at
# sf0.01 this round and several more sit in cohort (b) anyway), the
# three queries whose oracles regenerated from Python defaults
# (ann_lsh — also the 120-bit guard + seed removal — ann_ivf, pca),
# and the MinHash family whose shingle pin moved cache →
# localCheckpoint (ext_02/82/117, ext_12); (b) judge task 1: all 27
# round-4-stale entries (judge-verified 27/27 green in r9); (c) the 8
# oldest round-5-stale entries. The remaining 15 round-5 entries
# (prj_04, set_*, srt_*, subquery_above_avg, window_*, ext_15_*,
# ext_mm_*) queue for round 11.
_FRONT = [
    # (a) new or changed in round 10
    "ext_16_heavy_hitters",
    "tierc_qualify_subquery",
    "ext_145_stream_full_join",
    "ext_146_incremental_ndv",
    "ext_85_decile_binning",
    "ext_86_mad_outliers",
    "ext_49_rfm",
    "ext_96_weighted_median",
    "ext_03_ann_lsh",
    "ext_03_ann_ivf",
    "ext_99_pca_top_component",
    "ext_02_minhash_lsh",
    "ext_82_lsh_dedup_pipeline",
    "ext_117_incremental_lsh",
    "ext_12_decontaminate",
    # (b) judge task 1: the full round-4-stale cohort (27)
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
    # (c) oldest round-5-stale entries
    "join_02_left",
    "join_03_star",
    "join_semi_anti",
    "lim_01_preview",
    "lim_02_topk",
    "prj_01_projection",
    "prj_02_mapping_rename",
    "prj_03_null_normalize",
    # ---- end of the round-10 driver window (50 entries above) ----
    # queued for round 11: the remaining round-5 cohort
    "prj_04_stringify",
    "set_intersect_except",
    "set_union",
    "srt_01_order_by",
    "srt_02_limit_offset",
    "subquery_above_avg",
    "window_rank",
    "window_running_sum",
    "ext_15_pack_positions",
    "ext_15_pack_bins",
    "ext_15_chunk_stats",
    "ext_mm_decode",
    "ext_mm_frames",
    "ext_mm_resize",
    "ext_mm_audio",
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
