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


# Round-6 rotation (VERDICT r5 task 1): the driver checks the FIRST 50
# entries in iteration order. Window layout: (a) the 21 round-5
# additions that have never had a driver verdict (ext_76–ext_95,
# tierc_tsql_funcs2 — judge-checked 21/21 in r5, driver must confirm);
# (b) ext_44_exact_percentiles, whose implementation changes this round
# (mergeable exact quantiles, VERDICT task 2) alongside ext_85/86/95
# already in (a); (c) the 12 tierc_* TPC-H-shape queries whose only
# driver verdict is round 2 — the stalest greens left; (d) 16 of the
# remaining round-2-only entries. After this window, no entry's latest
# driver verdict is older than round 4 except ext_12_decontaminate and
# ext_21_collocations (round-2 green, judge-rechecked r5 for pii_scrub's
# sibling path; queued first for round 7).
_FRONT = [
    # (a) never driver-checked — added in round 5
    "ext_76_stream_hourly",
    "ext_77_shard_plan",
    "ext_78_interleave",
    "ext_79_snapshot_diff",
    "ext_80_triplet_mining",
    "ext_81_knn_eval",
    "ext_82_lsh_dedup_pipeline",
    "ext_83_skyline",
    "ext_84_copurchase",
    "ext_85_decile_binning",
    "ext_86_mad_outliers",
    "ext_87_incremental_view",
    "ext_88_udtf_chunks",
    "ext_89_grouped_corr",
    "ext_90_triangles",
    "ext_91_rrf_fusion",
    "ext_92_rolling_wau",
    "ext_93_ngram_novelty",
    "ext_94_cross_source_leak",
    "ext_95_interevent_gaps",
    "tierc_tsql_funcs2",
    # (b) changed this round — mergeable exact quantile rewrite
    "ext_44_exact_percentiles",
    # (c) round-2-only tierc greens — stalest remaining
    "tierc_exists_subquery",
    "tierc_line_status",
    "tierc_local_supplier_volume",
    "tierc_nation_volume",
    "tierc_promo_revenue",
    "tierc_scalar_subquery",
    "tierc_shipping_priority",
    "tierc_sql_passthrough",
    "tierc_tsql_concat",
    "tierc_tsql_dates",
    "tierc_tsql_funcs",
    "tierc_tsql_top",
    # (d) remaining round-2-only entries
    "ext_06_hourly_window",
    "ext_05_from_json_struct",
    "ext_07_asof_join",
    "ext_07_range_join",
    "ext_08_reservoir_per_group",
    "ext_11_rolling_7d",
    "ext_18_mix_sources",
    "ext_20_winsorize",
    "ext_22_funnel",
    "ext_23_retention",
    "ext_24_salted_join",
    "ext_13_pii_scrub",
    "ext_19_scd2",
    "ext_02_canonical_docs",
    "ext_02_dup_clusters",
    "ext_10_tfidf_topk",
    # ---- end of the round-6 driver window (50 entries above) ----
    # queued for round 7: the six round-6 additions (never
    # driver-checked — builder + judge-recipe verified only) first,
    # then the two remaining round-2 entries
    "ext_96_weighted_median",
    "ext_97_spearman",
    "ext_98_embedding_covariance",
    "ext_99_pca_top_component",
    "ext_100_ttl_dedup",
    "ext_101_stream_ttl_dedup",
    "tierc_tsql_funcs3",
    "ext_12_decontaminate",
    "ext_21_collocations",
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
