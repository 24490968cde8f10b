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


# Round-5 rotation: the driver checks the FIRST 50 entries in iteration
# order. Window layout: (a) the 16 entries whose only driver verdict is
# round 1 — the stalest greens in the repo; (b) the 4 rows-only
# sketch/LSH entries from the round-4 window, re-run for a fresh
# rows-only verdict; (c) 24 of the 49 entries last checked in round 2,
# front-loading the ones whose code changed this round (the ext_15
# packing suite's adaptive prefix-sum bucket, the passage_marked
# refactor under ext_14, the multimodal real decoders) and the
# remaining rows-only sketches; (d) the 10 never-driver-checked
# entries new this round (ext_66-74, ext_mm_audio) — a brand-new
# operator with no driver verdict is strictly staler than a round-2
# green. The deferred round-2 entries (the 12 tierc_* TPC-H-shape
# queries — two judge-spot-checked in round 4 — plus six unchanged
# batch ops and pii_scrub/scd2/canonical_docs/dup_clusters/tfidf/
# collocations/decontaminate) queue first for round 6.
_FRONT = [
    # (a) round-1-only verdicts — stalest
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
    # (b) round-4 rows-only entries — fresh rows-only verdict
    "ext_02_minhash_lsh",
    "ext_02_simhash",
    "ext_03_ann_lsh",
    "ext_55_countmin",
    # (c) round-2 greens, changed-this-round and rows-only first
    "ext_15_pack_positions",
    "ext_15_pack_bins",
    "ext_15_chunk_stats",
    "ext_03_ann_ivf",
    "ext_06_sessionize_stateful",
    "ext_09_approx_quantiles",
    "ext_09_hll_ndv",
    "ext_16_heavy_hitters",
    "ext_mm_decode",
    "ext_mm_frames",
    "ext_mm_resize",
    "ext_03_label_centroids",
    "ext_04_fingerprint",
    "ext_04_gopher_flags",
    "ext_04_length_histogram",
    "ext_04_repetition",
    "ext_05_json_extract",
    "ext_06_sessionize",
    "ext_14_passage_dedup",
    # (d) never driver-checked — new this round
    "ext_66_mixture_weights",
    "ext_67_hash_split",
    "ext_68_tv_drift",
    "ext_mm_audio",
    "ext_69_bpe_merges",
    "ext_70_dedup_pipeline",
    "ext_71_semdedup",
    "ext_72_clean_corpus",
    "ext_73_stream_join",
    "ext_74_bpe_encode",
    "ext_75_substring_dup",
    # ---- end of the round-5 driver window (50 entries above) ----
    # queued for round 6: the deferred round-2 entries
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
    "ext_13_pii_scrub",
    "ext_19_scd2",
    "ext_02_canonical_docs",
    "ext_02_dup_clusters",
    "ext_10_tfidf_topk",
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
