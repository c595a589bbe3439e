"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``atd_dockless_processing_spark``; every
operator from SURVEY.md §2 registers a (query, oracle) pair there.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from atd_dockless_processing_spark import ORACLES, QUERIES  # noqa: E402
from atd_dockless_processing_spark.session import tune  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3-shape top-k, SURVEY §7 M0) on sf0.001."""
    tune(spark)
    return QUERIES["srt_topk_global"](spark, "/root/testdata/sf0.001")


# The driver sweeps queries() in dict order under a per-round time
# budget (round 1 covered the first 50 keys before cutoff). Keys are
# therefore ordered CHEAPEST-FIRST by measured warm latency at sf0.01
# (scripts/profile_keys.py, 2026-08-13) so a fixed budget verifies the
# maximum number of keys per round. Keys missing from the list (added
# after the last profile run) sort last, preserving completeness.
_KEY_ORDER = [
    "prj_select_rename", "win_running_sum", "win_moving_avg", "win_rank_dense",
    "prj_derived_expr", "win_lag_lead", "src_parquet_scan", "win_first_last",
    "win_ntile_pct", "win_percent_rank", "win_ratio_to_report", "prj_case_when",
    "win_range_frame", "win_cume_dist", "fn_regexp_extract", "txt_pii_mask",
    "fn_split_tokens", "llm_token_stats", "srt_multi_nulls", "fn_date_arith",
    "fn_date_interval", "fn_epoch_ts", "prj_unpivot", "snk_scd2",
    "srt_limit_offset", "udtf_posexplode", "fn_string_core", "txt_chunk_docs",
    "sql_tpch_q6", "txt_fingerprint", "txt_token_bpe", "fn_array_ops",
    "fn_math_core", "fn_cast_coercion", "fn_surrogate_key", "fn_json_extract",
    "llm_text_classify", "flt_null_coalesce", "fn_try_arith", "llm_stratified_sample",
    "fn_struct_nested", "llm_vector_norm_filter", "udf_pandas_vectorized", "fn_date_derive",
    "txt_quality_score", "flt_range", "win_topk_per_group", "flt_in_set",
    "flt_like_regex", "fn_map_ops", "set_intersect", "evt_sessionize_lag",
    "set_except_all", "set_union_all", "agg_stats", "fn_bitwise",
    "agg_pivot", "llm_centroid_per_label", "llm_dataset_mixture", "mm_frame_sample",
    "set_except", "agg_percentiles", "sql_lateral_topn", "join_anti",
    "llm_dedup_exact", "set_intersect_all", "evt_time_spine", "geo_grid_bin",
    "join_inner", "fn_explode", "llm_term_topk", "txt_lang_id",
    "set_union_distinct", "fn_levenshtein", "join_semi", "sql_correlated_subquery",
    "evt_anomaly_zscore", "evt_gap_islands", "llm_unigram_logprob", "udf_scalar_python",
    "src_json_roundtrip", "src_text_log_parse", "snk_parquet", "snk_upsert_merge",
    "llm_corpus_funnel",
    "agg_collect_sorted", "evt_tumbling_hour", "udaf_grouped_map", "evt_sliding_window",
    "join_left_outer", "llm_cosine_topk", "join_full_outer", "join_skew_salted",
    "join_broadcast_dim", "fn_from_json_struct", "llm_vector_quantize", "srt_topk_global",
    "agg_distinct_count", "llm_knn_join", "join_null_safe", "dq_constraint_report",
    "geo_hex_bin", "src_csv_roundtrip", "llm_tfidf_topk", "agg_global",
    "evt_session_batch", "join_theta_range", "snk_partitioned", "geo_point_in_polygon",
    "agg_filtered", "agg_histogram", "evt_cohort_retention", "agg_rollup",
    "src_orc_roundtrip", "stm_stateful_running", "join_cross_small", "stm_tumbling_availablenow",
    "join_multiway_5", "agg_grouping_sets", "agg_minmax_by", "evt_funnel",
    "llm_contamination_ngram", "stm_sliding_watermark", "stm_foreachbatch_sink", "stm_join_stream_static",
    "agg_cube", "join_asof", "agg_groupby_q1", "stm_late_data_drop",
    "stm_watermark_dedup", "snk_bucketed_join", "stm_stateful_session", "llm_dedup_near_minhash",
    "llm_dedup_simhash", "fn_url_parse", "mm_decode_stub", "geo_bbox_join",
    "txt_repetition_filter",
    "agg_approx_distinct", "llm_ann_hyperplane", "llm_kmeans_step", "llm_dedup_embedding",
    "llm_ann_ivf", "llm_dedup_clusters", "llm_dedup_ngram",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir)

        return run

    rank = {k: i for i, k in enumerate(_KEY_ORDER)}
    ordered = sorted(QUERIES, key=lambda k: (rank.get(k, len(rank)), k))
    return {key: wrap(QUERIES[key]) for key in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per key (omitted keys => rows-only check)."""
    return dict(ORACLES)
