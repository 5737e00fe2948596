"""Query registry — the single source of truth for the t2 contract.

Each operator from SURVEY.md §2B registers here with:
  - a Spark callable ``(spark, sf_dir) -> DataFrame``
  - an equivalent DuckDB oracle SQL string (or None for rows-only ops:
    approximate / streaming / hash-dependent semantics)

``__spark_entry__.py`` delegates to :func:`queries` / :func:`oracle_sql`.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules whose import registers queries. Order = SURVEY §7 build order.
_QUERY_MODULES = [
    "opusdb_spark.queries.scans",
    "opusdb_spark.queries.filters",
    "opusdb_spark.queries.joins",
    "opusdb_spark.queries.aggregates",
    "opusdb_spark.queries.windows",
    "opusdb_spark.queries.sorts",
    "opusdb_spark.queries.setops",
    "opusdb_spark.queries.scalar_functions",
    "opusdb_spark.queries.subqueries",
    "opusdb_spark.queries.reshape",
    "opusdb_spark.queries.versioned",
    "opusdb_spark.queries.streaming_batch",
    "opusdb_spark.queries.udfs",
    "opusdb_spark.queries.llm",
    "opusdb_spark.queries.pipeline",
    "opusdb_spark.queries.tpch",
    "opusdb_spark.queries.graph",
]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}
_LOADED = False


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, tags, fn.__doc__ or "")
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if not _LOADED:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _LOADED = True


# Sweep prioritization: a time-budgeted correctness sweep that runs in
# dict order should reach unverified queries FIRST. These names already
# hold a clean driver verdict (union of CORRECTNESS_r01/r02/r03.json —
# pass or clean rows-only run), so they are emitted last; everything
# without a prior verdict runs at the front — the round-3 verification
# backlog first, then queries added this round, then the verdicted ones.
# Harmless if the consumer sorts or completes the full sweep.
_HAVE_VERDICT = frozenset(
    {
        # round 1 (CORRECTNESS_r01.json)
        "scan_full", "scan_prune", "scan_filter_pushdown",
        "scan_events_ordered", "sink_append", "sink_partitioned",
        "source_csv_roundtrip", "source_json_roundtrip", "project_arith",
        "filter_range", "filter_in_like_null", "case_when",
        "filter_hash_sample", "join_inner", "join_broadcast",
        "join_sort_merge", "join_left", "join_right", "join_full",
        "join_semi", "join_anti", "join_theta", "join_cross",
        "join_multiway", "join_asof", "join_interval",
        "join_bucketed_colocated", "join_partition_pruned", "agg_q1",
        "agg_count_distinct", "agg_approx_distinct", "agg_rollup",
        "agg_cube", "agg_grouping_sets", "agg_having",
        "agg_distinct_rows", "agg_stats", "agg_percentile",
        "agg_invariant", "agg_percentile_exact", "win_rank",
        "win_topk_group", "win_running_sum", "win_lag_lead",
        "win_range_frame", "win_ntile_firstlast", "win_latest_version",
        "win_asof_version",
        # round 2 (CORRECTNESS_r02.json)
        "agg_bucketed_noshuffle", "join_bloom_pruned", "agg_conditional",
        "agg_collect_sorted", "agg_incremental_merge", "win_history_cap",
        "win_cume_percent", "sort_multi", "limit_n", "topk_global",
        "set_union_all", "set_union", "set_intersect", "set_except",
        "fn_string", "fn_regex", "fn_date", "fn_math", "fn_cast_decimal",
        "fn_array", "fn_array_explode", "fn_map", "fn_json", "fn_null",
        "fn_bitwise", "sub_scalar", "sub_in", "sub_correlated",
        "cte_query", "sub_lateral", "pivot_status", "unpivot_melt",
        "mvcc_snapshot_read", "mvcc_conservation", "mvcc_txn_rollback",
        "sink_reopen_append", "join_salted_skew", "agg_salted_skew",
        "mvcc_merge_upsert", "scd2_history", "stream_tumbling",
        "stream_sliding", "stream_session", "stream_stateful_running",
        "stream_dedup", "stream_watermark_late", "stream_foreachbatch_sink",
        "stream_session_true", "stream_dedup_true", "stream_stateful_true",
        # round 3 (CORRECTNESS_r03.json)
        "udf_python", "udf_pandas_scalar", "udaf_pandas_grouped",
        "udtf_grouped_map", "udtf_explode", "udf_cogrouped",
        "llm_dedup_exact", "llm_dedup_fuzzy", "llm_dedup_simhash",
        "llm_dedup_ngram_jaccard", "llm_similarity_topk",
        "llm_simsearch_lsh", "llm_simsearch_ivf", "llm_dedup_cluster",
        "llm_text_stats", "llm_lang_filter", "llm_wordcount", "llm_langid",
        "llm_quality_score", "llm_token_count", "llm_fingerprint",
        "llm_embedding_neardup", "llm_dedup_pipeline",
        "multimodal_features", "multimodal_resize", "llm_bm25_topk",
        "emb_label_centroids", "llm_dedup_editdist", "llm_pii_scrub",
        "llm_repetition_filter", "llm_train_val_split", "llm_domain_mix",
        "llm_quality_filter_pipeline", "llm_seq_pack", "llm_shuffle_shard",
        "llm_decontaminate", "llm_vocab_topk", "llm_sample_per_group",
        "llm_bigram_lm", "stream_join_true", "udtf_python_api",
        "ts_gapfill", "hist_values", "source_orc_roundtrip",
        "events_zscore_outliers", "dq_constraints", "profile_columns",
        "ts_ohlc", "mvcc_snapshot_stale", "stream_commit_ledger",
        # round 4 (CORRECTNESS_r04.json): the cleared r3 backlog —
        # 37 hash-pass + 13 rows-only clean, 0 failures
        "mvcc_conflict_detect", "win_rolling_median", "win_streaks",
        "win_time_range_sum", "agg_mode", "agg_bool_logic", "fn_array_hof",
        "fn_safe_arith", "fn_struct", "join_null_safe", "sub_not_in_nulls",
        "ts_interpolate", "agg_grouping_flags", "agg_skew_kurtosis",
        "events_anomaly_mad", "events_attribution", "events_dau_wau",
        "events_funnel", "events_inter_arrival", "events_markov_transitions",
        "events_mom_growth", "events_path_analysis", "events_retention",
        "events_rfm_segments", "events_time_to_convert",
        "basket_copurchase_lift", "llm_dedup_keep_best", "llm_gopher_rules",
        "llm_chunk_split", "llm_html_strip", "llm_perplexity_score",
        "llm_temperature_mix", "mvcc_time_travel_diff",
        "scan_schema_evolution", "source_csv_quoted",
        "source_text_roundtrip", "scan_cached_reuse", "agg_countmin_topk",
        "agg_hll_partial_merge", "emb_kmeans", "llm_ann_recall_eval",
        "llm_bpe_train", "llm_bpe_apply", "llm_dedup_incremental",
        "llm_dedup_method_report", "llm_minhash_calibration",
        "multimodal_audio_energy", "multimodal_frame_sample",
        "source_binaryfile_ingest", "udaf_ewma",
        # round 5 (CORRECTNESS_r05.json): 48 hash-exact + the two
        # rows-only sinks ran clean — 0 failures
        "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q6", "tpch_q7", "tpch_q8",
        "tpch_q9", "tpch_q10", "tpch_q11", "tpch_q12", "tpch_q13",
        "tpch_q14", "tpch_q16", "tpch_q18", "tpch_q19", "tpch_q20",
        "tpch_q21", "tpch_q22", "graph_pagerank", "graph_triangle_count",
        "emb_covariance", "llm_semdedup", "join_asof_forward",
        "join_asof_nearest", "join_asof_tolerance", "llm_dsir_weights",
        "events_sessionize", "events_revenue_pareto", "emb_hard_negatives",
        "source_opusdb_log", "sink_opusdb_log", "llm_substring_dedup",
        "llm_winnowing_overlap", "llm_url_dedup", "llm_soft_dedup_weights",
        "llm_weighted_sample", "scan_manifest_prune",
        "llm_perplexity_buckets", "llm_ngram_novelty",
        "dq_referential_integrity", "llm_cluster_topics",
        "events_seasonality", "events_ab_ztest", "join_pit_features",
        "events_cumulative_users", "events_cohort_ltv",
        "events_pattern_match", "llm_entropy_filter",
        "sink_compact_small_files", "sink_clustered_write",
        # round 6 (CORRECTNESS_r06.json): the 16 never-sampled keys all
        # verdicted — 49 clean; the 1 failure (emb_pca_power) stays in
        # the sweep head below until its reshaped output is verdicted
        "fn_url_parse", "fn_map_hof", "win_ignore_nulls",
        "agg_weighted_avg", "source_corrupt_records", "mvcc_vacuum_report",
        "emb_outlier_mahalanobis", "multimodal_phash_dedup",
        "llm_corpus_report", "stream_opusdb_log_tail", "llm_mmr_select",
        "sink_zorder_write", "llm_quality_classifier",
        "stream_session_timeout",
    }
)

# The round-7 verification backlog. CORRECTNESS_r06 cleared all 16
# previously-never-sampled keys (49 clean, 1 failure: emb_pca_power's
# array<double> output broke the driver canonicalizer — fixed in r7 by
# emitting scalar (component, dim_idx, loading) rows). Sweep head now:
#   1. emb_pca_power — the repo's only-ever red row; needs its clean
#      CORRECTNESS_r07 verdict on the reshaped output.
#   2. The queries ROUND 6 REWROTE, whose r5 hash-passes describe code
#      that no longer exists: tpch_q11 (threshold 0.001→0.0001 — the r5
#      pass was on a 0-row result, the r7 verdict must show rows > 0),
#      llm_substring_dedup (single-pass rewrite), sink_opusdb_log
#      (two-phase commit), llm_quality_classifier_score (fingerprint
#      hypers), graph_pagerank + graph_triangle_count (cache lifecycle).
#   3. Queries ROUND 7 changes: llm_decontaminate (xxhash64 3-gram
#      keys + DF≤20 stop-gram cap), llm_winnowing_overlap + llm_substring_dedup
#      (xxhash64 keys), graph_pagerank (edge-artifact ingest).
_NEVER_SAMPLED = (
    "emb_pca_power",
    # --- r6-rewritten, r5 verdicts stale ---
    "tpch_q11", "llm_substring_dedup", "sink_opusdb_log",
    "llm_quality_classifier_score", "graph_pagerank",
    "graph_triangle_count",
    # --- r7-rewritten ---
    "llm_decontaminate", "llm_winnowing_overlap",
    # tpch_q18 (IN-subquery re-aggregation fused to one fact pass),
    # llm_embedding_neardup (first-collision-ownership mapInPandas
    # kernel over the lsh store, zero pair-sized shuffle, plus the
    # bucket-file-split fallback guard), sub_correlated (BIGINT
    # quantity sum), cte_query (OVER () max so the CTE body runs
    # once): r7 rewrites, prior verdicts describe the old plans.
    # sink_opusdb_log also changed late in r7 (job-scoped orphan
    # sweep) — already in the head above. join_bloom_prune is NEW in
    # r7 and reaches the sweep via the no-verdict fresh tier.
    "tpch_q18", "llm_embedding_neardup", "sub_correlated", "cte_query",
)


def _sweep_ordered(items: dict[str, Query]) -> dict[str, Query]:
    head = [k for k in _NEVER_SAMPLED if k in items]
    tail = {k: items[k] for k in head}
    fresh = {
        k: v
        for k, v in items.items()
        if k not in _HAVE_VERDICT and k not in tail
    }
    prior = {k: v for k, v in items.items() if k in _HAVE_VERDICT}
    return {**tail, **fresh, **prior}


def registry() -> dict[str, Query]:
    _load()
    return _sweep_ordered(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in registry().items() if q.oracle is not None
    }
