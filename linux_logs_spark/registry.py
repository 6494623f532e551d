"""Central query registry — the engine's verifiable surface.

Every operator from SURVEY.md §2 registers here with:
- a Spark callable ``(spark, sf_dir) -> DataFrame``,
- optionally the equivalent ANSI SQL for the DuckDB oracle (None for
  genuinely non-SQL-expressible ops → the driver falls back to a
  rows-only check).

``__spark_entry__.py`` exposes this registry to the driver; tests and
bench.py iterate it too, so one registration makes an operator
smoke-tested, oracle-checked, and benchmarked.
"""

from __future__ import annotations

import importlib
import sys
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    category: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check


_REGISTRY: dict[str, QuerySpec] = {}

# True while scripts/scale_rehearsal.py has family knobs (N_PLANES,
# block counts) patched away from their import-time
# defaults. Registered oracle SQL is baked from those defaults at
# import, so verifying against an oracle under patched knobs would
# compare mismatched configurations — verify.run_oracle refuses while
# this is set (round-6 advice).
knobs_patched = False

# Modules that register queries on import. Kept explicit so the import
# order (and thus registry order) is deterministic.
_QUERY_MODULES = (
    "linux_logs_spark.operators.scans",
    "linux_logs_spark.operators.relational",
    "linux_logs_spark.operators.joins",
    "linux_logs_spark.operators.aggregates",
    "linux_logs_spark.operators.windows",
    "linux_logs_spark.operators.sorts_sets",
    "linux_logs_spark.operators.functions_scalar",
    "linux_logs_spark.operators.log_analytics",
    "linux_logs_spark.operators.udfs",
    "linux_logs_spark.operators.llm_pipeline",
    "linux_logs_spark.operators.warehouse",
    "linux_logs_spark.operators.extras",
    "linux_logs_spark.operators.training_data",
    "linux_logs_spark.streaming.queries",
    "linux_logs_spark.operators.sql_twins",  # needs the originals registered
)

_loaded = False


def register(name: str, category: str, oracle: str | None = None):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, category=category, fn=fn, oracle=oracle)
        return fn

    return deco


def _ensure_loaded() -> None:
    global _loaded
    if _loaded:
        return
    # Only latch _loaded once EVERY module imported: a partial import
    # must re-raise on the next call, not silently serve a truncated
    # registry to the driver.
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except Exception:
            for m in _QUERY_MODULES:
                sys.modules.pop(m, None)
            _REGISTRY.clear()
            raise
    _loaded = True


# Measured wall-seconds per query at sf0.01 (Spark run + toPandas +
# DuckDB oracle + compare — scripts/driver_sim.py, local[32]). The
# driver's correctness pass iterates queries() in dict order under a
# TIME BUDGET (round 1 stopped after 50/109 queries), so all_queries()
# yields cheapest-first: that ordering maximizes the number of
# verified queries for any budget. Unmeasured (new) queries default to
# mid-cost so they still land before the heavy tail.
#
# REFRESH RULE: regenerate this whole table from a FULL
# `python scripts/driver_sim.py` run (warm JVM, registry order)
# whenever a query's plan changes or a query is added — a stale entry
# mis-sorts the budget ordering and can push tail queries out of the
# driver's verified set. THIS TABLE: every entry from the single full
# 2-pass run recorded in the machine-written LAST REFRESH line below
# (cost_s = min of passes; artifact: driver_sim_results.json) — one
# baseline, no subset mixing (mechanized:
# scripts/update_measured_cost.py, which also maintains that line).
# tests/test_contract.py asserts every registered
# query has an entry so additions can't silently default.
# LAST REFRESH: 242 queries, total 329.3 s, zero bad rows; round-9 final: full 2-pass refresh at 242 queries post review fixes
_MEASURED_COST: dict[str, float] = {
    "agg_approx_distinct": 0.66, "agg_approx_percentile": 0.17, "agg_bitmap_distinct": 0.29, "agg_bool": 0.21,
    "agg_collect": 0.25, "agg_conditional_family": 0.48, "agg_count_distinct": 0.33, "agg_cube": 0.33,
    "agg_distinct_rows": 0.18, "agg_freq_items_sketch": 0.88, "agg_global": 0.33, "agg_groupby": 0.41,
    "agg_groupby_sql": 0.46, "agg_grouping_id": 0.25, "agg_grouping_sets": 0.21, "agg_having": 0.2,
    "agg_histogram": 0.18, "agg_hll_sketch_rollup": 0.41, "agg_min_max_by": 0.17, "agg_mode": 0.26,
    "agg_percentile": 0.37, "agg_pivot": 0.31, "agg_regression_family": 0.32, "agg_rollup": 0.33,
    "agg_stats": 0.28, "agg_string_concat": 0.23, "agg_unpivot": 0.13, "bpe_train_merges": 3.86,
    "corpus_budget_trim": 0.6, "corpus_mix_rebalance": 0.32, "corpus_temperature_sample": 0.47, "cust_order_intervals": 0.28,
    "cust_rfm_segments": 2.06, "decontam_ngram_overlap": 0.87, "dedup_clusters_cc": 2.81, "dedup_edit_verify": 1.33,
    "dedup_embedding_cosine": 1.34, "dedup_exact": 0.2, "dedup_exact_hash": 0.2, "dedup_near_minhash": 1.31,
    "dedup_ngram_jaccard": 1.01, "dedup_semantic_cluster": 2.71, "dedup_shingle_jaccard": 0.92, "dedup_simhash": 1.12,
    "dedup_substring_span": 1.62, "doc_chunk": 0.19, "doc_pii_scrub": 0.26, "dq_expectations": 0.31,
    "emb_centroid_outliers": 0.69, "emb_kmeans_lloyd": 3.31, "emb_label_centroid": 0.23, "emb_matryoshka_truncate": 1.8,
    "emb_neighborhood_purity": 0.63, "emb_pca_power": 0.47, "emb_quantize_int8": 0.38, "fn_aes_roundtrip": 0.15,
    "fn_array": 0.15, "fn_array_agg": 0.19, "fn_bitwise": 0.28, "fn_collation": 0.45,
    "fn_conditional": 0.35, "fn_datetime": 0.69, "fn_hash": 0.1, "fn_interval": 0.19,
    "fn_json": 0.27, "fn_map": 0.25, "fn_math": 0.19, "fn_posexplode": 0.14,
    "fn_regex": 0.15, "fn_sql_udf": 0.24, "fn_string": 0.2, "fn_string_extended": 0.21,
    "fn_struct": 0.31, "fn_trig": 0.15, "fn_try_arith": 0.17, "fn_url_parse": 0.13,
    "fn_variant": 0.13, "fn_xpath": 0.25, "graph_pagerank": 2.89, "graph_shortest_path": 2.15,
    "graph_triangle_count": 1.91, "join_asof": 0.25, "join_bloom_runtime_filter": 0.43, "join_broadcast": 0.29,
    "join_bucketed_colocated": 1.09, "join_cross": 0.13, "join_full_outer": 0.31, "join_inner_equi": 0.41,
    "join_inner_equi_sql": 0.5, "join_left_anti": 0.15, "join_left_outer": 0.31, "join_left_semi": 0.14,
    "join_null_safe": 0.34, "join_partition_pruned": 0.35, "join_range_binned": 0.56, "join_self_multi": 0.25,
    "join_skew_salted": 0.36, "join_theta_range": 0.15, "limit_topk": 0.11, "log_alert_debounce": 0.3,
    "log_anomaly_zscore": 0.4, "log_burst_detect": 0.4, "log_corr_matrix": 0.51, "log_entropy_profile": 0.51,
    "log_error_rate_hourly": 0.21, "log_error_rate_hourly_sql": 0.25, "log_event_transitions": 0.31, "log_gap_fill": 0.41,
    "log_latency_percentiles": 0.47, "log_retention_cohorts": 0.42, "log_rollup_incremental": 0.5, "log_rollup_multires": 0.96,
    "log_search": 0.29, "log_seasonality_profile": 0.34, "log_slo_burn": 0.33, "log_template_mine": 0.41,
    "log_top_services": 0.23, "log_type_hour_matrix": 0.26, "log_user_funnel": 0.26, "multimodal_features": 0.41,
    "multimodal_frame_sample": 0.32, "multimodal_join": 0.14, "multimodal_resize": 0.3, "obs_metrics": 0.57,
    "pack_sequences": 0.25, "pack_sequences_ffd": 0.41, "part_copurchase": 0.16, "pipeline_corpus_prep": 0.61,
    # round-10 addition: warm 2-run timing at sf0.01 (1.12/0.97 s)
    "pipeline_perplexity_gate": 1.0,
    "q_case_when": 0.28, "q_exists_correlated": 0.16, "q_filter_basic": 0.22, "q_filter_basic_sql": 0.28,
    "q_filter_in_between": 0.15, "q_filter_like": 0.13, "q_group_by_all": 0.29, "q_lateral_topk": 0.29,
    "q_parameterized_sql": 0.18, "q_pipe_syntax": 0.22, "q_project": 1.2, "q_recursive_cte": 1.09,
    "q_subquery_scalar": 0.22, "sample_stratified": 0.28, "sample_weighted_priority": 0.4, "scan_apache_log": 0.31,
    "scan_avro_roundtrip": 1.17, "scan_binary_files": 0.17, "scan_csv_malformed": 0.28, "scan_csv_roundtrip": 0.33,
    "scan_json_lines": 0.19, "scan_orc_roundtrip": 0.25, "scan_parquet": 0.06, "scan_python_datasource": 0.79,
    "scan_schema_evolution": 0.67, "scan_text_gzip": 0.36, "scan_text_parse": 0.33, "scan_xml_roundtrip": 0.23,
    "scd2_merge": 0.17, "sessionize": 0.46, "set_except": 0.21, "set_except_all": 0.37,
    "set_intersect": 0.23, "set_intersect_all": 0.41, "set_union_all": 0.16, "set_union_distinct": 0.2,
    "shuffle_shard": 0.26, "sim_ann_ivf": 1.41, "sim_ann_lsh": 0.83, "sim_cosine_blocked": 0.43,
    "sim_cosine_topk": 1.18, "sim_knn_label": 0.65, "sink_parquet_partitioned": 0.84, "sink_parquet_rebalanced": 0.47,
    "sink_python_datasource": 1.99, "sort_multi": 0.59, "split_train_holdout": 0.1, "stream_custom_state": 0.82,
    "stream_dedup": 2.05, "stream_foreach_batch": 0.76, "stream_python_sink": 1.36, "stream_python_source": 4.06,
    "stream_session": 1.24, "stream_sliding": 1.05, "stream_state_reader": 0.23, "stream_static_join": 1.0,
    "stream_stream_join": 2.84, "stream_text_tail": 1.1, "stream_transform_with_state": 0.92, "stream_tumbling": 1.04,
    "stream_watermark_late": 1.36, "table_column_stats": 0.68, "table_incremental_changes": 0.47, "table_merge_upsert": 0.42,
    "table_optimize_compact": 0.77, "table_partition_evolution": 1.44, "table_time_travel": 0.29, "table_vacuum": 2.14,
    "table_zorder_cluster": 0.79, "text_bigram_lm": 0.56, "text_fingerprint": 0.35, "text_hashing_tf": 0.38,
    "text_lang_id": 0.22, "text_lang_stats": 0.28, "text_ngram_topk": 0.52, "text_perplexity": 0.64,
    "text_quality_score": 0.19, "text_repetition_score": 0.35, "text_tfidf": 0.92, "text_token_count_bpe": 0.14,
    "text_tokenize_counts": 0.18, "topk_per_group": 0.26, "tpch_q10": 0.39, "tpch_q13": 0.33,
    "tpch_q14": 0.41, "tpch_q15": 0.34, "tpch_q17": 0.38, "tpch_q18": 0.53,
    "tpch_q19": 0.27, "tpch_q3": 0.4, "tpch_q5": 0.37, "tpch_q6": 0.21,
    "tpch_q7": 0.47, "tpch_q8": 0.39, "udaf_arrow_grouped": 0.35, "udaf_pandas_agg": 0.33,
    "udf_arrow_batch": 0.4, "udf_pandas_scalar": 0.27, "udf_python": 0.33, "udtf_apply_in_pandas": 0.34,
    "udtf_python_native": 0.5, "vocab_build": 0.26, "win_first_last": 0.32, "win_lag_lead": 0.4,
    "win_latest_per_key": 0.28, "win_nth_value": 0.31, "win_pattern_seq": 0.3, "win_pattern_var": 0.44,
    "win_range_frame": 1.75, "win_ranking": 0.67, "win_ranking_sql": 0.72, "win_running": 0.73,
    "win_session_window": 0.47, "win_time_range_frame": 0.45,
}

_DEFAULT_COST = 0.9


def _last_verified_round() -> dict[str, int]:
    """name → most recent round whose driver signature still counts
    (0 / absent = effectively never verified).

    Read from the committed ``VERIFIED_HISTORY.json`` at the repo root
    (regenerated each round from the driver's ``CORRECTNESS_r*.json``
    files via scripts/update_verified_history.py). Entries look like
    ``"r5"`` or ``"r4:rows-only"``. A rows-only signature counts ONLY
    while the query still has no oracle (it is then the strongest
    evidence possible); once a query GAINS an oracle, its old
    rows-only rounds are ignored so the new oracle sorts to the front
    of the driver window instead of waiting 2–3 rounds behind its
    stale weak signature (round-6 review finding — the five queries
    graduated in round 6 would otherwise go driver-unchecked).
    Missing/unreadable file → empty dict, which degrades to pure
    cheapest-first ordering.
    """
    import json
    import re
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "VERIFIED_HISTORY.json"
    out: dict[str, int] = {}
    try:
        data = json.loads(path.read_text())
        for name, rounds in data["verified"].items():
            has_oracle = name in _REGISTRY and _REGISTRY[name].oracle is not None
            nums = [
                int(m.group(1))
                for r in rounds
                for m in [re.match(r"r(\d+)(:rows-only)?$", r)]
                if m and not (has_oracle and m.group(2))
            ]
            if nums:
                out[name] = max(nums)
    except Exception:
        return {}
    return out


def all_queries() -> dict[str, QuerySpec]:
    """Registry in driver-iteration order.

    The driver's correctness pass signs ~50 CORRECTNESS rows per round
    in this dict's order. Rounds 1–3 used pure cheapest-first, which
    re-verified the same cheap head forever; rounds 4–5 used
    never-verified-first, which closed the gap to 168/168 signed. With
    everything signed at least once, never-first degenerates back to
    cheapest-first and a rewritten expensive query would never be
    re-signed — so the primary key is now the LAST round each query was
    signed (ascending, never = 0), i.e. stalest-signature-first,
    cheapest-first within a round cohort. Each driver window therefore
    refreshes the oldest evidence instead of re-stamping last round's.
    """
    _ensure_loaded()
    last = _last_verified_round()
    names = sorted(
        _REGISTRY,
        key=lambda n: (last.get(n, 0), _MEASURED_COST.get(n, _DEFAULT_COST)),
    )
    return {n: _REGISTRY[n] for n in names}


def get_query(name: str) -> QuerySpec:
    _ensure_loaded()
    return _REGISTRY[name]
