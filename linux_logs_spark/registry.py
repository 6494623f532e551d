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
# driver's verified set (this table: full 168-query 2-pass run on a
# QUIET host — load ~2, the round-5 throttling had lifted — after the
# full review-fix hardening; cost_s = min of passes; 168/168
# clean, zero mismatches).
# tests/test_contract.py asserts every registered
# query has an entry so additions can't silently default.
_MEASURED_COST: dict[str, float] = {
    "agg_approx_distinct": 0.6, "agg_approx_percentile": 0.16, "agg_bool": 0.2, "agg_collect": 0.22,
    "agg_conditional_family": 0.35, "agg_count_distinct": 0.26, "agg_cube": 0.28, "agg_distinct_rows": 0.17,
    "agg_global": 0.31, "agg_groupby": 0.35, "agg_groupby_sql": 0.38, "agg_grouping_sets": 0.19,
    "agg_having": 0.2, "agg_histogram": 0.2, "agg_hll_sketch_rollup": 0.34, "agg_min_max_by": 0.16,
    "agg_mode": 0.25, "agg_percentile": 0.36, "agg_pivot": 0.37, "agg_regression_family": 0.32,
    "agg_rollup": 0.28, "agg_stats": 0.29, "agg_string_concat": 0.22, "agg_unpivot": 0.12,
    "corpus_mix_rebalance": 0.34, "cust_order_intervals": 0.38, "cust_rfm_segments": 1.85, "decontam_ngram_overlap": 0.72,
    "dedup_clusters_cc": 3.14, "dedup_edit_verify": 1.4, "dedup_embedding_cosine": 2.73, "dedup_exact": 0.18,
    "dedup_exact_hash": 0.16, "dedup_near_minhash": 1.2, "dedup_ngram_jaccard": 0.89, "dedup_simhash": 2.0,
    "doc_chunk": 0.17, "emb_centroid_outliers": 0.56, "emb_label_centroid": 0.22, "emb_neighborhood_purity": 0.74,
    "emb_pca_power": 0.37, "fn_array": 0.16, "fn_array_agg": 0.13, "fn_bitwise": 0.26,
    "fn_conditional": 0.33, "fn_datetime": 0.57, "fn_hash": 0.1, "fn_interval": 0.2,
    "fn_json": 0.27, "fn_map": 0.23, "fn_math": 0.15, "fn_posexplode": 0.13,
    "fn_regex": 0.14, "fn_string": 0.14, "fn_string_extended": 0.17, "fn_trig": 0.14,
    "join_asof": 0.29, "join_broadcast": 0.27, "join_bucketed_colocated": 0.95, "join_cross": 0.13,
    "join_full_outer": 0.32, "join_inner_equi": 0.35, "join_inner_equi_sql": 0.42, "join_left_anti": 0.13,
    "join_left_outer": 0.27, "join_left_semi": 0.15, "join_null_safe": 0.29, "join_range_binned": 0.53,
    "join_self_multi": 0.25, "join_skew_salted": 0.29, "join_theta_range": 0.14, "limit_topk": 0.12,
    "log_anomaly_zscore": 0.3, "log_burst_detect": 0.29, "log_corr_matrix": 0.41, "log_error_rate_hourly": 0.23,
    "log_error_rate_hourly_sql": 0.21, "log_event_transitions": 0.26, "log_gap_fill": 0.33, "log_retention_cohorts": 0.35,
    "log_rollup_multires": 0.92, "log_search": 0.25, "log_seasonality_profile": 0.28, "log_slo_burn": 0.29,
    "log_top_services": 0.27, "log_type_hour_matrix": 0.26, "log_user_funnel": 0.21, "multimodal_features": 0.27,
    "multimodal_frame_sample": 0.27, "multimodal_join": 0.15, "multimodal_resize": 0.24, "pack_sequences": 0.2,
    "part_copurchase": 0.64, "pipeline_corpus_prep": 0.52, "q_case_when": 0.32, "q_exists_correlated": 0.15,
    "q_filter_basic": 0.19, "q_filter_basic_sql": 0.21, "q_filter_in_between": 0.13, "q_filter_like": 0.1,
    "q_project": 1.18, "q_subquery_scalar": 0.22, "sample_stratified": 0.24, "scan_binary_files": 0.15,
    "scan_csv_malformed": 0.23, "scan_csv_roundtrip": 0.32, "scan_json_lines": 0.19, "scan_orc_roundtrip": 0.19,
    "scan_parquet": 0.05, "scan_text_parse": 0.29, "scd2_merge": 0.17, "sessionize": 0.39,
    "set_except": 0.28, "set_intersect": 0.24, "set_union_all": 0.17, "set_union_distinct": 0.22,
    "sim_ann_ivf": 2.41, "sim_ann_lsh": 1.74, "sim_cosine_blocked": 0.57, "sim_cosine_topk": 3.18,
    "sim_knn_label": 0.67, "sink_parquet_partitioned": 0.91, "sort_multi": 0.45, "split_train_holdout": 0.1,
    "stream_custom_state": 0.99, "stream_dedup": 1.0, "stream_foreach_batch": 0.59, "stream_session": 1.1,
    "stream_sliding": 1.05, "stream_static_join": 0.71, "stream_stream_join": 2.58, "stream_text_tail": 1.05,
    "stream_transform_with_state": 0.84, "stream_tumbling": 0.97, "stream_watermark_late": 1.19, "table_column_stats": 0.62,
    "text_fingerprint": 0.28, "text_lang_id": 0.27, "text_lang_stats": 0.28, "text_ngram_topk": 0.43,
    "text_quality_score": 0.16, "text_repetition_score": 0.31, "text_tfidf": 0.63, "text_token_count_bpe": 0.12,
    "text_tokenize_counts": 0.17, "topk_per_group": 0.33, "tpch_q10": 0.38, "tpch_q14": 0.26,
    "tpch_q15": 0.51, "tpch_q18": 0.58, "tpch_q3": 0.33, "tpch_q5": 0.29,
    "tpch_q6": 0.16, "tpch_q7": 0.59, "udaf_pandas_agg": 0.27, "udf_pandas_scalar": 0.24,
    "udf_python": 0.33, "udtf_apply_in_pandas": 0.29, "udtf_python_native": 0.43, "vocab_build": 0.22,
    "win_first_last": 0.31, "win_lag_lead": 0.36, "win_latest_per_key": 0.21, "win_nth_value": 0.27,
    "win_range_frame": 1.86, "win_ranking": 0.61, "win_ranking_sql": 0.67, "win_running": 0.7,
}

_DEFAULT_COST = 0.9


def _driver_verified() -> frozenset[str]:
    """Names with a driver CORRECTNESS row in any past round.

    Read from the committed ``VERIFIED_HISTORY.json`` at the repo root
    (regenerated each round from the driver's ``CORRECTNESS_r*.json``
    files). Missing/unreadable file → empty set, which degrades to the
    old pure cheapest-first ordering.
    """
    import json
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "VERIFIED_HISTORY.json"
    try:
        data = json.loads(path.read_text())
        return frozenset(data["verified"])
    except Exception:
        return frozenset()


def all_queries() -> dict[str, QuerySpec]:
    """Registry in driver-iteration order.

    The driver's correctness pass runs ~50 queries per round in this
    dict's order. Three rounds of pure cheapest-first re-verified the
    same cheap head while ~59 queries never produced a CORRECTNESS
    row, so the primary sort key is now "never driver-verified first"
    (cheapest-first within each class): every budgeted driver window
    extends the signed set instead of re-signing it.
    """
    _ensure_loaded()
    verified = _driver_verified()
    names = sorted(
        _REGISTRY,
        key=lambda n: (n in verified, _MEASURED_COST.get(n, _DEFAULT_COST)),
    )
    return {n: _REGISTRY[n] for n in names}


def get_query(name: str) -> QuerySpec:
    _ensure_loaded()
    return _REGISTRY[name]
