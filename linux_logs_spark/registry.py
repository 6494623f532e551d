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
# N_IVF_CELLS, block counts) patched away from their import-time
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
# LAST REFRESH: 198 queries, total 418.7 s, zero bad rows; round-7 continuation: 198 queries, one clean full 2-pass (sum cost 133.6 s)
# (log_rollup_incremental 0.84 [post-pushdown-rewrite] / dq_expectations 0.76 / q_parameterized_sql 1.86 /
#  sink_parquet_rebalanced 3.51 added after that refresh: subset 2-pass)
_MEASURED_COST: dict[str, float] = {
    "agg_approx_distinct": 0.97, "agg_approx_percentile": 0.2, "agg_bitmap_distinct": 0.39, "agg_bool": 0.32,
    "agg_collect": 0.3, "agg_conditional_family": 0.62, "agg_count_distinct": 0.31, "agg_cube": 0.53,
    "agg_distinct_rows": 0.21, "agg_global": 0.43, "agg_groupby": 0.41, "agg_groupby_sql": 0.55,
    "agg_grouping_sets": 0.27, "agg_having": 0.24, "agg_histogram": 0.23, "agg_hll_sketch_rollup": 0.5,
    "agg_min_max_by": 0.24, "agg_mode": 0.62, "agg_percentile": 0.46, "agg_pivot": 0.8,
    "agg_regression_family": 0.44, "agg_rollup": 0.49, "agg_stats": 0.54, "agg_string_concat": 0.3,
    "agg_unpivot": 0.17, "bpe_train_merges": 5.02, "corpus_budget_trim": 0.29, "corpus_mix_rebalance": 0.4,
    "cust_order_intervals": 0.49, "cust_rfm_segments": 1.98, "decontam_ngram_overlap": 0.98, "dedup_clusters_cc": 2.86,
    "dedup_edit_verify": 1.68, "dedup_embedding_cosine": 1.56, "dedup_exact": 0.23, "dedup_exact_hash": 0.22,
    "dedup_near_minhash": 1.26, "dq_expectations": 0.76, "dedup_ngram_jaccard": 1.73, "dedup_shingle_jaccard": 1.05, "dedup_simhash": 1.51,
    "doc_chunk": 0.24, "doc_pii_scrub": 0.21, "emb_centroid_outliers": 0.78, "emb_label_centroid": 0.45,
    "emb_neighborhood_purity": 0.87, "emb_pca_power": 0.75, "emb_quantize_int8": 0.55, "fn_array": 0.2,
    "fn_array_agg": 0.18, "fn_bitwise": 0.42, "fn_collation": 0.57, "fn_conditional": 0.5,
    "fn_datetime": 0.95, "fn_hash": 0.13, "fn_interval": 0.3, "fn_json": 0.59,
    "fn_map": 0.28, "fn_math": 0.24, "fn_posexplode": 0.23, "fn_regex": 0.2,
    "fn_sql_udf": 0.33, "fn_string": 0.18, "fn_string_extended": 0.23, "fn_trig": 0.2,
    "fn_url_parse": 0.17, "fn_variant": 0.19, "graph_pagerank": 6.21, "join_asof": 0.76,
    "join_broadcast": 0.34, "join_bucketed_colocated": 1.71, "join_cross": 0.14, "join_full_outer": 0.33,
    "join_inner_equi": 0.45, "join_inner_equi_sql": 0.61, "join_left_anti": 0.17, "join_left_outer": 0.33,
    "join_left_semi": 0.2, "join_null_safe": 0.5, "join_range_binned": 0.71, "join_self_multi": 0.33,
    "join_skew_salted": 0.41, "join_theta_range": 0.18, "limit_topk": 0.16, "log_anomaly_zscore": 0.52,
    "log_burst_detect": 0.4, "log_corr_matrix": 1.13, "log_error_rate_hourly": 0.3, "log_error_rate_hourly_sql": 0.4,
    "log_event_transitions": 0.38, "log_gap_fill": 0.5, "log_retention_cohorts": 0.53, "log_rollup_incremental": 0.84, "log_rollup_multires": 1.12,
    "log_search": 0.26, "log_seasonality_profile": 0.39, "log_slo_burn": 0.56, "log_top_services": 0.2,
    "log_type_hour_matrix": 0.43, "log_user_funnel": 0.41, "multimodal_features": 0.48, "multimodal_frame_sample": 0.33,
    "multimodal_join": 0.25, "multimodal_resize": 0.42, "obs_metrics": 0.91, "pack_sequences": 0.32,
    "part_copurchase": 0.88, "pipeline_corpus_prep": 0.84, "q_case_when": 0.4, "q_exists_correlated": 0.26,
    "q_filter_basic": 0.26, "q_filter_basic_sql": 0.47, "q_filter_in_between": 0.18, "q_filter_like": 0.19,
    "q_lateral_topk": 0.36, "q_parameterized_sql": 1.86, "q_pipe_syntax": 0.26, "q_project": 1.4, "q_recursive_cte": 1.35,
    "q_subquery_scalar": 0.29, "sample_stratified": 0.28, "scan_apache_log": 0.45, "scan_binary_files": 0.31,
    "scan_csv_malformed": 0.34, "scan_csv_roundtrip": 0.47, "scan_json_lines": 0.24, "scan_orc_roundtrip": 0.28,
    "scan_parquet": 0.14, "scan_python_datasource": 1.05, "scan_text_parse": 0.49, "scan_xml_roundtrip": 0.36,
    "scd2_merge": 0.28, "sessionize": 0.53, "set_except": 0.23, "set_intersect": 0.26,
    "set_union_all": 0.27, "set_union_distinct": 0.31, "shuffle_shard": 0.25, "sim_ann_ivf": 1.44,
    "sim_ann_lsh": 1.08, "sim_cosine_blocked": 0.42, "sim_cosine_topk": 1.82, "sim_knn_label": 1.69,
    "sink_parquet_partitioned": 1.11, "sink_parquet_rebalanced": 3.51, "sort_multi": 0.48,
    "split_train_holdout": 0.15, "stream_custom_state": 1.07,
    "stream_dedup": 2.45, "stream_foreach_batch": 0.86, "stream_python_source": 4.9, "stream_session": 1.22,
    "stream_sliding": 1.26, "stream_state_reader": 0.3, "stream_static_join": 1.26, "stream_stream_join": 2.63,
    "stream_text_tail": 1.14, "stream_transform_with_state": 1.31, "stream_tumbling": 1.63, "stream_watermark_late": 1.33,
    "table_column_stats": 0.82, "table_optimize_compact": 1.09, "table_time_travel": 0.4, "text_fingerprint": 0.52,
    "text_lang_id": 0.69, "text_lang_stats": 0.46, "text_ngram_topk": 0.93, "text_perplexity": 1.15,
    "text_quality_score": 0.28, "text_repetition_score": 0.39, "text_tfidf": 0.92, "text_token_count_bpe": 0.17,
    "text_tokenize_counts": 0.23, "topk_per_group": 0.27, "tpch_q10": 0.51, "tpch_q13": 0.32,
    "tpch_q14": 0.33, "tpch_q15": 0.59, "tpch_q17": 0.48, "tpch_q18": 0.64,
    "tpch_q3": 0.45, "tpch_q5": 0.71, "tpch_q6": 0.23, "tpch_q7": 0.75,
    "tpch_q8": 0.39, "udaf_arrow_grouped": 0.59, "udaf_pandas_agg": 0.61, "udf_arrow_batch": 0.62,
    "udf_pandas_scalar": 0.28, "udf_python": 0.39, "udtf_apply_in_pandas": 0.51, "udtf_python_native": 0.83,
    "vocab_build": 0.38, "win_first_last": 0.51, "win_lag_lead": 0.53, "win_latest_per_key": 0.38,
    "win_nth_value": 0.32, "win_pattern_seq": 0.42, "win_range_frame": 1.94, "win_ranking": 0.75,
    "win_ranking_sql": 1.03, "win_running": 1.02,
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
