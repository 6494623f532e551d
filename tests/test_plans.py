"""Physical-plan golden checks (SURVEY.md §5 dev-loop extras).

Correctness tests can't see a silent scale regression — a broadcast
that fell back to a shuffle join still returns the right rows. These
tests pin the plan shapes the 100 TB design depends on.
"""

from __future__ import annotations

import re

from linux_logs_spark.plans.explain import assert_in_plan, plan_string
from linux_logs_spark.registry import all_queries

_Q = all_queries()


def test_broadcast_join_fires(spark, sf_dir):
    df = _Q["join_broadcast"].fn(spark, sf_dir)
    assert_in_plan(df, "BroadcastHashJoin")


def test_star_join_broadcasts_both_dims(spark, sf_dir):
    plan = plan_string(_Q["join_self_multi"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    plan = plan_string(_Q["q_filter_basic"].fn(spark, sf_dir))
    assert "PushedFilters:" in plan
    assert "l_quantity" in plan.split("PushedFilters:")[1].splitlines()[0], plan


def test_column_pruning_in_scan(spark, sf_dir):
    plan = plan_string(_Q["q_filter_basic"].fn(spark, sf_dir))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" not in read_schema, read_schema


def test_global_topk_is_take_ordered(spark, sf_dir):
    assert_in_plan(_Q["limit_topk"].fn(spark, sf_dir), "TakeOrderedAndProject")


def test_groupby_has_partial_aggregate(spark, sf_dir):
    plan = plan_string(_Q["agg_groupby"].fn(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2, plan  # partial + final


def test_theta_range_broadcasts_band_dim(spark, sf_dir):
    assert_in_plan(_Q["join_theta_range"].fn(spark, sf_dir), "BroadcastNestedLoopJoin")


def _codegen_subtrees(spark, name, sf_dir) -> int:
    """Count of WholeStageCodegen subtrees for a query's plan.

    Round-6 review found BOTH prior forms of this check vacuous: the
    'Found N WholeStageCodegen subtrees.' header is on splitlines()[0]
    (not [1]), AND under AQE the pre-execution codegen report is
    legitimately 'Found 0' because the final plan isn't resolved yet —
    so probe on an AQE-off session clone and parse the count."""
    clone = spark.newSession()
    clone.conf.set("spark.sql.adaptive.enabled", "false")
    plan = plan_string(_Q[name].fn(clone, sf_dir), mode="codegen")
    m = re.match(r"Found (\d+) WholeStageCodegen subtrees", plan.splitlines()[0])
    assert m, plan.splitlines()[:2]
    return int(m.group(1))


def test_whole_stage_codegen_covers_flagship(spark, sf_dir):
    assert _codegen_subtrees(spark, "agg_groupby", sf_dir) >= 2  # scan+agg, final agg


def test_semi_anti_are_broadcast_joins(spark, sf_dir):
    for name in ("join_left_semi", "join_left_anti"):
        plan = plan_string(_Q[name].fn(spark, sf_dir))
        assert "Join" in plan, plan


def test_partitioned_sink_prunes_partitions(spark, sf_dir):
    """The dt=-partitioned store must serve time-bounded queries with
    partition pruning (PartitionFilters at the scan), reading only the
    in-range directories — the property that makes a 100 TB log store
    searchable."""
    from pyspark.sql import functions as F

    _Q["sink_parquet_partitioned"].fn(spark, sf_dir).collect()  # materialize store
    from linux_logs_spark.operators.scans import _scratch

    path = _scratch(sf_dir, "events_by_day")
    back = spark.read.parquet(path).filter(F.col("dt") == "2024-01-05")
    plan = plan_string(back)
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "dt" in pf, plan
    assert back.count() > 0


# ---- round-2 additions -------------------------------------------------


def test_tpch_q3_broadcasts_dims_and_takeordered(spark, sf_dir):
    plan = plan_string(_Q["tpch_q3"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_tpch_q5_single_fact_shuffle(spark, sf_dir):
    plan = plan_string(_Q["tpch_q5"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 5, plan
    # only shuffles allowed: the final n_name aggregate exchange
    # (plus AQE's optional coalesce) — no sort-merge join anywhere
    assert "SortMergeJoin" not in plan, plan


def test_tpch_q6_pushes_all_predicates(spark, sf_dir):
    plan = plan_string(_Q["tpch_q6"].fn(spark, sf_dir))
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema, read_schema


def test_decontam_is_equijoin_not_cross(spark, sf_dir):
    plan = plan_string(_Q["decontam_ngram_overlap"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_sim_ann_ivf_is_equijoin_not_cross(spark, sf_dir):
    plan = plan_string(_Q["sim_ann_ivf"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_sim_ann_ivf_coarse_gemm_runs_once(spark, sf_dir):
    """Exactly ONE ArrowEvalPython for the coarse-assignment GEMM
    (guide §4.4): posexplode makes the optimizer infer a
    size(pcells) > 0 filter and push it below spread_ingest's
    repartition, where evaluating it re-runs the UDF — the round-14
    all-243 duplication scan caught the dominant n·K1·dim GEMM (and
    its full-corpus Arrow round-trip) executing twice. probe_cells is
    marked asNondeterministic as an optimizer fence; this pin keeps
    the duplication from coming back."""
    plan = plan_string(_Q["sim_ann_ivf"].fn(spark, sf_dir))
    # formatted mode prints each node twice (tree + detail header):
    # count the numbered detail headers
    nodes = re.findall(r"\(\d+\) ArrowEvalPython", plan)
    assert len(nodes) == 1, plan


# ---- round-3 additions -------------------------------------------------


def test_log_top_services_is_take_ordered(spark, sf_dir):
    """The per-user aggregate must reach the driver via a partial
    top-10 merge (TakeOrderedAndProject), never a single-partition
    global sort over |users| rows."""
    plan = plan_string(_Q["log_top_services"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_decontam_shuffles_hashes_not_strings(spark, sf_dir):
    """The train⋈bench join key must be the 8-byte xxhash64, with no
    shingle string surviving past the hash projection. Round 12 put a
    localCheckpoint between the hash projection and the joins, so the
    final plan starts at a LogicalRDD scan — assert (a) the
    checkpointed frame itself is the narrow (doc_id, sh_hash) shape
    with no string column, and (b) every join in the downstream plan
    keys on sh_hash with no shingle column anywhere."""
    df = _Q["decontam_ngram_overlap"].fn(spark, sf_dir)
    plan = plan_string(df)
    assert "sh_hash" in plan, plan
    assert "shingle#" not in plan, plan
    # the checkpoint cut hides the projection; its schema is the proof
    # that only the 8-byte hash (never the string) was materialized
    scans = [ln for ln in plan_string(df, "extended").splitlines()
             if "LogicalRDD" in ln or "Scan ExistingRDD" in ln]
    assert scans and all("sh_hash" in ln for ln in scans if "doc_id" in ln), scans
    assert all("shingle" not in ln for ln in scans), scans
    keys = [ln for ln in plan.splitlines() if "keys" in ln.lower() and "[" in ln]
    assert keys and all("shingle#" not in ln for ln in keys), keys


def test_vocab_build_is_take_ordered(spark, sf_dir):
    """Vocabulary truncation must be a per-partition top-K heap merge
    (TakeOrderedAndProject), and the id-assignment window must run
    AFTER the limit so only VOCAB_SIZE rows hit one partition."""
    plan = plan_string(_Q["vocab_build"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_doc_chunk_is_shuffle_free(spark, sf_dir):
    """Chunking is a pure per-row flatMap: no exchange anywhere —
    output partitioning follows the parquet scan."""
    plan = plan_string(_Q["doc_chunk"].fn(spark, sf_dir))
    assert "Exchange" not in plan, plan


def test_join_skew_salted_shuffles_on_salted_key(spark, sf_dir):
    """The salted join must be a shuffled hash join building the
    replicated dim (BuildRight), keyed on (key, salt) — a broadcast
    would bypass the skew mitigation being demonstrated."""
    plan = plan_string(_Q["join_skew_salted"].fn(spark, sf_dir))
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "BuildRight" in plan, plan
    # formatted explain lists join keys in the details section
    key_lines = [l for l in plan.splitlines() if "keys" in l and "salt#" in l]
    assert key_lines, plan


def test_win_latest_per_key_uses_group_limit(spark, sf_dir):
    """rn=1 compaction must plan as WindowGroupLimit (per-key 1-row
    running max), not a full per-group sort."""
    plan = plan_string(_Q["win_latest_per_key"].fn(spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan


def test_join_bucketed_colocated_is_exchange_free(spark, sf_dir):
    """The bucketed fact⋈fact join must read matching buckets pairwise
    with no exchange on the join key — the only exchange in the plan
    is the downstream aggregate's."""
    plan = plan_string(_Q["join_bucketed_colocated"].fn(spark, sf_dir))
    assert "SortMergeJoin" in plan, plan
    key_exchanges = [
        l for l in plan.splitlines()
        if "Exchange hashpartitioning" in l and "orderkey" in l
    ]
    assert not key_exchanges, key_exchanges


def test_cust_rfm_has_no_single_partition_window(spark, sf_dir):
    """The three exact ntiles must run as range-partitioned rank
    windows (partitioned by the range-partition id), never the
    move-all-rows-to-one-partition WindowExec that a bare
    Window.orderBy plans (round-3 verdict item 2). Every legitimate
    Window node leads its spec with _pid — either partitionBy(_pid)
    (the per-partition row_number) or orderBy(_pid) over the
    ≤ parts-row pid-counts frame (the bounded offsets cumsum) — so a
    reintroduced full-data Window.orderBy(metric) fails the match."""
    plan = plan_string(_Q["cust_rfm_segments"].fn(spark, sf_dir))
    bad = [
        l.strip()
        for l in plan.splitlines()
        if "Window [" in l and "windowspecdefinition(_pid" not in l
    ]
    assert not bad, f"unpartitioned window(s): {bad}"


def test_jaccard_pairs_shuffle_hashes_not_words(spark, sf_dir):
    """The word-Jaccard posting-list self-join must key on the 8-byte
    xxhash64(word) column with no word string surviving into any join
    key (round-3 verdict item 3 — mirror of the decontam guard); the
    same shape feeds dedup_clusters_cc's edge generation."""
    plan = plan_string(_Q["dedup_ngram_jaccard"].fn(spark, sf_dir))
    assert "xxhash64" in plan, plan
    keys = [ln for ln in plan.splitlines() if "keys" in ln.lower() and "[" in ln]
    # the exploded posting column was renamed word → unit when the
    # pipeline was parameterized (round 6); guard both names
    assert keys and all(
        "word#" not in ln and "unit#" not in ln for ln in keys
    ), keys
    assert any("wh#" in ln for ln in keys), keys


def test_jaccard_self_join_reuses_one_corpus_pass(spark, sf_dir):
    """Round-14 shape: the per-doc posting count rides the frame as a
    window count, so the self-join's two inputs are the SAME canonical
    subtree and the sort-merge regime (= the at-scale strategy once
    postings outgrow the broadcast gate) serves the second side from a
    ReusedExchange — ONE scan→explode→distinct pipeline per query with
    nothing pinned in the block manager. An earlier round-14 attempt
    localCheckpoint'd the corpus-sized posting frame instead; this pin
    exists so neither that (a checkpoint truncates the reused subtree)
    nor a count-table join (different pruned subtree → no reuse) can
    silently come back."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try:
        df = _Q["dedup_ngram_jaccard"].fn(spark, sf_dir)
        df.collect()  # AQE reuse is decided at runtime
        final = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "ReusedExchange" in final, final
    assert "Checkpoint" not in final, final


# ---- round-5 additions -------------------------------------------------


def test_dedup_embedding_cosine_is_blocked_equijoin(spark, sf_dir):
    """The exact threshold scan must enumerate pairs through the
    blocked (qblk, cblk) equi-join — never a broadcast cartesian of
    the full table (round-4 verdict item 2). The residual doc_a <
    doc_b rides the equi-join as a post-join filter."""
    plan = plan_string(_Q["dedup_embedding_cosine"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_pipeline_corpus_prep_exchange_budget(spark, sf_dir):
    """The corpus-prep funnel's headline claim, tightened in round 14:
    the whole funnel is ONE aggregation chain — a full-volume shuffle
    (the dedup groupBy on the 32-byte sha2 key, NULL for quality-failed
    rows) and one bounded per-(lang, source) rollup exchange — with a
    single corpus scan and NO join of any kind. A third shuffle, a
    second scan, or any join node means a stage regression (round-4
    verdict item 7; round-14 duplicated-subtree fix)."""
    plan = plan_string(_Q["pipeline_corpus_prep"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    nodes = set(re.findall(r"\((\d+)\) (BroadcastExchange|Exchange)\b", plan))
    shuffles = [n for n in nodes if n[1] == "Exchange"]
    broadcasts = [n for n in nodes if n[1] == "BroadcastExchange"]
    assert len(shuffles) == 2, plan
    assert len(broadcasts) == 0, plan
    assert len(re.findall(r"Scan parquet", tree)) == 1, plan
    assert "Join" not in tree, plan


def test_sim_cosine_topk_is_blocked_equijoin(spark, sf_dir):
    """The exact top-k baseline's pair enumeration must ride the
    blocked cell shape — no full-table broadcast cartesian
    (round-5; mirror of the dedup_embedding_cosine pin). Since round 7
    the registered engine is the GEMM cogroup: its plan must show the
    cogroup exchange on the block keys, and the retained JVM fold
    variant must still be the blocked equi-join it always was."""
    from linux_logs_spark.operators import llm_pipeline

    # Don't inspect a cached plan — and unpersist before dropping the
    # reference, or the persisted blocks stay pinned for the rest of
    # the shared test session (same dance as scripts/driver_sim.py).
    for df in llm_pipeline._topk_cache.values():
        df.unpersist()
    llm_pipeline._topk_cache.clear()
    plan = plan_string(_Q["sim_cosine_topk"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "FlatMapCoGroupsInPandas" in plan, plan

    fold_plan = plan_string(llm_pipeline._jvm_fold_topk(spark, sf_dir))
    assert "CartesianProduct" not in fold_plan, fold_plan
    assert "BroadcastNestedLoopJoin" not in fold_plan, fold_plan


def test_tpch_q7_dims_broadcast_no_cartesian(spark, sf_dir):
    """q7's scale story: the nation dims broadcast into supplier and
    customer, and the fact-fact orderkey join is an equi-join (shuffle
    or AQE-broadcast — never a cartesian/BNLJ pair explosion)."""
    plan = plan_string(_Q["tpch_q7"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_tpch_q10_star_shape(spark, sf_dir):
    plan = plan_string(_Q["tpch_q10"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "EqualTo(l_returnflag,R)" in plan, plan  # pushed to the scan


def test_tpch_q14_pushes_month_predicate(spark, sf_dir):
    plan = plan_string(_Q["tpch_q14"].fn(spark, sf_dir))
    assert "GreaterThanOrEqual(l_shipdate" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert plan.count("HashAggregate") >= 2, plan  # partial + final


def test_tpch_q15_max_compare_is_broadcast_equijoin(spark, sf_dir):
    """The rev-vs-max self-comparison must stay a broadcast equi-join
    on the revenue value — a BNLJ/cartesian here would pair every
    supplier with the scalar row through a nested loop."""
    plan = plan_string(_Q["tpch_q15"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_tpch_q18_single_lineitem_shuffle(spark, sf_dir):
    """The HAVING-filtered grouped frame carries sum_qty forward and
    is localCheckpoint'd so its exact count can size-gate the two
    broadcasts (round-7 review): lineitem's one groupBy shuffle runs
    inside the checkpoint job, so the FINAL plan has zero Exchanges —
    orders and customer ride the (gate-approved) broadcasts and the
    top-100 is TakeOrdered."""
    plan = plan_string(_Q["tpch_q18"].fn(spark, sf_dir))
    nodes = set(re.findall(r"\((\d+)\) (BroadcastExchange|Exchange)\b", plan))
    shuffles = [n for n in nodes if n[1] == "Exchange"]
    assert len(shuffles) == 0, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_tpch_q8_star_broadcasts_at_test_scale(spark, sf_dir):
    """All six dims around the lineitem fact — including the four
    size-gated corpus-proportional ones (part, supplier, orders,
    customer) — must still ride broadcasts at test scale: the gate
    falling back to shuffle here would mean broadcast_if_fits
    mis-sized a table that trivially fits."""
    plan = plan_string(_Q["tpch_q8"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 6, plan
    assert "SortMergeJoin" not in plan, plan


def test_tpch_q17_brand_prune_below_aggregate(spark, sf_dir):
    """The per-part average's input must be semi-joined with the
    broadcast brand partkey set BEFORE groupBy(l_partkey) — the
    LeftSemi BroadcastHashJoin only exists in the plan because of
    that explicit prune (Catalyst cannot derive it), and it shrinks
    the aggregate shuffle by ~|brands|× at 100 TB."""
    plan = plan_string(_Q["tpch_q17"].fn(spark, sf_dir))
    assert re.search(r"BroadcastHashJoin.*LeftSemi", plan), plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_corpus_budget_trim_prefix_sum_is_distributed(spark, sf_dir):
    """The corpus-sized running token sum must run per range
    partition (windowspec (_pid, lang | hx, doc_id) — parallel), not
    as the old partitionBy(lang)-only window whose |langs| tasks each
    sequentially scan corpus/|langs| rows at 100 TB. The remaining
    lang-partitioned window in the plan is the per-(pid, lang) offset
    frame — ≤ parts×|langs| rows, bounded by construction."""
    plan = plan_string(_Q["corpus_budget_trim"].fn(spark, sf_dir))
    assert re.search(r"windowspecdefinition\(_pid#\d+, lang#\d+, hx#", plan), plan
    assert not re.search(r"windowspecdefinition\(lang#\d+, hx#", plan), plan


def test_cust_order_intervals_one_shuffle(spark, sf_dir):
    """The lag window and the per-customer rollup share one
    hashpartitioning(o_custkey) exchange — a second shuffle means the
    groupBy stopped reusing the window's distribution."""
    plan = plan_string(_Q["cust_order_intervals"].fn(spark, sf_dir))
    nodes = set(re.findall(r"\((\d+)\) (BroadcastExchange|Exchange)\b", plan))
    shuffles = [n for n in nodes if n[1] == "Exchange"]
    assert len(shuffles) == 1, plan
    assert "Window" in plan, plan


def test_corpus_mix_rebalance_strata_cost(spark, sf_dir):
    """Mix planning aggregates to |strata| rows before anything joins:
    the 1-row target rides a broadcast and both aggs run
    partial+final."""
    plan = plan_string(_Q["corpus_mix_rebalance"].fn(spark, sf_dir))
    assert plan.count("HashAggregate") >= 4, plan
    assert "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_join_range_binned_is_equijoin_not_nested_loop(spark, sf_dir):
    """The binned range join's whole point: candidates come from a
    broadcast-hash EQUI-join on the bin id, never a nested loop over
    the |windows| x |events| pair space."""
    plan = plan_string(_Q["join_range_binned"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


# ---- round-6 additions -------------------------------------------------


def test_sim_ann_lsh_is_equijoin_not_cross(spark, sf_dir):
    """The LSH candidate join must be an equi-join on the bucket id —
    a regression reintroducing a cross/nested-loop join would silently
    revert the query to the all-pairs shape the bucketing exists to
    avoid (r5 verdict, missing #3)."""
    plan = plan_string(_Q["sim_ann_lsh"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_dedup_near_minhash_band_join_is_equijoin(spark, sf_dir):
    """The banded-LSH candidate join must be an equi-join on
    (band_id, band_hash), and shingle arrays must not ride the band
    shuffle — only ids and band hashes move (r5 verdict, missing #3)."""
    import re

    plan = plan_string(_Q["dedup_near_minhash"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # the shingle-array column is `sh`; a bare substring check would
    # false-match `band_hash#`, so require a non-word char before it
    keys = [ln for ln in plan.splitlines() if "keys" in ln.lower() and "[" in ln]
    assert keys and all(
        not re.search(r"(?<![0-9A-Za-z_])(?:sh|w)#\d", ln) for ln in keys
    ), keys


def test_shuffle_shard_single_exchange_no_global_sort(spark, sf_dir):
    """The shard export must be repartition-by-shard + sort-within:
    one hash exchange, and no rangepartitioning (a global sort would
    serialize the corpus through one ordering pass at 100 TB)."""
    plan = plan_string(_Q["shuffle_shard"].fn(spark, sf_dir))
    assert "rangepartitioning" not in plan.lower(), plan
    # formatted explain puts the node name and its hashpartitioning
    # arguments on separate lines — count Exchange NODES
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, plan
    assert "hashpartitioning(shard" in plan, plan


def test_dedup_shingle_jaccard_joins_on_hashes(spark, sf_dir):
    """The exact shingle posting join must be an equi-join on the
    8-byte xxhash64 key — no cartesian, and no shingle string in any
    join key list."""
    plan = plan_string(_Q["dedup_shingle_jaccard"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # xxhash64 keying is pinned on the pre-checkpoint posting builder
    # (see test_jaccard_pairs_shuffle_hashes_not_words); here the final
    # plan guards join strategy and key identities only.
    keys = [ln for ln in plan.splitlines() if "keys" in ln.lower() and "[" in ln]
    # the exploded posting column is `unit` since the pipeline was
    # parameterized (round-6 review: the old shingle#-only guard went
    # vacuous after the rename)
    assert keys and all(
        "shingle#" not in ln and "unit#" not in ln for ln in keys
    ), keys


def test_doc_pii_scrub_is_shuffle_free(spark, sf_dir):
    """PII staging + regexp count/replace + sha2 is a pure per-row
    projection: no exchange anywhere — the 100 TB plan is one linear
    codegen'd scan."""
    plan = plan_string(_Q["doc_pii_scrub"].fn(spark, sf_dir))
    assert "Exchange" not in plan, plan


def test_emb_quantize_is_shuffle_free_and_codegen(spark, sf_dir):
    """Quantization accounting is map-side only, and the unrolled
    per-element expressions must stay inside whole-stage codegen
    (an interpreted 128-term projection would dominate at scale)."""
    plan = plan_string(_Q["emb_quantize_int8"].fn(spark, sf_dir))
    assert "Exchange" not in plan, plan
    assert _codegen_subtrees(spark, "emb_quantize_int8", sf_dir) >= 1


def test_tpch_q8_six_broadcast_dims_no_smj(spark, sf_dir):
    """Q8's deepest star AT TEST SCALE: all six dims broadcast around
    the lineitem fact — the fact shuffles exactly once, for the
    per-year agg. The orders/customer sides are size-gated
    (broadcast_if_fits), so this pins the under-cap shape; past the
    cap those two joins legitimately shuffle."""
    plan = plan_string(_Q["tpch_q8"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 6, plan
    assert "SortMergeJoin" not in plan, plan


def test_tpch_q13_preserves_left_join(spark, sf_dir):
    """Q13's heart is the LEFT join keeping zero-order customers —
    Catalyst must not rewrite it to inner (count(o_orderkey) would
    then lose the c_count=0 cohort)."""
    plan = plan_string(_Q["tpch_q13"].fn(spark, sf_dir))
    assert "LeftOuter" in plan, plan


# ---- round-7 additions -------------------------------------------------


def test_scd2_merge_update_set_broadcasts_at_test_scale(spark, sf_dir):
    """The MERGE update set is a slice of corpus-sized customer, so it
    is size-gated (broadcast_if_fits, round-6 review) — this pins the
    under-cap shape: the left join still broadcasts the update set at
    test scale; past the cap it legitimately shuffles on the key."""
    plan = plan_string(_Q["scd2_merge"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_sim_knn_label_vote_join_broadcasts_at_test_scale(spark, sf_dir):
    """The |embeddings|-row label frame feeding the kNN vote join is
    size-gated; under the cap it must still ride a broadcast."""
    plan = plan_string(_Q["sim_knn_label"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 1, plan


def test_emb_neighborhood_purity_label_joins_broadcast(spark, sf_dir):
    """Both gated label-enrich joins (query label + neighbor label)
    must still broadcast at test scale."""
    plan = plan_string(_Q["emb_neighborhood_purity"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_stream_static_join_gate_broadcasts_at_test_scale(spark, sf_dir):
    """Mirrors stream_static_join's size gate with its batch twin —
    the SAME gate decision as production (exact checkpointed |users|
    count, round-7 review; the |events| proxy would diverge from the
    production gate past ~2M events): at test scale the |users|-row
    per-user-average frame must still broadcast into the enrich join.
    (The streaming plan itself is not inspectable pre-run; the gate
    decision is identical because it is taken batch-side, before
    readStream.)"""
    from pyspark.sql import functions as F

    from linux_logs_spark.catalog import load
    from linux_logs_spark.session import broadcast_if_fits

    ev = load(spark, sf_dir, "events")
    static_avg = (
        ev.groupBy("user_id")
        .agg(F.avg("value").alias("user_avg"))
        .localCheckpoint(eager=True)
    )
    n_users = static_avg.count()
    joined = ev.join(broadcast_if_fits(static_avg, n_users, 32), "user_id")
    plan = plan_string(joined)
    assert "BroadcastHashJoin" in plan, plan


def test_join_self_multi_customer_broadcasts_at_test_scale(spark, sf_dir):
    """customer's broadcast is size-gated (round-7); under the cap the
    star join must still run both joins as broadcasts."""
    plan = plan_string(_Q["join_self_multi"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_tpch_q7_gated_customer_still_broadcasts(spark, sf_dir):
    """q7's nation-filtered customer is size-gated; under the cap all
    four dim-enrich joins broadcast and only the fact-fact orderkey
    join (plus aggs) shuffles."""
    plan = plan_string(_Q["tpch_q7"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4, plan


def test_text_tfidf_df_broadcasts_at_test_scale(spark, sf_dir):
    """The vocab-sized df frame is size-gated on an exact checkpointed
    count; under the cap the word join must still broadcast. Round 14:
    n_docs comes from the parquet footer, so the plan must hold exactly
    ONE documents scan (the token explode) and no nested-loop join —
    the old 1-row count(*) scalar cost a second full scan + BNLJ."""
    plan = plan_string(_Q["text_tfidf"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 1, plan
    tree = plan.split("\n\n")[0]
    assert len(re.findall(r"Scan parquet", tree)) == 1, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_scan_apache_log_is_shuffle_free(spark, sf_dir):
    """Parse plans must stay embarrassingly parallel: text scan →
    regexp projections, zero exchanges."""
    plan = plan_string(_Q["scan_apache_log"].fn(spark, sf_dir))
    assert "Exchange" not in plan, plan


def test_corpus_budget_trim_shuffle_budget(spark, sf_dir):
    """Post-checkpoint exchange budget (the range repartition runs
    inside the checkpoint job): one (_pid, lang) exchange feeds the
    big per-partition window, and the two offset-side exchanges
    operate on the ≤ parts×|langs|-row aggregate — never more."""
    plan = plan_string(_Q["corpus_budget_trim"].fn(spark, sf_dir))
    nodes = set(re.findall(r"\((\d+)\) (BroadcastExchange|Exchange)\b", plan))
    shuffles = [n for n in nodes if n[1] == "Exchange"]
    assert len(shuffles) <= 3, plan


def test_table_time_travel_diff_broadcasts_at_test_scale(spark, sf_dir):
    """The as-of diff's v2 side is size-gated; under the cap it rides
    a broadcast (past the cap the diff shuffles on the key)."""
    plan = plan_string(_Q["table_time_travel"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 1, plan


def test_text_perplexity_two_aggregate_skeleton(spark, sf_dir):
    """Same two-shuffle skeleton as text_tfidf: per-(doc,word) tf agg
    and the per-doc reduction; the vocab join broadcasts under the
    cap and the 1-row total crossJoins as a broadcast scalar — no
    cartesian, no vocab shuffle at test scale."""
    plan = plan_string(_Q["text_perplexity"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 1, plan


def test_q_lateral_topk_decorrelates_to_window(spark, sf_dir):
    """The correlated LATERAL + LIMIT must decorrelate into a
    partitioned rank-filter (one shuffle of orders by custkey), never
    a per-outer-row re-execution or a cartesian — that decorrelation
    is the whole 100 TB argument in the query's docstring."""
    plan = plan_string(_Q["q_lateral_topk"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Window" in plan, plan


def test_agg_bitmap_distinct_no_expand(spark, sf_dir):
    """The bitmap form's reason to exist: countDistinct plans an
    Expand (row duplication per distinct agg) and shuffles raw keys;
    the bitmap pipeline must shuffle only per-bucket bitmaps through
    ordinary partial-merge hash aggregates — no Expand anywhere."""
    plan = plan_string(_Q["agg_bitmap_distinct"].fn(spark, sf_dir))
    assert "Expand" not in plan, plan
    # two-level: (grp, bucket) agg then grp agg -> exactly 2 exchanges
    import re as _re

    nodes = set(_re.findall(r"\((\d+)\) Exchange\b", plan))
    assert len(nodes) == 2, plan


def test_optimize_compact_file_counts(spark, sf_dir):
    """table_optimize_compact's invariant: the staged fragmented table
    has (close to) one file per write task and the compacted rewrite
    has exactly ceil(rows / 50k) files — at test scale, ONE."""
    import glob
    import os

    from linux_logs_spark.operators.scans import _scratch

    _Q["table_optimize_compact"].fn(spark, sf_dir).collect()
    frag = glob.glob(os.path.join(_scratch(sf_dir, "docs_fragmented"), "*.parquet"))
    comp = glob.glob(os.path.join(_scratch(sf_dir, "docs_compacted"), "*.parquet"))
    assert len(frag) > 1, frag  # genuinely fragmented input
    assert len(comp) == 1, comp  # sf<=0.1 rows < 50k -> one file
    assert len(comp) < len(frag)


def test_q_recursive_cte_plans_union_loop(spark, sf_dir):
    """WITH RECURSIVE must plan as Spark 4's UnionLoop executor (the
    iterate-until-empty-frontier operator) over the pre-built edge
    relation — no cartesian, and NO fact-table scan anywhere in the
    recursive query's plan: the edge build is localCheckpoint'd
    before view registration, so the loop joins a materialized
    relation. (Round-7 review: a lazy view put the events scan + both
    windows INSIDE the loop branch, re-executing per step while this
    test's docstring claimed otherwise — now asserted.)"""
    plan = plan_string(_Q["q_recursive_cte"].fn(spark, sf_dir))
    assert "UnionLoop" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the checkpointed edge relation means the recursion's plan holds
    # no parquet scan and no window re-computation at all
    assert "parquet" not in plan.lower(), plan
    assert "Window" not in plan, plan


def test_synthlog_pushdown_prunes_partitions():
    """The Python DataSource's pushFilters must narrow the planned key
    range (partition pruning at the source) and hand every unsupported
    predicate back to Spark — accepting one it can't honor would drop
    rows silently."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        LessThan,
        StringStartsWith,
    )

    from linux_logs_spark.sources.synthetic import SynthLogReader

    r = SynthLogReader({"n": "20000", "parts": "8"})
    unsupported = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("row_id",), 5000),
                LessThan(("row_id",), 15000),
                StringStartsWith(("host",), "host-0"),  # not range algebra
                EqualTo(("severity",), "info"),  # wrong column
            ]
        )
    )
    assert (r.lo, r.hi) == (5000, 15000)
    assert len(unsupported) == 2, unsupported
    parts = r.partitions()
    assert len(parts) == 8
    assert parts[0].start == 5000 and parts[-1].end == 15000
    assert sum(p.end - p.start for p in parts) == 10000


def test_synthlog_empty_range_yields_no_rows(spark):
    """A filter that empties the range still plans (>=1 partition) and
    returns zero rows — the degenerate slice must not crash."""
    from linux_logs_spark.sources.synthetic import register_synthlog

    register_synthlog(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = (
        spark.read.format("synthlog")
        .option("n", "100")
        .load()
        .filter("row_id >= 200")
    )
    assert df.count() == 0


def test_state_reader_warm_checkpoint_stable(spark, sf_dir):
    """Second invocation reuses the committed checkpoint (availableNow
    with no new files commits nothing) and must read back the same
    state — the inspect-without-replay property the source exists for."""
    fn = _Q["stream_state_reader"].fn
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_synthlog_stream_replay_matches_read():
    """readBetweenOffsets (failure replay) must reproduce exactly the
    rows the read() chain emitted for the same offset span — the
    exactly-once contract of the streaming source."""
    from linux_logs_spark.sources.synthetic import SynthLogStreamReader

    r = SynthLogStreamReader({"n": "100", "batch": "32"})
    off = r.initialOffset()
    chained = []
    while off["pos"] < 100:
        rows, off = r.read(off)
        chained.extend(rows)
    assert len(chained) == 100
    assert chained == r.readBetweenOffsets({"pos": 0}, {"pos": 100})


def test_rollup_incremental_reuses_materialized_base(spark, sf_dir):
    """Second refresh must REUSE the persisted closed-hours rollup —
    same rows, no rewrite (the _SUCCESS marker's mtime is the witness).
    This is the property that makes the refresh O(delta), not O(log)."""
    import glob
    import os

    from linux_logs_spark.operators.scans import _scratch

    fn = _Q["log_rollup_incremental"].fn
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    # scope to THIS sf_dir's scratch tag — other scale factors stage
    # their own rollups under their own tags
    markers = glob.glob(
        os.path.join(_scratch(sf_dir, "rollup_hourly"), "*", "_SUCCESS")
    )
    assert len(markers) == 1, markers
    mtime_first = os.stat(markers[0]).st_mtime_ns
    b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert a == b and len(a) > 0
    assert os.stat(markers[0]).st_mtime_ns == mtime_first, "base was rewritten"
    # the refresh's delta scan must push the cutoff predicate into the
    # parquet scan (row-group pruning — the O(delta) claim's witness);
    # the cutoff itself comes from footer stats, zero jobs
    plan = plan_string(fn(spark, sf_dir))
    pushed = [
        ln for ln in plan.splitlines()
        if "PushedFilters" in ln and "GreaterThanOrEqual(ts" in ln
    ]
    assert pushed, plan


def test_dq_expectations_single_scan_and_gated_join(spark, sf_dir):
    """The three single-table checks share ONE aggregate scan of orders
    (two orders scans total: agg + FK anti-join) and the FK check's
    customer side broadcasts at test scale."""
    plan = plan_string(_Q["dq_expectations"].fn(spark, sf_dir))
    assert plan.count("orders.parquet") == 2, plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_rebalanced_sink_plans_rebalance_exchange(spark, sf_dir):
    """The hinted pre-write frame must carry an AQE-managed rebalance
    exchange (REBALANCE_PARTITIONS_BY_COL) — without it the partitioned
    write degenerates to one file per (task, key) pair. Pins the
    OPERATOR'S OWN shared frame, not an inline rebuild (an inline copy
    would stay green if the operator dropped the hint)."""
    from linux_logs_spark.operators.scans import _rebalanced_events

    plan = plan_string(_rebalanced_events(spark, sf_dir))
    assert "REBALANCE_PARTITIONS_BY_COL" in plan, plan


def test_join_partition_pruned_injects_dpp(spark, sf_dir):
    """The fact scan must carry a dynamicpruningexpression partition
    filter (runtime dt-set injection from the dim subquery) and NO
    static dt predicate — static pushdown can't see through the dim's
    non-join-column filter, which is the point of the query."""
    plan = plan_string(_Q["join_partition_pruned"].fn(spark, sf_dir))
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("dynamicpruningexpression" in ln for ln in pf), plan
    # and genuinely NO static dt predicate — if one appears, the dim
    # filter has leaked onto the join column and DPP is no longer
    # doing the work this query exists to demonstrate
    # a STATIC predicate renders as `dt#N = <literal>` or `dt#N IN (…)`;
    # the runtime one renders as `dt#N IN dynamicpruning#M` — only the
    # literal forms are forbidden
    assert not any(re.search(r"dt#\d+ (= |IN \()", ln) for ln in pf), pf


def test_bloom_runtime_filter_in_plan(spark, sf_dir):
    """join_bloom_runtime_filter must carry BOTH halves of the runtime
    filter: the bloom_filter_agg build over the selective orders side
    and the might_contain semi-filter applied to the lineitem scan side
    BEFORE the join — the row-level pruning the operator exists to
    demonstrate. Checked on the operator's own frame (isolated
    newSession confs included), not a rebuild."""
    from linux_logs_spark.plans.explain import plan_string

    df = _Q["join_bloom_runtime_filter"].fn(spark, sf_dir)
    plan = plan_string(df).lower()
    assert "bloom_filter_agg" in plan, plan[:2000]
    assert "might_contain" in plan, plan[:2000]
    # and the join really is a shuffle join there (no broadcast): the
    # bloom filter is pointless under BHJ and Spark won't inject it
    assert "broadcasthashjoin" not in plan, plan[:2000]


def test_q19_disjunct_pushdown_both_scans(spark, sf_dir):
    """tpch_q19's OR-of-conjuncts predicate must split: each side's
    single-table conjuncts reach that side's parquet scan as
    PushedFilters (p_brand/p_size on part, l_quantity on lineitem) —
    Catalyst's CNF extraction, the optimizer shape this query
    exercises. A plan that evaluates the whole disjunction post-join
    scans both tables in full."""
    from linux_logs_spark.plans.explain import plan_string

    plan = plan_string(_Q["tpch_q19"].fn(spark, sf_dir))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("p_brand" in ln for ln in pushed), pushed
    assert any("l_quantity" in ln for ln in pushed), pushed


def test_partition_evolution_prunes_both_specs(spark, sf_dir):
    """table_partition_evolution's promise: each generation prunes by
    ITS OWN partition spec — the old layout by event_type directory,
    the evolved layout by dt range — in one plan."""
    from linux_logs_spark.plans.explain import plan_string

    plan = plan_string(_Q["table_partition_evolution"].fn(spark, sf_dir))
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("event_type" in ln and "error" in ln for ln in pf), pf
    assert any("dt" in ln and "2024-01-11" in ln for ln in pf), pf


def test_copurchase_counts_cached_across_sessions(spark, sf_dir):
    """The graph family's shared edge build is memoized per
    (applicationId, sf_dir, lineitem fingerprint): repeated calls —
    including from newSession() clones, the driver's per-query
    pattern — return the SAME checkpointed frame, and the cache holds
    one corpus at a time."""
    from linux_logs_spark.operators import warehouse as wh

    a = wh._copurchase_counts(spark, sf_dir)
    b = wh._copurchase_counts(spark, sf_dir)
    assert a is b
    c = wh._copurchase_counts(spark.newSession(), sf_dir)
    assert a is c
    assert len(wh._COPURCHASE_CACHE) == 1
    # sanity: the cached frame is the basket pair-count shape
    assert set(a.columns) == {"part_a", "part_b", "n_orders"}


def test_freq_items_sketch_stays_jvm_side_with_partial_agg(spark, sf_dir):
    """agg_freq_items_sketch's scale claim, pinned physically: the
    whole plan is JVM-side (no Python evaluation operator of any
    kind — the first cut's applyInPandas shuffled raw events, caught
    by the 10× rehearsal at 21 MB) and the count aggregate is
    map-side combined (partial_count before the exchange), so the
    shuffle carries distinct (day, shard, item) combos, never
    events."""
    # The summaries stage sits behind a shared localCheckpoint since
    # round 14 (the kept⋈bound + tot_min consumers re-ran the whole
    # scan→agg→window pipeline 4×), which truncates the visible plan —
    # pin the pipeline on the pre-checkpoint builder, and the no-Python
    # claim on the final plan too.
    from linux_logs_spark.operators.log_analytics import _ss_summaries

    py_ops = ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas",
              "MapInPandas", "PythonMapInArrow")
    plan = plan_string(_ss_summaries(spark, sf_dir))
    for py_op in py_ops:
        assert py_op not in plan, py_op
    assert "partial_count" in plan, plan
    final = plan_string(_Q["agg_freq_items_sketch"].fn(spark, sf_dir))
    for py_op in py_ops:
        assert py_op not in final, py_op


def test_matryoshka_pair_join_is_blocked_equi(spark, sf_dir):
    """emb_matryoshka_truncate's pair join must plan as an EQUI join
    on the block-cell id with ia < ib as residual — never a
    BroadcastNestedLoopJoin shipping an ungated sample side and never
    a cartesian (round-8 advice, fixed round 9)."""
    plan = plan_string(_Q["emb_matryoshka_truncate"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_kmeans_assignment_is_data_not_code(spark, sf_dir):
    """emb_kmeans_lloyd's assignment ships centroids as a literal
    ARRAY under array_min(transform(...)) — O(1) codegen size in K
    (the unrolled least() form spent most of its wall in janino
    compile and blows the 64 KB method limit past K≈16)."""
    plan = plan_string(_Q["emb_kmeans_lloyd"].fn(spark, sf_dir))
    assert "array_min(transform(" in plan, plan[:2000]
    assert "least(" not in plan, plan[:2000]


# ---- round-12: bounded-unpartitioned-window audit ----------------------
#
# An unpartitioned Window moves ALL rows to one task — fine over a
# bounded post-aggregate frame (|langs| rows, K centroids, 24×7 cells),
# a genuine 100 TB scale-killer over a corpus-sized frame. The bench
# tail's recurring `WindowExec: No Partition Defined` warnings all come
# from the bounded kind (spot-checked in rounds 9-11), but nothing
# pinned that invariant — a new global window over raw documents would
# have slipped through silently (round-11 verdict item 7). This audit
# enumerates every unpartitioned window in the full registered surface
# and fails on any site not explicitly whitelisted below with its
# boundedness argument.

# query name -> justification that every unpartitioned window in its
# plan runs over a BOUNDED frame (rows independent of corpus size, or
# growing only with a capped aggregate's group count). Discovered by
# walking all 229 batch queries' optimized plans (round 12): exactly
# these six have an unpartitioned Window node.
_UNPARTITIONED_WINDOW_OK: dict[str, str] = {
    "agg_freq_items_sketch": (
        "row_number over the merged sketch output — ≤ sketch-width × "
        "|days| rows by construction, corpus-size-free"
    ),
    "cust_rfm_segments": (
        "cumsum over the ≤|range-partitions|-row pid-counts frame (the "
        "bounded offsets step of the distributed ntile; the main ranking "
        "windows are partitioned by _pid and separately pinned by "
        "test_cust_rfm_has_no_single_partition_window)"
    ),
    "log_burst_detect": (
        "trailing-frame stats over the per-minute count frame — rows "
        "bounded by the time span in minutes, not by event volume"
    ),
    "log_slo_burn": (
        "rolling burn rate over the per-hour SLO frame — rows bounded "
        "by the time span in hours"
    ),
    "log_top_services": (
        "noise_rank over the TakeOrderedAndProject 10-row top-k result "
        "(the |users|-sized rank is explicitly NOT a window — see the "
        "operator docstring)"
    ),
    "vocab_build": (
        "token_id over the VOCAB_SIZE-row limit output — the corpus-"
        "sized count aggregate happens before the limit"
    ),
}


def _unpartitioned_windows(df) -> list[str]:
    """simpleStrings of logical Window nodes with an EMPTY partition
    spec, walked over the optimized logical plan (logical, not
    physical: AQE wraps the physical tree and hides children)."""
    out: list[str] = []

    def walk(node):
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
        ):
            out.append(node.simpleString(80))
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return out


def test_unpartitioned_window_helper_catches_global_window(spark, sf_dir):
    """Negative control: a deliberately-global window over the
    corpus-sized documents table MUST be flagged — if the walker goes
    blind (node class renamed, plan shape changed), the audit below
    degrades to vacuously green and this canary fails first."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    bad = docs.withColumn("rn", F.row_number().over(W.orderBy("doc_id")))
    assert _unpartitioned_windows(bad), "walker missed a global window"
    good = docs.withColumn(
        "rn", F.row_number().over(W.partitionBy("lang").orderBy("doc_id"))
    )
    assert not _unpartitioned_windows(good)


def test_registered_surface_has_only_whitelisted_unpartitioned_windows(
    spark, sf_dir
):
    """Walk EVERY batch query's optimized plan; any unpartitioned
    window must appear in _UNPARTITIONED_WINDOW_OK with a boundedness
    justification. Streaming queries are excluded: building them runs
    real micro-batch streams (minutes of wall for zero new plan
    surface — their windows are watermarked groupBys, not Window
    nodes), and their result frames are bounded sink outputs."""
    from linux_logs_spark.registry import all_queries

    offenders: dict[str, list[str]] = {}
    for name, spec in sorted(all_queries().items()):
        if spec.category == "streaming":
            continue
        wins = _unpartitioned_windows(spec.fn(spark, sf_dir))
        if wins and name not in _UNPARTITIONED_WINDOW_OK:
            offenders[name] = wins
    assert not offenders, (
        "unpartitioned windows outside the whitelist — each one moves "
        f"its whole input to a single task: {offenders}"
    )
    stale = sorted(set(_UNPARTITIONED_WINDOW_OK) - set(all_queries()))
    assert not stale, f"whitelist names unknown queries: {stale}"


# ---- round-15 additions ------------------------------------------------


def test_spread_ingest_committed_sf_plans_unchanged(spark, sf_dir):
    """Round-15 canary (round-14 verdict item 6): spread_ingest(df,
    n_rows) sizes its round-robin exchange from the parquet-footer row
    count via scaled_partitions, which must return EXACTLY
    default_parallelism() below 250k rows/core — so every committed-SF
    plan stays byte-identical to the fixed-core-count shape while the
    rehearsal tiers scale up (the 50M-doc leg where a fixed 32-way
    spread blew the partial-agg combine: scale_rehearsal.json
    pipeline_perplexity_gate 10000x_true = 46.3 GB shuffle post-fix vs
    the 90+ GB blow-up). Pins both the function contract and the
    physical exchange width of the biggest spread_ingest consumer."""
    from linux_logs_spark.session import default_parallelism, scaled_partitions

    cores = default_parallelism()
    # committed SFs: documents ≤ 5000 rows — far below the gate
    assert scaled_partitions(5_000) == cores
    assert scaled_partitions(250_000 * cores) == cores
    # the scale-adaptive side the canary must NOT flatten
    assert scaled_partitions(50_000_000) == 50_000_000 // 250_000
    plan = plan_string(_Q["dedup_shingle_jaccard"].fn(spark, sf_dir))
    m = re.search(r"RoundRobinPartitioning\((\d+)\)", plan)
    assert m and int(m.group(1)) == cores, plan
