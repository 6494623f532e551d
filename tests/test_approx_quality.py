"""Error-bound gates for the approximate-aggregate rows-only queries.

tests/test_ann_quality.py does this for the ANN/minhash/simhash
family; this file closes the same gap for the sketch aggregates,
the PCA iteration, and streaming dedup — each rows-only query gets a
measured relationship to exact ground truth, so "ran clean" is backed
by "within the error bound the sketch advertises" (round 6).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from linux_logs_spark.catalog import load
from linux_logs_spark.registry import all_queries

_Q = all_queries()


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    """approx_count_distinct runs with rsd=0.02; HLL++ error is
    gaussian-ish around that, so 5× rsd is a generous, flake-free
    regression gate per group."""
    for r in _Q["agg_approx_distinct"].fn(spark, sf_dir).collect():
        rel = abs(r["approx_parts"] - r["exact_parts"]) / max(r["exact_parts"], 1)
        assert rel <= 0.10, f"{r['l_returnflag']}: rel err {rel:.4f}"


def test_approx_percentile_within_rank_tolerance(spark, sf_dir):
    """approx_percentile(accuracy=10000) guarantees a rank error of at
    most n/accuracy; assert the reported p50 sits between the exact
    p45 and p55 values per group — a rank-space bound, robust to value
    distribution."""
    li = load(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: (r["lo"], r["hi"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.45)).alias("lo"),
            F.percentile("l_extendedprice", F.lit(0.55)).alias("hi"),
        )
        .collect()
    }
    for r in _Q["agg_approx_percentile"].fn(spark, sf_dir).collect():
        lo, hi = exact[r["l_returnflag"]]
        assert lo <= r["approx_p50"] <= hi, (
            f"{r['l_returnflag']}: p50 {r['approx_p50']} outside [{lo}, {hi}]"
        )


def test_hll_sketch_rollup_matches_exact_distinct(spark, sf_dir):
    """The merged per-type sketch estimate must sit within HLL(lgK=12)
    error (~1.6% rsd; gate at 5×) of the EXACT per-type distinct-user
    count — the property that makes storing daily sketches instead of
    raw events sound."""
    e = load(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in _Q["agg_hll_sketch_rollup"].fn(spark, sf_dir).collect():
        rel = abs(r["est_users"] - exact[r["event_type"]]) / max(
            exact[r["event_type"]], 1
        )
        assert rel <= 0.08, f"{r['event_type']}: rel err {rel:.4f}"


def test_pca_power_matches_numpy_eigh(spark, sf_dir):
    """emb_pca_power's distributed gramian + driver eigh must agree
    with a single-process numpy eigh over the same embeddings: the
    leading components' |cosine| ≈ 1 (sign handled by the query's own
    normalization) and the explained-variance share matches."""
    import numpy as np

    X = np.array(
        [
            r["embedding"]
            for r in load(spark, sf_dir, "embeddings").select("embedding").collect()
        ],
        dtype=np.float64,
    )
    _, vecs = np.linalg.eigh(X.T @ X)
    ref = vecs[:, -1]
    out = _Q["emb_pca_power"].fn(spark, sf_dir).toPandas().sort_values("dim")
    lead = out["loading"].to_numpy()
    cos = abs(float(np.dot(ref, lead)) / (np.linalg.norm(ref) * np.linalg.norm(lead)))
    assert cos > 0.9999, f"|cosine| to numpy eigh component = {cos:.6f}"


def test_stream_dedup_keeps_exactly_one_row_per_key(spark, sf_dir):
    """stream_dedup emits exactly one row per distinct key (the
    keys-only graduation contract, round 8 — the kept row's non-key
    columns were arrival-order-dependent, so they left the output)."""
    e = load(spark, sf_dir, "events")
    n_keys = e.select("user_id", "event_type").distinct().count()
    out = _Q["stream_dedup"].fn(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == n_keys
    assert len({(r["user_id"], r["event_type"]) for r in rows}) == n_keys


def test_scan_binary_files_digests_match_hashlib(spark, sf_dir):
    """scan_binary_files is rows-only because the oracle contract has
    no filesystem view — but the digests ARE independently checkable:
    recompute each file's sha256 and byte length with python hashlib
    over the same directory and require exact agreement."""
    import glob
    import hashlib
    import os

    expected = {}
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        blob = open(p, "rb").read()
        expected[os.path.basename(p)] = (len(blob), hashlib.sha256(blob).hexdigest())
    rows = _Q["scan_binary_files"].fn(spark, sf_dir).collect()
    assert len(rows) == len(expected)
    for r in rows:
        n, digest = expected[r["file_name"]]
        assert (r["n_bytes"], r["sha256"]) == (n, digest), r["file_name"]


def test_scan_csv_malformed_quarantine_counts_exact(spark, sf_dir):
    """The staged dirty CSV carries exactly 50 clean rows and 3
    deliberately broken ones; the quarantine accounting must see
    precisely that split — every input byte accounted for."""
    got = {r["category"]: r for r in _Q["scan_csv_malformed"].fn(spark, sf_dir).collect()}
    assert set(got) == {"clean", "quarantined"}
    assert (got["clean"]["n"], got["clean"]["n_complete"]) == (50, 50)
    # 3 quarantined: the wrong-arity row still parses its 3 leading
    # fields (complete=1); the bad-long and garbage rows do not
    assert got["quarantined"]["n"] == 3
    assert got["quarantined"]["n_complete"] < 3


def test_freq_items_sketch_bounds_and_heavy_hitter_recall(spark, sf_dir):
    """agg_freq_items_sketch (mergeable Space-Saving): (a) for every
    reported item the EXACT count lies inside the sketch's own
    [est - max_over, est + max_under] interval — the per-item bound
    the summary merge advertises; (b) every item whose true count
    exceeds the Σ N_summary / M detection threshold is reported —
    the Space-Saving heavy-hitter guarantee, surviving the merge;
    (c) the report is deterministic across runs (sorted stream +
    keyed tie-breaks)."""
    from linux_logs_spark.operators.log_analytics import SS_CAPACITY

    got = _Q["agg_freq_items_sketch"].fn(spark, sf_dir).collect()
    e = load(spark, sf_dir, "events")
    exact = {
        r["item"]: r["n"]
        for r in e.selectExpr("cast(user_id as string) AS item")
        .groupBy("item")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in got:
        true = exact.get(r["item"], 0)
        lo, hi = r["est"] - r["max_over"], r["est"] + r["max_under"]
        assert lo <= true <= hi, (r["item"], true, lo, hi)

    # detection threshold: any item with true count > Σ_d N_d / M is
    # guaranteed tracked in every summary its mass lands in; sum the
    # per-(day)-stream sizes (shards=1 at fixture scale)
    per_day_n = (
        e.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    threshold = sum(r["n"] for r in per_day_n) / SS_CAPACITY
    reported = {r["item"] for r in got}
    missed = {
        it for it, n in exact.items() if n > threshold and it not in reported
    }
    assert not missed, (threshold, missed)

    again = _Q["agg_freq_items_sketch"].fn(spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]


def test_freq_items_sketch_bounds_hold_under_eviction(spark, sf_dir, monkeypatch):
    """At fixture scale the corpus has fewer users than SS_CAPACITY,
    so the summaries never evict; shrink M below |users| to force
    real evictions and re-pin the per-item interval — the case where
    Space-Saving actually approximates."""
    from linux_logs_spark.operators import log_analytics as la

    monkeypatch.setattr(la, "SS_CAPACITY", 8)
    got = _Q["agg_freq_items_sketch"].fn(spark, sf_dir).collect()
    e = load(spark, sf_dir, "events")
    exact = {
        r["item"]: r["n"]
        for r in e.selectExpr("cast(user_id as string) AS item")
        .groupBy("item")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert len(exact) > 8  # evictions actually occurred
    nontrivial = 0
    for r in got:
        true = exact.get(r["item"], 0)
        lo, hi = r["est"] - r["max_over"], r["est"] + r["max_under"]
        assert lo <= true <= hi, (r["item"], true, lo, hi)
        nontrivial += int(r["max_over"] > 0 or r["max_under"] > 0)
    assert nontrivial > 0  # the bounds were genuinely approximate


def test_scan_csv_malformed_survives_pruning_consumers(spark, sf_dir):
    """df.count() on the returned frame prunes the agg outputs down to
    the corrupt-derived groupBy key — which used to trip Spark's
    corrupt-record-only-projection check on the raw CSV relation
    (AnalysisException UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN;
    found by the round-9 rows-only hostile sweep — the driver's
    collect() never prunes, so full sweeps missed it). The checkpoint
    barrier must keep every consumer shape working."""
    df = _Q["scan_csv_malformed"].fn(spark, sf_dir)
    assert df.count() == 2                       # the pruning consumer
    assert df.select("category").distinct().count() == 2  # key-only projection
    got = {r["category"]: (r["n"], r["n_complete"]) for r in df.collect()}
    assert got == {"clean": (50, 50), "quarantined": (3, 1)}
