"""pack_sequences_ffd evidence (it registers with no SQL oracle — a
sequential per-group algorithm): EXACT equality against an independent
single-process FFD over the same inputs (the bpe_train_merges
pattern), plus the measured fill-efficiency claim vs closing bins in
arrival order, plus the (source, shard) scale grain: the shard count
grows with the corpus, each shard packs independently and exactly,
and the group count exceeds |sources| once the corpus outgrows one
shard (the round-8 verdict's per-source-funnel fix).
"""

from __future__ import annotations

import hashlib
import os

import duckdb

from linux_logs_spark.operators import training_data
from linux_logs_spark.operators.training_data import PACK_BUDGET
from linux_logs_spark.registry import all_queries


def _shard_of(doc_id: int, n_shards: int) -> int:
    """Independent replica of the operator's md5-prefix shard key."""
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    return int(h[:8], 16) % n_shards


def _reference_ffd(rows, n_shards: int):
    """Independent FFD: rows = [(source, doc_id, n_tokens)]; returns
    {(source, shard, doc_id): (bin_id, oversize)}. Written against
    the textbook algorithm, not the operator's code."""
    from collections import defaultdict

    by_grp = defaultdict(list)
    for src, doc, n in rows:
        by_grp[(src, _shard_of(int(doc), n_shards))].append((doc, n))
    out = {}
    for (src, shard), docs in by_grp.items():
        docs.sort(key=lambda t: (-t[1], t[0]))
        bins = []
        for doc, n in docs:
            if n > PACK_BUDGET:
                bins.append(0)
                out[(src, shard, doc)] = (len(bins) - 1, True)
                continue
            for i in range(len(bins)):
                if n <= bins[i]:
                    bins[i] -= n
                    out[(src, shard, doc)] = (i, False)
                    break
            else:
                bins.append(PACK_BUDGET - n)
                out[(src, shard, doc)] = (len(bins) - 1, False)
    return out


def _token_rows(sf_dir):
    con = duckdb.connect()
    return con.execute(
        "SELECT source, doc_id, len(string_split(text, ' ')) "
        f"FROM '{os.path.join(sf_dir, 'documents.parquet')}'"
    ).fetchall()


def _collect_assignment(spark, sf_dir):
    return {
        (r["source"], r["shard"], r["doc_id"]): (r["bin_id"], r["oversize"])
        for r in all_queries()["pack_sequences_ffd"].fn(spark, sf_dir).collect()
    }


def test_ffd_matches_single_process_reference(spark, sf_dir):
    got = _collect_assignment(spark, sf_dir)
    n_shards = max(
        1, len(_token_rows(sf_dir)) // training_data.PACK_FFD_TARGET_DOCS
    )
    want = _reference_ffd(_token_rows(sf_dir), n_shards)
    assert got == want


def test_ffd_sharded_grain_matches_and_fans_out(spark, sf_dir, monkeypatch):
    """The 100 TB grain, exercised at test scale: shrink TARGET_DOCS
    so the fixture corpus spans multiple shards, then pin (a) every
    (source, shard) group still packs EXACTLY like the independent
    single-process FFD on that shard's docs, and (b) the group count
    strictly exceeds |sources| — the funnel is gone."""
    monkeypatch.setattr(training_data, "PACK_FFD_TARGET_DOCS", 100)
    rows = _token_rows(sf_dir)
    n_shards = max(1, len(rows) // 100)
    assert n_shards > 1  # the fixture must actually exercise the grain

    got = _collect_assignment(spark, sf_dir)
    want = _reference_ffd(rows, n_shards)
    assert got == want

    groups = {(src, shard) for (src, shard, _d) in got}
    n_sources = len({src for src, _d, _n in rows})
    assert len(groups) > n_sources, (len(groups), n_sources)
    # shards are balanced enough that more than one is populated
    assert len({shard for _s, shard in groups}) == n_shards


def test_ffd_fill_beats_arrival_order(spark, sf_dir):
    """FFD's reason to exist: fewer bins (higher fill) than the naive
    policy that packs docs in arrival order and closes a bin as soon
    as the next doc doesn't fit. Both policies never split docs, so
    bins-used is the comparable cost. (n_shards=1 at fixture scale,
    so sharding doesn't blur the comparison.)"""
    from collections import defaultdict

    rows = _token_rows(sf_dir)
    ffd_bins = defaultdict(set)
    for (src, shard, doc), (b, _) in _reference_ffd(rows, 1).items():
        ffd_bins[(src, shard)].add(b)

    naive_bins = defaultdict(int)
    rem = {}
    for src, doc, n in sorted(rows, key=lambda t: (t[0], t[1])):
        n = int(n)
        if n > PACK_BUDGET:
            naive_bins[src] += 1
            continue
        if src not in rem or n > rem[src]:
            naive_bins[src] += 1
            rem[src] = PACK_BUDGET
        rem[src] -= n

    total_ffd = sum(len(v) for v in ffd_bins.values())
    total_naive = sum(naive_bins.values())
    assert total_ffd <= total_naive, (total_ffd, total_naive)
    # and strictly better overall on this corpus (measured, not assumed)
    assert total_ffd < total_naive, (total_ffd, total_naive)
