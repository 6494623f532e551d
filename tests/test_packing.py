"""pack_sequences_ffd evidence (it registers with no SQL oracle — a
sequential per-group algorithm): EXACT equality against an independent
single-process FFD over the same inputs (the bpe_train_merges
pattern), plus the measured fill-efficiency claim vs closing bins in
arrival order.
"""

from __future__ import annotations

import os

import duckdb

from linux_logs_spark.operators.training_data import PACK_BUDGET
from linux_logs_spark.registry import all_queries


def _reference_ffd(rows):
    """Independent FFD: rows = [(source, doc_id, n_tokens)]; returns
    {(source, doc_id): (bin_id, oversize)}. Written against the
    textbook algorithm, not the operator's code."""
    from collections import defaultdict

    by_src = defaultdict(list)
    for src, doc, n in rows:
        by_src[src].append((doc, n))
    out = {}
    for src, docs in by_src.items():
        docs.sort(key=lambda t: (-t[1], t[0]))
        bins = []
        for doc, n in docs:
            if n > PACK_BUDGET:
                bins.append(0)
                out[(src, doc)] = (len(bins) - 1, True)
                continue
            for i in range(len(bins)):
                if n <= bins[i]:
                    bins[i] -= n
                    out[(src, doc)] = (i, False)
                    break
            else:
                bins.append(PACK_BUDGET - n)
                out[(src, doc)] = (len(bins) - 1, False)
    return out


def _token_rows(sf_dir):
    con = duckdb.connect()
    return con.execute(
        "SELECT source, doc_id, len(string_split(text, ' ')) "
        f"FROM '{os.path.join(sf_dir, 'documents.parquet')}'"
    ).fetchall()


def test_ffd_matches_single_process_reference(spark, sf_dir):
    got = {
        (r["source"], r["doc_id"]): (r["bin_id"], r["oversize"])
        for r in all_queries()["pack_sequences_ffd"]
        .fn(spark, sf_dir)
        .collect()
    }
    want = _reference_ffd(_token_rows(sf_dir))
    assert got == want


def test_ffd_fill_beats_arrival_order(spark, sf_dir):
    """FFD's reason to exist: fewer bins (higher fill) than the naive
    policy that packs docs in arrival order and closes a bin as soon
    as the next doc doesn't fit. Both policies never split docs, so
    bins-used is the comparable cost."""
    from collections import defaultdict

    rows = _token_rows(sf_dir)
    ffd_bins = defaultdict(set)
    for (src, doc), (b, _) in _reference_ffd(rows).items():
        ffd_bins[src].add(b)

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
