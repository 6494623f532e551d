"""bpe_train_merges exact pin vs an independent single-process BPE.

The query is rows-only (iterative argmax loop — no SQL oracle), so
correctness evidence is this test: a from-scratch pure-Python BPE
trainer over the same corpus (word counts via DuckDB, not Spark) must
produce EXACTLY the same merge list — same pairs, same order, same
counts. Both sides share only the algorithm definition (greedy
left-to-right application, ties (count desc, left, right)), none of
the code.
"""

from __future__ import annotations

from collections import Counter

import duckdb

from linux_logs_spark.catalog import table_path
from linux_logs_spark.registry import all_queries
from linux_logs_spark.operators.training_data import N_BPE_MERGES


def _reference_bpe(sf_dir: str, k: int) -> list[tuple[int, str, str, int]]:
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT word, count(*) AS freq FROM (
          SELECT unnest(string_split(text, ' ')) AS word
          FROM read_parquet('{table_path(sf_dir, "documents")}')
        ) GROUP BY word
        """
    ).fetchall()
    con.close()
    vocab = {tuple(w): f for w, f in rows}  # word as char tuple

    merges = []
    for rank in range(1, k + 1):
        counts: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        # ties: count desc, then (left, right) asc
        (l, r), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((rank, l, r, n))
        merged = l + r
        new_vocab: dict[tuple, int] = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


def test_bpe_merges_match_reference_exactly(spark, sf_dir):
    got = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in all_queries()["bpe_train_merges"].fn(spark, sf_dir).collect()
    ]
    want = _reference_bpe(sf_dir, N_BPE_MERGES)
    assert got == want, f"\ngot:  {got}\nwant: {want}"


def test_bpe_produces_multichar_subwords(spark, sf_dir):
    """Sanity: training must actually compose subwords (some merge's
    left or right side is itself a prior merge output)."""
    rows = all_queries()["bpe_train_merges"].fn(spark, sf_dir).collect()
    assert len(rows) == N_BPE_MERGES
    assert any(len(r.left) > 1 or len(r.right) > 1 for r in rows)
