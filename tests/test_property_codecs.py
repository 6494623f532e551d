"""Generative pins for the two from-scratch codecs/summaries the
round-9 surface added — components with NO reference implementation
in the container, so property sweeps stand in for interop tests:

1. The pure-Python Avro object-container codec (sources/avro_py.py):
   random rows over the full value domain must round-trip
   BIT-exactly through write_avro_file → scan_block_index →
   read_avro_blocks at arbitrary block sizes, and the block index
   must tile the row space exactly.
2. The mergeable heavy-hitter summary bounds (agg_freq_items_sketch's
   merge algebra, replayed in plain Python over random multisets):
   for ANY stream split into groups and ANY capacity, every item's
   exact count must lie in [est, est + max_under], and every item
   above the Σ N_g / M threshold must be reported.

No Spark needed — both properties are pure functions, so the sweep
is wide and fast.
"""

from __future__ import annotations

import math
import struct
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from linux_logs_spark.sources.avro_py import (
    read_avro_blocks,
    scan_block_index,
    write_avro_file,
)

FIELDS = [("k", "long"), ("name", "string"), ("x", "double")]

longs = st.integers(min_value=-(2**63), max_value=2**63 - 1)
# text-exactness is NOT required (binary codec) — sweep doubles
# including negative zero, denormals, infinities
doubles = st.floats(allow_nan=False, width=64)
strings = st.text(max_size=40)
rows = st.lists(
    st.fixed_dictionaries({"k": longs, "name": strings, "x": doubles}),
    max_size=120,
)


@given(rows=rows, block_rows=st.integers(min_value=1, max_value=17))
@settings(max_examples=60, deadline=None)
def test_avro_roundtrip_bit_exact_any_blocking(tmp_path_factory, rows, block_rows):
    path = str(tmp_path_factory.mktemp("avro") / "t.avro")
    n = write_avro_file(path, FIELDS, rows, block_rows=block_rows)
    assert n == len(rows)
    fields, blocks = scan_block_index(path)
    assert fields == FIELDS
    assert sum(c for _off, c in blocks) == len(rows)
    assert all(c <= block_rows for _off, c in blocks)
    got = list(read_avro_blocks(path, [off for off, _c in blocks]))
    assert len(got) == len(rows)
    for g, r in zip(got, rows):
        assert g[0] == r["k"]
        assert g[1] == r["name"]
        # bit-exact doubles (covers -0.0 vs 0.0, denormals, inf)
        assert struct.pack("<d", g[2]) == struct.pack("<d", r["x"])


items = st.lists(st.integers(min_value=0, max_value=30), min_size=0, max_size=300)


def _summarize(group: list[int], m: int):
    """The operator's per-group summary, replayed in plain Python:
    top-m items by (count desc, item asc) with exact counts, plus the
    largest dropped count as the absence bound."""
    c = Counter(group)
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = dict(ranked[:m])
    bound = max((n for _it, n in ranked[m:]), default=0)
    return kept, bound


@given(
    stream=items,
    n_groups=st.integers(min_value=1, max_value=6),
    m=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=120, deadline=None)
def test_mergeable_topm_bounds_and_recall(stream, n_groups, m):
    groups = [stream[g::n_groups] for g in range(n_groups)]
    summaries = [_summarize(g, m) for g in groups]
    exact = Counter(stream)

    tot_bound = sum(b for _kept, b in summaries)
    all_items = set().union(*(kept for kept, _b in summaries)) if summaries else set()
    for it in all_items:
        est = sum(kept.get(it, 0) for kept, _b in summaries)
        present_bound = sum(b for kept, b in summaries if it in kept)
        max_under = tot_bound - present_bound
        assert est <= exact[it] <= est + max_under, (it, est, exact[it], max_under)

    # heavy-hitter recall: true count > Σ N_g / m ⇒ reported somewhere
    threshold = sum(len(g) for g in groups) / m
    for it, n in exact.items():
        if n > threshold:
            assert it in all_items, (it, n, threshold)

    # merge associativity: summaries of summaries preserve the bound —
    # fold the per-group (kept, bound) pairs two at a time the way a
    # rollup tree would, re-cutting to capacity m at each merge
    def merge(a, b):
        kept_a, bound_a = a
        kept_b, bound_b = b
        est = {
            it: kept_a.get(it, bound_a if it not in kept_a else 0)
            + kept_b.get(it, 0)
            for it in set(kept_a) | set(kept_b)
        }
        ranked = sorted(est.items(), key=lambda kv: (-kv[1], kv[0]))
        kept = dict(ranked[:m])
        dropped_max = max((n for _it, n in ranked[m:]), default=0)
        return kept, bound_a + bound_b + dropped_max

    if summaries:
        folded = summaries[0]
        for s in summaries[1:]:
            folded = merge(folded, s)
        kept_f, bound_f = folded
        for it, est in kept_f.items():
            # folded estimates may over-count by at most the folded
            # bound; exact count stays within [est - bound, est + bound]
            assert est - bound_f <= exact[it] <= est + bound_f, (
                it, est, exact[it], bound_f,
            )
