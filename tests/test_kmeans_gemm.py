"""GEMM ≡ HOF equality for the Lloyd assignment fast path.

Above `_KM_GEMM_MIN_K` the assignment swaps the interpreted
array_min(transform(...)) fold for a numpy int64 GEMM in a pandas UDF
(the n·K term the 100× rehearsal measured as dedup_semantic_cluster's
second-decade quadratic). Every oracle-checked scale factor runs the
HOF path (K ≤ 80), so the hash gate never exercises the GEMM — these
tests force it (monkeypatching the gate to 1) and pin bit-identical
results against the verified HOF path on the same data.
"""

from __future__ import annotations

import pytest

from linux_logs_spark.operators import warehouse as wh
from linux_logs_spark.registry import all_queries

_Q = all_queries()


def _rows(df, *keycols):
    return sorted(tuple(r[c] for c in keycols) for r in df.collect())


@pytest.fixture
def gemm_forced(monkeypatch):
    monkeypatch.setattr(wh, "_KM_GEMM_MIN_K", 1)


def test_kmeans_gemm_equals_hof(spark, sf_dir, gemm_forced):
    """Full trainer + final assignment through the GEMM path must
    reproduce the HOF result exactly — same packed integer keys, so
    same clusters, members, and quantized SSDs."""
    got = _rows(
        _Q["emb_kmeans_lloyd"].fn(spark, sf_dir), "cluster", "n_members", "ssd"
    )
    wh_default = pytest.MonkeyPatch()
    wh_default.setattr(wh, "_KM_GEMM_MIN_K", 10**9)
    try:
        want = _rows(
            _Q["emb_kmeans_lloyd"].fn(spark, sf_dir), "cluster", "n_members", "ssd"
        )
    finally:
        wh_default.undo()
    assert got == want


def test_semdedup_gemm_equals_hof(spark, sf_dir, gemm_forced):
    """SemDeDup's trainer, final assignment and downstream pair join
    must be unchanged under the GEMM path (same cells → same pairs →
    same rounded sims)."""
    got = _rows(
        _Q["dedup_semantic_cluster"].fn(spark, sf_dir),
        "cluster", "doc_a", "doc_b", "sim",
    )
    wh_default = pytest.MonkeyPatch()
    wh_default.setattr(wh, "_KM_GEMM_MIN_K", 10**9)
    try:
        want = _rows(
            _Q["dedup_semantic_cluster"].fn(spark, sf_dir),
            "cluster", "doc_a", "doc_b", "sim",
        )
    finally:
        wh_default.undo()
    assert got == want
    assert got  # non-vacuous: the sf fixture must produce pairs
