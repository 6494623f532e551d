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


def test_gemm_key_chunk_boundary(spark, gemm_forced):
    """The chunked GEMM (round-12: one reused 512-row buffer per Arrow
    batch) must be exact across chunk boundaries — the committed sf
    fixtures never exceed one chunk, so force a single 1300-row batch
    (512 + 512 + 276, including a partial tail chunk) through one
    worker and pin GEMM keys == HOF keys for every vector."""
    n, k = 1300, 150
    qa = (
        spark.range(n)
        .selectExpr(
            "id AS vec_id",
            "transform(sequence(0, 63),"
            " j -> CAST((id * 37 + j * j * 11) % 2001 - 1000 AS BIGINT)) AS qa",
        )
        .repartition(1)
        .localCheckpoint()
    )
    cents, key_sql = wh._km_train_array(qa, 1, k)
    got = {
        r["vec_id"]: r["key"] for r in wh._km_assign(qa, cents, key_sql, k).collect()
    }
    mp = pytest.MonkeyPatch()
    mp.setattr(wh, "_KM_GEMM_MIN_K", 10**9)
    try:
        cents2, key_sql2 = wh._km_train_array(qa, 1, k)
        want = {
            r["vec_id"]: r["key"]
            for r in wh._km_assign(qa, cents2, key_sql2, k).collect()
        }
    finally:
        mp.undo()
    assert len(got) == n
    assert got == want
