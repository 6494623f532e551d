"""Chunk-boundary pins for the per-bucket / per-cell verification GEMMs.

sim_ann_lsh and dedup_semantic_cluster verify candidates with one
query-chunked numpy GEMM per bucket/cell (round 12). Normal occupancy
(≈122-250 rows) never exceeds one 2048-row chunk, so the boundary
arithmetic — self-exclusion offsets, the strict-upper-triangle mask
against GLOBAL row indices, partial tail chunks — would otherwise ship
unexercised. Shrinking the module chunk constants to 7 forces dozens
of chunk crossings on the committed sf data; results must be
bit-identical to the default single-chunk path.
"""

from __future__ import annotations

import pytest

from linux_logs_spark.operators import llm_pipeline as lp
from linux_logs_spark.operators import warehouse as wh
from linux_logs_spark.registry import all_queries

_Q = all_queries()


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_lsh_bucket_gemm_chunk_boundary(spark, sf_dir, monkeypatch):
    want = _rows(
        _Q["sim_ann_lsh"].fn(spark, sf_dir),
        "vec_id", "neighbor_id", "sim", "nn_rank",
    )
    monkeypatch.setattr(lp, "_BUCKET_GEMM_CHUNK", 7)
    got = _rows(
        _Q["sim_ann_lsh"].fn(spark, sf_dir),
        "vec_id", "neighbor_id", "sim", "nn_rank",
    )
    assert want  # non-vacuous
    assert got == want


def test_semdedup_cell_gemm_chunk_boundary(spark, sf_dir, monkeypatch):
    want = _rows(
        _Q["dedup_semantic_cluster"].fn(spark, sf_dir),
        "cluster", "doc_a", "doc_b", "sim",
    )
    monkeypatch.setattr(wh, "_CELL_GEMM_CHUNK", 7)
    got = _rows(
        _Q["dedup_semantic_cluster"].fn(spark, sf_dir),
        "cluster", "doc_a", "doc_b", "sim",
    )
    assert want
    assert got == want
