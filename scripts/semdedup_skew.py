#!/usr/bin/env python
"""Measure SemDeDup's FINE-cell occupancy distribution at rehearsal
scale (round-14, round-13 verdict item 3).

The 60M-vector leg's pair output grew 350M → 1.44B over a 3× data
step — n^1.29 against the flat n·T design bound. Two hypotheses:
(a) fine cells are oversized (coarse cells past the row cap
re-splitting unevenly, or the 1-iteration fine Lloyd converging to
unbalanced cells on clustered data), so Σ|cell|² grows faster than
n·T; (b) cells are fine and the corpus genuinely has more
above-threshold pairs per row at 60M (the planted near-dup pool is
drawn from a fixed 500k reservoir, so dup GROUPS grow in size, and
within-group pairs grow quadratically in group size).

This script separates them with data: the exact coarse train +
assignment the operator runs (same code path), then
_semdedup_fine_pairs(stats_only=True) — same shuffle, same fine
k-means, but emitting (cluster, fine, n_rows) per fine cell instead
of pairs. Output: semdedup_skew.json with the size distribution
(p50/p90/p99/max vs SEMDEDUP_TARGET_CELL_ROWS), Σ|cell|² (the pair-
space upper bound), and the same-cell pair-bound ratio vs n·T.

Usage: python scripts/semdedup_skew.py /root/repo/.scale30k
Serialize with any other Spark work on this box (single-JVM rule).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(sf_dir: str) -> None:
    import numpy as np

    from linux_logs_spark.catalog import load, table_row_count
    from linux_logs_spark.operators import warehouse as wh
    from linux_logs_spark.session import get_spark, scaled_partitions
    from pyspark.sql import functions as F

    spark = get_spark("semdedup-skew")
    spark.range(1000).selectExpr("sum(id)").collect()

    n_vecs = table_row_count(sf_dir, "embeddings")
    if not wh._semdedup_twolevel(n_vecs):
        raise SystemExit(
            f"{sf_dir}: {n_vecs} rows is below the two-level flip — "
            "fine-cell stats are trivially |coarse cell| there"
        )
    k = wh._semdedup_k(n_vecs)
    emb = load(spark, sf_dir, "embeddings")
    t0 = time.monotonic()
    # EXACTLY dedup_semantic_cluster's two-level preamble (narrow
    # quantized trainer frame, then one map pass carrying the raw
    # embedding through _km_assign)
    qn = (
        emb.selectExpr("vec_id", *wh._km_q_exprs("embedding", one_based=False))
        .selectExpr(
            "vec_id",
            "array(" + ", ".join(f"q{i}" for i in range(wh._KM_DIM)) + ") AS qa",
        )
        .repartition(scaled_partitions(n_vecs))
        .localCheckpoint()
    )
    cents, key_sql = wh._km_train_array(qn, wh.SEMDEDUP_ITERS, k)
    wide = emb.selectExpr(
        "vec_id", "embedding", *wh._km_q_exprs("embedding", one_based=False)
    ).selectExpr(
        "vec_id",
        "embedding",
        "array(" + ", ".join(f"q{i}" for i in range(wh._KM_DIM)) + ") AS qa",
    )
    assigned = wh._km_assign(wide, cents, key_sql, k, keep=("embedding",))
    stats = (
        wh._semdedup_fine_pairs(
            assigned.selectExpr("vec_id", "embedding", f"key % {k} AS cluster"),
            stats_only=True,
        )
        .toPandas()
    )
    wall = time.monotonic() - t0
    sizes = np.sort(stats["n_rows"].to_numpy())[::-1]
    t = wh.SEMDEDUP_TARGET_CELL_ROWS
    sum_sq = float((sizes.astype(np.float64) ** 2).sum())
    coarse_sizes = stats.groupby("cluster")["n_rows"].sum()
    out = {
        "sf_dir": sf_dir,
        "n_vecs": int(n_vecs),
        "k_coarse": int(k),
        "target_cell_rows": int(t),
        "wall_s": round(wall, 1),
        "n_coarse_cells": int(stats["cluster"].nunique()),
        "n_fine_cells": int(len(sizes)),
        "fine_size_mean": round(float(sizes.mean()), 1),
        "fine_size_p50": int(np.percentile(sizes, 50)),
        "fine_size_p90": int(np.percentile(sizes, 90)),
        "fine_size_p99": int(np.percentile(sizes, 99)),
        "fine_size_max": int(sizes.max()),
        "coarse_size_p99": int(np.percentile(coarse_sizes, 99)),
        "coarse_size_max": int(coarse_sizes.max()),
        # Σ|cell|² / 2 is the same-cell pair-space bound; n·T/2 is the
        # design bound — their ratio is the skew multiplier
        "sum_sq_cells": sum_sq,
        "pair_bound_ratio_vs_nT": round(sum_sq / (float(n_vecs) * t), 2),
        # how much of Σ|cell|² the top decile of cells contributes —
        # distinguishes broad drift from a few pathological cells
        "top1pct_cells_sumsq_share": round(
            float((sizes[: max(1, len(sizes) // 100)].astype(np.float64) ** 2).sum())
            / sum_sq,
            3,
        ),
    }
    dest = os.path.join(REPO, "semdedup_skew.json")
    existing = {}
    if os.path.exists(dest):
        with open(dest) as fh:
            existing = json.load(fh)
    existing[f"{n_vecs}"] = out
    with open(dest, "w") as fh:
        json.dump(existing, fh, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {dest}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".scale30k"))
