"""Pins for sim_ann_ivf's √n cell hatch (round-13 verdict item 4).

The flat cells-∝-n rule keeps occupancy (and verify volume) linear
but grows the driver-side centroid closure without bound (~512 MB at
125M vectors). Past IVF_SQRT_FLIP_ROWS — or under the force knob —
_ivf_cells flips to n // floor(√n) ≈ √n cells, bounding the closure;
the oracle's k CTE replays the same CASE from count(*). This suite
pins the rule's arms, a REAL DuckDB oracle check of the knob-forced
√n path (re-baked flip-forced SQL, the test_semdedup_twolevel
pattern), and the save/restore contract.
"""

from __future__ import annotations

from linux_logs_spark.operators import warehouse as wh
from linux_logs_spark.registry import all_queries
from linux_logs_spark.verify import compare_frames, run_oracle

_Q = all_queries()


def test_ivf_cells_rule_arms():
    # flat below the flip — committed sfs keep their historical 16
    assert wh._ivf_cells(500) == 16
    assert wh._ivf_cells(2000) == 16
    assert wh._ivf_cells(200_000) == 1600
    assert wh._ivf_cells(999_999) == 7999
    # at/past the flip: cells ≈ √n — bounds BOTH the centroid closure
    # (cells×512B stays MB-scale) and the n×cells assignment GEMM
    assert wh._ivf_cells(1_000_000) == 1_000_000 // 1000
    assert wh._ivf_cells(2_000_000) == 2_000_000 // 1414
    assert wh._ivf_cells(125_000_000) == 125_000_000 // 11180
    # force knob engages the √n arm below the flip; floor respected
    old = wh.IVF_SQRT_CELLS
    try:
        wh.IVF_SQRT_CELLS = True
        assert wh._ivf_cells(500) == max(16, 500 // 22)
        assert wh._ivf_cells(10) == 16
    finally:
        wh.IVF_SQRT_CELLS = old
    # the registered oracle carries the same flip constant and sqrt form
    oracle = wh._ivf_oracle()
    assert str(wh.IVF_SQRT_FLIP_ROWS) in oracle
    assert "floor(sqrt(CAST(count(*) AS DOUBLE)))" in oracle


def test_ivf_sqrt_matches_rebaked_oracle_and_restores(spark, sf_dir):
    """Force the √n arm at the 500-vector fixture (22 cells instead
    of 16) and hash-compare Spark against the flip-forced re-baked
    DuckDB SQL — the driver's t2 gate run on the hatch regime — then
    pin that restoring the default restores the default result."""
    fn = _Q["sim_ann_ivf"].fn
    before = fn(spark, sf_dir).toPandas()
    old = wh.IVF_SQRT_CELLS
    try:
        wh.IVF_SQRT_CELLS = True
        spark_pdf = fn(spark, sf_dir).toPandas()
        oracle_pdf = run_oracle(wh._ivf_oracle(flip_rows=0), sf_dir)
    finally:
        wh.IVF_SQRT_CELLS = old
    assert len(spark_pdf) > 0
    issues = compare_frames(spark_pdf, oracle_pdf)
    assert not issues, "; ".join(issues)
    after = fn(spark, sf_dir).toPandas()
    assert not compare_frames(after, before)
