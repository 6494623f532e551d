"""Pin for SemDeDup escape hatch (a) — the √n cell-size knob
(round-11 verdict item 7; SCALING.md third-decade analysis).

`SEMDEDUP_SQRT_CELLS` switches `_semdedup_k` from the flat
TARGET_CELL_ROWS rule (K ∝ n: assignment n·K quadratic, pair volume
linear) to T = isqrt(n) (K ≈ √n: both terms O(n^1.5)). The flat rule
stays the registered, oracle-replayed contract; this suite pins that

- the knob actually changes K past the KM_K floor (so a rehearsal
  flipping it is measuring the other regime, not a silent no-op);
- the knob'd path keeps SemDeDup's quality contract: precision 1.0
  against the oracle-verified exact pair set (within-cell exact
  cosine can only MISS boundary pairs, never invent one) and recall
  at the same bar test_ann_quality pins for the default. The two
  regimes' pair sets are NOT identical (measured at sf0.001: K=8 vs
  K=22 move mid-similarity threshold pairs across cell boundaries —
  82 vs 58 pairs, both all-true), so the pin is the quality bound,
  not set equality;
- restoring the default restores the default pair set bit-for-bit
  (the rehearsal save/restore contract, as test_sketch_width).
"""

from __future__ import annotations

from linux_logs_spark.operators import warehouse as wh
from linux_logs_spark.registry import all_queries

_Q = all_queries()


def _pairs(df):
    # pair identity only — `cluster` is the knob-dependent cell id
    # and legitimately differs between the two regimes
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_sqrt_rule_changes_k_past_the_floor():
    # flat: 200k // 250 = 800; sqrt: 200k // 447 = 447
    old = wh.SEMDEDUP_SQRT_CELLS
    try:
        wh.SEMDEDUP_SQRT_CELLS = False
        flat = wh._semdedup_k(200_000)
        wh.SEMDEDUP_SQRT_CELLS = True
        sq = wh._semdedup_k(200_000)
    finally:
        wh.SEMDEDUP_SQRT_CELLS = old
    assert flat == 800
    assert sq == 447
    # both respect the kmeans floor on tiny inputs
    wh.SEMDEDUP_SQRT_CELLS = True
    try:
        assert wh._semdedup_k(10) == wh.KM_K
    finally:
        wh.SEMDEDUP_SQRT_CELLS = old


def test_sqrt_cells_quality_bound_and_restore(spark, sf_dir):
    fn = _Q["dedup_semantic_cluster"].fn
    exact = _pairs(_Q["dedup_embedding_cosine"].fn(spark, sf_dir))
    assert exact, "fixture must contain threshold pairs"
    before = _pairs(fn(spark, sf_dir))
    old = wh.SEMDEDUP_SQRT_CELLS
    try:
        wh.SEMDEDUP_SQRT_CELLS = True
        knobbed = _pairs(fn(spark, sf_dir))
    finally:
        wh.SEMDEDUP_SQRT_CELLS = old
    after = _pairs(fn(spark, sf_dir))
    # precision 1.0 in BOTH regimes (structural). Recall: the default
    # keeps the test_ann_quality bar (0.25); the sqrt regime's cells
    # at THIS fixture are T = isqrt(500) = 22 rows — far smaller than
    # flat's 250, so more boundary misses (measured 0.226 vs 0.319).
    # That is a tiny-n artifact pointing the RIGHT way at scale: at
    # the 100× rehearsal's 200k vectors the sqrt rule's T = 447 is
    # BIGGER than flat's 250, so its recall can only be better there.
    assert knobbed <= exact, f"false positives: {sorted(knobbed - exact)[:5]}"
    assert len(knobbed) / len(exact) >= 0.2
    assert before <= exact
    assert len(before) / len(exact) >= 0.25
    assert after == before


def test_sqrt_rule_auto_flips_from_footer_scale():
    """Round-12: the hatch is no longer manual — past
    SEMDEDUP_SQRT_FLIP_ROWS the √n rule engages from the row count
    alone (the _ivf_cells pattern), and the oracle's kk CTE carries
    the same CASE so both engines agree at any sf. Below the flip the
    flat rule is untouched (every oracle-checked scale factor and the
    measured-complete 2M leg run flat)."""
    assert wh._semdedup_k(2_000_000) == 8000  # flat, proven decade
    assert wh._semdedup_k(3_999_999) == 15999  # still flat
    # 20M: T = floor(sqrt(20M)) = 4472 -> K = 20M // 4472
    assert wh._semdedup_k(20_000_000) == 20_000_000 // 4472
    assert wh._semdedup_k(4_000_000) == 4_000_000 // 2000
    # the oracle string carries the same flip constant and sqrt form
    oracle = wh._semdedup_oracle()
    assert str(wh.SEMDEDUP_SQRT_FLIP_ROWS) in oracle
    assert "floor(sqrt(count(*)))" in oracle
