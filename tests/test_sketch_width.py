"""Scale-knob regression gates for the sketch-width parameters
(round 10, second-decade rehearsal).

`N_MINHASH` and `SIMHASH_BITS` are the documented log(n) knobs that
keep banding candidate volume sub-quadratic (SCALING.md, second
decade: fixed widths measured 458 s / 148 s at 100×). They are
patched at rehearsal time, never at defaults — so nothing else in the
suite exercises the widened paths, and a silent breakage (e.g. the
64-bit signature fold overflowing under ANSI arithmetic, which the
first widened run hit) would only surface mid-rehearsal. These tests
pin the widened paths at sf0.001:

- the widened sketches still run and their pair sets keep the
  semantics the knob rule promises (minhash r=4 keeps a SUBSET of the
  r=2 candidates whose verified Jaccard still passes; simhash at 64
  bits keeps hamming ≤ SIMHASH_BANDS-1 over the wider signature);
- the 64-bit simhash signature genuinely uses the top bits (the
  overflow regression would zero or throw on them);
- restoring the defaults restores the default pair sets bit-for-bit
  (the rehearsal's knob save/restore contract).
"""

from __future__ import annotations

from linux_logs_spark.operators import llm_pipeline as lp
from linux_logs_spark.registry import all_queries

_Q = all_queries()


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def _with_knobs(spark, sf_dir, name, **knobs):
    old = {k: getattr(lp, k) for k in knobs}
    try:
        for k, v in knobs.items():
            setattr(lp, k, v)
        return _pairs(_Q[name].fn(spark, sf_dir))
    finally:
        for k, v in old.items():
            setattr(lp, k, v)


def test_minhash_widened_rows_per_band_is_a_verified_subset(spark, sf_dir):
    """Both widths run the same exact-Jaccard verify, so each pair set
    must be a subset of the EXACT J ≥ 0.5 ground truth — which
    dedup_shingle_jaccard computes over the same hashed shingle sets
    (oracle-checked). That containment is structural. The old form
    asserted wide <= base, which is NOT structurally guaranteed: the
    widened sketch's extra bands hash seeds the default never uses,
    and r=2 banding detects a J=0.5 pair only w.p. ≈0.90 — a pair
    found by a wide-only band would break the subset silently on a
    fixture change (round-10 advice). Recall is asserted against the
    exact truth instead: the fixture's planted dups are J ≈ 0.8,
    where detection is ≥ 1-(1-0.8²)⁸ ≈ 0.9998 (r=2) and
    1-(1-0.8⁴)⁸ ≈ 0.98 (r=4) per pair — 0.9 leaves a wide
    probabilistic margin (measured: both recalls are 1.0, 28/28)."""
    exact = _pairs(_Q["dedup_shingle_jaccard"].fn(spark, sf_dir))
    base = _pairs(_Q["dedup_near_minhash"].fn(spark, sf_dir))
    wide = _with_knobs(spark, sf_dir, "dedup_near_minhash", N_MINHASH=32)
    assert base <= exact
    assert wide <= exact
    assert len(base & exact) >= int(0.9 * len(exact))
    assert len(wide & exact) >= int(0.9 * len(exact))


def test_simhash_64bit_signature_runs_and_verifies(spark, sf_dir):
    """The widened signature must execute (the ANSI-overflow
    regression raised ARITHMETIC_OVERFLOW here), use its top bits,
    and report only hamming ≤ SIMHASH_BANDS-1 pairs over the SAME
    64-bit signatures the query banded."""
    from pyspark.sql import functions as F

    from linux_logs_spark.catalog import load

    old = lp.SIMHASH_BITS
    lp.SIMHASH_BITS = 64
    try:
        sigs = {
            r["doc_id"]: r["simhash"]
            for r in lp.simhash_signatures(
                load(spark, sf_dir, "documents")
            ).collect()
        }
        # top 16 bits are real signal: at 64 bits some signature must
        # differ from its low-48 truncation (i.e. high bits nonzero)
        assert any((s >> 48) & 0xFFFF for s in sigs.values())
        got = _with_knobs(spark, sf_dir, "dedup_simhash", SIMHASH_BITS=64)
    finally:
        lp.SIMHASH_BITS = old
    radius = lp.SIMHASH_BANDS - 1
    for a, b in got:
        assert bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1") <= radius
    # completeness at the widened width: every brute-force pair within
    # the radius must be reported (pigeonhole is width-independent)
    ids = sorted(sigs)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1") <= radius
    }
    assert got == brute


def test_knob_restore_restores_default_pairs(spark, sf_dir):
    """After a widened run, defaults must reproduce the default pair
    sets exactly — the rehearsal's save/restore contract."""
    before = _pairs(_Q["dedup_simhash"].fn(spark, sf_dir))
    _with_knobs(spark, sf_dir, "dedup_simhash", SIMHASH_BITS=64)
    after = _pairs(_Q["dedup_simhash"].fn(spark, sf_dir))
    assert before == after


def test_simhash_wide_band_keys_past_the_bigint(spark, sf_dir):
    """bits > 64 must route through the per-band key form
    (_simhash_band_keys — the 1000× rehearsal's finding: the one-
    bigint signature caps the log(n) width rule at 64 and leaves
    n²·2⁻¹⁶ random band collisions at 5M docs). Pins, at 80 bits:
    the query's pairs equal brute-force Hamming ≤ SIMHASH_BANDS-1
    where Hamming = Σ per-band popcounts over the SAME engine keys
    (bands partition the bits, so this is the exact distance and the
    pigeonhole completeness argument is width-independent); and the
    second hash chunk genuinely contributes (band 3 of an 80-bit
    signature holds bits 60-79, so positions 4-19 of k3 come from
    chunk 1 — the truncation regression would zero them)."""
    from linux_logs_spark.catalog import load

    old = lp.SIMHASH_BITS
    lp.SIMHASH_BITS = 80
    try:
        kf = lp._simhash_band_keys(load(spark, sf_dir, "documents"), 80)
        keys = {
            r["doc_id"]: tuple(r[f"k{b}"] for b in range(lp.SIMHASH_BANDS))
            for r in kf.collect()
        }
        got = _with_knobs(spark, sf_dir, "dedup_simhash", SIMHASH_BITS=80)
    finally:
        lp.SIMHASH_BITS = old
    assert any(ks[3] >= 16 for ks in keys.values())  # chunk-1 bits live
    radius = lp.SIMHASH_BANDS - 1

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(keys[a], keys[b]))

    ids = sorted(keys)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if ham(a, b) <= radius
    }
    assert got == brute
