"""Vector math over ArrayType(FloatType) embedding columns.

Only the *_sql forms survive; three earlier generations were measured
and retired:

1. Higher-order folds (``F.aggregate``/``F.zip_with``) — interpreted
   per element, ~100× slower than codegen inside an O(n²) pair loop
   (round 2).
2. Unrolled sums over ``F.transform(v, cast)`` — the transform subtree
   inlined into every one of the 64 terms (~4k expression nodes per
   use; seconds of Catalyst analysis), and the fused expressions blew
   janino's 64 KB method limit in sort-fused stages (round 2).
3. Unrolled sums built as driver-side COLUMN objects
   (``a[i].cast("double") * b[i].cast("double")`` chains) — each of
   the ~200 expression nodes cost a py4j round-trip, so plan
   CONSTRUCTION dominated execution for every ANN query (measured
   0.9–1.4 s build vs 0.1–0.8 s exec at sf0.01; round 6).

The *_sql forms emit the SAME expression as one SQL string parsed
JVM-side: each element cast at extraction (``cast(a[i] as double)``,
flat terms, whole-stage-codegen friendly), and a bare ``+`` chain
parses LEFT-ASSOCIATIVE, so the ``((a₀b₀+a₁b₁)+a₂b₂)+…`` accumulation
order matches the oracle's (DuckDB list_* functions) and rounded
similarities hash-match cross-engine. Wrap with ``F.expr`` or embed
in ``selectExpr``.
"""

from __future__ import annotations

# The embeddings table is fixed 64-dim (FIXTURES.md). Unrolled
# expressions below need the dimension at plan time.
EMBED_DIM = 64


def block_pair_keys(id_col: str, n_own: int, n_other: int, own_name: str, other_name: str):
    """The blocked pair-enumeration key geometry shared by the exact
    cosine scans (dedup_embedding_cosine, sim_cosine_topk,
    extras.sim_cosine_blocked): hash this side's id into its own block
    axis and replicate the row across every block of the OTHER axis,
    so each (qblk, cblk) cell of the pair space meets exactly once in
    a plain equi-join on [own, other]. Centralized because a drift in
    this geometry (modulus, explode range, hash) between the three
    call sites silently drops or duplicates pair cells — the column
    NAMES stay per-site, the math lives here.

    Returns the two key columns to append to a select().
    """
    from pyspark.sql import functions as F

    return [
        F.pmod(F.xxhash64(id_col), F.lit(n_own)).cast("int").alias(own_name),
        F.explode(F.sequence(F.lit(0), F.lit(n_other) - 1)).alias(other_name),
    ]


def dot_unrolled_sql(a: str, b: str, dim: int = EMBED_DIM) -> str:
    """Σ aᵢ·bᵢ as one left-assoc SQL string (module docstring,
    retired form 3 explains why not Columns). `a`/`b` are column
    NAMES (alias-qualified like 'a.v' is fine)."""
    return " + ".join(
        f"cast({a}[{i}] as double) * cast({b}[{i}] as double)" for i in range(dim)
    )


def norm_unrolled_sql(a: str, dim: int = EMBED_DIM) -> str:
    """‖a‖₂ as one SQL string (same left fold as the dot)."""
    return f"sqrt({dot_unrolled_sql(a, a, dim)})"


def round6_away_sql(expr: str) -> str:
    """round(expr, 6) on the BINARY double, half AWAY from zero — the
    convention DuckDB's round() applies and the numpy formula
    sim_cosine_blocked uses (copysign(floor(|x|·1e6 + 0.5))/1e6).
    Spark's F.round instead rounds the SHORTEST DECIMAL REPR half-up
    (compat.py failure mode 1), which carries a measure-zero residual
    class at exact 0.5e-6 boundaries vs a DuckDB-round oracle; this
    expression removes it, so every registration sharing a rounded-sim
    oracle (topk / blocked / LSH / IVF) uses ONE convention (round-6
    advice)."""
    return f"sign({expr}) * floor(abs({expr}) * 1e6 + 0.5) / 1e6"
