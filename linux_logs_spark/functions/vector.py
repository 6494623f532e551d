"""Vector math over ArrayType(FloatType) embedding columns.

Only the *_raw forms survive; two earlier generations were measured
and retired (round 2):

1. Higher-order folds (``F.aggregate``/``F.zip_with``) — interpreted
   per element, ~100× slower than codegen inside an O(n²) pair loop.
2. Unrolled sums over ``F.transform(v, cast)`` — the transform subtree
   inlined into every one of the 64 terms (~4k expression nodes per
   use; seconds of Catalyst analysis), and the fused expressions blew
   janino's 64 KB method limit in sort-fused stages.

The *_raw forms cast each ELEMENT at extraction
(``a[i].cast("double")``): flat 4-node terms, bit-identical
float→double math, whole-stage-codegen friendly. The
``((a₀b₀+a₁b₁)+a₂b₂)+…`` left-association matches the oracle's
(DuckDB list_* functions) accumulation order, so rounded similarities
hash-match cross-engine.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column
from pyspark.sql import functions as F

# The embeddings table is fixed 64-dim (FIXTURES.md). Unrolled
# expressions below need the dimension at plan time.
EMBED_DIM = 64


def dot_unrolled_raw(a: Column, b: Column, dim: int = EMBED_DIM) -> Column:
    """Σ aᵢ·bᵢ over RAW float arrays as an explicit left-assoc sum,
    casting each element to double at extraction."""
    terms = [a[i].cast("double") * b[i].cast("double") for i in range(dim)]
    return functools.reduce(operator.add, terms)


def norm_unrolled_raw(a: Column, dim: int = EMBED_DIM) -> Column:
    """‖a‖₂ over a RAW float array (same left fold as the dot)."""
    return F.sqrt(dot_unrolled_raw(a, a, dim))


def dot_const_raw(a: Column, coeffs: list[float]) -> Column:
    """Σ aᵢ·cᵢ against driver-side constant coefficients (codegen'd,
    no per-row array construction) — LSH hyperplane projections."""
    terms = [a[i].cast("double") * F.lit(c) for i, c in enumerate(coeffs)]
    return functools.reduce(operator.add, terms)


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
    """SQL-string form of dot_unrolled_raw — the IDENTICAL left-assoc
    expression tree (a bare `+` chain parses left-associative), but
    parsed JVM-side from one string instead of ~200 py4j round-trips
    building Column objects driver-side. Round 6 measured plan BUILD
    dominating several ANN queries (e.g. 0.9 s build vs 0.14 s exec
    for a 128-term projection); use this form in new unrolled-
    expression call sites. `a`/`b` are column NAMES (alias-qualified
    like 'a.v' is fine)."""
    return " + ".join(
        f"cast({a}[{i}] as double) * cast({b}[{i}] as double)" for i in range(dim)
    )


def norm_unrolled_sql(a: str, dim: int = EMBED_DIM) -> str:
    """SQL-string form of norm_unrolled_raw (same left fold)."""
    return f"sqrt({dot_unrolled_sql(a, a, dim)})"
