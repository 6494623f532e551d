"""Vector math over ArrayType(FloatType) embedding columns.

Pure higher-order-function compositions (F.zip_with / F.aggregate) —
JVM-evaluated per row, no Python, no UDF. Elements are cast to double
BEFORE arithmetic so the left-to-right fold is bit-identical to the
oracle's list_* double math.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column
from pyspark.sql import functions as F

# The embeddings table is fixed 64-dim (FIXTURES.md). Unrolled
# expressions below need the dimension at plan time.
EMBED_DIM = 64


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + left fold (double). Fine for per-row
    use; for O(n²) pair loops prefer dot_unrolled (codegen'd)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def dot_unrolled(a: Column, b: Column, dim: int = EMBED_DIM) -> Column:
    """Σ aᵢ·bᵢ as an explicit left-assoc sum of dim terms.

    Higher-order functions (aggregate/zip_with) are interpreted per
    element — benchmarking showed them ~100× slower inside an O(n²)
    candidate loop. The unrolled sum whole-stage-codegens, and its
    ((a₀b₀+a₁b₁)+a₂b₂)+… order is byte-identical to the left fold, so
    oracle parity is unchanged."""
    terms = [a[i] * b[i] for i in range(dim)]
    return functools.reduce(operator.add, terms)


def dot_const(a: Column, coeffs: list[float]) -> Column:
    """Σ aᵢ·cᵢ against driver-side constant coefficients (codegen'd,
    no per-row array construction) — LSH hyperplane projections."""
    terms = [a[i] * F.lit(c) for i, c in enumerate(coeffs)]
    return functools.reduce(operator.add, terms)


def dot_unrolled_raw(a: Column, b: Column, dim: int = EMBED_DIM) -> Column:
    """dot_unrolled over RAW float arrays, casting each ELEMENT.

    Feeding ``dot_unrolled(as_double(v), ...)`` inlines the whole
    64-element ``transform`` subtree into every term (64×65 ≈ 4k nodes
    per use; sim_ann_lsh's bucket expression hit ~35k nodes and spent
    seconds in Catalyst analysis alone). Casting at the element keeps
    the tree flat (4 nodes/term) with bit-identical float→double math."""
    terms = [a[i].cast("double") * b[i].cast("double") for i in range(dim)]
    return functools.reduce(operator.add, terms)


def norm_unrolled_raw(a: Column, dim: int = EMBED_DIM) -> Column:
    """‖a‖₂ over a RAW float array (per-element casts, flat tree)."""
    return F.sqrt(dot_unrolled_raw(a, a, dim))


def dot_const_raw(a: Column, coeffs: list[float]) -> Column:
    """dot_const over a RAW float array (per-element casts)."""
    terms = [a[i].cast("double") * F.lit(c) for i, c in enumerate(coeffs)]
    return functools.reduce(operator.add, terms)


def norm(a: Column) -> Column:
    """‖a‖₂ (double)."""
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def norm_unrolled(a: Column, dim: int = EMBED_DIM) -> Column:
    """‖a‖₂ with the same unrolled sum as dot_unrolled."""
    return F.sqrt(dot_unrolled(a, a, dim))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double vectors (per-row use)."""
    return dot(a, b) / (norm(a) * norm(b))
