"""Cross-engine float determinism helpers.

The driver's t2 gate hash-compares values between Spark and the DuckDB
oracle, so float results must be bit-identical. Two failure modes and
their fixes (both verified empirically on the testdata):

1. ``round(x, 2)`` ties: money values are exact 2–6 decimal-place
   decimals; products of them land exactly on ``.xx5`` boundaries.
   Spark rounds the shortest decimal representation HALF_UP while
   DuckDB rounds the binary double, so ties flip (10/6000 rows in
   q_project). Fix: never round row-level expressions — a double
   product with the SAME parenthesization is IEEE-bit-identical in
   both engines, so emit the raw double.

2. Aggregate sums: accumulation order differs across engines (and
   across Spark partitionings!), so raw double sums drift by ~1 ulp
   and rounding near a tie is unstable. Fix: accumulate in DECIMAL —
   exact and order-independent — and cast the final value to DOUBLE.
   The row cast double→DECIMAL(p,s) is itself deterministic because
   the true values are exact s-digit decimals (distance to the next
   grid point is 10^-s, astronomically larger than 1 ulp).

Genuinely irrational statistics (stddev, corr, ...) can't accumulate
exactly; round those to a few digits where a true value sitting on a
tie boundary has probability ~0.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for 100 TB-scale sums of money columns: DECIMAL(25+10, s)
# after Spark's sum() widening still fits in 38 digits.
_PRECISION = 25


def dec(col: Column | str, scale: int) -> Column:
    """Cast a (money-like) column to the exact-decimal accumulation type."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({_PRECISION},{scale})")


def dsum(col: Column | str, scale: int) -> Column:
    """Order-independent exact sum, returned as DOUBLE.

    Oracle-side equivalent:
    ``CAST(sum(CAST(x AS DECIMAL(25,s))) AS DOUBLE)``.
    """
    return F.sum(dec(col, scale)).cast("double")


def davg(col: Column | str, scale: int) -> Column:
    """Exact-sum average as DOUBLE: CAST(sum(dec)/count AS DOUBLE) ≡
    oracle ``CAST(sum(CAST(x AS DECIMAL(25,s))) AS DOUBLE) / count(x)``.
    Division happens in double on both sides (single IEEE op).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale)).cast("double") / F.count(c)


def oracle_dsum(expr: str, scale: int) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL({_PRECISION},{scale}))) AS DOUBLE)"


def oracle_davg(expr: str, scale: int) -> str:
    return f"({oracle_dsum(expr, scale)} / count({expr}))"
