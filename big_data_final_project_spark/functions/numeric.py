"""Deterministic numeric aggregation helpers.

Floating-point addition is not associative, so ``SUM(double)`` depends
on partition/merge order — Spark and the DuckDB oracle would differ in
the low bits (and at 100 TB even two Spark runs would). Routing the sum
through a decimal makes it exact and associative: the per-row
double→decimal cast is order-independent, the decimal sum is exact,
and the final decimal→double cast is deterministic IEEE rounding. Same
construction on the oracle side gives bit-identical results.

The decimal cast/sum stays inside whole-stage codegen (no UDF, no
Python), so this costs a few percent, not a slow path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 12 integer digits / 6 fractional: enough for TPC-H money values
# (~1e5) summed over ~1e9 rows per group at 100 TB without overflow
# risk inside Spark's sum(decimal(18,6)) -> decimal(28,6).
DEC = "decimal(18,6)"


def dsum(col: Column | str) -> Column:
    """Order-independent SUM over a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum / count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(c)


def dsum_sql(expr: str) -> str:
    """Oracle-side rendering of :func:`dsum` (DuckDB).

    DuckDB's SUM(DECIMAL(18,6)) widens to DECIMAL(38,6); still exact.
    The final cast routes through VARCHAR because DuckDB's direct
    int128-decimal → double cast double-rounds (int128→double, then
    the 10^scale division — measured 1-ulp drift once the unscaled
    value exceeds 2^53), while string→double is correctly rounded
    and matches Spark's BigDecimal.doubleValue bit-for-bit.
    """
    return f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    return f"{dsum_sql(expr)} / COUNT({expr})"


def dsum_prod(a: Column | str, b: Column | str) -> Column:
    """Order-independent SUM(a*b) where a and b are money-style
    values (≤6 decimal places, so the per-factor decimal cast is
    EXACT). Casting the double *product* instead rounds at the 6th
    decimal, and Spark (half-up) and DuckDB (half-even) disagree on
    ties — measured 0.02 drift over a 60k-row sum of squares.
    Multiplying in decimal keeps every step exact: decimal(18,6) x
    decimal(18,6) -> decimal(37,12), summed exactly, one final cast."""
    ca = (F.col(a) if isinstance(a, str) else a).cast(DEC)
    cb = (F.col(b) if isinstance(b, str) else b).cast(DEC)
    return F.sum(ca * cb).cast("double")


def dsum_prod_sql(a: str, b: str) -> str:
    """Oracle-side rendering of :func:`dsum_prod` (DuckDB).

    Factors cast to DECIMAL(19,6), not (18,6): width ≤18 keeps DuckDB
    on int64 storage and the int64×int64 product overflows; 19 forces
    int128 (the multiply then runs exact at (38,12)). Same VARCHAR
    route as dsum_sql for the correctly-rounded final double."""
    return (
        f"CAST(CAST(SUM(CAST(({a}) AS DECIMAL(19,6)) * CAST(({b}) AS DECIMAL(19,6)))"
        " AS VARCHAR) AS DOUBLE)"
    )


def finite_measure(col: Column | str) -> Column:
    """The FINITE-MEASURE CONTRACT (round-8 NaN/±Inf sweep), NULLIFY
    form: a non-finite reading becomes NULL (the row survives; the
    measurement is skipped, exactly like a missing reading under the
    null contract), so cents-exact decimal/bigint casts downstream
    never see NaN/±Inf — Spark ANSI faults on CAST(NaN AS DECIMAL),
    DuckDB errors on the same cast, and engines that don't fault
    disagree on NaN ordering. NULL stays NULL. Raw float aggregates
    that never leave double (plain sum/avg/min/max) DON'T gate: IEEE
    propagation (NaN poisons, Inf dominates) is identical
    cross-engine and is the honest float answer. (A FILTER-form
    boolean twin, finite_or_null, existed through round 8 but had no
    call sites — every consumer uses this NULLIFY form; ADVICE r8.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(~F.isnan(c) & (F.abs(c) != F.lit(float("inf"))), c)


def finite_measure_sql(expr: str) -> str:
    """Oracle-side (DuckDB) rendering of :func:`finite_measure`
    (isfinite(NULL) is NULL, so NULL input falls to the ELSE and
    stays NULL)."""
    return f"CASE WHEN isfinite({expr}) THEN ({expr}) ELSE NULL END"
