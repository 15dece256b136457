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

    DuckDB's SUM(DECIMAL(18,6)) widens to DECIMAL(38,6); still exact,
    and the final cast to double matches Spark bit-for-bit.
    """
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    return f"{dsum_sql(expr)} / COUNT({expr})"
