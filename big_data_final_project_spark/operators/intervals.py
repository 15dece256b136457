"""Cell-blocked interval-overlap join operator.

The scalable rewrite of the interval-overlap theta join
(`a_start < b_end AND b_start < a_end`, half-open intervals): pick a
cell width >= the longest interval on either side, explode each
interval onto the (<= 2) cells it covers, hash-join on the cell id,
apply the exact overlap predicate, and keep each true pair exactly
once by attributing it to the cell containing max(a_start, b_start)
— the later-starting endpoint lies in exactly one cell, and both
sides provably probe that cell when they overlap.

Used by queries.relational.join_interval_overlap (oracle = the naive
IEJoin) and property-tested against a brute-force pandas recompute on
randomized interval sets in tests/test_properties.py — including the
half-open touching-endpoints edge and intervals exactly one cell wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def overlap_pairs(
    a: DataFrame,
    b: DataFrame,
    cell: int,
) -> DataFrame:
    """Join two interval sets on overlap.

    ``a`` must have columns (a_id, a_s, a_e), ``b`` (b_id, b_s, b_e);
    intervals are half-open [s, e) with integer endpoints, and every
    interval must satisfy e - s <= cell (the caller picks the cell
    width from the max interval length). Returns one row per
    overlapping pair: (a_id, b_id, ov_start, ov_len), each pair
    exactly once.
    """

    def explode_cells(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "cell",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / cell),
                    F.floor((F.col(e) - 1) / cell),
                )
            ),
        )

    ax = explode_cells(a, "a_s", "a_e")
    bx = explode_cells(b, "b_s", "b_e")
    ov_start = F.greatest(F.col("a_s"), F.col("b_s"))
    ov_len = F.least(F.col("a_e"), F.col("b_e")) - ov_start
    return (
        ax.join(bx, "cell")
        .where(F.col("a_s") < F.col("b_e"))
        .where(F.col("b_s") < F.col("a_e"))
        .where(F.floor(ov_start / cell) == F.col("cell"))
        .select(
            "a_id",
            "b_id",
            ov_start.alias("ov_start"),
            ov_len.alias("ov_len"),
        )
    )
