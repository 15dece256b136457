"""Join compositions Spark lacks as single built-ins (SURVEY.md §2.6).

As-of join: for each left row, the most recent right row with
``right.ts <= left.ts`` (optionally within a tolerance), per key.
The reference has no joins at all; this is the canonical time-series
enrichment operator a streaming store needs (e.g. attach the latest
known weather observation to each query timestamp).

Implementation is the union-merge trick, which scales: instead of a
theta-join (quadratic blowup) or a per-key collect, tag both sides,
union them, and run one ``last(..., ignorenulls)`` window scan ordered
by time. Cost = one shuffle on (key), one sort — the same work a
sort-merge join would do, no skew amplification, no row explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right
    row with ``right[right_ts] <= left[left_ts]``, matching on ``on``.

    Columns of the result: all left columns + one ``{c}{suffix}`` per
    value column (null when no earlier right row exists).
    """
    lt = left.withColumn("__t", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    rt = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("__t"),
            *[F.col(c) for c in value_cols],
        )
        .withColumn("__is_left", F.lit(0))
    )
    lcols = [c for c in left.columns]
    unioned = lt.select(
        *[F.col(c) for c in lcols],
        "__t",
        "__is_left",
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    ).unionByName(
        rt.select(
            *[
                F.col(c) if c == on else F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in lcols
            ],
            "__t",
            "__is_left",
            *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        )
    )
    # Right rows sort before left rows at the same timestamp so a
    # right row with ts == left ts is visible ("<=" semantics).
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *lcols,
        "__is_left",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return filled.where(F.col("__is_left") == 1).drop("__is_left")
