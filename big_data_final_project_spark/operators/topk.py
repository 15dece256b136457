"""Top-k per group (SURVEY.md §2.6).

``row_number`` over a (key, order) window then ``rn <= k``. Spark
plans the rank filter as a partial top-k per partition before the
shuffle (WindowGroupLimit), so only k rows per group per partition
move — this is the scalable form of "latest N per series".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)
