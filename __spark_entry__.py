"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``big_data_final_project_spark.registry``: every
operator from SURVEY.md §2 registers there with a PySpark callable and
(when SQL-expressible) a DuckDB oracle string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_final_project_spark.registry import catalog, oracle_catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's per-series historical summary (SURVEY.md §3.3) —
    time-range filter + groupBy + count/avg/min/max aggregates.
    """
    return catalog()["ref_grouped_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in catalog().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted => rows-only check."""
    return oracle_catalog()
