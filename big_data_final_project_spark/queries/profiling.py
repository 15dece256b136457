"""Data-profiling / statistics operators: one-pass table profile and
a contingency (chi-square) analysis.

A 100 TB ingest pipeline profiles every new partition before
accepting it (nulls, distincts, ranges per column) and monitors
feature/label independence drift (chi-square). Both belong to the
engine, not a notebook: the profile must be ONE scan regardless of
column count, and the statistic must be deterministic enough to diff
day-over-day.

Reference parity: the closest the reference gets is Streamlit
metric cards over the latest record (app.py:373-409); these are the
systematic versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load_table
from ..operators.scale import spread
from ..registry import query

# (column, is_numeric) — the profile emits one row per column.
_PROFILE_COLS = [
    ("event_id", True),
    ("user_id", True),
    ("event_type", False),
    ("value", True),
    ("props", False),
]


def _repr_sql(col: str, numeric: bool, agg: str) -> str:
    """Uniform cross-engine string rendering of a min/max: numerics go
    through DECIMAL(18,6) (fixed '.000000' textual form on both
    engines), strings pass through."""
    if numeric:
        # STRING: the one text-type name both Spark SQL and DuckDB parse
        return f"CAST(CAST({agg}({col}) AS DECIMAL(18,6)) AS STRING)"
    return f"{agg}({col})"


def _profile_oracle() -> str:
    parts = []
    for col, numeric in _PROFILE_COLS:
        parts.append(
            f"""
            SELECT '{col}' AS col,
                   CAST(count({col}) AS BIGINT) AS n_nonnull,
                   CAST(count(*) - count({col}) AS BIGINT) AS n_null,
                   CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
                   {_repr_sql(col, numeric, "min")} AS min_repr,
                   {_repr_sql(col, numeric, "max")} AS max_repr
            FROM events
            """
        )
    return " UNION ALL ".join(parts)


@query(
    "audit_table_profile",
    oracle=_profile_oracle(),
    tags=("audit", "profile", "statistics"),
)
def audit_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column table profile — non-null count, null count, exact
    distinct count, min/max — emitted as one row per column, computed
    in a SINGLE scan: all per-column aggregates live in one wide
    grouped aggregation and the per-column rows are unpivoted from
    that 1-row result with stack() (no per-column scans, no driver
    loop — the oracle's UNION ALL of five scans is the shape this
    query exists to avoid).

    Scale shape: one pass, one shuffle (the global aggregate's
    2-phase partial/final). count(DISTINCT c1), count(DISTINCT c2)...
    in one aggregate plans as Spark's expand + two-level aggregate —
    the row count grows by the number of distinct-columns, the shape
    every multi-distinct profiler pays; swap the exact distincts for
    HLL/bitmap sketches (see sketches.py) when the audit tolerates
    estimates. Numeric min/max are rendered through DECIMAL(18,6) so
    both engines print identical text.

    The input is spread first: a byte-small parquet scans as one
    partition, and the Expand multiplies rows by the distinct-column
    count BEFORE the partial aggregate — single-core without the
    explicit repartition (SCALE.md spread rule); on a real 100 TB
    table the scan already yields thousands of partitions and the
    spread is a no-op."""
    e = spread(load_table(spark, sf_dir, "events"))
    aggs = []
    for col, numeric in _PROFILE_COLS:
        aggs += [
            F.count(col).cast("bigint").alias(f"{col}__n"),
            (F.count("*") - F.count(col)).cast("bigint").alias(f"{col}__nn"),
            F.countDistinct(col).cast("bigint").alias(f"{col}__nd"),
            F.expr(_repr_sql(col, numeric, "min")).alias(f"{col}__mn"),
            F.expr(_repr_sql(col, numeric, "max")).alias(f"{col}__mx"),
        ]
    one = e.agg(*aggs)
    stack_args = ", ".join(
        f"'{col}', {col}__n, {col}__nn, {col}__nd, {col}__mn, {col}__mx"
        for col, _ in _PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(col, n_nonnull, n_null, n_distinct, min_repr, max_repr)"
        )
    )


@query(
    "agg_chi_square_cells",
    oracle="""
    WITH cells AS (
        SELECT event_type,
               CASE WHEN value >= 50 THEN 'high' ELSE 'low' END AS band,
               CAST(count(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, band, o,
               SUM(o) OVER (PARTITION BY event_type) AS row_tot,
               SUM(o) OVER (PARTITION BY band) AS col_tot,
               SUM(o) OVER () AS n
        FROM cells
    )
    SELECT event_type, band, o,
           CAST(row_tot * col_tot AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
           (CAST(o AS DOUBLE)
            - CAST(row_tot * col_tot AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(o AS DOUBLE)
              - CAST(row_tot * col_tot AS DOUBLE) / CAST(n AS DOUBLE))
           / (CAST(row_tot * col_tot AS DOUBLE) / CAST(n AS DOUBLE))
             AS chi2_contrib
    FROM tot
    """,
    tags=("statistics", "contingency", "window"),
)
def agg_chi_square_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contingency analysis of event_type x value band:
    observed count, expected count under independence, and the
    per-cell chi-square contribution. Emitted PER CELL rather than
    summed: the marginals are exact integers and each cell's double
    arithmetic is an identical expression tree on both engines, but a
    cross-cell SUM of doubles would be order-dependent — per-cell
    rows keep the differential exact (the caller sums 10 cells if it
    wants the statistic; the decision threshold doesn't care about
    low-bit order effects, the differential does).

    Scale shape: one count shuffle on the (type, band) grid, then
    window marginals over the TINY cell table (|types| x 2 rows) —
    the raw data is aggregated before any window runs."""
    e = load_table(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type",
        F.when(F.col("value") >= 50, "high").otherwise("low").alias("band"),
    ).agg(F.count("*").cast("bigint").alias("o"))
    from pyspark.sql import Window

    row_tot = F.sum("o").over(Window.partitionBy("event_type"))
    col_tot = F.sum("o").over(Window.partitionBy("band"))
    n = F.sum("o").over(Window.partitionBy())
    tot = cells.select(
        "event_type",
        "band",
        "o",
        row_tot.alias("row_tot"),
        col_tot.alias("col_tot"),
        n.alias("n"),
    )
    expected = (F.col("row_tot") * F.col("col_tot")).cast("double") / F.col(
        "n"
    ).cast("double")
    dev = F.col("o").cast("double") - expected
    return tot.select(
        "event_type",
        "band",
        "o",
        expected.alias("expected"),
        (dev * dev / expected).alias("chi2_contrib"),
    )


@query(
    "audit_key_skew",
    oracle="""
    WITH sizes AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS group_size
        FROM orders GROUP BY o_custkey
    ),
    hist AS (
        SELECT group_size, CAST(count(*) AS BIGINT) AS n_groups
        FROM sizes GROUP BY group_size
    )
    SELECT group_size, n_groups,
           CAST(max(group_size) OVER () AS DOUBLE)
             / (CAST(SUM(group_size * n_groups) OVER () AS DOUBLE)
                / CAST(SUM(n_groups) OVER () AS DOUBLE)) AS skew_ratio
    FROM hist
    """,
    tags=("audit", "skew", "profile"),
)
def audit_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/aggregation-key skew audit: the distribution of group
    sizes for orders-per-customer, plus the max/mean skew ratio — the
    number that decides whether a key needs salting or AQE skew
    handling BEFORE the 100 TB job runs (operators/salting.py is the
    treatment; this is the diagnosis).

    Scale shape: one count shuffle on the key, then a histogram
    aggregate over group-size (tiny domain) and window totals over
    the histogram — the raw table is touched once. The skew ratio is
    exact-integer arithmetic until two final IEEE divisions."""
    o = load_table(spark, sf_dir, "orders")
    sizes = o.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("group_size")
    )
    hist = sizes.groupBy("group_size").agg(
        F.count("*").cast("bigint").alias("n_groups")
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    mean = F.sum(F.col("group_size") * F.col("n_groups")).over(w).cast(
        "double"
    ) / F.sum("n_groups").over(w).cast("double")
    return hist.select(
        "group_size",
        "n_groups",
        (F.max("group_size").over(w).cast("double") / mean).alias("skew_ratio"),
    )
