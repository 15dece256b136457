"""Relational ML primitives (engine addition): feature
standardization and closed-form model fitting expressed as
aggregates — the operations a feature/training pipeline runs at
corpus scale, kept cross-engine bit-identical by routing every
moment through exact decimal sums (functions/numeric.py; the same
discipline that makes the k-means and correlation queries
oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load_table
from ..functions.numeric import dsum, dsum_prod, dsum_prod_sql, dsum_sql
from ..registry import query


@query(
    "ml_linreg_closed_form",
    oracle=f"""
    WITH m AS (
        SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n,
               {dsum_sql("l_quantity")} AS sx,
               {dsum_sql("l_extendedprice")} AS sy,
               {dsum_prod_sql("l_quantity", "l_quantity")} AS sxx,
               {dsum_prod_sql("l_quantity", "l_extendedprice")} AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept
    FROM m
    """,
    tags=("ml", "regression"),
)
def ml_linreg_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary least squares (price ~ quantity) via the
    closed-form normal equations: slope = (nΣxy - ΣxΣy)/(nΣx² -
    (Σx)²). Training IS one aggregation pass — the five moments are
    exact decimal sums (order-independent), combined in one final
    double expression, so the fitted model is bit-identical across
    engines, runs, and partitionings. At 100 TB this trains in a
    single map-side-combined shuffle; the same moment-matrix pattern
    extends to d features with a d² aggregate + a tiny driver-side
    solve (d² values, not data)."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum_prod(x, x).alias("sxx"),
        dsum_prod(x, y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "l_returnflag",
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    )


@query(
    "ml_feature_standardize",
    oracle=f"""
    WITH m AS (
        SELECT l_returnflag AS grp,
               CAST(count(*) AS DOUBLE) AS n,
               {dsum_sql("l_quantity")} AS sx,
               {dsum_prod_sql("l_quantity", "l_quantity")} AS sxx
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_orderkey AS orderkey, l.l_linenumber AS linenumber,
           (l.l_quantity - m.sx / m.n)
             / sqrt(m.sxx / m.n - (m.sx / m.n) * (m.sx / m.n)) AS qty_z
    FROM lineitem l JOIN m ON l.l_returnflag = m.grp
    """,
    tags=("ml", "feature"),
)
def ml_feature_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score standardization — the feature-scaling pass
    before any distance-based model. Group moments (exact decimal)
    broadcast back onto the row stream, so the per-row transform is a
    narrow map over one scan: aggregate once, broadcast k rows, never
    shuffle the fact table. Population variance (/n) on both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    m = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count("*").cast("double").alias("n"),
        dsum(x).alias("sx"),
        dsum_prod(x, x).alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    std = F.sqrt(F.col("sxx") / F.col("n") - mean * mean)
    return (
        li.join(F.broadcast(m), li.l_returnflag == F.col("grp"))
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_linenumber").alias("linenumber"),
            ((x - mean) / std).alias("qty_z"),
        )
    )


N_BINS = 4


@query(
    "ml_quantile_binning",
    oracle=f"""
    WITH binned AS (
        SELECT l_returnflag,
               ntile({N_BINS}) OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_quantity, l_orderkey, l_linenumber) AS bin,
               l_extendedprice
        FROM lineitem
    )
    SELECT l_returnflag, CAST(bin AS BIGINT) AS bin,
           count(*) AS n,
           {dsum_sql("l_extendedprice")} / count(*) AS avg_price
    FROM binned
    GROUP BY l_returnflag, bin
    """,
    tags=("ml", "feature", "binning"),
)
def ml_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (quantile) binning of a feature per group,
    then per-bin target statistics — the discretization + target-
    encoding prep step. ntile over a TOTAL order (value + unique-key
    tiebreak) makes bin membership deterministic even on heavily
    tied values; one window shuffle + one aggregate."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    return (
        li.select(
            "l_returnflag",
            F.ntile(N_BINS).over(w).cast("long").alias("bin"),
            "l_extendedprice",
        )
        .groupBy("l_returnflag", "bin")
        .agg(
            F.count("*").alias("n"),
            (dsum("l_extendedprice") / F.count("*")).alias("avg_price"),
        )
    )
