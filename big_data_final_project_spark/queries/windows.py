"""Window functions (SURVEY.md §2.6, M2).

The reference's only "window" is sort-then-head for the latest record
(app.py:363); these are the real analytic windows the engine adds.
Ordering inside every window is made total with a tie-break key so
results are deterministic and hash-comparable — at scale, ties are
where nondeterminism (and flaky audits) come from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..data import load_table
from ..functions.numeric import finite_measure, finite_measure_sql
from ..operators.topk import topk_per_group
from ..registry import query

# Oracle-side gated measure (finite-measure contract, round 8 — see
# functions/numeric.finite_measure): every decimal/cents cast of the
# raw telemetry double goes through this.
_FIN_VALUE = finite_measure_sql("value")


@query(
    "window_rank_funcs",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey, o_totalprice AS price,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("window",),
)
def window_rank_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over (customer, price desc): row_number / rank /
    dense_rank / ntile in one window pass."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_totalprice").alias("price"),
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey, o_orderdate AS orderdate,
           lag(o_orderdate) OVER w AS prev_date,
           lead(o_orderdate) OVER w AS next_date,
           CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS BIGINT)
             AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "date"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead: previous/next order date per customer + day gap —
    the sessionization building block."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderdate").alias("orderdate"),
        prev.alias("prev_date"),
        F.lead("o_orderdate").over(w).alias("next_date"),
        F.datediff(F.col("o_orderdate"), prev).cast("long").alias("days_since_prev"),
    )


@query(
    "window_running_sum",
    oracle=f"""
    SELECT user_id, event_id, ts, value,
           CAST(sum(CAST({_FIN_VALUE} AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_n
    FROM events
    """,
    tags=("window", "frame"),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per user over event time (unbounded-preceding row
    frame). Sum goes through decimal so every prefix is exact — the
    cumulative double sum would otherwise drift off the oracle; the
    measure is finite-gated first (non-finite reading -> NULL, row
    kept — the round-8 finite-measure contract)."""
    events = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.sum(finite_measure("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
        F.count("*").over(w).alias("running_n"),
    )


@query(
    "window_moving_avg",
    oracle=f"""
    SELECT user_id, event_id, ts,
           CAST(sum(CAST({_FIN_VALUE} AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
             AS moving_avg_5
    FROM events
    """,
    tags=("window", "frame"),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-row moving average per user (bounded row frame), decimal-exact
    over the finite-gated measure."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, W.currentRow)
    return events.select(
        "user_id",
        "event_id",
        "ts",
        (
            F.sum(finite_measure("value").cast("decimal(18,6)"))
            .over(w)
            .cast("double")
            / F.count("*").over(w)
        ).alias("moving_avg_5"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT user_id, event_id, ts,
           count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS n_last_hour
    FROM events
    """,
    tags=("window", "frame", "range"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: events per user in the trailing
    hour — expressed on epoch microseconds so Spark and the oracle
    agree on frame membership to the exact microsecond."""
    events = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, W.currentRow)
    )
    return events.select(
        "user_id", "event_id", "ts", F.count("*").over(w).alias("n_last_hour")
    )


@query(
    "window_first_last",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last value per partition (last over the full frame —
    the default running frame's last_value is just the current row)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
    )


@query(
    "window_topk_per_group",
    oracle="""
    SELECT custkey, orderkey, price, rn FROM (
      SELECT o_custkey AS custkey, o_orderkey AS orderkey, o_totalprice AS price,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (operators/topk.py). Spark rewrites
    the rank filter into a per-partition group limit before the
    shuffle, so only k rows per group move — the scalable top-k."""
    orders = load_table(spark, sf_dir, "orders")
    return topk_per_group(
        orders.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("price"),
        ),
        group_cols=["custkey"],
        order_cols=[F.col("price").desc(), F.col("orderkey")],
        k=3,
    ).withColumn("rn", F.col("rn").cast("long"))


@query(
    "window_distribution_funcs",
    oracle="""
    SELECT o_orderkey AS orderkey, o_orderpriority AS priority,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window",),
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank ((rank-1)/(n-1))
    and cume_dist (rows<=current / n) per priority class — both exact
    integer ratios cast to double, so cross-engine bit-identical.
    The o_orderkey tiebreak makes rank deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
    )
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderpriority").alias("priority"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "window_nth_value",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           nth_value(o_totalprice, 2) OVER w AS second_price,
           first_value(o_orderkey) OVER w AS first_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("window",),
)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value / first_value with an explicit growing frame (both
    engines default differently — always spell frames out; same rule
    as the LOCF query)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.first("o_orderkey").over(w).alias("first_order"),
    )


@query(
    "window_ratio_to_report",
    oracle="""
    WITH g AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                         OVER (PARTITION BY o_custkey) AS VARCHAR) AS DOUBLE)
                 AS cust_total
        FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice, cust_total,
           o_totalprice / cust_total AS share_of_customer
    FROM g
    """,
    tags=("window", "ratio-to-report"),
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each order's share of its customer's total
    spend — the unframed-window share computation every revenue
    report needs (RATIO_TO_REPORT in Oracle terms). The per-partition
    total is an exact decimal window sum (order-independent — an
    unframed double SUM OVER would differ run-to-run at scale), the
    share is one double division. One shuffle on the partition key,
    no join: the window form beats aggregate-then-rejoin by reading
    the fact table once."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey")
    total = (
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        total.alias("cust_total"),
        (F.col("o_totalprice") / total).alias("share_of_customer"),
    )


@query(
    "window_topk_with_ties",
    oracle="""
    SELECT segment, c_custkey, acctbal, rnk
    FROM (
        SELECT c_mktsegment AS segment, c_custkey, c_acctbal AS acctbal,
               RANK() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC) AS rnk
        FROM customer
    )
    WHERE rnk <= 3
    ORDER BY segment, rnk, c_custkey
    """,
    tags=("window", "topk", "ties"),
)
def window_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per market segment WITH TIES (rank(), not
    row_number()): every row tied at the cutoff value is kept, the
    ANSI `FETCH FIRST n ROWS WITH TIES` semantics. The companion
    window_topk_per_group is the ties-broken variant; both exist
    because the two answer different product questions (quota vs
    threshold).

    Scale shape: identical to the row_number top-k — one shuffle on
    the group key, early rank-filter before anything wide; output is
    k-ish per group (k + tie overflow), bounded for any input size."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"))
    return (
        c.select(
            F.col("c_mktsegment").alias("segment"),
            "c_custkey",
            F.col("c_acctbal").alias("acctbal"),
            F.rank().over(w).alias("rnk"),
        )
        .where(F.col("rnk") <= 3)
        .orderBy("segment", "rnk", "c_custkey")
    )


@query(
    "window_rolling_median",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(CAST({_FIN_VALUE} AS DECIMAL(18,2)) * 100
                             AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    framed AS (
        SELECT event_type, day, cents,
               list_sort(list(cents) OVER (PARTITION BY event_type
                   ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
        FROM daily
    )
    SELECT event_type, day, cents,
           CAST(len(win) AS BIGINT) AS n_in_window,
           win[(len(win) + 1) // 2] AS median_cents
    FROM framed
    ORDER BY event_type, day
    """,
    tags=("window", "robust", "timeseries", "engine-addition"),
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day MEDIAN of each series' daily cents total — the
    robust smoother (a rolling mean chases one spiked day; the
    median ignores it). Exact: the trailing frame's values are
    collected, sorted, and the lower median (index ceil(n/2), n from
    the actual frame so leading edges are well-defined) picked by
    integer arithmetic — no percentile interpolation, no floats, so
    both engines agree to the cent.

    Scale: the fact scan collapses to |series|x|days| first; the
    collect_list frame holds at most 7 bigints per row (bounded by
    the frame, not the data), and one per-series sort serves the
    whole window stack."""
    cents = (finite_measure("value").cast("decimal(18,2)") * 100).cast("bigint")
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.sum(cents).cast("bigint").alias("cents"))
    )
    frame = (
        W.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    )
    framed = daily.withColumn(
        "win", F.array_sort(F.collect_list("cents").over(frame))
    )
    return framed.select(
        "event_type",
        "day",
        "cents",
        F.size("win").cast("bigint").alias("n_in_window"),
        F.element_at("win", F.expr("(size(win) + 1) div 2").cast("int")).alias(
            "median_cents"
        ),
    ).orderBy("event_type", "day")
