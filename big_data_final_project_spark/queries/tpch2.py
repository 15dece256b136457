"""TPC-H-style showcase queries, part 2: the remaining ten query
shapes (Q2 Q9 Q11 Q12 Q13 Q15 Q19 Q20 Q21 Q22), adapted to the
driver's star schema (FIXTURES.md §B).

Adaptations forced by the schema (no ``partsupp`` table; ``lineitem``
has no commitdate / receiptdate / shipmode; ``customer`` has no
phone):

- part→supplier relationships come from ``DISTINCT (l_partkey,
  l_suppkey)`` over lineitem (as in ``tpch_q16_supplier_variety``);
- "supply cost" proxies: ``s_acctbal`` as the Q2 ranking criterion,
  ``0.1 * p_retailprice * l_quantity`` as the Q9 cost term,
  ``l_extendedprice * l_quantity`` as the Q11 stock value;
- "late" = ``l_shipdate > o_orderdate + 60 days`` (Q12/Q21), the
  same substitution tpch_q4 uses for its commit-date check;
- Q22's phone-prefix country filter becomes a ``c_mktsegment``
  membership filter, and "no orders" becomes "no orders since
  1999-01-01" so the result is non-trivial on this data.

All money sums are decimal-routed (functions/numeric.py) so results
are order-independent — required both for the oracle hash and for
run-to-run stability on a real cluster. Scale notes live on each
query's docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load_table
from ..operators.scale import materialize
from ..functions.numeric import davg, davg_sql, dsum, dsum_sql
from ..registry import query


@query(
    "tpch_q2_best_supplier",
    oracle="""
    WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    eligible AS (
        SELECT p.p_partkey, p.p_name, s.s_name, n.n_name AS nation,
               s.s_acctbal
        FROM supply sp
        JOIN part p ON p.p_partkey = sp.l_partkey
        JOIN supplier s ON s.s_suppkey = sp.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE p.p_size = 15 AND p.p_type = 'SMALL' AND r.r_name = 'EUROPE'
    )
    SELECT e.p_partkey AS partkey, e.p_name AS part_name,
           e.s_name AS supp_name, e.nation, e.s_acctbal AS acctbal
    FROM eligible e
    JOIN (SELECT p_partkey, max(s_acctbal) AS mb
          FROM eligible GROUP BY p_partkey) m
      ON m.p_partkey = e.p_partkey AND e.s_acctbal = m.mb
    """,
    tags=("tpch", "subquery", "join"),
)
def tpch_q2_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-alike: for each qualifying part, the best (max-acctbal)
    European supplier who has supplied it. The correlated max
    subquery is decorrelated into a per-part aggregate joined back
    (Catalyst's own rewrite). Scale shape: the only big shuffle is
    the DISTINCT over (partkey, suppkey); part/supplier/nation/region
    all broadcast, and the filtered part list prunes `supply` before
    the distinct via a broadcast semi-join ordering."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    # Filter supply pairs by the (tiny) qualifying part list BEFORE
    # the distinct so the shuffle carries only matching parts.
    supply = (
        li.join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    eligible = (
        supply.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("n_name").alias("nation"),
            "s_acctbal",
        )
        # eligible feeds both the per-part max and the final equality
        # join — materialize the (tiny) table once instead of running
        # the distinct+join chain twice (diamond shape, no
        # ReusedExchange otherwise)
        .transform(materialize)
    )
    best = eligible.groupBy(F.col("p_partkey").alias("bk")).agg(
        F.max("s_acctbal").alias("mb")
    )
    return (
        eligible.join(
            F.broadcast(best),
            (F.col("bk") == F.col("p_partkey")) & (F.col("s_acctbal") == F.col("mb")),
        )
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            F.col("s_name").alias("supp_name"),
            "nation",
            F.col("s_acctbal").alias("acctbal"),
        )
    )


@query(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, {dsum_sql("amount")} AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount)
                 - 0.1 * p.p_retailprice * l.l_quantity AS amount
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    """,
    tags=("tpch", "join", "bench"),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-alike product-line profit by supplier nation and order year.
    Supply cost proxied as 10% of retail price (no partsupp table).
    Scale shape: the part filter broadcasts and prunes lineitem
    first; orders is the one shuffle join; supplier/nation broadcast.
    The profit expression can go negative — dsum still exact."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(amount).alias("sum_profit"))
    )


@query(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH base AS (
        SELECT l.l_partkey, l.l_extendedprice * l.l_quantity AS v
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE s.s_nationkey = 7
    )
    SELECT l_partkey AS partkey, {dsum_sql("v")} AS value
    FROM base
    GROUP BY l_partkey
    HAVING {dsum_sql("v")} > (SELECT {dsum_sql("v")} * 0.0004 FROM base)
    """,
    tags=("tpch", "subquery"),
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-alike important stock: parts whose supplied value (from one
    nation's suppliers) exceeds a fraction of that nation's total.
    The scalar subquery total is computed from the SAME base rows with
    the exact decimal sum — summing the per-group doubles instead
    would be order-dependent and break cross-engine equality. Scale
    shape: one shuffle for the per-part aggregate; the grand total is
    a one-row broadcast cross join; supplier broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").where(F.col("s_nationkey") == 7)
    base = li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")).select(
        "l_partkey", (F.col("l_extendedprice") * F.col("l_quantity")).alias("v")
    )
    per_part = base.groupBy(F.col("l_partkey").alias("partkey")).agg(
        dsum("v").alias("value")
    )
    total = base.agg((dsum("v") * 0.0004).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("value") > F.col("threshold"))
        .select("partkey", "value")
    )


@query(
    "tpch_q12_late_shipment_priority",
    oracle="""
    SELECT l_returnflag AS returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
    tags=("tpch", "join"),
)
def tpch_q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-alike: priority mix of late shipments (shipmode → return
    flag, receipt-vs-commit lateness → shipped >60 days after order).
    Conditional counts via SUM(CASE) stay inside the hash aggregate —
    one shuffle join on orderkey, one 1-key aggregate."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    tags=("tpch", "join", "groupby"),
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-alike customer order-count distribution: left join keeps
    zero-order customers (count(o_orderkey) counts non-nulls only),
    then a second aggregate histograms the counts. Scale shape: the
    first aggregate shuffles on custkey (same key as the join, so AQE
    can reuse the partitioning); the histogram aggregate is tiny."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("long").alias("custdist")
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {dsum_sql("l_extendedprice * (1 - l_discount)")} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("tpch", "subquery"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-alike top supplier by quarterly revenue. The view +
    max-subquery form decorrelates to: aggregate once, take the max
    (order-independent even in double), equality-filter. The decimal
    route makes the per-supplier revenues bit-identical across
    engines so the float equality is safe."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    # supplier-cardinality output, read twice (max + equality join):
    # one materialization instead of two full lineitem aggregations
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    ).transform(materialize)
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            "total_revenue",
        )
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
    SELECT {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    tags=("tpch", "filter", "join"),
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-alike discounted revenue under a 3-branch disjunctive
    brand/size/quantity predicate (container → size). The disjunction
    spans both tables so it can only apply post-join, but Catalyst
    extracts the common `p_brand IN (...)`-style implication for the
    broadcast side; lineitem's quantity bounds (1..30 overall) stay
    in the scan via derived min/max pushdown."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5) & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10) & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & (q >= 20) & (q <= 30))
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@query(
    "tpch_q20_promotion_suppliers",
    oracle=f"""
    SELECT s.s_suppkey AS suppkey, s.s_name AS name
    FROM supplier s
    WHERE s.s_nationkey = 3
      AND s.s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING {dsum_sql("l_quantity")} > 50
      )
    """,
    tags=("tpch", "subquery", "join"),
)
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-alike: suppliers in one nation who moved a significant
    quantity (>50 in 1997) of any 'small%' part — availqty-vs-sold
    becomes sold-above-threshold (no partsupp). Nested IN subqueries
    plan as a chain of semi-joins: part-name list broadcasts into the
    lineitem scan, the (suppkey, partkey) aggregate is the one
    shuffle, and its distinct suppkeys semi-join the supplier table."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    s = load_table(spark, sf_dir, "supplier").where(F.col("s_nationkey") == 3)
    movers = (
        li.join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum("l_quantity").alias("sq"))
        .where(F.col("sq") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select(F.col("s_suppkey").alias("suppkey"), F.col("s_name").alias("name"))
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name AS name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND s.s_nationkey = 5
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    """,
    tags=("tpch", "subquery", "join"),
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-alike suppliers who kept orders waiting: for finished
    orders, count a supplier's late line items where some other
    supplier participated in the order but no OTHER supplier was late
    (lateness = shipped >60 days after order date; the reference
    schema has no receipt/commit dates). The EXISTS / NOT EXISTS pair
    becomes a semi-join + anti-join over a shared `late` intermediate
    so the expensive lineitem⋈orders late-filter runs once. All three
    joins key on orderkey — at scale AQE reuses one hash partitioning
    across semi, anti, and the final count."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier").where(F.col("s_nationkey") == 5)
    # `late` feeds both the l1 stream side and the anti-join build:
    # without materialization the lineitem⋈orders late-filter is
    # computed twice (verified: no ReusedExchange in the plan).
    # Eager localCheckpoint = the repo's standard diamond-shape fix
    # (see dedup_minhash_pairs); at cluster scale this is a persisted
    # intermediate table.
    late = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .transform(materialize)
    )
    l1 = late.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")).select(
        "l_orderkey", "l_suppkey", "s_name"
    )
    others = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    return (
        l1.join(
            others,
            (F.col("ok2") == F.col("l_orderkey")) & (F.col("sk2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("ok3") == F.col("l_orderkey")) & (F.col("sk3") != F.col("l_suppkey")),
            "left_anti",
        )
        .groupBy(F.col("s_name").alias("name"))
        .agg(F.count("*").cast("long").alias("numwait"))
    )


Q22_SEGMENTS = ("BUILDING", "AUTOMOBILE", "MACHINERY")
_SEG_SQL = ", ".join(f"'{s}'" for s in Q22_SEGMENTS)


@query(
    "tpch_q22_dormant_customers",
    oracle=f"""
    WITH qualified AS (
        SELECT c_mktsegment AS segment, c_custkey, c_acctbal
        FROM customer
        WHERE c_mktsegment IN ({_SEG_SQL})
          AND c_acctbal > (
              SELECT {davg_sql("c_acctbal")} FROM customer
              WHERE c_acctbal > 0 AND c_mktsegment IN ({_SEG_SQL}))
    )
    SELECT segment, CAST(count(*) AS BIGINT) AS numcust,
           {dsum_sql("c_acctbal")} AS totacctbal
    FROM qualified q
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = q.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY segment
    """,
    tags=("tpch", "subquery", "join"),
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-alike dormant high-balance customers: above-average balance
    (average over positive balances in the same segments — exact
    decimal mean so the threshold is cross-engine identical), no
    orders since 1999, counted per market segment (the schema has no
    phone column, so segments replace country codes). Scale shape:
    the scalar average broadcasts; NOT EXISTS is an anti-join against
    the date-filtered orders projection; one final tiny aggregate."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin(*Q22_SEGMENTS)
    )
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(davg("c_acctbal").alias("ab"))
    recent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("long").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )
