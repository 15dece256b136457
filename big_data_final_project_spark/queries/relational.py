"""Core relational operators (SURVEY.md §2.6, M2).

The reference has zero joins / grouped aggregation / set ops (verified
in SURVEY §2.6: its only grouping is plotly's color key, app.py:402).
Everything here is the generalization the engine adds, expressed on
built-in DataFrame ops so Catalyst plans broadcast vs sort-merge,
pushes filters into scans, and AQE handles skew at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..data import load_table
from ..operators.scale import materialize
from ..functions.numeric import (
    davg,
    davg_sql,
    dsum,
    dsum_prod,
    dsum_prod_sql,
    dsum_sql,
    finite_measure,
    finite_measure_sql,
)
from ..operators.intervals import overlap_pairs
from ..operators.joins import asof_join
from ..registry import query


# --- joins -----------------------------------------------------------------


@query(
    "join_inner_star",
    oracle=f"""
    SELECT n.n_name AS nation, r.r_name AS region,
           count(*) AS n_orders, {dsum_sql("o.o_totalprice")} AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
    tags=("join", "groupby"),
)
def join_inner_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema inner join: fact ⋈ three dims. The dims are
    broadcast (map-side join, no shuffle of the fact table) — the
    100 TB plan: only `orders` streams, dims ship to executors."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


@query(
    "join_left_outer",
    oracle=f"""
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           count(o.o_orderkey) AS n_orders,
           coalesce({dsum_sql("o.o_totalprice")}, 0.0) AS spend
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    tags=("join", "groupby", "null"),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping order-less customers, with coalesce for
    the null aggregate (reference's null-fallback pattern app.py:375-379
    lifted to relational form)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("spend"),
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers holding at least one order
    above a threshold. No row multiplication, no columns from the
    right — cheapest existence test at scale."""
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_full_outer",
    oracle="""
    WITH od AS (SELECT date_trunc('month', o_orderdate) AS month, count(*) AS n_orders
                FROM orders GROUP BY 1),
         ld AS (SELECT date_trunc('month', l_shipdate) AS month, count(*) AS n_ships
                FROM lineitem GROUP BY 1)
    SELECT coalesce(od.month, ld.month) AS month,
           coalesce(od.n_orders, 0) AS n_orders,
           coalesce(ld.n_ships, 0) AS n_ships
    FROM od FULL OUTER JOIN ld ON od.month = ld.month
    """,
    tags=("join", "date"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two monthly aggregates — order months vs
    ship months, preserving months present on only one side."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    od = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.count("*").alias("n_orders")
    )
    ld = li.groupBy(F.date_trunc("month", "l_shipdate").alias("month")).agg(
        F.count("*").alias("n_ships")
    )
    return (
        od.join(ld, "month", "full_outer")
        .select(
            F.col("month"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_ships", F.lit(0)).alias("n_ships"),
        )
    )


@query(
    "join_theta_range",
    oracle=f"""
    SELECT p.p_brand AS brand,
           count(*) AS n,
           {davg_sql("l.l_extendedprice")} AS avg_price
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
               AND l.l_quantity BETWEEN p.p_size - 5 AND p.p_size + 5
    GROUP BY p.p_brand
    """,
    tags=("join", "range"),
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range (theta) join: quantity within ±5 of part size.
    The equi key carries the shuffle; the range predicate evaluates
    post-match, so no quadratic blowup."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (li.l_partkey == part.p_partkey)
        & (li.l_quantity >= part.p_size - 5)
        & (li.l_quantity <= part.p_size + 5)
    )
    return (
        li.join(F.broadcast(part), cond)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count("*").alias("n"), davg("l_extendedprice").alias("avg_price"))
    )


@query(
    "join_asof",
    oracle="""
    WITH clicks AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
         errors AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error')
    SELECT e.event_id AS event_id, e.user_id AS user_id, e.ts AS ts,
           c.value AS value_asof
    FROM errors e ASOF LEFT JOIN clicks c
      ON e.user_id = c.user_id AND c.ts <= e.ts
    """,
    tags=("join", "asof", "custom"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each 'error' event picks up the value of the most
    recent 'click' by the same user at or before it. Union-merge
    implementation (operators/joins.py) — one shuffle, no explosion;
    oracle uses DuckDB's native ASOF JOIN."""
    events = load_table(spark, sf_dir, "events")
    errors = events.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        errors, clicks, on="user_id", left_ts="ts", right_ts="ts", value_cols=["value"]
    )


# --- grouped aggregation variants ------------------------------------------


@query(
    "agg_multi_key",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           {dsum_sql("o_totalprice")} AS total,
           {davg_sql("o_totalprice")} AS avg_price,
           min(o_orderdate) AS first_order,
           max(o_orderdate) AS last_order
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
    tags=("groupby",),
)
def agg_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key GROUP BY with the full reference aggregate set
    (A1-A5) — partial aggregation map-side, one shuffle on the keys."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        dsum("o_totalprice").alias("total"),
        davg("o_totalprice").alias("avg_price"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT count(DISTINCT o_custkey) AS n_customers,
           count(DISTINCT o_orderstatus) AS n_statuses,
           count(*) AS n_orders
    FROM orders
    """,
    tags=("groupby", "distinct"),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct (expands to a two-phase aggregate)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.count("*").alias("n_orders"),
    )


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    tags=("distinct",),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a projection — hash aggregate, no sort."""
    return load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_nationkey"
    ).distinct()


@query("agg_approx_distinct", oracle=None, tags=("groupby", "approx"))
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++). Sketch internals are
    engine-specific so there is no exact oracle; the pytest suite
    checks the estimate against the exact count within rsd bounds.
    At 100 TB this replaces exact distinct wherever ±2% suffices —
    single pass, constant memory per group."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT coalesce(o_orderstatus, '(all)') AS status,
           coalesce(o_orderpriority, '(all)') AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
           count(*) AS n, {dsum_sql("o_totalprice")} AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("groupby", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals (status, priority) -> status ->
    grand total, with grouping_id to distinguish subtotal levels."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n"),
            dsum("o_totalprice").alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            F.col("gid").cast("long").alias("gid"),
            "n",
            "total",
        )
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT coalesce(l_returnflag, '(all)') AS returnflag,
           coalesce(l_linestatus, '(all)') AS linestatus,
           count(*) AS n, {dsum_sql("l_quantity")} AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("groupby", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping combinations in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), dsum("l_quantity").alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "n",
            "qty",
        )
    )


# --- set operations --------------------------------------------------------


@query(
    "setop_union_intersect_except",
    oracle="""
    WITH machinery AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'),
         building  AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         u AS (SELECT DISTINCT c_nationkey FROM (SELECT * FROM machinery UNION ALL SELECT * FROM building)),
         i AS (SELECT c_nationkey FROM machinery INTERSECT SELECT c_nationkey FROM building),
         e AS (SELECT c_nationkey FROM machinery EXCEPT SELECT c_nationkey FROM building)
    SELECT 'union' AS op, count(*) AS n FROM u
    UNION ALL SELECT 'intersect', count(*) FROM i
    UNION ALL SELECT 'except', count(*) FROM e
    """,
    tags=("setop",),
)
def setop_union_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over two segment slices, summarized
    as counts in one result."""
    customer = load_table(spark, sf_dir, "customer")
    # each slice feeds all three set ops — stage them once (the
    # un-staged form scanned customer 6x: 3 ops x 2 inputs)
    machinery = (
        customer.where(F.col("c_mktsegment") == "MACHINERY")
        .select("c_nationkey")
        .transform(materialize)
    )
    building = (
        customer.where(F.col("c_mktsegment") == "BUILDING")
        .select("c_nationkey")
        .transform(materialize)
    )
    u = machinery.unionByName(building).distinct().agg(F.count("*").alias("n")).select(
        F.lit("union").alias("op"), "n"
    )
    i = machinery.intersect(building).agg(F.count("*").alias("n")).select(
        F.lit("intersect").alias("op"), "n"
    )
    e = machinery.subtract(building).agg(F.count("*").alias("n")).select(
        F.lit("except").alias("op"), "n"
    )
    return u.unionByName(i).unionByName(e)


# --- pivot -----------------------------------------------------------------


@query(
    "pivot_status",
    oracle=f"""
    SELECT l_returnflag AS returnflag,
           {dsum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_F,
           {dsum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_O
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("pivot",),
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (explicit value list, so one pass,
    no values-discovery job)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("returnflag"))
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum("l_quantity"))
        .withColumnRenamed("F", "qty_F")
        .withColumnRenamed("O", "qty_O")
    )


@query(
    "sample_deterministic",
    oracle=None,
    tags=("sample",),
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample + count, via Spark's native
    ``sample(fraction, seed)`` operator.

    Determinism contract (VERDICT r8 #3, made explicit): Spark seeds
    its XORShift stream PER PARTITION (seed + partitionId over the
    row stream), so a fixed seed reproduces the exact row set only
    under a FIXED PARTITION LAYOUT — re-evaluating the same plan
    (retries, speculative tasks) is stable, but a repartition or a
    different scan split CHANGES the sampled rows at the same seed.
    Both halves are pinned in tests/test_round9_invariants.py
    (same-plan double-eval identical; repartition(1) vs
    repartition(64) differ). That layout-boundness is also why RNG
    streams differ across engines and there is no oracle (rows-only
    check). Content-keyed sampling — reproducible across layouts,
    engines, and re-ingestions — is the production path:
    sample_exact_size_hash / sample_hash_stratified /
    sample_temperature_mix."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).agg(
        F.count("*").alias("n_sampled"),
        dsum("l_quantity").alias("qty"),
    )


@query(
    "agg_percentiles_exact",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.5) AS median,
           quantile_cont(l_quantity, 0.75) AS q75,
           max(l_quantity) AS q_max
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("groupby", "percentile"),
)
def agg_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group: Spark `percentile` and DuckDB
    `quantile_cont` share the linear-interpolation definition, so
    values are bit-comparable. Exact percentile sorts per group —
    the approx twin below is the 100 TB path."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.5)").alias("median"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75"),
        F.max("l_quantity").alias("q_max"),
    )


@query(
    "agg_percentiles_approx",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_quantity, 0.25) AS q25,
           quantile_disc(l_quantity, 0.5) AS q50,
           quantile_disc(l_quantity, 0.75) AS q75,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("groupby", "percentile", "approx"),
)
def agg_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (GK-sketch): mergeable partial state, no
    per-group sort — the scale path for quantiles. Oracle-pairable
    because the GK guarantee is a RANK error <= n/accuracy: with
    accuracy 1e6 and n <= 600k per group at test scales the bound is
    < 1 rank, i.e. the sketch is in its exact regime and must return
    the exact discrete quantile (DuckDB quantile_disc). At 100 TB the
    same query runs with the accuracy the memory budget affords and
    degrades to bounded-rank-error answers — the operator and plan
    shape don't change, only the guarantee.

    Scale guard (round 4, per ADVICE): accuracy derives from the
    actual table size (parquet footer read, no scan) so a larger
    sf_dir stays in the exact regime instead of silently leaving it
    and failing the differential. Capped at 2^26 (~67M) as the
    sketch's memory ceiling; above that per-group n the answer is
    bounded-rank-error (<= n / 2^26) by construction."""
    from ..data import _source_layout

    total_rows, _ = _source_layout(sf_dir, "lineitem")
    accuracy = max(1_000_000, min(total_rows + 1, 1 << 26))
    li = load_table(spark, sf_dir, "lineitem")
    aq = F.percentile_approx("l_quantity", [0.25, 0.5, 0.75], accuracy)
    return li.groupBy("l_returnflag").agg(
        F.element_at(aq, 1).alias("q25"),
        F.element_at(aq, 2).alias("q50"),
        F.element_at(aq, 3).alias("q75"),
        F.count("*").alias("n"),
    )


@query(
    "agg_variance_exact",
    oracle="""
    SELECT l_linestatus,
           count(*) AS n,
           (CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(27,8))) AS DOUBLE)
            - CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
              * CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*))
           / (count(*) - 1) AS var_qty
    FROM lineitem GROUP BY l_linestatus
    """,
    tags=("groupby", "stats"),
)
def agg_variance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sample variance via the sum-of-squares identity
    with decimal-exact sums — order-independent where the built-in
    single-pass var_samp is partition-order sensitive in the low
    bits. (l_quantity is 2-decimal, so squares are exact in
    DECIMAL(27,8).)"""
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count("*")
    sx = F.sum((F.col("l_quantity")).cast("decimal(18,6)")).cast("double")
    sxx = F.sum(
        (F.col("l_quantity") * F.col("l_quantity")).cast("decimal(27,8)")
    ).cast("double")
    return li.groupBy("l_linestatus").agg(
        n.alias("n"),
        ((sxx - sx * sx / n) / (n - 1)).alias("var_qty"),
    )


@query(
    "agg_stats_moments",
    oracle="""
    WITH s AS (
        SELECT l_linestatus,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sx,
               CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(27,8))) AS VARCHAR) AS DOUBLE) AS sxx,
               CAST(CAST(SUM(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(32,8))) AS VARCHAR) AS DOUBLE) AS sxxx,
               CAST(CAST(SUM(CAST(l_quantity * l_quantity * l_quantity * l_quantity AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS sxxxx
        FROM lineitem GROUP BY l_linestatus
    ),
    r AS (
        SELECT l_linestatus, n, sx, sxx,
               sx / n AS mu, sxx / n AS sxx_n,
               sxxx / n AS sxxx_n, sxxxx / n AS sxxxx_n
        FROM s
    ),
    m AS (
        SELECT l_linestatus, n, sx, sxx, mu,
               sxx_n - mu * mu AS m2,
               sxxx_n - 3.0 * mu * sxx_n + 2.0 * mu * mu * mu AS m3,
               sxxxx_n - 4.0 * mu * sxxx_n + 6.0 * (mu * mu) * sxx_n
                       - 3.0 * (mu * mu) * (mu * mu) AS m4
        FROM r
    )
    SELECT l_linestatus, CAST(n AS BIGINT) AS n,
           sqrt((sxx - sx * sx / n) / (n - 1.0)) AS sd_qty,
           (sxx - sx * sx / n) / (n - 1.0) AS var_qty,
           m3 / (m2 * sqrt(m2)) AS skew_qty,
           m4 / (m2 * m2) - 3.0 AS kurt_qty
    FROM m
    """,
    tags=("groupby", "stats"),
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic higher moments (stddev/var/skewness/kurtosis) via
    the raw-power-sum identity with decimal-exact sums: Σx..Σx⁴ are
    exact decimals (order-independent, mergeable — one shuffle, same
    partial-agg shape as the built-ins), and the double arithmetic on
    top uses an op tree mirrored verbatim in the oracle, so results
    are bit-identical across engines. The built-in single-pass
    skewness/kurtosis are partition-order-sensitive in the low bits;
    tests/test_properties.py pins these deterministic forms to the
    built-ins within float tolerance."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    agg = li.groupBy("l_linestatus").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x.cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum((x * x).cast("decimal(27,8)")).cast("double").alias("sxx"),
        F.sum((x * x * x).cast("decimal(32,8)")).cast("double").alias("sxxx"),
        F.sum((x * x * x * x).cast("decimal(38,8)")).cast("double").alias("sxxxx"),
    )
    r = agg.select(
        "l_linestatus", "n", "sx", "sxx",
        (F.col("sx") / F.col("n")).alias("mu"),
        (F.col("sxx") / F.col("n")).alias("sxx_n"),
        (F.col("sxxx") / F.col("n")).alias("sxxx_n"),
        (F.col("sxxxx") / F.col("n")).alias("sxxxx_n"),
    )
    mu, sxx_n = F.col("mu"), F.col("sxx_n")
    m = r.select(
        "l_linestatus", "n", "sx", "sxx", "mu",
        (sxx_n - mu * mu).alias("m2"),
        (F.col("sxxx_n") - F.lit(3.0) * mu * sxx_n
         + F.lit(2.0) * mu * mu * mu).alias("m3"),
        (F.col("sxxxx_n") - F.lit(4.0) * mu * F.col("sxxx_n")
         + F.lit(6.0) * (mu * mu) * sxx_n
         - F.lit(3.0) * (mu * mu) * (mu * mu)).alias("m4"),
    )
    n, sx, sxx, m2 = F.col("n"), F.col("sx"), F.col("sxx"), F.col("m2")
    var = (sxx - sx * sx / n) / (n - F.lit(1.0))
    return m.select(
        "l_linestatus",
        n.cast("long").alias("n"),
        F.sqrt(var).alias("sd_qty"),
        var.alias("var_qty"),
        (F.col("m3") / (m2 * F.sqrt(m2))).alias("skew_qty"),
        (F.col("m4") / (m2 * m2) - F.lit(3.0)).alias("kurt_qty"),
    )


@query(
    "agg_mode_deterministic",
    oracle="""
    SELECT priority, status AS mode_status, n AS mode_n
    FROM (
        SELECT o_orderpriority AS priority, o_orderstatus AS status,
               count(*) AS n,
               row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY count(*) DESC, o_orderstatus) AS rn
        FROM orders
        GROUP BY o_orderpriority, o_orderstatus
    ) t WHERE rn = 1
    """,
    tags=("groupby", "mode"),
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE (most frequent value per group): count +
    rank with a lexicographic tiebreak — the built-in ``F.mode``
    breaks ties arbitrarily, which can't be hash-compared across
    engines (or across two runs of the same cluster). Two shuffles:
    the (group, value) count and the tiny per-group window."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("priority").orderBy(F.col("n").desc(), "status")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("priority", F.col("status").alias("mode_status"), F.col("n").alias("mode_n"))
    )


@query(
    "agg_corr_exact",
    oracle=f"""
    WITH s AS (
        SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n,
               {dsum_sql("l_quantity")} AS sx,
               {dsum_sql("l_extendedprice")} AS sy,
               {dsum_prod_sql("l_quantity", "l_quantity")} AS sxx,
               {dsum_prod_sql("l_extendedprice", "l_extendedprice")} AS syy,
               {dsum_prod_sql("l_quantity", "l_extendedprice")} AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           (n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr_qty_price
    FROM s
    """,
    tags=("groupby", "statistics"),
)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Pearson correlation: the built-in ``corr`` uses
    a streaming covariance update whose float error depends on
    partition merge order, so it can't hash-match across engines (or
    runs). Computing the five decimal-exact sums and combining in
    one final double expression is order-independent AND still one
    map-side-combined shuffle — same cost, reproducible answer."""
    li = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        dsum(q).alias("sx"),
        dsum(p).alias("sy"),
        dsum_prod(q, q).alias("sxx"),
        dsum_prod(p, p).alias("syy"),
        dsum_prod(q, p).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return s.select(
        "l_returnflag",
        (
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("corr_qty_price"),
    )


@query(
    "setop_all_variants",
    oracle="""
    WITH machinery AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'),
         building  AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         ia AS (SELECT c_nationkey FROM machinery INTERSECT ALL
                SELECT c_nationkey FROM building),
         ea AS (SELECT c_nationkey FROM machinery EXCEPT ALL
                SELECT c_nationkey FROM building)
    SELECT 'intersect_all' AS op, count(*) AS n FROM ia
    UNION ALL SELECT 'except_all', count(*) FROM ea
    """,
    tags=("setop",),
)
def setop_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (ALL) set operations — duplicates preserved by
    multiplicity arithmetic (min for INTERSECT ALL, saturating
    difference for EXCEPT ALL), unlike the set-semantics forms in
    setop_union_intersect_except. Spark plans both as aggregate +
    join on the value — one shuffle each, no distinct."""
    customer = load_table(spark, sf_dir, "customer")
    machinery = customer.where(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey")
    building = customer.where(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    ia = machinery.intersectAll(building).agg(F.count("*").alias("n")).select(
        F.lit("intersect_all").alias("op"), "n"
    )
    ea = machinery.exceptAll(building).agg(F.count("*").alias("n")).select(
        F.lit("except_all").alias("op"), "n"
    )
    return ia.unionByName(ea)


@query(
    "join_null_safe",
    oracle="""
    WITH a AS (SELECT c_custkey AS k, nullif(c_mktsegment, 'BUILDING') AS seg
               FROM customer),
         b AS (SELECT DISTINCT nullif(c_mktsegment, 'BUILDING') AS seg
               FROM customer)
    SELECT CAST(count(*) AS BIGINT) AS n_matched,
           CAST(SUM(CASE WHEN a.seg IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_matched
    FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.seg
    """,
    tags=("join", "null"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys match NULL keys instead of vanishing — the semantics a
    dimension join needs when 'unknown' is itself a category
    (ordinary equi-joins silently drop every NULL-keyed fact row).
    NULLIF manufactures the null class deterministically from data.
    Scale note: all NULL keys land in ONE hash bucket, so a null-safe
    join on a mostly-null key is a planted skew case — the salting
    pattern (operators/salting.py) or a null-split union handles it."""
    c = load_table(spark, sf_dir, "customer")
    a = c.select(
        F.col("c_custkey").alias("k"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
    )
    b = a.select("seg").distinct().select(F.col("seg").alias("seg_b"))
    return (
        a.join(F.broadcast(b), a.seg.eqNullSafe(F.col("seg_b")))
        .agg(
            F.count("*").cast("long").alias("n_matched"),
            F.sum(F.when(F.col("seg").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null_matched"),
        )
    )


HIST_LO, HIST_W, HIST_K = 0.0, 5.0, 10  # [0,50) in 10 buckets


@query(
    "agg_histogram_fixed",
    oracle=f"""
    SELECT CAST(least(floor((l_quantity - {HIST_LO}) / {HIST_W}), {HIST_K - 1})
                AS BIGINT) AS bucket,
           {HIST_LO} + CAST(least(floor((l_quantity - {HIST_LO}) / {HIST_W}),
                {HIST_K - 1}) AS BIGINT) * {HIST_W} AS bucket_lo,
           count(*) AS n
    FROM lineitem
    GROUP BY bucket, bucket_lo
    """,
    tags=("groupby", "histogram"),
)
def agg_histogram_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram by floor arithmetic (top bucket
    saturating) — the profiling primitive, and at scale the cheap
    alternative to exact percentiles: one scan, K groups, map-side
    combine; no sort, no window."""
    li = load_table(spark, sf_dir, "lineitem")
    b = F.least(
        F.floor((F.col("l_quantity") - HIST_LO) / HIST_W), F.lit(HIST_K - 1)
    ).cast("long")
    return (
        li.select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            (HIST_LO + F.col("bucket") * HIST_W).alias("bucket_lo"),
            "n",
        )
    )


# Overlapping value bands: a genuine range-join target (overlaps mean
# no single-bucket arithmetic can assign rows; a join is required).
VALUE_BANDS = (
    ("tiny", 0.0, 20.0),
    ("small", 10.0, 60.0),
    ("medium", 40.0, 150.0),
    ("large", 100.0, 500.0),
    ("tail", 300.0, 500.0),
)
_BAND_STEP = 50.0  # bucketization grid for the equi-join rewrite
_BANDS_SQL = " UNION ALL ".join(
    f"SELECT '{n}' AS band, {lo} AS lo, {hi} AS hi" for n, lo, hi in VALUE_BANDS
)


@query(
    "join_range_bucketized",
    oracle=f"""
    WITH bands AS ({_BANDS_SQL})
    SELECT b.band,
           count(*) AS n,
           CAST(CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
             AS total_value
    FROM events e JOIN bands b
      ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
    tags=("join", "range", "bucketized"),
)
def join_range_bucketized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PURE range join (no equi key: overlapping value bands, so one
    row can match several bands) rewritten as an equi-join: each band
    explodes onto the fixed-step grid cells it covers, each event
    maps to its one cell, the join runs on the cell id, and the
    precise range predicate filters post-match. Naively this plans
    as BroadcastNestedLoopJoin — O(rows x bands) compares and, with
    a big build side, a cluster-killer at 100 TB; the grid rewrite is
    a hash join whose per-row work is the band density per cell
    (asserted nested-loop-free in tests/test_plans.py). Same trick
    as-of joins and interval overlaps use; step size trades grid
    fan-out against per-cell candidate count."""
    e = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [(n, lo, hi) for n, lo, hi in VALUE_BANDS], "band string, lo double, hi double"
    )
    cells = bands.select(
        "band",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / _BAND_STEP),
                # hi is exclusive: a band ending exactly on a grid line
                # does not cover the next cell
                F.floor((F.col("hi") - 1e-9) / _BAND_STEP),
            )
        ).alias("cell"),
    )
    ev = e.select("value", F.floor(F.col("value") / _BAND_STEP).alias("cell"))
    return (
        ev.join(F.broadcast(cells), "cell")
        .where((F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
        .groupBy("band")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "total_value"
            ),
        )
    )


@query(
    "agg_weighted_avg",
    oracle=f"""
    SELECT l_returnflag,
           {dsum_prod_sql("l_extendedprice", "l_quantity")}
             / {dsum_sql("l_quantity")} AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("groupby", "weighted"),
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price: ratio of two exact decimal
    sums — the correct aggregation when rows carry different weights
    (a plain AVG of unit prices answers a different question). Same
    single-shuffle cost as an unweighted aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (
            dsum_prod(F.col("l_extendedprice"), F.col("l_quantity"))
            / dsum("l_quantity")
        ).alias("wavg_price")
    )


@query(
    "agg_reaggregation",
    oracle=f"""
    WITH daily AS (
        SELECT date_trunc('day', o_orderdate) AS d, o_orderpriority AS priority,
               count(*) AS n, {dsum_sql("o_totalprice")} AS total
        FROM orders GROUP BY 1, 2
    )
    SELECT date_trunc('month', d) AS month, priority,
           CAST(SUM(n) AS BIGINT) AS n,
           {dsum_sql("total")} AS total,
           {dsum_sql("total")} / CAST(SUM(n) AS DOUBLE) AS avg_price
    FROM daily
    GROUP BY 1, 2
    """,
    tags=("groupby", "reaggregation"),
)
def agg_reaggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly rollup computed FROM the daily pre-aggregate — the
    pre-aggregated-table pattern every OLAP serving layer lives on:
    sums and counts compose across levels, so the monthly query
    reads |days| x |priorities| rows instead of the fact table;
    averages must be re-derived sum/count at the outer level (an
    AVG of daily averages would be wrong whenever day sizes differ).
    The outer decimal re-sum keeps the two-level result bit-equal to
    a direct monthly aggregate."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").alias("d"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count("*").alias("n"), dsum("o_totalprice").alias("total"))
    return daily.groupBy(
        F.date_trunc("month", "d").alias("month"), "priority"
    ).agg(
        F.sum("n").cast("long").alias("n"),
        dsum("total").alias("total"),
        (dsum("total") / F.sum("n").cast("double")).alias("avg_price"),
    )


@query(
    "join_salted_skew",
    oracle=f"""
    WITH skewed AS (
        SELECT CASE WHEN user_id < 30 THEN CAST(0 AS BIGINT)
                    ELSE user_id END AS k,
               value
        FROM events
    ),
    dim AS (
        SELECT DISTINCT user_id AS k,
               CAST(user_id % 7 AS BIGINT) AS grp
        FROM events
    )
    SELECT d.grp,
           count(*) AS n,
           {dsum_sql("s.value")} AS total_value
    FROM skewed s JOIN dim d ON s.k = d.k
    GROUP BY d.grp
    """,
    tags=("join", "skew", "salted"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed-key join through the explicit salting operator: ~20% of
    the fact rows collapse onto key 0 (synthesized hot key), which a
    plain hash join sends to ONE reducer; salting fans the hot key
    across 8 sub-keys and replicates the dim side per bucket
    (operators/salting.py). Same answer as the plain join — the
    oracle IS the unsalted SQL — with the hot partition split 8 ways.
    AQE's skew-join covers sort-merge cases adaptively; the explicit
    form covers skew AQE can't see and is the documented pattern for
    it."""
    from ..operators.salting import salted_inner_join

    e = load_table(spark, sf_dir, "events")
    skewed = e.select(
        F.when(F.col("user_id") < 30, F.lit(0).cast("long"))
        .otherwise(F.col("user_id"))
        .alias("k"),
        "value",
    )
    dim = (
        e.select(F.col("user_id").alias("k"))
        .distinct()
        .withColumn("grp", (F.col("k") % 7).cast("long"))
    )
    return (
        salted_inner_join(skewed, dim, "k")
        .groupBy("grp")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
    )


@query(
    "null_hygiene",
    oracle="""
    WITH dirty AS (
        SELECT c_custkey,
               nullif(c_mktsegment, 'BUILDING') AS seg,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
        FROM customer
    )
    SELECT
        count(CASE WHEN seg IS NULL OR bal IS NULL THEN 1 END) AS n_any_null,
        count(CASE WHEN seg IS NOT NULL AND bal IS NOT NULL THEN 1 END)
          AS n_complete,
        CAST(CAST(SUM(CAST(coalesce(bal, 0.0) AS DECIMAL(18,6)))
             AS VARCHAR) AS DOUBLE) AS filled_bal_total,
        count(CASE WHEN coalesce(seg, 'UNKNOWN') = 'UNKNOWN' THEN 1 END)
          AS n_filled_seg
    FROM dirty
    """,
    tags=("null", "hygiene"),
)
def null_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The null-hygiene audit every ingest runs — any-null count,
    complete-case (na.drop semantics) count, na.fill on a numeric and
    a string column — in ONE conditional-aggregate pass: a single
    scan, a single job (round 1 ran 4 actions = 4 scans; fused per
    the same rewrite ref_time_range_counts uses). Nulls are
    manufactured deterministically with nullif/when so the query is
    self-contained. na.fill IS the exercised API (the null flags are
    captured before the fill); na.drop's plan surface is covered by
    tests/test_properties.py."""
    c = load_table(spark, sf_dir, "customer")
    dirty = c.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        F.when(F.col("c_acctbal") < 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    flagged = dirty.select(
        "*",
        (F.col("seg").isNull() | F.col("bal").isNull()).alias("any_null"),
    )
    filled = flagged.na.fill({"bal": 0.0, "seg": "UNKNOWN"})
    return filled.agg(
        F.count(F.when(F.col("any_null"), 1)).alias("n_any_null"),
        F.count(F.when(~F.col("any_null"), 1)).alias("n_complete"),
        F.sum(F.col("bal").cast("decimal(18,6)"))
        .cast("double")
        .alias("filled_bal_total"),
        F.count(F.when(F.col("seg") == "UNKNOWN", 1)).alias("n_filled_seg"),
    )


@query(
    "observe_scan_metrics",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
             AS qty_sum,
           CAST(count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS BIGINT)
             AS n_returned
    FROM lineitem
    """,
    tags=("observe", "metrics"),
)
def observe_scan_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's Observation/observe() surface — named metrics collected
    DURING a pass at zero extra cost (no second scan, no separate
    aggregation job): the production pattern for row-count /
    checksum / data-quality telemetry on every pipeline stage, where
    a separate audit query would double the IO. The observed pass
    here is a noop-sink write of the scan; the metrics come back on
    the driver and are emitted as a 1-row relation (decimal-routed
    sum, so the observed value is order-independent and
    oracle-exact)."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("scan_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias(
            "qty_sum"
        ),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_returned"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], float(m["qty_sum"]), m["n_returned"])],
        "n_rows long, qty_sum double, n_returned long",
    )


@query(
    "agg_listagg_sorted",
    oracle="""
    WITH ranked AS (
        SELECT c_mktsegment, c_name, c_acctbal,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey)
                 AS rn
        FROM customer
    )
    SELECT c_mktsegment,
           string_agg(c_name, ',' ORDER BY rn) AS top_names,
           count(*) AS n
    FROM ranked WHERE rn <= 5
    GROUP BY c_mktsegment
    """,
    tags=("agg", "listagg", "string-agg"),
)
def agg_listagg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG / STRING_AGG with a deterministic order — the report
    column every BI tool asks for. Spark has no ordered string_agg,
    so the engine composes it: top-k filter first (row_number ≤ 5 —
    the list is BOUNDED before any collection, the same discipline as
    the inverted-index postings), then sort_array(collect_list(
    struct(rank, name))) → transform → array_join. The struct sort
    makes the concatenation order explicit rather than
    partition-dependent — unordered collect_list would hash-mismatch
    against ANY engine, including a second Spark run.

    Scale: one window shuffle on the group key; the collected list is
    ≤ k per group by construction, so no group ever materializes an
    unbounded string."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    ranked = c.select(
        "c_mktsegment", "c_name", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= 5)
    return ranked.groupBy("c_mktsegment").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("rn", "c_name"))),
                lambda s: s["c_name"],
            ),
            ",",
        ).alias("top_names"),
        F.count("*").alias("n"),
    )


@query(
    "setop_union_by_name",
    oracle="""
    SELECT o_orderkey AS key, o_totalprice AS price,
           CAST(NULL AS VARCHAR) AS flag, 'orders' AS src
    FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT l_orderkey AS key, CAST(NULL AS DOUBLE) AS price,
           l_returnflag AS flag, 'lineitem' AS src
    FROM lineitem WHERE l_linenumber = 1 AND l_returnflag = 'R'
    """,
    tags=("setop", "union-by-name", "schema-evolution"),
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-independent union across heterogeneous schemas —
    unionByName(allowMissingColumns=True) — the operator that glues
    mixed-generation feeds together when one side has columns the
    other lacks (missing columns null-fill instead of silently
    misaligning by position, which is what plain UNION does when
    column orders drift). The batch twin of what the schema-evolution
    store read does at the file level.

    Scale: a union is a no-shuffle plan concatenation; both branches
    keep their own pushed filters (plan-visible), so each side scans
    only its slice."""
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(
            F.col("o_orderkey").alias("key"),
            F.col("o_totalprice").alias("price"),
            F.lit("orders").alias("src"),
        )
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where((F.col("l_linenumber") == 1) & (F.col("l_returnflag") == "R"))
        .select(
            F.col("l_orderkey").alias("key"),
            F.col("l_returnflag").alias("flag"),
            F.lit("lineitem").alias("src"),
        )
    )
    return o.unionByName(li, allowMissingColumns=True).select(
        "key", "price", "flag", "src"
    )


@query(
    "agg_concentration_hhi",
    oracle="""
    WITH c AS (
        SELECT c_mktsegment, c_nationkey, count(*) AS n
        FROM customer GROUP BY c_mktsegment, c_nationkey
    ),
    t AS (
        SELECT c_mktsegment,
               CAST(sum(n) AS BIGINT) AS total,
               CAST(sum(n * n) AS BIGINT) AS sum_sq,
               CAST(count(*) AS BIGINT) AS n_nations,
               CAST(max(n) AS BIGINT) AS top_share_n
        FROM c GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, total, n_nations,
           CAST(sum_sq AS DOUBLE) / (total * total) AS hhi,
           CAST(top_share_n AS DOUBLE) / total AS top_share
    FROM t
    """,
    tags=("agg", "concentration", "hhi"),
)
def agg_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration metrics per segment: the
    Herfindahl-Hirschman index (Σ shareᵢ²) and the largest single
    share — the skew/diversity monitor a corpus pipeline runs per
    source or per language before training (one dominant source =
    one dominant bias).

    Exactness trick: HHI = Σ(nᵢ/N)² is algebraically Σnᵢ²/N², so the
    whole statistic reduces to two integer sums and ONE double
    division — no per-key float shares are ever summed (which would
    be order-dependent). Two shuffles (key count, then group
    reduce), both map-side combinable."""
    c = load_table(spark, sf_dir, "customer")
    counts = c.groupBy("c_mktsegment", "c_nationkey").agg(F.count("*").alias("n"))
    t = counts.groupBy("c_mktsegment").agg(
        F.sum("n").cast("bigint").alias("total"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("sum_sq"),
        F.count("*").cast("bigint").alias("n_nations"),
        F.max("n").cast("bigint").alias("top_share_n"),
    )
    return t.select(
        "c_mktsegment",
        "total",
        "n_nations",
        (F.col("sum_sq").cast("double") / (F.col("total") * F.col("total"))).alias(
            "hhi"
        ),
        (F.col("top_share_n").cast("double") / F.col("total")).alias("top_share"),
    )


# Interval-overlap join: cell width must be >= the longest interval so
# every interval covers at most 2 cells. 2^26 us ~ 67.1s > 60s max.
_IVL_CELL_US = 1 << 26

_IVL_SETS_SQL = """
    ia AS (
        SELECT event_id AS a_id,
               epoch_us(ts) AS a_s,
               epoch_us(ts) + (10 + event_id % 51) * 1000000 AS a_e
        FROM events WHERE event_type = 'click'
    ),
    ib AS (
        SELECT event_id AS b_id,
               epoch_us(ts) AS b_s,
               epoch_us(ts) + (10 + event_id % 51) * 1000000 AS b_e
        FROM events WHERE event_type = 'view'
    )
"""


@query(
    "join_interval_overlap",
    oracle=f"""
    WITH {_IVL_SETS_SQL}
    SELECT COUNT(*) AS n_pairs,
           CAST(SUM(LEAST(a_e, b_e) - GREATEST(a_s, b_s)) AS BIGINT)
               AS total_overlap_us,
           CAST(MAX(LEAST(a_e, b_e) - GREATEST(a_s, b_s)) AS BIGINT)
               AS max_overlap_us
    FROM ia JOIN ib
      ON a_s < b_e AND b_s < a_e
    """,
    tags=("join", "interval", "overlap", "bucketized", "engine-addition"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (two half-open interval sets, pairs that
    overlap in time) — the genomics/session-collision workload —
    rewritten from the naive theta join into a CELL-blocked equi-join:
    with cell width >= the longest interval, every interval covers at
    most 2 cells; both sides explode onto their covered cells, the
    join runs on the integer cell id, the exact overlap predicate
    filters candidates, and each true pair is COUNTED EXACTLY ONCE by
    attributing it to the cell containing max(a_start, b_start) (the
    later-starting endpoint falls in exactly one cell). The oracle is
    the naive overlap theta join — same rows, different asymptotics
    (DuckDB's IEJoin grinds it at test scale; a distributed engine
    cannot).

    Scale shape: fan-out <= 2x per side, one shuffle on the cell id,
    per-cell candidates bounded by interval density per ~67s of
    timeline — temporal skew (a hot minute) is the spatial-skew
    problem again, salting/finer cells the same cure. All geometry in
    integer microseconds, so the differential is exact."""
    e = load_table(spark, sf_dir, "events")

    def side(tp: str, pre: str) -> DataFrame:
        s = F.unix_micros(F.col("ts"))
        dur = (F.lit(10) + F.col("event_id") % 51) * 1_000_000
        return e.where(F.col("event_type") == tp).select(
            F.col("event_id").alias(f"{pre}_id"),
            s.alias(f"{pre}_s"),
            (s + dur).alias(f"{pre}_e"),
        )

    pairs = overlap_pairs(
        side("click", "a"), side("view", "b"), _IVL_CELL_US
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("ov_len").alias("total_overlap_us"),
        F.max("ov_len").alias("max_overlap_us"),
    )


@query(
    "join_cardinality_audit",
    oracle="""
    WITH lk AS (
        SELECT l_orderkey AS k, COUNT(*) AS nl FROM lineitem GROUP BY 1
    ),
    ok AS (
        SELECT o_orderkey AS k, COUNT(*) AS no FROM orders GROUP BY 1
    ),
    m AS (
        SELECT lk.k, nl * no AS contrib
        FROM lk JOIN ok ON lk.k = ok.k
    ),
    actual AS (
        SELECT COUNT(*) AS n
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT CAST((SELECT SUM(contrib) FROM m) AS BIGINT) AS predicted_rows,
           CAST((SELECT n FROM actual) AS BIGINT) AS actual_rows,
           CAST((SELECT COUNT(*) FROM m) AS BIGINT) AS n_shared_keys,
           CAST((SELECT MAX(contrib) FROM m) AS BIGINT) AS max_key_rows
    """,
    tags=("join", "cardinality-estimation", "skew-audit", "engine-addition"),
)
def join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join cardinality forecast from per-key histograms, PROVEN
    against the join it predicts: |A join B| = sum over shared keys of
    count_A(k) * count_B(k), computed from two small key-count tables
    — the estimate a planner (or a pre-flight data audit) uses to
    veto a join that would explode, plus the per-key maximum that
    pinpoints skew BEFORE the shuffle hits it. The query also runs
    the actual join and returns both numbers; they must be equal,
    which turns the estimator's correctness into a differential-
    checkable fact rather than a comment.

    Scale shape: the histogram route aggregates each side to key
    grain first (map-side combinable, output = distinct keys, not
    rows) and joins the two SMALL key tables — at 100 TB this is the
    difference between auditing a join and paying for it. The
    real-join leg exists to pin the identity at test scale; a
    production audit runs only the histogram leg (drop the `actual`
    branch — the planner decision needs no ground truth)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lk = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("nl")
    )
    ok = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("no")
    )
    m = lk.join(ok, "k").select((F.col("nl") * F.col("no")).alias("contrib"))
    est = m.agg(
        F.sum("contrib").alias("predicted_rows"),
        F.count(F.lit(1)).alias("n_shared_keys"),
        F.max("contrib").alias("max_key_rows"),
    )
    actual = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .agg(F.count(F.lit(1)).alias("actual_rows"))
    )
    return est.crossJoin(F.broadcast(actual)).select(
        "predicted_rows", "actual_rows", "n_shared_keys", "max_key_rows"
    )


@query(
    "agg_argmax_deterministic",
    oracle=f"""
    SELECT event_type,
           arg_max(user_id, lpad(CAST(CAST(ROUND({finite_measure_sql("value")}
                                      * 1000000) AS BIGINT)
                                      AS VARCHAR), 16, '0')
                            || '|' || lpad(CAST(event_id AS VARCHAR), 12, '0'))
               AS top_user,
           arg_min(user_id, lpad(CAST(CAST(ROUND({finite_measure_sql("value")}
                                      * 1000000) AS BIGINT)
                                      AS VARCHAR), 16, '0')
                            || '|' || lpad(CAST(event_id AS VARCHAR), 12, '0'))
               AS bottom_user,
           MAX({finite_measure_sql("value")}) AS top_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("groupby", "argmax", "max_by", "determinism"),
)
def agg_argmax_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by (argmax aggregates) made DETERMINISTIC: who
    generated each event type's highest- and lowest-valued event.
    Plain max_by(user, value) is underspecified under value ties —
    Spark returns an arbitrary tied row, and two runs (let alone two
    engines) may disagree. The fix is a composite ordering key with a
    unique tiebreak, encoded as a fixed-width string (value in
    positive micro-units, then event_id) because DuckDB's arg_max
    accepts no struct ordering key — lexicographic order on the
    padded string IS the numeric composite order on both engines.

    Scale shape: argmax aggregates are single-pass and map-side
    combinable (each partial keeps one candidate) — strictly cheaper
    than the window row_number() formulation of ref_latest_record,
    and the right tool when only the argmax row's single column is
    needed. Rounding note: value >= 0 here, where Spark's HALF_UP and
    DuckDB's half-away rounding agree. The measure is finite-gated
    (non-finite -> NULL key, skipped like the NULL readings both
    engines already agree on — round-8 finite-measure contract)."""
    e = load_table(spark, sf_dir, "events")
    key = F.concat(
        F.lpad(
            F.round(finite_measure("value") * 1_000_000)
            .cast("bigint")
            .cast("string"),
            16,
            "0",
        ),
        F.lit("|"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        e.groupBy("event_type")
        .agg(
            F.max_by("user_id", key).alias("top_user"),
            F.min_by("user_id", key).alias("bottom_user"),
            F.max(finite_measure("value")).alias("top_value"),
        )
        .orderBy("event_type")
    )


_ASOF_TOL_US = 3_600_000_000  # 1 hour staleness bound


@query(
    "join_asof_tolerance",
    oracle=f"""
    WITH errors AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    ),
    clicks AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    ),
    j AS (
        SELECT e.event_id, e.user_id,
               epoch_us(e.ts) - epoch_us(c.ts) AS gap_us,
               c.value AS v
        FROM errors e ASOF LEFT JOIN clicks c
          ON e.user_id = c.user_id AND e.ts >= c.ts
    )
    SELECT event_id, user_id,
           CASE WHEN gap_us <= {_ASOF_TOL_US} THEN v END AS value_asof,
           CASE WHEN gap_us <= {_ASOF_TOL_US} THEN gap_us END
               AS staleness_us
    FROM j
    ORDER BY event_id
    LIMIT 25
    """,
    tags=("join", "asof", "tolerance", "engine-addition"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a STALENESS BOUND (pandas `merge_asof
    tolerance=` / kdb wj semantics): each error event takes the most
    recent same-user click, but only if it is at most 1 hour old —
    older context is stale and must read as missing, not silently
    joined. The bound is a post-match null-out on the carried match
    timestamp, so it costs nothing on top of the plain as-of
    union-merge (one user_id shuffle, no explosion); DuckDB's native
    ASOF JOIN plus the same CASE pins it.

    Scale shape: identical to join_asof — the tolerance predicate is
    per-row arithmetic after the merge, and at 100 TB it REDUCES
    downstream volume (stale matches become nulls that aggregate
    paths can drop)."""
    events = load_table(spark, sf_dir, "events")
    errors = events.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        events.where(F.col("event_type") == "click")
        .select("user_id", "ts", "value")
        .withColumn("matched_us", F.unix_micros("ts"))
    )
    j = asof_join(
        errors,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["value", "matched_us"],
    )
    gap = F.unix_micros(F.col("ts")) - F.col("matched_us_asof")
    fresh = gap <= _ASOF_TOL_US
    return (
        j.select(
            "event_id",
            "user_id",
            F.when(fresh, F.col("value_asof")).alias("value_asof"),
            F.when(fresh, gap).alias("staleness_us"),
        )
        .orderBy("event_id")
        .limit(25)
    )


@query(
    "agg_weighted_percentile",
    oracle="""
    WITH g AS (
        SELECT l_returnflag, l_quantity,
               SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS w
        FROM lineitem GROUP BY 1, 2
    ),
    c AS (
        SELECT l_returnflag, l_quantity, w,
               SUM(w) OVER (PARTITION BY l_returnflag
                            ORDER BY l_quantity) AS cumw,
               SUM(w) OVER (PARTITION BY l_returnflag) AS total
        FROM g
    )
    SELECT l_returnflag,
           MIN(l_quantity) FILTER (WHERE 2 * cumw >= total)
               AS weighted_median_qty
    FROM c
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("groupby", "weighted-percentile", "engine-addition"),
)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median: the quantity at which half the REVENUE mass
    sits below, per return flag — the latency-percentile/price-mass
    aggregate neither Spark nor most engines ship natively (percentile
    weighs rows equally). Formulation: collapse to distinct values
    with exact decimal weight sums, cumulative-sum along the value
    axis, pick the first value where 2·cumw >= total — every compare
    is exact decimal, so the chosen value is engine- and
    partitioning-independent (a float-weight cumsum would near-tie at
    the median and flip the pick).

    Scale shape: the distinct-value collapse is the scale move (raw
    rows -> value-domain rows, map-side combinable); the window runs
    per group over the (small) value domain. Arbitrary quantiles =
    replace 2·cumw >= total with 100·cumw >= q·total, same machinery."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag", "l_quantity").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias("w")
    )
    wo = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    wp = Window.partitionBy("l_returnflag")
    c = g.select(
        "l_returnflag",
        "l_quantity",
        F.sum("w").over(wo).alias("cumw"),
        F.sum("w").over(wp).alias("total"),
    )
    return (
        c.where(2 * F.col("cumw") >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(F.min("l_quantity").alias("weighted_median_qty"))
        .orderBy("l_returnflag")
    )


@query(
    "pivot_multi_agg",
    oracle=f"""
    SELECT l_returnflag,
           CAST(count(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS f_n,
           {dsum_sql("CASE WHEN l_linestatus = 'F' THEN l_extendedprice END")}
               AS f_rev,
           CAST(count(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS o_n,
           {dsum_sql("CASE WHEN l_linestatus = 'O' THEN l_extendedprice END")}
               AS o_rev
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("pivot", "multi-aggregate", "relational"),
)
def pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with MULTIPLE aggregates per cell (count + decimal-exact
    revenue for each line status) — the cross-tab report surface
    beyond the single-measure `pivot_status`. Pivot values are
    declared explicitly, which is the scale rule: an undeclared
    pivot runs a distinct-values job first AND caps at
    spark.sql.pivotMaxValues, while a declared one is a single
    conditional-aggregate pass (exactly the oracle's FILTER form —
    one scan, one group-key shuffle, map-side combinable). Missing
    cells: counts coalesce to 0 (SQL count semantics), sums stay
    NULL on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_extendedprice").alias("rev"),
        )
    )
    return p.select(
        "l_returnflag",
        F.coalesce(F.col("F_n"), F.lit(0)).cast("bigint").alias("f_n"),
        F.col("F_rev").alias("f_rev"),
        F.coalesce(F.col("O_n"), F.lit(0)).cast("bigint").alias("o_n"),
        F.col("O_rev").alias("o_rev"),
    ).orderBy("l_returnflag")


SAMPLE_EXACT_N = 1000


@query(
    "sample_exact_size_hash",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
    LIMIT {SAMPLE_EXACT_N}
    """,
    tags=("sampling", "deterministic", "topk"),
)
def sample_exact_size_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-size uniform sample without RNG: order by a content hash
    of the key and take the first N — the k-minimum-values idea as a
    sample. Unlike threshold gating (sample_hash_stratified: size is
    only approximate) or seeded rand() (sample_deterministic:
    engine/partitioning-dependent, rows-only checkable), this is
    exactly N rows, identical on any engine, any partitioning, any
    retry — and MERGEABLE: the union of two shards' hash-top-N
    contains the global top-N, which is how a 100 TB table yields an
    exact-size sample from per-partition heaps
    (TakeOrderedAndProject — no global sort, no single reducer; the
    same plan shape as every top-k in this engine). md5 is uniform,
    so hash-order ≈ uniform random order with a fixed, auditable
    "seed"."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(
            F.md5(F.col("o_orderkey").cast("string")), F.col("o_orderkey")
        )
        .limit(SAMPLE_EXACT_N)
    )


@query(
    "agg_mad_robust",
    oracle="""
    WITH m AS (
        SELECT l_returnflag AS g, quantile_cont(l_quantity, 0.5) AS med
        FROM lineitem GROUP BY 1
    )
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           min(m.med) AS med,
           quantile_cont(abs(l.l_quantity - m.med), 0.5) AS mad
    FROM lineitem l JOIN m ON l.l_returnflag = m.g
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    tags=("groupby", "robust-statistics", "mad"),
)
def agg_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust spread
    estimate (outlier-immune, unlike stddev) behind every
    median±k·MAD anomaly gate. Two aggregation passes by necessity
    (MAD is a median OF deviations FROM a median): pass 1 reduces
    each group to one median row, broadcast back; pass 2 re-scans
    column-pruned and aggregates |x − med| — the threshold/two-pass
    pattern (PLANS.md taxonomy), which at 100 TB beats materializing
    a deviations copy of the fact table. Spark `percentile` and
    DuckDB `quantile_cont` share the linear-interpolation definition
    (agg_percentiles_exact), and |x − med| is the same double on
    both engines, so the MAD matches bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy(F.col("l_returnflag").alias("g")).agg(
        F.expr("percentile(l_quantity, 0.5)").alias("med")
    )
    return (
        li.join(F.broadcast(m), li.l_returnflag == F.col("g"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("med").alias("med"),
            F.expr("percentile(abs(l_quantity - med), 0.5)").alias("mad"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    ),
    errors AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    ),
    b AS (
        SELECT e.event_id, e.user_id, e.ts, c.ts AS bts, c.value AS bval
        FROM errors e ASOF LEFT JOIN clicks c
          ON e.user_id = c.user_id AND c.ts <= e.ts
    ),
    f AS (
        SELECT e.event_id, c.ts AS fts, c.value AS fval
        FROM errors e ASOF LEFT JOIN clicks c
          ON e.user_id = c.user_id AND c.ts > e.ts
    )
    SELECT b.event_id, b.user_id, b.ts,
           CASE WHEN fts IS NULL
                  OR (bts IS NOT NULL
                      AND epoch_us(b.ts) - epoch_us(bts)
                          <= epoch_us(fts) - epoch_us(b.ts))
                THEN bval ELSE fval END AS nearest_value,
           CASE WHEN bts IS NULL AND fts IS NULL THEN NULL
                WHEN fts IS NULL
                  OR (bts IS NOT NULL
                      AND epoch_us(b.ts) - epoch_us(bts)
                          <= epoch_us(fts) - epoch_us(b.ts))
                THEN CAST(epoch_us(b.ts) - epoch_us(bts) AS BIGINT)
                ELSE CAST(epoch_us(fts) - epoch_us(b.ts) AS BIGINT)
           END AS gap_us
    FROM b JOIN f USING (event_id)
    """,
    tags=("join", "asof", "nearest", "custom"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-neighbor as-of join (either direction in time): each
    'error' picks the closest 'click' by the same user — before OR
    after — with equal distances resolved to the earlier one. This is
    the sensor-fusion / log-correlation variant plain (backward-only)
    as-of can't express; gap_us reports how stale the match is.

    Implementation is ONE union-merge window pass (not two joins):
    errors and clicks union-sort per user on (µs, kind) — clicks
    first on timestamp ties, so a same-instant click matches backward
    with gap 0 — then an ignore-nulls LAST over the preceding frame
    (previous click) and FIRST over the following frame (next click)
    resolve both directions from the same sorted shuffle. One
    exchange on user_id total; the oracle spends two native ASOF
    joins to say the same thing.

    Scale shape: identical to join_asof (union-merge: no row
    explosion, state = one struct per direction per row); the choose
    step is a narrow projection."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ets"),
        F.struct(
            F.unix_micros("ts").alias("cus"), F.col("value").alias("cval")
        ).alias("cs"),
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.lit(1).alias("kind"),
        "event_id",
        F.col("ts").alias("ets"),
        F.lit(None)
        .cast("struct<cus:bigint,cval:double>")
        .alias("cs"),
    )
    u = errors.unionByName(clicks)
    w = Window.partitionBy("user_id").orderBy("us", "kind")
    wp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = w.rowsBetween(1, Window.unboundedFollowing)
    marked = u.select(
        "user_id",
        "us",
        "kind",
        "event_id",
        "ets",
        F.last("cs", ignorenulls=True).over(wp).alias("prev"),
        F.first("cs", ignorenulls=True).over(wf).alias("nxt"),
    ).where(F.col("kind") == 1)
    gap_prev = F.col("us") - F.col("prev.cus")
    gap_next = F.col("nxt.cus") - F.col("us")
    take_prev = F.col("nxt").isNull() | (
        F.col("prev").isNotNull() & (gap_prev <= gap_next)
    )
    return marked.select(
        "event_id",
        "user_id",
        F.col("ets").alias("ts"),
        F.when(
            F.col("prev").isNull() & F.col("nxt").isNull(),
            F.lit(None).cast("double"),
        )
        .when(take_prev, F.col("prev.cval"))
        .otherwise(F.col("nxt.cval"))
        .alias("nearest_value"),
        F.when(
            F.col("prev").isNull() & F.col("nxt").isNull(),
            F.lit(None).cast("bigint"),
        )
        .when(take_prev, gap_prev.cast("bigint"))
        .otherwise(gap_next.cast("bigint"))
        .alias("gap_us"),
    )


GINI_RANGE_PARTITIONS = 8


@query(
    "agg_gini_concentration",
    oracle="""
    WITH u AS (
        SELECT o_custkey,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS x
        FROM orders GROUP BY 1
    ),
    r AS (
        SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS i FROM u
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS total_cents,
               CAST(sum(i * x) AS BIGINT) AS wsum
        FROM r
    )
    SELECT n, total_cents, wsum,
           CAST(2 * wsum AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(total_cents AS DOUBLE))
             - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE) AS gini
    FROM m
    """,
    tags=("groupby", "gini", "concentration", "prefix-sum"),
)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue — the standard
    inequality/concentration index (0 = uniform, →1 = winner-takes-
    all) that events_power_users_pareto approximates with two
    thresholds. Computed from the rank-weighted formula
    G = 2·Σ i·xᵢ / (n·Σx) − (n+1)/n over integer CENTS, so n,
    Σx and Σ i·xᵢ are exact bigints (value ties are rank-order
    independent: equal x makes Σ i·xᵢ invariant under tie
    permutation) and both engines evaluate the identical final
    float expression.

    Scale shape: ranks come from the SAME distributed total-order
    trick as ml_auc_exact / pipeline_global_rank —
    repartitionByRange(revenue, custkey), per-partition row_number,
    plus a P-value driver-side offset cumsum; no single-partition
    global window at any size. One customer-grain aggregate + one
    range exchange + a one-row rollup."""
    o = load_table(spark, sf_dir, "orders")
    u = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("x")
        )
        .repartitionByRange(GINI_RANGE_PARTITIONS, "x", "o_custkey")
        .withColumn("pid", F.spark_partition_id())
        .transform(materialize)
    )
    per_part = {
        r["pid"]: r["c"] for r in u.groupBy("pid").count().withColumnRenamed("count", "c").collect()
    }
    offsets, running = [], 0
    for pid in range(GINI_RANGE_PARTITIONS):
        offsets.append((pid, running))
        running += int(per_part.get(pid, 0))
    off = spark.createDataFrame(offsets, "pid int, off long")
    w = Window.partitionBy("pid").orderBy("x", "o_custkey")
    r = u.join(F.broadcast(off), "pid").select(
        "x", (F.row_number().over(w) + F.col("off")).alias("i")
    )
    m = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("total_cents"),
        F.sum(F.col("i") * F.col("x")).cast("bigint").alias("wsum"),
    )
    return m.select(
        "n",
        "total_cents",
        "wsum",
        (
            (2 * F.col("wsum")).cast("double")
            / (F.col("n").cast("double") * F.col("total_cents").cast("double"))
            - (F.col("n") + 1).cast("double") / F.col("n").cast("double")
        ).alias("gini"),
    )


_COV_VARS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@query(
    "agg_covariance_matrix",
    oracle=f"""
    WITH m AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               {", ".join(f'{dsum_sql(v)} AS s_{v}' for v in _COV_VARS)},
               {", ".join(
                   f'{dsum_prod_sql(a, b)} AS p_{a}_{b}'
                   for i, a in enumerate(_COV_VARS)
                   for b in _COV_VARS[i:]
               )}
        FROM lineitem
    )
    SELECT * FROM (
        {" UNION ALL ".join(
            f"SELECT '{a}' AS var_a, '{b}' AS var_b, "
            f"(p_{a}_{b} - s_{a} * s_{b} / n) / n AS cov FROM m"
            for i, a in enumerate(_COV_VARS)
            for b in _COV_VARS[i:]
        )}
    ) t ORDER BY var_a, var_b
    """,
    tags=("groupby", "covariance", "statistics"),
)
def agg_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pairwise covariance matrix (upper triangle, 10 cells over
    4 measures) from ONE aggregation pass — the tabular sibling of
    ml_gram_matrix: every Σx and Σxy routes through exact decimal
    sums (dsum/dsum_prod), so the moment matrix is order- and
    partition-independent and the per-cell final expression
    (population covariance, ÷n) is the only float arithmetic —
    identical on both engines. This single-pass moment-matrix shape
    is how correlation-matrix jobs run at 100 TB: one scan, d(d+1)/2
    kilobyte partials, no per-pair re-scan."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for v in _COV_VARS:
        aggs.append(dsum(v).alias(f"s_{v}"))
    for i, a in enumerate(_COV_VARS):
        for b in _COV_VARS[i:]:
            aggs.append(dsum_prod(a, b).alias(f"p_{a}_{b}"))
    m = li.agg(*aggs)
    # Fan the 1-row moment matrix out to cells with ONE explode —
    # a 10-way union of selects over `m` would re-derive the
    # aggregate (and re-scan lineitem) once per cell.
    cell_structs = [
        F.struct(
            F.lit(a).alias("var_a"),
            F.lit(b).alias("var_b"),
            (
                (
                    F.col(f"p_{a}_{b}")
                    - F.col(f"s_{a}") * F.col(f"s_{b}") / F.col("n")
                )
                / F.col("n")
            ).alias("cov"),
        )
        for i, a in enumerate(_COV_VARS)
        for b in _COV_VARS[i:]
    ]
    return (
        m.select(F.explode(F.array(*cell_structs)).alias("c"))
        .select("c.*")
        .orderBy("var_a", "var_b")
    )


@query(
    "join_right_outer",
    oracle=f"""
    SELECT n.n_name AS nation,
           count(s.s_suppkey) AS n_suppliers,
           coalesce({dsum_sql("s.s_acctbal")}, 0.0) AS total_balance
    FROM supplier s
    RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    tags=("join", "right-outer", "null"),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join keeping supplier-less nations (zero-filled) —
    the report-completeness shape ("every region appears, even with
    no activity"). Catalyst canonicalizes right joins by swapping the
    sides, so the physical plan is a left join with the dimension
    broadcast; writing it RIGHT keeps the probe side (supplier, the
    big one at scale) streaming and the small side built — the
    orientation that matters at 100 TB."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supplier.join(
            F.broadcast(nation),
            supplier.s_nationkey == nation.n_nationkey,
            "right",
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("s_suppkey").alias("n_suppliers"),
            F.coalesce(dsum("s_acctbal"), F.lit(0.0)).alias("total_balance"),
        )
        .orderBy("nation")
    )


@query(
    "agg_median_bisect",
    oracle="""
    WITH vals AS (
        SELECT l_returnflag AS g,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS v
        FROM lineitem
    ),
    stats AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM vals GROUP BY g),
    ranked AS (
        SELECT g, v,
               row_number() OVER (PARTITION BY g ORDER BY v) AS rn
        FROM vals
    )
    SELECT r.g AS l_returnflag, r.v AS median_cents, s.n AS n,
           CAST((s.n + 1) // 2 AS BIGINT) AS k
    FROM ranked r JOIN stats s ON r.g = s.g
    WHERE r.rn = (s.n + 1) // 2
    ORDER BY 1
    """,
    tags=("agg", "selection", "iterative", "engine-addition"),
)
def agg_median_bisect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median WITHOUT a total sort: binary-search the
    integer cents domain with counting passes (the classic
    distributed exact-selection algorithm, 64-ary): each round maps
    every in-range value to one of 64 equal integer sub-intervals of
    its group's candidate range and counts per bucket — one
    map-side-combinable aggregate over the cached single-column
    projection — then descends into the bucket holding the k-th
    smallest value (k = ceil(n/2), the lower median). log_fanout(range)
    passes (2 at 4096-ary for a cents domain) replace the per-group
    sort; the oracle finds the same element the opposite way
    (row_number).

    Scale: this is how you take an exact median of a 100 TB column —
    no stage ever sorts or shuffles the data (counts only); the
    cached projection is a narrow 12-byte-per-row scan, and the
    probe state lives on the driver (|groups| scalars)."""
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "bigint"
    )
    vals = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_returnflag").alias("g"), cents.alias("v"))
        .persist()
    )
    bounds = {
        r["g"]: [r["lo"], r["hi"], (r["n"] + 1) // 2, r["n"]]
        for r in vals.groupBy("g")
        .agg(
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    # base[g] = #values < lo (already excluded from the interval)
    base = {g: 0 for g in bounds}
    # 4096-ary (r12 optimization): the histogram a pass collects is
    # |groups| x fanout scalars — raising fanout 64 -> 4096 is free
    # driver-side but halves the number of corpus passes
    # (log4096(range) = 2 for any cents domain under ~1.7e7; log64 was
    # 4). Same selected element every round, so results are unchanged.
    # Overflow headroom: bucketing computes (v - lo) * fanout, safe
    # while the interval width stays under 2^63/4096 ~= 2.2e15. That
    # is NOT every bigint domain (decimal(18,2)*100 admits ~1e18
    # cents; ADVICE r12 #2) — it is safe HERE because the interval is
    # [min, max] of l_extendedprice cents, bounded by the TPC-H price
    # formula at ~1.1e7 (v <= 2*2000*121.50*1.1 dollars), asserted
    # below so a domain change fails loudly instead of wrapping.
    fanout = 4096
    for g, (lo, hi, _k, _n) in bounds.items():
        assert (hi - lo + 1) <= (1 << 63) // fanout, (
            f"bisect interval for group {g!r} too wide for fanout {fanout}"
        )
    while True:
        open_groups = {g: b for g, b in bounds.items() if b[0] < b[1]}
        if not open_groups:
            break
        lo_expr, w_expr = None, None
        for g, (lo, hi, _k, _n) in open_groups.items():
            lo_c = F.when(F.col("g") == g, F.lit(lo))
            w_c = F.when(F.col("g") == g, F.lit(hi - lo + 1))
            lo_expr = lo_c if lo_expr is None else lo_expr.when(
                F.col("g") == g, F.lit(lo)
            )
            w_expr = w_c if w_expr is None else w_expr.when(
                F.col("g") == g, F.lit(hi - lo + 1)
            )
        counts = (
            vals.filter(F.col("g").isin(*open_groups))
            .withColumn("glo", lo_expr)
            .withColumn("gw", w_expr)
            .filter(
                (F.col("v") >= F.col("glo"))
                & (F.col("v") < F.col("glo") + F.col("gw"))
            )
            .groupBy(
                "g",
                F.expr(f"(v - glo) * {fanout} div gw").alias("bk"),
            )
            .agg(F.count("*").alias("c"))
            .collect()
        )
        hist: dict[str, dict[int, int]] = {g: {} for g in open_groups}
        for r in counts:
            hist[r["g"]][r["bk"]] = r["c"]
        for g, (lo, hi, k, _n) in open_groups.items():
            w = hi - lo + 1
            cum = base[g]
            for j in range(fanout):
                c = hist[g].get(j, 0)
                if cum + c >= k:
                    b = bounds[g]
                    b[0] = lo + (j * w + fanout - 1) // fanout
                    b[1] = min(hi, lo + ((j + 1) * w + fanout - 1) // fanout - 1)
                    base[g] = cum
                    break
                cum += c
    vals.unpersist()
    rows = [
        (g, int(b[0]), int(b[3]), int(b[2]))
        for g, b in sorted(bounds.items())
    ]
    return spark.createDataFrame(
        rows, "l_returnflag string, median_cents bigint, n bigint, k bigint"
    ).orderBy("l_returnflag")


@query(
    "agg_skyline_2d",
    oracle="""
    WITH stats AS (
        SELECT l_suppkey,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS rev_cents,
               CAST(sum(CAST(l_quantity AS BIGINT)) * 100
                    // count(*) AS BIGINT) AS qty_x100
        FROM lineitem GROUP BY 1
    )
    SELECT s1.l_suppkey, s1.rev_cents, s1.qty_x100
    FROM stats s1
    WHERE NOT EXISTS (
        SELECT 1 FROM stats s2
        WHERE s2.rev_cents >= s1.rev_cents
          AND s2.qty_x100 <= s1.qty_x100
          AND (s2.rev_cents > s1.rev_cents OR s2.qty_x100 < s1.qty_x100)
    )
    ORDER BY s1.rev_cents DESC, s1.l_suppkey ASC
    """,
    tags=("agg", "skyline", "window", "engine-addition"),
)
def agg_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): suppliers not dominated on
    (maximize revenue cents, minimize avg line quantity x100 — both
    exact integers). The Spark side is the O(n log n) sort-based
    skyline — two window minima replace the quadratic dominance
    check: m1 = best rival quantity among STRICTLY higher revenue
    (a RANGE frame ending 1 before the current revenue), m2 = best
    quantity among equal-revenue rows sorted first (a ROWS frame);
    a row survives iff neither beats it under strict dominance, so
    exact duplicates survive together. The oracle is the NOT EXISTS
    quadratic definition — same rows from an INDEPENDENT algorithm,
    which is the strongest kind of differential.

    Scale: the fact scan collapses to |suppliers| rows first; the
    windows sort only the model-sized stats table. The quadratic
    form never runs on Spark."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_suppkey").agg(
        F.sum(
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
                "bigint"
            )
        )
        .cast("bigint")
        .alias("rev_cents"),
        F.expr(
            "CAST(sum(CAST(l_quantity AS BIGINT)) * 100 div count(*)"
            " AS BIGINT)"
        ).alias("qty_x100"),
    )
    m1 = (
        Window.orderBy(F.col("rev_cents").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    m2 = (
        Window.partitionBy("rev_cents")
        .orderBy(F.col("qty_x100").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = stats.select(
        "*",
        F.min("qty_x100").over(m1).alias("best_higher_rev"),
        F.min("qty_x100").over(m2).alias("best_same_rev"),
    )
    dominated = (
        F.col("best_higher_rev").isNotNull()
        & (F.col("best_higher_rev") <= F.col("qty_x100"))
    ) | (
        F.col("best_same_rev").isNotNull()
        & (F.col("best_same_rev") < F.col("qty_x100"))
    )
    return (
        flagged.filter(~dominated)
        .select("l_suppkey", "rev_cents", "qty_x100")
        .orderBy(F.col("rev_cents").desc(), F.col("l_suppkey").asc())
    )


@query(
    "agg_alloc_largest_remainder",
    oracle="""
    WITH w AS (
        SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT source, chars,
               CAST(sum(chars) OVER () AS BIGINT) AS total_chars
        FROM w
    ),
    q AS (
        SELECT source, chars, total_chars,
               CAST(CAST(chars AS HUGEINT) * 1000000 // total_chars
                    AS BIGINT) AS quota,
               CAST(CAST(chars AS HUGEINT) * 1000000
                    - (CAST(chars AS HUGEINT) * 1000000 // total_chars)
                      * total_chars AS BIGINT) AS rem_num
        FROM tot
    ),
    r AS (
        SELECT *,
               CAST(1000000 - sum(quota) OVER () AS BIGINT) AS extras,
               CAST(row_number() OVER (ORDER BY rem_num DESC, source ASC)
                    AS BIGINT) AS rk
        FROM q
    )
    SELECT source, chars, quota,
           CASE WHEN rk <= extras THEN 1 ELSE 0 END AS extra,
           quota + CASE WHEN rk <= extras THEN 1 ELSE 0 END AS alloc
    FROM r ORDER BY source
    """,
    tags=("agg", "allocation", "sampling", "engine-addition"),
)
def agg_alloc_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment: split a budget of
    exactly 1,000,000 sample slots across document sources
    proportional to corpus bytes, summing EXACTLY to the budget —
    floor quotas plus one extra slot to the largest fractional
    remainders (ties break on source name). This is how a curation
    pipeline turns mixture weights into integer per-source sampling
    quotas that reproduce bit-for-bit (naive round() drifts off the
    budget and float shares aren't associative). All arithmetic is
    integer: budget*weight runs in decimal(38,0)/HUGEINT so a
    100 TB character count cannot overflow the product.

    Scale: one corpus aggregate, then every window runs on the
    |sources| model table."""
    w = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum("n_chars").cast("bigint").alias("chars"))
    )
    tot = w.select(
        "*",
        F.sum("chars")
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("total_chars"),
    )
    q = tot.select(
        "*",
        F.expr(
            "CAST(CAST(chars AS DECIMAL(38,0)) * 1000000"
            " div CAST(total_chars AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("quota"),
    ).select(
        "*",
        F.expr(
            "CAST(CAST(chars AS DECIMAL(38,0)) * 1000000"
            " - CAST(quota AS DECIMAL(38,0))"
            "   * CAST(total_chars AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("rem_num"),
    )
    r = q.select(
        "*",
        (F.lit(1000000) - F.sum("quota").over(Window.partitionBy()))
        .cast("bigint")
        .alias("extras"),
        F.row_number()
        .over(Window.orderBy(F.col("rem_num").desc(), F.col("source").asc()))
        .cast("bigint")
        .alias("rk"),
    )
    extra = F.when(F.col("rk") <= F.col("extras"), 1).otherwise(0)
    return r.select(
        "source",
        "chars",
        "quota",
        extra.alias("extra"),
        (F.col("quota") + extra).alias("alloc"),
    ).orderBy("source")


@query(
    "agg_quantiles_bisect",
    oracle="""
    WITH vals AS (
        SELECT l_returnflag AS g,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS v
        FROM lineitem
    ),
    stats AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM vals GROUP BY g),
    qs AS (SELECT unnest([25, 50, 75, 90]) AS q),
    targets AS (
        SELECT s.g, q.q, s.n,
               CAST((s.n * q.q + 99) // 100 AS BIGINT) AS k
        FROM stats s CROSS JOIN qs q
    ),
    ranked AS (
        SELECT g, v,
               row_number() OVER (PARTITION BY g ORDER BY v) AS rn
        FROM vals
    )
    SELECT t.g AS l_returnflag, CAST(t.q AS BIGINT) AS q,
           r.v AS value_cents, t.k, t.n
    FROM ranked r JOIN targets t ON r.g = t.g AND r.rn = t.k
    ORDER BY 1, 2
    """,
    tags=("agg", "selection", "quantiles", "iterative", "engine-addition"),
)
def agg_quantiles_bisect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group p25/p50/p75/p90 (percentile_disc semantics:
    the smallest value whose rank reaches ceil(n*q/100)) without any
    sort: every (group, quantile) target keeps its own candidate
    interval, and each round ONE broadcast-join pass maps in-range
    rows to `fanout` equal sub-intervals per open target and counts —
    all twelve selections narrow simultaneously, so exact quantiles
    of a 100 TB column cost the same ~log_fanout(range) (= 2 at
    4096-ary for a cents domain) counting passes as a single median. The oracle finds the same elements by
    row_number. Replicated rows are bounded by the number of open
    targets a row's group/value matches (<= 4, shrinking each round).

    Scale: no stage sorts or shuffles the data (broadcast probe +
    map-side-combinable counts only); selection state is
    |groups|x|quantiles| scalars on the driver."""
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "bigint"
    )
    vals = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_returnflag").alias("g"), cents.alias("v"))
        .persist()
    )
    stats = {
        r["g"]: r
        for r in vals.groupBy("g")
        .agg(
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    # state per (group, quantile): [lo, hi, k, n, base]
    state: dict[tuple[str, int], list[int]] = {}
    for g, r in stats.items():
        for q in (25, 50, 75, 90):
            k = (r["n"] * q + 99) // 100
            state[(g, q)] = [r["lo"], r["hi"], k, r["n"], 0]
    # 4096-ary (r12 optimization, same as agg_median_bisect): two
    # counting passes instead of four over the cents domain; the
    # collected histogram is |open targets| x occupied buckets rows,
    # still driver-trivial. Identical selected elements. Same
    # (v - lo) * fanout overflow bound as agg_median_bisect
    # (ADVICE r12 #2): asserted, not assumed.
    fanout = 4096
    for (g, q), (lo, hi, _k, _n, _b) in state.items():
        assert (hi - lo + 1) <= (1 << 63) // fanout, (
            f"bisect interval for ({g!r}, q{q}) too wide for fanout {fanout}"
        )
    while True:
        open_states = {s: b for s, b in state.items() if b[0] < b[1]}
        if not open_states:
            break
        probe = spark.createDataFrame(
            [(g, q, b[0], b[1] - b[0] + 1) for (g, q), b in open_states.items()],
            "g string, q int, lo bigint, w bigint",
        )
        counts = (
            vals.join(F.broadcast(probe), "g")
            .filter((F.col("v") >= F.col("lo")) & (F.col("v") < F.col("lo") + F.col("w")))
            .groupBy(
                "g",
                "q",
                F.expr(f"(v - lo) * {fanout} div w").alias("bk"),
            )
            .agg(F.count("*").alias("c"))
            .collect()
        )
        hist: dict[tuple[str, int], dict[int, int]] = {
            s: {} for s in open_states
        }
        for r in counts:
            hist[(r["g"], r["q"])][r["bk"]] = r["c"]
        for (g, q), b in open_states.items():
            lo, hi, k, _n, base = b
            w = hi - lo + 1
            cum = base
            for j in range(fanout):
                c = hist[(g, q)].get(j, 0)
                if cum + c >= k:
                    b[0] = lo + (j * w + fanout - 1) // fanout
                    b[1] = min(
                        hi, lo + ((j + 1) * w + fanout - 1) // fanout - 1
                    )
                    b[4] = cum
                    break
                cum += c
    vals.unpersist()
    rows = [
        (g, q, int(b[0]), int(b[2]), int(b[3]))
        for (g, q), b in sorted(state.items())
    ]
    return spark.createDataFrame(
        rows,
        "l_returnflag string, q bigint, value_cents bigint, k bigint,"
        " n bigint",
    ).orderBy("l_returnflag", "q")


@query(
    "agg_winsorized_mean",
    oracle="""
    WITH vals AS (
        SELECT l_returnflag AS g,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS v
        FROM lineitem
    ),
    th AS (
        SELECT g, quantile_disc(v, 0.05) AS p05, quantile_disc(v, 0.95) AS p95
        FROM vals GROUP BY g
    )
    SELECT v.g AS l_returnflag, t.p05 AS p05_cents, t.p95 AS p95_cents,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN v.v < t.p05 THEN t.p05
                         WHEN v.v > t.p95 THEN t.p95
                         ELSE v.v END) AS BIGINT) AS wsum_cents,
           CAST(sum(CASE WHEN v.v < t.p05 THEN t.p05
                         WHEN v.v > t.p95 THEN t.p95
                         ELSE v.v END) // count(*) AS BIGINT)
               AS winsorized_mean_cents,
           CAST(sum(v.v) // count(*) AS BIGINT) AS raw_mean_cents,
           CAST(sum(CASE WHEN v.v < t.p05 OR v.v > t.p95 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamped
    FROM vals v JOIN th t ON v.g = t.g
    GROUP BY v.g, t.p05, t.p95
    ORDER BY v.g
    """,
    tags=("agg", "robust", "winsorize", "engine-addition"),
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per group: clamp values outside the group's
    [p5, p95] to the boundary and average — the robust mean that
    keeps sample size (unlike trimming) while bounding any single
    outlier's influence. Thresholds are DISCRETE percentiles (actual
    data values: percentile_approx in its GK-exact regime ==
    DuckDB's quantile_disc — the ml_gains_deciles equivalence);
    clamped sums are exact integer cents, the mean is integer
    division, and the raw mean plus clamp count ride along so the
    outlier impact is visible.

    Scale: one scan aggregates the per-group thresholds to |groups|
    rows, broadcast back for the clamp pass — two map-side-combinable
    scans, zero sorts (never ntile over a global order)."""
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "bigint"
    )
    vals = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"), cents.alias("v")
    )
    th = vals.groupBy("g").agg(
        F.expr(f"percentile_approx(v, 0.05D, {1 << 20})").alias("p05"),
        F.expr(f"percentile_approx(v, 0.95D, {1 << 20})").alias("p95"),
    )
    clamped = F.when(F.col("v") < F.col("p05"), F.col("p05")).when(
        F.col("v") > F.col("p95"), F.col("p95")
    ).otherwise(F.col("v"))
    out = (
        vals.join(F.broadcast(th), "g")
        .groupBy("g", "p05", "p95")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(clamped).cast("bigint").alias("wsum_cents"),
            F.expr(
                "CAST(sum(CASE WHEN v < p05 THEN p05 WHEN v > p95 THEN p95"
                " ELSE v END) div count(*) AS BIGINT)"
            ).alias("winsorized_mean_cents"),
            F.expr("CAST(sum(v) div count(*) AS BIGINT)").alias(
                "raw_mean_cents"
            ),
            F.sum(
                F.when((F.col("v") < F.col("p05")) | (F.col("v") > F.col("p95")), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_clamped"),
        )
    )
    return out.select(
        F.col("g").alias("l_returnflag"),
        F.col("p05").alias("p05_cents"),
        F.col("p95").alias("p95_cents"),
        "n",
        "wsum_cents",
        "winsorized_mean_cents",
        "raw_mean_cents",
        "n_clamped",
    ).orderBy("l_returnflag")


@query(
    "agg_tukey_fences",
    oracle="""
    WITH vals AS (
        SELECT l_returnflag AS g,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS v
        FROM lineitem
    ),
    th AS (
        SELECT g, quantile_disc(v, 0.25) AS q1, quantile_disc(v, 0.75) AS q3
        FROM vals GROUP BY g
    )
    SELECT v.g AS l_returnflag, t.q1 AS q1_cents, t.q3 AS q3_cents,
           t.q3 - t.q1 AS iqr_cents,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN 2 * v.v < 5 * t.q1 - 3 * t.q3
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
           CAST(sum(CASE WHEN 2 * v.v > 5 * t.q3 - 3 * t.q1
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers
    FROM vals v JOIN th t ON v.g = t.g
    GROUP BY v.g, t.q1, t.q3
    ORDER BY v.g
    """,
    tags=("agg", "robust", "outliers", "engine-addition"),
)
def agg_tukey_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey boxplot fences per group: Q1/Q3 (discrete percentiles —
    actual data values, GK-exact regime == quantile_disc), the IQR,
    and outlier counts beyond Q1 - 1.5*IQR / Q3 + 1.5*IQR — the
    third robust-outlier lens next to ts_anomaly_zscore (parametric)
    and agg_mad_robust (median-based). The 1.5x fence comparison is
    PURE INTEGERS: v < Q1 - 1.5*IQR is rewritten 2v < 5*Q1 - 3*Q3,
    so no float threshold ever decides membership.

    Scale: one threshold aggregate to |groups| broadcast rows + one
    counting pass — same two-scan shape as agg_winsorized_mean."""
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "bigint"
    )
    vals = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"), cents.alias("v")
    )
    th = vals.groupBy("g").agg(
        F.expr(f"percentile_approx(v, 0.25D, {1 << 20})").alias("q1"),
        F.expr(f"percentile_approx(v, 0.75D, {1 << 20})").alias("q3"),
    )
    return (
        vals.join(F.broadcast(th), "g")
        .groupBy("g", "q1", "q3")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(
                F.when(2 * F.col("v") < 5 * F.col("q1") - 3 * F.col("q3"), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_low_outliers"),
            F.sum(
                F.when(2 * F.col("v") > 5 * F.col("q3") - 3 * F.col("q1"), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_high_outliers"),
        )
        .select(
            F.col("g").alias("l_returnflag"),
            F.col("q1").alias("q1_cents"),
            F.col("q3").alias("q3_cents"),
            (F.col("q3") - F.col("q1")).alias("iqr_cents"),
            "n",
            "n_low_outliers",
            "n_high_outliers",
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_log_histogram_percentiles",
    oracle="""
    WITH cents AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS c
        FROM orders
    ),
    buckets AS (
        SELECT length(bin(CAST(c AS UBIGINT))) AS b,
               CAST(count(*) AS BIGINT) AS n
        FROM cents WHERE c > 0 GROUP BY 1
    ),
    cum AS (
        SELECT b, n,
               CAST(sum(n) OVER (ORDER BY b) AS BIGINT) AS cn,
               CAST(sum(n) OVER () AS BIGINT) AS total
        FROM buckets
    ),
    picks AS (
        SELECT p, b, n, cn, total,
               row_number() OVER (PARTITION BY p ORDER BY b) AS rk
        FROM (SELECT unnest([50, 95, 99]) AS p) ps
        JOIN cum ON cum.cn * 100 >= ps.p * cum.total
    )
    SELECT CAST(p AS BIGINT) AS pct,
           CAST(b AS BIGINT) AS bucket_bits,
           CAST(1 << (b - 1) AS BIGINT) AS lower_cents,
           CAST((1 << b) - 1 AS BIGINT) AS upper_cents,
           cn AS n_at_or_below, total
    FROM picks WHERE rk = 1
    ORDER BY pct
    """,
    tags=("agg", "histogram", "percentile-sketch", "engine-addition"),
)
def agg_log_histogram_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDR-histogram-style percentile estimation — the
    latency-dashboard sketch: values collapse into power-of-two
    buckets (bucket id = bit length, computed log-free as
    length(bin(x)) — same trick as the geometric noise draw), and
    each percentile reports the first bucket whose cumulative count
    covers it, with the bucket's exact [2^(b-1), 2^b) value bounds.
    The estimate's relative error is bounded by 2x by construction —
    stated honestly by returning BOTH bounds rather than a point.
    Unlike agg_percentiles_approx (GK sketch, rank-accuracy), this
    sketch is value-accuracy, O(64) memory, and trivially mergeable
    across partitions/streams: counts just add.

    Scale shape: one map-side-combined <=64-key aggregate; the
    cumulative window and percentile picks run on the bucket table."""
    o = load_table(spark, sf_dir, "orders")
    cents = o.selectExpr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c"
    )
    buckets = (
        cents.where(F.col("c") > 0)
        .groupBy(F.expr("length(bin(c))").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = buckets.select(
        "b", "n",
        F.sum("n").over(wb).cast("bigint").alias("cn"),
        F.sum("n").over(wall).cast("bigint").alias("total"),
    )
    ps = spark.range(1).selectExpr("explode(array(50, 95, 99)) AS p")
    picks = (
        ps.join(cum, F.col("cn") * 100 >= F.col("p") * F.col("total"))
        .withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("p").orderBy("b")),
        )
        .where(F.col("rk") == 1)
    )
    return picks.selectExpr(
        "CAST(p AS BIGINT) AS pct",
        "CAST(b AS BIGINT) AS bucket_bits",
        "CAST(shiftleft(1, b - 1) AS BIGINT) AS lower_cents",
        "CAST(shiftleft(1, b) - 1 AS BIGINT) AS upper_cents",
        "cn AS n_at_or_below",
        "total",
    ).orderBy("pct")
