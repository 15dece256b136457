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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..data import load_table
from ..functions.numeric import finite_measure, finite_measure_sql
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


@query(
    "ab_welch_ttest",
    oracle=f"""
    WITH g AS (
        SELECT user_id, {finite_measure_sql("value")} AS fv FROM events
    ),
    s AS (
        SELECT
            CAST(count(CASE WHEN user_id % 2 = 0 THEN fv END) AS BIGINT) AS n_a,
            CAST(count(CASE WHEN user_id % 2 = 1 THEN fv END) AS BIGINT) AS n_b,
            CAST(SUM(CASE WHEN user_id % 2 = 0
                     THEN CAST(fv AS DECIMAL(18,6)) END) AS DOUBLE) AS sx_a,
            CAST(SUM(CASE WHEN user_id % 2 = 1
                     THEN CAST(fv AS DECIMAL(18,6)) END) AS DOUBLE) AS sx_b,
            CAST(SUM(CASE WHEN user_id % 2 = 0
                     THEN CAST(fv * fv AS DECIMAL(27,8)) END) AS DOUBLE) AS sxx_a,
            CAST(SUM(CASE WHEN user_id % 2 = 1
                     THEN CAST(fv * fv AS DECIMAL(27,8)) END) AS DOUBLE) AS sxx_b
        FROM g
    ),
    d AS (
        SELECT n_a, n_b,
               sx_a / CAST(n_a AS DOUBLE) AS mean_a,
               sx_b / CAST(n_b AS DOUBLE) AS mean_b,
               (sxx_a - sx_a * sx_a / CAST(n_a AS DOUBLE))
                 / CAST(n_a - 1 AS DOUBLE) AS var_a,
               (sxx_b - sx_b * sx_b / CAST(n_b AS DOUBLE))
                 / CAST(n_b - 1 AS DOUBLE) AS var_b
        FROM s
    ),
    se AS (
        SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
               var_a / CAST(n_a AS DOUBLE) AS sea,
               var_b / CAST(n_b AS DOUBLE) AS seb
        FROM d
    )
    SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
           (mean_a - mean_b) / sqrt(sea + seb) AS t_stat,
           (sea + seb) * (sea + seb)
             / (sea * sea / CAST(n_a - 1 AS DOUBLE)
                + seb * seb / CAST(n_b - 1 AS DOUBLE)) AS welch_df
    FROM se
    """,
    tags=("statistics", "experiment", "ab-test"),
)
def ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test over a deterministic 50/50
    user split (user_id parity stands in for the assignment hash) —
    the A/B experiment readout every platform computes: arm sizes,
    means, variances, t statistic, and Welch-Satterthwaite degrees
    of freedom.

    n_a/n_b count MEASURED readings only (ADVICE r8: counting all
    assigned rows while summing only finite readings silently biased
    mean/variance/df whenever non-finite or NULL readings exist —
    ~8% under the NaN sweep's injection). A reading excluded by the
    finite-measure contract is excluded from n, Σx, and Σx² alike.

    Determinism: both arms' n / Σx / Σx² come from ONE conditional
    aggregate pass in exact decimal (order-independent), and every
    downstream float op (means, variances, t, df) is an identical
    IEEE expression tree on both engines — staged through the same
    intermediate columns so evaluation order cannot diverge.

    Scale shape: one scan, one 2-phase global aggregate, six numbers
    on the driver-side row; the statistic itself is O(1). This is
    the mergeable-summary form — per-partition partials OR-combine,
    so the same query incrementally extends to per-day experiment
    monitoring."""
    e = load_table(spark, sf_dir, "events")
    arm_a = F.col("user_id") % 2 == 0
    arm_b = F.col("user_id") % 2 == 1
    fv = finite_measure("value")
    dec_x = fv.cast("decimal(18,6)")
    dec_xx = (fv * fv).cast("decimal(27,8)")
    s = e.agg(
        F.count(F.when(arm_a, fv)).cast("bigint").alias("n_a"),
        F.count(F.when(arm_b, fv)).cast("bigint").alias("n_b"),
        F.sum(F.when(arm_a, dec_x)).cast("double").alias("sx_a"),
        F.sum(F.when(arm_b, dec_x)).cast("double").alias("sx_b"),
        F.sum(F.when(arm_a, dec_xx)).cast("double").alias("sxx_a"),
        F.sum(F.when(arm_b, dec_xx)).cast("double").alias("sxx_b"),
    )
    na_d = F.col("n_a").cast("double")
    nb_d = F.col("n_b").cast("double")
    d = s.select(
        "n_a",
        "n_b",
        (F.col("sx_a") / na_d).alias("mean_a"),
        (F.col("sx_b") / nb_d).alias("mean_b"),
        (
            (F.col("sxx_a") - F.col("sx_a") * F.col("sx_a") / na_d)
            / (F.col("n_a") - 1).cast("double")
        ).alias("var_a"),
        (
            (F.col("sxx_b") - F.col("sx_b") * F.col("sx_b") / nb_d)
            / (F.col("n_b") - 1).cast("double")
        ).alias("var_b"),
    )
    se = d.select(
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        "var_a",
        "var_b",
        (F.col("var_a") / F.col("n_a").cast("double")).alias("sea"),
        (F.col("var_b") / F.col("n_b").cast("double")).alias("seb"),
    )
    return se.select(
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        "var_a",
        "var_b",
        (
            (F.col("mean_a") - F.col("mean_b"))
            / F.sqrt(F.col("sea") + F.col("seb"))
        ).alias("t_stat"),
        (
            (F.col("sea") + F.col("seb")) * (F.col("sea") + F.col("seb"))
            / (
                F.col("sea") * F.col("sea") / (F.col("n_a") - 1).cast("double")
                + F.col("seb") * F.col("seb") / (F.col("n_b") - 1).cast("double")
            )
        ).alias("welch_df"),
    )


# Declarative data-quality rules over orders — evaluated in ONE scan.
# (rule_name, violation predicate SQL) — shared by engine and oracle.
_CONSTRAINTS = [
    ("pk_not_null", "o_orderkey IS NULL"),
    ("status_accepted_values", "o_orderstatus NOT IN ('O', 'F', 'P')"),
    ("price_positive", "o_totalprice <= 0"),
    ("date_in_range", "o_orderdate < TIMESTAMP '1990-01-01 00:00:00'"),
    ("price_below_cap", "o_totalprice > 400000"),
    ("priority_not_null", "o_orderpriority IS NULL"),
]


def _constraint_oracle() -> str:
    rules = ", ".join(
        f"SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS v_{i}"
        for i, (_, pred) in enumerate(_CONSTRAINTS)
    )
    rows = " UNION ALL ".join(
        f"""SELECT '{name}' AS rule, CAST(v_{i} AS BIGINT) AS n_violations,
                   (v_{i} = 0) AS passed FROM one"""
        for i, (name, _) in enumerate(_CONSTRAINTS)
    )
    return f"WITH one AS (SELECT {rules} FROM orders) {rows}"


@query(
    "audit_constraint_suite",
    oracle=_constraint_oracle(),
    tags=("audit", "data-quality", "constraints"),
)
def audit_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint suite — the data-quality gate an ingest
    contract runs before accepting a batch (not-null keys, accepted
    values, range checks): one row per rule with its violation count
    and pass flag, ALL rules evaluated in a single scan (one wide
    conditional aggregate, then a stack unpivot — the same
    one-pass-many-rules shape as audit_table_profile; the oracle's
    UNION ALL over a shared CTE is the semantic spec).

    Scale shape: one pass, one 2-phase global aggregate, |rules|
    output rows. Adding a rule adds a column to the partial
    aggregate, not a scan — at 100 TB the rule count is free, the
    scan is the cost, and this is why quality gates must never be
    one-query-per-rule."""
    o = load_table(spark, sf_dir, "orders")
    aggs = [
        F.sum(F.when(F.expr(pred), 1).otherwise(0)).alias(f"v_{i}")
        for i, (_, pred) in enumerate(_CONSTRAINTS)
    ]
    one = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', v_{i}" for i, (name, _) in enumerate(_CONSTRAINTS)
    )
    return one.select(
        F.expr(f"stack({len(_CONSTRAINTS)}, {stack_args}) AS (rule, n_violations)")
    ).select(
        "rule",
        F.col("n_violations").cast("bigint").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


@query(
    "audit_benford_digits",
    oracle="""
    WITH d AS (
        SELECT CAST(substring(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                                   AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders
        WHERE o_totalprice > 0
    ),
    g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit)
    SELECT digit, n,
           CAST(n * 1000000 // SUM(n) OVER () AS BIGINT) AS share_ppm
    FROM g
    ORDER BY digit
    """,
    tags=("profiling", "benford", "fraud-audit", "engine-addition"),
)
def audit_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit: leading-significant-digit distribution of
    order values — the classic forensic screen for fabricated or
    systematically-edited monetary data (organic amounts follow
    log-uniform digit frequencies; manual entry doesn't). The leading
    digit is extracted through the EXACT integer cent value rendered
    as a string — never via log10 (float log at powers of ten flips
    the digit differently per engine) and never by formatting a
    double (engines disagree on double→string).

    Scale shape: a narrow per-row expression plus one 9-key aggregate
    — map-side combinable, free at any scale; the ppm shares come
    from a window over the 9-row result."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    d = o.where(F.col("o_totalprice") > 0).select(
        F.substring(cents.cast("string"), 1, 1).cast("bigint").alias("digit")
    )
    g = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    return (
        g.select(
            "digit",
            "n",
            F.expr("n * 1000000 div sum(n) OVER ()").cast("bigint").alias(
                "share_ppm"
            ),
        )
        .orderBy("digit")
    )


_PK_SPECS = (
    ("orders", ("o_orderkey",)),
    ("customer", ("c_custkey",)),
    ("part", ("p_partkey",)),
    ("supplier", ("s_suppkey",)),
    ("lineitem", ("l_orderkey", "l_linenumber")),
    ("events", ("event_id",)),
    ("documents", ("doc_id",)),
)


def _pk_oracle_leg(table: str, keys: tuple[str, ...]) -> str:
    kl = ", ".join(keys)
    return f"""
    SELECT '{table}' AS tbl,
           CAST(SUM(k_rows) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE k_rows > 1) AS BIGINT)
               AS oversized_keys,
           CAST(COALESCE(SUM(k_rows - 1), 0) AS BIGINT) AS surplus_rows
    FROM (SELECT {kl}, COUNT(*) AS k_rows FROM {table} GROUP BY {kl})
    """


@query(
    "audit_primary_key_uniqueness",
    oracle=" UNION ALL ".join(
        _pk_oracle_leg(t, k) for t, k in _PK_SPECS
    )
    + " ORDER BY tbl",
    tags=("profiling", "constraints", "primary-key", "engine-addition"),
)
def audit_primary_key_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit across every keyed table in the
    store: rows, keys appearing more than once, and the surplus row
    count a dedup would remove — the first integrity gate a warehouse
    load runs, complementing audit_constraint_suite (column-level
    rules) and audit_referential_integrity (FK orphans). Note n_rows
    counts the key-grain table; surplus_rows == 0 everywhere is the
    pass condition.

    Scale shape: ONE TAGGED UNION (VERDICT r8 #6 — the first cut ran
    a per-table two-level aggregate, 7 tables x 2 exchanges = 14
    shuffles): every table contributes (tbl, k1, k2) rows — keys
    stay exact bigints, a missing second key is a NULL marker, no
    hashing — and the whole store audits through ONE
    map-side-combinable key count (its output is the distinct key
    set, keyed by table) re-aggregated to 3 integers per table: 2
    shuffles total, same per-table values, and the union's legs
    still scan column-pruned in parallel. An EMPTY table still emits
    its audit row (NULL n_rows, 0/0 — matching the oracle's
    ungrouped outer aggregates): the aggregate is re-anchored on a
    literal spine of the audited table names, since an empty leg
    contributes no union rows (ADVICE r9). Keys are asserted
    integral up front — a string key silently cast to long would
    collapse distinct keys to NULL and under-count."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    integral = (ByteType, ShortType, IntegerType, LongType)
    rows = None
    for table, keys in _PK_SPECS:
        t = load_table(spark, sf_dir, table)
        for k in keys:
            if not isinstance(t.schema[k].dataType, integral):
                raise TypeError(
                    f"audit_primary_key_uniqueness: key {table}.{k} is "
                    f"{t.schema[k].dataType.simpleString()}, not integral — "
                    "extend the tagged union before adding it to _PK_SPECS"
                )
        k2 = (
            F.col(keys[1]).cast("long")
            if len(keys) > 1
            else F.lit(None).cast("long")
        )
        leg = t.select(
            F.lit(table).alias("tbl"),
            F.col(keys[0]).cast("long").alias("k1"),
            k2.alias("k2"),
        )
        rows = leg if rows is None else rows.unionByName(leg)
    per_key = rows.groupBy("tbl", "k1", "k2").agg(
        F.count(F.lit(1)).alias("k_rows")
    )
    agg = per_key.groupBy("tbl").agg(
        F.sum("k_rows").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("k_rows") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("oversized_keys"),
        F.coalesce(F.sum(F.col("k_rows") - 1), F.lit(0))
        .cast("bigint")
        .alias("surplus_rows"),
    )
    spine = spark.createDataFrame(
        [(t,) for t, _ in _PK_SPECS], "tbl string"
    )
    return (
        spine.join(agg, "tbl", "left")
        .select(
            "tbl",
            "n_rows",
            F.coalesce("oversized_keys", F.lit(0))
            .cast("bigint")
            .alias("oversized_keys"),
            F.coalesce("surplus_rows", F.lit(0))
            .cast("bigint")
            .alias("surplus_rows"),
        )
        .orderBy("tbl")
    )


@query(
    "ab_diff_in_diff",
    oracle=f"""
    WITH anchor AS (
        SELECT epoch_us(min(ts))
               + (epoch_us(max(ts)) - epoch_us(min(ts))) // 2 AS mid
        FROM events
    ),
    cells AS (
        SELECT (user_id % 2 = 0) AS treated,
               (epoch_us(ts) >= (SELECT mid FROM anchor)) AS post,
               CAST(count({finite_measure_sql("value")}) AS BIGINT) AS n,
               CAST(CAST(SUM(CAST({finite_measure_sql("value")}
                                  AS DECIMAL(18,6))) AS VARCHAR)
                    AS DOUBLE) AS total
        FROM events
        GROUP BY 1, 2
    ),
    wide AS (
        SELECT
          max(CASE WHEN treated AND post THEN total / n END) AS tr_post,
          max(CASE WHEN treated AND NOT post THEN total / n END) AS tr_pre,
          max(CASE WHEN NOT treated AND post THEN total / n END) AS ct_post,
          max(CASE WHEN NOT treated AND NOT post THEN total / n END) AS ct_pre,
          CAST(sum(n) AS BIGINT) AS n_events
        FROM cells
    )
    SELECT n_events, tr_pre, tr_post, ct_pre, ct_post,
           (tr_post - tr_pre) - (ct_post - ct_pre) AS did_estimate
    FROM wide
    """,
    tags=("experiment", "diff-in-diff", "causal", "engine-addition"),
)
def ab_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences — the quasi-experimental estimator
    for rollouts without randomization: (treated post − treated pre)
    − (control post − control pre) cancels both the group baseline
    and the time trend. Treated = even user ids, the period split is
    the data-derived midpoint (no wall clock). The four cell means
    come from ONE conditional aggregate pass with decimal-exact
    sums over MEASURED readings only — n counts rows whose reading
    passes the finite-measure contract (ADVICE r8: counting
    unmeasured rows in n biased every cell mean toward zero), so
    n_events is the measured-event count; every downstream
    subtraction is performed on identical
    doubles in an identical order on both engines, so the estimate
    is bit-stable (the ab_welch_ttest float-staging discipline).

    Scale shape: one scan (the anchor rides a 1-row broadcast), one
    4-group aggregate, one 1-row pivot — at 100 TB this is the
    cheapest possible causal readout, which is why DiD is the
    default rollout-analysis query at event-log scale."""
    e = load_table(spark, sf_dir, "events")
    anchor = e.agg(
        (
            F.unix_micros(F.min("ts"))
            + F.expr(
                "(unix_micros(max(ts)) - unix_micros(min(ts))) div 2"
            )
        ).alias("mid")
    )
    cells = (
        e.crossJoin(F.broadcast(anchor))
        .groupBy(
            (F.col("user_id") % 2 == 0).alias("treated"),
            (F.unix_micros("ts") >= F.col("mid")).alias("post"),
        )
        .agg(
            F.count(finite_measure("value")).cast("bigint").alias("n"),
            F.sum(finite_measure("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total"),
        )
    )
    mean = F.col("total") / F.col("n")
    wide = cells.agg(
        F.max(F.when(F.col("treated") & F.col("post"), mean)).alias("tr_post"),
        F.max(F.when(F.col("treated") & ~F.col("post"), mean)).alias("tr_pre"),
        F.max(F.when(~F.col("treated") & F.col("post"), mean)).alias("ct_post"),
        F.max(F.when(~F.col("treated") & ~F.col("post"), mean)).alias("ct_pre"),
        F.sum("n").cast("bigint").alias("n_events"),
    )
    return wide.select(
        "n_events",
        "tr_pre",
        "tr_post",
        "ct_pre",
        "ct_post",
        (
            (F.col("tr_post") - F.col("tr_pre"))
            - (F.col("ct_post") - F.col("ct_pre"))
        ).alias("did_estimate"),
    )


@query(
    "agg_log2_histogram",
    oracle=f"""
    WITH c AS (
        SELECT event_type,
               CAST(CAST({finite_measure_sql("value")} AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS cents
        FROM events
    )
    SELECT event_type,
           CAST(length(bin(cents)) AS BIGINT) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(cents) AS BIGINT) AS lo_cents,
           CAST(max(cents) AS BIGINT) AS hi_cents
    FROM c
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("profiling", "histogram", "log-buckets", "engine-addition"),
)
def agg_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed (HDR-style) value histogram per event type —
    the latency/amount distribution readout every ops dashboard
    wants: exponentially-wider buckets give constant RELATIVE
    resolution with a few dozen rows no matter the range. The bucket
    is the BIT LENGTH of the exact integer cents (length(bin(x)) ==
    floor(log2 x)+1) — pure integer/string ops, so bucket membership
    never depends on a float log's rounding (log2(2^k) returning
    k−ε on one engine would misplace every power-of-two boundary
    value). Per-bucket min/max document the real bucket envelope.

    Scale shape: one scan, one (type, bucket) map-side-combinable
    aggregate — the histogram is mergeable by construction (partials
    add), which is what makes it the standard 100 TB distribution
    summary."""
    e = load_table(spark, sf_dir, "events")
    cents = (finite_measure("value").cast("decimal(18,2)") * 100).cast("bigint")
    return (
        e.select("event_type", cents.alias("cents"))
        .groupBy(
            "event_type",
            F.length(F.bin(F.col("cents"))).cast("bigint").alias("log2_bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("cents").cast("bigint").alias("lo_cents"),
            F.max("cents").cast("bigint").alias("hi_cents"),
        )
        .orderBy("event_type", "log2_bucket")
    )


@query(
    "agg_cramers_v",
    oracle="""
    WITH cells AS (
        SELECT event_type,
               CASE WHEN value >= 50 THEN 'high' ELSE 'low' END AS band,
               CAST(count(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, band, o,
               CAST(SUM(o) OVER (PARTITION BY event_type) AS BIGINT)
                   AS row_tot,
               CAST(SUM(o) OVER (PARTITION BY band) AS BIGINT) AS col_tot,
               CAST(SUM(o) OVER () AS BIGINT) AS n
        FROM cells
    ),
    chi AS (
        -- fold the per-cell terms in (event_type, band) order: a
        -- plain SUM(double) is summation-order-dependent and the
        -- two engines disagree by 1 ulp
        SELECT max(n) AS n,
               CAST(count(DISTINCT event_type) AS BIGINT) AS r,
               CAST(count(DISTINCT band) AS BIGINT) AS c,
               list_reduce(
                   list((CAST(o AS DOUBLE)
                         - CAST(row_tot * col_tot AS DOUBLE)
                           / CAST(n AS DOUBLE))
                        * (CAST(o AS DOUBLE)
                           - CAST(row_tot * col_tot AS DOUBLE)
                             / CAST(n AS DOUBLE))
                        / (CAST(row_tot * col_tot AS DOUBLE)
                           / CAST(n AS DOUBLE))
                        ORDER BY event_type, band),
                   (a, x) -> a + x) AS chi2
        FROM tot
    )
    SELECT CAST(n AS BIGINT) AS n, r, c, chi2,
           sqrt(chi2 / (CAST(n AS DOUBLE)
                        * CAST(least(r - 1, c - 1) AS DOUBLE))) AS cramers_v
    FROM chi
    """,
    tags=("profiling", "statistics", "association", "engine-addition"),
)
def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer's V — the normalized effect size for the
    agg_chi_square_cells contingency table (chi-square grows with n;
    V in [0,1] answers 'is this association MEANINGFUL', the
    feature-selection filter for categorical pairs). Observed counts
    and marginals are exact integers; expected values, chi-square
    and V are identically-staged double expressions (one fsum of
    per-cell terms, |cells| rows, so no large-cancellation hazard).

    Scale: one (type, band) count shuffle; everything else runs on
    the contingency table."""
    cells = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.when(F.col("value") >= 50, "high").otherwise("low").alias("band"),
        )
        .agg(F.count("*").cast("bigint").alias("o"))
    )
    tot = cells.select(
        "event_type",
        "band",
        "o",
        F.sum("o")
        .over(Window.partitionBy("event_type"))
        .cast("bigint")
        .alias("row_tot"),
        F.sum("o")
        .over(Window.partitionBy("band"))
        .cast("bigint")
        .alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    expected = (F.col("row_tot") * F.col("col_tot")).cast("double") / F.col(
        "n"
    ).cast("double")
    term = (
        (F.col("o").cast("double") - expected)
        * (F.col("o").cast("double") - expected)
        / expected
    )
    # deterministic summation order (a bare SUM(double) differs from
    # the oracle's by 1 ulp): collect the |cells| terms keyed by the
    # cell id, sort, fold — model-sized by construction
    chi = tot.agg(
        F.max("n").alias("n"),
        F.countDistinct("event_type").cast("bigint").alias("r"),
        F.countDistinct("band").cast("bigint").alias("c"),
        F.collect_list(
            F.struct(
                F.col("event_type"), F.col("band"), term.alias("term")
            )
        ).alias("cells"),
    ).select(
        "n",
        "r",
        "c",
        F.expr(
            "aggregate(array_sort(cells), CAST(0 AS DOUBLE),"
            " (a, x) -> a + x.term)"
        ).alias("chi2"),
    )
    return chi.select(
        F.col("n").cast("bigint").alias("n"),
        "r",
        "c",
        "chi2",
        F.sqrt(
            F.col("chi2")
            / (
                F.col("n").cast("double")
                * F.least(F.col("r") - 1, F.col("c") - 1).cast("double")
            )
        ).alias("cramers_v"),
    )


@query(
    "audit_sequence_gaps",
    oracle="""
    WITH k AS (
        SELECT DISTINCT o_orderkey AS k FROM orders
        WHERE o_orderstatus = 'F'
    ),
    isl AS (
        SELECT k, k - row_number() OVER (ORDER BY k) AS g FROM k
    ),
    islands AS (
        SELECT g, CAST(min(k) AS BIGINT) AS s, CAST(max(k) AS BIGINT) AS e
        FROM isl GROUP BY g
    ),
    gaps AS (
        SELECT e + 1 AS gap_start,
               lead(s) OVER (ORDER BY s) - 1 AS gap_end,
               CAST(count(*) OVER () AS BIGINT) AS n_islands
        FROM islands
    )
    SELECT CAST(gap_start AS BIGINT) AS gap_start,
           CAST(gap_end AS BIGINT) AS gap_end,
           CAST(gap_end - gap_start + 1 AS BIGINT) AS gap_len,
           n_islands
    FROM gaps
    WHERE gap_end IS NOT NULL
    ORDER BY gap_len DESC, gap_start
    LIMIT 20
    """,
    tags=("audit", "gaps-islands", "completeness", "engine-addition"),
)
def audit_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-completeness audit — the CDC/replication check: find
    the holes in an expected-contiguous key sequence (here the
    'F'-status slice of o_orderkey — a filtered replica whose
    missing keys are exactly the non-F orders). Classic
    gaps-and-islands: keys collapse to islands via the k - row_number
    constant, gaps are the space between consecutive islands; the
    top-20 largest gaps plus the island count give the triage view
    ("one big hole" vs "shotgun loss").

    Scale: one distinct shuffle; the global-ordered windows then run
    over the ISLAND table, which is orders of magnitude smaller than
    the keys (bounded by the number of contiguity breaks), so the
    single-partition window never sees the raw data. The top-20 is
    TakeOrderedAndProject."""
    k = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    isl = k.select(
        "k", (F.col("k") - F.row_number().over(Window.orderBy("k"))).alias("g")
    )
    islands = isl.groupBy("g").agg(
        F.min("k").cast("bigint").alias("s"),
        F.max("k").cast("bigint").alias("e"),
    )
    wg = Window.orderBy("s")
    gaps = islands.select(
        (F.col("e") + 1).alias("gap_start"),
        (F.lead("s").over(wg) - 1).alias("gap_end"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint").alias(
            "n_islands"
        ),
    )
    return (
        gaps.where(F.col("gap_end").isNotNull())
        .select(
            F.col("gap_start").cast("bigint").alias("gap_start"),
            F.col("gap_end").cast("bigint").alias("gap_end"),
            (F.col("gap_end") - F.col("gap_start") + 1)
            .cast("bigint")
            .alias("gap_len"),
            "n_islands",
        )
        .orderBy(F.desc("gap_len"), "gap_start")
        .limit(20)
    )


@query(
    "audit_nonfinite_measures",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null,
           CAST(sum(CASE WHEN isnan(value) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nan,
           CAST(sum(CASE WHEN value = 'infinity'::DOUBLE THEN 1 ELSE 0 END)
               AS BIGINT) AS n_pos_inf,
           CAST(sum(CASE WHEN value = '-infinity'::DOUBLE THEN 1 ELSE 0 END)
               AS BIGINT) AS n_neg_inf,
           CAST(sum(CASE WHEN value IS NULL OR NOT isfinite(value)
                         THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
               AS unmeasured_ppm
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("profiling", "data-quality", "nonfinite", "engine-addition"),
)
def audit_nonfinite_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The observability face of the round-8 FINITE-MEASURE CONTRACT
    (functions/numeric.finite_measure): per series, how many readings
    the exact-arithmetic operators will skip — NULL, NaN, +Inf, -Inf
    — and the combined unmeasured fraction in integer ppm. A pipeline
    that silently nullifies bad readings without this audit is hiding
    data loss; a pipeline that alerts on unmeasured_ppm drift catches
    the broken sensor the day it breaks.

    Scale shape: one scan, one map-side-combinable aggregate to
    |series| rows — the cheapest possible data-quality readout, run
    alongside every ingest batch."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value")
    is_nan = F.isnan(v)
    is_pinf = v == F.lit(float("inf"))
    is_ninf = v == F.lit(float("-inf"))
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            flag(v.isNull()).alias("n_null"),
            flag(is_nan).alias("n_nan"),
            flag(is_pinf).alias("n_pos_inf"),
            flag(is_ninf).alias("n_neg_inf"),
            F.expr(
                "CAST(sum(CASE WHEN value IS NULL OR isnan(value)"
                " OR abs(value) = double('Infinity') THEN 1 ELSE 0 END)"
                " * 1000000 div count(*) AS BIGINT)"
            ).alias("unmeasured_ppm"),
        )
        .orderBy("event_type")
    )


# Functional-dependency candidates to test: (table, lhs, rhs) —
# a mix of true FDs (primary keys determine everything) and false
# ones, so both verdicts are exercised.
_FD_CANDIDATES = (
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("customer", "c_custkey", "c_nationkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
)


def _fd_oracle() -> str:
    legs = []
    for tbl, lhs, rhs in _FD_CANDIDATES:
        legs.append(
            f"""
            SELECT '{tbl}' AS tbl, '{lhs}' AS lhs, '{rhs}' AS rhs,
                   CAST(count(DISTINCT ROW({lhs})) AS BIGINT) AS n_lhs,
                   CAST(count(DISTINCT ROW({lhs}, {rhs})) AS BIGINT) AS n_pairs,
                   CAST(count(DISTINCT ROW({lhs}, {rhs}))
                        - count(DISTINCT ROW({lhs})) AS BIGINT)
                       AS n_extra_pairs,
                   count(DISTINCT ROW({lhs}, {rhs}))
                       = count(DISTINCT ROW({lhs})) AS holds
            FROM {tbl}
            """
        )
    return " UNION ALL ".join(legs) + " ORDER BY tbl, lhs, rhs"


@query(
    "profile_functional_dependencies",
    oracle=_fd_oracle(),
    tags=("profiling", "functional-dependency", "engine-addition"),
)
def profile_functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery (the profiling primitive behind
    schema normalization, key inference, and dimensional-model
    validation): lhs -> rhs holds exactly when every lhs value maps to
    one rhs value, i.e. count(DISTINCT lhs) == count(DISTINCT (lhs,
    rhs)) — a pure counting test, no pairwise comparison. NULL is a
    VALUE for FD purposes on both engines (ADVICE r8): the counts go
    through struct()/ROW() tuples — Spark's bare countDistinct(lhs,
    rhs) DROPS rows where either column is NULL while DuckDB's
    (lhs, rhs) counts them, a divergence that would surface the
    moment a nullable candidate entered _FD_CANDIDATES. Each
    candidate reports both distinct counts, the excess-pair count
    (how broken a failed FD is — 0 means holds), and the verdict;
    candidates cover both true FDs (primary keys) and false ones so
    each verdict path is exercised.

    Scale shape: all candidates of one table share ONE scan and ONE
    multi-distinct aggregate (Spark's Expand + two-level aggregate —
    row growth = #distinct-exprs, the standard profiler cost), and
    the per-candidate rows UNPIVOT from that single 1-row result with
    stack() — a per-candidate union of selects would re-run the
    aggregate once per candidate (first draft measured 12 shuffles;
    this shape pays the aggregate once per table). At 100 TB swap
    exact distincts for HLL partials (sketches.py) when approximate
    FDs suffice (n_pairs ~ n_lhs within sketch error)."""
    outs = []
    by_tbl: dict[str, list[tuple[str, str]]] = {}
    for tbl, lhs, rhs in _FD_CANDIDATES:
        by_tbl.setdefault(tbl, []).append((lhs, rhs))
    for tbl, pairs in by_tbl.items():
        t = spread(load_table(spark, sf_dir, tbl))
        aggs = []
        for lhs, rhs in pairs:
            aggs += [
                F.countDistinct(F.struct(lhs))
                .cast("bigint")
                .alias(f"{lhs}__l"),
                F.countDistinct(F.struct(lhs, rhs))
                .cast("bigint")
                .alias(f"{lhs}__{rhs}__p"),
            ]
        one = t.agg(*aggs)
        stack_args = ", ".join(
            f"'{lhs}', '{rhs}', {lhs}__l, {lhs}__{rhs}__p"
            for lhs, rhs in pairs
        )
        outs.append(
            one.select(
                F.lit(tbl).alias("tbl"),
                F.expr(
                    f"stack({len(pairs)}, {stack_args})"
                    " AS (lhs, rhs, n_lhs, n_pairs)"
                ),
            ).select(
                "tbl",
                "lhs",
                "rhs",
                "n_lhs",
                "n_pairs",
                (F.col("n_pairs") - F.col("n_lhs"))
                .cast("bigint")
                .alias("n_extra_pairs"),
                (F.col("n_pairs") == F.col("n_lhs")).alias("holds"),
            )
        )
    out = outs[0]
    for leg in outs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("tbl", "lhs", "rhs")
