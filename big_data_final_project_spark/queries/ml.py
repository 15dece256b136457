"""Relational ML primitives (engine addition): feature
standardization and closed-form model fitting expressed as
aggregates — the operations a feature/training pipeline runs at
corpus scale, kept cross-engine bit-identical by routing every
moment through exact decimal sums (functions/numeric.py; the same
discipline that makes the k-means and correlation queries
oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..data import load_table
from ..operators.scale import materialize
from ..functions.numeric import (
    dsum,
    dsum_prod,
    dsum_prod_sql,
    dsum_sql,
    finite_measure,
    finite_measure_sql,
)
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


# ---------------------------------------------------------------------------
# Model evaluation at corpus scale (round 4): the metrics a training
# pipeline computes over billions of scored rows — AUC, thresholded
# confusion metrics, and distribution-drift (PSI) monitoring. All
# integer-exact up to one final double division per output column, so
# every query pairs with a DuckDB oracle bit-for-bit.
# ---------------------------------------------------------------------------

# Range partitions for the distributed prefix sum inside ml_auc_exact.
# Local test scale needs few; the pattern is what scales (each
# partition covers a contiguous score range, so per-partition window
# sums + a P-value driver-side offset cumsum replace the
# single-partition global window a naive rank() would plan).
AUC_RANGE_PARTITIONS = 8


@query(
    "ml_auc_exact",
    oracle="""
    WITH s AS (
        SELECT o_totalprice AS score,
               sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS npos,
               sum(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS nneg
        FROM orders GROUP BY o_totalprice
    ),
    c AS (
        SELECT npos, nneg,
               COALESCE(sum(nneg) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cumneg_below
        FROM s
    ),
    t AS (
        SELECT CAST(sum(npos) AS BIGINT) AS n_pos,
               CAST(sum(nneg) AS BIGINT) AS n_neg,
               CAST(sum(npos * (2 * cumneg_below + nneg)) AS BIGINT) AS u2
        FROM c
    )
    SELECT n_pos, n_neg, u2,
           CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg) AS auc
    FROM t
    """,
    tags=("ml", "evaluation", "auc", "prefix-sum"),
)
def ml_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC via the Mann-Whitney U statistic, tie-aware,
    with NO single-partition global window.

    AUC = P(score_pos > score_neg) + P(=)/2. Working on the
    distinct-score table (one shuffle): for each score s,
    U += npos(s) * (negs_below(s) + nneg(s)/2). Everything is kept in
    integers by tracking 2U, so ties cost no precision; the only
    float op is the final division.

    Scale shape — distributed prefix sum: the cumulative
    negatives-below-each-score that DuckDB computes with one global
    window is computed here as repartitionByRange(score) →
    per-partition window sum (parallel: each range partition scans
    only its slice) + a P-value per-partition-total offset, cumsummed
    on the driver (P integers, not data). This is the same two-pass
    total-order trick as pipeline_global_rank, expressed for prefix
    AGGREGATES rather than ranks; at 100 TB the sorted-range window
    never funnels through one task."""
    o = load_table(spark, sf_dir, "orders")
    pos = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    s = (
        o.groupBy(F.col("o_totalprice").alias("score"))
        .agg(
            F.sum(pos).alias("npos"),
            F.sum(1 - pos).alias("nneg"),
        )
        .repartitionByRange(AUC_RANGE_PARTITIONS, "score")
        .withColumn("pid", F.spark_partition_id())
        # Pin the (score -> pid) assignment: the table is read twice
        # (offsets + main pass) and must see identical partitioning.
        .transform(materialize)
    )
    per_part = {
        r["pid"]: r["t"]
        for r in s.groupBy("pid").agg(F.sum("nneg").alias("t")).collect()
    }
    offsets, running = [], 0
    for pid in range(AUC_RANGE_PARTITIONS):
        offsets.append((pid, running))
        running += int(per_part.get(pid, 0))
    off = spark.createDataFrame(offsets, "pid int, off long")
    w = (
        Window.partitionBy("pid")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = s.join(F.broadcast(off), "pid").withColumn(
        "cumneg_below",
        F.coalesce(F.sum("nneg").over(w), F.lit(0)) + F.col("off"),
    )
    t = c.agg(
        F.sum("npos").cast("bigint").alias("n_pos"),
        F.sum("nneg").cast("bigint").alias("n_neg"),
        F.sum(
            F.col("npos") * (2 * F.col("cumneg_below") + F.col("nneg"))
        )
        .cast("bigint")
        .alias("u2"),
    )
    return t.select(
        "n_pos",
        "n_neg",
        "u2",
        (
            F.col("u2").cast("double")
            / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg"))
        ).alias("auc"),
    )


CONFUSION_THRESHOLDS = (100000.0, 250000.0, 400000.0)


@query(
    "ml_confusion_metrics",
    oracle=f"""
    WITH t AS (
        SELECT * FROM (VALUES {", ".join(f"({v})" for v in CONFUSION_THRESHOLDS)})
          AS v(thr)
    ),
    c AS (
        SELECT thr,
          sum(CASE WHEN o_totalprice >= thr AND o_orderstatus = 'F'
              THEN 1 ELSE 0 END) AS tp,
          sum(CASE WHEN o_totalprice >= thr AND o_orderstatus <> 'F'
              THEN 1 ELSE 0 END) AS fp,
          sum(CASE WHEN o_totalprice < thr AND o_orderstatus = 'F'
              THEN 1 ELSE 0 END) AS fn,
          sum(CASE WHEN o_totalprice < thr AND o_orderstatus <> 'F'
              THEN 1 ELSE 0 END) AS tn
        FROM orders CROSS JOIN t GROUP BY thr
    )
    SELECT CAST(thr AS DOUBLE) AS thr,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           CAST(tp AS DOUBLE) / (tp + fp) AS prec,
           CAST(tp AS DOUBLE) / (tp + fn) AS rec,
           2.0 * tp / (2.0 * tp + fp + fn) AS f1
    FROM c
    """,
    tags=("ml", "evaluation", "confusion"),
)
def ml_confusion_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded classifier evaluation: confusion-matrix counts and
    precision / recall / F1 at each operating point, in ONE
    aggregation pass per threshold (score = o_totalprice as the
    stand-in model output, label = status 'F').

    The threshold list broadcasts against the fact scan (k-row
    crossJoin — the scan cost dominates; with many thresholds this
    becomes the same conditional-aggregate Expand the constraint
    suite uses). Counts are integers; each metric is ONE double
    division over integer-exact operands — F1 is computed directly as
    2tp/(2tp+fp+fn), never by composing the already-rounded precision
    and recall — so both engines emit identical doubles."""
    o = load_table(spark, sf_dir, "orders")
    thr = spark.createDataFrame(
        [(v,) for v in CONFUSION_THRESHOLDS], "thr double"
    )
    pred_pos = F.col("o_totalprice") >= F.col("thr")
    is_pos = F.col("o_orderstatus") == "F"
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    c = (
        o.crossJoin(F.broadcast(thr))
        .groupBy("thr")
        .agg(
            cnt(pred_pos & is_pos).alias("tp"),
            cnt(pred_pos & ~is_pos).alias("fp"),
            cnt(~pred_pos & is_pos).alias("fn"),
            cnt(~pred_pos & ~is_pos).alias("tn"),
        )
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return c.select(
        F.col("thr").cast("double"),
        tp.cast("bigint").alias("tp"),
        fp.cast("bigint").alias("fp"),
        fn.cast("bigint").alias("fn"),
        F.col("tn").cast("bigint").alias("tn"),
        (tp.cast("double") / (tp + fp)).alias("prec"),
        (tp.cast("double") / (tp + fn)).alias("rec"),
        (F.lit(2.0) * tp / (F.lit(2.0) * tp + fp + fn)).alias("f1"),
    )


PSI_BUCKET_WIDTH = 50000
PSI_N_BUCKETS = 10
PSI_CUTOFF = "1998-01-01"


@query(
    "ml_psi_drift",
    oracle=f"""
    WITH b AS (
        SELECT least({PSI_N_BUCKETS - 1},
                     CAST(floor(o_totalprice / {PSI_BUCKET_WIDTH}) AS BIGINT))
                 AS bucket,
               CASE WHEN o_orderdate < TIMESTAMP '{PSI_CUTOFF}'
                    THEN 1 ELSE 0 END AS in_base
        FROM orders
    ),
    c AS (
        SELECT bucket,
               sum(in_base) AS n_base,
               sum(1 - in_base) AS n_curr
        FROM b GROUP BY bucket
    ),
    t AS (SELECT sum(n_base) AS tot_base, sum(n_curr) AS tot_curr FROM c)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(n_base AS BIGINT) AS n_base,
           CAST(n_curr AS BIGINT) AS n_curr,
           CAST(n_base AS DOUBLE) / tot_base AS share_base,
           CAST(n_curr AS DOUBLE) / tot_curr AS share_curr,
           CASE WHEN n_base > 0 AND n_curr > 0 THEN
               round((CAST(n_base AS DOUBLE) / tot_base
                      - CAST(n_curr AS DOUBLE) / tot_curr)
                     * ln(CAST(n_base * tot_curr AS DOUBLE)
                          / (n_curr * tot_base)), 6)
           END AS psi_term
    FROM c, t
    """,
    tags=("ml", "evaluation", "drift", "psi"),
)
def ml_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between a base and a current cohort
    (orders before/after {cutoff}) over fixed-width score buckets —
    the drift monitor a scoring pipeline runs before trusting a model
    on new data. PSI = Σ (p_base - p_curr)·ln(p_base/p_curr).

    Emitted per-bucket and UNSUMMED (the chi-square precedent): the
    differential stays order-exact, and the per-bucket terms are what
    a monitor actually alerts on. The log's ratio argument is built
    as ONE division of exact integer products (n_base·tot_curr /
    n_curr·tot_base), not a quotient of quotients, and ln() output is
    rounded to 6 decimals — Java's and C's ln() differ below that
    (the TF-IDF precedent). One scan, one bucket-key shuffle, a 1-row
    totals broadcast."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.lit(PSI_N_BUCKETS - 1),
        F.floor(F.col("o_totalprice") / PSI_BUCKET_WIDTH),
    ).cast("bigint")
    in_base = F.when(
        F.col("o_orderdate") < F.lit(PSI_CUTOFF).cast("timestamp"), 1
    ).otherwise(0)
    c = (
        o.select(bucket.alias("bucket"), in_base.alias("in_base"))
        .groupBy("bucket")
        .agg(
            F.sum("in_base").alias("n_base"),
            F.sum(1 - F.col("in_base")).alias("n_curr"),
        )
    )
    t = c.agg(
        F.sum("n_base").alias("tot_base"), F.sum("n_curr").alias("tot_curr")
    )
    nb, nc = F.col("n_base"), F.col("n_curr")
    tb, tc = F.col("tot_base"), F.col("tot_curr")
    share_base = nb.cast("double") / tb
    share_curr = nc.cast("double") / tc
    ratio = (nb * tc).cast("double") / (nc * tb)
    return c.crossJoin(F.broadcast(t)).select(
        "bucket",
        nb.cast("bigint").alias("n_base"),
        nc.cast("bigint").alias("n_curr"),
        share_base.alias("share_base"),
        share_curr.alias("share_curr"),
        F.when(
            (nb > 0) & (nc > 0),
            F.round((share_base - share_curr) * F.log(ratio), 6),
        ).alias("psi_term"),
    )


@query(
    "ml_target_encoding",
    oracle="""
    WITH enc AS (
        SELECT o_orderkey,
               o_orderpriority AS priority,
               o_totalprice AS target,
               COUNT(*) OVER w AS n_cat,
               CAST(CAST(
                   SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w
                   - CAST(o_totalprice AS DECIMAL(18,6))
                   AS VARCHAR) AS DOUBLE) AS loo_sum
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority)
    )
    SELECT o_orderkey, priority, target,
           CASE WHEN n_cat > 1 THEN loo_sum / (n_cat - 1) END AS loo_enc
    FROM enc
    ORDER BY o_orderkey
    LIMIT 25
    """,
    tags=("ml", "feature-engineering", "target-encoding", "engine-addition"),
)
def ml_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of order priority against order
    value — the feature-engineering primitive for high-cardinality
    categoricals (each row gets the mean target of its OWN category
    with itself excluded, the standard guard against target leakage).
    Computed with one category-partitioned window (sum + count), no
    self-join: enc = (sum_cat - target) / (n_cat - 1).

    Exactness: the numerator is staged as an exact decimal window sum
    minus an exact decimal cast, converted to double once on each
    engine (VARCHAR route on the DuckDB side), and the final IEEE
    double division then matches bit-for-bit; singleton categories
    yield NULL rather than 0/0.

    Scale shape: one shuffle on the category key; for truly
    high-cardinality categoricals this is the same partial-agg +
    broadcast-back shape as the TF-IDF document-frequency table — the
    window form here additionally streams category partitions without
    materializing a per-category dict anywhere."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority")
    dec = F.col("o_totalprice").cast("decimal(18,6)")
    n_cat = F.count(F.lit(1)).over(w)
    loo_sum = (F.sum(dec).over(w) - dec).cast("double")
    return (
        o.select(
            "o_orderkey",
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").alias("target"),
            n_cat.alias("n_cat"),
            loo_sum.alias("loo_sum"),
        )
        .select(
            "o_orderkey",
            "priority",
            "target",
            F.when(F.col("n_cat") > 1, F.col("loo_sum") / (F.col("n_cat") - 1)).alias(
                "loo_enc"
            ),
        )
        .orderBy("o_orderkey")
        .limit(25)
    )


_CAL_BIN_W = 50_000  # fixed-width score bins (o_totalprice ~ [1e3, 6e5])


@query(
    "ml_calibration_bins",
    oracle=f"""
    SELECT CAST(FLOOR(o_totalprice / {_CAL_BIN_W}.0) AS BIGINT) AS bin_id,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pos,
           {dsum_sql("o_totalprice")} / COUNT(*) AS mean_score,
           CAST(FLOOR(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                * 1000000.0 / COUNT(*)) AS BIGINT) AS pos_rate_ppm
    FROM orders
    GROUP BY 1
    ORDER BY bin_id
    """,
    tags=("ml", "evaluation", "calibration", "engine-addition"),
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram (calibration curve) for the same
    score/label pair ml_auc_exact evaluates (score = order value,
    label = finished status): fixed-width score bins, each reporting
    volume, mean score, and observed positive rate. AUC says the
    ranking is good; THIS says whether the scores mean what they
    claim — the two standard model-eval readouts.

    Cross-engine exactness: fixed-width integer binning (never
    engine-computed quantile edges), decimal-exact mean score, and an
    integer-ppm positive rate via floor division — no float
    percentage ever compared.

    Scale shape: one map-side-combinable aggregate, key space bounded
    by the bin count — the cheapest possible shape; at 100 TB the
    same query runs unchanged because the output is O(bins)."""
    o = load_table(spark, sf_dir, "orders")
    pos = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / float(_CAL_BIN_W))
            .cast("bigint")
            .alias("bin_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(pos).alias("n_pos"),
            (dsum("o_totalprice") / F.count(F.lit(1))).alias("mean_score"),
            F.floor(F.sum(pos) * 1_000_000.0 / F.count(F.lit(1)))
            .cast("bigint")
            .alias("pos_rate_ppm"),
        )
        .orderBy("bin_id")
    )


_KFOLD = 5


@query(
    "ml_group_kfold",
    oracle=f"""
    SELECT CAST(CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
                AS UBIGINT) % {_KFOLD} AS BIGINT) AS fold,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST({finite_measure_sql("value")} AS DECIMAL(18,6)))
                     AS VARCHAR) AS DOUBLE)
               AS value_sum
    FROM events
    GROUP BY 1
    ORDER BY fold
    """,
    tags=("ml", "cross-validation", "group-kfold", "engine-addition"),
)
def ml_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group k-fold assignment by entity hash: every event lands in
    fold md5(user_id) % {_KFOLD}, so a user's entire history sits in
    exactly ONE fold — the leakage-free split a behavioral model
    needs (row-level random splits put the same user in train and
    test and inflate every metric). The readout is the balance audit:
    users, events, and exact value mass per fold. n_users/n_events
    INTENTIONALLY count all assigned rows (fold size is a property of
    the split, not of the readings) while value_sum covers measured
    readings only; no mean is formed from the pair, so the
    unmeasured-rows bias ADVICE r8 flagged for ab_welch_ttest cannot
    arise here — a consumer dividing value_sum by n_events must
    instead count finite readings itself.

    Hash-gating (not seeded RNG) makes the assignment reproducible
    across engines, runs, and repartitions — the same property
    sample_hash_stratified relies on, which is also what makes this
    oracle-pairable at all.

    Scale shape: fold id is a narrow per-row expression; one
    aggregate shuffle with a {_KFOLD}-key space (COUNT(DISTINCT
    user_id) expands it internally to per-(fold, user) partials —
    still keyed by hash, skew-free)."""
    e = load_table(spark, sf_dir, "events")
    fold = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _KFOLD
    )
    return (
        e.groupBy(fold.alias("fold"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(finite_measure("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("value_sum"),
        )
        .orderBy("fold")
    )


_GAINS_ACC = 1 << 20  # GK accuracy: exact while distinct scores < 2^20


@query(
    "ml_gains_deciles",
    oracle="""
    WITH s AS (
        SELECT o_totalprice AS score,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
        FROM orders
    ),
    th AS (
        SELECT [quantile_disc(score, 0.1), quantile_disc(score, 0.2),
                quantile_disc(score, 0.3), quantile_disc(score, 0.4),
                quantile_disc(score, 0.5), quantile_disc(score, 0.6),
                quantile_disc(score, 0.7), quantile_disc(score, 0.8),
                quantile_disc(score, 0.9)] AS t
        FROM s
    ),
    binned AS (
        SELECT 1 + (CASE WHEN score > t[1] THEN 1 ELSE 0 END)
                 + (CASE WHEN score > t[2] THEN 1 ELSE 0 END)
                 + (CASE WHEN score > t[3] THEN 1 ELSE 0 END)
                 + (CASE WHEN score > t[4] THEN 1 ELSE 0 END)
                 + (CASE WHEN score > t[5] THEN 1 ELSE 0 END)
                 + (CASE WHEN score > t[6] THEN 1 ELSE 0 END)
                 + (CASE WHEN score > t[7] THEN 1 ELSE 0 END)
                 + (CASE WHEN score > t[8] THEN 1 ELSE 0 END)
                 + (CASE WHEN score > t[9] THEN 1 ELSE 0 END) AS decile,
               pos
        FROM s, th
    ),
    d AS (
        SELECT decile, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(pos) AS BIGINT) AS n_pos
        FROM binned GROUP BY decile
    ),
    c AS (
        SELECT decile, n, n_pos,
               CAST(sum(n) OVER (ORDER BY decile DESC) AS BIGINT) AS cum_n,
               CAST(sum(n_pos) OVER (ORDER BY decile DESC) AS BIGINT)
                   AS cum_pos,
               CAST(sum(n) OVER () AS BIGINT) AS total_n,
               CAST(sum(n_pos) OVER () AS BIGINT) AS total_pos
        FROM d
    )
    SELECT decile, n, n_pos, cum_n, cum_pos,
           CAST(cum_pos * 1000000 // total_pos AS BIGINT) AS gain_ppm,
           CAST((cum_pos * total_n * 1000000) // (total_pos * cum_n)
                AS BIGINT) AS lift_ppm
    FROM c
    ORDER BY decile DESC
    """,
    tags=("ml", "evaluation", "gains", "lift", "engine-addition"),
)
def ml_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table — the model-targeting readout
    ("contacting the top 30% of scores captures X% of positives, a
    Y-times lift over random"). Deciles come from DISCRETE score
    percentiles broadcast as one row and assigned by threshold
    comparison — never ``ntile`` over a global sort, which funnels
    every row through one partition (same rationale as
    events_rfm_segments). Cumulative sums then run over the 10-row
    decile table, which is driver-scale by construction.

    Exactness: decile membership compares raw doubles to member
    values of the same column (quantile_disc / GK-exact-regime
    percentile_approx both return actual data values); gain and lift
    are integer-ppm divisions, so every output cell is an integer or
    raw data value — nothing accumulates float error. The GK sketch
    is exact while distinct scores < 2^20 (scale guard as in
    agg_percentiles_approx).

    Scale shape: one scan for thresholds (aggregate to ONE row), one
    scan for binning + a 10-group aggregate — both map-side
    combinable; the window runs on 10 rows. At 100 TB the threshold
    pass would ride a mergeable quantile sketch instead; the binning
    pass is unchanged."""
    s = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("score"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("pos"),
    )
    qs = ", ".join(f"0.{i}D" for i in range(1, 10))
    th = s.agg(
        F.expr(f"percentile_approx(score, array({qs}), {_GAINS_ACC})").alias("t")
    )
    binned = s.crossJoin(F.broadcast(th)).select(
        F.expr(
            "1 + "
            + " + ".join(
                f"(CASE WHEN score > t[{i}] THEN 1 ELSE 0 END)"
                for i in range(9)  # Spark arrays are 0-indexed
            )
        ).alias("decile"),
        "pos",
    )
    d = binned.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos"),
    )
    w_cum = (
        Window.orderBy(F.desc("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    c = d.select(
        "decile",
        "n",
        "n_pos",
        F.sum("n").over(w_cum).cast("bigint").alias("cum_n"),
        F.sum("n_pos").over(w_cum).cast("bigint").alias("cum_pos"),
        F.sum("n").over(w_all).cast("bigint").alias("total_n"),
        F.sum("n_pos").over(w_all).cast("bigint").alias("total_pos"),
    )
    return c.select(
        "decile",
        "n",
        "n_pos",
        "cum_n",
        "cum_pos",
        F.expr("CAST(cum_pos * 1000000 div total_pos AS BIGINT)").alias(
            "gain_ppm"
        ),
        F.expr(
            "CAST((cum_pos * total_n * 1000000) div (total_pos * cum_n)"
            " AS BIGINT)"
        ).alias("lift_ppm"),
    ).orderBy(F.desc("decile"))


@query(
    "ml_mrr_hit_rate",
    oracle="""
    WITH w AS (
        SELECT l_orderkey, l_extendedprice,
               max(CASE WHEN l_returnflag = 'R' THEN l_extendedprice END)
                   OVER (PARTITION BY l_orderkey) AS rel_best
        FROM lineitem
    ),
    per AS (
        SELECT l_orderkey,
               CAST(1 + sum(CASE WHEN l_extendedprice > rel_best
                                 THEN 1 ELSE 0 END) AS BIGINT) AS rnk,
               (max(rel_best) IS NOT NULL) AS has_rel
        FROM w GROUP BY l_orderkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN has_rel THEN 1 ELSE 0 END) AS BIGINT)
               AS n_with_rel,
           CAST(sum(CASE WHEN has_rel AND rnk = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS hits_at_1,
           CAST(sum(CASE WHEN has_rel AND rnk <= 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS hits_at_3,
           CAST(sum(CASE WHEN has_rel THEN 1000000 // rnk ELSE 0 END)
                AS BIGINT) AS sum_rr_ppm,
           CAST(sum(CASE WHEN has_rel THEN 1000000 // rnk ELSE 0 END)
                // sum(CASE WHEN has_rel THEN 1 ELSE 0 END)
                AS BIGINT) AS mrr_ppm
    FROM per
    """,
    tags=("ml", "evaluation", "ranking", "mrr", "engine-addition"),
)
def ml_mrr_hit_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-retrieval evaluation: MRR and hit-rate@k, treating each
    order's lineitems as a result list ranked by price and
    ``l_returnflag = 'R'`` items as the relevant ones — the offline
    eval every retrieval / recommender pipeline runs over (query,
    ranked results, relevance) logs.

    The rank of the first relevant item is computed WITHOUT a
    row_number over a possibly tie-broken sort (lineitem's line
    numbers duplicate — audit_primary_key_uniqueness — so row_number
    would be nondeterministic): rank = 1 + #items strictly better
    than the best relevant item. Ties collapse to the same rank on
    both engines by construction. Reciprocal ranks are integer ppm
    (1000000 div rank), so MRR is exact integer arithmetic end to
    end.

    Scale shape: ONE shuffle on the query key (l_orderkey) feeds both
    the per-group max window and the per-group conditional aggregate;
    the final global rollup is a 1-row map-side-combinable sum. No
    joins, no global sort — at 100 TB this is a single
    exchange + two local passes."""
    li = load_table(spark, sf_dir, "lineitem")
    rel_best = F.max(
        F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice"))
    ).over(Window.partitionBy("l_orderkey"))
    w = li.select("l_orderkey", "l_extendedprice", rel_best.alias("rel_best"))
    per = w.groupBy("l_orderkey").agg(
        (
            F.lit(1)
            + F.sum(
                F.when(F.col("l_extendedprice") > F.col("rel_best"), 1).otherwise(0)
            )
        )
        .cast("bigint")
        .alias("rnk"),
        F.max("rel_best").isNotNull().alias("has_rel"),
    )
    rr = F.when(F.col("has_rel"), F.expr("1000000 div rnk")).otherwise(0)
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.when(F.col("has_rel"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_with_rel"),
        F.sum(F.when(F.col("has_rel") & (F.col("rnk") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("hits_at_1"),
        F.sum(F.when(F.col("has_rel") & (F.col("rnk") <= 3), 1).otherwise(0))
        .cast("bigint")
        .alias("hits_at_3"),
        F.sum(rr).cast("bigint").alias("sum_rr_ppm"),
        F.expr(
            "CAST(sum(CASE WHEN has_rel THEN 1000000 div rnk ELSE 0 END)"
            " div sum(CASE WHEN has_rel THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("mrr_ppm"),
    )


@query(
    "ml_ks_two_sample",
    oracle="""
    WITH s AS (
        SELECT o_totalprice AS score,
               sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS na,
               sum(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS nb
        FROM orders GROUP BY o_totalprice
    ),
    t AS (
        SELECT CAST(sum(na) AS BIGINT) AS n_a,
               CAST(sum(nb) AS BIGINT) AS n_b FROM s
    ),
    c AS (
        SELECT score,
               CAST(sum(na) OVER (ORDER BY score) AS BIGINT) AS ca,
               CAST(sum(nb) OVER (ORDER BY score) AS BIGINT) AS cb
        FROM s
    ),
    d AS (
        SELECT score,
               abs(ca * (SELECT n_b FROM t) - cb * (SELECT n_a FROM t))
                   AS diff
        FROM c
    ),
    m AS (SELECT CAST(max(diff) AS BIGINT) AS d_num FROM d)
    SELECT t.n_a, t.n_b, m.d_num,
           (SELECT min(score) FROM d WHERE diff = m.d_num) AS ks_score,
           CAST(m.d_num AS DOUBLE)
             / (CAST(t.n_a AS DOUBLE) * CAST(t.n_b AS DOUBLE)) AS ks_stat
    FROM t, m
    """,
    tags=("ml", "evaluation", "ks-test", "drift", "prefix-sum"),
)
def ml_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic — the
    distribution-drift test PSI approximates with bins, computed
    EXACTLY: D = max |F_a(x) - F_b(x)| over the pooled distinct
    scores. Kept integer end to end by cross-scaling the cumulative
    counts (|ca·n_b - cb·n_a| is an integer; D = that / (n_a·n_b)),
    so the max, its argmax (min score achieving it, tie-safe) and
    the final statistic are bit-identical cross-engine — one float
    division at the end.

    Scale shape: the same distributed prefix sum as ml_auc_exact —
    distinct-score aggregate, repartitionByRange(score), per-range
    window sums + P-value driver-side offset cumsum (P integers move,
    not data), then a global max. No single-partition global window
    at any size; the cum table is localCheckpoint'ed because both
    the max and the argmax read it (diamond rule)."""
    o = load_table(spark, sf_dir, "orders")
    pos = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    s = (
        o.groupBy(F.col("o_totalprice").alias("score"))
        .agg(F.sum(pos).alias("na"), F.sum(1 - pos).alias("nb"))
        .repartitionByRange(AUC_RANGE_PARTITIONS, "score")
        .withColumn("pid", F.spark_partition_id())
        .transform(materialize)
    )
    per_part = {
        r["pid"]: (r["ta"], r["tb"])
        for r in s.groupBy("pid")
        .agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
        .collect()
    }
    offsets, run_a, run_b = [], 0, 0
    for pid in range(AUC_RANGE_PARTITIONS):
        offsets.append((pid, run_a, run_b))
        ta, tb = per_part.get(pid, (0, 0))
        run_a += int(ta)
        run_b += int(tb)
    n_a, n_b = run_a, run_b
    off = spark.createDataFrame(offsets, "pid int, offa long, offb long")
    w = (
        Window.partitionBy("pid")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = s.join(F.broadcast(off), "pid").select(
        "score",
        (F.sum("na").over(w) + F.col("offa")).cast("bigint").alias("ca"),
        (F.sum("nb").over(w) + F.col("offb")).cast("bigint").alias("cb"),
    )
    d = c.select(
        "score",
        F.abs(F.col("ca") * F.lit(n_b) - F.col("cb") * F.lit(n_a)).alias(
            "diff"
        ),
    ).transform(materialize)
    m = d.agg(F.max("diff").cast("bigint").alias("d_num"))
    arg = (
        d.join(F.broadcast(m), d["diff"] == m["d_num"])
        .agg(F.min("score").alias("ks_score"))
    )
    return (
        m.crossJoin(arg)
        .select(
            F.lit(n_a).cast("bigint").alias("n_a"),
            F.lit(n_b).cast("bigint").alias("n_b"),
            "d_num",
            "ks_score",
            (
                F.col("d_num").cast("double")
                / (F.lit(float(n_a)) * F.lit(float(n_b)))
            ).alias("ks_stat"),
        )
    )


FH_BUCKETS = 64  # feature-hashing dims: md5 prefix mod 64


@query(
    "ml_feature_hashing",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split(
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                   ' ')) AS term
        FROM documents
    ),
    hashed AS (
        SELECT doc_id,
               CAST(ascii(substr(md5(term), 1, 1)) % 8 AS BIGINT) * 8
                 + CAST(ascii(substr(md5(term), 2, 1)) % 8 AS BIGINT)
                 AS bucket
        FROM toks
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS tf_total,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS df_docs
    FROM hashed
    GROUP BY bucket
    ORDER BY bucket
    """,
    tags=("ml", "feature-hashing", "text", "engine-addition"),
)
def ml_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (feature hashing): every token maps to one of
    FH_BUCKETS fixed dimensions by hashing — no vocabulary build, no
    dictionary shuffle, which is what makes bag-of-words featurization
    O(tokens) at 100 TB (a vocab join would shuffle the dictionary AND
    the corpus; the hash needs neither). Output is the per-bucket
    term-frequency total and document frequency — the collision
    profile a pipeline checks before committing to a width.

    The bucket is derived from two md5 hex chars (each `ascii % 8`),
    spelled identically on both engines — the same
    no-integer-parsing md5 trick as the LSH band keys and the
    count-min grid. The Spark side keeps the whole map in ONE
    expression chain (split → explode → hash) inside codegen; the
    only shuffle is the 64-group rollup (count + distinct doc_id —
    at corpus scale the distinct swaps to a bitmap partial as in
    agg_bitmap_distinct).
    """
    from .text import _toks

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(_toks(F.col("text"))).alias("term")
    )
    hashed = toks.select(
        "doc_id",
        (
            F.expr("CAST(ascii(substr(md5(term), 1, 1)) % 8 AS BIGINT)") * 8
            + F.expr("CAST(ascii(substr(md5(term), 2, 1)) % 8 AS BIGINT)")
        ).alias("bucket"),
    )
    return (
        hashed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("tf_total"),
            F.countDistinct("doc_id").cast("bigint").alias("df_docs"),
        )
        .orderBy("bucket")
    )


@query(
    "ml_naive_bayes_train",
    oracle="""
    WITH toks AS (
        SELECT lang,
               unnest(string_split(
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                   ' ')) AS term
        FROM documents
    ),
    hashed AS (
        SELECT lang,
               CAST(ascii(substr(md5(term), 1, 1)) % 8 AS BIGINT) * 8
                 + CAST(ascii(substr(md5(term), 2, 1)) % 8 AS BIGINT)
                 AS bucket
        FROM toks
    ),
    counts AS (
        SELECT lang, bucket, CAST(count(*) AS BIGINT) AS cnt
        FROM hashed GROUP BY 1, 2
    )
    SELECT lang, bucket, cnt,
           CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS lang_total,
           CAST((cnt + 1) * 1000000
                // (sum(cnt) OVER (PARTITION BY lang) + 64) AS BIGINT)
               AS prob_ppm
    FROM counts
    ORDER BY lang, bucket
    """,
    tags=("ml", "naive-bayes", "training", "engine-addition"),
)
def ml_naive_bayes_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes TRAINING as pure aggregation — the
    second "training is one aggregate pass" demonstration next to
    ml_linreg_closed_form: class-conditional token-bucket counts
    (classes = document language, features = the 64 hashed buckets
    of ml_feature_hashing) plus the add-one-smoothed conditional
    probability in integer ppm: (cnt+1)·10⁶ div (total+|V|). No
    vocabulary shuffle (hashing trick), no iterative optimizer, no
    floats — the full model is |classes| × 64 integer rows, exact on
    both engines. Inference is then a broadcast-join + per-row
    log-sum, the classic 100 TB scoring shape.

    Scale: one corpus scan, one (class, bucket) shuffle (map-side
    combinable), a window over the model-sized table."""
    from .text import _toks

    d = load_table(spark, sf_dir, "documents")
    hashed = d.select(
        "lang", F.explode(_toks(F.col("text"))).alias("term")
    ).select(
        "lang",
        (
            F.expr("CAST(ascii(substr(md5(term), 1, 1)) % 8 AS BIGINT)") * 8
            + F.expr("CAST(ascii(substr(md5(term), 2, 1)) % 8 AS BIGINT)")
        ).alias("bucket"),
    )
    counts = hashed.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w = Window.partitionBy("lang")
    return counts.select(
        "lang",
        "bucket",
        "cnt",
        F.sum("cnt").over(w).cast("bigint").alias("lang_total"),
        F.expr(
            "CAST((cnt + 1) * 1000000 div "
            "(sum(cnt) OVER (PARTITION BY lang) + 64) AS BIGINT)"
        ).alias("prob_ppm"),
    ).orderBy("lang", "bucket")


@query(
    "ml_regression_metrics",
    oracle=f"""
    WITH m AS (
        SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n,
               {dsum_sql("l_quantity")} AS sx,
               {dsum_sql("l_extendedprice")} AS sy,
               {dsum_prod_sql("l_quantity", "l_quantity")} AS sxx,
               {dsum_prod_sql("l_extendedprice", "l_extendedprice")} AS syy,
               {dsum_prod_sql("l_quantity", "l_extendedprice")} AS sxy
        FROM lineitem GROUP BY l_returnflag
    ),
    fit AS (
        SELECT l_returnflag, n, sx, sy, sxx, syy, sxy,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b
        FROM m
    ),
    fit2 AS (
        SELECT *, (sy - b * sx) / n AS a FROM fit
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           b AS slope, a AS intercept,
           (syy - 2 * a * sy - 2 * b * sxy + 2 * a * b * sx
            + a * a * n + b * b * sxx) / n AS mse,
           1 - (syy - 2 * a * sy - 2 * b * sxy + 2 * a * b * sx
                + a * a * n + b * b * sxx)
             / (syy - sy * sy / n) AS r2
    FROM fit2
    ORDER BY l_returnflag
    """,
    tags=("ml", "regression", "evaluation", "engine-addition"),
)
def ml_regression_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train AND evaluate in ONE aggregation pass: the per-group OLS
    fit (ml_linreg_closed_form) plus its MSE and R² — derived
    algebraically from the same six moments via
    SSE = Σy² − 2aΣy − 2bΣxy + 2abΣx + a²n + b²Σx², so there is NO
    second residual scan (the naive eval re-reads the fact table to
    compute per-row residuals; the moment identity makes evaluation
    free). Moments are exact decimal sums; the fit and metric
    expressions are staged through identical intermediates on both
    engines (the ab_welch_ttest float discipline), so slope, MSE and
    R² match bit-for-bit.

    Scale: one map-side-combined shuffle for everything — at 100 TB
    per-model-per-segment training+eval costs exactly one pass, the
    same envelope as a count(*)."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum_prod(x, x).alias("sxx"),
        dsum_prod(y, y).alias("syy"),
        dsum_prod(x, y).alias("sxy"),
    )
    fit = m.withColumn(
        "b",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
    )
    fit2 = fit.withColumn(
        "a", (F.col("sy") - F.col("b") * F.col("sx")) / F.col("n")
    )
    sse = (
        F.col("syy")
        - 2 * F.col("a") * F.col("sy")
        - 2 * F.col("b") * F.col("sxy")
        + 2 * F.col("a") * F.col("b") * F.col("sx")
        + F.col("a") * F.col("a") * F.col("n")
        + F.col("b") * F.col("b") * F.col("sxx")
    )
    sst = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    return fit2.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.col("b").alias("slope"),
        F.col("a").alias("intercept"),
        (sse / F.col("n")).alias("mse"),
        (F.lit(1) - sse / sst).alias("r2"),
    ).orderBy("l_returnflag")


@query(
    "ml_decision_stump",
    oracle="""
    WITH per AS (
        SELECT CAST(l_quantity AS BIGINT) AS qty,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS pos
        FROM lineitem GROUP BY 1
    ),
    cum AS (
        SELECT qty,
               CAST(sum(n) OVER (ORDER BY qty
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS nl,
               CAST(sum(pos) OVER (ORDER BY qty
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS pl,
               CAST(sum(n) OVER () AS BIGINT) AS nt,
               CAST(sum(pos) OVER () AS BIGINT) AS pt
        FROM per
    ),
    ev AS (
        SELECT qty AS split_qty, nl AS n_left, pl AS pos_left,
               nt - nl AS n_right, pt - pl AS pos_right,
               CAST(nl * nl - pl * pl - (nl - pl) * (nl - pl) AS DOUBLE)
                   / (CAST(nl AS DOUBLE) * nt)
             + CAST((nt - nl) * (nt - nl) - (pt - pl) * (pt - pl)
                    - ((nt - nl) - (pt - pl)) * ((nt - nl) - (pt - pl))
                    AS DOUBLE)
                   / (CAST(nt - nl AS DOUBLE) * nt) AS gini_weighted
        FROM cum WHERE nl < nt
    )
    SELECT split_qty, n_left, pos_left, n_right, pos_right, gini_weighted,
           CASE WHEN gini_weighted = min(gini_weighted) OVER () THEN 1
                ELSE 0 END AS is_best
    FROM ev ORDER BY split_qty
    """,
    tags=("ml", "tree", "split-search", "engine-addition"),
)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump split search (the inner loop of distributed
    tree boosting, a la XGBoost's approx split finder): evaluate
    EVERY candidate threshold on l_quantity for classifying
    l_returnflag='R' in one aggregation pass + one model-sized
    window. Per-value (n, positives) histograms are built with one
    map-side-combinable shuffle; cumulative sums over the ~50-row
    histogram give each threshold's left/right class counts, and the
    weighted Gini impurity is formed from exact integer counts with
    one double division per side (identical expression tree on both
    engines, so the argmin flag matches bit-for-bit; nl*nl fits
    bigint up to ~3e9 rows per side).

    Scale: the fact scan collapses to |distinct values| rows before
    any windowing — at 100 TB split search per feature costs one
    count-shuffle, and the unpartitioned window runs on the tiny
    histogram, never the data."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy(F.col("l_quantity").cast("bigint").alias("qty")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("pos"),
    )
    wc = Window.orderBy("qty").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = per.select(
        "qty",
        F.sum("n").over(wc).cast("bigint").alias("nl"),
        F.sum("pos").over(wc).cast("bigint").alias("pl"),
        F.sum("n").over(wall).cast("bigint").alias("nt"),
        F.sum("pos").over(wall).cast("bigint").alias("pt"),
    )
    nl, pl = F.col("nl"), F.col("pl")
    nr, pr = F.col("nt") - nl, F.col("pt") - pl
    gini = (
        (nl * nl - pl * pl - (nl - pl) * (nl - pl)).cast("double")
        / (nl.cast("double") * F.col("nt"))
    ) + (
        (nr * nr - pr * pr - (nr - pr) * (nr - pr)).cast("double")
        / (nr.cast("double") * F.col("nt"))
    )
    ev = cum.filter(nl < F.col("nt")).select(
        F.col("qty").alias("split_qty"),
        nl.alias("n_left"),
        pl.alias("pos_left"),
        nr.alias("n_right"),
        pr.alias("pos_right"),
        gini.alias("gini_weighted"),
    )
    return ev.select(
        "*",
        F.when(
            F.col("gini_weighted")
            == F.min("gini_weighted").over(Window.partitionBy()),
            1,
        )
        .otherwise(0)
        .alias("is_best"),
    ).orderBy("split_qty")


# Poisson(1) CDF scaled to integer millionths: a uniform hash draw u
# in [0, 1e6) maps to replicate weight w = #thresholds <= u. This is
# the standard distributed bootstrap (per-row independent Poisson(1)
# weights instead of a global n-out-of-n resample); deriving u from
# md5(event_id, replicate) makes every weight deterministic and
# engine-independent, so the oracle reproduces the exact draws.
_POIS_CUM = (367879, 735759, 919699, 981012, 996340, 999406, 999917, 999990, 999999)
_N_REPS = 32


def _pois_case(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS_CUM)
    )
    return f"CAST(CASE {branches} ELSE {len(_POIS_CUM)} END AS BIGINT)"


@query(
    "ml_bootstrap_ci",
    oracle=f"""
    WITH reps AS (
        SELECT e.event_type, r.r,
               {dsum_prod_sql(
                   _pois_case(
                       "CAST(('0x' || substring(md5(CAST(e.event_id AS VARCHAR)"
                       " || ':' || CAST(r.r AS VARCHAR)), 1, 8)) AS UBIGINT)"
                       " % 1000000"
                   ),
                   finite_measure_sql("e.value"),
               )} AS wsum,
               CAST(sum({_pois_case(
                   "CAST(('0x' || substring(md5(CAST(e.event_id AS VARCHAR)"
                   " || ':' || CAST(r.r AS VARCHAR)), 1, 8)) AS UBIGINT)"
                   " % 1000000"
               )}) AS BIGINT) AS wn,
               {dsum_sql(finite_measure_sql("e.value"))} AS vsum,
               CAST(count(*) AS BIGINT) AS n
        FROM events e CROSS JOIN (SELECT unnest(generate_series(0, {_N_REPS - 1})) AS r) r
        GROUP BY 1, 2
    ),
    means AS (
        SELECT event_type, r, n, vsum,
               wsum / nullif(CAST(wn AS DOUBLE), 0) AS mean_r
        FROM reps
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY mean_r ASC, r ASC) AS ra,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY mean_r DESC, r ASC) AS rd
        FROM means WHERE mean_r IS NOT NULL
    )
    SELECT event_type,
           max(n) AS n,
           max(vsum) / max(n) AS mean_value,
           max(CASE WHEN ra = 2 THEN mean_r END) AS ci_lo,
           max(CASE WHEN rd = 2 THEN mean_r END) AS ci_hi
    FROM ranked GROUP BY event_type ORDER BY event_type
    """,
    tags=("ml", "bootstrap", "statistics", "engine-addition"),
)
def ml_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the per-type mean via the
    DETERMINISTIC Poisson bootstrap: each (row, replicate) gets an
    independent Poisson(1) weight derived from md5(event_id,
    replicate) against the integer-millionth Poisson CDF — the
    distributed-bootstrap construction (per-row weights, no global
    n-out-of-n resample, so replicates are one map-side-combinable
    aggregate away) made reproducible across engines, retries and
    partitionings because the 'randomness' is a content hash. The CI
    is the 2nd/31st order statistic of the 32 replicate means
    (~94% coverage); weighted sums are decimal-exact, each mean is
    one IEEE division, so both engines match bit-for-bit.

    Scale: one scan with a 32x flat-map fan-out, one
    (type, replicate) shuffle of partial sums, then windows over the
    |types|x32 model table. At 100 TB the fan-out stays in the map
    stage (no replicated shuffle data beyond the partial aggregates).
    """
    e = load_table(spark, sf_dir, "events")
    exploded = e.select(
        "event_type",
        "event_id",
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(_N_REPS - 1))).alias("r"),
    )
    u = (
        "conv(substring(md5(CAST(event_id AS STRING) || ':' || "
        "CAST(r AS STRING)), 1, 8), 16, 10) % 1000000"
    )
    w = F.expr(_pois_case(u))
    reps = exploded.groupBy("event_type", "r").agg(
        dsum_prod(w, finite_measure("value")).alias("wsum"),
        F.sum(w).cast("bigint").alias("wn"),
        dsum(finite_measure("value")).alias("vsum"),
        F.count("*").cast("bigint").alias("n"),
    )
    means = reps.withColumn(
        "mean_r",
        F.col("wsum") / F.nullif(F.col("wn").cast("double"), F.lit(0.0)),
    )
    wa = Window.partitionBy("event_type").orderBy(
        F.col("mean_r").asc(), F.col("r").asc()
    )
    wd = Window.partitionBy("event_type").orderBy(
        F.col("mean_r").desc(), F.col("r").asc()
    )
    # drop empty replicates (all-zero Poisson weights, ~e^-n chance)
    # BEFORE ranking: a NULL mean would sort NULLS FIRST on Spark but
    # NULLS LAST on DuckDB and silently shift the order statistics
    ranked = means.filter(F.col("mean_r").isNotNull()).select(
        "*",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            (F.max("vsum") / F.max("n")).alias("mean_value"),
            F.max(F.when(F.col("ra") == 2, F.col("mean_r"))).alias("ci_lo"),
            F.max(F.when(F.col("rd") == 2, F.col("mean_r"))).alias("ci_hi"),
        )
        .orderBy("event_type")
    )


@query(
    "ml_rank_fusion_rrf",
    oracle="""
    WITH stats AS (
        SELECT l_suppkey,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS rev_cents,
               CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        FROM lineitem GROUP BY 1
    ),
    ranked AS (
        SELECT l_suppkey, rev_cents, n_orders,
               CAST(row_number() OVER (ORDER BY rev_cents DESC, l_suppkey ASC)
                    AS BIGINT) AS rank_rev,
               CAST(row_number() OVER (ORDER BY n_orders DESC, l_suppkey ASC)
                    AS BIGINT) AS rank_cnt
        FROM stats
    ),
    fused AS (
        SELECT *,
               1000000000000 // (60 + rank_rev)
             + 1000000000000 // (60 + rank_cnt) AS rrf_score
        FROM ranked
    )
    SELECT l_suppkey, rev_cents, n_orders, rank_rev, rank_cnt, rrf_score
    FROM fused
    ORDER BY rrf_score DESC, l_suppkey ASC
    LIMIT 20
    """,
    tags=("ml", "ranking", "fusion", "engine-addition"),
)
def ml_rank_fusion_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two independent supplier rankings
    (by exact revenue cents; by distinct-order count) — the standard
    way to merge heterogeneous retrieval/recommendation rankings
    without score calibration. RRF terms are computed as scaled
    INTEGER divisions (1e12 div (60+rank)), so scores are exact
    bigints and the fused order is engine-independent; every
    ranking tie breaks on the key.

    Scale: one fact shuffle builds both rankings' input; the two
    row_number windows and the fusion run on the |suppliers| model
    table; the final top-20 is a TakeOrderedAndProject, never a full
    sort of the fact data."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_suppkey").agg(
        F.sum(
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
                "bigint"
            )
        )
        .cast("bigint")
        .alias("rev_cents"),
        F.countDistinct("l_orderkey").cast("bigint").alias("n_orders"),
    )
    wr = Window.orderBy(F.col("rev_cents").desc(), F.col("l_suppkey").asc())
    wc = Window.orderBy(F.col("n_orders").desc(), F.col("l_suppkey").asc())
    ranked = stats.select(
        "*",
        F.row_number().over(wr).cast("bigint").alias("rank_rev"),
        F.row_number().over(wc).cast("bigint").alias("rank_cnt"),
    )
    fused = ranked.withColumn(
        "rrf_score",
        F.expr(
            "1000000000000 div (60 + rank_rev)"
            " + 1000000000000 div (60 + rank_cnt)"
        ),
    )
    return fused.orderBy(
        F.col("rrf_score").desc(), F.col("l_suppkey").asc()
    ).limit(20)


@query(
    "ml_roc_curve",
    oracle="""
    WITH s AS (
        SELECT CAST(l_quantity AS BIGINT) AS score,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
        FROM lineitem
    ),
    per AS (
        SELECT score, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(pos) AS BIGINT) AS n_pos
        FROM s GROUP BY score
    ),
    c AS (
        SELECT score, n, n_pos,
               CAST(sum(n_pos) OVER (ORDER BY score DESC) AS BIGINT) AS tp,
               CAST(sum(n - n_pos) OVER (ORDER BY score DESC) AS BIGINT) AS fp,
               CAST(sum(n_pos) OVER () AS BIGINT) AS total_pos,
               CAST(sum(n - n_pos) OVER () AS BIGINT) AS total_neg
        FROM per
    )
    SELECT score AS threshold, tp, fp,
           CAST(tp * 1000000 // total_pos AS BIGINT) AS tpr_ppm,
           CAST(fp * 1000000 // total_neg AS BIGINT) AS fpr_ppm
    FROM c ORDER BY threshold DESC
    """,
    tags=("ml", "evaluation", "roc", "engine-addition"),
)
def ml_roc_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL ROC curve at every distinct score ('predict positive
    when quantity >= t'): per-threshold true/false positive counts
    from cumulative sums over the per-score histogram, rates in
    integer ppm — the curve whose area ml_auc_exact computes in
    closed form, materialized point by point for calibration review.
    Complements ml_gains_deciles (quantile-bucketed, scan-assigned
    deciles); here thresholds are the score's own support, so the
    curve is exact, not sampled.

    Scale: the fact scan collapses to |distinct scores| rows in one
    map-side-combinable shuffle; every window runs on that
    model-sized histogram. With a continuous score, bucket first
    (the gains pattern) — an every-distinct-value curve over a
    mostly-unique score would be output-bound, not compute-bound."""
    s = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("score"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("pos"),
    )
    per = s.groupBy("score").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos"),
    )
    wc = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    c = per.select(
        "score",
        "n",
        "n_pos",
        F.sum("n_pos").over(wc).cast("bigint").alias("tp"),
        F.sum(F.col("n") - F.col("n_pos")).over(wc).cast("bigint").alias("fp"),
        F.sum("n_pos").over(wall).cast("bigint").alias("total_pos"),
        F.sum(F.col("n") - F.col("n_pos"))
        .over(wall)
        .cast("bigint")
        .alias("total_neg"),
    )
    return c.select(
        F.col("score").alias("threshold"),
        "tp",
        "fp",
        F.expr("CAST(tp * 1000000 div total_pos AS BIGINT)").alias("tpr_ppm"),
        F.expr("CAST(fp * 1000000 div total_neg AS BIGINT)").alias("fpr_ppm"),
    ).orderBy(F.col("threshold").desc())


@query(
    "ml_split_gain_all_features",
    oracle="""
    WITH melted AS (
        SELECT f.feature, f.val,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
        FROM lineitem, LATERAL (VALUES
            ('quantity', CAST(l_quantity AS BIGINT)),
            ('discount_x100', CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                                   AS BIGINT)),
            ('tax_x100', CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT))
        ) AS f(feature, val)
    ),
    per AS (
        SELECT feature, val, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(pos) AS BIGINT) AS pos
        FROM melted GROUP BY 1, 2
    ),
    cum AS (
        SELECT feature, val,
               CAST(sum(n) OVER (PARTITION BY feature ORDER BY val
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS nl,
               CAST(sum(pos) OVER (PARTITION BY feature ORDER BY val
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS pl,
               CAST(sum(n) OVER (PARTITION BY feature) AS BIGINT) AS nt,
               CAST(sum(pos) OVER (PARTITION BY feature) AS BIGINT) AS pt
        FROM per
    ),
    ev AS (
        SELECT feature, val, nl, pl, nt, pt,
               CAST(nl * nl - pl * pl - (nl - pl) * (nl - pl) AS DOUBLE)
                   / (CAST(nl AS DOUBLE) * nt)
             + CAST((nt - nl) * (nt - nl) - (pt - pl) * (pt - pl)
                    - ((nt - nl) - (pt - pl)) * ((nt - nl) - (pt - pl))
                    AS DOUBLE)
                   / (CAST(nt - nl AS DOUBLE) * nt) AS gini_split
        FROM cum WHERE nl < nt
    ),
    best AS (
        SELECT feature, val AS best_split, nl AS n_left, gini_split,
               CAST(nt * nt - pt * pt - (nt - pt) * (nt - pt) AS DOUBLE)
                   / (CAST(nt AS DOUBLE) * nt) AS gini_root,
               row_number() OVER (PARTITION BY feature
                   ORDER BY gini_split ASC, val ASC) AS rk
        FROM ev
    )
    SELECT feature, best_split, n_left, gini_root, gini_split,
           gini_root - gini_split AS gain
    FROM best WHERE rk = 1 ORDER BY feature
    """,
    tags=("ml", "tree", "split-search", "engine-addition"),
)
def ml_split_gain_all_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split search over ALL features in ONE scan — the actual inner
    loop of distributed gradient boosting: melt each row into
    (feature, value, label) via a generator (3x map-side fan-out, no
    joins), build every feature's value histogram in one shuffle,
    and run the cumulative-Gini evaluation per feature partition;
    report each feature's best threshold and its impurity GAIN over
    the root. Compare ml_decision_stump (one feature, same math):
    at 100 TB, per-feature passes cost |features| scans — this costs
    one. Exact integer class counts; the one double division per
    side follows the identical expression tree on both engines;
    ties break on the smaller threshold.

    Scale: one fact scan, one (feature, value) shuffle (map-side
    combinable), windows on the |features|x|values| histogram."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("bigint")
    tax = (F.col("l_tax").cast("decimal(18,2)") * 100).cast("bigint")
    melted = li.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("quantity").alias("feature"),
                    F.col("l_quantity").cast("bigint").alias("val"),
                ),
                F.struct(
                    F.lit("discount_x100").alias("feature"),
                    disc.alias("val"),
                ),
                F.struct(F.lit("tax_x100").alias("feature"), tax.alias("val")),
            )
        ).alias("x"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("pos"),
    ).select("x.feature", "x.val", "pos")
    per = melted.groupBy("feature", "val").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("pos"),
    )
    wc = (
        Window.partitionBy("feature")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = Window.partitionBy("feature")
    cum = per.select(
        "feature",
        "val",
        F.sum("n").over(wc).cast("bigint").alias("nl"),
        F.sum("pos").over(wc).cast("bigint").alias("pl"),
        F.sum("n").over(wf).cast("bigint").alias("nt"),
        F.sum("pos").over(wf).cast("bigint").alias("pt"),
    )
    nl, pl = F.col("nl"), F.col("pl")
    nt, pt = F.col("nt"), F.col("pt")
    nr, pr = nt - nl, pt - pl
    gini_split = (
        (nl * nl - pl * pl - (nl - pl) * (nl - pl)).cast("double")
        / (nl.cast("double") * nt)
    ) + (
        (nr * nr - pr * pr - (nr - pr) * (nr - pr)).cast("double")
        / (nr.cast("double") * nt)
    )
    gini_root = (nt * nt - pt * pt - (nt - pt) * (nt - pt)).cast("double") / (
        nt.cast("double") * nt
    )
    ev = cum.filter(nl < nt).select(
        "feature",
        F.col("val").alias("best_split"),
        nl.alias("n_left"),
        gini_root.alias("gini_root"),
        gini_split.alias("gini_split"),
        F.row_number()
        .over(
            Window.partitionBy("feature").orderBy(
                gini_split.asc(), F.col("val").asc()
            )
        )
        .alias("rk"),
    )
    return (
        ev.filter(F.col("rk") == 1)
        .select(
            "feature",
            "best_split",
            "n_left",
            "gini_root",
            "gini_split",
            (F.col("gini_root") - F.col("gini_split")).alias("gain"),
        )
        .orderBy("feature")
    )


@query(
    "ab_ratio_delta_method",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CASE WHEN user_id % 2 = 0 THEN 'treat' ELSE 'control' END
                   AS arm,
               {dsum_sql(finite_measure_sql("value"))} AS x,
               CAST(count(*) AS BIGINT) AS y
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    mom AS (
        SELECT arm,
               CAST(count(*) AS DOUBLE) AS n,
               {dsum_sql("x")} AS sx,
               CAST(CAST(sum(y) AS VARCHAR) AS DOUBLE) AS sy,
               {dsum_prod_sql("x", "x")} AS sxx,
               CAST(CAST(sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                    AS VARCHAR) AS DOUBLE) AS syy,
               {dsum_prod_sql("x", "y")} AS sxy
        FROM per_user GROUP BY arm
    ),
    est AS (
        SELECT arm, n, sx, sy,
               sx / sy AS ratio,
               (sxx / n - (sx / n) * (sx / n)) AS vx,
               (syy / n - (sy / n) * (sy / n)) AS vy,
               (sxy / n - (sx / n) * (sy / n)) AS cxy
        FROM mom
    )
    SELECT arm, CAST(n AS BIGINT) AS n_users, ratio,
           (vx - 2 * ratio * cxy + ratio * ratio * vy)
               / (n * (sy / n) * (sy / n)) AS var_delta,
           sqrt((vx - 2 * ratio * cxy + ratio * ratio * vy)
               / (n * (sy / n) * (sy / n))) AS se_delta
    FROM est ORDER BY arm
    """,
    tags=("ml", "experiment", "delta-method", "engine-addition"),
)
def ab_ratio_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard error of a RATIO metric (value per event, the
    CTR/revenue-per-session shape) under user-level randomization —
    the delta method: a ratio of sums is NOT an average of i.i.d.
    rows, so naive row-level variance is wrong; the correct variance
    comes from per-USER moment sums (x=user value, y=user events):
    var(R) ~= (vx - 2R*cxy + R^2*vy) / (n*ybar^2). Complements
    ab_welch_ttest (per-row continuous metrics). Deterministic arm
    assignment by user id parity; x-moments decimal-exact via the
    dsum/dsum_prod discipline, y-moments exact integers, and every
    downstream float op staged through identical intermediates so
    both engines match bit-for-bit.

    Scale: one user-level shuffle, then one |arms| aggregate of the
    six moments — the experimentation readout costs two
    map-side-combinable passes regardless of corpus size."""
    per_user = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            dsum(finite_measure("value")).alias("x"),
            F.count("*").cast("bigint").alias("y"),
        )
        .withColumn(
            "arm",
            F.when(F.col("user_id") % 2 == 0, "treat").otherwise("control"),
        )
    )
    mom = per_user.groupBy("arm").agg(
        F.count("*").cast("double").alias("n"),
        dsum("x").alias("sx"),
        F.sum("y").cast("decimal(38,0)").cast("double").alias("sy"),
        dsum_prod("x", "x").alias("sxx"),
        F.sum(F.col("y").cast("decimal(19,0)") * F.col("y").cast("decimal(19,0)"))
        .cast("decimal(38,0)")
        .cast("double")
        .alias("syy"),
        dsum_prod("x", "y").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    est = mom.select(
        "arm",
        "n",
        "sx",
        "sy",
        (sx / sy).alias("ratio"),
        (F.col("sxx") / n - (sx / n) * (sx / n)).alias("vx"),
        (F.col("syy") / n - (sy / n) * (sy / n)).alias("vy"),
        (F.col("sxy") / n - (sx / n) * (sy / n)).alias("cxy"),
    )
    var_delta = (
        F.col("vx")
        - 2 * F.col("ratio") * F.col("cxy")
        + F.col("ratio") * F.col("ratio") * F.col("vy")
    ) / (n * (sy / n) * (sy / n))
    return est.select(
        "arm",
        n.cast("bigint").alias("n_users"),
        "ratio",
        var_delta.alias("var_delta"),
        F.sqrt(var_delta).alias("se_delta"),
    ).orderBy("arm")


@query(
    "ml_mann_whitney_u",
    oracle="""
    WITH vals AS (
        SELECT CASE WHEN l_returnflag = 'R' THEN 'a' ELSE 'b' END AS grp,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS v
        FROM lineitem WHERE l_returnflag IN ('R', 'A')
    ),
    per AS (
        SELECT v, CAST(count(*) AS BIGINT) AS t,
               CAST(sum(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS BIGINT)
                   AS ta
        FROM vals GROUP BY v
    ),
    ranked AS (
        SELECT v, t, ta,
               CAST(coalesce(sum(t) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum_before
        FROM per
    ),
    agg AS (
        SELECT CAST(sum(ta * (2 * cum_before + t + 1)) AS BIGINT) AS w2a,
               CAST(sum(ta) AS BIGINT) AS na,
               CAST(sum(t - ta) AS BIGINT) AS nb,
               CAST(sum(t * t * t - t) AS BIGINT) AS tie3
        FROM ranked
    )
    SELECT na, nb,
           CAST(w2a - na * (na + 1) AS BIGINT) AS u_a_x2,
           (CAST(w2a - na * (na + 1) AS DOUBLE) / 2
            - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2)
           / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12
                  * ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) + 1)
                     - CAST(tie3 AS DOUBLE)
                       / ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                          * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 1))))
               AS z
    FROM agg
    """,
    tags=("ml", "statistics", "nonparametric", "engine-addition"),
)
def ml_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) two-sample test with FULL
    tie correction — the nonparametric A/B readout when Welch's
    normality assumption is off. Distributed exact ranks without a
    global sort: collapse to the per-value histogram (one shuffle),
    then average ranks come from the cumulative count — 2*avg_rank =
    2*cum_before + t + 1, kept in INTEGER HALVES so W, U and the tie
    term sum(t^3 - t) are exact bigints; only the final z (normal
    approximation with the tie-corrected variance) runs in double,
    through identical expression trees on both engines.

    Scale: the value histogram is the only data-sized shuffle; the
    rank window runs on |distinct values| rows. Compare ml_ks_two_
    sample (distribution-shape distance) and ab_welch_ttest (mean
    difference): this one tests stochastic dominance."""
    vals = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin("R", "A"))
        .select(
            F.when(F.col("l_returnflag") == "R", "a")
            .otherwise("b")
            .alias("grp"),
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("v"),
        )
    )
    per = vals.groupBy("v").agg(
        F.count("*").cast("bigint").alias("t"),
        F.sum(F.when(F.col("grp") == "a", 1).otherwise(0))
        .cast("bigint")
        .alias("ta"),
    )
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per.withColumn(
        "cum_before",
        F.coalesce(F.sum("t").over(wcum), F.lit(0)).cast("bigint"),
    )
    agg = ranked.agg(
        F.sum(
            F.col("ta") * (2 * F.col("cum_before") + F.col("t") + 1)
        )
        .cast("bigint")
        .alias("w2a"),
        F.sum("ta").cast("bigint").alias("na"),
        F.sum(F.col("t") - F.col("ta")).cast("bigint").alias("nb"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie3"),
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    # 2W keeps tie half-ranks exact, so report 2U (integer): U itself
    # ends in .5 whenever an odd number of tied values straddles the
    # groups, and an integer division would silently truncate it
    ua2 = F.expr("CAST(w2a - na * (na + 1) AS BIGINT)")
    uad = ua2.cast("double") / 2
    z = (uad - na * nb / 2) / F.sqrt(
        na
        * nb
        / 12
        * ((na + nb + 1) - F.col("tie3").cast("double") / ((na + nb) * (na + nb - 1)))
    )
    return agg.select("na", "nb", ua2.alias("u_a_x2"), z.alias("z"))


@query(
    "ml_runs_test",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    med AS (
        SELECT cents AS m FROM (
            SELECT cents,
                   row_number() OVER (ORDER BY cents) AS rn,
                   count(*) OVER () AS n
            FROM daily
        ) t WHERE rn = (n + 1) // 2
    ),
    signs AS (
        SELECT day, CASE WHEN cents > (SELECT m FROM med) THEN 1 ELSE 0 END
                   AS above
        FROM daily
    ),
    flagged AS (
        SELECT above,
               CASE WHEN lag(above) OVER (ORDER BY day) IS NULL
                     OR lag(above) OVER (ORDER BY day) <> above
                    THEN 1 ELSE 0 END AS new_run
        FROM signs
    ),
    agg AS (
        SELECT CAST(sum(new_run) AS BIGINT) AS runs,
               CAST(sum(above) AS BIGINT) AS n1,
               CAST(sum(1 - above) AS BIGINT) AS n2
        FROM flagged
    )
    SELECT runs, n1, n2,
           1 + 2 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
               / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) AS expected_runs,
           (CAST(runs AS DOUBLE)
            - (1 + 2 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
               / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))))
           / sqrt(2 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                  * (2 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                     - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))
                  / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                     * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                     * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1)))
               AS z
    FROM agg
    """,
    tags=("ml", "statistics", "nonparametric", "engine-addition"),
)
def ml_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily revenue series — is the
    above/below-median pattern RANDOM, or does it trend/cluster (too
    few runs) or oscillate (too many)? The monitoring primitive that
    distinguishes regime behavior from noise before anyone fits a
    model. Exact pieces: the lower-median threshold (order
    statistic, no interpolation), the sign sequence, and the run
    count (a lag-boundary sum) are all integers; expected runs and
    the z score are the classical formulas in identically-staged
    doubles.

    Scale: the fact scan collapses to daily grain; the sign/lag
    windows run on |days| rows. The single-series ORDER BY window is
    the multi-series PARTITION BY form with a key added."""
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
        "bigint"
    )
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(cents).cast("bigint").alias("cents"))
    )
    wall = Window.partitionBy()
    ranked = daily.select(
        "day",
        "cents",
        F.row_number().over(Window.orderBy("cents")).alias("rn"),
        F.count("*").over(wall).alias("n"),
    )
    med = ranked.filter(
        F.col("rn") == F.expr("(n + 1) div 2")
    ).select(F.col("cents").alias("m"))
    signs = daily.crossJoin(F.broadcast(med)).select(
        "day", F.when(F.col("cents") > F.col("m"), 1).otherwise(0).alias("above")
    )
    lag = F.lag("above").over(Window.orderBy("day"))
    flagged = signs.select(
        "above",
        F.when(lag.isNull() | (lag != F.col("above")), 1)
        .otherwise(0)
        .alias("new_run"),
    )
    agg = flagged.agg(
        F.sum("new_run").cast("bigint").alias("runs"),
        F.sum("above").cast("bigint").alias("n1"),
        F.sum(1 - F.col("above")).cast("bigint").alias("n2"),
    )
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    expected = 1 + 2 * n1 * n2 / (n1 + n2)
    z = (F.col("runs").cast("double") - expected) / F.sqrt(
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))
    )
    return agg.select(
        "runs", "n1", "n2", expected.alias("expected_runs"), z.alias("z")
    )


# NDCG log2 discounts as shared LITERALS: computing 1/log2(rank+1) at
# query time would hand the comparison to each engine's libm (log2 is
# not required to be correctly rounded, so Spark's JVM and DuckDB may
# disagree in the last ulp); baking the 17-significant-digit literals
# into BOTH SQL texts makes every downstream float op start from
# bit-identical constants.
import math as _math

_NDCG_K = 10
_NDCG_DISCOUNTS = tuple(1.0 / _math.log2(r + 1) for r in range(1, _NDCG_K + 1))
_DISC_CASE = " ".join(
    f"WHEN {r} THEN {d!r}" for r, d in enumerate(_NDCG_DISCOUNTS, start=1)
)


@query(
    "ml_ndcg_at_k",
    oracle=f"""
    WITH scored AS (
        SELECT l_orderkey,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS score,
               CAST(l_quantity AS BIGINT) AS rel,
               l_linenumber, l_partkey
        FROM lineitem
    ),
    ranked AS (
        SELECT l_orderkey, rel,
               row_number() OVER (PARTITION BY l_orderkey
                   ORDER BY score DESC, l_linenumber ASC, l_partkey ASC)
                   AS rnk,
               row_number() OVER (PARTITION BY l_orderkey
                   ORDER BY rel DESC, score DESC, l_linenumber ASC,
                            l_partkey ASC) AS ideal_rnk
        FROM scored
    ),
    per AS (
        SELECT l_orderkey,
               sum(CASE WHEN rnk <= {_NDCG_K} THEN
                   CAST(rel AS DOUBLE) * (CASE rnk {_DISC_CASE} END)
                   ELSE 0 END) AS dcg,
               sum(CASE WHEN ideal_rnk <= {_NDCG_K} THEN
                   CAST(rel AS DOUBLE) * (CASE ideal_rnk {_DISC_CASE} END)
                   ELSE 0 END) AS idcg
        FROM ranked GROUP BY l_orderkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(CAST(SUM(CAST(dcg / idcg AS DECIMAL(18,9))) AS VARCHAR)
                AS DOUBLE) / count(*) AS mean_ndcg
    FROM per WHERE idcg > 0
    """,
    tags=("ml", "ranking", "ndcg", "engine-addition"),
)
def ml_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean NDCG@10 — the graded-relevance ranking metric (MRR sees
    the first hit; NDCG credits the whole ranked list): per query
    (order), the score ranking's discounted gain over the IDEAL
    ranking's. The log2 position discounts are PRECOMPUTED 17-digit
    literals embedded in both engines' plans — computed at query
    time they would go through each engine's (not-correctly-rounded)
    libm log2 and drift in the last ulp; as shared constants every
    product is IEEE-identical, per-query NDCG matches bit-for-bit,
    and the corpus mean goes through a decimal(18,9) sum so the
    reduction is order-independent. Ranking ties break on
    (linenumber, partkey) — duplicated line numbers exist in the
    data, a bare ORDER BY score would be nondeterministic.

    Scale: two windows over one per-query partition sort, one
    map-side-combinable final aggregate. Relevance = quantity,
    score = price cents (a deterministic stand-in for model scores
    vs human labels)."""
    scored = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("score"),
        F.col("l_quantity").cast("bigint").alias("rel"),
        "l_linenumber",
        "l_partkey",
    )
    wrank = Window.partitionBy("l_orderkey").orderBy(
        F.col("score").desc(), F.col("l_linenumber").asc(), F.col("l_partkey").asc()
    )
    wideal = Window.partitionBy("l_orderkey").orderBy(
        F.col("rel").desc(),
        F.col("score").desc(),
        F.col("l_linenumber").asc(),
        F.col("l_partkey").asc(),
    )
    ranked = scored.select(
        "l_orderkey",
        "rel",
        F.row_number().over(wrank).alias("rnk"),
        F.row_number().over(wideal).alias("ideal_rnk"),
    )
    disc = f"CASE rnk {_DISC_CASE} END"
    disc_i = f"CASE ideal_rnk {_DISC_CASE} END"
    per = ranked.groupBy("l_orderkey").agg(
        F.sum(
            F.expr(
                f"CASE WHEN rnk <= {_NDCG_K} THEN"
                f" CAST(rel AS DOUBLE) * ({disc}) ELSE 0 END"
            )
        ).alias("dcg"),
        F.sum(
            F.expr(
                f"CASE WHEN ideal_rnk <= {_NDCG_K} THEN"
                f" CAST(rel AS DOUBLE) * ({disc_i}) ELSE 0 END"
            )
        ).alias("idcg"),
    )
    return per.filter(F.col("idcg") > 0).agg(
        F.count("*").cast("bigint").alias("n_queries"),
        (
            F.sum((F.col("dcg") / F.col("idcg")).cast("decimal(18,9)"))
            .cast("double")
            / F.count("*")
        ).alias("mean_ndcg"),
    )


@query(
    "ml_cohens_kappa",
    oracle="""
    WITH meds AS (
        SELECT quantile_disc(o_totalprice, 0.5) AS mp
        FROM orders
    ),
    cls AS (
        SELECT CASE WHEN o.o_totalprice > m.mp THEN 1 ELSE 0 END AS a,
               CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS b
        FROM orders o CROSS JOIN meds m
    ),
    cm AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(a * b) AS BIGINT) AS n11,
               CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
               CAST(sum((1 - a) * b) AS BIGINT) AS n01,
               CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
        FROM cls
    )
    SELECT n, n11, n10, n01, n00,
           (CAST(n11 AS DOUBLE) + CAST(n00 AS DOUBLE)) / n AS po,
           ((CAST(n11 AS DOUBLE) + CAST(n10 AS DOUBLE))
                * (CAST(n11 AS DOUBLE) + CAST(n01 AS DOUBLE))
            + (CAST(n01 AS DOUBLE) + CAST(n00 AS DOUBLE))
                * (CAST(n10 AS DOUBLE) + CAST(n00 AS DOUBLE)))
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe,
           ((CAST(n11 AS DOUBLE) + CAST(n00 AS DOUBLE)) / n
            - ((CAST(n11 AS DOUBLE) + CAST(n10 AS DOUBLE))
                   * (CAST(n11 AS DOUBLE) + CAST(n01 AS DOUBLE))
               + (CAST(n01 AS DOUBLE) + CAST(n00 AS DOUBLE))
                   * (CAST(n10 AS DOUBLE) + CAST(n00 AS DOUBLE)))
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
           / (1 - ((CAST(n11 AS DOUBLE) + CAST(n10 AS DOUBLE))
                       * (CAST(n11 AS DOUBLE) + CAST(n01 AS DOUBLE))
                   + (CAST(n01 AS DOUBLE) + CAST(n00 AS DOUBLE))
                       * (CAST(n10 AS DOUBLE) + CAST(n00 AS DOUBLE)))
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
               AS kappa
    FROM cm
    """,
    tags=("ml", "agreement", "statistics", "engine-addition"),
)
def ml_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two
    labelers (here two deterministic rules: price above the discrete
    median vs urgent/high priority), the metric every labeling /
    LLM-judge pipeline needs before trusting its annotations (raw
    agreement flatters imbalanced labels; kappa subtracts the
    chance term). The 2x2 confusion counts are exact integers from
    ONE conditional-aggregate pass over the broadcast median;
    po, pe and kappa are identically-staged double expressions.

    Scale: one threshold aggregate to a single broadcast row + one
    confusion aggregate — two map-side-combinable scans, state is
    five integers."""
    o = load_table(spark, sf_dir, "orders")
    meds = o.agg(
        F.expr(f"percentile_approx(o_totalprice, 0.5D, {1 << 20})").alias(
            "mp"
        )
    )
    cls = o.crossJoin(F.broadcast(meds)).select(
        F.when(F.col("o_totalprice") > F.col("mp"), 1).otherwise(0).alias("a"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("b"),
    )
    cm = cls.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("bigint").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("bigint").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("bigint").alias("n00"),
    )
    n = F.col("n").cast("double")
    n11, n10 = F.col("n11").cast("double"), F.col("n10").cast("double")
    n01, n00 = F.col("n01").cast("double"), F.col("n00").cast("double")
    po = (n11 + n00) / F.col("n")
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
    return cm.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        po.alias("po"),
        pe.alias("pe"),
        ((po - pe) / (1 - pe)).alias("kappa"),
    )


@query(
    "ml_spearman_rho",
    oracle="""
    WITH vals AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS x,
               CAST(l_quantity AS BIGINT) AS y
        FROM lineitem
    ),
    rx AS (
        SELECT x, CAST(count(*) AS BIGINT) AS t,
               CAST(coalesce(sum(count(*)) OVER (ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cb
        FROM vals GROUP BY x
    ),
    ry AS (
        SELECT y, CAST(count(*) AS BIGINT) AS t,
               CAST(coalesce(sum(count(*)) OVER (ORDER BY y
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cb
        FROM vals GROUP BY y
    ),
    ranked AS (
        -- 2*avg_rank keeps tie half-ranks integer
        SELECT (2 * rx.cb + rx.t + 1) AS rx2, (2 * ry.cb + ry.t + 1) AS ry2
        FROM vals v JOIN rx ON v.x = rx.x JOIN ry ON v.y = ry.y
    ),
    mom AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(CAST(sum(CAST(rx2 AS DECIMAL(19,0))) AS VARCHAR)
                    AS DOUBLE) AS sx,
               CAST(CAST(sum(CAST(ry2 AS DECIMAL(19,0))) AS VARCHAR)
                    AS DOUBLE) AS sy,
               CAST(CAST(sum(CAST(rx2 AS DECIMAL(19,0))
                             * CAST(rx2 AS DECIMAL(19,0))) AS VARCHAR)
                    AS DOUBLE) AS sxx,
               CAST(CAST(sum(CAST(ry2 AS DECIMAL(19,0))
                             * CAST(ry2 AS DECIMAL(19,0))) AS VARCHAR)
                    AS DOUBLE) AS syy,
               CAST(CAST(sum(CAST(rx2 AS DECIMAL(19,0))
                             * CAST(ry2 AS DECIMAL(19,0))) AS VARCHAR)
                    AS DOUBLE) AS sxy
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n,
           (n * sxy - sx * sy)
           / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS spearman_rho
    FROM mom
    """,
    tags=("ml", "statistics", "rank-correlation", "engine-addition"),
)
def ml_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (price vs quantity) — the monotonic
    association measure that ignores scale and outliers: Pearson on
    AVERAGE RANKS, with ranks computed distributively from each
    value's histogram (2*avg_rank = 2*cum_before + t + 1 keeps tie
    half-ranks integer — the Mann-Whitney machinery applied to both
    columns). Doubling both rank vectors leaves the correlation
    invariant, so every moment is an exact decimal integer sum
    (VARCHAR-routed: rank sums reach ~n^2) and only the final
    Pearson combination runs in double, identically staged.

    Scale: two per-value histogram shuffles, a rank-assignment join
    back (the 50-value quantity table broadcasts; the price table
    joins on its value key), one moment aggregate — no global sort,
    no n^2 anything."""
    vals = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("x"),
        F.col("l_quantity").cast("bigint").alias("y"),
    )

    def rank_table(col: str):
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return (
            vals.groupBy(col)
            .agg(F.count("*").cast("bigint").alias("t"))
            .withColumn(
                "cb", F.coalesce(F.sum("t").over(w), F.lit(0)).cast("bigint")
            )
            .withColumn("r2", 2 * F.col("cb") + F.col("t") + 1)
            .select(col, "r2")
        )

    rx = rank_table("x").withColumnRenamed("r2", "rx2")
    ry = rank_table("y").withColumnRenamed("r2", "ry2")
    ranked = vals.join(rx, "x").join(F.broadcast(ry), "y")
    d19 = "decimal(19,0)"
    mom = ranked.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("rx2").cast(d19)).cast("decimal(38,0)").cast("double").alias("sx"),
        F.sum(F.col("ry2").cast(d19)).cast("decimal(38,0)").cast("double").alias("sy"),
        F.sum(F.col("rx2").cast(d19) * F.col("rx2").cast(d19))
        .cast("decimal(38,0)")
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("ry2").cast(d19) * F.col("ry2").cast(d19))
        .cast("decimal(38,0)")
        .cast("double")
        .alias("syy"),
        F.sum(F.col("rx2").cast(d19) * F.col("ry2").cast(d19))
        .cast("decimal(38,0)")
        .cast("double")
        .alias("sxy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    rho = (n * F.col("sxy") - sx * sy) / F.sqrt(
        (n * F.col("sxx") - sx * sx) * (n * F.col("syy") - sy * sy)
    )
    return mom.select(
        n.cast("bigint").alias("n"), rho.alias("spearman_rho")
    )


@query(
    "ml_brier_decomposition",
    oracle="""
    WITH f AS (
        SELECT CAST(o_custkey % 11 AS BIGINT) AS k,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    bins AS (
        SELECT k, CAST(count(*) AS BIGINT) AS nk,
               CAST(sum(y) AS BIGINT) AS pk,
               CAST(sum((k - 10 * y) * (k - 10 * y)) AS BIGINT) AS sq
        FROM f GROUP BY k
    ),
    tot AS (
        SELECT CAST(sum(nk) AS BIGINT) AS n, CAST(sum(pk) AS BIGINT) AS p,
               CAST(sum(sq) AS BIGINT) AS sq_all,
               list(k ORDER BY k) AS ks,
               list(nk ORDER BY k) AS nks,
               list(pk ORDER BY k) AS pks
        FROM bins
    )
    SELECT n, CAST(p AS BIGINT) AS n_pos,
           CAST(sq_all AS DOUBLE) / (100 * CAST(n AS DOUBLE)) AS brier,
           list_reduce(list_transform(range(1, len(ks) + 1), i ->
               CAST((ks[i] * nks[i] - 10 * pks[i])
                    * (ks[i] * nks[i] - 10 * pks[i]) AS DOUBLE)
               / (100 * CAST(nks[i] AS DOUBLE))), (a, x) -> a + x)
               / CAST(n AS DOUBLE) AS reliability,
           list_reduce(list_transform(range(1, len(ks) + 1), i ->
               CAST((pks[i] * n - p * nks[i])
                    * (pks[i] * n - p * nks[i]) AS DOUBLE)
               / (CAST(nks[i] AS DOUBLE) * CAST(n AS DOUBLE)
                  * CAST(n AS DOUBLE))), (a, x) -> a + x)
               / CAST(n AS DOUBLE) AS resolution,
           CAST(p AS DOUBLE) * (n - p)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS uncertainty
    FROM tot
    """,
    tags=("ml", "evaluation", "calibration", "engine-addition"),
)
def ml_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score — Brier = reliability
    - resolution + uncertainty — the readout that separates 'the
    probabilities are miscalibrated' (reliability) from 'the model
    can't discriminate' (resolution) against the irreducible base-
    rate term. The forecast is DISCRETE (11 levels k/10 from a
    deterministic key residue), so the identity holds exactly, not
    just in the binned limit — and the invariant test asserts it to
    1e-12. Per-bin pieces are exact integers ((k-10y)^2 for the
    direct Brier; (k*nk - 10*pk)^2 and (pk*n - p*nk)^2 numerators);
    each term does ONE double division and the 11 terms fold in bin
    order on both engines (the SUM(double) order lesson from
    agg_cramers_v).

    Scale: one map-side-combinable bin aggregate; the decomposition
    runs on 11 rows collected into arrays inside the engine (never
    the driver)."""
    f = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 11).cast("bigint").alias("k"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    bins = f.groupBy("k").agg(
        F.count("*").cast("bigint").alias("nk"),
        F.sum("y").cast("bigint").alias("pk"),
        F.sum(
            (F.col("k") - 10 * F.col("y")) * (F.col("k") - 10 * F.col("y"))
        )
        .cast("bigint")
        .alias("sq"),
    )
    tot = bins.agg(
        F.sum("nk").cast("bigint").alias("n"),
        F.sum("pk").cast("bigint").alias("p"),
        F.sum("sq").cast("bigint").alias("sq_all"),
        F.array_sort(
            F.collect_list(F.struct("k", "nk", "pk"))
        ).alias("cells"),
    )
    n = F.col("n").cast("double")
    p = F.col("p").cast("double")
    rel = F.expr(
        "aggregate(cells, CAST(0 AS DOUBLE), (a, x) ->"
        " a + CAST((x.k * x.nk - 10 * x.pk) * (x.k * x.nk - 10 * x.pk)"
        " AS DOUBLE) / (100 * CAST(x.nk AS DOUBLE)))"
    ) / n
    res = F.expr(
        "aggregate(cells, CAST(0 AS DOUBLE), (a, x) ->"
        " a + CAST((x.pk * n - p * x.nk) * (x.pk * n - p * x.nk)"
        " AS DOUBLE) / (CAST(x.nk AS DOUBLE) * CAST(n AS DOUBLE)"
        " * CAST(n AS DOUBLE)))"
    ) / n
    return tot.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("p").cast("bigint").alias("n_pos"),
        (F.col("sq_all").cast("double") / (100 * n)).alias("brier"),
        rel.alias("reliability"),
        res.alias("resolution"),
        (p * (n - p) / (n * n)).alias("uncertainty"),
    )


@query(
    "ml_pr_curve",
    oracle="""
    WITH s AS (
        SELECT CAST(l_quantity AS BIGINT) AS score,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
        FROM lineitem
    ),
    per AS (
        SELECT score, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(pos) AS BIGINT) AS n_pos
        FROM s GROUP BY score
    ),
    c AS (
        SELECT score,
               CAST(sum(n_pos) OVER (ORDER BY score DESC) AS BIGINT) AS tp,
               CAST(sum(n) OVER (ORDER BY score DESC) AS BIGINT) AS n_pred,
               CAST(sum(n_pos) OVER () AS BIGINT) AS total_pos
        FROM per
    )
    SELECT score AS threshold, tp, n_pred - tp AS fp,
           CAST(tp * 1000000 // n_pred AS BIGINT) AS precision_ppm,
           CAST(tp * 1000000 // total_pos AS BIGINT) AS recall_ppm,
           CAST(2 * tp * 1000000 // (n_pred + total_pos) AS BIGINT)
               AS f1_ppm
    FROM c ORDER BY threshold DESC
    """,
    tags=("ml", "evaluation", "precision-recall", "engine-addition"),
)
def ml_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full precision-recall curve at every distinct score,
    plus per-threshold F1 — the curve that matters when positives
    are rare and ROC flatters (the 100 TB fraud/defect regime).
    Same exact construction as ml_roc_curve: one histogram shuffle,
    cumulative windows over the model-sized support, integer-ppm
    rates. F1 uses the identity 2tp/(n_pred + total_pos) — single
    integer division, no float precision/recall intermediates, so
    the cross-engine hash is exact.

    Scale: |distinct scores| rows after the first aggregate; the
    window pass is driver-scale. Continuous scores get bucketed
    first (gains pattern), same caveat as ROC."""
    s = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("score"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("pos"),
    )
    per = s.groupBy("score").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos"),
    )
    wc = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    c = per.select(
        "score",
        F.sum("n_pos").over(wc).cast("bigint").alias("tp"),
        F.sum("n").over(wc).cast("bigint").alias("n_pred"),
        F.sum("n_pos").over(wall).cast("bigint").alias("total_pos"),
    )
    return c.select(
        F.col("score").alias("threshold"),
        "tp",
        (F.col("n_pred") - F.col("tp")).alias("fp"),
        F.expr("CAST(tp * 1000000 div n_pred AS BIGINT)").alias("precision_ppm"),
        F.expr("CAST(tp * 1000000 div total_pos AS BIGINT)").alias("recall_ppm"),
        F.expr(
            "CAST(2 * tp * 1000000 div (n_pred + total_pos) AS BIGINT)"
        ).alias("f1_ppm"),
    ).orderBy(F.col("threshold").desc())


@query(
    "ml_drift_ks_all_features",
    oracle="""
    WITH bounds AS (
        SELECT (epoch_us(min(l_shipdate)) + epoch_us(max(l_shipdate))) // 2
               AS pivot_us
        FROM lineitem
    ),
    melted AS (
        SELECT f.feature, f.val,
               CASE WHEN epoch_us(l.l_shipdate) <= b.pivot_us
                    THEN 1 ELSE 0 END AS in_a
        FROM lineitem l CROSS JOIN bounds b, LATERAL (VALUES
            ('quantity', CAST(l_quantity AS BIGINT)),
            ('discount_x100', CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                                   AS BIGINT)),
            ('tax_x100', CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT))
        ) AS f(feature, val)
    ),
    per AS (
        SELECT feature, val,
               CAST(sum(in_a) AS BIGINT) AS na,
               CAST(sum(1 - in_a) AS BIGINT) AS nb
        FROM melted GROUP BY 1, 2
    ),
    cum AS (
        SELECT feature, val,
               CAST(sum(na) OVER (PARTITION BY feature ORDER BY val)
                    AS DECIMAL(38,0)) AS ca,
               CAST(sum(nb) OVER (PARTITION BY feature ORDER BY val)
                    AS DECIMAL(38,0)) AS cb,
               CAST(sum(na) OVER (PARTITION BY feature) AS DECIMAL(38,0))
                   AS n_a,
               CAST(sum(nb) OVER (PARTITION BY feature) AS DECIMAL(38,0))
                   AS n_b
        FROM per
    ),
    d AS (
        SELECT feature, val, n_a, n_b,
               abs(ca * n_b - cb * n_a) AS diff
        FROM cum
    ),
    m AS (
        SELECT feature, CAST(max(n_a) AS BIGINT) AS n_a,
               CAST(max(n_b) AS BIGINT) AS n_b,
               max(diff) AS d_num
        FROM d GROUP BY feature
    )
    SELECT m.feature, m.n_a, m.n_b,
           CAST(CAST(m.d_num AS HUGEINT) * 1000000
                // (CAST(m.n_a AS HUGEINT) * CAST(m.n_b AS HUGEINT))
                AS BIGINT) AS ks_ppm,
           (SELECT min(val) FROM d
            WHERE d.feature = m.feature AND d.diff = m.d_num) AS ks_at_value
    FROM m ORDER BY m.feature
    """,
    tags=("ml", "drift", "ks-test", "monitoring", "engine-addition"),
)
def ml_drift_ks_all_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production drift monitor: exact two-sample KS for EVERY
    feature in one melted scan (the ml_split_gain_all_features trick
    applied to ml_ks_two_sample's integer prefix-sum KS) — early
    period vs late period split at the data's own time midpoint, so
    the comparison is anchor-deterministic. Per feature: D's
    numerator max|ca*n_b - cb*n_a| in decimal(38,0) (a 100 TB
    lineitem's cross product overflows int64), the KS statistic in
    integer ppm, and the feature value where the gap peaks (min such
    value — tie-safe) for the drill-down.

    Scale shape: ONE fact scan melts to 3 rows/record with map-side
    (feature, val) partial counts; every window partitions BY FEATURE
    over the per-feature value support (bounded: these are
    histogram-sized tables), so no single-partition global window
    exists. Adding a feature = adding a stack row."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.expr(
            "(unix_micros(CAST(min(l_shipdate) AS TIMESTAMP))"
            " + unix_micros(CAST(max(l_shipdate) AS TIMESTAMP))) div 2"
        ).alias("pivot_us")
    )
    melted = li.crossJoin(F.broadcast(bounds)).selectExpr(
        """CASE WHEN unix_micros(CAST(l_shipdate AS TIMESTAMP)) <= pivot_us
           THEN 1 ELSE 0 END AS in_a""",
        """stack(3,
           'quantity', CAST(l_quantity AS BIGINT),
           'discount_x100',
           CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT),
           'tax_x100',
           CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS (feature, val)""",
    )
    per = melted.groupBy("feature", "val").agg(
        F.sum("in_a").cast("bigint").alias("na"),
        F.sum(1 - F.col("in_a")).cast("bigint").alias("nb"),
    )
    wv = Window.partitionBy("feature").orderBy("val")
    wf = Window.partitionBy("feature")
    cum = per.select(
        "feature",
        "val",
        F.sum("na").over(wv).cast("decimal(38,0)").alias("ca"),
        F.sum("nb").over(wv).cast("decimal(38,0)").alias("cb"),
        F.sum("na").over(wf).cast("decimal(38,0)").alias("n_a"),
        F.sum("nb").over(wf).cast("decimal(38,0)").alias("n_b"),
    )
    d = cum.select(
        "feature",
        "val",
        "n_a",
        "n_b",
        F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a")).alias(
            "diff"
        ),
    ).transform(materialize)  # max + argmax both read it
    m = d.groupBy("feature").agg(
        F.max("n_a").cast("bigint").alias("n_a"),
        F.max("n_b").cast("bigint").alias("n_b"),
        F.max("diff").alias("d_num"),
    )
    arg = (
        d.join(m.select("feature", "d_num"), "feature")
        .where(F.col("diff") == F.col("d_num"))
        .groupBy("feature")
        .agg(F.min("val").alias("ks_at_value"))
    )
    return (
        m.join(arg, "feature")
        .select(
            "feature",
            "n_a",
            "n_b",
            F.expr(
                "CAST(d_num * 1000000 div"
                " (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"
            ).alias("ks_ppm"),
            "ks_at_value",
        )
        .orderBy("feature")
    )


NEG_PER_POS = 2  # negative samples drawn per positive pair


@query(
    "ml_negative_sampling",
    oracle=f"""
    WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n_items FROM part),
    pos AS (
        SELECT DISTINCT o.o_custkey AS user_id, l.l_partkey AS item
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    drawn AS (
        SELECT p.user_id, p.item, j.j,
               CAST(CAST(('0x' || substring(md5(
                       p.user_id || '|' || p.item || '|' || j.j), 1, 8))
                    AS UBIGINT) % m.n_items AS BIGINT) AS neg
        FROM pos p CROSS JOIN m,
             (SELECT unnest(range({NEG_PER_POS})) AS j) j
    )
    SELECT user_id,
           CAST(count(DISTINCT item) AS BIGINT) AS n_pos,
           CAST(sum(CASE WHEN neg <> item THEN 1 ELSE 0 END) AS BIGINT)
               AS n_neg,
           CAST(sum(CASE WHEN neg = item THEN 1 ELSE 0 END) AS BIGINT)
               AS n_collisions,
           CAST(sum(CASE WHEN neg <> item THEN neg ELSE 0 END) AS BIGINT)
               AS neg_key_sum
    FROM drawn GROUP BY user_id ORDER BY user_id
    """,
    tags=("ml", "sampling", "contrastive", "engine-addition"),
)
def ml_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive / two-tower
    training: for every positive (user, item) purchase pair, draw
    NEG_PER_POS uniform negatives as md5(user|item|slot) mod |catalog| —
    the hash-derandomization pattern again (Poisson bootstrap, hash
    samplers, random walks), because RNG-based negative sampling is
    irreproducible across retries and partition layouts, and
    reproducibility is exactly what a debuggable training pipeline
    needs. Accidental hits (negative == its own positive) are
    counted and skipped, the standard in-batch correction. Output is
    the per-user sampling ledger (positives, negatives, collisions,
    negative-key checksum) — compact, and any nondeterminism anywhere
    breaks the checksum hash.

    Scale shape: positives dedup in one shuffle; the draw is a
    per-row map against a broadcast 1-row catalog count (TPC-H part
    keys are dense 0..M-1, so hash mod M IS a catalog key — a sparse
    catalog would first build the dense index with the bucketed
    prefix-rank recipe); the ledger aggregates with map-side
    partials. No join against the catalog ever happens."""
    m = load_table(spark, sf_dir, "part").agg(
        F.count("*").cast("bigint").alias("n_items")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pos = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item"))
        .distinct()
    )
    js = spark.range(NEG_PER_POS).select(F.col("id").cast("int").alias("j"))
    drawn = (
        pos.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(js))
        .select(
            "user_id",
            "item",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("|", "user_id", "item", "j")), 1, 8
                    ),
                    16,
                    10,
                ).cast("bigint")
                % F.col("n_items")
            ).alias("neg"),
        )
    )
    return (
        drawn.groupBy("user_id")
        .agg(
            F.countDistinct("item").cast("bigint").alias("n_pos"),
            F.sum(F.when(F.col("neg") != F.col("item"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_neg"),
            F.sum(F.when(F.col("neg") == F.col("item"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_collisions"),
            F.sum(F.when(F.col("neg") != F.col("item"), F.col("neg")).otherwise(0))
            .cast("bigint")
            .alias("neg_key_sum"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Round-4g batch 2: multiple regression, permutation importance,
# multiclass F1, cost-optimal threshold
# ---------------------------------------------------------------------------

_OLS2_DETS = """
           n * (s11 * s22 - s12 * s12)
             - s1 * (s1 * s22 - s12 * s2)
             + s2 * (s1 * s12 - s11 * s2) AS det,
           sy * (s11 * s22 - s12 * s12)
             - s1 * (s1y * s22 - s12 * s2y)
             + s2 * (s1y * s12 - s11 * s2y) AS det0,
           n * (s1y * s22 - s12 * s2y)
             - sy * (s1 * s22 - s12 * s2)
             + s2 * (s1 * s2y - s1y * s2) AS det1,
           n * (s11 * s2y - s1y * s12)
             - s1 * (s1 * s2y - s1y * s2)
             + sy * (s1 * s12 - s11 * s2) AS det2
"""


@query(
    "ml_linreg_two_features",
    oracle=f"""
    WITH m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS DOUBLE) AS n,
               {dsum_sql("l_quantity")} AS s1,
               {dsum_sql("l_discount")} AS s2,
               {dsum_sql("l_extendedprice")} AS sy,
               {dsum_prod_sql("l_quantity", "l_quantity")} AS s11,
               {dsum_prod_sql("l_quantity", "l_discount")} AS s12,
               {dsum_prod_sql("l_discount", "l_discount")} AS s22,
               {dsum_prod_sql("l_quantity", "l_extendedprice")} AS s1y,
               {dsum_prod_sql("l_discount", "l_extendedprice")} AS s2y,
               {dsum_prod_sql("l_extendedprice", "l_extendedprice")} AS syy
        FROM lineitem
    ),
    d AS (
        SELECT n_rows, n, sy, s1y, s2y, syy,
               {_OLS2_DETS}
        FROM m
    ),
    beta AS (
        SELECT n_rows, n, sy, s1y, s2y, syy,
               det0 / det AS beta0, det1 / det AS beta1, det2 / det AS beta2
        FROM d
    ),
    fit AS (
        SELECT n_rows, beta0, beta1, beta2,
               syy - beta0 * sy - beta1 * s1y - beta2 * s2y AS sse,
               syy - sy * sy / n AS sst
        FROM beta
    )
    SELECT n_rows, beta0, beta1, beta2, 1.0 - sse / sst AS r2
    FROM fit
    """,
    tags=("ml", "regression", "multivariate", "engine-addition"),
)
def ml_linreg_two_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature multiple regression (price ~ quantity + discount)
    solved in closed form by Cramer's rule on the 3x3 normal
    equations — the d-feature generalization ml_linreg_closed_form's
    docstring promises: training is ONE aggregation pass producing
    the d^2 moment matrix (all exact decimal sums), and the solve is
    O(d^3) arithmetic on a single row, staged through identical
    intermediate columns (dets -> betas -> sse/sst -> r2) so the
    fitted model and its R^2 are bit-identical cross-engine.

    Scale shape: at 100 TB this is still one map-side-combined
    shuffle of 10 decimal accumulators; nothing else grows."""
    li = load_table(spark, sf_dir, "lineitem")
    x1, x2, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    m = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(x1).alias("s1"),
        dsum(x2).alias("s2"),
        dsum(y).alias("sy"),
        dsum_prod(x1, x1).alias("s11"),
        dsum_prod(x1, x2).alias("s12"),
        dsum_prod(x2, x2).alias("s22"),
        dsum_prod(x1, y).alias("s1y"),
        dsum_prod(x2, y).alias("s2y"),
        dsum_prod(y, y).alias("syy"),
    )
    d = m.selectExpr(
        "n_rows", "n", "sy", "s1y", "s2y", "syy", *(
            e.strip().rstrip(",")
            for e in _OLS2_DETS.strip().split(",\n")
        ),
    )
    beta = d.selectExpr(
        "n_rows", "n", "sy", "s1y", "s2y", "syy",
        "det0 / det AS beta0", "det1 / det AS beta1", "det2 / det AS beta2",
    )
    fit = beta.selectExpr(
        "n_rows", "beta0", "beta1", "beta2",
        "syy - beta0 * sy - beta1 * s1y - beta2 * s2y AS sse",
        "syy - sy * sy / n AS sst",
    )
    return fit.selectExpr(
        "n_rows", "beta0", "beta1", "beta2", "1.0 - sse / sst AS r2"
    )


_PI_BUCKETS = 64  # derangement cycles per hash bucket; at 100 TB raise
# so per-bucket windows stay executor-local (any power works — the
# union of per-bucket cycles is a permutation of the whole dataset)


@query(
    "ml_permutation_importance",
    oracle=f"""
    WITH rows_ AS (
        SELECT l_orderkey AS k1, l_linenumber AS k2,
               l_returnflag AS f1, l_linestatus AS f2,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS y,
               CAST(CAST(('0x' || substring(md5('pi-' ||
                        CAST(l_orderkey AS VARCHAR) || '-' ||
                        CAST(l_linenumber AS VARCHAR)), 1, 8))
                    AS UBIGINT) % {_PI_BUCKETS} AS BIGINT) AS bkt
        FROM lineitem
    ),
    idx AS (
        -- (k1, k2) is NOT unique in the synthetic lineitem; the full
        -- payload tie-break makes row_number deterministic UP TO
        -- swapping identical rows, which the MAE aggregate can't see
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY bkt
                                  ORDER BY k1, k2, f1, f2, y) AS rn,
               COUNT(*) OVER (PARTITION BY bkt) AS cnt
        FROM rows_
    ),
    model AS (
        SELECT f1, f2,
               CAST(SUM(y) // COUNT(*) AS BIGINT) AS pred
        FROM rows_ GROUP BY 1, 2
    ),
    permuted AS (
        SELECT a.f1, a.f2, a.y,
               d1.f1 AS f1p, d2.f2 AS f2p
        FROM idx a
        JOIN idx d1 ON d1.bkt = a.bkt AND d1.rn = (a.rn % a.cnt) + 1
        JOIN idx d2 ON d2.bkt = a.bkt AND d2.rn = ((a.rn + 1) % a.cnt) + 1
    ),
    scored AS (
        SELECT p.y,
               mb.pred AS pred_base, m1.pred AS pred_p1, m2.pred AS pred_p2
        FROM permuted p
        JOIN model mb ON mb.f1 = p.f1 AND mb.f2 = p.f2
        JOIN model m1 ON m1.f1 = p.f1p AND m1.f2 = p.f2
        JOIN model m2 ON m2.f1 = p.f1 AND m2.f2 = p.f2p
    ),
    wide AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(ABS(y - pred_base)) * 1000 // COUNT(*) AS BIGINT)
                   AS mae_base,
               CAST(SUM(ABS(y - pred_p1)) * 1000 // COUNT(*) AS BIGINT)
                   AS mae_p1,
               CAST(SUM(ABS(y - pred_p2)) * 1000 // COUNT(*) AS BIGINT)
                   AS mae_p2
        FROM scored
    )
    SELECT f.feature, f.mae_milli_cents,
           f.mae_milli_cents - w.mae_base AS importance_milli
    FROM wide w, LATERAL (
        VALUES ('none', w.mae_base),
               ('l_returnflag', w.mae_p1),
               ('l_linestatus', w.mae_p2)
    ) AS f(feature, mae_milli_cents)
    ORDER BY f.feature
    """,
    tags=("ml", "explanation", "permutation-importance", "engine-addition"),
)
def ml_permutation_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation feature importance for the two-feature cell-mean
    model of ml_shapley_two_features: break each feature's pairing
    with the target by a DETERMINISTIC derangement — a cyclic shift
    within hash buckets (the union of per-bucket cycles is a valid
    permutation of the dataset) — and report how much the exact
    integer-cents MAE degrades. Hash-derived cycles replace the usual
    seeded shuffle, which is what makes a permutation test
    oracle-pairable at all; shifts of 1 and 2 decorrelate the two
    features' donors.

    Scale shape: ONE window pass partitioned by the hash bucket
    (executor-local at any scale — raise _PI_BUCKETS with the
    cluster) computes rank, bucket size, AND both donors: a cyclic
    shift's donor is just lead(k) with an nth_value wrap at the
    bucket tail, so the two rank self-joins of the first cut (which
    re-scanned and re-windowed the indexed table twice — the ×5
    duplicate-scan entry VERDICT r8 #4 flagged) collapse into window
    columns on the same single exchange. The model is a 6-row
    broadcast; remaining re-scan ×1 is the model leg's own aggregate
    over a 3-column pruned read (threshold/anchor two-pass class,
    PLANS.md). No global sort anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("pi-"),
                    F.col("l_orderkey").cast("string"),
                    F.lit("-"),
                    F.col("l_linenumber").cast("string"),
                )
            ), 1, 8,
        ), 16, 10,
    ).cast("long")
    rows = li.select(
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").alias("k2"),
        F.col("l_returnflag").alias("f1"),
        F.col("l_linestatus").alias("f2"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("y"),
        (h % _PI_BUCKETS).alias("bkt"),
    )
    # (k1, k2) is NOT unique in the synthetic lineitem; the full
    # payload tie-break makes row_number deterministic up to swapping
    # identical rows, which the MAE aggregate can't see
    wb = Window.partitionBy("bkt")
    wo = wb.orderBy("k1", "k2", "f1", "f2", "y")
    wf = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    idx = rows.select(
        "*",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wb).alias("cnt"),
        F.lead("f1", 1).over(wo).alias("ld1"),
        F.lead("f2", 2).over(wo).alias("ld2"),
        F.nth_value("f1", 1).over(wf).alias("nv1_f1"),
        F.nth_value("f2", 1).over(wf).alias("nv1_f2"),
        F.nth_value("f2", 2).over(wf).alias("nv2_f2"),
    )
    # the 6-row model is consumed by THREE broadcast joins (base + two
    # permuted scorings); staged once so each broadcast reads the tiny
    # materialized frame instead of re-running the full-table aggregate
    model = materialize(
        rows.groupBy("f1", "f2").agg(
            F.expr("CAST(sum(y) div count(1) AS BIGINT)").alias("pred")
        )
    )
    # donor rank for shift-1 is (rn % cnt) + 1: the next row, wrapping
    # the bucket tail to row 1; shift-2 is ((rn + 1) % cnt) + 1: two
    # ahead, wrapping to rows 1 / 2 (and to itself when cnt == 1,
    # where nth_value(.., 2) is NULL and falls back to row 1)
    f1p = F.coalesce(F.col("ld1"), F.col("nv1_f1"))
    f2p = (
        F.when(F.col("rn") <= F.col("cnt") - 2, F.col("ld2"))
        .when(F.col("rn") == F.col("cnt") - 1, F.col("nv1_f2"))
        .otherwise(F.coalesce(F.col("nv2_f2"), F.col("nv1_f2")))
    )
    permuted = idx.select(
        "f1", "f2", "y", f1p.alias("f1p"), f2p.alias("f2p")
    )
    mb = model.select(
        F.col("f1").alias("mf1"), F.col("f2").alias("mf2"),
        F.col("pred").alias("pred_base"),
    )
    m1 = model.select(
        F.col("f1").alias("pf1"), F.col("f2").alias("pf2"),
        F.col("pred").alias("pred_p1"),
    )
    m2 = model.select(
        F.col("f1").alias("qf1"), F.col("f2").alias("qf2"),
        F.col("pred").alias("pred_p2"),
    )
    scored = (
        permuted.join(
            F.broadcast(mb),
            (F.col("mf1") == F.col("f1")) & (F.col("mf2") == F.col("f2")),
        )
        .join(
            F.broadcast(m1),
            (F.col("pf1") == F.col("f1p")) & (F.col("pf2") == F.col("f2")),
        )
        .join(
            F.broadcast(m2),
            (F.col("qf1") == F.col("f1")) & (F.col("qf2") == F.col("f2p")),
        )
    )
    wide = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(sum(abs(y - pred_base)) * 1000 div count(1) AS BIGINT)")
        .alias("mae_base"),
        F.expr("CAST(sum(abs(y - pred_p1)) * 1000 div count(1) AS BIGINT)")
        .alias("mae_p1"),
        F.expr("CAST(sum(abs(y - pred_p2)) * 1000 div count(1) AS BIGINT)")
        .alias("mae_p2"),
    )
    return (
        wide.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("none").alias("feature"),
                        F.col("mae_base").alias("mae_milli_cents"),
                    ),
                    F.struct(
                        F.lit("l_returnflag").alias("feature"),
                        F.col("mae_p1").alias("mae_milli_cents"),
                    ),
                    F.struct(
                        F.lit("l_linestatus").alias("feature"),
                        F.col("mae_p2").alias("mae_milli_cents"),
                    ),
                )
            ).alias("x"),
            F.col("mae_base"),
        )
        .select(
            F.col("x.feature").alias("feature"),
            F.col("x.mae_milli_cents").alias("mae_milli_cents"),
            (F.col("x.mae_milli_cents") - F.col("mae_base")).alias(
                "importance_milli"
            ),
        )
        .orderBy("feature")
    )


_MC_PRED = (
    "CASE WHEN year(l_shipdate) <= 1996 THEN 'R' "
    "WHEN year(l_shipdate) <= 1998 THEN 'A' ELSE 'N' END"
)


@query(
    "ml_multiclass_f1",
    oracle=f"""
    WITH cells AS (
        SELECT l_returnflag AS actual,
               {_MC_PRED} AS pred,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY 1, 2
    ),
    per_class AS (
        SELECT c.cls,
               CAST(SUM(CASE WHEN cells.actual = c.cls
                             AND cells.pred = c.cls
                        THEN cells.n ELSE 0 END) AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN cells.pred = c.cls
                             AND cells.actual <> c.cls
                        THEN cells.n ELSE 0 END) AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN cells.actual = c.cls
                             AND cells.pred <> c.cls
                        THEN cells.n ELSE 0 END) AS BIGINT) AS fn
        FROM cells, (VALUES ('A'), ('N'), ('R')) AS c(cls)
        GROUP BY 1
    ),
    scored AS (
        SELECT cls, tp, fp, fn,
               CASE WHEN tp + fp > 0
                    THEN CAST(tp * 1000000 // (tp + fp) AS BIGINT)
                    ELSE 0 END AS prec_ppm,
               CASE WHEN tp + fn > 0
                    THEN CAST(tp * 1000000 // (tp + fn) AS BIGINT)
                    ELSE 0 END AS rec_ppm,
               CASE WHEN 2 * tp + fp + fn > 0
                    THEN CAST(2 * tp * 1000000 // (2 * tp + fp + fn)
                              AS BIGINT)
                    ELSE 0 END AS f1_ppm
        FROM per_class
    )
    SELECT cls, tp, fp, fn, prec_ppm, rec_ppm, f1_ppm FROM scored
    UNION ALL
    SELECT 'macro', CAST(SUM(tp) AS BIGINT), CAST(SUM(fp) AS BIGINT),
           CAST(SUM(fn) AS BIGINT),
           CAST(SUM(prec_ppm) // 3 AS BIGINT),
           CAST(SUM(rec_ppm) // 3 AS BIGINT),
           CAST(SUM(f1_ppm) // 3 AS BIGINT)
    FROM scored
    UNION ALL
    SELECT 'micro', CAST(SUM(tp) AS BIGINT), CAST(SUM(fp) AS BIGINT),
           CAST(SUM(fn) AS BIGINT),
           CAST(SUM(tp) * 1000000 // (SUM(tp) + SUM(fp)) AS BIGINT),
           CAST(SUM(tp) * 1000000 // (SUM(tp) + SUM(fn)) AS BIGINT),
           CAST(2 * SUM(tp) * 1000000 // (2 * SUM(tp) + SUM(fp) + SUM(fn))
                AS BIGINT)
    FROM scored
    ORDER BY cls
    """,
    tags=("ml", "evaluation", "multiclass", "engine-addition"),
)
def ml_multiclass_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiclass confusion readout — per-class precision / recall /
    F1 plus macro (unweighted class mean) and micro (pooled) rows —
    for a fixed ship-year rule classifier against the 3-class return
    flag. ml_confusion_metrics / ml_cohens_kappa stop at binary; this
    is the 3+-class completion every multiclass model eval needs, and
    it pins the macro-vs-micro distinction (macro weights classes
    equally; micro weights rows, and with single-label multiclass its
    precision = recall = accuracy).

    Exactness: the entire confusion lives in 9 integer cells from one
    aggregate; every rate is an integer-ppm floor division; macro is
    a floor-mean of the three per-class ppm values.

    Scale shape: one map-side-combined 9-key aggregate over the scan;
    the class expansion joins 9 rows x 3 classes — model-sized; the
    3-row per-class frame is staged so its three consumers (rows,
    macro, micro) do not re-run the scan aggregate (r9 worst-shuffle
    sweep: 9 -> 4 exchanges)."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_returnflag").alias("actual"),
        F.expr(_MC_PRED).alias("pred"),
    ).agg(F.count(F.lit(1)).alias("n"))
    classes = spark.createDataFrame([("A",), ("N",), ("R",)], "cls string")
    per_class = (
        cells.crossJoin(F.broadcast(classes))
        .groupBy("cls")
        .agg(
            F.sum(
                F.when(
                    (F.col("actual") == F.col("cls"))
                    & (F.col("pred") == F.col("cls")),
                    F.col("n"),
                ).otherwise(0)
            ).cast("bigint").alias("tp"),
            F.sum(
                F.when(
                    (F.col("pred") == F.col("cls"))
                    & (F.col("actual") != F.col("cls")),
                    F.col("n"),
                ).otherwise(0)
            ).cast("bigint").alias("fp"),
            F.sum(
                F.when(
                    (F.col("actual") == F.col("cls"))
                    & (F.col("pred") != F.col("cls")),
                    F.col("n"),
                ).otherwise(0)
            ).cast("bigint").alias("fn"),
        )
    )
    # 3-row frame consumed THREE times (per-class rows + macro +
    # micro): staged, or the confusion aggregate re-runs per consumer
    scored = materialize(per_class).selectExpr(
        "cls", "tp", "fp", "fn",
        "CASE WHEN tp + fp > 0 THEN CAST(tp * 1000000 div (tp + fp) AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END AS prec_ppm",
        "CASE WHEN tp + fn > 0 THEN CAST(tp * 1000000 div (tp + fn) AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END AS rec_ppm",
        "CASE WHEN 2 * tp + fp + fn > 0 THEN "
        "CAST(2 * tp * 1000000 div (2 * tp + fp + fn) AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END AS f1_ppm",
    )
    macro = scored.selectExpr(
        "'macro' AS cls",
        "CAST(sum(tp) AS BIGINT) AS tp", "CAST(sum(fp) AS BIGINT) AS fp",
        "CAST(sum(fn) AS BIGINT) AS fn",
        "CAST(sum(prec_ppm) div 3 AS BIGINT) AS prec_ppm",
        "CAST(sum(rec_ppm) div 3 AS BIGINT) AS rec_ppm",
        "CAST(sum(f1_ppm) div 3 AS BIGINT) AS f1_ppm",
    )
    micro = scored.selectExpr(
        "'micro' AS cls",
        "CAST(sum(tp) AS BIGINT) AS tp", "CAST(sum(fp) AS BIGINT) AS fp",
        "CAST(sum(fn) AS BIGINT) AS fn",
        "CAST(sum(tp) * 1000000 div (sum(tp) + sum(fp)) AS BIGINT)"
        " AS prec_ppm",
        "CAST(sum(tp) * 1000000 div (sum(tp) + sum(fn)) AS BIGINT)"
        " AS rec_ppm",
        "CAST(2 * sum(tp) * 1000000 div (2 * sum(tp) + sum(fp) + sum(fn))"
        " AS BIGINT) AS f1_ppm",
    )
    return scored.unionAll(macro).unionAll(micro).orderBy("cls")


_COST_FP = 1
_COST_FN = 5
_COST_BIN_W = 25000


@query(
    "ml_cost_threshold",
    oracle=f"""
    WITH hist AS (
        SELECT CAST(FLOOR(o_totalprice / {_COST_BIN_W}.0) AS BIGINT)
                   AS bin_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS pos
        FROM orders GROUP BY 1
    ),
    suff AS (
        SELECT bin_id,
               CAST(SUM(n - pos) OVER (ORDER BY bin_id DESC) AS BIGINT)
                   AS fp,
               CAST(SUM(pos) OVER () - SUM(pos) OVER (ORDER BY bin_id DESC)
                    AS BIGINT) AS fn
        FROM hist
    ),
    costed AS (
        SELECT bin_id, bin_id * {_COST_BIN_W} AS threshold, fp, fn,
               fp * {_COST_FP} + fn * {_COST_FN} AS cost_units
        FROM suff
    )
    SELECT bin_id, threshold, fp, fn, cost_units,
           CAST(CASE WHEN cost_units = MIN(cost_units) OVER ()
                THEN 1 ELSE 0 END AS INT) AS is_optimal
    FROM costed
    ORDER BY bin_id
    """,
    tags=("ml", "evaluation", "decision-threshold", "engine-addition"),
)
def ml_cost_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-sensitive operating-point selection: for every candidate
    threshold t (bin lower edges of the score histogram), predicting
    positive at score >= t costs FP(t)*{_COST_FP} + FN(t)*{_COST_FN}
    — the decision-analysis step after ml_roc_curve, with the
    asymmetric costs real alerting/fraud systems have. FP(t) is a
    suffix sum of negatives, FN(t) a complementary suffix of
    positives, so the whole curve is exact integers from ONE
    histogram pass, and the argmin is flagged by an integer
    comparison against the window minimum.

    Scale shape: one map-side-combined ~20-key aggregate; suffix sums
    and the min run on the bin frame."""
    o = load_table(spark, sf_dir, "orders")
    pos = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    hist = o.groupBy(
        F.floor(F.col("o_totalprice") / float(_COST_BIN_W))
        .cast("bigint")
        .alias("bin_id")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(pos).cast("bigint").alias("pos"),
    )
    wdesc = Window.orderBy(F.col("bin_id").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    suff = hist.select(
        "bin_id",
        F.sum(F.col("n") - F.col("pos")).over(wdesc).cast("bigint").alias("fp"),
        (F.sum("pos").over(wall) - F.sum("pos").over(wdesc))
        .cast("bigint")
        .alias("fn"),
    )
    costed = suff.select(
        "bin_id",
        (F.col("bin_id") * _COST_BIN_W).alias("threshold"),
        "fp",
        "fn",
        (F.col("fp") * _COST_FP + F.col("fn") * _COST_FN).alias("cost_units"),
    )
    return costed.select(
        "bin_id", "threshold", "fp", "fn", "cost_units",
        F.when(
            F.col("cost_units") == F.min("cost_units").over(wall), 1
        ).otherwise(0).cast("int").alias("is_optimal"),
    ).orderBy("bin_id")


# Fixed-point PCA: one moment pass builds the exact scaled covariance
# S = n*Sxx - Sx*Sx' (integers), then two power-iteration steps with
# the vector renormalized to ppm-of-max-|component| between steps —
# the renormalization keeps every product inside decimal(38,0)
# (HUGEINT on the oracle side) while preserving direction exactly.
_PCA_FEATURES = ("quantity", "discount_x100", "ship_month")


@query(
    "ml_pca_power_iteration",
    oracle="""
    WITH m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x1) AS BIGINT) AS s1,
               CAST(sum(x2) AS BIGINT) AS s2,
               CAST(sum(x3) AS BIGINT) AS s3,
               CAST(sum(x1*x1) AS BIGINT) AS s11,
               CAST(sum(x1*x2) AS BIGINT) AS s12,
               CAST(sum(x1*x3) AS BIGINT) AS s13,
               CAST(sum(x2*x2) AS BIGINT) AS s22,
               CAST(sum(x2*x3) AS BIGINT) AS s23,
               CAST(sum(x3*x3) AS BIGINT) AS s33
        FROM (
            SELECT CAST(l_quantity AS BIGINT) AS x1,
                   CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS x2,
                   CAST(month(l_shipdate) AS BIGINT) AS x3
            FROM lineitem)
    ),
    cov AS (
        SELECT n,
               CAST(n*s11 - s1*s1 AS HUGEINT) AS c11,
               CAST(n*s12 - s1*s2 AS HUGEINT) AS c12,
               CAST(n*s13 - s1*s3 AS HUGEINT) AS c13,
               CAST(n*s22 - s2*s2 AS HUGEINT) AS c22,
               CAST(n*s23 - s2*s3 AS HUGEINT) AS c23,
               CAST(n*s33 - s3*s3 AS HUGEINT) AS c33
        FROM m
    ),
    v1 AS (
        SELECT *, c11 + c12 + c13 AS w1, c12 + c22 + c23 AS w2,
               c13 + c23 + c33 AS w3
        FROM cov
    ),
    u1 AS (
        SELECT *,
          CASE WHEN w1 < 0 THEN -1 ELSE 1 END
            * (ABS(w1) * 1000000 // GREATEST(ABS(w1), ABS(w2), ABS(w3)))
            AS u1_1,
          CASE WHEN w2 < 0 THEN -1 ELSE 1 END
            * (ABS(w2) * 1000000 // GREATEST(ABS(w1), ABS(w2), ABS(w3)))
            AS u1_2,
          CASE WHEN w3 < 0 THEN -1 ELSE 1 END
            * (ABS(w3) * 1000000 // GREATEST(ABS(w1), ABS(w2), ABS(w3)))
            AS u1_3
        FROM v1
    ),
    v2 AS (
        SELECT *, c11*u1_1 + c12*u1_2 + c13*u1_3 AS z1,
               c12*u1_1 + c22*u1_2 + c23*u1_3 AS z2,
               c13*u1_1 + c23*u1_2 + c33*u1_3 AS z3
        FROM u1
    ),
    u2 AS (
        SELECT *,
          CASE WHEN z1 < 0 THEN -1 ELSE 1 END
            * (ABS(z1) * 1000000 // GREATEST(ABS(z1), ABS(z2), ABS(z3)))
            AS u2_1,
          CASE WHEN z2 < 0 THEN -1 ELSE 1 END
            * (ABS(z2) * 1000000 // GREATEST(ABS(z1), ABS(z2), ABS(z3)))
            AS u2_2,
          CASE WHEN z3 < 0 THEN -1 ELSE 1 END
            * (ABS(z3) * 1000000 // GREATEST(ABS(z1), ABS(z2), ABS(z3)))
            AS u2_3,
          (u1_1*z1 + u1_2*z2 + u1_3*z3) * 1000000
            // ((u1_1*u1_1 + u1_2*u1_2 + u1_3*u1_3)
                * CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS lam
        FROM v2
    )
    SELECT feature, CAST(u1_ppm AS BIGINT) AS u1_ppm,
           CAST(u2_ppm AS BIGINT) AS u2_ppm,
           CAST(lam AS BIGINT) AS rayleigh_per_row2_e6
    FROM (
        SELECT 'quantity' AS feature, u1_1 AS u1_ppm, u2_1 AS u2_ppm, lam
        FROM u2
        UNION ALL
        SELECT 'discount_x100', u1_2, u2_2, lam FROM u2
        UNION ALL
        SELECT 'ship_month', u1_3, u2_3, lam FROM u2)
    ORDER BY feature
    """,
    tags=("ml", "pca", "power-iteration", "fixed-point", "engine-addition"),
)
def ml_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal component by power iteration — the
    dimensionality-reduction primitive, run EXACTLY: one moment pass
    builds the integer scaled covariance S = n*Sxy - Sx*Sy over three
    lineitem features (quantity, discount cents-of-percent, ship
    month), then two power steps v -> S*v from the all-ones start,
    renormalizing to ppm-of-max-|component| between steps so every
    intermediate stays inside decimal(38,0) (HUGEINT oracle-side)
    while the DIRECTION — all PCA consumes — is preserved bit-exactly.
    The Rayleigh quotient u1'Su1 / u1'u1 (integer ppm) estimates the
    top eigenvalue of the scaled covariance; u2 is the loadings
    readout. Sign-safe renormalization: abs before the floor
    division, sign reapplied — Spark div truncates toward zero and
    DuckDB // floors, so a negative numerator would disagree by 1.

    Scale shape: ONE map-side-combined 10-aggregate scan; the matrix
    algebra runs on a single row. At 100 TB a d-feature PCA step is
    one O(d^2)-wide aggregate, never a shuffle of the data."""
    li = load_table(spark, sf_dir, "lineitem")
    feats = li.selectExpr(
        "CAST(l_quantity AS BIGINT) AS x1",
        "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS x2",
        "CAST(month(l_shipdate) AS BIGINT) AS x3",
    )
    m = feats.selectExpr(
        "x1", "x2", "x3",
        "x1*x1 AS p11", "x1*x2 AS p12", "x1*x3 AS p13",
        "x2*x2 AS p22", "x2*x3 AS p23", "x3*x3 AS p33",
    ).groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            F.sum(c).cast("bigint").alias("s" + c[1:])
            for c in ("x1", "x2", "x3")
        ],
        *[
            F.sum(c).cast("bigint").alias("s" + c[1:])
            for c in ("p11", "p12", "p13", "p22", "p23", "p33")
        ],
    )
    d38 = "decimal(38,0)"
    cov = m.selectExpr(
        "n",
        f"CAST(n*s11 - s1*s1 AS {d38}) AS c11",
        f"CAST(n*s12 - s1*s2 AS {d38}) AS c12",
        f"CAST(n*s13 - s1*s3 AS {d38}) AS c13",
        f"CAST(n*s22 - s2*s2 AS {d38}) AS c22",
        f"CAST(n*s23 - s2*s3 AS {d38}) AS c23",
        f"CAST(n*s33 - s3*s3 AS {d38}) AS c33",
    )
    v1 = cov.selectExpr(
        "*",
        "c11 + c12 + c13 AS w1",
        "c12 + c22 + c23 AS w2",
        "c13 + c23 + c33 AS w3",
    )

    def _norm(pre: str, out: str) -> list[str]:
        g = f"GREATEST(ABS({pre}1), ABS({pre}2), ABS({pre}3))"
        return [
            f"CASE WHEN {pre}{i} < 0 THEN -1 ELSE 1 END"
            f" * (ABS({pre}{i}) * 1000000 div {g}) AS {out}{i}"
            for i in (1, 2, 3)
        ]

    u1 = v1.selectExpr("*", *_norm("w", "u1_"))
    v2 = u1.selectExpr(
        "*",
        "c11*u1_1 + c12*u1_2 + c13*u1_3 AS z1",
        "c12*u1_1 + c22*u1_2 + c23*u1_3 AS z2",
        "c13*u1_1 + c23*u1_2 + c33*u1_3 AS z3",
    )
    u2 = v2.selectExpr(
        "*",
        *_norm("z", "u2_"),
        # normalized per row^2: the raw Rayleigh quotient of the
        # n-scaled covariance grows ~n^2*var and overflows int64 at
        # sf0.1 — dividing by n^2 reports the eigenvalue of the plain
        # covariance (in e6), which is scale-stable
        "(u1_1*z1 + u1_2*z2 + u1_3*z3) * 1000000"
        " div ((u1_1*u1_1 + u1_2*u1_2 + u1_3*u1_3)"
        f" * CAST(n AS {d38}) * CAST(n AS {d38})) AS lam",
    )
    return u2.selectExpr(
        """stack(3,
           'quantity', u1_1, u2_1,
           'discount_x100', u1_2, u2_2,
           'ship_month', u1_3, u2_3)
           AS (feature, u1_raw, u2_raw)""",
        "CAST(lam AS BIGINT) AS rayleigh_per_row2_e6",
    ).selectExpr(
        "feature",
        "CAST(u1_raw AS BIGINT) AS u1_ppm",
        "CAST(u2_raw AS BIGINT) AS u2_ppm",
        "rayleigh_per_row2_e6",
    ).orderBy("feature")


# Depth-2 split search: scores are Brier-style purity sums scaled by
# 1e12 — argmax of sum_side (pos^2 + neg^2)/n_side is argmin of the
# weighted Gini, and staging it as integer floor divisions (identical
# on both engines) removes every float from the comparison. Ties at
# 1e-12 resolution break on the split value.
_T2_SCALE = 1_000_000_000_000


def _t2_score(pl: str, ql: str, nl: str, pr: str, qr: str, nr: str) -> str:
    """Purity score of a binary partition, integer-staged (SQL shared
    verbatim by Spark and DuckDB: div spelled by the caller)."""
    return (
        f"(({pl})*({pl}) + ({ql})*({ql})) * {_T2_SCALE} DIV ({nl})"
        f" + (({pr})*({pr}) + ({qr})*({qr})) * {_T2_SCALE} DIV ({nr})"
    )


@query(
    "ml_tree_depth2",
    oracle=f"""
    WITH rows_ AS (
        SELECT CAST(l_quantity AS BIGINT) AS qty,
               CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS disc,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
    ),
    h0 AS (
        SELECT qty, CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(y) AS HUGEINT) AS pos
        FROM rows_ GROUP BY 1
    ),
    c0 AS (
        SELECT qty,
               sum(n) OVER (ORDER BY qty) AS nl,
               sum(pos) OVER (ORDER BY qty) AS pl,
               sum(n) OVER () AS nt, sum(pos) OVER () AS pt
        FROM h0
    ),
    e0 AS (
        SELECT qty, nl, pl, nt, pt,
               {_t2_score('pl', 'nl - pl', 'nl',
                          'pt - pl', '(nt - nl) - (pt - pl)', 'nt - nl')
                .replace('DIV', '//')} AS score
        FROM c0 WHERE nl < nt
    ),
    root AS (
        SELECT * FROM e0
        ORDER BY score DESC, qty LIMIT 1
    ),
    h1 AS (
        SELECT CASE WHEN r.qty >= rows_.qty THEN 'left' ELSE 'right' END
                   AS node,
               disc, CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(y) AS HUGEINT) AS pos
        FROM rows_, root r GROUP BY 1, 2
    ),
    c1 AS (
        SELECT node, disc,
               sum(n) OVER (PARTITION BY node ORDER BY disc) AS nl,
               sum(pos) OVER (PARTITION BY node ORDER BY disc) AS pl,
               sum(n) OVER (PARTITION BY node) AS nt,
               sum(pos) OVER (PARTITION BY node) AS pt
        FROM h1
    ),
    e1 AS (
        SELECT node, disc, nl, pl, nt, pt,
               {_t2_score('pl', 'nl - pl', 'nl',
                          'pt - pl', '(nt - nl) - (pt - pl)', 'nt - nl')
                .replace('DIV', '//')} AS score,
               row_number() OVER (PARTITION BY node
                                  ORDER BY {_t2_score(
                                      'pl', 'nl - pl', 'nl',
                                      'pt - pl',
                                      '(nt - nl) - (pt - pl)',
                                      'nt - nl').replace('DIV', '//')} DESC,
                                  disc) AS rk
        FROM c1 WHERE nl < nt
    )
    SELECT node, feature, split_val, n_node, pos_node,
           n_left, pos_left, score_e12
    FROM (
        SELECT 'root' AS node, 'quantity' AS feature,
               CAST(qty AS BIGINT) AS split_val,
               CAST(nt AS BIGINT) AS n_node, CAST(pt AS BIGINT) AS pos_node,
               CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left,
               CAST(score AS BIGINT) AS score_e12
        FROM root
        UNION ALL
        SELECT node, 'discount_x100', CAST(disc AS BIGINT),
               CAST(nt AS BIGINT), CAST(pt AS BIGINT),
               CAST(nl AS BIGINT), CAST(pl AS BIGINT), CAST(score AS BIGINT)
        FROM e1 WHERE rk = 1)
    ORDER BY node
    """,
    tags=("ml", "tree", "split-search", "engine-addition"),
)
def ml_tree_depth2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy CART grown ONE level past ml_decision_stump: the best
    root split on quantity, then — inside each resulting leaf — the
    best split on the second feature (discount cents-of-percent).
    Novelty vs the stump: the comparison is now FLOAT-FREE — argmin
    of weighted Gini is argmax of sum_side (pos^2+neg^2)/n_side,
    staged as integer floor divisions scaled 1e12, so the argmax is
    a pure integer comparison on both engines (ties at 1e-12
    resolution break on the split value; deterministic either way).

    Scale shape: the canonical two-pass anchor pattern — pass 1
    builds the ~50-key quantity histogram and reduces to a 1-row
    root; pass 2 re-scans with the broadcast root and builds BOTH
    leaves' second-feature histograms in one shuffle (node is just
    another group key). Depth d costs d scans regardless of data
    size; windows only ever run on histogram-sized frames."""
    li = load_table(spark, sf_dir, "lineitem")
    rows_ = li.selectExpr(
        "CAST(l_quantity AS BIGINT) AS qty",
        "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS disc",
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y",
    )
    d38 = "decimal(38,0)"
    h0 = rows_.groupBy("qty").agg(
        F.expr(f"CAST(count(*) AS {d38})").alias("n"),
        F.expr(f"CAST(sum(y) AS {d38})").alias("pos"),
    )
    wq = Window.orderBy("qty").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    c0 = h0.select(
        "qty",
        F.sum("n").over(wq).alias("nl"),
        F.sum("pos").over(wq).alias("pl"),
        F.sum("n").over(wall).alias("nt"),
        F.sum("pos").over(wall).alias("pt"),
    )
    score0 = _t2_score(
        "pl", "nl - pl", "nl", "pt - pl", "(nt - nl) - (pt - pl)", "nt - nl"
    ).replace("DIV", "div")
    # staged (r10 shuffle sweep): the 1-row root feeds the broadcast
    # tagging pass AND the output's root row — unstaged, the whole
    # histogram+window+top-1 pipeline (a lineitem scan included) ran
    # twice
    root = materialize(
        c0.where(F.col("nl") < F.col("nt"))
        .selectExpr("qty", "nl", "pl", "nt", "pt", f"{score0} AS score")
        .orderBy(F.desc("score"), "qty")
        .limit(1)
    )
    tagged = rows_.crossJoin(
        F.broadcast(root.selectExpr("qty AS root_qty"))
    ).selectExpr(
        "CASE WHEN qty <= root_qty THEN 'left' ELSE 'right' END AS node",
        "disc",
        "y",
    )
    h1 = tagged.groupBy("node", "disc").agg(
        F.expr(f"CAST(count(*) AS {d38})").alias("n"),
        F.expr(f"CAST(sum(y) AS {d38})").alias("pos"),
    )
    wd = (
        Window.partitionBy("node")
        .orderBy("disc")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy("node")
    c1 = h1.select(
        "node",
        "disc",
        F.sum("n").over(wd).alias("nl"),
        F.sum("pos").over(wd).alias("pl"),
        F.sum("n").over(wn).alias("nt"),
        F.sum("pos").over(wn).alias("pt"),
    )
    e1 = (
        c1.where(F.col("nl") < F.col("nt"))
        .selectExpr("node", "disc", "nl", "pl", "nt", "pt", f"{score0} AS score")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("node").orderBy(F.desc("score"), "disc")
            ),
        )
        .where(F.col("rk") == 1)
    )
    out_root = root.selectExpr(
        "'root' AS node",
        "'quantity' AS feature",
        "CAST(qty AS BIGINT) AS split_val",
        "CAST(nt AS BIGINT) AS n_node",
        "CAST(pt AS BIGINT) AS pos_node",
        "CAST(nl AS BIGINT) AS n_left",
        "CAST(pl AS BIGINT) AS pos_left",
        "CAST(score AS BIGINT) AS score_e12",
    )
    out_leaves = e1.selectExpr(
        "node",
        "'discount_x100' AS feature",
        "CAST(disc AS BIGINT) AS split_val",
        "CAST(nt AS BIGINT) AS n_node",
        "CAST(pt AS BIGINT) AS pos_node",
        "CAST(nl AS BIGINT) AS n_left",
        "CAST(pl AS BIGINT) AS pos_left",
        "CAST(score AS BIGINT) AS score_e12",
    )
    return out_root.unionByName(out_leaves).orderBy("node")


# One gradient-boosting round for regression: stage-1 stump on
# quantity (SSE-optimal split via the integer cross-multiplied score
# sum_side Sy^2/n), leaf-mean predictions floored to cents, stage-2
# stump fit to the RESIDUALS on discount. The score quotient Sy^2/n
# exceeds int64 (Sy is a cents sum), so the floor division must STAY
# in wide-integer arithmetic: DuckDB's // keeps HUGEINT, while on the
# Spark side `div` would materialize a long — the exact floor is
# spelled (a - a % b) / b, which stays in decimal and is exact
# because the numerator is a multiple of b.


def _gbm_score(sl: str, nl: str, sr: str, nr: str) -> str:
    a1, a2 = f"(({sl})*({sl}))", f"(({sr})*({sr}))"
    return (
        f"({a1} - {a1} % ({nl})) DIV ({nl})"
        f" + ({a2} - {a2} % ({nr})) DIV ({nr})"
    )


@query(
    "ml_gbm_one_boost_round",
    oracle=f"""
    WITH rows_ AS (
        SELECT CAST(l_quantity AS BIGINT) AS qty,
               CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS disc,
               CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS HUGEINT) AS y
        FROM lineitem
    ),
    h0 AS (
        SELECT qty, CAST(count(*) AS HUGEINT) AS n, sum(y) AS sy
        FROM rows_ GROUP BY 1
    ),
    c0 AS (
        SELECT qty, sum(n) OVER (ORDER BY qty) AS nl,
               sum(sy) OVER (ORDER BY qty) AS sl,
               sum(n) OVER () AS nt, sum(sy) OVER () AS st
        FROM h0
    ),
    root AS (
        SELECT qty, nl, sl, nt, st,
               {_gbm_score('sl', 'nl', 'st - sl', 'nt - nl')
                .replace('DIV', '//')} AS score
        FROM c0 WHERE nl < nt
        ORDER BY score DESC, qty LIMIT 1
    ),
    resid AS (
        SELECT rows_.disc,
               rows_.y - (CASE WHEN rows_.qty <= r.qty
                               THEN r.sl // r.nl
                               ELSE (r.st - r.sl) // (r.nt - r.nl) END)
                   AS rr
        FROM rows_, root r
    ),
    h1 AS (
        SELECT disc, CAST(count(*) AS HUGEINT) AS n, sum(rr) AS sr
        FROM resid GROUP BY 1
    ),
    c1 AS (
        SELECT disc, sum(n) OVER (ORDER BY disc) AS nl,
               sum(sr) OVER (ORDER BY disc) AS sl,
               sum(n) OVER () AS nt, sum(sr) OVER () AS st
        FROM h1
    ),
    boost AS (
        SELECT disc, nl, sl, nt, st,
               {_gbm_score('sl', 'nl', 'st - sl', 'nt - nl')
                .replace('DIV', '//')} AS score
        FROM c1 WHERE nl < nt
        ORDER BY score DESC, disc LIMIT 1
    )
    SELECT stage, feature, split_val, n_left, n_right,
           mean_left_cents, mean_right_cents, score_per_row
    FROM (
        SELECT 'round1' AS stage, 'quantity' AS feature,
               CAST(qty AS BIGINT) AS split_val,
               CAST(nl AS BIGINT) AS n_left,
               CAST(nt - nl AS BIGINT) AS n_right,
               CAST(sl // nl AS BIGINT) AS mean_left_cents,
               CAST((st - sl) // (nt - nl) AS BIGINT) AS mean_right_cents,
               CAST(score // nt AS BIGINT) AS score_per_row
        FROM root
        UNION ALL
        SELECT 'round2', 'discount_x100', CAST(disc AS BIGINT),
               CAST(nl AS BIGINT), CAST(nt - nl AS BIGINT),
               CAST(CASE WHEN sl < 0 THEN -((-sl) // nl)
                         ELSE sl // nl END AS BIGINT),
               CAST(CASE WHEN st - sl < 0
                         THEN -((sl - st) // (nt - nl))
                         ELSE (st - sl) // (nt - nl) END AS BIGINT),
               CAST(score // nt AS BIGINT)
        FROM boost)
    ORDER BY stage
    """,
    tags=("ml", "boosting", "tree", "regression", "engine-addition"),
)
def ml_gbm_one_boost_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full gradient-boosting round for REGRESSION (the additive
    sibling of ml_tree_depth2's classifier): stage 1 fits the
    SSE-optimal stump on quantity predicting line revenue —
    minimizing SSE is maximizing sum_side Sy^2/n, staged as integer
    floor divisions scaled 1e6 so the argmax is float-free — stage 2
    re-fits on the RESIDUALS (y minus the leaf mean, floored to
    cents) against discount. This is the boosting loop's exact inner
    shape: predict, subtract, fit again. Negative residual means are
    divided sign-safely (both engines truncate toward zero; the
    explicit CASE keeps the floor semantics identical when DuckDB
    sums are HUGEINT and Spark's are decimal).

    Scale shape: each round is one histogram shuffle over the
    active feature plus a model-sized window — the residual pass
    re-scans the fact with the 1-row stage-1 model broadcast, so
    round r costs r scans and zero data-sized windows."""
    li = load_table(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    rows_ = li.selectExpr(
        "CAST(l_quantity AS BIGINT) AS qty",
        "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS disc",
        f"CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        f" AS {d38}) AS y",
    )
    score_sql = _gbm_score("sl", "nl", "st - sl", "nt - nl")
    # DuckDB: a // b on HUGEINT. Spark: (a - a%b)/b is exact on
    # decimals (numerator is a multiple of b), avoiding div's long.
    score = (
        "CAST(" + score_sql.replace("DIV", "/") + " AS decimal(38,0))"
    )

    def best_split(hist, key):
        wv = Window.orderBy(key).rowsBetween(Window.unboundedPreceding, 0)
        wall = Window.partitionBy()
        c = hist.select(
            key,
            F.sum("n").over(wv).alias("nl"),
            F.sum("s").over(wv).alias("sl"),
            F.sum("n").over(wall).alias("nt"),
            F.sum("s").over(wall).alias("st"),
        )
        return (
            c.where(F.col("nl") < F.col("nt"))
            .selectExpr(key, "nl", "sl", "nt", "st", f"{score} AS score")
            .orderBy(F.desc("score"), key)
            .limit(1)
        )

    h0 = rows_.groupBy("qty").agg(
        F.expr(f"CAST(count(*) AS {d38})").alias("n"),
        F.expr("sum(y)").alias("s"),
    )
    # staged (r10 shuffle sweep): the 1-row stage-1 stump feeds the
    # residual broadcast AND the output's round1 row — unstaged, the
    # histogram+window+top-1 pipeline (a lineitem scan included) ran
    # twice (same disease ml_tree_depth2 had)
    root = materialize(best_split(h0, "qty"))
    resid = rows_.crossJoin(
        F.broadcast(
            root.selectExpr(
                "qty AS r_qty", "sl div nl AS ml",
                "(st - sl) div (nt - nl) AS mr",
            )
        )
    ).selectExpr(
        "disc", "y - (CASE WHEN qty <= r_qty THEN ml ELSE mr END) AS rr"
    )
    h1 = resid.groupBy("disc").agg(
        F.expr(f"CAST(count(*) AS {d38})").alias("n"),
        F.expr("sum(rr)").alias("s"),
    )
    boost = best_split(h1, "disc")
    out1 = root.selectExpr(
        "'round1' AS stage", "'quantity' AS feature",
        "CAST(qty AS BIGINT) AS split_val",
        "CAST(nl AS BIGINT) AS n_left",
        "CAST(nt - nl AS BIGINT) AS n_right",
        "CAST(sl div nl AS BIGINT) AS mean_left_cents",
        "CAST((st - sl) div (nt - nl) AS BIGINT) AS mean_right_cents",
        "CAST(score div nt AS BIGINT) AS score_per_row",
    )
    out2 = boost.selectExpr(
        "'round2' AS stage", "'discount_x100' AS feature",
        "CAST(disc AS BIGINT) AS split_val",
        "CAST(nl AS BIGINT) AS n_left",
        "CAST(nt - nl AS BIGINT) AS n_right",
        "CAST(sl div nl AS BIGINT) AS mean_left_cents",
        "CAST((st - sl) div (nt - nl) AS BIGINT) AS mean_right_cents",
        "CAST(score div nt AS BIGINT) AS score_per_row",
    )
    return out1.unionByName(out2).orderBy("stage")


_FAIR_THRESHOLD_CENTS = 15_000_000  # classify positive when price > 150k


@query(
    "ml_threshold_fairness_audit",
    oracle=f"""
    WITH scored AS (
        SELECT o_orderpriority AS grp,
               CASE WHEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) > {_FAIR_THRESHOLD_CENTS}
                    THEN 1 ELSE 0 END AS yhat,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    per AS (
        SELECT grp,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(yhat * y) AS BIGINT) AS tp,
               CAST(sum(yhat * (1 - y)) AS BIGINT) AS fp,
               CAST(sum((1 - yhat) * y) AS BIGINT) AS fn,
               CAST(sum((1 - yhat) * (1 - y)) AS BIGINT) AS tn
        FROM scored GROUP BY 1
    ),
    rates AS (
        SELECT grp, n, tp, fp, fn, tn,
               CAST(tp * 1000000 // (tp + fn) AS BIGINT) AS tpr_ppm,
               CAST(fp * 1000000 // (fp + tn) AS BIGINT) AS fpr_ppm,
               CAST((tp + fp) * 1000000 // n AS BIGINT) AS sel_ppm
        FROM per
    )
    SELECT grp, n, tp, fp, fn, tn, tpr_ppm, fpr_ppm, sel_ppm,
           CAST(max(tpr_ppm) OVER () - min(tpr_ppm) OVER () AS BIGINT)
               AS tpr_gap_ppm,
           CAST(max(fpr_ppm) OVER () - min(fpr_ppm) OVER () AS BIGINT)
               AS fpr_gap_ppm,
           CAST(max(sel_ppm) OVER () - min(sel_ppm) OVER () AS BIGINT)
               AS selection_gap_ppm
    FROM rates ORDER BY grp
    """,
    tags=("ml", "fairness", "audit", "equalized-odds", "engine-addition"),
)
def ml_threshold_fairness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-fairness audit of a thresholded classifier — the
    responsible-deployment gate: per protected group (order
    priority stands in), the full confusion matrix at the pinned
    decision threshold, TPR/FPR/selection rate in exact integer ppm,
    and the EQUALIZED-ODDS gaps (max minus min TPR and FPR across
    groups) plus the demographic-parity selection gap, repeated per
    row so each group's row carries the audit verdict. All
    arithmetic is integer counts and ppm floor divisions — an audit
    whose numbers can be recomputed exactly is one that can be
    disputed precisely.

    Scale shape: one map-side-combined aggregate to |groups| rows;
    the gap windows run on the group table."""
    o = load_table(spark, sf_dir, "orders")
    scored = o.selectExpr(
        "o_orderpriority AS grp",
        f"CASE WHEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
        f" AS BIGINT) > {_FAIR_THRESHOLD_CENTS} THEN 1 ELSE 0 END AS yhat",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y",
    )
    per = scored.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("yhat * y")).cast("bigint").alias("tp"),
        F.sum(F.expr("yhat * (1 - y)")).cast("bigint").alias("fp"),
        F.sum(F.expr("(1 - yhat) * y")).cast("bigint").alias("fn"),
        F.sum(F.expr("(1 - yhat) * (1 - y)")).cast("bigint").alias("tn"),
    )
    rates = per.selectExpr(
        "grp", "n", "tp", "fp", "fn", "tn",
        "CAST(tp * 1000000 div (tp + fn) AS BIGINT) AS tpr_ppm",
        "CAST(fp * 1000000 div (fp + tn) AS BIGINT) AS fpr_ppm",
        "CAST((tp + fp) * 1000000 div n AS BIGINT) AS sel_ppm",
    )
    wall = Window.partitionBy()
    return (
        rates.select(
            "*",
            (F.max("tpr_ppm").over(wall) - F.min("tpr_ppm").over(wall))
            .cast("bigint")
            .alias("tpr_gap_ppm"),
            (F.max("fpr_ppm").over(wall) - F.min("fpr_ppm").over(wall))
            .cast("bigint")
            .alias("fpr_gap_ppm"),
            (F.max("sel_ppm").over(wall) - F.min("sel_ppm").over(wall))
            .cast("bigint")
            .alias("selection_gap_ppm"),
        )
        .orderBy("grp")
    )


@query(
    "ml_pairwise_ranking_auc",
    oracle="""
    WITH s AS (
        SELECT o_orderpriority AS grp, o_totalprice AS score,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS npos,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END)
                    AS BIGINT) AS nneg
        FROM orders GROUP BY 1, 2
    ),
    c AS (
        SELECT grp, npos, nneg,
               COALESCE(sum(nneg) OVER (PARTITION BY grp ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS negs_below
        FROM s
    ),
    per AS (
        SELECT grp,
               CAST(sum(npos) AS BIGINT) AS n_pos,
               CAST(sum(nneg) AS BIGINT) AS n_neg,
               CAST(sum(npos * (2 * negs_below + nneg)) AS BIGINT) AS u2
        FROM c GROUP BY 1
    )
    SELECT grp, n_pos, n_neg, u2,
           CAST(u2 * 1000000 // (2 * n_pos * n_neg) AS BIGINT) AS auc_ppm,
           CAST(sum(u2) OVER () * 1000000
                // sum(2 * n_pos * n_neg) OVER () AS BIGINT)
               AS micro_auc_ppm
    FROM per ORDER BY grp
    """,
    tags=("ml", "ranking", "auc", "learning-to-rank", "engine-addition"),
)
def ml_pairwise_ranking_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groupwise pairwise-ranking concordance — the learning-to-rank
    objective readout next to ml_ndcg_at_k and ml_mrr_hit_rate: per
    query group (order priority), the tie-aware probability that a
    relevant item outranks an irrelevant one (exactly ml_auc_exact's
    U statistic, PARTITIONED), plus the micro average that weights
    each group by its pair count — the quantity a pairwise loss
    actually optimizes. All integers except nothing: both AUCs are
    ppm floor divisions.

    Scale shape: per-group distinct-score histograms shuffle once on
    (grp, score); the prefix window partitions BY GROUP (no global
    window); the micro rollup is O(groups)."""
    o = load_table(spark, sf_dir, "orders")
    pos = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    s = o.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").alias("score"),
    ).agg(F.sum(pos).alias("npos"), F.sum(1 - pos).alias("nneg"))
    wc = (
        Window.partitionBy("grp")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = s.withColumn(
        "negs_below", F.coalesce(F.sum("nneg").over(wc), F.lit(0))
    )
    per = c.groupBy("grp").agg(
        F.sum("npos").cast("bigint").alias("n_pos"),
        F.sum("nneg").cast("bigint").alias("n_neg"),
        F.sum(F.col("npos") * (2 * F.col("negs_below") + F.col("nneg")))
        .cast("bigint")
        .alias("u2"),
    )
    wall = Window.partitionBy()
    return per.select(
        "grp", "n_pos", "n_neg", "u2",
        F.expr("CAST(u2 * 1000000 div (2 * n_pos * n_neg) AS BIGINT)").alias(
            "auc_ppm"
        ),
        F.expr(
            "CAST(sum(u2) OVER () * 1000000"
            " div sum(2 * n_pos * n_neg) OVER () AS BIGINT)"
        ).alias("micro_auc_ppm"),
    ).orderBy("grp")


_WOE_BIN_W = 50_000


def _woe_oracle() -> str:
    from ..functions.intlog import ln_ratio_e3_sql

    pos = ln_ratio_e3_sql("gs * bs_tot", "bs * gs_tot").replace("DIV", "//")
    neg = ln_ratio_e3_sql("bs * gs_tot", "gs * bs_tot").replace("DIV", "//")
    return f"""
    WITH bins AS (
        SELECT CAST(FLOOR(o_totalprice / {_WOE_BIN_W}.0) AS BIGINT) AS bin_id,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END)
                    AS BIGINT) AS g,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS b
        FROM orders GROUP BY 1
    ),
    sm AS (
        SELECT bin_id, g, b, g + 1 AS gs, b + 1 AS bs,
               CAST(sum(g + 1) OVER () AS BIGINT) AS gs_tot,
               CAST(sum(b + 1) OVER () AS BIGINT) AS bs_tot
        FROM bins
    ),
    woe AS (
        SELECT bin_id, g, b,
               CASE WHEN gs * bs_tot >= bs * gs_tot
                    THEN {pos} ELSE -({neg}) END AS woe_e3,
               gs * 1000000 // gs_tot - bs * 1000000 // bs_tot AS rate_gap_e6
        FROM sm
    )
    SELECT bin_id, g AS n_good, b AS n_bad,
           CAST(woe_e3 AS BIGINT) AS woe_e3,
           CAST(sum(rate_gap_e6 * woe_e3) OVER () AS BIGINT)
               AS information_value_e9
    FROM woe ORDER BY bin_id
    """


@query(
    "ml_woe_binning",
    oracle=_woe_oracle(),
    tags=("ml", "scorecard", "woe", "binning", "engine-addition"),
)
def ml_woe_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence binning + information value — the
    credit-scorecard feature transform: per price bin, WoE =
    ln((good_rate)/(bad_rate)) with +1 Laplace smoothing, computed
    via the quantized integer log (functions.intlog) with the sign
    handled by comparing the cross products gs*B vs bs*G first (the
    log helper needs ratio >= 1). IV = sum over bins of
    (good_share - bad_share) * WoE — the standard predictive-power
    screen (IV > 0.3 ~ strong) — carried as an exact integer in e9
    units on every row.

    Scale shape: one map-side-combined ~20-key aggregate; smoothing
    totals and IV are windows over the bin table."""
    from ..functions.intlog import ln_ratio_e3_sql

    o = load_table(spark, sf_dir, "orders")
    bins = o.groupBy(
        F.floor(F.col("o_totalprice") / float(_WOE_BIN_W))
        .cast("bigint")
        .alias("bin_id")
    ).agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 0).otherwise(1))
        .cast("bigint")
        .alias("g"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
    )
    wall = Window.partitionBy()
    sm = bins.select(
        "bin_id", "g", "b",
        (F.col("g") + 1).alias("gs"),
        (F.col("b") + 1).alias("bs"),
        F.sum(F.col("g") + 1).over(wall).cast("bigint").alias("gs_tot"),
        F.sum(F.col("b") + 1).over(wall).cast("bigint").alias("bs_tot"),
    )
    pos = ln_ratio_e3_sql("gs * bs_tot", "bs * gs_tot").replace("DIV", "div")
    neg = ln_ratio_e3_sql("bs * gs_tot", "gs * bs_tot").replace("DIV", "div")
    woe = sm.selectExpr(
        "bin_id", "g", "b",
        f"CASE WHEN gs * bs_tot >= bs * gs_tot THEN {pos}"
        f" ELSE -({neg}) END AS woe_e3",
        "gs * 1000000 div gs_tot - bs * 1000000 div bs_tot AS rate_gap_e6",
    )
    return woe.select(
        "bin_id",
        F.col("g").alias("n_good"),
        F.col("b").alias("n_bad"),
        F.col("woe_e3").cast("bigint").alias("woe_e3"),
        F.sum(F.expr("rate_gap_e6 * woe_e3"))
        .over(wall)
        .cast("bigint")
        .alias("information_value_e9"),
    ).orderBy("bin_id")


@query(
    "ml_mcnemar_compare",
    oracle="""
    WITH scored AS (
        SELECT CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS m1,
               CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END AS m2,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    cells AS (
        SELECT CAST(sum(CASE WHEN m1 = y AND m2 <> y THEN 1 ELSE 0 END)
                    AS BIGINT) AS b,
               CAST(sum(CASE WHEN m1 <> y AND m2 = y THEN 1 ELSE 0 END)
                    AS BIGINT) AS c,
               CAST(sum(CASE WHEN m1 = y AND m2 = y THEN 1 ELSE 0 END)
                    AS BIGINT) AS both_right,
               CAST(sum(CASE WHEN m1 <> y AND m2 <> y THEN 1 ELSE 0 END)
                    AS BIGINT) AS both_wrong
        FROM scored
    )
    SELECT b AS only_m1_right, c AS only_m2_right, both_right, both_wrong,
           CAST((b - c) * (b - c) * 1000000 // (b + c) AS BIGINT)
               AS mcnemar_chi2_e6,
           CAST(CASE WHEN (b - c) * (b - c) * 1000000 // (b + c) > 3841459
                     THEN 1 ELSE 0 END AS BIGINT) AS significant_05
    FROM cells
    """,
    tags=("ml", "evaluation", "mcnemar", "model-comparison",
          "engine-addition"),
)
def ml_mcnemar_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test — the correct way to compare two classifiers
    evaluated on the SAME rows (a two-proportion z-test double-counts
    the shared rows): only the discordant pairs matter, chi2 =
    (b-c)^2/(b+c) on exact integer counts with the single division
    floored at e6, compared against the pinned chi2(1) 5%% critical
    value 3.841459 scaled to the same e6 units — so the significance
    verdict is an integer comparison. Champion = price > 150k,
    challenger = price > 250k, both predicting order status.

    Scale shape: one conditional-aggregate scan to 4 cells; the test
    is O(1)."""
    o = load_table(spark, sf_dir, "orders")
    scored = o.selectExpr(
        "CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS m1",
        "CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END AS m2",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y",
    )
    cells = scored.agg(
        F.sum(F.expr("CASE WHEN m1 = y AND m2 <> y THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("b"),
        F.sum(F.expr("CASE WHEN m1 <> y AND m2 = y THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("c"),
        F.sum(F.expr("CASE WHEN m1 = y AND m2 = y THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("both_right"),
        F.sum(F.expr("CASE WHEN m1 <> y AND m2 <> y THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("both_wrong"),
    )
    return cells.selectExpr(
        "b AS only_m1_right", "c AS only_m2_right", "both_right", "both_wrong",
        "CAST((b - c) * (b - c) * 1000000 div (b + c) AS BIGINT)"
        " AS mcnemar_chi2_e6",
        "CAST(CASE WHEN (b - c) * (b - c) * 1000000 div (b + c) > 3841459"
        " THEN 1 ELSE 0 END AS BIGINT) AS significant_05",
    )


_SLICE_MIN_SUPPORT = 50


@query(
    "ml_worst_slice_finder",
    oracle=f"""
    WITH scored AS (
        SELECT o_orderpriority AS dim1,
               CAST(FLOOR(o_totalprice / 100000.0) AS BIGINT) AS dim2,
               CASE WHEN (o_totalprice > 150000) !=
                         (o_orderstatus = 'F') THEN 1 ELSE 0 END AS err
        FROM orders
    ),
    g AS (
        SELECT CAST(count(*) AS BIGINT) AS n_all,
               CAST(sum(err) AS BIGINT) AS err_all
        FROM scored
    ),
    slices AS (
        SELECT dim1, dim2, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(err) AS BIGINT) AS errs
        FROM scored GROUP BY 1, 2
        HAVING count(*) >= {_SLICE_MIN_SUPPORT}
    )
    SELECT s.dim1, s.dim2, s.n, s.errs,
           CAST(s.errs * 1000000 // s.n AS BIGINT) AS err_rate_ppm,
           CAST(g.err_all * 1000000 // g.n_all AS BIGINT)
               AS global_err_rate_ppm,
           CAST(s.errs * 1000000 // s.n
                - g.err_all * 1000000 // g.n_all AS BIGINT) AS gap_ppm
    FROM slices s CROSS JOIN g
    WHERE s.errs * g.n_all > g.err_all * s.n
    ORDER BY gap_ppm DESC, s.dim1, s.dim2
    LIMIT 20
    """,
    tags=("ml", "error-analysis", "slice-finder", "engine-addition"),
)
def ml_worst_slice_finder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst-slice mining — the error-analysis pass that runs after
    every eval: cross every priority with every 100k price band,
    keep slices with support >= {_SLICE_MIN_SUPPORT}, and surface the
    20 where the model's error rate most exceeds the global rate.
    The worse-than-global filter is the division-free
    cross-multiplication errs*n_all > err_all*n; rates and gaps are
    integer ppm. This is where fairness audits, data bugs, and
    distribution shift all first become visible — as a SLICE, not a
    global average.

    Scale shape: one conditional-aggregate scan to the slice
    lattice (bounded by |dim1| x |dim2|), a broadcast 1-row global
    join, TakeOrderedAndProject."""
    o = load_table(spark, sf_dir, "orders")
    scored = o.selectExpr(
        "o_orderpriority AS dim1",
        "CAST(FLOOR(o_totalprice / 100000.0) AS BIGINT) AS dim2",
        "CASE WHEN (o_totalprice > 150000) !="
        " (o_orderstatus = 'F') THEN 1 ELSE 0 END AS err",
    ).transform(materialize)  # read 2x: global + slices
    glob = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.sum("err").cast("bigint").alias("err_all"),
    )
    slices = (
        scored.groupBy("dim1", "dim2")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("err").cast("bigint").alias("errs"),
        )
        .where(F.col("n") >= _SLICE_MIN_SUPPORT)
    )
    return (
        slices.crossJoin(F.broadcast(glob))
        .where(F.expr("errs * n_all > err_all * n"))
        .selectExpr(
            "dim1", "dim2", "n", "errs",
            "CAST(errs * 1000000 div n AS BIGINT) AS err_rate_ppm",
            "CAST(err_all * 1000000 div n_all AS BIGINT)"
            " AS global_err_rate_ppm",
            "CAST(errs * 1000000 div n - err_all * 1000000 div n_all"
            " AS BIGINT) AS gap_ppm",
        )
        .orderBy(F.desc("gap_ppm"), "dim1", "dim2")
        .limit(20)
    )


@query(
    "ml_label_noise_audit",
    oracle="""
    WITH b AS (
        SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bin_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS pos
        FROM orders GROUP BY 1
    ),
    flagged AS (
        SELECT bin_id, n, pos,
               CASE WHEN 20 * pos < n THEN pos ELSE 0 END
                   AS suspect_positives,
               CASE WHEN 20 * (n - pos) < n THEN n - pos ELSE 0 END
                   AS suspect_negatives
        FROM b
    )
    SELECT bin_id, n, pos,
           CAST(suspect_positives AS BIGINT) AS suspect_positives,
           CAST(suspect_negatives AS BIGINT) AS suspect_negatives,
           CAST(sum(suspect_positives + suspect_negatives) OVER ()
                AS BIGINT) AS total_suspects,
           CAST(sum(suspect_positives + suspect_negatives) OVER () * 1000000
                // sum(n) OVER () AS BIGINT) AS suspect_rate_ppm
    FROM flagged
    ORDER BY bin_id
    """,
    tags=("ml", "data-centric", "label-noise", "engine-addition"),
)
def ml_label_noise_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit (confident-learning lite) — the data-centric
    pass that runs before blaming the model: inside each score bin,
    positives are SUSPECT when the bin's base rate is under 5%%
    (stated division-free as 20*pos < n) and negatives when it's
    over 95%% — labels that disagree with an overwhelming local
    consensus are the classic mislabel signature. EVERY bin reports
    (suspect counts included when zero): on this near-uniform
    synthetic label no local consensus exists, so a correct audit
    returns all-zero suspect columns — filtering to hits would
    return the degenerate empty frame, the exact failure mode the
    velocity-rule fix documented. All exact integers.

    Scale shape: one ~20-key conditional aggregate; flagging and the
    global rollup are O(bins)."""
    o = load_table(spark, sf_dir, "orders")
    b = o.selectExpr(
        "CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bin_id",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y",
    ).groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    flagged = b.selectExpr(
        "bin_id", "n", "pos",
        "CASE WHEN 20 * pos < n THEN pos ELSE 0 END AS suspect_positives",
        "CASE WHEN 20 * (n - pos) < n THEN n - pos ELSE 0 END"
        " AS suspect_negatives",
    )
    wall = Window.partitionBy()
    return (
        flagged.select(
            "bin_id", "n", "pos",
            F.col("suspect_positives").cast("bigint").alias(
                "suspect_positives"
            ),
            F.col("suspect_negatives").cast("bigint").alias(
                "suspect_negatives"
            ),
            F.sum(F.col("suspect_positives") + F.col("suspect_negatives"))
            .over(wall)
            .cast("bigint")
            .alias("total_suspects"),
            F.expr(
                "CAST(sum(suspect_positives + suspect_negatives) OVER ()"
                " * 1000000 div sum(n) OVER () AS BIGINT)"
            ).alias("suspect_rate_ppm"),
        )
        .orderBy("bin_id")
    )
