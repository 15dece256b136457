"""Model calibration, uncertainty quantification, sequential testing,
and privacy-mechanism operators (engine additions).

The reference dashboard surfaces point estimates (app.py:268 summary
stats); a training/serving platform additionally needs to know *how
much to trust* them: isotonic calibration (are the scores honest?),
conformal intervals (what band actually covers?), sequential tests
(can the experiment stop early?), local-DP collection (can we count
without seeing raw values?), and Shapley attribution (why did the
model say that?). Each is expressed as exact integer / staged-double
arithmetic so the DuckDB differential pins it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..data import load_table
from ..operators.scale import materialize
from ..functions.numeric import dsum, dsum_prod, dsum_prod_sql, dsum_sql
from ..registry import query

# ---------------------------------------------------------------------------
# Isotonic calibration (pool-adjacent-violators via the minimax identity)
# ---------------------------------------------------------------------------

_ISO_BIN_W = 25000  # o_totalprice in [1.3k, 500k] -> ~20 bins at every SF


@query(
    "ml_isotonic_calibration",
    oracle=f"""
    WITH bins AS (
        SELECT CAST(FLOOR(o_totalprice / {_ISO_BIN_W}.0) AS BIGINT) AS bin_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS pos
        FROM orders GROUP BY 1
    ),
    pref AS (
        SELECT bin_id, n, pos,
               CAST(SUM(n) OVER (ORDER BY bin_id) AS BIGINT) AS cn,
               CAST(SUM(pos) OVER (ORDER BY bin_id) AS BIGINT) AS cp
        FROM bins
    ),
    rng AS (
        SELECT lo.bin_id AS j, hi.bin_id AS k,
               CAST((hi.cp - (lo.cp - lo.pos)) * 1000000
                    // (hi.cn - (lo.cn - lo.n)) AS BIGINT) AS a_ppm
        FROM pref lo JOIN pref hi ON hi.bin_id >= lo.bin_id
    ),
    inner_min AS (
        SELECT b.bin_id AS i, r.j, MIN(r.a_ppm) AS mn
        FROM bins b JOIN rng r ON r.j <= b.bin_id AND r.k >= b.bin_id
        GROUP BY 1, 2
    ),
    iso AS (SELECT i, MAX(mn) AS iso_ppm FROM inner_min GROUP BY 1)
    SELECT b.bin_id, b.n, b.pos,
           CAST(b.pos * 1000000 // b.n AS BIGINT) AS raw_ppm,
           CAST(iso.iso_ppm AS BIGINT) AS iso_ppm
    FROM bins b JOIN iso ON iso.i = b.bin_id
    ORDER BY b.bin_id
    """,
    tags=("ml", "calibration", "isotonic", "engine-addition"),
)
def ml_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone) calibration of the score->probability map:
    the pool-adjacent-violators fit over the reliability-diagram bins
    of ml_calibration_bins, computed RELATIONALLY via the minimax
    identity  iso(i) = max_{j<=i} min_{k>=i} avg(pos over bins j..k).
    Because floor is monotone it commutes with min/max, so evaluating
    every range average as an exact integer-ppm floor division yields
    exactly floor_ppm of the true rational PAV solution — no float in
    any comparison, hence oracle-pairable.

    Scale shape: ONE map-side-combinable aggregate over the fact
    table reduces everything to B~20 bin rows; the O(B^3) minimax
    solve then runs on that model-sized frame (tiny windows and
    inequality joins — a driver-scale cost, kept relational so the
    whole query stays one plan). At 100 TB only the first aggregate
    grows."""
    o = load_table(spark, sf_dir, "orders")
    pos = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    # ~20-bin frame consumed three times (prefix sums, the i-list,
    # the final join): staged, or the fact aggregate re-runs per
    # consumer (r9 census x3)
    bins = materialize(
        o.groupBy(
            F.floor(F.col("o_totalprice") / float(_ISO_BIN_W))
            .cast("bigint")
            .alias("bin_id")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(pos).cast("bigint").alias("pos"),
        )
    )
    w = Window.orderBy("bin_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pref = bins.select(
        "bin_id",
        "n",
        "pos",
        F.sum("n").over(w).cast("bigint").alias("cn"),
        F.sum("pos").over(w).cast("bigint").alias("cp"),
    )
    lo = pref.select(
        F.col("bin_id").alias("j"),
        (F.col("cn") - F.col("n")).alias("nj"),
        (F.col("cp") - F.col("pos")).alias("pj"),
    )
    hi = pref.select(
        F.col("bin_id").alias("k"),
        F.col("cn").alias("nk"),
        F.col("cp").alias("pk"),
    )
    rng = lo.join(hi, F.col("k") >= F.col("j")).select(
        "j", "k", F.expr("CAST((pk - pj) * 1000000 div (nk - nj) AS BIGINT)").alias("a_ppm")
    )
    inner = (
        bins.select(F.col("bin_id").alias("i"))
        .join(rng, (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
        .groupBy("i", "j")
        .agg(F.min("a_ppm").alias("mn"))
    )
    iso = inner.groupBy("i").agg(F.max("mn").alias("iso_ppm"))
    return (
        bins.join(iso, bins.bin_id == iso.i)
        .select(
            "bin_id",
            "n",
            "pos",
            F.expr("CAST(pos * 1000000 div n AS BIGINT)").alias("raw_ppm"),
            "iso_ppm",
        )
        .orderBy("bin_id")
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction interval
# ---------------------------------------------------------------------------

@query(
    "ml_conformal_interval",
    oracle=f"""
    WITH split AS (
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
               CAST(CAST(('0x' || substring(md5('cp-' ||
                        CAST(l_orderkey AS VARCHAR) || '-' ||
                        CAST(l_linenumber AS VARCHAR)), 1, 8))
                    AS UBIGINT) % 3 AS BIGINT) AS grp
        FROM lineitem
    ),
    model AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_train,
               CAST(COUNT(*) AS DOUBLE) AS n,
               {dsum_sql("l_quantity")} AS sx,
               {dsum_sql("l_extendedprice")} AS sy,
               {dsum_prod_sql("l_quantity", "l_quantity")} AS sxx,
               {dsum_prod_sql("l_quantity", "l_extendedprice")} AS sxy
        FROM split WHERE grp = 0
    ),
    fitted AS (
        SELECT n_train,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
               (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                   AS intercept
        FROM model
    ),
    calib AS (
        SELECT s.l_orderkey, s.l_linenumber,
               abs(s.l_extendedprice
                   - (f.slope * s.l_quantity + f.intercept)) AS a
        FROM split s, fitted f WHERE s.grp = 1
    ),
    kk AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_cal,
               CAST(LEAST((9 * (COUNT(*) + 1) + 9) // 10, COUNT(*))
                    AS BIGINT) AS k
        FROM calib
    ),
    ranked AS (
        SELECT a, ROW_NUMBER() OVER (
                   ORDER BY a, l_orderkey, l_linenumber) AS rn
        FROM calib
    ),
    qrow AS (
        SELECT kk.n_cal, kk.k, r.a AS q_hat
        FROM ranked r, kk WHERE r.rn = kk.k
    ),
    test AS (
        SELECT abs(s.l_extendedprice
                   - (f.slope * s.l_quantity + f.intercept)) AS a
        FROM split s, fitted f WHERE s.grp = 2
    )
    SELECT f.n_train, q.n_cal, q.k, q.q_hat,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN t.a <= q.q_hat THEN 1 ELSE 0 END)
                AS BIGINT) AS covered,
           CAST(SUM(CASE WHEN t.a <= q.q_hat THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS coverage_ppm
    FROM test t, qrow q, fitted f
    GROUP BY f.n_train, q.n_cal, q.k, q.q_hat
    """,
    tags=("ml", "uncertainty", "conformal", "engine-addition"),
)
def ml_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval at alpha=0.1 for the
    price~quantity regression: fit on the train split, take the
    ceil((1-alpha)(n+1))-th smallest absolute residual on the
    calibration split as the interval half-width q_hat, then audit
    empirical coverage on the held-out test split — the
    distribution-free guarantee is coverage >= 90% in expectation.

    Determinism: the 3-way split is hash-gated (md5 of the row key,
    never RNG); slope/intercept come from exact decimal moments (the
    ml_linreg_closed_form construction) and every residual is staged
    through the identical double expression on both engines, so the
    order statistic — selected by (residual, key) rank — is
    bit-identical. The conformal rank k is pure integer arithmetic.

    Scale shape: moments + coverage are map-side-combined aggregates;
    the only sort is over the calibration split's residuals, and at
    100 TB that global rank-k selection would swap to the counting
    bisection of agg_median_bisect (same answer, no sort) — the
    interval math is unchanged."""
    li = load_table(spark, sf_dir, "lineitem")
    grp = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "-",
                        F.lit("cp"),
                        F.col("l_orderkey").cast("string"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 3
    )
    # the hash-split table is consumed by FIVE legs (train moments,
    # calibration residuals twice — count pass and rank pass — and
    # the test coverage audit); staged once so the base table is
    # scanned once instead of five times (VERDICT r8 #4 re-scan
    # adjudication; the split table is exactly the artifact a real
    # conformal pipeline persists)
    split = materialize(
        li.select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
            grp.alias("grp"),
        )
    )
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    model = split.filter(F.col("grp") == 0).agg(
        F.count(F.lit(1)).alias("n_train"),
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum_prod(x, x).alias("sxx"),
        dsum_prod(x, y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    fitted = materialize(
        model.select(
            "n_train",
            slope.alias("slope"),
            ((sy - slope * sx) / n).alias("intercept"),
        )
    )  # 1 row, consumed by both the calibration and test legs
    resid = F.abs(
        F.col("l_extendedprice")
        - (F.col("slope") * F.col("l_quantity") + F.col("intercept"))
    )
    calib = (
        split.filter(F.col("grp") == 1)
        .crossJoin(F.broadcast(fitted))
        .select("l_orderkey", "l_linenumber", resid.alias("a"))
    )
    kk = calib.agg(
        F.count(F.lit(1)).alias("n_cal"),
        F.least(
            F.expr("(9 * (count(1) + 1) + 9) div 10"), F.count(F.lit(1))
        )
        .cast("bigint")
        .alias("k"),
    )
    rn = F.row_number().over(
        Window.orderBy("a", "l_orderkey", "l_linenumber")
    )
    ranked = calib.select("a", rn.alias("rn"))
    qrow = (
        ranked.crossJoin(F.broadcast(kk))
        .filter(F.col("rn") == F.col("k"))
        .select("n_cal", "k", F.col("a").alias("q_hat"))
    )
    test = (
        split.filter(F.col("grp") == 2)
        .crossJoin(F.broadcast(fitted.select("n_train", "slope", "intercept")))
        .select(F.col("n_train"), resid.alias("a"))
    )
    covered = F.sum(F.when(F.col("a") <= F.col("q_hat"), 1).otherwise(0))
    return (
        test.crossJoin(F.broadcast(qrow))
        .groupBy("n_train", "n_cal", "k", "q_hat")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            covered.cast("bigint").alias("covered"),
        )
        .select(
            "n_train", "n_cal", "k", "q_hat", "n_test", "covered",
            F.expr("CAST(covered * 1000000 div n_test AS BIGINT)").alias(
                "coverage_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Sequential probability ratio test (anytime-valid experimentation)
# ---------------------------------------------------------------------------

# H0: p = 0.20 vs H1: p = 0.25, alpha = beta = 0.05. The only floats
# are these pinned literals — the LLR at step n is reconstructed from
# integer cumulative counts as s*C1 + (n-s)*C0, never accumulated in
# float, so it is identical on every engine / partitioning / replay.
_SPRT_C1 = 0.22314355131420976  # ln(0.25/0.20)
_SPRT_C0 = -0.06453852113757118  # ln(0.75/0.80)
_SPRT_A = 2.9444389791664403  # ln((1-beta)/alpha) = ln(19)
_SPRT_B = -2.9444389791664403  # ln(beta/(1-alpha))


@query(
    "ab_sprt_sequential",
    oracle=f"""
    WITH ordered AS (
        SELECT ts, event_id,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    OVER (ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s,
               CAST(ROW_NUMBER() OVER (ORDER BY ts, event_id)
                    AS BIGINT) AS n
        FROM events
    ),
    flagged AS (
        SELECT n, s,
               CAST(s AS DOUBLE) * {_SPRT_C1!r}
                 + CAST(n - s AS DOUBLE) * {_SPRT_C0!r} AS llr
        FROM ordered
    ),
    dec AS (
        SELECT n AS n_seen, s AS s_seen, llr,
               CASE WHEN llr >= {_SPRT_A!r} THEN 'reject_h0'
                    ELSE 'accept_h0' END AS decision
        FROM flagged
        WHERE llr >= {_SPRT_A!r} OR llr <= {_SPRT_B!r}
        ORDER BY n_seen LIMIT 1
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS s_total
        FROM events
    )
    SELECT d.decision, d.n_seen, d.s_seen, d.llr, t.n_total, t.s_total
    FROM dec d, tot t
    """,
    tags=("experimentation", "sequential", "sprt", "engine-addition"),
)
def ab_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test over the event stream
    (H0: purchase rate 0.20 vs H1: 0.25, alpha=beta=0.05): the
    anytime-valid early-stopping rule — report the FIRST point in
    (ts, event_id) order where the log-likelihood ratio leaves
    (ln(1/19), ln 19), with the decision and the stream totals.

    Exactness: LLR_n is a linear function of the integer cumulative
    success count, so it is rebuilt per row from (s, n) with two
    pinned 17-digit literals — no float accumulation, no drift. The
    crossing row is then a pure double-vs-literal comparison plus a
    deterministic top-1.

    Scale shape: the cumulative counts use the two-level prefix-sum
    (per-hour bucket totals, exclusive running sum over the ~O(hours)
    bucket frame, in-bucket window) — no single-partition global
    window; the crossing is TakeOrderedAndProject(1), never a full
    sort."""
    e = load_table(spark, sf_dir, "events")
    succ = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    rows = e.select(
        "ts", "event_id", succ.alias("s01"),
        F.date_trunc("hour", F.col("ts")).alias("bkt"),
    )
    perb = rows.groupBy("bkt").agg(
        F.count(F.lit(1)).alias("n_b"), F.sum("s01").alias("s_b")
    )
    wb = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cums = perb.select(
        "bkt",
        (F.sum("n_b").over(wb) - F.col("n_b")).alias("base_n"),
        (F.sum("s_b").over(wb) - F.col("s_b")).alias("base_s"),
    )
    win = Window.partitionBy("bkt").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    seq = rows.join(F.broadcast(cums), "bkt").select(
        "ts",
        "event_id",
        (F.col("base_n") + F.count(F.lit(1)).over(win)).cast("bigint").alias("n"),
        (F.col("base_s") + F.sum("s01").over(win)).cast("bigint").alias("s"),
    )
    llr = (
        F.col("s").cast("double") * F.lit(_SPRT_C1)
        + (F.col("n") - F.col("s")).cast("double") * F.lit(_SPRT_C0)
    )
    flagged = seq.select(
        "ts", "event_id",
        F.col("n").alias("n_seen"),
        F.col("s").alias("s_seen"),
        llr.alias("llr"),
    ).filter((F.col("llr") >= _SPRT_A) | (F.col("llr") <= _SPRT_B))
    first = (
        flagged.orderBy("n_seen")
        .limit(1)
        .select(
            F.when(F.col("llr") >= _SPRT_A, "reject_h0")
            .otherwise("accept_h0")
            .alias("decision"),
            "n_seen", "s_seen", "llr",
        )
    )
    tot = e.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(succ).cast("bigint").alias("s_total"),
    )
    return first.crossJoin(F.broadcast(tot))


# ---------------------------------------------------------------------------
# Local differential privacy: generalized randomized response
# ---------------------------------------------------------------------------

_RR_CATS = ("click", "error", "purchase", "signup", "view")  # pinned, k=5
_RR_CASE_IDX = (
    "CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1 "
    "WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 WHEN 'view' THEN 4 END"
)
_RR_CASE_NAME = (
    "CASE cat_idx WHEN 0 THEN 'click' WHEN 1 THEN 'error' "
    "WHEN 2 THEN 'purchase' WHEN 3 THEN 'signup' WHEN 4 THEN 'view' END"
)


@query(
    "privacy_randomized_response",
    oracle=f"""
    WITH base AS (
        SELECT {_RR_CASE_IDX} AS idx,
               CAST(CAST(('0x' || substring(md5('rr1-' ||
                        CAST(event_id AS VARCHAR)), 1, 8))
                    AS UBIGINT) % 1048576 AS BIGINT) AS u1,
               CAST(CAST(('0x' || substring(md5('rr2-' ||
                        CAST(event_id AS VARCHAR)), 1, 8))
                    AS UBIGINT) % 4 AS BIGINT) AS u2
        FROM events
        WHERE event_type IN ('click','error','purchase','signup','view')
    ),
    coded AS (
        SELECT idx,
               CASE WHEN u1 < 786432 THEN idx
                    ELSE (idx + 1 + u2) % 5 END AS rep_idx
        FROM base
    ),
    truec AS (SELECT idx AS cat_idx, CAST(COUNT(*) AS BIGINT) AS true_n
              FROM coded GROUP BY 1),
    obsc AS (SELECT rep_idx AS cat_idx, CAST(COUNT(*) AS BIGINT) AS obs_n
             FROM coded GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM coded)
    SELECT t.cat_idx, {_RR_CASE_NAME.replace("cat_idx", "t.cat_idx")} AS category,
           t.true_n, o.obs_n,
           16 * o.obs_n - x.n_all AS est_num,
           CAST(16 * o.obs_n - x.n_all AS DOUBLE) / 11.0 AS estimate,
           (16 * o.obs_n - x.n_all) - 11 * t.true_n AS bias_x11
    FROM truec t JOIN obsc o ON o.cat_idx = t.cat_idx, tot x
    ORDER BY t.cat_idx
    """,
    tags=("privacy", "differential-privacy", "randomized-response",
          "engine-addition"),
)
def privacy_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-DP frequency estimation by generalized randomized
    response over the pinned k=5 event-type alphabet: each report
    keeps the true category with p=3/4, else one of the other four
    uniformly (q=1/16) — epsilon = ln(p/q) = ln 12. The debiased
    estimate (obs - n*q)/(p - q) reduces to the exact integer
    numerator 16*obs - n over the constant denominator 11, so the
    estimator, its single-division float rendering, and the
    per-category residual vs the true count (bias_x11, an exact
    integer) are all oracle-pairable. Sum of est_num over categories
    is identically 11*n — the mass-conservation invariant the test
    suite asserts.

    The coin flips are hash-gated (md5 of the event id with two
    domain-separated salts), which is what a real LDP client does
    with a PRG — and what makes the whole mechanism replayable.

    Scale shape: one narrow projection, two k-key aggregates, a
    broadcast total; nothing grows with data but the first scan."""
    e = load_table(spark, sf_dir, "events")
    base = e.filter(F.col("event_type").isin(*_RR_CATS)).select(
        F.expr(_RR_CASE_IDX).cast("bigint").alias("idx"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("rr1-"), F.col("event_id").cast("string"))),
                    1, 8,
                ), 16, 10,
            ).cast("long") % 1048576
        ).alias("u1"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("rr2-"), F.col("event_id").cast("string"))),
                    1, 8,
                ), 16, 10,
            ).cast("long") % 4
        ).alias("u2"),
    )
    coded = base.select(
        "idx",
        F.when(F.col("u1") < 786432, F.col("idx"))
        .otherwise((F.col("idx") + 1 + F.col("u2")) % 5)
        .alias("rep_idx"),
    )
    truec = coded.groupBy(F.col("idx").alias("cat_idx")).agg(
        F.count(F.lit(1)).alias("true_n")
    )
    obsc = coded.groupBy(F.col("rep_idx").alias("cat_idx")).agg(
        F.count(F.lit(1)).alias("obs_n")
    )
    tot = coded.agg(F.count(F.lit(1)).alias("n_all"))
    est_num = 16 * F.col("obs_n") - F.col("n_all")
    return (
        truec.join(obsc, "cat_idx")
        .crossJoin(F.broadcast(tot))
        .select(
            "cat_idx",
            F.expr(_RR_CASE_NAME).alias("category"),
            "true_n",
            "obs_n",
            est_num.alias("est_num"),
            (est_num.cast("double") / 11.0).alias("estimate"),
            (est_num - 11 * F.col("true_n")).alias("bias_x11"),
        )
        .orderBy("cat_idx")
    )


# ---------------------------------------------------------------------------
# Exact Shapley attribution for a two-feature lookup model
# ---------------------------------------------------------------------------


@query(
    "ml_shapley_two_features",
    oracle=f"""
    WITH g AS (
        SELECT {dsum_sql("l_extendedprice")} / COUNT(*) AS m0 FROM lineitem
    ),
    g1 AS (
        SELECT l_returnflag,
               {dsum_sql("l_extendedprice")} / COUNT(*) AS m1
        FROM lineitem GROUP BY 1
    ),
    g2 AS (
        SELECT l_linestatus,
               {dsum_sql("l_extendedprice")} / COUNT(*) AS m2
        FROM lineitem GROUP BY 1
    ),
    g12 AS (
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               {dsum_sql("l_extendedprice")} / COUNT(*) AS m12
        FROM lineitem GROUP BY 1, 2
    )
    SELECT c.l_returnflag, c.l_linestatus, c.n, c.m12 AS cell_mean,
           ((c.m12 - b.m2) + (a.m1 - g.m0)) / 2.0 AS phi_returnflag,
           ((c.m12 - a.m1) + (b.m2 - g.m0)) / 2.0 AS phi_linestatus,
           c.m12 - g.m0 AS lift
    FROM g12 c
    JOIN g1 a ON a.l_returnflag = c.l_returnflag
    JOIN g2 b ON b.l_linestatus = c.l_linestatus, g
    ORDER BY c.l_returnflag, c.l_linestatus
    """,
    tags=("ml", "explanation", "shapley", "engine-addition"),
)
def ml_shapley_two_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley values for a two-feature conditional-mean model
    f(returnflag, linestatus) = E[price | cell]: with two players the
    Shapley sum has just two orderings, so
    phi_1 = ((m12 - m2) + (m1 - m0)) / 2 exactly — per cell, the
    model-explanation readout (which feature moved this prediction,
    and by how much) with the efficiency property
    phi_1 + phi_2 = f(cell) - E[y] holding by construction.

    Exactness: all four conditional means are decimal-exact sums over
    counts; the Shapley combination is staged through the identical
    double expression on both engines.

    Scale shape: ONE map-side-combined aggregate builds the staged
    cell table; the grand mean and both marginal means roll up from
    the cells (exact — decimal sums are associative), then broadcast
    joins of model-sized frames. At 100 TB the cost is one pass, and
    the fact table is scanned exactly once (r9: was four scans)."""
    li = load_table(spark, sf_dir, "lineitem")
    y = F.col("l_extendedprice")
    # ONE scan builds the cell table with exact decimal sums; the
    # grand and per-feature means are rollups OF THE CELLS (decimal
    # sums are associative, so sum-of-cell-sums == direct sum and the
    # final double cast lands on identical bits) — the first cut
    # aggregated the fact table four separate times (r9 census x3)
    g12c = materialize(
        li.groupBy("l_returnflag", "l_linestatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(y.cast("decimal(18,6)")).alias("s"),
        )
    )
    g = g12c.agg(
        (F.sum("s").cast("double") / F.sum("n")).alias("m0")
    )
    g1 = g12c.groupBy("l_returnflag").agg(
        (F.sum("s").cast("double") / F.sum("n")).alias("m1")
    )
    g2 = g12c.groupBy("l_linestatus").agg(
        (F.sum("s").cast("double") / F.sum("n")).alias("m2")
    )
    g12 = g12c.select(
        "l_returnflag",
        "l_linestatus",
        "n",
        (F.col("s").cast("double") / F.col("n")).alias("m12"),
    )
    m0, m1, m2, m12 = F.col("m0"), F.col("m1"), F.col("m2"), F.col("m12")
    return (
        g12.join(F.broadcast(g1), "l_returnflag")
        .join(F.broadcast(g2), "l_linestatus")
        .crossJoin(F.broadcast(g))
        .select(
            "l_returnflag",
            "l_linestatus",
            "n",
            m12.alias("cell_mean"),
            (((m12 - m2) + (m1 - m0)) / 2.0).alias("phi_returnflag"),
            (((m12 - m1) + (m2 - m0)) / 2.0).alias("phi_linestatus"),
            (m12 - m0).alias("lift"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Learning curve (scaling-law readout) over nested hash subsets
# ---------------------------------------------------------------------------

_LC_FRACS = (10, 25, 50, 100)


@query(
    "ml_learning_curve",
    oracle=f"""
    WITH keyed AS (
        SELECT l_returnflag,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS y_cents,
               CAST(CAST(('0x' || substring(md5('lc-t-' ||
                        CAST(l_orderkey AS VARCHAR) || '-' ||
                        CAST(l_linenumber AS VARCHAR)), 1, 8))
                    AS UBIGINT) % 5 AS BIGINT) AS u_t,
               CAST(CAST(('0x' || substring(md5('lc-b-' ||
                        CAST(l_orderkey AS VARCHAR) || '-' ||
                        CAST(l_linenumber AS VARCHAR)), 1, 8))
                    AS UBIGINT) % 100 AS BIGINT) AS b
        FROM lineitem
    ),
    partials AS (
        SELECT l_returnflag, b,
               CAST(SUM(y_cents) AS BIGINT) AS s_cents,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM keyed WHERE u_t <> 0 GROUP BY 1, 2
    ),
    models AS (
        SELECT f.frac, p.l_returnflag,
               CAST(SUM(p.s_cents) // SUM(p.cnt) AS BIGINT) AS pred_cents,
               CAST(SUM(p.cnt) AS BIGINT) AS n_train_g
        FROM partials p JOIN (VALUES (10),(25),(50),(100)) AS f(frac)
             ON p.b < f.frac
        GROUP BY 1, 2
    ),
    test AS (
        SELECT l_returnflag, y_cents FROM keyed WHERE u_t = 0
    )
    SELECT m.frac,
           CAST(MIN(tr.n_train) AS BIGINT) AS n_train,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(ABS(t.y_cents - m.pred_cents)) * 1000
                // COUNT(*) AS BIGINT) AS mae_milli_cents
    FROM test t
    JOIN models m ON m.l_returnflag = t.l_returnflag
    JOIN (SELECT frac, CAST(SUM(n_train_g) AS BIGINT) AS n_train
          FROM models GROUP BY 1) tr ON tr.frac = m.frac
    GROUP BY m.frac
    ORDER BY m.frac
    """,
    tags=("ml", "learning-curve", "scaling-law", "engine-addition"),
)
def ml_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learning curve / scaling-law readout: train the per-returnflag
    mean-price predictor on NESTED 10/25/50/100% subsets of the train
    pool and report exact-integer MAE (milli-cents) on one fixed
    held-out test split — does more data help, and how fast does the
    error fall? Nesting comes free from hash bucketing (b < frac), so
    each curve point trains on a superset of the previous one, the
    property a real data-scaling study needs.

    Exactness: prices enter as exact integer cents; each model's
    prediction is an integer floor division; MAE is an integer sum
    over the test split with one final floor-ppm-style division —
    no float anywhere, so all four curve points hash-match DuckDB.

    Scale shape: ONE scan builds (flag, bucket) partials (400 rows);
    models for every fraction are rollups of those partials — the
    fact table is never re-read per curve point. Evaluation is one
    broadcast join (12 model rows) over the test split."""
    li = load_table(spark, sf_dir, "lineitem")

    def h(salt: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt),
                        F.col("l_orderkey").cast("string"),
                        F.lit("-"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                1, 8,
            ), 16, 10,
        ).cast("long")

    keyed = li.select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("y_cents"),
        (h("lc-t-") % 5).alias("u_t"),
        (h("lc-b-") % 100).alias("b"),
    )
    partials = (
        keyed.filter(F.col("u_t") != 0)
        .groupBy("l_returnflag", "b")
        .agg(
            F.sum("y_cents").cast("bigint").alias("s_cents"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    fracs = spark.createDataFrame([(f,) for f in _LC_FRACS], "frac int")
    # staged (r10 shuffle sweep): models (12 rows) feeds the eval
    # broadcast AND the per-frac rollup — unstaged, the whole
    # partials+models pipeline (a lineitem scan included) ran twice
    models = materialize(
        partials.join(F.broadcast(fracs), F.col("b") < F.col("frac"))
        .groupBy("frac", "l_returnflag")
        .agg(
            F.expr("CAST(sum(s_cents) div sum(cnt) AS BIGINT)").alias(
                "pred_cents"
            ),
            F.sum("cnt").cast("bigint").alias("n_train_g"),
        )
    )
    per_frac = models.groupBy("frac").agg(
        F.sum("n_train_g").cast("bigint").alias("n_train")
    )
    test = keyed.filter(F.col("u_t") == 0).select("l_returnflag", "y_cents")
    return (
        test.join(F.broadcast(models), "l_returnflag")
        .join(F.broadcast(per_frac), "frac")
        .groupBy("frac")
        .agg(
            F.min("n_train").alias("n_train"),
            F.count(F.lit(1)).alias("n_test"),
            F.expr(
                "CAST(sum(abs(y_cents - pred_cents)) * 1000 div count(1)"
                " AS BIGINT)"
            ).alias("mae_milli_cents"),
        )
        .orderBy("frac")
    )


# ---------------------------------------------------------------------------
# Naive Bayes apply: exact integer argmax scoring (train -> decide loop)
# ---------------------------------------------------------------------------

_NB_CMP = (
    "(({na} + 1) * ({af} + 1) * ({bf} + 1)) * (({nb} + 5) * ({nb} + 7))"
    " - (({nb} + 1) * ({ag} + 1) * ({bg} + 1)) * (({na} + 5) * ({na} + 7))"
)


@query(
    "ml_naive_bayes_apply",
    oracle="""
    WITH feat AS (
        SELECT o_orderstatus AS c, o_orderpriority AS f1,
               CAST(date_part('dow', o_orderdate) AS BIGINT) AS f2
        FROM orders
    ),
    nc AS (
        SELECT CAST(SUM(CASE WHEN c = 'F' THEN 1 ELSE 0 END) AS HUGEINT) AS ncF,
               CAST(SUM(CASE WHEN c = 'O' THEN 1 ELSE 0 END) AS HUGEINT) AS ncO,
               CAST(SUM(CASE WHEN c = 'P' THEN 1 ELSE 0 END) AS HUGEINT) AS ncP
        FROM feat
    ),
    a AS (
        SELECT f1,
               CAST(SUM(CASE WHEN c = 'F' THEN 1 ELSE 0 END) AS HUGEINT) AS aF,
               CAST(SUM(CASE WHEN c = 'O' THEN 1 ELSE 0 END) AS HUGEINT) AS aO,
               CAST(SUM(CASE WHEN c = 'P' THEN 1 ELSE 0 END) AS HUGEINT) AS aP
        FROM feat GROUP BY 1
    ),
    b AS (
        SELECT f2,
               CAST(SUM(CASE WHEN c = 'F' THEN 1 ELSE 0 END) AS HUGEINT) AS bF,
               CAST(SUM(CASE WHEN c = 'O' THEN 1 ELSE 0 END) AS HUGEINT) AS bO,
               CAST(SUM(CASE WHEN c = 'P' THEN 1 ELSE 0 END) AS HUGEINT) AS bP
        FROM feat GROUP BY 1
    ),
    cells AS (
        SELECT f1, f2, CAST(COUNT(*) AS BIGINT) AS n_cell,
               CAST(SUM(CASE WHEN c = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS cF,
               CAST(SUM(CASE WHEN c = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS cO,
               CAST(SUM(CASE WHEN c = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS cP
        FROM feat GROUP BY 1, 2
    ),
    scored AS (
        SELECT c.f1, c.f2, c.n_cell, c.cF, c.cO, c.cP,
               ((nc.ncF + 1) * (a.aF + 1) * (b.bF + 1))
                 * ((nc.ncO + 5) * (nc.ncO + 7))
               - ((nc.ncO + 1) * (a.aO + 1) * (b.bO + 1))
                 * ((nc.ncF + 5) * (nc.ncF + 7)) AS cmpFO,
               ((nc.ncF + 1) * (a.aF + 1) * (b.bF + 1))
                 * ((nc.ncP + 5) * (nc.ncP + 7))
               - ((nc.ncP + 1) * (a.aP + 1) * (b.bP + 1))
                 * ((nc.ncF + 5) * (nc.ncF + 7)) AS cmpFP,
               ((nc.ncO + 1) * (a.aO + 1) * (b.bO + 1))
                 * ((nc.ncP + 5) * (nc.ncP + 7))
               - ((nc.ncP + 1) * (a.aP + 1) * (b.bP + 1))
                 * ((nc.ncO + 5) * (nc.ncO + 7)) AS cmpOP
        FROM cells c
        JOIN a ON a.f1 = c.f1
        JOIN b ON b.f2 = c.f2, nc
    )
    SELECT f1, f2, n_cell,
           CASE WHEN cmpFO >= 0 AND cmpFP >= 0 THEN 'F'
                WHEN cmpOP >= 0 THEN 'O' ELSE 'P' END AS pred_class,
           CAST(CASE WHEN cmpFO >= 0 AND cmpFP >= 0 THEN cF
                     WHEN cmpOP >= 0 THEN cO ELSE cP END
                AS BIGINT) AS n_correct,
           CAST((CASE WHEN cmpFO >= 0 AND cmpFP >= 0 THEN cF
                      WHEN cmpOP >= 0 THEN cO ELSE cP END) * 1000000
                // n_cell AS BIGINT) AS acc_ppm
    FROM scored
    ORDER BY f1, f2
    """,
    tags=("ml", "naive-bayes", "classification", "engine-addition"),
)
def ml_naive_bayes_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive Bayes DECIDE step (the apply side ml_naive_bayes_train
    stops short of): smoothed class scores
    P(c)·P(priority|c)·P(weekday|c) compared via exact integer
    cross-multiplication — score ratios are rationals, so the argmax
    over the 3 order-status classes is decided by sign of
    num_a·den_b − num_b·den_a with Laplace(+1) smoothing, never by a
    float log-sum. Output is the full 35-cell decision table with
    per-cell in-sample accuracy (integer ppm).

    Spark stages the products through decimal(38,0) (exact up to
    ~1e7-row classes — past that, the standard move is log-space
    scoring, which trades the exactness this query is demonstrating);
    DuckDB uses HUGEINT. Both fit the ≤1e35 worst case here.

    Scale shape: ONE conditional-aggregate pass builds the 35-cell
    base table (staged); priors and both feature marginals are
    rollups of the cells — the fact table is scanned once, and the
    decision never touches it again (r9: was four separate scans)."""
    o = load_table(spark, sf_dir, "orders")
    feat = o.select(
        F.col("o_orderstatus").alias("c"),
        F.col("o_orderpriority").alias("f1"),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("f2"),
    )

    def cnt(cls: str) -> F.Column:
        return F.sum(F.when(F.col("c") == cls, 1).otherwise(0))

    dec = "decimal(7,0)"
    # ONE scan builds the 35-cell base table; priors (nc), per-f1 (a)
    # and per-f2 (b) marginals are rollups OF THE CELLS — the first
    # cut aggregated the fact table four separate times (the x3
    # duplicate-scan entry in the r9 census)
    cells = materialize(
        feat.groupBy("f1", "f2").agg(
            F.count(F.lit(1)).alias("n_cell"),
            cnt("F").cast("bigint").alias("cF"),
            cnt("O").cast("bigint").alias("cO"),
            cnt("P").cast("bigint").alias("cP"),
        )
    )
    nc = cells.agg(
        F.sum("cF").cast(dec).alias("ncF"),
        F.sum("cO").cast(dec).alias("ncO"),
        F.sum("cP").cast(dec).alias("ncP"),
    )
    a = cells.groupBy("f1").agg(
        F.sum("cF").cast(dec).alias("aF"),
        F.sum("cO").cast(dec).alias("aO"),
        F.sum("cP").cast(dec).alias("aP"),
    )
    b = cells.groupBy("f2").agg(
        F.sum("cF").cast(dec).alias("bF"),
        F.sum("cO").cast(dec).alias("bO"),
        F.sum("cP").cast(dec).alias("bP"),
    )

    def cmp(x: str, y: str) -> F.Column:
        return F.expr(
            _NB_CMP.format(
                na=f"nc{x}", af=f"a{x}", bf=f"b{x}",
                nb=f"nc{y}", ag=f"a{y}", bg=f"b{y}",
            )
        )

    scored = (
        cells.join(F.broadcast(a), "f1")
        .join(F.broadcast(b), "f2")
        .crossJoin(F.broadcast(nc))
        .select(
            "f1", "f2", "n_cell", "cF", "cO", "cP",
            cmp("F", "O").alias("cmpFO"),
            cmp("F", "P").alias("cmpFP"),
            cmp("O", "P").alias("cmpOP"),
        )
    )
    is_f = (F.col("cmpFO") >= 0) & (F.col("cmpFP") >= 0)
    is_o = F.col("cmpOP") >= 0
    n_correct = (
        F.when(is_f, F.col("cF"))
        .when(is_o, F.col("cO"))
        .otherwise(F.col("cP"))
    )
    return (
        scored.select(
            "f1", "f2", "n_cell",
            F.when(is_f, "F").when(is_o, "O").otherwise("P").alias(
                "pred_class"
            ),
            n_correct.cast("bigint").alias("n_correct"),
            (n_correct * 1000000)
            .cast("bigint")
            .alias("_num"),
        )
        .select(
            "f1", "f2", "n_cell", "pred_class", "n_correct",
            F.expr("CAST(_num div n_cell AS BIGINT)").alias("acc_ppm"),
        )
        .orderBy("f1", "f2")
    )


# ---------------------------------------------------------------------------
# Expected calibration error (the scalar on top of the reliability bins)
# ---------------------------------------------------------------------------

_ECE_BIN_W = 25000
_ECE_SCALE_C = 50_000_000  # full score scale (500k) in cents


@query(
    "ml_expected_calibration_error",
    oracle=f"""
    WITH bins AS (
        SELECT CAST(FLOOR(o_totalprice / {_ECE_BIN_W}.0) AS BIGINT)
                   AS bin_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS pos,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS sum_c
        FROM orders GROUP BY 1
    ),
    gaps AS (
        SELECT n,
               ABS(pos * 1000000 // n
                   - sum_c * 1000000 // (CAST({_ECE_SCALE_C} AS BIGINT) * n))
                   AS gap_ppm
        FROM bins
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(SUM(n * gap_ppm) // SUM(n) AS BIGINT) AS ece_ppm,
           CAST(MAX(gap_ppm) AS BIGINT) AS mce_ppm
    FROM gaps
    """,
    tags=("ml", "calibration", "ece", "engine-addition"),
)
def ml_expected_calibration_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error — the single number on top of
    ml_calibration_bins / ml_isotonic_calibration: the row-weighted
    mean (and max, MCE) absolute gap between each bin's predicted
    confidence (mean score, normalized to [0,1]) and its observed
    positive rate. The model-monitoring scalar that goes on the
    dashboard while the reliability diagram goes in the postmortem.

    Exactness: scores enter as integer cents; both the confidence
    and accuracy of a bin become integer-ppm floor divisions (the
    confidence normalizer is the fixed score scale in cents), so
    every gap, the weighted mean, and the max are exact integers.

    Scale shape: one map-side-combined ~20-key aggregate, then O(bins)
    arithmetic — unchanged at any corpus size."""
    o = load_table(spark, sf_dir, "orders")
    pos = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    bins = o.groupBy(
        F.floor(F.col("o_totalprice") / float(_ECE_BIN_W))
        .cast("bigint")
        .alias("bin_id")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(pos).cast("bigint").alias("pos"),
        F.sum(cents).cast("bigint").alias("sum_c"),
    )
    gaps = bins.selectExpr(
        "n",
        f"ABS(pos * 1000000 div n"
        f" - sum_c * 1000000 div (CAST({_ECE_SCALE_C} AS BIGINT) * n))"
        " AS gap_ppm",
    )
    return gaps.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.expr("CAST(sum(n * gap_ppm) div sum(n) AS BIGINT)").alias(
            "ece_ppm"
        ),
        F.max("gap_ppm").cast("bigint").alias("mce_ppm"),
    )


# ---------------------------------------------------------------------------
# DeLong variance of the exact AUC (the error bar on ml_auc_exact)
# ---------------------------------------------------------------------------


@query(
    "ml_auc_delong_variance",
    oracle="""
    WITH s AS (
        SELECT o_totalprice AS score,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS HUGEINT) AS npos,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END)
                    AS HUGEINT) AS nneg
        FROM orders GROUP BY o_totalprice
    ),
    c AS (
        SELECT npos, nneg,
               COALESCE(sum(nneg) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS negs_below,
               COALESCE(sum(npos) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS pos_below,
               sum(npos) OVER () AS n_pos, sum(nneg) OVER () AS n_neg
        FROM s
    ),
    w AS (
        SELECT npos, nneg, n_pos, n_neg,
               2 * negs_below + nneg AS w10,
               2 * (n_pos - pos_below - npos) + npos AS w01
        FROM c
    ),
    t AS (
        SELECT CAST(max(n_pos) AS HUGEINT) AS n_pos,
               CAST(max(n_neg) AS HUGEINT) AS n_neg,
               sum(npos * w10) AS sw10, sum(npos * w10 * w10) AS sw10_2,
               sum(nneg * w01) AS sw01, sum(nneg * w01 * w01) AS sw01_2
        FROM w
    )
    SELECT CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_neg AS BIGINT) AS n_neg,
           CAST(sw10 AS BIGINT) AS u2,
           CAST(sw10 * 1000000 // (2 * n_pos * n_neg) AS BIGINT) AS auc_ppm,
           CAST((n_pos * sw10_2 - sw10 * sw10) * 1000000000000
                // ((n_pos - 1) * n_pos * 4 * n_neg * n_neg * n_pos)
                AS BIGINT) AS var10_e12,
           CAST((n_neg * sw01_2 - sw01 * sw01) * 1000000000000
                // ((n_neg - 1) * n_neg * 4 * n_pos * n_pos * n_neg)
                AS BIGINT) AS var01_e12,
           CAST((n_pos * sw10_2 - sw10 * sw10) * 1000000000000
                // ((n_pos - 1) * n_pos * 4 * n_neg * n_neg * n_pos)
              + (n_neg * sw01_2 - sw01 * sw01) * 1000000000000
                // ((n_neg - 1) * n_neg * 4 * n_pos * n_pos * n_neg)
                AS BIGINT) AS var_auc_e12
    FROM t
    """,
    tags=("ml", "evaluation", "auc", "delong", "engine-addition"),
)
def ml_auc_delong_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeLong (1988) variance of the exact tie-aware AUC — the error
    bar ml_auc_exact doesn't have. Per distinct score, the structural
    components are tracked in half-units so ties stay integral:
    w10 = 2*negs_below + nneg (per positive), w01 = 2*pos_above +
    npos (per negative); AUC = sum(npos*w10)/(2*n_pos*n_neg), and
    var(AUC) = s10^2/n_pos + s01^2/n_neg with each sample variance
    computed from the exact integer identity n*sum(w^2) - sum(w)^2.
    Everything through the final scaled floor divisions is
    decimal(38,0)/HUGEINT; outputs are AUC in ppm and variances
    scaled 1e12.

    Scale shape: same as ml_auc_exact — the distinct-score table is
    range-partitioned and BOTH running sums (negatives below,
    positives below) come from per-partition windows plus a
    P-element driver-side offset cumsum, so no global single-
    partition window exists; the variance needs only 4 more
    map-side-combinable aggregates on the same pass."""
    from .ml import AUC_RANGE_PARTITIONS

    o = load_table(spark, sf_dir, "orders")
    pos = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    s = (
        o.groupBy(F.col("o_totalprice").alias("score"))
        .agg(F.sum(pos).alias("npos"), F.sum(1 - pos).alias("nneg"))
        .repartitionByRange(AUC_RANGE_PARTITIONS, "score")
        .withColumn("pid", F.spark_partition_id())
        .transform(materialize)  # pin (score -> pid) across reads
    )
    per_part = {
        r["pid"]: (int(r["tn"]), int(r["tp"]))
        for r in s.groupBy("pid")
        .agg(F.sum("nneg").alias("tn"), F.sum("npos").alias("tp"))
        .collect()
    }
    offsets, run_n, run_p = [], 0, 0
    for pid in range(AUC_RANGE_PARTITIONS):
        tn, tp = per_part.get(pid, (0, 0))
        offsets.append((pid, run_n, run_p))
        run_n += tn
        run_p += tp
    off = spark.createDataFrame(offsets, "pid int, off_n long, off_p long")
    wc = (
        Window.partitionBy("pid")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d38 = "decimal(38,0)"
    c = (
        s.join(F.broadcast(off), "pid")
        .withColumn(
            "negs_below",
            F.coalesce(F.sum("nneg").over(wc), F.lit(0)) + F.col("off_n"),
        )
        .withColumn(
            "pos_below",
            F.coalesce(F.sum("npos").over(wc), F.lit(0)) + F.col("off_p"),
        )
        .withColumn("n_pos_t", F.lit(run_p))
        .withColumn("n_neg_t", F.lit(run_n))
    )
    w = c.selectExpr(
        f"CAST(npos AS {d38}) AS npos",
        f"CAST(nneg AS {d38}) AS nneg",
        f"CAST(n_pos_t AS {d38}) AS n_pos",
        f"CAST(n_neg_t AS {d38}) AS n_neg",
        f"CAST(2 * negs_below + nneg AS {d38}) AS w10",
        f"CAST(2 * (n_pos_t - pos_below - npos) + npos AS {d38}) AS w01",
    )
    t = w.agg(
        F.expr(f"CAST(max(n_pos) AS {d38})").alias("n_pos"),
        F.expr(f"CAST(max(n_neg) AS {d38})").alias("n_neg"),
        F.expr("sum(npos * w10)").alias("sw10"),
        F.expr("sum(npos * w10 * w10)").alias("sw10_2"),
        F.expr("sum(nneg * w01)").alias("sw01"),
        F.expr("sum(nneg * w01 * w01)").alias("sw01_2"),
    )
    return t.selectExpr(
        "CAST(n_pos AS BIGINT) AS n_pos",
        "CAST(n_neg AS BIGINT) AS n_neg",
        "CAST(sw10 AS BIGINT) AS u2",
        "CAST(sw10 * 1000000 div (2 * n_pos * n_neg) AS BIGINT) AS auc_ppm",
        "CAST((n_pos * sw10_2 - sw10 * sw10) * 1000000000000"
        " div ((n_pos - 1) * n_pos * 4 * n_neg * n_neg * n_pos)"
        " AS BIGINT) AS var10_e12",
        "CAST((n_neg * sw01_2 - sw01 * sw01) * 1000000000000"
        " div ((n_neg - 1) * n_neg * 4 * n_pos * n_pos * n_neg)"
        " AS BIGINT) AS var01_e12",
        "CAST((n_pos * sw10_2 - sw10 * sw10) * 1000000000000"
        " div ((n_pos - 1) * n_pos * 4 * n_neg * n_neg * n_pos)"
        " + (n_neg * sw01_2 - sw01 * sw01) * 1000000000000"
        " div ((n_neg - 1) * n_neg * 4 * n_pos * n_pos * n_neg)"
        " AS BIGINT) AS var_auc_e12",
    )


# ---------------------------------------------------------------------------
# Uplift evaluation (Qini-style cumulative uplift by score decile)
# ---------------------------------------------------------------------------


@query(
    "ml_uplift_qini",
    oracle="""
    WITH base AS (
        SELECT CAST(CAST(('0x' || substring(md5('t-' ||
                      CAST(o_orderkey AS VARCHAR)), 1, 8)) AS UBIGINT) % 2
                    AS BIGINT) AS treat,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
               ntile(10) OVER (ORDER BY o_totalprice DESC, o_orderkey)
                   AS decile
        FROM orders
    ),
    per AS (
        SELECT decile,
               CAST(sum(treat) AS BIGINT) AS n_t,
               CAST(sum(treat * y) AS BIGINT) AS pos_t,
               CAST(sum(1 - treat) AS BIGINT) AS n_c,
               CAST(sum((1 - treat) * y) AS BIGINT) AS pos_c
        FROM base GROUP BY 1
    ),
    cum AS (
        SELECT decile,
               sum(n_t) OVER w AS cn_t, sum(pos_t) OVER w AS cpos_t,
               sum(n_c) OVER w AS cn_c, sum(pos_c) OVER w AS cpos_c
        FROM per
        WINDOW w AS (ORDER BY decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(cn_t AS BIGINT) AS cn_t, CAST(cpos_t AS BIGINT) AS cpos_t,
           CAST(cn_c AS BIGINT) AS cn_c, CAST(cpos_c AS BIGINT) AS cpos_c,
           CAST(cpos_t * cn_c - cpos_c * cn_t AS BIGINT) AS qini_x,
           CAST(CASE WHEN cpos_t * cn_c - cpos_c * cn_t < 0 THEN -1
                     ELSE 1 END
                * (abs(cpos_t * cn_c - cpos_c * cn_t) * 1000000
                   // (cn_t * cn_c)) AS BIGINT) AS uplift_cum_ppm
    FROM cum ORDER BY decile
    """,
    tags=("ml", "uplift", "causal", "evaluation", "engine-addition"),
)
def ml_uplift_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini-style uplift curve — the causal-inference evaluation a
    targeting model ships with: units ranked by model score
    (o_totalprice, pinned ties by key) into deciles, treatment
    assigned by a deterministic hash bit, and the CUMULATIVE
    treated-vs-control response gap reported per decile. qini_x =
    cpos_t*cn_c - cpos_c*cn_t is the exact integer Qini numerator
    (treated responders minus control responders rescaled to the
    treated denominator); uplift_cum_ppm is the rate difference in
    integer ppm. A random-score model flatlines; mass in early
    deciles is targeting skill.

    Scale shape: ntile needs a total order — at scale this is the
    range-partitioned two-pass rank (pipeline_global_rank); here the
    decile table after aggregation is 10 rows, so the cumulative
    window is model-sized. One data shuffle total."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("t-"), F.col("o_orderkey").cast("string"))),
                    1, 8,
                ), 16, 10,
            ).cast("long") % 2
        ).alias("treat"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        F.ntile(10)
        .over(Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")))
        .alias("decile"),
    )
    per = base.groupBy("decile").agg(
        F.sum("treat").cast("bigint").alias("n_t"),
        F.sum(F.col("treat") * F.col("y")).cast("bigint").alias("pos_t"),
        F.sum(1 - F.col("treat")).cast("bigint").alias("n_c"),
        F.sum((1 - F.col("treat")) * F.col("y")).cast("bigint").alias("pos_c"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "decile",
        F.sum("n_t").over(wc).alias("cn_t"),
        F.sum("pos_t").over(wc).alias("cpos_t"),
        F.sum("n_c").over(wc).alias("cn_c"),
        F.sum("pos_c").over(wc).alias("cpos_c"),
    )
    return cum.selectExpr(
        "CAST(decile AS BIGINT) AS decile",
        "CAST(cn_t AS BIGINT) AS cn_t",
        "CAST(cpos_t AS BIGINT) AS cpos_t",
        "CAST(cn_c AS BIGINT) AS cn_c",
        "CAST(cpos_c AS BIGINT) AS cpos_c",
        "CAST(cpos_t * cn_c - cpos_c * cn_t AS BIGINT) AS qini_x",
        # sign-safe: Spark div truncates, DuckDB // floors — strip the
        # sign before the floor division and reapply it after
        "CAST(CASE WHEN cpos_t * cn_c - cpos_c * cn_t < 0 THEN -1 ELSE 1 END"
        " * (abs(cpos_t * cn_c - cpos_c * cn_t) * 1000000"
        " div (cn_t * cn_c)) AS BIGINT) AS uplift_cum_ppm",
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# CUPED variance reduction (pre-exposure covariate adjustment)
# ---------------------------------------------------------------------------


@query(
    "ab_cuped_adjustment",
    oracle="""
    WITH base AS (
        SELECT CAST(CAST(('0x' || substring(md5('c-' ||
                      CAST(l_orderkey AS VARCHAR) || '-' ||
                      CAST(l_linenumber AS VARCHAR)), 1, 8)) AS UBIGINT) % 2
                    AS HUGEINT) AS t,
               CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS HUGEINT)
                 * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                          AS HUGEINT)) AS y,
               CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS HUGEINT) AS x
        FROM lineitem
    ),
    m AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy,
               sum(t) AS n_t, sum(t*x) AS sx_t, sum(t*y) AS sy_t
        FROM base
    ),
    d AS (
        SELECT n, n_t, n - n_t AS n_c,
               sx - sx_t AS sx_c, sy - sy_t AS sy_c,
               sx_t, sy_t,
               n*sxy - sx*sy AS cov_num,
               n*sxx - sx*sx AS varx_num,
               n*syy - sy*sy AS vary_num
        FROM m
    ),
    s AS (
        SELECT *,
               CASE WHEN cov_num < 0 THEN -1 ELSE 1 END
                 * (abs(cov_num) * 1000000 // varx_num) AS theta_e6,
               CASE WHEN cov_num < 0 THEN -1 ELSE 1 END
                 * (abs(cov_num) * 1000000 // vary_num) AS b_e6,
               sy_t * 1000000 // n_t - sy_c * 1000000 // n_c AS dy_e6,
               sx_t * 1000000 // n_t - sx_c * 1000000 // n_c AS dx_e6
        FROM d
    )
    SELECT CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
           CAST(theta_e6 AS BIGINT) AS theta_e6,
           CAST(theta_e6 * b_e6 // 1000000 AS BIGINT) AS corr2_ppm,
           CAST(dy_e6 AS BIGINT) AS raw_diff_cents_e6,
           CAST(dy_e6 - (CASE WHEN theta_e6 * dx_e6 < 0 THEN -1 ELSE 1 END
                         * (abs(theta_e6 * dx_e6) // 1000000))
                AS BIGINT) AS adj_diff_cents_e6,
           CAST(theta_e6 * b_e6 // 1000000 AS BIGINT) AS var_reduction_ppm
    FROM s
    """,
    tags=("ab", "cuped", "variance-reduction", "engine-addition"),
)
def ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Deng et al. 2013) — the experimentation platform's
    variance-reduction workhorse: adjust the experiment metric Y
    (net line revenue, exact integer cents-x100: ep_cents *
    (100 - discount_pct)) by the pre-exposure covariate X (the
    pre-discount line price in cents — the classic "same metric,
    pre-period" covariate, corr ~0.998 here) via
    theta = cov(Y,X)/var(X), shrinking metric variance
    by corr(X,Y)^2. One exact decimal moment pass feeds everything;
    theta and the correlation factors are integer-ppm floor divisions
    with the sign stripped first and reapplied after (Spark div
    truncates, DuckDB // floors — they disagree on negatives), and
    corr^2 is staged as the PRODUCT of the two ppm factors (floor at
    1e-6 resolution twice, then rescale) so the cross product
    cov_num^2 — which would overflow decimal(38,0) at sf0.1 — never
    materializes. Treatment is a deterministic hash bit; the readout
    is the raw vs CUPED-adjusted treated-control gap and the expected
    variance-reduction ppm.

    Scale shape: ONE map-side-combinable 9-aggregate scan; the
    adjustment algebra runs on a single row."""
    li = load_table(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    base = li.selectExpr(
        f"""CAST(CAST(conv(substring(md5(concat('c-',
            CAST(l_orderkey AS STRING), '-',
            CAST(l_linenumber AS STRING))), 1, 8), 16, 10) AS BIGINT) % 2
            AS {d38}) AS t""",
        f"CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        f" AS {d38})"
        f" * (100 - CAST(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100"
        f" AS BIGINT) AS {d38})) AS y",
        f"CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        f" AS {d38}) AS x",
    )
    m = base.agg(
        F.expr(f"CAST(count(*) AS {d38})").alias("n"),
        F.expr("sum(x)").alias("sx"),
        F.expr("sum(y)").alias("sy"),
        F.expr("sum(x*x)").alias("sxx"),
        F.expr("sum(x*y)").alias("sxy"),
        F.expr("sum(y*y)").alias("syy"),
        F.expr("sum(t)").alias("n_t"),
        F.expr("sum(t*x)").alias("sx_t"),
        F.expr("sum(t*y)").alias("sy_t"),
    )
    d = m.selectExpr(
        "n", "n_t", "n - n_t AS n_c",
        "sx - sx_t AS sx_c", "sy - sy_t AS sy_c", "sx_t", "sy_t",
        "n*sxy - sx*sy AS cov_num",
        "n*sxx - sx*sx AS varx_num",
        "n*syy - sy*sy AS vary_num",
    )
    s = d.selectExpr(
        "*",
        "CASE WHEN cov_num < 0 THEN -1 ELSE 1 END"
        " * (abs(cov_num) * 1000000 div varx_num) AS theta_e6",
        "CASE WHEN cov_num < 0 THEN -1 ELSE 1 END"
        " * (abs(cov_num) * 1000000 div vary_num) AS b_e6",
        "sy_t * 1000000 div n_t - sy_c * 1000000 div n_c AS dy_e6",
        "sx_t * 1000000 div n_t - sx_c * 1000000 div n_c AS dx_e6",
    )
    return s.selectExpr(
        "CAST(n_t AS BIGINT) AS n_t",
        "CAST(n_c AS BIGINT) AS n_c",
        "CAST(theta_e6 AS BIGINT) AS theta_e6",
        "CAST(theta_e6 * b_e6 div 1000000 AS BIGINT) AS corr2_ppm",
        "CAST(dy_e6 AS BIGINT) AS raw_diff_cents_e6",
        "CAST(dy_e6 - (CASE WHEN theta_e6 * dx_e6 < 0 THEN -1 ELSE 1 END"
        " * (abs(theta_e6 * dx_e6) div 1000000))"
        " AS BIGINT) AS adj_diff_cents_e6",
        "CAST(theta_e6 * b_e6 div 1000000 AS BIGINT) AS var_reduction_ppm",
    )


# ---------------------------------------------------------------------------
# Two-proportion power analysis (required sample size per arm)
# ---------------------------------------------------------------------------

# Pinned design constants: alpha=.05 two-sided (z=1.96) + 80% power
# (z=0.84) -> (z_a + z_b)^2 = 2.80^2 = 784/100; MDE = +2 percentage
# points absolute = 1/50.


@query(
    "ab_power_sample_size",
    oracle="""
    WITH base AS (
        SELECT o_orderpriority AS grp,
               CAST(count(*) AS HUGEINT) AS b,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS HUGEINT) AS a
        FROM orders GROUP BY 1
    ),
    calc AS (
        SELECT grp, b, a,
               2500 * a * (b - a) + (50 * a + b) * (49 * b - 50 * a)
                   AS var_num
        FROM base
    )
    SELECT grp,
           CAST(b AS BIGINT) AS n,
           CAST(a AS BIGINT) AS pos,
           CAST(a * 1000000 // b AS BIGINT) AS p1_ppm,
           CAST((784 * var_num + 100 * b * b - 1) // (100 * b * b)
                AS BIGINT) AS n_required_per_arm,
           CAST(CASE WHEN b >= 2 * ((784 * var_num + 100 * b * b - 1)
                                    // (100 * b * b))
                     THEN 1 ELSE 0 END AS BIGINT) AS powered_today
    FROM calc ORDER BY grp
    """,
    tags=("ab", "power-analysis", "experiment-design", "engine-addition"),
)
def ab_power_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion power analysis — the experiment-design readout
    that runs BEFORE ab_welch_ttest ever can: per segment, the
    required per-arm sample size to detect a +2pp absolute lift on
    the observed baseline rate at alpha=.05 / power 80%, via
    n = (z_a+z_b)^2 (p1 q1 + p2 q2) / delta^2 computed as ONE exact
    integer ceiling division — p1 enters as the rational pos/n,
    p2 = p1 + 1/50, and clearing denominators gives
    n = ceil(784 * [2500 a (b-a) + (50a+b)(49b-50a)] / (100 b^2))
    with the pinned z-sum 2.80 as 784/100. `powered_today` flags
    segments whose current volume already covers both arms.

    Scale shape: one map-side-combined aggregate to segment counts;
    the design algebra is O(segments)."""
    o = load_table(spark, sf_dir, "orders")
    d38 = "decimal(38,0)"
    base = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.expr(f"CAST(count(*) AS {d38})").alias("b"),
        F.expr(
            f"CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)"
            f" AS {d38})"
        ).alias("a"),
    )
    calc = base.selectExpr(
        "grp", "b", "a",
        "2500 * a * (b - a) + (50 * a + b) * (49 * b - 50 * a) AS var_num",
    )
    return calc.selectExpr(
        "grp",
        "CAST(b AS BIGINT) AS n",
        "CAST(a AS BIGINT) AS pos",
        "CAST(a * 1000000 div b AS BIGINT) AS p1_ppm",
        "CAST((784 * var_num + 100 * b * b - 1) div (100 * b * b)"
        " AS BIGINT) AS n_required_per_arm",
        "CAST(CASE WHEN b >= 2 * ((784 * var_num + 100 * b * b - 1)"
        " div (100 * b * b)) THEN 1 ELSE 0 END AS BIGINT)"
        " AS powered_today",
    ).orderBy("grp")


# ---------------------------------------------------------------------------
# Bucketed jackknife variance of a ratio metric
# ---------------------------------------------------------------------------

_JK_BUCKETS = 10


@query(
    "ab_jackknife_buckets",
    oracle=f"""
    WITH rows_ AS (
        SELECT CAST(CAST(('0x' || substring(md5('jk-' ||
                      CAST(l_orderkey AS VARCHAR)), 1, 8)) AS UBIGINT)
                    % {_JK_BUCKETS} AS BIGINT) AS bucket,
               CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS HUGEINT) AS y,
               CAST(CAST(l_quantity AS BIGINT) AS HUGEINT) AS x
        FROM lineitem
    ),
    per AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS n_b,
               sum(y) AS sy_b, sum(x) AS sx_b
        FROM rows_ GROUP BY 1
    ),
    tot AS (
        SELECT bucket, n_b, sy_b, sx_b,
               sum(sy_b) OVER () AS sy, sum(sx_b) OVER () AS sx
        FROM per
    ),
    loo AS (
        SELECT bucket, n_b,
               (sy - sy_b) * 1000000 // (sx - sx_b) AS r_loo_e6,
               sy * 1000000 // sx AS ratio_full_e6
        FROM tot
    ),
    jk AS (
        SELECT bucket, n_b, r_loo_e6, ratio_full_e6,
               CAST(count(*) OVER () AS HUGEINT) AS nb,
               sum(r_loo_e6) OVER () AS sr,
               sum(r_loo_e6 * r_loo_e6) OVER () AS sr2
        FROM loo
    )
    SELECT bucket, n_b,
           CAST(r_loo_e6 AS BIGINT) AS r_loo_e6,
           CAST(ratio_full_e6 AS BIGINT) AS ratio_full_e6,
           CAST((nb - 1) * (nb * sr2 - sr * sr) // (nb * nb) AS BIGINT)
               AS jk_var_e12
    FROM jk ORDER BY bucket
    """,
    tags=("ab", "jackknife", "variance", "ratio-metric", "engine-addition"),
)
def ab_jackknife_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed (delete-one-group) jackknife for a RATIO metric —
    revenue-per-unit cents — the experimentation platform's standard
    error for metrics whose numerator and denominator are both
    random (complements ab_ratio_delta_method's closed form with the
    resampling answer). Units land in {_JK_BUCKETS} deterministic
    hash buckets on the randomization key (orderkey, so an order's
    lines stay together); each leave-one-out ratio is an integer-ppm
    floor division of exact decimal sums, and the jackknife variance
    (B-1)/B * sum((r_b - rbar)^2) comes from the exact integer
    identity (B-1)*(B*sum(r^2) - sum(r)^2) / B^2 on those ppm
    integers.

    Scale shape: one map-side-combined {_JK_BUCKETS}-key aggregate;
    the leave-one-out algebra is O(B) post-processing on the bucket
    table — the windows never see data rows."""
    li = load_table(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    rows_ = li.selectExpr(
        f"""CAST(CAST(conv(substring(md5(concat('jk-',
            CAST(l_orderkey AS STRING))), 1, 8), 16, 10) AS BIGINT)
            % {_JK_BUCKETS} AS BIGINT) AS bucket""",
        f"CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        f" AS {d38}) AS y",
        f"CAST(CAST(l_quantity AS BIGINT) AS {d38}) AS x",
    )
    per = rows_.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.expr("sum(y)").alias("sy_b"),
        F.expr("sum(x)").alias("sx_b"),
    )
    wall = Window.partitionBy()
    tot = per.select(
        "bucket", "n_b", "sy_b", "sx_b",
        F.sum("sy_b").over(wall).alias("sy"),
        F.sum("sx_b").over(wall).alias("sx"),
    )
    loo = tot.selectExpr(
        "bucket", "n_b",
        # keep the ppm ratio in decimal(38,0): cents-per-unit * 1e6 is
        # ~4e11, so its square inside the variance identity overflows
        # int64 (ANSI mode faults, it doesn't wrap)
        f"CAST((sy - sy_b) * 1000000 div (sx - sx_b) AS {d38})"
        " AS r_loo_e6",
        "sy * 1000000 div sx AS ratio_full_e6",
    )
    jk = loo.select(
        "bucket", "n_b", "r_loo_e6", "ratio_full_e6",
        F.count(F.lit(1)).over(wall).cast(d38).alias("nb"),
        F.sum("r_loo_e6").over(wall).alias("sr"),
        F.sum(F.expr("r_loo_e6 * r_loo_e6")).over(wall).alias("sr2"),
    )
    return jk.selectExpr(
        "bucket", "n_b",
        "CAST(r_loo_e6 AS BIGINT) AS r_loo_e6",
        "CAST(ratio_full_e6 AS BIGINT) AS ratio_full_e6",
        "CAST((nb - 1) * (nb * sr2 - sr * sr) div (nb * nb) AS BIGINT)"
        " AS jk_var_e12",
    ).orderBy("bucket")


# ---------------------------------------------------------------------------
# Kaplan-Meier survival with right-censoring
# ---------------------------------------------------------------------------


@query(
    "ml_survival_kaplan_meier",
    oracle="""
    WITH RECURSIVE bounds AS (
        SELECT CAST(max(ts) AS DATE) AS hi FROM events
    ),
    users AS (
        SELECT user_id,
               date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
                   AS dur,
               CASE WHEN CAST(max(ts) AS DATE)
                         <= (SELECT hi - INTERVAL 7 DAY FROM bounds)
                    THEN 1 ELSE 0 END AS died
        FROM events GROUP BY 1
    ),
    tbl AS (
        SELECT dur AS t,
               CAST(sum(died) AS BIGINT) AS d,
               CAST(count(*) - sum(died) AS BIGINT) AS c
        FROM users GROUP BY 1
    ),
    seq AS MATERIALIZED (
        SELECT t, d, c,
               CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS rn,
               CAST(count(*) OVER () AS BIGINT) AS nrows,
               CAST(sum(d + c) OVER (ORDER BY t DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n_risk
        FROM tbl
    ),
    rec AS (
        SELECT rn, t, d, c, n_risk, nrows,
               (1000000 * (n_risk - d)) // n_risk AS s_ppm
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT q.rn, q.t, q.d, q.c, q.n_risk, q.nrows,
               (r.s_ppm * (q.n_risk - q.d)) // q.n_risk
        FROM rec r JOIN seq q ON q.rn = r.rn + 1
    )
    SELECT t AS duration_days, n_risk, d AS n_events, c AS n_censored,
           CAST(s_ppm AS BIGINT) AS survival_ppm
    FROM rec ORDER BY t
    """,
    tags=("ml", "survival", "kaplan-meier", "stateful", "engine-addition"),
)
def ml_survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve WITH right-censoring — the
    retention analysis events_survival_table can't do honestly: a
    user's duration is first-to-last event in days; users still
    active in the stream's final week are CENSORED (they leave the
    risk set without counting as churn). S(t) is the sequential
    product of (n_risk - d)/n_risk, carried in integer ppm with a
    truncating division per step — exact, engine-identical, and
    monotone nonincreasing by construction. n_risk comes from a
    reverse cumulative sum, not a per-t rescan.

    Scale shape: one shuffle to per-user spans, one to the duration
    table (bounded by the observation window in days); the recursion
    runs on that model-sized table — applyInPandas over one group on
    the Spark side, a recursive CTE in the oracle."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(F.expr("CAST(max(ts) AS DATE)").alias("hi"))
    users = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.expr(
                "datediff(CAST(max(ts) AS DATE), CAST(min(ts) AS DATE))"
            ).alias("dur"),
            F.expr(
                "CASE WHEN CAST(max(ts) AS DATE) <= date_sub(max(hi), 7)"
                " THEN 1 ELSE 0 END"
            ).alias("died"),
        )
    )
    tbl = users.groupBy(F.col("dur").alias("t")).agg(
        F.sum("died").cast("bigint").alias("d"),
        (F.count(F.lit(1)) - F.sum("died")).cast("bigint").alias("c"),
    )

    def km(pdf):
        import pandas as pd

        pdf = pdf.sort_values("t")
        total = int((pdf["d"] + pdf["c"]).sum())
        out, s, at_risk = [], 1_000_000, total
        for r in pdf.itertuples():
            s = s * (at_risk - r.d) // at_risk
            out.append((int(r.t), at_risk, int(r.d), int(r.c), s))
            at_risk -= int(r.d) + int(r.c)
        return pd.DataFrame(
            out,
            columns=[
                "duration_days", "n_risk", "n_events", "n_censored",
                "survival_ppm",
            ],
        )

    schema = (
        "duration_days bigint, n_risk bigint, n_events bigint,"
        " n_censored bigint, survival_ppm bigint"
    )
    return (
        tbl.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(lambda pdf: km(pdf), schema)
        .orderBy("duration_days")
    )


# ---------------------------------------------------------------------------
# Stratified average treatment effect
# ---------------------------------------------------------------------------


@query(
    "ab_stratified_ate",
    oracle="""
    WITH base AS (
        SELECT o_orderpriority AS stratum,
               CAST(CAST(('0x' || substring(md5('st-' ||
                      CAST(o_orderkey AS VARCHAR)), 1, 8)) AS UBIGINT) % 2
                    AS BIGINT) AS t,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    per AS (
        SELECT stratum,
               CAST(sum(t) AS BIGINT) AS n_t,
               CAST(sum(t * y) AS BIGINT) AS c_t,
               CAST(sum(1 - t) AS BIGINT) AS n_c,
               CAST(sum((1 - t) * y) AS BIGINT) AS c_c
        FROM base GROUP BY 1
    ),
    ates AS (
        SELECT stratum, n_t, c_t, n_c, c_c,
               n_t + n_c AS n_s,
               c_t * 1000000 // n_t - c_c * 1000000 // n_c AS ate_e6
        FROM per
    )
    SELECT stratum, n_t, c_t, n_c, c_c,
           CAST(ate_e6 AS BIGINT) AS stratum_ate_e6,
           CAST(CASE WHEN sum(n_s * ate_e6) OVER () < 0 THEN -1 ELSE 1 END
                * (abs(sum(n_s * ate_e6) OVER ()) // sum(n_s) OVER ())
                AS BIGINT) AS pooled_ate_e6
    FROM ates ORDER BY stratum
    """,
    tags=("ab", "causal", "stratification", "engine-addition"),
)
def ab_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratified average treatment effect — the causal
    estimator between ml_uplift_qini's curve and ab_cuped_adjustment's
    covariate trick: within each stratum (order priority) the
    treated-control conversion gap is an exact e6 rate difference,
    and the pooled ATE reweights strata by their size — removing any
    confounding carried by the stratification variable. The pooled
    division is sign-stripped (the weighted sum can be negative under
    a null effect — which a hash-bit treatment IS, so this query
    doubles as an A/A sanity check: pooled_ate_e6 should hover near
    zero).

    Scale shape: one conditional-aggregate scan to |strata| rows;
    the pooling is a window over the stratum table."""
    o = load_table(spark, sf_dir, "orders")
    base = o.selectExpr(
        "o_orderpriority AS stratum",
        "CAST(CAST(conv(substring(md5(concat('st-',"
        " CAST(o_orderkey AS STRING))), 1, 8), 16, 10) AS BIGINT) % 2"
        " AS BIGINT) AS t",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y",
    )
    per = base.groupBy("stratum").agg(
        F.sum("t").cast("bigint").alias("n_t"),
        F.sum(F.expr("t * y")).cast("bigint").alias("c_t"),
        F.sum(F.expr("1 - t")).cast("bigint").alias("n_c"),
        F.sum(F.expr("(1 - t) * y")).cast("bigint").alias("c_c"),
    )
    ates = per.selectExpr(
        "stratum", "n_t", "c_t", "n_c", "c_c",
        "n_t + n_c AS n_s",
        "c_t * 1000000 div n_t - c_c * 1000000 div n_c AS ate_e6",
    )
    wall = Window.partitionBy()
    return (
        ates.select(
            "stratum", "n_t", "c_t", "n_c", "c_c",
            F.col("ate_e6").cast("bigint").alias("stratum_ate_e6"),
            F.expr(
                "CAST(CASE WHEN sum(n_s * ate_e6) OVER () < 0 THEN -1"
                " ELSE 1 END"
                " * (abs(sum(n_s * ate_e6) OVER ()) div sum(n_s) OVER ())"
                " AS BIGINT)"
            ).alias("pooled_ate_e6"),
        )
        .orderBy("stratum")
    )


# ---------------------------------------------------------------------------
# Information-theory family (quantized integer log: functions.intlog)
# ---------------------------------------------------------------------------


def _logloss_oracle() -> str:
    from ..functions.intlog import ln_ratio_e3_sql

    ln_pos = ln_ratio_e3_sql("b.n", "b.pos").replace("DIV", "//")
    ln_neg = ln_ratio_e3_sql("b.n", "b.n - b.pos").replace("DIV", "//")
    return f"""
    WITH scored AS (
        SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bin_id,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    b AS (
        SELECT bin_id, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS pos
        FROM scored GROUP BY 1
    ),
    cost AS (
        SELECT b.bin_id, b.n, b.pos,
               CASE WHEN b.pos = 0 OR b.pos = b.n THEN NULL
                    ELSE b.pos * ({ln_pos}) + (b.n - b.pos) * ({ln_neg})
               END AS bin_loss_e3
        FROM b
    )
    SELECT CAST(count(*) AS BIGINT) AS n_bins,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN bin_loss_e3 IS NULL THEN n ELSE 0 END)
                AS BIGINT) AS n_degenerate_rows,
           CAST(sum(bin_loss_e3) AS BIGINT) AS total_log_loss_e3,
           CAST(sum(bin_loss_e3)
                // sum(CASE WHEN bin_loss_e3 IS NULL THEN 0 ELSE n END)
                AS BIGINT) AS mean_log_loss_e3
    FROM cost
    """


@query(
    "ml_log_loss_eval",
    oracle=_logloss_oracle(),
    tags=("ml", "evaluation", "log-loss", "engine-addition"),
)
def ml_log_loss_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-entropy (log loss) of the histogram-calibrated
    classifier — the proper scoring rule next to ml_brier_decomposition:
    each score bin predicts its own positive rate pos/n, so a
    positive row costs ln(n/pos) nats and a negative ln(n/(n-pos)),
    both via the quantized integer log — no float ln anywhere.
    Pure bins (pos = 0 or n) predict probability 0/1 exactly and are
    excluded with their rows COUNTED (n_degenerate_rows) rather than
    clamped silently — log loss is infinite there and an honest
    metric says so.

    Scale shape: one ~20-key conditional aggregate; the costing is
    O(bins)."""
    from ..functions.intlog import ln_ratio_e3_sql

    o = load_table(spark, sf_dir, "orders")
    b = o.selectExpr(
        "CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bin_id",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y",
    ).groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    ln_pos = ln_ratio_e3_sql("n", "pos").replace("DIV", "div")
    ln_neg = ln_ratio_e3_sql("n", "n - pos").replace("DIV", "div")
    cost = b.selectExpr(
        "bin_id", "n", "pos",
        f"CASE WHEN pos = 0 OR pos = n THEN NULL"
        f" ELSE pos * ({ln_pos}) + (n - pos) * ({ln_neg}) END"
        " AS bin_loss_e3",
    )
    return cost.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("bin_loss_e3").isNull(), F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_degenerate_rows"),
        F.sum("bin_loss_e3").cast("bigint").alias("total_log_loss_e3"),
        F.expr(
            "CAST(sum(bin_loss_e3)"
            " div sum(CASE WHEN bin_loss_e3 IS NULL THEN 0 ELSE n END)"
            " AS BIGINT)"
        ).alias("mean_log_loss_e3"),
    )


def _mi_oracle() -> str:
    from ..functions.intlog import ln_ratio_e3_sql

    pos = ln_ratio_e3_sql("cxy * n", "cx * cy").replace("DIV", "//")
    neg = ln_ratio_e3_sql("cx * cy", "cxy * n").replace("DIV", "//")
    return f"""
    WITH melted AS (
        SELECT feature, val,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM (
            SELECT l_returnflag,
                   unnest(['quantity', 'discount_x100', 'ship_month'])
                       AS feature,
                   unnest([CAST(l_quantity AS BIGINT),
                           CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                                AS BIGINT),
                           CAST(month(l_shipdate) AS BIGINT)]) AS val
            FROM lineitem)
    ),
    cells AS (
        SELECT feature, val, y, CAST(count(*) AS BIGINT) AS cxy
        FROM melted GROUP BY 1, 2, 3
    ),
    margins AS (
        SELECT feature, val, y, cxy,
               CAST(sum(cxy) OVER (PARTITION BY feature, val) AS BIGINT)
                   AS cx,
               CAST(sum(cxy) OVER (PARTITION BY feature, y) AS BIGINT)
                   AS cy,
               CAST(sum(cxy) OVER (PARTITION BY feature) AS BIGINT) AS n
        FROM cells
    ),
    terms AS (
        SELECT feature,
               cxy * (CASE WHEN cxy * n >= cx * cy
                           THEN {pos} ELSE -({neg}) END) AS term_e3
        FROM margins
    )
    SELECT feature,
           CAST(sum(term_e3) AS BIGINT) AS mi_num_e3,
           CAST(sum(term_e3) * 1000
                // (SELECT CAST(sum(cxy) AS BIGINT) FROM cells
                    WHERE cells.feature = terms.feature)
                AS BIGINT) AS mi_micro_nats
    FROM terms
    GROUP BY feature
    ORDER BY feature
    """


@query(
    "ml_mutual_information",
    oracle=_mi_oracle(),
    tags=("ml", "feature-selection", "mutual-information",
          "engine-addition"),
)
def ml_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(X;Y) between each feature and the return
    flag — THE model-free feature-selection screen, in one melted
    scan (the ml_drift_ks trick): every (feature, value, label) cell
    contributes c * ln(c*n / (cx*cy)) with the quantized integer log,
    the sign decided by comparing the products first. Reported as the
    raw e3 numerator and per-row micro-nats. Unlike correlation this
    catches NON-monotone dependence; unlike chi2 it is in
    interpretable units (nats of shared information).

    Scale shape: one melted scan to (feature, val, y) cells with
    map-side combine; margins are windows over the cell table
    partitioned by feature — histogram-sized, never data-sized."""
    from ..functions.intlog import ln_ratio_e3_sql

    li = load_table(spark, sf_dir, "lineitem")
    melted = li.selectExpr(
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y",
        """stack(3,
           'quantity', CAST(l_quantity AS BIGINT),
           'discount_x100',
           CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT),
           'ship_month', CAST(month(l_shipdate) AS BIGINT))
           AS (feature, val)""",
    )
    cells = melted.groupBy("feature", "val", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("cxy")
    )
    wx = Window.partitionBy("feature", "val")
    wy = Window.partitionBy("feature", "y")
    wf = Window.partitionBy("feature")
    margins = cells.select(
        "feature", "val", "y", "cxy",
        F.sum("cxy").over(wx).cast("bigint").alias("cx"),
        F.sum("cxy").over(wy).cast("bigint").alias("cy"),
        F.sum("cxy").over(wf).cast("bigint").alias("n"),
    )
    pos = ln_ratio_e3_sql("cxy * n", "cx * cy").replace("DIV", "div")
    neg = ln_ratio_e3_sql("cx * cy", "cxy * n").replace("DIV", "div")
    terms = margins.selectExpr(
        "feature",
        "n",
        f"cxy * (CASE WHEN cxy * n >= cx * cy THEN {pos}"
        f" ELSE -({neg}) END) AS term_e3",
    )
    return (
        terms.groupBy("feature")
        .agg(
            F.sum("term_e3").cast("bigint").alias("mi_num_e3"),
            F.expr(
                "CAST(sum(term_e3) * 1000 div max(n) AS BIGINT)"
            ).alias("mi_micro_nats"),
        )
        .orderBy("feature")
    )


def _calib_slope_oracle() -> str:
    from ..functions.intlog import ln_ratio_e3_sql

    def logit(pos: str, neg: str) -> str:
        p = ln_ratio_e3_sql(pos, neg).replace("DIV", "//")
        n = ln_ratio_e3_sql(neg, pos).replace("DIV", "//")
        return f"(CASE WHEN {pos} >= {neg} THEN {p} ELSE -({n}) END)"

    xa = logit("pos_a", "n_a - pos_a")
    xb = logit("pos_b", "n_b - pos_b")
    return f"""
    WITH split AS (
        SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bin_id,
               CAST(CAST(('0x' || substring(md5('cs-' ||
                      CAST(o_orderkey AS VARCHAR)), 1, 8)) AS UBIGINT) % 2
                    AS BIGINT) AS half,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    b AS (
        SELECT bin_id,
               CAST(sum(1 - half) AS HUGEINT) AS n_a,
               CAST(sum((1 - half) * y) AS HUGEINT) AS pos_a,
               CAST(sum(half) AS HUGEINT) AS n_b,
               CAST(sum(half * y) AS HUGEINT) AS pos_b
        FROM split GROUP BY 1
        HAVING sum((1 - half) * y) > 0
           AND sum((1 - half) * y) < sum(1 - half)
           AND sum(half * y) > 0 AND sum(half * y) < sum(half)
    ),
    pts AS (
        SELECT bin_id, n_b AS w,
               CAST({xa} AS HUGEINT) AS x, CAST({xb} AS HUGEINT) AS z
        FROM b
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n_bins,
               sum(w) AS sw, sum(w * x) AS swx, sum(w * z) AS swz,
               sum(w * x * x) AS swxx, sum(w * x * z) AS swxz
        FROM pts
    )
    SELECT n_bins,
           CAST(sw AS BIGINT) AS n_holdout_rows,
           CAST(CASE WHEN sw * swxz - swx * swz < 0 THEN -1 ELSE 1 END
                * (abs(sw * swxz - swx * swz) * 1000
                   // (sw * swxx - swx * swx)) AS BIGINT) AS slope_e3,
           CAST(CASE WHEN swz * 1000 - (CASE WHEN sw * swxz - swx * swz < 0
                                      THEN -1 ELSE 1 END
                     * (abs(sw * swxz - swx * swz) * 1000
                        // (sw * swxx - swx * swx))) * swx < 0
                     THEN -1 ELSE 1 END
                * (abs(swz * 1000 - (CASE WHEN sw * swxz - swx * swz < 0
                                          THEN -1 ELSE 1 END
                       * (abs(sw * swxz - swx * swz) * 1000
                          // (sw * swxx - swx * swx))) * swx)
                   // (1000 * sw)) AS BIGINT) AS intercept_e3
    FROM m
    """


@query(
    "ml_calibration_stability_slope",
    oracle=_calib_slope_oracle(),
    tags=("ml", "calibration", "slope", "engine-addition"),
)
def ml_calibration_stability_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox-style calibration slope, measured the only honest way
    without a second dataset: hash-split the rows in two, fit each
    bin's log-odds on BOTH halves, and regress holdout logit on
    calibration logit (weighted by holdout mass). Slope ~1 and
    intercept ~0 = the calibration transfers; slope < 1 = the
    model's spread is optimistic; ~0 = the score carries no signal
    (which is what this synthetic label correctly reads). Logits use
    the quantized integer
    log with sign by comparison; the weighted OLS runs on exact
    integer moments of those quantized points; bins pure in either
    half are excluded (their logit is infinite). Intercept reported
    at the origin (z - slope*x averaged), in the same e3 units.

    Scale shape: one conditional-aggregate scan to ~20 bins; the
    regression is O(bins)."""
    from ..functions.intlog import ln_ratio_e3_sql

    def logit(pos: str, neg: str) -> str:
        p = ln_ratio_e3_sql(pos, neg).replace("DIV", "div")
        n = ln_ratio_e3_sql(neg, pos).replace("DIV", "div")
        return f"(CASE WHEN {pos} >= {neg} THEN {p} ELSE -({n}) END)"

    o = load_table(spark, sf_dir, "orders")
    d38 = "decimal(38,0)"
    split = o.selectExpr(
        "CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bin_id",
        "CAST(CAST(conv(substring(md5(concat('cs-',"
        " CAST(o_orderkey AS STRING))), 1, 8), 16, 10) AS BIGINT) % 2"
        " AS BIGINT) AS half",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y",
    )
    b = (
        split.groupBy("bin_id")
        .agg(
            F.expr(f"CAST(sum(1 - half) AS {d38})").alias("n_a"),
            F.expr(f"CAST(sum((1 - half) * y) AS {d38})").alias("pos_a"),
            F.expr(f"CAST(sum(half) AS {d38})").alias("n_b"),
            F.expr(f"CAST(sum(half * y) AS {d38})").alias("pos_b"),
        )
        .where(
            "pos_a > 0 AND pos_a < n_a AND pos_b > 0 AND pos_b < n_b"
        )
    )
    xa = logit("pos_a", "n_a - pos_a")
    xb = logit("pos_b", "n_b - pos_b")
    pts = b.selectExpr(
        "bin_id", "n_b AS w",
        f"CAST({xa} AS {d38}) AS x",
        f"CAST({xb} AS {d38}) AS z",
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.expr("sum(w)").alias("sw"),
        F.expr("sum(w * x)").alias("swx"),
        F.expr("sum(w * z)").alias("swz"),
        F.expr("sum(w * x * x)").alias("swxx"),
        F.expr("sum(w * x * z)").alias("swxz"),
    )
    slope = (
        "(CASE WHEN sw * swxz - swx * swz < 0 THEN -1 ELSE 1 END"
        " * (abs(sw * swxz - swx * swz) * 1000"
        " div (sw * swxx - swx * swx)))"
    )
    return m.selectExpr(
        "n_bins",
        "CAST(sw AS BIGINT) AS n_holdout_rows",
        f"CAST({slope} AS BIGINT) AS slope_e3",
        # division-free sign: swz*1000 - slope*swx has the sign of
        # swz - slope*swx/1000 (Spark / rounds decimals, DuckDB /
        # returns double — neither is safe in a comparison)
        f"CAST(CASE WHEN swz * 1000 - {slope} * swx < 0 THEN -1 ELSE 1 END"
        f" * (abs(swz * 1000 - {slope} * swx) div (1000 * sw))"
        " AS BIGINT) AS intercept_e3",
    )


# ---------------------------------------------------------------------------
# Sample-ratio-mismatch guardrail
# ---------------------------------------------------------------------------


@query(
    "ab_srm_guardrail",
    oracle="""
    WITH assigned AS (
        SELECT CAST(CAST(('0x' || substring(md5('srm-' ||
                      CAST(o_orderkey AS VARCHAR)), 1, 8)) AS UBIGINT) % 2
                    AS BIGINT) AS arm
        FROM orders
    ),
    cells AS (
        SELECT CAST(sum(arm) AS BIGINT) AS n_t,
               CAST(count(*) - sum(arm) AS BIGINT) AS n_c,
               CAST(count(*) AS BIGINT) AS n
        FROM assigned
    )
    SELECT n_t, n_c,
           CAST((2 * n_t - n) * (2 * n_t - n) * 1000000 // n AS BIGINT)
               AS srm_chi2_e6,
           CAST(CASE WHEN (2 * n_t - n) * (2 * n_t - n) * 1000000 // n
                          > 3841459
                     THEN 1 ELSE 0 END AS BIGINT) AS srm_detected_05
    FROM cells
    """,
    tags=("ab", "srm", "guardrail", "engine-addition"),
)
def ab_srm_guardrail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail — the FIRST check every
    experiment readout runs, because a biased assignment invalidates
    everything downstream: chi-square against the designed 50/50
    split, which for two cells collapses to (n_t - n_c)^2 / n =
    (2*n_t - n)^2 / n, floored at e6 and compared to the pinned
    chi2(1) 5%% critical value as an integer. A correct hash
    assignment (as here) should NOT trigger — this query is the A/A
    guardrail the platform alerts on when it fires.

    Scale shape: one conditional-aggregate scan to 2 cells; O(1)
    test."""
    o = load_table(spark, sf_dir, "orders")
    cells = o.selectExpr(
        "CAST(CAST(conv(substring(md5(concat('srm-',"
        " CAST(o_orderkey AS STRING))), 1, 8), 16, 10) AS BIGINT) % 2"
        " AS BIGINT) AS arm"
    ).agg(
        F.sum("arm").cast("bigint").alias("n_t"),
        (F.count(F.lit(1)) - F.sum("arm")).cast("bigint").alias("n_c"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return cells.selectExpr(
        "n_t", "n_c",
        "CAST((2 * n_t - n) * (2 * n_t - n) * 1000000 div n AS BIGINT)"
        " AS srm_chi2_e6",
        "CAST(CASE WHEN (2 * n_t - n) * (2 * n_t - n) * 1000000 div n"
        " > 3841459 THEN 1 ELSE 0 END AS BIGINT) AS srm_detected_05",
    )
