"""Privacy auditing: k-anonymity, l-diversity, generalization ladder
(engine addition; SURVEY.md §2.6).

A 100 TB training-data platform ships data OUT — to labelers, eval
vendors, open releases — and the pre-flight every release runs is a
re-identification risk audit: group the table by its quasi-identifier
(QI) columns and measure how small the equivalence classes get
(k-anonymity, Sweeney 2002) and how uniform the sensitive attribute is
within each class (l-diversity, Machanavajjhala 2007). Both are plain
grouped aggregates — one shuffle on the QI key — so they scale exactly
like any other groupBy; the interesting part is keeping the RISK
ARITHMETIC integer-exact (per-million rates via integer division, never
float percentages) so the DuckDB differential is bit-identical.

Reference parity: the reference (Aero-Kent/Big-Data-Final-Project) has
no privacy surface at all — app.py stops at dashboard aggregates — so
this family is a pure engine addition for the release-pipeline use
case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..data import load_table
from ..registry import query

# Quasi-identifier: nation + market segment + coarse balance band.
# Balance bands use integer floor-division on the CENT value so the
# banding is exact (acctbal has <= 2 decimals; double->cents via
# round() is exact for these magnitudes in both engines).
_BAND = 100_000  # cents => $1000-wide bands


def _qi_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    return c.select(
        F.col("c_nationkey").alias("qi_nation"),
        F.col("c_mktsegment").alias("qi_segment"),
        F.floor(cents / _BAND).cast("bigint").alias("qi_band"),
    )


_QI_SQL = f"""
    qi AS (
        SELECT c_nationkey AS qi_nation,
               c_mktsegment AS qi_segment,
               CAST(FLOOR(CAST(ROUND(c_acctbal * 100) AS BIGINT) / {_BAND}.0)
                    AS BIGINT) AS qi_band
        FROM customer
    )
"""


@query(
    "privacy_k_anonymity",
    oracle=f"""
    WITH {_QI_SQL},
    classes AS (
        SELECT qi_nation, qi_segment, qi_band, COUNT(*) AS k
        FROM qi GROUP BY 1, 2, 3
    )
    SELECT COUNT(*) AS n_classes,
           CAST(SUM(k) AS BIGINT) AS n_rows,
           MIN(k) AS min_k,
           CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS singleton_classes,
           CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
               AS rows_below_k5,
           CAST(FLOOR(SUM(CASE WHEN k = 1 THEN k ELSE 0 END) * 1000000
                / SUM(k)) AS BIGINT) AS singleton_ppm
    FROM classes
    """,
    tags=("privacy", "k-anonymity", "audit", "engine-addition"),
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (nation, segment, $1000-balance-band)
    quasi-identifier: equivalence-class sizes, the minimum k, and the
    re-identification exposure (singleton classes, rows in classes
    below k=5, singleton rate in exact parts-per-million).

    Scale shape: one shuffle on the QI key to size the classes, then a
    single-row global aggregate over the (much smaller) class table —
    the same two-level partial-agg shape as agg_reaggregation. Risk
    rates are integer-division ppm, never float percentages, so the
    cross-engine differential is exact."""
    classes = (
        _qi_classes(spark, sf_dir)
        .groupBy("qi_nation", "qi_segment", "qi_band")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    k = F.col("k")
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(k).alias("n_rows"),
        F.min(k).alias("min_k"),
        F.sum(F.when(k == 1, 1).otherwise(0)).alias("singleton_classes"),
        F.sum(F.when(k < 5, k).otherwise(0)).alias("rows_below_k5"),
        F.floor(
            F.sum(F.when(k == 1, k).otherwise(0))
            * F.lit(1_000_000)
            / F.sum(k)
        )
        .cast("bigint")
        .alias("singleton_ppm"),
    )


@query(
    "privacy_l_diversity",
    oracle=f"""
    WITH qi AS (
        SELECT c_nationkey AS qi_nation,
               CAST(FLOOR(CAST(ROUND(c_acctbal * 100) AS BIGINT) / {_BAND}.0)
                    AS BIGINT) AS qi_band,
               c_mktsegment AS sensitive
        FROM customer
    ),
    classes AS (
        SELECT qi_nation, qi_band,
               COUNT(*) AS class_rows,
               COUNT(DISTINCT sensitive) AS l
        FROM qi GROUP BY 1, 2
    )
    SELECT l,
           COUNT(*) AS n_classes,
           CAST(SUM(class_rows) AS BIGINT) AS n_rows
    FROM classes
    GROUP BY l
    ORDER BY l
    """,
    tags=("privacy", "l-diversity", "audit", "engine-addition"),
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity histogram: with QI = (nation, balance band) and the
    market segment as the sensitive attribute, count how many
    equivalence classes achieve each distinct-sensitive-value count l.
    Classes with l = 1 leak the sensitive value outright even when k
    is large — the failure k-anonymity alone cannot see.

    Scale shape: distinct-inside-group is the expensive primitive;
    Spark plans COUNT(DISTINCT) as a two-phase expand + re-aggregate
    on the same QI partitioning (no extra shuffle beyond the key).
    The output is a histogram over l — bounded by the sensitive
    cardinality, tiny regardless of input scale."""
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    classes = (
        c.select(
            F.col("c_nationkey").alias("qi_nation"),
            F.floor(cents / _BAND).cast("bigint").alias("qi_band"),
            F.col("c_mktsegment").alias("sensitive"),
        )
        .groupBy("qi_nation", "qi_band")
        .agg(
            F.count(F.lit(1)).alias("class_rows"),
            F.countDistinct("sensitive").alias("l"),
        )
    )
    return (
        classes.groupBy("l")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("class_rows").alias("n_rows"),
        )
        .orderBy("l")
    )


@query(
    "privacy_generalization_ladder",
    oracle="""
    WITH levels AS (
        SELECT * FROM (VALUES (10000), (100000), (1000000)) AS t(band)
    ),
    qi AS (
        SELECT l.band,
               c.c_nationkey AS qi_nation,
               c.c_mktsegment AS qi_segment,
               CAST(FLOOR(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)
                          / CAST(l.band AS DOUBLE)) AS BIGINT) AS qi_band
        FROM customer c CROSS JOIN levels l
    ),
    classes AS (
        SELECT band, qi_nation, qi_segment, qi_band, COUNT(*) AS k
        FROM qi GROUP BY 1, 2, 3, 4
    )
    SELECT band,
           COUNT(*) AS n_classes,
           MIN(k) AS min_k,
           CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS singleton_classes,
           CAST(FLOOR(SUM(CASE WHEN k = 1 THEN k ELSE 0 END) * 1000000
                / SUM(k)) AS BIGINT) AS singleton_ppm
    FROM classes
    GROUP BY band
    ORDER BY band
    """,
    tags=("privacy", "k-anonymity", "generalization", "engine-addition"),
)
def privacy_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The anonymization TRADEOFF CURVE: re-run the k-anonymity audit
    at three balance-band generalization levels ($100 / $1000 / $10000
    bands) in ONE pass and report how coarsening the QI buys down the
    singleton rate. This is the utility-vs-privacy readout an actual
    release pipeline iterates on.

    Scale shape: the ladder is a 3x row explode (a literal-array
    explode, no shuffle) followed by the same two-level aggregate as
    privacy_k_anonymity — one shuffle keyed on (level, QI), so adding
    ladder rungs widens the key space, never adds passes over the
    data."""
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    with_levels = c.select(
        F.col("c_nationkey").alias("qi_nation"),
        F.col("c_mktsegment").alias("qi_segment"),
        cents.alias("cents"),
        F.explode(F.array(F.lit(10_000), F.lit(100_000), F.lit(1_000_000))).alias(
            "band"
        ),
    ).select(
        "band",
        "qi_nation",
        "qi_segment",
        F.floor(F.col("cents") / F.col("band")).cast("bigint").alias("qi_band"),
    )
    classes = with_levels.groupBy("band", "qi_nation", "qi_segment", "qi_band").agg(
        F.count(F.lit(1)).alias("k")
    )
    k = F.col("k")
    return (
        classes.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.min(k).alias("min_k"),
            F.sum(F.when(k == 1, 1).otherwise(0)).alias("singleton_classes"),
            F.floor(
                F.sum(F.when(k == 1, k).otherwise(0))
                * F.lit(1_000_000)
                / F.sum(k)
            )
            .cast("bigint")
            .alias("singleton_ppm"),
        )
        .orderBy("band")
    )


# Ordered 3-level sensitive attribute for t-closeness: in-debt /
# low / high account balance (exact integer cents thresholds).
_SENS_SQL = """
    sens AS (
        SELECT qi_nation, qi_segment, qi_band,
               CASE WHEN bal_cents < 0 THEN 0
                    WHEN bal_cents < 500000 THEN 1
                    ELSE 2 END AS s
        FROM qi_raw
    )
"""


@query(
    "privacy_t_closeness",
    oracle=f"""
    WITH qi_raw AS (
        SELECT c_nationkey AS qi_nation,
               c_mktsegment AS qi_segment,
               CAST(FLOOR(CAST(ROUND(c_acctbal * 100) AS BIGINT) / {_BAND}.0)
                    AS BIGINT) AS qi_band,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
        FROM customer
    ),
    {_SENS_SQL},
    g AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN s <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
               CAST(sum(CASE WHEN s <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        FROM sens
    ),
    cl AS (
        SELECT qi_nation, qi_segment, qi_band,
               CAST(count(*) AS BIGINT) AS nc,
               CAST(sum(CASE WHEN s <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS k0,
               CAST(sum(CASE WHEN s <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS k1
        FROM sens GROUP BY 1, 2, 3
    )
    SELECT qi_nation, qi_segment, qi_band, nc,
           CAST(abs(k0 * g.n - g.c0 * nc) + abs(k1 * g.n - g.c1 * nc)
                AS BIGINT) AS emd_num,
           CAST(nc * g.n * 2 AS BIGINT) AS emd_den,
           CAST((abs(k0 * g.n - g.c0 * nc) + abs(k1 * g.n - g.c1 * nc))
                * 1000000 // (nc * g.n * 2) AS BIGINT) AS t_ppm
    FROM cl, g
    ORDER BY t_ppm DESC, qi_nation, qi_segment, qi_band
    LIMIT 10
    """,
    tags=("privacy", "t-closeness", "audit", "engine-addition"),
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the distributional leak k-anonymity AND
    l-diversity both miss: a class can be large and diverse yet still
    skew heavily toward one sensitive value. t = Earth Mover's
    Distance between the class's sensitive distribution and the
    global one, over the ORDERED 3-level balance attribute
    (debt / low / high); for an ordered attribute the EMD is the sum
    of |cumulative differences|, cross-scaled to exact integers
    (|k_j·n − c_j·n_c|, denominator n_c·n·(m−1)) so the top-10
    riskiest classes and their t values are integer-exact ppm.

    Scale shape: one QI-key shuffle for class cumulative counts, a
    1-row global broadcast, TakeOrderedAndProject for the worst
    classes — the same audit plan family as k-anonymity, one more
    conditional sum wide."""
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    sens = c.select(
        F.col("c_nationkey").alias("qi_nation"),
        F.col("c_mktsegment").alias("qi_segment"),
        F.floor(cents / _BAND).cast("bigint").alias("qi_band"),
        F.when(cents < 0, 0).when(cents < 500000, 1).otherwise(2).alias("s"),
    )
    g = sens.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("s") <= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("c0"),
        F.sum(F.when(F.col("s") <= 1, 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
    )
    cl = sens.groupBy("qi_nation", "qi_segment", "qi_band").agg(
        F.count(F.lit(1)).cast("bigint").alias("nc"),
        F.sum(F.when(F.col("s") <= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("k0"),
        F.sum(F.when(F.col("s") <= 1, 1).otherwise(0))
        .cast("bigint")
        .alias("k1"),
    )
    num = F.abs(F.col("k0") * F.col("n") - F.col("c0") * F.col("nc")) + F.abs(
        F.col("k1") * F.col("n") - F.col("c1") * F.col("nc")
    )
    den = F.col("nc") * F.col("n") * 2
    return (
        cl.crossJoin(F.broadcast(g))
        .select(
            "qi_nation",
            "qi_segment",
            "qi_band",
            "nc",
            num.cast("bigint").alias("emd_num"),
            den.cast("bigint").alias("emd_den"),
            F.expr(
                "CAST((abs(k0 * n - c0 * nc) + abs(k1 * n - c1 * nc)) "
                "* 1000000 div (nc * n * 2) AS BIGINT)"
            ).alias("t_ppm"),
        )
        .orderBy(F.desc("t_ppm"), "qi_nation", "qi_segment", "qi_band")
        .limit(10)
    )


@query(
    "privacy_geometric_noise_counts",
    oracle="""
    WITH per AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(CAST(('0x' || substring(md5('geo-' || event_type), 1, 8))
                    AS UBIGINT) AS BIGINT) AS u
        FROM events GROUP BY 1
    ),
    noised AS (
        SELECT event_type, n,
               CASE WHEN u = 0 THEN 32
                    ELSE 32 - length(bin(CAST(u AS UBIGINT))) END AS mag,
               CASE WHEN u % 2 = 0 THEN 1 ELSE -1 END AS sign
        FROM per
    )
    SELECT event_type, n AS true_count,
           CAST(sign * mag AS BIGINT) AS noise,
           CAST(n + sign * mag AS BIGINT) AS noisy_count,
           CAST(mag AS BIGINT) AS noise_magnitude
    FROM noised ORDER BY event_type
    """,
    tags=("privacy", "differential-privacy", "geometric-mechanism",
          "engine-addition"),
)
def privacy_geometric_noise_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided geometric (discrete Laplace) noise on per-category
    counts — the release mechanism shape of an eps-DP counting query
    (Ghosh et al. 2009: the geometric mechanism is the universally
    optimal discrete noise). Noise magnitude is the leading-zero
    count of a 32-bit draw — P(mag >= k) = 2^-k, i.e. Geometric(1/2),
    matching eps = ln 2 — computed WITHOUT logarithms via
    32 - length(bin(u)) (both engines print binary without leading
    zeros); the sign is the draw's parity. The draw is a pinned md5
    of the category, so the differential can verify the mechanism's
    arithmetic end-to-end (a production release would substitute a
    real entropy source at exactly this seam — determinism here is
    for testability, NOT a DP guarantee).

    Scale shape: one map-side-combined aggregate to category counts;
    noise is O(categories) post-processing."""
    per = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .selectExpr(
            "event_type",
            "n",
            "CAST(conv(substring(md5(concat('geo-', event_type)), 1, 8),"
            " 16, 10) AS BIGINT) AS u",
        )
    )
    noised = per.selectExpr(
        "event_type",
        "n",
        "CASE WHEN u = 0 THEN 32 ELSE 32 - length(bin(u)) END AS mag",
        "CASE WHEN u % 2 = 0 THEN 1 ELSE -1 END AS sign",
    )
    return noised.selectExpr(
        "event_type",
        "n AS true_count",
        "CAST(sign * mag AS BIGINT) AS noise",
        "CAST(n + sign * mag AS BIGINT) AS noisy_count",
        "CAST(mag AS BIGINT) AS noise_magnitude",
    ).orderBy("event_type")


@query(
    "privacy_report_noisy_max",
    oracle="""
    WITH per AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(CAST(('0x' || substring(md5('rnm-' || event_type), 1, 8))
                    AS UBIGINT) AS BIGINT) AS u
        FROM events GROUP BY 1
    ),
    noised AS (
        SELECT event_type, n,
               (CASE WHEN u % 2 = 0 THEN 1 ELSE -1 END)
                 * (CASE WHEN u = 0 THEN 32
                         ELSE 32 - length(bin(CAST(u AS UBIGINT))) END)
                 AS noise
        FROM per
    ),
    ranked AS (
        SELECT event_type, n, noise, n + noise AS noisy_score,
               row_number() OVER (ORDER BY n + noise DESC, event_type)
                   AS rk
        FROM noised
    )
    SELECT event_type, noise, CAST(n + noise AS BIGINT) AS noisy_score,
           CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_winner
    FROM ranked ORDER BY event_type
    """,
    tags=("privacy", "differential-privacy", "noisy-max", "engine-addition"),
)
def privacy_report_noisy_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Report-noisy-max selection — the DP answer to "which category
    is most frequent?": add independent two-sided geometric noise to
    every category's count (same log-free leading-zero construction
    as privacy_geometric_noise_counts, different salt) and report the
    argmax. Crucially the released payload is the WINNER IDENTITY,
    not the counts — noisy-max's privacy argument needs only one
    noisy comparison to leak; the noisy scores are shown here for
    the differential's benefit (draws pinned by md5 for testability;
    a production release swaps the entropy source and drops the
    score column at this seam).

    Scale shape: one aggregate to category counts, O(categories)
    post-processing, a model-sized window for the argmax."""
    per = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .selectExpr(
            "event_type",
            "n",
            "CAST(conv(substring(md5(concat('rnm-', event_type)), 1, 8),"
            " 16, 10) AS BIGINT) AS u",
        )
    )
    noised = per.selectExpr(
        "event_type",
        "n",
        "(CASE WHEN u % 2 = 0 THEN 1 ELSE -1 END)"
        " * (CASE WHEN u = 0 THEN 32 ELSE 32 - length(bin(u)) END) AS noise",
    )
    ranked = noised.select(
        "event_type", "n", "noise",
        (F.col("n") + F.col("noise")).alias("noisy_score"),
        F.row_number()
        .over(Window.orderBy(F.desc(F.col("n") + F.col("noise")), "event_type"))
        .alias("rk"),
    )
    return ranked.selectExpr(
        "event_type",
        "noise",
        "CAST(noisy_score AS BIGINT) AS noisy_score",
        "CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_winner",
    ).orderBy("event_type")
