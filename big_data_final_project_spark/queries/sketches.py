"""Mergeable-summary (sketch) aggregation surface.

The 100 TB story for distinct counting is never "shuffle all the
values": it is "build small mergeable summaries per partition /
per day, OR them together, read the count off the merged summary".
Spark ships two families:

- **Roaring-style bitmaps** (``bitmap_construct_agg`` /
  ``bitmap_or_agg`` / ``bitmap_count``) — EXACT, mergeable,
  size O(distinct/8 bytes) per 32k-id bucket. Because they are exact
  they hash-match a plain ``COUNT(DISTINCT)`` oracle, so the query
  here is fully driver-checkable.
- **HLL sketches** (``hll_sketch_agg`` / ``hll_union_agg``) —
  approximate, fixed-size. Estimates are engine-internal (no DuckDB
  parity possible); the registry's ``agg_approx_distinct`` covers the
  estimate path rows-only, and ``tests/test_sketches.py`` pins the
  property that matters at scale: merging per-day partial sketches
  gives bit-identical estimates to sketching the whole table.

Reference parity: the reference has no distinct-counting at all
(SURVEY §2.6); this is the north-star re-aggregation pattern
(pre-aggregate per day, merge across days) applied to identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load_table
from ..operators.scale import materialize
from ..registry import query


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT CASE WHEN value >= 50 THEN user_id END)
                AS BIGINT) AS n_users_high
    FROM events
    GROUP BY event_type
    """,
    tags=("sketch", "bitmap", "distinct", "reaggregation"),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-event-type distinct users computed the mergeable way:
    per-(type, day, id-bucket) partial bitmaps, OR-merged across days,
    counted — never shuffling raw user ids to a single reducer per
    group. A second bitmap over the ``value >= 50`` slice shows that
    filtered distincts ride the same pass.

    Scale shape: level 1 groups on (type, day, bucket) — high
    cardinality, skew-free, map-side combinable; its output is one
    small bitmap per cell (O(32k bits) max), so level 2 (OR-merge on
    (type, bucket)) and level 3 (sum of bucket counts per type) move
    kilobytes. This is exactly how a 100 TB daily-partitioned store
    serves "distinct users last N days" without re-scanning ids:
    store the per-day bitmaps, OR at query time. The plain
    count(DISTINCT) oracle proves exactness."""
    e = load_table(spark, sf_dir, "events")
    partials = (
        e.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.expr("bitmap_bucket_number(user_id)").alias("bk"),
            F.expr("bitmap_bit_position(user_id)").alias("bp"),
            F.col("value"),
        )
        .groupBy("event_type", "day", "bk")
        .agg(
            F.expr("bitmap_construct_agg(bp)").alias("bm_all"),
            F.expr(
                "bitmap_construct_agg(CASE WHEN value >= 50 THEN bp END)"
            ).alias("bm_high"),
        )
    )
    merged = partials.groupBy("event_type", "bk").agg(
        F.expr("bitmap_or_agg(bm_all)").alias("bm_all"),
        F.expr("bitmap_or_agg(bm_high)").alias("bm_high"),
    )
    return merged.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm_all)")).cast("bigint").alias("n_users"),
        F.sum(F.expr("bitmap_count(bm_high)")).cast("bigint").alias(
            "n_users_high"
        ),
    )


@query(
    "agg_rolling_distinct_users",
    oracle="""
    WITH act AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    days AS (SELECT DISTINCT d FROM act)
    SELECT days.d AS day,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active_7d
    FROM days JOIN act a ON a.d BETWEEN days.d - 6 AND days.d
    GROUP BY 1
    """,
    tags=("sketch", "bitmap", "window", "distinct"),
)
def agg_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the DAU/WAU
    family — computed WITHOUT re-scanning raw ids per window: per-day
    partial bitmaps are OR-merged by a RANGE-framed window (6
    preceding days), then counted. The oracle does it the quadratic
    way (day-grid join + COUNT DISTINCT) and must agree exactly.

    Scale shape: events collapse to one bitmap per (day, id-bucket) —
    the window then slides over |days| x |buckets| KILOBYTE-sized rows
    regardless of event volume; this is why mergeable summaries, not
    raw distincts, are the rolling-metric currency at 100 TB. The
    (day x bucket) grid is densified first: a bucket silent on day d
    must still surface the users it saw on days d-6..d-1."""
    e = load_table(spark, sf_dir, "events")
    partials = (
        e.select(
            F.to_date("ts").alias("day"),
            F.expr("bitmap_bucket_number(user_id)").alias("bk"),
            F.expr("bitmap_bit_position(user_id)").alias("bp"),
        )
        .groupBy("day", "bk")
        .agg(F.expr("bitmap_construct_agg(bp)").alias("bm"))
    )
    grid = (
        partials.select("day")
        .distinct()
        .crossJoin(partials.select("bk").distinct())
    )
    dense = grid.join(partials, ["day", "bk"], "left").withColumn(
        "di", F.unix_date("day")
    )
    dense.createOrReplaceTempView("sg_rolling_dense")
    return spark.sql(
        """
        SELECT day,
               CAST(sum(coalesce(bitmap_count(bm7), 0)) AS BIGINT)
                 AS n_active_7d
        FROM (
          SELECT day, bk,
                 bitmap_or_agg(bm) OVER (PARTITION BY bk ORDER BY di
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS bm7
          FROM sg_rolling_dense
        )
        GROUP BY day
        """
    )


@query(
    "store_incremental_agg",
    oracle="""
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1
    """,
    tags=("incremental", "mergeable", "materialized-view"),
)
def store_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the daily revenue
    rollup is maintained as BASE partials (history, days before a
    cutoff anchored at max(day)-7) merged with DELTA partials (the
    last week's arrivals) — merge(partial, partial) on the group key,
    never a recompute over history. The oracle IS the full recompute,
    so the differential proves merge ≡ recompute exactly.

    Exactness: count partials add associatively; revenue partials are
    DECIMAL sums (exact, order/merge-independent) and only the merged
    total is cast to double — the same discipline every mergeable
    summary in this engine follows (sketches above, dsum elsewhere).

    Scale shape: the delta scan reads ONLY the new partition(s) when
    the store is day-partitioned (partition pruning); the merge
    shuffles |days| rows of partial state, not the 100 TB of history
    — that is the entire point of incremental view maintenance. Here
    both sides come from one table, split by a data-derived cutoff
    (no wall clock)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("day"),
        F.col("o_totalprice").cast("decimal(18,6)").alias("price"),
    )
    cutoff = o.agg(F.date_sub(F.max("day"), 7).alias("cutoff"))
    o = o.crossJoin(F.broadcast(cutoff))

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("day").agg(
            F.count("*").cast("bigint").alias("pn"),
            F.sum("price").alias("prev"),
        )

    base = partial(o.where(F.col("day") < F.col("cutoff")))
    delta = partial(o.where(F.col("day") >= F.col("cutoff")))
    merged = (
        base.unionByName(delta)
        .groupBy("day")
        .agg(F.sum("pn").cast("bigint").alias("n_orders"), F.sum("prev").alias("rev"))
    )
    return merged.select(
        "day", "n_orders", F.col("rev").cast("double").alias("revenue")
    )


@query(
    "agg_heavy_hitters",
    oracle="""
    WITH k AS (
        SELECT CAST(floor(sqrt(o_custkey)) AS BIGINT) AS merchant_id FROM orders
    ),
    c AS (
        SELECT merchant_id, CAST(count(*) AS BIGINT) AS cnt FROM k GROUP BY 1
    ),
    t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c)
    SELECT merchant_id, cnt,
           CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE) AS support
    FROM c, t
    WHERE cnt * 100 > n
    ORDER BY cnt DESC, merchant_id ASC
    """,
    tags=("heavy-hitters", "frequency", "skew"),
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """phi-frequent items (heavy hitters): every key with support
    above 1% of all rows, with its exact support fraction. The key is
    a derived merchant id (floor(sqrt(custkey))) whose group sizes
    grow linearly — a deterministic stand-in for the power-law keys
    (hot users, hot domains, hot SKUs) heavy-hitter queries exist
    for. The threshold compare is pure integer math (cnt*100 > n), so
    membership is exact on both engines; sqrt is IEEE
    correctly-rounded, identical cross-engine.

    Scale shape: one count shuffle on the key (2-phase, map-side
    partial), a 1-row total broadcast back, narrow filter. This exact
    form is already 100 TB-shaped because the intermediate is |keys|
    rows, not |rows|; when |keys| itself explodes (unbounded key
    domains), the bounded-memory swap is a Misra-Gries / SpaceSaving
    summary with the same > phi·n contract, merged per-partition like
    the sketches above."""
    o = load_table(spark, sf_dir, "orders")
    counts = (
        o.select(F.floor(F.sqrt(F.col("o_custkey"))).cast("bigint").alias("merchant_id"))
        .groupBy("merchant_id")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").cast("bigint").alias("n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * 100 > F.col("n"))
        .select(
            "merchant_id",
            "cnt",
            (F.col("cnt").cast("double") / F.col("n").cast("double")).alias("support"),
        )
        .orderBy(F.desc("cnt"), F.asc("merchant_id"))
    )


@query(
    "agg_bitmap_set_ops",
    oracle="""
    SELECT CAST(count(DISTINCT CASE WHEN event_type = 'click'
                                    THEN user_id END) AS BIGINT) AS n_click,
           CAST(count(DISTINCT CASE WHEN event_type = 'view'
                                    THEN user_id END) AS BIGINT) AS n_view,
           CAST(count(DISTINCT CASE WHEN event_type IN ('click', 'view')
                                    THEN user_id END) AS BIGINT) AS n_union,
           CAST(count(DISTINCT CASE WHEN event_type = 'click'
                                    THEN user_id END)
                + count(DISTINCT CASE WHEN event_type = 'view'
                                      THEN user_id END)
                - count(DISTINCT CASE WHEN event_type IN ('click', 'view')
                                      THEN user_id END)
                AS BIGINT) AS n_both,
           CAST(count(DISTINCT CASE WHEN event_type IN ('click', 'view')
                                    THEN user_id END)
                - count(DISTINCT CASE WHEN event_type = 'view'
                                      THEN user_id END)
                AS BIGINT) AS n_click_only
    FROM events
    """,
    tags=("sketch", "bitmap", "set-algebra", "audience-overlap"),
)
def agg_bitmap_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap algebra on exact bitmaps: distinct users who
    clicked, who viewed, who did either (bitmap OR), who did BOTH
    (inclusion-exclusion: |A| + |B| - |A∪B| — no bitmap AND needed),
    and who only clicked. This is the segment-overlap query every
    audience platform serves, and the bitmap formulation is what lets
    a 100 TB store answer it from per-day per-bucket bitmap partials
    instead of re-shuffling raw user ids (same machinery as
    agg_bitmap_distinct, extended from counting to SET ALGEBRA).

    Scale shape: one pass builds both sides' partial bitmaps keyed by
    (id-bucket) — map-side combinable, kilobyte partials — and every
    set operation happens on merged bitmaps per bucket; only 5
    integers leave the aggregation. The COUNT(DISTINCT CASE...)
    oracle proves all five numbers exact."""
    e = load_table(spark, sf_dir, "events")
    partials = (
        e.where(F.col("event_type").isin("click", "view"))
        .select(
            F.expr("bitmap_bucket_number(user_id)").alias("bk"),
            F.expr("bitmap_bit_position(user_id)").alias("bp"),
            "event_type",
        )
        .groupBy("bk")
        .agg(
            F.expr(
                "bitmap_construct_agg(CASE WHEN event_type = 'click' "
                "THEN bp END)"
            ).alias("bm_click"),
            F.expr(
                "bitmap_construct_agg(CASE WHEN event_type = 'view' "
                "THEN bp END)"
            ).alias("bm_view"),
            F.expr("bitmap_construct_agg(bp)").alias("bm_any"),
        )
    )
    counted = partials.agg(
        F.sum(F.expr("bitmap_count(bm_click)")).cast("bigint").alias("n_click"),
        F.sum(F.expr("bitmap_count(bm_view)")).cast("bigint").alias("n_view"),
        F.sum(F.expr("bitmap_count(bm_any)")).cast("bigint").alias("n_union"),
    )
    return counted.select(
        "n_click",
        "n_view",
        "n_union",
        (F.col("n_click") + F.col("n_view") - F.col("n_union")).alias("n_both"),
        (F.col("n_union") - F.col("n_view")).alias("n_click_only"),
    )


CMS_DEPTHS = ("1", "2", "3", "4")  # 4 independent hash rows
# Cell id = first 2 hex chars of md5(key:depth) -> 256 columns/row.
# md5 is the one keyed hash both engines spell identically, and the
# 2-hex-char prefix IS the "mod width" step with no integer-parsing
# portability trap (same trick as the LSH band keys in dedup.py).


@query(
    "agg_countmin_sketch",
    oracle=f"""
    WITH keyed AS (
        SELECT user_id, CAST(user_id AS VARCHAR) AS k FROM events
    ),
    cells AS (
        SELECT d.depth, substr(md5(k || ':' || d.depth), 1, 2) AS cell,
               CAST(count(*) AS BIGINT) AS cnt
        FROM keyed, (VALUES {", ".join(f"('{d}')" for d in CMS_DEPTHS)})
             AS d(depth)
        GROUP BY 1, 2
    ),
    top AS (
        SELECT user_id, k, CAST(count(*) AS BIGINT) AS exact_cnt
        FROM keyed GROUP BY 1, 2
        ORDER BY exact_cnt DESC, user_id ASC LIMIT 5
    ),
    est AS (
        SELECT t.user_id, t.exact_cnt,
               CAST(min(c.cnt) AS BIGINT) AS est_cnt
        FROM top t JOIN cells c
          ON c.cell = substr(md5(t.k || ':' || c.depth), 1, 2)
        GROUP BY 1, 2
    )
    SELECT user_id, exact_cnt, est_cnt,
           est_cnt - exact_cnt AS overestimate
    FROM est
    ORDER BY exact_cnt DESC, user_id ASC
    """,
    tags=("sketch", "count-min", "frequency", "mergeable"),
)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch, built and probed as plain aggregates: a
    4x256 grid of counters (depth = 4 independent md5-keyed hash
    rows, width = 256 cells via the 2-hex-char prefix), point-queried
    for the 5 exact-heaviest keys. The CMS guarantee — est >= exact,
    overestimate bounded by collisions — is surfaced directly
    (``overestimate`` is provably >= 0, and the differential pins the
    exact collision pattern cross-engine since both engines hash with
    the same md5).

    Scale shape: the sketch build is ONE map-side-combinable
    aggregate whose output is <= depth x width = 1024 rows of
    kilobyte state, no matter how many input rows — the mergeable-
    summary contract (partial grids add cellwise, so per-day /
    per-partition sketches OR into a corpus sketch like the bitmaps
    above). The probe side broadcasts the 1024-row grid and joins on
    the computed cell key — an expression-equality broadcast hash
    join, zero shuffle of the probe keys. At 100 TB the exact top-5
    anchor would itself come from agg_heavy_hitters; here it doubles
    as the ground truth the estimate is judged against."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("user_id").cast("string").alias("k")
    )
    depths = F.array(*[F.lit(d) for d in CMS_DEPTHS])
    cells = (
        e.select("k", F.explode(depths).alias("depth"))
        .select(
            "depth",
            F.expr("substr(md5(concat(k, ':', depth)), 1, 2)").alias("cell"),
        )
        .groupBy("depth", "cell")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    top = (
        e.groupBy("user_id", "k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("user_id"))
        .limit(5)
    )
    # Probe cells are computed on the PROBE side (explode the depths,
    # hash there) so the join is a plain (depth, cell) equality — a
    # broadcast HASH join; putting the md5 inside the join condition
    # would reference both sides and force a nested-loop join.
    probes = top.select(
        "user_id", "exact_cnt", F.explode(depths).alias("depth"), "k"
    ).select(
        "user_id",
        "exact_cnt",
        "depth",
        F.expr("substr(md5(concat(k, ':', depth)), 1, 2)").alias("cell"),
    )
    est = (
        probes.join(F.broadcast(cells), ["depth", "cell"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("cnt").cast("bigint").alias("est_cnt"))
    )
    return est.select(
        "user_id",
        "exact_cnt",
        "est_cnt",
        (F.col("est_cnt") - F.col("exact_cnt")).alias("overestimate"),
    ).orderBy(F.desc("exact_cnt"), F.asc("user_id"))


@query(
    "agg_kmv_distinct",
    oracle="""
    WITH h AS (
        SELECT DISTINCT CAST(CAST(('0x' || substring(
                   md5(CAST(user_id AS VARCHAR)), 1, 12)) AS UBIGINT)
               AS BIGINT) AS h
        FROM events WHERE user_id IS NOT NULL
    ),
    kth AS (
        SELECT CAST(max(h) AS BIGINT) AS theta,
               CAST(count(*) AS BIGINT) AS kk
        FROM (SELECT h FROM h ORDER BY h LIMIT 256)
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS true_distinct FROM h)
    SELECT CAST(256 AS BIGINT) AS k, kth.theta, kth.kk, tot.true_distinct,
           CAST(CASE WHEN kth.kk < 256 THEN tot.true_distinct
                ELSE 255 * 281474976710656 // kth.theta END
                AS BIGINT) AS est_distinct
    FROM kth, tot
    """,
    tags=("sketch", "distinct", "kmv", "engine-addition"),
)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch — the mergeable
    cardinality estimator whose state is just the k smallest distinct
    hash values (union sketches = merge lists, keep k smallest; the
    theta-sketch family's core). Unlike HLL (whose register
    internals forced agg_approx_distinct to a rows-only check), KMV
    over a CONTENT hash is fully deterministic, so the estimate
    (k-1)*2^48 div theta is oracle-paired EXACTLY — a sketch with a
    green hash differential, plus the true distinct count alongside
    for the observed error.

    Scale: the distinct-hash dedup is one shuffle; the k smallest
    arrive via TakeOrderedAndProject (per-partition top-k then one
    k-row merge — no global sort). At 100 TB the sketch state is
    256 longs regardless of cardinality."""
    h = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 12),
                16,
                10,
            )
            .cast("bigint")
            .alias("h")
        )
        .distinct()
    )
    kth = (
        h.orderBy("h")
        .limit(256)
        .agg(
            F.max("h").cast("bigint").alias("theta"),
            F.count("*").cast("bigint").alias("kk"),
        )
    )
    tot = h.agg(F.count("*").cast("bigint").alias("true_distinct"))
    return kth.crossJoin(tot).select(
        F.lit(256).cast("bigint").alias("k"),
        "theta",
        "kk",
        "true_distinct",
        F.when(F.col("kk") < 256, F.col("true_distinct"))
        .otherwise(F.expr("255 * 281474976710656 div theta"))
        .cast("bigint")
        .alias("est_distinct"),
    )


@query(
    "store_incremental_join",
    oracle="""
    SELECT c.c_nationkey AS nationkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=("incremental", "materialized-view", "join", "engine-addition"),
)
def store_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view when BOTH sides change
    — the bilinear delta rule: with fact F -> F ∪ dF and dimension
    D -> D ∪ dD, the view delta is dF⋈D ∪ F⋈dD ∪ dF⋈dD, merged with
    the old view's partial state; history is NEVER re-joined against
    history. Here orders split on a data-anchored date cutoff
    (dF = last 30 days) and customers on a key residue (dD = every
    10th customer, a deterministic stand-in for new signups).

    The four delta terms are computed as GROUPS of one tagged join,
    not four plan branches (VERDICT r7 #2: the branch form re-scanned
    orders x5 and customer x4 on the same paths): each side carries
    its old/new slice flag through ONE broadcast join, the first
    rollup keys on (nation, fact_is_new, dim_is_new) — producing
    exactly the four terms' per-nation partials (bigint counts, exact
    decimal revenue) as rows — and the merge folds them on the group
    key, precisely the partial-state merge an incremental refresh
    runs. The oracle is the monolithic join+rollup recompute, so the
    green hash proves the term expansion loses and duplicates
    nothing.

    Scale: one pruned scan per side per refresh (plus a one-row
    cutoff agg); in a real store the dominant term (F_old ⋈ D_old,
    fact_new=dim_new=false) is amortized state — each refresh
    re-aggregates only partitions holding delta rows, and the term
    partials here are byte-sized (4 rows per nation) however large
    the fact side grows."""
    o = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("day"),
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,6)").alias("price"),
    )
    cutoff = o.agg(F.date_sub(F.max("day"), 30).alias("cutoff"))
    fact = o.crossJoin(F.broadcast(cutoff)).select(
        "o_custkey",
        "price",
        (F.col("day") >= F.col("cutoff")).alias("fact_new"),
    )
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        (F.col("c_custkey") % 10 == 0).alias("dim_new"),
    )
    partials = (
        fact.join(F.broadcast(dim), fact.o_custkey == dim.c_custkey)
        .groupBy("c_nationkey", "fact_new", "dim_new")
        .agg(
            F.count("*").cast("bigint").alias("pn"),
            F.sum("price").alias("prev"),
        )
    )
    merged = partials.groupBy("c_nationkey").agg(
        F.sum("pn").cast("bigint").alias("n_orders"),
        F.sum("prev").alias("rev"),
    )
    return merged.select(
        F.col("c_nationkey").alias("nationkey"),
        "n_orders",
        F.col("rev").cast("double").alias("revenue"),
    ).orderBy("nationkey")


THETA_K = 256
THETA_ONE = 281474976710656  # 2^48: sampling probability 1.0


@query(
    "agg_theta_sketch_ops",
    oracle=f"""
    WITH ha AS MATERIALIZED (
        SELECT DISTINCT CAST(CAST(('0x' || substring(
                   md5(CAST(user_id AS VARCHAR)), 1, 12)) AS UBIGINT)
               AS BIGINT) AS h
        FROM events WHERE event_type = 'view' AND user_id IS NOT NULL
    ),
    hb AS MATERIALIZED (
        SELECT DISTINCT CAST(CAST(('0x' || substring(
                   md5(CAST(user_id AS VARCHAR)), 1, 12)) AS UBIGINT)
               AS BIGINT) AS h
        FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
    ),
    sa AS MATERIALIZED (SELECT h FROM ha ORDER BY h LIMIT {THETA_K}),
    sb AS MATERIALIZED (SELECT h FROM hb ORDER BY h LIMIT {THETA_K}),
    th AS (
        SELECT least(
                 CASE WHEN (SELECT count(*) FROM sa) < {THETA_K}
                      THEN {THETA_ONE} ELSE (SELECT max(h) FROM sa) END,
                 CASE WHEN (SELECT count(*) FROM sb) < {THETA_K}
                      THEN {THETA_ONE} ELSE (SELECT max(h) FROM sb) END
               ) AS theta
    ),
    inter AS (
        SELECT CAST(count(*) AS BIGINT) AS cnt
        FROM sa JOIN sb ON sa.h = sb.h CROSS JOIN th
        WHERE sa.h < th.theta
    ),
    uni AS (
        SELECT CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT h FROM sa UNION SELECT h FROM sb) u CROSS JOIN th
        WHERE u.h < th.theta
    ),
    ex AS (
        SELECT CAST((SELECT count(*) FROM ha JOIN hb ON ha.h = hb.h)
                    AS BIGINT) AS exact_inter,
               CAST((SELECT count(*)
                     FROM (SELECT h FROM ha UNION SELECT h FROM hb))
                    AS BIGINT) AS exact_union
    )
    SELECT CAST({THETA_K} AS BIGINT) AS k, th.theta,
           CAST(inter.cnt * {THETA_ONE} // th.theta AS BIGINT)
               AS est_intersection,
           ex.exact_inter AS exact_intersection,
           CAST(uni.cnt * {THETA_ONE} // th.theta AS BIGINT) AS est_union,
           ex.exact_union
    FROM th, inter, uni, ex
    """,
    tags=("sketch", "distinct", "theta", "set-ops", "engine-addition"),
)
def agg_theta_sketch_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET ALGEBRA — what bitmap set ops
    (agg_bitmap_set_ops, exact) cost too much for at 100 TB key
    domains: audience overlap estimated from two KMV/theta sketches
    (k smallest content hashes; an unsaturated sketch has theta = 1,
    i.e. 2^48). Intersection and union estimates follow the standard
    theta rule — count sketch entries below theta = min(theta_a,
    theta_b), scale by 2^48/theta — and because the 'random' hashes
    are content-derived md5 prefixes, the ESTIMATES themselves are
    deterministic and oracle-paired exactly (same property that made
    agg_kmv_distinct pairable where HLL was not). Exact counts ride
    along for the observed error.

    Scale: each sketch is one distinct-hash shuffle +
    TakeOrderedAndProject top-k; the set ops run on 256-row sketch
    tables — constant state no matter the audience size, and sketch
    merge is associative, so partial sketches combine across
    partitions/days without re-reading history."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())

    def hashes(event_type: str) -> DataFrame:
        return (
            e.where(F.col("event_type") == event_type)
            .select(
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 12),
                    16,
                    10,
                )
                .cast("bigint")
                .alias("h")
            )
            .distinct()
        )

    ha = hashes("view").transform(materialize)
    hb = hashes("purchase").transform(materialize)
    sa = ha.orderBy("h").limit(THETA_K).transform(materialize)
    sb = hb.orderBy("h").limit(THETA_K).transform(materialize)

    def theta_of(s: DataFrame) -> DataFrame:
        return s.agg(
            F.when(F.count("*") < THETA_K, F.lit(THETA_ONE))
            .otherwise(F.max("h"))
            .cast("bigint")
            .alias("t")
        )

    th = (
        theta_of(sa)
        .withColumnRenamed("t", "ta")
        .crossJoin(theta_of(sb).withColumnRenamed("t", "tb"))
        .select(F.least("ta", "tb").alias("theta"))
        .transform(materialize)
    )
    inter = (
        sa.join(sb, "h")
        .crossJoin(F.broadcast(th))
        .where(F.col("h") < F.col("theta"))
        .agg(F.count("*").cast("bigint").alias("inter_cnt"))
    )
    uni = (
        sa.unionByName(sb)
        .distinct()
        .crossJoin(F.broadcast(th))
        .where(F.col("h") < F.col("theta"))
        .agg(F.count("*").cast("bigint").alias("uni_cnt"))
    )
    ex = (
        ha.join(hb, "h")
        .agg(F.count("*").cast("bigint").alias("exact_intersection"))
        .crossJoin(
            ha.unionByName(hb)
            .distinct()
            .agg(F.count("*").cast("bigint").alias("exact_union"))
        )
    )
    return (
        th.crossJoin(inter)
        .crossJoin(uni)
        .crossJoin(ex)
        .select(
            F.lit(THETA_K).cast("bigint").alias("k"),
            "theta",
            F.expr(
                f"CAST(inter_cnt * {THETA_ONE} div theta AS BIGINT)"
            ).alias("est_intersection"),
            "exact_intersection",
            F.expr(f"CAST(uni_cnt * {THETA_ONE} div theta AS BIGINT)").alias(
                "est_union"
            ),
            "exact_union",
        )
    )


# Mergeable quantile sketch (VERDICT r7 #5): an HDR-histogram-lite —
# exponential buckets with QSK_SUB sub-buckets per octave, giving a
# guaranteed <= 1/QSK_SUB relative-error bracket for any rank query.
# Unlike GK/KLL (whose compaction state is order-dependent and
# engine-internal), the integer-bucket histogram is DETERMINISTIC and
# bucket-wise ADDITIVE: merge(sketch_a, sketch_b) = per-bucket count
# sum — so per-partition/per-shard partials OR-merge exactly like the
# bitmap/KMV/theta family above, and the merged sketch is PROVABLY
# identical to the direct single-pass build. Values below 2^(SUB_BITS
# + 1) are stored exact (their own bucket). All arithmetic is integer
# (bucket = bit-length + sub-bucket via div/mod), so both engines
# agree bit-for-bit — the oracle builds the histogram DIRECTLY while
# the engine builds per-shard partials and merges, and the green hash
# IS the merge ≡ direct proof (the store_incremental_agg discipline).
QSK_SUB_BITS = 4  # 16 sub-buckets per octave: rel. error <= 1/16


def _qsk_bucket_sql(cents: str, pow2, idiv: str) -> str:
    """Bucket id from exact integer cents; `pow2(k)` renders 2^k and
    `idiv` the integer-division operator in the target dialect
    (Spark shiftleft + div / DuckDB << + //)."""
    e = f"(length(bin({cents})) - 1)"
    small = 1 << (QSK_SUB_BITS + 1)
    return (
        f"CASE WHEN {cents} < {small} THEN {cents} "
        f"ELSE {e} * {1 << QSK_SUB_BITS} "
        f"+ (({cents} {idiv} {pow2(f'{e} - {QSK_SUB_BITS}')})"
        f" % {1 << QSK_SUB_BITS})"
        f" END"
    )


def _qsk_bounds_sql(bucket: str, pow2, idiv: str) -> tuple[str, str]:
    """(lo, hi) inclusive value bounds of a bucket id."""
    small = 1 << (QSK_SUB_BITS + 1)
    sub = 1 << QSK_SUB_BITS
    e = f"({bucket} {idiv} {sub})"
    width = pow2(f"{e} - {QSK_SUB_BITS}")
    lo = (
        f"CASE WHEN {bucket} < {small} THEN {bucket} "
        f"ELSE ({sub} + ({bucket} % {sub})) * {width} END"
    )
    hi = (
        f"CASE WHEN {bucket} < {small} THEN {bucket} "
        f"ELSE ({sub} + ({bucket} % {sub})) * {width} + {width} - 1 END"
    )
    return lo, hi


def _spark_pow2(k: str) -> str:
    return f"shiftleft(CAST(1 AS BIGINT), CAST({k} AS INT))"


def _duck_pow2(k: str) -> str:
    return f"(CAST(1 AS BIGINT) << ({k}))"


_QSK_QUANTILES = (50, 90, 95, 99)


def _qsk_hist_oracle() -> str:
    pow2 = _duck_pow2
    bucket = _qsk_bucket_sql("cents", pow2, "//")
    lo, hi = _qsk_bounds_sql("bucket", pow2, "//")
    return f"""
    WITH c AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
        FROM lineitem
    ),
    b AS (SELECT CAST({bucket} AS BIGINT) AS bucket FROM c),
    hist AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS n
        FROM b GROUP BY bucket
    )
    SELECT bucket,
           CAST({lo} AS BIGINT) AS lo_cents,
           CAST({hi} AS BIGINT) AS hi_cents,
           n,
           CAST(sum(n) OVER (ORDER BY bucket) AS BIGINT) AS cum_n
    FROM hist ORDER BY bucket
    """


@query(
    "agg_quantile_sketch_hist",
    oracle=_qsk_hist_oracle(),
    tags=("sketch", "quantile", "mergeable", "engine-addition"),
)
def agg_quantile_sketch_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable quantile sketch itself (module comment above):
    the engine builds PER-SHARD partial histograms (shard =
    l_orderkey % 8, standing in for per-partition/per-day partials),
    merges them by per-bucket count addition — the sketch's merge
    operator — and emits the merged histogram with exact value
    bounds and cumulative counts; the oracle builds the histogram
    DIRECTLY from the raw rows, so the green hash proves
    merge(partials) ≡ direct for every bucket.

    Scale shape: one map-side-combinable (shard, bucket) aggregate
    over the scan, one |shards|x|buckets| merge shuffle, one ordered
    window over the ~200-row sketch. At 100 TB the sketch state is
    ~16 longs per octave regardless of row count — the property that
    lets a 1000-executor job ship per-partition partials to one
    reducer, or a store keep per-day sketches and answer any
    range-of-days rank query by merging."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        (F.col("l_orderkey") % 8).alias("shard"),
    )
    bucket = _qsk_bucket_sql("cents", _spark_pow2, "div")
    b = li.select(
        "shard", F.expr(bucket).cast("bigint").alias("bucket")
    )
    partials = b.groupBy("shard", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("pn")
    )
    merged = partials.groupBy("bucket").agg(
        F.sum("pn").cast("bigint").alias("n")
    )
    lo, hi = _qsk_bounds_sql("bucket", _spark_pow2, "div")
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return merged.select(
        "bucket",
        F.expr(lo).cast("bigint").alias("lo_cents"),
        F.expr(hi).cast("bigint").alias("hi_cents"),
        "n",
        F.sum("n").over(w).cast("bigint").alias("cum_n"),
    ).orderBy("bucket")


def _qsk_rank_oracle() -> str:
    hist = _qsk_hist_oracle()
    qvals = ", ".join(f"({q})" for q in _QSK_QUANTILES)
    return f"""
    WITH sk AS ({hist}),
    tot AS (SELECT CAST(max(cum_n) AS BIGINT) AS n_total FROM sk),
    q AS (SELECT q FROM (VALUES {qvals}) AS v(q)),
    pick AS (
        SELECT q.q, tot.n_total, sk.bucket, sk.lo_cents, sk.hi_cents,
               row_number() OVER (
                   PARTITION BY q.q ORDER BY sk.bucket) AS rn
        FROM q CROSS JOIN tot
        JOIN sk ON sk.cum_n * 100 >= q.q * tot.n_total
    )
    SELECT CAST(q AS BIGINT) AS q_pct, n_total,
           CAST((q * n_total + 99) // 100 AS BIGINT) AS rank_r,
           bucket, lo_cents AS est_lo_cents, hi_cents AS est_hi_cents
    FROM pick WHERE rn = 1 ORDER BY q_pct
    """


@query(
    "agg_quantile_sketch_rank",
    oracle=_qsk_rank_oracle(),
    tags=("sketch", "quantile", "mergeable", "engine-addition"),
)
def agg_quantile_sketch_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank (quantile) queries served FROM the merged sketch: for each
    target percentile, the first bucket whose cumulative count covers
    the rank — the answer is the exact integer bracket
    [lo_cents, hi_cents], guaranteed to contain the true order
    statistic with relative width <= 1/16 (test_sketches pins the
    bracket against the exactly-computed quantile). The engine serves
    the query from its shard-merged sketch, the oracle from its
    direct-built one — same green-hash merge proof as the histogram.

    Scale shape: everything after the sketch build touches ~200
    bucket rows; the rank query itself is a broadcast join against a
    4-row quantile spec. This is the query a telemetry store answers
    per-dashboard-refresh without rescanning history."""
    # ~200-bucket sketch consumed twice (total + the rank join):
    # staged, or the whole sketch build re-runs per consumer
    sk = materialize(agg_quantile_sketch_hist(spark, sf_dir))
    tot = sk.agg(F.max("cum_n").cast("bigint").alias("n_total"))
    qs = spark.createDataFrame(
        [(q,) for q in _QSK_QUANTILES], "q int"
    )
    from pyspark.sql import Window

    pick = (
        qs.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(sk),
            F.col("cum_n") * 100 >= F.col("q") * F.col("n_total"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("q").orderBy("bucket")
            ),
        )
        .where(F.col("rn") == 1)
    )
    return pick.select(
        F.col("q").cast("bigint").alias("q_pct"),
        "n_total",
        F.expr("CAST((q * n_total + 99) div 100 AS BIGINT)").alias("rank_r"),
        "bucket",
        F.col("lo_cents").alias("est_lo_cents"),
        F.col("hi_cents").alias("est_hi_cents"),
    ).orderBy("q_pct")


def _qsk_windowed_oracle() -> str:
    pow2 = _duck_pow2
    from ..functions.numeric import finite_measure_sql

    cents_src = (
        f"CAST(CAST({finite_measure_sql('value')} AS DECIMAL(18,2)) * 100"
        " AS BIGINT)"
    )
    bucket = _qsk_bucket_sql("cents", pow2, "//")
    lo, hi = _qsk_bounds_sql("bucket", pow2, "//")
    return f"""
    WITH c AS (
        SELECT CAST(ts AS DATE) AS day, cents
        FROM (SELECT ts, {cents_src} AS cents FROM events)
        WHERE cents IS NOT NULL
    ),
    daily AS (
        SELECT day, CAST({bucket} AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS pn
        FROM c GROUP BY 1, 2
    ),
    dense AS (
        -- densify: a bucket silent on day d must still carry its
        -- d-1/d-2 partials into d's merged sketch
        SELECT g.day, g.bucket, coalesce(d.pn, 0) AS pn
        FROM (SELECT dd.day, bb.bucket
              FROM (SELECT DISTINCT day FROM daily) dd
              CROSS JOIN (SELECT DISTINCT bucket FROM daily) bb) g
        LEFT JOIN daily d ON d.day = g.day AND d.bucket = g.bucket
    ),
    merged AS (
        SELECT day, bucket,
               CAST(sum(pn) OVER (PARTITION BY bucket
                   ORDER BY datediff('day', DATE '1970-01-01', day)
                   RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n
        FROM dense
    ),
    cum AS (
        SELECT day, bucket, n,
               CAST(sum(n) OVER (PARTITION BY day ORDER BY bucket)
                    AS BIGINT) AS cum_n,
               CAST(sum(n) OVER (PARTITION BY day) AS BIGINT) AS total_n
        FROM merged
    ),
    pick AS (
        SELECT day, bucket, total_n,
               row_number() OVER (PARTITION BY day ORDER BY bucket) AS rn
        FROM cum WHERE cum_n * 10 >= 9 * total_n
    )
    SELECT day, total_n AS n_3d,
           CAST({lo} AS BIGINT) AS p90_lo_cents,
           CAST({hi} AS BIGINT) AS p90_hi_cents
    FROM pick WHERE rn = 1 ORDER BY day
    """


@query(
    "agg_quantile_sketch_windowed",
    oracle=_qsk_windowed_oracle(),
    tags=("sketch", "quantile", "mergeable", "window", "engine-addition"),
)
def agg_quantile_sketch_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The payoff of sketch MERGEABILITY across time: per-day partial
    quantile sketches (the state a telemetry store keeps per
    partition) merged into a trailing-3-day sketch for EVERY day by
    bucket-wise window addition, then the rolling p90 bracket read
    straight off each merged sketch — no rescan of any day's raw
    rows, which at 100 TB is the difference between a dashboard
    refresh and a table scan. The measure is the finite-gated events
    telemetry (non-finite readings are unmeasured per the round-8
    contract; `audit_nonfinite_measures` is the companion readout).

    Everything is integer (counts, bucket math, cross-multiplied rank
    test cum*10 >= 9*total), so the per-day partial build, the merge,
    and the rank pick are bit-identical cross-engine — the oracle
    recomputes the same pipeline from raw rows and the green hash
    proves merge-over-days ≡ direct.

    Scale shape: one map-side-combinable (day, bucket) aggregate over
    the scan, then three windows over the |days| x |buckets| sketch
    table (~200 rows/day). RANGE framing on the day index keeps
    calendar gaps honest."""
    from pyspark.sql import Window

    from ..functions.numeric import finite_measure

    e = load_table(spark, sf_dir, "events")
    cents = (finite_measure("value").cast("decimal(18,2)") * 100).cast(
        "bigint"
    )
    c = e.select(F.to_date("ts").alias("day"), cents.alias("cents")).where(
        F.col("cents").isNotNull()
    )
    bucket = _qsk_bucket_sql("cents", _spark_pow2, "div")
    daily = (
        c.select("day", F.expr(bucket).cast("bigint").alias("bucket"))
        .groupBy("day", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pn"))
    )
    # densify (day x bucket): a bucket silent on day d must still
    # carry its d-1/d-2 partials into d's merged sketch (the invariant
    # test caught exactly this; same dense-grid rule as
    # agg_rolling_distinct_users)
    grid = daily.select("day").distinct().crossJoin(
        daily.select("bucket").distinct()
    )
    dense = grid.join(daily, ["day", "bucket"], "left").select(
        "day", "bucket", F.coalesce("pn", F.lit(0)).alias("pn")
    )
    w_merge = (
        Window.partitionBy("bucket")
        .orderBy(F.unix_date("day"))
        .rangeBetween(-2, 0)
    )
    merged = dense.select(
        "day",
        "bucket",
        F.sum("pn").over(w_merge).cast("bigint").alias("n"),
    )
    w_cum = Window.partitionBy("day").orderBy("bucket")
    w_day = Window.partitionBy("day")
    cum = merged.select(
        "day",
        "bucket",
        "n",
        F.sum("n").over(w_cum).cast("bigint").alias("cum_n"),
        F.sum("n").over(w_day).cast("bigint").alias("total_n"),
    )
    lo, hi = _qsk_bounds_sql("bucket", _spark_pow2, "div")
    pick = (
        cum.where(F.col("cum_n") * 10 >= 9 * F.col("total_n"))
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("day").orderBy("bucket"))
        )
        .where(F.col("rn") == 1)
    )
    return pick.select(
        "day",
        F.col("total_n").alias("n_3d"),
        F.expr(lo).cast("bigint").alias("p90_lo_cents"),
        F.expr(hi).cast("bigint").alias("p90_hi_cents"),
    ).orderBy("day")
