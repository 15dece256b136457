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
