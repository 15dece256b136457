"""Event-time window semantics over ``events``, batch-checkable
(SURVEY.md §2.5 ST6 / §7 M4): tumbling, sliding, and session windows.

The reference has *no* windows — its "trend" charts plot raw points
(app.py:398-409). These queries define the window semantics the
streaming pipeline (streaming/pipeline.py) uses, expressed in batch so
the DuckDB oracle can check them; the streaming tests then assert the
incremental execution produces exactly these results (SURVEY.md §5.4
batch-equivalence).

Scale posture: groupBy(window, key) is one shuffle with map-side
partial aggregation; session windows are a per-user sort inside a
single hash partition (gaps-and-islands), which is exactly how
Spark's session_window executes incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..data import load_table
from ..functions.numeric import dsum, dsum_sql
from ..registry import query

HOUR_US = 3_600_000_000
HALF_HOUR_US = 1_800_000_000
SESSION_GAP_MIN = 30


@query(
    "stream_tumbling_window",
    oracle=f"""
    SELECT make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US}) AS window_start,
           make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US} + {HOUR_US}) AS window_end,
           event_type,
           count(*) AS n_events,
           {dsum_sql("value")} AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("streaming", "window", "tumbling"),
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type — the
    canonical streaming aggregate (SURVEY ST6), here in batch form via
    F.window. Oracle floors epoch-micros to the same grid."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "stream_sliding_window",
    oracle=f"""
    WITH slid AS (
        SELECT event_type, value,
               make_timestamp(
                   ((epoch_us(ts) // {HALF_HOUR_US}) - s.i) * {HALF_HOUR_US}
               ) AS window_start
        FROM events, (SELECT unnest([0, 1]) AS i) s
    )
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           event_type,
           count(*) AS n_events,
           {dsum_sql("value")} AS total_value
    FROM slid
    GROUP BY 1, 2, 3
    """,
    tags=("streaming", "window", "sliding"),
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows, 1 hour long / 30 minute slide: every event
    lands in exactly two overlapping windows. The oracle replicates
    each row onto its two 30-minute grid anchors — the same expansion
    Spark's window() generator performs physically."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "30 minutes")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "stream_session_window",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL {SESSION_GAP_MIN} MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
    ),
    sessions AS (
        SELECT user_id, ts, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, value
                                 ROWS UNBOUNDED PRECEDING) AS session_num
        FROM ordered
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS session_end,
           count(*) AS n_events,
           {dsum_sql("value")} AS total_value
    FROM sessions
    GROUP BY user_id, session_num
    """,
    tags=("streaming", "window", "session"),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user with a 30-minute inactivity gap via
    F.session_window (start = first event, end = last event + gap; a
    gap of exactly 30 min starts a new session — Spark's exclusive
    window end). The oracle derives identical sessions with the
    gaps-and-islands construction, which is also how this executes on
    engines without a session primitive."""
    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window("ts", f"{SESSION_GAP_MIN} minutes")
    return (
        ev.groupBy(sw.alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "stream_dedup_latest",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
        SELECT user_id, event_id, ts, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) r WHERE rn = 1
    """,
    tags=("streaming", "dedup", "upsert"),
)
def stream_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed upsert view: latest event per user — the batch semantics
    of the streaming pipeline's materialized latest-record table
    (reference app.py:177 find_one(sort=-1), fixed from at-least-once
    to exactly-once; SURVEY ST2/ST4)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )
