"""Change-data-capture / slowly-changing-dimension operators (engine
addition): MERGE-style upsert semantics emulated on plain parquet
with joins + unions — the pattern for dimension maintenance when the
store is not a transactional table format (Delta/Iceberg's MERGE
INTO reduces to exactly this dataflow internally).

The change batch here is derived deterministically from the data
itself (no wall clock, no RNG — registry contract): delinquent
customers (negative balance) get a segment change, near-zero-balance
customers are deleted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load_table
from ..operators.scale import materialize
from ..registry import query

NEW_SEGMENT = "DELINQUENT"


@query(
    "scd2_merge",
    oracle=f"""
    WITH dim AS (
        SELECT c_custkey AS custkey, c_mktsegment AS segment
        FROM customer
    ),
    updates AS (
        SELECT c_custkey AS custkey, '{NEW_SEGMENT}' AS segment
        FROM customer WHERE c_acctbal < 0
    ),
    deletes AS (
        SELECT c_custkey AS custkey
        FROM customer WHERE c_acctbal >= 0 AND c_acctbal < 10
    )
    SELECT d.custkey, d.segment,
           CAST(1 AS BIGINT) AS version, FALSE AS is_current
    FROM dim d
    WHERE d.custkey IN (SELECT custkey FROM updates)
       OR d.custkey IN (SELECT custkey FROM deletes)
    UNION ALL
    SELECT custkey, segment, CAST(2 AS BIGINT) AS version, TRUE AS is_current
    FROM updates
    UNION ALL
    SELECT d.custkey, d.segment, CAST(1 AS BIGINT) AS version, TRUE AS is_current
    FROM dim d
    WHERE d.custkey NOT IN (SELECT custkey FROM updates)
      AND d.custkey NOT IN (SELECT custkey FROM deletes)
    """,
    tags=("cdc", "scd2", "merge"),
)
def scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 merge without a transactional table format: apply
    an update batch (segment changes) and a delete batch to the
    customer dimension, keeping history — matched rows are expired
    (is_current=false), updates insert a new current version,
    deletes expire without replacement, untouched rows pass through.

    Dataflow: the change batches are dimension-change-rate sized, so
    both sides broadcast; the big dim table is touched by exactly one
    scan feeding a semi-join (expire), an anti-join (carry-over), and
    the update insert — at 100 TB this is the standard
    read-dim/write-dim merge job, partitioned by the dim key, and
    the three branches are one shuffle-free union of broadcast-joined
    scans. Delta/Iceberg MERGE INTO compiles to this same plan plus
    a transactional commit."""
    c = load_table(spark, sf_dir, "customer")
    dim = c.select(F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("segment"))
    # change batches are staged once (each is read twice: the touched
    # key set and its own output leg) — the plan-audit sweep showed
    # the un-staged form re-scanning customer 7x
    updates = (
        c.where(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("custkey"), F.lit(NEW_SEGMENT).alias("segment"))
        .transform(materialize)
    )
    deletes = (
        c.where((F.col("c_acctbal") >= 0) & (F.col("c_acctbal") < 10))
        .select(F.col("c_custkey").alias("custkey"))
        .transform(materialize)
    )
    touched = (
        updates.select("custkey")
        .unionByName(deletes)
        .distinct()
        .withColumn("is_touched", F.lit(True))
    )
    # every dim row emits exactly one v1 row — expired when touched,
    # carried when not — so the semi/anti branch pair collapses into
    # ONE flagged broadcast left join: the dim table is scanned once
    # (the plan-audit sweep showed the two-branch form scanning it
    # twice)
    dim_v1 = dim.join(F.broadcast(touched), "custkey", "left").select(
        "custkey",
        "segment",
        F.lit(1).cast("long").alias("version"),
        F.col("is_touched").isNull().alias("is_current"),
    )
    inserted = updates.select(
        "custkey", "segment", F.lit(2).cast("long").alias("version"),
        F.lit(True).alias("is_current"),
    )
    return dim_v1.unionByName(inserted)


@query(
    "cdc_changelog_apply",
    oracle="""
    WITH log AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               value
        FROM events
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM log
    )
    SELECT user_id, ts AS last_ts, value AS last_value
    FROM ranked WHERE rn = 1 AND op = 'U'
    """,
    tags=("cdc", "compaction"),
)
def cdc_changelog_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction, latest-wins with tombstones: the events
    table read as a keyed changelog (error events = deletes), reduced
    to the current snapshot — keys whose newest entry is a tombstone
    vanish. This is the batch form of the streaming
    maintain_latest_view, and the compaction step every CDC-fed table
    needs. One hash-partitioned window per key (ts + event_id
    tiebreak makes the winner total-ordered); at scale this is the
    standard log-compaction job partitioned by key."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    log = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        "value",
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        log.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") == "U"))
        .select("user_id", F.col("ts").alias("last_ts"), F.col("value").alias("last_value"))
    )


@query(
    "store_snapshot_diff",
    oracle=f"""
    WITH old AS (
        SELECT c_custkey AS custkey, c_mktsegment AS segment FROM customer
    ),
    new AS (
        -- next snapshot: delinquents re-segmented, near-zero balances
        -- dropped, high-balance customers cloned into a new key range
        -- (the insert batch) — all derived deterministically.
        SELECT c_custkey AS custkey,
               CASE WHEN c_acctbal < 0 THEN '{NEW_SEGMENT}'
                    ELSE c_mktsegment END AS segment
        FROM customer
        WHERE NOT (c_acctbal >= 0 AND c_acctbal < 10)
        UNION ALL
        SELECT c_custkey + 10000000 AS custkey, 'ONBOARDING' AS segment
        FROM customer WHERE c_acctbal > 9900
    )
    SELECT coalesce(o.custkey, n.custkey) AS custkey,
           CASE WHEN o.custkey IS NULL THEN 'I'
                WHEN n.custkey IS NULL THEN 'D'
                ELSE 'U' END AS op,
           o.segment AS old_segment,
           n.segment AS new_segment
    FROM old o FULL OUTER JOIN new n ON o.custkey = n.custkey
    WHERE o.custkey IS NULL OR n.custkey IS NULL
       OR o.segment IS DISTINCT FROM n.segment
    """,
    tags=("cdc", "snapshot-diff", "change-data-feed"),
)
def store_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot differencing — the change-data-feed a lakehouse emits
    between two table versions, recovered from the snapshots
    themselves when the store has no transaction log: full outer join
    on the key, classify Insert / Update / Delete, suppress no-ops
    (null-safe value comparison so NULL segments diff correctly).

    The 'new' snapshot is derived deterministically from the old one
    (delinquents re-segmented, near-zero balances deleted,
    high-balance customers cloned into a disjoint key range as the
    insert batch) — no wall clock, no RNG (registry contract).

    Scale shape: ONE shuffle on the join key for both sides (the
    same partitioning a keyed dim table already has — with bucketed
    snapshots the exchange vanishes, see store_bucketed_join), then a
    narrow classify+filter. Row-level hashes (md5 of the value
    columns) swap in for wide tables so the compare stays one column;
    here the value is a single column already."""
    c = load_table(spark, sf_dir, "customer")
    old = c.select(
        F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("segment")
    )
    new = (
        c.where(~((F.col("c_acctbal") >= 0) & (F.col("c_acctbal") < 10)))
        .select(
            F.col("c_custkey").alias("custkey"),
            F.when(F.col("c_acctbal") < 0, NEW_SEGMENT)
            .otherwise(F.col("c_mktsegment"))
            .alias("segment"),
        )
        .unionByName(
            c.where(F.col("c_acctbal") > 9900).select(
                (F.col("c_custkey") + 10000000).alias("custkey"),
                F.lit("ONBOARDING").alias("segment"),
            )
        )
    )
    o, n = old.alias("o"), new.alias("n")
    joined = o.join(n, F.col("o.custkey") == F.col("n.custkey"), "full_outer")
    return joined.where(
        F.col("o.custkey").isNull()
        | F.col("n.custkey").isNull()
        | ~F.col("o.segment").eqNullSafe(F.col("n.segment"))
    ).select(
        F.coalesce(F.col("o.custkey"), F.col("n.custkey")).alias("custkey"),
        F.when(F.col("o.custkey").isNull(), "I")
        .when(F.col("n.custkey").isNull(), "D")
        .otherwise("U")
        .alias("op"),
        F.col("o.segment").alias("old_segment"),
        F.col("n.segment").alias("new_segment"),
    )


@query(
    "join_point_in_time",
    oracle="""
    WITH versions AS (
        SELECT user_id,
               value AS profile_value,
               ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to,
               CAST(row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS BIGINT)
                 AS version_no
        FROM events WHERE event_type = 'signup'
    )
    SELECT p.event_id, p.user_id, p.ts,
           p.value AS purchase_value,
           v.profile_value, v.version_no, v.valid_from
    FROM events p
    JOIN versions v
      ON p.user_id = v.user_id
     AND p.ts >= v.valid_from
     AND (v.valid_to IS NULL OR p.ts < v.valid_to)
    WHERE p.event_type = 'purchase'
    """,
    tags=("cdc", "scd2", "point-in-time", "feature-store"),
)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) join — the feature-store correctness
    primitive: enrich each fact (purchase) with the dimension version
    that was valid AT the fact's event time, never a later one. This
    is how training pipelines avoid feature leakage: joining on the
    current dimension row would let future attribute values into
    past examples.

    The versioned dimension is built from the stream itself: each
    'signup' event opens a new profile version ([valid_from,
    valid_to) via lead() over (user_id, ts)), facts land in exactly
    one half-open interval. Dataflow: window and join share the
    user_id shuffle (AQE co-locates them), and the interval predicate
    is evaluated after the per-user equi-match — per-key version
    chains are dimension-change-rate sized, so the per-user interval
    scan is bounded; at 100 TB this is one fact shuffle + one
    version-table shuffle, no range explosion. Timestamps stay
    integer microseconds end-to-end, so the differential is exact.
    Purchases before a user's first version are dropped (inner) —
    the leakage-safe default."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    versions = (
        e.where(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("value").alias("profile_value"),
            F.col("ts").alias("valid_from"),
            "event_id",
        )
        .select(
            "user_id",
            "profile_value",
            "valid_from",
            F.lead("valid_from").over(
                Window.partitionBy("user_id").orderBy("valid_from", "event_id")
            ).alias("valid_to"),
            F.row_number()
            .over(Window.partitionBy("user_id").orderBy("valid_from", "event_id"))
            .cast("bigint")
            .alias("version_no"),
        )
    )
    p = e.where(F.col("event_type") == "purchase")
    cond = (
        (p["user_id"] == versions["user_id"])
        & (p["ts"] >= versions["valid_from"])
        & (versions["valid_to"].isNull() | (p["ts"] < versions["valid_to"]))
    )
    return p.join(versions, cond).select(
        p["event_id"],
        p["user_id"],
        p["ts"],
        p["value"].alias("purchase_value"),
        versions["profile_value"],
        versions["version_no"],
        versions["valid_from"],
    )


@query(
    "cdc_log_compaction",
    oracle="""
    WITH log_ AS (
        SELECT user_id AS k, epoch_us(ts) AS seq, event_id,
               CASE WHEN row_number() OVER (PARTITION BY user_id
                                            ORDER BY epoch_us(ts),
                                                     event_id) = 1
                    THEN 'I'
                    WHEN event_type = 'error' THEN 'D'
                    ELSE 'U' END AS op
        FROM events
    ),
    anchor AS (
        SELECT max(seq) - 7 * 86400000000 AS tombstone_horizon FROM log_
    ),
    last_ AS (
        SELECT k, op, seq FROM (
            SELECT k, op, seq,
                   row_number() OVER (PARTITION BY k
                                      ORDER BY seq DESC,
                                               event_id DESC) AS rn
            FROM log_) t
        WHERE rn = 1
    ),
    classified AS (
        SELECT l.k, l.op, l.seq,
               CASE WHEN l.op = 'D' AND l.seq < a.tombstone_horizon
                    THEN 1 ELSE 0 END AS tomb_expired
        FROM last_ l, anchor a
    )
    SELECT CAST((SELECT count(*) FROM log_) AS BIGINT) AS n_entries,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN tomb_expired = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_survivors,
           CAST(sum(CASE WHEN op = 'D' AND tomb_expired = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_tombstones_kept,
           CAST(sum(tomb_expired) AS BIGINT) AS n_tombstones_expired,
           CAST(sum(CASE WHEN tomb_expired = 0 THEN 1 ELSE 0 END)
                * 1000000 // (SELECT count(*) FROM log_) AS BIGINT)
               AS surviving_ppm
    FROM classified
    """,
    tags=("cdc", "log-compaction", "tombstone", "engine-addition"),
)
def cdc_log_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction — the Kafka-compacted-topic / LSM
    maintenance pass next to cdc_changelog_apply's APPLY: a
    deterministic changelog derives from the event stream (first
    per-user = Insert, 'error' = Delete, else Update, sequenced by
    exact microseconds + id), compaction keeps only each key's LAST
    op, and delete tombstones older than the 7-day horizon are
    dropped entirely (a reader that hasn't caught up within the
    horizon cannot rely on seeing the delete — the standard
    compaction contract). The report is the exact bookkeeping:
    entries in, keys, survivors, tombstones kept vs expired, and the
    surviving fraction in ppm.

    Scale shape: one shuffle on the key for both the sequencing
    window and the last-op pick (same partitioning); the audit is a
    1-row aggregate."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    wseq = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    log_ = e.select(
        F.col("user_id").alias("k"),
        F.unix_micros("ts").alias("seq"),
        "event_id",
        F.when(F.row_number().over(wseq) == 1, "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
    ).transform(materialize)  # read 2x: counts + last-op pick
    n_entries = log_.count()
    anchor = log_.agg(
        (F.max("seq") - F.lit(7 * 86_400_000_000)).alias("h")
    )
    wlast = Window.partitionBy("k").orderBy(
        F.desc("seq"), F.desc("event_id")
    )
    last_ = (
        log_.withColumn("rn", F.row_number().over(wlast))
        .where(F.col("rn") == 1)
        .crossJoin(F.broadcast(anchor))
        .selectExpr(
            "k", "op", "seq",
            "CASE WHEN op = 'D' AND seq < h THEN 1 ELSE 0 END"
            " AS tomb_expired",
        )
    )
    return last_.agg(
        F.lit(n_entries).cast("bigint").alias("n_entries"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(F.expr("CASE WHEN tomb_expired = 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_survivors"),
        F.sum(
            F.expr("CASE WHEN op = 'D' AND tomb_expired = 0 THEN 1 ELSE 0 END")
        )
        .cast("bigint")
        .alias("n_tombstones_kept"),
        F.sum("tomb_expired").cast("bigint").alias("n_tombstones_expired"),
        F.expr(
            f"CAST(sum(CASE WHEN tomb_expired = 0 THEN 1 ELSE 0 END)"
            f" * 1000000 div {n_entries} AS BIGINT)"
        ).alias("surviving_ppm"),
    )
