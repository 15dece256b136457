"""End-to-end training-data curation pipeline over ``documents``
(north-star extension): quality gate → exact dedup → deterministic
shard assignment → per-shard token budget. This is the composition
the individual dedup/text operators exist FOR — a corpus goes in, a
sharded training set and an audit trail come out.

The reference's analogue is its validate-then-persist ingest path
(app.py:251-254): rows either pass the required-key gate into the
store or are dropped with a log line. Here the gate is a quality
predicate, the store is sharded, and the "log line" is a first-class
audit relation (pipeline_stage_audit) instead of stderr.

Scale posture: every stage is a narrow map or a single key-partitioned
wide op (the dedup window partitions by content hash — md5-uniform, no
skew; the shard aggregate has N_SHARDS groups). Shard assignment is
content-derived (md5 prefix mod N), so re-runs and late-arriving
re-crawls land identically — no coordination, no sequence numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..data import load_table
from ..registry import query
from .dedup import COPY_OFFSET
from .text import _NORM_SQL, _norm

N_SHARDS = 8
MIN_CHARS = 200  # quality gate: drop short docs

# The synthetic corpus has near-dups but no EXACT dups, which would
# leave the dedup stage vacuously passing everything. Run the
# pipeline over corpus ∪ shifted-id copy (same probe as dedup_exact)
# so every content hash has exactly one duplicate to collapse and the
# audit's dropped_duplicate branch is exercised, not just present.
_CORPUS_SQL = f"""
        SELECT doc_id, text, n_chars FROM documents
        UNION ALL
        SELECT doc_id + {COPY_OFFSET}, text, n_chars FROM documents
"""


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    return d.unionByName(d.withColumn("doc_id", F.col("doc_id") + F.lit(COPY_OFFSET)))

# Cross-engine hex-prefix → integer: Spark conv(hex,16,10) and DuckDB
# CAST('0x'||hex AS UBIGINT) agree on the first 8 md5 hex digits
# (fits in 32 bits, no sign issues on either side).
_SHARD_SQL = (
    "CAST(CAST(('0x' || substring(content_hash, 1, 8)) AS UBIGINT) "
    f"% {N_SHARDS} AS BIGINT)"
)


def _shard_col() -> F.Column:
    return (
        F.conv(F.substring(F.col("content_hash"), 1, 8), 16, 10).cast("long")
        % N_SHARDS
    ).cast("long")


@query(
    "pipeline_training_shards",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, md5({_NORM_SQL}) AS content_hash,
               CAST(len(string_split({_NORM_SQL}, ' ')) AS BIGINT) AS n_tokens
        FROM ({_CORPUS_SQL}) corpus
        WHERE n_chars >= {MIN_CHARS}
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY content_hash ORDER BY doc_id) AS rn
        FROM docs
    )
    SELECT {_SHARD_SQL} AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM ranked WHERE rn = 1
    GROUP BY shard
    """,
    tags=("pipeline", "dedup", "shard"),
)
def pipeline_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate → exact dedup (min doc_id survives per content
    hash) → content-hash shard assignment → per-shard doc and token
    budget. At 100 TB the GROUP BY shard becomes the write
    partitioning of the output parquet (``partitionBy("shard")``);
    the budget numbers here are the manifest a training job reads.

    Plan shape: n_chars gate pushes into the parquet scan; one
    hash-partitioned window for the dedup (md5 keys — uniform); the
    final aggregate is N_SHARDS groups with map-side partials."""
    d = _corpus(spark, sf_dir).where(F.col("n_chars") >= MIN_CHARS)
    docs = d.select(
        "doc_id",
        F.md5(_norm(F.col("text"))).alias("content_hash"),
        F.size(F.split(_norm(F.col("text")), " ")).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    survivors = (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    return (
        survivors.select(_shard_col().alias("shard"), "n_tokens")
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )


@query(
    "pipeline_stage_audit",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, n_chars, md5({_NORM_SQL}) AS content_hash
        FROM ({_CORPUS_SQL}) corpus
    ),
    ranked AS (
        SELECT *, CASE WHEN n_chars >= {MIN_CHARS} THEN
            row_number() OVER (
                PARTITION BY content_hash,
                            (n_chars >= {MIN_CHARS})
                ORDER BY doc_id)
            ELSE NULL END AS rn
        FROM docs
    )
    SELECT CASE
             WHEN n_chars < {MIN_CHARS} THEN 'dropped_quality'
             WHEN rn > 1 THEN 'dropped_duplicate'
             ELSE 'kept'
           END AS stage_outcome,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM ranked
    GROUP BY stage_outcome
    """,
    tags=("pipeline", "audit"),
)
def pipeline_stage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit relation for the shard pipeline: how many docs each stage
    dropped and why — the reference logs-and-drops invalid rows
    (app.py:264-267); a pipeline at scale needs the drop reasons
    queryable, not buried in executor logs. Quality-dropped docs are
    excluded from the dedup ranking (NULL rank) so the duplicate
    counts match pipeline_training_shards' survivor set exactly."""
    docs = _corpus(spark, sf_dir).select(
        "doc_id",
        "n_chars",
        F.md5(_norm(F.col("text"))).alias("content_hash"),
    )
    passes = F.col("n_chars") >= MIN_CHARS
    w = Window.partitionBy("content_hash", passes).orderBy("doc_id")
    ranked = docs.withColumn(
        "rn", F.when(passes, F.row_number().over(w)).otherwise(F.lit(None))
    )
    return (
        ranked.select(
            F.when(~passes, "dropped_quality")
            .when(F.col("rn") > 1, "dropped_duplicate")
            .otherwise("kept")
            .alias("stage_outcome")
        )
        .groupBy("stage_outcome")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


SAMPLE_MOD = 10  # keep 1-in-10 per stratum


@query(
    "sample_hash_stratified",
    oracle=f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS chars_sampled
    FROM documents
    WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS UBIGINT) % {SAMPLE_MOD} = 0
    GROUP BY lang
    """,
    tags=("pipeline", "sample"),
)
def sample_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling, stratified per language: keep the
    docs whose id-hash lands in bucket 0 of {SAMPLE_MOD}. Unlike
    seeded RNG sampling (sample_deterministic — reproducible only
    within one engine), hash-gating is reproducible across engines,
    runs, AND repartitions — which is why training pipelines sample
    this way: the same doc is in or out forever, no matter where the
    pipeline runs or how the data is laid out. The filter is a narrow
    per-row predicate — no shuffle, scans at parquet speed; the
    per-stratum aggregate is the only wide op."""
    d = load_table(spark, sf_dir, "documents")
    keep = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % SAMPLE_MOD
        == 0
    )
    return (
        d.where(keep)
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_sampled"),
            F.sum("n_chars").cast("long").alias("chars_sampled"),
        )
    )


GROUP_CAP = 20  # max docs kept per language


@query(
    "sample_group_cap",
    oracle=f"""
    WITH ranked AS (
        SELECT lang, n_chars,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS chars_kept
    FROM ranked WHERE rn <= {GROUP_CAP}
    GROUP BY lang
    """,
    tags=("pipeline", "sample"),
)
def sample_group_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group cap: keep at most {GROUP_CAP} docs per language,
    chosen by hash order — the class-rebalancing step that stops a
    dominant language/source from swamping a training mix. Hash
    order (not doc_id order) makes the kept subset unbiased w.r.t.
    ingestion order yet fully deterministic and engine-independent;
    one window shuffle on the group key, top-N short-circuits via
    rank filter."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= GROUP_CAP)
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.sum("n_chars").cast("long").alias("chars_kept"),
        )
    )


MIX_ALPHA = 0.5  # temperature: <1 flattens the language distribution
_HASH_FRAC = (
    "CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
    "AS UBIGINT) AS DOUBLE) / 4294967296.0"
)


@query(
    "sample_temperature_mix",
    oracle=f"""
    WITH counts AS (
        SELECT lang, count(*) AS c FROM documents GROUP BY lang
    ),
    rates AS (
        SELECT lang,
               sqrt(CAST((SELECT min(c) FROM counts) AS DOUBLE) / c) AS keep_rate
        FROM counts
    )
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_kept,
           any_value(r.keep_rate) AS keep_rate
    FROM documents d
    JOIN rates r ON r.lang = d.lang
    WHERE {_HASH_FRAC} < r.keep_rate
    GROUP BY d.lang
    """,
    tags=("pipeline", "sample", "mixture"),
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed language mix (share^α reweighting with
    α = {MIX_ALPHA} — the multilingual-corpus rebalancing rule):
    each language keeps rate ∝ share^(α-1), normalized so the rarest
    class keeps everything; for α = 0.5 that reduces to
    sqrt(cnt_min / cnt_g). Each doc passes iff its id-hash fraction
    clears the rate — hash gating, not RNG, so the sampled corpus is
    reproducible across engines, runs, and repartitions forever.

    The rate is computed as sqrt of an exact integer ratio
    DELIBERATELY: IEEE sqrt and division are correctly rounded in
    both engines, while pow() is a libm-vs-JVM transcendental whose
    last ulp differs — with 500k hash fractions, some WILL land
    inside that ulp gap and flip the gate (caught by the sf0.001
    differential; ln() in the TF-IDF/PMI queries needs its rounding
    guard for the same reason).

    One count aggregate (k rows, broadcast back), one narrow filter
    scan — mixing 100 TB costs one scan plus a k-row join."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("c"))
    mn = counts.agg(F.min("c").alias("mn"))
    rates = counts.join(F.broadcast(mn)).select(
        "lang",
        F.sqrt(F.col("mn").cast("double") / F.col("c")).alias("keep_rate"),
    )
    hash_frac = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / 4294967296.0
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .where(hash_frac < F.col("keep_rate"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.any_value(F.col("keep_rate")).alias("keep_rate"),
        )
    )


@query(
    "audit_referential_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS relationship,
           (SELECT count(*) FROM lineitem) AS n_child,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
    UNION ALL
    SELECT 'orders->customer',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))
    """,
    tags=("pipeline", "audit", "join"),
)
def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts per foreign-key
    relationship — the data-quality gate a pipeline runs after every
    load, because at 100 TB with at-least-once ingest, partial loads
    WILL produce dangling references (the reference's unchecked
    insert path, app.py:220, is exactly how they arise). Each check
    is one broadcast LEFT join + conditional count fused into a
    single lazy plan (round 1 ran 6 driver-side .count() actions —
    6 scans + 6 job submissions for 3 one-row results); dims
    broadcast, each fact table is scanned once per relationship,
    ONE job total."""

    def orphans(child: DataFrame, ck: str, parent: DataFrame, pk: str, label: str) -> DataFrame:
        j = child.select(ck).join(
            F.broadcast(parent.select(pk).withColumn("__hit", F.lit(1))),
            F.col(ck) == F.col(pk),
            "left",
        )
        return j.agg(
            F.count("*").cast("long").alias("n_child"),
            F.count(F.when(F.col("__hit").isNull(), 1))
            .cast("long")
            .alias("n_orphans"),
        ).select(
            F.lit(label).alias("relationship"), "n_child", "n_orphans"
        )

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    return (
        orphans(li, "l_orderkey", o, "o_orderkey", "lineitem->orders")
        .unionByName(orphans(o, "o_custkey", c, "c_custkey", "orders->customer"))
        .unionByName(orphans(li, "l_partkey", p, "p_partkey", "lineitem->part"))
    )


@query(
    "pipeline_global_rank",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, n_chars,
               row_number() OVER (ORDER BY n_chars DESC, doc_id ASC)
                 AS rank
        FROM documents
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ranked)
    SELECT doc_id, n_chars, CAST(rank AS BIGINT) AS rank,
           CAST((rank - 1) * {N_SHARDS} // n AS BIGINT) AS curriculum_shard
    FROM ranked, tot
    """,
    tags=("pipeline", "global-sort", "ranking", "curriculum"),
)
def pipeline_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed global ranking — curriculum ordering for training
    (longest documents first here; plug in any score): every doc gets
    its exact global rank and an equal-size curriculum shard, WITHOUT
    the single-partition window a naive `row_number() OVER (ORDER BY
    ...)` plans.

    Scale shape: Spark's two-pass total order — repartitionByRange
    (samples the key distribution, assigns contiguous key ranges to
    partitions) + sortWithinPartitions, then zipWithIndex assigns
    contiguous global indexes from per-partition counts (one tiny
    count job + a narrow map; the canonical distributed ranking, and
    one of the few places an RDD primitive is the honest tool — no
    DataFrame operator exposes partition-offset indexing). Every
    partition ranks in parallel; nothing ever funnels through one
    task, which is exactly what the oracle's window does and why
    this operator exists. The rank→shard map is integer math, so
    the differential is exact."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    total = d.count()
    parts = min(32, max(1, total // 500))
    ordered = d.repartitionByRange(
        parts, F.desc("n_chars"), F.asc("doc_id")
    ).sortWithinPartitions(F.desc("n_chars"), F.asc("doc_id"))
    with_idx = ordered.rdd.zipWithIndex().map(
        lambda t: (t[0]["doc_id"], t[0]["n_chars"], t[1] + 1)
    )
    ranked = spark.createDataFrame(
        with_idx, schema="doc_id long, n_chars long, rank long"
    )
    return ranked.select(
        "doc_id",
        "n_chars",
        "rank",
        # integer division on BOTH engines: double-div + cast would
        # truncate in Spark but round in DuckDB
        F.expr(f"(rank - 1) * {N_SHARDS} div {total}").cast("bigint").alias(
            "curriculum_shard"
        ),
    )


_EPOCH_BATCH = 32  # docs per training batch


@query(
    "pipeline_epoch_shuffle",
    oracle=f"""
    WITH shuffled AS (
        SELECT epoch, doc_id, n_chars,
               row_number() OVER (
                   PARTITION BY epoch
                   ORDER BY md5(CAST(epoch AS VARCHAR) || ':'
                                || CAST(doc_id AS VARCHAR)), doc_id
               ) AS pos
        FROM documents, (SELECT unnest([0, 1]) AS epoch)
    )
    SELECT epoch,
           CAST((pos - 1) // {_EPOCH_BATCH} AS BIGINT) AS batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars,
           MIN(doc_id) AS first_doc
    FROM shuffled
    GROUP BY 1, 2
    ORDER BY epoch, batch_id
    LIMIT 40
    """,
    tags=("pipeline", "epoch-shuffle", "training", "engine-addition"),
)
def pipeline_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch reshuffling — the training-loader
    contract: every epoch must visit every document exactly once in a
    DIFFERENT but REPRODUCIBLE order. Order = md5(epoch || ':' ||
    doc_id): changing the epoch reshuffles globally, re-running (on
    any engine, any partitioning) reproduces the identical order, and
    batches are contiguous slices of that order. The per-batch
    manifest (count, char budget, first doc) is what a loader
    actually consumes.

    Scale shape: the hash-order row_number here is a per-epoch global
    sort — at 100 TB the batch id comes from the SAME two-pass
    machinery as pipeline_global_rank (range-partition by the hash,
    zipWithIndex), keeping the hash as the sort key; semantics and
    the manifest are unchanged, which is exactly why the hash-order
    definition (not an RNG permutation) is the right contract."""
    d = load_table(spark, sf_dir, "documents")
    epochs = d.crossJoin(
        F.broadcast(
            spark.createDataFrame([(0,), (1,)], "epoch int")
        )
    )
    key = F.md5(
        F.concat(
            F.col("epoch").cast("string"), F.lit(":"), F.col("doc_id").cast("string")
        )
    )
    w = Window.partitionBy("epoch").orderBy(key, F.asc("doc_id"))
    shuffled = epochs.select(
        "epoch",
        "doc_id",
        "n_chars",
        F.row_number().over(w).alias("pos"),
    )
    return (
        shuffled.groupBy(
            "epoch",
            ((F.col("pos") - 1) / _EPOCH_BATCH).cast("bigint").alias("batch_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("epoch", "batch_id")
        .limit(40)
    )


@query(
    "pipeline_interleaved_curriculum",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, source, n_chars,
               CAST(row_number() OVER (PARTITION BY source
                    ORDER BY n_chars, doc_id) AS BIGINT) AS rank_in_source
        FROM documents
    ),
    sched AS (
        SELECT doc_id, source, n_chars, rank_in_source,
               CAST(row_number() OVER (ORDER BY rank_in_source, source,
                                       doc_id) AS BIGINT) AS position
        FROM ranked
    )
    SELECT position, doc_id, source, n_chars, rank_in_source
    FROM sched WHERE position <= 50
    ORDER BY position
    """,
    tags=("pipeline", "curriculum", "training-order", "engine-addition"),
)
def pipeline_interleaved_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training order with source interleaving — the
    data-ORDER half of dataset curation that pipeline_training_shards
    (placement) doesn't cover: within each source, documents rank
    easiest-first (shortest n_chars, id tie-break); the global
    schedule then round-robins sources by sorting on (rank_in_source,
    source) — a deterministic interleave where no source floods the
    early steps and difficulty ramps monotonically within each
    source's subsequence. First 50 schedule positions shown.

    Scale shape: one window partitioned by source; the global order
    is the standard two-pass range-partitioned rank at scale
    (pipeline_global_rank); here the driver-visible head is
    TakeOrderedAndProject."""
    d = load_table(spark, sf_dir, "documents")
    ranked = d.select(
        "doc_id", "source", "n_chars",
        F.row_number()
        .over(Window.partitionBy("source").orderBy("n_chars", "doc_id"))
        .cast("bigint")
        .alias("rank_in_source"),
    )
    sched = ranked.select(
        "*",
        F.row_number()
        .over(Window.orderBy("rank_in_source", "source", "doc_id"))
        .cast("bigint")
        .alias("position"),
    )
    return (
        sched.where(F.col("position") <= 50)
        .select("position", "doc_id", "source", "n_chars", "rank_in_source")
        .orderBy("position")
    )
