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
from .text import _NORM_SQL, _TOKS_SQL, _norm, _toks

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


# ---------------------------------------------------------------------------
# End-to-end corpus pipeline composition (VERDICT r5 #7 / r6 #7): the
# previously stage-wise-verified operators — Gopher-style repetition
# gates, MinHash/LSH fuzzy-dedup survivorship, 8-gram benchmark
# decontamination, embedding-space (semantic) decontamination, domain
# mixture rebalancing, and sequence packing — composed into ONE
# dataflow with a queryable per-stage drop audit. A document's
# stage_outcome is the FIRST stage that dropped it:
#
#   benchmark_heldout      source == BENCH_SOURCE (the eval slice
#                          itself never trains)
#   gate_repetition        fails the top-token/top-bigram Gopher gate
#   duplicate              not the minimal gate-surviving member of
#                          its MinHash/LSH near-dup cluster
#   contaminated_ngram     shares an 8-gram with the benchmark slice
#   contaminated_semantic  max cosine to a benchmark embedding >=
#                          SEM_LEAK_THRESHOLD
#   mixture_downsampled    md5 hash-gate loss under the per-source
#                          keep rate (MIX_TARGET_FRACTION of the
#                          uniform token share, computed over the
#                          docs that survived every earlier stage)
#   kept                   in the final training set
#
# The labeled corpus is built ONCE per (session, sf_dir) via
# session_cached/materialize — pipeline_corpus_e2e (the per-shard
# packed manifest) and pipeline_corpus_e2e_audit (the drop audit)
# both read the same staged frame; no stage is re-derived.
# ---------------------------------------------------------------------------


def _e2e_label_ctes() -> str:
    """DuckDB CTE chain ending in plab(doc_id, source, lang, n_chars,
    n_tokens, stage_outcome) — the oracle twin of _e2e_labeled_build.
    Starts with the shared MinHash CTEs (sh/sig/bands/hashed/cand),
    so the caller must open with WITH RECURSIVE."""
    from .curation import (
        BENCH_SOURCE,
        MIX_GATE_BUCKETS,
        MIX_TARGET_FRACTION,
        REP_TOP_BIGRAM_MAX,
        REP_TOP_TOKEN_MAX,
        SEM_BENCH_N,
        SEM_LEAK_THRESHOLD,
        _GRAMS_SQL,
    )
    from .dedup import _MINHASH_CTES, _QDOT_SQL, _QL2_SQL, _QVEC_SQL, MIN_EST_JACCARD

    qdot = _QDOT_SQL.format(a="c.qv", b="b.qv", na="c.nrm", nb="b.nrm")
    return f"""{_MINHASH_CTES},
    ppairs AS (
        SELECT doc_a, doc_b FROM cand WHERE est_jaccard >= {MIN_EST_JACCARD}
    ),
    pedges AS (
        SELECT doc_a AS src, doc_b AS dst FROM ppairs
        UNION SELECT doc_b, doc_a FROM ppairs
    ),
    preach AS (
        SELECT src AS node, src AS r FROM pedges
        UNION
        SELECT e.dst, r.r FROM preach r JOIN pedges e ON e.src = r.node
    ),
    pclusters AS (
        SELECT node AS doc_id, min(r) AS cluster_id FROM preach GROUP BY node
    ),
    ptk AS (SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents),
    ptok AS (SELECT doc_id, unnest(toks) AS tok FROM ptk),
    ptok_top AS (
        SELECT doc_id, max(c) AS top_tok FROM (
            SELECT doc_id, tok, count(*) AS c FROM ptok GROUP BY doc_id, tok
        ) x GROUP BY doc_id
    ),
    pbig AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i + 1])) AS gram
        FROM ptk WHERE len(toks) >= 2
    ),
    pbig_top AS (
        SELECT doc_id, max(c) AS top_big FROM (
            SELECT doc_id, gram, count(*) AS c FROM pbig GROUP BY doc_id, gram
        ) x GROUP BY doc_id
    ),
    prep AS (
        SELECT t.doc_id,
               (CAST(tt.top_tok AS DOUBLE) / len(t.toks)
                    <= {REP_TOP_TOKEN_MAX}
                AND CAST(bt.top_big AS DOUBLE) / (len(t.toks) - 1)
                    <= {REP_TOP_BIGRAM_MAX}) AS passes_repetition
        FROM ptk t
        JOIN ptok_top tt ON tt.doc_id = t.doc_id
        JOIN pbig_top bt ON bt.doc_id = t.doc_id
    ),
    pg AS (SELECT doc_id, source, {_GRAMS_SQL} AS grams FROM ptk),
    pbench AS (
        SELECT DISTINCT unnest(grams) AS gram
        FROM pg WHERE source = '{BENCH_SOURCE}'
    ),
    pcand AS (
        SELECT doc_id,
               unnest(CASE WHEN len(grams) = 0 THEN [NULL] ELSE grams END)
                   AS gram
        FROM pg WHERE source <> '{BENCH_SOURCE}'
    ),
    pcon AS (
        SELECT c.doc_id, count(b.gram) > 0 AS is_contaminated
        FROM pcand c LEFT JOIN pbench b ON b.gram = c.gram
        GROUP BY c.doc_id
    ),
    pq0 AS (SELECT vec_id, {_QVEC_SQL} AS qv FROM embeddings),
    pn AS (SELECT vec_id, qv, {_QL2_SQL} AS nrm FROM pq0),
    pbv AS (SELECT * FROM pn WHERE vec_id < {SEM_BENCH_N}),
    pcv AS (SELECT * FROM pn WHERE vec_id >= {SEM_BENCH_N}),
    psem AS (
        SELECT c.vec_id AS doc_id,
               max({qdot}) >= {SEM_LEAK_THRESHOLD} AS is_semantic_leak
        FROM pcv c CROSS JOIN pbv b GROUP BY c.vec_id
    ),
    plab0 AS (
        SELECT d.doc_id, d.source, d.lang, d.n_chars,
               CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens,
               d.source = '{BENCH_SOURCE}' AS s_bench,
               NOT coalesce(r.passes_repetition, false) AS s_gate,
               coalesce(cl.cluster_id, d.doc_id) AS ckey,
               coalesce(con.is_contaminated, false) AS s_con,
               coalesce(sem.is_semantic_leak, false) AS s_sem
        FROM documents d
        LEFT JOIN prep r ON r.doc_id = d.doc_id
        LEFT JOIN pclusters cl ON cl.doc_id = d.doc_id
        LEFT JOIN pcon con ON con.doc_id = d.doc_id
        LEFT JOIN psem sem ON sem.doc_id = d.doc_id
    ),
    plab1 AS (
        SELECT *, row_number() OVER (
            PARTITION BY ckey, (NOT s_bench AND NOT s_gate)
            ORDER BY doc_id) AS rn
        FROM plab0
    ),
    plab2 AS (
        SELECT doc_id, source, lang, n_chars, n_tokens,
               CASE WHEN s_bench THEN 'benchmark_heldout'
                    WHEN s_gate THEN 'gate_repetition'
                    WHEN rn > 1 THEN 'duplicate'
                    WHEN s_con THEN 'contaminated_ngram'
                    WHEN s_sem THEN 'contaminated_semantic'
                    ELSE 'pre_mixture' END AS pre_outcome
        FROM plab1
    ),
    ppersrc AS (
        SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        FROM plab2 WHERE pre_outcome = 'pre_mixture' GROUP BY source
    ),
    prates AS (
        SELECT source,
               least(1.0, {MIX_TARGET_FRACTION} *
                     (CAST(SUM(total_tokens) OVER () AS DOUBLE)
                      / COUNT(*) OVER ())
                     / CAST(total_tokens AS DOUBLE)) AS keep_rate
        FROM ppersrc
    ),
    plab AS (
        SELECT p.doc_id, p.source, p.lang, p.n_chars, p.n_tokens,
               CASE WHEN p.pre_outcome <> 'pre_mixture' THEN p.pre_outcome
                    WHEN CAST(('0x' || substring(
                             md5(p.source || ':' || CAST(p.doc_id AS VARCHAR)),
                             1, 8)) AS UBIGINT) % {MIX_GATE_BUCKETS}
                         < CAST(floor(r.keep_rate * {MIX_GATE_BUCKETS})
                                AS BIGINT)
                         THEN 'kept'
                    ELSE 'mixture_downsampled' END AS stage_outcome
        FROM plab2 p LEFT JOIN prates r ON r.source = p.source
    )"""


def _e2e_labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scale import session_cached

    return session_cached(
        spark, (sf_dir, "e2e_labeled"), lambda: _e2e_labeled_build(spark, sf_dir)
    )


def _e2e_labeled_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One pass over the stage operators -> (doc_id, source, lang,
    n_chars, n_tokens, stage_outcome). Every stage flag comes from the
    SAME implementation its standalone query verifies (the flag
    queries are called, not re-implemented); the composition adds only
    the first-failure CASE, the within-cluster survivor rank, and the
    survivor-derived mixture rates."""
    from ..operators.scale import materialize
    from .curation import (
        BENCH_SOURCE,
        MIX_GATE_BUCKETS,
        MIX_TARGET_FRACTION,
        REP_TOP_BIGRAM_MAX,
        REP_TOP_TOKEN_MAX,
        _rep_top_cols,
        curation_decontaminate,
        curation_semantic_decontaminate,
    )
    from .dedup import dedup_clusters

    # r13 (guide §2.4/§6): the Gopher repetition gate is a stateless
    # projection since r12, so joining curation_repetition_stats back
    # on doc_id paid a second full documents scan plus a corpus-sized
    # join for a flag computable IN the label scan itself. Inline it
    # via the SAME _rep_top_cols implementation the standalone query
    # runs (one shared function, not a re-implementation); docs with
    # < 2 tokens get NULL exactly like the old left join's misses, and
    # the downstream coalesce(passes_repetition, false) is unchanged.
    top_tok, top_big = _rep_top_cols(F.col("toks"))
    t_ratio = top_tok.cast("double") / F.col("n_tokens")
    b_ratio = top_big.cast("double") / (F.col("n_tokens") - 1)
    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            "lang",
            "n_chars",
            _toks(F.col("text")).alias("toks"),
        )
        .withColumn("n_tokens", F.size("toks").cast("long"))
        .select(
            "doc_id",
            "source",
            "lang",
            "n_chars",
            "n_tokens",
            F.when(
                F.col("n_tokens") >= 2,
                (t_ratio <= REP_TOP_TOKEN_MAX)
                & (b_ratio <= REP_TOP_BIGRAM_MAX),
            ).alias("passes_repetition"),
        )
    )
    con = curation_decontaminate(spark, sf_dir).select(
        "doc_id", "is_contaminated"
    )
    sem = curation_semantic_decontaminate(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), "is_semantic_leak"
    )
    clu = dedup_clusters(spark, sf_dir)
    base = (
        d.join(F.broadcast(clu), "doc_id", "left")
        .join(con, "doc_id", "left")
        .join(sem, "doc_id", "left")
    )
    s_bench = F.col("source") == BENCH_SOURCE
    s_gate = ~F.coalesce(F.col("passes_repetition"), F.lit(False))
    ckey = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    w = Window.partitionBy(ckey, ~s_bench & ~s_gate).orderBy("doc_id")
    pre = (
        F.when(s_bench, F.lit("benchmark_heldout"))
        .when(s_gate, F.lit("gate_repetition"))
        .when(F.row_number().over(w) > 1, F.lit("duplicate"))
        .when(
            F.coalesce(F.col("is_contaminated"), F.lit(False)),
            F.lit("contaminated_ngram"),
        )
        .when(
            F.coalesce(F.col("is_semantic_leak"), F.lit(False)),
            F.lit("contaminated_semantic"),
        )
        .otherwise(F.lit("pre_mixture"))
    )
    # Stage the pre-mixture labels once: the mixture rates aggregate
    # AND the final gate both read them.
    staged = base.select(
        "doc_id", "source", "lang", "n_chars", "n_tokens", pre.alias("pre_outcome")
    ).transform(materialize)
    per_src = (
        staged.where(F.col("pre_outcome") == "pre_mixture")
        .groupBy("source")
        .agg(F.sum("n_tokens").cast("long").alias("total_tokens"))
    )
    totals = per_src.agg(
        F.sum("total_tokens").cast("double").alias("grand_tokens"),
        F.count("*").cast("double").alias("n_sources"),
    )
    rates = per_src.crossJoin(F.broadcast(totals)).select(
        "source",
        F.least(
            F.lit(1.0),
            F.lit(MIX_TARGET_FRACTION)
            * (F.col("grand_tokens") / F.col("n_sources"))
            / F.col("total_tokens").cast("double"),
        ).alias("keep_rate"),
    )
    gate_bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("source"), F.col("doc_id"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % MIX_GATE_BUCKETS
    )
    return (
        staged.join(F.broadcast(rates), "source", "left")
        .select(
            "doc_id",
            "source",
            "lang",
            "n_chars",
            "n_tokens",
            F.when(F.col("pre_outcome") != "pre_mixture", F.col("pre_outcome"))
            .when(
                gate_bucket
                < F.floor(F.col("keep_rate") * MIX_GATE_BUCKETS).cast("long"),
                F.lit("kept"),
            )
            .otherwise(F.lit("mixture_downsampled"))
            .alias("stage_outcome"),
        )
    )


def _e2e_manifest_oracle() -> str:
    from .curation import SEQ_LEN, _PACK_SHARD_SQL

    return f"""
    WITH RECURSIVE {_e2e_label_ctes()},
    pk AS (
        SELECT doc_id, n_tokens, {_PACK_SHARD_SQL} AS shard
        FROM plab WHERE stage_outcome = 'kept'
    ),
    poff AS (
        SELECT doc_id, shard, n_tokens,
               CAST(coalesce(SUM(n_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS token_start
        FROM pk
    )
    SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST((SUM(n_tokens) + {SEQ_LEN} - 1) // {SEQ_LEN} AS BIGINT)
               AS n_sequences,
           CAST(SUM(CASE WHEN token_start // {SEQ_LEN}
                          <> (token_start + n_tokens - 1) // {SEQ_LEN}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs
    FROM poff GROUP BY shard
    """


@query(
    "pipeline_corpus_e2e",
    oracle=_e2e_manifest_oracle(),
    tags=("pipeline", "curation", "dedup", "composition", "engine-addition"),
)
def pipeline_corpus_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE composed corpus pipeline (VERDICT r6 #7): Gopher gates ->
    MinHash-dedup survivors -> 8-gram + semantic decontamination ->
    mixture rebalance -> packed training shards, returned as the
    per-shard manifest a training job consumes (docs, tokens,
    sequence count, boundary-spanning docs). The per-stage drop audit
    over the same staged labels is pipeline_corpus_e2e_audit.

    Scale shape: each stage flag is the already-audited standalone
    operator (narrow maps + md5-uniform keyed aggregates; the one
    driver-side structure is the bounded benchmark-embedding block);
    the composition itself adds one window over cluster keys (tiny:
    cluster members), one 20-row rate broadcast, and the per-shard
    packing window — all on the staged label table, nothing
    re-derived."""
    from .curation import SEQ_LEN, PACK_SHARDS

    kept = _e2e_labeled(spark, sf_dir).where(F.col("stage_outcome") == "kept")
    shard = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % PACK_SHARDS
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = kept.select("doc_id", "n_tokens", shard.alias("shard")).withColumn(
        "token_start",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long"),
    )
    spans = (
        F.floor(F.col("token_start") / SEQ_LEN)
        != F.floor((F.col("token_start") + F.col("n_tokens") - 1) / SEQ_LEN)
    ).cast("long")
    return off.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.expr(f"CAST((SUM(n_tokens) + {SEQ_LEN} - 1) div {SEQ_LEN} AS BIGINT)")
            .alias("n_sequences"),
        F.sum(spans).cast("long").alias("n_boundary_docs"),
    )


def _e2e_audit_oracle() -> str:
    return f"""
    WITH RECURSIVE {_e2e_label_ctes()}
    SELECT stage_outcome, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM plab GROUP BY stage_outcome
    """


@query(
    "pipeline_corpus_e2e_audit",
    oracle=_e2e_audit_oracle(),
    tags=("pipeline", "curation", "audit", "composition"),
)
def pipeline_corpus_e2e_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queryable drop audit for pipeline_corpus_e2e: docs, chars and
    tokens per first-failing stage ('kept' = final training set).
    Reads the SAME session-staged label table as the manifest query —
    the audit is free once the pipeline ran, exactly like a
    production curation run's manifest + drop report pair."""
    return (
        _e2e_labeled(spark, sf_dir)
        .groupBy("stage_outcome")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )
