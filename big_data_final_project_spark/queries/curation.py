"""Corpus-curation operators over ``documents`` (north-star
extension; SURVEY.md §2.6): benchmark decontamination, PII redaction,
repetition-based quality filtering, and domain-mixture rebalancing —
the four screening passes a large-scale training-data pipeline runs
between raw crawl and tokenizer (the same family as the published
C4 / Gopher / Dolma cleaning recipes).

The reference has no text processing (its strings are weather labels,
app.py:450); these extend the text/dedup/pipeline modules with the
remaining curation stages.

Scale posture:
 * decontamination is an inverted-index join on n-gram hashes with the
   BENCHMARK side broadcast — eval suites are tiny relative to a crawl,
   so the corpus never shuffles, it streams past a broadcast hash set;
 * PII redaction is a pure per-row regexp map (JVM codegen, zero
   shuffles);
 * repetition stats are a pure per-row map (r12): the per-doc top
   gram frequency is the max run length of the sorted gram array —
   zero shuffles;
 * domain mixture computes per-source budgets (a tiny aggregate),
   broadcasts the rate table, and gates rows with a deterministic
   content hash — reproducible across engines, runs, and repartitions
   (same rationale as sample_hash_stratified).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load_table
from ..operators.scale import materialize, spread
from ..registry import query
from .text import _NORM_SQL, _TOKS_SQL, _norm, _toks

K_GRAM = 8  # decontamination n-gram width (word-level)
BENCH_SOURCE = "src0"  # held-out "benchmark" slice of the corpus

# Token-level n-grams as strings; guard short docs (sequence() would
# count DOWN for size < K). The `toks` column is materialized before
# the lambda references it (SCALE.md: inlined array exprs re-evaluate
# per element — quadratic).
_GRAMS_EXPR = (
    f"CASE WHEN size(toks) >= {K_GRAM} THEN "
    f"transform(sequence(1, size(toks) - {K_GRAM} + 1), "
    f"i -> concat_ws(' ', slice(toks, i, {K_GRAM}))) "
    "ELSE CAST(array() AS array<string>) END"
)
_GRAMS_SQL = (
    f"CASE WHEN len(toks) >= {K_GRAM} THEN "
    f"list_transform(range(1, len(toks) - {K_GRAM} + 2), "
    f"i -> array_to_string(toks[i:i+{K_GRAM - 1}], ' ')) "
    "ELSE [] END"
)


@query(
    "curation_decontaminate",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents),
    g AS (SELECT doc_id, source, {_GRAMS_SQL} AS grams FROM t),
    bench AS (
        SELECT DISTINCT unnest(grams) AS gram FROM g WHERE source = '{BENCH_SOURCE}'
    ),
    cand AS (
        SELECT doc_id, len(grams) AS n_grams,
               unnest(CASE WHEN len(grams) = 0 THEN [NULL] ELSE grams END) AS gram
        FROM g WHERE source <> '{BENCH_SOURCE}'
    )
    SELECT c.doc_id,
           CAST(max(c.n_grams) AS BIGINT) AS n_grams,
           CAST(count(b.gram) AS BIGINT) AS n_contaminated_grams,
           count(b.gram) > 0 AS is_contaminated
    FROM cand c LEFT JOIN bench b ON b.gram = c.gram
    GROUP BY c.doc_id
    """,
    tags=("curation", "decontaminate", "ngram"),
)
def curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any
    word-{K_GRAM}-gram with the held-out benchmark slice — the
    standard eval-leak screen (the GPT-3/PaLM papers' 13-gram
    collision check; 8 here because the synthetic docs are short).

    Plan: benchmark grams become a DISTINCT xxhash64 set (eval suites
    are small → broadcast); candidate grams stream past it with a
    broadcast left join — the corpus side never shuffles until the
    per-doc count, which is a narrow (doc_id)-keyed aggregate. The
    oracle joins the gram STRINGS, so a 64-bit hash collision
    (P ~ 1e-16 per pair) would surface as a hash mismatch — the hash
    join is verified, not trusted."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", _toks(F.col("text")).alias("toks")
    )
    g = d.select("doc_id", "source", F.expr(_GRAMS_EXPR).alias("grams"))
    bench = (
        g.where(F.col("source") == BENCH_SOURCE)
        .select(F.explode("grams").alias("gram"))
        .select(F.xxhash64("gram").alias("gh"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    cand = g.where(F.col("source") != BENCH_SOURCE).select(
        "doc_id",
        F.size("grams").alias("n_grams"),
        F.explode_outer("grams").alias("gram"),
    )
    joined = cand.withColumn("gh", F.xxhash64("gram")).join(
        F.broadcast(bench), "gh", "left"
    )
    return joined.groupBy("doc_id").agg(
        F.max("n_grams").cast("long").alias("n_grams"),
        F.count("hit").cast("long").alias("n_contaminated_grams"),
        (F.count("hit") > 0).alias("is_contaminated"),
    )


# PII patterns, written in the common subset of Java regex (Spark) and
# RE2 (DuckDB): character classes, bounded repeats, \b, alternation.
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+"
PII_PHONE = r"[0-9][0-9][0-9][- ][0-9][0-9][0-9][- ]?[0-9][0-9][0-9][0-9]"
# The synthetic corpus contains no digits/emails (the patterns above
# exercise the machinery and match zero rows — asserted by the oracle,
# not assumed); the term list is the live redaction path.
PII_TERMS = r"\b(key|user|hash)\b"


@query(
    "curation_pii_redact",
    oracle=f"""
    WITH n AS (SELECT doc_id, {_NORM_SQL} AS txt FROM documents),
    r AS (
        SELECT doc_id, txt,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(txt, '{PII_EMAIL}', '[EMAIL]', 'g'),
                       '{PII_PHONE}', '[PHONE]', 'g'),
                   '{PII_TERMS}', '[TERM]', 'g') AS redacted
        FROM n
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(txt, '{PII_EMAIL}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(txt, '{PII_PHONE}')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(txt, '{PII_TERMS}')) AS BIGINT) AS n_term,
           CAST(length(redacted) AS BIGINT) AS redacted_len,
           md5(redacted) AS redacted_hash
    FROM r
    """,
    tags=("curation", "pii"),
)
def curation_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: regex redaction of emails / phone numbers / a
    custom sensitive-term list, with per-doc match counts and the md5
    of the redacted text (so the redacted corpus itself is verified
    byte-for-byte, not just the counts). Pure per-row regexp map —
    codegen'd, zero shuffles, scans at parquet speed at any scale."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", _norm(F.col("text")).alias("txt")
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("txt"), PII_EMAIL, "[EMAIL]"),
            PII_PHONE,
            "[PHONE]",
        ),
        PII_TERMS,
        "[TERM]",
    )
    return d.select(
        "doc_id",
        F.regexp_count("txt", F.lit(PII_EMAIL)).cast("long").alias("n_email"),
        F.regexp_count("txt", F.lit(PII_PHONE)).cast("long").alias("n_phone"),
        F.regexp_count("txt", F.lit(PII_TERMS)).cast("long").alias("n_term"),
        F.length(redacted).cast("long").alias("redacted_len"),
        F.md5(redacted).alias("redacted_hash"),
    )


# Gopher-style repetition gates (tuned to the synthetic corpus's
# ~50-word vocabulary so both outcomes are exercised).
REP_TOP_TOKEN_MAX = 0.10  # most frequent token may cover <=10% of doc
REP_TOP_BIGRAM_MAX = 0.06


@query(
    "curation_repetition_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    tok AS (
        SELECT doc_id, unnest(toks) AS tok FROM t
    ),
    tok_top AS (
        SELECT doc_id, max(c) AS top_tok FROM (
            SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok
        ) x GROUP BY doc_id
    ),
    big AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i + 1])) AS gram
        FROM t WHERE len(toks) >= 2
    ),
    big_top AS (
        SELECT doc_id, max(c) AS top_big FROM (
            SELECT doc_id, gram, count(*) AS c FROM big GROUP BY doc_id, gram
        ) x GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(tok_top.top_tok AS DOUBLE) / len(t.toks) AS top_token_ratio,
           CAST(big_top.top_big AS DOUBLE) / (len(t.toks) - 1) AS top_bigram_ratio,
           (CAST(tok_top.top_tok AS DOUBLE) / len(t.toks) <= {REP_TOP_TOKEN_MAX}
            AND CAST(big_top.top_big AS DOUBLE) / (len(t.toks) - 1)
                <= {REP_TOP_BIGRAM_MAX}) AS passes_repetition
    FROM t
    JOIN tok_top ON tok_top.doc_id = t.doc_id
    JOIN big_top ON big_top.doc_id = t.doc_id
    """,
    tags=("curation", "quality", "repetition"),
)
def curation_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality gate (the Gopher rules' shape): a doc
    fails when its most frequent token or bigram covers too much of
    it — the cheap detector for boilerplate / keyword-stuffed /
    looping text. Ratios are exact BIGINT/BIGINT divisions in double.

    Shape (r12 optimization): a per-doc top frequency needs no
    (doc, gram) shuffle at all — the max count of equal elements IS
    the max run length of the SORTED gram array, computed per row
    with array_sort + one aggregate() scan. The previous form
    (explode -> two-level count -> per-doc max -> two joins back)
    spent 4 exchanges re-keying corpus-sized gram rows by doc; this
    is a single stateless projection over the scan — zero exchanges,
    and at 100 TB the whole gate pipelines into whatever stage reads
    the documents. Inner-join semantics kept: only docs with >= 2
    tokens have a bigram top, so the gate emits exactly those
    (size(NULL toks) is NULL and filters out, matching the old
    explode-of-NULL behavior). The run-length statistics themselves
    live in _rep_top_cols (r13: shared verbatim with the composed
    pipeline's inline gate)."""
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", _toks(F.col("text")).alias("toks"))
        .where(F.size("toks") >= 2)
    )
    top_tok, top_big = _rep_top_cols(F.col("toks"))
    base = d.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        top_tok.alias("top_tok"),
        top_big.alias("top_big"),
    )
    t_ratio = F.col("top_tok").cast("double") / F.col("n_toks")
    b_ratio = F.col("top_big").cast("double") / (F.col("n_toks") - 1)
    return base.select(
        "doc_id",
        F.col("n_toks").cast("long").alias("n_tokens"),
        t_ratio.alias("top_token_ratio"),
        b_ratio.alias("top_bigram_ratio"),
        (
            (t_ratio <= REP_TOP_TOKEN_MAX) & (b_ratio <= REP_TOP_BIGRAM_MAX)
        ).alias("passes_repetition"),
    )


def _max_run(arr: Column) -> Column:
    """Longest run of equal adjacent elements of a SORTED array =
    max multiplicity of any element. State: (prev, current run,
    best run); prev=NULL start makes the first comparison NULL ->
    otherwise(1). The run expression appears twice because a
    struct field cannot reference a sibling built in the same
    lambda — both are the same scalar when/plus, evaluated on
    (acc, x) only (no array re-evaluation inside the lambda)."""
    run = lambda acc, x: (  # noqa: E731 — shared by two fields
        F.when(acc["prev"] == x, acc["run"] + 1)
        .otherwise(F.lit(1).cast("long"))
    )
    return F.aggregate(
        arr,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run(acc, x).alias("run"),
            F.greatest(acc["best"], run(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def _rep_top_cols(tk: Column) -> tuple[Column, Column]:
    """(top_tok, top_big) of a token-array column — the run-length
    repetition statistics curation_repetition_stats documents.
    Factored to module level in r13 so pipeline_corpus_e2e INLINES
    the Gopher gate into its own label scan (guide §2.4/§6: one
    stateless projection instead of a second documents scan joined
    back on doc_id) while the standalone query and the composed
    pipeline keep literally the same implementation. top_big is NULL
    for docs with < 2 tokens (no bigram exists; the standalone query
    filters those rows out, the pipeline maps NULL -> gate failure
    via its existing coalesce)."""
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(tk) - 1),
        lambda i: F.concat(
            F.element_at(tk, i), F.lit(" "), F.element_at(tk, i + 1)
        ),
    )
    top_tok = _max_run(F.array_sort(tk))
    top_big = F.when(F.size(tk) >= 2, _max_run(F.array_sort(bigrams)))
    return top_tok, top_big


MIX_TARGET_FRACTION = 0.8  # per-source token budget = 0.8 * mean share
MIX_GATE_BUCKETS = 1000


@query(
    "curation_domain_mixture",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source,
               CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens
        FROM documents
    ),
    per_src AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        FROM d GROUP BY source
    ),
    rates AS (
        SELECT source, n_docs, total_tokens,
               least(1.0, {MIX_TARGET_FRACTION} *
                     (CAST(SUM(total_tokens) OVER () AS DOUBLE)
                      / COUNT(*) OVER ())
                     / CAST(total_tokens AS DOUBLE)) AS keep_rate
        FROM per_src
    ),
    gated AS (
        SELECT d.source, d.n_tokens, r.keep_rate
        FROM d JOIN rates r ON r.source = d.source
        WHERE CAST(('0x' || substring(
                  md5(d.source || ':' || CAST(d.doc_id AS VARCHAR)), 1, 8))
                  AS UBIGINT) % {MIX_GATE_BUCKETS}
              < CAST(floor(r.keep_rate * {MIX_GATE_BUCKETS}) AS BIGINT)
    )
    SELECT r.source, r.n_docs, r.total_tokens, r.keep_rate,
           CAST(coalesce(g.n_docs_sampled, 0) AS BIGINT) AS n_docs_sampled,
           CAST(coalesce(g.tokens_sampled, 0) AS BIGINT) AS tokens_sampled
    FROM rates r
    LEFT JOIN (
        SELECT source, count(*) AS n_docs_sampled,
               SUM(n_tokens) AS tokens_sampled
        FROM gated GROUP BY source
    ) g ON g.source = r.source
    """,
    tags=("curation", "mixture", "sample"),
)
def curation_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing: per-source token accounting, a
    token budget per source (a fraction of the uniform share —
    over-represented domains get downsampled, small ones keep
    everything), and the materialized sample via a deterministic
    content-hash gate — in-or-out is stable across engines, runs,
    and repartitions, unlike seeded RNG (sample_hash_stratified
    rationale). Plan: one per-source aggregate (tiny), the rate
    table broadcast back onto the corpus, a narrow gate predicate,
    one final per-source aggregate."""
    # the tokenized projection feeds the accounting AND the gated
    # sample pass — checkpoint it once (narrow: 3 columns) so the
    # tokenizer runs once per doc, and stage the tiny per-source
    # table its two consumers share
    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.size(_toks(F.col("text"))).cast("long").alias("n_tokens"),
        )
        .transform(materialize)
    )
    per_src = (
        d.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .transform(materialize)
    )
    # Global totals via a 1-row broadcast cross join (not a window: no
    # need to sort/shuffle the per-source table for a grand total).
    totals = per_src.agg(
        F.sum("total_tokens").cast("double").alias("grand_tokens"),
        F.count("*").cast("double").alias("n_sources"),
    )
    rates = per_src.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        "total_tokens",
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
    gated = (
        d.join(F.broadcast(rates.select("source", "keep_rate")), "source")
        .where(
            gate_bucket
            < F.floor(F.col("keep_rate") * MIX_GATE_BUCKETS).cast("long")
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs_sampled"),
            F.sum("n_tokens").cast("long").alias("tokens_sampled"),
        )
    )
    return rates.join(F.broadcast(gated), "source", "left").select(
        "source",
        "n_docs",
        "total_tokens",
        "keep_rate",
        F.coalesce(F.col("n_docs_sampled"), F.lit(0)).cast("long").alias(
            "n_docs_sampled"
        ),
        F.coalesce(F.col("tokens_sampled"), F.lit(0)).cast("long").alias(
            "tokens_sampled"
        ),
    )


SEQ_LEN = 512  # fixed training-sequence length (tokens)
PACK_SHARDS = 8  # packing parallelism unit (content-hash shards)

_PACK_SHARD_SQL = (
    "CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
    f"AS UBIGINT) % {PACK_SHARDS} AS BIGINT)"
)


@query(
    "curation_pack_sequences",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_PACK_SHARD_SQL} AS shard,
               CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens
        FROM documents
    ),
    off AS (
        SELECT doc_id, shard, n_tokens,
               CAST(coalesce(SUM(n_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS token_start
        FROM d
    )
    SELECT doc_id, shard, n_tokens, token_start,
           CAST(token_start // {SEQ_LEN} AS BIGINT) AS seq_first,
           CAST((token_start + n_tokens - 1) // {SEQ_LEN} AS BIGINT) AS seq_last,
           (token_start // {SEQ_LEN})
             <> ((token_start + n_tokens - 1) // {SEQ_LEN}) AS spans_boundary
    FROM off
    """,
    tags=("curation", "packing"),
)
def curation_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing manifest: docs are concatenated in
    deterministic (shard, doc_id) order and chunked into fixed
    SEQ_LEN-token sequences; each doc gets its token offset, its
    first/last sequence index, and a boundary-crossing flag — the
    manifest a dataloader needs to slice packed sequences without
    re-tokenizing.

    Scale shape: packing is per-SHARD (content-hash, uniform), so the
    running-offset window parallelizes across {PACK_SHARDS} (at 100 TB:
    thousands of) independent partitions instead of one global ordered
    cumsum — a deliberately shard-local order, which is exactly how
    real packers work (global document order carries no meaning)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long")
            % PACK_SHARDS
        ).alias("shard"),
        F.size(_toks(F.col("text"))).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = d.withColumn(
        "token_start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    )
    seq_first = F.floor(F.col("token_start") / SEQ_LEN).cast("long")
    seq_last = F.floor(
        (F.col("token_start") + F.col("n_tokens") - 1) / SEQ_LEN
    ).cast("long")
    return off.select(
        "doc_id",
        "shard",
        "n_tokens",
        "token_start",
        seq_first.alias("seq_first"),
        seq_last.alias("seq_last"),
        (seq_first != seq_last).alias("spans_boundary"),
    )


INT8_LEVELS = 255  # symmetric-range affine int8 quantization

# Binary fixed-point scale for the MSE sum: err^2 * 2^68 is an EXACT
# power-of-two rescale of the double, round() of it is exact decimal
# rounding on both engines, the per-element integers (< 2^53) sum
# exactly in int64, and int64 -> double is correctly rounded — so the
# mean is bit-identical cross-engine. (A decimal(28,20) cast is NOT:
# DuckDB converts double->decimal via an fp multiply by 10^scale,
# which drifts 1 ulp vs Spark's exact BigDecimal cast — found by the
# differential.)
MSE_FXP = float(2**68)


@query(
    "sim_quantize_int8",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    dims AS (
        SELECT unnest(range(1, len(v) + 1)) AS pos, unnest(v) AS val, vec_id
        FROM e
    ),
    rng AS (
        SELECT pos, min(val) AS lo, max(val) AS hi FROM dims GROUP BY pos
    ),
    q AS (
        SELECT d.vec_id,
               abs((r.lo + round((d.val - r.lo) / ((r.hi - r.lo) / {INT8_LEVELS}))
                    * ((r.hi - r.lo) / {INT8_LEVELS})) - d.val) AS err
        FROM dims d JOIN rng r ON r.pos = d.pos
    )
    SELECT vec_id,
           max(err) AS max_abs_err,
           CAST(SUM(CAST(round(err * err * {MSE_FXP}) AS BIGINT)) AS DOUBLE)
             / {MSE_FXP} / count(*) AS mse
    FROM q GROUP BY vec_id
    """,
    tags=("similarity", "quantization"),
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 affine quantization audit for the vector store: per-
    DIMENSION [min,max] ranges over the corpus (64 tiny groups), an
    8-bit affine code per element, and per-vector reconstruction
    error (max abs + MSE) — the compression-quality monitor a vector
    store runs before switching its ANN index to int8.

    Determinism: ranges are exact min/max; scale/round/reconstruct is
    an identical double op tree both engines; round() is half-away on
    both; the MSE sum routes through binary fixed-point int64 (see
    MSE_FXP) so partition order can't drift low bits. Plan: one
    explode + 64-group aggregate, ranges broadcast back, per-row map,
    per-vector aggregate."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    dims = e.select("vec_id", F.posexplode("v").alias("pos", "val")).withColumn(
        "pos", F.col("pos") + 1
    )
    rng = dims.groupBy("pos").agg(
        F.min("val").alias("lo"), F.max("val").alias("hi")
    )
    scale = (F.col("hi") - F.col("lo")) / INT8_LEVELS
    recon = F.col("lo") + F.round((F.col("val") - F.col("lo")) / scale) * scale
    q = dims.join(F.broadcast(rng), "pos").select(
        "vec_id", F.abs(recon - F.col("val")).alias("err")
    )
    return q.groupBy("vec_id").agg(
        F.max("err").alias("max_abs_err"),
        (
            F.sum(
                F.round(F.col("err") * F.col("err") * MSE_FXP).cast("long")
            ).cast("double")
            / MSE_FXP
            / F.count("*")
        ).alias("mse"),
    )


SEM_BENCH_N = 50  # vec_id < 50 = the held-out benchmark split
SEM_LEAK_THRESHOLD = 0.35


def _sem_decon_oracle() -> str:
    from .dedup import _QDOT_SQL, _QVEC_SQL, _QL2_SQL

    qdot = _QDOT_SQL.format(a="c.qv", b="b.qv", na="c.nrm", nb="b.nrm")
    return f"""
    WITH q0 AS (SELECT vec_id, {_QVEC_SQL} AS qv FROM embeddings),
    n AS (SELECT vec_id, qv, {_QL2_SQL} AS nrm FROM q0),
    bench AS (SELECT * FROM n WHERE vec_id < {SEM_BENCH_N}),
    cand AS (SELECT * FROM n WHERE vec_id >= {SEM_BENCH_N}),
    scored AS (
        SELECT c.vec_id, b.vec_id AS bench_id, {qdot} AS cos
        FROM cand c CROSS JOIN bench b
    ),
    best AS (
        SELECT vec_id, bench_id, cos, row_number() OVER (
            PARTITION BY vec_id ORDER BY cos DESC, bench_id) AS rn
        FROM scored
    )
    SELECT vec_id, cos AS max_benchmark_cosine,
           bench_id AS nearest_benchmark_id,
           cos >= {SEM_LEAK_THRESHOLD} AS is_semantic_leak
    FROM best WHERE rn = 1
    """


@query(
    "curation_semantic_decontaminate",
    oracle=_sem_decon_oracle(),
    tags=("curation", "decontaminate", "embedding", "pandas"),
)
def curation_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) decontamination: for every training
    vector, its maximum cosine to the held-out benchmark split and the
    nearest benchmark id — the screen that catches paraphrased eval
    leakage n-gram matching misses (benchmark items reworded in the
    crawl). Complements curation_decontaminate the way fuzzy dedup
    complements exact dedup.

    Plan: the benchmark block (eval suites are small) is collected,
    quantized, and broadcast into a mapInPandas scorer; each corpus
    partition computes one exact fixed-point matmul and emits ONE row
    per vector — the corpus never joins or shuffles (argmax ties
    resolve to the lowest benchmark id on both engines)."""
    import numpy as np

    from .dedup import quantize_fxp
    from .similarity import _quantize_rows

    e = spread(load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding"))
    brows = e.where(F.col("vec_id") < SEM_BENCH_N).collect()
    bids, bq, bqn = _quantize_rows(brows, "embedding")

    def score(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf[pdf["vec_id"] >= SEM_BENCH_N]
            if not len(pdf):
                continue
            qv = quantize_fxp(np.stack(pdf["embedding"].to_numpy()))
            qn = np.sqrt((qv * qv).sum(axis=1))
            sims = (qv @ bq.T) / (qn[:, None] * bqn[None, :])
            best = np.argmax(sims, axis=1)  # first max == lowest bench id
            mx = sims[np.arange(len(sims)), best]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "max_benchmark_cosine": mx,
                    "nearest_benchmark_id": bids[best],
                    "is_semantic_leak": mx >= SEM_LEAK_THRESHOLD,
                }
            )

    return e.mapInPandas(
        score,
        schema=(
            "vec_id long, max_benchmark_cosine double, "
            "nearest_benchmark_id long, is_semantic_leak boolean"
        ),
    )


# Binary fixed-point scale for rarity sums: 2^40 / freq is rounded to
# an integer (round() on a correctly-rounded double quotient —
# identical both engines), summed exactly in int64, converted once.
RARITY_FXP = float(2**40)


@query(
    "text_rarity_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    freq AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
    scored AS (
        SELECT doc_id, CAST(round({RARITY_FXP} / c) AS BIGINT) AS r
        FROM tok JOIN freq USING (tok)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(SUM(r) AS BIGINT) AS sum_rarity_fxp,
           CAST(SUM(r) AS DOUBLE) / {RARITY_FXP} / count(*) AS avg_token_rarity
    FROM scored GROUP BY doc_id
    """,
    tags=("curation", "text", "quality"),
)
def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality proxy: score each document by
    the mean rarity (1/corpus-frequency) of its tokens — the cheap
    stand-in for perplexity filtering where the "LM" is the corpus
    unigram table itself. High scores flag gibberish/rare-token
    documents; low scores flag boilerplate. (True log-prob scoring is
    avoided deliberately: ln() differs between libm and the JVM in
    the last ulp — SCALE.md cross-engine traps — while 1/f uses only
    correctly-rounded division.)

    Plan: one token explode feeds BOTH the corpus-wide frequency
    aggregate (the "LM table" — vocabulary-sized, broadcast back) and
    the per-doc rarity sum; rarity is binary fixed-point int64
    (RARITY_FXP) so partition order cannot drift low bits. Two narrow
    shuffles total; the LM-table broadcast is the same shape a real
    perplexity filter uses with a pretrained table."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", _toks(F.col("text")).alias("toks")
    )
    tok = d.select("doc_id", F.explode("toks").alias("tok"))
    freq = tok.groupBy("tok").agg(F.count("*").alias("c"))
    scored = tok.join(F.broadcast(freq), "tok").select(
        "doc_id",
        F.round(F.lit(RARITY_FXP) / F.col("c")).cast("long").alias("r"),
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("r").cast("long").alias("sum_rarity_fxp"),
        (
            F.sum("r").cast("double") / RARITY_FXP / F.count("*")
        ).alias("avg_token_rarity"),
    )


@query(
    "curation_dataset_card",
    oracle="""
    WITH langs AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(min(n_chars) AS BIGINT) AS min_chars,
               CAST(max(n_chars) AS BIGINT) AS max_chars,
               CAST(sum(n_chars) // count(*) AS BIGINT) AS mean_chars,
               CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts
        FROM documents
    )
    SELECT n_docs, n_langs, n_sources, total_chars, min_chars,
           max_chars, mean_chars, n_unique_texts,
           CAST((n_docs - n_unique_texts) * 1000000 // n_docs AS BIGINT)
               AS dup_rate_ppm,
           CAST((SELECT count(*) FROM documents WHERE lang = 'en')
                * 1000000 // n_docs AS BIGINT) AS en_share_ppm
    FROM langs
    """,
    tags=("curation", "dataset-card", "profiling", "engine-addition"),
)
def curation_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset datasheet — the summary block of a dataset
    card (corpus size, language/source diversity, length envelope,
    exact-duplicate rate, dominant-language share), computed in ONE
    scan. Rates are integer ppm so every cell is an integer.

    Scale shape: a single full-scan aggregate with map-side partials;
    the exact-dup counter rides the same pass as a distinct over
    md5(text) — at 100 TB that distinct is the one shuffle (content
    hashes, not documents, move), or swaps to an HLL/bitmap partial
    (agg_bitmap_distinct) when an estimate suffices. No joins, no
    second scan — the en-share subquery in the oracle is a
    conditional sum in the Spark plan."""
    d = load_table(spark, sf_dir, "documents")
    card = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        F.expr("CAST(sum(n_chars) div count(*) AS BIGINT)").alias("mean_chars"),
        F.countDistinct(F.md5("text")).cast("bigint").alias("n_unique_texts"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("n_en"),
    )
    return card.select(
        "n_docs",
        "n_langs",
        "n_sources",
        "total_chars",
        "min_chars",
        "max_chars",
        "mean_chars",
        "n_unique_texts",
        F.expr(
            "CAST((n_docs - n_unique_texts) * 1000000 div n_docs AS BIGINT)"
        ).alias("dup_rate_ppm"),
        F.expr("CAST(n_en * 1000000 div n_docs AS BIGINT)").alias(
            "en_share_ppm"
        ),
    )


@query(
    "curation_vocab_coverage",
    oracle=f"""
    WITH toks AS (
        SELECT source, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    vocab AS (
        SELECT tok FROM (
            SELECT tok, count(*) AS c FROM toks
            GROUP BY tok ORDER BY c DESC, tok ASC LIMIT 1000
        )
    ),
    per AS (
        SELECT t.source,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_oov
        FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
        GROUP BY t.source
    )
    SELECT source, n_tokens, n_oov,
           CAST(n_oov * 1000000 // n_tokens AS BIGINT) AS oov_ppm
    FROM per ORDER BY source
    """,
    tags=("curation", "tokenizer", "coverage", "engine-addition"),
)
def curation_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage audit: build the top-1000-token
    vocabulary from the corpus itself (count-ranked, token string as
    the deterministic tie-break) and measure each source's
    out-of-vocabulary rate in integer ppm — the pre-training check
    that a tokenizer fit on one mixture doesn't silently shred
    another source into rare pieces. The vocabulary cut is a
    TakeOrderedAndProject (top-k merge, not a global sort) and the
    OOV probe is a BROADCAST left join against the 1000-row vocab;
    the rate is integer division, so both engines agree exactly.

    Scale: two token-shuffles (global counts, per-source counts) and
    a broadcast probe — the vocab table stays driver-sized by
    construction no matter the corpus size."""
    toks = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(_toks(F.col("text"))).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(1000)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    per = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
    )
    return per.select(
        "source",
        "n_tokens",
        "n_oov",
        F.expr("CAST(n_oov * 1000000 div n_tokens AS BIGINT)").alias(
            "oov_ppm"
        ),
    ).orderBy("source")


@query(
    "curation_source_overlap_matrix",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT source, md5({_NORM_SQL}) AS ch FROM documents
    ),
    sizes AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_distinct FROM h
        GROUP BY source
    ),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS shared
        FROM h a JOIN h b ON a.ch = b.ch AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT p.source_a, p.source_b, sa.n_distinct AS n_a,
           sb.n_distinct AS n_b, p.shared,
           CAST(p.shared * 1000000 // least(sa.n_distinct, sb.n_distinct)
                AS BIGINT) AS containment_ppm
    FROM pairs p
    JOIN sizes sa ON p.source_a = sa.source
    JOIN sizes sb ON p.source_b = sb.source
    ORDER BY p.source_a, p.source_b
    """,
    tags=("curation", "dedup", "provenance", "engine-addition"),
)
def curation_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate-overlap matrix: for every source pair,
    how many normalized content hashes they SHARE, with containment
    (shared / smaller side) in integer ppm — the provenance audit
    that tells a curation pipeline two crawls are re-serving the
    same content before it double-weights them in the mixture. The
    join key is the md5 of normalized text, so overlap is exact
    (same discipline as dedup_exact), and each source's hash set is
    deduped BEFORE the pair join.

    Scale: one (source, hash) dedup shuffle, one hash-keyed
    self-join whose fan-out is bounded by per-hash source counts
    (<= |sources| per hash, never row counts), and a |sources|^2
    output. No text ever moves after the hash."""
    # the deduped (source, hash) set feeds three legs (sizes + both
    # self-join sides) and the size vector two broadcasts: staged, or
    # the scan+distinct re-runs per consumer (r9 worst-shuffle sweep)
    h = materialize(
        load_table(spark, sf_dir, "documents")
        .select("source", F.md5(_norm(F.col("text"))).alias("ch"))
        .distinct()
    )
    sizes = materialize(
        h.groupBy("source").agg(
            F.count("*").cast("bigint").alias("n_distinct")
        )
    )
    a, b = h.alias("a"), h.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.ch") == F.col("b.ch"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").cast("bigint").alias("shared"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("n_distinct").alias("n_a")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("n_distinct").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "shared",
            F.expr(
                "CAST(shared * 1000000 div least(n_a, n_b) AS BIGINT)"
            ).alias("containment_ppm"),
        )
        .orderBy("source_a", "source_b")
    )


_SWEEP_LADDER = (50, 100, 200, 300, 400)


@query(
    "curation_filter_sweep",
    oracle="""
    WITH bucketed AS (
        SELECT CASE WHEN n_chars >= 400 THEN 400
                    WHEN n_chars >= 300 THEN 300
                    WHEN n_chars >= 200 THEN 200
                    WHEN n_chars >= 100 THEN 100
                    WHEN n_chars >= 50 THEN 50
                    ELSE 0 END AS bucket,
               n_chars
        FROM documents
    ),
    partials AS (
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS docs,
               CAST(SUM(n_chars) AS BIGINT) AS chars
        FROM bucketed GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(docs) AS BIGINT) AS all_docs,
               CAST(SUM(chars) AS BIGINT) AS all_chars
        FROM partials
    )
    SELECT l.min_chars,
           CAST(COALESCE(SUM(p.docs), 0) AS BIGINT) AS kept_docs,
           CAST(COALESCE(SUM(p.docs), 0) * 1000000 // MIN(t.all_docs)
                AS BIGINT) AS kept_docs_ppm,
           CAST(COALESCE(SUM(p.chars), 0) AS BIGINT) AS kept_chars,
           CAST(COALESCE(SUM(p.chars), 0) * 1000000 // MIN(t.all_chars)
                AS BIGINT) AS kept_chars_ppm
    FROM (VALUES (50), (100), (200), (300), (400)) AS l(min_chars)
    LEFT JOIN partials p ON p.bucket >= l.min_chars
    CROSS JOIN tot t
    GROUP BY l.min_chars
    ORDER BY l.min_chars
    """,
    tags=("curation", "quality-filter", "tuning-sweep", "engine-addition"),
)
def curation_filter_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter threshold sweep — the tuning curve a curation
    pipeline reads before committing to a min-length cutoff: for each
    candidate threshold, how many documents and how much character
    mass survive (both in exact integer ppm). The companion study to
    dedup_lsh_tuning: parameters are chosen from a measured curve,
    not folklore.

    Scale shape: ONE scan reduces the corpus to |ladder|+1 bucket
    partials (bucket = largest threshold <= n_chars), and every curve
    point is a rollup of those partials via a tiny range join — the
    corpus is NOT re-scanned per threshold, the same
    partial-then-rollup trick ml_learning_curve uses. Thresholds that
    kill the whole corpus still emit a zero row (left join), so the
    sweep's domain is stable across scale factors."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.when(F.col("n_chars") >= 400, 400)
        .when(F.col("n_chars") >= 300, 300)
        .when(F.col("n_chars") >= 200, 200)
        .when(F.col("n_chars") >= 100, 100)
        .when(F.col("n_chars") >= 50, 50)
        .otherwise(0)
    )
    partials = docs.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_chars").cast("bigint").alias("chars"),
    )
    tot = partials.agg(
        F.sum("docs").cast("bigint").alias("all_docs"),
        F.sum("chars").cast("bigint").alias("all_chars"),
    )
    ladder = spark.createDataFrame(
        [(v,) for v in _SWEEP_LADDER], "min_chars int"
    )
    return (
        ladder.join(
            partials, F.col("bucket") >= F.col("min_chars"), "left"
        )
        .crossJoin(F.broadcast(tot))
        .groupBy("min_chars")
        .agg(
            F.coalesce(F.sum("docs"), F.lit(0))
            .cast("bigint")
            .alias("kept_docs"),
            F.expr(
                "CAST(coalesce(sum(docs), 0) * 1000000 div min(all_docs)"
                " AS BIGINT)"
            ).alias("kept_docs_ppm"),
            F.coalesce(F.sum("chars"), F.lit(0))
            .cast("bigint")
            .alias("kept_chars"),
            F.expr(
                "CAST(coalesce(sum(chars), 0) * 1000000 div min(all_chars)"
                " AS BIGINT)"
            ).alias("kept_chars_ppm"),
        )
        .orderBy("min_chars")
    )


# Pinned target mixture for rebalancing (ppm, sums to 1e6): the
# curator's desired domain blend, independent of what the corpus
# happens to contain today.
_MIX_TARGET_PPM = {
    "web": 400_000,
    "code": 250_000,
    "books": 200_000,
    "wiki": 150_000,
}


def _mix_target_sql() -> str:
    rows = ", ".join(
        f"('{k}', {v})" for k, v in _MIX_TARGET_PPM.items()
    )
    return f"(VALUES {rows}) AS t(source, target_ppm)"


@query(
    "curation_mixture_rebalance_plan",
    oracle=f"""
    WITH cur AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars
        FROM documents GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(n_chars) AS BIGINT) AS chars_all FROM cur
    ),
    plan AS (
        SELECT c.source, c.n_docs, c.n_chars,
               CAST(c.n_chars * 1000000 // t2.chars_all AS BIGINT)
                   AS current_ppm,
               CAST(COALESCE(t.target_ppm, 0) AS BIGINT) AS target_ppm
        FROM cur c
        LEFT JOIN {_mix_target_sql()} ON t.source = c.source
        CROSS JOIN tot t2
    )
    SELECT source, n_docs, n_chars, current_ppm, target_ppm,
           CAST(CASE WHEN current_ppm = 0 THEN 0
                     WHEN target_ppm >= current_ppm THEN 1000000
                     ELSE target_ppm * 1000000 // current_ppm END
                AS BIGINT) AS keep_rate_ppm,
           CAST(CASE WHEN current_ppm = 0 THEN 0
                     WHEN target_ppm >= current_ppm THEN n_chars
                     ELSE n_chars * (target_ppm * 1000000 // current_ppm)
                          // 1000000 END AS BIGINT) AS chars_kept
    FROM plan ORDER BY source
    """,
    tags=("curation", "mixture", "rebalancing", "engine-addition"),
)
def curation_mixture_rebalance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing plan — the executable follow-up to
    curation_domain_mixture's descriptive counts: given a PINNED
    target blend (ppm per source), compute each source's current
    token share and the downsampling keep-rate that moves the corpus
    toward target without upsampling (sources at-or-under target
    keep everything — rate capped at 1e6; over-target sources keep
    target/current). All integer ppm floor arithmetic, so the plan
    is reproducible to the byte; chars_kept is the post-plan budget
    per source a shard writer would enforce via hash-gating.

    Scale shape: one per-source aggregate (metadata-scale), O(sources)
    plan arithmetic."""
    cur = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
    )
    tot = cur.agg(F.sum("n_chars").cast("bigint").alias("chars_all"))
    target = spark.createDataFrame(
        list(_MIX_TARGET_PPM.items()), "source string, target_ppm bigint"
    )
    plan = (
        cur.join(F.broadcast(target), "source", "left")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "source", "n_docs", "n_chars",
            "CAST(n_chars * 1000000 div chars_all AS BIGINT)"
            " AS current_ppm",
            "CAST(COALESCE(target_ppm, 0) AS BIGINT) AS target_ppm",
        )
    )
    return plan.selectExpr(
        "source", "n_docs", "n_chars", "current_ppm", "target_ppm",
        "CAST(CASE WHEN current_ppm = 0 THEN 0"
        " WHEN target_ppm >= current_ppm THEN 1000000"
        " ELSE target_ppm * 1000000 div current_ppm END AS BIGINT)"
        " AS keep_rate_ppm",
        "CAST(CASE WHEN current_ppm = 0 THEN 0"
        " WHEN target_ppm >= current_ppm THEN n_chars"
        " ELSE n_chars * (target_ppm * 1000000 div current_ppm)"
        " div 1000000 END AS BIGINT) AS chars_kept",
    ).orderBy("source")


@query(
    "curation_span_cut",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    pos AS (
        SELECT doc_id, t,
               unnest(generate_series(1, CASE WHEN len(t) >= 8
                      THEN len(t) - 7 ELSE 0 END)) AS i
        FROM toks
    ),
    w AS (
        SELECT doc_id, i, array_to_string(t[i:i + 7], ' ') AS win FROM pos
    ),
    x AS (
        SELECT doc_id, i,
               min(doc_id) OVER (PARTITION BY win)
                 <> max(doc_id) OVER (PARTITION BY win) AS xdoc
        FROM w
    ),
    brk AS (
        SELECT doc_id, i,
               CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i)
                         > 8 THEN 1 ELSE 0 END AS b
        FROM x WHERE xdoc
    ),
    iv AS (
        SELECT doc_id, min(i) AS lo, max(i) + 7 AS hi
        FROM (SELECT doc_id, i,
                     sum(b) OVER (PARTITION BY doc_id ORDER BY i) AS grp
              FROM brk)
        GROUP BY doc_id, grp
    ),
    allpos AS (
        SELECT doc_id, unnest(generate_series(1, len(t))) AS p, t
        FROM toks
    ),
    kept AS (
        SELECT a.doc_id, a.p, a.t[a.p] AS tok
        FROM allpos a
        WHERE NOT EXISTS (
            SELECT 1 FROM iv
            WHERE iv.doc_id = a.doc_id AND a.p BETWEEN iv.lo AND iv.hi
        )
    )
    SELECT t.doc_id,
           CAST(len(t.t) AS BIGINT) AS n_tokens,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept_tokens,
           coalesce(k.cleaned_text, '') AS cleaned_text
    FROM toks t
    LEFT JOIN (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(tok, ' ' ORDER BY p) AS cleaned_text
        FROM kept GROUP BY doc_id
    ) k USING (doc_id)
    ORDER BY t.doc_id
    """,
    tags=("curation", "dedup", "exact-substr", "engine-addition"),
)
def curation_span_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUT step that closes the exact-substring dedup lifecycle
    (detect: dedup_exact_substr_spans; gate: _coverage; this APPLIES):
    every token covered by a cross-document duplicated span (the
    Lee-et-al remove-all policy — boilerplate navigation, licence
    blocks, templated footers) is removed from every document, and
    the cleaned text is reassembled in original token order. Every
    document reports — untouched docs keep their full token count, a
    fully-boilerplate doc degrades to an empty string (which the
    downstream Gopher length gate then drops), so the curation audit
    trail has no holes.

    Scale shape: the same stages as the span detector (skew-safe
    groupBy+rejoin gram-hash flag via dedup._xdoc_gram_positions —
    not a window, which would straggle on hot boilerplate grams —
    then the per-doc islands shuffle), then the cut itself is a
    per-doc range anti-join of token positions against that doc's few
    covered intervals (co-partitioned on doc_id — the interval list
    per doc is bounded by text length / K) and one per-doc ordered
    reassembly. The full-text rewrite is the one stage that is
    inherently token-volume-sized — exactly the cost a real pipeline
    pays to rewrite its corpus."""
    from .dedup import ES_K, _xdoc_gram_positions

    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    dup = _xdoc_gram_positions(toks)
    from pyspark.sql import Window

    dw = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(dw) > ES_K, F.lit(1)
    ).otherwise(F.lit(0))
    iv = (
        dup.withColumn("grp", F.sum(brk).over(dw))
        .groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("lo"),
            (F.max("pos") + (ES_K - 1)).alias("hi"),
        )
        .select("doc_id", "lo", "hi")
    )
    allpos = toks.select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        F.posexplode("t").alias("p0", "tok"),
    ).select("doc_id", "n_tokens", (F.col("p0") + 1).alias("p"), "tok")
    kept = allpos.join(
        iv,
        (allpos.doc_id == iv.doc_id)
        & (allpos.p >= iv.lo)
        & (allpos.p <= iv.hi),
        "left_anti",
    )
    per_doc = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept_tokens"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tok"))),
                lambda s: s.tok,
            ),
        ).alias("cleaned_text"),
    )
    spine = toks.select("doc_id", F.size("t").cast("bigint").alias("n_tokens"))
    return (
        spine.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_kept_tokens", F.lit(0))
            .cast("bigint")
            .alias("n_kept_tokens"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
        .orderBy("doc_id")
    )
