"""Text analysis over ``documents`` (north-star extension; SURVEY.md
§2.6 / §7 M5): token stats, quality scoring, language-ID heuristic,
fingerprinting.

The reference has no text processing at all (its strings are weather
condition labels, app.py:450); these are the LLM-pipeline operators a
training-data curation job needs. Everything is built-in higher-order
functions (transform/filter/aggregate over split output) — JVM
codegen, no Python in the row path, so a 100 TB corpus scans at
parquet speed with zero shuffles (all queries here are per-row maps;
the only wide op is the optional per-language rollup).

Cross-engine notes: both engines do sequential left folds
(F.aggregate vs list_reduce), both share md5, and all ratios divide
long counts cast to double — results are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..data import load_table
from ..registry import query
from ..operators.scale import materialize, spread

# Stopword list for quality scoring (generic English function words).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# Fixed marker-token profiles for the language-ID heuristic, one per
# language code present in the corpus. Deliberately tiny: this is the
# classic "closed-class word profile" n-gram heuristic, evaluated
# deterministically; accuracy on the synthetic corpus is reported by
# the is_correct column rather than assumed.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "la", "les", "et"),
    "es": ("el", "los", "una", "y"),
    "zh": ("的", "是", "了", "在"),
}

SHINGLE_K = 8  # character-shingle width for fingerprints


def _norm(col: Column) -> Column:
    """lower + collapse whitespace + trim — shared normalizer."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _toks(col: Column) -> Column:
    return F.split(_norm(col), " ")


_TOKS_SQL = f"string_split({_NORM_SQL}, ' ')"


@query(
    "text_token_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks, text FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT)
             AS n_subword_tokens,
           CAST(list_reduce(list_transform(toks, t -> CAST(len(t) AS BIGINT)),
                            (a, x) -> a + x) AS DOUBLE) / len(toks) AS avg_token_len,
           CAST(len(toks) AS DOUBLE) / len(list_distinct(toks)) AS repetition_ratio
    FROM t
    """,
    tags=("text", "tokens"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, BPE-ish
    regex subword tokens, mean token length, repetition ratio."""
    d = load_table(spark, sf_dir, "documents")
    toks = _toks(F.col("text"))
    n_tokens = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        F.regexp_count("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"))
        .cast("long")
        .alias("n_subword_tokens"),
        (
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("long")),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            ).cast("double")
            / n_tokens
        ).alias("avg_token_len"),
        (n_tokens.cast("double") / n_distinct).alias("repetition_ratio"),
    )


@query(
    "text_quality_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, text, {_TOKS_SQL} AS toks FROM documents)
    SELECT doc_id, lang,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(toks, t -> t IN {STOPWORDS!r})) AS DOUBLE)
             / len(toks) AS stopword_ratio,
           CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
             / length(text) AS punct_ratio,
           CAST(len(list_filter(toks, t -> len(t) >= 4)) AS DOUBLE)
             / len(toks) AS long_token_ratio,
           round(
             0.4 * least(CAST(len(toks) AS DOUBLE) / 100, 1.0)
             + 0.3 * (1 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
                          / length(text))
             + 0.3 * least(10 * CAST(len(list_filter(toks, t -> t IN {STOPWORDS!r}))
                                AS DOUBLE) / len(toks), 1.0),
             6) AS quality_score
    FROM t
    """,
    tags=("text", "quality"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, punctuation density, long-token
    ratio, folded into a bounded [0,1] composite score — the standard
    cheap pre-filter before expensive curation stages."""
    d = load_table(spark, sf_dir, "documents")
    toks = _toks(F.col("text"))
    n_tokens = F.size(toks).cast("long")
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double")
        / n_tokens
    )
    punct_ratio = (
        F.regexp_count("text", F.lit(r"[^a-zA-Z0-9\s]")).cast("double")
        / F.length("text")
    )
    long_ratio = (
        F.size(F.filter(toks, lambda t: F.length(t) >= 4)).cast("double") / n_tokens
    )
    score = F.round(
        0.4 * F.least(n_tokens.cast("double") / 100, F.lit(1.0))
        + 0.3 * (1 - punct_ratio)
        + 0.3 * F.least(10 * stop_ratio, F.lit(1.0)),
        6,
    )
    return d.select(
        "doc_id",
        "lang",
        F.length("text").cast("long").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        long_ratio.alias("long_token_ratio"),
        score.alias("quality_score"),
    )


def _profile_score_sql(profile: tuple[str, ...]) -> str:
    return f"CAST(len(list_filter(toks, t -> t IN {profile!r})) AS BIGINT)"


def _lang_pred_sql() -> str:
    """Deterministic argmax over profile scores, ties broken by the
    fixed language order of LANG_PROFILES."""
    langs = list(LANG_PROFILES)
    scores = {lg: f"s_{lg}" for lg in langs}
    clauses = []
    for i, lg in enumerate(langs):
        rest = [scores[o] for o in langs[i + 1 :]]
        cond = " AND ".join(f"{scores[lg]} >= {r}" for r in rest) or "TRUE"
        clauses.append(f"WHEN {cond} THEN '{lg}'")
    return "CASE " + " ".join(clauses) + " END"


@query(
    "text_language_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS_SQL} AS toks FROM documents),
    s AS (SELECT doc_id, lang,
          {", ".join(f"{_profile_score_sql(p)} AS s_{lg}" for lg, p in LANG_PROFILES.items())}
          FROM t)
    SELECT doc_id, lang, {", ".join(f"s_{lg}" for lg in LANG_PROFILES)},
           {_lang_pred_sql()} AS predicted_lang,
           coalesce({_lang_pred_sql()} = lang, FALSE) AS is_correct
    FROM s
    """,
    tags=("text", "langid"),
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via closed-class marker-token profiles: score each
    language's profile against the token bag, argmax with a fixed
    tie-break order. Reported per-doc with an is_correct column (the
    synthetic corpus is language-agnostic, so accuracy here measures
    the corpus, not the method)."""
    d = load_table(spark, sf_dir, "documents")
    toks = _toks(F.col("text"))
    def profile_pred(profile: tuple[str, ...]):
        # NB: a `p=profile` default arg would be mistaken for the
        # optional index parameter of a two-arg filter lambda.
        return lambda t: t.isin(*profile)

    scored = d.select(
        "doc_id",
        "lang",
        *[
            F.size(F.filter(toks, profile_pred(p))).cast("long").alias(f"s_{lg}")
            for lg, p in LANG_PROFILES.items()
        ],
    )
    langs = list(LANG_PROFILES)
    pred: Column | None = None
    # Build the argmax CASE chain back-to-front (same tie-break as SQL).
    for i in range(len(langs) - 1, -1, -1):
        lg = langs[i]
        cond = None
        for other in langs[i + 1 :]:
            c = F.col(f"s_{lg}") >= F.col(f"s_{other}")
            cond = c if cond is None else (cond & c)
        pred = (
            F.lit(lg)
            if pred is None
            else F.when(cond, lg).otherwise(pred)
            if cond is not None
            else F.lit(lg)
        )
    return scored.select(
        "doc_id",
        "lang",
        *[f"s_{lg}" for lg in langs],
        pred.alias("predicted_lang"),
        # unlabeled (NULL-lang) docs count as not-correct on BOTH sides
        # (the null sweep caught NULL-boolean comparator divergence)
        F.coalesce(pred == F.col("lang"), F.lit(False)).alias("is_correct"),
    )


@query(
    "text_fingerprint",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_NORM_SQL} AS norm FROM documents),
    s AS (SELECT doc_id, norm,
                 list_transform(range(1, len(norm) - {SHINGLE_K - 2}),
                                i -> md5(substring(norm, i, {SHINGLE_K}))) AS sh
          FROM t)
    SELECT doc_id,
           md5(norm) AS content_hash,
           list_aggregate(sh, 'min') AS min_shingle_hash,
           list_aggregate(sh, 'max') AS max_shingle_hash,
           CAST(len(sh) AS BIGINT) AS n_shingles
    FROM s
    """,
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whole-content md5 plus rolling
    character-shingle hashes reduced to min/max (a 1-permutation
    MinHash — the primitive dedup_minhash_pairs generalizes).

    The normalized text is materialized as an attribute BEFORE the
    shingle lambda touches it — inlining `_norm` into the lambda
    re-evaluates the regexp per array element (quadratic per doc:
    11.2s → 2.3s at sf0.1). Input spread first: md5-per-shingle is
    CPU-bound and the corpus file is byte-small (one scan partition
    otherwise)."""
    from ..operators.scale import materialize, spread

    d = spread(load_table(spark, sf_dir, "documents"))
    t = d.select("doc_id", _norm(F.col("text")).alias("norm"))
    nc = F.col("norm")
    sh = F.transform(
        F.sequence(F.lit(1), F.length(nc) - (SHINGLE_K - 1)),
        lambda i: F.md5(nc.substr(i, F.lit(SHINGLE_K))),
    )
    return t.select(
        "doc_id",
        F.md5(nc).alias("content_hash"),
        F.array_min(sh).alias("min_shingle_hash"),
        F.array_max(sh).alias("max_shingle_hash"),
        F.size(sh).cast("long").alias("n_shingles"),
    )


TFIDF_TOP_K = 3


@query(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM toks GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        -- rounded to 6 decimals before ranking: Java's and C's ln()
        -- differ in the last ulp, so the raw double is not
        -- cross-engine-stable (everything else here is exact-int math)
        SELECT tf.doc_id, tf.term,
               round(CAST(tf.tf AS DOUBLE) * ln(1.0 + CAST(n.n_docs AS DOUBLE) / df.df),
                     6) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
        FROM scored
    ) r WHERE rnk <= {TFIDF_TOP_K}
    """,
    tags=("text", "tfidf"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational TF-IDF, top-k characteristic terms per document:
    term frequency (explode + groupBy), document frequency (distinct
    docs per term — a broadcast-sized table), idf = ln(1 + N/df),
    rank per doc. All counts are exact integers, so the double score
    is bit-identical cross-engine; ties break on the term.

    Scale shape: two shuffles (tf by (doc, term), df by term), the
    df table broadcasts back, top-k is a windowed rank-limit — no
    corpus-sized collect anywhere (the MLlib HashingTF/IDF pipeline
    trades exactness for fixed-width vectors; this form keeps exact
    terms, which is what near-dup explanations and quality audits
    want)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(_norm(F.col("text")), " ")).alias("term")
    )
    # the term-frequency table is the one materialization (a real
    # pipeline persists it): df derives FROM it (tf is per (doc,
    # term), so rows-per-term IS the document frequency) — the
    # un-staged form tokenized the corpus three times
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .transform(materialize)
    )
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n = d.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf").cast("double")
                * F.log(1.0 + F.col("n_docs") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= TFIDF_TOP_K)
    )


PMI_MIN_COUNT = 5
PMI_TOP_K = 20


@query(
    "text_collocation_pmi",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split({_NORM_SQL}, ' ') AS tk FROM documents
    ),
    grams AS (
        SELECT unnest(list_transform(
                   range(1, len(tk)),
                   i -> tk[i] || ' ' || tk[i+1])) AS bigram
        FROM toks
    ),
    uni AS (
        SELECT unnest(tk) AS tok FROM toks
    ),
    cb AS (SELECT bigram, count(*) AS c_ab FROM grams GROUP BY bigram),
    cu AS (SELECT tok, count(*) AS c FROM uni GROUP BY tok),
    tot AS (SELECT (SELECT count(*) FROM uni) AS n_tok,
                   (SELECT count(*) FROM grams) AS n_big)
    SELECT bigram, c_ab,
           round(ln((CAST(c_ab AS DOUBLE) * n_tok * n_tok)
                    / (CAST(a.c AS DOUBLE) * b.c * n_big)), 6) AS pmi
    FROM cb, tot
    JOIN cu a ON a.tok = string_split(bigram, ' ')[1]
    JOIN cu b ON b.tok = string_split(bigram, ' ')[2]
    WHERE c_ab >= {PMI_MIN_COUNT}
    ORDER BY pmi DESC, bigram
    LIMIT {PMI_TOP_K}
    """,
    tags=("text", "collocation"),
)
def text_collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top bigrams by pointwise mutual
    information, PMI = ln(p(ab) / p(a)p(b)) — the corpus-statistics
    pass that finds multiword expressions before tokenizer training.
    All counts are exact integers and the ln argument is one double
    ratio, so cross-engine agreement holds after rounding to 6
    decimals (ln's last ulp differs between libm and the JVM — the
    same guard text_tfidf_top_terms uses).

    Scale shape: two count aggregates (bigrams, unigrams — both
    map-side combined), unigram counts broadcast back twice, top-k
    via TakeOrdered. No all-pairs anything; cost is linear in corpus
    tokens."""
    from ..operators.scale import materialize, spread

    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select(F.split(_norm(F.col("text")), " ").alias("tk"))
    tk = F.col("tk")
    grams = toks.select(
        F.explode(
            F.zip_with(
                F.slice(tk, 1, F.size(tk) - 1),
                F.slice(tk, 2, F.size(tk) - 1),
                lambda x, y: F.concat_ws(" ", x, y),
            )
        ).alias("bigram")
    )
    uni = toks.select(F.explode(tk).alias("tok"))
    # count tables are staged once (each has two consumers), and the
    # corpus totals derive FROM the counts — the un-staged form
    # re-tokenized the corpus 5x (plan-audit sweep)
    cb = (
        grams.groupBy("bigram")
        .agg(F.count("*").alias("c_ab"))
        .transform(materialize)
    )
    cu = (
        uni.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .transform(materialize)
    )
    tot = cu.agg(F.sum("c").alias("n_tok")).crossJoin(
        cb.agg(F.sum("c_ab").alias("n_big"))
    )
    a = cu.select(F.col("tok").alias("tok_a"), F.col("c").alias("c_a"))
    b = cu.select(F.col("tok").alias("tok_b"), F.col("c").alias("c_b"))
    parts = F.split(F.col("bigram"), " ")
    pmi = F.round(
        F.log(
            (F.col("c_ab").cast("double") * F.col("n_tok") * F.col("n_tok"))
            / (F.col("c_a").cast("double") * F.col("c_b") * F.col("n_big"))
        ),
        6,
    )
    return (
        cb.where(F.col("c_ab") >= PMI_MIN_COUNT)
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(a), parts.getItem(0) == F.col("tok_a"))
        .join(F.broadcast(b), parts.getItem(1) == F.col("tok_b"))
        .select("bigram", "c_ab", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "bigram")
        .limit(PMI_TOP_K)
    )


NGRAM_N = 3
NGRAM_TOP = 5


@query(
    "text_char_ngram_profile",
    oracle=f"""
    WITH t AS (SELECT lang, {_NORM_SQL} AS norm FROM documents),
    grams AS (
        SELECT lang,
               unnest(list_transform(
                   range(1, len(norm) - {NGRAM_N - 2}),
                   i -> substring(norm, i, {NGRAM_N}))) AS gram
        FROM t
    ),
    counted AS (
        SELECT lang, gram, count(*) AS c FROM grams GROUP BY lang, gram
    )
    SELECT lang, gram, c, CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY lang ORDER BY c DESC, gram) AS rnk
        FROM counted
    ) r WHERE rnk <= {NGRAM_TOP}
    """,
    tags=("text", "ngram", "langid"),
)
def text_char_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language character-trigram profile (top-{NGRAM_TOP} by
    frequency): the feature table a statistical language identifier
    trains on — text_language_id consumes a hand-written profile;
    this query DERIVES one from the corpus. Counts are exact ints,
    ranking tie-breaks on the gram, so the profile is deterministic.

    Scale shape: chars explode ~n_chars rows per doc, but the
    (lang, gram) aggregate gets map-side combine, so the shuffle
    carries only the distinct-gram table per partition; top-k is a
    tiny per-lang window. The normalized text is materialized before
    the transform lambda (the HOF re-evaluation trap)."""
    from ..operators.scale import materialize, spread

    d = spread(load_table(spark, sf_dir, "documents"))
    t = d.select("lang", _norm(F.col("text")).alias("norm"))
    nc = F.col("norm")
    grams = t.select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length(nc) - (NGRAM_N - 1)),
                lambda i: nc.substr(i, F.lit(NGRAM_N)),
            )
        ).alias("gram"),
    )
    counted = grams.groupBy("lang", "gram").agg(F.count("*").alias("c"))
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), "gram")
    return (
        counted.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= NGRAM_TOP)
    )


# Chunking geometry: window/stride in whitespace tokens. Stride < window
# gives the overlap every pretraining / retrieval pipeline keeps so no
# span is split across a boundary without context.
CHUNK_W = 32
CHUNK_S = 24


@query(
    "text_chunk_documents",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS_SQL} AS t FROM documents
    ),
    sized AS (
        SELECT doc_id, t, len(t) AS n,
               1 + CAST(greatest(len(t) - {CHUNK_W} + {CHUNK_S} - 1, 0)
                        // {CHUNK_S} AS BIGINT) AS nc
        FROM toks
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           CAST(len(list_slice(t, i * {CHUNK_S} + 1,
                               i * {CHUNK_S} + {CHUNK_W})) AS BIGINT)
             AS n_chunk_tokens,
           md5(array_to_string(list_slice(t, i * {CHUNK_S} + 1,
                                          i * {CHUNK_S} + {CHUNK_W}), ' '))
             AS chunk_hash
    FROM sized, UNNEST(generate_series(0, nc - 1)) AS u(i)
    """,
    tags=("text", "chunking", "generator"),
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the prep step every
    pretraining / retrieval corpus runs: window of 32 tokens, stride
    24 (8-token overlap), per-chunk token count and content hash.
    Chunk count is pure integer math (1 + ceil(max(n-W,0)/S)), so
    every doc yields >= 1 chunk and the last partial window is kept.

    Scale shape: narrow generator — sequence + explode fans each doc
    out to its chunks with NO shuffle at all; the chunk id is
    (doc_id, chunk_idx), reproducible across retries, and the chunk
    hash (not the text) is what downstream dedup/shard stages key
    on. At 100 TB this is the map-only stage before the shard
    write."""
    d = load_table(spark, sf_dir, "documents")
    t = _toks(F.col("text"))
    sized = d.select(
        "doc_id",
        t.alias("t"),
    ).select(
        "doc_id",
        "t",
        F.floor(
            1 + F.greatest(F.size("t") - CHUNK_W + CHUNK_S - 1, F.lit(0)) / CHUNK_S
        ).cast("long").alias("nc"),
    )
    chunks = sized.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("chunk_idx"),
    )
    sl = F.slice(F.col("t"), F.col("chunk_idx") * CHUNK_S + 1, CHUNK_W)
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(sl).cast("long").alias("n_chunk_tokens"),
        F.md5(F.array_join(sl, " ").cast("binary")).alias("chunk_hash"),
    )


@query(
    "text_bpe_merge_candidates",
    oracle=f"""
    WITH norm AS (SELECT {_NORM_SQL} AS t FROM documents),
    pairs AS (
        SELECT substr(t, i, 2) AS pair
        FROM norm, UNNEST(range(1, length(t))) AS u(i)
        WHERE length(t) >= 2
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS cnt
    FROM pairs
    WHERE pair NOT LIKE '% %'
    GROUP BY pair
    ORDER BY cnt DESC, pair ASC
    LIMIT 20
    """,
    tags=("text", "tokenizer", "bpe"),
)
def text_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer induction, round one: the 20 most frequent adjacent
    character pairs over the normalized corpus — exactly the
    candidate set the first BPE merge selects from (pairs spanning a
    word boundary are excluded, as BPE operates within words).
    Counts are exact integers, so the cross-engine differential is
    exact; iterating the merge loop re-runs this same dataflow on
    the re-tokenized corpus.

    Scale shape: per-row transform + explode (narrow, no shuffle),
    one count shuffle on a bounded key domain (|charset|^2), then
    TakeOrderedAndProject — the canonical high-cardinality-input /
    low-cardinality-key aggregation, fully map-side combinable."""
    d = load_table(spark, sf_dir, "documents")
    t = _norm(F.col("text"))
    pairs = (
        d.select(t.alias("t"))
        .where(F.length("t") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, length(t) - 1), i -> substr(t, i, 2))")
            ).alias("pair")
        )
        .where(~F.col("pair").contains(" "))
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(20)
    )


@query(
    "text_inverted_postings",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
    ),
    clean AS (SELECT term, doc_id FROM tok WHERE term <> ''),
    stats AS (
        SELECT term,
               CAST(count(*) AS BIGINT) AS tf,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM clean GROUP BY term
    ),
    ranked AS (
        SELECT term, doc_id,
               row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
        FROM (SELECT DISTINCT term, doc_id FROM clean)
    ),
    postings AS (
        SELECT term,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
                 AS first_docs
        FROM ranked WHERE rn <= 10 GROUP BY term
    )
    SELECT s.term, s.df, s.tf, p.first_docs
    FROM stats s JOIN postings p ON p.term = s.term
    WHERE s.df >= 5
    ORDER BY s.df DESC, s.tf DESC, s.term ASC
    LIMIT 50
    """,
    tags=("text", "inverted-index", "search"),
)
def text_inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build — the search-engine / RAG-retrieval
    building block: per term, document frequency, total term
    frequency, and the first 10 postings (doc ids, ascending,
    comma-joined so the schema stays comparator-safe). Terms below
    df=5 are dropped; top-50 by df.

    Scale shape: the posting-list head is bounded BEFORE any
    collect_list runs — a row_number window per term keeps 10 rows,
    so no executor ever materializes a hot term's full posting list
    (the classic inverted-index skew trap; "the" at 100 TB is a
    multi-GB posting list). Stats and head-lists are two aggregates
    over the same exploded (term, doc_id) stream, joined on the tiny
    term table; TakeOrderedAndProject caps the output."""
    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(_toks(F.col("text"))).alias("term"))
        .where(F.col("term") != "")
    )
    stats = tok.groupBy("term").agg(
        F.count("*").cast("bigint").alias("tf"),
        F.countDistinct("doc_id").cast("bigint").alias("df"),
    )
    from pyspark.sql import Window

    pairs = tok.select("term", "doc_id").distinct()
    w = Window.partitionBy("term").orderBy("doc_id")
    head = (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .groupBy("term")
        .agg(
            # sort NUMERICALLY, then render — string sort would put
            # doc 10 before doc 2 and break the differential
            F.expr(
                "concat_ws(',', transform(sort_array(collect_list(doc_id)),"
                " x -> cast(x AS string)))"
            ).alias("first_docs")
        )
    )
    return (
        stats.join(head, "term")
        .where(F.col("df") >= 5)
        .select("term", "df", "tf", "first_docs")
        .orderBy(F.desc("df"), F.desc("tf"), F.asc("term"))
        .limit(50)
    )


BURST_TOP_TERMS = 10


@query(
    "text_term_burstiness",
    oracle=f"""
    WITH tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS x FROM (
            SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
        ) t GROUP BY 1, 2
    ),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    top AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df
        FROM tf GROUP BY 1
        ORDER BY df DESC, term ASC LIMIT {BURST_TOP_TERMS}
    ),
    st AS (
        SELECT tf.term,
               CAST(sum(tf.x) AS BIGINT) AS tf_total,
               CAST(sum(tf.x * tf.x) AS BIGINT) AS tf_sq
        FROM tf JOIN top ON tf.term = top.term
        GROUP BY 1
    )
    SELECT top.term, top.df, st.tf_total,
           CAST(nd.n_docs * st.tf_sq - st.tf_total * st.tf_total
                AS BIGINT) AS burst_num,
           CAST(nd.n_docs * st.tf_total AS BIGINT) AS burst_den,
           CAST(nd.n_docs * st.tf_sq - st.tf_total * st.tf_total AS DOUBLE)
             / CAST(nd.n_docs * st.tf_total AS DOUBLE) AS burstiness
    FROM top JOIN st ON top.term = st.term, nd
    ORDER BY top.df DESC, top.term ASC
    """,
    tags=("text", "burstiness", "statistics", "engine-addition"),
)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (variance-to-mean ratio of per-document term
    counts, zeros included) for the corpus's top document-frequency
    terms — the content-word vs function-word discriminator (bursty
    terms cluster in few docs; VMR ≈ 1 is Poisson background) that
    feeds stopword induction and keyword scoring. The VMR is
    cross-scaled to integers (num = N·Σx² − (Σx)², den = N·Σx over
    all N docs — absent docs contribute x = 0 to both, so only the
    term's tf table is ever touched) and the ratio is the single
    float op.

    Scale shape: one tokenize + (doc, term) count shuffle (the same
    TF table the TF-IDF family stages), a term-grain DF aggregate
    with TakeOrderedAndProject for the top slice, and a broadcast
    semi-join of the tiny top-term set back onto the TF table. No
    per-doc × per-term densification ever happens — the zeros are
    algebraic, not materialized."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(_toks(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
        .transform(materialize)
    )
    n_docs = d.count()
    top = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(BURST_TOP_TERMS)
    )
    st = (
        tf.join(F.broadcast(top), "term")
        .groupBy("term", "df")
        .agg(
            F.sum("x").cast("bigint").alias("tf_total"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("tf_sq"),
        )
    )
    num = F.lit(n_docs) * F.col("tf_sq") - F.col("tf_total") * F.col("tf_total")
    den = F.lit(n_docs) * F.col("tf_total")
    return st.select(
        "term",
        "df",
        "tf_total",
        num.cast("bigint").alias("burst_num"),
        den.cast("bigint").alias("burst_den"),
        (num.cast("double") / den.cast("double")).alias("burstiness"),
    ).orderBy(F.desc("df"), F.asc("term"))


def _bpe_pair_counts(tokens: DataFrame) -> DataFrame:
    """Adjacent-pair counts over a (word, cnt, pos, tok) token table,
    weighted by word frequency — one window pass + one bounded-key
    aggregate (the pair domain is |vocab_tokens|^2)."""
    w = Window.partitionBy("word").orderBy("pos")
    return (
        tokens.select(
            "cnt", F.col("tok").alias("x"), F.lead("tok").over(w).alias("y")
        )
        .where(F.col("y").isNotNull())
        .groupBy("x", "y")
        .agg(F.sum("cnt").cast("bigint").alias("pc"))
    )


def _bpe_merge(tokens: DataFrame, best: DataFrame) -> DataFrame:
    """Apply one BPE merge (the 1-row ``best`` = (x, y)) to the token
    table with greedy-leftmost semantics, expressed relationally:
    for x != y matches never overlap; for x == y the winners inside a
    run of x's are the even offsets from the run start (exactly what
    iterative leftmost-first merging selects). Consumed right-hand
    tokens drop, survivors renumber — positions stay contiguous so
    the next round's run arithmetic remains valid."""
    w = Window.partitionBy("word").orderBy("pos")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    a = tokens.crossJoin(F.broadcast(best)).select(
        "word",
        "cnt",
        "pos",
        "tok",
        "x",
        "y",
        F.lag("tok").over(w).alias("lag_tok"),
        F.lead("tok").over(w).alias("lead_tok"),
    )
    b = a.select(
        "*",
        F.last(
            F.when(
                (F.col("tok") == F.col("x"))
                & ~F.col("lag_tok").eqNullSafe(F.col("x")),
                F.col("pos"),
            ),
            ignorenulls=True,
        )
        .over(wcum)
        .alias("run_start"),
    )
    c = b.select(
        "*",
        (
            (F.col("tok") == F.col("x"))
            & (F.col("lead_tok") == F.col("y"))
            & (
                (F.col("x") != F.col("y"))
                | ((F.col("pos") - F.col("run_start")) % 2 == 0)
            )
        ).alias("mg"),
    )
    d = c.select("*", F.lag("mg").over(w).alias("consumed"))
    return (
        d.where(~F.coalesce(F.col("consumed"), F.lit(False)))
        .select(
            "word",
            "cnt",
            F.row_number().over(w).alias("pos"),
            F.when(F.col("mg"), F.concat("x", "y")).otherwise(F.col("tok")).alias(
                "tok"
            ),
        )
    )


def _bpe_round_sql(prev: str, r: int) -> str:
    """One unrolled BPE round for the DuckDB oracle: pair counts from
    ``prev``, 1-row argmax ``b{r}``, merged token table ``m{r}``."""
    return f"""
    p{r} AS (
        SELECT x, y, CAST(sum(cnt) AS BIGINT) AS pc FROM (
            SELECT cnt, tok AS x,
                   lead(tok) OVER (PARTITION BY word ORDER BY pos) AS y
            FROM {prev}
        ) WHERE y IS NOT NULL GROUP BY x, y
    ),
    b{r} AS (
        SELECT x, y, pc FROM p{r} ORDER BY pc DESC, x ASC, y ASC LIMIT 1
    ),
    m{r} AS MATERIALIZED (
        SELECT word, cnt,
               row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
               CASE WHEN mg THEN x || y ELSE tok END AS tok
        FROM (
            SELECT *, lag(mg) OVER (PARTITION BY word ORDER BY pos)
                        AS consumed
            FROM (
                SELECT *,
                       (tok = x AND lead_tok IS NOT DISTINCT FROM y
                        AND (x <> y OR (pos - run_start) % 2 = 0)) AS mg
                FROM (
                    SELECT *,
                           last_value(CASE WHEN tok = x
                                           AND lag_tok IS DISTINCT FROM x
                                      THEN pos END IGNORE NULLS)
                             OVER (PARTITION BY word ORDER BY pos
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS run_start
                    FROM (
                        SELECT t.word, t.cnt, t.pos, t.tok, b.x, b.y,
                               lag(t.tok) OVER (PARTITION BY t.word
                                                ORDER BY t.pos) AS lag_tok,
                               lead(t.tok) OVER (PARTITION BY t.word
                                                 ORDER BY t.pos) AS lead_tok
                        FROM {prev} t CROSS JOIN b{r} b
                    )
                )
            )
        )
        WHERE NOT coalesce(consumed, FALSE)
    )"""


@query(
    "text_bpe_train_rounds",
    oracle=f"""
    WITH words AS MATERIALIZED (
        SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest({_TOKS_SQL}) AS w FROM documents)
        WHERE w <> '' GROUP BY w
    ),
    t0 AS MATERIALIZED (
        SELECT word, cnt, CAST(i AS BIGINT) AS pos, substr(word, i, 1) AS tok
        FROM words, UNNEST(range(1, length(word) + 1)) AS u(i)
    ),
    {_bpe_round_sql('t0', 1)},
    {_bpe_round_sql('m1', 2)},
    {_bpe_round_sql('m2', 3)}
    SELECT merge_round, x, y, x || y AS merged, pc AS pair_cnt FROM (
        SELECT CAST(1 AS BIGINT) AS merge_round, * FROM b1
        UNION ALL SELECT CAST(2 AS BIGINT), * FROM b2
        UNION ALL SELECT CAST(3 AS BIGINT), * FROM b3
    ) ORDER BY merge_round
    """,
    tags=("text", "tokenizer", "bpe", "iterative", "engine-addition"),
)
def text_bpe_train_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING, three full merge rounds — the
    iterative loop ``text_bpe_merge_candidates`` stops short of. Each
    round counts adjacent token pairs over the word-frequency table
    (weighted by corpus occurrences, exactly how production BPE
    trainers scale: corpus-sized work happens once in the word
    count; every round after runs on the vocabulary), picks the
    argmax pair (ties: count desc, pair asc), and re-tokenizes with
    greedy-leftmost merge semantics expressed RELATIONALLY — no
    per-word loop: x!=y matches cannot overlap, and for x==y the
    winners are the even offsets from each run start, which is
    provably the leftmost-first iterative result. Output is the
    learned merge table (round, pair, merged token, weighted count),
    bit-identical across engines because every quantity is an
    integer and every tie-break is total.

    Scale shape: ONE corpus-sized explode+count shuffle builds the
    word table; each round is windows over one word-partitioned
    exchange (all specs share the sort) plus a bounded-key pair
    aggregate and a 1-row broadcast argmax. localCheckpoint per
    round cuts the 3-round lineage diamond (each round's tokens are
    read twice: pair count + merge).

    Cites the reference's text handling: the reference has no
    tokenizer; this is a SURVEY §2.6 engine addition for LLM
    training-data pipelines."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(_toks(F.col("text"))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    tokens = words.select(
        "word",
        "cnt",
        F.posexplode(
            F.expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))")
        ).alias("pos0", "tok"),
    ).select("word", "cnt", (F.col("pos0") + 1).cast("bigint").alias("pos"), "tok")
    tokens = tokens.transform(materialize)
    outs = []
    for r in (1, 2, 3):
        best = (
            _bpe_pair_counts(tokens)
            .orderBy(F.desc("pc"), F.asc("x"), F.asc("y"))
            .limit(1)
        ).transform(materialize)
        outs.append(
            best.select(
                F.lit(r).cast("bigint").alias("merge_round"),
                "x",
                "y",
                F.concat("x", "y").alias("merged"),
                F.col("pc").alias("pair_cnt"),
            )
        )
        if r < 3:
            tokens = _bpe_merge(tokens, best).transform(materialize)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("merge_round")


HOT_NGRAM_K = 5  # word-gram width for the heavy-hitter audit
HOT_NGRAM_TOP = 20


@query(
    "text_hot_ngrams",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, {_TOKS_SQL} AS t FROM documents
    ),
    grams AS (
        SELECT doc_id, source,
               array_to_string(t[i:i + {HOT_NGRAM_K - 1}], ' ') AS gram
        FROM toks,
             UNNEST(range(1, CASE WHEN len(t) >= {HOT_NGRAM_K}
                    THEN len(t) - {HOT_NGRAM_K - 2} ELSE 1 END)) AS u(i)
    ),
    per_doc AS (
        SELECT gram, doc_id, source, CAST(count(*) AS BIGINT) AS m
        FROM grams GROUP BY 1, 2, 3
    )
    SELECT gram,
           CAST(sum(m) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(min(doc_id) AS BIGINT) AS example_doc_id
    FROM per_doc GROUP BY gram
    ORDER BY n_occurrences DESC, gram ASC
    LIMIT {HOT_NGRAM_TOP}
    """,
    tags=("text", "ngram", "heavy-hitter", "memorization", "engine-addition"),
)
def text_hot_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global hot-n-gram table: the {HOT_NGRAM_TOP} most frequent
    word-{HOT_NGRAM_K}-grams with occurrence count, document spread,
    source spread, and an example document — the memorization-risk /
    boilerplate audit every LLM-data team maintains (a gram that is
    frequent AND spread across sources is template boilerplate to
    stop-list; frequent inside one source is a memorization hazard).
    Operationally this IS the heavy-hitter table that feeds
    salted_skew_join's hot set (SCALE.md round-9: content-hot keys
    must be known because AQE's byte thresholds cannot see them under
    shuffle compression).

    Scale shape: explode to one row per gram position, pre-aggregate
    per (gram, doc, source) — map-side combinable, so a document
    repeating its own boilerplate collapses before the shuffle — then
    one bounded aggregate per gram and a global top-k that Spark
    executes as per-partition TakeOrdered partials (no global sort of
    the gram table). The gram strings themselves shuffle only at the
    per-doc grain; at 100 TB, pre-filtering with a count-min pass or
    running on a document sample are the standard cheapenings, both
    layout-compatible."""
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", "source", _toks(F.col("text")).alias("t"))
    grams_sql = (
        f"CASE WHEN size(t) >= {HOT_NGRAM_K} THEN "
        f"transform(sequence(1, size(t) - {HOT_NGRAM_K - 1}), "
        f"i -> concat_ws(' ', slice(t, i, {HOT_NGRAM_K}))) "
        f"ELSE CAST(array() AS array<string>) END"
    )
    per_doc = (
        toks.select(
            "doc_id", "source", F.explode(F.expr(grams_sql)).alias("gram")
        )
        .groupBy("gram", "doc_id", "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    )
    return (
        per_doc.groupBy("gram")
        .agg(
            F.sum("m").cast("bigint").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.min("doc_id").cast("bigint").alias("example_doc_id"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("gram"))
        .limit(HOT_NGRAM_TOP)
    )


@query(
    "text_bpe_encode",
    oracle=f"""
    WITH words AS MATERIALIZED (
        SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest({_TOKS_SQL}) AS w FROM documents)
        WHERE w <> '' GROUP BY w
    ),
    t0 AS MATERIALIZED (
        SELECT word, cnt, CAST(i AS BIGINT) AS pos, substr(word, i, 1) AS tok
        FROM words, UNNEST(range(1, length(word) + 1)) AS u(i)
    ),
    {_bpe_round_sql('t0', 1)},
    {_bpe_round_sql('m1', 2)},
    {_bpe_round_sql('m2', 3)}
    SELECT tok, length(tok) > 1 AS is_merged,
           CAST(sum(cnt) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT word) AS BIGINT) AS n_words
    FROM m3 GROUP BY tok
    ORDER BY n_occurrences DESC, tok
    """,
    tags=("text", "tokenizer", "bpe", "encode", "engine-addition"),
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLY — the step every training pipeline actually
    runs at 100 TB, closing the lifecycle text_bpe_merge_candidates /
    text_bpe_train_rounds opened (VERDICT r8 #5): encode the corpus
    with a trained merge table by applying each ranked merge, in
    priority order, to exhaustion. One greedy-leftmost relational
    pass per rank IS exhaustion for that rank (_bpe_merge: x!=y
    matches cannot overlap and cannot re-create an (x,y) adjacency —
    the merged token differs from both halves; for x==y the
    even-offset rule consumes whole runs), so 'apply until no merge
    fires' is exactly |merge_table| broadcast-merge passes. Output is
    the ENCODED VOCABULARY usage — token, merged-or-base flag, total
    weighted occurrences, distinct words containing it — the table a
    pipeline ships with its packed sequences (this is the natural
    producer for curation_pack_sequences' token streams).

    The merge table is derived in-query by the same 3-round trainer
    (deterministic, so the query stays oracle-pairable); a production
    run would read the persisted table and skip straight to the
    broadcast applies — each merge rides a 1-row broadcast, the
    corpus-sized work stays in the one word-count shuffle, and every
    apply pass is windows over the word-partitioned exchange.

    Scale shape: identical to text_bpe_train_rounds (encode applies
    the 3rd merge training only selects), plus one bounded-key
    vocabulary aggregate — token domain = base chars + merges."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(_toks(F.col("text"))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    tokens = words.select(
        "word",
        "cnt",
        F.posexplode(
            F.expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))")
        ).alias("pos0", "tok"),
    ).select("word", "cnt", (F.col("pos0") + 1).cast("bigint").alias("pos"), "tok")
    tokens = tokens.transform(materialize)
    for _ in (1, 2, 3):
        best = (
            _bpe_pair_counts(tokens)
            .orderBy(F.desc("pc"), F.asc("x"), F.asc("y"))
            .limit(1)
        ).transform(materialize)
        tokens = _bpe_merge(tokens, best).transform(materialize)
    return (
        tokens.groupBy("tok")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_occurrences"),
            F.countDistinct("word").cast("bigint").alias("n_words"),
        )
        .select(
            "tok",
            (F.length("tok") > 1).alias("is_merged"),
            "n_occurrences",
            "n_words",
        )
        .orderBy(F.desc("n_occurrences"), F.asc("tok"))
    )


CDC_DIVISOR = 32  # boundary when shingle-hash % 32 == 0 => ~32-char chunks


@query(
    "text_cdc_chunks",
    oracle=f"""
    WITH docs AS MATERIALIZED (
        SELECT doc_id, source, t, length(t) AS len FROM (
            SELECT doc_id, source, {_NORM_SQL} AS t FROM documents
        ) WHERE length(t) > 0
    ),
    bpos AS (
        SELECT doc_id, i
        FROM docs, UNNEST(range(2, greatest(len - 6, 2))) AS u(i)
        WHERE CAST(('0x' || substring(md5(substr(t, i, 8)), 1, 8))
                   AS UBIGINT) % {CDC_DIVISOR} = 0
    ),
    starts AS (
        SELECT doc_id, 1 AS start FROM docs
        UNION ALL SELECT doc_id, i FROM bpos
    ),
    spans AS (
        SELECT doc_id, start,
               lead(start) OVER (PARTITION BY doc_id ORDER BY start) AS nxt
        FROM starts
    ),
    chunks AS MATERIALIZED (
        SELECT s.doc_id, d.source,
               md5(substr(d.t, s.start,
                          coalesce(s.nxt, d.len + 1) - s.start)) AS h,
               CAST(coalesce(s.nxt, d.len + 1) - s.start AS BIGINT) AS l
        FROM spans s JOIN docs d ON d.doc_id = s.doc_id
    ),
    per_chunk AS (
        SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(l) AS BIGINT) AS total_chars
        FROM chunks GROUP BY source
    ),
    per_distinct AS (
        SELECT source, CAST(count(*) AS BIGINT) AS distinct_chunks,
               CAST(sum(l) AS BIGINT) AS unique_chars
        FROM (SELECT DISTINCT source, h, l FROM chunks) GROUP BY source
    )
    SELECT c.source, c.n_docs, c.n_chunks, d.distinct_chunks,
           c.total_chars, d.unique_chars,
           CAST((c.total_chars - d.unique_chars) * 1000000
                // c.total_chars AS BIGINT) AS dup_ppm
    FROM per_chunk c JOIN per_distinct d ON c.source = d.source
    ORDER BY c.source
    """,
    tags=("text", "dedup", "chunking", "engine-addition"),
)
def text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the backup/dedup-system primitive,
    and the sub-document dedup unit for training corpora): a chunk
    boundary opens wherever the 8-char shingle hash at that position
    is ≡ 0 mod 32, so boundaries move WITH the content — insert one
    word and only the containing chunk's hash changes, unlike
    fixed-size blocks where everything downstream shifts. Emits the
    per-source chunk-level dedup ledger: chunk counts, distinct
    chunks, and chars saved by chunk dedup (integer ppm).

    Scale shape: the per-char shingle explode is narrow and immediately
    filtered to the ~1/32 boundary positions, so only boundaries
    shuffle; spans come from one lead() window per doc; chunk text
    materializes once per span via substr on the doc row (an equi-join
    on doc_id, never a cross product). Hash gating uses the shared
    md5-hex-prefix idiom so both engines pick identical boundaries."""
    from ..operators.scale import materialize, spread

    d = (
        # spread: the per-char shingle md5 is CPU-bound and the
        # byte-small corpus file otherwise pins it to 2 scan
        # partitions (measured 3.6s -> 1.3s warm at sf0.1)
        spread(load_table(spark, sf_dir, "documents"))
        .select("doc_id", "source", _norm(F.col("text")).alias("t"))
        .withColumn("len", F.length("t"))
        .where(F.col("len") > 0)
        # staged once: read by the boundary explode, the span anchor
        # rows, AND the chunk-substr join (plan audit showed 5
        # same-path scans re-normalizing the corpus each time)
        .transform(materialize)
    )
    bpos = (
        d.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "transform(sequence(2, greatest(length(t) - 7, 1)),"
                    " i -> substr(t, i, 8))"
                )
            ).alias("i0", "sh"),
        )
        .select("doc_id", (F.col("i0") + 2).alias("start"), "sh")
        .where(
            F.conv(F.substring(F.md5("sh"), 1, 8), 16, 10).cast("long")
            % CDC_DIVISOR
            == 0
        )
        .select("doc_id", "start")
    )
    starts = d.select("doc_id", F.lit(1).alias("start")).unionByName(bpos)
    spans = starts.select(
        "doc_id",
        "start",
        F.lead("start")
        .over(Window.partitionBy("doc_id").orderBy("start"))
        .alias("nxt"),
    )
    chunks = (
        spans.join(d, "doc_id")
        .select(
            "doc_id",
            "source",
            F.md5(
                F.expr("substr(t, start, coalesce(nxt, len + 1) - start)")
            ).alias("h"),
            (F.coalesce("nxt", F.col("len") + 1) - F.col("start"))
            .cast("bigint")
            .alias("l"),
        )
        # the ledger reads the chunk table twice (raw + distinct)
        .transform(materialize)
    )
    per_chunk = chunks.groupBy("source").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_chunks"),
        F.sum("l").cast("bigint").alias("total_chars"),
    )
    per_distinct = (
        chunks.select("source", "h", "l")
        .distinct()
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("distinct_chunks"),
            F.sum("l").cast("bigint").alias("unique_chars"),
        )
    )
    return (
        per_chunk.join(per_distinct, "source")
        .select(
            "source",
            "n_docs",
            "n_chunks",
            "distinct_chunks",
            "total_chars",
            "unique_chars",
            F.expr(
                "CAST((total_chars - unique_chars) * 1000000"
                " div total_chars AS BIGINT)"
            ).alias("dup_ppm"),
        )
        .orderBy("source")
    )


@query(
    "text_vocab_growth",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    nonempty AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
    first_seen AS MATERIALIZED (
        SELECT tok, min(doc_id) AS first_doc FROM nonempty GROUP BY tok
    ),
    per_doc AS MATERIALIZED (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks
        FROM nonempty GROUP BY doc_id
    ),
    ranked AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS r,
               CAST(count(*) OVER () AS BIGINT) AS nd
        FROM per_doc
    ),
    thresholds AS (
        SELECT k, doc_id AS thr, r AS n_docs_cum
        FROM ranked JOIN (SELECT unnest(range(1, 11)) AS k) ks
          ON r = greatest(1, k * nd // 10)
    ),
    vocab AS (
        SELECT t.k, CAST(count(*) AS BIGINT) AS vocab_size
        FROM thresholds t JOIN first_seen f ON f.first_doc <= t.thr
        GROUP BY t.k
    ),
    corpus AS (
        SELECT t.k, CAST(sum(p.n_toks) AS BIGINT) AS corpus_tokens
        FROM thresholds t JOIN per_doc p ON p.doc_id <= t.thr
        GROUP BY t.k
    )
    SELECT CAST(t.k AS BIGINT) AS checkpoint, t.n_docs_cum,
           c.corpus_tokens, v.vocab_size,
           CAST(v.vocab_size * 1000000 // c.corpus_tokens AS BIGINT)
               AS type_token_ppm
    FROM thresholds t JOIN vocab v ON v.k = t.k
    JOIN corpus c ON c.k = t.k
    ORDER BY checkpoint
    """,
    tags=("text", "vocabulary", "heaps", "engine-addition"),
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: distinct-token vocabulary size
    and corpus token count at ten equal document-count checkpoints —
    the curve that sizes a tokenizer's vocab and predicts how many
    new types another 10 TB of corpus will add. The classic
    formulation (re-count distinct per prefix) is quadratic; this
    one is a single pass: a token's contribution to EVERY checkpoint
    is determined by its FIRST occurrence (min doc_id), so vocab at
    checkpoint t is just |{{tok : first_doc <= thr_t}}|.

    Scale shape: one explode + min-aggregate shuffle on token (the
    vocabulary table), one per-doc count, then every checkpoint op
    is a 10-row broadcast theta join against model-sized tables.
    Type-token ratios in integer ppm; checkpoint thresholds are
    exact rank selections, so both engines pick identical docs.
    Document ranks come from the pipeline_global_rank recipe —
    bucketed prefix counts plus within-bucket row_number — so no
    window ever sees more than one doc_id bucket (the oracle's
    single ORDER BY row_number is the same total order)."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(_toks(F.col("text"))).alias("tok"))
        .where(F.col("tok") != "")
    )
    first_seen = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    per_doc = toks.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_toks")
    )
    # distributed exact rank: bucket by doc_id range, cumulate bucket
    # counts (model-sized window), add within-bucket row_number
    bucketed = per_doc.withColumn("bkt", F.expr("doc_id div 1024"))
    bcnt = bucketed.groupBy("bkt").agg(F.count("*").cast("bigint").alias("c"))
    boff = bcnt.select(
        "bkt",
        F.coalesce(
            F.sum("c").over(
                Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("off"),
        F.sum("c").over(Window.partitionBy()).cast("bigint").alias("nd"),
    )
    ranked = bucketed.join(F.broadcast(boff), "bkt").select(
        "doc_id",
        (
            F.col("off")
            + F.row_number().over(Window.partitionBy("bkt").orderBy("doc_id"))
        )
        .cast("bigint")
        .alias("r"),
        "nd",
    )
    ks = spark.range(1, 11).select(F.col("id").alias("k"))
    thresholds = (
        ranked.crossJoin(F.broadcast(ks))
        .where(
            F.col("r")
            == F.greatest(F.lit(1), F.expr("k * nd div 10").cast("bigint"))
        )
        .select("k", F.col("doc_id").alias("thr"), F.col("r").alias("n_docs_cum"))
        .transform(materialize)
    )
    vocab = (
        first_seen.crossJoin(F.broadcast(thresholds))
        .where(F.col("first_doc") <= F.col("thr"))
        .groupBy("k")
        .agg(F.count("*").cast("bigint").alias("vocab_size"))
    )
    corpus = (
        per_doc.crossJoin(F.broadcast(thresholds))
        .where(F.col("doc_id") <= F.col("thr"))
        .groupBy("k")
        .agg(F.sum("n_toks").cast("bigint").alias("corpus_tokens"))
    )
    return (
        thresholds.join(vocab, "k")
        .join(corpus, "k")
        .select(
            F.col("k").cast("bigint").alias("checkpoint"),
            "n_docs_cum",
            "corpus_tokens",
            "vocab_size",
            F.expr(
                "CAST(vocab_size * 1000000 div corpus_tokens AS BIGINT)"
            ).alias("type_token_ppm"),
        )
        .orderBy("checkpoint")
    )


@query(
    "text_bpe_apply_compression",
    oracle=f"""
    WITH words AS MATERIALIZED (
        SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest({_TOKS_SQL}) AS w FROM documents)
        WHERE w <> '' GROUP BY w
    ),
    t0 AS MATERIALIZED (
        SELECT word, cnt, CAST(i AS BIGINT) AS pos, substr(word, i, 1) AS tok
        FROM words, UNNEST(range(1, length(word) + 1)) AS u(i)
    ),
    {_bpe_round_sql('t0', 1)},
    {_bpe_round_sql('m1', 2)},
    {_bpe_round_sql('m2', 3)},
    counts AS (
        SELECT CAST(0 AS BIGINT) AS merge_round,
               CAST(coalesce(sum(cnt), 0) AS BIGINT) AS corpus_tokens
        FROM t0
        UNION ALL SELECT 1, CAST(coalesce(sum(cnt), 0) AS BIGINT) FROM m1
        UNION ALL SELECT 2, CAST(coalesce(sum(cnt), 0) AS BIGINT) FROM m2
        UNION ALL SELECT 3, CAST(coalesce(sum(cnt), 0) AS BIGINT) FROM m3
    ),
    base AS (SELECT corpus_tokens AS t0_tokens FROM counts
             WHERE merge_round = 0)
    SELECT merge_round, corpus_tokens,
           CASE WHEN base.t0_tokens > 0
                THEN CAST((base.t0_tokens - corpus_tokens) * 1000000
                          // base.t0_tokens AS BIGINT)
                ELSE 0 END AS compression_ppm
    FROM counts CROSS JOIN base ORDER BY merge_round
    """,
    tags=("text", "tokenizer", "bpe", "engine-addition"),
)
def text_bpe_apply_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY side of BPE training: re-tokenize the corpus under
    each of the three learned merges and report corpus token counts
    and the cumulative compression (ppm saved vs character
    tokenization) — the number that decides whether another merge
    round is worth a vocab slot. Corpus-weighted counting is free on
    the word-frequency representation: tokens after round r =
    sum(cnt) over the merged token table, so the whole curve costs
    one aggregate per round on vocabulary-sized data.

    Shares the exact relational merge machinery (and its greedy-
    leftmost run-parity semantics) with text_bpe_train_rounds; the
    invariant suite checks the counts against the imperative trainer
    applied per word."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(_toks(F.col("text"))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    tokens = words.select(
        "word",
        "cnt",
        F.posexplode(
            F.expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))")
        ).alias("pos0", "tok"),
    ).select("word", "cnt", (F.col("pos0") + 1).cast("bigint").alias("pos"), "tok")
    tokens = tokens.transform(materialize)
    counts = [
        tokens.agg(
            F.lit(0).cast("bigint").alias("merge_round"),
            F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias(
                "corpus_tokens"
            ),
        )
    ]
    for r in (1, 2, 3):
        best = (
            _bpe_pair_counts(tokens)
            .orderBy(F.desc("pc"), F.asc("x"), F.asc("y"))
            .limit(1)
        ).transform(materialize)
        tokens = _bpe_merge(tokens, best).transform(materialize)
        counts.append(
            tokens.agg(
                F.lit(r).cast("bigint").alias("merge_round"),
                F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias(
                    "corpus_tokens"
                ),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    base = out.where(F.col("merge_round") == 0).select(
        F.col("corpus_tokens").alias("t0_tokens")
    )
    return (
        out.crossJoin(F.broadcast(base))
        .select(
            "merge_round",
            "corpus_tokens",
            F.expr(
                "CASE WHEN t0_tokens > 0 THEN"
                " CAST((t0_tokens - corpus_tokens) * 1000000"
                " div t0_tokens AS BIGINT) ELSE CAST(0 AS BIGINT) END"
            ).alias("compression_ppm"),
        )
        .orderBy("merge_round")
    )


_RAKE_CLEAN_SQL = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"


@query(
    "text_rake_keywords",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id,
               generate_subscripts(toks, 1) AS pos,
               unnest(toks) AS w
        FROM (SELECT doc_id, string_split({_RAKE_CLEAN_SQL}, ' ') AS toks
              FROM documents)
    ),
    cand AS (
        SELECT doc_id, pos, w,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS g
        FROM tok WHERE w NOT IN {STOPWORDS!r}
    ),
    pw AS (
        SELECT doc_id, g, pos, w,
               count(*) OVER (PARTITION BY doc_id, g) AS plen
        FROM cand
    ),
    ws AS (
        SELECT w, CAST(count(*) AS BIGINT) AS freq,
               CAST(sum(plen) AS BIGINT) AS deg
        FROM pw GROUP BY 1
    ),
    scored AS (
        SELECT pw.doc_id, pw.g,
               string_agg(pw.w, ' ' ORDER BY pw.pos) AS phrase,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(ws.deg * 1000000 // ws.freq) AS BIGINT) AS score_ppm
        FROM pw JOIN ws ON ws.w = pw.w
        GROUP BY 1, 2
    )
    SELECT phrase, CAST(max(n_words) AS BIGINT) AS n_words,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(max(score_ppm) AS BIGINT) AS score_ppm
    FROM scored
    GROUP BY phrase
    ORDER BY score_ppm DESC, phrase
    LIMIT 20
    """,
    tags=("text", "keywords", "rake", "gaps-islands", "engine-addition"),
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) — the unsupervised
    keyphrase baseline: candidate phrases are maximal stopword-free
    token runs (gaps-and-islands on token positions: pos minus the
    non-stop row_number is constant within a run), each word scores
    degree/frequency over the whole corpus (degree = summed length
    of phrases containing it), and a phrase scores the sum of its
    words' scores. Scores stay exact integers: per-word
    deg*1e6 // freq, summed — no float ranking. Top-20 distinct
    phrases with occurrence counts.

    Scale shape: tokenize + islands are one window per doc partition;
    word stats are a map-side-combinable shuffle on the word; the
    phrase rebuild groups on (doc, run) — co-partitioned with the
    islands window; the final top-20 is TakeOrderedAndProject."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")),
        " ",
    )
    tok = d.select(
        "doc_id", F.posexplode(toks).alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    cand = tok.where(~F.col("w").isin(*STOPWORDS)).select(
        "doc_id",
        "pos",
        "w",
        (
            F.col("pos")
            - F.row_number().over(
                Window.partitionBy("doc_id").orderBy("pos")
            )
        ).alias("g"),
    )
    pw = cand.select(
        "doc_id", "g", "pos", "w",
        F.count(F.lit(1)).over(Window.partitionBy("doc_id", "g")).alias("plen"),
    )
    ws = pw.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("plen").cast("bigint").alias("deg"),
    )
    scored = (
        pw.join(ws, "w")
        .groupBy("doc_id", "g")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
            ).alias("phrase"),
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.expr("deg * 1000000 div freq")).cast("bigint").alias(
                "score_ppm"
            ),
        )
    )
    return (
        scored.groupBy("phrase")
        .agg(
            F.max("n_words").cast("bigint").alias("n_words"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.max("score_ppm").cast("bigint").alias("score_ppm"),
        )
        .orderBy(F.desc("score_ppm"), "phrase")
        .limit(20)
    )


# BM25 constants: k1 = 6/5, b = 3/4 (the classic 1.2 / 0.75), scaled
# out so each term's score is one exact integer division:
#   score = idf_e3 * 44 * tf * SUMDL  DIV  (20*tf*SUMDL + 6*SUMDL + 18*dl*N)
# (derived by multiplying BM25's numerator and denominator by
# 20*SUMDL; idf is the octave+mantissa quantized ln from
# functions.intlog, so NO float log enters the ranking).
_BM25_QUERY = ("spark", "join", "window")


def _bm25_oracle() -> str:
    from ..functions.intlog import ln_ratio_e3_sql

    idf = ln_ratio_e3_sql("st.n_docs", "df.df").replace("DIV", "//")
    terms = ", ".join(f"'{t}'" for t in _BM25_QUERY)
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS w FROM documents
    ),
    dl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1
    ),
    st AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(dl) AS BIGINT) AS sumdl
        FROM dl
    ),
    tf AS (
        SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
        FROM toks WHERE w IN ({terms}) GROUP BY 1, 2
    ),
    df AS (
        SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ),
    scored AS (
        SELECT tf.doc_id,
               CAST({idf} AS BIGINT) * 44 * tf.tf * st.sumdl
               // (20 * tf.tf * st.sumdl + 6 * st.sumdl
                   + 18 * dl.dl * st.n_docs) AS term_score_e3
        FROM tf
        JOIN df ON df.w = tf.w
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN st
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_terms_matched,
           CAST(sum(term_score_e3) AS BIGINT) AS bm25_e3
    FROM scored
    GROUP BY 1
    ORDER BY bm25_e3 DESC, doc_id
    LIMIT 20
    """


@query(
    "text_bm25_topk",
    oracle=_bm25_oracle(),
    tags=("text", "retrieval", "bm25", "engine-addition"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval (k1=1.2, b=0.75) for a pinned 3-term query —
    the lexical-search baseline text_tfidf_top_terms stops short of,
    made EXACT: the idf ln((N/df)) is the octave+4-bit-mantissa
    quantized integer log (functions.intlog, floors within ln(17/16) ~ 0.061 nats,
    bit-identical across engines — an IEEE ln is not), and the tf
    saturation term is one integer division after clearing BM25's
    rational constants (x20*sumdl). Top-20 docs with per-doc matched
    term counts.

    Scale shape: tokenize feeds two map-side-combined aggregates
    (doc lengths, per-term tf); df and the 2-row stats are broadcast
    back; the ranking is TakeOrderedAndProject. At 100 TB this is
    the standard inverted-score pipeline with no global state beyond
    three scalars."""
    from ..functions.intlog import ln_ratio_e3_sql

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(_toks(F.col("text"))).alias("w")
    ).transform(materialize)  # read twice: dl + tf
    # dl staged too (r10): it feeds the corpus stats AND the scoring
    # join — unstaged, the doc-length aggregate ran twice
    dl = materialize(
        toks.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("dl")
        )
    )
    st = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sumdl"),
    )
    # tf staged (r10): it feeds the df rollup AND the scoring join
    tf = materialize(
        toks.where(F.col("w").isin(*_BM25_QUERY))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df = tf.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    idf = ln_ratio_e3_sql("n_docs", "df").replace("DIV", "div")
    scored = (
        tf.join(F.broadcast(df), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(st))
        .selectExpr(
            "doc_id",
            f"CAST({idf} AS BIGINT) * 44 * tf * sumdl"
            " div (20 * tf * sumdl + 6 * sumdl + 18 * dl * n_docs)"
            " AS term_score_e3",
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms_matched"),
            F.sum("term_score_e3").cast("bigint").alias("bm25_e3"),
        )
        .orderBy(F.desc("bm25_e3"), "doc_id")
        .limit(20)
    )


def _surprisal_oracle() -> str:
    from ..functions.intlog import ln_ratio_e3_sql

    s = ln_ratio_e3_sql("st.total_tokens", "cf.cf").replace("DIV", "//")
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS w FROM documents
    ),
    cf AS (
        SELECT w, CAST(count(*) AS BIGINT) AS cf FROM toks GROUP BY 1
    ),
    st AS (
        SELECT CAST(sum(cf) AS BIGINT) AS total_tokens FROM cf
    ),
    per_tok AS (
        SELECT t.doc_id, CAST({s} AS BIGINT) AS s_e3
        FROM toks t JOIN cf ON cf.w = t.w CROSS JOIN st
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(s_e3) AS BIGINT) AS total_surprisal_e3,
           CAST(sum(s_e3) // count(*) AS BIGINT) AS mean_surprisal_e3
    FROM per_tok
    GROUP BY 1
    ORDER BY mean_surprisal_e3 DESC, doc_id
    LIMIT 50
    """


@query(
    "curation_unigram_surprisal",
    oracle=_surprisal_oracle(),
    tags=("curation", "quality", "surprisal", "engine-addition"),
)
def curation_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram cross-entropy (surprisal) scoring — the perplexity
    proxy curation pipelines use to rank documents by informativeness
    without an LM: each token costs ln(total/cf) nats under the
    corpus's own unigram model, computed with the quantized integer
    log (functions.intlog) so the score is exact and engine-stable.
    High mean surprisal = rare-token-dense docs (candidates for
    upsampling or garbage review); the 50 most surprising surface.

    Scale shape: tokenize, one count shuffle to the vocab, broadcast
    the counts back (vocab is sub-1e6 rows even at 100 TB for
    whitespace tokens), one per-doc aggregate."""
    from ..functions.intlog import ln_ratio_e3_sql

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(_toks(F.col("text"))).alias("w")
    ).transform(materialize)  # read twice: cf + scoring
    # cf staged too (r10): it feeds the total-token scalar AND the
    # scoring broadcast — unstaged, the vocab count ran twice
    cf = materialize(
        toks.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("cf"))
    )
    st = cf.agg(F.sum("cf").cast("bigint").alias("total_tokens"))
    s = ln_ratio_e3_sql("total_tokens", "cf").replace("DIV", "div")
    per_tok = (
        toks.join(F.broadcast(cf), "w")
        .crossJoin(F.broadcast(st))
        .selectExpr("doc_id", f"CAST({s} AS BIGINT) AS s_e3")
    )
    return (
        per_tok.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("s_e3").cast("bigint").alias("total_surprisal_e3"),
            F.expr("CAST(sum(s_e3) div count(*) AS BIGINT)").alias(
                "mean_surprisal_e3"
            ),
        )
        .orderBy(F.desc("mean_surprisal_e3"), "doc_id")
        .limit(50)
    )


def _kl_oracle() -> str:
    from ..functions.intlog import ln_ratio_e3_sql

    pos = ln_ratio_e3_sql("sw.c * t.n_total", "sw.n_s * cw.c_all").replace(
        "DIV", "//"
    )
    neg = ln_ratio_e3_sql("sw.n_s * cw.c_all", "sw.c * t.n_total").replace(
        "DIV", "//"
    )
    return f"""
    WITH toks AS (
        SELECT source, unnest({_TOKS_SQL}) AS w FROM documents
    ),
    sw AS (
        SELECT source, w, CAST(count(*) AS BIGINT) AS c,
               CAST(sum(count(*)) OVER (PARTITION BY source) AS BIGINT)
                   AS n_s
        FROM toks GROUP BY 1, 2
    ),
    cw AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c_all FROM toks GROUP BY 1
    ),
    t AS (
        SELECT CAST(count(*) AS BIGINT) AS n_total FROM toks
    ),
    terms AS (
        SELECT sw.source, sw.n_s,
               sw.c * (CASE WHEN sw.c * t.n_total >= sw.n_s * cw.c_all
                            THEN {pos} ELSE -({neg}) END) AS term_e3
        FROM sw JOIN cw ON cw.w = sw.w CROSS JOIN t
    )
    SELECT source,
           CAST(max(n_s) AS BIGINT) AS n_tokens,
           CAST(sum(term_e3) // max(n_s) AS BIGINT) AS kl_vs_corpus_e3
    FROM terms
    GROUP BY 1
    ORDER BY kl_vs_corpus_e3 DESC, source
    """


@query(
    "text_kl_by_source",
    oracle=_kl_oracle(),
    tags=("text", "kl-divergence", "drift", "curation", "engine-addition"),
)
def text_kl_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of each source's unigram distribution from the
    whole-corpus distribution — the domain-shift scalar a mixture
    curator reads before setting sampling weights (complements
    curation_domain_mixture's counts with an information-theoretic
    distance): sum over the source's observed vocabulary of
    p_s(w) * ln(p_s(w)/q(w)), every ratio exact integers through the
    quantized log, sign by cross-product comparison. KL >= 0 up to
    quantization; the most divergent source leads.

    Scale shape: tokenize, one (source, word) shuffle with map-side
    combine, a broadcast corpus-vocab join, per-source rollup."""
    from ..functions.intlog import ln_ratio_e3_sql

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(_toks(F.col("text"))).alias("w")
    ).transform(materialize)  # read 3x: sw, cw, total
    sw = toks.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ws = Window.partitionBy("source")
    sw = sw.withColumn("n_s", F.sum("c").over(ws).cast("bigint"))
    cw = toks.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("c_all"))
    t = toks.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    pos = ln_ratio_e3_sql("c * n_total", "n_s * c_all").replace("DIV", "div")
    neg = ln_ratio_e3_sql("n_s * c_all", "c * n_total").replace("DIV", "div")
    terms = (
        sw.join(F.broadcast(cw), "w")
        .crossJoin(F.broadcast(t))
        .selectExpr(
            "source", "n_s",
            f"c * (CASE WHEN c * n_total >= n_s * c_all THEN {pos}"
            f" ELSE -({neg}) END) AS term_e3",
        )
    )
    return (
        terms.groupBy("source")
        .agg(
            F.max("n_s").cast("bigint").alias("n_tokens"),
            F.expr("CAST(sum(term_e3) div max(n_s) AS BIGINT)").alias(
                "kl_vs_corpus_e3"
            ),
        )
        .orderBy(F.desc("kl_vs_corpus_e3"), "source")
    )


def _bigram_lm_oracle() -> str:
    from ..functions.intlog import ln_ratio_e3_sql

    s = ln_ratio_e3_sql("cn1 + v", "cn2 + 1").replace("DIV", "//")
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    bgs AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                   i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS b
        FROM t
    ),
    bgf AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bgs),
    train AS (SELECT * FROM bgf WHERE doc_id % 2 = 0),
    c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM train GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM train GROUP BY 1),
    vt AS (SELECT CAST(count(*) AS BIGINT) AS v FROM c1),
    held AS (SELECT * FROM bgf WHERE doc_id % 2 = 1),
    j AS (
        SELECT h.doc_id,
               coalesce(c1.c1, CAST(0 AS BIGINT)) AS cn1,
               coalesce(c2.c2, CAST(0 AS BIGINT)) AS cn2,
               vt.v AS v
        FROM held h
        LEFT JOIN c2 ON c2.w1 = h.w1 AND c2.w2 = h.w2
        LEFT JOIN c1 ON c1.w1 = h.w1
        CROSS JOIN vt
    ),
    scored AS (SELECT doc_id, CAST({s} AS BIGINT) AS s_e3 FROM j)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(s_e3) AS BIGINT) AS total_surprisal_e3,
           CAST(sum(s_e3) // count(*) AS BIGINT) AS mean_surprisal_e3
    FROM scored
    GROUP BY 1
    ORDER BY mean_surprisal_e3 DESC, doc_id
    LIMIT 50
    """


@query(
    "curation_bigram_lm_heldout",
    oracle=_bigram_lm_oracle(),
    tags=("curation", "quality", "lm", "perplexity", "engine-addition"),
)
def curation_bigram_lm_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out bigram language-model scoring — the KenLM-style
    perplexity filter curation pipelines run before training: an
    add-one-smoothed bigram LM is TRAINED on half the corpus (even
    doc_ids) and SCORES the other half, so a document's score reflects
    generalization, not memorization (the failure of same-corpus
    unigram surprisal, which this complements). Per held-out bigram,
    surprisal = -ln p = ln((c1(w1) + V) / (c2(w1,w2) + 1)) in exact
    quantized milli-nats (functions/intlog — no float log, so the
    differential stays bit-exact); per-doc mean ranks documents,
    highest-surprisal (most out-of-distribution) first.

    Scale shape: bigram extraction is a zip_with in-row map (zero
    shuffle); the train-side count tables aggregate with map-side
    combine; scoring is two hash joins on (w1,w2)/(w1) count tables —
    Zipf-skewed keys are fine because counts are PRE-aggregated (one
    row per bigram type, never a fan-out) — plus a 1-row vocab-size
    broadcast. At 100 TB the count tables are written parquet (the
    trained model artifact) and the same two joins score any future
    corpus increment."""
    from ..functions.intlog import ln_ratio_e3_sql
    from ..operators.scale import spread

    d = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    tk = F.col("toks")
    bg = (
        d.select("doc_id", _toks(F.col("text")).alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(tk, 1, F.size(tk) - 1),
                    F.slice(tk, 2, F.size(tk) - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
        # read 3x (train counts, held-out scoring) — stage it once
        .transform(materialize)
    )
    train = bg.where(F.col("doc_id") % 2 == 0)
    # both count tables staged (r10): c2 feeds the c1 rollup AND the
    # scoring join, c1 feeds the vocab scalar AND the scoring join —
    # unstaged, each aggregate pipeline ran twice (these ARE the
    # trained-model artifacts a 100 TB pipeline persists anyway)
    c2 = materialize(
        train.groupBy("w1", "w2").agg(
            F.count(F.lit(1)).cast("bigint").alias("c2")
        )
    )
    # c1(w1) = sum over w2 of c2(w1, w2): roll up the ALREADY-counted
    # bigram table instead of re-aggregating the raw token stream
    c1 = materialize(
        c2.groupBy("w1").agg(F.sum("c2").cast("bigint").alias("c1"))
    )
    vt = c1.agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    held = bg.where(F.col("doc_id") % 2 == 1)
    s = ln_ratio_e3_sql("cn1 + v", "cn2 + 1").replace("DIV", "div")
    scored = (
        held.join(c2, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vt))
        .selectExpr(
            "doc_id",
            "coalesce(c1, CAST(0 AS BIGINT)) AS cn1",
            "coalesce(c2, CAST(0 AS BIGINT)) AS cn2",
            "v",
        )
        .selectExpr("doc_id", f"CAST({s} AS BIGINT) AS s_e3")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("s_e3").cast("bigint").alias("total_surprisal_e3"),
        )
        .selectExpr(
            "doc_id",
            "n_bigrams",
            "total_surprisal_e3",
            "total_surprisal_e3 div n_bigrams AS mean_surprisal_e3",
        )
        .orderBy(F.desc("mean_surprisal_e3"), "doc_id")
        .limit(50)
    )


def _entropy_oracle() -> str:
    from ..functions.intlog import ln_ratio_e3_sql

    lnr = ln_ratio_e3_sql("t.n_chars", "t.n_c").replace("DIV", "//")
    return f"""
    WITH norm AS (
        SELECT doc_id, {_NORM_SQL} AS s FROM documents
    ),
    chars AS (
        SELECT doc_id, substring(s, CAST(i AS INTEGER), 1) AS ch
        FROM norm, unnest(range(1, length(s) + 1)) AS r(i)
    ),
    counts AS (
        SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS n_c
        FROM chars GROUP BY 1, 2
    ),
    t AS (
        SELECT doc_id, ch, n_c,
               CAST(sum(n_c) OVER (PARTITION BY doc_id) AS BIGINT) AS n_chars
        FROM counts
    )
    SELECT doc_id,
           CAST(max(n_chars) AS BIGINT) AS n_chars,
           CAST(count(*) AS BIGINT) AS n_distinct_chars,
           CAST(sum(n_c * {lnr}) // max(n_chars) AS BIGINT) AS entropy_e3,
           CAST(sum(n_c * {lnr}) // max(n_chars) >= 2700 AS BOOLEAN)
               AS passes_gate
    FROM t
    GROUP BY doc_id
    ORDER BY doc_id
    """


@query(
    "text_entropy_gate",
    oracle=_entropy_oracle(),
    tags=("text", "quality", "entropy", "engine-addition"),
)
def text_entropy_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy quality gate — the cheapest
    gibberish/binary/boilerplate detector a corpus pipeline runs
    (minified JS, base64 blobs and repeated-char padding all sit far
    from natural text's ~2.5-3.2 nats/char). H = sum_c p_c ln(1/p_c)
    computed entirely in integers: per-(doc, char) counts, the
    quantized milli-nat log (functions.intlog — one-sided, pinned
    mantissa table, bit-identical across engines), and an integer
    division by doc length. Docs below 2.7 nats/char fail the gate
    (the corpus spans 2.5-2.9, so both outcomes are live at every sf).

    Scale shape: the char explode is scan-parallel and collapses
    immediately into a (doc_id, ch) map-side-combinable count —
    alphabet size bounds the per-doc state (< 100 rows/doc), so the
    shuffle carries counts, never characters. One window for the
    per-doc total, one aggregate; no joins."""
    d = load_table(spark, sf_dir, "documents")
    from ..functions.intlog import ln_ratio_e3_sql

    norm = d.select("doc_id", _norm(F.col("text")).alias("s"))
    chars = norm.select(
        "doc_id",
        "s",
        F.expr("explode(sequence(1, char_length(s)))").alias("i"),
    ).select("doc_id", F.expr("substring(s, i, 1)").alias("ch"))
    counts = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_c")
    )
    t = counts.withColumn(
        "n_chars",
        F.sum("n_c").over(Window.partitionBy("doc_id")).cast("bigint"),
    )
    lnr = ln_ratio_e3_sql("n_chars", "n_c").replace("DIV", "div")
    return (
        t.groupBy("doc_id")
        .agg(
            F.max("n_chars").cast("bigint").alias("n_chars"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_chars"),
            F.expr(f"CAST(sum(n_c * {lnr}) div max(n_chars) AS BIGINT)").alias(
                "entropy_e3"
            ),
        )
        .select(
            "doc_id",
            "n_chars",
            "n_distinct_chars",
            "entropy_e3",
            (F.col("entropy_e3") >= 2700).alias("passes_gate"),
        )
        .orderBy("doc_id")
    )
