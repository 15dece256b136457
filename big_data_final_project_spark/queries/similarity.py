"""Similarity search over ``embeddings`` (north-star extension;
SURVEY.md §2.6 / §7 M5): brute-force cosine top-k baseline, sign-bit
LSH bucketing, and IVF coarse quantization — the three rungs of the
ANN ladder.

Scale posture (100 TB of vectors):
 * brute force is the *baseline*: the query set is tiny and
   broadcast, so the big side never shuffles — one scan, one local
   top-k per partition, then a k-row merge on the driver side of the
   exchange (TakeOrdered);
 * LSH prunes the scan: vectors shuffle once by bucket id, queries
   probe only their own bucket;
 * IVF prunes by data-adaptive cells: centroids are a 10-row
   broadcast table, assignment is a narrow map, probing visits
   nprobe cells.

Determinism: all dots/norms are explicit sequential folds (see
dedup.py); centroid means route through decimal sums
(functions/numeric.py rationale) so they don't depend on partition
order; every ranking breaks float ties on vec_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..data import load_table
from ..operators.scale import spread
from ..registry import query
from .dedup import (
    _L2_SQL,
    _QDOT_SQL,
    _QL2_SQL,
    _QVEC_SQL,
    _VEC_SQL,
    _l2,
    _vec_dbl,
    quantize_fxp,
)

N_QUERIES = 5  # vec_id < 5 are the query vectors
TOP_K = 10

_COS_SQL = """
    list_reduce(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]),
                (acc, x) -> acc + x) / ({na} * {nb})
"""


def _cosine(va: Column, vb: Column, na: Column, nb: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return dot / (na * nb)


def _topk_partition_scorer(qids, qmat_q, qnorms, k):
    """Per-partition numpy scorer: corpus batch in, that batch's
    per-query top-k out. The query matrix is pre-quantized fixed-point
    (see dedup.FXP_SCALE), so the matmul is exact integer arithmetic —
    bit-identical to the DuckDB integer oracle, in any batch order."""
    import numpy as np

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            labels = pdf["label"].to_numpy()[order]
            q = quantize_fxp(np.stack(pdf["embedding"].to_numpy())[order])
            nrm = np.sqrt((q * q).sum(axis=1))  # exact integer sums
            sims = (qmat_q @ q.T) / (qnorms[:, None] * nrm[None, :])
            for qi, qid in enumerate(qids):
                row = sims[qi]
                cand = np.flatnonzero(ids != qid)
                # total order (-cosine, neighbor_id): exact doubles, so
                # local top-k merges into the correct global top-k
                sel = cand[np.lexsort((ids[cand], -row[cand]))[:k]]
                yield pd.DataFrame(
                    {
                        "query_id": qid,
                        "neighbor_id": ids[sel],
                        "neighbor_label": labels[sel],
                        "cosine": row[sel],
                    }
                )

    return score


@query(
    "sim_bruteforce_topk",
    oracle=f"""
    WITH q0 AS (SELECT vec_id, label, {_QVEC_SQL} AS qv FROM embeddings),
    n AS (SELECT vec_id, label, qv, {_QL2_SQL} AS nrm FROM q0),
    q AS (SELECT * FROM n WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               n.label AS neighbor_label,
               {_QDOT_SQL.format(a="q.qv", b="n.qv", na="q.nrm", nb="n.nrm")} AS cosine
        FROM q JOIN n ON q.vec_id <> n.vec_id
    )
    SELECT query_id, neighbor_id, neighbor_label, cosine,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM scored
    ) r WHERE rnk <= {TOP_K}
    """,
    tags=("similarity", "bruteforce", "pandas", "bench"),
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline, 100 TB shape: the tiny query block is
    collected and broadcast as a pre-quantized numpy matrix; each
    corpus partition computes one (queries x batch) matmul and emits
    its local top-k; a final per-query top-k merges partitions — only
    nq*k rows per partition ever shuffle. Fixed-point quantization
    (dedup.FXP_SCALE) makes every dot product exact integer math, so
    this SIMD path is ALSO the oracle path (round 1 needed a ~200s
    interpreted-fold twin to carry the oracle; retired)."""
    import numpy as np

    e = spread(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    )
    qrows = e.where(F.col("vec_id") < N_QUERIES).collect()
    qids = [r["vec_id"] for r in qrows]
    qmat_q = quantize_fxp(np.stack([np.asarray(r["embedding"]) for r in qrows]))
    qnorms = np.sqrt((qmat_q * qmat_q).sum(axis=1))

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("neighbor_label", T.IntegerType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    local = e.mapInPandas(
        _topk_partition_scorer(qids, qmat_q, qnorms, TOP_K), schema=out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        local.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= TOP_K)
    )


LSH_DIMS = (1, 9, 17, 25, 33, 41, 49, 57)  # axis-aligned hyperplanes


def _bucket_expr_sql(v: str) -> str:
    return " + ".join(
        f"CASE WHEN {v}[{d}] >= 0 THEN {1 << i} ELSE 0 END"
        for i, d in enumerate(LSH_DIMS)
    )


def _bucket_expr(v: Column) -> Column:
    out = None
    for i, d in enumerate(LSH_DIMS):
        term = F.when(F.element_at(v, d) >= 0, F.lit(1 << i)).otherwise(0)
        out = term if out is None else out + term
    return out.cast("long")


@query(
    "sim_lsh_bucketed_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, {_VEC_SQL} AS v FROM embeddings),
    n AS (SELECT vec_id, label, v, {_L2_SQL} AS nrm,
                 CAST({_bucket_expr_sql("v")} AS BIGINT) AS bucket
          FROM e),
    q AS (SELECT * FROM n WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, n.bucket AS bucket,
               {_COS_SQL.format(a="q.v", b="n.v", na="q.nrm", nb="n.nrm")} AS cosine
        FROM q JOIN n ON q.bucket = n.bucket AND q.vec_id <> n.vec_id
    )
    SELECT query_id, neighbor_id, bucket, cosine, CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM scored
    ) r WHERE rnk <= {TOP_K}
    """,
    tags=("similarity", "lsh"),
)
def sim_lsh_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN via sign-bit LSH: an 8-bit bucket from the sign
    of 8 fixed dimensions (axis-aligned random-hyperplane LSH — the
    hyperplane set is a deterministic constant here, a seeded random
    matrix in production). Search touches only the query's bucket:
    the corpus shuffles once on bucket id and each probe is a
    bucket-local scan, ~1/256 of brute force."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _vec_dbl("embedding").alias("v")
    )
    n = e.select(
        "vec_id",
        "v",
        _l2(F.col("v")).alias("nrm"),
        _bucket_expr(F.col("v")).alias("bucket"),
    )
    q = n.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        n.join(
            F.broadcast(q),
            (F.col("qbucket") == F.col("bucket"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "bucket",
            _cosine(F.col("qv"), F.col("v"), F.col("qnrm"), F.col("nrm")).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= TOP_K)
    )


DEC_V = "decimal(27,12)"  # exact-sum type for centroid means
N_PROBE = 2


@query(
    "sim_ivf_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, {_VEC_SQL} AS v FROM embeddings),
    -- centroid = per-label mean, decimal-routed so the sum is exact
    -- and order-independent (same construction as the Spark side)
    expl AS (
        SELECT label, unnest(range(1, len(v) + 1)) AS pos,
               unnest(v) AS val
        FROM e
    ),
    cent_dim AS (
        SELECT label, pos,
               CAST(SUM(CAST(val AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS c
        FROM expl GROUP BY label, pos
    ),
    cent AS (
        SELECT label AS cell, list(c ORDER BY pos) AS cv,
               sqrt(list_reduce(list_transform(list(c ORDER BY pos), x -> x * x),
                                (a, x) -> a + x) + 0.0) AS cnrm
        FROM cent_dim GROUP BY label
    ),
    n AS (SELECT vec_id, label, v, {_L2_SQL} AS nrm FROM e),
    -- assign every vector to its nearest centroid by cosine
    assign AS (
        SELECT vec_id, cell FROM (
            SELECT n.vec_id, cent.cell,
                   row_number() OVER (
                       PARTITION BY n.vec_id
                       ORDER BY {_COS_SQL.format(a="n.v", b="cent.cv", na="n.nrm", nb="cent.cnrm")} DESC,
                                cent.cell) AS rn
            FROM n CROSS JOIN cent
        ) x WHERE rn = 1
    ),
    q AS (SELECT * FROM n WHERE vec_id < {N_QUERIES}),
    -- each query probes its nprobe nearest cells
    probes AS (
        SELECT query_id, cell FROM (
            SELECT q.vec_id AS query_id, cent.cell,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_COS_SQL.format(a="q.v", b="cent.cv", na="q.nrm", nb="cent.cnrm")} DESC,
                                cent.cell) AS rn
            FROM q CROSS JOIN cent
        ) x WHERE rn <= {N_PROBE}
    ),
    scored AS (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               a.cell AS cell,
               {_COS_SQL.format(a="q.v", b="n.v", na="q.nrm", nb="n.nrm")} AS cosine
        FROM q
        JOIN probes p ON p.query_id = q.vec_id
        JOIN assign a ON a.cell = p.cell
        JOIN n ON n.vec_id = a.vec_id AND n.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cell, cosine, CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM scored
    ) r WHERE rnk <= {TOP_K}
    """,
    tags=("similarity", "ivf"),
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: per-label mean centroids (a one-shot
    k-means step — production would iterate, the dataflow is
    identical), every vector assigned to its nearest centroid cell,
    queries probe the nprobe=2 nearest cells and brute-force only
    those. Centroids are a tiny broadcast table; the corpus is
    scanned once for assignment and only probed cells are rescored."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _vec_dbl("embedding").alias("v")
    )
    # Centroids: decimal-exact per-dimension means, reassembled in
    # position order.
    cent = (
        e.select("label", F.posexplode("v").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(
            (F.sum(F.col("val").cast(DEC_V)).cast("double") / F.count("*")).alias("c")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
            ).alias("cv")
        )
        .select(
            F.col("label").alias("cell"), "cv", _l2(F.col("cv")).alias("cnrm")
        )
    )
    n = e.select("vec_id", "label", "v", _l2(F.col("v")).alias("nrm"))

    cent_b = F.broadcast(cent)
    cos_to_cent = _cosine(F.col("v"), F.col("cv"), F.col("nrm"), F.col("cnrm"))
    # nearest-centroid assignment as a min_by aggregate (argmin over
    # a (-cosine, cell) struct, ties to the lowest cell — the same
    # deterministic order the oracle's row_number uses) instead of a
    # per-key window: no sort, map-side partial argmin, one narrow
    # shuffle of one struct per vec per partition
    assign = (
        n.crossJoin(cent_b)
        .groupBy("vec_id")
        .agg(
            F.min_by(
                "cell", F.struct((-cos_to_cent).alias("nc"), F.col("cell"))
            ).alias("cell")
        )
    )

    q = n.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    cos_q_cent = _cosine(F.col("qv"), F.col("cv"), F.col("qnrm"), F.col("cnrm"))
    w_probe = Window.partitionBy("query_id").orderBy(
        cos_q_cent.desc(), F.col("cell")
    )
    probes = (
        q.crossJoin(cent_b)
        .withColumn("rn", F.row_number().over(w_probe))
        .where(F.col("rn") <= N_PROBE)
        .select("query_id", "cell")
    )

    scored = (
        F.broadcast(q)
        .join(F.broadcast(probes), "query_id")
        .join(assign, "cell")
        .join(n, "vec_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cell",
            _cosine(F.col("qv"), F.col("v"), F.col("qnrm"), F.col("nrm")).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= TOP_K)
    )


# Self-evaluation: recall@k of the IVF index against the exact
# brute-force answer. Composes the two already-verified oracle
# queries as subqueries (DuckDB allows WITH inside FROM (...)).
def _recall_oracle() -> str:
    from ..registry import REGISTRY

    exact_sql = REGISTRY["sim_bruteforce_topk"].oracle
    ivf_sql = REGISTRY["sim_ivf_topk"].oracle
    return f"""
    WITH exact_r AS (SELECT query_id, neighbor_id FROM ({exact_sql}) x),
    approx_r AS (SELECT query_id, neighbor_id FROM ({ivf_sql}) y),
    hits AS (
        SELECT e.query_id, count(*) AS n_hit
        FROM exact_r e JOIN approx_r a
          ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
        GROUP BY e.query_id
    )
    SELECT q.query_id,
           CAST(coalesce(h.n_hit, 0) AS DOUBLE) / {TOP_K} AS recall_at_k
    FROM (SELECT DISTINCT query_id FROM exact_r) q
    LEFT JOIN hits h ON h.query_id = q.query_id
    """


@query("sim_ivf_recall", oracle=_recall_oracle(), tags=("similarity", "ivf", "eval"))
def sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF index vs the exact brute-force top-k — the
    quality metric an ANN deployment monitors (an index without a
    recall probe is a silent-degradation risk: centroid drift or a
    bad nprobe shows up ONLY here, not in query latency). Runs both
    pipelines and semi-joins the neighbor sets per query; at scale
    this runs on a sampled query set, exactly as here (N_QUERIES
    probes, not the corpus)."""
    exact = sim_bruteforce_topk(spark, sf_dir).select("query_id", "neighbor_id")
    approx = sim_ivf_topk(spark, sf_dir).select("query_id", "neighbor_id")
    hits = (
        exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    qids = exact.select("query_id").distinct()
    return qids.join(hits, "query_id", "left").select(
        "query_id",
        (F.coalesce(F.col("n_hit"), F.lit(0)).cast("double") / TOP_K).alias(
            "recall_at_k"
        ),
    )


KMEANS_ITERS = 2  # Lloyd refinement steps beyond the label-mean init


def _kmeans_oracle(iters: int) -> str:
    """CTE chain for `iters` exact Lloyd steps (DuckDB). Each step is
    the same two relations the IVF oracle uses once: an argmin
    assignment (row_number over vec x centroid cosine) and a
    decimal-exact per-dimension mean."""
    ctes = [
        f"e AS (SELECT vec_id, label, {_VEC_SQL} AS v FROM embeddings)",
        f"n AS (SELECT vec_id, label, v, {_L2_SQL} AS nrm FROM e)",
        # init: label-mean centroids (cent0)
        """expl0 AS (
            SELECT label AS cell, unnest(range(1, len(v) + 1)) AS pos,
                   unnest(v) AS val FROM e)""",
        """centd0 AS (
            SELECT cell, pos,
                   CAST(SUM(CAST(val AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS c
            FROM expl0 GROUP BY cell, pos)""",
        """cent0 AS (
            SELECT cell, list(c ORDER BY pos) AS cv,
                   sqrt(list_reduce(list_transform(list(c ORDER BY pos), x -> x * x),
                                    (a, x) -> a + x) + 0.0) AS cnrm
            FROM centd0 GROUP BY cell)""",
    ]
    cos = _COS_SQL.format(a="n.v", b="c.cv", na="n.nrm", nb="c.cnrm")
    for i in range(1, iters + 1):
        ctes += [
            f"""assign{i} AS (
                SELECT vec_id, cell FROM (
                    SELECT n.vec_id, c.cell,
                           row_number() OVER (
                               PARTITION BY n.vec_id
                               ORDER BY {cos} DESC, c.cell) AS rn
                    FROM n CROSS JOIN cent{i - 1} c
                ) x WHERE rn = 1)""",
            f"""expl{i} AS (
                SELECT a.cell, unnest(range(1, len(n.v) + 1)) AS pos,
                       unnest(n.v) AS val
                FROM assign{i} a JOIN n ON n.vec_id = a.vec_id)""",
            f"""centd{i} AS (
                SELECT cell, pos,
                       CAST(SUM(CAST(val AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS c
                FROM expl{i} GROUP BY cell, pos)""",
            f"""cent{i} AS (
                SELECT cell, list(c ORDER BY pos) AS cv,
                       sqrt(list_reduce(list_transform(list(c ORDER BY pos), x -> x * x),
                                        (a, x) -> a + x) + 0.0) AS cnrm
                FROM centd{i} GROUP BY cell)""",
        ]
    return f"""
    WITH {", ".join(ctes)}
    SELECT a.cell, CAST(count(*) AS BIGINT) AS n_members, f.c0
    FROM assign{iters} a
    JOIN (SELECT cell, cv[1] AS c0 FROM cent{iters}) f ON f.cell = a.cell
    GROUP BY a.cell, f.c0
    """


def _centroids_df(assigned: DataFrame) -> DataFrame:
    """Decimal-exact per-dimension means -> (cell, cv, cnrm)."""
    return (
        assigned.select("cell", F.posexplode("v").alias("pos", "val"))
        .groupBy("cell", "pos")
        .agg((F.sum(F.col("val").cast(DEC_V)).cast("double") / F.count("*")).alias("c"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
            ).alias("cv")
        )
        .select("cell", "cv", _l2(F.col("cv")).alias("cnrm"))
    )


@query(
    "kmeans_lloyd_refine",
    oracle=_kmeans_oracle(KMEANS_ITERS),
    tags=("similarity", "kmeans", "iterative"),
)
def kmeans_lloyd_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means (Lloyd) refinement of the IVF centroids, 2 exact
    iterations: assign every vector to its nearest centroid (argmin
    as a min_by aggregate — no per-key sort), recompute decimal-exact
    per-dimension means, repeat. Cross-engine bit-identical floats in
    an ITERATIVE ML loop — every mean is an exact decimal sum, every
    dot a sequential fold, every argmin tie-broken on cell id — so
    the oracle can check it like any relational query.

    Scale shape per iteration: centroids broadcast (k rows), the
    corpus is scanned once for assignment (map-side partial argmin,
    one narrow shuffle), and the mean recomputation is one
    (cell, dim)-keyed aggregate. This is exactly how Spark MLlib's
    KMeans iterates (minus sampling-based init); expressed
    relationally it stays oracle-checkable."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _vec_dbl("embedding").alias("v")
    )
    n = e.select("vec_id", "v", _l2(F.col("v")).alias("nrm")).localCheckpoint(
        eager=True
    )
    cent = _centroids_df(e.select(F.col("label").alias("cell"), "v"))
    for _ in range(KMEANS_ITERS):
        cos = _cosine(F.col("v"), F.col("cv"), F.col("nrm"), F.col("cnrm"))
        assign = (
            n.crossJoin(F.broadcast(cent))
            .groupBy("vec_id")
            .agg(
                F.min_by("cell", F.struct((-cos).alias("nc"), F.col("cell"))).alias(
                    "cell"
                )
            )
        )
        assigned = assign.join(n, "vec_id").select("vec_id", "cell", "v")
        # materialize: `assigned` feeds both the new centroids and
        # (on the last iteration) the membership counts
        assigned = assigned.localCheckpoint(eager=True)
        cent = _centroids_df(assigned)
    counts = assigned.groupBy("cell").agg(F.count("*").cast("long").alias("n_members"))
    first_coord = cent.select("cell", F.element_at("cv", 1).alias("c0"))
    return counts.join(F.broadcast(first_coord), "cell").select(
        "cell", "n_members", "c0"
    )
