"""User-defined function surface (SURVEY.md §2.6): Arrow-vectorized
pandas UDF (scalar), applyInPandas grouped-map (Spark's Python UDAF
gap — SURVEY §2.6 note), and a Python UDTF — each differentially
checked against a pure-SQL oracle, which is the strongest possible
test of a UDF: the Python path must agree with the declarative
semantics bit-for-bit.

Scale posture: everything here is Arrow-batched (pandas_udf /
applyInPandas / UDTF), never row-at-a-time `F.udf` — the 10-100x
slow path this engine deliberately has no query using. The grouped
map shuffles once on its keys; the scalar UDF and UDTF are narrow.

Determinism: float work inside the UDFs is scaled-integer arithmetic
(2-decimal money × 100 is exact in int64), so results don't depend
on pandas' summation order — same construction as
functions/numeric.dsum.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf

from ..data import load_table
from ..registry import query


def _net_price_capped_fn(ep: pd.Series, disc: pd.Series) -> pd.Series:
    """Vectorized net price, rounded to cents, capped at 50000 —
    numpy double ops, one Arrow batch at a time."""
    net = (ep * (1 - disc) * 100).round() / 100
    return net.clip(upper=50000.0)


@query(
    "udf_pandas_scalar",
    oracle="""
    -- round_even: pandas/numpy .round() is half-to-even
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           least(round_even(l_extendedprice * (1 - l_discount) * 100, 0) / 100,
                 50000.0) AS net_capped
    FROM lineitem
    """,
    tags=("udf", "pandas"),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow batches) vs the equivalent SQL
    expression: identical IEEE doubles. In production this slot holds
    logic genuinely outside SQL (tokenizers, model scoring); here it
    is SQL-expressible precisely so the oracle can check the
    machinery."""
    li = load_table(spark, sf_dir, "lineitem")
    # constructed here, not at import: the decorator resolves its
    # return type against the active session
    net_price_capped = pandas_udf(_net_price_capped_fn, T.DoubleType())
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        net_price_capped("l_extendedprice", "l_discount").alias("net_capped"),
    )


_GROUP_SCHEMA = T.StructType(
    [
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("sum_qty", T.DoubleType()),
        T.StructField("avg_price", T.DoubleType()),
    ]
)


def _group_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map 'UDAF': per-group stats in scaled-int arithmetic
    (exact, order-independent — pandas sum order varies with
    partitioning, so raw float sums would flap)."""
    qty_c = pdf["l_quantity"].mul(100).round().astype("int64").sum()
    price_c = pdf["l_extendedprice"].mul(100).round().astype("int64").sum()
    n = len(pdf)
    return pd.DataFrame(
        {
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "l_linestatus": [pdf["l_linestatus"].iloc[0]],
            "n_rows": [n],
            "sum_qty": [qty_c / 100.0],
            "avg_price": [price_c / 100.0 / n],
        }
    )


@query(
    "udf_grouped_agg_pandas",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           SUM(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
           SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
             / count(*) AS avg_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("udf", "applyInPandas", "udaf"),
)
def udf_grouped_agg_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped map — the idiom filling Spark's Python
    UDAF gap (SURVEY §2.6): whole group in, one aggregate row out,
    one shuffle on the group keys. At 100 TB the group count (6 here)
    caps parallelism, so this shape is for many-group workloads;
    few-group aggregation belongs in built-in aggs (tpch_q1)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"
    )
    return li.groupBy("l_returnflag", "l_linestatus").applyInPandas(
        _group_stats, schema=_GROUP_SCHEMA
    )


class _TokenizeUDTF:
    """Python UDTF: one document in, one row per token out (the
    table-function shape of text.text_token_stats' tokenizer)."""

    def eval(self, text: str) -> Iterator[tuple[int, str]]:
        if text is None:
            return
        import re

        norm = re.sub(r"\s+", " ", text.lower()).strip()
        for i, tok in enumerate(norm.split(" ")):
            yield i + 1, tok


@query(
    "udf_udtf_tokenize",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                            ' ') AS toks
        FROM documents
    )
    SELECT doc_id, CAST(idx AS BIGINT) AS token_idx, toks[idx] AS token
    FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS idx FROM t) u
    """,
    tags=("udf", "udtf"),
)
def udf_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral-joined Python UDTF vs an unnest oracle: the generator
    yields (position, token) per document row."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    tokenize = udtf(
        _TokenizeUDTF,
        returnType=T.StructType(
            [
                T.StructField("token_idx", T.LongType()),
                T.StructField("token", T.StringType()),
            ]
        ),
    )
    spark.udtf.register("tokenize_udtf", tokenize)
    return spark.sql("""
        SELECT d.doc_id, t.token_idx, t.token
        FROM documents d, LATERAL tokenize_udtf(d.text) t
    """)


@query(
    "udf_cogroup_asof",
    oracle="""
    WITH clicks AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
         errors AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error')
    SELECT e.event_id AS event_id, e.user_id AS user_id, e.ts AS ts,
           c.value AS value_asof
    FROM errors e ASOF LEFT JOIN clicks c
      ON e.user_id = c.user_id AND c.ts <= e.ts
    """,
    tags=("udf", "pandas", "cogroup", "asof"),
)
def udf_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via cogrouped pandas: both sides co-partitioned and
    handed to pd.merge_asof — the THIRD route to the same answer as
    operators/joins.asof_join (union-merge composition) and the
    DuckDB ASOF oracle. cogroup + applyInPandas is the escape hatch
    for per-key algorithms that need BOTH sides as materialized
    frames (interval accounting, order-book replay).

    The cogroup key is a BUCKET of users, not the user itself, with
    ``merge_asof(by="user_id")`` resolving keys inside each call:
    cogrouping by raw user_id pays one Python invocation per key
    (measured 6-7 s at sf0.1, pure per-call overhead); 64 buckets ×
    one vectorized merge each runs the identical per-user semantics
    in ~1 s. Bucket count is the parallelism/memory knob — each
    bucket must fit in worker memory, the documented contract of the
    API."""
    from ..data import load_table

    N_BUCKETS = 64
    e = load_table(spark, sf_dir, "events")
    bucket = F.pmod(F.col("user_id"), F.lit(N_BUCKETS)).alias("bucket")
    clicks = e.where(F.col("event_type") == "click").select(
        bucket, "user_id", "ts", "value"
    )
    errors = e.where(F.col("event_type") == "error").select(
        bucket, "event_id", "user_id", "ts"
    )

    out_schema = (
        "event_id long, user_id long, ts timestamp, value_asof double"
    )

    def merge(key, err_pdf, clk_pdf):
        import pandas as pd

        err_pdf = err_pdf.sort_values("ts", kind="mergesort")
        clk_pdf = clk_pdf.sort_values("ts", kind="mergesort")
        merged = pd.merge_asof(
            err_pdf,
            clk_pdf[["user_id", "ts", "value"]],
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        return merged.rename(columns={"value": "value_asof"})[
            ["event_id", "user_id", "ts", "value_asof"]
        ]

    return (
        errors.groupBy("bucket")
        .cogroup(clicks.groupBy("bucket"))
        .applyInPandas(merge, schema=out_schema)
    )


@query(
    "udf_arrow_map_norms",
    oracle=f"""
    SELECT vec_id, label,
           CAST(len(embedding) AS INT) AS n_dims,
           CAST(list_reduce(
                 list_transform(
                   list_transform(embedding, x ->
                     CAST(CASE WHEN x >= 0
                          THEN floor(CAST(x AS DOUBLE) * 8388608.0 + 0.5)
                          ELSE -floor(-(CAST(x AS DOUBLE) * 8388608.0) + 0.5)
                          END AS BIGINT)),
                   q -> q * q),
                 (a, x) -> a + x) AS BIGINT) AS norm_sq_fp
    FROM embeddings
    """,
    tags=("udf", "arrow", "vector"),
)
def udf_arrow_map_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the zero-copy sibling of mapInPandas: batches
    arrive as pyarrow RecordBatches, the embedding matrix is viewed
    as one contiguous numpy array (no per-row Python, no pandas
    boxing), quantized to 2^23 fixed point, and squared-summed in
    int64 — so the norm is EXACT and the DuckDB list-fold oracle
    matches bit-for-bit (same FXP contract as the ANN operators,
    dedup.quantize_fxp).

    Scale shape: embarrassingly parallel single pass, zero shuffles;
    Arrow record batches bound memory per task. This is the template
    for any vectorized feature kernel (norms, quantization, hashing)
    on a 100 TB embedding store."""
    import numpy as np
    import pyarrow as pa

    from .dedup import FXP_SCALE

    emb = load_table(spark, sf_dir, "embeddings")

    def norms(batches):
        for batch in batches:
            vec_id = batch.column("vec_id")
            label = batch.column("label")
            lists = batch.column("embedding")
            n = len(batch)
            if n == 0:
                continue
            dim = len(lists[0].as_py()) if n else 0
            flat = lists.flatten().to_numpy(zero_copy_only=False)
            mat = flat.reshape(n, dim).astype("float64") * FXP_SCALE
            q = (np.sign(mat) * np.floor(np.abs(mat) + 0.5)).astype("int64")
            norm_sq = (q * q).sum(axis=1)
            yield pa.RecordBatch.from_arrays(
                [
                    vec_id,
                    label,
                    pa.array([dim] * n, type=pa.int32()),
                    pa.array(norm_sq, type=pa.int64()),
                ],
                names=["vec_id", "label", "n_dims", "norm_sq_fp"],
            )

    return emb.mapInArrow(
        norms,
        schema="vec_id bigint, label int, n_dims int, norm_sq_fp bigint",
    )


@query(
    "udf_grouped_map_scale",
    oracle="""
    SELECT event_id, event_type, value,
           CAST(FLOOR(CASE WHEN mx = mn THEN 0.0
                           ELSE (value - mn) * 1000000.0 / (mx - mn)
                      END) AS BIGINT) AS scaled_ppm
    FROM (
        SELECT event_id, event_type, value,
               MIN(value) OVER (PARTITION BY event_type) AS mn,
               MAX(value) OVER (PARTITION BY event_type) AS mx
        FROM events
    )
    ORDER BY event_id
    LIMIT 25
    """,
    tags=("udf", "applyInPandas", "grouped-map", "feature-engineering"),
)
def udf_grouped_map_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped MAP with per-row output (the companion
    udf_grouped_agg_pandas collapses each group to one row; this one
    transforms every row using group-local state): min-max scale each
    event's value within its event type to an integer
    parts-per-million position. The pandas function sees one whole
    group as a DataFrame — the escape hatch for group-local logic the
    built-ins can't express — while the ORACLE states the same
    semantics with two analytic windows, which pins the UDF exactly.

    Float discipline: the scale expression is (v - min) * 1e6 /
    (max - min) evaluated in IEEE doubles in the SAME operation order
    in numpy and DuckDB, then floored to int64 — bit-identical
    without any decimal staging because no reduction over floats ever
    happens (min/max are selections, not sums).

    Scale shape: one shuffle on the group key; each group must fit a
    pandas frame (event-type groups are table-scale here — real
    deployments key by a finer entity; the API shape is the point).
    Arrow batches both directions, zero per-row Python."""
    e = load_table(spark, sf_dir, "events")

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        mn = pdf["value"].min()
        mx = pdf["value"].max()
        if mx == mn:
            scaled = pd.Series(0.0, index=pdf.index)
        else:
            scaled = (pdf["value"] - mn) * 1000000.0 / (mx - mn)
        import numpy as np

        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "value": pdf["value"],
                "scaled_ppm": np.floor(scaled).astype("int64"),
            }
        )

    out_schema = (
        "event_id bigint, event_type string, value double, scaled_ppm bigint"
    )
    return (
        e.select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(scale, schema=out_schema)
        .orderBy("event_id")
        .limit(25)
    )


def _cents_total_fn(v: pd.Series) -> int:  # series -> scalar = GROUPED_AGG
    """GROUPED_AGG pandas UDF body: exact int64 cents total of the
    frame it is handed (pandas .round is half-even — the oracle must
    use round_even, not round; see the verify-skill rounding lesson).
    The Series->scalar type hints make pandas_udf infer GROUPED_AGG."""
    return int(v.mul(100).round().astype("int64").sum())


@query(
    "udf_grouped_agg_window",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(round_even(value * 100, 0) AS BIGINT))
                OVER (PARTITION BY user_id) AS BIGINT) AS user_total_cents,
           CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS user_n
    FROM events
    """,
    tags=("udf", "pandas", "window", "grouped-agg"),
)
def udf_grouped_agg_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas GROUPED_AGG UDF applied OVER A WINDOW — the API corner
    the rest of the UDF family doesn't touch: Spark hands the UDF each
    window frame as one Arrow batch (unbounded frames only), so a
    Python aggregate can decorate every row with its partition's
    statistic without a join back. The UDF does exact scaled-integer
    cents arithmetic, so the differential against the plain SQL window
    is bit-exact (oracle uses round_even to mirror pandas' half-even).

    Scale shape: one shuffle on user_id (the window exchange), one
    Arrow transfer per frame; at 100 TB the same plan as any window
    aggregate, with the Python hop only where Python is genuinely
    wanted (custom aggregates Spark lacks)."""
    from pyspark.sql import Window

    total_cents = pandas_udf(_cents_total_fn, T.LongType())
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    return e.select(
        "event_id",
        "user_id",
        total_cents("value").over(w).alias("user_total_cents"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("user_n"),
    )


@query(
    "udf_apply_in_arrow_grouped",
    oracle="""
    WITH q AS (
        SELECT label, vec_id,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 8388608.0) AS BIGINT)) AS qv
        FROM embeddings
    ),
    n AS (
        SELECT label, vec_id,
               CAST(list_reduce(list_transform(qv, x -> x * x),
                                (a, x) -> a + x) AS BIGINT) AS ns
        FROM q
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(SUM(ns) // count(*) AS BIGINT) AS mean_norm_sq_fp,
           CAST(SUM(ns) % count(*) AS BIGINT) AS rem_norm_sq_fp,
           MIN(vec_id) AS min_vec_id,
           MAX(vec_id) AS max_vec_id
    FROM n GROUP BY label
    """,
    tags=("udf", "arrow", "grouped", "engine-addition"),
)
def udf_apply_in_arrow_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInArrow GROUPED map (Spark 4) — the zero-copy grouped
    sibling of applyInPandas: each label group arrives as ONE
    pyarrow.Table, the embedding block is viewed as a contiguous numpy
    matrix, and the group statistic is exact fixed-point integer math.
    The group total can exceed int64 at large group sizes, so the
    result is emitted as (quotient, remainder) by group count — both
    int64-safe at ANY group size, and exactly reconstructible
    (total = mean*n + rem). The Python side sums in arbitrary-precision
    ints, the oracle in DuckDB HUGEINT: same numbers, no overflow on
    either engine — the n^2-overflow lesson designed in rather than
    patched later.

    Scale shape: one shuffle on the group key (same as any grouped
    agg), one Arrow transfer per group; groups are label-sized, so a
    production deployment salts or pre-aggregates if a single group
    outgrows an Arrow batch."""
    import numpy as np
    import pyarrow as pa

    from .dedup import FXP_SCALE

    emb = load_table(spark, sf_dir, "embeddings")

    def stats(table: pa.Table) -> pa.Table:
        vec_id = table.column("vec_id").to_numpy()
        lists = table.column("embedding")
        n = len(table)
        flat = lists.combine_chunks().flatten().to_numpy(zero_copy_only=False)
        dim = len(flat) // n
        mat = flat.reshape(n, dim).astype("float64") * FXP_SCALE
        q = (np.sign(mat) * np.floor(np.abs(mat) + 0.5)).astype("int64")
        norm_sq = (q * q).sum(axis=1)
        total = sum(int(x) for x in norm_sq)  # python int: no overflow
        label = int(table.column("label")[0].as_py())
        return pa.table(
            {
                "label": pa.array([label], type=pa.int32()),
                "n_vecs": pa.array([n], type=pa.int64()),
                "mean_norm_sq_fp": pa.array([total // n], type=pa.int64()),
                "rem_norm_sq_fp": pa.array([total % n], type=pa.int64()),
                "min_vec_id": pa.array([int(vec_id.min())], type=pa.int64()),
                "max_vec_id": pa.array([int(vec_id.max())], type=pa.int64()),
            }
        )

    return emb.groupBy("label").applyInArrow(
        stats,
        schema=(
            "label int, n_vecs bigint, mean_norm_sq_fp bigint, "
            "rem_norm_sq_fp bigint, min_vec_id bigint, max_vec_id bigint"
        ),
    )
