"""Explicit bloom-filter build/probe for semi-join reduction.

The bitmap is a word-indexed aggregate (``word_idx -> bit_or of set
bits``): m/64 rows of int64, mergeable (bit_or is associative and
commutative), built in one narrow pass over the build-side keys. The
probe is a broadcast hash join on the word index plus a bitwise AND —
whole-stage codegen end to end, no Python.

k = 2 hash functions via double hashing (xxhash64 of the key, and of
the key salted with a literal). Guarantees: NO false negatives (every
build key passes the probe — property-tested in
tests/test_properties.py); false positives bounded by ~(k·n/m)^k and
removed by whatever exact join follows.

Used by queries.bloom.join_bloom_prefilter; the same machinery Spark's
InjectRuntimeFilter applies invisibly, made plan-visible and testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _buckets(key: Column, m_bits: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key), F.lit(m_bits)),
        F.pmod(F.xxhash64(key, F.lit(1)), F.lit(m_bits)),
    ]


def bloom_build(keys: DataFrame, key_col: str, m_bits: int) -> DataFrame:
    """Aggregate the build side's keys into a (word_idx, bits) bitmap."""
    bucket = F.explode(F.array(*_buckets(F.col(key_col), m_bits))).alias(
        "bucket"
    )
    return (
        keys.select(bucket)
        .select(
            (F.col("bucket") / 64).cast("bigint").alias("word_idx"),
            (F.col("bucket") % 64).cast("int").alias("bit"),
        )
        .groupBy("word_idx")
        # shiftleft by a COLUMN needs the SQL form (the Python wrapper
        # only takes an int literal)
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").alias("bits"))
    )


def bloom_prune(
    df: DataFrame, key_col: str, bitmap: DataFrame, m_bits: int
) -> DataFrame:
    """Drop rows whose key is definitely not in the bitmap's key set.

    Broadcast-joins the (tiny) bitmap twice — once per hash — and
    keeps rows whose probed bit is set in both words. Never drops a
    true member; keeps a small epsilon of false positives for the
    downstream exact join to remove.
    """
    b0, b1 = _buckets(F.col(key_col), m_bits)
    probed = df.withColumn("bk0", b0).withColumn("bk1", b1)
    w0 = bitmap.select(
        F.col("word_idx").alias("w0_idx"), F.col("bits").alias("w0_bits")
    )
    w1 = bitmap.select(
        F.col("word_idx").alias("w1_idx"), F.col("bits").alias("w1_bits")
    )
    return (
        probed.join(
            F.broadcast(w0), (F.col("bk0") / 64).cast("bigint") == F.col("w0_idx")
        )
        .where(F.expr("(shiftright(w0_bits, CAST(bk0 % 64 AS INT)) & 1) = 1"))
        .join(
            F.broadcast(w1), (F.col("bk1") / 64).cast("bigint") == F.col("w1_idx")
        )
        .where(F.expr("(shiftright(w1_bits, CAST(bk1 % 64 AS INT)) & 1) = 1"))
        .drop("bk0", "bk1", "w0_idx", "w0_bits", "w1_idx", "w1_bits")
    )
