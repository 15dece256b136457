"""Salted join for skewed keys (SCALE.md; SURVEY.md §7 M6).

A shuffle join hashes rows by key; a hot key sends its entire volume
to one reducer. Salting splits each hot left-side key into
``salt_buckets`` sub-keys and replicates the matching right-side rows
across all buckets, so the hot partition fans out ``salt_buckets``
ways. AQE's skew-join handles this adaptively for sort-merge joins;
this explicit form covers the cases AQE can't see (e.g. skew
appearing after a preceding stage, or non-SMJ plans) and documents
the pattern.

Result-equivalent to a plain inner equi-join — proven by
tests/test_salting.py against the unsalted twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_inner_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    salt_buckets: int = 8,
    extra_condition: Column | None = None,
) -> DataFrame:
    """Inner equi-join on ``on`` with left-side salting.

    left gets a salt in [0, salt_buckets) derived by hashing its row
    identity (xxhash64 — cheap, uniform, no rand()) MIXED with the
    physical row position (partition id + per-partition counter):
    identity alone would send fully-identical duplicate rows of a hot
    key to one bucket, preserving exactly the skew salting exists to
    break. The positional mix keeps bucket routing deterministic for
    a deterministic input partitioning (replays recompute the same
    lineage, so retries agree); the JOIN RESULT is salt-independent
    either way — salt only routes rows, and tests/test_salting.py
    pins result-equivalence to the unsalted twin.
    """
    left_s = left.withColumn(
        SALT_COL,
        F.pmod(
            F.xxhash64(
                *[F.col(c) for c in left.columns],
                F.spark_partition_id(),
                F.monotonically_increasing_id(),
            ),
            F.lit(salt_buckets),
        ),
    )
    buckets = F.array(*[F.lit(i) for i in range(salt_buckets)])
    right_s = right.withColumn(SALT_COL, F.explode(buckets)).withColumnRenamed(
        on, f"__r_{on}"
    )
    cond = (left_s[on] == F.col(f"__r_{on}")) & (
        left_s[SALT_COL] == right_s[SALT_COL]
    )
    if extra_condition is not None:
        cond = cond & extra_condition
    return left_s.join(right_s, cond).drop(SALT_COL, f"__r_{on}")
