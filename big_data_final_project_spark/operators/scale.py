"""Partition-layout helpers (scale hygiene, SURVEY.md §7 M6).

``spark.sql.files.maxPartitionBytes`` sizes scan partitions for
IO-bound work; CPU-heavy per-row operators (shingling, signature
hashing, per-pair similarity) on byte-small inputs then inherit a
single partition and run on one core. ``spread`` widens such a
DataFrame to at least the cluster's parallelism — and never *shrinks*
an already-wide input, so at real scale (thousands of scan
partitions) it is a no-op rather than a bottleneck."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition up to max(current, cluster default
    parallelism). Explicit numPartitions on purpose: AQE's
    size-based coalescing would fold a byte-small shuffle back to one
    partition, defeating the point for CPU-bound stages."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    current = df.rdd.getNumPartitions()
    if current >= target:
        return df
    return df.repartition(target)
