"""Partition-layout helpers (scale hygiene, SURVEY.md §7 M6).

``spark.sql.files.maxPartitionBytes`` sizes scan partitions for
IO-bound work; CPU-heavy per-row operators (shingling, signature
hashing, per-pair similarity) on byte-small inputs then inherit a
single partition and run on one core. ``spread`` widens such a
DataFrame to at least the cluster's parallelism — and never *shrinks*
an already-wide input, so at real scale (thousands of scan
partitions) it is a no-op rather than a bottleneck."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame

# Pipeline-breaker seam (VERDICT r4 #5). Every query module that needs
# a materialized intermediate (self-joined signature tables, iterative
# lineage cuts, read-3x relations) routes through materialize() instead
# of calling localCheckpoint directly, so the bench-vs-cluster choice
# is ONE tested config switch, not 90 scattered call sites.
MATERIALIZE_MODE_CONF = "spark.bdfp.materialize.mode"  # local|reliable|table
MATERIALIZE_DIR_CONF = "spark.bdfp.materialize.dir"


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly materialize ``df`` and cut its lineage; mode chosen by
    session conf ``spark.bdfp.materialize.mode``:

    * ``local`` (default): ``localCheckpoint(eager=True)`` — blocks
      live in executor-local storage. Fastest; right for single-node
      bench runs, but NOT fault-tolerant (an executor loss kills the
      job instead of recomputing).
    * ``reliable``: ``checkpoint(eager=True)`` to the reliable
      checkpoint directory (auto-set under ``spark.bdfp.materialize.dir``
      if unset) — survives executor loss; the cluster default.
    * ``table``: write parquet under ``spark.bdfp.materialize.dir`` and
      read it back — the 100 TB posture for intermediates that are
      re-read across jobs (signature tables, edge lists): durable,
      shareable, and the re-read gets scan-level column pruning.
      Staging lifecycle (TTL sweep) is the deployment's job; bench
      runs land in a per-app temp dir.

    Used as ``df.transform(materialize)`` so call sites keep the
    method-chain shape the query code reads in.
    """
    spark = df.sparkSession
    mode = spark.conf.get(MATERIALIZE_MODE_CONF, "local")
    if mode == "local":
        return df.localCheckpoint(eager=True)
    base = spark.conf.get(
        MATERIALIZE_DIR_CONF,
        os.path.join(
            tempfile.gettempdir(),
            f"bdfp_materialize_{spark.sparkContext.applicationId}",
        ),
    )
    if mode == "reliable":
        sc = spark.sparkContext
        if sc.getCheckpointDir() is None:
            sc.setCheckpointDir(os.path.join(base, "checkpoints"))
        return df.checkpoint(eager=True)
    if mode == "table":
        _evict_dead_staging(spark)
        path = os.path.join(base, "staged", uuid.uuid4().hex)
        df.write.parquet(path)
        _STAGED_PATHS.setdefault(
            spark.sparkContext.applicationId, []
        ).append(path)
        return spark.read.parquet(path)
    raise ValueError(
        f"unknown {MATERIALIZE_MODE_CONF}={mode!r} (local|reliable|table)"
    )


# Staging-dir lifecycle for table mode. Staged parquet CANNOT be
# deleted while its session lives (the returned DataFrame re-reads the
# path lazily on every downstream job), so the in-process lifecycle is
# session-scoped: every table-mode call records its path under the
# current applicationId, and paths recorded by DEAD sessions are swept
# on the next call (same eviction rhythm as session_cached below).
# Iterative queries therefore stage O(iterations) dirs while running
# and drop to zero once a new session takes over; long-lived cluster
# deployments still run their own TTL sweep over the staging root.
_STAGED_PATHS: dict[str, list[str]] = {}


def _evict_dead_staging(spark) -> None:
    app = spark.sparkContext.applicationId
    for dead in [a for a in _STAGED_PATHS if a != app]:
        for path in _STAGED_PATHS.pop(dead):
            shutil.rmtree(path, ignore_errors=True)


# Shared session-scoped intermediate-table cache (banded signatures,
# graph edge lists, cluster maps). Keyed by (applicationId, ...) since
# materialized frames die with the session — and ENTRIES FROM DEAD
# SESSIONS ARE EVICTED on the next access (VERDICT r4: the per-module
# dicts pinned checkpointed plans, and their executor-local blocks,
# for the whole process lifetime once a new session started).
_SESSION_CACHE: dict[tuple, DataFrame] = {}


def session_cached(spark, key: tuple, build) -> DataFrame:
    """Return the materialized frame for ``key`` within the CURRENT
    session, building (and materialize()-ing) it on first use; drops
    every entry belonging to a previous applicationId."""
    app = spark.sparkContext.applicationId
    stale = [k for k in _SESSION_CACHE if k[0] != app]
    for k in stale:
        del _SESSION_CACHE[k]
    full_key = (app, *key)
    if full_key not in _SESSION_CACHE:
        _SESSION_CACHE[full_key] = materialize(build())
    return _SESSION_CACHE[full_key]


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
