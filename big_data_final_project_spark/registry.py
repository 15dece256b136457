"""Central query registry.

Every operator in SURVEY.md §2 is exposed as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) an equivalent ANSI-SQL oracle string that DuckDB runs
over the same parquet for the driver's differential check.

``__spark_entry__.queries()`` / ``oracle_sql()`` and ``bench.py`` are
thin views over this registry, and the pytest suite runs the same
differential comparison locally.

Determinism contract for oracle-paired queries (driver hashes values
order-insensitively but exactly):
- no wall-clock / random inputs — time-range queries anchor on
  ``max(ts)`` of the data; seeded RNG sampling gets a rows-only check
  (no oracle) because Spark's sampler is per-partition-seeded and so
  LAYOUT-BOUND: the seed reproduces rows only for a fixed partition
  layout (pinned in tests/test_round9_invariants.py) — hash-gated
  samplers are the layout-/engine-invariant, oracle-paired path;
- floating-point SUMs are order-dependent, so money-style sums go
  through ``decimal`` (exact, associative) and only then cast to
  double — see ``functions.numeric.dsum``;
- column names are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, None => rows-only check
    tags: tuple[str, ...] = ()
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn`` as a named query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or ""
        )
        return fn

    return deco


def _load_all() -> None:
    """Import every query module (side effect: registration)."""
    from .queries import (  # noqa: F401
        reference,
        relational,
        windows,
        tpch,
        tpch2,
        scalar,
        dedup,
        similarity,
        text,
        streaming_batch,
        streaming_live,
        multimodal,
        pipeline,
        timeseries,
        cdc,
        ml,
        sql_surface,
        udf_surface,
        curation,
        graph,
        sketches,
        storage,
        profiling,
        geo,
        privacy,
        bloom,
        uncertainty,
        zipf,
    )


def catalog() -> dict[str, Query]:
    _load_all()
    return dict(REGISTRY)


def oracle_catalog() -> dict[str, str]:
    return {q.name: q.oracle for q in catalog().values() if q.oracle is not None}
