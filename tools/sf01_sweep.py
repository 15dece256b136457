#!/usr/bin/env python
"""Whole-registry differential at an arbitrary sf_dir, shardable.

Usage: python tools/sf01_sweep.py <shard> <n_shards> [sf_dir]

Runs the same Spark-vs-DuckDB comparison as
tests/test_oracle_differential.py (via tests.oracle_utils), over the
shard of oracle-paired queries with hash(name) % n_shards == shard.
Writes one status line per query to stdout; nonzero exit if any
query fails. Used for the 10x-driver-scale (sf0.1) robustness pass —
overflow / sketch-regime / interpolation bugs that only appear above
the driver's sf0.01 show up here.
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, ".")

from big_data_final_project_spark.registry import catalog
from big_data_final_project_spark.session import get_spark
from tests.oracle_utils import run_differential


def main() -> int:
    shard, n_shards = int(sys.argv[1]), int(sys.argv[2])
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sorted(
        n
        for n, q in catalog().items()
        if q.oracle is not None
        and int(hashlib.md5(n.encode()).hexdigest(), 16) % n_shards == shard
    )
    spark = get_spark(app_name=f"sf01sweep{shard}", shuffle_partitions=16)
    failed = []
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            problems = run_differential(spark, sf_dir, name)
        except Exception as exc:  # comparator/infra crash counts too
            problems = [f"EXC {type(exc).__name__}: {exc}"]
        status = "ok" if not problems else "FAIL " + "; ".join(problems)[:400]
        print(
            f"[{i + 1}/{len(names)}] {name} {time.time() - t0:.1f}s {status}",
            flush=True,
        )
        if problems:
            failed.append(name)
    print(f"DONE shard {shard}: {len(names) - len(failed)}/{len(names)} ok,"
          f" failed={failed}", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
