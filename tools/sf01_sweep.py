#!/usr/bin/env python
"""Whole-registry differential at sf0.1, persisted as a GUARDED
artifact (VERDICT r9 #2: the 10x-scale pass used to be stdout-only —
claimed but unverifiable after the fact).

Reuses tools/correctness_sweep.py's machinery (same driver-format
records, same per-record source-digest stamps) with artifact base
CORRECTNESS_SF01, so tools/check_artifacts.py certifies it with the
identical content-digest rule as the sf0.01 sweep. Overflow /
sketch-regime / interpolation bugs that only appear above the
driver's sf0.01 show up here.

Usage:
    python tools/sf01_sweep.py <shard> <n_shards> [sf_dir]
        -> writes CORRECTNESS_SF01.shard<shard>of<n>.json
    python tools/sf01_sweep.py merge <n_shards> [sf_dir]
        -> merges shards into CORRECTNESS_SF01.json (registry order),
           exits nonzero on any failure or missing shard
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
sys.path.insert(0, __file__.rsplit("/", 1)[0])

from correctness_sweep import merge, run  # noqa: E402

BASE = "CORRECTNESS_SF01"
DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    if sys.argv[1] == "merge":
        n = int(sys.argv[2])
        sf_dir = sys.argv[3] if len(sys.argv) > 3 else DEFAULT_SF_DIR
        return merge(n, sf_dir, base=BASE)
    shard, n_shards = int(sys.argv[1]), int(sys.argv[2])
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else DEFAULT_SF_DIR
    return run(shard, n_shards, sf_dir, base=BASE)


if __name__ == "__main__":
    raise SystemExit(main())
