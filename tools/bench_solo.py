#!/usr/bin/env python
"""Persisted solo floor-of-N bench for the standing watch list
(VERDICT r10 #3): every cross-round perf adjudication so far leaned
on prose solo numbers that can't be re-checked later. This tool
measures each watch-list query ALONE (best-of-N noop executions,
nothing else running) plus the calibration probe before and after,
and writes BENCH_SOLO.json stamped with the same source digest the
correctness sweeps carry — tools/check_artifacts.py verifies it, so
a solo claim is only citable while it matches the working tree.

Run SOLO at close-out (timing-sensitive, like bench.py):

    python tools/bench_solo.py   # env: SPARK_GRAFT_SF_DIR (default sf0.1)

Reading the artifact: compare `best` values ACROSS rounds only after
dividing by the round's probe floor (min of start/end) — the box this
runs on drifts 20-40% between rounds, and the probe is the pinned
synthetic job that measures the box, not the engine.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from big_data_final_project_spark.registry import catalog  # noqa: E402
from big_data_final_project_spark.session import get_spark  # noqa: E402
from tools.check_artifacts import source_digest  # noqa: E402

import bench  # noqa: E402

# Standing watch list (VERDICT r10 #8 + the screens and their audit):
# queries whose cross-round ratios have needed solo adjudication.
WATCH_LIST = [
    "join_asof",
    "window_running_sum",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_strict",
    "dedup_containment",
    "dedup_candidate_volume_audit",
    "dedup_exact_substr_spans",
    "dedup_substring_windows",
    "text_bm25_topk",
    "sim_lsh_bucketed_topk",
]

N_RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: object = float(sf)
    except ValueError:
        sf_val = sf
    spark = get_spark(app_name="bench_solo")
    cat = catalog()
    names = [n for n in WATCH_LIST if n in cat]

    # same warm-up discipline as bench.py: one full untimed run + one
    # tiny Arrow job so JIT/codegen/worker-pool spawn never bills the
    # first timed query
    bench._run(cat[names[0]].fn(spark, sf_dir))
    spark.range(
        64, numPartitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ).mapInPandas(lambda it: (pdf for pdf in it), schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    probe_start = bench._calibration_probe(spark)
    digest = source_digest()
    queries: dict[str, dict] = {}
    for name in names:
        runs: list[float] = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            bench._run(cat[name].fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        # stall guard (same rule as bench.py): if the second-best run
        # doubles the best, the sample is stall-heavy — take a 4th
        if sorted(runs)[1] > 2.0 * sorted(runs)[0]:
            t0 = time.perf_counter()
            bench._run(cat[name].fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        queries[name] = {
            "best": round(min(runs), 4),
            "runs": [round(r, 4) for r in runs],
            "source_digest": digest,
        }
        print(f"{name}: best {queries[name]['best']} {queries[name]['runs']}")
    probe_end = bench._calibration_probe(spark)

    out = {
        "metric": "watchlist_solo_best_of_n",
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(queries),
        "n_runs": N_RUNS,
        "probe_sec": {"start": probe_start, "end": probe_end},
        "source_digest": digest,
        "queries": queries,
    }
    path = os.path.join(REPO, "BENCH_SOLO.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {path} (probe {probe_start}/{probe_end})")


if __name__ == "__main__":
    main()
