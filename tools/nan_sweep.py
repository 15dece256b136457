#!/usr/bin/env python
"""NaN / ±Inf robustness evidence (round 8, VERDICT r7 #3 — sibling
of null_sweep.py).

Builds a non-finite-injected variant of the sf0.1 test data and runs
the Spark-vs-DuckDB differential over the query families that consume
the injected measure. Non-finite doubles are the second classic
cross-engine divergence surface after NULLs: engines disagree on NaN
ordering (Spark sorts NaN last and equal to itself; DuckDB treats NaN
as greater than +Inf), on min/max/greatest propagation, and decimal
casts of NaN/±Inf fault (Spark ANSI) or error (DuckDB) — so any
exact-sum trick that casts doubles to decimal must gate non-finite
rows explicitly. Both engines read the SAME injected parquet; any
divergence shows up as a hash mismatch or a recorded error.

Injection (deterministic key-residue gates, reproducible bit-for-bit)
— `events.value` ONLY. The TPC-H money columns keep the documented
dsum contract (finite money values, ≤6 dp — see functions/numeric.py);
`events.value` is raw telemetry where a sensor can legitimately emit
non-finite readings:

- NaN  on event_id % 25 == 5   (~4% of rows)
- +Inf on event_id % 50 == 12  (~2%)
- -Inf on event_id % 50 == 37  (~2%)

Usage:
    python tools/nan_sweep.py [src_sf_dir] [out_dir]
        default: /root/testdata/sf0.1 -> /tmp/spark_graft_nonfinite_sf0.1
Writes NAN_SWEEP.json at the repo root.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_artifacts import source_digest  # noqa: E402

# Families that read events.value (the injected measure); events_ and
# ml_ consume it as label/weight material, ts_/window_/agg_ as the
# aggregated metric.
FAMILIES = ("agg_", "ts_", "window_", "events_", "ml_", "ab_")
INJECT_RULES = {
    "events": (
        ("value", "event_id", 25, 5, float("nan")),
        ("value", "event_id", 50, 12, float("inf")),
        ("value", "event_id", 50, 37, float("-inf")),
    ),
}


def generate(src_dir: str, out_dir: str) -> dict:
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    marker = os.path.join(out_dir, "_NONFINITE_OK")
    stats_path = os.path.join(out_dir, "_NONFINITE_STATS.json")
    if os.path.exists(marker) and os.path.exists(stats_path):
        with open(stats_path) as fh:
            return json.load(fh)
    os.makedirs(out_dir, exist_ok=True)
    stats: dict = {}
    for name in os.listdir(src_dir):
        if not name.endswith(".parquet"):
            continue
        tbl = name[: -len(".parquet")]
        t = pq.read_table(os.path.join(src_dir, name))
        for col, key, mod, rem, val in INJECT_RULES.get(tbl, ()):
            keys = t.column(key).to_numpy()
            mask = pa.array(np.mod(keys, mod) == rem)
            pos = t.schema.get_field_index(col)
            injected = pc.if_else(
                mask,
                pa.array([val] * len(t), type=t.column(col).type),
                t.column(col),
            )
            t = t.set_column(pos, t.schema.field(pos), injected)
            label = "nan" if math.isnan(val) else ("+inf" if val > 0 else "-inf")
            stats.setdefault(tbl, {}).setdefault(col, {})[label] = {
                "n_rows": len(t),
                "n_injected": int(pc.sum(pc.cast(mask, "int64")).as_py()),
            }
        pq.write_table(t, os.path.join(out_dir, name))
    with open(stats_path, "w") as fh:
        json.dump(stats, fh)
    with open(marker, "w") as fh:
        fh.write("ok")
    return stats


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/tmp/spark_graft_nonfinite_sf0.1"
    )
    stats = generate(src, out)
    print(f"non-finite variant at {out}: {json.dumps(stats)}", flush=True)

    from big_data_final_project_spark.registry import catalog
    from big_data_final_project_spark.session import get_spark
    from tools.correctness_sweep import _record

    cat = catalog()
    names = [n for n in cat if n.startswith(FAMILIES)]
    spark = get_spark(app_name="nan_sweep", shuffle_partitions=16)

    records: dict[str, dict] = {}
    for i, name in enumerate(names):
        t0 = time.time()
        records[name] = _record(spark, out, name, cat[name])
        ok = records[name]["err"] in (None, "no_oracle")
        print(
            f"[{i + 1}/{len(names)}] {name} {time.time() - t0:.1f}s "
            f"{'ok' if ok else 'FAIL ' + str(records[name]['err'])}",
            flush=True,
        )
    fails = [n for n, r in records.items() if r["err"] not in (None, "no_oracle")]
    artifact = {
        "src": src,
        "nonfinite_injection": stats,
        "families": list(FAMILIES),
        "n_queries": len(records),
        "n_fail": len(fails),
        "fails": fails,
        "source_digest": source_digest(),
        "queries": records,
    }
    with open(os.path.join(REPO, "NAN_SWEEP.json"), "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(
        f"NAN_SWEEP.json: {len(records)} queries, {len(fails)} failures"
        f"{': ' + str(fails) if fails else ''}"
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
