#!/usr/bin/env python
"""Skew-robustness evidence (VERDICT r6 #6).

Builds a zipf-skewed variant of the sf0.1 test data and proves two
things about the engine on it:

1. CORRECTNESS UNDER SKEW: the join/graph/dedup/tpch query families
   produce oracle-identical results on the skewed tables (the same
   Spark-vs-DuckDB differential as CORRECTNESS_SWEEP.json — both
   engines read the same skewed parquet, so any skew-induced
   wrong-result path on the Spark side shows up as a hash mismatch).
2. AQE SKEW HANDLING ENGAGES: with the skew-join thresholds scaled
   down to this data's byte sizes (at 100 TB the DEFAULT 256 MB
   threshold fires on the same shape), the hot-key partition of a
   shuffle join against the skewed table is split by
   OptimizeSkewedJoin — observed as ``skew=true`` in the final
   adaptive plan after execution.

Skew model: user_id in ``events`` and l_suppkey in ``lineitem`` are
remapped through a zipf(a=1.5) draw over their ORIGINAL key domains
(seed 42, so the variant is reproducible bit-for-bit): the hottest
key takes ~35-40% of all rows — the "one whale user / one mega
supplier" shape that breaks naive hash joins. Every other table and
column is byte-identical to the source, so FK domains stay intact.

Usage:
    python tools/skew_sweep.py [src_sf_dir] [out_dir]
        default: /root/testdata/sf0.1 -> /tmp/spark_graft_skewed_sf0.1
Writes SKEW_SWEEP.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_artifacts import source_digest  # noqa: E402

FAMILIES = ("join_", "graph_", "dedup_", "tpch_")
SKEW_COLS = {"events": "user_id", "lineitem": "l_suppkey"}
ZIPF_A = 1.5
SEED = 42


def generate(src_dir: str, out_dir: str) -> dict:
    """Write the skewed variant; returns skew stats per table. A
    _SKEWED_OK marker makes regeneration idempotent."""
    import numpy as np
    import pyarrow.parquet as pq

    marker = os.path.join(out_dir, "_SKEWED_OK")
    stats_path = os.path.join(out_dir, "_SKEW_STATS.json")
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
        col = SKEW_COLS.get(tbl)
        if col is not None:
            domain = np.unique(t.column(col).to_numpy())
            rng = np.random.RandomState(SEED)
            idx = (rng.zipf(ZIPF_A, len(t)) - 1) % len(domain)
            skewed = domain[idx]
            import pyarrow as pa

            pos = t.schema.get_field_index(col)
            t = t.set_column(
                pos, t.schema.field(pos), pa.array(skewed, type=t.schema.field(pos).type)
            )
            top = np.bincount(idx).max()
            stats[tbl] = {
                "skewed_col": col,
                "n_rows": len(t),
                "n_keys": int(len(domain)),
                "top_key_rows": int(top),
                "top_key_share_pct": round(100.0 * top / len(t), 1),
            }
        pq.write_table(t, os.path.join(out_dir, name))
    with open(stats_path, "w") as fh:
        json.dump(stats, fh)
    with open(marker, "w") as fh:
        fh.write("ok")
    return stats


def aqe_probe(spark, out_dir: str) -> dict:
    """Join the zipf-skewed ``lineitem`` (top l_suppkey ~38% of rows)
    against ``supplier`` (broadcast disabled) with the AQE skew-join
    thresholds scaled to this data's bytes — at 100 TB the DEFAULT
    256 MB threshold fires on the same shape — and return whether
    OptimizeSkewedJoin split the hot partition.

    Two probe subtleties, both discovered the hard way:
    - The skew annotation only exists in the FINAL adaptive plan, so
      execution must be triggered through the SAME QueryExecution
      that is inspected (``collect()`` on the DataFrame, not a write,
      which builds its own QueryExecution and leaves the inspected
      one ``isFinalPlan=false``).
    - A self-join shape (table join its own groupBy) never splits:
      the aggregate side's hash output partitioning cannot be
      duplicated per skew-slice without re-aggregation, so
      OptimizeSkewedJoin skips it. Two distinct tables are the
      representative 100 TB shape anyway (fact x dim).
    """
    from big_data_final_project_spark.data import load_table

    saved = {}
    lowered = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "131072",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    for k, v in lowered.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        li = load_table(spark, out_dir, "lineitem").select(
            "l_suppkey", "l_extendedprice"
        )
        su = load_table(spark, out_dir, "supplier").select(
            "s_suppkey", "s_nationkey"
        )
        joined = (
            li.join(su, li.l_suppkey == su.s_suppkey)
            .groupBy("s_nationkey")
            .count()
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        return {
            "skew_split_observed": "skew=true" in plan,
            "join_node": next(
                (
                    ln.strip()
                    for ln in plan.splitlines()
                    if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln
                ),
                None,
            ),
            "thresholds": {
                "skewedPartitionThresholdInBytes": 131072,
                "advisoryPartitionSizeInBytes": 32768,
            },
        }
    finally:
        for k, v in saved.items():
            if v is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, v)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/tmp/spark_graft_skewed_sf0.1"
    )
    stats = generate(src, out)
    print(f"skewed variant at {out}: {json.dumps(stats)}", flush=True)

    from big_data_final_project_spark.registry import catalog
    from big_data_final_project_spark.session import get_spark

    sys.path.insert(0, REPO)
    from tools.correctness_sweep import _record  # reuse the driver-format record

    cat = catalog()
    names = [n for n in cat if n.startswith(FAMILIES)]
    spark = get_spark(app_name="skew_sweep", shuffle_partitions=16)

    aqe = aqe_probe(spark, out)
    print(f"AQE probe: {aqe}", flush=True)

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
        "skew": stats,
        "zipf_a": ZIPF_A,
        "seed": SEED,
        "families": list(FAMILIES),
        "n_queries": len(records),
        "n_fail": len(fails),
        "fails": fails,
        "aqe": aqe,
        "source_digest": source_digest(),
        "queries": records,
    }
    with open(os.path.join(REPO, "SKEW_SWEEP.json"), "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(
        f"SKEW_SWEEP.json: {len(records)} queries, {len(fails)} failures"
        f"{': ' + str(fails) if fails else ''}; aqe skew split: "
        f"{aqe['skew_split_observed']}"
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
