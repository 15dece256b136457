#!/usr/bin/env python
"""Null-robustness evidence (round 7).

Builds a null-injected variant of the sf0.1 test data and runs the
Spark-vs-DuckDB differential over the query families that consume the
nulled columns. Null semantics are the classic cross-engine
divergence surface (NULL in aggregates vs COUNT(*), null ordering,
null-safe equality, three-valued WHERE logic, NULL propagation
through arithmetic); both engines read the SAME nulled parquet, so
any divergence shows up as a hash mismatch.

Injection (deterministic, seed 42 — md5-style hash gate on the row's
key, so the variant is reproducible bit-for-bit):
- events.value: NULL on ~5% of rows (event_id % 20 == 7)
- events.props: NULL on ~10% of rows (event_id % 10 == 3)
- documents.lang: NULL on ~5% of rows (doc_id % 20 == 11)

Columns that operators CONTRACTUALLY require non-null (embeddings
vectors, join keys, timestamps) are left intact — a pipeline nulls
measures and attributes, not identities.

Usage:
    python tools/null_sweep.py [src_sf_dir] [out_dir]
        default: /root/testdata/sf0.1 -> /tmp/spark_graft_nulled_sf0.1
Writes NULL_SWEEP.json at the repo root.
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

# dedup_ added in round 12 (ADVICE r11: the NULL-lang block-sampler
# divergence was latent precisely because the family was excluded
# even though the sweep plants NULL documents.lang)
FAMILIES = ("agg_", "ts_", "window_", "scalar_", "text_", "events_",
            "null_", "dedup_")
NULL_RULES = {
    "events": (("value", "event_id", 20, 7), ("props", "event_id", 10, 3)),
    "documents": (("lang", "doc_id", 20, 11),),
}


def generate(src_dir: str, out_dir: str) -> dict:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    marker = os.path.join(out_dir, "_NULLED_OK")
    stats_path = os.path.join(out_dir, "_NULL_STATS.json")
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
        for col, key, mod, rem in NULL_RULES.get(tbl, ()):
            import numpy as np

            keys = t.column(key).to_numpy()
            mask = pa.array(np.mod(keys, mod) == rem)
            pos = t.schema.get_field_index(col)
            nulled = pc.if_else(mask, pa.nulls(len(t), t.column(col).type), t.column(col))
            t = t.set_column(pos, t.schema.field(pos), nulled)
            stats.setdefault(tbl, {})[col] = {
                "n_rows": len(t),
                "n_null": int(pc.sum(pc.cast(mask, "int64")).as_py()),
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
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_nulled_sf0.1"
    )
    stats = generate(src, out)
    print(f"nulled variant at {out}: {json.dumps(stats)}", flush=True)

    from big_data_final_project_spark.registry import catalog
    from big_data_final_project_spark.session import get_spark
    from tools.correctness_sweep import _record

    cat = catalog()
    names = [n for n in cat if n.startswith(FAMILIES)]
    spark = get_spark(app_name="null_sweep", shuffle_partitions=16)

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
        "null_injection": stats,
        "families": list(FAMILIES),
        "n_queries": len(records),
        "n_fail": len(fails),
        "fails": fails,
        "source_digest": source_digest(),
        "queries": records,
    }
    with open(os.path.join(REPO, "NULL_SWEEP.json"), "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(
        f"NULL_SWEEP.json: {len(records)} queries, {len(fails)} failures"
        f"{': ' + str(fails) if fails else ''}"
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
