#!/usr/bin/env python
"""Ad-hoc Spark-vs-DuckDB differential for NAMED queries at one or
more scale factors — the per-change dev loop that the full
correctness_sweep is too slow for.

Usage:
    python tools/diffcheck.py q1 q2 ... [--sf 0.001,0.01,0.1]

Exits nonzero if any (query, sf) differential fails.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from correctness_sweep import _record  # noqa: E402


def main(argv: list[str]) -> int:
    sfs = ["0.001", "0.01", "0.1"]
    dirs: list[str] | None = None
    names: list[str] = []
    it = iter(argv)
    for a in it:
        if a == "--sf":
            sfs = next(it).split(",")
        elif a == "--dir":
            dirs = next(it).split(",")
        else:
            names.append(a)
    from big_data_final_project_spark.registry import catalog
    from big_data_final_project_spark.session import get_spark

    reg = catalog()
    missing = [n for n in names if n not in reg]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        return 2
    spark = get_spark()
    failed = 0
    targets = dirs if dirs else [f"/root/testdata/sf{sf}" for sf in sfs]
    for sf_dir in targets:
        for name in names:
            rec = _record(spark, sf_dir, name, reg[name])
            ok = rec["hash_match"] or (
                rec["err"] == "no_oracle" and rec["spark_rows"] is not None
            )
            if not ok:
                failed += 1
            print(
                f"{os.path.basename(sf_dir)} {name}: "
                f"{'OK' if ok else 'FAIL'} {json.dumps(rec)}"
            )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
