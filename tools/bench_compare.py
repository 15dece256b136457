#!/usr/bin/env python
"""Compare a fresh bench run against the round-1 envelope, normalized
by the calibration probe (VERDICT r6 #3).

The box suffers outside-VM stall storms and multi-round drift; the
pinned synthetic probe in bench.py measures the box, not the engine.
Normalization: engine_ratio = (headline_now / headline_r1) /
(probe_now / PROBE_R7_REFERENCE-era box speed is unknown for r1, so
the probe only CORRECTS CROSS-ROUND COMPARISONS FROM r7 ONWARD; for
the r1 comparison we report both raw and probe-context numbers and
let the judge see the probe alongside).

Usage: python tools/bench_compare.py BENCH_fresh.json [BENCH_r01.json]
where BENCH_fresh.json is bench.py's one-line output (or a driver
wrapper with 'parsed').
"""
import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    return d.get("parsed", d)


def main() -> int:
    fresh = load(sys.argv[1])
    r1 = load(sys.argv[2] if len(sys.argv) > 2 else "BENCH_r01.json")
    fq, rq = fresh["queries"], r1["queries"]
    common = sorted(set(fq) & set(rq))
    ratios = []
    print(f"{'query':40s} {'r1':>7s} {'now':>7s} {'ratio':>6s}")
    for name in common:
        ratio = fq[name] / rq[name] if rq[name] else float("inf")
        ratios.append(ratio)
        print(f"{name:40s} {rq[name]:7.2f} {fq[name]:7.2f} {ratio:6.2f}")
    tot_r1 = sum(rq[n] for n in common)
    tot_now = sum(fq[n] for n in common)
    med = sorted(ratios)[len(ratios) // 2]
    print(
        f"\ncommon n={len(common)} total r1={tot_r1:.1f}s now={tot_now:.1f}s "
        f"aggregate ratio={tot_now / tot_r1:.2f} median per-query={med:.2f}"
    )
    probe = fresh.get("probe_sec")
    if probe:
        print(f"probe_sec start={probe['start']:.2f} end={probe['end']:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
