#!/usr/bin/env python
"""Compare a fresh bench run against a previous round's BENCH JSON,
with probe normalization WHEN BOTH FILES CARRY A PROBE (ADVICE r7).

The box suffers outside-VM stall storms and multi-round drift; the
pinned synthetic probe in bench.py (present from r7 onward) measures
the box, not the engine. When both inputs have `probe_sec`, the tool
prints, per query and in aggregate:

    raw_ratio    = headline_now / headline_base
    probe_ratio  = probe_now / probe_base   (min of start/end each)
    engine_ratio = raw_ratio / probe_ratio

so a slow-box run normalizes back to engine speed. When the BASE file
predates the probe (r1-r6), no normalization is possible: the tool
prints raw ratios plus the fresh run's probe for context, and says so.

Usage: python tools/bench_compare.py BENCH_fresh.json [BENCH_base.json]
where each file is bench.py's one-line output (or a driver wrapper
with 'parsed'). Default base: BENCH_r01.json (raw-only — no probe).
"""
import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    return d.get("parsed", d)


def probe_floor(d: dict) -> float | None:
    """One number for the run's box speed: the FASTER of the start/end
    probes (min = least-stalled observation, same best-of logic as the
    headline)."""
    p = d.get("probe_sec")
    if not p:
        return None
    return min(p["start"], p["end"])


def main() -> int:
    fresh = load(sys.argv[1])
    base = load(sys.argv[2] if len(sys.argv) > 2 else "BENCH_r01.json")
    fq, bq = fresh["queries"], base["queries"]
    common = sorted(set(fq) & set(bq))

    pf, pb = probe_floor(fresh), probe_floor(base)
    probe_ratio = (pf / pb) if (pf and pb) else None

    if probe_ratio:
        print(
            f"probe: base={pb:.3f}s now={pf:.3f}s ratio={probe_ratio:.2f} "
            f"(engine_ratio = raw_ratio / {probe_ratio:.2f})"
        )
        hdr = f"{'query':40s} {'base':>7s} {'now':>7s} {'raw':>6s} {'engine':>7s}"
    else:
        why = "base file has no probe_sec" if pf else "no probe in inputs"
        print(f"no normalization ({why}) — raw ratios only")
        hdr = f"{'query':40s} {'base':>7s} {'now':>7s} {'raw':>6s}"
    print(hdr)

    ratios, engine_ratios = [], []
    for name in common:
        raw = fq[name] / bq[name] if bq[name] else float("inf")
        ratios.append(raw)
        line = f"{name:40s} {bq[name]:7.2f} {fq[name]:7.2f} {raw:6.2f}"
        if probe_ratio:
            eng = raw / probe_ratio
            engine_ratios.append(eng)
            line += f" {eng:7.2f}"
        print(line)

    tot_b = sum(bq[n] for n in common)
    tot_f = sum(fq[n] for n in common)
    agg_raw = tot_f / tot_b
    med = sorted(ratios)[len(ratios) // 2]
    summary = (
        f"\ncommon n={len(common)} total base={tot_b:.1f}s now={tot_f:.1f}s "
        f"aggregate raw={agg_raw:.2f} median per-query={med:.2f}"
    )
    if probe_ratio:
        summary += f" aggregate engine={agg_raw / probe_ratio:.2f}"
    print(summary)
    if pf and not probe_ratio:
        p = fresh["probe_sec"]
        print(f"fresh probe_sec start={p['start']:.2f} end={p['end']:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
