"""Semantic invariants of the round-4o operators (streaming velocity,
Shapley attribution, stratified ATE, frame aHash dedup) — properties
the oracle differential can't state."""

from __future__ import annotations

import hashlib
from collections import defaultdict
from itertools import combinations

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.registry import catalog

CHANNELS = {"click": 1, "error": 2, "signup": 4, "view": 8}


def _run(spark, sf_dir, name):
    return catalog()[name].fn(spark, sf_dir)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# --------------------------------------------- Shapley attribution


def test_shapley_matches_python_replay_and_efficiency(spark, sf_dir):
    out = {r.channel: r.shapley_x24_e6
           for r in _run(spark, sf_dir, "events_attribution_shapley").collect()}
    assert set(out) == set(CHANNELS)
    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr("user_id", "event_type")
        .distinct()
        .collect()
    )
    per_user = defaultdict(lambda: [0, 0])  # mask, conv
    for r in ev:
        if r.event_type == "purchase":
            per_user[r.user_id][1] = 1
        else:
            per_user[r.user_id][0] |= CHANNELS[r.event_type]
    sets = defaultdict(lambda: [0, 0])  # n, conv
    for mask, conv in per_user.values():
        sets[mask][0] += 1
        sets[mask][1] += conv

    def v_e6(mask):
        if mask not in sets:
            return 0
        n, c = sets[mask]
        return c * 1_000_000 // n

    W = {0: 6, 1: 2, 2: 2, 3: 6}
    bits = list(CHANNELS.values())
    for ch, bit in CHANNELS.items():
        others = [b for b in bits if b != bit]
        phi = 0
        for k in range(len(others) + 1):
            for combo in combinations(others, k):
                s = sum(combo)
                phi += W[k] * (v_e6(s | bit) - v_e6(s))
        assert out[ch] == phi


# ------------------------------------------------ stratified ATE


def test_stratified_ate_matches_python_replay(spark, sf_dir):
    out = _run(spark, sf_dir, "ab_stratified_ate").collect()
    assert out
    orders = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "o_orderkey", "o_orderpriority AS s",
            "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y",
        )
        .collect()
    )
    per = defaultdict(lambda: [0, 0, 0, 0])
    for r in orders:
        t = _h32(f"st-{r.o_orderkey}") % 2
        v = per[r.s]
        if t:
            v[0] += 1
            v[1] += r.y
        else:
            v[2] += 1
            v[3] += r.y
    num = den = 0
    ates = {}
    for s, (nt, ct, nc, cc) in per.items():
        ate = ct * 1_000_000 // nt - cc * 1_000_000 // nc
        ates[s] = (nt, ct, nc, cc, ate)
        num += (nt + nc) * ate
        den += nt + nc
    sgn = -1 if num < 0 else 1
    pooled = sgn * (abs(num) // den)
    for r in out:
        nt, ct, nc, cc, ate = ates[r.stratum]
        assert (r.n_t, r.c_t, r.n_c, r.c_c, r.stratum_ate_e6) == (
            nt, ct, nc, cc, ate)
        assert r.pooled_ate_e6 == pooled
    # hash-bit treatment is an A/A test: the effect should be small
    assert abs(pooled) < 100_000  # < 10 percentage points


# --------------------------------------------------- frame aHash


def test_ahash_matches_python_replay(spark, sf_dir):
    out = _run(spark, sf_dir, "mm_frame_dedup_ahash").collect()
    assert out
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    groups = defaultdict(lambda: [0, set()])
    for d in docs:
        t = d.text
        for i in range(len(t) // 16):
            f = t[i * 16: (i + 1) * 16]
            tot = sum(ord(c) for c in f)
            h = sum(
                (1 << j) for j, c in enumerate(f) if 16 * ord(c) > tot
            )
            groups[h][0] += 1
            groups[h][1].add(d.doc_id)
    expected = sorted(
        (
            (h, n, len(assets), min(assets))
            for h, (n, assets) in groups.items()
            if n > 1
        ),
        key=lambda t: (-t[1], t[0]),
    )[:20]
    got = [(r.ahash, r.n_frames, r.n_assets, r.canonical_asset) for r in out]
    assert got == expected
    for r in out:
        assert 0 <= r.ahash < (1 << 16)
        assert r.n_assets <= r.n_frames


# ----------------------------------------- streaming velocity live


def test_streaming_velocity_matches_batch_sliding_replay(spark, sf_dir):
    out = _run(spark, sf_dir, "streaming_velocity_live").collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr("user_id", "unix_micros(ts) AS us")
        .collect()
    )
    win = 600_000_000
    slide = 300_000_000
    per_window = defaultdict(int)
    for r in ev:
        s0 = (r.us // slide) * slide
        for s in (s0, s0 - slide):
            if s <= r.us < s + win:
                per_window[(r.user_id, s)] += 1
    per_user = defaultdict(lambda: [0, 0])
    for (uid, _), c in per_window.items():
        v = per_user[uid]
        v[0] = max(v[0], c)
        if c >= 2:
            v[1] += 1
    expected = sorted(
        ((u, p, h) for u, (p, h) in per_user.items() if p >= 2),
        key=lambda t: (-t[1], t[0]),
    )[:100]
    got = [(r.user_id, r.peak_window_count, r.n_hot_windows) for r in out]
    assert got == expected
