"""Semantic invariants of the round-4l operators (Western Electric
SPC rules, power analysis, bucketed jackknife, report-noisy-max,
1-D Kalman) — properties the oracle differential can't state."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from pyspark.sql import functions as F

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.registry import catalog


def _run(spark, sf_dir, name):
    return catalog()[name].fn(spark, sf_dir)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# -------------------------------------------------- SPC rules


def test_spc_matches_python_replay(spark, sf_dir):
    out = [
        (r.event_type, r.h, r.y, r.rule1_beyond_3sigma,
         r.rule2_two_of_three_2sigma, r.rule4_nine_one_side)
        for r in _run(spark, sf_dir, "ts_spc_western_electric").collect()
    ]
    assert out  # the synthetic stream has out-of-control hours
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr(
                "CAST(unix_timestamp(date_trunc('hour', ts)) AS BIGINT) div 3600"
            ).alias("h"),
        )
        .count()
        .collect()
    )
    series = defaultdict(list)
    for r in hourly:
        series[r.event_type].append((r.h, r["count"]))
    expected = []
    for et, pts in series.items():
        pts.sort()
        n = len(pts)
        sy = sum(y for _, y in pts)
        syy = sum(y * y for _, y in pts)
        var_n2 = n * syy - sy * sy
        feats = []
        for h, y in pts:
            d = n * y - sy
            feats.append(
                (h, y,
                 1 if d * d > 9 * var_n2 else 0,
                 1 if d * d > 4 * var_n2 and d > 0 else 0,
                 1 if d * d > 4 * var_n2 and d < 0 else 0,
                 1 if d > 0 else 0,
                 1 if d < 0 else 0)
            )
        for i, (h, y, b3, b2u, b2d, up, dn) in enumerate(feats):
            lo3 = max(0, i - 2)
            lo9 = max(0, i - 8)
            r2 = 1 if (sum(f[3] for f in feats[lo3: i + 1]) >= 2
                       or sum(f[4] for f in feats[lo3: i + 1]) >= 2) else 0
            r4 = 1 if (sum(f[5] for f in feats[lo9: i + 1]) == 9
                       or sum(f[6] for f in feats[lo9: i + 1]) == 9) else 0
            if b3 or r2 or r4:
                expected.append((et, h, y, b3, r2, r4))
    expected.sort()
    assert out == expected


# ----------------------------------------------- power analysis


def test_power_sample_size_matches_closed_form(spark, sf_dir):
    """The integer ceiling division must agree with the float
    closed-form n = 2.8^2 (p1 q1 + p2 q2) / 0.02^2 to within the
    1-unit ceiling granularity, and more volume must never DECREASE
    required n for the same rate."""
    rows = _run(spark, sf_dir, "ab_power_sample_size").collect()
    assert rows
    for r in rows:
        p1 = r.pos / r.n
        p2 = p1 + 0.02
        n_float = 2.8 ** 2 * (p1 * (1 - p1) + p2 * (1 - p2)) / 0.02 ** 2
        assert abs(r.n_required_per_arm - math.ceil(n_float)) <= 1
        assert r.p1_ppm == r.pos * 1_000_000 // r.n
        assert r.powered_today == (1 if r.n >= 2 * r.n_required_per_arm else 0)


# -------------------------------------------- bucketed jackknife


def test_jackknife_matches_python_replay(spark, sf_dir):
    out = _run(spark, sf_dir, "ab_jackknife_buckets").collect()
    assert len(out) == 10
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .selectExpr(
            "l_orderkey",
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " AS y",
            "CAST(l_quantity AS BIGINT) AS x",
        )
        .collect()
    )
    buckets = defaultdict(lambda: [0, 0, 0])  # n, sy, sx
    for r in rows:
        b = _h32(f"jk-{r.l_orderkey}") % 10
        buckets[b][0] += 1
        buckets[b][1] += r.y
        buckets[b][2] += r.x
    sy = sum(v[1] for v in buckets.values())
    sx = sum(v[2] for v in buckets.values())
    r_loo = {
        b: (sy - v[1]) * 1_000_000 // (sx - v[2]) for b, v in buckets.items()
    }
    nb = len(r_loo)
    sr = sum(r_loo.values())
    sr2 = sum(v * v for v in r_loo.values())
    jk_var = (nb - 1) * (nb * sr2 - sr * sr) // (nb * nb)
    full = sy * 1_000_000 // sx
    for row in out:
        assert row.n_b == buckets[row.bucket][0]
        assert row.r_loo_e6 == r_loo[row.bucket]
        assert row.ratio_full_e6 == full
        assert row.jk_var_e12 == jk_var
    # leave-one-out ratios bracket the full ratio
    assert min(r_loo.values()) <= full <= max(r_loo.values())


# --------------------------------------------- report-noisy-max


def test_noisy_max_single_winner_and_replay(spark, sf_dir):
    out = _run(spark, sf_dir, "privacy_report_noisy_max").collect()
    assert sum(r.is_winner for r in out) == 1
    counts = {
        r.event_type: r["count"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .count()
        .collect()
    }
    scored = []
    for r in out:
        u = _h32(f"rnm-{r.event_type}")
        mag = 32 if u == 0 else 32 - len(bin(u)[2:])
        noise = mag if u % 2 == 0 else -mag
        assert r.noise == noise
        assert r.noisy_score == counts[r.event_type] + noise
        scored.append((r.noisy_score, r.event_type, r.is_winner))
    winner = max(scored, key=lambda t: (t[0], [-ord(c) for c in t[1]]))
    # argmax with ties broken by event_type ascending
    best = sorted(scored, key=lambda t: (-t[0], t[1]))[0]
    assert best[2] == 1


# ------------------------------------------------------ Kalman


def test_kalman_matches_python_replay_and_gain_converges(spark, sf_dir):
    out = {r.series: r for r in _run(spark, sf_dir, "ts_kalman_1d").collect()}
    assert out
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("series"), F.to_date("ts").alias("d"))
        .count()
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r.series].append((r.d, r["count"]))

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    for name, pts in series.items():
        pts.sort()
        ys = [y for _, y in pts]
        x, p, k, sai = ys[0] * 1_000_000, 64, 0, 0
        for y in ys[1:]:
            pp = p + 4
            k = pp * 1_000_000 // (pp + 64)
            innov = y * 1_000_000 - x
            sai += abs(innov)
            x += tdiv(k * innov, 1_000_000)
            p = (1_000_000 - k) * pp // 1_000_000
        r = out[name]
        assert (r.n_obs, r.estimate_e6, r.p_terminal, r.gain_e6,
                r.sum_abs_innov_e6) == (len(ys), x, p, k, sai)
        # steady-state Riccati: P converges to a fixed point of
        # p = (1-k)(p+Q); with Q=4, R=64 that's ~14 (integer orbit)
        assert 0 < r.p_terminal < 64
        assert 0 < r.gain_e6 < 1_000_000
