"""Semantic invariants of the round-4r operators (trending decay,
seasonal strength, curriculum interleave, calibration stability
slope) — properties the oracle differential can't state."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.functions.intlog import ln_ratio_e3_py
from big_data_final_project_spark.registry import catalog


def _run(spark, sf_dir, name):
    return catalog()[name].fn(spark, sf_dir)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ------------------------------------------------ trending decay


def test_trending_decay_matches_python_replay(spark, sf_dir):
    out = _run(spark, sf_dir, "events_trending_decay").collect()
    assert out
    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr("user_id", "unix_micros(ts) AS us")
        .collect()
    )
    hi = max(r.us for r in ev)
    scores = defaultdict(lambda: [0, 0])
    for r in ev:
        shift = min((hi - r.us) // (24 * 3_600_000_000), 40)
        scores[r.user_id][0] += 1
        scores[r.user_id][1] += 1_000_000 >> shift
    top = sorted(
        ((u, n, s) for u, (n, s) in scores.items()),
        key=lambda t: (-t[2], t[0]),
    )[:20]
    assert [(r.user_id, r.n_events, r.decayed_score_e6) for r in out] == top
    for r in out:
        # decayed mass never exceeds raw count at full weight
        assert r.decayed_score_e6 <= r.n_events * 1_000_000


# -------------------------------------------- seasonal strength


def test_seasonal_strength_bounded_and_nonneg(spark, sf_dir):
    out = _run(spark, sf_dir, "ts_seasonal_strength").collect()
    assert out
    for r in out:
        assert 0 <= r.seasonal_strength_ppm <= 1_000_000
        assert r.n_days > 0
    # removing the dow means can only reduce variance, so strength is
    # strictly positive unless the profile is flat — the synthetic
    # stream has a real weekly pattern in at least one series
    assert any(r.seasonal_strength_ppm > 0 for r in out)


# ------------------------------------------ curriculum interleave


def test_curriculum_interleave_properties(spark, sf_dir):
    out = _run(spark, sf_dir, "pipeline_interleaved_curriculum").collect()
    assert len(out) == 50
    assert [r.position for r in out] == list(range(1, 51))
    # difficulty ramps monotonically WITHIN each source subsequence
    per_source = defaultdict(list)
    for r in out:
        per_source[r.source].append((r.position, r.n_chars, r.rank_in_source))
    for rows in per_source.values():
        rows.sort()
        chars = [c for _, c, _ in rows]
        ranks = [k for _, _, k in rows]
        assert chars == sorted(chars)
        assert ranks == sorted(ranks)
    # the interleave is fair: at any prefix boundary between full
    # rounds, source counts differ by at most 1 while all sources
    # still have supply — check the first full round explicitly
    n_sources = (
        load_table(spark, sf_dir, "documents")
        .select("source")
        .distinct()
        .count()
    )
    first_round = [r.source for r in out[:n_sources]]
    assert len(set(first_round)) == n_sources


# ------------------------------------- calibration stability slope


def test_calibration_slope_matches_python_replay(spark, sf_dir):
    r = _run(spark, sf_dir, "ml_calibration_stability_slope").collect()[0]
    orders = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "o_orderkey",
            "CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS b",
            "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y",
        )
        .collect()
    )
    bins = defaultdict(lambda: [0, 0, 0, 0])  # n_a pos_a n_b pos_b
    for row in orders:
        half = _h32(f"cs-{row.o_orderkey}") % 2
        v = bins[row.b]
        if half == 0:
            v[0] += 1
            v[1] += row.y
        else:
            v[2] += 1
            v[3] += row.y

    def logit(pos, neg):
        return (
            ln_ratio_e3_py(pos, neg)
            if pos >= neg
            else -ln_ratio_e3_py(neg, pos)
        )

    sw = swx = swz = swxx = swxz = 0
    n_bins = 0
    for n_a, pos_a, n_b, pos_b in bins.values():
        if not (0 < pos_a < n_a and 0 < pos_b < n_b):
            continue
        n_bins += 1
        x = logit(pos_a, n_a - pos_a)
        z = logit(pos_b, n_b - pos_b)
        sw += n_b
        swx += n_b * x
        swz += n_b * z
        swxx += n_b * x * x
        swxz += n_b * x * z
    covn = sw * swxz - swx * swz
    varn = sw * swxx - swx * swx
    sgn = -1 if covn < 0 else 1
    slope = sgn * (abs(covn) * 1000 // varn)
    inum = swz * 1000 - slope * swx
    isgn = -1 if inum < 0 else 1
    intercept = isgn * (abs(inum) // (1000 * sw))
    assert (r.n_bins, r.n_holdout_rows) == (n_bins, sw)
    assert (r.slope_e3, r.intercept_e3) == (slope, intercept)
    # the synthetic label is INDEPENDENT of the score, so the bin
    # rates in the two halves are uncorrelated noise: the stability
    # slope must correctly read ~0 (an informative model would sit
    # near 1000 = 1.0) — the metric detecting an uninformative model
    # IS the behavior under test
    assert abs(r.slope_e3) < 500
