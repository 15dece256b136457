"""Semantic invariants of the round-4u operators (worst-slice finder,
mixture rebalance plan, SRM guardrail) — properties the oracle
differential can't state."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.registry import catalog


def _run(spark, sf_dir, name):
    return catalog()[name].fn(spark, sf_dir)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ------------------------------------------------ slice finder


def test_worst_slices_match_python_replay(spark, sf_dir):
    out = _run(spark, sf_dir, "ml_worst_slice_finder").collect()
    assert out
    rows = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "o_orderpriority AS d1",
            "CAST(floor(o_totalprice / 100000.0) AS BIGINT) AS d2",
            "CASE WHEN (o_totalprice > 150000) != (o_orderstatus = 'F')"
            " THEN 1 ELSE 0 END AS err",
        )
        .collect()
    )
    slices = defaultdict(lambda: [0, 0])
    n_all = err_all = 0
    for r in rows:
        n_all += 1
        err_all += r.err
        v = slices[(r.d1, r.d2)]
        v[0] += 1
        v[1] += r.err
    grate = err_all * 1_000_000 // n_all
    expected = []
    for (d1, d2), (n, errs) in slices.items():
        if n < 50 or errs * n_all <= err_all * n:
            continue
        rate = errs * 1_000_000 // n
        expected.append((d1, d2, n, errs, rate, grate, rate - grate))
    expected.sort(key=lambda t: (-t[6], t[0], t[1]))
    expected = expected[:20]
    got = [
        (r.dim1, r.dim2, r.n, r.errs, r.err_rate_ppm,
         r.global_err_rate_ppm, r.gap_ppm)
        for r in out
    ]
    assert got == expected
    for r in out:
        assert r.n >= 50
        assert r.err_rate_ppm > r.global_err_rate_ppm


# ------------------------------------------ mixture rebalance plan


def test_mixture_plan_moves_toward_target(spark, sf_dir):
    out = {r.source: r for r in _run(spark, sf_dir, "curation_mixture_rebalance_plan").collect()}
    assert out
    total = sum(r.n_chars for r in out.values())
    for r in out.values():
        assert r.current_ppm == r.n_chars * 1_000_000 // total
        assert 0 <= r.keep_rate_ppm <= 1_000_000
        assert r.chars_kept <= r.n_chars
        if r.target_ppm >= r.current_ppm:
            # at-or-under target: keep everything
            assert r.keep_rate_ppm == 1_000_000
            assert r.chars_kept == r.n_chars
        else:
            # over target: post-plan share must not exceed target by
            # more than rounding slack relative to the ORIGINAL total
            assert r.chars_kept * 1_000_000 <= (r.target_ppm + 1) * total


# ------------------------------------------------ SRM guardrail


def test_srm_guardrail_replay_and_aa_behavior(spark, sf_dir):
    r = _run(spark, sf_dir, "ab_srm_guardrail").collect()[0]
    keys = [
        row.o_orderkey
        for row in load_table(spark, sf_dir, "orders")
        .select("o_orderkey")
        .collect()
    ]
    n_t = sum(1 for k in keys if _h32(f"srm-{k}") % 2 == 1)
    n = len(keys)
    assert (r.n_t, r.n_c) == (n_t, n - n_t)
    chi2 = (2 * n_t - n) ** 2 * 1_000_000 // n
    assert r.srm_chi2_e6 == chi2
    assert r.srm_detected_05 == (1 if chi2 > 3_841_459 else 0)
    # a sound hash split is an A/A: the guardrail must NOT fire
    assert r.srm_detected_05 == 0
