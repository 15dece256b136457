"""Semantic invariants of the round-4g operators (calibration /
uncertainty / sequential testing / LDP / explanation families) —
properties the oracle differential can't state."""

from __future__ import annotations

import hashlib
from fractions import Fraction

import pandas as pd

from big_data_final_project_spark.plans.audit import audit
from big_data_final_project_spark.registry import catalog


def _run(spark, sf_dir, name):
    return catalog()[name].fn(spark, sf_dir)


def _plan(spark, sf_dir, name):
    return audit(catalog()[name].fn(spark, sf_dir))


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ------------------------------------------------- isotonic calibration


def _pav_per_bin(ns, ps):
    """Per-bin fitted values from the classic stack-based
    pool-adjacent-violators merge, as exact Fractions — the
    imperative semantics the relational minimax formulation claims
    to reproduce."""
    blocks: list[list[int]] = []  # [n, pos, width]
    for n, p in zip(ns, ps):
        blocks.append([n, p, 1])
        while len(blocks) >= 2 and Fraction(
            blocks[-2][1], blocks[-2][0]
        ) >= Fraction(blocks[-1][1], blocks[-1][0]):
            n2, p2, w2 = blocks.pop()
            blocks[-1][0] += n2
            blocks[-1][1] += p2
            blocks[-1][2] += w2
    vals = []
    for n, p, w in blocks:
        vals.extend([Fraction(p, n)] * w)
    return vals


def test_isotonic_matches_pav_and_is_monotone(spark, sf_dir):
    rows = (
        _run(spark, sf_dir, "ml_isotonic_calibration")
        .orderBy("bin_id")
        .collect()
    )
    assert rows
    ns = [r.n for r in rows]
    ps = [r.pos for r in rows]
    expect = [int(v * 1_000_000) for v in _pav_per_bin(ns, ps)]
    got = [r.iso_ppm for r in rows]
    assert got == expect
    assert got == sorted(got)  # monotone non-decreasing by construction
    # PAV preserves total mass: sum(n_i * iso_i) == sum(pos) exactly
    mass = sum(
        n * v for n, v in zip(ns, _pav_per_bin(ns, ps))
    )
    assert mass == sum(ps)


# --------------------------------------------------- conformal interval


def test_conformal_rank_and_coverage(spark, sf_dir):
    r = _run(spark, sf_dir, "ml_conformal_interval").collect()[0]
    # conformal rank: k = ceil(0.9 * (n_cal + 1)), capped at n_cal
    assert r.k == min((9 * (r.n_cal + 1) + 9) // 10, r.n_cal)
    assert r.q_hat > 0
    assert r.covered <= r.n_test
    # distribution-free guarantee is >= 90% in expectation; allow
    # sampling slack at small SF but catch gross miscalibration
    assert 820_000 <= r.coverage_ppm <= 1_000_000


# ------------------------------------------------------ SPRT sequential

_C1 = 0.22314355131420976
_C0 = -0.06453852113757118
_A = 2.9444389791664403


def test_sprt_matches_sequential_replay(spark, sf_dir):
    out = _run(spark, sf_dir, "ab_sprt_sequential").collect()
    assert len(out) == 1
    r = out[0]
    ev = (
        catalog()["ab_sprt_sequential"]
        .fn.__globals__["load_table"](spark, sf_dir, "events")
        .select("ts", "event_id", "event_type")
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    s = 0
    hit = None
    for i, et in enumerate(ev["event_type"], start=1):
        s += 1 if et == "purchase" else 0
        llr = float(s) * _C1 + float(i - s) * _C0
        if llr >= _A or llr <= -_A:
            hit = (i, s, llr, "reject_h0" if llr >= _A else "accept_h0")
            break
    assert hit is not None
    assert (r.n_seen, r.s_seen, r.decision) == (hit[0], hit[1], hit[3])
    assert abs(r.llr - hit[2]) == 0.0  # bit-identical staging
    assert r.n_total == len(ev)


# ------------------------------------------------- randomized response


def test_randomized_response_mass_conservation(spark, sf_dir):
    rows = _run(spark, sf_dir, "privacy_randomized_response").collect()
    assert len(rows) == 5
    n_all = sum(r.true_n for r in rows)
    # debiased numerators sum to exactly 11 * n: the estimator
    # conserves total mass (sum of estimates == n)
    assert sum(r.est_num for r in rows) == 11 * n_all
    assert sum(r.obs_n for r in rows) == n_all
    for r in rows:
        assert r.est_num == 16 * r.obs_n - n_all
        assert r.bias_x11 == r.est_num - 11 * r.true_n


# ------------------------------------------------- two-feature Shapley


def test_shapley_efficiency_property(spark, sf_dir):
    rows = _run(spark, sf_dir, "ml_shapley_two_features").collect()
    assert rows
    for r in rows:
        # phi_1 + phi_2 == f(cell) - E[y] (efficiency), up to the one
        # reassociation the /2 staging introduces
        assert abs((r.phi_returnflag + r.phi_linestatus) - r.lift) < 1e-9


# ------------------------------------------------------- learning curve


def test_learning_curve_nested_subsets_replay(spark, sf_dir):
    rows = {
        r.frac: r
        for r in _run(spark, sf_dir, "ml_learning_curve").collect()
    }
    assert sorted(rows) == [10, 25, 50, 100]
    # nested subsets: strictly more training data as frac grows
    ns = [rows[f].n_train for f in (10, 25, 50, 100)]
    assert ns == sorted(ns) and ns[0] > 0
    # same test split at every curve point
    assert len({rows[f].n_test for f in rows}) == 1

    li = (
        catalog()["ml_learning_curve"]
        .fn.__globals__["load_table"](spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
        .toPandas()
    )
    key = li.l_orderkey.astype(str) + "-" + li.l_linenumber.astype(str)
    li["y"] = (li.l_extendedprice.round(2) * 100).round().astype("int64")
    li["u_t"] = key.map(lambda k: _h32("lc-t-" + k) % 5)
    li["b"] = key.map(lambda k: _h32("lc-b-" + k) % 100)
    test = li[li.u_t == 0]
    pool = li[li.u_t != 0]
    for frac, r in rows.items():
        tr = pool[pool.b < frac]
        assert r.n_train == len(tr)
        pred = (
            tr.groupby("l_returnflag")["y"].agg(["sum", "count"])
            .assign(p=lambda d: d["sum"] // d["count"])["p"]
        )
        errs = (test.y - test.l_returnflag.map(pred)).abs()
        assert r.mae_milli_cents == int(errs.sum()) * 1000 // len(test)


# ---------------------------------------------------- naive bayes apply


def test_naive_bayes_apply_matches_fraction_scores(spark, sf_dir):
    rows = _run(spark, sf_dir, "ml_naive_bayes_apply").collect()
    assert rows
    o = (
        catalog()["ml_naive_bayes_apply"]
        .fn.__globals__["load_table"](spark, sf_dir, "orders")
        .select("o_orderstatus", "o_orderpriority", "o_orderdate")
        .toPandas()
    )
    o["f2"] = pd.to_datetime(o.o_orderdate).dt.dayofweek.map(
        lambda d: (d + 1) % 7  # pandas Mon=0 -> dow Sun=0
    )
    nc = o.o_orderstatus.value_counts().to_dict()
    n_by_f1 = o.groupby(["o_orderpriority", "o_orderstatus"]).size()
    n_by_f2 = o.groupby(["f2", "o_orderstatus"]).size()
    classes = ["F", "O", "P"]
    for r in rows:
        scores = {}
        for c in classes:
            num = (
                (nc.get(c, 0) + 1)
                * (n_by_f1.get((r.f1, c), 0) + 1)
                * (n_by_f2.get((r.f2, c), 0) + 1)
            )
            den = (nc.get(c, 0) + 5) * (nc.get(c, 0) + 7)
            scores[c] = Fraction(num, den)
        best = max(classes, key=lambda c: (scores[c], -classes.index(c)))
        # ties resolve to the alphabetically-first class on both sides
        top = scores[best]
        winners = [c for c in classes if scores[c] == top]
        assert r.pred_class == winners[0]
        assert 0 <= r.acc_ppm <= 1_000_000
        assert r.acc_ppm == r.n_correct * 1_000_000 // r.n_cell


# ------------------------------------------------------------ plan shapes


def test_round4g_plan_shapes(spark, sf_dir):
    # conformal: fact-side joins are broadcasts of one-row frames;
    # no cartesian between large inputs (crossJoin of 1-row frames
    # plans as BroadcastNestedLoopJoin, which audit() counts apart)
    for name in (
        "ml_shapley_two_features",
        "ml_learning_curve",
        "privacy_randomized_response",
    ):
        p = _plan(spark, sf_dir, name)
        assert p.cartesian_products == 0, name
    # learning curve: the fact table is scanned for partials + test
    # split, never once per curve point
    p = _plan(spark, sf_dir, "ml_learning_curve")
    assert p._nodes("Scan parquet") <= 3


# ------------------------------------------------- two-feature OLS


def test_linreg_two_features_matches_lstsq(spark, sf_dir):
    import numpy as np

    r = _run(spark, sf_dir, "ml_linreg_two_features").collect()[0]
    li = (
        catalog()["ml_linreg_two_features"]
        .fn.__globals__["load_table"](spark, sf_dir, "lineitem")
        .select("l_quantity", "l_discount", "l_extendedprice")
        .toPandas()
    )
    X = np.column_stack(
        [np.ones(len(li)), li.l_quantity.values, li.l_discount.values]
    )
    beta, *_ = np.linalg.lstsq(X, li.l_extendedprice.values, rcond=None)
    assert abs(r.beta0 - beta[0]) < 1e-4 * max(1.0, abs(beta[0]))
    assert abs(r.beta1 - beta[1]) < 1e-4 * max(1.0, abs(beta[1]))
    assert abs(r.beta2 - beta[2]) < 1e-4 * max(1.0, abs(beta[2]))
    assert 0.0 <= r.r2 <= 1.0
    assert r.n_rows == len(li)


# -------------------------------------------- permutation importance


def test_permutation_importance_replay(spark, sf_dir):
    rows = {
        r.feature: r
        for r in _run(spark, sf_dir, "ml_permutation_importance").collect()
    }
    assert set(rows) == {"none", "l_returnflag", "l_linestatus"}
    assert rows["none"].importance_milli == 0
    li = (
        catalog()["ml_permutation_importance"]
        .fn.__globals__["load_table"](spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag",
                "l_linestatus", "l_extendedprice")
        .toPandas()
    )
    li["y"] = (li.l_extendedprice.round(2) * 100).round().astype("int64")
    key = li.l_orderkey.astype(str) + "-" + li.l_linenumber.astype(str)
    li["bkt"] = key.map(lambda k: _h32("pi-" + k) % 64)
    li = li.sort_values(
        ["bkt", "l_orderkey", "l_linenumber", "l_returnflag",
         "l_linestatus", "y"]
    ).reset_index(drop=True)
    li["rn"] = li.groupby("bkt").cumcount() + 1
    cnt = li.groupby("bkt")["rn"].transform("max")
    pred = (
        li.groupby(["l_returnflag", "l_linestatus"])["y"]
        .agg(["sum", "count"])
        .assign(p=lambda d: d["sum"] // d["count"])["p"]
    )
    donor1 = li.set_index(["bkt", "rn"])["l_returnflag"]
    donor2 = li.set_index(["bkt", "rn"])["l_linestatus"]
    f1p = donor1.loc[
        list(zip(li.bkt, (li.rn % cnt) + 1))
    ].values
    f2p = donor2.loc[
        list(zip(li.bkt, ((li.rn + 1) % cnt) + 1))
    ].values
    n = len(li)

    def mae(f1s, f2s):
        p = pred.loc[list(zip(f1s, f2s))].values
        return int((li.y.values - p).__abs__().sum()) * 1000 // n

    assert rows["none"].mae_milli_cents == mae(
        li.l_returnflag.values, li.l_linestatus.values
    )
    assert rows["l_returnflag"].mae_milli_cents == mae(
        f1p, li.l_linestatus.values
    )
    assert rows["l_linestatus"].mae_milli_cents == mae(
        li.l_returnflag.values, f2p
    )


# ------------------------------------------------------ multiclass F1


def test_multiclass_f1_identities(spark, sf_dir):
    rows = {r.cls: r for r in _run(spark, sf_dir, "ml_multiclass_f1").collect()}
    assert set(rows) == {"A", "N", "R", "macro", "micro"}
    # single-label multiclass: pooled FP == pooled FN, so micro
    # precision == recall == F1 == accuracy
    mi = rows["micro"]
    assert mi.fp == mi.fn
    assert mi.prec_ppm == mi.rec_ppm == mi.f1_ppm
    per = [rows[c] for c in ("A", "N", "R")]
    assert mi.tp == sum(r.tp for r in per)
    # macro F1 is the floor-mean of the per-class F1s
    assert rows["macro"].f1_ppm == sum(r.f1_ppm for r in per) // 3
    # per-class support identity: tp + fn == class row count
    li = catalog()["ml_multiclass_f1"].fn.__globals__["load_table"](
        spark, sf_dir, "lineitem"
    )
    support = {
        r["l_returnflag"]: r["cnt"]
        for r in li.groupBy("l_returnflag").count()
        .withColumnRenamed("count", "cnt").collect()
    }
    for c in ("A", "N", "R"):
        assert rows[c].tp + rows[c].fn == support[c]


# --------------------------------------------------- cost threshold


def test_cost_threshold_is_argmin(spark, sf_dir):
    rows = _run(spark, sf_dir, "ml_cost_threshold").collect()
    assert rows
    best = min(r.cost_units for r in rows)
    for r in rows:
        assert r.cost_units == r.fp * 1 + r.fn * 5
        assert (r.is_optimal == 1) == (r.cost_units == best)
    # fp falls and fn rises as the threshold climbs
    by_bin = sorted(rows, key=lambda r: r.bin_id)
    fps = [r.fp for r in by_bin]
    fns = [r.fn for r in by_bin]
    assert fps == sorted(fps, reverse=True)
    assert fns == sorted(fns)


# ------------------------------------------------- curation sweep


def test_filter_sweep_monotone_and_exact(spark, sf_dir):
    rows = sorted(
        _run(spark, sf_dir, "curation_filter_sweep").collect(),
        key=lambda r: r.min_chars,
    )
    assert [r.min_chars for r in rows] == [50, 100, 200, 300, 400]
    docs = catalog()["curation_filter_sweep"].fn.__globals__["load_table"](
        spark, sf_dir, "documents"
    )
    kept = [r.kept_docs for r in rows]
    assert kept == sorted(kept, reverse=True)
    # spot-check one point against a direct filter count
    direct = docs.filter("n_chars >= 200").count()
    assert {r.min_chars: r.kept_docs for r in rows}[200] == direct


# --------------------------------------------------- dominant period


def test_dominant_period_is_argmax_of_full_acf(spark, sf_dir):
    import numpy as np

    rows = {
        r.event_type: r
        for r in _run(spark, sf_dir, "ts_dominant_period").collect()
    }
    assert rows
    ev = (
        catalog()["ts_dominant_period"]
        .fn.__globals__["load_table"](spark, sf_dir, "events")
        .selectExpr("event_type", "to_date(ts) AS day")
        .groupBy("event_type", "day")
        .count()
        .toPandas()
    )
    for et, r in rows.items():
        x = (
            ev[ev.event_type == et]
            .sort_values("day")["count"]
            .astype("int64")
            .values
        )
        n, s = len(x), int(x.sum())
        dev = n * x - s
        den = int((dev * dev).sum())
        best = None
        for lag in range(1, 15):
            if lag >= n:
                break
            num = int((dev[:-lag] * dev[lag:]).sum())
            acf = num / den
            if best is None or acf > best[1] + 0 or (
                acf == best[1] and lag < best[0]
            ):
                if best is None or acf > best[1]:
                    best = (lag, acf, num)
        assert r.lag == best[0]
        assert r.num == best[2]
        assert r.den == den
        assert r.acf <= 1.0 + 1e-12
