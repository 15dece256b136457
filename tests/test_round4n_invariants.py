"""Semantic invariants of the round-4n operators (Kaplan-Meier,
growth accounting, pairwise ranking AUC, Fano factor, tiering plan)
— properties the oracle differential can't state."""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.registry import catalog


def _run(spark, sf_dir, name):
    return catalog()[name].fn(spark, sf_dir)


# ------------------------------------------------- Kaplan-Meier


def test_km_matches_python_replay_and_is_monotone(spark, sf_dir):
    out = _run(spark, sf_dir, "ml_survival_kaplan_meier").collect()
    assert out
    spans = (
        load_table(spark, sf_dir, "events")
        .selectExpr("user_id", "CAST(ts AS DATE) AS d")
        .groupBy("user_id")
        .agg({"d": "min"})
        .collect()
    )
    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr("user_id", "CAST(ts AS DATE) AS d")
        .collect()
    )
    per_user = defaultdict(list)
    for r in ev:
        per_user[r.user_id].append(r.d)
    hi = max(r.d for r in ev)
    tbl = defaultdict(lambda: [0, 0])
    for uid, ds in per_user.items():
        dur = (max(ds) - min(ds)).days
        died = 1 if max(ds) <= hi - timedelta(days=7) else 0
        tbl[dur][0 if died else 1] += 1
    total = sum(d + c for d, c in tbl.values())
    s, at_risk = 1_000_000, total
    expected = []
    for t in sorted(tbl):
        d, c = tbl[t]
        s = s * (at_risk - d) // at_risk
        expected.append((t, at_risk, d, c, s))
        at_risk -= d + c
    got = [(r.duration_days, r.n_risk, r.n_events, r.n_censored,
            r.survival_ppm) for r in out]
    assert got == expected
    # survival is monotone nonincreasing and the risk set shrinks
    surv = [r.survival_ppm for r in out]
    assert surv == sorted(surv, reverse=True)
    risks = [r.n_risk for r in out]
    assert risks == sorted(risks, reverse=True)
    assert sum(r.n_censored for r in out) > 0  # censoring is real here


# -------------------------------------------- growth accounting


def test_growth_accounting_identity_and_replay(spark, sf_dir):
    out = _run(spark, sf_dir, "events_growth_accounting").collect()
    assert out
    act = (
        load_table(spark, sf_dir, "events")
        .selectExpr(
            "user_id", "CAST(date_trunc('week', ts) AS DATE) AS w"
        )
        .distinct()
        .collect()
    )
    weeks_by_user = defaultdict(set)
    for r in act:
        weeks_by_user[r.user_id].add(r.w)
    per_week = defaultdict(lambda: [0, 0, 0, 0])  # active new ret res
    churn = defaultdict(int)
    for uid, ws in weeks_by_user.items():
        w0 = min(ws)
        for w in ws:
            v = per_week[w]
            v[0] += 1
            if w == w0:
                v[1] += 1
            elif (w - timedelta(days=7)) in ws:
                v[2] += 1
            else:
                v[3] += 1
            if (w + timedelta(days=7)) not in ws:
                churn[w + timedelta(days=7)] += 1
    for r in out:
        from datetime import date
        w = date(1970, 1, 1) + timedelta(days=r.week_day_epoch)
        a, n, ret, res = per_week[w]
        assert (r.n_active, r.n_new, r.n_retained, r.n_resurrected) == (
            a, n, ret, res)
        assert r.n_churned == churn.get(w, 0)
        # the ledger identity: actives partition exactly
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected


# --------------------------------------- pairwise ranking AUC


def test_pairwise_auc_micro_is_pair_weighted(spark, sf_dir):
    out = _run(spark, sf_dir, "ml_pairwise_ranking_auc").collect()
    assert out
    tot_pairs = sum(2 * r.n_pos * r.n_neg for r in out)
    tot_u = sum(r.u2 for r in out)
    micro = tot_u * 1_000_000 // tot_pairs
    for r in out:
        assert r.micro_auc_ppm == micro
        assert 0 <= r.auc_ppm <= 1_000_000
        assert r.u2 <= 2 * r.n_pos * r.n_neg
    # micro sits inside the per-group AUC envelope
    aucs = [r.auc_ppm for r in out]
    assert min(aucs) <= micro <= max(aucs)


# ------------------------------------------------- Fano factor


def test_fano_factor_matches_python_replay(spark, sf_dir):
    out = _run(spark, sf_dir, "ts_fano_factor").collect()
    assert out
    from pyspark.sql import functions as F

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
    per = defaultdict(list)
    for r in hourly:
        per[r.event_type].append(r["count"])
    for r in out:
        cs = per[r.event_type]
        n, sc, scc = len(cs), sum(cs), sum(c * c for c in cs)
        assert (r.n_hours, r.n_events) == (n, sc)
        assert r.fano_ppm == (n * scc - sc * sc) * 1_000_000 // (n * sc)
        assert r.overdispersed == (1 if n * scc - sc * sc > n * sc else 0)


# ------------------------------------------------ tiering plan


def test_tiering_plan_accounting_consistency(spark, sf_dir):
    rows = {r.tier: r for r in _run(spark, sf_dir, "store_tiering_plan").collect()}
    total_rows = sum(r.n_rows for r in rows.values())
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert total_rows == n_orders  # every row is tiered exactly once
    for r in rows.values():
        assert r.est_bytes > 0
        assert r.monthly_cost_micro_usd >= 0
        assert r.monthly_savings_micro_usd >= 0
        # cost + savings = what the hot tier would have cost
        hot_cost = r.est_bytes * 25_000 // 1_048_576
        assert r.monthly_cost_micro_usd + r.monthly_savings_micro_usd == hot_cost
    if "hot" in rows:
        assert rows["hot"].monthly_savings_micro_usd == 0
