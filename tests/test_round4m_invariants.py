"""Semantic invariants of the round-4m operators (one boosting
round, Markov stationary power, write-audit-publish, log-histogram
percentiles, fairness audit) — properties the oracle differential
can't state."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.registry import catalog


def _run(spark, sf_dir, name):
    return catalog()[name].fn(spark, sf_dir)


# ---------------------------------------------------- GBM round


def test_gbm_round_matches_python_replay(spark, sf_dir):
    rows = {r.stage: r for r in _run(spark, sf_dir, "ml_gbm_one_boost_round").collect()}
    assert set(rows) == {"round1", "round2"}
    data = (
        load_table(spark, sf_dir, "lineitem")
        .selectExpr(
            "CAST(l_quantity AS BIGINT) AS qty",
            "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS disc",
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " AS y",
        )
        .collect()
    )

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    def best(hist):
        vals = sorted(hist)
        nt = sum(n for n, _ in hist.values())
        st = sum(sv for _, sv in hist.values())
        nl = sl = 0
        top = None
        for v in vals:
            n, sv = hist[v]
            nl += n
            sl += sv
            if nl == nt:
                break
            sr, nr = st - sl, nt - nl
            score = sl * sl // nl + sr * sr // nr
            if top is None or score > top[1]:
                top = (v, score, nl, sl, nt, st)
        return top

    h0 = defaultdict(lambda: [0, 0])
    for r in data:
        h0[r.qty][0] += 1
        h0[r.qty][1] += r.y
    v, score, nl, sl, nt, st = best({k: tuple(x) for k, x in h0.items()})
    ml, mr = sl // nl, (st - sl) // (nt - nl)
    g1 = rows["round1"]
    assert (g1.split_val, g1.n_left, g1.n_right, g1.mean_left_cents,
            g1.mean_right_cents, g1.score_per_row) == (
        v, nl, nt - nl, ml, mr, score // nt)
    h1 = defaultdict(lambda: [0, 0])
    for r in data:
        rr = r.y - (ml if r.qty <= v else mr)
        h1[r.disc][0] += 1
        h1[r.disc][1] += rr
    v2, score2, nl2, sl2, nt2, st2 = best({k: tuple(x) for k, x in h1.items()})
    g2 = rows["round2"]
    assert (g2.split_val, g2.n_left, g2.n_right, g2.mean_left_cents,
            g2.mean_right_cents, g2.score_per_row) == (
        v2, nl2, nt2 - nl2, tdiv(sl2, nl2), tdiv(st2 - sl2, nt2 - nl2),
        score2 // nt2)
    # boosting makes progress: stage-1 leaves are real partitions
    assert g1.n_left + g1.n_right == nt


# ------------------------------------------- Markov stationary


def test_markov_stationary_replay_and_mass_conservation(spark, sf_dir):
    out = {r.state: r for r in _run(spark, sf_dir, "events_markov_stationary").collect()}
    assert out
    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) AS us")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.us, r.event_id, r.event_type))
    trans = defaultdict(int)
    for recs in by_user.values():
        recs.sort()
        for a, b in zip(recs, recs[1:]):
            trans[(a[2], b[2])] += 1
    rowsum = defaultdict(int)
    for (s, _), c in trans.items():
        rowsum[s] += c
    pi = {s: 1_000_000 for s in rowsum}
    hist = []
    for _ in range(2):
        nxt = defaultdict(int)
        for (s, d), c in trans.items():
            if s in pi:
                nxt[d] += pi[s] * c // rowsum[s]
        pi = dict(nxt)
        hist.append(dict(pi))
    p1, p2 = hist
    for state, r in out.items():
        assert r.n_out_transitions == rowsum[state]
        assert r.pi1_mass == p1.get(state, 0)
        assert r.pi2_mass == p2.get(state, 0)
    # truncating flows leak at most one unit per edge per step
    total0 = 1_000_000 * len(rowsum)
    assert total0 - len(trans) <= sum(p1.values()) <= total0


# ------------------------------------------ write-audit-publish


def test_wap_gate_consistency(spark, sf_dir):
    rows = {r.rule: r for r in _run(spark, sf_dir, "store_write_audit_publish").collect()}
    assert set(rows) == {
        "volume_within_3_sigma", "no_null_keys", "no_duplicate_keys",
        "price_within_2x_history",
    }
    publish = {r.publish for r in rows.values()}
    assert len(publish) == 1  # the verdict is a single AND
    assert publish.pop() == min(r.pass_ if hasattr(r, "pass_") else r["pass"]
                                for r in rows.values())
    # the synthetic keys are unique and non-null: those audits pass
    assert rows["no_null_keys"]["pass"] == 1
    assert rows["no_duplicate_keys"]["pass"] == 1


# --------------------------------- log-histogram percentiles


def test_log_histogram_percentiles_bracket_exact(spark, sf_dir):
    out = {r.pct: r for r in _run(spark, sf_dir, "agg_log_histogram_percentiles").collect()}
    assert set(out) == {50, 95, 99}
    cents = sorted(
        r.c
        for r in load_table(spark, sf_dir, "orders")
        .selectExpr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c"
        )
        .collect()
        if r.c > 0
    )
    n = len(cents)
    for p, r in out.items():
        exact = cents[(n * p + 99) // 100 - 1]  # ceil-rank percentile
        # the sketch's bucket must CONTAIN the exact percentile value
        assert r.lower_cents <= exact <= r.upper_cents
        assert r.total == n
        # monotone: cumulative coverage reaches the target
        assert r.n_at_or_below * 100 >= p * n


# ------------------------------------------------ fairness audit


def test_fairness_audit_matches_python_replay(spark, sf_dir):
    out = _run(spark, sf_dir, "ml_threshold_fairness_audit").collect()
    assert out
    rows = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "o_orderpriority AS grp",
            "CASE WHEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
            " AS BIGINT) > 15000000 THEN 1 ELSE 0 END AS yhat",
            "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y",
        )
        .collect()
    )
    per = defaultdict(lambda: [0, 0, 0, 0, 0])  # n tp fp fn tn
    for r in rows:
        v = per[r.grp]
        v[0] += 1
        if r.yhat and r.y:
            v[1] += 1
        elif r.yhat:
            v[2] += 1
        elif r.y:
            v[3] += 1
        else:
            v[4] += 1
    tprs, fprs, sels = {}, {}, {}
    for g, (n, tp, fp, fn, tn) in per.items():
        tprs[g] = tp * 1_000_000 // (tp + fn)
        fprs[g] = fp * 1_000_000 // (fp + tn)
        sels[g] = (tp + fp) * 1_000_000 // n
    for r in out:
        n, tp, fp, fn, tn = per[r.grp]
        assert (r.n, r.tp, r.fp, r.fn, r.tn) == (n, tp, fp, fn, tn)
        assert (r.tpr_ppm, r.fpr_ppm, r.sel_ppm) == (
            tprs[r.grp], fprs[r.grp], sels[r.grp])
        assert r.tpr_gap_ppm == max(tprs.values()) - min(tprs.values())
        assert r.fpr_gap_ppm == max(fprs.values()) - min(fprs.values())
        assert r.selection_gap_ppm == max(sels.values()) - min(sels.values())
        # rates are probabilities
        for v in (r.tpr_ppm, r.fpr_ppm, r.sel_ppm):
            assert 0 <= v <= 1_000_000
