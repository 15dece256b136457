"""Semantic invariants of the round-4e operators — properties the
oracle differential can't state (it proves Spark == DuckDB; these
prove both mean what each operator claims)."""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.registry import catalog
from big_data_final_project_spark.plans.audit import audit


def _run(spark, sf_dir, name):
    return catalog()[name].fn(spark, sf_dir)


def _plan(spark, sf_dir, name):
    return audit(catalog()[name].fn(spark, sf_dir))


def test_decision_stump_brute_force_gini(spark, sf_dir):
    rows = {r["split_qty"]: r for r in _run(spark, sf_dir, "ml_decision_stump").collect()}
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_quantity", "l_returnflag")
        .toPandas()
    )
    li["qty"] = li.l_quantity.astype("int64")
    li["pos"] = (li.l_returnflag == "R").astype("int64")
    nt, pt = len(li), int(li.pos.sum())
    best = None
    for t in sorted(li.qty.unique())[:-1]:
        left = li[li.qty <= t]
        nl, pl = len(left), int(left.pos.sum())
        nr, pr = nt - nl, pt - pl
        g = (nl * nl - pl * pl - (nl - pl) ** 2) / (nl * nt) + (
            nr * nr - pr * pr - (nr - pr) ** 2
        ) / (nr * nt)
        r = rows[t]
        assert (r["n_left"], r["pos_left"], r["n_right"], r["pos_right"]) == (
            nl,
            pl,
            nr,
            pr,
        )
        assert abs(r["gini_weighted"] - g) < 1e-12
        best = g if best is None else min(best, g)
    flagged = [r for r in rows.values() if r["is_best"] == 1]
    assert flagged and all(
        abs(r["gini_weighted"] - best) < 1e-12 for r in flagged
    )


def test_bootstrap_ci_brackets_mean(spark, sf_dir):
    for r in _run(spark, sf_dir, "ml_bootstrap_ci").collect():
        # a 2nd/31st-of-32 order-statistic interval almost surely
        # brackets the point estimate; at minimum it must be ordered
        assert r["ci_lo"] <= r["ci_hi"]
        assert r["n"] > 0


def test_rrf_scores_consistent(spark, sf_dir):
    rows = _run(spark, sf_dir, "ml_rank_fusion_rrf").collect()
    assert 1 <= len(rows) <= 20  # min(20, |suppliers|) rows
    for r in rows:
        assert r["rrf_score"] == 10**12 // (60 + r["rank_rev"]) + 10**12 // (
            60 + r["rank_cnt"]
        )
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_median_bisect_is_exact_median(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    li["cents"] = (
        (li.l_extendedprice.astype("float64") * 100).round().astype("int64")
    )
    for r in _run(spark, sf_dir, "agg_median_bisect").collect():
        vals = sorted(li[li.l_returnflag == r["l_returnflag"]].cents)
        assert r["n"] == len(vals)
        assert r["median_cents"] == vals[(len(vals) + 1) // 2 - 1]


def test_max_drawdown_pandas_replay(spark, sf_dir):
    e = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "ts", "event_id", "value")
        .toPandas()
    )
    e["cents"] = (e.value.astype("float64") * 100).round().astype("int64")
    for r in _run(spark, sf_dir, "ts_max_drawdown").collect():
        g = e[e.event_type == r["event_type"]].sort_values(["ts", "event_id"])
        dd = g.cents.cummax() - g.cents
        assert r["max_drawdown_cents"] == int(dd.max())
        assert r["n"] == len(g)


def test_max_concurrency_pandas_sweep(spark, sf_dir):
    rows = _run(spark, sf_dir, "ts_max_concurrency").collect()
    o = load_table(spark, sf_dir, "orders").toPandas()
    c = load_table(spark, sf_dir, "customer").toPandas()
    n = load_table(spark, sf_dir, "nation").toPandas()
    r_ = load_table(spark, sf_dir, "region").toPandas()
    j = (
        o.merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
        .merge(r_, left_on="n_regionkey", right_on="r_regionkey")
    )
    j["e"] = j.o_orderdate + pd.to_timedelta(j.o_orderkey % 30 + 1, unit="D")
    for row in rows:
        g = j[j.r_name == row["region"]]
        deltas = pd.concat(
            [
                pd.DataFrame({"t": g.o_orderdate, "d": 1}),
                pd.DataFrame({"t": g.e, "d": -1}),
            ]
        ).sort_values(["t", "d"])
        conc = deltas.d.cumsum()
        assert row["peak_concurrency"] == int(conc.max())
        assert row["n_intervals"] == len(g)


def test_skyline_quadratic_dominance(spark, sf_dir):
    sky = {
        (r["l_suppkey"], r["rev_cents"], r["qty_x100"])
        for r in _run(spark, sf_dir, "agg_skyline_2d").collect()
    }
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    li["cents"] = (
        (li.l_extendedprice.astype("float64") * 100).round().astype("int64")
    )
    st = li.groupby("l_suppkey").agg(
        rev=("cents", "sum"), sq=("l_quantity", "sum"), n=("cents", "size")
    )
    st["q100"] = (st.sq.astype("int64") * 100) // st.n
    pts = list(zip(st.index, st.rev, st.q100))
    expect = {
        (k, x, y)
        for k, x, y in pts
        if not any(
            (x2 >= x and y2 <= y and (x2 > x or y2 < y))
            for _, x2, y2 in pts
        )
    }
    assert sky == expect


def test_largest_remainder_sums_to_budget(spark, sf_dir):
    rows = _run(spark, sf_dir, "agg_alloc_largest_remainder").collect()
    assert sum(r["alloc"] for r in rows) == 1_000_000
    assert all(r["alloc"] in (r["quota"], r["quota"] + 1) for r in rows)


def test_rolling_corr_pandas_compare(spark, sf_dir):
    rows = _run(spark, sf_dir, "ts_rolling_corr").collect()
    e = load_table(spark, sf_dir, "events").toPandas()
    e["cents"] = (e.value.astype("float64") * 100).round().astype("int64")
    e["bucket"] = e.ts.dt.floor("h")
    hourly = (
        e.groupby(["event_type", "bucket"])
        .agg(x=("cents", "size"), y=("cents", "sum"))
        .reset_index()
        .sort_values(["event_type", "bucket"])
    )
    for r in rows[:50]:
        g = hourly[hourly.event_type == r["event_type"]].reset_index(drop=True)
        i = g.index[g.bucket == r["bucket"]][0]
        win = g.iloc[i - 6 : i + 1]
        assert len(win) == 7
        ref = win.x.astype("float64").corr(win.y.astype("float64"))
        if r["corr_7h"] is not None:
            assert abs(r["corr_7h"] - ref) < 1e-9


def test_two_hop_min_plus_brute_force(spark, sf_dir):
    rows = _run(spark, sf_dir, "graph_two_hop_min_plus").collect()
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    o = load_table(spark, sf_dir, "orders").toPandas()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["cents"] = (
        (j.l_extendedprice.astype("float64") * 100).round().astype("int64")
    )
    edges = (
        j.groupby(["l_partkey", "o_custkey"])
        .cents.min()
        .reset_index()
        .rename(columns={"l_partkey": "part", "o_custkey": "cust"})
    )
    deg = edges.groupby("part").size()
    edges = edges[edges.part.isin(deg[deg <= 40].index)]
    best = {}
    for part, g in edges.groupby("part"):
        recs = list(g[["cust", "cents"]].itertuples(index=False))
        for i, (c1, w1) in enumerate(recs):
            for c2, w2 in recs[i + 1 :]:
                a, b = min(c1, c2), max(c1, c2)
                cur = best.get((a, b))
                best[(a, b)] = min(cur, w1 + w2) if cur else w1 + w2
    expect = sorted(
        ((v, a, b) for (a, b), v in best.items())
    )[:20]
    got = [(r["min_cost_cents"], r["c1"], r["c2"]) for r in rows]
    assert got == expect


def test_prefix_filter_threshold_integrality(spark, sf_dir):
    rows = _run(spark, sf_dir, "dedup_prefix_filter_join").collect()
    for r in rows:
        assert 2 * r["isect"] >= r["uni"]
        assert r["uni"] == r["n_a"] + r["n_b"] - r["isect"]
        assert r["doc_a"] < r["doc_b"]


def test_rolling_median_is_frame_median(spark, sf_dir):
    rows = _run(spark, sf_dir, "window_rolling_median").collect()
    by_series: dict[str, list] = {}
    for r in rows:  # rows arrive ordered (event_type, day)
        hist = by_series.setdefault(r["event_type"], [])
        hist.append(r["cents"])
        win = sorted(hist[-7:])
        assert r["n_in_window"] == len(win)
        assert r["median_cents"] == win[(len(win) + 1) // 2 - 1]


def test_kmv_estimate_quality(spark, sf_dir):
    r = _run(spark, sf_dir, "agg_kmv_distinct").collect()[0]
    if r["kk"] < 256:
        assert r["est_distinct"] == r["true_distinct"]
    else:
        # KMV with k=256 has ~6% relative sd; 5 sigma as the gate
        assert (
            abs(r["est_distinct"] - r["true_distinct"])
            <= 0.35 * r["true_distinct"]
        )


def test_incremental_join_split_is_partition(spark, sf_dir):
    # the four bilinear terms must partition the join exactly:
    # total order count across nations == orders with a matching
    # customer (the oracle equivalence proves values; this pins the
    # no-loss/no-dup accounting independently)
    rows = _run(spark, sf_dir, "store_incremental_join").collect()
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n_join = o.join(c, o.o_custkey == c.c_custkey).count()
    assert sum(r["n_orders"] for r in rows) == n_join


def test_longest_streak_user_accounting(spark, sf_dir):
    rows = _run(spark, sf_dir, "events_longest_streak").collect()
    n_users = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_users"] for r in rows) == n_users
    assert all(r["streak_days"] >= 1 for r in rows)


def test_vocab_coverage_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "curation_vocab_coverage").collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert 0 <= r["oov_ppm"] <= 1_000_000


def test_round4e_plan_shapes(spark, sf_dir):
    # stump: fact collapses to the value histogram in one shuffle;
    # windows run on it; no joins at all
    p = _plan(spark, sf_dir, "ml_decision_stump")
    assert p.broadcast_joins == 0 and p.sortmerge_joins == 0
    assert p.cartesian_products == 0
    # concurrency sweep: all-broadcast star on the lookup side
    p = _plan(spark, sf_dir, "ts_max_concurrency")
    assert p.broadcast_joins >= 3, p.text
    assert p.cartesian_products == 0
    # RRF and the min-plus top-20 must be top-k merges, not sorts
    for name in ("ml_rank_fusion_rrf", "graph_two_hop_min_plus"):
        p = _plan(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in p.text, name
        assert p.cartesian_products == 0
    # KMV: the 256-row cut is a top-k merge, no global sort
    p = _plan(spark, sf_dir, "agg_kmv_distinct")
    assert "TakeOrderedAndProject" in p.text
    # vocab probe is broadcast, never a shuffle join
    p = _plan(spark, sf_dir, "curation_vocab_coverage")
    assert p.broadcast_joins >= 1 and p.sortmerge_joins == 0
    # incremental join: ONE tagged broadcast join computes all four
    # bilinear terms as groups (VERDICT r7 #2: the 4-branch form
    # re-scanned orders x5 / customer x4) — dimension broadcasts,
    # no sort-merge, no extra same-path scans beyond the cutoff agg
    p = _plan(spark, sf_dir, "store_incremental_join")
    assert p.broadcast_joins >= 1, p.text
    assert p.sortmerge_joins == 0, p.text
    assert p.cartesian_products == 0
    assert len(re.findall(r"^\(\d+\) +Scan parquet", p.text, re.M)) <= 3, p.text


def test_bridge_effects_sum_to_delta(spark, sf_dir):
    for r in _run(spark, sf_dir, "agg_bridge_price_volume").collect():
        if r["q1"] and r["q2"]:
            assert (
                abs(r["volume_effect"] + r["price_effect"] - r["delta_cents"])
                < 1e-6 * max(1, abs(r["delta_cents"]))
            )


def test_roc_curve_monotone_and_ends(spark, sf_dir):
    rows = _run(spark, sf_dir, "ml_roc_curve").collect()
    # rows ordered threshold DESC: tp/fp cumulative -> nondecreasing
    tps = [r["tp"] for r in rows]
    fps = [r["fp"] for r in rows]
    assert tps == sorted(tps) and fps == sorted(fps)
    assert rows[-1]["tpr_ppm"] == 1_000_000
    assert rows[-1]["fpr_ppm"] == 1_000_000


def test_cohort_ltv_monotone_per_cohort(spark, sf_dir):
    rows = _run(spark, sf_dir, "events_cohort_ltv").collect()
    seen: dict = {}
    for r in rows:  # ordered (cohort_week, week_k)
        prev = seen.get(r["cohort_week"])
        assert r["cum_rev_cents"] >= (prev or 0) or r["rev_cents"] < 0
        seen[r["cohort_week"]] = r["cum_rev_cents"]
        assert r["week_k"] >= 0


def test_quantiles_bisect_matches_sorted_ranks(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    li["cents"] = (
        (li.l_extendedprice.astype("float64") * 100).round().astype("int64")
    )
    for r in _run(spark, sf_dir, "agg_quantiles_bisect").collect():
        vals = sorted(li[li.l_returnflag == r["l_returnflag"]].cents)
        k = (len(vals) * r["q"] + 99) // 100
        assert r["k"] == k and r["n"] == len(vals)
        assert r["value_cents"] == vals[k - 1]


def test_split_gain_consistent_with_stump(spark, sf_dir):
    allf = {
        r["feature"]: r
        for r in _run(spark, sf_dir, "ml_split_gain_all_features").collect()
    }
    stump = _run(spark, sf_dir, "ml_decision_stump").collect()
    best = min(
        (r for r in stump if r["is_best"] == 1),
        key=lambda r: r["split_qty"],
    )
    q = allf["quantity"]
    assert q["best_split"] == best["split_qty"]
    assert abs(q["gini_split"] - best["gini_weighted"]) < 1e-12
    for r in allf.values():
        assert r["gain"] >= -1e-12  # split never worse than root


def test_winsorized_mean_bounds(spark, sf_dir):
    for r in _run(spark, sf_dir, "agg_winsorized_mean").collect():
        assert r["p05_cents"] <= r["winsorized_mean_cents"] <= r["p95_cents"]
        assert r["n_clamped"] <= r["n"]


def test_simhash_pairs_hamming_and_banding(spark, sf_dir):
    rows = _run(spark, sf_dir, "dedup_simhash_pairs").collect()
    for r in rows:
        assert 0 <= r["hamming"] <= 3
        assert r["doc_a"] < r["doc_b"]
    # pigeonhole losslessness is proven by the unfiltered quadratic
    # oracle; here pin the planted near-dups are actually caught:
    # identical docs must appear at hamming 0 if any text repeats
    d = load_table(spark, sf_dir, "documents").toPandas()
    dup_groups = d.groupby(d.text.str.lower().str.strip()).doc_id.apply(list)
    expected0 = {
        (min(a, b), max(a, b))
        for ids in dup_groups
        if len(ids) > 1
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
    }
    got = {(r["doc_a"], r["doc_b"]) for r in rows if r["hamming"] == 0}
    assert expected0 <= got


def test_absence_audit_accounting(spark, sf_dir):
    rows = _run(spark, sf_dir, "events_absence_audit").collect()
    e = load_table(spark, sf_dir, "events").toPandas()
    e = e[e.user_id.notna()]
    hi = e.ts.max()
    last = e.groupby("user_id").ts.max()
    silent = last[last <= hi - pd.Timedelta(days=7)]
    assert len(rows) == min(100, len(silent))
    for r in rows:
        assert r["days_silent"] >= 7
        assert last[r["user_id"]] == r["last_ts"]


def test_ratio_delta_method_sanity(spark, sf_dir):
    rows = _run(spark, sf_dir, "ab_ratio_delta_method").collect()
    assert {r["arm"] for r in rows} == {"treat", "control"}
    n_users = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        assert r["var_delta"] >= 0
        assert abs(r["se_delta"] ** 2 - r["var_delta"]) < 1e-18 + 1e-9 * r["var_delta"]


def test_round4e3_plan_shapes(spark, sf_dir):
    # simhash pairing: banded self-join, no cartesian; signature
    # build is joinless aggregation
    p = _plan(spark, sf_dir, "dedup_simhash_pairs")
    assert p.cartesian_products == 0
    # absence audit: frontier broadcast + top-k merge, no sort-merge
    p = _plan(spark, sf_dir, "events_absence_audit")
    assert "TakeOrderedAndProject" in p.text
    assert p.sortmerge_joins == 0
    # delta method / bridge / roc / split gain: pure aggregate+window
    # pipelines — no shuffle-heavy joins beyond the broadcast star
    p = _plan(spark, sf_dir, "ab_ratio_delta_method")
    assert p.sortmerge_joins == 0 and p.cartesian_products == 0
    p = _plan(spark, sf_dir, "agg_bridge_price_volume")
    assert p.broadcast_joins >= 2, p.text
    assert p.cartesian_products == 0
    p = _plan(spark, sf_dir, "ml_roc_curve")
    assert p.broadcast_joins == 0 and p.sortmerge_joins == 0
    p = _plan(spark, sf_dir, "ml_split_gain_all_features")
    assert p.broadcast_joins == 0 and p.sortmerge_joins == 0
    assert p.shuffles <= 3, p.text
    # winsorize: threshold row broadcast back, no global sort
    p = _plan(spark, sf_dir, "agg_winsorized_mean")
    assert p.sortmerge_joins == 0, p.text


def test_sql_join_hint_forces_broadcast(spark, sf_dir):
    p = _plan(spark, sf_dir, "sql_join_hint_broadcast")
    assert p.broadcast_joins >= 1, p.text
    assert p.sortmerge_joins == 0


def test_slo_burn_alert_conjunction(spark, sf_dir):
    rows = _run(spark, sf_dir, "ts_slo_burn_rate").collect()
    assert rows
    for r in rows:
        assert r["page_alert"] == int(
            r["burn_1h_x1000"] > 6000 and r["burn_6h_x1000"] > 6000
        )
        assert 0 <= r["errors"] <= r["n"]


def test_embedding_diversity_matches_brute_force(spark, sf_dir):
    import numpy as np

    rows = _run(spark, sf_dir, "curation_embedding_diversity").collect()
    emb = load_table(spark, sf_dir, "embeddings").toPandas()
    for r in rows:
        g = emb[emb.label == r["label"]]
        x = np.stack(g.embedding.to_numpy()).astype("float64") * 8388608.0
        # half-AWAY rounding (the engine's quantizer); np.round is
        # half-even and disagrees on exact .5 ties of float32 inputs
        q = (
            (np.sign(x) * np.floor(np.abs(x) + 0.5))
            .astype("int64")
            .astype(object)  # exact big-int arithmetic: the engine value
        )                    # is integer-exact, so the check must be too
        n = len(q)
        total = sum(
            int(((q[i] - q[j]) ** 2).sum())
            for i in range(n)
            for j in range(i + 1, n)
        )
        brute = 2 * total / (n * (n - 1)) / 8388608.0**2
        assert r["n"] == n
        assert abs(r["avg_pairwise_sq_dist"] - brute) < 1e-12 * max(1, brute)


def test_mann_whitney_scipy_free_recompute(spark, sf_dir):
    row = _run(spark, sf_dir, "ml_mann_whitney_u").collect()[0]
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    li = li[li.l_returnflag.isin(["R", "A"])]
    li["cents"] = (
        (li.l_extendedprice.astype("float64") * 100).round().astype("int64")
    )
    ranks = li.cents.rank(method="average")  # pandas average ranks
    wa = float(ranks[li.l_returnflag == "R"].sum())
    na = int((li.l_returnflag == "R").sum())
    ua = wa - na * (na + 1) / 2
    assert row["na"] == na
    assert abs(row["u_a_x2"] / 2 - ua) < 1e-9
    assert abs(row["z"]) < 50  # sanity: finite, plausible magnitude


def test_theil_sen_pandas_replay(spark, sf_dir):
    rows = _run(spark, sf_dir, "ts_theil_sen_slope").collect()
    e = load_table(spark, sf_dir, "events").toPandas()
    e["cents"] = (e.value.astype("float64") * 100).round().astype("int64")
    e["day"] = e.ts.dt.floor("d")
    daily = e.groupby(["event_type", "day"]).cents.sum().reset_index()
    for r in rows:
        g = daily[daily.event_type == r["event_type"]].sort_values("day")
        days = (g.day - g.day.min()).dt.days.to_numpy()
        cents = g.cents.to_numpy()
        slopes = sorted(
            (cents[j] - cents[i]) / (days[j] - days[i])
            for i in range(len(g))
            for j in range(i + 1, len(g))
        )
        assert r["n_pairs"] == len(slopes)
        assert (
            abs(
                r["theil_sen_slope_cents_per_day"]
                - slopes[(len(slopes) + 1) // 2 - 1]
            )
            < 1e-9
        )


def test_source_overlap_symmetric_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "curation_source_overlap_matrix").collect()
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0 < r["shared"] <= min(r["n_a"], r["n_b"])
        assert 0 < r["containment_ppm"] <= 1_000_000


def test_seasonal_decompose_reconstructs(spark, sf_dir):
    rows = _run(spark, sf_dir, "ts_seasonal_decompose_additive").collect()
    assert rows
    for r in rows:
        assert (
            r["trend_cents"] + r["seasonal_cents"] + r["residual_cents"]
            == r["cents"]
        )


def test_runs_test_pandas_replay(spark, sf_dir):
    row = _run(spark, sf_dir, "ml_runs_test").collect()[0]
    o = load_table(spark, sf_dir, "orders").toPandas()
    o["cents"] = (o.o_totalprice.astype("float64") * 100).round().astype("int64")
    daily = (
        o.groupby(o.o_orderdate.dt.floor("d")).cents.sum().sort_index()
    )
    m = sorted(daily)[(len(daily) + 1) // 2 - 1]
    above = (daily > m).astype(int).to_numpy()
    runs = 1 + int((above[1:] != above[:-1]).sum())
    assert row["runs"] == runs
    assert row["n1"] == int(above.sum())
    assert row["n1"] + row["n2"] == len(daily)


def test_lead_lag_xcorr_shape(spark, sf_dir):
    rows = _run(spark, sf_dir, "ts_lead_lag_xcorr").collect()
    assert [r["lag_hours"] for r in rows] == [-3, -2, -1, 0, 1, 2, 3]
    for r in rows:
        assert r["n_hours"] > 0
        if r["xcorr"] is not None:
            assert -1.0000001 <= r["xcorr"] <= 1.0000001


def test_item_item_cosine_consistency(spark, sf_dir):
    rows = _run(spark, sf_dir, "graph_item_item_cosine").collect()
    assert rows
    seen: dict = {}
    for r in rows:
        assert 0 < r["cosine"] <= 1.0000001
        ranks = seen.setdefault(r["item"], [])
        ranks.append(r["rnk"])
    for item, ranks in seen.items():
        assert ranks == list(range(1, len(ranks) + 1))


def test_streaming_slo_equals_batch(spark, sf_dir):
    live = {
        r["bucket"]: r
        for r in _run(spark, sf_dir, "streaming_slo_burn_live").collect()
    }
    batch = {
        r["bucket"]: r for r in _run(spark, sf_dir, "ts_slo_burn_rate").collect()
    }
    assert live.keys() == batch.keys()
    for k, b in batch.items():
        l = live[k]
        assert (l["n"], l["errors"], l["page_alert"]) == (
            b["n"],
            b["errors"],
            b["page_alert"],
        )


def test_ndcg_pandas_replay(spark, sf_dir):
    import math

    row = _run(spark, sf_dir, "ml_ndcg_at_k").collect()[0]
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    li["score"] = (
        (li.l_extendedprice.astype("float64") * 100).round().astype("int64")
    )
    li["rel"] = li.l_quantity.astype("int64")
    disc = [1.0 / math.log2(r + 1) for r in range(1, 11)]
    total, nq = 0.0, 0
    for _, g in li.groupby("l_orderkey"):
        by_score = g.sort_values(
            ["score", "l_linenumber", "l_partkey"],
            ascending=[False, True, True],
        ).rel.to_numpy()
        ideal = g.sort_values(
            ["rel", "score", "l_linenumber", "l_partkey"],
            ascending=[False, False, True, True],
        ).rel.to_numpy()
        dcg = sum(r * d for r, d in zip(by_score[:10], disc))
        idcg = sum(r * d for r, d in zip(ideal[:10], disc))
        if idcg > 0:
            total += dcg / idcg
            nq += 1
    assert row["n_queries"] == nq
    assert abs(row["mean_ndcg"] - total / nq) < 1e-9


def test_chunk_manifest_reassembles(spark, sf_dir):
    rows = _run(spark, sf_dir, "mm_payload_chunk_manifest").collect()
    docs = load_table(spark, sf_dir, "documents").toPandas()
    sizes = docs.set_index("doc_id").text.str.encode("utf-8").str.len()
    per: dict = {}
    for r in rows:
        per.setdefault(r["asset_id"], []).append(r)
    assert len(per) == len(docs)
    for asset, chunks in per.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        total = int(sizes[asset])
        assert chunks[0]["n_chunks"] == len(chunks) == (total + 63) // 64
        assert chunks[0]["reassembled_bytes"] == total
        for i, c in enumerate(chunks):
            assert c["chunk_idx"] == i and c["offset_bytes"] == i * 64
            expect = min(64, total - i * 64)
            assert c["chunk_bytes"] == expect


def test_view_stack_filters_reach_scan(spark, sf_dir):
    p = _plan(spark, sf_dir, "sql_view_stack_pushdown")
    assert p.pushed_filters("EqualTo(o_orderstatus,F)"), p.text
    assert p.pushed_filters("GreaterThan(o_totalprice,1000"), p.text


def test_cohens_kappa_identity(spark, sf_dir):
    r = _run(spark, sf_dir, "ml_cohens_kappa").collect()[0]
    assert r["n"] == r["n11"] + r["n10"] + r["n01"] + r["n00"]
    assert abs(r["kappa"] - (r["po"] - r["pe"]) / (1 - r["pe"])) < 1e-15
    assert -1.0 <= r["kappa"] <= 1.0


def test_piecewise_changepoint_brute_force(spark, sf_dir):
    import numpy as np

    row = _run(spark, sf_dir, "ts_piecewise_fit_changepoint").collect()[0]
    o = load_table(spark, sf_dir, "orders").toPandas()
    o["cents"] = (o.o_totalprice.astype("float64") * 100).round().astype("int64")
    daily = o.groupby(o.o_orderdate.dt.floor("d")).cents.sum().sort_index()
    x = (daily.index - daily.index.min()).days.to_numpy().astype("float64")
    y = daily.to_numpy().astype("float64")

    def sse(xs, ys):
        n = len(xs)
        b = ((n * (xs * ys).sum() - xs.sum() * ys.sum())
             / (n * (xs * xs).sum() - xs.sum() ** 2))
        a = (ys.sum() - b * xs.sum()) / n
        return float(((ys - a - b * xs) ** 2).sum())

    best, best_day = None, None
    for k in range(2, len(x) - 1):
        tot = sse(x[:k], y[:k]) + sse(x[k:], y[k:])
        if best is None or tot < best - 1e-9:
            best, best_day = tot, daily.index[k - 1].date()
    assert row["break_day"] == best_day
    assert abs(row["sse_total"] - best) < 1e-6 * max(1.0, best)
    assert row["n_left"] + row["n_right"] == len(daily)


def test_cramers_v_range_and_chi2(spark, sf_dir):
    r = _run(spark, sf_dir, "agg_cramers_v").collect()[0]
    assert 0 <= r["cramers_v"] <= 1
    assert r["chi2"] >= 0
    assert r["r"] >= 2 and r["c"] == 2


def test_spearman_matches_pandas(spark, sf_dir):
    row = _run(spark, sf_dir, "ml_spearman_rho").collect()[0]
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    li["cents"] = (
        (li.l_extendedprice.astype("float64") * 100).round().astype("int64")
    )
    ref = li.cents.rank(method="average").corr(
        li.l_quantity.astype("int64").rank(method="average")
    )
    assert row["n"] == len(li)
    assert abs(row["spearman_rho"] - ref) < 1e-9


def test_brier_murphy_identity(spark, sf_dir):
    r = _run(spark, sf_dir, "ml_brier_decomposition").collect()[0]
    assert r["reliability"] >= 0 and r["resolution"] >= 0
    assert 0 <= r["uncertainty"] <= 0.25
    assert (
        abs(r["brier"] - (r["reliability"] - r["resolution"] + r["uncertainty"]))
        < 1e-12
    )


def test_new_vs_returning_accounting(spark, sf_dir):
    rows = _run(spark, sf_dir, "events_new_vs_returning").collect()
    n_users = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .count()
    )
    # every user is new exactly once
    assert sum(r["new_users"] for r in rows) == n_users
    for r in rows:
        assert r["new_users"] + r["returning_users"] == r["active_users"]


def test_occupancy_total_time_is_weighted_interval_sum(spark, sf_dir):
    rows = _run(spark, sf_dir, "ts_occupancy_profile").collect()
    o = load_table(spark, sf_dir, "orders").toPandas()
    # sum over bands of (level-weighted time) == integral of conc dt
    # == sum of interval lengths (each interval contributes its own
    # duration at +1 concurrency); bands coarsen levels, so check the
    # un-banded identity instead: total time span coverage is bounded
    total_us = sum(r["total_us"] for r in rows)
    span_us = int(
        (
            (o.o_orderdate + pd.to_timedelta(o.o_orderkey % 30 + 1, unit="D")).max()
            - o.o_orderdate.min()
        ).total_seconds()
        * 1_000_000
    )
    assert total_us == span_us  # spans tile the sweep range exactly
