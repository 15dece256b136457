"""Semantic invariants of the round-4s operators (McNemar, Ljung-Box,
retention half-life, two-level manifest pruning) — properties the
oracle differential can't state."""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.registry import catalog


def _run(spark, sf_dir, name):
    return catalog()[name].fn(spark, sf_dir)


# ------------------------------------------------------ McNemar


def test_mcnemar_cells_partition_and_replay(spark, sf_dir):
    r = _run(spark, sf_dir, "ml_mcnemar_compare").collect()[0]
    rows = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS m1",
            "CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END AS m2",
            "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y",
        )
        .collect()
    )
    b = sum(1 for x in rows if x.m1 == x.y and x.m2 != x.y)
    c = sum(1 for x in rows if x.m1 != x.y and x.m2 == x.y)
    br = sum(1 for x in rows if x.m1 == x.y and x.m2 == x.y)
    bw = sum(1 for x in rows if x.m1 != x.y and x.m2 != x.y)
    assert (r.only_m1_right, r.only_m2_right, r.both_right, r.both_wrong) == (
        b, c, br, bw)
    assert b + c + br + bw == len(rows)  # the cells partition
    assert r.mcnemar_chi2_e6 == (b - c) ** 2 * 1_000_000 // (b + c)
    assert r.significant_05 == (1 if r.mcnemar_chi2_e6 > 3_841_459 else 0)


# ---------------------------------------------------- Ljung-Box


def test_ljung_box_matches_python_replay(spark, sf_dir):
    out = _run(spark, sf_dir, "ts_ljung_box").collect()
    assert out
    daily = (
        load_table(spark, sf_dir, "events")
        .selectExpr("event_type", "CAST(ts AS DATE) AS day")
        .groupBy("event_type", "day")
        .count()
        .collect()
    )
    per = defaultdict(list)
    for r in daily:
        per[r.event_type].append((r.day, r["count"]))
    for row in out:
        pts = sorted(per[row.event_type])
        xs = [x for _, x in pts]
        n = len(xs)
        s = sum(xs)
        dev = [n * x - s for x in xs]
        den = sum(d * d for d in dev)
        q = 0
        for k in (1, 2, 3):
            num = sum(dev[i] * dev[i + k] for i in range(n - k))
            q += num * num * 1_000_000 // (den * den * (n - k))
        q *= n * (n + 2)
        assert row.n_days == n
        assert row.ljung_box_q_e6 == q
        assert row.reject_white_noise_05 == (1 if q > 7_814_728 else 0)


# -------------------------------------------- retention half-life


def test_retention_half_life_matches_python_replay(spark, sf_dir):
    out = _run(spark, sf_dir, "events_retention_half_life").collect()
    assert out
    act = (
        load_table(spark, sf_dir, "events")
        .selectExpr("user_id", "CAST(date_trunc('week', ts) AS DATE) AS w")
        .distinct()
        .collect()
    )
    weeks = defaultdict(set)
    for r in act:
        weeks[r.user_id].add(r.w)
    curve = defaultdict(lambda: defaultdict(set))
    for uid, ws in weeks.items():
        w0 = min(ws)
        for w in ws:
            curve[w0][(w - w0).days // 7].add(uid)
    from datetime import date

    for r in out:
        w0 = date(1970, 1, 1) + timedelta(days=r.cohort_day_epoch)
        ages = curve[w0]
        cohort_n = len(ages[0])
        assert r.cohort_n == cohort_n
        hl = next(
            (a for a in sorted(ages) if a > 0 and 2 * len(ages[a]) < cohort_n),
            None,
        )
        # the curve may SKIP weeks (no activity at all) — a fully
        # absent age also counts as below half; recompute over the
        # dense age range like the query's min-over-observed does NOT:
        # the query only sees observed ages, so mirror that exactly
        assert r.half_life_weeks == (hl if hl is not None else -1)


# -------------------------------------- two-level manifest pruning


def test_manifest_pruning_hierarchy_consistency(spark, sf_dir):
    rows = {r.level: r for r in _run(spark, sf_dir, "store_manifest_two_level_pruning").collect()}
    assert set(rows) == {"manifest", "file"}
    m, f = rows["manifest"], rows["file"]
    # the tree contracts: manifests are 16x fewer than files
    assert m.total <= (f.total + 15) // 16 + 1
    # level-2 scanning can only narrow what level-1 reached
    assert f.rows_reachable <= m.rows_reachable
    assert 0 <= m.pruned_ppm <= 1_000_000
    assert 0 <= f.pruned_ppm <= 1_000_000
    # clustered layout + selective predicate: both levels prune
    assert m.pruned_ppm > 0 and f.pruned_ppm > 0
    # every row the file level reaches matches the true selectivity
    n_match = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c"
        )
        .where("c >= 10000000 AND c < 15000000")
        .count()
    )
    assert f.rows_reachable >= n_match
