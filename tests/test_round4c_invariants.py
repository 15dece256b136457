"""Semantic invariants + plan shapes for the round-4c operators
(privacy audits, bloom semi-join reduction, interval-overlap join,
target encoding, calibration, compaction planner, BFS, seasonal-naive
baseline, grouped-map scaler) — properties the oracle differential
can't state."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.plans.audit import audit
from big_data_final_project_spark.registry import catalog


def _run(spark, sf_dir, name):
    return catalog()[name].fn(spark, sf_dir)


# --- privacy ---------------------------------------------------------------


def test_k_anonymity_accounting(spark, sf_dir):
    row = _run(spark, sf_dir, "privacy_k_anonymity").collect()[0]
    n = load_table(spark, sf_dir, "customer").count()
    assert row["n_rows"] == n
    assert 1 <= row["min_k"]
    assert row["singleton_classes"] <= row["n_classes"]
    assert row["rows_below_k5"] <= row["n_rows"]
    assert 0 <= row["singleton_ppm"] <= 1_000_000


def test_generalization_ladder_is_monotone(spark, sf_dir):
    # Coarsening the QI can only merge classes: class count drops,
    # and a singleton at a coarse level must be one at finer levels
    # too, so the singleton rate is non-increasing up the ladder.
    rows = {r["band"]: r for r in
            _run(spark, sf_dir, "privacy_generalization_ladder").collect()}
    bands = sorted(rows)
    for lo, hi in zip(bands, bands[1:]):
        assert rows[hi]["n_classes"] <= rows[lo]["n_classes"]
        assert rows[hi]["singleton_classes"] <= rows[lo]["singleton_classes"]
        assert rows[hi]["min_k"] >= rows[lo]["min_k"]


# --- bloom prefilter -------------------------------------------------------


def test_bloom_prefilter_equals_plain_semi_join(spark, sf_dir):
    # The bloom stage must be a pure no-op on the result set.
    got = {
        r["returnflag"]: (r["n_items"], r["revenue"])
        for r in _run(spark, sf_dir, "join_bloom_prefilter").collect()
    }
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    plain = (
        li.join(urgent, li["l_orderkey"] == urgent["o_orderkey"], "left_semi")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {r["l_returnflag"]: r["n"] for r in plain.collect()}
    assert {k: v[0] for k, v in got.items()} == want


# --- interval overlap ------------------------------------------------------


def test_interval_overlap_plan_is_equi_join(spark, sf_dir):
    p = audit(_run(spark, sf_dir, "join_interval_overlap"))
    assert p.cartesian_products == 0, p.text
    assert "BroadcastNestedLoopJoin" not in p.text, p.text
    row = _run(spark, sf_dir, "join_interval_overlap").collect()[0]
    if row["n_pairs"]:
        # every counted pair truly overlaps (positive length), and the
        # max is bounded by the longest possible interval (60s)
        assert 0 < row["max_overlap_us"] <= 60_000_000
        assert row["total_overlap_us"] >= row["max_overlap_us"]


# --- target encoding / calibration ----------------------------------------


def test_target_encoding_excludes_self(spark, sf_dir):
    rows = _run(spark, sf_dir, "ml_target_encoding").collect()
    o = load_table(spark, sf_dir, "orders").toPandas()
    for r in rows[:5]:
        grp = o[o.o_orderpriority == r["priority"]].o_totalprice
        loo = (grp.sum() - r["target"]) / (len(grp) - 1)
        # float-path recompute: tolerance, the oracle pins exactness
        assert abs(loo - r["loo_enc"]) < 1e-6 * max(1.0, abs(loo))


def test_calibration_bins_partition_the_table(spark, sf_dir):
    rows = _run(spark, sf_dir, "ml_calibration_bins").collect()
    n = load_table(spark, sf_dir, "orders").count()
    assert sum(r["n"] for r in rows) == n
    for r in rows:
        assert 0 <= r["n_pos"] <= r["n"]
        assert 0 <= r["pos_rate_ppm"] <= 1_000_000


# --- compaction planner ----------------------------------------------------


def test_compaction_bins_cover_all_rows_contiguously(spark, sf_dir):
    rows = _run(spark, sf_dir, "store_compaction_bins").collect()
    e = load_table(spark, sf_dir, "events")
    assert sum(r["total_rows"] for r in rows) == e.count()
    # bins are day-contiguous: sorted by bin id, day ranges don't
    # interleave
    rows = sorted(rows, key=lambda r: r["bin_id"])
    for a, b in zip(rows, rows[1:]):
        assert a["last_day"] < b["first_day"]


# --- BFS -------------------------------------------------------------------


def test_bfs_levels_start_at_single_source(spark, sf_dir):
    rows = {r["level"]: r["n_nodes"] for r in
            _run(spark, sf_dir, "graph_bfs_levels").collect()}
    assert rows[0] == 1
    assert set(rows) <= {0, 1, 2, 3}


# --- seasonal naive --------------------------------------------------------


def test_seasonal_naive_mae_dominates_bias(spark, sf_dir):
    # mean |e| >= |mean e| always (triangle inequality)
    for r in _run(spark, sf_dir, "ts_seasonal_naive_error").collect():
        if r["n_eval"]:
            assert r["mae"] >= abs(r["bias"]) - 1e-9


# --- grouped-map scaler ----------------------------------------------------


def test_grouped_map_scale_bounds(spark, sf_dir):
    for r in _run(spark, sf_dir, "udf_grouped_map_scale").collect():
        assert 0 <= r["scaled_ppm"] <= 1_000_000


# --- bitmap set algebra ----------------------------------------------------


def test_bitmap_set_ops_identities(spark, sf_dir):
    row = _run(spark, sf_dir, "agg_bitmap_set_ops").collect()[0]
    e = load_table(spark, sf_dir, "events")
    click = {
        r["user_id"]
        for r in e.where(F.col("event_type") == "click")
        .select("user_id").distinct().collect()
    }
    view = {
        r["user_id"]
        for r in e.where(F.col("event_type") == "view")
        .select("user_id").distinct().collect()
    }
    assert row["n_click"] == len(click)
    assert row["n_view"] == len(view)
    assert row["n_union"] == len(click | view)
    assert row["n_both"] == len(click & view)
    assert row["n_click_only"] == len(click - view)


# --- CUSUM -----------------------------------------------------------------


def test_cusum_matches_float_recompute(spark, sf_dir):
    import pandas as pd

    got = {r["event_type"]: r for r in
           _run(spark, sf_dir, "ts_cusum_changepoint").collect()}
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "value"
    ).toPandas()
    daily = e.groupby(["event_type", "day"], as_index=False)["value"].sum()
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        n, total = len(g), g.value.sum()
        s = n * g.value.cumsum() - (g.index + 1) * total
        best = s.abs().idxmax()
        assert got[et]["change_day"] == g.day[best]


# --- windowed funnel -------------------------------------------------------


def test_windowed_funnel_is_monotone_and_tighter(spark, sf_dir):
    row = _run(spark, sf_dir, "events_funnel_windowed").collect()[0]
    assert row["n_signup"] >= row["n_click_1h"] >= row["n_purchase_24h"]
    # the bounded funnel can never beat the unbounded one stage-wise
    unb = {r["step"]: r["n_users"] for r in
           _run(spark, sf_dir, "events_funnel_steps").collect()}
    assert row["n_signup"] == unb["signup"]
    assert row["n_click_1h"] <= unb["signup>click"]
    assert row["n_purchase_24h"] <= unb["signup>click>purchase"]


# --- Benford ---------------------------------------------------------------


def test_benford_digits_cover_and_sum(spark, sf_dir):
    rows = _run(spark, sf_dir, "audit_benford_digits").collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert sum(r["share_ppm"] for r in rows) <= 1_000_000
    n = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 0
    ).count()
    assert sum(r["n"] for r in rows) == n


# --- Pareto ----------------------------------------------------------------


def test_pareto_shares_are_ordered(spark, sf_dir):
    row = _run(spark, sf_dir, "events_power_users_pareto").collect()[0]
    assert 0 <= row["share_above_p99_ppm"] <= row["share_above_p90_ppm"] <= 1_000_000
    assert row["users_above_p90"] <= row["n_users"]


# --- asof tolerance --------------------------------------------------------


def test_asof_tolerance_only_nulls_stale_matches(spark, sf_dir):
    rows = _run(spark, sf_dir, "join_asof_tolerance").collect()
    for r in rows:
        if r["staleness_us"] is not None:
            assert 0 <= r["staleness_us"] <= 3_600_000_000
            assert r["value_asof"] is not None
        else:
            assert r["value_asof"] is None


# --- weighted percentile ---------------------------------------------------


def test_weighted_median_matches_numpy(spark, sf_dir):
    import numpy as np

    got = {r["l_returnflag"]: r["weighted_median_qty"] for r in
           _run(spark, sf_dir, "agg_weighted_percentile").collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).toPandas()
    for flag, g in li.groupby("l_returnflag"):
        g = g.sort_values("l_quantity")
        cumw = g.l_extendedprice.cumsum()
        med = g.l_quantity[cumw >= g.l_extendedprice.sum() / 2].iloc[0]
        assert got[flag] == med
