"""Semantic invariants + plan shapes for the round-4b operators
(model evaluation, PIT join, attribution decay, EWMA, incremental
dedup, listagg/union-by-name/URL, HHI, ratio-to-report) — properties
the oracle differential can't state."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.plans.audit import audit
from big_data_final_project_spark.registry import catalog


def _run(spark, sf_dir, name):
    return catalog()[name].fn(spark, sf_dir)


# --- ml_auc_exact ----------------------------------------------------------


def test_auc_matches_bruteforce_pair_count(spark, sf_dir):
    row = _run(spark, sf_dir, "ml_auc_exact").collect()[0]
    o = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderstatus"
    ).toPandas()
    pos = o[o.o_orderstatus == "F"].o_totalprice.to_numpy()
    neg = o[o.o_orderstatus != "F"].o_totalprice.to_numpy()
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    # O(n_pos * n_neg) reference: wins + half-ties
    wins = sum((neg < p).sum() for p in pos)
    ties = sum((neg == p).sum() for p in pos)
    assert row["u2"] == 2 * wins + ties
    assert math.isclose(
        row["auc"], (wins + ties / 2) / (len(pos) * len(neg)), rel_tol=1e-12
    )
    assert 0.0 <= row["auc"] <= 1.0


def test_auc_plan_has_no_cartesian_bounded_shuffles(spark, sf_dir):
    p = audit(_run(spark, sf_dir, "ml_auc_exact"))
    assert p.cartesian_products == 0
    # distinct-score agg + range repartition + pid window + offsets
    # broadcast + final 1-row agg: nothing that funnels the data
    # through a single-partition global window
    assert p.shuffles <= 6


# --- ml_confusion_metrics --------------------------------------------------


def test_confusion_counts_partition_the_table(spark, sf_dir):
    rows = _run(spark, sf_dir, "ml_confusion_metrics").collect()
    n = load_table(spark, sf_dir, "orders").count()
    assert len(rows) == 3
    for r in rows:
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == n
        assert math.isclose(r["prec"], r["tp"] / (r["tp"] + r["fp"]), rel_tol=1e-12)
        assert math.isclose(r["rec"], r["tp"] / (r["tp"] + r["fn"]), rel_tol=1e-12)
        # F1 is the harmonic mean of precision and recall
        hm = 2 * r["prec"] * r["rec"] / (r["prec"] + r["rec"])
        assert math.isclose(r["f1"], hm, rel_tol=1e-9)


# --- ml_psi_drift ----------------------------------------------------------


def test_psi_shares_sum_to_one_and_terms_recompute(spark, sf_dir):
    rows = _run(spark, sf_dir, "ml_psi_drift").collect()
    assert math.isclose(sum(r["share_base"] for r in rows), 1.0, rel_tol=1e-9)
    assert math.isclose(sum(r["share_curr"] for r in rows), 1.0, rel_tol=1e-9)
    for r in rows:
        if r["n_base"] > 0 and r["n_curr"] > 0:
            expect = (r["share_base"] - r["share_curr"]) * math.log(
                r["share_base"] / r["share_curr"]
            )
            assert math.isclose(r["psi_term"], expect, abs_tol=2e-6)
            assert r["psi_term"] >= 0 or math.isclose(r["psi_term"], 0, abs_tol=1e-6)
        else:
            assert r["psi_term"] is None


# --- join_point_in_time ----------------------------------------------------


def test_pit_join_is_leakage_safe_and_matches_asof(spark, sf_dir):
    out = _run(spark, sf_dir, "join_point_in_time").toPandas()
    e = load_table(spark, sf_dir, "events").toPandas()
    sign = (
        e[e.event_type == "signup"]
        .sort_values(["ts", "event_id"])[["user_id", "ts", "value"]]
        .rename(columns={"value": "profile_value"})
    )
    pur = e[e.event_type == "purchase"].sort_values(["ts", "event_id"])
    # pandas as-of: latest signup with signup.ts <= purchase.ts
    ref = pd.merge_asof(
        pur.sort_values("ts"),
        sign.sort_values("ts"),
        on="ts",
        by="user_id",
        direction="backward",
        suffixes=("", "_prof"),
    ).dropna(subset=["profile_value"])
    assert len(out) == len(ref)
    got = out.set_index("event_id").profile_value.sort_index()
    want = ref.set_index("event_id").profile_value.sort_index()
    assert (got == want).all()
    # no leakage: the joined version opened at or before the fact
    assert (out.valid_from <= out.ts).all()


# --- events_attribution_time_decay ----------------------------------------


def test_time_decay_credit_is_exact_dyadic(spark, sf_dir):
    rows = _run(spark, sf_dir, "events_attribution_time_decay").collect()
    assert rows, "at least one touch-purchase pair expected"
    for r in rows:
        assert 0 <= r["k_days"] <= 6
        assert r["channel"] in ("view", "click")
        # every pair in the same day-offset gets the same dyadic
        # weight, so credit is EXACTLY n * 2^-k
        assert r["credit"] == r["n_touches"] * 2.0 ** -r["k_days"]


# --- ts_ewma_taps ----------------------------------------------------------


def test_ewma_matches_pandas_lag_recompute(spark, sf_dir):
    out = _run(spark, sf_dir, "ts_ewma_taps").toPandas()
    e = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    g = e.groupby("user_id").value
    ref = (8 * e.value + 4 * g.shift(1) + 2 * g.shift(2) + g.shift(3)) / 15.0
    e = e.assign(ref=ref).dropna(subset=["ref"])
    merged = out.merge(e[["event_id", "ref"]], on="event_id")
    assert len(merged) == len(out) == len(e)
    assert ((merged.ewma - merged.ref).abs() < 1e-9).all()


# --- dedup_incremental_minhash --------------------------------------------


def test_incremental_screen_consistent_with_pairwise_dedup(spark, sf_dir):
    inc = _run(spark, sf_dir, "dedup_incremental_minhash").toPandas()
    pairs = _run(spark, sf_dir, "dedup_minhash_pairs").toPandas()
    assert (inc.doc_id % 10 == 0).all()
    assert ((inc.n_dups == 0) == inc.is_new).all()
    # every screen hit is a batch-corpus pair the symmetric pairwise
    # query also finds (as an ordered (min, max) pair)
    cross = {
        (min(a, b), max(a, b))
        for a, b in zip(pairs.doc_a, pairs.doc_b)
        if (a % 10 == 0) != (b % 10 == 0)
    }
    hits = inc[~inc.is_new]
    for d, m in zip(hits.doc_id, hits.first_match_id):
        assert (min(d, m), max(d, m)) in cross


def test_incremental_screen_broadcasts_the_batch(spark, sf_dir):
    p = audit(_run(spark, sf_dir, "dedup_incremental_minhash"))
    assert p.broadcast_joins >= 1
    assert p.cartesian_products == 0


# --- agg_listagg_sorted ----------------------------------------------------


def test_listagg_is_topk_in_order(spark, sf_dir):
    rows = _run(spark, sf_dir, "agg_listagg_sorted").collect()
    c = load_table(spark, sf_dir, "customer").toPandas()
    for r in rows:
        seg = c[c.c_mktsegment == r["c_mktsegment"]]
        want = (
            seg.sort_values(["c_acctbal", "c_custkey"], ascending=[False, True])
            .head(5)
            .c_name.tolist()
        )
        assert r["top_names"] == ",".join(want)
        assert r["n"] == len(want) <= 5


# --- setop_union_by_name ---------------------------------------------------


def test_union_by_name_null_fills_per_branch(spark, sf_dir):
    df = _run(spark, sf_dir, "setop_union_by_name")
    agg = df.groupBy("src").agg(
        F.count("*").alias("n"),
        F.count("price").alias("n_price"),
        F.count("flag").alias("n_flag"),
    )
    by_src = {r["src"]: r for r in agg.collect()}
    assert by_src["orders"]["n_flag"] == 0
    assert by_src["orders"]["n_price"] == by_src["orders"]["n"]
    assert by_src["lineitem"]["n_price"] == 0
    assert by_src["lineitem"]["n_flag"] == by_src["lineitem"]["n"]


# --- scalar_url_funcs ------------------------------------------------------


def test_url_components_round_trip_the_synthesis(spark, sf_dir):
    out = _run(spark, sf_dir, "scalar_url_funcs")
    d = load_table(spark, sf_dir, "documents")
    joined = out.join(d, "doc_id").collect()
    for r in joined:
        assert r["protocol"] == "https"
        assert r["host"] == f"www.{r['source']}.example.com"
        assert r["path"] == f"/docs/{r['doc_id']}"
        assert r["lang_param"] == r["lang"]


# --- agg_concentration_hhi -------------------------------------------------


def test_hhi_bounds_and_recompute(spark, sf_dir):
    rows = _run(spark, sf_dir, "agg_concentration_hhi").collect()
    c = load_table(spark, sf_dir, "customer").toPandas()
    for r in rows:
        seg = c[c.c_mktsegment == r["c_mktsegment"]]
        counts = seg.groupby("c_nationkey").size()
        assert r["n_nations"] == len(counts)
        shares = counts / counts.sum()
        assert math.isclose(r["hhi"], (shares**2).sum(), rel_tol=1e-12)
        # HHI of k groups lies in [1/k, 1]
        assert 1.0 / r["n_nations"] <= r["hhi"] <= 1.0
        assert math.isclose(r["top_share"], shares.max(), rel_tol=1e-12)


# --- window_ratio_to_report ------------------------------------------------


def test_ratio_to_report_shares_sum_to_one_per_customer(spark, sf_dir):
    df = _run(spark, sf_dir, "window_ratio_to_report")
    bad = (
        df.groupBy("o_custkey")
        .agg(F.sum("share_of_customer").alias("s"))
        .where(F.abs(F.col("s") - 1.0) > 1e-9)
        .count()
    )
    assert bad == 0
