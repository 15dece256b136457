"""Semantic invariants of the round-4h operators (HITS, zone-map
skipping audit, LTTB downsampling, velocity risk rule, ECE) —
properties the oracle differential can't state."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.plans.audit import audit
from big_data_final_project_spark.registry import catalog


def _run(spark, sf_dir, name):
    return catalog()[name].fn(spark, sf_dir)


# ------------------------------------------------------- HITS


def test_hits_matches_pandas_power_iteration(spark, sf_dir):
    """The unnormalized second-iterate scores must equal an
    independent pandas reconstruction of authority^1 = in-degree,
    hub^1 = A^T applied, authority^2 = A applied — and the returned
    rankings must be the true top-20 of those score vectors."""
    rows = _run(spark, sf_dir, "graph_hits_bounded").collect()
    assert rows
    edges = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_partkey")
        .distinct()
        .toPandas()
        .rename(columns={"l_suppkey": "s", "l_partkey": "p"})
    )
    a1 = edges.groupby("p").size()
    h1 = edges.join(a1.rename("a"), on="p").groupby("s")["a"].sum()
    a2 = edges.join(h1.rename("h"), on="s").groupby("p")["h"].sum()
    hub_rows = [r for r in rows if r.kind == "hub"]
    auth_rows = [r for r in rows if r.kind == "authority"]
    assert [r.rk for r in hub_rows] == list(range(1, len(hub_rows) + 1))
    assert [r.rk for r in auth_rows] == list(range(1, len(auth_rows) + 1))
    exp_hubs = sorted(h1.items(), key=lambda kv: (-kv[1], kv[0]))[: len(hub_rows)]
    exp_auths = sorted(a2.items(), key=lambda kv: (-kv[1], kv[0]))[: len(auth_rows)]
    assert [(r.node_id, r.score) for r in hub_rows] == [
        (int(k), int(v)) for k, v in exp_hubs
    ]
    assert [(r.node_id, r.score) for r in auth_rows] == [
        (int(k), int(v)) for k, v in exp_auths
    ]


def test_hits_plan_no_cartesian(spark, sf_dir):
    facts = audit(_run(spark, sf_dir, "graph_hits_bounded"))
    assert facts.cartesian_products == 0


# ------------------------------------------- zone-map skipping audit


def test_zone_map_clustered_beats_hash(spark, sf_dir):
    """Both layouts hold the same corpus, so rows_matching must be
    identical; every scan obeys zone-map soundness (scanned >=
    matching, scanned files <= total files); and the clustered
    layout must scan no more rows than the hash layout — the whole
    point of the audit."""
    rows = {r.layout: r for r in _run(spark, sf_dir, "store_zone_map_skipping").collect()}
    assert set(rows) == {"hash", "clustered"}
    h, c = rows["hash"], rows["clustered"]
    assert h.rows_matching == c.rows_matching
    for r in (h, c):
        assert r.rows_scanned >= r.rows_matching
        assert 0 <= r.files_scanned <= r.n_files
        assert 0 <= r.files_skipped_ppm <= 1_000_000
        assert 0 <= r.rows_scanned_ppm <= 1_000_000
    assert c.rows_scanned <= h.rows_scanned
    assert c.files_scanned <= h.files_scanned


# ----------------------------------------------------------- LTTB


def test_lttb_picks_one_point_per_bucket_and_matches_replay(spark, sf_dir):
    """Exactly one survivor per (series, bucket); each survivor is a
    real point of its bucket; interior survivors maximize the exact
    integer triangle area against the neighbor-bucket means, with
    the earliest hour breaking ties; edge buckets keep the series'
    first/last point."""
    out = (
        _run(spark, sf_dir, "ts_downsample_lttb")
        .toPandas()
        .set_index(["event_type", "bucket"])
    )
    assert out.index.is_unique
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr(
                "CAST(unix_timestamp(date_trunc('hour', ts)) AS BIGINT) div 3600"
            ).alias("h"),
        )
        .count()
        .toPandas()
        .rename(columns={"count": "y"})
    )
    hourly["b"] = hourly["h"] // 6
    for (et, b), grp in hourly.groupby(["event_type", "b"]):
        assert (et, b) in out.index
        r = out.loc[(et, b)]
        pts = set(zip(grp.h, grp.y))
        assert (r.h, r.y) in pts
    for et, series in hourly.groupby("event_type"):
        bmean = series.groupby("b").agg(
            sx=("h", "sum"), sy=("y", "sum"), n=("h", "size")
        )
        bs = sorted(bmean.index)
        first_b, last_b = bs[0], bs[-1]
        grp_first = series[series.b == first_b]
        assert out.loc[(et, first_b)].h == grp_first.h.min()
        grp_last = series[series.b == last_b]
        assert out.loc[(et, last_b)].h == grp_last.h.max()
        for b in bs[1:-1]:
            # interior bucket in the oracle sense = has lag AND lead rows
            prev_b = bs[bs.index(b) - 1]
            next_b = bs[bs.index(b) + 1]
            l = bmean.loc[prev_b]
            r_ = bmean.loc[next_b]
            best = None
            for _, p in series[series.b == b].sort_values("h").iterrows():
                area2 = abs(
                    (l.sx * r_.n - r_.sx * l.n) * (p.y * l.n - l.sy)
                    - (l.sx - p.h * l.n) * (r_.sy * l.n - l.sy * r_.n)
                )
                if best is None or area2 > best[0]:
                    best = (area2, p.h, p.y)
            got = out.loc[(et, b)]
            assert (got.h, got.y) == (best[1], best[2])
            assert got.area2 == best[0]


# ----------------------------------------------------- velocity rule


def test_velocity_flags_match_pandas_sliding_window(spark, sf_dir):
    """Each flagged user's peak must equal a pandas recomputation of
    the trailing-10-minute inclusive count over exact microseconds,
    and every user whose true peak reaches the threshold must be
    flagged (unless cut by the top-100 limit)."""
    out = _run(spark, sf_dir, "events_velocity_flags").toPandas()
    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr("user_id", "unix_micros(ts) AS us")
        .toPandas()
    )
    peaks = {}
    for uid, grp in ev.groupby("user_id"):
        us = sorted(grp.us)
        peak = 0
        lo = 0
        for i, t in enumerate(us):
            while us[lo] < t - 600_000_000:
                lo += 1
            peak = max(peak, i - lo + 1)
        peaks[uid] = (len(us), peak)
    for r in out.itertuples():
        n, peak = peaks[r.user_id]
        assert (r.n_events, r.peak_count) == (n, peak)
        assert r.peak_count >= 2
    flagged_true = sorted(
        ((p, u) for u, (n, p) in peaks.items() if p >= 2),
        key=lambda t: (-t[0], t[1]),
    )[:100]
    assert list(out.user_id) == [u for _, u in flagged_true]


# --------------------------------------------------------------- ECE


def test_ece_reconstruction_and_bounds(spark, sf_dir):
    """n_rows covers the whole table; MCE >= ECE (a max dominates a
    weighted mean); the scalar matches an exact integer pandas
    recomputation from the raw rows."""
    r = _run(spark, sf_dir, "ml_expected_calibration_error").collect()[0]
    o = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bin_id",
            "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos",
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c",
        )
        .toPandas()
    )
    assert r.n_rows == len(o)
    bins = o.groupby("bin_id").agg(n=("pos", "size"), pos=("pos", "sum"), sum_c=("c", "sum"))
    gaps = {
        b: abs(
            int(row.pos) * 1_000_000 // int(row.n)
            - int(row.sum_c) * 1_000_000 // (50_000_000 * int(row.n))
        )
        for b, row in bins.iterrows()
    }
    assert r.n_bins == len(bins)
    assert r.mce_ppm == max(gaps.values())
    num = sum(int(bins.loc[b].n) * g for b, g in gaps.items())
    assert r.ece_ppm == num // int(bins.n.sum())
    assert r.mce_ppm >= r.ece_ppm
