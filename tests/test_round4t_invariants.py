"""Semantic invariants of the round-4t operators (first-touch
attribution, MAD anomalies, broadcast advisor) — properties the
oracle differential can't state."""

from __future__ import annotations

from collections import defaultdict

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.registry import catalog


def _run(spark, sf_dir, name):
    return catalog()[name].fn(spark, sf_dir)


# --------------------------------------------- first touch


def test_first_touch_precedes_last_touch(spark, sf_dir):
    first = {
        r.event_id: (r.touch_ts, r.touch_channel)
        for r in _run(spark, sf_dir, "events_attribution_first_touch").collect()
    }
    last = {
        r.event_id: (r.touch_ts, r.touch_channel)
        for r in _run(spark, sf_dir, "events_attribution_last_touch").collect()
    }
    assert first
    # same purchases are attributed by both (touch exists iff it exists)
    assert set(first) == set(last)
    for eid, (fts, _) in first.items():
        lts, _ = last[eid]
        assert fts <= lts  # the first touch can't follow the last


def test_first_touch_matches_python_replay(spark, sf_dir):
    out = {
        r.event_id: (r.touch_ts, r.touch_channel, r.gap_us)
        for r in _run(spark, sf_dir, "events_attribution_first_touch").collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr("event_id", "user_id", "event_type", "ts",
                    "unix_micros(ts) AS us")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    expected = {}
    for recs in by_user.values():
        recs.sort(key=lambda r: (r.us, r.event_id))
        first_touch = None
        for r in recs:
            if r.event_type == "purchase" and first_touch is not None:
                expected[r.event_id] = (
                    first_touch.ts, first_touch.event_type,
                    r.us - first_touch.us,
                )
            if first_touch is None and r.event_type in ("view", "click"):
                first_touch = r
    assert out == expected


# ----------------------------------------------- MAD anomalies


def test_mad_anomalies_match_python_replay(spark, sf_dir):
    out = [
        (r.event_type, r.day_epoch, r.x, r.med, r.mad, r.direction)
        for r in _run(spark, sf_dir, "ts_robust_mad_anomalies").collect()
    ]
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
    expected = []
    from datetime import date

    epoch = date(1970, 1, 1)
    for et, pts in per.items():
        by_x = sorted(pts, key=lambda t: (t[1], t[0]))
        n = len(by_x)
        med = by_x[(n + 1) // 2 - 1][1]
        ads = sorted(((abs(x - med), d) for d, x in pts))
        mad = ads[(n + 1) // 2 - 1][0]
        for d, x in pts:
            if 10000 * abs(x - med) > 44478 * mad:
                expected.append(
                    (et, (d - epoch).days, x, med, mad,
                     1 if x > med else -1)
                )
    expected.sort()
    assert out == expected


# --------------------------------------------- broadcast advisor


def test_broadcast_advisor_consistency(spark, sf_dir):
    rows = {r.tbl: r for r in _run(spark, sf_dir, "store_broadcast_advisor").collect()}
    assert set(rows) == {"region", "nation", "supplier", "part", "customer"}
    for tbl, r in rows.items():
        n = load_table(spark, sf_dir, tbl).count()
        assert r.n_rows == n
        assert r.est_bytes >= 8 * n  # at least the key column
        assert r.would_broadcast == (
            1 if r.est_bytes <= 10 * 1024 * 1024 else 0
        )
        assert r.threshold_fill_ppm == r.est_bytes * 1_000_000 // (
            10 * 1024 * 1024
        )
    # the size ordering the star-join plans rely on (synthetic dims:
    # region 5 rows < nation 25 < customer)
    assert rows["region"].est_bytes < rows["nation"].est_bytes
    assert rows["nation"].est_bytes < rows["customer"].est_bytes
