"""Semantic invariants of the round-3 operators — properties the
oracle differential can't state (it only proves Spark == DuckDB;
these prove both mean what the operator claims)."""

from __future__ import annotations

from collections import defaultdict

from big_data_final_project_spark.registry import catalog


def test_sessions_partition_events_and_respect_the_gap(spark, sf_dir):
    from pyspark.sql import functions as F

    from big_data_final_project_spark.data import load_table

    sessions = {
        (r["user_id"], r["session_no"]): r
        for r in catalog()["ts_sessionize_batch"].fn(spark, sf_dir).collect()
    }
    # sessions partition the events: per-user totals add up
    per_user = defaultdict(int)
    for (uid, _), r in sessions.items():
        per_user[uid] += r["n_events"]
        assert r["session_start"] <= r["session_end"]
    events = load_table(spark, sf_dir, "events")
    want = {
        r["user_id"]: r["n"]
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_user == want
    # consecutive sessions of a user are separated by > 30 minutes
    by_user = defaultdict(list)
    for (uid, sno), r in sessions.items():
        by_user[uid].append((sno, r["session_start"], r["session_end"]))
    for uid, rows in by_user.items():
        rows.sort()
        for (_, _, prev_end), (_, nxt_start, _) in zip(rows, rows[1:]):
            assert (nxt_start - prev_end).total_seconds() > 1800


def test_m4_buckets_bound_their_points(spark, sf_dir):
    rows = catalog()["ts_m4_downsample"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r["v_min"] <= r["first_v"] <= r["v_max"]
        assert r["v_min"] <= r["last_v"] <= r["v_max"]
        assert r["first_ts"] <= r["last_ts"]
        assert r["n"] >= 1
        assert 0 <= r["bucket"] < 256 or r["bucket"] == 256  # max ts edge


def test_rolling_distinct_dominates_daily_distinct(spark, sf_dir):
    from pyspark.sql import functions as F

    from big_data_final_project_spark.data import load_table

    rolled = {
        r["day"]: r["n_active_7d"]
        for r in catalog()["agg_rolling_distinct_users"].fn(spark, sf_dir).collect()
    }
    daily = {
        r["day"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(rolled) == set(daily)
    for day, n in daily.items():
        assert rolled[day] >= n


def test_twa_lies_within_value_range(spark, sf_dir):
    from pyspark.sql import functions as F

    from big_data_final_project_spark.data import load_table

    twa = {
        r["event_type"]: r["twa"]
        for r in catalog()["ts_time_weighted_avg"].fn(spark, sf_dir).collect()
    }
    rng = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for t, v in twa.items():
        lo, hi = rng[t]
        assert lo <= v <= hi


def test_pagerank_ranks_bounded_and_conserved(spark, sf_dir):
    from big_data_final_project_spark.queries import graph

    rows = catalog()["graph_pagerank"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    # every rank >= the teleport base; top-20 strictly ordered
    ranks = [r["rank_fp"] for r in rows]
    assert all(r >= graph.PR_BASE for r in ranks)
    assert ranks == sorted(ranks, reverse=True)
