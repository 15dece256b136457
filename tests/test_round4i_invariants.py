"""Semantic invariants of the round-4i operators (personalized
PageRank, fixed-point PCA, duplicate-submission audit, sequence-gap
audit, peak detection) — properties the oracle differential can't
state."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.plans.audit import audit
from big_data_final_project_spark.queries.graph import (
    PR_BASE,
    PR_SCALE,
    _knn_edges,
)
from big_data_final_project_spark.registry import catalog


def _run(spark, sf_dir, name):
    return catalog()[name].fn(spark, sf_dir)


# ---------------------------------------- personalized PageRank


def test_ppr_matches_python_replay_and_favors_seeds(spark, sf_dir):
    """Exact dict-arithmetic replay of the 3 fixed-point iterations
    from the same kNN edge list must reproduce the top-20 bit-for-
    bit, and the returned ranks must be the true global top-20."""
    rows = _run(spark, sf_dir, "graph_personalized_pagerank").collect()
    assert rows
    edges = [(r.a, r.b) for r in _knn_edges(spark, sf_dir).collect()]
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    deg = {n: len(vs) for n, vs in adj.items()}
    r = {n: PR_SCALE if n % 10 == 0 else 0 for n in deg}
    for _ in range(3):
        nxt = {n: PR_BASE if n % 10 == 0 else 0 for n in deg}
        for u, vs in adj.items():
            c = (r[u] * 17) // (20 * deg[u])
            for v in vs:
                nxt[v] += c
        r = nxt
    expected = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(row.part, row.rank_fp) for row in rows] == expected
    for row in rows:
        assert row.is_seed == (1 if row.part % 10 == 0 else 0)
        if row.is_seed:
            assert row.rank_fp >= PR_BASE  # teleport share is a floor


# --------------------------------------------- PCA power iteration


def test_pca_matches_exact_python_replay(spark, sf_dir):
    """Replay the whole fixed-point pipeline in arbitrary-precision
    Python ints from the raw feature rows; every output cell must
    match. Also: the ppm loadings u2 must correlate positively with
    numpy's true dominant eigenvector of the same scaled covariance
    (direction sanity, not exactness — 2 power steps != convergence)."""
    out = {r.feature: r for r in _run(spark, sf_dir, "ml_pca_power_iteration").collect()}
    feats = (
        load_table(spark, sf_dir, "lineitem")
        .selectExpr(
            "CAST(l_quantity AS BIGINT) AS x1",
            "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS x2",
            "CAST(month(l_shipdate) AS BIGINT) AS x3",
        )
        .toPandas()
    )
    xs = [feats.x1.tolist(), feats.x2.tolist(), feats.x3.tolist()]
    n = len(feats)
    s = [sum(x) for x in xs]
    S = [[n * sum(a * b for a, b in zip(xs[i], xs[j])) - s[i] * s[j]
          for j in range(3)] for i in range(3)]

    def norm(v):
        m = max(abs(c) for c in v)
        return [(-1 if c < 0 else 1) * (abs(c) * 1_000_000 // m) for c in v]

    v1 = [sum(S[i]) for i in range(3)]
    u1 = norm(v1)
    v2 = [sum(S[i][j] * u1[j] for j in range(3)) for i in range(3)]
    u2 = norm(v2)
    lam = (sum(a * b for a, b in zip(u1, v2)) * 1_000_000) // (
        sum(a * a for a in u1) * n * n
    )
    names = ("quantity", "discount_x100", "ship_month")
    for i, name in enumerate(names):
        assert out[name].u1_ppm == u1[i]
        assert out[name].u2_ppm == u2[i]
        assert out[name].rayleigh_per_row2_e6 == lam
    evals, evecs = np.linalg.eigh(np.array(S, dtype=float))
    top = evecs[:, np.argmax(evals)]
    u2v = np.array(u2, dtype=float)
    cos = abs(top @ u2v) / (np.linalg.norm(top) * np.linalg.norm(u2v))
    assert cos > 0.9


# ------------------------------------------ duplicate submissions


def test_duplicate_submissions_match_pandas_pairs(spark, sf_dir):
    out = _run(spark, sf_dir, "events_duplicate_submissions").toPandas()
    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) AS us")
        .toPandas()
    )
    expected = {}
    for (uid, et), grp in ev.groupby(["user_id", "event_type"]):
        recs = sorted(zip(grp.us, grp.event_id))
        gaps = []
        for i in range(len(recs)):
            for j in range(len(recs)):
                if i == j:
                    continue
                (ua, ia), (ub, ib) = recs[i], recs[j]
                if (ub > ua or (ub == ua and ib > ia)) and ub - ua <= 600_000_000:
                    gaps.append(ub - ua)
        if gaps:
            expected[(uid, et)] = (len(gaps), min(gaps), max(gaps))
    got = {
        (r.user_id, r.event_type): (r.n_pairs, r.min_gap_us, r.max_gap_us)
        for r in out.itertuples()
    }
    if len(expected) <= 100:
        assert got == expected
    else:
        assert all(got[k] == expected[k] for k in got)


def test_duplicate_submissions_plan_is_equijoin(spark, sf_dir):
    facts = audit(_run(spark, sf_dir, "events_duplicate_submissions"))
    assert facts.cartesian_products == 0


# ------------------------------------------------- sequence gaps


def test_sequence_gaps_match_pandas_islands(spark, sf_dir):
    out = _run(spark, sf_dir, "audit_sequence_gaps").toPandas()
    keys = sorted(
        r.k
        for r in load_table(spark, sf_dir, "orders")
        .where("o_orderstatus = 'F'")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
        .collect()
    )
    gaps = []
    islands = 1
    for a, b in zip(keys, keys[1:]):
        if b > a + 1:
            gaps.append((a + 1, b - 1, b - a - 1))
            islands += 1
    expected = sorted(gaps, key=lambda g: (-g[2], g[0]))[:20]
    assert [(r.gap_start, r.gap_end, r.gap_len) for r in out.itertuples()] == expected
    assert all(r.n_islands == islands for r in out.itertuples())


# ------------------------------------------------ peak detection


def test_peak_detection_matches_pandas(spark, sf_dir):
    out = _run(spark, sf_dir, "ts_peak_detection").toPandas()
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
    expected = []
    for et, grp in hourly.groupby("event_type"):
        pts = sorted(zip(grp.h, grp.y))
        total = sum(y for _, y in pts)
        nh = len(pts)
        for i in range(1, len(pts) - 1):
            h, y = pts[i]
            if (
                y > pts[i - 1][1]
                and y > pts[i + 1][1]
                and 4 * y * nh >= 5 * total
            ):
                expected.append(
                    (et, h, y, pts[i - 1][1], pts[i + 1][1],
                     y * nh * 1_000_000 // total)
                )
    expected.sort()
    got = [
        (r.event_type, r.h, r.y, r.y_prev, r.y_next, r.height_vs_mean_ppm)
        for r in out.itertuples()
    ]
    assert got == expected
    assert expected  # non-degenerate: the synthetic stream has peaks
