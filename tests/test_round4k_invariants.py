"""Semantic invariants of the round-4k operators (Qini uplift, CUPED,
resource-allocation link prediction, geometric-noise counts,
Holt-Winters additive) — properties the oracle differential can't
state."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.queries.graph import _knn_edges
from big_data_final_project_spark.registry import catalog


def _run(spark, sf_dir, name):
    return catalog()[name].fn(spark, sf_dir)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ------------------------------------------------------ Qini uplift


def test_uplift_qini_matches_python_replay(spark, sf_dir):
    out = _run(spark, sf_dir, "ml_uplift_qini").collect()
    assert len(out) == 10
    orders = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "o_orderkey", "o_totalprice",
            "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y",
        )
        .collect()
    )
    ranked = sorted(orders, key=lambda r: (-r.o_totalprice, r.o_orderkey))
    n = len(ranked)
    # ntile semantics: first (n % 10) buckets get one extra row
    q, rem = divmod(n, 10)
    sizes = [q + 1 if i < rem else q for i in range(10)]
    cum = []
    cn_t = cp_t = cn_c = cp_c = 0
    idx = 0
    for d, sz in enumerate(sizes, start=1):
        for r in ranked[idx: idx + sz]:
            t = _h32(f"t-{r.o_orderkey}") % 2
            if t:
                cn_t += 1
                cp_t += r.y
            else:
                cn_c += 1
                cp_c += r.y
        idx += sz
        qx = cp_t * cn_c - cp_c * cn_t
        sign = -1 if qx < 0 else 1
        cum.append(
            (d, cn_t, cp_t, cn_c, cp_c, qx,
             sign * (abs(qx) * 1_000_000 // (cn_t * cn_c)))
        )
    got = [
        (r.decile, r.cn_t, r.cpos_t, r.cn_c, r.cpos_c, r.qini_x,
         r.uplift_cum_ppm)
        for r in out
    ]
    assert got == cum
    # final decile covers the whole population
    assert cum[-1][1] + cum[-1][3] == n


# ------------------------------------------------------------ CUPED


def test_cuped_matches_python_replay(spark, sf_dir):
    r = _run(spark, sf_dir, "ab_cuped_adjustment").collect()[0]
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .selectExpr(
            "l_orderkey", "l_linenumber",
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100"
            " AS BIGINT)) AS y",
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " AS x",
        )
        .collect()
    )
    n = len(rows)
    sx = sy = sxx = sxy = syy = n_t = sx_t = sy_t = 0
    for row in rows:
        t = _h32(f"c-{row.l_orderkey}-{row.l_linenumber}") % 2
        sx += row.x
        sy += row.y
        sxx += row.x * row.x
        sxy += row.x * row.y
        syy += row.y * row.y
        if t:
            n_t += 1
            sx_t += row.x
            sy_t += row.y
    n_c, sx_c, sy_c = n - n_t, sx - sx_t, sy - sy_t
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    sgn = -1 if cov < 0 else 1
    theta = sgn * (abs(cov) * 1_000_000 // vx)
    b = sgn * (abs(cov) * 1_000_000 // vy)
    dy = sy_t * 1_000_000 // n_t - sy_c * 1_000_000 // n_c
    dx = sx_t * 1_000_000 // n_t - sx_c * 1_000_000 // n_c
    prod = theta * dx
    psgn = -1 if prod < 0 else 1
    adj = dy - psgn * (abs(prod) // 1_000_000)
    corr2 = theta * b // 1_000_000
    assert (r.n_t, r.n_c, r.theta_e6, r.corr2_ppm, r.raw_diff_cents_e6,
            r.adj_diff_cents_e6, r.var_reduction_ppm) == (
        n_t, n_c, theta, corr2, dy, adj, corr2)
    # the pre-period price strongly predicts net revenue (~0.998
    # correlation), so CUPED should claim a >99% variance reduction
    assert 990_000 < r.var_reduction_ppm <= 1_000_000


# ------------------------------------- resource allocation index


def test_ra_index_matches_python_replay(spark, sf_dir):
    out = _run(spark, sf_dir, "graph_resource_allocation_index").collect()
    assert out
    edges = [(r.a, r.b) for r in _knn_edges(spark, sf_dir).collect()]
    eset = set(edges)
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    deg = {u: len(v) for u, v in nbrs.items()}
    scores = defaultdict(lambda: [0, 0])  # (u,w) -> [n_common, ra_ppm]
    for z, nz in nbrs.items():
        nz_sorted = sorted(nz)
        for i, u in enumerate(nz_sorted):
            for w in nz_sorted[i + 1:]:
                if (u, w) in eset:
                    continue
                scores[(u, w)][0] += 1
                scores[(u, w)][1] += 1_000_000 // deg[z]
    top = sorted(
        ((u, w, c, s) for (u, w), (c, s) in scores.items()),
        key=lambda t: (-t[3], t[0], t[1]),
    )[:20]
    assert [(r.pa, r.pb, r.n_common, r.ra_ppm) for r in out] == top
    # predictions are non-edges by construction
    for r in out:
        assert (r.pa, r.pb) not in eset


# ------------------------------------------- geometric noise counts


def test_geometric_noise_matches_replay_and_distribution(spark, sf_dir):
    out = _run(spark, sf_dir, "privacy_geometric_noise_counts").collect()
    assert out
    counts = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for r in out:
        u = _h32(f"geo-{r.event_type}")
        mag = 32 if u == 0 else 32 - len(bin(u)[2:])
        sign = 1 if u % 2 == 0 else -1
        assert r.true_count == counts[r.event_type]
        assert (r.noise, r.noise_magnitude) == (sign * mag, mag)
        assert r.noisy_count == r.true_count + r.noise
        assert 0 <= mag <= 32


# ------------------------------------------ Holt-Winters additive


def test_hw_additive_matches_python_replay(spark, sf_dir):
    out = {r.series: r for r in _run(spark, sf_dir, "ts_holt_winters_additive").collect()}
    assert out
    daily = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "o_orderpriority AS series",
            "to_date(o_orderdate) AS d",
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " AS cents",
        )
        .groupBy("series", "d")
        .sum("cents")
        .withColumnRenamed("sum(cents)", "y")
        .collect()
    )
    hi = max(r.d for r in daily)
    by_series = defaultdict(list)
    for r in daily:
        if (hi - r.d).days <= 119:
            by_series[r.series].append((r.d, int(r.y)))

    def tdiv2(a):
        return a // 2 if a >= 0 else -((-a) // 2)

    for series, recs in by_series.items():
        recs.sort()
        ys = [y for _, y in recs]
        lvl, s, sae, mxe = ys[0], [0] * 7, 0, 0
        for rn, y in enumerate(ys[1:], start=2):
            slot = (rn - 1) % 7
            err = abs(y - lvl - s[slot])
            sae += err
            mxe = max(mxe, err)
            new_lvl = tdiv2(y - s[slot] + lvl)
            s[slot] = tdiv2(y - new_lvl + s[slot])
            lvl = new_lvl
        r = out[series]
        n = len(ys)
        assert (r.n_obs, r.level_cents, r.forecast_cents,
                r.sum_abs_err_cents, r.max_abs_err_cents) == (
            n, lvl, lvl + s[n % 7], sae, mxe)
        assert [getattr(r, f"s{i+1}") for i in range(7)] == s
