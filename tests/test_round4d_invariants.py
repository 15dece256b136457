"""Semantic invariants of the round-4d operators — properties the
oracle differential can't state (it proves Spark == DuckDB; these
prove both mean what each operator claims)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.registry import catalog


def _run(spark, sf_dir, name):
    return catalog()[name].fn(spark, sf_dir)


def test_countmin_never_underestimates(spark, sf_dir):
    rows = _run(spark, sf_dir, "agg_countmin_sketch").collect()
    assert rows, "top keys expected"
    for r in rows:
        assert r["est_cnt"] >= r["exact_cnt"]  # CMS one-sided error
        assert r["overestimate"] == r["est_cnt"] - r["exact_cnt"]


def test_gains_deciles_accounting_and_monotonicity(spark, sf_dir):
    rows = _run(spark, sf_dir, "ml_gains_deciles").collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r["n"] for r in rows) == n_orders
    # rows come sorted decile DESC; cumulative gains grow monotonically
    # and end at 100% of positives
    gains = [r["gain_ppm"] for r in rows]
    assert gains == sorted(gains)
    assert gains[-1] == 1000000
    assert rows[-1]["cum_n"] == n_orders


def test_mrr_brute_force_recompute(spark, sf_dir):
    row = _run(spark, sf_dir, "ml_mrr_hit_rate").collect()[0]
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_returnflag")
        .toPandas()
    )
    srr, nrel, h1, h3 = 0, 0, 0, 0
    for _, g in li.groupby("l_orderkey"):
        rel = g[g.l_returnflag == "R"]
        if not len(rel):
            continue
        nrel += 1
        best = rel.l_extendedprice.max()
        rnk = 1 + int((g.l_extendedprice > best).sum())
        srr += 1000000 // rnk
        h1 += rnk == 1
        h3 += rnk <= 3
    assert row["n_orders"] == li.l_orderkey.nunique()
    assert row["n_with_rel"] == nrel
    assert (row["hits_at_1"], row["hits_at_3"]) == (h1, h3)
    assert row["sum_rr_ppm"] == srr
    assert row["mrr_ppm"] == srr // nrel


def test_ks_statistic_brute_force(spark, sf_dir):
    row = _run(spark, sf_dir, "ml_ks_two_sample").collect()[0]
    o = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderstatus"
    ).toPandas()
    a = np.sort(o[o.o_orderstatus == "F"].o_totalprice.to_numpy())
    b = np.sort(o[o.o_orderstatus != "F"].o_totalprice.to_numpy())
    xs = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(a, xs, side="right").astype("int64")
    cb = np.searchsorted(b, xs, side="right").astype("int64")
    diffs = np.abs(ca * len(b) - cb * len(a))
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert row["d_num"] == diffs.max()
    assert row["ks_score"] == xs[np.flatnonzero(diffs == diffs.max())].min()
    assert math.isclose(
        row["ks_stat"], diffs.max() / (len(a) * len(b)), rel_tol=1e-12
    )


def test_pq_assignment_is_argmin(spark, sf_dir):
    from big_data_final_project_spark.queries.dedup import quantize_fxp
    from big_data_final_project_spark.queries.similarity import (
        PQ_D,
        PQ_K,
        PQ_M,
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).toPandas()
    q = quantize_fxp(np.stack(e.embedding.to_numpy()))
    order = np.argsort(e.vec_id.to_numpy())
    q = q[order]
    ids = e.vec_id.to_numpy()[order]
    cb = q[ids < PQ_K]
    # brute-force per-cell histogram + SSE
    n = np.zeros((PQ_M, PQ_K), dtype="int64")
    sse = np.zeros((PQ_M, PQ_K), dtype="int64")
    for m in range(PQ_M):
        sub = q[:, m * PQ_D : (m + 1) * PQ_D]
        csub = cb[:, m * PQ_D : (m + 1) * PQ_D]
        d2 = ((sub[:, None, :] - csub[None, :, :]) ** 2).sum(axis=2)
        code = np.argmin(d2, axis=1)
        for k in range(PQ_K):
            mask = code == k
            n[m, k] = mask.sum()
            sse[m, k] = d2[mask, k].astype("int64").sum()
    rows = _run(spark, sf_dir, "sim_pq_codebook").collect()
    got = {(r["subspace"], r["code"]): (r["n_assigned"], r["sse"]) for r in rows}
    for m in range(PQ_M):
        for k in range(PQ_K):
            if n[m, k]:
                assert got[(m, k)] == (n[m, k], sse[m, k])
    assert sum(v[0] for v in got.values()) == PQ_M * len(e)


def test_kcore_final_graph_satisfies_degree_bound(spark, sf_dir):
    from big_data_final_project_spark.queries.graph import (
        K_CORE,
        KCORE_ROUNDS,
        _knn_edges,
    )

    rows = {r["round"]: r for r in _run(spark, sf_dir, "graph_kcore_peel").collect()}
    assert set(rows) == set(range(1, KCORE_ROUNDS + 1))
    # edges never grow, removals shrink the graph monotonically
    e0 = _knn_edges(spark, sf_dir).count()
    left = [e0] + [rows[r]["n_edges_left"] for r in sorted(rows)]
    assert left == sorted(left, reverse=True)
    # replay the peel in pandas and check the surviving graph's
    # min degree (if converged within the bounded rounds)
    pdf = _knn_edges(spark, sf_dir).toPandas()
    for _ in range(KCORE_ROUNDS):
        deg = pd.concat([pdf.a, pdf.b]).value_counts()
        drop = set(deg[deg < K_CORE].index)
        if not drop:
            break
        pdf = pdf[~pdf.a.isin(drop) & ~pdf.b.isin(drop)]
    assert rows[KCORE_ROUNDS]["n_edges_left"] == len(pdf)


def test_star_contraction_equals_min_label_clusters(spark, sf_dir):
    a = {
        (r["doc_id"], r["cluster_id"])
        for r in _run(spark, sf_dir, "dedup_cc_star_contraction").collect()
    }
    b = {
        (r["doc_id"], r["cluster_id"])
        for r in _run(spark, sf_dir, "dedup_clusters").collect()
    }
    assert a == b  # two algorithms, one fixpoint


def test_gram_matrix_equals_numpy_full_recompute(spark, sf_dir):
    from big_data_final_project_spark.queries.dedup import quantize_fxp

    e = load_table(spark, sf_dir, "embeddings").select("embedding").toPandas()
    q = quantize_fxp(np.stack(e.embedding.to_numpy())).astype("int64")
    g = q.T @ q
    rows = _run(spark, sf_dir, "ml_gram_matrix").collect()
    assert len(rows) == 64 * 65 // 2
    for r in rows:
        assert g[r["i"] - 1, r["j"] - 1] == r["g_fp"]


def test_exact_size_hash_sample_is_stable_and_exact(spark, sf_dir):
    from big_data_final_project_spark.queries.relational import SAMPLE_EXACT_N

    df = _run(spark, sf_dir, "sample_exact_size_hash")
    n_total = load_table(spark, sf_dir, "orders").count()
    got = df.collect()
    assert len(got) == min(SAMPLE_EXACT_N, n_total)
    # partitioning-independence: a different layout yields the same set
    o = load_table(spark, sf_dir, "orders").repartition(17, "o_custkey")
    redo = (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.md5(F.col("o_orderkey").cast("string")), "o_orderkey")
        .limit(SAMPLE_EXACT_N)
        .collect()
    )
    assert {r["o_orderkey"] for r in got} == {r["o_orderkey"] for r in redo}


def test_containment_bounds_and_symmetric_blocking(spark, sf_dir):
    from big_data_final_project_spark.queries.dedup import CONTAINMENT_PPM

    rows = _run(spark, sf_dir, "dedup_containment").collect()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 0 < r["shared"] <= min(r["na"], r["nb"])
        assert CONTAINMENT_PPM <= r["containment_ppm"] <= 1000000
        assert r["containment_ppm"] == r["shared"] * 1000000 // min(r["na"], r["nb"])


def test_mad_is_robust_to_a_planted_outlier(spark, sf_dir):
    # MAD's defining property: an extreme outlier moves stddev, not MAD
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"), F.col("l_quantity").alias("x")
    )
    base = {
        r["l_returnflag"]: r["mad"]
        for r in _run(spark, sf_dir, "agg_mad_robust").collect()
    }
    spiked = li.unionByName(
        li.limit(1).select("g", (F.col("x") + F.lit(1e9)).alias("x"))
    )
    m = spiked.groupBy("g").agg(F.expr("percentile(x, 0.5)").alias("med"))
    mad2 = {
        r["g"]: r["mad"]
        for r in spiked.join(m, "g")
        .groupBy("g")
        .agg(F.expr("percentile(abs(x - med), 0.5)").alias("mad"))
        .collect()
    }
    for g, v in base.items():
        assert abs(mad2[g] - v) < 1.0  # one planted 1e9 spike barely moves MAD


def test_mann_kendall_brute_force(spark, sf_dir):
    rows = _run(spark, sf_dir, "ts_mann_kendall").collect()
    e = load_table(spark, sf_dir, "events").select("event_type", "ts").toPandas()
    e["day"] = e.ts.dt.date
    daily = e.groupby(["event_type", "day"]).size().rename("x").reset_index()
    for r in rows:
        x = (
            daily[daily.event_type == r["event_type"]]
            .sort_values("day")
            .x.to_numpy()
        )
        s = int(np.sign(x[None, :] - x[:, None])[np.triu_indices(len(x), 1)].sum())
        assert r["n_days"] == len(x)
        assert r["s_stat"] == s
        # engines truncate integer division toward zero; python floors
        den = len(x) * (len(x) - 1)
        trunc = abs(s) * 2000000 // den
        assert r["tau_ppm"] == (trunc if s >= 0 else -trunc)


def test_wow_growth_null_edges_and_recompute(spark, sf_dir):
    rows = _run(spark, sf_dir, "ts_wow_growth").collect()
    assert rows[0]["dod_growth_ppm"] is None  # nothing before day 1
    for i in range(min(7, len(rows))):
        assert rows[i]["wow_growth_ppm"] is None
    if len(rows) > 8:
        cur, prev = rows[8]["rev_cents"], rows[7]["rev_cents"]
        delta = cur - prev
        # Spark div truncates toward zero; mirror that here
        trunc = abs(delta) * 1000000 // prev
        assert rows[8]["dod_growth_ppm"] == (trunc if delta >= 0 else -trunc)
