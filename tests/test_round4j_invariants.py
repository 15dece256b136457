"""Semantic invariants of the round-4j operators (depth-2 CART,
DeLong AUC variance, bot regularity, RAKE keywords, 2-hop harmonic
centrality) — properties the oracle differential can't state."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.queries.graph import _knn_edges
from big_data_final_project_spark.queries.text import STOPWORDS
from big_data_final_project_spark.registry import catalog

_T2_SCALE = 1_000_000_000_000


def _run(spark, sf_dir, name):
    return catalog()[name].fn(spark, sf_dir)


# ------------------------------------------------- depth-2 tree


def _best_split(hist):
    """(split_val, n_node, pos_node, n_left, pos_left, score) via the
    exact integer purity score; ties at 1e-12 resolution break on the
    split value (mirrors the query's contract)."""
    vals = sorted(hist)
    nt = sum(n for n, _ in hist.values())
    pt = sum(p for _, p in hist.values())
    nl = pl = 0
    best = None
    for v in vals:
        n, p = hist[v]
        nl += n
        pl += p
        if nl == nt:
            break
        nr, pr = nt - nl, pt - pl
        score = ((pl * pl + (nl - pl) * (nl - pl)) * _T2_SCALE // nl
                 + (pr * pr + (nr - pr) * (nr - pr)) * _T2_SCALE // nr)
        if best is None or score > best[5]:
            best = (v, nt, pt, nl, pl, score)
    return best


def test_tree_depth2_matches_python_replay(spark, sf_dir):
    rows = {r.node: r for r in _run(spark, sf_dir, "ml_tree_depth2").collect()}
    assert set(rows) == {"root", "left", "right"}
    data = (
        load_table(spark, sf_dir, "lineitem")
        .selectExpr(
            "CAST(l_quantity AS BIGINT) AS qty",
            "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS disc",
            "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y",
        )
        .collect()
    )
    h0 = defaultdict(lambda: [0, 0])
    for r in data:
        h0[r.qty][0] += 1
        h0[r.qty][1] += r.y
    root = _best_split({k: tuple(v) for k, v in h0.items()})
    got = rows["root"]
    assert (got.split_val, got.n_node, got.pos_node, got.n_left,
            got.pos_left, got.score_e12) == root
    for node, keep in (("left", lambda r: r.qty <= root[0]),
                       ("right", lambda r: r.qty > root[0])):
        h = defaultdict(lambda: [0, 0])
        for r in data:
            if keep(r):
                h[r.disc][0] += 1
                h[r.disc][1] += r.y
        exp = _best_split({k: tuple(v) for k, v in h.items()})
        g = rows[node]
        assert (g.split_val, g.n_node, g.pos_node, g.n_left, g.pos_left,
                g.score_e12) == exp
    # the two leaves partition the root's rows
    assert rows["left"].n_node + rows["right"].n_node == rows["root"].n_node


# -------------------------------------------------- DeLong variance


def test_delong_matches_python_replay_and_auc_exact(spark, sf_dir):
    r = _run(spark, sf_dir, "ml_auc_delong_variance").collect()[0]
    scores = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "o_totalprice AS s",
            "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y",
        )
        .collect()
    )
    hist = defaultdict(lambda: [0, 0])
    for row in scores:
        hist[row.s][row.y] += 1  # [neg, pos] via index 0/1
    n_pos = sum(v[1] for v in hist.values())
    n_neg = sum(v[0] for v in hist.values())
    sw10 = sw10_2 = sw01 = sw01_2 = 0
    below_n = below_p = 0
    for s in sorted(hist):
        neg, pos = hist[s][0], hist[s][1]
        w10 = 2 * below_n + neg
        above_p = n_pos - below_p - pos
        w01 = 2 * above_p + pos
        sw10 += pos * w10
        sw10_2 += pos * w10 * w10
        sw01 += neg * w01
        sw01_2 += neg * w01 * w01
        below_n += neg
        below_p += pos
    assert (r.n_pos, r.n_neg, r.u2) == (n_pos, n_neg, sw10)
    assert r.auc_ppm == sw10 * 1_000_000 // (2 * n_pos * n_neg)
    v10 = ((n_pos * sw10_2 - sw10 * sw10) * 10**12
           // ((n_pos - 1) * n_pos * 4 * n_neg * n_neg * n_pos))
    v01 = ((n_neg * sw01_2 - sw01 * sw01) * 10**12
           // ((n_neg - 1) * n_neg * 4 * n_pos * n_pos * n_neg))
    assert (r.var10_e12, r.var01_e12, r.var_auc_e12) == (v10, v01, v10 + v01)
    assert r.var_auc_e12 >= 0
    # symmetry identity: sum(npos*w10) + sum(nneg*w01) counts every
    # (pos, neg) pair twice in half-units
    assert sw10 == sw01
    # agreement with ml_auc_exact's U statistic
    u2 = _run(spark, sf_dir, "ml_auc_exact").collect()[0].u2
    assert u2 == r.u2


# ------------------------------------------------ bot regularity


def test_bot_regularity_matches_python_replay(spark, sf_dir):
    out = _run(spark, sf_dir, "events_bot_regularity").collect()
    assert out
    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr("user_id", "event_id", "unix_micros(ts) AS us")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.us, r.event_id))
    expected = {}
    for uid, recs in by_user.items():
        recs.sort()
        gaps = [b[0] - a[0] for a, b in zip(recs, recs[1:])]
        n = len(gaps)
        if n < 3:
            continue
        sg, sg2 = sum(gaps), sum(g * g for g in gaps)
        var_num = n * sg2 - sg * sg
        expected[uid] = (
            n,
            sg // n,
            var_num * 1_000_000 // (sg * sg),
            1 if 25 * var_num <= sg * sg else 0,
        )
    top = sorted(expected.items(), key=lambda kv: (kv[1][2], kv[0]))[:50]
    assert [(r.user_id, r.n_gaps, r.mean_gap_us, r.cv2_ppm, r.is_regular)
            for r in out] == [(u, *v) for u, v in top]
    cvs = [r.cv2_ppm for r in out]
    assert cvs == sorted(cvs)


# ------------------------------------------------------- RAKE


def test_rake_matches_python_replay(spark, sf_dir):
    out = _run(spark, sf_dir, "text_rake_keywords").collect()
    assert out
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    stop = set(STOPWORDS)
    phrases = []  # list[(doc_id, tuple-of-words)]
    for d in docs:
        toks = re.sub(r"[^a-z0-9]+", " ", d.text.lower()).strip().split()
        run = []
        for w in toks + ["<stop>"]:
            if w in stop or w == "<stop>":
                if run:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(w)
    freq = Counter()
    deg = Counter()
    for ph in phrases:
        for w in ph:
            freq[w] += 1
            deg[w] += len(ph)
    wscore = {w: deg[w] * 1_000_000 // freq[w] for w in freq}
    agg = {}
    for ph in phrases:
        s = " ".join(ph)
        score = sum(wscore[w] for w in ph)
        n, _, _ = agg.get(s, (0, len(ph), score))
        agg[s] = (n + 1, len(ph), score)
    top = sorted(agg.items(), key=lambda kv: (-kv[1][2], kv[0]))[:20]
    assert [(r.phrase, r.n_words, r.n_occurrences, r.score_ppm)
            for r in out] == [(s, ln, n, sc) for s, (n, ln, sc) in top]


# ----------------------------------------- 2-hop harmonic centrality


def test_harmonic_2hop_matches_python_replay(spark, sf_dir):
    out = _run(spark, sf_dir, "graph_harmonic_centrality_2hop").collect()
    assert out
    edges = [(r.a, r.b) for r in _knn_edges(spark, sf_dir).collect()]
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    expected = {}
    for u, n1 in nbrs.items():
        two = set()
        for v in n1:
            two |= nbrs[v]
        two -= n1
        two.discard(u)
        expected[u] = (len(n1), len(two), 2 * len(n1) + len(two))
    top = sorted(expected.items(), key=lambda kv: (-kv[1][2], kv[0]))[:20]
    assert [(r.part, r.n1, r.n2, r.harmonic_2x) for r in out] == [
        (u, *v) for u, v in top
    ]
