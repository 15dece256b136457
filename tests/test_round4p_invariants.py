"""Semantic invariants of the round-4p operators (quantized integer
log, BM25, unigram surprisal, WoE binning, weighted PageRank) —
properties the oracle differential can't state."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.functions.intlog import (
    ln_ratio_e3_py,
)
from big_data_final_project_spark.queries.graph import (
    K_NEIGHBORS,
    PR_BASE,
    PR_SCALE,
)
from big_data_final_project_spark.registry import catalog


def _run(spark, sf_dir, name):
    return catalog()[name].fn(spark, sf_dir)


# ------------------------------------------------- intlog primitive


def test_intlog_tracks_true_ln_within_bound():
    """The quantized log floors: it sits within [true - ln(17/16),
    true] over many decades of ratios — the documented contract."""
    for num, den in [(2, 1), (3, 2), (10, 1), (1000, 7), (65536, 9),
                     (500, 380), (10**9, 123457)]:
        approx = ln_ratio_e3_py(num, den) / 1000
        true = math.log(num / den)
        assert true - 0.0620 < approx <= true + 0.0005, (num, den, approx, true)
    assert ln_ratio_e3_py(1, 1) == 0


def _tokens(text):
    return re.sub(r"\s+", " ", text.lower()).strip().split(" ")


# ------------------------------------------------------------ BM25


def test_bm25_matches_python_replay(spark, sf_dir):
    out = _run(spark, sf_dir, "text_bm25_topk").collect()
    assert out
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    dl, tf = {}, defaultdict(Counter)
    for d in docs:
        toks = _tokens(d.text)
        dl[d.doc_id] = len(toks)
        for w in toks:
            if w in ("spark", "join", "window"):
                tf[w][d.doc_id] += 1
    n_docs = len(dl)
    sumdl = sum(dl.values())
    scores = defaultdict(lambda: [0, 0])
    for w, per_doc in tf.items():
        df = len(per_doc)
        idf = ln_ratio_e3_py(n_docs, df)
        for doc, t in per_doc.items():
            s = (idf * 44 * t * sumdl) // (
                20 * t * sumdl + 6 * sumdl + 18 * dl[doc] * n_docs
            )
            scores[doc][0] += 1
            scores[doc][1] += s
    top = sorted(
        ((doc, n, s) for doc, (n, s) in scores.items()),
        key=lambda t: (-t[2], t[0]),
    )[:20]
    assert [(r.doc_id, r.n_terms_matched, r.bm25_e3) for r in out] == top
    # matching more query terms never hurts a doc with equal tf profile:
    # weak sanity — scores are nonnegative and bounded by idf sum
    for r in out:
        assert r.bm25_e3 >= 0
        assert 1 <= r.n_terms_matched <= 3


# ------------------------------------------------- surprisal


def test_surprisal_matches_python_replay(spark, sf_dir):
    out = _run(spark, sf_dir, "curation_unigram_surprisal").collect()
    assert out
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    cf = Counter()
    toks_by_doc = {}
    for d in docs:
        toks = _tokens(d.text)
        toks_by_doc[d.doc_id] = toks
        cf.update(toks)
    total = sum(cf.values())
    per_doc = {}
    for doc, toks in toks_by_doc.items():
        s = sum(ln_ratio_e3_py(total, cf[w]) for w in toks)
        per_doc[doc] = (len(toks), s, s // len(toks))
    top = sorted(per_doc.items(), key=lambda kv: (-kv[1][2], kv[0]))[:50]
    assert [(r.doc_id, r.n_tokens, r.total_surprisal_e3, r.mean_surprisal_e3)
            for r in out] == [(d, *v) for d, v in top]


# ------------------------------------------------- WoE binning


def test_woe_matches_python_replay_and_sign(spark, sf_dir):
    out = _run(spark, sf_dir, "ml_woe_binning").collect()
    assert out
    orders = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin_id",
            "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad",
        )
        .collect()
    )
    bins = defaultdict(lambda: [0, 0])
    for r in orders:
        bins[r.bin_id][r.bad] += 1  # [good, bad]
    gs_tot = sum(g + 1 for g, _ in bins.values())
    bs_tot = sum(b + 1 for _, b in bins.values())
    woes, iv = {}, 0
    for bid, (g, b) in bins.items():
        gs, bs = g + 1, b + 1
        if gs * bs_tot >= bs * gs_tot:
            w = ln_ratio_e3_py(gs * bs_tot, bs * gs_tot)
        else:
            w = -ln_ratio_e3_py(bs * gs_tot, gs * bs_tot)
        gap = gs * 1_000_000 // gs_tot - bs * 1_000_000 // bs_tot
        woes[bid] = (g, b, w)
        iv += gap * w
    for r in out:
        g, b, w = woes[r.bin_id]
        assert (r.n_good, r.n_bad, r.woe_e3) == (g, b, w)
        assert r.information_value_e9 == iv
    assert iv >= 0  # IV is a sum of same-sign products (up to quantization)


# -------------------------------------------- weighted PageRank


def test_weighted_pagerank_matches_python_replay(spark, sf_dir):
    out = _run(spark, sf_dir, "graph_weighted_pagerank").collect()
    assert out
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    support = Counter()
    for ps in baskets.values():
        ps = sorted(ps)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                support[(a, b)] += 1
    directed = defaultdict(list)
    for (a, b), sp in support.items():
        directed[a].append((sp, b))
        directed[b].append((sp, a))
    wadj = {}
    for u, lst in directed.items():
        top = sorted(lst, key=lambda t: (-t[0], t[1]))[:K_NEIGHBORS]
        wadj[u] = top
    sw = {u: sum(s for s, _ in lst) for u, lst in wadj.items()}
    r = {u: PR_SCALE for u in wadj}
    for _ in range(3):
        nxt = defaultdict(lambda: PR_BASE)
        for u, lst in wadj.items():
            for s, v in lst:
                nxt[v] += (r.get(u, 0) * 17 * s) // (20 * sw[u])
        # only nodes receiving contributions exist after an iteration
        r = dict(nxt)
    expected = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(row.part, row.rank_fp) for row in out] == expected
