"""Semantic invariants of the round-4q information-theory family
(log loss, mutual information, Markov entropy rate, KL by source) —
properties the oracle differential can't state."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.functions.intlog import ln_ratio_e3_py
from big_data_final_project_spark.registry import catalog


def _run(spark, sf_dir, name):
    return catalog()[name].fn(spark, sf_dir)


# ----------------------------------------------------- log loss


def test_log_loss_matches_python_replay(spark, sf_dir):
    r = _run(spark, sf_dir, "ml_log_loss_eval").collect()[0]
    rows = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS b",
            "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y",
        )
        .collect()
    )
    bins = defaultdict(lambda: [0, 0])
    for row in rows:
        bins[row.b][0] += 1
        bins[row.b][1] += row.y
    total = degenerate = covered = 0
    for n, pos in bins.values():
        if pos == 0 or pos == n:
            degenerate += n
            continue
        total += pos * ln_ratio_e3_py(n, pos) + (n - pos) * ln_ratio_e3_py(
            n, n - pos
        )
        covered += n
    assert (r.n_bins, r.n_rows) == (len(bins), len(rows))
    assert r.n_degenerate_rows == degenerate
    assert r.total_log_loss_e3 == total
    assert r.mean_log_loss_e3 == total // covered
    # in-sample log loss of a calibrated model is at most ln(2) per
    # row for a ~balanced label (weak sanity on units)
    assert 0 < r.mean_log_loss_e3 < 1000


# --------------------------------------------- mutual information


def test_mutual_information_matches_python_replay(spark, sf_dir):
    out = {r.feature: r for r in _run(spark, sf_dir, "ml_mutual_information").collect()}
    assert set(out) == {"quantity", "discount_x100", "ship_month"}
    data = (
        load_table(spark, sf_dir, "lineitem")
        .selectExpr(
            "CAST(l_quantity AS BIGINT) AS quantity",
            "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " AS discount_x100",
            "CAST(month(l_shipdate) AS BIGINT) AS ship_month",
            "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y",
        )
        .collect()
    )
    for feat in out:
        cells = Counter((getattr(r, feat), r.y) for r in data)
        cx = Counter()
        cy = Counter()
        for (v, y), c in cells.items():
            cx[v] += c
            cy[y] += c
        n = len(data)
        num = 0
        for (v, y), c in cells.items():
            a, b = c * n, cx[v] * cy[y]
            t = ln_ratio_e3_py(a, b) if a >= b else -ln_ratio_e3_py(b, a)
            num += c * t
        assert out[feat].mi_num_e3 == num
        assert out[feat].mi_micro_nats == num * 1000 // n


# --------------------------------------------- Markov entropy rate


def test_entropy_rate_bounds_and_replay(spark, sf_dir):
    import math

    out = _run(spark, sf_dir, "events_markov_entropy_rate").collect()
    assert out
    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) AS us")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.us, r.event_id, r.event_type))
    trans = defaultdict(int)
    for recs in by_user.values():
        recs.sort()
        for a, b in zip(recs, recs[1:]):
            trans[(a[2], b[2])] += 1
    rowsum = defaultdict(int)
    for (s, _), c in trans.items():
        rowsum[s] += c
    hrow = {}
    for s, total in rowsum.items():
        num = sum(
            c * ln_ratio_e3_py(total, c)
            for (src, _), c in trans.items()
            if src == s
        )
        hrow[s] = num // total
    n_states = len(rowsum)
    for r in out:
        assert r.h_state_e3 == hrow[r.state]
        # bounded by ln(n_states) (quantized log floors, so <= holds)
        assert 0 <= r.h_state_e3 <= int(math.log(n_states) * 1000) + 1
    rates = {r.entropy_rate_e3 for r in out}
    assert len(rates) == 1  # one global rate on every row


# ------------------------------------------------- KL by source


def test_kl_by_source_nonnegative_and_replay(spark, sf_dir):
    out = _run(spark, sf_dir, "text_kl_by_source").collect()
    assert out
    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    sw = defaultdict(Counter)
    cw = Counter()
    for d in docs:
        toks = re.sub(r"\s+", " ", d.text.lower()).strip().split(" ")
        sw[d.source].update(toks)
        cw.update(toks)
    n_total = sum(cw.values())
    for r in out:
        counts = sw[r.source]
        n_s = sum(counts.values())
        num = 0
        for w, c in counts.items():
            a, b = c * n_total, n_s * cw[w]
            t = ln_ratio_e3_py(a, b) if a >= b else -ln_ratio_e3_py(b, a)
            num += c * t
        assert r.n_tokens == n_s
        assert r.kl_vs_corpus_e3 == num // n_s
        # Gibbs: KL >= 0 — quantization floors can dip slightly below
        assert r.kl_vs_corpus_e3 >= -65
