"""Semantic invariants of the round-4v operators (CDC log compaction,
label-noise audit) — properties the oracle differential can't
state."""

from __future__ import annotations

from collections import defaultdict

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.registry import catalog


def _run(spark, sf_dir, name):
    return catalog()[name].fn(spark, sf_dir)


# ---------------------------------------------- CDC log compaction


def test_log_compaction_bookkeeping(spark, sf_dir):
    r = _run(spark, sf_dir, "cdc_log_compaction").collect()[0]
    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) AS us")
        .collect()
    )
    by_user = defaultdict(list)
    for row in ev:
        by_user[row.user_id].append(row)
    hi = max(row.us for row in ev)
    horizon = hi - 7 * 86_400_000_000
    survivors = tombs_kept = tombs_expired = 0
    for recs in by_user.values():
        recs.sort(key=lambda x: (x.us, x.event_id))
        last = recs[-1]
        if len(recs) == 1:
            op = "I"
        elif last.event_type == "error":
            op = "D"
        else:
            op = "U"
        if op == "D" and last.us < horizon:
            tombs_expired += 1
        else:
            survivors += 1
            if op == "D":
                tombs_kept += 1
    assert r.n_entries == len(ev)
    assert r.n_keys == len(by_user)
    assert (r.n_survivors, r.n_tombstones_kept, r.n_tombstones_expired) == (
        survivors, tombs_kept, tombs_expired)
    assert r.n_survivors + r.n_tombstones_expired == r.n_keys
    assert r.surviving_ppm == survivors * 1_000_000 // len(ev)
    # compaction compacts: one op per key survives at most
    assert r.n_survivors <= r.n_keys <= r.n_entries


# -------------------------------------------- label-noise audit


def test_label_noise_audit_covers_all_bins(spark, sf_dir):
    out = _run(spark, sf_dir, "ml_label_noise_audit").collect()
    assert out
    rows = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS b",
            "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y",
        )
        .collect()
    )
    bins = defaultdict(lambda: [0, 0])
    for r in rows:
        bins[r.b][0] += 1
        bins[r.b][1] += r.y
    assert {r.bin_id for r in out} == set(bins)
    total = 0
    for r in out:
        n, pos = bins[r.bin_id]
        sp = pos if 20 * pos < n else 0
        sn = (n - pos) if 20 * (n - pos) < n else 0
        assert (r.n, r.pos, r.suspect_positives, r.suspect_negatives) == (
            n, pos, sp, sn)
        total += sp + sn
    for r in out:
        assert r.total_suspects == total
    # this label is near-uniform: no bin reaches the consensus
    # thresholds, and the audit must SAY so rather than guess
    assert total == 0
