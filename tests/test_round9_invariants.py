"""Round-9 invariants.

1. sample_deterministic's ACTUAL determinism contract (VERDICT r8 #3):
   Spark's seeded Bernoulli sampler is per-partition-seeded, so the
   guarantee is plan-recompute stability under a FIXED layout — not
   layout invariance. Both halves are pinned so the docstring can
   never drift from engine behavior: if Spark ever made sample()
   layout-invariant (or broke recompute stability), a test here
   fails and the documentation gets updated with it.

2. The layout-INVARIANT samplers (the documented production path)
   must actually be layout-invariant — the property sample() lacks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_final_project_spark.data import load_table


def _sampled_keys(df):
    return sorted(
        r["l_orderkey"] * 10 + r["l_linenumber"]
        for r in df.sample(fraction=0.1, seed=42)
        .select("l_orderkey", "l_linenumber")
        .collect()
    )


def test_seeded_sample_stable_under_fixed_layout(spark, sf_dir):
    """Same plan, same layout, two evaluations -> identical row set
    (what retries and speculative tasks rely on)."""
    li = load_table(spark, sf_dir, "lineitem").repartition(8, "l_orderkey")
    assert _sampled_keys(li) == _sampled_keys(li)


def test_seeded_sample_is_layout_bound(spark, sf_dir):
    """Different partition layouts -> DIFFERENT sampled rows at the
    same seed. This is the engine behavior sample_deterministic's
    docstring documents; if this ever starts failing, Spark changed
    its sampler and the docs (and the rows-only contract note in
    registry.py) must be revisited."""
    li = load_table(spark, sf_dir, "lineitem")
    one = _sampled_keys(li.repartition(1))
    many = _sampled_keys(li.repartition(64))
    assert one != many


def test_hash_sampler_is_layout_invariant(spark, sf_dir):
    """The documented reproducible path: content-keyed (hash-gated)
    sampling returns the SAME rows regardless of layout."""
    li = load_table(spark, sf_dir, "lineitem")

    def keys(df):
        gate = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(10)) == 0
        return sorted(
            r["l_orderkey"] * 10 + r["l_linenumber"]
            for r in df.where(gate)
            .select("l_orderkey", "l_linenumber")
            .collect()
        )

    assert keys(li.repartition(1)) == keys(li.repartition(64))


# ---------------------------------------------------------------------------
# Plan-shape pins for the round-9 rewrites: these queries were rebuilt
# to remove duplicate scans / gram-hash windows / shuffle fan-out, and
# a regression would be invisible to the value differential (the slow
# shape returns the same rows). Each pin asserts the structural fact
# the rewrite exists for.
# ---------------------------------------------------------------------------

import re

from big_data_final_project_spark.plans.audit import PlanFacts, formatted_plan
from big_data_final_project_spark.registry import catalog


def _facts(spark, sf_dir, name):
    return PlanFacts(formatted_plan(catalog()[name].fn(spark, sf_dir)))


def _dup_scans(p: PlanFacts) -> int:
    paths = re.findall(
        r"Location: InMemoryFileIndex\s*(?:\(\d+ paths\))?\s*\[([^\]]*)\]",
        p.text,
    )
    return len(paths) - len(set(paths))


def test_gram_family_has_no_window_on_gram_hash(spark, sf_dir):
    """The cross-doc gram flag must stay a groupBy+salted-join, never a
    window partitioned on the content-frequency-skewed gram hash
    (VERDICT r8 #1 / SCALE.md r9: AQE cannot split a window, and its
    byte thresholds cannot even see this skew under compression)."""
    for name in (
        "dedup_exact_substr_spans",
        "dedup_exact_substr_coverage",
        "dedup_substring_windows",
        "curation_span_cut",
    ):
        p = _facts(spark, sf_dir, name)
        for m in re.finditer(r"windowspecdefinition\(([^,)]+)", p.text):
            part_col = m.group(1)
            assert not part_col.startswith("wh"), (
                f"{name}: window partitioned on gram hash ({part_col}) — "
                "the r9 skew rewrite regressed"
            )


def test_rescan_rewrites_stay_single_scan(spark, sf_dir):
    """The VERDICT r8 #4 rewrites must keep their duplicate-scan count
    at the rewritten level."""
    limits = {
        "ml_permutation_importance": 0,
        "ml_conformal_interval": 0,
        "ts_lead_lag_xcorr": 0,
        "graph_item_item_cosine": 0,
        "store_write_audit_publish": 1,  # candidate-vs-history split
        "ml_naive_bayes_apply": 0,
        "ml_shapley_two_features": 0,
        "ml_isotonic_calibration": 0,
    }
    for name, max_dup in limits.items():
        p = _facts(spark, sf_dir, name)
        assert _dup_scans(p) <= max_dup, (
            f"{name}: duplicate scans regressed above {max_dup}"
        )


def test_shuffle_tail_rewrites_stay_lean(spark, sf_dir):
    """The worst-shuffle rewrites (r8 #6 + the r9 second sweep) must
    keep their exchange counts at the rewritten level (small slack for
    planner drift; the originals were 8-14)."""
    limits = {
        "audit_primary_key_uniqueness": 4,
        "events_markov_stationary": 5,
        "events_markov_entropy_rate": 5,
        "ml_multiclass_f1": 4,
        "agg_quantile_sketch_rank": 4,
        "curation_source_overlap_matrix": 3,
    }
    for name, max_shuffles in limits.items():
        p = _facts(spark, sf_dir, name)
        assert p.shuffles <= max_shuffles, (
            f"{name}: {p.shuffles} shuffles > pinned {max_shuffles}"
        )
