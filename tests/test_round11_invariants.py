"""Round-11 invariants (VERDICT r10 #1/#2 + ADVICE r10).

1. The volume audit's jaccard columns — now cross-engine via the md5
   rank tiebreak — must equal the REAL generator frames' row counts
   (both taus), the same forecast-ties-to-join pin the containment
   column has had since r10; and stop_shingle_pair_hits must be the
   exact complement of containment_pair_hits (the recall-mass ledger
   ADVICE r10 asked for).
2. The tau-parameterized prefix filter is LOSSLESS at every tau:
   Hypothesis draws (corpus, tau) and a brute-force python oracle is
   ground truth; the strict (tau = 1/2) registered screen is pinned
   against brute force on the planted fixture too.
3. dedup_containment's cap-off conf (ADVICE r10): at small sf the
   capped and uncapped screens agree (no block reaches the floor);
   on a planted boilerplate-wrapped-copy fixture the uncapped screen
   finds the pair the capped one documents as invisible.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from big_data_final_project_spark.queries.dedup import (
    CONTAINMENT_CAP_OFF_CONF,
    _containment_candidate_hits,
    _jaccard_candidate_hits,
    _shingle_index,
    dedup_candidate_volume_audit,
)
from tests.test_round10_invariants import _mk


def test_volume_audit_matches_jaccard_generators(spark, sf_dir):
    """jaccard_prefix_hits(_strict) = the real generator frames' row
    counts, and the stop-shingle complement identity holds — the
    cross-engine forecast IS the join it predicts (VERDICT r10 #1)."""
    docs, ex = _shingle_index(spark, sf_dir)
    loose = _jaccard_candidate_hits(docs, ex).count()
    strict = _jaccard_candidate_hits(docs, ex, 1, 2).count()
    tau45 = _jaccard_candidate_hits(docs, ex, 4, 5).count()
    audit = dedup_candidate_volume_audit(spark, sf_dir).first()
    assert loose == audit["jaccard_prefix_hits"]
    assert strict == audit["jaccard_prefix_hits_strict"]
    assert tau45 == audit["jaccard_prefix_hits_tau45"]
    assert tau45 <= strict <= loose <= audit["unfiltered_pair_hits"]
    assert (
        audit["containment_pair_hits"] + audit["stop_shingle_pair_hits"]
        == audit["unfiltered_pair_hits"]
    )


def test_jaccard_prefix_lossless_across_tau_on_random_corpora(spark):
    """Property-based losslessness over BOTH corpus shape and tau
    (VERDICT r10 #3: the r10 property only exercised tau = 1/10):
    at every drawn tau, the prefix+position+length candidate set
    covers every true J >= tau pair of a random corpus."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    corpus = st.lists(
        st.lists(
            st.integers(min_value=1, max_value=40), min_size=1, max_size=25
        ),
        min_size=2,
        max_size=14,
    )
    taus = st.sampled_from([(1, 10), (1, 4), (1, 2), (2, 3), (4, 5), (1, 1)])

    @settings(max_examples=12, deadline=None)
    @given(corpus, taus)
    def check(doc_shingles, tau):
        num, den = tau
        rows = [
            (i + 1, sorted(set(sh))) for i, sh in enumerate(doc_shingles)
        ]
        docs, ex = _mk(spark, rows)
        cand = {
            (r["doc_a"], r["doc_b"])
            for r in _jaccard_candidate_hits(docs, ex, num, den).collect()
        }
        for (ida, sa), (idb, sb) in combinations(
            [(i, set(sh)) for i, sh in rows], 2
        ):
            # integer threshold test: J >= num/den iff den*|A∩B| >= num*|A∪B|
            if den * len(sa & sb) >= num * len(sa | sb):
                assert (ida, idb) in cand, (tau, ida, idb, sa, sb)

    check()


def test_strict_screen_lossless_on_planted_fixture(spark):
    """tau = 1/2 on the r10 planted-boilerplate fixture: the true
    near-dup pair survives, the boilerplate-only pairs (J = 8/144)
    don't, and the prefix (now ~n/2 instead of ~9n/10) cuts volume
    far harder than the loose screen."""
    hot = list(range(100, 108))
    rows = [(i, hot + [10_000 + 100 * i + j for j in range(72)])
            for i in range(1, 41)]
    base = [5_000 + j for j in range(18)]
    rows += [(41, hot + base), (42, hot + base[:-1] + [9_999])]
    docs, ex = _mk(spark, rows)
    strict_hits = _jaccard_candidate_hits(docs, ex, 1, 2)
    cand = {(r["doc_a"], r["doc_b"]) for r in strict_hits.collect()}
    assert (41, 42) in cand
    loose_n = _jaccard_candidate_hits(docs, ex).count()
    strict_n = strict_hits.count()
    assert strict_n < loose_n
    # production-tau prefixes exclude the hot block entirely for the
    # filler docs (72 unique + 8 hot; prefix = 41 rarest = all unique)
    assert strict_n <= len(cand) * 8  # no f_hot² term survives


def _collect_pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_containment_cap_off_is_lossless_ground_truth(spark, sf_dir):
    """ADVICE r10: the cap-off conf restores ground-truth visibility.
    (a) On the real small-sf corpus no block reaches the floor, so
    capped == uncapped (the documented 'semantics unchanged at
    sf <= 0.01'). (b) On a planted fixture where a pair shares ONLY
    stop-shingles, cap-off finds it and the capped screen doesn't."""
    docs, ex = _shingle_index(spark, sf_dir)
    capped = _collect_pairs(_containment_candidate_hits(docs, ex))
    spark.conf.set(CONTAINMENT_CAP_OFF_CONF, "true")
    try:
        uncapped = _collect_pairs(_containment_candidate_hits(docs, ex))
    finally:
        spark.conf.unset(CONTAINMENT_CAP_OFF_CONF)
    assert capped == uncapped

    # planted: 60-doc block, H+K in all docs; docs 59/60 share ONLY
    # the block-common shingles — the capped screen's documented miss
    H, K = 1000, 1001
    rows = [(i, [H, K, 10_000 + i]) for i in range(1, 59)]
    rows += [(59, [H, K]), (60, [H, K, 20_000])]
    docs2, ex2 = _mk(spark, rows)
    capped2 = _collect_pairs(_containment_candidate_hits(docs2, ex2))
    assert (59, 60) not in capped2
    spark.conf.set(CONTAINMENT_CAP_OFF_CONF, "true")
    try:
        uncapped2 = _collect_pairs(_containment_candidate_hits(docs2, ex2))
    finally:
        spark.conf.unset(CONTAINMENT_CAP_OFF_CONF)
    assert (59, 60) in uncapped2
    assert capped2 <= uncapped2


def test_recall_audit_ties_to_cap_off_screen(spark, sf_dir):
    """The oracle-paired recall audit's ground-truth count must equal
    the cap-off conf screen's row count (the audit IS the conf path,
    certified), and its capped count must equal dedup_containment."""
    from big_data_final_project_spark.queries.dedup import (
        dedup_containment,
        dedup_containment_recall_audit,
    )

    audit = dedup_containment_recall_audit(spark, sf_dir).first()
    assert audit["n_capped_pairs"] == dedup_containment(spark, sf_dir).count()
    spark.conf.set(CONTAINMENT_CAP_OFF_CONF, "true")
    try:
        truth_n = dedup_containment(spark, sf_dir).count()
    finally:
        spark.conf.unset(CONTAINMENT_CAP_OFF_CONF)
    assert audit["n_true_pairs"] == truth_n
    assert (
        audit["n_missed_pairs"]
        == audit["n_true_pairs"] - audit["n_capped_pairs"]
    )
    assert 0 <= audit["recall_ppm"] <= 1_000_000


def test_sampled_recall_audit_consistent_with_full(spark, sf_dir):
    """The block-sampled recall audit is a stratum subsample of the
    full audit: its pair counts are bounded by the full counts, the
    block census is sane, and whole-block sampling keeps capped <=
    true within the sample."""
    from big_data_final_project_spark.queries.dedup import (
        dedup_containment_recall_audit,
        dedup_containment_recall_sampled,
    )

    s = dedup_containment_recall_sampled(spark, sf_dir).first()
    f = dedup_containment_recall_audit(spark, sf_dir).first()
    assert 0 < s["n_blocks_sampled"] <= s["n_blocks_total"]
    assert s["n_capped_pairs"] <= f["n_capped_pairs"]
    assert s["n_true_pairs"] <= f["n_true_pairs"]
    assert s["n_capped_pairs"] <= s["n_true_pairs"]
    assert 0 <= s["recall_ppm"] <= 1_000_000
    # second deterministic replicate (VERDICT r11 #3): disjoint hex
    # stratum, same invariants; the two strata can't overlap, so their
    # sampled block counts sum within the total
    assert 0 < s["n_blocks_sampled_r2"]
    assert (
        s["n_blocks_sampled"] + s["n_blocks_sampled_r2"]
        <= s["n_blocks_total"]
    )
    assert s["n_capped_pairs_r2"] <= f["n_capped_pairs"]
    assert s["n_true_pairs_r2"] <= f["n_true_pairs"]
    assert s["n_capped_pairs_r2"] <= s["n_true_pairs_r2"]
    assert 0 <= s["recall_ppm_r2"] <= 1_000_000
