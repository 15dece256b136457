"""Round-10 invariants (VERDICT r9 #1/#3).

The f²-candidate-pair fix in the similarity screens is a VOLUME
property — the slow shape returns the same rows, so the value
differential cannot catch a regression. These tests pin:

1. dedup_ngram_jaccard's prefix+position candidate generation emits
   strictly fewer hits than the unfiltered inverted-index join, and
   is LOSSLESS (every true J >= 0.1 pair survives) — checked against
   a brute-force python oracle on a planted fixture AND on the real
   corpus at the test sf.
2. dedup_containment's stop-shingle rule: shingles above the df cap
   generate ZERO candidates (the provable C(cap,2) per-shingle
   bound), and the documented recall trade is real — a pair sharing
   ONLY stop-shingles is not screened.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from big_data_final_project_spark.queries.dedup import (
    CONTAINMENT_DF_FLOOR,
    CONTAINMENT_STOP_DIV,
    JACCARD_THRESHOLD,
    _containment_candidate_hits,
    _jaccard_candidate_hits,
    _shingle_index,
)

DOCS_SCHEMA = (
    "doc_id long, lang string, len_bucket long, shh array<bigint>, n int"
)


def _mk(spark, rows):
    """rows: [(doc_id, [shingle longs])] -> (docs, ex) in the
    _shingle_index contract, one ('xx', 0) block."""
    docs = spark.createDataFrame(
        [(i, "xx", 0, sh, len(sh)) for i, sh in rows], DOCS_SCHEMA
    )
    # m mirrors _shingle_index's md5 rank tiebreak (here over the
    # long's decimal form — any per-shingle total order is valid)
    ex = docs.select(
        "doc_id", "lang", "len_bucket", "n", F.explode("shh").alias("s")
    ).withColumn("m", F.md5(F.col("s").cast("string")))
    return docs, ex


def test_containment_stop_shingle_generates_no_candidates(spark):
    """Block of 60 docs; shingle H appears in all 60 (df=60 > cap=16)
    while r1/r2 are rare. The pair sharing rare shingles is screened;
    the pair sharing ONLY H is not — the documented recall trade —
    and H contributes zero hits (the f² bound)."""
    H, r1, r2, x = 1000, 1, 2, 3
    rows = [(i, [H, 10_000 + i]) for i in range(1, 57)]
    rows += [(57, [H, r1, r2]), (58, [r1, r2, x]), (59, [H]), (60, [H, 77])]
    docs, ex = _mk(spark, rows)
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in _containment_candidate_hits(docs, ex).collect()
    }
    assert (57, 58) in cand  # found via rare shingles
    assert (59, 60) not in cand  # shares ONLY the stop-shingle
    # H is in 60 docs: an unfiltered join would emit C(60,2)=1770 hits
    # for it alone; the capped generator's whole output is tiny
    assert len(cand) < 100


def test_containment_volume_bounded_by_cap(spark, sf_dir):
    """Real corpus: every candidate hit comes from an eligible
    shingle, so hits <= cap/2 * total occurrences — linear, never f²
    — and eligible shingles really respect the cap."""
    docs, ex = _shingle_index(spark, sf_dir)
    df_tab = ex.groupBy("lang", "len_bucket", "s").agg(
        F.count(F.lit(1)).alias("df")
    )
    blk = docs.groupBy("lang", "len_bucket").agg(
        F.count(F.lit(1)).alias("nd")
    )
    row = (
        df_tab.join(blk, ["lang", "len_bucket"])
        .agg(
            F.sum("df").alias("occ"),
            F.max("nd").alias("max_nd"),
        )
        .first()
    )
    cap = max(CONTAINMENT_DF_FLOOR, int(row["max_nd"]) // CONTAINMENT_STOP_DIV)
    hits = _containment_candidate_hits(docs, ex).count()
    assert hits <= cap * int(row["occ"]) // 2


def test_volume_audit_matches_containment_generator(spark, sf_dir):
    """The oracle-paired volume audit's containment_pair_hits must
    equal the REAL generator frame's row count — the tie between the
    cross-engine-certified forecast and the join it predicts."""
    from big_data_final_project_spark.queries.dedup import (
        dedup_candidate_volume_audit,
    )

    docs, ex = _shingle_index(spark, sf_dir)
    hits = _containment_candidate_hits(docs, ex).count()
    audit = dedup_candidate_volume_audit(spark, sf_dir).first()
    assert hits == audit["containment_pair_hits"]
    assert audit["max_eligible_df"] <= audit["cap_max_block"]
    assert audit["containment_pair_hits"] <= audit["unfiltered_pair_hits"]


def test_jaccard_prefix_filter_reduces_and_is_lossless(spark, sf_dir):
    """Real corpus: the prefix route emits fewer hits than the
    unfiltered join (sum of C(df,2)) AND its distinct candidate set
    covers every true J >= 0.1 pair (losslessness — the property the
    unchanged quadratic oracle certifies end-to-end in the sweep)."""
    docs, ex = _shingle_index(spark, sf_dir)
    unfiltered = (
        ex.groupBy("lang", "len_bucket", "s")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.sum(F.expr("df * (df - 1) div 2")))
        .first()[0]
    )
    hits = _jaccard_candidate_hits(docs, ex)
    n_hits = hits.count()
    assert n_hits < unfiltered
    cand = {(r["doc_a"], r["doc_b"]) for r in hits.collect()}
    rows = docs.select("doc_id", "lang", "len_bucket", "shh").collect()
    by_block: dict = {}
    for r in rows:
        by_block.setdefault((r["lang"], r["len_bucket"]), []).append(
            (r["doc_id"], set(r["shh"]))
        )
    for members in by_block.values():
        for (ida, sa), (idb, sb) in combinations(sorted(members), 2):
            inter = len(sa & sb)
            union = len(sa | sb)
            if union and inter / union >= JACCARD_THRESHOLD:
                assert (ida, idb) in cand, (ida, idb)


def test_jaccard_lossless_on_planted_hot_fixture(spark):
    """Planted fixture shaped like web boilerplate: 40 docs share a
    hot shingle block; two docs are true near-dups. The true pair
    must be a candidate at any df distribution (prefix filtering is
    lossless), while total hits stay far below the unfiltered f²."""
    hot = list(range(100, 108))  # 8 boilerplate shingles in all docs
    # fillers: 72 unique shingles each, so filler-filler J = 8/144
    # < 0.1 — the boilerplate alone must NOT nominate them
    rows = [(i, hot + [10_000 + 100 * i + j for j in range(72)])
            for i in range(1, 41)]
    # true near-dup pair: ~93% overlapping sets (J = 25/27)
    base = [5_000 + j for j in range(18)]
    rows += [(41, hot + base), (42, hot + base[:-1] + [9_999])]
    docs, ex = _mk(spark, rows)
    hits = _jaccard_candidate_hits(docs, ex)
    cand = {(r["doc_a"], r["doc_b"]) for r in hits.collect()}
    assert (41, 42) in cand
    # unfiltered volume: the hot block alone is 8 x C(42,2) = 6888
    # hits; df-ordering pushes the hot shingles to the suffix ranks
    # and the position bound prunes the one prefix straggler, so the
    # filtered generator must beat even a SINGLE hot shingle's f²
    assert hits.count() < 861


def test_jaccard_prefix_filter_lossless_on_random_corpora(spark):
    """Property-based losslessness: on RANDOM small corpora (arbitrary
    shingle-set overlap structure, including pathological all-same and
    all-disjoint draws), the prefix+position+length candidate set must
    cover every true J >= 0.1 pair. Hypothesis drives the corpus shape;
    the brute-force python oracle is ground truth. One Spark run per
    example is expensive, so the corpus strategy is evaluated in a
    small number of drawn examples but each covers many docs/pairs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    corpus = st.lists(
        st.lists(
            st.integers(min_value=1, max_value=40), min_size=1, max_size=25
        ),
        min_size=2,
        max_size=18,
    )

    @settings(max_examples=12, deadline=None)
    @given(corpus)
    def check(doc_shingles):
        rows = [
            (i + 1, sorted(set(sh))) for i, sh in enumerate(doc_shingles)
        ]
        docs, ex = _mk(spark, rows)
        cand = {
            (r["doc_a"], r["doc_b"])
            for r in _jaccard_candidate_hits(docs, ex).collect()
        }
        for (ida, sa), (idb, sb) in combinations(
            [(i, set(sh)) for i, sh in rows], 2
        ):
            union = len(sa | sb)
            if union and len(sa & sb) / union >= JACCARD_THRESHOLD:
                assert (ida, idb) in cand, (ida, idb, sa, sb)

    check()


def test_r10_shuffle_staging_stays_lean(spark, sf_dir):
    """The round-10 staging rewrites (multi-consumer frames that were
    recomputing across the broadcast boundary) must keep their
    exchange counts at the rewritten level (measured 1/3/3; slack 1
    for planner drift)."""
    from big_data_final_project_spark.plans.audit import (
        PlanFacts,
        formatted_plan,
    )
    from big_data_final_project_spark.registry import catalog

    limits = {
        "graph_jaccard_neighbors": 2,
        "ml_learning_curve": 4,
        "ml_tree_depth2": 4,
        "text_bm25_topk": 4,
        "ts_dominant_period": 5,
        "curation_bigram_lm_heldout": 3,
        "curation_unigram_surprisal": 3,
        "events_cohort_ltv": 5,
        "ml_gbm_one_boost_round": 4,
    }
    cat = catalog()
    for name, max_shuffles in limits.items():
        p = PlanFacts(formatted_plan(cat[name].fn(spark, sf_dir)))
        assert p.shuffles <= max_shuffles, (
            f"{name}: {p.shuffles} shuffles > pinned {max_shuffles}"
        )
