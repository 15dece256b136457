"""Zipf natural-text fixture pins (VERDICT r11 #2).

The fixture converts the r11 skew-sweep zipf probe (Spark-only volume
and recall evidence) into standard oracle VALUE differentials. These
tests pin (a) the corpus content hash — numpy sampling drift or an
accidental regeneration fails HERE with a clear message instead of as
an opaque cross-engine mismatch; (b) the planted-pair ground truth the
screens must recover; (c) the headline volume/recall numbers SCALE.md
cites. The cross-engine hashes themselves are covered by the oracle
differential suite (the zipf_* queries are registered like any other).
"""

from __future__ import annotations

import pandas as pd
import pytest

from big_data_final_project_spark.queries.zipf import (
    FIXTURE_PATH,
    N_NEAR_DUP,
    N_RARE_SUBSET,
)

# update BOTH pins together when intentionally regenerating the corpus
EXPECTED_CONTENT_HASH = "7867640b0903494e3ca702109711df7f"
EXPECTED_DOCS = 1928


def test_fixture_content_hash_pinned():
    """The committed parquet matches the generator's seeded output —
    regenerate with tools/gen_zipf_fixture.py and update the pins here
    and in SCALE.md if this is ever intentional."""
    import sys
    import os

    sys.path.insert(
        0, os.path.join(os.path.dirname(FIXTURE_PATH), os.pardir, "tools")
    )
    from gen_zipf_fixture import build_corpus, content_hash

    committed = pd.read_parquet(FIXTURE_PATH)
    assert len(committed) == EXPECTED_DOCS
    regen = build_corpus()
    assert content_hash(regen) == EXPECTED_CONTENT_HASH
    pd.testing.assert_frame_equal(
        committed.reset_index(drop=True), regen.reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def planted_row(spark):
    from big_data_final_project_spark.queries.zipf import (
        zipf_planted_pairs_found,
    )

    return zipf_planted_pairs_found(spark, "unused").first()


def test_planted_recovery_scoreboard(planted_row):
    """All 20 near-dups via the strict screen, all 10 rare-slice
    subset pairs via the capped containment screen, ZERO hot-slice
    pairs (the df-cap's designed blind spot — if this ever becomes
    nonzero the cap semantics changed; if rare drops below 10 the
    screens lost recall on rare content)."""
    assert planted_row["ndup_pairs_found"] == N_NEAR_DUP
    assert planted_row["rare_subset_found"] == N_RARE_SUBSET
    assert planted_row["hot_subset_found"] == 0


def test_zipf_volume_audit_headline_numbers(spark):
    """The natural-text volume ledger SCALE.md cites: the tau = 1/2
    prefix sheds ~1000x of the unfiltered candidate mass, the
    stop-shingle cap refuses the majority of Σ C(df,2), and the
    audited counts stay tied to the real generator frames."""
    from big_data_final_project_spark.queries.dedup import (
        _jaccard_candidate_hits,
        _shingle_index_from,
    )
    from big_data_final_project_spark.queries.zipf import (
        _zipf_docs,
        zipf_candidate_volume_audit,
    )

    a = zipf_candidate_volume_audit(spark, "unused").first()
    assert a["unfiltered_pair_hits"] == 582_896
    assert a["jaccard_prefix_hits_strict"] == 576
    assert a["jaccard_prefix_hits_tau45"] == 103
    assert a["stop_shingle_pair_hits"] == 447_086
    assert (
        a["containment_pair_hits"] + a["stop_shingle_pair_hits"]
        == a["unfiltered_pair_hits"]
    )
    # >=1000x strict cut on natural-text df shape
    assert a["unfiltered_pair_hits"] >= 1000 * a["jaccard_prefix_hits_strict"]
    # forecast ties to the real generator frame on this corpus too
    docs, ex = _shingle_index_from(_zipf_docs(spark))
    assert (
        _jaccard_candidate_hits(docs, ex, 1, 2).count()
        == a["jaccard_prefix_hits_strict"]
    )


def test_zipf_recall_audit_prices_the_blind_spot(spark):
    """On zipf df shape the >=50%-containment ground truth is
    dominated by hot-shingle overlap, so the capped screen's recall
    is LOW here — the honest number (22,865 ppm) consumers must see
    before trusting the cap on boilerplate-heavy corpora. The capped
    count equals the registered screen's row count."""
    from big_data_final_project_spark.queries.zipf import (
        zipf_containment,
        zipf_containment_recall_audit,
    )

    r = zipf_containment_recall_audit(spark, "unused").first()
    assert r["n_capped_pairs"] == 30  # 10 rare-slice + 20 near-dup pairs
    assert r["n_true_pairs"] == 1312
    assert r["recall_ppm"] == 22_865
    assert r["n_capped_pairs"] == zipf_containment(spark, "unused").count()
