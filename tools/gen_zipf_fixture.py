#!/usr/bin/env python
"""Deterministic zipf natural-text corpus fixture (VERDICT r11 #2).

Round 11's skew-sweep zipf probe measured the screens' candidate-volume
cut and planted-pair recall on a natural-text df shape — but Spark-side
only. This fixture converts that evidence class into standard VALUE
differentials: a committed parquet corpus whose token frequencies are
zipf(a=1.2) (heavy head, long tail — the df shape of real text, unlike
the uniform-dense synthetic documents tables), with planted duplicate
structure whose ground truth is known by construction. queries/zipf.py
registers the dedup screen family over it with full DuckDB oracles.

Planted structure (all tokens exactly 6 chars, so twin docs land in the
same (lang, len_bucket) block by construction):
 * 20 near-duplicate pairs (doc_id 200000+2i / +1): 120 tokens, 4
   replaced — bigram Jaccard ~0.85, the strict tau = 1/2 screen must
   find all 20;
 * 10 rare-slice containment pairs (300000+2i / +1): a shared 70-token
   segment of pair-unique (df = 2) tokens + 50-token unique tails —
   containment 69/119 ~ 0.58, Jaccard ~0.41: invisible to the strict
   jaccard screen, found by the df-capped containment screen because
   the shared shingles are rare;
 * 10 hot-slice containment pairs (400000+2i / +1): body = the 8
   hottest vocab words repeated 10x + 5-token unique tails —
   containment 8/13 ~ 0.62 through STOP-SHINGLES ONLY (a 62-doc
   boilerplate cohort per lang, ids 500000+, pins those bigrams'
   df above the cap), so the capped screen is blind by design and the
   recall audit must show exactly this loss;
 * 1600 background docs (ids 1..1600), 60-180 zipf tokens each.

Regeneration is exact: numpy PCG64 seeded, no wall clock anywhere.
tests/test_zipf_fixture.py pins the corpus content hash so silent
drift (or a numpy sampling change) fails the suite rather than the
cross-engine differential.

Usage:  python tools/gen_zipf_fixture.py   # writes fixtures/zipf_documents.parquet
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from big_data_final_project_spark.queries.zipf import (  # noqa: E402
    COHORT_BASE,
    FIXTURE_PATH,
    HOT_SUBSET_BASE,
    N_HOT_SUBSET,
    N_NEAR_DUP,
    N_RARE_SUBSET,
    NEAR_DUP_BASE,
    RARE_SUBSET_BASE,
)

OUT = FIXTURE_PATH

SEED = 20260816
VOCAB = 8000
ZIPF_A = 1.2
LANGS = ("en", "de", "fr", "es")
N_BACKGROUND = 1600
COHORT_PER_LANG = 62


def _word(rank: int) -> str:
    return f"w{rank:05d}"


def build_corpus() -> pd.DataFrame:
    rng = np.random.default_rng(SEED)
    ranks = np.arange(1, VOCAB + 1, dtype="float64")
    p = ranks**-ZIPF_A
    p /= p.sum()

    def draw(n: int) -> list[str]:
        return [_word(int(r)) for r in rng.choice(VOCAB, size=n, p=p)]

    rows: list[tuple] = []

    def add(doc_id: int, toks: list[str], lang: str) -> None:
        text = " ".join(toks)
        rows.append((doc_id, text, lang, "zipf", len(text)))

    # background: zipf token streams, 60-180 tokens
    for i in range(N_BACKGROUND):
        t = int(rng.integers(60, 181))
        add(i + 1, draw(t), LANGS[i % len(LANGS)])

    # near-dup pairs: 120 tokens, 4 replaced in the twin (q-namespace,
    # same 6-char width so n_chars and therefore the block match)
    for i in range(N_NEAR_DUP):
        toks = draw(120)
        twin = list(toks)
        for k, pos in enumerate(
            rng.choice(120, size=4, replace=False)
        ):
            twin[int(pos)] = f"q{i:02d}{k:03d}"
        lang = LANGS[i % len(LANGS)]
        add(NEAR_DUP_BASE + 2 * i, toks, lang)
        add(NEAR_DUP_BASE + 2 * i + 1, twin, lang)

    # rare-slice containment pairs: shared pair-unique 70-token segment
    # (df = 2 shingles -> always cap-eligible) + 50-token unique tails
    for i in range(N_RARE_SUBSET):
        seg = [f"r{i:02d}{j:03d}" for j in range(70)]
        tail_a = [f"u{i:02d}a{j:02d}" for j in range(50)]
        tail_b = [f"u{i:02d}b{j:02d}" for j in range(50)]
        lang = LANGS[i % len(LANGS)]
        add(RARE_SUBSET_BASE + 2 * i, seg + tail_a, lang)
        add(RARE_SUBSET_BASE + 2 * i + 1, seg + tail_b, lang)

    # boilerplate cohort: B+B prefix (so the B->B junction bigram is
    # also hot) + 69 zipf tokens = 85 tokens, the same length bucket
    # as the hot-slice pairs below
    boiler = [_word(r) for r in range(8)]
    for li, lang in enumerate(LANGS):
        for c in range(COHORT_PER_LANG):
            add(COHORT_BASE + 1000 * li + c, boiler * 2 + draw(69), lang)

    # hot-slice containment pairs: body = B x 10 (80 tokens, all
    # bigrams are cohort-hot stop-shingles) + 5-token unique tails
    for i in range(N_HOT_SUBSET):
        tail_a = [f"h{i:02d}a{j:02d}" for j in range(5)]
        tail_b = [f"h{i:02d}b{j:02d}" for j in range(5)]
        lang = LANGS[i % len(LANGS)]
        add(HOT_SUBSET_BASE + 2 * i, boiler * 10 + tail_a, lang)
        add(HOT_SUBSET_BASE + 2 * i + 1, boiler * 10 + tail_b, lang)

    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    return pdf.astype(
        {"doc_id": "int64", "n_chars": "int64"}
    ).sort_values("doc_id").reset_index(drop=True)


def content_hash(pdf: pd.DataFrame) -> str:
    """Writer-independent corpus digest: md5 over the sorted
    (doc_id, lang, text) rows — what the tests pin."""
    import hashlib

    h = hashlib.md5()
    for r in pdf.itertuples(index=False):
        h.update(f"{r.doc_id}\x1f{r.lang}\x1f{r.text}\n".encode())
    return h.hexdigest()


def main() -> None:
    pdf = build_corpus()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pdf.to_parquet(OUT, index=False)
    print(f"wrote {OUT}: {len(pdf)} docs, content_hash={content_hash(pdf)}")


if __name__ == "__main__":
    main()
