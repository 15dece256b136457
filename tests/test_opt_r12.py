"""Focused tests for the round-12 optimization rewrites.

Each optimization that changed an operator's internals gets a direct
equivalence pin here, against an in-test reference implementation of
the OLD shape (explode + count), on a planted corpus that exercises
the edge cases the rewrite must preserve (single-token docs dropped,
NULL text dropped, ties, all-same docs, unicode)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_final_project_spark.queries.curation import (
    REP_TOP_BIGRAM_MAX,
    REP_TOP_TOKEN_MAX,
)



def _stage_docs(dirpath, docs) -> str:
    """Write a single-file documents.parquet (the loader reads a flat
    file, not a Spark part-directory)."""
    import os

    import pandas as pd

    os.makedirs(dirpath, exist_ok=True)
    pd.DataFrame(
        {
            "doc_id": [i for i, _ in docs],
            "text": [t for _, t in docs],
            "lang": ["en"] * len(docs),
            "source": ["src0"] * len(docs),
            "n_chars": [len(t or "") for _, t in docs],
        }
    ).to_parquet(os.path.join(dirpath, "documents.parquet"), index=False)
    return str(dirpath)


PLANTED_DOCS = [
    (1, "a b a b a c"),  # top token a=3/6, top bigram 'a b'=2/5
    (2, "x x x x"),  # all-same: top token 4/4, bigram 'x x'=3/3
    (3, "one two"),  # exactly two tokens
    (4, "solo"),  # single token -> dropped (no bigram)
    (5, ""),  # empty -> normalizes to [''] (size 1) -> dropped
    (6, None),  # NULL text -> dropped
    (7, "тест тест ok тест ok"),  # unicode + ties
    (8, "a  b\t b   a"),  # whitespace collapse: a b b a
]


def _reference_repetition(spark):
    """The pre-r12 shape: explode -> (doc, gram) count -> per-doc max
    -> inner joins. Kept verbatim as the semantic reference — except
    the tokenizer, which reuses the production _toks (ADVICE r12 #4:
    an inline copy would silently desynchronize this pin if the
    shared normalizer ever changed)."""
    from big_data_final_project_spark.queries.text import _toks

    d = spark.createDataFrame(PLANTED_DOCS, "doc_id long, text string").select(
        "doc_id", _toks(F.col("text")).alias("toks")
    )
    base = d.select("doc_id", F.size("toks").alias("n_toks"), "toks")
    tok_top = (
        base.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_tok"))
    )
    bigrams = F.expr(
        "transform(sequence(1, size(toks) - 1), i -> concat(toks[i - 1], ' ', toks[i]))"
    )
    big_top = (
        base.where(F.size("toks") >= 2)
        .select("doc_id", F.explode(bigrams).alias("gram"))
        .groupBy("doc_id", "gram")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_big"))
    )
    t_ratio = F.col("top_tok").cast("double") / F.col("n_toks")
    b_ratio = F.col("top_big").cast("double") / (F.col("n_toks") - 1)
    return (
        base.select("doc_id", "n_toks")
        .join(tok_top, "doc_id")
        .join(big_top, "doc_id")
        .select(
            "doc_id",
            F.col("n_toks").cast("long").alias("n_tokens"),
            t_ratio.alias("top_token_ratio"),
            b_ratio.alias("top_bigram_ratio"),
            (
                (t_ratio <= REP_TOP_TOKEN_MAX) & (b_ratio <= REP_TOP_BIGRAM_MAX)
            ).alias("passes_repetition"),
        )
    )


def test_repetition_runlength_matches_explode_count(spark, tmp_path):
    """The r12 sorted-array run-length rewrite of
    curation_repetition_stats returns exactly the rows the old
    explode+count+join form returned, on a corpus planting every edge
    the rewrite must preserve."""
    from big_data_final_project_spark.queries.curation import (
        curation_repetition_stats,
    )

    sf_dir = _stage_docs(tmp_path / "sf_planted", PLANTED_DOCS)

    got = {
        r["doc_id"]: r.asDict()
        for r in curation_repetition_stats(spark, sf_dir).collect()
    }
    want = {
        r["doc_id"]: r.asDict() for r in _reference_repetition(spark).collect()
    }
    assert got == want
    # the planted edges actually exercised: docs 4/5/6 dropped
    assert set(got) == {1, 2, 3, 7, 8}
    assert got[2]["top_token_ratio"] == 1.0 and got[2]["top_bigram_ratio"] == 1.0


def test_repetition_plan_has_no_exchange(spark, tmp_path):
    """The rewrite's point: the gate is a pure projection — no
    Exchange may appear in its physical plan."""
    from big_data_final_project_spark.queries.curation import (
        curation_repetition_stats,
    )

    sf_dir = _stage_docs(tmp_path / "sf_plan", [(1, "a b c a")])
    plan = (
        curation_repetition_stats(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_prefix_filter_join_array_verify_matches_bruteforce(spark, tmp_path):
    """r12 rewrote dedup_prefix_filter_join's verify step (per-pair
    array_intersect on hashed shingle arrays instead of two
    occurrence-relation joins). Pin the whole screen against an
    unfiltered quadratic reference on a planted corpus with
    near-duplicate pairs, a cross-lang pair that must NOT match, and
    a length-ratio-violating pair."""
    from big_data_final_project_spark.queries.dedup import (
        dedup_prefix_filter_join,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [
        (1, base, ),
        (2, base + " iota",),  # near-dup of 1 (J >= 0.5)
        (3, "totally different words here make no overlap at all",),
        (4, base,),  # exact dup of 1
        (5, " ".join(["alpha beta gamma"] * 12),),  # length-ratio breaker
    ]
    sf_dir = _stage_docs(tmp_path / "sf_pfj", docs)

    got = {
        (r["doc_a"], r["doc_b"]): (r["n_a"], r["n_b"], r["isect"], r["uni"])
        for r in dedup_prefix_filter_join(spark, sf_dir).collect()
    }

    # brute-force reference: distinct trigram sets per doc in Python
    def tris(text):
        toks = " ".join(text.lower().split()).split(" ")
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else None

    sets = {i: tris(t) for i, t in docs}
    want = {}
    for a in sorted(sets):
        for b in sorted(sets):
            if a >= b or sets[a] is None or sets[b] is None:
                continue
            na, nb = len(sets[a]), len(sets[b])
            isect = len(sets[a] & sets[b])
            uni = na + nb - isect
            if 2 * isect >= uni:
                want[(a, b)] = (na, nb, isect, uni)
    assert got == want
    assert (1, 2) in got and (1, 4) in got  # planted pairs found
    assert (1, 5) not in got  # length bound filtered
