"""Round-8 invariants: exact-substring dedup spans, the finite-measure
contract, and the windowed quantile-sketch merge — properties the
oracle differential can't express (it proves cross-engine equality,
not internal consistency)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.registry import catalog


def _run(spark, sf_dir, name):
    return catalog()[name].fn(spark, sf_dir)


def test_exact_substr_spans_are_real_duplicates(spark, sf_dir):
    """Every extracted span's text must actually occur in at least one
    OTHER document — the soundness half of the k-gram relaxation (no
    false extraction shorter than the span's own leading K-gram)."""
    from big_data_final_project_spark.queries.dedup import ES_K

    spans = _run(spark, sf_dir, "dedup_exact_substr_spans").collect()
    assert spans, "test corpus should contain cross-doc duplicated spans"
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for s in spans[:50]:
        assert s["span_len_tokens"] >= ES_K
        assert s["n_dup_grams"] == s["span_len_tokens"] - ES_K + 1
        # the span's FIRST K tokens must appear in some other doc
        head = " ".join(s["span_text"].split(" ")[:ES_K])
        assert any(
            head in t for d, t in docs.items() if d != s["doc_id"]
        ), f"leading {ES_K}-gram of doc {s['doc_id']} span not duplicated"
        # and the span text is really at span_start in its own doc
        toks = docs[s["doc_id"]].split(" ")
        got = " ".join(
            toks[s["span_start"] - 1 : s["span_start"] - 1 + s["span_len_tokens"]]
        )
        assert got == s["span_text"]


def test_exact_substr_coverage_bounds_and_span_consistency(spark, sf_dir):
    """Coverage rows: every doc present, covered_tokens <= n_tokens,
    ppm in range, and coverage >= the longest single span of that doc
    (union can only grow)."""
    cov = {r["doc_id"]: r for r in _run(
        spark, sf_dir, "dedup_exact_substr_coverage"
    ).collect()}
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(cov) == n_docs
    best_span: dict[int, int] = {}
    for s in _run(spark, sf_dir, "dedup_exact_substr_spans").collect():
        best_span[s["doc_id"]] = max(
            best_span.get(s["doc_id"], 0), s["span_len_tokens"]
        )
    for doc_id, r in cov.items():
        assert 0 <= r["covered_tokens"] <= r["n_tokens"]
        assert 0 <= r["covered_ppm"] <= 1_000_000
        if doc_id in best_span:
            assert r["covered_tokens"] >= best_span[doc_id]
            assert r["n_spans"] >= 1
        else:
            assert r["covered_tokens"] == 0 and r["n_spans"] == 0


def test_finite_measure_contract(spark):
    """finite_measure: NULL stays NULL, finite passes through, NaN and
    ±Inf nullify — and the decimal cast downstream never faults."""
    from big_data_final_project_spark.functions.numeric import finite_measure

    df = spark.createDataFrame(
        [(1, 2.5), (2, float("nan")), (3, float("inf")),
         (4, float("-inf")), (5, None)],
        "id int, v double",
    )
    rows = {
        r["id"]: r["fv"]
        for r in df.select("id", finite_measure("v").alias("fv")).collect()
    }
    assert rows[1] == 2.5
    assert rows[2] is None and rows[3] is None and rows[4] is None
    assert rows[5] is None
    # the gated decimal sum is exactly the finite subtotal
    total = df.agg(
        F.sum(finite_measure("v").cast("decimal(18,6)"))
        .cast("double")
        .alias("t")
    ).collect()[0]["t"]
    assert total == 2.5


def test_finite_measure_sql_matches_spark(spark):
    """The DuckDB rendering agrees with the Spark Column on all five
    input classes."""
    import duckdb

    from big_data_final_project_spark.functions.numeric import (
        finite_measure_sql,
    )

    got = duckdb.sql(
        f"""
        SELECT id, {finite_measure_sql("v")} AS fv
        FROM (VALUES (1, 2.5), (2, 'nan'::DOUBLE), (3, 'inf'::DOUBLE),
                     (4, '-inf'::DOUBLE), (5, NULL)) AS t(id, v)
        ORDER BY id
        """
    ).fetchall()
    assert got[0][1] == 2.5
    assert all(v is None for _i, v in got[1:])


def test_quantile_sketch_windowed_brackets_true_rolling_p90(spark, sf_dir):
    """The rolling-merged sketch's p90 bracket must contain the TRUE
    trailing-3-day p90 (exact rank over the raw finite cents)."""
    from big_data_final_project_spark.functions.numeric import finite_measure

    rows = _run(spark, sf_dir, "agg_quantile_sketch_windowed").collect()
    assert rows
    e = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        (finite_measure("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    ).where(F.col("cents").isNotNull())
    by_day: dict = {}
    for r in e.collect():
        by_day.setdefault(r["day"], []).append(r["cents"])
    days = sorted(by_day)
    for row in rows[:10]:
        d = row["day"]
        window = sorted(
            c
            for dd in days
            if 0 <= (d - dd).days <= 2
            for c in by_day[dd]
        )
        assert len(window) == row["n_3d"]
        rank = math.ceil(0.9 * len(window))
        truth = window[rank - 1]
        assert row["p90_lo_cents"] <= truth <= row["p90_hi_cents"]


def test_span_cut_complements_coverage(spark, sf_dir):
    """The CUT is exactly the complement of the coverage union:
    n_kept_tokens == n_tokens - covered_tokens for every doc, and the
    cleaned text has exactly n_kept tokens."""
    cov = {
        r["doc_id"]: r
        for r in _run(spark, sf_dir, "dedup_exact_substr_coverage").collect()
    }
    for r in _run(spark, sf_dir, "curation_span_cut").collect():
        c = cov[r["doc_id"]]
        assert r["n_tokens"] == c["n_tokens"]
        assert r["n_kept_tokens"] == c["n_tokens"] - c["covered_tokens"]
        n_text_toks = len(r["cleaned_text"].split(" ")) if r["cleaned_text"] else 0
        assert n_text_toks == r["n_kept_tokens"]
