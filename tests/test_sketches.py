"""Sketch-surface properties the oracle differential can't express:
HLL estimates have no cross-engine oracle, but their MERGEABILITY —
union of per-day partial sketches == sketch of the whole table — is
exactly what makes them usable at 100 TB, and it is testable
bit-for-bit inside Spark. (The exact bitmap path is oracle-paired as
`agg_bitmap_distinct`; the HLL estimate path is rows-only as
`agg_approx_distinct`.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_final_project_spark.data import load_table


def test_hll_partial_merge_equals_full_sketch(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    full = e.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("est")
    ).collect()[0]["est"]
    merged = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
        .collect()[0]["est"]
    )
    assert merged == full
    exact = e.select("user_id").distinct().count()
    assert abs(merged - exact) <= max(1, exact * 0.05)


def test_bitmap_count_equals_exact_distinct(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    got = (
        e.selectExpr(
            "event_type",
            "bitmap_bucket_number(user_id) AS bk",
            "bitmap_bit_position(user_id) AS bp",
        )
        .groupBy("event_type", "bk")
        .agg(F.expr("bitmap_construct_agg(bp)").alias("bm"))
        .groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("n"))
    )
    want = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n")
    )
    assert {(r["event_type"], r["n"]) for r in got.collect()} == {
        (r["event_type"], r["n"]) for r in want.collect()
    }


def test_quantile_sketch_bracket_contains_exact_quantile(spark, sf_dir):
    """The HDR-lite quantile sketch's rank answers must BRACKET the
    true order statistic with relative width <= 1/16 — the guarantee
    the oracle differential can't see (it proves merge == direct, not
    accuracy). Truth here is the exact rank-r cents from a full sort
    at test scale."""
    from big_data_final_project_spark.queries.sketches import (
        QSK_SUB_BITS,
        agg_quantile_sketch_rank,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )
    cents = sorted(r["cents"] for r in li.collect())
    for row in agg_quantile_sketch_rank(spark, sf_dir).collect():
        r = row["rank_r"]
        assert row["n_total"] == len(cents)
        truth = cents[r - 1]  # rank is 1-based
        assert row["est_lo_cents"] <= truth <= row["est_hi_cents"], (
            f"q{row['q_pct']}: truth {truth} outside "
            f"[{row['est_lo_cents']}, {row['est_hi_cents']}]"
        )
        width = row["est_hi_cents"] - row["est_lo_cents"]
        assert width <= max(0, row["est_lo_cents"] >> QSK_SUB_BITS), (
            f"bucket wider than the 1/{1 << QSK_SUB_BITS} guarantee"
        )


def test_quantile_sketch_hist_totals_and_disjoint_buckets(spark, sf_dir):
    """Merged histogram accounting: bucket counts sum to the row
    count, buckets are disjoint ordered intervals, and every raw
    value falls inside its bucket's [lo, hi]."""
    from big_data_final_project_spark.queries.sketches import (
        agg_quantile_sketch_hist,
    )

    li = load_table(spark, sf_dir, "lineitem")
    rows = agg_quantile_sketch_hist(spark, sf_dir).collect()
    assert sum(r["n"] for r in rows) == li.count()
    assert rows[-1]["cum_n"] == li.count()
    prev_hi = -1
    for r in rows:
        assert r["lo_cents"] <= r["hi_cents"]
        assert r["lo_cents"] > prev_hi, "buckets must be disjoint ascending"
        prev_hi = r["hi_cents"]
