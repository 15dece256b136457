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
