"""Salted-join equivalence (SCALE.md skew pattern): identical result
multiset to the plain join, and the salt fans a hot key across
buckets."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.operators.salting import salted_inner_join


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey").collect()
    salted = salted_inner_join(li, o, "l_orderkey", salt_buckets=5).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    ).collect()
    key = lambda r: (r["l_orderkey"], r["l_quantity"], r["o_totalprice"])
    assert Counter(map(key, plain)) == Counter(map(key, salted))


def test_salt_spreads_hot_key(spark):
    """A single hot key must land in several salt buckets."""
    from big_data_final_project_spark.operators.salting import SALT_COL
    import pyspark.sql.functions as F

    hot = spark.range(10000).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    salted = hot.withColumn(
        SALT_COL, F.pmod(F.xxhash64("k", "payload"), F.lit(8))
    )
    buckets = salted.select(SALT_COL).distinct().count()
    assert buckets == 8
