"""Bucketed-join tests (SCALE.md M6): same-bucketed tables join with
zero shuffle Exchanges, and the result matches the shuffled join."""

from __future__ import annotations

from collections import Counter

import pytest

from pyspark.sql import functions as F

from big_data_final_project_spark.data import load_table
from big_data_final_project_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from big_data_final_project_spark.plans.audit import audit


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "li_b", "l_orderkey", path=str(wh / "li_b"))
    write_bucketed(o, "o_b", "l_orderkey", path=str(wh / "o_b"))
    yield "li_b", "o_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    """With broadcast disabled (at real scale neither fact side fits
    a broadcast), the same-bucketed join must plan as a sort-merge
    join with ZERO shuffle Exchanges — the write-time shuffle paid
    once replaces the per-query shuffle forever."""
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "l_orderkey")
        facts = audit(joined)
        assert facts.shuffles == 0, facts.text
        assert facts.sortmerge_joins == 1, facts.text
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_shuffled_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    bucketed = bucketed_join(spark, lt, rt, "l_orderkey").collect()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey").collect()
    key = lambda r: tuple(r)
    assert Counter(map(key, bucketed)) == Counter(map(key, plain))
