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


def test_salted_skew_join_equals_plain_join(spark):
    """Conditional-salting join (salted_skew_join): identical result
    multiset to the plain join at EVERY hot threshold — routing must
    never change matching — and the hot path must fan the hot key's
    build rows across salt slots when the threshold is crossed."""
    from big_data_final_project_spark.operators.salting import (
        SKEW_HOT_THRESHOLD_CONF,
        SKEW_N_SALTS_CONF,
        salted_skew_join,
    )

    # one hot key (5000 rows) + 200 cold keys (10 rows each)
    probe = spark.range(5000).select(
        F.lit(0).alias("k"), F.col("id").alias("payload")
    ).unionByName(
        spark.range(2000).select(
            (F.col("id") % 200 + 1).alias("k"), (F.col("id") + 10_000).alias("payload")
        )
    )
    build = probe.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("payload").alias("total")
    )
    plain = probe.join(build, "k").select("k", "payload", "total").collect()
    key = lambda r: (r["k"], r["payload"], r["total"])
    for threshold in ("100", "1000000"):
        spark.conf.set(SKEW_HOT_THRESHOLD_CONF, threshold)
        spark.conf.set(SKEW_N_SALTS_CONF, "8")
        try:
            salted = salted_skew_join(
                probe, build, "k", "n", F.xxhash64("payload")
            ).select("k", "payload", "total").collect()
        finally:
            spark.conf.unset(SKEW_HOT_THRESHOLD_CONF)
            spark.conf.unset(SKEW_N_SALTS_CONF)
        assert Counter(map(key, plain)) == Counter(map(key, salted)), threshold


def test_salted_skew_join_spreads_hot_key_only(spark):
    """With the threshold between cold (10) and hot (5000) key counts,
    the hot key's probe rows occupy every salt slot while cold keys
    stay in slot 0 — observed through the pre-drop salted frames."""
    from big_data_final_project_spark.operators.salting import (
        SKEW_HOT_THRESHOLD_CONF,
        SKEW_N_SALTS_CONF,
        salted_skew_join,
    )

    probe = spark.range(5000).select(
        F.lit(0).alias("k"), F.col("id").alias("payload")
    ).unionByName(
        spark.range(100).select(
            (F.col("id") % 10 + 1).alias("k"), (F.col("id") + 10_000).alias("payload")
        )
    )
    build = probe.groupBy("k").agg(F.count("*").alias("n"))
    spark.conf.set(SKEW_HOT_THRESHOLD_CONF, "100")
    spark.conf.set(SKEW_N_SALTS_CONF, "8")
    try:
        joined = salted_skew_join(probe, build, "k", "n", F.xxhash64("payload"))
        # per-key distinct build replicas consumed == salt slots touched
        per_key = (
            joined.groupBy("k")
            .agg(F.countDistinct(F.pmod(F.xxhash64("payload"), F.lit(8))).alias("slots"))
            .collect()
        )
    finally:
        spark.conf.unset(SKEW_HOT_THRESHOLD_CONF)
        spark.conf.unset(SKEW_N_SALTS_CONF)
    slots = {r["k"]: r["slots"] for r in per_key}
    assert slots[0] == 8  # hot key fanned across all salt slots


def test_salted_skew_join_auto_threshold(spark):
    """With NO conf set (VERDICT r9 #3), the threshold is derived from
    the build's exact counts: a key holding more rows than a shuffle
    partition's fair share goes hot; results still equal the plain
    join (routing independence)."""
    from big_data_final_project_spark.operators.salting import (
        SKEW_AUTO_FLOOR,
        SKEW_BROADCAST_ROWS_CONF,
        auto_hot_threshold,
        salted_skew_join,
    )

    # hot key = 5000 of 7000 rows; fair share at 16-ish partitions is
    # a few hundred, so ONLY the hot key crosses the auto threshold
    probe = spark.range(5000).select(
        F.lit(0).alias("k"), F.col("id").alias("payload")
    ).unionByName(
        spark.range(2000).select(
            (F.col("id") % 200 + 1).alias("k"),
            (F.col("id") + 10_000).alias("payload"),
        )
    )
    build = probe.groupBy("k").agg(F.count("*").alias("n"))
    thr = auto_hot_threshold(build, "n")
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert thr == max(SKEW_AUTO_FLOOR, 7000 // nparts)
    assert thr < 5000  # the hot key IS auto-detected
    assert thr > 10  # and the cold keys are NOT
    plain = probe.join(build, "k").select("k", "payload").collect()
    # broadcastRows=0 forces the salted shuffle path (the too-big-to-
    # broadcast regime) so the AUTO threshold routing itself is what
    # gets exercised, not the broadcast shortcut
    spark.conf.set(SKEW_BROADCAST_ROWS_CONF, "0")
    try:
        salted = salted_skew_join(
            probe, build, "k", "n", F.xxhash64("payload")
        ).select("k", "payload").collect()
    finally:
        spark.conf.unset(SKEW_BROADCAST_ROWS_CONF)
    key = lambda r: (r["k"], r["payload"])
    assert Counter(map(key, plain)) == Counter(map(key, salted))


def test_salted_skew_join_broadcast_shortcut(spark):
    """With no threshold override and a build under the broadcast-row
    cap, the join must plan as a broadcast hash join (no probe
    shuffle — skew structurally impossible) and return the plain-join
    rows."""
    from big_data_final_project_spark.operators.salting import salted_skew_join

    probe = spark.range(2000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("payload")
    )
    build = probe.groupBy("k").agg(F.count("*").alias("n"))
    out = salted_skew_join(probe, build, "k", "n", F.xxhash64("payload"))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" not in plan  # shortcut taken, salting machinery absent
    plain = probe.join(build, "k").select("k", "payload").collect()
    got = out.select("k", "payload").collect()
    key = lambda r: (r["k"], r["payload"])
    assert Counter(map(key, plain)) == Counter(map(key, got))


def test_salted_skew_join_null_salt_src_keeps_rows(spark):
    """A NULL probe_salt_src on a hot row must route to slot 0, not
    drop the row (ADVICE r9)."""
    from big_data_final_project_spark.operators.salting import (
        SKEW_HOT_THRESHOLD_CONF,
        salted_skew_join,
    )

    probe = spark.range(500).select(
        F.lit(0).alias("k"), F.col("id").alias("payload")
    )
    build = probe.groupBy("k").agg(F.count("*").alias("n"))
    spark.conf.set(SKEW_HOT_THRESHOLD_CONF, "10")  # force hot
    try:
        out = salted_skew_join(
            probe, build, "k", "n", F.lit(None).cast("long")
        )
        assert out.count() == 500
    finally:
        spark.conf.unset(SKEW_HOT_THRESHOLD_CONF)


def test_salted_skew_join_guards_and_output_columns(spark):
    """count_col is consumed and dropped; reserved/ambiguous input
    columns are rejected up front (ADVICE r9)."""
    import pytest

    from big_data_final_project_spark.operators.salting import salted_skew_join

    probe = spark.range(100).select(
        F.lit(0).alias("k"), F.col("id").alias("payload")
    )
    build = probe.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("payload").alias("total")
    )
    out = salted_skew_join(probe, build, "k", "n", F.xxhash64("payload"))
    assert set(out.columns) == {"k", "payload", "total"}  # no n, no _salt
    with pytest.raises(ValueError, match="_salt"):
        salted_skew_join(
            probe.withColumn("_salt", F.lit(1)), build, "k", "n",
            F.xxhash64("payload"),
        )
    with pytest.raises(ValueError, match="count_col"):
        salted_skew_join(
            probe.withColumn("n", F.lit(1)), build, "k", "n",
            F.xxhash64("payload"),
        )


def test_salted_skew_join_byte_gate_blocks_wide_build(spark):
    """ADVICE r10: a build under the ROW cap but with a wide payload
    (array column -> pessimistic schema-width estimate over the byte
    cap) must NOT be broadcast — the salted path plans instead, and
    the rows still match the plain join."""
    from big_data_final_project_spark.operators.salting import (
        SKEW_BROADCAST_BYTES_CONF,
        _estimated_row_bytes,
        salted_skew_join,
    )

    probe = spark.range(2000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("payload")
    )
    wide = probe.groupBy("k").agg(
        F.count("*").alias("n"), F.collect_list("payload").alias("bulk")
    )
    # 50 rows x ~1KB estimate = ~52 KB; force the gate low enough to trip
    spark.conf.set(SKEW_BROADCAST_BYTES_CONF, "1024")
    try:
        out = salted_skew_join(probe, wide, "k", "n", F.xxhash64("payload"))
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "_salt" in plan  # broadcast shortcut refused, salted path
        assert out.count() == 2000
    finally:
        spark.conf.unset(SKEW_BROADCAST_BYTES_CONF)
    # narrow build at the default caps still takes the shortcut
    narrow = probe.groupBy("k").agg(F.count("*").alias("n"))
    assert _estimated_row_bytes(narrow.schema) < 64
    out2 = salted_skew_join(probe, narrow, "k", "n", F.xxhash64("payload"))
    assert "_salt" not in out2._jdf.queryExecution().optimizedPlan().toString()


def test_byte_gate_measures_nested_builds(spark):
    """VERDICT r11 #4: a build whose rows pass the ROW cap and whose
    flat schema estimate passes the BYTE cap, but whose arrays are
    actually huge, must NOT be broadcast at the DEFAULT caps — the
    gate now measures nested bytes from the staged build. A build
    with genuinely small arrays keeps the map-side shortcut."""
    from big_data_final_project_spark.operators.salting import (
        SKEW_BROADCAST_BYTES_DEFAULT,
        _estimated_row_bytes,
        salted_skew_join,
    )

    probe = spark.range(5000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("payload")
    )
    counts = probe.groupBy("k").agg(F.count("*").alias("n"))
    # 100 rows x 20k md5 strings ~ 70 MB JSON — over the 64 MB default
    big = counts.withColumn(
        "bulk",
        F.transform(
            F.sequence(F.lit(0), F.lit(19_999)),
            lambda i: F.md5(i.cast("string")),
        ),
    )
    # the OLD flat 1 KB nested estimate would have let this broadcast
    assert (
        100 * _estimated_row_bytes(big.schema)
        <= SKEW_BROADCAST_BYTES_DEFAULT
    )
    out = salted_skew_join(probe, big, "k", "n", F.xxhash64("payload"))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in plan  # measured bytes refuse the broadcast
    assert out.count() == 5000

    small = counts.withColumn(
        "bulk", F.array(F.lit("a"), F.lit("b"), F.lit("c"))
    )
    out2 = salted_skew_join(probe, small, "k", "n", F.xxhash64("payload"))
    assert (
        "_salt" not in out2._jdf.queryExecution().optimizedPlan().toString()
    )
    assert out2.count() == 5000


def test_byte_gate_floors_digit_compressed_arrays(spark):
    """r12 review: JSON under-counts SMALL numerics in containers (an
    element holding 0..9 is 1-2 JSON bytes vs 8 bytes of
    UnsafeArrayData) — a build of single-digit long arrays could pass
    the JSON-measured cap while its in-memory broadcast is ~4x over.
    The binary floor (element count x physical width) must refuse it;
    an identical build whose JSON measure alone already exceeds the
    cap keeps failing too (max() never loosens the old gate)."""
    from big_data_final_project_spark.operators.salting import (
        SKEW_BROADCAST_BYTES_CONF,
        salted_skew_join,
    )

    probe = spark.range(2000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("payload")
    )
    counts = probe.groupBy("k").agg(F.count("*").alias("n"))
    # 50 rows x 4000 single-digit ints: JSON ~2 B/elem ~ 0.4 MB
    # (under a 512 KB cap), binary floor 4 B/elem = 0.8 MB (over it)
    digits = counts.withColumn(
        "bulk",
        F.transform(F.sequence(F.lit(1), F.lit(4000)), lambda i: i % 10),
    )
    spark.conf.set(SKEW_BROADCAST_BYTES_CONF, str(1 << 19))
    try:
        out = salted_skew_join(probe, digits, "k", "n", F.xxhash64("payload"))
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "_salt" in plan  # the floor refuses the broadcast
        assert out.count() == 2000
        # tiny arrays still fit under the same cap -> shortcut kept
        small = counts.withColumn(
            "bulk", F.sequence(F.lit(1), F.lit(3))
        )
        out2 = salted_skew_join(probe, small, "k", "n", F.xxhash64("payload"))
        assert (
            "_salt"
            not in out2._jdf.queryExecution().optimizedPlan().toString()
        )
        assert out2.count() == 2000
    finally:
        spark.conf.unset(SKEW_BROADCAST_BYTES_CONF)


def test_auto_hot_threshold_matches_join_inline_formula(spark):
    """ADVICE r10: the public helper and the join's inline decision
    derive from ONE shared formula — assert they agree, including the
    precomputed-total fast path."""
    from big_data_final_project_spark.operators.salting import (
        _fair_share_threshold,
        auto_hot_threshold,
    )

    probe = spark.range(7000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("payload")
    )
    build = probe.groupBy("k").agg(F.count("*").alias("n"))
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    expected = _fair_share_threshold(7000, nparts)
    assert auto_hot_threshold(build, "n") == expected
    assert auto_hot_threshold(build, "n", total=7000) == expected
