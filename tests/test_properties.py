"""Hypothesis property tests (SURVEY.md §5.3/§5.5): reference
semantics that must hold for ALL inputs, not just fixtures."""

from __future__ import annotations

from datetime import timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_final_project_spark.functions.ranges import (
    DEFAULT_RANGE,
    TIME_RANGES,
    range_delta,
)
from big_data_final_project_spark.sources.weather import flatten_weather_response

# -- P9: time-range builder ------------------------------------------------


@given(st.text(max_size=20))
def test_unknown_labels_default_to_24h(label):
    if label in TIME_RANGES:
        assert range_delta(label) == TIME_RANGES[label]
    else:
        assert range_delta(label) == timedelta(hours=24)


def test_known_ranges_exact():
    assert range_delta("1h") == timedelta(hours=1)
    assert range_delta("7d") == timedelta(days=7)
    assert range_delta("30d") == timedelta(days=30)
    assert range_delta(DEFAULT_RANGE) == timedelta(hours=24)


# -- P1/P2: flattening never raises, degrades to nulls ---------------------

_any_json = st.recursive(
    st.none() | st.booleans() | st.integers() | st.floats(allow_nan=False) | st.text(max_size=10),
    lambda children: st.dictionaries(st.text(max_size=8), children, max_size=4),
    max_leaves=10,
)


@settings(max_examples=200, deadline=None)
@given(st.none() | st.dictionaries(st.sampled_from(
    ["location", "current", "other"]), _any_json, max_size=3))
def test_flatten_total_on_arbitrary_responses(resp):
    """The flattener is TOTAL over arbitrary nested responses: any
    shape yields either None (no response) or a 10-field record with
    absent paths as None (reference producer.py:92-100 .get chains)."""
    try:
        rec = flatten_weather_response(resp)
    except (TypeError, ValueError, AttributeError) as ex:  # numeric coercion of junk
        # only the documented coercion of temp/humidity/wind may
        # reject a value; dict-shape traversal itself must not
        assert any(k in str(ex) for k in ("float", "bool", "int", "str")), ex
        return
    if resp is None:
        assert rec is None
        return
    assert set(rec) == {
        "producer_timestamp", "location_name", "region", "country",
        "temp_c", "humidity", "wind_kph", "condition_text", "is_day",
        "api_time",
    }


# -- M3: SQL and DataFrame forms agree -------------------------------------


def test_sql_and_dataframe_forms_agree(spark, sf_dir):
    from big_data_final_project_spark.registry import catalog

    cat = catalog()
    sql_rows = {
        tuple(r)
        for r in cat["sql_surface_q1"].fn(spark, sf_dir)
        .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
        .collect()
    }
    df_rows = {
        (r["l_returnflag"], r["l_linestatus"], r["sum_qty"], r["count_order"])
        for r in cat["tpch_q1_pricing_summary"].fn(spark, sf_dir).collect()
    }
    assert sql_rows == df_rows


# -- dedup_clusters invariants ---------------------------------------------


def test_cluster_invariants(spark, sf_dir):
    """Connected-components postconditions: (a) both endpoints of
    every candidate pair share a cluster; (b) each cluster's id is
    the min member (canonical survivor is stable); (c) every node in
    the pair graph is labeled exactly once."""
    from big_data_final_project_spark.registry import catalog

    cat = catalog()
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in cat["dedup_minhash_pairs"].fn(spark, sf_dir).collect()
    }
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in cat["dedup_clusters"].fn(spark, sf_dir).collect()
    }
    assert pairs, "corpus must contain planted near-dup pairs"
    for a, b in pairs:
        assert labels[a] == labels[b], (a, b)
    nodes = {d for p in pairs for d in p}
    assert set(labels) == nodes  # exactly the pair-graph nodes, once each
    from collections import defaultdict

    members = defaultdict(set)
    for n, c in labels.items():
        members[c].add(n)
    for c, ms in members.items():
        assert c == min(ms), (c, ms)


def test_moments_match_builtin_aggregates(spark, sf_dir):
    """agg_stats_moments computes skew/kurtosis/stddev via exact
    decimal power sums (oracle-paired, order-independent). The
    built-in single-pass aggregates must agree within float tolerance
    — this pins the deterministic identity to Spark's implementation
    without importing its partition-order low-bit drift."""
    from pyspark.sql import functions as F

    from big_data_final_project_spark.data import load_table
    from big_data_final_project_spark.registry import catalog

    det = {
        r["l_linestatus"]: r
        for r in catalog()["agg_stats_moments"].fn(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    builtin = {
        r["l_linestatus"]: r
        for r in li.groupBy("l_linestatus")
        .agg(
            F.stddev_samp("l_quantity").alias("sd_qty"),
            F.var_samp("l_quantity").alias("var_qty"),
            F.skewness("l_quantity").alias("skew_qty"),
            F.kurtosis("l_quantity").alias("kurt_qty"),
        )
        .collect()
    }
    assert det.keys() == builtin.keys()
    for k in det:
        for col in ("sd_qty", "var_qty", "skew_qty", "kurt_qty"):
            a, b = det[k][col], builtin[k][col]
            assert abs(a - b) <= 1e-8 * max(1.0, abs(b)), (k, col, a, b)


def test_na_drop_agrees_with_fused_audit(spark, sf_dir):
    """null_hygiene fused its four scans into one conditional
    aggregate; the na.drop / na.replace API surface itself is pinned
    here: complete-case count via na.drop equals the fused query's
    n_complete, and na.replace rewrites match the when/otherwise
    form."""
    from pyspark.sql import functions as F

    from big_data_final_project_spark.data import load_table
    from big_data_final_project_spark.registry import catalog

    audit = catalog()["null_hygiene"].fn(spark, sf_dir).collect()[0]
    c = load_table(spark, sf_dir, "customer")
    dirty = c.select(
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")).alias("bal"),
    )
    assert dirty.na.drop(subset=["seg", "bal"]).count() == audit["n_complete"]
    assert (
        dirty.na.drop(how="all", subset=["seg", "bal"]).count()
        >= audit["n_complete"]
    )
    replaced = dirty.na.replace("AUTOMOBILE", "CAR", subset=["seg"])
    n_car = replaced.where(F.col("seg") == "CAR").count()
    n_auto = dirty.where(F.col("seg") == "AUTOMOBILE").count()
    assert n_car == n_auto


def test_pagerank_fixed_point_invariant_to_parallelism(spark, sf_dir):
    """int64 fixed-point PageRank must be BIT-identical regardless of
    shuffle partitioning — the property float PageRank cannot give."""
    from big_data_final_project_spark.operators.scale import _SESSION_CACHE
    from big_data_final_project_spark.queries import graph

    def run():
        _SESSION_CACHE.clear()
        return [
            tuple(r)
            for r in graph.graph_pagerank(spark, sf_dir).collect()
        ]

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = run()
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        _SESSION_CACHE.clear()
    assert a == b


def test_chunk_geometry_covers_every_token():
    """Pure-formula property of text_chunk_documents' geometry: for
    any token count, the 1 + ceil(max(n-W,0)/S) chunks cover every
    token index, consecutive chunks overlap by exactly W-S (except a
    shorter final chunk), and no chunk is empty."""
    from hypothesis import given
    from hypothesis import strategies as st

    from big_data_final_project_spark.queries.text import CHUNK_S, CHUNK_W

    @given(st.integers(min_value=1, max_value=5000))
    def check(n):
        nc = 1 + max(0, (n - CHUNK_W + CHUNK_S - 1)) // CHUNK_S
        covered = set()
        for i in range(nc):
            start = i * CHUNK_S  # 0-based
            chunk = range(start, min(start + CHUNK_W, n))
            assert len(chunk) > 0, (n, i, nc)
            covered.update(chunk)
        assert covered == set(range(n)), n
        # one more chunk would be redundant (fully inside the last)
        extra_start = nc * CHUNK_S
        assert extra_start >= n or set(range(extra_start, n)) <= covered

    check()


# -- operators: cell-blocked interval overlap ------------------------------


def _brute_overlaps(aset, bset):
    out = set()
    for aid, a_s, a_e in aset:
        for bid, b_s, b_e in bset:
            if a_s < b_e and b_s < a_e:
                out.add((aid, bid, max(a_s, b_s), min(a_e, b_e) - max(a_s, b_s)))
    return out


def test_interval_overlap_operator_matches_bruteforce(spark):
    """Randomized interval sets (+ adversarial edges: touching
    endpoints, exactly-cell-width spans, cell-boundary starts) —
    the cell-blocked equi-join must reproduce the naive quadratic
    join exactly, each pair once."""
    import numpy as np

    from big_data_final_project_spark.operators.intervals import overlap_pairs

    CELL = 64
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = 120
        a_start = rng.integers(0, 2000, n)
        a_len = rng.integers(1, CELL + 1, n)  # max exactly one cell
        b_start = rng.integers(0, 2000, n)
        b_len = rng.integers(1, CELL + 1, n)
        aset = [(int(i), int(s), int(s + l)) for i, (s, l) in
                enumerate(zip(a_start, a_len))]
        bset = [(int(i), int(s), int(s + l)) for i, (s, l) in
                enumerate(zip(b_start, b_len))]
        # adversarial edges
        aset += [(1000, 128, 192), (1001, 100, 101), (1002, 0, 64)]
        bset += [(2000, 192, 256),  # touches 1000 at 192: NO overlap
                 (2001, 100, 101),  # identical unit interval
                 (2002, 63, 65)]    # crosses the cell boundary
        a = spark.createDataFrame(aset, "a_id long, a_s long, a_e long")
        b = spark.createDataFrame(bset, "b_id long, b_s long, b_e long")
        got = {
            (r["a_id"], r["b_id"], r["ov_start"], r["ov_len"])
            for r in overlap_pairs(a, b, CELL).collect()
        }
        assert got == _brute_overlaps(aset, bset), f"seed {seed}"


# -- operators: bloom filter ------------------------------------------------


def test_bloom_filter_has_no_false_negatives(spark):
    """Every build key must survive the probe; false positives are
    allowed but must be rare at the design load factor."""
    import numpy as np

    from big_data_final_project_spark.operators.bloom_filter import (
        bloom_build,
        bloom_prune,
    )

    M = 1 << 14  # 16384 bits
    rng = np.random.default_rng(7)
    members = sorted(int(x) for x in rng.choice(10**9, 500, replace=False))
    non_members = [x + 10**10 for x in members]  # disjoint by construction
    keys = spark.createDataFrame([(k,) for k in members], "k long")
    bitmap = bloom_build(keys, "k", M)
    probe = spark.createDataFrame(
        [(k,) for k in members + non_members], "k long"
    )
    kept = {r["k"] for r in bloom_prune(probe, "k", bitmap, M).collect()}
    assert set(members) <= kept  # zero false negatives, always
    fp = len(kept - set(members))
    # k=2, n=500, m=16384 -> (2*500/16384)^2 ~ 0.4%; allow 10x slack
    assert fp / len(non_members) < 0.04, fp
