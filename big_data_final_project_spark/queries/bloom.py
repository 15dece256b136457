"""Bloom-filter semi-join reduction (engine addition; SURVEY.md §2.6).

The defining join problem at 100 TB is a huge fact table joined to a
selective dimension predicate: shuffling the whole fact side is the
bottleneck, and the fix every warehouse engine ships is SEMI-JOIN
REDUCTION — build a tiny bloom filter over the dimension's surviving
keys, broadcast it, and drop non-matching fact rows BEFORE the shuffle.
Spark has this as an invisible runtime optimization
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, InjectRuntimeFilter
since 3.3); this query builds the same machinery explicitly out of
DataFrame ops so the filter's cost model and plan shape are visible and
testable:

- the bloom bitmap is a GROUPED AGGREGATE (word index -> bit_or of set
  bits) — ~m/64 rows, mergeable, built in one pass over the dim keys;
- the membership probe is a BROADCAST hash join on the word index plus
  a bitwise AND — no Python, whole-stage codegen end to end;
- false positives are removed by the exact (broadcast) semi join that
  was always going to run — the bloom only prunes its input, so the
  final answer is EXACTLY the plain semi join the oracle states.

Reference parity: none (the reference dashboard has no joins at all);
pattern parity is Spark's InjectRuntimeFilter / Trino's dynamic
filtering, re-expressed declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load_table
from ..functions.numeric import dsum_prod, dsum_prod_sql
from ..operators.bloom_filter import bloom_build, bloom_prune
from ..registry import query

_M_BITS = 1 << 17  # bloom width: 131072 bits = 2048 int64 words


@query(
    "join_bloom_prefilter",
    oracle=f"""
    SELECT l.l_returnflag AS returnflag,
           COUNT(*) AS n_items,
           {dsum_prod_sql("l.l_extendedprice", "1.0 - l.l_discount")} AS revenue
    FROM lineitem l
    WHERE l.l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    tags=("join", "bloom-filter", "semi-join-reduction", "engine-addition"),
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by return flag for line items of URGENT orders, computed
    with an explicit bloom-filter semi-join reduction: a 128K-bit bloom
    over the urgent order keys (bitmap = word-indexed bit_or aggregate,
    2048 rows) is broadcast-joined onto lineitem and the two-probe
    bitwise test drops non-matching rows before the exact semi join;
    the exact join then kills the bloom's false positives, so the
    result equals the plain semi join bit-for-bit.

    Scale shape: at 100 TB the win is that the ~2048-row bitmap reaches
    every scan task (a broadcast), so the fact table is pruned at scan
    time to ~selectivity + epsilon before ANY shuffle; the exact semi
    join that guarantees correctness runs over the pruned remnant. The
    bitmap build is a mergeable aggregate (bit_or is associative and
    commutative), so it needs one narrow pass over the dim keys. With
    k=2 hashes and ~3k keys in 128K bits the false-positive rate is
    ~(k n / m)^k ~ 0.2%, and the epsilon never affects correctness —
    only the pruned volume."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )

    # Bloom bitmap + probe via the reusable operator
    # (operators/bloom_filter.py — property-tested: no false negatives).
    bitmap = bloom_build(urgent, "o_orderkey", _M_BITS)
    probe = li.select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    pruned = bloom_prune(probe, "l_orderkey", bitmap, _M_BITS)

    # Exact semi join removes bloom false positives (broadcast: the
    # urgent key list is dim-sized).
    matched = pruned.join(
        F.broadcast(urgent),
        pruned["l_orderkey"] == urgent["o_orderkey"],
        "left_semi",
    )
    return (
        matched.groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum_prod("l_extendedprice", F.lit(1.0) - F.col("l_discount")).alias(
                "revenue"
            ),
        )
        .orderBy("returnflag")
    )
