"""Plan-shape regression tests (SCALE.md): assert the physical plans
keep the properties the 100 TB posture depends on. These are the
checked form of `.explain` review — a change that drops a pushdown,
un-broadcasts a dimension, or introduces a cartesian product fails
here before it ships."""

from __future__ import annotations

from big_data_final_project_spark.plans.audit import audit
from big_data_final_project_spark.registry import catalog


def _plan(spark, sf_dir, name):
    return audit(catalog()[name].fn(spark, sf_dir))


def test_q6_filter_pushdown_and_column_pruning(spark, sf_dir):
    p = _plan(spark, sf_dir, "tpch_q6_forecast_revenue")
    assert p.pushed_filters("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate")
    # 4 of lineitem's 11 columns — projection reached the scan
    cols = p.read_schema_columns()
    assert cols == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}


def test_q5_star_join_is_all_broadcast(spark, sf_dir):
    p = _plan(spark, sf_dir, "tpch_q5_local_supplier_volume")
    assert p.broadcast_joins >= 4, p.text
    assert p.cartesian_products == 0


def test_q3_selective_dimension_broadcast(spark, sf_dir):
    p = _plan(spark, sf_dir, "tpch_q3_shipping_priority")
    assert p.broadcast_joins >= 1
    assert p.cartesian_products == 0
    assert p.pushed_filters("EqualTo(c_mktsegment,BUILDING)")


def test_minhash_no_cartesian_and_bounded_shuffles(spark, sf_dir):
    # clear caches: a pre-populated signature cache changes the
    # explain output (InMemoryTableScan lineage) and the counts
    spark.catalog.clearCache()
    p = _plan(spark, sf_dir, "dedup_minhash_pairs")
    assert p.cartesian_products == 0
    # signature agg + band join + distinct — the plan must not grow
    # extra shuffles silently
    assert p.shuffles <= 8, p.text


def test_grouped_summary_single_aggregation_shuffle(spark, sf_dir):
    p = _plan(spark, sf_dir, "ref_grouped_summary")
    assert p.shuffles <= 2, p.text
    assert p.cartesian_products == 0


def test_lsh_topk_scans_corpus_once_no_joins(spark, sf_dir):
    # round 2: the query block lives inside the mapInPandas scorer —
    # the corpus is scanned once, never joined, and only local top-k
    # rows reach the final per-query window
    p = _plan(spark, sf_dir, "sim_lsh_bucketed_topk")
    assert p.sortmerge_joins == 0, "corpus must not sort-merge against 5 queries"
    assert p.cartesian_products == 0
    assert "MapInPandas" in p.text, p.text
    # spread() repartition (byte-small input fan-out) + top-k window
    assert p.shuffles <= 2, p.text


def test_ivf_topk_fused_scan_no_corpus_join(spark, sf_dir):
    # assignment + scoring fused into one corpus scan; no self-join
    p = _plan(spark, sf_dir, "sim_ivf_topk")
    assert p.sortmerge_joins == 0, p.text
    assert p.cartesian_products == 0
    assert "MapInPandas" in p.text, p.text
    assert p.shuffles <= 2, p.text


def test_q9_dimensions_broadcast_one_fact_shuffle(spark, sf_dir):
    # part/supplier/nation broadcast; only lineitem join orders shuffles
    p = _plan(spark, sf_dir, "tpch_q9_product_profit")
    assert p.broadcast_joins >= 3, p.text
    assert p.sortmerge_joins <= 1, p.text
    assert p.cartesian_products == 0
    assert p.pushed_filters("StringContains(p_name,gear)")


def test_q13_left_join_keeps_filter_on_orders_side(spark, sf_dir):
    # the priority filter must NOT push below the left join's
    # null-extension in a way that drops zero-order customers; it
    # belongs on the orders scan
    p = _plan(spark, sf_dir, "tpch_q13_customer_distribution")
    assert p.pushed_filters("Not(EqualTo(o_orderpriority,5-LOW))")
    assert p.cartesian_products == 0


def test_q21_exists_chain_no_cartesian(spark, sf_dir):
    p = _plan(spark, sf_dir, "tpch_q21_waiting_suppliers")
    assert p.cartesian_products == 0
    assert p.broadcast_joins >= 1  # nation-filtered supplier


def test_q2_distinct_after_part_prune(spark, sf_dir):
    # eligible is checkpointed (diamond fix), so the audited plan is
    # checkpoint-scan ⋈ per-part max; the part-prune-before-distinct
    # property is asserted on the eligible construction itself
    from pyspark.sql import functions as F

    from big_data_final_project_spark.data import load_table
    from big_data_final_project_spark.plans.audit import audit

    p = _plan(spark, sf_dir, "tpch_q2_best_supplier")
    assert p.broadcast_joins >= 1, p.text
    assert p.cartesian_products == 0
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    )
    supply = (
        li.join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    sp = audit(supply)
    assert sp.broadcast_joins >= 1, sp.text  # prune below the distinct
    assert sp.pushed_filters("EqualTo(p_size,15)")


def test_tfidf_df_table_broadcasts_back(spark, sf_dir):
    p = _plan(spark, sf_dir, "text_tfidf_top_terms")
    assert p.broadcast_joins >= 1, p.text
    assert p.cartesian_products == 0


def test_shard_pipeline_quality_gate_pushed_down(spark, sf_dir):
    # the n_chars quality gate must reach both branches of the
    # doubled-corpus union's parquet scans
    p = _plan(spark, sf_dir, "pipeline_training_shards")
    assert p.pushed_filters("GreaterThanOrEqual(n_chars,200)")
    assert p.cartesian_products == 0
    # window (hash-partition) + final 8-group agg: no hidden extras
    assert p.shuffles <= 4, p.text


def test_store_day_query_prunes_partitions(spark, sf_dir):
    p = _plan(spark, sf_dir, "store_partition_pruned_day")
    # directory-level pruning: the date filter must be a
    # PartitionFilter on the scan, not a post-scan Filter
    assert "PartitionFilters" in p.text
    assert "event_date" in p.text.split("PartitionFilters", 1)[1][:200], p.text
    assert p.cartesian_products == 0


def test_topk_queries_use_take_ordered_not_global_sort(spark, sf_dir):
    # ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-
    # partition top-k + k-row merge), never a full range-partitioned
    # sort — the difference between shuffling k rows and the table
    for name in ("tpch_q3_shipping_priority", "tpch_q10_returned_items",
                 "tpch_q18_large_orders"):
        p = _plan(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in p.text, name


def test_new_ops_plan_shapes(spark, sf_dir):
    # gapfill: grid cross-join broadcasts a 1-row bounds table; the
    # dense join + agg + LOCF window are the only shuffles
    p = _plan(spark, sf_dir, "ts_gapfill_locf")
    assert p.broadcast_joins >= 1 and p.cartesian_products == 0
    assert p.shuffles <= 4, p.text
    # scd2: the semi/anti branch pair is folded into ONE flagged
    # broadcast left join — the dim is scanned once and never shuffles
    p = _plan(spark, sf_dir, "scd2_merge")
    assert p.broadcast_joins == 1 and p.sortmerge_joins == 0, p.text
    assert p.text.count("Location: InMemoryFileIndex") <= 1, p.text
    # changelog compaction: exactly one key-partitioned window shuffle
    p = _plan(spark, sf_dir, "cdc_changelog_apply")
    assert p.shuffles <= 1, p.text
    # standardization: moments broadcast back, fact table unshuffled
    p = _plan(spark, sf_dir, "ml_feature_standardize")
    assert p.broadcast_joins >= 1 and p.shuffles <= 1, p.text


def test_join_strategy_hints_are_honored(spark, sf_dir):
    # the optimizer surface: hints must override the default strategy
    from pyspark.sql import functions as F

    from big_data_final_project_spark.data import load_table
    from big_data_final_project_spark.plans.audit import audit

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    merged = audit(o.join(c.hint("merge"), o.o_custkey == c.c_custkey))
    assert merged.sortmerge_joins >= 1, merged.text
    shuffled = audit(o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey))
    assert "ShuffledHashJoin" in shuffled.text, shuffled.text


def test_range_join_bucketization_avoids_nested_loop(spark, sf_dir):
    p = _plan(spark, sf_dir, "join_range_bucketized")
    assert "BroadcastNestedLoopJoin" not in p.text, p.text
    assert p.cartesian_products == 0
    assert p.broadcast_joins >= 1  # cell-exploded bands are tiny


def test_curation_ops_plan_shapes(spark, sf_dir):
    # decontamination: benchmark gram set broadcast; the corpus side
    # must never sort-merge against it
    p = _plan(spark, sf_dir, "curation_decontaminate")
    assert p.broadcast_joins >= 1, p.text
    assert p.sortmerge_joins == 0, p.text
    assert p.cartesian_products == 0
    # PII redaction: pure per-row map — ZERO shuffles
    p = _plan(spark, sf_dir, "curation_pii_redact")
    assert p.shuffles == 0, p.text
    # domain mixture: rate table broadcast back onto the corpus
    p = _plan(spark, sf_dir, "curation_domain_mixture")
    assert p.broadcast_joins >= 2, p.text
    assert p.cartesian_products == 0
    # packing: one shard-partitioned window shuffle, nothing else
    p = _plan(spark, sf_dir, "curation_pack_sequences")
    assert p.shuffles <= 1, p.text
    # int8 audit: 64-group range table broadcast back onto dims
    p = _plan(spark, sf_dir, "sim_quantize_int8")
    assert p.broadcast_joins >= 1, p.text
    assert p.cartesian_products == 0


def test_graph_ops_plan_shapes(spark, sf_dir):
    # market-basket top-20: per-partition heaps, never a global sort
    p = _plan(spark, sf_dir, "graph_copurchase_topk")
    assert "TakeOrderedAndProject" in p.text, p.text
    # triangle closing join + pagerank iterations: equi-joins only
    p = _plan(spark, sf_dir, "graph_triangle_count")
    assert p.cartesian_products == 0, p.text
    p = _plan(spark, sf_dir, "graph_pagerank")
    assert p.cartesian_products == 0, p.text


def test_bitmap_distinct_is_pure_aggregation(spark, sf_dir):
    # three agg levels (day partials -> OR merge -> counts), no joins
    p = _plan(spark, sf_dir, "agg_bitmap_distinct")
    assert p.shuffles <= 3, p.text
    assert p.broadcast_joins == 0 and p.sortmerge_joins == 0
    assert p.cartesian_products == 0


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    # the whole point of bucketing: with broadcast off, the fact-fact
    # join must consume the write-time layout — SortMergeJoin with no
    # shuffle on either input; the post-join aggregate is the only
    # exchange in the plan
    from big_data_final_project_spark.queries.storage import _bucketed_pair

    li_name, o_name = _bucketed_pair(spark, sf_dir)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = _plan(spark, sf_dir, "store_bucketed_join")
        assert p.sortmerge_joins >= 1, p.text
        assert p.shuffles <= 1, p.text
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_zorder_key_is_codegen_only(spark, sf_dir):
    # the z key is bit arithmetic inside codegen: the per-cell agg is
    # the plan's ONLY shuffle, and there are no joins at all
    p = _plan(spark, sf_dir, "store_zorder_layout")
    assert p.shuffles <= 1, p.text
    assert p.broadcast_joins == 0 and p.sortmerge_joins == 0


def test_sessionize_single_user_shuffle(spark, sf_dir):
    # lag window, cumsum window, and the session aggregate all
    # partition on user_id — the plan must reuse ONE hash exchange
    p = _plan(spark, sf_dir, "ts_sessionize_batch")
    assert p.shuffles <= 1, p.text
    assert p.cartesian_products == 0


def test_table_profile_is_joinless_single_scan(spark, sf_dir):
    # one wide aggregate + stack(): scans the table once, joins never
    p = _plan(spark, sf_dir, "audit_table_profile")
    assert p.broadcast_joins == 0 and p.sortmerge_joins == 0
    # one file-scan node in the whole plan (each scan prints exactly
    # one Location: line in the formatted details)
    assert p.text.count("Location: InMemoryFileIndex") == 1, p.text


def test_round3_timeseries_plan_shapes(spark, sf_dir):
    # M4: 1-row bounds broadcast into the scan (a condition-less
    # cross join plans as BroadcastNestedLoopJoin — correct for a
    # 1-row build side), then ONE map-side-combinable aggregate —
    # no window, no sort
    p = _plan(spark, sf_dir, "ts_m4_downsample")
    assert "BroadcastNestedLoopJoin" in p.text or p.broadcast_joins >= 1, p.text
    assert p.shuffles <= 2, p.text
    assert "Window" not in p.text, p.text
    # TWA: the lead() window and the final aggregate share one
    # event_type partitioning
    p = _plan(spark, sf_dir, "ts_time_weighted_avg")
    assert p.shuffles <= 1, p.text
    # transition matrix: one user window shuffle + tiny-key aggs
    p = _plan(spark, sf_dir, "events_transition_matrix")
    assert p.shuffles <= 3, p.text
    assert p.cartesian_products == 0
    # cohort: first-seen agg and activity distinct co-partition on
    # user_id; no cartesian anywhere
    p = _plan(spark, sf_dir, "events_cohort_retention")
    assert p.cartesian_products == 0


def test_round4_privacy_bloom_plan_shapes(spark, sf_dir):
    # bloom prefilter: both word-map probes and the exact semi join
    # broadcast (the fact side never shuffles before the aggregate);
    # no cartesian anywhere
    p = _plan(spark, sf_dir, "join_bloom_prefilter")
    assert p.broadcast_joins >= 3, p.text
    assert p.cartesian_products == 0
    # k-anonymity: two-level aggregate, one QI-key shuffle feeding a
    # single-row global agg; no joins at all
    p = _plan(spark, sf_dir, "privacy_k_anonymity")
    assert p.broadcast_joins == 0 and p.sortmerge_joins == 0
    assert p.shuffles <= 3, p.text
    # generalization ladder: the 3-level explode must NOT triple the
    # scan — one file-scan location in the whole plan
    p = _plan(spark, sf_dir, "privacy_generalization_ladder")
    assert p.text.count("Location: InMemoryFileIndex") == 1, p.text


def test_round4d_plan_shapes(spark, sf_dir):
    # dynamic partition pruning: the fact scan must carry a runtime
    # dynamicpruning subquery on its partition column (a static plan
    # would list every directory), and the dim must broadcast
    p = _plan(spark, sf_dir, "join_dpp_partitioned")
    assert "dynamicpruning" in p.text.lower(), p.text
    assert p.broadcast_joins >= 1
    assert p.cartesian_products == 0
    # count-min: sketch build + probe are aggregates; the 1024-row
    # grid joins the top keys via broadcast, never a shuffle join
    p = _plan(spark, sf_dir, "agg_countmin_sketch")
    assert p.broadcast_joins >= 1, p.text
    assert p.sortmerge_joins == 0
    assert p.cartesian_products == 0
    # gains table: threshold row broadcast back (one scan per pass,
    # no sort-merge join, no cartesian beyond the 1-row cross join)
    p = _plan(spark, sf_dir, "ml_gains_deciles")
    assert p.sortmerge_joins == 0, p.text
    # MRR: single l_orderkey exchange feeds window + aggregate; no
    # joins at all
    p = _plan(spark, sf_dir, "ml_mrr_hit_rate")
    assert p.broadcast_joins == 0 and p.sortmerge_joins == 0
    assert p.shuffles <= 3, p.text
    # PQ encode: one corpus scan (mapInPandas) + 32-group rollup;
    # codebook rides a closure, so the plan has no join of any kind
    p = _plan(spark, sf_dir, "sim_pq_codebook")
    assert p.broadcast_joins == 0 and p.sortmerge_joins == 0
    assert p.cartesian_products == 0
    # dataset card: joinless single-scan aggregate
    p = _plan(spark, sf_dir, "curation_dataset_card")
    assert p.text.count("Location: InMemoryFileIndex") == 1, p.text


def test_lsh_join_topk_distributed_queries_no_explosion(spark, sf_dir):
    # VERDICT r4 #4: the distributed-query-set ANN variant must meet
    # the corpus in a bucket-cogrouped Arrow stage — no sort-merge of
    # corpus x queries, no cartesian, no driver collect of the query
    # block (the plan would show a LocalTableScan of collected rows)
    p = _plan(spark, sf_dir, "sim_lsh_join_topk")
    assert "FlatMapCoGroupsInPandas" in p.text, p.text
    assert p.sortmerge_joins == 0, p.text
    assert p.cartesian_products == 0
    assert "LocalTableScan" not in p.text, "query block must stay distributed"
    # spread + 2 cogroup exchanges + final rank window
    assert p.shuffles <= 5, p.text


def test_ivf_join_topk_distributed_queries_no_explosion(spark, sf_dir):
    # cell-routed twin of sim_lsh_join_topk: same distributed posture
    p = _plan(spark, sf_dir, "sim_ivf_join_topk")
    assert "FlatMapCoGroupsInPandas" in p.text, p.text
    assert p.sortmerge_joins == 0, p.text
    assert p.cartesian_products == 0
    assert "LocalTableScan" not in p.text, "query block must stay distributed"
    assert p.shuffles <= 5, p.text
