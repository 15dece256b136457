"""Empty-input robustness: representative queries from every family
must run (not crash) over zero-row tables with the production schema.

Rationale: at 100 TB, empty slices are routine — a partition-pruned
day with no data, a filter that matches nothing, a brand-new tenant.
An operator that throws on empty input turns routine pruning into a
pipeline page. Queries built around data-derived anchors collected to
the driver (k-means seeds, IVF centroids) legitimately REQUIRE rows
and document that contract; everything here must degrade to an empty
(or identity-aggregate) result instead.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from big_data_final_project_spark.registry import catalog

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# One representative per operator family; anchor-collect queries
# (kmeans, IVF, bruteforce ANN: they broadcast collected seed rows)
# are deliberately excluded — their non-empty precondition is part of
# the operator contract and documented in their docstrings.
EMPTY_SAFE = [
    "ref_historical_view",
    "ref_validated_rows",
    "ref_time_range_counts",
    "agg_multi_key",
    "agg_rollup",
    "agg_percentiles_exact",
    "agg_log2_histogram",
    "tpch_q1_pricing_summary",
    "tpch_q6_forecast_revenue",
    "join_inner_star",
    "join_left_outer",
    "join_semi",
    "join_anti",
    "join_theta_range",
    "window_running_sum",
    "window_topk_per_group",
    "window_rank_funcs",
    "setop_union_intersect_except",
    "pivot_status",
    "pivot_multi_agg",
    "distinct_rows",
    "dedup_exact",
    "dedup_minhash_pairs",
    "text_token_stats",
    "text_quality_score",
    "ml_mrr_hit_rate",
    "ml_feature_hashing",
    "ts_ohlc_bars",
    "ts_interarrival_stats",
    "ts_mann_kendall",
    "events_funnel_steps",
    "sample_exact_size_hash",
    "sample_hash_stratified",
    "scalar_string_funcs",
    "scalar_math_funcs",
    "agg_countmin_sketch",
    "agg_bitmap_distinct",
    "privacy_k_anonymity",
    "privacy_t_closeness",
    "graph_degree_distribution",
    "dedup_containment",
    "events_survival_table",
    # round-4e families
    "ml_decision_stump",
    "ml_split_gain_all_features",
    "ml_roc_curve",
    "ml_rank_fusion_rrf",
    "agg_median_bisect",
    "agg_quantiles_bisect",
    "agg_skyline_2d",
    "agg_alloc_largest_remainder",
    "agg_winsorized_mean",
    "agg_kmv_distinct",
    "ts_max_drawdown",
    "ts_max_concurrency",
    "ts_rolling_corr",
    "window_rolling_median",
    "events_longest_streak",
    "events_cohort_ltv",
    "events_absence_audit",
    "curation_vocab_coverage",
    "dedup_prefix_filter_join",
    "dedup_simhash_pairs",
    "graph_two_hop_min_plus",
    "store_incremental_join",
    "agg_bridge_price_volume",
    "ab_ratio_delta_method",
    "ts_slo_burn_rate",
    "ml_mann_whitney_u",
    "ml_runs_test",
    "ts_theil_sen_slope",
    "ts_lead_lag_xcorr",
    "ts_seasonal_decompose_additive",
    "curation_source_overlap_matrix",
    "curation_embedding_diversity",
    "ml_roc_curve",
    "sql_join_hint_broadcast",
    "ml_spearman_rho",
    "ml_brier_decomposition",
    "ml_cohens_kappa",
    "ml_ndcg_at_k",
    "agg_cramers_v",
    "ts_piecewise_fit_changepoint",
    "mm_payload_chunk_manifest",
    "graph_item_item_cosine",
    "sql_view_stack_pushdown",
    # round-4f families
    "sql_join_hint_shuffle",
    "events_attribution_position",
    "text_bpe_train_rounds",
    "graph_random_walks",
    "ts_holt_linear",
    "text_cdc_chunks",
    "dedup_lsh_tuning",
    "graph_lpa_communities",
    "sql_pivot_syntax",
    "ml_pr_curve",
    "text_vocab_growth",
    "ts_bollinger_breakouts",
    "agg_theta_sketch_ops",
    "ml_drift_ks_all_features",
    "sim_matryoshka_recall",
    "ml_negative_sampling",
    "text_bpe_apply_compression",
    "text_entropy_gate",
    "dedup_url_canonicalize",
    "ts_paa_sax",
    "scalar_ipv4_cidr",
    "store_merge_upsert",
    "store_deletion_vectors",
    # round-8 families
    "dedup_exact_substr_spans",
    "dedup_exact_substr_coverage",
    "agg_quantile_sketch_hist",
    "agg_quantile_sketch_rank",
    "agg_quantile_sketch_windowed",
    "audit_nonfinite_measures",
    "curation_span_cut",
]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("empty_sf"))
    con = duckdb.connect()
    for t in TABLES:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        con.execute(
            f"COPY (SELECT * FROM '{src}' WHERE 1=0) "
            f"TO '{os.path.join(out, t)}.parquet' (FORMAT PARQUET)"
        )
    return out


@pytest.mark.parametrize("name", EMPTY_SAFE)
def test_runs_on_empty_tables(spark, empty_dir, name):
    df = catalog()[name].fn(spark, empty_dir)
    rows = df.collect()  # must not raise
    assert df.columns  # schema survives even with zero rows
    # global aggregates may legitimately emit one identity row;
    # everything else must be empty
    assert len(rows) <= 5
