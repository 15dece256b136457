#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs each headline query end-to-end (full execution via the `noop`
sink — no driver-side materialization, so it times the distributed
plan, not a collect) and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Usage: python bench.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_final_project_spark.registry import catalog  # noqa: E402
from big_data_final_project_spark.session import get_spark  # noqa: E402

# Heaviest / most representative queries: full-scan agg, joins at every
# size class, windows, dedup/text scans. Coverage queries (scalar_*)
# are cheap projections and excluded — they'd just time parquet IO.
HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q9_product_profit",
    "tpch_q13_customer_distribution",
    "tpch_q21_waiting_suppliers",
    "join_inner_star",
    "join_asof",
    "agg_multi_key",
    "agg_rollup",
    "window_running_sum",
    "window_topk_per_group",
    "ref_grouped_summary",
    # LLM-data-pipeline operators (north star): fuzzy dedup, quality
    # scoring, ANN search
    "dedup_minhash_pairs",
    "text_quality_score",
    "text_tfidf_top_terms",
    "sim_lsh_bucketed_topk",
    "kmeans_lloyd_refine",
    "pipeline_training_shards",
    # fixed-point numpy fast paths (round 2: these ARE the oracle paths)
    "sim_bruteforce_topk",
    "dedup_embedding_cosine",
    "sim_ivf_topk",
    # round-2 corpus screening
    "curation_decontaminate",
    "curation_repetition_stats",
    # round-3 families: graph analytics, mergeable distinct,
    # sessionization, span-level dedup
    "graph_pagerank",
    "agg_bitmap_distinct",
    "ts_sessionize_batch",
    "dedup_substring_windows",
    # round-4 families: bloom semi-join reduction, interval overlap,
    # privacy audit, RFM segmentation
    "join_bloom_prefilter",
    "join_interval_overlap",
    "privacy_k_anonymity",
    "events_rfm_segments",
    # round-4d families: PQ vector compression, count-min sketch,
    # gains/lift targeting, dynamic partition pruning
    "sim_pq_codebook",
    "agg_countmin_sketch",
    "ml_gains_deciles",
    "join_dpp_partitioned",
    # round-4e families: exact selection without sort, prefix-filtered
    # set similarity, stump split search, incremental join maintenance
    "agg_median_bisect",
    "dedup_prefix_filter_join",
    "ml_decision_stump",
    "store_incremental_join",
    # round-4e4: all-breakpoints changepoint, graded ranking eval
    "ts_piecewise_fit_changepoint",
    "ml_ndcg_at_k",
    # round-4f families: iterative BPE training, LSH tuning sweep,
    # deterministic walk corpus, content-defined chunking
    "text_bpe_train_rounds",
    "dedup_lsh_tuning",
    "graph_random_walks",
    "text_cdc_chunks",
    # round-5 families: distributed-query-set ANN (no driver collect),
    # held-out bigram LM quality filter
    "sim_lsh_join_topk",
    "curation_bigram_lm_heldout",
]


def _run(df) -> None:
    """Force full execution of every column without collecting."""
    df.write.format("noop").mode("overwrite").save()


def _calibration_probe(spark) -> float:
    """Fixed synthetic job (VERDICT r6 #3): a pinned-size range ->
    shuffle -> aggregate with no data dependence, timed best-of-3.
    Its wall time measures the BOX (CPU, scheduler, outside-VM
    stalls), not the engine — recorded at the start and end of every
    bench run so a cross-round headline drift can be attributed:
    probe moved with it = environment drift; probe flat = engine
    regression. Normalize as headline / (probe / probe_r7_reference).

    r13 measurement fix (documented in OPTIMIZATION_r13.md): the
    probe's aggregation exchange inherited the SESSION's shuffle-
    partition conf, so the r13 volume-derived partition clamp
    (session.py) sped the probe itself ~30% (0.25 vs 0.36 s measured
    alternating at 8 vs 32) — a pinned box meter must not move with
    engine tuning. The probe now pins its historical 32-partition
    shape explicitly; pre-r13 probe numbers (BENCH_r*.json) were all
    taken at 32 and stay comparable."""
    from pyspark.sql import functions as F

    key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(key)
    spark.conf.set(key, "32")
    try:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            _run(
                spark.range(50_000_000, numPartitions=32)
                .withColumn("k", F.col("id") % 1000)
                .groupBy("k")
                .agg(F.sum("id").alias("s"), F.count("*").alias("n"))
            )
            runs.append(time.perf_counter() - t0)
        return round(min(runs), 4)
    finally:
        spark.conf.set(key, saved)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    spark = get_spark(app_name="bench")

    cat = catalog()
    names = [n for n in HEADLINE if n in cat]
    # Warm the JVM (whole-stage codegen JIT, parquet reader, shuffle
    # machinery) with one full untimed run — a limit(1) is not enough,
    # AQE short-circuits the aggregation and leaves the agg path cold.
    _run(cat[names[0]].fn(spark, sf_dir))
    # Warm the Python/Arrow worker pool too (one tiny mapInPandas job)
    # so pandas-path queries measure steady state, not worker spawn.
    import pandas as _pd

    spark.range(64, numPartitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()

    probe_start = _calibration_probe(spark)

    times: dict[str, float] = {}
    # Best of 2 (3 when the two disagree >50%): the box this runs on
    # sees sporadic multi-second stalls from outside the VM (observed
    # 10-25x single-query inflation; NOT steal/disk/GC — all measured
    # clean while it happened), so a single timing sometimes measures
    # the neighbor, not the engine. Min over repeats measures the
    # engine. Cache is NOT reused between runs (each .fn call builds
    # a fresh plan; only the JVM/JIT stays warm — steady state, which
    # is the number that scales).
    for name in names:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            _run(cat[name].fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        # round 5: outside-VM stalls measured up to 25s on a query
        # whose floor is 1.8s (8-repeat probe, quiet loadavg). If the
        # second-best run is 2x the best, the sample is stall-heavy
        # and the best itself may be inflated — take a 4th.
        if sorted(runs)[1] > 2.0 * sorted(runs)[0]:
            t0 = time.perf_counter()
            _run(cat[name].fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        times[name] = round(min(runs), 4)

    total = round(sum(times.values()), 4)

    # Full-registry sweep (every registered query, one timed run each):
    # regressions outside the headline set stay visible. Single-run
    # timings — the same sporadic-stall caveat applies per query, so
    # judge the DISTRIBUTION, not one outlier. SPARK_GRAFT_BENCH_SWEEP=0
    # skips it while iterating locally.
    sweep: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_SWEEP", "1") != "0":
        for name in sorted(cat):
            t0 = time.perf_counter()
            _run(cat[name].fn(spark, sf_dir))
            sweep[name] = round(time.perf_counter() - t0, 4)
        # Outlier re-check: the box's sporadic outside-VM stalls can
        # inflate a single-run timing 10-25x. Re-time anything over
        # 5 s once and keep the min — a real slow query stays slow,
        # a stall victim gets its true number (bounded extra cost:
        # only the outliers re-run).
        for name, t in list(sweep.items()):
            if t > 5.0:
                # Session-cache honesty (found r12): the re-run must
                # not hit frames the first, timed run materialized.
                # dedup_clusters' cold build is ~4-5 s; when that
                # crossed this 5 s threshold (r10/r11), the re-run hit
                # the session-cached cluster map and recorded a 0.02-
                # 0.04 s cache-hit as the query's floor — a 130x
                # phantom cliff at the threshold. Clearing the cache
                # makes the re-run pay the same builds the first run
                # paid (min() still discards any extra cost this adds).
                from big_data_final_project_spark.operators import (
                    scale as _scale,
                )

                for _df in _scale._SESSION_CACHE.values():
                    try:  # free executor blocks, not just the refs
                        _df.unpersist(blocking=False)
                    except Exception:
                        pass
                _scale._SESSION_CACHE.clear()
                t0 = time.perf_counter()
                _run(cat[name].fn(spark, sf_dir))
                sweep[name] = round(
                    min(t, time.perf_counter() - t0), 4
                )

    probe_end = _calibration_probe(spark)

    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_val,
        # Box-speed calibration (VERDICT r6 #3): min-of-3 of a pinned
        # synthetic shuffle+agg, before and after the headline loop.
        "probe_sec": {"start": probe_start, "end": probe_end},
    }
    if sweep:
        # The full per-query sweep goes to a FILE, not stdout: the
        # driver keeps only the last ~2000 chars of output, and a
        # 180-entry JSON line pushed its own opening brace out of that
        # window in rounds 2-3 (BENCH_r0{2,3}.json: "parsed": null).
        # Stdout stays a compact single line; the sweep artifact is
        # committed alongside for the judge.
        out["sweep_total"] = round(sum(sweep.values()), 4)
        out["sweep_n"] = len(sweep)
        out["sweep_slowest"] = dict(
            sorted(sweep.items(), key=lambda kv: -kv[1])[:5]
        )
        sweep_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_SWEEP.json"
        )
        with open(sweep_path, "w") as fh:
            json.dump({"sf": sf_val, "queries": sweep}, fh, indent=1, sort_keys=True)
    line = json.dumps(out)
    # Belt-and-braces: never exceed the driver's tail window. If the
    # headline set ever grows past it, drop per-query detail from
    # stdout (it is still in BENCH_SWEEP.json).
    if len(line) > 1900:
        out.pop("sweep_slowest", None)
        line = json.dumps(out)
        if len(line) > 1900:
            out["queries"] = {}
            line = json.dumps(out)
    print(line)


if __name__ == "__main__":
    main()
