#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is forced end-to-end with the ``noop`` sink (full computation,
no driver collect overhead).  A warmup query first amortizes JVM/codegen
startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trafficbigdatasearch_spark.queries import standard
from trafficbigdatasearch_spark.session import build_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: The headline set: one per operator family (scan-agg, multi-join, interval
#: join, window, top-k, union, dedup, similarity, text, multimodal).
HEADLINE = [
    "a_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "j1_equi_join_dims",
    "j2_interval_join",
    "j_asof",
    "w_row_number",
    "sort_topk",
    "u_union_distinct",
    "time_bucket_hourly",
    "q14_promo_revenue",
    "w_sessionize",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "pipeline_clean_corpus",
    "sim_brute_topk",
    "sim_lsh_buckets",
    "sim_ivf_topk",
    "sim_ivf_indexed",
    "sim_embedding_near_dup",
    "text_metrics",
    "text_pii_scrub",
    "text_lang_id",
    "mm_features",
    "dedup_clusters",
    "pipeline_dedup_corpus",
    "dedup_incremental",
    "pack_sequences",
    "w_trailing_range",
    "j_skew_salted",
    "sample_split_hash",
    "sample_mixture",
    "text_chunk_docs",
    "decontaminate",
    "a_cohort_retention",
    "text_tfidf_topk",
    "text_repetition",
    "a_anomaly_zscore",
    "sketch_distinct_rollup",
    "sketch_segment_overlap",
    "j_range_keyless",
    "text_phrase_search",
    "w_quality_deciles",
    "w_scd2_intervals",
    "mm_phash_pairs",
    "a_grouping_sets",
    "text_phrase_indexed",
    "sim_pq_codes",
    "sim_pq_adc_topk",
    "sim_pq_rerank_topk",
    "sim_pq_trained_topk",
    "quality_report",
    "j_spatial_grid",
    "table_diff_orders",
    "a_incremental_merge",
    "graph_bfs_reach",
    "j_fuzzy_name",
    "f_higher_order",
    "q4_priority_exists",
    "a_exact_percentiles",
    "f_variant_extract",
    "pipeline_entity_resolution",
    "pipeline_incremental_refresh",
    "stream_partial_maintenance",
    "j_interval_overlap",
    "w_pattern_sequence",
    "pipeline_semantic_dedup",
    "spatial_density",
    "pipeline_dbscan",
    "sample_importance",
    "graph_pagerank",
    "ts_resample_ohlc",
    "ts_gapfill",
    "graph_triangles",
    "a_corr_stats",
    "text_bm25_topk",
    "text_vocab_encode",
    "j_point_in_polygon",
    "ts_interpolate",
    "q19_disjunctive_join",
    "dedup_keep_best",
    "stream_ohlc",
    "a_anomaly_mad",
    "graph_kcore",
    "graph_label_prop",
    "graph_sssp",
    "text_bm25_indexed",
    "w_quality_deciles_global",
    "j_bloom_prefilter",
    "j_bloom_anti",
    "stream_dedup",
    "quality_referential",
    "s_minmax_skipping",
    "s_orc_roundtrip",
    "table_merge_upsert",
    "stream_merge_upsert",
    "a_histogram",
    "a_event_transitions",
    "a_winsorize",
    "quality_profile",
    "a_basket_pairs",
    "a_attribution_touch",
    "dedup_containment",
    "text_bpe_merges",
    "text_bpe_encode",
    "text_bpe_apply",
    "pipeline_bpe",
    "dedup_jaccard_prefix",
    "text_dup_spans",
    "a_attribution_linear",
    "text_hybrid_rrf",
    "text_lm_coverage",
    "rec_item_cosine",
    "rec_user_topn",
    "eval_ivf_recall",
    "rec_eval_holdout",
    "s_zorder_skipping",
    "ts_trend_per_key",
    "a_ab_conversion",
    "ts_trend_incremental",
    "stream_trend",
    "pipeline_lm_filter",
    "text_doc_keywords",
    "rec_negatives",
    "sim_ivf_adc_topk",
    "graph_ppr",
    "dedup_semantic_ivf",
    "q18_large_orders",
    "text_collocations",
    "stream_lm_gate",
    "decontaminate_fuzzy",
    "graph_link_pred",
    "a_impute_median",
    "pipeline_mm_dedup",
    "rec_item_cosine_capped",
    "eval_rec_hdcg",
    "sample_temperature",
    "text_boilerplate_spans",
    "pipeline_boilerplate_strip",
    "dedup_semantic_incremental",
    "a_drift_chi2",
    "sim_dim_stats",
    # r9 post-freeze registrations (headline from r10 on)
    "graph_cc_incremental",
    "j_asof_tolerance",
    "pipeline_training_mix",
    "quality_gopher",
    "sample_priority",
    "sim_token_cosine",
    "ts_cusum",
    # r10 registrations
    "sim_ivf_append",
    "text_bm25_append",
    "sim_bitext_margin",
    "decontaminate_semantic",
    "eval_cluster_purity",
    "stream_semantic_gate",
    "sample_priority_grouped",
    "text_vocab_oov",
    "j_asof_nearest",
    "eval_score_calibration",
    "sample_quota_split",
    "eval_lsh_recall",
    # r10 late-session registrations (graph eval / windows / diagnostics)
    "graph_clustering_coeff",
    "graph_modularity",
    "graph_assortativity",
    "eval_pq_distortion",
    "eval_minhash_error",
    "eval_rec_coverage",
    "a_hopping_window",
    "stream_hopping",
    "quality_key_skew",
    "ts_seasonality",
    "ts_acf",
    "stream_gopher_gate",
    "pipeline_curriculum",
    "j_spatial_knn",
    "quality_profile_drift",
    "graph_component_stats",
    "sample_triplets",
    "mm_phash_incremental",
    "w_streaks",
    "q6_forecast_revenue",
    "q10_returned_items",
    "sample_poisson_bootstrap",
    "quality_dedup_report",
    "text_vocab_curve",
    "quality_syndication",
    "eval_jaccard_histogram",
    "ts_peaks",
    "mm_scene_changes",
    "eval_langid_confusion",
    "quality_gopher_rates",
    "eval_split_leakage",
    "dedup_cross_corpus",
    # r11 registrations (headline from r12 on)
    "q7_volume_shipping",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q21_late_sole_supplier",
    "eval_bpe_fertility",
    "text_bpe_merges_batched",
    "ts_ohlc_bucketed",
    # r12 registrations (headline from r13 on): the TPC-H completion
    # canaries + the bucketed-layout trilogy
    "ts_gapfill_bucketed",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q12_shipmode_priority",
    "q16_supplier_part_counts",
    "q20_dominant_supplier",
    "q22_global_sales_opportunity",
    "ts_ohlc_bucketed_append",
    "j_user_baseline_bucketed",
    "s_bucket_pruned_lookup",
]


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


#: Multiplier over the base traffic fixture (300 trips + 800 observations
#: per month x 7 months, 600 accidents) for the three reference entry
#: points.  20 => ~42k trips / ~112k observations / 12k accidents.
TRAFFIC_SCALE = int(os.environ.get("SPARK_GRAFT_TRAFFIC_SCALE", "20"))


def _bench_traffic(spark, times: dict, cold: dict) -> None:
    """The reference's own three entry points (accident / overspeed /
    avgspeed) over a generated reference-layout CSV corpus at
    TRAFFIC_SCALE x the test fixture — full facade calls including the JSON
    materialization, exactly the reference's contract."""
    import tempfile
    from pathlib import Path

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    import traffic_sim

    from trafficbigdatasearch_spark.engine import TrafficEngine

    base = Path(tempfile.mkdtemp(prefix="tbds_bench_traffic_")) / "traffic"
    traffic_sim.generate(base, scale=TRAFFIC_SCALE)
    eng = TrafficEngine(spark, str(base), layout="reference_csv", mode="parity")
    calls = {
        "traffic_accident_count": lambda: eng.get_accident_count(
            118.0, 116.0, 39.0, 36.0, "2016-07-01", "2016-09-15"
        ),
        "traffic_overspeed_count": lambda: eng.get_overspeed_count(
            118.0, 116.0, 39.0, 36.0, "2016-06-15", "2016-08-02"
        ),
        "traffic_avgspeed": lambda: eng.get_average_speed(
            118.0, 116.0, 39.0, 36.0, "2016-12-15"
        ),
    }
    for name, call in calls.items():
        t0 = time.perf_counter()
        out = call()
        cold[name] = round(time.perf_counter() - t0, 3)
        assert out, f"{name}: empty result on the canonical bbox"
        warm = []
        for _ in range(2):
            t0 = time.perf_counter()
            call()
            warm.append(time.perf_counter() - t0)
        times[name] = round(min(warm), 3)
    return calls


def _loadavg() -> list[float] | None:
    """1/5/15-minute host load — the coarse contention signal recorded
    before and after the run (verdict r9 #2: a contended driver host must
    be visible in the artifact, not inferred from flag patterns)."""
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:  # pragma: no cover — non-POSIX
        return None


def main() -> None:
    load_start = _loadavg()
    spark = build_spark(app_name="tbds-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = standard.queries()

    # Optional roster filter for A/B runs and per-query iteration:
    # SPARK_GRAFT_BENCH_ONLY="q1,q2" benches just those names (traffic
    # entries included only if named).
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    roster = [q for q in HEADLINE if not only or q in only.split(",")]
    run_traffic = not only or any(n.startswith("traffic_") for n in only.split(","))

    _force(qs["s_scan_project"](spark, SF_DIR))  # warmup: JVM + codegen + IO

    # Three runs per query: run 1 pays whole-stage-codegen compilation and
    # JIT (a per-plan constant, irrelevant at 100 TB where plans run for
    # minutes); the reported number is the MIN of two steady-state runs —
    # the low-noise estimator of per-plan cost.  The cold total is kept
    # alongside for transparency.
    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in roster:
        t0 = time.perf_counter()
        _force(qs[name](spark, SF_DIR))
        cold[name] = round(time.perf_counter() - t0, 3)
        warm = []
        for _ in range(2):
            t0 = time.perf_counter()
            _force(qs[name](spark, SF_DIR))
            warm.append(time.perf_counter() - t0)
        times[name] = round(min(warm), 3)

    traffic_calls = {}
    if run_traffic:
        traffic_calls = _bench_traffic(spark, times, cold)

    # Blind-spot sweep (verdict r7 #5): every registry query OUTSIDE the
    # headline roster gets one wall-time row per round, so a regression in
    # the sub-second tail (p_*/f_*/set_*/small a_*) is visible in
    # BENCH_local.json instead of invisible until a driver window catches
    # it.  One run each — these are trivia; the MIN-of-2 steady-state
    # treatment stays reserved for the headline set so totals remain
    # comparable across rounds.  Skipped under SPARK_GRAFT_BENCH_ONLY.
    # Per-query error isolation: one broken tail query must not abort the
    # bench AFTER the headline measurements and lose the whole record —
    # the sweep exists to make regressions visible in BENCH_local.json,
    # and a crash would make the entire file invisible instead.
    sweep: dict[str, float] = {}
    sweep_errors: dict[str, str] = {}
    if not only:
        for name in qs:
            if name in times:
                continue
            t0 = time.perf_counter()
            try:
                _force(qs[name](spark, SF_DIR))
            except Exception as e:  # noqa: BLE001 — recorded, not swallowed
                sweep_errors[name] = f"{type(e).__name__}: {e}"[:300]
                continue
            sweep[name] = round(time.perf_counter() - t0, 3)

    # Per-query tolerance bands (verdict r8 #3): flag anything slower
    # than band x its BEST prior driver round — min-over-rounds is the
    # anchor host variance can't inflate, so a flag is a real signal, not
    # the cross-round eyeballing the r8 verdict called out.  The flag
    # list rides the compact stdout line into BENCH_r{N}.json.
    #
    # Self-triage (verdict r9 #2): a band violation alone is NOT a flag.
    # The r9 driver session hit ~2x host contention and published 11
    # flags (up to 19x) on code that re-timed at historical bests — an
    # artifact indistinguishable from a real regression.  So every band
    # violation is RE-RUN once at session end (after all measurement
    # pressure has drained); only a reproduced violation stays in
    # ``regression_flags``, the rest move to ``triaged_transient`` with
    # both numbers recorded.  /proc/loadavg before/after brackets the
    # session so a contended host is visible in the artifact itself.
    regression_flags: dict[str, dict] = {}
    triaged_transient: dict[str, dict] = {}
    band = float(os.environ.get("SPARK_GRAFT_BENCH_BAND", "2.5"))
    try:
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
        )
        from bench_compare import best_prior_map, flag_regressions

        best = best_prior_map(os.path.dirname(os.path.abspath(__file__)))
        candidates = flag_regressions(
            {**times, **{f"sweep:{k}": v for k, v in sweep.items()}},
            best,
            band,
        )
        for flagged, info in candidates.items():
            qname = flagged.split(":", 1)[1] if flagged.startswith("sweep:") else flagged
            try:
                t0 = time.perf_counter()
                if qname in traffic_calls:
                    traffic_calls[qname]()
                else:
                    _force(qs[qname](spark, SF_DIR))
                rerun = round(time.perf_counter() - t0, 3)
            except Exception as e:  # noqa: BLE001 — a rerun crash IS a flag
                regression_flags[flagged] = {
                    **info, "rerun_error": f"{type(e).__name__}: {e}"[:200]
                }
                continue
            info = {
                **info,
                "rerun_sec": rerun,
                "rerun_ratio": round(rerun / info["best_prior"], 2),
            }
            if info["rerun_ratio"] > band:
                regression_flags[flagged] = info  # reproduced — real signal
            else:
                triaged_transient[flagged] = info  # contention — recorded, not flagged
    except Exception as e:  # noqa: BLE001 — the bench record must survive
        regression_flags = {"_error": {"msg": f"{type(e).__name__}: {e}"[:200]}}

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None
    full = {
        "metric": "headline_queries_total_time",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "cold_queries": cold,
        "sf": sf,
        "cold_total_sec": round(sum(cold.values()), 3),
        "n_queries": len(times),
        "traffic_fixture_scale": TRAFFIC_SCALE,
        "sweep_queries": sweep,
        "sweep_total_sec": round(sum(sweep.values()), 3),
        "n_sweep": len(sweep),
        "sweep_errors": sweep_errors,
        "regression_band": band,
        "regression_flags": regression_flags,
        "triaged_transient": triaged_transient,
        "load_avg": {"start": load_start, "end": _loadavg()},
    }
    # Full per-query record goes to a FILE: at 90+ queries the one-line
    # JSON exceeds the driver's 2000-char stdout tail and BENCH_r04.json
    # came back "parsed": null.  The line printed LAST is a compact
    # summary (totals + the slowest queries only), sized to survive the
    # tail so the driver's machine-readable record stays populated.
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json")
    with open(out_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    compact = dict(full)
    compact["queries"] = {}
    del compact["cold_queries"]
    compact["queries_full"] = "BENCH_local.json"
    # triage detail lives in the file; the line carries only the count
    compact["triaged_transient"] = {"n": len(triaged_transient)}
    # flags must survive the tail: keep the worst few, count the rest
    if len(regression_flags) > 5:
        worst5 = dict(
            sorted(
                regression_flags.items(),
                key=lambda kv: -kv[1].get("ratio", 0),
            )[:5]
        )
        compact["regression_flags"] = {
            **worst5,
            "_truncated": {"n_total": len(regression_flags)},
        }
    # The driver's machine-readable record keeps only ~2000 chars of stdout
    # tail.  The old fitting loop added query entries only AFTER the full
    # sweep map, so a grown sweep could fit ZERO of them (r12: empty
    # "queries" dict -> no per-query round-over-round in PERF_r13).  Order
    # of precedence now: the 10 slowest headline queries are ALWAYS on the
    # line; the sweep map is truncated (slowest kept, count recorded) until
    # the line fits; any remaining room goes to more query entries.
    by_cost = sorted(times, key=times.get, reverse=True)
    compact["queries"] = {n: times[n] for n in by_cost[:10]}
    sweep_by_cost = sorted(sweep, key=sweep.get, reverse=True)
    keep = len(sweep_by_cost)
    while len(json.dumps(compact)) > 1800 and keep > 0:
        keep -= 1
        compact["sweep_queries"] = {
            **{n: sweep[n] for n in sweep_by_cost[:keep]},
            "_truncated": {"n_total": len(sweep)},
        }
    for name in by_cost[10:]:
        trial = dict(compact["queries"], **{name: times[name]})
        if len(json.dumps(dict(compact, queries=trial))) > 1800:
            break
        compact["queries"] = trial
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
