#!/usr/bin/env python
"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count() forces the full plan; the
driver-side result sizes are tiny so collect overhead is noise). A warmup
run of the flagship amortizes JVM/codegen startup out of the numbers.

Per-query numbers are the MEDIAN of $SPARK_GRAFT_BENCH_ITERS (default 3)
back-to-back runs: the first execution of a heavy query pays one-time
whole-stage-codegen compilation (~2-4 s on the wide dedup aggregates),
which single-shot timing conflated with plan cost — sub-second queries
then tripped round-over-round ratio rules on pure noise. "value" is the
sum of medians; per-query min/max spreads ride in "spread" for honesty.

r11: the full set runs in FRESH-JVM CHUNKS of $SPARK_GRAFT_BENCH_CHUNK
(default 25) queries, each chunk a subprocess with its own Spark JVM.
One long-lived JVM ages its heap across ~130 queries and inflated late
rows up to 9x (BENCH_LOCAL_r10.json: sim_ann_ivf_partitioned 17.9 s
in-run vs 3.2 s isolated; the r10 driver artifact read 1.58x vs r9 on
untouched code from exactly this) — per-chunk JVMs keep every row
comparable to an isolated measurement. Explicit positional query names
(the scale-slope harness) still run in-process; set
SPARK_GRAFT_BENCH_CHUNK=0 to force the old single-JVM mode.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # scan + agg heavy
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "agg_conditional_counts",
    "agg_crosstab_status_priority",
    "agg_created_per_week",
    # joins
    "join_multi_hop_revenue",
    "join_parent_name",
    "filter_window_anti",
    # windows / merge
    "merge_keep_last",
    "window_group_boundaries",
    # top-k
    "filter_backlog_topk",
    # task-domain suite over relational-scale input
    "tasks_adapter_summary",
    "tasks_adapter_immediate",
    # pipeline ops
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_topk_cosine",
    "text_quality",
    "text_token_counts",
    # heavy iterative / stateful ops (added r2 per verdict: keep the set
    # stable and growing, never shrinking, so round-over-round deltas are
    # comparable on the shared prefix)
    "events_sessionize",
    "dedup_cluster_collapse",
    # behavioral ops (added r3 once registered, per verdict: r3 is their
    # baseline round)
    "funnel_view_click_purchase",
    "retention_weekly_cohorts",
    # r3's heaviest additions, benched since r4 so they get
    # round-over-round tracking before anyone scales them (r4 is their
    # baseline round)
    "dedup_incremental_cross",
    "heavy_hitters_users",
    # r4's 12 operator families, appended r5 so every registered family
    # has wall-clock history (shared prefix above stays untouched for
    # round-over-round comparability; r5 is the baseline round for
    # these)
    "matview_incremental_refresh",
    "diff_snapshot_orders",
    "quality_expectations_orders",
    "web_canonical_url_dedup",
    "anomaly_sigma_events",
    "curation_reservoir_per_group",
    "reshape_melt_lineitem",
    "ts_resample_daily_gaps",
    "ts_trend_by_type",
    "dedup_semantic_pairs",
    "attr_linear_credit",
    "session_native_aggregates",
    "profile_documents",
    # r5 additions (substring-level dedup family + hard negatives +
    # vocabulary coverage), benched from birth
    "dedup_substring_spans",
    "text_gram_novelty",
    "sim_hard_negatives",
    "text_vocab_coverage",
    "curation_quota_mix",
    "curation_equidepth_bins",
    "profile_diversity_by_lang",
    "dedup_group_overlap",
    "sim_knn_disagreement",
    "behavior_inter_arrival",
    "behavior_trending_topk",
    "profile_drift_documents",
    "anomaly_rolling_sigma",
    "curation_winsorize",
    "text_quantile_rank",
    "text_bpe_merges",
    "text_cooccurrence",
    "curation_split_leakage",
    # r6 additions (trained-in-query scaled IVF, pruned co-occurrence,
    # mixing/weights/loop-detector families), benched from birth
    "sim_ann_ivf",
    "text_cooccurrence_pruned",
    "curation_temperature_mix",
    "curation_class_weights",
    "text_token_runs",
    "curation_semantic_decontam",
    "curation_token_budget",
    "text_hashed_classifier",
    "dedup_cluster_keep_best",
    "layout_bucketed_join",
    "text_bigram_familiarity",
    "anomaly_mad_events",
    "behavior_covisitation",
    "behavior_covisitation_lift",
    "behavior_decayed_counts",
    "sim_ann_pq",
    # r7 additions: the registry's heaviest previously-unbenched rows
    # (levenshtein was 4x the heaviest benched query in
    # PARITY_TIMED_r06.json with no wall-clock tracking), benched from
    # birth so "inherently heavy" becomes a measured slope
    "dedup_levenshtein_pairs",
    "dedup_embedding_pairs",
    "dedup_ngram_jaccard",
    "sketch_hll_users",
    # r7: static-codebook ANN probe rows — the amortized steady-state
    # search numbers (their trained-in-query siblings deliberately pay
    # training inside the timed row)
    "sim_ann_pq_probe",
    "sim_ann_ivfpq_probe",
    # r7 operator families, benched from birth
    "dedup_levenshtein_qgram",
    "graph_label_propagation",
    "curation_importance_score",
    "text_bpe_encode",
    "curation_temperature_take",
    "graph_triangle_stats",
    "graph_kcore",
    "text_token_diversity",
    "multimodal_phash_pairs",
    "curation_interleave",
    # r8 operator families, benched from birth (curation_corpus_e2e
    # stays OUT: its Spark side is a seven-stage composition ~30 s at
    # sf0.01 — wall-clock coverage lives in the parity mirror's
    # spark_secs, the sim_ann_pq/ivfpq precedent)
    "curation_ccnet_buckets",
    "curation_shuffle_order",
    "curation_semantic_split_leakage",
    "curation_semantic_split_leakage_lsh",
    "sim_ann_ivf_partitioned",
    # r10, benched from birth
    "curation_systematic_sample",
    "dedup_levenshtein_minhash",
    "dedup_levenshtein_incremental",
    "dedup_paragraphs",
    "profile_numeric_correlations",
    "behavior_path_trigrams",
    "behavior_rfm_segments",
    "ts_autocorrelation",
    "text_readability",
    "quality_referential_integrity",
    "profile_benford_prices",
    # r10 second batch: inferential/concentration statistics, benched
    # from birth
    "stats_chi_square_orders",
    "profile_gini_customer_revenue",
    "stats_hhi_nation_revenue",
    "stats_weighted_quantiles_returnflag",
    "stats_welch_ttest_events",
    "stats_mann_whitney_events",
    "skyline_parts",
    "behavior_activity_streaks",
    "ts_dow_profile",
    "stats_auc_doc_length",
    "stats_ks_test_events",
    "quality_functional_dependency",
    "quality_key_candidates",
    "ts_changepoint_events",
    "profile_tv_weekend_events",
    "behavior_conversion_latency",
    "agg_mode_status",
    "stats_rank_normalize_prices",
    "diff_revenue_drivers",
    "profile_correlations_by_flag",
    "behavior_basket_lift",
    "ts_time_weighted_events",
    "profile_pareto_customers",
    "stats_srm_event_mix",
    # r11, benched from birth
    "streaming_drift_scores",
    "stats_cliffs_delta_events",
    "stats_spearman_prices",
    "stats_cramers_v_orders",
    "stats_two_proportion_events",
    "agg_rollup_revenue",
    "agg_cube_margins",
    "agg_pivot_status",
    "behavior_markov_transitions",
    "behavior_cohort_ltv",
    "ts_gap_report",
    "profile_cardinalities",
    "quality_iqr_outliers",
    "curation_target_encode",
    "curation_kfold_stats",
    "behavior_survival_hazard",
    "ts_ewma_events",
    "ts_cross_correlation",
    "quality_rate_drift",
    "graph_link_prediction",
    "curation_curriculum",
    "dedup_containment",
    "sort_topk_per_group",
    "profile_price_deciles",
    "quality_reconciliation",
    "stats_eta_squared_events",
    "behavior_stickiness",
    "behavior_funnel_within",
    # r12, benched from birth
    "stats_cohens_kappa_orders",
    "behavior_attribution",
    "behavior_retention_days",
    "behavior_bounce_rate",
    "behavior_power_curve",
    "behavior_growth_accounting",
    "graph_degree_assortativity",
    "ts_seasonality_index",
    "text_hapax_ratio",
    "text_dup_ngrams",
    "text_oov_rate",
    "behavior_arpu",
    "profile_gini_by_group",
    "agg_grouping_sets_revenue",
    "ts_burstiness_index",
    "dedup_rate_card",
]


def _run_in_process(
    queries: list[str], sf_dir: str, iters: int
) -> tuple[dict[str, float], dict[str, list[float]]]:
    """Time the named queries in THIS process's Spark session."""
    from notion_spark import parity
    from notion_spark.session import BENCH_DRIVER_MEMORY_CONF, get_spark

    spark = get_spark(
        app_name="notion-spark-bench",
        extra_conf={"spark.ui.enabled": "false", **BENCH_DRIVER_MEMORY_CONF},
    )

    # Warmup: JVM JIT + codegen + parquet footer caches.
    parity.QUERIES["q1_pricing_summary"](spark, sf_dir).count()

    times: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in queries:
        fn = parity.QUERIES[name]
        # Isolation barrier: a heavy neighbor's shuffle garbage otherwise
        # bleeds GC pauses into the NEXT query's timing (measured: one
        # query read 17.1x scale slope in sequence vs 3.0x isolated —
        # SCALE.md). Clear cached frames, force a full JVM GC, and let the
        # heap settle before the first timed iteration.
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        time.sleep(0.3)
        runs = []
        for _ in range(iters):
            t0 = time.time()
            fn(spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
        runs.sort()
        # true median (even counts average the middle pair — the naive
        # upper-middle pick would report the cold codegen run at iters=2)
        mid = len(runs) // 2
        med = runs[mid] if len(runs) % 2 else (runs[mid - 1] + runs[mid]) / 2
        times[name] = round(med, 3)
        spread[name] = [runs[0], runs[-1]]
    return times, spread


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    worker = "--worker" in sys.argv
    # optional positional args restrict the run to named queries (used by
    # the sf0.1->sf1 scale-slope harness; the driver passes none)
    selected = [q for q in sys.argv[1:] if not q.startswith("-")]
    queries = selected or BENCH_QUERIES

    from notion_spark import parity

    # fail a typo'd name in milliseconds, not with a bare KeyError after
    # a full Spark startup + warmup
    unknown = [q for q in queries if q not in parity.QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown} — see notion_spark.parity.QUERIES")

    iters = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3")))
    chunk = int(os.environ.get("SPARK_GRAFT_BENCH_CHUNK", "25"))

    if worker or selected or chunk <= 0 or len(queries) <= chunk:
        # explicit names / worker / chunking disabled: one JVM, in-process
        times, spread = _run_in_process(queries, sf_dir, iters)
    else:
        # fresh-JVM chunks: each subprocess starts its own Spark JVM so
        # no row pays a predecessor chunk's aged heap
        times, spread = {}, {}
        for i in range(0, len(queries), chunk):
            part = queries[i : i + chunk]
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", *part],
                capture_output=True,
                text=True,
                env=os.environ,
            )
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr[-4000:])
                sys.exit(f"bench worker failed on chunk starting {part[0]}")
            line = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()][-1]
            out = json.loads(line)
            times.update(out["queries"])
            spread.update(out["spread"])

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "notion-spark headline queries wall time",
                "value": total,
                "unit": "sec",
                "queries": times,
                "spread": spread,
                "iters": iters,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
