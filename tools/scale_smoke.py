"""Scale-up smoke: replicate sf0.1 by N× into /tmp and re-run the bench
headline, checking that per-query time grows ~linearly (no plan cliff:
a broadcast flipping to a blowup, a sort spilling pathologically, etc).

Usage: python tools/scale_smoke.py [factor]   (default 10)

Replication multiplies fact tables (lineitem, orders, events, documents,
embeddings) with key-shifted copies so join fan-outs stay realistic
(each copy joins within itself, like extra partitions of the same
logical table). Dimensions stay as-is.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from shelf_spark.data import TABLES, load_table
from shelf_spark.session import get_spark
from shelf_spark.queries import QUERIES

SRC = "/root/testdata/sf0.1"
FACTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "agg_rollup",
    "window_running",
    "events_sessionize",
    "events_asof_join",
    "fn_explode_words",
    "q13_customer_distribution",
    "q18_large_volume_customers",
    "sample_bernoulli_hash",
    "interleave_weighted_sources",
    "dedup_near_dup_clusters",
    "text_repetition_stats",
    "text_decontaminate",
    "text_vocab_topk",
    "pack_token_shards",
    "vectors_kmeans_assign",
    "events_funnel",
    "events_retention_cohorts",
    "events_transition_matrix",
    "scd2_merge_customers",
    "agg_histogram",
    "er_fuzzy_name_match",
    "q8_market_share",
    "q9_profit_by_nation_year",
    # round-2 tier
    "agg_corr_regr",
    "agg_grouped_regr_jvm",
    "ts_anomaly_zscore",
    "ts_ewma",
    "text_tfidf_topk",
    "text_bm25_rank",
    "text_chunk_sliding",
    "mba_item_pairs",
    "graph_pagerank",
    "vectors_quantize_int8",
    "q2_min_cost_supplier",
    "q20_excess_inventory",
    "incr_merge_partials",
    "events_new_users_daily",
    "sample_cap_per_group",
    # round-5: re-verify the queries whose plans changed in r4 (hint
    # removal, q19 implied-predicate pushdown, q17 shuffle reuse)
    "q14_promo_share",
    "q16_part_supplier_counts",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
    # round-6: the changed plans (star-contraction clusters, window-df
    # tfidf/jaccard, broadcast-state pagerank, map-side-wedge triangles)
    # + the families newly added to bench.py
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "graph_triangle_count",
    "join_interval_overlap",
    "join_range_bucketed",
    "agg_heavy_hitters",
    "dedup_semantic_clusters",
    # late-r6: new operators + the two replanned ones (adjacency-intersect
    # triangles, sweep-line interval overlap)
    "dedup_substring_exact",
    "ml_quantile_bins",
    "sample_weighted_topk",
    "cdc_apply_changes",
    "events_attribution_last_touch",
    "events_asof_tolerance",
    "stream_cdc_upsert",
    "multimodal_frame_sample",
    "events_asof_nearest",
    # round-7: the distributed-prefix-sum replans are already above
    # (join_interval_overlap, ml_quantile_bins); add the new operators
    "events_asof_orders",
    "dedup_semantic_clusters_t40",
    "text_chunk_cdc",
    "dedup_chunk_cdc",
    "events_conversion_paths",
    "multimodal_audio_features",
    "ann_lsh_topk",
    "sample_epoch_shuffle",
    "join_scd2_pointintime",
    "stream_asof_enrich",
    "text_inverted_index",
    "ml_pareto_frontier",
    "events_ohlc_daily",
    "multimodal_image_ahash",
    "text_pmi_bigrams",
    "events_anomaly_mad",
    "ml_target_encoding",
    "dedup_image_ahash",
    "multimodal_video_scene_cuts",
    "text_keyphrase_rake",
    "ml_eval_binary_metrics",
    "sample_stratified_neyman",
    "multimodal_audio_vad_segments",
    "events_markov_stationary",
    "events_rfm_segments",
    "agg_abc_classification",
    "orders_cohort_revenue",
    "stream_ohlc_daily",
    "ts_cross_correlation",
    "ml_eval_multiclass",
    "vectors_centroid_drift",
    "clean_impute_group_median",
    "events_survival_km",
    "ab_test_proportions",
    "vectors_pca_top_component",
    "vectors_abtt_postprocess",
    "dedup_cross_source_matrix",
    "graph_assortativity",
    "mix_source_entropy",
    "privacy_k_anonymity",
    "ts_theil_sen_trend",
    "dq_distribution_drift",
    # round-8: model-eval tier, robust stats, graph communities, cadence,
    # C4 filter, l-diversity, bucketed join, LSH/anti twins
    "ml_roc_auc",
    "ml_ks_statistic",
    "ml_lift_deciles",
    "ml_calibration_bins",
    "stats_chi_square",
    "clean_outlier_iqr",
    "ts_changepoint_cusum",
    "graph_connected_components",
    "graph_degree_distribution",
    "events_interarrival_stats",
    "filter_c4_style",
    "privacy_l_diversity",
    "join_bucketed_colocated",
    "dedup_minhash_lsh_selfdup",
    "join_anti_survivors",
    "dq_psi_stability",
    "stats_welch_ttest",
    "ml_feature_hashing",
    "sink_partitioned_pruning",
    "sql_recursive_cte",
    "sample_temporal_split_embargo",
    "dedup_incremental_batch",
    "dedup_containment_ngram",
    "ts_seasonal_decompose",
    "ann_pq_topk",
    "pack_sequences_ffd",
    "rollup_quantile_histogram",
    "pref_bradley_terry",
    "sample_kcenter_coreset",
    "stats_benjamini_hochberg",
    "text_collocation_llr",
    "graph_kcore",
    "ml_naive_bayes_langid",
    "events_window_funnel",
    "events_markov_attribution",
    "dq_expectation_suite",
    "stream_dq_expectations",
    "clean_rare_category_collapse",
    "events_retention_halflife",
    "ann_hybrid_rrf",
    "sample_dedup_aware_split",
    "vectors_matryoshka_eval",
    "privacy_dp_count_release",
    "ml_linear_attribution",
    "events_path_trigrams",
    "dedup_simhash_sha",
    "sample_importance_dsir",
    "sink_zorder_layout",
    "text_bpe_pair_counts",
    "stats_poisson_bootstrap_ci",
    "ts_holt_linear_forecast",
    "graph_link_prediction",
    "rollup_cms_frequencies",
    "stream_cms_frequencies",
    "ann_binary_hamming_topk",
    "text_winnowing_fingerprints",
    "dedup_winnowing_pairs",
    "stats_mann_whitney_u",
    "stats_kruskal_wallis",
    "ml_average_precision",
    "stats_spearman_rho",
    "privacy_t_closeness",
    "graph_hits",
    "graph_bfs_distances",
    "text_zipf_fit",
    "ml_mutual_information",
    "stats_jarque_bera",
    "ml_cohens_kappa",
    "ts_sax_symbols",
    "text_bigram_lm_perplexity",
    "stats_anova_oneway",
    "set_intersect_all",
    "set_except_all",
    "events_bounce_rate",
    "stats_levene",
    "ml_ndcg_at_k",
    "sample_balanced_downsample",
    "orders_open_backlog_daily",
    "er_sorted_neighborhood",
    "stats_friedman",
    "rollup_bitmap_distinct",
    "join_dynamic_partition_pruning",
    "dq_benford_law",
    "ts_fourier_periodogram",
    "stream_bitmap_distinct",
    "events_user_lifetime_gini",
    "agg_weighted_median",
    "graph_clustering_coefficient",
    "stats_wilcoxon_signed_rank",
    "stats_runs_test",
    "text_heaps_law_fit",
    "stats_grubbs_outlier",
    "ml_matthews_corrcoef",
    "ts_control_chart_xmr",
    "ts_peak_detection",
    "ts_snaive_backtest",
    "ann_ivf_exhaustive",
    "stats_effect_sizes",
    "ml_expected_calibration_error",
    "dedup_keep_best_per_cluster",
    "events_time_to_convert",
    "vectors_cosine_histogram",
    "ml_brier_score",
    "sample_negative_table",
    "text_pii_redact",
    "stats_kendall_tau",
    "ts_mann_kendall",
    "ts_acf",
    "events_concurrent_sessions",
    "set_union_by_name",
    "text_phrase_search",
    "multimodal_image_dhash",
    "ml_mrr",
    "ml_best_f1_threshold",
    "dq_freshness_lag",
    "graph_modularity",
    "cdc_diff_snapshots",
    "ml_fairness_parity",
    "text_kneser_ney_perplexity",
    "multimodal_audio_spectrogram",
    "scan_merge_schema",
    "stream_freshness_lag",
    "ts_ljung_box",
    "vectors_dim_variance",
    "er_golden_record",
    "dq_referential_integrity",
    "stats_median_ci_exact",
    "sample_rolling_origin_folds",
    "pipeline_corpus_curation_e2e",
    "sink_orc_roundtrip",
    "scan_csv_malformed",
    "stats_tukey_hsd",
    "stats_power_analysis",
    "ts_holt_winters",
    "text_novelty_score",
    "ts_max_drawdown",
    "pipeline_entity_resolution_e2e",
    "pipeline_feature_store_e2e",
    "ts_anomaly_seasonal_mad",
    "graph_knn_degree_curve",
]


def replicate(spark, factor: int, dest: str) -> None:
    for name in TABLES:
        out = os.path.join(dest, f"{name}.parquet")
        df = load_table(spark, SRC, name)
        if name in FACTS:
            shift_cols = FACTS[name]
            copies = []
            # key-shift each copy so keys stay unique but join selectivity
            # per logical row is unchanged
            span = 10_000_000
            for i in range(factor):
                c = df
                for col in shift_cols:
                    c = c.withColumn(col, F.col(col) + F.lit(i * span))
                # documents: tag each copy's vocabulary so copies are NOT
                # verbatim duplicates of each other. Untagged replication
                # multiplies the true near-dup pair count ~factor² (every
                # copy duplicates every other), which measures output
                # growth, not algorithmic scaling — real crawls grow with
                # a roughly constant dup rate, which this preserves.
                if name == "documents" and i > 0:
                    c = c.withColumn(
                        "text",
                        F.array_join(
                            F.transform(
                                F.split(F.col("text"), " "),
                                lambda w: F.concat(w, F.lit(f"~{i}")),
                            ),
                            " ",
                        ),
                    )
                # embeddings: same rationale as the text tagging — apply a
                # per-copy orthogonal reflection (flip a copy-specific
                # pseudo-random half of the dimensions). Within-copy
                # cosines are EXACTLY preserved (reflections are
                # orthogonal), cross-copy cosines collapse toward 0, so
                # the true semantic-dup rate stays constant instead of
                # every copy duplicating every other (~factor² pairs).
                if name == "embeddings" and i > 0:
                    c = c.withColumn(
                        "embedding",
                        F.transform(
                            "embedding",
                            lambda x, j: F.when(
                                F.xxhash64(F.lit(i), j) % 2 == 0, x
                            ).otherwise(-x),
                        ),
                    )
                copies.append(c)
            df = copies[0]
            for c in copies[1:]:
                df = df.unionAll(c)
            # orders.o_custkey must still hit customer: wrap back into range
            if name == "orders":
                n_cust = load_table(spark, SRC, "customer").count()
                df = df.withColumn(
                    "o_custkey", (F.col("o_custkey") % F.lit(n_cust)) + 1
                )
            if name == "events":
                # keep user_id cardinality fixed: sessionization load grows
                # per-user, the realistic shape for more traffic
                pass
        df.write.mode("overwrite").parquet(out)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    dest = f"/tmp/shelf-scale-{factor}x"
    spark = get_spark("scale-smoke")
    if not os.path.exists(os.path.join(dest, "lineitem.parquet")):
        t0 = time.perf_counter()
        os.makedirs(dest, exist_ok=True)
        replicate(spark, factor, dest)
        print(f"replicated {factor}x in {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    def run_once(name: str, sf_dir: str) -> float:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    results = {}
    failures = []
    for sf_dir, label in ((SRC, "1x"), (dest, f"{factor}x")):
        timings = {}
        for name in HEADLINE:
            # One retry per query: ~150 queries × 2 scales run >10⁴ jobs
            # in one JVM, and Spark's ContextCleaner can GC an
            # accumulator still referenced by a running stage (observed
            # once late in a full sweep) — transient, not a plan defect.
            try:
                timings[name] = run_once(name, sf_dir)
            except Exception:
                try:
                    timings[name] = run_once(name, sf_dir)
                except Exception as exc:  # record, don't abort the sweep
                    failures.append({"query": name, "scale": label,
                                     "error": str(exc)[:200]})
        results[label] = timings
        print(f"{label}: total {sum(timings.values()):.2f}s", file=sys.stderr)
        # Fresh session per scale: resets accumulator/broadcast state so
        # the second pass measures the engine, not session accretion.
        spark.stop()
        spark = get_spark("scale-smoke")

    ratios = {
        n: round(results[f"{factor}x"][n] / max(results["1x"][n], 1e-9), 1)
        for n in HEADLINE
        if n in results["1x"] and n in results[f"{factor}x"]
    }
    print(json.dumps({"factor": factor, "timings": results,
                      "ratio": ratios, "failures": failures}))


if __name__ == "__main__":
    main()
