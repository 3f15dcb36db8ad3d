"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``qrapids_forecast_r_script_spark``; this file
only aggregates the per-module registries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's end-to-end slice (SURVEY §7) — ETS
    forecast, horizon 14, for every events-derived metric series at
    sf0.001, via the grouped-applyInPandas forecast core."""
    from qrapids_forecast_r_script_spark.flagship import flagship
    return flagship(spark, "/root/testdata/sf0.001")


# Round-4 driver window (the driver checks the first ~50 merged entries).
# Signal allocation: rounds 1-3 proved 145 distinct queries (140
# hash-green, 5 rows-only, 0 failures); 66 registered queries have never
# had a driver row.  Round 4 front-loads (a) the three queries whose
# RESULTS changed this round (constant-k knn anchors, the dp seed
# column, the disjoint conformal calibration window), (b) the 8 model
# fits that never got even a rows-only row plus the new all-method
# backtest (one rows-only row each — then they rotate OUT per the r3
# verdict), and (c) 38 never-checked oracled queries across the
# retrieval / forecast-eval / graph / linkage / spectral /
# training-prep / assoc-privacy / data-quality layers.  The remaining
# never-checked oracled queries (~17 deferrals — profilers,
# product-analytics tails, the stream-stream outer join, TWS — plus
# round 4's twelve additions: events_ks_drift, bpe_encode_docs,
# paragraph_dedup_rewrite, doc_novelty_scores, corpus_zipf_fit,
# benford_first_digit_audit, char_trigram_lang_classifier,
# rm3_query_expansion, doc_graph_link_prediction,
# mixture_waterfill_budget, jl_projection_distortion, series_acf,
# media_dhash_neardup, curriculum_order, forecast_croston_events,
# hierarchical_forecast_coherence, doc_graph_kcore,
# mmr_diversified_topk, chi_square_independence,
# missing_value_imputation, doremi_domain_weights,
# logrank_cohort_test, nb_calibration_curve,
# conformal_coverage_backtest, series_leadlag_xcorr,
# reciprocal_knn_pairs, readability_scores, incremental_join_view,
# l_diversity_audit, interval_score_backtest, cart_abandonment_daily,
# media_energy_segments, series_wavelet_energy, events_mad_outliers,
# embedding_drift_centroids, source_dedup_rates,
# session_pattern_match, tokenizer_fertility_by_lang,
# user_erasure_audit, source_length_qq, funnel_latency_percentiles,
# orders_yoy_growth, sql_api_revenue_report, rfm_quartile_segments,
# ivf_nprobe_sweep, doc_embedding_coverage, dedup_cluster_sizes,
# vocab_coverage_curve, event_interarrival_stats,
# embedding_norm_audit, forecast_ses_events, parts_abc_pareto,
# series_theilsen_trend, series_decomposition_strength,
# doc_graph_eigencentrality, t_closeness_audit, column_stats_profile,
# customer_revenue_gini, forecast_holt_events, cohort_ltv_matrix,
# source_unigram_kl, lsh_precision_recall,
# functional_dependency_audit, order_cycle_time_stats,
# events_ewma_control_chart, doc_graph_degree_powerlaw,
# ab_test_cuped, ab_srm_check, embedding_db_index,
# prefix_filter_join, orders_cdc_apply, session_sequence_pairs,
# duplicate_payment_audit, brand_concentration_hhi,
# rake_keywords_top, plus the batch-9 additions: binary_quant_topk,
# parts_skyline_frontier, ab_mannwhitney_test, ab_diff_in_diff,
# doc_entropy_scores, feature_hash_vectors, hill_tail_index,
# doc_graph_bfs_reachability, forecast_holtwinters_events,
# revenue_bootstrap_ci, chao1_vocab_estimate,
# embedding_alignment_uniformity, event_markov_stationary,
# ucb1_replay_policy, doc_graph_modularity,
# weighted_jaccard_pairs, doc_graph_closeness_sampled,
# revenue_price_volume_bridge, events_trailing_distinct_types,
# ab_sequential_looks, and the batch-16 additions: roc_auc_eval,
# brier_decomposition, target_encoding_loo, negative_sampling_table,
# doc_graph_shortest_paths, isotonic_calibration_map,
# cumulative_gain_curve, ips_policy_value,
# quantile_normalization_map, series_page_hinkley,
# neyman_allocation_sample, simpson_slope_audit,
# parts_running_balance, series_kendall_tau, ab_bh_fdr_nations,
# dow_type_median_polish, and the batch 20-23 additions:
# dedup_capture_recapture, markov_next_event_accuracy,
# item_item_cf_topk, ql_dirichlet_topk, woe_information_value,
# shapley_attribution, kneser_ney_bigram_logprob,
# nelson_aalen_hazard, mh_pooled_odds_ratio,
# james_stein_nation_means, ipf_raking_weights,
# greedy_coverage_selection, als_rank2_factors,
# series_analog_search, source_length_emd,
# bradley_terry_strengths, hmm_forward_filter, doc_length_gmm,
# textrank_keywords, consistent_hash_rebalance,
# meta_analysis_nations, hmm_smoothed_posterior, nb_learning_curve,
# ab_quantile_treatment_effects, ab_power_mde_table,
# hmm_baum_welch_step, platt_scaling_fit, series_dickey_fuller,
# mahalanobis_outliers, weak_label_model, event_time_circular_stats,
# hmm_viterbi_path, dbscan_density_classes,
# hedge_forecast_combination, newsvendor_stock_levels,
# price_elasticity_ols, series_spearman_matrix, evt_gpd_tail_fit,
# littles_law_audit, cf_holdout_lift, blocking_quality_metrics,
# anova_nation_values) are the round-5 window.
FRONT_WINDOW = [
    # results/oracles changed this round — re-prove first
    "knn_label_accuracy",          # constant-k md5-ordered anchor sample
    "dp_noisy_counts",             # deterministic_seed column added
    "conformal_snaive_intervals",  # calibration week now disjoint
    # dedup/IR tail (round-2/3 additions, never driver-checked)
    "ngram_containment_pairs", "contrastive_pairs", "minhash_calibration",
    "incremental_dedup_batch",
    # retrieval layer (lexical, hybrid, compressed, eval)
    "bm25_topk", "hybrid_rrf_topk", "ann_multiprobe_topk", "ann_eval_ndcg",
    "sq8_topk", "matryoshka_topk", "triplet_mining_embeddings",
    # product analytics / experimentation
    "user_survival_curve", "ab_test_report",
    # sources / curation / text-quality tails
    "events_schema_evolution", "leakage_free_split",
    "ccnet_perplexity_buckets", "source_drift_psi",
    # forecast eval + series monitors
    "ensemble_closed_forms", "rolling_origin_backtest",
    "seasonal_residual_outliers", "series_changepoint_cusum",
    "series_rolling_correlation", "series_trend_ols",
    # graph / tokenizer / data-quality
    "doc_graph_communities", "doc_graph_triangles", "bpe_merge_rules",
    "fk_integrity_audit", "snapshot_table_diff",
    # training prep
    "nb_quality_classifier", "sequence_packing_examples",
    "centroid_label_confusion",
    # Python execution family (UDTF + cogrouped as-of)
    "doc_chunks_udtf", "events_orders_asof_cogroup",
    # association / privacy / spectral / linkage
    "basket_part_pairs_lift", "k_anonymity_audit",
    "embedding_pca_projection", "series_dominant_period",
    "customer_entity_resolution",
    # the 8 model fits that never had a driver row (rows-only by
    # design: iterative numpy fits, not SQL-expressible) — one row
    # each this round, then OUT of the window (r3 verdict item 5),
    # plus the new all-method holdout backtest that keeps the whole
    # fit layer visible in every future round it is in-window
    "forecast_theta_events", "forecast_etsdamped_events",
    "forecast_baggedets_events", "forecast_stl_events",
    "forecast_nn_events", "forecast_prophet_events",
    "forecast_arima_force_seasonality_events", "forecast_ets_user_series",
    "forecast_method_backtest",
]


def _registries():
    """All per-module (QUERIES, ORACLES) registries, in driver-check order.

    The driver's correctness run walks the merged dict in insertion order
    and caps at ~50 queries per round, so ordering is signal allocation
    (see FRONT_WINDOW above).  The front block pins the first positions;
    the module blocks that follow re-assign the same key/value without
    moving position (dict insertion-order semantics), so every registered
    query stays present exactly once.

    Imports are deliberately NOT wrapped in try/except: every module ships
    in-repo, and a broken import must fail loud rather than silently drop
    a module's queries from the correctness run.
    """
    from qrapids_forecast_r_script_spark.operators import (
        assoc_privacy,
        spectral,
        bpe,
        cogroup_ops,
        curation,
        data_quality,
        dedup,
        graph,
        linkage,
        multimodal,
        pipeline,
        product_analytics,
        relational,
        relational_ext,
        relational_more,
        scale_patterns,
        similarity,
        text,
        text_quality,
        tpch_full,
        training_prep,
        udtf_ops,
    )
    from qrapids_forecast_r_script_spark.sources import formats, pyds
    from qrapids_forecast_r_script_spark.forecast import queries as fq
    from qrapids_forecast_r_script_spark.streaming import queries as sq
    from qrapids_forecast_r_script_spark.streaming import stateful

    # Full module blocks — rounds 1+2-proven layers land behind the
    # front window in this merged order.
    blocks = [
        (dedup.QUERIES, dedup.ORACLES),
        (similarity.QUERIES, similarity.ORACLES),
        (text.QUERIES, text.ORACLES),
        (multimodal.QUERIES, multimodal.ORACLES),
        (pipeline.QUERIES, pipeline.ORACLES),
        (sq.QUERIES, sq.ORACLES),
        (stateful.QUERIES, stateful.ORACLES),
        (scale_patterns.QUERIES, scale_patterns.ORACLES),
        (product_analytics.QUERIES, product_analytics.ORACLES),
        (formats.QUERIES, formats.ORACLES),
        (curation.QUERIES, curation.ORACLES),
        (text_quality.QUERIES, text_quality.ORACLES),
        (pyds.QUERIES, pyds.ORACLES),
        (fq.EVAL_QUERIES, fq.EVAL_ORACLES),
        (dedup.EXTRA_QUERIES, dedup.EXTRA_ORACLES),
        (graph.QUERIES, graph.ORACLES),
        (bpe.QUERIES, bpe.ORACLES),
        (data_quality.QUERIES, data_quality.ORACLES),
        (training_prep.QUERIES, training_prep.ORACLES),
        (udtf_ops.QUERIES, udtf_ops.ORACLES),
        (cogroup_ops.QUERIES, cogroup_ops.ORACLES),
        (assoc_privacy.QUERIES, assoc_privacy.ORACLES),
        (spectral.QUERIES, spectral.ORACLES),
        (linkage.QUERIES, linkage.ORACLES),
        (sq.EXTRA_QUERIES, sq.EXTRA_ORACLES),
        # capability-gated tail (execution raises without protobuf) —
        # registered here so the in-window allocation is invariant to
        # what the driver container happens to ship (ADVICE r2)
        (stateful.EXTRA_QUERIES, stateful.EXTRA_ORACLES),
        (fq.QUERIES, fq.ORACLES),
        (relational.QUERIES, relational.ORACLES),
        (relational_ext.QUERIES, relational_ext.ORACLES),
        (relational_more.QUERIES, relational_more.ORACLES),
        (tpch_full.QUERIES, tpch_full.ORACLES),
    ]
    all_q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    all_o: dict[str, str] = {}
    for qs, oras in blocks:
        all_q.update(qs)
        all_o.update(oras)
    missing = [n for n in FRONT_WINDOW if n not in all_q]
    if missing:  # fail loud: a renamed query must not silently drop out
        raise KeyError(f"FRONT_WINDOW names not registered: {missing}")
    front = ({n: all_q[n] for n in FRONT_WINDOW},
             {n: all_o[n] for n in FRONT_WINDOW if n in all_o})
    return [front, *blocks]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for qs, _ in _registries():
        out.update(qs)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for _, oracles in _registries():
        out.update(oracles)
    return out
