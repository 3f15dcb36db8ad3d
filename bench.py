#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

COVERAGE RULE (r9, verdict item 6 — so a regression in an unbenched
family can't hide): the suite is the FULL ``queries()`` registry minus
two named exclusion sets, both pinned below:

- ``EXCLUDED_ITERATIVE_FITS`` — the 12 applyInPandas model-fit queries
  (ARIMA/NN/BAGGEDETS/PROPHET/HYBRID/THETA/STL/ETSDAMPED + the two
  fan-out twins + the all-method backtest).  At sf0.1 these are
  minutes-scale numerical fitting jobs; their numerics are pinned by
  the golden/parity pytest suite and the fit LAYER's plan cost is
  benched through the kept representatives ``forecast_ets_events`` /
  ``forecast_ets_user_series`` (same applyInPandas envelope).
- ``EXCLUDED_PAIR_SCANS`` — the 2 raw all-shingle-pair dedup forms
  (>15 s each at sf0.1 by design: they materialize the un-banded
  pair set as the oracle baseline for LSH recall).  Their scale path
  ``minhash_lsh_pairs`` IS benched.

Everything else runs: the ``HEADLINE`` list keeps the historical
(r1-r8) ordering for cross-round per-query comparability, and every
remaining registry query is appended in registry order.  Totals from
r9 on are therefore not comparable to ≤r8 totals; per-query medians on
shared queries (the BASELINE.md basis) remain the comparison unit.

Each query runs to completion (count) with AQE on.

Per-query timings are the MEDIAN over ``$SPARK_GRAFT_BENCH_REPS`` runs
(default 3) — BASELINE.md documents ~1.8x host-contention spread on
single runs, so medians are the comparable number across rounds.  The
first rep of each query doubles as its warm-up; the headline total is
the sum of medians.

MEASUREMENT-HYGIENE FIX (r10, VERDICT r9 items 3+4 — documented in
OPTIMIZATION_r10.md): before each rep's timer starts, the harness
releases every materialized intermediate left by PREVIOUS invocations
(``qrapids_forecast_r_script_spark.lineage.release_stale``: unpersist
stale RDD blocks + clear the SQL cache).  r9 ran 405 queries x 3 reps
in one JVM with ~135 ``localCheckpoint()``/``persist()`` sites and no
release anywhere, so (a) dead blocks accumulated for the whole run —
the driver's late-suite untouched queries regressed 1.5-3x at 32
cores — and (b) reps 2-3 of any ``persist()``-using query served rep
1's still-live SQL-cache entry (plan-equality match) and measured a
cache read instead of computing from parquet.  The release runs
OUTSIDE the timed window (it is bookkeeping for prior queries, like
the JVM warm-up); the recompute it forces lands INSIDE rep 2/3's
window, making medians strictly more honest.  Timing methodology —
median over reps of construct+count, same run list, same scale — is
unchanged, so per-query cross-round comparisons remain valid.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "events_daily_rolling",
    "events_asof_last_error",
    "user_sessions",
    "dedup_exact",
    "minhash_lsh_pairs",
    "cosine_topk_bruteforce",
    "text_stats",
    "forecast_snaive_events",
    "forecast_ets_events",
    "forecast_ets_user_series",
    # round-1 widening: TPC-H sweep + range join + ANN + dedup clustering
    "q9_product_profit",
    "q18_large_volume_customers",
    "events_range_join_binned",
    "ivf_topk",
    "dedup_clusters",
    # scale patterns: skew salting + bucketed co-located join
    "salted_skew_join",
    "bucketed_orders_join",
    # round-2 rotation: true Structured Streaming micro-batches
    "events_stream_tumbling_1h",
    "events_session_windows",
    # round-2 additions: PQ shortlist+rerank ANN, corpus bigram LM
    "pq_topk",
    "doc_bigram_logprob",
    # round-2 additions: Bloom containment pre-filter, OPTIMIZE-style
    # compaction (first rep pays the one-time /tmp artifact writes;
    # the median is warm, like bucketed_orders_join)
    "bloom_ngram_containment",
    "compact_small_files",
    # k-means-refined IVF — the production ANN form (2 Lloyd rounds)
    "ivf_kmeans_topk",
    # round-3 additions: SCD-2 history upsert, map-only PII redaction,
    # MaxSim late-interaction retrieval, cluster-dedup keep-best
    "orders_upsert_scd2",
    "pii_scrub_docs",
    "maxsim_multivector_topk",
    "dedup_keep_best",
    # round-3 additions (second batch): span-excision decontamination,
    # streaming trending leaderboard, partition-pruned layout scan
    "decontaminate_spans",
    "events_stream_trending_topk",
    "events_partitioned_pruning",
    # round-3 additions (third batch): CMS heavy hitters, PageRank over
    # the dup graph, weighted sampling, update-mode trending upsert
    "cms_heavy_hitters",
    "doc_graph_pagerank",
    "weighted_sample_docs",
    "events_stream_trending_upsert",
    # round-3 additions (closing batch): incremental state merge,
    # per-epoch shuffle, schema evolution, SCD-2 as-of, hashed-chunk
    # retrieval, leakage-free split, NDCG retrieval eval
    "incremental_agg_merge",
    "epoch_shuffle_order",
    "events_schema_evolution",
    "orders_scd2_asof",
    "chunk_hash_embed_topk",
    "leakage_free_split",
    "ann_eval_ndcg",
    # round-3 additions (fourth batch): SQ8 + Matryoshka compressed
    # retrieval, CCNet perplexity terciles, PSI drift monitor,
    # cross-snapshot incremental dedup
    "sq8_topk",
    "matryoshka_topk",
    "ccnet_perplexity_buckets",
    "source_drift_psi",
    "incremental_dedup_batch",
    # BPE merge induction (tokenizer-training step, vocab-bounded)
    "bpe_merge_rules",
    # data-quality layer: FK audit, snapshot reconciliation diff,
    # join-key skew profile
    "fk_integrity_audit",
    "snapshot_table_diff",
    "join_key_skew_profile",
    # conversation assembly + robust curation stats
    "session_transcripts",
    "winsorized_doclen_stats",
    # multi-probe LSH, triplet mining, packing efficiency, diversity
    "ann_multiprobe_topk",
    "triplet_mining_embeddings",
    "shard_packing_efficiency",
    "corpus_diversity_stats",
    # forecast eval: closed-form ensemble + rolling-origin CV
    "ensemble_closed_forms",
    "rolling_origin_backtest",
    # lexical + hybrid retrieval (BM25, dense+lexical RRF fusion)
    "bm25_topk",
    "hybrid_rrf_topk",
    # graph triangles + kNN embedding-quality eval
    "doc_graph_triangles",
    "knn_label_accuracy",
    # behavior Markov matrix + seasonal-residual anomaly monitor
    "event_transition_matrix",
    "seasonal_residual_outliers",
    # training-prep layer: NB quality classifier, pack-and-chunk,
    # noisy-label centroid audit; UDTF chunker (Python-boundary cost
    # visible next to the relational doc_chunks fast path)
    "nb_quality_classifier",
    "sequence_packing_examples",
    "centroid_label_confusion",
    "doc_chunks_udtf",
    # cogrouped-Pandas as-of alignment, outer stream join (eviction
    # semantics), numeric distribution profiler
    "events_orders_asof_cogroup",
    "events_stream_stream_left_join",
    "events_numeric_profile",
    # association mining + privacy audits
    "basket_part_pairs_lift",
    "k_anonymity_audit",
    "dp_noisy_counts",
    # spectral methods: power-iteration PCA, periodogram seasonality
    "embedding_pca_projection",
    "series_dominant_period",
    # record linkage + survival analysis
    "customer_entity_resolution",
    "user_survival_curve",
    # series monitors + data-contract gate
    "series_changepoint_cusum",
    "series_rolling_correlation",
    "events_contract_violations",
    # experimentation, attribution, positional IR
    "ab_test_report",
    "purchase_attribution_decay",
    "proximity_search",
    # label-propagation communities over the dup graph
    "doc_graph_communities",
    # OLS trend + split-conformal intervals
    "series_trend_ols",
    "conformal_snaive_intervals",
    # round-4: distribution-free KS drift monitor; tokenizer encode
    "events_ks_drift",
    "bpe_encode_docs",
    # round-4 continuation: paragraph dedup rewrite, novelty, Zipf,
    # Benford, trigram lang classifier, RM3 feedback retrieval,
    # link prediction, mixture water-filling
    "paragraph_dedup_rewrite",
    "doc_novelty_scores",
    "corpus_zipf_fit",
    "benford_first_digit_audit",
    "char_trigram_lang_classifier",
    "rm3_query_expansion",
    "doc_graph_link_prediction",
    "mixture_waterfill_budget",
    "jl_projection_distortion",
    "series_acf",
    "media_dhash_neardup",
    "curriculum_order",
    # round-4 continuation: intermittent-demand Croston/SBA and
    # hierarchical forecast reconciliation (bottom-up / top-down)
    "forecast_croston_events",
    "hierarchical_forecast_coherence",
    # round-4 continuation: k-core peel over the dup graph, MMR
    # diversified re-ranking over the retrieval shortlist
    "doc_graph_kcore",
    "mmr_diversified_topk",
    # round-4 continuation: categorical-independence audit + group-wise
    # imputation report
    "chi_square_independence",
    "missing_value_imputation",
    # round-4 continuation: loss-driven mixture reweighting
    "doremi_domain_weights",
    # round-4 continuation: time-to-event cohort test, classifier
    # calibration audit, conformal coverage backtest
    "logrank_cohort_test",
    "nb_calibration_curve",
    "conformal_coverage_backtest",
    # round-4 continuation: lead-lag transfer read, mutual-kNN filter,
    # readability gate
    "series_leadlag_xcorr",
    "reciprocal_knn_pairs",
    "readability_scores",
    # round-4 continuation: IVM delta-join identity, l-diversity gate,
    # proper interval scoring
    "incremental_join_view",
    "l_diversity_audit",
    "interval_score_backtest",
    # round-4 continuation: session leakage metric + VAD-style payload
    # segmentation
    "cart_abandonment_daily",
    "media_energy_segments",
    # round-4 continuation: timescale-resolved variance + robust
    # outlier audit
    "series_wavelet_energy",
    "events_mad_outliers",
    # round-4 continuation: embedding snapshot drift + per-source
    # duplication profile
    "embedding_drift_centroids",
    "source_dedup_rates",
    # round-4 continuation: MATCH_RECOGNIZE-style sequence patterns +
    # tokenizer fairness profile
    "session_pattern_match",
    "tokenizer_fertility_by_lang",
    # round-4 continuation: GDPR erasure cascade audit
    "user_erasure_audit",
    # round-4 continuation: QQ drift ladder, conversion latency, YoY
    "source_length_qq",
    "funnel_latency_percentiles",
    "orders_yoy_growth",
    # round-4 continuation: verbatim-SQL API proof + RFM grid
    "sql_api_revenue_report",
    "rfm_quartile_segments",
    # round-4 continuation: the IVF tuning curve + index-freshness edge
    "ivf_nprobe_sweep",
    "doc_embedding_coverage",
    # round-4 continuation: structure/traffic/vocab audits
    "dedup_cluster_sizes",
    "vocab_coverage_curve",
    "event_interarrival_stats",
    "embedding_norm_audit",
    # round-4 continuation: exactly-oracled SES + ABC concentration
    "forecast_ses_events",
    "parts_abc_pareto",
    # round-4 continuation (batch 2): robust trend, decomposition
    # strength routing features, eigenvector centrality, t-closeness
    # EMD audit, catalog column stats, revenue Gini
    "series_theilsen_trend",
    "series_decomposition_strength",
    "doc_graph_eigencentrality",
    "t_closeness_audit",
    "column_stats_profile",
    "customer_revenue_gini",
    # round-4 continuation (batch 3): exactly-oracled Holt, cohort LTV
    # matrix, per-source unigram KL drift
    "forecast_holt_events",
    "cohort_ltv_matrix",
    "source_unigram_kl",
    # round-4 continuation (batch 4): sketch set-level eval, FD census,
    # supply-chain latency percentiles
    "lsh_precision_recall",
    "functional_dependency_audit",
    "order_cycle_time_stats",
    # round-4 continuation (batch 5): EWMA SPC chart, degree power law
    "events_ewma_control_chart",
    "doc_graph_degree_powerlaw",
    # round-4 continuation (batch 6): CUPED variance reduction + SRM
    "ab_test_cuped",
    "ab_srm_check",
    # round-4 continuation (batch 6): cluster-separation geometry audit
    "embedding_db_index",
    # round-4 continuation (batch 7): exact set-similarity scale path
    "prefix_filter_join",
    # round-4 continuation (batch 7): CDC op-log apply + GSP patterns
    "orders_cdc_apply",
    "session_sequence_pairs",
    # round-4 continuation (batch 8): payment-dup audit, HHI, RAKE
    "duplicate_payment_audit",
    "brand_concentration_hhi",
    "rake_keywords_top",
    # round-4 continuation (batch 9): 1-bit quantized ANN, skyline,
    # rank-sum + DiD experimentation, entropy quality, hashing-trick
    # features, Hill tail index, recursive-CTE BFS + Holt-Winters
    "binary_quant_topk",
    "parts_skyline_frontier",
    "ab_mannwhitney_test",
    "ab_diff_in_diff",
    "doc_entropy_scores",
    "feature_hash_vectors",
    "hill_tail_index",
    "doc_graph_bfs_reachability",
    "forecast_holtwinters_events",
    # round-4 continuation (batch 10): deterministic bootstrap CI +
    # Chao1/Good-Turing vocabulary saturation
    "revenue_bootstrap_ci",
    "chao1_vocab_estimate",
    # round-4 continuation (batch 10): contrastive-space health pair +
    # behavior-chain fixed point
    "embedding_alignment_uniformity",
    "event_markov_stationary",
    # round-4 continuation (batch 11): offline bandit replay via
    # engine-native recursion
    "ucb1_replay_policy",
    # round-4 continuation (batch 12): partition-quality gate +
    # multiset-similarity verification stage
    "doc_graph_modularity",
    "weighted_jaccard_pairs",
    # round-4 continuation (batch 13): multi-source recursive BFS
    # closeness/harmonic centrality sample
    "doc_graph_closeness_sampled",
    # round-4 continuation (batch 14): price/volume waterfall +
    # trailing-window exact distinct
    "revenue_price_volume_bridge",
    "events_trailing_distinct_types",
    # round-4 continuation (batch 15): peeking-corrected sequential
    # monitoring
    "ab_sequential_looks",
    # round-4 continuation (batch 16): classifier eval (exact AUC,
    # Brier decomposition), feature prep (LOO target encoding,
    # negative-sampling table), weighted recursive shortest paths
    "roc_auc_eval",
    "brier_decomposition",
    "target_encoding_loo",
    "negative_sampling_table",
    "doc_graph_shortest_paths",
    # round-4 continuation (batch 17): declarative PAV recalibration,
    # gains/lift table, IPS/SNIPS off-policy eval, quantile
    # normalization
    "isotonic_calibration_map",
    "cumulative_gain_curve",
    "ips_policy_value",
    "quantile_normalization_map",
    # round-4 continuation (batch 18): online drift detection, survey
    # sampling, aggregation-bias audit, clamped-ledger recursion
    "series_page_hinkley",
    "neyman_allocation_sample",
    "simpson_slope_audit",
    "parts_running_balance",
    # round-4 continuation (batch 19): rank correlation, FDR-corrected
    # sliced experiment readout, robust two-way decomposition
    "series_kendall_tau",
    "ab_bh_fdr_nations",
    "dow_type_median_polish",
    "dedup_capture_recapture",
    "markov_next_event_accuracy",
    "item_item_cf_topk",
    "ql_dirichlet_topk",
    "woe_information_value",
    "shapley_attribution",
    "kneser_ney_bigram_logprob",
    "nelson_aalen_hazard",
    "mh_pooled_odds_ratio",
    "james_stein_nation_means",
    "ipf_raking_weights",
    "greedy_coverage_selection",
    "als_rank2_factors",
    "series_analog_search",
    "source_length_emd",
    "bradley_terry_strengths",
    "hmm_forward_filter",
    "doc_length_gmm",
    "textrank_keywords",
    "consistent_hash_rebalance",
    "meta_analysis_nations",
    "hmm_smoothed_posterior",
    "nb_learning_curve",
    "ab_quantile_treatment_effects",
    "ab_power_mde_table",
    "hmm_baum_welch_step",
    "platt_scaling_fit",
    "series_dickey_fuller",
    "mahalanobis_outliers",
    "weak_label_model",
    "event_time_circular_stats",
    "hmm_viterbi_path",
    "dbscan_density_classes",
    "hedge_forecast_combination",
    "newsvendor_stock_levels",
    "price_elasticity_ols",
    "series_spearman_matrix",
    "evt_gpd_tail_fit",
    "littles_law_audit",
    "cf_holdout_lift",
    "blocking_quality_metrics",
    "anova_nation_values",
    "doc_graph_assortativity",
    "term_burstiness_topk",
    "eb_urgent_share_shrinkage",
    "interarrival_weibull_fit",
    "erlang_capacity_table",
    "label_sliced_wasserstein",
    "basket_part_triples_apriori",
    "huber_location_nations",
    "negbin_dispersion_fit",
    "evt_gumbel_block_maxima",
    "series_hurst_rs",
    "series_cronbach_alpha",
    "nb_average_precision",
    "classifier_agreement_kappa",
    "classifier_mcnemar_test",
    "friedman_method_ranks",
    "levene_variance_audit",
    "competing_risks_cif",
    "retrieval_rbo_bm25_vs_ql",
    "decision_stump_doclen",
    # round-5 capability un-gates: the v2 stateful streaming operator
    # (transformWithStateInPandas + RocksDB state store, ~4 s readStream
    # fixed cost) and the header-level image decode round-trip
    "events_tws_running_totals",
    "media_image_header_meta",
    # round 7: forecast-eval completions (MASE / DM / Ljung-Box / PACF /
    # Granger), phonetic blocking, MRR retrieval eval
    "forecast_mase_scores",
    "forecast_dm_test",
    "series_ljung_box",
    "series_pacf",
    "granger_lag1_purchases",
    "phonetic_token_groups",
    "retrieval_mrr_eval",
    "kruskal_wallis_values",
    # round 7 cont.: KPSS stationarity + the auto.arima differencing
    # decision (ndiffs/nsdiffs)
    "series_kpss_test",
    "series_ndiffs_nsdiffs",
    # round 8: residual diagnostics (JB normality, runs test), the
    # nonparametric change/shift pair (Pettitt, WoW Wilcoxon), partial
    # correlations, Theil's U2, Guerrero's Box-Cox lambda (the
    # BAGGEDETS R:205 decision replay), Welch's t, Hellinger drift,
    # and the temporal split-leakage audit
    "jarque_bera_normality",
    "residual_runs_test",
    "wilcoxon_signed_rank_wow",
    "pettitt_change_test",
    "partial_corr_controls",
    "theil_u2_backtest",
    "boxcox_guerrero_lambda",
    "ab_welch_ttest",
    "hellinger_source_drift",
    "split_leakage_audit",
]

# the two exclusion sets the coverage rule names (module docstring);
# every other registry query is benched
EXCLUDED_ITERATIVE_FITS = {
    "forecast_arima_events", "forecast_arima_force_seasonality_events",
    "forecast_nn_events", "forecast_baggedets_events",
    "forecast_prophet_events", "forecast_hybrid_events",
    "forecast_theta_events", "forecast_stl_events",
    "forecast_etsdamped_events", "forecast_hybrid_fanout_events",
    "forecast_baggedets_fanout_events", "forecast_method_backtest",
}
EXCLUDED_PAIR_SCANS = {"ngram_jaccard_pairs", "ngram_containment_pairs"}


def run_list(qs: dict) -> list[str]:
    """The benched set: HEADLINE in its historical order (cross-round
    per-query comparability), then every other registry query in
    registry order, minus the two pinned exclusion sets."""
    excluded = EXCLUDED_ITERATIVE_FITS | EXCLUDED_PAIR_SCANS
    # HEADLINE precedes the exclusion filter, so a name in both would
    # silently defeat its pin — fail loud instead
    clash = set(HEADLINE) & excluded
    if clash:
        raise ValueError(f"HEADLINE and exclusion sets overlap: {clash}")
    skip = set(HEADLINE) | excluded
    return list(HEADLINE) + [n for n in qs if n not in skip]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    import __spark_entry__ as entrymod
    from qrapids_forecast_r_script_spark.lineage import release_stale
    from qrapids_forecast_r_script_spark.session import get_spark

    spark = get_spark("qrapids-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # warm the JVM + parquet footers with a trivial action
    qs["part_filter_projection"](spark, sf_dir).count()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    skipped: dict[str, str] = {}
    for name in run_list(qs):
        fn = qs[name]
        samples = []
        try:
            for _ in range(reps):
                # hygiene boundary (module docstring): drop the previous
                # invocation's materialized blocks + SQL-cache entries
                # BEFORE the timer, so this rep computes from parquet
                # and pays nothing for prior queries' leftovers
                release_stale(spark)
                t0 = time.time()
                fn(spark, sf_dir).count()
                samples.append(time.time() - t0)
        except Exception as exc:  # noqa: BLE001 — one capability-gated
            # query (e.g. TWS on a host with no protobuf runtime) must
            # not lose every other query's timing; record it and go on
            skipped[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(f"bench: SKIP {name}: {skipped[name]}", file=sys.stderr)
            continue
        timings[name] = round(statistics.median(samples), 3)
    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        # timed-query count is UNCONDITIONAL so a capability-skip that
        # shrinks the suite is self-evident in the one-line metric
        # instead of hiding behind an optional key (ADVICE r5)
        "n_queries": len(timings),
        "queries": timings,
        "sf": float(sf),
        "reps": reps,
        "stat": "median",
    }
    if skipped:
        payload["skipped"] = skipped
    line = json.dumps(payload)
    # Persist the FULL payload (incl. the ~8 kB per-query map) locally:
    # the driver's BENCH_r{N}.json tail truncates to 2000 chars, which
    # destroyed cross-round per-query deltas (r3 verdict bench-hygiene
    # ask).  The live path is ALWAYS the gitignored rlocal file — a
    # driver/local bench run must never dirty a tracked artifact (r7
    # verdict, What's wrong #2); the per-round frozen recordings
    # (BENCH_LOCAL_r{N}.json) are committed snapshots of this file
    # taken manually at round close.
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH_LOCAL_rlocal.json")
    try:
        with open(out, "w") as fh:
            fh.write(line + "\n")
    except OSError:
        pass  # a read-only checkout must not fail the bench
    # stdout contract (r6 verdict item 2): the FINAL stdout line must be
    # a compact headline JSON that fits the driver's 2000-char tail so
    # its "parsed" field stops being null; the full per-query map lives
    # only in the BENCH_LOCAL_* artifact above.
    print(headline_line(payload))


def headline_line(payload: dict, char_budget: int = 1500) -> str:
    """The compact final-stdout JSON line (unit-tested contract,
    tests/test_bench_contract.py): everything in ``payload`` except
    the full per-query map — the driver schema wants a "queries" key,
    so keep the SLOWEST entries up to a hard ``char_budget`` instead
    of dropping the key entirely; "skipped" collapses to a count."""
    headline = {k: v for k, v in payload.items() if k != "queries"}
    if "skipped" in headline:  # keep the compact line compact
        headline["skipped"] = len(headline["skipped"])
    headline["queries"] = {}
    headline["queries_truncated_to_slowest"] = 0
    for qname, secs in sorted(payload.get("queries", {}).items(),
                              key=lambda kv: -kv[1]):
        headline["queries"][qname] = secs
        headline["queries_truncated_to_slowest"] = len(headline["queries"])
        if len(json.dumps(headline)) > char_budget:
            del headline["queries"][qname]
            headline["queries_truncated_to_slowest"] = len(headline["queries"])
            break
    return json.dumps(headline)


if __name__ == "__main__":
    main()
