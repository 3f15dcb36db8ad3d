"""Driver-window allocation guard.

The per-round driver hash-checks only the FIRST ~50 entries of
``__spark_entry__.queries()`` — the ordering is deliberate signal
allocation.  Round 4 rotates the window onto the never-driver-checked
backlog (r3 verdict item 1): the three queries whose results changed
this round, 38 oracled queries across the retrieval / forecast-eval /
graph / linkage / spectral / training-prep / assoc-privacy /
data-quality layers, the 8 model fits that never had a rows-only row,
and the new all-method holdout backtest.  A registry edit that silently
reorders or un-oracles the window would cost a round of correctness
signal; this test pins the contract.
"""

import __spark_entry__ as E

WINDOW = 50

# the round-3 verdict's item-1 rotation list: every query that must get
# its first driver row this round, plus the three changed ones
MUST_BE_IN_WINDOW = [
    # results changed in round 4
    "knn_label_accuracy", "dp_noisy_counts", "conformal_snaive_intervals",
    # dedup/IR tail
    "ngram_containment_pairs", "contrastive_pairs", "minhash_calibration",
    "incremental_dedup_batch",
    # retrieval layer
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
    # Python execution family
    "doc_chunks_udtf", "events_orders_asof_cogroup",
    # association / privacy / spectral / linkage
    "basket_part_pairs_lift", "k_anonymity_audit",
    "embedding_pca_projection", "series_dominant_period",
    "customer_entity_resolution",
    # never-checked model fits + the all-method backtest (rows-only)
    "forecast_theta_events", "forecast_etsdamped_events",
    "forecast_baggedets_events", "forecast_stl_events",
    "forecast_nn_events", "forecast_prophet_events",
    "forecast_arima_force_seasonality_events", "forecast_ets_user_series",
    "forecast_method_backtest",
]

# iterative model fits: not SQL-expressible, rows-only BY DESIGN; the
# driver records the weaker rows-only check for these and the judge sees
# which.  Nothing else may burn a window slot without a hash check.
ALLOWED_ROWS_ONLY = {
    "forecast_theta_events", "forecast_etsdamped_events",
    "forecast_baggedets_events", "forecast_stl_events",
    "forecast_nn_events", "forecast_prophet_events",
    "forecast_arima_force_seasonality_events", "forecast_ets_user_series",
    "forecast_method_backtest",
}


def test_front_window_matches_declared_allocation():
    # the first len(FRONT_WINDOW) entries are exactly the declared list,
    # in order — capability-invariant (no conditional registration may
    # shift a slot, ADVICE r2)
    qs = list(E.queries())
    assert qs[:len(E.FRONT_WINDOW)] == E.FRONT_WINDOW


def test_window_is_exactly_fifty():
    assert len(E.FRONT_WINDOW) == WINDOW
    assert len(set(E.FRONT_WINDOW)) == WINDOW  # no duplicate slots


def test_window_is_fully_oracled_except_model_fits():
    qs, oracles = E.queries(), E.oracle_sql()
    window = list(qs)[:WINDOW]
    rows_only = {n for n in window if n not in oracles}
    assert rows_only <= ALLOWED_ROWS_ONLY, rows_only - ALLOWED_ROWS_ONLY


def test_window_covers_every_rotation_target():
    window = set(list(E.queries())[:WINDOW])
    missing = [n for n in MUST_BE_IN_WINDOW if n not in window]
    assert not missing, missing


def test_no_window_slot_wasted_on_already_green_queries():
    """Every non-changed window slot goes to a query that has never had
    a driver row (rounds 1-3 checked 145 distinct queries; re-checking
    any of them would burn first-signal capacity)."""
    import json
    import os
    checked = set()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for r in ("01", "02", "03"):
        path = os.path.join(root, f"CORRECTNESS_r{r}.json")
        if os.path.exists(path):
            with open(path) as fh:
                checked |= set(json.load(fh))
    changed_this_round = {"knn_label_accuracy", "dp_noisy_counts",
                          "conformal_snaive_intervals"}
    rechecks = [n for n in E.FRONT_WINDOW
                if n in checked and n not in changed_this_round]
    assert not rechecks, rechecks
