"""Driver-window allocation guard.

The per-round driver hash-checks only the FIRST ~50 entries of
``__spark_entry__.queries()`` — the ordering is deliberate signal
allocation.  Round 3 rotates the window onto the 43 queries that never
had a driver row (curation, text-quality, the cache lifecycle, the
deferred IR queries, the behind-window relational additions, and the 11
rows-only model fits), plus the two whose results/oracles changed this
round.  A registry edit that silently reorders or un-oracles the window
would cost a round of correctness signal; this test pins the contract.
"""

import __spark_entry__ as E

WINDOW = 50

# the round-2 verdict's item-1 list: every query that must get its first
# driver row this round, plus the repaired/changed pair
MUST_BE_IN_WINDOW = [
    # repaired / changed
    "events_sliding_1h_30m", "pq_topk",
    # curation layer
    "stratified_sample_docs", "eval_contamination", "source_quota_cap",
    "token_shard_packing", "semantic_dedup_keep", "dataset_split_assignment",
    "fixed_k_sample_per_lang", "temperature_mixture_sample",
    # text-quality layer
    "doc_repetition_stats", "corpus_bigram_topk", "doc_bigram_logprob",
    "dsir_importance", "bigram_pmi_top",
    # forecast closed forms + cache lifecycle
    "forecast_mean_events", "forecast_naive_events", "backtest_closed_forms",
    "forecast_cache_roundtrip", "forecast_snaive_monthly_orders",
    # sources / IR / scale deferrals
    "python_datasource_scan", "simhash_docs", "minhash_signatures",
    "salted_skew_agg", "repeated_ngram_spans", "events_stream_upsert_state",
    # behind-window relational additions
    "nations_customers_or_suppliers", "building_vs_big_orders_full_outer",
    "events_user_30min_rolling", "deterministic_sample_orders",
    "events_value_histogram", "events_range_join_binned",
    "events_variant_props", "customer_top_orders_lateral",
    # custom stateful (oracled since r3)
    "events_stateful_anomalies",
    # representative model fits — rows-only by design (the other 8 fits
    # share the same execution chain; see __spark_entry__.FRONT_WINDOW)
    "forecast_ets_events", "forecast_arima_events",
    "forecast_hybrid_events",
    # round-3 new operators (all exactly oracled)
    "orders_upsert_scd2", "pii_scrub_docs", "maxsim_multivector_topk",
    "dedup_keep_best", "decontaminate_spans", "events_partitioned_pruning",
    "python_datasource_sink_roundtrip", "events_stream_trending_topk",
    "events_stream_trending_upsert", "cms_heavy_hitters",
    "doc_graph_pagerank", "weighted_sample_docs",
]

# iterative model fits: not SQL-expressible, rows-only BY DESIGN; the
# driver records the weaker rows-only check for these and the judge sees
# which.  Nothing else may burn a window slot without a hash check.
ALLOWED_ROWS_ONLY = {
    "forecast_ets_events", "forecast_arima_events",
    "forecast_hybrid_events",
}


def test_front_window_matches_declared_allocation():
    # the first len(FRONT_WINDOW) entries are exactly the declared list,
    # in order — capability-invariant (no conditional registration may
    # shift a slot, ADVICE r2)
    qs = list(E.queries())
    assert qs[:len(E.FRONT_WINDOW)] == E.FRONT_WINDOW


def test_window_is_fully_oracled_except_model_fits():
    qs, oracles = E.queries(), E.oracle_sql()
    window = list(qs)[:WINDOW]
    rows_only = {n for n in window if n not in oracles}
    assert rows_only <= ALLOWED_ROWS_ONLY, rows_only - ALLOWED_ROWS_ONLY


def test_window_covers_every_rotation_target():
    window = set(list(E.queries())[:WINDOW])
    missing = [n for n in MUST_BE_IN_WINDOW if n not in window]
    assert not missing, missing


def test_no_orphan_oracles():
    qs, oracles = E.queries(), E.oracle_sql()
    orphans = [n for n in oracles if n not in qs]
    assert not orphans, orphans
