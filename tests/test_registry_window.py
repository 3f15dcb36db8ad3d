"""Driver-window allocation guard.

The per-round driver hash-checks only the FIRST ~50 entries of
``__spark_entry__.queries()`` — the ordering is deliberate signal
allocation (north-star layers + the distinctive forecast closed forms
in-window, proven relational bulk and intermediate-representation
queries behind it).  A registry edit that silently reorders or
un-oracles the window would cost a round of correctness signal; this
test pins the contract.
"""

import __spark_entry__ as E

WINDOW = 50

# every layer the round-1 verdict asked to get under the driver's window
MUST_BE_IN_WINDOW = [
    "minhash_lsh_pairs", "dedup_clusters", "bloom_ngram_containment",
    "cosine_topk_bruteforce", "ivf_topk", "ivf_kmeans_topk", "pq_topk",
    "text_stats", "doc_chunks", "tfidf_top_terms",
    "media_feature_extract", "media_frame_sample",
    "corpus_clean_pipeline",
    "events_stream_tumbling_1h", "events_session_windows",
    "salted_skew_join", "bucketed_orders_join", "orders_upsert_scd1",
    "compact_small_files",
    "orders_csv_roundtrip",
    "forecast_snaive_user_series", "forecast_snaive_events",
    "forecast_drift_events",
]


def test_window_is_fully_oracled_except_stateful():
    qs, oracles = E.queries(), E.oracle_sql()
    window = list(qs)[:WINDOW]
    rows_only = [n for n in window if n not in oracles]
    # the sequential-Welford stateful op is rows-only BY DESIGN; nothing
    # else may burn a window slot without a hash check
    assert rows_only == ["events_stateful_anomalies"], rows_only


def test_window_covers_every_north_star_layer():
    window = set(list(E.queries())[:WINDOW])
    missing = [n for n in MUST_BE_IN_WINDOW if n not in window]
    assert not missing, missing


def test_no_orphan_oracles():
    qs, oracles = E.queries(), E.oracle_sql()
    orphans = [n for n in oracles if n not in qs]
    assert not orphans, orphans
