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


# Round-7 driver window (the driver checks the first ~50 merged entries).
#
# WINDOW POLICY (drain era, r5-r8): while a never-driver-checked oracled
# backlog remains, the window is first-signal — the next backlog queries
# in merged-registry module order, pre-flighted with
# tools/strict_audit.py before the round closes.  The backlog dropped
# under 100 after r6 (142 → 92), so starting THIS round 2-3 slots per
# round are swapped to RE-verify previously-green high-risk queries
# (streaming, recursive-CTE, stateful) so old greens don't go stale as
# Spark/DuckDB versions move; the swapped-out backlog names stay pinned
# at positions 51+ so a wider driver cap still reaches them.  Net-new
# registration stays FROZEN (delta ≤ +10/round) until the backlog is 0.
#
# r7 second half registered +10 new oracled queries — the freeze cap
# exactly (forecast_mase_scores, forecast_dm_test, series_ljung_box,
# series_pacf, granger_lag1_purchases, phonetic_token_groups,
# retrieval_mrr_eval, kruskal_wallis_values, series_kpss_test,
# series_ndiffs_nsdiffs — each strict-audited on registration), so the
# never-checked backlog entering r8 is 54: the r8 window takes the first
# ~47 in module order + 3 re-verify slots, and the ~7 spill drains in
# r9's first slots before the rotation below takes over.  From r8 the
# window itself comes out of tools/rotation_window.py (the derivation is
# pinned against this round's window in test_registry_window.py).
#
# ROTATION SCHEDULE (r9+, once the backlog is drained — expected start of
# r9): the window becomes a rotating re-verification of the full oracled
# registry in fixed priority tiers.  Tier 1 (every round, ~10 slots):
# the drift-exposed surfaces — streaming (stream-stream joins, session
# windows, dedup-within-watermark), stateful (applyInPandasWithState,
# transformWithStateInPandas), and the recursive-CTE family (HMM/UCB1/
# Markov recursions) — these touch Spark internals that move between
# versions.  Tier 2 (~40 slots/round): the remaining registry in merged
# order, wrapping modulo its size, so every oracled query is re-checked
# at least once every ~8 rounds.  The rotation cursor is derived from
# the committed CORRECTNESS_r*.json files (oldest-green-first), so it
# self-advances without manual window edits.
#
# After r1-r6: 295 distinct queries have driver rows (281 latest-green,
# 0 standing failures); 92 registered+oracled queries have never had
# one.  This window = the first 47 of those 92 in merged-registry order
# + `events_stream_stream_left_join` promoted from backlog position 79
# (the most drift-exposed never-checked query: stream-stream outer join
# with watermark eviction) + 2 RE-verify slots starting the rotation
# (`events_tws_running_totals`: r5-green, transformWithStateInPandas via
# vendored protobuf; `ucb1_replay_policy`: r5-green, the deepest
# recursive-CTE query).  Displaced backlog names
# (duplicate_payment_audit, hill_tail_index, simpson_slope_audit) stay
# pinned at 51+.
FRONT_WINDOW = [
    # forecast eval / series-statistics tail (first-signal)
    "hierarchical_forecast_coherence",
    "conformal_coverage_backtest",
    "series_leadlag_xcorr",
    "interval_score_backtest",
    "forecast_ses_events",
    "series_theilsen_trend",
    "series_decomposition_strength",
    "forecast_holt_events",
    "events_ewma_control_chart",
    "forecast_holtwinters_events",
    "series_page_hinkley",
    "series_kendall_tau",
    "series_dickey_fuller",
    "hedge_forecast_combination",
    "series_spearman_matrix",
    "series_hurst_rs",
    "series_cronbach_alpha",
    "friedman_method_ranks",
    # dedup tail (first-signal)
    "source_dedup_rates",
    "dedup_cluster_sizes",
    "lsh_precision_recall",
    "prefix_filter_join",
    # document-graph family (first-signal)
    "doc_graph_link_prediction",
    "doc_graph_kcore",
    "doc_graph_eigencentrality",
    "doc_graph_degree_powerlaw",
    "doc_graph_bfs_reachability",
    "doc_graph_modularity",
    "doc_graph_closeness_sampled",
    "doc_graph_shortest_paths",
    "doc_graph_assortativity",
    # tokenization (first-signal)
    "bpe_encode_docs",
    "tokenizer_fertility_by_lang",
    # data-quality / profiling (first-signal)
    "join_key_skew_profile",
    "corpus_diversity_stats",
    "events_numeric_profile",
    "events_contract_violations",
    "events_ks_drift",
    "benford_first_digit_audit",
    "chi_square_independence",
    "missing_value_imputation",
    "events_mad_outliers",
    "source_length_qq",
    "doc_embedding_coverage",
    "event_interarrival_stats",
    "column_stats_profile",
    "functional_dependency_audit",
    # promoted from backlog position 79 (first-signal, drift-exposed)
    "events_stream_stream_left_join",
    # RE-verify rotation, round 1 of the post-drain policy (r5-green)
    "events_tws_running_totals",
    "ucb1_replay_policy",
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
    # Positions 51+ hedge a wider-than-50 driver cap: the REST of the
    # never-driver-checked oracled backlog is pinned immediately behind
    # the window, in module order, so any extra checked slot lands on a
    # first-signal query instead of re-verifying an already-green one.
    # (Derived from the committed CORRECTNESS files, so it is stable
    # within a round and self-updates when a round lands new rows.)
    import glob
    import json
    here = os.path.dirname(os.path.abspath(__file__))
    checked: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                checked |= set(json.load(fh))
        except (OSError, ValueError):
            pass  # a malformed artifact must not break the registry
    backlog_names = [n for n in all_q
                     if n not in checked and n in all_o
                     and n not in FRONT_WINDOW]
    backlog = ({n: all_q[n] for n in backlog_names},
               {n: all_o[n] for n in backlog_names})
    return [front, backlog, *blocks]


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
