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


# Round-8 driver window (the driver checks the first ~50 merged entries).
#
# WINDOW POLICY (drain era, r5-r9): while a never-driver-checked oracled
# backlog remains, the window is first-signal — the next backlog queries
# in merged-registry module order, pre-flighted with
# tools/strict_audit.py before the round closes — plus 3 RE-verify
# slots for previously-green high-risk queries (streaming,
# recursive-CTE, stateful) so old greens don't go stale as Spark/DuckDB
# versions move; the displaced backlog names stay pinned at positions
# 51+ so a wider driver cap still reaches them.  Net-new registration
# stays FROZEN (delta ≤ +10/round) until the backlog is 0.
#
# FROM r8 THE WINDOW IS TOOL-DERIVED: this list is the verbatim output
# of `python tools/rotation_window.py` at the r8 artifact state
# (CORRECTNESS_r01..r07 committed) — 47 first-signal slots (the head of
# the 54-query never-passed oracled backlog: 9 of the 10 r7-new
# registrations lead — the 10th, phonetic_token_groups, sits at its
# module-order position 42 — then the module-order tail) + 3 re-verify
# slots
# picked by the tool's priority key (standing-failures first, then
# EVER-failed drift markers, then oldest-green-first):
#   events_sliding_1h_30m   — the registry's only historic driver
#                             failure (r2 schema-red, r3 re-green) —
#                             ever-failed priority (r7 verdict item 6)
#   events_stream_tumbling_1h, user_sessions — the two oldest greens
#                             (r2) in merged order
# The ~7 backlog spill (events_session_windows … module tail) drains in
# r9's first slots; test_registry_window.py pins this window against a
# FROZEN artifact copy (r01-r07) so the driver's own r08 deposit cannot
# redden the suite (r7 verdict, What's wrong #1).
#
# ROTATION SCHEDULE (r9+, once the backlog is drained): the window
# becomes a rotating re-verification of the full oracled registry in
# fixed priority tiers, derived round-by-round by
# tools/rotation_window.py.  Tier 1 (every round, ~10 slots): the
# drift-exposed surfaces — streaming (stream-stream joins, session
# windows, dedup-within-watermark), stateful (applyInPandasWithState,
# transformWithStateInPandas), and the recursive-CTE family (HMM/UCB1/
# Markov recursions) — these touch Spark internals that move between
# versions; the young HMM greens (r6) enter here as older greens age
# out.  Tier 2 (~40 slots/round): the remaining registry,
# oldest-green-first, so every oracled query is re-checked at least
# once every ~8 rounds.  Failure semantics (ADVICE r7): only PASSING
# rows count as checked; a failed-latest query re-enters the backlog at
# its very front, and ever-failed queries outrank same-age greens.
FRONT_WINDOW = [
    # r7-new registrations (first-signal; strict-audited at
    # registration AND re-audited by the r7 judge, 10/10)
    "retrieval_mrr_eval",
    "kruskal_wallis_values",
    "forecast_mase_scores",
    "forecast_dm_test",
    "series_ljung_box",
    "series_pacf",
    "granger_lag1_purchases",
    "series_kpss_test",
    "series_ndiffs_nsdiffs",
    # product-analytics tail displaced from the r7 window (first-signal)
    "duplicate_payment_audit",
    "hill_tail_index",
    "simpson_slope_audit",
    # distribution-distance / robust-stats family (first-signal)
    "source_length_emd",
    "mahalanobis_outliers",
    "evt_gpd_tail_fit",
    "evt_gumbel_block_maxima",
    # text / classifier-eval / calibration family (first-signal)
    "char_trigram_lang_classifier",
    "nb_calibration_curve",
    "feature_hash_vectors",
    "roc_auc_eval",
    "brier_decomposition",
    "target_encoding_loo",
    "negative_sampling_table",
    "isotonic_calibration_map",
    "cumulative_gain_curve",
    "woe_information_value",
    "als_rank2_factors",
    "nb_learning_curve",
    "platt_scaling_fit",
    "weak_label_model",
    "nb_average_precision",
    "classifier_agreement_kappa",
    "classifier_mcnemar_test",
    "decision_stump_doclen",
    # privacy / association / spectral / linkage (first-signal)
    "l_diversity_audit",
    "t_closeness_audit",
    "basket_part_triples_apriori",
    "series_wavelet_energy",
    "dbscan_density_classes",
    "label_sliced_wasserstein",
    "blocking_quality_metrics",
    "phonetic_token_groups",
    # product-analytics second tail (first-signal)
    "order_cycle_time_stats",
    "brand_concentration_hhi",
    "parts_skyline_frontier",
    "revenue_price_volume_bridge",
    "parts_running_balance",
    # RE-verify slots (tool-derived: ever-failed first, then oldest
    # green; see window policy above)
    "events_sliding_1h_30m",
    "events_stream_tumbling_1h",
    "user_sessions",
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
    # never-driver-PASSED oracled backlog is pinned immediately behind
    # the window, in module order, so any extra checked slot lands on a
    # first-signal query instead of re-verifying an already-green one.
    # (Derived from the committed CORRECTNESS files, so it is stable
    # within a round and self-updates when a round lands new rows.)
    # The checked-set semantics are the rotation tool's, via its OWN
    # driver_history (one implementation, ADVICE r7 medium #1 + r8
    # review): a query counts as checked only when it has a PASSING
    # row AND its latest row is not a failure — a standing regression
    # re-enters the backlog here exactly as it does in the tool.
    from tools.rotation_window import driver_history
    here = os.path.dirname(os.path.abspath(__file__))
    hist = driver_history(repo=here)
    checked: set[str] = {n for n, h in hist.items()
                         if h["last_pass"] > 0 and not h["failed_latest"]}
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
