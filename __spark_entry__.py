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


# Round-9 driver window (the driver checks the first ~50 merged entries).
#
# WINDOW POLICY (drain era, r5-r9): while a never-driver-checked oracled
# backlog remains, the window is first-signal — the next backlog queries
# in merged-registry order, pre-flighted with tools/strict_audit.py
# before the round closes — plus RE-verify slots for previously-green
# high-risk queries so old greens don't go stale as Spark/DuckDB
# versions move; the displaced backlog names stay pinned at positions
# 51+ so a wider driver cap still reaches them.  Net-new registration
# stays FROZEN (delta ≤ +10/round) until the backlog is 0.
#
# THE WINDOW IS TOOL-DERIVED (since r8): this list is the verbatim
# output of `python tools/rotation_window.py` at the r9 artifact state
# (CORRECTNESS_r01..r08 committed, the 10 r9 registrations in the
# registry) — the 27-query never-passed oracled backlog leads (the 10
# r8-new registrations in merged order, ab_welch_ttest …
# split_leakage_audit, then the 7-query r8 window spill,
# dow_type_median_polish … events_trailing_distinct_types, then the 10
# r9 registrations, ab_cliffs_delta … orders_exact_price_quantiles),
# followed by 3 tier-1 re-verify slots (events_sliding_1h_30m — the
# registry's single historic tier-1 failure, ever-failed priority —
# then the two oldest tier-1 greens) and, because the backlog no
# longer fills the cap, 20 TRANSITION slots backfilled with the
# rotation-era ordering: standing-failures first (none), then
# ever-failed drift markers (q12_shipmode_priority,
# events_zscore_outliers — the two r1 hash-reds), then
# oldest-green-first over the whole oracled registry (the r1-r2
# classics).  This is the LAST drain-era round: a green r9 artifact
# empties the backlog and r10's derivation flips to era="rotation"
# (tier-1 drift-exposed surfaces ~10 slots + tier-2 oldest-green wrap;
# the r9-close simulation in test_registry_window.py pins that
# handoff).  test_registry_window.py replays THIS window against a
# FROZEN artifact copy (r01-r08) so the driver's own r09 deposit cannot
# redden the suite (the r7 What's-wrong #1 pattern).
#
# Failure semantics (ADVICE r7): only PASSING rows count as checked; a
# failed-latest query re-enters the backlog at its very front, and
# ever-failed queries outrank same-age greens in every re-verify pool.
FRONT_WINDOW = [
    # --- first-signal: the 10 r8-new registrations (strict-audited at
    # registration AND pre-certified by the r8 judge, 17/17)
    "ab_welch_ttest",
    "jarque_bera_normality",
    "residual_runs_test",
    "wilcoxon_signed_rank_wow",
    "pettitt_change_test",
    "partial_corr_controls",
    "theil_u2_backtest",
    "boxcox_guerrero_lambda",
    "hellinger_source_drift",
    "split_leakage_audit",
    # --- first-signal: the 7-query r8 window spill (module-order tail
    # of the original backlog)
    "dow_type_median_polish",
    "newsvendor_stock_levels",
    "orders_yoy_growth",
    "sql_api_revenue_report",
    "rfm_quartile_segments",
    "parts_abc_pareto",
    "events_trailing_distinct_types",
    # --- first-signal: the 10 r9 registrations (the full <= +10 freeze
    # budget, each strict-audited at registration; they joined the
    # never-checked backlog when registered, so per the r8 precedent the
    # window was re-derived with them in merged-registry order)
    "ab_cliffs_delta",
    "ab_permutation_test",
    "customer_lorenz_curve",
    "corpus_heaps_law",
    "vocab_chao1_richness",
    "series_mann_kendall",
    "series_turning_points",
    "events_dkw_ecdf_band",
    "series_spectral_entropy",
    "orders_exact_price_quantiles",
    # --- tier-1 re-verify (ever-failed first, then oldest tier-1 green)
    "events_sliding_1h_30m",
    "events_session_windows",
    "events_stream_dedup_hourly",
    # --- transition backfill (rotation-era ordering: ever-failed drift
    # markers first, then oldest-green-first over the oracled registry)
    "q12_shipmode_priority",
    "events_zscore_outliers",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "top_customers_per_segment",
    "orders_rollup",
    "orders_cube",
    "customers_with_orders",
    "customers_without_orders",
    "nations_customers_minus_suppliers",
    "nations_customers_and_suppliers",
    "part_filter_projection",
    "scrubbed_customer_keys",
    "orders_by_month",
    "events_json_props",
    "events_daily_rolling",
    "events_asof_last_error",
    "distinct_users_per_type",
    "series_positional_index",
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
