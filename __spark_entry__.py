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


# Round-5 driver window (the driver checks the first ~50 merged entries).
#
# Verdict r4 item 1: spend the ENTIRE window on never-driver-checked
# queries that carry an exact DuckDB oracle — 50/50 green-capable, zero
# rows-only slots.  After r1-r4, 195 distinct queries have driver rows
# (181 ever hash-green, 0 failures) and 191 registered+oracled queries
# have never had one.  This window takes the first 50 of those 191 in
# merged-registry order (deterministic, resumable next round: r6 takes
# the next 50).  The 10 model fits had their one rows-only row in r4 and
# are rotated OUT per the r3/r4 verdicts.  Verdict r4 item 2: net-new
# query registration is FROZEN this round (delta ≤ +10, §2B gaps only)
# until the never-checked backlog is under ~100.
#
# The round-4 window (knn_label_accuracy ... forecast_method_backtest)
# and its 141-query deferral commentary are retired; the remaining
# backlog after this window is the 141 queries listed by
# `python3 -c "..."` over CORRECTNESS_r0*.json — regenerable, not
# re-enumerated here.
FRONT_WINDOW = [
    # r4 verdict item 4 delivered: transformWithStateInPandas UN-GATED —
    # ensure_protobuf() wires the host's vendored pure-python protobuf
    # runtime into driver + workers at runtime, and the query scopes the
    # RocksDB state-store provider it needs.  In-window for its first
    # (and exactly-oracled) driver row.
    "events_tws_running_totals",
    # dedup / similarity / embeddings tail (never driver-checked)
    "paragraph_dedup_rewrite",
    "doc_novelty_scores",
    "weighted_jaccard_pairs",
    "dedup_capture_recapture",
    "jl_projection_distortion",
    "mmr_diversified_topk",
    "reciprocal_knn_pairs",
    "embedding_drift_centroids",
    "ivf_nprobe_sweep",
    "embedding_norm_audit",
    "binary_quant_topk",
    "embedding_alignment_uniformity",
    "chunk_hash_embed_topk",
    "proximity_search",
    # lexical retrieval / text analysis
    "rm3_query_expansion",
    "readability_scores",
    "vocab_coverage_curve",
    "rake_keywords_top",
    "ql_dirichlet_topk",
    "textrank_keywords",
    "retrieval_rbo_bm25_vs_ql",
    # multimodal plumbing
    "media_dhash_neardup",
    "media_energy_segments",
    # embeddings / pipeline patterns (SCD2, CDC, incremental views)
    "embedding_db_index",
    "orders_scd2_asof",
    "incremental_agg_merge",
    "incremental_join_view",
    "user_erasure_audit",
    "orders_cdc_apply",
    "consistent_hash_rebalance",
    # product analytics / experimentation
    "event_transition_matrix",
    "user_feature_table",
    "session_transcripts",
    "purchase_attribution_decay",
    "logrank_cohort_test",
    "cart_abandonment_daily",
    "session_pattern_match",
    "funnel_latency_percentiles",
    "customer_revenue_gini",
    "cohort_ltv_matrix",
    "ab_test_cuped",
    "ab_srm_check",
    "session_sequence_pairs",
    "ab_mannwhitney_test",
    "ab_diff_in_diff",
    "revenue_bootstrap_ci",
    "event_markov_stationary",
    "ucb1_replay_policy",
    "ab_sequential_looks",
    # (ips_policy_value was slot 50; it yields to events_tws_running_totals
    # and leads the r6 backlog instead)
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
