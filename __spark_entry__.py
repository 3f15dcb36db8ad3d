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


# Round-6 driver window (the driver checks the first ~50 merged entries).
#
# WINDOW POLICY (r5 verdict items 1 + 5): while the never-driver-checked
# oracled backlog is ≥ 100, every slot is first-signal — the next 50
# backlog queries in merged-registry module order, pre-flighted with
# tools/strict_audit.py before the round closes.  Once the backlog drops
# under 100 (expected after this round: 142 → 92), subsequent rounds
# swap 2-3 slots per round to RE-verify previously-green high-risk
# queries (streaming, recursive-CTE, stateful) so old greens don't go
# stale as Spark/DuckDB versions move; the swapped-out backlog names
# stay pinned at positions 51+ so a wider driver cap still reaches them.
# Net-new registration stays FROZEN (delta ≤ +10/round) until the
# backlog is under 100.
#
# After r1-r5: 245 distinct queries have driver rows (231 ever
# hash-green, 0 failures); 142 registered+oracled queries have never had
# one.  This window is the first 50 of those 142 in merged-registry
# order — exactly the positions-51..100 hedge block of the r5 registry,
# promoted (head: media_image_header_meta, the one ≤+10 r5 registration,
# then ips_policy_value, which yielded its r5 slot to
# events_tws_running_totals).
FRONT_WINDOW = [
    # multimodal (r5's +1 registration, judge strict-audited 1/1)
    "media_image_header_meta",
    # product analytics / experimentation / inference tail
    "ips_policy_value",
    "ab_bh_fdr_nations",
    "markov_next_event_accuracy",
    "item_item_cf_topk",
    "shapley_attribution",
    "nelson_aalen_hazard",
    "mh_pooled_odds_ratio",
    "james_stein_nation_means",
    "series_analog_search",
    "bradley_terry_strengths",
    "hmm_forward_filter",
    "meta_analysis_nations",
    "hmm_smoothed_posterior",
    "ab_quantile_treatment_effects",
    "ab_power_mde_table",
    "hmm_baum_welch_step",
    "event_time_circular_stats",
    "hmm_viterbi_path",
    "price_elasticity_ols",
    "littles_law_audit",
    "cf_holdout_lift",
    "anova_nation_values",
    "eb_urgent_share_shrinkage",
    "interarrival_weibull_fit",
    "erlang_capacity_table",
    "huber_location_nations",
    "negbin_dispersion_fit",
    "levene_variance_audit",
    "competing_risks_cif",
    "ab_sprt_trace",
    # curation / training-prep
    "winsorized_doclen_stats",
    "shard_packing_efficiency",
    "epoch_shuffle_order",
    "mixture_waterfill_budget",
    "curriculum_order",
    "doremi_domain_weights",
    "quantile_normalization_map",
    "neyman_allocation_sample",
    "ipf_raking_weights",
    "greedy_coverage_selection",
    # corpus statistics / language modeling
    "corpus_zipf_fit",
    "source_unigram_kl",
    "doc_entropy_scores",
    "chao1_vocab_estimate",
    "kneser_ney_bigram_logprob",
    "doc_length_gmm",
    "term_burstiness_topk",
    # forecast eval head
    "series_acf",
    "forecast_croston_events",
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
