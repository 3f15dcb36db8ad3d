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


# Round-3 driver window (the driver checks the first ~50 merged entries).
# Signal allocation: rounds 1+2 proved 98 distinct queries (94 green);
# round 3 front-loads the 43 queries that have NEVER had a driver row —
# the whole curation + text-quality layers, the cache-lifecycle query
# (the reference's core orchestration), the deferred IR queries, the
# behind-window relational additions — plus the two queries whose
# results/oracles changed this round (the repaired sliding-window oracle
# and the PQ floor-packing + trained codebook).
FRONT_WINDOW = [
    # repaired / changed this round — convert the r2 red row first
    "events_sliding_1h_30m",       # oracle TIMESTAMPTZ → CAST AS TIMESTAMP
    "pq_topk",                     # argmin round→floor + trained codebook
    # curation layer (round-2 additions, never driver-checked)
    "stratified_sample_docs", "eval_contamination", "source_quota_cap",
    "token_shard_packing", "semantic_dedup_keep", "dataset_split_assignment",
    "fixed_k_sample_per_lang", "temperature_mixture_sample",
    # text-quality layer (round-2 additions, never driver-checked)
    "doc_repetition_stats", "corpus_bigram_topk", "doc_bigram_logprob",
    "dsir_importance", "bigram_pmi_top",
    # forecast closed forms + the wrapper/cache lifecycle (R:42-82,104-124)
    "forecast_mean_events", "forecast_naive_events", "backtest_closed_forms",
    "forecast_cache_roundtrip", "forecast_snaive_monthly_orders",
    # sources / dedup IR / scale-pattern deferrals
    "python_datasource_scan", "simhash_docs", "minhash_signatures",
    "salted_skew_agg", "repeated_ngram_spans", "events_stream_upsert_state",
    # behind-window relational additions
    "nations_customers_or_suppliers", "building_vs_big_orders_full_outer",
    "events_user_30min_rolling", "deterministic_sample_orders",
    "events_value_histogram", "events_range_join_binned",
    "events_variant_props", "customer_top_orders_lateral",
    # custom-stateful anomaly counter — carries a full prior-prefix
    # window-function oracle since round 3 (previously rows-only)
    "events_stateful_anomalies",
    # three REPRESENTATIVE iterative model fits (rows-only by design:
    # the fits are not SQL-expressible) — first-ever driver rows-only
    # signal for the grouped-applyInPandas model path.  The other 8
    # fits share this exact execution chain (scan → series → fit →
    # bands) and differ only in the per-series numpy model, which the
    # model-level goldens cover; giving all 11 in-window slots to
    # rows-only entries would burn hash-check capacity the new round-3
    # oracled operators can use.
    "forecast_ets_events", "forecast_arima_events",
    "forecast_hybrid_events",
    # round-3 NEW operators (all exactly oracled) — first driver signal
    "orders_upsert_scd2", "pii_scrub_docs", "maxsim_multivector_topk",
    "dedup_keep_best", "decontaminate_spans", "events_partitioned_pruning",
    "python_datasource_sink_roundtrip", "events_stream_trending_topk",
    "events_stream_trending_upsert", "cms_heavy_hitters",
    "doc_graph_pagerank", "weighted_sample_docs",
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
