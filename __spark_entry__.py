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


def _registries():
    """All per-module (QUERIES, ORACLES) registries, in driver-check order.

    The driver's correctness run walks the merged dict in insertion order
    and caps at ~50 queries per round, so ordering is signal allocation:
    round 1 proved the relational/TPC-H layer (46/50 green), so round 2
    front-loads the LLM-pipeline, streaming, and forecast layers — plus the
    two queries whose oracles got the HUGEINT→BIGINT cast fix — and moves
    the already-proven relational bulk to the back.

    Imports are deliberately NOT wrapped in try/except: every module ships
    in-repo, and a broken import must fail loud rather than silently drop
    a module's queries from the correctness run.
    """
    from qrapids_forecast_r_script_spark.operators import (
        curation,
        dedup,
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
    )
    from qrapids_forecast_r_script_spark.sources import formats, pyds
    from qrapids_forecast_r_script_spark.forecast import queries as fq
    from qrapids_forecast_r_script_spark.streaming import queries as sq
    from qrapids_forecast_r_script_spark.streaming import stateful

    # Re-verify the two round-1 hash-fails (oracle BIGINT cast fix) first.
    # dict insertion order keeps these at the front; the later full-module
    # updates re-assign the same key/value without moving position.
    fixed = (
        {
            "q12_shipmode_priority": relational_ext.QUERIES["q12_shipmode_priority"],
            "events_zscore_outliers": relational_more.QUERIES["events_zscore_outliers"],
        },
        {
            "q12_shipmode_priority": relational_ext.ORACLES["q12_shipmode_priority"],
            "events_zscore_outliers": relational_more.ORACLES["events_zscore_outliers"],
        },
    )
    # Deferred past the ~50-query window: intermediate-representation
    # queries whose full execution chain is already proven in-window by
    # their pair queries (minhash_lsh_pairs / simhash_neardup_pairs run
    # the same signature chains end-to-end) — the freed slots keep the
    # SNAIVE/DRIFT closed forms under driver check.
    # salted_skew_agg joins them: a result-preserving rewrite whose plan
    # shape (not result) is the point — the salted JOIN already holds the
    # in-window skew slot.
    defer = {"minhash_signatures", "simhash_docs", "salted_skew_agg"}
    dedup_front = {k: v for k, v in dedup.QUERIES.items() if k not in defer}
    dedup_back = {k: dedup.QUERIES[k] for k in defer
                  if k in dedup.QUERIES}
    sp_front = {k: v for k, v in scale_patterns.QUERIES.items()
                if k not in defer}
    sp_back = {k: scale_patterns.QUERIES[k] for k in defer
               if k in scale_patterns.QUERIES}
    return [
        fixed,
        (dedup_front, dedup.ORACLES),
        (similarity.QUERIES, similarity.ORACLES),
        (text.QUERIES, text.ORACLES),
        (multimodal.QUERIES, multimodal.ORACLES),
        (pipeline.QUERIES, pipeline.ORACLES),
        (sq.QUERIES, sq.ORACLES),
        (stateful.QUERIES, stateful.ORACLES),
        (sp_front, scale_patterns.ORACLES),
        (product_analytics.QUERIES, product_analytics.ORACLES),
        (formats.QUERIES, formats.ORACLES),
        # the five closed-form-oracled forecast queries first (verdict r1
        # item 1 names them), then the round-2 curation layer (all
        # oracled) — this fills the driver's ~50-query window with
        # hash-checkable entries; the rows-only forecast model queries
        # (ETS/ARIMA/... fits are not SQL-expressible) follow.
        ({k: fq.QUERIES[k] for k in fq.ORACLES}, dict(fq.ORACLES)),
        (curation.QUERIES, curation.ORACLES),
        # round-2 additions — first slots past the ~50-query window this
        # round (strict_audit covers them locally); rotate forward next
        (text_quality.QUERIES, text_quality.ORACLES),
        (pyds.QUERIES, pyds.ORACLES),
        (dedup_back, dedup.ORACLES),
        (sp_back, scale_patterns.ORACLES),
        (fq.EVAL_QUERIES, fq.EVAL_ORACLES),
        (dedup.EXTRA_QUERIES, dedup.EXTRA_ORACLES),
        (sq.EXTRA_QUERIES, sq.EXTRA_ORACLES),
        (fq.QUERIES, fq.ORACLES),
        # Proven in round 1 (CORRECTNESS_r01.json) — behind the window.
        (relational.QUERIES, relational.ORACLES),
        (relational_ext.QUERIES, relational_ext.ORACLES),
        (relational_more.QUERIES, relational_more.ORACLES),
        (tpch_full.QUERIES, tpch_full.ORACLES),
    ]


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
