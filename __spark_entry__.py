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
    from qrapids_forecast_r_script_spark.operators import relational
    regs = [(relational.QUERIES, relational.ORACLES)]
    try:
        from qrapids_forecast_r_script_spark.operators import relational_ext
        regs.append((relational_ext.QUERIES, relational_ext.ORACLES))
    except ImportError:
        pass
    try:
        from qrapids_forecast_r_script_spark.operators import tpch_full
        regs.append((tpch_full.QUERIES, tpch_full.ORACLES))
    except ImportError:
        pass
    try:
        from qrapids_forecast_r_script_spark.operators import relational_more
        regs.append((relational_more.QUERIES, relational_more.ORACLES))
    except ImportError:
        pass
    try:
        from qrapids_forecast_r_script_spark.streaming import stateful
        regs.append((stateful.QUERIES, stateful.ORACLES))
    except ImportError:
        pass
    try:
        from qrapids_forecast_r_script_spark.operators import dedup
        regs.append((dedup.QUERIES, dedup.ORACLES))
    except ImportError:
        pass
    try:
        from qrapids_forecast_r_script_spark.operators import similarity
        regs.append((similarity.QUERIES, similarity.ORACLES))
    except ImportError:
        pass
    try:
        from qrapids_forecast_r_script_spark.operators import text
        regs.append((text.QUERIES, text.ORACLES))
    except ImportError:
        pass
    try:
        from qrapids_forecast_r_script_spark.operators import multimodal
        regs.append((multimodal.QUERIES, multimodal.ORACLES))
    except ImportError:
        pass
    try:
        from qrapids_forecast_r_script_spark.operators import scale_patterns
        regs.append((scale_patterns.QUERIES, scale_patterns.ORACLES))
    except ImportError:
        pass
    try:
        from qrapids_forecast_r_script_spark.operators import product_analytics
        regs.append((product_analytics.QUERIES, product_analytics.ORACLES))
    except ImportError:
        pass
    try:
        from qrapids_forecast_r_script_spark.operators import pipeline
        regs.append((pipeline.QUERIES, pipeline.ORACLES))
    except ImportError:
        pass
    try:
        from qrapids_forecast_r_script_spark.sources import formats
        regs.append((formats.QUERIES, formats.ORACLES))
    except ImportError:
        pass
    try:
        from qrapids_forecast_r_script_spark.forecast import queries as fq
        regs.append((fq.QUERIES, fq.ORACLES))
    except ImportError:
        pass
    try:
        from qrapids_forecast_r_script_spark.streaming import queries as sq
        regs.append((sq.QUERIES, sq.ORACLES))
    except ImportError:
        pass
    return regs


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
