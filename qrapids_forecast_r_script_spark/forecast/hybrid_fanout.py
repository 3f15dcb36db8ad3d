"""HYBRID fold×component fan-out — the straggler-killing batch path.

``fit_hybrid`` (``models/hybrid.py``, reference semantics
``TimeSeriesFunctions_GPL_0.5.1.R:321-344``) runs 6 component fits plus
6 × ≤4 rolling-CV refits inside ONE task, so a single long series bounds
the whole stage: measured 36/156/359 s single-task at 1k/5k/10k points
(SCALE.md "HYBRID straggler budget").  This module explodes the same
work into (series × component × fold) Spark tasks and reassembles the
CV weights with JVM-side aggregation, cutting the critical path to the
slowest SINGLE fit (~6× folds ≈ 30× at the 4-fold cap) while producing
the same weights and the same combined bands (each component fit is
internally seeded, so WHERE it runs cannot change WHAT it returns —
``tests/test_hybrid_fanout.py`` asserts equality against the
single-task path).

Plan shape (100 TB story):
- series assembly is one ``sort_array(collect_list(struct(...)))``
  aggregation — the same single shuffle as ``forecast_batch``;
- unit explosion (components × CV origins + a final-fit marker) is pure
  JVM ``explode``/``sequence`` — no Python, no extra shuffle;
- one ``repartition`` on the unit key spreads fits across the cluster
  (the whole point: a 10k-point series becomes ~30 independent tasks);
- the Python boundary is exactly one ``mapInPandas`` that runs the
  numpy fits — everything before and after (RMSE, inverse-error
  weights, fallback shares, band combination) is built-in expressions.

The reference's own 10k cap (R:28) bounds every unit's input; the
fan-out exists for the n ≳ 5k tail where the single-task path is the
stage straggler.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from .models.common import DEGENERATE_ERRORS
from .models.hybrid import (_COMPONENTS, _component_forecast,
                            _component_point_forecast)

_BANDS = ["mean", "lower1", "lower2", "upper1", "upper2"]

_UNIT_RESULT = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("index", T.StringType()),
    T.StructField("component", T.StringType()),
    # 'cv' (errs set) | 'cv_fail' (poisons the component's RMSE →
    # fallback weight, matching _cv_rmse's any-fold-fails → None) |
    # 'final' (band arrays set); a final fit that degenerates emits
    # nothing, dropping the component exactly like fit_hybrid does
    T.StructField("kind", T.StringType()),
    T.StructField("errs", T.ArrayType(T.DoubleType())),
    *[T.StructField(b, T.ArrayType(T.DoubleType())) for b in _BANDS],
])


def _series_units(metrics: DataFrame, frequency: int, horizon: int,
                  cv_horizon: int) -> DataFrame:
    """(name, index, component, origin, window, y) — one row per fit
    unit, assembled and exploded entirely JVM-side.

    origin = -1 marks the final full-series fit; CV origins mirror
    ``_cv_rmse``: window = n − 2·cvHorizon (R:326), one-step slide,
    LAST 4 folds (the documented fold cap), skipped entirely when
    window < max(4, m) — the component then has no CV rows and lands on
    the fallback weight, same as the single-task path."""
    m = max(1, int(frequency))
    h = int(cv_horizon)
    letters = F.array(*[F.lit(c) for c in _COMPONENTS])
    series = (metrics
              .groupBy("name", "index")
              .agg(F.slice(  # stable (date, value) sort + the 10k cap
                   F.sort_array(F.collect_list(
                       F.struct("evaluationDate", "value"))),
                   1, 10_000).alias("pts"))
              .withColumn("y", F.col("pts.value"))
              .drop("pts")
              .withColumn("n", F.size("y"))
              .withColumn("window", F.col("n") - 2 * F.lit(h)))
    cv_ok = (F.col("window") >= F.greatest(F.lit(4), F.lit(m)))
    origins = F.when(
        cv_ok, F.sequence(F.greatest(F.col("window"),
                                     F.col("n") - F.lit(h) - 3),
                          F.col("n") - F.lit(h)))
    return (series
            .withColumn("origin",
                        F.explode(F.concat(F.array(F.lit(-1)),
                                           F.coalesce(origins, F.array()))))
            .withColumn("component", F.explode(letters))
            .select("name", "index", "component", "origin", "window", "y"))


def _run_units(frequency: int, horizon: int):
    """The single Python boundary: each input row is one independent fit
    (bounded by the 10k cap), so executor memory is per-unit constant."""
    m = max(1, int(frequency))
    h = int(horizon)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                _, fit_fn, cv_fit_fn = _COMPONENTS[r.component]
                y = np.asarray(r.y, float)
                base = {"name": r.name, "index": r.index,
                        "component": r.component, "errs": None,
                        **{b: None for b in _BANDS}}
                if r.origin < 0:  # final full-series fit
                    try:
                        model = fit_fn(y, m)
                        bands = _component_forecast(model, h, r.component)
                    except DEGENERATE_ERRORS:
                        continue  # component dropped, like fit_hybrid
                    rows.append({**base, "kind": "final",
                                 **{b: [float(v) for v in bands[b]]
                                    for b in _BANDS}})
                else:  # one rolling-CV fold
                    train = y[r.origin - r.window:r.origin]
                    actual = y[r.origin:r.origin + h]
                    try:
                        model = cv_fit_fn(train, m)
                        fc = _component_point_forecast(model, h, r.component)
                        errs = (actual - np.asarray(fc)[:len(actual)])
                        rows.append({**base, "kind": "cv",
                                     "errs": [float(e) for e in errs]})
                    except DEGENERATE_ERRORS:
                        rows.append({**base, "kind": "cv_fail"})
            yield pd.DataFrame(rows, columns=[f.name for f in _UNIT_RESULT])

    return fn


def hybrid_fanout_components(spark: SparkSession, metrics: DataFrame,
                             frequency: int = 7, horizon: int = 14,
                             ) -> DataFrame:
    """Per-(series, component) weights + final forecast bands.

    Weight reassembly mirrors ``fit_hybrid`` exactly: RMSE over the
    concatenated fold errors (horizonAverage=TRUE), weight ∝ 1/RMSE,
    components with no usable CV take the mean of the known inverses
    (or an equal share when none is known), normalized per series."""
    units = _series_units(metrics, frequency, horizon, cv_horizon=horizon)
    try:
        width = max(1, int(spark.conf.get("spark.sql.shuffle.partitions")))
    except (TypeError, ValueError):
        width = 32
    results = (units
               # user-specified repartition: exempt from AQE coalescing —
               # these tasks are CPU-bound numpy fits, not data-bound
               # (same measured rationale as forecast_batch)
               .repartition(width, "name", "index", "component", "origin")
               .mapInPandas(_run_units(frequency, horizon),
                            schema=_UNIT_RESULT))
    finals = results.where(F.col("kind") == "final").drop("kind", "errs")
    # array_sort before the fold-sum: collect_list order is
    # partition-dependent and fp addition is not associative — sorting
    # pins the summation order so reruns hash identically
    cv = (results.where(F.col("kind") != "final")
          .groupBy("name", "index", "component")
          .agg(F.sum(F.when(F.col("kind") == "cv_fail", 1)
                     .otherwise(0)).alias("fails"),
               F.array_sort(F.flatten(F.collect_list("errs")))
               .alias("all_errs"))
          .withColumn(
              "rmse",
              F.when((F.col("fails") > 0) | (F.size("all_errs") == 0),
                     F.lit(None).cast("double"))
              .otherwise(F.sqrt(
                  F.aggregate("all_errs", F.lit(0.0),
                              lambda acc, x: acc + x * x)
                  / F.size("all_errs"))))
          .select("name", "index", "component", "rmse"))
    w = Window.partitionBy("name", "index")
    return (finals
            .join(cv, ["name", "index", "component"], "left")
            .withColumn("inv", F.when(F.col("rmse") > 0,
                                      1.0 / F.col("rmse")))
            .withColumn("inv", F.coalesce(
                "inv", F.avg("inv").over(w), F.lit(1.0)))
            .withColumn("weight", F.col("inv") / F.sum("inv").over(w))
            .drop("inv", "rmse"))


def hybrid_fanout_batch(spark: SparkSession, metrics: DataFrame,
                        frequency: int = 7, horizon: int = 14) -> DataFrame:
    """Drop-in for ``forecast_batch(..., "HYBRID")`` output: the same
    (name, index, method, step, 5 bands) rows, combined with
    PI.combination='mean' (R:340) as a JVM-side weighted sum."""
    comp = hybrid_fanout_components(spark, metrics, frequency, horizon)
    z = comp.select(
        "name", "index", "component", "weight",
        F.posexplode(F.arrays_zip(*_BANDS)).alias("pos", "v"))
    return (z.groupBy("name", "index", F.col("pos").alias("step"))
            .agg(*[F.sum(F.col("weight") * F.col(f"v.{b}")).alias(b)
                   for b in _BANDS])
            # the batch path stamps the REQUESTED method string
            # (fit_and_forecast_pdf), so the drop-in does too
            .select("name", "index", F.lit("HYBRID").alias("method"),
                    (F.col("step") + 1).cast("long").alias("step"),
                    *_BANDS))
