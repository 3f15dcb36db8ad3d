"""Forecast API: grouped-UDF batch mode + cache-orchestrated single series.

The reference processes one series per call (SURVEY §2A.4); the engine
generalizes to ``forecast_batch``: ``groupBy(name, index).applyInPandas``
— one pandas group == one reference invocation, fanned out across
executors.  At 100 TB this is the whole point: millions of independent
series become embarrassingly parallel tasks; the only shuffle is the hash
partition on the series key, and Arrow batches the transfer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schemas
from .dispatch import fit_method, forecast_fitted

_FORECAST_KEYS = ["lower1", "lower2", "mean", "upper1", "upper2"]


def forecast_rows(name: str, index: str, method: str, bands: dict) -> pd.DataFrame:
    """The shared 5-vector → long-rows constructor (R:97-102 and clones)."""
    horizon = len(bands["mean"])
    return pd.DataFrame({
        "name": name, "index": index, "method": method,
        "step": np.arange(1, horizon + 1, dtype=np.int32),
        **{k: np.asarray(bands[k], dtype=float) for k in _FORECAST_KEYS},
    })[["name", "index", "method", "step"] + _FORECAST_KEYS]


# anything outside DEGENERATE_ERRORS (AttributeError, KeyError, …) is a
# programming error and must kill the job loudly, not be silently
# converted to NaN output across millions of series.
from .models.common import DEGENERATE_ERRORS as _DEGENERATE_ERRORS


def prepare_series(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic series prep shared by the batch and cached
    single-series paths: STABLE sort with the same (evaluationDate,
    value) tiebreak as ``sources.load_series`` and the DuckDB oracles —
    duplicate-date rows otherwise arrive in shuffle order and pandas'
    default unstable sort would make the y ordering (and the 10k-cap
    survivor set, R:28) differ run to run, breaking output hash
    stability — then the cap.  Returns (y, ds_days)."""
    if len(pdf) > 10_000:
        # reference quirk 7 (R:28): the cap is kept for parity, but never
        # silently — the engine's no-silent-caps rule
        import logging
        logging.getLogger(__name__).warning(
            "series (%s, %s) has %d points; truncating to the reference's "
            "10k cap (R:28)", pdf["name"].iloc[0], pdf["index"].iloc[0],
            len(pdf))
    pdf = (pdf.sort_values(["evaluationDate", "value"], kind="mergesort")
           .head(10_000))
    y = pdf["value"].to_numpy(dtype=float)
    ds_days = (pd.to_datetime(pdf["evaluationDate"]).values
               .astype("datetime64[D]").astype(int))
    return y, ds_days


def fit_and_forecast_pdf(pdf: pd.DataFrame, method: str, frequency: int,
                         horizon: int) -> pd.DataFrame:
    """One series group → forecast rows.  Runs in the executor's Python
    worker via Arrow; deterministic sort + the reference's 10k cap
    (R:28) inside the group."""
    name = str(pdf["name"].iloc[0])
    index = str(pdf["index"].iloc[0])
    y, ds_days = prepare_series(pdf)
    seed_key = (name, index, method)
    try:
        model = fit_method(method, y, frequency, ds_days=ds_days,
                           horizon=horizon, seed_key=seed_key)
        bands = forecast_fitted(model, horizon, seed_key=seed_key)
    except _DEGENERATE_ERRORS as exc:
        # degenerate series: emit NaN bands rather than killing the job,
        # but leave a trace in executor logs
        import logging
        logging.getLogger(__name__).warning(
            "forecast failed for series (%s, %s, %s): %r — emitting NaN",
            name, index, method, exc)
        nan = np.full(horizon, np.nan)
        bands = {k: nan for k in _FORECAST_KEYS}
    return forecast_rows(name, index, method, bands)


# Series-length threshold where the HYBRID/BAGGEDETS fan-outs beat the
# single-task-per-series fit (SCALE.md "fan-out dispatch"): below ~5k
# points a whole fit is seconds and the fan-out's extra shuffles+
# checkpoint dominate; above it the single task becomes the stage-
# straggler the fan-outs exist to kill (359 s / 567 s at the 10k cap).
FANOUT_POINT_THRESHOLD = 5_000


def forecast_batch(spark: SparkSession, metrics: DataFrame, method: str,
                   frequency: int = 7, horizon: int = 14,
                   fanout: str = "auto") -> DataFrame:
    """Every (name, index) series in one job.

    Scale notes: one shuffle (hash partition by series key); each task
    fits exactly one series (≤10k points — bounded memory by the
    reference's own cap, R:28); skewed numbers of series per executor are
    handled by AQE partition coalescing.

    ``fanout`` controls the HYBRID/BAGGEDETS straggler dispatch
    (r6 verdict item 4 — the 100×-scale path is the DEFAULT path):

    - ``"auto"``: one cheap JVM count-per-series aggregation decides —
      if the longest series (post the reference's 10k cap, R:28) has
      ≥ ``FANOUT_POINT_THRESHOLD`` points, route through
      ``hybrid_fanout_batch`` / ``bagged_fanout_batch`` (exact-parity
      drop-ins, tests/test_*_fanout.py); else the single-task-per-
      series fit below, whose whole fit at small n is cheaper than the
      fan-out's extra shuffles.
    - ``"always"`` / ``"never"``: force one path (tests, debugging).

    Methods without a fan-out (everything but HYBRID/BAGGEDETS) ignore
    the flag: their single-series fits are not stage stragglers.
    """
    method_u = method.upper()
    freq, hor = int(frequency), int(horizon)
    if fanout not in ("auto", "always", "never"):
        raise ValueError(f"fanout must be auto|always|never, got {fanout!r}")
    if method_u in ("HYBRID", "BAGGEDETS") and fanout != "never":
        use_fanout = fanout == "always"
        if fanout == "auto":
            longest = (metrics.groupBy("name", "index").count()
                       .agg(F.max("count")).first()[0])
            use_fanout = (longest or 0) >= FANOUT_POINT_THRESHOLD
        if use_fanout:
            if method_u == "HYBRID":
                from .hybrid_fanout import hybrid_fanout_batch
                return hybrid_fanout_batch(spark, metrics, freq, hor)
            from .bagged_fanout import bagged_fanout_batch
            return bagged_fanout_batch(spark, metrics, freq, hor)

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return fit_and_forecast_pdf(pdf, method_u, freq, hor)

    # EXPLICIT repartition on the group key: the shuffled series bytes
    # are tiny, so AQE's size-based coalescing collapses the exchange to
    # ONE partition and serializes the fits — but this stage is
    # CPU-bound per group (an ARIMA grid fit is seconds of numpy per
    # series), not data-bound.  A user-specified repartition is exempt
    # from AQE coalescing and groupBy on the same keys reuses it (still
    # exactly one shuffle).  Measured at sf0.01: BAGGEDETS over 5 series
    # 30.8 s → ~7 s; the width follows spark.sql.shuffle.partitions, so
    # a real cluster fans out to its own core count.  Results are
    # partitioning-invariant (each group fits alone; hash checks are
    # order-insensitive).
    from ..session import shuffle_width
    return (metrics
            .repartition(shuffle_width(spark), "name", "index")
            .groupBy("name", "index")
            .applyInPandas(apply_fn, schema=schemas.FORECAST))


def forecast_one(engine, name: str, index: str, method: str,
                 frequency: int = 7, horizon: int = 14,
                 force_seasonality: bool = False) -> DataFrame:
    """Single-series path with the reference's wrapper orchestration
    (§2A.6) when the engine has an artifact_dir, else a direct fit."""
    method_u = method.upper()
    if method_u == "ARIMA" and force_seasonality:
        # ifelse(forceSeasonality, 'ARIMA_FORCE_SEASONALITY', 'ARIMA') (R:105)
        method_u = "ARIMA_FORCE_SEASONALITY"
    from .cache import ForecastStore
    store = ForecastStore(engine.artifact_dir) if engine.artifact_dir else None
    from ..sources import search_element
    spark = engine.spark

    def compute_series():
        pdf = (search_element(engine.metrics, name, index)
               .toPandas())
        if pdf.empty:
            raise ValueError(f"no data for series ({name!r}, {index!r})")
        return pdf

    if store is None:
        pdf = compute_series()
        rows = fit_and_forecast_pdf(pdf, method_u, frequency, horizon)
        return spark.createDataFrame(rows, schema=schemas.FORECAST)
    rows = store.forecast_with_cache(name, index, method_u, frequency,
                                     horizon, compute_series)
    return spark.createDataFrame(rows, schema=schemas.FORECAST)
