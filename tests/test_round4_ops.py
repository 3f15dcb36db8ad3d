"""Round-4 operator tests: iterative-method backtest driver query."""

import math

import numpy as np

from pyspark.sql import functions as F


def test_forecast_method_backtest_complete_and_bounded(spark, sf_dir):
    """The rows-only driver query must emit exactly series × methods
    rows, all finite, with rmse >= mae, and every method's holdout MAE
    pinned below 4× the one-step-naive holdout MAE (a MASE-style,
    scale-free bound — worst observed ratio is 2.36 at sf0.001 and
    well under 1 at sf0.01, so a genuine fit-layer blowup trips this
    before it reaches the driver artifact)."""
    from pyspark.sql.window import Window

    from qrapids_forecast_r_script_spark.forecast.dispatch import METHODS
    from qrapids_forecast_r_script_spark.forecast.queries import (
        _BT_H, _metrics, forecast_method_backtest)

    rows = forecast_method_backtest(spark, sf_dir).collect()
    metrics = _metrics(spark, sf_dir)
    n_series = metrics.select("name", "index").distinct().count()
    assert len(rows) == n_series * len(METHODS)
    seen = {(r.name, r.method) for r in rows}
    assert len(seen) == len(rows)  # one row per (series, method)

    # per-series one-step-naive benchmark on the SAME holdout week
    w = Window.partitionBy("name", "index").orderBy("evaluationDate")
    pdf = (metrics.withColumn("rn", F.row_number().over(w))
           .toPandas())
    naive = {}
    for name, g in pdf.groupby("name"):
        y = g.sort_values("rn")["value"].to_numpy(dtype=float)
        naive[name] = float(np.mean(np.abs(y[-_BT_H:] - y[-_BT_H - 1])))
    for r in rows:
        assert r.n_holdout == _BT_H
        assert math.isfinite(r.mae) and math.isfinite(r.rmse), r
        assert r.rmse >= r.mae - 1e-9, r
        assert r.mae <= 4.0 * naive[r.name], (
            r.name, r.method, r.mae, naive[r.name])
