"""Invariant tests for the OLS trend and split-conformal interval
operators (`forecast/queries.py`)."""

import numpy as np

from qrapids_forecast_r_script_spark.forecast.queries import (
    _CONF_ALPHA,
    conformal_snaive_intervals,
    series_trend_ols,
)
from qrapids_forecast_r_script_spark.sources import load_table
from qrapids_forecast_r_script_spark.sources.registry import events_as_metrics


def _series(spark, sf_dir):
    by = {}
    for r in events_as_metrics(load_table(spark, sf_dir, "events")) \
            .collect():
        by.setdefault(r.name, []).append((r.evaluationDate, r.value))
    for pts in by.values():
        pts.sort()
    return {k: np.array([v for _, v in pts]) for k, pts in by.items()}


def test_trend_ols_matches_numpy(spark, sf_dir):
    by = _series(spark, sf_dir)
    out = {r.name: r for r in series_trend_ols(spark, sf_dir).collect()}
    assert set(out) == set(by)
    for name, y in by.items():
        x = np.arange(len(y), dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        r = out[name]
        assert r.n_points == len(y)
        assert abs(r.slope - slope) < 1e-4, (name, r.slope, slope)
        assert abs(r.intercept - intercept) < 1e-3
        r2 = np.corrcoef(x, y)[0, 1] ** 2
        assert abs(r.r2 - r2) < 1e-4


def test_conformal_intervals_cover_and_repeat_last_week(spark, sf_dir):
    by = _series(spark, sf_dir)
    rows = {}
    for r in conformal_snaive_intervals(spark, sf_dir).collect():
        rows.setdefault(r.name, []).append(r)
    assert set(rows) == set(by)
    for name, y in by.items():
        rs = sorted(rows[name], key=lambda r: r.step)
        assert [r.step for r in rs] == list(range(1, 8))
        # point forecasts repeat the final observed week (SNAIVE)
        assert np.allclose([r.point for r in rs], np.round(y[-7:], 6))
        # q_width = exact type-7 0.9-quantile of the calibration scores
        # on the week BEFORE the forecast base week (disjoint split —
        # ADVICE r3): scores are lag-7 residuals of y[n-14:n-7]
        calib = np.abs(y[-14:-7] - y[-21:-14])
        expect = round(float(np.quantile(calib, _CONF_ALPHA)), 6)
        for r in rs:
            assert abs(r.q_width - expect) < 1e-6, (name, r.q_width, expect)
            assert r.lower == round(r.point - r.q_width, 6)
            assert r.upper == round(r.point + r.q_width, 6)
            assert r.q_width >= 0
