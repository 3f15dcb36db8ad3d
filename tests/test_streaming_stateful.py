"""Stateful streaming operator + series-cap semantics."""

import numpy as np
import pandas as pd


def test_stateful_anomaly_counter_state_math(spark, sf_dir):
    """The Welford state must equal the batch statistics at end of stream."""
    from qrapids_forecast_r_script_spark.streaming.stateful import (
        events_stateful_anomalies)
    from qrapids_forecast_r_script_spark.sources import load_table
    out = {r["event_type"]: r
           for r in events_stateful_anomalies(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").toPandas()
    for etype, grp in ev.groupby("event_type"):
        row = out[etype]
        assert row["running_count"] == len(grp)
        assert abs(row["running_mean"] - grp["value"].mean()) < 1e-4
        assert 0 <= row["n_anomalies"] < len(grp)


def test_series_cap_at_10k(spark):
    """The reference's size=10000 cap (R:28, quirk 7): longer series are
    truncated to their earliest 10k observations."""
    from qrapids_forecast_r_script_spark.sources import load_series
    n = 10_500
    pdf = pd.DataFrame({
        "name": "long", "index": "ix",
        "evaluationDate": pd.date_range("1990-01-01", periods=n).date,
        "value": np.arange(n, dtype=float),
    })
    metrics = spark.createDataFrame(pdf)
    series = load_series(metrics).toPandas()
    assert len(series) == 10_000
    assert series["t"].max() == 9_999
    # earliest-first: values 0..9999 kept, the newest 500 dropped
    assert series["y"].max() == 9_999.0
