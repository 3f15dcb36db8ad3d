"""forecast_batch fanout="auto" dispatch (r6 verdict item 4).

The HYBRID/BAGGEDETS straggler fan-outs must be the DEFAULT path at
scale, not a sibling API: ``forecast_batch(..., fanout="auto")`` runs
one JVM count-per-series aggregation and routes through
``hybrid_fanout_batch`` / ``bagged_fanout_batch`` when the longest
series has ≥ FANOUT_POINT_THRESHOLD points.  These tests pin (a) the
routing decision on both sides of the threshold, (b) exact result
parity between the dispatched and forced paths, and (c) schema
equality so the dispatch is invisible to downstream consumers.
"""

import numpy as np
import pandas as pd
import pytest


def _toy_metrics(spark, n_points=40, names=("alpha", "beta")):
    rows = []
    for j, name in enumerate(names):
        for i in range(n_points):
            rows.append((name, "t",
                         (pd.Timestamp("2024-01-01")
                          + pd.Timedelta(days=i)).date(),
                         float(10 + 3 * np.sin(i / 3.0) + 0.1 * i + j)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["name", "index", "evaluationDate",
                                    "value"]))


def _collect(df):
    key = ["name", "index", "step"]
    return df.toPandas().sort_values(key).reset_index(drop=True)


@pytest.mark.parametrize("method", ["HYBRID", "BAGGEDETS"])
def test_auto_routes_below_threshold_to_single_task(spark, method):
    """Short series (40 pts << 5000): auto == never, bit-for-bit (same
    code path), and the plan contains the single applyInPandas stage,
    not the fan-out's mapInPandas chain."""
    from qrapids_forecast_r_script_spark.forecast.api import forecast_batch

    metrics = _toy_metrics(spark)
    auto = forecast_batch(spark, metrics, method, 7, 7, fanout="auto")
    never = forecast_batch(spark, metrics, method, 7, 7, fanout="never")
    # below threshold both are the grouped-applyInPandas plan
    assert "FlatMapGroupsInPandas" in auto._jdf.queryExecution().toString()
    a, n = _collect(auto), _collect(never)
    assert a.shape == n.shape and len(a) == 2 * 7
    pd.testing.assert_frame_equal(a, n)


@pytest.mark.parametrize("method", ["HYBRID", "BAGGEDETS"])
def test_auto_routes_above_threshold_to_fanout(spark, method, monkeypatch):
    """Drop the threshold to 1 point: auto must take the fan-out path
    (plan shows mapInPandas, not the grouped single-task stage) and the
    results must equal fanout="never" to fp-summation noise, with an
    IDENTICAL schema (the r7 int-step alignment)."""
    from qrapids_forecast_r_script_spark.forecast import api

    monkeypatch.setattr(api, "FANOUT_POINT_THRESHOLD", 1)
    metrics = _toy_metrics(spark)
    auto = api.forecast_batch(spark, metrics, method, 7, 7, fanout="auto")
    never = api.forecast_batch(spark, metrics, method, 7, 7, fanout="never")
    # names + types must be identical; nullability may be TIGHTER on
    # the fan-out path (literal method stamp / sequence-derived step
    # are provably non-null) which is a safe subtype of the grouped-UDF
    # path's all-nullable Arrow schema
    assert [(f.name, f.dataType) for f in auto.schema.fields] == \
        [(f.name, f.dataType) for f in never.schema.fields], \
        (auto.schema, never.schema)
    plan = auto._jdf.queryExecution().toString()
    assert "FlatMapGroupsInPandas" not in plan  # not the single-task stage
    a, n = _collect(auto), _collect(never)
    assert len(a) == len(n) == 2 * 7
    assert (a[["name", "index", "step"]].values
            == n[["name", "index", "step"]].values).all()
    assert (a["method"] == method).all()
    for c in ["lower1", "lower2", "mean", "upper1", "upper2"]:
        np.testing.assert_allclose(a[c].to_numpy(), n[c].to_numpy(),
                                   rtol=0, atol=1e-9)


def test_always_and_bad_value(spark):
    from qrapids_forecast_r_script_spark.forecast.api import forecast_batch

    metrics = _toy_metrics(spark, names=("alpha",))
    df = forecast_batch(spark, metrics, "BAGGEDETS", 7, 7, fanout="always")
    assert df.count() == 7
    with pytest.raises(ValueError, match="fanout"):
        forecast_batch(spark, metrics, "ETS", 7, 7, fanout="sometimes")


def test_non_fanout_methods_ignore_flag(spark):
    """ETS has no fan-out: always/never/auto all take the grouped path
    and agree exactly."""
    from qrapids_forecast_r_script_spark.forecast.api import forecast_batch

    metrics = _toy_metrics(spark, names=("alpha",))
    outs = [_collect(forecast_batch(spark, metrics, "ETS", 7, 7, fanout=f))
            for f in ("auto", "always", "never")]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])
