"""BAGGEDETS fan-out equality vs the single-task path.

The moving-block bootstrap is seeded per (name, index, method), so each
Spark task regenerates the identical replicate list and fits exactly
one member — the reassembled ensemble (mean + min/max envelope,
duplicated band pairs, R:216-217) must equal forecast_batch's
single-task output to fp-aggregation noise, with identical
(name, index, step) key sets and NaN placement.
"""

import numpy as np
import pytest

from conftest import SF_DIR


@pytest.fixture(scope="module")
def metrics(spark):
    from qrapids_forecast_r_script_spark.sources import (events_as_metrics,
                                                         load_table)
    return events_as_metrics(load_table(spark, SF_DIR, "events")).cache()


@pytest.mark.slow
def test_bagged_fanout_equals_single_task(spark, metrics):
    from qrapids_forecast_r_script_spark.forecast.api import forecast_batch
    from qrapids_forecast_r_script_spark.forecast.bagged_fanout import (
        bagged_fanout_batch)

    key = ["name", "index", "step"]
    a = (forecast_batch(spark, metrics, "BAGGEDETS", 7, 14)
         .toPandas().sort_values(key).reset_index(drop=True))
    b = (bagged_fanout_batch(spark, metrics, 7, 14)
         .toPandas().sort_values(key).reset_index(drop=True))
    assert len(a) == len(b) > 0
    assert (a[key].values == b[key].values).all()
    assert (b["method"] == "BAGGEDETS").all()
    for c in ["mean", "lower1", "lower2", "upper1", "upper2"]:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        assert (np.isnan(av) == np.isnan(bv)).all(), c
        ok = ~np.isnan(av)
        np.testing.assert_allclose(av[ok], bv[ok], rtol=0, atol=1e-9)


def test_bagged_fanout_rowcount_on_short_series(spark):
    """Short/degenerate series must not vanish: same key set as the
    sequential path, NaN where it has NaN (the hybrid fan-out's r6
    review lesson, applied here from the start)."""
    import pandas as pd

    from qrapids_forecast_r_script_spark.forecast.api import forecast_batch
    from qrapids_forecast_r_script_spark.forecast.bagged_fanout import (
        bagged_fanout_batch)

    rows = [("one", "t", pd.Timestamp("2024-01-01").date(), 5.0)]
    for i in range(25):
        rows.append(("sine", "t",
                     (pd.Timestamp("2024-01-01")
                      + pd.Timedelta(days=i)).date(),
                     10.0 + 3.0 * np.sin(2 * np.pi * i / 7)))
    metrics = spark.createDataFrame(
        pd.DataFrame(rows, columns=["name", "index", "evaluationDate",
                                    "value"]))
    key = ["name", "index", "step"]
    a = (forecast_batch(spark, metrics, "BAGGEDETS", 7, 14)
         .toPandas().sort_values(key).reset_index(drop=True))
    b = (bagged_fanout_batch(spark, metrics, 7, 14)
         .toPandas().sort_values(key).reset_index(drop=True))
    assert len(a) == len(b) == 2 * 14
    assert (a[key].values == b[key].values).all()
    for c in ["mean", "lower1", "upper2"]:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        assert (np.isnan(av) == np.isnan(bv)).all(), (c, av, bv)
        ok = ~np.isnan(av)
        np.testing.assert_allclose(av[ok], bv[ok], rtol=0, atol=1e-9)
