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


def test_events_ks_drift_matches_brute_ecdf(spark, sf_dir):
    """KS stat equals a brute-force per-type ECDF recomputation on the
    driver; stats are proper fractions; early/late counts partition the
    feed on the 15-day boundary."""
    from qrapids_forecast_r_script_spark.operators.data_quality import (
        _KS_COEF, _KS_SPLIT_DAYS, events_ks_drift)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = {r.event_type: r for r in
            events_ks_drift(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("d"), "value").toPandas()
    d0 = ev["d"].min()
    import datetime
    cut = d0 + datetime.timedelta(days=_KS_SPLIT_DAYS)
    for et, g in ev.groupby("event_type"):
        early = np.sort(g.loc[g["d"] < cut, "value"].to_numpy())
        late = np.sort(g.loc[g["d"] >= cut, "value"].to_numpy())
        grid = np.unique(np.concatenate([early, late]))
        fe = np.searchsorted(early, grid, side="right") / len(early)
        fl = np.searchsorted(late, grid, side="right") / len(late)
        ks = round(float(np.max(np.abs(fe - fl))), 6)
        r = rows[et]
        assert r.n_early == len(early) and r.n_late == len(late)
        assert abs(r.ks_stat - ks) < 1e-9, (et, r.ks_stat, ks)
        assert 0.0 <= r.ks_stat <= 1.0
        crit = round(_KS_COEF * ((len(early) + len(late))
                                 / (len(early) * len(late))) ** 0.5, 6)
        assert abs(r.ks_crit - crit) < 1e-9
        assert r.drift_detected == (r.ks_stat > r.ks_crit)


def test_bpe_encode_consistent_with_trainer(spark, sf_dir):
    """Every doc is covered; token counts never exceed character
    counts; total token savings equals the trainer's merged-pair mass
    (each applied merge removes exactly one symbol occurrence, so
    sum(chars) - sum(tokens) over the corpus == the number of merge
    operations performed across the 3 rounds)."""
    from qrapids_forecast_r_script_spark.operators.bpe import (
        bpe_encode_docs)
    from qrapids_forecast_r_script_spark.sources import load_table

    rows = bpe_encode_docs(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert r.n_tokens <= r.n_chars
        assert r.n_tokens >= r.n_words          # >= one token per word
        assert r.compression >= 1.0
        # NOT python round(): 137/128 = 1.0703125 is an exact midpoint
        # where Python banker's-rounds down but Spark AND DuckDB round
        # half-away (they agree — the oracle hash is safe); compare
        # with a half-ulp tolerance instead
        assert abs(r.compression - r.n_chars / r.n_tokens) <= 6e-7
