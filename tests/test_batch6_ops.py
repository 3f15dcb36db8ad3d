"""Invariant tests for the series monitors (`forecast/queries.py::
series_changepoint_cusum` / `series_rolling_correlation`) and the
data-contract report (`operators/data_quality.py::
events_contract_violations`)."""

import math

from qrapids_forecast_r_script_spark.forecast.queries import (
    _CUSUM_CRIT,
    _RC_WIN,
    series_changepoint_cusum,
    series_rolling_correlation,
)
from qrapids_forecast_r_script_spark.operators.data_quality import (
    events_contract_violations,
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
    return by


def test_cusum_matches_bruteforce(spark, sf_dir):
    by = _series(spark, sf_dir)
    out = {r.name: r for r in series_changepoint_cusum(spark, sf_dir)
           .collect()}
    assert set(out) == set(by)
    for name, pts in by.items():
        vals = [v for _, v in pts]
        n = len(vals)
        mu = round(sum(vals) / n, 6)
        sd = math.sqrt(sum((v - sum(vals) / n) ** 2 for v in vals) / n)
        s, best = 0.0, None
        for d, v in pts:
            s = round(s + round(v - mu, 6), 6)
            if best is None or abs(s) > best[0] + 1e-12:
                best = (abs(s), d)
        r = out[name]
        assert r.changepoint_date == best[1], (name, r, best)
        assert abs(r.cusum_abs - round(best[0], 6)) < 1e-6
        stat = best[0] / (sd * math.sqrt(n))
        assert abs(r.cusum_stat - round(stat, 6)) < 1e-5
        assert r.significant == (r.cusum_stat > _CUSUM_CRIT)


def test_rolling_correlation_matches_bruteforce(spark, sf_dir):
    by = _series(spark, sf_dir)
    pur = dict(by["purchase"])
    out = {}
    for r in series_rolling_correlation(spark, sf_dir).collect():
        out.setdefault(r.name, []).append(r)
        assert -1.0 <= r.corr7 <= 1.0
    assert set(out) == set(by) - {"purchase"}
    for name, rows in out.items():
        pts = [(d, v, pur[d]) for d, v in by[name] if d in pur]
        # only full trailing windows emit
        assert len(rows) == len(pts) - (_RC_WIN - 1)
        rows.sort(key=lambda r: r.evaluationDate)
        # brute-force the last window
        tail = pts[-_RC_WIN:]
        xs, ys = [x for _, x, _ in tail], [y for _, _, y in tail]
        k = float(_RC_WIN)
        mx, my = sum(xs) / k, sum(ys) / k
        sxy = sum(x * y for x, y in zip(xs, ys)) / k - mx * my
        sxx = sum(x * x for x in xs) / k - mx * mx
        syy = sum(y * y for y in ys) / k - my * my
        expect = round(sxy / math.sqrt(sxx * syy), 4)
        assert abs(rows[-1].corr7 - expect) < 2e-4, (name, expect)


def test_contract_report_clean_fixture(spark, sf_dir):
    rows = {r.rule: r for r in events_contract_violations(spark, sf_dir)
            .collect()}
    assert set(rows) == {"null_event_id", "duplicate_event_id",
                         "null_user_id", "ts_out_of_window",
                         "unknown_event_type", "value_out_of_range"}
    # the generated fixture satisfies its own contract — every rule
    # must report exactly zero (a nonzero here means the reader, not
    # the data, broke: e.g. the ns-timestamp dispatch regressed)
    for r in rows.values():
        assert r.n_violations == 0 and r.violation_rate == 0.0, r
