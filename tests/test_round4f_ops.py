"""Round-4 continuation batch 18: semantic tests for the Page-Hinkley
online drift detector, Neyman labeling-budget allocation, the
Simpson's-paradox slope audit, and the clamped inventory running
balance (recursive CTE).  Oracle parity is auto-covered by
test_oracle_parity; these re-derive each operator brute-force.
"""

import math

import pytest

from pyspark.sql import functions as F


def _metric_series(spark, sf_dir):
    """{(name): [(date, value)]} replicating the events metrics CTE."""
    from qrapids_forecast_r_script_spark.sources import load_table
    rows = (load_table(spark, sf_dir, "events")
            .groupBy("event_type", F.to_date("ts").alias("d"))
            .agg(F.round(F.sum("value"), 6).alias("v"))
            .collect())
    out = {}
    for r in rows:
        out.setdefault(r.event_type, []).append((r.d, r.v))
    for v in out.values():
        v.sort()
    return out


# ---------------------------------------------------- Page-Hinkley

def test_page_hinkley_matches_sequential_bruteforce(spark, sf_dir):
    from qrapids_forecast_r_script_spark.forecast.queries import (
        series_page_hinkley, _PH_DELTA_SD, _PH_LAMBDA_SD)
    got = {r.name: r for r in series_page_hinkley(spark, sf_dir).collect()}
    series = _metric_series(spark, sf_dir)
    assert set(got) == set(series)
    for name, pts in series.items():
        xs = [v for _, v in pts]
        mu = sum(xs) / len(xs)
        sd = math.sqrt(sum((x - mu) ** 2 for x in xs) / len(xs))
        delta = round(_PH_DELTA_SD * sd, 6)
        lam = round(_PH_LAMBDA_SD * sd, 6)
        cx = m = 0.0
        minm = float("inf")
        ph_max, fire_date, best_date = -1.0, None, None
        for t, (d, x) in enumerate(pts, start=1):
            cx = round(cx + round(x, 6), 6)
            term = round(round(x, 6) - round(cx / t, 6) - delta, 6)
            m = round(m + term, 6)
            minm = round(min(minm, m), 6)
            ph = round(m - minm, 6)
            if ph > lam and fire_date is None:
                fire_date = d
            if ph > ph_max:
                ph_max, best_date = ph, d
        r = got[name]
        assert r.n_points == len(pts)
        assert r.ph_max == pytest.approx(ph_max, abs=2e-6)
        assert r.lambda_thresh == pytest.approx(lam, abs=1e-6)
        assert r.fired == (fire_date is not None)
        assert r.alarm_date == (fire_date or best_date)


def test_page_hinkley_detects_injected_shift():
    """A flat series with a late level jump must fire; without it must
    not — the detector's defining behavior, on synthetic data."""
    def ph(xs, delta, lam):
        cx = m = 0.0
        minm = float("inf")
        for t, x in enumerate(xs, 1):
            cx += x
            m += x - cx / t - delta
            minm = min(minm, m)
            if m - minm > lam:
                return True
        return False
    flat = [10.0] * 30
    shifted = [10.0] * 20 + [14.0] * 10
    assert not ph(flat, 0.1, 3.0)
    assert ph(shifted, 0.1, 3.0)


# ----------------------------------------------- Neyman allocation

def test_neyman_allocation_bruteforce(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.curation import (
        neyman_allocation_sample, _NA_BUDGET)
    from qrapids_forecast_r_script_spark.sources import load_table
    got = {r.source: r
           for r in neyman_allocation_sample(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents") \
        .select("source", "n_chars").collect()
    per = {}
    for d in docs:
        per.setdefault(d.source, []).append(d.n_chars)
    w = {}
    for s, xs in per.items():
        n = len(xs)
        sd = math.sqrt((n * sum(x * x for x in xs)
                        - sum(xs) ** 2)) / n
        w[s] = round(n * sd * 1e6)
    wtot = sum(w.values())
    ntot = sum(len(v) for v in per.values())
    assert set(got) == set(per)
    for s, xs in per.items():
        r = got[s]
        assert r.n_docs == len(xs)
        assert r.neyman_share == pytest.approx(w[s] / wtot, abs=1e-6)
        assert r.neyman_n == round(w[s] / wtot * _NA_BUDGET)
        assert r.proportional_n == round(len(xs) / ntot * _NA_BUDGET)
    # budget is conserved up to per-stratum rounding
    assert abs(sum(r.neyman_n for r in got.values())
               - _NA_BUDGET) <= len(per)


# ------------------------------------------------- Simpson audit

def test_simpson_slopes_bruteforce(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.data_quality import (
        simpson_slope_audit)
    from qrapids_forecast_r_script_spark.sources import load_table
    got = {r.nationkey: r
           for r in simpson_slope_audit(spark, sf_dir).collect()}
    nat = {r.c_custkey: (r.c_nationkey, round(r.c_acctbal * 100))
           for r in load_table(spark, sf_dir, "customer").collect()}
    pairs = [(nat[o.o_custkey][0], nat[o.o_custkey][1],
              round(o.o_totalprice * 100))
             for o in load_table(spark, sf_dir, "orders")
             .select("o_custkey", "o_totalprice").collect()]

    def slope(pts):
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        den = n * sxx - sx * sx
        return (n * sxy - sx * sy) / den if den else None

    pooled = slope([(x, y) for _, x, y in pairs])
    per = {}
    for k, x, y in pairs:
        per.setdefault(k, []).append((x, y))
    for k, pts in per.items():
        r = got[k]
        assert r.n_orders == len(pts)
        assert r.slope == pytest.approx(slope(pts), abs=2e-6)
        assert r.pooled_slope == pytest.approx(pooled, abs=2e-6)
        assert r.sign_reversed == (r.slope * r.pooled_slope < 0)


# -------------------------------------------- clamped running balance

def test_running_balance_matches_ledger_simulation(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.relational_ext import (
        parts_running_balance, _RB_DAYS, _RB_PARTS)
    rows = parts_running_balance(spark, sf_dir).collect()
    by_part = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, []).append(r)
    assert len(by_part) == _RB_PARTS
    for pk, seq in by_part.items():
        seq.sort(key=lambda r: r.t)
        assert [r.t for r in seq] == list(range(1, _RB_DAYS + 1))
        stock = 0
        for r in seq:
            nxt = max(0, stock + r.inflow - r.outflow)
            short = max(0, r.outflow - stock - r.inflow)
            assert r.stock == nxt, (pk, r.t)
            assert r.shortage == short, (pk, r.t)
            assert r.stock >= 0
            stock = nxt
        # restocks land weekly on t ≡ 1 (mod 7) and nowhere else
        for r in seq:
            if r.t % 7 == 1:
                assert r.inflow > 0
            else:
                assert r.inflow == 0
