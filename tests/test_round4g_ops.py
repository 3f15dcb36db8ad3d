"""Round-4 continuation batch 19: semantic tests for Kendall τ-b
series correlation, the Benjamini-Hochberg FDR gate, and Tukey median
polish.  Oracle parity auto-covered by test_oracle_parity; these
re-derive the statistics brute-force.
"""

import math

import pytest

from pyspark.sql import functions as F


def _metric_series(spark, sf_dir):
    from qrapids_forecast_r_script_spark.sources import load_table
    rows = (load_table(spark, sf_dir, "events")
            .groupBy("event_type", F.to_date("ts").alias("d"))
            .agg(F.round(F.sum("value"), 6).alias("v"))
            .collect())
    out = {}
    for r in rows:
        out.setdefault(r.event_type, {})[r.d] = r.v
    return out


# ------------------------------------------------------ Kendall τ-b

def test_kendall_tau_matches_pairwise_definition(spark, sf_dir):
    from qrapids_forecast_r_script_spark.forecast.queries import (
        series_kendall_tau)
    got = {r.name: r for r in series_kendall_tau(spark, sf_dir).collect()}
    series = _metric_series(spark, sf_dir)
    ref = series["purchase"]
    for name, vals in series.items():
        days = sorted(set(vals) & set(ref))
        xs = [vals[d] for d in days]
        ys = [ref[d] for d in days]
        n = len(days)
        conc = disc = 0
        for i in range(n):
            for j in range(i + 1, n):
                s = (xs[i] - xs[j]) * (ys[i] - ys[j])
                if s > 0:
                    conc += 1
                elif s < 0:
                    disc += 1
        n0 = n * (n - 1) // 2

        def ties(zs):
            c = {}
            for z in zs:
                c[z] = c.get(z, 0) + 1
            return sum(v * (v - 1) // 2 for v in c.values())

        tau = (conc - disc) / math.sqrt(
            (n0 - ties(xs)) * (n0 - ties(ys)))
        r = got[name]
        assert r.n_days == n
        assert r.concordant == conc and r.discordant == disc
        assert r.tau_b == pytest.approx(tau, abs=1e-6)
    # the self-comparison row is the built-in sanity check
    assert got["purchase"].tau_b == pytest.approx(1.0, abs=1e-9)


# ------------------------------------------------------- BH / FDR

def test_bh_fdr_matches_bruteforce_stepup(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.product_analytics import (
        ab_bh_fdr_nations, _BH_ZCRITS)
    from qrapids_forecast_r_script_spark.sources import load_table
    import hashlib
    got = sorted(ab_bh_fdr_nations(spark, sf_dir).collect(),
                 key=lambda r: r.rank)
    nat = {r.c_custkey: r.c_nationkey
           for r in load_table(spark, sf_dir, "customer").collect()}
    per = {}
    for o in load_table(spark, sf_dir, "orders") \
            .select("o_custkey", "o_totalprice").collect():
        arm = int(hashlib.md5(str(o.o_custkey).encode())
                  .hexdigest()[:8], 16) % 2
        per.setdefault(nat[o.o_custkey], {0: [], 1: []})[arm].append(
            round(o.o_totalprice * 100))
    zs = {}
    for k, arms in per.items():
        a, b = arms[0], arms[1]
        na, nb = len(a), len(b)
        if na < 2 or nb < 2:
            zs[k] = None       # degenerate slice: z is NULL, never rejected
            continue
        ma, mb = sum(a) / na, sum(b) / nb
        va = (na * sum(x * x for x in a) - sum(a) ** 2) / na / (na - 1)
        vb = (nb * sum(x * x for x in b) - sum(b) ** 2) / nb / (nb - 1)
        se = math.sqrt(va / na + vb / nb)
        zs[k] = round((ma - mb) / se, 6) if se else None
    order = sorted(zs, key=lambda k: (zs[k] is None,
                                      -abs(zs[k] or 0.0), k))
    kstar = 0
    for i, k in enumerate(order):
        if zs[k] is not None and abs(zs[k]) >= _BH_ZCRITS[i]:
            kstar = i + 1
    assert len(got) == len(per)
    for r in got:
        if zs[r.nationkey] is None:
            assert r.z is None
        else:
            assert r.z == pytest.approx(zs[r.nationkey], abs=2e-6)
        assert r.nationkey == order[r.rank - 1]
        assert r.rejected == (r.rank <= kstar)
    # step-up coherence: rejections form a prefix of the ranking
    flags = [r.rejected for r in got]
    assert flags == sorted(flags, reverse=True)


def test_bh_zcrits_monotone_and_sane():
    from qrapids_forecast_r_script_spark.operators.product_analytics import (
        _BH_ZCRITS, _norm_ppf)
    # thresholds decrease with rank (larger k → easier bar), and the
    # inverse CDF hits textbook anchor points
    assert list(_BH_ZCRITS) == sorted(_BH_ZCRITS, reverse=True)
    assert _norm_ppf(0.975) == pytest.approx(1.959963985, abs=1e-8)
    assert _norm_ppf(0.5) == pytest.approx(0.0, abs=1e-12)
    assert _norm_ppf(0.05) == pytest.approx(-1.644853627, abs=1e-8)


# -------------------------------------------------- median polish

def test_median_polish_bruteforce_and_invariants(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.relational_ext import (
        dow_type_median_polish)
    from qrapids_forecast_r_script_spark.sources import load_table
    got = {(r.dow, r.event_type): r
           for r in dow_type_median_polish(spark, sf_dir).collect()}
    ev = (load_table(spark, sf_dir, "events")
          .groupBy(F.dayofweek("ts").alias("dow"), "event_type")
          .agg(F.round(F.avg("value"), 6).alias("cell")).collect())
    cells = {(r.dow, r.event_type): r.cell for r in ev}
    dows = sorted({d for d, _ in cells})
    types = sorted({t for _, t in cells})

    def med(xs):
        xs = sorted(xs)
        n = len(xs)
        return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2

    resid = dict(cells)
    row_eff = {d: 0.0 for d in dows}
    col_eff = {t: 0.0 for t in types}
    for _ in range(2):
        for d in dows:
            m = round(med([resid[(d, t)] for t in types]), 6)
            row_eff[d] = round(row_eff[d] + m, 6)
            for t in types:
                resid[(d, t)] = round(resid[(d, t)] - m, 6)
        for t in types:
            m = round(med([resid[(d, t)] for d in dows]), 6)
            col_eff[t] = round(col_eff[t] + m, 6)
            for d in dows:
                resid[(d, t)] = round(resid[(d, t)] - m, 6)
    assert set(got) == set(cells)
    for key, r in got.items():
        d, t = key
        assert r.cell == pytest.approx(cells[key], abs=1e-6)
        assert r.row_effect == pytest.approx(row_eff[d], abs=2e-6)
        assert r.col_effect == pytest.approx(col_eff[t], abs=2e-6)
        assert r.residual == pytest.approx(resid[key], abs=3e-6)
        # additive decomposition reconstructs the cell exactly
        assert (r.row_effect + r.col_effect + r.residual
                == pytest.approx(r.cell, abs=5e-6))
    # the final sweep was over columns, so column residual medians are 0
    for t in types:
        assert med([got[(d, t)].residual for d in dows]) == pytest.approx(
            0.0, abs=2e-6)
