"""Round-4 continuation batch 17: semantic tests for isotonic
calibration (minimax closed form vs textbook PAV), the cumulative
gains/lift table, IPS/SNIPS off-policy evaluation, and quantile
normalization.  Oracle parity is auto-covered by test_oracle_parity;
these pin the definitions brute-force.
"""

import math

import pytest

from pyspark.sql import functions as F


def _nb_scored(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.training_prep import (
        nb_quality_classifier)
    return nb_quality_classifier(spark, sf_dir).collect()


def _decile_bins(spark, sf_dir, descending=False):
    """(n_k, pos_k) per decile, replicating the ntile cut in Python."""
    rows = sorted(((round(r.nb_score * 1_000_000), r.doc_id,
                    1 if r.lang == "en" else 0)
                   for r in _nb_scored(spark, sf_dir)),
                  key=lambda t: ((-t[0], t[1]) if descending
                                 else (t[0], t[1])))
    n = len(rows)
    bins = []
    base, rem = divmod(n, 10)
    start = 0
    for k in range(10):
        size = base + (1 if k < rem else 0)
        chunk = rows[start:start + size]
        bins.append((len(chunk), sum(y for _, _, y in chunk)))
        start += size
    return bins


# --------------------------------------------------- isotonic / PAV

def _pav(values, weights):
    """Textbook pool-adjacent-violators (stack form); returns one
    fitted value per input BIN (merged blocks repeat their mean once
    per bin they absorbed)."""
    out = []
    for v, w in zip(values, weights):
        out.append([v * w, w, 1])
        while len(out) > 1 and (out[-2][0] / out[-2][1]
                                > out[-1][0] / out[-1][1]):
            s, w2, c = out.pop()
            out[-1][0] += s
            out[-1][1] += w2
            out[-1][2] += c
    fit = []
    for s, w, c in out:
        fit.extend([s / w] * c)
    return fit


def test_isotonic_equals_textbook_pav(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.training_prep import (
        isotonic_calibration_map)
    got = sorted(isotonic_calibration_map(spark, sf_dir).collect(),
                 key=lambda r: r.bin)
    bins = _decile_bins(spark, sf_dir)
    raw = [p / n for n, p in bins]
    # PAV on per-bin rates weighted by bin size (expand per-bin)
    fit = _pav(raw, [n for n, _ in bins])
    assert len(got) == 10
    for r, expect_raw, expect_iso in zip(got, raw, fit):
        assert r.raw_rate == pytest.approx(expect_raw, abs=1e-6)
        assert r.iso_rate == pytest.approx(expect_iso, abs=1e-6)
    # monotone, and weighted-mean preserving (PAV invariants)
    isos = [r.iso_rate for r in got]
    assert all(a <= b + 1e-9 for a, b in zip(isos, isos[1:]))
    tot_raw = sum(n * v for (n, _), v in zip(bins, raw))
    tot_iso = sum(n * v for (n, _), v in zip(bins, isos))
    assert tot_iso == pytest.approx(tot_raw, rel=1e-4)


# ------------------------------------------------- cumulative gains

def test_cumulative_gain_curve_bruteforce(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.training_prep import (
        cumulative_gain_curve)
    got = sorted(cumulative_gain_curve(spark, sf_dir).collect(),
                 key=lambda r: r.decile)
    bins = _decile_bins(spark, sf_dir, descending=True)
    n_tot = sum(n for n, _ in bins)
    p_tot = sum(p for _, p in bins)
    cn = cp = 0
    for r, (n_k, p_k) in zip(got, bins):
        cn += n_k
        cp += p_k
        assert r.n_k == n_k and r.pos_k == p_k
        assert r.cum_capture == pytest.approx(cp / p_tot, abs=1e-6)
        assert r.lift == pytest.approx((cp / cn) / (p_tot / n_tot),
                                       abs=1e-5)
    assert got[-1].cum_capture == pytest.approx(1.0, abs=1e-9)
    # a working ranking concentrates positives up front
    assert got[0].lift >= got[-1].lift


# ------------------------------------------------------- IPS / SNIPS

def test_ips_policy_value_bruteforce(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.product_analytics import (
        ips_policy_value)
    from qrapids_forecast_r_script_spark.sources import load_table
    import hashlib
    got = {r.policy: r for r in ips_policy_value(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events") \
        .select("user_id", "event_type", "value").collect()
    logs = [(e.user_id, e.event_type, round(e.value * 100)) for e in ev]
    arms = sorted({a for _, a, _ in logs})
    c = {a: sum(1 for _, x, _ in logs if x == a) for a in arms}
    s = {a: sum(r for _, x, r in logs if x == a) for a in arms}
    n = len(logs)
    greedy = max(arms, key=lambda a: (round(s[a] / c[a] * 1e9), ))
    ties = [a for a in arms if round(s[a] / c[a] * 1e9)
            == round(s[greedy] / c[greedy] * 1e9)]
    greedy = min(ties)

    def pi_hash(u):
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16)
        return arms[h % len(arms)]

    for policy, pi in (("global_greedy", lambda u: greedy),
                       ("uniform_hash", pi_hash)):
        matched = [(a, r) for u, a, r in logs if a == pi(u)]
        w = [n / c[a] for a, _ in matched]
        wr = [n / c[a] * r for a, r in matched]
        ips = sum(wr) / n / 100.0
        snips = sum(wr) / sum(w) / 100.0
        ess = sum(w) ** 2 / sum(x * x for x in w)
        row = got[policy]
        assert row.n_matched == len(matched)
        assert row.ips_value == pytest.approx(ips, abs=1e-3)
        assert row.snips_value == pytest.approx(snips, abs=1e-3)
        assert row.effective_sample_size == pytest.approx(ess, rel=1e-4)
        assert row.effective_sample_size <= n + 1e-9


def test_ips_uniform_hash_near_logged_mean(spark, sf_dir):
    """The hash spreader is statistically the logged policy itself, so
    its SNIPS value should land near the overall logged mean value."""
    from qrapids_forecast_r_script_spark.operators.product_analytics import (
        ips_policy_value)
    from qrapids_forecast_r_script_spark.sources import load_table
    row = {r.policy: r
           for r in ips_policy_value(spark, sf_dir).collect()}["uniform_hash"]
    mean = load_table(spark, sf_dir, "events") \
        .agg(F.avg("value")).collect()[0][0]
    assert row.snips_value == pytest.approx(mean, rel=0.35)


# ------------------------------------------- quantile normalization

def test_quantile_normalization_bruteforce(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.curation import (
        quantile_normalization_map, _QN_BINS)
    from qrapids_forecast_r_script_spark.sources import load_table
    got = {(r.source, r.bucket): r
           for r in quantile_normalization_map(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "source", "n_chars").collect()

    def ntile_chunks(rows, k):
        rows = sorted(rows, key=lambda t: (t[1], t[0]))
        nn = len(rows)
        base, rem = divmod(nn, k)
        out, start = [], 0
        for i in range(k):
            size = base + (1 if i < rem else 0)
            out.append(rows[start:start + size])
            start += size
        return out

    allrows = [(d.doc_id, d.n_chars) for d in docs]
    ref = {i + 1: sum(c for _, c in chunk) / len(chunk)
           for i, chunk in enumerate(ntile_chunks(allrows, _QN_BINS))
           if chunk}
    sources = {d.source for d in docs}
    for src in sources:
        rows = [(d.doc_id, d.n_chars) for d in docs if d.source == src]
        for i, chunk in enumerate(ntile_chunks(rows, _QN_BINS)):
            if not chunk:
                continue
            r = got[(src, i + 1)]
            obs = sum(c for _, c in chunk) / len(chunk)
            assert r.n_docs == len(chunk)
            assert r.observed_mean == pytest.approx(obs, abs=1e-4)
            assert r.target_mean == pytest.approx(ref[i + 1], abs=1e-4)
            assert r.shift == pytest.approx(ref[i + 1] - obs, abs=2e-4)
