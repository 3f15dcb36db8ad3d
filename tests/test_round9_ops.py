"""Invariant tests for the round-9 additions: Mann-Kendall trend,
turning-point randomness, spectral entropy, Cliff's delta, the Fisher
permutation test, the Lorenz curve, exact distributed quantiles, Chao1
+ Good-Turing vocabulary richness, the Heaps'-law fit, and the DKW
ECDF band — each re-derived independently in numpy / pure python on
planted or real data and compared against the Spark output (the
oracle-parity gate covers the SQL twins; these pin the math itself)."""

import hashlib
import math

import numpy as np
import pandas as pd

from qrapids_forecast_r_script_spark.sources import load_table
from tests.test_round7_ops import _planted_metrics, _series


def _days(n, start="2024-01-01"):
    return pd.date_range(start, periods=n)


def _frame(name, values, start="2024-01-01"):
    return pd.DataFrame({"name": name, "index": "t",
                         "evaluationDate": _days(len(values), start),
                         "value": np.round(np.asarray(values, float), 6)})


def _round_half_up(x, dp):
    """Spark/DuckDB ``round`` (half away from zero) — python's builtin
    is banker's and would diverge on .5 boundaries."""
    x = np.asarray(x, float)
    s = np.sign(x)
    return s * np.floor(np.abs(x) * 10.0 ** dp + 0.5) / 10.0 ** dp


def _md5_bit(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 2


def _events_pdf(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
# series_mann_kendall


def _mk_brute(y):
    y = np.asarray(y, float)
    n = len(y)
    s = 0
    for i in range(n):
        s += int(np.sign(y[i + 1:] - y[i]).sum())
    _, counts = np.unique(y, return_counts=True)
    tie = sum(int(t) * (t - 1) * (2 * t + 5) for t in counts if t > 1)
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    if s > 0:
        z = (s - 1) / math.sqrt(var)
    elif s < 0:
        z = (s + 1) / math.sqrt(var)
    else:
        z = 0.0
    return s, var, z


def test_mann_kendall_matches_bruteforce(spark, sf_dir):
    import qrapids_forecast_r_script_spark.forecast.queries as fq
    rows = {r.name: r
            for r in fq.series_mann_kendall(spark, sf_dir).collect()}
    for name, y in _series(spark, sf_dir).items():
        s, var, z = _mk_brute(y)
        r = rows[name]
        assert r.s_stat == s
        assert r.n_obs == len(y)
        assert abs(r.var_s - var) < 1e-5
        assert abs(r.z_stat - z) < 1e-5
        assert r.trend_detected == (abs(z) > 1.959964)


def test_mann_kendall_monotone_and_constant(spark):
    """A strictly increasing series has S = n(n-1)/2 and a detected
    trend; a perfectly constant series is ALL ties: S = 0, Var(S) = 0,
    and the zero-S branch must return z = 0 without dividing (the
    division-by-zero edge both engines guard identically)."""
    import qrapids_forecast_r_script_spark.forecast.queries as fq
    n = 30
    frames = [_frame("up", np.arange(n, dtype=float)),
              _frame("flat", np.full(n, 5.0))]
    with _planted_metrics(spark, pd.concat(frames)):
        out = {r.name: r for r in
               fq.series_mann_kendall(spark, "unused").collect()}
    assert out["up"].s_stat == n * (n - 1) // 2
    assert out["up"].trend_detected
    assert out["flat"].s_stat == 0
    assert out["flat"].var_s == 0.0
    assert out["flat"].z_stat == 0.0
    assert not out["flat"].trend_detected


# ---------------------------------------------------------------------------
# series_turning_points


def _tp_brute(y):
    y = np.asarray(y, float)
    d = np.diff(y)
    t = int(np.sum(d[:-1] * d[1:] < 0))
    n = len(y)
    e = 2.0 * (n - 2) / 3.0
    z = (t - e) / math.sqrt((16.0 * n - 29) / 90.0)
    return t, e, z


def test_turning_points_match_bruteforce(spark, sf_dir):
    import qrapids_forecast_r_script_spark.forecast.queries as fq
    rows = {r.name: r
            for r in fq.series_turning_points(spark, sf_dir).collect()}
    for name, y in _series(spark, sf_dir).items():
        t, e, z = _tp_brute(y)
        r = rows[name]
        assert r.t_count == t
        assert abs(r.expected_t - e) < 1e-6
        assert abs(r.z_stat - z) < 1e-5
        assert r.nonrandom == (abs(z) > 1.959964)


def test_turning_points_alternation_and_trend(spark):
    """A strict alternation turns at EVERY interior point (T = n-2,
    z >> 0 — the over-differencing read); a monotone ramp never turns
    (T = 0, z << 0); iid noise sits inside the band."""
    import qrapids_forecast_r_script_spark.forecast.queries as fq
    rng = np.random.RandomState(11)
    n = 60
    frames = [_frame("alt", np.where(np.arange(n) % 2 == 0, 0.0, 1.0)),
              _frame("ramp", np.arange(n, dtype=float)),
              _frame("iid", rng.normal(0, 1, n))]
    with _planted_metrics(spark, pd.concat(frames)):
        out = {r.name: r for r in
               fq.series_turning_points(spark, "unused").collect()}
    assert out["alt"].t_count == n - 2
    assert out["alt"].z_stat > 1.959964 and out["alt"].nonrandom
    assert out["ramp"].t_count == 0
    assert out["ramp"].z_stat < -1.959964 and out["ramp"].nonrandom
    assert not out["iid"].nonrandom


# ---------------------------------------------------------------------------
# series_spectral_entropy


def _spectral_entropy_brute(dates, values):
    """Replicate the engine's snapped-periodogram entropy exactly
    (6dp term snap, 2dp power snap, centiunit integers, 1e-6
    micro-unit entropy terms)."""
    t = np.array([(d - dates.min()).days for d in dates], float)
    v = np.asarray(values, float)
    pw = {}
    for p in range(2, 15):
        ang = 2.0 * math.pi * t / p
        sc = _round_half_up(v * np.cos(ang), 6).sum()
        ss = _round_half_up(v * np.sin(ang), 6).sum()
        pw[p] = int(_round_half_up(
            _round_half_up(sc * sc + ss * ss, 2) * 100, 0))
    tot = sum(pw.values())
    h_u = 0
    for c in pw.values():
        if c > 0:
            share = c / tot
            h_u += int(_round_half_up(-share * math.log(share) * 1e6, 0))
    ent = h_u / 1e6
    return ent, ent / math.log(len(pw))


def test_spectral_entropy_matches_bruteforce(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.spectral import (
        series_spectral_entropy)
    from qrapids_forecast_r_script_spark.sources.registry import (
        events_as_metrics)
    rows = {r.name: r
            for r in series_spectral_entropy(spark, sf_dir).collect()}
    by = {}
    for r in events_as_metrics(load_table(spark, sf_dir, "events")) \
            .collect():
        by.setdefault(r.name, []).append((r.evaluationDate, r.value))
    for name, pts in by.items():
        pts.sort()
        dates = pd.Series([d for d, _ in pts])
        vals = [v for _, v in pts]
        ent, norm = _spectral_entropy_brute(dates, vals)
        r = rows[name]
        assert abs(r.entropy - ent) < 2e-6
        assert abs(r.entropy_norm - norm) < 2e-6
        assert -1e-9 <= r.entropy_norm <= 1.0 + 1e-9
        assert abs(r.forecastability - (1.0 - r.entropy_norm)) < 2e-6


def test_spectral_entropy_tone_vs_noise(spark, monkeypatch):
    """A pure weekly tone concentrates the periodogram (low entropy =
    forecastable); white noise spreads it (high entropy) — the
    method-routing contract the feature exists for."""
    import qrapids_forecast_r_script_spark.operators.spectral as sp
    from pyspark.sql import functions as F
    rng = np.random.RandomState(5)
    n = 98
    tone = np.sin(2 * math.pi * np.arange(n) / 7.0)
    noise = rng.normal(0, 1, n)
    pdf = pd.concat([_frame("tone", tone), _frame("noise", noise)])
    sdf = spark.createDataFrame(pdf).select(
        "name", F.col("evaluationDate").cast("date").alias(
            "evaluationDate"), "value")
    monkeypatch.setattr(sp, "load_table", lambda s, d, t: None)
    monkeypatch.setattr(sp, "events_as_metrics", lambda df: sdf)
    out = {r.name: r
           for r in sp.series_spectral_entropy(spark, "unused").collect()}
    assert out["tone"].entropy_norm < 0.5
    assert out["noise"].entropy_norm > 0.5
    assert out["tone"].forecastability > out["noise"].forecastability


# ---------------------------------------------------------------------------
# ab_cliffs_delta


def _user_cents_arms(sf_dir):
    ev = _events_pdf(sf_dir)
    cents = pd.Series(0, index=sorted(ev.user_id.unique()), dtype=object)
    purch = ev[ev.event_type == "purchase"]
    for uid, grp in purch.groupby("user_id"):
        cents[uid] = int(_round_half_up(grp.value * 100, 0).sum())
    arms = {uid: _md5_bit(str(uid)) for uid in cents.index}
    a = np.array([c for uid, c in cents.items() if arms[uid] == 0])
    b = np.array([c for uid, c in cents.items() if arms[uid] == 1])
    return a, b


def test_cliffs_delta_matches_pairwise_bruteforce(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import ab_cliffs_delta
    r = ab_cliffs_delta(spark, sf_dir).collect()[0]
    a, b = _user_cents_arms(sf_dir)
    assert (r.n_a, r.n_b) == (len(a), len(b))
    gt = sum(int((av > b).sum()) for av in a)
    lt = sum(int((av < b).sum()) for av in a)
    delta = (gt - lt) / (len(a) * len(b))
    assert abs(r.cliffs_delta - delta) < 1e-6
    bands = [(0.147, "negligible"), (0.33, "small"), (0.474, "medium"),
             (float("inf"), "large")]
    expect = next(lab for cut, lab in bands if abs(delta) < cut)
    assert r.magnitude == expect


# ---------------------------------------------------------------------------
# ab_permutation_test


def test_permutation_test_matches_replay(spark, sf_dir):
    """Replays the deterministic md5 sign-flips in pure python: the
    daily arm-difference vector, all 200 replicate statistics, the
    exceedance count and the add-one p-value must agree exactly."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import ab_permutation_test, _PERM_B
    r = ab_permutation_test(spark, sf_dir).collect()[0]
    ev = _events_pdf(sf_dir)
    purch = ev[ev.event_type == "purchase"].copy()
    purch["d"] = purch.ts.dt.date
    purch["cents"] = _round_half_up(purch.value * 100, 0).astype("int64")
    purch["arm"] = purch.user_id.map(lambda u: _md5_bit(str(u)))
    daily = (purch.groupby("d")
             .apply(lambda g: int(g[g.arm == 0].cents.sum())
                    - int(g[g.arm == 1].cents.sum()),
                    include_groups=False))
    t_obs = int(daily.sum())
    assert r.n_days == len(daily)
    assert abs(r.obs_diff - _round_half_up(t_obs / 100.0, 2)) < 1e-9
    n_ge = 0
    for b in range(_PERM_B):
        t_b = sum((-dc if _md5_bit(f"{b}|{d}") else dc)
                  for d, dc in daily.items())
        if abs(t_b) >= abs(t_obs):
            n_ge += 1
    assert r.n_ge == n_ge
    p = (n_ge + 1) / (_PERM_B + 1)
    assert abs(r.p_value - _round_half_up(p, 6)) < 1e-9
    assert r.significant == (p < 0.05)
    assert 1.0 / (_PERM_B + 1) <= r.p_value <= 1.0


# ---------------------------------------------------------------------------
# customer_lorenz_curve


def test_lorenz_curve_matches_bruteforce_and_is_convex(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import customer_lorenz_curve, _LORENZ_BINS
    rows = customer_lorenz_curve(spark, sf_dir).collect()
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    orders["cents"] = _round_half_up(
        orders.o_totalprice * 100, 0).astype("int64")
    rev = (orders.groupby("o_custkey").cents.sum()
           .reset_index().sort_values(["cents", "o_custkey"]))
    n = len(rev)
    q, rem = divmod(n, _LORENZ_BINS)
    sizes = [q + 1 if i < rem else q for i in range(_LORENZ_BINS)]
    cum_n = cum_c = 0
    tot_c = int(rev.cents.sum())
    pos = 0
    prev_pop = prev_rev = 0.0
    for i, r in enumerate(rows):
        cum_n += sizes[i]
        cum_c += int(rev.cents.iloc[pos:pos + sizes[i]].sum())
        pos += sizes[i]
        assert r.ventile == i + 1
        assert r.n_customers == sizes[i]
        assert abs(r.cum_pop_share - cum_n / n) < 1e-6
        assert abs(r.cum_rev_share - cum_c / tot_c) < 1e-6
        # Lorenz geometry: below the diagonal, monotone in both axes
        assert r.cum_rev_share <= r.cum_pop_share + 1e-9
        assert r.cum_pop_share >= prev_pop and r.cum_rev_share >= prev_rev
        prev_pop, prev_rev = r.cum_pop_share, r.cum_rev_share
    assert abs(rows[-1].cum_pop_share - 1.0) < 1e-9
    assert abs(rows[-1].cum_rev_share - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# orders_exact_price_quantiles


def test_exact_price_quantiles_match_numpy_type7(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.relational_more \
        import orders_exact_price_quantiles, _PRICE_QS
    rows = {r.q: r.price_quantile
            for r in orders_exact_price_quantiles(spark, sf_dir).collect()}
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = np.sort(_round_half_up(
        orders.o_totalprice * 100, 0).astype("int64"))
    n = len(cents)
    for qq in _PRICE_QS:
        h = (n - 1) * qq + 1
        lo = cents[math.floor(h) - 1]
        hi = cents[math.ceil(h) - 1]
        val = (lo + (h - math.floor(h)) * (hi - lo)) / 100.0
        assert abs(rows[qq] - _round_half_up(val, 2)) < 1e-9
        # type-7 == numpy's default linear interpolation
        assert abs(rows[qq] - np.percentile(cents, qq * 100) / 100.0) < 0.02


# ---------------------------------------------------------------------------
# vocab_chao1_richness


def test_chao1_richness_matches_python_spectrum(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.text_quality \
        import vocab_chao1_richness
    r = vocab_chao1_richness(spark, sf_dir).collect()[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    from collections import Counter
    cnt = Counter()
    for text in docs.text:
        cnt.update(text.split(" "))
    v, n = len(cnt), sum(cnt.values())
    n1 = sum(1 for c in cnt.values() if c == 1)
    n2 = sum(1 for c in cnt.values() if c == 2)
    assert (r.v_types, r.n_tokens, r.n1, r.n2) == (v, n, n1, n2)
    unseen = n1 * (n1 - 1) / (2.0 * (n2 + 1))
    assert abs(r.chao1_richness - (v + unseen)) < 1e-5
    assert abs(r.unseen_types_est - unseen) < 1e-5
    assert abs(r.gt_unseen_mass - n1 / n) < 1e-6
    assert abs(r.gt_coverage - (1.0 - n1 / n)) < 1e-6
    assert r.chao1_richness >= r.v_types  # estimator never below V


# ---------------------------------------------------------------------------
# corpus_heaps_law


def test_heaps_law_matches_python_ols(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.curation \
        import corpus_heaps_law
    r = corpus_heaps_law(spark, sf_dir).collect()[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet") \
        .sort_values("doc_id")
    seen: set[str] = set()
    cum_tok = cum_typ = 0
    xs, ys = [], []
    for text in docs.text:
        toks = text.split(" ")
        cum_tok += len(toks)
        for t in toks:
            if t not in seen:
                seen.add(t)
                cum_typ += 1
        if cum_tok > 0 and cum_typ > 0:
            xs.append(int(_round_half_up(math.log(cum_tok) * 1e6, 0)))
            ys.append(int(_round_half_up(math.log(cum_typ) * 1e6, 0)))
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    syy = sum(y * y for y in ys)
    num = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    beta = num / denx
    k = math.exp((sy - beta * sx) / n / 1e6)
    r2 = num * num / (denx * deny)
    assert r.n_docs == n
    assert abs(r.heaps_beta - beta) < 2e-6
    assert abs(r.heaps_k - k) < 1e-3
    assert abs(r.r_squared - r2) < 2e-6
    # sanity: sublinear growth, r² a valid share.  (The synthetic
    # corpus draws from a SMALL fixed vocabulary, so it saturates
    # almost immediately — β ≈ 0.007, r² ≈ 0.08 here: exactly the
    # "more crawl buys only repetition" reading the operator exists to
    # surface, not a natural-text β ≈ 0.5.)
    assert 0.0 <= r.heaps_beta < 1.0
    assert 0.0 <= r.r_squared <= 1.0


# ---------------------------------------------------------------------------
# events_dkw_ecdf_band


def test_dkw_band_matches_formula_and_percentiles(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.data_quality \
        import events_dkw_ecdf_band, _DKW_ALPHA_TERM
    ev = _events_pdf(sf_dir)
    out = events_dkw_ecdf_band(spark, sf_dir).collect()
    assert abs(_DKW_ALPHA_TERM - math.log(2 / 0.05)) < 1e-12
    by_type: dict[str, list] = {}
    for r in out:
        by_type.setdefault(r.event_type, []).append(r)
    assert set(by_type) == set(ev.event_type.unique())
    for etype, rows in by_type.items():
        vals = ev[ev.event_type == etype].value.values
        n = len(vals)
        eps = math.sqrt(_DKW_ALPHA_TERM / (2.0 * n))
        assert len(rows) == 9
        prev = -math.inf
        for r in rows:
            assert r.n_events == n
            assert abs(r.dkw_eps - eps) < 1e-6
            assert abs(r.cdf_lower - max(r.p - eps, 0.0)) < 2e-6
            assert abs(r.cdf_upper - min(r.p + eps, 1.0)) < 2e-6
            # type-7 decile == numpy linear percentile
            assert abs(r.value_at_p
                       - np.percentile(vals, r.p * 100)) < 1.5e-4
            assert r.value_at_p >= prev  # deciles are non-decreasing
            prev = r.value_at_p
