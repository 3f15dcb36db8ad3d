"""Invariant tests for the round-7 forecast-evaluation additions
(`forecast/queries.py`): MASE, the Diebold-Mariano test, Ljung-Box,
and the Durbin-Levinson PACF — each re-derived independently in
numpy from the raw metric series and compared against the Spark
output (the oracle parity gate covers the SQL twin; these pin the
math itself)."""

from contextlib import contextmanager

import numpy as np

from qrapids_forecast_r_script_spark.forecast.queries import (
    _LB_LAGS,
    forecast_dm_test,
    forecast_mase_scores,
    series_ljung_box,
    series_pacf,
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


@contextmanager
def _planted_metrics(spark, pdf):
    """Route ``fq._metrics`` at a synthetic (name, index,
    evaluationDate, value) pandas frame for the duration of the block —
    the shared plant-a-series scaffold (was copy-pasted per test)."""
    import qrapids_forecast_r_script_spark.forecast.queries as fq
    sdf = spark.createDataFrame(pdf)
    orig = fq._metrics
    fq._metrics = lambda s, d: sdf.select(
        "name", "index",
        sdf.evaluationDate.cast("date").alias("evaluationDate"), "value")
    try:
        yield
    finally:
        fq._metrics = orig


def _closed_form_preds(y):
    """Holdout predictions for the four closed forms, mirroring
    `_holdout_preds` (train = y[:-7], holdout = y[-7:])."""
    train, hold = y[:-7], y[-7:]
    n_train = len(train)
    preds = {
        "MEAN": np.full(7, train.mean()),
        "NAIVE": np.full(7, train[-1]),
        "SNAIVE": y[-14:-7] if len(y) >= 14 else np.full(7, np.nan),
        "DRIFT": (train[-1]
                  + np.arange(1, 8) * (train[-1] - train[0])
                  / (n_train - 1)) if n_train > 1
                 else np.full(7, np.nan),
    }
    return hold, preds


def test_mase_matches_numpy(spark, sf_dir):
    by = _series(spark, sf_dir)
    rows = {(r.name, r.method): r
            for r in forecast_mase_scores(spark, sf_dir).collect()}
    assert {n for n, _ in rows} == set(by)
    for name, y in by.items():
        train = y[:-7]
        diffs = np.abs(train[7:] - train[:-7])
        assert diffs.size, name
        scale = round(float(diffs.mean()), 6)
        hold, preds = _closed_form_preds(y)
        for method, p in preds.items():
            r = rows[(name, method)]
            errs = np.abs(hold - p)
            errs = errs[~np.isnan(errs)]
            assert r.n_scored == len(errs)
            mae = round(float(errs.mean()), 6) if len(errs) else None
            if mae is None:
                assert r.mase is None
                continue
            assert abs(r.mae - mae) < 1e-6, (name, method)
            assert abs(r.snaive_insample_mae - scale) < 1e-6
            expect = round(mae / scale, 6) if scale else None
            if expect is None:
                assert r.mase is None
            else:
                assert abs(r.mase - expect) < 1e-6
                assert r.beats_snaive_insample == (expect < 1.0)


def test_dm_test_matches_numpy_and_sign_convention(spark, sf_dir):
    by = _series(spark, sf_dir)
    rows = {r.name: r for r in forecast_dm_test(spark, sf_dir).collect()}
    # only series where both NAIVE and SNAIVE predict appear
    for name, y in by.items():
        if len(y) < 14:
            assert name not in rows
            continue
        r = rows[name]
        hold, preds = _closed_form_preds(y)
        d = (hold - preds["NAIVE"]) ** 2 - (hold - preds["SNAIVE"]) ** 2
        assert r.n_points == 7
        dbar = d.mean()
        s2 = ((d - dbar) ** 2).mean()
        # the operator snaps d at 1e-6 and deviations at 1e-3 — allow
        # the grid slack on the reconstructed statistic
        assert abs(r.mean_loss_diff - dbar) < 1e-5, name
        if s2 == 0:
            assert r.dm_stat is None
            assert r.lower_loss_method == "TIE"
            continue
        dm = dbar / np.sqrt(s2 / 7)
        assert abs(r.dm_stat - dm) < 1e-3, (name, r.dm_stat, dm)
        assert r.significant == (abs(r.dm_stat) > 1.96)
        if r.dm_stat > 0:
            assert r.lower_loss_method == "SNAIVE"
        elif r.dm_stat < 0:
            assert r.lower_loss_method == "NAIVE"


def _acf(y, k):
    mu = y.mean()
    d = y - mu
    return round(float((d[k:] * d[:-k]).sum() / (d * d).sum()), 6)


def test_ljung_box_matches_numpy(spark, sf_dir):
    by = _series(spark, sf_dir)
    rows = {r.name: r for r in series_ljung_box(spark, sf_dir).collect()}
    assert set(rows) == set(by)
    for name, y in by.items():
        r = rows[name]
        n = len(y)
        assert r.n_points == n and r.lags == _LB_LAGS
        q = n * (n + 2) * sum(_acf(y, k) ** 2 / (n - k)
                              for k in range(1, _LB_LAGS + 1))
        assert abs(r.q_stat - q) < 1e-4, (name, r.q_stat, q)
        assert r.reject_white_noise == (r.q_stat > r.chi2_crit_5pct)


def test_ljung_box_white_noise_accepts(spark):
    """A seeded iid series must NOT reject white noise; a strongly
    autocorrelated one must."""
    rng = np.random.RandomState(7)
    import pandas as pd
    days = pd.date_range("2024-01-01", periods=120)
    wn = rng.normal(0, 1, 120)
    ar = np.cumsum(rng.normal(0, 1, 120))  # random walk: massive ACF
    pdf = pd.concat([
        pd.DataFrame({"name": "wn", "index": "t", "evaluationDate": days,
                      "value": np.round(wn, 6)}),
        pd.DataFrame({"name": "ar", "index": "t", "evaluationDate": days,
                      "value": np.round(ar, 6)}),
    ])
    with _planted_metrics(spark, pdf):
        out = {r.name: r for r in series_ljung_box(spark, "unused")
               .collect()}
    assert not out["wn"].reject_white_noise
    assert out["ar"].reject_white_noise


def test_pacf_matches_yule_walker_solve(spark, sf_dir):
    """Durbin-Levinson output must equal the direct Yule-Walker
    Toeplitz solve at every lag — the textbook equivalence that
    proves the unrolled recursion."""
    by = _series(spark, sf_dir)
    rows = {}
    for r in series_pacf(spark, sf_dir).collect():
        rows.setdefault(r.name, {})[r.lag] = r
    assert set(rows) == set(by)
    for name, y in by.items():
        rho = np.array([1.0] + [_acf(y, k)
                                for k in range(1, _LB_LAGS + 1)])
        for k in range(1, _LB_LAGS + 1):
            toep = np.array([[rho[abs(i - j)] for j in range(k)]
                             for i in range(k)])
            phi = np.linalg.solve(toep, rho[1:k + 1])
            r = rows[name][k]
            assert abs(r.pacf - phi[-1]) < 1e-5, (name, k)
            assert r.significant == (abs(r.pacf) > r.wn_band)
    # lag 1: PACF == ACF by definition
    for name, y in by.items():
        assert abs(rows[name][1].pacf - _acf(y, 1)) < 1e-6


# ---------------------------------------------------------------------------
# phonetic_token_groups: the oracle's relational soundex must replay
# Spark's built-in exactly — over the NARA golden words AND the whole
# corpus vocabulary (the surface the driver hash actually covers).

_NARA_GOLDENS = {
    "Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
    "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
    "Honeyman": "H555", "Lloyd": "L300", "Washington": "W252",
    "Lee": "L000", "Gutierrez": "G362", "Jackson": "J250",
    # H/W-first edges: the kept-following-consonant rule
    "WB": "W100", "HB": "H100", "WH": "W000", "Hough": "H200",
    "Wachs": "W200",   # C-H-S: the H/W rule bridges the 2-9-2 run
    "Schmit": "S530", "Exzzle": "E240",
}


def _duckdb_soundex(words):
    import duckdb
    from qrapids_forecast_r_script_spark.operators.linkage import (
        _SOUNDEX_COLLAPSE, _SOUNDEX_TR)
    con = duckdb.connect()
    con.execute("CREATE TABLE w(tok VARCHAR)")
    con.executemany("INSERT INTO w VALUES (?)", [(t,) for t in words])
    rows = con.sql(f"""
        WITH up AS (SELECT tok, upper(tok) AS u FROM w),
        c1 AS (SELECT tok, u,
                      replace(translate(u, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                        '{_SOUNDEX_TR}'), '9', '') AS s1
               FROM up),
        c2 AS (SELECT tok, u, {_SOUNDEX_COLLAPSE} AS s2 FROM c1)
        SELECT tok,
               substr(u, 1, 1)
               || substr(replace(CASE WHEN substr(u, 1, 1) IN ('H', 'W')
                                      THEN s2 ELSE substr(s2, 2) END,
                                 '0', '') || '000', 1, 3)
        FROM c2
    """).fetchall()
    return dict(rows)


def test_sql_soundex_matches_nara_goldens():
    got = _duckdb_soundex(list(_NARA_GOLDENS))
    assert got == _NARA_GOLDENS


def test_sql_soundex_matches_spark_over_corpus_vocab(spark, sf_dir):
    from pyspark.sql import functions as F
    docs = load_table(spark, sf_dir, "documents")
    vocab = [r.tok for r in
             docs.select(F.explode(F.split("text", " ")).alias("tok"))
             .where(F.col("tok").rlike("^[A-Za-z]+$"))
             .distinct().collect()]
    assert vocab
    sdf = spark.createDataFrame([(t,) for t in vocab], "tok string")
    spark_codes = {r.tok: r.code for r in
                   sdf.select("tok", F.soundex(F.upper("tok"))
                              .alias("code")).collect()}
    sql_codes = _duckdb_soundex(vocab)
    assert spark_codes == sql_codes


# ---------------------------------------------------------------------------
# granger_lag1_purchases + retrieval_mrr_eval

def _pearson(a, b):
    a = a - a.mean()
    b = b - b.mean()
    den = np.sqrt((a * a).mean() * (b * b).mean())
    return float((a * b).mean() / den) if den else None


def test_granger_matches_numpy_partial_corr(spark, sf_dir):
    from qrapids_forecast_r_script_spark.forecast.queries import (
        _XC_REF, granger_lag1_purchases)
    by = {}
    for r in events_as_metrics(load_table(spark, sf_dir, "events")) \
            .collect():
        by.setdefault(r.name, {})[r.evaluationDate] = r.value
    rows = {r.name: r
            for r in granger_lag1_purchases(spark, sf_dir).collect()}
    assert set(rows) == set(by) - {_XC_REF}
    import datetime
    ref = by[_XC_REF]
    ref_days = sorted(ref)
    for name, r in rows.items():
        ys, zs, xs = [], [], []
        for i in range(1, len(ref_days)):
            d, dprev = ref_days[i], ref_days[i - 1]
            xd = d - datetime.timedelta(days=1)
            if xd in by[name]:
                ys.append(ref[d])
                zs.append(ref[dprev])
                xs.append(by[name][xd])
        y, z, x = map(np.array, (ys, zs, xs))
        assert r.n_points == len(y), name
        r_yx, r_yz, r_xz = (_pearson(y, x), _pearson(y, z),
                            _pearson(x, z))
        assert abs(r.r_yx - r_yx) < 1e-5
        assert abs(r.r_yz - r_yz) < 1e-5
        assert abs(r.r_xz - r_xz) < 1e-5
        rp = ((r_yx - r_yz * r_xz)
              / np.sqrt((1 - r_yz ** 2) * (1 - r_xz ** 2)))
        assert abs(r.r_partial - rp) < 1e-4, name
        zstat = np.arctanh(rp) * np.sqrt(len(y) - 4)
        assert abs(r.fisher_z - zstat) < 1e-3, name
        assert r.granger_causes_purchases == (abs(r.fisher_z) > 1.96)


def test_granger_detects_planted_lag1_signal(spark):
    """A metric that IS yesterday's driver of the target must flag; an
    independent-noise metric must not."""
    import pandas as pd
    import qrapids_forecast_r_script_spark.forecast.queries as fq
    rng = np.random.RandomState(11)
    n = 200
    days = pd.date_range("2024-01-01", periods=n)
    driver = rng.normal(0, 1, n)
    noise = rng.normal(0, 1, n)
    # purchase_t = 0.9 * driver_{t-1} + small noise
    purchase = np.zeros(n)
    purchase[1:] = 0.9 * driver[:-1] + 0.1 * rng.normal(0, 1, n - 1)
    frames = []
    for nm, v in [("purchase", purchase), ("driver", driver),
                  ("noise", noise)]:
        frames.append(pd.DataFrame(
            {"name": nm, "index": "t", "evaluationDate": days,
             "value": np.round(v, 6)}))
    with _planted_metrics(spark, pd.concat(frames)):
        out = {r.name: r
               for r in fq.granger_lag1_purchases(spark, "unused")
               .collect()}
    assert out["driver"].granger_causes_purchases
    assert not out["noise"].granger_causes_purchases


def test_mrr_internal_consistency(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.similarity import (
        cosine_topk_bruteforce, retrieval_mrr_eval)
    rows = retrieval_mrr_eval(spark, sf_dir).collect()
    assert rows
    bf1 = {r.query_id: r.neighbor_id
           for r in cosine_topk_bruteforce(spark, sf_dir).collect()
           if r.rank == 1}
    rrs = []
    for r in rows:
        assert r.target_id == bf1[r.query_id]
        if r.ann_rank is None:
            assert r.rr == 0.0
        else:
            assert abs(r.rr - 1.0 / r.ann_rank) < 1e-9
        rrs.append(r.rr)
        assert r.n_queries == len(rows)
    mrr = round(sum(round(v * 1e9) for v in rrs) / 1e9 / len(rows), 6)
    assert abs(rows[0].mrr - mrr) < 1e-9
    assert rows[0].n_hits == sum(1 for r in rows if r.ann_rank is not None)
    # the PQ index finds the exact top-1 early for most queries
    assert rows[0].mrr > 0.5


def test_kruskal_wallis_matches_numpy(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.product_analytics import (
        _CHI2_95, kruskal_wallis_values)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice").collect()
    cust = {r.c_custkey: r.c_nationkey
            for r in load_table(spark, sf_dir, "customer").collect()}
    by = {}
    allv = []
    for r in orders:
        yc = round(float(r.o_totalprice) * 100)
        by.setdefault(cust[r.o_custkey], []).append(yc)
        allv.append(yc)
    # average ranks via numpy (1-based, ties averaged)
    import collections
    allv = np.array(allv)
    order = np.argsort(allv, kind="mergesort")
    ranks = np.empty(len(allv))
    sorted_v = allv[order]
    i = 0
    while i < len(allv):
        j = i
        while j < len(allv) and sorted_v[j] == sorted_v[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    rank_of = {}
    for v, rk in zip(allv, ranks):
        rank_of.setdefault(v, rk)
    n = len(allv)
    s = sum((sum(rank_of[v] for v in vs)) ** 2 / len(vs)
            for vs in by.values())
    h = 12.0 / (n * (n + 1)) * s - 3.0 * (n + 1)
    cnt = collections.Counter(allv)
    t = sum(c ** 3 - c for c in cnt.values())
    corr = 1.0 - t / (n ** 3 - n)
    row = kruskal_wallis_values(spark, sf_dir).collect()[0]
    assert row.k_groups == len(by)
    assert row.n_total == n
    assert abs(row.h_stat - h) < 1e-4, (row.h_stat, h)
    assert abs(row.tie_correction - corr) < 1e-9
    assert abs(row.h_stat_corrected - h / corr) < 1e-4
    assert 0 < row.tie_correction <= 1
    # crit follows the data's df: k groups -> chi2_0.95(k-1)
    assert row.chi2_crit_5pct == _CHI2_95[row.k_groups - 1]
    assert row.reject_homogeneity == (
        row.h_stat_corrected > row.chi2_crit_5pct)


# ---------------------------------------------------------------------------
# KPSS stationarity + the ndiffs/nsdiffs decision (r7 cont.)


def _numpy_kpss(y, maxlag=12):
    """Textbook float KPSS (level, Bartlett, urca lags='short') on the
    6dp-snapped series — the independent recomputation of the exact
    integer-ratio form the query computes."""
    y = np.round(np.asarray(y, float), 6)
    m = len(y)
    e = y - y.mean()
    s = np.cumsum(e)
    lag = min(int(np.floor(4.0 * (m / 100.0) ** 0.25)), m - 1, maxlag)
    lrv = float(e @ e)
    for j in range(1, lag + 1):
        lrv += 2.0 * (1.0 - j / (lag + 1.0)) * float(e[j:] @ e[:-j])
    if lrv == 0:
        return lag, None
    return lag, float((s @ s) / m ** 2 / (lrv / m))


def test_kpss_matches_numpy(spark, sf_dir):
    from qrapids_forecast_r_script_spark.forecast.queries import (
        series_kpss_test)
    by = _series(spark, sf_dir)
    rows = {r.name: r for r in series_kpss_test(spark, sf_dir).collect()}
    assert set(rows) == set(by)
    for name, y in by.items():
        lag, eta = _numpy_kpss(y)
        r = rows[name]
        assert r.lag_trunc == lag, name
        assert r.n_obs == len(y), name
        if eta is None:
            assert r.kpss_eta is None, name
            assert r.stationary
        else:
            assert abs(r.kpss_eta - eta) < 2e-6, (name, r.kpss_eta, eta)
            # the verdict is a function of the ENGINE's exact eta; only
            # recheck it against the float recomputation away from the
            # critical value, where the 2e-6 slack cannot flip the sign
            if abs(eta - 0.463) > 3e-6:
                assert r.stationary == (eta <= 0.463), name
            assert r.stationary == (r.kpss_eta <= 0.463), name


def test_kpss_flags_random_walk_not_white_noise(spark):
    """Plant the two textbook cases: white noise must accept level
    stationarity, a random walk must reject it (that rejection is what
    makes ndiffs difference the series)."""
    import pandas as pd
    import qrapids_forecast_r_script_spark.forecast.queries as fq
    rng = np.random.RandomState(7)
    n = 400
    days = pd.date_range("2024-01-01", periods=n)
    wn = rng.normal(0, 1, n)
    rw = np.cumsum(rng.normal(0, 1, n)) + 100
    frames = [pd.DataFrame({"name": nm, "index": "t",
                            "evaluationDate": days,
                            "value": np.round(v, 6)})
              for nm, v in [("wn", wn), ("rw", rw)]]
    with _planted_metrics(spark, pd.concat(frames)):
        out = {r.name: r
               for r in fq.series_kpss_test(spark, "unused").collect()}
        dec = {r.name: r
               for r in fq.series_ndiffs_nsdiffs(spark, "unused")
               .collect()}
    assert out["wn"].stationary
    assert not out["rw"].stationary
    # ndiffs: the random walk needs exactly one difference, the white
    # noise none
    assert dec["wn"].ndiffs == 0
    assert dec["rw"].ndiffs == 1


def test_kpss_lag_trunc_integer_cascade_is_exact():
    """25*l^4 <= 64*m is exactly floor(4*(m/100)^(1/4)) — the integer
    form can never flip on a libm last-ulp difference."""
    for m in range(1, 25001):
        exact = 0
        for j in range(1, 13):
            if 25 * j ** 4 <= 64 * m:
                exact = j
        exact = min(exact, m - 1)
        flt = min(int(np.floor(4.0 * (m / 100.0) ** 0.25)), m - 1, 12)
        assert exact == flt, m


def test_ndiffs_nsdiffs_row_consistency(spark, sf_dir):
    """The decision columns must be the documented functions of the
    component statistics, and the components must equal the standalone
    `series_kpss_test` / `series_decomposition_strength` outputs."""
    from qrapids_forecast_r_script_spark.forecast.queries import (
        series_decomposition_strength, series_kpss_test,
        series_ndiffs_nsdiffs)
    dec = {r.name: r
           for r in series_ndiffs_nsdiffs(spark, sf_dir).collect()}
    lvl = {r.name: r for r in series_kpss_test(spark, sf_dir).collect()}
    seas = {r.name: r
            for r in series_decomposition_strength(spark, sf_dir)
            .collect()}
    assert dec
    for name, r in dec.items():
        assert r.kpss_level == lvl[name].kpss_eta
        assert r.seasonal_strength == seas[name].seasonal_strength
        exp_nd = (0 if r.kpss_level is None or r.kpss_level <= 0.463
                  else (1 if r.kpss_diff1 is None
                        or r.kpss_diff1 <= 0.463 else 2))
        assert r.ndiffs == exp_nd
        assert r.nsdiffs == (
            1 if r.seasonal_strength is not None
            and r.seasonal_strength >= 0.64 else 0)


def test_kpss_degenerate_series_edges(spark):
    """Constant series: zero long-run variance -> eta NULL -> stationary
    (a constant IS stationary), ndiffs 0.  Two-point series: the d=1
    pass has one observation (e == 0) -> NULL as well; no crash, no
    spurious differencing."""
    import pandas as pd
    import qrapids_forecast_r_script_spark.forecast.queries as fq
    days = pd.date_range("2024-01-01", periods=50)
    frames = [
        pd.DataFrame({"name": "const", "index": "t",
                      "evaluationDate": days,
                      "value": np.full(50, 42.5)}),
        pd.DataFrame({"name": "two", "index": "t",
                      "evaluationDate": days[:2],
                      "value": np.array([1.0, 2.0])}),
    ]
    with _planted_metrics(spark, pd.concat(frames)):
        out = {r.name: r
               for r in fq.series_kpss_test(spark, "unused").collect()}
    assert out["const"].kpss_eta is None
    assert out["const"].stationary
    assert out["two"].n_obs == 2


def test_ndiffs_covers_short_series_with_null_seasonal(spark):
    """A series shorter than 7 points has no decomposition-strength row
    (no interior MA points), but its KPSS d-decision is computable —
    the LEFT join must keep it with seasonal_strength NULL and
    nsdiffs 0 (ADVICE r7 low #5; forecast::nsdiffs also returns 0
    when the seasonal fit is unavailable)."""
    import pandas as pd
    import qrapids_forecast_r_script_spark.forecast.queries as fq
    days = pd.date_range("2024-01-01", periods=60)
    rng = np.random.RandomState(11)
    frames = [
        pd.DataFrame({"name": "short", "index": "t",
                      "evaluationDate": days[:5],
                      "value": np.round(rng.normal(10, 1, 5), 6)}),
        pd.DataFrame({"name": "long", "index": "t",
                      "evaluationDate": days,
                      "value": np.round(rng.normal(10, 1, 60), 6)}),
    ]
    with _planted_metrics(spark, pd.concat(frames)):
        dec = {r.name: r
               for r in fq.series_ndiffs_nsdiffs(spark, "unused")
               .collect()}
    assert "short" in dec, "m<7 series must not be dropped"
    assert dec["short"].seasonal_strength is None
    assert dec["short"].nsdiffs == 0
    assert dec["short"].ndiffs is not None
    assert dec["long"].seasonal_strength is not None


def test_kpss_large_magnitude_series_stays_exact(spark):
    """Partial sums at large magnitude: an n=1000 random walk with
    series-sd ~3e4 (inside the documented sigma*n^2.5 <= 1e13
    headroom, sigma = sd of the SERIES) produces S-tilde far beyond
    int64 — the decimal(38,0) accumulation must keep the engine
    finite and equal to the numpy recomputation."""
    import pandas as pd
    rng = np.random.RandomState(3)
    n = 1000
    days = pd.date_range("2019-01-01", periods=n)
    rw = np.cumsum(rng.normal(0, 1e3, n))
    pdf = pd.DataFrame({"name": "big", "index": "t",
                        "evaluationDate": days,
                        "value": np.round(rw, 6)})
    with _planted_metrics(spark, pdf):
        import qrapids_forecast_r_script_spark.forecast.queries as fq
        r = fq.series_kpss_test(spark, "unused").collect()[0]
    lag, eta = _numpy_kpss(rw)
    assert r.lag_trunc == lag
    assert r.kpss_eta is not None and np.isfinite(r.kpss_eta)
    assert abs(r.kpss_eta - eta) < max(2e-6, abs(eta) * 1e-9)
    assert not r.stationary  # a random walk is not level-stationary


def test_kpss_shift_invariance_is_bit_exact(spark):
    """eta is location-invariant in exact arithmetic: e_t = m*x_t -
    sum(x) cancels any constant shift ON the micro-grid, so
    eta(y + c) must equal eta(y) BIT-exactly (not within tolerance) —
    the invariant the scaled-residual construction exists to give."""
    import pandas as pd
    rng = np.random.RandomState(17)
    n = 300
    days = pd.date_range("2023-01-01", periods=n)
    base = np.round(np.cumsum(rng.normal(0, 3, n)) + rng.normal(0, 5, n), 6)
    frames = [pd.DataFrame({"name": f"s{c}", "index": "t",
                            "evaluationDate": days,
                            "value": base + c})
              for c in (0, 1000, -250)]
    with _planted_metrics(spark, pd.concat(frames)):
        import qrapids_forecast_r_script_spark.forecast.queries as fq
        out = {r.name: r
               for r in fq.series_kpss_test(spark, "unused").collect()}
    assert out["s0"].kpss_eta == out["s1000"].kpss_eta
    assert out["s0"].kpss_eta == out["s-250"].kpss_eta
    assert out["s0"].lag_trunc == out["s1000"].lag_trunc


def test_kpss_high_mean_series_stays_exact(spark):
    """A huge constant offset (sensor-style mean 1e10, modest sigma)
    must cost nothing: the min-shift makes intermediates scale with
    the series RANGE, so the engine result still matches the numpy
    recomputation instead of wrapping int64 in m*x."""
    import pandas as pd
    rng = np.random.RandomState(5)
    n = 1000
    days = pd.date_range("2019-01-01", periods=n)
    y = 1e10 + rng.normal(0, 50, n)
    pdf = pd.DataFrame({"name": "hi", "index": "t",
                        "evaluationDate": days,
                        "value": np.round(y, 6)})
    with _planted_metrics(spark, pdf):
        import qrapids_forecast_r_script_spark.forecast.queries as fq
        r = fq.series_kpss_test(spark, "unused").collect()[0]
    lag, eta = _numpy_kpss(y)
    assert r.lag_trunc == lag
    assert r.kpss_eta is not None and np.isfinite(r.kpss_eta)
    assert abs(r.kpss_eta - eta) < max(2e-6, abs(eta) * 1e-9), \
        (r.kpss_eta, eta)
    assert r.stationary  # iid noise around a constant is stationary


def test_kpss_non_ansi_overflow_fails_distinguishably(spark):
    """r8 review: queries() may run on a CALLER session with ANSI
    disabled, where decimal(38,0) overflow silently NULLs instead of
    raising.  The reinstated guard must turn that into stationary
    NULL / eta NULL — never the constant-series TRUE branch, never a
    plausible wrong eta.  A normal-magnitude series on the same
    non-ANSI session stays exact (guard quiescent)."""
    import pandas as pd
    import qrapids_forecast_r_script_spark.forecast.queries as fq
    rng = np.random.RandomState(41)
    n = 2000
    days = pd.date_range("2015-01-01", periods=n)
    # random walk at ~1e12 scale: vu ~ 1e18 fits int64, the S_t
    # partial sums blow past sqrt(1e38) so s*s overflows decimal(38,0)
    big = np.round(1e12 + np.cumsum(rng.normal(0, 1e9, n)), 6)
    ok = np.round(100 + np.cumsum(rng.normal(0, 1, n)), 6)
    frames = [
        pd.DataFrame({"name": "big", "index": "t",
                      "evaluationDate": days, "value": big}),
        pd.DataFrame({"name": "ok", "index": "t",
                      "evaluationDate": days, "value": ok}),
    ]
    prev = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        with _planted_metrics(spark, pd.concat(frames)):
            out = {r.name: r
                   for r in fq.series_kpss_test(spark, "unused")
                   .collect()}
            dec = {r.name: r
                   for r in fq.series_ndiffs_nsdiffs(spark, "unused")
                   .collect()}
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert out["big"].kpss_eta is None
    assert out["big"].stationary is None, (
        "overflow must not fold into the constant-series TRUE branch")
    assert dec["big"].ndiffs is None, (
        "an overflowed KPSS pass must void the d-decision")
    # the guard is quiescent on sane magnitudes: same session, exact
    # result (a random walk rejects level stationarity)
    lag, eta = _numpy_kpss(ok)
    assert out["ok"].stationary is False
    assert abs(out["ok"].kpss_eta - eta) < max(2e-6, abs(eta) * 1e-9)
    assert dec["ok"].ndiffs == 1
