"""Round-4 continuation batch 2: semantic tests for the six new
operators (Theil-Sen trend, decomposition strength, eigenvector
centrality, t-closeness, column stats, Gini).

Oracle parity is covered for all six by test_oracle_parity.py's
auto-parametrization; these tests pin the SEMANTICS — the closed-form
identities and invariants an oracle match alone would not prove.
"""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------- Theil-Sen

def _series_frames(spark, sf_dir):
    from qrapids_forecast_r_script_spark.forecast.queries import _metrics
    from pyspark.sql.window import Window
    w = Window.partitionBy("name", "index").orderBy("evaluationDate")
    pdf = (_metrics(spark, sf_dir)
           .withColumn("t", F.row_number().over(w) - 1)
           .toPandas())
    return {name: g.sort_values("t")[["t", "value"]].to_numpy(dtype=float)
            for name, g in pdf.groupby("name")}


def test_theilsen_matches_numpy_median_of_slopes(spark, sf_dir):
    from qrapids_forecast_r_script_spark.forecast.queries import (
        series_theilsen_trend)
    rows = {r.name: r for r in
            series_theilsen_trend(spark, sf_dir).collect()}
    for name, arr in _series_frames(spark, sf_dir).items():
        t, y = arr[:, 0], arr[:, 1]
        slopes = [(y[j] - y[i]) / (t[j] - t[i])
                  for i in range(len(t)) for j in range(i + 1, len(t))]
        slope = round(float(np.median(slopes)), 6)
        icept = round(float(np.median(y - slope * t)), 6)
        r = rows[name]
        assert r.n_pairs == len(slopes)
        assert r.n_points == len(t)
        assert r.ts_slope == pytest.approx(slope, abs=2e-6)
        assert r.ts_intercept == pytest.approx(icept, abs=2e-6)


def test_theilsen_breakdown_vs_ols(spark, sf_dir):
    """Corrupting ~10% of one series with a huge spike moves the OLS
    slope far more than the Theil-Sen slope (the 29% breakdown point
    in action) — checked on the driver with numpy, same math as the
    distributed plan."""
    arr = next(iter(_series_frames(spark, sf_dir).values()))
    t, y = arr[:, 0], arr[:, 1].copy()
    slopes = lambda yy: float(np.median(  # noqa: E731
        [(yy[j] - yy[i]) / (t[j] - t[i])
         for i in range(len(t)) for j in range(i + 1, len(t))]))
    ols = lambda yy: float(np.polyfit(t, yy, 1)[0])  # noqa: E731
    ts0, ols0 = slopes(y), ols(y)
    k = max(1, len(y) // 10)
    y[-k:] += 100 * (np.max(y) - np.min(y) + 1)
    assert abs(slopes(y) - ts0) < abs(ols(y) - ols0)


# ------------------------------------------------- decomposition strength

def test_decomposition_strength_bounds_and_seasonal_series(spark, sf_dir):
    from qrapids_forecast_r_script_spark.forecast.queries import (
        series_decomposition_strength)
    rows = series_decomposition_strength(spark, sf_dir).collect()
    assert rows, "no series"
    for r in rows:
        assert 0.0 <= r.trend_strength <= 1.0, r
        assert 0.0 <= r.seasonal_strength <= 1.0, r
        assert 0 <= r.peak_dow <= 6, r
        assert math.isfinite(r.peak_seasonal)


def test_decomposition_strength_on_pure_signal():
    """Pure trend+season with no noise → both strengths ≈ 1 after the
    same integer-grid pipeline, computed in numpy exactly as the plan
    does (micro grid, 7-MA, dow means, milli-grid deviations)."""
    n, P, U, DEV = 42, 7, 1_000_000, 1_000
    t = np.arange(n)
    y = 100.0 + 2.5 * t + 10.0 * np.sin(2 * np.pi * (t % P) / P)
    ym = np.round(np.round(y, 6) * U).astype(np.int64)
    s7 = np.convolve(ym, np.ones(P, dtype=np.int64), "valid")
    tm = np.round(s7 / float(P)).astype(np.int64)
    interior = slice(3, n - 3)
    dm = ym[interior] - tm
    dow = (t[interior] % P)
    sm_raw = np.array([np.round(dm[dow == d].sum()
                                / float((dow == d).sum()))
                       for d in range(P)], dtype=np.int64)
    cm = np.int64(np.round(sm_raw.sum() / float(P)))
    sm = sm_raw - cm
    rm = dm - sm[dow]
    sa = ym[interior] - sm[dow]
    var = lambda x: np.mean(  # noqa: E731
        np.round((x - x.mean()) / float(DEV)).astype(np.int64) ** 2)
    f_t = max(0.0, 1.0 - var(rm) / var(sa))
    f_s = max(0.0, 1.0 - var(rm) / var(dm))
    assert f_t > 0.99 and f_s > 0.95


# ------------------------------------------------- eigenvector centrality

def test_eigencentrality_max_is_one_and_orders_by_neighborhood(
        spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.graph import (
        doc_graph_eigencentrality)
    rows = doc_graph_eigencentrality(spark, sf_dir).collect()
    assert rows, "empty centrality result"
    assert rows[0].rank == 1
    assert rows[0].centrality == pytest.approx(1.0, abs=1e-6)
    scores = [r.centrality for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(0.0 <= s <= 1.0 for s in scores)


def test_eigencentrality_path_graph_power_iteration():
    """On a 4-path a-b-c-d, two max-normalized adjacency iterations
    give the middle nodes score 1 and the ends 2/3 — the exact values
    the unrolled plan must reproduce (checked in pure integer micro
    arithmetic, same grid as the operator)."""
    U = 1_000_000
    adj = {0: [1], 1: [0, 2], 2: [1, 3], 3: [2]}
    x = {v: U for v in adj}
    for _ in range(2):
        s = {v: sum(x[u] for u in adj[v]) for v in adj}
        mx = max(s.values())
        x = {v: int(round(s[v] * U / mx)) for v in adj}
    assert x[1] == U and x[2] == U
    assert x[0] == round(2 * U / 3) and x[3] == round(2 * U / 3)


# ------------------------------------------------------------ t-closeness

def test_t_closeness_identities(spark, sf_dir):
    """EMD(cell, global) ∈ [0,1]; a cell whose distribution IS the
    global one scores 0; the audit covers every (nation, segment) cell
    with the same cell sizes k_anonymity-style grouping would see."""
    from qrapids_forecast_r_script_spark.operators.assoc_privacy import (
        t_closeness_audit)
    from qrapids_forecast_r_script_spark.sources import load_table
    rows = t_closeness_audit(spark, sf_dir).collect()
    cust = load_table(spark, sf_dir, "customer")
    n_cells = (cust.select("c_nationkey", "c_mktsegment")
               .distinct().count())
    assert len(rows) == n_cells
    assert sum(r.cell_size for r in rows) == cust.count()
    for r in rows:
        assert 0.0 <= r.emd_t <= 1.0, r
        assert r.violates_t == (r.emd_t > 0.2)


def test_t_closeness_ordered_emd_closed_form():
    """Hand-checked ordered EMD: cell mass all in the TOP of 3 buckets
    vs uniform global → CDF diffs are |0-1/3| + |0-2/3| + |1-1| = 1,
    normalized by m-1 = 2 → EMD = 0.5."""
    # global: 3 buckets × 2 each (N=6); cell: 2 customers both in b3
    cum_cell = [0, 0, 2]
    cum_glob = [2, 4, 6]
    n_cell, n_glob, m = 2, 6, 3
    num = sum(abs(cc * n_glob - cg * n_cell)
              for cc, cg in zip(cum_cell, cum_glob))
    emd = num / (n_cell * n_glob * (m - 1))
    assert emd == pytest.approx(0.5)


# ----------------------------------------------------------- column stats

def test_column_stats_profile_matches_direct_aggregates(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.data_quality import (
        column_stats_profile)
    from qrapids_forecast_r_script_spark.sources import load_table
    rows = {r.column_name: r
            for r in column_stats_profile(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    assert set(rows) == {"o_orderkey", "o_custkey", "o_orderstatus",
                         "o_totalprice", "o_orderdate",
                         "o_orderpriority"}
    ok = rows["o_orderkey"]
    assert ok.n_rows == n and ok.n_nulls == 0 and ok.null_frac == 0.0
    assert ok.ndv == n  # primary key: every value distinct
    assert ok.avg_len is None
    st = rows["o_orderstatus"]
    assert st.min_val is None and st.max_val is None
    assert st.avg_len == 1.0  # single-char status codes
    tp = rows["o_totalprice"]
    direct = orders.agg(F.min("o_totalprice"), F.max("o_totalprice"),
                        F.count_distinct("o_totalprice")).first()
    assert tp.min_val == direct[0] and tp.max_val == direct[1]
    assert tp.ndv == direct[2]


# ------------------------------------------------------------------- Gini

def test_gini_matches_numpy_and_bounds(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import customer_revenue_gini
    from qrapids_forecast_r_script_spark.sources import load_table
    row = customer_revenue_gini(spark, sf_dir).first()
    orders = load_table(spark, sf_dir, "orders")
    rev = (orders.groupBy("o_custkey")
           .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0)
                      .cast("long")).alias("c"))
           .toPandas()["c"].to_numpy(dtype=np.int64))
    x = np.sort(rev)
    n = len(x)
    i = np.arange(1, n + 1, dtype=np.int64)
    g = 2.0 * float((i * x).sum()) / (n * float(x.sum())) - (n + 1) / n
    assert row.n_customers == n
    assert row.gini == pytest.approx(g, abs=1e-6)
    assert 0.0 <= row.gini < 1.0
    k = n // 10
    share = float(x[n - k:].sum()) / float(x.sum())
    assert row.top10pct_share == pytest.approx(share, abs=1e-6)
    assert row.top10pct_share >= 0.1 - 1e-9  # top decile ≥ uniform share


def test_gini_extremes():
    """Closed-form sanity at the two poles: equal revenues → G = 0;
    one-customer-takes-all → G = (n-1)/n."""
    def gini(x):
        x = np.sort(np.asarray(x, dtype=float))
        n = len(x)
        i = np.arange(1, n + 1)
        return 2.0 * (i * x).sum() / (n * x.sum()) - (n + 1) / n
    assert gini([5, 5, 5, 5]) == pytest.approx(0.0)
    n = 10
    x = [0] * (n - 1) + [100]
    assert gini(x) == pytest.approx((n - 1) / n)


# ------------------------------------------------------------------- Holt

def test_holt_windowed_tracks_full_recursion():
    """The K=14 integer-weight windowed estimator must track the full
    alpha=beta=1/2 Holt recursion on trending, flat, and declining
    series (level within 0.5, slope within 0.1 of the recursion on a
    noise-sd-3 series)."""
    from qrapids_forecast_r_script_spark.forecast.queries import (
        _HOLT_DEN, _HOLT_K, _HOLT_SL, _HOLT_W)
    rng = np.random.RandomState(0)
    for slope in (2.5, 0.0, -1.0):
        y = 100 + slope * np.arange(60) + rng.normal(0, 3, 60)
        l, b = y[0], y[1] - y[0]
        for t in range(1, len(y)):
            ln_ = 0.5 * y[t] + 0.5 * (l + b)
            b = 0.5 * (ln_ - l) + 0.5 * b
            l = ln_
        lv = sum(wl * y[-1 - k] for k, wl, _ in _HOLT_W) / _HOLT_SL
        bv = sum(wb * y[-1 - k] for k, _, wb in _HOLT_W) / _HOLT_DEN
        assert abs(lv - l) < 0.5, (slope, lv, l)
        assert abs(bv - b) < 0.1, (slope, bv, b)
    assert len(_HOLT_W) == _HOLT_K


def test_holt_weight_identities():
    """Level weights are the truncated geometric-matrix series (sum =
    S_L, coverage > 0.99); trend weights sum to EXACTLY zero (the
    level-leak fix), so a constant series yields trend 0 and mean ==
    level == the constant."""
    from qrapids_forecast_r_script_spark.forecast.queries import (
        _HOLT_DEN, _HOLT_SL, _HOLT_W)
    assert sum(wl for _, wl, _ in _HOLT_W) == _HOLT_SL
    assert sum(wb for _, _, wb in _HOLT_W) == 0
    assert 0.99 < _HOLT_SL / _HOLT_DEN < 1.0
    y = np.full(30, 42.0)
    lv = sum(wl * y[-1 - k] for k, wl, _ in _HOLT_W) / _HOLT_SL
    bv = sum(wb * y[-1 - k] for k, _, wb in _HOLT_W) / _HOLT_DEN
    assert lv == pytest.approx(42.0, abs=1e-9)
    assert bv == pytest.approx(0.0, abs=1e-12)


def test_holt_query_mean_is_linear_in_step(spark, sf_dir):
    from qrapids_forecast_r_script_spark.forecast.queries import (
        forecast_holt_events)
    rows = forecast_holt_events(spark, sf_dir).collect()
    assert {r.method for r in rows} == {"HOLT"}
    by_series = {}
    for r in rows:
        by_series.setdefault(r.name, []).append(r)
    for name, rs in by_series.items():
        rs.sort(key=lambda r: r.step)
        assert [r.step for r in rs] == list(range(1, 15))
        deltas = [rs[i + 1].mean - rs[i].mean for i in range(13)]
        assert max(deltas) - min(deltas) < 2e-5, (name, deltas)
        # bands widen with horizon (Holt variance profile is increasing)
        widths = [r.upper2 - r.lower2 for r in rs]
        assert all(b >= a - 1e-9 for a, b in zip(widths, widths[1:]))


# ------------------------------------------------------------- cohort LTV

def test_cohort_ltv_cumulative_and_conservation(spark, sf_dir):
    """Per-cohort LTV is nondecreasing in age; age-0 cell exists for
    every cohort (the acquisition month itself); total revenue across
    cells equals total order revenue to the cent."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import cohort_ltv_matrix
    from qrapids_forecast_r_script_spark.sources import load_table
    rows = cohort_ltv_matrix(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    total = (orders.agg(F.sum(F.round(F.col("o_totalprice") * 100, 0)
                              .cast("long"))).first()[0])
    assert round(sum(r.revenue for r in rows), 2) == \
        pytest.approx(total / 100, abs=0.01 * len(rows))
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_month, []).append(r)
    for ch, rs in by_cohort.items():
        rs.sort(key=lambda r: r.age_months)
        assert rs[0].age_months == 0, ch
        ltv = [r.ltv_per_customer for r in rs]
        assert all(b >= a - 1e-9 for a, b in zip(ltv, ltv[1:])), ch
        assert rs[0].n_customers > 0


# ------------------------------------------------------------ unigram KL

def test_source_unigram_kl_nonnegative_and_matches_numpy(spark, sf_dir):
    """KL ≥ 0 (Gibbs); equals a brute-force pandas recomputation with
    the same micro-grid snapping."""
    from collections import Counter

    from qrapids_forecast_r_script_spark.operators.text_quality import (
        source_unigram_kl)
    from qrapids_forecast_r_script_spark.sources import load_table
    rows = {r.source: r
            for r in source_unigram_kl(spark, sf_dir).collect()}
    docs = (load_table(spark, sf_dir, "documents")
            .select("source", "text").toPandas())
    corpus = Counter()
    per_src: dict[str, Counter] = {}
    for src, text in zip(docs["source"], docs["text"]):
        toks = text.split(" ")
        corpus.update(toks)
        per_src.setdefault(src, Counter()).update(toks)
    n_all = sum(corpus.values())
    for src, cnt in per_src.items():
        n_s = sum(cnt.values())
        kl_u = 0
        for tok, c in cnt.items():
            p, q = c / n_s, corpus[tok] / n_all
            kl_u += int(round(p * math.log(p / q) * 1_000_000))
        r = rows[src]
        assert r.n_tokens == n_s
        assert r.vocab_size == len(cnt)
        assert r.kl_nats == pytest.approx(kl_u / 1_000_000, abs=2e-6)
        assert r.kl_nats >= -1e-6, src


# ------------------------------------------------- LSH precision/recall

def test_lsh_precision_recall_identities(spark, sf_dir):
    """tp ≤ min(n_truth, n_pred); fp/fn complements; precision/recall
    consistent with the integer counts; F1 equals the harmonic mean
    identity computed from raw integers."""
    from qrapids_forecast_r_script_spark.operators.dedup import (
        lsh_precision_recall)
    r = lsh_precision_recall(spark, sf_dir).first()
    assert r.tp <= min(r.n_truth, r.n_pred)
    assert r.fp == r.n_pred - r.tp and r.fn == r.n_truth - r.tp
    if r.n_pred:
        assert r.precision == pytest.approx(r.tp / r.n_pred, abs=1e-6)
    if r.n_truth:
        assert r.recall == pytest.approx(r.tp / r.n_truth, abs=1e-6)
    denom = 2 * r.tp + r.fp + r.fn
    if denom:
        assert r.f1 == pytest.approx(2 * r.tp / denom, abs=1e-6)
    # the banded candidate set must catch most J>=0.5 pairs (b=4,r=4:
    # P[candidate] = 1-(1-J^4)^4 = 0.23 at J=0.5 but ~1 at J>=0.9;
    # the synthetic near-dup pairs are high-J, so recall is high)
    if r.n_truth:
        assert r.recall >= 0.5, r


# ------------------------------------------- functional dependency audit

def test_functional_dependency_audit_keys_hold(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.data_quality import (
        functional_dependency_audit)
    from qrapids_forecast_r_script_spark.sources import load_table
    rows = {r.fd: r
            for r in functional_dependency_audit(spark, sf_dir)
            .collect()}
    assert len(rows) == 6
    pk = rows["orders.o_orderkey->o_custkey"]
    assert pk.holds and pk.n_violating_keys == 0 and pk.max_fanout == 1
    assert pk.n_keys == load_table(spark, sf_dir, "orders").count()
    for r in rows.values():
        assert 0.0 <= r.violation_rate <= 1.0
        assert r.holds == (r.n_violating_keys == 0)
        assert r.max_fanout >= 1
    # the nationkey->segment rule is genuinely false on TPC-H-ish data
    assert not rows["customer.c_nationkey->c_mktsegment"].holds


# ------------------------------------------------------- order cycle time

def test_order_cycle_time_matches_pandas(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.relational_ext import (
        order_cycle_time_stats)
    from qrapids_forecast_r_script_spark.sources import load_table
    rows = {r.o_orderpriority: r
            for r in order_cycle_time_stats(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.to_date("o_orderdate").alias("od"))
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.to_date("l_shipdate").alias("sd"))
    pdf = (orders.join(li, "o_orderkey")
           .select("o_orderpriority",
                   F.datediff("sd", "od").alias("gap")).toPandas())
    for pr, g in pdf.groupby("o_orderpriority"):
        gaps = g["gap"].to_numpy(dtype=float)
        r = rows[pr]
        assert r.n_lineitems == len(gaps)
        assert r.mean_days == pytest.approx(gaps.mean(), abs=1e-6)
        # numpy 'linear' interpolation == type-7 == Spark percentile
        assert r.p50_days == pytest.approx(
            np.percentile(gaps, 50), abs=1e-6)
        assert r.p90_days == pytest.approx(
            np.percentile(gaps, 90), abs=1e-6)
        assert r.min_days == gaps.min() and r.max_days == gaps.max()
        assert r.p50_days <= r.p90_days <= r.p99_days <= r.max_days


# ----------------------------------------------------- EWMA control chart

def test_ewma_matches_adjusted_recursion(spark, sf_dir):
    """The windowed integer-weight EWMA equals the textbook fast-start
    (bias-adjusted) recursion z_t = Σ (1/2)^{k+1} x_{t-k} / Σ weights
    for t < K, and tracks the plain recursion after burn-in."""
    from qrapids_forecast_r_script_spark.forecast.queries import (
        _EWMA_K, events_ewma_control_chart)
    rows = events_ewma_control_chart(spark, sf_dir).collect()
    frames = _series_frames(spark, sf_dir)
    by_series = {}
    for r in rows:
        by_series.setdefault(r.name, []).append(r)
    for name, rs in by_series.items():
        rs.sort(key=lambda r: r.t)
        y = frames[name][:, 1]
        assert len(rs) == len(y)
        for r in rs:
            t = int(r.t)
            lo = max(0, t - _EWMA_K + 1)
            ws = [2.0 ** -(k + 1) for k in range(t - lo + 1)]
            vals = [y[t - k] for k in range(t - lo + 1)]
            expect = sum(w * v for w, v in zip(ws, vals)) / sum(ws)
            assert r.ewma == pytest.approx(expect, abs=2e-4), (name, t)
            assert r.lcl < r.ucl
            assert r.signal == (r.ewma < r.lcl or r.ewma > r.ucl)


def test_ewma_band_inflation_monotone():
    """The variance-inflation factor (1/3)(1-0.25^(t+1)) increases in
    t and converges to 1/3 — band width must be nondecreasing."""
    import math as _m
    widths = [_m.sqrt((1 / 3) * (1 - 0.25 ** (t + 1)))
              for t in range(30)]
    assert all(b >= a for a, b in zip(widths, widths[1:]))
    assert widths[-1] == pytest.approx(_m.sqrt(1 / 3), abs=1e-6)


# ------------------------------------------------- degree power-law fit

def test_degree_powerlaw_matches_brute(spark, sf_dir):
    from collections import Counter

    from qrapids_forecast_r_script_spark.operators.dedup import (
        minhash_lsh_pairs)
    from qrapids_forecast_r_script_spark.operators.graph import (
        doc_graph_degree_powerlaw)
    r = doc_graph_degree_powerlaw(spark, sf_dir).first()
    pairs = [(p.doc_a, p.doc_b)
             for p in minhash_lsh_pairs(spark, sf_dir)
             .select("doc_a", "doc_b").collect()]
    deg = Counter()
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    assert r.n_nodes == len(deg)
    assert r.n_edges == len(pairs)
    assert r.max_degree == max(deg.values())
    ln_u = sum(int(round(math.log(d / 0.5) * 1_000_000))
               for d in deg.values())
    alpha = 1.0 + len(deg) / (ln_u / 1_000_000)
    assert r.alpha_hat == pytest.approx(alpha, abs=2e-6)
    assert r.alpha_hat > 1.0
    assert 0.0 <= r.top_decile_edge_share <= 1.0
    # top decile of nodes must carry at least its uniform share
    assert r.top_decile_edge_share >= 0.1 - 1e-6


# ------------------------------------------------------------------ CUPED

def test_cuped_aa_semantics_and_variance_reduction(spark, sf_dir):
    """On the hash split (A/A by construction): adjusted diff stays
    not-significant (|z| < 3), theta is finite, and CUPED must not
    INCREASE variance (reduction ∈ [0, 1))."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import ab_test_cuped
    r = ab_test_cuped(spark, sf_dir).first()
    assert r.n_a > 0 and r.n_b > 0
    assert abs(r.z_cuped) < 3.0, r
    assert math.isfinite(r.theta)
    # theta is fit on the POOLED sample while the reduction is measured
    # within-arm, so at tiny n (15 users at sf0.001) the reduction can
    # go slightly negative — the population guarantee 1-rho^2 only
    # binds in expectation; allow the small-sample wiggle
    assert -0.1 <= r.var_reduction < 1.0, r
    # adjustment must not blow the point estimate up
    assert abs(r.diff_cuped) <= abs(r.diff_raw) + 1.0


def test_cuped_theta_matches_numpy(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import _CUPED_G, ab_test_cuped
    from qrapids_forecast_r_script_spark.sources import load_table
    r = ab_test_cuped(spark, sf_dir).first()
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "value", F.dayofmonth("ts").alias("dom")).toPandas()
    import pandas as pd
    g = ev.groupby("user_id").apply(
        lambda d: pd.Series({
            "x": round(d.loc[d.dom < 16, "value"].sum(), 6),
            "y": round(d.loc[d.dom >= 16, "value"].sum(), 6)}),
        include_groups=False)
    xg = np.round(g["x"].to_numpy() * _CUPED_G).astype(np.int64)
    yg = np.round(g["y"].to_numpy() * _CUPED_G).astype(np.int64)
    n = len(xg)
    cov = (xg * yg).sum() / n - xg.sum() / n * (yg.sum() / n)
    varx = (xg * xg).sum() / n - (xg.sum() / n) ** 2
    assert r.theta == pytest.approx(cov / varx, abs=2e-6)


# -------------------------------------------------------------------- SRM

def test_srm_check_segments_and_chi2(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import ab_srm_check
    from qrapids_forecast_r_script_spark.sources import load_table
    rows = {r.segment: r for r in ab_srm_check(spark, sf_dir).collect()}
    assert "_overall" in rows
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    ov = rows["_overall"]
    assert ov.n_a + ov.n_b == n_users
    for r in rows.values():
        expect = (r.n_a - r.n_b) ** 2 / (r.n_a + r.n_b)
        assert r.chi2 == pytest.approx(expect, abs=1e-6)
        assert r.srm_detected == (r.chi2 > 3.841459)
        assert 0.0 <= r.share_a <= 1.0
    # a genuine md5 50/50 split on thousands of users must NOT trip SRM
    assert not ov.srm_detected


# ------------------------------------------------------ Davies-Bouldin

def test_embedding_db_index_matches_numpy(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.pipeline import (
        embedding_db_index)
    from qrapids_forecast_r_script_spark.sources import load_table
    rows = {r.label: r for r in
            embedding_db_index(spark, sf_dir).collect()}
    pdf = load_table(spark, sf_dir, "embeddings").toPandas()
    vecs = {lbl: np.stack(g["embedding"].map(np.asarray))
            .astype(np.float64)
            for lbl, g in pdf.groupby("label")}
    cents = {lbl: np.round(v.mean(axis=0), 6)
             for lbl, v in vecs.items()}
    scats = {lbl: round(float(np.linalg.norm(
        v - cents[lbl], axis=1).mean()), 6)
        for lbl, v in vecs.items()}
    for lbl, r in rows.items():
        assert r.n_vecs == len(vecs[lbl])
        assert r.scatter == pytest.approx(scats[lbl], abs=2e-6)
        ratios = {}
        for other in vecs:
            if other == lbl:
                continue
            d = round(float(np.linalg.norm(
                cents[lbl] - cents[other])), 6)
            ratios[other] = round((scats[lbl] + scats[other]) / d, 6)
        worst = min(sorted(ratios), key=lambda o: (-ratios[o], o))
        assert r.worst_partner == worst
        assert r.db_ratio == pytest.approx(ratios[worst], abs=2e-6)
        assert r.db_ratio > 0


# ---------------------------------------------- prefix-filter set join

def test_prefix_filter_join_equals_brute_force(spark, sf_dir):
    """The prefix-filtered exact join must return EXACTLY the pairs
    a brute python all-pairs pass finds at the same threshold and
    shingle width (w=4) — the completeness guarantee of the prefix
    principle (any pair with overlap ≥ ⌈τ·max(|a|,|b|)⌉ collides
    inside the prefixes)."""
    from qrapids_forecast_r_script_spark.operators.dedup import (
        prefix_filter_join)
    from qrapids_forecast_r_script_spark.sources import load_table
    pp = {(r.doc_a, r.doc_b): (r.n_common, r.jaccard)
          for r in prefix_filter_join(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text").collect()
    sets = {}
    for r in docs:
        toks = r.text.split(" ")
        sets[r.doc_id] = {" ".join(toks[i:i + 4])
                          for i in range(len(toks) - 3)}
    ids = sorted(sets)
    brute = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = round(inter / (len(sets[a]) + len(sets[b]) - inter), 6)
            if j >= 0.5:
                brute[(a, b)] = (inter, j)
    assert pp == brute
    assert pp, "threshold produced no pairs — vacuous fixture"


def test_prefix_length_integer_formula():
    """At tau=1/2 the safe prefix length |d| - ceil(|d|/2) + 1 equals
    |d|//2 + 1 for every size — the all-integer pruning rule."""
    for n in range(1, 200):
        assert n - math.ceil(n / 2) + 1 == n // 2 + 1


# ---------------------------------------------------------- CDC apply

def test_cdc_apply_semantics(spark, sf_dir):
    """Deletes remove keys except those resurrected by the later
    re-insert; updates win over base; op counts per key line up."""
    from qrapids_forecast_r_script_spark.operators.scale_patterns import (
        orders_cdc_apply)
    from qrapids_forecast_r_script_spark.sources import load_table
    rows = {r.o_orderkey: r
            for r in orders_cdc_apply(spark, sf_dir).collect()}
    keys = [r[0] for r in load_table(spark, sf_dir, "orders")
            .select("o_orderkey").collect()]
    for k in keys:
        deleted = k % 10 == 3
        reinserted = k % 100 == 3
        updated = k % 7 == 0
        if deleted and not reinserted:
            assert k not in rows, k
            continue
        r = rows[k]
        if reinserted:
            assert r.o_orderstatus == "R" and r.last_seq == 3
            assert r.o_totalprice == 9999.99
        elif updated:
            assert r.o_orderstatus == "U" and r.last_seq == 1
        else:
            assert r.last_seq == 0
        expect_ops = 1 + int(updated) + int(deleted) + int(reinserted)
        assert r.n_ops == expect_ops, (k, r)
    assert len(rows) == sum(1 for k in keys
                            if k % 10 != 3 or k % 100 == 3)


# --------------------------------------------------- sequence patterns

def test_session_sequence_pairs_vs_brute(spark, sf_dir):
    """Support counts equal a brute per-session subsequence check on
    the driver; confidence ≤ 1; a→b support can exceed the adjacent-
    transition count (the any-gap generalization), never the reverse
    session-count bound."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import session_sequence_pairs
    from qrapids_forecast_r_script_spark.streaming.queries import (
        sessionize_events)
    from qrapids_forecast_r_script_spark.sources import load_table
    rows = {(r.ante, r.cons): r
            for r in session_sequence_pairs(spark, sf_dir).collect()}
    sess = (sessionize_events(load_table(spark, sf_dir, "events"))
            .select("user_id", "session_id", "ts", "event_id",
                    "event_type").toPandas())
    from collections import Counter
    supp = Counter()
    n_sessions = 0
    for (_, _), g in sess.groupby(["user_id", "session_id"]):
        n_sessions += 1
        seq = g.sort_values(["ts", "event_id"])["event_type"].tolist()
        types = set(seq)
        for x in types:
            first_a = seq.index(x)
            for y in types:
                if x == y:
                    continue
                last_b = len(seq) - 1 - seq[::-1].index(y)
                if first_a < last_b:
                    supp[(x, y)] += 1
    assert set(rows) == set(supp)
    for key, r in rows.items():
        assert r.n_support == supp[key], key
        assert r.n_support <= n_sessions
        assert 0.0 < r.confidence <= 1.0
        assert r.support == pytest.approx(r.n_support / n_sessions,
                                          abs=1e-6)


# ------------------------------------------------- duplicate payments

def test_duplicate_payment_audit_brute(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.data_quality import (
        duplicate_payment_audit)
    from qrapids_forecast_r_script_spark.sources import load_table
    rows = duplicate_payment_audit(spark, sf_dir).collect()
    pdf = (load_table(spark, sf_dir, "orders")
           .select("o_custkey", "o_orderkey",
                   F.round(F.col("o_totalprice") * 100, 0)
                   .cast("long").alias("cents"),
                   F.to_date("o_orderdate").alias("od")).toPandas())
    found = set()
    for (_, _), g in pdf.groupby(["o_custkey", "cents"]):
        rs = g.sort_values("o_orderkey").to_dict("records")
        for i in range(len(rs)):
            for j in range(i + 1, len(rs)):
                gap = abs((rs[j]["od"] - rs[i]["od"]).days)
                if gap <= 7:
                    found.add((rs[i]["o_orderkey"],
                               rs[j]["o_orderkey"], gap))
    got = {(r.key_a, r.key_b, r.day_gap) for r in rows}
    assert got == found
    for r in rows:
        assert 0 <= r.day_gap <= 7


# ----------------------------------------------------------------- HHI

def test_hhi_bounds_and_single_brand_market():
    """HHI of a monopoly market is 10000 points; an equal n-way split
    is 10000/n — the closed form the query's snapped arithmetic must
    approach."""
    def hhi(shares):
        su = [round(s * 1_000_000) for s in shares]
        return sum(x * x for x in su) / 1e8
    assert hhi([1.0]) == pytest.approx(10000.0)
    assert hhi([0.25] * 4) == pytest.approx(2500.0)
    assert hhi([0.5, 0.3, 0.2]) == pytest.approx(3800.0)


def test_hhi_query_consistency(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.relational_ext import (
        brand_concentration_hhi)
    rows = brand_concentration_hhi(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.hhi <= 10000.0 + 1e-6
        assert r.hhi >= 10000.0 / r.n_brands - 1e-3  # equal-split floor
        expect = ("unconcentrated" if r.hhi < 1500
                  else "moderate" if r.hhi < 2500 else "high")
        assert r.band == expect


# ---------------------------------------------------------------- RAKE

def test_rake_scores_match_brute(spark, sf_dir):
    from collections import defaultdict

    from qrapids_forecast_r_script_spark.operators.text import (
        _EN_STOP, _RAKE_MAX_LEN, rake_keywords_top)
    from qrapids_forecast_r_script_spark.sources import load_table
    rows = rake_keywords_top(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "text").toPandas()["text"]
    stop = set(_EN_STOP)
    phrases = []
    for text in docs:
        run = []
        for tok in text.split(" ") + ["the"]:  # sentinel flush
            if tok in stop:
                if run:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(tok)
    freq = defaultdict(int)
    deg = defaultdict(int)
    kept = [p for p in phrases if len(p) <= _RAKE_MAX_LEN]
    for p in kept:
        for t in p:
            freq[t] += 1
            deg[t] += len(p)
    wscore = {t: round(deg[t] / freq[t] * 1_000_000)
              for t in freq}
    pscore = defaultdict(int)
    pcount = defaultdict(int)
    for p in kept:
        pscore[p] = sum(wscore[t] for t in p)
        pcount[p] += 1
    ranked = sorted(pscore, key=lambda p: (-pscore[p], " ".join(p)))
    for i, r in enumerate(rows):
        p = tuple(r.phrase.split(" "))
        assert p == ranked[i], (i, r.phrase, ranked[i])
        assert r.n_occurrences == pcount[p]
        assert r.rake_score == pytest.approx(pscore[p] / 1e6, abs=2e-6)
    assert rows[0].rank == 1 and len(rows) <= 25
