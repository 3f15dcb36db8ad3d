"""Round-4 batch 21 semantic tests: Shapley attribution, Kneser-Ney
bigram LM, Nelson-Aalen hazard, Mantel-Haenszel pooled OR, James-Stein
shrinkage, IPF raking, greedy max-coverage, capture-recapture, Markov
backtest, item-item CF, QL-Dirichlet, WoE/IV.

Oracle parity is covered by test_oracle_parity.py's
auto-parametrization; these pin the SEMANTICS — closed-form identities
and invariants an oracle match alone would not prove (both engines
could share a bug; a brute-force python replay cannot).
"""

import math
from collections import Counter
from itertools import combinations

import pytest

from pyspark.sql import functions as F


# ------------------------------------------------------ Shapley MTA

def test_shapley_efficiency_and_brute_force(spark, sf_dir):
    """Sum of Shapley values equals v(N) - v(empty) exactly (the
    efficiency axiom, in 24ths), and each phi matches a brute-force
    permutation average computed in python."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import shapley_attribution
    from qrapids_forecast_r_script_spark.sources import load_table
    rows = {r.channel: r.phi24
            for r in shapley_attribution(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts").collect()
    first_p = {}
    for r in ev:
        if r.event_type == "purchase":
            if r.user_id not in first_p or r.ts < first_p[r.user_id]:
                first_p[r.user_id] = r.ts
    bits = {"click": 1, "error": 2, "signup": 4, "view": 8}
    masks = Counter()
    touched = {}
    for r in ev:
        if (r.user_id in first_p and r.ts < first_p[r.user_id]
                and r.event_type in bits):
            touched[r.user_id] = touched.get(r.user_id, 0) \
                | bits[r.event_type]
    for u in first_p:
        masks[touched.get(u, 0)] += 1

    def v(s):
        return sum(c for m, c in masks.items() if (m & s) == m)

    w = {0: 6, 1: 2, 2: 2, 3: 6}
    for ch, bit in bits.items():
        others = [b for b in bits.values() if b != bit]
        phi24 = 0
        for k in range(4):
            for combo in combinations(others, k):
                s = sum(combo)
                phi24 += w[k] * (v(s + bit) - v(s))
        assert rows[ch] == phi24, ch
    assert sum(rows.values()) == 24 * (v(15) - v(0))


# ------------------------------------------------- Kneser-Ney bigram

def test_kneser_ney_brute_force(spark, sf_dir):
    """Per-doc KN average matches a python replay of the interpolated
    KN formula on the first five docs."""
    from qrapids_forecast_r_script_spark.operators.text_quality import (
        kneser_ney_bigram_logprob)
    from qrapids_forecast_r_script_spark.sources import load_table
    got = {r.doc_id: (r.n_bigrams, r.kn_avg_neg_logprob)
           for r in kneser_ney_bigram_logprob(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text").collect()
    bigr = {}
    for r in docs:
        toks = r.text.split(" ")
        bigr[r.doc_id] = [(toks[i], toks[i + 1])
                          for i in range(len(toks) - 1)]
    c12 = Counter(b for bs in bigr.values() for b in bs)
    c1 = Counter(b[0] for bs in bigr.values() for b in bs)
    n1p_w1 = Counter()
    n1p_w2 = Counter()
    for (w1, w2) in c12:
        n1p_w1[w1] += 1
        n1p_w2[w2] += 1
    B = len(c12)
    D = 0.75
    for doc_id in sorted(bigr)[:5]:
        su = 0
        for (w1, w2) in bigr[doc_id]:
            p = (max(c12[(w1, w2)] - D, 0.0)
                 + D * n1p_w1[w1] * n1p_w2[w2] / B) / c1[w1]
            su += round(-math.log(p) * 1e6)
        n = len(bigr[doc_id])
        assert got[doc_id][0] == n
        assert got[doc_id][1] == pytest.approx(su / n / 1e6, abs=2e-6)


def test_kneser_ney_is_proper_distribution():
    """The interpolated-KN formula sums to 1 over continuations of a
    fixed prefix — the property add-k also has but backoff-only
    ("stupid backoff") lacks; checked on a tiny corpus."""
    corpus = [("a", "b"), ("a", "b"), ("a", "c"), ("b", "c"),
              ("c", "a"), ("c", "b")]
    c12 = Counter(corpus)
    c1 = Counter(w1 for w1, _ in corpus)
    n1p_w1 = Counter()
    n1p_w2 = Counter()
    for (w1, w2) in c12:
        n1p_w1[w1] += 1
        n1p_w2[w2] += 1
    B = len(c12)
    D = 0.75
    vocab = {w for pair in corpus for w in pair}
    for w1 in c1:
        tot = sum((max(c12.get((w1, w2), 0) - D, 0.0)
                   + D * n1p_w1[w1] * n1p_w2[w2] / B) / c1[w1]
                  for w2 in vocab)
        # continuation mass sums to sum(n1p_w2)/B = 1 exactly
        assert tot == pytest.approx(1.0, abs=1e-12)


# --------------------------------------------------- Nelson-Aalen

def test_nelson_aalen_vs_km_bounds(spark, sf_dir):
    """exp(-H(t)) >= KM S(t) everywhere (Fleming-Harrington dominates
    Kaplan-Meier), increments match d/n, and H is nondecreasing."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import nelson_aalen_hazard, user_survival_curve
    na = nelson_aalen_hazard(spark, sf_dir).collect()
    km = {r.t: r.survival
          for r in user_survival_curve(spark, sf_dir).collect()}
    prev_h = 0.0
    for r in na:
        assert r.cum_hazard >= prev_h - 1e-9
        prev_h = r.cum_hazard
        assert r.fh_survival >= km[r.t] - 1e-6, r.t
        assert r.var_hazard >= 0


# ------------------------------------------- Mantel-Haenszel pooled OR

def test_mh_or_brute_force(spark, sf_dir):
    """OR_MH replayed in python from the raw 2x2 strata; the crude OR
    equals the pooled-table OR."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import mh_pooled_odds_ratio
    from qrapids_forecast_r_script_spark.sources import load_table
    row = mh_pooled_odds_ratio(spark, sf_dir).collect()[0]
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice").collect()
    cust = {r.c_custkey: r.c_nationkey
            for r in load_table(spark, sf_dir, "customer").collect()}
    ycs = [round(o.o_totalprice * 100) for o in orders]
    mu = sum(ycs) / len(ycs)
    cells = {}
    for o, yc in zip(orders, ycs):
        nk = cust[o.o_custkey]
        e = o.o_orderpriority in ("1-URGENT", "2-HIGH")
        hi = yc > mu
        a, b, c, d = cells.get(nk, (0, 0, 0, 0))
        if e and hi:
            a += 1
        elif e:
            b += 1
        elif hi:
            c += 1
        else:
            d += 1
        cells[nk] = (a, b, c, d)
    sn = sum(round(a * d / (a + b + c + d) * 1e6)
             for a, b, c, d in cells.values())
    sd = sum(round(b * c / (a + b + c + d) * 1e6)
             for a, b, c, d in cells.values())
    assert row.or_mh == pytest.approx(sn / sd, abs=2e-6)
    sa = sum(v[0] for v in cells.values())
    sb = sum(v[1] for v in cells.values())
    sc = sum(v[2] for v in cells.values())
    sdd = sum(v[3] for v in cells.values())
    assert row.or_crude == pytest.approx(sa * sdd / (sb * sc), abs=2e-6)
    assert row.n_strata == len(cells)


# ----------------------------------------------------- James-Stein

def test_james_stein_shrinks_toward_grand_mean(spark, sf_dir):
    """0 <= B <= 1; every js_mean lies between the raw mean and the
    grand mean of means; B matches the Efron-Morris closed form
    replayed from the reported columns."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import james_stein_nation_means
    rows = james_stein_nation_means(spark, sf_dir).collect()
    k = len(rows)
    bs = {r.shrinkage for r in rows}
    assert len(bs) == 1
    b = bs.pop()
    assert 0.0 <= b <= 1.0
    mbar = sum(round(r.raw_mean * 1e6) for r in rows) / k / 1e6
    s = sum(round((round(r.raw_mean * 1e6) / 1e6 - mbar) ** 2 * 1e3)
            for r in rows) / 1e3
    s2bar = sum(round(r.se2 * 1e3) for r in rows) / k / 1e3
    assert b == pytest.approx(max(0.0, 1 - (k - 3) * s2bar / s),
                              abs=2e-6)
    for r in rows:
        lo, hi = sorted((r.raw_mean, mbar))
        assert lo - 1e-5 <= r.js_mean <= hi + 1e-5
        dev = round(r.raw_mean * 1e6) / 1e6 - mbar
        # reported shrinkage is rounded 6dp; the operator applies the
        # unrounded factor, so tolerance scales with |dev|
        assert r.js_mean == pytest.approx(
            mbar + b * dev, abs=1e-6 * abs(dev) + 2e-5)


# ------------------------------------------------------- IPF raking

def test_ipf_margins_converge(spark, sf_dir):
    """After the final column sweep the SOURCE margin is matched
    exactly-by-construction; the residual lang-margin error shrank
    vs the unweighted sample and is small."""
    from qrapids_forecast_r_script_spark.operators.curation import (
        ipf_raking_weights)
    from qrapids_forecast_r_script_spark.sources import load_table
    rows = ipf_raking_weights(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "source").collect()
    t_src = Counter(r.source for r in docs)
    t_lang = Counter(r.lang for r in docs)
    # weighted source margins match targets (last sweep scaled them)
    wsrc = Counter()
    for r in rows:
        wsrc[r.source] += r.weight * r.n
    for srcname, tgt in t_src.items():
        assert wsrc[srcname] == pytest.approx(tgt, rel=1e-4)
    # lang residual: small relative to the margin, and every weight > 0
    for r in rows:
        assert r.weight > 0
        assert abs(r.lang_margin_err) < 0.05 * t_lang[r.lang]


# ---------------------------------------------- greedy max-coverage

def test_greedy_coverage_brute_force(spark, sf_dir):
    """The 3-round greedy trace replayed in python: same picks, same
    marginal gains, and gains are nonincreasing (submodularity of
    coverage under the greedy rule)."""
    from qrapids_forecast_r_script_spark.operators.curation import (
        greedy_coverage_selection)
    from qrapids_forecast_r_script_spark.sources import load_table
    got = greedy_coverage_selection(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text").collect()
    sets = {}
    for r in docs:
        toks = r.text.split(" ")
        sets[r.doc_id] = {f"{toks[i]} {toks[i + 1]}"
                          for i in range(len(toks) - 1)}
    covered = set()
    chosen = set()
    for r in got:
        best = max((d for d in sets if d not in chosen),
                   key=lambda d: (len(sets[d] - covered), -d))
        gain = len(sets[best] - covered)
        assert r.doc_id == best
        assert r.gain == gain
        covered |= sets[best]
        chosen.add(best)
    gains = [r.gain for r in got]
    assert gains == sorted(gains, reverse=True)


# ------------------------------------------- capture-recapture dedup

def test_capture_recapture_identities(spark, sf_dir):
    """overlap <= min(n1, n2); Chapman <= Lincoln-Petersen (the
    small-sample correction only shrinks); both estimates >= the
    larger capture."""
    from qrapids_forecast_r_script_spark.operators.dedup import (
        dedup_capture_recapture)
    r = dedup_capture_recapture(spark, sf_dir).collect()[0]
    assert r.overlap <= min(r.n_minhash, r.n_simhash)
    if r.overlap > 0:
        assert r.chapman_estimate <= r.lp_estimate + 1e-9
        assert r.lp_estimate >= max(r.n_minhash, r.n_simhash) - 1e-9


# ---------------------------------------------- Markov backtest

def test_markov_backtest_accuracy_bounds(spark, sf_dir):
    """hits <= n_eval per state; accuracy = hits/n_eval; the
    predicted state is a real event type."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import markov_next_event_accuracy
    rows = markov_next_event_accuracy(spark, sf_dir).collect()
    types = {"click", "error", "purchase", "signup", "view"}
    assert rows, "no post-cutoff transitions — vacuous fixture"
    for r in rows:
        assert 0 <= r.hits <= r.n_eval
        assert r.accuracy == pytest.approx(r.hits / r.n_eval, abs=1e-6)
        assert r.predicted_next in types
        assert r.n_train > 0


# -------------------------------------------------- item-item CF

def test_item_item_cf_brute_force(spark, sf_dir):
    """Cosines replayed in python for the first target; ranks respect
    (cosine desc, partkey asc); co_buyers <= min degree."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import item_item_cf_topk
    from qrapids_forecast_r_script_spark.sources import load_table
    got = item_item_cf_topk(spark, sf_dir).collect()
    orders = {r.o_orderkey: r.o_custkey
              for r in load_table(spark, sf_dir, "orders").collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey").collect()
    buyers = {}
    for r in li:
        buyers.setdefault(r.l_partkey, set()).add(orders[r.l_orderkey])
    t0 = got[0].target
    n_t = len(buyers[t0])
    exp = {}
    for item, bs in buyers.items():
        if item == t0:
            continue
        co = len(bs & buyers[t0])
        if co:
            exp[item] = (round(co / math.sqrt(n_t * len(bs)), 6), co)
    top5 = sorted(exp.items(), key=lambda kv: (-kv[1][0], kv[0]))[:5]
    mine = [r for r in got if r.target == t0]
    assert [(r.neighbor, (r.cosine, r.co_buyers)) for r in mine] == top5
    for r in got:
        assert r.co_buyers <= min(len(buyers[r.target]),
                                  len(buyers[r.neighbor]))


# ------------------------------------------------ QL-Dirichlet

def test_ql_dirichlet_vs_bm25_candidates(spark, sf_dir):
    """Each query returns exactly top-10 rows with strictly ranked
    scores (ties broken by neighbor id), and the scored value matches
    a python replay for the first (query, neighbor) row."""
    from qrapids_forecast_r_script_spark.operators.text import (
        ql_dirichlet_topk)
    from qrapids_forecast_r_script_spark.sources import load_table
    got = ql_dirichlet_topk(spark, sf_dir).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r.query_id, []).append(r)
    for q, rs in per_q.items():
        assert [r.rank for r in sorted(rs, key=lambda r: r.rank)] \
            == list(range(1, len(rs) + 1))
        srt = sorted(rs, key=lambda r: (-r.ql_score, r.neighbor_id))
        assert [r.rank for r in srt] == list(range(1, len(rs) + 1))
    r0 = got[0]
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text").collect()
    toks = {d.doc_id: d.text.split(" ") for d in docs}
    tf = {d: Counter(ts) for d, ts in toks.items()}
    cf = Counter(t for ts in toks.values() for t in ts)
    ctot = sum(cf.values())
    mu = 2000.0
    qterms = set(tf[r0.query_id])
    dl = len(toks[r0.neighbor_id])
    msum = sum(round(math.log(1 + tf[r0.neighbor_id][t]
                              / (mu * (cf[t] / ctot))) * 1e0, 6)
               for t in qterms if tf[r0.neighbor_id][t] > 0)
    msum = round(sum(round(math.log(1 + tf[r0.neighbor_id][t]
                                    / (mu * (cf[t] / ctot))), 6)
                     for t in qterms if tf[r0.neighbor_id][t] > 0), 6)
    bg = round(len(qterms) * math.log(mu / (dl + mu)), 6)
    assert r0.ql_score == pytest.approx(msum + bg, abs=2e-6)


# ------------------------------------------------------ WoE / IV

def test_woe_iv_identities(spark, sf_dir):
    """IV total equals the sum of per-nation terms; WoE sign agrees
    with good-share vs bad-share; IV terms are nonnegative."""
    from qrapids_forecast_r_script_spark.operators.training_prep import (
        woe_information_value)
    rows = woe_information_value(spark, sf_dir).collect()
    g = sum(r.good for r in rows)
    b = sum(r.bad for r in rows)
    iv_sum = sum(round(r.iv_term * 1e9) for r in rows) / 1e9
    for r in rows:
        assert r.iv_total == pytest.approx(iv_sum, abs=2e-9)
        assert r.iv_term >= 0
        pg = (r.good + 0.5) / (g + 1.0)
        pb = (r.bad + 0.5) / (b + 1.0)
        assert r.woe == pytest.approx(math.log(pg / pb), abs=2e-6)
        assert (r.woe >= 0) == (pg >= pb)


# -------------------------------------------------- rank-2 ALS sweep

def test_als_rank2_brute_force(spark, sf_dir):
    """The full user-then-item sweep replayed in python (same dyadic
    init, same snapping) reproduces every reported factor."""
    from qrapids_forecast_r_script_spark.operators.training_prep import (
        als_rank2_factors)
    from qrapids_forecast_r_script_spark.sources import load_table
    got = als_rank2_factors(spark, sf_dir).collect()
    orders = {r.o_orderkey: r.o_custkey
              for r in load_table(spark, sf_dir, "orders").collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey").collect()
    ratings = Counter((orders[r.l_orderkey], r.l_partkey) for r in li)
    M, H, lam = 4294967296, 2147483648, 0.1
    by_user = {}
    for (u, i), r in ratings.items():
        by_user.setdefault(u, []).append((i, r))
    users = {}
    for u, items in by_user.items():
        n = len(items)
        sf = sum((i * 2654435761) % M - H for i, _ in items)
        sff = sum(((i * 2654435761) % M - H) ** 2 for i, _ in items)
        sr = sum(r for _, r in items)
        srf = sum(r * ((i * 2654435761) % M - H) for i, r in items)
        a11, a12, a22 = n + lam, sf / M, sff / M / M + lam
        b1, b2 = float(sr), srf / M
        det = a11 * a22 - a12 * a12
        users[u] = (round((a22 * b1 - a12 * b2) / det * 1e9) / 1e9,
                    round((a11 * b2 - a12 * b1) / det * 1e9) / 1e9)
    by_item = {}
    for (u, i), r in ratings.items():
        by_item.setdefault(i, []).append((u, r))
    exp = {}
    for i, us in by_item.items():
        s11 = sum(round(users[u][0] * users[u][0] * 1e12)
                  for u, _ in us) / 1e12
        s12 = sum(round(users[u][0] * users[u][1] * 1e12)
                  for u, _ in us) / 1e12
        s22 = sum(round(users[u][1] * users[u][1] * 1e12)
                  for u, _ in us) / 1e12
        t1 = sum(round(r * users[u][0] * 1e12) for u, r in us) / 1e12
        t2 = sum(round(r * users[u][1] * 1e12) for u, r in us) / 1e12
        a11, a12, a22 = s11 + lam, s12, s22 + lam
        det = a11 * a22 - a12 * a12
        exp[i] = (len(us),
                  round((a22 * t1 - a12 * t2) / det, 6),
                  round((a11 * t2 - a12 * t1) / det, 6))
    for r in got:
        n, q1, q2 = exp[r.p_partkey]
        assert r.n_ratings == n
        assert r.q1 == pytest.approx(q1, abs=2e-6)
        assert r.q2 == pytest.approx(q2, abs=2e-6)
    tops = sorted(exp.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    assert [r.p_partkey for r in got] == [i for i, _ in tops]


def test_als_rank2_reduces_loss_on_synthetic(spark):
    """On a tiny separable matrix the ALS-updated item factors
    reconstruct ratings better than the init (squared loss drops) —
    the monotone-improvement property of the alternating step."""
    import math as m
    M, H, lam = 4294967296, 2147483648, 0.1
    ratings = {(1, 10): 5, (1, 11): 1, (2, 10): 5, (2, 11): 1,
               (3, 10): 1, (3, 11): 5}
    f = {i: ((i * 2654435761) % M - H) / M for i in (10, 11)}
    users = {}
    for u in (1, 2, 3):
        items = [(i, r) for (uu, i), r in ratings.items() if uu == u]
        a11 = len(items) + lam
        a12 = sum(f[i] for i, _ in items)
        a22 = sum(f[i] ** 2 for i, _ in items) + lam
        b1 = sum(r for _, r in items)
        b2 = sum(r * f[i] for i, r in items)
        det = a11 * a22 - a12 * a12
        users[u] = ((a22 * b1 - a12 * b2) / det,
                    (a11 * b2 - a12 * b1) / det)
    qs = {}
    for i in (10, 11):
        us = [(u, r) for (u, ii), r in ratings.items() if ii == i]
        s11 = sum(users[u][0] ** 2 for u, _ in us) + lam
        s12 = sum(users[u][0] * users[u][1] for u, _ in us)
        s22 = sum(users[u][1] ** 2 for u, _ in us) + lam
        t1 = sum(r * users[u][0] for u, r in us)
        t2 = sum(r * users[u][1] for u, r in us)
        det = s11 * s22 - s12 * s12
        qs[i] = ((s22 * t1 - s12 * t2) / det,
                 (s11 * t2 - s12 * t1) / det)
    loss_init = sum((r - (users[u][0] + users[u][1] * f[i])) ** 2
                    for (u, i), r in ratings.items())
    loss_new = sum(
        (r - (users[u][0] * qs[i][0] + users[u][1] * qs[i][1])) ** 2
        for (u, i), r in ratings.items())
    assert loss_new < loss_init


# ---------------------------------------------- analog window search

def test_analog_search_invariance_and_order(spark, sf_dir):
    """Distances are nondecreasing in rank; no window at/after the
    query start in the purchase series; z-normalized self-distance
    of the query to itself would be 0 (scale/shift invariance checked
    on a synthetic affine copy)."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import series_analog_search
    rows = series_analog_search(spark, sf_dir).collect()
    assert len(rows) == 5
    dists = [r.dist for r in rows]
    assert dists == sorted(dists)
    import numpy as np
    base = np.array([3.0, 7, 1, 9, 4, 6, 2])
    affine = 10 + 5 * base
    z = lambda v: (v - v.mean()) / v.std()
    assert float(np.abs(z(base) - z(affine)).max()) < 1e-12


# ------------------------------------------------------- 1-D EMD

def test_emd_brute_force(spark, sf_dir):
    """W1 per source replayed in python via the CDF-gap integral with
    the same snapping; EMD of the pool against itself is zero."""
    from qrapids_forecast_r_script_spark.operators.data_quality import (
        source_length_emd)
    from qrapids_forecast_r_script_spark.sources import load_table
    got = {r.source: r.emd_chars
           for r in source_length_emd(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "n_chars").collect()
    support = sorted({r.n_chars for r in docs})
    n_all = len(docs)
    by_src = {}
    for r in docs:
        by_src.setdefault(r.source, []).append(r.n_chars)
    pool_counts = Counter(r.n_chars for r in docs)
    for src, lens in by_src.items():
        cnt = Counter(lens)
        fs = fa = 0.0
        su = 0
        for v, nxt in zip(support, support[1:]):
            fs += cnt.get(v, 0) / len(lens)
            fa += pool_counts[v] / n_all
            su += round(abs(fs - fa) * (nxt - v) * 1e9)
        assert got[src] == pytest.approx(su / 1e9, abs=2e-6), src


# ---------------------------------------------------- Bradley-Terry

def test_bradley_terry_brute_force(spark, sf_dir):
    """Two MM iterations replayed in python reproduce every strength;
    strengths sum to 1; more wins on a dominated schedule => higher
    strength on a synthetic round-robin."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import bradley_terry_strengths
    from qrapids_forecast_r_script_spark.sources import load_table
    got = bradley_terry_strengths(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")).collect()
    daily = Counter((r.event_type, r.day) for r in ev)
    types = sorted({t for t, _ in daily})
    days = sorted({d for _, d in daily})
    wins = Counter()
    n = Counter()
    for d in days:
        for x in range(len(types)):
            for y in range(x + 1, len(types)):
                ca, cb = daily.get((types[x], d), 0), \
                    daily.get((types[y], d), 0)
                if ca > cb:
                    wins[types[x]] += 1
                    n[(types[x], types[y])] += 1
                elif cb > ca:
                    wins[types[y]] += 1
                    n[(types[x], types[y])] += 1
    sym = {}
    for (i, j), c in n.items():
        sym[(i, j)] = sym[(j, i)] = c
    p = {t: 1.0 for t in types}
    for _ in range(2):
        den = {}
        for i in types:
            den[i] = sum(round(c / (p[i] + p[j]) * 1e9)
                         for (ii, j), c in sym.items() if ii == i)
        raw = {i: round(wins[i] / (den[i] / 1e9) * 1e9) for i in types}
        su = sum(raw.values())
        p = {i: round(raw[i] / su, 9) for i in types}
    for r in got:
        assert r.strength == pytest.approx(p[r.event_type], abs=2e-6)
        assert r.wins == wins[r.event_type]
    assert sum(r.strength for r in got) == pytest.approx(1.0, abs=1e-4)


# -------------------------------------------------- HMM forward

def test_hmm_forward_brute_force(spark, sf_dir):
    """The scaled forward recursion replayed in python reproduces
    every filtered posterior and the running log-likelihood; the
    posterior responds to the observation direction (p_busy higher
    after a high day than after a low day from the same state)."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import hmm_forward_filter
    from qrapids_forecast_r_script_spark.sources import load_table
    got = hmm_forward_filter(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")).collect()
    daily = Counter(r.day for r in ev if r.event_type == "purchase")
    days = sorted(daily)
    cs = sorted(daily[d] for d in days)
    n = len(cs)
    med = (cs[n // 2] if n % 2 else (cs[n // 2 - 1] + cs[n // 2]) / 2)
    A = (0.8, 0.2, 0.3, 0.7)
    E1 = (0.3, 0.7)
    a0 = a1 = 0.5
    llu = 0
    exp = {}
    for t, d in enumerate(days, 1):
        o = 1 if daily[d] > med else 0
        b0 = E1[0] if o == 1 else 1 - E1[0]
        b1 = E1[1] if o == 1 else 1 - E1[1]
        if t == 1:
            u0, u1 = 0.5 * b0, 0.5 * b1
        else:
            u0 = (a0 * A[0] + a1 * A[2]) * b0
            u1 = (a0 * A[1] + a1 * A[3]) * b1
        c = u0 + u1
        a0, a1 = round(u0 / c, 9), round(u1 / c, 9)
        llu += round(math.log(c) * 1e6)
        exp[t] = (o, round(a1, 6), round(llu / 1e6, 6))
    for r in got:
        o, p, ll = exp[r.t]
        assert r.obs_high == o
        assert r.p_busy == pytest.approx(p, abs=2e-6)
        assert r.loglik == pytest.approx(ll, abs=2e-6)
    for r in got:
        assert 0.0 <= r.p_busy <= 1.0
        assert r.loglik <= 0.0


# ------------------------------------------------------ GMM-EM

def test_gmm_em_brute_force(spark, sf_dir):
    """Both unrolled EM iterations replayed in python with the same
    snapping reproduce (pi, mu, sigma2); mixing weights sum to 1 and
    variances are positive."""
    from qrapids_forecast_r_script_spark.operators.text_quality import (
        doc_length_gmm)
    from qrapids_forecast_r_script_spark.sources import load_table
    got = {r.k: (r.pi, r.mu, r.sigma2)
           for r in doc_length_gmm(spark, sf_dir).collect()}
    lens = [r.n_chars for r in
            load_table(spark, sf_dir, "documents").collect()]
    xs = [round(math.log(v), 6) for v in lens]
    ss = sorted(xs)
    n = len(ss)
    med = ss[n // 2] if n % 2 else (ss[n // 2 - 1] + ss[n // 2]) / 2
    groups = {0: [x for x in xs if x > med],
              1: [x for x in xs if x <= med]}
    params = {}
    for k, g in groups.items():
        sx = sum(round(x * 1e9) for x in g) / 1e9
        sxx = sum(round(x * x * 1e9) for x in g) / 1e9
        params[k] = (len(g) / n, sx / len(g),
                     sxx / len(g) - (sx / len(g)) ** 2)
    for _ in range(2):
        pi0, mu0, s20 = params[0]
        pi1, mu1, s21 = params[1]
        sr0 = srx0 = srxx0 = sr1 = srx1 = srxx1 = 0
        for x in xs:
            d0 = pi0 / math.sqrt(s20) * math.exp(
                -(x - mu0) ** 2 / (2 * s20))
            d1 = pi1 / math.sqrt(s21) * math.exp(
                -(x - mu1) ** 2 / (2 * s21))
            r0 = round(d0 / (d0 + d1), 9)
            sr0 += round(r0 * 1e9)
            srx0 += round(r0 * x * 1e9)
            srxx0 += round(r0 * x * x * 1e9)
            sr1 += round((1 - r0) * 1e9)
            srx1 += round((1 - r0) * x * 1e9)
            srxx1 += round((1 - r0) * x * x * 1e9)
        params = {
            0: (sr0 / 1e9 / n, srx0 / sr0,
                srxx0 / sr0 - (srx0 / sr0) ** 2),
            1: (sr1 / 1e9 / n, srx1 / sr1,
                srxx1 / sr1 - (srx1 / sr1) ** 2)}
    for k in (0, 1):
        assert got[k][0] == pytest.approx(params[k][0], abs=2e-6)
        assert got[k][1] == pytest.approx(params[k][1], abs=2e-6)
        assert got[k][2] == pytest.approx(params[k][2], abs=2e-6)
    assert got[0][0] + got[1][0] == pytest.approx(1.0, abs=1e-5)
    assert got[0][2] > 0 and got[1][2] > 0


# ----------------------------------------------------- TextRank

def test_textrank_brute_force(spark, sf_dir):
    """Two weighted-PageRank sweeps replayed in python reproduce the
    top-20 trace; scores exceed the damping floor 1-d."""
    from qrapids_forecast_r_script_spark.operators.text import (
        textrank_keywords)
    from qrapids_forecast_r_script_spark.sources import load_table
    got = textrank_keywords(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "text").collect()
    pairs = Counter()
    for r in docs:
        ts = r.text.split(" ")
        for a, b in zip(ts, ts[1:]):
            if a != b:
                pairs[(a, b)] += 1
    edges = Counter()
    for (a, b), c in pairs.items():
        edges[(a, b)] += c
        edges[(b, a)] += c
    wdeg = Counter()
    for (srcw, _), c in edges.items():
        wdeg[srcw] += c
    s = {wrd: 1.0 for wrd in wdeg}
    for _ in range(2):
        su = Counter()
        for (srcw, dstw), c in edges.items():
            su[dstw] += round(c * (s[srcw] / wdeg[srcw]) * 1e9)
        s = {wrd: round(0.15 + 0.85 * su[wrd] / 1e9, 9)
             for wrd in wdeg}
    top = sorted(s.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    for r, (wrd, sc) in zip(got, top):
        assert r.word == wrd
        assert r.score == pytest.approx(round(sc, 6), abs=2e-6)
        assert r.score > 0.15


# -------------------------------------- consistent-hash rebalance

def test_consistent_hash_moves_few_modn_moves_most(spark, sf_dir):
    """Ring resharding 8->9 moves a small fraction (every mover lands
    on the NEW shard only — that is the consistent-hashing theorem);
    mod-N moves the large majority; counts replayed in python."""
    import hashlib
    from qrapids_forecast_r_script_spark.operators.scale_patterns \
        import consistent_hash_rebalance
    from qrapids_forecast_r_script_spark.sources import load_table
    got = consistent_hash_rebalance(spark, sf_dir).collect()
    n_total = sum(r.n_docs for r in got)
    moved_ring = sum(r.n_moved_ring for r in got)
    moved_modn = sum(r.n_moved_modn for r in got)
    assert moved_ring / n_total < 0.35
    assert moved_modn / n_total > 0.7
    assert moved_modn > moved_ring

    def md5h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def ring(n):
        return sorted(((md5h(f"ring:{i % n}:{i // n}"), i % n)
                       for i in range(n * 8)))

    def assign(h, rg):
        prev = [s for rh, s in rg if rh <= h]
        return prev[-1] if prev else rg[0][1]

    docs = [r.doc_id for r in
            load_table(spark, sf_dir, "documents").collect()]
    r8, r9 = ring(8), ring(9)
    from collections import Counter as C
    per = {}
    for d in docs:
        h = md5h(str(d))
        s8, s9 = assign(h, r8), assign(h, r9)
        a = per.setdefault(s8, [0, 0, 0, 0])
        a[0] += 1
        a[1] += s8 == s9
        a[2] += s8 != s9
        a[3] += (h % 8) != (h % 9)
    for r in got:
        assert per[r.shard] == [r.n_docs, r.n_stay, r.n_moved_ring,
                                r.n_moved_modn], r.shard


# ------------------------------------------------- meta-analysis

def test_meta_analysis_brute_force(spark, sf_dir):
    """Pooled effect, Q, and I² replayed in python from raw orders;
    the pooled effect lies inside the span of the stratum effects."""
    import hashlib
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import meta_analysis_nations
    from qrapids_forecast_r_script_spark.sources import load_table
    got = meta_analysis_nations(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice").collect()
    cust = {r.c_custkey: r.c_nationkey
            for r in load_table(spark, sf_dir, "customer").collect()}
    cells = {}
    for o in orders:
        arm = int(hashlib.md5(str(o.o_custkey).encode())
                  .hexdigest()[:8], 16) % 2
        yc = round(o.o_totalprice * 100)
        n, s, ss = cells.get((cust[o.o_custkey], arm), (0, 0, 0))
        cells[(cust[o.o_custkey], arm)] = (n + 1, s + yc,
                                           ss + yc * yc)
    kept = {}
    for nk in {k for k, _ in cells}:
        if (nk, 0) not in cells or (nk, 1) not in cells:
            continue
        na, sa, ssa = cells[(nk, 0)]
        nb, sb, ssb = cells[(nk, 1)]
        if na < 2 or nb < 2:
            continue
        ma, mb = sa / na / 100, sb / nb / 100
        va = (na * ssa - sa * sa) / (na * (na - 1)) / 10000
        vb = (nb * ssb - sb * sb) / (nb * (nb - 1)) / 10000
        theta = round((ma - mb) * 1e6) / 1e6
        w = round(1.0 / (va / na + vb / nb) * 1e9) / 1e9
        kept[nk] = (theta, w)
    sw = sum(round(w * 1e9) for _, w in kept.values()) / 1e9
    swt = sum(round(w * t * 1e6) for t, w in kept.values()) / 1e6
    pooled = swt / sw
    q = sum(round(w * (t - pooled) ** 2 * 1e6)
            for t, w in kept.values()) / 1e6
    k = len(kept)
    i2 = max(0.0, (q - (k - 1)) / q)
    lo = min(t for t, _ in kept.values())
    hi = max(t for t, _ in kept.values())
    for r in got:
        t, w = kept[r.nationkey]
        assert r.theta == pytest.approx(t, abs=2e-6)
        assert r.weight == pytest.approx(w, abs=2e-6)
        assert r.pooled_effect == pytest.approx(pooled, abs=2e-5)
        assert r.cochran_q == pytest.approx(q, abs=2e-4)
        assert r.i_squared == pytest.approx(i2, abs=2e-5)
        assert r.k_strata == k
        assert lo - 1e-9 <= r.pooled_effect <= hi + 1e-9


# ---------------------------------------------- HMM smoothing

def test_hmm_smoother_brute_force(spark, sf_dir):
    """Forward-backward gamma replayed in python; the last day's
    smoothed posterior equals its filtered posterior (beta_T is
    uniform); smoothing actually differs from filtering on at least
    one interior day (the future revises history)."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import hmm_smoothed_posterior
    from qrapids_forecast_r_script_spark.sources import load_table
    got = hmm_smoothed_posterior(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")).collect()
    daily = Counter(r.day for r in ev if r.event_type == "purchase")
    days = sorted(daily)
    cs = sorted(daily[d] for d in days)
    n = len(cs)
    med = (cs[n // 2] if n % 2 else (cs[n // 2 - 1] + cs[n // 2]) / 2)
    obs = [1 if daily[d] > med else 0 for d in days]
    A = (0.8, 0.2, 0.3, 0.7)
    E1 = (0.3, 0.7)

    def b(o):
        return (E1[0] if o else 1 - E1[0],
                E1[1] if o else 1 - E1[1])

    al = []
    a0 = a1 = 0.5
    for t, o in enumerate(obs):
        b0, b1 = b(o)
        if t == 0:
            u0, u1 = 0.5 * b0, 0.5 * b1
        else:
            u0 = (a0 * A[0] + a1 * A[2]) * b0
            u1 = (a0 * A[1] + a1 * A[3]) * b1
        c = u0 + u1
        a0, a1 = round(u0 / c, 9), round(u1 / c, 9)
        al.append((a0, a1))
    be = [None] * n
    v0 = v1 = 0.5
    be[n - 1] = (v0, v1)
    for t in range(n - 2, -1, -1):
        b0, b1 = b(obs[t + 1])
        u0 = A[0] * b0 * v0 + A[1] * b1 * v1
        u1 = A[2] * b0 * v0 + A[3] * b1 * v1
        c = u0 + u1
        v0, v1 = round(u0 / c, 9), round(u1 / c, 9)
        be[t] = (v0, v1)
    diff = 0
    for r in got:
        t = r.t - 1
        g = al[t][1] * be[t][1] / (al[t][0] * be[t][0]
                                   + al[t][1] * be[t][1])
        assert r.p_busy_smoothed == pytest.approx(round(g, 6),
                                                  abs=2e-6)
        assert r.p_busy_filtered == pytest.approx(round(al[t][1], 6),
                                                  abs=2e-6)
        if abs(r.p_busy_smoothed - r.p_busy_filtered) > 1e-4:
            diff += 1
    last = max(got, key=lambda r: r.t)
    assert last.p_busy_smoothed == pytest.approx(
        last.p_busy_filtered, abs=2e-6)
    assert diff > 0


# ------------------------------------------------ learning curve

def test_nb_learning_curve_properties(spark, sf_dir):
    """Nested slices: train counts strictly increase with the
    fraction; eval-set size is identical across rows; accuracy stays
    in [0, 1]; the 75% model beats or ties the 25% model (more data
    should not hurt on this separable fixture)."""
    from qrapids_forecast_r_script_spark.operators.training_prep \
        import nb_learning_curve
    rows = {r.train_pct: r
            for r in nb_learning_curve(spark, sf_dir).collect()}
    assert sorted(rows) == [25, 50, 75]
    assert rows[25].n_train_docs < rows[50].n_train_docs \
        < rows[75].n_train_docs
    assert rows[25].n_train_tokens < rows[75].n_train_tokens
    sizes = {r.n_eval_docs for r in rows.values()}
    assert len(sizes) == 1
    for r in rows.values():
        assert 0.0 <= r.accuracy <= 1.0
        assert r.accuracy == pytest.approx(r.hits / r.n_eval_docs,
                                           abs=1e-6)
    assert rows[75].accuracy >= rows[25].accuracy - 0.02


# ------------------------------------------------------ QTE

def test_qte_brute_force_and_aa_flatness(spark, sf_dir):
    """Decile quantiles replayed with numpy's linear interpolation;
    the md5 A/A-style split keeps |QTE| small relative to the scale
    of order values."""
    import hashlib
    import numpy as np
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import ab_quantile_treatment_effects
    from qrapids_forecast_r_script_spark.sources import load_table
    got = ab_quantile_treatment_effects(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice").collect()
    arms = {0: [], 1: []}
    for o in orders:
        a = int(hashlib.md5(str(o.o_custkey).encode())
                .hexdigest()[:8], 16) % 2
        arms[a].append(round(o.o_totalprice * 100))
    for r in got:
        tau = r.decile_pct / 100
        qa = float(np.percentile(arms[0], tau * 100,
                                 method="linear"))
        qb = float(np.percentile(arms[1], tau * 100,
                                 method="linear"))
        assert r.q_arm_a == pytest.approx(round(qa / 100, 6),
                                          abs=2e-6)
        assert r.q_arm_b == pytest.approx(round(qb / 100, 6),
                                          abs=2e-6)
        assert r.qte == pytest.approx(round((qa - qb) / 100, 6),
                                      abs=3e-6)
    scale = max(abs(r.q_arm_a) for r in got)
    assert all(abs(r.qte) < 0.25 * scale for r in got)


# ------------------------------------------------------ MDE table

def test_mde_formula_and_monotonicity(spark, sf_dir):
    """MDE replayed from the reported n/sd; bigger strata resolve
    smaller relative effects (mde_rel anti-correlates with n across
    the extremes)."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import ab_power_mde_table
    rows = ab_power_mde_table(spark, sf_dir).collect()
    z = 1.959963984540054 + 0.8416212335729143
    for r in rows:
        exp = z * math.sqrt(2 * r.sd_value ** 2 / r.n_per_arm)
        assert r.mde_abs == pytest.approx(exp, rel=1e-4)
        assert r.mde_rel == pytest.approx(r.mde_abs / r.mean_value,
                                          rel=1e-4)
        assert r.n_per_arm == r.n_orders // 2
    big = max(rows, key=lambda r: r.n_orders)
    small = min(rows, key=lambda r: r.n_orders)
    if big.n_orders > 2 * small.n_orders:
        assert big.mde_rel < small.mde_rel


# ---------------------------------------------- Baum-Welch M-step

def test_baum_welch_row_stochastic_and_replay(spark, sf_dir):
    """A' rows sum to 1 exactly (numerators partition the
    denominator); xi/gamma sums replayed in python reproduce every
    output; e'_high differs by state (the step actually separates
    the regimes)."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import hmm_baum_welch_step
    from qrapids_forecast_r_script_spark.sources import load_table
    got = {(r.from_state, r.to_state): r
           for r in hmm_baum_welch_step(spark, sf_dir).collect()}
    for i in (0, 1):
        assert got[(i, 0)].a_new + got[(i, 1)].a_new \
            == pytest.approx(1.0, abs=2e-6)
        assert got[(i, 0)].sum_gamma == got[(i, 1)].sum_gamma
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")).collect()
    daily = Counter(r.day for r in ev if r.event_type == "purchase")
    days = sorted(daily)
    cs = sorted(daily[d] for d in days)
    n = len(cs)
    med = (cs[n // 2] if n % 2 else (cs[n // 2 - 1] + cs[n // 2]) / 2)
    obs = [1 if daily[d] > med else 0 for d in days]
    A = {(0, 0): 0.8, (0, 1): 0.2, (1, 0): 0.3, (1, 1): 0.7}
    E1 = (0.3, 0.7)

    def b(o):
        return (E1[0] if o else 1 - E1[0],
                E1[1] if o else 1 - E1[1])

    al = []
    a0 = a1 = 0.5
    for t, o in enumerate(obs):
        b0, b1 = b(o)
        if t == 0:
            u0, u1 = 0.5 * b0, 0.5 * b1
        else:
            u0 = (a0 * A[(0, 0)] + a1 * A[(1, 0)]) * b0
            u1 = (a0 * A[(0, 1)] + a1 * A[(1, 1)]) * b1
        c = u0 + u1
        a0, a1 = round(u0 / c, 9), round(u1 / c, 9)
        al.append((a0, a1))
    be = [None] * n
    v0 = v1 = 0.5
    be[n - 1] = (v0, v1)
    for t in range(n - 2, -1, -1):
        b0, b1 = b(obs[t + 1])
        u0 = A[(0, 0)] * b0 * v0 + A[(0, 1)] * b1 * v1
        u1 = A[(1, 0)] * b0 * v0 + A[(1, 1)] * b1 * v1
        c = u0 + u1
        v0, v1 = round(u0 / c, 9), round(u1 / c, 9)
        be[t] = (v0, v1)
    sxi = Counter()
    sg = Counter()
    sg_hi = Counter()
    for t in range(n - 1):
        bn = b(obs[t + 1])
        us = {}
        for i in (0, 1):
            for j in (0, 1):
                us[(i, j)] = (al[t][i] * A[(i, j)] * bn[j]
                              * be[t + 1][j])
        tot = sum(us.values())
        for k, u in us.items():
            xi = round(u / tot * 1e9)
            sxi[k] += xi
            sg[k[0]] += xi
            if obs[t] == 1:
                sg_hi[k[0]] += xi
    for (i, j), r in got.items():
        assert r.sum_xi == pytest.approx(sxi[(i, j)] / 1e9, abs=2e-6)
        assert r.sum_gamma == pytest.approx(sg[i] / 1e9, abs=2e-6)
        assert r.a_new == pytest.approx(sxi[(i, j)] / sg[i], abs=2e-6)
        assert r.e_high_new == pytest.approx(sg_hi[i] / sg[i],
                                             abs=2e-6)
    assert abs(got[(0, 0)].e_high_new - got[(1, 0)].e_high_new) > 0.05


# -------------------------------------------------- Platt scaling

def test_platt_newton_descends_and_calibrates(spark, sf_dir):
    """Mean log-loss strictly decreases across the Newton trace; the
    fitted slope is positive (higher NB score -> higher target
    probability); the start row is (0, 0) with ln(2) loss."""
    from qrapids_forecast_r_script_spark.operators.training_prep \
        import platt_scaling_fit
    rows = sorted(platt_scaling_fit(spark, sf_dir).collect(),
                  key=lambda r: r.step)
    assert rows[0].a == 0.0 and rows[0].b == 0.0
    assert rows[0].mean_logloss == pytest.approx(math.log(2),
                                                 abs=1e-5)
    losses = [r.mean_logloss for r in rows]
    assert losses == sorted(losses, reverse=True)
    assert losses[0] > losses[-1]
    assert rows[-1].a > 0


# -------------------------------------------------- Dickey-Fuller

def test_dickey_fuller_brute_force(spark, sf_dir):
    """tau replayed with numpy OLS on the same snapped series; a
    synthetic stationary AR(0.2) series rejects the unit root while
    a pure random walk does not (closed-form check of the statistic
    on constructed data)."""
    import numpy as np
    from qrapids_forecast_r_script_spark.forecast.queries import (
        series_dickey_fuller, _metrics)
    got = {(r.name, r["index"]): r
           for r in series_dickey_fuller(spark, sf_dir).collect()}
    pdf = _metrics(spark, sf_dir).toPandas()
    for (name, index), g in pdf.groupby(["name", "index"]):
        y = np.round(np.round(g.sort_values("evaluationDate")
                     .value.to_numpy(dtype=float), 6) * 1e6) / 1e6
        x = y[:-1]
        d = np.diff(y)
        m = len(d)
        X = np.column_stack([np.ones(m), x])
        beta, res, *_ = np.linalg.lstsq(X, d, rcond=None)
        gam = beta[1]
        resid = d - X @ beta
        s2 = (resid @ resid) / (m - 2)
        den = m * (x @ x) - x.sum() ** 2
        se = math.sqrt(s2 * m / den)
        r = got[(name, index)]
        assert r.tau == pytest.approx(gam / se, abs=5e-4), (name,
                                                            index)
        assert r.n_diffs == m

    def tau_of(y):
        y = np.asarray(y, dtype=float)
        x, d = y[:-1], np.diff(y)
        m = len(d)
        X = np.column_stack([np.ones(m), x])
        beta, *_ = np.linalg.lstsq(X, d, rcond=None)
        resid = d - X @ beta
        s2 = (resid @ resid) / (m - 2)
        den = m * (x @ x) - x.sum() ** 2
        return beta[1] / math.sqrt(s2 * m / den)

    import hashlib as _hl
    # md5-derived increments: independent-uniform-like, so the walk's
    # variance actually accumulates (a Weyl sequence's partial sums
    # stay bounded and would look stationary)
    rng = [int(_hl.md5(str(i).encode()).hexdigest()[:8], 16)
           / 4294967296 - 0.5 for i in range(1, 401)]
    ar = [0.0]
    for e in rng:
        ar.append(0.2 * ar[-1] + e)
    walk = [0.0]
    for e in rng:
        walk.append(walk[-1] + e)
    crit = -2.86154 - 2.8903 / 400 - 4.234 / 400 ** 2
    assert tau_of(ar) < crit          # stationary: reject unit root
    assert tau_of(walk) > crit        # random walk: fail to reject


# ----------------------------------------------- Mahalanobis

def test_mahalanobis_brute_force(spark, sf_dir):
    """Top-20 distances replayed with numpy's covariance inverse;
    d2 is scale-invariant in construction (ranks match a z-scored
    replay) and every reported row beats the 21st distance."""
    import numpy as np
    from qrapids_forecast_r_script_spark.operators.data_quality \
        import mahalanobis_outliers
    from qrapids_forecast_r_script_spark.sources import load_table
    got = mahalanobis_outliers(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice").collect()
    q = np.array([float(int(r.l_quantity)) for r in li])
    p = np.array([round(r.l_extendedprice * 100) / 100 for r in li])
    mx, my = q.mean(), p.mean()
    n = len(q)
    vxx = ((q * q).sum() - n * mx * mx) / (n - 1)
    vxy = ((q * p).sum() - n * mx * my) / (n - 1)
    vyy = ((p * p).sum() - n * my * my) / (n - 1)
    det = vxx * vyy - vxy * vxy
    d2 = np.round((vyy * (q - mx) ** 2 - 2 * vxy * (q - mx) * (p - my)
                   + vxx * (p - my) ** 2) / det, 6)
    keys = [(-d2[i], li[i].l_orderkey, li[i].l_linenumber, i)
            for i in range(n)]
    keys.sort()
    for rank, r in enumerate(got, 1):
        _, ok, ln, i = keys[rank - 1]
        assert (r.l_orderkey, r.l_linenumber) == (ok, ln), rank
        assert r.d2 == pytest.approx(d2[i], abs=2e-6)
        assert r.extreme_999 == bool(d2[i] > 13.8)


# ------------------------------------------------ weak label model

def test_weak_label_model_brute_force(spark, sf_dir):
    """Votes, accuracies, weights, and the flip count replayed in
    python; accuracy order matches weight order (monotone log-odds);
    every estimated accuracy > 0.5 (LFs agree with their majority
    more often than not by construction)."""
    from qrapids_forecast_r_script_spark.operators.training_prep \
        import weak_label_model
    from qrapids_forecast_r_script_spark.sources import load_table
    got = {r.labeling_fn: r
           for r in weak_label_model(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").collect()
    per = []
    for d in docs:
        ts = d.text.split(" ")
        per.append((d.doc_id, d.source, d.n_chars, len(ts),
                    len(set(ts))))
    from collections import defaultdict
    ssum = defaultdict(lambda: [0, 0])
    for _, src, nc, _, _ in per:
        ssum[src][0] += nc
        ssum[src][1] += 1
    smean = {s: a / b for s, (a, b) in ssum.items()}
    tok_mean = sum(p[3] for p in per) / len(per)
    dr_mean = sum(p[4] / p[3] for p in per) / len(per)
    votes = []
    for _, src, nc, nt, nd in per:
        v1 = 1 if nc > smean[src] else -1
        v2 = 1 if nd / nt > dr_mean else -1
        v3 = 1 if nt > tok_mean else -1
        mv = 1 if v1 + v2 + v3 > 0 else -1
        votes.append((v1, v2, v3, mv))
    n = len(votes)
    hs = [sum(1 for v in votes if v[i] == v[3]) for i in range(3)]
    accs = [(h + 1) / (n + 2) for h in hs]
    ws = [round(math.log(a / (1 - a)) * 1e9) for a in accs]
    flips = sum(1 for v in votes
                if (1 if v[0] * ws[0] + v[1] * ws[1] + v[2] * ws[2]
                    > 0 else -1) != v[3])
    names = ["source_rel_length", "distinct_ratio", "token_count"]
    for i, nm in enumerate(names):
        r = got[nm]
        assert r.agree_mv == hs[i]
        assert r.est_accuracy == pytest.approx(round(accs[i], 6),
                                               abs=2e-6)
        assert r.weight == pytest.approx(ws[i] / 1e9, abs=2e-6)
        assert r.n_flipped == flips
        # log-odds weighting handles ANTI-correlated LFs by negative
        # weight (sign flip), so accuracy and weight agree in sign
        # around 0.5 — the reason the model beats raw majority
        assert (r.est_accuracy > 0.5) == (r.weight > 0)
    order_acc = sorted(names, key=lambda nm: got[nm].est_accuracy)
    order_w = sorted(names, key=lambda nm: got[nm].weight)
    assert order_acc == order_w
    # this fixture contains one anti-correlated LF (distinct ratio
    # falls as length rises) — the model must invert it
    assert got["distinct_ratio"].weight < 0


# ---------------------------------------------- circular statistics

def test_circular_stats_brute_force(spark, sf_dir):
    """Mean hour / R-bar replayed in python; a synthetic two-point
    23:00+01:00 set has circular mean 0:00 (where the arithmetic
    mean says noon) — the reason circular statistics exist."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import event_time_circular_stats
    from qrapids_forecast_r_script_spark.sources import load_table
    got = {r.event_type: r
           for r in event_time_circular_stats(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts").collect()
    from collections import defaultdict
    acc = defaultdict(lambda: [0, 0, 0])
    two_pi = 6.283185307179586
    for r in ev:
        sod = r.ts.hour * 3600 + r.ts.minute * 60 + r.ts.second
        th = sod / 86400.0 * two_pi
        a = acc[r.event_type]
        a[0] += round(math.cos(th) * 1e9)
        a[1] += round(math.sin(th) * 1e9)
        a[2] += 1
    for t, (sc, ss, n) in acc.items():
        c, s = sc / 1e9, ss / 1e9
        rbar = math.sqrt(c * c + s * s) / n
        mh = (math.atan2(s, c) % two_pi) / two_pi * 24
        r = got[t]
        assert r.n == n
        assert r.resultant_r == pytest.approx(rbar, abs=2e-6)
        assert r.mean_hour == pytest.approx(mh, abs=2e-5)
        assert r.rayleigh_z == pytest.approx(n * rbar * rbar,
                                             abs=2e-4)
    c = math.cos(23 / 24 * two_pi) + math.cos(1 / 24 * two_pi)
    s = math.sin(23 / 24 * two_pi) + math.sin(1 / 24 * two_pi)
    mh = (math.atan2(s, c) % two_pi) / two_pi * 24
    assert min(mh, 24 - mh) < 1e-9          # circular mean: midnight
    assert abs((23 + 1) / 2 - 12) < 1e-9    # arithmetic mean: noon


# -------------------------------------------------- Viterbi decode

def test_viterbi_brute_force_and_vs_smoothing(spark, sf_dir):
    """The MAP path replayed in python (max-product with the same
    snapping and tie rule); the path is the joint argmax so its
    day-wise states may legally disagree with the smoothed marginals
    but must agree at strongly-decided days (|posterior-0.5|>0.4)."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import hmm_viterbi_path, hmm_smoothed_posterior
    from qrapids_forecast_r_script_spark.sources import load_table
    got = {r.t: r for r in hmm_viterbi_path(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")).collect()
    daily = Counter(r.day for r in ev if r.event_type == "purchase")
    days = sorted(daily)
    cs = sorted(daily[d] for d in days)
    n = len(cs)
    med = (cs[n // 2] if n % 2 else (cs[n // 2 - 1] + cs[n // 2]) / 2)
    obs = [1 if daily[d] > med else 0 for d in days]
    A = (0.8, 0.2, 0.3, 0.7)
    E1 = (0.3, 0.7)

    def b(o):
        return (E1[0] if o else 1 - E1[0],
                E1[1] if o else 1 - E1[1])

    b0, b1 = b(obs[0])
    c = 0.5 * b0 + 0.5 * b1
    d0, d1 = round(0.5 * b0 / c, 9), round(0.5 * b1 / c, 9)
    p0, p1 = [0], [1]
    for o in obs[1:]:
        b0, b1 = b(o)
        i0 = max(d0 * A[0], d1 * A[2]) * b0
        i1 = max(d0 * A[1], d1 * A[3]) * b1
        np0 = (p0 if d0 * A[0] >= d1 * A[2] else p1) + [0]
        np1 = (p0 if d0 * A[1] >= d1 * A[3] else p1) + [1]
        c = i0 + i1
        d0, d1 = round(i0 / c, 9), round(i1 / c, 9)
        p0, p1 = np0, np1
    path = p0 if d0 >= d1 else p1
    for t, st in enumerate(path, 1):
        assert got[t].map_state == st, t
        assert got[t].obs_high == obs[t - 1]
    sm = {r.t: r.p_busy_smoothed
          for r in hmm_smoothed_posterior(spark, sf_dir).collect()}
    for t, st in enumerate(path, 1):
        if abs(sm[t] - 0.5) > 0.4:
            assert st == (1 if sm[t] > 0.5 else 0), t


# ------------------------------------------------- DBSCAN classes

def test_dbscan_brute_force(spark, sf_dir):
    """Core/border/noise counts replayed in python on the same grid;
    class populations partition the corpus; at least one core point
    exists (the synthetic labels are clustered)."""
    from qrapids_forecast_r_script_spark.operators.spectral import (
        dbscan_density_classes)
    from qrapids_forecast_r_script_spark.sources import load_table
    got = {(r.label, r.cls): r.n_points
           for r in dbscan_density_classes(spark, sf_dir).collect()}
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding").collect()
    cells = Counter()
    pts = []
    for r in emb:
        cx = math.floor(r.embedding[0] / 0.1)
        cy = math.floor(r.embedding[1] / 0.1)
        pts.append((r.label, cx, cy))
        cells[(cx, cy)] += 1
    def nbhd(cx, cy):
        return sum(cells.get((cx + dx, cy + dy), 0)
                   for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    core_cells = {c for c in cells if nbhd(*c) >= 8}
    near = {(cx + dx, cy + dy) for (cx, cy) in core_cells
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)}
    exp = Counter()
    for lbl, cx, cy in pts:
        if nbhd(cx, cy) >= 8:
            exp[(lbl, "core")] += 1
        elif (cx, cy) in near:
            exp[(lbl, "border")] += 1
        else:
            exp[(lbl, "noise")] += 1
    assert got == dict(exp)
    assert sum(got.values()) == len(pts)
    assert any(k[1] == "core" for k in got)


# ---------------------------------------------- Hedge combination

def test_hedge_regret_bound_and_replay(spark, sf_dir):
    """The realized regret respects the minimax bound
    sqrt(T ln K / 2) per series (T=7, K<=4); hedge never does much
    worse than the best expert in capped loss; one series replayed
    in python update-by-update."""
    from qrapids_forecast_r_script_spark.forecast.queries import (
        hedge_forecast_combination, _holdout_preds)
    rows = hedge_forecast_combination(spark, sf_dir).collect()
    bound = math.sqrt(7 * math.log(4) / 2)
    for r in rows:
        assert r.regret <= bound + 1e-6, (r.name, r.regret)
    pdf = _holdout_preds(spark, sf_dir).toPandas()
    pdf = pdf[pdf.pred.notna()]
    key = sorted({(r["name"], r["index"]) for _, r in
                  pdf[["name", "index"]].iterrows()})[0]
    g = pdf[(pdf["name"] == key[0]) & (pdf["index"] == key[1])]
    methods = sorted(g.method.unique())
    eta = 1.2587042594304851
    lcum = {m: 0 for m in methods}
    hsum_u = 0
    aes = []
    for h in sorted(g.h.unique()):
        gh = g[g.h == h]
        num_u = den_u = 0
        val = gh.value.iloc[0]
        for m in methods:
            gm = gh[gh.method == m]
            if gm.empty:
                continue
            w = round(math.exp(-eta * lcum[m] / 1e9), 9)
            num_u += round(w * gm.pred.iloc[0] * 1e6)
            den_u += round(w * 1e9)
        hp = (num_u / 1e6) / (den_u / 1e9)
        aes.append(abs(val - hp))
        hsum_u += round(min(abs(val - hp) / max(abs(val), 1e-6), 1.0)
                        * 1e9)
        for m in methods:
            gm = gh[gh.method == m]
            if not gm.empty:
                lcum[m] += round(min(abs(val - gm.pred.iloc[0])
                                     / max(abs(val), 1e-6), 1.0)
                                 * 1e9)
    best_u = min(lcum.values())
    mine = [r for r in rows
            if r.name == key[0] and r["index"] == key[1]][0]
    assert mine.hedge_mae == pytest.approx(
        round(sum(aes) / len(aes), 6), abs=2e-6)
    assert mine.regret == pytest.approx((hsum_u - best_u) / 1e9,
                                        abs=2e-6)


# ------------------------------------------------------ newsvendor

def test_newsvendor_fractile_optimality(spark, sf_dir):
    """The reported stock minimizes empirical newsvendor cost
    4*shortage + 1*leftover against integer stock levels nearby
    (the critical-fractile optimality, checked on the data); the
    expectations replayed in python."""
    from qrapids_forecast_r_script_spark.operators.relational_ext \
        import newsvendor_stock_levels
    from qrapids_forecast_r_script_spark.sources import load_table
    got = newsvendor_stock_levels(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity").collect()
    from collections import defaultdict
    dd = defaultdict(int)
    days = set()
    for r in li:
        d = str(r.l_shipdate)
        if "1996-01-01" <= d < "1996-07-01":
            dd[(r.l_partkey, d)] += int(r.l_quantity)
            days.add(d)
    for r in got[:3]:
        dem = [dd.get((r.p_partkey, d), 0) for d in sorted(days)]
        n = len(dem)
        short = sum(max(q - r.opt_stock, 0) for q in dem) / n
        over = sum(max(r.opt_stock - q, 0) for q in dem) / n
        assert r.exp_daily_shortage == pytest.approx(short, abs=2e-6)
        assert r.exp_daily_leftover == pytest.approx(over, abs=2e-6)

        def cost(s):
            return sum(4 * max(q - s, 0) + max(s - q, 0)
                       for q in dem)

        best_int = min(range(0, max(dem) + 2), key=cost)
        assert cost(math.floor(r.opt_stock)) <= cost(best_int) + 1e-9 \
            or cost(math.ceil(r.opt_stock)) <= cost(best_int) + 1e-9


# ------------------------------------------------- price elasticity

def test_price_elasticity_brute_force(spark, sf_dir):
    """Slope/R² replayed with numpy on the snapped logs for three
    brands; R² in [0, 1]."""
    import numpy as np
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import price_elasticity_ols
    from qrapids_forecast_r_script_spark.sources import load_table
    got = {r.p_brand: r
           for r in price_elasticity_ols(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice").collect()
    brand = {r.p_partkey: r.p_brand
             for r in load_table(spark, sf_dir, "part").collect()}
    from collections import defaultdict
    xs = defaultdict(list)
    ys = defaultdict(list)
    for r in li:
        b = brand[r.l_partkey]
        xs[b].append(round(math.log(r.l_extendedprice
                                    / r.l_quantity), 6))
        ys[b].append(round(math.log(float(r.l_quantity)), 6))
    for b in sorted(xs)[:3]:
        x = np.round(np.array(xs[b]) * 1e6) / 1e6
        y = np.round(np.array(ys[b]) * 1e6) / 1e6
        n = len(x)
        cov = n * (x * y).sum() - x.sum() * y.sum()
        vx = n * (x * x).sum() - x.sum() ** 2
        vy = n * (y * y).sum() - y.sum() ** 2
        r = got[b]
        assert r.elasticity == pytest.approx(cov / vx, abs=5e-5)
        assert r.r2 == pytest.approx(cov * cov / (vx * vy), abs=5e-5)
        assert 0.0 <= r.r2 <= 1.0


# ----------------------------------------------- Spearman matrix

def test_spearman_matrix_properties(spark, sf_dir):
    """Diagonal rho = 1 exactly; symmetry is implicit (upper
    triangle); values replayed with scipy-free numpy rank Pearson
    for one off-diagonal pair."""
    import numpy as np
    from qrapids_forecast_r_script_spark.forecast.queries import (
        series_spearman_matrix, _metrics)
    rows = series_spearman_matrix(spark, sf_dir).collect()
    for r in rows:
        if r.name_a == r.name_b:
            assert r.spearman_rho == pytest.approx(1.0, abs=1e-9)
    pdf = _metrics(spark, sf_dir).toPandas()
    def series(nm):
        g = pdf[pdf["name"] == nm].sort_values("evaluationDate")
        return np.round(np.round(g.value.to_numpy(float), 6) * 1e6)
    names = sorted(pdf["name"].unique())
    a, b = names[0], names[1]
    xa, xb = series(a), series(b)
    def avg_rank2x(v):
        order = np.argsort(v, kind="stable")
        r = np.empty(len(v))
        sv = v[order]
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            r[order[i:j]] = (i + 1) + (j - i - 1) / 2
            i = j
        return 2 * r
    ra, rb = avg_rank2x(xa), avg_rank2x(xb)
    n = len(ra)
    num = n * (ra * rb).sum() - ra.sum() * rb.sum()
    den = math.sqrt((n * (ra * ra).sum() - ra.sum() ** 2)
                    * (n * (rb * rb).sum() - rb.sum() ** 2))
    exp = num / den
    got = [r for r in rows if r.name_a == a and r.name_b == b][0]
    assert got.spearman_rho == pytest.approx(exp, abs=2e-6)


# ------------------------------------------------- GPD tail fit

def test_gpd_pwm_on_synthetic_uniform(spark, sf_dir):
    """PWM estimators recover (xi=-1, beta=c) on an exact uniform
    grid (uniform IS GPD(-1)); the fitted xi on order values is
    negative (bounded tail) and VaR_999 lies above the threshold."""
    from qrapids_forecast_r_script_spark.operators.data_quality \
        import evt_gpd_tail_fit
    r = evt_gpd_tail_fit(spark, sf_dir).collect()[0]
    assert r.shape_xi < 0
    assert r.var_999 > r.threshold
    assert r.n_exceed >= 0.09 * r.n_total
    # synthetic closed form: x_(i) = i for i=1..n (uniform grid)
    n = 1000
    b0 = sum(range(1, n + 1)) / n
    a1 = sum((n - i) * i for i in range(1, n + 1)) / (n * (n - 1))
    xi = 2 - b0 / (b0 - 2 * a1)
    beta = 2 * b0 * a1 / (b0 - 2 * a1)
    assert xi == pytest.approx(-1.0, abs=0.01)
    assert beta == pytest.approx(n, rel=0.01)


# ------------------------------------------------- Little's law

def test_littles_law_exact_identity(spark, sf_dir):
    """identity_gap_us == 0 (the sweep integral equals total session
    time exactly); l_sweep == l_little to rounding; a python sweep
    reproduces the integral."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import littles_law_audit
    from qrapids_forecast_r_script_spark.streaming.queries import (
        sessionize_events)
    from qrapids_forecast_r_script_spark.sources import load_table
    r = littles_law_audit(spark, sf_dir).collect()[0]
    assert r.identity_gap_us == 0
    assert r.l_sweep == pytest.approx(r.l_little, abs=2e-6)
    sess = (sessionize_events(load_table(spark, sf_dir, "events"))
            .groupBy("user_id", "session_id")
            .agg(F.unix_micros(F.min("ts")).alias("st"),
                 F.unix_micros(F.max("ts")).alias("en"))).collect()
    pts = sorted([(s.st, 1) for s in sess]
                 + [(s.en, -1) for s in sess],
                 key=lambda p: (p[0], p[1]))
    run = integral = 0
    for (t, d), nxt in zip(pts, pts[1:]):
        run += d
        integral += run * (nxt[0] - t)
    dur = sum(s.en - s.st for s in sess)
    assert integral == dur
    assert r.n_sessions == len(sess)
    assert r.total_session_seconds == pytest.approx(dur / 1e6,
                                                    abs=2e-6)


# -------------------------------------------- CF holdout lift

def test_cf_holdout_lift_brute_force(spark, sf_dir):
    """Hit counts replayed in python for the first three targets;
    rates are integer ratios; cf and pop hits never exceed the
    buyer count."""
    import hashlib  # noqa: F401 — parity with sibling tests
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import cf_holdout_lift
    from qrapids_forecast_r_script_spark.sources import load_table
    got = cf_holdout_lift(spark, sf_dir).collect()
    orders = {r.o_orderkey: (r.o_custkey, str(r.o_orderdate))
              for r in load_table(spark, sf_dir, "orders").collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey").collect()
    train = set()
    test = set()
    for r in li:
        cust, d = orders[r.l_orderkey]
        (train if d < "1999-01-01" else test).add((cust, r.l_partkey))
    from collections import defaultdict
    buyers = defaultdict(set)
    for c, i in train:
        buyers[i].add(c)
    deg = {i: len(s) for i, s in buyers.items()}
    tops = sorted(deg, key=lambda i: (-deg[i], i))[:20]
    test_by_cust = defaultdict(set)
    for c, i in test:
        test_by_cust[c].add(i)
    pops = sorted(deg, key=lambda i: (-deg[i], i))[:25]
    for r in got[:3]:
        t = r.p_partkey
        assert t in tops
        assert r.n_train_buyers == deg[t]
        cos = {}
        for i, s in buyers.items():
            if i == t:
                continue
            co = len(s & buyers[t])
            if co:
                cos[i] = round(co / math.sqrt(deg[t] * deg[i]), 6)
        nbrs = sorted(cos, key=lambda i: (-cos[i], i))[:5]
        popn = [i for i in pops if i != t][:5]
        cf_hits = sum(1 for c in buyers[t]
                      if test_by_cust[c] & set(nbrs))
        pop_hits = sum(1 for c in buyers[t]
                       if test_by_cust[c] & set(popn))
        assert r.cf_hits == cf_hits, t
        assert r.pop_hits == pop_hits, t
        assert r.cf_hits <= r.n_train_buyers
        assert r.pop_hits <= r.n_train_buyers
        assert r.cf_rate == pytest.approx(cf_hits / deg[t], abs=1e-6)


# -------------------------------------------- blocking quality

def test_blocking_quality_brute_force(spark, sf_dir):
    """RR and PC replayed in python from the same blocks; PC = 1
    exactly (the suffix blocks are invariant to the mid-name
    perturbation — the designed-in property) while RR > 0.9."""
    from qrapids_forecast_r_script_spark.operators.linkage import (
        blocking_quality_metrics)
    from qrapids_forecast_r_script_spark.sources import load_table
    r = blocking_quality_metrics(spark, sf_dir).collect()[0]
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey").collect()
    from collections import defaultdict
    blocks_a = defaultdict(list)
    blocks_b = defaultdict(list)
    for c in cust:
        blocks_a[(c.c_nationkey, c.c_name[-3:])].append(c.c_custkey)
        nb = (c.c_name[:3] + c.c_name[4:]
              if c.c_custkey % 7 == 0 else c.c_name)
        blocks_b[(c.c_nationkey, nb[-3:])].append(c.c_custkey)
    n_cand = sum(len(blocks_a[k]) * len(blocks_b[k])
                 for k in set(blocks_a) | set(blocks_b)
                 if k in blocks_a and k in blocks_b)
    n_true = sum(1 for k in blocks_a
                 if k in blocks_b
                 for ka in blocks_a[k] for kb in blocks_b[k]
                 if ka == kb)
    n = len(cust)
    assert r.n_cand == n_cand
    assert r.n_cand_true == n_true
    assert r.reduction_ratio == pytest.approx(
        1 - n_cand / (n * n), abs=2e-6)
    assert r.pairs_completeness == pytest.approx(n_true / n,
                                                 abs=2e-6)
    # suffix blocks are invariant to the mid-name perturbation (it
    # drops the 4th char; the last 3 stay) — PC = 1 exactly, which
    # is WHY the linkage chain blocks on the suffix and not the
    # prefix the perturbation would break
    assert r.pairs_completeness == 1.0
    assert r.reduction_ratio > 0.9


# ------------------------------------------------------ ANOVA

def test_anova_decomposition_identity(spark, sf_dir):
    """SSB + SSW equals total SS computed independently in python
    (the Fisher decomposition); F replayed from raw data."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import anova_nation_values
    from qrapids_forecast_r_script_spark.sources import load_table
    r = anova_nation_values(spark, sf_dir).collect()[0]
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice").collect()
    cust = {c.c_custkey: c.c_nationkey
            for c in load_table(spark, sf_dir, "customer").collect()}
    from collections import defaultdict
    groups = defaultdict(list)
    for o in orders:
        groups[cust[o.o_custkey]].append(
            round(o.o_totalprice * 100) / 100)
    allv = [v for g in groups.values() for v in g]
    n = len(allv)
    gm = sum(allv) / n
    sst = sum((v - gm) ** 2 for v in allv)
    ssb = sum(len(g) * (sum(g) / len(g) - gm) ** 2
              for g in groups.values())
    ssw = sst - ssb
    assert r.n_total == n
    assert r.k_groups == len(groups)
    assert r.ss_between == pytest.approx(ssb, rel=1e-6)
    assert r.ss_within == pytest.approx(ssw, rel=1e-9)
    f = (ssb / (len(groups) - 1)) / (ssw / (n - len(groups)))
    assert r.f_stat == pytest.approx(f, rel=1e-4)
    assert r.reject_equal_means == (r.f_stat > r.f_crit_5pct)


# ------------------------------------------- assortativity

def test_assortativity_brute_force(spark, sf_dir):
    """Coefficient replayed in python over the directed edge copies;
    value lies in [-1, 1]; exchange symmetry holds by construction
    (sx == sy)."""
    from qrapids_forecast_r_script_spark.operators.graph import (
        doc_graph_assortativity)
    from qrapids_forecast_r_script_spark.operators.dedup import (
        minhash_lsh_pairs)
    r = doc_graph_assortativity(spark, sf_dir).collect()[0]
    assert -1.0 <= r.assortativity <= 1.0
    pairs = [(p.doc_a, p.doc_b)
             for p in minhash_lsh_pairs(spark, sf_dir).collect()]
    deg = Counter()
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    xs = []
    ys = []
    for a, b in pairs:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    exp = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy))
    assert r.assortativity == pytest.approx(exp, abs=2e-6)
    assert r.n_edges == len(pairs)
    assert sx == sy


# --------------------------------------------- term burstiness

def test_burstiness_brute_force_and_poisson_floor(spark, sf_dir):
    """VMR replayed in python for the top terms; a constant-count
    synthetic term has VMR exactly 0 and a maximally clumped one
    exceeds 1 (the Fano-factor reading)."""
    from qrapids_forecast_r_script_spark.operators.text_quality import (
        term_burstiness_topk)
    from qrapids_forecast_r_script_spark.sources import load_table
    got = term_burstiness_topk(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text").collect()
    cnt = {}
    for d in docs:
        for t in d.text.split(" "):
            cnt.setdefault(t, Counter())[d.doc_id] += 1
    for r in got[:5]:
        cs = list(cnt[r.term].values())
        df = len(cs)
        assert df == r.df and df >= 5
        mean = sum(cs) / df
        var = (sum(c * c for c in cs) - df * mean * mean) / (df - 1)
        assert r.vmr == pytest.approx(var / mean, rel=1e-4)
    ranks = [r.vmr for r in got]
    assert ranks == sorted(ranks, reverse=True)
    const = [3] * 10
    m = sum(const) / len(const)
    v = (sum(c * c for c in const) - len(const) * m * m) \
        / (len(const) - 1)
    assert v / m == 0
    clumped = [29] + [1] * 9
    m2 = sum(clumped) / 10
    v2 = (sum(c * c for c in clumped) - 10 * m2 * m2) / 9
    assert v2 / m2 > 1


# ------------------------------------- empirical-Bayes shrinkage

def test_eb_shrinkage_properties(spark, sf_dir):
    """Every shrunk share lies between the raw share and the prior
    mean; the moment-matched prior replayed in python; small-n
    nations move more than large-n ones (relative shrinkage is
    monotone in 1/(n + K))."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import eb_urgent_share_shrinkage
    rows = eb_urgent_share_shrinkage(spark, sf_dir).collect()
    ps = [round(r.k / r.n * 1e9) / 1e9 for r in rows]
    g = len(ps)
    mbar = sum(round(p * 1e9) for p in ps) / 1e9 / g
    var = sum(round(p * p * 1e9) for p in ps) / 1e9 / g - mbar ** 2
    kk = max(0.0, mbar * (1 - mbar) / var - 1)
    alpha, beta = mbar * kk, (1 - mbar) * kk
    for r, p in zip(rows, ps):
        assert r.alpha == pytest.approx(alpha, abs=2e-6)
        assert r.beta == pytest.approx(beta, abs=2e-6)
        exp = (r.k + alpha) / (r.n + kk)
        assert r.shrunk_share == pytest.approx(exp, abs=2e-6)
        lo, hi = sorted((p, mbar))
        assert lo - 1e-6 <= r.shrunk_share <= hi + 1e-6
    # relative pull toward the prior scales with K/(n+K)
    pulls = [(abs(r.shrunk_share - r.raw_share)
              / (abs(mbar - r.raw_share) + 1e-12), r.n)
             for r in rows if abs(mbar - r.raw_share) > 1e-4]
    if len(pulls) >= 2:
        big = max(pulls, key=lambda t: t[1])
        small = min(pulls, key=lambda t: t[1])
        if big[1] > 1.5 * small[1]:
            assert big[0] <= small[0] + 1e-6


# ------------------------------------------- Weibull interarrival

def test_weibull_fit_recovers_shape_on_synthetic(spark, sf_dir):
    """Median-rank regression replayed with numpy for one type; on a
    synthetic exact-Weibull grid (inverse-CDF of a uniform grid at
    k=2) the fit recovers shape 2 and scale 5 closely; an
    exponential grid gives k~1."""
    import numpy as np
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import interarrival_weibull_fit
    from qrapids_forecast_r_script_spark.sources import load_table
    got = {r.event_type: r
           for r in interarrival_weibull_fit(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "ts", "event_id").collect()
    from collections import defaultdict
    per = defaultdict(list)
    for r in ev:
        per[(r.event_type, r.user_id)].append(
            (r.ts, r.event_id))
    gaps = defaultdict(list)
    for (t, _), rows in per.items():
        rows.sort()
        for (a, _), (b, _) in zip(rows, rows[1:]):
            g = (b - a).total_seconds() * 1e6
            if g > 0:
                gaps[t].append(round(g))
    t0 = sorted(gaps)[0]
    gs = sorted(gaps[t0])
    n = len(gs)
    xu = np.array([round(round(math.log(g / 1e6), 6) * 1e6)
                   for g in gs])
    yu = np.array([round(round(math.log(-math.log(
        1 - (i - 0.3) / (n + 0.4))), 6) * 1e6)
        for i in range(1, n + 1)])
    x = xu / 1e6
    y = yu / 1e6
    cov = n * (x * y).sum() - x.sum() * y.sum()
    vx = n * (x * x).sum() - x.sum() ** 2
    k = cov / vx
    icept = (y.sum() - k * x.sum()) / n
    r = got[t0]
    assert r.shape_k == pytest.approx(k, abs=5e-4)
    assert r.scale_seconds == pytest.approx(math.exp(-icept / k),
                                            rel=1e-3)
    assert r.n_gaps == n

    def fit(ts):
        m = len(ts)
        xs = np.log(np.asarray(ts, dtype=float))
        ys = np.log(-np.log(1 - (np.arange(1, m + 1) - 0.3)
                            / (m + 0.4)))
        c = m * (xs * ys).sum() - xs.sum() * ys.sum()
        v = m * (xs * xs).sum() - xs.sum() ** 2
        kk = c / v
        ic = (ys.sum() - kk * xs.sum()) / m
        return kk, math.exp(-ic / kk)

    u = (np.arange(1, 1001) - 0.5) / 1000
    weib2 = 5.0 * (-np.log(1 - u)) ** 0.5       # k=2, lambda=5
    k2, l2 = fit(np.sort(weib2))
    assert k2 == pytest.approx(2.0, abs=0.05)
    assert l2 == pytest.approx(5.0, rel=0.02)
    expo = 3.0 * (-np.log(1 - u))               # k=1, lambda=3
    k1, _ = fit(np.sort(expo))
    assert k1 == pytest.approx(1.0, abs=0.03)


# ------------------------------------------------ Erlang-B table

def test_erlang_recursion_and_monotonicity(spark, sf_dir):
    """The unrolled recursion replayed in python from the reported
    offered load; blocking strictly decreases in c; the closed-form
    identity B(c) = (a^c/c!)/sum(a^j/j!) matches the recursion."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import erlang_capacity_table
    rows = sorted(erlang_capacity_table(spark, sf_dir).collect(),
                  key=lambda r: r.servers)
    a = rows[0].offered_erlangs
    b = 1.0
    for r in rows:
        b = round(a * b / (r.servers + a * b), 9)
        assert r.blocking_prob == pytest.approx(round(b, 6),
                                                abs=2e-6)
    probs = [r.blocking_prob for r in rows]
    assert probs == sorted(probs, reverse=True)
    # closed form at c=3 for a generic load
    aa = 2.5
    num = aa ** 3 / math.factorial(3)
    den = sum(aa ** j / math.factorial(j) for j in range(4))
    closed = num / den
    bb = 1.0
    for c in (1, 2, 3):
        bb = aa * bb / (c + aa * bb)
    assert bb == pytest.approx(closed, abs=1e-12)


# -------------------------------------- sliced Wasserstein

def test_sliced_w1_brute_force(spark, sf_dir):
    """Per-pair axis-0 W1 replayed in python via the sorted-sample
    identity W1 = mean |x_(i) - y_(i)| when both labels have equal n
    (checked where applicable) and via the CDF-gap integral in
    general; symmetry of the metric and zero self-distance on a
    synthetic identical pair."""
    import numpy as np
    from qrapids_forecast_r_script_spark.operators.spectral import (
        label_sliced_wasserstein)
    from qrapids_forecast_r_script_spark.sources import load_table
    got = {(r.label_a, r.label_b): r
           for r in label_sliced_wasserstein(spark, sf_dir).collect()}
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", "embedding").collect()
    from collections import defaultdict
    vals = defaultdict(list)
    for r in emb:
        vals[r.label].append(float(r.embedding[0]))
    support = sorted({v for vs in vals.values() for v in vs})
    labels = sorted(vals)

    def emd(a, b):
        na, nb = len(vals[a]), len(vals[b])
        ca = Counter(vals[a])
        cb = Counter(vals[b])
        fa = fb = 0.0
        su = 0
        for v, nxt in zip(support, support[1:]):
            fa += ca.get(v, 0) / na
            fb += cb.get(v, 0) / nb
            su += round(abs(fa - fb) * (nxt - v) * 1e9)
        return su / 1e9

    for (a, b) in [(labels[0], labels[1]), (labels[2], labels[5])]:
        assert got[(a, b)].w1_axis0 == pytest.approx(emd(a, b),
                                                     abs=2e-6)
    for r in got.values():
        assert r.sliced_w1 == pytest.approx(
            (r.w1_axis0 + r.w1_axis1) / 2, abs=2e-6)
        assert r.w1_axis0 >= 0 and r.w1_axis1 >= 0
    # identical distributions -> 0 (python identity check)
    assert emd(labels[0], labels[0]) == 0


# ------------------------------------------------ apriori triples

def test_apriori_triples_brute_force(spark, sf_dir):
    """Triple supports replayed in python over raw baskets (no
    candidate pruning — proving the pruned join LOSES nothing, the
    apriori completeness property); lifts match; every reported
    triple's three pairs are frequent."""
    from qrapids_forecast_r_script_spark.operators.assoc_privacy \
        import basket_part_triples_apriori
    from qrapids_forecast_r_script_spark.sources import load_table
    got = basket_part_triples_apriori(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey").collect()
    from collections import defaultdict
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    from itertools import combinations
    marg = Counter()
    pair = Counter()
    tri = Counter()
    for items in baskets.values():
        s = sorted(items)
        for i in s:
            marg[i] += 1
        for p in combinations(s, 2):
            pair[p] += 1
        for t in combinations(s, 3):
            tri[t] += 1
    nb = len(baskets)
    frequent_tri = {t: c for t, c in tri.items() if c >= 2}
    exp = sorted(
        ((round(c * nb * nb / (marg[t[0]] * marg[t[1]]
                               * marg[t[2]]), 6), c) + t
         for t, c in frequent_tri.items()),
        key=lambda r: (-r[0], -r[1], r[2], r[3], r[4]))[:20]
    assert len(got) == min(20, len(exp))
    for r, e in zip(got, exp):
        assert (r.x, r.y, r.z) == (e[2], e[3], e[4]), r.rank
        assert r.n_xyz == e[1]
        assert r.lift == pytest.approx(e[0], abs=2e-6)
        assert pair[(r.x, r.y)] >= 2
        assert pair[(r.x, r.z)] >= 2
        assert pair[(r.y, r.z)] >= 2


# ------------------------------------------------- Huber location

def test_huber_irls_brute_force(spark, sf_dir):
    """Both IRLS steps replayed in python from median/MAD starts;
    on a synthetic contaminated sample the Huber estimate sits
    between median and mean and closer to the clean center than
    the mean."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import huber_location_nations
    from qrapids_forecast_r_script_spark.sources import load_table
    got = {r.nationkey: r
           for r in huber_location_nations(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice").collect()
    cust = {c.c_custkey: c.c_nationkey
            for c in load_table(spark, sf_dir, "customer").collect()}
    from collections import defaultdict
    ys = defaultdict(list)
    for o in orders:
        ys[cust[o.o_custkey]].append(round(o.o_totalprice * 100)
                                     / 100)
    import numpy as np
    for nk in sorted(ys)[:4]:
        v = np.array(ys[nk])
        mu = round(float(np.percentile(v, 50, method="linear")), 6)
        mad = float(np.percentile(np.abs(v - mu), 50,
                                  method="linear"))
        s = round(mad * 1.4826, 6)
        for _ in range(2):
            w = np.minimum(1.0, 1.345 * s
                           / np.maximum(np.abs(v - mu), 1e-9))
            swu = np.round(w * 1e6).sum()
            swyu = np.round(w * v * 1e6).sum()
            mu = round(swyu / swu, 6)
        r = got[nk]
        assert r.huber_mu == pytest.approx(mu, abs=2e-5), nk
        assert r.scale_mad == pytest.approx(s, abs=2e-6)
    # synthetic contamination
    clean = list(range(90, 111))          # center 100
    data = clean + [100000] * 2
    v = np.array(data, dtype=float)
    mu = float(np.median(v))
    s = float(np.median(np.abs(v - mu))) * 1.4826
    for _ in range(2):
        w = np.minimum(1.0, 1.345 * s
                       / np.maximum(np.abs(v - mu), 1e-9))
        mu = float((w * v).sum() / w.sum())
    mean = v.mean()
    assert abs(mu - 100) < abs(mean - 100)
    assert min(np.median(v), mean) <= mu <= max(np.median(v), mean)


# -------------------------------------------- NB dispersion fit

def test_negbin_moments_brute_force(spark, sf_dir):
    """Moments replayed in python with the zero-inclusive spine; the
    MoM identities r(1-p)/p = m and r(1-p)/p^2 = v hold for fitted
    types; a synthetic Poisson-like sample gets NULL r."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import negbin_dispersion_fit
    from qrapids_forecast_r_script_spark.sources import load_table
    got = {r.event_type: r
           for r in negbin_dispersion_fit(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id").collect()
    users = {r.user_id for r in ev}
    types = {r.event_type for r in ev}
    cnt = Counter((r.event_type, r.user_id) for r in ev)
    for t in types:
        cs = [cnt.get((t, u), 0) for u in users]
        n = len(cs)
        m = sum(cs) / n
        v = (sum(c * c for c in cs) - n * m * m) / (n - 1)
        r = got[t]
        assert r.n_users == n
        assert r.mean_count == pytest.approx(m, abs=2e-6)
        assert r.var_count == pytest.approx(v, rel=1e-6)
        if v > m:
            rr, pp = r.nb_size_r, r.nb_prob_p
            assert rr * (1 - pp) / pp == pytest.approx(m, rel=1e-3)
            assert rr * (1 - pp) / pp ** 2 == pytest.approx(v,
                                                            rel=1e-3)
        else:
            assert r.nb_size_r is None


# ------------------------------------------------ Gumbel + Hurst

def test_gumbel_return_levels_order(spark, sf_dir):
    """Return levels increase with horizon and exceed the block
    mean; MoM identities replayed from the reported moments."""
    from qrapids_forecast_r_script_spark.operators.data_quality \
        import evt_gumbel_block_maxima
    r = evt_gumbel_block_maxima(spark, sf_dir).collect()[0]
    assert r.return_level_5y > r.return_level_1y > r.block_mean
    beta = r.block_sd * math.sqrt(6) / math.pi
    mu = r.block_mean - 0.5772156649015329 * beta
    assert r.gumbel_beta == pytest.approx(beta, abs=2e-4)
    assert r.gumbel_mu == pytest.approx(mu, abs=2e-4)
    rl1 = mu - beta * math.log(-math.log(1 - 1 / 52))
    assert r.return_level_1y == pytest.approx(rl1, abs=2e-3)


def test_hurst_rs_classifies_synthetic(spark, sf_dir):
    """The python R/S pipeline (same snapping) gives H ~ high on a
    trending series and lower on an alternating one; the query's
    H values are finite and the two reported mean R/S rise with
    window length for every series."""
    from qrapids_forecast_r_script_spark.forecast.queries import (
        series_hurst_rs)
    rows = series_hurst_rs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.rs_15 > r.rs_5 > 0
        assert -1.0 < r.hurst_h < 1.5

    def hurst(vals):
        import numpy as np
        v = np.asarray(vals, dtype=float)
        pts = []
        for w in (5, 10, 15):
            rss = []
            for i in range(0, len(v) - w + 1, w):
                seg = v[i:i + w]
                dev = seg - seg.mean()
                cum = np.cumsum(dev)
                s = math.sqrt((dev * dev).mean())
                if s > 0:
                    rss.append((cum.max() - cum.min()) / s)
            if rss:
                pts.append((math.log(w),
                            math.log(sum(rss) / len(rss))))
        n = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts)
        return (n * sxy - sx * sy) / (n * sxx - sx * sx)

    trend = [i + ((i * 2654435761) % 97) / 97 for i in range(60)]
    alt = [(1 if i % 2 else -1) + ((i * 2654435761) % 97) / 970
           for i in range(60)]
    assert hurst(trend) > 0.8
    assert hurst(alt) < 0.35


# --------------------------------- alpha / AP / kappa eval trio

def test_cronbach_alpha_identity(spark, sf_dir):
    """Alpha replayed in python on the aligned panel; bounded above
    by 1; equals the textbook k/(k-1)(1 - sum var / var total)."""
    from qrapids_forecast_r_script_spark.forecast.queries import (
        series_cronbach_alpha, _metrics)
    r = series_cronbach_alpha(spark, sf_dir).collect()[0]
    pdf = _metrics(spark, sf_dir).toPandas()
    import numpy as np
    piv = pdf.pivot_table(index="evaluationDate", columns="name",
                          values="value", aggfunc="first")
    piv = np.round(np.round(piv.to_numpy(float), 6) * 1e6) / 1e6
    k = piv.shape[1]
    sv = sum(piv[:, i].var(ddof=1) for i in range(k))
    vt = piv.sum(axis=1).var(ddof=1)
    alpha = k / (k - 1) * (1 - sv / vt)
    assert r.cronbach_alpha == pytest.approx(alpha, abs=1e-4)
    assert r.cronbach_alpha <= 1.0
    assert r.k_series == k


def test_average_precision_brute_force(spark, sf_dir):
    """AP replayed in python with the identical tie-break; AP of a
    perfect ranking is 1 and of positives-last is minimal (checked
    on synthetic)."""
    from qrapids_forecast_r_script_spark.operators.training_prep \
        import nb_average_precision, nb_quality_classifier
    r = nb_average_precision(spark, sf_dir).collect()[0]
    rows = nb_quality_classifier(spark, sf_dir).select(
        "doc_id", "nb_score", "lang").collect()
    ranked = sorted(rows, key=lambda x: (-x.nb_score, x.doc_id))
    tp = 0
    su = 0
    npos = 0
    for i, x in enumerate(ranked, 1):
        y = 1 if x.lang == "en" else 0
        tp += y
        if y:
            npos += 1
            su += round(tp / i * 1e9)
    assert r.n_pos == npos
    assert r.average_precision == pytest.approx(su / npos / 1e9,
                                                abs=2e-6)

    def ap(ys):
        tp = s = np_ = 0
        for i, y in enumerate(ys, 1):
            tp += y
            if y:
                np_ += 1
                s += tp / i
        return s / np_

    assert ap([1, 1, 1, 0, 0]) == 1.0
    assert ap([0, 0, 0, 1, 1]) < 0.5


def test_kappa_brute_force_and_chance_floor(spark, sf_dir):
    """Kappa replayed from the reported 2x2 cells; kappa of
    independent raters is ~0 on synthetic marginals; perfect
    agreement gives 1."""
    from qrapids_forecast_r_script_spark.operators.training_prep \
        import classifier_agreement_kappa
    r = classifier_agreement_kappa(spark, sf_dir).collect()[0]
    n = r.n
    po = (r.tt + r.ff) / n
    pe = ((r.tt + r.tf) * (r.tt + r.ft)
          + (r.ft + r.ff) * (r.tf + r.ff)) / (n * n)
    assert r.p_observed == pytest.approx(po, abs=2e-6)
    assert r.p_expected == pytest.approx(pe, abs=2e-6)
    assert r.cohen_kappa == pytest.approx((po - pe) / (1 - pe),
                                          abs=2e-5)
    assert r.tt + r.tf + r.ft + r.ff == n
    # perfect agreement
    tt, ff = 30, 70
    po2 = 1.0
    pe2 = (tt * tt + ff * ff) / ((tt + ff) ** 2)
    assert (po2 - pe2) / (1 - pe2) == pytest.approx(1.0)


# -------------------------- McNemar / Friedman / Brown-Forsythe

def test_mcnemar_cells_and_synthetic(spark, sf_dir):
    """Discordant cells consistent with the kappa query's join; the
    continuity-corrected statistic replayed; b=c gives ~0 stat on
    synthetic."""
    from qrapids_forecast_r_script_spark.operators.training_prep \
        import classifier_mcnemar_test
    r = classifier_mcnemar_test(spark, sf_dir).collect()[0]
    if r.b + r.c > 0:
        exp = (abs(r.b - r.c) - 1) ** 2 / (r.b + r.c)
        assert r.mcnemar_stat == pytest.approx(exp, abs=2e-6)
        assert r.accuracies_differ == (round(exp, 6) > 3.841458820694124)
    assert r.b + r.c <= r.n
    b = c = 10
    assert (abs(b - c) - 1) ** 2 / (b + c) == pytest.approx(0.05)


def test_friedman_ranks_brute_force(spark, sf_dir):
    """Mean ranks and the chi2 replayed in python from the backtest
    MAEs; mean ranks average to (k+1)/2 exactly."""
    from qrapids_forecast_r_script_spark.forecast.queries import (
        friedman_method_ranks, backtest_closed_forms)
    rows = friedman_method_ranks(spark, sf_dir).collect()
    bt = backtest_closed_forms(spark, sf_dir).select(
        "name", "index", "method", "mae").collect()
    from collections import defaultdict
    series = defaultdict(dict)
    for r in bt:
        series[(r.name, r["index"])][r.method] = r.mae
    sr = Counter()
    ns = Counter()
    for maes in series.values():
        vals = sorted(set(maes.values()))
        for m, v in maes.items():
            rmin = 1 + sum(1 for x in maes.values() if x < v)
            cnt = sum(1 for x in maes.values() if x == v)
            sr[m] += 2 * rmin + cnt - 1
            ns[m] += 1
    k = len(sr)
    got = {r.method: r for r in rows}
    for m in sr:
        assert got[m].mean_rank == pytest.approx(
            sr[m] / 2 / ns[m], abs=2e-6)
    n = max(ns.values())
    sdu = sum(round((sr[m] / 2 / ns[m] - (k + 1) / 2) ** 2 * 1e9)
              for m in sr)
    stat = 12 * n / (k * (k + 1)) * (sdu / 1e9)
    assert rows[0].friedman_chi2 == pytest.approx(stat, abs=2e-5)
    mean_of_means = sum(sr[m] / 2 / ns[m] for m in sr) / k
    assert mean_of_means == pytest.approx((k + 1) / 2, abs=1e-9)


def test_levene_brute_force(spark, sf_dir):
    """W replayed in python via the deviation-ANOVA identity."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import levene_variance_audit
    from qrapids_forecast_r_script_spark.sources import load_table
    r = levene_variance_audit(spark, sf_dir).collect()[0]
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice").collect()
    cust = {c.c_custkey: c.c_nationkey
            for c in load_table(spark, sf_dir, "customer").collect()}
    import numpy as np
    from collections import defaultdict
    ys = defaultdict(list)
    for o in orders:
        ys[cust[o.o_custkey]].append(round(o.o_totalprice * 100))
    zs = {}
    for nk, v in ys.items():
        med = float(np.percentile(v, 50, method="linear"))
        zs[nk] = [round(abs(y - med), 1) / 100 for y in v]
    allz = [z for v in zs.values() for z in v]
    n = len(allz)
    gm = sum(allz) / n
    sst = sum((z - gm) ** 2 for z in allz)
    ssb = sum(len(v) * (sum(v) / len(v) - gm) ** 2
              for v in zs.values())
    k = len(zs)
    w = (ssb / (k - 1)) / ((sst - ssb) / (n - k))
    assert r.bf_w_stat == pytest.approx(w, rel=1e-4)
    assert r.k_groups == k and r.n_total == n


# --------------------------- CIF / RBO / decision stump

def test_cif_bounds_and_sum(spark, sf_dir):
    """Both CIFs are nondecreasing; CIF_1 + CIF_2 + S_all = 1 at
    every step (the Aalen-Johansen partition identity, to rounding);
    each CIF stays below 1 - the other's final value + eps."""
    from qrapids_forecast_r_script_spark.operators.product_analytics \
        import competing_risks_cif
    rows = sorted(competing_risks_cif(spark, sf_dir).collect(),
                  key=lambda r: r.t)
    prev1 = prev2 = 0.0
    for r in rows:
        assert r.cif_purchase >= prev1 - 1e-9
        assert r.cif_error >= prev2 - 1e-9
        prev1, prev2 = r.cif_purchase, r.cif_error
        assert (r.cif_purchase + r.cif_error + r.surv_all_cause
                == pytest.approx(1.0, abs=5e-4)), r.t
    assert rows[-1].cif_purchase + rows[-1].cif_error <= 1 + 1e-6


def test_rbo_identity_and_bounds(spark, sf_dir):
    """RBO of a list with itself at the same weights is the full
    weight sum (python identity); query values in [0, ~0.65] (the
    truncated-weight ceiling); replay for one query."""
    from qrapids_forecast_r_script_spark.operators.text import (
        retrieval_rbo_bm25_vs_ql, bm25_topk, ql_dirichlet_topk,
        _RBO_W)
    rows = {r.query_id: r
            for r in retrieval_rbo_bm25_vs_ql(spark, sf_dir)
            .collect()}
    ceiling = sum(w for _, w in _RBO_W)
    for r in rows.values():
        assert 0.0 <= r.rbo <= ceiling + 1e-9
    bm = [(r.query_id, r.neighbor_id, r.rank)
          for r in bm25_topk(spark, sf_dir).collect()]
    ql = [(r.query_id, r.neighbor_id, r.rank)
          for r in ql_dirichlet_topk(spark, sf_dir).collect()]
    q0 = min(q for q, _, _ in bm)
    sb = {d: k for q, d, k in bm if q == q0}
    sq = {d: k for q, d, k in ql if q == q0}
    su = 0
    for k, w in _RBO_W:
        ov = sum(1 for d in sb
                 if sb[d] <= k and d in sq and sq[d] <= k)
        su += round(w * ov / k * 1e9)
    assert rows[q0].rbo == pytest.approx(su / 1e9, abs=2e-6)
    # self-RBO = full weight mass
    su_self = sum(round(w * k / k * 1e9) for k, w in _RBO_W) / 1e9
    assert su_self == pytest.approx(ceiling, abs=1e-9)


def test_decision_stump_brute_force(spark, sf_dir):
    """The chosen threshold minimizes weighted Gini over an
    exhaustive python sweep; gain is nonnegative."""
    from qrapids_forecast_r_script_spark.operators.training_prep \
        import decision_stump_doclen
    from qrapids_forecast_r_script_spark.sources import load_table
    r = decision_stump_doclen(spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents").select(
        "n_chars", "lang").collect()
    pts = sorted((d.n_chars, 1 if d.lang == "en" else 0)
                 for d in docs)
    n = len(pts)
    npos = sum(y for _, y in pts)

    def gini(p):
        return 1 - p * p - (1 - p) * (1 - p)

    best = None
    nl = npl = 0
    i = 0
    vals = sorted({v for v, _ in pts})
    from collections import Counter as C
    cnt = C(v for v, _ in pts)
    cpos = C(v for v, y in pts if y)
    for v in vals:
        nl += cnt[v]
        npl += cpos.get(v, 0)
        if nl >= n:
            break
        wg = round((nl * gini(npl / nl)
                    + (n - nl) * gini((npos - npl) / (n - nl)))
                   / n, 9)
        if best is None or (wg, v) < best:
            best = (wg, v)
    assert r.threshold == best[1]
    assert r.gini_split == pytest.approx(best[0], abs=2e-6)
    assert r.gini_gain >= -1e-9
    assert r.n_left + r.n_right == n
