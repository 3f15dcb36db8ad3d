"""Round-10 staged operators (operators/r10_staged.py): Spark<->DuckDB
parity, independent brute-force replays of each statistic, and the
registration freeze pin — these names must NOT be in the live registry
until r10 spends its net-new budget on them."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from qrapids_forecast_r_script_spark.operators import r10_staged
from tests.oracle_compare import compare, duckdb_run

STAGED = ["events_cvm_drift", "balance_conversion_catrend",
          "bleu_neardup_pairs", "embedding_mmd2_drift",
          "events_kuiper_tod_drift", "ab_ratio_metric_delta",
          "retrieval_rbo_eval", "balance_stump_split",
          "user_type_cochran_q", "spend_trend_jonckheere"]


def test_staged_names_not_registered():
    """The r9 net-new registration budget is spent; the staged names
    must stay OUT of the live registry (and the staged dicts must be
    complete and consistent) until r10 registers them."""
    import __spark_entry__ as entry
    live = entry.queries()
    for name in STAGED:
        assert name not in live, f"{name} registered early — freeze cap"
    assert sorted(r10_staged.QUERIES) == sorted(STAGED)
    assert sorted(r10_staged.ORACLES) == sorted(STAGED)


@pytest.mark.parametrize("name", STAGED)
def test_staged_oracle_parity(spark, sf_dir, name):
    """Driver-style compare of each staged query vs its DuckDB oracle."""
    got = r10_staged.QUERIES[name](spark, sf_dir)
    want = duckdb_run(r10_staged.ORACLES[name], sf_dir)
    problems = compare(got, want)
    assert not problems, problems


def test_cvm_matches_bruteforce(spark, sf_dir):
    """The engine's integer-numerator CvM equals the definitional
    pooled-ECDF form T = NM/(N+M)^2 * sum_pooled (F_N - G_M)^2."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    day = ev["ts"].dt.normalize()
    early = day < (day.min() + pd.Timedelta(days=15))
    got = {r["event_type"]: r
           for r in r10_staged.events_cvm_drift(spark, sf_dir).collect()}
    for etype, grp in ev.groupby("event_type"):
        a = np.sort(grp.loc[early[grp.index], "value"].to_numpy())
        b = np.sort(grp.loc[~early[grp.index], "value"].to_numpy())
        n, m = len(a), len(b)
        pooled = np.concatenate([a, b])
        fa = np.searchsorted(a, pooled, side="right") / n
        fb = np.searchsorted(b, pooled, side="right") / m
        t = n * m / (n + m) ** 2 * float(((fa - fb) ** 2).sum())
        row = got[etype]
        assert row["n_early"] == n and row["n_late"] == m
        assert abs(row["cvm_t"] - t) < 2e-6, (etype, row["cvm_t"], t)
        assert row["drift_detected"] == (row["cvm_t"] > row["cvm_crit"])


def test_catrend_z_is_sqrt_n_times_corr(spark, sf_dir):
    """Cochran-Armitage z == sqrt(N) * Pearson corr(score, outcome) —
    the subject-level identity, re-derived independently in numpy."""
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    yc = (orders["o_totalprice"] * 100).round().astype("int64")
    mu = yc.sum() / len(yc)
    conv = set(orders.loc[yc > mu, "o_custkey"])
    balcents = (cust["c_acctbal"] * 100).round().astype("int64")
    dose = np.floor(balcents.to_numpy() / 100000.0).astype(int)
    y = cust["c_custkey"].isin(conv).to_numpy().astype(int)
    z_ref = math.sqrt(len(y)) * float(np.corrcoef(dose, y)[0, 1])

    rows = r10_staged.balance_conversion_catrend(spark, sf_dir).collect()
    assert len(rows) == len(set(dose))
    z_got = rows[0]["ca_z"]
    assert all(r["ca_z"] == z_got for r in rows)
    assert abs(z_got - z_ref) < 5e-6, (z_got, z_ref)
    assert rows[0]["trend_detected"] == (abs(z_got) > 1.96)
    per = {d: (int((dose == d).sum()), int(y[dose == d].sum()))
           for d in set(dose)}
    for r in rows:
        n_k, r_k = per[r["dose"]]
        assert (r["n_customers"], r["n_converted"]) == (n_k, r_k)


def test_mmd2_matches_bruteforce(spark, sf_dir):
    """The moment-matrix collapse equals the definitional biased MMD²
    with k(x,y) = (x·y)² — numpy computes BOTH forms per label on the
    snapped coordinates and checks them against the engine."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    got = {r["label"]: r
           for r in r10_staged.embedding_mmd2_drift(spark, sf_dir)
           .collect()}
    for label, grp in emb.groupby("label"):
        x = np.vstack(grp["embedding"].to_numpy()).astype("float64")
        xs = np.round(x * 100000.0) / 100000.0  # the snapped coords
        half = (grp["vec_id"].to_numpy() % 2) == 0
        a, b = xs[half], xs[~half]
        if not len(a) or not len(b):
            assert label not in got
            continue
        ka = (a @ a.T) ** 2
        kb = (b @ b.T) ** 2
        kab = (a @ b.T) ** 2
        mmd_def = (ka.mean() + kb.mean() - 2 * kab.mean())
        ma = (a.T @ a) / len(a)
        mb = (b.T @ b) / len(b)
        mmd_mom = float(((ma - mb) ** 2).sum())
        assert abs(mmd_def - mmd_mom) < 1e-12
        row = got[label]
        assert (row["n_a"], row["n_b"]) == (len(a), len(b))
        assert abs(row["mmd2"] - mmd_mom) < 2e-9
        share = mmd_mom / float((ma ** 2).sum() + (mb ** 2).sum())
        assert abs(row["drift_share"] - share) < 2e-9
        assert row["drifted"] == (row["drift_share"] > 0.05)


def test_kuiper_matches_bruteforce_and_dominates_ks(spark, sf_dir):
    """Kuiper V equals the brute-force D⁺ + D⁻ over second-of-day
    ECDFs, and V >= the KS max-|gap| on the same split (D⁺+D⁻ >=
    max(D⁺, D⁻) always)."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    day = ev["ts"].dt.normalize()
    early = day < (day.min() + pd.Timedelta(days=15))
    tod = (ev["ts"].dt.hour * 3600 + ev["ts"].dt.minute * 60
           + ev["ts"].dt.second).to_numpy()
    got = {r["event_type"]: r
           for r in r10_staged.events_kuiper_tod_drift(spark, sf_dir)
           .collect()}
    for etype, grp in ev.groupby("event_type"):
        a = np.sort(tod[grp.index[early[grp.index]]])
        b = np.sort(tod[grp.index[~early[grp.index]]])
        n, m = len(a), len(b)
        grid = np.unique(np.concatenate([a, b]))
        fa = np.searchsorted(a, grid, side="right") / n
        fb = np.searchsorted(b, grid, side="right") / m
        dpos = max(float((fa - fb).max()), 0.0)
        dneg = max(float((fb - fa).max()), 0.0)
        row = got[etype]
        assert (row["n_early"], row["n_late"]) == (n, m)
        assert abs(row["kuiper_v"] - (dpos + dneg)) < 2e-6
        assert row["kuiper_v"] >= max(dpos, dneg) - 2e-6
        assert row["drift_detected"] == (row["kuiper_v"]
                                         > row["kuiper_crit"])


def test_ratio_delta_matches_definitional_covariances(spark, sf_dir):
    """The all-integer delta bracket equals the textbook delta-method
    variance from np.cov per-user moments; the md5 A/A split must come
    back not-significant (both arms sample the same traffic)."""
    import hashlib

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    per_user = (ev.assign(mv=(ev["value"] * 1000).round().astype("int64"))
                .groupby("user_id")
                .agg(n_u=("mv", "size"), y_u=("mv", "sum"))
                .reset_index())
    arm = per_user["user_id"].map(
        lambda u: int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16)
        % 2)
    ref = {}
    for a in (0, 1):
        g = per_user[arm == a]
        k = len(g)
        y, n = g["y_u"].to_numpy(float), g["n_u"].to_numpy(float)
        r = y.sum() / n.sum()
        cov = np.cov(y, n, ddof=1)
        var = (cov[0, 0] - 2 * r * cov[0, 1] + r * r * cov[1, 1]) \
            / (k * n.mean() ** 2)
        ref[a] = (k, int(n.sum()), int(g["y_u"].sum()), r, var)
    rows = {r["arm"]: r
            for r in r10_staged.ab_ratio_metric_delta(spark, sf_dir)
            .collect()}
    for a in (0, 1):
        k, sn, sy, r, var = ref[a]
        row = rows[a]
        assert (row["n_users"], row["n_events"],
                row["sum_value_milli"]) == (k, sn, sy)
        assert abs(row["ratio_per_event"] - r / 1000.0) < 2e-6
        assert abs(row["se_ratio"] - math.sqrt(var) / 1000.0) < 1e-7
    z_ref = (ref[1][3] - ref[0][3]) / math.sqrt(ref[0][4] + ref[1][4])
    assert abs(rows[0]["delta_z"] - z_ref) < 1e-4
    assert rows[0]["significant"] == (abs(rows[0]["delta_z"]) > 1.96)
    # A/A calibration: same traffic on both arms -> no significance
    assert not rows[0]["significant"]


def test_rbo_matches_bruteforce_and_identity(spark, sf_dir):
    """Per-query RBO_EXT equals the pure-python Webber eq.30 replay on
    the two ranking chains' own outputs; the formula gives exactly 1
    on identical lists; values stay in [0, 1]."""
    from qrapids_forecast_r_script_spark.operators import similarity

    assert r10_staged._RBO_K == similarity._TOP_K
    p, k = r10_staged._RBO_P, r10_staged._RBO_K

    def rbo_ext(list_a, list_b):
        tot = 0.0
        for d in range(1, k + 1):
            a_d = len(set(list_a[:d]) & set(list_b[:d])) / d
            tot += (1 - p) * p ** (d - 1) * a_d
        a_k = len(set(list_a[:k]) & set(list_b[:k])) / k
        return tot + p ** k * a_k

    ident = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
    assert abs(rbo_ext(ident, ident) - 1.0) < 1e-12

    def ranking(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], {})[r["rank"]] = \
                r["neighbor_id"]
        return {q: [d[i] for i in sorted(d)] for q, d in out.items()}

    bf = ranking(similarity.cosine_topk_bruteforce(spark, sf_dir))
    ann = ranking(similarity.pq_topk(spark, sf_dir))
    rows = {r["query_id"]: r
            for r in r10_staged.retrieval_rbo_eval(spark, sf_dir)
            .collect()}
    assert sorted(rows) == sorted(bf)
    micros = []
    for q, row in rows.items():
        ref = rbo_ext(bf[q], ann.get(q, []))
        assert 0.0 <= row["rbo_ext"] <= 1.0 + 1e-9
        assert abs(row["rbo_ext"] - ref) < 2e-8, (q, row["rbo_ext"], ref)
        assert row["overlap_at_k"] == len(set(bf[q]) & set(ann.get(q, [])))
        micros.append(round(row["rbo_ext"] * 1e9))
    assert abs(rows[min(rows)]["mean_rbo"]
               - round(sum(micros) / 1e9 / len(micros), 6)) < 2e-6


def test_stump_split_matches_bruteforce(spark, sf_dir):
    """Per-candidate Gini gains equal an independent pandas replay of
    the 256-bin histogram; is_best marks the (max gain, lowest bin)
    argmax; and each bin's split_at_cents is a TRUE boundary — every
    left-bin customer sits at or below it, every right-bin customer
    above it."""
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    yc = (orders["o_totalprice"] * 100).round().astype("int64")
    conv = set(orders.loc[yc > yc.sum() / len(yc), "o_custkey"])
    cents = (cust["c_acctbal"] * 100).round().astype("int64").to_numpy()
    y = cust["c_custkey"].isin(conv).to_numpy().astype(int)
    mn, mx = int(cents.min()), int(cents.max())
    w = mx - mn + 1
    bins = (cents - mn) * 256 // w
    n_tot, p_tot = len(y), int(y.sum())

    def g(n, p):
        return n - (p * p + (n - p) * (n - p)) / n

    rows = r10_staged.balance_stump_split(spark, sf_dir).collect()
    assert rows
    best_seen = []
    for r in rows:
        left = bins <= r["bin"]
        nl, pl = int(left.sum()), int(y[left].sum())
        assert (r["n_left"], r["pos_left"]) == (nl, pl)
        assert (r["n_right"], r["pos_right"]) == (n_tot - nl,
                                                  p_tot - pl)
        gain = (g(n_tot, p_tot) - g(nl, pl)
                - g(n_tot - nl, p_tot - pl))
        assert abs(r["gini_gain"] - gain) < 2e-9
        assert cents[left].max() <= r["split_at_cents"]
        if nl < n_tot:
            assert cents[~left].min() > r["split_at_cents"]
        if r["is_best"]:
            best_seen.append(r)
    assert len(best_seen) == 1
    top = max(rows, key=lambda r: (r["gini_gain"], -r["bin"]))
    assert best_seen[0]["gini_gain"] == top["gini_gain"]
    assert (best_seen[0]["bin"]
            == min(r["bin"] for r in rows
                   if r["gini_gain"] == top["gini_gain"]))


def test_cochran_q_matches_bruteforce(spark, sf_dir):
    """Q equals the definitional k(k-1)·Σ(G_j - Ḡ)²/(kΣL - ΣL²) on the
    explicit user×type presence matrix built in pandas."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    x = (ev[ev["value"] > 200].assign(one=1)
         .pivot_table(index="user_id", columns="event_type",
                      values="one", aggfunc="max", fill_value=0))
    k = x.shape[1]
    gj = x.sum(axis=0).to_numpy(float)
    li = x.sum(axis=1).to_numpy(float)
    q_ref = (k * (k - 1) * float(((gj - gj.mean()) ** 2).sum())
             / (k * li.sum() - float((li ** 2).sum())))
    rows = r10_staged.user_type_cochran_q(spark, sf_dir).collect()
    assert len(rows) == k
    r0 = rows[0]
    assert (r0["k_types"], r0["n_users"]) == (k, x.shape[0])
    assert r0["df"] == k - 1
    assert abs(r0["q_stat"] - q_ref) < 2e-6, (r0["q_stat"], q_ref)
    assert r0["significant"] == (r0["q_stat"] > r0["chi2_crit"])
    byt = {r["event_type"]: r["n_users_with"] for r in rows}
    for etype, cnt in x.sum(axis=0).items():
        assert byt[etype] == cnt


def test_jonckheere_matches_bruteforce(spark, sf_dir):
    """2J equals the O(n²) definitional pairwise count over ordered
    group pairs (ties half); the tie-corrected null moments match a
    python recompute of Hollander & Wolfe §6.2; z ties out."""
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    yc = (orders["o_totalprice"] * 100).round().astype("int64")
    spend_by = orders.assign(yc=yc).groupby("o_custkey")["yc"].sum()
    balcents = (cust["c_acctbal"] * 100).round().astype("int64")
    dose = np.floor(balcents.to_numpy() / 100000.0).astype(int)
    spend = cust["c_custkey"].map(spend_by).fillna(0).astype("int64") \
        .to_numpy()
    groups = sorted(set(dose))
    two_j = 0
    for i, gk in enumerate(groups):
        xk = spend[dose == gk]
        for gl in groups[i + 1:]:
            xl = spend[dose == gl]
            lt = (xk[:, None] < xl[None, :]).sum()
            eq = (xk[:, None] == xl[None, :]).sum()
            two_j += 2 * int(lt) + int(eq)
    n_tot = len(spend)
    nk = np.array([(dose == gg).sum() for gg in groups], dtype="int64")
    tv = pd.Series(spend).value_counts().to_numpy().astype("int64")
    e4 = n_tot * n_tot - int((nk * nk).sum())
    var = (float(n_tot * (n_tot - 1) * (2 * n_tot + 5)
                 - (nk * (nk - 1) * (2 * nk + 5)).sum()
                 - (tv * (tv - 1) * (2 * tv + 5)).sum()) / 72.0
           + float((nk * (nk - 1) * (nk - 2)).sum())
           * float((tv * (tv - 1) * (tv - 2)).sum())
           / (36.0 * n_tot * (n_tot - 1) * (n_tot - 2))
           + float((nk * (nk - 1)).sum()) * float((tv * (tv - 1)).sum())
           / (8.0 * n_tot * (n_tot - 1)))
    z_ref = (two_j / 2.0 - e4 / 4.0) / math.sqrt(var)
    rows = r10_staged.spend_trend_jonckheere(spark, sf_dir).collect()
    assert len(rows) == len(groups)
    r0 = rows[0]
    assert r0["two_j"] == two_j
    assert r0["n_total"] == n_tot
    assert abs(r0["jt_z"] - z_ref) < 2e-6, (r0["jt_z"], z_ref)
    assert r0["trend_detected"] == (abs(r0["jt_z"]) > 1.96)
    per = {g: ((dose == g).sum(), int(spend[dose == g].sum()))
           for g in groups}
    for r in rows:
        nn, ts = per[r["dose"]]
        assert (r["n_customers"], r["total_spend_cents"]) == (nn, ts)


def test_bleu_matches_bruteforce(spark, sf_dir):
    """Every emitted pair's clipped precisions, brevity penalty, and
    BLEU-2 match a Counter-based python replay; bounds hold."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    texts = dict(zip(docs["doc_id"], docs["text"]))
    rows = r10_staged.bleu_neardup_pairs(spark, sf_dir).collect()
    assert rows, "LSH candidate pairs expected at test SF"
    for r in rows:
        a = texts[r["doc_a"]].split(" ")
        b = texts[r["doc_b"]].split(" ")
        assert (r["len_a"], r["len_b"]) == (len(a), len(b))
        c1, r1 = Counter(a), Counter(b)
        m1 = sum(min(c, r1[g]) for g, c in c1.items())
        big_a = [f"{x} {y}" for x, y in zip(a, a[1:])]
        big_b = [f"{x} {y}" for x, y in zip(b, b[1:])]
        c2, r2 = Counter(big_a), Counter(big_b)
        m2 = sum(min(c, r2[g]) for g, c in c2.items())
        assert (r["match_1"], r["match_2"]) == (m1, m2)
        p1 = m1 / len(a)
        p2 = m2 / (len(a) - 1) if len(a) > 1 else 0.0
        bp = 1.0 if len(a) > len(b) else math.exp(1.0 - len(b) / len(a))
        bleu = (bp * math.sqrt(p1 * p2)
                if m1 > 0 and m2 > 0 and len(a) > 1 else 0.0)
        assert abs(r["p1"] - p1) < 1e-6
        assert abs(r["p2"] - p2) < 1e-6
        assert abs(r["bleu2"] - bleu) < 2e-6
        assert 0.0 <= r["bleu2"] <= 1.0 + 1e-9
