"""Round-4 continuation batch 9: semantic tests for the nine new
operators (binary-quantized ANN, skyline frontier, Mann-Whitney U,
diff-in-diff, doc entropy, feature hashing, Hill tail index,
recursive-CTE BFS, recursive Holt-Winters).

Oracle parity is covered for all nine by test_oracle_parity.py's
auto-parametrization; these tests pin the SEMANTICS — the definitions
and invariants an engine-vs-engine match alone would not prove.
"""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------- binary quantization

def test_binary_quant_recall_vs_bruteforce(spark, sf_dir):
    """1-bit Hamming shortlist + exact re-rank must recover most of the
    true cosine top-10 (sign bits preserve the coarse angle)."""
    from qrapids_forecast_r_script_spark.operators.similarity import (
        binary_quant_topk, cosine_topk_bruteforce)
    bq = binary_quant_topk(spark, sf_dir).collect()
    bf = cosine_topk_bruteforce(spark, sf_dir).collect()
    truth = {}
    for r in bf:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in bq:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(got[q] & truth[q]) / len(truth[q]) for q in truth]
    assert len(recalls) == 5
    assert sum(recalls) / len(recalls) >= 0.5


def test_binary_quant_hamming_bounds(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.similarity import (
        binary_quant_topk)
    rows = binary_quant_topk(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.hamming <= 64
        assert -1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9


# ------------------------------------------------------------- skyline

def test_skyline_is_mutually_nondominated_and_complete(spark, sf_dir):
    """Every frontier pair is mutually non-dominated, and every
    non-frontier part is dominated by some frontier part — together
    these characterize the skyline exactly."""
    from qrapids_forecast_r_script_spark.operators.relational_ext import (
        parts_skyline_frontier)
    from qrapids_forecast_r_script_spark.sources import load_table
    sky = [(r.retail_price, r.p_size, r.p_partkey)
           for r in parts_skyline_frontier(spark, sf_dir).collect()]
    allp = [(round(r.p_retailprice, 2), r.p_size, r.p_partkey)
            for r in load_table(spark, sf_dir, "part").collect()]
    assert sky

    def dominates(a, b):
        return (a[0] <= b[0] and a[1] >= b[1]
                and (a[0] < b[0] or a[1] > b[1]))

    for a in sky:
        for b in sky:
            assert not dominates(a, b)
    skykeys = {k for _, _, k in sky}
    for p in allp:
        if p[2] in skykeys:
            continue
        assert any(dominates(s, p) for s in sky), p


# -------------------------------------------------------- Mann-Whitney U

def test_mannwhitney_matches_numpy_definition(spark, sf_dir):
    """U from the rank-sum pipeline equals the O(n_a*n_b) pairwise
    definition: U = #(a>b) + 0.5*#(a==b)."""
    from qrapids_forecast_r_script_spark.operators.product_analytics import (
        ab_mannwhitney_test)
    from qrapids_forecast_r_script_spark.sources import load_table
    row = ab_mannwhitney_test(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    arm = (F.conv(F.substring(F.md5(F.col("user_id").cast("string")),
                              1, 8), 16, 10).cast("bigint") % 2)
    users = (ev.groupBy("user_id")
             .agg(F.coalesce(
                 F.sum(F.when(F.col("event_type") == "purchase",
                              F.round(F.col("value") * 100, 0)
                              .cast("long"))), F.lit(0).cast("long"))
                 .alias("cents"))
             .withColumn("arm", arm)).collect()
    a = np.array([u.cents for u in users if u.arm == 0], dtype=float)
    b = np.array([u.cents for u in users if u.arm == 1], dtype=float)
    u_def = float((a[:, None] > b[None, :]).sum()
                  + 0.5 * (a[:, None] == b[None, :]).sum())
    assert row.n_a == len(a) and row.n_b == len(b)
    assert row.u_a == pytest.approx(u_def, abs=0.51)
    assert 0 <= row.u_a <= row.n_a * row.n_b
    # A/A split: must not be significant
    assert not row.significant


# ------------------------------------------------------------ diff-in-diff

def test_did_identity_and_aa_null(spark, sf_dir):
    """DiD estimate equals mean_delta_t - mean_delta_c exactly, and the
    A/A hash split is statistically null."""
    from qrapids_forecast_r_script_spark.operators.product_analytics import (
        ab_diff_in_diff)
    row = ab_diff_in_diff(spark, sf_dir).collect()[0]
    assert row.did_estimate == pytest.approx(
        row.mean_delta_t - row.mean_delta_c, abs=2e-6)
    assert row.se > 0
    assert not row.significant


# ------------------------------------------------------------- entropy

def test_entropy_bounds_and_degenerate_cases(spark, sf_dir):
    """0 <= H <= ln(V); evenness in [0, 1]; single-token docs (if any)
    have H = 0."""
    from qrapids_forecast_r_script_spark.operators.text_quality import (
        doc_entropy_scores)
    rows = doc_entropy_scores(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1e-6 <= r.entropy <= math.log(r.n_distinct) + 1e-6
        assert -1e-6 <= r.evenness <= 1.0 + 1e-6
        if r.n_distinct == 1:
            assert r.entropy == pytest.approx(0.0, abs=1e-6)


def test_entropy_matches_numpy_on_sample(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.text_quality import (
        doc_entropy_scores)
    from qrapids_forecast_r_script_spark.sources import load_table
    rows = {r.doc_id: r
            for r in doc_entropy_scores(spark, sf_dir).collect()}
    docs = (load_table(spark, sf_dir, "documents")
            .orderBy("doc_id").limit(20).collect())
    for d in docs:
        toks = d.text.split(" ")
        _, counts = np.unique(toks, return_counts=True)
        p = counts / counts.sum()
        h = float(-(p * np.log(p)).sum())
        assert rows[d.doc_id].entropy == pytest.approx(h, abs=5e-6)


# -------------------------------------------------------- feature hashing

def test_feature_hash_unit_norm_and_width(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.training_prep import (
        _FH_BUCKETS, feature_hash_vectors)
    rows = feature_hash_vectors(spark, sf_dir).collect()
    assert rows
    by_doc = {}
    for r in rows:
        assert 0 <= r.bucket < _FH_BUCKETS
        assert r.val != 0
        by_doc.setdefault(r.doc_id, []).append(r.weight)
    for doc, ws in by_doc.items():
        assert sum(w * w for w in ws) == pytest.approx(1.0, abs=1e-4)


def test_feature_hash_same_tokens_same_vector(spark, sf_dir):
    """The map is content-defined: two docs with identical token
    multisets get identical sparse vectors (hash has no doc term)."""
    from qrapids_forecast_r_script_spark.operators.training_prep import (
        feature_hash_vectors)
    import pandas as pd
    rows = feature_hash_vectors(spark, sf_dir).toPandas()
    from qrapids_forecast_r_script_spark.sources import load_table
    docs = (load_table(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 10 == 0)
            .select("doc_id", "text").toPandas())
    key = {r.doc_id: " ".join(sorted(r.text.split(" ")))
           for r in docs.itertuples()}
    sigs = {}
    for doc_id, g in rows.groupby("doc_id"):
        sig = tuple(sorted(zip(g.bucket, g.val)))
        sigs.setdefault(key[doc_id], set()).add(sig)
    for k, s in sigs.items():
        assert len(s) == 1, "same multiset must hash identically"


# ------------------------------------------------------------ Hill index

def test_hill_estimator_matches_numpy(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.data_quality import (
        _HILL_K, hill_tail_index)
    from qrapids_forecast_r_script_spark.sources import load_table
    row = hill_tail_index(spark, sf_dir).collect()[0]
    cents = np.array(sorted(
        (int(round(r.o_totalprice * 100))
         for r in load_table(spark, sf_dir, "orders").collect()),
        reverse=True), dtype=float)
    top = cents[:_HILL_K + 1]
    thr = top[-1]
    excess = np.round(np.log(top[top > thr]) - np.log(thr), 6)
    alpha = 1.0 / excess.mean()
    assert row.k_used == int((top > thr).sum())
    assert row.hill_alpha == pytest.approx(alpha, abs=1e-4)
    assert row.hill_alpha > 0


# ------------------------------------------------------ recursive BFS

def test_bfs_distances_are_valid(spark, sf_dir):
    """Seed at distance 0; every other distance d>0 has a neighbor at
    d-1 (BFS layering invariant); all within the depth cap."""
    from qrapids_forecast_r_script_spark.operators.dedup import (
        minhash_lsh_pairs)
    from qrapids_forecast_r_script_spark.operators.graph import (
        _BFS_DEPTH, doc_graph_bfs_reachability)
    dist = {r.doc_id: r.dist
            for r in doc_graph_bfs_reachability(spark, sf_dir).collect()}
    pairs = minhash_lsh_pairs(spark, sf_dir).collect()
    adj = {}
    for p in pairs:
        adj.setdefault(p.doc_a, set()).add(p.doc_b)
        adj.setdefault(p.doc_b, set()).add(p.doc_a)
    seed = min(adj)
    assert dist[seed] == 0
    for doc, d in dist.items():
        assert 0 <= d <= _BFS_DEPTH
        if d > 0:
            assert any(dist.get(nb) == d - 1 for nb in adj[doc]), doc
    # true BFS: recomputed distances agree
    import collections
    q = collections.deque([(seed, 0)])
    seen = {seed: 0}
    while q:
        u, d = q.popleft()
        if d == _BFS_DEPTH:
            continue
        for v in adj.get(u, ()):
            if v not in seen:
                seen[v] = d + 1
                q.append((v, d + 1))
    assert dist == seen


# -------------------------------------------------------- Holt-Winters

def _hw_reference(y, m=7):
    """Plain-python reference of the documented contract."""
    l = sum(y[:m]) / m
    b = (sum(y[m:2 * m]) - sum(y[:m])) / (m * m)
    s = [v - l for v in y[:m]]
    sse = 0.0
    for t in range(m, len(y)):
        yt = y[t]
        fitted = l + b + s[0]
        sse += (yt - fitted) ** 2
        lnew = 0.5 * (yt - s[0]) + 0.5 * (l + b)
        bnew = 0.5 * (lnew - l) + 0.5 * b
        snew = 0.5 * (yt - l - b) + 0.5 * s[0]
        l, b = lnew, bnew
        s = s[1:] + [snew]
    return l, b, s, sse


def test_holtwinters_matches_python_reference(spark, sf_dir):
    from qrapids_forecast_r_script_spark.forecast.queries import (
        _metrics, forecast_holtwinters_events)
    from pyspark.sql.window import Window
    out = forecast_holtwinters_events(spark, sf_dir).collect()
    assert out
    w = Window.partitionBy("name", "index").orderBy("evaluationDate")
    pdf = (_metrics(spark, sf_dir)
           .withColumn("t", F.row_number().over(w)).toPandas())
    for (name, _), g in pdf.groupby(["name", "index"]):
        ys = [round(round(v, 6) * 1e6) / 1e6
              for v in g.sort_values("t").value.tolist()]
        if len(ys) < 15:
            assert not [r for r in out if r.name == name]
            continue
        l, b, s, sse = _hw_reference(ys)
        rows = sorted((r for r in out if r.name == name),
                      key=lambda r: r.step)
        assert len(rows) == 14
        for r in rows:
            h = r.step
            mean = l + h * b + s[(h - 1) % 7]
            assert r.mean == pytest.approx(mean, abs=2e-6), (name, h)
            # bands are symmetric and widen with the variance profile
            assert r.lower2 <= r.lower1 <= r.mean <= r.upper1 <= r.upper2
        # horizon-wise widening within each season cycle
        widths = [r.upper2 - r.lower2 for r in rows]
        assert widths[6] >= widths[0]
        assert widths[13] >= widths[7]


def test_holtwinters_recovers_pure_seasonal_trend(spark):
    """On a noiseless trend+seasonal series the recursion converges to
    near-zero one-step error and the forecast extrapolates exactly."""
    m = 7
    seas = [3, -2, 1, 0, -1, 2, -3]

    def max_err(n):
        y = [10 + 0.5 * t + seas[t % m] for t in range(n)]
        l, b, s, _ = _hw_reference(y)
        return b, max(
            abs(l + h * b + s[(h - 1) % m]
                - (10 + 0.5 * (n - 1 + h) + seas[(n + h - 1) % m]))
            for h in range(1, 8))

    b_short, err_short = max_err(63)
    b_long, err_long = max_err(280)
    # init-tilt transient decays (slowly — the seasonal unit roots sit
    # near the gain's half-life) and the trend state locks onto 0.5
    assert err_long < 0.15 < err_short
    assert b_long == pytest.approx(0.5, abs=0.02)


# ------------------------------------------------------- bootstrap CI

def test_bootstrap_ci_brackets_and_is_deterministic(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.product_analytics import (
        _BOOT_REPS, revenue_bootstrap_ci)
    r1 = revenue_bootstrap_ci(spark, sf_dir).collect()[0]
    r2 = revenue_bootstrap_ci(spark, sf_dir).collect()[0]
    assert r1 == r2, "md5 resampling must be retry-stable"
    assert r1.n_reps == _BOOT_REPS
    assert r1.ci_lo < r1.ci_hi
    assert r1.boot_se > 0
    # the percentile interval brackets the point estimate here (skew
    # is mild at these SFs) and is a plausible multiple of the SE
    assert r1.ci_lo <= r1.mean_daily <= r1.ci_hi
    spread = r1.ci_hi - r1.ci_lo
    assert 2.0 * r1.boot_se <= spread <= 6.0 * r1.boot_se


# ------------------------------------------------------------ Chao1

def test_chao1_matches_python_and_bounds(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.text_quality import (
        chao1_vocab_estimate)
    from qrapids_forecast_r_script_spark.sources import load_table
    import collections
    rows = {r.lang: r for r in chao1_vocab_estimate(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").collect()
    by_lang = collections.defaultdict(collections.Counter)
    for d in docs:
        by_lang[d.lang].update(d.text.split(" "))
    assert set(rows) == set(by_lang)
    for lang, cnt in by_lang.items():
        r = rows[lang]
        f1 = sum(1 for c in cnt.values() if c == 1)
        f2 = sum(1 for c in cnt.values() if c == 2)
        assert r.v_seen == len(cnt) and r.f1 == f1 and r.f2 == f2
        assert r.n_tokens == sum(cnt.values())
        chao = (len(cnt) + f1 * f1 / (2 * f2)) if f2 else float(len(cnt))
        assert r.chao1_vocab == pytest.approx(chao, abs=1e-3)
        assert r.chao1_vocab >= r.v_seen
        assert 0.0 <= r.unseen_mass <= 1.0


# ---------------------------------------- alignment / uniformity

def test_alignment_uniformity_bounds(spark, sf_dir):
    """Unit-sphere identities: d2 in [0,4] so alignment in [0,4] and
    uniformity in [-8, 0]; sample is the documented constant."""
    from qrapids_forecast_r_script_spark.operators.similarity import (
        _AU_SAMPLE, embedding_alignment_uniformity)
    r = embedding_alignment_uniformity(spark, sf_dir).collect()[0]
    n = _AU_SAMPLE
    assert r.n_pairs == n * (n - 1) // 2
    assert 0 < r.n_pos_pairs < r.n_pairs
    assert 0.0 <= r.alignment <= 4.0
    assert -8.0 <= r.uniformity <= 0.0
    # labeled clusters: same-label pairs must sit closer than average,
    # i.e. alignment below the all-pairs mean distance implied bound
    assert r.uniformity < -0.5, "collapse would push uniformity to 0"


# ---------------------------------------- Markov stationary

def test_markov_stationary_is_a_distribution(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.product_analytics import (
        event_markov_stationary)
    rows = event_markov_stationary(spark, sf_dir).collect()
    assert len(rows) >= 2
    s = sum(r.stationary_p for r in rows)
    assert s == pytest.approx(1.0, abs=1e-4)
    e = sum(r.empirical_share for r in rows)
    assert e == pytest.approx(1.0, abs=1e-4)
    for r in rows:
        assert 0.0 <= r.stationary_p <= 1.0


def test_markov_stationary_matches_numpy_power(spark, sf_dir):
    """Two numpy power iterations from uniform over the same rounded
    transition matrix give the same vector."""
    from qrapids_forecast_r_script_spark.operators.product_analytics import (
        event_markov_stationary)
    from qrapids_forecast_r_script_spark.streaming.queries import (
        sessionize_events)
    from qrapids_forecast_r_script_spark.sources import load_table
    from pyspark.sql.window import Window
    rows = {r.event_type: r.stationary_p
            for r in event_markov_stationary(spark, sf_dir).collect()}
    sess = sessionize_events(load_table(spark, sf_dir, "events"))
    w = (Window.partitionBy("user_id", "session_id")
         .orderBy("ts", "event_id"))
    trans = (sess.withColumn("to_type", F.lead("event_type").over(w))
             .where(F.col("to_type").isNotNull())
             .groupBy("event_type", "to_type").count().collect())
    states = sorted({t.event_type for t in trans}
                    | {t.to_type for t in trans})
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    P = np.zeros((k, k))
    for t in trans:
        P[idx[t.event_type], idx[t.to_type]] = t["count"]
    P = P / P.sum(axis=1, keepdims=True)
    pi = np.full(k, 1.0 / k)
    for _ in range(2):
        pi = np.round(pi @ P, 6)
    for s, i in idx.items():
        assert rows[s] == pytest.approx(pi[i], abs=2e-6)


# ------------------------------------------------------- UCB1 replay

def test_ucb1_replay_matches_python_reference(spark, sf_dir):
    """The full decision trace equals a plain-python UCB1 replay over
    the same reward table (argmax discipline: 1e-9-rounded scores,
    lowest-index ties)."""
    from qrapids_forecast_r_script_spark.operators.product_analytics import (
        ucb1_replay_policy)
    from qrapids_forecast_r_script_spark.sources import load_table
    rows = ucb1_replay_policy(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("c"),
        "event_id").collect()
    days = sorted({r.day for r in ev})
    arms = sorted({r.event_type for r in ev})
    k = len(arms)
    agg = {}
    for r in ev:
        key = (r.day, r.event_type)
        tot, cnt = agg.get(key, (0, 0))
        agg[key] = (tot + r.c, cnt + 1)
    def reward(t, a):
        tot, cnt = agg.get((days[t - 1], arms[a - 1]), (0, 0))
        return round(tot / cnt / 100, 6) if cnt else 0.0
    n = [1] * (k + 1)
    s = [0.0] * (k + 1)
    for a in range(1, k + 1):
        s[a] = reward(a, a)
    trace = []
    for t in range(k + 1, len(days) + 1):
        ucb = [round(s[a] / n[a]
                     + math.sqrt(2 * math.log(t - 1) / n[a]), 9)
               for a in range(1, k + 1)]
        a = ucb.index(max(ucb)) + 1
        r = reward(t, a)
        n[a] += 1
        s[a] += r
        trace.append((t, arms[a - 1], round(r, 6)))
    got = [(r.t, r.chosen_arm, r.reward) for r in rows]
    assert got == trace
    # cumulative reward is monotone (rewards are non-negative here)
    cums = [r.cum_reward for r in rows]
    assert all(b >= a for a, b in zip(cums, cums[1:]))


# --------------------------------------------------------- modularity

def test_modularity_matches_python_and_is_positive(spark, sf_dir):
    """Q recomputed in python over the same labels/edges; real dup
    communities must score well above the random-cut 0."""
    from qrapids_forecast_r_script_spark.operators.dedup import (
        minhash_lsh_pairs)
    from qrapids_forecast_r_script_spark.operators.graph import (
        _lpa_labels, doc_graph_modularity)
    row = doc_graph_modularity(spark, sf_dir).collect()[0]
    labels_df, pairs_df, _ = _lpa_labels(spark, sf_dir)
    lbl = {r.doc_id: r.lbl for r in labels_df.collect()}
    edges = [(p.doc_a, p.doc_b) for p in pairs_df.collect()]
    m = len(edges)
    assert row.n_edges == m
    import collections
    lc = collections.Counter()
    dc = collections.Counter()
    for a, b in edges:
        if lbl[a] == lbl[b]:
            lc[lbl[a]] += 1
        dc[lbl[a]] += 1
        dc[lbl[b]] += 1
    q = sum(round(lc.get(c, 0) / m - (d / (2 * m)) ** 2, 9)
            for c, d in dc.items())
    assert row.modularity == pytest.approx(q, abs=2e-6)
    assert -1.0 <= row.modularity <= 1.0
    assert row.modularity > 0.1, "dup communities are real structure"


# --------------------------------------------------- weighted Jaccard

def test_weighted_jaccard_identities(spark, sf_dir):
    """Per-pair: wjaccard equals the python multiset computation;
    identical docs (if any pair) score 1.0; weighted <= 1 and both
    metrics agree on containment ordering sanity."""
    from qrapids_forecast_r_script_spark.operators.dedup import (
        weighted_jaccard_pairs)
    from qrapids_forecast_r_script_spark.sources import load_table
    import collections
    rows = weighted_jaccard_pairs(spark, sf_dir).collect()
    assert rows
    texts = {d.doc_id: collections.Counter(d.text.split(" "))
             for d in load_table(spark, sf_dir, "documents").collect()}
    for r in rows:
        ca, cb = texts[r.doc_a], texts[r.doc_b]
        smin = sum((ca & cb).values())
        smax = sum((ca | cb).values())
        wj = round(smin / smax, 6)
        inter = len(set(ca) & set(cb))
        un = len(set(ca) | set(cb))
        assert r.wjaccard == pytest.approx(wj, abs=1e-6), (r.doc_a, r.doc_b)
        assert r.jaccard == pytest.approx(round(inter / un, 6), abs=1e-6)
        assert 0.0 <= r.wjaccard <= 1.0
        assert r.ninter == inter


# ----------------------------------------------- sampled closeness

def test_closeness_matches_python_bfs(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.dedup import (
        minhash_lsh_pairs)
    from qrapids_forecast_r_script_spark.operators.graph import (
        _BFS_DEPTH, _CL_SEEDS, doc_graph_closeness_sampled)
    import collections
    rows = {r.seed: r
            for r in doc_graph_closeness_sampled(spark, sf_dir).collect()}
    pairs = minhash_lsh_pairs(spark, sf_dir).collect()
    adj = collections.defaultdict(set)
    for p in pairs:
        adj[p.doc_a].add(p.doc_b)
        adj[p.doc_b].add(p.doc_a)
    seeds = sorted(adj)[:_CL_SEEDS]
    assert set(rows) == set(seeds)
    for seed in seeds:
        seen = {seed: 0}
        q = collections.deque([(seed, 0)])
        while q:
            u, d = q.popleft()
            if d == _BFS_DEPTH:
                continue
            for v in adj[u]:
                if v not in seen:
                    seen[v] = d + 1
                    q.append((v, d + 1))
        r = rows[seed]
        assert r.n_reached == len(seen)
        assert r.total_dist == sum(seen.values())
        harm = round(sum(1.0 / d for d in seen.values() if d > 0), 6)
        assert r.harmonic == pytest.approx(harm, abs=1e-6)


# -------------------------------------------------- revenue bridge

def test_revenue_bridge_reconciles_exactly(spark, sf_dir):
    """The five effect columns must sum to delta_rev per type (the
    bridge identity), and totals must equal the raw year revenues."""
    from qrapids_forecast_r_script_spark.operators.relational_ext import (
        revenue_price_volume_bridge)
    rows = revenue_price_volume_bridge(spark, sf_dir).collect()
    assert rows
    for r in rows:
        bridge = (r.price_effect + r.volume_effect + r.mix_effect
                  + r.new_parts_effect - r.lost_parts_effect)
        assert bridge == pytest.approx(r.delta_rev, abs=0.05), r.p_type
        assert r.delta_rev == pytest.approx(r.rev_y1 - r.rev_y0,
                                            abs=0.02)


# ------------------------------------------- trailing distinct window

def test_trailing_distinct_matches_python(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.relational_more import (
        events_trailing_distinct_types)
    from qrapids_forecast_r_script_spark.sources import load_table
    got = {r.event_id: r.n_types_30m
           for r in events_trailing_distinct_types(spark, sf_dir).collect()}
    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", "user_id", "event_type",
                  F.unix_millis("ts").alias("ms")).collect())
    import collections
    by_user = collections.defaultdict(list)
    for e in ev:
        by_user[e.user_id].append(e)
    n_checked = 0
    for user, es in by_user.items():
        es.sort(key=lambda e: e.ms)
        for i, e in enumerate(es):
            types = {f.event_type for f in es
                     if 0 <= e.ms - f.ms <= 1_800_000}
            assert got[e.event_id] == len(types), e.event_id
            n_checked += 1
    assert n_checked == len(got)
    # every event sees at least itself
    assert all(v >= 1 for v in got.values())


# -------------------------------------------------- sequential looks

def test_sequential_looks_aa_never_crosses(spark, sf_dir):
    """On the A/A hash split no look may cross the spending boundary;
    cumulative counts are monotone; the final look's boundary equals
    the fixed-horizon critical value."""
    from qrapids_forecast_r_script_spark.operators.product_analytics import (
        _AB_Z_CRIT, ab_sequential_looks)
    rows = sorted(ab_sequential_looks(spark, sf_dir).collect(),
                  key=lambda r: r.k)
    assert rows
    assert not any(r.crossed for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert b.n_a >= a.n_a and b.n_b >= a.n_b
        assert b.c_a >= a.c_a and b.c_b >= a.c_b
        assert b.boundary <= a.boundary, "boundary tightens with info"
    assert rows[-1].boundary == pytest.approx(_AB_Z_CRIT, abs=1e-6)
