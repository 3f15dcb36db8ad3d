"""Round-4 continuation batch 16: semantic tests for the five new
operators (exact tie-aware ROC AUC, Murphy Brier decomposition,
leave-one-out/smoothed target encoding, word2vec negative-sampling
table, weighted recursive-CTE shortest paths).

Oracle parity is covered for all five by test_oracle_parity.py's
auto-parametrization; these tests pin the SEMANTICS — each operator is
re-derived brute-force in numpy/pure Python from the same inputs and
must agree, so an engine-vs-engine match can't hide a shared
misdefinition.
"""

import math

import pytest

from pyspark.sql import functions as F


# ------------------------------------------------------------- ROC AUC

def _nb_scored(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.training_prep import (
        nb_quality_classifier)
    return nb_quality_classifier(spark, sf_dir).collect()


def test_roc_auc_matches_pairwise_definition(spark, sf_dir):
    """AUC must equal the O(P·N) pairwise definition
    P(score_pos > score_neg) + ½·P(tie), computed brute-force per
    source on the same fixed-point scores."""
    from qrapids_forecast_r_script_spark.operators.training_prep import (
        roc_auc_eval)
    from qrapids_forecast_r_script_spark.sources import load_table
    got = {r.source: r for r in roc_auc_eval(spark, sf_dir).collect()}
    src = {r.doc_id: r.source
           for r in load_table(spark, sf_dir, "documents")
           .select("doc_id", "source").collect()}
    by_source = {}
    for r in _nb_scored(spark, sf_dir):
        su = round(r.nb_score * 1_000_000)
        by_source.setdefault(src[r.doc_id], ([], []))[
            0 if r.lang == "en" else 1].append(su)
    assert set(got) == set(by_source)
    for s, (pos, neg) in by_source.items():
        num = 0.0
        for p in pos:
            for n in neg:
                num += 1.0 if p > n else (0.5 if p == n else 0.0)
        auc = num / (len(pos) * len(neg))
        assert got[s].n_pos == len(pos) and got[s].n_neg == len(neg)
        assert got[s].auc == pytest.approx(auc, abs=1e-6)
        assert got[s].gini == pytest.approx(2 * auc - 1, abs=1e-5)


# ------------------------------------------------- Brier decomposition

def test_brier_matches_bruteforce_and_components_reconcile(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.training_prep import (
        brier_decomposition)
    row = brier_decomposition(spark, sf_dir).collect()
    assert len(row) == 1
    row = row[0]
    scored = _nb_scored(spark, sf_dir)
    bs = 0.0
    ybar = 0.0
    for r in scored:
        su = round(r.nb_score * 1_000_000)
        pu = round(1e6 / (1.0 + math.exp(-su / 1e6)))
        y = 1 if r.lang == "en" else 0
        bs += ((pu - y * 1_000_000) / 1e6) ** 2
        ybar += y
    n = len(scored)
    bs /= n
    ybar /= n
    assert row.n_docs == n
    assert row.brier == pytest.approx(bs, abs=2e-6)
    assert row.uncertainty == pytest.approx(ybar * (1 - ybar), abs=1e-6)
    # Murphy identity with the within-bin variance residual closing it
    assert (row.reliability - row.resolution + row.uncertainty
            + row.within_bin_residual) == pytest.approx(row.brier, abs=5e-6)
    assert 0.0 <= row.brier <= 1.0
    assert row.reliability >= 0.0 and row.resolution >= 0.0


# ------------------------------------------------- LOO target encoding

def test_target_encoding_loo_bruteforce(spark, sf_dir):
    """Per-nation LOO range and smoothed encoding must match a direct
    per-row recomputation; mean(LOO) = plain mean (the leakage-free
    estimator is unbiased)."""
    from qrapids_forecast_r_script_spark.operators.training_prep import (
        target_encoding_loo)
    from qrapids_forecast_r_script_spark.sources import load_table
    got = {r.nationkey: r
           for r in target_encoding_loo(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders") \
        .select("o_custkey", "o_totalprice").collect()
    nat = {r.c_custkey: r.c_nationkey
           for r in load_table(spark, sf_dir, "customer")
           .select("c_custkey", "c_nationkey").collect()}
    per = {}
    for o in orders:
        per.setdefault(nat[o.o_custkey], []).append(
            round(o.o_totalprice * 100))
    gmean = sum(sum(v) for v in per.values()) \
        / sum(len(v) for v in per.values()) / 100.0
    assert set(got) == set(per)
    for k, ys in per.items():
        n, s = len(ys), sum(ys)
        loo = [(s - y) / (n - 1) / 100.0 for y in ys]
        assert got[k].n_orders == n
        assert got[k].loo_min == pytest.approx(min(loo), abs=1e-4)
        assert got[k].loo_max == pytest.approx(max(loo), abs=1e-4)
        # mean of the LOO encodings equals the plain mean
        assert sum(loo) / n == pytest.approx(got[k].mean_price, abs=1e-2)
        assert got[k].smoothed_encoding == pytest.approx(
            (s / 100.0 + 20.0 * gmean) / (n + 20.0), abs=1e-4)
        assert got[k].shrinkage == pytest.approx(n / (n + 20.0), abs=1e-6)


# -------------------------------------------- negative-sampling table

def test_negative_sampling_table_invariants(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.training_prep import (
        negative_sampling_table, _NS_VOCAB, _NS_TABLE)
    from qrapids_forecast_r_script_spark.sources import load_table
    rows = negative_sampling_table(spark, sf_dir).collect()
    vocab = (load_table(spark, sf_dir, "documents")
             .select(F.explode(F.split("text", " ")).alias("t"))
             .agg(F.countDistinct("t")).collect()[0][0])
    assert len(rows) == min(_NS_VOCAB, vocab)
    assert [r.rank for r in rows] == sorted(r.rank for r in rows)
    # counts non-increasing in rank; slots proportional to cnt^0.75
    cnts = [r.cnt for r in sorted(rows, key=lambda r: r.rank)]
    assert cnts == sorted(cnts, reverse=True)
    total_slots = sum(r.slots for r in rows)
    assert abs(total_slots - _NS_TABLE) <= _NS_VOCAB  # per-row rounding
    assert abs(sum(r.prob for r in rows) - 1.0) < 1e-3
    # cumulative column is the exact running slot sum
    run = 0
    for r in sorted(rows, key=lambda r: r.rank):
        run += r.slots
        assert r.cum_slots == run
    # flattening: top token's share must UNDERSHOOT its raw frequency
    # share (the whole point of the 0.75 power)
    raw_total = sum(cnts)
    assert rows[0].prob < cnts[0] / raw_total


def test_negative_sampling_prob_formula(spark, sf_dir):
    from qrapids_forecast_r_script_spark.operators.training_prep import (
        negative_sampling_table)
    rows = sorted(negative_sampling_table(spark, sf_dir).collect(),
                  key=lambda r: r.rank)
    us = [round((r.cnt ** 0.75) * 1e6) for r in rows]
    z = sum(us)
    for r, u in zip(rows[:20], us[:20]):
        assert r.prob == pytest.approx(u / z, abs=1e-6)


# ------------------------------------------- weighted shortest paths

def test_shortest_paths_match_bounded_bellman_ford(spark, sf_dir):
    """The recursive-CTE min-over-walks must equal a hand-rolled
    4-round Bellman-Ford from the same seed on the same weighted
    edges — exactly, since costs are integers."""
    from qrapids_forecast_r_script_spark.operators.graph import (
        doc_graph_shortest_paths, _SP_HOPS)
    from qrapids_forecast_r_script_spark.operators.dedup import (
        minhash_lsh_pairs)
    got = {r.doc_id: r.wdist
           for r in doc_graph_shortest_paths(spark, sf_dir).collect()}
    edges = {}
    for r in minhash_lsh_pairs(spark, sf_dir).collect():
        wt = 101 - round(r.est_jaccard * 100)
        edges.setdefault(r.doc_a, []).append((r.doc_b, wt))
        edges.setdefault(r.doc_b, []).append((r.doc_a, wt))
    seed = min(edges)
    dist = {seed: 0}
    for _ in range(_SP_HOPS):
        nxt = dict(dist)
        for u, d in dist.items():
            for v, wt in edges.get(u, []):
                if d + wt < nxt.get(v, float("inf")):
                    nxt[v] = d + wt
        dist = nxt
    assert got == dist
    assert got[seed] == 0
    # all weights >= 1 ⇒ any non-seed distance is positive
    assert all(d >= 1 for k, d in got.items() if k != seed)
