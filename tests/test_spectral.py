"""Invariant tests for `operators/spectral.py` — the power-iteration
PCA estimate is verified against an EXACT numpy replication of the
grid-rounded recursion (stronger than tolerance checks), and its
convergence vs the true PC1 is pinned; the periodogram argmax is
brute-forced in numpy."""

import math

import numpy as np

from qrapids_forecast_r_script_spark.operators.spectral import (
    _DP,
    _P_MAX,
    _P_MIN,
    _PCA_ITERS,
    embedding_pca_projection,
    series_dominant_period,
)
from qrapids_forecast_r_script_spark.sources import load_table
from qrapids_forecast_r_script_spark.sources.registry import events_as_metrics


def _numpy_pca_proj(X: np.ndarray, iters: int) -> np.ndarray:
    """Replicate the engine's rounded power recursion bit-for-bit."""
    mu = np.round(X.mean(0), _DP)
    C = X - mu
    p = np.round(C[:, 0], _DP)
    for _ in range(iters):
        wr = np.round((C * p[:, None]).mean(0), _DP)
        w = np.round(wr / np.sqrt((wr * wr).sum()), _DP)
        p = np.round(C @ w, _DP)
    return p


def test_pca_matches_numpy_replication_and_pins_convergence(
        spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").collect()
    emb.sort(key=lambda r: r.vec_id)
    X = np.array([list(r.embedding) for r in emb], dtype=float)
    labels = np.array([r.label for r in emb])
    p = _numpy_pca_proj(X, _PCA_ITERS)

    rows = {r.label: r for r in embedding_pca_projection(spark, sf_dir)
            .collect()}
    assert sum(r.n_vecs for r in rows.values()) == len(emb)
    for lbl, r in rows.items():
        sel = p[labels == lbl]
        # engine mean is integer-micro-unit round-half-away of the mean
        s6 = int(np.round(sel * 1e6).sum())
        n = len(sel)
        mean6 = (2 * s6 + (n if s6 >= 0 else -n)) // (2 * n) \
            if s6 >= 0 else -((2 * (-s6) + n) // (2 * n))
        assert abs(r.mean_proj - mean6 / 1e6) < 1e-12, (lbl, r.mean_proj)
        assert abs(r.rms_proj - round(math.sqrt((sel * sel).mean()),
                                      _DP)) < 1e-9

    # convergence pin: near-isotropic fixture, 6 rounds ≈ 0.7 |corr|
    # with the true PC1 — the documented, eigengap-limited contract
    Xc = X - X.mean(0)
    _, _, Vt = np.linalg.svd(Xc, full_matrices=False)
    corr = abs(np.corrcoef(p, Xc @ Vt[0])[0, 1])
    assert corr > 0.55, corr


def test_dominant_period_matches_numpy_periodogram(spark, sf_dir):
    series = events_as_metrics(
        load_table(spark, sf_dir, "events")).collect()
    by_name: dict[str, list] = {}
    for r in series:
        by_name.setdefault(r.name, []).append((r.evaluationDate, r.value))
    out = {r.name: r for r in series_dominant_period(spark, sf_dir)
           .collect()}
    assert set(out) == set(by_name)
    for name, pts in by_name.items():
        pts.sort()
        d0 = pts[0][0]
        best = None
        for p in range(_P_MIN, _P_MAX + 1):
            sc = sum(round(v * math.cos(2 * math.pi
                                        * ((d - d0).days) / p), _DP)
                     for d, v in pts)
            ss = sum(round(v * math.sin(2 * math.pi
                                        * ((d - d0).days) / p), _DP)
                     for d, v in pts)
            power = round(sc * sc + ss * ss, 2)
            if best is None or power > best[0]:
                best = (power, p)
        assert out[name].dominant_period == best[1], (name, best)
        assert out[name].n_days == len(pts)
