"""TBATS-lite — Box-Cox + trigonometric seasonality + damped-trend ETS.

The ``t`` component of the reference's HYBRID: ``hybridModel``'s default
model set is ``aefnst`` (``TimeSeriesFunctions_GPL_0.5.1.R:324-332``),
and round 1 shipped only ``aefns``.  Full TBATS (De Livera, Hyndman &
Snyder 2011) adds ARMA errors and multiple seasonal periods; this lite
form keeps the signature pieces that drive TBATS's contribution at the
series lengths this engine sees:

- Box-Cox transform (Guerrero-grid lambda, shared with BAGGEDETS),
- trigonometric seasonality — Fourier pairs fitted by least squares on
  the transformed series (TBATS's trig seasonal states, statically
  estimated instead of evolving),
- damped-trend exponential smoothing on the seasonally adjusted
  transform (TBATS's level/trend block),
- forecast = ETS bands + trig extension, inverse-transformed (the
  inverse Box-Cox is monotone, so band ordering survives).

Deviations from full TBATS are deliberate and documented: no ARMA error
step, single seasonal period, static harmonic coefficients.
"""

from __future__ import annotations

import numpy as np

from .bagged import _boxcox, _boxcox_lambda, _inv_boxcox
from .ets import fit_ets

_MAX_HARMONICS = 3


class TbatsLiteModel:
    def __init__(self, y, m, lam, use_bc, k, coef, ets_model, n):
        self.y = np.asarray(y, float)
        self.m = m
        self.lam = lam
        self.use_bc = use_bc
        self.k = k                    # number of Fourier harmonics
        self.coef = coef              # 2k trig coefficients
        self.ets_model = ets_model    # damped ETS on the adjusted series
        self.n = n

    @property
    def method(self) -> str:
        return "TBATSLite"

    def _trig(self, t_idx: np.ndarray) -> np.ndarray:
        if not self.k:
            return np.zeros(len(t_idx))
        cols = []
        for i in range(1, self.k + 1):
            arg = 2 * np.pi * i * t_idx / self.m
            cols.append(np.sin(arg))
            cols.append(np.cos(arg))
        return np.column_stack(cols) @ self.coef

    def point_forecast(self, horizon: int) -> np.ndarray:
        t_fut = np.arange(self.n, self.n + horizon)
        z = self.ets_model.point_forecast(horizon) + self._trig(t_fut)
        return _inv_boxcox(z, self.lam) if self.use_bc else z

    def forecast(self, horizon: int, seed_key=("tbats",)) -> dict:
        t_fut = np.arange(self.n, self.n + horizon)
        season = self._trig(t_fut)
        base = self.ets_model.forecast(horizon, seed_key=seed_key)
        out = {}
        for band in ("mean", "lower1", "lower2", "upper1", "upper2"):
            z = np.asarray(base[band]) + season
            out[band] = _inv_boxcox(z, self.lam) if self.use_bc else z
        return out


def fit_tbats_lite(y: np.ndarray, frequency: int) -> TbatsLiteModel:
    y = np.asarray(y, float)
    n = len(y)
    m = max(1, int(frequency))
    if n < 4:
        raise ValueError("series too short for TBATS-lite")
    use_bc = bool(np.all(y > 0))
    lam = _boxcox_lambda(y) if use_bc else 1.0
    z = _boxcox(y, lam) if use_bc else y.astype(float)
    # trig seasonality needs two full cycles to be identified
    k = min(_MAX_HARMONICS, (m - 1) // 2) if (m > 1 and n >= 2 * m) else 0
    if k:
        t = np.arange(n)
        cols = [np.ones(n), t]
        for i in range(1, k + 1):
            arg = 2 * np.pi * i * t / m
            cols.append(np.sin(arg))
            cols.append(np.cos(arg))
        A = np.column_stack(cols)
        beta, *_ = np.linalg.lstsq(A, z, rcond=None)
        coef = beta[2:]
        season = A[:, 2:] @ coef
    else:
        coef = np.zeros(0)
        season = np.zeros(n)
    adjusted = z - season
    ets_model = fit_ets(adjusted, 1, damped=True)  # trend block only
    return TbatsLiteModel(y, m, lam, use_bc, k, coef, ets_model, n)
