"""Externally-derived forecast goldens (r3 verdict item 3).

Every expected value in this file is derived OUTSIDE the implementation:
either hand-applied from a published recursion (each step written out in
the comments, so a reviewer can re-derive it with pencil and paper) or a
closed-form theorem from the time-series literature.  None of these
numbers were produced by running the code under test.

Sources (all public):
- Hyndman & Athanasopoulos, *Forecasting: Principles and Practice*
  (3rd ed., OTexts) — SES component form (§8.1), Holt's linear method
  (§8.2).
- Hyndman, Koehler, Ord & Snyder, *Forecasting with Exponential
  Smoothing: The State Space Approach* (Springer 2008) — innovations
  state-space recursions (Table 2.1) and the class-1 analytic forecast
  variance  v_h = sigma^2 [1 + alpha^2 (h-1)]  for ETS(A,N,N)
  (Table 6.1 / eq. 6.1).
- Assimakopoulos & Nikolopoulos (2000), *The theta model*; Hyndman &
  Billah (2003), *Unmasking the Theta method* — Theta(0,2) == SES with
  drift equal to HALF the OLS slope.
- Box, Jenkins & Reinsel, *Time Series Analysis* (§5.2) — MA(inf)
  psi-weight closed forms: AR(1) psi_j = phi^j; MA(1) psi_1 = theta,
  psi_j>1 = 0; ARMA(1,1) psi_j = (phi + theta) phi^(j-1); random walk
  psi_j = 1 (forecast variance h * sigma^2).
"""

import numpy as np
import pytest

from qrapids_forecast_r_script_spark.forecast.models.arima import (
    _psi_weights)
from qrapids_forecast_r_script_spark.forecast.models.ets import (
    _forecast_from_state, _run_filter, fit_ets)
from qrapids_forecast_r_script_spark.forecast.models.theta import (
    ThetaModel, fit_theta)
from qrapids_forecast_r_script_spark.forecast.models.common import Z80, Z95


def test_ses_recursion_hand_derived_fpp():
    """FPP3 §8.1 component form: l_t = alpha*y_t + (1-alpha)*l_{t-1},
    one-step fitted value = l_{t-1}.  Hand derivation with alpha = 0.5,
    l_0 = 10, y = [12, 8, 14, 6]:

        t=1: fitted = 10.0,   e =  2.0,   l = 10 + 0.5*2.0   = 11.0
        t=2: fitted = 11.0,   e = -3.0,   l = 11 - 0.5*3.0   =  9.5
        t=3: fitted =  9.5,   e =  4.5,   l = 9.5 + 0.5*4.5  = 11.75
        t=4: fitted = 11.75,  e = -5.75,  l = 11.75 - 2.875  =  8.875

    All forecasts of a no-trend, no-season model are flat at the final
    level (FPP3 eq. 8.3): yhat_{T+h} = l_T = 8.875."""
    y = np.array([12.0, 8.0, 14.0, 6.0])
    fitted, resid, state = _run_filter(
        y, m=1, trend="N", seasonal="N", level0=10.0, trend0=0.0,
        s0=np.zeros(1), alpha=0.5, beta=0.0, gamma=0.0, phi=1.0)
    np.testing.assert_allclose(fitted, [10.0, 11.0, 9.5, 11.75],
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(resid, [2.0, -3.0, 4.5, -5.75],
                               rtol=0, atol=1e-12)
    mean = _forecast_from_state(state, 1, "N", "N", 1.0, 3)
    np.testing.assert_allclose(mean, [8.875, 8.875, 8.875],
                               rtol=0, atol=1e-12)


def test_holt_recursion_hand_derived_innovations_form():
    """Innovations form of Holt's linear method, ETS(A,N→A,N)
    (Hyndman et al. 2008, Table 2.1):

        forecast  f_t = l_{t-1} + b_{t-1}
        l_t = f_t + alpha * e_t
        b_t = b_{t-1} + beta * e_t        (beta = alpha * beta_star)

    Hand derivation with alpha = 0.5, beta = 0.2, l_0 = 9, b_0 = 1,
    y = [10, 14, 19]:

        t=1: f = 9+1 = 10.0,  e = 0.0  -> l = 10.0,   b = 1.0
        t=2: f = 10+1 = 11.0, e = 3.0  -> l = 12.5,   b = 1.6
        t=3: f = 12.5+1.6 = 14.1, e = 4.9 -> l = 16.55, b = 2.58

    h-step forecasts (FPP3 eq. 8.6): yhat_{T+h} = l_T + h * b_T
        h=1: 19.13   h=2: 21.71   h=3: 24.29."""
    y = np.array([10.0, 14.0, 19.0])
    fitted, resid, state = _run_filter(
        y, m=1, trend="A", seasonal="N", level0=9.0, trend0=1.0,
        s0=np.zeros(1), alpha=0.5, beta=0.2, gamma=0.0, phi=1.0)
    np.testing.assert_allclose(fitted, [10.0, 11.0, 14.1],
                               rtol=0, atol=1e-12)
    lev, b, _ = state
    assert abs(lev - 16.55) < 1e-12
    assert abs(b - 2.58) < 1e-12
    mean = _forecast_from_state(state, 1, "A", "N", 1.0, 3)
    np.testing.assert_allclose(mean, [19.13, 21.71, 24.29],
                               rtol=0, atol=1e-10)


def test_holt_fit_continues_exact_linear_series():
    """On noiseless linear data the optimal Holt fit has zero one-step
    error, so forecasts must continue the line exactly: with
    y_t = 3 + 2t the h-step forecast is 3 + 2(n - 1 + h) (FPP3 §8.2 —
    the method is exact for linear trends).  This pins the END-TO-END
    auto-selected fit, not just the recursion."""
    t = np.arange(30, dtype=float)
    y = 3.0 + 2.0 * t
    model = fit_ets(y, frequency=1, damped=False)
    out = model.forecast(6, seed_key=("g", "holt"))
    expect = 3.0 + 2.0 * (29 + np.arange(1, 7))
    np.testing.assert_allclose(out["mean"], expect, rtol=1e-3)


def test_theta_drift_is_half_ols_slope():
    """Hyndman & Billah (2003): the Theta(0,2) combination equals SES
    plus a drift of HALF the OLS slope of the series.  On exactly
    linear data y = 10 + 4t the OLS slope is 4 (no estimation error),
    so the fitted drift must be 2.0 and successive forecast means must
    step by exactly that drift (the published formula's increments
    are constant at b/2)."""
    t = np.arange(40, dtype=float)
    model = fit_theta(10.0 + 4.0 * t, frequency=1)
    assert abs(model.drift - 2.0) < 1e-9
    mean = model.forecast(5)["mean"]
    np.testing.assert_allclose(np.diff(mean), 2.0, rtol=0, atol=1e-9)


def test_ses_class1_variance_closed_form():
    """Hyndman et al. 2008 (Table 6.1): the h-step forecast variance of
    ETS(A,N,N) is  v_h = sigma^2 * (1 + alpha^2 (h-1)).  The Theta
    forecaster uses exactly that published formula for its SES core, so
    a directly-constructed model with known (alpha, sigma) must emit
    band half-widths  z * sigma * sqrt(1 + alpha^2 (h-1))  — computed
    here from the formula, not from the code."""
    alpha, sigma = 0.4, 2.0
    model = ThetaModel(y=np.zeros(10), m=1, seasonal=False,
                       s_idx=np.ones(1), alpha=alpha, level=10.0,
                       sigma=sigma, drift=0.0)
    out = model.forecast(6)
    h = np.arange(1, 7, dtype=float)
    width = sigma * np.sqrt(1.0 + alpha ** 2 * (h - 1))
    np.testing.assert_allclose(out["upper1"] - out["mean"], Z80 * width,
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(out["upper2"] - out["mean"], Z95 * width,
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(out["mean"] - out["lower2"], Z95 * width,
                               rtol=0, atol=1e-12)


@pytest.mark.parametrize("phi,theta", [(0.8, 0.0), (0.0, 0.6), (0.7, 0.5)])
def test_psi_weights_box_jenkins_closed_forms(phi, theta):
    """Box, Jenkins & Reinsel §5.2: psi(B) = theta(B)/phi(B) gives
    AR(1): psi_j = phi^j;  MA(1): psi_1 = theta, 0 after;
    ARMA(1,1): psi_j = (phi + theta) phi^(j-1)."""
    psi = _psi_weights(np.array([1.0, -phi]), np.array([1.0, theta]), 8)
    j = np.arange(8)
    if theta == 0.0:
        expect = phi ** j
    elif phi == 0.0:
        expect = np.array([1.0, theta] + [0.0] * 6)
    else:
        expect = np.concatenate(
            [[1.0], (phi + theta) * phi ** (j[1:] - 1)])
    np.testing.assert_allclose(psi, expect, rtol=0, atol=1e-12)


def test_random_walk_psi_weights_all_one():
    """Box-Jenkins: for ARIMA(0,1,0) the integrated AR polynomial is
    (1 - B) and every psi weight is 1, so the forecast variance is the
    famous  h * sigma^2  of the random walk."""
    psi = _psi_weights(np.array([1.0, -1.0]), np.array([1.0]), 10)
    np.testing.assert_allclose(psi, np.ones(10), rtol=0, atol=1e-12)
