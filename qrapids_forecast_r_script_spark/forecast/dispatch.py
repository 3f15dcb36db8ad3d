"""Method dispatch: one plain-Python entry per reference method.

The reference's method registry is ``stringMethods`` (R:6-7), surfaced by
``getAvailableMethods`` (R:12-14).  ``fit_method`` / ``forecast_fitted``
run inside executor Python workers (grouped pandas UDF) or on the driver
(single-series path) — pure numpy either way, no Spark imports here.
"""

from __future__ import annotations

import numpy as np

METHODS = [
    "ARIMA", "ARIMA_FORCE_SEASONALITY", "THETA", "ETS", "ETSDAMPED",
    "BAGGEDETS", "STL", "NN", "HYBRID", "PROPHET",
]
EXTRA_METHODS = ["MEAN", "NAIVE", "SNAIVE", "DRIFT"]


def fit_method(method: str, y: np.ndarray, frequency: int,
               ds_days: np.ndarray | None = None, horizon: int = 14,
               seed_key=("series",)):
    """Fit one model.  ``ds_days`` only matters for PROPHET (the one
    date-aware path, R:35-38); every other method is positional (R:32).
    ``horizon`` only matters for HYBRID (cvHorizon quirk 3, R:359)."""
    m = method.upper()
    if m == "ARIMA":
        from .models.arima import fit_arima
        return fit_arima(y, frequency, force_seasonality=False)
    if m == "ARIMA_FORCE_SEASONALITY":
        from .models.arima import fit_arima
        return fit_arima(y, frequency, force_seasonality=True)
    if m == "THETA":
        from .models.theta import fit_theta
        return fit_theta(y, frequency)
    if m == "ETS":
        from .models.ets import fit_ets
        return fit_ets(y, frequency, damped=False)
    if m == "ETSDAMPED":
        from .models.ets import fit_ets
        return fit_ets(y, frequency, damped=True)
    if m == "BAGGEDETS":
        from .models.bagged import fit_bagged_ets
        return fit_bagged_ets(y, frequency, seed_key=seed_key)
    if m == "STL":
        from .models.stl import fit_stl
        return fit_stl(y, frequency)
    if m == "NN":
        from .models.nn import fit_nn
        return fit_nn(y, frequency, seed_key=seed_key)
    if m == "HYBRID":
        from .models.hybrid import fit_hybrid
        return fit_hybrid(y, frequency, cv_horizon=horizon)
    if m == "PROPHET":
        from .models.prophet_like import fit_prophet_like
        if ds_days is None:
            # positional fallback: synthesize daily dates (freq='day',
            # quirk 4 — the Prophet path always steps by days, R:379)
            ds_days = np.arange(len(y))
        return fit_prophet_like(ds_days, y)
    if m in ("MEAN", "NAIVE", "SNAIVE", "DRIFT"):
        from .models.naive import fit_naive
        return fit_naive(y, frequency, m.lower())
    raise ValueError(f"unknown method {method!r}; known: {METHODS + EXTRA_METHODS}")


def forecast_fitted(model, horizon: int, seed_key=("series",)) -> dict:
    """Produce the 5-band dict from a fitted model (SURVEY §1.4).

    Capability check by signature, not try/except TypeError — a genuine
    TypeError raised INSIDE a seed-aware forecast (a real bug) must not
    be masked and silently retried with the default seed."""
    if accepts_seed_key(model):
        return model.forecast(horizon, seed_key=seed_key)
    return model.forecast(horizon)


def accepts_seed_key(model) -> bool:
    """Whether the model's ``forecast`` takes a ``seed_key`` kwarg."""
    import inspect
    try:
        sig = inspect.signature(model.forecast)
    except (TypeError, ValueError):
        return False
    return "seed_key" in sig.parameters
