"""Gap-fill / imputation kernels.

Semantics match the reference (`uni2ts/src/uni2ts/transform/imputation.py`):

- :func:`dummy_impute`  — NaN -> constant  (reference DummyValueImputation, :33-40)
- :func:`locf_impute`   — last-observation-carried-forward via
  ``np.maximum.accumulate`` over observed indices; leading NaNs -> fill
  value (reference LastValueImputation, :44-62)
- :func:`causal_mean_impute` — NaN -> running (causal) mean of the
  LOCF-filled prefix (reference CausalMeanImputation, :66-108)
- :func:`linear_impute` — linear interpolation between observed
  neighbours (edge NaNs -> nearest observed); extends the reference's
  pluggable ImputationMethod strategy surface (imputation.py:26-29).

All kernels take a 1-D float array (time axis) and are pure /
non-mutating (unlike the reference, which mutates in place).
"""

from __future__ import annotations

import numpy as np


def dummy_impute(x: np.ndarray, value: float = 0.0) -> np.ndarray:
    out = np.asarray(x, dtype=float).copy()
    out[np.isnan(out)] = value
    return out


def locf_impute(x: np.ndarray, value: float = 0.0) -> np.ndarray:
    out = np.asarray(x, dtype=float).copy()
    if out.size == 0:
        return out
    if np.isnan(out[0]):
        out[0] = value
    mask = np.isnan(out)
    idx = np.where(~mask, np.arange(len(out)), 0)
    idx = np.maximum.accumulate(idx)
    return out[idx]


def causal_mean_impute(x: np.ndarray, value: float = 0.0) -> np.ndarray:
    x = np.asarray(x, dtype=float)
    mask = np.isnan(x)
    filled = locf_impute(x, value)
    mask = mask.copy()
    mask[0] = False  # position 0 was handled by the LOCF leading-fill rule
    shifted = np.concatenate(([0.0], filled[:-1]))
    cumsum = np.cumsum(shifted)
    denom = np.arange(len(x), dtype=float)
    if len(denom):
        denom[0] = 1.0
    causal_mean = cumsum / denom
    out = filled.copy()
    out[mask] = causal_mean[mask]
    return out


def linear_impute(x: np.ndarray, value: float = 0.0) -> np.ndarray:
    x = np.asarray(x, dtype=float)
    out = x.copy()
    nans = np.isnan(x)
    if not nans.any():
        return out
    if nans.all():
        out[:] = value
        return out
    obs_idx = np.flatnonzero(~nans)
    out[nans] = np.interp(np.flatnonzero(nans), obs_idx, x[obs_idx])
    return out


def seasonal_impute(x: np.ndarray, period: int, value: float = 0.0) -> np.ndarray:
    """NaN -> the RAW value one ``period`` earlier when that slot was
    observed; remaining gaps -> LOCF over the raw series. Fills never
    feed fills (the seasonal candidate and the LOCF fallback both read
    only observed values), so the result is order-independent and
    exactly mirrors the SQL ``coalesce(v, lag(v, period), locf(v))``
    over a dense grid — extends the reference's pluggable
    ImputationMethod strategy surface (imputation.py:26-29) with the
    seasonal-naive fill."""
    x = np.asarray(x, dtype=float)
    out = locf_impute(x, value=value)
    n = len(x)
    p = int(period)
    if 0 < p < n:
        cand = np.full(n, np.nan)
        cand[p:] = x[:-p]
        m = np.isnan(x) & ~np.isnan(cand)
        out[m] = cand[m]
    return out


def make_seasonal_imputer(period: int):
    """IMPUTERS-compatible ``fn(x, value=0.0)`` bound to a period."""
    def fn(x: np.ndarray, value: float = 0.0) -> np.ndarray:
        return seasonal_impute(x, period, value=value)
    return fn


IMPUTERS = {
    "dummy": dummy_impute,
    "locf": locf_impute,
    "causal_mean": causal_mean_impute,
    "linear": linear_impute,
    "seasonal24": make_seasonal_imputer(24),
}


def impute(x: np.ndarray, method: str = "locf", value: float = 0.0) -> np.ndarray:
    """Strategy dispatch (reference ImputeTimeSeries, imputation.py:112-130):
    no-op when the series contains no NaN."""
    x = np.asarray(x, dtype=float)
    if not np.isnan(x).any():
        return x
    return IMPUTERS[method](x, value)
