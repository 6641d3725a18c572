"""Forecast-evaluation metric kernels.

The reference's packed/point losses and gluonts evaluator metrics
(`uni2ts/src/uni2ts/loss/packed/point.py`, `normalized.py`,
`percentage_error.py`; `uni2ts/src/uni2ts/eval_util/evaluation.py:95-173`):
MSE, MAE, RMSE, MAPE, sMAPE, MASE, ND, NRMSE, quantile loss, plus the
seasonal-naive error used by MASE (`evaluation.py:73-88`).

All kernels take (y_true, y_pred) 1-D arrays, skip NaNs jointly
(observed-mask semantics, `loss/packed/_base.py:76-106` masked mean),
and return a scalar.
"""

from __future__ import annotations

import numpy as np


def _mask(y: np.ndarray, p: np.ndarray):
    y = np.asarray(y, dtype=np.float64)
    p = np.asarray(p, dtype=np.float64)
    m = ~(np.isnan(y) | np.isnan(p))
    return y[m], p[m]


def mse(y, p):
    y, p = _mask(y, p)
    return float(np.mean((y - p) ** 2)) if len(y) else np.nan


def mae(y, p):
    y, p = _mask(y, p)
    return float(np.mean(np.abs(y - p))) if len(y) else np.nan


def rmse(y, p):
    v = mse(y, p)
    return float(np.sqrt(v)) if v == v else np.nan


def mape(y, p, eps: float = 0.0):
    y, p = _mask(y, p)
    if not len(y):
        return np.nan
    denom = np.abs(y)
    ok = denom > eps
    if not ok.any():
        return np.nan
    return float(np.mean(np.abs((y[ok] - p[ok]) / denom[ok])))


def smape(y, p):
    y, p = _mask(y, p)
    if not len(y):
        return np.nan
    denom = (np.abs(y) + np.abs(p)) / 2.0
    ok = denom > 0
    if not ok.any():
        return np.nan
    return float(np.mean(np.abs(y[ok] - p[ok]) / denom[ok]))


def nd(y, p):
    """Normalized deviation: sum|err| / sum|y|."""
    y, p = _mask(y, p)
    denom = np.abs(y).sum()
    return float(np.abs(y - p).sum() / denom) if denom > 0 else np.nan


def nrmse(y, p):
    y, p = _mask(y, p)
    denom = np.abs(y).mean() if len(y) else 0.0
    return float(np.sqrt(np.mean((y - p) ** 2)) / denom) if denom > 0 else np.nan


def seasonal_error(y: np.ndarray, season: int = 1) -> float:
    """Mean |y_t - y_{t-season}| over the in-sample series
    (reference evaluation.py:73-88)."""
    y = np.asarray(y, dtype=np.float64)
    y = y[~np.isnan(y)]
    if len(y) <= season:
        return np.nan
    return float(np.mean(np.abs(y[season:] - y[:-season])))


def mase(y, p, y_insample, season: int = 1):
    se = seasonal_error(y_insample, season)
    m = mae(y, p)
    return float(m / se) if se and se > 0 and m == m else np.nan


def quantile_loss(y, p, q: float):
    """Pinball loss (reference quantile.py:57 family)."""
    y, p = _mask(y, p)
    if not len(y):
        return np.nan
    diff = y - p
    return float(np.mean(np.maximum(q * diff, (q - 1) * diff)))


def weighted_quantile_loss(y, p, q: float):
    """wQL[q] = 2 * sum(pinball) / sum|y| — the gluonts evaluator's
    weighted quantile loss (reference eval metric list,
    `uni2ts/cli/eval_precond_space.py:256-267`)."""
    y, p = _mask(y, p)
    denom = np.abs(y).sum()
    if not len(y) or denom <= 0:
        return np.nan
    diff = y - p
    return float(2.0 * np.maximum(q * diff, (q - 1) * diff).sum() / denom)


def msis(y, lower, upper, y_insample, alpha: float = 0.05, season: int = 1):
    """Mean Scaled Interval Score (gluonts / M4 definition; reference
    eval metric list `eval_precond_space.py:256-267`):

    ``IS = (u - l) + (2/alpha)(l - y)[y < l] + (2/alpha)(y - u)[y > u]``
    scaled by the in-sample seasonal naive error.
    """
    y = np.asarray(y, dtype=np.float64)
    lower = np.asarray(lower, dtype=np.float64)
    upper = np.asarray(upper, dtype=np.float64)
    m = ~(np.isnan(y) | np.isnan(lower) | np.isnan(upper))
    y, lower, upper = y[m], lower[m], upper[m]
    if not len(y):
        return np.nan
    penalty = (2.0 / alpha) * (
        np.where(y < lower, lower - y, 0.0) + np.where(y > upper, y - upper, 0.0)
    )
    score = float(np.mean((upper - lower) + penalty))
    se = seasonal_error(y_insample, season)
    return float(score / se) if se and se > 0 else np.nan


METRICS = {
    "mse": mse,
    "mae": mae,
    "rmse": rmse,
    "mape": mape,
    "smape": smape,
    "nd": nd,
    "nrmse": nrmse,
}
