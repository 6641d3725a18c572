"""Resampling kernels: subsample / Gaussian-filter subsample /
linear upsample.

The reference DECLARES these operators but leaves them unimplemented
(`uni2ts/src/uni2ts/transform/resample.py:70-93` — empty stubs); these
are real implementations of the declared semantics, complementing the
engine's other downsampling paths (mean rollup cascade, Welch/Lomb
spectral summaries).

All kernels expect gap-filled (NaN-free) regular-grid input — run
after the imputation stage, same contract as preconditioning.
"""

from __future__ import annotations

import numpy as np


def subsample(values: np.ndarray, factor: int) -> np.ndarray:
    """Plain decimation: every ``factor``-th sample (reference
    ``Subsample`` stub). No anti-alias filter — high frequencies fold."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    return np.asarray(values, dtype=np.float64)[::factor]


def gaussian_kernel(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """Normalized 1-D Gaussian taps truncated at ``truncate`` sigmas."""
    radius = max(1, int(truncate * sigma + 0.5))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def gaussian_filter(values: np.ndarray, sigma: float) -> np.ndarray:
    """Gaussian low-pass with reflect padding (same length out)."""
    v = np.asarray(values, dtype=np.float64)
    if len(v) < 2 or sigma <= 0:
        return v.copy()
    k = gaussian_kernel(sigma)
    r = (len(k) - 1) // 2
    pad = min(r, len(v) - 1)
    padded = np.concatenate([v[pad:0:-1], v, v[-2 : -2 - pad : -1]])
    if pad < r:  # very short series: extend with edge values
        padded = np.concatenate(
            [np.full(r - pad, padded[0]), padded, np.full(r - pad, padded[-1])]
        )
    return np.convolve(padded, k, mode="valid")


def gaussian_subsample(
    values: np.ndarray, factor: int, sigma: float | None = None
) -> np.ndarray:
    """Anti-aliased decimation (reference ``GaussianFilterSubsample``
    stub): Gaussian low-pass at ``sigma`` (default ``factor / 2``, the
    scipy-decimate-style cutoff) then take every ``factor``-th sample —
    frequencies above the new Nyquist are attenuated instead of
    folding."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    if factor == 1:
        return np.asarray(values, dtype=np.float64).copy()
    sigma = factor / 2.0 if sigma is None else sigma
    return gaussian_filter(values, sigma)[::factor]


def upsample_linear(values: np.ndarray, factor: int) -> np.ndarray:
    """Linear-interpolation upsample (reference ``Upsample`` stub):
    inserts ``factor - 1`` interpolated points between neighbors —
    output length ``(n - 1) * factor + 1``. Exact inverse of
    :func:`subsample` on its own output grid."""
    v = np.asarray(values, dtype=np.float64)
    if factor < 1:
        raise ValueError("factor must be >= 1")
    if factor == 1 or len(v) < 2:
        return v.copy()
    x_out = np.arange((len(v) - 1) * factor + 1, dtype=np.float64) / factor
    return np.interp(x_out, np.arange(len(v), dtype=np.float64), v)
