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


def lttb_indices(t: np.ndarray, v: np.ndarray, k: int) -> np.ndarray:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson, MSc
    thesis, U. Iceland 2013): pick ``k`` of ``n`` points preserving the
    visual shape of the series.  First and last points are always kept;
    the interior splits into ``k-2`` equal buckets and each bucket
    keeps the point maximizing the triangle area spanned with the
    previously selected point and the NEXT bucket's centroid.

    Deterministic (first max wins), O(n) total work; the per-bucket
    area computation is vectorized, the loop runs over the k buckets.
    Returns sorted selected indices (length ``min(k, n)``).
    """
    t = np.asarray(t, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    n = len(t)
    if k >= n or n <= 2:
        return np.arange(n)
    if k < 3:
        raise ValueError("k must be >= 3 (endpoints + one bucket)")
    # bucket boundaries over the n-2 interior points
    edges = (np.arange(k - 1, dtype=np.float64) * (n - 2) / (k - 2) + 1).astype(
        np.int64
    )
    edges[-1] = n - 1
    out = np.empty(k, dtype=np.int64)
    out[0] = 0
    out[-1] = n - 1
    prev = 0
    for b in range(k - 2):
        lo, hi = edges[b], edges[b + 1]
        nlo, nhi = edges[b + 1], (edges[b + 2] if b + 2 < k - 1 else n)
        cx = t[nlo:nhi].mean() if nhi > nlo else t[n - 1]
        cy = v[nlo:nhi].mean() if nhi > nlo else v[n - 1]
        # 2x triangle area with fixed prev point and next-bucket centroid
        area = np.abs(
            (t[prev] - cx) * (v[lo:hi] - v[prev]) - (t[prev] - t[lo:hi]) * (cy - v[prev])
        )
        prev = lo + int(np.argmax(area))
        out[b + 1] = prev
    return out
