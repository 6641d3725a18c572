"""Bounded-error piecewise-linear approximation (PLA) compression.

The swing-filter family (Elmeleegy et al., "Online Piece-wise Linear
Approximation of Numerical Streams with Precision Guarantees", VLDB
2009): a greedy single-pass filter keeps one open segment anchored at
a raw sample and maintains the feasible slope interval [lo, hi] that
keeps EVERY covered sample within ``eps`` of the fitted line; a sample
that empties the interval closes the segment. The guarantee is exact
by construction: the emitted slope lies inside every per-sample
feasibility interval, so ``|fit(t_i) - v_i| <= eps`` for all i.

This is the lossy sibling of the Gorilla codec (`functions/gorilla`):
Gorilla is bit-exact on quantized values; PLA trades a user-chosen
absolute error bound for segment-level (not sample-level) storage —
irregular timestamps are fine because segments store raw anchor
timestamps.

The segment scan is vectorized: for a candidate segment the per-sample
slope bounds are computed in one shot and the break index is the first
position where ``cummax(lower) > cummin(upper)`` — O(window) numpy per
segment with a bounded look-ahead window, so degenerate inputs (every
sample its own segment) stay O(n * 1), not O(n^2).
"""

from __future__ import annotations

import numpy as np

_WINDOW = 512  # look-ahead cap per segment scan


def pla_compress(
    ts: np.ndarray, values: np.ndarray, eps: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Compress (ts, values) to PLA segments with max abs error <= eps.

    Returns (seg_t0, seg_v0, seg_slope) arrays, one entry per segment;
    segment k covers samples with ``seg_t0[k] <= t < seg_t0[k+1]`` (the
    last segment is open-ended). The anchor value is the RAW first
    sample of the segment, so the first sample of every segment is
    exact. ``eps=0`` degenerates to exact linear runs.
    """
    t = np.asarray(ts, dtype=np.float64)
    v = np.asarray(values, dtype=np.float64)
    n = len(t)
    if n == 0:
        z = np.array([], dtype=np.float64)
        return z, z, z
    if np.any(np.diff(t) <= 0):
        raise ValueError("timestamps must be strictly increasing")

    seg_t0, seg_v0, seg_sl = [], [], []
    i = 0
    while i < n:
        t0, v0 = t[i], v[i]
        if i == n - 1:
            seg_t0.append(t0)
            seg_v0.append(v0)
            seg_sl.append(0.0)
            break
        hi_idx = min(n, i + 1 + _WINDOW)
        dt = t[i + 1 : hi_idx] - t0
        dv = v[i + 1 : hi_idx] - v0
        lows = np.maximum.accumulate((dv - eps) / dt)
        highs = np.minimum.accumulate((dv + eps) / dt)
        bad = np.flatnonzero(lows > highs)
        # j = count of samples (after the anchor) the segment covers
        j = int(bad[0]) if len(bad) else len(dt)
        if j == 0:
            # immediate violation cannot happen (a single extra sample is
            # always feasible: its interval is non-empty) unless eps < 0
            raise ValueError("eps must be >= 0")
        slope = 0.5 * (lows[j - 1] + highs[j - 1])
        seg_t0.append(t0)
        seg_v0.append(v0)
        seg_sl.append(float(slope))
        # the segment covers samples [i, i+j]; anchor the next one at
        # the first UNCOVERED sample (disconnected-segment variant —
        # each segment stores its own raw anchor)
        i += j + 1
    return (
        np.asarray(seg_t0, dtype=np.float64),
        np.asarray(seg_v0, dtype=np.float64),
        np.asarray(seg_sl, dtype=np.float64),
    )


def pla_decompress(
    seg_t0: np.ndarray, seg_v0: np.ndarray, seg_slope: np.ndarray, ts: np.ndarray
) -> np.ndarray:
    """Evaluate the PLA model at the given timestamps (vectorized)."""
    t = np.asarray(ts, dtype=np.float64)
    s0 = np.asarray(seg_t0, dtype=np.float64)
    idx = np.searchsorted(s0, t, side="right") - 1
    idx = np.clip(idx, 0, len(s0) - 1)
    return np.asarray(seg_v0)[idx] + np.asarray(seg_slope)[idx] * (t - s0[idx])


def pla_max_error(ts, values, seg_t0, seg_v0, seg_slope) -> float:
    rec = pla_decompress(seg_t0, seg_v0, seg_slope, ts)
    return float(np.max(np.abs(rec - np.asarray(values, dtype=np.float64))))
