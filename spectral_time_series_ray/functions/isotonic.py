"""Isotonic regression (PAVA) with an independent exactness witness.

``pava`` is the classic pool-adjacent-violators stack algorithm
(Barlow et al. 1972; Best & Chakravarti 1990): O(n), each pooled block
carries exact integer/float (sum, weight) state so block means are a
single division of exact accumulators. ``gcm_fit`` recomputes the same
unique L2 projection as the left-derivative of the GREATEST CONVEX
MINORANT of the cumulative-sum diagram (the Grotzinger-Witzgall
equivalence), via an O(n) monotone-chain lower hull. Two genuinely
different algorithms whose outputs must agree bit-for-bit on integer
inputs — the engine's distributed self-check."""

from __future__ import annotations

import numpy as np


def pava(y: np.ndarray, w: np.ndarray | None = None) -> np.ndarray:
    """Weighted L2 isotonic (non-decreasing) fit, pool-adjacent-violators.

    Block means are computed as (exact sum of w*y) / (exact sum of w),
    so for integer y and w the result is one correctly-rounded double
    division per block.
    """
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if w is None:
        w = np.ones(n, dtype=np.float64)
    else:
        w = np.asarray(w, dtype=np.float64)
    if n == 0:
        return y.copy()
    # stack of blocks: (weighted sum, weight, length)
    sums = np.empty(n, np.float64)
    wts = np.empty(n, np.float64)
    lens = np.empty(n, np.int64)
    top = 0
    for i in range(n):
        s, ww, ln = y[i] * w[i], w[i], 1
        # merge while the new block's mean violates monotonicity;
        # compare via cross-multiplication (exact for integer inputs)
        while top > 0 and sums[top - 1] * ww > s * wts[top - 1]:
            top -= 1
            s += sums[top]
            ww += wts[top]
            ln += lens[top]
        sums[top], wts[top], lens[top] = s, ww, ln
        top += 1
    out = np.empty(n, np.float64)
    pos = 0
    for b in range(top):
        out[pos:pos + lens[b]] = sums[b] / wts[b]
        pos += lens[b]
    return out


def gcm_fit(y: np.ndarray, w: np.ndarray | None = None) -> np.ndarray:
    """The same isotonic fit via the greatest convex minorant of the
    cumulative sum diagram: lower convex hull of the points
    (W_k, S_k) = (sum w[:k], sum (w*y)[:k]) for k = 0..n, then each
    fitted value is the slope of its hull segment."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if w is None:
        w = np.ones(n, dtype=np.float64)
    else:
        w = np.asarray(w, dtype=np.float64)
    if n == 0:
        return y.copy()
    W = np.concatenate([[0.0], np.cumsum(w)])
    S = np.concatenate([[0.0], np.cumsum(w * y)])
    # monotone-chain lower hull over x-increasing points
    hull = [0]
    for k in range(1, n + 1):
        while len(hull) >= 2:
            i, j = hull[-2], hull[-1]
            # drop j if it lies on or above segment (i, k):
            # slope(i, j) >= slope(i, k)  <=>  cross <= 0
            if ((S[j] - S[i]) * (W[k] - W[i])
                    >= (S[k] - S[i]) * (W[j] - W[i])):
                hull.pop()
            else:
                break
        hull.append(k)
    out = np.empty(n, np.float64)
    for a, b in zip(hull[:-1], hull[1:]):
        out[a:b] = (S[b] - S[a]) / (W[b] - W[a])
    return out
