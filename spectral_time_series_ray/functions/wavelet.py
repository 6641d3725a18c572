"""Orthonormal Haar wavelet (DWT) compression for rollup series.

The multiresolution sibling of the Gorilla codec (`functions/gorilla`,
bit-exact) and the swing-filter PLA (`functions/pla`, per-sample error
bound): a full multilevel Haar transform is ORTHONORMAL, so by
Parseval the L2 reconstruction error of dropping coefficients equals
EXACTLY the L2 norm of the dropped coefficients — top-k magnitude
thresholding therefore carries a closed-form, per-chunk-checkable
error guarantee (Chan & Fu, ICDE 1999, "Efficient time series matching
by wavelets"; Haar 1910). This fills the same slot as the reference's
unimplemented downsample stubs (uni2ts resample.py:70-93) on the
STORAGE side: a tiered rollup can keep the k largest coefficients per
chunk and reconstruct with a known L2 budget.

Layout: ``haar_dwt`` returns the standard packed pyramid
``[s_L | d_L | d_{L-1} | ... | d_1]`` (sizes 1, 1, 2, 4, ..., n/2) for
a length-``n`` power-of-two input; every level is one vectorized
strided pass, O(n) total. Non-dyadic chunks are edge-padded to the
next power of two (padding with the last sample keeps the padded tail
energy in the coarse coefficients, and an L2 bound over the padded
signal dominates the bound over the real prefix).
"""

from __future__ import annotations

import numpy as np

_INV_SQRT2 = 1.0 / np.sqrt(2.0)


def next_pow2(n: int) -> int:
    """Smallest power of two >= n (>= 1)."""
    if n <= 1:
        return 1
    return 1 << (int(n - 1).bit_length())


def pad_pow2(values: np.ndarray) -> np.ndarray:
    """Edge-pad (repeat last sample) to the next power-of-two length."""
    v = np.asarray(values, dtype=np.float64)
    n = len(v)
    m = next_pow2(n)
    if m == n:
        return v.copy()
    out = np.empty(m, dtype=np.float64)
    out[:n] = v
    out[n:] = v[-1] if n else 0.0
    return out


def haar_dwt(values: np.ndarray) -> np.ndarray:
    """Full multilevel orthonormal Haar transform (power-of-two input).

    s = (a + b)/sqrt(2), d = (a - b)/sqrt(2) per pair, recursed on the
    smooth half until one approximation coefficient remains. Energy is
    preserved exactly up to float rounding (orthonormal basis).
    """
    v = np.asarray(values, dtype=np.float64)
    n = len(v)
    if n & (n - 1):
        raise ValueError(f"haar_dwt needs a power-of-two length, got {n}")
    out = v.copy()
    m = n
    while m > 1:
        a = out[:m:2].copy()
        b = out[1:m:2].copy()
        half = m // 2
        out[:half] = (a + b) * _INV_SQRT2
        out[half:m] = (a - b) * _INV_SQRT2
        m = half
    return out


def haar_idwt(coeffs: np.ndarray) -> np.ndarray:
    """Exact inverse of :func:`haar_dwt` (same packed-pyramid layout)."""
    c = np.asarray(coeffs, dtype=np.float64)
    n = len(c)
    if n & (n - 1):
        raise ValueError(f"haar_idwt needs a power-of-two length, got {n}")
    out = c.copy()
    m = 1
    while m < n:
        s = out[:m].copy()
        d = out[m : 2 * m].copy()
        out[: 2 * m : 2] = (s + d) * _INV_SQRT2
        out[1 : 2 * m : 2] = (s - d) * _INV_SQRT2
        m *= 2
    return out


def topk_coefficients(coeffs: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Indices and values of the k largest-magnitude coefficients.

    Deterministic: ties break toward the LOWER index (stable sort on
    descending magnitude), so reruns and repartitions pick identical
    coefficient sets. ``k`` is clamped to ``len(coeffs)``.
    """
    c = np.asarray(coeffs, dtype=np.float64)
    k = max(0, min(int(k), len(c)))
    if k == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    order = np.argsort(-np.abs(c), kind="stable")[:k]
    idx = np.sort(order).astype(np.int64)
    return idx, c[idx]


def reconstruct_topk(idx: np.ndarray, vals: np.ndarray, n: int) -> np.ndarray:
    """Inverse transform of a sparse (index, value) coefficient set."""
    c = np.zeros(int(n), dtype=np.float64)
    if len(idx):
        c[np.asarray(idx, dtype=np.int64)] = np.asarray(vals, dtype=np.float64)
    return haar_idwt(c)


def wavelet_compress(
    values: np.ndarray, keep_frac: float = 0.1, min_keep: int = 1
) -> dict:
    """Top-k Haar compression of one chunk with its exact L2 budget.

    Returns a dict with the sparse coefficients (``idx``, ``coef``),
    the padded length ``n_pad``, the real length ``n``, and
    ``dropped_l2`` — sqrt of the dropped coefficient energy, which by
    Parseval EQUALS the L2 reconstruction error over the padded signal
    (and so bounds the error over the real prefix).
    """
    v = np.asarray(values, dtype=np.float64)
    n = len(v)
    pad = pad_pow2(v)
    c = haar_dwt(pad)
    k = max(int(min_keep), int(np.ceil(keep_frac * len(c))))
    idx, vals = topk_coefficients(c, k)
    dropped = c.copy()
    dropped[idx] = 0.0
    return {
        "idx": idx,
        "coef": vals,
        "n": n,
        "n_pad": len(pad),
        "dropped_l2": float(np.sqrt(np.sum(dropped * dropped))),
    }


def wavelet_reconstruct(comp: dict) -> np.ndarray:
    """Reconstruct the real-length signal from a compressed dict."""
    full = reconstruct_topk(comp["idx"], comp["coef"], comp["n_pad"])
    return full[: comp["n"]]
