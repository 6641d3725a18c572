"""Polynomial (Universal Sequence) preconditioning — forward + reverse.

Semantics match the reference implementation
(`uni2ts/src/uni2ts/transform/precondition.py`):

- Coefficients are the monic Chebyshev / Legendre polynomial of degree
  n expressed in the power basis, with the leading (x^n) coefficient
  dropped and the remainder reversed: ``monic_coeffs[:-1][::-1]``
  (reference precondition.py:140, 174).  Expected fixtures:
  chebyshev d2 = [0, -0.5], d3 = [0, -0.75, 0],
  d5 = [0, -1.25, 0, 0.3125, 0]; legendre d2 = [0, -1/3],
  d3 = [0, -0.6, 0].
- Forward: ``y~[t] = y[t] + sum_{i=1..n} c[i] * y[t-i]`` for t >= n,
  identity for t < n (reference precondition.py:253-303).
- Reverse: ``y[t] = y~[t] - sum_{i=1..n} c[i] * y[t-i]`` computed
  sequentially left-to-right over already-recovered values; optional
  ground-truth ``context`` supplies history for the first n steps
  (reference precondition.py:436-524, the 2025-11-18 context-fix
  semantics described in the reference's REVERSAL_CONTEXT_BUG_FIX.md).

Invariants (reference test_precondition.py): reverse(forward(x)) == x
to ~1e-10; first n values identity; dtype preserved; variates
independent; L1(coeffs) <= 2**(0.3 n).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

POLYNOMIALS = ("chebyshev", "legendre")


@lru_cache(maxsize=64)
def precondition_coefficients(polynomial: str, degree: int) -> np.ndarray:
    """Monic power-basis coefficients ``[c1..cn]`` (c_i multiplies lag i).

    Computed from numpy's orthogonal-polynomial bases (public API), then
    made monic and reordered exactly as the reference does.
    """
    if degree < 1:
        raise ValueError(f"degree must be >= 1, got {degree}")
    basis = np.zeros(degree + 1)
    basis[degree] = 1.0
    if polynomial == "chebyshev":
        from numpy.polynomial.chebyshev import cheb2poly

        coeffs = cheb2poly(basis)  # ascending power order [x^0 .. x^n]
    elif polynomial == "legendre":
        from numpy.polynomial.legendre import leg2poly

        coeffs = leg2poly(basis)
    else:
        raise ValueError(f"unknown polynomial type: {polynomial!r}")
    monic = coeffs / coeffs[-1]
    out = monic[:-1][::-1].copy()
    out.setflags(write=False)
    return out


def forward_precondition(x: np.ndarray, coeffs: np.ndarray) -> np.ndarray:
    """Causal polynomial convolution, vectorized; identity for t < n.

    ``x`` may be 1-D ``[time]`` or 2-D ``[var, time]`` (each variate
    independent — last axis is time). Dtype is preserved.
    """
    coeffs = np.asarray(coeffs)
    n = len(coeffs)
    x = np.asarray(x)
    result = x.copy()
    t_len = x.shape[-1]
    if t_len > n:
        weighted = np.zeros(x.shape[:-1] + (t_len - n,), dtype=x.dtype)
        for i in range(n):
            # c[i+1] multiplies y[t-(i+1)]: slice [n-i-1, t_len-i-1)
            weighted += (coeffs[i] * x[..., n - i - 1 : t_len - i - 1]).astype(
                x.dtype, copy=False
            )
        result[..., n:] = x[..., n:] + weighted
    return result


def reverse_with_base_context(
    precond_seq: np.ndarray,
    full_base_context: np.ndarray,
    input_len: int,
    coeffs: np.ndarray,
) -> np.ndarray:
    """Hybrid reversal: map precond-space predictions back to original
    space using a FIXED base context for every lag (reference
    `uni2ts/cli/eval_precond_hybrid.py:63-170`):

    ``y[t] = ỹ[t] - Σ_{i=1..n} c_i * base_ctx[input_len + t - i]``

    ``full_base_context`` is the original-space input window
    concatenated with base predictions (or the ground truth — the GT
    flavor). Positions with insufficient history keep the
    preconditioned value, as in the reference.

    Consistency invariant (reference CLAUDE.md "Ground Truth Context
    AFTER FIX"): with GT context, pointwise errors in original space
    equal pointwise errors in precond space exactly —
    ``rev(ŷ)[t] - y_true[t] == ŷ[t] - precond(y_true)[t]``.
    """
    coeffs = np.asarray(coeffs, dtype=np.float64)
    y = np.asarray(precond_seq, dtype=np.float64)
    ctx = np.asarray(full_base_context, dtype=np.float64)
    n = len(coeffs)
    pred_len = len(y)
    result = y.copy()
    # vectorized over t: coeffs[i] multiplies ctx[input_len + t - i - 1]
    for i in range(n):
        lo = input_len - i - 1
        seg = ctx[max(lo, 0) : lo + pred_len]
        dst = result[pred_len - len(seg) :]
        dst -= coeffs[i] * seg
    # not-enough-history guard: t with input_len + t < n stays precond
    short = max(0, n - input_len)
    result[:short] = y[:short]
    return result


def forward_precondition_patched(x: np.ndarray, coeffs: np.ndarray) -> np.ndarray:
    """Patched-layout forward: ``x`` is ``(..., time, patch)`` and the
    causal convolution runs along the TIME axis (axis -2) with each
    patch element as an independent channel; identity for t < n.
    Matches the reference's `PatchPolynomialPrecondition`
    (`uni2ts/src/uni2ts/transform/patch_precondition.py:82-142`):
    ``y'[t] = y[t] + sum_{i=1..n} c_i * y[t-i]`` where y[t] is the
    patch vector at time t. Dtype preserved."""
    coeffs = np.asarray(coeffs)
    n = len(coeffs)
    x = np.asarray(x)
    if x.ndim < 2:
        raise ValueError("patched layout requires at least (time, patch) dims")
    result = x.copy()
    t_len = x.shape[-2]
    if t_len > n:
        weighted = np.zeros(
            x.shape[:-2] + (t_len - n,) + x.shape[-1:], dtype=x.dtype
        )
        for i in range(n):
            weighted += (coeffs[i] * x[..., n - i - 1 : t_len - i - 1, :]).astype(
                x.dtype, copy=False
            )
        result[..., n:, :] = x[..., n:, :] + weighted
    return result


def reverse_precondition_patched(
    y: np.ndarray, coeffs: np.ndarray, context: np.ndarray | None = None
) -> np.ndarray:
    """Sequential reversal of :func:`forward_precondition_patched` —
    recursive along time (uses already-restored lags), vectorized
    across every batch and patch dimension per step. Matches the
    reference's `PatchReversePrecondition`
    (`uni2ts/src/uni2ts/transform/patch_precondition.py:205-305`):
    without ``context`` the first n steps are identity; with
    ``context`` (``(..., ctx_time, patch)`` original-scale history)
    every step uses history. Dtype preserved."""
    coeffs = np.asarray(coeffs, dtype=np.float64)
    n = len(coeffs)
    y = np.asarray(y)
    if y.ndim < 2:
        raise ValueError("patched layout requires at least (time, patch) dims")
    t_len = y.shape[-2]
    if context is not None:
        ctx = np.asarray(context)
        buf = np.concatenate([ctx, y], axis=-2).astype(np.float64)
        start = ctx.shape[-2]
        for t in range(t_len):
            tf = start + t
            acc = 0.0
            for i in range(n):
                if tf - i - 1 >= 0:
                    acc = acc + coeffs[i] * buf[..., tf - i - 1, :]
            buf[..., tf, :] -= acc
        return buf[..., start:, :].astype(y.dtype, copy=False)
    result = y.astype(np.float64).copy()
    for t in range(n, t_len):
        acc = 0.0
        for i in range(n):
            acc = acc + coeffs[i] * result[..., t - i - 1, :]
        result[..., t, :] = result[..., t, :] - acc
    return result.astype(y.dtype, copy=False)


def reverse_precondition(
    y: np.ndarray, coeffs: np.ndarray, context: np.ndarray | None = None
) -> np.ndarray:
    """Sequential reversal of :func:`forward_precondition`.

    Without context, the first n values are assumed unconditioned
    (identity) and reversal starts at t = n. With ``context`` (original-
    scale history preceding ``y``), every step uses history — exactly
    the reference's GT-context reversal path.
    Inherently sequential within a series; parallelize across series.
    """
    coeffs = np.asarray(coeffs, dtype=np.float64)
    y = np.asarray(y)
    if y.ndim == 2:
        rows = [reverse_precondition(row, coeffs, context=None if context is None else context[i])
                for i, row in enumerate(y)]
        return np.stack(rows)
    n = len(coeffs)
    if context is not None:
        ctx = np.asarray(context, dtype=np.float64)
        buf = np.concatenate([ctx, np.zeros(len(y))])
        off = len(ctx)
        for t in range(len(y)):
            tf = off + t
            acc = 0.0
            for i in range(1, n + 1):
                if tf - i >= 0:
                    acc += coeffs[i - 1] * buf[tf - i]
            buf[tf] = float(y[t]) - acc
        return buf[off:].astype(y.dtype, copy=False)
    result = y.astype(np.float64).copy()
    for t in range(n, len(y)):
        acc = 0.0
        for i in range(1, n + 1):
            acc += coeffs[i - 1] * result[t - i]
        result[t] = float(y[t]) - acc
    return result.astype(y.dtype, copy=False)
