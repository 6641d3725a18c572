"""Fisher's exact test p-values with BOUNDED driver work.

The 2x2 cells come from a distributed reduce (one row per engine
partition, summed on the driver); only the four integers reach this
module.  The hypergeometric support has ``S = hi - lo + 1`` tables:

* ``S <= cutoff`` (default 10_000): EXACT RATIONAL path.  Weights are
  big-int binomials ``C(n_a, k) * C(n_b, K - k)`` over the common
  denominator ``C(N, K)``; the two-sided sum is decided by integer
  comparisons with no float anywhere in the decision.  An independent
  recurrence in exact :class:`fractions.Fraction` arithmetic must
  reproduce the identical rational, and the weights must satisfy the
  Vandermonde identity ``sum_k w(k) == C(N, K)``.

* ``S > cutoff``: LOG-GAMMA WINDOW path with O(sqrt(N)) driver work.
  The hypergeometric mass concentrates within ``O(sigma)`` of the mean
  (``sigma <= sqrt(N)/2``), so we enumerate only ``mean +/- 40 sigma``
  — every table outside that window has probability < 1e-300 and the
  truncated two-sided mass is bounded by ``S * 1e-300 ~ 0``.  Inside
  the window, ``log w(k)`` is built from four :func:`math.lgamma`
  calls at the left edge plus a VECTORIZED ``np.cumsum`` of log odds
  ratios (the same recurrence the exact path verifies), then summed
  with a log-sum-exp.  Driver work and memory are O(window), never
  O(#users): at N = 1e12 the window is ~4e7 doubles, at N = 1e9 ~1.3e6.

The ``cutoff`` boundary is a pure accuracy/latency knob — both paths
compute the same statistic, and ``tests/test_fisher.py`` pins them to
each other at the boundary (same inputs, cutoff forced to each side,
|p_exact - p_window| < 1e-10).

Reference analogue: the reference's eval stack reports significance
via pooled z-scores only (uni2ts/src/uni2ts/eval_util/evaluation.py);
this exact small-sample path is an engine extension.
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np

DEFAULT_CUTOFF = 10_000
# The exact path's driver cost is ~ S big-int operations on integers of
# ~log2(C(N, K)) bits (plus Fraction gcd normalization, which is worse),
# so support count alone is NOT a work bound: n_a = n_b = 5e5 with
# K = 1e4 has S ~ 1e4 <= cutoff but C(N, K) has ~8e4 BITS — minutes of
# big-int CPU.  Gate on the product S * bits too; 2e7 bit-rows keeps
# every classical small-sample table exact (N <= ~2000 fully, larger N
# at small K) while routing margin-heavy tables to the O(sqrt(N))
# window path, which agrees to < 1e-10 (tests/test_fisher.py).
EXACT_BIT_BUDGET = 2e7
_WINDOW_SIGMAS = 40.0


def _log_binom(n: int, k: int) -> float:
    return math.lgamma(n + 1) - math.lgamma(k + 1) - math.lgamma(n - k + 1)


def _exact(n_a: int, n_b: int, c_a: int, K: int, lo: int, hi: int):
    from math import comb

    N = n_a + n_b
    w = {k: comb(n_a, k) * comb(n_b, K - k) for k in range(lo, hi + 1)}
    denom = comb(N, K)
    vandermonde_ok = sum(w.values()) == denom
    w_obs = w[c_a]
    p_two = Fraction(sum(v for v in w.values() if v <= w_obs), denom)
    # one-sided p = tail in the OBSERVED direction (min of the two
    # tails), which is always <= the two-sided sum
    p_upper = Fraction(sum(w[k] for k in range(c_a, hi + 1)), denom)
    p_lower = Fraction(sum(w[k] for k in range(lo, c_a + 1)), denom)
    p_one = min(p_upper, p_lower)

    # independent witness: hypergeometric recurrence in exact Fractions
    probs = {lo: Fraction(w[lo], denom)}
    for k in range(lo, hi):
        probs[k + 1] = (
            probs[k] * (n_a - k) * (K - k) / ((k + 1) * (n_b - K + k + 1))
        )
    p_two_rec = sum(v for v in probs.values() if v <= probs[c_a])
    ok = bool(
        vandermonde_ok
        and p_two_rec == p_two
        and sum(probs.values()) == 1
        and p_one <= p_two
        and 0 < p_two <= 1
    )
    return float(p_two), float(p_one), ok, "exact-rational"


def _logsumexp(a: np.ndarray) -> float:
    if a.size == 0:
        return -np.inf
    m = float(a.max())
    return m + float(np.log(np.exp(a - m).sum()))


def _window(n_a: int, n_b: int, c_a: int, K: int, lo: int, hi: int):
    N = n_a + n_b
    mean = K * n_a / N
    var = K * (n_a / N) * (n_b / N) * (N - K) / max(N - 1, 1)
    sd = math.sqrt(max(var, 1.0))
    klo = max(lo, int(math.floor(mean - _WINDOW_SIGMAS * sd)))
    khi = min(hi, int(math.ceil(mean + _WINDOW_SIGMAS * sd)))
    ks = np.arange(klo, khi + 1, dtype=np.float64)
    lden = _log_binom(N, K)
    log_w_klo = _log_binom(n_a, klo) + _log_binom(n_b, K - klo)
    # log w(k+1) - log w(k) = log((n_a - k)(K - k)) - log((k+1)(n_b - K + k + 1))
    k_step = ks[:-1]
    ratios = (
        np.log((n_a - k_step) * (K - k_step))
        - np.log((k_step + 1.0) * (n_b - K + k_step + 1.0))
    )
    logp = np.concatenate(([0.0], np.cumsum(ratios))) + (log_w_klo - lden)

    if klo <= c_a <= khi:
        logp_obs = float(logp[c_a - klo])
    else:  # observed table outside the central window: compute directly
        logp_obs = _log_binom(n_a, c_a) + _log_binom(n_b, K - c_a) - lden
    tol = 1e-12 * max(1.0, abs(logp_obs))
    two_sided = logp[logp <= logp_obs + tol]
    if not (klo <= c_a <= khi):
        # observed table outside the window: its own mass is not in
        # ``logp``; include it so p_two is never 0 (p ~ 1e-300 scale).
        two_sided = np.concatenate((two_sided, [logp_obs]))
    # one-sided p = tail in the observed direction (min of the two
    # tails); tables beyond the window contribute < 1e-300 per term
    if c_a < klo:
        p_one_log = logp_obs  # lower tail is the smaller one
    elif c_a > khi:
        p_one_log = logp_obs  # upper tail is the smaller one
    else:
        p_one_log = min(
            _logsumexp(logp[ks >= c_a]), _logsumexp(logp[ks <= c_a])
        )
    # a table outside the 40-sigma window has log p < -40^2/2 = -800,
    # below float64's exp range (~ -745): exp underflows to 0.  Clamp
    # to the smallest positive subnormal so the p in (0, 1] invariant
    # (and downstream log-taking) survives — the honest statement is
    # "p < 1e-300", and 5e-324 encodes that without inventing digits.
    tiny = 5e-324
    p_two = max(math.exp(_logsumexp(two_sided)), tiny)
    p_one = max(math.exp(p_one_log), tiny)
    total = math.exp(_logsumexp(logp))
    # Error model for the unit-mass self-check: (a) each _log_binom is
    # a difference of lgammas whose RAW magnitudes reach lgamma(N+1)
    # ~ N ln N, so catastrophic cancellation leaves ~eps * lgamma(N+1)
    # absolute log error (at N = 2e9 that is ~9e-6 — the |result| is no
    # bound at all); (b) the cumsum of the log-odds recurrence adds up
    # to ~len * eps * max|partial| forward error (a 4001-wide window
    # spanning 827 nats is ~7e-10).  Tolerance scales with both.
    eps = np.finfo(np.float64).eps
    span = float(np.abs(logp).max()) if logp.size else 1.0
    mass_tol = 1e-9 + eps * (
        50.0 * math.lgamma(N + 1) + 4.0 * len(ks) * max(span, 1.0)
    )
    ok = bool(
        abs(total - 1.0) < mass_tol
        and p_one <= p_two + 1e-12
        and 0 < p_two <= 1 + 1e-12
    )
    return min(p_two, 1.0), min(p_one, 1.0), ok, "lgamma-window"


def fisher_exact_p(
    n_a: int, n_b: int, c_a: int, c_b: int, cutoff: int = DEFAULT_CUTOFF
):
    """Two-sided and one-sided Fisher exact p for a 2x2 table.

    ``p_one`` is the tail in the OBSERVED direction — the smaller of the
    lower and upper tails (so ``p_one <= p_two`` always holds).  NOTE:
    this is a deliberate semantic change from the pre-round-4 entry,
    which always reported the UPPER tail; consumers comparing against an
    upper-tail convention (scipy ``alternative='greater'``) must pick
    the direction explicitly.

    Returns ``(p_two, p_one, ok, method)``.  ``ok`` bundles the
    path's internal self-checks (Vandermonde + recurrence witness on
    the exact path; unit total mass + ordering on the window path).
    """
    K = c_a + c_b
    lo, hi = max(0, K - n_b), min(K, n_a)
    S = hi - lo + 1
    if S <= cutoff:
        # bits of the common denominator C(N, K); S * bits estimates the
        # exact path's big-int work (see EXACT_BIT_BUDGET note above)
        bits = _log_binom(n_a + n_b, K) / math.log(2.0)
        if S * max(bits, 1.0) <= EXACT_BIT_BUDGET:
            return _exact(n_a, n_b, c_a, K, lo, hi)
    return _window(n_a, n_b, c_a, K, lo, hi)
