"""Classical time-series analysis kernels: autocorrelation (FFT),
CUSUM changepoint detection, moving-average seasonal decomposition.

Pure-numpy, vectorized along the time axis; they run per packed chunk
inside actor-pool ``map_batches`` stages (`stages/analytics.py`).
Complements the frequency-domain kernels in ``functions/spectral.py``
(Welch / Lomb-Scargle): ACF finds periods in lag space, CUSUM finds
level shifts, the decomposition splits trend/seasonal/residual.

Reference parity: the reference's eval stack measures seasonality via
``get_seasonality`` frequency tables
(`uni2ts/src/uni2ts/eval_util/metrics.py`) and detrends inside its
preconditioning transforms; these kernels compute the analogous
statistics from the data itself.
"""

from __future__ import annotations

import numpy as np


def acf_fft(x: np.ndarray, max_lag: int | None = None) -> np.ndarray:
    """Biased sample autocorrelation via FFT, lags 0..max_lag.

    Demeaned, normalized by lag-0 autocovariance (so acf[0] == 1).
    Identical to the direct estimator
    ``sum((x_t - m)(x_{t+k} - m)) / sum((x_t - m)^2)`` — the standard
    biased form (statsmodels ``acf(adjusted=False)``). O(n log n).
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if max_lag is None:
        max_lag = n - 1
    max_lag = min(max_lag, n - 1)
    if n < 2:
        return np.ones(1)
    d = x - x.mean()
    nfft = 1 << int(np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(d, nfft)
    ac = np.fft.irfft(f * np.conj(f))[: max_lag + 1]
    if ac[0] <= 0:
        out = np.zeros(max_lag + 1)
        out[0] = 1.0
        return out
    return ac / ac[0]


def dominant_lag(acf: np.ndarray, min_lag: int = 2) -> tuple[int, float]:
    """Lag (>= min_lag) with the highest autocorrelation, and its
    value. The standard period detector for regularly-sampled series.
    """
    if len(acf) <= min_lag:
        return 0, 0.0
    k = int(np.argmax(acf[min_lag:])) + min_lag
    return k, float(acf[k])


def cusum_changepoint(x: np.ndarray) -> tuple[int, float]:
    """Mean-shift changepoint via the CUSUM statistic (Page, 1954;
    Pettitt-style location).

    Returns ``(k, stat)``: the split index k (the first k samples form
    the pre-change segment, argmax of |cumsum(x - mean)|) and the
    normalized statistic ``max|S| / (sd * sqrt(n))`` — ~O(1) under the
    no-change null, grows as sqrt(n)*shift/sd under a true shift, so a
    fixed threshold (≈1.3 at 5% for Brownian-bridge max) flags changes
    at any length.
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if n < 4:
        return 0, 0.0
    s = np.cumsum(x - x.mean())
    # exclude the trivial endpoint S_n == 0
    k = int(np.argmax(np.abs(s[:-1])))
    sd = float(np.std(x, ddof=1))
    if sd == 0.0:
        return k + 1, 0.0
    return k + 1, float(np.abs(s[k]) / (sd * np.sqrt(n)))


def seasonal_decompose_ma(
    x: np.ndarray, period: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Classical additive decomposition: centered moving-average trend
    (2xMA for even periods), per-phase seasonal means (centered to sum
    to zero), residual. NaN-padded trend at the edges, matching the
    textbook / statsmodels ``seasonal_decompose`` convention.
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if period < 2 or n < 2 * period:
        raise ValueError(f"need >= 2 periods of data (n={n}, period={period})")
    if period % 2 == 0:
        w = np.full(period + 1, 1.0 / period)
        w[0] = w[-1] = 0.5 / period
    else:
        w = np.full(period, 1.0 / period)
    half = len(w) // 2
    trend = np.full(n, np.nan)
    trend[half : n - half] = np.convolve(x, w, mode="valid")
    detr = x - trend
    seasonal_means = np.array(
        [np.nanmean(detr[p::period]) for p in range(period)]
    )
    seasonal_means -= seasonal_means.mean()
    seasonal = seasonal_means[np.arange(n) % period]
    resid = x - trend - seasonal
    return trend, seasonal, resid


def seasonal_strength(x: np.ndarray, period: int) -> float:
    """Hyndman's seasonal-strength measure
    ``max(0, 1 - var(resid) / var(seasonal + resid))`` from the MA
    decomposition — 0 for white noise, -> 1 for strongly seasonal.
    """
    _, seasonal, resid = seasonal_decompose_ma(x, period)
    m = ~np.isnan(resid)
    denom = np.var(seasonal[m] + resid[m])
    if denom == 0:
        return 0.0
    return float(max(0.0, 1.0 - np.var(resid[m]) / denom))


def yule_walker(x: np.ndarray, order: int) -> tuple[np.ndarray, float]:
    """AR(p) coefficients via the Yule-Walker equations: solve the
    Toeplitz system R a = r over the biased sample autocovariance
    (the same estimator as :func:`acf_fft`). Returns ``(a, sigma2)``
    with ``x_t ~= a_1 x_{t-1} + ... + a_p x_{t-p}`` and the innovation
    variance estimate ``sigma2 = acov[0] - a . acov[1..p]``.

    These are the closed-form "learned" filter taps: plugging
    ``coeffs = -a`` into ``precondition.forward_precondition``
    (``y_t = x_t + sum c_i x_{t-i}``) whitens the series — the numpy
    equivalent of the reference's torch ``LearnablePrecondition``
    (uni2ts/src/uni2ts/transform/precondition.py), with the filter fit
    by moment matching instead of SGD.
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if n < 2 * order + 2:
        raise ValueError(f"series too short for AR({order}): n={n}")
    d = x - x.mean()
    acov0 = float(np.dot(d, d)) / n
    if acov0 == 0.0:
        return np.zeros(order), 0.0
    acf = acf_fft(x, order)
    acov = acf * acov0
    idx = np.abs(np.subtract.outer(np.arange(order), np.arange(order)))
    R = acov[idx]
    a = np.linalg.solve(R, acov[1 : order + 1])
    sigma2 = float(acov0 - a @ acov[1 : order + 1])
    return a, max(sigma2, 0.0)


def ar_whitening_coeffs(x: np.ndarray, order: int) -> np.ndarray:
    """Fitted precondition taps for ``forward_precondition``:
    ``c = -a`` so that ``y_t = x_t - sum a_i x_{t-i}`` is the AR
    innovation sequence."""
    a, _ = yule_walker(x, order)
    return -a


# -------------------------------------------------- exponential smoothing


def ewm_mean_scan(x: np.ndarray, alpha: float) -> np.ndarray:
    """EWMA (``adjust=False`` recurrence ``s_t = a*x_t + (1-a)*s_{t-1}``,
    seeded at the first finite value) over a TIME-MAJOR matrix
    ``x [S, T]`` with NaN padding: the scan loops over the T time steps
    while every step is vectorized across the S series — the standard
    batched-scan layout for sequential recurrences (loop length is the
    chunk's time extent, never the corpus size). NaN cells carry the
    previous state and emit NaN.
    """
    x = np.atleast_2d(np.asarray(x, dtype=np.float64))
    S, T = x.shape
    out = np.full((S, T), np.nan)
    s = np.full(S, np.nan)
    for t in range(T):
        xt = x[:, t]
        fin = np.isfinite(xt)
        first = fin & ~np.isfinite(s)
        s = np.where(first, xt, np.where(fin, alpha * xt + (1.0 - alpha) * s, s))
        out[:, t] = np.where(fin, s, np.nan)
    return out


def holt_linear_scan(
    x: np.ndarray, alpha: float = 0.3, beta: float = 0.1, horizon: int = 0
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Holt's linear-trend smoothing over ``x [S, T]`` (NaN-padded,
    time-major): ``l_t = a*x_t + (1-a)(l_{t-1}+b_{t-1})``,
    ``b_t = B(l_t - l_{t-1}) + (1-B) b_{t-1}`` (Holt 1957 / Hyndman &
    Athanasopoulos, FPP §8.2), seeded ``l_1 = x_1``, ``b_1 = x_2-x_1``
    at each series' first two finite points. Same batched-scan layout
    as :func:`ewm_mean_scan`.

    Returns ``(level [S,T], trend [S,T], forecast [S,horizon])`` where
    the forecast extrapolates ``l_T + h*b_T`` from each series' last
    finite state.
    """
    x = np.atleast_2d(np.asarray(x, dtype=np.float64))
    S, T = x.shape
    level = np.full((S, T), np.nan)
    trend = np.full((S, T), np.nan)
    l = np.full(S, np.nan)
    b = np.full(S, np.nan)
    seen = np.zeros(S, dtype=np.int64)  # finite points consumed so far
    for t in range(T):
        xt = x[:, t]
        fin = np.isfinite(xt)
        first = fin & (seen == 0)
        second = fin & (seen == 1)
        later = fin & (seen >= 2)
        l_new = np.where(later, alpha * xt + (1.0 - alpha) * (l + b), l)
        b_new = np.where(later, beta * (l_new - l) + (1.0 - beta) * b, b)
        # seed: l=x1 on the first point; on the second, b=x2-l1 and the
        # level updates with that fresh trend
        l_new = np.where(first, xt, l_new)
        b_new = np.where(second, xt - l, b_new)
        l_new = np.where(second, xt, l_new)
        l, b = l_new, b_new
        seen = seen + fin.astype(np.int64)
        level[:, t] = np.where(fin, l, np.nan)
        trend[:, t] = np.where(fin, b, np.nan)
    if horizon <= 0:
        return level, trend, np.empty((S, 0))
    h = np.arange(1, horizon + 1, dtype=np.float64)
    fcst = l[:, None] + h[None, :] * b[:, None]
    return level, trend, fcst


def holt_winters_scan(
    x: np.ndarray,
    period: int,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    horizon: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Additive Holt-Winters (triple exponential) smoothing over a
    time-major matrix ``x [S, T]`` (Winters 1960; Hyndman &
    Athanasopoulos FPP §8.3):

        l_t = a (x_t - s_{t-m}) + (1-a)(l_{t-1} + b_{t-1})
        b_t = B (l_t - l_{t-1}) + (1-B) b_{t-1}
        s_t = G (x_t - l_{t-1} - b_{t-1}) + (1-G) s_{t-m}

    Seeding uses the first TWO periods with trend-corrected seasonal
    means: b0 from the period-mean difference, seasonal seeds as the
    mean detrended deviation per phase (centered to zero mean so the
    level absorbs the seasonal offset).  On a noise-free additive
    series (line + pure period-m seasonal) every state stays EXACT, so
    the h-step forecast continues the series bit-tightly — the planted
    self-check relies on this.

    Requires ``T >= 2*period`` and finite input (gap-fill upstream —
    the reference's imputation stage owns NaN policy).  Batched-scan
    layout: one loop over T, each step vectorized across S.

    Returns ``(level [S,T], trend [S,T], fitted [S,T], forecast
    [S,horizon])`` where ``fitted[t]`` is the one-step-ahead prediction
    ``l_{t-1} + b_{t-1} + s_{t-m}`` (NaN for t < 1 history).
    """
    x = np.atleast_2d(np.asarray(x, dtype=np.float64))
    S, T = x.shape
    m = int(period)
    if m < 2:
        raise ValueError("period must be >= 2")
    if T < 2 * m:
        raise ValueError(f"need T >= 2*period ({2 * m}), got {T}")
    if not np.isfinite(x).all():
        raise ValueError("holt_winters_scan requires finite input; gap-fill first")

    mean1 = x[:, :m].mean(axis=1)
    mean2 = x[:, m : 2 * m].mean(axis=1)
    b = (mean2 - mean1) / m
    # detrended seasonal seeds: average deviation from the fitted line
    # over the first two periods, per phase
    t_idx = np.arange(2 * m, dtype=np.float64)
    base = mean1[:, None] + b[:, None] * (t_idx[None, :] - (m - 1) / 2.0)
    dev = x[:, : 2 * m] - base
    s_state = 0.5 * (dev[:, :m] + dev[:, m : 2 * m])
    s_mean = s_state.mean(axis=1, keepdims=True)
    s_state = s_state - s_mean  # zero-mean seasonal ...
    l = mean1 - b * ((m - 1) / 2.0 + 1.0) + s_mean[:, 0]  # ... level absorbs it
    level = np.empty((S, T))
    trend = np.empty((S, T))
    fitted = np.full((S, T), np.nan)
    for t in range(T):
        ph = t % m
        s_prev = s_state[:, ph]
        fitted[:, t] = l + b + s_prev
        l_new = alpha * (x[:, t] - s_prev) + (1.0 - alpha) * (l + b)
        b_new = beta * (l_new - l) + (1.0 - beta) * b
        s_state[:, ph] = gamma * (x[:, t] - l - b) + (1.0 - gamma) * s_prev
        l, b = l_new, b_new
        level[:, t] = l
        trend[:, t] = b
    if horizon <= 0:
        return level, trend, fitted, np.empty((S, 0))
    h = np.arange(1, horizon + 1)
    fc = l[:, None] + h[None, :] * b[:, None] + s_state[
        np.arange(S)[:, None], (T + h[None, :] - 1) % m
    ]
    return level, trend, fitted, fc


def sliding_mean_std(x: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Sliding-window mean and std over all length-``w`` subsequences
    (cumsum trick, O(n)). Returns arrays of length ``len(x) - w + 1``."""
    x = np.asarray(x, dtype=np.float64)
    c = np.concatenate(([0.0], np.cumsum(x)))
    c2 = np.concatenate(([0.0], np.cumsum(x * x)))
    mu = (c[w:] - c[:-w]) / w
    var = (c2[w:] - c2[:-w]) / w - mu * mu
    return mu, np.sqrt(np.maximum(var, 0.0))


def matrix_profile(x: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Exact z-normalized self-join matrix profile (STOMP recurrence,
    Zhu et al., ICDM 2016): for every length-``w`` subsequence, the
    z-normalized Euclidean distance to its nearest non-trivial match
    and that match's index. Exclusion zone = w//2 around the diagonal.
    O(n^2) with vectorized inner updates — sized for per-chunk series
    (n <= a few thousand), NOT whole-corpus joins.

    Near-constant subsequences (std ~ 0) match other near-constant
    subsequences at distance 0 by convention.
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    m = n - w + 1
    if m < 2:
        return np.full(max(m, 0), np.inf), np.full(max(m, 0), -1, np.int64)
    mu, sig = sliding_mean_std(x, w)
    flat = sig < 1e-10
    sig_safe = np.where(flat, 1.0, sig)
    excl = max(1, w // 2)

    # QT_first[j] = dot(x[0:w], x[j:j+w]) for all j, via correlation
    qt_first = np.convolve(x, x[w - 1::-1], mode="valid")

    P = np.full(m, np.inf)
    I = np.full(m, -1, np.int64)
    qt = qt_first.copy()
    for i in range(m):
        if i > 0:
            # STOMP: QT_i[j] = QT_{i-1}[j-1] - x[j-1]x[i-1] + x[j+w-1]x[i+w-1]
            qt[1:] = qt[: m - 1] - x[: m - 1] * x[i - 1] + x[w:] * x[i + w - 1]
            qt[0] = qt_first[i]
        # z-normalized distance^2 = 2w(1 - (QT - w mu_i mu_j)/(w sig_i sig_j))
        corr = (qt - w * mu[i] * mu) / (w * sig_safe[i] * sig_safe)
        corr = np.where(flat | flat[i], np.where(flat & flat[i], 1.0, 0.0), corr)
        d = np.sqrt(np.maximum(2.0 * w * (1.0 - corr), 0.0))
        lo, hi = max(0, i - excl), min(m, i + excl + 1)
        d[lo:hi] = np.inf
        j = int(np.argmin(d))
        P[i] = d[j]
        I[i] = j
    return P, I


def spectral_residual_saliency(x: np.ndarray, ma_window: int = 21) -> np.ndarray:
    """Spectral-residual saliency map (Hou & Zhang CVPR 2007, applied
    to time series as in Ren et al., KDD 2019 §3.1): log-amplitude
    spectrum minus its moving average, recombined with the original
    phase — points that break the series' spectral regularity get
    high saliency. O(n log n), fully vectorized."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if n < 4:
        return np.zeros(n)
    eps = 1e-8
    F = np.fft.fft(x)
    amp = np.abs(F)
    logamp = np.log(amp + eps)
    k = min(ma_window, n) | 1  # odd
    kernel = np.ones(k) / k
    avg = np.convolve(np.pad(logamp, (k // 2, k // 2), mode="edge"), kernel, mode="valid")
    residual = logamp - avg
    sal = np.abs(np.fft.ifft(np.exp(residual) * np.exp(1j * np.angle(F))))
    return sal


def dtw_distance(x: np.ndarray, y: np.ndarray, band: int | None = None) -> float:
    """Dynamic-time-warping distance (squared-error local cost, full
    sum returned as sqrt of the optimal path cost) with an optional
    Sakoe-Chiba band. The row recurrence is fully vectorized: with
    t[j] = c[i,j] + min(D[i-1,j], D[i-1,j-1]) the horizontal term
    unrolls to D[i,j] = csum[j] + min_{k<=j}(t[k] - csum[k]), a
    prefix-min — no inner Python loop, O(n*m) total work."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, m = len(x), len(y)
    if n == 0 or m == 0:
        return float("inf")
    if band is None:
        band = max(n, m)
    prev = np.full(m, np.inf)
    # row 0
    j_hi = min(m, band + 1)
    c0 = (y[:j_hi] - x[0]) ** 2
    prev[:j_hi] = np.cumsum(c0)
    for i in range(1, n):
        jlo, jhi = max(0, i - band), min(m, i + band + 1)
        if jlo >= jhi:  # band excludes the whole row: no feasible path
            prev = np.full(m, np.inf)
            continue
        c = (y[jlo:jhi] - x[i]) ** 2
        shifted = np.empty(jhi - jlo)  # D[i-1, j-1]
        if jlo == 0:
            shifted[0] = np.inf
            shifted[1:] = prev[jlo : jhi - 1]
        else:
            shifted[:] = prev[jlo - 1 : jhi - 1]
        # D[i,j] = min(t[j], c[j] + D[i,j-1]) unrolls over the row to
        # D[i,j] = S[j] + min_{k<=j}(t[k] - S[k]) with S = cumsum(c)
        t = c + np.minimum(prev[jlo:jhi], shifted)
        S = np.cumsum(c)
        cur = np.full(m, np.inf)
        cur[jlo:jhi] = S + np.minimum.accumulate(t - S)
        prev = cur
    return float(np.sqrt(prev[m - 1]))


def kalman_local_level(
    x: np.ndarray, q: float, r: float, mu0: float | None = None, p0: float = 1e6
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Kalman filter + RTS smoother for the local-level model
    (x_t = x_{t-1} + w, w~N(0,q); y_t = x_t + v, v~N(0,r)).
    NaN observations are treated as missing (pure predict step), so
    this doubles as a probabilistic gap-filler. Returns
    (filtered_mean, smoothed_mean, smoothed_var), all length n.
    O(n), fully sequential per series — run per chunk in an actor
    pool, never across chunk boundaries."""
    y = np.asarray(x, dtype=np.float64)
    n = len(y)
    if n == 0:
        return np.zeros(0), np.zeros(0), np.zeros(0)
    m_pred = np.empty(n)  # prior mean at t
    p_pred = np.empty(n)  # prior var at t
    m_filt = np.empty(n)
    p_filt = np.empty(n)
    first = np.flatnonzero(np.isfinite(y))
    mu = float(y[first[0]]) if mu0 is None and len(first) else (mu0 or 0.0)
    m, p = mu, p0
    for t in range(n):
        # predict
        if t > 0:
            p = p + q
        m_pred[t], p_pred[t] = m, p
        # update
        if np.isfinite(y[t]):
            k = p / (p + r)
            m = m + k * (y[t] - m)
            p = (1.0 - k) * p
        m_filt[t], p_filt[t] = m, p
    # RTS smoother
    m_smooth = m_filt.copy()
    p_smooth = p_filt.copy()
    for t in range(n - 2, -1, -1):
        g = p_filt[t] / p_pred[t + 1] if p_pred[t + 1] > 0 else 0.0
        m_smooth[t] = m_filt[t] + g * (m_smooth[t + 1] - m_pred[t + 1])
        p_smooth[t] = p_filt[t] + g * g * (p_smooth[t + 1] - p_pred[t + 1])
    return m_filt, m_smooth, p_smooth


# ------------------------------------------------------------ SAX
# Gaussian breakpoints for alphabet sizes 2..20 come from the normal
# quantiles Phi^-1(i/a) — computed on demand via an erfinv-free
# rational approximation is unnecessary: numpy has no ppf, so use the
# Acklam-style inverse through np.sqrt(2)*erfinv when scipy is absent.
# We precompute with the Beasley-Springer-Moro polynomial to stay in
# the stdlib+numpy envelope.

def _norm_ppf(p: np.ndarray) -> np.ndarray:
    """Inverse standard-normal CDF (Beasley-Springer-Moro), |err|<3e-9
    on (0,1) — good far beyond what SAX breakpoints need."""
    p = np.asarray(p, dtype=np.float64)
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    out = np.empty_like(p)
    plow, phigh = 0.02425, 1 - 0.02425
    lo = p < plow
    hi = p > phigh
    mid = ~(lo | hi)
    if lo.any():
        q = np.sqrt(-2 * np.log(p[lo]))
        out[lo] = ((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5])
                   / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1))
    if hi.any():
        q = np.sqrt(-2 * np.log(1 - p[hi]))
        out[hi] = -((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5])
                    / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1))
    if mid.any():
        q = p[mid] - 0.5
        r = q * q
        out[mid] = ((((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q
                    / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1))
    return out


def sax_breakpoints(alphabet: int) -> np.ndarray:
    """The a-1 Gaussian breakpoints beta_1..beta_{a-1} of Lin et al.
    (DMKD 2007 'Experiencing SAX'): equiprobable N(0,1) regions."""
    if alphabet < 2:
        raise ValueError("alphabet must be >= 2")
    return _norm_ppf(np.arange(1, alphabet) / alphabet)


def paa(x: np.ndarray, w: int) -> np.ndarray:
    """Piecewise Aggregate Approximation: mean of each of ``w``
    equal-duration segments (Keogh et al. 2001). Handles n not
    divisible by w with the fractional-overlap convention (each point
    contributes to the segment(s) it overlaps, weighted by overlap) so
    PAA is exactly the average of the continuous-time step function.
    NaNs must be imputed upstream."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if w <= 0 or n == 0:
        return np.zeros(0)
    if w >= n:
        return x.copy() if w == n else np.interp(
            np.linspace(0, n - 1, w), np.arange(n), x)
    if n % w == 0:
        return x.reshape(w, n // w).mean(axis=1)
    # fractional segmentation via prefix integral of the step function
    prefix = np.concatenate([[0.0], np.cumsum(x)])

    def integral(t: np.ndarray) -> np.ndarray:
        i = np.floor(t).astype(np.int64)
        i = np.clip(i, 0, n - 1)
        return prefix[i] + (t - i) * x[i]

    edges = np.linspace(0.0, float(n), w + 1)
    seg = integral(edges[1:]) - integral(edges[:-1])
    return seg / (n / w)


def sax_word(x: np.ndarray, w: int = 8, alphabet: int = 4) -> tuple[str, np.ndarray]:
    """SAX symbolic word for one series: z-normalize (ddof=0), PAA to
    ``w`` segments, quantize by Gaussian breakpoints. Returns
    (word, paa_values_normalized). A constant series maps to the middle
    symbol repeated (z-norm degenerates; convention: all zeros)."""
    x = np.asarray(x, dtype=np.float64)
    mu = float(x.mean()) if len(x) else 0.0
    sd = float(x.std())
    z = (x - mu) / sd if sd > 0 else np.zeros_like(x)
    pa_ = paa(z, w)
    bps = sax_breakpoints(alphabet)
    idx = np.searchsorted(bps, pa_, side="left")
    word = "".join(chr(ord("a") + int(i)) for i in idx)
    return word, pa_


def sax_mindist(word_a: str, word_b: str, n: int, alphabet: int = 4) -> float:
    """MINDIST lower bound between two SAX words of original length n
    (Lin et al. 2007 eq. 6) — provably <= the Euclidean distance of
    the z-normalized originals."""
    if len(word_a) != len(word_b):
        raise ValueError("words must share length")
    w = len(word_a)
    bps = sax_breakpoints(alphabet)
    ia = np.frombuffer(word_a.encode(), dtype=np.uint8) - ord("a")
    ib = np.frombuffer(word_b.encode(), dtype=np.uint8) - ord("a")
    lo = np.minimum(ia, ib).astype(np.int64)
    hi = np.maximum(ia, ib).astype(np.int64)
    gap = np.where(hi - lo <= 1, 0.0, bps[np.maximum(hi - 1, 0)] - bps[np.minimum(lo, len(bps) - 1)])
    return float(np.sqrt(n / w) * np.sqrt((gap**2).sum()))


def kleinberg_bursts(
    gaps: np.ndarray, s: float = 2.0, gamma: float = 1.0
) -> tuple[np.ndarray, list[tuple[int, int]]]:
    """Kleinberg's 2-state burst automaton (Kleinberg, KDD 2002) over
    inter-arrival gaps: state 0 emits gaps at the base rate
    a0 = n/T, state 1 at the burst rate a1 = s*a0; entering the burst
    state costs ``gamma * ln n``, leaving is free. Exact 2-state
    Viterbi, O(n). Returns (state_per_gap, [(start, end)] burst gap
    intervals, end exclusive). Gaps of zero are clamped to the
    smallest positive gap to keep the exponential density finite."""
    g = np.asarray(gaps, dtype=np.float64)
    n = len(g)
    if n == 0:
        return np.zeros(0, dtype=np.int64), []
    pos = g[g > 0]
    eps = float(pos.min()) if len(pos) else 1.0
    g = np.maximum(g, eps)
    T = float(g.sum())
    a0 = n / T
    a1 = s * a0
    # emission costs: -ln(a_i e^{-a_i x}) = a_i x - ln a_i
    c0 = a0 * g - np.log(a0)
    c1 = a1 * g - np.log(a1)
    tau = gamma * np.log(n) if n > 1 else gamma
    # Viterbi over states {0, 1}
    INF = np.inf
    cost = np.array([c0[0], c1[0] + tau])
    back = np.empty((n, 2), dtype=np.int8)
    back[0] = (0, 0)
    for t in range(1, n):
        stay0, from1 = cost[0], cost[1]          # entering 0 is free
        if stay0 <= from1:
            new0, back[t, 0] = stay0 + c0[t], 0
        else:
            new0, back[t, 0] = from1 + c0[t], 1
        up = cost[0] + tau                        # entering 1 pays tau
        if cost[1] <= up:
            new1, back[t, 1] = cost[1] + c1[t], 1
        else:
            new1, back[t, 1] = up + c1[t], 0
        cost[0], cost[1] = new0, new1
    states = np.empty(n, dtype=np.int64)
    states[-1] = int(cost[1] < cost[0])
    for t in range(n - 1, 0, -1):
        states[t - 1] = back[t, states[t]]
    # collapse to intervals
    bursts: list[tuple[int, int]] = []
    in_b = False
    for t in range(n):
        if states[t] == 1 and not in_b:
            start, in_b = t, True
        elif states[t] == 0 and in_b:
            bursts.append((start, t))
            in_b = False
    if in_b:
        bursts.append((start, n))
    return states, bursts


def pelt_mean_changepoints(
    x: np.ndarray, beta: float | None = None, min_size: int = 2
) -> list[int]:
    """Exact penalized multi-changepoint detection for mean shifts —
    PELT (Killick, Fearnhead & Eckley, JASA 2012) with the Gaussian
    mean-change segment cost C(a,b) = sum (y - ybar)^2 computed O(1)
    from prefix sums. Penalty defaults to 2 * sigma_hat^2 * ln n with
    sigma_hat^2 from first differences (robust to the mean shifts
    themselves). Pruning keeps the expected runtime linear while the
    result equals the exact optimal-partition DP. Returns the sorted
    changepoint indices (each the START of a new segment)."""
    y = np.asarray(x, dtype=np.float64)
    n = len(y)
    if n < 2 * min_size:
        return []
    if beta is None:
        d = np.diff(y)
        sigma2 = float(np.median(np.abs(d - np.median(d))) / 0.6745) ** 2 / 2.0
        if sigma2 <= 0:
            sigma2 = float(d.var()) / 2.0 or 1.0
        beta = 2.0 * sigma2 * np.log(n)
    s1 = np.concatenate([[0.0], np.cumsum(y)])
    s2 = np.concatenate([[0.0], np.cumsum(y * y)])

    def cost(a: np.ndarray, b: int) -> np.ndarray:
        # sum of squared deviations of y[a:b] around its mean, vectorized in a
        m = b - a
        ss = s2[b] - s2[a]
        sm = s1[b] - s1[a]
        return ss - sm * sm / m

    F = np.full(n + 1, np.inf)
    F[0] = -beta
    prev = np.full(n + 1, -1, dtype=np.int64)
    # candidate set holds only ELIGIBLE starts (s <= t - min_size);
    # each iteration admits the start that just became eligible
    cand = [0]
    for t in range(min_size, n + 1):
        a = np.array(cand, dtype=np.int64)
        vals = F[a] + cost(a, t) + beta
        j = int(np.argmin(vals))
        F[t] = vals[j]
        prev[t] = a[j]
        # PELT prune: s stays viable only if F[s] + C(s,t) <= F[t]
        keep = F[a] + cost(a, t) <= F[t]
        cand = [int(s) for s, k in zip(a, keep) if k]
        nxt = t + 1 - min_size
        if nxt > 0 and np.isfinite(F[nxt]):
            cand.append(nxt)
    cps = []
    t = n
    while t > 0 and prev[t] >= 0:
        if prev[t] > 0:
            cps.append(int(prev[t]))
        t = int(prev[t])
    return sorted(cps)


def _excess_kurtosis(x: np.ndarray) -> float:
    """Pearson excess kurtosis; 0.0 for degenerate (constant) input."""
    x = np.asarray(x, dtype=np.float64)
    if len(x) < 4:
        return 0.0
    d = x - x.mean()
    v = float(np.mean(d * d))
    if v <= 1e-300:
        return 0.0
    return float(np.mean(d ** 4) / (v * v) - 3.0)


def roughness(x: np.ndarray) -> float:
    """Std of first differences — ASAP's smoothness objective."""
    x = np.asarray(x, dtype=np.float64)
    if len(x) < 3:
        return 0.0
    return float(np.std(np.diff(x)))


def sma_valid(x: np.ndarray, w: int) -> np.ndarray:
    """Simple moving average, valid mode (length ``len(x) - w + 1``),
    via the cumsum trick — O(n) regardless of ``w``."""
    x = np.asarray(x, dtype=np.float64)
    w = int(w)
    if w <= 1:
        return x.copy()
    c = np.concatenate(([0.0], np.cumsum(x)))
    return (c[w:] - c[:-w]) / w


def asap_window(
    x: np.ndarray,
    max_window: int | None = None,
    acf_peak_corr: float = 0.2,
    n_grid: int = 24,
) -> int:
    """ASAP automatic smoothing-window selection (Rong & Bailis,
    VLDB 2017 "ASAP: Prioritizing Attention via Time Series
    Smoothing" — the public algorithm, reimplemented from the paper):
    pick the moving-average window that MINIMIZES the roughness
    (std of first differences) of the smoothed series SUBJECT TO
    preserving kurtosis (kurt(smoothed) >= kurt(raw)), so spikes and
    anomalies survive the smoothing that kills noise.

    Candidate windows follow the paper's pruning: lags of significant
    ACF PEAKS (local maxima with corr >= ``acf_peak_corr``) — the
    natural periods, whose multiples give artifact-free seasonal
    averaging — plus a deterministic log-spaced grid so aperiodic
    series still search the full range. Returns 1 (no smoothing) when
    no candidate satisfies the kurtosis constraint.
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if n < 8:
        return 1
    if max_window is None:
        max_window = n // 4
    max_window = int(min(max(2, max_window), n // 2))
    ac = acf_fft(x, max_lag=max_window)
    # interior local maxima of the ACF above the significance bar
    interior = np.arange(2, len(ac) - 1)
    is_peak = (
        (ac[interior] >= ac[interior - 1])
        & (ac[interior] >= ac[interior + 1])
        & (ac[interior] >= acf_peak_corr)
    )
    cands = set(int(k) for k in interior[is_peak])
    grid = np.unique(
        np.geomspace(2, max_window, num=n_grid).astype(np.int64)
    )
    cands.update(int(g) for g in grid if 2 <= g <= max_window)
    k0 = _excess_kurtosis(x)
    best_w, best_r = 1, roughness(x)
    for w in sorted(cands):
        if w > n - 4:
            continue
        sm = sma_valid(x, w)
        if _excess_kurtosis(sm) < k0:
            continue
        r = roughness(sm)
        if r < best_r:
            best_w, best_r = w, r
    return best_w


def asap_smooth(
    x: np.ndarray, max_window: int | None = None
) -> tuple[np.ndarray, int]:
    """Smooth ``x`` with the ASAP-chosen window; returns the smoothed
    (valid-mode) series and the chosen window. Window 1 returns the
    input unchanged (already maximally informative)."""
    w = asap_window(x, max_window=max_window)
    return sma_valid(x, w), w


def hurst_rs(x: np.ndarray, min_chunk: int = 8) -> tuple[float, int]:
    """Rescaled-range (R/S) Hurst exponent estimate (Hurst 1951;
    Mandelbrot & Wallis 1969): for window sizes n on a dyadic ladder,
    average R/S over the disjoint windows of each size and fit
    ``log(R/S) ~ H * log(n)`` by least squares.

    R/S of a window: range of the mean-adjusted cumulative sum divided
    by the window standard deviation (ddof=0; zero-variance windows are
    skipped). Interpretation on the INCREMENT series: H ~ 0.5 for white
    noise, H -> 1 for strongly persistent series (e.g. the increments
    of a smooth trend), H < 0.5 for mean-reverting series.

    Vectorized: each ladder size reshapes the series into
    ``[n_windows, n]`` and computes all windows in one pass — no
    Python loop over windows. Returns ``(H, n_sizes_used)``;
    ``(nan, 0)`` when fewer than 2 ladder sizes are usable.
    """
    x = np.asarray(x, dtype=np.float64)
    x = x[np.isfinite(x)]
    n_total = len(x)
    if n_total < 2 * min_chunk:
        return float("nan"), 0
    sizes = []
    n = min_chunk
    while n <= n_total // 2:
        sizes.append(n)
        n *= 2
    log_n, log_rs = [], []
    for n in sizes:
        k = n_total // n
        w = x[: k * n].reshape(k, n)
        mean = w.mean(axis=1, keepdims=True)
        dev = np.cumsum(w - mean, axis=1)
        r = dev.max(axis=1) - dev.min(axis=1)
        s = w.std(axis=1)
        ok = s > 0
        if not ok.any():
            continue
        rs = (r[ok] / s[ok]).mean()
        if rs <= 0:
            continue
        log_n.append(np.log(n))
        log_rs.append(np.log(rs))
    if len(log_n) < 2:
        return float("nan"), len(log_n)
    ln = np.asarray(log_n)
    lr = np.asarray(log_rs)
    h = float(((ln - ln.mean()) * (lr - lr.mean())).sum() / ((ln - ln.mean()) ** 2).sum())
    return h, len(sizes)


def permutation_entropy(x: np.ndarray, m: int = 3) -> tuple[float, int]:
    """Normalized permutation entropy (Bandt & Pompe, PRL 2002) of
    order ``m=3``: the Shannon entropy of the ordinal-pattern
    distribution over sliding windows, divided by ln(m!) — 0 for
    monotone/deterministic order structure, -> 1 for iid noise.

    Vectorized: the 3! = 6 ordinal patterns are identified from three
    pairwise comparisons (ties broken by position, matching argsort's
    stable order), one boolean expression per window — no Python loop
    and no per-window argsort. Returns ``(pe, n_windows)``;
    ``(nan, 0)`` if fewer than 2 windows or any non-finite value
    inside the evaluated span.
    """
    if m != 3:
        raise NotImplementedError("order m=3 only (6-pattern vector path)")
    x = np.asarray(x, dtype=np.float64)
    n = len(x) - 2
    if n < 2:
        return float("nan"), 0
    a, b, c = x[:-2], x[1:-1], x[2:]
    if not (np.isfinite(a).all() and np.isfinite(b).all() and np.isfinite(c).all()):
        return float("nan"), 0
    # stable (value, position) order: position breaks ties, so "<=" on
    # the earlier element models argsort(kind='stable')
    ab = a <= b   # a precedes b in the sorted order
    bc = b <= c
    ac = a <= c
    # pattern code 0..5: enumeration of the 6 consistent outcomes
    code = (
        np.where(ab & bc, 0, 0)
        + np.where(ab & ~bc & ac, 1, 0)
        + np.where(ab & ~bc & ~ac, 2, 0)
        + np.where(~ab & bc & ac, 3, 0)
        + np.where(~ab & bc & ~ac, 4, 0)
        + np.where(~ab & ~bc, 5, 0)
    )
    counts = np.bincount(code, minlength=6).astype(np.float64)
    p = counts[counts > 0] / n
    h = -(p * np.log(p)).sum()
    return float(h / np.log(6.0)), int(n)
