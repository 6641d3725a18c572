"""Spectral estimation kernels: Welch periodogram and Lomb-Scargle.

Fills the reference's declared-but-unimplemented downsampling slots
(`uni2ts/src/uni2ts/transform/resample.py:70-93` — `Subsample`,
`GaussianFilterSubsample`, `Downsample`, `Upsample` all have empty
bodies). Implemented from the public formulas:

- Welch (1967): averaged modified periodograms over overlapping
  Hann-windowed segments — for REGULAR series (post-rollup grids).
- Lomb (1976) / Scargle (1982): least-squares spectral estimate with
  the per-frequency time offset tau — for IRREGULAR series (raw
  inter-turn-interval events, which are not on a grid).

Both are plain numpy and vectorized over the frequency axis, intended
to run inside actor-pool ``map_batches`` stages (one series per group).

Spectral *downsampling* = keep the top-k spectral bins (frequency,
power, phase where applicable) per series — a lossy fixed-size summary
of each conversation's rhythm.
"""

from __future__ import annotations

import numpy as np


def hann(n: int) -> np.ndarray:
    if n == 1:
        return np.ones(1)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / (n - 1))


def welch_psd(
    x: np.ndarray,
    fs: float = 1.0,
    nperseg: int = 256,
    noverlap: int | None = None,
    detrend: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """One-sided Welch PSD estimate. Returns (freqs, psd).

    Density scaling: sum(psd) * df ~= variance (Parseval check in
    tests). Segments shorter than nperseg fall back to a single
    full-length periodogram.
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if n == 0:
        return np.array([]), np.array([])
    nperseg = int(min(nperseg, n))
    if noverlap is None:
        noverlap = nperseg // 2
    noverlap = int(min(noverlap, nperseg - 1))
    step = nperseg - noverlap
    win = hann(nperseg)
    scale = 1.0 / (fs * (win * win).sum())
    nseg = max(1, (n - noverlap) // step)
    nfreq = nperseg // 2 + 1
    acc = np.zeros(nfreq)
    for s in range(nseg):
        seg = x[s * step : s * step + nperseg]
        if detrend:
            seg = seg - seg.mean()
        spec = np.fft.rfft(seg * win)
        p = (spec.real**2 + spec.imag**2) * scale
        # one-sided: double everything but DC (and Nyquist when nperseg even)
        if nperseg % 2 == 0:
            p[1:-1] *= 2.0
        else:
            p[1:] *= 2.0
        acc += p
    freqs = np.fft.rfftfreq(nperseg, d=1.0 / fs)
    return freqs, acc / nseg


def lomb_scargle(
    t: np.ndarray,
    y: np.ndarray,
    freqs: np.ndarray,
    normalize: bool = False,
) -> np.ndarray:
    """Lomb-Scargle periodogram at the given ordinary frequencies (Hz).

    Classic Scargle (1982) form with the tau phase offset; vectorized
    over the frequency grid (O(n_freq * n_points) numpy broadcasting).
    """
    t = np.asarray(t, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    freqs = np.asarray(freqs, dtype=np.float64)
    if len(t) < 2 or len(freqs) == 0:
        return np.zeros(len(freqs))
    yc = y - y.mean()
    omega = 2.0 * np.pi * freqs[:, None]  # [F, 1]
    wt = omega * t[None, :]  # [F, N]
    # ONE sin/cos pair of [F, N] transcendentals serves everything:
    # sin(2wt) = 2 s0 c0 and cos(2wt) = c0^2 - s0^2 (double angle) for
    # the tau fit, then cos(wt - w tau) = c0 cos(w tau) + s0 sin(w tau)
    # (angle addition, only F extra transcendentals) — measured ~2x on
    # the 2048x128 chunk vs evaluating sin/cos of 2wt and arg directly.
    s0, c0 = np.sin(wt), np.cos(wt)
    sin2 = 2.0 * (s0 * c0)
    cos2 = (c0 - s0) * (c0 + s0)
    tau = np.arctan2(sin2.sum(axis=1), cos2.sum(axis=1)) / (
        2.0 * np.maximum(omega[:, 0], 1e-300)
    )
    wtau = omega[:, 0] * tau  # [F]
    cwt, swt = np.cos(wtau)[:, None], np.sin(wtau)[:, None]
    c = c0 * cwt + s0 * swt
    s = s0 * cwt - c0 * swt
    cc = (c * c).sum(axis=1)
    ss = (s * s).sum(axis=1)
    yc_c = (yc[None, :] * c).sum(axis=1)
    yc_s = (yc[None, :] * s).sum(axis=1)
    p = 0.5 * (yc_c**2 / np.maximum(cc, 1e-300) + yc_s**2 / np.maximum(ss, 1e-300))
    if normalize:
        var = yc.var()
        if var > 0:
            p = p / var
    return p


def top_k_spectrum(
    freqs: np.ndarray, power: np.ndarray, k: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """Keep the k highest-power non-DC bins, ordered by frequency —
    the fixed-size downsample summary emitted per series."""
    if len(freqs) == 0:
        return freqs, power
    mask = freqs > 0
    f, p = freqs[mask], power[mask]
    if len(f) > k:
        idx = np.argpartition(p, -k)[-k:]
        idx = idx[np.argsort(f[idx])]
        f, p = f[idx], p[idx]
    return f, p


def stft_spectrogram(
    x: np.ndarray,
    fs: float = 1.0,
    nperseg: int = 64,
    noverlap: int | None = None,
    detrend: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Short-time Fourier transform power spectrogram: the per-FRAME
    view of the same Hann-windowed modified periodogram Welch averages
    — Welch == ``stft_spectrogram(...)[2].mean(axis=0)`` up to the
    shared segmenting, which the tests assert.  Time-frequency
    resolution is the standard STFT trade (Allen 1977).

    Returns ``(frame_times, freqs, power [frames, bins])`` one-sided.
    """
    x = np.asarray(x, dtype=np.float64)
    if noverlap is None:
        noverlap = nperseg // 2
    step = nperseg - noverlap
    n = len(x)
    if n < nperseg:
        raise ValueError(f"need at least nperseg={nperseg} points, got {n}")
    n_frames = 1 + (n - nperseg) // step
    idx = np.arange(nperseg)[None, :] + step * np.arange(n_frames)[:, None]
    frames = x[idx]
    if detrend:
        frames = frames - frames.mean(axis=1, keepdims=True)
    w = hann(nperseg)
    spec = np.fft.rfft(frames * w[None, :], axis=1)
    # one-sided modified-periodogram scaling (matches welch_psd)
    scale = 1.0 / (fs * (w * w).sum())
    p = (spec.real**2 + spec.imag**2) * scale
    if nperseg % 2 == 0:
        p[:, 1:-1] *= 2.0
    else:
        p[:, 1:] *= 2.0
    freqs = np.fft.rfftfreq(nperseg, d=1.0 / fs)
    frame_times = (np.arange(n_frames) * step + nperseg / 2.0) / fs
    return frame_times, freqs, p
