"""FIXTURES.md §5: peak-bin and Parseval checks for Welch; Lomb-Scargle
agreement on irregular samples."""

import numpy as np

from spectral_time_series_ray.functions.patch import patchify, unpatchify
from spectral_time_series_ray.functions.spectral import (
    lomb_scargle,
    top_k_spectrum,
    welch_psd,
)


def test_welch_peak_bin():
    fs = 1.0 / 60.0  # one point per minute
    t = np.arange(4096) / fs  # seconds
    f0 = 1.0 / 3600.0  # hourly cycle
    x = np.sin(2 * np.pi * f0 * t)
    freqs, psd = welch_psd(x, fs=fs, nperseg=1024)
    assert abs(freqs[np.argmax(psd)] - f0) < fs / 1024


def test_welch_parseval():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(8192)
    freqs, psd = welch_psd(x, fs=1.0, nperseg=1024)
    df = freqs[1] - freqs[0]
    assert abs(psd.sum() * df - x.var()) / x.var() < 0.15


def test_welch_short_series():
    freqs, psd = welch_psd(np.array([1.0, 2.0, 3.0]), nperseg=256)
    assert len(freqs) == len(psd) == 2  # nperseg falls back to len=3 -> 2 bins


def test_lomb_scargle_peak_regular_matches():
    rng = np.random.default_rng(1)
    f0 = 0.05
    t_reg = np.arange(512, dtype=float)
    y_reg = np.sin(2 * np.pi * f0 * t_reg)
    freqs = np.linspace(0.005, 0.2, 400)
    p_reg = lomb_scargle(t_reg, y_reg, freqs)
    assert abs(freqs[np.argmax(p_reg)] - f0) < 0.003
    # irregular sampling of the same signal -> same peak
    t_irr = np.sort(rng.uniform(0, 512, 300))
    y_irr = np.sin(2 * np.pi * f0 * t_irr)
    p_irr = lomb_scargle(t_irr, y_irr, freqs)
    assert abs(freqs[np.argmax(p_irr)] - f0) < 0.003


def test_lomb_scargle_normalized_peak_near_one_half_n():
    # for a pure sinusoid, normalized LS peak ~ N/2 / var-normalized ~ N/2*2/N
    t = np.arange(256, dtype=float)
    y = np.sin(2 * np.pi * 0.1 * t)
    p = lomb_scargle(t, y, np.array([0.1]), normalize=True)
    assert p[0] > 50  # sharply significant


def test_top_k_spectrum():
    freqs = np.array([0.0, 0.1, 0.2, 0.3, 0.4])
    power = np.array([99.0, 5.0, 1.0, 7.0, 3.0])
    f, p = top_k_spectrum(freqs, power, k=2)
    np.testing.assert_array_equal(f, [0.1, 0.3])  # DC excluded, freq-ordered
    np.testing.assert_array_equal(p, [5.0, 7.0])


def test_patchify_roundtrip():
    x = np.arange(10, dtype=float)
    p = patchify(x, 4)
    assert p.shape == (3, 4)
    assert np.isnan(p[2, 2:]).all()
    np.testing.assert_array_equal(unpatchify(p, 10), x)


def test_patchify_empty():
    assert patchify(np.array([]), 4).shape == (0, 4)


def test_stft_mean_equals_welch():
    from spectral_time_series_ray.functions.spectral import stft_spectrogram, welch_psd

    rng = np.random.default_rng(9)
    x = rng.normal(size=512) + np.sin(2 * np.pi * 0.125 * np.arange(512))
    f_w, p_w = welch_psd(x, nperseg=64)
    _, f_s, p = stft_spectrogram(x, nperseg=64)
    np.testing.assert_allclose(f_s, f_w, atol=0)
    np.testing.assert_allclose(p.mean(axis=0), p_w, rtol=1e-12)


def test_stft_chirp_tracks_frequency():
    from spectral_time_series_ray.functions.spectral import stft_spectrogram

    n = 1024
    k = np.arange(n)
    f_lo, f_hi = 4 / 64, 12 / 64
    x = np.where(k < n // 2, np.sin(2 * np.pi * f_lo * k), np.sin(2 * np.pi * f_hi * k))
    _, freqs, p = stft_spectrogram(x, nperseg=64)
    dom = freqs[1 + np.argmax(p[:, 1:], axis=1)]
    assert np.allclose(dom[:4], f_lo)
    assert np.allclose(dom[-4:], f_hi)


def test_stft_too_short_raises():
    import pytest as _pytest

    from spectral_time_series_ray.functions.spectral import stft_spectrogram

    with _pytest.raises(ValueError):
        stft_spectrogram(np.ones(10), nperseg=64)
