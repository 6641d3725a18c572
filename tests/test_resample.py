"""Resample kernel tests: the reference declares Subsample /
GaussianFilterSubsample / Upsample as empty stubs (resample.py:70-93);
these verify our real implementations' analytic properties."""

import numpy as np
import pandas as pd

from spectral_time_series_ray.functions.resample import (
    gaussian_filter,
    gaussian_kernel,
    gaussian_subsample,
    subsample,
    upsample_linear,
)


def test_kernel_normalized_and_constant_preserved():
    k = gaussian_kernel(2.0)
    assert abs(k.sum() - 1.0) < 1e-12
    c = np.full(100, 7.25)
    np.testing.assert_allclose(gaussian_filter(c, 3.0), c, atol=1e-12)
    np.testing.assert_allclose(gaussian_subsample(c, 4), c[::4], atol=1e-12)


def test_antialias_attenuates_folding_tone():
    """A tone ABOVE the post-decimation Nyquist folds at full power
    under plain subsample but is attenuated by the Gaussian path; a
    low tone survives both."""
    n, factor = 4096, 4
    t = np.arange(n)
    low = np.sin(2 * np.pi * t / 64)          # stays below new Nyquist
    high = np.sin(2 * np.pi * t * 0.45)       # above new Nyquist (0.125)
    plain_hi = subsample(high, factor)
    gauss_hi = gaussian_subsample(high, factor)
    assert gauss_hi.var() < 0.05 * plain_hi.var()  # folding suppressed
    gauss_lo = gaussian_subsample(low, factor)
    assert gauss_lo.var() > 0.5 * subsample(low, factor).var()  # low passes


def test_upsample_linear_properties():
    v = np.array([1.0, 3.0, 2.0, 4.0])
    up = upsample_linear(v, 2)
    assert len(up) == 7
    np.testing.assert_allclose(up[::2], v)          # knots preserved
    np.testing.assert_allclose(up[1], 2.0)          # midpoints interpolated
    # subsample(upsample) == identity
    np.testing.assert_allclose(subsample(up, 2), v)
    # a linear ramp stays exactly linear
    ramp = np.arange(10, dtype=float)
    np.testing.assert_allclose(np.diff(upsample_linear(ramp, 4)), 0.25)


def test_short_series_and_factor_one():
    np.testing.assert_allclose(gaussian_subsample([5.0], 4), [5.0])
    v = np.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(gaussian_subsample(v, 1), v)
    np.testing.assert_allclose(upsample_linear(v, 1), v)


def test_resample_series_stage(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.downsample import resample_series

    n = 256
    rows = [{
        "conv_id": "a", "chunk_idx": 0, "n_points": n,
        "ts": np.arange(n, dtype=np.int64) * 60_000_000,
        "values": np.sin(2 * np.pi * np.arange(n) / 32),
    }]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    down = resample_series(ds, factor=4, mode="gaussian").to_pandas()
    assert down["n_points"].iloc[0] == n // 4
    assert len(np.asarray(down["ts"].iloc[0])) == n // 4
    # grid step scaled by factor
    assert np.diff(np.asarray(down["ts"].iloc[0]))[0] == 240_000_000
    up = resample_series(ds, factor=2, mode="upsample").to_pandas()
    assert up["n_points"].iloc[0] == (n - 1) * 2 + 1
    # upsampled grid step halves
    assert np.diff(np.asarray(up["ts"].iloc[0]))[0] == 30_000_000
