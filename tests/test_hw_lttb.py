"""Kernel tests for additive Holt-Winters and LTTB downsampling."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spectral_time_series_ray.functions.resample import lttb_indices
from spectral_time_series_ray.functions.tsanalysis import holt_winters_scan


def test_holt_winters_exact_on_noise_free_seasonal():
    m, T, H = 12, 96, 24
    t = np.arange(T)
    ssn = np.array([3, -1, 2, 0, -4, 1, 2, -2, 0, 1, -1, -1], dtype=float)
    x = 5.0 + 0.25 * t + ssn[t % m]
    level, trend, fitted, fc = holt_winters_scan(x[None, :], period=m, horizon=H)
    h = np.arange(1, H + 1)
    expected = 5.0 + 0.25 * (T - 1 + h) + ssn[(T - 1 + h) % m]
    assert np.abs(fc[0] - expected).max() < 1e-9
    assert np.abs(fitted[0, 1:] - x[1:]).max() < 1e-9
    assert abs(trend[0, -1] - 0.25) < 1e-9


def test_holt_winters_batched_matches_single():
    rng = np.random.default_rng(5)
    m = 8
    xs = rng.normal(size=(6, 5 * m)).cumsum(axis=1)
    lv_b, tr_b, fit_b, fc_b = holt_winters_scan(xs, period=m, horizon=4)
    for i in range(6):
        lv, tr, fit, fc = holt_winters_scan(xs[i][None, :], period=m, horizon=4)
        np.testing.assert_allclose(lv[0], lv_b[i], atol=1e-12)
        np.testing.assert_allclose(fc[0], fc_b[i], atol=1e-12)


def test_holt_winters_input_validation():
    with pytest.raises(ValueError):
        holt_winters_scan(np.ones((1, 10)), period=12)  # T < 2m
    with pytest.raises(ValueError):
        holt_winters_scan(np.array([[1.0, np.nan] * 12]), period=6)  # NaN


@given(
    st.integers(min_value=3, max_value=60),
    st.integers(min_value=3, max_value=300),
    st.integers(min_value=0, max_value=1000),
)
@settings(max_examples=150, deadline=None)
def test_lttb_invariants(k, n, seed):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 100, n))
    v = rng.normal(size=n)
    idx = lttb_indices(t, v, k)
    assert idx[0] == 0 and idx[-1] == n - 1
    assert (np.diff(idx) > 0).all()
    assert len(idx) == min(k, n)


def test_lttb_keeps_spike():
    n = 500
    v = np.zeros(n)
    v[313] = 100.0
    idx = lttb_indices(np.arange(n, dtype=float), v, 20)
    assert 313 in idx  # the spike dominates its bucket's triangle area


def test_lttb_small_inputs_passthrough():
    t = np.array([0.0, 1.0])
    v = np.array([5.0, 6.0])
    np.testing.assert_array_equal(lttb_indices(t, v, 10), [0, 1])
