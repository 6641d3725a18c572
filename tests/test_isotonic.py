"""PAVA vs GCM-hull agreement + KKT properties of the isotonic fit."""

import numpy as np

from spectral_time_series_ray.functions.isotonic import gcm_fit, pava


def brute_isotonic(y, w):
    """O(n^2) max-min formula: yhat_i = max_{a<=i} min_{b>=i} mean(y[a..b])."""
    n = len(y)
    out = np.empty(n)
    for i in range(n):
        best = -np.inf
        for a in range(i + 1):
            m = np.inf
            for b in range(i, n):
                seg = slice(a, b + 1)
                m = min(m, np.average(y[seg], weights=w[seg]))
            best = max(best, m)
        out[i] = best
    return out


def test_pava_equals_gcm_and_bruteforce():
    rng = np.random.default_rng(3)
    for _ in range(15):
        n = int(rng.integers(1, 25))
        y = rng.integers(0, 20, n).astype(float)
        w = rng.integers(1, 5, n).astype(float)
        f1 = pava(y, w)
        f2 = gcm_fit(y, w)
        assert np.array_equal(f1, f2), (y, w)
        assert np.allclose(f1, brute_isotonic(y, w), atol=1e-9)


def test_pava_properties():
    rng = np.random.default_rng(9)
    y = rng.integers(0, 100, 500).astype(float)
    w = rng.integers(1, 10, 500).astype(float)
    f = pava(y, w)
    # monotone
    assert (np.diff(f) >= 0).all()
    # weighted mean preserved exactly (integer sums)
    assert (w * f).sum() == (w * y).sum()
    # idempotent up to float pooling of already-equal block means
    # (block values are rounded divisions, so re-accumulated w*f can
    # compare an ulp apart and re-pool equal blocks)
    assert np.allclose(pava(f, w), f, rtol=0, atol=1e-9)
    # already-monotone input is a fixed point
    ym = np.sort(y)
    assert np.array_equal(pava(ym, w), ym)


def test_pava_empty_and_single():
    assert len(pava(np.array([]))) == 0
    assert pava(np.array([5.0]))[0] == 5.0
    assert gcm_fit(np.array([5.0]))[0] == 5.0
