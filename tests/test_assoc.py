"""Brute-force cross-checks for the bounded-histogram Kendall kernel."""

import numpy as np

from spectral_time_series_ray.functions.assoc import kendall_from_joint, tau_b


def brute_pairs(x, y):
    conc = disc = 0
    n = len(x)
    for i in range(n):
        for j in range(i + 1, n):
            dx = np.sign(x[j] - x[i])
            dy = np.sign(y[j] - y[i])
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
    return conc, disc


def joint(x, y):
    xs = np.unique(x)
    ys = np.unique(y)
    H = np.zeros((len(xs), len(ys)), np.int64)
    np.add.at(H, (np.searchsorted(xs, x), np.searchsorted(ys, y)), 1)
    return H


def test_kendall_matches_bruteforce_random():
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(2, 60))
        x = rng.integers(0, 5, n)
        y = rng.integers(0, 7, n)
        conc, disc, nn, n1, n2 = kendall_from_joint(joint(x, y))
        bc, bd = brute_pairs(x, y)
        assert (conc, disc, nn) == (bc, bd, n)
        # tie terms: recount directly
        assert n1 == sum(c * (c - 1) // 2 for c in np.bincount(x))
        assert n2 == sum(c * (c - 1) // 2 for c in np.bincount(y))


def test_tau_b_perfect_orders():
    x = np.arange(10)
    H = joint(x, x)
    assert tau_b(*kendall_from_joint(H)) == 1.0
    H = joint(x, -x)
    assert tau_b(*kendall_from_joint(H)) == -1.0


def test_tau_b_matches_scipy_formula_with_ties():
    rng = np.random.default_rng(11)
    x = rng.integers(0, 4, 200)
    y = (x + rng.integers(0, 3, 200)) % 5
    conc, disc, n, n1, n2 = kendall_from_joint(joint(x, y))
    n0 = n * (n - 1) // 2
    expected = (conc - disc) / np.sqrt((n0 - n1) * (n0 - n2))
    assert abs(tau_b(conc, disc, n, n1, n2) - expected) < 1e-12
