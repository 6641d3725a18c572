"""Boundary tests for the bounded Fisher exact test
(functions/fisher.py): the exact-rational path and the lgamma-window
path must agree to 1e-10 on the SAME table when the cutoff is forced
to either side of the support size, and the window path's self-checks
must hold on large margins where the exact path is infeasible."""

import numpy as np
import pytest

from spectral_time_series_ray.functions.fisher import fisher_exact_p


CASES = [
    (40, 60, 12, 30),       # small, interior
    (500, 480, 120, 100),   # mid, support ~ 221
    (37, 53, 0, 21),        # observed at the support edge
    (25, 25, 10, 10),       # balanced / modal table
    (1000, 1000, 250, 300), # support ~ 551
]


@pytest.mark.parametrize("n_a,n_b,c_a,c_b", CASES)
def test_exact_vs_window_at_boundary(n_a, n_b, c_a, c_b):
    K = c_a + c_b
    lo, hi = max(0, K - n_b), min(K, n_a)
    support = hi - lo + 1
    # force each path on the identical table
    p2e, p1e, ok_e, m_e = fisher_exact_p(n_a, n_b, c_a, c_b, cutoff=support)
    p2w, p1w, ok_w, m_w = fisher_exact_p(n_a, n_b, c_a, c_b, cutoff=support - 1)
    assert m_e == "exact-rational" and m_w == "lgamma-window"
    assert ok_e and ok_w
    assert abs(p2e - p2w) < 1e-10
    assert abs(p1e - p1w) < 1e-10


def test_window_path_large_margins():
    # support ~ 2e6 tables: the exact big-int path would be a driver
    # scale-killer; the window path must stay O(sqrt(N)) and sane.
    p2, p1, ok, method = fisher_exact_p(5_000_000, 5_000_000, 2_000_000, 2_001_000)
    assert method == "lgamma-window"
    assert ok
    assert 0.0 < p2 <= 1.0 and p1 <= p2 + 1e-12
    # the imbalance is ~1000/2e6 with sigma ~ 866: z ~ 0.8 -> p well
    # inside (0.1, 1); a gross approximation error would leave this band
    assert 0.1 < p2 < 1.0


def test_window_observed_outside_window():
    # an extreme observed table (far outside mean +/- 40 sigma) must
    # yield a positive, tiny p from the direct lgamma evaluation
    p2, p1, ok, method = fisher_exact_p(20_000, 20_000, 9_000, 1_000, cutoff=10)
    assert method == "lgamma-window"
    assert 0.0 < p2 < 1e-300
    assert 0.0 < p1 <= p2


def test_exact_known_value():
    # canonical tea-tasting table (Fisher 1935): 2x2 [[3,1],[1,3]]
    # margins: n_a = 4 (row A), n_b = 4, c_a = 3, c_b = 1
    p2, p1, ok, method = fisher_exact_p(4, 4, 3, 1)
    assert method == "exact-rational" and ok
    assert abs(p1 - 0.242857142857) < 1e-9  # 17/70
    assert abs(p2 - 0.485714285714) < 1e-9  # 34/70
