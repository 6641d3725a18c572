"""Property-based tests for the fuzzy-join and skyline kernels.
Pure-numpy — no Ray session needed."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from spectral_time_series_ray.functions.editdist import (
    deletion_keys,
    ed_leq1_verify,
)
from spectral_time_series_ray.stages.skyline import pareto_mask


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


_word = st.text(alphabet="ab1#", min_size=0, max_size=10)


@settings(max_examples=300, deadline=None)
@given(a=_word, b=_word)
def test_ed_verify_matches_levenshtein(a, b):
    got = bool(ed_leq1_verify([a], [b])[0])
    assert got == (_lev(a, b) <= 1)


@settings(max_examples=100, deadline=None)
@given(
    base=st.text(alphabet="abc", min_size=1, max_size=8),
    pos=st.integers(0, 8),
    ins=st.sampled_from("abcx"),
)
def test_every_single_edit_shares_a_deletion_key(base, pos, ins):
    """Any single insert/delete/substitute neighbor of ``base`` must
    land in a shared deletion-key bucket (blocking completeness)."""
    pos = min(pos, len(base))
    variants = {
        base[:pos] + ins + base[pos:],                       # insert
        (base[:pos] + base[pos + 1:]) if pos < len(base) else base,  # delete
        (base[:pos] + ins + base[pos + 1:]) if pos < len(base) else base,  # sub
    }
    variants.discard(base)
    for v in variants:
        idx, keys = deletion_keys([base, v])
        k0 = set(keys[idx == 0].tolist())
        k1 = set(keys[idx == 1].tolist())
        assert k0 & k1, (base, v)


@settings(max_examples=150, deadline=None)
@given(
    n=st.integers(0, 80),
    gridx=st.integers(1, 12),
    gridy=st.integers(1, 12),
    seed=st.integers(0, 10_000),
)
def test_pareto_mask_is_exactly_the_undominated_set(n, gridx, gridy, seed):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, gridx, n).astype(np.float64)
    y = rng.integers(0, gridy, n).astype(np.float64)
    keep = pareto_mask(x, y)
    # survivors: undominated; dropped: dominated by some survivor
    for i in range(n):
        dominated = bool(np.any(
            (x >= x[i]) & (y >= y[i]) & ((x > x[i]) | (y > y[i]))
        ))
        assert keep[i] == (not dominated)


@settings(max_examples=80, deadline=None)
@given(
    n=st.integers(0, 60),
    m=st.integers(0, 60),
    seed=st.integers(0, 10_000),
)
def test_pareto_merge_algebra(n, m, seed):
    rng = np.random.default_rng(seed)
    xa, ya = rng.integers(0, 9, n).astype(float), rng.integers(0, 9, n).astype(float)
    xb, yb = rng.integers(0, 9, m).astype(float), rng.integers(0, 9, m).astype(float)
    ka, kb = pareto_mask(xa, ya), pareto_mask(xb, yb)
    xu, yu = np.concatenate([xa[ka], xb[kb]]), np.concatenate([ya[ka], yb[kb]])
    km = pareto_mask(xu, yu)
    xd, yd = np.concatenate([xa, xb]), np.concatenate([ya, yb])
    kd = pareto_mask(xd, yd)
    assert sorted(zip(xu[km], yu[km])) == sorted(zip(xd[kd], yd[kd]))
