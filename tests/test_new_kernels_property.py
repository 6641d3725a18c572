"""Property-based tests for the round-3 part-11 kernels: PAA/SAX,
Kleinberg bursts, PELT, Kalman. Pure-numpy — no Ray session needed."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from spectral_time_series_ray.functions.tsanalysis import (
    kalman_local_level,
    kleinberg_bursts,
    paa,
    pelt_mean_changepoints,
    sax_mindist,
    sax_word,
)


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(5, 200),
    w=st.integers(1, 20),
    seed=st.integers(0, 10_000),
)
def test_paa_mass_conservation_any_shape(n, w, seed):
    x = np.random.default_rng(seed).normal(size=n)
    p = paa(x, w)
    assert len(p) == w
    if w <= n:
        # continuous-time step-function segmentation conserves the mean
        assert abs(p.mean() - x.mean()) < 1e-9


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10_000), a=st.integers(2, 8))
def test_sax_mindist_lower_bound_property(seed, a):
    rng = np.random.default_rng(seed)
    x, y = rng.normal(size=48), rng.normal(size=48)
    wx, _ = sax_word(x, 8, a)
    wy, _ = sax_word(y, 8, a)
    zx = (x - x.mean()) / x.std()
    zy = (y - y.mean()) / y.std()
    assert sax_mindist(wx, wy, 48, a) <= np.linalg.norm(zx - zy) + 1e-9


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 10_000), n=st.integers(5, 80))
def test_kleinberg_states_valid_and_deterministic(seed, n):
    gaps = np.random.default_rng(seed).exponential(10, n)
    s1, b1 = kleinberg_bursts(gaps, s=3.0)
    s2, b2 = kleinberg_bursts(gaps, s=3.0)
    assert np.array_equal(s1, s2) and b1 == b2
    assert set(np.unique(s1)) <= {0, 1}
    # intervals exactly tile the state-1 region
    assert sum(e - b for b, e in b1) == int(s1.sum())


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_pelt_optimality_vs_exact_dp(seed):
    rng = np.random.default_rng(seed)
    y = np.concatenate([
        rng.normal(0, 1, 20),
        rng.normal(rng.uniform(-3, 3), 1, 20),
        rng.normal(rng.uniform(-3, 3), 1, 15),
    ])
    beta = 2 * np.log(len(y))
    got = pelt_mean_changepoints(y, beta=beta)

    n = len(y)
    s1 = np.concatenate([[0.0], np.cumsum(y)])
    s2 = np.concatenate([[0.0], np.cumsum(y * y)])

    def cost(a, b):
        m = b - a
        return s2[b] - s2[a] - (s1[b] - s1[a]) ** 2 / m

    F = np.full(n + 1, np.inf)
    F[0] = -beta
    prev = np.full(n + 1, -1, int)
    for t in range(2, n + 1):
        for s in range(0, t - 1):
            if np.isfinite(F[s]):
                v = F[s] + cost(s, t) + beta
                if v < F[t]:
                    F[t], prev[t] = v, s
    exp, t = [], n
    while t > 0 and prev[t] >= 0:
        if prev[t] > 0:
            exp.append(prev[t])
        t = prev[t]
    assert got == sorted(exp)


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 10_000), n=st.integers(5, 60))
def test_kalman_smoother_equals_gp_posterior(seed, n):
    rng = np.random.default_rng(seed)
    q, r = float(rng.uniform(0.1, 2)), float(rng.uniform(0.5, 4))
    y = 3 + np.cumsum(rng.normal(0, np.sqrt(q), n)) + rng.normal(0, np.sqrt(r), n)
    p0, mu0 = 1e6, float(y[0])
    idx = np.arange(n)
    C = p0 + q * np.minimum.outer(idx, idx)
    post = mu0 + C @ np.linalg.solve(C + r * np.eye(n), y - mu0)
    _, ms, ps = kalman_local_level(y, q, r, mu0=mu0, p0=p0)
    assert np.abs(ms - post).max() < 1e-6
    assert (ps >= -1e-12).all()


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 3000),
    k=st.integers(16, 256),
    shards=st.integers(1, 6),
    seed=st.integers(0, 10_000),
)
def test_kmv_merge_equals_whole_stream(n, k, shards, seed):
    from spectral_time_series_ray.functions.sketch import KMVSketch

    rng = np.random.default_rng(seed)
    items = [f"it-{i}" for i in rng.integers(0, n * 2, size=n)]
    whole = KMVSketch(k=k).add_strings(items)
    acc = KMVSketch(k=k)
    for s in range(shards):
        acc.merge(KMVSketch(k=k).add_strings(items[s::shards]))
    assert np.array_equal(acc.values, whole.values)
    n_distinct = len(set(items))
    if n_distinct < k:
        assert whole.estimate() == float(n_distinct)  # exact below capacity
    # intersection is symmetric and self-intersection ~= cardinality
    other = KMVSketch(k=k).add_strings(items[: max(1, n // 2)])
    a = KMVSketch.intersection(whole, other)
    b = KMVSketch.intersection(other, whole)
    assert a == b
    self_est = KMVSketch.intersection(whole, whole)
    assert self_est > 0


@settings(max_examples=40, deadline=None)
@given(
    n_words=st.integers(1, 300),
    vocab=st.integers(1, 40),
    seed=st.integers(0, 10_000),
)
def test_gopher_rules_invariants(n_words, vocab, seed):
    import pandas as pd

    from spectral_time_series_ray.stages.text import GopherRules

    rng = np.random.default_rng(seed)
    words = [f"w{int(i)}" for i in rng.integers(0, vocab, size=n_words)]
    batch = pd.DataFrame({"doc_id": [1], "text": [" ".join(words)]})
    out = GopherRules()(batch).iloc[0]
    assert out["n_words"] == n_words
    assert 0.0 <= out["frac_dup_words"] < 1.0
    assert out["top_word_frac"] >= 1.0 / n_words - 1e-12
    assert out["top_word_frac"] <= 1.0
    assert out["frac_dup_words"] == 1.0 - len(set(words)) / n_words
    assert out["mean_word_len"] == np.mean([len(w) for w in words])
    assert 0 <= out["n_stop"] <= 10


# ------------------------------------------------------ hurst R/S


def test_hurst_rs_separates_memory_classes():
    from spectral_time_series_ray.functions.tsanalysis import hurst_rs

    rng = np.random.default_rng(5)
    wn = rng.normal(0, 1, 4096)
    h_wn, k_wn = hurst_rs(wn)
    h_rw, _ = hurst_rs(np.cumsum(wn))
    alt = np.where(np.arange(4096) % 2 == 0, 1.0, -1.0) + 0.1 * rng.normal(size=4096)
    h_alt, _ = hurst_rs(alt)
    assert 0.40 < h_wn < 0.72  # Anis-Lloyd small-sample bias keeps it > 0.5
    assert h_rw > 0.9
    assert h_alt < 0.35
    assert k_wn >= 5  # dyadic ladder actually used several sizes


def test_hurst_rs_degenerate_inputs():
    import math

    from spectral_time_series_ray.functions.tsanalysis import hurst_rs

    h, k = hurst_rs(np.ones(4))  # too short
    assert math.isnan(h) and k == 0
    h, k = hurst_rs(np.ones(1024))  # zero variance everywhere
    assert math.isnan(h)
    # NaNs are dropped, not propagated
    x = np.random.default_rng(1).normal(0, 1, 2048)
    x[::7] = np.nan
    h, _ = hurst_rs(x)
    assert 0.3 < h < 0.8


def test_hurst_rs_affine_invariance():
    from spectral_time_series_ray.functions.tsanalysis import hurst_rs

    x = np.random.default_rng(9).normal(0, 1, 2048)
    h1, _ = hurst_rs(x)
    h2, _ = hurst_rs(5.0 + 3.0 * x)  # R/S is scale- and shift-free
    assert abs(h1 - h2) < 1e-12


# ------------------------------------------- two-sample test kernels


def test_mannwhitney_histogram_rank_sum_matches_bruteforce():
    """The collapsed cent-histogram rank sum (2*R1 = sum n1*(2*cprev+t+1))
    must equal the classical average-rank R1 computed per observation."""
    rng = np.random.default_rng(3)
    a = rng.integers(0, 50, 300)  # heavy ties
    b = rng.integers(10, 60, 400)
    allv = np.concatenate([a, b])
    order = np.argsort(allv, kind="stable")
    ranks = np.empty(len(allv), dtype=np.float64)
    sv = allv[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # average rank, 1-based
        i = j
    r1_brute = ranks[: len(a)].sum()

    vals, idx = np.unique(allv, return_inverse=True)
    n1 = np.bincount(idx[: len(a)], minlength=len(vals)).astype(np.int64)
    t = np.bincount(idx, minlength=len(vals)).astype(np.int64)
    cprev = np.concatenate([[0], np.cumsum(t)[:-1]])
    r1x2 = int((n1 * (2 * cprev + t + 1)).sum())
    assert r1x2 == int(round(2 * r1_brute))


def test_chi2_closed_form_equals_textbook():
    """N*(sum o^2/(r*c) - 1) over observed cells == sum (o-e)^2/e over
    ALL cells including structural zeros."""
    rng = np.random.default_rng(7)
    obs = rng.integers(0, 30, (5, 8)).astype(np.float64)
    obs[1, 3] = 0  # structural zero cell
    n = obs.sum()
    r = obs.sum(axis=1, keepdims=True)
    c = obs.sum(axis=0, keepdims=True)
    e = r * c / n
    chi2_textbook = ((obs - e) ** 2 / e).sum()
    mask = obs > 0
    rr = np.broadcast_to(r, obs.shape)[mask]
    cc = np.broadcast_to(c, obs.shape)[mask]
    chi2_closed = n * ((obs[mask] ** 2 / (rr * cc)).sum() - 1.0)
    assert abs(chi2_textbook - chi2_closed) < 1e-9


def test_entropy_identity():
    """H = ln(n) - sum(c ln c)/n equals -sum(p ln p)."""
    c = np.array([5, 3, 9, 1], dtype=np.float64)
    n = c.sum()
    p = c / n
    h_direct = -(p * np.log(p)).sum()
    h_id = np.log(n) - (c * np.log(c)).sum() / n
    assert abs(h_direct - h_id) < 1e-12


def test_histogram_bin_rule_covers_range():
    """bin = (cents-cmin)*k // span maps cmin -> 0, cmax -> k-1 and is
    monotone with equal-width cells (within integer granularity)."""
    cmin, cmax, k = -250, 9937, 20
    cents = np.arange(cmin, cmax + 1)
    b = (cents - cmin) * k // (cmax - cmin + 1)
    assert b[0] == 0 and b[-1] == k - 1
    assert np.all(np.diff(b) >= 0)
    widths = np.bincount(b)
    assert widths.max() - widths.min() <= 1


# --------------------------------------------- global ntile-from-rank


def test_ntile_from_rank_matches_ansi_rule():
    from spectral_time_series_ray.functions import __name__ as _  # noqa: F401
    from spectral_time_series_ray.stages.features import ntile_from_rank

    for n in (1, 2, 3, 7, 8, 9, 100, 101, 103):
        for k in (1, 2, 3, 4, 7):
            ranks = np.arange(1, n + 1, dtype=np.int64)
            b = ntile_from_rank(ranks, n, k)
            # buckets are 1..min(k, n), non-decreasing, sizes differ by <=1
            assert b[0] == 1 and b[-1] == min(k, n)
            assert np.all(np.diff(b) >= 0)
            sizes = np.bincount(b)[1:]
            assert sizes.max() - sizes.min() <= 1 if n >= k else True
            # ANSI: first n%k buckets are the larger ones
            if n >= k and n % k:
                assert np.all(sizes[: n % k] == n // k + 1)
                assert np.all(sizes[n % k:] == n // k)


# ------------------------------------------ permutation entropy


def test_perm_entropy_matches_bruteforce_argsort():
    import math

    from spectral_time_series_ray.functions.tsanalysis import permutation_entropy

    rng = np.random.default_rng(13)
    for x in (rng.normal(0, 1, 400),
              rng.integers(0, 4, 400).astype(float),  # heavy ties
              np.sin(np.arange(400) * 0.3)):
        pats = {}
        for i in range(len(x) - 2):
            key = tuple(np.argsort(x[i:i + 3], kind="stable"))
            pats[key] = pats.get(key, 0) + 1
        n = len(x) - 2
        exp = -sum((c / n) * math.log(c / n) for c in pats.values()) / math.log(6)
        got, nw = permutation_entropy(x)
        assert nw == n
        assert abs(got - exp) < 1e-12


def test_perm_entropy_classes_and_degenerates():
    import math

    from spectral_time_series_ray.functions.tsanalysis import permutation_entropy

    assert permutation_entropy(np.arange(100.0))[0] == 0.0
    rng = np.random.default_rng(2)
    assert permutation_entropy(rng.normal(0, 1, 8192))[0] > 0.99
    pe, n = permutation_entropy(np.array([1.0, 2.0]))
    assert math.isnan(pe) and n == 0
    pe, _ = permutation_entropy(np.array([1.0, np.nan, 2.0, 3.0, 4.0]))
    assert math.isnan(pe)
