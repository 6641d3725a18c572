"""Tests for logistic IRLS, stratified sampling and the Theta forecaster."""

import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.stages.analytics import ThetaForecaster
from spectral_time_series_ray.stages.sampling import (
    hamilton_allocation,
    stratified_sample,
)


def _exact_logistic(X, y, ridge=1e-8, iters=200):
    """Driver-side reference IRLS on the full design matrix."""
    k = X.shape[1]
    beta = np.zeros(k)
    for _ in range(iters):
        eta = X @ beta
        mu = 1.0 / (1.0 + np.exp(-eta))
        w = mu * (1.0 - mu)
        H = (X * w[:, None]).T @ X + ridge * np.eye(k)
        g = X.T @ (y - mu) - ridge * beta
        delta = np.linalg.solve(H, g)
        beta = beta + delta
        if np.max(np.abs(delta)) < 1e-12:
            break
    return beta


# --------------------------------------------------------------- logistic
def test_logistic_irls_matches_exact_fit(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.mlfit import logistic_irls

    rng = np.random.default_rng(3)
    n = 4000
    x1 = rng.normal(size=n)
    x2 = rng.normal(size=n)
    eta = -0.5 + 1.2 * x1 - 0.8 * x2
    y = (rng.random(n) < 1.0 / (1.0 + np.exp(-eta))).astype(np.float64)
    df = pd.DataFrame({"x1": x1, "x2": x2, "y": y})

    fit = logistic_irls(
        ray.data.from_pandas(df).repartition(7), ["x1", "x2"], "y")
    X = np.column_stack([np.ones(n), x1, x2])
    exact = _exact_logistic(X, y)

    assert fit["converged"]
    assert fit["grad_inf"] < 1e-8
    assert np.max(np.abs(fit["beta"] - exact)) < 1e-7
    assert fit["n"] == n
    assert fit["deviance"] <= fit["null_deviance"]
    # recovered coefficients near the generating ones (large-n sanity)
    assert np.max(np.abs(fit["beta"] - [-0.5, 1.2, -0.8])) < 0.2


def test_logistic_irls_partition_invariance(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.mlfit import logistic_irls

    rng = np.random.default_rng(11)
    n = 500
    df = pd.DataFrame({
        "x": rng.normal(size=n),
        "y": (rng.random(n) < 0.3).astype(np.float64),
    })
    f1 = logistic_irls(ray.data.from_pandas(df).repartition(1), ["x"], "y")
    f2 = logistic_irls(ray.data.from_pandas(df).repartition(13), ["x"], "y")
    # sums are float adds in different orders; identical to ~1e-12
    assert np.max(np.abs(f1["beta"] - f2["beta"])) < 1e-9


# --------------------------------------------------------------- hamilton
def test_hamilton_allocation_exact_and_capped():
    n_by = {"a": 10, "b": 30, "c": 60}
    alloc = hamilton_allocation(n_by, 10)
    assert sum(alloc.values()) == 10
    assert alloc == {"a": 1, "b": 3, "c": 6}

    # remainders decide: 7 * (1/3) each = 2.33.. -> 2,2,2 then one +1
    alloc = hamilton_allocation({"a": 10, "b": 10, "c": 10}, 7)
    assert sum(alloc.values()) == 7
    assert sorted(alloc.values()) == [2, 2, 3]
    assert alloc["a"] == 3  # tie on remainder breaks by key string

    # cap: a stratum can never exceed its population
    alloc = hamilton_allocation({"tiny": 1, "big": 99}, 99)
    assert alloc["tiny"] <= 1 and sum(alloc.values()) == 99

    with pytest.raises(ValueError):
        hamilton_allocation({"a": 3}, 4)


def test_stratified_sample_sizes_and_determinism(ray_session):
    import ray.data

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "id": np.arange(3000, dtype=np.int64),
        "s": rng.choice(["x", "y", "z"], size=3000, p=[0.6, 0.3, 0.1]),
    })
    ds = ray.data.from_pandas(df).repartition(6)
    sample, alloc = stratified_sample(ds, "s", "id", 300, seed=9)
    sm = sample.to_pandas()
    assert len(sm) == 300
    assert sm["id"].is_unique
    got = sm.groupby("s")["id"].count().to_dict()
    for s, (n_pop, kh) in alloc.items():
        assert got.get(s, 0) == kh
        assert kh <= n_pop
    assert sum(kh for _, kh in alloc.values()) == 300

    # deterministic across a different partitioning
    sample2, _ = stratified_sample(
        ray.data.from_pandas(df).repartition(2), "s", "id", 300, seed=9)
    sm2 = sample2.to_pandas()
    assert sorted(sm2["id"]) == sorted(sm["id"])


# ------------------------------------------------------------------ theta
def _chunk_batch(series_list):
    return pd.DataFrame({
        "conv_id": [f"c{i}" for i in range(len(series_list))],
        "chunk_idx": np.zeros(len(series_list), dtype=np.int64),
        "n_points": np.array([len(s) for s in series_list], dtype=np.int64),
        "values": [np.asarray(s, dtype=np.float64) for s in series_list],
    })


def test_theta_constant_and_linear_exact():
    f = ThetaForecaster(alpha=0.5, horizon=6)
    out = f(_chunk_batch([np.full(64, 3.25), 1.0 + 0.5 * np.arange(64)]))
    fc0 = np.asarray(out["theta_forecast"].iloc[0])
    assert np.max(np.abs(fc0 - 3.25)) < 1e-9
    # linear: slope recovered exactly, forecast steps by slope/2
    assert abs(out["slope"].iloc[1] - 0.5) < 1e-9
    fc1 = np.asarray(out["theta_forecast"].iloc[1])
    assert np.max(np.abs(np.diff(fc1) - 0.25)) < 1e-9
    assert (out["cross_err"] < 1e-9).all()


def test_theta_cross_identity_on_noise_matches_naive_reference():
    rng = np.random.default_rng(7)
    series = [rng.normal(5.0, 2.0, size=L) for L in (17, 64, 230)]
    out = ThetaForecaster(alpha=0.3, horizon=4)(_chunk_batch(series))
    assert (out["cross_err"] < 1e-9).all()
    # per-series naive reference: explicit theta-line decomposition
    for i, x in enumerate(series):
        t = np.arange(len(x), dtype=np.float64)
        b, a0 = np.polyfit(t, x, 1)
        z = 2.0 * x - (a0 + b * t)
        level = z[0]
        for v in z[1:]:
            level = 0.3 * v + 0.7 * level
        h = np.arange(1, 5, dtype=np.float64)
        expect = 0.5 * ((a0 + b * (len(x) - 1 + h)) + level)
        got = np.asarray(out["theta_forecast"].iloc[i])
        assert np.max(np.abs(got - expect)) < 1e-8


def test_theta_short_series_flagged_invalid():
    out = ThetaForecaster()(_chunk_batch([[1.0, 2.0]]))
    assert not out["theta_valid"].iloc[0]
    assert np.isnan(out["slope"].iloc[0])


# --------------------------------------------------- global distinct count
def test_distinct_count_global_exact(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.distinct import distinct_count_global

    rng = np.random.default_rng(13)
    vals = rng.integers(0, 5000, size=20000)
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(9)
    assert distinct_count_global(ds, "v") == len(np.unique(vals))
    # string keys too
    ds2 = ray.data.from_pandas(
        pd.DataFrame({"v": [f"k{x}" for x in vals]})).repartition(4)
    assert distinct_count_global(ds2, "v") == len(np.unique(vals))


def test_poisson_irls_matches_exact_fit(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.mlfit import poisson_irls

    rng = np.random.default_rng(29)
    n = 3000
    x = rng.normal(size=n)
    y = rng.poisson(np.exp(0.4 + 0.7 * x)).astype(np.float64)
    fit = poisson_irls(
        ray.data.from_pandas(pd.DataFrame({"x": x, "y": y})).repartition(5),
        ["x"], "y")
    assert fit["converged"] and fit["grad_inf"] < 1e-8
    assert fit["deviance"] <= fit["null_deviance"]
    # reference: driver-side Newton on the full design
    X = np.column_stack([np.ones(n), x])
    beta = np.zeros(2)
    for _ in range(100):
        mu = np.exp(X @ beta)
        H = (X * mu[:, None]).T @ X + 1e-8 * np.eye(2)
        delta = np.linalg.solve(H, X.T @ (y - mu) - 1e-8 * beta)
        beta = beta + delta
        if np.max(np.abs(delta)) < 1e-12:
            break
    assert np.max(np.abs(fit["beta"] - beta)) < 1e-7
    assert np.max(np.abs(fit["beta"] - [0.4, 0.7])) < 0.1


# ---------------------------------------------------------------- croston
def test_croston_planted_exact_and_reference():
    from spectral_time_series_ray.stages.analytics import CrostonForecaster

    x = np.zeros(70)
    x[6::7] = 3.0  # demand 3 every 7th step
    steady = np.ones(40)
    out = CrostonForecaster(alpha=0.2)(_chunk_batch([x, steady, np.zeros(20)]))
    assert abs(out["croston_rate"].iloc[0] - 3.0 / 7.0) < 1e-9
    assert abs(out["croston_rate_sba"].iloc[0] - 0.9 * 3.0 / 7.0) < 1e-9
    assert abs(out["croston_rate"].iloc[1] - 1.0) < 1e-12
    assert not out["croston_valid"].iloc[2]

    # closed-form SES level == sequential recursion on irregular demands
    rng = np.random.default_rng(31)
    y = np.zeros(200)
    pos = np.sort(rng.choice(200, size=30, replace=False))
    y[pos] = rng.integers(1, 9, size=30).astype(np.float64)
    out = CrostonForecaster(alpha=0.35)(_chunk_batch([y]))
    z = y[y != 0]
    p = np.concatenate([[pos[0] + 1.0], np.diff(pos).astype(np.float64)])
    lz, lp = z[0], p[0]
    for a, b in zip(z[1:], p[1:]):
        lz = 0.35 * a + 0.65 * lz
        lp = 0.35 * b + 0.65 * lp
    assert abs(out["croston_rate"].iloc[0] - lz / lp) < 1e-10


# ---------------------------------------------------------- yule-walker
def test_ar_yule_walker_matches_linalg_solve():
    from spectral_time_series_ray.stages.analytics import ARYuleWalker

    rng = np.random.default_rng(5)
    series = [rng.normal(10, 3, L) for L in (8, 50, 50, 317)]
    out = ARYuleWalker()(_chunk_batch(series))
    for i, x in enumerate(series):
        xc = x - x.mean()
        L = len(x)
        c = [float((xc[k:] * xc[: L - k]).sum() / L) for k in range(3)]
        phi = np.linalg.solve([[c[0], c[1]], [c[1], c[0]]], [c[1], c[2]])
        np.testing.assert_allclose(
            [out["phi1"].iloc[i], out["phi2"].iloc[i]], phi, atol=1e-12)
        s2 = c[0] - phi[0] * c[1] - phi[1] * c[2]
        np.testing.assert_allclose(out["sigma2"].iloc[i], s2, atol=1e-12)
        mu = x.mean()
        fc = mu + phi[0] * (x[-1] - mu) + phi[1] * (x[-2] - mu)
        np.testing.assert_allclose(out["forecast_1"].iloc[i], fc, atol=1e-10)


def test_ar_yule_walker_recovery_and_guards():
    from spectral_time_series_ray.stages.analytics import ARYuleWalker

    rng = np.random.default_rng(9)
    T = 20000
    e = rng.normal(0, 1, T + 500)
    x = np.zeros(T + 500)
    for t in range(2, T + 500):
        x[t] = 0.5 * x[t - 1] + 0.3 * x[t - 2] + e[t]
    out = ARYuleWalker()(_chunk_batch([
        x[500:], np.full(100, 4.0), np.arange(5, dtype=float)]))
    assert abs(out["phi1"].iloc[0] - 0.5) < 0.03
    assert abs(out["phi2"].iloc[0] - 0.3) < 0.03
    assert out["ar_stationary"].iloc[0]
    assert not out["ar_valid"].iloc[1]  # constant -> c0 == 0
    assert not out["ar_valid"].iloc[2]  # below MIN_LEN
