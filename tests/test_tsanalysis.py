"""Tests for functions/tsanalysis.py and the SeriesAnalyzer stage."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spectral_time_series_ray.functions.tsanalysis import (
    acf_fft,
    cusum_changepoint,
    dominant_lag,
    seasonal_decompose_ma,
    seasonal_strength,
)


def _acf_direct(x: np.ndarray, max_lag: int) -> np.ndarray:
    d = x - x.mean()
    denom = float(np.dot(d, d))
    out = np.empty(max_lag + 1)
    for k in range(max_lag + 1):
        out[k] = np.dot(d[: len(d) - k], d[k:]) / denom
    return out


@given(st.integers(min_value=8, max_value=200), st.integers(min_value=0, max_value=10**6))
@settings(max_examples=60, deadline=None)
def test_acf_fft_matches_direct(n, seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=n) + rng.uniform(-5, 5)
    max_lag = min(n - 1, 40)
    got = acf_fft(x, max_lag)
    exp = _acf_direct(x, max_lag)
    assert got == pytest.approx(exp, abs=1e-9)
    assert got[0] == pytest.approx(1.0)


def test_acf_detects_planted_period():
    k = np.arange(1024)
    x = np.sin(2 * np.pi * k / 24) + 0.1 * np.random.default_rng(0).normal(size=1024)
    lag, val = dominant_lag(acf_fft(x, 200))
    assert lag == 24
    assert val > 0.9


def test_acf_constant_series():
    a = acf_fft(np.full(50, 3.0), 10)
    assert a[0] == 1.0
    assert np.all(a[1:] == 0.0)


def test_cusum_detects_planted_shift():
    rng = np.random.default_rng(1)
    x = np.concatenate([np.full(300, 10.0), np.full(200, 13.0)])
    x += 0.5 * rng.normal(size=500)
    cp, stat = cusum_changepoint(x)
    assert abs(cp - 300) <= 5
    assert stat > 3.0


def test_cusum_null_is_quiet():
    rng = np.random.default_rng(2)
    stats = [cusum_changepoint(rng.normal(size=400))[1] for _ in range(50)]
    # Brownian-bridge max: P(stat > 1.36) ~ 5%; all 50 under 3 w.h.p.
    assert max(stats) < 3.0
    assert np.median(stats) < 1.0


def test_seasonal_decompose_recovers_components():
    rng = np.random.default_rng(3)
    n, period = 480, 12
    k = np.arange(n)
    trend_true = 0.02 * k
    seas_true = 3.0 * np.sin(2 * np.pi * k / period)
    x = 10 + trend_true + seas_true + 0.1 * rng.normal(size=n)
    trend, seasonal, resid = seasonal_decompose_ma(x, period)
    m = ~np.isnan(trend)
    # trend tracks the line, seasonal has the right amplitude
    assert np.corrcoef(trend[m], (10 + trend_true)[m])[0, 1] > 0.99
    assert np.max(seasonal) == pytest.approx(3.0, abs=0.25)
    assert np.nanstd(resid) < 0.2
    # additive identity where trend is defined
    assert x[m] == pytest.approx((trend + seasonal + resid)[m])


def test_seasonal_strength_separates():
    rng = np.random.default_rng(4)
    k = np.arange(240)
    seasonal = 2.0 * np.sin(2 * np.pi * k / 12) + 0.1 * rng.normal(size=240)
    noise = rng.normal(size=240)
    assert seasonal_strength(seasonal, 12) > 0.9
    assert seasonal_strength(noise, 12) < 0.5


def test_seasonal_decompose_rejects_short():
    with pytest.raises(ValueError):
        seasonal_decompose_ma(np.arange(10.0), 8)


def test_series_analyzer_stage(ray_session):
    import pandas as pd
    import ray.data

    from spectral_time_series_ray.stages.analytics import series_analysis

    rng = np.random.default_rng(5)
    k = np.arange(256)
    rows = [
        {
            "conv_id": "tone",
            "chunk_idx": 0,
            "n_points": 256,
            "ts": (k * 60_000_000).astype(np.int64),
            "values": np.sin(2 * np.pi * k / 16) + 0.05 * rng.normal(size=256),
        },
        {
            "conv_id": "shift",
            "chunk_idx": 0,
            "n_points": 256,
            "ts": (k * 60_000_000).astype(np.int64),
            "values": np.where(k < 100, 0.0, 4.0) + 0.3 * rng.normal(size=256),
        },
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = series_analysis(ds, concurrency=1).to_pandas().set_index("conv_id")
    assert abs(int(out.loc["tone", "acf_lag"]) - 16) <= 1
    assert out.loc["tone", "seasonal_strength"] > 0.8
    assert abs(int(out.loc["shift", "cusum_cp"]) - 100) <= 4
    assert out.loc["shift", "cusum_stat"] > 3.0


def test_yule_walker_recovers_ar2():
    from spectral_time_series_ray.functions.tsanalysis import yule_walker

    rng = np.random.default_rng(6)
    a_true = np.array([1.2, -0.5])
    n = 20000
    x = np.zeros(n)
    eps = rng.normal(0, 1.0, n)
    for t in range(2, n):
        x[t] = a_true[0] * x[t - 1] + a_true[1] * x[t - 2] + eps[t]
    a, sigma2 = yule_walker(x, 2)
    assert a == pytest.approx(a_true, abs=0.05)
    assert sigma2 == pytest.approx(1.0, rel=0.1)


def test_ar_whitening_reduces_variance_and_roundtrips():
    from spectral_time_series_ray.functions.precondition import (
        forward_precondition,
        reverse_precondition,
    )
    from spectral_time_series_ray.functions.tsanalysis import ar_whitening_coeffs

    rng = np.random.default_rng(7)
    n = 4096
    x = np.zeros(n)
    eps = rng.normal(0, 1.0, n)
    for t in range(1, n):
        x[t] = 0.95 * x[t - 1] + eps[t]
    c = ar_whitening_coeffs(x, 2)
    y = forward_precondition(x, c)
    # AR(1) with phi=.95: var(x) ~ 1/(1-phi^2) ~ 10.3x innovation var
    assert np.var(y[2:]) < 0.2 * np.var(x)
    back = reverse_precondition(y, c)
    assert np.max(np.abs(back - x)) < 1e-8


def test_yule_walker_rejects_short():
    from spectral_time_series_ray.functions.tsanalysis import yule_walker

    with pytest.raises(ValueError):
        yule_walker(np.arange(5.0), 4)


def test_learned_precondition_stage(ray_session):
    import pandas as pd
    import ray.data

    from spectral_time_series_ray.stages.analytics import learned_precondition

    rng = np.random.default_rng(8)
    n = 1024
    x = np.zeros(n)
    for t in range(1, n):
        x[t] = 0.9 * x[t - 1] + rng.normal()
    rows = pd.DataFrame(
        [
            {"conv_id": "ar", "chunk_idx": 0, "ts": np.arange(n, dtype=np.int64), "values": x},
            {"conv_id": "noise", "chunk_idx": 0, "ts": np.arange(64, dtype=np.int64), "values": rng.normal(size=64)},
        ]
    )
    out = (
        learned_precondition(ray.data.from_pandas(rows), order=2, concurrency=1)
        .to_pandas()
        .set_index("conv_id")
    )
    assert out.loc["ar", "whitened_var_ratio"] < 0.25
    assert out.loc["ar", "roundtrip_err"] < 1e-8
    assert abs(out.loc["ar", "ar_coeffs"][0] - 0.9) < 0.15
    # white noise: taps ~ 0, no variance to remove
    assert out.loc["noise", "whitened_var_ratio"] > 0.7


# ------------------------------------------------ exponential smoothing


def test_ewm_scan_matches_pandas():
    from spectral_time_series_ray.functions.tsanalysis import ewm_mean_scan

    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 60))
    x[1, 5:9] = np.nan
    x[2, 0] = np.nan
    out = ewm_mean_scan(x, 0.3)
    for i in range(4):
        exp = pd.Series(x[i]).ewm(alpha=0.3, adjust=False, ignore_na=True).mean()
        m = np.isfinite(x[i])
        np.testing.assert_allclose(out[i][m], exp.to_numpy()[m], atol=1e-12)
        assert np.all(np.isnan(out[i][~m]))


def test_holt_scan_exact_on_linear():
    """Noise-free linear data: l₁=x₁/b₁=x₂−x₁ seeding keeps Holt exact,
    so the forecast continues the line bit-for-bit (within fp)."""
    from spectral_time_series_ray.functions.tsanalysis import holt_linear_scan

    k = np.arange(50, dtype=np.float64)
    x = (3.0 + 0.25 * k)[None, :]
    level, trend, fcst = holt_linear_scan(x, 0.3, 0.1, horizon=5)
    np.testing.assert_allclose(level[0][1:], x[0][1:], atol=1e-9)
    np.testing.assert_allclose(trend[0][1:], 0.25, atol=1e-9)
    np.testing.assert_allclose(fcst[0], 3.0 + 0.25 * (49 + np.arange(1, 6)), atol=1e-9)


def test_holt_scan_matches_naive_loop():
    from spectral_time_series_ray.functions.tsanalysis import holt_linear_scan

    rng = np.random.default_rng(5)
    x = rng.normal(size=(3, 40)).cumsum(axis=1)
    x[0, 7:11] = np.nan
    a, b = 0.4, 0.2
    level, trend, _ = holt_linear_scan(x, a, b)

    for i in range(3):
        l = t = None
        cnt = 0
        for j in range(40):
            v = x[i, j]
            if not np.isfinite(v):
                assert np.isnan(level[i, j])
                continue
            if cnt == 0:
                l = v
            elif cnt == 1:
                t = v - l
                l = v
            else:
                lp = a * v + (1 - a) * (l + t)
                t = b * (lp - l) + (1 - b) * t
                l = lp
            cnt += 1
            np.testing.assert_allclose(level[i, j], l, atol=1e-12)
            if t is not None:
                np.testing.assert_allclose(trend[i, j], t, atol=1e-12)


def test_exp_smooth_stage(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.analytics import exp_smooth

    rng = np.random.default_rng(9)
    rows = []
    for i in range(20):
        n = int(rng.integers(8, 120))
        rows.append({"conv_id": f"c{i:03d}", "chunk_idx": 0,
                     "values": rng.normal(size=n).cumsum().tolist()})
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = exp_smooth(ds, alpha=0.3, beta=0.1, horizon=4, concurrency=2).to_pandas()
    assert len(out) == 20
    assert int(out["convexity_violations"].sum()) == 0
    rec = out["recompute_err"].to_numpy(dtype=np.float64)
    assert np.isfinite(rec).any() and np.nanmax(rec) < 1e-9
    assert out["holt_forecast"].map(len).eq(4).all()
    # n_points preserved exactly
    exp_n = {f"c{i:03d}": len(rows[i]["values"]) for i in range(20)}
    for cid, n in zip(out["conv_id"], out["n_points"]):
        assert exp_n[cid] == int(n)
