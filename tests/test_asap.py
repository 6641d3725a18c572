"""ASAP automatic smoothing (Rong & Bailis, VLDB 2017): kernel
invariants and the actor-pool stage over packed chunks."""

import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.functions.tsanalysis import (
    _excess_kurtosis,
    asap_smooth,
    asap_window,
    roughness,
    sma_valid,
)


def test_sma_valid_matches_convolve():
    rng = np.random.default_rng(0)
    x = rng.normal(size=100)
    for w in (1, 2, 5, 17, 50):
        got = sma_valid(x, w)
        exp = np.convolve(x, np.ones(w) / w, mode="valid")
        assert got.shape == exp.shape
        np.testing.assert_allclose(got, exp, atol=1e-10)


def test_roughness_and_kurtosis_basics():
    assert roughness(np.full(50, 3.0)) == 0.0
    assert roughness(np.arange(50, dtype=float)) == 0.0  # constant slope
    assert _excess_kurtosis(np.full(50, 3.0)) == 0.0
    # a heavy spike drives excess kurtosis far above Gaussian
    x = np.zeros(200)
    x[77] = 100.0
    assert _excess_kurtosis(x) > 10.0


def test_asap_picks_period_multiple_on_seasonal():
    rng = np.random.default_rng(5)
    t = np.arange(512)
    x = 10 * np.sin(2 * np.pi * t / 16) + rng.normal(0, 1.0, 512)
    x[300] += 80.0
    w = asap_window(x)
    assert w % 16 == 0 and w >= 16
    sm, w2 = asap_smooth(x)
    assert w2 == w
    assert roughness(sm) < 0.2 * roughness(x)
    assert _excess_kurtosis(sm) >= _excess_kurtosis(x)


def test_asap_never_increases_roughness():
    rng = np.random.default_rng(9)
    for _ in range(10):
        n = int(rng.integers(16, 600))
        x = np.cumsum(rng.normal(size=n)) + 5 * rng.normal(size=n)
        sm, w = asap_smooth(x)
        assert 1 <= w <= n // 2 or w == 1
        assert roughness(sm) <= roughness(x) + 1e-9
        if w > 1:
            assert _excess_kurtosis(sm) >= _excess_kurtosis(x) - 1e-12


def test_asap_degenerate_inputs():
    assert asap_window(np.array([1.0, 2.0])) == 1
    assert asap_window(np.full(64, 7.0)) == 1
    sm, w = asap_smooth(np.array([], dtype=float))
    assert w == 1 and len(sm) == 0


def test_asap_window_one_returns_input_unchanged():
    x = np.array([1.0, 5.0, 2.0, 8.0, 3.0, 9.0, 1.0, 4.0])
    sm, w = asap_smooth(x)
    if w == 1:
        np.testing.assert_array_equal(sm, x)


def test_asap_stage_over_chunks(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.analytics import asap_downsample

    rng = np.random.default_rng(3)
    t = np.arange(256)
    rows = []
    for i, conv in enumerate(["c_seasonal", "c_noise", "c_flat"]):
        if conv == "c_seasonal":
            v = 5 * np.sin(2 * np.pi * t / 8) + rng.normal(0, 0.5, 256)
        elif conv == "c_noise":
            v = rng.normal(0, 1.0, 256)
        else:
            v = np.full(256, 2.5)
        rows.append({
            "conv_id": conv, "chunk_idx": 0, "n_points": 256,
            "ts": (np.int64(1_700_000_000_000_000)
                   + t * 60_000_000),
            "values": v,
        })
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = asap_downsample(ds, concurrency=1).to_pandas()
    assert len(out) == 3
    by = out.set_index("conv_id")
    assert by.loc["c_seasonal", "window"] % 8 == 0
    assert (
        by.loc["c_seasonal", "roughness_smoothed"]
        < 0.5 * by.loc["c_seasonal", "roughness_raw"]
    )
    assert by.loc["c_flat", "roughness_raw"] == 0.0
    for conv in ("c_seasonal", "c_noise", "c_flat"):
        assert (
            by.loc[conv, "roughness_smoothed"]
            <= by.loc[conv, "roughness_raw"] + 1e-9
        )
        n_sm = len(by.loc[conv, "smoothed"])
        assert n_sm == 256 - by.loc[conv, "window"] + 1
