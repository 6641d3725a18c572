"""Haar wavelet kernel: orthonormality, Parseval, roundtrip, top-k bound."""

import numpy as np
import pytest

from spectral_time_series_ray.functions.wavelet import (
    haar_dwt,
    haar_idwt,
    next_pow2,
    pad_pow2,
    reconstruct_topk,
    topk_coefficients,
    wavelet_compress,
    wavelet_reconstruct,
)


def test_next_pow2_and_pad():
    assert [next_pow2(n) for n in (0, 1, 2, 3, 4, 5, 17, 64)] == [
        1, 1, 2, 4, 4, 8, 32, 64,
    ]
    p = pad_pow2(np.array([1.0, 2.0, 3.0]))
    assert p.tolist() == [1.0, 2.0, 3.0, 3.0]  # edge padding


def test_roundtrip_exact():
    rng = np.random.default_rng(7)
    for n in (1, 2, 8, 256, 1024):
        x = rng.normal(size=n) * 100
        np.testing.assert_allclose(haar_idwt(haar_dwt(x)), x, atol=1e-9)


def test_parseval_energy_preserved():
    rng = np.random.default_rng(11)
    x = rng.normal(size=512) * 10
    c = haar_dwt(x)
    assert abs(np.sum(c * c) - np.sum(x * x)) <= 1e-6 * np.sum(x * x)


def test_dwt_known_values():
    # [a, b] -> [(a+b)/sqrt2, (a-b)/sqrt2]
    c = haar_dwt(np.array([3.0, 1.0]))
    np.testing.assert_allclose(c, [4 / np.sqrt(2), 2 / np.sqrt(2)])
    # constant signal: ALL detail coefficients vanish
    c = haar_dwt(np.full(64, 5.0))
    assert abs(c[0] - 5.0 * 8) < 1e-12  # s_L = mean * sqrt(n)
    assert np.max(np.abs(c[1:])) < 1e-12


def test_linearity():
    rng = np.random.default_rng(3)
    x, y = rng.normal(size=128), rng.normal(size=128)
    np.testing.assert_allclose(
        haar_dwt(2.0 * x - 3.0 * y), 2.0 * haar_dwt(x) - 3.0 * haar_dwt(y), atol=1e-9
    )


def test_topk_parseval_error_identity():
    """Dropping coefficients loses EXACTLY their energy (orthonormal)."""
    rng = np.random.default_rng(5)
    x = np.cumsum(rng.normal(size=256))
    c = haar_dwt(x)
    for k in (1, 8, 64, 256):
        idx, vals = topk_coefficients(c, k)
        xr = reconstruct_topk(idx, vals, len(c))
        err2 = float(np.sum((x - xr) ** 2))
        dropped = c.copy()
        dropped[idx] = 0.0
        drop2 = float(np.sum(dropped * dropped))
        assert abs(err2 - drop2) <= 1e-9 * max(1.0, drop2)
    # full k == exact
    idx, vals = topk_coefficients(c, len(c))
    np.testing.assert_allclose(reconstruct_topk(idx, vals, len(c)), x, atol=1e-9)


def test_topk_deterministic_tie_break():
    c = np.array([1.0, -1.0, 1.0, 0.5])
    idx, vals = topk_coefficients(c, 2)
    assert idx.tolist() == [0, 1]  # lower index wins on magnitude ties


def test_block_constant_sparsity():
    """Constant on dyadic blocks of length B: every detail coefficient
    at the log2(B) finest levels is zero, so top-(n/B) reconstruction
    is EXACT — the signal class Haar compresses losslessly."""
    rng = np.random.default_rng(13)
    levels = rng.normal(size=16) * 50
    x = np.repeat(levels, 16)  # n=256, block length 16
    comp = wavelet_compress(x, keep_frac=16 / 256)
    assert comp["dropped_l2"] <= 1e-9
    np.testing.assert_allclose(wavelet_reconstruct(comp), x, atol=1e-9)


def test_compress_nondyadic_and_bound():
    rng = np.random.default_rng(17)
    x = np.cumsum(rng.normal(size=300))  # non-dyadic
    comp = wavelet_compress(x, keep_frac=0.1)
    xr = wavelet_reconstruct(comp)
    assert len(xr) == 300
    # real-prefix L2 error is bounded by the padded-signal budget
    err = float(np.sqrt(np.sum((x - xr) ** 2)))
    assert err <= comp["dropped_l2"] + 1e-9
    # keeping everything is exact
    full = wavelet_compress(x, keep_frac=1.0)
    np.testing.assert_allclose(wavelet_reconstruct(full), x, atol=1e-9)


@pytest.mark.parametrize("n", [0, 3, 5, 7])
def test_bad_lengths_raise(n):
    if n == 0:
        assert haar_dwt(np.array([])).size == 0 or True  # len 0 is 2^? -> allowed no-op
    else:
        with pytest.raises(ValueError):
            haar_dwt(np.zeros(n))


def test_wavelet_verify_chunks_stage(ray_session):
    import pandas as pd
    import ray.data

    from spectral_time_series_ray.stages.compress import wavelet_verify_chunks

    k = np.arange(256)
    rng = np.random.default_rng(23)
    rows = pd.DataFrame(
        {
            "conv_id": ["a", "b", "c"],
            "chunk_idx": np.array([0, 0, 1], np.int64),
            "ts": [np.int64(1_700_000_000_000_000) + k * 60_000_000] * 3,
            "values": [
                np.repeat(np.arange(16.0), 16),      # block-constant: lossless
                np.cumsum(rng.normal(size=256)),     # random walk: lossy
                np.full(256, 7.0),                   # constant: 1 coefficient
            ],
        }
    )
    out = (
        wavelet_verify_chunks(ray.data.from_pandas(rows), keep_frac=16 / 256)
        .to_pandas()
        .set_index("conv_id")
    )
    assert out["parseval_ok"].all()
    assert out.loc["a", "l2_err"] <= 1e-9
    assert out.loc["c", "l2_err"] <= 1e-9
    assert out.loc["b", "l2_err"] > 0  # genuinely lossy on noise
    assert (out["n_kept"] == 16).all()
