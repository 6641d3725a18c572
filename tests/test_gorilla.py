"""FIXTURES.md §5: decode(encode(x)) == x bit-for-bit."""

import numpy as np
import pytest

from spectral_time_series_ray.functions.gorilla import (
    decode_chunk,
    decode_floats,
    decode_timestamps,
    encode_chunk,
    encode_floats,
    encode_timestamps,
)


def seqs():
    rng = np.random.default_rng(42)
    return {
        "constant": np.full(500, 3.14159),
        "slow_drift": np.cumsum(rng.normal(0, 0.001, 500)) + 100.0,
        "step": np.repeat([1.0, 2.0, 1.5, 8.0], 125),
        "random": rng.standard_normal(500) * 1e3,
        "with_nan": np.where(rng.random(100) < 0.1, np.nan, rng.standard_normal(100)),
        "empty": np.array([]),
        "single": np.array([7.5]),
        "two": np.array([7.5, 7.5]),
        "special": np.array([0.0, -0.0, np.inf, -np.inf, 1e-308, 1e308]),
    }


@pytest.mark.parametrize("name", list(seqs().keys()))
@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_float_roundtrip_bitexact(name, dtype):
    x = seqs()[name].astype(dtype)
    out = decode_floats(encode_floats(x))
    assert out.dtype == x.dtype
    np.testing.assert_array_equal(
        out.view(np.uint64 if dtype == np.float64 else np.uint32),
        x.view(np.uint64 if dtype == np.float64 else np.uint32),
    )


def ts_seqs():
    rng = np.random.default_rng(7)
    base = 1_700_000_000_000_000  # microseconds
    return {
        "regular": base + np.arange(1000, dtype=np.int64) * 60_000_000,
        "irregular": base + np.cumsum(rng.integers(1, 10_000_000, 1000)).astype(np.int64),
        "jitter": base + np.arange(500, dtype=np.int64) * 60_000_000
        + rng.integers(-50, 50, 500),
        "bigjumps": base + np.cumsum(rng.integers(1, 2**40, 50)).astype(np.int64),
        "empty": np.array([], dtype=np.int64),
        "one": np.array([base], dtype=np.int64),
        "two": np.array([base, base + 5], dtype=np.int64),
        "negative": np.array([-100, -50, 0, 50, 1000], dtype=np.int64),
    }


@pytest.mark.parametrize("name", list(ts_seqs().keys()))
def test_timestamp_roundtrip(name):
    t = ts_seqs()[name]
    np.testing.assert_array_equal(decode_timestamps(encode_timestamps(t)), t)


def test_constant_compresses_hard():
    x = np.full(10_000, 42.0)
    enc = encode_floats(x)
    assert len(enc) < 10_000 * 8 / 40  # > 40x on constant series


def test_regular_timestamps_compress_hard():
    t = 1_000_000 + np.arange(10_000, dtype=np.int64) * 60
    enc = encode_timestamps(t)
    assert len(enc) < 10_000 * 8 / 40


def test_chunk_api():
    t = ts_seqs()["irregular"][:200]
    v = seqs()["slow_drift"][:200]
    tb, vb, bpp = encode_chunk(t, v)
    t2, v2 = decode_chunk(tb, vb)
    np.testing.assert_array_equal(t2, t)
    np.testing.assert_array_equal(v2.view(np.uint64), v.view(np.uint64))
    assert 0 < bpp < 16  # tighter than raw 16 bytes/point


# ------------------------------------------------------------------ PLA
def test_pla_error_bound_and_ratio():
    from spectral_time_series_ray.functions.pla import (
        pla_compress,
        pla_decompress,
        pla_max_error,
    )

    rng = np.random.default_rng(5)
    t = np.cumsum(rng.uniform(0.5, 2.0, 4000))
    # smooth signal + noise: PLA should compress hard at eps >> noise
    v = np.sin(t / 40.0) * 10 + rng.normal(0, 0.05, len(t))
    for eps in (0.5, 0.1):
        s0, v0, sl = pla_compress(t, v, eps)
        err = pla_max_error(t, v, s0, v0, sl)
        assert err <= eps + 1e-12, (eps, err)
    s0, v0, sl = pla_compress(t, v, 0.5)
    assert len(s0) < len(t) / 8  # real compression on smooth data

    # anchor samples are exact
    rec = pla_decompress(s0, v0, sl, s0)
    assert np.allclose(rec, v0)


def test_pla_pathological_inputs():
    from spectral_time_series_ray.functions.pla import pla_compress, pla_max_error

    rng = np.random.default_rng(6)
    # alternating spikes: worst case, segments stay short but bound holds
    t = np.arange(200, dtype=np.float64)
    v = np.where(np.arange(200) % 2 == 0, 100.0, -100.0)
    s0, v0, sl = pla_compress(t, v, 1.0)
    assert pla_max_error(t, v, s0, v0, sl) <= 1.0 + 1e-12

    # single point / two points / empty
    for n in (0, 1, 2):
        tt, vv = t[:n], v[:n]
        s0, v0, sl = pla_compress(tt, vv, 1.0)
        if n:
            assert pla_max_error(tt, vv, s0, v0, sl) <= 1.0 + 1e-12

    # strictly increasing check
    import pytest

    with pytest.raises(ValueError):
        pla_compress(np.array([0.0, 0.0, 1.0]), np.zeros(3), 1.0)

    # random walks at several eps
    for seed in range(5):
        r = np.random.default_rng(seed)
        tt = np.cumsum(r.uniform(0.1, 3.0, 1000))
        vv = np.cumsum(r.normal(0, 1, 1000))
        for eps in (0.0, 0.25, 2.0):
            s0, v0, sl = pla_compress(tt, vv, eps)
            assert pla_max_error(tt, vv, s0, v0, sl) <= eps + 1e-9
