"""Golden fixtures from FIXTURES.md §3 / reference test_precondition.py."""

import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.functions.precondition import (
    forward_precondition,
    precondition_coefficients,
    reverse_precondition,
)


@pytest.mark.parametrize(
    "poly,degree,expected",
    [
        ("chebyshev", 2, [0.0, -0.5]),
        ("chebyshev", 3, [0.0, -0.75, 0.0]),
        ("chebyshev", 5, [0.0, -1.25, 0.0, 0.3125, 0.0]),
        ("legendre", 2, [0.0, -1.0 / 3.0]),
        ("legendre", 3, [0.0, -0.6, 0.0]),
    ],
)
def test_coefficient_fixtures(poly, degree, expected):
    np.testing.assert_allclose(
        precondition_coefficients(poly, degree), expected, atol=1e-12
    )


@pytest.mark.parametrize("poly", ["chebyshev", "legendre"])
@pytest.mark.parametrize("degree", [1, 2, 3, 4, 5, 10])
def test_l1_growth_bound(poly, degree):
    c = precondition_coefficients(poly, degree)
    assert np.abs(c).sum() <= 2 ** (0.3 * degree) + 1e-9


@pytest.mark.parametrize("poly", ["chebyshev", "legendre"])
@pytest.mark.parametrize("degree", [2, 3, 5])
@pytest.mark.parametrize("length", [8, 64, 257])
def test_roundtrip_identity(poly, degree, length):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(length)
    c = precondition_coefficients(poly, degree)
    y = forward_precondition(x, c)
    np.testing.assert_allclose(reverse_precondition(y, c), x, atol=1e-10)


def test_first_n_identity():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(50)
    c = precondition_coefficients("chebyshev", 4)
    y = forward_precondition(x, c)
    np.testing.assert_array_equal(y[:4], x[:4])
    assert not np.allclose(y[4:], x[4:])


def test_differencing_case():
    # degree-1 monic chebyshev = x => c=[0]: identity; manual c=[-1] = differencing
    x = np.array([1.0, 3.0, 6.0, 10.0])
    y = forward_precondition(x, np.array([-1.0]))
    np.testing.assert_allclose(y, [1.0, 2.0, 3.0, 4.0])


def test_dtype_preserved():
    x = np.random.default_rng(2).standard_normal(32).astype(np.float32)
    c = precondition_coefficients("chebyshev", 3)
    y = forward_precondition(x, c)
    assert y.dtype == np.float32
    assert reverse_precondition(y, c).dtype == np.float32


def test_multivariate_independence():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((3, 40))
    c = precondition_coefficients("legendre", 3)
    y = forward_precondition(x, c)
    for v in range(3):
        np.testing.assert_allclose(y[v], forward_precondition(x[v], c))
    np.testing.assert_allclose(reverse_precondition(y, c), x, atol=1e-10)


@pytest.mark.parametrize("scale", [1e-8, 1e8])
def test_numerical_stability(scale):
    rng = np.random.default_rng(4)
    x = rng.standard_normal(100) * scale
    c = precondition_coefficients("chebyshev", 5)
    y = forward_precondition(x, c)
    np.testing.assert_allclose(reverse_precondition(y, c), x, rtol=1e-8)


def test_reverse_with_context():
    """GT-context reversal (reference precondition.py:465-505): apply
    forward to [context, seq] jointly, then reverse only the tail with
    the context supplied — must recover the tail exactly."""
    rng = np.random.default_rng(5)
    full = rng.standard_normal(60)
    c = precondition_coefficients("chebyshev", 4)
    pre_full = forward_precondition(full, c)
    ctx_len = 40
    tail_pre = pre_full[ctx_len:]
    recovered = reverse_precondition(tail_pre, c, context=full[:ctx_len])
    np.testing.assert_allclose(recovered, full[ctx_len:], atol=1e-10)


def test_short_series_identity():
    x = np.array([1.0, 2.0])
    c = precondition_coefficients("chebyshev", 5)
    np.testing.assert_array_equal(forward_precondition(x, c), x)
    np.testing.assert_array_equal(reverse_precondition(x, c), x)


def test_reverse_with_base_context_matches_reference_loop():
    """Vectorized hybrid reversal equals the reference's per-timestep
    loop (eval_precond_hybrid.py:135-170), incl. short-history guard."""
    from spectral_time_series_ray.functions.precondition import (
        forward_precondition,
        precondition_coefficients,
        reverse_with_base_context,
    )

    rng = np.random.default_rng(0)
    co = precondition_coefficients("chebyshev", 4)
    n = len(co)
    for input_len in (32, 4, 3, 1, 0):
        pred_len = 8
        full = rng.standard_normal(input_len + pred_len)
        yhat = rng.standard_normal(pred_len)
        ref = yhat.copy()
        for t in range(pred_len):
            pos = input_len + t
            if pos >= n:
                for i in range(n):
                    ref[t] -= co[i] * full[pos - i - 1]
        got = reverse_with_base_context(yhat, full, input_len, co)
        np.testing.assert_allclose(got, ref, atol=1e-12)


def test_gt_context_reversal_consistency_invariant():
    """The reference's consistency oracle (CLAUDE.md 'AFTER FIX'):
    with ground-truth context, original-space pointwise errors equal
    precond-space errors exactly, so MSE/MAE match."""
    from spectral_time_series_ray.functions.precondition import (
        forward_precondition,
        precondition_coefficients,
        reverse_with_base_context,
    )

    rng = np.random.default_rng(1)
    co = precondition_coefficients("chebyshev", 4)
    L, H = 32, 8
    full = rng.standard_normal(L + H) * 10
    pre_full = forward_precondition(full, co)
    yhat = pre_full[L:] + rng.standard_normal(H)  # imperfect predictions
    rev = reverse_with_base_context(yhat, full, L, co)
    err_orig = rev - full[L:]
    err_pre = yhat - pre_full[L:]
    np.testing.assert_allclose(err_orig, err_pre, atol=1e-12)
    assert abs(np.mean(err_orig**2) - np.mean(err_pre**2)) < 1e-12


# --------------------------------------------- patch-axis kernels


@pytest.mark.parametrize("poly,degree", [("chebyshev", 2), ("chebyshev", 4), ("legendre", 3)])
def test_patched_forward_equals_per_channel_1d(poly, degree):
    """Patched forward along time == the 1-D kernel applied to each
    patch channel, bit-exactly (same op order) — the cross-check the
    reference implies by deriving PatchPolynomialPrecondition from
    PolynomialPrecondition (patch_precondition.py:27-40)."""
    from spectral_time_series_ray.functions.precondition import (
        forward_precondition,
        forward_precondition_patched,
        precondition_coefficients,
    )

    rng = np.random.default_rng(7)
    co = precondition_coefficients(poly, degree)
    x = rng.standard_normal((40, 8)) * 5  # [time, patch]
    got = forward_precondition_patched(x, co)
    for p in range(x.shape[1]):
        np.testing.assert_array_equal(got[:, p], forward_precondition(x[:, p], co))
    # leading batch dims broadcast
    xb = rng.standard_normal((3, 17, 4))
    gb = forward_precondition_patched(xb, co)
    for b in range(3):
        np.testing.assert_array_equal(gb[b], forward_precondition_patched(xb[b], co))


@pytest.mark.parametrize("tlen", [1, 3, 4, 5, 64])
def test_patched_roundtrip_and_identity_prefix(tlen):
    from spectral_time_series_ray.functions.precondition import (
        forward_precondition_patched,
        precondition_coefficients,
        reverse_precondition_patched,
    )

    rng = np.random.default_rng(11)
    co = precondition_coefficients("chebyshev", 4)
    n = len(co)
    x = rng.standard_normal((tlen, 6)) * 10
    fwd = forward_precondition_patched(x, co)
    # first n time steps are identity
    np.testing.assert_array_equal(fwd[: min(n, tlen)], x[: min(n, tlen)])
    rec = reverse_precondition_patched(fwd, co)
    np.testing.assert_allclose(rec, x, atol=1e-9)


def test_patched_reverse_with_context():
    """GT-context reversal restores the tail exactly from the original
    head (reference patch_precondition.py:205-280 context path)."""
    from spectral_time_series_ray.functions.precondition import (
        forward_precondition_patched,
        precondition_coefficients,
        reverse_precondition_patched,
    )

    rng = np.random.default_rng(3)
    co = precondition_coefficients("chebyshev", 4)
    n = len(co)
    x = rng.standard_normal((32, 5))
    fwd = forward_precondition_patched(x, co)
    rec_tail = reverse_precondition_patched(fwd[n:], co, context=x[:n])
    np.testing.assert_allclose(rec_tail, x[n:], atol=1e-10)
    # dtype preserved
    xf32 = x.astype(np.float32)
    assert forward_precondition_patched(xf32, co).dtype == np.float32
    assert reverse_precondition_patched(fwd.astype(np.float32), co).dtype == np.float32


def test_patched_precondition_stage(ray_session):
    """Chunk rows through the Ray stage: every chunk self-verifies."""
    import ray.data

    from spectral_time_series_ray.stages.series import patched_precondition_stats

    rng = np.random.default_rng(9)
    rows = []
    for c in range(4):
        npts = int(rng.integers(5, 200))
        rows.append(
            {"conv_id": f"c{c}", "chunk_idx": 0, "n_points": npts,
             "ts": np.arange(npts, dtype=np.int64),
             "values": rng.standard_normal(npts) * 3}
        )
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = patched_precondition_stats(ds, patch_size=8).to_pandas()
    assert len(out) == 4
    assert out["ok"].all()
    assert (out["xcheck_err"] == 0.0).all()
