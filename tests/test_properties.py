"""Property-based tests (hypothesis) for the codec/kernel invariants —
stronger than the reference's parametrized unit tests (SURVEY.md §5
notes hypothesis is absent there)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from spectral_time_series_ray.functions.gorilla import (
    decode_floats,
    decode_timestamps,
    encode_floats,
    encode_timestamps,
)
from spectral_time_series_ray.functions.imputation import impute
from spectral_time_series_ray.functions.precondition import (
    forward_precondition,
    precondition_coefficients,
    reverse_precondition,
)

finite_or_special = st.one_of(
    st.floats(allow_nan=True, allow_infinity=True, width=64),
    st.just(0.0),
    st.just(-0.0),
)


@settings(max_examples=60, deadline=None)
@given(arrays(np.float64, st.integers(0, 300), elements=finite_or_special))
def test_gorilla_float_roundtrip_any_bits(x):
    out = decode_floats(encode_floats(x))
    np.testing.assert_array_equal(out.view(np.uint64), x.view(np.uint64))


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=300)
)
def test_gorilla_timestamp_roundtrip_any_int64(deltas):
    ts = np.cumsum(np.array(deltas, dtype=np.int64)) if deltas else np.array([], np.int64)
    np.testing.assert_array_equal(decode_timestamps(encode_timestamps(ts)), ts)


@settings(max_examples=40, deadline=None)
@given(
    arrays(np.float64, st.integers(1, 200),
           elements=st.floats(min_value=-1e6, max_value=1e6, allow_nan=False)),
    st.sampled_from(["chebyshev", "legendre"]),
    st.integers(1, 6),
)
def test_precondition_roundtrip_property(x, poly, degree):
    c = precondition_coefficients(poly, degree)
    rec = reverse_precondition(forward_precondition(x, c), c)
    np.testing.assert_allclose(rec, x, atol=1e-6 * max(1.0, np.abs(x).max()))


@settings(max_examples=40, deadline=None)
@given(
    arrays(np.float64, st.integers(1, 100),
           elements=st.one_of(st.floats(min_value=-1e3, max_value=1e3, allow_nan=False), st.just(np.nan))),
    st.sampled_from(["locf", "linear", "causal_mean", "dummy"]),
)
def test_impute_properties(x, method):
    out = impute(x, method)
    # no NaNs remain, idempotent, observed values untouched
    assert not np.isnan(out).any()
    np.testing.assert_array_equal(impute(out, method), out)
    obs = ~np.isnan(x)
    np.testing.assert_array_equal(out[obs], x[obs])
