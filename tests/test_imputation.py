import numpy as np
import pytest

from spectral_time_series_ray.functions.imputation import (
    causal_mean_impute,
    dummy_impute,
    impute,
    linear_impute,
    locf_impute,
)

NAN = np.nan


def test_locf_fixture():
    # FIXTURES.md §3: [nan, 1, nan, nan, 4, nan] -> [0, 1, 1, 1, 4, 4]
    x = np.array([NAN, 1, NAN, NAN, 4, NAN])
    np.testing.assert_array_equal(locf_impute(x), [0, 1, 1, 1, 4, 4])


def test_locf_no_leading_nan():
    x = np.array([2.0, NAN, 3.0, NAN, NAN])
    np.testing.assert_array_equal(locf_impute(x), [2, 2, 3, 3, 3])


def test_locf_custom_fill():
    np.testing.assert_array_equal(locf_impute(np.array([NAN, 5.0]), value=9.0), [9, 5])


def test_locf_does_not_mutate():
    x = np.array([NAN, 1.0])
    locf_impute(x)
    assert np.isnan(x[0])


def test_dummy():
    np.testing.assert_array_equal(dummy_impute(np.array([NAN, 2.0]), 7.0), [7, 2])


def test_causal_mean():
    # reference CausalMeanImputation: LOCF first, then NaN positions get
    # the causal mean of the filled prefix
    x = np.array([1.0, 2.0, NAN, 4.0])
    out = causal_mean_impute(x)
    # position 2: mean of [1,2] = 1.5
    np.testing.assert_allclose(out, [1.0, 2.0, 1.5, 4.0])


def test_causal_mean_leading():
    x = np.array([NAN, 2.0, NAN])
    out = causal_mean_impute(x)
    # pos0 -> 0.0 (LOCF leading rule); pos2 -> mean of [0, 2] = 1.0
    np.testing.assert_allclose(out, [0.0, 2.0, 1.0])


def test_linear():
    x = np.array([1.0, NAN, NAN, 4.0])
    np.testing.assert_allclose(linear_impute(x), [1, 2, 3, 4])


def test_linear_edges():
    x = np.array([NAN, 2.0, NAN])
    np.testing.assert_allclose(linear_impute(x), [2, 2, 2])


def test_linear_all_nan():
    np.testing.assert_array_equal(linear_impute(np.array([NAN, NAN])), [0, 0])


@pytest.mark.parametrize("method", ["dummy", "locf", "causal_mean", "linear"])
def test_impute_noop_without_nan(method):
    x = np.array([1.0, 2.0, 3.0])
    np.testing.assert_array_equal(impute(x, method), x)


def test_idempotence():
    x = np.array([NAN, 1.0, NAN, 4.0])
    once = impute(x, "locf")
    np.testing.assert_array_equal(impute(once, "locf"), once)


def test_seasonal_impute_semantics():
    import numpy as np

    from spectral_time_series_ray.functions.imputation import (
        IMPUTERS,
        locf_impute,
        seasonal_impute,
    )

    x = np.full(60, np.nan)
    x[0], x[5], x[30] = 10.0, 5.0, 7.0
    out = seasonal_impute(x, 24)
    assert out[24] == 10.0 and out[29] == 5.0  # raw value one period back
    assert out[3] == 10.0  # no seasonal candidate -> raw LOCF
    assert out[31] == 7.0  # candidate slot unobserved -> raw LOCF
    assert out[30] == 7.0 and out[5] == 5.0  # observed slots unchanged
    # fills never feed fills: out[53] candidate is x[29] (unobserved RAW)
    # even though out[29] was filled, so LOCF wins
    assert out[53] == 7.0
    y = np.arange(10.0)
    assert np.array_equal(seasonal_impute(y, 3), y)
    z = np.array([1.0, np.nan, np.nan])
    assert np.array_equal(seasonal_impute(z, 5), locf_impute(z))
    assert np.array_equal(IMPUTERS["seasonal24"](x), seasonal_impute(x, 24))
