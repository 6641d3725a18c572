"""Tests for A-ES weighted sampling and the Poisson bootstrap."""

import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_weighted_sample_partition_invariant():
    import ray.data

    from spectral_time_series_ray.stages.sampling import weighted_sample_aes

    rng = np.random.default_rng(1)
    df = pd.DataFrame(
        {"id": np.arange(2000, dtype=np.int64),
         "w": rng.uniform(0.1, 10.0, 2000)}
    )
    a = weighted_sample_aes(ray.data.from_pandas(df).repartition(3), "id", "w", k=40)
    b = weighted_sample_aes(ray.data.from_pandas(df).repartition(11), "id", "w", k=40)
    assert a["id"].tolist() == b["id"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_weighted_sample_inclusion_bias():
    """Heavy rows must be sampled far more often: with half the rows at
    weight 100 and half at weight 1, a k=100 sample of 2000 rows should
    be dominated by heavy ids."""
    import ray.data

    from spectral_time_series_ray.stages.sampling import weighted_sample_aes

    n = 2000
    df = pd.DataFrame(
        {"id": np.arange(n, dtype=np.int64),
         "w": np.where(np.arange(n) < n // 2, 100.0, 1.0)}
    )
    s = weighted_sample_aes(ray.data.from_pandas(df), "id", "w", k=100, seed=3)
    heavy = (s["id"] < n // 2).mean()
    assert heavy > 0.9


@pytest.mark.usefixtures("ray_session")
def test_weighted_sample_zero_weight_never_sampled():
    import ray.data

    from spectral_time_series_ray.stages.sampling import weighted_sample_aes

    # zero weight = inclusion probability 0 (A-ES limit w -> 0);
    # negative weights are an error
    df = pd.DataFrame({"id": [1, 2, 3], "w": [1.0, 0.0, 2.0]})
    top = weighted_sample_aes(ray.data.from_pandas(df), "id", "w", k=2)
    assert set(top["id"]) == {1, 3}
    with pytest.raises(Exception):
        weighted_sample_aes(
            ray.data.from_pandas(pd.DataFrame({"id": [1], "w": [-1.0]})),
            "id", "w", k=1,
        )


def test_poisson1_inverse_cdf_moments():
    from spectral_time_series_ray.stages.sampling import _poisson1_inverse_cdf

    rng = np.random.default_rng(5)
    u = rng.uniform(0, 1, 200_000)
    x = _poisson1_inverse_cdf(u)
    assert abs(x.mean() - 1.0) < 0.01  # Poisson(1): mean 1
    assert abs(x.var() - 1.0) < 0.02  # variance 1
    assert x.min() >= 0


@pytest.mark.usefixtures("ray_session")
def test_poisson_bootstrap_layout_invariant_and_covers_mean():
    import ray.data

    from spectral_time_series_ray.stages.sampling import poisson_bootstrap_mean

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {"id": np.arange(5000, dtype=np.int64), "v": rng.normal(10.0, 2.0, 5000)}
    )
    m1, lo1, hi1, n1, r1 = poisson_bootstrap_mean(
        ray.data.from_pandas(df).repartition(4), "id", "v", n_replicas=100
    )
    _, _, _, _, r2 = poisson_bootstrap_mean(
        ray.data.from_pandas(df).repartition(9), "id", "v", n_replicas=100
    )
    np.testing.assert_allclose(r1, r2, atol=1e-9)
    assert n1 == 5000
    true = df["v"].mean()
    assert lo1 <= true <= hi1
    # CLT sanity: half-width near 1.96 * 2 / sqrt(5000) ~ 0.055
    assert 0.02 < (hi1 - lo1) / 2 < 0.15
