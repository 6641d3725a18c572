"""Tests for the skew-aware hybrid join."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def skewed_tables():
    rng = np.random.default_rng(42)
    # zipf-ish fact: key 7 owns ~half the rows (the straggler key)
    keys = np.where(rng.random(4000) < 0.5, 7, rng.integers(0, 500, 4000))
    fact = pd.DataFrame(
        {"k": keys.astype(np.int64), "v": rng.integers(0, 100, 4000).astype(np.int64)}
    )
    dim = pd.DataFrame(
        {"dk": np.arange(500, dtype=np.int64),
         "label": [f"lab{i % 13}" for i in range(500)]}
    )
    return fact, dim


@pytest.mark.usefixtures("ray_session")
def test_skew_join_equals_plain_merge(skewed_tables):
    import ray.data

    from spectral_time_series_ray.stages.join import skew_join

    fact, dim = skewed_tables
    out = (
        skew_join(
            ray.data.from_pandas(fact).repartition(8),
            ray.data.from_pandas(dim).repartition(2),
            fact_key="k", dim_key="dk", hot_k=16, num_partitions=4,
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    exp = (
        fact.merge(dim, left_on="k", right_on="dk")
        .drop(columns=["dk"])
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[["k", "v", "label"]], exp[["k", "v", "label"]])


@pytest.mark.usefixtures("ray_session")
def test_skew_join_detects_hot_key(skewed_tables):
    import ray.data

    from spectral_time_series_ray.stages.distinct import heavy_hitters

    fact, _ = skewed_tables
    hot = heavy_hitters(ray.data.from_pandas(fact).repartition(8), "k", k=16)
    # the planted straggler key must be routed to the broadcast path
    assert 7 in set(hot["item"])


@pytest.mark.usefixtures("ray_session")
def test_skew_join_no_skew_still_exact():
    import ray.data

    from spectral_time_series_ray.stages.join import skew_join

    fact = pd.DataFrame({"k": np.arange(50, dtype=np.int64), "v": np.ones(50, dtype=np.int64)})
    dim = pd.DataFrame({"dk": np.arange(0, 100, 2, dtype=np.int64), "label": ["x"] * 50})
    out = skew_join(
        ray.data.from_pandas(fact), ray.data.from_pandas(dim),
        fact_key="k", dim_key="dk", hot_k=8, num_partitions=2,
    ).to_pandas()
    # inner-join semantics: only even keys survive
    assert sorted(out["k"]) == list(range(0, 50, 2))


@pytest.mark.usefixtures("ray_session")
def test_skew_join_hot_threshold(skewed_tables):
    """Equality holds at both threshold extremes: forced-broadcast
    (hot_min_count=1 routes every MG survivor hot) and forced-plain
    (huge threshold -> empty hot set, single hash join)."""
    import ray.data

    from spectral_time_series_ray.stages.join import skew_join

    fact, dim = skewed_tables
    exp = (
        fact.merge(dim, left_on="k", right_on="dk")
        .drop(columns=["dk"])
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    for hot_min in (1, 10**9):
        out = (
            skew_join(
                ray.data.from_pandas(fact).repartition(8),
                ray.data.from_pandas(dim).repartition(2),
                fact_key="k", dim_key="dk", hot_k=16, num_partitions=4,
                hot_min_count=hot_min,
            )
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out[["k", "v", "label"]], exp[["k", "v", "label"]])
