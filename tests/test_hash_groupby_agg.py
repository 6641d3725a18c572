"""hash_groupby_agg: mixed sum/min/max grouped aggregate must equal a
single-process pandas groupby bit-exactly (int columns) on skewed
high-cardinality keys, including the multi-key form."""

import numpy as np
import pandas as pd


def _src(ray_session, df):
    import pyarrow as pa
    import ray.data

    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_mixed_aggs_match_pandas(ray_session):
    from spectral_time_series_ray.stages.join import hash_groupby_agg

    rng = np.random.default_rng(9)
    n = 50_000
    df = pd.DataFrame(
        {
            "k": rng.zipf(1.3, n).astype(np.int64) % 5000,  # skewed keys
            "a": rng.integers(-1000, 1000, n).astype(np.int64),
            "b": rng.integers(0, 10**9, n).astype(np.int64),
            "c": rng.integers(-50, 50, n).astype(np.int64),
        }
    )
    got = (
        hash_groupby_agg(_src(ray_session, df), "k", {"a": "sum", "b": "min", "c": "max"})
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        df.groupby("k", as_index=False)
        .agg({"a": "sum", "b": "min", "c": "max"})
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)


def test_multi_key(ray_session):
    from spectral_time_series_ray.stages.join import hash_groupby_agg

    rng = np.random.default_rng(10)
    n = 10_000
    df = pd.DataFrame(
        {
            "k1": rng.integers(0, 40, n).astype(np.int64),
            "k2": rng.integers(0, 25, n).astype(np.int64),
            "v": rng.integers(0, 1000, n).astype(np.int64),
        }
    )
    got = (
        hash_groupby_agg(_src(ray_session, df), ("k1", "k2"), {"v": "min"})
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    exp = (
        df.groupby(["k1", "k2"], as_index=False)
        .agg({"v": "min"})
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)
