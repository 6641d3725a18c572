"""Incremental keyed-state aggregation == batch rollup (§2.9)."""

import numpy as np
import pandas as pd

from spectral_time_series_ray.stages.streaming import StreamingAggregator


def test_incremental_equals_batch(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    n = 30_000
    df = pd.DataFrame(
        {
            "user": rng.integers(0, 50, n),
            "ts": pd.to_datetime(rng.permutation(n), unit="s"),
            "value": rng.normal(10, 5, n),
        }
    )
    ds = ray.data.from_pandas(df).materialize()

    agg = StreamingAggregator(n_buckets=3).consume(ds, "user", "value", ts_col="ts", batch_size=4096)
    inc = agg.result()

    batch = (
        df.groupby("user")["value"]
        .agg(["count", "sum", "min", "max"])
        .reset_index()
        .rename(columns={"user": "key"})
        .sort_values("key")
        .reset_index(drop=True)
    )
    assert len(inc) == len(batch) == 50
    np.testing.assert_array_equal(inc["key"].to_numpy(), batch["key"].to_numpy())
    np.testing.assert_array_equal(inc["count"].to_numpy(), batch["count"].to_numpy())
    np.testing.assert_allclose(inc["sum"].to_numpy(), batch["sum"].to_numpy(), rtol=1e-9)
    np.testing.assert_allclose(inc["min"].to_numpy(), batch["min"].to_numpy())
    np.testing.assert_allclose(inc["max"].to_numpy(), batch["max"].to_numpy())
