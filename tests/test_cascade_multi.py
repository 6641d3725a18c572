"""cascade_multi == sequential cascade() per tier.

Counts/min/max must be bit-identical; sums and means may differ only
by float summation ORDER (1m->1d direct vs 1m->1h->1d), so they get
an associativity-scale tolerance."""

import numpy as np
import pandas as pd


def _rollup_fixture(ray_session):
    import pyarrow as pa
    import ray.data

    from spectral_time_series_ray.stages.rollup import rollup_mergeable

    rng = np.random.default_rng(42)
    n = 20_000
    df = pd.DataFrame(
        {
            "conv_id": [f"c{int(i)}" for i in rng.integers(0, 60, n)],
            "ts": (
                pd.Timestamp("2024-02-01")
                + pd.to_timedelta(rng.integers(0, 5 * 86_400, n), unit="s")
            ).astype("datetime64[us]"),
            "latency_s": np.round(rng.exponential(1.5, n), 3),
            "text_len": rng.integers(1, 500, n).astype(np.float64),
        }
    )
    df.loc[rng.random(n) < 0.03, "latency_s"] = np.nan
    src = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    return rollup_mergeable(src, "1m").materialize()


def test_cascade_multi_matches_sequential(ray_session):
    from spectral_time_series_ray.stages.rollup import cascade, cascade_multi

    m1 = _rollup_fixture(ray_session)
    multi = cascade_multi(m1, ["1h", "1d"]).to_pandas()
    assert set(multi["tier"]) == {"1h", "1d"}

    h1 = cascade(m1, "1h").materialize()
    seq = {"1h": h1.to_pandas(), "1d": cascade(h1, "1d").to_pandas()}

    for tier, exp in seq.items():
        got = (
            multi[multi["tier"] == tier]
            .drop(columns=["tier"])
            .sort_values(["conv_id", "bucket_ts"])
            .reset_index(drop=True)
        )
        exp = exp.sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True)
        assert set(got.columns) == set(exp.columns)
        got = got[exp.columns.tolist()]
        assert len(got) == len(exp)
        for c in exp.columns:
            g, e = got[c].to_numpy(), exp[c].to_numpy()
            if c.startswith(("sum_", "mean_")):
                both_nan = pd.isna(g) & pd.isna(e)
                close = np.isclose(
                    g.astype(np.float64), e.astype(np.float64),
                    rtol=1e-12, atol=1e-12, equal_nan=True,
                )
                assert (both_nan | close).all(), c
            elif exp[c].dtype.kind == "f":
                both_nan = pd.isna(g) & pd.isna(e)
                assert (both_nan | (g == e)).all(), c  # min/max bit-exact
            else:
                assert (g == e).all(), c
