"""rollup_transcripts_multi == rollup_transcripts per tier.

Both compute per-(conv, bucket) stats from RAW rows inside the same
conv-hash partitioning, so every column — including the non-mergeable
p50/p99 — must match bit-exactly per tier."""

import numpy as np
import pandas as pd


def test_multi_equals_per_tier(ray_session):
    import ray.data

    from spectral_time_series_ray.sources.transcripts import generate_transcripts
    from spectral_time_series_ray.stages.rollup import (
        rollup_transcripts,
        rollup_transcripts_multi,
    )

    tbl = generate_transcripts(30_000, seed=7)
    src = ray.data.from_arrow(tbl)
    multi = rollup_transcripts_multi(src, ["1m", "1h", "1d"]).to_pandas()
    assert set(multi["tier"]) == {"1m", "1h", "1d"}

    for tier in ("1m", "1h", "1d"):
        got = (
            multi[multi["tier"] == tier]
            .drop(columns=["tier"])
            .sort_values(["conv_id", "bucket_ts"])
            .reset_index(drop=True)
        )
        exp = (
            rollup_transcripts(ray.data.from_arrow(tbl), tier)
            .to_pandas()
            .sort_values(["conv_id", "bucket_ts"])
            .reset_index(drop=True)
        )
        assert list(got.columns) == list(exp.columns), tier
        assert len(got) == len(exp), tier
        for c in exp.columns:
            g, e = got[c].to_numpy(), exp[c].to_numpy()
            if exp[c].dtype.kind == "f":
                gq = np.where(np.isnan(g.astype(np.float64)), np.nan, g)
                eq = np.where(np.isnan(e.astype(np.float64)), np.nan, e)
                assert (gq.view(np.int64) == eq.view(np.int64)).all(), (tier, c)
            else:
                assert (g == e).all(), (tier, c)


def test_multi_tier_filter_feeds_downstream(ray_session):
    """filter(tier == '1m') must reproduce the exact single-tier
    rollup the gap-fill stage expects (lazy stage, no re-shuffle)."""
    import ray.data

    from spectral_time_series_ray.sources.transcripts import generate_transcripts
    from spectral_time_series_ray.stages.rollup import (
        rollup_transcripts,
        rollup_transcripts_multi,
    )

    tbl = generate_transcripts(8_000, seed=8)
    allt = rollup_transcripts_multi(
        ray.data.from_arrow(tbl), ["1m", "1h"]
    ).materialize()
    m1 = allt.filter(expr="tier == '1m'").drop_columns(["tier"])
    got = m1.to_pandas().sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True)
    exp = (
        rollup_transcripts(ray.data.from_arrow(tbl), "1m")
        .to_pandas()
        .sort_values(["conv_id", "bucket_ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
