"""Tests for the Count-Min sketch and bottom-k order sampling."""

import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.functions.cms import CountMinSketch


def _zipf_stream(n=20000, seed=0):
    rng = np.random.default_rng(seed)
    return rng.zipf(1.5, n) % 1000


def test_cms_overcount_only_and_bounded():
    x = _zipf_stream()
    sk = CountMinSketch(width=2048, depth=4)
    uniq, counts = np.unique(x, return_counts=True)
    sk.add_hashes(uniq.astype(np.uint64), counts)
    est = sk.query_hashes(uniq.astype(np.uint64))
    assert (est >= counts).all()  # CMS never undercounts
    bound = sk.error_bound()
    # the (e/w)*N bound holds per query w.p. 1 - e^-4 ~ 98%;
    # allow a small number of exceedances across 1000 queries
    frac_bad = float((est - counts > bound).mean())
    assert frac_bad < 0.05
    assert sk.n_total == len(x)


def test_cms_merge_equals_single():
    x = _zipf_stream(seed=1)
    a, b = x[:7000], x[7000:]
    whole = CountMinSketch(512, 4)
    whole.add_hashes(x.astype(np.uint64))
    pa_, pb = CountMinSketch(512, 4), CountMinSketch(512, 4)
    pa_.add_hashes(a.astype(np.uint64))
    pb.add_hashes(b.astype(np.uint64))
    merged = pa_.merge(pb)
    assert np.array_equal(merged.table, whole.table)
    assert merged.n_total == whole.n_total


def test_cms_roundtrip_bytes():
    sk = CountMinSketch(256, 3)
    sk.add_hashes(np.arange(100, dtype=np.uint64))
    back = CountMinSketch.from_bytes(sk.to_bytes())
    assert np.array_equal(back.table, sk.table)
    assert (back.width, back.depth, back.n_total) == (256, 3, 100)


def test_freq_cms_stage_matches_exact(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.distinct import (
        cms_point_estimates,
        freq_cms,
    )

    rng = np.random.default_rng(2)
    df = pd.DataFrame({"user_id": rng.zipf(1.4, 30000) % 500})
    ds = ray.data.from_pandas(df).repartition(8)
    cms = freq_cms(ds, "user_id", width=4096, depth=4)
    exact = df["user_id"].value_counts()
    est = cms_point_estimates(cms, exact.index.to_numpy())
    assert (est >= exact.to_numpy()).all()
    assert (est - exact.to_numpy() <= cms.error_bound()).mean() > 0.95
    assert cms.n_total == len(df)


def test_bottom_k_sample_exact_and_deterministic(ray_session):
    import ray.data

    from spectral_time_series_ray.functions.bloom import hash_u64
    from spectral_time_series_ray.stages.sampling import bottom_k_sample

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 30, 2000).astype(np.int64),
            "event_id": np.arange(2000, dtype=np.int64),
            "value": rng.normal(size=2000),
        }
    )
    k, seed = 5, 42

    def direct(df):
        tags = hash_u64(
            hash_u64(df["event_id"].to_numpy().astype(np.uint64)) ^ np.uint64(seed)
        )
        d = df.assign(_t=tags)
        return (
            d.sort_values("_t", kind="stable")
            .groupby("user_id", sort=False)
            .head(k)["event_id"]
            .sort_values()
            .to_numpy()
        )

    exp = direct(df)
    for parts in (2, 13):
        ds = ray.data.from_pandas(df).repartition(parts)
        got = (
            bottom_k_sample(ds, key="user_id", id_col="event_id", k=k, seed=seed)
            .to_pandas()["event_id"]
            .sort_values()
            .to_numpy()
        )
        # exact same sample regardless of partitioning
        assert np.array_equal(got, exp)

    # per-key sizes: min(k, n_key)
    out = bottom_k_sample(
        ray.data.from_pandas(df), key="user_id", id_col="event_id", k=k, seed=seed
    ).to_pandas()
    sizes = out.groupby("user_id").size()
    navail = df.groupby("user_id").size()
    for uid, s in sizes.items():
        assert s == min(k, navail[uid])

    # different seed -> different sample (w.h.p.)
    other = bottom_k_sample(
        ray.data.from_pandas(df), key="user_id", id_col="event_id", k=k, seed=7
    ).to_pandas()["event_id"].sort_values().to_numpy()
    assert not np.array_equal(other, exp)


def test_bottom_k_sample_is_uniform(ray_session):
    """Chi-square sanity: over many seeds, each of a key's rows is
    selected ~uniformly."""
    import ray.data

    from spectral_time_series_ray.stages.sampling import bottom_k_sample

    df = pd.DataFrame(
        {"g": np.zeros(20, dtype=np.int64), "rid": np.arange(20, dtype=np.int64)}
    )
    ds = ray.data.from_pandas(df)
    counts = np.zeros(20)
    n_seeds = 60
    for s in range(n_seeds):
        got = bottom_k_sample(ds, key="g", id_col="rid", k=5, seed=s).to_pandas()
        counts[got["rid"].to_numpy()] += 1
    # expected n_seeds * 5/20 = 15 per row; chi-square 19 dof
    expected = n_seeds * 5 / 20
    chi2 = float(((counts - expected) ** 2 / expected).sum())
    assert chi2 < 43.8  # p=0.001 critical value for 19 dof
