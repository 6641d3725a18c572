"""Adaptive join planning: sketch statistics + strategy selection."""

import numpy as np
import pandas as pd
import pytest


def test_cms_inner_product_join_size():
    from spectral_time_series_ray.functions.cms import CountMinSketch
    from spectral_time_series_ray.functions.bloom import hash_u64

    rng = np.random.default_rng(7)
    # zipf-ish key multiplicities on both sides
    ka = rng.integers(0, 500, size=20000).astype(np.uint64)
    kb = rng.integers(0, 500, size=8000).astype(np.uint64)
    fa = pd.Series(ka).value_counts()
    fb = pd.Series(kb).value_counts()
    exact = int((fa * fb).dropna().sum())

    a = CountMinSketch(width=4096, depth=4).add_hashes(hash_u64(ka))
    b = CountMinSketch(width=4096, depth=4).add_hashes(hash_u64(kb))
    est = a.inner_product(b)
    # CMS inner product never underestimates; additive error bound
    assert est >= exact
    assert est <= exact + 4 * (np.e / 4096) * len(ka) * len(kb)
    # expected collision bias is ~ Na*Nb/width ~= 39k here; the min
    # over depth rows lands well under that
    assert abs(est - exact) / exact < 0.15


def test_join_stats_counts(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.join import join_stats

    df = pd.DataFrame({"k": np.repeat(np.arange(100, dtype=np.int64), 10),
                       "v": np.arange(1000)})
    st = join_stats(ray.data.from_pandas(df).repartition(4), "k")
    assert st["n_rows"] == 1000
    assert abs(st["n_distinct"] - 100) < 5  # below KMV capacity -> exact-ish
    # uniform keys: Misra-Gries correctly reports NO heavy hitters
    assert st["mg"] == {} or max(st["mg"].values()) <= 10

    skew = pd.DataFrame({"k": np.r_[np.full(500, 7), np.arange(100)].astype(np.int64)})
    skew["v"] = 0
    st2 = join_stats(ray.data.from_pandas(skew).repartition(4), "k")
    assert st2["mg"].get(7, 0) >= 400  # the hot key survives the summary


def test_auto_join_strategies_agree(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.join import auto_join

    rng = np.random.default_rng(11)
    dim = pd.DataFrame({"k": np.arange(200, dtype=np.int64),
                        "name": [f"d{i}" for i in range(200)]})
    # skewed fact: key 7 is red-hot
    fact_keys = np.concatenate([
        rng.integers(0, 200, size=3000), np.full(3000, 7)]).astype(np.int64)
    fact = pd.DataFrame({"k": fact_keys, "x": np.arange(len(fact_keys))})
    exp = fact.merge(dim, on="k", how="inner")

    def canon(df):
        cols = sorted(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True)

    f_ds = ray.data.from_pandas(fact).repartition(4)
    d_ds = ray.data.from_pandas(dim).repartition(2)

    # small side under the limit -> broadcast
    out, dec = auto_join(f_ds, d_ds, on="k")
    assert dec["strategy"] == "broadcast"
    pd.testing.assert_frame_equal(canon(out.to_pandas()), canon(exp))

    # forced past broadcast: hot key + unique dim -> skew
    out2, dec2 = auto_join(f_ds, d_ds, on="k", broadcast_limit=10)
    assert dec2["strategy"] == "skew"
    assert dec2["left_hot_ratio"] >= 8.0
    pd.testing.assert_frame_equal(canon(out2.to_pandas()), canon(exp))

    # no skew, no broadcast -> shuffle
    flat = pd.DataFrame({"k": rng.integers(0, 200, size=4000).astype(np.int64)})
    flat["x"] = np.arange(len(flat))
    out3, dec3 = auto_join(ray.data.from_pandas(flat).repartition(4), d_ds,
                           on="k", broadcast_limit=10, skew_ratio=8.0)
    assert dec3["strategy"] == "shuffle"
    exp3 = flat.merge(dim, on="k", how="inner")
    pd.testing.assert_frame_equal(canon(out3.to_pandas()), canon(exp3))

    # the CMS estimate brackets the real output size
    assert dec["est_join_rows"] >= len(exp)
    assert dec["est_join_rows"] <= int(len(exp) * 1.2) + 100


def test_auto_join_bloom_pushdown(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.join import auto_join

    rng = np.random.default_rng(23)
    # left keys 0..9999, right covers only 0..999 -> ~10% overlap
    left = pd.DataFrame({"k": rng.integers(0, 10000, size=5000).astype(np.int64)})
    left["x"] = np.arange(len(left))
    right = pd.DataFrame({"k": rng.integers(0, 1000, size=4000).astype(np.int64)})
    right["y"] = np.arange(len(right))
    exp = left.merge(right, on="k", how="inner")

    out, dec = auto_join(ray.data.from_pandas(left).repartition(4),
                         ray.data.from_pandas(right).repartition(4),
                         on="k", broadcast_limit=10, skew_ratio=1e9)
    assert dec["strategy"] == "shuffle"
    assert dec.get("bloom_prefilter") == "left"

    def canon(df):
        cols = sorted(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(out.to_pandas()), canon(exp))


def test_auto_join_left_outer(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.join import auto_join

    rng = np.random.default_rng(31)
    left = pd.DataFrame({"k": rng.integers(0, 2000, size=3000).astype(np.int64)})
    left["x"] = np.arange(len(left))
    right = pd.DataFrame({"k": np.arange(300, dtype=np.int64),
                          "y": np.arange(300)})
    exp = left.merge(right, on="k", how="left")

    def canon(df):
        cols = sorted(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True)

    l_ds = ray.data.from_pandas(left).repartition(4)
    r_ds = ray.data.from_pandas(right).repartition(2)

    # small right side -> broadcast-left
    out, dec = auto_join(l_ds, r_ds, on="k", how="left")
    assert dec["strategy"] == "broadcast"
    pd.testing.assert_frame_equal(canon(out.to_pandas()), canon(exp))

    # forced shuffle: unmatched left rows must survive; only the RIGHT
    # side may be Bloom-prefiltered in a left join
    out2, dec2 = auto_join(l_ds, r_ds, on="k", how="left", broadcast_limit=10)
    assert dec2["strategy"] == "shuffle"
    assert dec2.get("bloom_prefilter") != "left"
    pd.testing.assert_frame_equal(canon(out2.to_pandas()), canon(exp))


def test_auto_join_skew_correct_with_near_unique_dim(ray_session):
    """The KMV uniqueness band can admit a dimension with a few
    duplicate keys into the skew path; both skew sub-paths (broadcast
    hot slice, shuffled cold join) carry the multiplicity, so results
    must still equal the pandas merge."""
    import ray.data

    from spectral_time_series_ray.stages.join import auto_join

    rng = np.random.default_rng(41)
    dim = pd.DataFrame({"k": np.r_[np.arange(300), np.arange(12)].astype(np.int64)})
    dim["name"] = [f"d{i}" for i in range(len(dim))]  # 4% dup keys
    keys = np.concatenate([rng.integers(0, 300, size=2500),
                           np.full(2500, 7)]).astype(np.int64)
    fact = pd.DataFrame({"k": keys, "x": np.arange(len(keys))})
    exp = fact.merge(dim, on="k", how="inner")

    out, dec = auto_join(ray.data.from_pandas(fact).repartition(4),
                         ray.data.from_pandas(dim).repartition(2),
                         on="k", broadcast_limit=10, skew_ratio=4.0)
    assert dec["strategy"] == "skew"  # dup fraction inside the KMV band

    def canon(df):
        cols = sorted(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(out.to_pandas()), canon(exp))
