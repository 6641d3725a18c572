"""Random training-crop, patch-size selection, samplers, fractional
weights, and per-freq padding — property tests mirroring the
reference's test strategy (`uni2ts/test/transform/test_crop.py:27-60`:
every crop is a contiguous slice of whole-patch multiples)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spectral_time_series_ray.functions.patch import (
    get_patch_size,
    pad_freq,
    pad_to_min_length,
    patch_crop_bounds,
    patch_size_constraints,
)
from spectral_time_series_ray.stages.sampling import (
    beta_binomial_sampler,
    binomial_sampler,
    get_sampler,
    uniform_sampler,
    weighted_union,
)


def test_min_max_validation():
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError):
        patch_crop_bounds(100, 8, 32, 31, rng)


@settings(max_examples=200, deadline=None)
@given(
    time=st.integers(20, 5000),
    patch_size=st.sampled_from([1, 2, 8, 16, 32]),
    seed=st.integers(0, 1000),
    offset=st.booleans(),
)
def test_patch_crop_properties(time, patch_size, seed, offset):
    """Every crop: in-bounds, contiguous, whole-patch multiple, patch
    count within [min, max] (reference test_crop.py invariants)."""
    rng = np.random.default_rng(seed)
    min_tp, max_p = 2, 64
    if time // patch_size < min_tp:
        return
    a, b = patch_crop_bounds(time, patch_size, min_tp, max_p, rng, offset=offset)
    assert 0 <= a < b <= time
    n = (b - a) // patch_size
    assert (b - a) % patch_size == 0
    assert min_tp <= n <= max_p
    if not offset:
        assert a % patch_size == 0
    # contiguity: the crop of arange IS a contiguous run
    v = np.arange(time, dtype=float)[a:b]
    assert (np.diff(v) == 1.0).all()


def test_patch_crop_flatten_divides_budget():
    rng = np.random.default_rng(1)
    # nvar=4 with flatten: max time-patches = 64 // 4 = 16
    for _ in range(50):
        a, b = patch_crop_bounds(
            4096, 8, 2, 64, rng, nvar=4, will_flatten=True
        )
        assert (b - a) // 8 <= 16


def test_get_patch_size_constraint_intersection():
    rng = np.random.default_rng(0)
    # 1m tier -> 'T' range (32, 128]; candidates also must fit
    # length // min_time_patches
    sizes = {get_patch_size(4096, "1m", 2, rng=rng) for _ in range(100)}
    assert sizes <= {32, 64, 128}
    # hourly: (32, 64)
    sizes_h = {get_patch_size(4096, "1h", 2, rng=rng) for _ in range(100)}
    assert sizes_h <= {32, 64}
    # short series clamps the ceiling: length 70, min 2 -> ceil 35 -> {32}
    assert get_patch_size(70, "T", 2, rng=rng) == 32
    # no candidate -> ValueError (too short)
    with pytest.raises(ValueError):
        get_patch_size(10, "1m", 2, rng=rng)
    # range-typed candidate set
    s = get_patch_size(4096, "D", 2, patch_sizes=range(1, 256), rng=rng)
    assert 16 <= s <= 32


def test_patch_size_constraints_parsing():
    assert patch_size_constraints("10T") == range(32, 129)
    assert patch_size_constraints("min") == range(32, 129)
    assert patch_size_constraints("H") == range(32, 65)
    assert patch_size_constraints("1h") == range(32, 65)
    assert patch_size_constraints("1d") == range(16, 33)
    with pytest.raises(ValueError):
        patch_size_constraints("fortnight")


@settings(max_examples=100, deadline=None)
@given(n=st.integers(1, 1000), seed=st.integers(0, 100))
def test_samplers_in_range(n, seed):
    rng = np.random.default_rng(seed)
    for fn in (uniform_sampler,
               lambda m, r: binomial_sampler(m, r, p=0.3),
               lambda m, r: beta_binomial_sampler(m, r, a=2, b=5)):
        v = int(fn(n, rng))
        assert 1 <= v <= n
    # vectorized
    arr = np.full(32, n)
    vs = binomial_sampler(arr, rng)
    assert ((1 <= vs) & (vs <= n)).all()


def test_get_sampler_registry():
    rng = np.random.default_rng(0)
    for name in ("uniform", "binomial", "beta_binomial"):
        assert 1 <= int(get_sampler(name)(10, rng)) <= 10
    with pytest.raises(NotImplementedError):
        get_sampler("zipf")


def test_pad_to_min_length_and_pad_freq():
    rng = np.random.default_rng(3)
    v = np.arange(5, dtype=float)
    out = pad_to_min_length(v, 12, rng)
    assert out.shape == (12,)
    assert np.isnan(out).sum() == 7
    # the original run survives contiguously
    obs = out[~np.isnan(out)]
    np.testing.assert_array_equal(obs, v)
    # already long enough: unchanged
    np.testing.assert_array_equal(pad_to_min_length(v, 3, rng), v)
    # per-freq minimums
    m = {"1m": 16, "1h": 4}
    assert pad_freq(v, "1m", m, rng).shape == (16,)
    assert pad_freq(v, "1h", m, rng).shape == (5,)
    # 2-D pads last axis only
    mv = np.ones((3, 5))
    assert pad_freq(mv, "1m", m, rng).shape == (3, 16)


def test_weighted_union_fractional(ray_session):
    import ray.data

    df = pd.DataFrame(
        {"conv_id": np.repeat([f"c{i}" for i in range(4)], 5),
         "v": np.arange(20, dtype=np.float64)}
    )
    ds = ray.data.from_pandas(df).materialize()
    # weight 2.5 over 4 series -> ceil(4*2.5)=10 logical series =
    # 2 full copies + first 2 series extra
    out = weighted_union([(ds, 2.5)], key="conv_id").to_pandas()
    counts = out.groupby("conv_id")["v"].count()
    assert counts["c0"] == 15 and counts["c1"] == 15
    assert counts["c2"] == 10 and counts["c3"] == 10
    # integer weights unchanged; no key needed
    out2 = weighted_union([(ds, 2)]).to_pandas()
    assert len(out2) == 40
    with pytest.raises(ValueError):
        weighted_union([(ds, 1.5)])  # fractional without key


def test_train_crop_series(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.sampling import train_crop_series

    rows = []
    for ci, conv in enumerate(["a", "b", "c"]):
        n = 700 + 100 * ci
        rows.append(
            {"conv_id": conv, "chunk_idx": 0, "n_points": n,
             "ts": np.arange(n, dtype=np.int64) * 60_000_000,
             "values": np.arange(n, dtype=np.float64)}
        )
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = train_crop_series(
        ds, concurrency=2, freq="1m", min_time_patches=2, max_patches=16, seed=7
    ).to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert len(out) == 3
    for _, r in out.iterrows():
        assert r["n_points"] == r["crop_stop"] - r["crop_start"]
        assert r["n_points"] % r["patch_size"] == 0
        assert 2 <= r["n_points"] // r["patch_size"] <= 16
        v = np.asarray(r["values"])
        assert (np.diff(v) == 1.0).all()  # contiguous slice
        assert v[0] == r["crop_start"]
    # deterministic: rerun gives identical crops (resume invariant)
    out2 = train_crop_series(
        ds, concurrency=2, freq="1m", min_time_patches=2, max_patches=16, seed=7
    ).to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["conv_id", "crop_start", "crop_stop", "patch_size"]],
        out2[["conv_id", "crop_start", "crop_stop", "patch_size"]],
    )


@given(
    time=st.integers(4, 400),
    lo=st.floats(0.05, 0.5),
    span=st.floats(0.0, 0.4),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=60, deadline=None)
def test_masked_prediction_properties(time, lo, span, seed):
    """Mirrors reference MaskedPrediction semantics (task.py:54-63):
    mask length in [max(1,round(t*lo)), max(1,round(t*hi))], trailing
    block, aux truncated to context."""
    from spectral_time_series_ray.functions.task import masked_prediction

    hi = min(lo + span, 0.9)
    rng = np.random.default_rng(seed)
    target = np.arange(time, dtype=np.float64)[None, :]
    aux = np.arange(time, dtype=np.int64)[None, :]
    mask, trunc = masked_prediction(target, lo, hi, truncate={"ts": aux}, rng=rng)
    assert mask.shape == (1, time)
    mlen = int(mask[0].sum())
    assert max(1, round(time * lo)) <= mlen <= max(1, round(time * hi))
    # trailing contiguous block
    assert mask[0, -mlen:].all() and not mask[0, : time - mlen].any()
    # aux truncated to context steps, values preserved
    assert trunc["ts"].shape == (1, time - mlen)
    assert (trunc["ts"][0] == np.arange(time - mlen)).all()


def test_extend_mask_and_reshape_kernels():
    from spectral_time_series_ray.functions.task import (
        extend_mask,
        flat_pack,
        pack_fields,
        prediction_mask,
        sequencify,
        transpose,
    )

    m = prediction_mask(2, 10, 3)
    masks = extend_mask(m, {"feat_a": (2, 10), "feat_b": (1, 10)})
    assert len(masks) == 3
    assert masks[0].sum() == 6 and not masks[1].any() and not masks[2].any()
    assert masks[1].shape == (2, 10) and masks[2].shape == (1, 10)

    # PackFields: concat along variate axis, 1-D inputs promoted
    packed = pack_fields([np.ones(5), np.zeros((2, 5))])
    assert packed.shape == (3, 5)
    assert flat_pack([np.ones((2, 3)), np.zeros(4)]).shape == (10,)
    assert transpose(packed).shape == (5, 3)
    # SequencifyField: repeat along axis by target length
    seq = sequencify(np.array([[7.0]]), packed, axis=0, target_axis=0)
    assert seq.shape == (3, 1) and (seq == 7.0).all()


def test_masked_prediction_series(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.sampling import masked_prediction_series

    rows = []
    for ci, conv in enumerate(["a", "b", "c"]):
        n = 60 + 20 * ci
        rows.append(
            {"conv_id": conv, "chunk_idx": 0, "n_points": n,
             "ts": np.arange(n, dtype=np.int64) * 60_000_000,
             "values": np.arange(n, dtype=np.float64)}
        )
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = masked_prediction_series(
        ds, concurrency=2, min_mask_ratio=0.2, max_mask_ratio=0.4, seed=9
    ).to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert len(out) == 3
    for _, r in out.iterrows():
        n, mlen = int(r["n_points"]), int(r["mask_length"])
        assert max(1, round(n * 0.2)) <= mlen <= max(1, round(n * 0.4))
        pm = np.asarray(r["prediction_mask"])
        assert pm[-mlen:].all() and not pm[: n - mlen].any()
        assert len(np.asarray(r["context_ts"])) == n - mlen
    # deterministic rerun (resume invariant)
    out2 = masked_prediction_series(
        ds, concurrency=2, min_mask_ratio=0.2, max_mask_ratio=0.4, seed=9
    ).to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert (out["mask_length"].to_numpy() == out2["mask_length"].to_numpy()).all()


def test_get_seasonality():
    """gluonts-convention season lengths incl. multiplier division and
    engine tier aliases (reference calls get_seasonality for MASE at
    evaluation.py:77)."""
    from spectral_time_series_ray.functions.patch import get_seasonality

    assert get_seasonality("H") == 24
    assert get_seasonality("D") == 7
    assert get_seasonality("T") == 1440
    assert get_seasonality("10T") == 144
    assert get_seasonality("7D") == 1  # 7 does not leave a whole cycle
    assert get_seasonality("1m") == 1440  # engine tier = minutely
    assert get_seasonality("1h") == 24
    assert get_seasonality("1d") == 7
    with pytest.raises(ValueError):
        get_seasonality("fortnight")


def test_split_assign(ray_session):
    """Key-coherent deterministic splits: same key -> same split across
    batches/partitions/reruns; fractions near targets; bad fracs raise."""
    import ray.data

    from spectral_time_series_ray.stages.sampling import split_assign

    rng = np.random.default_rng(0)
    n_keys = 2000
    df = pd.DataFrame({
        "conv_id": np.repeat([f"c{i}" for i in range(n_keys)], 3),
        "v": np.arange(n_keys * 3),
    })
    ds = ray.data.from_pandas(df).repartition(7)
    out = split_assign(ds, "conv_id", {"train": 0.8, "val": 0.1, "test": 0.1},
                       seed=3).to_pandas()
    per = out.groupby("conv_id")["split"].nunique()
    assert (per == 1).all()  # key coherence across partitions
    key_split = out.drop_duplicates("conv_id").set_index("conv_id")["split"]
    fr = key_split.value_counts(normalize=True)
    assert abs(fr["train"] - 0.8) < 0.05 and abs(fr["val"] - 0.1) < 0.04
    # deterministic rerun
    out2 = split_assign(ds, "conv_id", {"train": 0.8, "val": 0.1, "test": 0.1},
                        seed=3).to_pandas()
    k2 = out2.drop_duplicates("conv_id").set_index("conv_id")["split"]
    assert key_split.sort_index().equals(k2.sort_index())
    # different seed -> different assignment (with overwhelming prob.)
    out3 = split_assign(ds, "conv_id", {"train": 0.8, "val": 0.1, "test": 0.1},
                        seed=4).to_pandas()
    k3 = out3.drop_duplicates("conv_id").set_index("conv_id")["split"]
    assert not key_split.sort_index().equals(k3.sort_index())
    # integer keys take the vectorized hash path
    dsi = ray.data.from_pandas(pd.DataFrame({"k": np.arange(1000), "v": 1.0}))
    oi = split_assign(dsi, "k", {"a": 0.5, "b": 0.5}).to_pandas()
    assert set(oi["split"]) == {"a", "b"}
    with pytest.raises(ValueError):
        split_assign(ds, "conv_id", {"a": 0.5, "b": 0.6})


def test_weighted_union_hash_mode(ray_session):
    """Scale-path fractional weights: hash-threshold extra copies, no
    driver key list; realized weight lands near the target."""
    import ray.data

    n_keys = 1000
    df = pd.DataFrame(
        {"conv_id": np.repeat([f"c{i}" for i in range(n_keys)], 2),
         "v": np.arange(2 * n_keys, dtype=np.float64)}
    )
    ds = ray.data.from_pandas(df).materialize()
    out = weighted_union([(ds, 1.3)], key="conv_id", fractional_mode="hash").to_pandas()
    counts = out.groupby("conv_id")["v"].count()
    extra_keys = int((counts == 4).sum())
    assert (counts.isin([2, 4])).all()  # whole-key replication only
    sigma = (n_keys * 0.3 * 0.7) ** 0.5
    assert abs(extra_keys - 300) <= 4 * sigma + 1
    # deterministic
    out2 = weighted_union([(ds, 1.3)], key="conv_id", fractional_mode="hash").to_pandas()
    assert len(out2) == len(out)


def test_temperature_resample(ray_session):
    """alpha=0.5 mixture: per-group output counts hit the n_g^alpha
    target within a binomial bound; alpha=1 is a near-identity; the
    operator is deterministic across reruns and partition layouts."""
    import ray.data

    from spectral_time_series_ray.stages.sampling import temperature_resample

    rng = np.random.default_rng(3)
    langs = np.repeat(["en", "de", "zh"], [900, 80, 20])
    df = pd.DataFrame({"doc_id": np.arange(len(langs)), "lang": langs})
    ds = ray.data.from_pandas(df).repartition(4).materialize()

    out = temperature_resample(ds, "lang", "doc_id", alpha=0.5,
                               target_rows=1000).to_pandas()
    got = out.groupby("lang")["doc_id"].count()
    n_g = np.array([80.0, 900.0, 20.0])  # de, en, zh (alphabetical)
    p = np.sqrt(n_g); p /= p.sum()
    exp = 1000 * p
    for lang, e, n in zip(["de", "en", "zh"], exp, n_g):
        assert abs(got[lang] - e) <= 5 * np.sqrt(n * 0.25) + 1, (lang, got[lang], e)
    # upsampled rows carry copy_idx > 0; zh must be upsampled (rate > 1)
    assert (out[out["lang"] == "zh"]["copy_idx"] > 0).any()

    # determinism under a different partition layout
    ds2 = ray.data.from_pandas(df).repartition(9).materialize()
    out2 = temperature_resample(ds2, "lang", "doc_id", alpha=0.5,
                                target_rows=1000).to_pandas()
    a = out.sort_values(["doc_id", "copy_idx"]).reset_index(drop=True)
    b = out2.sort_values(["doc_id", "copy_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # alpha=1, target=N: every rate is exactly 1 -> identity multiset
    ident = temperature_resample(ds, "lang", "doc_id", alpha=1.0,
                                 target_rows=len(df)).to_pandas()
    assert len(ident) == len(df)
    assert (ident["copy_idx"] == 0).all()
