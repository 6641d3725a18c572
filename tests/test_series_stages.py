"""Per-series Ray stages: gap-fill densification, preconditioning,
chunk pack/unpack, Gorilla actor stage, spectral downsampler."""

import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.functions.precondition import (
    forward_precondition,
    precondition_coefficients,
)
from spectral_time_series_ray.sources.transcripts import generate_transcripts
from spectral_time_series_ray.stages.compress import compress_chunks, decompress_chunks
from spectral_time_series_ray.stages.downsample import spectral_downsample
from spectral_time_series_ray.stages.features import with_turn_features
from spectral_time_series_ray.stages.rollup import rollup_exact
from spectral_time_series_ray.stages.series import (
    SeriesPreconditioner,
    gap_fill_series,
    pack_series,
    unpack_series,
)


@pytest.fixture(scope="module")
def rolled(ray_session):
    import ray.data

    table = generate_transcripts(2000, seed=42)
    ds = ray.data.from_arrow(table)
    feats = with_turn_features(ds, include_text=False)
    return rollup_exact(feats, "1m").materialize()


def test_gap_fill_dense_grid(rolled):
    out = gap_fill_series(rolled, "1m", value_col="mean_latency", method="locf").to_pandas()
    assert set(out.columns) == {"conv_id", "bucket_ts", "mean_latency", "observed"}
    assert not out["mean_latency"].isna().any()
    for _, g in out.groupby("conv_id"):
        b = g["bucket_ts"].astype("int64").sort_values().to_numpy()
        assert (np.diff(b) == 60_000_000).all()  # dense 1m grid
        assert g["observed"].any()


def test_gap_fill_locf_values(rolled):
    raw = rolled.to_pandas()
    out = gap_fill_series(rolled, "1m", value_col="mean_latency", method="locf").to_pandas()
    conv = raw["conv_id"].iloc[0]
    r = raw[raw["conv_id"] == conv].sort_values("bucket_ts")
    o = out[out["conv_id"] == conv].sort_values("bucket_ts")
    # observed buckets keep their value
    merged = o.merge(r[["bucket_ts", "mean_latency"]], on="bucket_ts", suffixes=("", "_raw"), how="inner")
    np.testing.assert_allclose(merged["mean_latency"], merged["mean_latency_raw"])
    # unobserved buckets carry the previous observed value
    vals = o["mean_latency"].to_numpy()
    obs = o["observed"].to_numpy()
    for i in np.flatnonzero(~obs):
        if i > 0:
            assert vals[i] == vals[i - 1]


def test_gap_fill_precondition_column(rolled):
    out = gap_fill_series(
        rolled, "1m", value_col="mean_latency", method="locf",
        polynomial="chebyshev", degree=3,
    ).to_pandas()
    assert "mean_latency_precond" in out.columns
    conv = out["conv_id"].iloc[0]
    g = out[out["conv_id"] == conv].sort_values("bucket_ts")
    c = precondition_coefficients("chebyshev", 3)
    np.testing.assert_allclose(
        g["mean_latency_precond"].to_numpy(),
        forward_precondition(g["mean_latency"].to_numpy(), c),
        atol=1e-12,
    )


@pytest.fixture(scope="module")
def chunks(rolled):
    filled = gap_fill_series(rolled, "1m", value_col="mean_latency", method="locf")
    return pack_series(filled, value_col="mean_latency", chunk_points=64).materialize()


def test_pack_series_chunks(chunks):
    df = chunks.to_pandas()
    assert set(df.columns) == {"conv_id", "chunk_idx", "n_points", "ts", "values"}
    assert (df["n_points"] <= 64).all()
    # per conversation, chunk indices are contiguous from 0
    for _, g in df.groupby("conv_id"):
        np.testing.assert_array_equal(np.sort(g["chunk_idx"].to_numpy()), np.arange(len(g)))


def test_gorilla_stage_roundtrip(chunks):
    enc = compress_chunks(chunks, quantize_digits=None, concurrency=2)
    dec = decompress_chunks(enc, concurrency=2).to_pandas()
    orig = chunks.to_pandas()
    key = ["conv_id", "chunk_idx"]
    dec = dec.sort_values(key).reset_index(drop=True)
    orig = orig.sort_values(key).reset_index(drop=True)
    for i in range(len(orig)):
        np.testing.assert_array_equal(
            np.asarray(dec["ts"].iloc[i]), np.asarray(orig["ts"].iloc[i], dtype=np.int64)
        )
        np.testing.assert_array_equal(
            np.asarray(dec["values"].iloc[i]),
            np.asarray(orig["values"].iloc[i], dtype=np.float64),
        )


def test_gorilla_stage_quantized_compression(chunks):
    enc = compress_chunks(chunks, quantize_digits=3, concurrency=2).to_pandas()
    big = enc[enc["n_points"] >= 32]
    assert (big["bytes_per_point"] < 16).all()
    dec_ds = decompress_chunks(__import__("ray").data.from_pandas(enc), concurrency=2).to_pandas()
    orig = chunks.to_pandas().sort_values(["conv_id", "chunk_idx"]).reset_index(drop=True)
    dec = dec_ds.sort_values(["conv_id", "chunk_idx"]).reset_index(drop=True)
    for i in range(len(orig)):
        np.testing.assert_allclose(
            np.asarray(dec["values"].iloc[i]),
            np.asarray(orig["values"].iloc[i], dtype=np.float64),
            atol=5.01e-4,  # quantization to 3 decimals
        )


def test_unpack_series_roundtrip(chunks):
    long = unpack_series(chunks).to_pandas()
    assert set(long.columns) == {"conv_id", "ts", "value"}
    orig = chunks.to_pandas()
    assert len(long) == int(orig["n_points"].sum())


def test_spectral_downsampler_welch_detects_period(ray_session):
    import ray.data

    # synthetic chunk rows with a known 10-bucket (600 s) period
    rows = []
    for conv in range(4):
        ts = (np.arange(512, dtype=np.int64) * 60_000_000) + 1_700_000_000_000_000
        vals = np.sin(2 * np.pi * np.arange(512) / 10.0) + 0.1 * np.random.default_rng(conv).standard_normal(512)
        rows.append({"conv_id": f"c{conv}", "chunk_idx": 0, "n_points": 512, "ts": ts, "values": vals})
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = spectral_downsample(ds, method="welch", concurrency=2, nperseg=256).to_pandas()
    f_expected = 1.0 / 600.0  # Hz
    for pf in out["peak_freq"]:
        assert abs(pf - f_expected) < 2e-4


def test_spectral_downsampler_lomb_irregular(ray_session):
    import ray.data

    rng = np.random.default_rng(0)
    t_s = np.sort(rng.uniform(0, 512 * 60, 400))
    vals = np.sin(2 * np.pi * t_s / 600.0)
    rows = [{
        "conv_id": "c0", "chunk_idx": 0, "n_points": 400,
        "ts": (t_s * 1e6).astype(np.int64) + 1_700_000_000_000_000,
        "values": vals,
    }]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = spectral_downsample(ds, method="lomb", concurrency=1, max_freq=0.01).to_pandas()
    assert abs(out["peak_freq"].iloc[0] - 1.0 / 600.0) < 2e-4


def test_multivariate_precondition_stats(ray_session):
    """[2, T] multivariate target through 2-D forward+reverse kernels:
    the in-stage roundtrip assertion passes and the emitted raw-value
    stats match pandas (variate independence, end-to-end through Ray)."""
    import ray.data

    from spectral_time_series_ray.stages.series import multivariate_precondition_stats

    rng = np.random.default_rng(4)
    rows = []
    for u in range(5):
        n = 40 + u
        ts = (np.arange(n, dtype=np.int64) * 3_600_000_000) + 1_700_000_000_000_000
        rows.append(pd.DataFrame({
            "user_id": u, "bucket_ts": ts.astype("datetime64[us]"),
            "v0": rng.integers(1, 50, n).astype(np.float64),
            "v1": np.round(rng.lognormal(2, 1, n), 2),
        }))
    df = pd.concat(rows, ignore_index=True)
    ds = ray.data.from_pandas(df)
    out = multivariate_precondition_stats(ds, ("v0", "v1"), key="user_id").to_pandas()
    assert len(out) == 10  # 5 users x 2 variates
    for u in range(5):
        g = df[df["user_id"] == u]
        for vi, col in enumerate(("v0", "v1")):
            r = out[(out["user_id"] == u) & (out["variate"] == vi)].iloc[0]
            assert r["n_buckets"] == len(g)
            np.testing.assert_allclose(r["sum_v"], g[col].sum(), rtol=1e-10)
            np.testing.assert_allclose(r["min_v"], g[col].min(), rtol=1e-10)
            np.testing.assert_allclose(r["max_v"], g[col].max(), rtol=1e-10)
