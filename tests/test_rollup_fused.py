"""The partition-vectorized fused rollup must equal the modular
with_turn_features -> rollup_exact path exactly."""

import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.sources.transcripts import generate_transcripts
from spectral_time_series_ray.stages.features import with_turn_features
from spectral_time_series_ray.stages.rollup import rollup_exact, rollup_transcripts


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["bucket_ts"] = pd.to_datetime(df["bucket_ts"]).astype("datetime64[us]")
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64")
    return (
        df.sort_index(axis=1)
        .sort_values(["conv_id", "bucket_ts"])
        .reset_index(drop=True)
    )


def test_fused_out_of_order_ts(ray_session):
    """ts NOT monotone in turn_idx: a turn-order bucket segmentation
    would emit multiple rows per (conv, bucket); the fused rollup must
    still match the modular path exactly (latency stays turn-ordered)."""
    import pyarrow as pa
    import ray.data

    table = generate_transcripts(2000, seed=5)
    # swap ts between turn pairs within conversations so ts is out of
    # order in turn_idx for many conversations (deterministic)
    df = table.to_pandas()
    df = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    ts = df["ts"].to_numpy().copy()
    same_conv = df["conv_id"].to_numpy()[:-1] == df["conv_id"].to_numpy()[1:]
    swap = np.flatnonzero(same_conv)[::3]  # every 3rd adjacent in-conv pair
    ts[swap], ts[swap + 1] = ts[swap + 1].copy(), ts[swap].copy()
    df["ts"] = ts
    table2 = pa.Table.from_pandas(df, preserve_index=False)

    fused = normalize(rollup_transcripts(ray.data.from_arrow(table2), "1m", num_partitions=5).to_pandas())
    modular = normalize(
        rollup_exact(with_turn_features(ray.data.from_arrow(table2), include_text=False), "1m").to_pandas()
    )
    assert len(fused) == len(modular)
    # one row per (conv, bucket) — no duplicate segments
    assert not fused.duplicated(["conv_id", "bucket_ts"]).any()
    for c in fused.columns:
        g, e = fused[c].to_numpy(), modular[c].to_numpy()
        if fused[c].dtype.kind == "f":
            both_nan = pd.isna(g) & pd.isna(e)
            np.testing.assert_allclose(g[~both_nan], e[~both_nan], rtol=1e-12, atol=1e-12, err_msg=c)
        else:
            assert (g == e).all(), c


@pytest.mark.parametrize("tier", ["1m", "1h"])
def test_fused_equals_modular(ray_session, tier):
    import ray.data

    table = generate_transcripts(3000, seed=11)
    ds = ray.data.from_arrow(table)
    fused = normalize(rollup_transcripts(ds, tier, num_partitions=7).to_pandas())
    ds2 = ray.data.from_arrow(table)
    modular = normalize(
        rollup_exact(with_turn_features(ds2, include_text=False), tier).to_pandas()
    )
    assert list(fused.columns) == list(modular.columns)
    assert len(fused) == len(modular)
    for c in fused.columns:
        g, e = fused[c].to_numpy(), modular[c].to_numpy()
        if fused[c].dtype.kind == "f":
            both_nan = pd.isna(g) & pd.isna(e)
            np.testing.assert_allclose(
                g[~both_nan], e[~both_nan], rtol=1e-12, atol=1e-12, err_msg=c
            )
        else:
            assert (g == e).all(), c


def test_partitions_scale_with_input_bytes(ray_session):
    """Shuffle partition count grows with input bytes (~256MB each) and
    never drops below the cluster-parallelism floor."""
    from spectral_time_series_ray.stages.rollup import partitions_for_input

    floor = partitions_for_input(None)
    assert floor >= 8
    assert partitions_for_input(0) == floor
    assert partitions_for_input(100 << 20) == floor  # small input: floor
    one_tb = partitions_for_input(1 << 40)
    assert one_tb == (1 << 40) // (256 << 20)  # 4096 partitions at 1 TiB
    assert partitions_for_input(2 << 40) == 2 * one_tb  # linear growth


def test_analytic_window_funcs(ray_session):
    """row_number / lag / running sum per key match a hand-computed
    pandas reference, including segment resets at key boundaries and
    the exact int64-scaled running sum."""
    import ray.data

    from spectral_time_series_ray.stages.features import analytic_window_funcs

    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 12, n).astype(np.int64),
            "ts": pd.to_datetime("2026-01-01")
            + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
            "value": np.round(rng.uniform(0, 50, n), 2),
        }
    )
    ds = ray.data.from_pandas(df)
    out = (
        analytic_window_funcs(ds, key="user_id", num_partitions=5)
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    exp = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    g = exp.groupby("user_id")
    exp["rn"] = g.cumcount() + 1
    exp["prev_value"] = g["value"].shift(1)
    exp["running_value"] = (
        (exp["value"] * 100).round().astype(np.int64).groupby(exp["user_id"]).cumsum() / 100
    )
    assert len(out) == n
    for c in ("rn", "prev_value", "running_value"):
        a, b = out[c].to_numpy(dtype=float), exp[c].to_numpy(dtype=float)
        nan = np.isnan(a) & np.isnan(b)
        assert (a[~nan] == b[~nan]).all(), c


def test_analytic_rank_funcs(ray_session):
    """lead / trailing moving-average / rank / dense_rank per key match
    a pandas reference, with forced value ties."""
    import ray.data

    from spectral_time_series_ray.stages.features import analytic_rank_funcs

    rng = np.random.default_rng(9)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 6, n).astype(np.int64),
            "ts": pd.to_datetime("2026-01-01")
            + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
            # coarse grid forces plenty of ties for rank vs dense_rank
            "value": np.round(rng.integers(0, 20, n) * 0.25, 2),
        }
    )
    out = (
        analytic_rank_funcs(ray.data.from_pandas(df), key="user_id", num_partitions=4)
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    exp = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    g = exp.groupby("user_id")
    exp["lead_value"] = g["value"].shift(-1)
    exp["ma_value"] = g["value"].rolling(5, min_periods=1).mean().reset_index(drop=True)
    exp["rnk"] = g["value"].rank(method="min").astype(np.int64)
    exp["drnk"] = g["value"].rank(method="dense").astype(np.int64)
    assert len(out) == n
    assert (out["rnk"] != out["drnk"]).any()  # ties actually exercised
    for c in ("lead_value", "ma_value", "rnk", "drnk"):
        a = out[c].to_numpy(dtype=float)
        b = exp[c].to_numpy(dtype=float)
        nan = np.isnan(a) & np.isnan(b)
        assert np.allclose(a[~nan], b[~nan]), c


def test_merge_rollups_incremental_equals_full(ray_session):
    """Incremental view maintenance: rollup(A) merged with rollup(B)
    equals rollup(A union B) exactly, including overlapping buckets."""
    import ray.data

    from spectral_time_series_ray.stages.rollup import merge_rollups, rollup_mergeable

    rng = np.random.default_rng(4)
    n = 3000
    df = pd.DataFrame(
        {
            "conv_id": rng.integers(0, 20, n).astype(str),
            "ts": pd.to_datetime("2026-02-01")
            + pd.to_timedelta(rng.integers(0, 7200, n), unit="s"),
            "latency_s": np.round(rng.uniform(0, 9, n), 2),
            "text_len": rng.integers(1, 500, n).astype(np.float64),
        }
    )
    # split at a mid timestamp so many (conv, bucket) groups OVERLAP
    cut = pd.to_datetime("2026-02-01 01:00:00")
    a, b = df[df["ts"] < cut], df[df["ts"] >= cut]
    ra = rollup_mergeable(ray.data.from_pandas(a), "1h")
    rb = rollup_mergeable(ray.data.from_pandas(b), "1h")
    inc = (
        merge_rollups(ra, rb)
        .to_pandas()
        .sort_values(["conv_id", "bucket_ts"])
        .reset_index(drop=True)
    )
    full = (
        rollup_mergeable(ray.data.from_pandas(df), "1h")
        .to_pandas()
        .sort_values(["conv_id", "bucket_ts"])
        .reset_index(drop=True)
    )
    assert len(inc) == len(full)
    for c in full.columns:
        g, e = inc[c].to_numpy(), full[c].to_numpy()
        if g.dtype.kind == "f":
            both_nan = pd.isna(g) & pd.isna(e)
            np.testing.assert_allclose(g[~both_nan], e[~both_nan], rtol=1e-12, err_msg=c)
        else:
            assert (g == e).all(), c


def test_linear_trend_matches_polyfit(ray_session):
    """Algebraic trend aggregate equals numpy lstsq per key, and the
    partials merge exactly across partitions."""
    import ray.data

    from spectral_time_series_ray.stages.rollup import linear_trend

    rng = np.random.default_rng(6)
    n = 2000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 10, n).astype(np.int64),
            "ts": pd.to_datetime("2024-01-05")
            + pd.to_timedelta(rng.integers(0, 30 * 86400, n), unit="s"),
            "value": np.round(rng.uniform(0, 80, n), 2),
        }
    )
    ds = ray.data.from_pandas(df).repartition(6)
    out = linear_trend(ds, key="user_id").to_pandas().set_index("user_id")
    x0 = 1_704_067_200
    for uid, sub in df.groupby("user_id"):
        x = sub["ts"].astype("datetime64[us]").astype(np.int64).to_numpy() // 1_000_000 - x0
        y = sub["value"].to_numpy()
        slope, intercept = np.polyfit(x.astype(float), y, 1)
        r = np.corrcoef(x.astype(float), y)[0, 1]
        assert out.loc[uid, "n"] == len(sub)
        np.testing.assert_allclose(out.loc[uid, "slope"], slope, rtol=1e-8)
        np.testing.assert_allclose(out.loc[uid, "intercept"], intercept, rtol=1e-8)
        np.testing.assert_allclose(out.loc[uid, "corr"], r, rtol=1e-8)
