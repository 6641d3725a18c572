"""Window enumeration/eval, scalers, metrics, CSV sources, sampling."""

import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.functions import metrics as M
from spectral_time_series_ray.sources.csv_series import (
    infer_freq_seconds,
    read_long_csv,
    read_wide_csv,
)
from spectral_time_series_ray.stages.normalize import (
    apply_scaler,
    fit_abs_mean_scaler,
    fit_std_scaler,
)
from spectral_time_series_ray.stages.sampling import sample_series, weighted_union
from spectral_time_series_ray.stages.windows import (
    enumerate_windows,
    evaluate_windows,
    window_count,
)


def test_metric_kernels():
    y = np.array([1.0, 2.0, 3.0, 4.0])
    p = np.array([1.0, 2.0, 3.0, 5.0])
    assert M.mse(y, p) == 0.25
    assert M.mae(y, p) == 0.25
    assert M.rmse(y, p) == 0.5
    assert abs(M.mape(y, p) - 0.0625) < 1e-12
    assert M.nd(y, p) == 0.1
    assert M.quantile_loss(y, p, 0.5) == 0.125
    # NaNs are jointly masked
    assert M.mse(np.array([1.0, np.nan]), np.array([2.0, 5.0])) == 1.0
    # seasonal error / mase
    ins = np.array([1.0, 2.0, 1.0, 2.0, 1.0])
    assert M.seasonal_error(ins, 2) == 0.0 or M.seasonal_error(ins, 1) == 1.0
    assert M.mase(y, p, ins, 1) == 0.25  # mae / seasonal_error(=1)


def test_weighted_quantile_loss_hand_fixture():
    y = np.array([1.0, 2.0, 3.0, 4.0])
    p = np.array([1.0, 2.0, 3.0, 5.0])
    # pinball sum at q=0.5: 0.5*|4-5| = 0.5; wQL = 2*0.5 / 10 = 0.1
    assert abs(M.weighted_quantile_loss(y, p, 0.5) - 0.1) < 1e-12
    # q=0.9, under-forecast y=4 < p=5: (q-1)*(y-p) = 0.1*1 = 0.1
    assert abs(M.weighted_quantile_loss(y, p, 0.9) - 2 * 0.1 / 10.0) < 1e-12
    # all-zero actuals -> NaN (undefined denominator)
    assert np.isnan(M.weighted_quantile_loss(np.zeros(3), np.ones(3), 0.5))


def test_msis_hand_fixture():
    # horizon y=[1, 5], interval [0, 2]: width=2 each;
    # y=5 exceeds upper by 3 -> penalty (2/0.05)*3 = 120
    # IS = mean([2, 2 + 120]) = 62
    y = np.array([1.0, 5.0])
    lower = np.array([0.0, 0.0])
    upper = np.array([2.0, 2.0])
    ins = np.array([1.0, 2.0, 3.0, 4.0])  # seasonal_error(season=1) = 1
    assert abs(M.msis(y, lower, upper, ins, alpha=0.05, season=1) - 62.0) < 1e-12
    # scaled: seasonal_error = 2 halves the score
    ins2 = np.array([1.0, 3.0, 5.0, 7.0])
    assert abs(M.msis(y, lower, upper, ins2, alpha=0.05, season=1) - 31.0) < 1e-12
    # inside-interval horizon: IS = width only
    assert abs(M.msis(np.array([1.0]), np.array([0.0]), np.array([2.0]), ins) - 2.0) < 1e-12


def test_window_count_formula():
    # reference simple.py:438: windows = (len - ctx - pred) // stride + 1
    assert window_count(100, 32, 8, 8) == (100 - 32 - 8) // 8 + 1
    assert window_count(10, 32, 8, 8) == 0


@pytest.fixture(scope="module")
def series_ds(ray_session):
    import ray.data

    rows = []
    for conv in ("a", "b"):
        n = 80
        ts = np.arange(n, dtype=np.int64) * 60_000_000
        v = np.sin(2 * np.pi * np.arange(n) / 8.0) + (1.0 if conv == "b" else 0.0)
        rows.append(pd.DataFrame({
            "conv_id": conv,
            "bucket_ts": ts.astype("datetime64[us]"),
            "mean_latency": v,
        }))
    return ray.data.from_pandas(pd.concat(rows, ignore_index=True)).materialize()


def test_enumerate_windows(series_ds):
    wins = enumerate_windows(series_ds, ctx=32, pred=8, stride=8).to_pandas()
    per_conv = wins.groupby("conv_id").size()
    assert (per_conv == window_count(80, 32, 8, 8)).all()
    w0 = wins[(wins["conv_id"] == "a") & (wins["window"] == 0)].iloc[0]
    assert len(w0["context"]) == 32 and len(w0["horizon"]) == 8


def test_evaluate_windows_perfect_seasonal(series_ds):
    # series has exact period 8 -> seasonal-naive with season=8 is perfect
    wins = enumerate_windows(series_ds, ctx=32, pred=8, stride=8)
    out = evaluate_windows(wins, season=8, concurrency=1).to_pandas()
    assert (out["mse"] < 1e-20).all()
    # season=1 is imperfect
    wins2 = enumerate_windows(series_ds, ctx=32, pred=8, stride=8)
    out2 = evaluate_windows(wins2, season=1, concurrency=1).to_pandas()
    assert (out2["mse"] > 0.1).all()


def test_std_scaler(ray_session):
    import ray.data

    df = pd.DataFrame({"k": ["x"] * 5 + ["y"] * 3, "v": [1, 2, 3, 4, 5, 10, 10, 10.0]})
    ds = ray.data.from_pandas(df)
    sc = fit_std_scaler(ds, "k", "v").sort_values("k").reset_index(drop=True)
    np.testing.assert_allclose(sc["loc"], [3.0, 10.0])
    np.testing.assert_allclose(sc["scale"], [np.std([1, 2, 3, 4, 5], ddof=1), 1e-5])
    out = apply_scaler(ray.data.from_pandas(df), sc, "k", "v", concurrency=1).to_pandas()
    x = out[out["k"] == "x"]["v_std"].to_numpy()
    assert abs(x.mean()) < 1e-12 and abs(x.std(ddof=1) - 1.0) < 1e-12


def test_abs_mean_scaler(ray_session):
    import ray.data

    df = pd.DataFrame({"k": ["x"] * 4, "v": [-2.0, 2.0, -4.0, 4.0]})
    sc = fit_abs_mean_scaler(ray.data.from_pandas(df), "k", "v")
    assert sc["loc"].iloc[0] == 0.0 and sc["scale"].iloc[0] == 3.0


def test_csv_sources(ray_session, tmp_path):
    long = tmp_path / "long.csv"
    pd.DataFrame({
        "item_id": ["a", "a", "b"],
        "timestamp": ["2024-01-01 00:00:00", "2024-01-01 01:00:00", "2024-01-01 00:00:00"],
        "target": [1.5, 2.5, 9.0],
    }).to_csv(long, index=False)
    out = read_long_csv(str(long)).to_pandas()
    assert list(out.columns) == ["item_id", "ts", "target"]
    assert len(out) == 3 and out["target"].sum() == 13.0

    wide = tmp_path / "wide.csv"
    pd.DataFrame({
        "timestamp": ["2024-01-01 00:00:00", "2024-01-01 01:00:00"],
        "s1": [1.0, 2.0],
        "s2": [3.0, 4.0],
    }).to_csv(wide, index=False)
    out2 = read_wide_csv(str(wide)).to_pandas()
    assert sorted(out2["item_id"].unique()) == ["s1", "s2"]
    assert len(out2) == 4

    ts = out2[out2["item_id"] == "s1"]["ts"].to_numpy()
    assert infer_freq_seconds(ts) == 3600.0

    # multivariate: one list<float> target per timestamp, column order
    # = variate order (reference _from_wide_dataframe_multivariate)
    from spectral_time_series_ray.sources.csv_series import read_wide_csv_multivariate

    out3 = read_wide_csv_multivariate(str(wide)).to_pandas().sort_values("ts")
    assert len(out3) == 2 and (out3["n_var"] == 2).all()
    np.testing.assert_array_equal(np.asarray(out3["target"].iloc[0]), [1.0, 3.0])
    np.testing.assert_array_equal(np.asarray(out3["target"].iloc[1]), [2.0, 4.0])


def test_sampling(ray_session):
    import ray.data

    df = pd.DataFrame({"k": ["a"] * 10 + ["b"] * 5 + ["c"] * 1, "v": range(16)})
    ds = ray.data.from_pandas(df).materialize()
    out = sample_series(ds, "k", 2, mode="uniform", seed=3).to_pandas()
    assert out["k"].nunique() == 2
    # deterministic for fixed seed
    out2 = sample_series(ds, "k", 2, mode="uniform", seed=3).to_pandas()
    assert set(out["k"]) == set(out2["k"])
    prop = sample_series(ds, "k", 2, mode="proportional", seed=5).to_pandas()
    assert prop["k"].nunique() == 2
    assert sample_series(ds, "k", 99, mode="uniform").count() == 16


def test_weighted_union(ray_session):
    import ray.data

    a = ray.data.from_pandas(pd.DataFrame({"x": [1]}))
    b = ray.data.from_pandas(pd.DataFrame({"x": [2]}))
    out = weighted_union([(a, 2), (b, 3)]).to_pandas()
    assert sorted(out["x"]) == [1, 1, 2, 2, 2]


def test_read_lsf_wide_csv_modes(ray_session, tmp_path):
    """Multi-mode LSF reader vs a direct pandas replication of the
    reference's scale+split semantics (_lsf_dataset.py:36-76)."""
    import numpy as np
    import pandas as pd

    from spectral_time_series_ray.sources.csv_series import read_lsf_wide_csv

    rng = np.random.default_rng(6)
    n, v = 100, 3
    dates = pd.date_range("2024-01-01", periods=n, freq="h")
    df = pd.DataFrame({"date": dates})
    for i in range(v):
        df[f"c{i}"] = np.round(rng.normal(10 * i, 2 + i, n), 3)
    p = tmp_path / "lsf.csv"
    df.to_csv(p, index=False)

    train_len, val_len, test_len = 70, 10, 20
    train = df[[f"c{i}" for i in range(v)]].iloc[:train_len]
    mean, std = train.mean(), train.std()  # ddof=1, like pandas .std()
    scaled = (df[[f"c{i}" for i in range(v)]] - mean) / std

    # mode S, split=train: 3 rows, each the scaled train prefix
    out = read_lsf_wide_csv(
        str(p), mode="S", split="train", split_lengths=(train_len, val_len, test_len)
    ).to_pandas().set_index("item_id")
    assert len(out) == 3
    for i in range(v):
        r = out.loc[f"c{i}"]
        assert r["length"] == train_len
        np.testing.assert_allclose(
            np.asarray(r["target"]), scaled[f"c{i}"].iloc[:train_len], atol=1e-12
        )

    # mode S, split=val covers train+val rows (reference: data[:train+val])
    out_v = read_lsf_wide_csv(
        str(p), mode="S", split="val", split_lengths=(train_len, val_len, test_len)
    ).to_pandas()
    assert (out_v["length"] == train_len + val_len).all()

    # mode M: one [var, time] row over everything
    out_m = read_lsf_wide_csv(
        str(p), mode="M", split="test", split_lengths=(train_len, val_len, test_len)
    ).to_pandas()
    assert len(out_m) == 1
    m = np.asarray(out_m["target"].iloc[0])
    assert m.shape == (v, n)
    np.testing.assert_allclose(m[1], scaled["c1"], atol=1e-12)

    # mode MS: per-variate target + [v-1, time] covariates
    out_ms = read_lsf_wide_csv(
        str(p), mode="MS", split="test", split_lengths=(train_len, val_len, test_len)
    ).to_pandas().set_index("item_id")
    cov = np.asarray(out_ms.loc["c0"]["past_feat_dynamic_real"])
    assert cov.shape == (v - 1, n)
    np.testing.assert_allclose(cov[0], scaled["c1"], atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(out_ms.loc["c2"]["target"]), scaled["c2"], atol=1e-12
    )
