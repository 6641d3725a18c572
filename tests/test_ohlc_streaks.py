"""Tests for OHLC bars (olap.ohlc_bars) and gaps-and-islands longest
streaks (temporal.longest_streak) against brute-force pandas models,
including block-boundary merge behavior (runs and bars split across
blocks must reduce to the same answer)."""

import numpy as np
import pandas as pd
import pytest


def _events_df(seed=11, n=500, n_keys=7, n_types=4):
    rng = np.random.default_rng(seed)
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, n_keys, n).astype(np.int64),
            "event_type": np.array(["a", "b", "c", "d"])[
                rng.integers(0, n_types, n)
            ],
            "ts": ts0
            + rng.integers(0, 3 * 86400 * 10**6, n).astype("timedelta64[us]"),
            "value": np.round(rng.uniform(0.01, 300.0, n), 2),
        }
    )


def _brute_ohlc(df):
    d = df.copy()
    d["bucket_ts"] = d["ts"].dt.floor("h")
    rows = []
    for (et, b), g in d.sort_values(["ts", "event_id"]).groupby(
        ["event_type", "bucket_ts"]
    ):
        rows.append(
            {
                "event_type": et,
                "bucket_ts": b,
                "open_v": g["value"].iloc[0],
                "high_v": g["value"].max(),
                "low_v": g["value"].min(),
                "close_v": g["value"].iloc[-1],
                "n": len(g),
                "sum_c": int(np.rint(g["value"].to_numpy() * 100).sum()),
            }
        )
    return (
        pd.DataFrame(rows)
        .sort_values(["event_type", "bucket_ts"])
        .reset_index(drop=True)
    )


def _brute_streak(df):
    rows = []
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        types = g["event_type"].to_numpy()
        eids = g["event_id"].to_numpy()
        tss = g["ts"].to_numpy()
        runs = []
        i = 0
        while i < len(types):
            j = i
            while j + 1 < len(types) and types[j + 1] == types[i]:
                j += 1
            runs.append(
                (j - i + 1, tss[i], int(eids[i : j + 1].min()), types[i])
            )
            i = j + 1
        runs.sort(key=lambda r: (-r[0], r[1], r[2]))
        ln, st, mid, ty = runs[0]
        rows.append(
            {
                "user_id": uid,
                "streak_len": ln,
                "streak_type": ty,
                "start_ts": st,
                "min_event_id": mid,
            }
        )
    return pd.DataFrame(rows).sort_values("user_id").reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_ohlc_matches_bruteforce():
    import ray

    from spectral_time_series_ray.stages.olap import ohlc_bars

    df = _events_df()
    # many small blocks so bars are split across block boundaries and
    # the partition merge path is genuinely exercised
    ds = ray.data.from_pandas(df).repartition(16)
    got = ohlc_bars(ds, group_col="event_type", interval="1h").to_pandas()
    got = got.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)
    exp = _brute_ohlc(df)
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["event_type"], exp["event_type"])
    np.testing.assert_array_equal(
        got["bucket_ts"].to_numpy(), exp["bucket_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    )
    for c in ["open_v", "high_v", "low_v", "close_v"]:
        np.testing.assert_array_equal(got[c].to_numpy(), exp[c].to_numpy(), err_msg=c)
    np.testing.assert_array_equal(got["n"].to_numpy(), exp["n"].to_numpy())
    np.testing.assert_array_equal(got["sum_c"].to_numpy(), exp["sum_c"].to_numpy())


@pytest.mark.usefixtures("ray_session")
def test_ohlc_open_close_use_event_id_tiebreak():
    import ray

    from spectral_time_series_ray.stages.olap import ohlc_bars

    ts = np.datetime64("2024-01-01T05:00:00", "us")
    df = pd.DataFrame(
        {
            "event_id": np.array([3, 1, 2], dtype=np.int64),
            "event_type": ["x", "x", "x"],
            "ts": [ts, ts, ts],  # all ties: event_id decides both edges
            "value": [30.0, 10.0, 20.0],
        }
    )
    got = ohlc_bars(
        ray.data.from_pandas(df).repartition(3), group_col="event_type"
    ).to_pandas()
    assert len(got) == 1
    assert got["open_v"].iloc[0] == 10.0  # event_id 1
    assert got["close_v"].iloc[0] == 30.0  # event_id 3
    assert got["high_v"].iloc[0] == 30.0 and got["low_v"].iloc[0] == 10.0


@pytest.mark.usefixtures("ray_session")
def test_longest_streak_matches_bruteforce():
    import ray

    from spectral_time_series_ray.stages.temporal import longest_streak

    df = _events_df(seed=23, n=600, n_keys=11, n_types=2)  # few types -> long runs
    ds = ray.data.from_pandas(df).repartition(16)
    got = longest_streak(ds).to_pandas().sort_values("user_id").reset_index(drop=True)
    exp = _brute_streak(df)
    assert len(got) == len(exp)
    for c in ["user_id", "streak_len", "streak_type", "min_event_id"]:
        np.testing.assert_array_equal(got[c].to_numpy(), exp[c].to_numpy(), err_msg=c)
    np.testing.assert_array_equal(
        got["start_ts"].to_numpy().astype("datetime64[us]"),
        exp["start_ts"].to_numpy().astype("datetime64[us]"),
    )


@pytest.mark.usefixtures("ray_session")
def test_longest_streak_tiebreak_earliest_run():
    import ray

    from spectral_time_series_ray.stages.temporal import longest_streak

    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    hours = np.arange(6).astype("timedelta64[h]").astype("timedelta64[us]")
    # two runs of length 2 for user 0: a,a,b,a,a,b -> earliest run wins
    df = pd.DataFrame(
        {
            "event_id": np.arange(6, dtype=np.int64),
            "user_id": np.zeros(6, dtype=np.int64),
            "event_type": ["a", "a", "b", "a", "a", "b"],
            "ts": ts0 + hours,
        }
    )
    got = longest_streak(ray.data.from_pandas(df)).to_pandas()
    assert got["streak_len"].iloc[0] == 2
    assert got["streak_type"].iloc[0] == "a"
    assert got["min_event_id"].iloc[0] == 0  # first run, not the later one
