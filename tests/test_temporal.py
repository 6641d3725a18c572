"""Tests for stages/temporal.py: time-weighted average, counter
increase with resets, interval-union coverage, and timezone-aware
local-day rollups (including DST transitions the sf test window never
crosses)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _events_df(seed=7, n=400, n_keys=9):
    rng = np.random.default_rng(seed)
    ts0 = np.datetime64("2024-03-09T12:00:00", "us")  # spans US spring-forward
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, n_keys, n).astype(np.int64),
            "ts": ts0 + rng.integers(0, 4 * 86400 * 10**6, n).astype("timedelta64[us]"),
            "value": np.round(rng.uniform(0.0, 300.0, n), 2),
        }
    )
    return df


def _brute_twa(df):
    rows = []
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        if len(t) < 2 or t[-1] == t[0]:
            continue
        dt = np.diff(t)
        rows.append(
            {
                "user_id": uid,
                "n_samples": len(t),
                "span_s": dt.sum() / 1e6,
                "twa": (float((v[:-1] * dt).sum()) / float(dt.sum())) / 100,
            }
        )
    return pd.DataFrame(rows).sort_values("user_id").reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_time_weighted_avg_matches_bruteforce():
    import ray.data

    from spectral_time_series_ray.stages.temporal import time_weighted_avg

    df = _events_df()
    ds = ray.data.from_pandas(df).repartition(5)
    got = (
        time_weighted_avg(ds, num_partitions=3)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp = _brute_twa(df)
    pd.testing.assert_frame_equal(
        got[["user_id", "n_samples", "span_s", "twa"]].astype(
            {"n_samples": np.int64}
        ),
        exp.astype({"n_samples": np.int64}),
        check_exact=False,
        rtol=0,
        atol=1e-12,
    )


@pytest.mark.usefixtures("ray_session")
def test_time_weighted_avg_drops_single_sample_keys():
    import ray.data

    from spectral_time_series_ray.stages.temporal import time_weighted_avg

    df = pd.DataFrame(
        {
            "event_id": [0, 1, 2],
            "user_id": [1, 2, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:00", "2024-01-01 01:00:00"]
            ),
            "value": [10.0, 20.0, 40.0],
        }
    )
    got = time_weighted_avg(ray.data.from_pandas(df), num_partitions=2).to_pandas()
    assert set(got["user_id"]) == {2}  # user 1 has zero integration time
    assert got["twa"].iloc[0] == pytest.approx(20.0)  # LOCF holds the FIRST value
    assert got["span_s"].iloc[0] == pytest.approx(3600.0)


def _brute_increase(df):
    rows = []
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        v = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        inc = 0
        resets = 0
        for prev, cur in zip(v[:-1], v[1:]):
            if cur >= prev:
                inc += cur - prev
            else:
                resets += 1
                inc += cur
        rows.append(
            {
                "user_id": uid,
                "n_samples": len(v),
                "n_resets": resets,
                "total_increase": inc / 100,
            }
        )
    return pd.DataFrame(rows).sort_values("user_id").reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_counter_increase_matches_bruteforce():
    import ray.data

    from spectral_time_series_ray.stages.temporal import counter_increase

    df = _events_df(seed=11)
    ds = ray.data.from_pandas(df).repartition(4)
    got = (
        counter_increase(ds, num_partitions=3)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp = _brute_increase(df)
    pd.testing.assert_frame_equal(
        got[["user_id", "n_samples", "n_resets", "total_increase"]].astype(
            {"n_samples": np.int64, "n_resets": np.int64}
        ),
        exp.astype({"n_samples": np.int64, "n_resets": np.int64}),
    )


def test_counter_increase_monotone_counter_is_last_minus_first():
    # pure-kernel sanity through the Dataset API is covered above; here
    # the semantic identity: no resets => total == last - first
    df = pd.DataFrame(
        {
            "event_id": np.arange(5),
            "user_id": np.zeros(5, dtype=np.int64),
            "ts": pd.date_range("2024-01-01", periods=5, freq="1h"),
            "value": [1.0, 2.5, 2.5, 7.25, 9.0],
        }
    )
    exp = _brute_increase(df)
    assert exp["n_resets"].iloc[0] == 0
    assert exp["total_increase"].iloc[0] == pytest.approx(8.0)


def _brute_coverage(df):
    rows = []
    for uid, g in df.groupby("user_id"):
        ivs = sorted(zip(g["s"], g["e"]))
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        rows.append(
            {
                "user_id": uid,
                "n_intervals": len(ivs),
                "n_islands": len(islands),
                "covered_s": sum(e - s for s, e in islands) / 1e6,
            }
        )
    return pd.DataFrame(rows).sort_values("user_id").reset_index(drop=True)


@given(st.integers(min_value=0, max_value=10_000))
@settings(max_examples=30, deadline=None)
def test_interval_islands_bruteforce_model(seed):
    # model check of the island merge itself (touching endpoints merge:
    # half-open [s,e) with s == prev e is contiguous coverage)
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 40))
    s = rng.integers(0, 1000, n).astype(np.int64) * 1000
    e = s + rng.integers(1, 300, n).astype(np.int64) * 1000
    df = pd.DataFrame({"user_id": rng.integers(0, 3, n).astype(np.int64), "s": s, "e": e})
    exp = _brute_coverage(df)
    assert (exp["covered_s"] > 0).all()
    assert (exp["n_islands"] <= exp["n_intervals"]).all()


@pytest.mark.usefixtures("ray_session")
def test_interval_coverage_matches_bruteforce():
    import ray.data

    from spectral_time_series_ray.stages.temporal import interval_coverage

    rng = np.random.default_rng(3)
    n = 500
    s = rng.integers(0, 10**7, n).astype(np.int64)
    e = s + rng.integers(1, 10**6, n).astype(np.int64)
    df = pd.DataFrame(
        {"user_id": rng.integers(0, 12, n).astype(np.int64), "s": s, "e": e}
    )
    ds = ray.data.from_pandas(
        df.rename(columns={"s": "_iv_start_us", "e": "_iv_end_us"})
    ).repartition(6)
    got = (
        interval_coverage(ds, num_partitions=3)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp = _brute_coverage(df)
    pd.testing.assert_frame_equal(
        got.astype({"n_intervals": np.int64, "n_islands": np.int64}),
        exp.astype({"n_intervals": np.int64, "n_islands": np.int64}),
    )


@pytest.mark.usefixtures("ray_session")
def test_interval_coverage_touching_intervals_merge():
    import ray.data

    from spectral_time_series_ray.stages.temporal import interval_coverage

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1],
            "_iv_start_us": [0, 1000, 5000],
            "_iv_end_us": [1000, 2000, 6000],
        }
    )
    got = interval_coverage(ray.data.from_pandas(df), num_partitions=2).to_pandas()
    assert got["n_islands"].iloc[0] == 2  # [0,2000) merged, [5000,6000) apart
    assert got["covered_s"].iloc[0] == pytest.approx(0.003)


@pytest.mark.usefixtures("ray_session")
def test_local_day_rollup_dst_transitions():
    """Local days are 23h on 2024-03-10 (US spring-forward) and 25h on
    2024-11-03 (fall-back): hourly UTC events must land accordingly."""
    import ray.data

    from spectral_time_series_ray.stages.temporal import local_day_rollup

    hours = pd.date_range("2024-03-08 00:00", "2024-03-13 00:00", freq="1h", tz="UTC")
    hours = hours.append(
        pd.date_range("2024-11-01 00:00", "2024-11-06 00:00", freq="1h", tz="UTC")
    )
    df = pd.DataFrame(
        {
            "ts": hours.tz_localize(None).astype("datetime64[us]"),
            "value": np.ones(len(hours)),
        }
    )
    out = (
        local_day_rollup(
            ray.data.from_pandas(df), tz="America/New_York", value_scale=100
        )
        .to_pandas()
        .set_index("local_date")
    )
    assert out.loc["2024-03-10", "n_events"] == 23
    assert out.loc["2024-11-03", "n_events"] == 25
    # full interior days on either side are 24h
    assert out.loc["2024-03-11", "n_events"] == 24
    assert out.loc["2024-11-04", "n_events"] == 24
    # counts conserve rows
    assert out["n_events"].sum() == len(df)
    assert out["sum_value"].sum() == pytest.approx(len(df))
