"""Tests for stages/olap.py: GROUPING SETS aggregates, hopping-window
rollups, and latest-wins compaction — each checked against a plain
pandas re-computation of the same semantics."""

import numpy as np
import pandas as pd
import pytest
import ray

from spectral_time_series_ray.stages.olap import (
    _interval_us,
    grouping_sets_aggregate,
    hopping_rollup,
    latest_state,
)


@pytest.fixture()
def events_df():
    rng = np.random.default_rng(7)
    n = 2000
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 3 * 86400, n)), unit="s"
    )
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(1, 30, n).astype(np.int64),
            "event_type": rng.choice(["click", "view", "purchase"], n),
            "value": np.round(rng.uniform(0, 100, n), 2),
        }
    )


def test_interval_us():
    assert _interval_us("15m") == 15 * 60 * 1_000_000
    assert _interval_us("1h") == 3_600 * 1_000_000
    assert _interval_us("1d") == 86_400 * 1_000_000
    with pytest.raises(ValueError):
        _interval_us("3x")


def test_grouping_sets_matches_pandas(ray_session, events_df):
    df = events_df.copy()
    df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
    ds = ray.data.from_pandas(df[["event_type", "day", "value"]])
    sets = [("event_type", "day"), ("event_type",), ("day",), ()]
    got = (
        grouping_sets_aggregate(ds, ["event_type", "day"], "value", sets)
        .to_pandas()
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )
    frames = []
    for s in sets:
        t = df.copy()
        for k in ("event_type", "day"):
            if k not in s:
                t[k] = "<all>"
        g = t.groupby(["event_type", "day"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        frames.append(g)
    exp = pd.concat(frames, ignore_index=True)
    exp["sum_value"] = exp["sum_value"].round(6)
    exp = exp.sort_values(["event_type", "day"]).reset_index(drop=True)
    got["n_events"] = got["n_events"].astype(np.int64)
    exp["n_events"] = exp["n_events"].astype(np.int64)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-9)
    # one row per set key-combo: the () set contributes exactly one row
    assert (got[["event_type", "day"]] == "<all>").all(axis=1).sum() == 1


def test_grouping_sets_subset_validation(ray_session, events_df):
    ds = ray.data.from_pandas(events_df[["event_type", "value"]])
    with pytest.raises(ValueError):
        grouping_sets_aggregate(ds, ["event_type"], "value", [("day",)])


def test_hopping_rollup_matches_pandas(ray_session, events_df):
    ds = ray.data.from_pandas(events_df[["ts", "value"]])
    got = (
        hopping_rollup(ds, window="1h", hop="15m")
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    df = events_df.copy()
    grid = df["ts"].dt.floor("15min")
    frames = [
        pd.DataFrame(
            {"window_start": grid - pd.Timedelta(minutes=15 * j), "value": df["value"]}
        )
        for j in range(4)
    ]
    exp = (
        pd.concat(frames)
        .groupby("window_start", as_index=False)
        .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    exp["sum_value"] = exp["sum_value"].round(6)
    got["window_start"] = pd.to_datetime(got["window_start"]).astype("datetime64[us]")
    exp["window_start"] = pd.to_datetime(exp["window_start"]).astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-9)
    # every event is in exactly window/hop windows
    assert got["n_events"].sum() == 4 * len(df)


def test_hopping_rollup_rejects_nonmultiple():
    with pytest.raises(ValueError):
        hopping_rollup(None, window="1h", hop="7m")


def test_latest_state_matches_pandas(ray_session, events_df):
    # plant duplicate (user, ts) rows so the event_id tiebreak matters
    df = events_df.copy()
    dup = df.iloc[:20].copy()
    dup["event_id"] = df["event_id"].max() + 1 + np.arange(20, dtype=np.int64)
    dup["value"] = 999.0
    df = pd.concat([df, dup], ignore_index=True)
    ds = ray.data.from_pandas(df)
    got = (
        latest_state(ds, key="user_id", order_cols=("ts", "event_id"))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values(["user_id", "ts", "event_id"], ascending=[True, False, False])
        .drop_duplicates("user_id", keep="first")
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    got = got[exp.columns]
    got["ts"] = pd.to_datetime(got["ts"]).astype("datetime64[us]")
    exp["ts"] = pd.to_datetime(exp["ts"]).astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got["user_id"].is_unique


# ---------------------------------------------------------- tier stitch

from hypothesis import given, settings
from hypothesis import strategies as st

from spectral_time_series_ray.stages.olap import stitch_plan, tier_stitch_aggregate

_MIN = 60_000_000
_TIER_US = {"1m": _MIN, "1h": 60 * _MIN, "1d": 1440 * _MIN}


@given(
    st.integers(min_value=0, max_value=60 * 24 * 90),
    st.integers(min_value=1, max_value=60 * 24 * 90),
)
@settings(max_examples=300, deadline=None)
def test_stitch_plan_disjoint_cover(a_min, span_min):
    a = a_min * _MIN
    b = a + span_min * _MIN
    plan = stitch_plan(a, b)
    # sorted, disjoint, contiguous, covering exactly [a, b)
    assert plan[0][1] == a and plan[-1][2] == b
    for (t0, s0, e0), (t1, s1, e1) in zip(plan, plan[1:]):
        assert e0 == s1
    for tier, s, e in plan:
        u = _TIER_US[tier]
        assert s < e and s % u == 0 or tier == "1m"
        if tier != "1m":
            assert s % u == 0 and e % u == 0
    # coarsest-cover: at most 2 segments per fine tier, 1 day run
    tiers = [t for t, _, _ in plan]
    assert tiers.count("1d") <= 1 and tiers.count("1h") <= 2 and tiers.count("1m") <= 2


def test_stitch_plan_fixed_range_matches_oracle_constants():
    a = int(np.datetime64("2024-01-05T07:23:00", "us").astype(np.int64))
    b = int(np.datetime64("2024-01-27T19:41:00", "us").astype(np.int64))
    plan = stitch_plan(a, b)
    exp = [
        ("1m", "2024-01-05T07:23:00", "2024-01-05T08:00:00"),
        ("1h", "2024-01-05T08:00:00", "2024-01-06T00:00:00"),
        ("1d", "2024-01-06T00:00:00", "2024-01-27T00:00:00"),
        ("1h", "2024-01-27T00:00:00", "2024-01-27T19:00:00"),
        ("1m", "2024-01-27T19:00:00", "2024-01-27T19:41:00"),
    ]
    got = [
        (
            t,
            str(np.datetime64(s, "us").astype("datetime64[s]")),
            str(np.datetime64(e, "us").astype("datetime64[s]")),
        )
        for t, s, e in plan
    ]
    assert got == exp


def test_stitch_plan_rejects_unaligned():
    with pytest.raises(ValueError):
        stitch_plan(1, _MIN)
    assert stitch_plan(_MIN, _MIN) == []


def test_tier_stitch_aggregate_matches_direct(ray_session, events_df):
    ds = ray.data.from_pandas(events_df[["ts", "value"]])
    a = int(np.datetime64("2024-01-01T05:30:00", "us").astype(np.int64))
    b = int(np.datetime64("2024-01-03T11:07:00", "us").astype(np.int64))
    out = tier_stitch_aggregate(ds, a, b)
    df = events_df
    lo, hi = pd.Timestamp("2024-01-01 05:30:00"), pd.Timestamp("2024-01-03 11:07:00")
    in_range = df[(df["ts"] >= lo) & (df["ts"] < hi)]
    assert out["n_events"].sum() == len(in_range)
    assert out["sum_value"].sum() == pytest.approx(in_range["value"].sum(), abs=1e-6)
    # per-segment check against direct filtering
    for _, r in out.iterrows():
        s, e = pd.Timestamp(r["seg_start"]), pd.Timestamp(r["seg_end"])
        seg = df[(df["ts"] >= s) & (df["ts"] < e)]
        assert r["n_events"] == len(seg)
        assert r["sum_value"] == pytest.approx(seg["value"].sum(), abs=1e-6)
