"""Tests for the transcript-native analytics in stages/features.py:
role_transition_matrix and tool_call_stats.

Oracle: a pandas recomputation on a small deterministic frame, plus
the conservation invariant sum(transitions) == n_turns - n_convs for
contiguous turn_idx.
"""

import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.stages.features import (
    role_transition_matrix,
    tool_call_stats,
)


@pytest.fixture(scope="module")
def transcripts_df():
    rng = np.random.default_rng(11)
    rows = []
    roles = np.array(["user", "assistant", "tool"], dtype=object)
    for c in range(60):
        size = int(rng.integers(2, 40))
        t0 = np.int64(rng.integers(0, 10**6)) * 1_000_000
        gaps = rng.integers(1, 30_000_000, size)
        ts = t0 + np.cumsum(gaps)
        for i in range(size):
            role = roles[(i + c) % 3] if rng.random() > 0.15 else roles[
                rng.integers(0, 3)
            ]
            tool = f"tool_{rng.integers(0, 4)}" if role == "tool" else ""
            rows.append(
                {
                    "conv_id": f"c{c:03d}",
                    "turn_idx": np.int32(i),
                    "role": role,
                    "tool": tool,
                    "ts": pd.Timestamp(ts[i], unit="us"),
                }
            )
    df = pd.DataFrame(rows)
    # shuffled on disk: consumers must restore order
    return df.sample(frac=1.0, random_state=3).reset_index(drop=True)


def _pandas_transitions(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["conv_id", "turn_idx"])
    out = []
    for _, g in df.groupby("conv_id"):
        r = g["role"].to_numpy()
        for a, b in zip(r[:-1], r[1:]):
            out.append((a, b))
    exp = (
        pd.DataFrame(out, columns=["from_role", "to_role"])
        .groupby(["from_role", "to_role"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values(["from_role", "to_role"])
        .reset_index(drop=True)
    )
    return exp


def test_role_transition_matrix_matches_pandas(ray_session, transcripts_df):
    import ray.data

    ds = ray.data.from_pandas(transcripts_df)
    mat, n_turns, n_convs = role_transition_matrix(ds, num_partitions=7)
    exp = _pandas_transitions(transcripts_df)
    pd.testing.assert_frame_equal(
        mat.reset_index(drop=True).astype({"n": np.int64}),
        exp.astype({"n": np.int64}),
    )
    assert n_turns == len(transcripts_df)
    assert n_convs == transcripts_df["conv_id"].nunique()
    # conservation: contiguous turn_idx -> one transition per non-first turn
    assert int(mat["n"].sum()) == n_turns - n_convs


def test_role_transition_matrix_gap_breaks_chain(ray_session, transcripts_df):
    # removing a middle turn must remove exactly the two transitions
    # through it (turn_idx gap => no bridging pair is counted)
    import ray.data

    df = transcripts_df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    victim = df[(df["conv_id"] == "c000") & (df["turn_idx"] == 1)].index[0]
    df2 = df.drop(index=victim).reset_index(drop=True)
    mat, n_turns, n_convs = role_transition_matrix(
        ray.data.from_pandas(df2), num_partitions=5
    )
    assert n_turns == len(df2)
    # one fewer turn, same convs, two transitions lost (0->1 and 1->2)
    assert int(mat["n"].sum()) == (len(df2) - df2["conv_id"].nunique()) - 1


def test_tool_call_stats_matches_pandas(ray_session, transcripts_df):
    import ray.data

    ds = ray.data.from_pandas(transcripts_df)
    got = tool_call_stats(ds, num_partitions=7)

    df = transcripts_df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    tus = df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    conv = df["conv_id"].to_numpy()
    nxt = np.full(len(df), np.nan)
    same = conv[1:] == conv[:-1]
    nxt[:-1][same] = (tus[1:] - tus[:-1])[same] / 1e6
    df = df.assign(lat=nxt)
    t = df[(df["role"] == "tool") & (df["tool"] != "")]
    exp = t.groupby("tool", as_index=False).agg(
        n_calls=("conv_id", "size"),
        n_convs=("conv_id", "nunique"),
        n_with_next=("lat", "count"),
        sum_lat=("lat", "sum"),
    )
    exp["sum_next_latency_s"] = exp["sum_lat"].round(6)
    exp["mean_next_latency_s"] = (exp["sum_lat"] / exp["n_with_next"]).round(6)
    exp = exp.drop(columns=["sum_lat"]).sort_values("tool").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_calls": np.int64, "n_convs": np.int64, "n_with_next": np.int64}),
        exp.astype({"n_calls": np.int64, "n_convs": np.int64, "n_with_next": np.int64}),
    )
    # latencies non-negative (ts strictly increasing within conv)
    assert (got["mean_next_latency_s"].dropna() >= 0).all()


def test_tool_call_stats_no_tools(ray_session):
    import ray.data

    df = pd.DataFrame(
        {
            "conv_id": ["a", "a"],
            "turn_idx": np.array([0, 1], dtype=np.int32),
            "role": ["user", "assistant"],
            "tool": ["", ""],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:05"]
            ),
        }
    )
    got = tool_call_stats(ray.data.from_pandas(df), num_partitions=3)
    assert len(got) == 0


def test_label_transition_matrix_generic(ray_session):
    # int keys, ts ties broken by a second order column
    import ray.data

    from spectral_time_series_ray.stages.features import label_transition_matrix

    rng = np.random.default_rng(5)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 40, n).astype(np.int64),
            "o1": rng.integers(0, 50, n).astype(np.int64),
            "o2": np.arange(n, dtype=np.int64),
            "lab": np.array(["a", "b", "c", "d"], dtype=object)[
                rng.integers(0, 4, n)
            ],
        }
    )
    got = label_transition_matrix(
        ray.data.from_pandas(df.sample(frac=1.0, random_state=1)),
        key_col="k", order_cols=("o1", "o2"), label_col="lab",
        num_partitions=6,
    )
    s = df.sort_values(["k", "o1", "o2"])
    key = s["k"].to_numpy()
    lab = s["lab"].to_numpy()
    same = key[1:] == key[:-1]
    exp = (
        pd.DataFrame({"from_label": lab[:-1][same], "to_label": lab[1:][same]})
        .groupby(["from_label", "to_label"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values(["from_label", "to_label"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype({"n": np.int64}), exp.astype({"n": np.int64}))
    assert int(got["n"].sum()) == len(df) - df["k"].nunique()
