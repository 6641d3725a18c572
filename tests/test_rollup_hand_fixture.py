"""FIXTURES.md §4: tiny hand-checkable rollup oracle — 3 conversations,
20 turns, 1m + 1h tiers, every expected number derived by hand."""

import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.stages.rollup import cascade, rollup_transcripts

T0 = np.datetime64("2024-03-01T00:00:00", "us")


def _t(s: str) -> np.datetime64:
    return np.datetime64(f"2024-03-01T{s}", "us")


def hand_table() -> pd.DataFrame:
    rows = []
    # conv A: 5 turns, two 1m buckets; latencies [nan,10,20,30,20]
    for i, (ts, text) in enumerate([
        ("00:00:10", "aa"), ("00:00:20", "bbbb"), ("00:00:40", "c"),
        ("00:01:10", "dd"), ("00:01:30", "eee"),
    ]):
        rows.append(("A", i, ts, text))
    # conv B: 3 turns, one bucket; latencies [nan,30,15]
    for i, (ts, text) in enumerate([
        ("00:05:00", "x"), ("00:05:30", "yz"), ("00:05:45", "wvu"),
    ]):
        rows.append(("B", i, ts, text))
    # conv C: 12 turns every 10s spanning the hour boundary
    for i in range(12):
        total = 59 * 60 + i * 10
        ts = f"{total // 3600:02d}:{(total % 3600) // 60:02d}:{total % 60:02d}"
        rows.append(("C", i, ts, "a"))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "_ts", "text"])
    df["ts"] = df["_ts"].map(_t)
    df["role"] = "user"
    df["tool"] = ""
    df = df.drop(columns=["_ts"])
    # shuffled input: the engine must restore (conv_id, turn_idx) order
    return df.sample(frac=1.0, random_state=7).reset_index(drop=True)


@pytest.fixture(scope="module")
def rolled(ray_session):
    import pyarrow as pa
    import ray.data

    df = hand_table()
    t = pa.table({
        "conv_id": pa.array(df["conv_id"], pa.string()),
        "turn_idx": pa.array(df["turn_idx"], pa.int32()),
        "role": pa.array(df["role"], pa.string()),
        "text": pa.array(df["text"], pa.string()),
        "tool": pa.array(df["tool"], pa.string()),
        "ts": pa.array(df["ts"].to_numpy(), pa.timestamp("us")),
    })
    ds = ray.data.from_arrow(t)
    m1 = rollup_transcripts(ds, "1m", num_partitions=3).materialize()
    return m1


def row(df, conv, bucket):
    m = df[(df["conv_id"] == conv) & (df["bucket_ts"] == _t(bucket))]
    assert len(m) == 1, (conv, bucket, len(m))
    return m.iloc[0]


def test_1m_hand_values(rolled):
    df = rolled.to_pandas()
    assert len(df) == 2 + 1 + 2  # A:2 buckets, B:1, C:2

    a0 = row(df, "A", "00:00:00")
    assert a0["n_turns"] == 3 and a0["count_latency"] == 2
    assert a0["sum_latency"] == 30.0 and a0["min_latency"] == 10.0 and a0["max_latency"] == 20.0
    assert a0["mean_latency"] == 15.0 and a0["p50_latency"] == 15.0
    assert abs(a0["p99_latency"] - 19.9) < 1e-9
    assert a0["count_text_len"] == 3 and a0["sum_text_len"] == 7.0
    assert a0["min_text_len"] == 1.0 and a0["max_text_len"] == 4.0
    assert abs(a0["mean_text_len"] - 7.0 / 3.0) < 1e-12
    assert a0["p50_text_len"] == 2.0 and abs(a0["p99_text_len"] - 3.96) < 1e-9

    a1 = row(df, "A", "00:01:00")
    assert a1["n_turns"] == 2 and a1["count_latency"] == 2
    assert a1["sum_latency"] == 50.0 and a1["mean_latency"] == 25.0
    assert a1["p50_latency"] == 25.0 and abs(a1["p99_latency"] - 29.9) < 1e-9

    b = row(df, "B", "00:05:00")
    assert b["n_turns"] == 3 and b["count_latency"] == 2
    assert b["sum_latency"] == 45.0 and b["min_latency"] == 15.0 and b["max_latency"] == 30.0
    assert b["mean_latency"] == 22.5 and b["p50_latency"] == 22.5
    assert abs(b["p99_latency"] - 29.85) < 1e-9

    c0 = row(df, "C", "00:59:00")
    assert c0["n_turns"] == 6 and c0["count_latency"] == 5
    assert c0["sum_latency"] == 50.0 and c0["p50_latency"] == 10.0

    c1 = row(df, "C", "01:00:00")
    # first turn of the 01:00 bucket still has latency 10 (gap from the
    # previous turn of the SAME conversation — buckets do not reset series)
    assert c1["n_turns"] == 6 and c1["count_latency"] == 6
    assert c1["sum_latency"] == 60.0 and c1["mean_latency"] == 10.0


def test_1h_cascade_hand_values(rolled):
    h1 = cascade(rolled, "1h").to_pandas()
    assert len(h1) == 3 + 1  # (A,00) (B,00) (C,00) + (C,01)

    a = row(h1, "A", "00:00:00")
    assert a["count_latency"] == 4 and a["sum_latency"] == 80.0
    assert a["min_latency"] == 10.0 and a["max_latency"] == 30.0 and a["mean_latency"] == 20.0
    assert a["count_text_len"] == 5 and a["sum_text_len"] == 12.0

    c_h0 = row(h1, "C", "00:00:00")
    assert c_h0["count_latency"] == 5 and c_h0["sum_latency"] == 50.0
    c_h1 = row(h1, "C", "01:00:00")
    assert c_h1["count_latency"] == 6 and c_h1["sum_latency"] == 60.0
