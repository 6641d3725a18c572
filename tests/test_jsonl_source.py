"""JSONL transcript source/sink roundtrip tests."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def small_transcripts():
    rng = np.random.default_rng(9)
    n = 500
    conv = np.repeat([f"c{i:03d}" for i in range(25)], 20)
    idx = np.tile(np.arange(20, dtype=np.int32), 25)
    role = np.array(["user", "assistant", "tool"], dtype=object)[
        rng.integers(0, 3, n)
    ]
    tool = np.where(role == "tool", "tool_1", "")
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 10**9, n), unit="us"
    )
    return pd.DataFrame(
        {
            "conv_id": conv,
            "turn_idx": idx,
            "role": role,
            "text": [f"msg {i} éü" for i in range(n)],  # non-ascii
            "tool": tool,
            "ts": ts.astype("datetime64[us]"),
        }
    )


def test_jsonl_roundtrip_bit_exact(ray_session, small_transcripts, tmp_path):
    import ray.data

    from spectral_time_series_ray.sources.jsonl import (
        read_transcripts_jsonl,
        write_transcripts_jsonl,
    )

    ds = ray.data.from_pandas(small_transcripts)
    out = str(tmp_path / "jsonl")
    write_transcripts_jsonl(ds, out)
    back = (
        read_transcripts_jsonl(out)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = small_transcripts.sort_values(["conv_id", "turn_idx"]).reset_index(
        drop=True
    )[back.columns.tolist()]
    pd.testing.assert_frame_equal(
        back.astype({"ts": "datetime64[us]"}), exp, check_dtype=True
    )


def test_jsonl_schema_restored(ray_session, small_transcripts, tmp_path):
    import pyarrow as pa
    import ray.data

    from spectral_time_series_ray.sources.jsonl import (
        read_transcripts_jsonl,
        write_transcripts_jsonl,
    )

    out = str(tmp_path / "jsonl2")
    write_transcripts_jsonl(ray.data.from_pandas(small_transcripts), out)
    ds = read_transcripts_jsonl(out, columns=["conv_id", "turn_idx", "ts"])
    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    assert types["turn_idx"] == pa.int32()
    assert types["ts"] == pa.timestamp("us")
    assert ds.count() == len(small_transcripts)
