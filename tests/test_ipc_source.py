"""Arrow IPC source/sink: exact-schema roundtrip."""

import numpy as np
import pandas as pd


def test_ipc_roundtrip_exact_schema(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from spectral_time_series_ray.sources.ipc import (
        read_transcripts_ipc,
        write_transcripts_ipc,
    )

    df = pd.DataFrame({
        "conv_id": ["a", "a", "b"],
        "turn_idx": np.array([0, 1, 0], np.int32),
        "ts": pd.to_datetime(
            ["2024-01-01 00:00:00", "2024-01-01 00:01:00",
             "2024-01-02 09:30:00"]).astype("datetime64[us]"),
        "text": ["hi", "there", "yo"],
    })
    src = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = str(tmp_path / "ipc")
    n = write_transcripts_ipc(src, out)
    assert n >= 1
    back = read_transcripts_ipc(out)
    got = back.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # exact schema: int32 stays int32, timestamp stays us
    assert got["turn_idx"].dtype == np.int32
    assert str(got["ts"].dtype) == "datetime64[us]"
    pd.testing.assert_frame_equal(got, df)
    # column projection
    just_text = read_transcripts_ipc(out, columns=["conv_id", "text"]).to_pandas()
    assert list(just_text.columns) == ["conv_id", "text"]
    assert len(just_text) == 3
