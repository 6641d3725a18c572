import numpy as np
import pyarrow.compute as pc

from spectral_time_series_ray.sources.transcripts import (
    generate_transcripts,
    sf_from_dir,
    transcripts_path,
)


def test_schema_and_determinism():
    t1 = generate_transcripts(2000, seed=42)
    t2 = generate_transcripts(2000, seed=42)
    assert t1.schema.names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert str(t1.schema.field("ts").type) == "timestamp[us]"
    assert str(t1.schema.field("turn_idx").type) == "int32"
    assert t1.equals(t2)  # bit-reproducible
    assert not t1.equals(generate_transcripts(2000, seed=1))


def test_conversations_contiguous_and_increasing():
    t = generate_transcripts(3000, seed=42).to_pandas()
    g = t.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")
    for _, conv in list(g)[:50]:
        idx = conv["turn_idx"].to_numpy()
        np.testing.assert_array_equal(idx, np.arange(len(idx)))
        ts = conv["ts"].astype("int64").to_numpy()
        assert (np.diff(ts) > 0).all()  # strictly increasing
    sizes = g.size()
    assert sizes.min() >= 2 and sizes.max() <= 5000


def test_rows_are_shuffled():
    t = generate_transcripts(2000, seed=42)
    idx = t["turn_idx"].to_numpy()
    assert not (np.diff(idx) >= 0).all()


def test_tool_only_on_tool_turns():
    t = generate_transcripts(1000, seed=42)
    mask = pc.equal(t["role"], "tool")
    tools = t.filter(mask)["tool"].to_pylist()
    others = t.filter(pc.invert(mask))["tool"].to_pylist()
    assert all(v.startswith("tool_") for v in tools)
    assert all(v == "" for v in others)


def test_sf_parse_and_cache(tmp_path):
    assert sf_from_dir("/root/testdata/sf0.01") == 0.01
    p1 = transcripts_path(0.001, cache_root=str(tmp_path))
    p2 = transcripts_path(0.001, cache_root=str(tmp_path))
    assert p1 == p2
    import pyarrow.parquet as pq

    assert pq.ParquetDataset(p1).read(columns=["turn_idx"]).num_rows >= 6000
