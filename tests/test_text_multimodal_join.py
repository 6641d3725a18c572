import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.stages.join import (
    anti_join_keys,
    broadcast_join,
    semi_join_keys,
)
from spectral_time_series_ray.stages.multimodal import (
    MediaDecoder,
    decode_media,
    featurize_media,
    parse_header,
    sample_frames,
    synth_blob,
    synth_media_table,
)
from spectral_time_series_ray.stages.text import analyze_documents, fingerprint_documents


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "the quick brown fox jumps over the lazy dog near the river bank today",
                "el perro grande y la casa en un lugar de la mancha con los gatos",
                "short",
            ],
        }
    )
    return ray.data.from_pandas(df).materialize()


def test_analyze_documents(docs_ds):
    out = analyze_documents(docs_ds, concurrency=1).to_pandas().sort_values("doc_id")
    assert out["lang_pred"].tolist()[:2] == ["en", "es"]
    assert out["ws_tokens"].tolist() == [14, 15, 1]
    assert (out["bpe_tokens"] >= out["ws_tokens"] - 1).all()
    assert out["quality"].iloc[0] > out["quality"].iloc[2]


def test_fingerprints(docs_ds):
    out = fingerprint_documents(docs_ds, concurrency=1).to_pandas()
    assert len(out) == 3
    assert all(len(np.asarray(f)) >= 1 for f in out["fingerprint"])


def test_broadcast_join(ray_session):
    import ray.data

    left = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3, 4], "v": "abcd "}))
    small = pd.DataFrame({"k": [1, 3], "name": ["one", "three"]})
    out = broadcast_join(left, small, on="k", how="inner", concurrency=1).to_pandas()
    assert sorted(out["k"]) == [1, 3]
    assert set(out.columns) == {"k", "v", "name"}


def test_semi_anti_join(ray_session):
    import ray.data

    ds = ray.data.range(10)
    semi = semi_join_keys(ds, {1, 5, 7}, "id").to_pandas()
    assert sorted(semi["id"]) == [1, 5, 7]
    anti = anti_join_keys(ds, {1, 5, 7}, "id").to_pandas()
    assert sorted(anti["id"]) == [0, 2, 3, 4, 6, 8, 9]


def test_synth_blob_header_roundtrip():
    rng = np.random.default_rng(0)
    blob = synth_blob(rng, 1, 32, 16, 2)
    meta = parse_header(blob)
    assert meta == {"mode": "audio", "width": 32, "height": 16, "channels": 2}
    assert len(blob) == 10 + 32 * 16 * 2


def test_media_table_deterministic():
    a, b = synth_media_table(50, seed=9), synth_media_table(50, seed=9)
    assert a["blob"].equals(b["blob"])


def test_decode_featurize(ray_session):
    import ray.data

    ds = ray.data.from_pandas(synth_media_table(60, seed=1))
    dec = decode_media(ds, concurrency=1).to_pandas()
    assert {"width", "height", "channels"} <= set(dec.columns)
    feats = featurize_media(ray.data.from_pandas(synth_media_table(60, seed=1)), concurrency=1).to_pandas()
    assert "blob" not in feats.columns
    assert all(abs(np.asarray(h).sum() - 1.0) < 1e-6 for h in feats["byte_hist"])
    assert ((feats["byte_mean"] > 100) & (feats["byte_mean"] < 155)).all()


def test_frame_sampler(ray_session):
    import ray.data

    df = synth_media_table(80, seed=2)
    frames = sample_frames(ray.data.from_pandas(df), every_k=4, concurrency=1).to_pandas()
    n_videos = (df["kind"] == "video").sum()
    assert n_videos > 0
    assert set(frames["media_id"]).issubset(set(df.loc[df["kind"] == "video", "media_id"]))
    assert len(set(frames["media_id"])) == n_videos
    assert (frames["frame_idx"] % 4 == 0).all()


def test_pil_backend_gated():
    with pytest.raises(NotImplementedError):
        MediaDecoder(backend="pil")


def test_bad_blob_rejected():
    with pytest.raises(ValueError):
        parse_header(b"NOTMAGIC" + b"\x00" * 10)


def test_bloom_empty_sides(ray_session):
    """An empty (schema-less) dataset on either side of the Bloom
    pushdown is a well-defined no-op, not a crash: an empty build side
    yields a filter that rejects everything; an empty probe side passes
    through untouched.  Regression for the sf0.001 q7 crash where a
    drained dimension side left ``ds.schema()`` as None."""
    import ray.data

    from spectral_time_series_ray.stages.join import (
        bloom_semi_filter,
        build_bloom,
        key_hash_scheme,
    )

    full = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]}))
    # empty via an empty broadcast-join side + a rebuild map that mixes
    # positional numpy arrays with an index-bearing empty Series: this
    # is the exact shape (q7's supplier prefilter at sf0.001) that
    # loses its schema in Ray 2.49
    side = pd.DataFrame(
        {"k": pd.Series([], dtype=np.int64), "tag": pd.Series([], dtype=object)}
    )

    def rebuild(b):
        return pd.DataFrame({"k": b["k"].to_numpy(), "tag": b["tag"]})

    empty = (
        broadcast_join(full, side, on="k")
        .map_batches(rebuild, batch_format="pandas", batch_size=None)
        .materialize()
    )
    if empty.schema() is not None:
        pytest.skip("Ray version keeps empty-block schemas; race not reproducible")

    assert key_hash_scheme(empty, "k") == "empty"
    bloom = build_bloom(empty, "k")
    assert bloom.scheme is None
    out = bloom_semi_filter(full, "k", bloom).to_pandas()
    assert len(out) == 0  # empty build side matches nothing
    kept = bloom_semi_filter(full, "k", bloom, invert=True).to_pandas()
    assert sorted(kept["k"]) == [1, 2, 3]  # anti half keeps everything
    # empty probe side: no-op, no crash
    probe = bloom_semi_filter(empty, "k", build_bloom(full, "k"))
    assert probe.count() == 0
