"""Real WAV/PPM codec roundtrips + featurizer correctness."""

import numpy as np
import pandas as pd

from spectral_time_series_ray.stages.multimodal import (
    AudioFeaturizer,
    ImageFeaturizer,
    decode_ppm,
    decode_wav,
    synth_ppm,
    synth_wav,
)


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(1)
    x = rng.integers(-32768, 32767, 5000).astype(np.int16)
    sr, y = decode_wav(synth_wav(x, 16000))
    assert sr == 16000
    assert np.array_equal(x, y)


def test_wav_parser_tolerates_extra_chunks():
    import struct
    x = np.arange(100, dtype=np.int16)
    blob = synth_wav(x, 8000)
    # splice a LIST chunk between fmt and data
    fmt_end = blob.index(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = blob[:fmt_end] + extra + blob[fmt_end:]
    sr, y = decode_wav(spliced)
    assert sr == 8000 and np.array_equal(x, y)


def test_ppm_roundtrip_and_comments():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (7, 11, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(synth_ppm(img)), img)
    # header with comments + odd whitespace
    blob = b"P6\n# a comment\n 11\t7 # trailing\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(blob), img)


def test_audio_featurizer_tone():
    sr = 8000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440.0 * t) * 20000).astype(np.int16)
    df = pd.DataFrame({"media_id": [0], "blob": [synth_wav(x, sr)]})
    out = AudioFeaturizer()(df)
    assert abs(out["dominant_hz"].iloc[0] - 440.0) <= sr / 2048.0
    assert 0.2 < out["rms"].iloc[0] < 0.5


def test_image_featurizer_gradient():
    w, h = 32, 16
    img = np.repeat(np.tile(
        np.linspace(0, 255, w).astype(np.uint8)[None, :, None],
        (h, 1, 1)), 3, axis=2)
    df = pd.DataFrame({"media_id": [0], "blob": [synth_ppm(img)]})
    out = ImageFeaturizer()(df)
    m = np.asarray(out["thumb"].iloc[0]).reshape(4, 4)
    assert (np.diff(m, axis=1) > 0).all()
    assert out["edge_energy"].iloc[0] > 0


def test_dhash_invariances():
    from spectral_time_series_ray.stages.multimodal import dhash64

    rng = np.random.default_rng(3)
    y, x = np.mgrid[0:40, 0:40]
    img = np.repeat(
        (120 + 60 * np.sin(x / 5) + 40 * np.cos(y / 7)).clip(0, 255)[..., None],
        3, 2).astype(np.uint8)
    h0 = dhash64(img)
    # global brightness shift: identical hash (monotone map)
    shifted = np.clip(img.astype(int) + 25, 0, 255).astype(np.uint8)
    assert dhash64(shifted) == h0
    # small noise: within a few bits
    noisy = np.clip(img.astype(int) + rng.integers(-4, 5, img.shape),
                    0, 255).astype(np.uint8)
    assert bin(dhash64(noisy) ^ h0).count("1") <= 3
    # a structurally different image: far away
    other = np.repeat(
        (120 + 60 * np.sin((x + 2 * y) / 3.3 + 1)).clip(0, 255)[..., None],
        3, 2).astype(np.uint8)
    assert bin(dhash64(other) ^ h0).count("1") > 10


def test_audio_fingerprint_invariances():
    from spectral_time_series_ray.stages.multimodal import audio_fingerprint64

    rng = np.random.default_rng(4)
    sr = 8000
    r = np.random.default_rng(77)
    segs = []
    for _ in range(16):
        f = r.uniform(150, 2500)
        tt = np.arange(sr // 16) / sr
        segs.append(np.sin(2 * np.pi * f * tt) * r.uniform(0.3, 0.6))
    x = np.concatenate(segs)
    h0 = audio_fingerprint64((x * 15000).astype(np.int16), sr)
    # amplitude scaling: identical (argmax invariance)
    h1 = audio_fingerprint64((x * 0.3 * 15000).astype(np.int16), sr)
    assert h1 == h0
    # mild noise: identical or within a nibble
    noisy = x + rng.normal(0, 0.01, len(x))
    h2 = audio_fingerprint64((noisy * 15000).astype(np.int16), sr)
    assert bin(h2 ^ h0).count("1") <= 4
    # different melody: far
    r2 = np.random.default_rng(78)
    segs2 = [np.sin(2 * np.pi * r2.uniform(150, 2500)
                    * np.arange(sr // 16) / sr) * 0.5 for _ in range(16)]
    h3 = audio_fingerprint64((np.concatenate(segs2) * 15000).astype(np.int16), sr)
    assert bin(h3 ^ h0).count("1") > 10


def test_video_roundtrip_and_shots():
    from spectral_time_series_ray.stages.multimodal import (
        VideoShotStage,
        decode_video,
        synth_video,
    )

    rng = np.random.default_rng(5)
    y, x = np.mgrid[0:24, 0:24]
    a = np.repeat((120 + 60 * np.sin(x / 4)).clip(0, 255)[..., None], 3, 2)
    b = np.repeat((120 + 60 * np.cos((x + 2 * y) / 3)).clip(0, 255)[..., None], 3, 2)
    frames = [np.clip(a + rng.integers(-2, 3, a.shape), 0, 255).astype(np.uint8)
              for _ in range(4)]
    frames += [np.clip(b + rng.integers(-2, 3, b.shape), 0, 255).astype(np.uint8)
               for _ in range(3)]
    blob = synth_video(frames)
    dec = decode_video(blob)
    assert len(dec) == 7 and np.array_equal(dec[0], frames[0])
    shots = VideoShotStage()(pd.DataFrame({"media_id": [1], "blob": [blob]}))
    spans = sorted(zip(shots["start_frame"], shots["end_frame_excl"]))
    assert spans == [(0, 4), (4, 7)]
