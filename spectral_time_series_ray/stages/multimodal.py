"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode libraries (PIL / torchaudio / ffmpeg) are NOT in this
container, so the *decode* kernels are deterministic fakes behind an
import-try (clearly marked); the Ray-side plumbing — schema, batch
sizing, actor-pool signature, output layout — is real and tested.

Blob format (synthetic): ``b"SMM1" + mode(1B) + width(u16) + height(u16)
+ channels(1B) + payload`` where payload bytes are a seeded PRNG
stream. Feature extraction (byte histograms, payload stats) is real
computation over the binary payload.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

MAGIC = b"SMM1"
MODES = {0: "image", 1: "audio", 2: "video"}


def synth_blob(rng: np.random.Generator, mode: int, width: int, height: int, channels: int) -> bytes:
    payload = rng.integers(0, 256, width * height * channels, dtype=np.uint8)
    header = MAGIC + struct.pack("<BHHB", mode, width, height, channels)
    return header + payload.tobytes()


def synth_media_table(n: int = 200, seed: int = 42) -> pd.DataFrame:
    """Deterministic media table: (media_id, kind, blob, n_bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        mode = int(rng.integers(0, 3))
        w, h, c = int(rng.integers(8, 64)), int(rng.integers(8, 64)), int(rng.integers(1, 4))
        blob = synth_blob(rng, mode, w, h, c)
        rows.append(
            {"media_id": i, "kind": MODES[mode], "blob": blob, "n_bytes": len(blob)}
        )
    return pd.DataFrame(rows)


def parse_header(blob: bytes) -> dict:
    if blob[:4] != MAGIC:
        raise ValueError("not an SMM1 blob")
    mode, w, h, c = struct.unpack("<BHHB", blob[4:10])
    return {"mode": MODES[mode], "width": w, "height": h, "channels": c}


class MediaDecoder:
    """Actor-pool decode stage. Real libraries are absent in this
    container: ``backend='fake'`` parses the SMM1 header and exposes
    the payload; ``backend='pil'`` raises NotImplementedError unless
    PIL is importable (import-try gate)."""

    def __init__(self, backend: str = "fake"):
        self.backend = backend
        if backend == "pil":
            try:
                import PIL.Image  # noqa: F401
            except ImportError as e:  # pragma: no cover - container has no PIL
                raise NotImplementedError(
                    "PIL backend requires pillow; use backend='fake' in this container"
                ) from e

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        metas = [parse_header(b) for b in batch["blob"]]
        out = batch.copy()
        out["width"] = [m["width"] for m in metas]
        out["height"] = [m["height"] for m in metas]
        out["channels"] = [m["channels"] for m in metas]
        return out


class MediaFeaturizer:
    """Real features over the binary payload: byte histogram (16 bins),
    mean/std — the shape of an embedding-extraction stage with small
    batches for large binary rows."""

    def __init__(self, bins: int = 16):
        self.bins = bins
        self.edges = np.linspace(0, 256, bins + 1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats, means, stds = [], [], []
        for b in batch["blob"]:
            payload = np.frombuffer(b, dtype=np.uint8, offset=10)
            hist, _ = np.histogram(payload, bins=self.edges)
            feats.append((hist / max(1, len(payload))).astype(np.float32))
            means.append(float(payload.mean()) if len(payload) else 0.0)
            stds.append(float(payload.std()) if len(payload) else 0.0)
        out = batch.drop(columns=["blob"]).copy()
        out["byte_hist"] = feats
        out["byte_mean"] = means
        out["byte_std"] = stds
        return out


class FrameSampler:
    """Video path: sample every k-th "frame" (payload stride slices)."""

    def __init__(self, every_k: int = 4):
        self.every_k = every_k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for media_id, blob in zip(batch["media_id"], batch["blob"]):
            meta = parse_header(blob)
            if meta["mode"] != "video":
                continue
            payload = np.frombuffer(blob, dtype=np.uint8, offset=10)
            frame_size = meta["width"] * meta["channels"]
            n_frames = max(1, len(payload) // max(1, frame_size))
            for fi in range(0, n_frames, self.every_k):
                frame = payload[fi * frame_size : (fi + 1) * frame_size]
                rows.append(
                    {
                        "media_id": media_id,
                        "frame_idx": fi,
                        "frame_bytes": frame.tobytes(),
                    }
                )
        if not rows:
            return pd.DataFrame({"media_id": pd.Series([], dtype=np.int64),
                                 "frame_idx": pd.Series([], dtype=np.int64),
                                 "frame_bytes": pd.Series([], dtype=object)})
        return pd.DataFrame(rows)


def decode_media(ds, concurrency: int = 2, batch_size: int = 64):
    # small batches: binary payloads are wide; batch x concurrency must
    # fit the worker heap (ray_guide.md memory notes)
    return ds.map_batches(
        MediaDecoder, batch_format="pandas", batch_size=batch_size, concurrency=concurrency
    )


def featurize_media(ds, concurrency: int = 2, batch_size: int = 64):
    return ds.map_batches(
        MediaFeaturizer, batch_format="pandas", batch_size=batch_size, concurrency=concurrency
    )


def sample_frames(ds, every_k: int = 4, concurrency: int = 2):
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_k": every_k},
        batch_format="pandas",
        batch_size=32,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# REAL formats, dependency-free: RIFF/WAV PCM16 audio and PPM (P6) images
# are fully decodable with struct + numpy, so the decode stages below are
# genuine codecs (not the SMM1 fake) while still requiring no PIL/ffmpeg.
# ---------------------------------------------------------------------------


def synth_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 mono samples as a real RIFF/WAVE PCM16 file."""
    samples = np.asarray(samples, dtype="<i2")
    payload = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(blob: bytes) -> tuple[int, np.ndarray]:
    """Parse a RIFF/WAVE PCM16 mono file by walking its chunk list
    (a real parser: tolerates extra chunks, validates the fmt tag).
    Returns (sample_rate, int16 samples)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, sr, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos:pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4:pos + 8])
        body = blob[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_ch, sr, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if (audio_fmt, n_ch, bits) != (1, 1, 16):
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sr is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return sr, data


def synth_ppm(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a real binary PPM (P6)."""
    h, w, c = img.shape
    assert c == 3
    return f"P6\n{w} {h}\n255\n".encode() + np.ascontiguousarray(
        img, dtype=np.uint8).tobytes()


def decode_ppm(blob: bytes) -> np.ndarray:
    """Parse a binary PPM (P6) with full header handling (comments,
    arbitrary whitespace). Returns an (h, w, 3) uint8 array."""
    if blob[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos = 2
    fields = []
    while len(fields) < 3:
        while pos < len(blob) and blob[pos:pos + 1].isspace():
            pos += 1
        if blob[pos:pos + 1] == b"#":           # comment to end of line
            while pos < len(blob) and blob[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    arr = np.frombuffer(blob, dtype=np.uint8, count=w * h * 3, offset=pos)
    return arr.reshape(h, w, 3)


class AudioFeaturizer:
    """Actor-pool stage: decode WAV blobs and extract REAL audio
    features — RMS, zero-crossing rate, dominant frequency (rFFT
    argmax) and spectral centroid. The Hann window is built once per
    actor (stateful setup), features are vectorized numpy per blob."""

    def __init__(self, n_fft: int = 2048):
        self.n_fft = n_fft
        self._hann = 0.5 - 0.5 * np.cos(
            2.0 * np.pi * np.arange(n_fft) / n_fft)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for b in batch["blob"]:
            sr, x = decode_wav(b)
            xf = x.astype(np.float64) / 32768.0
            rms = float(np.sqrt(np.mean(xf * xf)))
            zcr = float(np.mean(np.abs(np.diff(np.signbit(xf))))) if len(xf) > 1 else 0.0
            seg = xf[: self.n_fft]
            if len(seg) < self.n_fft:
                seg = np.pad(seg, (0, self.n_fft - len(seg)))
            mag = np.abs(np.fft.rfft(seg * self._hann))
            freqs = np.fft.rfftfreq(self.n_fft, 1.0 / sr)
            dom = float(freqs[int(np.argmax(mag[1:])) + 1])
            cen = float((freqs * mag).sum() / mag.sum()) if mag.sum() > 0 else 0.0
            rows.append((sr, len(x), rms, zcr, dom, cen))
        out = batch[[c for c in batch.columns if c != "blob"]].copy()
        out[["sample_rate", "n_samples", "rms", "zcr",
             "dominant_hz", "centroid_hz"]] = pd.DataFrame(rows, index=batch.index)
        return out


class ImageFeaturizer:
    """Actor-pool stage: decode PPM blobs and extract REAL image
    features — per-channel means, a 4x4 mean-pooled luma thumbnail
    (flattened), and mean gradient magnitude (edge energy)."""

    def __init__(self, thumb: int = 4):
        self.thumb = thumb

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for b in batch["blob"]:
            img = decode_ppm(b).astype(np.float64)
            h, w, _ = img.shape
            luma = img @ np.array([0.299, 0.587, 0.114])
            t = self.thumb
            ys = (np.arange(h) * t) // h
            xs = (np.arange(w) * t) // w
            thumb = np.zeros((t, t))
            cnt = np.zeros((t, t))
            np.add.at(thumb, (ys[:, None], xs[None, :]), luma)
            np.add.at(cnt, (ys[:, None], xs[None, :]), 1.0)
            thumb /= cnt
            gx = np.abs(np.diff(luma, axis=1)).mean() if w > 1 else 0.0
            gy = np.abs(np.diff(luma, axis=0)).mean() if h > 1 else 0.0
            rows.append((h, w, float(img[..., 0].mean()),
                         float(img[..., 1].mean()), float(img[..., 2].mean()),
                         thumb.ravel().tolist(), float(gx + gy)))
        out = batch[[c for c in batch.columns if c != "blob"]].copy()
        out[["height", "width", "mean_r", "mean_g", "mean_b",
             "thumb", "edge_energy"]] = pd.DataFrame(
            rows, index=batch.index,
            columns=["height", "width", "mean_r", "mean_g", "mean_b",
                     "thumb", "edge_energy"])
        return out


def dhash64(img: np.ndarray) -> int:
    """Perceptual difference hash (dHash, Krawetz 2013): mean-pool the
    luma plane to 8 rows x 9 cols, emit one bit per horizontal
    neighbor comparison (left < right) — 64 bits. Invariant to global
    brightness/contrast shifts (monotone maps preserve comparisons)
    and robust to small noise; near-duplicate images differ in a few
    bits, so Hamming banding finds them."""
    luma = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = luma.shape
    ys = (np.arange(h) * 8) // h
    xs = (np.arange(w) * 9) // w
    pool = np.zeros((8, 9))
    cnt = np.zeros((8, 9))
    np.add.at(pool, (ys[:, None], xs[None, :]), luma)
    np.add.at(cnt, (ys[:, None], xs[None, :]), 1.0)
    pool /= cnt
    bits = (pool[:, :-1] < pool[:, 1:]).ravel()
    return int(np.packbits(bits).view(">u8")[0])


class ImageDHashStage:
    """Actor-pool stage: decode PPM blobs -> 64-bit dHash fingerprints
    in the ``(doc_id, simhash)`` contract of
    `dedup.hamming64_cluster`, so image near-dup shares the text
    SimHash banding machinery."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        hs = np.fromiter(
            (dhash64(decode_ppm(b)) for b in batch["blob"]),
            dtype=np.uint64, count=len(batch),
        )
        return pd.DataFrame({
            "doc_id": batch["media_id"].to_numpy(np.int64),
            "simhash": hs.view(np.int64),
        })


def audio_fingerprint64(samples: np.ndarray, sample_rate: int,
                        n_frames: int = 16, n_bands: int = 16) -> int:
    """64-bit spectral-peak audio fingerprint (the peak-constellation
    idea of Shazam, Wang ISMIR'03, reduced to one word): the signal
    splits into ``n_frames`` Hann-windowed frames; each frame
    contributes the 4-bit INDEX of its dominant log-spaced frequency
    band — 16 frames x 4 bits = 64 bits. Exactly invariant to
    amplitude scaling (argmax of uniformly scaled energies) and robust
    to noise far below the dominant partial; two recordings share
    nibbles only where the same band dominates the same frame, so
    structurally different audio sits ~half the nibbles apart."""
    x = samples.astype(np.float64)
    n = len(x)
    frame_len = n // n_frames
    if frame_len < 2 * n_bands:
        raise ValueError("audio too short for fingerprinting")
    frames = x[: frame_len * n_frames].reshape(n_frames, frame_len)
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame_len) / frame_len)
    mag = np.abs(np.fft.rfft(frames * win, axis=1)) ** 2
    freqs = np.fft.rfftfreq(frame_len, 1.0 / sample_rate)
    lo, hi = 100.0, min(3200.0, sample_rate / 2.0)
    edges = lo * (hi / lo) ** (np.arange(n_bands + 1) / n_bands)
    idx = np.searchsorted(freqs, edges)
    E = np.stack([mag[:, idx[b]:max(idx[b] + 1, idx[b + 1])].sum(axis=1)
                  for b in range(n_bands)], axis=1)
    codes = E.argmax(axis=1).astype(np.uint64)     # 4-bit band index
    h = np.uint64(0)
    for c in codes:
        h = (h << np.uint64(4)) | c
    return int(h)


class AudioFingerprintStage:
    """Actor-pool stage: decode WAV blobs -> 64-bit Haitsma-Kalker
    fingerprints in the ``(doc_id, simhash)`` contract of
    `dedup.hamming64_cluster` — the third modality on the shared
    Hamming banding engine."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        hs = np.empty(len(batch), np.uint64)
        for i, b in enumerate(batch["blob"]):
            sr, x = decode_wav(b)
            hs[i] = audio_fingerprint64(x, sr)
        return pd.DataFrame({
            "doc_id": batch["media_id"].to_numpy(np.int64),
            "simhash": hs.view(np.int64),
        })


VIDEO_MAGIC = b"VID1"


def synth_video(frames: list[np.ndarray]) -> bytes:
    """Encode a frame sequence as a simple length-prefixed container:
    ``b"VID1" + u32 n_frames + n x (u32 size) + concatenated PPMs``.
    Each frame is a real P6 PPM, so per-frame decoding exercises the
    real image codec."""
    blobs = [synth_ppm(f) for f in frames]
    head = VIDEO_MAGIC + struct.pack("<I", len(blobs))
    head += b"".join(struct.pack("<I", len(b)) for b in blobs)
    return head + b"".join(blobs)


def decode_video(blob: bytes) -> list[np.ndarray]:
    """Parse the VID1 container and decode every PPM frame."""
    if blob[:4] != VIDEO_MAGIC:
        raise ValueError("not a VID1 container")
    (n,) = struct.unpack("<I", blob[4:8])
    sizes = struct.unpack(f"<{n}I", blob[8:8 + 4 * n])
    pos = 8 + 4 * n
    frames = []
    for s in sizes:
        frames.append(decode_ppm(blob[pos:pos + s]))
        pos += s
    return frames


class VideoShotStage:
    """Actor-pool stage: decode VID1 blobs, dHash every frame, and cut
    SHOT BOUNDARIES where consecutive frames' perceptual hashes jump
    by more than ``cut_dist`` bits (the classic hash-delta shot
    detector); emits one row per shot with its first frame as the
    keyframe id and the frame span — the frame-sampling front end of a
    video training-data pipeline."""

    def __init__(self, cut_dist: int = 10):
        self.cut_dist = cut_dist

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for mid, b in zip(batch["media_id"], batch["blob"]):
            frames = decode_video(b)
            hs = np.array([dhash64(f) for f in frames], dtype=np.uint64)
            if len(hs) == 0:
                continue
            x = hs[1:] ^ hs[:-1]
            # vectorized popcount over uint64 via the 8-byte view
            d = np.unpackbits(x.view(np.uint8)).reshape(len(x), 64).sum(1)
            cuts = np.flatnonzero(d > self.cut_dist) + 1
            bounds = np.concatenate([[0], cuts, [len(hs)]])
            keys = hs.view(np.int64)   # two's-complement reinterpret
            for s, e in zip(bounds[:-1], bounds[1:]):
                out.append((int(mid), int(s), int(e), int(keys[s])))
        return pd.DataFrame(out, columns=[
            "media_id", "start_frame", "end_frame_excl", "keyframe_dhash",
        ]).astype({"media_id": np.int64, "start_frame": np.int64,
                   "end_frame_excl": np.int64, "keyframe_dhash": np.int64})
