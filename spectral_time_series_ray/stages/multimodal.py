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
