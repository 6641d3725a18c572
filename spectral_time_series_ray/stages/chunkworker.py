"""Combined chunk worker: Gorilla encode + spectral downsample in ONE
actor-pool pass.

The flagship consumes each packed chunk twice (compression and
spectral summary); doing both in a single ``map_batches`` actor pool
halves actor-pool startup and reads every chunk once — the
one-pass-over-data shape that matters when chunks stream from the
object store at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .compress import GorillaChunkEncoder
from .downsample import SpectralDownsampler


class CombinedChunkWorker:
    """__init__ once per actor (coefficients, window setup); __call__
    per batch: emits encoded bytes + spectral summary per chunk row."""

    def __init__(self, quantize_digits: int | None = 3, method: str = "welch", top_k: int = 8):
        self.encoder = GorillaChunkEncoder(quantize_digits=quantize_digits)
        self.downsampler = SpectralDownsampler(method=method, top_k=top_k)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        enc = self.encoder(batch)
        spec = self.downsampler(batch)
        for col in ("top_freqs", "top_power", "peak_freq", "method"):
            enc[col] = spec[col].to_numpy() if spec[col].dtype != object else spec[col].tolist()
        return enc


def process_chunks(
    chunk_ds,
    quantize_digits: int | None = 3,
    method: str = "welch",
    concurrency: int | None = 4,
    use_actors: bool = True,
):
    """``use_actors=True`` (default): actor pool — right when per-actor
    setup is expensive (model weights, big tables). ``use_actors=False``:
    stateless tasks over warm workers with a per-process worker cache —
    right when setup is trivial and pool spawn (~2s x pool size) would
    dominate, e.g. short benchmark stages."""
    if use_actors:
        return chunk_ds.map_batches(
            CombinedChunkWorker,
            fn_constructor_kwargs={"quantize_digits": quantize_digits, "method": method},
            batch_format="pandas",
            batch_size=256,
            concurrency=concurrency,
        )

    def fn(batch):
        # construction is trivial here (no model state); per-task build
        # beats paying pool spawn for a short stage
        return CombinedChunkWorker(quantize_digits=quantize_digits, method=method)(batch)

    return chunk_ds.map_batches(fn, batch_format="pandas", batch_size=256)
