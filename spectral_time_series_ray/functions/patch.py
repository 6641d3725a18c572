"""Patchify / chunking — reshape a series into fixed-size patches.

Semantics from the reference's `Patchify`
(`uni2ts/src/uni2ts/transform/patch.py:124-159`): reshape
``(... time*patch) -> (... time patch)``; our variant right-pads the
tail with NaN to a whole-patch multiple instead of requiring exact
multiples (the reference crops to multiples upstream via PatchCrop;
rollup chunks don't crop, so we pad).

Patch-size selection mirrors `FixedPatchSizeConstraints`
(reference patch.py:44-54): our 1m/1h/1d tiers are fixed widths.
"""

from __future__ import annotations

import numpy as np


def patchify(x: np.ndarray, patch_size: int, pad_value: float = np.nan) -> np.ndarray:
    """1-D [time] -> 2-D [n_patches, patch_size], tail NaN-padded."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    n_patches = -(-n // patch_size) if n else 0
    out = np.full(n_patches * patch_size, pad_value)
    out[:n] = x
    return out.reshape(n_patches, patch_size)


def unpatchify(p: np.ndarray, length: int | None = None) -> np.ndarray:
    """Inverse of :func:`patchify`; trims tail padding when ``length``
    is given."""
    flat = np.asarray(p).reshape(-1)
    return flat[:length] if length is not None else flat
