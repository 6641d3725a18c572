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


def pad_to_min_length(
    arr: np.ndarray, min_length: int, rng: np.random.Generator | None = None
) -> np.ndarray:
    """NaN-pad the last axis to ``min_length`` with a random front/back
    split (reference Pad.map, `uni2ts/src/uni2ts/transform/pad.py:39-49`)."""
    arr = np.asarray(arr, dtype=float)
    length = arr.shape[-1]
    if length >= min_length:
        return arr
    rng = rng or np.random.default_rng()
    pad = min_length - length
    front = int(rng.integers(0, pad + 1))
    width = [(0, 0)] * (arr.ndim - 1) + [(front, pad - front)]
    return np.pad(arr, width, mode="constant", constant_values=np.nan)


def pad_freq(
    arr: np.ndarray,
    freq: str,
    freq_min_length_map: dict[str, int],
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Per-frequency minimum-length padding (reference PadFreq,
    `uni2ts/src/uni2ts/transform/pad.py:52-80`): the minimum comes from
    a freq -> min_length map, so hourly series can require different
    floors than daily ones."""
    return pad_to_min_length(arr, freq_min_length_map[freq], rng)


# Freq-dependent patch-size ranges (reference DefaultPatchSizeConstraints
# table, `uni2ts/src/uni2ts/transform/patch.py:57-70`): faster sampling
# rates get wider patches so one patch spans a useful wall-clock window.
DEFAULT_PATCH_RANGES: dict[str, tuple[int, int]] = {
    "S": (64, 128),
    "T": (32, 128),
    "H": (32, 64),
    "D": (16, 32),
    "B": (16, 32),
    "W": (16, 32),
    "M": (8, 32),
    "Q": (1, 8),
    "Y": (1, 8),
    "A": (1, 8),
}

_FREQ_ALIASES = {
    "MIN": "T", "MINUTE": "T", "SEC": "S", "SECOND": "S",
    "HOUR": "H", "DAY": "D", "WEEK": "W", "MONTH": "M",
    "1M": "T",  # engine tier names: 1m/1h/1d
    "1H": "H", "1D": "D",
}


def patch_size_constraints(freq: str, ranges: dict | None = None) -> range:
    """Inclusive->exclusive candidate range for a frequency string
    ('T', '10T', 'min', 'H', '1h', engine tiers '1m'/'1h'/'1d', ...).

    Mirrors the reference's ``DefaultPatchSizeConstraints.__call__``
    (patch.py:36-75): the multiplier is parsed but — like the
    reference — only the base offset name selects the range.
    """
    ranges = ranges or DEFAULT_PATCH_RANGES
    name = freq.strip().upper()
    if name in _FREQ_ALIASES:  # whole-string alias (handles '1m' tier)
        name = _FREQ_ALIASES[name]
    else:
        name = name.lstrip("0123456789 ")
        name = _FREQ_ALIASES.get(name, name)
    if name not in ranges:
        raise ValueError(f"unknown frequency {freq!r}")
    start, stop = ranges[name]
    return range(start, stop + 1)


# Seasonality table in the gluonts ``get_seasonality`` style (public
# convention; the reference calls it for MASE/MSIS seasonal error at
# `uni2ts/src/uni2ts/eval_util/evaluation.py:77`): season length = one
# natural cycle at the given sampling frequency.
DEFAULT_SEASONALITIES: dict[str, int] = {
    "S": 3600,  # secondly: one hour
    "T": 1440,  # minutely: one day
    "H": 24,    # hourly: one day
    "D": 7,     # daily: one week
    "B": 5,     # business-daily: one week
    "W": 1,
    "M": 12,    # monthly: one year
    "Q": 4,
    "Y": 1,
    "A": 1,
}


def get_seasonality(freq: str, seasonalities: dict[str, int] | None = None) -> int:
    """Season length for a frequency string ('T', '10T', 'H', engine
    tiers '1m'/'1h'/'1d', ...). Multiplier divides the base season
    (gluonts convention: seasonality('10T') = 1440/10 = 144); falls
    back to 1 when the cycle does not divide evenly."""
    seasonalities = seasonalities or DEFAULT_SEASONALITIES
    name = freq.strip().upper()
    mult = 1
    if name in _FREQ_ALIASES:
        name = _FREQ_ALIASES[name]
    else:
        digits = ""
        while name and name[0].isdigit():
            digits += name[0]
            name = name[1:]
        name = _FREQ_ALIASES.get(name.strip(), name.strip())
        mult = int(digits) if digits else 1
    if name not in seasonalities:
        raise ValueError(f"unknown frequency {freq!r}")
    base = seasonalities[name]
    return base // mult if base % mult == 0 and base >= mult else 1


def get_patch_size(
    length: int,
    freq: str,
    min_time_patches: int,
    patch_sizes=(8, 16, 32, 64, 128),
    rng: np.random.Generator | None = None,
) -> int:
    """Random patch size from ``patch_sizes`` ∩ freq-constraint range
    with at least ``min_time_patches`` whole patches in ``length``
    (reference GetPatchSize, patch.py:78-120). Raises ValueError when
    no candidate fits — surfacing too-short series instead of silently
    degrading."""
    constraints = patch_size_constraints(freq)
    ceil = length // min_time_patches
    if isinstance(patch_sizes, range):
        candidates = list(range(
            max(patch_sizes.start, constraints.start),
            min(patch_sizes.stop, constraints.stop, ceil + 1),
        ))
    else:
        candidates = [p for p in patch_sizes if p in constraints and p <= ceil]
    if not candidates:
        raise ValueError(
            f"no valid patch size for length={length}, freq={freq!r}, "
            f"min_time_patches={min_time_patches}, constraints={constraints}"
        )
    rng = rng or np.random.default_rng()
    return int(rng.choice(candidates))


def patch_crop_bounds(
    time: int,
    patch_size: int,
    min_time_patches: int,
    max_patches: int,
    rng: np.random.Generator,
    nvar: int = 1,
    will_flatten: bool = False,
    offset: bool = True,
    num_patches_sampler=None,
) -> tuple[int, int]:
    """Random whole-patch training-crop boundaries [start, stop)
    (reference PatchCrop._get_boundaries, crop.py:69-108):

    - random offset in [0, time % patch_size] so crops don't always
      start on a patch multiple
    - number of patches uniform in [min_time_patches, max_patches]
      (÷ nvar when flattening multivariate series), clamped to what the
      series holds
    - random first patch; the crop is a contiguous whole-patch slice
    """
    if min_time_patches > max_patches:
        raise ValueError("min_time_patches must be <= max_patches")
    div = nvar if will_flatten else 1
    off = int(rng.integers(0, time % patch_size + 1)) if offset else 0
    total_patches = (time - off) // patch_size
    mx = min(max_patches // div, total_patches)
    if mx < min_time_patches:
        raise ValueError(
            f"max_patches={mx} < min_time_patches={min_time_patches} "
            f"(time={time}, patch_size={patch_size}, nvar={nvar})"
        )
    if num_patches_sampler is None:
        num = int(rng.integers(min_time_patches, mx + 1))
    else:
        # sampler draws in [1, n] (reference common/sampler.py:25-55)
        num = min_time_patches + int(num_patches_sampler(mx - min_time_patches + 1, rng)) - 1
    first = int(rng.integers(0, total_patches - num + 1))
    start = off + first * patch_size
    return start, start + num * patch_size
