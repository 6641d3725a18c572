"""Masked-prediction task construction + reshape kernels.

Numpy re-expressions of the reference's task/reshape transforms
(`uni2ts/src/uni2ts/transform/task.py:28-166`,
`uni2ts/src/uni2ts/transform/reshape.py:27-143`). These run inside
``map_batches`` over list-column rows — each row is one packed series
``[var, time]`` — so the per-series shapes stay small while the
Dataset streams.
"""

from __future__ import annotations

import numpy as np


def prediction_mask(var: int, time: int, mask_length: int) -> np.ndarray:
    """Trailing-step bool mask ``[var, time]`` with the last
    ``mask_length`` steps True (reference ``EvalMaskedPrediction.
    _generate_prediction_mask``, task.py:137-144)."""
    m = np.zeros((var, time), dtype=bool)
    if mask_length > 0:
        m[:, -mask_length:] = True
    return m


def sample_mask_length(
    time: int,
    min_mask_ratio: float,
    max_mask_ratio: float,
    rng: np.random.Generator | None = None,
) -> int:
    """Random mask length = ``max(1, round(time * U[min,max]))``
    (reference ``MaskedPrediction._generate_prediction_mask``,
    task.py:54-63)."""
    if min_mask_ratio > max_mask_ratio:
        raise ValueError("min_mask_ratio must be <= max_mask_ratio")
    rng = rng or np.random.default_rng()
    ratio = float(rng.uniform(min_mask_ratio, max_mask_ratio))
    return max(1, round(time * ratio))


def masked_prediction(
    target: np.ndarray,
    min_mask_ratio: float,
    max_mask_ratio: float,
    truncate: dict[str, np.ndarray] | None = None,
    rng: np.random.Generator | None = None,
) -> tuple[np.ndarray, dict[str, np.ndarray]]:
    """Generate a random trailing prediction mask for a 2-D
    ``[var, time]`` target and truncate auxiliary fields to the
    unmasked (context) steps (reference MaskedPrediction,
    task.py:28-85: aux features must not leak horizon values).

    Returns ``(mask [var,time], {field: arr[..., :time-mask_len]})``.
    """
    target = np.asarray(target)
    if target.ndim < 2:
        target = target[None, :]
    var, time = target.shape[:2]
    mask_len = sample_mask_length(time, min_mask_ratio, max_mask_ratio, rng)
    mask = prediction_mask(var, time, mask_len)
    keep = ~mask[0]
    truncated = {
        k: np.asarray(v)[:, keep] for k, v in (truncate or {}).items()
    }
    return mask, truncated


def extend_mask(
    mask: np.ndarray, aux_shapes: dict[str, tuple[int, int]]
) -> list[np.ndarray]:
    """Collect the target mask plus an all-False ``[var, time]`` mask
    per auxiliary field (reference ExtendMask, task.py:89-113: aux
    fields are never prediction targets)."""
    return [np.asarray(mask)] + [
        np.zeros(shape, dtype=bool) for shape in aux_shapes.values()
    ]


def sequencify(
    field: np.ndarray, target: np.ndarray, axis: int = 0, target_axis: int = 0
) -> np.ndarray:
    """Repeat a per-series field along ``axis`` by the target's length
    on ``target_axis`` (reference SequencifyField, reshape.py:27-37:
    ``field.repeat(target.shape[target_axis], axis=axis)``)."""
    return np.asarray(field).repeat(np.asarray(target).shape[target_axis], axis=axis)


def pack_fields(fields: list[np.ndarray], feat: bool = False) -> np.ndarray:
    """Concatenate ``[var_i, time(, feat)]`` arrays along the variate
    axis (reference PackFields' ``pack(fields, '* time')``,
    reshape.py:41-64) — einops.pack over the leading axis is a plain
    concatenate once every array is at least 2-D."""
    arrs = []
    for a in fields:
        a = np.asarray(a)
        want = 3 if feat else 2
        while a.ndim < want:
            a = a[None, ...]
        arrs.append(a)
    return np.concatenate(arrs, axis=0)


def flat_pack(fields: list[np.ndarray]) -> np.ndarray:
    """Flatten and concatenate (reference FlatPackFields /
    FlatPackCollection ``pack(fields, '*')``, reshape.py:68-123)."""
    return np.concatenate([np.asarray(a).reshape(-1) for a in fields])


def transpose(arr: np.ndarray, axes: tuple[int, ...] | None = None) -> np.ndarray:
    """Axis permutation (reference Transpose, reshape.py:127-143)."""
    return np.asarray(arr).transpose(axes)
