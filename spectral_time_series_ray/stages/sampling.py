"""Series sampling + weighted union — the reference's dataset-level
sampling surface.

- :func:`sample_series` — NONE / UNIFORM / PROPORTIONAL series
  sampling (reference SampleTimeSeriesType,
  `uni2ts/src/uni2ts/data/dataset.py:36-91`): PROPORTIONAL weights a
  series by its length (`hf_dataset_indexer.py:119-139` length
  probabilities). Implemented as a small grouped count -> seeded
  driver-side choice -> broadcast semi-join (no full shuffle).
- :func:`weighted_union` — ``dataset_weight`` replication
  (dataset.py:100-110: logical length = num_series x weight) as
  ``ds.union`` of repeated datasets (integer weights).
"""

from __future__ import annotations

import numpy as np

from .join import semi_join_keys


def sample_series(ds, key: str, n: int, mode: str = "uniform", seed: int = 42):
    """Keep all rows of ``n`` sampled series."""
    counts = ds.groupby(key).count().to_pandas()
    keys = counts[key].to_numpy()
    if n >= len(keys) or mode == "none":
        return ds
    rng = np.random.default_rng(seed)
    if mode == "uniform":
        chosen = rng.choice(keys, size=n, replace=False)
    elif mode == "proportional":
        w = counts["count()"].to_numpy(dtype=np.float64)
        chosen = rng.choice(keys, size=n, replace=False, p=w / w.sum())
    else:
        raise ValueError(f"unknown sampling mode: {mode!r}")
    return semi_join_keys(ds, set(chosen.tolist()), key)


def weighted_union(datasets_with_weights):
    """UNION ALL with integer replication weights (ConcatDatasetBuilder
    + dataset_weight semantics)."""
    parts = []
    for ds, weight in datasets_with_weights:
        for _ in range(int(weight)):
            parts.append(ds)
    if not parts:
        raise ValueError("empty union")
    first, rest = parts[0], parts[1:]
    return first.union(*rest) if rest else first
