"""Per-series normalization — the reference's packed scalers.

Semantics from `uni2ts/src/uni2ts/module/packed_scaler.py:78-122`
(PackedStdScaler): per-group mean (loc) and sample variance
(correction=1) over observed values, scale = sqrt(var) clamped to a
minimum of 1e-5; `PackedAbsMeanScaler` (:125-155): loc=0,
scale = mean(|x|).

Two-pass shape (SURVEY.md §2.4 train-stats row): a small grouped
aggregate produces (key, loc, scale); it is broadcast back into a
vectorized ``map_batches`` that standardizes every row — the
aggregate is never recomputed per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MIN_SCALE = 1e-5


def fit_std_scaler(ds, key: str, value_col: str) -> pd.DataFrame:
    """(key, loc, scale) per group; sample variance (ddof=1), scale
    clamped at 1e-5. Groups with <2 observed values get scale=MIN_SCALE."""

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        loc = float(v.mean()) if len(v) else 0.0
        var = float(v.var(ddof=1)) if len(v) > 1 else 0.0
        return pd.DataFrame(
            {key: [df[key].iloc[0]], "loc": [loc],
             "scale": [max(np.sqrt(var), MIN_SCALE)]}
        )

    return ds.groupby(key).map_groups(stats, batch_format="pandas").to_pandas()


def fit_abs_mean_scaler(ds, key: str, value_col: str) -> pd.DataFrame:
    """loc=0, scale = mean(|x|) (clamped) — PackedAbsMeanScaler."""

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        scale = float(np.abs(v).mean()) if len(v) else 0.0
        return pd.DataFrame(
            {key: [df[key].iloc[0]], "loc": [0.0], "scale": [max(scale, MIN_SCALE)]}
        )

    return ds.groupby(key).map_groups(stats, batch_format="pandas").to_pandas()


class _ApplyScaler:
    """Actor: the (key -> loc, scale) table is fetched from the object
    store once per actor, merged per batch."""

    def __init__(self, scaler_ref, key: str, value_col: str, out_col: str):
        import ray

        self.scaler = ray.get(scaler_ref)
        self.key = key
        self.value_col = value_col
        self.out_col = out_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        merged = batch.merge(self.scaler, on=self.key, how="left")
        loc = merged["loc"].to_numpy(dtype=np.float64)
        scale = merged["scale"].to_numpy(dtype=np.float64)
        v = batch[self.value_col].to_numpy(dtype=np.float64)
        batch = batch.copy()
        batch[self.out_col] = (v - np.nan_to_num(loc)) / np.where(
            np.isnan(scale) | (scale == 0), 1.0, scale
        )
        return batch


def apply_scaler(ds, scaler: pd.DataFrame, key: str, value_col: str, out_col: str | None = None, concurrency: int = 2):
    import ray

    ref = ray.put(scaler)
    return ds.map_batches(
        _ApplyScaler,
        fn_constructor_args=(ref, key, value_col, out_col or f"{value_col}_std"),
        batch_format="pandas",
        batch_size=None,
        concurrency=concurrency,
    )
