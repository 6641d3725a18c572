"""CSV series readers — the reference's SimpleDatasetBuilder family.

- :func:`read_long_csv` — long format ``(item_id, timestamp, target)``
  (reference `_from_long_dataframe`, simple.py:40-87); our engine is
  long-native so this is a typed read + rename.
- :func:`read_wide_csv` — wide format (timestamp index, one column per
  series) melted to long (reference `_from_wide_dataframe`,
  simple.py:90-137).
- :func:`infer_freq_seconds` — grid-step inference standing in for
  ``pd.infer_freq`` (simple.py:50-58): median inter-timestamp delta.

Output schema is the engine-long schema ``(item_id: string,
ts: timestamp[us], target: float64)`` ready for the rollup/series
stages (with key=item_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def read_long_csv(path: str, item_col: str = "item_id", ts_col: str = "timestamp", target_col: str = "target"):
    import ray.data

    ds = ray.data.read_csv(path)

    def norm(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = pd.DataFrame(
            {
                "item_id": df[item_col].astype(str),
                "ts": pd.to_datetime(df[ts_col]).astype("datetime64[us]"),
                "target": df[target_col].astype(np.float64),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(norm, batch_format="pyarrow", batch_size=None)


def read_wide_csv(path: str, ts_col: str = "timestamp"):
    """Wide -> long melt: each non-timestamp column becomes one series."""
    import ray.data

    ds = ray.data.read_csv(path)

    def melt(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        long = df.melt(id_vars=[ts_col], var_name="item_id", value_name="target")
        out = pd.DataFrame(
            {
                "item_id": long["item_id"].astype(str),
                "ts": pd.to_datetime(long[ts_col]).astype("datetime64[us]"),
                "target": long["target"].astype(np.float64),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(melt, batch_format="pyarrow", batch_size=None)


def read_wide_csv_multivariate(path: str, ts_col: str = "timestamp", item_id: str = "mv0"):
    """Wide -> ONE multivariate series: per row, the non-timestamp
    columns become a ``list<float>`` target (reference
    ``_from_wide_dataframe_multivariate``, simple.py:140-182: all
    columns stacked into a single [var, time] series). Output schema
    ``(item_id, ts, target: list<double>, n_var)`` — feeds the
    multivariate precondition/stats stages (variate order = column
    order, as in the reference)."""
    import ray.data

    ds = ray.data.read_csv(path)

    def stack(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        var_cols = [c for c in df.columns if c != ts_col]
        mat = df[var_cols].to_numpy(dtype=np.float64)
        out = pd.DataFrame(
            {
                "item_id": item_id,
                "ts": pd.to_datetime(df[ts_col]).astype("datetime64[us]"),
                "target": list(mat),
                "n_var": len(var_cols),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(stack, batch_format="pyarrow", batch_size=None)


def infer_freq_seconds(ts: np.ndarray) -> float:
    """Median grid step in seconds over a sorted timestamp array."""
    ts = np.sort(np.asarray(ts, dtype="datetime64[us]").view("int64"))
    if len(ts) < 2:
        return float("nan")
    return float(np.median(np.diff(ts)) / 1e6)
