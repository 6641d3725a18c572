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


def read_lsf_wide_csv(
    path: str,
    mode: str = "S",
    split: str = "test",
    ts_col: str | None = None,
    split_lengths: tuple[int, int, int] | None = None,
    split_fracs: tuple[float, float, float] = (0.7, 0.1, 0.2),
    std_ddof: int = 1,
):
    """LSF-style multi-mode reader (reference `LSFDataset`,
    `uni2ts/src/uni2ts/eval_util/_lsf_dataset.py:9-218`): a wide CSV
    (date column + one column per variate) with

    - a train/val/test prefix split (fixed ``split_lengths`` like the
      ETT loaders, or ``split_fracs`` of the row count like solar);
    - TRAIN-statistics standardization: per-column mean/std computed
      over the TRAIN prefix only, applied to every row (the
      reference's ``scale``, _lsf_dataset.py:71-76; ``std_ddof=1``
      matches pandas ``.std()`` used by the CSV loaders);
    - mode ``S``  -> one row per variate ``(item_id, start, target)``;
      mode ``M``  -> ONE row, ``target`` = [var, time] nested list;
      mode ``MS`` -> one row per variate with the other variates as
      ``past_feat_dynamic_real`` [var-1, time].

    Ray shape: the scan, the split-boundary order statistic (sort +
    limit), the train-stat moments (per-batch partials) and the
    standardization all stream; only the PACKED series rows — whose
    size IS the output row size, exactly as the reference's iterator
    yields whole arrays — are grouped per variate (`groupby.map_groups`)
    and, for M/MS, combined on the driver (V small rows).
    """
    import ray.data

    if mode not in ("S", "M", "MS"):
        raise ValueError(f"unknown mode: {mode!r}")
    if split not in ("train", "val", "test"):
        raise ValueError(f"unknown split: {split!r}")
    ds = ray.data.read_csv(path)
    cols = list(ds.schema().names)
    ts_col = ts_col or cols[0]
    var_cols = [c for c in cols if c != ts_col]

    n = ds.count()
    if split_lengths is not None:
        train_len, val_len, test_len = split_lengths
    else:
        train_len = int(n * split_fracs[0])
        val_len = int(n * split_fracs[1])
        test_len = n - train_len - val_len
    end_len = {
        "train": train_len,
        "val": train_len + val_len,
        "test": train_len + val_len + test_len,
    }[split]

    def _ts(batch: pa.Table) -> pa.Table:
        t = pd.to_datetime(batch.to_pandas()[ts_col]).astype("datetime64[us]")
        return pa.table({ts_col: pa.array(t)})

    dates = ds.map_batches(_ts, batch_format="pyarrow", batch_size=None)
    # k-th order statistics of the date axis: sort + limit streams only
    # the prefix; two tiny aggregates give both boundaries
    train_bound = dates.sort(ts_col).limit(train_len).max(ts_col)
    end_bound = dates.sort(ts_col).limit(end_len).max(ts_col)

    def moments(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        t = pd.to_datetime(df[ts_col]).astype("datetime64[us]")
        sub = df.loc[(t <= train_bound).to_numpy(), var_cols]
        m = sub.to_numpy(dtype=np.float64)
        return pa.table(
            {
                "cnt": pa.array([len(m)], pa.int64()),
                "s1": pa.array([m.sum(axis=0).tobytes() if len(m) else b""]),
                "s2": pa.array([(m**2).sum(axis=0).tobytes() if len(m) else b""]),
            }
        )

    parts = ds.map_batches(moments, batch_format="pyarrow", batch_size=None).to_pandas()
    v = len(var_cols)
    cnt = int(parts["cnt"].sum())
    s1 = np.zeros(v)
    s2 = np.zeros(v)
    for _, r in parts.iterrows():
        if r["s1"]:
            s1 += np.frombuffer(r["s1"], dtype=np.float64)
            s2 += np.frombuffer(r["s2"], dtype=np.float64)
    mean = s1 / max(1, cnt)
    denom = max(1, cnt - std_ddof)
    std = np.sqrt(np.maximum(0.0, (s2 - cnt * mean**2) / denom))
    std[std == 0] = 1.0

    def scale_melt(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        t = pd.to_datetime(df[ts_col]).astype("datetime64[us]")
        keep = (t <= end_bound).to_numpy()
        df, t = df.loc[keep], t[keep]
        mat = (df[var_cols].to_numpy(dtype=np.float64) - mean) / std
        nb = len(df)
        return pa.table(
            {
                "item_id": pa.array(np.repeat(var_cols, nb), pa.string()),
                "ts": pa.array(np.tile(t.to_numpy(), v)),
                "target": pa.array(mat.T.reshape(-1)),
            }
        )

    long = ds.map_batches(scale_melt, batch_format="pyarrow", batch_size=None)

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        return pd.DataFrame(
            {
                "item_id": [g["item_id"].iloc[0]],
                "start": [g["ts"].iloc[0]],
                "length": [len(g)],
                "target": [g["target"].to_numpy(dtype=np.float64)],
            }
        )

    packed = long.groupby("item_id").map_groups(pack, batch_format="pandas")
    if mode == "S":
        return packed
    # M / MS carry the [var, time] matrix per output row, exactly like
    # the reference iterator — V whole-series rows meet on the driver
    dfp = packed.to_pandas().set_index("item_id").loc[var_cols]
    mat = np.stack(dfp["target"].to_numpy())  # [V, T] in column order
    start = dfp["start"].iloc[0]
    if mode == "M":
        out = pd.DataFrame(
            {"item_id": ["M"], "start": [start], "length": [mat.shape[1]],
             "target": [mat.tolist()]}
        )
        return ray.data.from_pandas(out)
    rows = []
    for i, c in enumerate(var_cols):
        rows.append(
            {
                "item_id": c,
                "start": start,
                "length": mat.shape[1],
                "target": mat[i],
                "past_feat_dynamic_real": np.concatenate(
                    [mat[:i], mat[i + 1 :]], axis=0
                ).tolist(),
            }
        )
    return ray.data.from_pandas(pd.DataFrame(rows))


def infer_freq_seconds(ts: np.ndarray) -> float:
    """Median grid step in seconds over a sorted timestamp array."""
    ts = np.sort(np.asarray(ts, dtype="datetime64[us]").view("int64"))
    if len(ts) < 2:
        return float("nan")
    return float(np.median(np.diff(ts)) / 1e6)
