"""Zone maps (min/max file skipping) from parquet footers.

The Iceberg/Delta/ClickHouse file-skipping pattern: a sorted (or
naturally clustered) layout means every file covers a narrow key
range; the parquet FOOTER already records per-row-group min/max
statistics, so an index over those answers "which files can contain
keys in [lo, hi)?" without reading any data pages. A range query on
100 TB then touches only the overlapping files — the footer scan is
O(#files), the data read is O(result).

``build_zonemap`` reads ONLY footers (cheap, parallelizable);
``prune_files`` intersects a range with the index; callers feed the
surviving file list to ``ray.data.read_parquet`` with the same
predicate for row-level filtering inside the files.
"""

from __future__ import annotations

import glob as _glob

import pandas as pd
import pyarrow.parquet as pq


def build_zonemap(path_glob: str, column: str) -> pd.DataFrame:
    """Per-file (min, max, n_rows) for ``column`` from parquet footer
    statistics — no data pages are read. Files without stats get
    (None, None) and are never pruned (safe fallback)."""
    rows = []
    for path in sorted(_glob.glob(path_glob)):
        md = pq.ParquetFile(path).metadata
        try:
            idx = md.schema.names.index(column)
        except ValueError:
            raise KeyError(f"column {column!r} not in {path}") from None
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        rows.append({"path": path, "min": lo, "max": hi,
                     "n_rows": md.num_rows})
    return pd.DataFrame(rows)


def prune_files(zonemap: pd.DataFrame, lo, hi) -> list[str]:
    """Files that may contain values in the half-open range
    ``[lo, hi)``: keep file iff ``file.min < hi AND file.max >= lo``
    (files lacking stats are always kept)."""
    keep = []
    for r in zonemap.itertuples():
        if pd.isna(r.min) or pd.isna(r.max):
            keep.append(r.path)
        elif r.min < hi and r.max >= lo:
            keep.append(r.path)
    return keep
