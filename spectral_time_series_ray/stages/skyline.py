"""Skyline (Pareto-front) aggregate per group.

The preference query of Börzsönyi et al., "The Skyline Operator"
(ICDE 2001): the rows of a group not DOMINATED by any other row,
maximizing two numeric dimensions — row a dominates b iff
``a.x >= b.x and a.y >= b.y`` with strict inequality in at least one.
Identical (x, y) pairs never dominate each other, so exact duplicates
are all kept (matching the SQL ``NOT EXISTS`` formulation with no
self-exclusion).

This is an ALGEBRAIC aggregate: ``front(A | B) == front(front(A) |
front(B))`` (a dominated row stays dominated when more rows arrive,
and a row dominated in the union is dominated by some survivor of its
own half's front). So it distributes like any mergeable rollup:

1. every batch computes the front of each group it holds (vectorized
   sort + segment-max pass, no row loop) and tags survivors with
   ``hash(group) % P``;
2. ONE exchange co-locates each group's partial fronts; the identical
   kernel per partition yields the exact global front.

The shuffle carries only partial-front rows — for independently
distributed dimensions the expected front of n rows is O(log n), so
the exchange is metadata-sized regardless of input scale (a fully
correlated worst case degrades to the input size; the kernel stays
correct, only the exchange grows).

The reference has no preference queries; this extends the §2.5
algebraic-aggregate family (linear_trend, merge_rollups) with a
non-linear mergeable aggregate.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from .rollup import partitions_for_input


def pareto_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the maximizing Pareto front of (x, y).

    Vectorized: sort by (x desc, y desc); within each strict-x segment
    only rows equal to the segment's max y survive, and the segment's
    candidates must strictly exceed the running max y of all
    strictly-greater-x segments (>= there means a dominator exists).
    """
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-y, -x))
    xs, ys = x[order], y[order]
    new_x = np.r_[True, xs[1:] < xs[:-1]]
    seg = np.cumsum(new_x) - 1
    seg_max = np.maximum.reduceat(ys, np.flatnonzero(new_x))
    prev_max = np.concatenate([[-np.inf], np.maximum.accumulate(seg_max)[:-1]])
    keep_sorted = (ys == seg_max[seg]) & (ys > prev_max[seg])
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def _front_of_frame(df: pd.DataFrame, group_col: str, x_col: str,
                    y_col: str) -> pd.DataFrame:
    x = df[x_col].to_numpy(dtype=np.float64)
    # y as int64 epoch for datetimes, float otherwise — comparisons only
    ycol = df[y_col]
    if str(ycol.dtype).startswith("datetime64"):
        y = ycol.to_numpy().astype("datetime64[us]").astype(np.int64).astype(np.float64)
    else:
        y = ycol.to_numpy(dtype=np.float64)
    codes, _ = pd.factorize(df[group_col], sort=False)
    keep = np.zeros(len(df), dtype=bool)
    for g in range(codes.max() + 1 if len(codes) else 0):
        m = codes == g
        keep[m] = pareto_mask(x[m], y[m])
    return df[keep]


def pareto_front(
    ds,
    group_col: str,
    x_col: str,
    y_col: str,
    keep_cols: Sequence[str] | None = None,
    num_partitions: int | None = None,
):
    """Per-``group_col`` skyline of ``ds`` maximizing (x_col, y_col).
    Returns the surviving rows (``keep_cols`` or all input columns).
    ``y_col`` may be numeric or a timestamp."""
    P = num_partitions or partitions_for_input(None)
    cols = list(keep_cols) if keep_cols is not None else None

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if cols is not None:
            df = df[cols]
        out = _front_of_frame(df, group_col, x_col, y_col).copy()
        out["_part"] = (
            pd.util.hash_pandas_object(out[group_col], index=False).to_numpy()
            % np.uint64(P)
        ).astype(np.int32)
        return out

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=None)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return _front_of_frame(
            g.drop(columns=["_part"]), group_col, x_col, y_col
        )

    return partials.groupby("_part").map_groups(merge, batch_format="pandas")
