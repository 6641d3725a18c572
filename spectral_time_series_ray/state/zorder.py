"""Z-order (Morton) multi-column clustering for 2-D file skipping.

The Delta `OPTIMIZE ZORDER BY` / Iceberg sort-order pattern: a layout
sorted on ONE column prunes range queries on that column only; a
rectangle predicate over TWO columns (e.g. ``user_id`` x ``ts``) still
scans every file on the second dimension. Interleaving the bits of
both dimensions' bucket ranks into one Morton key and range-sorting on
it gives every file a small bounding BOX in (dim1, dim2) space, so
per-file min/max zone maps on BOTH raw columns prune 2-D rectangles.

Scale path: bucket edges come from one distributed min/max pass (the
``Dataset.min``/``max`` aggregates); the Morton key is a vectorized
per-batch transform; the layout write is ONE range sort (Ray's
sample-based range partitioning — the same exchange a single-column
sorted export pays); zone maps read only parquet footers.
"""

from __future__ import annotations

import numpy as np

_B16 = np.uint64(0xFFFF)


def _spread16(x: np.ndarray) -> np.ndarray:
    """Spread each of the 16 low bits of x to even bit positions
    (0, 2, 4, ... 30) — the classic Morton bit-twiddle, vectorized."""
    v = x.astype(np.uint64) & _B16
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def morton_key(rank_a: np.ndarray, rank_b: np.ndarray) -> np.ndarray:
    """Interleave two 16-bit bucket ranks into one 32-bit Morton key
    (a gets even bits, b odd). Returns int64 (sortable by Ray)."""
    return (_spread16(rank_a) | (_spread16(rank_b) << np.uint64(1))).astype(
        np.int64
    )


def bucket_rank(values: np.ndarray, edges: np.ndarray) -> np.ndarray:
    """Map values to EQUI-DEPTH bucket ranks via quantile ``edges``
    (monotone, so Morton interleaving preserves per-dim order). Equi-
    depth — not equi-width — keeps boxes balanced under skew: with
    equi-width edges a heavy-tailed column collapses into few buckets
    and the layout degenerates to single-dim sorting. Values outside
    the sampled range clamp to edge buckets (still CORRECT for
    pruning — zone maps are built on the RAW columns, not ranks)."""
    r = np.searchsorted(edges, np.asarray(values, dtype=np.float64), side="right")
    return np.clip(r, 0, len(edges)).astype(np.uint64)


def quantile_edges(ds, col: str, bits: int = 10, max_sample_rows: int = 50_000,
                   seed: int = 42) -> np.ndarray:
    """Bucket edges = 2^bits - 1 sample quantiles from a driver-side
    sample capped at an ABSOLUTE row count (the same bounded-init
    discipline as IVF/k-means — a corpus fraction would pull terabytes
    at 100 TB). Edge skew only affects balance, never correctness."""
    n = ds.count()
    keep = ds.select_columns([col])
    frac = min(1.0, max_sample_rows / max(1, n))
    if frac < 1.0:
        keep = keep.random_sample(frac, seed=seed)
    import pandas as pd

    s = keep.limit(max_sample_rows).to_pandas()[col].to_numpy(np.float64)
    qs = np.linspace(0, 1, (1 << bits) + 1)[1:-1]
    return np.unique(np.quantile(s, qs))


def write_zordered(
    ds,
    col_a: str,
    col_b: str,
    out_dir: str,
    num_files: int = 16,
    bits: int = 10,
    max_sample_rows: int = 50_000,
):
    """Range-sort ``ds`` by the Morton key of (col_a, col_b) equi-depth
    bucket ranks and write ``num_files`` parquet files. Both columns
    must be numeric (timestamps: pass int64 epoch)."""
    edges_a = quantile_edges(ds, col_a, bits, max_sample_rows)
    edges_b = quantile_edges(ds, col_b, bits, max_sample_rows)

    def add_key(batch):
        import pandas as pd

        df = batch if isinstance(batch, pd.DataFrame) else batch.to_pandas()
        ra = bucket_rank(df[col_a].to_numpy(np.float64), edges_a)
        rb = bucket_rank(df[col_b].to_numpy(np.float64), edges_b)
        df = df.copy()
        df["_z"] = morton_key(ra, rb)
        return df

    zds = ds.map_batches(add_key, batch_format="pandas", batch_size=None)
    zds = zds.sort("_z").repartition(num_files)
    zds = zds.drop_columns(["_z"])
    zds.write_parquet(out_dir)
    return {col_a: edges_a, col_b: edges_b}


def prune_box(zm_a, zm_b, a_lo, a_hi, b_lo, b_hi) -> list[str]:
    """Files that may contain rows in the rectangle
    ``[a_lo, a_hi) x [b_lo, b_hi)``: the intersection of both
    single-column zone-map prunes (a file survives only if its
    bounding box overlaps the rectangle on BOTH dims)."""
    from .zonemap import prune_files

    sa = set(prune_files(zm_a, a_lo, a_hi))
    sb = set(prune_files(zm_b, b_lo, b_hi))
    return sorted(sa & sb)
