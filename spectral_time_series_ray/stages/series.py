"""Per-conversation series stages: grid densification, gap-fill,
polynomial preconditioning, patch chunking.

Order-dependent per-series ops run inside ``groupby(conv_id)
.map_groups`` with an explicit stable sort (Ray groupby does not
guarantee in-group order — SURVEY.md §7.4).  The numeric kernels are
the pure functions in ``functions/`` whose semantics match the
reference:
- gap-fill = LastValueImputation LOCF / CausalMean / linear
  (`uni2ts/src/uni2ts/transform/imputation.py:44-108`)
- preconditioning = PolynomialPrecondition forward + sequential
  ReversePrecondition (`uni2ts/src/uni2ts/transform/precondition.py`),
  applied per series so series boundaries are never crossed
  (precondition.py:176-185 invariant)
- chunking = Patchify reshape (`uni2ts/src/uni2ts/transform/patch.py:124-159`)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import TIER_SECONDS
from ..functions.imputation import IMPUTERS
from ..functions.precondition import (
    forward_precondition,
    precondition_coefficients,
    reverse_precondition,
)
from .rollup import BUCKET_COL


def _densify_group(
    tier: str,
    value_col: str,
    method: str,
    polynomial: str | None,
    degree: int,
    key: str,
):
    step_us = TIER_SECONDS[tier] * 1_000_000

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(BUCKET_COL)
        buckets = df[BUCKET_COL].astype("datetime64[us]").astype(np.int64).to_numpy()
        lo, hi = buckets[0], buckets[-1]
        grid = np.arange(lo, hi + step_us, step_us)
        values = np.full(len(grid), np.nan)
        pos = (buckets - lo) // step_us
        values[pos] = df[value_col].to_numpy(dtype=np.float64)
        observed = np.zeros(len(grid), dtype=bool)
        observed[pos] = True
        filled = IMPUTERS[method](values)
        out = {
            key: np.repeat(df[key].iloc[0], len(grid)),
            BUCKET_COL: grid.astype("datetime64[us]"),
            value_col: filled,
            "observed": observed,
        }
        if polynomial:
            coeffs = precondition_coefficients(polynomial, degree)
            out[f"{value_col}_precond"] = forward_precondition(filled, coeffs)
        return pd.DataFrame(out)

    return fn


def gap_fill_series(
    rolled_ds,
    tier: str,
    value_col: str = "mean_latency",
    method: str = "locf",
    polynomial: str | None = None,
    degree: int = 4,
    key: str = "conv_id",
):
    """Densify each conversation's rollup series onto the tier grid,
    gap-fill missing buckets, optionally precondition.

    Output: one row per (key, grid bucket) with the filled value, an
    ``observed`` flag, and (optionally) the preconditioned value.
    """
    ds = rolled_ds.select_columns([key, BUCKET_COL, value_col])
    return ds.groupby(key).map_groups(
        _densify_group(tier, value_col, method, polynomial, degree, key),
        batch_format="pandas",
    )


class SeriesPreconditioner:
    """Actor-pool stage: forward/reverse preconditioning over packed
    per-series rows (list-typed value column).

    Coefficients are computed ONCE per actor in ``__init__`` (reference
    pattern: coefficients cached in ``__post_init__``,
    precondition.py:58-80; actor-pool mapping SURVEY.md §2.4).
    Use with ``map_batches(cls, concurrency=N, batch_size=B)`` over
    chunked rows produced by :func:`pack_series`.
    """

    def __init__(self, polynomial: str = "chebyshev", degree: int = 4,
                 value_col: str = "values", mode: str = "forward"):
        self.coeffs = np.asarray(precondition_coefficients(polynomial, degree))
        self.value_col = value_col
        self.mode = mode

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        fn = forward_precondition if self.mode == "forward" else reverse_precondition
        batch = batch.copy()
        batch[self.value_col] = [
            fn(np.asarray(v, dtype=np.float64), self.coeffs)
            for v in batch[self.value_col]
        ]
        return batch


def pack_series(
    ds,
    value_col: str,
    ts_col: str = BUCKET_COL,
    order_col: str | None = None,
    key: str = "conv_id",
    chunk_points: int = 4096,
):
    """Pack long rows into per-conversation chunk rows
    ``(key, chunk_idx, n_points, ts:list<int64 us>, values:list<double>)``.

    Chunks are bounded at ``chunk_points`` so a degenerate conversation
    cannot blow up a worker; chunk state (compression, precondition)
    resets at conversation boundaries — the reference's sample_id-reset
    pattern (`learnable_precondition.py:71-83`).
    """
    sort_col = order_col or ts_col

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_col)
        ts = df[ts_col].astype("datetime64[us]").astype(np.int64).to_numpy()
        vals = df[value_col].to_numpy(dtype=np.float64)
        rows = []
        for ci, s in enumerate(range(0, len(df), chunk_points)):
            e = min(s + chunk_points, len(df))
            rows.append(
                {
                    key: df[key].iloc[0],
                    "chunk_idx": ci,
                    "n_points": e - s,
                    "ts": ts[s:e],
                    "values": vals[s:e],
                }
            )
        return pd.DataFrame(rows)

    return ds.groupby(key).map_groups(pack, batch_format="pandas")


def gap_fill_pack_series(
    rolled_ds,
    tier: str,
    value_col: str = "mean_latency",
    method: str = "locf",
    polynomial: str | None = None,
    degree: int = 4,
    key: str = "conv_id",
    chunk_points: int = 4096,
):
    """FUSED densify + gap-fill + (optional) precondition + chunk-pack
    in ONE ``groupby(key)`` pass — halves the shuffles of running
    :func:`gap_fill_series` then :func:`pack_series` (both key on the
    same column, so the exchange can be shared; SURVEY.md §7.3).

    Output: chunk rows ``(key, chunk_idx, n_points, ts, values[,
    values_precond])``.
    """
    step_us = TIER_SECONDS[tier] * 1_000_000
    coeffs = (
        np.asarray(precondition_coefficients(polynomial, degree)) if polynomial else None
    )
    from .rollup import partitions_for_input

    P = partitions_for_input(None)

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[key, BUCKET_COL, value_col]].copy()
        df["_part"] = (
            pd.util.hash_pandas_object(df[key], index=False).to_numpy() % P
        ).astype(np.int32)
        return df

    ds = rolled_ds.select_columns([key, BUCKET_COL, value_col])
    ds = ds.map_batches(add_part, batch_format="pandas", batch_size=None)

    # ONE int-keyed shuffle on P partitions (not one Ray group per
    # conversation — per-group map_groups overhead at 10k+ convs was
    # the stage's wall-time); inside a partition every conversation is
    # a contiguous numpy slice
    def _empty_out() -> pd.DataFrame:
        cols = {
            key: pd.Series([], dtype=object),
            "chunk_idx": pd.Series([], dtype=np.int64),
            "n_points": pd.Series([], dtype=np.int64),
            "ts": pd.Series([], dtype=object),
            "values": pd.Series([], dtype=object),
        }
        if coeffs is not None:
            cols["values_precond"] = pd.Series([], dtype=object)
        return pd.DataFrame(cols)

    def partition_fn(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return _empty_out()
        codes, uniques = pd.factorize(df[key], sort=False)
        b = df[BUCKET_COL].to_numpy(dtype="datetime64[us]").view("int64")
        v = df[value_col].to_numpy(dtype=np.float64)
        order = np.lexsort((b, codes))
        codes_s, b_s, v_s = codes[order], b[order], v[order]
        new_conv = np.empty(n, dtype=bool)
        new_conv[0] = True
        new_conv[1:] = codes_s[1:] != codes_s[:-1]
        starts = np.flatnonzero(new_conv)
        ends = np.append(starts[1:], n)
        rows = []
        keys_arr = np.asarray(uniques)
        for s, e in zip(starts, ends):
            buckets = b_s[s:e]
            lo, hi = buckets[0], buckets[-1]
            grid = np.arange(lo, hi + step_us, step_us)
            values = np.full(len(grid), np.nan)
            values[(buckets - lo) // step_us] = v_s[s:e]
            filled = IMPUTERS[method](values)
            pre = forward_precondition(filled, coeffs) if coeffs is not None else None
            kv = keys_arr[codes_s[s]]
            for ci, cs in enumerate(range(0, len(grid), chunk_points)):
                ce = min(cs + chunk_points, len(grid))
                row = {
                    key: kv,
                    "chunk_idx": ci,
                    "n_points": ce - cs,
                    "ts": grid[cs:ce],
                    "values": filled[cs:ce],
                }
                if pre is not None:
                    row["values_precond"] = pre[cs:ce]
                rows.append(row)
        return pd.DataFrame(rows)

    return ds.groupby("_part").map_groups(partition_fn, batch_format="pandas")


def multivariate_precondition_stats(
    rolled_ds,
    value_cols: tuple[str, ...],
    key: str = "conv_id",
    polynomial: str = "chebyshev",
    degree: int = 4,
    tol: float = 1e-8,
):
    """Multivariate end-to-end: per key, stack ``value_cols`` into a
    ``[variates, time]`` target (the reference's nested
    ``list<list<float>>`` layout, `data/builder/simple.py:173-182`),
    run the 2-D forward + reverse precondition kernels (per-variate
    independence, reference precondition.py:382-426), assert the
    roundtrip is exact to ``tol`` IN-STAGE (any kernel error raises and
    fails the query), and emit per-variate stats of the RAW values so
    the DuckDB oracle compares bit-stable numbers. Stats of the
    roundtripped floats would carry ~1e-10 reconstruction noise that
    can land a mean exactly on a 1e-6 rounding boundary (observed once
    in 900 values at sf0.01) — the tol assertion is the kernel check,
    the oracle hash is the pipeline check.

    Output: one row per (key, variate): n_buckets, sum_v, min_v, max_v
    (sum, not mean: a sum of 2-decimal inputs is >=5e-7 from every 1e-6
    half-boundary so round(…,6) is order-safe, while a mean can land
    exactly ON a boundary and flip under summation-order ulp drift).
    Raises if the roundtrip error exceeds ``tol``.
    """
    coeffs = np.asarray(precondition_coefficients(polynomial, degree))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(BUCKET_COL)
        mat = np.stack([df[c].to_numpy(dtype=np.float64) for c in value_cols])
        rec = reverse_precondition(forward_precondition(mat, coeffs), coeffs)
        err = float(np.nanmax(np.abs(rec - mat))) if mat.size else 0.0
        if err > tol:
            raise ValueError(f"multivariate precondition roundtrip err={err}")
        v = len(value_cols)
        return pd.DataFrame(
            {
                key: np.repeat(df[key].iloc[0], v),
                "variate": np.arange(v, dtype=np.int64),
                "n_buckets": np.full(v, mat.shape[1], dtype=np.int64),
                "sum_v": mat.sum(axis=1),
                "min_v": mat.min(axis=1),
                "max_v": mat.max(axis=1),
            }
        )

    ds = rolled_ds.select_columns([key, BUCKET_COL, *value_cols])
    return ds.groupby(key).map_groups(fn, batch_format="pandas")


def patched_precondition_stats(
    chunks_ds,
    patch_size: int = 8,
    polynomial: str = "chebyshev",
    degree: int = 4,
    tol: float = 1e-8,
    key: str = "conv_id",
):
    """Patch-axis precondition end-to-end over chunk rows: patchify each
    chunk's values to ``[time, patch]``, run the patched forward kernel
    (convolution along TIME with patch elements as channels — reference
    `patch_precondition.py:27-142`), and verify three invariants
    per chunk, all emitted as columns so the query self-checks:

    - ``xcheck_err``: the patched forward must equal the 1-D kernel
      applied per patch-channel (bit-exact — same op order);
    - ``roundtrip_err``: no-context patched reverse restores the
      original to ``tol`` (first n time-steps identity);
    - ``ctx_err``: GT-context patched reverse restores the tail
      exactly from the original head (reference
      `patch_precondition.py:205-280` context path).

    Output: one row per chunk with n_time_patches + the three errors +
    ``ok``. Runs as a stateless ``map_batches`` over chunk rows (each
    row's kernel is vectorized; rows per batch are few).
    """
    from ..functions.patch import patchify
    from ..functions.precondition import (
        forward_precondition,
        forward_precondition_patched,
        precondition_coefficients,
        reverse_precondition_patched,
    )

    coeffs = np.asarray(precondition_coefficients(polynomial, degree))
    n = len(coeffs)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key_val, chunk_idx, values in zip(
            df[key], df["chunk_idx"], df["values"]
        ):
            vals = np.asarray(values, dtype=np.float64)
            pat = patchify(vals, patch_size, pad_value=0.0)  # [T, P]
            fwd = forward_precondition_patched(pat, coeffs)
            ref = forward_precondition(pat.T.copy(), coeffs).T  # per-channel 1-D
            xcheck = float(np.max(np.abs(fwd - ref))) if pat.size else 0.0
            rec = reverse_precondition_patched(fwd, coeffs)
            rt = float(np.max(np.abs(rec - pat))) if pat.size else 0.0
            if pat.shape[0] > n:
                ctx_rec = reverse_precondition_patched(
                    fwd[n:], coeffs, context=pat[:n]
                )
                ctx = float(np.max(np.abs(ctx_rec - pat[n:])))
            else:
                ctx = 0.0
            rows.append(
                {
                    key: key_val,
                    "chunk_idx": int(chunk_idx),
                    "n_time_patches": int(pat.shape[0]),
                    "patch_size": patch_size,
                    "xcheck_err": xcheck,
                    "roundtrip_err": rt,
                    "ctx_err": ctx,
                    "ok": bool(xcheck == 0.0 and rt <= tol and ctx <= tol),
                }
            )
        cols = [key, "chunk_idx", "n_time_patches", "patch_size",
                "xcheck_err", "roundtrip_err", "ctx_err", "ok"]
        if not rows:
            return pd.DataFrame({c: pd.Series([], dtype=object) for c in cols})
        return pd.DataFrame(rows, columns=cols)

    return chunks_ds.map_batches(fn, batch_format="pandas", batch_size=None)


def unpack_series(ds, key: str = "conv_id"):
    """Explode chunk rows back to long (key, ts, value) rows."""
    import pyarrow as pa

    def unpack(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0:
            return pa.table({key: pa.array([], pa.string()),
                             "ts": pa.array([], pa.timestamp("us")),
                             "value": pa.array([], pa.float64())})
        # list_flatten is zero-copy on the child buffers; keys expand
        # with one np.repeat — no Python row loop. Ray may store list
        # columns as its tensor extension type; fall back to per-chunk
        # concatenate there (rows are chunk-level, so n is small).
        if pa.types.is_list(batch["ts"].type) or pa.types.is_large_list(batch["ts"].type):
            lens = pc.list_value_length(batch["ts"]).to_numpy(zero_copy_only=False)
            ts_flat = pc.list_flatten(batch["ts"]).to_numpy(zero_copy_only=False)
            vs_flat = pc.list_flatten(batch["values"]).to_numpy(zero_copy_only=False)
        else:
            ts_rows = [np.asarray(t, dtype=np.int64) for t in batch["ts"].to_pandas()]
            vs_rows = [np.asarray(v, dtype=np.float64) for v in batch["values"].to_pandas()]
            lens = np.fromiter((len(t) for t in ts_rows), dtype=np.int64, count=len(ts_rows))
            ts_flat = np.concatenate(ts_rows) if ts_rows else np.array([], np.int64)
            vs_flat = np.concatenate(vs_rows) if vs_rows else np.array([], np.float64)
        keys = np.repeat(batch[key].to_numpy(zero_copy_only=False), lens)
        return pa.table(
            {
                key: pa.array(keys, pa.string()),
                "ts": pa.array(np.asarray(ts_flat, dtype=np.int64).astype("datetime64[us]")),
                "value": pa.array(np.asarray(vs_flat, dtype=np.float64)),
            }
        )

    return ds.map_batches(unpack, batch_format="pyarrow", batch_size=None)
