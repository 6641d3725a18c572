"""Rolling evaluation windows + naive-forecast evaluation per series.

Window semantics from the reference:
- window count: ``windows = (len - ctx - pred) // stride + 1``
  (`uni2ts/src/uni2ts/data/builder/simple.py:438,467-471`)
- window w covers ``[fcst_start - ctx, fcst_start + pred)`` with
  ``fcst_start = offset + w * stride`` (EvalCrop,
  `uni2ts/src/uni2ts/transform/crop.py:134-147`)
- enumeration = cross product series x window (EvalDataset,
  `uni2ts/src/uni2ts/data/dataset.py:185-211`)

The evaluation stage mirrors the reference's windowed-eval lifecycle
(SURVEY.md §3.2) with a seasonal-naive "model": forecast the next
``pred`` buckets with the value ``season`` buckets earlier, score each
window with the metric kernels, and aggregate per series — the
incremental-evaluator aggregation shape (`evaluation.py:131-173`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions import metrics as M
from .rollup import BUCKET_COL


def window_count(length: int, ctx: int, pred: int, stride: int) -> int:
    return max(0, (length - ctx - pred) // stride + 1)


def enumerate_windows(
    series_ds,
    ctx: int,
    pred: int,
    stride: int,
    key: str = "conv_id",
    value_col: str = "mean_latency",
):
    """One row per (key, window): context + horizon arrays.

    Input: dense per-series rows (key, bucket_ts, value) — e.g. the
    gap-filled grid. Output rows carry list columns sized ctx / pred.
    """

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(BUCKET_COL)
        v = df[value_col].to_numpy(dtype=np.float64)
        n_win = window_count(len(v), ctx, pred, stride)
        rows = []
        for w in range(n_win):
            fcst_start = ctx + w * stride
            rows.append(
                {
                    key: df[key].iloc[0],
                    "window": w,
                    "fcst_start_ts": df[BUCKET_COL].iloc[fcst_start],
                    "context": v[fcst_start - ctx : fcst_start],
                    "horizon": v[fcst_start : fcst_start + pred],
                }
            )
        if not rows:
            return pd.DataFrame(
                {key: pd.Series([], dtype=object), "window": pd.Series([], dtype=np.int64),
                 "fcst_start_ts": pd.Series([], dtype="datetime64[us]"),
                 "context": pd.Series([], dtype=object), "horizon": pd.Series([], dtype=object)}
            )
        return pd.DataFrame(rows)

    return series_ds.groupby(key).map_groups(fn, batch_format="pandas")


class NaiveForecastScorer:
    """Actor-pool eval stage: seasonal-naive forecast per window +
    per-window metrics (the stateful scorer slot of SURVEY.md §2.4 —
    a real model would load weights in __init__)."""

    def __init__(self, season: int = 1, quantile: float = 0.5):
        self.season = season
        self.q = quantile

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # column-wise numpy access + zip, not iterrows(): rows hold
        # ragged arrays so the per-window kernels stay per-row, but the
        # pandas row-Series construction (the former hot cost) is gone
        key_col = "conv_id" if "conv_id" in batch.columns else batch.columns[0]
        rows = []
        for cid, win, ctx, hor in zip(
            batch[key_col].to_numpy(), batch["window"].to_numpy(),
            batch["context"].to_numpy(), batch["horizon"].to_numpy(),
        ):
            ctx = np.asarray(ctx, dtype=np.float64)
            hor = np.asarray(hor, dtype=np.float64)
            season = min(self.season, len(ctx))
            reps = int(np.ceil(len(hor) / season))
            fcst = np.tile(ctx[-season:], reps)[: len(hor)]
            # naive 95% interval from the in-sample seasonal error
            # (deterministic; a real model would emit quantile heads)
            sigma = M.seasonal_error(ctx, season)
            sigma = 0.0 if not sigma or np.isnan(sigma) else sigma
            lower, upper = fcst - 1.96 * sigma, fcst + 1.96 * sigma
            rows.append(
                {
                    "conv_id": cid,
                    "window": win,
                    "mse": M.mse(hor, fcst),
                    "mae": M.mae(hor, fcst),
                    "smape": M.smape(hor, fcst),
                    "mase": M.mase(hor, fcst, ctx, season),
                    "q_loss": M.quantile_loss(hor, fcst, self.q),
                    "wql": M.weighted_quantile_loss(hor, fcst, self.q),
                    "msis": M.msis(hor, lower, upper, ctx, season=season),
                }
            )
        return pd.DataFrame(rows)


class HybridReversalScorer:
    """Actor-pool eval stage for the hybrid-reversal pipeline
    (reference `uni2ts/cli/eval_precond_hybrid.py:63-170`): a
    seasonal-naive 'model' predicts in PRECONDITIONED space, and the
    predictions are mapped back to original space two ways —

    - GT context: reversal against the ground-truth sequence. The
      reference's consistency oracle (CLAUDE.md 'AFTER FIX') requires
      original-space errors to equal precond-space errors EXACTLY.
    - median-of-base-samples: reversal against the input window
      concatenated with the median of S base-model sample paths (the
      hybrid flavor; approximate by design).

    Coefficients are computed once per actor; the base-sample rng is
    seeded per (conv, window) so results are scheduling-independent.
    """

    def __init__(self, polynomial: str = "chebyshev", degree: int = 4,
                 season: int = 8, n_base_samples: int = 5, seed: int = 42):
        from ..functions.precondition import precondition_coefficients

        self.coeffs = np.asarray(precondition_coefficients(polynomial, degree))
        self.season = season
        self.n_base = n_base_samples
        self.seed = seed

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.hashing import fnv1a_u64
        from ..functions.precondition import (
            forward_precondition,
            reverse_with_base_context,
        )

        # column-wise numpy access + zip (same shape as
        # NaiveForecastScorer above): rows hold ragged arrays so the
        # sequential-reversal kernels stay per-row, but no per-row
        # pandas Series is ever built
        rows = []
        for cid, win, ctx, hor in zip(
            batch["conv_id"].to_numpy(), batch["window"].to_numpy(),
            batch["context"].to_numpy(), batch["horizon"].to_numpy(),
        ):
            ctx = np.asarray(ctx, dtype=np.float64)
            hor = np.asarray(hor, dtype=np.float64)
            L, H = len(ctx), len(hor)
            full = np.concatenate([ctx, hor])
            pre_full = forward_precondition(full, self.coeffs)
            pre_ctx, pre_hor = pre_full[:L], pre_full[L:]
            season = min(self.season, L)
            reps = int(np.ceil(H / season))
            fcst_pre = np.tile(pre_ctx[-season:], reps)[:H]
            mse_precond = M.mse(pre_hor, fcst_pre)
            # GT-context reversal: must reproduce precond-space errors
            rev_gt = reverse_with_base_context(fcst_pre, full, L, self.coeffs)
            mse_gt = M.mse(hor, rev_gt)
            # hybrid: median of S jittered base sample paths as context
            rng = np.random.default_rng(
                [self.seed, int(fnv1a_u64([str(cid)])[0]) & 0x7FFFFFFF,
                 int(win)]
            )
            base_naive = np.tile(ctx[-season:], reps)[:H]
            scale = max(1e-9, float(np.nanstd(ctx)))
            samples = base_naive[None, :] + 0.1 * scale * rng.standard_normal((self.n_base, H))
            base_med = np.median(samples, axis=0)
            rev_hy = reverse_with_base_context(
                fcst_pre, np.concatenate([ctx, base_med]), L, self.coeffs
            )
            rows.append(
                {
                    "conv_id": cid,
                    "window": win,
                    "mse_precond": mse_precond,
                    "mse_gt_reversed": mse_gt,
                    "mse_hybrid": M.mse(hor, rev_hy),
                }
            )
        return pd.DataFrame(rows)


def hybrid_reversal_eval(
    window_ds, season: int = 8, degree: int = 4, concurrency: int = 2
):
    """Per-series hybrid-reversal evaluation with the reference's
    consistency invariant as an ``ok`` column: GT-context reversal must
    reproduce preconditioned-space metrics exactly."""
    scored = window_ds.map_batches(
        HybridReversalScorer,
        fn_constructor_kwargs={"season": season, "degree": degree},
        batch_format="pandas",
        batch_size=256,
        concurrency=concurrency,
    )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        mp = df["mse_precond"].to_numpy(dtype=np.float64)
        mg = df["mse_gt_reversed"].to_numpy(dtype=np.float64)
        denom = np.maximum(np.abs(mp), 1.0)
        max_rel = float(np.nanmax(np.abs(mp - mg) / denom)) if len(df) else 0.0
        return pd.DataFrame(
            {
                "conv_id": [df["conv_id"].iloc[0]],
                "n_windows": [len(df)],
                "mse_precond": [float(np.nanmean(mp))],
                "mse_gt_reversed": [float(np.nanmean(mg))],
                "mse_hybrid": [float(np.nanmean(df["mse_hybrid"]))],
                "max_rel_diff": [max_rel],
                "ok": [max_rel < 1e-9],
            }
        )

    return scored.groupby("conv_id").map_groups(agg, batch_format="pandas")


def evaluate_windows(window_ds, season: int = 1, concurrency: int = 2, backoff: bool = False):
    """Score every window, then aggregate per series (masked-mean
    reduce over windows, `loss/packed/_base.py:76-106` shape).
    ``backoff=True`` wraps the scorer in the halving-retry dead-letter
    policy (stages/backoff.py — the reference's eval.py:39-76 OOM
    loop) so one pathological window degrades, not dies."""
    if backoff:
        from .backoff import backoff_map_batches

        scored = backoff_map_batches(
            window_ds, NaiveForecastScorer,
            fn_constructor_kwargs={"season": season},
            batch_size=256, concurrency=concurrency,
        )
    else:
        scored = window_ds.map_batches(
            NaiveForecastScorer,
            fn_constructor_kwargs={"season": season},
            batch_format="pandas",
            batch_size=256,
            concurrency=concurrency,
        )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        out = {"conv_id": [df["conv_id"].iloc[0]], "n_windows": [len(df)]}
        for m in ("mse", "mae", "smape", "mase", "q_loss", "wql", "msis"):
            out[m] = [float(np.nanmean(df[m].to_numpy(dtype=np.float64)))]
        return pd.DataFrame(out)

    return scored.groupby("conv_id").map_groups(agg, batch_format="pandas")
