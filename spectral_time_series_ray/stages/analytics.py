"""Time-series / distribution analytics stages.

Robust outlier detection (median + MAD), first-seen cumulative
counts, histogram-based exact distributed quantiles with threshold
filtering, day-of-week seasonality profiles, and fixed-width value
histograms.  All are expressed as partial-aggregate ``map_batches``
stages followed by a small ``groupby`` so only fixed-width partials
shuffle — the raw rows never move except where a per-key exact median
is requested (bounded groups, same contract as the exact rollup
quantiles in ``rollup.py``).

Reference parity: the reference computes per-series robust statistics
inside its imputation / scaling transforms
(`uni2ts/src/uni2ts/transform/imputation.py`,
`.../scaler.py`); these stages lift the same median/MAD kernels to
distributed, whole-table operators with DuckDB-matched semantics
(``quantile_cont`` linear interpolation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


# ------------------------------------------------------------------ MAD


def _quantile_linear(v: np.ndarray, q: float) -> float:
    """np.quantile linear interpolation == DuckDB quantile_cont."""
    return float(np.quantile(v, q))


def _segmented_median(v_sorted: np.ndarray, starts: np.ndarray, seg_len: np.ndarray) -> np.ndarray:
    """Vectorized per-segment median over segment-sorted values:
    linear interpolation at (n-1)/2 — identical to np.quantile(.., .5)
    / DuckDB quantile_cont, with no Python loop over segments."""
    pos = (seg_len - 1) / 2.0
    lo = starts + np.floor(pos).astype(np.int64)
    hi = starts + np.ceil(pos).astype(np.int64)
    return 0.5 * (v_sorted[lo] + v_sorted[hi])


def mad_outliers(ds, key: str, value_col: str, k: float = 3.0, num_partitions: int | None = None):
    """Per-key robust outlier counts: median, MAD (median absolute
    deviation) and the number of values with |v - med| > k * MAD.

    Exact, one int-keyed hash shuffle + one fully-vectorized pass per
    partition (two segmented-median sweeps — no Python loop over
    keys, the same partition-fn design as
    `features.analytic_rank_funcs`).  Per-key groups must be bounded
    (events-per-user, turns-per-bucket …), the same contract as the
    exact rollup quantiles; for unbounded groups use the t-digest
    path (`distinct.quantile_tdigest`) with an approximate threshold.
    """
    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[key, value_col]].copy()
        batch["_part"] = (
            pd.util.hash_pandas_object(batch[key], index=False).to_numpy() % P
        ).astype(np.int32)
        return batch

    parted = ds.map_batches(add_part, batch_format="pandas", batch_size=None)

    def partition_fn(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return pd.DataFrame(
                {
                    key: pd.Series([], dtype=df[key].dtype),
                    "n_events": pd.Series([], dtype=np.int64),
                    "med_value": pd.Series([], dtype=np.float64),
                    "mad_value": pd.Series([], dtype=np.float64),
                    "n_outliers": pd.Series([], dtype=np.int64),
                }
            )
        codes, uniques = pd.factorize(df[key], sort=False)
        v = df[value_col].to_numpy(dtype=np.float64)
        order = np.lexsort((v, codes))
        codes_s, v_s = codes[order], v[order]
        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        new_seg[1:] = codes_s[1:] != codes_s[:-1]
        starts = np.flatnonzero(new_seg)
        seg_len = np.diff(np.append(starts, n))
        med = _segmented_median(v_s, starts, seg_len)  # per segment
        seg_of = np.repeat(np.arange(len(starts)), seg_len)
        dev = np.abs(v_s - med[seg_of])
        order2 = np.lexsort((dev, codes_s))  # codes_s already grouped
        mad = _segmented_median(dev[order2], starts, seg_len)
        out_flags = dev > k * mad[seg_of]
        n_out = np.zeros(len(starts), dtype=np.int64)
        np.add.at(n_out, seg_of, out_flags)
        seg_key = uniques[codes_s[starts]]
        return pd.DataFrame(
            {
                key: seg_key,
                "n_events": seg_len.astype(np.int64),
                "med_value": med,
                "mad_value": mad,
                "n_outliers": n_out,
            }
        )

    return parted.groupby("_part").map_groups(partition_fn, batch_format="pandas")


# ------------------------------------------------- first-seen cumulative


def first_seen_cumulative(ds, key: str, ts_col: str, freq: str = "D"):
    """Cumulative count of distinct keys by their FIRST appearance
    bucket (new-users-per-day + running total).

    Shape: per-batch (key, min bucket) partials -> groupby(key).min
    -> per-bucket counts -> tiny bucket table sorted + prefix-summed
    in one block.  The key domain shuffles only as fixed-width
    (key, timestamp) pairs; the bucket domain is calendar-bounded
    (days over the corpus time range), so the final single-block
    sweep is driver-safe at any corpus size.
    """
    from .rollup import partitions_for_input

    P = partitions_for_input(None)

    def to_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[ts_col].dt.floor(freq)
        out = pd.DataFrame({key: batch[key], "first_bucket": b})
        # per-batch partial min: shrink before the exchange
        out = out.groupby(key, as_index=False).min()
        out["_part"] = (
            pd.util.hash_pandas_object(out[key], index=False).to_numpy() % P
        ).astype(np.int32)
        return out

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        # exact per-key min inside the partition, collapsed straight to
        # per-bucket new-key counts — only (bucket, count) rows leave
        f = g.groupby(key, as_index=False)["first_bucket"].min()
        c = f.groupby("first_bucket").size().reset_index(name="n_new")
        return c

    # ONE int-keyed exchange (two chained Ray sort-groupbys measured
    # ~8s of fixed cost at sf0.1); the bucket domain is calendar-
    # bounded, so the P x #buckets partials finish on the driver
    partials = (
        ds.map_batches(to_bucket, batch_format="pandas")
        .groupby("_part")
        .map_groups(finish, batch_format="pandas")
        .to_pandas()
    )
    agg = (
        partials.groupby("first_bucket", as_index=False)["n_new"].sum()
        .sort_values("first_bucket")
        .reset_index(drop=True)
    )
    agg["n_new"] = agg["n_new"].astype(np.int64)
    agg["cum_keys"] = agg["n_new"].cumsum().astype(np.int64)
    return agg


# --------------------------------------- histogram-based exact quantile


def quantile_from_counts(values: np.ndarray, counts: np.ndarray, q: float) -> float:
    """Exact quantile_cont from a (distinct value, count) histogram.

    Linear interpolation at position q*(n-1) — identical to
    np.quantile / DuckDB quantile_cont — computed without expanding
    the histogram, so a column with billions of rows but a bounded
    distinct-value domain (int lengths, scores …) gets an EXACT
    distributed quantile with only the histogram on the driver/group.
    """
    order = np.argsort(values, kind="stable")
    v = np.asarray(values, dtype=np.float64)[order]
    c = np.asarray(counts, dtype=np.int64)[order]
    cum = np.cumsum(c)
    n = int(cum[-1])
    pos = q * (n - 1)
    lo = int(np.floor(pos))
    frac = pos - lo
    a = float(v[np.searchsorted(cum, lo, side="right")])
    if frac == 0.0:
        return a
    b = float(v[np.searchsorted(cum, lo + 1, side="right")])
    return a + (b - a) * frac


def group_quantile_threshold(
    ds, group_col: str, value_col: str, q: float
) -> dict:
    """Per-group exact quantile of an integer-ish column via the
    histogram trick: count per (group, value) — only fixed-width
    pairs shuffle — then quantile_from_counts per group.  Returns a
    {group: threshold} dict (group domain must be small: languages,
    sources, tiers).
    """
    from ray.data.aggregate import Count

    hist = ds.groupby([group_col, value_col]).aggregate(Count(alias_name="n"))

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        thr = quantile_from_counts(
            g[value_col].to_numpy(), g["n"].to_numpy(), q
        )
        return pd.DataFrame({group_col: [g[group_col].iloc[0]], "threshold": [thr]})

    small = hist.groupby(group_col).map_groups(per_group, batch_format="pandas")
    out = small.to_pandas()  # one row per group: bounded
    return dict(zip(out[group_col], out["threshold"]))


def filter_above_group_quantile(
    ds, group_col: str, value_col: str, q: float
):
    """Rows with value STRICTLY above their group's exact q-quantile,
    aggregated per group (count + mean of the exceeding values), plus
    the threshold itself.  Thresholds are computed distributed
    (histogram trick) and broadcast into the filter as a plain dict —
    no shuffle join.
    """
    thresholds = group_quantile_threshold(ds, group_col, value_col, q)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        thr = batch[group_col].map(thresholds).to_numpy(dtype=np.float64)
        v = batch[value_col].to_numpy(dtype=np.float64)
        keep = v > thr
        sub = pd.DataFrame({group_col: batch[group_col][keep]})
        sub["n"] = 1
        sub["s"] = v[keep]
        return sub.groupby(group_col, as_index=False).agg(
            n=("n", "sum"), s=("s", "sum")
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group_col)
        .aggregate(Sum("n", alias_name="n_above"), Sum("s", alias_name="sum_above"))
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["threshold"] = batch[group_col].map(thresholds)
        batch["n_above"] = batch["n_above"].astype(np.int64)
        batch["mean_above"] = batch["sum_above"] / batch["n_above"]
        return batch[[group_col, "threshold", "n_above", "mean_above"]]

    return agg.map_batches(finish, batch_format="pandas", batch_size=None)


# ------------------------------------------------- seasonality profiles


def dow_profile(ds, ts_col: str, group_col: str, value_col: str):
    """Day-of-week seasonality profile per group: n / sum / mean of
    value by (group, ISO day-of-week 1=Mon..7=Sun).  Partial (n, sum)
    per batch, merged by a small groupby — only 7 x |groups| partials
    shuffle.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                group_col: batch[group_col],
                "dow": (batch[ts_col].dt.dayofweek + 1).astype(np.int64),
                "n": np.ones(len(batch), dtype=np.int64),
                "s": batch[value_col].to_numpy(dtype=np.float64),
            }
        )
        return out.groupby([group_col, "dow"], as_index=False).agg(
            n=("n", "sum"), s=("s", "sum")
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby([group_col, "dow"])
        .aggregate(Sum("n", alias_name="n_events"), Sum("s", alias_name="sum_value"))
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["n_events"] = batch["n_events"].astype(np.int64)
        batch["mean_value"] = batch["sum_value"] / batch["n_events"]
        return batch

    return agg.map_batches(finish, batch_format="pandas", batch_size=None)


def value_histogram(ds, group_col: str, value_col: str, bin_width: float):
    """Fixed-width histogram of value per group: bin = floor(v / w),
    count + sum per (group, bin).  Same partial-merge shape as
    dow_profile; bins-per-group is range/width (bounded), so the
    shuffle moves only partials.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value_col].to_numpy(dtype=np.float64)
        out = pd.DataFrame(
            {
                group_col: batch[group_col],
                "bin": np.floor(v / bin_width).astype(np.int64),
                "n": np.ones(len(batch), dtype=np.int64),
                "s": v,
            }
        )
        return out.groupby([group_col, "bin"], as_index=False).agg(
            n=("n", "sum"), s=("s", "sum")
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby([group_col, "bin"])
        .aggregate(Sum("n", alias_name="n_events"), Sum("s", alias_name="sum_value"))
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["n_events"] = batch["n_events"].astype(np.int64)
        return batch

    return agg.map_batches(finish, batch_format="pandas", batch_size=None)


# -------------------------------------------- per-series analysis stage


class SeriesAnalyzer:
    """Actor-pool time-series analysis over packed chunk rows
    (``series.pack_series`` / ``gap_fill_pack_series`` output):
    per chunk, the ACF-dominant lag (period detector), the CUSUM
    changepoint + normalized statistic, and (when the detected period
    fits twice) Hyndman's seasonal strength.

    Stateful setup (nothing heavy here, but the shape matches the
    reference's actor-pool stages): construct once per actor, stream
    batches of 128 chunk rows through ``__call__`` — each row's kernel
    is an O(n log n) FFT over its values, vectorized inside.
    """

    def __init__(self, max_lag: int = 512, min_lag: int = 2):
        from ..functions.tsanalysis import (
            acf_fft,
            cusum_changepoint,
            dominant_lag,
            seasonal_strength,
        )

        self.max_lag = max_lag
        self.min_lag = min_lag
        self._acf = acf_fft
        self._dom = dominant_lag
        self._cusum = cusum_changepoint
        self._strength = seasonal_strength

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        lag_o, aval_o, cp_o, stat_o, str_o = [], [], [], [], []
        for vals in batch["values"]:
            v = np.asarray(vals, dtype=np.float64)
            v = v[~np.isnan(v)]
            if len(v) < 8:
                lag_o.append(0)
                aval_o.append(0.0)
                cp_o.append(0)
                stat_o.append(0.0)
                str_o.append(0.0)
                continue
            acf = self._acf(v, self.max_lag)
            lag, aval = self._dom(acf, self.min_lag)
            cp, stat = self._cusum(v)
            if self.min_lag < lag and 2 * lag <= len(v):
                s = self._strength(v, lag)
            else:
                s = 0.0
            lag_o.append(lag)
            aval_o.append(aval)
            cp_o.append(cp)
            stat_o.append(stat)
            str_o.append(s)
        out = batch.drop(columns=[c for c in ("ts", "values", "values_precond") if c in batch.columns]).copy()
        out["acf_lag"] = np.asarray(lag_o, dtype=np.int64)
        out["acf_value"] = np.asarray(aval_o, dtype=np.float64)
        out["cusum_cp"] = np.asarray(cp_o, dtype=np.int64)
        out["cusum_stat"] = np.asarray(stat_o, dtype=np.float64)
        out["seasonal_strength"] = np.asarray(str_o, dtype=np.float64)
        return out


def series_analysis(chunk_ds, concurrency: int = 4, max_lag: int = 512):
    """ACF / CUSUM / seasonal-strength per packed chunk row."""
    return chunk_ds.map_batches(
        SeriesAnalyzer,
        fn_constructor_kwargs={"max_lag": max_lag},
        batch_format="pandas",
        batch_size=128,
        concurrency=concurrency,
    )


class LearnedPreconditionStage:
    """Per-chunk LEARNED precondition: fit AR(order) filter taps by
    Yule-Walker (`functions/tsanalysis.yule_walker`), whiten with the
    shared causal-convolution kernel (`forward_precondition` with
    c = -a), verify exact reversal in-stage, and emit the fitted taps
    + innovation-variance diagnostics.

    This is the numpy equivalent of the reference's torch
    ``LearnablePrecondition`` (uni2ts/src/uni2ts/transform/
    precondition.py): same filter form ``y_t = x_t + sum c_i x_{t-i}``,
    with taps fit in closed form per chunk instead of learned by SGD —
    so it runs inside a streaming actor pool with no training loop.
    Per-chunk state (the taps) is emitted alongside the data, making
    reversal self-contained at any scale.
    """

    def __init__(self, order: int = 4, tol: float = 1e-6):
        from ..functions.precondition import (
            forward_precondition,
            reverse_precondition,
        )
        from ..functions.tsanalysis import yule_walker

        self.order = order
        self.tol = tol
        self._fit = yule_walker
        self._fwd = forward_precondition
        self._rev = reverse_precondition

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        coeffs_o, sig_o, ratio_o, err_o = [], [], [], []
        for vals in batch["values"]:
            v = np.asarray(vals, dtype=np.float64)
            v = v[~np.isnan(v)]
            if len(v) < 2 * self.order + 2:
                coeffs_o.append(np.zeros(self.order))
                sig_o.append(0.0)
                ratio_o.append(1.0)
                err_o.append(0.0)
                continue
            a, sigma2 = self._fit(v, self.order)
            c = -a
            y = self._fwd(v, c)
            back = self._rev(y, c)
            err = float(np.max(np.abs(back - v)))
            vx = float(np.var(v))
            resid = y[self.order :] - y[self.order :].mean()
            ratio = float(np.var(resid) / vx) if vx > 0 else 1.0
            coeffs_o.append(a)
            sig_o.append(sigma2)
            ratio_o.append(ratio)
            err_o.append(err)
        out = batch.drop(
            columns=[c for c in ("ts", "values", "values_precond") if c in batch.columns]
        ).copy()
        out["ar_coeffs"] = coeffs_o
        out["innovation_var"] = np.asarray(sig_o, dtype=np.float64)
        out["whitened_var_ratio"] = np.asarray(ratio_o, dtype=np.float64)
        out["roundtrip_err"] = np.asarray(err_o, dtype=np.float64)
        return out


def learned_precondition(chunk_ds, order: int = 4, concurrency: int = 4):
    """AR-fitted (Yule-Walker) precondition over packed chunk rows."""
    return chunk_ds.map_batches(
        LearnedPreconditionStage,
        fn_constructor_kwargs={"order": order},
        batch_format="pandas",
        batch_size=128,
        concurrency=concurrency,
    )


def pairwise_correlation(
    ds,
    bucket_col: str,
    label_col: str,
    count_col: str,
    num_partitions: int | None = None,
):
    """Pearson correlation between every pair of ``label_col`` values,
    treating each ``bucket_col`` value as one observation of the
    per-label ``count_col`` vector (absent labels count 0) — e.g. "how
    correlated are event types hour by hour".

    Scale path: the input is already an aggregated (bucket, label, n)
    table (tiny relative to raw events). One bucket-hash shuffle; each
    partition pivots its buckets x labels matrix and emits EXACT int64
    moment partials (sum x, sum y, sum xy, sum x^2, sum y^2, n) per
    label pair via one X^T X matmul — |labels|^2 rows per partition,
    corpus-independent. The driver merge sums partials and finishes
    the closed-form correlation (same exact-moment design as
    `rollup.linear_trend`, which oracle-matches DuckDB ``corr``).

    Returns a DataFrame (label_a, label_b, n_buckets, corr_n) for
    label_a < label_b.
    """
    import pandas as pd
    import pyarrow as pa

    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)
    labels = sorted(ds.unique(label_col))  # bounded label domain
    L = len(labels)

    def add_part(batch: pa.Table) -> pa.Table:
        import pandas as pd_

        part = (
            pd_.util.hash_pandas_object(
                batch[bucket_col].to_pandas(), index=False
            ).to_numpy()
            % P
        ).astype(np.int32)
        return batch.append_column("_part", pa.array(part))

    def partition_fn(df: pd.DataFrame) -> pd.DataFrame:
        X = (
            df.pivot_table(
                index=bucket_col, columns=label_col, values=count_col,
                aggfunc="sum", fill_value=0,
            )
            .reindex(columns=labels, fill_value=0)
            .to_numpy(dtype=np.int64)
        )
        n = X.shape[0]
        xtx = X.T @ X                       # exact int64 cross-moments
        x2 = np.einsum("ij,ij->j", X, X)    # per-label sum of squares
        sx = X.sum(axis=0)
        ia, ib = np.triu_indices(L, k=1)
        return pd.DataFrame(
            {
                "label_a": np.asarray(labels, dtype=object)[ia],
                "label_b": np.asarray(labels, dtype=object)[ib],
                "n": np.full(len(ia), n, dtype=np.int64),
                "sx": sx[ia],
                "sy": sx[ib],
                "sxy": xtx[ia, ib],
                "sx2": x2[ia],
                "sy2": x2[ib],
            }
        )

    parts = (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(partition_fn, batch_format="pandas")
        .to_pandas()  # bounded: |labels|^2/2 x P rows
    )
    m = parts.groupby(["label_a", "label_b"], as_index=False).sum()
    n = m["n"].to_numpy(dtype=np.float64)
    sx, sy = m["sx"].to_numpy(np.float64), m["sy"].to_numpy(np.float64)
    sxy = m["sxy"].to_numpy(np.float64)
    sx2, sy2 = m["sx2"].to_numpy(np.float64), m["sy2"].to_numpy(np.float64)
    cov = n * sxy - sx * sy
    var = (n * sx2 - sx * sx) * (n * sy2 - sy * sy)
    corr = np.where(var > 0, cov / np.sqrt(var), np.nan)
    out = m[["label_a", "label_b"]].copy()
    out["n_buckets"] = m["n"].astype(np.int64)
    out["corr_n"] = corr
    return out.sort_values(["label_a", "label_b"]).reset_index(drop=True)


class ExpSmoother:
    """Actor-pool exponential smoothing over packed chunk rows: each
    batch's series stack into one NaN-padded time-major matrix and the
    EWMA / Holt scans (`functions/tsanalysis.ewm_mean_scan` /
    `holt_linear_scan`) run ONE loop over the chunk's time extent with
    every step vectorized across the batch's series — the batched-scan
    layout; work per batch is O(S·T) with no per-row Python loop.

    Emits per chunk: final EWMA state, Holt final level/trend, an
    ``horizon``-step Holt forecast, one-step-ahead MAEs of both
    smoothers, and two in-stage verification fields:

    - ``convexity_violations`` — count of EWMA outputs outside the
      running [min, max] envelope of the points consumed so far
      (always 0 for a correct convex-combination recurrence);
    - ``recompute_err`` — for a deterministic ~1/16 hash-sample of
      chunks, the max |scan − naive sequential recompute| (NaN for
      unsampled chunks). Keeps the exact cross-check distributed AND
      bounded: the naive per-point loop runs on the sample only.
    """

    def __init__(self, alpha: float = 0.3, beta: float = 0.1, horizon: int = 8):
        from ..functions.hashing import fnv1a_u64
        from ..functions.tsanalysis import ewm_mean_scan, holt_linear_scan

        self.alpha, self.beta, self.horizon = alpha, beta, horizon
        self._ewm, self._holt = ewm_mean_scan, holt_linear_scan
        self._hash = fnv1a_u64

    def _naive_err(self, v: np.ndarray, got: np.ndarray) -> float:
        s, err = np.nan, 0.0
        for i in range(len(v)):
            if not np.isfinite(v[i]):
                continue
            s = v[i] if not np.isfinite(s) else self.alpha * v[i] + (1 - self.alpha) * s
            err = max(err, abs(s - got[i]))
        return err

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        S = len(batch)
        series = [np.asarray(v, dtype=np.float64) for v in batch["values"]]
        T = max((len(v) for v in series), default=0)
        if T == 0:
            # a batch whose series are ALL empty: argmax/indexing over a
            # zero-length time axis would raise — emit the all-NaN rows
            # the per-row guards produce for empty series elsewhere
            out = batch.drop(
                columns=[c for c in ("ts", "values", "values_precond")
                         if c in batch.columns]
            ).copy()
            out["n_points"] = np.zeros(S, dtype=np.int64)
            out["ewm_last"] = np.full(S, np.nan)
            out["ewm_mae1"] = np.full(S, np.nan)
            out["holt_level"] = np.full(S, np.nan)
            out["holt_trend"] = np.full(S, np.nan)
            out["holt_forecast"] = [np.full(self.horizon, np.nan)] * S
            out["holt_mae1"] = np.full(S, np.nan)
            out["convexity_violations"] = np.zeros(S, dtype=np.int64)
            out["recompute_err"] = np.full(S, np.nan)
            return out
        x = np.full((S, T), np.nan)
        for i, v in enumerate(series):
            x[i, : len(v)] = v
        ewm = self._ewm(x, self.alpha)
        level, trend, fcst = self._holt(x, self.alpha, self.beta, self.horizon)

        fin = np.isfinite(x)
        # one-step-ahead predictors: the last smoothed state BEFORE each
        # point (forward-fill the state along time, shift by one)
        prev_ewm = pd.DataFrame(ewm).ffill(axis=1).shift(1, axis=1).to_numpy()
        prev_lvl = pd.DataFrame(level).ffill(axis=1).shift(1, axis=1).to_numpy()
        prev_trd = pd.DataFrame(trend).ffill(axis=1).shift(1, axis=1).to_numpy()
        with np.errstate(invalid="ignore"):
            e1 = np.where(fin & np.isfinite(prev_ewm), np.abs(x - prev_ewm), np.nan)
            h1 = np.where(
                fin & np.isfinite(prev_trd), np.abs(x - (prev_lvl + prev_trd)), np.nan
            )
        def _row_mean(m: np.ndarray) -> np.ndarray:
            c = np.isfinite(m).sum(axis=1)
            s = np.nansum(np.where(np.isfinite(m), m, 0.0), axis=1)
            return np.where(c > 0, s / np.maximum(c, 1), np.nan)

        ewm_mae1 = _row_mean(e1)
        holt_mae1 = _row_mean(h1)

        # convexity: each EWMA output must lie inside the running
        # [min, max] of the finite points seen so far (tiny fp slack)
        run_max = np.fmax.accumulate(np.where(fin, x, -np.inf), axis=1)
        run_min = np.fmin.accumulate(np.where(fin, x, np.inf), axis=1)
        bad = fin & (
            (ewm > run_max + 1e-9 * (1 + np.abs(run_max)))
            | (ewm < run_min - 1e-9 * (1 + np.abs(run_min)))
        )
        violations = bad.sum(axis=1).astype(np.int64)

        ids = batch["conv_id"].astype(str).to_numpy()
        h = self._hash(ids)
        sampled = (h & np.uint64(15)) == 0
        if S and not sampled.any():
            # tiny batches: always verify at least one chunk (still
            # bounded — ≤ 1 extra recompute per batch)
            sampled[int(np.argmin(h))] = True
        recompute = np.full(S, np.nan)
        for i in np.flatnonzero(sampled):
            recompute[i] = self._naive_err(x[i], ewm[i])

        n_fin = fin.sum(axis=1)
        last_idx = np.where(n_fin > 0, T - 1 - np.argmax(fin[:, ::-1], axis=1), 0)
        rows = np.arange(S)
        out = batch.drop(
            columns=[c for c in ("ts", "values", "values_precond") if c in batch.columns]
        ).copy()
        out["n_points"] = n_fin.astype(np.int64)
        out["ewm_last"] = np.where(n_fin > 0, ewm[rows, last_idx], np.nan)
        out["ewm_mae1"] = ewm_mae1
        out["holt_level"] = np.where(n_fin > 0, level[rows, last_idx], np.nan)
        out["holt_trend"] = np.where(n_fin > 1, trend[rows, last_idx], np.nan)
        out["holt_forecast"] = list(fcst)
        out["holt_mae1"] = holt_mae1
        out["convexity_violations"] = violations
        out["recompute_err"] = recompute
        return out


def exp_smooth(
    chunk_ds, alpha: float = 0.3, beta: float = 0.1, horizon: int = 8,
    concurrency: int = 4,
):
    """EWMA + Holt linear smoothing/forecast per packed chunk row."""
    return chunk_ds.map_batches(
        ExpSmoother,
        fn_constructor_kwargs={"alpha": alpha, "beta": beta, "horizon": horizon},
        batch_format="pandas",
        batch_size=256,
        concurrency=concurrency,
    )


class SeasonalSmoother:
    """Actor-pool additive Holt-Winters over packed chunk rows
    (`functions/tsanalysis.holt_winters_scan`): rows are bucketed by
    series length inside each batch so every scan runs the batched
    time-major layout on a dense finite matrix (chunks arrive
    gap-filled; within a bucket one loop over T, vectorized across
    series).  Chunks shorter than ``2*period`` are flagged
    ``hw_valid=False`` and carry NaN states instead of crashing the
    stage.

    Emits per chunk: final level/trend, the m seasonal states, an
    ``horizon``-step forecast, and the one-step-ahead fitted MAE."""

    def __init__(self, period: int = 24, alpha: float = 0.3, beta: float = 0.1,
                 gamma: float = 0.2, horizon: int = 12):
        from ..functions.tsanalysis import holt_winters_scan

        self.period, self.horizon = period, horizon
        self.alpha, self.beta, self.gamma = alpha, beta, gamma
        self._scan = holt_winters_scan

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        m, H = self.period, self.horizon
        level = np.full(n, np.nan)
        trend = np.full(n, np.nan)
        mae = np.full(n, np.nan)
        season = [np.full(m, np.nan)] * n
        fc = [np.full(H, np.nan)] * n
        valid = np.zeros(n, dtype=bool)
        series = [np.asarray(v, dtype=np.float64) for v in batch["values"]]
        lens = np.asarray([len(v) for v in series])
        for L in np.unique(lens):
            if L < 2 * m:
                continue
            rows = np.flatnonzero(lens == L)
            x = np.stack([series[i] for i in rows])
            lv, tr, fit, fcs = self._scan(
                x, period=m, alpha=self.alpha, beta=self.beta,
                gamma=self.gamma, horizon=H,
            )
            level[rows] = lv[:, -1]
            trend[rows] = tr[:, -1]
            mae[rows] = np.nanmean(np.abs(fit[:, 1:] - x[:, 1:]), axis=1)
            # recover final seasonal states from the forecast identity
            # fc_h = l + h*b + s_phase  ->  s = fc - (l + h*b)
            for j, r in enumerate(rows):
                h = np.arange(1, H + 1)
                s_by_h = fcs[j] - (lv[j, -1] + h * tr[j, -1])
                s = np.full(m, np.nan)
                s[(L + h - 1) % m] = s_by_h
                season[r] = s
                fc[r] = fcs[j]
            valid[rows] = True
        out = batch[["conv_id", "chunk_idx", "n_points"]].copy()
        out["hw_level"] = level
        out["hw_trend"] = trend
        out["hw_fit_mae"] = mae
        out["hw_season"] = season
        out["hw_forecast"] = fc
        out["hw_valid"] = valid
        return out


def holt_winters(chunk_ds, period: int = 24, alpha: float = 0.3, beta: float = 0.1,
                 gamma: float = 0.2, horizon: int = 12, concurrency: int = 4):
    """Additive Holt-Winters smoothing/forecast per packed chunk row."""
    return chunk_ds.map_batches(
        SeasonalSmoother,
        fn_constructor_kwargs={
            "period": period, "alpha": alpha, "beta": beta,
            "gamma": gamma, "horizon": horizon,
        },
        batch_format="pandas",
        batch_size=256,
        concurrency=concurrency,
    )


class LTTBDownsampler:
    """Largest-Triangle-Three-Buckets visual downsampling per packed
    chunk row (`functions/resample.lttb_indices`): each chunk's series
    reduces to at most ``k`` shape-preserving points.  Endpoints are
    always kept; a bucket's most 'visually important' point (max
    triangle area vs the previous pick and the next bucket centroid)
    survives — the retention-tier render path for dashboards."""

    def __init__(self, k: int = 128):
        from ..functions.resample import lttb_indices

        self.k = k
        self._lttb = lttb_indices

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ds_vals, ds_idx, n_out = [], [], []
        for v in batch["values"]:
            v = np.asarray(v, dtype=np.float64)
            idx = self._lttb(np.arange(len(v), dtype=np.float64), v, self.k)
            ds_idx.append(idx.astype(np.int64))
            ds_vals.append(v[idx])
            n_out.append(len(idx))
        out = batch[["conv_id", "chunk_idx", "n_points"]].copy()
        out["ds_indices"] = ds_idx
        out["ds_values"] = ds_vals
        out["n_out"] = np.asarray(n_out, dtype=np.int64)
        return out


def lttb_downsample(chunk_ds, k: int = 128, concurrency: int = 4):
    """LTTB shape-preserving downsample per packed chunk row."""
    return chunk_ds.map_batches(
        LTTBDownsampler, fn_constructor_kwargs={"k": k},
        batch_format="pandas", batch_size=256, concurrency=concurrency,
    )


class MatrixProfiler:
    """Actor-pool exact matrix profile per packed chunk row: for each
    chunk's value series, the z-normalized nearest-neighbor distance
    profile (STOMP) summarized as the motif (global min) and discord
    (global max) with their indices. O(n^2) per chunk is the designed
    budget — chunks are bounded by ``pack_series`` (<= ~4096 points),
    so the quadratic term never sees a whole conversation at 100 TB.
    """

    def __init__(self, window: int = 16):
        from ..functions.tsanalysis import matrix_profile

        self.window = window
        self._mp = matrix_profile

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        motif_d, motif_i, motif_j, discord_d, discord_i, n_sub = [], [], [], [], [], []
        for vals in batch["values"]:
            v = np.asarray(vals, dtype=np.float64)
            v = v[~np.isnan(v)]
            if len(v) < 2 * self.window:
                motif_d.append(np.nan); motif_i.append(-1); motif_j.append(-1)
                discord_d.append(np.nan); discord_i.append(-1); n_sub.append(0)
                continue
            P, I = self._mp(v, self.window)
            finite = np.isfinite(P)
            if not finite.any():
                motif_d.append(np.nan); motif_i.append(-1); motif_j.append(-1)
                discord_d.append(np.nan); discord_i.append(-1); n_sub.append(len(P))
                continue
            Pf = np.where(finite, P, np.inf)
            mi = int(np.argmin(Pf))
            Pd = np.where(finite, P, -np.inf)
            di = int(np.argmax(Pd))
            motif_d.append(float(P[mi])); motif_i.append(mi); motif_j.append(int(I[mi]))
            discord_d.append(float(P[di])); discord_i.append(di); n_sub.append(len(P))
        out = batch.drop(columns=[c for c in ("ts", "values", "values_precond")
                                  if c in batch.columns]).copy()
        out["motif_dist"] = np.asarray(motif_d, np.float64)
        out["motif_idx"] = np.asarray(motif_i, np.int64)
        out["motif_match"] = np.asarray(motif_j, np.int64)
        out["discord_dist"] = np.asarray(discord_d, np.float64)
        out["discord_idx"] = np.asarray(discord_i, np.int64)
        out["n_subseq"] = np.asarray(n_sub, np.int64)
        return out


def matrix_profile_chunks(chunk_ds, window: int = 16, concurrency: int = 4):
    """Motif/discord discovery per packed chunk (exact STOMP)."""
    return chunk_ds.map_batches(
        MatrixProfiler,
        fn_constructor_kwargs={"window": window},
        batch_format="pandas",
        batch_size=64,
        concurrency=concurrency,
    )


class SaliencyScorer:
    """Actor-pool spectral-residual anomaly scorer per packed chunk:
    saliency map (Ren et al., KDD 2019) -> robust z-score of saliency
    -> anomaly indices where score > ``threshold``. Emits per-chunk
    anomaly count, top index and its score."""

    def __init__(self, ma_window: int = 21, threshold: float = 6.0):
        from ..functions.tsanalysis import spectral_residual_saliency

        self.ma_window = ma_window
        self.threshold = threshold
        self._sal = spectral_residual_saliency

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n_anom, top_idx, top_score = [], [], []
        for vals in batch["values"]:
            v = np.asarray(vals, dtype=np.float64)
            v = np.where(np.isnan(v), np.nanmean(v) if np.isfinite(np.nanmean(v)) else 0.0, v)
            if len(v) < 16:
                n_anom.append(0); top_idx.append(-1); top_score.append(0.0)
                continue
            s = self._sal(v, self.ma_window)
            med = np.median(s)
            mad = np.median(np.abs(s - med)) + 1e-12
            z = (s - med) / (1.4826 * mad)
            flag = z > self.threshold
            n_anom.append(int(flag.sum()))
            ti = int(np.argmax(z))
            top_idx.append(ti if flag.any() else -1)
            top_score.append(float(z[ti]))
        out = batch.drop(columns=[c for c in ("ts", "values", "values_precond")
                                  if c in batch.columns]).copy()
        out["n_anomalies"] = np.asarray(n_anom, np.int64)
        out["top_anomaly_idx"] = np.asarray(top_idx, np.int64)
        out["top_anomaly_score"] = np.asarray(top_score, np.float64)
        return out


def saliency_anomalies(chunk_ds, ma_window: int = 21, threshold: float = 6.0,
                       concurrency: int = 4):
    """Spectral-residual anomaly detection per packed chunk."""
    return chunk_ds.map_batches(
        SaliencyScorer,
        fn_constructor_kwargs={"ma_window": ma_window, "threshold": threshold},
        batch_format="pandas",
        batch_size=128,
        concurrency=concurrency,
    )


class DTWScorer:
    """Actor-pool banded-DTW distance of each row's series against a
    BROADCAST query profile (ray.put once, fetched per actor in
    __init__ — never re-shipped per batch)."""

    def __init__(self, query_ref, band: int = 8):
        import ray

        from ..functions.tsanalysis import dtw_distance

        self.query = np.asarray(ray.get(query_ref), dtype=np.float64)
        self.band = band
        self._dtw = dtw_distance

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        d, eu = [], []
        q = self.query
        for vals in batch["values"]:
            v = np.asarray(vals, dtype=np.float64)
            d.append(self._dtw(v, q, self.band))
            eu.append(float(np.sqrt(((v - q) ** 2).sum())) if len(v) == len(q) else np.nan)
        out = batch.drop(columns=[c for c in ("ts", "values") if c in batch.columns]).copy()
        out["dtw_dist"] = np.asarray(d, np.float64)
        out["euclid_dist"] = np.asarray(eu, np.float64)
        return out


def dtw_score(series_ds, query: np.ndarray, band: int = 8, concurrency: int = 4):
    """DTW distance per series row vs one broadcast query profile."""
    import ray

    query_ref = ray.put(np.asarray(query, dtype=np.float64))
    return series_ds.map_batches(
        DTWScorer,
        fn_constructor_kwargs={"query_ref": query_ref, "band": band},
        batch_format="pandas",
        batch_size=256,
        concurrency=concurrency,
    )


class KalmanSmoother:
    """Actor-pool Kalman local-level filter + RTS smoother per packed
    chunk (q = level-noise var, r = observation-noise var). NaN cells
    act as missing observations (pure predict), so the smoother is
    also a probabilistic gap-filler. Emits per-chunk summaries; with
    ``emit_series=True`` also the smoothed/filtered series (list
    columns) for verification paths."""

    def __init__(self, q: float = 0.1, r: float = 1.0, emit_series: bool = False):
        from ..functions.tsanalysis import kalman_local_level

        self.q = q
        self.r = r
        self.emit_series = emit_series
        self._kalman = kalman_local_level

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rmse_o, var_s, last_s, series_s, series_f = [], [], [], [], []
        for vals in batch["values"]:
            v = np.asarray(vals, dtype=np.float64)
            if len(v) == 0:
                rmse_o.append(np.nan); var_s.append(np.nan); last_s.append(np.nan)
                series_s.append(np.zeros(0)); series_f.append(np.zeros(0))
                continue
            mf, ms, ps = self._kalman(v, self.q, self.r)
            fin = np.isfinite(v)
            rmse_o.append(float(np.sqrt(np.mean((ms[fin] - v[fin]) ** 2))) if fin.any() else np.nan)
            var_s.append(float(np.nanmean(ps)))
            last_s.append(float(ms[-1]))
            if self.emit_series:
                series_s.append(ms)
                series_f.append(mf)
        out = batch.drop(columns=[c for c in ("ts", "values", "values_precond")
                                  if c in batch.columns]).copy()
        out["smooth_obs_rmse"] = np.asarray(rmse_o, np.float64)
        out["smooth_var"] = np.asarray(var_s, np.float64)
        out["smooth_last"] = np.asarray(last_s, np.float64)
        if self.emit_series:
            out["smoothed"] = series_s
            out["filtered"] = series_f
        return out


def kalman_smooth(chunk_ds, q: float = 0.1, r: float = 1.0,
                  emit_series: bool = False, concurrency: int = 4):
    """Kalman local-level smoothing per packed chunk."""
    return chunk_ds.map_batches(
        KalmanSmoother,
        fn_constructor_kwargs={"q": q, "r": r, "emit_series": emit_series},
        batch_format="pandas",
        batch_size=128,
        concurrency=concurrency,
    )


class SAXEncoder:
    """Actor-pool SAX symbolic encoder per packed chunk (Lin et al.,
    DMKD 2007): z-normalize the chunk's value series, PAA to ``w``
    segments, quantize by Gaussian breakpoints. Emits the symbolic
    word plus the PAA sketch — the scale path for motif GROUPING at
    100 TB: downstream groupby runs on short strings, never on raw
    series."""

    def __init__(self, w: int = 8, alphabet: int = 4):
        from ..functions.tsanalysis import sax_word

        self.w = w
        self.alphabet = alphabet
        self._sax = sax_word

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        words, paas, lens = [], [], []
        for vals in batch["values"]:
            v = np.asarray(vals, dtype=np.float64)
            v = v[np.isfinite(v)]
            if len(v) == 0:
                words.append(""); paas.append(np.zeros(0)); lens.append(0)
                continue
            word, pa_ = self._sax(v, self.w, self.alphabet)
            words.append(word); paas.append(pa_); lens.append(len(v))
        out = batch.drop(columns=[c for c in ("ts", "values", "values_precond")
                                  if c in batch.columns]).copy()
        out["sax_word"] = pd.Series(words, dtype=object)
        out["paa"] = paas
        out["n_points"] = np.asarray(lens, np.int64)
        return out


def sax_encode(chunk_ds, w: int = 8, alphabet: int = 4, concurrency: int = 4):
    """SAX symbolic words per packed chunk."""
    return chunk_ds.map_batches(
        SAXEncoder,
        fn_constructor_kwargs={"w": w, "alphabet": alphabet},
        batch_format="pandas",
        batch_size=256,
        concurrency=concurrency,
    )


def lagged_ccf(
    ds,
    type_a: str,
    type_b: str,
    max_lag: int = 3,
    ts_col: str = "ts",
    label_col: str = "event_type",
    bucket_us: int = 3_600_000_000,
):
    """Cross-correlation function between the per-bucket count series
    of two labels at lags ``-max_lag..max_lag`` (lead-lag detection:
    ccf(k) = corr(a_t, b_{t+k}), so a peak at k>0 means a LEADS b by k
    buckets).

    Scale path: one distributed pass collapses events to per-bucket
    (n_a, n_b) int partials merged by a bucket-key groupby; the merged
    grid is CALENDAR-bounded (hours between global min and max — e.g.
    ~175k rows for 20 years), independent of corpus size, so the final
    dense reindex + per-lag EXACT int64 moment evaluation on the
    driver is dimension-bounded (same argument as
    ``pairwise_correlation``). Missing buckets count 0 on both sides.
    Returns DataFrame (lag, n_pairs, ccf).
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        lab = batch[label_col].to_pandas().to_numpy()
        bucket = t // bucket_us * bucket_us
        df = pd.DataFrame({
            "bucket": bucket,
            "n_a": (lab == type_a).astype(np.int64),
            "n_b": (lab == type_b).astype(np.int64),
        })
        g = df.groupby("bucket", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    grid = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .aggregate(Sum("n_a", alias_name="n_a"), Sum("n_b", alias_name="n_b"))
        .to_pandas()  # calendar-bounded, not corpus-bounded
    )
    if len(grid) == 0:
        return pd.DataFrame({"lag": pd.Series([], dtype=np.int64),
                             "n_pairs": pd.Series([], dtype=np.int64),
                             "ccf": pd.Series([], dtype=np.float64)})
    grid = grid.sort_values("bucket")
    lo, hi = int(grid["bucket"].iloc[0]), int(grid["bucket"].iloc[-1])
    hours = np.arange(lo, hi + bucket_us, bucket_us, dtype=np.int64)
    dense = pd.DataFrame({"bucket": hours}).merge(grid, on="bucket", how="left").fillna(0)
    a = dense["n_a"].to_numpy(np.int64)
    b = dense["n_b"].to_numpy(np.int64)
    H = len(a)
    rows = []
    for k in range(-max_lag, max_lag + 1):
        if k >= 0:
            x, y = a[: H - k] if k else a, b[k:]
        else:
            x, y = a[-k:], b[: H + k]
        n = len(x)
        if n < 2:
            rows.append((k, n, np.nan))
            continue
        sx, sy = int(x.sum()), int(y.sum())
        sxy = int(np.dot(x, y))
        sx2, sy2 = int(np.dot(x, x)), int(np.dot(y, y))
        num = n * sxy - sx * sy
        den = np.sqrt(float(n * sx2 - sx * sx)) * np.sqrt(float(n * sy2 - sy * sy))
        rows.append((k, n, num / den if den > 0 else np.nan))
    return pd.DataFrame(rows, columns=["lag", "n_pairs", "ccf"]).astype(
        {"lag": np.int64, "n_pairs": np.int64, "ccf": np.float64})


def burst_stats(
    ds,
    key: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    s: float = 4.0,
    gamma: float = 1.0,
    num_partitions: int | None = None,
):
    """Kleinberg burst detection per conversation
    (`functions.tsanalysis.kleinberg_bursts`): ONE conv-hash shuffle of
    three narrow columns, then per partition a lexsort + per-key O(n)
    2-state Viterbi over the inter-turn gaps. Emits one row per key:
    n_bursts, gaps_in_burst, frac_gaps_in_burst, longest_burst,
    first_burst_start (order index of the first bursty gap; -1 when
    none). Keys never split across partitions, so the sequential
    automaton state stays partition-local."""
    import pyarrow as pa

    from ..functions.tsanalysis import kleinberg_bursts
    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)

    def add_part(batch: pa.Table) -> pa.Table:
        import pandas as pd_

        part = (
            pd_.util.hash_pandas_object(
                batch[key].to_pandas(), index=False
            ).to_numpy()
            % P
        ).astype(np.int32)
        return batch.append_column("_part", pa.array(part))

    ds = ds.select_columns([key, order_col, ts_col]).map_batches(
        add_part, batch_format="pyarrow", batch_size=None
    )

    def partition_fn(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                key: pd.Series([], dtype=object),
                "n_gaps": pd.Series([], dtype=np.int64),
                "n_bursts": pd.Series([], dtype=np.int64),
                "gaps_in_burst": pd.Series([], dtype=np.int64),
                "frac_gaps_in_burst": pd.Series([], dtype=np.float64),
                "longest_burst": pd.Series([], dtype=np.int64),
                "first_burst_start": pd.Series([], dtype=np.int64),
            })
        codes, uniques = pd.factorize(df[key], sort=False)
        order = np.lexsort((df[order_col].to_numpy(), codes))
        codes_s = codes[order]
        t = df[ts_col].to_numpy(dtype="datetime64[us]").view("int64")[order]
        new_key = np.empty(len(df), dtype=bool)
        new_key[0] = True
        new_key[1:] = codes_s[1:] != codes_s[:-1]
        starts = np.flatnonzero(new_key)
        ends = np.append(starts[1:], len(df))
        rows = []
        for kidx, (lo, hi) in enumerate(zip(starts, ends)):
            gaps = np.diff(t[lo:hi]) / 1e6
            if len(gaps) < 2:
                rows.append((uniques[codes_s[lo]], len(gaps), 0, 0, 0.0, 0, -1))
                continue
            _, bursts = kleinberg_bursts(gaps, s=s, gamma=gamma)
            in_b = sum(e - b for b, e in bursts)
            longest = max((e - b for b, e in bursts), default=0)
            first = bursts[0][0] if bursts else -1
            rows.append((uniques[codes_s[lo]], len(gaps), len(bursts), in_b,
                         in_b / len(gaps), longest, first))
        return pd.DataFrame(rows, columns=[
            key, "n_gaps", "n_bursts", "gaps_in_burst", "frac_gaps_in_burst",
            "longest_burst", "first_burst_start",
        ]).astype({"n_gaps": np.int64, "n_bursts": np.int64,
                   "gaps_in_burst": np.int64, "frac_gaps_in_burst": np.float64,
                   "longest_burst": np.int64, "first_burst_start": np.int64})

    return ds.groupby("_part").map_groups(partition_fn, batch_format="pandas")


class PELTChangepoints:
    """Actor-pool exact PELT mean-shift changepoint detection per
    packed chunk (`functions.tsanalysis.pelt_mean_changepoints`).
    Chunks are bounded by ``pack_series`` so the expected-linear scan
    never sees a whole conversation; chunk boundaries are natural
    segment boundaries (same contract as the Gorilla state reset)."""

    def __init__(self, beta: float | None = None, min_size: int = 2,
                 emit_points: bool = False):
        from ..functions.tsanalysis import pelt_mean_changepoints

        self.beta = beta
        self.min_size = min_size
        self.emit_points = emit_points
        self._pelt = pelt_mean_changepoints

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n_cps, largest, cps_o = [], [], []
        for vals in batch["values"]:
            v = np.asarray(vals, dtype=np.float64)
            v = v[np.isfinite(v)]
            if len(v) < 2 * self.min_size:
                n_cps.append(0); largest.append(np.nan); cps_o.append(np.zeros(0, np.int64))
                continue
            cps = self._pelt(v, beta=self.beta, min_size=self.min_size)
            n_cps.append(len(cps))
            if cps:
                edges = [0, *cps, len(v)]
                means = [float(v[a:b].mean()) for a, b in zip(edges, edges[1:])]
                largest.append(float(np.max(np.abs(np.diff(means)))))
            else:
                largest.append(0.0)
            cps_o.append(np.asarray(cps, np.int64))
        out = batch.drop(columns=[c for c in ("ts", "values", "values_precond")
                                  if c in batch.columns]).copy()
        out["n_changepoints"] = np.asarray(n_cps, np.int64)
        out["largest_shift"] = np.asarray(largest, np.float64)
        if self.emit_points:
            out["changepoints"] = cps_o
        return out


def pelt_changepoints(chunk_ds, beta: float | None = None, min_size: int = 2,
                      emit_points: bool = False, concurrency: int = 4):
    """Exact PELT mean-shift changepoints per packed chunk."""
    return chunk_ds.map_batches(
        PELTChangepoints,
        fn_constructor_kwargs={"beta": beta, "min_size": min_size,
                               "emit_points": emit_points},
        batch_format="pandas",
        batch_size=128,
        concurrency=concurrency,
    )


class ASAPSmoother:
    """ASAP automatic dashboard smoothing per packed chunk row
    (`functions/tsanalysis.asap_window`, Rong & Bailis VLDB'17): each
    chunk's value series gets the moving-average window that minimizes
    roughness while PRESERVING kurtosis (spikes survive). The chosen
    window, smoothed series, and before/after roughness + kurtosis
    diagnostics are emitted so downstream render tiers (and the
    self-verifying query) can check the paper's two invariants without
    re-touching the raw series. Actor pool: the candidate-grid params
    are fixed per actor; work is O(n log n) ACF + O(n) per candidate."""

    def __init__(self, max_window: int | None = None):
        from ..functions.tsanalysis import (
            _excess_kurtosis,
            asap_smooth,
            roughness,
        )

        self.max_window = max_window
        self._smooth = asap_smooth
        self._rough = roughness
        self._kurt = _excess_kurtosis

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        wins, sm_vals, r_raw, r_sm, k_raw, k_sm = [], [], [], [], [], []
        for v in batch["values"]:
            v = np.asarray(v, dtype=np.float64)
            v = np.nan_to_num(v, nan=0.0)
            sm, w = self._smooth(v, max_window=self.max_window)
            wins.append(w)
            sm_vals.append(sm)
            r_raw.append(self._rough(v))
            r_sm.append(self._rough(sm))
            k_raw.append(self._kurt(v))
            k_sm.append(self._kurt(sm))
        out = batch[["conv_id", "chunk_idx", "n_points"]].copy()
        out["window"] = np.asarray(wins, dtype=np.int64)
        out["smoothed"] = sm_vals
        out["roughness_raw"] = np.asarray(r_raw, dtype=np.float64)
        out["roughness_smoothed"] = np.asarray(r_sm, dtype=np.float64)
        out["kurtosis_raw"] = np.asarray(k_raw, dtype=np.float64)
        out["kurtosis_smoothed"] = np.asarray(k_sm, dtype=np.float64)
        return out


def asap_downsample(chunk_ds, max_window: int | None = None,
                    concurrency: int = 4):
    """ASAP kurtosis-preserving smoothing per packed chunk row."""
    return chunk_ds.map_batches(
        ASAPSmoother,
        fn_constructor_kwargs={"max_window": max_window},
        batch_format="pandas",
        batch_size=128,
        concurrency=concurrency,
    )


# ------------------------------------------- interval concurrency sweep


def session_intervals(ds, key: str, ts_col: str, gap_s: float,
                      num_partitions: int | None = None):
    """Sessionize event rows into closed intervals [start, end]: a gap
    > ``gap_s`` seconds between consecutive events of the same ``key``
    starts a new session (same rule as the per-user session rollup /
    its DuckDB oracle; single-event sessions are zero-length).

    Scale path: ONE key-hash exchange, then each partition runs a
    single numpy lexsort + segmented sweep over every key it owns —
    no per-key ``map_groups`` tasks (measured ~10x slower at 1e5+
    keys). Output is one fixed-width row per session:
    (key, start_us, end_us, n_events).
    """
    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)
    gap_us = np.int64(round(gap_s * 1e6))

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            key: batch[key],
            "_ts": batch[ts_col].astype("datetime64[us]").astype(np.int64),
        })
        out["_part"] = (
            pd.util.hash_pandas_object(out[key], index=False).to_numpy() % P
        ).astype(np.int32)
        return out

    empty = pd.DataFrame({
        key: pd.Series([], dtype=np.int64),
        "start_us": pd.Series([], dtype=np.int64),
        "end_us": pd.Series([], dtype=np.int64),
        "n_events": pd.Series([], dtype=np.int64),
    })

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return empty.copy()
        codes, uniques = pd.factorize(g[key], sort=False)
        ts = g["_ts"].to_numpy(np.int64)
        order = np.lexsort((ts, codes))
        codes_s, ts_s = codes[order], ts[order]
        n = len(g)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = codes_s[1:] != codes_s[:-1]
        gap_break = np.empty(n, dtype=bool)
        gap_break[0] = True
        gap_break[1:] = (ts_s[1:] - ts_s[:-1]) > gap_us
        new_sess = new_key | gap_break
        starts = np.flatnonzero(new_sess)
        ends = np.append(starts[1:], n) - 1
        return pd.DataFrame({
            key: np.asarray(uniques)[codes_s[starts]],
            "start_us": ts_s[starts],
            "end_us": ts_s[ends],
            "n_events": (ends - starts + 1).astype(np.int64),
        })

    return (
        ds.map_batches(tag, batch_format="pandas", batch_size=None)
        .groupby("_part")
        .map_groups(sweep, batch_format="pandas")
    )


def interval_concurrency(intervals, freq_s: int = 3600,
                         start_col: str = "start_us",
                         end_col: str = "end_us",
                         num_partitions: int | None = None):
    """Per time-bucket PEAK concurrency and busy time over CLOSED
    intervals [start, end] — the classic utilization sweep (peak
    concurrent sessions per hour, occupancy seconds per hour), fully
    distributed with no global sort and no driver state.

    Each interval expands to its spanned buckets (bounded by
    duration / freq — the same bounded densification contract as the
    gap-fill stage): a carry indicator for every bucket STRICTLY after
    the start bucket (the interval is already open at that bucket's
    first instant), the per-bucket overlap in µs, and two boundary
    rows (+1 at start, -1 at end). ONE bucket-hash exchange then
    finishes each bucket locally: start level = carry count; within-
    bucket sweep orders boundaries by (ts, +1 before -1) — closed-
    interval semantics, an interval ending exactly when another starts
    briefly counts both — and peak = carry + max(0, running deltas).
    Buckets touched by no interval are not emitted.

    Returns (bucket_us, peak_concurrency, busy_us) — ints only;
    callers convert/round.
    """
    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)
    F = np.int64(freq_s) * np.int64(1_000_000)

    def expand(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[start_col].to_numpy(np.int64)
        e = batch[end_col].to_numpy(np.int64)
        h0 = s // F
        h1 = e // F
        counts = (h1 - h0 + 1).astype(np.int64)
        total = int(counts.sum())
        row = np.repeat(np.arange(len(s), dtype=np.int64), counts)
        seg0 = np.zeros(len(s), dtype=np.int64)
        np.cumsum(counts[:-1], out=seg0[1:])
        within = np.arange(total, dtype=np.int64) - np.repeat(seg0, counts)
        h = (h0[row] + within) * F
        overlap = np.minimum(e[row], h + F) - np.maximum(s[row], h)
        span = pd.DataFrame({
            "h": h,
            "carry": (within > 0).astype(np.int8),
            "busy_us": overlap,
            "ts": np.zeros(total, dtype=np.int64),
            "d": np.zeros(total, dtype=np.int8),
        })
        bounds = pd.DataFrame({
            "h": np.concatenate([h0 * F, h1 * F]),
            "carry": np.zeros(2 * len(s), dtype=np.int8),
            "busy_us": np.zeros(2 * len(s), dtype=np.int64),
            "ts": np.concatenate([s, e]),
            "d": np.concatenate([
                np.ones(len(s), dtype=np.int8),
                np.full(len(s), -1, dtype=np.int8),
            ]),
        })
        out = pd.concat([span, bounds], ignore_index=True)
        out["_part"] = (
            pd.util.hash_pandas_object(out["h"], index=False).to_numpy() % P
        ).astype(np.int32)
        return out

    empty = pd.DataFrame({
        "bucket_us": pd.Series([], dtype=np.int64),
        "peak_concurrency": pd.Series([], dtype=np.int64),
        "busy_us": pd.Series([], dtype=np.int64),
    })

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return empty.copy()
        h = g["h"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int8)
        ts = g["ts"].to_numpy(np.int64)
        # sort by (h, ts, -d): within a bucket's boundary stream, +1
        # sorts before -1 at equal ts (closed-interval tie rule); carry
        # rows (d=0, ts=0) sort first within their bucket and carry no
        # delta, so they never perturb the running level
        order = np.lexsort((-d, ts, h))
        h_s, d_s = h[order], d[order].astype(np.int64)
        n = len(g)
        new_h = np.empty(n, dtype=bool)
        new_h[0] = True
        new_h[1:] = h_s[1:] != h_s[:-1]
        starts = np.flatnonzero(new_h)
        # segmented running sum of deltas, reset per bucket
        cs = np.cumsum(d_s)
        base = np.where(starts > 0, cs[starts - 1], 0)
        rel = cs - np.repeat(base, np.diff(np.append(starts, n)))
        max_rel = np.maximum.reduceat(rel, starts)
        carry = np.add.reduceat(g["carry"].to_numpy(np.int64)[order], starts)
        busy = np.add.reduceat(g["busy_us"].to_numpy(np.int64)[order], starts)
        return pd.DataFrame({
            "bucket_us": h_s[starts],
            "peak_concurrency": carry + np.maximum(max_rel, 0),
            "busy_us": busy,
        })

    return (
        intervals.map_batches(expand, batch_format="pandas", batch_size=None)
        .groupby("_part")
        .map_groups(finish, batch_format="pandas")
    )


# ----------------------------------------------------- autocorrelation


def acf_by_key(ds, key: str, order_col: str, value_col: str,
               lags: tuple[int, ...] = (1, 2, 3),
               num_partitions: int | None = None):
    """Per-key sample autocorrelation of ``value_col`` at row-order
    ``lags`` (series ordered by ``order_col``) — the classic
    seasonality/persistence diagnostic (Box-Jenkins ACF; identical to
    SQL ``corr(v, lag(v, k) over (partition by key order by ...))``,
    where the normalization makes sample vs population equivalent).

    Scale path: ONE key-hash exchange, then a single lexsort +
    ``np.add.reduceat`` moment pass per partition for every lag — no
    per-key tasks, no Python loop over rows. Output: one row per key
    with ``acf<k>`` columns (NaN when fewer than k+2 points or zero
    variance) and ``n_buckets``.
    """
    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[key, order_col, value_col]].copy()
        out["_part"] = (
            pd.util.hash_pandas_object(out[key], index=False).to_numpy() % P
        ).astype(np.int32)
        return out

    acf_cols = [f"acf{k}" for k in lags]
    empty = pd.DataFrame({
        key: pd.Series([], dtype=np.int64),
        **{c: pd.Series([], dtype=np.float64) for c in acf_cols},
        "n_buckets": pd.Series([], dtype=np.int64),
    })

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return empty.copy()
        codes, uniques = pd.factorize(g[key], sort=False)
        order = np.lexsort((g[order_col].to_numpy(), codes))
        codes_s = codes[order]
        v = g[value_col].to_numpy(np.float64)[order]
        n = len(g)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = codes_s[1:] != codes_s[:-1]
        starts = np.flatnonzero(new_key)
        seg_len = np.diff(np.append(starts, n))
        seg_of = np.cumsum(new_key) - 1
        pos_in_seg = np.arange(n) - starts[seg_of]
        out = {key: np.asarray(uniques)[codes_s[starts]],
               "n_buckets": seg_len.astype(np.int64)}
        for k in lags:
            x = v.copy()
            y = np.empty(n)
            y[k:] = v[:-k]
            y[:k] = 0.0
            valid = pos_in_seg >= k
            x = np.where(valid, x, 0.0)
            y = np.where(valid, y, 0.0)
            cnt = np.maximum(seg_len - k, 0).astype(np.float64)
            sx = np.add.reduceat(x, starts)
            sy = np.add.reduceat(y, starts)
            sxx = np.add.reduceat(x * x, starts)
            syy = np.add.reduceat(y * y, starts)
            sxy = np.add.reduceat(x * y, starts)
            with np.errstate(invalid="ignore", divide="ignore"):
                num = cnt * sxy - sx * sy
                den = np.sqrt(cnt * sxx - sx * sx) * np.sqrt(cnt * syy - sy * sy)
                r = num / den
            r[cnt < 2] = np.nan
            out[f"acf{k}"] = r
        return pd.DataFrame(out)

    return (
        ds.map_batches(tag, batch_format="pandas", batch_size=None)
        .groupby("_part")
        .map_groups(finish, batch_format="pandas")
    )


def hurst_stats(chunk_ds):
    """Rescaled-range Hurst exponent per packed chunk row
    (`functions/tsanalysis.hurst_rs` — dyadic window ladder, one
    vectorized reshape pass per size). Long-memory audit for series
    selection: H ~ 0.5 = no memory, H -> 1 = persistent/trending,
    H < 0.5 = mean-reverting. Cheap closure state, so a plain task
    map (no actor pool spin-up)."""
    from ..functions.tsanalysis import hurst_rs

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        hs = np.empty(len(batch), dtype=np.float64)
        ks = np.empty(len(batch), dtype=np.int64)
        ns = np.empty(len(batch), dtype=np.int64)
        for i, vals in enumerate(batch["values"]):
            v = np.asarray(vals, dtype=np.float64)
            v = v[np.isfinite(v)]
            hs[i], ks[i] = hurst_rs(v)
            ns[i] = len(v)
        out = batch[["conv_id", "chunk_idx"]].copy()
        out["n_points"] = ns
        out["hurst"] = hs
        out["n_sizes"] = ks
        return out

    return chunk_ds.map_batches(f, batch_format="pandas", batch_size=128)


class ThetaForecaster:
    """Classical Theta-method forecast (Assimakopoulos & Nikolopoulos,
    IJF 2000; the M3 winner) per packed chunk row, batched time-major:
    rows are bucketed by series length inside each batch so the SES
    recursion runs once over T with vector ops across series.

    Per chunk series x (gap-filled, finite): fit the OLS line
    ``a0 + b*t`` (the theta=0 line), build the theta=2 line
    ``z = 2x - line``, smooth z with SES(alpha), and forecast
    ``fc_h = 0.5 * (line(T-1+h) + ses(z))`` for h=1..horizon.

    Every row also carries ``cross_err``: the max abs difference
    between that direct two-line forecast and the independent
    Hyndman & Billah (IJF 2003) algebraic form
    ``ses(x) + (b/2)*h + (b/2)*(1-a)(1-(1-a)^(T-1))/a`` obtained by
    pushing SES linearity through ``z = 2x - line`` with the exact
    closed-form SES of a deterministic line. The two derivations share
    no code path, so cross_err ~ 1e-12 certifies both."""

    def __init__(self, alpha: float = 0.5, horizon: int = 8):
        if not 0.0 < alpha <= 1.0:
            raise ValueError(f"alpha must be in (0, 1], got {alpha}")
        self.alpha, self.horizon = float(alpha), int(horizon)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n, H, a = len(batch), self.horizon, self.alpha
        slope = np.full(n, np.nan)
        intercept = np.full(n, np.nan)
        ses_x = np.full(n, np.nan)
        cross = np.full(n, np.nan)
        fc = [np.full(H, np.nan)] * n
        valid = np.zeros(n, dtype=bool)
        series = [np.asarray(v, dtype=np.float64) for v in batch["values"]]
        lens = np.asarray([len(v) for v in series])
        for L in np.unique(lens):
            if L < 3:
                continue
            rows = np.flatnonzero(lens == L)
            x = np.stack([series[i] for i in rows])      # (m, L)
            t = np.arange(L, dtype=np.float64)
            tbar = t.mean()
            dt = t - tbar
            sxx = float((dt * dt).sum())
            b = (x @ dt) / sxx                            # (m,)
            a0 = x.mean(axis=1) - b * tbar
            line = a0[:, None] + b[:, None] * t           # (m, L)
            z = 2.0 * x - line
            lz, lx = z[:, 0].copy(), x[:, 0].copy()
            for k in range(1, L):                         # time-major scan
                lz += a * (z[:, k] - lz)
                lx += a * (x[:, k] - lx)
            h = np.arange(1, H + 1, dtype=np.float64)
            direct = 0.5 * ((a0[:, None] + b[:, None] * (L - 1 + h)) + lz[:, None])
            # independent algebraic form (Hyndman & Billah 2003)
            c = b * (1.0 - a) * (1.0 - (1.0 - a) ** (L - 1)) / a
            alg = lx[:, None] + 0.5 * b[:, None] * h + 0.5 * c[:, None]
            scale = np.maximum(np.abs(direct), 1.0)
            cr = np.max(np.abs(direct - alg) / scale, axis=1)
            slope[rows], intercept[rows], ses_x[rows] = b, a0, lx
            cross[rows] = cr
            for j, r in enumerate(rows):
                fc[r] = direct[j]
            valid[rows] = True
        out = batch[["conv_id", "chunk_idx", "n_points"]].copy()
        out["slope"] = slope
        out["intercept"] = intercept
        out["ses_level"] = ses_x
        out["theta_forecast"] = fc
        out["cross_err"] = cross
        out["theta_valid"] = valid
        return out


class ARYuleWalker:
    """AR(2) fit per packed chunk row via the Yule-Walker equations
    (Yule 1927; Walker 1931; Box & Jenkins ch. 3) — the parametric
    complement to the nonparametric Theta/Croston/Holt forecasters:
    it recovers the process DYNAMICS (phi1, phi2), not just a level.

    Fully vectorized: rows are bucketed by length, biased
    autocovariances c0..c2 come from two shifted dot products, and the
    2x2 Toeplitz solve is the explicit closed form

        phi1 = c1*(c0 - c2) / (c0^2 - c1^2)
        phi2 = (c2*c0 - c1^2) / (c0^2 - c1^2)

    Emits the innovation variance ``sigma2 = c0 - phi1*c1 - phi2*c2``,
    the 1-step forecast ``mean + phi1*(x[-1]-mean) + phi2*(x[-2]-mean)``
    and a stationarity flag (phi2 + phi1 < 1, phi2 - phi1 < 1,
    |phi2| < 1 — the AR(2) admissibility triangle). Constant series
    (c0 == 0) are flagged invalid."""

    MIN_LEN = 8

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        phi1 = np.full(n, np.nan)
        phi2 = np.full(n, np.nan)
        sigma2 = np.full(n, np.nan)
        fc1 = np.full(n, np.nan)
        valid = np.zeros(n, dtype=bool)
        stationary = np.zeros(n, dtype=bool)
        series = [np.asarray(v, dtype=np.float64) for v in batch["values"]]
        lens = np.asarray([len(v) for v in series])
        for L in np.unique(lens):
            if L < self.MIN_LEN:
                continue
            rows = np.flatnonzero(lens == L)
            x = np.stack([series[i] for i in rows])        # (m, L)
            mu = x.mean(axis=1)
            xc = x - mu[:, None]
            c0 = (xc * xc).sum(axis=1) / L
            c1 = (xc[:, 1:] * xc[:, :-1]).sum(axis=1) / L
            c2 = (xc[:, 2:] * xc[:, :-2]).sum(axis=1) / L
            det = c0 * c0 - c1 * c1
            ok = (c0 > 0) & (det > 0)
            with np.errstate(divide="ignore", invalid="ignore"):
                p1 = np.where(ok, c1 * (c0 - c2) / det, np.nan)
                p2 = np.where(ok, (c2 * c0 - c1 * c1) / det, np.nan)
            phi1[rows], phi2[rows] = p1, p2
            sigma2[rows] = np.where(ok, c0 - p1 * c1 - p2 * c2, np.nan)
            fc1[rows] = np.where(
                ok,
                mu + p1 * (x[:, -1] - mu) + p2 * (x[:, -2] - mu),
                np.nan,
            )
            valid[rows] = ok
            stationary[rows] = ok & (p2 + p1 < 1) & (p2 - p1 < 1) & (
                np.abs(p2) < 1
            )
        out = batch[["conv_id", "chunk_idx", "n_points"]].copy()
        out["phi1"] = phi1
        out["phi2"] = phi2
        out["sigma2"] = sigma2
        out["forecast_1"] = fc1
        out["ar_valid"] = valid
        out["ar_stationary"] = stationary
        return out


def ar_yule_walker(chunk_ds, concurrency: int = 4):
    """AR(2) Yule-Walker fit per packed chunk row."""
    return chunk_ds.map_batches(
        ARYuleWalker, batch_format="pandas", batch_size=256,
        concurrency=concurrency,
    )


class CrostonForecaster:
    """Croston's method (Croston, Oper. Res. Q. 1972) for INTERMITTENT
    series per packed chunk row — the estimator for sparse count
    series (most minutes zero) where SES/Theta smear demand into the
    gaps. Splits each series into non-zero demand sizes z and
    inter-demand intervals p, smooths both with SES(alpha), and
    forecasts rate = z_level / p_level per period, plus the
    Syntetos-Boylan (IJF 2005) bias-corrected variant
    ``(1 - alpha/2) * rate``.

    The final SES level is the closed-form geometric dot product
    ``(1-a)^(m-1) x_0 + sum_j a (1-a)^(m-1-j) x_j`` — no sequential
    scan, fully vectorized per series, and underflow of the oldest
    weights is benign. A series with a demand every m-th step of
    constant size q yields rate exactly q/m (the planted check the
    query asserts)."""

    def __init__(self, alpha: float = 0.2):
        if not 0.0 < alpha <= 1.0:
            raise ValueError(f"alpha must be in (0, 1], got {alpha}")
        self.alpha = float(alpha)

    @staticmethod
    def _ses_final(x: np.ndarray, a: float) -> float:
        m = len(x)
        w = np.empty(m)
        w[0] = (1.0 - a) ** (m - 1)
        if m > 1:
            w[1:] = a * (1.0 - a) ** np.arange(m - 2, -1, -1, dtype=np.float64)
        return float(w @ x)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        a = self.alpha
        n = len(batch)
        rate = np.full(n, np.nan)
        rate_sba = np.full(n, np.nan)
        z_level = np.full(n, np.nan)
        p_level = np.full(n, np.nan)
        n_demands = np.zeros(n, dtype=np.int64)
        valid = np.zeros(n, dtype=bool)
        for i, vals in enumerate(batch["values"]):
            x = np.asarray(vals, dtype=np.float64)
            x = np.where(np.isfinite(x), x, 0.0)
            nz = np.flatnonzero(x != 0.0)
            n_demands[i] = len(nz)
            if len(nz) < 2:
                continue
            z = x[nz]
            p = np.diff(nz).astype(np.float64)
            p = np.concatenate([[float(nz[0] + 1)], p])
            lz = self._ses_final(z, a)
            lp = self._ses_final(p, a)
            z_level[i], p_level[i] = lz, lp
            rate[i] = lz / lp
            rate_sba[i] = (1.0 - a / 2.0) * lz / lp
            valid[i] = True
        out = batch[["conv_id", "chunk_idx", "n_points"]].copy()
        out["n_demands"] = n_demands
        out["z_level"] = z_level
        out["p_level"] = p_level
        out["croston_rate"] = rate
        out["croston_rate_sba"] = rate_sba
        out["croston_valid"] = valid
        return out


def croston_forecast(chunk_ds, alpha: float = 0.2, concurrency: int = 4):
    """Croston / Syntetos-Boylan intermittent-demand rate per packed
    chunk row."""
    return chunk_ds.map_batches(
        CrostonForecaster, fn_constructor_kwargs={"alpha": alpha},
        batch_format="pandas", batch_size=256, concurrency=concurrency,
    )


def theta_forecast(chunk_ds, alpha: float = 0.5, horizon: int = 8,
                   concurrency: int = 4):
    """Theta-method forecast per packed chunk row (self-certifying via
    the Hyndman-Billah algebraic identity carried in ``cross_err``)."""
    return chunk_ds.map_batches(
        ThetaForecaster,
        fn_constructor_kwargs={"alpha": alpha, "horizon": horizon},
        batch_format="pandas", batch_size=256, concurrency=concurrency,
    )


def perm_entropy_stats(chunk_ds, m: int = 3):
    """Normalized permutation entropy per packed chunk row
    (`functions/tsanalysis.permutation_entropy` — vectorized
    6-pattern path). Complexity audit for series selection: ~0 =
    deterministic order structure, -> 1 = iid noise. Cheap closure
    state, so a plain task map."""
    from ..functions.tsanalysis import permutation_entropy

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        pe = np.empty(len(batch), dtype=np.float64)
        nw = np.empty(len(batch), dtype=np.int64)
        for i, vals in enumerate(batch["values"]):
            v = np.asarray(vals, dtype=np.float64)
            v = v[np.isfinite(v)]
            pe[i], nw[i] = permutation_entropy(v, m=m)
        out = batch[["conv_id", "chunk_idx"]].copy()
        out["n_windows"] = nw
        out["perm_entropy"] = pe
        return out

    return chunk_ds.map_batches(f, batch_format="pandas", batch_size=128)


def embedding_conditioned_precondition(
    chunk_ds,
    n_clusters: int = 4,
    order: int = 2,
    feat_lags: int = 8,
    iters: int = 6,
    seed: int = 11,
    concurrency: int = 4,
):
    """Cluster-conditioned precondition coefficients — the engine's
    non-torch analogue of the reference's ``EmbeddingPrecondition``
    (uni2ts/src/uni2ts/module/embedding_precondition.py:30-288).
    There, a learned per-series embedding maps through a small network
    to that series' precondition coefficients; here the series' ACF
    signature (its "embedding") maps through distributed k-means to a
    cluster, and the cluster's taps are the EXACT Yule-Walker solution
    of the cluster's POOLED autocovariance moments — conditioning
    without SGD, in closed form, streaming end to end.

    Distributed shape (every leg bounded):

    1. featurize (``map_batches``): per chunk, the L2-normalized
       ACF(1..feat_lags) vector as ``embedding`` plus exact centered
       cross-product partials ``c_l = sum_t d_t d_{t-l}`` and pair
       counts for lags 0..order (driver never sees values);
    2. ``kmeans_fit_distributed`` over the embeddings (centroids
       broadcast per iter), ``kmeans_predict`` assigns clusters;
    3. per-(cluster, lag) moment merge — k x (order+1) tiny rows to
       the driver — Yule-Walker solve per cluster AND one pooled
       GLOBAL solve (the LearnablePrecondition-style single filter,
       kept as the comparison baseline);
    4. apply stage: cluster taps broadcast via ``ray.put``; each chunk
       whitens with ITS cluster's taps and with the global taps,
       emitting both variance ratios (the conditioning win is
       ``ratio_cluster <= ratio_global`` on regime-mixed corpora).

    Returns chunk rows + ``(cluster, cluster_coeffs, whitened_var_
    ratio_cluster, whitened_var_ratio_global, roundtrip_err)``.
    """
    import ray

    from ..functions.precondition import forward_precondition, reverse_precondition
    from .similarity import kmeans_fit_distributed, kmeans_predict

    L = max(feat_lags, order)

    def featurize(batch: pd.DataFrame) -> pd.DataFrame:
        embs, moms, ns = [], [], []
        for vals in batch["values"]:
            v = np.asarray(vals, dtype=np.float64)
            v = v[~np.isnan(v)]
            if len(v) < 2 * L + 2:
                # short chunk: pure constant-axis embedding (clusters
                # with the near-white population), zero moment weight
                e = np.zeros(feat_lags + 1)
                e[-1] = 1.0
                embs.append(e)
                moms.append(np.zeros(L + 1))
                ns.append(np.zeros(L + 1))
                continue
            d = v - v.mean()
            c = np.array(
                [float(np.dot(d[l:], d[: len(d) - l])) for l in range(L + 1)]
            )
            n_pairs = np.array([float(len(d) - l) for l in range(L + 1)])
            acf = c[1 : feat_lags + 1] / c[0] if c[0] > 0 else np.zeros(feat_lags)
            # homogeneous coordinate: the downstream k-means is
            # SPHERICAL (it re-normalizes every vector), which would
            # erase ACF magnitude and cluster by shape alone — a
            # strongly-autocorrelated AR series and a nearly-white one
            # with the same decay DIRECTION would merge.  Appending a
            # constant 1 lets the normalized direction encode
            # magnitude: weak-ACF chunks point at the constant axis,
            # strong-ACF chunks point along their ACF.
            e = np.concatenate([acf, [1.0]])
            embs.append(e / float(np.linalg.norm(e)))
            # pool NORMALIZED autocovariances (per-chunk acf weighted
            # by pair counts): heterogeneous-scale series would
            # otherwise let one high-variance chunk dominate a
            # cluster's pooled filter (the reference scales before
            # preconditioning for the same reason).
            moms.append(c / c[0] * n_pairs[0] if c[0] > 0 else np.zeros(L + 1))
            ns.append(np.full(L + 1, n_pairs[0]) if c[0] > 0 else np.zeros(L + 1))
        out = batch[["conv_id", "chunk_idx"]].copy()
        out["embedding"] = embs
        out["_mom"] = moms
        out["_npairs"] = ns
        return out

    feats = chunk_ds.map_batches(
        featurize, batch_format="pandas", batch_size=None
    ).materialize()

    cents, _hist = kmeans_fit_distributed(
        feats, n_clusters=n_clusters, iters=iters, seed=seed
    )
    assigned = kmeans_predict(feats, cents).materialize()

    def moment_partial(batch: pd.DataFrame) -> pd.DataFrame:
        cl = batch["cluster"].to_numpy(np.int64)
        mom = np.stack([np.asarray(m, np.float64) for m in batch["_mom"]])
        npr = np.stack([np.asarray(m, np.float64) for m in batch["_npairs"]])
        k = int(cl.max()) + 1 if len(cl) else 0
        rows = []
        for c in range(k):
            sel = cl == c
            if sel.any():
                rows.append((c, mom[sel].sum(axis=0), npr[sel].sum(axis=0)))
        return pd.DataFrame(
            {
                "cluster": [r[0] for r in rows],
                "mom": [r[1] for r in rows],
                "npairs": [r[2] for r in rows],
            }
        )

    parts = assigned.map_batches(
        moment_partial, batch_format="pandas", batch_size=None
    ).to_pandas()  # blocks x k tiny rows

    def _yw_from_acov(acov: np.ndarray) -> np.ndarray:
        if acov[0] <= 0:
            return np.zeros(order)
        idx = np.abs(np.subtract.outer(np.arange(order), np.arange(order)))
        R = acov[idx]
        r = acov[1 : order + 1]
        try:
            return np.linalg.solve(R, r)
        except np.linalg.LinAlgError:
            return np.zeros(order)

    coeffs = np.zeros((n_clusters, order))
    g_mom = np.zeros(L + 1)
    g_n = np.zeros(L + 1)
    for c in range(n_clusters):
        sel = parts[parts["cluster"] == c]
        if not len(sel):
            continue
        mom = np.stack(sel["mom"].to_numpy()).sum(axis=0)
        npr = np.stack(sel["npairs"].to_numpy()).sum(axis=0)
        g_mom += mom
        g_n += npr
        acov = np.where(npr > 0, mom / np.maximum(npr, 1), 0.0)
        coeffs[c] = _yw_from_acov(acov)
    g_acov = np.where(g_n > 0, g_mom / np.maximum(g_n, 1), 0.0)
    global_coeffs = _yw_from_acov(g_acov)

    coeffs_ref = ray.put((coeffs, global_coeffs))

    # re-join the cluster id to the original chunk rows by (conv_id,
    # chunk_idx): both sides are conv-partitioned already, so a
    # partition-merge join would also work — but the assignment table
    # is (id, cluster) only and the apply stage needs the VALUES, so
    # we map over the original chunks with a broadcast id->cluster
    # lookup (bounded: one int per chunk, the same cardinality as the
    # chunk table itself — at larger scale switch to the
    # partition_merge_join on conv hash; stated, not hidden).
    amap = assigned.select_columns(["conv_id", "chunk_idx", "cluster"]).to_pandas()
    amap_ref = ray.put(
        {(r.conv_id, int(r.chunk_idx)): int(r.cluster) for r in amap.itertuples()}
    )

    class ApplyStage:
        def __init__(self, coeffs_ref, amap_ref):
            self.coeffs, self.global_coeffs = ray.get(coeffs_ref)
            self.amap = ray.get(amap_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            cl_o, cc_o, rc_o, rg_o, err_o = [], [], [], [], []
            for conv, ci, vals in zip(
                batch["conv_id"], batch["chunk_idx"], batch["values"]
            ):
                v = np.asarray(vals, dtype=np.float64)
                v = v[~np.isnan(v)]
                cl = self.amap.get((conv, int(ci)), -1)
                a = self.coeffs[cl] if cl >= 0 else np.zeros(order)
                if len(v) < 2 * order + 2:
                    cl_o.append(cl); cc_o.append(a)
                    rc_o.append(1.0); rg_o.append(1.0); err_o.append(0.0)
                    continue
                vx = float(np.var(v))

                def ratio(taps):
                    y = forward_precondition(v, -taps)
                    r = y[order:]
                    return float(np.var(r) / vx) if vx > 0 else 1.0

                y = forward_precondition(v, -a)
                err = float(np.max(np.abs(reverse_precondition(y, -a) - v)))
                cl_o.append(cl); cc_o.append(a)
                rc_o.append(ratio(a)); rg_o.append(ratio(self.global_coeffs))
                err_o.append(err)
            out = batch.drop(
                columns=[c for c in ("ts", "values") if c in batch.columns]
            ).copy()
            out["cluster"] = np.asarray(cl_o, dtype=np.int64)
            out["cluster_coeffs"] = cc_o
            out["whitened_var_ratio_cluster"] = np.asarray(rc_o, np.float64)
            out["whitened_var_ratio_global"] = np.asarray(rg_o, np.float64)
            out["roundtrip_err"] = np.asarray(err_o, np.float64)
            return out

    applied = chunk_ds.map_batches(
        ApplyStage,
        fn_constructor_args=(coeffs_ref, amap_ref),
        batch_format="pandas",
        batch_size=256,
        concurrency=concurrency,
    )
    return applied, coeffs, global_coeffs
