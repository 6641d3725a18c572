"""Irregular-sampling temporal aggregates: time-weighted averages,
counter-reset rates, interval-union coverage and civil-time (timezone)
calendar rollups.

These are the continuous-aggregate cousins the 1m/1h/1d tumbling
rollups (stages/rollup.py) cannot express: their value depends on the
*spacing* of observations, not just their bucket membership — the
TimescaleDB `time_weight` / Prometheus `increase()` operator class over
the reference's irregular inter-turn gap model
(`uni2ts/src/uni2ts/transform/pad.py:60-104` treats the same gaps as
mask/pad state; here they become integration weights).

Scale path shared by the per-key operators: ONE int-keyed hash shuffle
of a narrow column set, then a single numpy lexsort + segmented-scan
pass per partition (per-key Python overhead is O(P), not O(#keys)).
All sums accumulate in scaled int64 (inputs are fixed-decimal, spans
bounded by the retention window) so results are EXACT — float
accumulation-order differences vs a SQL engine vanish.  Per-key output
is one row, so the result is ~|keys| rows regardless of input size.

Partitioning assumption: one key's rows fit one partition (same
contract as rollup_transcripts; a single conversation/user is bounded
by the retention window, not by corpus size).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _with_part(ds, key: str, keep: list[str], num_partitions: int):
    """Project to `keep` and tag each row with a key-hash partition id."""
    P = num_partitions

    def add_part(batch: pa.Table) -> pa.Table:
        part = (
            pd.util.hash_pandas_object(batch[key].to_pandas(), index=False).to_numpy()
            % P
        ).astype(np.int32)
        return batch.append_column("_part", pa.array(part))

    return ds.select_columns(keep).map_batches(
        add_part, batch_format="pyarrow", batch_size=None
    )


def _segments(codes_sorted: np.ndarray):
    """Segment starts + lengths of a sorted code array."""
    n = len(codes_sorted)
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = codes_sorted[1:] != codes_sorted[:-1]
    starts = np.flatnonzero(new)
    lengths = np.diff(np.append(starts, n))
    return new, starts, lengths


def _ts_us(col: pd.Series) -> np.ndarray:
    return col.to_numpy().astype("datetime64[us]").astype(np.int64)


def time_weighted_avg(
    ds,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value_scale: int = 100,
    num_partitions: int | None = None,
):
    """Per-key LOCF time-weighted average over an irregular series
    (TimescaleDB ``time_weight('LOCF')`` semantics): each observation
    holds its value until the next one, so

        twa(key) = sum(v_i * (t_{i+1} - t_i)) / sum(t_{i+1} - t_i)

    over consecutive pairs in ``order_cols`` order.  Keys with fewer
    than 2 observations are dropped (zero integration time).

    Exactness: v is scaled to int64 (fixed-decimal contract), dt is
    int64 microseconds; per-key sum(v_scaled*dt) is bounded by
    v_max_scaled * retention_span_us (~8.5e16 at the test data's
    bounds), inside int64.  The final division is the only float op,
    so any engine computing the same integer sums gets the identical
    double.

    Output: one row per key — (key, n_samples:int64, span_s:float,
    twa:float).
    """
    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)
    keep = list(dict.fromkeys((key, *order_cols, ts_col, value_col)))
    ds = _with_part(ds, key, keep, P)

    def partition_fn(df: pd.DataFrame) -> pd.DataFrame:
        empty = {
            key: pd.Series([], dtype=df[key].dtype if len(df) else np.int64),
            "n_samples": pd.Series([], dtype=np.int64),
            "span_s": pd.Series([], dtype=np.float64),
            "twa": pd.Series([], dtype=np.float64),
        }
        if len(df) == 0:
            return pd.DataFrame(empty)
        codes, uniques = pd.factorize(df[key], sort=False)
        sort_keys = [
            _ts_us(df[c]) if c == ts_col else df[c].to_numpy()
            for c in reversed(order_cols)
        ]
        order = np.lexsort((*sort_keys, codes))
        codes_s = codes[order]
        ts = _ts_us(df[ts_col])[order]
        v = np.round(df[value_col].to_numpy(dtype=np.float64)[order] * value_scale).astype(
            np.int64
        )
        new, starts, lengths = _segments(codes_s)
        n = len(ts)
        # pairwise dt within segment: dt_i = ts_{i+1} - ts_i, last row of
        # each segment contributes nothing
        dt = np.zeros(n, dtype=np.int64)
        dt[:-1] = ts[1:] - ts[:-1]
        seg_end = np.zeros(n, dtype=bool)
        seg_end[starts + lengths - 1] = True
        dt[seg_end] = 0
        num = np.add.reduceat(v * dt, starts)
        den = np.add.reduceat(dt, starts)
        ok = den > 0
        if not ok.any():
            return pd.DataFrame(empty)
        out = pd.DataFrame(
            {
                key: np.asarray(uniques)[codes_s[starts]][ok],
                "n_samples": lengths.astype(np.int64)[ok],
                "span_s": den[ok] / 1e6,
                "twa": (num[ok].astype(np.float64) / den[ok].astype(np.float64))
                / value_scale,
            }
        )
        return out

    return ds.groupby("_part").map_groups(partition_fn, batch_format="pandas")


def counter_increase(
    ds,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value_scale: int = 100,
    num_partitions: int | None = None,
):
    """Per-key monotonic-counter total increase with reset handling
    (Prometheus ``increase()`` over a counter that can restart at 0):
    scanning in ``order_cols`` order,

        inc_i = v_i - v_{i-1}   if v_i >= v_{i-1}   (normal step)
              = v_i             otherwise           (reset: counter
                                                     restarted below
                                                     the previous
                                                     sample)

    and total_increase(key) = sum(inc_i) over i >= 1 (the first sample
    is the baseline, not an increase).  Exact in scaled int64.

    Output: (key, n_samples:int64, n_resets:int64,
    total_increase:float).
    """
    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)
    keep = list(dict.fromkeys((key, *order_cols, ts_col, value_col)))
    ds = _with_part(ds, key, keep, P)

    def partition_fn(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            # key dtype from the (zero-row) input — a hardcoded int64
            # empty mismatches string keys and poisons block schemas
            return pd.DataFrame(
                {
                    key: df[key] if key in df else pd.Series([], dtype=np.int64),
                    "n_samples": pd.Series([], dtype=np.int64),
                    "n_resets": pd.Series([], dtype=np.int64),
                    "total_increase": pd.Series([], dtype=np.float64),
                }
            )
        codes, uniques = pd.factorize(df[key], sort=False)
        sort_keys = [
            _ts_us(df[c]) if c == ts_col else df[c].to_numpy()
            for c in reversed(order_cols)
        ]
        order = np.lexsort((*sort_keys, codes))
        codes_s = codes[order]
        v = np.round(df[value_col].to_numpy(dtype=np.float64)[order] * value_scale).astype(
            np.int64
        )
        new, starts, lengths = _segments(codes_s)
        n = len(v)
        prev = np.empty(n, dtype=np.int64)
        prev[0] = 0
        prev[1:] = v[:-1]
        first = new  # first sample of each key: no increase
        reset = (~first) & (v < prev)
        inc = np.where(first, 0, np.where(reset, v, v - prev))
        out = pd.DataFrame(
            {
                key: np.asarray(uniques)[codes_s[starts]],
                "n_samples": lengths.astype(np.int64),
                "n_resets": np.add.reduceat(reset.astype(np.int64), starts),
                "total_increase": np.add.reduceat(inc, starts) / value_scale,
            }
        )
        return out

    return ds.groupby("_part").map_groups(partition_fn, batch_format="pandas")


def interval_coverage(
    ds,
    key: str = "user_id",
    start_col: str = "_iv_start_us",
    end_col: str = "_iv_end_us",
    num_partitions: int | None = None,
):
    """Per-key union-of-intervals coverage (gaps-and-islands): given
    half-open int64-microsecond intervals ``[start, end)`` per row,
    merge overlapping/touching intervals per key and report the total
    covered time and the number of merged islands.

    The caller derives the two int64 columns (e.g. ``ts`` and
    ``ts + duration``); keeping the operator on integer columns makes
    the arithmetic exact and the shuffle payload fixed-width.

    Vectorized islands: sort by (key, start, end), running max of end
    within key (cummax over end offset by a per-segment base so one
    global ``np.maximum.accumulate`` resets at key boundaries), island
    break where start > cummax of all previous ends.

    Output: (key, n_intervals:int64, n_islands:int64, covered_s:float).
    """
    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)
    keep = list(dict.fromkeys((key, start_col, end_col)))
    ds = _with_part(ds, key, keep, P)

    def partition_fn(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    key: df[key] if key in df else pd.Series([], dtype=np.int64),
                    "n_intervals": pd.Series([], dtype=np.int64),
                    "n_islands": pd.Series([], dtype=np.int64),
                    "covered_s": pd.Series([], dtype=np.float64),
                }
            )
        codes, uniques = pd.factorize(df[key], sort=False)
        s = df[start_col].to_numpy(dtype=np.int64)
        e = df[end_col].to_numpy(dtype=np.int64)
        order = np.lexsort((e, s, codes))
        codes_s = codes[order]
        s = s[order]
        e = e[order]
        new, starts, lengths = _segments(codes_s)
        # cummax of end that resets per segment: shift each segment into
        # its own disjoint value band, one global accumulate, shift back
        lo = min(int(s.min()), int(e.min()))
        hi = max(int(s.max()), int(e.max()))
        band = (hi - lo) + 1
        n_keys = len(starts)
        if n_keys * band < 2**62:
            base = codes_s.astype(np.int64) * band
            run_end = np.maximum.accumulate(e - lo + base) - base + lo
        else:
            # value-range x key-count too wide for the band trick
            # (possible when interval timestamps span years AND a
            # partition holds millions of keys): per-segment accumulate
            run_end = np.empty_like(e)
            ends = np.append(starts[1:], len(e))
            for a, b in zip(starts, ends):
                run_end[a:b] = np.maximum.accumulate(e[a:b])
        # island break: start beyond everything covered so far
        brk = new.copy()
        brk[1:] |= s[1:] > run_end[:-1]
        island = np.cumsum(brk) - 1
        i_starts = np.flatnonzero(brk)
        island_min_s = s[i_starts]  # sorted by start within key
        i_ends = np.append(i_starts[1:], len(s)) - 1
        island_max_e = run_end[i_ends]
        island_len = island_max_e - island_min_s
        island_key = codes_s[i_starts]
        k_new = np.empty(len(i_starts), dtype=bool)
        k_new[0] = True
        k_new[1:] = island_key[1:] != island_key[:-1]
        k_starts = np.flatnonzero(k_new)
        out = pd.DataFrame(
            {
                key: np.asarray(uniques)[island_key[k_starts]],
                "n_intervals": lengths.astype(np.int64),
                "n_islands": np.diff(np.append(k_starts, len(i_starts))).astype(
                    np.int64
                ),
                "covered_s": np.add.reduceat(island_len, k_starts) / 1e6,
            }
        )
        return out

    return ds.groupby("_part").map_groups(partition_fn, batch_format="pandas")


def local_day_rollup(
    ds,
    ts_col: str = "ts",
    tz: str = "America/New_York",
    value_col: str = "value",
    value_scale: int = 100,
):
    """Civil-time calendar rollup: bucket UTC instants by their LOCAL
    calendar date in an IANA timezone (DST-correct — local days are 23
    or 25 hours across transitions) and aggregate count + exact sum.

    Mergeable-partial shape: each batch collapses to at most
    |distinct local dates| rows of (date, n, scaled-sum) — only these
    fixed-width partials shuffle, never raw rows.

    Output: (local_date:str "YYYY-MM-DD", n_events:int64,
    sum_value:float) — the date is a string so SQL engines and Arrow
    agree on the hash representation.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = pd.DatetimeIndex(df[ts_col].to_numpy().astype("datetime64[us]"))
        local = ts.tz_localize("UTC").tz_convert(tz).tz_localize(None)
        day = local.strftime("%Y-%m-%d")
        sv = np.round(df[value_col].to_numpy(dtype=np.float64) * value_scale).astype(
            np.int64
        )
        g = pd.DataFrame({"local_date": day, "_n": 1, "_sv": sv}).groupby(
            "local_date", as_index=False
        )
        return g.sum()

    parts = ds.select_columns([ts_col, value_col]).map_batches(
        partial, batch_format="pandas", batch_size=None
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "local_date": [df["local_date"].iloc[0]],
                "n_events": [np.int64(df["_n"].sum())],
                "sum_value": [df["_sv"].to_numpy(dtype=np.int64).sum() / value_scale],
            }
        )

    return parts.groupby("local_date").map_groups(merge, batch_format="pandas")


def longest_streak(
    ds,
    key: str = "user_id",
    label_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_partitions: int | None = None,
):
    """Per-key longest run of consecutive equal labels (gaps-and-
    islands streak): order each key's rows by ``order_cols``, find the
    maximal runs of identical ``label_col``, and keep the best run per
    key under (length DESC, start_ts ASC, min_id ASC) — the SQL
    ``row_number() - row_number() over (partition by key, label)``
    islands idiom, computed as one segmented numpy pass.

    Scale path: one int-keyed narrow-column hash shuffle (same
    contract as :func:`time_weighted_avg`), one vectorized lexsort +
    run-length pass per partition; per-key output is one row.

    Output: (key, streak_len:int64, streak_type, start_ts:datetime64,
    min_event_id:int64) where min_event_id is the smallest id inside
    the winning run (a deterministic tie-break observable in SQL).
    """
    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)
    keep = list(dict.fromkeys((key, label_col, *order_cols)))
    ds = _with_part(ds, key, keep, P)

    def partition_fn(df: pd.DataFrame) -> pd.DataFrame:
        empty = {
            key: pd.Series([], dtype=df[key].dtype if len(df) else np.int64),
            "streak_len": pd.Series([], dtype=np.int64),
            "streak_type": pd.Series([], dtype=object),
            "start_ts": pd.Series([], dtype="datetime64[us]"),
            "min_event_id": pd.Series([], dtype=np.int64),
        }
        if len(df) == 0:
            return pd.DataFrame(empty)
        codes, uniques = pd.factorize(df[key], sort=False)
        sort_keys = [
            _ts_us(df[c]) if c == ts_col else df[c].to_numpy()
            for c in reversed(order_cols)
        ]
        order = np.lexsort((*sort_keys, codes))
        codes_s = codes[order]
        lab_codes = pd.factorize(df[label_col], sort=False)[0][order]
        ts = _ts_us(df[ts_col])[order]
        eid = df[id_col].to_numpy()[order]
        n = len(ts)
        # run break: key changes OR label changes
        brk = np.empty(n, dtype=bool)
        brk[0] = True
        brk[1:] = (codes_s[1:] != codes_s[:-1]) | (lab_codes[1:] != lab_codes[:-1])
        starts = np.flatnonzero(brk)
        lens = np.diff(np.append(starts, n))
        run_key = codes_s[starts]
        run_lab = lab_codes[starts]
        run_start_ts = ts[starts]  # first row of the run in order
        run_min_id = np.minimum.reduceat(eid, starts)
        # best run per key: (len desc, start_ts asc, min_id asc)
        pick = np.lexsort((run_min_id, run_start_ts, -lens, run_key))
        first = np.empty(len(pick), dtype=bool)
        rk = run_key[pick]
        first[0] = True
        first[1:] = rk[1:] != rk[:-1]
        w = pick[first]
        labels = pd.factorize(df[label_col], sort=False)[1]
        return pd.DataFrame(
            {
                key: np.asarray(uniques)[run_key[w]],
                "streak_len": lens[w].astype(np.int64),
                "streak_type": np.asarray(labels)[run_lab[w]],
                "start_ts": run_start_ts[w].astype("datetime64[us]"),
                "min_event_id": run_min_id[w].astype(np.int64),
            }
        )

    return ds.groupby("_part").map_groups(partition_fn, batch_format="pandas")
