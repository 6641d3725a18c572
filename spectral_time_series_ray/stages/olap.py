"""OLAP-style multi-level aggregates over event streams.

Three operator families the SQL surface of a retention/rollup engine
needs beyond plain tumbling rollups:

- ``grouping_sets_aggregate``: GROUP BY GROUPING SETS / ROLLUP / CUBE
  in two shuffle rounds — the finest level merges like any mergeable
  rollup, and every coarser level re-aggregates the (already tiny)
  finest aggregate, tagged with a set id, in ONE further shuffle.
- ``hopping_rollup``: overlapping (sliding) windows — each event is
  assigned to ``window/hop`` window starts by a vectorized Arrow
  shift, then merges exactly like a tumbling rollup. The shuffle
  carries per-batch partials, never the expanded rows.
- ``latest_state``: latest-wins compaction (the materialized UPSERT
  view of an event stream): one surviving row per key, chosen by a
  deterministic (ts, tiebreak...) DESC order, via per-batch keep-best
  partials and a hash-partitioned keep-best merge.

Reference parity: the reference materializes one summary row per
series (statistics over the full history — e.g. the train-stat pass in
`uni2ts/src/uni2ts/data/builder/simple.py:86-114`) and enumerates
overlapping crops over a grid (`uni2ts/src/uni2ts/transform/crop.py`);
these stages lift the same shapes to distributed whole-table
operators with DuckDB-matched semantics.

All three follow the repo-wide partition pattern: partial-aggregate
inside ``map_batches`` (fixed-width columns only), hash-bucket the
partials into ``partitions_for_input`` int partitions, and run one
vectorized pandas pass per partition — no Python loop ever touches a
row, and no stage materializes unbounded state on the driver.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .rollup import partitions_for_input

_US = {"s": 1_000_000, "m": 60_000_000, "h": 3_600_000_000, "d": 86_400_000_000}


def _interval_us(spec: str) -> int:
    """'15m' / '1h' / '30s' / '1d' -> microseconds."""
    unit = spec[-1]
    if unit not in _US:
        raise ValueError(f"unsupported interval {spec!r}")
    return int(spec[:-1]) * _US[unit]


def _part_of(frame: pd.DataFrame, cols: Sequence[str], n_parts: int) -> np.ndarray:
    """Partition id from the combined row hash of ``cols``."""
    h = pd.util.hash_pandas_object(frame[list(cols)], index=False).to_numpy()
    return (h >> np.uint64(40)).astype(np.int64) % n_parts


# ------------------------------------------------- GROUPING SETS


def grouping_sets_aggregate(
    ds,
    keys: Sequence[str],
    value_col: str,
    sets: Iterable[Sequence[str]],
    all_label: str = "<all>",
    value_scale: int = 100,
):
    """GROUP BY GROUPING SETS over string key columns.

    Returns one row per group per requested set with ``n_events``
    (count) and ``sum_value`` (exact int64-scaled sum, emitted as
    float rounded to 6 — bit-identical to DuckDB for
    fixed-``value_scale``-decimal inputs). Grouped-out key columns
    carry ``all_label`` (mirror with ``coalesce(col, all_label)`` on
    the SQL side).

    Scale shape: shuffle 1 merges the finest level (every requested
    set is a coarsening of ``keys``); the merged finest aggregate —
    bounded by the distinct key-combination count, not the row count —
    is then re-aggregated for ALL coarser sets in shuffle 2, each row
    tagged with its set id so one exchange serves every level.
    """
    keys = list(keys)
    sets = [tuple(s) for s in sets]
    for s in sets:
        if not set(s) <= set(keys):
            raise ValueError(f"set {s} not a subset of keys {keys}")
    n_parts = partitions_for_input(None)

    def empty() -> pd.DataFrame:
        cols = {k: pd.Series([], dtype=object) for k in keys}
        cols["_n"] = pd.Series([], dtype=np.int64)
        cols["_s"] = pd.Series([], dtype=np.int64)
        cols["_part"] = pd.Series([], dtype=np.int64)
        return pd.DataFrame(cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return empty()
        t = df[keys].copy()
        t["_n"] = np.int64(1)
        t["_s"] = np.round(
            df[value_col].to_numpy(dtype=np.float64) * value_scale
        ).astype(np.int64)
        # dropna=False: SQL GROUP BY keeps NULL key groups (and their
        # contribution to coarser rollup rows); pandas' default would
        # silently drop such rows from EVERY level incl. the total
        g = t.groupby(keys, sort=False, as_index=False, dropna=False).agg(
            _n=("_n", "sum"), _s=("_s", "sum")
        )
        g["_part"] = _part_of(g, keys, n_parts)
        return g

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=None)

    def merge_finest(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return empty().drop(columns=["_part"])
        return g.groupby(keys, sort=False, as_index=False, dropna=False).agg(
            _n=("_n", "sum"), _s=("_s", "sum")
        )

    finest = (
        partials.groupby("_part")
        .map_groups(merge_finest, batch_format="pandas")
        .materialize()
    )

    coarse_sets = [s for s in sets if set(s) != set(keys)]
    outputs = []
    if any(set(s) == set(keys) for s in sets):
        outputs.append(finest)

    if coarse_sets:

        def expand(df: pd.DataFrame) -> pd.DataFrame:
            frames = []
            for si, s in enumerate(coarse_sets):
                t = df.copy()
                for kcol in keys:
                    if kcol not in s:
                        t[kcol] = all_label
                g = t.groupby(keys, sort=False, as_index=False, dropna=False).agg(
                    _n=("_n", "sum"), _s=("_s", "sum")
                )
                g["_set"] = np.int64(si)
                frames.append(g)
            if not frames or not len(df):
                e = empty().drop(columns=["_part"])
                e["_set"] = pd.Series([], dtype=np.int64)
                e["_part"] = pd.Series([], dtype=np.int64)
                return e
            out = pd.concat(frames, ignore_index=True)
            out["_part"] = _part_of(out, ["_set", *keys], n_parts)
            return out

        coarse_partials = finest.map_batches(
            expand, batch_format="pandas", batch_size=None
        )

        def merge_coarse(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g):
                e = empty().drop(columns=["_part"])
                return e
            m = g.groupby(["_set", *keys], sort=False, as_index=False, dropna=False).agg(
                _n=("_n", "sum"), _s=("_s", "sum")
            )
            return m.drop(columns=["_set"])

        outputs.append(
            coarse_partials.groupby("_part").map_groups(
                merge_coarse, batch_format="pandas"
            )
        )

    merged = outputs[0]
    for extra in outputs[1:]:
        merged = merged.union(extra)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df[keys].copy()
        out["n_events"] = df["_n"].astype(np.int64)
        out["sum_value"] = np.round(
            df["_s"].to_numpy(dtype=np.float64) / value_scale, 6
        )
        return out

    return merged.map_batches(finish, batch_format="pandas", batch_size=None)


# ------------------------------------------------- hopping windows


def hopping_rollup(
    ds,
    window: str = "1h",
    hop: str = "15m",
    ts_col: str = "ts",
    value_col: str = "value",
    value_scale: int = 100,
    out_col: str = "window_start",
):
    """Overlapping-window rollup: every ``hop``-aligned window of
    length ``window`` that contains the event. ``window`` must be a
    multiple of ``hop``; an event lands in ``window/hop`` windows.

    Vectorized assignment: floor ts to the hop grid once, then the k
    window starts are ``grid - j*hop`` for j in [0, k) — an Arrow
    scalar subtract per shift, no per-row work. The expanded rows
    never shuffle: each batch pre-aggregates (n, scaled sum) per
    window start and only those partials enter the hash-partitioned
    merge.
    """
    win_us, hop_us = _interval_us(window), _interval_us(hop)
    if win_us % hop_us:
        raise ValueError(f"window {window} not a multiple of hop {hop}")
    k = win_us // hop_us
    n_parts = partitions_for_input(None)
    hop_min = hop_us // 60_000_000
    if hop_us % 60_000_000 == 0 and hop_min >= 1:
        floor_kw = {"multiple": int(hop_min), "unit": "minute"}
    else:
        floor_kw = {"multiple": int(hop_us // 1_000_000), "unit": "second"}

    def partial(batch: pa.Table) -> pa.Table:
        grid = pc.floor_temporal(batch[ts_col], **floor_kw)
        base = grid.to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        sv = np.round(
            batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
            * value_scale
        ).astype(np.int64)
        ws = (base[None, :] - (np.arange(k, dtype=np.int64) * hop_us)[:, None]).ravel()
        sv_k = np.tile(sv, k)
        codes, uniques = pd.factorize(ws, sort=False)
        nun = len(uniques)
        n = np.bincount(codes, minlength=nun).astype(np.int64)
        s = np.zeros(nun, dtype=np.int64)
        np.add.at(s, codes, sv_k)
        part = (uniques.astype(np.uint64) >> np.uint64(13)).astype(np.int64) % n_parts
        return pa.table(
            {
                "_ws": pa.array(uniques, pa.int64()),
                "_n": pa.array(n, pa.int64()),
                "_s": pa.array(s, pa.int64()),
                "_part": pa.array(part, pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("_ws", sort=False, as_index=False).agg(
            _n=("_n", "sum"), _s=("_s", "sum")
        )
        out = pd.DataFrame(
            {
                out_col: m["_ws"].to_numpy().astype("datetime64[us]"),
                "n_events": m["_n"].astype(np.int64),
                "sum_value": np.round(
                    m["_s"].to_numpy(dtype=np.float64) / value_scale, 6
                ),
            }
        )
        return out

    return partials.groupby("_part").map_groups(merge, batch_format="pandas")


# ------------------------------------------------- latest-wins compaction


def latest_state(
    ds,
    key: str = "user_id",
    order_cols: Sequence[str] = ("ts", "event_id"),
    keep_cols: Sequence[str] | None = None,
):
    """Latest-wins compaction: the one surviving row per ``key`` under
    ``ORDER BY order_cols DESC`` — the materialized view of an UPSERT /
    CDC stream, or "current session state" per conversation.

    ``order_cols`` must be a deterministic total order within a key
    (include a unique id as the last tiebreak). Per-batch keep-best
    collapses each block to <=1 row per key before the exchange, so
    the shuffle moves at most (keys x blocks) rows; the merge applies
    the identical keep-best inside each hash partition.
    """
    order_cols = list(order_cols)
    n_parts = partitions_for_input(None)
    cols = list(keep_cols) if keep_cols is not None else None

    def keep_best(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(
            [key, *order_cols], ascending=[True] + [False] * len(order_cols)
        ).drop_duplicates(key, keep="first")
        return out

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if cols is not None:
            df = df[cols]
        out = keep_best(df).copy()
        out["_part"] = _part_of(out, [key], n_parts)
        return out

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=None)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return keep_best(g).drop(columns=["_part"])

    return partials.groupby("_part").map_groups(merge, batch_format="pandas")


# ------------------------------------------------- OHLC candlestick bars


def _ohlc_reduce(df: pd.DataFrame, group_cols: Sequence[str]) -> pd.DataFrame:
    """One OHLC monoid reduction: collapse partial rows to one row per
    group key. Open is the row minimizing ``(o_ts, o_id)``, close the
    row maximizing ``(c_ts, c_id)``; extrema/count/sum fold with
    min/max/add ``reduceat``. Raw rows in partial form reduce with the
    SAME kernel as block partials, so batch pass and partition merge
    share this code path (associative + commutative)."""
    if not len(df):
        return df
    codes = [pd.factorize(df[c], sort=True)[0] for c in group_cols]
    o_ts = df["o_ts"].to_numpy()
    o_id = df["o_id"].to_numpy()
    c_ts = df["c_ts"].to_numpy()
    c_id = df["c_id"].to_numpy()
    # ascending (group, o_ts, o_id): segment FIRST row is the open
    order_a = np.lexsort((o_id, o_ts, *codes[::-1]))
    gc_a = [c[order_a] for c in codes]
    brk = np.zeros(len(df), dtype=bool)
    brk[0] = True
    for c in gc_a:
        brk[1:] |= c[1:] != c[:-1]
    starts = np.flatnonzero(brk)
    ends = np.append(starts[1:], len(df)) - 1
    # ascending (group, c_ts, c_id): segment LAST row is the close
    order_d = np.lexsort((c_id, c_ts, *codes[::-1]))
    out = {c: df[c].to_numpy()[order_a][starts] for c in group_cols}
    out["o_ts"] = o_ts[order_a][starts]
    out["o_id"] = o_id[order_a][starts]
    out["open_v"] = df["open_v"].to_numpy()[order_a][starts]
    out["c_ts"] = c_ts[order_d][ends]
    out["c_id"] = c_id[order_d][ends]
    out["close_v"] = df["close_v"].to_numpy()[order_d][ends]
    out["high_v"] = np.maximum.reduceat(df["high_v"].to_numpy()[order_a], starts)
    out["low_v"] = np.minimum.reduceat(df["low_v"].to_numpy()[order_a], starts)
    out["n"] = np.add.reduceat(df["n"].to_numpy()[order_a], starts)
    out["sum_c"] = np.add.reduceat(df["sum_c"].to_numpy()[order_a], starts)
    return pd.DataFrame(out)


def ohlc_bars(
    ds,
    group_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    interval: str = "1h",
    cents_scale: int = 100,
):
    """OHLC candlestick bars per (group, tumbling time bucket): open
    and close are the first/last value under the deterministic
    ``(ts, id)`` total order, high/low are the extrema, plus count and
    an exact scaled-integer sum (``sum_c``, in ``1/cents_scale``
    units — immune to float summation order).

    Same exchange shape as :func:`latest_state` but keeping BOTH frame
    edges: per-batch partials collapse each block to <=1 row per
    (group, bucket), so the shuffle moves O(groups x blocks) bounded
    rows; the per-partition merge applies the identical monoid
    reduction (:func:`_ohlc_reduce`). Equivalent SQL: ``row_number()
    over (partition by g, bucket order by ts, id)`` edges + min/max/
    count/sum — the classic financial bar downsample the reference's
    eval crops approximate with first/last patch points
    (`uni2ts/src/uni2ts/transform/crop.py`).

    Output (partial form): group_col, bucket_ts(int64 us), o_ts, o_id,
    open_v, c_ts, c_id, close_v, high_v, low_v, n, sum_c.
    """
    unit_us = _interval_us(interval)
    n_parts = partitions_for_input(None)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            # TYPED empty (key/id dtypes inherited from the zero-row
            # input frame): a column-less pd.DataFrame() block would
            # poison downstream schema unification / the _part groupby
            return pd.DataFrame({
                group_col: df[group_col],
                "bucket_ts": pd.Series([], dtype=np.int64),
                "o_ts": pd.Series([], dtype=np.int64),
                "o_id": df[id_col],
                "open_v": pd.Series([], dtype=np.float64),
                "c_ts": pd.Series([], dtype=np.int64),
                "c_id": df[id_col],
                "close_v": pd.Series([], dtype=np.float64),
                "high_v": pd.Series([], dtype=np.float64),
                "low_v": pd.Series([], dtype=np.float64),
                "n": pd.Series([], dtype=np.int64),
                "sum_c": pd.Series([], dtype=np.int64),
                "_part": pd.Series([], dtype=np.int64),
            })
        ts_us = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = df[value_col].to_numpy(dtype=np.float64)
        p = pd.DataFrame(
            {
                group_col: df[group_col].to_numpy(),
                "bucket_ts": ts_us // unit_us * unit_us,
                "o_ts": ts_us,
                "o_id": df[id_col].to_numpy(),
                "open_v": v,
                "c_ts": ts_us,
                "c_id": df[id_col].to_numpy(),
                "close_v": v,
                "high_v": v,
                "low_v": v,
                "n": np.ones(len(df), dtype=np.int64),
                "sum_c": np.rint(v * cents_scale).astype(np.int64),
            }
        )
        out = _ohlc_reduce(p, [group_col, "bucket_ts"])
        out["_part"] = _part_of(out, [group_col, "bucket_ts"], n_parts)
        return out

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=None)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return _ohlc_reduce(g.drop(columns=["_part"]), [group_col, "bucket_ts"])

    return partials.groupby("_part").map_groups(merge, batch_format="pandas")


# ------------------------------------------------- tier stitching


def stitch_plan(a_us: int, b_us: int) -> list[tuple[str, int, int]]:
    """Coarsest-tier cover of the minute-aligned range [a, b): whole
    interior days from the 1d tier, whole edge hours from 1h, minute
    fringes from 1m — the continuous-aggregate read path (answer an
    arbitrary range WITHOUT touching raw rows or fine tiers for the
    interior). Returns disjoint, sorted (tier, start_us, end_us)
    segments whose union is exactly [a, b)."""
    minute, hour, day = _US["m"], _US["h"], _US["d"]
    if a_us % minute or b_us % minute:
        raise ValueError("range must be minute-aligned")
    if a_us >= b_us:
        return []

    def ceil_to(x: int, u: int) -> int:
        return -(-x // u) * u

    def floor_to(x: int, u: int) -> int:
        return x // u * u

    plan: list[tuple[str, int, int]] = []
    a, b = a_us, b_us
    left = min(ceil_to(a, hour), b)
    if a < left:
        plan.append(("1m", a, left))
        a = left
    if a < b:
        right = max(floor_to(b, hour), a)
        if right < b:
            plan.append(("1m", right, b))
            b = right
    if a < b:
        left = min(ceil_to(a, day), b)
        if a < left:
            plan.append(("1h", a, left))
            a = left
    if a < b:
        right = max(floor_to(b, day), a)
        if right < b:
            plan.append(("1h", right, b))
            b = right
    if a < b:
        plan.append(("1d", a, b))
    return sorted(plan, key=lambda seg: seg[1])


def tier_stitch_aggregate(
    ds,
    a_us: int,
    b_us: int,
    ts_col: str = "ts",
    value_col: str = "value",
    value_scale: int = 100,
):
    """Range aggregate [a, b) answered from the tier ladder: builds the
    global 1m rollup once (mergeable partials), cascades 1m -> 1h -> 1d
    by re-bucketing the aggregate (partials only — raw rows shuffle
    exactly once, into the 1m build), then each ``stitch_plan`` segment
    reads ONLY its tier's bucket rows. Returns one row per segment
    (tier, seg_start, seg_end, n_events, sum_value); exact int64 sums
    throughout, so segment totals telescope to the raw-range answer.

    In a standing retention deployment the 1m/1h/1d inputs are the
    already-materialized tier tables (`state/retention.py` ladder) and
    this stage is pure tier reads; here they are derived in-pipeline
    so the query is self-contained.
    """
    plan = stitch_plan(a_us, b_us)
    if not plan:
        return None
    n_parts = partitions_for_input(None)
    minute_us = _US["m"]

    def partial_1m(batch: pa.Table) -> pa.Table:
        ts = (
            batch[ts_col].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        bucket = ts // minute_us * minute_us
        sv = np.round(
            batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
            * value_scale
        ).astype(np.int64)
        codes, uniques = pd.factorize(bucket, sort=False)
        k = len(uniques)
        n = np.bincount(codes, minlength=k).astype(np.int64)
        s = np.zeros(k, dtype=np.int64)
        np.add.at(s, codes, sv)
        part = (uniques.astype(np.uint64) >> np.uint64(13)).astype(np.int64) % n_parts
        return pa.table(
            {
                "_b": pa.array(uniques, pa.int64()),
                "_n": pa.array(n, pa.int64()),
                "_s": pa.array(s, pa.int64()),
                "_part": pa.array(part, pa.int64()),
            }
        )

    def merge_buckets(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("_b", sort=False, as_index=False).agg(
            _n=("_n", "sum"), _s=("_s", "sum")
        )

    m1 = (
        ds.map_batches(partial_1m, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(merge_buckets, batch_format="pandas")
        .materialize()
    )

    def rebucket(unit_us: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            t = pd.DataFrame(
                {
                    "_b": df["_b"].to_numpy() // unit_us * unit_us,
                    "_n": df["_n"].to_numpy(),
                    "_s": df["_s"].to_numpy(),
                }
            )
            g = t.groupby("_b", sort=False, as_index=False).agg(
                _n=("_n", "sum"), _s=("_s", "sum")
            )
            g["_part"] = (
                g["_b"].to_numpy().astype(np.uint64) >> np.uint64(13)
            ).astype(np.int64) % n_parts
            return g

        return f

    def merge_rebucketed(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("_b", sort=False, as_index=False).agg(
            _n=("_n", "sum"), _s=("_s", "sum")
        )

    # cascade partials-of-partials: bucket-count-bounded, tiny passes
    h1 = (
        m1.map_batches(rebucket(_US["h"]), batch_format="pandas", batch_size=None)
        .groupby("_part")
        .map_groups(merge_rebucketed, batch_format="pandas")
        .materialize()
    )
    d1 = (
        h1.map_batches(rebucket(_US["d"]), batch_format="pandas", batch_size=None)
        .groupby("_part")
        .map_groups(merge_rebucketed, batch_format="pandas")
        .materialize()
    )
    tiers = {"1m": m1, "1h": h1, "1d": d1}

    rows = []
    for tier, seg_s, seg_e in plan:

        def seg_partial(df: pd.DataFrame, lo=seg_s, hi=seg_e) -> pd.DataFrame:
            b = df["_b"].to_numpy()
            m = (b >= lo) & (b < hi)
            return pd.DataFrame(
                {
                    "n": np.array([df["_n"].to_numpy()[m].sum()], dtype=np.int64),
                    "s": np.array([df["_s"].to_numpy()[m].sum()], dtype=np.int64),
                }
            )

        parts = (
            tiers[tier]
            .map_batches(seg_partial, batch_format="pandas", batch_size=None)
            .to_pandas()
        )
        rows.append(
            {
                "tier": tier,
                "seg_start": np.datetime64(seg_s, "us"),
                "seg_end": np.datetime64(seg_e, "us"),
                "n_events": int(parts["n"].sum()),
                "sum_value": round(float(parts["s"].sum()) / value_scale, 6),
            }
        )
    return pd.DataFrame(rows)


def scd2_intervals(
    ds,
    key: str = "user_id",
    state_col: str = "event_type",
    order_cols: Sequence[str] = ("ts", "event_id"),
    ts_col: str = "ts",
):
    """Slowly-changing-dimension type-2 history build from a CDC /
    event stream: per ``key``, consecutive rows with the SAME
    ``state_col`` collapse (change-point compression) and each
    surviving state gets a validity interval
    ``[valid_from, valid_to)`` — ``valid_to`` is the next change's
    timestamp; the current (open-ended) state carries the
    conventional far-future sentinel 9999-12-31 (hashable, unlike
    NULL/NaT). The kimball-style dimension history table, as one
    key-hash exchange + a vectorized partition pass (sort,
    shift-compare, shift-back); no per-row Python.

    ``order_cols`` must totally order rows within a key (end with a
    unique id).
    """
    order_cols = list(order_cols)
    n_parts = partitions_for_input(None)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[key, state_col, *order_cols]].copy()
        out["_part"] = _part_of(out, [key], n_parts)
        return out

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, *order_cols], kind="stable")
        k = g[key].to_numpy()
        s = g[state_col].to_numpy()
        new_key = np.empty(len(g), bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        changed = np.empty(len(g), bool)
        changed[0] = True
        changed[1:] = (s[1:] != s[:-1]) | new_key[1:]
        kept = g.loc[changed, [key, state_col, ts_col]].reset_index(drop=True)
        # microsecond resolution throughout: a datetime64[ns] input
        # would make the 9999-12-31 open-interval sentinel overflow
        # (ns epoch ends 2262-04-11) and raise on every partition
        kept[ts_col] = kept[ts_col].astype("datetime64[us]")
        ts = kept[ts_col].to_numpy()
        kk = kept[key].to_numpy()
        valid_to = np.empty(len(kept), dtype=ts.dtype)
        valid_to[:-1] = ts[1:]
        mask_last = np.empty(len(kept), bool)
        mask_last[:-1] = kk[:-1] != kk[1:]
        mask_last[-1] = True
        out = pd.DataFrame({
            key: kept[key],
            "state": kept[state_col],
            "valid_from": kept[ts_col],
            "valid_to": valid_to,
        })
        out.loc[mask_last, "valid_to"] = np.datetime64("9999-12-31", "us")
        return out

    partials = ds.map_batches(tag, batch_format="pandas", batch_size=None)
    return partials.groupby("_part").map_groups(build, batch_format="pandas")
