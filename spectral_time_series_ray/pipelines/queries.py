"""Driver-checkable queries: each has a Ray-Data implementation here
and a matching DuckDB oracle in ``__ray_entry__.oracle_sql``.

Column names and rounding are part of the contract: every computed
column is rounded with :func:`round_half_away` (DuckDB ``round``
semantics) to the same digits in both engines so order-of-summation
ulp differences cannot break the driver's value-hash comparison.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.dedup import exact_dedup
from ..stages.features import add_text_features
from ..stages.join import broadcast_join, semi_join_keys
from ..stages.rollup import (
    BUCKET_COL,
    add_bucket,
    cascade,
    cascade_multi,
    rollup_exact,
    rollup_mergeable,
)
from ..stages.series import gap_fill_series


def _read(sf_dir: str, name: str, columns=None, filter=None):
    """Pruned parquet read: ``columns`` projects at the scan;
    ``filter`` (a pyarrow expression) prunes row groups / rows at the
    scan, so filtered rows never leave storage."""
    import ray.data

    from ..sources.transcripts import default_num_blocks

    return ray.data.read_parquet(
        f"{sf_dir}/{name}.parquet", columns=columns, filter=filter,
        override_num_blocks=default_num_blocks(),
    )


def _join_partitions() -> int:
    """Partition count for Dataset.join (hash-shuffle) stages."""
    try:
        import ray

        return max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    except Exception:
        return 4


def _ts_minmax_meta(sf_dir: str, table: str, col: str = "ts"):
    """EXACT global (min, max) of a timestamp column from parquet
    row-group STATISTICS — a pure driver metadata read (O(#row-groups)
    footer bytes), replacing a full-table ``aggregate(Min, Max)`` scan
    and its executor spin-up.  Statistics are written by every parquet
    writer in this stack; if a file lacks them, fall back to the scan.
    Returns pandas Timestamps, or None when stats are unavailable —
    INCLUDING when the open/metadata walk itself raises (missing or
    corrupt footer, a directory-style dataset, a non-timestamp column):
    callers treat None as "run the distributed Min/Max aggregate", so
    any metadata problem must degrade to the scan, never crash.
    """
    import pyarrow.parquet as pq

    try:
        f = pq.ParquetFile(f"{sf_dir}/{table}.parquet")
        md = f.metadata
        idx = next(
            (
                i
                for i in range(md.row_group(0).num_columns)
                if md.row_group(0).column(i).path_in_schema == col
            ),
            None,
        )
        if idx is None:
            return None
        lo = hi = None
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            if st is None or not st.has_min_max:
                return None
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        return pd.Timestamp(lo), pd.Timestamp(hi)
    except Exception:
        return None


def round_half_away(x, digits: int):
    """DuckDB ``round()`` semantics (half away from zero).

    The trailing ``+ 0.0`` normalizes IEEE negative zero to +0.0:
    ``np.sign(x) * floor(...)`` yields -0.0 for tiny negatives, and the
    driver's correctness gate hashes typed BYTES, so -0.0 vs 0.0 is a
    hash mismatch even though ``==`` says equal.  Every oracle SQL that
    rounds a sign-crossing (difference-like) quantity appends ``+ 0.0``
    on its side for the same reason (IEEE 754: -0.0 + 0.0 == +0.0).
    """
    m = 10.0**digits
    return np.sign(x) * np.floor(np.abs(np.asarray(x, dtype=np.float64)) * m + 0.5) / m + 0.0


def _round_ds(ds, digits_map: dict[str, int]):
    def f(batch: pd.DataFrame) -> pd.DataFrame:
        for col, d in digits_map.items():
            if col in batch.columns:
                batch[col] = round_half_away(batch[col].to_numpy(dtype=np.float64), d)
        return batch

    return ds.map_batches(f, batch_format="pandas", batch_size=None)


def _rename_ds(ds, mapping: dict[str, str]):
    def f(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([mapping.get(c, c) for c in batch.column_names])

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------- events

ROLLUP_ROUND = {c: 6 for c in ("sum_value", "min_value", "max_value", "mean_value", "p50_value", "p99_value")}


def ev_rollup_1m(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    out = rollup_exact(ds, "1m", value_cols=("value",), quantiles=(0.5, 0.99), key="user_id")
    out = _rename_ds(out, {"n_turns": "n_events"})
    return _round_ds(out, ROLLUP_ROUND)


def ev_rollup_1h_type(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    out = rollup_exact(ds, "1h", value_cols=("value",), quantiles=(0.5,), key="event_type")
    out = _rename_ds(out, {"n_turns": "n_events"})
    return _round_ds(out, {"sum_value": 6, "min_value": 6, "max_value": 6, "mean_value": 6, "p50_value": 6})


def ev_cascade_1h(sf_dir: str):
    """1h rollup CASCADED from 1m mergeable partials (oracle: direct 1h)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    m1 = rollup_mergeable(ds, "1m", value_cols=("value",), key="user_id")
    h1 = cascade(m1, "1h", value_cols=("value",), key="user_id")
    return _round_ds(h1, ROLLUP_ROUND)


def ev_rollup_multi(sf_dir: str):
    """BOTH coarser tiers (1h, 1d) cascaded from 1m mergeable partials
    in ONE tier-tagged exchange and ONE execution
    (`stages/rollup.cascade_multi`, round 4) — vs the sequential
    cascade chain's two of each. Oracle: UNION ALL of the two direct
    DuckDB rollups with a tier literal (cascade == direct rollup for
    mergeable stats, the FIXTURES.md §4 invariant, now per tier)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    m1 = rollup_mergeable(ds, "1m", value_cols=("value",), key="user_id")
    multi = cascade_multi(m1, ["1h", "1d"], value_cols=("value",), key="user_id")
    return _round_ds(multi, ROLLUP_ROUND)


def ev_cascade_1d_salted(sf_dir: str):
    """1d rollup via salted 1m partials then cascade (salt exercises the
    hot-key two-level merge; result must equal the direct 1d rollup)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    m1 = rollup_mergeable(ds, "1m", value_cols=("value",), key="user_id", salt=8)
    d1 = cascade(m1, "1d", value_cols=("value",), key="user_id")
    return _round_ds(d1, ROLLUP_ROUND)


def _gaps_group(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["ts", "event_id"])
    ts = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    gaps_us = np.diff(ts)
    if len(gaps_us) == 0:
        # single-event users are excluded in both engines (oracle uses
        # HAVING count(gap) > 0) to avoid NULL-vs-NaN hash ambiguity
        return pd.DataFrame({"user_id": [], "n_gaps": [], "mean_gap_s": [], "p50_gap_s": []})
    # mean from EXACT integer-us sum, single division order mirrored by
    # the oracle ((sum/n)/1e6): float gap accumulation puts round(.., 6)
    # on a half-microsecond boundary at sf >= 0.1
    mean_s = (int(gaps_us.sum()) / len(gaps_us)) / 1e6
    return pd.DataFrame(
        {
            "user_id": [g["user_id"].iloc[0]],
            "n_gaps": [len(gaps_us)],
            "mean_gap_s": round_half_away(mean_s, 6),
            "p50_gap_s": round_half_away(np.quantile(gaps_us / 1e6, 0.5), 6),
        }
    )


def ev_interarrival(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    return ds.groupby("user_id").map_groups(_gaps_group, batch_format="pandas")


def _sessions_group(gap_s: float):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts_us = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        gaps = np.diff(ts_us) / 1e6
        new = np.concatenate([[True], gaps > gap_s])
        sid = np.cumsum(new)
        n_sessions = int(sid[-1])
        # integer-us durations; mean from the EXACT int sum with the
        # single (sum/n)/1e6 division order mirrored by the oracle —
        # float accumulation puts round(.., 6) on a half-us boundary
        # at sf >= 0.1
        dur_us = np.array(
            [int(ts_us[sid == s].max() - ts_us[sid == s].min())
             for s in range(1, n_sessions + 1)], dtype=np.int64
        )
        mean_dur_s = (int(dur_us.sum()) / n_sessions) / 1e6
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_sessions": [n_sessions],
                "mean_session_events": round_half_away(len(g) / n_sessions, 6),
                "mean_session_duration_s": round_half_away(mean_dur_s, 6),
            }
        )

    return fn


def ev_sessions(sf_dir: str):
    """Session windows: a gap > 1800 s starts a new session (the
    streaming-window shape of ray_guide.md 'Streaming-shaped workloads')."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    return ds.groupby("user_id").map_groups(_sessions_group(1800.0), batch_format="pandas")


def ev_concurrency(sf_dir: str):
    """System-wide utilization sweep: sessionize per user (gap > 1800 s,
    same rule as ev_sessions), then per HOUR the PEAK number of
    concurrently open sessions and the total busy (occupancy) seconds
    — closed intervals, +1-before--1 at equal timestamps. Two
    exchanges total (`analytics.session_intervals` user-hash, then
    `analytics.interval_concurrency` bucket-hash); no global sort, no
    driver state; interval expansion is bounded by duration/1h like
    the gap-fill stage."""
    from ..stages.analytics import interval_concurrency, session_intervals

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    iv = session_intervals(ds, key="user_id", ts_col="ts", gap_s=1800.0)
    occ = interval_concurrency(iv, freq_s=3600)

    def present(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket_ts": batch["bucket_us"].to_numpy(np.int64).astype("datetime64[us]"),
            "peak_concurrency": batch["peak_concurrency"].to_numpy(np.int64),
            "busy_s": round_half_away(
                batch["busy_us"].to_numpy(np.int64) / 1e6, 6),
        })

    return occ.map_batches(present, batch_format="pandas", batch_size=None)


def ev_acf(sf_dir: str):
    """Per-user autocorrelation of the hourly mean-value series at lags
    1-3 (`analytics.acf_by_key`) — the Box-Jenkins persistence
    diagnostic, restricted to users with >= 5 hourly buckets so every
    reported lag has a defined sample correlation. Inputs are rounded
    to 6 decimals on BOTH sides so engine and oracle correlate
    identical series."""
    from ..stages.analytics import acf_by_key
    from ..stages.rollup import rollup_mergeable

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    rolled = rollup_mergeable(ds, "1h", value_cols=("value",), key="user_id")
    rolled = _round_ds(rolled, {"mean_value": 6})
    out = acf_by_key(rolled, key="user_id", order_col="bucket_ts",
                     value_col="mean_value", lags=(1, 2, 3))
    out = out.map_batches(lambda b: b[b["n_buckets"] >= 5],
                          batch_format="pandas", batch_size=None)
    return _round_ds(out, {"acf1": 6, "acf2": 6, "acf3": 6})


def ev_window_funcs(sf_dir: str):
    """SQL analytic window functions per user — row_number(),
    lag(value), running sum(value) over (partition by user_id order by
    ts, event_id) — via ONE int-keyed hash shuffle + a segmented numpy
    pass per partition (`features.analytic_window_funcs`). Running sum
    accumulates in scaled int64 (2-decimal inputs) so it matches the
    SQL engine exactly regardless of float summation order."""
    from ..stages.features import analytic_window_funcs

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    out = analytic_window_funcs(
        ds, key="user_id", order_cols=("ts", "event_id"), value_col="value",
    )
    out = out.select_columns(["event_id", "user_id", "rn", "prev_value", "running_value"])
    return _round_ds(out, {"running_value": 6})


def ev_rank_funcs(sf_dir: str):
    """Second analytic window family per user: lead(value), trailing
    5-row moving average, rank()/dense_rank() by value (tie-aware),
    ntile(4) quartile buckets over time order — one int-keyed shuffle
    + one numpy pass (`features.analytic_rank_funcs`)."""
    from ..stages.features import analytic_rank_funcs

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    out = analytic_rank_funcs(
        ds, key="user_id", order_cols=("ts", "event_id"), value_col="value",
        ma_window=5, n_tiles=4,
    )
    out = out.select_columns(
        ["event_id", "user_id", "lead_value", "ma_value", "rnk", "drnk", "tile"]
    )
    return _round_ds(out, {"ma_value": 6})


def ev_range_join(sf_dir: str):
    """Range (band) self-join: for each event, count + sum the same
    user's events within ±1 day (self included) — one int-keyed
    shuffle, two searchsorted calls per partition over a segment-offset
    time axis (`join.range_join_aggregate`)."""
    from ..stages.join import range_join_aggregate

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    out = range_join_aggregate(
        ds, key="user_id", ts_col="ts", value_col="value",
        lo_s=-86400.0, hi_s=86400.0,
    )
    out = out.select_columns(["event_id", "user_id", "n_in_window", "sum_in_window"])
    return _round_ds(out, {"sum_in_window": 6})


def ev_trend(sf_dir: str):
    """Per-user least-squares trend of value over time — slope /
    intercept / correlation as an algebraic aggregate with exact
    scaled-int64 moment partials (`rollup.linear_trend`). Oracle:
    DuckDB regr_slope / regr_intercept / corr on the same centered
    x axis."""
    from ..stages.rollup import linear_trend

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    out = linear_trend(ds, key="user_id", ts_col="ts", value_col="value")
    return _round_ds(out, {"slope": 9, "intercept": 6, "corr": 9})


def ev_trailing_window(sf_dir: str):
    """Time-RANGE window frame: per event, count + sum of the same
    user's events in the TRAILING hour (RANGE BETWEEN INTERVAL 1 HOUR
    PRECEDING AND CURRENT ROW) — the one-sided case of the band-join
    kernel (`join.range_join_aggregate` with lo=-3600, hi=0)."""
    from ..stages.join import range_join_aggregate

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    out = range_join_aggregate(
        ds, key="user_id", ts_col="ts", value_col="value",
        lo_s=-3600.0, hi_s=0.0,
    )
    out = out.select_columns(["event_id", "user_id", "n_in_window", "sum_in_window"])
    return _round_ds(out, {"sum_in_window": 6})


def ev_window_distinct(sf_dir: str):
    """Holistic sliding-window DISTINCT: per event, how many distinct
    event types the same user produced in the trailing hour (RANGE
    frame, inclusive). `join.windowed_distinct_count` — one key-hash
    shuffle, D=|types| searchsorted passes answer every row at once
    (bounded-domain contract documented on the operator)."""
    from ..stages.join import windowed_distinct_count

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])
    out = windowed_distinct_count(
        ds, key="user_id", ts_col="ts", value_col="event_type", window_s=3600.0,
    )
    return out.select_columns(["event_id", "user_id", "n_distinct"])


def ev_session_overlap(sf_dir: str):
    """Per-key interval OVERLAP join (temporal join): each user's
    click-sessions joined against the same user's purchase-sessions
    wherever the two intervals overlap (inclusive), then per-user pair
    count + total overlap seconds. Sessions come from the vectorized
    `streaming.sessionize` (gap 12 h — sized to the fixture's ~40 h
    median inter-event gap so sessions are real intervals); the join is
    `join.interval_overlap_join` — one key-hash shuffle, contiguous
    [searchsorted(ends), searchsorted(starts)) overlap ranges per
    probe, exact integer-microsecond overlap arithmetic mirrored by
    the DuckDB oracle's epoch_us sums."""
    from ray.data.aggregate import Count, Sum

    from ..stages.join import interval_overlap_join
    from ..stages.streaming import sessionize

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def sessions(ev_type: str):
        sub = ds.filter(expr=f"event_type == '{ev_type}'")
        sess = sessionize(sub, key="user_id", order_col="ts", ts_col="ts",
                          gap_s=43200.0)

        def to_us(batch: pd.DataFrame) -> pd.DataFrame:
            start = batch["start_ts"].to_numpy(dtype="datetime64[us]").view("int64")
            dur = np.round(batch["duration_s"].to_numpy(dtype=np.float64) * 1e6)
            return pd.DataFrame(
                {"user_id": batch["user_id"].to_numpy(),
                 "start_us": start, "end_us": start + dur.astype(np.int64)}
            )

        return sess.map_batches(to_us, batch_format="pandas", batch_size=None)

    pairs = interval_overlap_join(
        sessions("click"), sessions("purchase"), key="user_id"
    )
    out = pairs.groupby("user_id").aggregate(
        Count(alias_name="n_pairs"), Sum("overlap_us", alias_name="overlap_us_sum")
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["overlap_s"] = round_half_away(
            batch["overlap_us_sum"].to_numpy(dtype=np.float64) / 1e6, 6
        )
        return batch[["user_id", "n_pairs", "overlap_s"]]

    return out.map_batches(finish, batch_format="pandas", batch_size=None)


def ev_retained_users(sf_dir: str):
    """INTERSECT shape: users active in BOTH halves of the month, with
    per-user counts from each half. Two pushdown-pruned reads, per-key
    counts computed distributed, then a hash-shuffle ``Dataset.join``
    — the per-user tables never land on the driver (the user domain is
    unbounded at 100 TB)."""
    from ..stages.join import hash_groupby_sum

    split = np.datetime64("2024-01-15", "us")
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    # one read, both half-counts as indicator sums -> ONE int-keyed
    # exchange (hash_groupby_sum); the INTERSECT is a post-filter on
    # the merged counts, not a second shuffle join. Two string-keyed
    # Ray groupbys + Dataset.join measured 20s at sf0.1; this is ~3s.
    def indicators(batch: pd.DataFrame) -> pd.DataFrame:
        first = batch["ts"].to_numpy() < split
        return pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(),
            "n_first_half": first.astype(np.int64),
            "n_second_half": (~first).astype(np.int64),
        })

    counts = hash_groupby_sum(
        ds.map_batches(indicators, batch_format="pandas", batch_size=None),
        "user_id", ("n_first_half", "n_second_half"),
        num_partitions=_join_partitions(),
    )

    def both_halves(batch: pd.DataFrame) -> pd.DataFrame:
        keep = (batch["n_first_half"].to_numpy() > 0) & (
            batch["n_second_half"].to_numpy() > 0)
        return batch.loc[keep, ["user_id", "n_first_half", "n_second_half"]]

    return counts.map_batches(both_halves, batch_format="pandas", batch_size=None)


def ev_incremental_rollup(sf_dir: str):
    """Incremental view maintenance: the first half-month's 1h rollup
    merged with the second half's (two pushdown-pruned reads -> two
    mergeable rollups -> `merge_rollups`) must equal the direct rollup
    of everything — the keep-yesterday's-partials update path. Oracle:
    the plain full rollup."""
    from ..stages.rollup import merge_rollups, rollup_mergeable

    split = np.datetime64("2024-01-15", "us")
    a = _read(sf_dir, "events", columns=["user_id", "ts", "value"],
              filter=pc.field("ts") < split)
    b = _read(sf_dir, "events", columns=["user_id", "ts", "value"],
              filter=pc.field("ts") >= split)
    ra = rollup_mergeable(a, "1h", value_cols=("value",), key="user_id")
    rb = rollup_mergeable(b, "1h", value_cols=("value",), key="user_id")
    out = merge_rollups(ra, rb, value_cols=("value",), key="user_id")
    return _round_ds(out, {"sum_value": 6, "min_value": 6, "max_value": 6, "mean_value": 6})


def ev_no_purchase_users(sf_dir: str):
    """Anti-join / EXCEPT shape: (user, day) pairs with clicks but no
    purchase that day — fully distributed: a Bloom over the purchase
    keys keeps certain non-buyers with zero shuffle, and only the
    sparse Bloom-hit rows enter a hash-shuffle left-outer verify
    (`join.anti_join_distributed`). No key set ever materializes on
    the driver (the (user, day) domain is unbounded at 100 TB)."""
    from ray.data.aggregate import Count, Sum

    from ..stages.join import anti_join_distributed

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts", "value"])

    def with_key(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch["ts"], unit="day")
        epoch_days = pc.divide(
            pc.cast(pc.cast(day, pa.int64()), pa.int64()), pa.scalar(86_400_000_000)
        )
        key = pc.add(
            pc.multiply(batch["user_id"], pa.scalar(1_000_000)), epoch_days
        )
        batch = batch.append_column("day", day)
        return batch.append_column("_ud", key)

    ds = ds.map_batches(with_key, batch_format="pyarrow", batch_size=None)
    purchases = ds.filter(expr="event_type == 'purchase'").select_columns(["_ud"])
    clicks = ds.filter(expr="event_type == 'click'")
    out = (
        anti_join_distributed(clicks, purchases, "_ud")
        .groupby(["user_id", "day"])
        .aggregate(Count(alias_name="n_clicks"), Sum("value", alias_name="click_value"))
    )
    return _round_ds(out, {"click_value": 6})


def ev_gapfill_1h(sf_dir: str):
    """Dense hourly grid per user, LOCF gap-fill of the rounded hourly
    mean (reference LastValueImputation semantics, imputation.py:44-62)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    rolled = rollup_mergeable(ds, "1h", value_cols=("value",), key="user_id")
    rolled = _round_ds(rolled, {"mean_value": 6})
    filled = gap_fill_series(rolled, "1h", value_col="mean_value", method="locf", key="user_id")
    return _rename_ds(filled, {"mean_value": "value_filled"})


def ev_gapfill_seasonal(sf_dir: str):
    """Dense hourly grid per user, SEASONAL-NAIVE gap-fill: a missing
    hour takes the RAW value 24 hours earlier when that slot was
    observed, else raw-LOCF (`functions/imputation.seasonal_impute`;
    fills never feed fills, so the result matches the oracle's
    ``coalesce(v, lag(v, 24), locf(v))`` exactly)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    rolled = rollup_mergeable(ds, "1h", value_cols=("value",), key="user_id")
    rolled = _round_ds(rolled, {"mean_value": 6})
    filled = gap_fill_series(
        rolled, "1h", value_col="mean_value", method="seasonal24",
        key="user_id",
    )
    return _rename_ds(filled, {"mean_value": "value_filled"})


def ev_type_hour_count(sf_dir: str):
    """Pre-aggregated count per (event_type, hour): per-batch Arrow
    partials, then a tiny merge — the mergeable-rollup shuffle shape."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])
    ds = add_bucket(ds, "1h")

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["event_type", BUCKET_COL]).aggregate([([], "count_all")])

    ds = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(BUCKET_COL, sort=True)["count_all"].sum().rename("n_events").reset_index()
        out.insert(0, "event_type", df["event_type"].iloc[0])
        return out

    return ds.groupby("event_type").map_groups(merge, batch_format="pandas")


def ev_decay_score(sf_dir: str):
    """Per-user EXPONENTIALLY TIME-DECAYED value score (1-day
    half-life, evaluated at the global max event date) — the retention
    / engagement-scoring aggregate of a streaming feature store.

    Exactness trick: decay weights are DYADIC — ``2^(30 - age_days)``
    as int64 — so ``cents * weight`` and every partial sum are pure
    integer arithmetic on BOTH engines (no float association drift);
    the single trailing division by 2^30 is an exact power-of-two
    scale. Shuffle shape: per-block (user, num, den) int partials ->
    one int-keyed hash exchange (`hash_groupby_sum`) — raw rows never
    move. The eval anchor (max event date) is one tiny distributed Max
    pass. Ages beyond 30 days weight 0 (weights would underflow the
    shift), matching the oracle's filter."""
    from ..stages.join import hash_groupby_sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    meta = _ts_minmax_meta(sf_dir, "events")
    max_ts = meta[1] if meta is not None else ds.max("ts")
    max_day = int(np.datetime64(pd.Timestamp(max_ts), "D").astype(np.int64))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(batch["value"].to_numpy(np.float64) * 100).astype(np.int64)
        day = batch["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        age = max_day - day
        keep = (age >= 0) & (age <= 30)
        w = np.zeros(len(batch), np.int64)
        w[keep] = np.int64(1) << (30 - age[keep])
        return pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(np.int64),
            "num": cents * w,
            "den": w,
        })

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=None)
    out = hash_groupby_sum(parts, "user_id", ("num", "den")).to_pandas()
    scale = float(1 << 30)
    out["decayed_value"] = round_half_away(
        out["num"].to_numpy(np.int64).astype(np.float64) / scale, 6)
    out["effective_n"] = round_half_away(
        out["den"].to_numpy(np.int64).astype(np.float64) / scale, 6)
    out["user_id"] = out["user_id"].astype(np.int64)
    return out[["user_id", "decayed_value", "effective_n"]]


def ev_top_users(sf_dir: str):
    """Top-10 users by total value: per-batch Arrow partials, hash
    groupby merge, then only per-block partial top-50s reach the
    driver (q3's bounded-candidate pattern — never the full per-user
    table, whose size is unbounded at 100 TB). 50 unrounded candidates
    per block guard every tie that could enter the ROUNDED top-10."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["user_id"]).aggregate([("value", "sum")])

    ds = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    totals = ds.groupby("user_id").aggregate(Sum("value_sum", alias_name="total_value"))

    def part_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["total_value", "user_id"], ascending=[False, True]).head(50)

    df = totals.map_batches(part_top, batch_format="pandas").to_pandas()
    df["total_value"] = round_half_away(df["total_value"].to_numpy(), 2)
    df = df.sort_values(["total_value", "user_id"], ascending=[False, True]).head(10)
    return df.reset_index(drop=True)


# ---------------------------------------------------------------- TPC-H-ish

def q1_pricing(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_tax", "l_shipdate"],
    )
    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        # exact scaled-int64 money sums: price/discount/tax carry 2
        # decimals, so disc_price (scale 1e4) and charge (scale 1e6)
        # are exact integers — float accumulation order can land
        # round(.., 2) on a half-cent boundary at sf >= 0.1 (oracle
        # mirrors the same scaled arithmetic)
        ep_i = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        d_i = pc.cast(pc.round(pc.multiply(batch["l_discount"], pa.scalar(100.0))), pa.int64())
        t_i = pc.cast(pc.round(pc.multiply(batch["l_tax"], pa.scalar(100.0))), pa.int64())
        disc_i = pc.multiply(ep_i, pc.subtract(pa.scalar(100, pa.int64()), d_i))
        charge_i = pc.multiply(disc_i, pc.add(pa.scalar(100, pa.int64()), t_i))
        batch = batch.append_column("ep_i", ep_i)
        batch = batch.append_column("disc_i", disc_i)
        batch = batch.append_column("charge_i", charge_i)
        # per-batch partial pre-agg before the shuffle
        return batch.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("ep_i", "sum"), ("disc_i", "sum"),
             ("charge_i", "sum"), ("l_discount", "sum"), ([], "count_all")]
        )

    partials = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    merged = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity_sum", alias_name="sum_qty"),
        Sum("ep_i_sum", alias_name="_sum_base_i"),
        Sum("disc_i_sum", alias_name="_sum_disc_i"),
        Sum("charge_i_sum", alias_name="_sum_charge_i"),
        Sum("l_discount_sum", alias_name="_sum_disc"),
        Sum("count_all", alias_name="count_order"),
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["count_order"].to_numpy(dtype=np.float64)
        base = batch["_sum_base_i"].to_numpy(dtype=np.float64) / 100.0
        batch["avg_qty"] = round_half_away(batch["sum_qty"] / n, 6)
        batch["avg_price"] = round_half_away(base / n, 6)
        batch["avg_disc"] = round_half_away(batch["_sum_disc"] / n, 6)
        batch["sum_qty"] = round_half_away(batch["sum_qty"].to_numpy(), 2)
        batch["sum_base_price"] = round_half_away(base, 2)
        batch["sum_disc_price"] = round_half_away(
            batch["_sum_disc_i"].to_numpy(dtype=np.float64) / 1e4, 2
        )
        batch["sum_charge"] = round_half_away(
            batch["_sum_charge_i"].to_numpy(dtype=np.float64) / 1e6, 2
        )
        return batch.drop(columns=["_sum_disc", "_sum_base_i", "_sum_disc_i", "_sum_charge_i"])

    return merged.map_batches(finish, batch_format="pandas", batch_size=None)


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: pure filtered aggregate, fully streaming — a
    pruned read, one vectorized Arrow filter+sum per batch, and a
    single-row final merge. No shuffle of row data at any scale."""
    from ray.data.aggregate import Sum

    # row-filter pushdown: the shipdate range prunes row groups AT THE
    # SCAN (pyarrow expression), so out-of-range rows never leave
    # storage; the residual predicates stay vectorized per batch
    expr = (pc.field("l_shipdate") >= np.datetime64("1996-01-01", "us")) & (
        pc.field("l_shipdate") < np.datetime64("1997-01-01", "us")
    )
    ds = _read(
        sf_dir, "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        filter=expr,
    )

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(batch["l_discount"], pa.scalar(0.05)),
                pc.less_equal(batch["l_discount"], pa.scalar(0.07)),
            ),
            pc.less(batch["l_quantity"], pa.scalar(24.0)),
        )
        batch = batch.filter(m)
        rev = pc.multiply(batch["l_extendedprice"], batch["l_discount"])
        return pa.table(
            {"rev": [pc.sum(rev).as_py() or 0.0],
             "n": [batch.num_rows]}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .aggregate(Sum("rev", alias_name="revenue"), Sum("n", alias_name="n_lines"))
    )
    return pd.DataFrame(
        {"revenue": round_half_away(float(agg["revenue"]), 2),
         "n_lines": [int(agg["n_lines"])]}
    )


def q12_priority_lines(sf_dir: str):
    """TPC-H Q12 shape (adapted to this schema subset): large-large
    hash join of date-filtered lineitem against orders (Dataset.join —
    orders never on the driver), per-batch conditional partials, tiny
    per-priority merge."""
    from ray.data.aggregate import Sum

    P = _join_partitions()
    # row-filter pushdown: date range pruned at the scan
    expr = (pc.field("l_shipdate") >= np.datetime64("1996-01-01", "us")) & (
        pc.field("l_shipdate") < np.datetime64("1997-01-01", "us")
    )
    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=expr,
    )

    def li_prep(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        is_ret = pc.cast(pc.equal(batch["l_returnflag"], pa.scalar("R")), pa.int64())
        return pa.table(
            {"l_orderkey": batch["l_orderkey"], "rev": rev, "is_ret": is_ret}
        )

    li_f = li.map_batches(li_prep, batch_format="pyarrow", batch_size=None).materialize()
    # Bloom semi-join pushdown: orders rows whose key cannot appear in
    # the filtered lineitem side never enter the hash-shuffle (false
    # positives pass harmlessly; the join stays exact — same oracle)
    from ..stages.join import bloom_semi_filter, build_bloom

    bloom = build_bloom(li_f, "l_orderkey")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    orders = bloom_semi_filter(orders, "o_orderkey", bloom)
    joined = li_f.join(
        orders, join_type="inner", num_partitions=P,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["o_orderpriority"]).aggregate(
            [("rev", "sum"), ("is_ret", "sum"), ([], "count_all")]
        )

    merged = (
        joined.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("o_orderpriority")
        .aggregate(
            Sum("count_all", alias_name="n_lines"),
            Sum("is_ret_sum", alias_name="return_lines"),
            Sum("rev_sum", alias_name="revenue"),
        )
        .to_pandas()  # one row per priority (5)
    )
    merged["revenue"] = round_half_away(merged["revenue"].to_numpy(), 2)
    return merged.sort_values("o_orderpriority").reset_index(drop=True)


def q10_returned_items(sf_dir: str):
    """TPC-H Q10 shape: customers ranked by revenue from RETURNED
    items in a quarter. Scale path: lineitem streams once with exact
    scale-1e4 int64 revenue partials per orderkey; the date-filtered
    orders side is Bloom-prefiltered and hash-joined (``Dataset.join``
    — never driver-side); per-customer totals stay distributed and
    only ≤50 unrounded candidates per block reach the driver (q3's
    bounded partial-top-k); the 20 winners' names come from a
    key-filter-pushdown customer read plus a broadcast nation merge."""
    from ray.data.aggregate import Sum

    from ..stages.join import bloom_semi_filter, build_bloom

    P = _join_partitions()
    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
        filter=pc.field("l_returnflag") == "R",
    )

    def li_prep(batch: pa.Table) -> pa.Table:
        ep_i = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        d_i = pc.cast(pc.round(pc.multiply(batch["l_discount"], pa.scalar(100.0))), pa.int64())
        rev4 = pc.multiply(ep_i, pc.subtract(pa.scalar(100, pa.int64()), d_i))
        return pa.table({"l_orderkey": batch["l_orderkey"], "rev4": rev4}).group_by(
            ["l_orderkey"]
        ).aggregate([("rev4", "sum")])

    li_p = li.map_batches(li_prep, batch_format="pyarrow", batch_size=None)
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= np.datetime64("1996-01-01", "us"))
        & (pc.field("o_orderdate") < np.datetime64("1996-04-01", "us")),
    ).select_columns(["o_orderkey", "o_custkey"])
    bloom = build_bloom(orders, "o_orderkey")
    li_p = bloom_semi_filter(li_p, "l_orderkey", bloom).materialize()
    joined = li_p.join(
        orders, join_type="inner", num_partitions=P,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def cust_partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["o_custkey"]).aggregate([("rev4_sum", "sum")])

    totals = (
        joined.map_batches(cust_partial, batch_format="pyarrow", batch_size=None)
        .groupby("o_custkey")
        .aggregate(Sum("rev4_sum_sum", alias_name="rev4"))
    )

    def part_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["rev4", "o_custkey"], ascending=[False, True]).head(50)

    cand = totals.map_batches(part_top, batch_format="pandas").to_pandas()
    cand["revenue"] = round_half_away(cand["rev4"].to_numpy(dtype=np.float64) / 1e4, 2)
    top = cand.sort_values(["revenue", "o_custkey"], ascending=[False, True]).head(20)
    names = _read(
        sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        filter=pc.field("c_custkey").isin(top["o_custkey"].tolist()),
    ).to_pandas()
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    df = top.merge(
        names.rename(columns={"c_custkey": "o_custkey"}), on="o_custkey", how="inner"
    ).merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    df = df.rename(columns={"o_custkey": "c_custkey"})
    df = df.sort_values(["revenue", "c_custkey"], ascending=[False, True]).reset_index(drop=True)
    return df[["c_custkey", "c_name", "revenue", "c_acctbal", "n_name"]]


def ri_orphans(sf_dir: str):
    """Referential-integrity audit: orphan-row counts for two foreign
    keys (lineitem->orders, orders->customer) via the Bloom-prefilter +
    distributed left-outer-join verifier
    (`validate.orphan_key_count`)."""
    from ..stages.validate import orphan_key_count

    rows = []
    for child, ckey, parent, pkey in (
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
    ):
        n_child, n_orph = orphan_key_count(
            _read(sf_dir, child, columns=[ckey]),
            _read(sf_dir, parent, columns=[pkey]),
            ckey, pkey,
        )
        rows.append(
            {"relationship": f"{child}.{ckey}->{parent}.{pkey}",
             "n_child_rows": n_child, "n_orphans": n_orph}
        )
    return pd.DataFrame(rows)


def q3_revenue_topk(sf_dir: str):
    """TPC-H Q3 shape, scale path: orders is NEVER materialized on the
    driver. BUILDING customers semi-filter orders via ``Dataset.join``
    (hash shuffle), lineitem pre-aggregates revenue partials per batch,
    a second hash join attaches the order date, and only per-batch
    partial top-50s reach the driver for the final top-10 merge."""
    from ray.data.aggregate import Sum

    date = np.datetime64("1995-03-15", "us")
    P = _join_partitions()
    cust_f = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        .filter(expr="c_mktsegment == 'BUILDING'")
        .select_columns(["c_custkey"])
    )
    # row-filter pushdown: the date predicate prunes at the scan
    orders_f = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pc.field("o_orderdate") < date,
    )
    orders_j = orders_f.join(
        cust_f, join_type="inner", num_partitions=P,
        on=("o_custkey",), right_on=("c_custkey",),
    ).select_columns(["o_orderkey", "o_orderdate"])

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["l_shipdate"], pa.scalar(date)))
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        batch = batch.append_column("rev", rev)
        return batch.group_by(["l_orderkey"]).aggregate([("rev", "sum")])

    partials = li.map_batches(prep, batch_format="pyarrow", batch_size=None)
    joined = partials.join(
        orders_j, join_type="inner", num_partitions=P,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    rev = joined.groupby(["l_orderkey", "o_orderdate"]).aggregate(
        Sum("rev_sum", alias_name="revenue")
    )

    def part_top(df: pd.DataFrame) -> pd.DataFrame:
        # unrounded partial top-50 bounds driver data while keeping every
        # candidate that could enter the ROUNDED top-10
        return df.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).head(50)

    df = rev.map_batches(part_top, batch_format="pandas").to_pandas()
    df["revenue"] = round_half_away(df["revenue"].to_numpy(), 2)
    df = df.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).head(10)
    return df.reset_index(drop=True)


def top_customers(sf_dir: str):
    """Top-10 customers by lifetime spend: distributed per-customer
    totals, per-block partial top-50s (bounded driver data — q3's
    pattern), final rounded top-10 on ≤50/block candidates, and the
    customer NAMES fetched with a key-filter-pushdown read of exactly
    the 10 winners — the customer dimension is never materialized."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["o_custkey"]).aggregate([("o_totalprice", "sum")])

    partials = orders.map_batches(partial, batch_format="pyarrow", batch_size=None)
    totals = partials.groupby("o_custkey").aggregate(
        Sum("o_totalprice_sum", alias_name="total_spend")
    )

    def part_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["total_spend", "o_custkey"], ascending=[False, True]).head(50)

    cand = totals.map_batches(part_top, batch_format="pandas").to_pandas()
    cand["total_spend"] = round_half_away(cand["total_spend"].to_numpy(), 2)
    top = cand.sort_values(["total_spend", "o_custkey"], ascending=[False, True]).head(10)
    names = _read(
        sf_dir, "customer", columns=["c_custkey", "c_name"],
        filter=pc.field("c_custkey").isin(top["o_custkey"].tolist()),
    ).to_pandas()
    df = top.merge(
        names.rename(columns={"c_custkey": "o_custkey"}), on="o_custkey", how="inner"
    )
    return df.rename(columns={"o_custkey": "c_custkey"}).reset_index(drop=True)


def supplier_nation(sf_dir: str):
    sup = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey", "s_acctbal"])
    nat = _read(sf_dir, "nation").to_pandas().rename(columns={"n_nationkey": "s_nationkey"})
    reg = _read(sf_dir, "region").to_pandas().rename(columns={"r_regionkey": "n_regionkey"})
    joined = broadcast_join(sup, nat[["s_nationkey", "n_name", "n_regionkey"]], on="s_nationkey")
    joined = broadcast_join(joined, reg[["n_regionkey", "r_name"]], on="n_regionkey")
    from ray.data.aggregate import Count, Sum

    out = joined.groupby("r_name").aggregate(
        Count(alias_name="n_suppliers"), Sum("s_acctbal", alias_name="total_acctbal")
    )
    return _round_ds(out, {"total_acctbal": 2})


# ---------------------------------------------------------------- documents

def doc_stats_by_lang(sf_dir: str):
    from ray.data.aggregate import Count, Mean

    ds = _read(sf_dir, "documents", columns=["lang", "text"])
    ds = ds.map_batches(add_text_features, batch_format="pyarrow", batch_size=None)
    ds = ds.select_columns(["lang", "text_len", "ws_tokens"])
    out = ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Mean("text_len", alias_name="avg_chars"),
        Mean("ws_tokens", alias_name="avg_ws_tokens"),
    )
    return _round_ds(out, {"avg_chars": 6, "avg_ws_tokens": 6})


def doc_exact_dedup(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = exact_dedup(ds)
    return out.select_columns(["doc_id", "n_dups"])


# ---------------------------------------------------------------- embeddings

def _query_vec(sf_dir: str) -> np.ndarray:
    """Driver-side read of ONE query vector (vec_id == 0).

    Uses a parquet predicate (``filters=``) so only the row groups whose
    vec_id min/max straddle 0 are decoded — at 100x the table this stays
    a single-row-group read, never a whole-table driver pull.
    """
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", 0)],
    )
    if t.num_rows == 0:
        raise ValueError("no embedding with vec_id == 0")
    return np.asarray(t.column("embedding")[0].as_py(), dtype=np.float64)


class _CosineAll:
    """Score every vector against one broadcast query (exact)."""

    def __init__(self, q_ref):
        import ray

        q = np.asarray(ray.get(q_ref), dtype=np.float64)
        self.q = q / np.linalg.norm(q)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.DataFrame(
            {"vec_id": batch["vec_id"].to_numpy(), "score": m @ self.q}
        )


def emb_ann_topk(sf_dir: str):
    """Exact cosine top-10 via the distributed partial-top-k path
    (``ann_brute_force``): per-batch deterministic top-50 partials, tiny
    driver merge — never the full (vec_id, score) set. top-50 (not 10)
    so every candidate that could enter the ROUNDED top-10 survives the
    unrounded partial selection."""
    from ..stages.similarity import ann_brute_force

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = _query_vec(sf_dir)[None, :]
    df = ann_brute_force(ds, q, k=50, concurrency=2).to_pandas()  # 50 rows
    df["score"] = round_half_away(df["score"].to_numpy(), 6)
    df = df.sort_values(["score", "vec_id"], ascending=[False, True]).head(10)
    return df[["vec_id", "score"]].reset_index(drop=True)


def emb_label_stats(sf_dir: str):
    import ray
    from ray.data.aggregate import Count, Mean

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    q_ref = ray.put(_query_vec(sf_dir))

    class Scorer(_CosineAll):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = super().__call__(batch)
            out["label"] = batch["label"].to_numpy()
            return out

    scored = ds.map_batches(
        Scorer, fn_constructor_args=(q_ref,), batch_format="pandas",
        batch_size=4096, concurrency=2,
    )
    out = scored.groupby("label").aggregate(
        Count(alias_name="n_vecs"), Mean("score", alias_name="mean_score")
    )
    return _round_ds(out, {"mean_score": 6})


def emb_sim_pairs(sf_dir: str):
    """Exact cosine pairs (vec_id < 200, cosine >= 0.3) — brute force
    numpy matmul per batch against the broadcast subset matrix."""
    import ray

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    sub = ds.filter(expr="vec_id < 200").to_pandas().sort_values("vec_id")
    m = np.stack([np.asarray(v, dtype=np.float64) for v in sub["embedding"]])
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    ids = sub["vec_id"].to_numpy()
    ref = ray.put((ids, m))

    class PairScorer:
        def __init__(self):
            self.ids, self.m = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            mask = batch["vec_id"].to_numpy() < 200
            batch = batch[mask]
            if not len(batch):
                return pd.DataFrame({"a": [], "b": [], "cosine": []})
            bm = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
            bm = bm / np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
            sims = bm @ self.m.T
            bids = batch["vec_id"].to_numpy()
            rows_a, rows_b, rows_s = [], [], []
            for i, a in enumerate(bids):
                keep = (self.ids > a) & (sims[i] >= 0.3)
                rows_a.append(np.full(keep.sum(), a))
                rows_b.append(self.ids[keep])
                rows_s.append(sims[i][keep])
            return pd.DataFrame(
                {
                    "a": np.concatenate(rows_a) if rows_a else [],
                    "b": np.concatenate(rows_b) if rows_b else [],
                    "cosine": round_half_away(np.concatenate(rows_s), 6) if rows_s else [],
                }
            )

    out = ds.map_batches(PairScorer, batch_format="pandas", batch_size=4096, concurrency=2)
    return out.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)


# ------------------------------------------------ scalers / metrics

def ev_user_scaler(sf_dir: str):
    """Per-user standardization stats (PackedStdScaler semantics:
    sample variance, scale clamped at 1e-5 —
    reference packed_scaler.py:78-122)."""
    from ..stages.normalize import fit_std_scaler

    ds = _read(sf_dir, "events", columns=["user_id", "value"])
    out = fit_std_scaler(ds, key="user_id", value_col="value")
    # loc via EXACT integer arithmetic: event values carry 2 decimals, so
    # float means often land exactly on round-half boundaries where
    # summation-order ulp noise flips the rounded digit. Both engines
    # compute sum(value*10^4 as int)/10^4/n in double (oracle: DECIMAL
    # cast), giving identical floats.
    def exact_loc(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy(dtype=np.float64)
        scaled = np.rint(v * 10_000).astype(np.int64)
        loc = (scaled.sum() / 10_000) / len(v)
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]], "loc": [loc]})

    locs = (
        _read(sf_dir, "events", columns=["user_id", "value"])
        .groupby("user_id")
        .map_groups(exact_loc, batch_format="pandas")
        .to_pandas()
    )
    out = out.drop(columns=["loc"]).merge(locs, on="user_id")
    out["loc"] = round_half_away(out["loc"].to_numpy(), 6)
    out["scale"] = round_half_away(out["scale"].to_numpy(), 6)
    return out[["user_id", "loc", "scale"]].sort_values("user_id").reset_index(drop=True)


def _naive_group(g: pd.DataFrame) -> pd.DataFrame:
    from ..functions.metrics import mae, mse

    g = g.sort_values(["ts", "event_id"])
    v = g["value"].to_numpy(dtype=np.float64)
    if len(v) < 2:
        return pd.DataFrame({"user_id": [], "n_scored": [], "naive_mse": [], "naive_mae": []})
    y, p = v[1:], v[:-1]  # lag-1 naive forecast
    # exact integer arithmetic (values have 2 decimals): diffs*100 are
    # integers, so SSE*10^4 and SAE*10^2 sum exactly in int64 — both
    # engines then divide identical numerators (see oracle SQL)
    d = np.rint((y - p) * 100).astype(np.int64)
    mse_exact = ((d * d).sum() / 10_000) / len(y)
    mae_exact = (np.abs(d).sum() / 100) / len(y)
    assert abs(mse_exact - mse(y, p)) < 1e-6 and abs(mae_exact - mae(y, p)) < 1e-8
    return pd.DataFrame(
        {
            "user_id": [g["user_id"].iloc[0]],
            "n_scored": [len(y)],
            "naive_mse": round_half_away(mse_exact, 6),
            "naive_mae": round_half_away(mae_exact, 6),
        }
    )


def ev_naive_forecast(sf_dir: str):
    """Lag-1 naive forecast self-evaluation per user — the windowed-eval
    metric kernels (MSE/MAE, reference loss/packed/point.py) with a SQL
    oracle."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])
    return ds.groupby("user_id").map_groups(_naive_group, batch_format="pandas")


def ev_multivariate_precond(sf_dir: str):
    """Multivariate ([2, T] per user: hourly event count + value sum)
    through the 2-D forward+reverse precondition kernels; emits
    per-variate stats of the ROUNDTRIPPED values so the DuckDB oracle
    over the raw rollup verifies the multivariate path end-to-end."""
    from ..stages.series import multivariate_precondition_stats

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    rolled = rollup_mergeable(ds, "1h", value_cols=("value",), key="user_id")

    def variates(batch: pa.Table) -> pa.Table:
        batch = batch.append_column("v0", pc.cast(batch["count_value"], pa.float64()))
        batch = batch.append_column("v1", pc.cast(batch["sum_value"], pa.float64()))
        return batch.select(["user_id", BUCKET_COL, "v0", "v1"])

    rolled = rolled.map_batches(variates, batch_format="pyarrow", batch_size=None)
    out = multivariate_precondition_stats(
        rolled, ("v0", "v1"), key="user_id", polynomial="chebyshev", degree=4
    )
    return _round_ds(out, {"sum_v": 6, "min_v": 6, "max_v": 6})


# ------------------------------------------------ distinct counting

def ev_distinct_exact(sf_dir: str):
    """Exact distinct users per event type (full-shuffle path)."""
    from ..stages.distinct import distinct_exact

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return distinct_exact(ds, "event_type", "user_id")


def ev_distinct_hll(sf_dir: str):
    """HLL-sketched distinct users per event type vs exact — the
    mergeable-sketch scale path (no value shuffle). Rows-only: the
    estimate is approximate by design; rel_err column shows accuracy."""
    from ..stages.distinct import distinct_exact, distinct_hll

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    exact = distinct_exact(ds, "event_type", "user_id").to_pandas()
    approx = distinct_hll(ds, "event_type", "user_id", p=12).to_pandas()
    out = exact.merge(approx, on="event_type")
    out["rel_err"] = np.abs(out["n_distinct_approx"] - out["n_distinct"]) / out["n_distinct"]
    # p=12 -> 4096 registers -> typical error 1.04/sqrt(4096) ~ 1.6%;
    # 6.5% is a ~4-sigma acceptance bound
    out["ok"] = out["rel_err"] <= 0.065
    return out.sort_values("event_type").reset_index(drop=True)


# ------------------------------------------------ as-of join / pivot

def ev_quantile_tdigest(sf_dir: str):
    """Mergeable t-digest quantiles per event_type vs the exact values,
    judged on RANK error (the guarantee a quantile sketch actually
    makes): ok = the exact rank of each estimate is within 2% of the
    target quantile. Rows-only: approximate by design."""
    from ..stages.distinct import quantile_tdigest

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    approx = quantile_tdigest(ds, "event_type", "value", quantiles=(0.5, 0.99)).to_pandas()

    def rank_err(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy(dtype=np.float64))
        row = approx[approx["event_type"] == g["event_type"].iloc[0]].iloc[0]
        out = {"event_type": [g["event_type"].iloc[0]], "n": [len(v)]}
        worst = 0.0
        for p in (0.5, 0.99):
            est = float(row[f"q{int(p * 100)}_approx"])
            # rank of the estimate in the exact data (mid-rank of ties)
            r = (np.searchsorted(v, est, "left") + np.searchsorted(v, est, "right")) / 2.0
            err = abs(r / len(v) - p)
            out[f"q{int(p * 100)}_approx"] = [round_half_away(est, 6)]
            out[f"q{int(p * 100)}_rank_err"] = [round_half_away(err, 6)]
            worst = max(worst, err)
        out["ok"] = [worst <= 0.02]
        return pd.DataFrame(out)

    return (
        ds.groupby("event_type")
        .map_groups(rank_err, batch_format="pandas")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def ev_quantile_kll(sf_dir: str):
    """Mergeable KLL quantiles per event_type (Karnin-Lang-Liberty
    FOCS'16) vs the exact values — judged on rank error like the
    t-digest sibling, PLUS the sketch's own certificate: KLL tracks a
    worst-case rank-error bound from its compaction ledger, and the
    exact rank of every estimate must fall within it (a hard
    invariant, not a tuned tolerance). Rows-only: approximate by
    design."""
    from ..stages.distinct import quantile_kll

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    approx = quantile_kll(
        ds, "event_type", "value", quantiles=(0.5, 0.99), k=200
    ).to_pandas()

    def rank_err(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy(dtype=np.float64))
        row = approx[approx["event_type"] == g["event_type"].iloc[0]].iloc[0]
        bound = float(row["rank_err_bound"])
        out = {"event_type": [g["event_type"].iloc[0]], "n": [len(v)]}
        worst = 0.0
        for p in (0.5, 0.99):
            est = float(row[f"q{int(p * 100)}_approx"])
            # tie-interval rank error: zero when the target rank falls
            # anywhere inside the estimate's [left, right) tie range —
            # the convention the sketch's "items <= q" counts certify
            lo = np.searchsorted(v, est, "left")
            hi = np.searchsorted(v, est, "right")
            target = p * len(v)
            err = max(0.0, lo - target, target - hi) / len(v)
            out[f"q{int(p * 100)}_approx"] = [round_half_away(est, 6)]
            out[f"q{int(p * 100)}_rank_err"] = [round_half_away(err, 6)]
            worst = max(worst, err)
        out["rank_err_bound"] = [round_half_away(bound, 6)]
        out["ok"] = [worst <= 0.02 and worst <= bound
                     and int(row["n"]) == len(v)]
        return pd.DataFrame(out)

    return (
        ds.groupby("event_type")
        .map_groups(rank_err, batch_format="pandas")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def ev_asof_purchase(sf_dir: str):
    """Each error event matched to the user's most recent
    prior-or-equal purchase (as-of join; oracle: DuckDB ASOF JOIN)."""
    from ..stages.join import asof_join

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts", "value"])
    left = ev.filter(expr="event_type == 'error'").select_columns(["event_id", "user_id", "ts"])

    def prep_right(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["event_type"] == "purchase"]
        return pd.DataFrame(
            {"user_id": batch["user_id"], "ts": batch["ts"],
             "purchase_ts": batch["ts"], "purchase_value": batch["value"]}
        )

    right = ev.map_batches(prep_right, batch_format="pandas", batch_size=None)
    joined = asof_join(left, right, key="user_id", ts_col="ts", direction="backward")

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.dropna(subset=["purchase_ts"])  # inner semantics
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].astype(np.int64),
                "user_id": batch["user_id"].astype(np.int64),
                "purchase_ts": batch["purchase_ts"].astype("datetime64[us]"),
                "purchase_value": round_half_away(batch["purchase_value"].to_numpy(), 2),
            }
        )

    return joined.map_batches(finish, batch_format="pandas", batch_size=None)


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def ev_pivot_types(sf_dir: str):
    """Per-user event-type counts pivoted to columns (melt/pivot op;
    oracle: COUNT(*) FILTER)."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def pivot(g: pd.DataFrame) -> pd.DataFrame:
        counts = g.groupby("event_type")["count_all"].sum()
        row = {"user_id": [g["user_id"].iloc[0]]}
        for t in EVENT_TYPES:
            row[f"n_{t}"] = [int(counts.get(t, 0))]
        return pd.DataFrame(row)

    return partials.groupby("user_id").map_groups(pivot, batch_format="pandas")


def ev_unpivot_types(sf_dir: str):
    """UNPIVOT (wide -> long): the per-user type-count matrix melted
    back to (user_id, event_type, n) rows, zero-count cells dropped —
    a pure per-batch reshape, embarrassingly parallel (no extra
    shuffle beyond the pivot's own). Oracle: DuckDB UNPIVOT over the
    FILTER-pivoted wide table."""
    wide = ev_pivot_types(sf_dir)

    def melt(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.melt(
            id_vars=["user_id"],
            value_vars=[f"n_{t}" for t in EVENT_TYPES],
            var_name="event_type",
            value_name="n",
        )
        out["event_type"] = out["event_type"].str.slice(2)
        out = out[out["n"] > 0]
        return out.reset_index(drop=True)

    return wide.map_batches(melt, batch_format="pandas", batch_size=None)


def ev_type_sequence(sf_dir: str):
    """Ordered per-key string aggregation (SQL string_agg with ORDER
    BY): each user's full event-type sequence as one comma-joined
    string in (ts, event_id) order, plus its length. ONE key-hash
    shuffle; the partition pass lexsorts once and joins per-key slices
    — string concatenation is the output payload itself, so the only
    exchange is the same narrow-column shuffle every keyed op pays."""
    from ..stages.rollup import partitions_for_input

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])
    P = partitions_for_input(None)

    def add_part(batch: pa.Table) -> pa.Table:
        part = (
            pd.util.hash_pandas_object(
                batch["user_id"].to_pandas(), index=False
            ).to_numpy()
            % P
        ).astype(np.int32)
        return batch.append_column("_part", pa.array(part))

    def partition_fn(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype=np.int64),
                 "type_seq": pd.Series([], dtype=object),
                 "n_events": pd.Series([], dtype=np.int64)}
            )
        order = np.lexsort(
            (df["event_id"].to_numpy(), df["ts"].to_numpy(), df["user_id"].to_numpy())
        )
        s = df.iloc[order]
        g = s.groupby("user_id", sort=True)["event_type"]
        joined = g.agg(",".join)
        return pd.DataFrame(
            {"user_id": joined.index.to_numpy(),
             "type_seq": joined.to_numpy(),
             "n_events": g.size().to_numpy(dtype=np.int64)}
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(partition_fn, batch_format="pandas")
    )


def q5_local_supplier(sf_dir: str):
    """TPC-H Q5 shape, scale path: revenue by nation for ASIA orders
    where supplier and customer share a nation. The genuinely tiny
    sides (region, nation, supplier — TPC-H supplier is 1/150th of
    customer) are broadcast; customer x orders co-locate via
    ``Dataset.join`` (hash shuffle); lineitem streams ONCE emitting
    per-batch (l_orderkey, s_nation) revenue partials that hash-join
    the order->customer-nation side — orders is never driver-
    materialized."""
    from ray.data.aggregate import Sum

    P = _join_partitions()
    region = _read(sf_dir, "region").to_pandas()
    nation = _read(sf_dir, "nation").to_pandas()
    asia_key = region.loc[region["r_name"] == "ASIA", "r_regionkey"].iloc[0]
    nations = nation[nation["n_regionkey"] == asia_key][["n_nationkey", "n_name"]]
    nation_keys = set(int(k) for k in nations["n_nationkey"])

    sup = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sup = sup[sup["s_nationkey"].isin(nation_keys)]
    # dense array lookup (vectorized fancy-index, not a dict .map)
    snat_lut = np.full(int(sup["s_suppkey"].max()) + 1 if len(sup) else 1, -1, np.int64)
    snat_lut[sup["s_suppkey"].to_numpy()] = sup["s_nationkey"].to_numpy()

    cust_f = semi_join_keys(
        _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]),
        nation_keys, "c_nationkey",
    )
    # row-filter pushdown: date range pruned at the scan
    orders_f = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= np.datetime64("1995-01-01", "us"))
        & (pc.field("o_orderdate") < np.datetime64("1997-01-01", "us")),
    )
    orders_j = orders_f.join(
        cust_f, join_type="inner", num_partitions=P,
        on=("o_custkey",), right_on=("c_custkey",),
    ).select_columns(["o_orderkey", "c_nationkey"])

    import ray

    lut_ref = ray.put(snat_lut)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(lut_ref)
        sk = batch["l_suppkey"].to_numpy()
        s_nat = np.where(sk < len(lut), lut[np.minimum(sk, len(lut) - 1)], -1)
        keep = s_nat >= 0
        b = batch[keep]
        rev = b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy())
        out = pd.DataFrame(
            {"l_orderkey": b["l_orderkey"].to_numpy(), "s_nat": s_nat[keep], "rev": rev}
        )
        return out.groupby(["l_orderkey", "s_nat"], as_index=False)["rev"].sum()

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    partials = li.map_batches(score, batch_format="pandas", batch_size=None)
    joined = partials.join(
        orders_j, join_type="inner", num_partitions=P,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def local_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["s_nat"], batch["c_nationkey"]))

    local = joined.map_batches(local_only, batch_format="pyarrow", batch_size=None)
    merged = local.groupby("s_nat").aggregate(Sum("rev", alias_name="revenue")).to_pandas()
    out = merged.rename(columns={"s_nat": "n_nationkey"}).merge(nations, on="n_nationkey")
    out = out[["n_name", "revenue"]]
    out["revenue"] = round_half_away(out["revenue"].to_numpy(), 2)
    return out.sort_values("n_name").reset_index(drop=True)


# ------------------------------------------------------------ analytics


def ev_outliers_mad(sf_dir: str):
    """Per-user robust anomaly detection: median / MAD / count of
    values beyond 3 MADs (`analytics.mad_outliers`). Oracle: DuckDB
    quantile_cont medians + the same threshold."""
    from ..stages.analytics import mad_outliers

    ds = _read(sf_dir, "events", columns=["user_id", "value"])
    out = mad_outliers(ds, key="user_id", value_col="value", k=3.0)
    return _round_ds(out, {"med_value": 6, "mad_value": 6})


def ev_new_users_cum(sf_dir: str):
    """Cumulative distinct-user growth by first-seen day
    (`analytics.first_seen_cumulative`): per-user min day -> per-day
    new-user counts -> calendar-bounded running sum."""
    from ..stages.analytics import first_seen_cumulative

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    out = first_seen_cumulative(ds, key="user_id", ts_col="ts", freq="D")
    return out.rename(columns={"first_bucket": "first_day", "cum_keys": "cum_users"})


def doc_above_p90(sf_dir: str):
    """Quantile-threshold filter: documents whose n_chars strictly
    exceeds their language's exact p90, aggregated per language.
    Thresholds via the distributed histogram trick
    (`analytics.filter_above_group_quantile`) — exact at any corpus
    size when the value domain is bounded (int lengths)."""
    from ..stages.analytics import filter_above_group_quantile

    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])
    out = filter_above_group_quantile(ds, group_col="lang", value_col="n_chars", q=0.9)
    out = _rename_ds(out, {"threshold": "p90_chars"})
    return _round_ds(out, {"p90_chars": 6, "mean_above": 6})


def ev_dow_profile(sf_dir: str):
    """Day-of-week seasonality profile per event type
    (`analytics.dow_profile`, ISO 1=Mon..7=Sun)."""
    from ..stages.analytics import dow_profile

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    out = dow_profile(ds, ts_col="ts", group_col="event_type", value_col="value")
    return _round_ds(out, {"sum_value": 6, "mean_value": 6})


def doc_tfidf_top(sf_dir: str):
    """Per-document top TF-IDF term (`text.tfidf_top_term`):
    distributed explode -> DF groupby -> term hash-join -> per-doc
    argmax. Oracle: DuckDB string_split/unnest with the same
    tf*ln(N/df) score and term-asc tie-break."""
    from ..stages.text import tfidf_top_term

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = tfidf_top_term(ds, id_col="doc_id", text_col="text")
    return _round_ds(out, {"score": 6})


def cust_order_leftjoin(sf_dir: str):
    """LEFT OUTER join family: every customer with order count and
    total spend, zero-filled for customers with no orders
    (`Dataset.join(join_type="left_outer")` after a distributed
    per-customer pre-aggregation — the orders fact table never joins
    row-level)."""
    from ray.data.aggregate import Count, Sum

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    per_cust = orders.groupby("o_custkey").aggregate(
        Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total_spent")
    )
    joined = cust.join(
        per_cust,
        join_type="left_outer",
        num_partitions=_join_partitions(),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "c_custkey": batch["c_custkey"],
                "c_acctbal": round_half_away(batch["c_acctbal"].to_numpy(np.float64), 2),
                "n_orders": batch["n_orders"].fillna(0).astype(np.int64),
                "total_spent": round_half_away(
                    batch["total_spent"].fillna(0.0).to_numpy(np.float64), 2
                ),
            }
        )
        return out

    return joined.map_batches(finish, batch_format="pandas", batch_size=None)


def ev_funnel(sf_dir: str):
    """Ordered-funnel analysis: per user, earliest ts of each step
    (signup -> view -> purchase), then vectorized step-order checks.
    ONE int-keyed shuffle: per-batch (user, step, min_ts) partials
    carry an int8 step code and a user-hash partition id — no string
    column and no multi-key groupby in the exchange (measured 8x
    faster than groupby([user, event_type]) on the string key) — and
    the partition pass merges mins + pivots + flags in one vectorized
    sweep."""
    from ..stages.rollup import partitions_for_input

    steps = ("signup", "view", "purchase")
    step_code = {s: i for i, s in enumerate(steps)}
    P = partitions_for_input(None)

    ds = _read(
        sf_dir, "events", columns=["user_id", "event_type", "ts"],
        filter=pc.field("event_type").isin(steps),
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["step"] = batch["event_type"].map(step_code).astype(np.int8)
        out = batch.groupby(["user_id", "step"], as_index=False)["ts"].min()
        out = out.rename(columns={"ts": "first_ts"})
        out["_part"] = (
            pd.util.hash_pandas_object(out["user_id"], index=False).to_numpy() % P
        ).astype(np.int32)
        return out

    firsts = ds.map_batches(partial, batch_format="pandas")

    def funnel_part(df: pd.DataFrame) -> pd.DataFrame:
        # merge the per-batch partial mins for this user range, then
        # pivot step codes to columns
        df = df.groupby(["user_id", "step"], as_index=False)["first_ts"].min()
        df["event_type"] = df["step"].map({v: k for k, v in step_code.items()})
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "did_signup": pd.Series([], dtype=np.int64),
                    "did_view_after": pd.Series([], dtype=np.int64),
                    "did_purchase_after": pd.Series([], dtype=np.int64),
                }
            )
        wide = df.pivot(index="user_id", columns="event_type", values="first_ts")
        for s in steps:
            if s not in wide.columns:
                wide[s] = pd.NaT
        s1 = wide[steps[0]].notna()
        s2 = s1 & (wide[steps[1]] > wide[steps[0]])
        s3 = s2 & (wide[steps[2]] > wide[steps[1]])
        return pd.DataFrame(
            {
                "user_id": wide.index.to_numpy(),
                "did_signup": s1.to_numpy().astype(np.int64),
                "did_view_after": s2.to_numpy().astype(np.int64),
                "did_purchase_after": s3.to_numpy().astype(np.int64),
            }
        )

    return firsts.groupby("_part").map_groups(funnel_part, batch_format="pandas")


def ev_global_quantiles(sf_dir: str):
    """EXACT whole-table quantiles of a bounded-domain column at any
    corpus size: per-batch (value, count) histogram partials (each at
    most |domain| rows — ~49k for 2-decimal values — regardless of
    batch size), merged by a tiny driver-side groupby, then
    `analytics.quantile_from_counts`. No shuffle and no full-column
    sort: the bytes leaving each task are bounded by the value
    domain, not the row count."""
    from ..stages.analytics import quantile_from_counts

    ds = _read(sf_dir, "events", columns=["value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        uniq, counts = np.unique(batch["value"].to_numpy(np.float64), return_counts=True)
        return pd.DataFrame({"value": uniq, "n": counts.astype(np.int64)})

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=None).to_pandas()
    hist = parts.groupby("value", as_index=False)["n"].sum()
    v, c = hist["value"].to_numpy(), hist["n"].to_numpy()
    out = pd.DataFrame(
        {
            "n_events": np.array([int(c.sum())], dtype=np.int64),
            "p50": [quantile_from_counts(v, c, 0.5)],
            "p90": [quantile_from_counts(v, c, 0.9)],
            "p99": [quantile_from_counts(v, c, 0.99)],
        }
    )
    for col in ("p50", "p90", "p99"):
        out[col] = round_half_away(out[col].to_numpy(), 6)
    return out


def ev_grouping_sets(sf_dir: str):
    """GROUP BY GROUPING SETS ((type, day), (type), (day), ()) over
    events: two shuffle rounds total — the finest (type, day) level
    merges like any mergeable rollup, and every coarser level
    re-aggregates the already-tiny finest aggregate in one further
    tagged exchange (`olap.grouping_sets_aggregate`)."""
    from ..stages.olap import grouping_sets_aggregate

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def add_day(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["event_type", "value"]].copy()
        out["day"] = df["ts"].dt.strftime("%Y-%m-%d")
        return out

    ds = ds.map_batches(add_day, batch_format="pandas", batch_size=None)
    return grouping_sets_aggregate(
        ds,
        keys=["event_type", "day"],
        value_col="value",
        sets=[("event_type", "day"), ("event_type",), ("day",), ()],
    )


def ev_hopping_windows(sf_dir: str):
    """Hopping (sliding) 1h windows every 15m: each event lands in 4
    window starts via a vectorized hop-grid shift; only per-batch
    (window, n, scaled-sum) partials shuffle (`olap.hopping_rollup`)."""
    from ..stages.olap import hopping_rollup

    ds = _read(sf_dir, "events", columns=["ts", "value"])
    return hopping_rollup(ds, window="1h", hop="15m")


def ev_latest_state(sf_dir: str):
    """Latest-wins compaction: the current state row per user (max by
    (ts, event_id) — deterministic), i.e. the materialized UPSERT view
    of the event stream (`olap.latest_state`)."""
    from ..stages.olap import latest_state

    ds = _read(
        sf_dir, "events",
        columns=["user_id", "ts", "event_type", "value", "event_id"],
    )
    return latest_state(ds, key="user_id", order_cols=("ts", "event_id"))


def ev_tier_stitch(sf_dir: str):
    """Continuous-aggregate read path: an arbitrary minute-aligned
    range answered from the coarsest tiers that cover it (interior
    days from 1d, edge hours from 1h, minute fringes from 1m) —
    `olap.tier_stitch_aggregate`. One row per stitch segment; exact
    int64 sums make the segments telescope to the raw-range answer."""
    from ..stages.olap import tier_stitch_aggregate

    a = int(np.datetime64("2024-01-05T07:23:00", "us").astype(np.int64))
    b = int(np.datetime64("2024-01-27T19:41:00", "us").astype(np.int64))
    ds = _read(sf_dir, "events", columns=["ts", "value"])
    out = tier_stitch_aggregate(ds, a, b)
    out["seg_start"] = out["seg_start"].astype("datetime64[us]")
    out["seg_end"] = out["seg_end"].astype("datetime64[us]")
    return out


def ev_watermark_rollup(sf_dir: str):
    """Event-time streaming semantics, batch-deterministic: 1h tumbling
    windows with per-user watermarks (30m bounded delay) and 30m
    allowed lateness over a DISORDERED arrival log (deterministic
    SQL-expressible jitter of up to 2h on the arrival order, so the
    late/dropped paths are genuinely exercised) —
    `streaming.watermark_rollup`. One hash shuffle, one vectorized
    partition pass; no actors, no driver hop."""
    from ..stages.streaming import watermark_rollup

    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    def add_arrival(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        tus = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        jit = (df["event_id"].to_numpy() * 2654435761) % 7200
        out["arrival_us"] = tus + jit * 1_000_000
        return out

    ds = ds.map_batches(add_arrival, batch_format="pandas", batch_size=None)
    return watermark_rollup(
        ds,
        tier_us=3_600_000_000,
        key="user_id",
        seq_col="arrival_us",
        seq_tiebreak="event_id",
        delay_us=1_800_000_000,
        lateness_us=1_800_000_000,
    )


def ev_type_transitions(sf_dir: str):
    """Event-type transition matrix per user — the distributed
    equivalent of SQL ``lead(event_type) over (partition by user_id
    order by ts, event_id)`` + group count
    (`features.label_transition_matrix`). One narrow-column key-hash
    shuffle, one vectorized shifted-pair pass per partition; partials
    are |types|^2 rows so the merge is bounded."""
    from ..stages.features import label_transition_matrix

    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"])
    out = label_transition_matrix(
        ds, key_col="user_id", order_cols=("ts", "event_id"),
        label_col="event_type",
    )
    return out.rename(columns={"from_label": "from_type", "to_label": "to_type"})


def ev_rolling_median(sf_dir: str):
    """Order-statistic (holistic) window functions per user: trailing
    5-row median / min / max over (partition by user_id order by ts,
    event_id) — `features.rolling_order_stats`. One int-keyed hash
    shuffle, one lexsort + shifted-column nanmedian pass per
    partition; no per-row Python, no driver hop."""
    from ..stages.features import rolling_order_stats

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    out = rolling_order_stats(
        ds, key="user_id", order_cols=("ts", "event_id"), value_col="value",
        id_cols=("event_id",), window=5,
    )
    out = out.select_columns(["event_id", "user_id", "med_w", "min_w", "max_w"])
    return _round_ds(out, {"med_w": 6, "min_w": 6, "max_w": 6})


def ev_top_hours_per_type(sf_dir: str):
    """Per-group top-k: the 3 busiest hours (by event count) for each
    event_type, with hour-level sums. Scale shape: per-batch Arrow
    partial aggregates -> one (type, hour) merge shuffle -> per-block
    partial top-3-per-type (bounded: blocks x |types| x 3 rows reach
    the driver) -> final top-3 + rank. Ties break on earlier hour."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "hour_start": hour,
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
                "value": batch["value"],
            }
        )
        return t.group_by(["event_type", "hour_start"]).aggregate(
            [("n", "sum"), ("value", "sum")]
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["event_type", "hour_start"])
        .aggregate(
            Sum("n_sum", alias_name="n"), Sum("value_sum", alias_name="sv")
        )
    )

    def part_top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["event_type", "n", "hour_start"], ascending=[True, False, True]
        )
        return df.groupby("event_type", sort=False).head(3)

    df = merged.map_batches(part_top, batch_format="pandas").to_pandas()
    df = df.sort_values(
        ["event_type", "n", "hour_start"], ascending=[True, False, True]
    )
    df = df.groupby("event_type", sort=False).head(3).reset_index(drop=True)
    df["rnk"] = df.groupby("event_type", sort=False).cumcount() + 1
    df["sum_value"] = round_half_away(df["sv"].to_numpy(dtype=np.float64), 6)
    return df[["event_type", "hour_start", "n", "sum_value", "rnk"]]


def ev_dist_funcs(sf_dir: str):
    """Distribution window functions per user: percent_rank() and
    cume_dist() over (partition by user_id order by value) with exact
    SQL tie semantics — `features.analytic_dist_funcs`, one int-keyed
    shuffle + one lexsort/boundary-mask pass per partition."""
    from ..stages.features import analytic_dist_funcs

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    out = analytic_dist_funcs(
        ds, key="user_id", order_value="value", id_cols=("event_id",),
    )
    out = out.select_columns(["event_id", "user_id", "pct_rank", "cume_d"])
    return _round_ds(out, {"pct_rank": 9, "cume_d": 9})


def ev_type_correlation(sf_dir: str):
    """Pairwise Pearson correlation between event types, one
    observation per hour (hourly count vectors, absent types = 0) —
    `analytics.pairwise_correlation`. Per-batch Arrow (hour, type)
    partials feed a bucket-hash shuffle; each partition pivots and
    emits exact int64 moment partials per type pair (X^T X matmul);
    the driver merges |types|^2/2 x P rows and finishes the
    closed-form correlation."""
    from ..stages.analytics import pairwise_correlation

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "hour_start": pc.floor_temporal(batch["ts"], unit="hour"),
                "event_type": batch["event_type"],
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )
        return t.group_by(["hour_start", "event_type"]).aggregate([("n", "sum")])

    agg = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    out = pairwise_correlation(agg, "hour_start", "event_type", "n_sum")
    out = out.rename(columns={"label_a": "type_a", "label_b": "type_b"})
    out["corr_n"] = round_half_away(out["corr_n"].to_numpy(np.float64), 9)
    return out[["type_a", "type_b", "n_buckets", "corr_n"]]


def ev_edge_funcs(sf_dir: str):
    """Frame-edge window functions per user: first_value, last_value
    (full-frame) and nth_value(value, 3) over (partition by user_id
    order by ts, event_id) — `features.analytic_edge_funcs`."""
    from ..stages.features import analytic_edge_funcs

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    out = analytic_edge_funcs(
        ds, key="user_id", order_cols=("ts", "event_id"), value_col="value",
        id_cols=("event_id",), nth=3,
    )
    return out.select_columns(["event_id", "user_id", "first_v", "last_v", "nth_v"])


# ------------------------------------------- irregular-time aggregates


def ev_time_weighted_avg(sf_dir: str):
    """LOCF time-weighted average of `value` per user over the
    irregular event series (`temporal.time_weighted_avg` —
    TimescaleDB time_weight semantics, exact scaled-int64 integrals)."""
    from ..stages.temporal import time_weighted_avg

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    out = time_weighted_avg(
        ds, key="user_id", ts_col="ts", value_col="value",
        order_cols=("ts", "event_id"), value_scale=100,
    )
    return _round_ds(out, {"span_s": 6, "twa": 6})


def ev_counter_rate(sf_dir: str):
    """Reset-aware counter increase per user (Prometheus increase()
    over a restartable counter): `temporal.counter_increase`, exact
    scaled-int64 deltas."""
    from ..stages.temporal import counter_increase

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    out = counter_increase(
        ds, key="user_id", ts_col="ts", value_col="value",
        order_cols=("ts", "event_id"), value_scale=100,
    )
    return _round_ds(out, {"total_increase": 2})


def ev_interval_coverage(sf_dir: str):
    """Union-of-intervals coverage per user: each event opens a
    half-open interval [ts, ts + value minutes); overlapping intervals
    merge (gaps-and-islands) and the total covered seconds + island
    count are reported (`temporal.interval_coverage`, exact int64 us)."""
    from ..stages.temporal import interval_coverage

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def derive(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        dur = np.round(batch["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64) * 600_000
        return pa.table(
            {
                "user_id": batch["user_id"],
                "_iv_start_us": pa.array(ts),
                "_iv_end_us": pa.array(ts + dur),
            }
        )

    ds = ds.map_batches(derive, batch_format="pyarrow", batch_size=None)
    out = interval_coverage(ds, key="user_id")
    return _round_ds(out, {"covered_s": 6})


def ev_local_day(sf_dir: str):
    """Civil-time calendar rollup: events bucketed by their LOCAL
    calendar date in America/New_York (DST-correct conversion) with
    count + exact sum (`temporal.local_day_rollup`, mergeable
    partials — only (date, n, scaled-sum) rows shuffle)."""
    from ..stages.temporal import local_day_rollup

    ds = _read(sf_dir, "events", columns=["ts", "value"])
    out = local_day_rollup(ds, ts_col="ts", tz="America/New_York", value_col="value", value_scale=100)
    return _round_ds(out, {"sum_value": 2})


# ------------------------------------------- relational coverage (2)


def q4_order_priority(sf_dir: str):
    """TPC-H Q4 shape (EXISTS semi-join, adapted to this schema
    subset): orders placed in 1996Q1 with at least one RETURNED line,
    counted per priority.  Returned-line keys are Bloom-prefiltered by
    the (quarter-sized) orders side, made distinct via a fixed-width
    int-key groupby, then hash-joined — no driver key sets."""
    from ray.data.aggregate import Sum

    from ..stages.join import bloom_semi_filter, build_bloom

    P = _join_partitions()
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= np.datetime64("1996-01-01", "us"))
        & (pc.field("o_orderdate") < np.datetime64("1996-04-01", "us")),
    ).select_columns(["o_orderkey", "o_orderpriority"]).materialize()

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"],
        filter=pc.field("l_returnflag") == "R",
    ).select_columns(["l_orderkey"])
    # the quarter's order keys prune most returned lines before the
    # distinct shuffle (false positives are removed by the exact join)
    bloom = build_bloom(orders, "o_orderkey")
    li = bloom_semi_filter(li, "l_orderkey", bloom)

    def batch_distinct(batch: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": pc.unique(batch["l_orderkey"])})

    li_keys = (
        li.map_batches(batch_distinct, batch_format="pyarrow", batch_size=None)
        .groupby("l_orderkey")
        .count()  # exact distinct: one row per returned order key
    )
    joined = orders.join(
        li_keys, join_type="inner", num_partitions=P,
        on=("o_orderkey",), right_on=("l_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["o_orderpriority"]).aggregate([([], "count_all")])

    out = (
        joined.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("o_orderpriority")
        .aggregate(Sum("count_all", alias_name="n_orders"))
    )
    return out


def q14_promo_ratio(sf_dir: str):
    """TPC-H Q14 shape: promo-type revenue share for one month.
    part is a broadcast dimension (ray.put once, cached per worker);
    revenue accumulates as exact 1e-4-scaled int64 products so the
    final percentage is bit-identical to the SQL engine's."""
    from ray.data.aggregate import Sum

    from ..stages.join import broadcast_join

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") >= np.datetime64("1996-03-01", "us"))
        & (pc.field("l_shipdate") < np.datetime64("1996-04-01", "us")),
    ).select_columns(["l_partkey", "l_extendedprice", "l_discount"])
    part_df = (
        _read(sf_dir, "part", columns=["p_partkey", "p_type"])
        .to_pandas()  # dimension table: bounded by catalog size, not corpus
        .rename(columns={"p_partkey": "l_partkey"})
    )
    part_df["is_promo"] = (part_df["p_type"] == "PROMO").to_numpy()
    joined = broadcast_join(li, part_df[["l_partkey", "is_promo"]], on="l_partkey")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        p = np.round(batch["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        d = np.round((1.0 - batch["l_discount"].to_numpy()) * 100).astype(np.int64)
        rev = p * d  # exact revenue * 1e4
        promo = batch["is_promo"].to_numpy()
        return pd.DataFrame(
            {"promo_rev": [rev[promo].sum()], "total_rev": [rev.sum()], "n": [len(rev)]}
        )

    agg = joined.map_batches(partial, batch_format="pandas", batch_size=None).aggregate(
        Sum("promo_rev", alias_name="pr"),
        Sum("total_rev", alias_name="tr"),
        Sum("n", alias_name="n_lines"),
    )
    pct = 100.0 * float(agg["pr"]) / float(agg["tr"])
    return pd.DataFrame(
        {"promo_pct": round_half_away(pct, 6), "n_lines": [int(agg["n_lines"])]}
    )


def q18_big_orders(sf_dir: str):
    """TPC-H Q18 shape: orders whose total quantity exceeds 150, top
    10 by (o_totalprice desc, o_orderkey).  Per-batch scaled-int
    quantity partials -> small groupby -> threshold filter; only the
    qualifying keys join orders; block-local partial top-k bounds the
    driver to k rows per block; the customer dimension is fetched by
    key pushdown (10 keys)."""
    from ..stages.join import hash_groupby_sum

    P = _join_partitions()
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def scale(batch: pa.Table) -> pa.Table:
        q = pc.cast(
            pc.round(pc.multiply(batch["l_quantity"], pa.scalar(100.0))), pa.int64()
        )
        return pa.table({"l_orderkey": batch["l_orderkey"], "qty_scaled": q})

    totals = hash_groupby_sum(
        li.map_batches(scale, batch_format="pyarrow", batch_size=None),
        key="l_orderkey", sum_cols=("qty_scaled",),
    ).filter(expr="qty_scaled > 15000")
    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    joined = orders.join(
        totals, join_type="inner", num_partitions=P,
        on=("o_orderkey",), right_on=("l_orderkey",),
    )

    def local_top(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(10)

    cand = joined.map_batches(local_top, batch_format="pandas", batch_size=None).to_pandas()
    top = cand.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).head(10)
    cust = (
        _read(
            sf_dir, "customer", columns=["c_custkey", "c_name"],
            filter=pc.field("c_custkey").isin(top["o_custkey"].tolist()),
        ).to_pandas()  # <= 10 rows by key pushdown
    )
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey")
    out["sum_qty"] = out.pop("qty_scaled").to_numpy(dtype=np.int64) / 100.0
    return out[
        ["c_name", "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"]
    ].reset_index(drop=True)


def q19_disjunctive(sf_dir: str):
    """TPC-H Q19 shape: disjunctive brand/size/quantity predicates over
    the part-lineitem join, single-row revenue.  part is broadcast;
    the OR-of-ANDs evaluates as vectorized numpy masks; revenue sums
    exactly in 1e-4-scaled int64."""
    from ray.data.aggregate import Sum

    from ..stages.join import broadcast_join

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    part_df = (
        _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
        .to_pandas()
        .rename(columns={"p_partkey": "l_partkey"})
    )
    joined = broadcast_join(li, part_df, on="l_partkey")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        brand = batch["p_brand"].to_numpy()
        size = batch["p_size"].to_numpy()
        qty = batch["l_quantity"].to_numpy()
        m = (
            (brand == "Brand#11") & (size <= 20) & (qty >= 1) & (qty <= 30)
        ) | ((brand == "Brand#22") & (size <= 30) & (qty >= 5) & (qty <= 40))
        p = np.round(batch["l_extendedprice"].to_numpy()[m] * 100).astype(np.int64)
        d = np.round((1.0 - batch["l_discount"].to_numpy()[m]) * 100).astype(np.int64)
        return pd.DataFrame({"rev": [(p * d).sum()], "n": [int(m.sum())]})

    agg = joined.map_batches(partial, batch_format="pandas", batch_size=None).aggregate(
        Sum("rev", alias_name="rev"), Sum("n", alias_name="n_lines")
    )
    return pd.DataFrame(
        {
            "revenue": round_half_away(float(agg["rev"]) / 1e4, 2),
            "n_lines": [int(agg["n_lines"])],
        }
    )


def doc_decontaminate(sf_dir: str):
    """Benchmark decontamination: documents with doc_id % 97 == 0 form
    the held-out benchmark; every training doc sharing a distinct word
    5-gram with any benchmark doc is reported with its shared-gram
    count (`text.benchmark_contamination` — gram-string hash join, no
    driver gram sets)."""
    from ..stages.text import benchmark_contamination

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def flag(batch: pa.Table) -> pa.Table:
        is_bench = (batch["doc_id"].to_numpy() % 97) == 0
        return batch.append_column("_is_bench", pa.array(is_bench))

    ds = ds.map_batches(flag, batch_format="pyarrow", batch_size=None)
    return benchmark_contamination(ds, id_col="doc_id", text_col="text", n=5)


def doc_hamming_pairs(sf_dir: str):
    """Near-match pairs on the 16-char document prefix under Hamming
    distance <= 1 via lossless pigeonhole half-key blocking
    (`dedup.hamming_prefix_pairs`) — the exact-recall counterpart of
    the LSH near-dup family."""
    from ..stages.dedup import hamming_prefix_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return hamming_prefix_pairs(ds, key_len=16, max_dist=1)


def doc_mode_source(sf_dir: str):
    """Per-language mode: the most frequent source (ties broken by
    smallest source string).  Per-batch Arrow count partials -> tiny
    (lang, source) merge -> per-lang argmax; only fixed-width partials
    shuffle."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["lang", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["lang", "source"]).aggregate([([], "count_all")])

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["lang", "source"])
        .aggregate(Sum("count_all", alias_name="n_docs"))
    )

    def best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_docs", "source"], ascending=[False, True], kind="stable")
        return pd.DataFrame(
            {
                "lang": [g["lang"].iloc[0]],
                "top_source": [g["source"].iloc[0]],
                "n_docs": [np.int64(g["n_docs"].iloc[0])],
            }
        )

    return merged.groupby("lang").map_groups(best, batch_format="pandas")


def doc_regex_extract(sf_dir: str):
    """Structured-field extraction: per document, the count and first
    occurrence of words starting 'st' (`text.extract_regex` actor pool
    — pattern compiled once per actor)."""
    from ..stages.text import extract_regex

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = extract_regex(ds, pattern="st[a-z]+")
    return out.select_columns(["doc_id", "n_matches", "first_match"])


def doc_source_entropy(sf_dir: str):
    """Per-language Shannon entropy (bits) of the source distribution:
    per-batch Arrow (lang, source) count partials -> tiny merge ->
    per-lang closed form H = log2(n) - sum(c*log2(c))/n over the
    bounded count table.  Only fixed-width partials shuffle."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["lang", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["lang", "source"]).aggregate([([], "count_all")])

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["lang", "source"])
        .aggregate(Sum("count_all", alias_name="c"))
    )

    def ent(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(dtype=np.float64)
        n = c.sum()
        h = np.log2(n) - float((c * np.log2(c)).sum()) / n
        return pd.DataFrame(
            {
                "lang": [g["lang"].iloc[0]],
                "source_entropy": [h],
                "n_docs": [np.int64(n)],
                "n_sources": [np.int64(len(c))],
            }
        )

    out = merged.groupby("lang").map_groups(ent, batch_format="pandas")
    return _round_ds(out, {"source_entropy": 6})


def doc_top_ngrams(sf_dir: str):
    """Corpus-level boilerplate mining: the 20 word trigrams appearing
    in the most documents (document frequency over per-doc DISTINCT
    grams), ties broken lexicographically.  Explode -> gram-key count
    shuffle -> block-local partial top-20 bounds the driver to 20 rows
    per block."""
    from ..stages.text import _explode_word_grams, gram_counts

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    grams = _explode_word_grams(ds, "doc_id", "text", n=3)
    # int-keyed exchange: string gram keys never enter a Ray sort
    df = _rename_ds(gram_counts(grams.select_columns(["g"])), {"n": "n_docs"})

    def local_top(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(
            ["n_docs", "g"], ascending=[False, True], kind="stable"
        ).head(20)

    cand = df.map_batches(local_top, batch_format="pandas", batch_size=None).to_pandas()
    top = cand.sort_values(["n_docs", "g"], ascending=[False, True]).head(20)
    top = top.rename(columns={"g": "gram"})
    top["n_docs"] = top["n_docs"].astype(np.int64)
    return top.reset_index(drop=True)


def orders_by_segment(sf_dir: str):
    """Market-segment revenue rollup through the SKEW-AWARE hybrid
    join (`join.skew_join`): orders (fact) x customer (dimension) on
    custkey — hot fact keys ride a broadcast path, the rest a hash
    shuffle; the result is identical to a plain join, which the oracle
    asserts.  Money sums accumulate in scaled int64 cents."""
    from ray.data.aggregate import Sum

    from ..stages.join import skew_join

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = skew_join(orders, cust, fact_key="o_custkey", dim_key="c_custkey")

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(batch["o_totalprice"], pa.scalar(100.0))), pa.int64()
        )
        return (
            pa.table({"c_mktsegment": batch["c_mktsegment"], "cents": cents})
            .group_by(["c_mktsegment"])
            .aggregate([("cents", "sum"), ([], "count_all")])
        )

    merged = (
        joined.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("c_mktsegment")
        .aggregate(
            Sum("cents_sum", alias_name="cents"),
            Sum("count_all", alias_name="n_orders"),
        )
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["revenue"] = batch.pop("cents").to_numpy(dtype=np.int64) / 100.0
        batch["n_orders"] = batch["n_orders"].astype(np.int64)
        return batch

    return merged.map_batches(finish, batch_format="pandas", batch_size=None)


def emb_ann_filtered(sf_dir: str):
    """Filtered vector search (metadata predicate + top-k): exact
    cosine top-10 among vectors with label == 3 only.  The predicate
    is applied BEFORE scoring (pre-filter plan), so non-matching
    vectors never reach the distance kernel — the standard filtered-ANN
    execution shape; same deterministic partial-top-k merge as
    `emb_ann_topk`."""
    from ..stages.similarity import ann_brute_force

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    ds = ds.filter(expr="label == 3").select_columns(["vec_id", "embedding"])
    q = _query_vec(sf_dir)[None, :]
    df = ann_brute_force(ds, q, k=50, concurrency=2).to_pandas()
    df["score"] = round_half_away(df["score"].to_numpy(), 6)
    df = df.sort_values(["score", "vec_id"], ascending=[False, True]).head(10)
    return df[["vec_id", "score"]].reset_index(drop=True)


def doc_dup_spans(sf_dir: str):
    """Exact duplicate-span coverage per document (Lee et al.
    ExactSubstr projection): fraction of each doc's token stream
    covered by the merged union of word 8-gram occurrences shared with
    at least one other document (`dedup.duplicate_span_coverage` —
    positions explode, gram-keyed DF join, interval-union islands)."""
    from ..stages.dedup import duplicate_span_coverage

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = duplicate_span_coverage(ds, n=8)
    return _round_ds(out, {"dup_ratio": 6})


def ev_seasonal_mase(sf_dir: str):
    """Forecast-baseline quality per user: MASE of the seasonal-naive
    (lag-24h) predictor over each user's DENSE hourly event-count
    series — counts are integers, so the absolute-error sums are exact
    int64 and the final ratio is bit-identical to the SQL engine's.
    One narrow (user, hour, n) partial shuffle; each partition
    densifies its users on the global calendar grid vectorized."""
    from ray.data.aggregate import Sum

    from ..stages.rollup import partitions_for_input

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    # global calendar window: min/max event hour (two tiny aggregates)
    def hour_minmax(batch: pa.Table) -> pa.Table:
        h = pc.floor_temporal(batch["ts"], unit="hour")
        return pa.table({"lo": [pc.min(h).as_py()], "hi": [pc.max(h).as_py()]})

    mm = ds.map_batches(hour_minmax, batch_format="pyarrow", batch_size=None).to_pandas()
    lo = mm["lo"].min().to_datetime64().astype("datetime64[h]")
    hi = mm["hi"].max().to_datetime64().astype("datetime64[h]")
    n_hours = int((hi - lo) / np.timedelta64(1, "h")) + 1

    def partial(batch: pa.Table) -> pa.Table:
        h = pc.floor_temporal(batch["ts"], unit="hour")
        return (
            pa.table({"user_id": batch["user_id"], "hour": h})
            .group_by(["user_id", "hour"])
            .aggregate([([], "count_all")])
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["user_id", "hour"])
        .aggregate(Sum("count_all", alias_name="n"))
    )

    P = partitions_for_input(None)

    def add_part(batch: pa.Table) -> pa.Table:
        part = (
            pd.util.hash_pandas_object(batch["user_id"].to_pandas(), index=False)
            .to_numpy() % P
        ).astype(np.int32)
        return batch.append_column("_part", pa.array(part))

    tagged = counts.map_batches(add_part, batch_format="pyarrow", batch_size=None)

    def mase_part(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        idx_all = (
            (df["hour"].to_numpy().astype("datetime64[h]") - lo)
            / np.timedelta64(1, "h")
        ).astype(np.int64)
        for uid, g_idx in df.groupby("user_id", sort=False).indices.items():
            dense = np.zeros(n_hours, dtype=np.int64)
            dense[idx_all[g_idx]] = df["n"].to_numpy()[g_idx]
            sae_seasonal = np.abs(dense[24:] - dense[:-24]).sum()
            sae_naive = np.abs(dense[1:] - dense[:-1]).sum()
            out.append((uid, int(dense.sum()), int(sae_seasonal), int(sae_naive)))
        r = pd.DataFrame(
            out, columns=["user_id", "n_events", "sae_seasonal", "sae_naive"]
        )
        # scale both to the same horizon count before the ratio, exactly
        # as the SQL mirror does
        r["mase"] = np.where(
            r["sae_naive"] > 0,
            (r["sae_seasonal"].to_numpy(dtype=np.float64) / (n_hours - 24))
            / (r["sae_naive"].to_numpy(dtype=np.float64) / (n_hours - 1)),
            np.nan,
        )
        return r

    out = tagged.groupby("_part").map_groups(mase_part, batch_format="pandas")
    return _round_ds(out, {"mase": 6})


def ev_pareto_types(sf_dir: str):
    """Pareto ranking: event types by total count with running
    cumulative share (the 80/20 view).  Mergeable count partials; the
    |types|-row result computes shares from exact int64 counts, so the
    floats are bit-identical to the SQL engine's."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["event_type"]).aggregate([([], "count_all")])

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("event_type")
        .aggregate(Sum("count_all", alias_name="n_events"))
        .to_pandas()  # |types| rows
    )
    merged = merged.sort_values(
        ["n_events", "event_type"], ascending=[False, True]
    ).reset_index(drop=True)
    total = merged["n_events"].to_numpy(dtype=np.int64).sum()
    cum = merged["n_events"].to_numpy(dtype=np.int64).cumsum()
    merged["rank"] = np.arange(1, len(merged) + 1, dtype=np.int64)
    merged["share"] = round_half_away(merged["n_events"].to_numpy(np.int64) / total, 6)
    merged["cum_share"] = round_half_away(cum / total, 6)
    merged["n_events"] = merged["n_events"].astype(np.int64)
    return merged[["event_type", "n_events", "rank", "share", "cum_share"]]


def ev_type_cooccurrence(sf_dir: str):
    """Market-basket co-occurrence: for every unordered pair of event
    types, how many users produced BOTH.  The type domain is tiny, so
    each partition reduces its users to a type BITMASK (one int per
    user) and pair counts come from vectorized mask tests — no
    pair-explosion shuffle; only |types|^2 partials merge."""
    from ray.data.aggregate import Sum

    from ..stages.rollup import partitions_for_input

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    types = sorted(
        ds.map_batches(
            lambda t: pa.table({"event_type": pc.unique(t["event_type"])}),
            batch_format="pyarrow", batch_size=None,
        ).to_pandas()["event_type"].unique()
    )
    t_idx = {t: i for i, t in enumerate(types)}
    P = partitions_for_input(None)

    def add_part(batch: pa.Table) -> pa.Table:
        part = (
            pd.util.hash_pandas_object(batch["user_id"].to_pandas(), index=False)
            .to_numpy() % P
        ).astype(np.int32)
        return batch.append_column("_part", pa.array(part))

    tagged = ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        code = df["event_type"].map(t_idx).to_numpy(dtype=np.int64)
        masks = (
            pd.DataFrame({"u": df["user_id"].to_numpy(), "m": np.int64(1) << code})
            .groupby("u")["m"]
            .agg(lambda s: np.bitwise_or.reduce(s.to_numpy()))
            .to_numpy()
        )
        rows = []
        for i in range(len(types)):
            for j in range(i + 1, len(types)):
                both = int((((masks >> i) & 1) & ((masks >> j) & 1)).sum())
                rows.append((types[i], types[j], both))
        return pd.DataFrame(rows, columns=["type_a", "type_b", "n_users"])

    out = (
        tagged.groupby("_part").map_groups(pair_partial, batch_format="pandas")
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        batch["n_users"] = batch["n_users"].astype(np.int64)
        return batch

    return out.map_batches(cast, batch_format="pandas", batch_size=None)


def ev_theilsen_trend(sf_dir: str):
    """Robust trend per event type: the Theil-Sen slope (median of all
    pairwise slopes, Sen 1968) of the hourly count series.  Counts are
    mergeable int partials; the dense hourly grid per type is
    calendar-bounded, so the O(H^2) pairwise slope matrix is a cheap
    vectorized computation on partials — never on raw rows."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        h = pc.floor_temporal(batch["ts"], unit="hour")
        return (
            pa.table({"event_type": batch["event_type"], "hour": h})
            .group_by(["event_type", "hour"])
            .aggregate([([], "count_all")])
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["event_type", "hour"])
        .aggregate(Sum("count_all", alias_name="n"))
    )

    # global hour window (shared dense grid; same convention as
    # ev_seasonal_mase)
    mm = counts.to_pandas()
    lo = mm["hour"].min().to_datetime64().astype("datetime64[h]")
    n_hours = int(
        (mm["hour"].max().to_datetime64().astype("datetime64[h]") - lo)
        / np.timedelta64(1, "h")
    ) + 1

    def theil_sen(g: pd.DataFrame) -> pd.DataFrame:
        dense = np.zeros(n_hours, dtype=np.int64)
        idx = (
            (g["hour"].to_numpy().astype("datetime64[h]") - lo)
            / np.timedelta64(1, "h")
        ).astype(np.int64)
        dense[idx] = g["n"].to_numpy()
        h = np.arange(n_hours, dtype=np.float64)
        dv = dense[None, :] - dense[:, None]
        dh = h[None, :] - h[:, None]
        iu = np.triu_indices(n_hours, k=1)
        slopes = dv[iu] / dh[iu]
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_hours": [np.int64(n_hours)],
                "ts_slope": [float(np.median(slopes))],
            }
        )

    out = (
        counts.groupby("event_type").map_groups(theil_sen, batch_format="pandas")
    )
    return _round_ds(out, {"ts_slope": 6})


def ev_json_props(sf_dir: str):
    """Semi-structured extraction: parse the events ``props`` JSON
    column (`text.extract_json_fields` actor pool), project field
    ``k``, and aggregate exact int stats per event type — the
    log-enrichment shape of an ingestion pipeline."""
    from ray.data.aggregate import Max, Min, Sum

    from ..stages.text import extract_json_fields

    ds = _read(sf_dir, "events", columns=["event_type", "props"])
    ex = extract_json_fields(ds, "props", ["k"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch["j_k"].to_numpy(dtype=np.int64)
        g = pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "n": np.ones(len(k), dtype=np.int64),
                "sum_k": k, "min_k": k, "max_k": k,
                "n_high": (k >= 50).astype(np.int64),
            }
        )
        return g.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), sum_k=("sum_k", "sum"), min_k=("min_k", "min"),
            max_k=("max_k", "max"), n_high=("n_high", "sum"),
        )

    out = (
        ex.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n_events"),
            Sum("sum_k", alias_name="sum_k"),
            Min("min_k", alias_name="min_k"),
            Max("max_k", alias_name="max_k"),
            Sum("n_high", alias_name="n_high"),
        )
    )

    def cast(batch: pd.DataFrame) -> pd.DataFrame:
        for c in ("n_events", "sum_k", "min_k", "max_k", "n_high"):
            batch[c] = batch[c].astype(np.int64)
        return batch

    return out.map_batches(cast, batch_format="pandas", batch_size=None)


def q7_nation_volume(sf_dir: str):
    """TPC-H Q7 shape: shipping volume between nation pairs by year
    (supplier nation -> customer nation), restricted to two nations
    either way.  Plan: ONE large-large hash join (lineitem x orders on
    orderkey, bloom-prefiltered); every dimension hop
    (supplier->nation, customer->nation) is a broadcast map — the
    catalog side never shuffles.  Revenue accumulates as exact
    1e-4-scaled int64."""
    from ray.data.aggregate import Sum

    from ..stages.join import bloom_semi_filter, broadcast_join, build_bloom

    NA, NB = "NATION_1", "NATION_2"
    P = _join_partitions()

    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nation["n_nationkey"], nation["n_name"]))
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp["supp_nation"] = supp["s_nationkey"].map(nmap)
    supp = supp[supp["supp_nation"].isin([NA, NB])][["s_suppkey", "supp_nation"]]
    supp = supp.rename(columns={"s_suppkey": "l_suppkey"})
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    cust["cust_nation"] = cust["c_nationkey"].map(nmap)
    cust = cust[cust["cust_nation"].isin([NA, NB])][["c_custkey", "cust_nation"]]
    cust = cust.rename(columns={"c_custkey": "o_custkey"})

    def _empty_result() -> pd.DataFrame:
        # tiny scales can drain a dimension side entirely; downstream
        # empty pandas blocks lose their schema and Ray's hash-shuffle
        # join crashes on column-less partitions — short-circuit with
        # the exact typed output frame (matches the 0-row oracle)
        return pd.DataFrame(
            {
                "supp_nation": pd.Series([], dtype=object),
                "cust_nation": pd.Series([], dtype=object),
                "l_year": pd.Series([], dtype=np.int64),
                "n_lines": pd.Series([], dtype=np.int64),
                "revenue": pd.Series([], dtype=np.float64),
            }
        )

    if supp.empty or cust.empty:
        return _empty_result()

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    # inner broadcast join drops lines whose supplier is outside the
    # nation pair immediately — the cheapest possible prefilter
    li = broadcast_join(li, supp, on="l_suppkey")

    def li_prep(batch: pd.DataFrame) -> pd.DataFrame:
        p = np.round(batch["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        d = np.round((1.0 - batch["l_discount"].to_numpy()) * 100).astype(np.int64)
        out = pd.DataFrame(
            {
                "l_orderkey": batch["l_orderkey"].to_numpy(),
                "supp_nation": batch["supp_nation"],
                "l_year": batch["l_shipdate"].dt.year.astype(np.int64),
                "rev": p * d,
            }
        )
        return out

    li_f = li.map_batches(li_prep, batch_format="pandas", batch_size=None).materialize()
    if li_f.schema() is None:  # all lines filtered out: empty, schema-less
        return _empty_result()
    bloom = build_bloom(li_f, "l_orderkey")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    orders = bloom_semi_filter(orders, "o_orderkey", bloom)
    orders = broadcast_join(orders, cust, on="o_custkey")
    joined = li_f.join(
        orders, join_type="inner", num_partitions=P,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch["supp_nation"] != batch["cust_nation"]  # cross-pair only
        g = batch.loc[m, ["supp_nation", "cust_nation", "l_year", "rev"]]
        out = g.groupby(["supp_nation", "cust_nation", "l_year"], as_index=False).agg(
            rev=("rev", "sum"), n=("rev", "size")
        )
        return out

    merged = (
        joined.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby(["supp_nation", "cust_nation", "l_year"])
        .aggregate(Sum("rev", alias_name="rev"), Sum("n", alias_name="n_lines"))
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["revenue"] = round_half_away(
            batch.pop("rev").to_numpy(dtype=np.float64) / 1e4, 2
        )
        batch["n_lines"] = batch["n_lines"].astype(np.int64)
        return batch

    return merged.map_batches(finish, batch_format="pandas", batch_size=None)


def q13_customer_orders_dist(sf_dir: str):
    """TPC-H Q13 shape: distribution of customers by order count
    (orders filtered to non-URGENT). Scale path: NO left join — the
    zero-order bucket is the COMPLEMENT count (total customers minus
    customers seen in orders), so only per-customer count partials and
    a bounded histogram (max orders per customer ≈ tens) ever move;
    the driver merges one tiny count-of-counts frame per block."""
    from ray.data.aggregate import Sum

    orders = _read(
        sf_dir, "orders", columns=["o_custkey", "o_orderpriority"],
        filter=pc.field("o_orderpriority") != "1-URGENT",
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"o_custkey": batch["o_custkey"]})
        t = t.append_column("n", pa.array(np.ones(len(t), np.int64)))
        return t.group_by(["o_custkey"]).aggregate([("n", "sum")])

    per_cust = (
        orders.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("o_custkey")
        .aggregate(Sum("n_sum", alias_name="c_count"))
    )

    def hist_partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch["c_count"].value_counts()
        return pd.DataFrame(
            {"c_count": vc.index.to_numpy(np.int64),
             "custdist": vc.to_numpy(np.int64)}
        )

    hist = (
        per_cust.map_batches(hist_partial, batch_format="pandas", batch_size=None)
        .to_pandas()
        .groupby("c_count", as_index=False)["custdist"].sum()
    )
    n_cust = _read(sf_dir, "customer", columns=["c_custkey"]).count()
    zero = int(n_cust - hist["custdist"].sum())
    if zero > 0:
        hist = pd.concat(
            [hist, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True,
        )
    hist = hist.sort_values(
        ["custdist", "c_count"], ascending=[False, False]
    ).reset_index(drop=True)
    hist["c_count"] = hist["c_count"].astype(np.int64)
    hist["custdist"] = hist["custdist"].astype(np.int64)
    return hist


def q15_top_supplier(sf_dir: str):
    """TPC-H Q15 shape: supplier(s) with max revenue in a quarter.
    Scale path: lineitem streams once emitting exact scale-1e4 int64
    revenue partials per suppkey; the global argmax uses per-block
    partial maxima (ties kept), so the driver sees at most a handful
    of rows per block; winner names come from a key-filter-pushdown
    supplier read."""
    from ray.data.aggregate import Sum

    li = _read(
        sf_dir, "lineitem",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") >= np.datetime64("1996-01-01", "us"))
        & (pc.field("l_shipdate") < np.datetime64("1996-04-01", "us")),
    )

    def partial(batch: pa.Table) -> pa.Table:
        ep_i = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        d_i = pc.cast(pc.round(pc.multiply(batch["l_discount"], pa.scalar(100.0))), pa.int64())
        rev4 = pc.multiply(ep_i, pc.subtract(pa.scalar(100, pa.int64()), d_i))
        return pa.table({"l_suppkey": batch["l_suppkey"], "rev4": rev4}).group_by(
            ["l_suppkey"]
        ).aggregate([("rev4", "sum")])

    totals = (
        li.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("l_suppkey")
        .aggregate(Sum("rev4_sum", alias_name="rev4"))
    )

    def block_max(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        return df[df["rev4"] == df["rev4"].max()]

    cand = totals.map_batches(block_max, batch_format="pandas").to_pandas()
    winners = cand[cand["rev4"] == cand["rev4"].max()].copy()
    names = _read(
        sf_dir, "supplier", columns=["s_suppkey", "s_name"],
        filter=pc.field("s_suppkey").isin(winners["l_suppkey"].tolist()),
    ).to_pandas()
    out = winners.merge(names, left_on="l_suppkey", right_on="s_suppkey")
    out["total_revenue"] = round_half_away(
        out["rev4"].to_numpy(dtype=np.float64) / 1e4, 2
    )
    out = out.sort_values("s_suppkey").reset_index(drop=True)
    return out[["s_suppkey", "s_name", "total_revenue"]]


def q17_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape: revenue lost to small-quantity orders of one
    brand. Scale path: the brand's partkeys are a DIMENSION slice →
    broadcast LUT; the brand's lineitems stream twice (once for exact
    per-part (count, qty-sum) moments, once to filter qty < 0.2*avg
    and sum cents) — both passes prune partkeys at the scan and move
    only fixed-width partials. The avg threshold is computed in the
    same IEEE double ops as the DuckDB oracle (int sums → one
    division), so the strict-< comparison is bit-identical."""
    import ray
    from ray.data.aggregate import Sum

    pk = _read(
        sf_dir, "part", columns=["p_partkey", "p_brand"],
        filter=pc.field("p_brand") == "Brand#11",
    ).to_pandas()["p_partkey"].to_numpy(np.int64)
    pk_list = pk.tolist()

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
        filter=pc.field("l_partkey").isin(pk_list),
    ).materialize()

    def moments(batch: pa.Table) -> pa.Table:
        q_i = pc.cast(pc.round(pc.multiply(batch["l_quantity"], pa.scalar(100.0))), pa.int64())
        t = pa.table({"l_partkey": batch["l_partkey"], "q2": q_i})
        t = t.append_column("n", pa.array(np.ones(len(t), np.int64)))
        return t.group_by(["l_partkey"]).aggregate([("q2", "sum"), ("n", "sum")])

    mom = (
        li.map_batches(moments, batch_format="pyarrow", batch_size=None)
        .groupby("l_partkey")
        .aggregate(Sum("q2_sum", alias_name="q2"), Sum("n_sum", alias_name="n"))
        .to_pandas()
    )
    # threshold per part: 0.2 * avg(quantity); same double ops as oracle
    thr = 0.2 * ((mom["q2"].to_numpy(np.int64) / 100.0) / mom["n"].to_numpy(np.int64))
    lut = np.full(int(pk.max()) + 1 if len(pk) else 1, -1.0, np.float64)
    lut[mom["l_partkey"].to_numpy(np.int64)] = thr
    lut_ref = ray.put(lut)

    def small(batch: pa.Table) -> pa.Table:
        t = ray.get(lut_ref)
        pkv = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        keep = q < t[pkv]
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        cents = np.round(ep * 100.0).astype(np.int64)
        return pa.table({"cents": [int(cents.sum())], "n": [int(keep.sum())]})

    agg = li.map_batches(small, batch_format="pyarrow", batch_size=None).to_pandas()
    cents, n = int(agg["cents"].sum()), int(agg["n"].sum())
    return pd.DataFrame({
        "avg_yearly": [round_half_away(cents / 700.0, 2)],
        "n_lines": np.array([n], np.int64),
    })


def q22_idle_customers(sf_dir: str):
    """TPC-H Q22 shape: well-funded customers with no recent orders,
    grouped by nation. Scale path: the global positive-balance average
    is two int64 scalar partials (cents sum + count); the "no recent
    order" test is an EXACT distributed anti-join (partition-merge,
    never a driver key set); per-nation aggregates use scaled-int
    cents so the oracle hash matches bit-for-bit."""
    from ray.data.aggregate import Sum

    from ..stages.join import partition_merge_join

    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    def bal_partial(batch: pa.Table) -> pa.Table:
        b = batch["c_acctbal"].to_numpy(zero_copy_only=False)
        pos = b[b > 0]
        cents = np.round(pos * 100.0).astype(np.int64)
        return pa.table({"cents": [int(cents.sum())], "n": [len(pos)]})

    bp = cust.map_batches(bal_partial, batch_format="pyarrow", batch_size=None).to_pandas()
    threshold = (float(bp["cents"].sum()) / float(bp["n"].sum())) / 100.0

    rich = cust.map_batches(
        lambda b: b[b["c_acctbal"].to_numpy() > threshold],
        batch_format="pandas", batch_size=None,
    )

    recent = _read(
        sf_dir, "orders", columns=["o_custkey", "o_orderdate"],
        filter=pc.field("o_orderdate") >= np.datetime64("2000-01-01", "us"),
    ).select_columns(["o_custkey"]).map_batches(
        lambda b: pd.DataFrame({"c_custkey": b["o_custkey"].unique()}),
        batch_format="pandas", batch_size=None,
    )
    idle = partition_merge_join(rich, recent, on="c_custkey", how="anti")

    def nat_partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(batch["c_acctbal"].to_numpy(np.float64) * 100.0).astype(np.int64)
        g = pd.DataFrame({"c_nationkey": batch["c_nationkey"].to_numpy(np.int64),
                          "cents": cents, "numcust": np.ones(len(batch), np.int64)})
        return g.groupby("c_nationkey", as_index=False).sum()

    out = (
        idle.map_batches(nat_partial, batch_format="pandas", batch_size=None)
        .groupby("c_nationkey")
        .aggregate(Sum("cents", alias_name="cents"), Sum("numcust", alias_name="numcust"))
        .to_pandas()
    )
    out["totacctbal"] = round_half_away(out["cents"].to_numpy(np.float64) / 100.0, 2)
    out["numcust"] = out["numcust"].astype(np.int64)
    out["c_nationkey"] = out["c_nationkey"].astype(np.int64)
    return out.sort_values("c_nationkey").reset_index(drop=True)[
        ["c_nationkey", "numcust", "totacctbal"]
    ]


def q8_market_share(sf_dir: str):
    """TPC-H Q8 shape: target nation's market share of PROMO-part
    revenue among ASIA-region customers, by order year. Scale path:
    part and supplier are DIMENSION sides → broadcast LUTs (promo
    membership; supplier→is-target-nation); orders⨝customer co-locate
    via hash join; lineitem streams once emitting per-orderkey
    (rev_total, rev_target) scale-1e4 int64 partials that hash-join
    the order→year side. Share = target/total in double, round 6 —
    identical IEEE ops to the oracle."""
    import ray
    from ray.data.aggregate import Sum

    P = _join_partitions()
    TARGET_NATION = 2
    region = _read(sf_dir, "region").to_pandas()
    nation = _read(sf_dir, "nation").to_pandas()
    asia = region.loc[region["r_name"] == "ASIA", "r_regionkey"].iloc[0]
    nat_keys = set(
        int(k) for k in nation.loc[nation["n_regionkey"] == asia, "n_nationkey"]
    )

    promo = _read(
        sf_dir, "part", columns=["p_partkey", "p_type"],
        filter=pc.field("p_type") == "PROMO",
    ).to_pandas()["p_partkey"].to_numpy(np.int64)
    promo_lut = np.zeros(int(promo.max()) + 1 if len(promo) else 1, bool)
    promo_lut[promo] = True

    sup = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    tgt_lut = np.zeros(int(sup["s_suppkey"].max()) + 1 if len(sup) else 1, bool)
    tgt_lut[sup.loc[sup["s_nationkey"] == TARGET_NATION, "s_suppkey"].to_numpy()] = True

    promo_ref, tgt_ref = ray.put(promo_lut), ray.put(tgt_lut)

    cust = semi_join_keys(
        _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]),
        nat_keys, "c_nationkey",
    ).select_columns(["c_custkey"])
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= np.datetime64("1995-01-01", "us"))
        & (pc.field("o_orderdate") < np.datetime64("1997-01-01", "us")),
    )

    def year_col(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": batch["o_orderkey"].to_numpy(np.int64),
            "o_custkey": batch["o_custkey"].to_numpy(np.int64),
            "o_year": pd.DatetimeIndex(batch["o_orderdate"]).year.to_numpy(np.int64),
        })

    orders_y = orders.map_batches(year_col, batch_format="pandas", batch_size=None)
    orders_j = orders_y.join(
        cust, join_type="inner", num_partitions=P,
        on=("o_custkey",), right_on=("c_custkey",),
    ).select_columns(["o_orderkey", "o_year"])

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    )

    def li_partial(batch: pd.DataFrame) -> pd.DataFrame:
        pl = ray.get(promo_ref)
        tl = ray.get(tgt_ref)
        pkv = batch["l_partkey"].to_numpy(np.int64)
        keep = (pkv < len(pl)) & pl[np.minimum(pkv, len(pl) - 1)]
        if not keep.any():
            return pd.DataFrame({"l_orderkey": pd.Series([], dtype=np.int64),
                                 "rev4": pd.Series([], dtype=np.int64),
                                 "rev4_t": pd.Series([], dtype=np.int64)})
        b = batch[keep]
        ep_i = np.round(b["l_extendedprice"].to_numpy(np.float64) * 100.0).astype(np.int64)
        d_i = np.round(b["l_discount"].to_numpy(np.float64) * 100.0).astype(np.int64)
        rev4 = ep_i * (100 - d_i)
        sk = b["l_suppkey"].to_numpy(np.int64)
        is_t = (sk < len(tl)) & tl[np.minimum(sk, len(tl) - 1)]
        g = pd.DataFrame({"l_orderkey": b["l_orderkey"].to_numpy(np.int64),
                          "rev4": rev4,
                          "rev4_t": np.where(is_t, rev4, 0)})
        return g.groupby("l_orderkey", as_index=False).sum()

    li_p = li.map_batches(li_partial, batch_format="pandas", batch_size=None)
    joined = li_p.join(
        orders_j, join_type="inner", num_partitions=P,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def year_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch[["o_year", "rev4", "rev4_t"]].groupby("o_year", as_index=False).sum()
        return g

    out = (
        joined.map_batches(year_partial, batch_format="pandas", batch_size=None)
        .groupby("o_year")
        .aggregate(Sum("rev4", alias_name="rev4"), Sum("rev4_t", alias_name="rev4_t"))
        .to_pandas()
    )
    out["mkt_share"] = round_half_away(
        out["rev4_t"].to_numpy(np.float64) / out["rev4"].to_numpy(np.float64), 6
    )
    out["o_year"] = out["o_year"].astype(np.int64)
    return out.sort_values("o_year").reset_index(drop=True)[["o_year", "mkt_share"]]


def ev_asof_next_error(sf_dir: str):
    """FORWARD as-of join: each purchase event matched to the user's
    NEXT error event at-or-after it (oracle: DuckDB
    ``ASOF JOIN ... ON l.ts <= r.ts``). Same one-shuffle co-located
    merge_asof as the backward flavor — direction is a parameter, not
    a new operator."""
    from ..stages.join import asof_join

    ev = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "ts", "value"])
    left = ev.filter(expr="event_type == 'purchase'").select_columns(
        ["event_id", "user_id", "ts"]
    )

    def prep_right(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["event_type"] == "error"]
        return pd.DataFrame(
            {"user_id": batch["user_id"], "ts": batch["ts"],
             "error_ts": batch["ts"], "error_value": batch["value"]}
        )

    right = ev.map_batches(prep_right, batch_format="pandas", batch_size=None)
    joined = asof_join(left, right, key="user_id", ts_col="ts",
                       direction="forward")

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.dropna(subset=["error_ts"])  # inner semantics
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].astype(np.int64),
                "user_id": batch["user_id"].astype(np.int64),
                "error_ts": batch["error_ts"].astype("datetime64[us]"),
                "error_value": round_half_away(
                    batch["error_value"].to_numpy(np.float64), 2
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pandas", batch_size=None)


def doc_conjunctive_search(sf_dir: str, terms=("hash", "join", "sort")):
    """Conjunctive term search via posting intersection: per-doc
    distinct query-term hits stream as (doc_id, 1) partials, one
    int-keyed rollup counts distinct matched terms per doc, and docs
    matching ALL terms survive. The scan never ships text — only
    fixed-width (doc_id, n) partials move (the inverted-index
    intersection-by-rollup shape; full postings materialize only if
    you persist them)."""
    from ray.data.aggregate import Sum

    term_set = frozenset(terms)
    k = len(term_set)
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def hits(batch: pd.DataFrame) -> pd.DataFrame:
        ids, counts = [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            n = len(term_set.intersection(text.split(" ")))
            if n:
                ids.append(doc_id)
                counts.append(n)
        return pd.DataFrame({"doc_id": np.array(ids, np.int64),
                             "n": np.array(counts, np.int64)})

    def full_match(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[batch["n"] == k]
        return pd.DataFrame({"doc_id": m["doc_id"].to_numpy(np.int64)})

    return (
        ds.map_batches(hits, batch_format="pandas", batch_size=None)
        .groupby("doc_id")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(full_match, batch_format="pandas", batch_size=None)
    )


def ev_scd2_intervals(sf_dir: str):
    """SCD type-2 dimension history (`olap.scd2_intervals`): per user,
    consecutive same-type events collapse and each surviving state
    carries [valid_from, valid_to) — NULL valid_to marks the current
    state. One key-hash exchange, vectorized change-point pass."""
    from ..stages.olap import scd2_intervals

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])
    return scd2_intervals(ds, key="user_id", state_col="event_type",
                          order_cols=("ts", "event_id"))


# ------------------------------------------------- TPC-H completion
# The remaining six TPC-H shapes (Q2/Q9/Q11/Q16/Q20/Q21). The test
# schema has no partsupp table, so the part-supplier "catalog" is
# derived from lineitem (distinct (l_partkey, l_suppkey) with
# per-pair aggregates) — the join/subquery STRUCTURE of each query is
# preserved even though the catalog side is computed, not stored.

_Q2_SUPP_MULT = 1_000_000_000


def q2_min_cost_supplier(sf_dir: str):
    """TPC-H Q2 shape: for each part of one size/type, the EUROPE
    supplier offering the minimum catalog unit cost (correlated-min
    subquery). Scale path: qualifying partkeys and the region's
    suppliers are DIMENSION slices -> broadcast bool LUTs; lineitem
    streams once emitting per-partkey MIN of an int64-packed
    (unit-cost-cents, suppkey) word, so the correlated min + its
    min-suppkey tie-break ride ONE mergeable Min aggregate; winners
    decode on the driver (|qualifying parts| rows)."""
    import ray
    from ray.data.aggregate import Min

    pk = _read(
        sf_dir, "part", columns=["p_partkey", "p_size", "p_type"],
        filter=(pc.field("p_size") == 15) & (pc.field("p_type") == "STANDARD"),
    ).to_pandas()["p_partkey"].to_numpy(np.int64)
    if not len(pk):
        return pd.DataFrame({"p_partkey": pd.Series([], dtype=np.int64),
                             "s_suppkey": pd.Series([], dtype=np.int64),
                             "min_cost": pd.Series([], dtype=np.float64)})
    pk_lut = np.zeros(int(pk.max()) + 1, bool)
    pk_lut[pk] = True

    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    eu = region.loc[region["r_name"] == "EUROPE", "r_regionkey"].iloc[0]
    eu_nations = set(int(k) for k in nation.loc[nation["n_regionkey"] == eu, "n_nationkey"])
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    eu_sk = supp.loc[supp["s_nationkey"].isin(eu_nations), "s_suppkey"].to_numpy(np.int64)
    sk_lut = np.zeros(int(supp["s_suppkey"].max()) + 1, bool)
    sk_lut[eu_sk] = True
    assert int(supp["s_suppkey"].max()) < _Q2_SUPP_MULT
    pk_ref, sk_ref = ray.put(pk_lut), ray.put(sk_lut)

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
        filter=pc.field("l_partkey").isin(pk.tolist()),
    )

    def partial(batch: pa.Table) -> pa.Table:
        pl, sl = ray.get(pk_ref), ray.get(sk_ref)
        pkv = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        skv = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (pkv < len(pl)) & pl[np.minimum(pkv, len(pl) - 1)]
        keep &= (skv < len(sl)) & sl[np.minimum(skv, len(sl) - 1)]
        if not keep.any():
            return pa.table({"p_partkey": pa.array([], pa.int64()),
                             "packed": pa.array([], pa.int64())})
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)[keep]
        cost_c = np.asarray(
            round_half_away(round_half_away(ep / q, 2) * 100.0, 0), np.int64
        )
        packed = cost_c * _Q2_SUPP_MULT + skv[keep]
        t = pa.table({"p_partkey": pkv[keep], "packed": packed})
        return t.group_by(["p_partkey"]).aggregate([("packed", "min")]).rename_columns(
            ["p_partkey", "packed"]
        )

    w = (
        li.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("p_partkey")
        .aggregate(Min("packed", alias_name="packed"))
        .to_pandas()  # |qualifying parts| rows — a dimension slice
    )
    packed = w["packed"].to_numpy(np.int64)
    out = pd.DataFrame({
        "p_partkey": w["p_partkey"].to_numpy(np.int64),
        "s_suppkey": packed % _Q2_SUPP_MULT,
        "min_cost": round_half_away((packed // _Q2_SUPP_MULT) / 100.0, 2),
    })
    return out.sort_values("p_partkey").reset_index(drop=True)


def q9_profit_by_nation(sf_dir: str):
    """TPC-H Q9 shape: profit by supplier nation and order year for
    one part family ('%gear%'), cost proxied by p_retailprice (no
    partsupp in this schema). Scale path: part (retail-tenths) and
    supplier (nationkey) sides are broadcast LUTs; lineitem streams
    once emitting per-(orderkey, nation) exact 1e-5-scaled int64
    profit partials; the order-year side co-locates via ONE int-keyed
    partition-merge join; the (nation, year) rollup is tiny."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.join import partition_merge_join

    part = _read(sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"]).to_pandas()
    sel = part[part["p_name"].str.contains("gear")]
    retail_lut = np.full(int(part["p_partkey"].max()) + 1, -1, np.int64)
    retail_lut[sel["p_partkey"].to_numpy(np.int64)] = np.asarray(
        round_half_away(sel["p_retailprice"].to_numpy(np.float64) * 10.0, 0), np.int64
    )
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat_lut = np.full(int(supp["s_suppkey"].max()) + 1, -1, np.int64)
    nat_lut[supp["s_suppkey"].to_numpy(np.int64)] = supp["s_nationkey"].to_numpy(np.int64)
    r_ref, n_ref = ray.put(retail_lut), ray.put(nat_lut)

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_quantity"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        rl, nl = ray.get(r_ref), ray.get(n_ref)
        pkv = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        retail_d = rl[pkv]
        keep = retail_d >= 0
        if not keep.any():
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "nk": pa.array([], pa.int64()),
                             "profit5": pa.array([], pa.int64())})
        skv = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        ep_c = np.asarray(round_half_away(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep] * 100.0, 0), np.int64)
        d_pct = np.asarray(round_half_away(
            batch["l_discount"].to_numpy(zero_copy_only=False)[keep] * 100.0, 0), np.int64)
        q_i = np.asarray(round_half_away(
            batch["l_quantity"].to_numpy(zero_copy_only=False)[keep], 0), np.int64)
        profit5 = ep_c * (100 - d_pct) * 10 - retail_d[keep] * q_i * 9000
        t = pa.table({
            "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep],
            "nk": nl[skv],
            "profit5": profit5,
        })
        return t.group_by(["o_orderkey", "nk"]).aggregate([("profit5", "sum")]).rename_columns(
            ["o_orderkey", "nk", "profit5"]
        )

    per_order = li.map_batches(partial, batch_format="pyarrow", batch_size=None)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]).map_batches(
        lambda b: pd.DataFrame({
            "o_orderkey": b["o_orderkey"].to_numpy(np.int64),
            "o_year": b["o_orderdate"].dt.year.to_numpy(np.int64)}),
        batch_format="pandas", batch_size=None,
    )
    joined = partition_merge_join(per_order, orders, on="o_orderkey", how="inner")

    from ray.data.aggregate import Sum
    out = (
        joined.groupby(["nk", "o_year"])
        .aggregate(Sum("profit5", alias_name="profit5"))
        .to_pandas()  # |nations| x |years| rows
    )
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    out = out.merge(nation, left_on="nk", right_on="n_nationkey")
    out["sum_profit"] = round_half_away(out["profit5"].to_numpy(np.float64) / 1e5, 2)
    out["o_year"] = out["o_year"].astype(np.int64)
    return out.sort_values(["n_name", "o_year"]).reset_index(drop=True)[
        ["n_name", "o_year", "sum_profit"]
    ]


def q11_important_parts(sf_dir: str):
    """TPC-H Q11 shape: parts whose catalog value through one
    nation's suppliers exceeds a fraction of the nation total
    (GROUP BY ... HAVING share-of-total). Scale path: the nation's
    suppliers are a broadcast bool LUT; lineitem streams once into
    per-partkey exact 1e-4-scaled int64 value partials; the global
    total re-aggregates THOSE partials (no second scan); the HAVING
    compares integers (1000*v > total) so the cut is exact."""
    import ray
    from ray.data.aggregate import Sum

    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    nk = int(nation.loc[nation["n_name"] == "NATION_12", "n_nationkey"].iloc[0])
    sel = supp.loc[supp["s_nationkey"] == nk, "s_suppkey"].to_numpy(np.int64)
    sk_lut = np.zeros(int(supp["s_suppkey"].max()) + 1, bool)
    sk_lut[sel] = True
    sk_ref = ray.put(sk_lut)

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_suppkey").isin(sel.tolist()),
    )

    def partial(batch: pa.Table) -> pa.Table:
        sl = ray.get(sk_ref)
        skv = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (skv < len(sl)) & sl[np.minimum(skv, len(sl) - 1)]
        ep_c = np.asarray(round_half_away(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep] * 100.0, 0), np.int64)
        d_pct = np.asarray(round_half_away(
            batch["l_discount"].to_numpy(zero_copy_only=False)[keep] * 100.0, 0), np.int64)
        t = pa.table({
            "p_partkey": batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep],
            "v4": ep_c * (100 - d_pct),
        })
        return t.group_by(["p_partkey"]).aggregate([("v4", "sum")]).rename_columns(
            ["p_partkey", "v4"]
        )

    per_part = (
        li.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("p_partkey")
        .aggregate(Sum("v4", alias_name="v4"))
        .materialize()
    )
    total = int(per_part.sum("v4") or 0)
    n_parts = int(per_part.count())

    def cut(batch: pd.DataFrame) -> pd.DataFrame:
        # share > 2x the mean share: v * n > 2 * total (exact ints)
        m = batch[batch["v4"].to_numpy(np.int64) * n_parts > 2 * total]
        return pd.DataFrame({
            "p_partkey": m["p_partkey"].to_numpy(np.int64),
            "value": round_half_away(m["v4"].to_numpy(np.float64) / 1e4, 2),
        })

    out = per_part.map_batches(cut, batch_format="pandas", batch_size=None).to_pandas()
    if "p_partkey" not in out.columns:  # nation slice empty at tiny sf
        out = pd.DataFrame({"p_partkey": pd.Series([], dtype=np.int64),
                            "value": pd.Series([], dtype=np.float64)})
    return out.sort_values("p_partkey").reset_index(drop=True)


def q16_supplier_cnt(sf_dir: str):
    """TPC-H Q16 shape: COUNT(DISTINCT supplier) per part attribute
    combo, excluding one brand/type and a "complaints" supplier set
    (suppkey % 7 == 0 stands in for the LIKE '%Complaints%' filter).
    Scale path: qualifying parts map to a dense attr-combo id via a
    broadcast LUT; blocks emit DISTINCT int64-packed (attr_id,
    suppkey) words (Arrow group_by), one int-keyed exchange dedups
    pairs globally, and per-attr counts are partial sums — supplier
    ids never move as strings and the driver sees |combos| rows."""
    import ray
    from ray.data.aggregate import Sum

    part = _read(
        sf_dir, "part", columns=["p_partkey", "p_brand", "p_type", "p_size"],
        filter=(pc.field("p_brand") != "Brand#1") & (pc.field("p_type") != "PROMO")
        & (pc.field("p_size").isin([1, 4, 9, 14, 19, 23, 36, 45])),
    ).to_pandas()
    combos = (
        part[["p_brand", "p_type", "p_size"]]
        .drop_duplicates().sort_values(["p_brand", "p_type", "p_size"])
        .reset_index(drop=True)
    )
    combo_id = {t: i for i, t in enumerate(
        zip(combos["p_brand"], combos["p_type"], combos["p_size"]))}
    attr_of_pk = np.full(int(part["p_partkey"].max()) + 1 if len(part) else 1, -1, np.int64)
    for pkv, b, t, s in zip(part["p_partkey"], part["p_brand"], part["p_type"], part["p_size"]):
        attr_of_pk[int(pkv)] = combo_id[(b, t, s)]
    a_ref = ray.put(attr_of_pk)

    li = _read(
        sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"],
        filter=pc.field("l_partkey").isin(part["p_partkey"].tolist()),
    )

    def pairs(batch: pa.Table) -> pa.Table:
        al = ray.get(a_ref)
        pkv = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        skv = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (pkv < len(al)) & (al[np.minimum(pkv, len(al) - 1)] >= 0) & (skv % 7 != 0)
        packed = al[pkv[keep]] * _Q2_SUPP_MULT + skv[keep]
        return pa.table({"packed": np.unique(packed)})

    distinct_pairs = (
        li.map_batches(pairs, batch_format="pyarrow", batch_size=None)
        .groupby("packed")
        .count()
    )

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        aid = batch["packed"].to_numpy(np.int64) // _Q2_SUPP_MULT
        vc = pd.Series(aid).value_counts()
        return pd.DataFrame({"attr_id": vc.index.to_numpy(np.int64),
                             "n": vc.to_numpy(np.int64)})

    counts = (
        distinct_pairs.map_batches(count_partial, batch_format="pandas", batch_size=None)
        .groupby("attr_id")
        .aggregate(Sum("n", alias_name="supplier_cnt"))
        .to_pandas()  # |combos| rows
    )
    out = combos.loc[counts["attr_id"].to_numpy(np.int64)].reset_index(drop=True)
    out["supplier_cnt"] = counts["supplier_cnt"].to_numpy(np.int64)
    out["p_size"] = out["p_size"].astype(np.int64)
    return out.sort_values(["p_brand", "p_type", "p_size"]).reset_index(drop=True)


def q20_part_share_suppliers(sf_dir: str):
    """TPC-H Q20 shape: suppliers who shipped more than half of a
    part family's 1996 volume for at least one part (nested aggregate
    + EXISTS semi-join). Scale path: qualifying partkeys broadcast;
    lineitem streams once into per-(partkey, suppkey) packed int64
    quantity partials; per-part totals re-aggregate the SAME partials;
    the share test and the distinct-supplier projection stay
    distributed, and supplier names come from a key-pushdown read."""
    from ray.data.aggregate import Sum

    part = _read(
        sf_dir, "part", columns=["p_partkey", "p_name"],
    ).to_pandas()
    sel = part[part["p_name"].str.contains("bolt")]["p_partkey"].to_numpy(np.int64)

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        filter=pc.field("l_partkey").isin(sel.tolist())
        & (pc.field("l_shipdate") >= np.datetime64("1996-01-01", "us"))
        & (pc.field("l_shipdate") < np.datetime64("1997-01-01", "us")),
    )

    def partial(batch: pa.Table) -> pa.Table:
        pkv = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        skv = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        q_i = np.asarray(round_half_away(
            batch["l_quantity"].to_numpy(zero_copy_only=False), 0), np.int64)
        t = pa.table({"packed": pkv * _Q2_SUPP_MULT + skv, "q": q_i})
        return t.group_by(["packed"]).aggregate([("q", "sum")]).rename_columns(
            ["packed", "q"]
        )

    pair_q = (
        li.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("packed")
        .aggregate(Sum("q", alias_name="q"))
        .materialize()
    )
    totals = (
        pair_q.map_batches(
            lambda b: pd.DataFrame({
                "pk": b["packed"].to_numpy(np.int64) // _Q2_SUPP_MULT,
                "q": b["q"].to_numpy(np.int64)}),
            batch_format="pandas", batch_size=None)
        .groupby("pk")
        .aggregate(Sum("q", alias_name="qt"))
        .to_pandas()  # |family parts| rows — a dimension slice
    )
    tot_lut = np.zeros(int(totals["pk"].max()) + 1 if len(totals) else 1, np.int64)
    tot_lut[totals["pk"].to_numpy(np.int64)] = totals["qt"].to_numpy(np.int64)
    import ray
    t_ref = ray.put(tot_lut)

    def winners(batch: pd.DataFrame) -> pd.DataFrame:
        tl = ray.get(t_ref)
        pkv = batch["packed"].to_numpy(np.int64) // _Q2_SUPP_MULT
        skv = batch["packed"].to_numpy(np.int64) % _Q2_SUPP_MULT
        keep = 2 * batch["q"].to_numpy(np.int64) > tl[pkv]
        return pd.DataFrame({"s_suppkey": np.unique(skv[keep])})

    sk = (
        pair_q.map_batches(winners, batch_format="pandas", batch_size=None)
        .groupby("s_suppkey")
        .count()
        .to_pandas()  # distinct winning suppliers — bounded by |supplier|
    )
    names = _read(
        sf_dir, "supplier", columns=["s_suppkey", "s_name"],
        filter=pc.field("s_suppkey").isin(sk["s_suppkey"].tolist()),
    ).to_pandas()
    return names.sort_values("s_suppkey").reset_index(drop=True)[["s_suppkey", "s_name"]]


def q21_waiting_suppliers(sf_dir: str):
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper in a
    finished multi-supplier order (EXISTS + NOT EXISTS self-joins on
    lineitem), late = max shipdate > orderdate + 90 days. Scale path:
    blocks collapse to per-(orderkey, suppkey) MAX-shipdate PARTIALS
    (Arrow group_by — no global pair groupby, which would range-sort
    ~|lineitem| packed keys); the single orderkey-hash exchange of the
    partition-merge join co-locates every partial of an order with its
    order row, so the pair max-merge AND the EXISTS/NOT-EXISTS logic
    both finish vectorized inside each partition; per-supplier waits
    are partial sums and the driver sees |supplier| rows for the
    top-20 cut."""

    from ..stages.join import partition_merge_join

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )

    def pair_partial(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ship = batch["l_shipdate"].cast(pa.timestamp("us")).to_numpy(zero_copy_only=False)
        t = pa.table({"packed": ok * _Q2_SUPP_MULT + sk,
                      "ms": ship.astype("datetime64[us]").astype(np.int64)})
        t = t.group_by(["packed"]).aggregate([("ms", "max")])
        p = t["packed"].to_numpy(zero_copy_only=False)
        return pa.table({"o_orderkey": p // _Q2_SUPP_MULT,
                         "s_suppkey": p % _Q2_SUPP_MULT,
                         "ms": t["ms_max"]})

    pairs = li.map_batches(pair_partial, batch_format="pyarrow", batch_size=None)
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderstatus"],
        filter=pc.field("o_orderstatus") == "F",
    ).map_batches(
        lambda b: pd.DataFrame({
            "o_orderkey": b["o_orderkey"].to_numpy(np.int64),
            "od": b["o_orderdate"].astype("datetime64[us]").astype(np.int64)}),
        batch_format="pandas", batch_size=None,
    )
    joined = partition_merge_join(pairs, orders, on="o_orderkey", how="inner")

    NINETY_DAYS_US = 90 * 86400 * 1_000_000

    def per_order(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                                 "numwait": pd.Series([], dtype=np.int64)})
        # finish the pair max-merge: the same (order, supplier) pair can
        # arrive as partials from several lineitem blocks
        df = batch.groupby(["o_orderkey", "s_suppkey"], sort=False, as_index=False).agg(
            ms=("ms", "max"), od=("od", "first"))
        df["late"] = df["ms"].to_numpy(np.int64) > df["od"].to_numpy(np.int64) + NINETY_DAYS_US
        g = df.groupby("o_orderkey", sort=False).agg(
            n_supp=("s_suppkey", "size"), n_late=("late", "sum"))
        ok_orders = g[(g["n_supp"] >= 2) & (g["n_late"] == 1)].index
        m = df[df["late"] & df["o_orderkey"].isin(ok_orders)]
        vc = m["s_suppkey"].value_counts()
        return pd.DataFrame({"s_suppkey": vc.index.to_numpy(np.int64),
                             "numwait": vc.to_numpy(np.int64)})

    from ..stages.join import hash_groupby_sum

    waits = hash_groupby_sum(
        joined.map_batches(per_order, batch_format="pandas", batch_size=None),
        "s_suppkey", ("numwait",),
    ).to_pandas()  # |supplier| rows — a dimension
    waits = waits.sort_values(["numwait", "s_suppkey"], ascending=[False, True]).head(20)
    names = _read(
        sf_dir, "supplier", columns=["s_suppkey", "s_name"],
        filter=pc.field("s_suppkey").isin(waits["s_suppkey"].tolist()),
    ).to_pandas()
    out = waits.merge(names, on="s_suppkey")
    out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
    out["numwait"] = out["numwait"].astype(np.int64)
    return out.reset_index(drop=True)[["s_suppkey", "s_name", "numwait"]]


def ev_m4_downsample(sf_dir: str):
    """M4 visual downsampling (Jugel et al., VLDB 2014): per (user,
    4h pixel bucket) the min/max/first/last tuple — the lossless-
    rendering aggregate for dashboard line charts. Scale path:
    per-block pandas partials carry (min_v, max_v, argmin-ts first,
    argmax-ts last); ONE int-keyed partition exchange merges them
    (arg-pairs are not expressible as Ray's builtin aggregates), so
    raw points never shuffle. (user_id, ts) is unique in the table, so
    first/last are deterministic."""
    import ray

    from ..stages.rollup import partitions_for_input

    P = partitions_for_input(None)
    W = 4 * 3600 * 1_000_000  # 4h in us

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch["ts"].astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(np.int64),
            "bucket": (ts // W) * W,
            "ts": ts,
            "v": batch["value"].to_numpy(np.float64),
        })
        g = df.groupby(["user_id", "bucket"], sort=False)
        agg = g.agg(min_v=("v", "min"), max_v=("v", "max"),
                    f_ts=("ts", "idxmin"), l_ts=("ts", "idxmax")).reset_index()
        agg["first_v"] = df["v"].to_numpy()[agg["f_ts"].to_numpy()]
        agg["last_v"] = df["v"].to_numpy()[agg["l_ts"].to_numpy()]
        agg["f_ts"] = df["ts"].to_numpy()[agg["f_ts"].to_numpy()]
        agg["l_ts"] = df["ts"].to_numpy()[agg["l_ts"].to_numpy()]
        agg["_part"] = (
            pd.util.hash_pandas_object(agg["user_id"], index=False).to_numpy() % P
        ).astype(np.int32)
        return agg

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby(["user_id", "bucket"], sort=False)
        out = gb.agg(min_value=("min_v", "min"), max_value=("max_v", "max"),
                     fi=("f_ts", "idxmin"), li=("l_ts", "idxmax")).reset_index()
        out["first_value"] = g["first_v"].to_numpy()[out["fi"].to_numpy()]
        out["last_value"] = g["last_v"].to_numpy()[out["li"].to_numpy()]
        out["bucket_ts"] = pd.to_datetime(out["bucket"].to_numpy(np.int64), unit="us")
        for c in ("first_value", "min_value", "max_value", "last_value"):
            out[c] = round_half_away(out[c].to_numpy(np.float64), 6)
        return out[["user_id", "bucket_ts", "first_value", "min_value",
                    "max_value", "last_value"]]

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby("_part")
        .map_groups(merge, batch_format="pandas")
    )


def ev_full_outer_days(sf_dir: str):
    """FULL OUTER JOIN: daily click vs purchase counts per day, both
    sides' unmatched days surviving with NULL counts. Scale path: each
    side collapses to per-day count partials inside map_batches before
    the join, so the full-outer exchange moves |days| rows, not
    events; counts surface as float64 (SQL's nullable-count
    convention after an outer join)."""
    from ray.data.aggregate import Sum

    from ..stages.join import partition_merge_join

    def day_counts(etype: str):
        ds = _read(
            sf_dir, "events", columns=["ts", "event_type"],
            filter=pc.field("event_type") == etype,
        )

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            day = batch["ts"].dt.strftime("%Y-%m-%d")
            vc = day.value_counts()
            return pd.DataFrame({"day": vc.index.to_numpy(),
                                 "n": vc.to_numpy(np.int64)})

        return (
            ds.map_batches(partial, batch_format="pandas", batch_size=None)
            .groupby("day")
            .aggregate(Sum("n", alias_name="n"))
        )

    clicks = _rename_ds(day_counts("click"), {"n": "n_click"})
    purchases = _rename_ds(day_counts("purchase"), {"n": "n_purchase"})
    joined = partition_merge_join(clicks, purchases, on="day", how="full_outer")

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["n_click"] = batch["n_click"].astype(np.float64)
        batch["n_purchase"] = batch["n_purchase"].astype(np.float64)
        return batch[["day", "n_click", "n_purchase"]]

    return joined.map_batches(finish, batch_format="pandas", batch_size=None)


def ev_ccf_leadlag(sf_dir: str):
    """Lead-lag cross-correlation (`analytics.lagged_ccf`): ccf(k) =
    corr(click_t, purchase_{t+k}) over hourly counts at lags -3..3.
    One distributed bucket-count pass; the merged grid is
    calendar-bounded, so the per-lag exact-int64 moment evaluation is
    dimension-bounded. Oracle: DuckDB corr over the dense
    generate_series hour grid self-joined at each lag."""
    from ..stages.analytics import lagged_ccf

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])
    out = lagged_ccf(ds, "click", "purchase", max_lag=3)
    out["ccf"] = round_half_away(out["ccf"].to_numpy(np.float64), 9)
    return out.sort_values("lag").reset_index(drop=True)


def ev_value_histogram(sf_dir: str):
    """Equi-width histogram of value per event_type (10 buckets of
    width 50, open-topped): per-batch (type, bucket) count partials
    collapse each block to <= |types| x 10 rows before ONE tiny
    groupby merge — the corpus never shuffles. Bucket ids from the
    same IEEE floor(value / 50.0) the oracle runs."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = np.minimum(
            np.floor(batch["value"].to_numpy(np.float64) / 50.0), 9.0
        ).astype(np.int64)
        g = pd.DataFrame({"event_type": batch["event_type"], "bucket": b})
        out = g.groupby(["event_type", "bucket"], as_index=False).size()
        out.columns = ["event_type", "bucket", "n"]
        return out

    out = (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby(["event_type", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= |types| x 10 rows
    )
    out["bucket"] = out["bucket"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["event_type", "bucket"]).reset_index(drop=True)


def ev_dq_checks(sf_dir: str):
    """Data-quality expectations suite over events
    (`validate.expectation_checks`): not-null, range, domain-set and
    uniqueness rules in one streaming pass (+ one key-hash exchange of
    count partials for the uniqueness rule). Oracle: each rule's
    violation count as plain SQL aggregates."""
    from ..stages.validate import expectation_checks

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "ts", "value"])
    rules = [
        {"rule": "event_id_unique", "kind": "unique", "col": "event_id"},
        {"rule": "user_id_not_null", "kind": "not_null", "col": "user_id"},
        {"rule": "value_in_range", "kind": "range", "col": "value",
         "lo": 0.0, "hi": 1000.0},
        {"rule": "type_in_domain", "kind": "in_set", "col": "event_type",
         "values": ["click", "view", "purchase", "signup", "error"]},
    ]
    return expectation_checks(ds, rules)


def ev_k_anonymity(sf_dir: str):
    """k-anonymity audit over the quasi-identifier (event_type,
    hour-of-day): one distributed contingency pass (per-batch count
    partials, tiny groupby merge on the bounded |types| x 24 grid),
    then the suppression accounting closed-form. A privacy gate a
    training-data pipeline runs before release."""
    from ray.data.aggregate import Sum

    K = 50
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.DatetimeIndex(batch["ts"]).hour.to_numpy(np.int64)
        g = pd.DataFrame({"event_type": batch["event_type"], "hour": h})
        out = g.groupby(["event_type", "hour"], as_index=False).size()
        out.columns = ["event_type", "hour", "n"]
        return out

    c = (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded grid
    )
    n = c["n"].to_numpy(np.int64)
    return pd.DataFrame({
        "k": np.array([K], np.int64),
        "n_groups": np.array([len(c)], np.int64),
        "groups_at_risk": np.array([int((n < K).sum())], np.int64),
        "rows_at_risk": np.array([int(n[n < K].sum())], np.int64),
        "min_group_size": np.array([int(n.min()) if len(n) else 0], np.int64),
    })


def ev_attribution(sf_dir: str):
    """Last-click attribution: each purchase joined to the user's most
    recent prior-or-equal click (one-shuffle co-located as-of merge),
    attributed only when the gap is <= 1 hour; exact cent-sums per
    day. Oracle: DuckDB ASOF LEFT JOIN with the same window filter."""
    from ray.data.aggregate import Sum

    from ..stages.join import asof_join

    ev = _read(sf_dir, "events", columns=["user_id", "event_type", "ts", "value"])
    left = ev.filter(expr="event_type == 'purchase'").map_batches(
        lambda b: pd.DataFrame({"user_id": b["user_id"], "ts": b["ts"],
                                "value": b["value"]}),
        batch_format="pandas", batch_size=None,
    )

    def prep_right(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["event_type"] == "click"]
        return pd.DataFrame({"user_id": batch["user_id"], "ts": batch["ts"],
                             "click_ts": batch["ts"]})

    right = ev.map_batches(prep_right, batch_format="pandas", batch_size=None)
    joined = asof_join(left, right, key="user_id", ts_col="ts",
                       direction="backward")

    HOUR_US = 3_600_000_000

    def day_partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch["ts"].to_numpy("datetime64[us]")
        day = t.astype("datetime64[D]").astype("datetime64[us]")
        ct = batch["click_ts"].to_numpy("datetime64[us]")
        gap = t.view("int64") - ct.view("int64")
        attributed = (~pd.isna(batch["click_ts"]).to_numpy()) & (gap <= HOUR_US)
        cents = np.round(batch["value"].to_numpy(np.float64) * 100).astype(np.int64)
        g = pd.DataFrame({
            "day": day,
            "n_purchases": np.ones(len(batch), np.int64),
            "n_attributed": attributed.astype(np.int64),
            "attributed_cents": np.where(attributed, cents, 0),
        })
        return g.groupby("day", as_index=False).sum()

    out = (
        joined.map_batches(day_partial, batch_format="pandas", batch_size=None)
        .groupby("day")
        .aggregate(Sum("n_purchases", alias_name="n_purchases"),
                   Sum("n_attributed", alias_name="n_attributed"),
                   Sum("attributed_cents", alias_name="attributed_cents"))
        .to_pandas()  # |days| rows
    )
    for c in ("n_purchases", "n_attributed", "attributed_cents"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("day").reset_index(drop=True)


def ev_funnel_windowed(sf_dir: str):
    """TIME-BOUNDED sequential funnel (MATCH_RECOGNIZE-lite): first
    'view', then the first 'click' within 1 hour OF THAT VIEW, then the
    first 'purchase' within 1 hour OF THAT CLICK — each step's anchor
    depends on the previous match, so this is sequential pattern
    matching, not a per-step min. ONE user-hash shuffle of (user,
    step-code int8, ts); each partition resolves the chain with three
    vectorized groupby-min + merge sweeps; only per-partition step
    counts reach the driver."""
    from ..stages.rollup import partitions_for_input

    steps = ("view", "click", "purchase")
    step_code = {s: i for i, s in enumerate(steps)}
    P = partitions_for_input(None)
    W_US = 3_600_000_000

    ds = _read(
        sf_dir, "events", columns=["user_id", "event_type", "ts"],
        filter=pc.field("event_type").isin(steps),
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": batch["user_id"],
            "step": batch["event_type"].map(step_code).astype(np.int8),
            "ts": batch["ts"].to_numpy("datetime64[us]").view("int64"),
        })
        out["_part"] = (
            pd.util.hash_pandas_object(out["user_id"], index=False).to_numpy() % P
        ).astype(np.int32)
        return out

    narrow = ds.map_batches(partial, batch_format="pandas", batch_size=None)

    def chain_part(df: pd.DataFrame) -> pd.DataFrame:
        s0 = df[df["step"] == 0].groupby("user_id", as_index=False)["ts"].min()
        s0.columns = ["user_id", "t1"]
        if not len(s0):
            return pd.DataFrame({"n_step1": [0], "n_step2": [0], "n_step3": [0]})
        c = df[df["step"] == 1].merge(s0, on="user_id")
        c = c[(c["ts"] >= c["t1"]) & (c["ts"] <= c["t1"] + W_US)]
        s1 = c.groupby("user_id", as_index=False)["ts"].min()
        s1.columns = ["user_id", "t2"]
        p = df[df["step"] == 2].merge(s1, on="user_id")
        p = p[(p["ts"] >= p["t2"]) & (p["ts"] <= p["t2"] + W_US)]
        s2 = p.groupby("user_id", as_index=False)["ts"].min()
        return pd.DataFrame({"n_step1": [len(s0)], "n_step2": [len(s1)],
                             "n_step3": [len(s2)]})

    parts = narrow.groupby("_part").map_groups(chain_part, batch_format="pandas")
    agg = parts.to_pandas().sum()  # O(P) rows
    return pd.DataFrame({
        "n_step1": np.array([agg["n_step1"]], np.int64),
        "n_step2": np.array([agg["n_step2"]], np.int64),
        "n_step3": np.array([agg["n_step3"]], np.int64),
    })


def ev_cohort_retention(sf_dir: str):
    """Cohort retention matrix: users cohorted by FIRST-signup day,
    distinct active users per (cohort_day, days_since) cell. Scale
    path: one user-hash exchange co-locates each user's signup-min
    with their activity rows (partition-merge join), per-partition
    DISTINCT (cohort, diff, user) collapse, then only bounded
    (cohort x horizon) count partials merge."""
    from ray.data.aggregate import Sum

    from ..stages.join import partition_merge_join

    DAY_US = 86_400_000_000
    ev = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def signup_partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["event_type"] == "signup"]
        out = pd.DataFrame({
            "user_id": b["user_id"],
            "su": b["ts"].to_numpy("datetime64[us]").view("int64"),
        })
        return out.groupby("user_id", as_index=False)["su"].min()

    signup = ev.map_batches(signup_partial, batch_format="pandas", batch_size=None)

    def act_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": batch["user_id"],
            "at": batch["ts"].to_numpy("datetime64[us]").view("int64"),
        })

    act = ev.map_batches(act_partial, batch_format="pandas", batch_size=None)
    joined = partition_merge_join(act, signup, on="user_id", how="inner")

    from ..stages.rollup import partitions_for_input

    P2 = partitions_for_input(None)

    def cell_rows(batch: pd.DataFrame) -> pd.DataFrame:
        # per-block DISTINCT (cell, user) rows; a block may split a
        # user, so the GLOBAL distinct happens in the cell-key exchange
        su = batch.groupby("user_id")["su"].min()
        b = batch.merge(su.rename("su_min"), on="user_id")
        cohort = b["su_min"].to_numpy(np.int64) // DAY_US
        diff = b["at"].to_numpy(np.int64) // DAY_US - cohort
        keep = diff >= 0
        g = pd.DataFrame({"cohort_day": cohort[keep], "days_since": diff[keep],
                          "user_id": b["user_id"].to_numpy()[keep]})
        g = g.drop_duplicates()
        cell = g["cohort_day"].to_numpy(np.int64) * 100_000 + g[
            "days_since"].to_numpy(np.int64)
        g["_p2"] = (
            pd.util.hash_pandas_object(pd.Series(cell), index=False).to_numpy()
            % P2
        ).astype(np.int32)
        return g

    def cell_count(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(["cohort_day", "days_since", "user_id"])
        out = g.groupby(["cohort_day", "days_since"], as_index=False).size()
        out.columns = ["cohort_day", "days_since", "n_users"]
        return out

    out = (
        joined.map_batches(cell_rows, batch_format="pandas", batch_size=None)
        .groupby("_p2")
        .map_groups(cell_count, batch_format="pandas")
        .groupby(["cohort_day", "days_since"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .to_pandas()  # bounded: days x horizon cells
    )
    out["cohort_day"] = (out["cohort_day"].to_numpy(np.int64) * DAY_US).astype(
        "datetime64[us]")
    out["days_since"] = out["days_since"].astype(np.int64)
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values(["cohort_day", "days_since"]).reset_index(drop=True)


def doc_bm25_search(sf_dir: str):
    """BM25 ranked retrieval (`text.bm25_search`) for a fixed 3-term
    query: two streaming passes, zero shuffle, per-block partial
    top-k. Oracle: the same Robertson/Sparck-Jones formula spelled out
    in SQL over string_split tokens, ranked on the 6-decimal-rounded
    score with doc_id tie-break."""
    from ..stages.text import bm25_search

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = bm25_search(ds, ("hash", "join", "stream"), k=10)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out[["doc_id", "score"]]


def doc_hybrid_rrf(sf_dir: str):
    """Hybrid retrieval via reciprocal-rank fusion (Cormack et al.,
    SIGIR 2009): fuse the BM25 lexical ranking with the embedding
    cosine ranking over the aligned ``doc_id == vec_id`` corpus.

    Each leg is the existing distributed path — two-pass zero-shuffle
    BM25 (`text.bm25_search`) and broadcast-query partial-top-k cosine
    (`similarity.ann_brute_force`) — producing its deterministic
    (rounded score desc, id asc) top-20. Fusion itself touches only
    the 2x20 bounded candidate rows on the driver:
    ``rrf = 1/(60+bm25_rank) + 1/(60+cos_rank)`` (absent leg
    contributes 0, added in that fixed order for IEEE-identical sums
    vs the oracle). Output: top-10 by (rounded rrf desc, doc_id asc)."""
    from ..stages.similarity import ann_brute_force
    from ..stages.text import bm25_search

    n_leg = 20

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    lex = bm25_search(docs, ("hash", "join", "stream"), k=n_leg)
    lex = lex.reset_index(drop=True)
    lex["b_rank"] = np.arange(1, len(lex) + 1, dtype=np.int64)

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = _query_vec(sf_dir)[None, :]
    # partial top-50 per block so rounding cannot demote a true top-20
    sem = ann_brute_force(emb, q, k=50, concurrency=2).to_pandas()
    sem["score"] = round_half_away(sem["score"].to_numpy(), 6)
    sem = (
        sem.sort_values(["score", "vec_id"], ascending=[False, True])
        .head(n_leg)
        .reset_index(drop=True)
    )
    sem["a_rank"] = np.arange(1, len(sem) + 1, dtype=np.int64)

    fused = pd.merge(
        lex[["doc_id", "b_rank"]],
        sem[["vec_id", "a_rank"]].rename(columns={"vec_id": "doc_id"}),
        on="doc_id",
        how="outer",
    )
    b = fused["b_rank"].to_numpy(np.float64)
    a = fused["a_rank"].to_numpy(np.float64)
    tb = np.where(np.isnan(b), 0.0, 1.0 / (60.0 + b))
    ta = np.where(np.isnan(a), 0.0, 1.0 / (60.0 + a))
    fused["rrf"] = round_half_away(tb + ta, 9)
    fused["doc_id"] = fused["doc_id"].astype(np.int64)
    out = (
        fused.sort_values(["rrf", "doc_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    return out[["doc_id", "rrf"]]


def ev_ks_test(sf_dir: str):
    """EXACT two-sample Kolmogorov-Smirnov statistic between the value
    distributions of 'click' and 'purchase' events — distributed via
    the bounded-domain trick: values are fixed 2-decimal, so per-batch
    CENT-histogram partials merge in one tiny groupby and the ECDF max
    -gap evaluates on the bounded distinct-value grid (domain-sized,
    not corpus-sized). Oracle: the same running-fraction max in SQL
    window functions."""

    ds = _read(
        sf_dir, "events", columns=["event_type", "value"],
        filter=pc.field("event_type").isin(["click", "purchase"]),
    )

    from ..stages.rollup import partitions_for_input

    P = partitions_for_input(None)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(batch["value"].to_numpy(np.float64) * 100).astype(np.int64)
        is_a = (batch["event_type"] == "click").to_numpy()
        g = pd.DataFrame({"cents": cents,
                          "n1": is_a.astype(np.int64),
                          "n2": (~is_a).astype(np.int64)})
        g = g.groupby("cents", as_index=False).sum()
        g["_part"] = (g["cents"].to_numpy(np.int64) % P).astype(np.int32)
        return g

    def merge_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("cents", as_index=False)[["n1", "n2"]].sum()

    h = (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby("_part")
        .map_groups(merge_part, batch_format="pandas")
        .to_pandas()  # bounded by the value DOMAIN, not the corpus
    )
    h = h.sort_values("cents")
    n1 = int(h["n1"].sum())
    n2 = int(h["n2"].sum())
    c1 = np.cumsum(h["n1"].to_numpy(np.int64))
    c2 = np.cumsum(h["n2"].to_numpy(np.int64))
    ks = float(np.max(np.abs(c1 / n1 - c2 / n2))) if len(h) else 0.0
    return pd.DataFrame({
        "ks": [round_half_away(np.float64(ks), 9)],
        "n_click": np.array([n1], np.int64),
        "n_purchase": np.array([n2], np.int64),
    })


def doc_ssjoin(sf_dir: str):
    """Exact set-similarity self-join over documents: ALL pairs with
    word-3-gram shingle-set Jaccard >= 0.6, mined by prefix filtering
    (`dedup.ssjoin_prefix`) — exact recall, unlike the MinHash/SimHash
    tiers. Only verified near-dup pairs (sparse) reach the driver.
    Oracle: DuckDB computes the same grams/intersections from the raw
    strings; the engine works on 64-bit shingle ids (collision odds
    ~1e-11 at this corpus size)."""
    from ..stages.dedup import ssjoin_prefix

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ssjoin_prefix(ds, threshold=0.6, shingle_n=3).to_pandas()
    if "a" not in out.columns:
        out = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                            "b": pd.Series([], dtype=np.int64),
                            "jaccard": pd.Series([], dtype=np.float64)})
    out["jaccard"] = np.round(out["jaccard"].to_numpy(np.float64), 6)
    out["a"] = out["a"].astype(np.int64)
    out["b"] = out["b"].astype(np.int64)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def doc_gopher_rules(sf_dir: str):
    """Gopher/C4 quality rule features per document (Rae et al. 2021
    appendix A, word-level analogues — the corpus has no line
    structure): word count, mean word length, alphabetic fraction,
    stopword hits, duplicate-word fraction, modal-word fraction, and
    the combined pass flag (`text.gopher_quality`, actor pool)."""
    from ..stages.text import gopher_quality

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = gopher_quality(ds)
    out = _rename_ds(out, {"pass": "passes"})
    return _round_ds(out, {"mean_word_len": 6, "frac_alpha": 6,
                           "frac_dup_words": 6, "top_word_frac": 6})


def ev_kmv_overlap(sf_dir: str):
    """Pairwise user-set overlap between event types via KMV / theta
    sketches (`distinct.kmv_set_overlap`, Beyer et al. SIGMOD'07):
    per-block mergeable bottom-k partials — the only sketch family
    here that estimates set INTERSECTION, not just union cardinality.
    SELF-VERIFYING, fully distributed: exact per-pair intersections
    come from a per-user TYPE-BITMASK reduction (one int-keyed user
    exchange; only the <= 2^|types| bitmask histogram reaches the
    driver — the user domain never does) and must sit within the
    4/sqrt(k) KMV error band; sketches below capacity must be exact."""
    from ..stages.distinct import kmv_set_overlap
    from ..stages.join import hash_groupby_sum

    k = 256
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    approx = kmv_set_overlap(ds, "event_type", "user_id", k=k)

    # exact side: per-user OR of type bits -> bitmask histogram
    types = sorted(approx["key_a"].tolist() + approx["key_b"].tolist())
    types = sorted(set(types))
    bit = {t: 1 << i for i, t in enumerate(types)}

    def user_bits(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch["event_type"].map(bit).to_numpy(np.int64)
        df = pd.DataFrame({"user_id": batch["user_id"].to_numpy(), "b": m})
        return df.groupby("user_id", as_index=False)["b"].agg(np.bitwise_or.reduce)

    def or_merge(g: pd.DataFrame) -> pd.DataFrame:
        f = g.groupby("user_id", as_index=False)["b"].agg(np.bitwise_or.reduce)
        vc = f["b"].value_counts()
        return pd.DataFrame({"mask": vc.index.to_numpy(np.int64),
                             "cnt": vc.to_numpy(np.int64)})

    P = _join_partitions()

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_part"] = (
            pd.util.hash_pandas_object(batch["user_id"], index=False).to_numpy()
            % P
        ).astype(np.int32)
        return batch

    hist = (
        ds.map_batches(user_bits, batch_format="pandas", batch_size=None)
        .map_batches(tag, batch_format="pandas", batch_size=None)
        .groupby("_part")
        .map_groups(or_merge, batch_format="pandas")
        .to_pandas()
        .groupby("mask", as_index=False)["cnt"].sum()
    )
    masks = hist["mask"].to_numpy(np.int64)
    cnts = hist["cnt"].to_numpy(np.int64)

    def exact_n(t):
        return int(cnts[(masks & bit[t]) > 0].sum())

    def exact_common(a, b):
        both = bit[a] | bit[b]
        return int(cnts[(masks & both) == both].sum())

    def exact_union(a, b):
        either = bit[a] | bit[b]
        return int(cnts[(masks & either) > 0].sum())

    bound = 4.0 / np.sqrt(k)
    rows = []
    for _, r in approx.iterrows():
        na, nb = exact_n(r["key_a"]), exact_n(r["key_b"])
        n_common = exact_common(r["key_a"], r["key_b"])
        union = exact_union(r["key_a"], r["key_b"])
        jac = n_common / union if union else 0.0
        err_a = abs(r["n_a_approx"] - na) / max(1, na)
        err_b = abs(r["n_b_approx"] - nb) / max(1, nb)
        # intersection rel-error scales like 1/sqrt(k * J): widen by
        # the measured jaccard, floor at the union bound
        i_bound = bound / max(np.sqrt(jac), 0.25) if n_common else 0.0
        err_i = (abs(r["n_common_approx"] - n_common) / max(1, n_common)
                 if n_common else abs(r["n_common_approx"]))
        ok = (err_a <= bound and err_b <= bound
              and err_i <= max(i_bound, bound)
              and abs(r["jaccard_approx"] - jac) <= 0.15)
        rows.append({
            "key_a": r["key_a"], "key_b": r["key_b"],
            "n_common_exact": np.int64(n_common),
            "n_common_approx": round(float(r["n_common_approx"]), 2),
            "jaccard_exact": round(jac, 6),
            "jaccard_approx": round(float(r["jaccard_approx"]), 6),
            "rel_err_common": round(float(err_i), 4),
            "ok": bool(ok),
        })
    return pd.DataFrame(rows).sort_values(["key_a", "key_b"]).reset_index(drop=True)


def ev_auto_join(sf_dir: str):
    """Orders x customer revenue per market segment through the
    ADAPTIVE join planner (`join.auto_join`): one-pass sketch stats on
    both sides (KMV distinct, Misra-Gries skew, CMS frequencies),
    CMS-inner-product output-size estimate, then strategy selection —
    the customer dimension fits the broadcast limit, so the orders
    stream never shuffles. Oracle checks the full join + aggregate."""
    from ..stages.join import auto_join, hash_groupby_sum

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def rename(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.rename(columns={"c_custkey": "o_custkey"})

    cust = cust.map_batches(rename, batch_format="pandas", batch_size=None)
    joined, decision = auto_join(orders, cust, on="o_custkey")
    assert decision["strategy"] == "broadcast", decision

    def scale(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_mktsegment": batch["c_mktsegment"],
            "n_orders": np.int64(1),
            "cents": np.round(batch["o_totalprice"].to_numpy() * 100).astype(np.int64),
        })

    out = hash_groupby_sum(
        joined.map_batches(scale, batch_format="pandas", batch_size=None),
        "c_mktsegment", ("n_orders", "cents"),
    ).to_pandas()
    out["total_price"] = round_half_away(out["cents"].to_numpy() / 100.0, 6)
    out = out.drop(columns=["cents"])
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def tr_join_planner(sf_dir: str):
    """The adaptive planner's DECISIONS, self-verified across three
    engineered shapes on the events/customer tables: (a) small dim ->
    broadcast; (b) hot-keyed fact vs unique dim, broadcast disabled ->
    skew; (c) two flat sides, broadcast disabled -> shuffle. Every
    strategy's output row count must equal the pandas ground truth and
    the CMS inner-product estimate must bracket it from above within
    the additive bound."""
    import ray.data

    from ..stages.join import auto_join

    ev = _read(sf_dir, "events", columns=["user_id", "value"])

    def ukey(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": batch["user_id"].to_numpy(np.int64),
                             "value": batch["value"]})

    fact = ev.map_batches(ukey, batch_format="pandas", batch_size=None).materialize()
    n_users = int(fact.max("k")) + 1
    dim = pd.DataFrame({"k": np.arange(n_users, dtype=np.int64),
                        "grp": np.arange(n_users, dtype=np.int64) % 7})
    dim_ds = ray.data.from_pandas(dim)
    # the dim covers every key in [0, max], so the exact inner-join
    # cardinality is the fact row count — no driver key pull
    exact_rows = int(fact.count())

    rows = []
    out_a, dec_a = auto_join(fact, dim_ds, on="k")
    got_a = int(out_a.count())
    rows.append(("small_dim", dec_a, got_a, exact_rows))

    # hot key: half of all events re-keyed to user 0 -> hot ratio
    # ~0.5 * n_users regardless of scale
    def heat(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        k = batch["k"].to_numpy().copy()
        k[:: 2] = 0
        batch["k"] = k
        return batch

    hot = fact.map_batches(heat, batch_format="pandas", batch_size=None).materialize()
    exact_hot = int(hot.count())  # dim covers every key
    out_b, dec_b = auto_join(hot, dim_ds, on="k", broadcast_limit=10,
                             skew_ratio=4.0)
    rows.append(("hot_fact", dec_b, int(out_b.count()), exact_hot))

    out_c, dec_c = auto_join(fact, dim_ds, on="k", broadcast_limit=10,
                             skew_ratio=1e9)
    rows.append(("flat_forced_shuffle", dec_c, int(out_c.count()), exact_rows))

    expected = {"small_dim": "broadcast", "hot_fact": "skew",
                "flat_forced_shuffle": "shuffle"}
    recs = []
    for name, dec, got, exact in rows:
        bound = np.e / 4096 * dec["left_rows"] * dec["right_rows"]
        est_ok = exact <= dec["est_join_rows"] <= exact + 4 * bound + 1
        recs.append({
            "case": name,
            "strategy": dec["strategy"],
            "rows": got,
            "exact_rows": exact,
            "est_join_rows": dec["est_join_rows"],
            "ok": bool(dec["strategy"] == expected[name]
                       and got == exact and est_ok),
        })
    return pd.DataFrame(recs)


def ev_seasonal_decompose(sf_dir: str):
    """Classical additive seasonal decomposition per user over the
    DENSE hourly event-count series (the moving-average decomposition
    behind STL, Cleveland et al. 1990 §2, with a +/-12h centered
    shrinking-edge trend window and hour-of-day seasonal means):
    ``x = trend + seasonal + resid``. Counts are integers, so the
    trend's window sums are exact on both engine and oracle; the
    per-(user, hour-of-day) seasonal mean and residual round at 1e-6.
    Distributed shape: one int-keyed (user, hour) count exchange, then
    per-user vectorized densify+decompose (users are a bounded
    dimension; the dense grid is calendar-bounded per user)."""
    from ..stages.join import hash_groupby_sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def hour_counts(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(),
            "hs": batch["ts"].dt.floor("h"),
            "x": np.int64(1),
        })

    counts = hash_groupby_sum(
        ds.map_batches(hour_counts, batch_format="pandas", batch_size=None),
        ("user_id", "hs"), ("x",),
    )

    def decomp(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("hs")
        lo, hi = g["hs"].iloc[0], g["hs"].iloc[-1]
        grid = pd.date_range(lo, hi, freq="h")
        x = np.zeros(len(grid), dtype=np.int64)
        pos = ((g["hs"].to_numpy() - lo.to_datetime64())
               // np.timedelta64(1, "h")).astype(np.int64)
        x[pos] = g["x"].to_numpy(np.int64)
        n = len(grid)
        cs = np.concatenate([[0], np.cumsum(x, dtype=np.int64)])
        i = np.arange(n)
        lo_i = np.maximum(0, i - 12)
        hi_i = np.minimum(n - 1, i + 12)
        wsum = cs[hi_i + 1] - cs[lo_i]
        cnt = hi_i - lo_i + 1
        trend = wsum / cnt  # exact: integer sums / integer counts
        det = x - trend
        hod = grid.hour.to_numpy()
        seasonal = (np.bincount(hod, weights=det, minlength=24)
                    / np.maximum(np.bincount(hod, minlength=24), 1))[hod]
        resid = x - trend - seasonal
        return pd.DataFrame({
            "user_id": g["user_id"].iloc[0],
            "hs": grid,
            "x": x,
            "trend": round_half_away(trend, 6),
            "seasonal": round_half_away(seasonal, 6),
            "resid": round_half_away(resid, 6),
        })

    return counts.groupby("user_id").map_groups(decomp, batch_format="pandas")


def ev_psi_drift(sf_dir: str):
    """Population-stability-index drift of the event value distribution
    between the two halves of the month (the standard ML-ops feature-
    drift score): fixed-width value bins, per-half shares p/q, PSI =
    sum (p - q) * ln(p / q) over bins populated in BOTH halves.
    Distributed shape: per-block pyarrow bin-count partials (one
    (half, bin) row per block, no value shuffle), tiny driver finish.
    The oracle replicates the whole expression in SQL; ln agrees to
    the 1e-6 rounding on both sides."""
    split = np.datetime64("2024-01-15", "us")
    bin_w = 50.0
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        half = (batch["ts"].to_numpy() >= split).astype(np.int64)
        b = np.floor(batch["value"].to_numpy(np.float64) / bin_w).astype(np.int64)
        df = pd.DataFrame({"half": half, "bin": b})
        out = df.value_counts(["half", "bin"]).reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = ds.map_batches(
        partial, batch_format="pandas", batch_size=None
    ).to_pandas()
    agg = parts.groupby(["half", "bin"], as_index=False)["n"].sum()
    piv = agg.pivot(index="bin", columns="half", values="n").fillna(0)
    n0 = float(piv[0].sum()) if 0 in piv.columns else 0.0
    n1 = float(piv[1].sum()) if 1 in piv.columns else 0.0
    both = piv[(piv.get(0, 0) > 0) & (piv.get(1, 0) > 0)]
    p = both[0].to_numpy(np.float64) / n0
    q = both[1].to_numpy(np.float64) / n1
    psi = float(np.sum((p - q) * np.log(p / q)))
    return pd.DataFrame({
        "psi": [round_half_away(np.array([psi]), 6)[0]],
        "n_bins_used": np.array([len(both)], np.int64),
        "n_first": np.array([int(n0)], np.int64),
        "n_second": np.array([int(n1)], np.int64),
    })


def ev_ols_trend(sf_dir: str):
    """Per-user OLS trend of hourly event counts, EXACT against SQL:
    slope/intercept/R^2 are computed from integer sufficient statistics
    (n, St, Sy, Stt, Sty, Syy with t = hours since the user's first
    active hour, y = hourly count) — every sum is integer-valued and
    < 2^53, so engine and DuckDB produce bit-identical doubles from
    the closed-form expressions. Users with fewer than 2 active hours
    or zero count variance are excluded on both sides. Complements the
    robust Theil-Sen entry with the classical estimator."""
    from ..stages.join import hash_groupby_sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def hour_counts(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(),
            "h": batch["ts"].dt.floor("h"),
            "y": np.int64(1),
        })

    counts = hash_groupby_sum(
        ds.map_batches(hour_counts, batch_format="pandas", batch_size=None),
        ("user_id", "h"), ("y",),
    )

    def ols(g: pd.DataFrame) -> pd.DataFrame:
        h = pd.to_datetime(g["h"])
        t = ((h - h.min()) // pd.Timedelta(hours=1)).to_numpy(np.int64)
        y = g["y"].to_numpy(np.int64)
        n = len(g)
        st, sy = int(t.sum()), int(y.sum())
        stt, sty, syy = int((t * t).sum()), int((t * y).sum()), int((y * y).sum())
        dx = n * stt - st * st
        dy = n * syy - sy * sy
        if n < 2 or dx == 0 or dy == 0:
            return pd.DataFrame({"user_id": pd.Series([], dtype=object),
                                 "n_hours": pd.Series([], dtype=np.int64),
                                 "slope": pd.Series([], dtype=np.float64),
                                 "intercept": pd.Series([], dtype=np.float64),
                                 "r2": pd.Series([], dtype=np.float64)})
        cov = n * sty - st * sy
        slope = cov / dx
        intercept = (sy - slope * st) / n
        r2 = (cov * cov) / (dx * dy)
        return pd.DataFrame({
            "user_id": [g["user_id"].iloc[0]],
            "n_hours": np.array([n], np.int64),
            "slope": round_half_away(np.array([slope]), 6),
            "intercept": round_half_away(np.array([intercept]), 6),
            "r2": round_half_away(np.array([r2]), 6),
        })

    return counts.groupby("user_id").map_groups(ols, batch_format="pandas")


def ev_conformal_interval(sf_dir: str):
    """Split-conformal prediction interval per user (Vovk et al.;
    Lei et al. JASA 2018 split-conformal recipe) around the
    seasonal-naive lag-24h forecaster on DENSE hourly event counts:
    the first 75% of the global calendar is calibration — interval
    half-width = 0.9-quantile of its absolute residuals (linear
    interpolation, matching quantile_cont on integer errors) — and
    the held-out tail reports empirical coverage. Counts are ints, so
    residuals are exact and the width/coverage agree with SQL at 1e-6.
    Shape: one (user, hour) count exchange; per-user densify on the
    shared calendar grid, vectorized."""
    from ..stages.join import hash_groupby_sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def hour_minmax(batch: pa.Table) -> pa.Table:
        h = pc.floor_temporal(batch["ts"], unit="hour")
        return pa.table({"lo": [pc.min(h).as_py()], "hi": [pc.max(h).as_py()]})

    mm = ds.map_batches(hour_minmax, batch_format="pyarrow", batch_size=None).to_pandas()
    lo = mm["lo"].min().to_datetime64().astype("datetime64[h]")
    hi = mm["hi"].max().to_datetime64().astype("datetime64[h]")
    n_hours = int((hi - lo) / np.timedelta64(1, "h")) + 1
    thresh = int(np.floor(n_hours * 0.75))

    def hour_counts(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(),
            "h": batch["ts"].dt.floor("h"),
            "n": np.int64(1),
        })

    counts = hash_groupby_sum(
        ds.map_batches(hour_counts, batch_format="pandas", batch_size=None),
        ("user_id", "h"), ("n",),
    )

    lo64 = lo.astype("datetime64[us]")

    def conformal(g: pd.DataFrame) -> pd.DataFrame:
        x = np.zeros(n_hours, dtype=np.int64)
        pos = ((pd.to_datetime(g["h"]).to_numpy().astype("datetime64[us]")
                - lo64) // np.timedelta64(1, "h")).astype(np.int64)
        x[pos] = g["n"].to_numpy(np.int64)
        ae = np.abs(x[24:] - x[:-24])  # residual at t >= 24, index t-24
        t = np.arange(24, n_hours)
        cal = ae[t < thresh]
        test = ae[t >= thresh]
        if len(cal) == 0 or len(test) == 0:
            return pd.DataFrame({"user_id": pd.Series([], dtype=object),
                                 "n_cal": pd.Series([], dtype=np.int64),
                                 "n_test": pd.Series([], dtype=np.int64),
                                 "width": pd.Series([], dtype=np.float64),
                                 "coverage": pd.Series([], dtype=np.float64)})
        width = float(np.quantile(cal, 0.9))  # linear == quantile_cont
        cov = float((test <= width).mean())
        return pd.DataFrame({
            "user_id": [g["user_id"].iloc[0]],
            "n_cal": np.array([len(cal)], np.int64),
            "n_test": np.array([len(test)], np.int64),
            "width": round_half_away(np.array([width]), 6),
            "coverage": round_half_away(np.array([cov]), 6),
        })

    return counts.groupby("user_id").map_groups(conformal, batch_format="pandas")


def ev_mann_kendall(sf_dir: str):
    """Mann-Kendall non-parametric trend test per user over DAILY event
    counts (Mann 1945; Kendall 1975, with the tie-corrected variance):
    S = sum of sign(x_j - x_i) over ordered day pairs, Var(S) from the
    tie-group formula, z with the +/-1 continuity correction — every
    intermediate is an integer, so engine and SQL agree bit-for-bit up
    to the final sqrt/division (rounded 1e-6). The O(days^2) pair scan
    is per user on a calendar-bounded series (31 days here), vectorized
    via sign-matrix sum."""
    from ..stages.join import hash_groupby_sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def day_counts(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(),
            "d": batch["ts"].dt.floor("D"),
            "n": np.int64(1),
        })

    counts = hash_groupby_sum(
        ds.map_batches(day_counts, batch_format="pandas", batch_size=None),
        ("user_id", "d"), ("n",),
    )

    def mk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("d")
        x = g["n"].to_numpy(np.int64)
        n = len(x)
        if n < 3:
            return pd.DataFrame({"user_id": pd.Series([], dtype=object),
                                 "n_days": pd.Series([], dtype=np.int64),
                                 "s_stat": pd.Series([], dtype=np.int64),
                                 "var_s": pd.Series([], dtype=np.float64),
                                 "z": pd.Series([], dtype=np.float64)})
        diff = np.sign(x[None, :] - x[:, None])
        s = int(np.triu(diff, k=1).sum())
        _, tie_counts = np.unique(x, return_counts=True)
        ties = int(np.sum(tie_counts * (tie_counts - 1) * (2 * tie_counts + 5)))
        var_s = (n * (n - 1) * (2 * n + 5) - ties) / 18.0
        if s > 0:
            z = (s - 1) / np.sqrt(var_s)
        elif s < 0:
            z = (s + 1) / np.sqrt(var_s)
        else:
            z = 0.0
        return pd.DataFrame({
            "user_id": [g["user_id"].iloc[0]],
            "n_days": np.array([n], np.int64),
            "s_stat": np.array([s], np.int64),
            "var_s": round_half_away(np.array([var_s]), 6),
            "z": round_half_away(np.array([float(z)]), 6),
        })

    return counts.groupby("user_id").map_groups(mk, batch_format="pandas")


def ev_gini_concentration(sf_dir: str):
    """Gini coefficient of per-user event-count concentration (the
    sorted-rank closed form G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over
    ascending counts): integer rank/count sums make the ratio exact on
    both sides. Per-user totals via one int-keyed exchange; only the
    HISTOGRAM of totals reaches the driver (bounded count domain, not
    the unbounded key domain) — the rank sum collapses per distinct
    value, identical to sorting the keys."""
    from ..stages.join import hash_groupby_sum

    ds = _read(sf_dir, "events", columns=["user_id"])

    def ones(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": batch["user_id"].to_numpy(),
                             "n": np.int64(1)})

    totals = hash_groupby_sum(
        ds.map_batches(ones, batch_format="pandas", batch_size=None),
        "user_id", ("n",),
    )

    # scale path: only a HISTOGRAM of per-key totals reaches the driver
    # (count domain is bounded; the key domain is not). The sorted-rank
    # sum collapses per distinct value v with count c and preceding
    # cumulative S: sum(i * x_i) = sum_v v*(c*S + c*(c+1)/2) — exact
    # integers, identical to sorting the keys.
    def hist(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch["n"].value_counts()
        return pd.DataFrame({"v": vc.index.to_numpy(np.int64),
                             "c": vc.to_numpy(np.int64)})

    h = (
        totals.map_batches(hist, batch_format="pandas", batch_size=None)
        .to_pandas()
        .groupby("v", as_index=False)["c"].sum()
        .sort_values("v")
    )
    v = h["v"].to_numpy(np.int64)
    c = h["c"].to_numpy(np.int64)
    n = int(c.sum())
    tot = int((v * c).sum())
    s_prev = np.concatenate([[0], np.cumsum(c)[:-1]])
    weighted = int((v * (c * s_prev + c * (c + 1) // 2)).sum())
    gini = 2.0 * weighted / (n * tot) - (n + 1) / n
    return pd.DataFrame({
        "n_users": np.array([n], np.int64),
        "total_events": np.array([tot], np.int64),
        "gini": round_half_away(np.array([gini]), 6),
    })


def ev_ntile(sf_dir: str):
    """``ntile(4) over (partition by user_id order by ts, event_id)``
    with the exact ANSI uneven-bucket rule (`features.analytic_ntile`,
    one int-keyed shuffle + segmented numpy pass) — completes the
    analytic window family (row_number/lag/lead/rank/dense_rank/
    running/trailing sums/ntile)."""
    from ..stages.features import analytic_ntile

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    out = analytic_ntile(ds, key="user_id", order_cols=("ts", "event_id"), k=4)
    return out.select_columns(["event_id", "user_id", "bucket"])


def ev_rolling_slope(sf_dir: str):
    """Trailing-24-activity-row OLS slope of hourly event count per
    user (`features.rolling_ols_slope`): the windowed-regression
    "is this user accelerating?" feature. One int-keyed exchange of
    (user, hour, count) partials, per-partition prefix-sum windowed
    moments, slope = one double division of exact int64s —
    IEEE-identical to the oracle's window SQL."""
    from ..stages.features import rolling_ols_slope

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    out = rolling_ols_slope(ds, key="user_id", ts_col="ts", window=24)
    return _round_ds(out, {"slope": 9})


def ev_percent_rank(sf_dir: str):
    """``percent_rank() / cume_dist() over (partition by user_id order
    by value)`` with exact ANSI tie semantics
    (`features.analytic_percent_rank`): ties resolved on the integer
    cents key so both engines see bit-equal order keys, each output one
    double division of exact int64s — IEEE-identical to DuckDB's window
    functions. One int-keyed shuffle + segmented numpy passes."""
    from ..stages.features import analytic_percent_rank

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    out = analytic_percent_rank(
        ds, key="user_id", value_col="value", id_cols=("event_id",)
    )
    return out.select_columns(
        ["event_id", "user_id", "rnk", "percent_rank", "cume_dist"]
    )


def fuzzy_customer_names(sf_dir: str):
    """Typo-variant entity resolution: every unordered pair of distinct
    customer names at Levenshtein distance <= 1
    (`stages/fuzzy.fuzzy_ed1_self_join`: FastSS deletion-neighborhood
    blocking + vectorized banded ED<=1 verify, two bounded int-keyed
    exchanges, no driver state). The oracle recomputes the pairs with
    DuckDB `levenshtein()` under a half-agreement blocking that is
    exact for this fixed-width name column (one substitution leaves
    one digit half intact)."""
    from ..stages.fuzzy import fuzzy_ed1_self_join

    ds = _read(sf_dir, "customer", columns=["c_name"])
    out = fuzzy_ed1_self_join(ds, "c_name").to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def orders_pareto(sf_dir: str):
    """Skyline / Pareto-front preference query (`stages/skyline`,
    Börzsönyi ICDE'01): per order priority, the orders not dominated on
    (o_totalprice, o_orderdate) — "no other order of this priority is
    both at least as expensive and at least as recent, strictly better
    in one". Mergeable front-of-fronts: per-batch vectorized fronts,
    one group-hash exchange of front rows only, identical merge kernel.
    Oracle: the running-max window formulation (validated equal to the
    quadratic NOT EXISTS dominance SQL)."""
    from ..stages.skyline import pareto_front

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderpriority", "o_totalprice",
                        "o_orderdate"])
    out = pareto_front(
        ds, group_col="o_orderpriority", x_col="o_totalprice",
        y_col="o_orderdate",
    ).to_pandas()
    return out.sort_values(["o_orderpriority", "o_orderkey"]).reset_index(
        drop=True
    )[["o_orderpriority", "o_orderkey", "o_totalprice", "o_orderdate"]]


def ev_ohlc_bars(sf_dir: str):
    """Financial OHLC bars per (event_type, 1h bucket): open/close are
    the first/last value under the (ts, event_id) total order, high/low
    the extrema, count and an exact cents-integer sum (`olap.ohlc_bars`
    — the latest-state monoid kept at BOTH frame edges). One bounded
    partial-collapse exchange; no driver state."""
    from ..stages.olap import ohlc_bars

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "event_id", "value"])
    out = ohlc_bars(ds, group_col="event_type", interval="1h").to_pandas()
    res = pd.DataFrame(
        {
            "event_type": out["event_type"],
            "bucket_ts": out["bucket_ts"].to_numpy().astype("datetime64[us]"),
            "open_v": out["open_v"].astype(np.float64),
            "high_v": out["high_v"].astype(np.float64),
            "low_v": out["low_v"].astype(np.float64),
            "close_v": out["close_v"].astype(np.float64),
            "n": out["n"].astype(np.int64),
            "sum_v": out["sum_c"].to_numpy(dtype=np.int64) / 100.0,
        }
    )
    return res.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)


def ev_longest_streak(sf_dir: str):
    """Gaps-and-islands: each user's longest run of consecutive equal
    event types in (ts, event_id) order, tie-broken (len DESC, start
    ASC, min id ASC) — `temporal.longest_streak`, the distributed
    row_number()-difference islands idiom. One narrow int-keyed
    shuffle, one segmented numpy pass per partition."""
    from ..stages.temporal import longest_streak

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])
    out = longest_streak(ds).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def ev_daily_corr(sf_dir: str):
    """Per-day Pearson correlation between hourly click and purchase
    counts (hours with at least one event of any type form the grid).
    Per-batch Arrow partials -> one tiny (hour) groupby of int64
    counts; the per-day closed form runs over exact integer moment
    sums, so the only float ops are one multiply/sqrt/divide chain —
    written IDENTICALLY in the oracle SQL (calendar-bounded driver
    finish: rows = #hours, independent of corpus size)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        t = pa.table(
            {
                "hour_ts": pc.floor_temporal(batch["ts"], unit="hour"),
                "na": pc.cast(pc.equal(et, pa.scalar("click")), pa.int64()),
                "nb": pc.cast(pc.equal(et, pa.scalar("purchase")), pa.int64()),
            }
        )
        return t.group_by(["hour_ts"]).aggregate([("na", "sum"), ("nb", "sum")])

    hourly = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("hour_ts")
        .aggregate(Sum("na_sum", alias_name="na"), Sum("nb_sum", alias_name="nb"))
        .to_pandas()  # one row per hour: calendar-bounded
    )
    hour_us = hourly["hour_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    day_us = hour_us // 86_400_000_000 * 86_400_000_000
    na = hourly["na"].to_numpy(dtype=np.int64)
    nb = hourly["nb"].to_numpy(dtype=np.int64)
    g = pd.DataFrame(
        {
            "day_us": day_us,
            "n_hours": 1,
            "sx": na,
            "sy": nb,
            "sxx": na * na,
            "syy": nb * nb,
            "sxy": na * nb,
        }
    ).groupby("day_us", as_index=False).sum()
    n = g["n_hours"].to_numpy(dtype=np.int64)
    sx, sy = g["sx"].to_numpy(np.int64), g["sy"].to_numpy(np.int64)
    vx = n * g["sxx"].to_numpy(np.int64) - sx * sx
    vy = n * g["syy"].to_numpy(np.int64) - sy * sy
    num = (n * g["sxy"].to_numpy(np.int64) - sx * sy).astype(np.float64)
    den = np.sqrt(vx.astype(np.float64) * vy.astype(np.float64))
    corr = np.where((vx == 0) | (vy == 0), np.nan, num / np.where(den == 0, 1.0, den))
    return pd.DataFrame(
        {
            "day_ts": g["day_us"].to_numpy().astype("datetime64[us]"),
            "n_hours": n,
            "n_click": sx,
            "n_purchase": sy,
            "corr_cp": round_half_away(corr, 9),
        }
    ).sort_values("day_ts").reset_index(drop=True)


# Benford expected first-digit probabilities: log10(1 + 1/d). The same
# decimal literals are embedded in the oracle SQL, so both engines
# parse the identical doubles and the chi-square arithmetic is
# bit-identical.
BENFORD_P = [
    0.3010299956639812,
    0.17609125905568124,
    0.12493873660829992,
    0.09691001300805642,
    0.07918124604762482,
    0.06694678963061323,
    0.05799194697768673,
    0.05115252244738129,
    0.04575749056067514,
]


def ev_benford(sf_dir: str):
    """Benford's-law audit of the value column: first significant
    digit of the exact cents integer, observed count vs the Benford
    expectation, per-digit chi-square contribution. Digit extraction
    is pure int64 (searchsorted on the power-of-ten ladder — no float
    log); per-batch bincount partials merge with one 9-row sum."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["value"])
    pow10 = 10 ** np.arange(1, 19, dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        cents = np.rint(np.abs(v) * 100).astype(np.int64)
        cents = cents[cents > 0]
        nd = np.searchsorted(pow10, cents, side="right")  # digits - 1
        digit = cents // pow10[nd - 1]
        digit[nd == 0] = cents[nd == 0]  # single-digit cents
        counts = np.bincount(digit, minlength=10)[1:10]
        return pa.table(
            {"digit": np.arange(1, 10, dtype=np.int64), "n": counts.astype(np.int64)}
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("digit")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # exactly 9 rows
        .sort_values("digit")
        .reset_index(drop=True)
    )
    n = g["n"].to_numpy(dtype=np.int64)
    total = np.int64(n.sum())
    p = np.array(BENFORD_P, dtype=np.float64)
    exp = total.astype(np.float64) * p
    dev = n.astype(np.float64) - exp
    return pd.DataFrame(
        {
            "digit": g["digit"].astype(np.int64),
            "n": n,
            "expected_p": p,
            "chi2_term": round_half_away(dev * dev / exp, 9),
        }
    )


# ------------------------------------------- two-sample / independence tests


def ev_mannwhitney(sf_dir: str):
    """EXACT tie-corrected Mann-Whitney U between the 'click' and
    'purchase' value distributions, distributed via the same
    bounded-domain cent-histogram trick as :func:`ev_ks_test`: the
    rank sum collapses per distinct cent value v with pair counts
    (n1, t) and preceding cumulative c_prev — average rank is
    c_prev + (t+1)/2, so 2*R1 = sum(n1 * (2*c_prev + t + 1)) stays an
    exact int64 all the way to the driver (domain-sized table, never
    corpus-sized). z uses the standard tie-corrected variance
    n1*n2/12 * ((N+1) - sum(t^3-t)/(N*(N-1))); the float expression
    mirrors the oracle SQL term-for-term."""
    ds = _read(
        sf_dir, "events", columns=["event_type", "value"],
        filter=pc.field("event_type").isin(["click", "purchase"]),
    )

    from ..stages.rollup import partitions_for_input

    P = partitions_for_input(None)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(batch["value"].to_numpy(np.float64) * 100).astype(np.int64)
        is_a = (batch["event_type"] == "click").to_numpy()
        g = pd.DataFrame({"cents": cents,
                          "n1": is_a.astype(np.int64),
                          "t": np.int64(1)})
        g = g.groupby("cents", as_index=False).sum()
        g["_part"] = (g["cents"].to_numpy(np.int64) % P).astype(np.int32)
        return g

    def merge_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("cents", as_index=False)[["n1", "t"]].sum()

    h = (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby("_part")
        .map_groups(merge_part, batch_format="pandas")
        .to_pandas()  # bounded by the value DOMAIN, not the corpus
        .sort_values("cents")
    )
    n1v = h["n1"].to_numpy(np.int64)
    tv = h["t"].to_numpy(np.int64)
    c_prev = np.concatenate([[0], np.cumsum(tv)[:-1]]).astype(np.int64)
    r1x2 = int((n1v * (2 * c_prev + tv + 1)).sum())
    tie = int((tv**3 - tv).sum())
    n1 = int(n1v.sum())
    nn = int(tv.sum())
    n2 = nn - n1
    u1 = (r1x2 - n1 * (n1 + 1)) / 2.0
    sigma = np.sqrt(n1 * n2 / 12.0 * ((nn + 1) - tie / (nn * (nn - 1.0))))
    z = (u1 - n1 * n2 / 2.0) / sigma
    return pd.DataFrame({
        "u1": np.array([u1], np.float64),  # exact half-integer
        "z": round_half_away(np.array([z]), 9),
        "n_click": np.array([n1], np.int64),
        "n_purchase": np.array([n2], np.int64),
    })


def ev_chi2_independence(sf_dir: str):
    """Chi-square test of independence between event_type and
    hour-of-day: the contingency table is a per-batch Arrow
    (type, hour) count partial merged in one tiny groupby (bounded by
    |types| x 24, never the corpus), margins and the statistic finish
    on the driver from exact int64 counts. Also reports Cramer's V.
    The float expression ((o*N - r*c)^2 / (N*r*c)) mirrors the oracle
    SQL term-for-term over the identical integer cells."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": batch["event_type"],
            "hod": pc.hour(batch["ts"]),
            "n": pa.array(np.ones(len(batch), dtype=np.int64)),
        })
        return t.group_by(["event_type", "hod"]).aggregate([("n", "sum")])

    g = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["event_type", "hod"])
        .aggregate(Sum("n_sum", alias_name="n"))
        .to_pandas()  # |types| x 24 rows
    )
    n = g["n"].to_numpy(np.int64)
    nn = int(n.sum())
    row_tot = g.groupby("event_type")["n"].transform("sum").to_numpy(np.int64)
    col_tot = g.groupby("hod")["n"].transform("sum").to_numpy(np.int64)
    # cells absent from g are structural zeros: o=0 contributes r*c/N
    # to chi2; add them via the closed form chi2 = N*(sum(o^2/(r*c)) - 1)
    # which needs only the OBSERVED cells — exact same value.
    chi2 = nn * (float((n.astype(np.float64) ** 2
                        / (row_tot.astype(np.float64) * col_tot.astype(np.float64))).sum()) - 1.0)
    r = int(g["event_type"].nunique())
    c = int(g["hod"].nunique())
    dof = (r - 1) * (c - 1)
    cramers_v = np.sqrt(chi2 / (nn * min(r - 1, c - 1)))
    return pd.DataFrame({
        "chi2": round_half_away(np.array([chi2]), 6),
        "dof": np.array([dof], np.int64),
        "n": np.array([nn], np.int64),
        "cramers_v": round_half_away(np.array([cramers_v]), 9),
    })


def ev_entropy(sf_dir: str):
    """Shannon entropy of each user's event-type mix (nats), computed
    as H = ln(n) - sum(c*ln(c))/n from exact per-(user, type) int64
    counts — one int-keyed exchange; the per-user finish is a
    segmented numpy pass (no driver state). Normalized entropy divides
    by ln(n_types) (1-type users -> 0 by convention)."""

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "user_id": batch["user_id"],
            "event_type": batch["event_type"],
            "n": pa.array(np.ones(len(batch), dtype=np.int64)),
        })
        return t.group_by(["user_id", "event_type"]).aggregate([("n", "sum")])

    pairs = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # merge per-batch partials first: the same (user, type) pair
        # arrives from every source batch that saw it
        df = df.groupby(["user_id", "event_type"], as_index=False)["n_sum"].sum()
        g = df.groupby("user_id", as_index=False).agg(
            n_events=("n_sum", "sum"), n_types=("n_sum", "size"))
        c = df["n_sum"].to_numpy(np.float64)
        df = df.assign(_clnc=c * np.log(c))
        s = df.groupby("user_id", as_index=False)["_clnc"].sum()
        out = g.merge(s, on="user_id")
        n = out["n_events"].to_numpy(np.float64)
        h = np.log(n) - out["_clnc"].to_numpy(np.float64) / n
        k = out["n_types"].to_numpy(np.float64)
        hn = np.where(k > 1, h / np.log(k), 0.0)
        return pd.DataFrame({
            "user_id": out["user_id"].astype(np.int64),
            "n_events": out["n_events"].astype(np.int64),
            "n_types": out["n_types"].astype(np.int64),
            "entropy": round_half_away(h, 9),
            "entropy_norm": round_half_away(hn, 9),
        })

    from ..stages.rollup import partitions_for_input

    P = partitions_for_input(None)

    def part_key(batch: pd.DataFrame) -> pd.DataFrame:
        batch["_part"] = (batch["user_id"].to_numpy(np.int64) % P).astype(np.int32)
        return batch

    return (
        pairs.map_batches(part_key, batch_format="pandas", batch_size=None)
        .groupby("_part")
        .map_groups(lambda df: finish(df.drop(columns=["_part"])),
                    batch_format="pandas")
    )


def ev_xcorr_lag(sf_dir: str):
    """Lead-lag cross-correlation between hourly 'click' and
    'purchase' counts: corr(click[t], purchase[t+lag]) for lag 0..3
    over the dense hour grid spanning [min, max] observed hour (absent
    hours count 0 — a genuine zero of the counting process). Hourly
    partials merge in one bounded groupby (calendar-domain-sized);
    the lag alignment and Pearson finish run on the dense grid at the
    driver. Extends `ev_type_correlation` (lag 0, all pairs) with the
    temporal-precedence axis."""
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir, "events", columns=["event_type", "ts"],
        filter=pc.field("event_type").isin(["click", "purchase"]),
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "hour_start": pc.floor_temporal(batch["ts"], unit="hour"),
            "is_click": pc.equal(batch["event_type"], "click"),
            "n": pa.array(np.ones(len(batch), dtype=np.int64)),
        })
        g = t.group_by(["hour_start", "is_click"]).aggregate([("n", "sum")])
        return g

    g = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["hour_start", "is_click"])
        .aggregate(Sum("n_sum", alias_name="n"))
        .to_pandas()  # bounded by the calendar hour domain
    )
    hours = pd.to_datetime(g["hour_start"])
    lo, hi = hours.min(), hours.max()
    grid = pd.date_range(lo, hi, freq="h")
    idx = ((hours - lo).dt.total_seconds() // 3600).astype(np.int64).to_numpy()
    click = np.zeros(len(grid), dtype=np.int64)
    purch = np.zeros(len(grid), dtype=np.int64)
    is_c = g["is_click"].to_numpy(bool)
    nv = g["n"].to_numpy(np.int64)
    np.add.at(click, idx[is_c], nv[is_c])
    np.add.at(purch, idx[~is_c], nv[~is_c])
    rows = []
    for lag in range(4):
        a = click[: len(click) - lag].astype(np.float64)
        b = purch[lag:].astype(np.float64)
        am, bm = a.mean(), b.mean()
        cov = ((a - am) * (b - bm)).sum()
        den = np.sqrt(((a - am) ** 2).sum() * ((b - bm) ** 2).sum())
        rows.append({
            "lag_hours": np.int64(lag),
            "n_buckets": np.int64(len(a)),
            "xcorr": round_half_away(np.float64(cov / den), 9),
        })
    return pd.DataFrame(rows)


def ev_histogram(sf_dir: str):
    """Equi-width 20-bin histogram of `value` per event_type over the
    GLOBAL [min, max] range, exact on the cent grid: pass 1 is a tiny
    min/max aggregate, pass 2 emits per-batch (type, bin) partials
    with bin = floor((cents - cmin) * 20 / (cmax - cmin + 1)) — pure
    int64 arithmetic, identical on both sides, merged in one bounded
    groupby (|types| x 20). Empty (type, bin) cells are emitted with
    n=0 so the output shape is the full grid."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    mm = ds.aggregate(Min("value"), Max("value"))
    cmin = int(np.round(mm["min(value)"] * 100))
    cmax = int(np.round(mm["max(value)"] * 100))
    span = cmax - cmin + 1
    k = 20

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(batch["value"].to_numpy(np.float64) * 100).astype(np.int64)
        b = (cents - cmin) * k // span
        g = pd.DataFrame({"event_type": batch["event_type"].to_numpy(),
                          "bin": b, "n": np.int64(1)})
        return g.groupby(["event_type", "bin"], as_index=False).sum()

    g = (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby(["event_type", "bin"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # |types| x 20 rows
    )
    types = sorted(g["event_type"].unique())
    full = pd.MultiIndex.from_product([types, range(k)],
                                      names=["event_type", "bin"]).to_frame(index=False)
    out = full.merge(g, on=["event_type", "bin"], how="left")
    out["n"] = out["n"].fillna(0).astype(np.int64)
    out["bin"] = out["bin"].astype(np.int64)
    out["lo"] = round_half_away((cmin + out["bin"].to_numpy(np.int64) * span / k) / 100.0, 6)
    return out[["event_type", "bin", "lo", "n"]]


def ev_transitions(sf_dir: str):
    """First-order Markov transition counts of consecutive event types
    per user (ordered by ts, event_id): one int-keyed exchange on
    user hash, a segmented numpy shift inside each partition (pair
    boundaries never cross users), per-partition (from, to) count
    partials, then a tiny global merge bounded by |types|^2. p is the
    row-conditional transition probability n / sum_over_to(n)."""
    from ray.data.aggregate import Sum

    from ..stages.rollup import partitions_for_input

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])
    P = partitions_for_input(None)

    def part_key(batch: pd.DataFrame) -> pd.DataFrame:
        batch["_part"] = (batch["user_id"].to_numpy(np.int64) % P).astype(np.int32)
        return batch

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = df["user_id"].to_numpy(np.int64)
        t = df["event_type"].to_numpy()
        same = u[1:] == u[:-1]
        g = pd.DataFrame({"from_type": t[:-1][same], "to_type": t[1:][same],
                          "n": np.int64(1)})
        return g.groupby(["from_type", "to_type"], as_index=False).sum()

    t = (
        ds.map_batches(part_key, batch_format="pandas", batch_size=None)
        .groupby("_part")
        .map_groups(lambda df: pairs(df.drop(columns=["_part"])),
                    batch_format="pandas")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # |types|^2 rows
    )
    tot = t.groupby("from_type")["n"].transform("sum").to_numpy(np.int64)
    t["n"] = t["n"].astype(np.int64)
    t["p"] = round_half_away(t["n"].to_numpy(np.float64) / tot, 9)
    return (t.sort_values(["from_type", "to_type"]).reset_index(drop=True)
            [["from_type", "to_type", "n", "p"]])


def ev_rfm(sf_dir: str):
    """RFM customer segmentation with EXACT global quartile scores:
    per-user recency (days from last purchase to the global max
    purchase ts), frequency (purchase count) and monetary (cent-exact
    sum), each scored 1-4 by the ANSI ``ntile(4)`` rule under the
    deterministic order ``(metric [recency desc], user_id)`` —
    realized by `features.global_ntile` (sample-based range exchange,
    exact per-partition counts, no single-partition sort, no driver
    row pull). Higher score = better customer on every axis."""
    from ray.data.aggregate import Max, Sum

    from ..stages.features import global_ntile

    ds = _read(
        sf_dir, "events", columns=["user_id", "ts", "value"],
        filter=pc.field("event_type") == "purchase",
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(batch["value"].to_numpy(np.float64) * 100).astype(np.int64)
        tus = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        g = pd.DataFrame({"user_id": batch["user_id"].to_numpy(np.int64),
                          "frequency": np.int64(1), "mon_cents": cents,
                          "last_tus": tus})
        return g.groupby("user_id", as_index=False).agg(
            frequency=("frequency", "sum"), mon_cents=("mon_cents", "sum"),
            last_tus=("last_tus", "max"))

    users = (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby("user_id")
        .aggregate(Sum("frequency", alias_name="frequency"),
                   Sum("mon_cents", alias_name="mon_cents"),
                   Max("last_tus", alias_name="last_tus"))
        .materialize()
    )
    gmax = int(users.max("last_tus"))

    def recency(batch: pd.DataFrame) -> pd.DataFrame:
        # date_diff('day', last_ts, gmax): whole-day boundary count
        us_per_day = 86_400_000_000
        d = gmax // us_per_day - batch["last_tus"].to_numpy(np.int64) // us_per_day
        batch = batch.copy()
        batch["recency_days"] = d.astype(np.int64)
        return batch

    scored = users.map_batches(recency, batch_format="pandas", batch_size=None)
    scored = global_ntile(scored, "recency_days", "user_id", 4,
                          descending=True, out_col="r_score")
    scored = global_ntile(scored, "frequency", "user_id", 4, out_col="f_score")
    scored = global_ntile(scored, "mon_cents", "user_id", 4, out_col="m_score")

    out = scored.to_pandas()  # driver hop is the QUERY RESULT itself
    out["monetary"] = round_half_away(
        out["mon_cents"].to_numpy(np.int64) / 100.0, 2)
    out["rfm"] = (out["r_score"] * 100 + out["f_score"] * 10
                  + out["m_score"]).astype(np.int64)
    for c in ("user_id", "recency_days", "frequency",
              "r_score", "f_score", "m_score"):
        out[c] = out[c].astype(np.int64)
    return (out.sort_values("user_id").reset_index(drop=True)
            [["user_id", "recency_days", "frequency", "monetary",
              "r_score", "f_score", "m_score", "rfm"]])


def ev_ab_test(sf_dir: str):
    """Two-proportion z-test for an A/B experiment: variant = user_id
    parity, conversion = the user recorded >= 1 'purchase' event.
    Per-user flags reduce through one int-keyed exchange; the final
    z uses the pooled-variance normal approximation from exact int64
    counts, mirroring the oracle SQL term-for-term."""
    from ray.data.aggregate import Max

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(np.int64),
            "conv": (batch["event_type"] == "purchase").to_numpy().astype(np.int64),
        })
        return g.groupby("user_id", as_index=False).max()

    users = (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby("user_id")
        .aggregate(Max("conv", alias_name="conv"))
    )

    def variant_counts(batch: pd.DataFrame) -> pd.DataFrame:
        v = (batch["user_id"].to_numpy(np.int64) % 2).astype(np.int64)
        c = batch["conv"].to_numpy(np.int64)
        return pd.DataFrame({
            "variant": [0, 1],
            "n": [int((v == 0).sum()), int((v == 1).sum())],
            "c": [int(c[v == 0].sum()), int(c[v == 1].sum())],
        })

    t = (
        users.map_batches(variant_counts, batch_format="pandas", batch_size=None)
        .to_pandas()  # 2 rows per block
        .groupby("variant", as_index=False)[["n", "c"]].sum()
        .sort_values("variant")
    )
    n0, n1 = int(t["n"].iloc[0]), int(t["n"].iloc[1])
    c0, c1 = int(t["c"].iloc[0]), int(t["c"].iloc[1])
    p0 = c0 / n0
    p1 = c1 / n1
    pp = (c0 + c1) / (n0 + n1)
    z = (p1 - p0) / np.sqrt(pp * (1 - pp) * (1.0 / n0 + 1.0 / n1))
    return pd.DataFrame({
        "n_a": np.array([n0], np.int64), "n_b": np.array([n1], np.int64),
        "conv_a": np.array([c0], np.int64), "conv_b": np.array([c1], np.int64),
        "p_a": round_half_away(np.array([p0]), 9),
        "p_b": round_half_away(np.array([p1]), 9),
        "z": round_half_away(np.array([z]), 9),
    })


def ev_survival_km(sf_dir: str):
    """Kaplan-Meier survival curve for time-to-first-purchase: per
    user, duration = whole days from first event to first purchase
    (event) or to the global max event day (right-censored). One
    int-keyed exchange builds the per-user (duration, is_event) pairs;
    only the bounded DAY-GRID histogram of (events, censorings) per
    duration reaches the driver, where the product-limit estimator
    S(t) = prod_{u<=t}(1 - d_u/n_u) finishes over event days. Ties
    follow the standard convention: users censored on day t stay at
    risk for day-t events."""
    from ray.data.aggregate import Max, Min

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        tus = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        is_p = (batch["event_type"] == "purchase").to_numpy()
        g = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(np.int64),
            "first_tus": tus,
            "first_p_tus": np.where(is_p, tus, np.iinfo(np.int64).max),
        })
        return g.groupby("user_id", as_index=False).min()

    # bounded-partition int-keyed exchange (hash_groupby_agg) instead
    # of Ray's sort-based aggregate — measured ~10x faster at 1e5+ keys
    from ..stages.join import hash_groupby_agg

    users = hash_groupby_agg(
        ds.map_batches(partial, batch_format="pandas", batch_size=None),
        "user_id",
        {"first_tus": "min", "first_p_tus": "min"},
    ).materialize()
    # global max event day from parquet footer statistics (driver
    # metadata read — no second full events scan / executor spin-up)
    meta = _ts_minmax_meta(sf_dir, "events")
    if meta is not None:
        gmax_ts = meta[1]
    else:
        gmax_ts = pd.Timestamp(ds.aggregate(Max("ts"))["max(ts)"])
    gmax_day = int(np.datetime64(gmax_ts, "us").astype(np.int64)
                   // 86_400_000_000)

    us_per_day = 86_400_000_000
    sentinel = np.iinfo(np.int64).max

    def durations(batch: pd.DataFrame) -> pd.DataFrame:
        fe = batch["first_tus"].to_numpy(np.int64) // us_per_day
        fp = batch["first_p_tus"].to_numpy(np.int64)
        conv = fp != sentinel
        dur = np.where(conv, fp // us_per_day - fe, gmax_day - fe).astype(np.int64)
        g = pd.DataFrame({"t": dur,
                          "d": conv.astype(np.int64),
                          "c": (~conv).astype(np.int64)})
        return g.groupby("t", as_index=False).sum()

    h = (
        users.map_batches(durations, batch_format="pandas", batch_size=None)
        .to_pandas()  # bounded by the calendar DAY domain
        .groupby("t", as_index=False)[["d", "c"]].sum()
        .sort_values("t")
        .reset_index(drop=True)
    )
    d = h["d"].to_numpy(np.int64)
    c = h["c"].to_numpy(np.int64)
    tot = int((d + c).sum())
    removed_before = np.concatenate([[0], np.cumsum(d + c)[:-1]])
    n_at_risk = tot - removed_before
    factors = 1.0 - d / n_at_risk.astype(np.float64)
    s = np.cumprod(factors)
    ev = d > 0
    return pd.DataFrame({
        "t_days": h["t"].to_numpy(np.int64)[ev],
        "d": d[ev],
        "n_at_risk": n_at_risk[ev],
        "s": round_half_away(s[ev], 6),
    })


def ev_ols_multi(sf_dir: str):
    """Global multi-feature OLS — value ~ hour-of-day + iso-day-of-week
    — solved in CLOSED FORM from exact integer sufficient statistics:
    one map_batches pass emits int64 partial sums (n, Sx1, Sx2, Sy,
    Sx11, Sx12, Sx22, Sx1y, Sx2y, Syy with y = value*100 exact cents),
    Dataset.sum reduces them losslessly, and the driver solves the
    centered 2x2 normal equations by Cramer's rule. The oracle SQL
    evaluates THE SAME expressions in the same operation order on the
    same integers, so both engines produce bit-identical doubles —
    the one moment-reduce shape that stays a single streaming pass at
    10^12 rows (no shuffle at all)."""
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def moments(batch: pd.DataFrame) -> pd.DataFrame:
        x1 = batch["ts"].dt.hour.to_numpy(np.int64)
        x2 = (batch["ts"].dt.dayofweek.to_numpy(np.int64) + 1)  # isodow 1-7
        y = np.rint(batch["value"].to_numpy(np.float64) * 100.0).astype(np.int64)
        return pd.DataFrame({
            "n": [np.int64(len(batch))],
            "s1": [x1.sum()], "s2": [x2.sum()], "sy": [y.sum()],
            "s11": [(x1 * x1).sum()], "s12": [(x1 * x2).sum()],
            "s22": [(x2 * x2).sum()],
            "s1y": [(x1 * y).sum()], "s2y": [(x2 * y).sum()],
            "syy": [(y * y).sum()],
        })

    cols = ["n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y", "syy"]
    s = ds.map_batches(moments, batch_format="pandas", batch_size=None).sum(cols)
    n = float(s["sum(n)"])
    s1, s2, sy = float(s["sum(s1)"]), float(s["sum(s2)"]), float(s["sum(sy)"])
    s11, s12, s22 = float(s["sum(s11)"]), float(s["sum(s12)"]), float(s["sum(s22)"])
    s1y, s2y, syy = float(s["sum(s1y)"]), float(s["sum(s2y)"]), float(s["sum(syy)"])
    # centered moments — expression order mirrored EXACTLY in the oracle
    sxx1 = s11 - s1 * s1 / n
    sxx2 = s22 - s2 * s2 / n
    sx12 = s12 - s1 * s2 / n
    sx1y = s1y - s1 * sy / n
    sx2y = s2y - s2 * sy / n
    syyc = syy - sy * sy / n
    det = sxx1 * sxx2 - sx12 * sx12
    b1s = (sx1y * sxx2 - sx2y * sx12) / det
    b2s = (sx2y * sxx1 - sx1y * sx12) / det
    b0s = (sy - b1s * s1 - b2s * s2) / n
    r2 = (b1s * sx1y + b2s * sx2y) / syyc
    return pd.DataFrame({
        "n_events": np.array([n], np.int64),
        "b_hour": round_half_away(np.array([b1s / 100.0]), 6),
        "b_dow": round_half_away(np.array([b2s / 100.0]), 6),
        "intercept": round_half_away(np.array([b0s / 100.0]), 6),
        "r2": round_half_away(np.array([r2]), 9),
    })


def ev_ridge(sf_dir: str):
    """Global RIDGE regression (L2, lambda unpenalized intercept) —
    value ~ hour-of-day + iso-day-of-week — in closed form from the
    SAME exact integer sufficient statistics as :func:`ev_ols_multi`:
    the centered normal equations gain ``+lambda`` on the diagonal and
    solve by the mirrored 2x2 Cramer expressions. lambda is expressed
    per-row (``lambda = ridge_l2 * n``) so the fit converges to a
    stable population estimate instead of washing out as n grows.
    One streaming moment pass, no shuffle; oracle SQL evaluates the
    identical float expression chain on the same integers."""
    RIDGE_L2 = 0.5  # per-row penalty, in squared-regressor units

    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def moments(batch: pd.DataFrame) -> pd.DataFrame:
        x1 = batch["ts"].dt.hour.to_numpy(np.int64)
        x2 = (batch["ts"].dt.dayofweek.to_numpy(np.int64) + 1)
        y = np.rint(batch["value"].to_numpy(np.float64) * 100.0).astype(np.int64)
        return pd.DataFrame({
            "n": [np.int64(len(batch))],
            "s1": [x1.sum()], "s2": [x2.sum()], "sy": [y.sum()],
            "s11": [(x1 * x1).sum()], "s12": [(x1 * x2).sum()],
            "s22": [(x2 * x2).sum()],
            "s1y": [(x1 * y).sum()], "s2y": [(x2 * y).sum()],
        })

    cols = ["n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y"]
    s = ds.map_batches(moments, batch_format="pandas", batch_size=None).sum(cols)
    n = float(s["sum(n)"])
    s1, s2, sy = float(s["sum(s1)"]), float(s["sum(s2)"]), float(s["sum(sy)"])
    s11, s12, s22 = float(s["sum(s11)"]), float(s["sum(s12)"]), float(s["sum(s22)"])
    s1y, s2y = float(s["sum(s1y)"]), float(s["sum(s2y)"])
    lam = RIDGE_L2 * n
    a11 = s11 - s1 * s1 / n + lam
    a22 = s22 - s2 * s2 / n + lam
    a12 = s12 - s1 * s2 / n
    c1 = s1y - s1 * sy / n
    c2 = s2y - s2 * sy / n
    det = a11 * a22 - a12 * a12
    b1s = (c1 * a22 - c2 * a12) / det
    b2s = (c2 * a11 - c1 * a12) / det
    b0s = (sy - b1s * s1 - b2s * s2) / n
    return pd.DataFrame({
        "n_events": np.array([n], np.int64),
        "b_hour": round_half_away(np.array([b1s / 100.0]), 9),
        "b_dow": round_half_away(np.array([b2s / 100.0]), 9),
        "intercept": round_half_away(np.array([b0s / 100.0]), 9),
    })


def lineitem_weighted_median(sf_dir: str):
    """Exact WEIGHTED median (and p25/p75, lower/"disc" flavor) of
    l_extendedprice weighted by l_quantity, per return flag: the
    quantile q is the smallest price whose running weight reaches
    q * total — the inventory-weighted price distribution a pricing
    audit wants, which plain medians misstate when quantities skew.

    Scale shape: per-batch (flag, cents, weight) int64 partials
    collapse each block to its distinct prices, then ONE 3-group flag
    exchange feeds the per-flag sorted cumulative-weight sweep (the
    sweep tolerates duplicate cents rows, so no distinct-key groupby
    is needed — prices are near-unique and a (flag, cents) aggregate
    would sort ~|rows| keys for no collapse). All weight math is
    exact int64, so thresholds compare integers (2*cw >= tw etc.)
    with no float ambiguity — the oracle runs the identical
    comparisons."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_extendedprice", "l_quantity"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(
            batch["l_extendedprice"].to_numpy(np.float64) * 100.0
        ).astype(np.int64)
        qty = np.rint(batch["l_quantity"].to_numpy(np.float64)).astype(np.int64)
        g = pd.DataFrame({
            "flag": batch["l_returnflag"].to_numpy(), "cents": cents, "w": qty
        })
        return g.groupby(["flag", "cents"], as_index=False)["w"].sum()

    # ONE 3-group flag exchange of per-block partials; no distinct-key
    # groupby (prices are near-unique, so a (flag, cents) aggregate
    # would sort ~|rows| keys for no collapse). The per-flag sweep
    # tolerates duplicate cents rows: the cumulative crossing lands on
    # the same price value whichever duplicate it hits first.
    agg = ds.map_batches(partial, batch_format="pandas", batch_size=None)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("cents")
        cw = df["w"].to_numpy(np.int64).cumsum()
        tw = int(cw[-1])
        cents = df["cents"].to_numpy(np.int64)

        def pick(num: int, den: int) -> float:
            # smallest cents with den*cw >= num*tw  (exact ints)
            return float(cents[np.searchsorted(den * cw, num * tw)]) / 100.0

        return pd.DataFrame({
            "flag": [df["flag"].iloc[0]],
            "total_qty": np.array([tw], np.int64),
            "wp25": [pick(1, 4)],
            "wmedian": [pick(1, 2)],
            "wp75": [pick(3, 4)],
        })

    out = agg.groupby("flag").map_groups(finish, batch_format="pandas")
    return out.to_pandas().sort_values("flag").reset_index(drop=True)


def ev_welch_ttest(sf_dir: str):
    """Welch's unequal-variance t-test of mean event value, 'click' vs
    'purchase'. Distributed via exact int64 cent moments: per-block
    partials of (n, sum cents, sum cents^2) per group reduce through a
    tiny 2-row merge; means/variances/t finish at the driver with the
    float chain written term-for-term like the oracle SQL (DuckDB sums
    widen to hugeint, so the engine widens to Python int before the
    float conversion at the same expression points)."""
    ds = _read(
        sf_dir, "events", columns=["event_type", "value"],
        filter=pc.field("event_type").isin(["click", "purchase"]),
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(batch["value"].to_numpy(np.float64) * 100).astype(np.int64)
        g = pd.DataFrame({
            "grp": batch["event_type"].to_numpy(),
            "n": np.int64(1), "s": cents, "sq": cents * cents,
        })
        return g.groupby("grp", as_index=False).sum()

    t = (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .to_pandas()  # <= 2 rows per block
        .groupby("grp", as_index=False)[["n", "s", "sq"]].sum()
        .sort_values("grp")
    )

    def stats(row):
        n, s, sq = int(row["n"]), int(row["s"]), int(row["sq"])
        mean = s / n / 100.0
        # sample variance of cents, ddof=1, mirrored: (sq - s*s/n)/(n-1)
        var_c = (float(sq) - float(s * s) / float(n)) / (n - 1.0)
        return n, mean, var_c / 10000.0

    n1, m1, v1 = stats(t.iloc[0])  # click
    n2, m2, v2 = stats(t.iloc[1])  # purchase
    se2 = v1 / n1 + v2 / n2
    tstat = (m1 - m2) / np.sqrt(se2)
    dof = se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1.0)
                       + (v2 / n2) * (v2 / n2) / (n2 - 1.0))
    return pd.DataFrame({
        "n_click": np.array([n1], np.int64),
        "n_purchase": np.array([n2], np.int64),
        "mean_click": round_half_away(np.array([m1]), 9),
        "mean_purchase": round_half_away(np.array([m2]), 9),
        "t_stat": round_half_away(np.array([tstat]), 9),
        "welch_dof": round_half_away(np.array([dof]), 6),
    })


def ev_anova(sf_dir: str):
    """One-way ANOVA of event value across ALL event types. Per-group
    exact int64 cent moments (n, s, sq) reduce through one bounded
    |types|-row merge; the F statistic finishes at the driver from the
    textbook decomposition SSB = sum s_g^2/n_g - S^2/N,
    SSW = sum sq_g - sum s_g^2/n_g, every term mirrored in the oracle
    SQL at the same float-conversion points."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(batch["value"].to_numpy(np.float64) * 100).astype(np.int64)
        g = pd.DataFrame({
            "grp": batch["event_type"].to_numpy(),
            "n": np.int64(1), "s": cents, "sq": cents * cents,
        })
        return g.groupby("grp", as_index=False).sum()

    t = (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .to_pandas()  # <= |types| rows per block
        .groupby("grp", as_index=False)[["n", "s", "sq"]].sum()
    )
    k = len(t)
    nn = int(t["n"].sum())
    ss = int(t["s"].sum())
    # sum over groups of s_g^2 / n_g, each term converted like SQL's
    # (cast(s as double) * s / n)
    sb = float(sum(float(int(s)) * int(s) / int(n)
                   for s, n in zip(t["s"], t["n"])))
    sq_tot = int(t["sq"].sum())
    ssb = sb - float(ss) * ss / nn
    ssw = float(sq_tot) - sb
    f = (ssb / (k - 1.0)) / (ssw / (nn - k))
    eta2 = ssb / (ssb + ssw)
    return pd.DataFrame({
        "f_stat": round_half_away(np.array([f]), 9),
        "dof_between": np.array([k - 1], np.int64),
        "dof_within": np.array([nn - k], np.int64),
        "eta_sq": round_half_away(np.array([eta2]), 9),
        "n": np.array([nn], np.int64),
    })


def ev_spearman_user(sf_dir: str):
    """Per-user Spearman rank correlation between event value and
    hour-of-day. Tie-averaged ranks (minrank + (t-1)/2, the ANSI
    ``rank() + (count(*) over tie)/2`` identity) are half-integers, so
    every per-user moment (sx, sxx, sxy, ...) is an exact dyadic
    rational far below 2^53 — both engines sum them exactly in any
    order, and rho's closed form divides to the identical double. One
    user-hash exchange; ranks + moments are segmented pandas/numpy
    inside each partition; output stays a per-user Dataset (never
    collected on the driver)."""
    from ..stages.rollup import partitions_for_input

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    P = partitions_for_input(None)

    def part_key(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(np.int64),
            "cents": np.round(batch["value"].to_numpy(np.float64) * 100).astype(np.int64),
            "hod": pd.DatetimeIndex(batch["ts"]).hour.to_numpy().astype(np.int64),
        })
        out["_part"] = (out["user_id"].to_numpy(np.int64) % P).astype(np.int32)
        return out

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id")
        rx = g["cents"].rank(method="average").to_numpy(np.float64)
        ry = g["hod"].rank(method="average").to_numpy(np.float64)
        m = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "n": np.int64(1),
            "sx": rx, "sy": ry,
            "sxx": rx * rx, "syy": ry * ry, "sxy": rx * ry,
        }).groupby("user_id", as_index=False).sum()
        n = m["n"].to_numpy(np.float64)
        vx = n * m["sxx"].to_numpy() - m["sx"].to_numpy() * m["sx"].to_numpy()
        vy = n * m["syy"].to_numpy() - m["sy"].to_numpy() * m["sy"].to_numpy()
        keep = (vx > 0) & (vy > 0)
        m = m[keep]
        rho = ((n[keep] * m["sxy"].to_numpy() - m["sx"].to_numpy() * m["sy"].to_numpy())
               / (np.sqrt(vx[keep]) * np.sqrt(vy[keep])))
        return pd.DataFrame({
            "user_id": m["user_id"].to_numpy(np.int64),
            "n": m["n"].to_numpy(np.int64),
            "rho": round_half_away(rho, 9),
        })

    return (
        ds.map_batches(part_key, batch_format="pandas", batch_size=None)
        .groupby("_part")
        .map_groups(lambda df: per_user(df.drop(columns=["_part"])),
                    batch_format="pandas")
    )


def ev_trimmed_mean(sf_dir: str):
    """5% two-sided trimmed mean of event value per event type under
    the exact ``row_number`` convention (drop the k = n//20 smallest
    and largest ROWS, ties resolved by value order). Distributed via
    the bounded cent-DOMAIN histogram (the ev_mannwhitney pattern):
    per-block (type, cents) count partials merge through a cents-hash
    exchange, only the domain-sized histogram reaches the driver, and
    the per-type cumulative sweep retains clip(min(cum, n-k) -
    max(cum_prev, k), 0, t) rows per distinct value — all int64, so
    the retained sum is exact and the final division mirrors the
    oracle SQL."""
    from ..stages.rollup import partitions_for_input

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    P = partitions_for_input(None)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(),
            "cents": np.round(batch["value"].to_numpy(np.float64) * 100).astype(np.int64),
            "t": np.int64(1),
        })
        g = g.groupby(["event_type", "cents"], as_index=False).sum()
        g["_part"] = (g["cents"].to_numpy(np.int64) % P).astype(np.int32)
        return g

    def merge_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["event_type", "cents"], as_index=False)[["t"]].sum()

    h = (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby("_part")
        .map_groups(lambda df: merge_part(df.drop(columns=["_part"])),
                    batch_format="pandas")
        .to_pandas()  # bounded by |types| x value DOMAIN, not the corpus
    )

    rows = []
    for et, df in h.groupby("event_type"):
        df = df.sort_values("cents")
        t = df["t"].to_numpy(np.int64)
        cum = np.cumsum(t)
        n = int(cum[-1])
        k = n // 20
        lo = np.maximum(cum - t, k)          # cum_prev clipped at k
        hi = np.minimum(cum, n - k)
        inc = np.maximum(hi - lo, 0)
        s = int((df["cents"].to_numpy(np.int64) * inc).sum())
        rows.append((et, n, n - 2 * k, float(s) / ((n - 2 * k) * 100.0)))
    out = pd.DataFrame(rows, columns=["event_type", "n", "n_trimmed", "trimmed_mean"])
    out["n"] = out["n"].astype(np.int64)
    out["n_trimmed"] = out["n_trimmed"].astype(np.int64)
    out["trimmed_mean"] = round_half_away(out["trimmed_mean"].to_numpy(), 9)
    return out.sort_values("event_type").reset_index(drop=True)


def ev_kendall_tau(sf_dir: str):
    """Kendall tau-b association between hour-of-day and the $10 value
    bucket of each event, computed EXACTLY from the bounded 24x~50
    joint histogram: concordant/discordant pair counts are 2-D suffix
    sums of cell-count products (pure int64), tie terms come from the
    marginals, and tau-b's denominator converts to double at the same
    expression points as the oracle SQL (whose pair sums are the
    equivalent strict-order self-join over the tiny histogram)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "x": pd.DatetimeIndex(batch["ts"]).hour.to_numpy().astype(np.int64),
            "y": (np.round(batch["value"].to_numpy(np.float64) * 100).astype(np.int64)
                  // 1000),
            "c": np.int64(1),
        })
        return g.groupby(["x", "y"], as_index=False).sum()

    h = (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby(["x", "y"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # bounded by the 24 x value-bucket DOMAIN
    )
    from ..functions.assoc import kendall_from_joint, tau_b

    xs = np.sort(h["x"].unique())
    ys = np.sort(h["y"].unique())
    H = np.zeros((len(xs), len(ys)), np.int64)
    H[np.searchsorted(xs, h["x"].to_numpy(np.int64)),
      np.searchsorted(ys, h["y"].to_numpy(np.int64))] = h["c"].to_numpy(np.int64)
    conc, disc, n, n1, n2 = kendall_from_joint(H)
    tau = tau_b(conc, disc, n, n1, n2)
    return pd.DataFrame({
        "tau_b": round_half_away(np.array([tau]), 9),
        "concordant": np.array([conc], np.int64),
        "discordant": np.array([disc], np.int64),
        "n": np.array([n], np.int64),
    })


def ev_backtest_expanding(sf_dir: str):
    """Rolling-origin forecast backtest (the standard time-series
    cross-validation harness, Hyndman & Athanasopoulos §5.10): for
    each user's last 3 OBSERVED hourly counts, forecast with the
    expanding mean of all strictly-prior observed hours and emit the
    per-fold prediction and absolute error. Every prediction is one
    exact-int division (prefix sum / prefix count), so engine and SQL
    agree bit-for-bit; no cross-row float summation exists to reorder.
    One user-hash exchange, segmented prefix sums, Dataset output."""
    from ..stages.rollup import partitions_for_input

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    P = partitions_for_input(None)

    def hour_counts(batch: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(np.int64),
            "hr": batch["ts"].to_numpy().astype("datetime64[h]").astype(np.int64),
            "y": np.int64(1),
        }).groupby(["user_id", "hr"], as_index=False).sum()
        g["_part"] = (g["user_id"].to_numpy(np.int64) % P).astype(np.int32)
        return g

    def folds(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.groupby(["user_id", "hr"], as_index=False)["y"].sum()
                .sort_values(["user_id", "hr"], kind="mergesort"))
        u = df["user_id"].to_numpy(np.int64)
        y = df["y"].to_numpy(np.int64)
        starts = np.concatenate([[0], np.flatnonzero(u[1:] != u[:-1]) + 1,
                                 [len(u)]])
        seg_id = np.repeat(np.arange(len(starts) - 1), np.diff(starts))
        seg_start = starts[seg_id]
        idx = np.arange(len(u))
        pos = idx - seg_start                      # 0-based within user
        seg_len = np.diff(starts)[seg_id]
        cs = np.cumsum(y)
        base = np.where(seg_start > 0, cs[seg_start - 1], 0)
        sp = cs - base - y                          # strictly-prior sum
        npr = pos                                   # strictly-prior count
        rdesc = seg_len - pos                       # 1 == last hour
        keep = (rdesc <= 3) & (npr > 0)
        pred = sp[keep].astype(np.float64) / npr[keep]
        hrs = df["hr"].to_numpy(np.int64)[keep]
        return pd.DataFrame({
            "user_id": u[keep],
            "hour_ts": hrs.astype("datetime64[h]").astype("datetime64[us]"),
            "fold": rdesc[keep].astype(np.int64),
            "y": y[keep],
            "pred": round_half_away(pred, 9),
            "abs_err": round_half_away(
                np.abs(y[keep].astype(np.float64) - pred), 9),
        })

    return (
        ds.map_batches(hour_counts, batch_format="pandas", batch_size=None)
        .groupby("_part")
        .map_groups(lambda df: folds(df.drop(columns=["_part"])),
                    batch_format="pandas")
    )


def ev_wilcoxon_signed(sf_dir: str):
    """Wilcoxon signed-rank test of per-user activity shift between
    the first and second half of the observation window (paired by
    user; d = second-half minus first-half event count, zero
    differences dropped per the standard convention). Distributed via
    the bounded |d|-DOMAIN histogram exactly like ev_mannwhitney:
    tie-averaged ranks collapse to 2*W+ = sum npos*(2*cprev + t + 1)
    in exact int64, and the tie-corrected normal z mirrors the oracle
    SQL term-for-term. Two streaming passes (global min/max ts, then
    per-user signed counts through one int-keyed reduce)."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    # ts range from parquet footer statistics (driver metadata read,
    # no full-scan Min/Max execution); scan fallback if stats missing
    meta = _ts_minmax_meta(sf_dir, "events")
    if meta is not None:
        lo_ts, hi_ts = meta
    else:
        mm = ds.aggregate(Min("ts"), Max("ts"))
        lo_ts, hi_ts = pd.Timestamp(mm["min(ts)"]), pd.Timestamp(mm["max(ts)"])
    lo = lo_ts.value // 1000   # ns -> us
    hi = hi_ts.value // 1000
    mid = (lo + hi) // 2

    def signed(batch: pd.DataFrame) -> pd.DataFrame:
        tus = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        g = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(np.int64),
            "d": np.where(tus >= mid, np.int64(1), np.int64(-1)),
        })
        return g.groupby("user_id", as_index=False).sum()

    per_user = (
        ds.map_batches(signed, batch_format="pandas", batch_size=None)
        .groupby("user_id")
        .aggregate(Sum("d", alias_name="d"))
    )

    def hist(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["d"].to_numpy(np.int64)
        d = d[d != 0]
        g = pd.DataFrame({"ad": np.abs(d), "t": np.int64(1),
                          "npos": (d > 0).astype(np.int64)})
        return g.groupby("ad", as_index=False).sum()

    h = (
        per_user.map_batches(hist, batch_format="pandas", batch_size=None)
        .to_pandas()  # bounded by the |d| DOMAIN
        .groupby("ad", as_index=False)[["t", "npos"]].sum()
        .sort_values("ad")
    )
    t = h["t"].to_numpy(np.int64)
    npos = h["npos"].to_numpy(np.int64)
    cprev = np.concatenate([[0], np.cumsum(t)[:-1]]).astype(np.int64)
    w2 = int((npos * (2 * cprev + t + 1)).sum())
    n = int(t.sum())
    tie = int((t**3 - t).sum())
    z = ((w2 / 2.0 - n * (n + 1) / 4.0)
         / np.sqrt(n * (n + 1.0) * (2 * n + 1) / 24.0 - tie / 48.0))
    return pd.DataFrame({
        "z": round_half_away(np.array([z]), 9),
        "w_plus_x2": np.array([w2], np.int64),
        "n_nonzero": np.array([n], np.int64),
    })


def doc_collocations(sf_dir: str, min_count: int = 25):
    """PMI collocation mining (Church & Hanks 1990): every adjacent
    word bigram with corpus count >= ``min_count``, scored
    pmi = ln((n_ab/N_bi) / ((n_a/N_uni) * (n_b/N_uni))). One pass
    emits per-block pre-counted (kind, gram, n) partials for unigrams
    and bigrams together; one gram-hash exchange merges them; only the
    VOCABULARY-bounded count table reaches the driver (never token
    volume), where the PMI float chain mirrors the oracle SQL. A
    support threshold instead of top-k means no float-ordered
    selection boundary exists for an ulp to flip."""
    from ..stages.rollup import partitions_for_input

    ds = _read(sf_dir, "documents", columns=["text"])
    P = partitions_for_input(None)

    def partial(batch: pa.Table) -> pd.DataFrame:
        # fully vectorized in Arrow: split -> flattened token array;
        # adjacent-pair mask from the list offsets (a pair is valid
        # unless position i+1 starts a new document)
        toks = pc.split_pattern(batch["text"], " ").combine_chunks()
        flat = toks.flatten()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        n = len(flat)
        starts = np.zeros(n + 1, bool)
        starts[offs] = True
        valid = ~starts[1:n] if n else np.zeros(0, bool)
        us = pd.Series(flat.to_pandas())
        uni = us.groupby(us, sort=False).size()
        if n > 1:
            pairs = pc.binary_join_element_wise(
                flat.slice(0, n - 1), flat.slice(1), " ")
            bs = pd.Series(pairs.to_pandas())[valid]
            bi = bs.groupby(bs, sort=False).size()
        else:
            bi = pd.Series([], dtype=np.int64)
        out = pd.DataFrame({
            "kind": np.concatenate([np.zeros(len(uni), np.int8),
                                    np.ones(len(bi), np.int8)]),
            "g": np.concatenate([uni.index.to_numpy(),
                                 bi.index.to_numpy()]),
            "n": np.concatenate([uni.to_numpy(np.int64),
                                 bi.to_numpy(np.int64)]),
        })
        out["_part"] = (
            pd.util.hash_pandas_object(out["g"], index=False).to_numpy() % P
        ).astype(np.int32)
        return out

    def merge_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["kind", "g"], as_index=False)["n"].sum()

    h = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(lambda df: merge_part(df.drop(columns=["_part"])),
                    batch_format="pandas")
        .to_pandas()  # bounded by |vocab| + |vocab|^2, never token volume
    )
    uni = h[h["kind"] == 0].set_index("g")["n"]
    bi = h[h["kind"] == 1]
    nu = int(uni.sum())
    nb = int(bi["n"].sum())
    bi = bi[bi["n"] >= min_count]
    parts = bi["g"].str.split(" ", n=1, expand=True)
    na = uni.reindex(parts[0]).to_numpy(np.int64)
    nbv = uni.reindex(parts[1]).to_numpy(np.int64)
    nab = bi["n"].to_numpy(np.int64)
    pmi = np.log((nab * 1.0 / nb) / ((na * 1.0 / nu) * (nbv * 1.0 / nu)))
    out = pd.DataFrame({
        "gram": bi["g"].to_numpy(),
        "n_ab": nab,
        "n_a": na,
        "n_b": nbv,
        "pmi": round_half_away(pmi, 9),
    })
    return out.sort_values("gram").reset_index(drop=True)



def ev_epoch_shuffle(sf_dir: str, epochs: int = 2):
    """Deterministic RESUMABLE epoch shuffle — the training-data
    ordering primitive: every row's position in epoch e is a pure
    function of (seed constants, e, event_id), so a restarted job
    recomputes the identical order from any step with no stored
    state, and every epoch is a fresh permutation. The shuffle key is
    two affine rounds modulo the Mersenne prime 2^31-1 (MINSTD-style
    multipliers, Park & Miller CACM'88; all int64 products < 2^63, so
    engine and SQL compute bit-equal keys); global positions come
    from the exact range exchange of `features.global_row_number`
    (sample-balanced partitions, exact per-partition counts, no
    driver sort). The ~1e2 birthday collisions per 1e6 rows in the
    31-bit keyspace are broken deterministically by event_id in the
    SAME total order on both sides."""
    from ..stages.features import global_row_number

    M = 2147483647              # 2^31 - 1
    A1, C1 = 48271, 1013904223  # round 1 (MINSTD multiplier)
    A2, C2 = 69621, 1664525     # round 2

    outs = []
    for e in range(epochs):
        ds = _read(sf_dir, "events", columns=["event_id"])

        def key(batch: pd.DataFrame, _e=e) -> pd.DataFrame:
            x = (batch["event_id"].to_numpy(np.int64)
                 + np.int64(_e) * np.int64(1_000_000_007)) % M
            k1 = (A1 * x + C1) % M
            k2 = (A2 * k1 + C2) % M
            return pd.DataFrame({
                "event_id": batch["event_id"].to_numpy(np.int64),
                "epoch": np.int64(_e),
                "k": k2,
            })

        keyed = ds.map_batches(key, batch_format="pandas", batch_size=None)
        ranked, _total = global_row_number(
            keyed, primary="k", tiebreak="event_id", out_col="pos")
        outs.append(ranked.select_columns(["event_id", "epoch", "pos"]))
    res = outs[0]
    for o in outs[1:]:
        res = res.union(o)
    return res


def ev_granger(sf_dir: str):
    """Granger-causality test (Granger 1969): do lagged CLICK counts
    improve the one-step prediction of PURCHASE counts beyond
    purchases' own lag? Both hourly series live on the DENSE calendar
    grid between the first and last click/purchase hour (missing
    hours are exact zeros); the unrestricted AR-X model
    p_t ~ p_{t-1} + c_{t-1} solves by the same centered-Cramer closed
    form as ev_ols_multi, the restricted model drops c_{t-1}, and
    F = (RSS_r - RSS_u) / (RSS_u / (n - 3)). Distributed shape: one
    bounded (hour, type) count exchange; only the CALENDAR-sized grid
    reaches the driver, where every sufficient statistic is an exact
    int64 sum — the float chain mirrors the oracle SQL operation for
    operation."""
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir, "events", columns=["event_type", "ts"],
        filter=pc.field("event_type").isin(["click", "purchase"]),
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        hr = batch["ts"].to_numpy().astype("datetime64[h]").astype(np.int64)
        is_c = (batch["event_type"] == "click").to_numpy()
        g = pd.DataFrame({
            "hr": hr,
            "c": is_c.astype(np.int64),
            "p": (~is_c).astype(np.int64),
        })
        return g.groupby("hr", as_index=False).sum()

    h = (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby("hr")
        .aggregate(Sum("c", alias_name="c"), Sum("p", alias_name="p"))
        .to_pandas()  # bounded by the CALENDAR hour grid
        .sort_values("hr")
    )
    h0, h1 = int(h["hr"].iloc[0]), int(h["hr"].iloc[-1])
    grid = np.arange(h0, h1 + 1)
    c = np.zeros(len(grid), np.int64)
    p = np.zeros(len(grid), np.int64)
    pos = h["hr"].to_numpy(np.int64) - h0
    c[pos] = h["c"].to_numpy(np.int64)
    p[pos] = h["p"].to_numpy(np.int64)

    y, x1, x2 = p[1:], p[:-1], c[:-1]
    n = float(len(y))
    s1, s2, sy = float(x1.sum()), float(x2.sum()), float(y.sum())
    s11, s12, s22 = float((x1 * x1).sum()), float((x1 * x2).sum()), float((x2 * x2).sum())
    s1y, s2y, syy = float((x1 * y).sum()), float((x2 * y).sum()), float((y * y).sum())
    sxx1 = s11 - s1 * s1 / n
    sxx2 = s22 - s2 * s2 / n
    sx12 = s12 - s1 * s2 / n
    sx1y = s1y - s1 * sy / n
    sx2y = s2y - s2 * sy / n
    syyc = syy - sy * sy / n
    det = sxx1 * sxx2 - sx12 * sx12
    b1 = (sx1y * sxx2 - sx2y * sx12) / det
    b2 = (sx2y * sxx1 - sx1y * sx12) / det
    rss_u = syyc - b1 * sx1y - b2 * sx2y
    rss_r = syyc - sx1y * sx1y / sxx1
    f = (rss_r - rss_u) / (rss_u / (n - 3.0))
    return pd.DataFrame({
        "n_hours": np.array([int(n)], np.int64),
        "b_self_lag": round_half_away(np.array([b1]), 9),
        "b_click_lag": round_half_away(np.array([b2]), 9),
        "f_stat": round_half_away(np.array([f]), 9),
        "rss_ratio": round_half_away(np.array([rss_u / rss_r]), 9),
    })


def ev_hill_tail(sf_dir: str, k: int = 500):
    """Hill tail-index estimator (Hill 1975) per event type: over the
    k=500 largest values, alpha_hat = k / sum(ln(x_i / x_(k))) — the
    standard heavy-tail audit for deciding whether a metric has finite
    variance. Distributed via the bounded cent-DOMAIN histogram: the
    k-th order statistic falls out of the cumulative counts, and the
    log-sum collapses to sum over distinct values above it of
    t_v * ln(v / x_k) (boundary rows contribute exactly zero). Only
    the domain histogram reaches the driver; the oracle SQL evaluates
    the same term set (float addition order may differ by an ulp —
    absorbed by round-9 like the chi-square/entropy entries)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(),
            "cents": np.round(batch["value"].to_numpy(np.float64) * 100).astype(np.int64),
            "t": np.int64(1),
        })
        return g.groupby(["event_type", "cents"], as_index=False).sum()

    from ..stages.rollup import partitions_for_input

    P = partitions_for_input(None)

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch["_part"] = (batch["cents"].to_numpy(np.int64) % P).astype(np.int32)
        return batch

    h = (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .map_batches(add_part, batch_format="pandas", batch_size=None)
        .groupby("_part")
        .map_groups(lambda df: df.drop(columns=["_part"])
                    .groupby(["event_type", "cents"], as_index=False).sum(),
                    batch_format="pandas")
        .to_pandas()  # bounded by |types| x value DOMAIN
    )
    rows = []
    for et, df in h.groupby("event_type"):
        df = df.sort_values("cents", ascending=False)
        v = df["cents"].to_numpy(np.int64)
        t = df["t"].to_numpy(np.int64)
        cum = np.cumsum(t)
        n = int(cum[-1])
        kk = min(k, n)
        j = int(np.searchsorted(cum, kk))      # first idx with cum >= kk
        xk = float(v[j])
        above = slice(0, j)                     # strictly larger values
        # count of terms above xk; boundary rows contribute ln(1)=0
        n_above = int(cum[j - 1]) if j > 0 else 0
        ls = float((t[above] * np.log(v[above] / xk)).sum())
        alpha = kk / ls if ls > 0 else np.nan
        rows.append((et, n, kk, xk / 100.0, alpha, n_above))
    out = pd.DataFrame(rows, columns=["event_type", "n", "k", "x_k",
                                      "alpha", "n_above"])
    out["n"] = out["n"].astype(np.int64)
    out["k"] = out["k"].astype(np.int64)
    out["n_above"] = out["n_above"].astype(np.int64)
    out["alpha"] = round_half_away(out["alpha"].to_numpy(np.float64), 9)
    return out.sort_values("event_type").reset_index(drop=True)


def ev_fdr_bh(sf_dir: str, q: float = 0.1):
    """Benjamini-Hochberg FDR control (JRSS-B 1995) over per-user
    activity-shift tests: d_u = second-half minus first-half event
    count, conservative Hoeffding p-value p_u = min(1,
    2 exp(-d^2/(2n))). DESIGN NOTE on exactness: numpy and DuckDB
    transcendentals differ in the last ulp (~25% of values measured),
    so every ORDERING/DECISION uses the exact monotone surrogate
    d^2/n — a single IEEE division of exact int64s, bit-identical in
    both engines; p itself is display-only (round 6) and the BH
    threshold comparison d^2/n >= -2 ln(r q / (2 m)) touches ln only
    on the threshold side, where a flip needs d^2/n within one ulp of
    it. Distributed shape: one user-keyed count exchange, ranks from
    `features.global_row_number`'s range exchange, r* via one tiny
    max aggregate broadcast back."""
    from ray.data.aggregate import Max, Min

    from ..stages.features import global_row_number

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    # exact global ts range from parquet footer statistics — a driver
    # metadata read replacing a full-scan Min/Max execution (one fewer
    # serial executor spin-up, the round-3 scaling bottleneck)
    meta = _ts_minmax_meta(sf_dir, "events")
    if meta is not None:
        lo_ts, hi_ts = meta
    else:
        mm = ds.aggregate(Min("ts"), Max("ts"))
        lo_ts, hi_ts = pd.Timestamp(mm["min(ts)"]), pd.Timestamp(mm["max(ts)"])
    lo = lo_ts.value // 1000
    hi = hi_ts.value // 1000
    mid = (lo + hi) // 2

    def signed(batch: pd.DataFrame) -> pd.DataFrame:
        tus = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        g = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(np.int64),
            "d": np.where(tus >= mid, np.int64(1), np.int64(-1)),
            "n": np.int64(1),
        })
        return g.groupby("user_id", as_index=False).sum()

    # bounded-partition int-keyed exchange (see hash_groupby_sum docs)
    # instead of Ray's sort-based aggregate at #users cardinality
    from ..stages.join import hash_groupby_sum

    per_user = hash_groupby_sum(
        ds.map_batches(signed, batch_format="pandas", batch_size=None),
        "user_id", ("d", "n"),
    ).materialize()
    m = int(per_user.count())

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["d"].to_numpy(np.int64)
        n = batch["n"].to_numpy(np.int64)
        return pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(np.int64),
            "d": d, "n": n,
            "ddn": (d * d) / n,     # exact IEEE division of exact ints
        })

    scored = per_user.map_batches(score, batch_format="pandas", batch_size=None)
    ranked, _ = global_row_number(scored, primary="ddn", tiebreak="user_id",
                                  descending=True, out_col="rnk")

    def bh_test(batch: pd.DataFrame) -> pd.DataFrame:
        r = batch["rnk"].to_numpy(np.int64)
        rhs = -2.0 * np.log(r * q / (2.0 * m))
        batch["hit"] = np.where(batch["ddn"].to_numpy(np.float64) >= rhs,
                                r, np.int64(0))
        return batch

    tested = ranked.map_batches(bh_test, batch_format="pandas",
                                batch_size=None).materialize()
    r_star = int(tested.max("hit") or 0)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["d"].to_numpy(np.int64)
        n = batch["n"].to_numpy(np.int64)
        p = np.minimum(1.0, 2.0 * np.exp(-(d * d) / (2.0 * n)))
        return pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(np.int64),
            "d": d, "n": n,
            "rnk": batch["rnk"].to_numpy(np.int64),
            "p_hoeffding": round_half_away(p, 6),
            "rejected": batch["rnk"].to_numpy(np.int64) <= r_star,
        })

    return tested.map_batches(finish, batch_format="pandas", batch_size=None)
