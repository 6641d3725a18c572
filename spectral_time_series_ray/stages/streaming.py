"""Incremental (streaming-shaped) aggregation with persistent keyed
state.

Ray Data is a batch engine with no event-time watermarks
(ray_guide.md "Streaming-shaped workloads"); for stream-shaped
semantics this stage treats the input as an ordered, partitioned log:
``@ray.remote`` bucket actors (one per key-hash bucket) receive
micro-batches in event-time order and fold them into persistent
per-key running aggregates — the reference's incremental-evaluator
``update()/get()`` lifecycle (`uni2ts/src/uni2ts/eval_util/
evaluation.py:131-173`) and its BatchedSampleQueue carry-over state
(`loader.py:241-313`).

Invariant (tested): after draining the log, ``get()`` equals the batch
rollup of the same data — incremental == batch.

This is the §2.9 raw-actor escape hatch (SURVEY.md §2/§7: raw Ray
actors only where the Dataset API can't express the semantics — here,
mutable cross-micro-batch state).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray


@ray.remote
class BucketAggregator:
    """Running count/sum/min/max per key for one hash bucket."""

    def __init__(self):
        self.state: dict = {}

    def update(self, keys: np.ndarray, values: np.ndarray) -> int:
        df = pd.DataFrame({"k": keys, "v": values})
        g = df.groupby("k")["v"]
        for k, (cnt, s, mn, mx) in zip(
            g.count().index, zip(g.count(), g.sum(), g.min(), g.max())
        ):
            st = self.state.get(k)
            if st is None:
                self.state[k] = [int(cnt), float(s), float(mn), float(mx)]
            else:
                st[0] += int(cnt)
                st[1] += float(s)
                st[2] = min(st[2], float(mn))
                st[3] = max(st[3], float(mx))
        return len(self.state)

    def get(self) -> pd.DataFrame:
        rows = [
            {"key": k, "count": st[0], "sum": st[1], "min": st[2], "max": st[3]}
            for k, st in self.state.items()
        ]
        return pd.DataFrame(rows)


class StreamingAggregator:
    """Drive N bucket actors from an event-time-ordered micro-batch
    stream (``ds.sort(ts).iter_batches``).

    SCALE NOTE: ``consume()`` (global event-time sort + driver-side
    micro-batch fan-out) models the reference's single-process
    incremental evaluator lifecycle — the driver NIC is its ceiling.
    ``consume_distributed()`` is the SCALE path: worker-side dispatch
    through one bucket-hash exchange, zero rows through the driver,
    identical final state (per-KEY fold order is the semantic
    requirement and a key's whole log folds in event-time order inside
    one bucket task).  For unordered aggregation with no persistent
    state, ``rollup_mergeable`` remains the cheapest shape."""

    def __init__(self, n_buckets: int = 4):
        self.actors = [BucketAggregator.remote() for _ in range(n_buckets)]
        self.n = n_buckets

    def consume(self, ds, key_col: str, value_col: str, ts_col: str = "ts", batch_size: int = 8192):
        pending = []
        for batch in ds.sort(ts_col).iter_batches(batch_size=batch_size, batch_format="pandas"):
            keys = batch[key_col].to_numpy()
            vals = batch[value_col].to_numpy(dtype=np.float64)
            b = pd.util.hash_pandas_object(pd.Series(keys), index=False).to_numpy() % self.n
            for i in range(self.n):
                m = b == i
                if m.any():
                    pending.append(self.actors[i].update.remote(keys[m], vals[m]))
            # backpressure: don't let unacked updates grow without bound.
            # ray.wait returns WHICH refs completed — keep the not-ready
            # ones (a positional truncation would drop refs that the
            # final ray.get then never awaits)
            if len(pending) > 4 * self.n:
                _, pending = ray.wait(
                    pending, num_returns=len(pending) - 2 * self.n
                )
        ray.get(pending)
        return self

    def consume_distributed(self, ds, key_col: str, value_col: str, ts_col: str = "ts"):
        """Worker-side dispatch — the SCALE path: the driver moves ZERO
        rows.  One bucket-hash exchange routes each key's whole log to
        one group task; the task sorts ITS bucket by event time and
        folds it into the bucket actor in order.  The semantic
        requirement of a keyed state machine is per-KEY fold order —
        a key maps to exactly one bucket and that bucket's log is
        folded by one task in event-time order, so the requirement
        holds without any global sort or driver hop.  Equals
        ``consume()`` exactly (incremental == batch invariant, tested)
        because the per-key running aggregates are order-insensitive
        folds of ordered per-bucket logs either way.

        Size ``n_buckets`` so one bucket's log fits a worker's heap
        (buckets are the unit of parallelism AND of memory here); for
        continuous ingestion call this once per arriving log segment —
        actor state persists across calls."""
        import pyarrow as pa

        actors, n = self.actors, self.n

        def add_bucket(batch: pa.Table) -> pa.Table:
            b = (
                pd.util.hash_pandas_object(
                    batch[key_col].to_pandas(), index=False
                ).to_numpy()
                % n
            ).astype(np.int64)
            return batch.select([key_col, value_col, ts_col]).append_column(
                "_bucket", pa.array(b)
            )

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame({"bucket": pd.Series([], dtype=np.int64),
                                     "rows": pd.Series([], dtype=np.int64)})
            df = df.sort_values(ts_col, kind="mergesort")
            i = int(df["_bucket"].iloc[0])
            ray.get(
                actors[i].update.remote(
                    df[key_col].to_numpy(),
                    df[value_col].to_numpy(dtype=np.float64),
                )
            )
            return pd.DataFrame({"bucket": [np.int64(i)], "rows": [np.int64(len(df))]})

        # consume the per-bucket ack stats (tiny: one row per bucket)
        (
            ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
            .groupby("_bucket")
            .map_groups(fold, batch_format="pandas")
            .materialize()
        )
        return self

    def result(self) -> pd.DataFrame:
        parts = ray.get([a.get.remote() for a in self.actors])
        out = pd.concat([p for p in parts if len(p)], ignore_index=True)
        return out.sort_values("key").reset_index(drop=True)


def watermark_rollup(
    ds,
    tier_us: int,
    key: str = "user_id",
    seq_col: str = "event_id",
    seq_tiebreak: str | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
    delay_us: int = 3_600_000_000,
    lateness_us: int = 3_600_000_000,
    value_scale: int = 100,
):
    """Event-time tumbling windows with per-key watermarks and an
    allowed-lateness policy — the streaming-semantics rollup, realized
    batch-deterministically (Flink keyed-watermark model: after keyBy,
    each key's substream carries its own watermark; ``seq_col`` is the
    arrival order within the key).

    Per row, with ``prev_max`` = max event time of EARLIER-arriving
    rows of the same key and watermark = ``prev_max - delay_us``:

    - **dropped**:   watermark >= window_end + lateness (the window was
      already finalized when the row arrived — routed to the
      dead-letter count, excluded from aggregates)
    - **late**:      accepted after window end (would emit a
      correction/update downstream)
    - **on_time**:   everything else

    Returns one row per (key, window_start) over ALL arrivals:
    ``n_on_time, n_late, n_dropped, sum_value`` (exact int64-scaled
    sum of accepted rows). Fully distributed: one hash shuffle on
    ``key``, then a single vectorized pass per partition (sorted
    cummax + flag masks — no Python loop, no actor state, no driver
    hop). Deterministic given ``seq_col``, so it is DuckDB-oracle-
    checkable — unlike wall-clock streaming.
    """
    from .rollup import partitions_for_input

    n_parts = partitions_for_input(None)

    order = [seq_col] + ([seq_tiebreak] if seq_tiebreak else [])

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[key, *order, value_col]].copy()
        out["_tus"] = (
            batch[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        out["_part"] = (
            pd.util.hash_pandas_object(batch[key], index=False).to_numpy()
            >> np.uint64(40)
        ).astype(np.int64) % n_parts
        return out

    partials = ds.map_batches(prep, batch_format="pandas", batch_size=None)

    def process(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, *order], kind="mergesort").reset_index(drop=True)
        tus = g["_tus"].to_numpy()
        k = g[key].to_numpy()
        # per-key prefix max of earlier arrivals: global cummax reset at
        # key boundaries, then shifted one row within each key segment
        new_key = np.empty(len(g), dtype=bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        seg_id = np.cumsum(new_key) - 1
        cmax = pd.Series(tus).groupby(seg_id).cummax().to_numpy()
        prev_max = np.empty(len(g), dtype=np.float64)
        prev_max[0] = np.nan
        prev_max[1:] = cmax[:-1]
        prev_max[new_key] = np.nan

        w = tus // tier_us * tier_us
        wend = w + tier_us
        wm = prev_max - delay_us  # NaN -> comparisons False (on_time)
        with np.errstate(invalid="ignore"):
            dropped = wm >= wend + lateness_us
            late = ~dropped & (wm >= wend)
        on_time = ~dropped & ~late
        sv = np.round(
            g[value_col].to_numpy(dtype=np.float64) * value_scale
        ).astype(np.int64)
        t = pd.DataFrame(
            {
                key: k,
                "_w": w,
                "_on": on_time.astype(np.int64),
                "_late": late.astype(np.int64),
                "_drop": dropped.astype(np.int64),
                "_s": np.where(dropped, 0, sv),
            }
        )
        m = t.groupby([key, "_w"], sort=False, as_index=False).sum()
        out = pd.DataFrame(
            {
                key: m[key],
                "window_start": m["_w"].to_numpy().astype("datetime64[us]"),
                "n_on_time": m["_on"].astype(np.int64),
                "n_late": m["_late"].astype(np.int64),
                "n_dropped": m["_drop"].astype(np.int64),
                "sum_value": np.round(
                    m["_s"].to_numpy(dtype=np.float64) / value_scale, 6
                ),
            }
        )
        return out

    return partials.groupby("_part").map_groups(process, batch_format="pandas")


def sessionize(
    ds,
    key: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    gap_s: float = 600.0,
    num_partitions: int | None = None,
):
    """Session windows as a fully vectorized partition pass: within
    each ``key`` (ordered by ``order_col``), a gap > ``gap_s`` seconds
    starts a new session; emits one row per session
    ``(key, session_idx, n_turns, duration_s, start_ts)``.

    Unlike a per-group ``map_groups`` + Python session loop, this
    sessionizes an ENTIRE partition in one numpy pass (lexsort, gap
    mask, cumsum session ids, reduceat aggregates) — per-key Python
    overhead is O(P), not O(#keys). One key-hash shuffle of three
    narrow columns; output is one row per session, streamed.

    Reference analogue: the windowed-evaluation session enumeration
    (`uni2ts/src/uni2ts/data/dataset.py:185-211`) — ours is gap-based
    (data-driven) rather than stride-based.
    """
    import pandas as pd
    import pyarrow as pa

    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)
    gap_us = np.int64(round(gap_s * 1e6))

    def add_part(batch: pa.Table) -> pa.Table:
        import pandas as pd_

        part = (
            pd_.util.hash_pandas_object(
                batch[key].to_pandas(), index=False
            ).to_numpy()
            % P
        ).astype(np.int32)
        # dedupe: order_col == ts_col (order by time itself) is legal
        return batch.select(list(dict.fromkeys([key, order_col, ts_col]))).append_column(
            "_part", pa.array(part)
        )

    def partition_fn(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return pd.DataFrame(
                {
                    key: pd.Series([], dtype=object),
                    "session_idx": pd.Series([], dtype=np.int64),
                    "n_turns": pd.Series([], dtype=np.int64),
                    "duration_s": pd.Series([], dtype=np.float64),
                    "start_ts": pd.Series([], dtype="datetime64[us]"),
                }
            )
        codes, uniques = pd.factorize(df[key], sort=False)
        order = np.lexsort((df[order_col].to_numpy(), codes))
        codes_s = codes[order]
        tus = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)[order]
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = codes_s[1:] != codes_s[:-1]
        gap = np.empty(n, dtype=bool)
        gap[0] = True
        gap[1:] = (tus[1:] - tus[:-1]) > gap_us
        new_sess = new_key | gap
        sess_id = np.cumsum(new_sess) - 1  # 0-based global (per partition)
        starts = np.flatnonzero(new_sess)
        ends = np.append(starts[1:], n) - 1
        # session_idx restarts at 1 within each key
        key_first_sess = sess_id[new_key]  # first session id of each key run
        sess_key_codes = codes_s[starts]
        first_of_key = np.repeat(
            key_first_sess, np.diff(np.append(np.flatnonzero(np.diff(np.append(-1, sess_key_codes)) != 0), len(starts)))
        )
        session_idx = (np.arange(len(starts)) - first_of_key + 1).astype(np.int64)
        return pd.DataFrame(
            {
                key: uniques[sess_key_codes],
                "session_idx": session_idx,
                "n_turns": (ends - starts + 1).astype(np.int64),
                "duration_s": (tus[ends] - tus[starts]) / 1e6,
                "start_ts": tus[starts].astype("datetime64[us]"),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(partition_fn, batch_format="pandas")
    )
