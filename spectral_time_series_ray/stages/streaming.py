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

    SCALE NOTE (honest limitation): the global event-time sort is an
    all-to-all and every micro-batch passes through the DRIVER before
    fanning out to bucket actors, so the driver NIC is the throughput
    ceiling. This models the reference's single-process incremental
    evaluator lifecycle, not a 100-TB stream; the scale path for
    unordered aggregation is ``rollup_mergeable`` (no order, no driver
    hop). Use this stage only when strict event-time fold order of a
    keyed state machine is required."""

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

    def result(self) -> pd.DataFrame:
        parts = ray.get([a.get.remote() for a in self.actors])
        out = pd.concat([p for p in parts if len(p)], ignore_index=True)
        return out.sort_values("key").reset_index(drop=True)
