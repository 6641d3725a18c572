"""Merging t-digest — mergeable quantile sketch (Dunning & Ertl 2019,
public algorithm).

The engine's exact per-(key, bucket) quantiles (rollup.py segmented
path) hold because those groups are small; for quantiles over groups
too large to hold their values (the 100-TB path), this digest gives
fixed-size mergeable partials: per-batch digests shuffle instead of
raw values, mirroring the HyperLogLog design in ``functions/sketch``.

Centroids are (mean, weight) pairs kept sorted by mean; compression
merges neighbors while the merged centroid respects the scale bound
``w <= 4 n q (1-q) / delta`` (q = centroid mid-rank), which keeps
resolution highest at the tails — rank error is O(1/delta) near the
median and far smaller at extreme quantiles.
"""

from __future__ import annotations

import numpy as np


class TDigest:
    def __init__(self, delta: int = 100):
        self.delta = int(delta)
        self.means = np.empty(0)
        self.weights = np.empty(0)
        self._buf_v: list[np.ndarray] = []
        self._buf_w: list[np.ndarray] = []

    # ------------------------------------------------------------ build
    def add(self, values, weights=None) -> "TDigest":
        v = np.asarray(values, dtype=np.float64).ravel()
        if weights is None:
            v = v[np.isfinite(v)]
            if not len(v):
                return self
            w = np.ones(len(v))
        else:
            w = np.asarray(weights, dtype=np.float64).ravel()
            if len(w) != len(v):
                raise ValueError(f"weights length {len(w)} != values length {len(v)}")
            # mask BOTH arrays so weights stay paired with their values
            m = np.isfinite(v)
            v, w = v[m], w[m]
            if not len(v):
                return self
        self._buf_v.append(v)
        self._buf_w.append(w)
        if sum(len(b) for b in self._buf_v) > 32 * self.delta:
            self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        if len(other.means):
            self._buf_v.append(other.means)
            self._buf_w.append(other.weights)
        self._buf_v.extend(other._buf_v)
        self._buf_w.extend(other._buf_w)
        self._compress()
        return self

    def _compress(self) -> None:
        if self._buf_v:
            v = np.concatenate([self.means, *self._buf_v])
            w = np.concatenate([self.weights, *self._buf_w])
            self._buf_v, self._buf_w = [], []
        else:
            v, w = self.means, self.weights
        if not len(v):
            return
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        n = w.sum()
        out_m: list[float] = []
        out_w: list[float] = []
        cur_m, cur_w, seen = v[0], w[0], 0.0
        for i in range(1, len(v)):
            q = (seen + (cur_w + w[i]) / 2.0) / n  # merged centroid mid-rank
            bound = 4.0 * n * q * (1.0 - q) / self.delta
            if cur_w + w[i] <= max(bound, 1.0):
                cur_m += (v[i] - cur_m) * (w[i] / (cur_w + w[i]))
                cur_w += w[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                seen += cur_w
                cur_m, cur_w = v[i], w[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    # ------------------------------------------------------------ query
    def quantile(self, p: float) -> float:
        self._compress()
        if not len(self.means):
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        w = self.weights
        n = w.sum()
        # centroid mid-rank positions; interpolate between them
        mid = np.cumsum(w) - w / 2.0
        target = p * n
        if target <= mid[0]:
            return float(self.means[0])
        if target >= mid[-1]:
            return float(self.means[-1])
        j = int(np.searchsorted(mid, target) - 1)
        frac = (target - mid[j]) / max(mid[j + 1] - mid[j], 1e-300)
        return float(self.means[j] + frac * (self.means[j + 1] - self.means[j]))

    @property
    def n(self) -> float:
        self._compress()
        return float(self.weights.sum())

    # ------------------------------------------------------ serialization
    def to_bytes(self) -> bytes:
        """delta(u32) + k(u32) + means[k] f64 + weights[k] f64 — the
        fixed-width partial that shuffles instead of raw values."""
        self._compress()
        k = len(self.means)
        head = np.array([self.delta, k], dtype=np.uint32).tobytes()
        return head + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TDigest":
        delta, k = np.frombuffer(blob, dtype=np.uint32, count=2)
        d = cls(delta=int(delta))
        d.means = np.frombuffer(blob, dtype=np.float64, count=int(k), offset=8).copy()
        d.weights = np.frombuffer(
            blob, dtype=np.float64, count=int(k), offset=8 + int(k) * 8
        ).copy()
        return d
