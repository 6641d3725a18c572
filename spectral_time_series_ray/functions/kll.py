"""KLL quantile sketch (Karnin, Lang & Liberty, FOCS 2016) with a
SELF-CERTIFYING deterministic rank-error budget.

The mergeable complement of the t-digest (`functions/tdigest`): where
the t-digest's accuracy is empirical (great in practice, no worst
case), KLL's compaction algebra yields a PROVABLE bound — and this
implementation tracks an exact per-instance certificate. Every
compaction at level ``h`` keeps the even- or odd-indexed half of a
sorted buffer with doubled weight, which perturbs the estimated rank
of ANY fixed query point by at most one item weight ``2**h``; summing
``2**h`` over all compactions (and adding certificates on merge) gives
``err_bound`` — a worst-case cap on ``|est_rank(q) - true_rank(q)|``
that holds for every query regardless of the coin flips. Consumers
can therefore verify the sketch against exact ranks with a bound the
sketch itself asserts, not a tuned tolerance.

Coin flips are deterministic: a splitmix64 stream seeded per sketch,
advanced per compaction — identical single-stream runs reproduce
exactly; distributed merge trees vary with partition order but the
certificate accounting stays valid (bounds are worst-case over ALL
coin outcomes and merge shapes).

Layout: levels[h] is an UNSORTED numpy buffer of weight 2**h items;
capacity shrinks geometrically (ratio 2/3, floor 2) below the top
level as in the paper, so total space is O(k).
"""

from __future__ import annotations

import numpy as np

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: int) -> int:
    """One splitmix64 finalizer step (public domain constants)."""
    z = (int(x) + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


class KLL:
    """KLL sketch over float64 values. NaNs are ignored on ``add``."""

    def __init__(self, k: int = 200, seed: int = 0):
        if k < 8:
            raise ValueError(f"k must be >= 8, got {k}")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.n = 0  # total weight (items represented)
        self.err_bound = 0  # certified max |est_rank - true_rank|
        self._coin_state = int(seed)
        self._coin_ctr = 0

    # ---- capacities -------------------------------------------------
    def _capacity(self, h: int) -> int:
        """Level capacity: k at the top, * (2/3) per level below."""
        depth = len(self.levels) - 1 - h
        return max(2, int(np.ceil(self.k * (2.0 / 3.0) ** depth)))

    # ---- ingest -----------------------------------------------------
    def add(self, values: np.ndarray) -> "KLL":
        v = np.asarray(values, np.float64).ravel()
        v = v[np.isfinite(v) | np.isneginf(v) | np.isposinf(v)]
        v = v[~np.isnan(v)]
        if not len(v):
            return self
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += len(v)
        self._compress()
        return self

    # ---- compaction -------------------------------------------------
    def _coin(self) -> int:
        self._coin_ctr += 1
        return _splitmix64(self._coin_state + self._coin_ctr) & 1

    def _compress(self) -> None:
        # compact the lowest over-capacity level until all levels fit
        while True:
            for h in range(len(self.levels)):
                if len(self.levels[h]) > self._capacity(h):
                    self._compact_level(h)
                    break
            else:
                return

    def _compact_level(self, h: int) -> None:
        buf = np.sort(self.levels[h])
        if len(buf) < 2:
            return
        if len(buf) % 2:
            # odd: one item stays behind at this level
            keep_back, buf = buf[-1:], buf[:-1]
        else:
            keep_back = buf[:0]
        off = self._coin()
        promoted = buf[off::2]
        self.levels[h] = keep_back.copy()
        if h + 1 == len(self.levels):
            self.levels.append(np.empty(0, np.float64))
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
        # any fixed rank moves by at most one item weight per compaction
        self.err_bound += 1 << h

    # ---- merge ------------------------------------------------------
    def merge(self, other: "KLL") -> "KLL":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.float64))
        for h, buf in enumerate(other.levels):
            if len(buf):
                self.levels[h] = np.concatenate([self.levels[h], buf])
        self.n += other.n
        self.err_bound += other.err_bound
        self._compress()
        return self

    # ---- queries ----------------------------------------------------
    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, buf in enumerate(self.levels):
            if len(buf):
                vals.append(buf)
                wts.append(np.full(len(buf), 1 << h, np.int64))
        if not vals:
            return np.empty(0, np.float64), np.empty(0, np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        o = np.argsort(v, kind="stable")
        return v[o], w[o]

    def rank(self, q: float) -> int:
        """Estimated number of items <= q."""
        v, w = self._weighted()
        return int(w[: np.searchsorted(v, q, "right")].sum())

    def quantile(self, p: float) -> float:
        """Value whose estimated rank is closest to ``p * n``."""
        v, w = self._weighted()
        if not len(v):
            return float("nan")
        target = float(p) * self.n
        cum = np.cumsum(w)
        i = int(np.searchsorted(cum, target, "left"))
        return float(v[min(i, len(v) - 1)])

    # ---- serialization (fixed-layout float64 blob) -------------------
    def to_bytes(self) -> bytes:
        head = np.array(
            [self.k, self.n, self.err_bound, self._coin_state,
             self._coin_ctr, len(self.levels)], np.int64)
        sizes = np.array([len(b) for b in self.levels], np.int64)
        body = ([head.view(np.float64), sizes.view(np.float64)]
                + [b for b in self.levels if len(b)])
        return np.concatenate(body).tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KLL":
        a = np.frombuffer(blob, np.float64)
        head = a[:6].view(np.int64)
        k, n, err, cstate, cctr, n_levels = (int(x) for x in head)
        sizes = a[6 : 6 + n_levels].view(np.int64)
        s = cls(k=k, seed=cstate)
        s.n, s.err_bound, s._coin_ctr = n, err, cctr
        s.levels = []
        pos = 6 + n_levels
        for sz in sizes:
            s.levels.append(a[pos : pos + int(sz)].astype(np.float64))
            pos += int(sz)
        if not s.levels:
            s.levels = [np.empty(0, np.float64)]
        return s
