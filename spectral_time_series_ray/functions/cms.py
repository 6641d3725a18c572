"""Count-Min sketch (Cormode & Muthukrishnan, 2005): mergeable
fixed-size frequency summary.

Point-query guarantee with width w, depth d over a stream of total
count N: ``exact <= estimate <= exact + (e/w) * N`` with probability
``1 - exp(-d)``. Counters merge by elementwise addition, so per-block
partial sketches combine associatively — the Ray-native shape (a
fixed 32 KB–1 MB blob per block regardless of corpus size).

Complements Misra-Gries (`functions/heavy.py`): MG returns the
heavy-hitter SET with undercounts, CMS answers point queries for ANY
key with overcounts; together they bracket the exact count.

Rows are indexed by Kirsch-Mitzenmacher double hashing
``h_i(x) = h1(x) + i * h2(x)`` over a single 64-bit base hash — the
standard trick preserving the independence guarantee.
"""

from __future__ import annotations

import numpy as np

from .bloom import hash_u64

_ODD = np.uint64(0x9E3779B97F4A7C15)


class CountMinSketch:
    def __init__(self, width: int = 4096, depth: int = 4):
        assert width > 0 and depth > 0
        self.width = width
        self.depth = depth
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.n_total = 0

    def _indices(self, hashes: np.ndarray) -> np.ndarray:
        """(depth, n) column indices via double hashing."""
        h = np.asarray(hashes, dtype=np.uint64)
        h1 = hash_u64(h)
        h2 = hash_u64(h ^ _ODD) | np.uint64(1)  # odd -> full-period stride
        i = np.arange(self.depth, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.width)).astype(
            np.int64
        )

    def add_hashes(self, hashes: np.ndarray, counts: np.ndarray | None = None):
        """Vectorized bulk add: one np.add.at per depth row."""
        if len(hashes) == 0:
            return self
        c = (
            np.ones(len(hashes), dtype=np.int64)
            if counts is None
            else np.asarray(counts, dtype=np.int64)
        )
        idx = self._indices(hashes)
        for d in range(self.depth):
            np.add.at(self.table[d], idx[d], c)
        self.n_total += int(c.sum())
        return self

    def query_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Point estimates (min over depth rows), vectorized."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=np.int64)
        idx = self._indices(hashes)
        ests = np.stack([self.table[d][idx[d]] for d in range(self.depth)])
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.width, self.depth) == (other.width, other.depth)
        self.table += other.table
        self.n_total += other.n_total
        return self

    def error_bound(self, delta_exp: float = None) -> float:
        """Additive overcount bound (e/w)*N holding w.p. 1-e^-depth."""
        return float(np.e / self.width * self.n_total)

    def inner_product(self, other: "CountMinSketch") -> int:
        """Join-size estimate: ``sum_k f_A(k) * f_B(k)`` as the min over
        depth rows of the row dot products (Cormode & Muthukrishnan
        2005 §4.2 — the classic sketch equi-join cardinality
        estimator). Always an OVERestimate in expectation; additive
        error <= (e/width) * N_A * N_B w.p. 1 - e^-depth. Requires both
        sketches built with the same width/depth (hashing is
        deterministic, so separately-built sketches are compatible)."""
        assert (self.width, self.depth) == (other.width, other.depth)
        dots = np.einsum("dw,dw->d", self.table, other.table)
        return int(dots.min())

    def to_bytes(self) -> bytes:
        head = np.array([self.width, self.depth, self.n_total], dtype=np.int64)
        return head.tobytes() + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMinSketch":
        w, d, n = np.frombuffer(data[:24], dtype=np.int64)
        sk = cls(int(w), int(d))
        sk.table = (
            np.frombuffer(data[24:], dtype=np.int64).reshape(int(d), int(w)).copy()
        )
        sk.n_total = int(n)
        return sk
