"""Mergeable sketches for approximate distinct counting at scale.

The reference has no sketches (SURVEY.md §2.5 "Distinct / sketches:
none"); these are built from the public algorithms for the 100 TB
pipeline, where exact COUNT DISTINCT of high-cardinality keys would
shuffle every value:

- :class:`HyperLogLog` — Flajolet et al. 2007 with the standard bias
  correction and small/large-range corrections. Registers are a dense
  ``2^p`` uint8 array; sketches merge by element-wise max (the
  partial-aggregate pattern: one sketch per batch, tiny merge —
  ray_guide.md "Aggregation at scale").

Deterministic hashing (FNV-1a, functions/hashing.py) so results are
reproducible across runs/processes.
"""

from __future__ import annotations

import numpy as np

from .hashing import fnv1a_u64


class HyperLogLog:
    def __init__(self, p: int = 12):
        assert 4 <= p <= 18
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def _alpha(m: int) -> float:
        if m == 16:
            return 0.673
        if m == 32:
            return 0.697
        if m == 64:
            return 0.709
        return 0.7213 / (1.0 + 1.079 / m)

    @staticmethod
    def _fmix64(h: np.ndarray) -> np.ndarray:
        """Murmur3 finalizer: FNV-1a avalanches poorly in the high bits,
        which are exactly what the bucket index uses."""
        h = h.copy()
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(33)
        return h

    def add_hashes(self, hashes: np.ndarray) -> "HyperLogLog":
        """Vectorized bulk insert of uint64 hashes."""
        h = np.asarray(hashes, dtype=np.uint64)
        if not len(h):
            return self
        h = self._fmix64(h)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining bits + 1 (<= 64-p+1)
        lz = np.zeros(len(h), dtype=np.int64)
        v = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            high = v >> np.uint64(64 - shift)
            zero = high == 0
            lz += np.where(zero, shift, 0)
            v = np.where(zero, v << np.uint64(shift), v)
        rank = (lz + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def add_strings(self, values) -> "HyperLogLog":
        return self.add_hashes(fnv1a_u64([str(v) for v in values]))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        regs = self.registers.astype(np.float64)
        est = self._alpha(m) * m * m / np.sum(2.0 ** (-regs))
        if est <= 2.5 * m:  # small-range correction
            zeros = int((self.registers == 0).sum())
            if zeros:
                return m * np.log(m / zeros)
        if est > (1 << 32) / 30.0:  # large-range correction
            return -(1 << 32) * np.log(1.0 - est / (1 << 32))
        return float(est)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        h = cls(p=data[0])
        h.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return h
