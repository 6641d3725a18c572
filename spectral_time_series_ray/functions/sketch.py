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


class KMVSketch:
    """K-minimum-values / theta sketch (Bar-Yossef et al. RANDOM'02;
    Beyer et al. SIGMOD'07 "On synopses for distinct-value estimation";
    the Apache DataSketches theta-sketch model): keep the ``k`` smallest
    DISTINCT 64-bit hashes of the stream. Unlike HLL it supports set
    INTERSECTION estimates, not just union: with
    ``theta = min(theta_a, theta_b)``, both sketches restricted to
    hashes below theta are uniform samples of their sets at the same
    rate, so ``|A & B| ~= |sample_a & sample_b| / theta``.

    Mergeable: union sketch = k smallest of the concatenation (exactly
    the sketch of the union stream). Estimate: exact count while the
    sketch is not yet full; otherwise the unbiased ``(k-1)/U_(k)`` with
    ``U_(k)`` the k-th smallest hash normalized to (0, 1]."""

    FULL_RANGE = float(2**64)

    def __init__(self, k: int = 1024, values: np.ndarray | None = None):
        assert k >= 16
        self.k = k
        self.values = (np.empty(0, np.uint64) if values is None
                       else np.asarray(values, np.uint64))

    def add_hashes(self, hashes: np.ndarray) -> "KMVSketch":
        """``hashes`` must already be well-mixed uint64 (order statistics
        are distribution-sensitive — raw FNV over short similar strings
        measures ~15% non-uniform). Prefer :meth:`add_strings`, which
        finalizes with the murmur3 fmix64 bijection."""
        merged = np.concatenate([self.values, np.asarray(hashes, np.uint64)])
        self.values = np.unique(merged)[: self.k]
        return self

    def add_strings(self, values) -> "KMVSketch":
        return self.add_hashes(
            HyperLogLog._fmix64(fnv1a_u64([str(v) for v in values])))

    def merge(self, other: "KMVSketch") -> "KMVSketch":
        assert self.k == other.k
        return self.add_hashes(other.values)

    @property
    def theta(self) -> float:
        """Sampling rate: hashes below ``theta * 2^64`` are retained."""
        if len(self.values) < self.k:
            return 1.0
        # exclusive bound: the k-th value itself marks the cutoff
        return float(self.values[self.k - 1]) / self.FULL_RANGE

    def estimate(self) -> float:
        if len(self.values) < self.k:
            return float(len(self.values))  # exact below capacity
        u_k = float(self.values[self.k - 1]) / self.FULL_RANGE
        return (self.k - 1) / u_k

    @staticmethod
    def _restricted(a: "KMVSketch", b: "KMVSketch"):
        """Both value sets restricted below min(theta_a, theta_b), as
        raw uint64 cutoffs (no float round-trip — 2^64-1 is not
        representable as float64). Returns (va, vb, theta)."""
        cuts = []
        if len(a.values) >= a.k:
            cuts.append(a.values[a.k - 1])
        if len(b.values) >= b.k:
            cuts.append(b.values[b.k - 1])
        if not cuts:
            return a.values, b.values, 1.0
        cut = min(cuts)
        theta = float(cut) / KMVSketch.FULL_RANGE
        return a.values[a.values < cut], b.values[b.values < cut], theta

    @staticmethod
    def intersection(a: "KMVSketch", b: "KMVSketch") -> float:
        """Estimated ``|A & B|`` via the theta-sketch set operation."""
        va, vb, theta = KMVSketch._restricted(a, b)
        n_common = len(np.intersect1d(va, vb, assume_unique=True))
        return n_common / theta

    @staticmethod
    def jaccard(a: "KMVSketch", b: "KMVSketch") -> float:
        va, vb, theta = KMVSketch._restricted(a, b)
        union = len(np.union1d(va, vb))
        if union == 0:
            return 0.0
        return len(np.intersect1d(va, vb, assume_unique=True)) / union

    def to_bytes(self) -> bytes:
        return np.int64(self.k).tobytes() + self.values.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "KMVSketch":
        k = int(np.frombuffer(data[:8], np.int64)[0])
        return cls(k=k, values=np.frombuffer(data[8:], np.uint64).copy())
