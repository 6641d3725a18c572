"""Bloom filter — mergeable membership sketch for semi-join pushdown.

Public algorithm (Bloom 1970). Engine use (ray_guide.md "Joins"): when
one side of a hash join is heavily filtered, build a Bloom filter over
its join keys (OR-mergeable partials, O(bits) each), broadcast the
small bitset once via ``ray.put``, and pre-filter the OTHER side
inside ``map_batches`` before the shuffle — rows that cannot match
never enter the exchange. False positives only let extra rows through
(the join itself stays exact); false negatives are impossible.
"""

from __future__ import annotations

import numpy as np

from .hashing import fnv1a_u64

_MIX = np.uint64(0x9E3779B97F4A7C15)


def hash_u64(arr: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over integer keys (public
    constants) — avoids per-row str() for numeric join columns."""
    x = np.asarray(arr).astype(np.uint64)
    x = x + _MIX
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


class BloomFilter:
    """Fixed-size double-hashed Bloom filter over uint64 key hashes."""

    def __init__(self, n_bits: int = 1 << 20, k: int = 5):
        if n_bits & (n_bits - 1):
            raise ValueError("n_bits must be a power of two")
        self.n_bits = n_bits
        self.k = k
        self.bits = np.zeros(n_bits // 64, dtype=np.uint64)

    # h_i(x) = h1 + i*h2 (Kirsch-Mitzenmacher double hashing)
    def _positions(self, h: np.ndarray) -> np.ndarray:
        h = np.asarray(h, dtype=np.uint64)
        h2 = (h ^ (h >> np.uint64(31))) * _MIX
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return (h[None, :] + i * h2[None, :]) & np.uint64(self.n_bits - 1)

    def add_hashes(self, h: np.ndarray) -> "BloomFilter":
        pos = self._positions(h).ravel()
        np.bitwise_or.at(
            self.bits, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )
        return self

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        pos = self._positions(np.asarray(h, dtype=np.uint64))
        word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0).astype(bool)

    def add_values(self, values) -> "BloomFilter":
        return self.add_hashes(fnv1a_u64([str(v) for v in values]))

    def contains_values(self, values) -> np.ndarray:
        return self.contains_hashes(fnv1a_u64([str(v) for v in values]))

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if other.n_bits != self.n_bits or other.k != self.k:
            raise ValueError("incompatible Bloom parameters")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits.view(np.uint8)).mean())

    def to_bytes(self) -> bytes:
        head = np.array([self.n_bits, self.k], dtype=np.uint64).tobytes()
        return head + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomFilter":
        n_bits, k = np.frombuffer(blob, dtype=np.uint64, count=2)
        bf = cls(n_bits=int(n_bits), k=int(k))
        bf.bits = np.frombuffer(blob, dtype=np.uint64, offset=16).copy()
        return bf
