"""Deterministic hashing kernels for dedup / fingerprinting.

All public algorithms: MinHash (Broder 1997), LSH banding
(Indyk-Motwani / Mining of Massive Datasets ch.3), SimHash (Charikar
2002), Karp-Rabin rolling hash + winnowing (Schleimer et al. 2003).
Everything is seeded and vectorized; no Python ``hash()`` (not stable
across processes).
"""

from __future__ import annotations

import numpy as np

_MERSENNE61 = np.uint64((1 << 61) - 1)
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _fnv1a_python(tokens, out: np.ndarray, idx: np.ndarray) -> None:
    """Reference per-string FNV-1a loop (fallback for the long tail)."""
    prime = int(_FNV_PRIME)
    mask = (1 << 64) - 1
    for i in idx:
        h = int(_FNV_OFFSET)
        for b in tokens[i]:
            h = ((h ^ b) * prime) & mask
        out[i] = h


def fnv1a_u64(tokens: list[str]) -> np.ndarray:
    """FNV-1a 64-bit hash of each string (deterministic across runs).

    Vectorized lockstep scan: strings are length-sorted descending so
    that at byte position j only a PREFIX of the array is still active;
    each position is one numpy gather + xor + wrapping multiply over
    that prefix (total work = one vectorized pass over all bytes).
    Bit-exact vs the per-byte reference loop (property-tested); the few
    strings much longer than the bulk fall back to the Python loop so a
    single 100 KB outlier doesn't force 100k tiny vector ops.
    """
    n = len(tokens)
    if n == 0:
        return np.array([], dtype=np.uint64)
    enc = [t.encode("utf-8", "surrogatepass") for t in tokens]
    lens = np.fromiter((len(b) for b in enc), count=n, dtype=np.int64)
    out = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if n < 32:
        _fnv1a_python(enc, out, np.arange(n))
        return out
    order = np.argsort(-lens, kind="stable")
    lens_s = lens[order]
    # strings strictly longer than the 32nd-longest go to the Python
    # loop so a lone huge outlier doesn't serialize the vector scan
    cut = int(np.searchsorted(-lens_s, -int(lens_s[31]), side="left"))
    if cut:
        _fnv1a_python(enc, out, order[:cut])
    active = order[cut:]
    if not len(active):
        return out
    buf = np.frombuffer(b"".join(enc[i] for i in active), dtype=np.uint8)
    alens = lens[active]
    starts = np.zeros(len(active), dtype=np.int64)
    np.cumsum(alens[:-1], out=starts[1:])
    h = np.full(len(active), _FNV_OFFSET, dtype=np.uint64)
    # active prefix shrinks as positions pass each string's length
    # (lengths are descending within `active`): counts[j] = #{len >= j+1}
    maxlen = int(alens[0])
    counts = np.searchsorted(-alens, -np.arange(1, maxlen + 1), side="right")
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            k = int(counts[j])
            hk = h[:k]
            hk ^= buf[starts[:k] + j].astype(np.uint64)
            hk *= _FNV_PRIME
    out[active] = h
    return out


def shingle_hashes(tokens: list[str], n: int = 3) -> np.ndarray:
    """Hashes of word n-gram shingles, vectorized from token hashes via
    a polynomial combiner (so only tokens are hashed in Python)."""
    th = fnv1a_u64(tokens)
    if len(th) < n:
        # short doc: single shingle over whatever is there
        if len(th) == 0:
            return np.array([], dtype=np.uint64)
        n = len(th)
    mult = np.uint64(0x9E3779B97F4A7C15)
    acc = th[: len(th) - n + 1].copy()
    for k in range(1, n):
        acc = acc * mult + th[k : len(th) - n + 1 + k]
    return np.unique(acc)


def mulmod_p61(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Exact ``(a * x) mod (2^61 - 1)`` for uint64 arrays with
    ``a, x < 2^61 - 1``, without 128-bit ints.

    Split both operands into 31/30-bit halves and reduce each partial
    product mod p, using ``2^61 ≡ 1 (mod p)`` (so ``2^62 ≡ 2``). Every
    intermediate fits in 64 bits:

    - ``a1*x1 < 2^60``, doubled stays ``< 2^61``
    - ``a1*x0 + a0*x1 < 2^62``
    - the mid term ``m*2^31`` is re-split as ``m1*2^61 + m0*2^31``
      with ``m1 < 2^31`` and ``m0*2^31 < 2^61``
    - ``a0*x0 < 2^62``
    """
    a = np.asarray(a, dtype=np.uint64)
    x = np.asarray(x, dtype=np.uint64)
    m31 = np.uint64(0x7FFFFFFF)
    m30 = np.uint64(0x3FFFFFFF)
    a0, a1 = a & m31, a >> np.uint64(31)  # a = a1*2^31 + a0; a1 < 2^30
    x0, x1 = x & m31, x >> np.uint64(31)
    hi = (a1 * x1 << np.uint64(1)) % _MERSENNE61  # *2^62 ≡ *2
    m = (a1 * x0 + a0 * x1) % _MERSENNE61  # coefficient of 2^31
    m0, m1 = m & m30, m >> np.uint64(30)  # m*2^31 = m1*2^61 + m0*2^31
    mid = (m1 + (m0 << np.uint64(31))) % _MERSENNE61
    lo = (a0 * x0) % _MERSENNE61
    return (hi + mid + lo) % _MERSENNE61


class MinHasher:
    """num_perm universal-hash permutations h_i(x) = (a_i x + b_i) mod p,
    folded into band keys for LSH (bands x rows = num_perm)."""

    def __init__(self, num_perm: int = 128, bands: int = 16, seed: int = 42):
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, int(_MERSENNE61), num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_MERSENNE61), num_perm, dtype=np.uint64)

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        """[num_perm] uint64 signature (max-value for an empty set)."""
        if len(shingles) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = (shingles % _MERSENNE61)[None, :]  # [1, S]
        h = (mulmod_p61(self.a[:, None], x) + self.b[:, None]) % _MERSENNE61
        return h.min(axis=1)

    def band_keys(self, sig: np.ndarray) -> np.ndarray:
        """[bands] uint64 — hash of each band's row slice."""
        rows = sig.reshape(self.bands, self.rows)
        mult = np.uint64(0x9E3779B97F4A7C15)
        acc = np.full(self.bands, _FNV_OFFSET, dtype=np.uint64)
        for r in range(self.rows):
            acc = (acc ^ rows[:, r]) * mult
        return acc

    @staticmethod
    def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float((sig_a == sig_b).mean())


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> np.uint64:
    """64-bit SimHash: weighted sum of +-1 per bit, sign -> bit."""
    if len(token_hashes) == 0:
        return np.uint64(0)
    if weights is None:
        weights = np.ones(len(token_hashes))
    bits = (token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    score = ((bits.astype(np.float64) * 2.0 - 1.0) * weights[:, None]).sum(axis=0)
    out = np.uint64(0)
    for j in np.flatnonzero(score > 0):
        out |= np.uint64(1) << np.uint64(j)
    return out


def hamming64(a: np.ndarray, b: np.ndarray | np.uint64) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = np.bitwise_xor(np.asarray(a, dtype=np.uint64), b)
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def winnow_fingerprint(tokens: list[str], k: int = 5, window: int = 4) -> np.ndarray:
    """Winnowing (Schleimer et al. 2003): rolling k-gram hashes, keep
    the min hash of each sliding window, dedup consecutive picks —
    a robust document fingerprint set."""
    grams = shingle_hashes(tokens, n=k)
    if len(grams) == 0:
        return grams
    # shingle_hashes returns unique/sorted; recompute ordered rolling hashes
    th = fnv1a_u64(tokens)
    n = min(k, len(th))
    mult = np.uint64(0x9E3779B97F4A7C15)
    acc = th[: len(th) - n + 1].copy()
    for j in range(1, n):
        acc = acc * mult + th[j : len(th) - n + 1 + j]
    if len(acc) <= window:
        return np.unique(acc.min(keepdims=True))
    from numpy.lib.stride_tricks import sliding_window_view

    mins = sliding_window_view(acc, window).min(axis=1)
    return np.unique(mins)
