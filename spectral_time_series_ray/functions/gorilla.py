"""Gorilla time-series compression (Pelkonen et al., VLDB 2015).

Built from the public paper — the reference repo has no compression
(SURVEY.md §0); this fills the north-star's Gorilla slot.

Two codecs, both operating on one chunk (= one conversation series, or
one bounded sub-chunk of it):

- **XOR float codec** (paper §4.1.2): first value raw (64/32 bits);
  each next value XORed with the previous —
  ``'0'`` if identical, else ``'1'`` + control bit: ``'0'`` reuse the
  current (leading-zeros, meaningful-length) window, ``'1'`` emit a new
  window header (5 bits leading zeros, 6 bits length-1) then the
  meaningful bits.  The encoder here picks ONE window per chunk (the
  tightest window covering every nonzero XOR in the chunk), which keeps
  the bit grammar exactly decodable by a standard Gorilla reader while
  making encode fully vectorizable (numpy, no per-point Python loop).
- **delta-of-delta timestamp codec** (paper §4.1.1): header timestamp
  raw 64 bits, first delta raw 64 bits (zigzag), then per point
  D = (t[i]-t[i-1]) - (t[i-1]-t[i-2]) encoded in the paper's buckets:
  ``'0'`` D==0; ``'10'``+7b for [-63,64]; ``'110'``+9b for [-255,256];
  ``'1110'``+12b for [-2047,2048]; ``'1111'``+64b otherwise (the paper
  uses 32b — widened to 64b because our timestamps are microseconds,
  not seconds; documented deviation).

Invariant (FIXTURES.md §5): ``decode(encode(x)) == x`` bit-for-bit for
float32/float64 and int64 timestamps, on constant / drift / step /
random sequences.  The reported metric is **bytes/point**.
"""

from __future__ import annotations

import numpy as np

_POW2 = (1 << np.arange(63, -1, -1).astype(np.uint64)).astype(np.uint64)


def _pack_entries(vals: np.ndarray, nbits: np.ndarray) -> bytes:
    """Concatenate variable-width big-endian bit fields into bytes.

    vals[i]'s low nbits[i] bits are appended MSB-first. Vectorized:
    64 scatter passes (one per bit position) instead of a per-entry loop.
    """
    vals = vals.astype(np.uint64, copy=False)
    nbits = nbits.astype(np.int64, copy=False)
    keep = nbits > 0
    vals, nbits = vals[keep], nbits[keep]
    total = int(nbits.sum())
    if total == 0:
        return b""
    ends = np.cumsum(nbits)
    bits = np.zeros(-(-total // 8) * 8, dtype=np.uint8)
    for j in range(int(nbits.max())):
        m = nbits > j
        pos = ends[m] - 1 - j
        bits[pos] = ((vals[m] >> np.uint64(j)) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits[:total]).tobytes()


class _BitReader:
    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        b = self.bits[self.pos : self.pos + n]
        self.pos += n
        return int(b.astype(np.uint64) @ _POW2[64 - n :])


def _clz64(x: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64 values (64 for x == 0)."""
    x = x.astype(np.uint64, copy=False)
    n = np.full(x.shape, 64, dtype=np.int64)
    nz = x != 0
    if nz.any():
        # position of highest set bit via float64 log2 is unsafe near 2^53;
        # use a 4-pass binary reduction instead
        v = x[nz].copy()
        cnt = np.zeros(v.shape, dtype=np.int64)
        for shift in (32, 16, 8, 4, 2, 1):
            high = v >> np.uint64(shift)
            use = high != 0
            v = np.where(use, high, v)
            cnt += np.where(use, shift, 0)
        n[nz] = 63 - cnt
    return n


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Count trailing zeros of uint64 values (64 for x == 0)."""
    x = x.astype(np.uint64, copy=False)
    low = (x & (~x + np.uint64(1))).astype(np.uint64)  # isolate lowest set bit
    out = np.where(x == 0, 64, 63 - _clz64(low))
    return out.astype(np.int64)


def encode_floats(values: np.ndarray) -> bytes:
    """Gorilla XOR-encode a 1-D float64/float32 chunk. NaNs allowed
    (bit patterns round-trip exactly)."""
    values = np.asarray(values)
    if values.dtype == np.float32:
        word, tag = 32, 1
        bits = values.view(np.uint32).astype(np.uint64)
    elif values.dtype == np.float64:
        word, tag = 64, 0
        bits = values.view(np.uint64)
    else:
        raise TypeError(f"expected float32/float64, got {values.dtype}")
    n = len(values)
    header_vals = [np.uint64(tag), np.uint64(n)]
    header_bits = [8, 32]
    if n == 0:
        return _pack_entries(np.array(header_vals, np.uint64), np.array(header_bits))
    header_vals.append(bits[0])
    header_bits.append(word)
    if n == 1:
        return _pack_entries(np.array(header_vals, np.uint64), np.array(header_bits))

    xor = np.bitwise_xor(bits[1:], bits[:-1])
    nz = xor != 0
    if not nz.any():
        vals = np.zeros(n - 1, np.uint64)
        widths = np.ones(n - 1, np.int64)
        return _pack_entries(
            np.concatenate([np.array(header_vals, np.uint64), vals]),
            np.concatenate([np.array(header_bits, np.int64), widths]),
        )

    # one meaningful-bit window for the whole chunk (tightest cover)
    lz = int(min(31, _clz64(xor[nz]).min() - (64 - word)))
    tz = int(_ctz64(xor[nz]).min())
    mlen = word - lz - tz  # 1..word
    meaningful = (xor >> np.uint64(tz)).astype(np.uint64)

    first_nz = int(np.flatnonzero(nz)[0])
    # two emit slots per point: control prefix, payload
    vals = np.zeros((n - 1, 2), np.uint64)
    widths = np.zeros((n - 1, 2), np.int64)
    # default: '0' single bit (xor == 0)
    widths[:, 0] = 1
    # nonzero, window reuse: '1''0' + meaningful bits
    vals[nz, 0] = np.uint64(0b10)
    widths[nz, 0] = 2
    vals[nz, 1] = meaningful[nz]
    widths[nz, 1] = mlen
    # first nonzero: '1''1' + 5b lz + 6b (mlen-1), then meaningful payload
    vals[first_nz, 0] = (np.uint64(0b11) << np.uint64(11)) | np.uint64(lz << 6) | np.uint64(mlen - 1)
    widths[first_nz, 0] = 13
    return _pack_entries(
        np.concatenate([np.array(header_vals, np.uint64), vals.ravel()]),
        np.concatenate([np.array(header_bits, np.int64), widths.ravel()]),
    )


def decode_floats(data: bytes) -> np.ndarray:
    r = _BitReader(data)
    tag = r.read(8)
    n = r.read(32)
    word = 32 if tag == 1 else 64
    dtype = np.float32 if tag == 1 else np.float64
    utype = np.uint32 if tag == 1 else np.uint64
    if n == 0:
        return np.array([], dtype=dtype)
    out = np.zeros(n, dtype=np.uint64)
    out[0] = r.read(word)
    lz = mlen = 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = out[i - 1]
            continue
        if r.read(1) == 1:
            lz = r.read(5)
            mlen = r.read(6) + 1
        tz = word - lz - mlen
        out[i] = np.uint64(int(out[i - 1]) ^ (r.read(mlen) << tz))
    return out.astype(utype).view(dtype)


def _zigzag(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.int64, copy=False)
    return ((x << 1) ^ (x >> 63)).view(np.uint64)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def encode_timestamps(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode a 1-D int64 timestamp chunk (any unit)."""
    ts = np.asarray(ts).astype(np.int64)
    n = len(ts)
    hv = [np.uint64(n)]
    hb = [32]
    if n >= 1:
        hv.append(ts[:1].view(np.uint64)[0])
        hb.append(64)
    if n >= 2:
        hv.append(_zigzag(np.array([ts[1] - ts[0]]))[0])
        hb.append(64)
    if n <= 2:
        return _pack_entries(np.array(hv, np.uint64), np.array(hb, np.int64))

    delta = np.diff(ts)
    dod = delta[1:] - delta[:-1]  # n-2 entries
    m = len(dod)
    vals = np.zeros((m, 2), np.uint64)
    widths = np.zeros((m, 2), np.int64)

    zero = dod == 0
    b7 = ~zero & (dod >= -63) & (dod <= 64)
    b9 = ~zero & ~b7 & (dod >= -255) & (dod <= 256)
    b12 = ~zero & ~b7 & ~b9 & (dod >= -2047) & (dod <= 2048)
    b64 = ~zero & ~b7 & ~b9 & ~b12

    widths[zero, 0] = 1  # '0'
    # value buckets store the value offset so ranges like [-63,64] fit the bit width
    vals[b7, 0] = (np.uint64(0b10) << np.uint64(7)) | (dod[b7] + 63).astype(np.uint64)
    widths[b7, 0] = 9
    vals[b9, 0] = (np.uint64(0b110) << np.uint64(9)) | (dod[b9] + 255).astype(np.uint64)
    widths[b9, 0] = 12
    vals[b12, 0] = (np.uint64(0b1110) << np.uint64(12)) | (dod[b12] + 2047).astype(np.uint64)
    widths[b12, 0] = 16
    vals[b64, 0] = np.uint64(0b1111)
    widths[b64, 0] = 4
    vals[b64, 1] = _zigzag(dod[b64])
    widths[b64, 1] = 64

    return _pack_entries(
        np.concatenate([np.array(hv, np.uint64), vals.ravel()]),
        np.concatenate([np.array(hb, np.int64), widths.ravel()]),
    )


def decode_timestamps(data: bytes) -> np.ndarray:
    r = _BitReader(data)
    n = r.read(32)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    out[0] = np.array([r.read(64)], dtype=np.uint64).view(np.int64)[0]
    if n == 1:
        return out

    # the encoder differences in WRAPPING int64 (np.diff); mirror that
    # here — accumulate in Python ints but reduce mod 2^64 back into
    # the signed range, so extreme deltas round-trip bit-exactly
    def _s64(x: int) -> int:
        x &= (1 << 64) - 1
        return x - (1 << 64) if x >= (1 << 63) else x

    delta = _unzigzag(r.read(64))
    out[1] = _s64(int(out[0]) + delta)
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = _unzigzag(r.read(64))
        delta = _s64(delta + dod)
        out[i] = _s64(int(out[i - 1]) + delta)
    return out


def encode_chunk(ts: np.ndarray, values: np.ndarray) -> tuple[bytes, bytes, float]:
    """Encode one (timestamps, values) chunk; returns
    (ts_bytes, value_bytes, bytes_per_point)."""
    tb = encode_timestamps(ts)
    vb = encode_floats(values)
    n = max(1, len(values))
    return tb, vb, (len(tb) + len(vb)) / n


def decode_chunk(ts_bytes: bytes, value_bytes: bytes) -> tuple[np.ndarray, np.ndarray]:
    return decode_timestamps(ts_bytes), decode_floats(value_bytes)
