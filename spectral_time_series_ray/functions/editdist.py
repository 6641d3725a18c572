"""Vectorized edit-distance-:math:`\\le 1` kernels for the fuzzy join.

Blocking is the deletion-neighborhood scheme (FastSS, Bocek et al.
2007 "Fast Similarity Search in Large Dictionaries"): two strings at
Levenshtein distance <= 1 always share an element of
``{w} | {w minus one char}`` —

- equal length, one substitution at i: deleting i from both yields the
  same string;
- lengths n/n+1, one insertion: deleting the inserted char from the
  longer yields the shorter (its identity key).

Sharing a key only bounds the distance by 2 (two different deletions
can collide), so candidates are verified by :func:`ed_leq1_verify`, a
banded check that never materializes a DP matrix: strings at distance
<= 1 either differ in exactly one aligned position (equal length) or
the longer equals the shorter with one char spliced in (length gap 1).

All kernels are column-wise numpy over fixed-width byte matrices — no
per-row Python. Words are compared as UTF-8 bytes; a multi-byte
codepoint edit counts as its byte edits (documented contract; exact
for ASCII vocabularies like ids/names/tokens).

The reference has no fuzzy matching (SURVEY.md §2 has no
edit-distance row); this is part of the beyond-reference cleaning
toolkit (typo-variant entity resolution) the 100 TB pipeline needs.
"""

from __future__ import annotations

import numpy as np

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def pack_words(words) -> tuple[np.ndarray, np.ndarray]:
    """UTF-8 byte matrix of ``words``: (mat (n, L) uint8 zero-padded,
    byte lengths (n,) int64). L is the max byte length in the input."""
    b = np.char.encode(np.asarray(words, dtype="U"), "utf-8")
    lens = np.char.str_len(b).astype(np.int64)
    width = max(int(b.dtype.itemsize), 1)
    mat = np.frombuffer(
        b.astype(f"S{width}").tobytes(), dtype=np.uint8
    ).reshape(len(b), width)
    return mat, lens


def _row_fnv(mat: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """FNV-1a over each row's first ``lens[i]`` bytes, column-wise.
    Padding bytes must not contribute: columns past a row's length
    leave its hash untouched."""
    h = np.full(len(mat), _FNV_OFFSET, dtype=np.uint64)
    for j in range(mat.shape[1]):
        live = lens > j
        if not live.any():
            break
        hj = (h ^ mat[:, j].astype(np.uint64)) * _FNV_PRIME
        h = np.where(live, hj, h)
    return h


def deletion_keys(words) -> tuple[np.ndarray, np.ndarray]:
    """(row index into ``words``, uint64 key) for every element of each
    word's deletion neighborhood INCLUDING the word itself. Keys are
    FNV-1a hashes of the (deleted) byte strings, so a deletion of a
    longer word and the identity key of the shorter word it equals
    hash identically. Hash collisions between different strings only
    add candidates (verified later), never drop true pairs."""
    mat, lens = pack_words(words)
    n, width = mat.shape
    idx_parts = [np.arange(n, dtype=np.int64)]
    key_parts = [_row_fnv(mat, lens)]
    for i in range(width):
        rows = np.flatnonzero(lens > i)
        if not len(rows):
            break
        sub = np.concatenate([mat[rows, :i], mat[rows, i + 1:]], axis=1)
        idx_parts.append(rows)
        key_parts.append(_row_fnv(sub, lens[rows] - 1))
    return np.concatenate(idx_parts), np.concatenate(key_parts)


def ed_leq1_verify(a_words, b_words) -> np.ndarray:
    """Exact ``levenshtein(a, b) <= 1`` per pair, vectorized.

    Works for ANY byte-length gap (pairs with gap > 1 or equal strings
    are decided directly), so callers can feed raw candidate pairs.
    """
    a_words = np.asarray(a_words, dtype="U")
    b_words = np.asarray(b_words, dtype="U")
    n = len(a_words)
    out = np.zeros(n, dtype=bool)
    if not n:
        return out
    A, la = pack_words(a_words)
    B, lb = pack_words(b_words)
    width = max(A.shape[1], B.shape[1]) + 1  # room for the shifted compare
    A = np.pad(A, ((0, 0), (0, width - A.shape[1])))
    B = np.pad(B, ((0, 0), (0, width - B.shape[1])))
    # orient so the (possibly) shorter string is S, the longer L
    swap = la > lb
    S = np.where(swap[:, None], B, A)
    L = np.where(swap[:, None], A, B)
    ls, ll = np.minimum(la, lb), np.maximum(la, lb)
    gap = ll - ls
    cols = np.arange(width, dtype=np.int64)[None, :]

    # --- gap 0: exactly zero or one aligned mismatch ---------------
    neq = (S != L) & (cols < ls[:, None])
    n_mm = neq.sum(axis=1)
    out[gap == 0] = n_mm[gap == 0] <= 1

    # --- gap 1: L == S with one byte spliced in at the first
    # mismatch position k: S[k:] must equal L[k+1:] ------------------
    g1 = np.flatnonzero(gap == 1)
    if len(g1):
        Sg, Lg = S[g1], L[g1]
        lsg = ls[g1]
        # first aligned mismatch; padding makes position lsg a
        # guaranteed mismatch (S pad byte 0 vs a live L byte), so k
        # always exists and k <= lsg
        neq_g = (Sg != Lg) & (cols <= lsg[:, None])
        k = np.argmax(neq_g, axis=1)
        # suffix_ok[i] = all(S[j] == L[j+1] for j in [k, ls))
        shifted_eq = (Sg[:, :-1] == Lg[:, 1:]) | (cols[:, :-1] >= lsg[:, None])
        sfx = np.minimum.accumulate(shifted_eq[:, ::-1], axis=1)[:, ::-1]
        out[g1] = np.take_along_axis(
            np.pad(sfx, ((0, 0), (0, 1)), constant_values=True),
            np.minimum(k, lsg)[:, None], axis=1,
        )[:, 0]
    return out
