"""Fuzzy (edit-distance <= 1) self-join over a string column.

The typo-variant entity-resolution operator: find every pair of
DISTINCT values at Levenshtein distance <= 1 — near-identical ids,
misspelled names, off-by-one-char tokens. The reference has no fuzzy
matching; this belongs to the beyond-reference cleaning toolkit
(SURVEY.md §2 extension surface) a 100 TB corpus needs before exact
keys can be trusted.

Scale shape (two bounded exchanges, no driver state):

1. every batch expands its values into deletion-neighborhood keys
   (``functions/editdist.deletion_keys`` — FastSS blocking, complete
   for ED <= 1 by the pigeonhole argument in that module) and tags
   each (key, word) row with ``hash(key) % P``;
2. ONE exchange co-locates equal keys; each partition runs a
   segmented triu expansion over the DISTINCT words per key (the
   `_banded_bucket_pairs` pattern in dedup.py) and verifies
   candidates in-place with the vectorized banded check
   (``ed_leq1_verify``) — only TRUE pairs leave the partition;
3. a second, sparse exchange on ``hash(a|b)`` dedups pairs that
   surfaced under several shared keys.

Shuffle 1 carries ``sum(len(w)+1)`` fixed-shape rows (vocab x avg
length — corpus-independent once upstream distinct'd); shuffle 2 only
verified pairs. Duplicate values never amplify a bucket: each segment
dedups its words before the triu expansion, so bucket size is the
count of DISTINCT words sharing a deletion key — bounded by alphabet
x length for natural vocabularies. A genuinely oversized bucket is
capped at ``bucket_cap`` distinct words WITH a warning (the dedup.py
convention: degrade loudly, never silently).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from ..functions.editdist import deletion_keys, ed_leq1_verify
from ..functions.hashing import fnv1a_u64
from .rollup import partitions_for_input

log = logging.getLogger(__name__)

_EMPTY = pd.DataFrame({"a": pd.Series([], dtype=object),
                       "b": pd.Series([], dtype=object)})


def fuzzy_ed1_self_join(
    ds,
    col: str,
    num_partitions: int | None = None,
    bucket_cap: int = 512,
):
    """All unordered pairs (a < b) of distinct ``col`` values with
    ``levenshtein(a, b) <= 1``. Returns a Dataset with string columns
    ``a`` and ``b`` (globally distinct)."""
    P = num_partitions or partitions_for_input(None)

    def expand(batch: pd.DataFrame) -> pd.DataFrame:
        words = pd.unique(batch[col].astype(str))
        if not len(words):
            return pd.DataFrame({
                "word": pd.Series([], dtype=object),
                "key": pd.Series([], dtype=np.int64),
                "_part": pd.Series([], dtype=np.int32),
            })
        idx, keys = deletion_keys(words)
        return pd.DataFrame({
            "word": words[idx],
            "key": keys.view(np.int64),
            "_part": ((keys >> np.uint64(17)) % np.uint64(P)).astype(np.int32),
        })

    exploded = ds.select_columns([col]).map_batches(
        expand, batch_format="pandas", batch_size=None
    )

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        key = g["key"].to_numpy(np.int64)
        word = g["word"].to_numpy(object)
        order = np.lexsort((word, key))
        key, word = key[order], word[order]
        new_seg = np.r_[True, key[1:] != key[:-1]]
        seg = np.flatnonzero(new_seg)
        seg_end = np.r_[seg[1:], len(key)]
        a_chunks, b_chunks = [], []
        for st, en in zip(seg, seg_end):
            w = word[st:en]
            # words arrive sorted within the segment: dedup is a shift
            w = w[np.r_[True, w[1:] != w[:-1]]] if en - st > 1 else w
            m = len(w)
            if m < 2:
                continue
            if m > bucket_cap:
                log.warning(
                    "fuzzy-ed1: capping oversized key bucket (%d distinct "
                    "words) to its first %d — recall may drop for this key",
                    m, bucket_cap,
                )
                w = w[:bucket_cap]
                m = bucket_cap
            ia, ib = np.triu_indices(m, k=1)
            a_chunks.append(w[ia])
            b_chunks.append(w[ib])
        if not a_chunks:
            return _EMPTY
        a = np.concatenate(a_chunks)
        b = np.concatenate(b_chunks)
        ok = ed_leq1_verify(a, b)
        if not ok.any():
            return _EMPTY
        out = pd.DataFrame({"a": a[ok], "b": b[ok]}).drop_duplicates()
        out["_part"] = (
            (fnv1a_u64([f"{x}|{y}" for x, y in zip(out["a"], out["b"])])
             >> np.uint64(23)) % np.uint64(P)
        ).astype(np.int32)
        return out

    verified = exploded.groupby("_part").map_groups(
        part_pairs, batch_format="pandas"
    )

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[["a", "b"]]

    return verified.groupby("_part").map_groups(dedup, batch_format="pandas")
