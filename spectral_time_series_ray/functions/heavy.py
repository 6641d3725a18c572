"""Misra-Gries heavy-hitters summary — mergeable frequent-items
sketch (Misra & Gries 1982; merge rule from Agarwal et al. 2013,
public algorithms).

Guarantees for a size-k summary over n items (preserved under merge):
every item with true count > n/k is present, and every reported count
undercounts by at most n/k. The engine use: per-block summaries of
O(k) counters shuffle instead of per-item counts — frequent-token /
hot-key detection over corpora whose vocabulary would not fit a
groupby.
"""

from __future__ import annotations

import numpy as np


def mg_summarize(values: np.ndarray, k: int) -> dict:
    """One-pass Misra-Gries over a batch: at most ``k`` counters.
    Vectorized pre-count (unique) then counter-space decrement."""
    vals, counts = np.unique(np.asarray(values), return_counts=True)
    return mg_merge([dict(zip(vals.tolist(), counts.tolist()))], k)


def mg_merge(summaries: list[dict], k: int) -> dict:
    """Merge Misra-Gries summaries: sum counters, then if more than
    ``k`` remain, subtract the (k+1)-th largest count from all and
    drop non-positive (the mergeable-summaries rule — error bounds
    add)."""
    acc: dict = {}
    for s in summaries:
        for item, c in s.items():
            acc[item] = acc.get(item, 0) + int(c)
    if len(acc) <= k:
        return acc
    counts = np.sort(np.fromiter(acc.values(), dtype=np.int64))[::-1]
    dec = int(counts[k])  # (k+1)-th largest
    return {item: c - dec for item, c in acc.items() if c - dec > 0}


def mg_error_bound(n_total: int, k: int) -> float:
    """Upper bound on undercount: n/k regardless of merge tree shape
    (errors add but total decrements are bounded by n/k)."""
    return n_total / k
