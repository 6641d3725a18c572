"""Rank-association kernels over bounded joint histograms.

Kendall tau-b's pair counts collapse onto the JOINT HISTOGRAM of the
two (bounded-domain) variables: every unordered observation pair lands
in an (ordered) cell pair, so concordant / discordant totals are 2-D
suffix-sum dot products of cell counts — O(|domain_x| * |domain_y|)
work and memory, independent of the corpus size. Exact int64 end to
end (the engine's scale path for what a naive implementation does with
an O(n^2) self-join)."""

from __future__ import annotations

import numpy as np


def kendall_from_joint(H: np.ndarray):
    """Exact Kendall pair counts from a joint histogram.

    H[i, j] = number of observations with x == xs[i], y == ys[j]
    (xs, ys in strictly increasing order). Returns
    ``(concordant, discordant, n, n1, n2)`` where n1/n2 are the
    tie-pair counts sum t*(t-1)/2 over the x / y marginals.
    """
    H = np.asarray(H, dtype=np.int64)
    nx, ny = H.shape
    # suf[i, j] = sum of H over rows > i and cols > j
    pad = np.zeros((nx + 1, ny + 1), np.int64)
    pad[:-1, :-1] = H
    suf = np.cumsum(np.cumsum(pad[::-1, ::-1], 0), 1)[::-1, ::-1]
    conc = int((H * suf[1:, 1:]).sum())
    # rows > i, cols < j
    padl = np.zeros((nx + 1, ny + 1), np.int64)
    padl[:-1, 1:] = H
    sufl = np.cumsum(np.cumsum(padl[::-1], 0), 1)[::-1]
    disc = int((H * sufl[1:, :-1]).sum())
    n = int(H.sum())
    tx = H.sum(1)
    ty = H.sum(0)
    n1 = int((tx * (tx - 1) // 2).sum())
    n2 = int((ty * (ty - 1) // 2).sum())
    return conc, disc, n, n1, n2


def tau_b(conc: int, disc: int, n: int, n1: int, n2: int) -> float:
    """Tau-b from exact pair counts; float conversion points mirror
    the oracle SQL (cast each factor to double, then multiply)."""
    n0 = n * (n - 1) // 2
    return (conc - disc) / float(
        np.sqrt(float(n0 - n1) * float(n0 - n2))
    )
