"""First-fit-decreasing sequence packing (batch assembly).

Re-expresses the reference's ``PackCollate.first_fit_decreasing_bin_
packing`` (`uni2ts/src/uni2ts/data/loader.py:103-209`: sort by length
desc at 141-143, first-fit at 147-158, ``sample_id`` labeling 1..n
with 0 = padding at 161-184) as a Ray Data stage: each BLOCK packs its
own sequences — exactly how a distributed loader shards the packing
problem; no shuffle is needed because bins never span workers.

The reference's headline claim for this operator is padding reduction
61% -> 0.38% (CLAUDE.md:153, recorded in BASELINE.md); the
``packing_stats`` summary reports the same two numbers (naive vs
packed padding fraction) so the claim is checkable per run.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def ffd_pack(
    lengths: np.ndarray, max_length: int
) -> tuple[np.ndarray, np.ndarray]:
    """First-fit-decreasing bin packing of ``lengths`` into bins of
    capacity ``max_length``. Returns ``(bin_id, sample_id)`` aligned to
    the INPUT order; ``sample_id`` is the 1-based slot of the sequence
    within its bin (reference loader.py:161-184 labeling; 0 is
    reserved for padding tokens downstream).

    Sequences longer than ``max_length`` raise — the reference crops
    upstream (PatchCrop max_patches); callers must too.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    if (lengths > max_length).any():
        raise ValueError("sequence longer than max_length; crop upstream")
    if (lengths <= 0).any():
        raise ValueError("non-positive sequence length")
    n = len(lengths)
    order = np.argsort(-lengths, kind="stable")  # decreasing, stable
    bin_of = np.empty(n, dtype=np.int64)
    slot_of = np.empty(n, dtype=np.int64)
    remaining = np.empty(n, dtype=np.int64)  # worst case: one bin each
    counts = np.zeros(n, dtype=np.int64)
    n_bins = 0
    for i in order:
        L = lengths[i]
        fits = remaining[:n_bins] >= L
        if fits.any():
            b = int(np.argmax(fits))  # FIRST fitting bin
        else:
            b = n_bins
            n_bins += 1
            remaining[b] = max_length
        remaining[b] -= L
        counts[b] += 1
        bin_of[i] = b
        slot_of[i] = counts[b]
    return bin_of, slot_of


def pack_bins(ds, max_length: int = 4096, length_col: str = "n_points"):
    """Per-block FFD packing: each block solves its own packing
    problem (``batch_size=None``) — the distributed analogue of the
    reference's per-collate packing; bins never span workers, so no
    shuffle.

    Emits the input columns plus ``bin_id`` (globally unique:
    ``<first row id in block>#<local bin>``), ``sample_id`` (1-based
    slot), and ``bin_fill`` (the bin's total length, same value on
    every member row).
    """

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            out = batch.copy()
            out["bin_id"] = pd.Series([], dtype=object)
            out["sample_id"] = pd.Series([], dtype=np.int64)
            out["bin_fill"] = pd.Series([], dtype=np.int64)
            return out
        lengths = batch[length_col].to_numpy(dtype=np.int64)
        bin_of, slot_of = ffd_pack(lengths, max_length)
        fill = np.bincount(bin_of, weights=lengths).astype(np.int64)
        # block tag from the FIRST ROW's unique id — every row belongs
        # to exactly one block, so first rows (hence tags) never collide
        if "conv_id" in batch and "chunk_idx" in batch:
            tag = f"{batch['conv_id'].iloc[0]}:{batch['chunk_idx'].iloc[0]}"
        else:  # no id columns: hash the first row's values
            tag = f"{int(pd.util.hash_pandas_object(batch.iloc[[0]], index=False).iloc[0]):x}"
        out = batch.copy()
        out["bin_id"] = [f"{tag}#{b}" for b in bin_of]
        out["sample_id"] = slot_of
        out["bin_fill"] = fill[bin_of]
        return out

    return ds.map_batches(fn, batch_format="pandas", batch_size=None)


def packing_stats(packed_df: pd.DataFrame, max_length: int) -> dict:
    """Padding fractions: naive (one sequence per max_length bin) vs
    packed (reference claim: 61% -> 0.38%, CLAUDE.md:153)."""
    total = int(packed_df["n_points"].sum())
    n_seqs = len(packed_df)
    n_bins = packed_df["bin_id"].nunique()
    return {
        "n_seqs": n_seqs,
        "n_bins": int(n_bins),
        "naive_padding_frac": 1.0 - total / max(1, n_seqs * max_length),
        "packed_padding_frac": 1.0 - total / max(1, n_bins * max_length),
    }
