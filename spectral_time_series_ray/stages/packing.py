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


def context_windows(
    ds,
    max_tokens: int = 512,
    key: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    start_role: str = "user",
    num_partitions: int | None = None,
):
    """Assemble per-conversation TRAINING CONTEXT WINDOWS under a token
    budget — the finetune-sample builder an LLM data pipeline runs over
    chat transcripts: greedy contiguous packing of turns (order
    preserved) into windows with ``sum(tokens) <= max_tokens``; each
    window reports whether it opens on a ``start_role`` turn
    (chat-template convention — callers filter or re-cut on it).

    Scale path: token counts are computed VECTORIZED per batch before
    the exchange (compiled BPE-ish pre-tokenizer), so the conv-hash
    shuffle moves only (conv, turn, role, n_tokens) narrow rows — the
    text column never shuffles; the window assembly is a per-key O(n)
    scan inside each partition. A single turn longer than the budget
    becomes its own over-budget singleton flagged ``oversize`` (the
    caller decides truncate-vs-drop), so token conservation holds
    exactly: sum over windows == sum over turns.

    Returns one row per window: (key, window_idx, start_turn,
    end_turn_excl, n_turns, n_tokens, starts_on_role, oversize).
    """
    import pyarrow as pa

    from ..functions.textstats import BPE_RE
    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)

    class TokenCount:
        def __init__(self):
            self._re = BPE_RE

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            rx = self._re
            toks = np.fromiter(
                (len(rx.findall(t)) for t in batch[text_col]),
                dtype=np.int64, count=len(batch),
            )
            out = pd.DataFrame({
                key: batch[key],
                order_col: batch[order_col].to_numpy(np.int64),
                role_col: batch[role_col],
                "n_tokens": toks,
            })
            out["_part"] = (
                pd.util.hash_pandas_object(out[key], index=False).to_numpy() % P
            ).astype(np.int32)
            return out

    narrow = ds.select_columns([key, order_col, role_col, text_col]).map_batches(
        TokenCount, batch_format="pandas", batch_size=1024, concurrency=4
    )

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                key: pd.Series([], dtype=object),
                "window_idx": pd.Series([], dtype=np.int64),
                "start_turn": pd.Series([], dtype=np.int64),
                "end_turn_excl": pd.Series([], dtype=np.int64),
                "n_turns": pd.Series([], dtype=np.int64),
                "n_tokens": pd.Series([], dtype=np.int64),
                "starts_on_role": pd.Series([], dtype=bool),
                "oversize": pd.Series([], dtype=bool),
            })
        codes, uniques = pd.factorize(df[key], sort=False)
        order = np.lexsort((df[order_col].to_numpy(), codes))
        codes_s = codes[order]
        turn = df[order_col].to_numpy(np.int64)[order]
        tok = df["n_tokens"].to_numpy(np.int64)[order]
        is_start_role = (df[role_col].to_numpy() == start_role)[order]
        new_key = np.empty(len(df), dtype=bool)
        new_key[0] = True
        new_key[1:] = codes_s[1:] != codes_s[:-1]
        starts = np.flatnonzero(new_key)
        ends = np.append(starts[1:], len(df))
        rows = []
        for lo, hi in zip(starts, ends):
            cid = uniques[codes_s[lo]]
            widx = 0
            i = lo
            while i < hi:
                if tok[i] > max_tokens:
                    rows.append((cid, widx, turn[i], turn[i] + 1, 1, int(tok[i]),
                                 bool(is_start_role[i]), True))
                    widx += 1
                    i += 1
                    continue
                # greedy fill
                j, acc = i, 0
                while j < hi and acc + tok[j] <= max_tokens:
                    acc += int(tok[j])
                    j += 1
                rows.append((cid, widx, turn[i], turn[j - 1] + 1, j - i, acc,
                             bool(is_start_role[i]), False))
                widx += 1
                i = j
        return pd.DataFrame(rows, columns=[
            key, "window_idx", "start_turn", "end_turn_excl", "n_turns",
            "n_tokens", "starts_on_role", "oversize",
        ]).astype({"window_idx": np.int64, "start_turn": np.int64,
                   "end_turn_excl": np.int64, "n_turns": np.int64,
                   "n_tokens": np.int64})

    return narrow.groupby("_part").map_groups(assemble, batch_format="pandas")


def sft_pairs(
    ds,
    key: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    prompt_role: str = "user",
    response_role: str = "assistant",
    num_partitions: int | None = None,
):
    """Extract (prompt, response) supervised-finetuning pairs from chat
    transcripts: every ``response_role`` turn pairs with the NEAREST
    PRECEDING ``prompt_role`` turn of the same conversation under
    stable ``order_col`` ordering (intervening tool / assistant turns
    are skipped over — the chat-template convention); response turns
    with no earlier prompt turn are dropped.

    Scale path: both texts must co-locate per conversation, so the
    corpus makes exactly ONE conv-hash exchange (any join-back
    realization that ships only metadata first still has to re-shuffle
    the text side at least once to attach it — strictly more exchange
    volume). Pairing inside each partition is vectorized: factorize +
    lexsort + a single running-maximum over prompt positions with a
    group-start guard — no Python loop over rows.

    Returns one row per pair: (key, prompt_turn_idx, response_turn_idx,
    prompt_text, response_text, prompt_hash, response_hash). The hashes
    are FNV-1a over the EMITTED texts, computed after the exchange, so
    joining them back against pre-exchange per-turn hashes proves
    per-turn text equality end-to-end (the north-rule invariant).
    """
    from ..functions.hashing import fnv1a_u64
    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[key, order_col, role_col, text_col]].copy()
        out["_part"] = (
            pd.util.hash_pandas_object(out[key], index=False).to_numpy() % P
        ).astype(np.int32)
        return out

    tagged = ds.select_columns([key, order_col, role_col, text_col]).map_batches(
        tag, batch_format="pandas", batch_size=None
    )

    empty = pd.DataFrame({
        key: pd.Series([], dtype=object),
        "prompt_turn_idx": pd.Series([], dtype=np.int64),
        "response_turn_idx": pd.Series([], dtype=np.int64),
        "prompt_text": pd.Series([], dtype=object),
        "response_text": pd.Series([], dtype=object),
        "prompt_hash": pd.Series([], dtype=np.int64),
        "response_hash": pd.Series([], dtype=np.int64),
    })

    def pair(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return empty.copy()
        codes, uniques = pd.factorize(df[key], sort=False)
        order = np.lexsort((df[order_col].to_numpy(), codes))
        codes_s = codes[order]
        turn = df[order_col].to_numpy(np.int64)[order]
        role = df[role_col].to_numpy()[order]
        text = df[text_col].to_numpy()[order]

        n = len(df)
        pos = np.arange(n, dtype=np.int64)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = codes_s[1:] != codes_s[:-1]
        grp_start = pos[new_key][np.cumsum(new_key) - 1]  # group start per row

        is_prompt = role == prompt_role
        # running max of prompt positions; values leaked from a previous
        # group are < this group's start position, so the guard below
        # rejects them without a per-group reset
        last_prompt = np.maximum.accumulate(np.where(is_prompt, pos, -1))
        take = (role == response_role) & (last_prompt >= grp_start)
        if not take.any():
            return empty.copy()
        ppos = last_prompt[take]
        p_text = text[ppos]
        r_text = text[take]
        return pd.DataFrame({
            key: np.asarray(uniques)[codes_s[take]],
            "prompt_turn_idx": turn[ppos],
            "response_turn_idx": turn[take],
            "prompt_text": p_text,
            "response_text": r_text,
            "prompt_hash": fnv1a_u64(list(p_text)).view(np.int64),
            "response_hash": fnv1a_u64(list(r_text)).view(np.int64),
        })

    return tagged.groupby("_part").map_groups(pair, batch_format="pandas")
