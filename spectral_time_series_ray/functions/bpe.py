"""Byte-pair-encoding tokenizer training on a word-frequency table
(Sennrich, Haddow & Birch, "Neural Machine Translation of Rare Words
with Subword Units", ACL 2016 — the word-count formulation: BPE's
statistics depend only on the corpus word HISTOGRAM, so the distributed
part of training is one word-count aggregation and the merge loop runs
on a vocabulary-bounded table, never the corpus).

Pure deterministic kernels — ties in pair counts break on the
lexicographically smallest pair, so training is reproducible across
partitionings and runs.
"""

from __future__ import annotations

from collections import Counter


END = "</w>"  # end-of-word marker (Sennrich §3.2)


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (END,)


def bpe_train(word_freq: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merges from a word histogram.

    Each iteration merges the most frequent adjacent symbol pair
    (ties: lexicographically smallest pair) across all words, weighted
    by word frequency.  Stops early when no pair occurs twice.
    """
    vocab = {_word_symbols(w): int(c) for w, c in word_freq.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms[:-1], syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        pair = best[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize one word by applying merges in rank order (lowest rank
    first) until no learned pair remains — the standard BPE inference
    loop."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, (a, b) in enumerate(zip(syms[:-1], syms[1:])):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_token_count_for_freq(word_freq: dict[str, int],
                             ranks: dict[tuple[str, str], int]) -> int:
    """Total corpus token count implied by the histogram — the exact
    identity the distributed apply pass is checked against."""
    return sum(c * len(bpe_encode_word(w, ranks)) for w, c in word_freq.items() if w)
