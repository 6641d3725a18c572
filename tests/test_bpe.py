"""Tests for the BPE training/encoding kernels."""

import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.functions.bpe import (
    END,
    bpe_encode_word,
    bpe_token_count_for_freq,
    bpe_train,
)


def test_bpe_train_known_corpus():
    # classic Sennrich example shape: 'l o w' dominates -> merge (l, o)
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train(wf, n_merges=4)
    assert len(merges) == 4
    # 'e s' occurs 9x (newest+widest), 'l o'/'o w' 7x, 'es t' after merge
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")


def test_bpe_encode_applies_ranks_in_order():
    wf = {"abab": 10}
    merges = bpe_train(wf, n_merges=3)
    ranks = {m: i for i, m in enumerate(merges)}
    syms = bpe_encode_word("abab", ranks)
    # training on the same word must compress it to a single symbol
    assert syms == ["abab" + END] or len(syms) <= 3


def test_bpe_token_count_identity():
    wf = {"spark": 4, "sparks": 2, "park": 3, "a": 7}
    merges = bpe_train(wf, n_merges=6)
    ranks = {m: i for i, m in enumerate(merges)}
    total = bpe_token_count_for_freq(wf, ranks)
    naive = sum(c * len(bpe_encode_word(w, ranks)) for w, c in wf.items())
    assert total == naive
    # compression: tokens never exceed chars+1 per word, never below 1
    assert sum(c for c in wf.values()) <= total


def test_bpe_deterministic_tie_break():
    # all pairs occur equally often -> lexicographically smallest first
    wf = {"ab": 2, "cd": 2}
    merges = bpe_train(wf, n_merges=1)
    assert merges[0] == ("a", "b")


def test_bpe_train_stops_when_dry():
    assert bpe_train({"xy": 1}, n_merges=10) == []  # no pair reaches count 2


@pytest.mark.usefixtures("ray_session")
def test_distributed_word_frequencies_match_local():
    import ray.data

    from spectral_time_series_ray.stages.text import word_frequencies

    docs = pd.DataFrame(
        {"text": ["a b b c", "b c  c", "", "a"]}
    )
    wf = (
        word_frequencies(ray.data.from_pandas(docs).repartition(3))
        .to_pandas()
        .set_index("word")["n"]
        .sort_index()
    )
    assert wf.to_dict() == {"a": 2, "b": 3, "c": 3}
