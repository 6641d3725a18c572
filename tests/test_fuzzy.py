"""Fuzzy ED<=1 join: kernel exactness, blocking completeness, stage
end-to-end vs a brute-force reference."""

import itertools
import random

import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.functions.editdist import (
    deletion_keys,
    ed_leq1_verify,
    pack_words,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _vocab(seed: int, n: int, alpha: str = "abcde", max_len: int = 8):
    rng = random.Random(seed)
    return sorted({
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, max_len)))
        for _ in range(n)
    })


def test_pack_words_roundtrip():
    words = ["", "a", "abc", "zzzz"]
    mat, lens = pack_words(words)
    assert lens.tolist() == [0, 1, 3, 4]
    assert bytes(mat[2, :3]) == b"abc"
    assert mat[1, 1:].max() == 0  # zero padding


def test_verify_matches_levenshtein_exhaustive():
    vocab = _vocab(7, 300)
    pairs = list(itertools.combinations(vocab, 2)) + [(w, w) for w in vocab[:5]]
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = ed_leq1_verify(a, b)
    exp = np.array([_lev(x, y) <= 1 for x, y in pairs])
    assert (got == exp).all()


def test_verify_handles_any_length_gap():
    got = ed_leq1_verify(
        ["abc", "abc", "abc", "", "a"],
        ["abcde", "abcd", "xabc", "ab", "a"],
    )
    # gap 2 -> False even though a splice exists; gap 1 splice -> True
    assert got.tolist() == [False, True, True, False, True]


def test_blocking_complete_for_ed1():
    vocab = _vocab(13, 250)
    idx, keys = deletion_keys(vocab)
    buckets: dict[int, set] = {}
    for i, k in zip(idx, keys):
        buckets.setdefault(int(k), set()).add(int(i))
    covered = set()
    for members in buckets.values():
        for i in members:
            for j in members:
                if i < j:
                    covered.add((i, j))
    for i in range(len(vocab)):
        for j in range(i + 1, len(vocab)):
            if _lev(vocab[i], vocab[j]) <= 1:
                assert (i, j) in covered, (vocab[i], vocab[j])


def test_stage_end_to_end_vs_brute_force(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.fuzzy import fuzzy_ed1_self_join

    vocab = _vocab(29, 120, alpha="abc", max_len=6)
    # duplicates in the column must not duplicate pairs
    rows = vocab * 2 + vocab[:10]
    ds = ray.data.from_pandas(pd.DataFrame({"name": rows}))
    got = (
        fuzzy_ed1_self_join(ds, "name", num_partitions=5)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        [(u, v) for u, v in itertools.combinations(vocab, 2) if _lev(u, v) <= 1],
        columns=["a", "b"],
    )
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True))


def test_stage_oversized_bucket_caps_not_crashes(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.fuzzy import fuzzy_ed1_self_join

    # 30 distinct words all sharing the deletion key "x" * 3
    words = ["xxx" + c for c in "abcdefghijklmnopqrstuvwxyz1234"]
    ds = ray.data.from_pandas(pd.DataFrame({"name": words}))
    out = fuzzy_ed1_self_join(ds, "name", num_partitions=3, bucket_cap=10).to_pandas()
    # capped: fewer pairs than the full C(30,2), but every emitted pair real
    assert 0 < len(out) <= 45
    for u, v in zip(out["a"], out["b"]):
        assert _lev(u, v) <= 1
