"""Exact set-similarity join (prefix filtering) + chained-join dtype
regression."""

import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.functions.hashing import shingle_hashes
from spectral_time_series_ray.stages.dedup import ssjoin_prefix
from spectral_time_series_ray.stages.join import partition_merge_join

VOCAB = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lam mu nu xi omicron pi rho sigma tau upsilon").split()


def _mk_docs(n=60, seed=3):
    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(VOCAB, size=30)) for _ in range(n)]
    # planted near-dups: one word changed (high jaccard), one shuffled
    # suffix (moderate), one exact copy
    base = texts[0].split()
    texts.append(" ".join(base[:-1] + ["OMEGA"]))      # ~high overlap
    texts.append(texts[1])                              # exact dup of 1
    mid = texts[2].split()
    texts.append(" ".join(mid[:20] + list(rng.choice(VOCAB, size=10))))
    return pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                         "text": texts})


def _brute(df, t, n=3):
    sig = {}
    for d, txt in zip(df.doc_id, df.text):
        toks = txt.split()
        if len(toks) >= n:
            sig[int(d)] = shingle_hashes(toks, n)
    out = []
    ids = sorted(sig)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            inter = len(np.intersect1d(sig[a], sig[b], assume_unique=True))
            u = len(sig[a]) + len(sig[b]) - inter
            if u and inter / u >= t:
                out.append((a, b, inter / u))
    return sorted(out)


@pytest.mark.parametrize("t", [0.4, 0.6, 0.8])
def test_ssjoin_exact_recall_and_precision(ray_session, t):
    import ray.data

    df = _mk_docs()
    got = ssjoin_prefix(
        ray.data.from_pandas(df), threshold=t, shingle_n=3
    ).to_pandas()
    got_pairs = sorted(
        (int(a), int(b), float(j))
        for a, b, j in zip(got.get("a", []), got.get("b", []), got.get("jaccard", []))
    )
    exp = _brute(df, t)
    assert [(a, b) for a, b, _ in got_pairs] == [(a, b) for a, b, _ in exp]
    for (_, _, jg), (_, _, je) in zip(got_pairs, exp):
        assert abs(jg - je) < 1e-12


def test_ssjoin_short_docs_excluded(ray_session):
    import ray.data

    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                       "text": ["a b", "a b", "one two three four", "one two three four"]})
    got = ssjoin_prefix(ray.data.from_pandas(df), threshold=0.9).to_pandas()
    # the 2-token docs have no 3-gram shingles -> only the long pair
    assert len(got) == 1 and int(got.iloc[0]["a"]) == 2 and int(got.iloc[0]["b"]) == 3


def test_chained_partition_merge_join_keeps_key_dtype(ray_session):
    """Regression: join #1 None-fills the other side's columns, which
    used to promote an int64 PAYLOAD column to object in the output;
    join #2 keyed on that column then hash-partitioned objects vs int64
    and silently dropped matching rows."""
    import ray.data

    n = 500
    left = ray.data.from_pandas(pd.DataFrame({
        "a": np.arange(n, dtype=np.int64),
        "b": np.arange(n, dtype=np.int64)[::-1].copy()}))
    ra = ray.data.from_pandas(pd.DataFrame({
        "a": np.arange(n, dtype=np.int64), "pa": np.arange(n, dtype=np.int64) * 2}))
    rb = ray.data.from_pandas(pd.DataFrame({
        "b": np.arange(n, dtype=np.int64), "pb": np.arange(n, dtype=np.int64) * 3}))
    j1 = partition_merge_join(left, ra, on="a", how="inner", num_partitions=8)
    j2 = partition_merge_join(j1, rb, on="b", how="inner", num_partitions=8)
    out = j2.to_pandas()
    assert len(out) == n
    assert (out["pb"].to_numpy(np.int64) == out["b"].to_numpy(np.int64) * 3).all()
