"""Deduplication stages over the ``documents`` table.

Five public-algorithm variants (ray_guide.md "Aggregation at scale"
dedup patterns; MMDS ch.3):

- :func:`exact_dedup` — content hash per batch (vectorized), hash-
  partitioned ``groupby`` keeping the min doc_id per distinct text.
- :func:`minhash_lsh_dedup` — shingle -> MinHash signature -> banded
  LSH buckets -> candidate pairs -> signature-estimated Jaccard verify
  -> connected components -> keep min doc_id per cluster.
- :func:`simhash_dedup` — 64-bit SimHash, banded by 16-bit chunks,
  Hamming-distance verify.
- :func:`ngram_jaccard_pairs` — exact n-gram Jaccard for candidate
  pairs (the verify kernel, usable standalone at small scale).
- embedding-cosine near-dup lives in ``similarity.py``.

Scale notes: signatures are fixed-width (num_perm * 8 B); the band
explosion multiplies rows by #bands but each row is (band, key,
doc_id) — this is the shuffle. Candidate-pair verification uses the
signature map broadcast via ``ray.put`` (at cluster scale, replace
with a hash join of pairs against the signature dataset on doc_id).
Connected components run driver-side over the verified near-dup pair
list, which is sparse by construction (union-find; bounded rounds).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.hashing import MinHasher, fnv1a_u64, hamming64, shingle_hashes, simhash64


def _text_hash_batch(batch: pd.DataFrame) -> pd.DataFrame:
    batch = batch.copy()
    batch["text_hash"] = fnv1a_u64(batch["text"].tolist()).astype(np.int64)
    return batch


def exact_dedup(ds, id_col: str = "doc_id"):
    """One keeper (min id) per distinct text. Returns
    (doc_id, n_dups, text_hash).

    The hash-partitioned groupby moves only (hash, id, text); within a
    group exact text equality guards against hash collisions.
    """
    ds = ds.map_batches(_text_hash_batch, batch_format="pandas", batch_size=None)
    ds = ds.select_columns([id_col, "text", "text_hash"])

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for text, sub in g.groupby("text", sort=True):
            rows.append(
                {
                    id_col: int(sub[id_col].min()),
                    "n_dups": len(sub),
                    "text_hash": int(g["text_hash"].iloc[0]),
                }
            )
        return pd.DataFrame(rows)

    return ds.groupby("text_hash").map_groups(keep_first, batch_format="pandas")


class _MinHashStage:
    """Actor: MinHash permutations generated once per actor."""

    def __init__(self, num_perm: int, bands: int, shingle_n: int, seed: int):
        self.mh = MinHasher(num_perm=num_perm, bands=bands, seed=seed)
        self.shingle_n = shingle_n

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = []
        for t in batch["text"]:
            sh = shingle_hashes(t.split(), n=self.shingle_n)
            sigs.append(self.mh.signature(sh).astype(np.int64))
        out = batch[["doc_id"]].copy()
        out["signature"] = sigs
        return out


def minhash_signatures(ds, num_perm=128, bands=16, shingle_n=3, seed=42, concurrency=4):
    return ds.map_batches(
        _MinHashStage,
        fn_constructor_args=(num_perm, bands, shingle_n, seed),
        batch_format="pandas",
        batch_size=1024,
        concurrency=concurrency,
    )


def _explode_bands(bands: int, rows: int):
    def f(batch: pd.DataFrame) -> pd.DataFrame:
        mh_bands = []
        for sig in batch["signature"]:
            sig = np.asarray(sig, dtype=np.int64).view(np.uint64)
            mh = MinHasher.__new__(MinHasher)
            mh.bands, mh.rows = bands, rows
            mh_bands.append(mh.band_keys(sig).astype(np.int64))
        n = len(batch)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(batch["doc_id"].to_numpy(), bands),
                "band_id": np.tile(np.arange(bands, dtype=np.int32), n),
                "band_key": np.concatenate(mh_bands) if n else np.array([], np.int64),
            }
        )

    return f


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    ids = np.sort(g["doc_id"].unique())
    if len(ids) < 2 or len(ids) > 200:  # degenerate bucket guard
        return pd.DataFrame({"a": [], "b": []})
    a, b = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"a": ids[a], "b": ids[b]})


def union_find_clusters(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Driver-side union-find over the sparse near-dup pair list."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def minhash_lsh_dedup(
    ds,
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    concurrency: int = 4,
):
    """Full MinHash-LSH near-dup pipeline. Returns a pandas DataFrame
    (doc_id, cluster_id, is_keeper) covering docs in near-dup clusters.
    """
    import ray

    sigs = minhash_signatures(
        ds, num_perm=num_perm, bands=bands, shingle_n=shingle_n, seed=seed,
        concurrency=concurrency,
    ).materialize()
    exploded = sigs.map_batches(
        _explode_bands(bands, num_perm // bands), batch_format="pandas"
    )
    pairs_ds = exploded.groupby(["band_id", "band_key"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )
    pairs = pairs_ds.to_pandas().drop_duplicates()

    # verify candidates with signature-estimated Jaccard (broadcast map;
    # at cluster scale: hash-join pairs against sigs on doc_id instead)
    sig_map = {
        int(r["doc_id"]): np.asarray(r["signature"], dtype=np.int64).view(np.uint64)
        for r in sigs.take_all()
    }
    keep = []
    for a, b in zip(pairs["a"], pairs["b"]):
        est = float((sig_map[int(a)] == sig_map[int(b)]).mean())
        if est >= threshold:
            keep.append((int(a), int(b)))
    clusters = union_find_clusters(keep)
    if not clusters:
        return pd.DataFrame({"doc_id": [], "cluster_id": [], "is_keeper": []})
    df = pd.DataFrame(
        {"doc_id": list(clusters), "cluster_id": [clusters[d] for d in clusters]}
    ).sort_values("doc_id")
    df["is_keeper"] = df["doc_id"] == df["cluster_id"]
    return df.reset_index(drop=True)


class _SimHashStage:
    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["doc_id"]].copy()
        out["simhash"] = [
            np.uint64(simhash64(fnv1a_u64(t.split()))).astype(np.int64)
            for t in batch["text"]
        ]
        return out


def simhash_dedup(ds, max_hamming: int = 3, concurrency: int = 4):
    """SimHash near-dup: band the 64-bit hash into 4x16-bit keys (any
    pair within Hamming<=3 shares at least one band by pigeonhole),
    verify Hamming distance in-bucket. Returns (doc_id, cluster_id,
    is_keeper)."""
    hashes = ds.map_batches(
        _SimHashStage, batch_format="pandas", batch_size=2048, concurrency=concurrency
    ).materialize()

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
        n = len(batch)
        parts = []
        for band in range(4):
            key = ((h >> np.uint64(16 * band)) & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(
                pd.DataFrame(
                    {
                        "doc_id": batch["doc_id"].to_numpy(),
                        "simhash": batch["simhash"].to_numpy(),
                        "band_id": np.full(n, band, np.int32),
                        "band_key": key,
                    }
                )
            )
        return pd.concat(parts, ignore_index=True)

    exploded = hashes.map_batches(explode, batch_format="pandas", batch_size=None)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) < 2 or len(g) > 500:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
        ai, bi = np.triu_indices(len(ids), k=1)
        hd = hamming64(hs[ai], hs[bi])
        return pd.DataFrame({"a": ids[ai], "b": ids[bi], "hamming": hd})

    pairs = (
        exploded.groupby(["band_id", "band_key"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(["a", "b"])
    )
    near = pairs[pairs["hamming"] <= max_hamming]
    clusters = union_find_clusters(list(zip(near["a"].astype(int), near["b"].astype(int))))
    if not clusters:
        return pd.DataFrame({"doc_id": [], "cluster_id": [], "is_keeper": []})
    df = pd.DataFrame(
        {"doc_id": list(clusters), "cluster_id": [clusters[d] for d in clusters]}
    ).sort_values("doc_id")
    df["is_keeper"] = df["doc_id"] == df["cluster_id"]
    return df.reset_index(drop=True)


def ngram_jaccard_pairs(texts_by_id: dict[int, str], pairs, shingle_n: int = 3) -> pd.DataFrame:
    """Exact n-gram Jaccard for given candidate pairs (verify kernel)."""
    cache: dict[int, set] = {}

    def sh(i):
        if i not in cache:
            cache[i] = set(shingle_hashes(texts_by_id[i].split(), n=shingle_n).tolist())
        return cache[i]

    rows = []
    for a, b in pairs:
        sa, sb = sh(a), sh(b)
        union = len(sa | sb)
        rows.append(
            {"a": a, "b": b, "jaccard": (len(sa & sb) / union) if union else 0.0}
        )
    return pd.DataFrame(rows)
