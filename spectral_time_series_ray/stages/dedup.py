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

Scale notes: signatures are fixed-width binary (num_perm * 8 B); the
band explosion multiplies rows by #bands but each row is (band, key,
doc_id) — this is the shuffle. Candidate-pair verification is fully
distributed: pairs are hash-joined twice against the signature Dataset
on doc_id (``Dataset.join``) and the signature-agreement estimate is
computed vectorized per batch. Only the VERIFIED pair list — sparse by
construction — reaches the driver, for union-find connected components
(bounded rounds). Oversized LSH buckets (hot keys) are skipped and
LOGGED, trading recall for boundedness.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

log = logging.getLogger(__name__)

from ..functions.hashing import MinHasher, fnv1a_u64, hamming64, shingle_hashes, simhash64

# process-level scratch for the MinHash permutation tile: Ray reuses
# worker processes across tasks, so one warm [num_perm, CH] buffer
# (16 MB) serves every batch — re-allocating it per batch paid ~25x
# the fill cost in first-touch page faults (mmap'd and returned to
# the OS on every free at this size)
_PERM_TILE: dict[tuple[int, int], np.ndarray] = {}


def _perm_tile_buffer(num_perm: int, ch: int) -> np.ndarray:
    buf = _PERM_TILE.get((num_perm, ch))
    if buf is None:
        buf = np.empty((num_perm, ch), np.uint64)
        _PERM_TILE[(num_perm, ch)] = buf
    return buf


def exact_dedup(ds, id_col: str = "doc_id"):
    """One keeper (min id) per distinct text. Returns
    (doc_id, n_dups, text_hash).

    Scale path: the shuffle carries ONLY fixed-width columns. Each
    batch hashes its texts TWICE with pandas' vectorized C SipHash
    under two independent 16-byte keys and pre-aggregates
    (min id, count) per 128-bit hash pair — duplicate payloads
    collapse before the exchange and the text column never leaves the
    scan. Two different texts merge only on a simultaneous 128-bit
    collision: at 10^12 docs the expected number of false merges is
    ~(10^12)^2 / 2^129 ≈ 1.5e-15 — accepted (and the collision,
    unlike a single-hash scheme, is detectable by carrying a third
    hash if ever needed). Both keys are fixed constants so hashes are
    deterministic across runs and workers.

    The merge shuffle is the repo-wide partition pattern: partials are
    hash-bucketed into ``n_parts`` int partitions and each partition
    re-aggregates its (hash-pair -> min id, count) rows in one
    vectorized pandas pass — the exchanged key domain is tiny and the
    per-group work never touches Python rows.
    """
    from .rollup import partitions_for_input

    n_parts = partitions_for_input(None)

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        h1 = (
            pd.util.hash_pandas_object(
                batch["text"], index=False, hash_key="b4d3b4d3b4d3b4d3"
            )
            .to_numpy()
            .astype(np.int64)
        )
        h2 = (
            pd.util.hash_pandas_object(batch["text"], index=False)
            .to_numpy()
            .astype(np.int64)
        )
        df = pd.DataFrame(
            {"text_hash": h1, "_h2": h2, id_col: batch[id_col].to_numpy()}
        )
        agg = (
            df.groupby(["text_hash", "_h2"], sort=False)[id_col]
            .agg(["min", "size"])
            .reset_index()
        )
        agg = agg.rename(columns={"min": "_min_id", "size": "_n"})
        agg["_part"] = (
            agg["text_hash"].to_numpy().astype(np.uint64) >> np.uint64(40)
        ).astype(np.int64) % n_parts
        return agg

    partials = ds.map_batches(prep, batch_format="pandas", batch_size=None)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = (
            g.groupby(["text_hash", "_h2"], sort=False)
            .agg(**{id_col: ("_min_id", "min"), "n_dups": ("_n", "sum")})
            .reset_index()
        )
        return m[[id_col, "n_dups", "text_hash"]]

    return partials.groupby("_part").map_groups(merge, batch_format="pandas")


class _MinHashStage:
    """Actor: MinHash permutations generated once per actor.

    Signatures are emitted as fixed-width BINARY (num_perm uint64 LE
    bytes) so they survive hash joins (Arrow Acero rejects tensor-
    extension non-key columns) and decode vectorized via np.frombuffer.
    """

    def __init__(self, num_perm: int, bands: int, shingle_n: int, seed: int):
        self.mh = MinHasher(num_perm=num_perm, bands=bands, seed=seed)
        self.shingle_n = shingle_n

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = []
        for t in batch["text"]:
            sh = shingle_hashes(t.split(), n=self.shingle_n)
            sigs.append(self.mh.signature(sh).tobytes())
        out = batch[["doc_id"]].copy()
        out["signature"] = sigs
        return out


def minhash_signatures(ds, num_perm=128, bands=16, shingle_n=3, seed=42, concurrency=4):
    # TASK map, not an actor pool: rebuilding the MinHasher per task is
    # ~100us (two [num_perm] uint64 draws), while a fixed pool caps the
    # stage at `concurrency` cores and pays actor spin-up every call
    # (`concurrency` kept for API compatibility, unused)
    stage = _MinHashStage(num_perm, bands, shingle_n, seed)
    return ds.map_batches(stage.__call__, batch_format="pandas", batch_size=1024)


def _sig_matrix(col, num_perm: int) -> np.ndarray:
    """[n, num_perm] uint64 from a binary signature column — one
    frombuffer over the concatenated bytes, no per-row decode."""
    blob = b"".join(col)
    if not blob:
        return np.empty((0, num_perm), dtype=np.uint64)
    return np.frombuffer(blob, dtype=np.uint64).reshape(-1, num_perm)


def _explode_bands(bands: int, rows: int):
    num_perm = bands * rows

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        sigs = _sig_matrix(batch["signature"], num_perm)  # [n, num_perm]
        # band keys for ALL docs at once: FNV-style fold over each
        # band's rows, vectorized across (doc, band)
        blocks = sigs.reshape(n, bands, rows) if n else sigs.reshape(0, bands, rows)
        mult = np.uint64(0x9E3779B97F4A7C15)
        acc = np.full((n, bands), np.uint64(0xCBF29CE484222325), dtype=np.uint64)
        for r in range(rows):
            acc = (acc ^ blocks[:, :, r]) * mult
        return pd.DataFrame(
            {
                "doc_id": np.repeat(batch["doc_id"].to_numpy(), bands),
                "band_id": np.tile(np.arange(bands, dtype=np.int32), n),
                "band_key": acc.reshape(-1).astype(np.int64),
            }
        )

    return f


_EMPTY_PAIRS = pd.DataFrame(
    {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")}
)


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    ids = np.sort(g["doc_id"].unique())
    if len(ids) < 2:
        return _EMPTY_PAIRS
    if len(ids) > 200:  # degenerate hot bucket: skip, but SAY so
        log.warning(
            "minhash-lsh: skipping oversized bucket (band_id=%s, %d docs) — "
            "recall may drop; raise the guard or add more bands for this corpus",
            g["band_id"].iloc[0], len(ids),
        )
        return _EMPTY_PAIRS
    a, b = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"a": ids[a].astype(np.int64), "b": ids[b].astype(np.int64)})


def _banded_bucket_pairs(exploded, num_partitions: int):
    """Candidate pairs from exploded (doc_id, band_id, band_key) rows:
    ONE bounded exchange (bucket hash % P) + segmented in-partition
    triu expansion with partition-local (a, b) dedup. NOT one Ray group
    per bucket — map_groups pays per-group task overhead at
    ~#docs x bands buckets (measured ~10x at 1e5 buckets). Oversized
    buckets (>200 docs) are skipped WITH a warning, as in
    :func:`_bucket_pairs` (kept for direct single-bucket use)."""
    P = num_partitions

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_part"] = (
            (batch["band_key"].to_numpy().view(np.uint64)
             ^ (batch["band_id"].to_numpy(np.int32).astype(np.uint64)
                << np.uint64(56)))
            % np.uint64(P)
        ).astype(np.int32)
        return batch

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        bid = g["band_id"].to_numpy(np.int64)
        bkey = g["band_key"].to_numpy(np.int64)
        doc = g["doc_id"].to_numpy(np.int64)
        order = np.lexsort((doc, bkey, bid))
        bid, bkey, doc = bid[order], bkey[order], doc[order]
        new_seg = np.r_[True, (bid[1:] != bid[:-1]) | (bkey[1:] != bkey[:-1])]
        seg = np.flatnonzero(new_seg)
        seg_end = np.r_[seg[1:], len(doc)]
        chunks = []
        for st, en in zip(seg, seg_end):
            ids = np.unique(doc[st:en])
            m = len(ids)
            if m < 2:
                continue
            if m > 200:  # degenerate hot bucket: skip, but SAY so
                log.warning(
                    "banded-lsh: skipping oversized bucket (band_id=%s, "
                    "%d docs) — recall may drop; raise the guard or add "
                    "more bands for this corpus", bid[st], m,
                )
                continue
            ia, ib = np.triu_indices(m, k=1)
            chunks.append(np.stack([ids[ia], ids[ib]], axis=1))
        if not chunks:
            return _EMPTY_PAIRS
        ab = np.unique(np.concatenate(chunks), axis=0)
        return pd.DataFrame({"a": ab[:, 0], "b": ab[:, 1]})

    return (
        exploded.map_batches(tag, batch_format="pandas", batch_size=None)
        .groupby("_part")
        .map_groups(part_pairs, batch_format="pandas")
    )


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


def minhash_verified_pairs(
    ds,
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    concurrency: int = 4,
    join_partitions: int | None = None,
):
    """Candidate generation + DISTRIBUTED verification: returns a
    Dataset ``(a, b, est_jaccard)`` of verified near-dup pairs.

    Scale path (round-2 redesign): candidate pairs from the banded-LSH
    shuffle are hash-joined TWICE against the signature Dataset on
    doc_id (``Dataset.join``), and the signature-agreement Jaccard
    estimate is computed vectorized per batch — no O(corpus)
    ``take_all``/``to_pandas``, no per-pair Python loop. Only the
    verified pairs (sparse by construction) ever reach the driver.

    The returned pairs are globally DISTINCT on (a, b): the same pair
    can surface from different LSH bands in different blocks, so the
    sparse verified list goes through one (a, b) groupby before
    returning — consumers may count/aggregate pairs directly.
    """
    if join_partitions is None:
        try:
            import ray

            join_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
        except Exception:
            join_partitions = 4

    sigs = minhash_signatures(
        ds, num_perm=num_perm, bands=bands, shingle_n=shingle_n, seed=seed,
        concurrency=concurrency,
    ).materialize()
    exploded = sigs.map_batches(
        _explode_bands(bands, num_perm // bands), batch_format="pandas"
    )

    pairs_ds = _banded_bucket_pairs(exploded, join_partitions).materialize()
    # sparse candidate pairs, not the corpus
    if pairs_ds.count() == 0:
        # joining a zero-block left side loses its schema in the hash
        # shuffle; short-circuit to a typed empty result instead
        import ray.data

        return ray.data.from_pandas(
            pd.DataFrame(
                {"a": pd.Series([], dtype="int64"),
                 "b": pd.Series([], dtype="int64"),
                 "est_jaccard": pd.Series([], dtype="float64")}
            )
        )
    def _rename(mapping):
        # map_batches projection (not Dataset.rename_columns, which can
        # leave mixed-schema blocks in flight and break the next join)
        def f(df: pd.DataFrame) -> pd.DataFrame:
            return df.rename(columns=mapping)

        return f

    # candidate pairs are SPARSE after banding: the partition-merge
    # join (int-keyed exchange + in-partition merge) beats Dataset.join,
    # whose hash-shuffle setup dominates on a few-thousand-row probe
    # side (measured 6.4s -> ~1s for the two attaches)
    from .join import partition_merge_join

    sig_a = sigs.map_batches(
        _rename({"doc_id": "a", "signature": "sig_a"}),
        batch_format="pandas", batch_size=None)
    sig_b = sigs.map_batches(
        _rename({"doc_id": "b", "signature": "sig_b"}),
        batch_format="pandas", batch_size=None)
    withs_a = partition_merge_join(
        pairs_ds, sig_a, on="a", how="inner", num_partitions=join_partitions)
    withs_b = partition_merge_join(
        withs_a, sig_b, on="b", how="inner", num_partitions=join_partitions)

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"a": pd.Series([], dtype="int64"),
                 "b": pd.Series([], dtype="int64"),
                 "est_jaccard": pd.Series([], dtype="float64")}
            )
        sa = _sig_matrix(df["sig_a"], num_perm)
        sb = _sig_matrix(df["sig_b"], num_perm)
        est = (sa == sb).mean(axis=1)
        keep = est >= threshold
        return pd.DataFrame(
            {"a": df["a"].to_numpy()[keep], "b": df["b"].to_numpy()[keep],
             "est_jaccard": est[keep]}
        )

    verified = withs_b.map_batches(estimate, batch_format="pandas", batch_size=None)
    # global distinct on the SPARSE verified list (same pair can arrive
    # from different bands in different blocks); est_jaccard is a pure
    # function of the two signatures, so min == the single value
    from ray.data.aggregate import Min

    return verified.groupby(["a", "b"]).aggregate(
        Min("est_jaccard", alias_name="est_jaccard")
    )


def minhash_lsh_dedup(
    ds,
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    concurrency: int = 4,
    cc: str = "driver",
):
    """Full MinHash-LSH near-dup pipeline. Returns a pandas DataFrame
    (doc_id, cluster_id, is_keeper) covering docs in near-dup clusters.

    Everything up to verified pairs runs distributed
    (:func:`minhash_verified_pairs`). Clustering of the sparse
    verified pairs:

    - ``cc="driver"`` (default): pair list to the driver for
      union-find — right up to the point where the PAIR LIST itself
      outgrows driver memory.
    - ``cc="distributed"``: contraction-based components over the
      pair Dataset (:func:`..graph.connected_components_contract`,
      2 shuffles, diameter-independent — transitive near-dup CHAINS
      A~B~C~... are exactly the long-path case where hash-min's
      O(diameter) join rounds degrade) — only the sparse contracted
      rep-graph reaches the driver; the scale path for corpora where
      near-dup pairs number in the billions. Same output (identical
      cluster assignment: both label each component with its min
      doc_id).
    """
    verified_ds = minhash_verified_pairs(
        ds, threshold=threshold, num_perm=num_perm, bands=bands,
        shingle_n=shingle_n, seed=seed, concurrency=concurrency,
    )
    if cc == "distributed":
        from .graph import (
            components_to_clusters,
            connected_components_contract,
        )

        if verified_ds.count() == 0:
            return pd.DataFrame({"doc_id": [], "cluster_id": [], "is_keeper": []})
        labels = connected_components_contract(
            verified_ds.select_columns(["a", "b"]))
        return components_to_clusters(labels)
    verified = verified_ds.to_pandas()  # sparse: verified near-dup pairs only
    if len(verified) == 0:
        return pd.DataFrame({"doc_id": [], "cluster_id": [], "is_keeper": []})
    verified = verified.drop_duplicates(["a", "b"])
    keep = list(zip(verified["a"].astype(int), verified["b"].astype(int)))
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


def _simhash_block_tables(n_blocks: int, key_blocks: int):
    """Block widths + per-table block combinations for Manku-style
    multi-table banding (Manku/Jain/Das Sarma, WWW 2007 §3): split the
    64-bit fingerprint into ``n_blocks`` blocks; a pair within Hamming
    distance h differs in at most h blocks, so whenever
    ``n_blocks - key_blocks >= h`` it shares ALL key blocks of at least
    one of the C(n_blocks, key_blocks) tables — pigeonhole, no recall
    loss. Each table's bucket key concatenates ``key_blocks`` blocks
    (~``64 * key_blocks / n_blocks`` bits), so expected bucket
    occupancy is ``corpus_size / 2**key_bits`` — a tuning parameter
    independent of corpus size, unlike fixed 16-bit bands whose
    occupancy grows linearly with the corpus."""
    from itertools import combinations

    base, extra = divmod(64, n_blocks)
    widths = [base + (1 if i < extra else 0) for i in range(n_blocks)]
    offsets = np.concatenate([[0], np.cumsum(widths)])[:-1]
    combos = list(combinations(range(n_blocks), key_blocks))
    return widths, offsets, combos


def hamming64_cluster(
    hashes,
    max_hamming: int = 3,
    n_blocks: int = 6,
    key_blocks: int = 3,
    bucket_cap: int = 500,
):
    """Near-dup clustering of ANY 64-bit fingerprint Dataset
    ``(doc_id, simhash)`` under Hamming distance <= ``max_hamming``,
    via the same Manku WWW'07 multi-table block banding as
    :func:`simhash_dedup` (which now delegates here). Text SimHash,
    image dHash/pHash and audio fingerprints all share this machinery:
    C(n_blocks, key_blocks) tables, pigeonhole-lossless for
    max_hamming <= n_blocks - key_blocks, identical fingerprints
    chained in O(n), exact in-bucket Hamming verification, union-find
    clusters on the sparse verified pairs. Returns (doc_id,
    cluster_id, is_keeper)."""
    if n_blocks - key_blocks < max_hamming:
        raise ValueError(
            f"need n_blocks - key_blocks >= max_hamming for full recall "
            f"(got {n_blocks}-{key_blocks} < {max_hamming})"
        )
    widths, offsets, combos = _simhash_block_tables(n_blocks, key_blocks)

    from .rollup import partitions_for_input

    P = partitions_for_input(None)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
        n = len(batch)
        blocks = [
            ((h >> np.uint64(offsets[b])) & np.uint64((1 << widths[b]) - 1))
            for b in range(n_blocks)
        ]
        parts = []
        for t, combo in enumerate(combos):
            key = np.uint64(t)  # table id folded into one combined key
            for b in combo:
                key = (key << np.uint64(widths[b])) | blocks[b]
            parts.append(
                pd.DataFrame(
                    {
                        "doc_id": batch["doc_id"].to_numpy(),
                        "simhash": batch["simhash"].to_numpy(),
                        "bkey": key.astype(np.int64),
                    }
                )
            )
        out = pd.concat(parts, ignore_index=True)
        out["_part"] = (
            pd.util.hash_pandas_object(out["bkey"], index=False).to_numpy() % P
        ).astype(np.int32)
        return out

    exploded = hashes.map_batches(explode, batch_format="pandas", batch_size=None)

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """All buckets of one hash partition in ONE vectorized pass:
        lexsort by (bucket, fingerprint, doc), chain identical
        fingerprints via segment boundaries (O(n), mass duplicates
        never hit the pairwise cap), and run exact pairwise Hamming
        only over the rare buckets with >=2 DISTINCT fingerprints."""
        empty = pd.DataFrame(
            {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64),
             "hamming": pd.Series([], dtype=np.int64)}
        )
        if len(g) < 2:
            return empty
        bk = g["bkey"].to_numpy()
        hs = g["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
        ids = g["doc_id"].to_numpy()
        order = np.lexsort((ids, hs, bk))
        bk, hs, ids = bk[order], hs[order], ids[order]
        new_bucket = np.concatenate([[True], bk[1:] != bk[:-1]])
        starts = new_bucket | np.concatenate([[True], hs[1:] != hs[:-1]])
        rep_idx = np.flatnonzero(starts)
        grp = np.cumsum(starts) - 1
        dup_mask = ~starts
        frames = []
        if dup_mask.any():
            frames.append(
                pd.DataFrame(
                    {
                        "a": ids[rep_idx[grp[dup_mask]]],
                        "b": ids[dup_mask],
                        "hamming": np.zeros(int(dup_mask.sum()), dtype=np.int64),
                    }
                )
            )
        # pairwise over distinct fingerprints, bucket by bucket
        bucket_of_rep = (np.cumsum(new_bucket) - 1)[rep_idx]
        reps_per_bucket = np.bincount(bucket_of_rep)
        multi = np.flatnonzero(reps_per_bucket >= 2)
        if len(multi):
            rep_starts = np.concatenate([[0], np.cumsum(reps_per_bucket)])
            r_ids, r_hs = ids[rep_idx], hs[rep_idx]
            for b in multi:
                s, e = rep_starts[b], rep_starts[b + 1]
                m = e - s
                if m > bucket_cap:  # adversarial key collision: skip, but SAY so
                    log.warning(
                        "simhash: skipping pairwise verify in oversized bucket "
                        "(%d distinct fingerprints) — recall may drop for this corpus",
                        m,
                    )
                    continue
                ai, bi = np.triu_indices(m, k=1)
                frames.append(
                    pd.DataFrame(
                        {"a": r_ids[s:e][ai], "b": r_ids[s:e][bi],
                         "hamming": hamming64(r_hs[s:e][ai], r_hs[s:e][bi])}
                    )
                )
        if not frames:
            return empty
        return pd.concat(frames, ignore_index=True)

    pairs = (
        exploded.groupby("_part")
        .map_groups(partition_pairs, batch_format="pandas")
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




def simhash_dedup(
    ds,
    max_hamming: int = 3,
    concurrency: int = 4,
    n_blocks: int = 6,
    key_blocks: int = 3,
    bucket_cap: int = 500,
):
    """SimHash near-dup via multi-table block banding (Manku et al.,
    WWW'07) — computes the text fingerprints in an actor pool, then
    delegates banding/verification/clustering to
    :func:`hamming64_cluster` (shared with the image dHash path)."""
    hashes = ds.map_batches(
        _SimHashStage, batch_format="pandas", batch_size=2048, concurrency=concurrency
    ).materialize()
    return hamming64_cluster(
        hashes, max_hamming=max_hamming, n_blocks=n_blocks,
        key_blocks=key_blocks, bucket_cap=bucket_cap)


class _ShingleMinHashStage(_MinHashStage):
    """Actor: one tokenize+shingle pass emits BOTH the MinHash
    signature (for LSH candidate banding) and the sorted-unique shingle
    set as a binary blob (for exact Jaccard verification)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs, blobs = [], []
        for t in batch["text"]:
            sh = shingle_hashes(t.split(), n=self.shingle_n)
            sigs.append(self.mh.signature(sh).tobytes())
            blobs.append(np.unique(sh).tobytes())
        out = batch[["doc_id"]].copy()
        out["signature"] = sigs
        out["shingles"] = blobs
        return out


def ngram_jaccard_dedup(
    ds,
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    concurrency: int = 4,
    join_partitions: int | None = None,
):
    """EXACT n-gram Jaccard near-dup pipeline: MinHash-LSH banding
    proposes candidates, then each candidate pair is verified with the
    exact shingle-set Jaccard (not the signature estimate) — the
    highest-precision tier of the dedup family. Returns (doc_id,
    cluster_id, is_keeper, jaccard of the joining edge).

    Scale path mirrors :func:`minhash_verified_pairs`: ONE
    tokenize+shingle pass per doc emits signature + sorted-unique
    shingle blob; candidate pairs hash-join TWICE against the shingle
    Dataset on doc_id; exact Jaccard per pair via
    ``np.intersect1d(assume_unique=True)`` inside the batch (pairs are
    sparse post-LSH, so the per-pair loop is over candidates, not the
    corpus). Only verified pairs reach the driver for union-find.
    """
    if join_partitions is None:
        try:
            import ray

            join_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
        except Exception:
            join_partitions = 4

    feat = ds.map_batches(
        _ShingleMinHashStage,
        fn_constructor_args=(num_perm, bands, shingle_n, seed),
        batch_format="pandas",
        batch_size=1024,
        concurrency=concurrency,
    ).materialize()
    shing = feat.drop_columns(["signature"]).materialize()
    exploded = feat.drop_columns(["shingles"]).map_batches(
        _explode_bands(bands, num_perm // bands), batch_format="pandas"
    )
    pairs_ds = _banded_bucket_pairs(exploded, join_partitions).materialize()
    empty = pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "cluster_id": pd.Series([], dtype="int64"),
         "is_keeper": pd.Series([], dtype=bool),
         "jaccard": pd.Series([], dtype="float64")}
    )
    if pairs_ds.count() == 0:
        return empty

    def _rename(mapping):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            return df.rename(columns=mapping)

        return f

    # sparse candidate probe side: partition-merge join, as in
    # minhash_verified_pairs (Dataset.join's shuffle setup dominates)
    from .join import partition_merge_join

    sh_a2 = shing.map_batches(
        _rename({"doc_id": "a", "shingles": "sh_a"}),
        batch_format="pandas", batch_size=None)
    sh_b2 = shing.map_batches(
        _rename({"doc_id": "b", "shingles": "sh_b"}),
        batch_format="pandas", batch_size=None)
    with_a = partition_merge_join(
        pairs_ds, sh_a2, on="a", how="inner", num_partitions=join_partitions)
    with_b = partition_merge_join(
        with_a, sh_b2, on="b", how="inner", num_partitions=join_partitions)

    def exact_verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"a": pd.Series([], dtype="int64"),
                 "b": pd.Series([], dtype="int64"),
                 "jaccard": pd.Series([], dtype="float64")}
            )
        jac = np.empty(len(df))
        for i, (ba, bb) in enumerate(zip(df["sh_a"], df["sh_b"])):
            sa = np.frombuffer(ba, dtype=np.uint64)
            sb = np.frombuffer(bb, dtype=np.uint64)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            jac[i] = inter / union if union else 0.0
        keep = jac >= threshold
        return pd.DataFrame(
            {"a": df["a"].to_numpy()[keep], "b": df["b"].to_numpy()[keep],
             "jaccard": jac[keep]}
        )

    verified = (
        with_b.map_batches(exact_verify, batch_format="pandas", batch_size=None)
        .to_pandas()  # sparse: verified near-dup pairs only
        .drop_duplicates(["a", "b"])
    )
    if len(verified) == 0:
        return empty
    clusters = union_find_clusters(
        list(zip(verified["a"].astype(int), verified["b"].astype(int)))
    )
    best_edge: dict[int, float] = {}
    for a, b, j in zip(verified["a"], verified["b"], verified["jaccard"]):
        for d in (int(a), int(b)):
            best_edge[d] = max(best_edge.get(d, 0.0), float(j))
    df = pd.DataFrame(
        {"doc_id": list(clusters), "cluster_id": [clusters[d] for d in clusters]}
    ).sort_values("doc_id")
    df["is_keeper"] = df["doc_id"] == df["cluster_id"]
    df["jaccard"] = [best_edge[d] for d in df["doc_id"]]
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


def repeated_ngram_ratio(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
):
    """Cross-document repeated-substring analysis (the document-level
    projection of Lee et al., "Deduplicating Training Data Makes
    Language Models Better", ACL 2022): for every doc, the fraction
    of its n-gram shingles that also appear in >= min_docs documents.

    Distributed shape (TWO int-keyed exchanges, no join): per-doc
    DISTINCT shingle hashes stream as fixed-width (hash, id) rows —
    text never leaves the tokenize task; rows co-locate by shingle
    hash, so each partition computes every local shingle's document
    frequency AND folds it straight into per-doc partials (the same
    co-location trick as `graph.pagerank`'s degree attach — a first
    cut with groupby(shingle) + Dataset.join back ran 27 s at sf0.1,
    this shape ~2.5 s); a second int-keyed partition rollup by doc id
    finishes (`join.hash_groupby_sum` — Ray's sort/hash aggregate on
    the same partials measured 19 s).
    Docs with ratio ~1.0 are boilerplate copies; chunk-level removal
    would re-segment on the flagged shingles. Returns
    (id, n_shingles, n_repeated, dup_ratio).
    """
    from ..functions.hashing import shingle_hashes
    from .join import hash_groupby_sum
    from .rollup import partitions_for_input

    P = partitions_for_input(None)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids, hs = [], []
        for i, t in zip(batch[id_col], batch[text_col]):
            toks = [w for w in t.split(" ") if w]
            if len(toks) < n:
                continue
            sh = np.unique(shingle_hashes(toks, n=n))
            ids.extend([i] * len(sh))
            hs.append(sh)
        if not hs:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "shingle": pd.Series([], dtype=np.int64),
                                 "_part": pd.Series([], dtype=np.int32)})
        out = pd.DataFrame(
            {
                id_col: np.asarray(ids, dtype=np.int64),
                "shingle": np.concatenate(hs).astype(np.int64),
            }
        )
        out["_part"] = (
            pd.util.hash_pandas_object(out["shingle"], index=False).to_numpy() % P
        ).astype(np.int32)
        return out

    def df_fold(g: pd.DataFrame) -> pd.DataFrame:
        sh = g["shingle"].to_numpy(np.int64)
        # all copies of a shingle land here: df == multiplicity
        uniq, inv, counts = np.unique(sh, return_inverse=True,
                                      return_counts=True)
        rep = (counts[inv] >= min_docs).astype(np.int64)
        out = pd.DataFrame({id_col: g[id_col].to_numpy(np.int64),
                            "one": np.ones(len(g), np.int64),
                            "rep": rep})
        return out.groupby(id_col, as_index=False).sum()

    partials = (
        ds.map_batches(explode, batch_format="pandas")
        .groupby("_part")
        .map_groups(df_fold, batch_format="pandas")
    )
    agg = hash_groupby_sum(partials, id_col, ("one", "rep"))

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.rename(columns={"one": "n_shingles",
                                      "rep": "n_repeated"})
        batch["n_shingles"] = batch["n_shingles"].astype(np.int64)
        batch["n_repeated"] = batch["n_repeated"].astype(np.int64)
        batch["dup_ratio"] = batch["n_repeated"] / batch["n_shingles"]
        return batch

    return agg.map_batches(finish, batch_format="pandas", batch_size=None)


def hamming_prefix_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_len: int = 16,
    max_dist: int = 1,
    max_block: int = 20_000,
):
    """Near-match pair join on a fixed-length document key (the first
    ``key_len`` chars) under Hamming distance <= ``max_dist`` (=1),
    using pigeonhole blocking: if two keys differ in at most one
    position, at least one of their two halves is IDENTICAL, so an
    exact hash join per half finds every qualifying pair — no O(n^2)
    all-pairs scan, and the blocking is provably lossless (unlike LSH
    recall<1 banding).

    Scale note: the 8-char half key is the blocking granularity; block
    occupancy grows with corpus size at fixed key length, so at larger
    corpora raise ``key_len`` (longer halves = finer blocks) or split
    into d+1 pieces for larger ``max_dist`` (the same pigeonhole
    argument).  Groups above ``max_block`` raise rather than silently
    degrade.

    Returns a Dataset of (id_a, id_b, dist) with id_a < id_b, distinct
    across the two half-tables.
    """
    import pandas as pd
    from ray.data.aggregate import Count

    if max_dist != 1:
        raise ValueError("two-half pigeonhole blocking is lossless only for max_dist=1")
    half = key_len // 2

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        # PAD FIRST, then split: verification pads short keys to
        # key_len, so blocking halves must come from the SAME padded
        # key — slicing the unpadded text gives a short doc a different
        # _h2 ('' vs '  ') than its padded near-match and the pair
        # lands in no common block, silently losing the pigeonhole
        # guarantee for variable-length inputs
        key = batch[text_col].str.slice(0, key_len).str.pad(
            key_len, side="right", fillchar=" "
        )
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "_key": key,
                "_h1": key.str.slice(0, half),
                "_h2": key.str.slice(half, key_len),
            }
        )

    keyed = ds.map_batches(prep, batch_format="pandas", batch_size=None)

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = len(g)
        if m < 2:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype=np.int64),
                 "id_b": pd.Series([], dtype=np.int64),
                 "dist": pd.Series([], dtype=np.int64)}
            )
        if m > max_block:
            raise ValueError(
                f"hamming block of {m} rows exceeds max_block={max_block}; "
                "raise key_len so half-key blocks stay bounded"
            )
        ids = g[id_col].to_numpy()
        keys = g["_key"].to_numpy()  # already padded to key_len in prep
        # (m, key_len) single-char matrix; pairwise mismatch counts.
        # CHUNK the row axis: the full (m, m, key_len) boolean tensor
        # reaches ~6.4 GB at the m = 20000 guard — a worker OOM long
        # before the guard fires — so cap each slice's tensor at
        # ~256 MB and accumulate the sparse qualifying pairs.
        chars = np.array([list(k) for k in keys])
        step = max(1, int((256 << 20) // max(1, m * key_len)))
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        for s0 in range(0, m, step):
            e0 = min(m, s0 + step)
            dist = (chars[s0:e0, None, :] != chars[None, :, :]).sum(axis=2)
            ii, jj = np.nonzero(dist <= max_dist)
            gi = ii + s0
            keep = jj > gi  # upper triangle, globally
            if not keep.any():
                continue
            gi, jj2 = gi[keep], jj[keep]
            out_a.append(np.minimum(ids[gi], ids[jj2]))
            out_b.append(np.maximum(ids[gi], ids[jj2]))
            out_d.append(dist[gi - s0, jj2].astype(np.int64))
        if not out_a:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype=np.int64),
                 "id_b": pd.Series([], dtype=np.int64),
                 "dist": pd.Series([], dtype=np.int64)}
            )
        return pd.DataFrame({
            "id_a": np.concatenate(out_a),
            "id_b": np.concatenate(out_b),
            "dist": np.concatenate(out_d),
        })

    parts = []
    for h in ("_h1", "_h2"):
        parts.append(
            keyed.groupby(h).map_groups(block_pairs, batch_format="pandas")
        )
    both = parts[0].union(parts[1])
    # a pair whose keys agree on BOTH halves appears twice: distinct
    distinct = both.groupby(["id_a", "id_b", "dist"]).aggregate(Count(alias_name="_n"))
    return distinct.select_columns(["id_a", "id_b", "dist"])


def duplicate_span_coverage(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
):
    """Exact duplicate-SPAN coverage (the document-level span
    projection of Lee et al., "Deduplicating Training Data Makes
    Language Models Better", ACL 2022 §4 ExactSubstr): for each doc,
    the fraction of its token stream covered by the UNION of word
    ``n``-gram occurrences that also appear in at least one OTHER
    document.  Unlike `repeated_ngram_ratio` (distinct-shingle counts)
    this resolves overlapping hits into merged character-position
    islands, so a single shared 30-token block counts once, not 23
    times.

    Distributed shape: a positions explode (doc, gram, pos), document
    frequencies from the distinct (doc, gram) projection, a gram-keyed
    hash join back, then the per-key interval-union machinery
    (`temporal.interval_coverage`) merges hit spans per doc — all
    joins on gram strings (SQL-mirrorable; swap for 128-bit hashes at
    corpus scale).  Docs shorter than ``n`` tokens are excluded; docs
    with zero shared grams report coverage 0 via a left join.

    Returns (id, n_tokens:int64, covered_tokens:int64,
    dup_ratio:float).
    """
    from ..pipelines.queries import _join_partitions
    from .temporal import interval_coverage

    def explode_only(batch: pd.DataFrame) -> pd.DataFrame:
        ids, grams, pos = [], [], []
        for d, t in zip(batch[id_col].to_numpy(), batch[text_col].to_numpy()):
            toks = t.split(" ")
            nt = len(toks)
            if nt < n:
                continue
            for i in range(nt - n + 1):
                ids.append(d)
                grams.append(" ".join(toks[i : i + n]))
                pos.append(i)
        return pd.DataFrame(
            {
                id_col: np.asarray(ids, dtype=np.int64),
                "g": grams,
                "pos": np.asarray(pos, dtype=np.int64),
            }
        )

    def ntok_only(batch: pd.DataFrame) -> pd.DataFrame:
        nt = np.asarray(
            [t.count(" ") + 1 for t in batch[text_col].to_numpy()], dtype=np.int64
        )
        keep = nt >= n
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy()[keep], "n_tokens": nt[keep]}
        )

    P = _join_partitions()
    # two consumers (DF pass + hit join): materialize so the explode
    # runs once — blocks spill to the object store under pressure,
    # which is the intended reuse mechanism for a fan-out
    positions = ds.map_batches(explode_only, batch_format="pandas").materialize()
    ntok = ds.map_batches(ntok_only, batch_format="pandas", batch_size=None)

    # document frequency over the DISTINCT (doc, gram) projection.
    # Derived PER-DOCUMENT from the raw table, not from `positions`:
    # a per-block drop_duplicates over the exploded positions would
    # rely on a doc's position rows never spanning blocks, which Ray's
    # output-block splitting (target_max_block_size) does NOT
    # guarantee — a split doc would double-count an intra-doc repeated
    # gram as document frequency >= 2.  Here each doc occupies exactly
    # one input row, the per-doc `seen` set makes every emitted
    # (doc, gram) globally unique by construction, and output-block
    # splitting cannot duplicate rows.
    def distinct_grams_per_doc(batch: pd.DataFrame) -> pd.DataFrame:
        ids, grams = [], []
        for i, t in zip(batch[id_col].to_numpy(), batch[text_col].to_numpy()):
            toks = t.split()
            seen: set[str] = set()
            for j in range(len(toks) - n + 1):
                gkey = " ".join(toks[j : j + n])
                if gkey not in seen:
                    seen.add(gkey)
                    ids.append(i)
                    grams.append(gkey)
        return pd.DataFrame({id_col: np.asarray(ids, dtype=np.int64), "g": grams})

    dd = ds.map_batches(distinct_grams_per_doc, batch_format="pandas")
    from .text import gram_counts

    df = gram_counts(dd.select_columns(["g"]), min_count=2).select_columns(["g"]).materialize()
    # Bloom pushdown: most positions carry unshared grams — drop them
    # before the string-keyed exchange (false positives removed by the
    # exact membership test, so the result is unchanged). The residue
    # is SPARSE, so the verify uses the partition-merge semi-join
    # rather than Dataset.join (Ray 2.49 schema race — see
    # join.partition_merge_join).
    from .join import bloom_semi_filter, build_bloom, partition_merge_join

    bloom = build_bloom(df, "g")
    positions_f = bloom_semi_filter(positions, "g", bloom)
    hits = partition_merge_join(positions_f, df, on="g", how="semi", num_partitions=P)

    def spans(batch: pd.DataFrame) -> pd.DataFrame:
        # token index -> fake-us so interval_coverage's exact int64
        # machinery yields covered TOKENS in its covered_s field
        s = batch["pos"].to_numpy(dtype=np.int64) * 1_000_000
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy(),
             "_iv_start_us": s, "_iv_end_us": s + n * 1_000_000}
        )

    cov = interval_coverage(
        hits.map_batches(spans, batch_format="pandas", batch_size=None), key=id_col
    ).select_columns([id_col, "covered_s"])

    # left-join cov onto ntok via the partition-merge idiom: one
    # int-keyed exchange, pandas merge per partition — cheaper than a
    # second Dataset.join for two per-doc tables on the same key
    def tag(side: str):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            # union needs identical schemas: carry both value columns
            for col in ("n_tokens", "covered_s"):
                if col not in batch.columns:
                    batch[col] = np.nan
            batch["_side"] = side
            batch["_part"] = (
                pd.util.hash_pandas_object(batch[id_col], index=False).to_numpy()
                % P
            ).astype(np.int32)
            return batch[[id_col, "n_tokens", "covered_s", "_side", "_part"]]

        return f

    ntok_t = ntok.map_batches(tag("n"), batch_format="pandas", batch_size=None)
    cov_t = cov.map_batches(tag("c"), batch_format="pandas", batch_size=None)

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["_side"] == "n"][[id_col, "n_tokens"]]
        right = g[g["_side"] == "c"][[id_col, "covered_s"]]
        m = left.merge(right, on=id_col, how="left")
        covered = np.round(
            np.nan_to_num(m["covered_s"].to_numpy(dtype=np.float64))
        ).astype(np.int64)
        nt = m["n_tokens"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                id_col: m[id_col].to_numpy(),
                "n_tokens": nt,
                "covered_tokens": covered,
                "dup_ratio": covered / nt,
            }
        )

    both = ntok_t.union(cov_t)
    return both.groupby("_part").map_groups(merge_part, batch_format="pandas")


def conversation_minhash_neardup(
    ds,
    key: str = "conv_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    num_partitions: int | None = None,
):
    """Near-duplicate CONVERSATIONS via mergeable MinHash: each turn
    emits a PER-TURN partial signature (elementwise min of permuted
    shingle hashes); the per-conversation signature is the elementwise
    MIN-MERGE of its turns' partials — MinHash of a union is the min
    of the MinHashes, so the conversation's text is NEVER concatenated
    or shuffled: only fixed-width [num_perm] uint64 partials move
    through ONE conv-hash exchange. Banding + in-bucket exact
    signature-agreement verification as in ``minhash_lsh_dedup``.

    Returns (conv pairs a < b, est_jaccard) for band-colliding pairs
    with signature agreement >= 0.5.
    """
    import pyarrow as pa

    from ..functions.hashing import MinHasher, shingle_hashes
    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)
    mh = MinHasher(num_perm=num_perm, bands=bands, seed=seed)

    def turn_partial(batch: pd.DataFrame) -> pd.DataFrame:
        """Fully vectorized per-batch path: tokens hash in ONE pandas
        C-SipHash call, word-n-gram shingle hashes come from a global
        windowed polynomial combine masked at turn boundaries, the
        permutation matrix is built in ~4k-shingle tiles (a monolithic
        [num_perm, S_total] broadcast is memory-bandwidth bound and
        ~14x slower), and per-conversation signatures pre-merge inside
        the batch (min-of-mins is associative; turns are contiguous by
        conversation in the source layout) so the exchange carries a
        handful of [num_perm] rows per batch. No per-row Python except
        the rare turns shorter than the shingle width. A plain TASK map
        (not an actor pool): the only state is the closure-captured
        MinHasher params — a fixed pool paid ~10s of actor spin-up at
        small scale and reserved slots the read needed."""
        mh_ = mh
        mult = np.uint64(0x9E3779B97F4A7C15)
        n = shingle_n
        toks = batch[text_col].astype(str).str.split(" ")
        L = toks.str.len().fillna(0).to_numpy(np.int64)
        total = int(L.sum())
        codes, uniques = pd.factorize(batch[key], sort=False)
        merged = np.full((len(uniques), mh_.num_perm),
                         np.iinfo(np.uint64).max, dtype=np.uint64)
        sh_vals = []
        sh_conv = []
        if total:
            flat = np.concatenate(
                [t for t in toks.to_numpy() if isinstance(t, list) and t]
            )
            th = pd.util.hash_pandas_object(
                pd.Series(flat, dtype=object), index=False,
                hash_key="3141592653589793",
            ).to_numpy().view(np.uint64)
            row_id = np.repeat(np.arange(len(L)), L)
            if total >= n:
                acc = th[: total - n + 1].copy()
                for k_ in range(1, n):
                    acc = acc * mult + th[k_: total - n + 1 + k_]
                ok = row_id[: total - n + 1] == row_id[n - 1:]
                sh_vals.append(acc[ok])
                sh_conv.append(codes[row_id[: total - n + 1][ok]])
            short = np.flatnonzero((L > 0) & (L < n))
            if len(short):
                # vectorized rolling combine by position: short turns
                # (< n tokens — "ok"/"yes" turns are COMMON in chat
                # data, not rare) do the same multiply-add recurrence
                # masked by each turn's length; array uint64 ops wrap
                # silently where the old per-row scalar loop both
                # warned per token and paid Python per row
                tok_starts = np.concatenate([[0], np.cumsum(L)[:-1]])
                starts_s = tok_starts[short]
                Ls = L[short]
                vals = th[starts_s].copy()
                for k_ in range(1, n):
                    m = Ls > k_
                    if not m.any():
                        break
                    vals[m] = vals[m] * mult + th[starts_s[m] + k_]
                sh_vals.append(vals)
                sh_conv.append(codes[short])
        if sh_vals:
            x = np.concatenate(sh_vals)
            cv = np.concatenate(sh_conv)
            order = np.argsort(cv, kind="stable")
            x, cv = x[order], cv[order]
            # permutations are wraparound multiply-add over 2^64
            # (a_i odd): 2 uint64 ops per (perm, shingle) instead
            # of the 12-op exact Mersenne-61 affine — the standard
            # production tradeoff (not min-wise independent in
            # theory, indistinguishable in practice), worth ~6x on
            # the pipeline's dominant term. The min-reduce is FUSED
            # into the tile pass over ONE process-cached buffer: a
            # fresh [num_perm, S] matrix per batch (~75 MB at 2048
            # turns) spent ~25x its compute in first-touch page
            # faults, measured 2.4 s alloc+fill vs 0.04 s fill into
            # a warm buffer.
            a_odd = (mh_.a << np.uint64(1)) | np.uint64(1)
            seg_new = np.empty(len(cv), dtype=bool)
            seg_new[0] = True
            seg_new[1:] = cv[1:] != cv[:-1]
            starts = np.flatnonzero(seg_new)
            CH = 16384
            Ht = _perm_tile_buffer(mh_.num_perm, CH)
            for lo in range(0, len(x), CH):
                hi = min(lo + CH, len(x))
                Hv = Ht[:, : hi - lo]
                np.multiply(a_odd[:, None], x[None, lo:hi], out=Hv)
                Hv += mh_.b[:, None]
                s_in = starts[
                    np.searchsorted(starts, lo, "left"):
                    np.searchsorted(starts, hi, "left")
                ]
                # the tile's first segment may continue the previous
                # tile's conversation: prepend the tile start, and
                # min-merge (not assign) into the per-conv rows
                if not len(s_in) or s_in[0] != lo:
                    s_in = np.concatenate([[lo], s_in])
                mins = np.minimum.reduceat(Hv, s_in - lo, axis=1).T
                rows = cv[s_in]  # distinct within one tile
                np.minimum(merged[rows], mins, out=mins)
                merged[rows] = mins
        out = pd.DataFrame({key: uniques})
        out["sig"] = [r.view(np.int64) for r in merged]
        out["_part"] = (
            pd.util.hash_pandas_object(out[key], index=False).to_numpy() % P
        ).astype(np.int32)
        return out

    partials = ds.select_columns([key, text_col]).map_batches(
        turn_partial, batch_format="pandas", batch_size=2048
    )

    def min_merge(df: pd.DataFrame) -> pd.DataFrame:
        codes, uniques = pd.factorize(df[key], sort=False)
        S = np.stack([np.asarray(s, np.int64) for s in df["sig"]]).view(np.uint64)
        out_sig = np.full((len(uniques), S.shape[1]), np.iinfo(np.uint64).max,
                          dtype=np.uint64)
        np.minimum.at(out_sig, codes, S)
        return pd.DataFrame({key: uniques, "sig": [r.view(np.int64) for r in out_sig]})

    conv_sigs = partials.groupby("_part").map_groups(
        min_merge, batch_format="pandas"
    ).materialize()

    def band_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ks, cs, bs = [], [], []
        for cid, sig in zip(batch[key], batch["sig"]):
            bk = mh.band_keys(np.asarray(sig, np.int64).view(np.uint64))
            for b, k in enumerate(bk):
                ks.append(np.int64(k))
                cs.append(cid)
                bs.append(b)
        out = pd.DataFrame({"bkey": np.asarray(ks, np.int64), "band": np.asarray(bs, np.int32), key: cs})
        out["_p2"] = (
            (out["bkey"].to_numpy(np.int64).view(np.uint64)
             ^ (out["band"].to_numpy(np.int32).astype(np.uint64) << np.uint64(56)))
            % np.uint64(P)
        ).astype(np.int32)
        return out

    bands_ds = conv_sigs.map_batches(band_rows, batch_format="pandas", batch_size=None)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for (_, _), g in df.groupby(["bkey", "band"], sort=False):
            ids = sorted(set(g[key]))
            if len(ids) > 200:
                # every other bucket-cap site in this module LOGS the
                # skip — recall loss must never be invisible
                logging.getLogger(__name__).warning(
                    "conversation_minhash_neardup: skipping hot band bucket "
                    "of %d conversations (cap 200) — recall may drop",
                    len(ids),
                )
                continue
            if len(ids) < 2:
                continue
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pd.DataFrame({"a": out_a, "b": out_b})

    pairs = bands_ds.groupby("_p2").map_groups(bucket_pairs, batch_format="pandas")
    cand = pairs.to_pandas().drop_duplicates()  # sparse: band-colliding pairs
    if not len(cand):
        return pd.DataFrame({"a": pd.Series([], dtype=object),
                             "b": pd.Series([], dtype=object),
                             "est_jaccard": pd.Series([], dtype=np.float64)})
    import ray as _ray

    cand_ids = _ray.put(set(cand["a"]) | set(cand["b"]))  # sparse
    sig_map = conv_sigs.map_batches(
        lambda b: b[b[key].isin(_ray.get(cand_ids))],
        batch_format="pandas", batch_size=None,
    ).to_pandas()  # bounded by candidate count, not corpus
    lut = dict(zip(sig_map[key], sig_map["sig"]))
    est = []
    for a, b in zip(cand["a"], cand["b"]):
        sa = np.asarray(lut[a], np.int64)
        sb = np.asarray(lut[b], np.int64)
        est.append(float((sa == sb).mean()))
    cand = cand.assign(est_jaccard=np.asarray(est, np.float64))
    cand = cand[cand["est_jaccard"] >= 0.5]
    return cand.sort_values(["a", "b"]).reset_index(drop=True)


def ssjoin_prefix(
    ds,
    threshold: float = 0.6,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    join_partitions: int | None = None,
    bucket_warn: int = 10_000,
):
    """EXACT set-similarity self-join: ALL document pairs whose word
    ``shingle_n``-gram shingle sets have Jaccard >= ``threshold``, via
    prefix filtering (Chaudhuri/Ganti/Kaushik ICDE'06; Bayardo et al.
    WWW'07 All-Pairs; Xiao et al. WWW'08 PPJoin). Unlike the
    MinHash-LSH family above, recall is EXACT — the prefix-filter lemma
    guarantees every qualifying pair shares at least one token among
    each side's first ``p = s - ceil(t*s) + 1`` tokens under any fixed
    global token order — so this is the ground-truth pair miner the
    approximate tiers are measured against.

    Scale path: one tokenize+shingle pass emits each doc's
    sorted-unique 64-bit shingle ids (strings never shuffle). The
    global order is ascending hash id — a uniform random permutation of
    tokens, so a token's chance of landing in a prefix is ~(1-t)
    regardless of its frequency; expected bucket load is (1-t)*df
    (df-ordered prefixes, the classic selectivity refinement, would
    shrink hot buckets further at the cost of two more int-keyed
    exchanges). Prefix tokens explode to (gid, doc, size) rows; one
    int-keyed exchange groups them per gid, where candidate pairs are
    generated under the size filter ``t*|b| <= |a|`` (|a|<=|b|);
    oversized buckets are processed EXACTLY (dropping would break the
    recall guarantee) but logged above ``bucket_warn``. Candidates
    dedup globally on the pair key, hash-join TWICE against the shingle
    Dataset, and verify with exact ``np.intersect1d`` Jaccard. Output:
    Dataset (a, b, jaccard) with a < b, verified pairs only.

    Docs with fewer than ``shingle_n`` tokens have no shingles and are
    excluded (mirrors the SQL oracle's ``len(w) >= shingle_n`` guard).
    """
    import math

    from ..functions.hashing import shingle_hashes

    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    if join_partitions is None:
        try:
            import ray

            join_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
        except Exception:
            join_partitions = 4

    def featurize(batch: pd.DataFrame) -> pd.DataFrame:
        ids, blobs, sizes = [], [], []
        for d, t in zip(batch[id_col], batch[text_col]):
            toks = t.split()
            if len(toks) < shingle_n:
                continue
            sh = shingle_hashes(toks, n=shingle_n)  # sorted unique
            ids.append(d)
            blobs.append(sh.tobytes())
            sizes.append(len(sh))
        return pd.DataFrame({id_col: ids, "shingles": blobs,
                             "s": np.asarray(sizes, np.int64)})

    feat = ds.map_batches(featurize, batch_format="pandas", batch_size=1024).materialize()

    def prefix_explode(batch: pd.DataFrame) -> pd.DataFrame:
        gids, docs, sizes = [], [], []
        for d, blob, s in zip(batch[id_col], batch["shingles"], batch["s"]):
            p = int(s) - math.ceil(threshold * int(s) - 1e-12) + 1
            pref = np.frombuffer(blob, dtype=np.uint64)[:p]
            gids.append(pref)
            docs.append(np.full(len(pref), d, dtype=np.int64))
            sizes.append(np.full(len(pref), s, dtype=np.int64))
        if not gids:
            return pd.DataFrame({"gid": pd.Series([], dtype=np.int64),
                                 "doc": pd.Series([], dtype=np.int64),
                                 "s": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({
            "gid": np.concatenate(gids).view(np.int64),
            "doc": np.concatenate(docs),
            "s": np.concatenate(sizes),
        })

    exploded = feat.map_batches(prefix_explode, batch_format="pandas", batch_size=None)

    # pair generation: ONE bounded exchange (gid hash % P partitions —
    # NOT one Ray group per gid: map_groups pays per-group task/frame
    # overhead, ~10x slower at 1e5+ distinct gids), then fully
    # vectorized segmented candidate expansion inside each partition.
    P = join_partitions

    def tag_gid_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_part"] = (
            batch["gid"].to_numpy().view(np.uint64) % np.uint64(P)
        ).astype(np.int32)
        return batch

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        gid = g["gid"].to_numpy(np.int64)
        docs = g["doc"].to_numpy(np.int64)
        # the pair key packs (min_id << 32) | max_id into ONE int64 for
        # the distinct exchange; ids at/above 2^32 would silently
        # corrupt pairs (and >= 2^31 would sign-overflow the shift) —
        # fail loudly instead of merging distinct pairs
        if len(docs) and (docs.min() < 0 or docs.max() >= (1 << 31)):
            raise ValueError(
                "ssjoin_prefix: doc ids must be in [0, 2^31) for the packed "
                "pair key; remap ids (factorize) before the join"
            )
        sizes = g["s"].to_numpy(np.int64)
        order = np.lexsort((docs, sizes, gid))
        gid, docs, sizes = gid[order], docs[order], sizes[order]
        seg = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
        seg_end = np.r_[seg[1:], len(gid)]
        chunks = []
        for st, en in zip(seg, seg_end):
            m = int(en - st)
            if m < 2:
                continue
            if m > bucket_warn:
                logging.getLogger(__name__).warning(
                    "ssjoin_prefix: prefix bucket of %d docs (gid hot key); "
                    "processed exactly — consider df-ordered prefixes", m,
                )
            s_seg = sizes[st:en]
            d_seg = docs[st:en]
            # sizes ascending: candidate j for i only while t*|b| <= |a|.
            # The bound must be CONSERVATIVE: plain s/threshold in float
            # drops exact-boundary sizes (7/0.28 = 24.999999999999996
            # excludes |b| = 25 even though J = 7/25 passes the verify
            # step) — widen by a relative epsilon; the exact Jaccard
            # verify downstream discards any extra candidates, so the
            # filter stays a pure (lossless) prune.
            bound = s_seg / threshold * (1.0 + 1e-12) + 1e-9
            hi = np.searchsorted(s_seg, bound, side="right")
            cnt = np.maximum(hi - np.arange(1, m + 1), 0)
            tot = int(cnt.sum())
            if not tot:
                continue
            i_idx = np.repeat(np.arange(m), cnt)
            offs = np.cumsum(cnt) - cnt
            j_idx = np.arange(tot) - np.repeat(offs, cnt) + i_idx + 1
            a = d_seg[i_idx]
            b = d_seg[j_idx]
            keep = a != b
            if keep.any():
                pk = (np.minimum(a[keep], b[keep]) << 32) | np.maximum(
                    a[keep], b[keep])
                chunks.append(pk)
        if not chunks:
            return pd.DataFrame({"pk": pd.Series([], dtype=np.int64)})
        # partition-local dedup bounds the exchange payload
        return pd.DataFrame({"pk": np.unique(np.concatenate(chunks))})

    pairs = (
        exploded.map_batches(tag_gid_part, batch_format="pandas", batch_size=None)
        .groupby("_part")
        .map_groups(part_pairs, batch_format="pandas")
    )

    # global distinct on the pair key (the same pair surfaces from every
    # shared prefix token landing in a different gid partition): one
    # more bounded int-keyed exchange, P groups total
    def tag_pk_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_part"] = (
            batch["pk"].to_numpy().view(np.uint64) % np.uint64(P)
        ).astype(np.int32)
        return batch

    def unpack_unique(g: pd.DataFrame) -> pd.DataFrame:
        pk = np.unique(g["pk"].to_numpy(np.int64))
        return pd.DataFrame({"a": pk >> 32, "b": pk & np.int64(0xFFFFFFFF)})

    distinct = (
        pairs.map_batches(tag_pk_part, batch_format="pandas", batch_size=None)
        .groupby("_part")
        .map_groups(unpack_unique, batch_format="pandas")
    ).materialize()

    empty = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                          "b": pd.Series([], dtype=np.int64),
                          "jaccard": pd.Series([], dtype=np.float64)})
    if distinct.count() == 0:
        import ray.data

        return ray.data.from_pandas(empty)

    from .join import partition_merge_join

    def _rename(mapping):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            return df.rename(columns=mapping)

        return f

    # candidate pairs are SPARSE after the size filter: use the
    # partition-merge join (int-keyed exchange + in-partition merge)
    # rather than Dataset.join, whose hash-shuffle setup dominates on
    # small probe sides
    sh_a = feat.drop_columns(["s"]).map_batches(
        _rename({id_col: "a", "shingles": "sh_a"}),
        batch_format="pandas", batch_size=None)
    sh_b = feat.drop_columns(["s"]).map_batches(
        _rename({id_col: "b", "shingles": "sh_b"}),
        batch_format="pandas", batch_size=None)
    with_a = partition_merge_join(
        distinct, sh_a, on="a", how="inner", num_partitions=join_partitions)
    with_b = partition_merge_join(
        with_a, sh_b, on="b", how="inner", num_partitions=join_partitions)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return empty
        jac = np.empty(len(df))
        for i, (ba, bb) in enumerate(zip(df["sh_a"], df["sh_b"])):
            sa = np.frombuffer(ba, dtype=np.uint64)
            sb = np.frombuffer(bb, dtype=np.uint64)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            jac[i] = inter / union if union else 0.0
        keep = jac >= threshold
        return pd.DataFrame({"a": df["a"].to_numpy(np.int64)[keep],
                             "b": df["b"].to_numpy(np.int64)[keep],
                             "jaccard": jac[keep]})

    return with_b.map_batches(verify, batch_format="pandas", batch_size=None)
