"""Similarity search over an embedding column (``list<float>``).

- :func:`ann_brute_force` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch does one numpy matmul,
  emits per-batch partial top-k, and the small partials are merged
  exactly. The baseline and the oracle-checkable path.
- :func:`ivf_search` — IVF scale path: k-means centroids fitted on a
  driver-side sample (seeded), batches assign vectors to their nearest
  centroid, and queries probe only ``nprobe`` inverted lists.
- :func:`embedding_near_dup` — near-duplicate pairs via random-
  hyperplane LSH (SimHash on embeddings) + in-bucket cosine verify.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

log = logging.getLogger(__name__)


def _to_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-12)


def _topk_deterministic(s: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k scores with ties broken by ascending id —
    deterministic even at the k-th-position score boundary (a plain
    argpartition picks arbitrary tie members, so a tied lower-id vector
    could be dropped from a batch partial and the final merge would
    disagree with the documented (score desc, id asc) order)."""
    n = len(s)
    k = min(k, n)
    if k == 0:
        return np.array([], dtype=np.int64)
    if n > 4 * k:
        cand = np.argpartition(-s, k - 1)[:k]
        thr = s[cand].min()
        cand = np.flatnonzero(s >= thr)  # include ALL ties at the boundary
    else:
        cand = np.arange(n)
    order = np.lexsort((ids[cand], -s[cand]))[:k]
    return cand[order]


class _ScoreBatch:
    """Actor: query matrix fetched from the object store once."""

    def __init__(self, q_ref, k: int, id_col: str):
        import ray

        q = ray.get(q_ref)
        self.q = _normalize(np.atleast_2d(np.asarray(q, dtype=np.float64)))
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(_to_matrix(batch["embedding"]))
        scores = m @ self.q.T  # [batch, n_queries]
        ids = batch[self.id_col].to_numpy()
        out = []
        for qi in range(self.q.shape[0]):
            s = scores[:, qi]
            idx = _topk_deterministic(s, ids, self.k)
            out.append(
                pd.DataFrame(
                    {"query_id": qi, self.id_col: ids[idx], "score": s[idx]}
                )
            )
        return pd.concat(out, ignore_index=True)


def ann_brute_force(ds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id", concurrency: int = 4):
    """Exact top-k by cosine; ties broken by ascending id (stable for
    oracle comparison). Returns a Dataset (query_id, id, score)."""
    import ray

    q_ref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = ds.map_batches(
        _ScoreBatch,
        fn_constructor_args=(q_ref, k, id_col),
        batch_format="pandas",
        batch_size=4096,
        concurrency=concurrency,
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True]).head(k)
        return g.reset_index(drop=True)

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def _bounded_sample_matrix(ds, col: str, max_rows: int, seed: int) -> np.ndarray:
    """Driver-side init sample capped at an ABSOLUTE row count: a
    corpus-fraction sample would pull terabytes at 100 TB. ``count()``
    on a parquet-backed Dataset is metadata-only; the sampled rows are
    additionally ``limit``-ed so the bound holds even where the
    fraction over-delivers."""
    n = ds.count()
    keep = ds.select_columns([col])
    frac = min(1.0, max_rows / max(1, n))
    if frac < 1.0:
        keep = keep.random_sample(frac, seed=seed)
    return _to_matrix(keep.limit(max_rows).to_pandas()[col])


def kmeans_fit_distributed(
    ds,
    n_clusters: int = 8,
    iters: int = 8,
    col: str = "embedding",
    seed: int = 42,
    max_sample_rows: int = 50_000,
):
    """Distributed spherical k-means (Lloyd): centroids broadcast per
    iteration (``ray.put`` once per iter), each batch emits ONE
    (vector-sum, count, sim-sum) partial row per cluster — per
    iteration the driver sees O(blocks x k) small rows, never vectors.
    Initialization = driver-side k-means over a sample capped at
    ``max_sample_rows`` (absolute, not a corpus fraction).

    Returns ``(centroids [k, d] unit-norm, objective history)`` where
    objective = mean max-cosine-similarity; Lloyd steps make it
    non-decreasing (the self-check used by emb_kmeans).
    """
    import ray

    sample = _bounded_sample_matrix(ds, col, max_sample_rows, seed)
    centroids = kmeans_fit(sample, n_clusters, iters=3, seed=seed)
    k = len(centroids)
    history: list[float] = []
    for _ in range(iters):
        ref = ray.put(centroids)

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(ref)  # object-store local after first fetch
            m = _normalize(_to_matrix(batch[col]))
            sims = m @ c.T
            a = np.argmax(sims, axis=1)
            best = sims[np.arange(len(m)), a]
            d = m.shape[1]
            sums = np.zeros((len(c), d))
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=len(c)).astype(np.int64)
            sim_sums = np.zeros(len(c))
            np.add.at(sim_sums, a, best)
            return pd.DataFrame(
                {
                    "cluster": np.arange(len(c), dtype=np.int32),
                    "vec_sum": [s.tobytes() for s in sums],
                    "count": counts,
                    "sim_sum": sim_sums,
                }
            )

        parts = ds.map_batches(
            partial, batch_format="pandas", batch_size=None
        ).to_pandas()  # blocks x k tiny rows
        d = centroids.shape[1]
        sums = np.zeros((k, d))
        counts = np.zeros(k, dtype=np.int64)
        sim_total = 0.0
        for _, r in parts.iterrows():
            sums[r["cluster"]] += np.frombuffer(r["vec_sum"], dtype=np.float64)
            counts[r["cluster"]] += int(r["count"])
            sim_total += float(r["sim_sum"])
        n = int(counts.sum())
        history.append(sim_total / max(1, n))
        nonempty = counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
        centroids = _normalize(centroids)
    return centroids, history


def kmeans_predict(ds, centroids: np.ndarray, concurrency: int = 4):
    """Assign every ``embedding`` to its nearest centroid (broadcast
    once); adds a ``cluster`` column."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))
    return ds.map_batches(
        _IVFAssign, fn_constructor_args=(ref,), batch_format="pandas",
        batch_size=4096, concurrency=concurrency,
    )


def _kmeanspp_init(x: np.ndarray, k: int, rng) -> np.ndarray:
    """k-means++ seeding (Arthur & Vassilvitskii, SODA 2007) under
    cosine distance: D²-weighted draws keep seeds spread across real
    clusters — uniform seeding can land all k seeds in one dense
    cluster and Lloyd never recovers (merged centroids)."""
    k = min(k, len(x))
    cents = np.empty((k, x.shape[1]))
    cents[0] = x[rng.integers(len(x))]
    d2 = np.maximum(0.0, 1.0 - x @ cents[0]) ** 2
    for i in range(1, k):
        tot = d2.sum()
        j = rng.choice(len(x), p=d2 / tot) if tot > 0 else rng.integers(len(x))
        cents[i] = x[j]
        d2 = np.minimum(d2, np.maximum(0.0, 1.0 - x @ cents[i]) ** 2)
    return cents


def kmeans_fit(sample: np.ndarray, n_clusters: int, iters: int = 20, seed: int = 42) -> np.ndarray:
    """Seeded Lloyd's k-means (k-means++ init) on a driver-side sample."""
    rng = np.random.default_rng(seed)
    x = _normalize(sample)
    centroids = _kmeanspp_init(x, n_clusters, rng)
    for _ in range(iters):
        d = x @ centroids.T
        assign = np.argmax(d, axis=1)
        for c in range(len(centroids)):
            m = assign == c
            if m.any():
                centroids[c] = x[m].mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


class _IVFAssign:
    def __init__(self, cent_ref):
        import ray

        self.centroids = ray.get(cent_ref)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(_to_matrix(batch["embedding"]))
        out = batch.copy()
        out["cluster"] = np.argmax(m @ self.centroids.T, axis=1).astype(np.int32)
        return out


class _IVFSpillAssign:
    """Index each vector under its ``spill`` nearest centroids: rows
    are replicated per assigned list with the list id in ``cluster``
    (multiple assignment; dedup happens at query-merge time)."""

    def __init__(self, cent_ref, spill: int = 2):
        import ray

        self.centroids = ray.get(cent_ref)
        self.spill = max(1, int(spill))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(_to_matrix(batch["embedding"]))
        sims = m @ self.centroids.T
        s = min(self.spill, sims.shape[1])
        top = np.argpartition(-sims, s - 1, axis=1)[:, :s].astype(np.int32)
        out = pd.concat([batch] * s, ignore_index=True)
        out["cluster"] = top.T.reshape(-1)  # column-major: copy i gets top[:, i]
        return out


def ivf_search(
    ds,
    queries: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    max_sample_rows: int = 50_000,
    seed: int = 42,
    concurrency: int = 4,
    spill: int = 2,
):
    """IVF ANN: probe only the nprobe nearest inverted lists per query.

    Returns (query_id, id, score) — approximate: recall depends on
    nprobe/n_clusters; exactness is NOT guaranteed (use
    ann_brute_force as the oracle baseline).

    ``spill`` indexes each vector in its ``spill`` nearest lists
    (multiple assignment — the standard IVF fix for boundary vectors,
    cf. Jégou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011 §V): a vector is missed only when ALL its
    lists go unprobed, which lifts recall margin at every corpus size
    for ``spill/n_clusters`` extra index storage. Duplicated
    candidates are deduped in the final per-query merge.
    """
    import ray

    sample = _bounded_sample_matrix(ds, "embedding", max_sample_rows, seed)
    centroids = kmeans_fit(sample, n_clusters, seed=seed)
    cent_ref = ray.put(centroids)
    assigned = ds.map_batches(
        _IVFSpillAssign, fn_constructor_args=(cent_ref, spill),
        batch_format="pandas", batch_size=4096, concurrency=concurrency,
    )
    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    probe = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]  # [nq, nprobe]
    wanted = sorted({int(c) for row in probe for c in row})
    from .join import semi_join_keys

    candidates = semi_join_keys(assigned, wanted, "cluster")
    # cluster stays a COLUMN on every scored row: each batch filters its
    # rows against the per-query probe mask (a tiny [nq, n_clusters]
    # boolean broadcast) and emits deterministic partial top-k — no
    # driver-side id->cluster map, no per-row Python loop
    probe_mask = np.zeros((len(q), int(max(wanted)) + 1), dtype=bool)
    for qi in range(len(q)):
        probe_mask[qi, probe[qi]] = True
    q_ref = ray.put((q, probe_mask))

    class _ProbeScore:
        def __init__(self):
            self.q, self.mask = ray.get(q_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            m = _normalize(_to_matrix(batch["embedding"]))
            scores = m @ self.q.T  # [batch, nq]
            ids = batch[id_col].to_numpy()
            cl = batch["cluster"].to_numpy()
            out = []
            for qi in range(self.q.shape[0]):
                keep = self.mask[qi, cl]
                if not keep.any():
                    continue
                kid, kscore = ids[keep], scores[keep, qi]
                # spilled copies of a vector may BOTH be probed in this
                # batch; dedup ids first or duplicates crowd real
                # candidates out of the k partial slots
                _, first = np.unique(kid, return_index=True)
                kid, kscore = kid[first], kscore[first]
                idx = _topk_deterministic(kscore, kid, k)
                out.append(
                    pd.DataFrame(
                        {"query_id": qi, id_col: kid[idx], "score": kscore[idx]}
                    )
                )
            if not out:
                return pd.DataFrame(
                    {"query_id": pd.Series([], dtype="int64"),
                     id_col: pd.Series([], dtype="int64"),
                     "score": pd.Series([], dtype="float64")}
                )
            return pd.concat(out, ignore_index=True)

    partials = candidates.map_batches(
        _ProbeScore, batch_format="pandas", batch_size=4096,
        concurrency=concurrency,
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # spilled assignment can surface the same id from two probed
        # lists — dedup before the final cut
        g = g.sort_values(["score", id_col], ascending=[False, True])
        g = g.drop_duplicates(subset=id_col, keep="first").head(k)
        return g.reset_index(drop=True)

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


class _HyperplaneLSH:
    def __init__(self, planes_ref):
        import ray

        self.planes = ray.get(planes_ref)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(_to_matrix(batch["embedding"]))
        bits = (m @ self.planes.T) > 0  # [n, n_planes]
        key = np.zeros(len(m), dtype=np.int64)
        for j in range(self.planes.shape[0]):
            key |= bits[:, j].astype(np.int64) << j
        out = batch.copy()
        out["lsh_key"] = key
        return out


def embedding_near_dup(
    ds,
    threshold: float = 0.95,
    n_planes: int = 12,
    dim: int = 64,
    id_col: str = "vec_id",
    seed: int = 42,
    concurrency: int = 4,
) -> pd.DataFrame:
    """Near-duplicate embedding pairs (cosine >= threshold) found via
    random-hyperplane bucketing + in-bucket exact verify. Approximate
    recall (single LSH table); exact precision (pairs are verified)."""
    import ray

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    planes_ref = ray.put(planes)
    keyed = ds.map_batches(
        _HyperplaneLSH, fn_constructor_args=(planes_ref,), batch_format="pandas",
        batch_size=4096, concurrency=concurrency,
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > 1000:  # degenerate hot bucket: skip, but SAY so
            log.warning(
                "embedding_near_dup: skipping oversized LSH bucket (%d docs) "
                "— recall may drop for this corpus; raise n_planes",
                len(g),
            )
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        g = g.sort_values(id_col)
        m = _normalize(_to_matrix(g["embedding"]))
        ids = g[id_col].to_numpy()
        sims = m @ m.T
        ai, bi = np.triu_indices(len(ids), k=1)
        mask = sims[ai, bi] >= threshold
        return pd.DataFrame(
            {"a": ids[ai][mask], "b": ids[bi][mask], "cosine": sims[ai, bi][mask]}
        )

    # ONE bounded exchange (key hash % P), not one Ray group per
    # lsh_key — map_groups pays per-group task overhead once the key
    # space reaches 1e5+; inside a partition the buckets are plain
    # pandas groups
    try:
        import ray as _ray

        P = max(2, int(_ray.cluster_resources().get("CPU", 8)) // 2)
    except Exception:
        P = 4

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_part"] = (
            batch["lsh_key"].to_numpy(np.int64).view(np.uint64) % np.uint64(P)
        ).astype(np.int32)
        return batch

    def part_pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs = [bucket_pairs(g) for _, g in df.groupby("lsh_key", sort=False)]
        outs = [o for o in outs if len(o)]
        if not outs:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        return pd.concat(outs, ignore_index=True).drop_duplicates(["a", "b"])

    pairs = (
        keyed.map_batches(tag, batch_format="pandas", batch_size=None)
        .groupby("_part")
        .map_groups(part_pairs, batch_format="pandas")
        .to_pandas()
    )
    return pairs.drop_duplicates(["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)


# ------------------------------------------------------- product quantization


def pq_fit(
    sample: np.ndarray, m: int = 8, n_codes: int = 256, iters: int = 15,
    seed: int = 42,
) -> np.ndarray:
    """Train product-quantization codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011 §II) on a
    bounded driver-side sample: split the d dims into ``m`` subspaces
    and run plain Euclidean Lloyd k-means independently in each.

    Returns codebooks ``[m, n_codes, d//m]``. ``n_codes`` is clamped
    to the sample size so tiny corpora (tests at sf0.001) stay
    well-posed; at scale the sample is >> 256 and the clamp is inert.
    """
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    if n_codes > 256:
        raise ValueError(
            f"PQ n_codes={n_codes} exceeds the uint8 code range (256)")
    k = int(min(n_codes, max(2, n)))
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, sub), dtype=np.float64)
    for j in range(m):
        x = sample[:, j * sub:(j + 1) * sub]
        cent = x[rng.choice(n, size=k, replace=n < k)]
        xx = (x * x).sum(1)[:, None]  # invariant across iters
        for _ in range(iters):
            # matmul distance form + bincount centroid update: the
            # (n, k, sub) broadcast allocated ~100 MB of temporaries
            # per iteration and the per-cluster Python update ran
            # k x iters masked means (measured 8.2s for a 2000-row
            # sample; this path is ~60x faster, same assignments)
            d2 = xx - 2 * (x @ cent.T) + (cent * cent).sum(1)[None, :]
            a = d2.argmin(axis=1)
            sums = np.zeros((k, sub), dtype=np.float64)
            np.add.at(sums, a, x)
            cnts = np.bincount(a, minlength=k)
            nz = cnts > 0
            cent[nz] = sums[nz] / cnts[nz, None]
        books[j] = cent
    return books


class _PQEncode:
    """Actor: codebooks fetched once; encodes unit-normalized vectors
    to ``m`` uint8 codes per vector (d*4 bytes -> m bytes)."""

    def __init__(self, books_ref, col: str, id_col: str):
        import ray

        self.books = ray.get(books_ref)  # [m, k, sub]
        self.col, self.id_col = col, id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        x = _normalize(_to_matrix(batch[self.col]))
        m, k, sub = self.books.shape
        if k > 256:
            # codes are uint8: more centroids would silently wrap
            # modulo 256 and encode vectors against unrelated centroids
            raise ValueError(f"PQ n_codes={k} exceeds the uint8 code range (256)")
        codes = np.empty((len(x), m), dtype=np.uint8)
        for j in range(m):
            xs = x[:, j * sub:(j + 1) * sub]
            cent = self.books[j]
            d2 = (xs * xs).sum(1)[:, None] - 2 * xs @ cent.T + (cent * cent).sum(1)[None, :]
            codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
        return pd.DataFrame(
            {self.id_col: batch[self.id_col].to_numpy(), "pq_code": list(codes)}
        )


def pq_encode(
    ds, codebooks: np.ndarray, col: str = "embedding", id_col: str = "vec_id",
    concurrency: int = 4,
):
    """Encode every vector to its PQ codes: ``(id_col, pq_code
    list<uint8>)``. At 100 TB only this (32x smaller at d=64/m=8)
    representation is scanned by ADC search; raw vectors are touched
    again only for the tiny re-rank set."""
    import ray

    books_ref = ray.put(codebooks)
    return ds.map_batches(
        _PQEncode, fn_constructor_args=(books_ref, col, id_col),
        batch_format="pandas", batch_size=4096, concurrency=concurrency,
    )


class _ADCScore:
    """Asymmetric distance computation: per-query lookup tables
    ``LUT[m, k]`` of query-subvector · codebook-entry inner products;
    a vector's approximate cosine = sum over subspaces of
    ``LUT[j, code[j]]`` — one fancy-index gather per batch, raw
    vectors never read."""

    def __init__(self, lut_ref, shortlist: int, id_col: str):
        import ray

        self.luts = ray.get(lut_ref)  # [nq, m, k]
        self.shortlist, self.id_col = shortlist, id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        codes = np.stack(
            [np.asarray(c, dtype=np.uint8) for c in batch["pq_code"]]
        ).astype(np.int64)  # [n, m]
        ids = batch[self.id_col].to_numpy()
        n, m = codes.shape
        cols = np.arange(m)
        out = []
        for qi, lut in enumerate(self.luts):
            s = lut[cols[None, :], codes].sum(axis=1)  # [n]
            idx = _topk_deterministic(s, ids, self.shortlist)
            out.append(pd.DataFrame(
                {"query_id": qi, self.id_col: ids[idx], "adc_score": s[idx]}
            ))
        if not out:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"),
                 self.id_col: pd.Series([], dtype="int64"),
                 "adc_score": pd.Series([], dtype="float64")}
            )
        return pd.concat(out, ignore_index=True)


def pq_search(
    ds,
    queries: np.ndarray,
    k: int = 10,
    m: int = 8,
    n_codes: int = 256,
    shortlist: int = 100,
    id_col: str = "vec_id",
    col: str = "embedding",
    max_sample_rows: int = 50_000,
    seed: int = 42,
    concurrency: int = 4,
):
    """PQ-compressed ANN with exact re-rank (IVFADC without the coarse
    quantizer — compose with ``ivf_search``-style list pruning when
    list-level pruning is also needed):

    1. codebooks trained on an absolute-bounded driver sample,
    2. every vector PQ-encoded (``pq_encode``) — the only full scan,
    3. ADC over codes keeps a per-batch deterministic top-``shortlist``
       per query; global merge keeps the per-query shortlist,
    4. shortlisted ids (≤ nq·shortlist — parameter-bounded, never
       corpus-bounded) are re-scored EXACTLY against the raw vectors
       (semi-join + brute force), so precision of the final top-k is
       exact given the shortlist.

    Returns (query_id, id, score) with exact cosine scores.
    """
    import ray

    from .join import semi_join_keys

    sample = _normalize(_bounded_sample_matrix(ds, col, max_sample_rows, seed))
    books = pq_fit(sample, m=m, n_codes=n_codes, seed=seed)
    encoded = pq_encode(ds, books, col=col, id_col=id_col, concurrency=concurrency)

    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    nq, d = q.shape
    sub = d // m
    # LUT[qi, j, c] = q_sub · codebook entry  (ADC inner-product tables)
    luts = np.einsum("qjs,jcs->qjc", q.reshape(nq, m, sub), books)
    lut_ref = ray.put(luts)

    partials = encoded.map_batches(
        _ADCScore, fn_constructor_args=(lut_ref, shortlist, id_col),
        batch_format="pandas", batch_size=4096, concurrency=concurrency,
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["adc_score", id_col], ascending=[False, True])
        return g.head(shortlist).reset_index(drop=True)

    short = partials.groupby("query_id").map_groups(
        merge, batch_format="pandas"
    ).to_pandas()  # ≤ nq·shortlist rows — parameter-bounded
    cand_ids = sorted(set(short[id_col].tolist()))
    cands = semi_join_keys(ds, cand_ids, id_col)
    return ann_brute_force(cands, q, k=k, id_col=id_col, concurrency=concurrency)


# ------------------------------------------------------------------ SemDeDup


def _components_dense(adj: np.ndarray) -> np.ndarray:
    """Connected components of a small dense boolean adjacency matrix
    by vectorized min-label propagation; returns an int label per row.
    O(m^2 * diameter) — callers bound m (in-cluster pairwise scope)."""
    m = len(adj)
    labels = np.arange(m)
    a = adj | np.eye(m, dtype=bool)
    while True:
        # every node takes the min label over its neighborhood
        nxt = np.where(a, labels[None, :], m).min(axis=1)
        if np.array_equal(nxt, labels):
            return labels
        labels = nxt


def semdedup(
    ds,
    n_clusters: int = 16,
    eps: float = 0.05,
    id_col: str = "vec_id",
    col: str = "embedding",
    seed: int = 42,
    iters: int = 6,
    concurrency: int = 4,
    max_group: int = 4096,
    centroids: np.ndarray | None = None,
):
    """Semantic deduplication (SemDeDup, Abbas et al.,
    arXiv:2303.09540): k-means partitions the corpus so the O(m^2)
    pairwise-cosine scan runs only WITHIN a cluster; members whose
    cosine >= 1 - eps form semantic-duplicate groups (connected
    components of the threshold graph) and each group keeps exactly
    one representative — the member LEAST similar to its cluster
    centroid (the paper's keep-edge-examples rule), tie-broken by id.

    Scale shape: one k-means fit (mergeable partials — see
    :func:`kmeans_fit_distributed`), one broadcast assign pass, ONE
    cluster-key shuffle; each cluster is processed independently in a
    ``groupby.map_groups`` worker. Expected cluster size is
    corpus/n_clusters — size ``n_clusters`` to the corpus (the paper
    uses 50k clusters at web scale). Clusters larger than
    ``max_group`` are hash-sharded into bounded subgroups with a
    warning (duplicates split across shards can both survive — recall
    loss is logged, never silent).

    Returns a Dataset ``(id, cluster, centroid_sim, keep)`` with one
    row per input vector.
    """
    import ray

    if centroids is None:
        centroids, _ = kmeans_fit_distributed(
            ds, n_clusters=n_clusters, iters=iters, col=col, seed=seed
        )
    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))
    assigned = kmeans_predict(ds.select_columns([id_col, col]), centroids,
                              concurrency=concurrency)
    thresh = 1.0 - eps

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        cents = ray.get(cent_ref)
        cid = int(g["cluster"].iloc[0])
        gs = [g]
        if len(g) > max_group:
            log.warning(
                "semdedup: cluster %d has %d members > max_group=%d — "
                "hash-sharding; cross-shard duplicates may both survive "
                "(raise n_clusters for this corpus)",
                cid, len(g), max_group,
            )
            n_shards = int(np.ceil(len(g) / max_group))
            shard = (
                pd.util.hash_pandas_object(g[id_col], index=False).to_numpy()
                % n_shards
            )
            gs = [g[shard == s] for s in range(n_shards)]
        outs = []
        for sub in gs:
            if not len(sub):
                continue
            sub = sub.sort_values(id_col)
            m = _normalize(_to_matrix(sub[col]))
            ids = sub[id_col].to_numpy()
            csim = m @ cents[cid]
            adj = (m @ m.T) >= thresh
            comp = _components_dense(adj)
            # keeper per component: min centroid_sim, tie-break min id
            order = np.lexsort((ids, csim))  # by (csim, id)
            first_of_comp = np.zeros(len(ids), dtype=bool)
            seen: set[int] = set()
            for j in order:
                c = int(comp[j])
                if c not in seen:
                    seen.add(c)
                    first_of_comp[j] = True
            outs.append(
                pd.DataFrame(
                    {
                        id_col: ids,
                        "cluster": np.int32(cid),
                        "centroid_sim": csim,
                        "keep": first_of_comp,
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    return assigned.groupby("cluster").map_groups(
        dedup_cluster, batch_format="pandas"
    )


def pca_fit_distributed(ds, col: str = "embedding", k: int = 8):
    """Distributed PCA over an embedding column via exact moment
    partials: each block emits (n, sum, sum-of-outer-products) — one
    (d + d^2)-float row per block — so the driver only ever merges
    O(blocks * d^2) numbers, never rows. Population covariance
    (ddof=0) eigendecomposition; components returned with a
    deterministic sign convention (largest-|coord| entry positive).

    Returns (mean[d], components[k,d] row-major by descending
    eigenvalue, eigenvalues[d] descending, n_rows).
    """
    import numpy as np

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = _to_matrix(batch[col])
        s = m.sum(axis=0)
        o = (m.T @ m).ravel()
        return pd.DataFrame({"n": [len(m)],
                             "s": [s.astype(np.float64)],
                             "o": [o.astype(np.float64)]})

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=None).to_pandas()
    n = int(parts["n"].sum())
    if n == 0:
        raise ValueError("pca_fit_distributed: empty input")
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    o = np.sum(np.stack(parts["o"].to_numpy()), axis=0)
    d = len(s)
    mean = s / n
    cov = o.reshape(d, d) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    evals = evals[order]
    comps = evecs[:, order].T  # rows = components
    # deterministic sign: make the largest-|coord| entry positive
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps[:k], evals, n


def pca_project(ds, mean: np.ndarray, components: np.ndarray,
                col: str = "embedding", out_col: str = "pc"):
    """Project each row onto the fitted components (broadcast via
    ray.put; zero-copy matmul per batch). Adds ``out_col`` as a
    list<float64> column and ``recon_err2`` (squared reconstruction
    error using the kept components)."""
    import ray

    mc_ref = ray.put((np.asarray(mean, np.float64),
                      np.asarray(components, np.float64)))

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        mu, C = ray.get(mc_ref)
        m = _to_matrix(batch[col]) - mu
        z = m @ C.T
        resid = m - z @ C
        batch = batch.copy()
        batch[out_col] = list(z)
        batch["recon_err2"] = (resid ** 2).sum(axis=1)
        return batch

    return ds.map_batches(project, batch_format="pandas", batch_size=None)


def kcenter_greedy(
    ds,
    k: int = 8,
    col: str = "embedding",
    id_col: str = "vec_id",
    seed_id: int | None = None,
):
    """Greedy k-center coreset selection (Gonzalez 1985 farthest-point
    traversal — the 2-approximation used for diversity-aware training
    -data selection): iteratively add the point FARTHEST from the
    current centers. Distributed: centers broadcast per round
    (``ray.put`` of a [c, d] matrix), each batch emits ONE
    (max_min_dist, argmax_id, argmax_vec) partial row, the driver
    merges O(blocks) partials — vectors never shuffle and the driver
    holds only the k centers. k rounds => k passes; k is small by
    design (coresets, seeding, diverse eval suites).

    Returns (centers_df[id, vec], radius_history) where radius_history
    is the cover radius BEFORE each added center — non-increasing, and
    the final value is the k-center objective of the selection.
    """
    import ray

    first = (
        ds.select_columns([id_col, col]).limit(1).to_pandas()
        if seed_id is None
        else None
    )
    if seed_id is None:
        seed_vec = np.asarray(first[col].iloc[0], np.float64)
        seed = (int(first[id_col].iloc[0]), seed_vec)
    else:
        row = ds.map_batches(
            lambda b: b[b[id_col] == seed_id],
            batch_format="pandas", batch_size=None,
        ).to_pandas()
        seed = (seed_id, np.asarray(row[col].iloc[0], np.float64))

    ids = [seed[0]]
    centers = [seed[1]]
    radii = []
    for _ in range(1, k + 1):
        C = np.stack(centers)
        c_ref = ray.put(C)

        def farthest(batch: pd.DataFrame) -> pd.DataFrame:
            import ray as _ray

            Cm = _ray.get(c_ref)
            X = np.stack([np.asarray(v, np.float64) for v in batch[col]])
            # squared L2 to every center, min over centers
            d2 = (
                (X * X).sum(1, keepdims=True)
                - 2.0 * X @ Cm.T
                + (Cm * Cm).sum(1)[None, :]
            )
            dmin = d2.min(axis=1)
            j = int(np.argmax(dmin))
            return pd.DataFrame({
                "d2": [float(dmin[j])],
                "cand_id": [int(batch[id_col].iloc[j])],
                "cand_vec": [X[j]],
            })

        parts = ds.map_batches(
            farthest, batch_format="pandas", batch_size=4096
        ).to_pandas()  # O(blocks) rows
        best = parts.loc[parts["d2"].idxmax()]
        radii.append(float(np.sqrt(best["d2"])))
        if len(ids) >= k:
            break
        ids.append(int(best["cand_id"]))
        centers.append(np.asarray(best["cand_vec"], np.float64))
    out = pd.DataFrame({id_col: np.asarray(ids, np.int64),
                        "vec": centers})
    return out, radii
