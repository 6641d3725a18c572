"""Dedup + similarity stages with planted duplicates."""

import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.stages.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
    union_find_clusters,
)
from spectral_time_series_ray.stages.similarity import (
    ann_brute_force,
    embedding_near_dup,
    ivf_search,
    kmeans_fit,
)


def corpus():
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(300)]
    docs = []
    for i in range(40):
        docs.append(" ".join(rng.choice(words, 60)))
    # exact dups: 40,41 copy doc0; 42 copies doc1
    docs.append(docs[0])
    docs.append(docs[0])
    docs.append(docs[1])
    # near dups: doc2 with one word changed (43), two words (44)
    t = docs[2].split(); t[5] = "CHANGED"; docs.append(" ".join(t))
    t2 = docs[2].split(); t2[5], t2[30] = "X", "Y"; docs.append(" ".join(t2))
    return pd.DataFrame({"doc_id": range(len(docs)), "text": docs})


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    return ray.data.from_pandas(corpus()).materialize()


def test_exact_dedup(docs_ds):
    out = exact_dedup(docs_ds).to_pandas().sort_values("doc_id")
    assert len(out) == 42  # 45 docs - 3 exact dup copies
    d0 = out[out["doc_id"] == 0]
    assert d0["n_dups"].iloc[0] == 3  # doc0 + 2 copies
    assert out[out["doc_id"] == 1]["n_dups"].iloc[0] == 2
    assert set(out["doc_id"]).isdisjoint({40, 41, 42})  # keepers are min ids


def test_minhash_lsh_dedup_finds_planted(docs_ds):
    out = minhash_lsh_dedup(docs_ds, threshold=0.5, concurrency=2)
    clusters = dict(zip(out["doc_id"], out["cluster_id"]))
    # exact copies cluster with doc0
    assert clusters.get(40) == clusters.get(0) == 0
    assert clusters.get(41) == 0
    # near dups cluster with doc2
    assert clusters.get(43) == clusters.get(2)
    assert clusters.get(44) == clusters.get(2)
    keepers = set(out.loc[out["is_keeper"], "doc_id"])
    assert 0 in keepers and 40 not in keepers


def test_simhash_dedup_exact_copies(docs_ds):
    out = simhash_dedup(docs_ds, max_hamming=3, concurrency=2)
    clusters = dict(zip(out["doc_id"], out["cluster_id"]))
    assert clusters.get(40) == clusters.get(0)
    assert clusters.get(41) == clusters.get(0)


def test_ngram_jaccard_dedup_distributed(docs_ds):
    """Distributed exact-Jaccard dedup: LSH candidates verified with
    the true shingle-set Jaccard — exact copies join at threshold near
    1, near-dups join at 0.5, unrelated docs never join."""
    from spectral_time_series_ray.stages.dedup import ngram_jaccard_dedup

    out = ngram_jaccard_dedup(docs_ds, threshold=0.5, concurrency=2)
    clusters = dict(zip(out["doc_id"], out["cluster_id"]))
    assert clusters.get(40) == clusters.get(0) == 0
    assert clusters.get(41) == 0
    assert clusters.get(43) == clusters.get(2)
    jac = dict(zip(out["doc_id"], out["jaccard"]))
    assert jac[40] == 1.0  # exact copy: exact jaccard is exactly 1
    assert 0.5 <= jac[43] < 1.0  # near dup
    # unrelated docs (1 vs 0) never share a cluster
    assert clusters.get(1) is None or clusters.get(1) != clusters.get(0)
    # high threshold drops the near-dup edge but keeps exact copies
    strict = ngram_jaccard_dedup(docs_ds, threshold=0.99, concurrency=2)
    sc = dict(zip(strict["doc_id"], strict["cluster_id"]))
    assert sc.get(40) == sc.get(0) == 0
    assert sc.get(43) is None or sc.get(43) != sc.get(2)


def test_ngram_jaccard_verify():
    df = corpus()
    texts = dict(zip(df["doc_id"], df["text"]))
    pairs = ngram_jaccard_pairs(texts, [(0, 40), (2, 43), (0, 1)])
    j = dict(zip(zip(pairs["a"], pairs["b"]), pairs["jaccard"]))
    assert j[(0, 40)] == 1.0          # identical
    assert 0.7 < j[(2, 43)] < 1.0     # near dup
    assert j[(0, 1)] < 0.2            # unrelated


def test_union_find():
    c = union_find_clusters([(1, 2), (2, 3), (5, 6)])
    assert c[1] == c[2] == c[3] == 1
    assert c[5] == c[6] == 5


def embeddings_fixture():
    rng = np.random.default_rng(1)
    base = rng.standard_normal((50, 16))
    # plant near-dups: 50 = 0 + tiny noise, 51 = 1 + tiny noise
    dups = np.vstack([base[0] + 0.001 * rng.standard_normal(16),
                      base[1] + 0.001 * rng.standard_normal(16)])
    m = np.vstack([base, dups])
    return pd.DataFrame({"vec_id": range(len(m)), "embedding": list(m)})


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data

    return ray.data.from_pandas(embeddings_fixture()).materialize()


def test_ann_brute_force_topk(emb_ds):
    df = embeddings_fixture()
    q = np.stack(df["embedding"].iloc[[0]])
    out = ann_brute_force(emb_ds, q, k=3, concurrency=2).to_pandas()
    assert len(out) == 3
    top2 = set(out.sort_values("score", ascending=False)["vec_id"].head(2))
    assert top2 == {0, 50}  # itself + planted near-dup


def test_ann_exact_vs_numpy(emb_ds):
    df = embeddings_fixture()
    m = np.stack(df["embedding"])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    q = mn[5]
    scores = mn @ q
    exp_top = set(np.argsort(-scores)[:5])
    out = ann_brute_force(emb_ds, m[5][None, :], k=5, concurrency=2).to_pandas()
    assert set(out["vec_id"]) == exp_top


def test_kmeans_deterministic():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((200, 8))
    c1 = kmeans_fit(x, 4, seed=7)
    c2 = kmeans_fit(x, 4, seed=7)
    np.testing.assert_array_equal(c1, c2)


def test_ivf_search_finds_neighbor(emb_ds):
    df = embeddings_fixture()
    q = np.stack(df["embedding"].iloc[[0]])
    out = ivf_search(emb_ds, q, k=3, n_clusters=4, nprobe=2, concurrency=2).to_pandas()
    # the planted near-dup shares the query's cluster -> must be found
    assert 50 in set(out["vec_id"])


def test_embedding_near_dup_pairs(emb_ds):
    pairs = embedding_near_dup(emb_ds, threshold=0.99, n_planes=8, dim=16, concurrency=2)
    found = {(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])}
    assert (0, 50) in found and (1, 51) in found


def test_topk_deterministic_ties():
    """Ties at the k-th score boundary resolve to the LOWEST ids, even
    on the argpartition fast path (n > 4k)."""
    import numpy as np

    from spectral_time_series_ray.stages.similarity import _topk_deterministic

    n, k = 40, 3
    s = np.full(n, 0.1)
    s[7] = 1.0            # clear winner
    ties = [29, 4, 17, 11, 23]
    s[ties] = 0.5         # five-way tie for ranks 2..6
    ids = np.arange(100, 100 + n)
    idx = _topk_deterministic(s, ids, k)
    assert list(ids[idx]) == [107, 104, 111]  # winner, then lowest tied ids
    # small-n path agrees
    idx2 = _topk_deterministic(s[:16], ids[:16], k)
    assert list(ids[idx2]) == [107, 104, 111]


def test_kmeans_fit_distributed(ray_session):
    """Distributed Lloyd recovers planted clusters; objective (mean
    max-cosine) is non-decreasing; predict covers every vector."""
    import ray.data

    from spectral_time_series_ray.stages.similarity import (
        kmeans_fit_distributed,
        kmeans_predict,
    )

    rng = np.random.default_rng(0)
    # 3 well-separated directions + small noise
    base = np.eye(3, 16, dtype=np.float64)
    vecs = np.vstack([
        base[i] + 0.05 * rng.standard_normal((200, 16)) for i in range(3)
    ])
    df = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": list(vecs)})
    ds = ray.data.from_pandas(df).repartition(4).materialize()
    cents, hist = kmeans_fit_distributed(ds, n_clusters=3, iters=5, seed=1)
    assert all(b >= a - 1e-9 for a, b in zip(hist, hist[1:]))
    assert hist[-1] > 0.95  # tight clusters: near-unit mean cosine
    out = kmeans_predict(ds, cents).to_pandas()
    assert len(out) == len(vecs)
    # planted groups land in distinct clusters with >95% purity
    labels = out.sort_values("vec_id")["cluster"].to_numpy()
    majors = set()
    for i in range(3):
        grp = labels[i * 200 : (i + 1) * 200]
        maj = np.bincount(grp).argmax()
        assert (grp == maj).mean() > 0.95
        majors.add(int(maj))
    assert len(majors) == 3


def test_minhash_cc_distributed_matches_driver(docs_ds):
    """The cc='distributed' clustering stage (hash-min label
    propagation, nothing pair-shaped on the driver) must produce the
    identical clustering to driver union-find on the SAME verified
    pairs (built once — the expensive minhash stage is shared)."""
    from spectral_time_series_ray.stages.dedup import (
        minhash_verified_pairs,
        union_find_clusters,
    )
    from spectral_time_series_ray.stages.graph import (
        components_to_clusters,
        connected_components,
    )

    pairs_ds = minhash_verified_pairs(docs_ds, threshold=0.5, concurrency=2)
    pairs_df = pairs_ds.to_pandas().drop_duplicates(["a", "b"])
    assert len(pairs_df) > 0
    exp = union_find_clusters(
        list(zip(pairs_df["a"].astype(int), pairs_df["b"].astype(int)))
    )
    got = components_to_clusters(
        connected_components(pairs_ds.select_columns(["a", "b"]), num_partitions=4)
    )
    assert dict(zip(got["doc_id"].astype(int), got["cluster_id"].astype(int))) == exp
    assert set(got.loc[got["is_keeper"], "doc_id"].astype(int)) == set(exp.values())

    # the contraction path (what minhash_lsh_dedup cc='distributed'
    # actually uses) must agree as well
    from spectral_time_series_ray.stages.graph import (
        connected_components_contract,
    )

    got2 = components_to_clusters(
        connected_components_contract(
            pairs_ds.select_columns(["a", "b"]), num_partitions=4)
    )
    assert dict(zip(got2["doc_id"].astype(int), got2["cluster_id"].astype(int))) == exp


# ----------------------------------------------------- product quantization


def test_pq_fit_shapes_and_determinism():
    from spectral_time_series_ray.stages.similarity import pq_fit

    rng = np.random.default_rng(3)
    x = rng.standard_normal((300, 16))
    b1 = pq_fit(x, m=4, n_codes=16, seed=9)
    b2 = pq_fit(x, m=4, n_codes=16, seed=9)
    assert b1.shape == (4, 16, 4)
    np.testing.assert_array_equal(b1, b2)


def test_pq_encode_reconstruction_improves_with_codes(ray_session):
    """More codes per subspace -> lower quantization error (sanity that
    encode picks the NEAREST codeword, not an arbitrary one)."""
    import ray.data

    from spectral_time_series_ray.stages.similarity import (
        _normalize, pq_encode, pq_fit,
    )

    rng = np.random.default_rng(4)
    m = rng.standard_normal((200, 16))
    df = pd.DataFrame({"vec_id": range(200), "embedding": list(m)})
    ds = ray.data.from_pandas(df)
    xn = _normalize(m)

    def recon_err(n_codes):
        books = pq_fit(xn, m=4, n_codes=n_codes, seed=5)
        enc = pq_encode(ds, books, concurrency=2).to_pandas().sort_values("vec_id")
        codes = np.stack(enc["pq_code"])
        rec = np.concatenate(
            [books[j][codes[:, j]] for j in range(4)], axis=1
        )
        return float(((xn - rec) ** 2).sum(axis=1).mean())

    e4, e64 = recon_err(4), recon_err(64)
    assert e64 < e4


def test_pq_search_matches_brute_force(emb_ds):
    """With exact re-rank and a shortlist covering the corpus, PQ search
    returns EXACTLY the brute-force top-k (same ids, same scores)."""
    from spectral_time_series_ray.stages.similarity import ann_brute_force, pq_search

    df = embeddings_fixture()
    q = np.stack(df["embedding"].iloc[[0]])
    got = pq_search(emb_ds, q, k=3, m=4, n_codes=16, shortlist=60,
                    concurrency=2).to_pandas()
    exp = ann_brute_force(emb_ds, q, k=3, concurrency=2).to_pandas()
    assert list(got["vec_id"]) == list(exp["vec_id"])
    np.testing.assert_allclose(got["score"], exp["score"], rtol=1e-12)


def test_pq_search_tight_shortlist_recall(emb_ds):
    """Genuine ADC pruning (shortlist < corpus) still recalls the
    planted near-duplicate as the top hit."""
    from spectral_time_series_ray.stages.similarity import pq_search

    df = embeddings_fixture()
    q = np.stack(df["embedding"].iloc[[0]])
    got = pq_search(emb_ds, q, k=3, m=4, n_codes=32, shortlist=10,
                    concurrency=2).to_pandas()
    top2 = set(got.sort_values("score", ascending=False)["vec_id"].head(2))
    assert top2 == {0, 50}


def test_semdedup_planted(emb_ds):
    from spectral_time_series_ray.stages.similarity import semdedup

    out = semdedup(emb_ds, n_clusters=4, eps=0.01, concurrency=2).to_pandas()
    # conservation: one row per input vector
    assert len(out) == 52 and out["vec_id"].is_unique
    m = out.set_index("vec_id")
    # planted pairs (0,50) and (1,51): exactly one of each survives
    for b, c in [(0, 50), (1, 51)]:
        assert bool(m.loc[b, "keep"]) != bool(m.loc[c, "keep"])
        assert m.loc[b, "cluster"] == m.loc[c, "cluster"]
    # non-dup members all keep=True: at most the 2 planted copies drop
    assert int(out["keep"].sum()) >= 50


def test_semdedup_max_group_shard():
    """Oversized clusters hash-shard with bounded subgroup size and
    still keep >= 1 member per true duplicate group within a shard."""
    from spectral_time_series_ray.stages.similarity import _components_dense

    adj = np.zeros((5, 5), dtype=bool)
    adj[0, 1] = adj[1, 0] = True
    adj[3, 4] = adj[4, 3] = True
    labels = _components_dense(adj)
    assert labels[0] == labels[1] and labels[3] == labels[4]
    assert labels[2] not in (labels[0], labels[3])
