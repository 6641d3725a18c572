"""Distributed connected components (hash-min label propagation) vs
the driver-side union-find oracle."""

import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.stages.dedup import union_find_clusters
from spectral_time_series_ray.stages.graph import (
    components_to_clusters,
    connected_components,
)


def _edges_ds(pairs):
    import ray.data

    df = pd.DataFrame(pairs, columns=["a", "b"]).astype(np.int64)
    return ray.data.from_pandas(df)


def test_cc_matches_union_find(ray_session):
    rng = np.random.default_rng(31)
    # two cliques, a 6-chain, stars, and random extra edges
    pairs = []
    for base in (100, 200):  # cliques of 5
        nodes = list(range(base, base + 5))
        pairs += [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1:]]
    pairs += [(300 + i, 300 + i + 1) for i in range(6)]  # chain
    pairs += [(400, 400 + i) for i in range(1, 8)]  # star
    pairs += [(int(a), int(b)) for a, b in rng.integers(500, 540, (30, 2)) if a != b]
    labels = connected_components(_edges_ds(pairs), num_partitions=4)
    got = components_to_clusters(labels)

    exp = union_find_clusters(pairs)
    assert dict(zip(got["doc_id"], got["cluster_id"])) == exp
    # keeper flag: exactly the component minima
    keepers = set(got.loc[got["is_keeper"], "doc_id"])
    assert keepers == set(exp.values())


def test_cc_chain_needs_multiple_rounds(ray_session):
    # a 12-node path: min label must travel 11 hops
    pairs = [(i, i + 1) for i in range(11)]
    labels = connected_components(_edges_ds(pairs), num_partitions=3)
    got = components_to_clusters(labels)
    assert (got["cluster_id"] == 0).all()
    assert len(got) == 12


def test_cc_unconverged_warns(ray_session):
    pairs = [(i, i + 1) for i in range(8)]
    with pytest.warns(UserWarning, match="no fixpoint"):
        connected_components(_edges_ds(pairs), max_rounds=1, num_partitions=2)


def _numpy_pagerank(edges_df, iters, damping=0.85):
    nodes = np.unique(np.concatenate([edges_df["src"], edges_df["dst"]]))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outd = np.zeros(n)
    src_i = edges_df["src"].map(idx).to_numpy()
    dst_i = edges_df["dst"].map(idx).to_numpy()
    np.add.at(outd, src_i, 1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dang = r[outd == 0].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, dst_i, r[src_i] / np.maximum(outd[src_i], 1))
        r = (1 - damping) / n + damping * (contrib + dang / n)
    return pd.DataFrame({"node": nodes, "rank": r})


def test_pagerank_matches_dense_power_iteration(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.graph import pagerank

    rng = np.random.default_rng(7)
    edges_df = (
        pd.DataFrame({"src": rng.integers(0, 300, 1500),
                      "dst": rng.integers(0, 300, 1500)})
        .drop_duplicates().reset_index(drop=True)
    )
    # add guaranteed dangling nodes (appear only as dst)
    edges_df = pd.concat(
        [edges_df, pd.DataFrame({"src": [0, 1], "dst": [9001, 9002]})],
        ignore_index=True,
    )
    got = (
        pagerank(ray.data.from_pandas(edges_df), iters=5, num_partitions=4)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    exp = _numpy_pagerank(edges_df, iters=5).sort_values("node").reset_index(drop=True)
    assert len(got) == len(exp)
    assert np.allclose(got["rank"].to_numpy(), exp["rank"].to_numpy(), atol=1e-12)
    assert abs(got["rank"].sum() - 1.0) < 1e-9  # rank mass conserved


def test_triangle_count_matches_brute_force(ray_session):
    import itertools

    import ray.data

    from spectral_time_series_ray.stages.graph import triangle_count

    rng = np.random.default_rng(11)
    n = 60
    pairs = set()
    for u, v in rng.integers(0, n, (400, 2)):
        if u != v:
            pairs.add((int(min(u, v)), int(max(u, v))))
    # brute force over node triples
    adj = {p: True for p in pairs}
    expected = sum(
        1 for a, b, c in itertools.combinations(range(n), 3)
        if (a, b) in adj and (a, c) in adj and (b, c) in adj
    )
    edges = ray.data.from_pandas(
        pd.DataFrame(sorted(pairs), columns=["u", "v"]).astype(np.int64)
    )
    got = triangle_count(edges, num_partitions=4)
    assert got == expected and expected > 0


# ------------------------------------ contraction-based CC (2 shuffles)


def test_cc_contract_matches_union_find(ray_session):
    from spectral_time_series_ray.stages.graph import (
        connected_components_contract,
    )

    rng = np.random.default_rng(77)
    pairs = []
    for base in (100, 200):  # cliques of 5
        nodes = list(range(base, base + 5))
        pairs += [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1:]]
    pairs += [(300 + i, 300 + i + 1) for i in range(6)]  # chain
    pairs += [(400, 400 + i) for i in range(1, 8)]  # star
    pairs += [(int(a), int(b)) for a, b in rng.integers(500, 540, (30, 2)) if a != b]
    labels = connected_components_contract(_edges_ds(pairs), num_partitions=4)
    got = components_to_clusters(labels)

    exp = union_find_clusters(pairs)
    assert dict(zip(got["doc_id"], got["cluster_id"])) == exp


def test_cc_contract_long_path_diameter_independent(ray_session):
    """A 400-node path would need 399 hash-min rounds; contraction
    finishes in its fixed 2 shuffles regardless of diameter."""
    from spectral_time_series_ray.stages.graph import (
        connected_components_contract,
    )

    pairs = [(i, i + 1) for i in range(399)]
    labels = connected_components_contract(_edges_ds(pairs), num_partitions=5)
    got = components_to_clusters(labels)
    assert (got["cluster_id"] == 0).all()
    assert len(got) == 400


def test_cc_contract_agrees_with_hashmin_random(ray_session):
    from spectral_time_series_ray.stages.graph import (
        connected_components_contract,
    )

    rng = np.random.default_rng(5)
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, 120, (150, 2)) if a != b]
    a = components_to_clusters(
        connected_components(_edges_ds(pairs), num_partitions=4))
    b = components_to_clusters(
        connected_components_contract(_edges_ds(pairs), num_partitions=3))
    assert dict(zip(a["doc_id"], a["cluster_id"])) == dict(
        zip(b["doc_id"], b["cluster_id"]))


def test_cc_contract_empty_edges_typed(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.graph import (
        connected_components_contract,
    )

    empty = ray.data.from_pandas(pd.DataFrame({
        "a": pd.Series([], dtype=np.int64),
        "b": pd.Series([], dtype=np.int64)}))
    got = components_to_clusters(
        connected_components_contract(empty, num_partitions=3))
    assert list(got.columns) == ["doc_id", "cluster_id", "is_keeper"]
    assert len(got) == 0


# --------------------------------- global row numbers (range exchange)


def test_global_row_number_exact_order(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.features import global_row_number

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "v": rng.integers(0, 50, 500),   # heavy ties
        "id": np.arange(500, dtype=np.int64),
    }).sample(frac=1.0, random_state=3).reset_index(drop=True)
    ds = ray.data.from_pandas(df).repartition(7)
    ranked, total = global_row_number(ds, "v", "id", num_partitions=5)
    got = ranked.to_pandas().sort_values("rn").reset_index(drop=True)
    assert total == 500
    exp = df.sort_values(["v", "id"], kind="mergesort").reset_index(drop=True)
    assert (got["rn"].to_numpy() == np.arange(1, 501)).all()
    assert (got["v"].to_numpy() == exp["v"].to_numpy()).all()
    assert (got["id"].to_numpy() == exp["id"].to_numpy()).all()

    # descending order
    ranked_d, _ = global_row_number(ds, "v", "id", descending=True,
                                    num_partitions=4)
    got_d = ranked_d.to_pandas().sort_values("rn").reset_index(drop=True)
    exp_d = df.sort_values(["v", "id"], ascending=[False, True],
                           kind="mergesort").reset_index(drop=True)
    assert (got_d["v"].to_numpy() == exp_d["v"].to_numpy()).all()
    assert (got_d["id"].to_numpy() == exp_d["id"].to_numpy()).all()
