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
