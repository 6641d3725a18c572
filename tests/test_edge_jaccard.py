"""edge_jaccard vs a brute-force adjacency-set computation."""

import numpy as np
import pandas as pd
import pytest


def brute(edges):
    nb = {}
    for u, v in edges:
        nb.setdefault(u, set()).add(v)
        nb.setdefault(v, set()).add(u)
    out = {}
    for u, v in edges:
        c = len(nb[u] & nb[v])
        out[(u, v)] = (len(nb[u]), len(nb[v]), c)
    return out


@pytest.mark.parametrize("seed", [1, 2])
def test_edge_jaccard_matches_bruteforce(ray_session, seed):
    import ray.data

    from spectral_time_series_ray.stages.graph import edge_jaccard

    rng = np.random.default_rng(seed)
    n = 40
    pairs = set()
    while len(pairs) < 120:
        a, b = rng.integers(0, n, 2)
        if a != b:
            pairs.add((min(int(a), int(b)), max(int(a), int(b))))
    edges = sorted(pairs)
    ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["u", "v"]))
    got = edge_jaccard(ds, num_partitions=4).to_pandas()
    exp = brute(edges)
    assert len(got) == len(edges)
    for _, r in got.iterrows():
        du, dv, c = exp[(int(r["u"]), int(r["v"]))]
        assert (int(r["du"]), int(r["dv"]), int(r["common"])) == (du, dv, c)


def test_edge_jaccard_triangle_plus_pendant(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.graph import edge_jaccard

    # triangle 1-2-3 plus pendant 3-4
    ds = ray.data.from_pandas(pd.DataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], columns=["u", "v"]))
    got = edge_jaccard(ds, num_partitions=2).to_pandas()
    got = {(int(r["u"]), int(r["v"])): int(r["common"])
           for _, r in got.iterrows()}
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 1, (3, 4): 0}
