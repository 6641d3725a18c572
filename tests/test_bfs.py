"""BFS hops: broadcast fast path == exchange fallback == hand BFS."""

import collections

import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.stages.graph import bfs_hops


def _hand_bfs(edges, source, max_hops):
    adj = collections.defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    dist = {source: 0}
    frontier = [source]
    for h in range(1, max_hops + 1):
        nxt = []
        for n in frontier:
            for m in adj[n]:
                if m not in dist:
                    dist[m] = h
                    nxt.append(m)
        if not nxt:
            break
        frontier = nxt
    return dist


@pytest.fixture(scope="module")
def graph(ray_session):
    rng = np.random.default_rng(7)
    edges = set()
    # a long chain (exercises hop depth) plus random clutter
    for i in range(12):
        edges.add((i, i + 1))
    for _ in range(300):
        u, v = rng.integers(0, 80, size=2)
        if u != v:
            edges.add((int(min(u, v)), int(max(u, v))))
    # an unreachable island
    edges.add((900, 901))
    return sorted(edges)


def _got(ds):
    df = ds.to_pandas()
    return dict(zip(df["node"].astype(int), df["hop"].astype(int)))


def test_broadcast_path_matches_hand_bfs(ray_session, graph):
    import ray.data

    eds = ray.data.from_pandas(pd.DataFrame(graph, columns=["u", "v"]))
    for max_hops in (1, 3, 5):
        got = _got(bfs_hops(eds, source=0, max_hops=max_hops))
        assert got == _hand_bfs(graph, 0, max_hops)


def test_exchange_fallback_matches(ray_session, graph):
    import ray.data

    eds = ray.data.from_pandas(pd.DataFrame(graph, columns=["u", "v"]))
    # broadcast_limit=0 forces the exchange path from round 1
    got = _got(bfs_hops(eds, source=0, max_hops=4, broadcast_limit=0,
                        num_partitions=4))
    assert got == _hand_bfs(graph, 0, 4)


def test_isolated_source(ray_session):
    import ray.data

    eds = ray.data.from_pandas(pd.DataFrame({"u": [1], "v": [2]}))
    got = _got(bfs_hops(eds, source=77, max_hops=3))
    assert got == {77: 0}
