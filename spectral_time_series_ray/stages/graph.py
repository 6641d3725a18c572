"""Distributed graph primitives over Ray Datasets.

``connected_components`` is the scale path for near-dup clustering:
the MinHash / embedding dedup pipelines produce a sparse verified-pair
edge list, and the driver-side union-find
(`dedup.union_find_clusters`) stops being viable once the pair list
itself outgrows driver memory (billions of near-dup pairs at corpus
scale). Hash-min label propagation keeps everything distributed:
labels (one row per node) and edges (one row per pair) only ever move
through hash shuffles; the driver sees a single int per round (the
label-sum convergence metric).

Algorithm (hash-min, the standard MapReduce CC formulation — see
Rastogi et al., "Finding Connected Components in Map-Reduce in
Logarithmic Rounds", ICDE 2013, for the pedigree and the
pointer-doubling variants): every node starts with label = node id;
each round every node takes the min of its own label and its
neighbors' labels; at fixpoint every component is labeled with its
minimum node id. Round count is O(component diameter) — near-dup
clusters are shallow (stars / small cliques), so a handful of rounds;
long-chain graphs should use the large-star/small-star variant noted
in the docstring.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _edge_partials(batch: pa.Table) -> pa.Table:
    """Symmetrize + per-batch min-label partials: for edge (a, b) emit
    (a, min(a, b)) and (b, min(a, b)), pre-reduced within the batch."""
    a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = np.minimum(a, b)
    t = pa.table(
        {
            "node": pa.array(np.concatenate([a, b])),
            "label": pa.array(np.concatenate([m, m])),
        }
    )
    return t.group_by(["node"]).aggregate([("label", "min")])


def connected_components(
    edges,
    max_rounds: int = 50,
    num_partitions: int | None = None,
):
    """Connected components of an undirected edge Dataset
    ``(a: int64, b: int64)``. Returns a Dataset ``(node, label)`` with
    one row per node that appears in any edge; ``label`` is the
    component's minimum node id.

    Per round: one hash join (edges x labels, propagating each
    endpoint's current label to the other endpoint) + one
    ``groupby(node).min`` merge. Labels only decrease, so the sum of
    labels is a monotone convergence metric — the driver pulls ONE
    int per round. Rounds are O(component diameter); ``max_rounds``
    guards pathological chains (use pointer doubling for those).
    """
    from ray.data.aggregate import Min

    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)

    # materialize edges ONCE: every propagation round joins against
    # them, and a lazy edges Dataset would re-execute its upstream
    # pipeline (e.g. an expensive dedup pair miner) twice per round —
    # pagerank and triangle_count in this module do the same
    edges = edges.materialize()

    # round 0: label = min(node, min over incident edges)
    labels = (
        edges.map_batches(_edge_partials, batch_format="pyarrow", batch_size=None)
        .groupby("node")
        .aggregate(Min("label_min", alias_name="label"))
        .materialize()
    )
    prev_sum = labels.sum("label")

    for _ in range(max_rounds):
        # propagate: for edge (a, b) the new candidate for b is
        # label(a) and vice versa; join once on a, once on b
        la = edges.join(
            labels, join_type="inner", num_partitions=P,
            on=("a",), right_on=("node",),
        ).select_columns(["b", "label"])

        def flip(batch: pa.Table) -> pa.Table:
            return pa.table({"node": batch["b"], "label": batch["label"]})

        lb = edges.join(
            labels, join_type="inner", num_partitions=P,
            on=("b",), right_on=("node",),
        ).select_columns(["a", "label"])

        def flip2(batch: pa.Table) -> pa.Table:
            return pa.table({"node": batch["a"], "label": batch["label"]})

        cand = (
            la.map_batches(flip, batch_format="pyarrow", batch_size=None)
            .union(lb.map_batches(flip2, batch_format="pyarrow", batch_size=None))
            .union(labels)
        )
        labels = (
            cand.groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:  # fixpoint: labels are monotone non-increasing
            return labels
        prev_sum = cur_sum
    import warnings

    warnings.warn(
        f"connected_components: no fixpoint after {max_rounds} rounds "
        "(long-chain graph?) — labels may be unconverged"
    )
    return labels


def components_to_clusters(labels) -> pd.DataFrame:
    """Materialize a (doc_id, cluster_id, is_keeper) frame from a CC
    label Dataset — same contract as `dedup.union_find_clusters`-based
    clustering (keeper = the component's min id)."""
    df = labels.to_pandas()
    if df.empty:  # Ray drops column metadata on empty datasets
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "cluster_id": pd.Series([], dtype=np.int64),
                             "is_keeper": pd.Series([], dtype=bool)})
    df = df.rename(columns={"node": "doc_id", "label": "cluster_id"})
    df = df.sort_values("doc_id").reset_index(drop=True)
    df["is_keeper"] = df["doc_id"] == df["cluster_id"]
    return df


def pagerank(
    edges,
    damping: float = 0.85,
    iters: int = 8,
    num_partitions: int | None = None,
):
    """Distributed PageRank (Page et al., 1999) over a directed edge
    Dataset ``(src: int64, dst: int64)`` by power iteration — the
    standard Pregel/MapReduce shape. Returns a Dataset
    ``(node, rank)`` with one row per node appearing in any edge.

    Exactly TWO exchanges per iteration (a first cut with
    partition-merge joins ran four and spent ~8 s/iter in pure
    scheduling on a 2k-node graph):

    1. ``union(edges tagged hash(src)%P, ranks tagged hash(node)%P)``
       → one ``groupby(_part).map_groups`` merge that emits per-edge
       contributions ``rank(src)/outdeg(src)`` toward each dst,
       pre-reduced by dst inside the partition.
    2. ``union(contribs tagged hash(dst)%P, STATIC node table tagged
       once)`` → one ``groupby(_part).map_groups`` that sums
       contributions per node, left-joins the node table (nodes with
       no in-edges keep the teleport term), and emits the new rank
       vector — fusing the groupby-sum and the join-back into one
       pass.

    Dangling mass (rank parked on nodes without out-edges) is read
    from the PREVIOUS iteration's materialized rank vector with one
    shuffle-free scan aggregate: ``sum(rank where outdeg == 0)`` —
    exact, no mid-pipeline barrier. Edges and the node side are
    tagged + materialized once, so an expensive upstream edge
    pipeline runs once, not per iteration. Rank vectors only ever
    move through int-keyed hash exchanges; the driver sees one float
    per round.
    """
    edges = edges.materialize()
    if num_partitions is None:
        # size P by edge volume (~32 MB of raw edges per partition)
        # with a small floor — the cluster-CPU floor is pure overhead
        # on small graphs (see triangle_count)
        m = edges.count()
        num_partitions = max(4, -(-m * 24 // (32 << 20)))
    P = num_partitions
    # coalesce the input: edge lists built by groupby fans arrive as
    # many ragged blocks, and every iteration re-unions them (measured
    # 58 s -> 11 s for 4 iterations on 587k edges after coalescing)
    if edges.num_blocks() > 4 * P:
        edges = edges.repartition(4 * P).materialize()

    # node table + out-degrees (one pass over edges)
    def ends(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({"node": pa.array(np.concatenate([s, d])),
                      "outd": pa.array(np.concatenate([np.ones(len(s), np.int64),
                                                       np.zeros(len(d), np.int64)]))})
        return t.group_by(["node"]).aggregate([("outd", "sum")])

    def _tag(df: pd.DataFrame, key: str) -> np.ndarray:
        return (
            pd.util.hash_pandas_object(df[key], index=False).to_numpy() % P
        ).astype(np.int32)

    # exchange-0 (setup): out-degree rollup; nodes side stays tagged +
    # materialized for every iteration's update pass
    from ray.data.aggregate import Sum

    nodes = (
        edges.map_batches(ends, batch_format="pyarrow", batch_size=None)
        .groupby("node")
        .aggregate(Sum("outd_sum", alias_name="outd"))
        .materialize()
    )
    n = nodes.count()
    base = (1.0 - damping) / n

    def node_side(batch: pd.DataFrame) -> pd.DataFrame:
        outd = batch["outd"].to_numpy(dtype=np.float64)
        out = pd.DataFrame({
            "node": batch["node"].to_numpy(np.int64),
            "w": np.full(len(batch), np.nan),          # NaN marks the node side
            "inv_outd": np.where(outd > 0, 1.0 / np.maximum(outd, 1.0), 0.0),
        })
        out["_part"] = _tag(out, "node")
        return out

    nodes_tagged = nodes.map_batches(
        node_side, batch_format="pandas", batch_size=None
    ).repartition(P).materialize()

    def edge_side(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "key": batch["src"].to_numpy(np.int64),
            "dst": batch["dst"].to_numpy(np.int64),
            "w": np.full(len(batch), np.nan),          # NaN marks the edge side
        })
        out["_part"] = _tag(out, "key")
        return out

    edges_tagged = edges.map_batches(
        edge_side, batch_format="pandas", batch_size=None
    ).repartition(P).materialize()

    # ranks start uniform: (node, rank, inv_outd)
    ranks = nodes_tagged.map_batches(
        lambda b: pd.DataFrame({
            "node": b["node"].to_numpy(np.int64),
            "rank": np.full(len(b), 1.0 / n),
            "inv_outd": b["inv_outd"].to_numpy(dtype=np.float64),
        }),
        batch_format="pandas", batch_size=None,
    ).materialize()

    def dangling_partial(batch: pd.DataFrame) -> pd.DataFrame:
        r = batch["rank"].to_numpy(dtype=np.float64)
        dead = batch["inv_outd"].to_numpy(dtype=np.float64) == 0.0
        return pd.DataFrame({"d": [float(r[dead].sum())]})

    for _ in range(iters):
        # shuffle-free scan: rank mass on nodes without out-edges
        dangling = (
            ranks.map_batches(dangling_partial, batch_format="pandas",
                              batch_size=None).sum("d")
            or 0.0
        )

        def rank_side(batch: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "key": batch["node"].to_numpy(np.int64),
                "dst": np.full(len(batch), -1, np.int64),   # filler; side is w-keyed
                "w": batch["rank"].to_numpy() * batch["inv_outd"].to_numpy(),
            })
            out["_part"] = _tag(out, "key")
            return out

        both = edges_tagged.union(
            ranks.map_batches(rank_side, batch_format="pandas", batch_size=None)
        )

        def contrib_part(g: pd.DataFrame) -> pd.DataFrame:
            is_rank = g["w"].notna().to_numpy()   # edge rows carry w = NaN
            rk = g.loc[is_rank, ["key", "w"]]
            ed = g.loc[~is_rank, ["key", "dst"]]
            m = ed.merge(rk, on="key", how="inner")
            if not len(m):
                return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                                     "w": pd.Series([], dtype=np.float64),
                                     "_part": pd.Series([], dtype=np.int32)})
            out = m.groupby("dst", as_index=False)["w"].sum()
            out.columns = ["node", "w"]
            out["_part"] = _tag(out, "node")
            return out[["node", "w", "_part"]]

        contribs = both.groupby("_part").map_groups(
            contrib_part, batch_format="pandas"
        )

        def update_part(g: pd.DataFrame) -> pd.DataFrame:
            nd = g.loc[g["inv_outd"].notna(), ["node", "inv_outd"]]
            cb = g.loc[g["inv_outd"].isna(), ["node", "w"]]
            if len(cb):
                sums = cb.groupby("node", as_index=False)["w"].sum()
                nd = nd.merge(sums, on="node", how="left")
                w = np.nan_to_num(nd["w"].to_numpy(dtype=np.float64), nan=0.0)
            else:
                w = np.zeros(len(nd))
            return pd.DataFrame({
                "node": nd["node"].to_numpy(np.int64),
                "rank": base + damping * (w + dangling / n),
                "inv_outd": nd["inv_outd"].to_numpy(dtype=np.float64),
            })

        def contrib_pad(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            batch["inv_outd"] = np.nan                  # NaN marks the contrib side
            return batch[["node", "w", "inv_outd", "_part"]]

        merged = nodes_tagged.select_columns(["node", "w", "inv_outd", "_part"]).union(
            contribs.map_batches(contrib_pad, batch_format="pandas",
                                 batch_size=None)
        )
        # coalesce before materializing: map_groups emits a fan of tiny
        # blocks and a union-per-iteration loop otherwise accumulates
        # them (measured +64 blocks/iter -> 4x slower by iteration 4)
        ranks = merged.groupby("_part").map_groups(
            update_part, batch_format="pandas"
        ).repartition(P).materialize()

    return ranks.select_columns(["node", "rank"])


def _oriented_edges(edges, P: int):
    """Shared degree-attach + orientation core of :func:`triangle_count`
    and :func:`edge_jaccard`: two bounded exchanges produce each edge
    oriented low-degree-first (ties by id) with both endpoint degrees
    attached — columns (src, dst, du, dv, dk, _p3), where dk is the
    (deg, id) order key of dst and _p3 hash-partitions by src.
    Requires node ids in [0, 2^31) (packed int64 pair keys)."""

    def _tag(arr: np.ndarray) -> np.ndarray:
        return (
            pd.util.hash_pandas_object(pd.Series(arr), index=False).to_numpy() % P
        ).astype(np.int32)

    # exchange 1 input: one copy of each edge per endpoint
    def copies(b: pd.DataFrame) -> pd.DataFrame:
        u = b["u"].to_numpy(np.int64)
        v = b["v"].to_numpy(np.int64)
        key = np.concatenate([u, v])
        out = pd.DataFrame({
            "key": key,
            "u": np.concatenate([u, u]),
            "v": np.concatenate([v, v]),
        })
        out["_part"] = _tag(out["key"].to_numpy())
        return out

    # exchange 1 reduce: local degree count + attach -> half records
    def attach_deg(g: pd.DataFrame) -> pd.DataFrame:
        key = g["key"].to_numpy(np.int64)
        # all copies of a node land here: degree == multiplicity of key
        uniq, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
        deg = counts[inv]
        u = g["u"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        pk = u * (1 << 32) + v
        out = pd.DataFrame({
            "pk": pk,
            "deg": deg.astype(np.int64),
            "is_u": key == u,
        })
        out["_p2"] = _tag(pk)
        return out

    halves = (
        edges.map_batches(copies, batch_format="pandas", batch_size=None)
        .groupby("_part")
        .map_groups(attach_deg, batch_format="pandas")
    )

    # exchange 2 reduce: merge the two halves, orient, re-key by src
    def orient(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pk", "is_u"], ascending=[True, False], kind="stable")
        pk = g["pk"].to_numpy(np.int64)
        deg = g["deg"].to_numpy(np.int64)
        # rows alternate (is_u=True, is_u=False) per pk after the sort
        du, dv = deg[0::2], deg[1::2]
        upk = pk[0::2]
        u = upk >> 32
        v = upk & ((1 << 32) - 1)
        u_first = (du < dv) | ((du == dv) & (u < v))
        src = np.where(u_first, u, v)
        dst = np.where(u_first, v, u)
        ddst = np.where(u_first, dv, du)
        out = pd.DataFrame({"src": src, "dst": dst,
                            "du": np.where(u_first, du, dv),
                            "dv": ddst,
                            "dk": ddst * (1 << 32) + dst})  # (deg,id) order key
        out["_p3"] = _tag(src)
        return out

    return (
        halves.groupby("_p2")
        .map_groups(orient, batch_format="pandas")
        .materialize()
    )


def triangle_count(
    edges,
    num_partitions: int | None = None,
) -> int:
    """Exact distributed triangle count over an undirected edge
    Dataset ``(u: int64, v: int64)`` with ``u < v``, no duplicates,
    node ids < 2^31 (pair keys pack into one int64).

    Algorithm: degree-ordered orientation + wedge closure (the
    MapReduce formulation of Suri & Vassilvitskii, WWW 2011; see also
    Cohen, "Graph Twiddling in a MapReduce World", CiSE 2009). Each
    edge is oriented from the endpoint that is SMALLER in the total
    order (degree, node id) to the larger; every node's out-degree is
    then O(sqrt(m)), so the wedge expansion — all pairs of
    out-neighbors per source — is bounded by m^1.5 overall with no
    per-node hotspot, even for power-law graphs. A triangle
    {a, b, c} ordered a<b<c by (deg, id) is counted exactly once: as
    the wedge (b, c) at a, closed by the oriented edge b→c.

    Exactly FOUR int-keyed exchanges (a first cut with a separate
    degree rollup + two partition-merge joins + a semi-join ran eight
    and spent ~16 s in fixed per-exchange overhead on a 3.5k-edge
    graph):

    1. each edge emits a copy keyed by EACH endpoint; a node's copies
       all co-locate, so its degree is a local count and attaches in
       the same pass (the vertex-cut degree-attach trick) — out come
       per-edge HALF records (pair key, endpoint degree, side);
    2. halves merge on the pair key (each appears exactly twice),
       the edge orients by (deg, id), and oriented edges re-key by
       source;
    3. per-source wedge expansion emits closure-candidate pair keys;
       oriented edges re-key by their own pair key in the same pass;
    4. wedge keys and edge keys co-locate by pair-key hash; each
       partition counts wedge keys present in its edge-key set and
       the driver sums one int per partition.
    """
    edges = edges.materialize()
    if num_partitions is None:
        # size P by EDGE VOLUME, not the cluster-CPU floor: the wedge
        # expansion multiplies partition memory by out-degree (target
        # ~32 MB of raw edges per partition), while a tiny graph in
        # 4*cpus partitions is pure scheduling overhead
        m = edges.count()
        num_partitions = max(4, -(-m * 24 // (32 << 20)))
    P = num_partitions
    # coalesce groupby-fan inputs (see pagerank) before the exchanges
    if edges.num_blocks() > 4 * P:
        edges = edges.repartition(4 * P).materialize()

    oriented = _oriented_edges(edges, P).drop_columns(["du", "dv"])

    def _tag(arr: np.ndarray) -> np.ndarray:
        return (
            pd.util.hash_pandas_object(pd.Series(arr), index=False).to_numpy() % P
        ).astype(np.int32)

    # exchange 3 reduce: wedges per source; edges re-key by pair key
    # in the same co-partitioned stream (side=1 marks a real edge)
    def wedge_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["src", "dk"], kind="stable")
        keys = [g["src"].to_numpy(np.int64) * (1 << 32)
                + g["dst"].to_numpy(np.int64)]          # real-edge keys
        sides = [np.ones(len(g), np.int8)]
        for _, grp in g.groupby("src", sort=False):
            d = grp["dst"].to_numpy(np.int64)
            if len(d) < 2:
                continue
            i, j = np.triu_indices(len(d), k=1)
            keys.append(d[i] * (1 << 32) + d[j])
            sides.append(np.zeros(len(i), np.int8))
        pk = np.concatenate(keys)
        out = pd.DataFrame({"pk": pk, "side": np.concatenate(sides)})
        out["_p4"] = _tag(pk)
        return out

    tagged = oriented.groupby("_p3").map_groups(wedge_part, batch_format="pandas")

    # exchange 4 reduce: per partition, count wedges whose pk is a real
    # edge; ONE int per partition reaches the driver
    def close_part(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy()
        pk = g["pk"].to_numpy(np.int64)
        edge_set = pk[side == 1]
        wedge = pk[side == 0]
        n = int(np.isin(wedge, edge_set).sum())
        return pd.DataFrame({"n": [n]})

    counts = tagged.groupby("_p4").map_groups(close_part, batch_format="pandas")
    return int(counts.to_pandas()["n"].sum())


def bfs_hops(edges_ds, source: int, max_hops: int = 5,
             num_partitions: int | None = None,
             broadcast_limit: int = 4_000_000):
    """Single-source shortest-hop BFS over an undirected edge Dataset
    ``(u, v)``. Returns a Dataset (node, hop) of every node within
    ``max_hops`` of ``source``.

    Two execution paths, picked per round by frontier size:

    - **broadcast rounds** (default while the visited set fits
      ``broadcast_limit`` int64s — node sets are the SMALL side of a
      graph; edges are the big side): the sorted frontier + visited
      arrays ship once per round via ``ray.put`` and each round is ONE
      map-only pass over the once-materialized symmetric edge list —
      zero shuffles per hop. The per-round driver state is O(reachable
      nodes), never O(edges); at 4M nodes that is 32 MB, the standard
      Pregel "small aggregate" compromise.
    - **exchange rounds** (fallback when the visited set exceeds the
      limit): the prior formulation — SEMI-join edges against the
      frontier and ANTI-join candidates against visited via
      ``partition_merge_join`` (two int-keyed exchanges per hop), so
      the driver never holds node sets. Slower per round (it
      re-partitions the edge list) but unbounded.
    """
    import numpy as np
    import pandas as pd
    import ray
    import ray.data

    # symmetrize once: directed (s, d) both ways
    def sym(b: pd.DataFrame) -> pd.DataFrame:
        u = b["u"].to_numpy(np.int64)
        v = b["v"].to_numpy(np.int64)
        return pd.DataFrame({"s": np.concatenate([u, v]),
                             "d": np.concatenate([v, u])})

    directed = edges_ds.map_batches(sym, batch_format="pandas", batch_size=None).materialize()

    nodes = [np.array([source], np.int64)]
    hops = [np.array([0], np.int64)]
    visited_sorted = np.array([source], np.int64)
    frontier = visited_sorted
    for h in range(1, max_hops + 1):
        if len(visited_sorted) > broadcast_limit:
            rest = _bfs_hops_exchange(
                directed, frontier, visited_sorted, start_hop=h,
                max_hops=max_hops, num_partitions=num_partitions,
            )
            base = ray.data.from_pandas(pd.DataFrame({
                "node": np.concatenate(nodes), "hop": np.concatenate(hops)}))
            return base.union(rest) if rest is not None else base
        f_ref = ray.put(np.sort(frontier))
        v_ref = ray.put(visited_sorted)

        def probe(b: pd.DataFrame) -> pd.DataFrame:
            fr = ray.get(f_ref)
            vs = ray.get(v_ref)
            s = b["s"].to_numpy(np.int64)
            d = b["d"].to_numpy(np.int64)
            idx = np.searchsorted(fr, s)
            idx[idx == len(fr)] = 0
            cand = np.unique(d[fr[idx] == s])
            jdx = np.searchsorted(vs, cand)
            jdx[jdx == len(vs)] = 0
            return pd.DataFrame({"node": cand[vs[jdx] != cand]})

        parts = directed.map_batches(
            probe, batch_format="pandas", batch_size=None
        ).to_pandas()  # bounded by frontier adjacency <= reachable nodes
        if "node" not in parts.columns:  # all blocks empty -> schema dropped
            break
        new = np.unique(parts["node"].to_numpy(np.int64))
        if len(new) == 0:
            break
        nodes.append(new)
        hops.append(np.full(len(new), h, np.int64))
        visited_sorted = np.union1d(visited_sorted, new)
        frontier = new
    return ray.data.from_pandas(pd.DataFrame({
        "node": np.concatenate(nodes), "hop": np.concatenate(hops)}))


def _bfs_hops_exchange(directed, frontier_nodes, visited_nodes, start_hop: int,
                       max_hops: int, num_partitions: int | None = None):
    """Exchange-based BFS continuation for frontiers too large to
    broadcast: per hop, one SEMI-join of the edge list against the
    frontier and one ANTI-join of the candidates against the visited
    set (``partition_merge_join``, int-keyed exchanges). Returns a
    Dataset (node, hop) for hops >= ``start_hop`` or None if none."""
    import numpy as np
    import pandas as pd
    import ray.data

    from .join import partition_merge_join

    visited = ray.data.from_pandas(pd.DataFrame({
        "node": np.asarray(visited_nodes, np.int64)}))
    frontier = ray.data.from_pandas(pd.DataFrame({
        "node": np.asarray(frontier_nodes, np.int64)}))
    out = []
    for h in range(start_hop, max_hops + 1):
        fr = frontier.map_batches(
            lambda b: pd.DataFrame({"s": b["node"].to_numpy(np.int64)}),
            batch_format="pandas", batch_size=None,
        )
        touched = partition_merge_join(
            directed, fr, on="s", how="semi", num_partitions=num_partitions
        )
        cand = touched.map_batches(
            lambda b: pd.DataFrame({"node": np.unique(b["d"].to_numpy(np.int64))}),
            batch_format="pandas", batch_size=None,
        )
        fresh = partition_merge_join(
            cand, visited, on="node", how="anti", num_partitions=num_partitions
        )
        # the anti-join partitions by node hash, so each node lives in
        # exactly one block and the per-block unique IS a global unique
        new = fresh.map_batches(
            lambda b, hop=h: pd.DataFrame(
                {"node": np.unique(b["node"].to_numpy(np.int64))}
            ).assign(hop=np.int64(hop)),
            batch_format="pandas", batch_size=None,
        ).materialize()
        if new.count() == 0:
            break
        out.append(new)
        frontier = new.drop_columns(["hop"])
        visited = visited.union(frontier).materialize()
    if not out:
        return None
    res = out[0]
    for d in out[1:]:
        res = res.union(d)
    return res


def _local_union_find(a: np.ndarray, b: np.ndarray) -> dict[int, int]:
    """Partition-local union-find (path-halving, min-id roots) over the
    edge arrays; returns {node: rep} where rep is the component's
    minimum node id WITHIN this partition."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        return r

    for u, v in zip(a.tolist(), b.tolist()):
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    return {n: find(n) for n in parent}


def connected_components_contract(edges, num_partitions: int | None = None):
    """Exact connected components via two-level contraction — the
    diameter-independent alternative to :func:`connected_components`
    (hash-min needs O(diameter) join rounds; long sparse components
    make that unbounded). Returns a Dataset ``(node, label)``, label =
    component minimum node id, one row per node with an edge.

    Plan: (1) hash-partition edges by one endpoint; each partition
    runs a LOCAL union-find (memory bounded by its edge count) and
    emits (node, rep) with rep = local component min. (2) one
    node-keyed exchange merges each node's per-partition reps: it
    emits the node's min rep once, plus the sparse contracted
    rep-graph (rep_min, rep_j) pairs — a node seen by two partitions
    proves its two reps connected. (3) the contracted graph (bounded
    by boundary-node multiplicity, NOT corpus size) finishes in a
    driver union-find; the rep->component map is broadcast and a
    final map relabels. At extreme scale where the contracted graph
    itself outgrows the driver, re-contract recursively (not needed
    at any tested scale; hash-min also remains available)."""
    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)

    def tag(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = ((a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                >> np.uint64(33)) % np.uint64(P)
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "_part": pa.array(part.astype(np.int32))})

    def local_cc(df: pd.DataFrame) -> pd.DataFrame:
        m = _local_union_find(df["a"].to_numpy(np.int64),
                              df["b"].to_numpy(np.int64))
        nodes = np.fromiter(m.keys(), dtype=np.int64, count=len(m))
        reps = np.fromiter(m.values(), dtype=np.int64, count=len(m))
        out = pd.DataFrame({"node": nodes, "rep": reps})
        p2 = ((out["node"].to_numpy(np.int64).astype(np.uint64)
               * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) % np.uint64(P)
        out["_p2"] = p2.astype(np.int32)
        return out

    def merge_reps(df: pd.DataFrame) -> pd.DataFrame:
        # per node: one (node, min rep) row (is_pair=False) + sparse
        # contracted edges between its reps (is_pair=True)
        df = df.sort_values(["node", "rep"], kind="mergesort")
        node = df["node"].to_numpy(np.int64)
        rep = df["rep"].to_numpy(np.int64)
        first = np.concatenate([[True], node[1:] != node[:-1]])
        starts = np.flatnonzero(first)
        rep_min = rep[starts]
        out_nodes = pd.DataFrame({"k1": node[starts], "k2": rep_min,
                                  "is_pair": False})
        extra = ~first
        if extra.any():
            # pair each extra rep with its node's min rep
            grp = np.cumsum(first) - 1
            pairs = pd.DataFrame({"k1": rep_min[grp[extra]],
                                  "k2": rep[extra], "is_pair": True})
            pairs = pairs[pairs["k1"] != pairs["k2"]].drop_duplicates()
            out_nodes = pd.concat([out_nodes, pairs], ignore_index=True)
        return out_nodes

    merged = (
        edges.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(lambda df: local_cc(df.drop(columns=["_part"])),
                    batch_format="pandas")
        .groupby("_p2")
        .map_groups(lambda df: merge_reps(df.drop(columns=["_p2"])),
                    batch_format="pandas")
        .materialize()
    )

    if merged.count() == 0:  # free: merged is materialized
        import ray.data

        return ray.data.from_pandas(pd.DataFrame({
            "node": pd.Series([], dtype=np.int64),
            "label": pd.Series([], dtype=np.int64),
        }))

    # sparse contracted rep-graph -> driver union-find
    pair_df = merged.filter(expr="is_pair == True").to_pandas()
    comp_map: dict[int, int] = {}
    if len(pair_df):
        m = _local_union_find(pair_df["k1"].to_numpy(np.int64),
                              pair_df["k2"].to_numpy(np.int64))
        comp_map = m

    import ray

    comp_ref = ray.put(comp_map)

    def relabel(batch: pd.DataFrame) -> pd.DataFrame:
        cm = ray.get(comp_ref)
        rep = batch["k2"].to_numpy(np.int64)
        lab = np.fromiter((cm.get(int(r), int(r)) for r in rep),
                          dtype=np.int64, count=len(rep))
        return pd.DataFrame({"node": batch["k1"].to_numpy(np.int64),
                             "label": lab})

    return (
        merged.filter(expr="is_pair == False")
        .map_batches(relabel, batch_format="pandas", batch_size=None)
    )


def edge_jaccard(edges, num_partitions: int | None = None):
    """Per-EDGE neighborhood overlap: for every undirected edge
    ``(u, v)`` (u < v, int64 ids < 2^31), the common-neighbor count
    ``|N(u) & N(v)|`` plus both endpoint degrees — the inputs of the
    edge Jaccard / Adamic-Adar family of link-strength scores.

    Same degree-ordered orientation + wedge closure as
    :func:`triangle_count` (Suri & Vassilvitskii WWW'11) — a closed
    wedge (a, b) at center w IS the triangle {w, a, b}, and each
    triangle contributes one common neighbor to EACH of its three
    edges, so closure emits three per-edge increments instead of a
    scalar count. Five int-keyed exchanges, per-node work bounded by
    the O(sqrt(m)) oriented out-degree; the result stays a Dataset
    ``(u, v, du, dv, common)``, one row per input edge.
    """
    import ray.data

    edges = edges.materialize()
    if num_partitions is None:
        m = edges.count()
        num_partitions = max(4, -(-m * 24 // (32 << 20)))
    P = num_partitions
    if edges.num_blocks() > 4 * P:
        edges = edges.repartition(4 * P).materialize()

    def _tag(arr: np.ndarray) -> np.ndarray:
        return (
            pd.util.hash_pandas_object(pd.Series(arr), index=False).to_numpy() % P
        ).astype(np.int32)

    oriented = _oriented_edges(edges, P)

    def _tag(arr: np.ndarray) -> np.ndarray:
        return (
            pd.util.hash_pandas_object(pd.Series(arr), index=False).to_numpy() % P
        ).astype(np.int32)

    # wedges carry their CENTER so closure can credit all 3 edges
    def wedge_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["src", "dk"], kind="stable")
        keys = [g["src"].to_numpy(np.int64) * (1 << 32)
                + g["dst"].to_numpy(np.int64)]
        centers = [np.full(len(g), -1, np.int64)]   # -1 == real edge
        for s, grp in g.groupby("src", sort=False):
            d = grp["dst"].to_numpy(np.int64)
            if len(d) < 2:
                continue
            i, j = np.triu_indices(len(d), k=1)
            # wedge pair stays in (deg, id) order — it must equal the
            # ORIENTED key of the closing edge, not the canonical one
            keys.append(d[i] * (1 << 32) + d[j])
            centers.append(np.full(len(i), s, np.int64))
        pk = np.concatenate(keys)
        out = pd.DataFrame({"pk": pk, "center": np.concatenate(centers)})
        out["_p4"] = _tag(pk)
        return out

    tagged = oriented.groupby("_p3").map_groups(wedge_part,
                                                batch_format="pandas")

    # closure: each matched wedge (a,b)@w emits +1 for edges (a,b),
    # (w,a), (w,b) — re-keyed by edge pair for the final merge
    def close_part(g: pd.DataFrame) -> pd.DataFrame:
        center = g["center"].to_numpy(np.int64)
        pk = g["pk"].to_numpy(np.int64)
        edge_set = pk[center == -1]
        wpk = pk[center != -1]
        wc = center[center != -1]
        hit = np.isin(wpk, edge_set)
        wpk, wc = wpk[hit], wc[hit]
        a = wpk >> 32
        b = wpk & ((1 << 32) - 1)
        # emit increments under CANONICAL (min, max) edge keys
        e1 = np.minimum(a, b) * (1 << 32) + np.maximum(a, b)
        e2 = np.minimum(wc, a) * (1 << 32) + np.maximum(wc, a)
        e3 = np.minimum(wc, b) * (1 << 32) + np.maximum(wc, b)
        out = pd.DataFrame({"pk": np.concatenate([e1, e2, e3]),
                            "c": np.int64(1)})
        out = out.groupby("pk", as_index=False).sum()
        out["_p5"] = _tag(out["pk"].to_numpy())
        return out

    incs = tagged.groupby("_p4").map_groups(close_part,
                                            batch_format="pandas")

    # final merge: per-edge rows (from oriented, canonical pk) union
    # increment partials, co-partitioned by pk hash
    def edge_rows(b: pd.DataFrame) -> pd.DataFrame:
        src = b["src"].to_numpy(np.int64)
        dst = b["dst"].to_numpy(np.int64)
        lo, hi = np.minimum(src, dst), np.maximum(src, dst)
        du = np.where(src < dst, b["du"].to_numpy(np.int64),
                      b["dv"].to_numpy(np.int64))
        dv = np.where(src < dst, b["dv"].to_numpy(np.int64),
                      b["du"].to_numpy(np.int64))
        pk = lo * (1 << 32) + hi
        out = pd.DataFrame({"pk": pk, "du": du, "dv": dv,
                            "c": np.int64(0), "is_edge": True})
        out["_p5"] = _tag(pk)
        return out

    inc_rows = incs.map_batches(
        lambda b: pd.DataFrame({
            "pk": b["pk"].to_numpy(np.int64),
            "du": np.int64(0), "dv": np.int64(0),
            "c": b["c"].to_numpy(np.int64),
            "is_edge": False, "_p5": b["_p5"].to_numpy(np.int32),
        }),
        batch_format="pandas", batch_size=None,
    )
    both = oriented.map_batches(edge_rows, batch_format="pandas",
                                batch_size=None).union(inc_rows)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("pk", as_index=False).agg(
            du=("du", "max"), dv=("dv", "max"), c=("c", "sum"),
            is_edge=("is_edge", "any"))
        agg = agg[agg["is_edge"]]
        pk = agg["pk"].to_numpy(np.int64)
        return pd.DataFrame({
            "u": pk >> 32,
            "v": pk & ((1 << 32) - 1),
            "du": agg["du"].to_numpy(np.int64),
            "dv": agg["dv"].to_numpy(np.int64),
            "common": agg["c"].to_numpy(np.int64),
        })

    return both.groupby("_p5").map_groups(merge, batch_format="pandas")
