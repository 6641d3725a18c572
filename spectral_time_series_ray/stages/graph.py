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
    df = labels.to_pandas().rename(columns={"node": "doc_id", "label": "cluster_id"})
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
    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)

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
    ).materialize()

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
    ).materialize()

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
        ranks = merged.groupby("_part").map_groups(
            update_part, batch_format="pandas"
        ).materialize()

    return ranks.select_columns(["node", "rank"])


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

    Exchanges (all int-keyed hash partitions): degree rollup,
    2 × edge⨝degree (orientation), wedge expansion keyed by source,
    wedge⨝edge semi-join on the packed pair key. The driver sees one
    int.
    """
    from ray.data.aggregate import Sum

    from .join import partition_merge_join
    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)

    # degrees: one pass + one int-keyed rollup
    def deg_partial(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({"node": pa.array(np.concatenate([u, v]))})
        t = t.append_column("d", pa.array(np.ones(len(u) * 2, np.int64)))
        return t.group_by(["node"]).aggregate([("d", "sum")])

    deg = (
        edges.map_batches(deg_partial, batch_format="pyarrow", batch_size=None)
        .groupby("node")
        .aggregate(Sum("d_sum", alias_name="deg"))
    )

    # orientation: attach deg(u) and deg(v) (two partition-merge joins)
    ue = edges.map_batches(
        lambda b: pd.DataFrame({"node": b["u"].to_numpy(np.int64),
                                "v": b["v"].to_numpy(np.int64)}),
        batch_format="pandas", batch_size=None,
    )
    j1 = partition_merge_join(ue, deg, on="node", how="inner",
                              num_partitions=P)
    j1 = j1.map_batches(
        lambda b: pd.DataFrame({"u": b["node"].to_numpy(np.int64),
                                "du": b["deg"].to_numpy(np.int64),
                                "node": b["v"].to_numpy(np.int64)}),
        batch_format="pandas", batch_size=None,
    )
    j2 = partition_merge_join(j1, deg, on="node", how="inner",
                              num_partitions=P)

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        u = b["u"].to_numpy(np.int64)
        v = b["node"].to_numpy(np.int64)
        du = b["du"].to_numpy(np.int64)
        dv = b["deg"].to_numpy(np.int64)
        # src = smaller in (deg, id) order
        u_first = (du < dv) | ((du == dv) & (u < v))
        src = np.where(u_first, u, v)
        dst = np.where(u_first, v, u)
        dsrc = np.where(u_first, du, dv)
        ddst = np.where(u_first, dv, du)
        out = pd.DataFrame({"src": src, "dst": dst,
                            "dk": ddst * (1 << 32) + dst})  # (deg,id) order key
        out["_part"] = (
            pd.util.hash_pandas_object(out["src"], index=False).to_numpy() % P
        ).astype(np.int32)
        return out

    oriented = j2.map_batches(
        orient, batch_format="pandas", batch_size=None
    ).materialize()

    def wedge_part(g: pd.DataFrame) -> pd.DataFrame:
        # per source: all out-neighbor pairs ordered by (deg, id)
        g = g.sort_values(["src", "dk"], kind="stable")
        keys = []
        for _, grp in g.groupby("src", sort=False):
            d = grp["dst"].to_numpy(np.int64)
            c = len(d)
            if c < 2:
                continue
            i, j = np.triu_indices(c, k=1)
            keys.append(d[i] * (1 << 32) + d[j])
        if not keys:
            return pd.DataFrame({"pk": pd.Series([], dtype=np.int64)})
        pk = np.concatenate(keys)
        return pd.DataFrame({"pk": pk})

    wedges = oriented.groupby("_part").map_groups(
        wedge_part, batch_format="pandas"
    )

    edge_keys = oriented.map_batches(
        lambda b: pd.DataFrame(
            {"pk": b["src"].to_numpy(np.int64) * (1 << 32)
                   + b["dst"].to_numpy(np.int64)}),
        batch_format="pandas", batch_size=None,
    )
    closed = partition_merge_join(wedges, edge_keys, on="pk", how="semi",
                                  num_partitions=P)
    return int(closed.count())
