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
