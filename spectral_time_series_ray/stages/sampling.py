"""Series sampling + weighted union — the reference's dataset-level
sampling surface.

- :func:`sample_series` — NONE / UNIFORM / PROPORTIONAL series
  sampling (reference SampleTimeSeriesType,
  `uni2ts/src/uni2ts/data/dataset.py:36-91`): PROPORTIONAL weights a
  series by its length (`hf_dataset_indexer.py:119-139` length
  probabilities). Implemented as a small grouped count -> seeded
  driver-side choice -> broadcast semi-join (no full shuffle).
- :func:`weighted_union` — ``dataset_weight`` replication
  (dataset.py:100-110: logical length = num_series x weight) as
  ``ds.union`` of repeated datasets (integer weights).
"""

from __future__ import annotations

import numpy as np

from .join import semi_join_keys


def sample_series(ds, key: str, n: int, mode: str = "uniform", seed: int = 42):
    """Keep all rows of exactly ``n`` sampled series (reference
    SampleTimeSeriesType semantics, dataset.py:36-91: the indexer holds
    every series id, so the per-key count table on the driver — one row
    per series — matches the reference's own memory model; for
    cardinalities where that is too big, use
    :func:`split_assign`-style hash selection, which trades the exact
    ``n`` for a binomial ``n`` with no driver state)."""
    # validate the mode BEFORE any work: a typo'd mode must raise, not
    # silently return the full dataset via the n >= #series early exit;
    # mode='none' must not pay the distributed count it discards
    if mode not in ("none", "uniform", "proportional"):
        raise ValueError(f"unknown sampling mode: {mode!r}")
    if mode == "none":
        return ds
    counts = ds.groupby(key).count().to_pandas()
    keys = counts[key].to_numpy()
    if n >= len(keys):
        return ds
    rng = np.random.default_rng(seed)
    if mode == "uniform":
        chosen = rng.choice(keys, size=n, replace=False)
    else:  # proportional
        w = counts["count()"].to_numpy(dtype=np.float64)
        chosen = rng.choice(keys, size=n, replace=False, p=w / w.sum())
    return semi_join_keys(ds, set(chosen.tolist()), key)


def weighted_union(datasets_with_weights, key: str | None = None, fractional_mode: str = "sorted"):
    """UNION ALL with replication weights (ConcatDatasetBuilder +
    dataset_weight semantics, reference dataset.py:100-110: logical
    length = ceil(num_series x weight), indices wrap modulo
    num_series).

    FRACTIONAL weights are honored like the reference: each dataset is
    replicated floor(w) times, plus one extra copy for a w-floor(w)
    fraction of series. ``key`` is required for fractional weights.

    ``fractional_mode``:
    - ``"sorted"`` (default, reference parity): the remainder series
      are the FIRST ceil(n*w) - floor(w)*n in sorted key order (the
      indexer order). Needs the per-series count table on the driver —
      one row per series, fine up to millions of series.
    - ``"hash"`` (scale path): series whose splitmix64(key) draw falls
      below the fraction get the extra copy — no driver-side key list
      at any cardinality; the realized weight is exact in expectation
      (binomial around the target).
    """
    import math

    parts = []
    for ds, weight in datasets_with_weights:
        w = float(weight)
        if w < 0:
            raise ValueError("negative dataset weight")
        full = int(w)
        parts.extend([ds] * full)
        if w - full > 1e-9:
            if key is None:
                raise ValueError("fractional dataset weights need a series key")
            frac = w - full
            if fractional_mode == "hash":
                tagged = split_assign(
                    ds, key, {"extra": frac, "base": 1.0 - frac}, column="_split"
                )
                extra = tagged.filter(expr="_split == 'extra'").drop_columns(["_split"])
                parts.append(extra)
            else:
                # one row per series: the aggregated key list is small
                keys = sorted(r[key] for r in ds.groupby(key).count().take_all())
                n = len(keys)
                # round-guard the float product before ceil: 110 * 1.1
                # is 121.00000000000001 in float64 and a raw ceil would
                # replicate one extra series past the exact target
                r = math.ceil(round(n * w, 9)) - full * n
                if r > 0:
                    parts.append(semi_join_keys(ds, set(keys[:r]), key))
    if not parts:
        raise ValueError("empty union")
    first, rest = parts[0], parts[1:]
    return first.union(*rest) if rest else first


# ------------------------------------------------------------- samplers
# Reference `uni2ts/src/uni2ts/common/sampler.py:25-55`, seeded: every
# sampler draws an integer in [1, n] (vectorized over arrays).

def uniform_sampler(n, rng: np.random.Generator):
    return rng.integers(1, np.asarray(n) + 1)


def binomial_sampler(n, rng: np.random.Generator, p: float = 0.5):
    return rng.binomial(np.asarray(n) - 1, p) + 1


def beta_binomial_sampler(n, rng: np.random.Generator, a: float = 1.0, b: float = 1.0):
    # a = b = 1 reduces to the uniform sampler
    n = np.asarray(n)
    pp = rng.beta(a, b, size=n.shape if n.shape else None)
    return rng.binomial(n - 1, pp) + 1


def get_sampler(distribution: str, **kwargs):
    from functools import partial

    if distribution == "uniform":
        return uniform_sampler
    if distribution == "binomial":
        return partial(binomial_sampler, p=kwargs.get("p", 0.5))
    if distribution == "beta_binomial":
        return partial(
            beta_binomial_sampler, a=kwargs.get("a", 1.0), b=kwargs.get("b", 1.0)
        )
    raise NotImplementedError(f"distribution {distribution} not implemented")


class TrainCropStage:
    """Actor-pool stage: random whole-patch training crops over packed
    chunk rows (reference PatchCrop + GetPatchSize train semantics,
    crop.py:31-108 / patch.py:78-120).

    Determinism at scale: the rng for each row is seeded from
    (seed, fnv(conv_id), chunk_idx), so results do not depend on batch
    boundaries or task scheduling — rerunning a failed partition
    reproduces identical crops (resume-safe).
    """

    def __init__(
        self,
        freq: str = "1m",
        min_time_patches: int = 2,
        max_patches: int = 512,
        patch_sizes=(8, 16, 32, 64, 128),
        num_patches_sampler: str = "uniform",
        seed: int = 42,
    ):
        from ..functions.patch import get_patch_size, patch_crop_bounds

        self._get_patch_size = get_patch_size
        self._bounds = patch_crop_bounds
        self.freq = freq
        self.min_time_patches = min_time_patches
        self.max_patches = max_patches
        self.patch_sizes = patch_sizes
        self.sampler = get_sampler(num_patches_sampler)
        self.seed = seed

    def __call__(self, batch) -> "pd.DataFrame":
        import pandas as pd

        from ..functions.hashing import fnv1a_u64

        rows = []
        for conv_id, chunk_idx, values, ts_arr in zip(
            batch["conv_id"], batch["chunk_idx"], batch["values"], batch["ts"]
        ):
            vals = np.asarray(values, dtype=np.float64)
            ts = np.asarray(ts_arr, dtype=np.int64)
            rng = np.random.default_rng(
                [self.seed, int(fnv1a_u64([str(conv_id)])[0]) & 0x7FFFFFFF,
                 int(chunk_idx)]
            )
            try:
                psize = self._get_patch_size(
                    len(vals), self.freq, self.min_time_patches,
                    self.patch_sizes, rng,
                )
                a, b = self._bounds(
                    len(vals), psize, self.min_time_patches, self.max_patches, rng,
                    num_patches_sampler=self.sampler,
                )
            except ValueError:
                continue  # series too short for any candidate: skip
            rows.append(
                {
                    "conv_id": conv_id,
                    "chunk_idx": int(chunk_idx),
                    "patch_size": psize,
                    "crop_start": a,
                    "crop_stop": b,
                    "n_points": b - a,
                    "ts": ts[a:b],
                    "values": vals[a:b],
                }
            )
        if not rows:
            return pd.DataFrame(
                {c: pd.Series([], dtype=t) for c, t in
                 (("conv_id", object), ("chunk_idx", np.int64), ("patch_size", np.int64),
                  ("crop_start", np.int64), ("crop_stop", np.int64),
                  ("n_points", np.int64), ("ts", object), ("values", object))}
            )
        return pd.DataFrame(rows)


def train_crop_series(ds, concurrency: int = 4, batch_size: int = 256, **kwargs):
    """Random training crops over packed series rows (see
    :class:`TrainCropStage`)."""
    return ds.map_batches(
        TrainCropStage,
        fn_constructor_kwargs=kwargs,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class MaskedPredictionStage:
    """Actor-pool stage: random trailing prediction mask per packed
    series row (reference MaskedPrediction + ExtendMask,
    `uni2ts/src/uni2ts/transform/task.py:28-113`): mask length =
    ``max(1, round(time * U[min_ratio, max_ratio]))`` trailing steps;
    auxiliary fields (here ``ts``) are truncated to the unmasked
    context so horizon information cannot leak into features.

    Determinism at scale: rng seeded per (seed, fnv(conv_id),
    chunk_idx) — batch-boundary and scheduling independent,
    resume-safe (same contract as :class:`TrainCropStage`).
    """

    def __init__(
        self,
        min_mask_ratio: float = 0.15,
        max_mask_ratio: float = 0.5,
        seed: int = 42,
    ):
        from ..functions.task import masked_prediction

        if min_mask_ratio > max_mask_ratio:
            raise ValueError("min_mask_ratio must be <= max_mask_ratio")
        self._masked = masked_prediction
        self.lo = min_mask_ratio
        self.hi = max_mask_ratio
        self.seed = seed

    def __call__(self, batch) -> "pd.DataFrame":
        import pandas as pd

        from ..functions.hashing import fnv1a_u64

        rows = []
        for conv_id, chunk_idx, values, ts_arr in zip(
            batch["conv_id"], batch["chunk_idx"], batch["values"], batch["ts"]
        ):
            vals = np.asarray(values, dtype=np.float64)
            ts = np.asarray(ts_arr, dtype=np.int64)
            rng = np.random.default_rng(
                [self.seed, int(fnv1a_u64([str(conv_id)])[0]) & 0x7FFFFFFF,
                 int(chunk_idx)]
            )
            mask, trunc = self._masked(
                vals, self.lo, self.hi, truncate={"ts": ts[None, :]}, rng=rng
            )
            mask_len = int(mask[0].sum())
            rows.append(
                {
                    "conv_id": conv_id,
                    "chunk_idx": int(chunk_idx),
                    "n_points": len(vals),
                    "mask_length": mask_len,
                    "values": vals,
                    "prediction_mask": mask[0],
                    "context_ts": trunc["ts"][0],
                }
            )
        if not rows:
            return pd.DataFrame(
                {c: pd.Series([], dtype=t) for c, t in
                 (("conv_id", object), ("chunk_idx", np.int64),
                  ("n_points", np.int64), ("mask_length", np.int64),
                  ("values", object), ("prediction_mask", object),
                  ("context_ts", object))}
            )
        return pd.DataFrame(rows)


def split_assign(
    ds,
    key: str,
    fracs: dict[str, float],
    seed: int = 42,
    column: str = "split",
):
    """Deterministic KEY-COHERENT train/val/test assignment: every row
    of a key lands in the same split (no leakage of a conversation /
    document across splits), assignment depends only on (key, seed) —
    stable across reruns, resume-safe, and independent of partitioning.

    Vectorized per batch: splitmix64(key-hash ^ seed) -> [0,1) ->
    threshold lookup. No shuffle; composes with any downstream stage.
    """
    import pyarrow as pa

    from ..functions.bloom import hash_u64
    from ..functions.hashing import fnv1a_u64

    total = sum(fracs.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1 (got {total})")
    names = list(fracs)
    edges = np.cumsum([fracs[s] for s in names])
    edges[-1] = 1.0 + 1e-12  # closed top edge

    def assign(batch: pa.Table) -> pa.Table:
        col = batch[key]
        if pa.types.is_integer(col.type):
            h = hash_u64(col.to_numpy(zero_copy_only=False).astype(np.uint64))
        else:
            h = fnv1a_u64([str(v) for v in col.to_pylist()])
        u = (hash_u64(h ^ np.uint64(seed)) >> np.uint64(11)) / float(1 << 53)
        idx = np.searchsorted(edges, u, side="right")
        idx = np.minimum(idx, len(names) - 1)
        arr = pa.array(np.asarray(names, dtype=object)[idx])
        return batch.append_column(column, arr)

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


def masked_prediction_series(ds, concurrency: int = 4, batch_size: int = 256, **kwargs):
    """Random masked-prediction task rows over packed series (see
    :class:`MaskedPredictionStage`)."""
    return ds.map_batches(
        MaskedPredictionStage,
        fn_constructor_kwargs=kwargs,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def bottom_k_sample(
    ds,
    key: str,
    id_col: str,
    k: int,
    seed: int = 42,
):
    """Deterministic per-key uniform k-sample WITHOUT replacement via
    bottom-k order sampling: tag every row with
    ``u = splitmix64(hash(id) ^ seed)`` and keep each key's k smallest
    tags. A fixed random tag per row makes the sample (a) exactly
    uniform over the key's rows, (b) MERGEABLE — the bottom-k of a
    union is the bottom-k of the partial bottom-k's — and (c)
    deterministic across reruns, partitionings and cluster sizes
    (resume-safe, same contract as `split_assign`).

    Shape: per-batch partial bottom-k per key (at most k rows per key
    per block shuffle), then a per-key merge cut. The reference
    samples series uniformly inside its dataset builders
    (`uni2ts/src/uni2ts/data/dataset.py` sampler fields); this is the
    distributed, reproducible equivalent.
    """
    import pyarrow as pa

    from ..functions.bloom import hash_u64
    from ..functions.hashing import fnv1a_u64

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        col = batch[id_col]
        if col.dtype.kind in "iu":
            h = hash_u64(col.to_numpy().astype(np.uint64))
        else:
            h = fnv1a_u64([str(v) for v in col])
        batch = batch.copy()
        batch["_tag"] = hash_u64(h ^ np.uint64(seed))
        # partial cut: at most k rows per key leave the block.
        # Tie-break equal tags (duplicate ids / hash collisions) on the
        # id itself — sorting on _tag alone would make the k-boundary
        # row depend on block layout, breaking the documented
        # determinism across partitionings (stratified_sample already
        # tie-breaks the same way)
        return (
            batch.sort_values(["_tag", id_col], kind="stable")
            .groupby(key, sort=False)
            .head(k)
        )

    partials = ds.map_batches(tag, batch_format="pandas", batch_size=None)

    def cut(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values(["_tag", id_col], kind="stable").head(k)
        return out.drop(columns=["_tag"])

    return partials.groupby(key).map_groups(cut, batch_format="pandas")


def hamilton_allocation(n_by_stratum: dict, k: int) -> dict:
    """Largest-remainder (Hamilton) apportionment of a total sample
    size ``k`` across strata proportionally to population counts,
    capped at each stratum's population: ``k_h = floor(k * n_h / n)``
    plus one for the largest fractional remainders until the total is
    k. Deterministic: remainder ties break by stratum key string.
    Exact by construction: sum(k_h) == k and k_h <= n_h always."""
    n = sum(n_by_stratum.values())
    if k > n:
        raise ValueError(f"sample size {k} exceeds population {n}")
    quota = {s: k * c / n for s, c in n_by_stratum.items()}
    alloc = {s: min(int(quota[s]), n_by_stratum[s]) for s in n_by_stratum}
    rem = k - sum(alloc.values())
    order = sorted(
        n_by_stratum,
        key=lambda s: (-(quota[s] - int(quota[s])), str(s)),
    )
    i = 0
    while rem > 0:
        s = order[i % len(order)]
        if alloc[s] < n_by_stratum[s]:
            alloc[s] += 1
            rem -= 1
        i += 1
    return alloc


def stratified_sample(
    ds,
    stratum_col: str,
    id_col: str,
    k: int,
    seed: int = 42,
    keep_tag: bool = False,
):
    """Exact proportional stratified sample of TOTAL size k: strata
    sized by Hamilton largest-remainder apportionment (never a row
    more or less than the allocation), rows within a stratum chosen
    by deterministic bottom-k order sampling on
    ``tag = splitmix64(hash(id) ^ seed)`` — uniform without
    replacement inside each stratum, mergeable across blocks, and
    reproducible across reruns / partitionings / cluster sizes.

    Scale shape: pass 1 is a per-stratum count (the only thing the
    driver sees is the bounded stratum histogram); the allocation dict
    is broadcast in the task closure; pass 2 cuts each block to at
    most k_h rows per stratum before a per-stratum merge cut. No full
    shuffle; driver never holds row data. With ``keep_tag`` the
    ``_tag`` column survives so callers can PROVE bottom-k-ness: for
    each stratum, the population count of tags <= max(selected tag)
    must equal k_h exactly.

    Returns ``(sample_ds, alloc)`` where alloc maps stratum ->
    (n_population, k_allocated)."""
    from ..functions.bloom import hash_u64
    from ..functions.hashing import fnv1a_u64

    counts = ds.groupby(stratum_col).count().to_pandas()
    n_by = dict(zip(counts[stratum_col], counts["count()"].astype(int)))
    alloc = hamilton_allocation(n_by, k)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        col = batch[id_col]
        if col.dtype.kind in "iu":
            h = hash_u64(col.to_numpy().astype(np.uint64))
        else:
            h = fnv1a_u64([str(v) for v in col])
        batch = batch.copy()
        batch["_tag"] = hash_u64(h ^ np.uint64(seed))
        kmax = max(alloc.values(), default=0)
        part = (
            batch.sort_values(["_tag", id_col], kind="stable")
            .groupby(stratum_col, sort=False)
            .head(kmax)
        )
        # tighten: per-stratum partial cut to that stratum's own k_h
        keep = (
            part.groupby(stratum_col, sort=False).cumcount()
            < part[stratum_col].map(alloc).fillna(0).astype(int)
        )
        return part[keep.to_numpy()]

    partials = ds.map_batches(tag, batch_format="pandas", batch_size=None)

    def cut(g: pd.DataFrame) -> pd.DataFrame:
        kh = alloc.get(g[stratum_col].iloc[0], 0)
        out = g.sort_values(["_tag", id_col], kind="stable").head(kh)
        return out if keep_tag else out.drop(columns=["_tag"])

    sample = partials.groupby(stratum_col).map_groups(cut, batch_format="pandas")
    return sample, {s: (n_by[s], alloc[s]) for s in n_by}


def weighted_sample_aes(
    ds,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 7,
):
    """Weighted sampling WITHOUT replacement via A-ES (Efraimidis &
    Spirakis 2006): each row draws a deterministic uniform u from a
    seeded splitmix64 hash of its id and competes with key
    ``u ** (1/w)``; the global top-k keys are the sample, with
    inclusion probability proportional to weight.

    Fully distributed and ORDER-FREE: the uniform depends only on
    (id, seed), never on row position or partitioning, so the sample is
    reproducible bit-for-bit across any repartitioning — the property
    the self-checks assert.  Per-block partial top-k bounds driver data
    to k rows per block.

    Uses log-transformed keys (ln u / w) for numerical stability.
    Zero-weight rows have inclusion probability 0 (key = -inf, never
    sampled — the A-ES limit w→0); negative weights are an error.
    """
    import pandas as pd

    from ..functions.bloom import hash_u64

    def partial_top(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch[weight_col].to_numpy(dtype=np.float64)
        if (w < 0).any():
            raise ValueError("weights must be non-negative")
        h = hash_u64(batch[id_col].to_numpy(dtype=np.int64) ^ np.int64(seed))
        # u in (0, 1]: map the 64-bit hash; +1 avoids u == 0
        u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
        key = np.full(len(w), -np.inf)
        pos = w > 0
        key[pos] = np.log(u[pos]) / w[pos]  # maximize u^(1/w) == ln(u)/w
        out = batch[[id_col, weight_col]].copy()
        out["_aes_key"] = key
        return out.nlargest(k, "_aes_key")

    cand = ds.map_batches(partial_top, batch_format="pandas", batch_size=None).to_pandas()
    top = cand.nlargest(k, "_aes_key").sort_values("_aes_key", ascending=False)
    return top.reset_index(drop=True)


def poisson_bootstrap_mean(
    ds,
    id_col: str,
    value_col: str,
    n_replicas: int = 200,
    seed: int = 11,
):
    """Distributed bootstrap confidence interval for a mean via the
    POISSON bootstrap (Chamandy et al., "Estimating Uncertainty for
    Massive Data Streams", Google 2012): each row contributes
    Poisson(1) copies to every replica, so a replica's (sum, count)
    partials are mergeable and the full resample never materializes.

    Deterministic: the Poisson draws seed from splitmix64(id, replica),
    independent of partitioning — identical CIs on any layout (the
    self-check asserts this).  Per block only a (B, 2) float matrix
    leaves the task.

    Returns (mean, lo, hi, n_rows, replica_means) for a 95% interval.
    """
    import pandas as pd

    from ..functions.bloom import hash_u64

    B = int(n_replicas)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(dtype=np.int64)
        v = batch[value_col].to_numpy(dtype=np.float64)
        n = len(ids)
        sums = np.zeros(B)
        cnts = np.zeros(B)
        # seeded inverse-CDF Poisson(1): one uniform per (row, replica)
        # from a counter-mode hash — deterministic and order-free
        reps = np.arange(B, dtype=np.int64)
        for start in range(0, n, 1024):  # bound the (rows x B) tile
            chunk = slice(start, min(start + 1024, n))
            hid = ids[chunk, None] * np.int64(1_000_003) + reps[None, :] + np.int64(seed)
            u = (hash_u64(hid.ravel()).astype(np.float64) + 1.0) / 2.0**64
            w = _poisson1_inverse_cdf(u).reshape(-1, B)
            sums += w.T @ v[chunk]
            cnts += w.sum(axis=0)
        return pd.DataFrame(
            {"rep": np.arange(B, dtype=np.int64), "s": sums, "c": cnts,
             "n": np.full(B, len(v), dtype=np.int64)}
        )

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=None).to_pandas()
    agg = parts.groupby("rep")[["s", "c"]].sum()
    means = (agg["s"] / agg["c"]).to_numpy()
    n_rows = int(parts[parts["rep"] == 0]["n"].sum())
    lo, hi = np.quantile(means, [0.025, 0.975])
    return float(means.mean()), float(lo), float(hi), n_rows, means


def _poisson1_inverse_cdf(u: np.ndarray) -> np.ndarray:
    """Vectorized Poisson(1) draws by inverse CDF (lambda = 1 so the
    CDF table is tiny: P(X <= 9) > 1 - 1e-7)."""
    from math import e

    probs = [1.0 / e]
    for k in range(1, 12):
        probs.append(probs[-1] / k)
    cdf = np.cumsum(probs)
    return np.searchsorted(cdf, u).astype(np.int64)


def assign_global_ids(ds, id_name: str = "row_id"):
    """Contiguous global int64 row ids (the zipWithIndex operator):
    the input materializes once, per-block row counts come to the
    driver (one int per block), an exclusive prefix sum assigns each
    block its offset, and a remote task per block appends
    ``offset + arange(len(block))`` — ids are unique and contiguous BY
    CONSTRUCTION (disjoint per-block ranges); no shuffle, and the only
    driver data is the count vector.

    Ordering note: ids follow the materialized block order; run after
    a sort for a semantic order, or use as-is for stable unique keys.
    Returns ``(dataset_with_ids, n_rows)``.
    """
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data

    ds = ds.materialize()
    refs = ds.get_internal_block_refs()

    @ray.remote
    def block_len(block) -> int:
        return len(block)

    @ray.remote
    def tag_block(block, offset: int, name: str):
        if isinstance(block, pd.DataFrame):
            block = pa.Table.from_pandas(block, preserve_index=False)
        n = block.num_rows
        return block.append_column(
            name, pa.array(offset + np.arange(n, dtype=np.int64))
        )

    counts = np.array(ray.get([block_len.remote(r) for r in refs]), dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]) if len(counts) else np.array([], dtype=np.int64)
    tagged = [
        tag_block.remote(r, int(offsets[i]), id_name) for i, r in enumerate(refs)
    ]
    return ray.data.from_arrow_refs(tagged), int(counts.sum())


def temperature_resample(
    ds,
    group_col: str,
    key: str,
    alpha: float = 0.5,
    target_rows: int | None = None,
    seed: int = 42,
    concurrency: int | None = None,
):
    """Temperature-based mixture resampling — the multilingual-LM data
    mixing rule (Conneau & Lample, NeurIPS 2019; also mT5/XLM-R):
    group share ``p_g ∝ n_g^alpha`` so low-resource groups are
    upsampled relative to raw frequency (alpha=1 keeps the natural
    mix, alpha=0 is uniform over groups).

    Scale shape: pass 1 is a tiny ``groupby(group_col).count()`` (one
    row per group); pass 2 broadcasts ``{group: expected copies/row}``
    into a stateless ``map_batches`` that replicates each row
    ``floor(r_g) + Bernoulli(frac(r_g))`` times, with the Bernoulli
    decided by splitmix64(key, seed) — deterministic across reruns and
    partition layouts, NO shuffle of the data rows.

    Returns a Dataset of the resampled rows plus a ``copy_idx`` column
    (0-based per source row; >0 marks upsampled duplicates).
    """
    import pyarrow as pa
    import ray

    from ..functions.bloom import hash_u64
    from ..functions.hashing import fnv1a_u64

    counts = ds.groupby(group_col).count().to_pandas()  # one row per group
    n_g = counts["count()"].to_numpy(dtype=np.float64)
    groups = counts[group_col].to_numpy()
    n_total = float(n_g.sum())
    if target_rows is None:
        target_rows = int(n_total)
    p = n_g**alpha
    p /= p.sum()
    rate = {g: float(target_rows * pi / ni) for g, pi, ni in zip(groups, p, n_g)}
    rate_ref = ray.put(rate)

    def replicate(batch: pa.Table) -> pa.Table:
        r = ray.get(rate_ref)
        gcol = batch[group_col].to_pylist()
        rates = np.array([r.get(g, 0.0) for g in gcol])
        kcol = batch[key]
        if pa.types.is_integer(kcol.type):
            h = hash_u64(kcol.to_numpy(zero_copy_only=False).astype(np.uint64))
        else:
            h = fnv1a_u64([str(v) for v in kcol.to_pylist()])
        u = (hash_u64(h ^ np.uint64(seed)) >> np.uint64(11)) / float(1 << 53)
        copies = np.floor(rates).astype(np.int64) + (u < (rates % 1.0))
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), copies)
        out = batch.take(pa.array(idx))
        # 0-based copy index within each replicated source row
        starts = np.concatenate([[0], np.cumsum(copies)[:-1]])
        copy_idx = np.arange(len(idx), dtype=np.int64) - np.repeat(starts, copies)
        return out.append_column("copy_idx", pa.array(copy_idx))

    return ds.map_batches(replicate, batch_format="pyarrow", batch_size=None)
