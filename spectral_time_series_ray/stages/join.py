"""Join / lookup stages.

The reference has no relational join; its alignment patterns are
positional zips and key-set filters (SURVEY.md §2.5). For the engine we
provide the two scale-appropriate shapes (ray_guide.md "Joins"):

- :func:`broadcast_join` — small side shipped once via ``ray.put`` and
  merged per batch inside ``map_batches`` (no shuffle). Use for
  dimension tables / key sets.
- large-large: use ``Dataset.join`` (hash-partitioned) directly; this
  module adds :func:`semi_join_keys` / :func:`anti_join_keys` for
  broadcast key-set membership (the reference's ``valid_indices``
  filter-align, `uni2ts/cli/eval_precond_space.py:113-136`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


# per-worker-process cache of deserialized broadcast sides: stateless
# tasks get actor-like amortization without actor-pool startup cost
_SMALL_CACHE: dict[str, object] = {}
# LRU-ish capacity: interleaved stages (a broadcast join AND a Bloom
# filter running concurrently on one worker) must not evict each other
# per batch — a single-slot cache re-deserialized the other side's
# payload on nearly every batch, the exact cost the cache amortizes
_SMALL_CACHE_CAP = 4


def _small_cache_put(key: str, value) -> None:
    while len(_SMALL_CACHE) >= _SMALL_CACHE_CAP:
        _SMALL_CACHE.pop(next(iter(_SMALL_CACHE)))  # evict oldest insert
    _SMALL_CACHE[key] = value


def broadcast_join(ds, small_df: pd.DataFrame, on, how: str = "inner", suffix: str = "_r", concurrency=None):
    """Broadcast-hash join: ``small_df`` is put in the object store once
    (``ray.put``) and fetched at most once per worker process (module
    cache) — never re-shipped per batch. Stateless tasks: no actor-pool
    spin-up, warm workers reused across stages."""
    import ray

    ref = ray.put(small_df)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        key = ref.hex()
        small = _SMALL_CACHE.get(key)
        if small is None:
            small = ray.get(ref)
            _small_cache_put(key, small)
        return batch.merge(small, on=on, how=how, suffixes=("", suffix))

    return ds.map_batches(merge, batch_format="pandas", batch_size=None)


def semi_join_keys(ds, keys, column: str):
    """Keep rows whose ``column`` is in the broadcast key set."""
    import pyarrow as pa
    import pyarrow.compute as pc

    vals = pa.array(sorted(keys))

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch[column], value_set=vals))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def anti_join_keys(ds, keys, column: str):
    """Drop rows whose ``column`` is in the broadcast key set."""
    import pyarrow as pa
    import pyarrow.compute as pc

    vals = pa.array(sorted(keys))

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(pc.is_in(batch[column], value_set=vals)))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def key_hash_scheme(ds, column: str) -> str:
    """Resolve the Bloom hashing scheme ("int" → splitmix64 over int64,
    "str" → FNV over str()) ONCE from the Dataset SCHEMA, never from a
    batch's pandas dtype: a null in one batch silently promotes an
    int64 key column to float64 there, and a per-batch dtype sniff
    would then hash the two batches differently — Bloom false
    negatives, i.e. wrong join results. Float key columns are rejected
    outright (hash-joining on floats is a correctness smell).

    An EMPTY dataset (selective filters at tiny scale can drain a side
    entirely, at which point Ray reports no schema at all) resolves to
    the sentinel scheme ``"empty"``: an empty build side means a Bloom
    that rejects everything, an empty probe side means there is nothing
    to filter — both are well-defined, neither should crash."""
    import numpy as np
    import pyarrow as pa

    sch = ds.schema()
    if sch is None:
        # Ray only returns None after fetching found zero blocks/rows
        return "empty"
    try:
        t = dict(zip(sch.names, sch.types))[column]
    except KeyError:
        raise KeyError(f"column {column!r} not in schema {sch.names}") from None
    if isinstance(t, pa.DataType):
        if pa.types.is_integer(t):
            return "int"
        if pa.types.is_floating(t):
            raise TypeError(f"refusing to hash float join key {column!r} ({t})")
        return "str"
    dt = np.dtype(t)
    if np.issubdtype(dt, np.integer):
        return "int"
    if np.issubdtype(dt, np.floating):
        raise TypeError(f"refusing to hash float join key {column!r} ({dt})")
    return "str"


def _hash_key_column(col, scheme: str, column: str):
    """Hash a pandas key Series under a pre-resolved scheme. Null keys
    raise: SQL semantics say NULL matches nothing, and silently hashing
    NaN (or letting it promote the dtype) corrupts the filter."""
    import numpy as np
    import pandas as pd

    from ..functions.bloom import hash_u64
    from ..functions.hashing import fnv1a_u64

    if pd.isna(col).any():
        raise ValueError(f"null join key in column {column!r}; drop nulls first")
    if scheme == "int":
        return hash_u64(col.to_numpy(dtype=np.int64))
    return fnv1a_u64([str(v) for v in col])


def build_bloom(ds, column: str, n_bits: int = 1 << 20, k: int = 5):
    """Build a Bloom filter over a Dataset column: per-batch partial
    filters (O(n_bits) bytes each, OR-mergeable) reduced on the driver
    — only bitsets cross the wire, never keys. The hash scheme is
    resolved once from the schema (see :func:`key_hash_scheme`) and
    recorded on the returned filter so probe sides can verify they
    canonicalize identically."""
    import pandas as pd

    from ..functions.bloom import BloomFilter

    scheme = key_hash_scheme(ds, column)
    if scheme == "empty":
        # empty build side: a zeroed filter (rejects every probe key)
        # with no pinned scheme, so any probe side is compatible
        acc = BloomFilter(n_bits=n_bits, k=k)
        acc.scheme = None
        return acc

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter(n_bits=n_bits, k=k)
        bf.add_hashes(_hash_key_column(batch[column], scheme, column))
        return pd.DataFrame({"bloom": [bf.to_bytes()]})

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=None).take_all()
    acc = BloomFilter(n_bits=n_bits, k=k)
    for row in parts:  # one O(n_bits) blob per block
        acc.merge(BloomFilter.from_bytes(row["bloom"]))
    acc.scheme = scheme
    return acc


def bloom_semi_filter(ds, column: str, bloom, invert: bool = False):
    """Semi-join pushdown: broadcast the Bloom bitset once (``ray.put``)
    and drop rows whose key cannot exist on the other join side before
    the shuffle. False positives pass through harmlessly — the join
    stays exact; false negatives are impossible (both sides hash under
    the same schema-resolved scheme, enforced here). With
    ``invert=True`` keeps only the Bloom REJECTS — rows whose key is
    certainly absent from the build side (the exact half of a
    distributed anti-join)."""
    import ray

    from ..functions.bloom import BloomFilter

    scheme = key_hash_scheme(ds, column)
    if scheme == "empty":
        return ds  # probe side has no rows: filtering is a no-op
    built = getattr(bloom, "scheme", None)
    if built is not None and built != scheme:
        raise TypeError(
            f"bloom built with scheme {built!r} but probe column {column!r} "
            f"resolves to {scheme!r}; cast one side so keys canonicalize identically"
        )
    ref = ray.put(bloom.to_bytes())

    def f(batch: pa.Table) -> pa.Table:
        key = "bloom:" + ref.hex()
        bf = _SMALL_CACHE.get(key)
        if bf is None:
            bf = BloomFilter.from_bytes(ray.get(ref))
            _small_cache_put(key, bf)
        m = bf.contains_hashes(
            _hash_key_column(batch[column].to_pandas(), scheme, column)
        )
        # Arrow-native filter: an empty result block keeps the TYPED
        # schema (a pandas empty frame would contribute object/null
        # columns and poison downstream join schema unification)
        return batch.filter(pa.array(~m if invert else m))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def anti_join_distributed(
    left_ds,
    right_ds,
    key: str,
    right_key: str | None = None,
    n_bits: int = 1 << 20,
    num_partitions: int | None = None,
):
    """Distributed anti-join: rows of ``left_ds`` whose ``key`` appears
    nowhere in ``right_ds[right_key]`` — with NO driver-side key set.

    Scale path: a Bloom filter over the right keys (mergeable bitsets,
    never keys, on the driver) splits the left into (a) Bloom REJECTS —
    certainly unmatched, kept immediately with zero shuffle, and (b)
    Bloom hits — actual matches plus ~fp-rate false positives, the only
    rows that enter a hash-shuffle ``Dataset.join`` (left_outer against
    the DISTINCT right keys) where null-marker rows are kept. At 100 TB
    the shuffle carries only the sparse suspect rows, and no key set
    ever materializes on the driver (contrast ``anti_join_keys``, the
    broadcast-set variant for known-small right sides).
    """
    import numpy as np
    import pandas as pd

    from .rollup import partitions_for_input

    right_key = right_key or key
    P = num_partitions or partitions_for_input(None)
    # ONE scan of the right side: the distinct-key Dataset (the hash
    # join's build side) is materialized once in the object store and
    # feeds BOTH the Bloom build and the verify join
    right_keys = (
        right_ds.select_columns([right_key]).groupby(right_key).count().materialize()
    )
    bloom = build_bloom(right_keys, right_key, n_bits=n_bits)
    # the certain/suspect branches fan out from the SAME left rows:
    # materialize once (object-store blocks, spill-managed) instead of
    # re-running the left's whole upstream derivation per branch
    left_ds = left_ds.materialize()
    certain = bloom_semi_filter(left_ds, key, bloom, invert=True)
    suspects = bloom_semi_filter(left_ds, key, bloom)

    def as_key(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[right_key]].copy()
        if right_key != key:
            out = out.rename(columns={right_key: key})
        return out

    keys_only = right_keys.map_batches(as_key, batch_format="pandas", batch_size=None)
    left_cols = list(left_ds.schema().names)
    # exact anti verify via the partition-merge idiom: the Bloom-hit
    # suspect side is SPARSE by construction, which trips Ray 2.49's
    # hash-shuffle-join schema race (see partition_merge_join)
    verified = partition_merge_join(
        suspects, keys_only, on=key, how="anti", num_partitions=P
    ).map_batches(
        lambda b: b[left_cols], batch_format="pandas", batch_size=None
    )
    return certain.select_columns(left_cols).union(verified)


def range_join_aggregate(
    ds,
    key: str,
    ts_col: str = "ts",
    value_col: str = "value",
    lo_s: float = -3600.0,
    hi_s: float = 3600.0,
    id_cols: tuple[str, ...] = ("event_id",),
    value_scale: int | None = 100,
    num_partitions: int | None = None,
):
    """Range (band) self-join aggregate: for every row, count and sum
    the same-key rows whose ``ts`` lies in ``[ts+lo_s, ts+hi_s]``
    (inclusive, self included) — the interval-join operator class the
    Dataset API lacks (ray_guide.md "As-of / range join").

    Scale path: ONE int-keyed hash shuffle co-locates each key's rows
    (same partition-level design as ``rollup_transcripts``); inside a
    partition one lexsort + two ``np.searchsorted`` calls over a
    segment-offset timestamp axis answer EVERY row's window bounds at
    once (segments are separated by an offset larger than any window,
    so windows cannot cross keys), and window sums come from prefix
    sums. Per-key Python overhead is O(P), not O(#keys). With
    ``value_scale`` set (fixed-decimal inputs) sums accumulate in
    int64, matching a SQL engine exactly.

    Partitioning assumption: one key's rows fit in one partition (same
    contract as every keyed map_groups in this repo); window length
    does not affect memory — output is one row per input row.
    """
    import numpy as np
    import pyarrow as pa

    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)
    lo_us = int(round(lo_s * 1e6))
    hi_us = int(round(hi_s * 1e6))
    if lo_us > hi_us:
        raise ValueError("lo_s must be <= hi_s")

    def add_part(batch: pa.Table) -> pa.Table:
        part = (
            pd.util.hash_pandas_object(
                batch[key].to_pandas(), index=False
            ).to_numpy()
            % P
        ).astype(np.int32)
        return batch.append_column("_part", pa.array(part))

    keep = list(dict.fromkeys((key, ts_col, value_col, *id_cols)))
    ds = ds.select_columns(keep).map_batches(
        add_part, batch_format="pyarrow", batch_size=None
    )

    def partition_fn(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            cols = {c: pd.Series([], dtype=object) for c in keep}
            cols["n_in_window"] = pd.Series([], dtype=np.int64)
            cols["sum_in_window"] = pd.Series([], dtype=np.float64)
            return pd.DataFrame(cols)
        codes, _ = pd.factorize(df[key], sort=False)
        t = df[ts_col].to_numpy(dtype="datetime64[us]").view("int64")
        order = np.lexsort((t, codes))
        codes_s, t_s = codes[order], t[order]
        v_s = df[value_col].to_numpy(dtype=np.float64)[order]
        # segment-offset axis: shift each key's timestamps by
        # seg_id * SPAN so no window can reach a neighboring segment
        t0 = t_s.min()
        # span must exceed R+hi (upper probes) AND R-lo (lower probes)
        # independently — hi and lo can each be of either sign
        span = int(t_s.max() - t0) + max(hi_us, 0) + max(-lo_us, 0) + 2
        nseg = int(codes_s.max()) + 1
        if nseg * span < 2**62:  # single searchsorted over the partition
            axis = (t_s - t0) + codes_s.astype(np.int64) * span
            lo_idx = np.searchsorted(axis, axis + lo_us, side="left")
            hi_idx = np.searchsorted(axis, axis + hi_us, side="right")
        else:  # astronomically wide data: per-segment fallback
            lo_idx = np.empty(n, dtype=np.int64)
            hi_idx = np.empty(n, dtype=np.int64)
            starts = np.flatnonzero(
                np.concatenate([[True], codes_s[1:] != codes_s[:-1]])
            )
            ends = np.append(starts[1:], n)
            for s, e in zip(starts, ends):
                seg = t_s[s:e]
                lo_idx[s:e] = s + np.searchsorted(seg, seg + lo_us, side="left")
                hi_idx[s:e] = s + np.searchsorted(seg, seg + hi_us, side="right")
        counts = hi_idx - lo_idx
        if value_scale:
            vi = np.round(v_s * value_scale).astype(np.int64)
            prefix = np.concatenate([[0], np.cumsum(vi)])
            sums = (prefix[hi_idx] - prefix[lo_idx]) / value_scale
        else:
            prefix = np.concatenate([[0.0], np.cumsum(v_s)])
            sums = prefix[hi_idx] - prefix[lo_idx]
        out = df.iloc[order][keep].reset_index(drop=True)
        out["n_in_window"] = counts
        out["sum_in_window"] = sums
        return out

    return ds.groupby("_part").map_groups(partition_fn, batch_format="pandas")


def asof_join(
    left_ds,
    right_ds,
    key: str,
    ts_col: str = "ts",
    direction: str = "backward",
    suffix: str = "_r",
):
    """As-of join: each left row matched to the most recent right row
    with right.ts <= left.ts for the same key (ray_guide.md "As-of /
    range join": sort both sides by (key, ts), pd.merge_asof per key).

    Both sides co-locate through ONE int-keyed exchange (key-hash %
    P), not one Ray group per key — per-group task/frame overhead is
    the measured ~10x trap at 1e5+ keys (see session_intervals /
    ssjoin_prefix) — and each partition resolves ALL of its keys in a
    single vectorized ``pd.merge_asof(..., by=key)``.
    """
    import pyarrow as pa

    from ..pipelines.queries import _join_partitions

    left_cols = list(left_ds.schema().names)
    right_cols = list(right_ds.schema().names)
    P = _join_partitions()

    def tag(side):
        def f(batch: pa.Table) -> pa.Table:
            part = (
                pd.util.hash_pandas_object(
                    batch[key].to_pandas(), index=False
                ).to_numpy()
                % P
            ).astype(np.int32)
            return batch.append_column(
                "_side", pa.array([side] * len(batch), pa.int8())
            ).append_column("_part", pa.array(part))

        return f

    left = left_ds.map_batches(tag(0), batch_format="pyarrow", batch_size=None)
    right = right_ds.map_batches(tag(1), batch_format="pyarrow", batch_size=None)
    # union null-fills the symmetric difference of the schemas; the
    # per-partition fn re-projects each side to its original columns
    both = left.union(right)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        lf = g.loc[g["_side"] == 0, left_cols].sort_values(ts_col, kind="mergesort")
        rf = g.loc[g["_side"] == 1, right_cols].sort_values(ts_col, kind="mergesort")
        return pd.merge_asof(
            lf, rf, on=ts_col, by=key, direction=direction, suffixes=("", suffix)
        )

    return both.groupby("_part").map_groups(per_part, batch_format="pandas")


def interval_overlap_join(
    left,
    right,
    key: str,
    start_col: str = "start_us",
    end_col: str = "end_us",
    left_cols: tuple[str, ...] = (),
    right_cols: tuple[str, ...] = (),
    num_partitions: int | None = None,
):
    """Per-key interval OVERLAP join: emit one row per (left interval,
    right interval) pair of the same ``key`` satisfying
    ``l.start <= r.end AND r.start <= l.end`` (inclusive — touching
    endpoints match), with the exact ``overlap_us`` length.

    Operator class the Dataset API lacks (temporal/spatial join).
    Scale path: ONE key-hash shuffle co-locates both sides (side-tagged
    union — the key's rows of BOTH tables land in the same partition);
    inside a partition the right side is sorted by (key, start) and,
    because its intervals are PER-KEY DISJOINT, its starts AND ends are
    both ascending within a segment, so every left row's overlap set is
    the contiguous range [searchsorted(ends, l.start), 
    searchsorted(starts, l.end)) — two segment-offset searchsorted
    calls answer all probes at once and pairs expand by repeat/arange.
    Per-key Python overhead is O(P), not O(#keys).

    Partitioning assumptions (documented contract): a key's rows fit in
    one partition, and the RIGHT side's intervals are non-overlapping
    within a key (e.g. ``streaming.sessionize`` output — sessions are
    separated by > gap). The LEFT side is arbitrary. Timestamps are
    int64 microseconds; all overlap arithmetic is exact integer.
    """
    import numpy as np

    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)
    lkeep = [c for c in left_cols if c not in (key, start_col, end_col)]
    rkeep = [c for c in right_cols if c not in (key, start_col, end_col)]

    def tag(side: int, keep):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            part = (
                pd.util.hash_pandas_object(batch[key], index=False).to_numpy() % P
            ).astype(np.int32)
            out = batch[[key, start_col, end_col, *keep]].copy()
            out["_side"] = np.int8(side)
            out["_part"] = part
            return out

        return f

    l_t = left.map_batches(tag(0, lkeep), batch_format="pandas", batch_size=None)
    r_t = right.map_batches(tag(1, rkeep), batch_format="pandas", batch_size=None)
    both = l_t.union(r_t)

    def empty() -> pd.DataFrame:
        cols = {key: pd.Series([], dtype=object)}
        for c in lkeep:
            cols[f"l_{c}"] = pd.Series([], dtype=object)
        cols["l_start_us"] = pd.Series([], dtype=np.int64)
        cols["l_end_us"] = pd.Series([], dtype=np.int64)
        for c in rkeep:
            cols[f"r_{c}"] = pd.Series([], dtype=object)
        cols["r_start_us"] = pd.Series([], dtype=np.int64)
        cols["r_end_us"] = pd.Series([], dtype=np.int64)
        cols["overlap_us"] = pd.Series([], dtype=np.int64)
        return pd.DataFrame(cols)

    def partition_fn(df: pd.DataFrame) -> pd.DataFrame:
        lm = df["_side"].to_numpy() == 0
        L, R = df[lm], df[~lm]
        if len(L) == 0 or len(R) == 0:
            return empty()
        codes, uniques = pd.factorize(
            pd.concat([L[key], R[key]], ignore_index=True), sort=False
        )
        lcode, rcode = codes[: len(L)], codes[len(L):]
        ls = L[start_col].to_numpy(dtype=np.int64)
        le = L[end_col].to_numpy(dtype=np.int64)
        rs = R[start_col].to_numpy(dtype=np.int64)
        re_ = R[end_col].to_numpy(dtype=np.int64)
        r_order = np.lexsort((rs, rcode))
        rcode_s, rs_s, re_s = rcode[r_order], rs[r_order], re_[r_order]
        lo_v = int(min(ls.min(), rs_s.min()))
        hi_v = int(max(le.max(), re_s.max()))
        span = (hi_v - lo_v) + 2
        if int(codes.max() + 1) * span >= 2**62:
            raise ValueError("interval domain too wide for segment-offset axis")
        r_start_axis = (rs_s - lo_v) + rcode_s.astype(np.int64) * span
        r_end_axis = (re_s - lo_v) + rcode_s.astype(np.int64) * span
        l_s_axis = (ls - lo_v) + lcode.astype(np.int64) * span
        l_e_axis = (le - lo_v) + lcode.astype(np.int64) * span
        lo_idx = np.searchsorted(r_end_axis, l_s_axis, side="left")
        hi_idx = np.searchsorted(r_start_axis, l_e_axis, side="right")
        counts = np.maximum(hi_idx - lo_idx, 0)
        total = int(counts.sum())
        if total == 0:
            return empty()
        l_rep = np.repeat(np.arange(len(L)), counts)
        base = np.repeat(np.cumsum(np.append(0, counts))[:-1], counts)
        r_idx = np.repeat(lo_idx, counts) + (np.arange(total) - base)
        ov = np.minimum(le[l_rep], re_s[r_idx]) - np.maximum(ls[l_rep], rs_s[r_idx])
        out = {key: L[key].to_numpy()[l_rep]}
        for c in lkeep:
            out[f"l_{c}"] = L[c].to_numpy()[l_rep]
        out["l_start_us"] = ls[l_rep]
        out["l_end_us"] = le[l_rep]
        for c in rkeep:
            out[f"r_{c}"] = R[c].to_numpy()[r_order][r_idx]
        out["r_start_us"] = rs_s[r_idx]
        out["r_end_us"] = re_s[r_idx]
        out["overlap_us"] = ov.astype(np.int64)
        return pd.DataFrame(out)

    return both.groupby("_part").map_groups(partition_fn, batch_format="pandas")


def windowed_distinct_count(
    ds,
    key: str,
    ts_col: str = "ts",
    value_col: str = "event_type",
    window_s: float = 3600.0,
    id_cols: tuple[str, ...] = ("event_id",),
    num_partitions: int | None = None,
):
    """Per row, the number of DISTINCT ``value_col`` values among the
    same key's rows in the trailing ``window_s`` seconds (RANGE frame,
    both ends inclusive — SQL ``count(distinct v) over (... range
    between W preceding and current row)``).

    Holistic window aggregate (running sums cannot express it). Scale
    path for a SMALL value domain (event types, status codes, …): one
    key-hash shuffle; per partition, one lexsort builds the
    segment-offset time axis and then D searchsorted pairs — one per
    distinct value — answer "does value d occur in this row's window"
    for EVERY row at once; distinct = sum of the D indicator vectors.
    Work is O(D · n log n) per partition with D = |domain|, and no
    per-row Python. For unbounded domains use a different operator
    (t-digest/HLL sketches for approximate, or a per-window exact
    pass); this one documents the bounded-domain contract.
    """
    import numpy as np
    import pyarrow as pa

    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)
    w_us = np.int64(round(window_s * 1e6))
    keep = [key, *id_cols]

    def add_part(batch: pa.Table) -> pa.Table:
        part = (
            pd.util.hash_pandas_object(batch[key].to_pandas(), index=False).to_numpy()
            % P
        ).astype(np.int32)
        return batch.select([key, ts_col, value_col, *id_cols]).append_column(
            "_part", pa.array(part)
        )

    def partition_fn(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            cols = {c: pd.Series([], dtype=object) for c in keep}
            cols["n_distinct"] = pd.Series([], dtype=np.int64)
            return pd.DataFrame(cols)
        codes, _ = pd.factorize(df[key], sort=False)
        t = df[ts_col].to_numpy(dtype="datetime64[us]").view("int64")
        order = np.lexsort((t, codes))
        codes_s, t_s = codes[order], t[order]
        vcodes, _ = pd.factorize(df[value_col].iloc[order], sort=False)
        t0 = t_s.min()
        span = int(t_s.max() - t0) + int(w_us) + 2
        if (int(codes_s.max()) + 1) * span >= 2**62:
            raise ValueError("time domain too wide for segment-offset axis")
        axis = (t_s - t0) + codes_s.astype(np.int64) * span
        D = int(vcodes.max()) + 1
        distinct = np.zeros(n, dtype=np.int64)
        for d in range(D):
            ax_d = axis[vcodes == d]
            lo = np.searchsorted(ax_d, axis - w_us, side="left")
            hi = np.searchsorted(ax_d, axis, side="right")
            distinct += (hi > lo).astype(np.int64)
        out = df.iloc[order][keep].reset_index(drop=True)
        out["n_distinct"] = distinct
        return out

    return (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(partition_fn, batch_format="pandas")
    )


def skew_join(
    fact_ds,
    dim_ds,
    fact_key: str,
    dim_key: str,
    hot_k: int = 64,
    num_partitions: int | None = None,
    hot_min_count: int | None = None,
):
    """Skew-aware hybrid inner join of a (possibly hot-keyed) fact
    Dataset against a dimension Dataset unique on ``dim_key``: the
    ~``hot_k`` heaviest fact keys (detected with mergeable Misra-Gries
    summaries — O(hot_k) counters per block, never a key histogram)
    are routed through a BROADCAST join against the tiny hot slice of
    the dimension, while the remaining rows take the normal
    hash-shuffle ``Dataset.join``.  A hash shuffle sends every row of
    a hot key to ONE partition — the straggler that kills wall-clock
    at scale; the broadcast path keeps hot rows where they already
    are.  Output equals a plain inner join at any skew (heavy-hitter
    false positives merely ride the broadcast path).

    A key only counts as hot when its Misra-Gries count reaches
    ``hot_min_count`` (default: half a partition's worth of fact rows,
    ``n / 2P``) — broadcasting pays off only when one key's rows rival
    a whole partition.  On skew-free data the hot set is empty and the
    operator IS the plain join: no extra fact passes, no dual-path
    overhead (measured 18.8s -> 12.3s on uniform keys at sf0.1).

    Duplicate dim keys are CORRECT (both sub-paths — the broadcast
    pandas merge and the shuffled Dataset.join — carry the
    multiplicity; tested), but a unique dim is the intended contract:
    with heavy dim-side duplication the hot slice pulled to the driver
    is bounded by hot_k * max-multiplicity, not hot_k.
    """
    from .distinct import heavy_hitters

    from ..pipelines.queries import _join_partitions

    P = num_partitions or _join_partitions()
    fact_ds = fact_ds.materialize()  # consumed 1-3x below; scan once
    hot = heavy_hitters(fact_ds.select_columns([fact_key]), fact_key, k=hot_k)
    if hot_min_count is None:
        n = fact_ds.count()
        # MG undercounts by at most n/hot_k: compare against the
        # lower-bounded threshold so a truly partition-scale key
        # cannot be missed.
        hot_min_count = max(1024, n // (2 * P))
    hot = hot[hot["approx_count"] >= hot_min_count]
    hot_keys = hot["item"].tolist()

    dim_cols = [c for c in dim_ds.schema().names]
    out_cols = [fact_key] + [
        c for c in fact_ds.schema().names if c != fact_key
    ] + [c for c in dim_cols if c != dim_key]

    cold = anti_join_keys(fact_ds, hot_keys, fact_key) if hot_keys else fact_ds
    joined_cold = cold.join(
        dim_ds, join_type="inner", num_partitions=P,
        on=(fact_key,), right_on=(dim_key,),
    ).select_columns(out_cols)
    if not hot_keys:
        return joined_cold

    hot_fact = semi_join_keys(fact_ds, hot_keys, fact_key)
    import pyarrow.compute as pc_

    hot_dim = (
        dim_ds.map_batches(
            lambda t: t.filter(pc_.is_in(t[dim_key], value_set=pa.array(sorted(hot_keys)))),
            batch_format="pyarrow", batch_size=None,
        ).to_pandas()  # <= hot_k rows: bounded by the parameter
    ).rename(columns={dim_key: fact_key})
    joined_hot = broadcast_join(hot_fact, hot_dim, on=fact_key).map_batches(
        lambda t: t.select(out_cols), batch_format="pyarrow", batch_size=None
    )
    return joined_cold.union(joined_hot)


def partition_merge_join(
    left_ds,
    right_ds,
    on: str,
    how: str = "inner",
    num_partitions: int | None = None,
):
    """Hash-partitioned merge join built from primitives this engine
    controls: both sides tag rows with ``hash(key) % P`` (one int-keyed
    exchange), and a pandas merge/membership test runs inside each
    partition.  Same exchange volume as ``Dataset.join`` on a single
    key, but immune to the Ray 2.49 hash-shuffle-join schema race on
    near-empty partitions (see benchmark_contamination) — use this for
    joins whose build or probe side can be SPARSE (post-Bloom
    residues, filtered key sets).

    ``how``: 'inner', 'left_outer', 'full_outer' (both sides' unmatched
    keys survive with NaN/None fill), 'semi' (left rows whose key
    exists on the right; right columns dropped), 'anti' (left rows
    whose key does NOT exist on the right).  ``on`` must name the key
    column in BOTH sides.
    """
    import numpy as np
    import pandas as pd

    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)
    lcols = [c for c in left_ds.schema().names]
    rcols = [c for c in right_ds.schema().names]
    if on not in lcols or on not in rcols:
        raise ValueError(f"join key {on!r} must exist on both sides")
    all_cols = list(dict.fromkeys(lcols + rcols))

    def tag(side: str, present: list[str]):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            for c in all_cols:
                if c not in batch.columns:
                    batch[c] = None
            batch["_side"] = side
            key = batch[on]
            if key.dtype == object:
                # a chained join can deliver the key as object dtype
                # (see merge_part note below); hash the NATIVE dtype so
                # both sides partition identically
                key = key.infer_objects()
            batch["_part"] = (
                pd.util.hash_pandas_object(key, index=False).to_numpy() % P
            ).astype(np.int32)
            return batch[all_cols + ["_side", "_part"]]

        return f

    both = left_ds.map_batches(
        tag("l", lcols), batch_format="pandas", batch_size=None
    ).union(
        right_ds.map_batches(tag("r", rcols), batch_format="pandas", batch_size=None)
    )

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        # the union concatenates int64 columns from one side with the
        # other side's None fill, silently promoting them to OBJECT
        # dtype; restore native dtypes so downstream consumers (e.g. a
        # second join keyed on a column that was a payload here) hash
        # and compare the values they were given, not boxed objects
        left = g.loc[g["_side"] == "l", lcols].infer_objects()
        right = g.loc[g["_side"] == "r", rcols].infer_objects()
        if how == "semi":
            return left[left[on].isin(set(right[on]))]
        if how == "anti":
            return left[~left[on].isin(set(right[on]))]
        pd_how = {"inner": "inner", "left_outer": "left", "full_outer": "outer"}[how]
        return left.merge(right, on=on, how=pd_how)

    return both.groupby("_part").map_groups(merge_part, batch_format="pandas")


def hash_groupby_sum(
    ds,
    key,
    sum_cols: tuple[str, ...],
    num_partitions: int | None = None,
):
    """Exact grouped SUM that avoids Ray's range-partition sort on the
    GROUP KEY (measured ~10x slower than an int-keyed exchange at 1e5+
    keys): per-batch pandas partials collapse each block to its
    distinct keys, rows are tagged with ``hash(key) % P``, and one
    partition pass finishes the sums.  ``key`` may be a string or a
    tuple of columns.  Sums use pandas int64/float64 accumulation —
    pass scaled-int columns for exactness.
    """
    import numpy as np
    import pandas as pd

    from .rollup import partitions_for_input

    keys = [key] if isinstance(key, str) else list(key)
    P = num_partitions or partitions_for_input(None)
    cols = keys + list(sum_cols)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[cols].groupby(keys, as_index=False).sum()
        # hash_pandas_object on a FRAME combines columns per row —
        # never .apply(tuple, axis=1), which boxes every row
        out["_part"] = (
            pd.util.hash_pandas_object(
                out[keys[0]] if len(keys) == 1 else out[keys], index=False
            ).to_numpy()
            % P
        ).astype(np.int32)
        return out

    tagged = ds.map_batches(partial, batch_format="pandas", batch_size=None)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g[cols].groupby(keys, as_index=False).sum()

    return tagged.groupby("_part").map_groups(merge, batch_format="pandas")


def hash_groupby_agg(
    ds,
    key,
    agg_map: "dict[str, str]",
    num_partitions: int | None = None,
):
    """Exact grouped SUM/MIN/MAX (mixable per column) with the same
    bounded-partition shape as :func:`hash_groupby_sum` — per-batch
    pandas partials (sum/min/max are all mergeable: agg of partials ==
    agg of rows), an int ``hash(key) % P`` tag, one partition pass to
    finish.  Replaces ``groupby().aggregate(Min/Max/Sum...)`` on
    high-cardinality keys, where Ray's sort-based aggregate was
    measured ~10x slower (see hash_groupby_sum).

    ``agg_map``: {column: "sum" | "min" | "max"}.
    """
    import numpy as np
    import pandas as pd

    from .rollup import partitions_for_input

    keys = [key] if isinstance(key, str) else list(key)
    P = num_partitions or partitions_for_input(None)
    cols = keys + list(agg_map)
    aggs = dict(agg_map)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[cols].groupby(keys, as_index=False).agg(aggs)
        out["_part"] = (
            pd.util.hash_pandas_object(
                out[keys[0]] if len(keys) == 1 else out[keys], index=False
            ).to_numpy()
            % P
        ).astype(np.int32)
        return out

    tagged = ds.map_batches(partial, batch_format="pandas", batch_size=None)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g[cols].groupby(keys, as_index=False).agg(aggs)

    return tagged.groupby("_part").map_groups(merge, batch_format="pandas")


# ---------------------------------------------------- adaptive join planning


def join_stats(ds, key: str, kmv_k: int = 1024, mg_k: int = 64,
               cms_width: int = 4096, cms_depth: int = 4) -> dict:
    """ONE streaming pass of per-block mergeable key statistics for
    physical join planning — the optimizer-statistics story, built from
    this repo's own sketch family:

    - ``n_rows``          exact row count,
    - ``kmv``             KMV/theta sketch of the key set (distinct
                          estimate + set intersection vs the other side),
    - ``mg``              Misra-Gries heavy-hitter summary (skew),
    - ``cms``             Count-Min sketch of key frequencies (the CMS
                          inner product estimates |A JOIN B| exactly as
                          sum_k f_A(k) * f_B(k)).

    Each block ships one row of serialized sketches; the driver merges
    O(blocks) of them — never key values. Hashing follows the
    schema-resolved scheme (`key_hash_scheme`), so both join sides of
    an int key hash identically regardless of per-batch null promotion.
    """
    import pickle

    import numpy as np

    from ..functions.cms import CountMinSketch
    from ..functions.heavy import mg_merge, mg_summarize
    from ..functions.sketch import HyperLogLog, KMVSketch

    scheme = key_hash_scheme(ds, key)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = _hash_key_column(batch[key], scheme, key)
        # fmix64-finalize for the order-statistic sketch (raw FNV/
        # splitmix low bits are fine for CMS buckets, not for KMV)
        mixed = HyperLogLog._fmix64(np.asarray(h, np.uint64))
        kmv = KMVSketch(k=kmv_k).add_hashes(mixed)
        cms = CountMinSketch(width=cms_width, depth=cms_depth).add_hashes(h)
        mg = mg_summarize(batch[key].to_numpy(), mg_k)
        return pd.DataFrame({
            "n": np.array([len(batch)], np.int64),
            "kmv": [kmv.to_bytes()],
            "cms": [cms.to_bytes()],
            "mg": [pickle.dumps(mg)],
        })

    rows = ds.map_batches(partial, batch_format="pandas", batch_size=None).to_pandas()
    kmv = KMVSketch(k=kmv_k)
    cms = CountMinSketch(width=cms_width, depth=cms_depth)
    mgs = []
    for blob in rows["kmv"]:
        kmv.merge(KMVSketch.from_bytes(blob))
    for blob in rows["cms"]:
        cms.merge(CountMinSketch.from_bytes(blob))
    for blob in rows["mg"]:
        import pickle as _p

        mgs.append(_p.loads(blob))
    return {
        "key": key,
        "scheme": scheme,
        "n_rows": int(rows["n"].sum()),
        "n_distinct": float(kmv.estimate()),
        "kmv": kmv,
        "cms": cms,
        "mg": mg_merge(mgs, mg_k),
    }


def auto_join(
    left_ds,
    right_ds,
    on: str,
    how: str = "inner",
    broadcast_limit: int = 200_000,
    skew_ratio: float = 8.0,
    num_partitions: int | None = None,
):
    """Adaptive physical join selection from sketch statistics (the
    cost-based-optimizer move, fully distributed statistics):

    1. ``join_stats`` on both sides (one streaming pass each);
    2. estimated output size = CMS inner product (Cormode &
       Muthukrishnan 2005) — returned for memory planning;
    3. strategy:
       - ``broadcast``  smaller side fits ``broadcast_limit`` rows ->
         fetch it once, ship via ``ray.put``, zero shuffle of the big
         side (`broadcast_join`);
       - ``skew``       the probe side has a Misra-Gries heavy hitter
         >= ``skew_ratio`` x the mean key frequency AND the other side
         is unique on the key (a dimension) -> hot keys replicate via
         `skew_join`, cold keys hash-exchange;
       - ``shuffle``    otherwise -> `partition_merge_join`.

    Returns ``(joined_dataset, decision)`` where ``decision`` records
    the strategy, both sides' stats and the estimated join rows —
    surfaced so pipelines can log WHY a plan was chosen.
    """
    import numpy as np

    ls = join_stats(left_ds, on)
    rs = join_stats(right_ds, on)
    est_rows = ls["cms"].inner_product(rs["cms"])

    def hottest_ratio(st):
        if not st["mg"] or st["n_distinct"] <= 0:
            return 0.0
        mean_freq = st["n_rows"] / max(st["n_distinct"], 1.0)
        return max(st["mg"].values()) / max(mean_freq, 1e-9)

    def is_dim(st):
        # unique-on-key within KMV error (4/sqrt(k) relative band)
        return abs(st["n_distinct"] - st["n_rows"]) <= max(
            4.0 / np.sqrt(st["kmv"].k) * st["n_rows"], 1.0)

    decision = {
        "strategy": None,
        "est_join_rows": int(est_rows),
        "left_rows": ls["n_rows"], "right_rows": rs["n_rows"],
        "left_distinct": round(ls["n_distinct"], 1),
        "right_distinct": round(rs["n_distinct"], 1),
        "left_hot_ratio": round(hottest_ratio(ls), 2),
        "right_hot_ratio": round(hottest_ratio(rs), 2),
    }

    if how not in ("inner", "left"):
        raise ValueError(f"auto_join supports how='inner'|'left', got {how!r}")
    if ls["scheme"] != rs["scheme"]:
        # an int64 side and a string side hash under different schemes:
        # every sketch comparison (CMS inner product, KMV overlap) and
        # the exchange itself would silently mismatch — refuse
        raise TypeError(
            f"join key {on!r} resolves to scheme {ls['scheme']!r} on the left "
            f"but {rs['scheme']!r} on the right; cast one side first"
        )

    small, big = (ls, rs) if ls["n_rows"] <= rs["n_rows"] else (rs, ls)
    # a LEFT join may only broadcast the RIGHT side: broadcasting the
    # left would lose its unmatched rows
    can_broadcast = (
        small["n_rows"] <= broadcast_limit
        and (how == "inner" or small is rs)
    )
    if can_broadcast:
        small_ds = left_ds if small is ls else right_ds
        big_ds = right_ds if small is ls else left_ds
        decision["strategy"] = "broadcast"
        out = broadcast_join(big_ds, small_ds.to_pandas(), on=on,
                             how="inner" if how == "inner" else "left")
        return out, decision
    if how == "inner":  # skew_join is inner-only
        if hottest_ratio(ls) >= skew_ratio and is_dim(rs):
            decision["strategy"] = "skew"
            out = skew_join(left_ds, right_ds, fact_key=on, dim_key=on,
                            num_partitions=num_partitions)
            return out, decision
        if hottest_ratio(rs) >= skew_ratio and is_dim(ls):
            decision["strategy"] = "skew"
            out = skew_join(right_ds, left_ds, fact_key=on, dim_key=on,
                            num_partitions=num_partitions)
            return out, decision
    decision["strategy"] = "shuffle"
    # sketch-driven Bloom pushdown: when the KMV key-set overlap says
    # most probe keys cannot match, filter them out BEFORE the exchange
    # (false positives pass harmlessly; the join stays exact). A LEFT
    # join must keep its unmatched left rows, so only the right side
    # may be prefiltered there.
    from ..functions.sketch import KMVSketch

    inter = KMVSketch.intersection(ls["kmv"], rs["kmv"])
    sel_l = inter / max(ls["n_distinct"], 1.0)
    sel_r = inter / max(rs["n_distinct"], 1.0)
    decision["key_overlap_est"] = round(float(inter), 1)
    probe_l, probe_r = left_ds, right_ds
    if sel_l < 0.5 and how == "inner":
        probe_l = bloom_semi_filter(left_ds, on, build_bloom(right_ds, on))
        decision["bloom_prefilter"] = "left"
    elif sel_r < 0.5:
        probe_r = bloom_semi_filter(right_ds, on, build_bloom(left_ds, on))
        decision["bloom_prefilter"] = "right"
    out = partition_merge_join(
        probe_l, probe_r, on=on,
        how="inner" if how == "inner" else "left_outer",
        num_partitions=num_partitions)
    return out, decision
