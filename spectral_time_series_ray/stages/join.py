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

import pandas as pd


# per-worker-process cache of deserialized broadcast sides: stateless
# tasks get actor-like amortization without actor-pool startup cost
_SMALL_CACHE: dict[str, pd.DataFrame] = {}


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
            _SMALL_CACHE.clear()  # bound the cache: one live side per worker
            _SMALL_CACHE[key] = small
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

    The right side is grouped per key alongside the left via a tagged
    union + single groupby — one shuffle, both sides co-located.
    """
    import pyarrow as pa

    left_cols = list(left_ds.schema().names)
    right_cols = list(right_ds.schema().names)

    def tag(side):
        def f(batch: pa.Table) -> pa.Table:
            return batch.append_column("_side", pa.array([side] * len(batch), pa.int8()))

        return f

    left = left_ds.map_batches(tag(0), batch_format="pyarrow", batch_size=None)
    right = right_ds.map_batches(tag(1), batch_format="pyarrow", batch_size=None)
    # union null-fills the symmetric difference of the schemas; the
    # per-key fn re-projects each side to its original columns
    both = left.union(right)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        lf = g.loc[g["_side"] == 0, left_cols].sort_values(ts_col)
        rf = g.loc[g["_side"] == 1, [c for c in right_cols if c != key]].sort_values(ts_col)
        return pd.merge_asof(lf, rf, on=ts_col, direction=direction, suffixes=("", suffix))

    return both.groupby(key).map_groups(per_key, batch_format="pandas")
