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
