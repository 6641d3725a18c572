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


class _BroadcastMerge:
    """Actor: deserialize the broadcast side once per actor."""

    def __init__(self, small_ref, on, how, suffix):
        import ray

        self.small = ray.get(small_ref)
        self.on = on
        self.how = how
        self.suffix = suffix

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(self.small, on=self.on, how=self.how, suffixes=("", self.suffix))


def broadcast_join(ds, small_df: pd.DataFrame, on, how: str = "inner", suffix: str = "_r", concurrency: int = 4):
    """Broadcast-hash join: ``small_df`` is put in the object store once
    and read in every actor's ``__init__`` — never re-shipped per batch."""
    import ray

    ref = ray.put(small_df)
    return ds.map_batches(
        _BroadcastMerge,
        fn_constructor_args=(ref, on, how, suffix),
        batch_format="pandas",
        concurrency=concurrency,
    )


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
