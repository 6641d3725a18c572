"""Schema-evolution-tolerant Parquet reading.

Long-lived ingest directories accumulate shards written by different
producer versions: later shards add columns, dtypes widen (int32 ->
int64), column order drifts. ``ray.data.read_parquet`` over such a
directory either errors on the union schema or silently yields blocks
with inconsistent schemas downstream (schema-mismatch warnings, broken
groupbys).

``read_parquet_evolved`` reads every shard and normalizes each block
to a single TARGET schema:

- missing columns filled with typed nulls,
- extra columns dropped,
- safe upcasts applied (int widening, int -> float, string <-> large
  string, timestamp unit rescale),
- column order fixed.

The target schema is either passed explicitly or derived by unifying
the footer schemas of all shards (widest type wins; pure metadata —
no data read). Normalization is a zero-copy-where-possible Arrow
``map_batches``; everything streams.
"""

from __future__ import annotations

import pyarrow as pa


_INT_ORDER = {
    pa.int8(): 0, pa.int16(): 1, pa.int32(): 2, pa.int64(): 3,
    pa.uint8(): 0, pa.uint16(): 1, pa.uint32(): 2, pa.uint64(): 3,
}


def _wider(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """Pick the wider of two types for the unified target schema."""
    if a == b:
        return a
    if pa.types.is_integer(a) and pa.types.is_integer(b):
        return a if _INT_ORDER[a] >= _INT_ORDER[b] else b
    num = lambda t: pa.types.is_integer(t) or pa.types.is_floating(t)
    if num(a) and num(b):
        if pa.types.is_floating(a) and pa.types.is_floating(b):
            return a if a.bit_width >= b.bit_width else b
        return pa.float64()
    if pa.types.is_timestamp(a) and pa.types.is_timestamp(b):
        # finer unit wins (us over s), tz must agree
        if a.tz != b.tz:
            raise TypeError(f"timestamp tz conflict: {a} vs {b}")
        order = {"s": 0, "ms": 1, "us": 2, "ns": 3}
        return a if order[a.unit] >= order[b.unit] else b
    if pa.types.is_string(a) and pa.types.is_large_string(b):
        return b
    if pa.types.is_large_string(a) and pa.types.is_string(b):
        return a
    raise TypeError(f"cannot unify shard column types {a} and {b}")


def unify_parquet_schemas(paths: list[str]) -> pa.Schema:
    """Union of all shard footer schemas, widest type per column,
    columns in first-seen order. Metadata-only (no row reads)."""
    import pyarrow.parquet as pq

    fields: dict[str, pa.DataType] = {}
    for p in paths:
        sch = pq.read_schema(p)
        for f in sch:
            fields[f.name] = (
                _wider(fields[f.name], f.type) if f.name in fields else f.type
            )
    return pa.schema(list(fields.items()))


def normalize_to_schema(batch: pa.Table, target: pa.Schema) -> pa.Table:
    """Project/cast one Arrow block onto the target schema: missing
    columns become typed nulls, extras are dropped, types are cast."""
    n = len(batch)
    cols = []
    for f in target:
        if f.name in batch.schema.names:
            col = batch[f.name]
            if col.type != f.type:
                col = col.cast(f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, type=f.type))
    return pa.table(dict(zip(target.names, cols)))


def read_parquet_evolved(
    paths,
    target_schema: pa.Schema | None = None,
    columns: list[str] | None = None,
    **read_kwargs,
):
    """Read heterogeneous Parquet shards as ONE schema-stable Dataset.

    ``paths`` is a list of files/dirs (or a single dir). With no
    ``target_schema`` the union-widest schema is derived from the
    shard footers. ``columns`` projects the target schema (missing
    columns still surface as typed nulls so downstream code can rely
    on them).
    """
    import os

    import ray.data

    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files += sorted(
                os.path.join(p, n) for n in os.listdir(p) if n.endswith(".parquet")
            )
        else:
            files.append(p)
    target = target_schema or unify_parquet_schemas(files)
    if columns is not None:
        target = pa.schema([target.field(c) for c in columns])

    # read shards WITHOUT a cross-file schema requirement: per-file
    # columns pruned to the intersection at the scan, normalization
    # fills/casts per block
    ds = ray.data.read_parquet(files, **read_kwargs)

    def norm(batch: pa.Table) -> pa.Table:
        return normalize_to_schema(batch, target)

    return ds.map_batches(norm, batch_format="pyarrow", batch_size=None)
