"""Bucketed parquet layout + shuffle-free aligned-bucket join.

The warehouse pattern (Hive/Spark bucketed tables, Iceberg bucket
transforms): hash-partition a table ONCE at write time into N bucket
files keyed by ``splitmix64(key) % N``, record (key, N, hash scheme)
in a manifest, and every later equi-join between two tables bucketed
the SAME way needs NO exchange at all — task *i* reads bucket *i* of
both sides and merges locally. At 100 TB this converts every repeated
join on the table's natural key (orderkey, user_id, doc_id) from an
all-to-all shuffle into an embarrassingly parallel map; the one-time
bucketing write costs a single exchange, amortized across every
downstream join.

Layout: ``{root}/bucket=NNNNN.parquet`` + ``{root}/_bucketed.json``
(key column, n_buckets, scheme, row counts). Buckets are written one
directory per table so a failed bucketing run can be re-driven per
bucket; missing bucket files read as empty (a hash range can
legitimately be empty at small scale).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST = "_bucketed.json"


def _bucket_ids(col: pd.Series, n_buckets: int, column: str) -> np.ndarray:
    from ..functions.bloom import hash_u64

    if pd.isna(col).any():
        raise ValueError(f"null bucket key in column {column!r}; drop nulls first")
    return (hash_u64(col.to_numpy(dtype=np.int64)) % np.uint64(n_buckets)).astype(
        np.int32
    )


def write_bucketed(ds, key: str, n_buckets: int, root: str) -> dict:
    """Hash-bucket ``ds`` by integer column ``key`` into ``n_buckets``
    parquet files under ``root`` (ONE exchange — the last shuffle this
    table's key ever needs). Returns the manifest dict."""
    from ..stages.join import key_hash_scheme

    scheme = key_hash_scheme(ds, key)
    if scheme != "int":
        raise TypeError(
            f"bucketed layout v1 supports integer keys only; {key!r} is {scheme}"
        )
    os.makedirs(root, exist_ok=True)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_bucket"] = _bucket_ids(batch[key], n_buckets, key)
        return batch

    def write_one(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["_bucket"].iloc[0])
        out = g.drop(columns=["_bucket"])
        path = os.path.join(root, f"bucket={b:05d}.parquet")
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False), path)
        return pd.DataFrame({"bucket": [b], "n_rows": [len(out)]})

    stats = (
        ds.map_batches(tag, batch_format="pandas", batch_size=None)
        .groupby("_bucket")
        .map_groups(write_one, batch_format="pandas")
        .to_pandas()
    )
    sch = ds.schema()
    manifest = {
        "key": key,
        "n_buckets": int(n_buckets),
        "scheme": "splitmix64",
        "columns": {n: str(t) for n, t in zip(sch.names, sch.types)},
        "buckets": {int(r.bucket): int(r.n_rows) for r in stats.itertuples()},
        "n_rows": int(stats["n_rows"].sum()),
    }
    with open(os.path.join(root, MANIFEST), "w") as f:
        json.dump(manifest, f)
    return manifest


def read_bucketed_manifest(root: str) -> dict:
    with open(os.path.join(root, MANIFEST)) as f:
        return json.load(f)


def _read_bucket(root: str, b: int) -> pd.DataFrame | None:
    path = os.path.join(root, f"bucket={b:05d}.parquet")
    if not os.path.exists(path):
        return None
    return pq.read_table(path).to_pandas()


def bucketed_join(
    root_left: str,
    root_right: str,
    how: str = "inner",
    left_key: str | None = None,
    right_key: str | None = None,
):
    """Equi-join two same-bucketed tables with ZERO exchange: one Ray
    task per bucket index reads bucket *i* of both layouts and merges
    locally (co-partitioned by construction — same splitmix64 scheme,
    same N, verified from the manifests). ``how``: 'inner',
    'left_outer', 'semi', 'anti' (pandas-merge semantics, matching
    `join.partition_merge_join`). Returns a Ray Dataset."""
    import ray.data

    ml, mr = read_bucketed_manifest(root_left), read_bucketed_manifest(root_right)
    if ml["n_buckets"] != mr["n_buckets"] or ml["scheme"] != mr["scheme"]:
        raise ValueError(
            f"bucket layouts incompatible: {ml['n_buckets']}/{ml['scheme']} vs "
            f"{mr['n_buckets']}/{mr['scheme']} — rebucket one side"
        )
    lk = left_key or ml["key"]
    rk = right_key or mr["key"]
    n = ml["n_buckets"]

    def _typed_empty(cols: dict) -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series([], dtype=np.dtype(_np_dtype(t)))
                             for c, t in cols.items()})

    def _np_dtype(arrow_name: str) -> str:
        return {
            "int64": "int64", "int32": "int32", "double": "float64",
            "float": "float32", "bool": "bool",
            "timestamp[us]": "datetime64[us]", "timestamp[ns]": "datetime64[ns]",
        }.get(arrow_name, "object")

    def join_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for b in batch["id"].tolist():
            left = _read_bucket(root_left, int(b))
            right = _read_bucket(root_right, int(b))
            if left is None:
                left = _typed_empty(ml["columns"])
            if right is None:
                right = _typed_empty(mr["columns"])
            if how == "semi":
                frames.append(left[left[lk].isin(set(right[rk]))])
            elif how == "anti":
                frames.append(left[~left[lk].isin(set(right[rk]))])
            else:
                pd_how = {"inner": "inner", "left_outer": "left"}[how]
                frames.append(
                    left.merge(right, left_on=lk, right_on=rk, how=pd_how)
                )
        return pd.concat(frames, ignore_index=True)

    ids = ray.data.range(n, override_num_blocks=n)
    return ids.map_batches(join_bucket, batch_format="pandas", batch_size=None)


def bucketed_lookup(root: str, keys) -> "pd.DataFrame":
    """Point lookups against a bucketed layout WITHOUT a scan: each
    key hashes to exactly one bucket file, so a k-key lookup reads at
    most min(k, n_buckets) files out of the whole table — the O(1)
    per-key read path that makes a 100 TB bucketed table queryable
    interactively. Returns the matching rows (driver-side frame; point
    lookups are small by definition)."""
    m = read_bucketed_manifest(root)
    keys = np.asarray(list(keys), dtype=np.int64)
    buckets = _bucket_ids(pd.Series(keys), m["n_buckets"], m["key"])
    frames = []
    key_col = m["key"]
    for b in np.unique(buckets):
        want = set(keys[buckets == b].tolist())
        df = _read_bucket(root, int(b))
        if df is not None and len(df):
            frames.append(df[df[key_col].isin(want)])
    if not frames:
        return pd.DataFrame(
            {c: pd.Series([], dtype="object") for c in m["columns"]}
        )
    return pd.concat(frames, ignore_index=True)
