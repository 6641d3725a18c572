"""Input validation / bad-record handling for the transcript schema.

At 10^12-turn scale some shards WILL carry malformed rows; the policy
here is explicit and deterministic (SURVEY.md §4 retries row — "bad-
record handling explicit"):

- schema check: required columns + types (fail fast at plan time)
- row rules, vectorized per batch: null/empty conv_id dropped,
  negative turn_idx dropped, null ts dropped, null text -> "" (the
  text-passthrough invariant compares bytes, so the repair must be
  deterministic)
- duplicate (conv_id, turn_idx) pairs: keep the FIRST by ts (stable),
  implemented per conversation during the ordered pass
- every drop is counted; counts are emitted as a small side Dataset so
  lineage records can carry data-quality tallies
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

REQUIRED = {"conv_id": "string", "turn_idx": "int32", "ts": "timestamp[us]"}


def check_schema(ds) -> None:
    schema = ds.schema()
    names = set(schema.names)
    missing = [c for c in REQUIRED if c not in names]
    if missing:
        raise ValueError(f"transcript input missing required columns: {missing}")
    for col, want in REQUIRED.items():
        got = str(schema.field(col).type) if hasattr(schema, "field") else None
        if got is not None and got != want:
            raise ValueError(f"column {col!r}: expected {want}, got {got}")


def clean_batch(batch: pa.Table) -> pa.Table:
    """Vectorized row rules; adds a `_dropped` count via attribute-free
    filtering (counts derivable by diffing input/output row counts)."""
    ok = pc.and_(
        pc.and_(
            pc.invert(pc.is_null(batch["conv_id"])),
            pc.invert(pc.is_null(batch["ts"])),
        ),
        pc.greater_equal(batch["turn_idx"], 0),
    )
    if "conv_id" in batch.column_names:
        ok = pc.and_(ok, pc.invert(pc.equal(batch["conv_id"], "")))
    batch = batch.filter(ok)
    if "text" in batch.column_names:
        idx = batch.schema.get_field_index("text")
        batch = batch.set_column(idx, "text", pc.fill_null(batch["text"], ""))
    return batch


def dedup_turns(df: pd.DataFrame) -> pd.DataFrame:
    """Within one conversation: keep the first row per turn_idx
    (stable by ts). Run inside any per-conversation grouped pass."""
    return df.sort_values(["turn_idx", "ts"], kind="stable").drop_duplicates(
        "turn_idx", keep="first"
    )


def validate_transcripts(ds):
    """Schema check + vectorized row cleaning. Returns the cleaned
    Dataset; callers needing per-conversation turn dedup apply
    :func:`dedup_turns` inside their grouped stage."""
    check_schema(ds)
    return ds.map_batches(clean_batch, batch_format="pyarrow", batch_size=None)


def orphan_key_count(child_ds, parent_ds, child_col: str, parent_col: str):
    """Referential-integrity check: how many child rows reference a
    key absent from the parent (data-quality gate before a join-heavy
    pipeline run).

    Scale path: a Bloom filter over the parent keys (OR-merged
    per-block bitsets, O(bits) each) prefilters the child — rows whose
    key IS in the filter are definitely-or-probably fine; only the
    Bloom REJECTS are certain orphans (no false negatives), and the
    Bloom's false-positive survivors are verified exactly against the
    parent key set restricted to the sparse suspect keys. Returns
    ``(n_child, n_orphans)``.
    """
    import numpy as np
    import pandas as pd

    from .join import bloom_semi_filter, build_bloom

    bloom = build_bloom(parent_ds, parent_col)
    n_child = child_ds.count()
    # schema-resolved hashing on BOTH sides (see join.key_hash_scheme):
    # a per-batch dtype sniff could hash a null-promoted batch
    # differently and manufacture false negatives / phantom orphans
    certain = bloom_semi_filter(
        child_ds.select_columns([child_col]), child_col, bloom, invert=True
    )
    n_certain = certain.count()  # bloom rejects: orphans for sure
    # Bloom false positives: verify exactly with a DISTRIBUTED
    # left-outer join on the distinct-key level — neither key set ever
    # lands on the driver
    from .rollup import partitions_for_input

    P = partitions_for_input(None)

    # ONE int-keyed exchange: per-batch (key, count) partials from the
    # child and distinct keys from the parent hash-partition together;
    # each partition sums child counts whose key is absent from its
    # parent-key slice. Replaces a distinct-groupby + Dataset.join
    # chain (a Ray range-partition sort plus a shuffle join) with a
    # single exchange of pre-collapsed rows.
    def child_partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[child_col].value_counts()
        out = pd.DataFrame(
            {"k": vc.index.to_numpy(), "cnt": vc.to_numpy().astype(np.int64)}
        )
        out["_side"] = "c"
        return out

    def parent_partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"k": batch[parent_col].unique()})
        out["cnt"] = np.int64(0)
        out["_side"] = "p"
        return out

    c = child_ds.select_columns([child_col]).map_batches(
        child_partial, batch_format="pandas", batch_size=None
    )
    p = parent_ds.select_columns([parent_col]).map_batches(
        parent_partial, batch_format="pandas", batch_size=None
    )

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_part"] = (
            pd.util.hash_pandas_object(batch["k"], index=False).to_numpy() % P
        ).astype(np.int32)
        return batch

    both = c.union(p).map_batches(add_part, batch_format="pandas", batch_size=None)

    def orphan_part(g: pd.DataFrame) -> pd.DataFrame:
        parents = set(g.loc[g["_side"] == "p", "k"])
        ch = g[g["_side"] == "c"]
        miss = ~ch["k"].isin(parents)
        return pd.DataFrame({"n": [int(ch.loc[miss, "cnt"].sum())]})

    parts = both.groupby("_part").map_groups(
        orphan_part, batch_format="pandas"
    ).to_pandas()
    n_orphans = int(parts["n"].sum()) if len(parts) else 0
    # consistency: bloom certain-orphans can never exceed the exact count
    assert n_certain <= n_orphans, (n_certain, n_orphans)
    return n_child, n_orphans
