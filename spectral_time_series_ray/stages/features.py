"""Per-turn feature derivation.

Stateless, vectorized features (text length, token estimate) run as a
zero-copy pyarrow ``map_batches``; the order-dependent inter-turn
latency runs per conversation (stable ``(conv_id, turn_idx)`` sort
inside the group — Ray groupby does not guarantee in-group order;
SURVEY.md §7.4).

Reference analogues: AddObservedMask / AddTimeIndex feature transforms
(`uni2ts/src/uni2ts/transform/feature.py`), and the causal-op ordering
invariant (`uni2ts/src/uni2ts/transform/imputation.py:44-62`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def add_text_features(batch: pa.Table) -> pa.Table:
    """text_len (chars) + ws_tokens (whitespace token count), vectorized.

    Text is whitespace-trimmed before splitting and empty/whitespace-only
    text counts 0 tokens — otherwise the regex split counts the empty
    string as 1 token and leading/trailing whitespace as extra tokens,
    diverging from the documented token semantics (and the SQL oracle)."""
    text = batch["text"]
    batch = batch.append_column("text_len", pc.utf8_length(text))
    trimmed = pc.utf8_trim_whitespace(text)
    tokens = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
    tokens = pc.if_else(
        pc.equal(trimmed, ""), pa.scalar(0, tokens.type), tokens
    )
    batch = batch.append_column("ws_tokens", tokens)
    return batch


def _latency_group(batch: pa.Table) -> pa.Table:
    """Per-conversation latency: sort by turn_idx, diff ts (seconds).

    First turn's latency is null (no predecessor) — rollup counts are
    over observed values only, mirroring the reference's observed_mask
    semantics (feature.py:108-127).
    """
    order = pc.sort_indices(batch["turn_idx"])
    batch = batch.take(order)
    ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    lat = np.empty(len(ts), dtype=np.float64)
    lat[0] = np.nan
    if len(ts) > 1:
        lat[1:] = np.diff(ts) / 1e6
    # from_pandas=True maps NaN -> Arrow null so downstream aggregates
    # skip unobserved values (observed_mask semantics)
    return batch.append_column("latency_s", pa.array(lat, pa.float64(), from_pandas=True))


def with_turn_features(ds, include_text: bool = True):
    """Full feature derivation: vectorized text features, then grouped
    latency. ``include_text=False`` projects the wide text column out
    before the shuffle (SURVEY.md §7.4: don't shuffle big strings
    through the rollup path)."""
    ds = ds.map_batches(add_text_features, batch_format="pyarrow", batch_size=None)
    if not include_text:
        cols = [c for c in ds.schema().names if c != "text"]
        ds = ds.select_columns(cols)
    return ds.groupby("conv_id").map_groups(_latency_group, batch_format="pyarrow")
