"""JSONL (newline-delimited JSON) transcript source/sink.

Transcript logs commonly arrive as JSONL shards (one turn per line)
rather than Parquet. This module round-trips the ``input_hint`` schema
``(conv_id, turn_idx, role, text, tool, ts)`` through JSONL:

- ``write_transcripts_jsonl``: Dataset -> sharded JSONL directory.
  JSON has no timestamp type, so ``ts`` travels as an ISO-8601 string
  (Arrow's canonical ``timestamp -> string`` cast, microsecond
  precision — lossless).
- ``read_transcripts_jsonl``: sharded JSONL -> Dataset with the
  canonical Arrow schema restored (``ts`` parsed back to
  ``timestamp[us]`` via Arrow's ISO-8601 ``string -> timestamp``
  cast; ``turn_idx`` re-narrowed to int32 — JSON integers surface as
  int64).

Both directions are streaming ``map_batches`` stages over zero-copy
Arrow batches; no driver materialization at any size. The reference
analogue is the CSV/long-format ingestion path
(`uni2ts/src/uni2ts/data/builder/simple.py:40-87`) — same
normalize-at-the-edge pattern, different wire format.
"""

from __future__ import annotations

import pyarrow as pa


def _to_wire(batch: pa.Table) -> pa.Table:
    """Arrow -> JSON-safe: ts timestamp[us] -> ISO-8601 string."""
    i = batch.schema.get_field_index("ts")
    return batch.set_column(i, "ts", batch["ts"].cast(pa.string()))


def _from_wire(batch: pa.Table) -> pa.Table:
    """JSON-parsed Arrow -> canonical schema: ts string -> timestamp[us],
    turn_idx int64 -> int32, null text/tool -> '' (JSON writers often
    omit empty strings; parquet side stores them as '')."""
    import pyarrow.compute as pc

    if batch.schema.field("ts").type == pa.string():
        i = batch.schema.get_field_index("ts")
        batch = batch.set_column(i, "ts", batch["ts"].cast(pa.timestamp("us")))
    if batch.schema.field("turn_idx").type != pa.int32():
        i = batch.schema.get_field_index("turn_idx")
        batch = batch.set_column(i, "turn_idx", batch["turn_idx"].cast(pa.int32()))
    for name in ("text", "tool"):
        if name in batch.schema.names and batch[name].null_count:
            i = batch.schema.get_field_index(name)
            batch = batch.set_column(
                i, name, pc.fill_null(batch[name], "")
            )
    return batch


def write_transcripts_jsonl(ds, out_dir: str) -> None:
    """Write a transcript Dataset as sharded JSONL (one file per
    block, one JSON object per turn)."""
    ds.map_batches(_to_wire, batch_format="pyarrow", batch_size=None).write_json(
        out_dir
    )


def read_transcripts_jsonl(path: str, columns: list[str] | None = None):
    """Read sharded JSONL transcripts back into the canonical Arrow
    schema. ``columns`` projects after parse (JSON is row-oriented —
    every line is read regardless; for column pruning at the scan use
    the Parquet source)."""
    import ray.data

    from .transcripts import default_num_blocks

    ds = ray.data.read_json(path, override_num_blocks=default_num_blocks())
    ds = ds.map_batches(_from_wire, batch_format="pyarrow", batch_size=None)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds
