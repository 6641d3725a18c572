"""Arrow IPC (Feather v2) transcript source/sink.

The third wire format next to Parquet and JSONL: Arrow IPC files carry
the EXACT in-memory schema (timestamps stay timestamp[us], int32 stays
int32 — no cast at either edge, unlike JSONL) and decode zero-copy, so
they are the natural shard format for intermediate hand-offs between
engines that both speak Arrow.

- ``write_transcripts_ipc``: Dataset -> one ``.arrow`` file per block
  via a streaming ``map_batches`` stage (each task serializes ONLY its
  own block with ``pa.ipc.new_file``; the driver sees one path string
  per block, never data).
- ``read_transcripts_ipc``: sharded ``.arrow`` directory -> Dataset
  via ``read_binary_files`` + a per-file IPC decode batch stage —
  distributed, one task per shard, schema taken from the file itself.

Ray Data has no built-in IPC datasource; both directions stay inside
map_batches so the streaming executor schedules and pipelines them
like any other stage.
"""

from __future__ import annotations

import os
import uuid

import pandas as pd
import pyarrow as pa


def write_transcripts_ipc(ds, out_dir: str) -> int:
    """Write each block as one Feather-v2 (Arrow IPC file-format)
    shard. Returns the number of shards written."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pd.DataFrame:
        path = os.path.join(out_dir, f"shard-{uuid.uuid4().hex}.arrow")
        with pa.OSFile(path, "wb") as f:
            with pa.ipc.new_file(f, batch.schema) as w:
                w.write_table(batch)
        return pd.DataFrame({"path": [path], "rows": [batch.num_rows]})

    manifest = ds.map_batches(
        write_block, batch_format="pyarrow", batch_size=None
    ).to_pandas()  # one (path, rows) row per block
    return len(manifest)


def read_transcripts_ipc(path: str, columns: list[str] | None = None):
    """Read an ``.arrow`` shard directory back into a Dataset: one
    decode task per shard, exact schema preserved by the format."""
    import ray.data

    def decode(batch: pd.DataFrame) -> pa.Table:
        tables = []
        for raw in batch["bytes"]:
            with pa.ipc.open_file(pa.BufferReader(raw)) as r:
                t = r.read_all()
            tables.append(t.select(columns) if columns is not None else t)
        return pa.concat_tables(tables)

    ds = ray.data.read_binary_files(path, file_extensions=["arrow"])
    return ds.map_batches(decode, batch_format="pandas", batch_size=None)
