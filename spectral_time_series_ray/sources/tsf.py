"""Monash ``.tsf`` (TSF) time-series archive source.

The reference ingests Monash forecasting-archive datasets through
gluonts ``get_dataset`` (which downloads and parses ``.tsf`` zips) in
`uni2ts/src/uni2ts/data/builder/lotsa_v1/gluonts.py:345-403`, emitting
one row per series with ``(item_id, start, freq, target)``.  This
module parses the public TSF format itself (Godahewa et al.,
"Monash Time Series Forecasting Archive", NeurIPS 2021 — format spec
published with the archive) Ray-Data-first:

- the DRIVER reads only the header (the ``@attribute`` /
  ``@frequency`` / ``@missing`` / ``@data`` preamble — a few hundred
  bytes, bounded by the attribute count, never by the data);
- the data body streams through ``ray.data.read_text`` (splittable
  by line ranges across blocks) into a vectorized ``map_batches``
  parser, so a 100 GB .tsf shards across the cluster like any other
  text source;
- ``.zip`` archives are extracted once to a scratch dir first (zip is
  not a splittable container — the one-time inflate is the price of
  the wire format, stated here rather than hidden).

Output schema: one row per series —
``item_id: string`` (the ``series_name`` attribute when declared,
else the first declared attribute cast to string, else a synthesized
content-stable id ``h<16 hex>`` — a blake2b digest of the series
line, deterministic under any block sharding, unlike an ordinal),
remaining declared attributes with their TSF types
(string/numeric/date), ``freq: string`` (pandas offset alias mapped
from the TSF ``@frequency``), ``start: timestamp[s]`` (the series'
``start_timestamp`` attribute if declared, else NaT), and
``target: list<float32>`` with TSF ``?`` missing markers as NaN.

Row filters mirroring the reference's gen_func (min length, NaN
share) are composable downstream — kept out of the reader on purpose.
"""

from __future__ import annotations

import os
import zipfile

import numpy as np
import pandas as pd
import pyarrow as pa

# TSF @frequency -> pandas offset alias (the public Monash loader's
# mapping; "half_hourly" etc. are compound forms used in the archive)
_FREQ_MAP = {
    "yearly": "YE",
    "quarterly": "QE",
    "monthly": "ME",
    "weekly": "W",
    "daily": "D",
    "hourly": "h",
    "half_hourly": "30min",
    "minutely": "min",
    "10_minutes": "10min",
    "4_seconds": "4s",
    "seconds": "s",
}

_TSF_DATE_FORMAT = "%Y-%m-%d %H-%M-%S"


class TsfHeader:
    def __init__(self, attributes, frequency, horizon, missing, equal_length, data_offset):
        self.attributes = attributes          # list[(name, type)]
        self.frequency = frequency            # raw TSF string or None
        self.horizon = horizon
        self.missing = missing
        self.equal_length = equal_length
        self.data_offset = data_offset        # line index of first data line

    @property
    def freq_alias(self) -> str | None:
        if self.frequency is None:
            return None
        return _FREQ_MAP.get(self.frequency, self.frequency)


def _materialize_tsf(path: str, scratch_dir: str = "/tmp") -> str:
    """Resolve a ``.zip`` archive to its inner ``.tsf`` file.

    Zip is not splittable, so a zipped archive is inflated ONCE to
    ``scratch_dir`` and the plain-text member is what shards via
    ``read_text``.  Plain ``.tsf`` paths pass through untouched.

    CLUSTER NOTE: extraction runs on the DRIVER, so on a multi-node
    cluster ``scratch_dir`` must be cluster-visible storage (NFS / a
    fuse-mounted bucket) for worker read tasks to open the shards; a
    driver-local ``/tmp`` default is a single-node convenience only.

    Concurrency-safe: the member inflates to a unique (pid-suffixed)
    temp name, then an atomic :func:`os.replace` publishes it — racing
    processes sharing ``scratch_dir`` each write their own temp file
    and the final name only ever points at a fully-written copy.
    """
    if not path.endswith(".zip"):
        return path
    with zipfile.ZipFile(path) as zf:
        members = [m for m in zf.namelist() if m.endswith(".tsf")]
        if not members:
            raise ValueError(f"no .tsf member in {path}")
        out = os.path.join(
            scratch_dir, os.path.basename(path)[:-4] + "_" + os.path.basename(members[0])
        )
        if not os.path.exists(out):
            tmp = f"{out}.tmp.{os.getpid()}"
            with zf.open(members[0]) as src, open(tmp, "wb") as dst:
                while chunk := src.read(1 << 20):
                    dst.write(chunk)
            os.replace(tmp, out)
        return out


def read_tsf_header(path: str) -> TsfHeader:
    """Driver-side header parse — reads lines until ``@data`` only."""
    attributes: list[tuple[str, str]] = []
    frequency = horizon = None
    missing = equal_length = False
    offset = 0
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        for i, line in enumerate(f):
            s = line.strip()
            if s.lower() == "@data":
                offset = i + 1
                break
            if not s or s.startswith("#"):
                continue
            low = s.lower()
            if low.startswith("@attribute"):
                parts = s.split(" ")
                attributes.append((parts[1], parts[2].lower()))
            elif low.startswith("@frequency"):
                frequency = s.split(" ", 1)[1].strip()
            elif low.startswith("@horizon"):
                horizon = int(s.split(" ", 1)[1])
            elif low.startswith("@missing"):
                missing = s.split(" ", 1)[1].strip().lower() == "true"
            elif low.startswith("@equallength"):
                equal_length = s.split(" ", 1)[1].strip().lower() == "true"
        else:
            raise ValueError(f"{path}: no @data section")
    return TsfHeader(attributes, frequency, horizon, missing, equal_length, offset)


class _ParseTsfLines:
    """Vectorized per-batch parser for TSF data lines.

    Header metadata (attribute names/types, freq alias) is tiny and
    travels in the task closure; the text lines stream as blocks.
    """

    def __init__(self, header: TsfHeader):
        self.attrs = header.attributes
        self.freq = header.freq_alias or ""

    def __call__(self, batch: pa.Table) -> pa.Table:
        lines = batch.column("text").to_pylist()
        n_attr = len(self.attrs)
        cols: dict[str, list] = {name: [] for name, _ in self.attrs}
        targets: list[np.ndarray] = []
        for ln in lines:
            s = ln.strip()
            if not s or s.startswith(("#", "@")):
                continue
            parts = s.split(":")
            if len(parts) != n_attr + 1:
                raise ValueError(
                    f"TSF line has {len(parts)} ':'-fields, expected {n_attr + 1}"
                )
            for (name, _), val in zip(self.attrs, parts[:-1]):
                cols[name].append(val.strip())
            vals = parts[-1].replace("?", "nan")
            targets.append(np.array(vals.split(","), dtype=np.float32))
        out: dict[str, pa.Array] = {}
        for name, typ in self.attrs:
            vals = cols[name]
            if typ == "numeric":
                out[name] = pa.array(
                    [None if v == "?" else float(v) for v in vals], pa.float64()
                )
            elif typ == "date":
                out[name] = pa.array(
                    pd.to_datetime(vals, format=_TSF_DATE_FORMAT), pa.timestamp("s")
                )
            else:
                out[name] = pa.array(vals, pa.string())
        if "series_name" in out and "item_id" not in out:
            out["item_id"] = out.pop("series_name")
        elif "item_id" not in out:
            # documented schema guarantee: item_id ALWAYS exists.  With
            # no series_name, promote the first declared attribute (cast
            # to string); with no attributes at all, synthesize a
            # content-stable id (an ordinal would depend on block
            # sharding; a digest of the series line does not).
            if self.attrs:
                first = self.attrs[0][0]
                out["item_id"] = pa.array(
                    [str(v) for v in out[first].to_pylist()], pa.string()
                )
            else:
                import hashlib

                kept = [
                    ln.strip()
                    for ln in lines
                    if ln.strip() and not ln.strip().startswith(("#", "@"))
                ]
                out["item_id"] = pa.array(
                    [
                        "h" + hashlib.blake2b(s.encode(), digest_size=8).hexdigest()
                        for s in kept
                    ],
                    pa.string(),
                )
        if "start_timestamp" in out:
            out["start"] = out.pop("start_timestamp")
        out["freq"] = pa.array([self.freq] * len(targets), pa.string())
        out["target"] = pa.array(
            [t for t in targets], pa.list_(pa.float32())
        )
        return pa.table(out)


def read_tsf(path: str, scratch_dir: str = "/tmp"):
    """Read a Monash ``.tsf`` (or ``.tsf``-in-``.zip``) archive as a
    Ray Dataset of one row per series.

    The body shards via ``ray.data.read_text`` (line-splittable), the
    header rides in the parser's closure, and parsing is a streaming
    ``map_batches`` stage — no driver materialization of series data.
    """
    import ray.data

    tsf_path = _materialize_tsf(path, scratch_dir)
    header = read_tsf_header(tsf_path)
    ds = ray.data.read_text(tsf_path)
    return ds.map_batches(
        _ParseTsfLines(header), batch_format="pyarrow", batch_size=None
    )


def write_tsf(df: pd.DataFrame, path: str, frequency: str, attributes=None) -> None:
    """Write a small pandas frame (item_id, start, target) as a TSF
    file — the fixture/round-trip side; real exports stay Parquet."""
    attributes = attributes or [("series_name", "string"), ("start_timestamp", "date")]
    with open(path, "w", encoding="utf-8") as f:
        f.write("# generated by spectral_time_series_ray\n")
        for name, typ in attributes:
            f.write(f"@attribute {name} {typ}\n")
        f.write(f"@frequency {frequency}\n")
        f.write("@missing true\n@equallength false\n@data\n")
        for _, row in df.iterrows():
            start = pd.Timestamp(row["start"]).strftime(_TSF_DATE_FORMAT)
            vals = ",".join(
                "?"
                if np.isnan(v)
                else np.format_float_positional(np.float32(v), unique=True)
                for v in np.asarray(row["target"], dtype=np.float32)
            )
            f.write(f"{row['item_id']}:{start}:{vals}\n")
