"""The flagship transcript pipeline (SURVEY.md §7.1):

read_parquet(transcripts, pruned columns)
  -> map_batches: text_len + hash partition          [stateless, pyarrow]
  -> ONE int-keyed shuffle; per-partition numpy: stable (conv, turn)
     sort, boundary-safe latency, tumbling buckets, segmented stats
  -> tiered rollups: 1m exact (count/sum/min/max/mean/p50/p99),
     1h + 1d cascaded from 1m mergeable partials
  -> gap-fill (LOCF) on the 1m grid + precondition (Chebyshev d4)
  -> pack chunks -> Gorilla actor pool (quantized)       [stateful]
  -> spectral downsample actor pool (Welch / Lomb-Scargle)
  -> write_parquet tier dirs + per-partition manifests (resume)
"""

from __future__ import annotations

import os

from ..sources.transcripts import (
    read_transcripts,
    sf_from_dir,
    transcripts_bytes,
    transcripts_path,
)
from ..stages.compress import compress_chunks
from ..stages.downsample import spectral_downsample
from ..stages.rollup import cascade, rollup_transcripts
from ..stages.series import gap_fill_pack_series
from ..state.manifest import input_fingerprint, write_partitioned


def run_flagship(
    sf_dir: str,
    out_root: str | None = None,
    compress_concurrency: int = 4,
    spectral: bool = True,
    resume: bool = True,
):
    """Run the full pipeline; returns a dict of result Datasets.

    When ``out_root`` is given, rollup tiers are persisted partitioned
    by (tier, date) with checkpoint manifests; otherwise everything
    stays in-flight.
    """
    from ..stages.validate import validate_transcripts

    # prune at the read: the rollup needs 4 of the 6 columns
    ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "ts", "text"])
    ds = validate_transcripts(ds)  # schema check + vectorized row rules

    # 1m: exact (incl. quantiles), fused single-shuffle path. Reused
    # (materialized: it is the small aggregated result, not the input)
    # for cascade + gap-fill.
    m1 = rollup_transcripts(ds, "1m", input_bytes=transcripts_bytes(sf_dir)).materialize()
    h1 = cascade(m1, "1h")
    d1 = cascade(m1, "1d")

    results = {"rollup_1m": m1, "rollup_1h": h1, "rollup_1d": d1}

    if out_root:
        fp = input_fingerprint([transcripts_path(sf_from_dir(sf_dir))])
        lineage = ["read_transcripts", "with_turn_features", "rollup"]
        for tier, tds in (("1m", m1), ("1h", h1), ("1d", d1)):
            write_partitioned(
                tds, out_root, tier, fingerprint=fp,
                lineage=lineage + [f"tier={tier}"], resume=resume,
            )

    chunks = gap_fill_pack_series(
        m1, "1m", value_col="mean_latency", method="locf",
        polynomial="chebyshev", degree=4,
    ).materialize()
    chunks = chunks.select_columns(["conv_id", "chunk_idx", "n_points", "ts", "values"])
    encoded = compress_chunks(chunks, quantize_digits=3, concurrency=compress_concurrency)
    results["gorilla"] = encoded
    if spectral:
        results["spectral"] = spectral_downsample(
            chunks, method="welch", concurrency=compress_concurrency
        )
    if out_root:
        enc_dir = os.path.join(out_root, "gorilla_chunks")
        if os.path.isdir(enc_dir):  # write_parquet appends: clear reruns
            import shutil

            shutil.rmtree(enc_dir)
        encoded.write_parquet(enc_dir)
        results["gorilla"] = __import__("ray").data.read_parquet(enc_dir)
    return results
