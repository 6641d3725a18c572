"""The flagship transcript pipeline (SURVEY.md §7.1) — the SAME
2-execution DAG ``bench.py`` measures (they diverged briefly in round
4; the fused path is now the one library surface):

read_parquet(transcripts, pruned columns)
  -> map_batches: text_len + hash partition          [stateless, pyarrow]
  -> ONE int-keyed conv-hash exchange; every conversation complete per
     partition, so ALL THREE retention tiers (1m/1h/1d) — count/sum/
     min/max/mean AND exact p50/p99 — come out of this single pass
     (`rollup.rollup_transcripts_multi`; a cascade could never produce
     coarse-tier exact quantiles — quantiles are not mergeable)
  -> gap-fill (LOCF) on the 1m grid + precondition (Chebyshev d4)
  -> pack chunks -> ONE combined actor-pool pass: Gorilla encode
     (quantized) + spectral downsample (Welch)          [stateful]
  -> write_parquet tier dirs + per-partition manifests (resume)

``stages.rollup.cascade`` / ``cascade_multi`` remain the right tool
when the INPUT is already an aggregated fine tier (e.g. re-deriving
1d from persisted 1m partitions without the raw turns); the flagship
has the raw turns, so it never pays a second exchange for them.
"""

from __future__ import annotations

import os

from ..sources.transcripts import (
    read_transcripts,
    sf_from_dir,
    transcripts_bytes,
    transcripts_path,
)
from ..stages.chunkworker import process_chunks
from ..stages.compress import compress_chunks
from ..stages.rollup import rollup_transcripts_multi
from ..stages.series import gap_fill_pack_series
from ..state.manifest import input_fingerprint, write_partitioned

_SPECTRAL_COLS = ["top_freqs", "top_power", "peak_freq", "method"]

# resume-fingerprint salt: bump when the written tier SCHEMA changes so
# an out_root from an older pipeline version is rewritten, not resumed
FLAGSHIP_SCHEMA_SALT = "-schema2-multitier"


def flagship_fingerprint(sf_dir: str) -> str:
    """The exact fingerprint run_flagship writes manifests under —
    input content identity + schema version (resume key)."""
    return (
        input_fingerprint([transcripts_path(sf_from_dir(sf_dir))])
        + FLAGSHIP_SCHEMA_SALT
    )


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

    # Execution 1: all three tiers (incl. exact per-tier p50/p99) from
    # ONE conv-hash exchange.  Materialized: it is the small aggregated
    # result, not the input — reused for the tier slices + gap-fill.
    allt = rollup_transcripts_multi(
        ds, ["1m", "1h", "1d"], input_bytes=transcripts_bytes(sf_dir)
    ).materialize()
    tiers = {
        t: allt.filter(expr=f"tier == '{t}'").drop_columns(["tier"])
        for t in ("1m", "1h", "1d")
    }
    m1 = tiers["1m"]

    results = {
        "rollup_1m": m1,
        "rollup_1h": tiers["1h"],
        "rollup_1d": tiers["1d"],
        "rollup_all_tiers": allt,
    }

    if out_root:
        # the fingerprint keys RESUME: salted with the pipeline schema
        # version so an out_root written by an older flagship (cascade
        # tiers without coarse-tier p50/p99) is NOT silently "resumed"
        # into a mixed-schema tier — a schema change forces a rewrite
        # even when the input is unchanged
        fp = flagship_fingerprint(sf_dir)
        lineage = ["read_transcripts", "with_turn_features", "rollup_multi"]
        for tier, tds in tiers.items():
            write_partitioned(
                tds, out_root, tier, fingerprint=fp,
                lineage=lineage + [f"tier={tier}"], resume=resume,
            )

    # Execution 2: gap-fill -> precondition -> pack -> encode as one
    # streaming pass over the (lazy) 1m slice of the materialized union.
    chunks = gap_fill_pack_series(
        m1, "1m", value_col="mean_latency", method="locf",
        polynomial="chebyshev", degree=4,
    ).materialize()
    chunks = chunks.select_columns(["conv_id", "chunk_idx", "n_points", "ts", "values"])
    if spectral:
        # combined Gorilla + Welch in ONE actor-pool pass over the
        # chunks (the benched shape); split lazily into the two views
        combined = process_chunks(
            chunks, quantize_digits=3, method="welch",
            concurrency=compress_concurrency,
        ).materialize()
        results["gorilla"] = combined.drop_columns(_SPECTRAL_COLS)
        results["spectral"] = combined.select_columns(
            ["conv_id", "chunk_idx", "n_points"] + _SPECTRAL_COLS
        )
        encoded = results["gorilla"]
    else:
        encoded = compress_chunks(
            chunks, quantize_digits=3, concurrency=compress_concurrency
        )
        results["gorilla"] = encoded
    if out_root:
        enc_dir = os.path.join(out_root, "gorilla_chunks")
        if os.path.isdir(enc_dir):  # write_parquet appends: clear reruns
            import shutil

            shutil.rmtree(enc_dir)
        encoded.write_parquet(enc_dir)
        results["gorilla"] = __import__("ray").data.read_parquet(enc_dir)
    return results
