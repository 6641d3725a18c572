"""Per-operator Ray Data stats for the flagship pipeline.

Usage: python tools/profile_stats.py [sf_dir]

Prints each stage's ``ds.stats()`` operator summary (task counts,
remote wall time min/mean/max) so perf work targets measured
bottlenecks, not guesses.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from spectral_time_series_ray.sources.transcripts import (
        read_transcripts,
        transcripts_bytes,
    )
    from spectral_time_series_ray.stages.chunkworker import process_chunks
    from spectral_time_series_ray.stages.rollup import cascade, rollup_transcripts
    from spectral_time_series_ray.stages.series import gap_fill_pack_series

    def show(name, ds, t0):
        print(f"\n==== {name}: {time.time() - t0:.2f}s wall ====")
        for line in ds.stats().splitlines():
            if line.startswith("Operator") or "Remote wall time" in line:
                print(" ", line.strip())

    t0 = time.time()
    m1 = rollup_transcripts(
        read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "ts", "text"]),
        "1m",
        input_bytes=transcripts_bytes(sf_dir),
    ).materialize()
    show("rollup_1m", m1, t0)

    t0 = time.time()
    h1 = cascade(m1, "1h").materialize()
    d1 = cascade(h1, "1d").materialize()
    show("cascade_1h", h1, t0)
    show("cascade_1d", d1, t0)

    t0 = time.time()
    chunks = gap_fill_pack_series(
        m1, "1m", value_col="mean_latency", method="locf",
        polynomial="chebyshev", degree=4,
    ).materialize()
    show("gapfill_pack", chunks, t0)

    t0 = time.time()
    enc = process_chunks(
        chunks.select_columns(["conv_id", "chunk_idx", "n_points", "ts", "values"]),
        quantize_digits=3, method="welch", use_actors=False,
    ).materialize()
    show("gorilla_welch", enc, t0)

    ray.shutdown()


if __name__ == "__main__":
    main()
