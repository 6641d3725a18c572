"""Deterministic synthetic transcript table (FIXTURES.md §1).

Schema (BASELINE.json ``input_hint``):
``(conv_id: string, turn_idx: int32, role: string, text: string,
tool: string, ts: timestamp[us])``

Generation rules (all seeded, bit-reproducible):
- conversation sizes Zipf(alpha=1.2) clamped to [2, 5000] — a few hot
  conversations exercise skew / hot-key salting
- inter-turn gaps lognormal(mu=1.5 s, sigma=1.0); 2% of gaps x100
  (long-gap outliers for gap-fill tests); strictly increasing ts
- conversation starts uniform over a 30-day window from 2024-01-01
- rows are written SHUFFLED so consumers must restore the stable
  ``(conv_id, turn_idx)`` order
- text is deterministic pseudo-text (seeded word pool), char length
  ~ lognormal(mu=5, sigma=1)

The reference analogue is the per-series synthetic fixture generator
(`uni2ts/test/fixture/fixture.py:33-66` create_data_entry) — ours is
long-format and written as Parquet.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

EPOCH_US = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
_WORDS = None


def _word_pool(rng: np.random.Generator, size: int = 4096) -> np.ndarray:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lengths = rng.integers(2, 10, size)
    return np.array(
        ["".join(letters[rng.integers(0, 26, L)]) for L in lengths], dtype=object
    )


def generate_transcripts(
    n_turns: int,
    seed: int = 42,
    zipf_alpha: float = 1.2,
    start_window_days: int = 30,
) -> pa.Table:
    """Build the transcript table in memory (vectorized numpy)."""
    rng = np.random.default_rng(seed)

    # conversation sizes until we cover n_turns
    sizes = []
    total = 0
    while total < n_turns:
        draw = np.clip(rng.zipf(zipf_alpha, size=max(64, n_turns // 8)), 2, 5000)
        for s in draw:
            sizes.append(int(s))
            total += int(s)
            if total >= n_turns:
                break
    sizes = np.array(sizes, dtype=np.int64)
    n_conv = len(sizes)
    n = int(sizes.sum())

    conv_ids = np.array([f"conv_{i:08d}" for i in range(n_conv)], dtype=object)
    conv_col = np.repeat(conv_ids, sizes)
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    turn_idx = (np.arange(n) - np.repeat(offsets, sizes)).astype(np.int32)

    # roles: cycle user/assistant/tool with seeded noise
    role_pool = np.array(["user", "assistant", "tool"], dtype=object)
    role_idx = turn_idx % 3
    noise = rng.random(n) < 0.1
    role_idx = np.where(noise, rng.integers(0, 3, n), role_idx)
    role_col = role_pool[role_idx]

    tool_pool = np.array([f"tool_{i}" for i in range(10)], dtype=object)
    tool_col = np.where(role_col == "tool", tool_pool[rng.integers(0, 10, n)], "")

    # timestamps: per-conv start + segmented cumsum of lognormal gaps (us)
    starts_us = EPOCH_US + rng.integers(
        0, start_window_days * 86_400_000_000, n_conv
    )
    gaps_s = rng.lognormal(1.5, 1.0, n)
    long_mask = rng.random(n) < 0.02
    gaps_s = np.where(long_mask, gaps_s * 100.0, gaps_s)
    gaps_us = np.maximum(1, (gaps_s * 1e6).astype(np.int64))
    cum = np.cumsum(gaps_us)
    seg_base = np.repeat(cum[offsets] - gaps_us[offsets], sizes)
    within = cum - seg_base  # first turn of each conv gets its own gap>=1
    first_mask = turn_idx == 0
    within = within - np.repeat(within[first_mask], sizes)  # first turn at 0
    ts_col = np.repeat(starts_us, sizes) + within

    # text: n_words ~ lognormal scaled so chars ~ lognormal(5, 1)
    global _WORDS
    if _WORDS is None:
        _WORDS = _word_pool(np.random.default_rng(7))
    n_words = np.maximum(1, (rng.lognormal(5.0, 1.0, n) / 6.5).astype(np.int64))
    n_words = np.minimum(n_words, 400)
    flat_idx = rng.integers(0, len(_WORDS), int(n_words.sum()))
    word_offsets = np.concatenate([[0], np.cumsum(n_words)])
    pool = _WORDS
    text_col = np.array(
        [
            " ".join(pool[flat_idx[word_offsets[i] : word_offsets[i + 1]]])
            for i in range(n)
        ],
        dtype=object,
    )

    perm = rng.permutation(n)  # shuffled on disk: order must be restorable
    table = pa.table(
        {
            "conv_id": pa.array(conv_col[perm], pa.string()),
            "turn_idx": pa.array(turn_idx[perm], pa.int32()),
            "role": pa.array(role_col[perm], pa.string()),
            "text": pa.array(text_col[perm], pa.string()),
            "tool": pa.array(tool_col[perm], pa.string()),
            "ts": pa.array(ts_col[perm], pa.timestamp("us")),
        }
    )
    return table


def sf_from_dir(sf_dir: str) -> float:
    """Parse the scale factor out of '/root/testdata/sf0.01'-style paths."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.001


def transcripts_path(
    sf: float, seed: int = 42, cache_root: str | None = None, n_files: int = 32
) -> str:
    """Materialize (once) and return the parquet DIRECTORY for a scale
    factor.

    sf 0.001 -> 6k turns, matching the lineitem row-count ladder in
    TESTDATA.md. Written as ``n_files`` part files so the Ray read
    parallelizes (a single parquet file reads as ONE task regardless of
    row groups — measured 3.7 s serialized at sf0.5).
    """
    if cache_root is None:
        # /dev/shm when available: this sandbox's /tmp disk reads at
        # ~100 MB/s with no page-cache retention, which would make every
        # benchmark I/O-bound; tmpfs reads at memory speed
        cache_root = (
            "/dev/shm/sts_ray_cache" if os.path.isdir("/dev/shm") else "/tmp/sts_ray_cache"
        )
    n_turns = max(200, int(6_000_000 * sf))
    out_dir = os.path.join(cache_root, f"transcripts_n{n_turns}_s{seed}")
    marker = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(out_dir, exist_ok=True)
        table = generate_transcripts(n_turns, seed=seed)
        n = table.num_rows
        k = min(n_files, max(1, n // 2000))
        step = -(-n // k)
        for i in range(k):
            pq.write_table(
                table.slice(i * step, step),
                os.path.join(out_dir, f"part-{i:05d}.parquet"),
                row_group_size=64_000,
            )
        with open(marker, "w") as f:
            f.write("ok")
    return out_dir


def default_num_blocks() -> int:
    """Blocks ~= CPUs: the sort/groupby shuffle creates O(blocks^2)
    intermediate objects, so fewer, larger blocks win until they limit
    parallelism (measured: 32 blocks at 32 CPUs is ~2x faster than 64
    and ~10x faster than 340 auto-split blocks on the sf0.1 rollup)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, cpus)


def transcripts_bytes(sf_dir: str, seed: int = 42) -> int:
    """Total on-disk bytes of the transcript parquet dir (cheap stat;
    used to size shuffle partition counts by data volume)."""
    path = transcripts_path(sf_from_dir(sf_dir), seed=seed)
    return sum(
        os.path.getsize(os.path.join(path, n))
        for n in os.listdir(path)
        if n.endswith(".parquet")
    )


def read_transcripts(sf_dir: str, seed: int = 42, columns: list[str] | None = None):
    """ray.data.Dataset over the synthetic transcript table for sf_dir."""
    import ray.data

    path = transcripts_path(sf_from_dir(sf_dir), seed=seed)
    return ray.data.read_parquet(
        path, columns=columns, override_num_blocks=default_num_blocks()
    )
