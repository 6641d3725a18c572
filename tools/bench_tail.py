"""Per-entry wall-time scaling sweep for the most expensive benched
entries (round-4 directive: prove the bench TAIL scales ~linearly in
input size, not just the flagship).

Three input families, each compared at two sizes 10x apart:

- transcript entries (``tr_sft_pairs``, ``tr_matrix_profile``): the
  deterministic transcript generator at sf0.1 (600k turns) vs sf1
  (6M turns) — same generator, same seed family, 10x rows.
- document entries (``doc_chunking``, ``doc_decontaminate``,
  ``doc_minhash_dedup``): the driver's sf0.1 documents table (5k
  docs) vs a 10x deterministic synthetic corpus of the same shape
  (50k docs, word-pool pseudo-text, same lang/source mix) — fresh
  text, NOT replicated copies, so dedup entries see a naturally
  sparse near-dup structure at both sizes.
- ``q8_market_share`` (lineitem joins): the driver's sf0.01 vs sf0.1
  table ladder (10x rows).

Each scale runs in a FRESH subprocess Ray session pinned to
``RAY_GRAFT_CPUS`` (default 32) so sessions don't share state.
Prints ONE JSON line: per-entry wall at both sizes + the wall ratio
(ideal ~10 for linear scaling; < ~13 passes the linear-in-input bar
allowing fixed overheads to amortize differently).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DOCS_SF1_DIR = "/tmp/sts_bench_docs_sf1"


def make_docs_sf1(out_dir: str, n_docs: int = 50_000, seed: int = 99) -> str:
    """Deterministic 10x documents corpus with the driver table's shape
    (doc_id, text, lang, source, n_chars) — word-pool pseudo-text like
    the sf tables', freshly drawn (not copies)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    words = np.array(
        "batch part spark line column order small sort fast value scan hash slow "
        "group vector query agg table stream filter customer key window join the "
        "a g read write shuffle block arrow ray data tier rollup".split(),
        dtype=object,
    )
    langs = np.array(["en", "zh", "de", "fr", "und"], dtype=object)
    lang_col = langs[rng.choice(len(langs), n_docs, p=[0.7, 0.1, 0.08, 0.07, 0.05])]
    source_col = np.array([f"src{i}" for i in rng.integers(0, 20, n_docs)], dtype=object)
    n_words = np.maximum(3, (rng.lognormal(3.7, 0.6, n_docs)).astype(np.int64))
    flat = rng.integers(0, len(words), int(n_words.sum()))
    offs = np.concatenate([[0], np.cumsum(n_words)])
    texts = np.array(
        [" ".join(words[flat[offs[i]: offs[i + 1]]]) for i in range(n_docs)],
        dtype=object,
    )
    table = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang_col, pa.string()),
            "source": pa.array(source_col, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(out_dir, "documents.parquet"), row_group_size=8_000)
    # the doc entries read only documents; link the remaining tables
    # from sf0.1 so _read() of any side table still resolves
    for t in ("region nation customer supplier part orders lineitem events "
              "embeddings").split():
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(f"/root/testdata/sf0.1/{t}.parquet", dst)
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import __ray_entry__ as e
qs = e.queries()
out = {{}}
for name, sf_dir in json.loads(sys.argv[1]):
    t0 = time.time()
    r = qs[name](sf_dir)
    if hasattr(r, "to_pandas"):
        r = r.to_pandas()
    out[name] = round(time.time() - t0, 3)
print("RESULT " + json.dumps(out))
ray.shutdown()
"""


def run_batch(jobs: list[tuple[str, str]]) -> dict[str, float]:
    """One fresh Ray session per batch; returns name -> wall sec."""
    cmd = [sys.executable, "-c", RUNNER.format(repo=REPO), json.dumps(jobs)]
    p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, check=True)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(p.stdout[-2000:] + p.stderr[-2000:])


def main() -> None:
    from spectral_time_series_ray.sources.transcripts import transcripts_path

    # pre-materialize inputs OUTSIDE the timed sessions
    transcripts_path(0.1)
    transcripts_path(1.0)
    make_docs_sf1(DOCS_SF1_DIR)

    small = [
        ("tr_sft_pairs", "/root/testdata/sf0.1"),
        ("tr_matrix_profile", "/root/testdata/sf0.1"),
        ("doc_chunking", "/root/testdata/sf0.1"),
        ("doc_decontaminate", "/root/testdata/sf0.1"),
        ("doc_minhash_dedup", "/root/testdata/sf0.1"),
        ("q8_market_share", "/root/testdata/sf0.01"),
    ]
    big = [
        ("tr_sft_pairs", "/dev/shm/sts_ray_cache/sf1.0"),
        ("tr_matrix_profile", "/dev/shm/sts_ray_cache/sf1.0"),
        ("doc_chunking", DOCS_SF1_DIR),
        ("doc_decontaminate", DOCS_SF1_DIR),
        ("doc_minhash_dedup", DOCS_SF1_DIR),
        ("q8_market_share", "/root/testdata/sf0.1"),
    ]
    t0 = time.time()
    # warm-up small session (object-store mmap growth), untimed
    run_batch([("doc_chunking", "/root/testdata/sf0.1")])
    wall_small = run_batch(small)
    wall_big = run_batch(big)
    entries = {}
    for name, _ in small:
        s, b = wall_small[name], wall_big[name]
        entries[name] = {
            "sec_small": s, "sec_big_10x": b,
            "wall_ratio_10x": round(b / max(s, 1e-9), 2),
        }
    print(json.dumps({
        "metric": "bench-tail per-entry wall at 1x vs 10x input (linear-scaling evidence)",
        "value": round(time.time() - t0, 1),
        "unit": "sec",
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        "entries": entries,
    }))


if __name__ == "__main__":
    main()
