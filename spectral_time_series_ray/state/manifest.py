"""Per-partition checkpoint manifests + lineage records.

North-star requirement: "each partition emits lineage records and
checkpoint manifests so interrupted runs resume without recomputing
completed buckets". The reference's closest analogue is Lightning's
epoch checkpointing + ``ckpt_path="last"`` resume
(`uni2ts/cli/conf/pretrain/default.yaml:27-46,13`); for a batch data
pipeline the equivalent is (ray_guide.md "Sources & sinks"):

- output partitioned by ``tier=<tier>/date=<YYYY-MM-DD>`` — one
  directory per (tier, bucket-date) so a rerun can skip finished work
- a small JSON manifest per completed partition under
  ``_manifests/<tier>/<date>.json`` holding row counts, the input
  fingerprint, and the lineage chain
- resume = anti-join completed partitions BEFORE compute: a broadcast
  set filter inside ``map_batches`` (no shuffle), keyed on the bucket
  date. A changed input fingerprint invalidates prior manifests.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.compute as pc

from .rollup_compat import BUCKET_COL

MANIFEST_DIR = "_manifests"


def input_fingerprint(paths: list[str]) -> str:
    """Cheap content identity for resume-safety: (path, size, mtime_ns)
    over files (directories are expanded RECURSIVELY to their files —
    a one-level listdir would stat nested hive partition dirs as inodes
    whose mtime does not change when a file INSIDE them is rewritten,
    so changed input would keep the old fingerprint and resume would
    skip recomputation over stale output)."""
    files = []
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, names in os.walk(p):
                files += [os.path.join(root, n) for n in names]
        else:
            files.append(p)
    parts = []
    for p in sorted(files):
        st = os.stat(p)
        parts.append(f"{p}:{st.st_size}:{st.st_mtime_ns}")
    import hashlib

    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def completed_partitions(out_root: str, tier: str, fingerprint: str | None = None) -> set[str]:
    """Dates with a valid manifest (matching fingerprint if given)."""
    d = os.path.join(out_root, MANIFEST_DIR, tier)
    if not os.path.isdir(d):
        return set()
    done = set()
    for name in os.listdir(d):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(d, name)) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue  # torn write -> treat as incomplete
        if fingerprint is not None and m.get("input_fingerprint") != fingerprint:
            continue
        done.add(m["date"])
    return done


def _add_date(ds):
    def f(batch: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(batch[BUCKET_COL], unit="day"), format="%Y-%m-%d")
        return batch.append_column("date", day)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def skip_completed(ds, done_dates: set[str]):
    """Broadcast anti-join: drop rows whose bucket date already has a
    manifest. ``done_dates`` is small (one entry/day); shipped in the
    task closure — at cluster scale use ``ray.put`` once."""
    if not done_dates:
        return ds
    done = sorted(done_dates)

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch["date"], value_set=pa.array(done)))
        return batch.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def write_partitioned(
    rolled_ds,
    out_root: str,
    tier: str,
    fingerprint: str = "",
    lineage: list[str] | None = None,
    resume: bool = True,
):
    """Write a rollup tier partitioned by date with manifests; skips
    partitions already completed for the same input fingerprint.

    Returns {date: row_count} for the partitions written this run.
    """
    ds = _add_date(rolled_ds)
    done = completed_partitions(out_root, tier, fingerprint) if resume else set()
    ds = skip_completed(ds, done)

    tier_dir = os.path.join(out_root, f"tier={tier}")
    run_id = uuid.uuid4().hex[:8]

    # count rows per partition (small driver-side aggregate) while the
    # data itself streams to parquet
    ds = ds.materialize()
    counts = {r["date"]: r["count()"] for r in ds.groupby("date").count().take_all()}
    if counts:
        # a partition about to be (re)written may hold stale files from a
        # run that crashed between the parquet write and the manifest
        # publish (or from a prior fingerprint): Ray write_parquet appends
        # by default, so clear exactly the target date dirs first — the
        # manifest, not the data files, is the completion record.
        #
        # CRASH-CONSISTENCY ORDER: retract each date's MANIFEST before
        # touching its data.  The reverse order has a window (data
        # deleted, manifest still published) where a crash leaves a
        # valid-looking completion record over destroyed data — the
        # next resume run would then skip the partition and the rows
        # would be silently lost.  With manifest-first, a crash in the
        # window merely re-counts the date as incomplete and it is
        # rewritten.
        import shutil

        mdir_pre = os.path.join(out_root, MANIFEST_DIR, tier)
        for date in counts:
            mpath = os.path.join(mdir_pre, f"{date}.json")
            if os.path.exists(mpath):
                os.remove(mpath)
            pdir = os.path.join(tier_dir, f"date={date}")
            if os.path.isdir(pdir):
                shutil.rmtree(pdir)
        ds.write_parquet(tier_dir, partition_cols=["date"])

    mdir = os.path.join(out_root, MANIFEST_DIR, tier)
    os.makedirs(mdir, exist_ok=True)
    for date, n in counts.items():
        manifest = {
            "tier": tier,
            "date": date,
            "row_count": int(n),
            "input_fingerprint": fingerprint,
            "run_id": run_id,
            "lineage": lineage or [],
        }
        tmp = os.path.join(mdir, f".{date}.json.tmp-{run_id}")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(mdir, f"{date}.json"))  # atomic publish
    return counts


def read_manifests(out_root: str, tier: str) -> list[dict]:
    d = os.path.join(out_root, MANIFEST_DIR, tier)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
    return out


def _compact_files(paths: list[str], staging: str, needed: int) -> tuple[int, int]:
    """Stream the row groups of ``paths`` through rotating byte-budgeted
    parquet writers under ``staging`` — at most ``needed`` output files,
    memory bounded by one row group. Returns (n_rows, n_out_files).
    Runs as a Ray task (one per date partition) from the compaction
    entry points."""
    import pyarrow.parquet as _pq

    total = sum(os.path.getsize(p) for p in paths)
    budget = total / needed
    os.makedirs(staging, exist_ok=True)
    schema = _pq.read_schema(paths[0]).remove_metadata()
    n_rows = 0
    consumed = 0.0
    k = 0
    writer = None
    try:
        for p in paths:
            pf = _pq.ParquetFile(p)
            per_rg = os.path.getsize(p) / max(1, pf.num_row_groups)
            for rg in range(pf.num_row_groups):
                if (writer is not None and k + 1 < needed
                        and consumed >= (k + 1) * budget):
                    writer.close()
                    k += 1
                    writer = None
                if writer is None:
                    writer = _pq.ParquetWriter(
                        os.path.join(staging, f"part-{k:05d}.parquet"), schema)
                t = pf.read_row_group(rg).replace_schema_metadata(None)
                if t.schema != schema:
                    t = t.cast(schema)
                writer.write_table(t)
                n_rows += t.num_rows
                consumed += per_rg
    finally:
        if writer is not None:
            writer.close()
    return n_rows, k + 1


def compact_partitions(
    out_root: str,
    tier: str,
    target_bytes: int = 128 << 20,
    run_id: str | None = None,
):
    """Small-file compaction over a tier directory: every date
    partition holding more parquet files than ``ceil(bytes/target)``
    is rewritten into at most that many files (streaming writes fan
    out one file per block, so long-running tiers accumulate small
    files that degrade scan throughput — the classic LSM/Iceberg
    maintenance op).

    Safety contract: the MANIFEST stays the completion record. New
    files land in a ``.compact-*`` staging dir first and the row count
    is verified against the manifest BEFORE the swap; a crash mid-swap
    leaves either the old files or a completed staging dir, and the
    next run finishes the rename (idempotent/resumable, like the
    write path). Partitions already at or below the target file count
    are skipped. Returns ``{date: (files_before, files_after)}``.

    All over-fragmented dates rewrite CONCURRENTLY, one Ray task per
    date (driver-sequential per-date Dataset launches pay ~1.3 s fixed
    pipeline cost each — 31 dates measured 45 s for 100 MB of data);
    inside a task the input row groups STREAM through rotating
    byte-budgeted writers, so task memory is one row group, not the
    partition, and output file count is <= needed by construction.
    """
    import shutil

    import ray

    rid = run_id or uuid.uuid4().hex[:8]
    tier_dir = os.path.join(out_root, f"tier={tier}")
    mdir = os.path.join(out_root, MANIFEST_DIR, tier)
    results: dict = {}
    if not os.path.isdir(tier_dir):
        return results
    manifests = {m["date"]: m for m in read_manifests(out_root, tier)}

    # crash recovery FIRST, as its own pass: a crash between
    # rmtree(live) and rename(staging) leaves ONLY the staging dir, so
    # a scan keyed on live `date=` dirs can never see the victim (the
    # old per-partition recovery check was dead code — caught by the
    # interrupted-swap test). A staging dir alongside a LIVE partition
    # means the crash came before the rmtree: the live data is
    # complete, discard the staging copy and re-compact normally.
    for stale in sorted(os.listdir(tier_dir)):
        if ".compact-" not in stale:
            continue
        base = os.path.join(tier_dir, stale.split(".compact-")[0])
        spath = os.path.join(tier_dir, stale)
        if os.path.isdir(base):
            shutil.rmtree(spath)
        else:
            os.rename(spath, base)

    todo: list[tuple[str, str, list[str], int]] = []
    for name in sorted(os.listdir(tier_dir)):
        if not name.startswith("date=") or ".compact-" in name:
            continue
        date = name.split("=", 1)[1]
        pdir = os.path.join(tier_dir, name)
        files = sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))
        if not files:
            continue
        paths = [os.path.join(pdir, f) for f in files]
        nbytes = sum(os.path.getsize(p) for p in paths)
        needed = max(1, -(-nbytes // target_bytes))
        if len(files) <= needed:
            continue
        todo.append((date, pdir, paths, int(needed)))
    if not todo:
        return results

    rewrite = ray.remote(num_cpus=1)(_compact_files)

    pending = []
    for date, pdir, paths, needed in todo:
        staging = os.path.join(tier_dir, f"date={date}.compact-{rid}")
        pending.append(
            (date, pdir, paths, staging, rewrite.remote(paths, staging, needed))
        )

    for date, pdir, paths, staging, ref in pending:
        n_rows, n_after = ray.get(ref)
        m = manifests.get(date)
        if m is not None and int(m["row_count"]) != int(n_rows):
            shutil.rmtree(staging, ignore_errors=True)
            raise RuntimeError(
                f"compaction row-count mismatch for {tier}/{date}: "
                f"manifest {m['row_count']} vs files {n_rows}"
            )
        shutil.rmtree(pdir)
        os.rename(staging, pdir)
        if m is not None:
            m = dict(m)
            m["compaction"] = {
                "run_id": rid,
                "files_before": len(paths),
                "files_after": n_after,
            }
            tmp = os.path.join(mdir, f".{date}.json.tmp-{rid}")
            with open(tmp, "w") as f:
                json.dump(m, f)
            os.replace(tmp, os.path.join(mdir, f"{date}.json"))
        results[date] = (len(paths), n_after)
    return results


def upsert_partitions(
    late_ds,
    out_root: str,
    tier: str,
    merge_fn,
    fingerprint: str = "",
    lineage: list[str] | None = None,
):
    """Late-data UPSERT into a partitioned tier: merge late-arriving
    MERGEABLE rollup rows into the stored tier, rewriting ONLY the
    date partitions the late rows touch.

    Flow: the affected dates fall out of a tiny distinct on the late
    rows; exactly those partitions are read back (every other partition
    is untouched — its manifest keeps its original run_id, which the
    self-check asserts), unioned with the late rows, re-merged per date
    by ``merge_fn`` (a pandas frame -> frame reducer over the union,
    e.g. a groupby-sum of additive partials), and republished through
    the same atomic manifest protocol as :func:`write_partitioned`.

    Returns {date: row_count} for the rewritten partitions.
    """
    import ray.data

    late = _add_date(late_ds).materialize()
    dates = sorted(r["date"] for r in late.groupby("date").count().take_all())
    if not dates:
        return {}
    tier_dir = os.path.join(out_root, f"tier={tier}")
    import glob as _glob

    existing = [
        f
        for d in dates
        for f in sorted(
            _glob.glob(os.path.join(tier_dir, f"date={d}", "*.parquet"))
        )
    ]
    parts = late.drop_columns(["date"])
    if existing:
        old = ray.data.read_parquet(existing)
        # hive partition inference may re-attach the date column; the
        # date re-derives from the bucket timestamp on write either way
        if "date" in old.schema().names:
            old = old.drop_columns(["date"])
        parts = parts.union(old)
    def apply_merge(df):
        return merge_fn(df.drop(columns=["date"]))

    merged = _add_date(parts).groupby("date").map_groups(
        apply_merge, batch_format="pandas"
    )
    return write_partitioned(
        merged, out_root, tier, fingerprint=fingerprint,
        lineage=lineage, resume=False,
    )


def erase_users(
    out_root: str,
    tier: str,
    user_ids,
    key: str = "conv_id",
    fingerprint: str = "",
):
    """GDPR-style erasure: remove every row whose ``key`` is in
    ``user_ids`` from a partitioned tier, rewriting ONLY the partitions
    that actually contain those keys (right-to-be-forgotten
    propagation).

    Flow: a footer-free discovery scan reads just the ``key`` column of
    each partition and collapses to (date, contains_target) — one tiny
    boolean per partition; only flagged partitions are read fully,
    filtered, and republished through the atomic manifest protocol.
    Untouched partitions keep their original files and manifests (the
    caller's self-check can assert byte-identity). Returns
    {date: (rows_before, rows_after)} for the rewritten partitions.
    """
    import glob as _glob

    import pyarrow.parquet as _pq
    import ray.data

    import ray as _ray

    targets = set(user_ids)
    t_ref = _ray.put(targets)
    tier_dir = os.path.join(out_root, f"tier={tier}")
    date_files: dict[str, list[str]] = {}
    for ddir in sorted(_glob.glob(os.path.join(tier_dir, "date=*"))):
        files = sorted(_glob.glob(os.path.join(ddir, "*.parquet")))
        if files:
            date_files[os.path.basename(ddir).split("=", 1)[1]] = files

    # DISTRIBUTED discovery: one task per file reads ONLY the key
    # column and emits a (date, hit) boolean — the driver sees one row
    # per file, never key values
    def probe(batch):
        import pandas as pd

        rows = []
        tg = _ray.get(t_ref)
        for date, path in zip(batch["date"], batch["path"]):
            col = _pq.read_table(path, columns=[key])[key].to_pylist()
            rows.append({"date": date, "hit": bool(tg.intersection(col))})
        return pd.DataFrame(rows)

    probe_in = ray.data.from_items(
        [{"date": d, "path": p} for d, fl in date_files.items() for p in fl]
    )
    hits = probe_in.map_batches(probe, batch_format="pandas", batch_size=8).to_pandas()
    affected = {
        d: date_files[d]
        for d in sorted(set(hits.loc[hits["hit"], "date"]))
    }

    out: dict[str, tuple[int, int]] = {}
    for date, files in affected.items():
        ds = ray.data.read_parquet(files)
        if "date" in ds.schema().names:
            ds = ds.drop_columns(["date"])
        before = int(ds.count())

        def drop_targets(batch, targets=targets):
            import pandas as pd

            df = batch if isinstance(batch, pd.DataFrame) else batch.to_pandas()
            return df[~df[key].isin(targets)]

        kept = ds.map_batches(drop_targets, batch_format="pandas",
                              batch_size=None).materialize()
        after = int(kept.count())
        if after == 0:
            # every row of this partition belonged to the target keys:
            # write_partitioned would be a zero-row no-op and leave the
            # stale files in place — the partition (and its manifest)
            # must be REMOVED outright
            import shutil

            shutil.rmtree(os.path.join(tier_dir, f"date={date}"),
                          ignore_errors=True)
            mpath = os.path.join(out_root, MANIFEST_DIR, tier, f"{date}.json")
            if os.path.exists(mpath):
                os.remove(mpath)
            out[date] = (before, 0)
            continue
        counts = write_partitioned(
            kept, out_root, tier, fingerprint=fingerprint, resume=False,
        )
        out[date] = (before, counts.get(date, after))
    return out
