"""Snapshot-versioned tier store: time travel + vacuum.

The manifest store (`state/manifest.py`) keeps ONE live version per
date partition — an upsert or compaction rewrites the partition in
place, so yesterday's view of the tier is gone. This module adds the
lakehouse-style versioned layer on top of the same partitioned-parquet
layout (the public Iceberg/Delta snapshot model: an immutable data-file
pool plus a log of manifests, each pinning the exact file set of one
consistent table version):

- data files are IMMUTABLE, written once under
  ``<root>/tier=<tier>/_data/<run_id>/date=<D>/*.parquet``;
- each commit publishes a JSON snapshot
  ``<root>/_snapshots/<tier>/v<NNNNNN>.json`` mapping every date
  partition to the exact file list (root-relative paths) that makes up
  that version, via atomic tmp+rename — a torn write never surfaces;
- a reader pins a snapshot and sees that version forever (time
  travel); the highest published version is HEAD — the directory
  listing IS the log, no mutable pointer file to corrupt;
- an upsert commits a NEW snapshot that re-points only the touched
  dates at freshly written files; untouched dates keep byte-identical
  file references, so concurrent v1 readers are isolated from the v2
  writer (single-writer, multi-reader — the standard snapshot model);
- ``vacuum`` deletes files referenced by no retained snapshot.

Scale notes: a snapshot holds one entry per (date, file) — metadata,
not data; commits are one distributed ``write_parquet`` with
``partition_cols`` (no driver loop over partitions); reads list files
from the pinned snapshot only, so planning cost is O(files in
snapshot), independent of how many historical versions exist.

Reference analogue: the closest thing in the reference is Lightning's
``ckpt_path="last"`` resume (`uni2ts/cli/conf/pretrain/default.yaml:13`)
— a single mutable HEAD; the versioned log generalizes it to
point-in-time reads, which the north rule's resumable/lineage
requirement needs once late-data upserts rewrite history.
"""

from __future__ import annotations

import glob
import json
import os
import uuid

SNAP_DIR = "_snapshots"


def _snap_dir(root: str, tier: str) -> str:
    return os.path.join(root, SNAP_DIR, tier)


def list_snapshots(root: str, tier: str) -> list[int]:
    """Published versions, ascending. Unreadable/torn files are skipped
    (publish is atomic, so these can only be foreign junk)."""
    d = _snap_dir(root, tier)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def snapshot_meta(root: str, tier: str, version: int | None = None) -> dict:
    """Load one snapshot manifest (HEAD when ``version`` is None)."""
    versions = list_snapshots(root, tier)
    if not versions:
        raise FileNotFoundError(f"no snapshots for tier {tier!r} under {root}")
    v = versions[-1] if version is None else int(version)
    if v not in versions:
        raise FileNotFoundError(
            f"snapshot v{v} of tier {tier!r} not found (have {versions})"
        )
    with open(os.path.join(_snap_dir(root, tier), f"v{v:06d}.json")) as f:
        return json.load(f)


def _publish(root: str, tier: str, meta: dict) -> dict:
    d = _snap_dir(root, tier)
    os.makedirs(d, exist_ok=True)
    v = meta["version"]
    tmp = os.path.join(d, f".v{v:06d}.json.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(d, f"v{v:06d}.json"))
    return meta


def _add_date(ds, date_from: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        day = pc.strftime(
            pc.floor_temporal(batch[date_from], unit="day"), format="%Y-%m-%d"
        )
        return batch.append_column("date", day)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def _date_counts(ds) -> dict[str, int]:
    """{date: rows} via per-block pyarrow partials + a tiny driver sum —
    dates are few; a global groupby would pay a sort exchange per
    commit for a result that fits in one dict."""
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        return batch.select(["date"]).group_by("date").aggregate(
            [("date", "count")])

    p = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas()
    if not len(p):
        return {}
    g = p.groupby("date")["date_count"].sum()
    return {str(d): int(n) for d, n in g.items()}


def _write_run(ds_with_date, root: str, tier: str) -> tuple[dict, dict]:
    """One distributed partitioned write into a fresh immutable run dir.
    Returns ({date: [relpaths]}, {date: rows})."""
    run_id = uuid.uuid4().hex[:8]
    run_dir = os.path.join(root, f"tier={tier}", "_data", run_id)
    mat = ds_with_date.materialize()
    counts = _date_counts(mat)
    if counts:
        mat.write_parquet(run_dir, partition_cols=["date"])
    partitions: dict[str, list[str]] = {}
    for date in counts:
        files = sorted(
            glob.glob(os.path.join(run_dir, f"date={date}", "*.parquet"))
        )
        partitions[date] = [os.path.relpath(p, root) for p in files]
    return partitions, counts


def commit_snapshot(ds, root: str, tier: str, op: str = "append",
                    date_from: str = "bucket_ts") -> dict:
    """Write ``ds`` as a brand-new full version of the tier and publish
    it as the next snapshot. ``date_from`` names the timestamp column
    the date partition derives from."""
    partitions, counts = _write_run(_add_date(ds, date_from), root, tier)
    versions = list_snapshots(root, tier)
    meta = {
        "version": (versions[-1] + 1) if versions else 1,
        "parent": versions[-1] if versions else None,
        "op": op,
        "date_from": date_from,
        "partitions": partitions,
        "row_counts": counts,
    }
    return _publish(root, tier, meta)


def read_snapshot(root: str, tier: str, version: int | None = None,
                  columns: list[str] | None = None):
    """A Dataset over exactly the files pinned by one snapshot. The
    ``date`` is path-encoded, not stored in the files; re-derive it
    from the bucket timestamp if needed."""
    meta = snapshot_meta(root, tier, version)
    files = [os.path.join(root, p) for ps in meta["partitions"].values() for p in ps]
    if not files:
        raise FileNotFoundError(f"snapshot v{meta['version']} of {tier!r} is empty")
    return _read_physical(files, columns)


def _read_physical(files: list[str], columns: list[str] | None = None):
    """read_parquet that surfaces the PHYSICAL file schema only: hive
    inference attaches every ``key=value`` path segment (tier=, date=,
    the run id's parent dirs are exempt) as a column — drop them."""
    import pyarrow.parquet as pq
    import ray.data

    ds = ray.data.read_parquet(files, columns=columns)
    if columns is None:
        physical = set(pq.read_schema(files[0]).names)
        inferred = [c for c in ds.schema().names if c not in physical]
        if inferred:
            ds = ds.drop_columns(inferred)
    return ds


def upsert_snapshot(late_ds, root: str, tier: str, merge_fn,
                    date_from: str = "bucket_ts") -> dict:
    """Merge late-arriving mergeable rows into HEAD and publish the
    next snapshot. Only the date partitions the late rows touch are
    read back, re-merged per date by ``merge_fn`` (a pandas
    frame -> frame reducer, e.g. groupby-sum of additive partials), and
    written as NEW immutable files; every other date keeps its existing
    file references byte-for-byte, so older snapshots stay readable
    (time travel) and HEAD readers never see a half-merged state."""
    parent = snapshot_meta(root, tier)
    late = _add_date(late_ds, date_from).materialize()
    dates = sorted(_date_counts(late))
    if not dates:
        return parent
    old_files = [
        os.path.join(root, p)
        for d in dates
        for p in parent["partitions"].get(d, [])
    ]
    parts = late.drop_columns(["date"])
    if old_files:
        parts = parts.union(_read_physical(old_files))

    def apply_merge(df):
        return merge_fn(df.drop(columns=["date"]))

    merged = _add_date(parts, date_from).groupby("date").map_groups(
        apply_merge, batch_format="pandas"
    )
    new_parts, new_counts = _write_run(_add_date(merged, date_from), root, tier)
    partitions = dict(parent["partitions"])
    counts = dict(parent["row_counts"])
    partitions.update(new_parts)
    counts.update(new_counts)
    meta = {
        "version": parent["version"] + 1,
        "parent": parent["version"],
        "op": "upsert",
        "date_from": date_from,
        "partitions": partitions,
        "row_counts": counts,
    }
    return _publish(root, tier, meta)


def vacuum_snapshots(root: str, tier: str, keep_last: int = 2) -> dict:
    """Expire all but the last ``keep_last`` snapshots and delete every
    data file no retained snapshot references. Returns counts. Safe
    order: snapshot manifests are removed FIRST (so a crash mid-vacuum
    can only leave orphan data files — re-vacuum collects them — never
    a published snapshot pointing at deleted files)."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = list_snapshots(root, tier)
    keep = versions[-keep_last:]
    drop = [v for v in versions if v not in keep]
    referenced: set[str] = set()
    for v in keep:
        meta = snapshot_meta(root, tier, v)
        for ps in meta["partitions"].values():
            referenced.update(ps)
    for v in drop:
        os.remove(os.path.join(_snap_dir(root, tier), f"v{v:06d}.json"))
    data_root = os.path.join(root, f"tier={tier}", "_data")
    deleted = 0
    for p in glob.glob(os.path.join(data_root, "*", "date=*", "*.parquet")):
        if os.path.relpath(p, root) not in referenced:
            os.remove(p)
            deleted += 1
    # sweep empty date/run dirs left behind
    for d in sorted(glob.glob(os.path.join(data_root, "*", "date=*")), reverse=True):
        if not os.listdir(d):
            os.rmdir(d)
    for d in sorted(glob.glob(os.path.join(data_root, "*")), reverse=True):
        if os.path.isdir(d) and not os.listdir(d):
            os.rmdir(d)
    return {
        "snapshots_expired": len(drop),
        "files_deleted": deleted,
        "files_retained": len(referenced),
    }


def erase_and_expire(root: str, tier: str, user_ids, key: str = "conv_id") -> dict:
    """GDPR erasure on a snapshot-versioned tier. The right to be
    forgotten overrides time travel: it is not enough to filter HEAD —
    the erased keys must be unreadable in EVERY version, so the erase
    (1) commits a new HEAD whose affected partitions are filtered and
    (2) expires all history (``vacuum keep_last=1``), deleting every
    data file an old snapshot could have resolved the keys from. This
    is the documented erasure/versioning interplay in the public
    lakehouse model (Delta/Iceberg: DELETE then VACUUM to make the
    removal physical).

    Flow: a distributed probe reads ONLY the key column of each file
    pinned by HEAD and emits one boolean per file — key values never
    reach the driver. Only flagged date partitions are re-read,
    filtered, and written as new immutable files; untouched dates keep
    their existing file references in the new snapshot (they provably
    contain none of the targets, so history expiry cannot leak them).
    Returns {"rows_removed", "partitions_rewritten", "files_deleted",
    "snapshots_expired", "head_version"}.
    """
    import pandas as pd
    import pyarrow.parquet as pq
    import ray
    import ray.data

    head = snapshot_meta(root, tier)
    targets = set(user_ids)
    t_ref = ray.put(targets)

    head_files = {p for ps in head["partitions"].values() for p in ps}
    probe_rows = [
        {"date": d, "path": os.path.join(root, p), "in_head": True}
        for d, ps in head["partitions"].items()
        for p in ps
    ]
    # ALSO probe files referenced only by RETAINED HISTORY: a crash of a
    # prior erase between publish and vacuum leaves HEAD clean but the
    # expired-pending versions still resolving the keys — a re-run must
    # detect and expire them, or the no-hit early return would leave the
    # erased data readable via time travel forever
    for v in list_snapshots(root, tier)[:-1]:
        hist = snapshot_meta(root, tier, v)
        for d, ps in hist["partitions"].items():
            for p in ps:
                if p not in head_files:
                    probe_rows.append(
                        {"date": d, "path": os.path.join(root, p),
                         "in_head": False})
    if not probe_rows:
        return {"rows_removed": 0, "partitions_rewritten": 0,
                "files_deleted": 0, "snapshots_expired": 0,
                "head_version": head["version"]}

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        tg = ray.get(t_ref)
        hits = []
        for path in batch["path"]:
            col = pq.read_table(path, columns=[key])[key].to_pylist()
            hits.append(bool(tg.intersection(col)))
        return pd.DataFrame({"date": batch["date"], "hit": hits,
                             "in_head": batch["in_head"]})

    hits = (
        ray.data.from_items(probe_rows)
        .map_batches(probe, batch_format="pandas", batch_size=8)
        .to_pandas()  # one boolean per file
    )
    affected = sorted(set(hits.loc[hits["hit"] & hits["in_head"], "date"]))
    history_hit = bool((hits["hit"] & ~hits["in_head"]).any())
    if not affected:
        if history_hit:
            # HEAD is already clean (a prior erase published, then
            # crashed before vacuum): finish the job — expire history
            vac = vacuum_snapshots(root, tier, keep_last=1)
            return {"rows_removed": 0, "partitions_rewritten": 0,
                    "files_deleted": vac["files_deleted"],
                    "snapshots_expired": vac["snapshots_expired"],
                    "head_version": head["version"]}
        return {"rows_removed": 0, "partitions_rewritten": 0,
                "files_deleted": 0, "snapshots_expired": 0,
                "head_version": head["version"]}

    old_files = [
        os.path.join(root, p) for d in affected for p in head["partitions"][d]
    ]
    old = _read_physical(old_files)
    before = int(old.count())

    def drop_targets(batch: pd.DataFrame) -> pd.DataFrame:
        tg = ray.get(t_ref)
        return batch[~batch[key].isin(tg)]

    kept = old.map_batches(drop_targets, batch_format="pandas", batch_size=None)
    # date re-derives from the SAME column the tier was committed with
    # (persisted in the snapshot meta since the commit/upsert paths
    # started recording it; the fallback covers pre-existing stores) —
    # deriving from a different column would scatter rewritten rows
    # into dates outside `affected`, which the publish below drops
    date_from = head.get("date_from", "bucket_ts")
    new_parts, new_counts = _write_run(_add_date(kept, date_from), root, tier)
    partitions = dict(head["partitions"])
    counts = dict(head["row_counts"])
    for d in affected:
        # a partition may vanish entirely if every row was the target's
        partitions[d] = new_parts.get(d, [])
        counts[d] = new_counts.get(d, 0)
        if not partitions[d]:
            del partitions[d]
            del counts[d]
    meta = {
        "version": head["version"] + 1,
        "parent": head["version"],
        "op": f"erase:{key}",
        "date_from": date_from,
        "partitions": partitions,
        "row_counts": counts,
    }
    _publish(root, tier, meta)
    vac = vacuum_snapshots(root, tier, keep_last=1)
    after = sum(new_counts.get(d, 0) for d in affected)
    return {
        "rows_removed": before - after,
        "partitions_rewritten": len(affected),
        "files_deleted": vac["files_deleted"],
        "snapshots_expired": vac["snapshots_expired"],
        "head_version": meta["version"],
    }


def compact_snapshot(root: str, tier: str, target_bytes: int = 128 << 20) -> dict:
    """File compaction as a SNAPSHOT COMMIT: every date partition of
    HEAD holding more parquet files than ``ceil(bytes/target)`` is
    rewritten into that many new immutable files, and a new snapshot is
    published re-pointing ONLY those dates. Unlike the in-place
    manifest-store compaction (`manifest.compact_partitions`, staging
    dir + swap), no live file is ever touched: readers pinned to the
    old version keep reading the fragmented files until ``vacuum``
    expires them — compaction becomes crash-safe for free (a crash
    before publish leaves an orphan run dir that the next vacuum
    collects; a crash after publish is simply the new version).

    Row-count safety: each rewritten partition's count is verified
    against HEAD's recorded count BEFORE publish. Returns
    {date: (files_before, files_after)}; empty if nothing to compact.
    """
    head = snapshot_meta(root, tier)
    todo: dict[str, tuple[list[str], int]] = {}
    for date, rels in head["partitions"].items():
        files = [os.path.join(root, p) for p in rels]
        nbytes = sum(os.path.getsize(p) for p in files)
        needed = max(1, -(-nbytes // target_bytes))
        if len(files) > needed:
            todo[date] = (files, int(needed))
    if not todo:
        return {}

    import ray

    from .manifest import _compact_files

    # one Ray task per over-fragmented date, all concurrent; each task
    # streams row groups through byte-budgeted writers (see
    # manifest._compact_files) — no driver-sequential Dataset launches
    rewrite = ray.remote(num_cpus=1)(_compact_files)
    run_id = uuid.uuid4().hex[:8]
    run_dir = os.path.join(root, f"tier={tier}", "_data", run_id)
    refs = {
        date: rewrite.remote(files, os.path.join(run_dir, f"date={date}"), needed)
        for date, (files, needed) in sorted(todo.items())
    }
    results: dict[str, tuple[int, int]] = {}
    partitions = dict(head["partitions"])
    for date, ref in refs.items():
        n_rows, _ = ray.get(ref)
        if int(head["row_counts"][date]) != n_rows:
            raise RuntimeError(
                f"compaction row-count mismatch for {tier}/{date}: "
                f"snapshot {head['row_counts'][date]} vs files {n_rows}"
            )
        ddir = os.path.join(run_dir, f"date={date}")
        new = sorted(glob.glob(os.path.join(ddir, "*.parquet")))
        partitions[date] = [os.path.relpath(p, root) for p in new]
        results[date] = (len(todo[date][0]), len(new))
    meta = {
        "version": head["version"] + 1,
        "parent": head["version"],
        "op": "compact",
        "date_from": head.get("date_from", "bucket_ts"),
        "partitions": partitions,
        "row_counts": dict(head["row_counts"]),
    }
    _publish(root, tier, meta)
    return results


def refresh_view(root: str, src_tier: str, view_tier: str, view_fn,
                 date_from: str = "bucket_ts") -> dict:
    """Incrementally-maintained MATERIALIZED VIEW over a snapshot tier
    (the Delta Live Tables / Iceberg incremental-refresh model): the
    view tier stores ``view_fn(src)`` per date partition, and a refresh
    recomputes ONLY the source date partitions whose pinned file set
    changed since the view's last sync — an upsert touching 1 of 365
    dates re-reads 1/365th of the source, not all of it.

    ``view_fn`` must be PARTITION-LOCAL: Dataset -> Dataset where every
    output row's ``date_from`` date equals the date of the source rows
    it derives from (true for time-bucket rollups whose buckets never
    span a day; enforced — a produced date outside the changed set
    raises). A changed source date that yields no view rows (e.g. fully
    erased) is dropped from the view; source dates deleted since the
    sync are dropped too.

    The view snapshot meta carries ``src_version`` (the source version
    it reflects), so refresh is idempotent: already-synced -> no new
    version. Returns the published meta plus ``dates_recomputed`` /
    ``dates_dropped`` (stats, not persisted)."""
    src_head = snapshot_meta(root, src_tier)
    try:
        view_head = snapshot_meta(root, view_tier)
    except FileNotFoundError:
        view_head = None

    if view_head is None or view_head.get("src_version") is None:
        changed = set(src_head["partitions"])
        deleted: set[str] = set()
        old_parts: dict[str, list[str]] = {}
        old_counts: dict[str, int] = {}
    else:
        if view_head["src_version"] == src_head["version"]:
            out = dict(view_head)
            out["dates_recomputed"] = 0
            out["dates_dropped"] = 0
            return out
        try:
            src_synced = snapshot_meta(root, src_tier, view_head["src_version"])
        except FileNotFoundError:
            # the synced source version was expired (vacuum / erasure):
            # no diff base — fall back to a FULL recompute; view dates
            # absent from the source HEAD drop out
            src_synced = None
        old_parts = dict(view_head["partitions"])
        old_counts = dict(view_head["row_counts"])
        if src_synced is None:
            changed = set(src_head["partitions"])
            deleted = set(old_parts) - set(src_head["partitions"])
        else:
            changed = {
                d for d, files in src_head["partitions"].items()
                if src_synced["partitions"].get(d) != files
            }
            deleted = set(src_synced["partitions"]) - set(src_head["partitions"])

    new_parts: dict[str, list[str]] = {}
    new_counts: dict[str, int] = {}
    if changed:
        files = [
            os.path.join(root, p)
            for d in sorted(changed)
            for p in src_head["partitions"][d]
        ]
        out_ds = view_fn(_read_physical(files))
        new_parts, new_counts = _write_run(
            _add_date(out_ds, date_from), root, view_tier
        )
        stray = set(new_parts) - changed
        if stray:
            raise RuntimeError(
                f"view_fn is not partition-local: produced dates {sorted(stray)} "
                f"outside the changed set {sorted(changed)}"
            )

    partitions = {
        d: ps for d, ps in old_parts.items()
        if d not in changed and d not in deleted
    }
    counts = {d: old_counts[d] for d in partitions}
    partitions.update(new_parts)
    counts.update(new_counts)
    meta = {
        "version": (view_head["version"] + 1) if view_head else 1,
        "parent": view_head["version"] if view_head else None,
        "op": "refresh",
        "src_version": src_head["version"],
        "date_from": date_from,
        "partitions": partitions,
        "row_counts": counts,
    }
    _publish(root, view_tier, meta)
    out = dict(meta)
    out["dates_recomputed"] = len(changed)
    out["dates_dropped"] = len(
        (deleted | (changed - set(new_parts))) & set(old_parts)
    )
    return out


def maintain(root: str, tier: str, target_bytes: int = 128 << 20,
             keep_last: int = 2) -> dict:
    """One-call maintenance policy for a snapshot tier — the scheduled
    OPTIMIZE+VACUUM job every lakehouse runs: compact over-fragmented
    HEAD partitions (new immutable files + one snapshot publish, pinned
    readers unaffected), then expire history beyond ``keep_last`` and
    delete unreferenced files (including any orphan run dirs from
    crashed writers). Returns a combined report; a no-op when the tier
    is already compact and within retention."""
    compacted = compact_snapshot(root, tier, target_bytes=target_bytes)
    vac = vacuum_snapshots(root, tier, keep_last=keep_last)
    return {
        "partitions_compacted": len(compacted),
        "files_merged": sum(b for b, _ in compacted.values()),
        "files_after": sum(a for _, a in compacted.values()),
        "snapshots_expired": vac["snapshots_expired"],
        "files_deleted": vac["files_deleted"],
        "head_version": snapshot_meta(root, tier)["version"],
    }


def snapshot_diff(root: str, tier: str, v_from: int, v_to: int,
                  key_cols: list[str], value_cols: list[str]):
    """Change-data-feed between two pinned snapshot versions (the
    Delta Lake CDF / Iceberg changelog-scan model): classify every key
    as added / removed / changed between ``v_from`` and ``v_to``.

    Scale shape: the partition maps are compared FIRST — any date
    whose file list is byte-identical in both versions is skipped with
    ZERO I/O (immutable files can't differ), so the diff reads only
    the dates some commit actually rewrote. Changed dates stream
    through one key-hash exchange of (side-tagged) rows and a
    per-partition sorted compare; nothing keyed ever lands on the
    driver.

    Returns ``(changes_dataset, report)``: the Dataset has one row per
    changed key with ``change_type`` in {'added', 'removed',
    'changed'} plus the key columns and old_/new_ value columns;
    ``report`` lists the skipped/compared dates and per-type counts.
    Keys must be unique per snapshot within a date (the rollup-tier
    invariant); duplicate keys raise."""
    import numpy as np
    import pandas as pd
    import ray.data

    ma = snapshot_meta(root, tier, v_from)
    mb = snapshot_meta(root, tier, v_to)
    pa_, pb = ma["partitions"], mb["partitions"]
    all_dates = sorted(set(pa_) | set(pb))
    skipped = [d for d in all_dates if pa_.get(d) == pb.get(d)]
    compared = [d for d in all_dates if pa_.get(d) != pb.get(d)]
    report = {
        "v_from": v_from, "v_to": v_to,
        "dates_skipped": skipped, "dates_compared": compared,
    }
    def _empty_template() -> pd.DataFrame:
        # derive KEY dtypes from real data when any file exists —
        # hardcoding int64 keys would give change-free runs a block
        # schema irreconcilable with string-keyed tiers
        key_dtypes = {k: np.int64 for k in key_cols}
        sample = [os.path.join(root, f)
                  for pm in (pa_, pb) for fs in pm.values() for f in fs]
        if sample:
            import pyarrow.parquet as pq

            head = pq.read_table(sample[0], columns=key_cols).to_pandas()
            key_dtypes = {k: head[k].dtype for k in key_cols}
        return pd.DataFrame({
            "change_type": pd.Series([], dtype=object),
            **{k: pd.Series([], dtype=key_dtypes[k]) for k in key_cols},
            **{f"old_{c}": pd.Series([], dtype=np.float64) for c in value_cols},
            **{f"new_{c}": pd.Series([], dtype=np.float64) for c in value_cols},
        })

    if not compared:
        report.update({"added": 0, "removed": 0, "changed": 0})
        return ray.data.from_pandas(_empty_template()), report

    def side_files(pmap):
        return [os.path.join(root, f) for d in compared for f in pmap.get(d, [])]

    # the per-snapshot uniqueness invariant is PER DATE — carry the
    # hive date column so the compare joins on (date, key): pooling
    # all compared dates on the key alone would false-positive the
    # duplicate-key check (and mis-join) for keys that legitimately
    # recur on several dates
    cols = key_cols + value_cols
    cols_d = ["date"] + cols

    def tag(side):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch[cols_d].copy()
            batch["_side"] = np.int8(side)
            h = pd.util.hash_pandas_object(
                batch[key_cols].astype(str).agg("|".join, axis=1), index=False
            ) if len(key_cols) > 1 else pd.util.hash_pandas_object(
                batch[key_cols[0]], index=False)
            batch["_part"] = (h.to_numpy() % 64).astype(np.int32)
            return batch
        return f

    fa = side_files(pa_)
    fb = side_files(pb)
    sides = []
    if fa:
        sides.append(_read_physical(fa, cols_d).map_batches(
            tag(0), batch_format="pandas", batch_size=None))
    if fb:
        sides.append(_read_physical(fb, cols_d).map_batches(
            tag(1), batch_format="pandas", batch_size=None))
    both = sides[0].union(*sides[1:]) if len(sides) > 1 else sides[0]

    def compare(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_part"])
        a = df[df["_side"] == 0].drop(columns=["_side"])
        b = df[df["_side"] == 1].drop(columns=["_side"])
        jk = ["date"] + key_cols
        for side in (a, b):
            if side.duplicated(jk).any():
                raise ValueError("duplicate keys within one snapshot date")
        m = a.merge(b, on=jk, how="outer", suffixes=("_old", "_new"),
                    indicator=True)
        old_v = m[[f"{c}_old" for c in value_cols]].to_numpy(np.float64)
        new_v = m[[f"{c}_new" for c in value_cols]].to_numpy(np.float64)
        added = (m["_merge"] == "right_only").to_numpy()
        removed = (m["_merge"] == "left_only").to_numpy()
        same = np.all((old_v == new_v) | (np.isnan(old_v) & np.isnan(new_v)),
                      axis=1)
        changed = (m["_merge"] == "both").to_numpy() & ~same
        keep = added | removed | changed
        ct = np.where(added, "added", np.where(removed, "removed", "changed"))
        out = pd.DataFrame({"change_type": ct[keep]})
        for k in key_cols:
            out[k] = m[k].to_numpy()[keep]
        for c in value_cols:
            out[f"old_{c}"] = m[f"{c}_old"].to_numpy(np.float64)[keep]
            out[f"new_{c}"] = m[f"{c}_new"].to_numpy(np.float64)[keep]
        # a zero-row out keeps REAL dtypes (empty slices of the merged
        # frame), so change-free groups unify with diff-bearing blocks
        return out

    changes = both.groupby("_part").map_groups(
        compare, batch_format="pandas").materialize()

    def type_counts(batch: pd.DataFrame) -> pd.DataFrame:
        return (batch.groupby("change_type", as_index=False)
                .size().rename(columns={"size": "n"}))

    tc = (changes.map_batches(type_counts, batch_format="pandas",
                              batch_size=None)
          .to_pandas())  # <= 3 rows per block
    tc = tc.groupby("change_type")["n"].sum() if len(tc) else {}
    report.update({
        "added": int(tc.get("added", 0)),
        "removed": int(tc.get("removed", 0)),
        "changed": int(tc.get("changed", 0)),
    })
    return changes, report
