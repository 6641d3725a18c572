"""Snapshot-versioned tier store: time travel, isolation, vacuum."""

import os

import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.state.snapshots import (
    commit_snapshot,
    list_snapshots,
    read_snapshot,
    snapshot_meta,
    upsert_snapshot,
    vacuum_snapshots,
)


def _frame(days, rows_per_day, value0=1):
    ts, conv, val = [], [], []
    for d in range(days):
        for i in range(rows_per_day):
            ts.append(np.datetime64(f"2024-02-{d + 1:02d}T03:00:00", "us"))
            conv.append(f"c{i % 3}")
            val.append(value0 + d * 10 + i)
    return pd.DataFrame({"conv_id": conv, "bucket_ts": ts, "n": np.int64(1),
                         "total": np.asarray(val, dtype=np.int64)})


def _make_merge():
    # defined as a local closure so cloudpickle ships it by VALUE — the
    # test module is not importable inside Ray workers
    def merge(df):
        import numpy as _np

        g = df.groupby(["conv_id", "bucket_ts"], as_index=False)[["n", "total"]].sum()
        g["n"] = g["n"].astype(_np.int64)
        g["total"] = g["total"].astype(_np.int64)
        return g

    return merge


_merge = _make_merge()


def _sorted(df):
    df = df.copy()
    df["bucket_ts"] = pd.to_datetime(df["bucket_ts"]).astype("datetime64[us]")
    return df.sort_values(["conv_id", "bucket_ts", "total"]).reset_index(drop=True)[
        ["conv_id", "bucket_ts", "n", "total"]
    ]


def test_commit_read_roundtrip(ray_session, tmp_path):
    import ray.data

    root = str(tmp_path / "store")
    df = _frame(days=3, rows_per_day=4)
    meta = commit_snapshot(ray.data.from_pandas(df), root, "1h")
    assert meta["version"] == 1 and meta["parent"] is None
    assert sum(meta["row_counts"].values()) == len(df)
    assert sorted(meta["partitions"]) == ["2024-02-01", "2024-02-02", "2024-02-03"]
    got = read_snapshot(root, "1h").to_pandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(df))


def test_upsert_time_travel_isolation(ray_session, tmp_path):
    import ray.data

    root = str(tmp_path / "store")
    base = _merge(_frame(days=3, rows_per_day=4))
    commit_snapshot(ray.data.from_pandas(base), root, "1h")
    # late rows hit only day 3
    late = base[base["bucket_ts"] == np.datetime64("2024-02-03T03:00:00", "us")].copy()
    late["total"] = np.int64(1000)
    m2 = upsert_snapshot(ray.data.from_pandas(late), root, "1h", _merge)
    assert m2["version"] == 2 and m2["parent"] == 1

    # v1 still reads the ORIGINAL data (time travel)
    v1 = read_snapshot(root, "1h", version=1).to_pandas()
    pd.testing.assert_frame_equal(_sorted(v1), _sorted(base))

    # HEAD equals a from-scratch merge over base+late
    head = read_snapshot(root, "1h").to_pandas()
    expect = _merge(pd.concat([base, late]))
    pd.testing.assert_frame_equal(_sorted(head), _sorted(expect))

    # untouched dates keep byte-identical file references
    m1 = snapshot_meta(root, "1h", 1)
    for d in ("2024-02-01", "2024-02-02"):
        assert m1["partitions"][d] == m2["partitions"][d]
    assert m1["partitions"]["2024-02-03"] != m2["partitions"]["2024-02-03"]


def test_vacuum_expires_old_versions(ray_session, tmp_path):
    import ray.data

    root = str(tmp_path / "store")
    base = _merge(_frame(days=2, rows_per_day=3))
    commit_snapshot(ray.data.from_pandas(base), root, "1h")
    late = base[base["bucket_ts"] == np.datetime64("2024-02-02T03:00:00", "us")]
    upsert_snapshot(ray.data.from_pandas(late), root, "1h", _merge)

    res = vacuum_snapshots(root, "1h", keep_last=1)
    assert res["snapshots_expired"] == 1
    assert res["files_deleted"] >= 1  # v1's replaced day-2 files are gone
    assert list_snapshots(root, "1h") == [2]
    # HEAD still reads fine and v1 is unreachable
    head = read_snapshot(root, "1h").to_pandas()
    expect = _merge(pd.concat([base, late]))
    pd.testing.assert_frame_equal(_sorted(head), _sorted(expect))
    with pytest.raises(FileNotFoundError):
        read_snapshot(root, "1h", version=1)
    # every file still on disk is referenced by the retained snapshot
    m2 = snapshot_meta(root, "1h")
    referenced = {p for ps in m2["partitions"].values() for p in ps}
    import glob

    on_disk = {
        os.path.relpath(p, root)
        for p in glob.glob(os.path.join(root, "tier=1h", "_data", "*", "date=*", "*.parquet"))
    }
    assert on_disk == referenced


def test_torn_snapshot_ignored_and_missing_errors(ray_session, tmp_path):
    import ray.data

    root = str(tmp_path / "store")
    with pytest.raises(FileNotFoundError):
        snapshot_meta(root, "1h")
    commit_snapshot(ray.data.from_pandas(_frame(1, 2)), root, "1h")
    # junk that atomic publish could never produce is skipped
    snapdir = os.path.join(root, "_snapshots", "1h")
    with open(os.path.join(snapdir, "vgarbage.json"), "w") as f:
        f.write("{")
    assert list_snapshots(root, "1h") == [1]
    with pytest.raises(FileNotFoundError):
        read_snapshot(root, "1h", version=7)
    with pytest.raises(ValueError):
        vacuum_snapshots(root, "1h", keep_last=0)


def test_erase_and_expire_removes_from_all_versions(ray_session, tmp_path):
    import glob

    import ray.data

    from spectral_time_series_ray.state.snapshots import erase_and_expire

    root = str(tmp_path / "store")
    base = _merge(_frame(days=3, rows_per_day=4))
    commit_snapshot(ray.data.from_pandas(base), root, "1h")
    late = base[base["bucket_ts"] == np.datetime64("2024-02-03T03:00:00", "us")]
    upsert_snapshot(ray.data.from_pandas(late), root, "1h", _merge)

    res = erase_and_expire(root, "1h", {"c1"})
    assert res["rows_removed"] == 3  # c1 appears once per day
    assert res["partitions_rewritten"] == 3
    assert res["snapshots_expired"] == 2
    assert list_snapshots(root, "1h") == [res["head_version"]]

    # HEAD no longer contains c1 and equals the filtered merge
    head = read_snapshot(root, "1h").to_pandas()
    assert not (head["conv_id"] == "c1").any()
    expect = _merge(pd.concat([base, late]))
    expect = expect[expect["conv_id"] != "c1"]
    pd.testing.assert_frame_equal(_sorted(head), _sorted(expect))

    # PHYSICAL erasure: no file on disk contains the key
    import pyarrow.parquet as pq

    for p in glob.glob(os.path.join(root, "tier=1h", "_data", "*", "date=*", "*.parquet")):
        assert "c1" not in set(pq.read_table(p, columns=["conv_id"])["conv_id"].to_pylist())


def test_erase_and_expire_no_match_is_noop(ray_session, tmp_path):
    import ray.data

    from spectral_time_series_ray.state.snapshots import erase_and_expire

    root = str(tmp_path / "store")
    commit_snapshot(ray.data.from_pandas(_merge(_frame(2, 3))), root, "1h")
    m1 = snapshot_meta(root, "1h")
    res = erase_and_expire(root, "1h", {"zz-not-there"})
    assert res["rows_removed"] == 0 and res["partitions_rewritten"] == 0
    assert snapshot_meta(root, "1h") == m1  # no new version published


def test_compact_snapshot_versioned(ray_session, tmp_path):
    import glob

    import ray.data

    from spectral_time_series_ray.state.snapshots import compact_snapshot

    root = str(tmp_path / "store")
    base = _merge(_frame(days=2, rows_per_day=4))
    # force fragmentation: commit from many tiny blocks
    ds = ray.data.from_pandas(base).repartition(6)
    commit_snapshot(ds, root, "1h")
    m1 = snapshot_meta(root, "1h")
    frag = {d: len(ps) for d, ps in m1["partitions"].items()}
    assert max(frag.values()) > 1

    res = compact_snapshot(root, "1h", target_bytes=1 << 30)
    assert res and all(after < before for before, after in res.values())
    m2 = snapshot_meta(root, "1h")
    assert m2["version"] == 2 and m2["op"] == "compact"
    assert m2["row_counts"] == m1["row_counts"]

    # both versions readable and equal; v1 still sees the OLD files
    v1 = read_snapshot(root, "1h", version=1).to_pandas()
    v2 = read_snapshot(root, "1h", version=2).to_pandas()
    pd.testing.assert_frame_equal(_sorted(v1), _sorted(v2))
    pd.testing.assert_frame_equal(_sorted(v2), _sorted(base))
    for d in res:
        assert m1["partitions"][d] != m2["partitions"][d]
    # idempotent: nothing left to compact at this target
    assert compact_snapshot(root, "1h", target_bytes=1 << 30) == {}
    # vacuum drops the fragmented files, HEAD unaffected
    vacuum_snapshots(root, "1h", keep_last=1)
    v2b = read_snapshot(root, "1h").to_pandas()
    pd.testing.assert_frame_equal(_sorted(v2b), _sorted(base))


def _make_daily_view():
    # closure so cloudpickle ships it by value (module not importable
    # inside Ray workers)
    def view_fn(ds):
        def agg(g):
            import numpy as _np
            import pandas as _pd

            g = g.copy()
            g["bucket_ts"] = _pd.to_datetime(g["bucket_ts"]).dt.floor("D")
            out = g.groupby(["conv_id", "bucket_ts"], as_index=False)[
                ["n", "total"]].sum()
            out["n"] = out["n"].astype(_np.int64)
            out["total"] = out["total"].astype(_np.int64)
            return out

        return ds.groupby("conv_id").map_groups(agg, batch_format="pandas")

    return view_fn


def test_refresh_view_incremental(ray_session, tmp_path):
    import ray.data

    from spectral_time_series_ray.state.snapshots import refresh_view

    root = str(tmp_path / "store")
    base = _frame(days=3, rows_per_day=4)
    commit_snapshot(ray.data.from_pandas(base), root, "1m")
    view_fn = _make_daily_view()

    def expected(df):
        df = df.copy()
        df["bucket_ts"] = pd.to_datetime(df["bucket_ts"]).dt.floor("D")
        out = df.groupby(["conv_id", "bucket_ts"], as_index=False)[
            ["n", "total"]].sum()
        out["n"] = out["n"].astype(np.int64)
        out["total"] = out["total"].astype(np.int64)
        return out.sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True)

    m1 = refresh_view(root, "1m", "1d_view", view_fn)
    assert m1["version"] == 1 and m1["dates_recomputed"] == 3
    got = read_snapshot(root, "1d_view").to_pandas()
    got["bucket_ts"] = pd.to_datetime(got["bucket_ts"]).astype("datetime64[us]")
    exp = expected(base)
    exp["bucket_ts"] = exp["bucket_ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        got.sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True), exp)

    # idempotent: already synced -> no new version
    m1b = refresh_view(root, "1m", "1d_view", view_fn)
    assert m1b["dates_recomputed"] == 0
    assert list_snapshots(root, "1d_view") == [1]

    # late rows touch ONLY day 2 -> exactly 1 date recomputed
    late = _frame(days=2, rows_per_day=2, value0=1000).query(
        "bucket_ts.dt.day == 2")
    upsert_snapshot(ray.data.from_pandas(late), root, "1m", _merge)
    m2 = refresh_view(root, "1m", "1d_view", view_fn)
    assert m2["version"] == 2 and m2["dates_recomputed"] == 1
    # untouched view dates keep byte-identical file references
    v1p = snapshot_meta(root, "1d_view", 1)["partitions"]
    v2p = snapshot_meta(root, "1d_view", 2)["partitions"]
    assert v1p["2024-02-01"] == v2p["2024-02-01"]
    assert v1p["2024-02-03"] == v2p["2024-02-03"]
    assert v1p["2024-02-02"] != v2p["2024-02-02"]
    # view HEAD == from-scratch aggregate of src HEAD
    src = read_snapshot(root, "1m").to_pandas()
    got2 = read_snapshot(root, "1d_view").to_pandas()
    got2["bucket_ts"] = pd.to_datetime(got2["bucket_ts"]).astype("datetime64[us]")
    exp2 = expected(src)
    exp2["bucket_ts"] = exp2["bucket_ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        got2.sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True), exp2)


def test_refresh_view_rejects_non_partition_local(ray_session, tmp_path):
    import ray.data

    from spectral_time_series_ray.state.snapshots import refresh_view

    root = str(tmp_path / "store")
    commit_snapshot(ray.data.from_pandas(_frame(days=2, rows_per_day=3)),
                    root, "1m")

    def bad_view(ds):
        def shift(batch):
            batch = batch.copy()
            batch["bucket_ts"] = pd.to_datetime(batch["bucket_ts"]) + pd.Timedelta(days=30)
            return batch

        return ds.map_batches(shift, batch_format="pandas")

    with pytest.raises(RuntimeError, match="partition-local"):
        refresh_view(root, "1m", "bad_view", bad_view)


def test_maintain_policy(ray_session, tmp_path):
    import ray.data

    from spectral_time_series_ray.state.snapshots import maintain

    root = str(tmp_path / "store")
    base = _merge(_frame(days=2, rows_per_day=4))
    commit_snapshot(ray.data.from_pandas(base).repartition(6), root, "1h")
    rep = maintain(root, "1h", target_bytes=1 << 30, keep_last=1)
    assert rep["partitions_compacted"] >= 1
    assert rep["files_after"] < rep["files_merged"]
    assert rep["snapshots_expired"] == 1  # pre-compaction version expired
    assert rep["files_deleted"] >= 1
    out = read_snapshot(root, "1h").to_pandas()
    pd.testing.assert_frame_equal(_sorted(out), _sorted(base))
    # idempotent second run: nothing left to do
    rep2 = maintain(root, "1h", target_bytes=1 << 30, keep_last=1)
    assert rep2["partitions_compacted"] == 0 and rep2["files_deleted"] == 0


def test_erase_resumes_after_crash_before_vacuum(ray_session, tmp_path):
    """A prior erase that published the clean HEAD but crashed before
    vacuum leaves history still resolving the keys; re-running the
    erase must detect the historical hits and expire them (GDPR
    completeness), while an innocent no-match call keeps history."""
    import glob as _glob

    import pyarrow.parquet as _pq
    import ray.data

    from spectral_time_series_ray.state.snapshots import erase_and_expire

    root = str(tmp_path / "store")
    base = _merge(_frame(days=2, rows_per_day=4))
    commit_snapshot(ray.data.from_pandas(base), root, "1h")
    # simulated crash state: v2 = HEAD without conv 'c0', v1 retained
    clean = base[base["conv_id"] != "c0"]
    commit_snapshot(ray.data.from_pandas(clean), root, "1h", op="erase:conv_id")
    assert list_snapshots(root, "1h") == [1, 2]

    res = erase_and_expire(root, "1h", {"c0"})
    assert res["rows_removed"] == 0 and res["partitions_rewritten"] == 0
    assert res["snapshots_expired"] >= 1 and res["files_deleted"] >= 1
    assert list_snapshots(root, "1h") == [2]
    # physically unreadable: no c0 row in any remaining file
    left = 0
    for p in _glob.glob(os.path.join(root, "tier=1h", "_data", "*",
                                     "date=*", "*.parquet")):
        left += sum(c == "c0" for c in
                    _pq.read_table(p, columns=["conv_id"])["conv_id"].to_pylist())
    assert left == 0
    # innocent no-match call afterwards: true noop, history intact
    m = snapshot_meta(root, "1h")
    res2 = erase_and_expire(root, "1h", {"zz-none"})
    assert res2["snapshots_expired"] == 0 and res2["files_deleted"] == 0
    assert snapshot_meta(root, "1h") == m


def test_vacuum_and_upsert_crash_invariants(ray_session, tmp_path):
    """(a) vacuum crash after manifest removal, before file deletion:
    re-vacuum collects the orphans and HEAD is untouched. (b) upsert
    crash after the run-dir write, before publish: readers still see
    the old HEAD and vacuum collects the orphan run dir."""
    import glob as _glob

    import ray.data

    root = str(tmp_path / "store")
    base = _merge(_frame(days=2, rows_per_day=4))
    commit_snapshot(ray.data.from_pandas(base), root, "1h")
    upsert_snapshot(ray.data.from_pandas(
        _frame(days=1, rows_per_day=2, value0=500)), root, "1h", _merge)
    assert list_snapshots(root, "1h") == [1, 2]

    # (a) crashed vacuum: v1's manifest gone, its files still on disk
    os.remove(os.path.join(root, "_snapshots", "1h", "v000001.json"))
    n_files_before = len(_glob.glob(
        os.path.join(root, "tier=1h", "_data", "*", "date=*", "*.parquet")))
    vac = vacuum_snapshots(root, "1h", keep_last=1)
    assert vac["files_deleted"] >= 1  # orphans collected on re-vacuum
    head = read_snapshot(root, "1h").to_pandas()
    assert len(head) == len(_merge(pd.concat([
        base, _frame(days=1, rows_per_day=2, value0=500)])))

    # (b) crashed upsert: a run dir with data but no published snapshot
    m = snapshot_meta(root, "1h")
    orphan = os.path.join(root, "tier=1h", "_data", "deadbeef", "date=2024-02-01")
    os.makedirs(orphan)
    import shutil

    src = _glob.glob(os.path.join(root, "tier=1h", "_data", "*",
                                  "date=*", "*.parquet"))[0]
    shutil.copy(src, os.path.join(orphan, "orphan.parquet"))
    assert snapshot_meta(root, "1h") == m  # readers unaffected
    vac2 = vacuum_snapshots(root, "1h", keep_last=1)
    assert vac2["files_deleted"] == 1  # exactly the orphan
    assert not os.path.isdir(os.path.join(root, "tier=1h", "_data", "deadbeef"))
    head2 = read_snapshot(root, "1h").to_pandas()
    pd.testing.assert_frame_equal(_sorted(head2), _sorted(head))


def test_refresh_view_drops_deleted_source_dates(ray_session, tmp_path):
    """An erasure that removes a whole source date must propagate: the
    next refresh drops that date from the view."""
    import ray.data

    from spectral_time_series_ray.state.snapshots import (
        erase_and_expire,
        refresh_view,
    )

    root = str(tmp_path / "store")
    df = _frame(days=3, rows_per_day=3)
    # day 2 belongs to ONE conversation only -> erasing it empties the date
    day2 = df["bucket_ts"].astype("datetime64[us]").astype(str).str.startswith("2024-02-02")
    df.loc[day2, "conv_id"] = "victim"
    df.loc[~day2, "conv_id"] = "keep"
    commit_snapshot(ray.data.from_pandas(_merge(df)), root, "1m")
    view_fn = _make_daily_view()
    m1 = refresh_view(root, "1m", "1d", view_fn)
    assert "2024-02-02" in m1["partitions"]

    erase_and_expire(root, "1m", {"victim"})
    assert "2024-02-02" not in snapshot_meta(root, "1m")["partitions"]

    m2 = refresh_view(root, "1m", "1d", view_fn)
    assert "2024-02-02" not in m2["partitions"]
    assert m2["dates_dropped"] >= 1
    got = read_snapshot(root, "1d").to_pandas()
    assert set(pd.to_datetime(got["bucket_ts"]).dt.strftime("%Y-%m-%d")) == {
        "2024-02-01", "2024-02-03"}
    assert set(got["conv_id"]) == {"keep"}


def test_erase_uses_committed_date_from_column(ray_session, tmp_path):
    """Regression: a tier committed with a NON-default timestamp column
    must erase along that same column. Before date_from was persisted
    in the snapshot meta, erase re-derived dates from the hardcoded
    bucket_ts fallback; with a differently-named column that raised (or
    with both columns present, scattered rewritten rows into dates
    outside the affected set, which the publish silently dropped)."""
    import ray.data

    from spectral_time_series_ray.state.snapshots import erase_and_expire

    root = str(tmp_path / "store")
    df = _frame(days=3, rows_per_day=4).rename(columns={"bucket_ts": "ts"})
    meta = commit_snapshot(ray.data.from_pandas(df), root, "1h", date_from="ts")
    assert meta["date_from"] == "ts"

    res = erase_and_expire(root, "1h", {"c1"}, key="conv_id")
    assert res["rows_removed"] == int((df["conv_id"] == "c1").sum())
    assert res["partitions_rewritten"] == 3

    head = snapshot_meta(root, "1h")
    assert head["date_from"] == "ts"
    got = read_snapshot(root, "1h").to_pandas()
    exp = df[df["conv_id"] != "c1"]
    assert len(got) == len(exp)
    assert set(got["conv_id"]) == {"c0", "c2"}
    assert sorted(got["total"]) == sorted(exp["total"])
    # every surviving date partition kept its rows (nothing scattered):
    # 4 rows/day, conv ids cycle c0,c1,c2,c0 -> exactly 1 c1 row erased
    assert head["row_counts"] == {d: 3 for d in head["row_counts"]}
    assert len(head["row_counts"]) == 3
