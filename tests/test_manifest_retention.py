"""Resume idempotence + retention (FIXTURES.md §4 oracle invariants)."""

import datetime as dt
import glob
import json
import os

import pyarrow.parquet as pq
import pytest

from spectral_time_series_ray.sources.transcripts import generate_transcripts
from spectral_time_series_ray.stages.features import with_turn_features
from spectral_time_series_ray.stages.rollup import rollup_exact
from spectral_time_series_ray.state.manifest import (
    completed_partitions,
    read_manifests,
    write_partitioned,
)
from spectral_time_series_ray.state.retention import (
    apply_retention,
    expired_partitions,
)


@pytest.fixture(scope="module")
def rolled(ray_session):
    import ray.data

    table = generate_transcripts(1500, seed=42)
    ds = ray.data.from_arrow(table)
    return rollup_exact(with_turn_features(ds, include_text=False), "1h").materialize()


def _read_all(tier_dir):
    files = sorted(glob.glob(os.path.join(tier_dir, "**", "*.parquet"), recursive=True))
    import pandas as pd

    return (
        pd.concat([pq.read_table(f).to_pandas() for f in files])
        .sort_values(["conv_id", "bucket_ts"])
        .reset_index(drop=True)
    )


def test_write_resume_idempotent(rolled, tmp_path):
    out = str(tmp_path / "tiers")
    c1 = write_partitioned(rolled, out, "1h", fingerprint="abc", lineage=["x"])
    assert c1 and sum(c1.values()) == rolled.count()
    first = _read_all(os.path.join(out, "tier=1h"))

    # second run with same fingerprint: everything skipped
    c2 = write_partitioned(rolled, out, "1h", fingerprint="abc")
    assert c2 == {}
    second = _read_all(os.path.join(out, "tier=1h"))
    assert first.equals(second)

    # manifests carry lineage + counts
    ms = read_manifests(out, "1h")
    assert {m["date"] for m in ms} == set(c1)
    assert all(m["input_fingerprint"] == "abc" for m in ms)
    assert all(m["lineage"] == ["x"] for m in ms)
    assert sum(m["row_count"] for m in ms) == rolled.count()


def test_changed_fingerprint_invalidates(rolled, tmp_path):
    out = str(tmp_path / "tiers")
    write_partitioned(rolled, out, "1h", fingerprint="v1")
    assert completed_partitions(out, "1h", "v1")
    assert completed_partitions(out, "1h", "v2") == set()
    c2 = write_partitioned(rolled, out, "1h", fingerprint="v2")
    assert c2  # recomputed for the new input


def test_partial_resume(rolled, tmp_path):
    """Simulate an interrupted run: drop one manifest, rerun, only that
    partition is recomputed — and its data files are REPLACED, not
    appended next to the stale ones (crash between write and publish)."""
    out = str(tmp_path / "tiers")
    c1 = write_partitioned(rolled, out, "1h", fingerprint="f")
    victim = sorted(c1)[0]
    os.remove(os.path.join(out, "_manifests", "1h", f"{victim}.json"))
    c2 = write_partitioned(rolled, out, "1h", fingerprint="f")
    assert set(c2) == {victim}
    assert c2[victim] == c1[victim]
    vdir = os.path.join(out, "tier=1h", f"date={victim}")
    n_on_disk = sum(pq.read_table(f).num_rows for f in glob.glob(os.path.join(vdir, "*.parquet")))
    assert n_on_disk == c1[victim]  # no stale rows appended


def test_changed_fingerprint_replaces_files(rolled, tmp_path):
    """A fingerprint change invalidates manifests; the rewrite must not
    append next to the old fingerprint's files."""
    out = str(tmp_path / "tiers")
    c1 = write_partitioned(rolled, out, "1h", fingerprint="v1")
    write_partitioned(rolled, out, "1h", fingerprint="v2")
    total = sum(
        pq.read_table(f).num_rows
        for f in glob.glob(os.path.join(out, "tier=1h", "**", "*.parquet"), recursive=True)
    )
    assert total == sum(c1.values())  # replaced, not doubled


def test_retention(rolled, tmp_path):
    out = str(tmp_path / "tiers")
    write_partitioned(rolled, out, "1h", fingerprint="f")
    dates = sorted(completed_partitions(out, "1h", "f"))
    # pick "now" so that the first date is expired with ttl=7d
    first = dt.date.fromisoformat(dates[0])
    now = first + dt.timedelta(days=8)
    exp = expired_partitions(out, "1h", now, {"1h": 7})
    assert dates[0] in exp
    dropped = apply_retention(out, "1h", now, {"1h": 7})
    assert dates[0] in dropped
    assert not os.path.isdir(os.path.join(out, "tier=1h", f"date={dates[0]}"))
    # tombstoned manifest no longer counts as completed
    assert dates[0] not in completed_partitions(out, "1h", "f")


def test_torn_manifest_ignored(rolled, tmp_path):
    out = str(tmp_path / "tiers")
    write_partitioned(rolled, out, "1h", fingerprint="f")
    mdir = os.path.join(out, "_manifests", "1h")
    name = sorted(os.listdir(mdir))[0]
    with open(os.path.join(mdir, name), "w") as f:
        f.write('{"tier": "1h", "date"')  # torn write
    done = completed_partitions(out, "1h", "f")
    assert dt.date.fromisoformat(name[:-5]) and name[:-5] not in done


# ---------------------------------------------------------- compaction


def test_compaction_reduces_files_preserves_rows(rolled, tmp_path):
    import pandas as pd

    from spectral_time_series_ray.state.manifest import compact_partitions

    out = str(tmp_path / "compact")
    # many blocks -> many small files per date partition
    many = rolled.repartition(12)
    write_partitioned(many, out, "1h", fingerprint="f")
    tier_dir = os.path.join(out, "tier=1h")
    before = _read_all(tier_dir).sort_values(list(_read_all(tier_dir).columns))
    files_before = {
        d: len([f for f in os.listdir(os.path.join(tier_dir, d)) if f.endswith(".parquet")])
        for d in os.listdir(tier_dir) if d.startswith("date=")
    }
    assert any(n > 1 for n in files_before.values())

    res = compact_partitions(out, "1h", target_bytes=1 << 30)
    assert res, "compaction should have rewritten multi-file partitions"
    for date, (nb, na) in res.items():
        assert na < nb and na == 1  # 1 GiB target -> single file

    after = _read_all(tier_dir).sort_values(list(before.columns))
    pd.testing.assert_frame_equal(
        before.reset_index(drop=True)[sorted(before.columns)],
        after.reset_index(drop=True)[sorted(after.columns)],
        check_like=True,
    )
    # manifests carry the compaction record, row_count unchanged
    for m in read_manifests(out, "1h"):
        if m["date"] in res:
            assert m["compaction"]["files_after"] == 1
    # idempotent: second run is a no-op
    assert compact_partitions(out, "1h", target_bytes=1 << 30) == {}


def test_compaction_detects_row_count_corruption(rolled, tmp_path):
    from spectral_time_series_ray.state.manifest import compact_partitions

    out = str(tmp_path / "corrupt")
    write_partitioned(rolled.repartition(6), out, "1h", fingerprint="f")
    tier_dir = os.path.join(out, "tier=1h")
    # delete one data file out from under the manifest
    victim_dir = sorted(
        d for d in os.listdir(tier_dir) if d.startswith("date=")
    )[0]
    victim_files = [
        f for f in os.listdir(os.path.join(tier_dir, victim_dir))
        if f.endswith(".parquet")
    ]
    assert len(victim_files) > 1
    os.remove(os.path.join(tier_dir, victim_dir, victim_files[0]))
    with pytest.raises(RuntimeError, match="row-count mismatch"):
        compact_partitions(out, "1h", target_bytes=1 << 30)


def test_erase_users_empties_whole_partition(ray_session, tmp_path):
    """A key that owns EVERY row of a date partition must remove the
    partition and its manifest outright (regression: zero-row
    write_partitioned was a no-op that left the stale files readable)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from spectral_time_series_ray.state.manifest import erase_users

    ts1 = np.datetime64("2024-03-01T10:00:00", "us")
    ts2 = np.datetime64("2024-03-02T10:00:00", "us")
    df = pd.DataFrame({
        "conv_id": ["victim"] * 4 + ["other"] * 3,
        "bucket_ts": [ts1] * 4 + [ts2] * 3,
        "n_turns": np.int64(1),
    })
    root = str(tmp_path / "store")
    write_partitioned(ray.data.from_pandas(df), root, "1m", fingerprint="x")
    assert len(read_manifests(root, "1m")) == 2

    res = erase_users(root, "1m", {"victim"}, key="conv_id", fingerprint="e")
    assert res == {"2024-03-01": (4, 0)}
    # partition dir and manifest are gone; the other date is untouched
    assert not os.path.isdir(os.path.join(root, "tier=1m", "date=2024-03-01"))
    mans = read_manifests(root, "1m")
    assert [m["date"] for m in mans] == ["2024-03-02"]
    left = _read_all(os.path.join(root, "tier=1m"))
    assert set(left["conv_id"]) == {"other"} and len(left) == 3


def test_compaction_finishes_interrupted_swap(rolled, tmp_path):
    """Crash between ``rmtree(pdir)`` and ``rename(staging)`` leaves a
    completed staging dir and no live partition; the next run must
    finish the rename before compacting, and the data must be intact."""
    import shutil

    import pandas as pd

    from spectral_time_series_ray.state.manifest import compact_partitions

    out = str(tmp_path / "crash")
    write_partitioned(rolled.repartition(6), out, "1h", fingerprint="f")
    tier_dir = os.path.join(out, "tier=1h")
    before = _read_all(tier_dir)

    # simulate the crash on one date: staging = fully-written copy of
    # the partition, live dir gone
    dates = sorted(d for d in os.listdir(tier_dir) if d.startswith("date="))
    victim = os.path.join(tier_dir, dates[0])
    staging = victim + ".compact-deadbeef"
    shutil.copytree(victim, staging)
    shutil.rmtree(victim)
    assert not os.path.isdir(victim)

    res = compact_partitions(out, "1h", target_bytes=1 << 30)
    # the victim partition is back and the whole tier reads identically
    assert os.path.isdir(victim)
    assert not os.path.isdir(staging)
    after = _read_all(tier_dir)
    pd.testing.assert_frame_equal(
        before.reset_index(drop=True)[sorted(before.columns)],
        after.reset_index(drop=True)[sorted(after.columns)],
        check_like=True,
    )
    # and normal compaction still happened where needed
    for date, (nb, na) in res.items():
        assert na <= nb

    # crash BEFORE rmtree: staging alongside a LIVE partition — the
    # live data is complete, so the stale staging must be discarded
    victim2 = victim  # restored above; now crash the other way
    staging2 = victim2 + ".compact-cafebabe"
    before2 = _read_all(tier_dir)  # baseline BEFORE the stray staging copy
    shutil.copytree(victim2, staging2)
    compact_partitions(out, "1h", target_bytes=1 << 30)
    assert not os.path.isdir(staging2) and os.path.isdir(victim2)
    after2 = _read_all(tier_dir)
    pd.testing.assert_frame_equal(
        before2.reset_index(drop=True)[sorted(before2.columns)],
        after2.reset_index(drop=True)[sorted(after2.columns)],
        check_like=True,
    )
