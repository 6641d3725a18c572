"""snapshot_diff: added/removed/changed classification + zero-IO
pruning of byte-identical partitions."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def tier(tmp_path, ray_session):
    import ray.data

    from spectral_time_series_ray.state.snapshots import commit_snapshot

    root = str(tmp_path)
    v1 = pd.DataFrame({
        "conv_id": ["a", "b", "c", "d"],
        "bucket_ts": pd.to_datetime(
            ["2024-01-01", "2024-01-01", "2024-01-02", "2024-01-03"]
        ).astype("datetime64[us]"),
        "n_turns": np.array([1, 2, 3, 4], np.int64),
    })
    # v2: 'a' unchanged, 'b' changed, 'c' removed, 'e' added (same date
    # as c so date 01-02 is rewritten), date 01-03 byte-identical is
    # impossible through commit_snapshot (full rewrite) — so build v2
    # with d unchanged too and assert classification only
    v2 = pd.DataFrame({
        "conv_id": ["a", "b", "e", "d"],
        "bucket_ts": pd.to_datetime(
            ["2024-01-01", "2024-01-01", "2024-01-02", "2024-01-03"]
        ).astype("datetime64[us]"),
        "n_turns": np.array([1, 99, 7, 4], np.int64),
    })
    commit_snapshot(ray.data.from_pandas(v1), root, "t")
    commit_snapshot(ray.data.from_pandas(v2), root, "t")
    return root


def test_diff_classification(tier):
    from spectral_time_series_ray.state.snapshots import snapshot_diff

    changes, rep = snapshot_diff(
        tier, "t", 1, 2, key_cols=["conv_id"], value_cols=["n_turns"])
    df = changes.to_pandas()
    by = {r["conv_id"]: r["change_type"] for _, r in df.iterrows()}
    assert by == {"b": "changed", "c": "removed", "e": "added"}
    assert (rep["added"], rep["removed"], rep["changed"]) == (1, 1, 1)
    b = df[df["conv_id"] == "b"].iloc[0]
    assert (b["old_n_turns"], b["new_n_turns"]) == (2.0, 99.0)


def test_diff_prunes_identical_partitions(tier, ray_session):
    import ray.data

    from spectral_time_series_ray.state.snapshots import (
        snapshot_diff,
        snapshot_meta,
        upsert_snapshot,
    )

    # v3 = upsert touching only 2024-01-01: every other date keeps its
    # file references, so the diff must skip them with zero reads
    late = pd.DataFrame({
        "conv_id": ["a"],
        "bucket_ts": pd.to_datetime(["2024-01-01"]).astype("datetime64[us]"),
        "n_turns": np.array([10], np.int64),
    })

    def merge(df):
        g = df.groupby(["conv_id", "bucket_ts"], as_index=False)["n_turns"].sum()
        g["n_turns"] = g["n_turns"].astype(np.int64)
        return g

    upsert_snapshot(ray.data.from_pandas(late), tier, "t", merge)
    m2 = snapshot_meta(tier, "t", 2)
    m3 = snapshot_meta(tier, "t", 3)
    assert m2["partitions"]["2024-01-02"] == m3["partitions"]["2024-01-02"]
    changes, rep = snapshot_diff(
        tier, "t", 2, 3, key_cols=["conv_id"], value_cols=["n_turns"])
    assert rep["dates_compared"] == ["2024-01-01"]
    assert set(rep["dates_skipped"]) == {"2024-01-02", "2024-01-03"}
    df = changes.to_pandas()
    assert len(df) == 1 and df["conv_id"].iloc[0] == "a"
    assert df["new_n_turns"].iloc[0] == 11.0
    # self-diff: everything skipped
    _, rep0 = snapshot_diff(tier, "t", 3, 3,
                            key_cols=["conv_id"], value_cols=["n_turns"])
    assert not rep0["dates_compared"]
    assert rep0["added"] == rep0["removed"] == rep0["changed"] == 0
