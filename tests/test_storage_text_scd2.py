"""Round-3 part-9 operators: zone maps, bucketed point lookup,
multi-pattern phrase matching, SCD2 interval build."""

import numpy as np
import pandas as pd
import pytest


def test_zonemap_build_and_prune(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spectral_time_series_ray.state.zonemap import build_zonemap, prune_files

    # four files with disjoint increasing ranges
    for i in range(4):
        t = pa.table({"k": pa.array(np.arange(i * 100, (i + 1) * 100, dtype=np.int64)),
                      "v": pa.array(np.ones(100))})
        pq.write_table(t, str(tmp_path / f"f{i}.parquet"))
    zm = build_zonemap(str(tmp_path / "*.parquet"), "k")
    assert len(zm) == 4 and zm["n_rows"].sum() == 400
    assert zm["min"].tolist() == [0, 100, 200, 300]
    assert zm["max"].tolist() == [99, 199, 299, 399]
    # range [150, 250) overlaps exactly files 1 and 2
    keep = prune_files(zm, 150, 250)
    assert [p.endswith(("f1.parquet", "f2.parquet")) for p in keep] == [True, True]
    # empty range below all data
    assert prune_files(zm, -10, 0) == []
    # stats-less file is never pruned
    zm.loc[0, ["min", "max"]] = [None, None]
    assert any(p.endswith("f0.parquet") for p in prune_files(zm, 390, 400))


def test_bucketed_lookup_matches_filter(tmp_path, ray_session):
    import ray.data

    from spectral_time_series_ray.state.bucketed import bucketed_lookup, write_bucketed

    rng = np.random.default_rng(9)
    df = pd.DataFrame({"k": np.arange(500, dtype=np.int64),
                       "x": rng.normal(size=500)})
    root = str(tmp_path / "T")
    write_bucketed(ray.data.from_pandas(df), "k", 16, root)
    keys = [3, 77, 499, 10_000]  # last one absent
    got = bucketed_lookup(root, keys).sort_values("k").reset_index(drop=True)
    exp = df[df["k"].isin(keys)].sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_phrase_matcher_counts():
    from spectral_time_series_ray.stages.text import PhraseMatcher

    m = PhraseMatcher(("ab ab", "cd"))
    out = m(pd.DataFrame({"text": ["ab ab ab cd", "zz", "cd cd ab ab"]}))
    row = out.set_index("phrase")
    # "ab ab ab" contains ONE non-overlapping "ab ab" (re semantics)
    assert row.loc["ab ab", "n_docs"] == 2 and row.loc["ab ab", "n_matches"] == 2
    assert row.loc["cd", "n_docs"] == 2 and row.loc["cd", "n_matches"] == 3


def _pandas_scd2(df):
    out = []
    far = pd.Timestamp("9999-12-31")
    for uid, g in df.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        prev = None
        rows = []
        for r in g.itertuples():
            if prev is None or r.event_type != prev:
                rows.append({"user_id": uid, "state": r.event_type,
                             "valid_from": r.ts})
            prev = r.event_type
        for i, row in enumerate(rows):
            row["valid_to"] = rows[i + 1]["valid_from"] if i + 1 < len(rows) else far
        out += rows
    return pd.DataFrame(out)


def test_scd2_intervals_matches_pandas(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.olap import scd2_intervals

    rng = np.random.default_rng(21)
    n = 600
    df = pd.DataFrame({
        "user_id": rng.integers(0, 20, n).astype(np.int64),
        "event_type": rng.choice(["a", "b", "c"], n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64),
    })
    df["ts"] = df["ts"].astype("datetime64[us]")
    got = (
        scd2_intervals(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values(["user_id", "valid_from"])
        .reset_index(drop=True)
    )
    exp = _pandas_scd2(df).sort_values(["user_id", "valid_from"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["user_id"].to_numpy() == exp["user_id"].to_numpy()).all()
    assert (got["state"].to_numpy() == exp["state"].to_numpy()).all()
    assert (got["valid_from"].to_numpy() == exp["valid_from"].to_numpy(dtype="datetime64[us]")).all()
    assert (got["valid_to"].to_numpy() == exp["valid_to"].to_numpy(dtype="datetime64[us]")).all()
