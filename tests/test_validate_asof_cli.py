import json
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.stages.join import asof_join
from spectral_time_series_ray.stages.validate import (
    check_schema,
    dedup_turns,
    validate_transcripts,
)


def test_validate_drops_bad_rows(ray_session):
    import pyarrow as pa
    import ray.data

    t = pa.table(
        {
            "conv_id": pa.array(["a", None, "", "b", "b"], pa.string()),
            "turn_idx": pa.array([0, 1, 2, -1, 0], pa.int32()),
            "ts": pa.array(
                [1, 2, 3, 4, None], pa.timestamp("us")
            ),
            "text": pa.array(["x", "y", "z", "w", None], pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    out = validate_transcripts(ds).to_pandas()
    # survivors: only row 0 ("a",0,ts ok); "b" rows have turn<0 / null ts
    assert len(out) == 1 and out["conv_id"].iloc[0] == "a"


def test_validate_schema_errors(ray_session):
    import ray.data

    ds = ray.data.from_pandas(pd.DataFrame({"conv_id": ["a"], "turn_idx": [1]}))
    with pytest.raises(ValueError, match="missing required"):
        check_schema(ds)


def test_dedup_turns():
    df = pd.DataFrame(
        {
            "conv_id": ["c"] * 4,
            "turn_idx": [0, 1, 1, 2],
            "ts": pd.to_datetime([10, 20, 15, 30], unit="s"),
            "text": ["a", "late", "early", "d"],
        }
    )
    out = dedup_turns(df)
    assert list(out["turn_idx"]) == [0, 1, 2]
    assert out[out["turn_idx"] == 1]["text"].iloc[0] == "early"  # first by ts


def test_asof_join_semantics(ray_session):
    import ray.data

    left = ray.data.from_pandas(pd.DataFrame({
        "k": ["u", "u", "v"],
        "ts": pd.to_datetime([100, 200, 100], unit="s"),
        "lv": [1, 2, 3],
    }))
    right = ray.data.from_pandas(pd.DataFrame({
        "k": ["u", "u", "v"],
        "ts": pd.to_datetime([90, 150, 300], unit="s"),
        "rv": [10.0, 20.0, 30.0],
    }))
    out = asof_join(left, right, key="k", ts_col="ts").to_pandas().sort_values(["k", "ts"])
    u = out[out["k"] == "u"]
    np.testing.assert_array_equal(u["rv"].to_numpy(), [10.0, 20.0])  # backward matches
    v = out[out["k"] == "v"]
    assert np.isnan(v["rv"].iloc[0])  # right row is later -> no match


def test_cli_run_and_retention(tmp_path):
    out = str(tmp_path / "cli_out")
    r = subprocess.run(
        [sys.executable, "-m", "spectral_time_series_ray", "run",
         "--sf-dir", "/root/testdata/sf0.001", "--out", out, "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["tiers"]["1m"]["rows"] > 0

    r2 = subprocess.run(
        [sys.executable, "-m", "spectral_time_series_ray", "retention",
         "--out", out, "--tier", "1m", "--ttl-days", "0", "--now", "2030-01-01", "--dry-run"],
        capture_output=True, text=True, cwd="/root/repo", timeout=60,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    ret = json.loads(r2.stdout.strip().splitlines()[-1])
    assert ret["dropped"]  # everything is past TTL by 2030


def test_range_join_aggregate(ray_session):
    """Band-join counts/sums match a brute-force per-pair reference for
    symmetric, future-only, and past-only windows (the segment-offset
    searchsorted must never let a window cross into a neighboring
    key's rows)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from spectral_time_series_ray.stages.join import range_join_aggregate

    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 8, n).astype(np.int64),
            "ts": pd.to_datetime("2026-01-01")
            + pd.to_timedelta(rng.integers(0, 7200, n), unit="s"),
            "value": np.round(rng.uniform(0, 20, n), 2),
        }
    )

    def brute(lo_s, hi_s):
        t = df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        cnt = np.zeros(n, dtype=np.int64)
        sm = np.zeros(n)
        for i in range(n):
            m = (
                (df["user_id"].to_numpy() == df["user_id"].iloc[i])
                & (t >= t[i] + lo_s * 1_000_000)
                & (t <= t[i] + hi_s * 1_000_000)
            )
            cnt[i] = m.sum()
            sm[i] = np.round(df["value"].to_numpy()[m] * 100).astype(np.int64).sum() / 100
        return cnt, sm

    ds = ray.data.from_pandas(df)
    for lo_s, hi_s in ((-600, 600), (10, 900), (-900, -10)):
        out = (
            range_join_aggregate(
                ds, key="user_id", lo_s=float(lo_s), hi_s=float(hi_s),
                num_partitions=3,
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        cnt, sm = brute(lo_s, hi_s)
        assert (out["n_in_window"].to_numpy() == cnt).all(), (lo_s, hi_s)
        assert np.allclose(out["sum_in_window"].to_numpy(), sm), (lo_s, hi_s)


def test_orphan_key_count_planted(ray_session):
    """Planted orphans are counted exactly; zero-orphan case returns 0
    (Bloom certain-rejects never exceed the exact count)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from spectral_time_series_ray.stages.validate import orphan_key_count

    parent = ray.data.from_pandas(pd.DataFrame({"pk": np.arange(1000)}))
    # child: 3000 valid refs + 37 orphans pointing past the parent range
    rng = np.random.default_rng(0)
    child_keys = np.concatenate([
        rng.integers(0, 1000, 3000),
        rng.integers(5000, 6000, 37),
    ])
    child = ray.data.from_pandas(pd.DataFrame({"fk": child_keys})).repartition(4)
    n_child, n_orph = orphan_key_count(child, parent, "fk", "pk")
    assert n_child == 3037 and n_orph == 37
    clean = ray.data.from_pandas(pd.DataFrame({"fk": rng.integers(0, 1000, 500)}))
    n_child2, n_orph2 = orphan_key_count(clean, parent, "fk", "pk")
    assert n_child2 == 500 and n_orph2 == 0


# ------------------------------------------------ interval overlap join


def test_interval_overlap_join_matches_pandas(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.join import interval_overlap_join

    rng = np.random.default_rng(12)
    # right: per-key DISJOINT sorted intervals (the documented contract)
    rrows = []
    for k in range(8):
        t = 0
        for i in range(rng.integers(1, 10)):
            t += int(rng.integers(5, 50))
            w = int(rng.integers(1, 20))
            rrows.append({"k": k, "start_us": t, "end_us": t + w})
            t += w
    # left: arbitrary (overlapping allowed)
    lrows = [
        {"k": int(rng.integers(0, 10)), "start_us": int(s), "end_us": int(s + rng.integers(0, 60))}
        for s in rng.integers(0, 400, size=120)
    ]
    L, R = pd.DataFrame(lrows), pd.DataFrame(rrows)
    got = interval_overlap_join(
        ray.data.from_pandas(L), ray.data.from_pandas(R), key="k"
    ).to_pandas()
    exp = L.merge(R, on="k", suffixes=("_l", "_r"))
    exp = exp[(exp.start_us_l <= exp.end_us_r) & (exp.start_us_r <= exp.end_us_l)]
    assert len(got) == len(exp)
    key_g = sorted(zip(got["k"], got["l_start_us"], got["r_start_us"]))
    key_e = sorted(zip(exp["k"], exp["start_us_l"], exp["start_us_r"]))
    assert key_g == key_e
    ov = np.minimum(got["l_end_us"], got["r_end_us"]) - np.maximum(
        got["l_start_us"], got["r_start_us"]
    )
    assert (got["overlap_us"] == ov).all()
    assert (got["overlap_us"] >= 0).all()


def test_interval_overlap_join_touching_counts(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.join import interval_overlap_join

    L = pd.DataFrame({"k": [1, 1], "start_us": [0, 100], "end_us": [10, 110]})
    R = pd.DataFrame({"k": [1], "start_us": [10, ], "end_us": [99]})
    got = interval_overlap_join(
        ray.data.from_pandas(L), ray.data.from_pandas(R), key="k"
    ).to_pandas()
    # [0,10] touches [10,99] (overlap 0); [100,110] misses it
    assert len(got) == 1
    assert int(got["overlap_us"].iloc[0]) == 0
    assert int(got["l_start_us"].iloc[0]) == 0


def test_windowed_distinct_count_matches_pandas(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.join import windowed_distinct_count

    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user_id": rng.integers(0, 6, size=n),
            "event_type": rng.choice(list("abcd"), size=n),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(np.sort(rng.integers(0, 86400, size=n)), unit="s"),
        }
    )
    got = (
        windowed_distinct_count(
            ray.data.from_pandas(df), key="user_id", ts_col="ts",
            value_col="event_type", window_s=1800.0,
        )
        .to_pandas()
        .set_index("event_id")["n_distinct"]
    )
    for _, r in df.iterrows():
        w = df[
            (df.user_id == r.user_id)
            & (df.ts >= r.ts - pd.Timedelta(seconds=1800))
            & (df.ts <= r.ts)
        ]
        assert got.loc[r.event_id] == w["event_type"].nunique()
