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
