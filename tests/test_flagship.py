"""End-to-end flagship pipeline incl. persisted tiers + resume."""

import glob
import os

import pytest

from spectral_time_series_ray.pipelines.flagship import run_flagship
from spectral_time_series_ray.state.manifest import read_manifests


@pytest.mark.usefixtures("ray_session")
def test_flagship_end_to_end(tmp_path):
    out = str(tmp_path / "out")
    res = run_flagship("/root/testdata/sf0.001", out_root=out, spectral=True)

    m1 = res["rollup_1m"].to_pandas()
    assert len(m1) > 0
    assert {"p50_latency", "p99_latency", "mean_text_len"} <= set(m1.columns)

    # tiers persisted, partitioned by date, with manifests
    for tier in ("1m", "1h", "1d"):
        files = glob.glob(os.path.join(out, f"tier={tier}", "date=*", "*.parquet"))
        assert files, tier
        ms = read_manifests(out, tier)
        assert ms and all(m["row_count"] > 0 for m in ms)
        assert all(m["lineage"] for m in ms)

    enc = res["gorilla"].to_pandas()
    assert (enc["bytes_per_point"] > 0).all()
    spec = res["spectral"].to_pandas()
    assert len(spec) == len(enc)

    # resume: a second run skips every completed partition (under the
    # schema-salted fingerprint run_flagship writes)
    from spectral_time_series_ray.pipelines.flagship import flagship_fingerprint
    from spectral_time_series_ray.state.manifest import completed_partitions

    fp = flagship_fingerprint("/root/testdata/sf0.001")
    done_before = completed_partitions(out, "1m", fp)
    assert done_before
    run_flagship("/root/testdata/sf0.001", out_root=out, spectral=False)
    assert completed_partitions(out, "1m", fp) == done_before
