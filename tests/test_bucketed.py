"""Bucketed layout + shuffle-free aligned-bucket join vs pandas merge."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def two_tables(tmp_path, ray_session):
    import ray.data

    from spectral_time_series_ray.state.bucketed import write_bucketed

    rng = np.random.default_rng(3)
    left = pd.DataFrame({
        "k": rng.integers(0, 50, 300).astype(np.int64),
        "a": rng.normal(size=300),
    })
    right = pd.DataFrame({
        "k": rng.integers(25, 80, 200).astype(np.int64),  # partial overlap
        "b": rng.integers(0, 9, 200).astype(np.int64),
    })
    lroot, rroot = str(tmp_path / "L"), str(tmp_path / "R")
    ml = write_bucketed(ray.data.from_pandas(left), "k", 8, lroot)
    mr = write_bucketed(ray.data.from_pandas(right), "k", 8, rroot)
    assert ml["n_rows"] == 300 and mr["n_rows"] == 200
    return left, right, lroot, rroot


def _sorted(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("how", ["inner", "left_outer", "semi", "anti"])
def test_bucketed_join_matches_pandas(two_tables, how):
    from spectral_time_series_ray.state.bucketed import bucketed_join

    left, right, lroot, rroot = two_tables
    got = bucketed_join(lroot, rroot, how=how).to_pandas()
    if how == "inner":
        exp = left.merge(right, on="k", how="inner")
    elif how == "left_outer":
        exp = left.merge(right, on="k", how="left")
    elif how == "semi":
        exp = left[left["k"].isin(set(right["k"]))]
    else:
        exp = left[~left["k"].isin(set(right["k"]))]
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        _sorted(got[exp.columns.tolist()]), _sorted(exp), check_dtype=False
    )


def test_bucketed_join_rejects_mismatched_layouts(tmp_path, ray_session):
    import ray.data

    from spectral_time_series_ray.state.bucketed import bucketed_join, write_bucketed

    df = pd.DataFrame({"k": np.arange(10, dtype=np.int64)})
    a, b = str(tmp_path / "A"), str(tmp_path / "B")
    write_bucketed(ray.data.from_pandas(df), "k", 4, a)
    write_bucketed(ray.data.from_pandas(df), "k", 8, b)
    with pytest.raises(ValueError, match="incompatible"):
        bucketed_join(a, b)


def test_write_bucketed_rejects_float_keys(tmp_path, ray_session):
    import ray.data

    from spectral_time_series_ray.state.bucketed import write_bucketed

    df = pd.DataFrame({"k": np.arange(10, dtype=np.float64)})
    with pytest.raises(TypeError):
        write_bucketed(ray.data.from_pandas(df), "k", 4, str(tmp_path / "F"))
