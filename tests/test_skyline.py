"""Skyline / Pareto-front aggregate: kernel vs brute force, the
merge-of-fronts algebraic property, and the distributed stage."""

import numpy as np
import pandas as pd

from spectral_time_series_ray.stages.skyline import pareto_mask


def _brute(x, y):
    n = len(x)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if (x[j] >= x[i] and y[j] >= y[i]
                    and (x[j] > x[i] or y[j] > y[i])):
                keep[i] = False
                break
    return keep


def test_kernel_matches_brute_force_with_ties():
    rng = np.random.default_rng(11)
    for trial in range(20):
        n = rng.integers(1, 120)
        # coarse grid -> plenty of exact ties and duplicate points
        x = rng.integers(0, 8, n).astype(np.float64)
        y = rng.integers(0, 8, n).astype(np.float64)
        got = pareto_mask(x, y)
        exp = _brute(x, y)
        assert (got == exp).all(), (trial, x, y)


def test_kernel_edges():
    assert pareto_mask(np.array([]), np.array([])).tolist() == []
    assert pareto_mask(np.array([1.0]), np.array([2.0])).tolist() == [True]
    # exact duplicates never dominate each other: all kept
    x = np.array([3.0, 3.0, 1.0])
    y = np.array([5.0, 5.0, 9.0])
    assert pareto_mask(x, y).tolist() == [True, True, True]
    # strict dominance on one axis, tie on the other: dominated
    x = np.array([3.0, 3.0])
    y = np.array([5.0, 4.0])
    assert pareto_mask(x, y).tolist() == [True, False]


def test_front_of_fronts_is_front_of_union():
    rng = np.random.default_rng(23)
    for _ in range(10):
        xa, ya = rng.integers(0, 20, 60).astype(float), rng.integers(0, 20, 60).astype(float)
        xb, yb = rng.integers(0, 20, 60).astype(float), rng.integers(0, 20, 60).astype(float)
        ka, kb = pareto_mask(xa, ya), pareto_mask(xb, yb)
        xu = np.concatenate([xa[ka], xb[kb]])
        yu = np.concatenate([ya[ka], yb[kb]])
        km = pareto_mask(xu, yu)
        merged = sorted(zip(xu[km], yu[km]))
        x_all = np.concatenate([xa, xb])
        y_all = np.concatenate([ya, yb])
        kd = pareto_mask(x_all, y_all)
        direct = sorted(zip(x_all[kd], y_all[kd]))
        assert merged == direct


def test_stage_distributed_vs_single_pass(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.skyline import pareto_front

    rng = np.random.default_rng(31)
    n = 4000
    df = pd.DataFrame({
        "grp": rng.choice(["a", "b", "c"], n),
        "id": np.arange(n, dtype=np.int64),
        "x": rng.integers(0, 50, n).astype(np.float64),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10_000, n), unit="m"),
    })
    # many blocks so groups split across batches
    ds = ray.data.from_pandas(df).repartition(13)
    got = (
        pareto_front(ds, "grp", "x", "ts", num_partitions=4)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    exp_rows = []
    for g, sub in df.groupby("grp"):
        y = sub["ts"].to_numpy().astype("datetime64[us]").astype(np.int64).astype(float)
        keep = pareto_mask(sub["x"].to_numpy(), y)
        exp_rows.append(sub[keep])
    exp = pd.concat(exp_rows).sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["grp", "id", "x", "ts"]], exp[["grp", "id", "x", "ts"]]
    )
