"""KLL quantile sketch: certificate validity, merge algebra,
serialization, and the Ray stage."""

import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.functions.kll import KLL


def _exact_rank(xs_sorted: np.ndarray, q: float) -> float:
    return (np.searchsorted(xs_sorted, q, "left")
            + np.searchsorted(xs_sorted, q, "right")) / 2.0


def test_small_input_is_exact():
    x = np.array([5.0, 1.0, 3.0, 2.0, 4.0])
    s = KLL(k=64).add(x)
    assert s.err_bound == 0  # no compaction happened
    assert s.n == 5
    assert s.rank(3.0) == 3
    assert s.quantile(0.5) == 3.0
    assert s.quantile(0.0) == 1.0
    assert s.quantile(1.0) == 5.0


def test_certificate_holds_for_all_queries():
    rng = np.random.default_rng(1)
    x = rng.lognormal(3, 1, 100_000)
    s = KLL(k=128, seed=7)
    for i in range(0, len(x), 2048):
        s.add(x[i:i + 2048])
    assert s.n == len(x)
    assert s.err_bound > 0
    xs = np.sort(x)
    for q in np.concatenate([rng.choice(x, 40), [0.0, 1e12]]):
        est = s.rank(q)
        true = int((x <= q).sum())
        assert abs(est - true) <= s.err_bound
    for p in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = s.quantile(p)
        assert abs(_exact_rank(xs, est) - p * len(x)) <= s.err_bound


def test_merge_conserves_n_and_adds_bounds():
    rng = np.random.default_rng(2)
    x = rng.normal(size=50_000)
    parts = [KLL(k=128, seed=i).add(x[i::8]) for i in range(8)]
    acc = KLL(k=128, seed=99)
    for p in parts:
        acc.merge(p)
    assert acc.n == len(x)
    assert acc.err_bound <= sum(p.err_bound for p in parts) + acc.err_bound
    xs = np.sort(x)
    for p in (0.1, 0.5, 0.9):
        est = acc.quantile(p)
        assert abs(_exact_rank(xs, est) - p * len(x)) <= acc.err_bound


def test_same_stream_is_deterministic():
    rng = np.random.default_rng(3)
    x = rng.normal(size=30_000)
    a = KLL(k=128, seed=5).add(x)
    b = KLL(k=128, seed=5).add(x)
    assert a.err_bound == b.err_bound
    assert all(np.array_equal(u, v) for u, v in zip(a.levels, b.levels))


def test_serialization_roundtrip():
    rng = np.random.default_rng(4)
    s = KLL(k=64, seed=11).add(rng.normal(size=20_000))
    r = KLL.from_bytes(s.to_bytes())
    assert r.n == s.n and r.err_bound == s.err_bound and r.k == s.k
    assert len(r.levels) == len(s.levels)
    assert all(np.array_equal(u, v) for u, v in zip(r.levels, s.levels))
    # and it keeps working after deserialization
    r.add(rng.normal(size=5_000))
    assert r.n == s.n + 5_000


def test_nan_ignored_and_empty():
    s = KLL(k=64)
    s.add(np.array([np.nan, 1.0, np.nan, 2.0]))
    assert s.n == 2
    assert np.isnan(KLL(k=64).quantile(0.5))
    with pytest.raises(ValueError):
        KLL(k=4)


def test_space_stays_bounded():
    rng = np.random.default_rng(5)
    s = KLL(k=128)
    for i in range(50):
        s.add(rng.normal(size=10_000))
    total = sum(len(b) for b in s.levels)
    # O(k) space: sum of geometric capacities ~ 3k, plus slack
    assert total <= 6 * s.k


def test_quantile_kll_stage(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.distinct import quantile_kll

    rng = np.random.default_rng(6)
    df = pd.DataFrame({
        "grp": np.repeat(["a", "b"], 20_000),
        "value": np.concatenate([
            rng.normal(100, 10, 20_000), rng.lognormal(2, 1, 20_000)
        ]),
    })
    ds = ray.data.from_pandas(df).repartition(8)
    out = quantile_kll(ds, "grp", "value", quantiles=(0.5, 0.99)).to_pandas()
    out = out.set_index("grp")
    assert set(out.index) == {"a", "b"}
    for grp in ("a", "b"):
        sub = np.sort(df[df["grp"] == grp]["value"].to_numpy())
        assert out.loc[grp, "n"] == len(sub)
        bound = out.loc[grp, "rank_err_bound"]
        assert 0 < bound < 0.2
        for p in (0.5, 0.99):
            est = out.loc[grp, f"q{int(p * 100)}_approx"]
            err = abs(_exact_rank(sub, est) / len(sub) - p)
            assert err <= bound
