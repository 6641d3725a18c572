import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.functions.hashing import fnv1a_u64
from spectral_time_series_ray.functions.sketch import HyperLogLog
from spectral_time_series_ray.stages.distinct import distinct_exact, distinct_hll


def test_hll_accuracy():
    for n in (100, 10_000, 200_000):
        hll = HyperLogLog(p=12)
        hll.add_strings([f"item_{i}" for i in range(n)])
        est = hll.estimate()
        assert abs(est - n) / n < 0.05, (n, est)  # ~1.04/sqrt(4096) = 1.6% std


def test_hll_merge_equals_union():
    a, b = HyperLogLog(12), HyperLogLog(12)
    a.add_strings([f"x{i}" for i in range(5000)])
    b.add_strings([f"x{i}" for i in range(2500, 7500)])
    union = HyperLogLog(12).add_strings([f"x{i}" for i in range(7500)])
    a.merge(b)
    assert a.estimate() == union.estimate()  # merge == sketch of union, exactly


def test_hll_serialization_roundtrip():
    h = HyperLogLog(10)
    h.add_strings(["a", "b", "c"])
    h2 = HyperLogLog.from_bytes(h.to_bytes())
    np.testing.assert_array_equal(h.registers, h2.registers)
    assert h2.estimate() == h.estimate()


def test_hll_deterministic():
    h1 = HyperLogLog(12).add_strings([f"k{i}" for i in range(1000)])
    h2 = HyperLogLog(12).add_strings([f"k{i}" for i in range(1000)])
    assert h1.estimate() == h2.estimate()


def test_distinct_stages(ray_session):
    import ray.data

    rng = np.random.default_rng(0)
    df = pd.DataFrame({
        "k": np.repeat(["a", "b"], 20_000),
        "v": np.concatenate([
            rng.integers(0, 1500, 20_000),   # ~1500 distinct
            rng.integers(0, 300, 20_000),    # ~300 distinct
        ]),
    })
    ds = ray.data.from_pandas(df).materialize()
    exact = distinct_exact(ds, "k", "v").to_pandas().set_index("k")["n_distinct"]
    approx = distinct_hll(ds, "k", "v", p=12).to_pandas().set_index("k")["n_distinct_approx"]
    for k in ("a", "b"):
        assert abs(approx[k] - exact[k]) / exact[k] < 0.05, (k, exact[k], approx[k])
