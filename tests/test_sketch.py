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


# ---------------------------------------------------------------- t-digest

def test_tdigest_accuracy_uniform_and_normal():
    from spectral_time_series_ray.functions.tdigest import TDigest

    rng = np.random.default_rng(0)
    for data in (rng.uniform(0, 1, 50_000), rng.normal(0, 1, 50_000),
                 rng.lognormal(0, 2, 50_000)):
        d = TDigest(delta=100).add(data)
        v = np.sort(data)
        for p in (0.01, 0.25, 0.5, 0.75, 0.99):
            est = d.quantile(p)
            r = (np.searchsorted(v, est, "left") + np.searchsorted(v, est, "right")) / 2
            assert abs(r / len(v) - p) < 0.01, (p, est)


def test_tdigest_merge_equals_union_bound():
    """Digest-of-union and merge-of-digests both stay within the rank
    bound (mergeability — the property that makes partials shuffle-safe)."""
    from spectral_time_series_ray.functions.tdigest import TDigest

    rng = np.random.default_rng(1)
    parts = [rng.normal(i, 1 + i, 10_000) for i in range(4)]
    allv = np.sort(np.concatenate(parts))
    merged = TDigest(delta=100)
    for p_ in parts:
        merged.merge(TDigest(delta=100).add(p_))
    assert merged.n == len(allv)
    for p in (0.05, 0.5, 0.95):
        est = merged.quantile(p)
        r = (np.searchsorted(allv, est, "left") + np.searchsorted(allv, est, "right")) / 2
        assert abs(r / len(allv) - p) < 0.015, p


def test_tdigest_serialization_roundtrip():
    from spectral_time_series_ray.functions.tdigest import TDigest

    rng = np.random.default_rng(2)
    d = TDigest(delta=64).add(rng.uniform(-5, 5, 5000))
    d2 = TDigest.from_bytes(d.to_bytes())
    assert d2.n == d.n and d2.delta == d.delta
    for p in (0.1, 0.5, 0.9):
        assert d2.quantile(p) == d.quantile(p)
    # serialized size is fixed-order: O(delta), not O(n)
    assert len(d.to_bytes()) < 64 * 2 * 8 * 4


def test_tdigest_edge_cases():
    from spectral_time_series_ray.functions.tdigest import TDigest

    assert np.isnan(TDigest().quantile(0.5))
    d = TDigest().add([7.0])
    assert d.quantile(0.0) == d.quantile(1.0) == 7.0
    d2 = TDigest().add([np.nan, 1.0, np.nan, 3.0])
    assert d2.n == 2 and 1.0 <= d2.quantile(0.5) <= 3.0


def test_quantile_tdigest_stage(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.distinct import quantile_tdigest

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {"k": np.repeat(["a", "b"], 20_000),
         "v": np.concatenate([rng.normal(10, 2, 20_000), rng.lognormal(1, 1, 20_000)])}
    )
    ds = ray.data.from_pandas(df).repartition(8)
    out = quantile_tdigest(ds, "k", "v").to_pandas().set_index("k")
    for k, sub in df.groupby("k"):
        v = np.sort(sub["v"].to_numpy())
        for p in (0.5, 0.99):
            est = out.loc[k, f"q{int(p*100)}_approx"]
            r = (np.searchsorted(v, est, "left") + np.searchsorted(v, est, "right")) / 2
            assert abs(r / len(v) - p) < 0.015, (k, p)
        assert out.loc[k, "n"] == len(sub)


# ---------------------------------------------------------------- bloom

def test_bloom_no_false_negatives_and_low_fp():
    from spectral_time_series_ray.functions.bloom import BloomFilter, hash_u64

    rng = np.random.default_rng(0)
    members = rng.integers(0, 1 << 60, 20_000)
    bf = BloomFilter(n_bits=1 << 18, k=5).add_hashes(hash_u64(members))
    # no false negatives, ever
    assert bf.contains_hashes(hash_u64(members)).all()
    others = rng.integers(0, 1 << 60, 20_000)
    others = np.setdiff1d(others, members)
    fp = bf.contains_hashes(hash_u64(others)).mean()
    # m/n ~ 13 bits/key, k=5 -> theoretical fp ~ 1.5%; allow 3x
    assert fp < 0.05, fp


def test_bloom_merge_and_serialization():
    from spectral_time_series_ray.functions.bloom import BloomFilter, hash_u64

    a = BloomFilter(n_bits=1 << 12).add_hashes(hash_u64(np.arange(100)))
    b = BloomFilter(n_bits=1 << 12).add_hashes(hash_u64(np.arange(100, 200)))
    a.merge(b)
    assert a.contains_hashes(hash_u64(np.arange(200))).all()
    c = BloomFilter.from_bytes(a.to_bytes())
    assert (c.bits == a.bits).all()
    import pytest as _pt
    with _pt.raises(ValueError):
        a.merge(BloomFilter(n_bits=1 << 13))


def test_bloom_semi_filter_stage(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.join import bloom_semi_filter, build_bloom

    left = ray.data.from_pandas(pd.DataFrame({"k": np.arange(0, 1000, 2)}))  # evens
    right = ray.data.from_pandas(
        pd.DataFrame({"k": np.arange(1000), "v": np.arange(1000)})
    ).repartition(4)
    bloom = build_bloom(left, "k", n_bits=1 << 14)
    out = bloom_semi_filter(right, "k", bloom).to_pandas()
    kept = set(out["k"])
    # every true member survives (no false negatives)
    assert set(range(0, 1000, 2)) <= kept
    # most non-members dropped (false positives only)
    assert len(kept) < 650


# ----------------------------------------------------------- misra-gries

def test_misra_gries_guarantees():
    from spectral_time_series_ray.functions.heavy import mg_merge, mg_summarize

    rng = np.random.default_rng(0)
    # zipf stream: few heavy items, long tail
    stream = rng.zipf(1.5, 100_000) % 10_000
    vals, true_counts = np.unique(stream, return_counts=True)
    truth = dict(zip(vals.tolist(), true_counts.tolist()))
    k = 50
    n = len(stream)
    s = mg_summarize(stream, k)
    assert len(s) <= k
    for item, c in s.items():
        assert 0 < c <= truth[item]              # never overcount
        assert truth[item] - c <= n / k          # undercount bound
    for item, c in truth.items():
        if c > n / k:
            assert item in s, item               # heavy items survive


def test_misra_gries_merge_bound():
    from spectral_time_series_ray.functions.heavy import mg_merge, mg_summarize

    rng = np.random.default_rng(1)
    parts = [rng.zipf(1.5, 25_000) % 5_000 for _ in range(4)]
    allv = np.concatenate(parts)
    vals, cts = np.unique(allv, return_counts=True)
    truth = dict(zip(vals.tolist(), cts.tolist()))
    k, n = 50, len(allv)
    merged = mg_merge([mg_summarize(p, k) for p in parts], k)
    assert len(merged) <= k
    for item, c in merged.items():
        assert truth[item] - c <= n / k and c <= truth[item]
    for item, c in truth.items():
        if c > n / k:
            assert item in merged


def test_heavy_hitters_stage(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.distinct import heavy_hitters

    rng = np.random.default_rng(2)
    vals = np.concatenate([
        np.repeat(np.arange(5), 2000),           # 5 heavy items
        rng.integers(100, 5000, 10_000),         # tail
    ])
    rng.shuffle(vals)
    ds = ray.data.from_pandas(pd.DataFrame({"x": vals})).repartition(6)
    out = heavy_hitters(ds, "x", k=32)
    top = set(out.head(5)["item"])
    assert top == {0, 1, 2, 3, 4}
    n = len(vals)
    truth = pd.Series(vals).value_counts()
    for _, r in out.iterrows():
        assert truth[r["item"]] - r["approx_count"] <= n / 32


class TestKMV:
    def test_exact_below_capacity(self):
        from spectral_time_series_ray.functions.sketch import KMVSketch

        sk = KMVSketch(k=64).add_strings([f"v{i}" for i in range(40)])
        assert sk.estimate() == 40.0 and sk.theta == 1.0
        sk.add_strings([f"v{i}" for i in range(40)])  # duplicates ignored
        assert sk.estimate() == 40.0

    def test_estimate_accuracy_and_merge(self):
        from spectral_time_series_ray.functions.sketch import KMVSketch

        n, k = 20000, 512
        items = [f"item-{i}" for i in range(n)]
        whole = KMVSketch(k=k).add_strings(items)
        est = whole.estimate()
        assert abs(est - n) / n < 4 / np.sqrt(k)  # 4-sigma KMV bound

        # merge of shard sketches == sketch of the union stream
        parts = [KMVSketch(k=k).add_strings(items[i::7]) for i in range(7)]
        acc = parts[0]
        for p in parts[1:]:
            acc.merge(p)
        assert np.array_equal(acc.values, whole.values)

    def test_intersection_and_jaccard(self):
        from spectral_time_series_ray.functions.sketch import KMVSketch

        k = 512
        a_items = [f"x{i}" for i in range(12000)]
        b_items = [f"x{i}" for i in range(8000, 20000)]  # overlap 4000
        sa = KMVSketch(k=k).add_strings(a_items)
        sb = KMVSketch(k=k).add_strings(b_items)
        inter = KMVSketch.intersection(sa, sb)
        true_i, true_j = 4000, 4000 / 20000
        assert abs(inter - true_i) / true_i < 0.3
        assert abs(KMVSketch.jaccard(sa, sb) - true_j) < 0.1
        # one sketch below capacity: still consistent
        small = KMVSketch(k=k).add_strings(a_items[:100])
        est = KMVSketch.intersection(small, sa)
        assert abs(est - 100) / 100 < 0.5

    def test_serialization_roundtrip(self):
        from spectral_time_series_ray.functions.sketch import KMVSketch

        sk = KMVSketch(k=128).add_strings([f"q{i}" for i in range(500)])
        back = KMVSketch.from_bytes(sk.to_bytes())
        assert back.k == sk.k and np.array_equal(back.values, sk.values)
        assert back.estimate() == sk.estimate()
