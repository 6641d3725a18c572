"""Matrix profile / spectral residual / DTW kernels and distributed PCA.

Kernels verify against brute-force references; PCA against numpy's
exact eigendecomposition of the full covariance (tiny fixture).
"""
import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.functions.tsanalysis import (
    dtw_distance,
    matrix_profile,
    sliding_mean_std,
    spectral_residual_saliency,
)


def _mp_brute(x, w):
    n = len(x)
    m = n - w + 1
    excl = max(1, w // 2)
    subs = np.lib.stride_tricks.sliding_window_view(x, w).astype(float)
    mu, sd = subs.mean(1), subs.std(1)
    Z = (subs - mu[:, None]) / np.where(sd < 1e-10, 1, sd)[:, None]
    P = np.full(m, np.inf)
    I = np.full(m, -1)
    for i in range(m):
        d = np.sqrt(((Z[i] - Z) ** 2).sum(1))
        flat_i, flat = sd[i] < 1e-10, sd < 1e-10
        d = np.where(flat_i | flat, np.where(flat_i & flat, 0.0, np.sqrt(2 * w)), d)
        lo, hi = max(0, i - excl), min(m, i + excl + 1)
        d[lo:hi] = np.inf
        j = int(np.argmin(d))
        P[i], I[i] = d[j], j
    return P, I


def _dtw_brute(x, y, band=None):
    n, m = len(x), len(y)
    band = band or max(n, m)
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0
    for i in range(1, n + 1):
        for j in range(max(1, i - band), min(m, i + band) + 1):
            c = (x[i - 1] - y[j - 1]) ** 2
            D[i, j] = c + min(D[i - 1, j], D[i - 1, j - 1], D[i, j - 1])
    return float(np.sqrt(D[n, m]))


def test_sliding_mean_std():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, 100)
    mu, sd = sliding_mean_std(x, 10)
    subs = np.lib.stride_tricks.sliding_window_view(x, 10)
    assert np.allclose(mu, subs.mean(1))
    assert np.allclose(sd, subs.std(1), atol=1e-9)


def test_matrix_profile_matches_brute_force():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, 180)
    P, I = matrix_profile(x, 12)
    Pb, Ib = _mp_brute(x, 12)
    assert np.allclose(P, Pb, atol=1e-6)
    assert (I == Ib).all()


def test_matrix_profile_planted_motif():
    rng = np.random.default_rng(2)
    x = rng.normal(0, 0.2, 220) + 5.0
    pat = np.sin(np.arange(16) * 1.3) * 3
    x[40:56] += pat
    x[150:166] += pat
    P, I = matrix_profile(x, 16)
    # the two occurrences carry independent noise (sigma=0.2 on an
    # amplitude-3 pattern) so the match is ~0.5, far below the noise
    # floor of ~sqrt(2w) ~ 5.7
    assert P[40] < 1.0 and I[40] == 150
    assert P[150] < 1.0 and I[150] == 40
    assert np.median(P) > 2.0


def test_matrix_profile_constant_series():
    x = np.ones(64)
    P, I = matrix_profile(x, 8)
    assert np.allclose(P, 0.0)  # constant matches constant at 0


@pytest.mark.parametrize("band", [None, 1, 3, 10])
def test_dtw_matches_brute_force(band):
    rng = np.random.default_rng(3)
    for _ in range(10):
        a = rng.normal(0, 1, rng.integers(2, 30))
        b = rng.normal(0, 1, rng.integers(2, 30))
        d1, d2 = dtw_distance(a, b, band), _dtw_brute(a, b, band)
        assert (np.isinf(d1) and np.isinf(d2)) or abs(d1 - d2) < 1e-9


def test_dtw_identity_and_euclid_bound():
    rng = np.random.default_rng(4)
    a = rng.normal(0, 1, 40)
    b = rng.normal(0, 1, 40)
    assert dtw_distance(a, a) == 0.0
    assert dtw_distance(a, b) <= float(np.sqrt(((a - b) ** 2).sum())) + 1e-12


def test_spectral_residual_flags_spike_not_clean():
    t = np.arange(512)
    clean = 5 + 2 * np.sin(2 * np.pi * t / 32)
    spiked = clean.copy()
    spiked[200] += 8
    s = spectral_residual_saliency(spiked)
    assert int(np.argmax(s)) == 200
    med, mad = np.median(s), np.median(np.abs(s - np.median(s))) + 1e-12
    assert (s[200] - med) / (1.4826 * mad) > 6.0
    sc = spectral_residual_saliency(clean)
    medc = np.median(sc)
    madc = np.median(np.abs(sc - medc)) + 1e-12
    assert ((sc - medc) / (1.4826 * madc)).max() < 6.0


def test_pca_distributed_matches_numpy(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.similarity import (
        pca_fit_distributed,
        pca_project,
    )

    rng = np.random.default_rng(5)
    d, n = 6, 400
    base = rng.normal(0, 1, (n, 3)) @ rng.normal(0, 1, (3, d))  # rank-3 + noise
    x = base + 0.01 * rng.normal(0, 1, (n, d))
    df = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(x)})
    ds = ray.data.from_pandas(df).repartition(4)

    mean, comps, evals, cnt = pca_fit_distributed(ds, k=3)
    assert cnt == n
    assert np.allclose(mean, x.mean(0), atol=1e-10)
    cov = np.cov(x.T, bias=True)
    ev_np = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert np.allclose(evals, ev_np, atol=1e-8)
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-10)

    out = pca_project(ds, mean, comps).to_pandas()
    # population-covariance identity: mean recon err == dropped eigenvalue mass
    assert abs(out["recon_err2"].mean() - ev_np[3:].sum()) < 1e-8


def test_kalman_matches_gp_posterior():
    from spectral_time_series_ray.functions.tsanalysis import kalman_local_level

    rng = np.random.default_rng(7)
    n, q, r = 40, 0.5, 2.0
    lat = 10 + np.cumsum(rng.normal(0, np.sqrt(q), n))
    y = lat + rng.normal(0, np.sqrt(r), n)
    p0, mu0 = 1e6, y[0]
    idx = np.arange(n)
    C = p0 + q * np.minimum.outer(idx, idx)
    post = mu0 + C @ np.linalg.solve(C + r * np.eye(n), y - mu0)
    mf, ms, ps = kalman_local_level(y, q, r, mu0=mu0, p0=p0)
    assert np.abs(ms - post).max() < 1e-8
    # smoother beats raw observations against the latent truth
    assert np.sqrt(((ms - lat) ** 2).mean()) < np.sqrt(((y - lat) ** 2).mean())


def test_kalman_handles_missing():
    from spectral_time_series_ray.functions.tsanalysis import kalman_local_level

    rng = np.random.default_rng(8)
    y = 5 + np.cumsum(rng.normal(0, 0.3, 60))
    y2 = y.copy()
    y2[20:30] = np.nan
    mf, ms, ps = kalman_local_level(y2, 0.1, 0.5)
    assert np.isfinite(ms).all()
    # inside the gap the smoother interpolates between the endpoints
    assert ms[20:30].min() >= min(y[19], y[30]) - 3
    assert ms[20:30].max() <= max(y[19], y[30]) + 3
    # smoothed variance inflates inside the gap
    assert ps[24] > ps[5]


def test_sax_znorm_invariance_and_breakpoints():
    from spectral_time_series_ray.functions.tsanalysis import (
        paa,
        sax_breakpoints,
        sax_word,
    )

    assert np.allclose(sax_breakpoints(4), [-0.67449, 0.0, 0.67449], atol=1e-4)
    x = np.arange(12.0)
    assert np.allclose(paa(x, 4), [1, 4, 7, 10])
    rng = np.random.default_rng(5)
    s = rng.normal(size=128)
    w1, _ = sax_word(s, 8, 4)
    w2, _ = sax_word(7.0 + 3.5 * s, 8, 4)  # affine transform, positive scale
    assert w1 == w2
    assert len(w1) == 8 and set(w1) <= set("abcd")


def test_sax_mindist_lower_bounds_euclidean():
    from spectral_time_series_ray.functions.tsanalysis import sax_mindist, sax_word

    rng = np.random.default_rng(6)
    for _ in range(100):
        a, b = rng.normal(size=64), rng.normal(size=64)
        wa, _ = sax_word(a, 8, 4)
        wb, _ = sax_word(b, 8, 4)
        za = (a - a.mean()) / a.std()
        zb = (b - b.mean()) / b.std()
        assert sax_mindist(wa, wb, 64, 4) <= np.linalg.norm(za - zb) + 1e-9


def test_paa_fractional_preserves_mean():
    from spectral_time_series_ray.functions.tsanalysis import paa

    rng = np.random.default_rng(9)
    x = rng.normal(size=17)  # not divisible by 5
    p = paa(x, 5)
    # continuous-time step-function segmentation conserves total mass
    assert abs(p.mean() - x.mean()) < 1e-12


def test_lagged_ccf_detects_planted_lag(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.analytics import lagged_ccf

    rng = np.random.default_rng(11)
    H = 200
    base = rng.poisson(20, H)
    ts0 = np.datetime64("2024-01-01", "us")
    rows = []
    for h in range(H):
        t = ts0 + np.timedelta64(h * 3600_000_000, "us")
        rows.append({"ts": t, "event_type": "click", "n": int(base[h])})
        # purchase follows click by exactly 2 hours (planted lag +2)
        if h + 2 < H:
            rows.append({"ts": t + np.timedelta64(2 * 3600_000_000, "us"),
                         "event_type": "purchase", "n": int(base[h])})
    expanded = pd.DataFrame([
        {"ts": r["ts"], "event_type": r["event_type"]}
        for r in rows for _ in range(r["n"])
    ])
    ds = ray.data.from_pandas(expanded)
    out = lagged_ccf(ds, "click", "purchase", max_lag=3)
    peak = int(out.loc[out["ccf"].idxmax(), "lag"])
    assert peak == 2
    assert out.loc[out["lag"] == 2, "ccf"].iloc[0] > 0.95
    # overlap-window sizes shrink by |lag|
    assert (out["n_pairs"] == out["n_pairs"].max() - out["lag"].abs()).all()


def test_kleinberg_recovers_planted_burst():
    from spectral_time_series_ray.functions.tsanalysis import kleinberg_bursts

    rng = np.random.default_rng(3)
    gaps = np.concatenate([
        rng.exponential(60, 100), rng.exponential(2, 40), rng.exponential(60, 60),
    ])
    states, bursts = kleinberg_bursts(gaps, s=4.0, gamma=1.0)
    main = max(bursts, key=lambda b: b[1] - b[0])
    assert main[0] >= 90 and main[1] <= 150 and main[1] - main[0] >= 30
    # uniform control stays quiet
    _, ctrl = kleinberg_bursts(rng.exponential(60, 200), s=4.0, gamma=1.0)
    assert sum(e - b for b, e in ctrl) < 10


def test_kleinberg_matches_bruteforce_viterbi():
    from spectral_time_series_ray.functions.tsanalysis import kleinberg_bursts

    rng = np.random.default_rng(4)
    gaps = np.maximum(rng.exponential(10, 60), 1e-9)
    s, gamma = 3.0, 1.0
    states, _ = kleinberg_bursts(gaps, s=s, gamma=gamma)
    # independent exhaustive DP over full state sequences (n small)
    g = np.maximum(gaps, gaps[gaps > 0].min())
    n = len(g)
    a0 = n / g.sum()
    a1 = s * a0
    c = np.stack([a0 * g - np.log(a0), a1 * g - np.log(a1)])
    tau = gamma * np.log(n)
    best = {(0,): c[0, 0], (1,): c[1, 0] + tau}
    for t in range(1, n):
        nxt = {}
        for seq, cost in best.items():
            for st in (0, 1):
                pen = tau if (st == 1 and seq[-1] == 0) else 0.0
                cand = cost + c[st, t] + pen
                key = seq + (st,)
                nxt[key] = cand
        # prune: keep best per last-state (optimal substructure)
        pruned = {}
        for seq, cost in nxt.items():
            k = seq[-1]
            if k not in pruned or cost < pruned[k][1]:
                pruned[k] = (seq, cost)
        best = {seq: cost for seq, cost in pruned.values()}
    opt = min(best.items(), key=lambda kv: kv[1])[0]
    assert np.array_equal(states, np.array(opt))


def test_pelt_matches_exact_dp_and_recovers_planted():
    from spectral_time_series_ray.functions.tsanalysis import pelt_mean_changepoints

    rng = np.random.default_rng(2)
    y = np.concatenate([
        rng.normal(0, 1, 80), rng.normal(5, 1, 60), rng.normal(-3, 1, 70),
    ])
    cps = pelt_mean_changepoints(y)
    assert len(cps) == 2 and abs(cps[0] - 80) <= 2 and abs(cps[1] - 140) <= 2
    assert pelt_mean_changepoints(rng.normal(0, 1, 150)) == []

    def brute(y, beta, min_size=2):
        n = len(y)
        s1 = np.concatenate([[0.0], np.cumsum(y)])
        s2 = np.concatenate([[0.0], np.cumsum(y * y)])

        def c(a, b):
            m = b - a
            return s2[b] - s2[a] - (s1[b] - s1[a]) ** 2 / m

        F = np.full(n + 1, np.inf)
        F[0] = -beta
        prev = np.full(n + 1, -1, int)
        for t in range(min_size, n + 1):
            for s in range(0, t - min_size + 1):
                if np.isfinite(F[s]):
                    v = F[s] + c(s, t) + beta
                    if v < F[t]:
                        F[t], prev[t] = v, s
        out, t = [], n
        while t > 0 and prev[t] >= 0:
            if prev[t] > 0:
                out.append(prev[t])
            t = prev[t]
        return sorted(out)

    for seed in range(10):
        r = np.random.default_rng(seed)
        yy = np.concatenate([
            r.normal(0, 1, 30), r.normal(r.uniform(1, 4), 1, 25), r.normal(-2, 1, 20),
        ])
        beta = 2 * np.log(len(yy))
        assert pelt_mean_changepoints(yy, beta=beta) == brute(yy, beta)


def test_context_windows_conservation_and_budget(ray_session):
    import ray.data

    from spectral_time_series_ray.functions.textstats import BPE_RE
    from spectral_time_series_ray.stages.packing import context_windows

    rng = np.random.default_rng(13)
    rows = []
    for c in range(12):
        n = int(rng.integers(1, 40))
        for t in range(n):
            k = int(rng.integers(1, 60))
            rows.append({"conv_id": f"c{c}", "turn_idx": t,
                         "role": "user" if t % 2 == 0 else "assistant",
                         "text": ("tok " * k).strip()})
    df = pd.DataFrame(rows)
    ds = ray.data.from_pandas(df)
    win = context_windows(ds, max_tokens=32).to_pandas()
    # conservation: window tokens == raw tokens
    raw = sum(len(BPE_RE.findall(t)) for t in df["text"])
    assert int(win["n_tokens"].sum()) == raw
    # budget respected except flagged oversize singletons
    over = win[win["n_tokens"] > 32]
    assert over["oversize"].all() and (over["n_turns"] == 1).all()
    # per conversation: contiguous, non-overlapping, complete
    g = win.groupby("conv_id")
    for cid, grp in g:
        grp = grp.sort_values("window_idx")
        n_turns_conv = int((df["conv_id"] == cid).sum())
        assert int(grp["n_turns"].sum()) == n_turns_conv
        assert list(grp["start_turn"])[1:] == list(grp["end_turn_excl"])[:-1]


def test_morton_key_properties():
    from spectral_time_series_ray.state.zorder import bucket_rank, morton_key

    a = np.arange(64, dtype=np.uint64)
    # monotone in each dim with the other fixed
    assert (np.diff(morton_key(a, np.zeros(64, np.uint64))) > 0).all()
    assert (np.diff(morton_key(np.zeros(64, np.uint64), a)) > 0).all()
    # bit interleaving: (3,3) -> 0b1111
    assert morton_key(np.array([3], np.uint64), np.array([3], np.uint64))[0] == 15
    # equi-depth ranks: balanced under skew
    rng = np.random.default_rng(7)
    v = rng.exponential(1.0, 10_000)
    edges = np.quantile(v, np.linspace(0, 1, 17)[1:-1])
    r = bucket_rank(v, edges)
    counts = np.bincount(r.astype(int), minlength=16)
    assert counts.min() > 400  # every bucket carries real mass


def test_zorder_pruning_correct_and_tighter(ray_session, tmp_path):
    import ray.data

    from spectral_time_series_ray.state.zonemap import build_zonemap
    from spectral_time_series_ray.state.zorder import prune_box, write_zordered

    rng = np.random.default_rng(8)
    n = 20_000
    df = pd.DataFrame({
        "x": rng.integers(0, 1_000_000, n).astype(np.int64).astype(np.float64),
        "y": rng.exponential(50.0, n),
    })
    ds = ray.data.from_pandas(df)
    zdir = str(tmp_path / "z")
    write_zordered(ds, "x", "y", zdir, num_files=16)
    zm_x = build_zonemap(f"{zdir}/*.parquet", "x")
    zm_y = build_zonemap(f"{zdir}/*.parquet", "y")
    x_lo, x_hi, y_lo, y_hi = 200_000, 400_000, 20.0, 40.0
    keep = prune_box(zm_x, zm_y, x_lo, x_hi, y_lo, y_hi)
    assert 0 < len(keep) < 16
    # correctness: pruned scan == full-frame filter
    got = pd.concat([pd.read_parquet(p) for p in keep])
    got = got[(got["x"] >= x_lo) & (got["x"] < x_hi)
              & (got["y"] >= y_lo) & (got["y"] < y_hi)]
    exp = df[(df["x"] >= x_lo) & (df["x"] < x_hi)
             & (df["y"] >= y_lo) & (df["y"] < y_hi)]
    assert len(got) == len(exp)
    assert abs(got["y"].sum() - exp["y"].sum()) < 1e-6


def test_kcenter_two_approximation(ray_session):
    import itertools

    import ray.data

    from spectral_time_series_ray.stages.similarity import kcenter_greedy

    rng = np.random.default_rng(15)
    X = rng.normal(size=(60, 4))
    df = pd.DataFrame({"vec_id": np.arange(60, dtype=np.int64),
                       "embedding": [x.tolist() for x in X]})
    ds = ray.data.from_pandas(df)
    K = 3
    centers, radii = kcenter_greedy(ds, k=K)
    assert len(centers) == K
    assert all(radii[i] >= radii[i + 1] - 1e-9 for i in range(len(radii) - 1))
    got_r = radii[-1]

    def cover_radius(center_idx):
        C = X[list(center_idx)]
        d2 = ((X * X).sum(1, keepdims=True) - 2 * X @ C.T + (C * C).sum(1)[None, :])
        return float(np.sqrt(d2.min(axis=1).max()))

    opt = min(cover_radius(c) for c in itertools.combinations(range(60), K))
    assert got_r <= 2 * opt + 1e-9  # Gonzalez guarantee
    # and the greedy selection actually covers at its reported radius
    sel = [int(df[df["vec_id"] == i].index[0]) for i in centers["vec_id"]]
    assert abs(cover_radius(sel) - got_r) < 1e-9
