"""Tests for stages/analytics.py: MAD outliers, first-seen
cumulative counts, histogram-based exact quantiles, seasonality
profiles, value histograms."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spectral_time_series_ray.stages.analytics import (
    quantile_from_counts,
)


# ---------------------------------------------------------- pure kernels


@given(
    st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=200),
    st.floats(min_value=0.0, max_value=1.0),
)
@settings(max_examples=200, deadline=None)
def test_quantile_from_counts_matches_np_quantile(values, q):
    v = np.asarray(values, dtype=np.float64)
    uniq, counts = np.unique(v, return_counts=True)
    got = quantile_from_counts(uniq, counts, q)
    exp = float(np.quantile(v, q))
    assert got == pytest.approx(exp, rel=0, abs=1e-12)


def test_quantile_from_counts_unsorted_input():
    # histogram arrives in arbitrary (groupby) order
    vals = np.array([30, 10, 20], dtype=np.int64)
    cnts = np.array([1, 2, 1], dtype=np.int64)
    # expanded: [10, 10, 20, 30]; p50 at pos 1.5 -> 15.0
    assert quantile_from_counts(vals, cnts, 0.5) == 15.0
    assert quantile_from_counts(vals, cnts, 0.0) == 10.0
    assert quantile_from_counts(vals, cnts, 1.0) == 30.0


# ------------------------------------------------------- dataset stages


@pytest.fixture(scope="module")
def events_df():
    rng = np.random.default_rng(7)
    n = 4000
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 21 * 86400, n), unit="s"
    )
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, 40, n).astype(np.int64),
            "ts": ts,
            "event_type": rng.choice(["a", "b", "c"], n),
            "value": np.round(rng.exponential(50.0, n), 2),
        }
    )


def test_mad_outliers_matches_direct(ray_session, events_df):
    import ray.data

    from spectral_time_series_ray.stages.analytics import mad_outliers

    ds = ray.data.from_pandas(events_df)
    got = (
        mad_outliers(ds, key="user_id", value_col="value", k=3.0)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )

    rows = []
    for uid, g in events_df.groupby("user_id"):
        v = g["value"].to_numpy(dtype=np.float64)
        med = np.quantile(v, 0.5)
        mad = np.quantile(np.abs(v - med), 0.5)
        rows.append(
            {
                "user_id": uid,
                "n_events": len(v),
                "med_value": med,
                "mad_value": mad,
                "n_outliers": int((np.abs(v - med) > 3 * mad).sum()),
            }
        )
    exp = pd.DataFrame(rows).sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_events": np.int64, "n_outliers": np.int64}), exp,
        check_dtype=False,
    )
    # with k=3 MADs on exponential data, outliers exist but are rare
    assert 0 < got["n_outliers"].sum() < 0.2 * len(events_df)


def test_first_seen_cumulative_matches_direct(ray_session, events_df):
    import ray.data

    from spectral_time_series_ray.stages.analytics import first_seen_cumulative

    ds = ray.data.from_pandas(events_df)
    got = first_seen_cumulative(ds, key="user_id", ts_col="ts")  # pandas out

    first = events_df.assign(day=events_df["ts"].dt.floor("D")).groupby("user_id")[
        "day"
    ].min()
    exp = (
        first.value_counts().sort_index().rename("n_new").reset_index()
    )
    assert list(got["first_bucket"]) == list(exp["day"])
    assert list(got["n_new"]) == list(exp["n_new"])
    assert list(got["cum_keys"]) == list(exp["n_new"].cumsum())
    # monotone, ends at the number of distinct keys
    assert got["cum_keys"].iloc[-1] == events_df["user_id"].nunique()


def test_filter_above_group_quantile(ray_session, events_df):
    import ray.data

    from spectral_time_series_ray.stages.analytics import (
        filter_above_group_quantile,
    )

    df = events_df.assign(n_chars=(events_df["value"] * 10).astype(np.int64))
    ds = ray.data.from_pandas(df[["event_type", "n_chars"]])
    got = (
        filter_above_group_quantile(ds, "event_type", "n_chars", 0.9)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    for _, row in got.iterrows():
        g = df[df["event_type"] == row["event_type"]]["n_chars"].to_numpy()
        thr = np.quantile(g, 0.9)
        assert row["threshold"] == pytest.approx(thr, abs=1e-9)
        above = g[g > thr]
        assert row["n_above"] == len(above)
        assert row["mean_above"] == pytest.approx(above.mean(), rel=1e-12)


def test_dow_profile_and_histogram(ray_session, events_df):
    import ray.data

    from spectral_time_series_ray.stages.analytics import (
        dow_profile,
        value_histogram,
    )

    ds = ray.data.from_pandas(events_df)
    prof = dow_profile(ds, "ts", "event_type", "value").to_pandas()
    assert set(prof["dow"]) <= set(range(1, 8))
    assert prof["n_events"].sum() == len(events_df)
    one = prof[(prof["event_type"] == "a") & (prof["dow"] == 1)]
    sub = events_df[
        (events_df["event_type"] == "a") & (events_df["ts"].dt.dayofweek == 0)
    ]["value"]
    assert one["n_events"].iloc[0] == len(sub)
    assert one["mean_value"].iloc[0] == pytest.approx(sub.mean(), rel=1e-9)

    hist = value_histogram(ds, "event_type", "value", bin_width=25.0).to_pandas()
    assert hist["n_events"].sum() == len(events_df)
    h0 = hist[(hist["event_type"] == "b") & (hist["bin"] == 0)]
    sub = events_df[
        (events_df["event_type"] == "b") & (events_df["value"] < 25.0)
    ]["value"]
    assert h0["n_events"].iloc[0] == len(sub)
    assert h0["sum_value"].iloc[0] == pytest.approx(sub.sum(), rel=1e-9)


def test_rolling_order_stats_matches_pandas(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.features import rolling_order_stats

    rng = np.random.default_rng(13)
    n = 2500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 30, n).astype(np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
            "value": np.round(rng.uniform(0, 300, n), 2),
        }
    )
    got = (
        rolling_order_stats(
            ray.data.from_pandas(df.sample(frac=1.0, random_state=2)),
            key="user_id", order_cols=("ts", "event_id"), value_col="value",
            id_cols=("event_id",), window=5, num_partitions=6,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    s = df.sort_values(["user_id", "ts", "event_id"]).set_index("event_id")
    g = s.groupby("user_id")["value"]
    exp = pd.DataFrame(
        {
            "med_w": g.rolling(5, min_periods=1).median().reset_index(level=0, drop=True),
            "min_w": g.rolling(5, min_periods=1).min().reset_index(level=0, drop=True),
            "max_w": g.rolling(5, min_periods=1).max().reset_index(level=0, drop=True),
        }
    ).sort_index()
    for c in ("med_w", "min_w", "max_w"):
        np.testing.assert_allclose(got[c].to_numpy(), exp[c].to_numpy(), rtol=0, atol=0)


def test_analytic_dist_funcs_matches_pandas(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.features import analytic_dist_funcs

    rng = np.random.default_rng(17)
    n = 2000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 25, n).astype(np.int64),
            # coarse grid => many exact ties
            "value": np.round(rng.uniform(0, 10, n), 0),
        }
    )
    got = (
        analytic_dist_funcs(
            ray.data.from_pandas(df.sample(frac=1.0, random_state=3)),
            key="user_id", order_value="value", id_cols=("event_id",),
            num_partitions=5,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    g = df.groupby("user_id")["value"]
    exp_pct = g.rank(method="min").to_numpy()
    sizes = g.transform("size").to_numpy()
    exp_pct = np.where(sizes == 1, 0.0, (exp_pct - 1) / np.maximum(sizes - 1, 1))
    exp_cume = g.rank(method="max").to_numpy() / sizes
    np.testing.assert_allclose(got["pct_rank"].to_numpy(), exp_pct, atol=0)
    np.testing.assert_allclose(got["cume_d"].to_numpy(), exp_cume, atol=0)


def test_pairwise_correlation_matches_numpy(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.analytics import pairwise_correlation

    rng = np.random.default_rng(23)
    buckets = 200
    labels = ["a", "b", "c"]
    rows = []
    base = rng.integers(1, 50, buckets)
    for bi in range(buckets):
        # 'b' correlated with 'a'; 'c' independent; some zero cells
        counts = {
            "a": int(base[bi]),
            "b": int(base[bi] * 2 + rng.integers(0, 5)),
            "c": int(rng.integers(0, 30)),
        }
        for lab, n in counts.items():
            if n > 0:
                rows.append({"bucket": bi, "label": lab, "n": n})
    df = pd.DataFrame(rows)
    got = pairwise_correlation(
        ray.data.from_pandas(df.sample(frac=1.0, random_state=7)),
        "bucket", "label", "n", num_partitions=5,
    )
    # dense matrix oracle
    X = (
        df.pivot_table(index="bucket", columns="label", values="n",
                       aggfunc="sum", fill_value=0)
        .reindex(columns=labels, fill_value=0)
        .to_numpy(np.float64)
    )
    C = np.corrcoef(X, rowvar=False)
    for _, r in got.iterrows():
        ia, ib = labels.index(r["label_a"]), labels.index(r["label_b"])
        assert abs(r["corr_n"] - C[ia, ib]) < 1e-12
        assert r["n_buckets"] == buckets
    assert got["corr_n"].iloc[0] > 0.99  # a-b planted correlation


def test_analytic_edge_funcs_matches_pandas(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.features import analytic_edge_funcs

    rng = np.random.default_rng(29)
    n = 1500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 40, n).astype(np.int64),  # some tiny segs
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
            "value": np.round(rng.uniform(0, 100, n), 2),
        }
    )
    # force a couple of 1- and 2-row segments
    df.loc[df.index[:3], "user_id"] = [997, 998, 998]
    got = (
        analytic_edge_funcs(
            ray.data.from_pandas(df.sample(frac=1.0, random_state=5)),
            key="user_id", order_cols=("ts", "event_id"), value_col="value",
            id_cols=("event_id",), nth=3, num_partitions=5,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    s = df.sort_values(["user_id", "ts", "event_id"])
    g = s.groupby("user_id")["value"]
    exp = pd.DataFrame(
        {
            "event_id": s["event_id"].to_numpy(),
            "first_v": g.transform("first").to_numpy(),
            "last_v": g.transform("last").to_numpy(),
            "nth_v": g.transform(
                lambda x: x.iloc[2] if len(x) >= 3 else np.nan
            ).to_numpy(),
        }
    ).sort_values("event_id").reset_index(drop=True)
    for c in ("first_v", "last_v", "nth_v"):
        np.testing.assert_array_equal(got[c].to_numpy(), exp[c].to_numpy())


def test_session_intervals_and_concurrency_planted():
    """Planted interval layout with hand-computed per-hour peaks:
    covers the closed-interval tie rule (+1 before -1 at the same
    instant), zero-length sessions, carry across an hour with no
    boundaries, and multi-hour spans."""
    import numpy as np
    import pandas as pd
    import ray.data

    from spectral_time_series_ray.stages.analytics import (
        interval_concurrency,
        session_intervals,
    )

    H = 3_600_000_000  # one hour in us
    base = 1_700_000_000_000_000  # not hour-aligned
    b0 = (base // H) * H  # hour bucket containing base

    # user 1: two events 10s apart (one session), then a >30min gap
    # starting a second single-event session exactly when user 2's
    # session ends (tie rule)
    rows = [
        (1, base), (1, base + 10_000_000),
        (1, base + 2_000_000_000),           # gap 1990s > 1800 -> new zero-length session
        (2, base + 500_000_000),
        (2, base + 2_000_000_000),           # gap 1500s -> same session; ends exactly at user1's 3rd event
        (3, b0 + H + 100), (3, b0 + 3 * H + 200),  # gap 2h -> two zero-length sessions
    ]
    df = pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
    })
    ds = ray.data.from_pandas(df)
    iv = session_intervals(ds, key="user_id", ts_col="ts", gap_s=1800.0
                           ).to_pandas().sort_values(["user_id", "start_us"])
    got = list(zip(iv["user_id"], iv["start_us"], iv["end_us"], iv["n_events"]))
    assert got == [
        (1, base, base + 10_000_000, 2),           # 2-event session
        (1, base + 2_000_000_000, base + 2_000_000_000, 1),  # zero-length
        (2, base + 500_000_000, base + 2_000_000_000, 2),
        (3, b0 + H + 100, b0 + H + 100, 1),        # gap 2h -> two singles
        (3, b0 + 3 * H + 200, b0 + 3 * H + 200, 1),
    ]

    occ = interval_concurrency(
        ray.data.from_pandas(iv.reset_index(drop=True)), freq_s=3600
    ).to_pandas().sort_values("bucket_us").reset_index(drop=True)

    # hand-computed: all of base..base+2000s lies inside hour b0
    # (base is 888.888s into b0? regardless: base % H + 2000s < H must
    # hold for this layout; assert it so the fixture stays valid)
    assert base % H + 2_000_000_000 < H
    # hour b0: u1-s1 [base, +10s], u2 [base+500s, +2000s],
    #          u1-s2 zero-length at +2000s (tie with u2's end -> both open)
    # peaks: level 1 (u1 start), 0, 1 (u2 start), then at +2000s the
    # +1 of u1-s2 processes BEFORE u2's -1 -> peak 2
    r0 = occ[occ["bucket_us"] == b0].iloc[0]
    assert r0["peak_concurrency"] == 2
    assert r0["busy_us"] == 10_000_000 + 1_500_000_000  # u1-s1 + u2
    # hour b0+H and b0+3H: one zero-length session each (peak 1, busy 0)
    r1 = occ[occ["bucket_us"] == b0 + H].iloc[0]
    r3 = occ[occ["bucket_us"] == b0 + 3 * H].iloc[0]
    assert r1["peak_concurrency"] == 1 and r1["busy_us"] == 0
    assert r3["peak_concurrency"] == 1 and r3["busy_us"] == 0
    # no row for the empty hour b0+2H (no interval touches it)
    assert (occ["bucket_us"] == b0 + 2 * H).sum() == 0
    assert len(occ) == 3


def test_interval_concurrency_carry_spanning_hours():
    """A single long interval spanning 3+ hours: mid hours have no
    boundaries and must inherit peak=1 from the carry; busy equals the
    clipped per-hour overlap."""
    import numpy as np
    import pandas as pd
    import ray.data

    from spectral_time_series_ray.stages.analytics import interval_concurrency

    H = 3_600_000_000
    s = 7 * H + 1_800_000_000        # 30 min into hour 7
    e = 10 * H + 900_000_000         # 15 min into hour 10
    iv = pd.DataFrame({"user_id": [9], "start_us": [s], "end_us": [e],
                       "n_events": [2]})
    occ = interval_concurrency(ray.data.from_pandas(iv), freq_s=3600
                               ).to_pandas().sort_values("bucket_us").reset_index(drop=True)
    assert list(occ["bucket_us"]) == [7 * H, 8 * H, 9 * H, 10 * H]
    assert list(occ["peak_concurrency"]) == [1, 1, 1, 1]
    assert list(occ["busy_us"]) == [
        1_800_000_000, H, H, 900_000_000]


def test_acf_by_key_matches_pandas_autocorr():
    """acf_by_key must equal pandas Series.autocorr (sample Pearson of
    v[k:] vs v[:-k]) per key and per lag, with NaN for too-short or
    zero-variance segments, and no cross-key leakage at segment
    boundaries."""
    import numpy as np
    import pandas as pd
    import ray.data

    from spectral_time_series_ray.stages.analytics import acf_by_key

    rng = np.random.default_rng(5)
    frames = []
    for uid, n in [(1, 40), (2, 7), (3, 3), (4, 12)]:
        v = np.cumsum(rng.normal(size=n)) + uid * 100
        if uid == 4:
            v[:] = 2.5  # zero variance -> NaN acf
        frames.append(pd.DataFrame({"user_id": uid, "t": np.arange(n),
                                    "v": v}))
    df = pd.concat(frames, ignore_index=True)
    # shuffle rows so ordering comes from the kernel, not the input
    df = df.sample(frac=1.0, random_state=0).reset_index(drop=True)

    out = acf_by_key(ray.data.from_pandas(df), key="user_id",
                     order_col="t", value_col="v", lags=(1, 2, 3)
                     ).to_pandas().set_index("user_id").sort_index()

    for uid, g in pd.concat(frames).groupby("user_id"):
        s = pd.Series(g.sort_values("t")["v"].to_numpy())
        for k in (1, 2, 3):
            exp = s.autocorr(lag=k) if len(s) >= k + 2 else np.nan
            gotv = out.loc[uid, f"acf{k}"]
            if np.isnan(exp) or (uid == 4):
                assert np.isnan(gotv), (uid, k, gotv)
            else:
                np.testing.assert_allclose(gotv, exp, atol=1e-12)
        assert out.loc[uid, "n_buckets"] == len(s)


def test_analytic_percent_rank_matches_pandas(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.features import analytic_percent_rank

    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 7, n),
        # coarse grid -> plenty of ties; one single-row user
        "value": rng.integers(0, 5, n) * 0.25,
    })
    df.loc[0, "user_id"] = 99  # singleton partition -> percent_rank 0

    out = (
        analytic_percent_rank(ray.data.from_pandas(df), key="user_id",
                              value_col="value", id_cols=("event_id",),
                              num_partitions=3)
        .to_pandas().set_index("event_id").sort_index()
    )
    g = df.set_index("event_id").groupby("user_id")["value"]
    cents = df.set_index("event_id")["value"].mul(100).round()
    exp_rank = cents.groupby(df.set_index("event_id")["user_id"]).rank(
        method="min").astype(np.int64)
    exp_cd = cents.groupby(df.set_index("event_id")["user_id"]).rank(
        method="max") / g.transform("size")
    nseg = g.transform("size")
    exp_pr = np.where(nseg > 1, (exp_rank - 1) / np.maximum(nseg - 1, 1), 0.0)

    assert (out["rnk"] == exp_rank.loc[out.index]).all()
    np.testing.assert_array_equal(out["percent_rank"].to_numpy(),
                                  pd.Series(exp_pr, index=nseg.index).loc[out.index].to_numpy())
    np.testing.assert_array_equal(out["cume_dist"].to_numpy(),
                                  exp_cd.loc[out.index].to_numpy())
    assert out.loc[0, "percent_rank"] == 0.0 and out.loc[0, "cume_dist"] == 1.0


def test_weighted_median_matches_weight_expansion(ray_session, tmp_path):
    import ray.data

    from spectral_time_series_ray.pipelines.queries import (
        lineitem_weighted_median,
    )

    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame({
        "l_returnflag": rng.choice(["A", "N", "R"], n),
        "l_extendedprice": rng.integers(100, 900, n) / 4.0,  # ties + cents
        "l_quantity": rng.integers(1, 9, n).astype(float),
        # unused-by-query columns to mimic the real table
        "l_orderkey": np.arange(n, dtype=np.int64),
    })
    df.to_parquet(tmp_path / "lineitem.parquet")

    out = lineitem_weighted_median(str(tmp_path)).set_index("flag")
    for flag, g in df.groupby("l_returnflag"):
        cents = np.rint(g["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        w = g["l_quantity"].to_numpy().astype(np.int64)
        expanded = np.sort(np.repeat(cents, w))
        W = len(expanded)
        for col, q in [("wp25", 0.25), ("wmedian", 0.5), ("wp75", 0.75)]:
            exp = expanded[int(np.ceil(q * W)) - 1] / 100.0
            assert out.loc[flag, col] == exp, (flag, col)
        assert out.loc[flag, "total_qty"] == W


def test_rolling_ols_slope_matches_bruteforce(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.features import rolling_ols_slope

    rng = np.random.default_rng(21)
    n = 600
    base = pd.Timestamp("2026-03-01")
    df = pd.DataFrame({
        "user_id": rng.integers(0, 5, n),
        "ts": base + pd.to_timedelta(rng.integers(0, 300, n), unit="h")
        + pd.to_timedelta(rng.integers(0, 3600, n), unit="s"),
    })
    out = (
        rolling_ols_slope(ray.data.from_pandas(df), key="user_id",
                          ts_col="ts", window=5, num_partitions=3)
        .to_pandas().sort_values(["user_id", "hour_idx"]).reset_index(drop=True)
    )
    # brute force: per user ordered hourly counts, 5-row OLS windows
    hx_all = (df["ts"].astype("datetime64[us]").astype(np.int64)
              // 3_600_000_000 - 438_288)
    g = (pd.DataFrame({"user_id": df["user_id"], "hx": hx_all})
         .groupby(["user_id", "hx"]).size().rename("y").reset_index())
    rows = []
    for uid, gg in g.groupby("user_id"):
        gg = gg.sort_values("hx").reset_index(drop=True)
        for i in range(len(gg)):
            w = gg.iloc[max(0, i - 4): i + 1]
            if len(w) > 1 and w["hx"].nunique() > 1:
                b = np.polyfit(w["hx"], w["y"], 1)[0]
            else:
                b = np.nan
            rows.append((uid, gg["hx"].iloc[i], gg["y"].iloc[i], len(w), b))
    exp = pd.DataFrame(rows, columns=["user_id", "hour_idx", "y",
                                      "n_window", "slope"])
    exp = exp.sort_values(["user_id", "hour_idx"]).reset_index(drop=True)
    assert len(out) == len(exp)
    for c in ("user_id", "hour_idx", "y", "n_window"):
        np.testing.assert_array_equal(out[c].to_numpy(), exp[c].to_numpy())
    a, b = out["slope"].to_numpy(), exp["slope"].to_numpy()
    mask = np.isnan(b)
    assert np.isnan(a[mask]).all()
    np.testing.assert_allclose(a[~mask], b[~mask], atol=1e-9)
