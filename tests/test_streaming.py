"""Incremental keyed-state aggregation == batch rollup (§2.9)."""

import numpy as np
import pandas as pd

from spectral_time_series_ray.stages.streaming import StreamingAggregator


def test_incremental_equals_batch(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    n = 30_000
    df = pd.DataFrame(
        {
            "user": rng.integers(0, 50, n),
            "ts": pd.to_datetime(rng.permutation(n), unit="s"),
            "value": rng.normal(10, 5, n),
        }
    )
    ds = ray.data.from_pandas(df).materialize()

    agg = StreamingAggregator(n_buckets=3).consume(ds, "user", "value", ts_col="ts", batch_size=4096)
    inc = agg.result()

    batch = (
        df.groupby("user")["value"]
        .agg(["count", "sum", "min", "max"])
        .reset_index()
        .rename(columns={"user": "key"})
        .sort_values("key")
        .reset_index(drop=True)
    )
    assert len(inc) == len(batch) == 50
    np.testing.assert_array_equal(inc["key"].to_numpy(), batch["key"].to_numpy())
    np.testing.assert_array_equal(inc["count"].to_numpy(), batch["count"].to_numpy())
    np.testing.assert_allclose(inc["sum"].to_numpy(), batch["sum"].to_numpy(), rtol=1e-9)
    np.testing.assert_allclose(inc["min"].to_numpy(), batch["min"].to_numpy())
    np.testing.assert_allclose(inc["max"].to_numpy(), batch["max"].to_numpy())

    # the worker-side dispatch path must produce the IDENTICAL final
    # state (zero rows through the driver; per-key fold order holds
    # because a key's whole log folds inside one bucket task)
    agg2 = StreamingAggregator(n_buckets=3).consume_distributed(
        ds, "user", "value", ts_col="ts"
    )
    inc2 = agg2.result()
    np.testing.assert_array_equal(inc2["key"].to_numpy(), batch["key"].to_numpy())
    np.testing.assert_array_equal(inc2["count"].to_numpy(), batch["count"].to_numpy())
    np.testing.assert_allclose(inc2["sum"].to_numpy(), batch["sum"].to_numpy(), rtol=1e-9)
    np.testing.assert_allclose(inc2["min"].to_numpy(), batch["min"].to_numpy())
    np.testing.assert_allclose(inc2["max"].to_numpy(), batch["max"].to_numpy())


# ---------------------------------------------------------- watermark


def test_watermark_rollup_classes_and_conservation(ray_session):
    import numpy as np
    import pandas as pd
    import ray as _ray

    from spectral_time_series_ray.stages.streaming import watermark_rollup

    H = 3_600_000_000
    base = np.datetime64("2024-02-01T00:00:00", "us").astype(np.int64)
    # one user; arrival order planted to exercise all three classes:
    #   seq 0: ts 00:10  (on_time, window 00)
    #   seq 1: ts 05:10  (on_time, window 05; watermark -> 04:10)
    #   seq 2: ts 01:30  (window 01 ends 02:00; wm 04:10 >= 02:00+1h? ->
    #          04:10 >= 03:00 -> DROPPED with delay=1h? wm = 05:10-1h=04:10,
    #          wend+late = 02:00+1h = 03:00 -> dropped)
    #   seq 3: ts 03:45  (window 03 ends 04:00; wm 04:10 >= 04:00 and
    #          < 04:00+1h -> LATE, accepted)
    rows = [
        (0, base + 10 * 60_000_000, 1.0),
        (1, base + 5 * H + 10 * 60_000_000, 2.0),
        (2, base + 1 * H + 30 * 60_000_000, 4.0),
        (3, base + 3 * H + 45 * 60_000_000, 8.0),
    ]
    df = pd.DataFrame(
        {
            "user_id": np.int64(7),
            "seq": [r[0] for r in rows],
            "ts": np.array([r[1] for r in rows]).astype("datetime64[us]"),
            "value": [r[2] for r in rows],
        }
    )
    out = (
        watermark_rollup(
            _ray.data.from_pandas(df),
            tier_us=H,
            key="user_id",
            seq_col="seq",
            delay_us=H,
            lateness_us=H,
        )
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    assert out["n_on_time"].sum() == 2
    assert out["n_late"].sum() == 1
    assert out["n_dropped"].sum() == 1
    # conservation: every arrival is classified exactly once
    assert (out["n_on_time"] + out["n_late"] + out["n_dropped"]).sum() == len(df)
    by_w = out.set_index(out["window_start"].astype("datetime64[us]"))
    w1 = np.datetime64("2024-02-01T01:00:00", "us")
    w3 = np.datetime64("2024-02-01T03:00:00", "us")
    assert by_w.loc[w1, "n_dropped"] == 1 and by_w.loc[w1, "sum_value"] == 0.0
    assert by_w.loc[w3, "n_late"] == 1 and by_w.loc[w3, "sum_value"] == 8.0


def test_watermark_rollup_in_order_stream_all_on_time(ray_session):
    import numpy as np
    import pandas as pd
    import ray as _ray

    from spectral_time_series_ray.stages.streaming import watermark_rollup

    rng = np.random.default_rng(3)
    n = 500
    ts = np.datetime64("2024-02-01", "us") + np.sort(
        rng.integers(0, 86_400_000_000, n)
    ).astype("timedelta64[us]")
    df = pd.DataFrame(
        {
            "user_id": rng.integers(1, 5, n).astype(np.int64),
            "seq": np.arange(n, dtype=np.int64),
            "ts": ts,
            "value": np.round(rng.uniform(0, 10, n), 2),
        }
    )
    out = watermark_rollup(
        _ray.data.from_pandas(df),
        tier_us=3_600_000_000,
        key="user_id",
        seq_col="seq",
        delay_us=0,
        lateness_us=0,
    ).to_pandas()
    # an in-event-time-order stream is never late even with zero slack
    assert out["n_late"].sum() == 0 and out["n_dropped"].sum() == 0
    assert out["n_on_time"].sum() == n
    # aggregates equal the plain batch rollup
    exp = (
        df.assign(w=df["ts"].dt.floor("h"))
        .groupby(["user_id", "w"], as_index=False)["value"]
        .sum()
    )
    got = out.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    exp = exp.sort_values(["user_id", "w"]).reset_index(drop=True)
    assert np.allclose(got["sum_value"], exp["value"].round(6))


def test_sessionize_matches_pandas(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.streaming import sessionize

    rng = np.random.default_rng(21)
    rows = []
    for c in range(40):
        size = int(rng.integers(1, 60))
        t = np.int64(rng.integers(0, 10**7)) * 1_000_000
        for i in range(size):
            t += np.int64(rng.choice([2, 30, 700, 2000]) * 1_000_000)
            rows.append({"conv_id": f"c{c:02d}", "turn_idx": np.int32(i), "ts": pd.Timestamp(t, unit="us")})
    df = pd.DataFrame(rows).sample(frac=1.0, random_state=4).reset_index(drop=True)

    got = (
        sessionize(ray.data.from_pandas(df), gap_s=600.0, num_partitions=5)
        .to_pandas()
        .sort_values(["conv_id", "session_idx"])
        .reset_index(drop=True)
    )

    exp_rows = []
    for c, g in df.sort_values(["conv_id", "turn_idx"]).groupby("conv_id"):
        tus = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        sess_start = 0
        sidx = 0
        for i in range(1, len(tus) + 1):
            if i == len(tus) or tus[i] - tus[i - 1] > 600_000_000:
                sidx += 1
                exp_rows.append(
                    {
                        "conv_id": c,
                        "session_idx": sidx,
                        "n_turns": i - sess_start,
                        "duration_s": (tus[i - 1] - tus[sess_start]) / 1e6,
                        "start_ts": pd.Timestamp(tus[sess_start], unit="us"),
                    }
                )
                sess_start = i
    exp = pd.DataFrame(exp_rows)
    pd.testing.assert_frame_equal(
        got.astype({"n_turns": np.int64, "session_idx": np.int64, "start_ts": "datetime64[us]"}),
        exp.astype({"n_turns": np.int64, "session_idx": np.int64, "start_ts": "datetime64[us]"}),
    )
    # conservation
    assert int(got["n_turns"].sum()) == len(df)
