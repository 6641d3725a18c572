"""Halving-retry / dead-letter policy (stages/backoff.py) — the
reference's batch-size backoff contract (`uni2ts/cli/eval.py:39-76`).

NOTE: helper classes shipped to Ray actors are defined INSIDE the test
functions: module-level classes in a test file are cloudpickled by
REFERENCE and Ray workers cannot import `tests/test_backoff`, which
hangs actor creation in retry; locally-defined classes serialize by
value.
"""

import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.stages.backoff import BatchBackoff, backoff_map_batches


def _frame(n):
    return pd.DataFrame({"x": np.arange(n, dtype=np.int64)})


def _oomish(cap: int = 8):
    """Callable-class factory: fails on any batch larger than ``cap``
    — the OOM shape. Defined per-call so instances pickle by value."""

    class OOMish:
        def __init__(self, cap_: int = cap):
            self.cap = cap_

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if len(batch) > self.cap:
                raise MemoryError(f"batch of {len(batch)} too big")
            out = batch.copy()
            out["y"] = out["x"] * 2
            return out

    return OOMish


def test_oversized_batch_degrades_to_success():
    bb = BatchBackoff(_oomish(8))
    out = bb(_frame(64))
    assert len(out) == 64
    assert (out["y"].to_numpy() == np.arange(64) * 2).all()
    assert bb.dead_letters == 0


def test_poison_row_dead_lettered():
    def poison(batch: pd.DataFrame) -> pd.DataFrame:
        if (batch["x"] == 13).any():
            raise ValueError("poison row")
        out = batch.copy()
        out["y"] = out["x"] + 1
        return out

    bb = BatchBackoff(poison, expose_count=True)
    out = bb(_frame(32))
    assert len(out) == 31 and 13 not in set(out["x"])
    assert bb.dead_letters == 1
    assert out["_dead_letter"].iloc[-1] == 1


def test_systematic_failure_reraises():
    def always_fails(batch):
        raise RuntimeError("broken stage")

    bb = BatchBackoff(always_fails)
    with pytest.raises(RuntimeError):
        bb(_frame(8))


def test_backoff_map_batches_end_to_end(ray_session):
    import ray.data

    ds = ray.data.from_pandas(_frame(200)).repartition(2)
    out = backoff_map_batches(
        ds, _oomish(16), batch_size=64, concurrency=2,
    ).to_pandas()
    assert len(out) == 200
    assert (np.sort(out["y"].to_numpy()) == np.arange(200) * 2).all()


def test_evaluate_windows_backoff_matches_plain(ray_session):
    import ray.data

    from spectral_time_series_ray.stages.windows import evaluate_windows

    rng = np.random.default_rng(2)
    rows = []
    for c in range(6):
        for w in range(4):
            rows.append(
                {"conv_id": f"c{c}", "window": w,
                 "fcst_start_ts": np.datetime64("2024-01-01", "us"),
                 "context": rng.standard_normal(32),
                 "horizon": rng.standard_normal(8)}
            )
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    plain = evaluate_windows(ds, season=4).to_pandas().sort_values("conv_id").reset_index(drop=True)
    backed = evaluate_windows(ds, season=4, backoff=True).to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(plain, backed)
