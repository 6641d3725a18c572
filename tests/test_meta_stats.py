"""_ts_minmax_meta: parquet-footer min/max must equal the scan's, on
single- and multi-row-group files, and return None when statistics
are absent (forcing callers onto the scan fallback)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from spectral_time_series_ray.pipelines.queries import _ts_minmax_meta


def _write(tmp_path, name, df, row_group_size=None, write_statistics=True):
    d = tmp_path / name
    d.mkdir()
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(d / "events.parquet"),
        row_group_size=row_group_size,
        write_statistics=write_statistics,
    )
    return str(d)


def test_meta_minmax_multi_row_group(tmp_path):
    rng = np.random.default_rng(11)
    ts = pd.to_datetime("2024-03-01") + pd.to_timedelta(
        rng.integers(0, 10_000_000, 5000), unit="s"
    )
    df = pd.DataFrame({"ts": ts.astype("datetime64[us]"), "v": rng.random(5000)})
    d = _write(tmp_path, "multi", df, row_group_size=512)
    assert pq.ParquetFile(f"{d}/events.parquet").metadata.num_row_groups > 1
    lo, hi = _ts_minmax_meta(d, "events")
    assert lo == df["ts"].min() and hi == df["ts"].max()


def test_meta_minmax_missing_stats_returns_none(tmp_path):
    df = pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-01", "2024-01-02"]).astype("datetime64[us]")}
    )
    d = _write(tmp_path, "nostats", df, write_statistics=False)
    assert _ts_minmax_meta(d, "events") is None


def test_meta_minmax_missing_column_returns_none(tmp_path):
    df = pd.DataFrame({"x": [1, 2, 3]})
    d = _write(tmp_path, "nocol", df)
    assert _ts_minmax_meta(d, "events", col="ts") is None
