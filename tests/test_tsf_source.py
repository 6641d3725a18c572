"""Monash .tsf source: header parse, zip handling, NaN markers,
value round-trip at float32, and freq alias mapping.

Reference semantics: gluonts.py:345-403 emits (item_id, start, freq,
target) rows per series from Monash archives; this reader produces
the same shape from the raw TSF wire format."""

import numpy as np
import pandas as pd
import pytest


def _fixture_df():
    rng = np.random.default_rng(7)
    return pd.DataFrame(
        {
            "item_id": [f"T{i}" for i in range(5)],
            "start": pd.to_datetime(
                ["2020-01-01", "2020-01-02", "2020-03-05",
                 "2021-07-01", "2019-12-31"]
            ),
            "target": [
                np.where(rng.random(n) < 0.1, np.nan, rng.random(n) * 100.0)
                for n in (20, 35, 8, 50, 3)
            ],
        }
    )


def test_tsf_roundtrip(ray_session, tmp_path):
    from spectral_time_series_ray.sources.tsf import read_tsf, write_tsf

    df = _fixture_df()
    path = str(tmp_path / "fixture.tsf")
    write_tsf(df, path, frequency="daily")
    got = read_tsf(path).to_pandas().sort_values("item_id").reset_index(drop=True)
    assert list(got["item_id"]) == list(df["item_id"])
    assert (got["freq"] == "D").all()
    assert got["start"].tolist() == df["start"].tolist()
    for g, e in zip(got["target"], df["target"]):
        g = np.asarray(g, np.float32)
        e = np.asarray(e, np.float32)
        assert len(g) == len(e)
        assert np.array_equal(np.isnan(g), np.isnan(e))
        assert np.array_equal(g[~np.isnan(g)], e[~np.isnan(e)])  # bit-exact


def test_tsf_zip_and_header(ray_session, tmp_path):
    import zipfile

    from spectral_time_series_ray.sources.tsf import (
        read_tsf,
        read_tsf_header,
        write_tsf,
    )

    df = _fixture_df()
    tsf = str(tmp_path / "arch.tsf")
    write_tsf(df, tsf, frequency="half_hourly")
    zpath = str(tmp_path / "arch.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(tsf, "arch.tsf")

    hdr = read_tsf_header(tsf)
    assert [n for n, _ in hdr.attributes] == ["series_name", "start_timestamp"]
    assert hdr.freq_alias == "30min"
    assert hdr.missing is True and hdr.equal_length is False

    got = (
        read_tsf(zpath, scratch_dir=str(tmp_path))
        .to_pandas()
        .sort_values("item_id")
        .reset_index(drop=True)
    )
    assert len(got) == 5
    assert (got["freq"] == "30min").all()


def test_tsf_bad_line_raises(ray_session, tmp_path):
    from spectral_time_series_ray.sources.tsf import read_tsf

    path = str(tmp_path / "bad.tsf")
    with open(path, "w") as f:
        f.write("@attribute series_name string\n@frequency daily\n@data\n")
        f.write("only_one_field\n")
    with pytest.raises(Exception):
        read_tsf(path).materialize()


def test_tsf_item_id_without_series_name(ray_session, tmp_path):
    # documented schema guarantee: item_id ALWAYS exists — promoted
    # from the first declared attribute when series_name is absent,
    # synthesized (content-stable digest) when there are no attributes
    from spectral_time_series_ray.sources.tsf import read_tsf

    p1 = str(tmp_path / "noname.tsf")
    with open(p1, "w") as f:
        f.write("@attribute region string\n@frequency daily\n@data\n")
        f.write("north:1.0,2.0,?\n")
        f.write("south: 3.5 ,4.5\n")  # padded tokens must be stripped
    got = read_tsf(p1).to_pandas().sort_values("item_id").reset_index(drop=True)
    assert list(got["item_id"]) == ["north", "south"]
    assert list(got["region"]) == ["north", "south"]
    a = np.asarray(got.loc[1, "target"], np.float32)
    assert np.allclose(a, [3.5, 4.5])

    p2 = str(tmp_path / "bare.tsf")
    with open(p2, "w") as f:
        f.write("@frequency daily\n@data\n")
        f.write("1.0,2.0\n")
        f.write("9.0,8.0,7.0\n")
    got2 = read_tsf(p2).to_pandas()
    assert got2["item_id"].str.match(r"h[0-9a-f]{16}").all()
    assert got2["item_id"].is_unique


def test_tsf_numeric_attr_padded_missing(ray_session, tmp_path):
    from spectral_time_series_ray.sources.tsf import read_tsf

    p = str(tmp_path / "num.tsf")
    with open(p, "w") as f:
        f.write("@attribute series_name string\n@attribute scale numeric\n")
        f.write("@frequency daily\n@data\n")
        f.write("a: ? :1.0,2.0\n")  # '?' with padding → null, not crash
        f.write("b:2.5:3.0\n")
    got = read_tsf(p).to_pandas().sort_values("item_id").reset_index(drop=True)
    assert pd.isna(got.loc[0, "scale"]) and got.loc[1, "scale"] == 2.5
