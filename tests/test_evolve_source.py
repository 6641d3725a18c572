"""Schema-evolution-tolerant parquet reading."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spectral_time_series_ray.sources.evolve import (
    normalize_to_schema,
    read_parquet_evolved,
    unify_parquet_schemas,
)


@pytest.fixture()
def evolved_dir(tmp_path):
    d = tmp_path / "shards"
    d.mkdir()
    # v1: (id int32, name string)
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int32()),
                  "name": pa.array(["a", "b"])}),
        d / "v1.parquet",
    )
    # v2: adds score float64, widens id to int64
    pq.write_table(
        pa.table({"id": pa.array([3, 4], pa.int64()),
                  "name": pa.array(["c", "d"]),
                  "score": pa.array([1.5, 2.5])}),
        d / "v2.parquet",
    )
    # v3: different column order, int32 score
    pq.write_table(
        pa.table({"score": pa.array([9, 10], pa.int32()),
                  "id": pa.array([5, 6], pa.int32()),
                  "name": pa.array(["e", "f"])}),
        d / "v3.parquet",
    )
    return str(d)


def test_unify_schemas(evolved_dir):
    import os

    files = sorted(
        os.path.join(evolved_dir, n) for n in os.listdir(evolved_dir)
    )
    sch = unify_parquet_schemas(files)
    assert sch.field("id").type == pa.int64()
    assert sch.field("name").type == pa.string()
    assert sch.field("score").type == pa.float64()


def test_normalize_fills_and_casts():
    target = pa.schema([("id", pa.int64()), ("score", pa.float64())])
    out = normalize_to_schema(
        pa.table({"id": pa.array([1], pa.int32()), "extra": pa.array(["x"])}),
        target,
    )
    assert out.schema == target
    assert out["score"].null_count == 1
    assert out["id"].type == pa.int64()


def test_read_parquet_evolved(ray_session, evolved_dir):
    ds = read_parquet_evolved(evolved_dir)
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(df["id"]) == [1, 2, 3, 4, 5, 6]
    assert df["score"].isna().sum() == 2  # v1 rows
    assert df.loc[df["id"] == 5, "score"].iloc[0] == 9.0
    # schema is stable across blocks
    types = dict(zip(ds.schema().names, ds.schema().types))
    assert types["id"] == pa.int64()
    assert types["score"] == pa.float64()


def test_read_parquet_evolved_column_projection(ray_session, evolved_dir):
    ds = read_parquet_evolved(evolved_dir, columns=["id", "score"])
    df = ds.to_pandas()
    assert set(df.columns) == {"id", "score"}
    assert len(df) == 6
