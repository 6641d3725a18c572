"""Rollup correctness vs a DuckDB oracle on the synthetic transcripts,
plus the tier-cascade invariant (FIXTURES.md §4)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from spectral_time_series_ray.sources.transcripts import generate_transcripts
from spectral_time_series_ray.stages.features import with_turn_features
from spectral_time_series_ray.stages.rollup import (
    cascade,
    rollup_exact,
    rollup_mergeable,
)


@pytest.fixture(scope="module")
def small_transcripts(ray_session):
    import ray.data

    table = generate_transcripts(2000, seed=42)
    return table, ray.data.from_arrow(table)


def oracle_rollup(table, trunc: str, quantiles=True) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("transcripts", table)
    q = """
    with ordered as (
      select conv_id, ts, length(text) as text_len,
             epoch_us(ts - lag(ts) over (partition by conv_id order by turn_idx)) / 1e6
               as latency_s
      from transcripts
    )
    select conv_id, date_trunc('{t}', ts) as bucket_ts,
           count(*) as n_turns,
           count(latency_s) as count_latency,
           sum(latency_s) as sum_latency,
           min(latency_s) as min_latency,
           max(latency_s) as max_latency,
           avg(latency_s) as mean_latency,
           {quant}
           count(text_len) as count_text_len,
           sum(text_len) as sum_text_len,
           min(text_len) as min_text_len,
           max(text_len) as max_text_len,
           avg(text_len) as mean_text_len
    from ordered
    group by 1, 2
    """.format(
        t=trunc,
        quant=(
            "quantile_cont(latency_s, 0.5) as p50_latency,"
            "quantile_cont(latency_s, 0.99) as p99_latency,"
            if quantiles
            else ""
        ),
    )
    return con.execute(q).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["bucket_ts"] = pd.to_datetime(df["bucket_ts"])
    for c in df.columns:
        if df[c].dtype.kind in "if":
            df[c] = df[c].astype(np.float64)
    return (
        df.sort_values(["conv_id", "bucket_ts"])
        .reset_index(drop=True)
        .sort_index(axis=1)
    )


def compare(got: pd.DataFrame, exp: pd.DataFrame, cols=None):
    if cols is not None:
        got = got[[c for c in got.columns if c in cols]]
        exp = exp[[c for c in exp.columns if c in cols]]
    got, exp = normalize(got), normalize(exp)
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp)
    for c in got.columns:
        if got[c].dtype.kind == "f":
            np.testing.assert_allclose(
                got[c].to_numpy(), exp[c].to_numpy(), rtol=1e-9, atol=1e-9, err_msg=c
            )
        else:
            assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_rollup_exact_matches_duckdb_1m(small_transcripts):
    table, ds = small_transcripts
    feats = with_turn_features(ds, include_text=False)
    got = rollup_exact(feats, "1m").to_pandas()
    exp = oracle_rollup(table, "minute")
    # p50/p99 for text_len not in oracle; restrict to shared columns
    compare(got, exp, cols=set(exp.columns))


def test_rollup_exact_matches_duckdb_1h(small_transcripts):
    table, ds = small_transcripts
    feats = with_turn_features(ds, include_text=False)
    got = rollup_exact(feats, "1h").to_pandas()
    exp = oracle_rollup(table, "hour")
    compare(got, exp, cols=set(exp.columns))


MERGEABLE = [
    "conv_id", "bucket_ts",
    "count_latency", "sum_latency", "min_latency", "max_latency", "mean_latency",
    "count_text_len", "sum_text_len", "min_text_len", "max_text_len", "mean_text_len",
]


def test_rollup_mergeable_matches_exact(small_transcripts):
    table, ds = small_transcripts
    feats = with_turn_features(ds, include_text=False)
    got = rollup_mergeable(feats, "1m").to_pandas()
    exp = oracle_rollup(table, "minute", quantiles=False)
    compare(got, exp, cols=MERGEABLE)


def test_rollup_mergeable_salted(small_transcripts):
    table, ds = small_transcripts
    feats = with_turn_features(ds, include_text=False)
    got = rollup_mergeable(feats, "1m", salt=4).to_pandas()
    exp = oracle_rollup(table, "minute", quantiles=False)
    compare(got, exp, cols=MERGEABLE)


def test_cascade_equals_direct(small_transcripts):
    """1h-from-1m cascade == direct 1h rollup (mergeable stats)."""
    table, ds = small_transcripts
    feats = with_turn_features(ds, include_text=False)
    m1 = rollup_mergeable(feats, "1m")
    got = cascade(m1, "1h").to_pandas()
    exp = oracle_rollup(table, "hour", quantiles=False)
    compare(got, exp, cols=MERGEABLE)
    # and 1d from 1h
    feats2 = with_turn_features(ds, include_text=False)
    h1 = rollup_mergeable(feats2, "1h")
    got_d = cascade(h1, "1d").to_pandas()
    exp_d = oracle_rollup(table, "day", quantiles=False)
    compare(got_d, exp_d, cols=MERGEABLE)


def test_text_passthrough_equality(small_transcripts):
    """Per-turn text byte-equality under restored (conv_id, turn_idx)
    order — the input_hint invariant."""
    table, ds = small_transcripts
    feats = with_turn_features(ds, include_text=True)
    got = feats.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp = table.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (got["text"].to_numpy() == exp["text"].to_numpy()).all()
    assert (got["turn_idx"].to_numpy() == exp["turn_idx"].to_numpy()).all()
