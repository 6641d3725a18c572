"""Driver-contract smoke: entry() runs, queries()/oracle_sql() agree on
keys, and a fast subset matches DuckDB at sf0.001 (the full sweep runs
via tools/check_oracle.py at sf0.01)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__

    return __ray_entry__


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from read_parquet('{SF}/{t}.parquet')")
    return con


def to_pandas(res):
    return res if isinstance(res, pd.DataFrame) else res.to_pandas()


def canon(df):
    df = df.copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64")
    df = df.sort_index(axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_oracle_keys_subset(entry_mod):
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(os_) >= 15  # broad oracle coverage is part of the contract


@pytest.mark.parametrize(
    "name",
    ["ev_rollup_1m", "ev_cascade_1h", "ev_sessions", "q1_pricing",
     "doc_exact_dedup", "emb_ann_topk", "ev_gapfill_1h",
     "ev_welch_ttest", "ev_anova", "ev_spearman_user",
     "ev_trimmed_mean", "ev_kendall_tau",
     # transcript-table oracles (fixed symlink view — the query runs
     # first and links the scale's transcripts cache for the SQL side)
     "tr_rollup_1m", "tr_sessions", "tr_latency_histogram",
     "tr_text_len_by_role"],
)
def test_query_matches_oracle_sf0001(entry_mod, oracle_con, name):
    got = canon(to_pandas(entry_mod.queries()[name](SF)))
    exp = canon(oracle_con.execute(entry_mod.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    for c in got.columns:
        g, e = got[c].to_numpy(), exp[c].to_numpy()
        if got[c].dtype.kind == "f":
            ok = (pd.isna(g) & pd.isna(e)) | (g == e)
        else:
            ok = g == e
        assert ok.all(), (name, c, np.flatnonzero(~ok)[:5])


def test_entry_returns_rows(entry_mod):
    res = entry_mod.entry()
    n = res.count() if hasattr(res, "count") else len(res)
    assert n > 0
