"""Local mirror of the driver's correctness gate: run each queries()
entry and its oracle_sql() side by side on an sf dir and compare
row-count + schema + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res):
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bool):
            df[c] = df[c].astype(bool)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64")
    df = df.sort_index(axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name, got, exp) -> str:
    got, exp = canon(got), canon(exp)
    if list(got.columns) != list(exp.columns):
        return f"SCHEMA got={list(got.columns)} exp={list(exp.columns)}"
    if len(got) != len(exp):
        return f"ROWS got={len(got)} exp={len(exp)}"
    # the driver hashes TYPED values, so int64 1 vs float64 1.0 is a
    # hash mismatch even though numpy == says equal — flag dtype drift
    for c in got.columns:
        gk, ek = got[c].dtype.kind, exp[c].dtype.kind
        if (gk in "iuf" or ek in "iuf") and gk != ek:
            return f"DTYPE col={c} got={got[c].dtype} exp={exp[c].dtype}"
    for c in got.columns:
        g, e = got[c].to_numpy(), exp[c].to_numpy()
        if got[c].dtype.kind == "f":
            # The driver hashes typed BYTES, under which -0.0 != 0.0 and
            # NaN payloads matter, while numpy == treats -0.0 == 0.0 and
            # NaN != NaN.  Compare NaN-normalized int64 bit views so this
            # gate is byte-equivalent to the driver's hash (round-3
            # verdict: ev_seasonal_decompose shipped red because == hid a
            # -0.0/-+0.0 divergence this comparator could not see).
            gq = np.where(np.isnan(g), np.float64("nan"), g)
            eq = np.where(np.isnan(e), np.float64("nan"), e)
            ok = gq.view(np.int64) == eq.view(np.int64)
        elif got[c].dtype.kind == "M":
            both_nan = pd.isna(g) & pd.isna(e)
            ok = both_nan | (g == e)
        else:
            ok = g == e
        if not ok.all():
            i = int(np.flatnonzero(~ok)[0])
            return f"VALUES col={c} row={i} got={g[i]!r} exp={e[i]!r}"
    return "OK"


def _chunked_sweep(sf_dir: str, chunk: int = 24) -> int:
    """Full sweep as fresh subprocesses of ``chunk`` queries each.

    One process for the whole suite degrades: Ray's _StatsActor
    bookkeeping grows with every Dataset created and after ~150
    queries the driver crawls with the StatsActor pegged. Respawning
    this script per chunk keeps each Ray session small."""
    import importlib.util
    import subprocess

    spec = importlib.util.spec_from_file_location(
        "e", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__ray_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    names = list(mod.queries())
    rc = 0
    for i in range(0, len(names), chunk):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), sf_dir,
             *names[i:i + chunk]])
        rc |= r.returncode
    return rc


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not only:
        sys.exit(_chunked_sweep(sf_dir))

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name:28s} RAY-ERROR {type(e).__name__}: {e}")
            fails += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            ok = bool(got["ok"].all()) if "ok" in got.columns else None
            print(f"{name:28s} rows-only rows={len(got)} ok={ok} ({dt:.1f}s)")
            if len(got) == 0 or ok is False:
                fails += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name:28s} SQL-ERROR {e}")
            fails += 1
            continue
        verdict = compare(name, got, exp)
        print(f"{name:28s} {verdict} rows={len(got)} ({dt:.1f}s)")
        if verdict != "OK":
            fails += 1
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
