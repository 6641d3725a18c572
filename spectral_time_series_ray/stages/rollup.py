"""Tiered tumbling rollups (1m / 1h / 1d) — the engine's wide step.

Two paths, matching SURVEY.md §7.3:

- :func:`rollup_exact` — one hash shuffle on ``(key, bucket)``; all
  stats (count/sum/min/max/mean + exact p50/p99) computed per group.
  Quantiles are exact (``np.quantile`` linear interpolation, equal to
  DuckDB ``quantile_cont``) — groups are bounded by turns-per-bucket,
  so exact in-group quantiles are safe (SURVEY.md §7.4).
- :func:`rollup_mergeable` — **salted partial pre-aggregation**:
  vectorized per-batch Arrow ``group_by`` partials (count/sum/min/max)
  followed by a small final ``groupby().aggregate`` merge. This is the
  scale path: the shuffle moves one row per (key, bucket[, salt]) per
  batch instead of every input row. Quantiles are not mergeable and
  are deliberately absent here (north-star design).
- :func:`cascade` — re-bucket a finer tier's mergeable rollup into a
  coarser tier and merge (1m -> 1h -> 1d). Oracle invariant:
  cascade == direct rollup for all mergeable stats (FIXTURES.md §4).

Grouping semantics model the reference's grouped masked reductions
(`uni2ts/src/uni2ts/loss/packed/_base.py:76-106` reduce_loss;
`uni2ts/src/uni2ts/module/packed_scaler.py:78-122`): aggregate over
observed (non-null) values per group key.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .. import TIER_SECONDS, TIER_UNIT

BUCKET_COL = "bucket_ts"


def short_name(col: str) -> str:
    return col.removesuffix("_s")


def add_bucket(ds, tier: str, ts_col: str = "ts"):
    """Tumbling-window assignment: bucket_ts = floor_temporal(ts, tier).

    The reference's windows are stride-enumerated crops over a regular
    grid (EvalCrop, `uni2ts/src/uni2ts/transform/crop.py:134-147`);
    with irregular event time the tumbling bucket is the equivalent
    deterministic window key.
    """
    unit = TIER_UNIT[tier]

    def _bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(BUCKET_COL, pc.floor_temporal(batch[ts_col], unit=unit))

    return ds.map_batches(_bucket, batch_format="pyarrow", batch_size=None)


def _bucket_stats_frame(
    df: pd.DataFrame,
    key_value,
    key: str,
    bucket_us: np.ndarray,
    value_cols: tuple[str, ...],
    quantiles: tuple[float, ...],
) -> pd.DataFrame:
    """Per-bucket stats for ONE key group, pure numpy segmented
    reductions (bincount / reduceat) — ~10x cheaper than a pandas
    groupby with per-group quantile calls.

    Semantics: count/sum/min/max/mean over observed (non-NaN) values;
    sum of an empty set is NaN (SQL NULL); quantiles use linear
    interpolation at position q*(n-1) — identical to np.quantile /
    pandas / DuckDB quantile_cont.
    """
    buckets, inverse, n_turns = np.unique(bucket_us, return_inverse=True, return_counts=True)
    nb = len(buckets)
    out: dict[str, np.ndarray] = {}
    out[key] = np.repeat(key_value, nb)
    out[BUCKET_COL] = buckets.astype("datetime64[us]")
    out["n_turns"] = n_turns
    for col in value_cols:
        s = short_name(col)
        v = df[col].to_numpy(dtype=np.float64)
        mask = ~np.isnan(v)
        b, vv = inverse[mask], v[mask]
        count = np.bincount(b, minlength=nb).astype(np.int64)
        sums = np.bincount(b, weights=vv, minlength=nb)  # row-order accumulation
        has = count > 0
        sum_col = np.where(has, sums, np.nan)
        mean_col = np.where(has, sums / np.maximum(count, 1), np.nan)
        min_col = np.full(nb, np.nan)
        max_col = np.full(nb, np.nan)
        qcols = {q: np.full(nb, np.nan) for q in quantiles}
        if len(vv):
            order = np.lexsort((vv, b))
            b_s, v_s = b[order], vv[order]
            seg_ids, starts = np.unique(b_s, return_index=True)
            ends = np.append(starts[1:], len(v_s))
            min_col[seg_ids] = v_s[starts]
            max_col[seg_ids] = v_s[ends - 1]
            cnt = ends - starts
            for q in quantiles:
                # segment-RELATIVE fraction — see _segmented_stats for
                # why offsetting by `starts` before flooring loses
                # precision proportional to the global row offset
                rel = q * (cnt - 1)
                lo_rel = np.floor(rel).astype(np.int64)
                frac = rel - lo_rel
                lo = starts + lo_rel
                hi = np.minimum(lo + 1, ends - 1)
                qcols[q][seg_ids] = v_s[lo] * (1.0 - frac) + v_s[hi] * frac
        out[f"count_{s}"] = count
        out[f"sum_{s}"] = sum_col
        out[f"min_{s}"] = min_col
        out[f"max_{s}"] = max_col
        out[f"mean_{s}"] = mean_col
        for q in quantiles:
            out[f"p{int(q * 100)}_{s}"] = qcols[q]
    return pd.DataFrame(out)


def _exact_group_fn(tier: str, key: str, value_cols: tuple[str, ...], quantiles: tuple[float, ...]):
    step_us = TIER_SECONDS[tier] * 1_000_000

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["ts"].to_numpy(dtype="datetime64[us]").view("int64")
        bucket_us = (ts_us // step_us) * step_us  # == floor_temporal (UTC)
        return _bucket_stats_frame(df, df[key].iloc[0], key, bucket_us, value_cols, quantiles)

    return fn


def rollup_exact(
    ds,
    tier: str,
    value_cols: Iterable[str] = ("latency_s", "text_len"),
    quantiles: tuple[float, ...] = (0.5, 0.99),
    key: str = "conv_id",
):
    """Exact per-(key, bucket) stats incl. quantiles; single shuffle.

    Shuffles on ``key`` only (far fewer groups than (key, bucket)) and
    computes all buckets of a key vectorized inside the group —
    per-group Python overhead is O(#keys), not O(#keys x #buckets).
    Projects to the needed columns before the shuffle so wide columns
    (text) never move (SURVEY.md §7.4).
    """
    value_cols = tuple(value_cols)
    ds = ds.select_columns([key, "ts", *value_cols])
    return ds.groupby(key).map_groups(
        _exact_group_fn(tier, key, value_cols, quantiles), batch_format="pandas"
    )


def _segmented_stats(
    v: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    seg_of_row: np.ndarray,
    quantiles: tuple[float, ...],
) -> dict[str, np.ndarray]:
    """count/sum/min/max/mean + quantiles per contiguous segment of a
    row-ordered value array — one numpy pass each, zero Python loops
    over segments. NaN = unobserved."""
    mask = ~np.isnan(v)
    cnt = np.add.reduceat(mask.astype(np.int64), starts)
    sums = np.add.reduceat(np.nan_to_num(v), starts)
    mins = np.minimum.reduceat(np.where(mask, v, np.inf), starts)
    maxs = np.maximum.reduceat(np.where(mask, v, -np.inf), starts)
    has = cnt > 0
    out = {
        "count": cnt,
        "sum": np.where(has, sums, np.nan),
        "min": np.where(has, mins, np.nan),
        "max": np.where(has, maxs, np.nan),
        "mean": np.where(has, sums / np.maximum(cnt, 1), np.nan),
    }
    if quantiles:
        # sort values within each segment (NaN sorts last), then index
        # the q-position with linear interpolation.  The fraction MUST
        # be computed in segment-RELATIVE coordinates: adding the
        # segment's global row offset (`starts`, up to millions) before
        # taking the fractional part leaks ~eps*starts into frac, and
        # frac error is amplified by the value gap (a 1e-10 frac slip
        # across a 4000-second latency outlier moved p99 by ~0.4 us —
        # enough to flip a fixed-decimal digit, and dependent on
        # partition layout).  Relative frac matches the textbook
        # q*(n-1) formula bit-for-bit regardless of offset.
        order = np.lexsort((v, seg_of_row))
        v_s = v[order]
        for q in quantiles:
            rel = np.where(has, q * (cnt - 1), 0.0)
            lo_rel = np.floor(rel).astype(np.int64)
            frac = rel - lo_rel
            lo = starts + lo_rel
            hi = np.minimum(lo + 1, np.maximum(starts + cnt - 1, starts))
            qv = v_s[lo] * (1.0 - frac) + v_s[hi] * frac
            out[f"q{q}"] = np.where(has, qv, np.nan)
    return out


def partitions_for_input(
    input_bytes: int | None, target_partition_bytes: int = 256 << 20
) -> int:
    """Shuffle partition count sized by INPUT BYTES, floored by cluster
    parallelism. Each ``groupby(_part).map_groups`` group materializes
    ``input/P`` rows in one pandas frame, so P must grow with the data
    (target ~256 MB per partition) — tying P to CPUs alone is a memory
    cliff at 100 TB on a fixed-size cluster (round-1 verdict)."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    floor = 4 * cpus
    if not input_bytes:
        return floor
    return max(floor, -(-int(input_bytes) // target_partition_bytes))


def rollup_transcripts(
    ds,
    tier: str,
    quantiles: tuple[float, ...] = (0.5, 0.99),
    key: str = "conv_id",
    num_partitions: int | None = None,
    input_bytes: int | None = None,
):
    """FUSED transcript rollup: ONE int-keyed shuffle, partition-level
    numpy.

    Pre-shuffle (vectorized map_batches): text_len (pyarrow) and a
    deterministic hash partition ``_part = siphash(conv_id) % P``.
    The shuffle moves P integer keys instead of millions of string
    keys; inside each partition ONE numpy pass lexsorts (conv, turn),
    derives latency with conversation-boundary NaNs (causal ops never
    cross series — reference precondition.py:176-185 invariant),
    assigns tumbling buckets, and computes all per-(conv, bucket)
    stats via segmented reduceat — no per-conversation Python calls.
    Equivalent to features.with_turn_features -> per-group stats, but
    ~10x cheaper at 10M+ rows.
    """
    import pyarrow.compute as pc_  # noqa: N813

    if num_partitions is None:
        num_partitions = partitions_for_input(input_bytes)
    step_us = TIER_SECONDS[tier] * 1_000_000

    P = num_partitions

    def derive(batch: pa.Table) -> pa.Table:
        # ONE pre-shuffle pass: text_len + hash partition, projecting
        # text away immediately so the wide string column never
        # shuffles (only the key column converts to pandas, for the
        # deterministic hash). Pre-derived inputs (text_len already
        # present) pass through.
        if "text" in batch.column_names:
            tl = pc_.utf8_length(batch["text"])
        else:
            tl = batch["text_len"]
        part = (
            pd.util.hash_pandas_object(
                batch[key].to_pandas(), index=False
            ).to_numpy()
            % P
        ).astype(np.int32)
        return pa.table(
            {
                key: batch[key],
                "turn_idx": batch["turn_idx"],
                "ts": batch["ts"],
                "text_len": tl,
                "_part": pa.array(part),
            }
        )

    ds = ds.map_batches(derive, batch_format="pyarrow", batch_size=None)

    def _empty_out() -> pd.DataFrame:
        cols: dict[str, pd.Series] = {
            key: pd.Series([], dtype=object),
            BUCKET_COL: pd.Series([], dtype="datetime64[us]"),
            "n_turns": pd.Series([], dtype=np.int64),
        }
        for col in ("latency_s", "text_len"):
            s = short_name(col)
            cols[f"count_{s}"] = pd.Series([], dtype=np.int64)
            for stat in ("sum", "min", "max", "mean"):
                cols[f"{stat}_{s}"] = pd.Series([], dtype=np.float64)
            for q in quantiles:
                cols[f"p{int(q * 100)}_{s}"] = pd.Series([], dtype=np.float64)
        return pd.DataFrame(cols)

    def partition_fn(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            # typed empty frame: an untyped pd.DataFrame() makes Ray
            # emit schema-mismatch warnings and can poison downstream
            # schema inference for the whole dataset
            return _empty_out()
        codes, uniques = pd.factorize(df[key], sort=False)
        order = np.lexsort((df["turn_idx"].to_numpy(), codes))
        codes_s = codes[order]
        ts_us = df["ts"].to_numpy(dtype="datetime64[us]").view("int64")[order]
        text_len = df["text_len"].to_numpy(dtype=np.float64)[order]
        new_conv = np.empty(n, dtype=bool)
        new_conv[0] = True
        new_conv[1:] = codes_s[1:] != codes_s[:-1]
        lat = np.empty(n)
        lat[1:] = (ts_us[1:] - ts_us[:-1]) / 1e6
        lat[new_conv] = np.nan  # first turn: no predecessor
        bucket_us = (ts_us // step_us) * step_us
        # latency comes from TURN order (above); segmentation needs
        # bucket-sorted order within each conv — inputs whose ts is not
        # monotone in turn_idx would otherwise split one (conv, bucket)
        # into several segments. The re-sort is CONDITIONAL: one cheap
        # monotonicity scan skips the lexsort + 4 reindex copies on the
        # (overwhelmingly common) already-sorted case.
        out_of_order = bool(np.any((bucket_us[1:] < bucket_us[:-1]) & ~new_conv[1:]))
        if out_of_order:
            order2 = np.lexsort((bucket_us, codes_s))
            codes_s = codes_s[order2]
            bucket_us = bucket_us[order2]
            lat = lat[order2]
            text_len = text_len[order2]
        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        new_seg[1:] = (codes_s[1:] != codes_s[:-1]) | (bucket_us[1:] != bucket_us[:-1])
        seg_of_row = np.cumsum(new_seg) - 1
        starts = np.flatnonzero(new_seg)
        ends = np.append(starts[1:], n)
        out: dict[str, np.ndarray] = {
            key: np.asarray(uniques)[codes_s[starts]],
            BUCKET_COL: bucket_us[starts].astype("datetime64[us]"),
            "n_turns": ends - starts,
        }
        for col, v in (("latency_s", lat), ("text_len", text_len)):
            s = short_name(col)
            st = _segmented_stats(v, starts, ends, seg_of_row, quantiles)
            out[f"count_{s}"] = st["count"]
            out[f"sum_{s}"] = st["sum"]
            out[f"min_{s}"] = st["min"]
            out[f"max_{s}"] = st["max"]
            out[f"mean_{s}"] = st["mean"]
            for q in quantiles:
                out[f"p{int(q * 100)}_{s}"] = st[f"q{q}"]
        return pd.DataFrame(out)

    # int-keyed sort shuffle on P partitions. (A hash-shuffle keyed
    # repartition was tried — Ray 2.49's HASH_SHUFFLE aggregator actors
    # starve under small num_cpus sessions and hang; the int-key sort
    # moves P integers and scales acceptably.)
    return (
        ds.groupby("_part")
        .map_groups(partition_fn, batch_format="pandas")
    )


def _partial_batch(keys: tuple[str, ...], value_cols: tuple[str, ...]):
    aggs = [(c, f) for c in value_cols for f in ("count", "sum", "min", "max")]

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(list(keys)).aggregate(aggs)

    return partial


def _colmap(value_cols: tuple[str, ...], style: str) -> dict:
    out = {}
    for col in value_cols:
        s = short_name(col)
        out[s] = {
            "arrow": (f"{col}_count", f"{col}_sum", f"{col}_min", f"{col}_max"),
            "merged": (f"count_{s}", f"sum_{s}", f"min_{s}", f"max_{s}"),
        }[style]
    return out


def _merge_partitioned(
    ds,
    key: str,
    value_cols: tuple[str, ...],
    style: str,
    num_partitions: int | None = None,
    extra_key: str | None = None,
):
    """Partition-level partial-stat merge for the hot (key, bucket)
    shape: hash the key to an int partition, shuffle P integer keys,
    and merge ALL (key, bucket) groups of a partition in one numpy
    lexsort + reduceat pass — per-group Python overhead is O(P), not
    O(#keys) (the same design as rollup_transcripts; a per-key
    map_groups was measured 2-3x slower at 1.7M partial rows).

    ``extra_key``: optional small-int column added to the group
    identity (between key and bucket) and carried to the output —
    the hook that lets :func:`cascade_multi` merge several tiers in
    ONE exchange."""
    colmap = _colmap(value_cols, style)
    P = num_partitions or partitions_for_input(None)

    def add_part(batch: pa.Table) -> pa.Table:
        part = (
            pd.util.hash_pandas_object(
                batch[key].to_pandas(), index=False
            ).to_numpy()
            % P
        ).astype(np.int32)
        return batch.append_column("_part", pa.array(part))

    ds = ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            cols: dict[str, pd.Series] = {
                key: pd.Series([], dtype=object),
                BUCKET_COL: pd.Series([], dtype="datetime64[us]"),
            }
            if extra_key is not None:
                cols[extra_key] = pd.Series([], dtype=np.int64)
            for s in colmap:
                cols[f"count_{s}"] = pd.Series([], dtype=np.int64)
                for stat in ("sum", "min", "max"):
                    cols[f"{stat}_{s}"] = pd.Series([], dtype=np.float64)
            return pd.DataFrame(cols)
        codes, uniques = pd.factorize(df[key], sort=False)
        b = df[BUCKET_COL].to_numpy(dtype="datetime64[us]").view("int64")
        if extra_key is not None:
            e = df[extra_key].to_numpy(np.int64)
            order = np.lexsort((b, e, codes))
            codes_s, b_s, e_s = codes[order], b[order], e[order]
            new_seg = np.empty(n, dtype=bool)
            new_seg[0] = True
            new_seg[1:] = (
                (codes_s[1:] != codes_s[:-1])
                | (e_s[1:] != e_s[:-1])
                | (b_s[1:] != b_s[:-1])
            )
        else:
            order = np.lexsort((b, codes))
            codes_s, b_s = codes[order], b[order]
            new_seg = np.empty(n, dtype=bool)
            new_seg[0] = True
            new_seg[1:] = (codes_s[1:] != codes_s[:-1]) | (b_s[1:] != b_s[:-1])
        starts = np.flatnonzero(new_seg)
        out: dict[str, np.ndarray] = {
            key: np.asarray(uniques)[codes_s[starts]],
            BUCKET_COL: b_s[starts].astype("datetime64[us]"),
        }
        if extra_key is not None:
            out[extra_key] = e_s[starts]
        for s, (c_count, c_sum, c_min, c_max) in colmap.items():
            cnt = np.add.reduceat(
                df[c_count].to_numpy(dtype=np.float64)[order], starts
            ).astype(np.int64)
            sums = np.add.reduceat(
                np.nan_to_num(df[c_sum].to_numpy(dtype=np.float64)[order]), starts
            )
            mins = np.minimum.reduceat(
                np.nan_to_num(df[c_min].to_numpy(dtype=np.float64)[order], nan=np.inf),
                starts,
            )
            maxs = np.maximum.reduceat(
                np.nan_to_num(df[c_max].to_numpy(dtype=np.float64)[order], nan=-np.inf),
                starts,
            )
            has = cnt > 0
            out[f"count_{s}"] = cnt
            out[f"sum_{s}"] = np.where(has, sums, np.nan)
            out[f"min_{s}"] = np.where(has, mins, np.nan)
            out[f"max_{s}"] = np.where(has, maxs, np.nan)
        return pd.DataFrame(out)

    return ds.groupby("_part").map_groups(fn, batch_format="pandas")


def _merge(ds, keys: list[str], value_cols: tuple[str, ...], style: str):
    """Merge partial stats: shuffle on the FIRST key only, then a
    vectorized pandas groupby over the remaining keys inside each
    group (per-group Python overhead is O(#keys), not O(#groups) —
    same pattern as rollup_exact).

    style='arrow': input columns are Arrow group_by names
    ('{col}_count', ...); style='merged': input columns are final names
    ('count_{short}', ...). Output always uses final names.
    """
    head, sub = keys[0], list(keys[1:])
    colmap = {}
    for col in value_cols:
        s = short_name(col)
        cn = {
            "arrow": (f"{col}_count", f"{col}_sum", f"{col}_min", f"{col}_max"),
            "merged": (f"count_{s}", f"sum_{s}", f"min_{s}", f"max_{s}"),
        }[style]
        colmap[s] = cn

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if len(sub) == 1 and sub[0] == BUCKET_COL:
            # numpy fast path (segmented bincount/reduceat, no pandas
            # groupby): the hot shape — merge partials per bucket
            b = df[BUCKET_COL].to_numpy(dtype="datetime64[us]").view("int64")
            buckets, inverse, _ = np.unique(b, return_inverse=True, return_counts=True)
            nb = len(buckets)
            order = np.argsort(inverse, kind="stable")
            starts = np.searchsorted(inverse[order], np.arange(nb))
            out: dict[str, np.ndarray] = {
                head: np.repeat(df[head].iloc[0], nb),
                BUCKET_COL: buckets.astype("datetime64[us]"),
            }
            for s, (c_count, c_sum, c_min, c_max) in colmap.items():
                count = np.bincount(inverse, weights=df[c_count].to_numpy(dtype=np.float64), minlength=nb).astype(np.int64)
                sums = np.bincount(inverse, weights=np.nan_to_num(df[c_sum].to_numpy(dtype=np.float64)), minlength=nb)
                mins = np.minimum.reduceat(np.nan_to_num(df[c_min].to_numpy(dtype=np.float64)[order], nan=np.inf), starts)
                maxs = np.maximum.reduceat(np.nan_to_num(df[c_max].to_numpy(dtype=np.float64)[order], nan=-np.inf), starts)
                has = count > 0
                out[f"count_{s}"] = count
                out[f"sum_{s}"] = np.where(has, sums, np.nan)
                out[f"min_{s}"] = np.where(has, mins, np.nan)
                out[f"max_{s}"] = np.where(has, maxs, np.nan)
            return pd.DataFrame(out)
        g = df.groupby(sub, sort=True)
        out = {}
        for s, (c_count, c_sum, c_min, c_max) in colmap.items():
            count = g[c_count].sum()
            total = g[c_sum].sum()  # skipna: null partials drop out
            out[f"count_{s}"] = count
            out[f"sum_{s}"] = total.where(count > 0, np.nan)
            out[f"min_{s}"] = g[c_min].min()
            out[f"max_{s}"] = g[c_max].max()
        res = pd.DataFrame(out).reset_index()
        res.insert(0, head, df[head].iloc[0])
        return res

    return ds.groupby(head).map_groups(fn, batch_format="pandas")


def _with_means(ds, value_cols: tuple[str, ...]):
    def finish(batch: pa.Table) -> pa.Table:
        for col in value_cols:
            s = short_name(col)
            if f"mean_{s}" in batch.column_names:
                batch = batch.drop_columns([f"mean_{s}"])
            mean = pc.divide(
                pc.cast(batch[f"sum_{s}"], pa.float64()),
                pc.cast(batch[f"count_{s}"], pa.float64()),
            )
            batch = batch.append_column(f"mean_{s}", mean)
        return batch

    return ds.map_batches(finish, batch_format="pyarrow", batch_size=None)


def rollup_mergeable(
    ds,
    tier: str,
    value_cols: Iterable[str] = ("latency_s", "text_len"),
    key: str = "conv_id",
    salt: int | None = None,
):
    """Salted partial pre-agg -> small merge groupby (the scale path).

    Per-batch Arrow ``group_by`` emits <=1 row per (key, bucket) per
    batch, so the shuffle moves partials, not raw rows. ``salt`` adds a
    two-level merge ((key, bucket, salt) then (key, bucket)) to spread
    degenerate hot groups across reducers (SURVEY.md §4 skew row).
    """
    value_cols = tuple(value_cols)
    ds = add_bucket(ds, tier)
    ds = ds.select_columns([key, BUCKET_COL, *value_cols])
    ds = ds.map_batches(
        _partial_batch((key, BUCKET_COL), value_cols), batch_format="pyarrow"
    )
    if salt:
        # the first-level merge must SHUFFLE on (key-hash, salt) — a
        # first shuffle on the key alone would route every salt
        # sub-group of a hot key to ONE reducer, delivering none of the
        # skew spreading the salt exists for (and paying an extra pass
        # anyway).  _sk gives each (key, salt) pair its own shuffle
        # key; hash collisions are harmless because the in-partition
        # merge still groups by the real (key, bucket).
        def add_salt(batch: pa.Table) -> pa.Table:
            n = len(batch)
            salt_col = (np.arange(n) % salt).astype(np.int64)
            h = pd.util.hash_pandas_object(
                batch[key].to_pandas(), index=False
            ).to_numpy()
            sk = ((h % np.uint64(1 << 31)).astype(np.int64) * salt + salt_col)
            return batch.append_column("_sk", pa.array(sk, pa.int64()))

        ds = ds.map_batches(add_salt, batch_format="pyarrow", batch_size=None)
        ds = _merge(ds, ["_sk", key, BUCKET_COL], value_cols, style="arrow")
        ds = ds.drop_columns(["_sk"])
        merged = _merge_partitioned(ds, key, value_cols, style="merged")
    else:
        merged = _merge_partitioned(ds, key, value_cols, style="arrow")
    return _with_means(merged, value_cols)


def linear_trend(
    ds,
    key: str,
    ts_col: str = "ts",
    value_col: str = "value",
    x_epoch_s: int = 1_704_067_200,  # x = epoch(ts) - this, in seconds
    value_scale: int = 100,
):
    """Per-key least-squares trend (slope / intercept / correlation) as
    an ALGEBRAIC aggregate: each batch emits exact scaled-int64 moment
    partials (n, Σx, Σy, Σxy, Σx², Σy²) per key — one tiny row per
    (key, batch) shuffles, never the points — and the closed-form
    estimators are evaluated from the exactly-merged moments.

    ``x`` is centered on a fixed epoch so x² stays within int64 for
    century-scale data; with ``value_scale`` set (fixed-decimal y) the
    moments are EXACT, so the only float step is the final division.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df_key = batch[key].to_pandas()
        x = (
            batch[ts_col].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64) // 1_000_000
            - x_epoch_s
        )
        y = np.round(
            batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
            * value_scale
        ).astype(np.int64)
        codes, uniques = pd.factorize(df_key, sort=False)
        k = len(uniques)
        # int64 np.add.at (NOT float-weight bincount: float64 loses
        # integer exactness past 2^53). Envelope: sum(x^2) per key per
        # batch must stay < 2^63 — at a 30-day span (|x| <= 2.6e6 s)
        # that is ~1e6 rows/key; for wider spans re-center x per shard
        # and merge with moment-shift formulas.
        out: dict = {key: np.asarray(uniques), "n": np.bincount(codes, minlength=k)}
        for name, w in (
            ("sx", x), ("sy", y), ("sxy", x * y), ("sxx", x * x), ("syy", y * y)
        ):
            acc = np.zeros(k, dtype=np.int64)
            np.add.at(acc, codes, w)
            out[name] = acc
        return pa.table(out)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = partials.groupby(key).aggregate(
        Sum("n", alias_name="n"),
        Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"),
        Sum("sxy", alias_name="sxy"),
        Sum("sxx", alias_name="sxx"),
        Sum("syy", alias_name="syy"),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(dtype=np.float64)
        sx = df["sx"].to_numpy(dtype=np.float64)
        sy = df["sy"].to_numpy(dtype=np.float64) / value_scale
        sxy = df["sxy"].to_numpy(dtype=np.float64) / value_scale
        sxx = df["sxx"].to_numpy(dtype=np.float64)
        syy = df["syy"].to_numpy(dtype=np.float64) / value_scale**2
        with np.errstate(divide="ignore", invalid="ignore"):
            den_x = n * sxx - sx * sx
            den_y = n * syy - sy * sy
            slope = np.where(den_x > 0, (n * sxy - sx * sy) / den_x, np.nan)
            intercept = (sy - slope * sx) / n
            corr = np.where(
                (den_x > 0) & (den_y > 0),
                (n * sxy - sx * sy) / np.sqrt(den_x * den_y),
                np.nan,
            )
        return pd.DataFrame(
            {key: df[key], "n": df["n"].astype(np.int64),
             "slope": slope, "intercept": intercept, "corr": corr}
        )

    return merged.map_batches(finish, batch_format="pandas", batch_size=None)


def merge_rollups(
    rolled_a,
    rolled_b,
    value_cols: Iterable[str] = ("latency_s", "text_len"),
    key: str = "conv_id",
):
    """Incremental view maintenance: combine two mergeable rollups
    (same tier) into the rollup of their combined input — count/sum/
    min/max merge exactly, mean is re-derived from merged sums. The
    incremental-update path: keep yesterday's rollup, roll up only
    today's new data, merge — O(today + touched buckets), never a full
    recompute. Inputs may overlap in (key, bucket); groups merge."""
    value_cols = tuple(value_cols)
    cols = [key, BUCKET_COL] + [
        f"{k}_{short_name(c)}" for c in value_cols for k in ("count", "sum", "min", "max")
    ]
    ds = rolled_a.select_columns(cols).union(rolled_b.select_columns(cols))
    merged = _merge_partitioned(ds, key, value_cols, style="merged")
    return _with_means(merged, value_cols)


def cascade(
    rolled_ds,
    to_tier: str,
    value_cols: Iterable[str] = ("latency_s", "text_len"),
    key: str = "conv_id",
):
    """Merge a finer tier's mergeable rollup into a coarser tier.

    1h-from-1m == direct-1h for count/sum/min/max/mean (mean derived
    from merged sums) — the tier-cascade oracle (FIXTURES.md §4).
    Quantiles are not mergeable; recompute from raw per tier.
    """
    value_cols = tuple(value_cols)
    unit = TIER_UNIT[to_tier]

    def rebucket(batch: pa.Table) -> pa.Table:
        idx = batch.schema.get_field_index(BUCKET_COL)
        return batch.set_column(idx, BUCKET_COL, pc.floor_temporal(batch[BUCKET_COL], unit=unit))

    ds = rolled_ds.map_batches(rebucket, batch_format="pyarrow", batch_size=None)
    cols = [key, BUCKET_COL] + [
        f"{k}_{short_name(c)}" for c in value_cols for k in ("count", "sum", "min", "max")
    ]
    ds = ds.select_columns(cols)
    merged = _merge_partitioned(ds, key, value_cols, style="merged")
    return _with_means(merged, value_cols)


def cascade_multi(
    rolled_ds,
    tiers: "list[str]",
    value_cols: Iterable[str] = ("latency_s", "text_len"),
    key: str = "conv_id",
    tier_col: str = "tier",
):
    """Cascade a finer rollup into SEVERAL coarser tiers in ONE
    execution and ONE exchange.

    ``cascade(m1, "1h")`` then ``cascade(h1, "1d")`` runs two
    executor spin-ups and two shuffles; at the scaling measurement's
    4-CPU leg each spin-up is ~0.6 s of serial time (BASELINE.md
    fixed-cost analysis).  This variant floors every input row to
    EVERY target tier inside one map (tier-tagged concat — the rows
    are already aggregated partials, so the x len(tiers) volume is
    small), shuffles once, and merges all (tier, key, bucket) groups
    in the same lexsort+reduceat partition pass via
    ``_merge_partitioned(extra_key=...)``.

    Counts/min/max are bit-identical to the sequential cascades; sums
    (and the means derived from them) can differ by summation ORDER
    only (1m->1d directly vs 1m->1h->1d), i.e. within float
    associativity — asserted in tests/test_cascade_multi.py.

    Returns the union of the per-tier cascades with a ``tier`` string
    column (filter or partition by it when writing).
    """
    value_cols = tuple(value_cols)
    units = [TIER_UNIT[t] for t in tiers]
    cols = [key, BUCKET_COL] + [
        f"{k}_{short_name(c)}" for c in value_cols for k in ("count", "sum", "min", "max")
    ]

    def rebucket_multi(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        idx = batch.schema.get_field_index(BUCKET_COL)
        parts = []
        for i, unit in enumerate(units):
            t = batch.set_column(
                idx, BUCKET_COL, pc.floor_temporal(batch[BUCKET_COL], unit=unit)
            )
            parts.append(
                t.append_column(
                    "_tier", pa.array(np.full(batch.num_rows, i, dtype=np.int64))
                )
            )
        return pa.concat_tables(parts)

    ds = rolled_ds.map_batches(rebucket_multi, batch_format="pyarrow", batch_size=None)
    merged = _merge_partitioned(ds, key, value_cols, style="merged", extra_key="_tier")
    merged = _with_means(merged, value_cols)
    names = list(tiers)

    def tier_name(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("_tier")
        t = batch["_tier"].to_numpy(zero_copy_only=False)
        arr = pa.array(np.asarray(names, dtype=object)[t], pa.string())
        return batch.remove_column(i).append_column(tier_col, arr)

    return merged.map_batches(tier_name, batch_format="pyarrow", batch_size=None)


def rollup_transcripts_multi(
    ds,
    tiers: "list[str]",
    quantiles: tuple[float, ...] = (0.5, 0.99),
    key: str = "conv_id",
    num_partitions: int | None = None,
    input_bytes: int | None = None,
    tier_col: str = "tier",
):
    """ALL tiers of the transcript rollup in ONE shuffle and ONE
    execution — the fused alternative to ``rollup_transcripts`` +
    ``cascade``/``cascade_multi``.

    Why it is exact: the shuffle key is ``hash(conv_id) % P``, so every
    row of a conversation lands in ONE partition.  Per-tier stats per
    (conv, bucket) are therefore COMPLETE inside the partition — not
    partials — for every tier at once, including EXACT p50/p99 per
    coarser bucket, which the cascade path cannot produce at all
    (quantiles are not mergeable; this recompute-from-raw-per-tier is
    the documented alternative in this module's header, now fused into
    the same pass).

    One lexsort serves every tier: rows sorted by (conv, finest
    bucket) are also sorted by (conv, coarser bucket) because coarser
    buckets are floors of finer ones — only the segment boundaries
    differ per tier.  Output rows carry a ``tier`` column; filter on
    it (a lazy map stage, no extra execution) to feed downstream
    stages like gap-fill.

    Motivation (BASELINE.md fixed-cost analysis): each sequential
    Dataset execution costs ~0.6-1.1 s of serial executor spin-up,
    ~35% of the 16-CPU scaling leg; rollup->cascade->cascade was 3
    executions + 3 exchanges, this is 1 + 1.
    """
    import pyarrow.compute as pc_  # noqa: N813

    if num_partitions is None:
        num_partitions = partitions_for_input(input_bytes)
    P = num_partitions
    steps_us = [TIER_SECONDS[t] * 1_000_000 for t in tiers]
    finest = min(range(len(tiers)), key=lambda i: steps_us[i])
    names = list(tiers)

    def derive(batch: pa.Table) -> pa.Table:
        if "text" in batch.column_names:
            tl = pc_.utf8_length(batch["text"])
        else:
            tl = batch["text_len"]
        part = (
            pd.util.hash_pandas_object(
                batch[key].to_pandas(), index=False
            ).to_numpy()
            % P
        ).astype(np.int32)
        return pa.table(
            {
                key: batch[key],
                "turn_idx": batch["turn_idx"],
                "ts": batch["ts"],
                "text_len": tl,
                "_part": pa.array(part),
            }
        )

    ds = ds.map_batches(derive, batch_format="pyarrow", batch_size=None)

    def _empty_out() -> pd.DataFrame:
        cols: dict[str, pd.Series] = {
            key: pd.Series([], dtype=object),
            BUCKET_COL: pd.Series([], dtype="datetime64[us]"),
            tier_col: pd.Series([], dtype=object),
            "n_turns": pd.Series([], dtype=np.int64),
        }
        for col in ("latency_s", "text_len"):
            s = short_name(col)
            cols[f"count_{s}"] = pd.Series([], dtype=np.int64)
            for stat in ("sum", "min", "max", "mean"):
                cols[f"{stat}_{s}"] = pd.Series([], dtype=np.float64)
            for q in quantiles:
                cols[f"p{int(q * 100)}_{s}"] = pd.Series([], dtype=np.float64)
        return pd.DataFrame(cols)

    def partition_fn(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return _empty_out()
        codes, uniques = pd.factorize(df[key], sort=False)
        order = np.lexsort((df["turn_idx"].to_numpy(), codes))
        codes_s = codes[order]
        ts_us = df["ts"].to_numpy(dtype="datetime64[us]").view("int64")[order]
        text_len = df["text_len"].to_numpy(dtype=np.float64)[order]
        new_conv = np.empty(n, dtype=bool)
        new_conv[0] = True
        new_conv[1:] = codes_s[1:] != codes_s[:-1]
        lat = np.empty(n)
        lat[1:] = (ts_us[1:] - ts_us[:-1]) / 1e6
        lat[new_conv] = np.nan
        fine_bucket = (ts_us // steps_us[finest]) * steps_us[finest]
        # same conditional re-sort as rollup_transcripts, on the FINEST
        # bucket — coarser buckets are floors of it, so one order
        # serves every tier
        out_of_order = bool(
            np.any((fine_bucket[1:] < fine_bucket[:-1]) & ~new_conv[1:])
        )
        if out_of_order:
            order2 = np.lexsort((fine_bucket, codes_s))
            codes_s = codes_s[order2]
            ts_us = ts_us[order2]
            lat = lat[order2]
            text_len = text_len[order2]
        frames = []
        for t_idx, step_us in enumerate(steps_us):
            bucket_us = (ts_us // step_us) * step_us
            new_seg = np.empty(n, dtype=bool)
            new_seg[0] = True
            new_seg[1:] = (codes_s[1:] != codes_s[:-1]) | (
                bucket_us[1:] != bucket_us[:-1]
            )
            seg_of_row = np.cumsum(new_seg) - 1
            starts = np.flatnonzero(new_seg)
            ends = np.append(starts[1:], n)
            out: dict[str, np.ndarray] = {
                key: np.asarray(uniques)[codes_s[starts]],
                BUCKET_COL: bucket_us[starts].astype("datetime64[us]"),
                tier_col: np.repeat(names[t_idx], len(starts)),
                "n_turns": ends - starts,
            }
            for col, v in (("latency_s", lat), ("text_len", text_len)):
                s = short_name(col)
                st = _segmented_stats(v, starts, ends, seg_of_row, quantiles)
                out[f"count_{s}"] = st["count"]
                out[f"sum_{s}"] = st["sum"]
                out[f"min_{s}"] = st["min"]
                out[f"max_{s}"] = st["max"]
                out[f"mean_{s}"] = st["mean"]
                for q in quantiles:
                    out[f"p{int(q * 100)}_{s}"] = st[f"q{q}"]
            frames.append(pd.DataFrame(out))
        return pd.concat(frames, ignore_index=True)

    return ds.groupby("_part").map_groups(partition_fn, batch_format="pandas")
