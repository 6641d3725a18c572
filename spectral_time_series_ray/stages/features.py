"""Per-turn feature derivation.

Stateless, vectorized features (text length, token estimate) run as a
zero-copy pyarrow ``map_batches``; the order-dependent inter-turn
latency runs per conversation (stable ``(conv_id, turn_idx)`` sort
inside the group — Ray groupby does not guarantee in-group order;
SURVEY.md §7.4).

Reference analogues: AddObservedMask / AddTimeIndex feature transforms
(`uni2ts/src/uni2ts/transform/feature.py`), and the causal-op ordering
invariant (`uni2ts/src/uni2ts/transform/imputation.py:44-62`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def add_text_features(batch: pa.Table) -> pa.Table:
    """text_len (chars) + ws_tokens (whitespace token count), vectorized.

    Text is whitespace-trimmed before splitting and empty/whitespace-only
    text counts 0 tokens — otherwise the regex split counts the empty
    string as 1 token and leading/trailing whitespace as extra tokens,
    diverging from the documented token semantics (and the SQL oracle)."""
    text = batch["text"]
    batch = batch.append_column("text_len", pc.utf8_length(text))
    trimmed = pc.utf8_trim_whitespace(text)
    tokens = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
    tokens = pc.if_else(
        pc.equal(trimmed, ""), pa.scalar(0, tokens.type), tokens
    )
    batch = batch.append_column("ws_tokens", tokens)
    return batch


def _latency_group(batch: pa.Table) -> pa.Table:
    """Per-conversation latency: sort by turn_idx, diff ts (seconds).

    First turn's latency is null (no predecessor) — rollup counts are
    over observed values only, mirroring the reference's observed_mask
    semantics (feature.py:108-127).
    """
    order = pc.sort_indices(batch["turn_idx"])
    batch = batch.take(order)
    ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    lat = np.empty(len(ts), dtype=np.float64)
    lat[0] = np.nan
    if len(ts) > 1:
        lat[1:] = np.diff(ts) / 1e6
    # from_pandas=True maps NaN -> Arrow null so downstream aggregates
    # skip unobserved values (observed_mask semantics)
    return batch.append_column("latency_s", pa.array(lat, pa.float64(), from_pandas=True))


def analytic_window_funcs(
    ds,
    key: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value_col: str = "value",
    id_cols: tuple[str, ...] = ("event_id",),
    value_scale: int | None = 100,
    num_partitions: int | None = None,
):
    """SQL analytic window functions per key: ``row_number()``,
    ``lag(value)`` and a running ``sum(value)`` over
    ``(partition by key order by order_cols rows unbounded preceding)``
    — the positional/ordered-state operator class of SURVEY.md §2.9.

    Scale path: ONE int-keyed hash shuffle (same partition-level design
    as ``rollup_transcripts``) and one numpy lexsort + segmented
    cumsum/shift pass per partition — per-key Python overhead is O(P),
    not O(#keys). When ``value_scale`` is set (inputs with fixed
    decimals), the running sum accumulates in scaled int64 so the
    result is EXACT — float accumulation-order differences vs a SQL
    engine's windowed sum vanish.
    """
    import pandas as pd

    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)

    def add_part(batch: pa.Table) -> pa.Table:
        import pandas as pd_

        part = (
            pd_.util.hash_pandas_object(
                batch[key].to_pandas(), index=False
            ).to_numpy()
            % P
        ).astype(np.int32)
        return batch.append_column("_part", pa.array(part))

    keep = list(dict.fromkeys((key, *order_cols, value_col, *id_cols)))
    ds = ds.select_columns(keep).map_batches(
        add_part, batch_format="pyarrow", batch_size=None
    )

    def partition_fn(df: "pd.DataFrame") -> "pd.DataFrame":
        n = len(df)
        if n == 0:
            cols = {c: pd.Series([], dtype=df[c].dtype if c in df else object)
                    for c in keep}
            cols["rn"] = pd.Series([], dtype=np.int64)
            cols["prev_value"] = pd.Series([], dtype=np.float64)
            cols["running_value"] = pd.Series([], dtype=np.float64)
            return pd.DataFrame(cols)
        codes, _ = pd.factorize(df[key], sort=False)
        sort_keys = [df[c].to_numpy() for c in reversed(order_cols)]
        order = np.lexsort((*sort_keys, codes))
        codes_s = codes[order]
        v = df[value_col].to_numpy(dtype=np.float64)[order]
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = codes_s[1:] != codes_s[:-1]
        starts = np.flatnonzero(new_key)
        # row_number: position within segment
        rn = np.arange(n, dtype=np.int64) - np.repeat(starts, np.diff(np.append(starts, n))) + 1
        # lag(value): shift by one, null at each segment start
        prev = np.empty(n, dtype=np.float64)
        prev[0] = np.nan
        prev[1:] = v[:-1]
        prev[new_key] = np.nan
        # running sum with per-segment reset; exact int64 path when the
        # values are fixed-decimal
        if value_scale:
            vi = np.round(v * value_scale).astype(np.int64)
            cs = np.cumsum(vi)
            base = np.repeat(np.concatenate([[0], cs[starts[1:] - 1]]), np.diff(np.append(starts, n)))
            running = (cs - base) / value_scale
        else:
            cs = np.cumsum(v)
            base = np.repeat(np.concatenate([[0.0], cs[starts[1:] - 1]]), np.diff(np.append(starts, n)))
            running = cs - base
        out = df.iloc[order][keep].reset_index(drop=True)
        out["rn"] = rn
        out["prev_value"] = prev
        out["running_value"] = running
        return out

    return ds.groupby("_part").map_groups(partition_fn, batch_format="pandas")


def analytic_rank_funcs(
    ds,
    key: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value_col: str = "value",
    id_cols: tuple[str, ...] = ("event_id",),
    ma_window: int = 5,
    value_scale: int | None = 100,
    num_partitions: int | None = None,
    n_tiles: int | None = None,
):
    """Second analytic family per key, one shuffle + one numpy pass:

    - ``lead_value`` = next value in (order_cols) order (NULL at segment
      end) — lead()
    - ``ma_value``   = mean over the trailing ``ma_window`` rows
      including current (ROWS BETWEEN ma_window-1 PRECEDING AND CURRENT
      ROW)
    - ``rnk`` / ``drnk`` = rank() / dense_rank() over (partition by key
      ORDER BY value) — tie-aware, a different ordering axis than the
      time-ordered functions.
    - ``tile`` (when ``n_tiles``) = ntile(n_tiles) over (partition by
      key ORDER BY order_cols) with SQL remainder semantics: the first
      n %% n_tiles buckets get ceil(n/n_tiles) rows.

    Same partition-level design as :func:`analytic_window_funcs`,
    including ``value_scale``: with fixed-decimal inputs the moving-
    average window sums accumulate in exact scaled int64; with
    ``value_scale=None`` plain float prefix sums are used (NOT a
    silent round — arbitrary-precision inputs stay unrounded).
    """
    import pandas as pd

    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)

    def add_part(batch: pa.Table) -> pa.Table:
        import pandas as pd_

        part = (
            pd_.util.hash_pandas_object(
                batch[key].to_pandas(), index=False
            ).to_numpy()
            % P
        ).astype(np.int32)
        return batch.append_column("_part", pa.array(part))

    keep = list(dict.fromkeys((key, *order_cols, value_col, *id_cols)))
    ds = ds.select_columns(keep).map_batches(
        add_part, batch_format="pyarrow", batch_size=None
    )

    def partition_fn(df: "pd.DataFrame") -> "pd.DataFrame":
        n = len(df)
        if n == 0:
            cols = {c: pd.Series([], dtype=object) for c in keep}
            for c in ("lead_value", "ma_value"):
                cols[c] = pd.Series([], dtype=np.float64)
            for c in ("rnk", "drnk"):
                cols[c] = pd.Series([], dtype=np.int64)
            if n_tiles:
                cols["tile"] = pd.Series([], dtype=np.int64)
            return pd.DataFrame(cols)
        codes, _ = pd.factorize(df[key], sort=False)
        sort_keys = [df[c].to_numpy() for c in reversed(order_cols)]
        order = np.lexsort((*sort_keys, codes))
        codes_s = codes[order]
        v = df[value_col].to_numpy(dtype=np.float64)[order]
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = codes_s[1:] != codes_s[:-1]
        starts = np.flatnonzero(new_key)
        seg_len = np.diff(np.append(starts, n))
        seg_start_of = np.repeat(starts, seg_len)
        # lead: shift -1, null at segment end
        lead = np.empty(n, dtype=np.float64)
        lead[:-1] = v[1:]
        lead[-1] = np.nan
        seg_end = np.append(starts[1:] - 1, n - 1)
        lead[seg_end] = np.nan
        # trailing moving average via prefix sums clamped to segment
        # start; scaled-int64 accumulation (fixed-decimal inputs) keeps
        # the window sum exact regardless of segment length
        idx = np.arange(n)
        lo = np.maximum(idx - (ma_window - 1), seg_start_of)
        if value_scale:
            vi = np.round(v * value_scale).astype(np.int64)
            prefix = np.concatenate([[0], np.cumsum(vi)])
            ma = (prefix[idx + 1] - prefix[lo]) / value_scale / (idx + 1 - lo)
        else:
            prefix = np.concatenate([[0.0], np.cumsum(v)])
            ma = (prefix[idx + 1] - prefix[lo]) / (idx + 1 - lo)
        # rank/dense_rank over (key, value): one lexsort on (value)
        # within segments — reuse the segment structure
        # codes_s is already non-decreasing, so order2 keeps segment
        # blocks in place — starts/seg_start_of stay valid here
        order2 = np.lexsort((v, codes_s))
        v2 = v[order2]
        new_val = np.empty(n, dtype=bool)
        new_val[0] = True
        new_val[1:] = (codes_s[order2][1:] != codes_s[order2][:-1]) | (
            v2[1:] != v2[:-1]
        )
        # rank (competition): 1 + offset of the value-run's first row
        # from its segment start; dense_rank: distinct-value runs seen
        # in the segment up to and including this run
        first_pos = np.maximum.accumulate(np.where(new_val, np.arange(n), -1))
        rnk2 = first_pos - seg_start_of + 1
        cnv = np.cumsum(new_val)
        drnk2 = cnv - np.repeat(cnv[starts], seg_len) + 1
        rnk = np.empty(n, dtype=np.int64)
        drnk = np.empty(n, dtype=np.int64)
        rnk[order2] = rnk2
        drnk[order2] = drnk2
        out = df.iloc[order][keep].reset_index(drop=True)
        out["lead_value"] = lead
        out["ma_value"] = ma
        out["rnk"] = rnk
        out["drnk"] = drnk
        if n_tiles:
            # ntile over the time order: rn0 = 0-based row number in
            # segment; first (n % k) buckets take q+1 rows (SQL spec)
            rn0 = idx - seg_start_of
            seg_n = np.repeat(seg_len, seg_len)
            q, r = seg_n // n_tiles, seg_n % n_tiles
            big = r * (q + 1)  # rows covered by the larger buckets
            tile = np.where(
                rn0 < big,
                rn0 // np.maximum(q + 1, 1),
                r + (rn0 - big) // np.maximum(q, 1),
            )
            # segments with n < k: every row its own bucket (q == 0)
            out["tile"] = (tile + 1).astype(np.int64)
        return out

    return ds.groupby("_part").map_groups(partition_fn, batch_format="pandas")


def with_turn_features(ds, include_text: bool = True):
    """Full feature derivation: vectorized text features, then grouped
    latency. ``include_text=False`` projects the wide text column out
    before the shuffle (SURVEY.md §7.4: don't shuffle big strings
    through the rollup path)."""
    ds = ds.map_batches(add_text_features, batch_format="pyarrow", batch_size=None)
    if not include_text:
        cols = [c for c in ds.schema().names if c != "text"]
        ds = ds.select_columns(cols)
    return ds.groupby("conv_id").map_groups(_latency_group, batch_format="pyarrow")


def role_transition_matrix(ds, num_partitions: int | None = None):
    """Global role-transition counts over transcripts: how often a
    ``role`` turn is followed by each other role within a conversation
    (turn-taking structure — e.g. assistant->tool->assistant loops).

    One conv-hash shuffle of three narrow columns (conv_id, turn_idx,
    role), then a vectorized pass per partition: lexsort, boundary
    mask, shifted-pair partial counts. Per-partition partials are
    |roles|^2 rows — corpus-independent — so the final merge is a
    bounded driver concat. Also returns (n_turns, n_convs) partials
    from the same pass for the conservation invariant
    ``sum(transitions) == n_turns - n_convs`` (contiguous turn_idx).
    Returns (matrix_df, n_turns, n_convs).
    """
    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)

    def add_part(batch: pa.Table) -> pa.Table:
        import pandas as _pd

        h = _pd.util.hash_pandas_object(
            batch["conv_id"].to_pandas(), index=False
        ).to_numpy()
        part = ((h >> np.uint64(40)) % np.uint64(P)).astype(np.int64)
        return batch.select(["conv_id", "turn_idx", "role"]).append_column(
            "_part", pa.array(part)
        )

    import pandas as pd

    def partition_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        conv = df["conv_id"].to_numpy()
        idx = df["turn_idx"].to_numpy()
        role = df["role"].to_numpy()
        same = (conv[1:] == conv[:-1]) & (idx[1:] == idx[:-1] + 1)
        pairs = pd.DataFrame(
            {"from_role": role[:-1][same], "to_role": role[1:][same]}
        )
        out = pairs.groupby(["from_role", "to_role"], as_index=False).size()
        out = out.rename(columns={"size": "n"})
        out["_turns"] = np.int64(0)
        out["_convs"] = np.int64(0)
        out["_tot"] = np.int8(0)
        # totals travel on a dedicated sentinel ROW marked by the _tot
        # FLAG column — not by an in-band role value: a legitimate
        # empty-string role would otherwise have its outgoing
        # transitions silently dropped, breaking the conservation
        # invariant sum(n) == n_turns - n_convs
        totals = pd.DataFrame(
            {
                "from_role": [""],
                "to_role": [""],
                "n": np.array([0], dtype=np.int64),
                "_turns": np.array([len(df)], dtype=np.int64),
                "_convs": np.array([pd.unique(conv).size], dtype=np.int64),
                "_tot": np.array([1], dtype=np.int8),
            }
        )
        return pd.concat([out, totals], ignore_index=True)

    parts = (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(partition_fn, batch_format="pandas")
        .to_pandas()  # bounded: |roles|^2 x P rows
    )
    mat = (
        parts[parts["_tot"] == 0]
        .groupby(["from_role", "to_role"], as_index=False)["n"]
        .sum()
        .sort_values(["from_role", "to_role"])
        .reset_index(drop=True)
    )
    return mat, int(parts["_turns"].sum()), int(parts["_convs"].sum())


def tool_call_stats(ds, num_partitions: int | None = None):
    """Per-tool usage statistics over transcripts: call count, distinct
    conversations, and the latency from a tool turn to the NEXT turn
    (tool execution + model think time in an agent loop).

    Same conv-hash partition pass as ``role_transition_matrix``
    (conversations never span partitions, so per-partition distinct
    conv counts sum exactly); per-partition partials are <= |tools|
    rows, so the merge is a bounded driver concat. Returns a DataFrame
    (tool, n_calls, n_convs, n_with_next, sum_next_latency_s,
    mean_next_latency_s) — the SUM is kept alongside the mean because
    it is boundary-free under fixed-decimal rounding (an exact
    multiple of 1e-6 s, since latencies are integer microseconds),
    which the oracle comparison relies on; a mean's denominator can
    land its exact value exactly on a rounding boundary.
    """
    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)

    def add_part(batch: pa.Table) -> pa.Table:
        import pandas as _pd

        h = _pd.util.hash_pandas_object(
            batch["conv_id"].to_pandas(), index=False
        ).to_numpy()
        part = ((h >> np.uint64(40)) % np.uint64(P)).astype(np.int64)
        return batch.select(["conv_id", "turn_idx", "role", "tool", "ts"]).append_column(
            "_part", pa.array(part)
        )

    import pandas as pd

    def partition_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        conv = df["conv_id"].to_numpy()
        tus = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        # latency tracked in EXACT integer microseconds: float-seconds
        # accumulation across millions of calls drifts past the
        # 0.5e-6 s fixed-decimal rounding margin at scale, while an
        # int64 us sum is exact at any corpus size.  "no next turn" is
        # a SEPARATE boolean derived from the conversation boundary —
        # using the latency's sign as the sentinel would silently
        # treat out-of-order timestamps (negative gaps) as missing and
        # diverge from a SQL lead()-based oracle.
        n_rows = len(df)
        has_next_all = np.zeros(n_rows, dtype=bool)
        same = conv[1:] == conv[:-1]
        has_next_all[:-1] = same
        next_us = np.zeros(n_rows, dtype=np.int64)
        next_us[:-1][same] = (tus[1:] - tus[:-1])[same]
        is_tool = (df["role"].to_numpy() == "tool") & (df["tool"].to_numpy() != "")
        t = pd.DataFrame(
            {
                "tool": df["tool"].to_numpy()[is_tool],
                "conv": conv[is_tool],
                "lat_us": next_us[is_tool],
                "has_next": has_next_all[is_tool].astype(np.int64),
            }
        )
        out = t.groupby("tool", as_index=False).agg(
            n_calls=("conv", "size"),
            n_convs=("conv", "nunique"),
            n_with_next=("has_next", "sum"),
            sum_lat_us=("lat_us", "sum"),
        )
        return out

    parts = (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(partition_fn, batch_format="pandas")
        .to_pandas()  # bounded: |tools| x P rows
    )
    if not len(parts):
        return pd.DataFrame(
            columns=["tool", "n_calls", "n_convs", "n_with_next",
                     "sum_next_latency_s", "mean_next_latency_s"]
        )
    out = parts.groupby("tool", as_index=False).agg(
        n_calls=("n_calls", "sum"),
        n_convs=("n_convs", "sum"),
        n_with_next=("n_with_next", "sum"),
        sum_lat_us=("sum_lat_us", "sum"),
    )
    # ONE division of the exact int64 us total — identical bits to a
    # SQL sum(lat_us)/1e6 at any scale (1e6 is exactly representable)
    sum_s = out["sum_lat_us"].to_numpy(np.int64) / 1e6
    out["sum_next_latency_s"] = np.round(sum_s, 6)
    with np.errstate(invalid="ignore", divide="ignore"):
        out["mean_next_latency_s"] = np.round(
            sum_s / out["n_with_next"].to_numpy(np.float64), 6
        )
    return out.drop(columns=["sum_lat_us"]).sort_values("tool").reset_index(drop=True)


def label_transition_matrix(
    ds,
    key_col: str,
    order_cols: tuple[str, ...],
    label_col: str,
    num_partitions: int | None = None,
):
    """Generic transition matrix: counts of (label, next-label) over
    consecutive rows within each ``key_col`` group ordered by
    ``order_cols`` — the distributed equivalent of SQL
    ``lead(label) over (partition by key order by ...)`` + group count.

    One key-hash shuffle of the narrow (key, order, label) columns,
    then a vectorized pass per partition (lexsort, key-boundary mask,
    shifted-pair groupby). Per-partition partials are |labels|^2 rows
    — corpus-independent — so the driver merge is bounded. Keys never
    span partitions, so partials sum exactly.
    """
    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)
    cols = [key_col, *order_cols, label_col]

    def add_part(batch: pa.Table) -> pa.Table:
        import pandas as _pd

        h = _pd.util.hash_pandas_object(
            batch[key_col].to_pandas(), index=False
        ).to_numpy()
        part = ((h >> np.uint64(40)) % np.uint64(P)).astype(np.int64)
        return batch.select(cols).append_column("_part", pa.array(part))

    import pandas as pd

    def partition_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, *order_cols], kind="mergesort")
        key = df[key_col].to_numpy()
        lab = df[label_col].to_numpy()
        same = key[1:] == key[:-1]
        pairs = pd.DataFrame(
            {"from_label": lab[:-1][same], "to_label": lab[1:][same]}
        )
        out = (
            pairs.groupby(["from_label", "to_label"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        if not len(out):  # typed empty frame (schema-stable blocks)
            out = pd.DataFrame(
                {
                    "from_label": pd.Series([], dtype=object),
                    "to_label": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        return out

    parts = (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(partition_fn, batch_format="pandas")
        .to_pandas()  # bounded: |labels|^2 x P rows
    )
    if not len(parts):
        return pd.DataFrame(
            {
                "from_label": pd.Series([], dtype=object),
                "to_label": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
            }
        )
    return (
        parts.groupby(["from_label", "to_label"], as_index=False)["n"]
        .sum()
        .sort_values(["from_label", "to_label"])
        .reset_index(drop=True)
    )


def rolling_order_stats(
    ds,
    key: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value_col: str = "value",
    id_cols: tuple[str, ...] = ("event_id",),
    window: int = 5,
    num_partitions: int | None = None,
):
    """Order-statistic window functions per key: trailing-frame
    ``median(value)``, ``min(value)``, ``max(value)`` over
    ``(partition by key order by order_cols rows between window-1
    preceding and current row)`` — the non-mergeable (holistic)
    analytic class that running sums can't cover.

    Same scale path as ``analytic_window_funcs``: one int-keyed hash
    shuffle, one lexsort per partition, then a vectorized
    shifted-column matrix (n x window) with segment-start masking and
    ``np.nanmedian`` / ``nanmin`` / ``nanmax`` across the window axis
    — no per-row Python. Memory per partition is window x rows x 8 B,
    so keep ``window`` modest (frames wider than ~64 rows should use a
    two-pointer merge instead).
    """
    import pandas as pd

    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)
    W = int(window)

    def add_part(batch: pa.Table) -> pa.Table:
        import pandas as pd_

        part = (
            pd_.util.hash_pandas_object(
                batch[key].to_pandas(), index=False
            ).to_numpy()
            % P
        ).astype(np.int32)
        return batch.append_column("_part", pa.array(part))

    keep = list(dict.fromkeys((key, *order_cols, value_col, *id_cols)))
    ds = ds.select_columns(keep).map_batches(
        add_part, batch_format="pyarrow", batch_size=None
    )

    out_cols = list(dict.fromkeys((*id_cols, key)))

    def partition_fn(df: "pd.DataFrame") -> "pd.DataFrame":
        n = len(df)
        if n == 0:
            cols = {c: pd.Series([], dtype=df[c].dtype if c in df else object)
                    for c in out_cols}
            for c in ("med_w", "min_w", "max_w"):
                cols[c] = pd.Series([], dtype=np.float64)
            return pd.DataFrame(cols)
        codes, _ = pd.factorize(df[key], sort=False)
        sort_keys = [df[c].to_numpy() for c in reversed(order_cols)]
        order = np.lexsort((*sort_keys, codes))
        codes_s = codes[order]
        v = df[value_col].to_numpy(dtype=np.float64)[order]
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = codes_s[1:] != codes_s[:-1]
        starts = np.flatnonzero(new_key)
        seg_len = np.diff(np.append(starts, n))
        rn = np.arange(n, dtype=np.int64) - np.repeat(starts, seg_len) + 1
        # shifted-column matrix: M[i, k] = v[i-k] iff within the segment
        M = np.full((n, W), np.nan)
        M[:, 0] = v
        for k in range(1, W):
            M[k:, k] = v[:-k]
            M[rn <= k, k] = np.nan
        out = df.iloc[order][out_cols].reset_index(drop=True)
        out["med_w"] = np.nanmedian(M, axis=1)
        out["min_w"] = np.nanmin(M, axis=1)
        out["max_w"] = np.nanmax(M, axis=1)
        return out

    return (
        ds.groupby("_part").map_groups(partition_fn, batch_format="pandas")
    )


def analytic_dist_funcs(
    ds,
    key: str = "user_id",
    order_value: str = "value",
    id_cols: tuple[str, ...] = ("event_id",),
    tiebreak: tuple[str, ...] = (),
    num_partitions: int | None = None,
):
    """Distribution window functions per key: ``percent_rank()`` and
    ``cume_dist()`` over ``(partition by key order by order_value)``
    with SQL tie semantics — ties share the FIRST position for
    percent_rank and the LAST position for cume_dist.

    Same single-shuffle partition pass as the other analytic families:
    lexsort by (key, value), segment boundaries, tie-run first/last
    indices via boundary masks — no per-row Python.
    """
    import pandas as pd

    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)

    def add_part(batch: pa.Table) -> pa.Table:
        import pandas as pd_

        part = (
            pd_.util.hash_pandas_object(
                batch[key].to_pandas(), index=False
            ).to_numpy()
            % P
        ).astype(np.int32)
        return batch.append_column("_part", pa.array(part))

    keep = list(dict.fromkeys((key, order_value, *tiebreak, *id_cols)))
    ds = ds.select_columns(keep).map_batches(
        add_part, batch_format="pyarrow", batch_size=None
    )
    out_cols = list(dict.fromkeys((*id_cols, key)))

    def partition_fn(df: "pd.DataFrame") -> "pd.DataFrame":
        n = len(df)
        if n == 0:
            cols = {c: pd.Series([], dtype=df[c].dtype if c in df else object)
                    for c in out_cols}
            cols["pct_rank"] = pd.Series([], dtype=np.float64)
            cols["cume_d"] = pd.Series([], dtype=np.float64)
            return pd.DataFrame(cols)
        codes, _ = pd.factorize(df[key], sort=False)
        v = df[order_value].to_numpy()
        order = np.lexsort((v, codes))
        codes_s = codes[order]
        v_s = v[order]
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = codes_s[1:] != codes_s[:-1]
        starts = np.flatnonzero(new_key)
        seg_len = np.diff(np.append(starts, n))
        seg_start = np.repeat(starts, seg_len)
        seg_n = np.repeat(seg_len, seg_len)
        # tie runs: a new tie run starts at a new key or a value change
        new_tie = np.empty(n, dtype=bool)
        new_tie[0] = True
        new_tie[1:] = new_key[1:] | (v_s[1:] != v_s[:-1])
        tie_starts = np.flatnonzero(new_tie)
        tie_len = np.diff(np.append(tie_starts, n))
        first_idx = np.repeat(tie_starts, tie_len)          # min position of tie
        last_idx = np.repeat(tie_starts + tie_len - 1, tie_len)  # max position
        rank = (first_idx - seg_start + 1).astype(np.float64)
        denom = np.maximum(seg_n - 1, 1).astype(np.float64)
        pct = np.where(seg_n == 1, 0.0, (rank - 1.0) / denom)
        cume = (last_idx - seg_start + 1).astype(np.float64) / seg_n
        out = df.iloc[order][out_cols].reset_index(drop=True)
        out["pct_rank"] = pct
        out["cume_d"] = cume
        return out

    return (
        ds.groupby("_part").map_groups(partition_fn, batch_format="pandas")
    )


def analytic_edge_funcs(
    ds,
    key: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value_col: str = "value",
    id_cols: tuple[str, ...] = ("event_id",),
    nth: int = 3,
    num_partitions: int | None = None,
):
    """Frame-edge window functions per key: ``first_value(value)``,
    ``last_value(value)`` (over the WHOLE partition frame, i.e. ROWS
    BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) and
    ``nth_value(value, nth)`` over ``(partition by key order by
    order_cols)`` — NULL where the segment has fewer than ``nth``
    rows, matching SQL.

    Same single-shuffle, lexsort + segment-offset design as the other
    analytic families; first/last/nth are one gather each off the
    segment start/end offsets.
    """
    import pandas as pd

    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)

    def add_part(batch: pa.Table) -> pa.Table:
        import pandas as pd_

        part = (
            pd_.util.hash_pandas_object(
                batch[key].to_pandas(), index=False
            ).to_numpy()
            % P
        ).astype(np.int32)
        return batch.append_column("_part", pa.array(part))

    keep = list(dict.fromkeys((key, *order_cols, value_col, *id_cols)))
    ds = ds.select_columns(keep).map_batches(
        add_part, batch_format="pyarrow", batch_size=None
    )
    out_cols = list(dict.fromkeys((*id_cols, key)))

    def partition_fn(df: "pd.DataFrame") -> "pd.DataFrame":
        n = len(df)
        if n == 0:
            cols = {c: pd.Series([], dtype=df[c].dtype if c in df else object)
                    for c in out_cols}
            for c in ("first_v", "last_v", "nth_v"):
                cols[c] = pd.Series([], dtype=np.float64)
            return pd.DataFrame(cols)
        codes, _ = pd.factorize(df[key], sort=False)
        sort_keys = [df[c].to_numpy() for c in reversed(order_cols)]
        order = np.lexsort((*sort_keys, codes))
        codes_s = codes[order]
        v = df[value_col].to_numpy(dtype=np.float64)[order]
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = codes_s[1:] != codes_s[:-1]
        starts = np.flatnonzero(new_key)
        seg_len = np.diff(np.append(starts, n))
        seg_start = np.repeat(starts, seg_len)
        seg_n = np.repeat(seg_len, seg_len)
        out = df.iloc[order][out_cols].reset_index(drop=True)
        out["first_v"] = v[seg_start]
        out["last_v"] = v[seg_start + seg_n - 1]
        nth_idx = seg_start + (nth - 1)
        nth_v = np.where(seg_n >= nth, v[np.minimum(nth_idx, n - 1)], np.nan)
        out["nth_v"] = nth_v
        return out

    return (
        ds.groupby("_part").map_groups(partition_fn, batch_format="pandas")
    )


def analytic_ntile(
    ds,
    key: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    k: int = 4,
    id_cols: tuple[str, ...] = ("event_id",),
    num_partitions: int | None = None,
):
    """SQL ``ntile(k) over (partition by key order by order_cols)`` —
    the exact ANSI bucket rule: with n rows and r = n mod k, the first
    r buckets get ``n // k + 1`` rows, the rest ``n // k``. Same scale
    shape as :func:`analytic_window_funcs`: one int-keyed hash shuffle,
    one lexsort + segmented pass per partition."""
    import pandas as pd

    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)

    def add_part(batch: pa.Table) -> pa.Table:
        import pandas as pd_

        part = (
            pd_.util.hash_pandas_object(
                batch[key].to_pandas(), index=False
            ).to_numpy()
            % P
        ).astype(np.int32)
        return batch.append_column("_part", pa.array(part))

    keep = list(dict.fromkeys((key, *order_cols, *id_cols)))
    tagged = ds.select_columns(keep).map_batches(
        add_part, batch_format="pyarrow", batch_size=None
    )

    def partition_fn(df: "pd.DataFrame") -> "pd.DataFrame":
        n = len(df)
        if n == 0:
            cols = {c: pd.Series([], dtype=object) for c in keep}
            cols["bucket"] = pd.Series([], dtype=np.int64)
            return pd.DataFrame(cols)
        codes, _ = pd.factorize(df[key], sort=False)
        sort_keys = [df[c].to_numpy() for c in reversed(order_cols)]
        order = np.lexsort((*sort_keys, codes))
        codes_s = codes[order]
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = codes_s[1:] != codes_s[:-1]
        starts = np.flatnonzero(new_key)
        seg_len = np.diff(np.append(starts, n))
        rn0 = np.arange(n, dtype=np.int64) - np.repeat(starts, seg_len)
        seg_n = np.repeat(seg_len, seg_len)
        bs = seg_n // k
        r = seg_n % k
        big_span = r * (bs + 1)
        in_big = rn0 < big_span
        bucket = np.where(
            in_big,
            rn0 // np.maximum(bs + 1, 1) + 1,
            r + np.where(bs > 0, (rn0 - big_span) // np.maximum(bs, 1), 0) + 1,
        ).astype(np.int64)
        out = df.iloc[order][keep].reset_index(drop=True)
        out["bucket"] = bucket
        return out

    return tagged.groupby("_part").map_groups(partition_fn, batch_format="pandas")


def analytic_percent_rank(
    ds,
    key: str = "user_id",
    value_col: str = "value",
    id_cols: tuple[str, ...] = ("event_id",),
    value_scale: int | None = 100,
    num_partitions: int | None = None,
):
    """SQL ``percent_rank() / cume_dist() over (partition by key order
    by value)`` with full ANSI tie semantics — percent_rank =
    (rank-1)/(n-1) (0 for a single-row partition), cume_dist =
    (#peers-or-preceding)/n. Ties are honored exactly: when
    ``value_scale`` is set the order key is the integer
    ``round(value*scale)`` so equal 2-decimal values are bit-equal on
    both engines, and each output is ONE double division of exact
    int64s — IEEE-identical to the oracle.

    Same scale shape as :func:`analytic_ntile`: one int-keyed hash
    shuffle, one lexsort + two segmented passes per partition; the key
    domain never lands on the driver."""
    import pandas as pd

    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)

    def add_part(batch: pa.Table) -> pa.Table:
        import pandas as pd_

        part = (
            pd_.util.hash_pandas_object(
                batch[key].to_pandas(), index=False
            ).to_numpy()
            % P
        ).astype(np.int32)
        return batch.append_column("_part", pa.array(part))

    keep = list(dict.fromkeys((key, value_col, *id_cols)))
    tagged = ds.select_columns(keep).map_batches(
        add_part, batch_format="pyarrow", batch_size=None
    )

    def partition_fn(df: "pd.DataFrame") -> "pd.DataFrame":
        n = len(df)
        out_cols = [*keep, "rnk", "percent_rank", "cume_dist"]
        if n == 0:
            cols = {c: pd.Series([], dtype=object) for c in keep}
            cols["rnk"] = pd.Series([], dtype=np.int64)
            cols["percent_rank"] = pd.Series([], dtype=np.float64)
            cols["cume_dist"] = pd.Series([], dtype=np.float64)
            return pd.DataFrame(cols)[out_cols]
        v = df[value_col].to_numpy()
        if value_scale:
            v = np.round(np.asarray(v, dtype=np.float64) * value_scale).astype(
                np.int64
            )
        codes, _ = pd.factorize(df[key], sort=False)
        order = np.lexsort((v, codes))
        codes_s, v_s = codes[order], v[order]
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = codes_s[1:] != codes_s[:-1]
        starts = np.flatnonzero(new_key)
        seg_len = np.diff(np.append(starts, n))
        rn0 = np.arange(n, dtype=np.int64) - np.repeat(starts, seg_len)
        seg_n = np.repeat(seg_len, seg_len).astype(np.int64)
        # tie runs: a new (key, value) run starts where key or value changes
        new_run = new_key.copy()
        new_run[1:] |= v_s[1:] != v_s[:-1]
        run_starts = np.flatnonzero(new_run)
        run_len = np.diff(np.append(run_starts, n))
        # rank = 1 + rn0 at the run start, shared by the whole run;
        # cume numerator = rn0 at run END + 1 (peers included)
        rank = np.repeat(rn0[run_starts] + 1, run_len)
        cume_num = np.repeat(
            rn0[run_starts] + run_len, run_len
        ).astype(np.int64)
        pr = np.where(
            seg_n > 1, (rank - 1) / np.maximum(seg_n - 1, 1), 0.0
        )
        cd = cume_num / seg_n
        out = df.iloc[order][keep].reset_index(drop=True)
        out["rnk"] = rank
        out["percent_rank"] = pr
        out["cume_dist"] = cd
        return out[out_cols]

    return tagged.groupby("_part").map_groups(partition_fn, batch_format="pandas")


# ----------------------------------------------- global total-order ranks


def rolling_ols_slope(
    ds,
    key: str = "user_id",
    ts_col: str = "ts",
    window: int = 24,
    num_partitions: int | None = None,
):
    """Trailing-window OLS slope per key: for each (key, hour-bucket)
    activity row, the least-squares slope of hourly event count over
    hour index across the last ``window`` activity rows (ROWS frame,
    matching SQL ``rows between W-1 preceding and current row``) — the
    windowed-regression "is this user accelerating?" feature a
    feature store computes at serving time.

    ONE int-keyed exchange, cohort-pattern fused: per-batch
    (key, hour, n) count partials carry a key-hash partition id; each
    partition merges its partials, lexsorts (key, hour), and computes
    every windowed moment (m, Sx, Sy, Sxx, Sxy) from int64 prefix
    sums — no per-row loop, no second shuffle. The slope is ONE double
    division of exact integers, so the oracle's window SQL reproduces
    it bit-for-bit. Degenerate windows (m == 1) emit NULL.

    Hour indices are rebased to 2020-01-01 (both engines) so the
    partition-wide int64 prefix sum of hx^2 stays exact out to ~1e9
    rows per partition — raw 1970-epoch indices would overflow past
    ~4e7."""
    import pandas as pd

    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)
    W = int(window)
    HOUR_US = 3_600_000_000
    EPOCH_2020_H = 438_288  # hours 1970-01-01 -> 2020-01-01

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        hx = (
            batch[ts_col].astype("datetime64[us]").astype(np.int64) // HOUR_US
            - EPOCH_2020_H
        )
        g = pd.DataFrame({key: batch[key].to_numpy(), "hx": hx})
        g["n"] = 1
        out = g.groupby([key, "hx"], as_index=False)["n"].sum()
        out["_part"] = (
            pd.util.hash_pandas_object(out[key], index=False).to_numpy() % P
        ).astype(np.int32)
        return out

    tagged = ds.select_columns([key, ts_col]).map_batches(
        partial, batch_format="pandas", batch_size=None
    )

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        out_cols = [key, "hour_idx", "y", "n_window", "slope"]
        if len(df) == 0:
            return pd.DataFrame({
                key: pd.Series([], dtype=object),
                "hour_idx": pd.Series([], dtype=np.int64),
                "y": pd.Series([], dtype=np.int64),
                "n_window": pd.Series([], dtype=np.int64),
                "slope": pd.Series([], dtype=np.float64),
            })[out_cols]
        df = df.groupby([key, "hx"], as_index=False)["n"].sum()
        codes, uniq = pd.factorize(df[key], sort=False)
        hx = df["hx"].to_numpy(np.int64)
        order = np.lexsort((hx, codes))
        codes_s, hx_s = codes[order], hx[order]
        y_s = df["n"].to_numpy(np.int64)[order]
        m_rows = len(df)
        new_key = np.empty(m_rows, dtype=bool)
        new_key[0] = True
        new_key[1:] = codes_s[1:] != codes_s[:-1]
        starts = np.flatnonzero(new_key)
        seg_len = np.diff(np.append(starts, m_rows))
        seg_start = np.repeat(starts, seg_len)
        idx = np.arange(m_rows, dtype=np.int64)
        lo = np.maximum(idx - (W - 1), seg_start)  # inclusive window start

        def win_sum(a: np.ndarray) -> np.ndarray:
            p = np.concatenate([[0], np.cumsum(a, dtype=np.int64)])
            return p[idx + 1] - p[lo]

        m = (idx - lo + 1).astype(np.int64)
        sx = win_sum(hx_s)
        sy = win_sum(y_s)
        sxx = win_sum(hx_s * hx_s)
        sxy = win_sum(hx_s * y_s)
        den = m * sxx - sx * sx
        num = m * sxy - sx * sy
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = np.where(den > 0, num.astype(np.float64) / den, np.nan)
        return pd.DataFrame({
            key: np.asarray(uniq)[codes_s],
            "hour_idx": hx_s,
            "y": y_s,
            "n_window": m,
            "slope": slope,
        })[out_cols]

    return tagged.groupby("_part").map_groups(per_part, batch_format="pandas")


def global_row_number(
    ds,
    primary: str,
    tiebreak: str,
    descending: bool = False,
    num_partitions: int | None = None,
    out_col: str = "rn",
):
    """Exact global 1-based row numbers under the total order
    ``(primary [desc], tiebreak asc)`` — the primitive behind global
    ntile / percent_rank / exact top-N without a driver pull.

    Three passes, all bounded driver traffic:

    1. deterministic per-batch samples of ``primary`` pick P-1 range
       boundaries (sampling affects only partition BALANCE, never
       correctness);
    2. per-batch ``bincount`` partials of partition ids give the
       driver EXACT per-partition row counts (P ints) -> prefix
       offsets;
    3. one range exchange; each partition lexsorts locally and emits
       ``offset[p] + local position``.

    Rows with equal ``primary`` always land in the same partition
    (assignment depends on ``primary`` alone), so the local
    ``(primary, tiebreak)`` lexsort realizes the global order exactly.
    ``(primary, tiebreak)`` pairs must be distinct for a unique
    numbering (pass a unique id as ``tiebreak``). Returns the input
    rows plus ``out_col``; also returns the exact total row count.
    """
    import pandas as pd

    from .rollup import partitions_for_input

    P = num_partitions or partitions_for_input(None)
    sign = -1.0 if descending else 1.0

    # three passes below (sample / counts / exchange) — pin the input
    # blocks once instead of re-executing the upstream chain per pass
    ds = ds.materialize()

    def sample(batch: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(batch[primary].to_numpy(np.float64))
        if not len(v):
            return pd.DataFrame({"s": pd.Series([], dtype=np.float64)})
        take = np.linspace(0, len(v) - 1, num=min(16, len(v))).astype(np.int64)
        return pd.DataFrame({"s": v[take]})

    samp = np.sort(
        ds.map_batches(sample, batch_format="pandas", batch_size=None)
        .to_pandas()["s"].to_numpy(np.float64) * sign
    )
    if len(samp):
        q = np.linspace(0, len(samp) - 1, num=P + 1)[1:-1].astype(np.int64)
        bounds = np.unique(samp[q])
    else:
        bounds = np.array([], dtype=np.float64)

    def part_of(batch: pd.DataFrame) -> np.ndarray:
        v = batch[primary].to_numpy(np.float64) * sign
        return np.searchsorted(bounds, v, side="right").astype(np.int64)

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = np.bincount(part_of(batch), minlength=len(bounds) + 1)
        return pd.DataFrame({"p": np.arange(len(c), dtype=np.int64),
                             "n": c.astype(np.int64)})

    counts = (
        ds.map_batches(count_partial, batch_format="pandas", batch_size=None)
        .to_pandas()  # P ints per block
        .groupby("p")["n"].sum()
        .reindex(range(len(bounds) + 1), fill_value=0)
        .to_numpy(np.int64)
    )
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    total = int(counts.sum())

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_part"] = part_of(batch).astype(np.int32)
        return batch

    def rank_partition(df: pd.DataFrame) -> pd.DataFrame:
        p = int(df["_part"].iloc[0])
        df = df.drop(columns=["_part"])
        order = np.lexsort((df[tiebreak].to_numpy(),
                            df[primary].to_numpy(np.float64) * sign))
        out = df.iloc[order].reset_index(drop=True)
        out[out_col] = offsets[p] + 1 + np.arange(len(out), dtype=np.int64)
        return out

    ranked = (
        ds.map_batches(tag, batch_format="pandas", batch_size=None)
        .groupby("_part")
        .map_groups(rank_partition, batch_format="pandas")
    )
    return ranked, total


def ntile_from_rank(rank: np.ndarray, n: int, k: int) -> np.ndarray:
    """ANSI ntile bucket (1-based) from exact global 1-based row
    numbers over ``n`` rows: the first ``n % k`` buckets hold
    ``n // k + 1`` rows."""
    base = n // k
    rem = n % k
    big_span = rem * (base + 1)
    r0 = rank - 1
    return np.where(
        r0 < big_span,
        r0 // max(base + 1, 1) + 1,
        rem + (np.maximum(r0 - big_span, 0) // max(base, 1)) + 1,
    ).astype(np.int64)


def global_ntile(
    ds,
    primary: str,
    tiebreak: str,
    k: int,
    descending: bool = False,
    out_col: str = "bucket",
    num_partitions: int | None = None,
):
    """Exact global ``ntile(k) over (order by primary [desc],
    tiebreak)`` via :func:`global_row_number` — no single-partition
    sort, no driver materialization of the rows."""
    import pandas as pd

    ranked, total = global_row_number(
        ds, primary, tiebreak, descending=descending,
        num_partitions=num_partitions, out_col="_rn",
    )

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[out_col] = ntile_from_rank(
            batch["_rn"].to_numpy(np.int64), total, k)
        return batch.drop(columns=["_rn"])

    return ranked.map_batches(bucketize, batch_format="pandas", batch_size=None)
