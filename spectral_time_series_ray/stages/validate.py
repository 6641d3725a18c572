"""Input validation / bad-record handling for the transcript schema.

At 10^12-turn scale some shards WILL carry malformed rows; the policy
here is explicit and deterministic (SURVEY.md §4 retries row — "bad-
record handling explicit"):

- schema check: required columns + types (fail fast at plan time)
- row rules, vectorized per batch: null/empty conv_id dropped,
  negative turn_idx dropped, null ts dropped, null text -> "" (the
  text-passthrough invariant compares bytes, so the repair must be
  deterministic)
- duplicate (conv_id, turn_idx) pairs: keep the FIRST by ts (stable),
  implemented per conversation during the ordered pass
- every drop is counted; counts are emitted as a small side Dataset so
  lineage records can carry data-quality tallies
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

REQUIRED = {"conv_id": "string", "turn_idx": "int32", "ts": "timestamp[us]"}


def check_schema(ds) -> None:
    schema = ds.schema()
    names = set(schema.names)
    missing = [c for c in REQUIRED if c not in names]
    if missing:
        raise ValueError(f"transcript input missing required columns: {missing}")
    for col, want in REQUIRED.items():
        got = str(schema.field(col).type) if hasattr(schema, "field") else None
        if got is not None and got != want:
            raise ValueError(f"column {col!r}: expected {want}, got {got}")


def clean_batch(batch: pa.Table) -> pa.Table:
    """Vectorized row rules; adds a `_dropped` count via attribute-free
    filtering (counts derivable by diffing input/output row counts)."""
    ok = pc.and_(
        pc.and_(
            pc.invert(pc.is_null(batch["conv_id"])),
            pc.invert(pc.is_null(batch["ts"])),
        ),
        pc.greater_equal(batch["turn_idx"], 0),
    )
    if "conv_id" in batch.column_names:
        ok = pc.and_(ok, pc.invert(pc.equal(batch["conv_id"], "")))
    batch = batch.filter(ok)
    if "text" in batch.column_names:
        idx = batch.schema.get_field_index("text")
        batch = batch.set_column(idx, "text", pc.fill_null(batch["text"], ""))
    return batch


def dedup_turns(df: pd.DataFrame) -> pd.DataFrame:
    """Within one conversation: keep the first row per turn_idx
    (stable by ts). Run inside any per-conversation grouped pass."""
    return df.sort_values(["turn_idx", "ts"], kind="stable").drop_duplicates(
        "turn_idx", keep="first"
    )


def validate_transcripts(ds):
    """Schema check + vectorized row cleaning. Returns the cleaned
    Dataset; callers needing per-conversation turn dedup apply
    :func:`dedup_turns` inside their grouped stage."""
    check_schema(ds)
    return ds.map_batches(clean_batch, batch_format="pyarrow", batch_size=None)


def orphan_key_count(child_ds, parent_ds, child_col: str, parent_col: str):
    """Referential-integrity check: how many child rows reference a
    key absent from the parent (data-quality gate before a join-heavy
    pipeline run).

    Scale path: a Bloom filter over the parent keys (OR-merged
    per-block bitsets, O(bits) each) prefilters the child — rows whose
    key IS in the filter are definitely-or-probably fine; only the
    Bloom REJECTS are certain orphans (no false negatives), and the
    Bloom's false-positive survivors are verified exactly against the
    parent key set restricted to the sparse suspect keys. Returns
    ``(n_child, n_orphans)``.
    """
    import numpy as np
    import pandas as pd

    from .join import bloom_semi_filter, build_bloom

    bloom = build_bloom(parent_ds, parent_col)
    n_child = child_ds.count()
    # schema-resolved hashing on BOTH sides (see join.key_hash_scheme):
    # a per-batch dtype sniff could hash a null-promoted batch
    # differently and manufacture false negatives / phantom orphans
    certain = bloom_semi_filter(
        child_ds.select_columns([child_col]), child_col, bloom, invert=True
    )
    n_certain = certain.count()  # bloom rejects: orphans for sure
    # Bloom false positives: verify exactly with a DISTRIBUTED
    # left-outer join on the distinct-key level — neither key set ever
    # lands on the driver
    from .rollup import partitions_for_input

    P = partitions_for_input(None)

    # ONE int-keyed exchange: per-batch (key, count) partials from the
    # child and distinct keys from the parent hash-partition together;
    # each partition sums child counts whose key is absent from its
    # parent-key slice. Replaces a distinct-groupby + Dataset.join
    # chain (a Ray range-partition sort plus a shuffle join) with a
    # single exchange of pre-collapsed rows.
    def child_partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[child_col].value_counts()
        out = pd.DataFrame(
            {"k": vc.index.to_numpy(), "cnt": vc.to_numpy().astype(np.int64)}
        )
        out["_side"] = "c"
        return out

    def parent_partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"k": batch[parent_col].unique()})
        out["cnt"] = np.int64(0)
        out["_side"] = "p"
        return out

    c = child_ds.select_columns([child_col]).map_batches(
        child_partial, batch_format="pandas", batch_size=None
    )
    p = parent_ds.select_columns([parent_col]).map_batches(
        parent_partial, batch_format="pandas", batch_size=None
    )

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_part"] = (
            pd.util.hash_pandas_object(batch["k"], index=False).to_numpy() % P
        ).astype(np.int32)
        return batch

    both = c.union(p).map_batches(add_part, batch_format="pandas", batch_size=None)

    def orphan_part(g: pd.DataFrame) -> pd.DataFrame:
        parents = set(g.loc[g["_side"] == "p", "k"])
        ch = g[g["_side"] == "c"]
        miss = ~ch["k"].isin(parents)
        return pd.DataFrame({"n": [int(ch.loc[miss, "cnt"].sum())]})

    parts = both.groupby("_part").map_groups(
        orphan_part, batch_format="pandas"
    ).to_pandas()
    n_orphans = int(parts["n"].sum()) if len(parts) else 0
    # consistency: bloom certain-orphans can never exceed the exact count
    assert n_certain <= n_orphans, (n_certain, n_orphans)
    return n_child, n_orphans


def expectation_checks(ds, rules: list[dict], num_partitions: int | None = None):
    """Great-Expectations-style data-quality suite in ONE streaming
    pass + (only if a uniqueness rule is present) one key-hash
    exchange of count partials. Each rule is a dict:

    - ``{"rule": name, "kind": "not_null", "col": c}``
    - ``{"rule": name, "kind": "range", "col": c, "lo": x, "hi": y}``
      (violation = value < lo or value >= hi; NaN counts as violation)
    - ``{"rule": name, "kind": "in_set", "col": c, "values": [...]}``
    - ``{"rule": name, "kind": "unique", "col": c}``
      (violations = n_rows - n_distinct, the SQL convention)

    Returns a DataFrame (rule, violations) — one bounded row per rule;
    the corpus never reaches the driver.
    """
    import pandas as pd

    from .rollup import partitions_for_input

    scalar_rules = [r for r in rules if r["kind"] != "unique"]
    unique_rules = [r for r in rules if r["kind"] == "unique"]

    def scalar_partial(batch: pd.DataFrame) -> pd.DataFrame:
        names, viols = [], []
        for r in scalar_rules:
            col = batch[r["col"]]
            if r["kind"] == "not_null":
                v = int(col.isna().sum())
            elif r["kind"] == "range":
                x = col.to_numpy(np.float64)
                v = int((~((x >= r["lo"]) & (x < r["hi"]))).sum())
            elif r["kind"] == "in_set":
                v = int((~col.isin(r["values"])).sum())
            else:
                raise ValueError(r["kind"])
            names.append(r["rule"])
            viols.append(v)
        return pd.DataFrame({"rule": names, "violations": np.asarray(viols, np.int64)})

    parts = []
    if scalar_rules:
        from ray.data.aggregate import Sum

        sc = (
            ds.map_batches(scalar_partial, batch_format="pandas", batch_size=None)
            .groupby("rule")
            .aggregate(Sum("violations", alias_name="violations"))
            .to_pandas()
        )
        parts.append(sc)
    P = num_partitions or partitions_for_input(None)
    for r in unique_rules:
        col = r["col"]

        def key_partial(batch: pd.DataFrame, col=col) -> pd.DataFrame:
            g = batch.groupby(col, as_index=False).size()
            g.columns = [col, "n"]
            g["_part"] = (
                pd.util.hash_pandas_object(g[col], index=False).to_numpy() % P
            ).astype(np.int32)
            return g

        def dup_count(df: pd.DataFrame, col=col) -> pd.DataFrame:
            s = df.groupby(col)["n"].sum()
            return pd.DataFrame({"extra": [int((s - 1).clip(lower=0).sum())]})

        extra = int(
            ds.select_columns([col])
            .map_batches(key_partial, batch_format="pandas", batch_size=None)
            .groupby("_part")
            .map_groups(dup_count, batch_format="pandas")
            .sum("extra")
        )
        parts.append(pd.DataFrame({"rule": [r["rule"]],
                                   "violations": np.array([extra], np.int64)}))
    out = pd.concat(parts, ignore_index=True)
    out["violations"] = out["violations"].astype(np.int64)
    return out.sort_values("rule").reset_index(drop=True)


def conversation_integrity(
    ds,
    key: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    role_col: str = "role",
    roles: tuple[str, ...] = ("user", "assistant", "tool"),
    num_partitions: int | None = None,
):
    """Per-conversation structural integrity: one conv-hash shuffle of
    four narrow columns, then a vectorized per-partition pass emitting
    one row per conversation with violation counts:

    - ``gap_violations``: turn_idx not contiguous from 0 (count of
      breaks, including a nonzero start)
    - ``ts_violations``: timestamp strictly decreasing steps
    - ``role_violations``: turns whose role is outside ``roles``
    - ``dup_violations``: duplicated turn_idx values
    """
    import pyarrow as pa

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

    ds = ds.select_columns([key, order_col, ts_col, role_col]).map_batches(
        add_part, batch_format="pyarrow", batch_size=None
    )

    role_set = set(roles)

    def partition_fn(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                key: pd.Series([], dtype=object),
                "n_turns": pd.Series([], dtype=np.int64),
                "gap_violations": pd.Series([], dtype=np.int64),
                "ts_violations": pd.Series([], dtype=np.int64),
                "role_violations": pd.Series([], dtype=np.int64),
                "dup_violations": pd.Series([], dtype=np.int64),
            })
        codes, uniques = pd.factorize(df[key], sort=False)
        order = np.lexsort((df[order_col].to_numpy(), codes))
        codes_s = codes[order]
        turn = df[order_col].to_numpy(np.int64)[order]
        t = df[ts_col].to_numpy(dtype="datetime64[us]").view("int64")[order]
        bad_role = (~df[role_col].isin(role_set)).to_numpy()[order]
        n = len(df)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = codes_s[1:] != codes_s[:-1]
        starts = np.flatnonzero(new_key)
        seg_len = np.diff(np.append(starts, n))
        # expected contiguous index within segment
        pos = np.arange(n) - np.repeat(starts, seg_len)
        dup = np.zeros(n, dtype=bool)
        dup[1:] = (~new_key[1:]) & (turn[1:] == turn[:-1])
        gap = turn != pos
        ts_dec = np.zeros(n, dtype=bool)
        ts_dec[1:] = (~new_key[1:]) & (t[1:] < t[:-1])
        seg_id = np.cumsum(new_key) - 1
        out = pd.DataFrame({
            key: uniques[codes_s[starts]],
            "n_turns": seg_len.astype(np.int64),
            "gap_violations": np.bincount(seg_id, gap).astype(np.int64),
            "ts_violations": np.bincount(seg_id, ts_dec).astype(np.int64),
            "role_violations": np.bincount(seg_id, bad_role).astype(np.int64),
            "dup_violations": np.bincount(seg_id, dup).astype(np.int64),
        })
        return out

    return ds.groupby("_part").map_groups(partition_fn, batch_format="pandas")
