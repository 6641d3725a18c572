"""Retention policy over tiered rollup directories.

Tier layout (``tier=<tier>/date=<YYYY-MM-DD>/``) makes retention a
partition-level operation: dropping expired data is a directory delete
plus a manifest tombstone — no data rewrite. Default policy follows
the classic continuous-aggregate ladder: raw/1m kept short, 1h longer,
1d longest.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

DEFAULT_TTL_DAYS = {"1m": 7, "1h": 90, "1d": 3650}


def expired_partitions(
    out_root: str, tier: str, now: dt.date, ttl_days: dict[str, int] | None = None
) -> list[str]:
    """Dates under tier=<tier> older than the tier's TTL."""
    ttl = (ttl_days or DEFAULT_TTL_DAYS)[tier]
    cutoff = now - dt.timedelta(days=ttl)
    tier_dir = os.path.join(out_root, f"tier={tier}")
    if not os.path.isdir(tier_dir):
        return []
    out = []
    for name in sorted(os.listdir(tier_dir)):
        if not name.startswith("date="):
            continue
        try:
            d = dt.date.fromisoformat(name.split("=", 1)[1])
        except ValueError:
            continue
        if d < cutoff:
            out.append(name.split("=", 1)[1])
    return out


def apply_retention(
    out_root: str,
    tier: str,
    now: dt.date,
    ttl_days: dict[str, int] | None = None,
    dry_run: bool = False,
) -> list[str]:
    """Delete expired date partitions (and tombstone their manifests).
    Returns the dates dropped."""
    dropped = expired_partitions(out_root, tier, now, ttl_days)
    if dry_run:
        return dropped
    for date in dropped:
        shutil.rmtree(os.path.join(out_root, f"tier={tier}", f"date={date}"), ignore_errors=True)
        mpath = os.path.join(out_root, "_manifests", tier, f"{date}.json")
        if os.path.exists(mpath):
            os.replace(mpath, mpath + ".expired")
    return dropped


def filter_expired(ds, tier: str, now: dt.date, ttl_days: dict[str, int] | None = None):
    """Streaming-side retention: drop rows already past TTL before they
    are ever written (bucket-level filter, no shuffle)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ttl = (ttl_days or DEFAULT_TTL_DAYS)[tier]
    cutoff = dt.datetime.combine(now - dt.timedelta(days=ttl), dt.time())

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["bucket_ts"], pa.scalar(cutoff)))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)
