"""CLI entry point — the `ray job submit` surface (SURVEY.md §4
scheduling row): `python -m spectral_time_series_ray <cmd>`.

Commands:
  run        full flagship pipeline -> partitioned tiers + manifests
  retention  apply tier TTLs to an output root
  bench      one-line JSON benchmark (same as bench.py)

Owns its Ray session (guarded init; the driver-facing entry points in
__ray_entry__ never init).
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="spectral_time_series_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="run the flagship pipeline")
    p_run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_run.add_argument("--out", required=True)
    p_run.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    p_run.add_argument("--no-resume", action="store_true")

    p_ret = sub.add_parser("retention", help="apply tier TTLs")
    p_ret.add_argument("--out", required=True)
    p_ret.add_argument("--tier", required=True, choices=["1m", "1h", "1d"])
    p_ret.add_argument("--ttl-days", type=int, default=None)
    p_ret.add_argument("--now", default=None, help="YYYY-MM-DD (default: today)")
    p_ret.add_argument("--dry-run", action="store_true")

    sub.add_parser("bench", help="one-line JSON benchmark")

    args = ap.parse_args(argv)

    if args.cmd == "retention":
        from .state.retention import DEFAULT_TTL_DAYS, apply_retention

        now = dt.date.fromisoformat(args.now) if args.now else dt.date.today()
        ttl = dict(DEFAULT_TTL_DAYS)
        if args.ttl_days is not None:
            ttl[args.tier] = args.ttl_days
        dropped = apply_retention(args.out, args.tier, now, ttl, dry_run=args.dry_run)
        print(json.dumps({"tier": args.tier, "dropped": dropped, "dry_run": args.dry_run}))
        return 0

    import ray

    if args.cmd == "bench":
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import bench

        print(json.dumps(bench.run_bench()))
        return 0

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS", "")
        if addr and addr != "local":
            # inside `ray job submit` (or any session with a cluster
            # address): CONNECT — never start a competing local
            # instance on the head node, and never cap the cluster to
            # --num-cpus (a local-mode knob only)
            ray.init(ignore_reinit_error=True, logging_level="ERROR")
        else:
            ray.init(
                address="local",
                num_cpus=args.num_cpus,
                include_dashboard=False,
                ignore_reinit_error=True,
                logging_level="ERROR",
            )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .pipelines.flagship import run_flagship
    from .state.manifest import read_manifests

    run_flagship(args.sf_dir, out_root=args.out, resume=not args.no_resume)
    summary = {
        tier: {
            "partitions": len(read_manifests(args.out, tier)),
            "rows": sum(m["row_count"] for m in read_manifests(args.out, tier)),
        }
        for tier in ("1m", "1h", "1d")
    }
    print(json.dumps({"out": args.out, "tiers": summary}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
