#!/usr/bin/env python
"""Checkpointed flagship feature job — the `ray job submit` entrypoint.

    ray job submit -- python scripts/run_feature_job.py \
        --input /data/transcripts --output /data/features \
        --num-partitions 512

Also runs standalone (owns its Ray session).  The Ray address comes from
--address, else $RAY_ADDRESS, else "local" — so under `ray job submit`
on a real cluster it connects to the cluster instead of spawning a
private local Ray.  Resumable:
re-running with the same output dir skips partitions whose manifests are
already committed (and refuses a changed --num-partitions).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="transcript parquet dir")
    p.add_argument("--output", required=True, help="output dir (parquet + manifests)")
    p.add_argument("--num-partitions", type=int, default=128)
    p.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    p.add_argument("--address", default=None, help="Ray address (default: $RAY_ADDRESS or 'local')")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--no-lineage", action="store_true")
    p.add_argument(
        "--shuffle",
        default="push",
        choices=["push", "sort"],
        help="push-based shuffle measured ~40%% faster than the sort "
        "shuffle for the co-partition exchange (BASELINE.md)",
    )
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        addr = args.address or os.environ.get("RAY_ADDRESS", "local")
        kwargs = dict(ignore_reinit_error=True, logging_level="ERROR")
        if addr == "local":
            kwargs.update(num_cpus=args.num_cpus, include_dashboard=False)
        ray.init(address=addr, **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    if args.shuffle == "push":
        DataContext.get_current().use_push_based_shuffle = True

    from multimedia_indexing_ray.pipelines.runner import run_feature_job

    summary = run_feature_job(
        args.input,
        args.output,
        num_partitions=args.num_partitions,
        resume=not args.no_resume,
        include_lineage=not args.no_lineage,
    )
    ray.shutdown()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
