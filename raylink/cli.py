"""CLI entrypoint — the ``ray job submit`` surface of the north rule.

Usage (single node or against a cluster via RAY_ADDRESS)::

    python -m raylink run \
        --turns /data/transcripts/*.parquet \
        --checkpoint /data/ckpt/run1 \
        [--config match_config.json] [--num-cpus 32]

    python -m raylink link \
        --table-a a.parquet --table-b b.parquet \
        --config match_config.json --output /data/out

A re-invocation of ``run`` with the same checkpoint dir resumes from the
last completed stage.  This module owns the Ray session (guarded — inside a
``ray job submit`` driver Ray is already initialised).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None) -> None:
    import os

    import ray

    if not ray.is_initialized():
        # under `ray job submit` the job agent exports RAY_ADDRESS and the
        # driver must CONNECT to the cluster, not start a local instance;
        # standalone runs (no RAY_ADDRESS, or the sandbox's "local") keep
        # the single-process behaviour
        address = os.environ.get("RAY_ADDRESS") or "local"
        if address == "local":
            kwargs = {"include_dashboard": False}
            if num_cpus:
                kwargs["num_cpus"] = num_cpus
            ray.init(address="local", **kwargs)
        else:
            # cluster-resource flags (num_cpus, dashboard) belong to the
            # cluster lifecycle, not a connecting driver
            ray.init(address=address)


def cmd_run(args: argparse.Namespace) -> int:
    import ray.data

    from .config import parse_config
    from .pipelines.transcripts import default_transcript_config, run_transcript_pipeline

    _ensure_ray(args.num_cpus)
    turns = ray.data.read_parquet(args.turns)
    config = None
    if args.config:
        with open(args.config) as f:
            config = parse_config(json.load(f))
    else:
        config = default_transcript_config()
    res = run_transcript_pipeline(
        turns, args.checkpoint, config, input_fingerprint=args.turns
    )
    print(json.dumps({"counters": res["counters"]}, default=str))
    return 0


def cmd_link(args: argparse.Namespace) -> int:
    import ray.data

    from .config import parse_config
    from .pipelines.linkage import run_linkage

    _ensure_ray(args.num_cpus)
    with open(args.config) as f:
        config = parse_config(json.load(f))
    ds_a = ray.data.read_parquet(args.table_a)
    ds_b = ray.data.read_parquet(args.table_b) if args.table_b else None
    # dispatches on the config's link_type: link_only / dedupe_only /
    # link_and_dedupe (the reference schema's three declared modes)
    res = run_linkage(config, ds_a, ds_b)
    res.matches.write_parquet(args.output)
    print(json.dumps({"counters": res.counters, "p_m": res.em.p_m}, default=str))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="raylink")
    sub = p.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="flagship transcript dedupe pipeline")
    run.add_argument("--turns", required=True)
    run.add_argument("--checkpoint", required=True)
    run.add_argument("--config")
    run.add_argument("--num-cpus", type=int)
    run.set_defaults(fn=cmd_run)

    link = sub.add_parser(
        "link", help="record linkage (link / dedupe / link_and_dedupe per config)"
    )
    link.add_argument("--table-a", required=True)
    link.add_argument("--table-b", help="required unless link_type=dedupe_only")
    link.add_argument("--config", required=True)
    link.add_argument("--output", required=True)
    link.add_argument("--num-cpus", type=int)
    link.set_defaults(fn=cmd_link)

    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray

    ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
