"""CLI entry: run a classic-mode config file, or the flagship weblog
pipeline, as a Ray Data job.

    python -m fluent_bit_ray -c pipeline.conf [-o /tmp/out] [--cpus 8]
    python -m fluent_bit_ray --weblog /data/pages -o /shared/out [--resume]

The CLI owns the Ray session (library code never calls ray.init).

`ray job submit` compatibility (the north-rule deployment shape): when
RAY_ADDRESS points at a cluster — which the job runtime sets — ray.init()
attaches to it; only a bare environment starts a local instance. On a
multi-node cluster `-o` must be shared storage (mount or fsspec URI —
contract in state/storage.py), e.g.:

    ray job submit --working-dir . -- \\
        python -m fluent_bit_ray --weblog /mnt/pages -o s3://bucket/out
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(cpus=None) -> None:
    import ray

    if ray.is_initialized():
        return
    kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
    # attach to the ambient cluster when one is advertised (ray job
    # submit / an operator-managed cluster); otherwise run local. The
    # sandbox presets RAY_ADDRESS=local, so both paths are exercised.
    addr = os.environ.get("RAY_ADDRESS", "local")
    if addr == "local":
        kwargs["address"] = "local"
        if cpus:
            kwargs["num_cpus"] = cpus
    # non-local: plain ray.init() picks up RAY_ADDRESS; num_cpus is a
    # cluster property there, not a driver argument
    ray.init(**kwargs)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="fluent_bit_ray")
    ap.add_argument("-c", "--config", default=None,
                    help="classic-mode config file")
    ap.add_argument("--weblog", default=None, metavar="PAGES_DIR",
                    help="run the flagship weblog pipeline over a pages "
                         "parquet directory")
    ap.add_argument("-o", "--out", default=None,
                    help="output root (path or fsspec URI; must be shared "
                         "storage on a multi-node cluster)")
    ap.add_argument("--resume", action="store_true",
                    help="weblog: skip partitions with committed lineage")
    ap.add_argument("--wave-size", type=int, default=8)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)
    if bool(args.config) == bool(args.weblog):
        ap.error("exactly one of -c/--config or --weblog is required")

    import ray

    _init_ray(args.cpus)

    if args.weblog:
        if not args.out:
            ap.error("--weblog needs -o/--out")
        from .pipelines.weblog import run_weblog

        res = run_weblog(args.weblog, args.out, resume=args.resume,
                         wave_size=args.wave_size)
        agg = res.pop("aggregate")
        res["aggregate_rows"] = agg.num_rows
        print(json.dumps(res))
    else:
        from .pipelines.config import run_config

        with open(args.config) as f:
            text = f.read()
        result = run_config(text, out_root=args.out)
        print(json.dumps({"counts": result.counts}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
