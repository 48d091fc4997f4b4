"""CLI entry: run a classic-mode config file as a Ray Data pipeline.

    python -m fluent_bit_ray -c pipeline.conf [-o /tmp/out] [--cpus 8]

The CLI owns the Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="fluent_bit_ray")
    ap.add_argument("-c", "--config", required=True, help="classic-mode config file")
    ap.add_argument("-o", "--out", default=None, help="output root directory")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "logging_level": "ERROR"}
        if args.cpus:
            kwargs["num_cpus"] = args.cpus
        ray.init(**kwargs)

    from .pipelines.config import run_config

    with open(args.config) as f:
        text = f.read()
    result = run_config(text, out_root=args.out)
    print(json.dumps({"counts": result.counts}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
