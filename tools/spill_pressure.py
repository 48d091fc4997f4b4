"""Object-store-pressure evidence for the 100 TB story (VERDICT r4 #7).

Runs the flagship weblog pipeline (parse → enrich → route → aggregate)
over a corpus whose in-flight Arrow blocks far exceed a deliberately
tiny object store, so Ray's streaming executor must backpressure and the
plasma store must spill to disk. Proves two things, recorded as one JSON
line for BASELINE.md:

  1. graceful degradation: the run COMPLETES (no OOM, no worker deaths)
     with spill — the behavior a 256-node cluster relies on when a skewed
     wave outruns a node's store;
  2. no wrong answers under spill: the per-sink aggregate still satisfies
     the exact routed-row invariants (sink_all counts every input row
     exactly once; per-sink records sum to the lang partition sizes).

Usage (fresh process; nothing else running on the box):
    python tools/spill_pressure.py [--rows 19200000] [--store-gb 1.0]
"""

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=19_200_000,
                    help="pages rows (default: the 1.7 GB parquet corpus)")
    ap.add_argument("--store-gb", type=float, default=1.0,
                    help="object store size in GiB (default 1.0 — far "
                         "under the corpus' in-flight footprint)")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    os.chdir(REPO)
    import ray

    ray.init(
        address="local",
        num_cpus=args.cpus,
        include_dashboard=False,
        object_store_memory=int(args.store_gb * (1 << 30)),
    )

    from fluent_bit_ray.synth import pages_path
    from fluent_bit_ray.pipelines.weblog import aggregate_only

    pages = pages_path(args.rows, partitions=32)

    t0 = time.time()
    agg = aggregate_only(pages)
    elapsed = time.time() - t0

    # ---- exact invariants (no second run needed):
    # sink_all matches everything (Match *), so its records must equal
    # the input row count exactly; sink_en must equal the lang='en' rows.
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    n_rows = pq.ParquetDataset(pages).read(columns=["lang"])
    n_total = n_rows.num_rows
    n_en = pc.sum(
        pc.equal(pc.fill_null(n_rows["lang"], ""), "en")).as_py()

    def sink_records(name: str) -> int:
        m = pc.equal(agg["sink"], name)
        return pc.sum(pc.filter(agg["records"], m)).as_py() or 0

    got_all = sink_records("sink_all")
    got_en = sink_records("sink_en")
    ok = (got_all == n_total) and (got_en == n_en)

    # ---- spill evidence from the raylet's own log accounting (the
    # grpc-backed memory_summary API needs grpcio, absent here; the
    # raylet periodically logs "Spilled N MiB, M objects ... Restored
    # N MiB, M objects" from local_object_manager — take the LAST line)
    session_dir = ray._private.worker._global_node.get_session_dir_path()
    spilled_mib = spilled_objects = restored_mib = 0
    raylet_log = os.path.join(session_dir, "logs", "raylet.out")
    if os.path.exists(raylet_log):
        with open(raylet_log, errors="replace") as f:
            for line in f:
                m = re.search(r"Spilled (\d+) MiB, (\d+) objects", line)
                if m:
                    spilled_mib = int(m.group(1))
                    spilled_objects = int(m.group(2))
                r = re.search(r"Restored (\d+) MiB", line)
                if r:
                    restored_mib = int(r.group(1))

    print(json.dumps({
        "tool": "spill_pressure",
        "rows": n_total,
        "object_store_gb": args.store_gb,
        "num_cpus": args.cpus,
        "elapsed_sec": round(elapsed, 2),
        "rows_per_sec": round(n_total / elapsed, 1),
        "spilled_mib": spilled_mib,
        "spilled_objects": spilled_objects,
        "restored_mib": restored_mib,
        "sink_all_records": got_all,
        "expected_rows": n_total,
        "sink_en_records": got_en,
        "expected_en": n_en,
        "invariants_ok": ok,
    }))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
