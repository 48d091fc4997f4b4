"""Per-partition lineage / checkpoint / resume.

Reference parity (studied, not copied): the disk-buffer chunk lifecycle —
chunks named by content, promoted incoming→outgoing, deleted per-route on OK,
and a startup scan resuming unprocessed chunks (src/flb_buffer_chunk.c:744-831,
src/flb_buffer.c:52-190) — and in_tail's per-file SQLite offset checkpoint
(plugins/in_tail/tail_db.c:49-136).

Ray mapping: a *partition* is one input parquet file. Pending partitions are
processed in WAVES (one streaming Dataset run per wave); when a wave
completes, each of its partitions gets a lineage record
``_lineage/{pid}.json`` (status, row/byte/failure counts per sink, wall time)
plus its per-partition aggregate rows ``_lineage/agg/{pid}.parquet``. A
restarted job skips partitions with a lineage record, deletes stale partial
outputs of unfinished ones (``{sink}/{pid}__*``), and re-processes only
those — final aggregates merge the per-partition aggregate files, so
finished work is never recomputed. Wave granularity bounds replay, like the
reference's chunk granularity.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from . import storage


def partition_id(path: str) -> str:
    """Input file -> stable partition id (basename without extension)."""
    return os.path.splitext(storage.basename(path))[0]


def lineage_dir(out_dir: str) -> str:
    return storage.join(out_dir, "_lineage")


def agg_dir(out_dir: str) -> str:
    return storage.join(lineage_dir(out_dir), "agg")


def lineage_path(out_dir: str, pid: str) -> str:
    return storage.join(lineage_dir(out_dir), f"{pid}.json")


def is_done(out_dir: str, pid: str) -> bool:
    p = lineage_path(out_dir, pid)
    if not storage.exists(p):
        return False
    try:
        with storage.open_file(p) as f:
            return json.load(f).get("status") == "done"
    except (ValueError, OSError):
        return False


def pending_partitions(input_files: list[str], out_dir: str) -> list[str]:
    """Input files still needing processing (no done lineage record)."""
    return [f for f in input_files if not is_done(out_dir, partition_id(f))]


def clean_partial_outputs(out_dir: str, pids: list[str], sinks: list[str]) -> int:
    """Remove stale sink outputs of unfinished partitions (idempotent
    restart; wave agg dirs are cleaned separately by the startup scan)."""
    removed = 0
    for sink in sinks:
        for pid in pids:
            for f in storage.glob(storage.join(out_dir, sink, f"{pid}__*")):
                storage.remove(f)
                removed += 1
    return removed


def write_lineage(
    out_dir: str,
    pid: str,
    metrics: dict,
    wave: int,
    status: str = "done",
    extra: Optional[dict] = None,
) -> None:
    """Commit one partition's lineage + metrics record.

    `metrics` carries the per-sink counters (records/bytes/parse_failures) —
    the analog of flb_metrics' per-instance counters
    (src/flb_metrics.c, ids include/fluent-bit/flb_metrics.h:28-35).
    """
    storage.makedirs(lineage_dir(out_dir))
    rec = {
        "partition": pid,
        "status": status,
        "wave": wave,
        "committed_unix": time.time(),
        "metrics": metrics,
    }
    if extra:
        rec.update(extra)
    tmp = lineage_path(out_dir, pid) + ".tmp"
    with storage.open_file(tmp, "w") as f:
        json.dump(rec, f, sort_keys=True)
    # atomic locally; torn writes elsewhere read as not-done (storage.py)
    storage.replace(tmp, lineage_path(out_dir, pid))


def read_lineage(out_dir: str) -> list[dict]:
    out = []
    for p in storage.glob(storage.join(lineage_dir(out_dir), "*.json")):
        try:
            with storage.open_file(p) as f:
                out.append(json.load(f))
        except (ValueError, OSError):
            continue
    return out


def waves(items: list[str], wave_size: int) -> list[list[str]]:
    return [items[i : i + wave_size] for i in range(0, len(items), wave_size)]
