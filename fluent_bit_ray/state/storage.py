"""Storage layer for everything the engine WRITES (sinks, lineage,
exchange shards) — and THE one place the shared-storage requirement is
documented.

SHARED-STORAGE REQUIREMENT: sink files, lineage records, wave aggregates
and exchange shard parquet are written by whichever node runs the task
and read back by the driver (resume scan, final aggregate) and by other
tasks. On a multi-node cluster `out_dir` / `shard_output_dir` therefore
MUST be shared storage — an NFS mount, or an object store via an
fsspec URI (s3://bucket/path, gs://...). Single-node runs may use plain
local paths. The engine does not verify reachability across nodes; a
non-shared path on a multi-node cluster loses sink output silently.

Path handling: a bare path (no scheme) takes the os/shutil fast path —
zero overhead and byte-identical behavior for local runs. A path with a
scheme routes through fsspec (`file://`, `memory://`, `s3://`, ...).
Caveats that matter here:
- `memory://` is PER-PROCESS: Ray workers each see their own memory
  filesystem, so it is only coherent for driver-side state (lineage,
  wave commits) and tests — never for multi-worker sink output.
- object stores have no atomic rename: `replace()` degrades to
  copy-then-delete. The lineage commit stays correct anyway because
  readers treat an unparseable/partial JSON record as "not done"
  (checkpoint.is_done), so a torn write can only cause re-processing,
  never skipped work — and sink writes are content-addressed, so
  re-processing overwrites identical bytes.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil
from typing import Any


def has_scheme(path: str) -> bool:
    return "://" in path


def fs_for(path: str):
    """(fsspec filesystem, scheme-stripped path) for a URI."""
    import fsspec

    return fsspec.core.url_to_fs(path)


def join(base: str, *parts: str) -> str:
    if has_scheme(base):
        return "/".join([base.rstrip("/"), *[p.strip("/") for p in parts]])
    return os.path.join(base, *parts)


def basename(path: str) -> str:
    return path.rstrip("/").rsplit("/", 1)[-1]


def dirname(path: str) -> str:
    if has_scheme(path):
        head = path.rstrip("/").rsplit("/", 1)[0]
        return head
    return os.path.dirname(path)


def makedirs(path: str) -> None:
    if has_scheme(path):
        fs, p = fs_for(path)
        fs.makedirs(p, exist_ok=True)
    else:
        os.makedirs(path, exist_ok=True)


def exists(path: str) -> bool:
    if has_scheme(path):
        fs, p = fs_for(path)
        return fs.exists(p)
    return os.path.exists(path)


def open_file(path: str, mode: str = "r"):
    if has_scheme(path):
        fs, p = fs_for(path)
        return fs.open(p, mode)
    return open(path, mode)


def glob(pattern: str) -> list[str]:
    if has_scheme(pattern):
        fs, p = fs_for(pattern)
        return sorted(fs.unstrip_protocol(m) for m in fs.glob(p))
    return sorted(_glob.glob(pattern))


def list_files(dir_path: str, suffix: str = "") -> list[str]:
    """Recursive file listing under a directory (names only — metadata
    scan, no data reads), sorted, optionally filtered by suffix."""
    out: list[str] = []
    if has_scheme(dir_path):
        fs, p = fs_for(dir_path)
        try:
            found = fs.find(p)
        except FileNotFoundError:
            return []
        out = [fs.unstrip_protocol(m) for m in found]
    else:
        for root, _dirs, names in os.walk(dir_path):
            out.extend(os.path.join(root, n) for n in names)
    return sorted(m for m in out if m.endswith(suffix))


def file_size(path: str) -> int:
    if has_scheme(path):
        fs, p = fs_for(path)
        return int(fs.size(p))
    return os.path.getsize(path)


def remove(path: str) -> None:
    if has_scheme(path):
        fs, p = fs_for(path)
        fs.rm(p)
    else:
        os.remove(path)


def rmtree(path: str) -> None:
    if has_scheme(path):
        fs, p = fs_for(path)
        try:
            fs.rm(p, recursive=True)
        except FileNotFoundError:
            pass
    else:
        shutil.rmtree(path, ignore_errors=True)


def replace(tmp: str, dst: str) -> None:
    """Atomic rename locally; copy-then-delete semantics on stores
    without rename (see module docstring for why that stays safe)."""
    if has_scheme(tmp):
        fs, p_tmp = fs_for(tmp)
        _, p_dst = fs_for(dst)
        fs.mv(p_tmp, p_dst)
    else:
        os.replace(tmp, dst)


def write_parquet(table: Any, path: str) -> None:
    import pyarrow.parquet as pq

    if has_scheme(path):
        fs, p = fs_for(path)
        with fs.open(p, "wb") as f:
            pq.write_table(table, f)
    else:
        pq.write_table(table, path)


def read_parquet(path: str):
    import pyarrow.parquet as pq

    if has_scheme(path):
        fs, p = fs_for(path)
        with fs.open(p, "rb") as f:
            return pq.read_table(f)
    return pq.read_table(path)
