"""Small-file compaction for partitioned parquet output directories.

Every routed sink in this engine (and the reference's content-addressed
buffer chunks, src/flb_task.c naming) writes MANY small files — one per
(partition × producing task). At 100 TB that is operationally correct
(idempotent restarts, no giant files) but leaves a read-side tax: a
downstream `read_parquet` pays per-file open/footer costs. Compaction is
the standard maintenance pass: merge each directory's files into bins of
~`target_bytes` while preserving every row.

Shape: the driver reads ONLY file names + sizes (storage metadata, no
data), first-fit-packs them into bins in sorted-name order (stable,
preserves rough write order), and launches one Ray task per bin. Each
task reads its member files, concatenates, and writes ONE output file
whose name is content-addressed from the member list — so a re-run after
a crash skips finished bins instead of duplicating them (same resumable
contract as SinkWriteStage). Raw `@ray.remote` tasks by design: the work
unit is "this explicit list of files", which the Dataset API cannot
express without re-planning per bin.

Scale notes: driver state is O(#files) names — listing 1M shard files is
MBs; data never touches the driver. Bins cap at `target_bytes` of INPUT
bytes, so a task's working set is bounded regardless of corpus size.
Files already >= target_bytes pass through untouched (no rewrite cost
for data that is already well-sized).
"""

from __future__ import annotations

import hashlib
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_TARGET_BYTES = 256 << 20


def plan_bins(
    sized_files: list[tuple[str, int]], target_bytes: int
) -> tuple[list[list[str]], list[str]]:
    """Pack (path, size) pairs into bins of <= target_bytes input each, in
    sorted-path order (next-fit, keeps neighbors together so time/key
    locality in file names survives compaction). Returns (bins, passthrough)
    where passthrough files are already >= target and stay as they are.
    Single-file bins below target still rewrite: that is the degenerate
    many-tiny-files case compaction exists for."""
    bins: list[list[str]] = []
    passthrough: list[str] = []
    cur: list[str] = []
    cur_bytes = 0
    for path, size in sorted(sized_files):
        if size >= target_bytes:
            passthrough.append(path)
            continue
        if cur and cur_bytes + size > target_bytes:
            bins.append(cur)
            cur, cur_bytes = [], 0
        cur.append(path)
        cur_bytes += size
    if cur:
        bins.append(cur)
    return bins, passthrough


def _bin_token(members: list[str], sizes: dict[str, int], root: str) -> str:
    # hash the SRC-RELATIVE path, not the basename: partition subdirs
    # routinely repeat file names (part_00000.parquet), and a basename
    # collision would give two bins the same output path — the second
    # write silently replacing the first bin's rows
    h = hashlib.blake2b(digest_size=8)
    prefix = root.rstrip("/") + "/"
    for m in members:
        rel = m[len(prefix):] if m.startswith(prefix) else m
        h.update(f"{rel}:{sizes[m]};".encode())
    return h.hexdigest()


def compact_parquet_dir(
    src_dir: str,
    out_dir: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    num_cpus: float = 1.0,
) -> dict:
    """Compact every parquet file under `src_dir` into `out_dir`.

    Idempotent/resumable: output names are `bin_<token>.parquet` with the
    token derived from the member basenames+sizes, and bins whose output
    already exists are skipped — re-running after a partial failure only
    does the missing work. Files already >= target_bytes are NOT copied;
    the result directory semantically spans out_dir + the passthrough
    list (returned, so a caller moving directories can hard-link them).
    Source files are never deleted here — removal is the caller's call
    once the new layout is verified (the safe two-phase pattern).

    Returns {files_in, files_out, bins_written, bins_skipped, passthrough,
    rows}.
    """
    import ray

    from ..state import storage

    sized = [
        (p, storage.file_size(p))
        for p in storage.list_files(src_dir, suffix=".parquet")
    ]
    sizes = dict(sized)
    bins, passthrough = plan_bins(sized, target_bytes)
    storage.makedirs(out_dir)

    @ray.remote(num_cpus=num_cpus)
    def merge(members: list[str], out_path: str) -> int:
        tables = []
        for m in members:
            with storage.open_file(m, "rb") as f:
                tables.append(pq.read_table(f))
        out = pa.concat_tables(tables, promote_options="default")
        # atomic publish: the resume path skips any existing output, so a
        # crash mid-write must never leave a truncated file under the
        # final name (write tmp, rename — storage.replace contract)
        tmp = out_path + ".tmp"
        storage.write_parquet(out, tmp)
        storage.replace(tmp, out_path)
        return out.num_rows

    refs = []
    skipped = 0
    for members in bins:
        out_path = storage.join(
            out_dir, f"bin_{_bin_token(members, sizes, src_dir)}.parquet"
        )
        if storage.exists(out_path):
            skipped += 1
            continue
        refs.append(merge.remote(members, out_path))
    rows = sum(ray.get(refs)) if refs else 0
    return {
        "files_in": len(sized),
        "files_out": len(bins) + len(passthrough),
        "bins_written": len(refs),
        "bins_skipped": skipped,
        "passthrough": passthrough,
        "rows": rows,
    }
