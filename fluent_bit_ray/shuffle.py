"""Two-stage parallel hash reduce for pre-combined aggregate rows.

Why raw Ray tasks here: Ray Data's sort-based groupby shuffle costs tens of
seconds of fixed overhead on sub-10M-row inputs, and the 2.49 hash-shuffle
strategy spins up an aggregator-actor topology that dwarfs this workload.
Our aggregate rows are ALREADY per-block combined partials — what remains is
exactly a static two-stage hash exchange:

    split stage (1 task per partial block):
        hash(key columns) % K  →  K sub-tables, each locally re-combined
    reduce stage (K tasks):
        concat its shard from every split  →  one group_by  →  distinct rows

Every stage is parallel; the driver only concatenates K already-distinct
shard results. Keys are hashed with pandas' vectorized hash (stable within a
run; shard assignment never crosses runs, so no cross-run stability needed).
This is the partitioning assumption documented for the flowcounter-style
aggregates: key space is uniform after hashing, so shards balance even when
`host` is Zipf-skewed (the skew lives WITHIN a key, and identical keys were
already combined in the map side).

SHARD-COUNT SIZING RULE (applies to every exchange in the engine — this
module, ops/windows, ops/stats, dedup label exchanges):

    num_shards = clamp(ceil(exchanged_bytes / TARGET_SHARD_BYTES),
                       floor = min(cpus, n_blocks, 32),
                       cap   = MAX_SHARDS)

The floor keeps small inputs parallel enough to use the machine; the
byte-derived term makes the count GROW with the data so a reduce shard
holds a bounded (~TARGET_SHARD_BYTES, default 128 MiB) slice no matter the
corpus size — at 100 TB of exchanged rows that is ~800k× more shards, not
32 shards of 3 TB each. `exchanged_bytes` is measured, not guessed: for
`hash_exchange` the split-side blocks already sit in the object store, so
their exact sizes come from object-location metadata; for Dataset-side
shard columns (ops/windows) the non-executing logical-plan estimate of the
nearest sized ancestor (usually the parquet read) is used. Tests force the
over-32 regime by shrinking FBR_TARGET_SHARD_BYTES instead of faking data.
"""

from __future__ import annotations

import os
from typing import Optional

import pyarrow as pa

from ._hashing import hash_columns

#: target bytes of exchanged data per reduce shard (env-overridable so
#: tests / operators can force many-shard topologies on small inputs)
DEFAULT_TARGET_SHARD_BYTES = 128 << 20
#: hard cap on shards per exchange: bounds the split-task `num_returns`
#: fan-out (the split×shard object matrix) — one exchange moving more than
#: MAX_SHARDS × TARGET_SHARD_BYTES (~8 TB default) should be partitioned
#: upstream (per input shard / key range) before it reaches one exchange
MAX_SHARDS = 65536


def target_shard_bytes() -> int:
    try:
        return max(1, int(os.environ.get("FBR_TARGET_SHARD_BYTES",
                                         DEFAULT_TARGET_SHARD_BYTES)))
    except ValueError:
        return DEFAULT_TARGET_SHARD_BYTES


def shards_for_bytes(total_bytes: Optional[int], floor: int,
                     cap: int = MAX_SHARDS) -> int:
    """The sizing rule above as a function: floor when the size is unknown
    or small, ceil(bytes/target) when the data demands more."""
    floor = max(1, int(floor))
    if not total_bytes or total_bytes <= 0:
        return floor
    need = -(-int(total_bytes) // target_shard_bytes())
    return max(floor, min(cap, need))


def refs_total_bytes(block_refs: list,
                     sample_frac: float = 0.1,
                     sample_timeout_s: float = 60.0) -> Optional[int]:
    """Total bytes of object-store blocks (no fetch): Ray tracks object
    sizes in location metadata.

    CHAINED exchanges pass refs whose producing tasks may still be
    running (`return_refs=True` from a previous hash_exchange), so some
    sizes are unknown at call time. Falling back to the floor there would
    silently re-create the old 32-shard cap on exactly the multi-exchange
    pipelines (q3/q5/top-star joins) the sizing rule exists for. Instead:
    wait for a small sample (`sample_frac`, bounded by `sample_timeout_s`)
    of the pending refs to finish — the split tasks block on ALL of them
    anyway, so this costs no pipeline work — then EXTRAPOLATE the total
    from the known sizes (mean × count). Exact when everything is already
    materialized (the common case); None only if nothing can be sized."""
    import ray

    try:
        locs = ray.experimental.get_object_locations(block_refs)

        def known() -> list[int]:
            return [
                int(locs[r]["object_size"])
                for r in block_refs
                if locs.get(r, {}).get("object_size") is not None
            ]

        sizes = known()
        want = max(1, int(len(block_refs) * sample_frac))
        if len(sizes) < want:
            ray.wait(list(block_refs), num_returns=want,
                     timeout=sample_timeout_s, fetch_local=False)
            locs = ray.experimental.get_object_locations(block_refs)
            sizes = known()
        if not sizes:
            return None
        if len(sizes) == len(block_refs):
            return sum(sizes)
        return int(sum(sizes) / len(sizes) * len(block_refs))
    except Exception:  # noqa: BLE001 — sizing is best-effort, floor applies
        return None


def dataset_size_estimate(ds) -> Optional[int]:
    """Non-executing size estimate for a (possibly lazy) Dataset: walk the
    logical DAG toward the source until an operator reports inferred
    metadata (the parquet read always does). Never triggers execution —
    `Dataset.size_bytes()` would materialize a transformed dataset, which
    is exactly the mid-pipeline materialization this engine avoids."""
    try:
        dag = ds._logical_plan.dag
        while dag is not None:
            meta = dag.infer_metadata()
            if meta is not None and meta.size_bytes is not None:
                return int(meta.size_bytes)
            deps = getattr(dag, "input_dependencies", None)
            if not deps:
                return None
            dag = deps[0]
    except Exception:  # noqa: BLE001 — internal-API guard, floor applies
        return None
    return None


def auto_shards_for_dataset(ds, floor: int) -> int:
    """Shard count for a Dataset-side exchange (ops/windows and friends):
    the sizing rule over the plan's non-executing size estimate.

    Estimate direction: the nearest SIZED ancestor is usually the raw
    parquet read, while the exchanged rows are a pruned projection of it
    — so the estimate typically OVERSHOOTS and errs toward more, smaller
    shards (the safe direction; empty shards cost one no-op task). A map
    that EXPANDS data (explode/flat_map) before the exchange inverts
    that: pass `num_shards` explicitly there. (The exploding operators in
    this package — line_dedup, boilerplate, dup_spans — are not affected:
    they exchange via hash_exchange, which sizes from the MEASURED bytes
    of the already-exploded blocks, not from this estimate.)"""
    return shards_for_bytes(dataset_size_estimate(ds), floor)


def _group_sum(t: pa.Table, keys: list[str], vals: list[str]) -> pa.Table:
    g = t.group_by(keys).aggregate([(v, "sum") for v in vals])
    return g.rename_columns(
        [c[: -len("_sum")] if c.endswith("_sum") else c for c in g.column_names]
    ).select(keys + vals)


def _split_chunk(keys: list[str], combine_fn, k: int, *tables: pa.Table):
    """Locally combine a chunk of blocks, then split by key hash."""
    live = [t for t in tables if t is not None and t.num_rows]
    if not live:
        return [None] * k if k > 1 else None
    table = pa.concat_tables(live, promote_options="default")
    if combine_fn is not None:
        table = combine_fn(table)
    # Arrow-native key hashing (_hashing.hash_columns): the old pandas
    # hash floated an int64 key column holding one null, so the SAME key
    # hashed differently depending on which block it came from and a
    # key's rows could split across reduce shards
    h = hash_columns(table, keys) % k
    out = [table.filter(pa.array(h == s)) for s in range(k)]
    return out if k > 1 else out[0]


def _reduce_shard(finish_fn, shard_path, *tables: pa.Table):
    live = [t for t in tables if t is not None and t.num_rows]
    if not live:
        return None
    out = finish_fn(pa.concat_tables(live, promote_options="default"))
    if shard_path is not None and out is not None and out.num_rows:
        from .state import storage

        # runs on whichever node hosts this reduce task: shard_path must
        # be SHARED storage on a multi-node cluster — a mount or an
        # fsspec URI (contract documented in state/storage.py); create
        # the directory here, not on the driver
        storage.makedirs(storage.dirname(shard_path))
        storage.write_parquet(out, shard_path)
        return None  # result lives on storage, not in the driver
    return out


def hash_exchange(
    block_refs: list,
    keys: list[str],
    finish_fn,
    combine_fn=None,
    num_shards: Optional[int] = None,
    shard_output_dir: Optional[str] = None,
    return_refs: bool = False,
) -> Optional[pa.Table]:
    """Generic two-stage hash exchange over Arrow block refs.

    Rows sharing `keys` values are guaranteed co-located in one reduce
    shard, where `finish_fn(table) -> table` runs (group-aggregate, group
    rep-election, shard-local join — anything that needs the whole key
    group). `combine_fn` optionally pre-combines each split chunk (map-side
    combiner).

    Result delivery: by default the shard results are concatenated into one
    driver-side Table — fine when the distinct-key output fits a driver
    heap. When it doesn't (corpus-scale dedup), pass `shard_output_dir`
    (each reduce shard writes its own parquet file, returns None) or
    `return_refs=True` (returns the per-shard ObjectRefs WITHOUT driver
    materialization, so exchanges chain object-store-to-object-store).
    """
    import ray

    if not block_refs:
        return [] if return_refs else None
    cpus = int(ray.cluster_resources().get("CPU", 8))
    if num_shards is None:
        # module-header sizing rule: a parallelism floor for small inputs,
        # measured exchanged bytes / TARGET_SHARD_BYTES when the data is big
        floor = max(2, min(cpus, len(block_refs), 32))
        num_shards = shards_for_bytes(refs_total_bytes(block_refs), floor)
    # ~2 split tasks per cpu so split work itself load-balances
    n_split = max(1, min(len(block_refs), 2 * cpus))
    chunk_sz = (len(block_refs) + n_split - 1) // n_split

    split = ray.remote(num_returns=num_shards)(_split_chunk)
    reduce_ = ray.remote(_reduce_shard)

    shard_lists: list[list] = [[] for _ in range(num_shards)]
    for i in range(0, len(block_refs), chunk_sz):
        outs = split.remote(keys, combine_fn, num_shards, *block_refs[i : i + chunk_sz])
        if num_shards == 1:
            outs = [outs]
        for s, r in enumerate(outs):
            shard_lists[s].append(r)

    if shard_output_dir is not None:
        from .state import storage

        storage.makedirs(shard_output_dir)
    result_refs = [
        reduce_.remote(
            finish_fn,
            None
            if shard_output_dir is None
            else f"{shard_output_dir.rstrip('/')}/shard_{s:05d}.parquet",
            *shard,
        )
        for s, shard in enumerate(shard_lists)
    ]
    if return_refs:
        return result_refs
    results = ray.get(result_refs)
    if shard_output_dir is not None:
        return None
    live = [t for t in results if t is not None and t.num_rows]
    if not live:
        return None
    return pa.concat_tables(live, promote_options="default")


def hash_reduce(
    block_refs: list,
    keys: list[str],
    vals: list[str],
    num_shards: Optional[int] = None,
    shard_output_dir: Optional[str] = None,
) -> Optional[pa.Table]:
    """Parallel sum-merge of partial-aggregate blocks (hash_exchange with a
    group-sum combiner on both sides). Pass `shard_output_dir` when the
    merged result is itself corpus-sized: each reduce shard writes its own
    parquet file and nothing lands on the driver."""
    from functools import partial

    gs = partial(_group_sum, keys=keys, vals=vals)
    return hash_exchange(block_refs, keys, gs, combine_fn=gs,
                         num_shards=num_shards,
                         shard_output_dir=shard_output_dir)
