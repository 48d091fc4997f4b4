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
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
import pyarrow as pa


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
    key_df = table.select(keys).to_pandas()
    h = pd.util.hash_pandas_object(key_df, index=False).to_numpy() % k
    out = [table.filter(pa.array(h == s)) for s in range(k)]
    return out if k > 1 else out[0]


def _reduce_shard(finish_fn, shard_path, *tables: pa.Table):
    live = [t for t in tables if t is not None and t.num_rows]
    if not live:
        return None
    out = finish_fn(pa.concat_tables(live, promote_options="default"))
    if shard_path is not None and out is not None and out.num_rows:
        import os

        import pyarrow.parquet as pq

        # runs on whichever node hosts this reduce task: the directory must
        # be shared storage (NFS/object store mount) on a multi-node
        # cluster — create it here, not on the driver
        os.makedirs(os.path.dirname(shard_path), exist_ok=True)
        pq.write_table(out, shard_path)
        return None  # result lives on disk, not in the driver
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
    import os

    import ray

    if not block_refs:
        return [] if return_refs else None
    cpus = int(ray.cluster_resources().get("CPU", 8))
    if num_shards is None:
        # enough shards to parallelize the reduce, few enough that the
        # split×shard object matrix stays small
        num_shards = max(2, min(cpus, len(block_refs), 32))
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
        os.makedirs(shard_output_dir, exist_ok=True)
    result_refs = [
        reduce_.remote(
            finish_fn,
            None
            if shard_output_dir is None
            else os.path.join(shard_output_dir, f"shard_{s:05d}.parquet"),
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
