"""Skew-aware aggregation: salted two-stage aggregate for hot keys.

The north-rule requirement: Zipf-skewed `host` keys must not serialize an
aggregation on one partition. Pattern (SURVEY §7.3):

    stage 1: groupby((key, salt)) where salt = hash(row-unique col) % K
             — a hot key's rows spread over K sub-groups that aggregate
             in parallel;
    stage 2: groupby(key) over the K partial rows per key — tiny.

Here stage 1 happens inside map_batches (in-batch combiners keyed by
(key, salt)) and both merge stages ride the parallel hash reduce
(shuffle.hash_reduce), so the only data movement is pre-combined rows.
The salt column exists between the stages only; results are identical to an
unsalted groupby (sum/count are commutative monoids).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..shuffle import hash_reduce


def salted_count(
    ds,
    key_col: str,
    salt_col: str,
    num_salts: int = 16,
    weight_col: Optional[str] = None,
):
    """records (and optional weight sums) per key, salt-spread.

    Returns a pyarrow Table (key, records[, weight]) — equal to an unsalted
    groupby-count, computed without any single hot-key reducer.
    """

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        # deterministic per-row salt from a row-unique column, via the
        # same Arrow-native vectorized hash family as
        # shuffle._split_chunk (type-stable under nulls, no pandas)
        from .._hashing import hash_columns

        salts = (hash_columns(batch, [salt_col]) % num_salts).astype(
            np.int64)
        cols = {
            key_col: batch[key_col],
            "_salt": pa.array(salts),
            "records": pa.array(np.ones(n, dtype=np.int64)),
        }
        aggs = [("records", "sum")]
        if weight_col is not None:
            cols[weight_col] = pc.cast(batch[weight_col], pa.float64())
            aggs.append((weight_col, "sum"))
        t = pa.table(cols)
        g = t.group_by([key_col, "_salt"]).aggregate(aggs)
        # name-based rename: pyarrow's aggregate column ORDER is not stable
        # across versions, only the `<col>_sum` naming is
        g = g.rename_columns(
            [c[: -len("_sum")] if c.endswith("_sum") else c for c in g.column_names]
        )
        return g.select([key_col, "_salt", "records"]
                        + ([weight_col] if weight_col else []))

    vals = ["records"] + ([weight_col] if weight_col else [])
    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    # stage 1 merge: (key, salt) — hot keys spread over num_salts shards
    salted = hash_reduce_dataset_refs(partials, [key_col, "_salt"], vals)
    # stage 2: collapse the salts — at most num_salts rows per key
    g = salted.group_by([key_col]).aggregate([(v, "sum") for v in vals])
    g = g.rename_columns(
        [c[: -len("_sum")] if c.endswith("_sum") else c for c in g.column_names]
    )
    return g.select([key_col] + vals)


def hash_reduce_dataset_refs(ds, keys, vals):
    refs = ds.to_arrow_refs()
    out = hash_reduce(refs, keys, vals)
    if out is None:
        return pa.table({k: pa.array([], pa.string()) for k in keys} | {v: pa.array([], pa.int64()) for v in vals})
    return out


def topk_hot_keys(ds, key_col: str, salt_col: str, k: int = 10,
                  num_salts: int = 16) -> pa.Table:
    """Top-k keys by record count, salted. Deterministic tie-break by key."""
    counts = salted_count(ds, key_col, salt_col, num_salts)
    idx = pc.sort_indices(
        counts,
        sort_keys=[("records", "descending"), (key_col, "ascending")],
    )
    return counts.take(idx[:k])
