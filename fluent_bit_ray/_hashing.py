"""Type-stable vectorized key hashing for exchange shard assignment.

Why not `pd.util.hash_pandas_object` (the pre-fix path): converting an
Arrow block to pandas FLOATS an int64 column that holds even one null,
and pandas hashes 2.0 differently from 2 — so the SAME logical key could
land in DIFFERENT reduce shards depending on which block it came from
(blocks with a null anywhere in the key column vs blocks without).
Per-key aggregates then emitted duplicate, partially-merged rows. These
hashes read the Arrow buffers directly; the value's hash depends only on
the COLUMN TYPE of the exchange (fixed per call site) and the value's
bits, never on sibling rows.

Nulls hash to a fixed sentinel (one shard gets the SQL-style null
group); NaN and -0.0 are canonicalized first. Not a crypto primitive —
a documented engine contract like ops/dedup's string hash (same
splitmix64 finalizer + polynomial family, independent implementation so
neither module imports the other).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_U64 = np.uint64
_POLY_C = _U64(0x9E3779B97F4A7C15 | 1)
_NULL_H = _U64(0x9AE16A3B2F90404F)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public-domain constants); in-place ops on
    a fresh copy keep the temp-allocation count down in the hot path."""
    with np.errstate(over="ignore"):
        z = x + _U64(0x9E3779B97F4A7C15)
        z ^= z >> _U64(30)
        z *= _U64(0xBF58476D1CE4E5B9)
        z ^= z >> _U64(27)
        z *= _U64(0x94D049BB133111EB)
        z ^= z >> _U64(31)
        return z


def _hash_binary_like(arr: pa.Array) -> np.ndarray:
    """64-bit hash per distinct string/bytes value — pandas' keyed
    siphash on the (dictionary-sized) object array: C per-value hashing
    with no length-proportional temporaries. Strings never need to hash
    equal to any numeric representation, so they don't share the
    splitmix family; stability within a session is the only contract.
    Null slots are overwritten by the caller's null mask."""
    import pandas as pd

    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_pandas_object(
        pd.Series(arr.to_pandas()), index=False).to_numpy().astype(
        np.uint64, copy=False)


def _hash_one(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_dictionary(t):
        col = col.dictionary_decode()
        t = col.type
    null_mask = np.asarray(pc.is_null(col)) if col.null_count else None
    if (pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_binary(t) or pa.types.is_large_binary(t)):
        # hash DISTINCT strings only, scatter by dictionary index: key
        # columns are typically low-cardinality (hosts, types, tokens),
        # so this cuts the byte-level polynomial work by the repeat
        # factor; for all-distinct columns the encode adds one hash-table
        # pass while the polynomial still dominates
        enc = col.dictionary_encode()
        hd = _hash_binary_like(enc.dictionary)
        idx = enc.indices.to_numpy(zero_copy_only=False)
        if null_mask is not None:
            idx = np.where(null_mask, 0, idx)
        h = hd[idx.astype(np.int64)] if len(hd) else np.zeros(
            len(col), np.uint64)
    elif pa.types.is_floating(t):
        v = pc.fill_null(pc.cast(col, pa.float64()), 0.0).to_numpy(
            zero_copy_only=False).copy()
        v[np.isnan(v)] = 0.0   # canonicalize NaN payloads
        v = v + 0.0            # -0.0 -> +0.0
        # INTEGRAL floats hash as their int64 VALUE, so a key column
        # that round-tripped through pandas (int64 + null -> float64)
        # still shards identically to its original int64 blocks; only
        # genuinely fractional values hash by bit pattern
        with np.errstate(invalid="ignore"):
            iv = v.astype(np.int64)
            integral = (iv == v) & (np.abs(v) < float(1 << 62))
        h = np.where(integral, splitmix64(iv.view(np.uint64)),
                     splitmix64(v.view(np.uint64)))
    elif pa.types.is_boolean(t):
        v = pc.fill_null(col, False).to_numpy(zero_copy_only=False)
        h = splitmix64(v.astype(np.uint64))
    elif t == pa.int64() and null_mask is None:
        # zero-copy fast path for the common exchange key shape
        h = splitmix64(col.to_numpy().view(np.uint64))
    else:
        # ints and temporals: fill nulls FIRST so to_numpy never floats
        # the column, then hash the int64 bit pattern
        iv = pc.cast(col, pa.int64(), safe=False)
        v = pc.fill_null(iv, 0).to_numpy(zero_copy_only=False)
        h = splitmix64(v.astype(np.int64).view(np.uint64))
    if null_mask is not None:
        h = h.copy()
        h[null_mask] = _NULL_H
    return h


def hash_columns(t: pa.Table, keys: list[str]) -> np.ndarray:
    """uint64 hash per row over the given key columns — the exchange
    shard assignment everywhere (`shard = hash_columns(t, keys) % k`)."""
    h = np.zeros(t.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for name in keys:
            h = h * _POLY_C + _hash_one(t[name])
    return splitmix64(h)
