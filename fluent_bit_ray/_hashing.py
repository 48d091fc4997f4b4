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
_POLY_C_INV = _U64(pow(int(_POLY_C), -1, 1 << 64))
_NULL_H = _U64(0x9AE16A3B2F90404F)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public-domain constants)."""
    with np.errstate(over="ignore"):
        x = x + _U64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
        return x ^ (x >> _U64(31))


def _hash_binary_like(arr: pa.Array) -> np.ndarray:
    """Rolling polynomial over (byte+1) with the global-prefix trick,
    splitmix64-finalized, xor'd with the length — one pass over the
    values buffer, no per-string Python. Null slots produce arbitrary
    values here and are overwritten by the caller's null mask."""
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bufs = arr.buffers()
    wide = pa.types.is_large_string(arr.type) or pa.types.is_large_binary(
        arr.type)
    odt = np.int64 if wide else np.int32
    off = np.frombuffer(bufs[1], odt)[arr.offset: arr.offset + n + 1].astype(
        np.int64)
    data = np.frombuffer(bufs[2] or b"", np.uint8)[off[0]: off[-1]]
    off = off - off[0]
    lens = (off[1:] - off[:-1]).astype(np.uint64)
    m = len(data)
    with np.errstate(over="ignore"):
        h = data.astype(np.uint64) + _U64(1)
        pw = np.empty(m + 1, dtype=np.uint64)
        ipw = np.empty(m + 1, dtype=np.uint64)
        pw[0] = ipw[0] = 1
        if m:
            np.cumprod(np.full(m, _POLY_C, dtype=np.uint64), out=pw[1:])
            np.cumprod(np.full(m, _POLY_C_INV, dtype=np.uint64),
                       out=ipw[1:])
            pref = np.concatenate(
                ([_U64(0)], np.cumsum(h * ipw[:m], dtype=np.uint64)))
        else:
            pref = np.zeros(1, dtype=np.uint64)
        s, e = off[:-1], off[1:]
        out = (pref[e] - pref[s]) * pw[np.maximum(e, 1) - 1]
        return splitmix64(out ^ (lens * _U64(0x9E3779B97F4A7C15)))


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
        h = _hash_binary_like(col)
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
