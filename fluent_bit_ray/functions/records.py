"""Heterogeneous record-dict -> Arrow table assembly.

pa.Table.from_pylist derives its schema from the FIRST record only,
silently dropping later-only keys — every consumer of loosely-typed
record streams (forward frames, multi-doc JSON, the kubernetes filter)
must build the key union explicitly. Keys are normalized to str (msgpack
maps allow non-string keys; colliding normalizations last-win,
documented)."""

from __future__ import annotations

import pyarrow as pa


def records_to_table(recs: list[dict]) -> pa.Table:
    """Key-union table in first-seen key order; missing keys -> null."""
    if not recs:
        return pa.table({})
    fields: list[str] = []
    seen = set()
    norm: list[dict] = []
    for r in recs:
        if any(not isinstance(k, str) for k in r):
            r = {str(k): v for k, v in r.items()}
        norm.append(r)
        for k in r:
            if k not in seen:
                seen.add(k)
                fields.append(k)
    return pa.table({f: pa.array([r.get(f) for r in norm]) for f in fields})
