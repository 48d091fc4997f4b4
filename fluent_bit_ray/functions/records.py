"""Heterogeneous record-dict -> Arrow table assembly.

pa.Table.from_pylist derives its schema from the FIRST record only,
silently dropping later-only keys — every consumer of loosely-typed
record streams (forward frames, multi-doc JSON, the kubernetes filter)
must build the key union explicitly. Keys are normalized to str (msgpack
maps allow non-string keys; colliding normalizations last-win,
documented).

Mixed-type columns (the same key carrying e.g. an int in one record and a
string in the next — legal in msgpack forward frames and concatenated
JSON, and accepted by the reference engine's schemaless msgpack core)
cannot become a single typed Arrow column; such columns degrade to a
string representation (JSON for nested values) instead of failing the
whole read task."""

from __future__ import annotations

import json

import pyarrow as pa


def _stringify(v):
    if v is None or isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, (dict, list)):
        return json.dumps(v, separators=(",", ":"), ensure_ascii=False, default=str)
    return str(v)


def arrow_safe(v):
    """Scrub surrogateescape artifacts before Arrow assembly: Arrow strings
    must be valid UTF-8, so lossless surrogates (kept by decoders for exact
    byte round-trips) degrade to U+FFFD — the same lossy-but-working result
    a plain 'replace' decode would give. Called only on columns that
    actually failed Arrow conversion (the clean-data hot path never pays
    this recursion)."""
    if isinstance(v, str):
        if v.isascii():
            return v
        try:
            v.encode("utf-8")
            return v
        except UnicodeEncodeError:
            return v.encode("utf-8", "surrogateescape").decode("utf-8", "replace")
    if isinstance(v, dict):
        return {arrow_safe(k): arrow_safe(x) for k, x in v.items()}
    if isinstance(v, list):
        return [arrow_safe(x) for x in v]
    return v


def records_to_table(recs: list[dict]) -> pa.Table:
    """Key-union table in first-seen key order; missing keys -> null.

    Columns whose values mix incompatible Python types fall back to a
    lossy-but-safe string column (ints/floats via str(), bools as
    true/false, nested dict/list as compact JSON) rather than raising
    ArrowInvalid and killing the task.
    """
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
    cols = {}
    fallback_exc = (
        pa.ArrowInvalid,
        pa.ArrowTypeError,
        pa.ArrowNotImplementedError,
        UnicodeEncodeError,
        UnicodeDecodeError,
    )
    for f in fields:
        vals = [r.get(f) for r in norm]
        try:
            cols[f] = pa.array(vals)
        except fallback_exc:
            # second chance: unicode scrub only (keeps the column's type
            # when the failure was surrogate artifacts, not mixed types)
            vals = [arrow_safe(v) for v in vals]
            try:
                cols[f] = pa.array(vals)
            except fallback_exc:
                cols[f] = pa.array(
                    [_stringify(v) for v in vals], type=pa.string()
                )
    return pa.table(cols)
