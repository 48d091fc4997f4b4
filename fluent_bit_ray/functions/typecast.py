"""`Types key:type` casting with fluent-bit `flb_parser_typecast` semantics.

Reference parity (studied, not copied): src/flb_parser.c:750-843 —
- ``integer``: C ``atoll`` — parse an optional-signed leading integer, 0 on
  garbage, trailing junk ignored;
- ``float``: C ``atof`` — leading float, 0.0 on garbage;
- ``hex``: C ``strtoull(base=16)`` — leading hex digits (optional 0x), 0 on
  garbage;
- ``bool``: case-insensitive ``true``/``false`` PREFIX match; anything else is
  a cast error and the value is kept as the original string;
- ``string``: identity.

The vectorized path (`cast_column`) uses pyarrow.compute regex-extract + cast
so no Python-level row loop runs inside `map_batches`.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import pyarrow as pa
import pyarrow.compute as pc

_INT_RE = re.compile(r"^\s*([+-]?\d+)")
_FLOAT_RE = re.compile(r"^\s*([+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)")
_HEX_RE = re.compile(r"^\s*(?:0[xX])?([0-9a-fA-F]+)")

# Arrow-side equivalents (RE2 syntax) for the vectorized path.
_INT_RE2 = r"^\s*(?P<v>[+-]?[0-9]+)"
_FLOAT_RE2 = r"^\s*(?P<v>[+-]?(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][+-]?[0-9]+)?)"


_I64_MIN, _I64_MAX = -(2**63), 2**63 - 1
_U64_MAX = 2**64 - 1


def typecast_value(val: Optional[str], type_name: str) -> Any:
    """Row-at-a-time cast (oracle twin of `cast_column`).

    Out-of-range integers SATURATE at the int64/uint64 bounds (like glibc
    strtoll/strtoull with ERANGE) so values always fit the Arrow column.
    """
    if val is None:
        return None
    if type_name == "integer":
        m = _INT_RE.match(val)
        return min(max(int(m.group(1)), _I64_MIN), _I64_MAX) if m else 0
    if type_name == "float":
        m = _FLOAT_RE.match(val)
        return float(m.group(1)) if m else 0.0
    if type_name == "hex":
        m = _HEX_RE.match(val)
        return min(int(m.group(1), 16), _U64_MAX) if m else 0
    if type_name == "bool":
        low = val[:5].lower()
        if low.startswith("true"):
            return True
        if low.startswith("false"):
            return False
        return val  # cast error -> keep string (flb_parser.c:826-830)
    if type_name == "string":
        return val
    raise ValueError(f"unknown cast type {type_name!r}")


def cast_column(arr: pa.Array, type_name: str) -> pa.Array:
    """Vectorized column cast matching `typecast_value` semantics.

    ``bool`` is the odd one out: failed casts keep the ORIGINAL STRING, so a
    bool column with any cast error degrades to a string column (mirrors the
    reference packing a str instead of a bool into the same map).
    """
    if type_name == "string":
        return arr
    arr = pc.cast(arr, pa.string())
    if type_name == "integer":
        ex = pc.extract_regex(arr, _INT_RE2)
        v = pc.struct_field(ex, "v")
        try:
            out = pc.cast(v, pa.int64())
        except pa.ArrowInvalid:
            # a digit string beyond int64: fall back to the saturating
            # row cast (strtoll-style) instead of killing the batch
            return pa.array(
                [typecast_value(x, "integer") for x in arr.to_pylist()],
                pa.int64(),
            )
        # garbage -> 0 (atoll), but real nulls stay null
        return pc.if_else(pc.and_(pc.is_null(out), pc.is_valid(arr)),
                          pa.scalar(0, pa.int64()), out)
    if type_name == "float":
        ex = pc.extract_regex(arr, _FLOAT_RE2)
        v = pc.struct_field(ex, "v")
        out = pc.cast(v, pa.float64())
        return pc.if_else(pc.and_(pc.is_null(out), pc.is_valid(arr)),
                          pa.scalar(0.0, pa.float64()), out)
    if type_name == "hex":
        # no vectorized base-16 cast in Arrow -> tight Python loop (cold path:
        # hex-typed fields are rare; loop only runs for this column)
        vals = arr.to_pylist()
        return pa.array([typecast_value(v, "hex") for v in vals], pa.uint64())
    if type_name == "bool":
        low = pc.utf8_lower(arr)
        is_true = pc.starts_with(low, "true")
        is_false = pc.starts_with(low, "false")
        ok = pc.or_(is_true, is_false)
        if pc.all(pc.or_(ok, pc.is_null(ok))).as_py():
            return pc.and_(is_true, pc.is_valid(arr))
        # any cast error -> column stays string, errors keep original value
        as_str = pc.if_else(is_true, pa.scalar("true"),
                            pc.if_else(is_false, pa.scalar("false"), arr))
        return as_str
    raise ValueError(f"unknown cast type {type_name!r}")
