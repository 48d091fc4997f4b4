"""filter_lua — real Lua-language UDFs (plugins/filter_lua/lua.c).

The reference's callback contract (lua.c:333-385, scripts/test.lua):

    function cb(tag, timestamp, record)  ->  code, timestamp, record

    code -1  drop the record
    code  0  keep the ORIGINAL record and timestamp (returned ts/record
             ignored — cb_print returns `0, 0, 0`)
    code  1  replace both with the returned values; the returned record
             must convert to a MAP (is_valid_map, lua.c:354-363) — an
             array-style table makes the filter return NOTOUCH for the
             WHOLE chunk (original batch passes through unmodified)
    other    unexpected: keep the original record (lua.c:386-389)

Execution engine: `lupa` when importable (a stateful actor-pool stage —
one LuaRuntime per worker, compiled in __init__, invoked per record in
__call__/process_batch, mirroring the reference's per-record lua_call);
when lupa (a compiled extension) is absent, the bundled pure-Python
Lua-subset interpreter (functions/minilua.py) runs the same `.lua`
source with the same callback contract, so real Lua scripts execute in
every environment. The code-semantics plumbing is additionally pinned
through an injected-callback seam (tests/test_lua_filter.py).

Timestamps cross the boundary as DOUBLE seconds (flb_time_to_double /
flb_time_from_double); engine `_time` is int64 epoch-ns with the NaT
sentinel for unknown (crosses as 0.0, like an unset flb_time).

Number repacking mirrors lua_tomsgpack (flb_lua.c): a Lua number with no
fractional part packs as int64, otherwise as double.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import numpy as np
import pyarrow as pa

from .base import ENGINE_COLS

_NAT = np.iinfo(np.int64).min

#: sentinel distinguishing "keep original" outcomes from drops
_KEEP = object()


def _lua_number_repack(v: float):
    """lua_tomsgpack's number rule: integral doubles pack as int64."""
    if isinstance(v, float) and v.is_integer() and abs(v) < 2**63:
        return int(v)
    return v


def _is_maplike(obj: Any) -> bool:
    """is_valid_map analog: the replacement record must be a non-empty
    mapping. An ARRAY-style table (consecutive 1..n integer keys) packs
    as a msgpack array in the reference and is rejected — from_lua
    already converts that shape to a Python list, so any dict that
    reaches here (including SPARSE integer-keyed tables, which
    lua_tomsgpack packs as a map) is valid, matching lua.c:354-363."""
    return isinstance(obj, dict) and len(obj) > 0


class LuaNotAvailable(RuntimeError):
    """Kept for API compatibility: no longer raised since minilua
    (functions/minilua.py) became the lupa-less fallback engine."""


def _build_minilua_callback(script_text: str, call: str) -> Callable:
    """Compile `script_text` in the bundled pure-Python Lua-subset
    interpreter (functions/minilua.py) — the fallback engine when lupa
    (a compiled extension) cannot be installed. Same callback contract;
    covers the Lua subset filter scripts actually use (see minilua's
    module docstring for the supported grammar)."""
    from ..functions.minilua import (
        MiniLua,
        lua_to_python,
        python_to_lua,
    )

    lua = MiniLua()
    lua.execute(script_text)
    fn = lua.get_global(call)
    if fn is None:
        raise ValueError(f"[filter_lua] function {call} is not found")

    def cb(tag: str, ts: float, record: dict):
        res = fn(tag, float(ts), python_to_lua(record))
        if res is None:
            res = ()
        elif not isinstance(res, tuple):
            res = (res,)
        code, l_ts, l_rec = (res + (None, None, None))[:3]
        # a cb that falls off the end returns no values; lua.c reads the
        # missing code with lua_tointeger -> 0 (keep record, untouched)
        code = 0 if code is None else int(code)
        return (
            code,
            float(l_ts or 0.0),
            lua_to_python(l_rec) if code == 1 else None,
        )

    return cb


def _build_lua_callback(script_text: str, call: str) -> Callable:
    """Compile `script_text` in a fresh LuaRuntime and return a Python
    callable(tag, ts, record_dict) -> (code, ts, record_dict|None) that
    handles the Python<->Lua table conversions. Engine preference:
    lupa (real LuaJIT bindings) when importable, else the bundled
    minilua subset interpreter — so `.lua` scripts run everywhere."""
    try:
        import lupa
    except ImportError:
        return _build_minilua_callback(script_text, call)

    lua = lupa.LuaRuntime(unpack_returned_tuples=True, encoding="utf-8")
    lua.execute(script_text)
    fn = lua.globals()[call]
    if fn is None:
        raise ValueError(f"[filter_lua] function {call} is not found")

    def to_lua(obj):
        if isinstance(obj, dict):
            return lua.table_from(
                {k: to_lua(v) for k, v in obj.items() if v is not None})
        if isinstance(obj, (list, tuple)):
            return lua.table(*[to_lua(v) for v in obj])
        return obj

    def from_lua(obj):
        if lupa.lua_type(obj) == "table":
            keys = list(obj.keys())
            if keys and all(isinstance(k, int) for k in keys) and sorted(
                    keys) == list(range(1, len(keys) + 1)):
                return [from_lua(obj[k]) for k in sorted(keys)]
            return {k: from_lua(v) for k, v in obj.items()}
        if isinstance(obj, float):
            return _lua_number_repack(obj)
        return obj

    def cb(tag: str, ts: float, record: dict):
        res = fn(tag, ts, to_lua(record))
        if res is None:
            res = ()
        elif not isinstance(res, tuple):
            res = (res,)
        code, l_ts, l_rec = (tuple(res) + (None, None, None))[:3]
        code = 0 if code is None else int(code)  # nil code -> keep (lua.c)
        return code, float(l_ts or 0.0), (
            from_lua(l_rec) if code == 1 else None)

    return cb


class LuaFilter:
    """Lua UDF filter: a stateful stage (lupa runtime per worker).

    Pickling contract: a LuaRuntime and its Lua function objects are NOT
    picklable, but filter instances ARE shipped to Ray workers inside
    map_batches closures. So the compiled callback is a per-process cache
    that __getstate__ drops — the driver compiles once at construction
    (validating the script and the Call name eagerly), and each worker
    recompiles from the stored script text on its first batch. That is
    exactly the reference's model too: one lua_State per worker
    (flb_luajit_create per filter instance).

    `_cb` injects the compiled callback directly — the contract tests use
    it to pin the -1/0/1/invalid-map semantics without a Lua runtime, and
    it keeps the code path identical when lupa IS present."""

    def __init__(
        self,
        script_text: Optional[str] = None,
        script_path: Optional[str] = None,
        call: str = "cb_filter",
        _cb: Optional[Callable] = None,
    ):
        self._injected = _cb
        self._compiled: Optional[Callable] = None
        self._script_text = script_text
        self._call = call
        if _cb is not None:
            return
        if script_path is not None:
            with open(script_path, "r", encoding="utf-8") as f:
                self._script_text = f.read()
        if self._script_text is None:
            raise ValueError("[filter_lua] needs Script")
        # eager driver-side compile: surfaces a bad script / missing
        # function at config-build time (lua.c cb_lua_init parity); the
        # compiled runtime stays in THIS process only
        self._compiled = _build_lua_callback(self._script_text, self._call)

    @property
    def cb(self) -> Callable:
        if self._injected is not None:
            return self._injected
        if self._compiled is None:  # fresh worker after unpickling
            self._compiled = _build_lua_callback(
                self._script_text, self._call)
        return self._compiled

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_compiled"] = None  # LuaRuntime is per-process
        return state

    # -- row oracle twin ---------------------------------------------------
    def _apply_one(self, tag: str, ts_ns: int, record: dict):
        """Returns (new_ts_ns, record | _KEEP | None):
        None = drop, _KEEP = keep original, dict = replacement.
        Raises _InvalidMap to signal chunk-level NOTOUCH."""
        ts = 0.0 if ts_ns == _NAT else ts_ns / 1e9
        code, l_ts, l_rec = self.cb(tag, ts, record)
        if code == -1:
            return ts_ns, None
        if code == 1:
            if not _is_maplike(l_rec):
                raise _InvalidMap(
                    f"[filter_lua] invalid table returned ({l_rec!r})")
            # non-string keys (sparse int-keyed Lua tables are valid maps)
            # stringify at the boundary: the engine's record model is
            # Arrow columns, whose names are strings — documented
            # divergence from msgpack's typed map keys
            return int(round(l_ts * 1e9)), {
                str(k): (_lua_number_repack(v) if isinstance(v, float) else v)
                for k, v in l_rec.items()
            }
        # 0 or unexpected: keep the original record
        return ts_ns, _KEEP

    def process_row(self, record: dict) -> Optional[dict]:
        rec = {k: v for k, v in record.items()
               if k not in ENGINE_COLS and v is not None}
        tag = record.get("_tag", "")
        ts_ns = record.get("_time", _NAT)
        if ts_ns is None:
            ts_ns = _NAT
        try:
            new_ts, out = self._apply_one(tag, int(ts_ns), rec)
        except _InvalidMap:
            return dict(record)  # NOTOUCH
        if out is None:
            return None
        if out is _KEEP:
            return dict(record)
        full = {k: v for k, v in record.items() if k in ENGINE_COLS}
        full.update(out)
        full["_time"] = new_ts
        return full

    # -- batch path ----------------------------------------------------------
    def process_batch(self, table: pa.Table,
                      mask: Optional[pa.Array] = None) -> pa.Table:
        from ..functions.records import records_to_table

        m = mask.to_pylist() if mask is not None else None
        rows = []
        records = table.to_pylist()
        try:
            for i, rec in enumerate(records):
                if m is not None and not m[i]:
                    rows.append(rec)  # tag not matched: untouched
                    continue
                clean = {k: v for k, v in rec.items()
                         if k not in ENGINE_COLS and v is not None}
                ts_ns = rec.get("_time", _NAT)
                new_ts, out = self._apply_one(
                    rec.get("_tag", ""),
                    _NAT if ts_ns is None else int(ts_ns), clean)
                if out is None:
                    continue
                if out is _KEEP:
                    rows.append(rec)
                    continue
                full = {k: v for k, v in rec.items() if k in ENGINE_COLS}
                full.update(out)
                full["_time"] = new_ts
                rows.append(full)
        except _InvalidMap:
            # reference behavior: FLB_FILTER_NOTOUCH for the whole chunk
            return table
        if not rows:
            return table.slice(0, 0)
        return records_to_table(rows)


class _InvalidMap(ValueError):
    pass
