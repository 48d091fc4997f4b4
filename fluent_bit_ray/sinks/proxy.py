"""External (proxy) plugin surface — the Go-shared-object ABI, re-expressed
for Python modules.

The reference loads compiled external output plugins through
src/flb_plugin_proxy.c (studied, not copied): the shared object exposes
``FLBPluginRegister(def)`` (fills name/description/type),
``FLBPluginInit(ctx)``, ``FLBPluginFlush(data, length, tag)`` — `data`
being the RAW msgpack event buffer of ``[timestamp, record]`` entries for
one tag — and ``FLBPluginExit()``, with flush returning FLB_OK / FLB_ERROR
/ FLB_RETRY (GOLANG_OUTPUT_PLUGIN.md). This engine has no C ABI; the
analog loads a **Python module by file path** exposing the same four
callables with the same semantics, so a user can ship an out-of-tree
output plugin without touching the engine — the third extension surface
next to Python callables and Lua scripts.

Scale shape: the plugin runs INSIDE the sink workers (module imported
once per worker process, flush per routed chunk per tag) — user code sees
bounded buffers and runs fully parallel; nothing round-trips through the
driver. FLB_RETRY is honored with the sink's bounded in-task retry;
FLB_ERROR fails the task (Ray task retry takes over, same as a sink I/O
error).
"""

from __future__ import annotations

import importlib.util
import threading
from typing import Optional

import pyarrow as pa

FLB_ERROR = 0
FLB_OK = 1
FLB_RETRY = 2

_MODULE_CACHE: dict[str, object] = {}
_CACHE_LOCK = threading.Lock()


class ProxyPluginError(RuntimeError):
    """Plugin returned FLB_ERROR or is malformed."""


def pack_proxy_events(table: pa.Table, record_cols: list[str]) -> dict[str, bytes]:
    """Per tag, the raw msgpack event buffer a proxy flush receives:
    concatenated ``[EventTime fixext8, record-map]`` entries — the
    engine's native buffer shape (the same entry encoding in_forward
    speaks), NOT wrapped in a forward frame; the tag travels as the
    flush argument like the C ABI's ``tag`` parameter."""
    from ..sources.msgpack_io import msgpack_pack, pack_event_time
    from .writers import _row_iter, _times_ns

    n = table.num_rows
    tags = (
        table["_tag"].to_pylist() if "_tag" in table.column_names else [""] * n
    )
    times_ns = _times_ns(table)
    map_cols = [
        c for c in record_cols
        if pa.types.is_map(table.schema.field(c).type)
    ]
    out: dict[str, bytearray] = {}
    for i, rec in enumerate(_row_iter(table, record_cols)):
        for c in map_cols:
            v = rec.get(c)
            if isinstance(v, list):
                rec[c] = dict(v)
        out.setdefault(tags[i] or "", bytearray()).extend(
            msgpack_pack([pack_event_time(int(times_ns[i])), rec])
        )
    return {t: bytes(b) for t, b in out.items()}


def decode_proxy_events(data: bytes) -> list[tuple[int, dict]]:
    """Author-side helper (the fluent-bit-go ``output`` package analog):
    decode a flush buffer back into (time_ns, record) pairs."""
    from ..sources.msgpack_io import decode_event_time, iter_msgpack_stream

    out = []
    for entry in iter_msgpack_stream(data):
        ts, rec = entry[0], entry[1]
        out.append((decode_event_time(ts), rec))
    return out


class ProxyPlugin:
    """One loaded external plugin (module cached per worker process).

    Lifecycle mirrors flb_plugin_proxy.c:111-160: Register is called at
    load and must fill the def map (its absence is a load error, like a
    missing FLBPluginRegister symbol); Init runs once with the instance
    properties; Flush per (chunk, tag); Exit at teardown (best-effort —
    a batch engine's workers stop with the job)."""

    def __init__(self, script_path: str, properties: Optional[dict] = None):
        self.script_path = script_path
        self.properties = dict(properties or {})
        self.definition: dict = {}
        mod = self._load(script_path)
        register = getattr(mod, "FLBPluginRegister", None)
        flush = getattr(mod, "FLBPluginFlush", None)
        if register is None or flush is None:
            raise ProxyPluginError(
                f"proxy plugin {script_path!r} must define FLBPluginRegister "
                "and FLBPluginFlush (src/flb_plugin_proxy.c symbol contract)"
            )
        register(self.definition)
        self._flush = flush
        init = getattr(mod, "FLBPluginInit", None)
        if init is not None:
            rc = init(self.properties)
            if rc is not None and int(rc) == FLB_ERROR:
                raise ProxyPluginError(
                    f"proxy plugin {script_path!r} FLBPluginInit returned "
                    "FLB_ERROR"
                )
        self._exit = getattr(mod, "FLBPluginExit", None)

    @staticmethod
    def _load(path: str):
        with _CACHE_LOCK:
            mod = _MODULE_CACHE.get(path)
            if mod is None:
                spec = importlib.util.spec_from_file_location(
                    f"fbr_proxy_{abs(hash(path))}", path
                )
                if spec is None or spec.loader is None:
                    raise ProxyPluginError(f"cannot load proxy plugin {path!r}")
                mod = importlib.util.module_from_spec(spec)
                spec.loader.exec_module(mod)
                _MODULE_CACHE[path] = mod
            return mod

    def flush(self, data: bytes, tag: str, max_retries: int = 2) -> None:
        """Invoke FLBPluginFlush; FLB_RETRY re-invokes up to max_retries
        then degrades to an error (the engine's bounded-retry contract),
        FLB_ERROR raises so the task (and Ray's task retry) handles it."""
        for _attempt in range(max_retries + 1):
            rc = self._flush(data, tag)
            rc = FLB_OK if rc is None else int(rc)
            if rc == FLB_OK:
                return
            if rc == FLB_ERROR:
                raise ProxyPluginError(
                    f"proxy plugin {self.script_path!r} returned FLB_ERROR "
                    f"for tag {tag!r}"
                )
        raise ProxyPluginError(
            f"proxy plugin {self.script_path!r} kept returning FLB_RETRY "
            f"for tag {tag!r} after {max_retries + 1} attempts"
        )

    def close(self) -> None:
        if self._exit is not None:
            self._exit()


class ProxySinkStage:
    """map_batches stage: route every batch through an external plugin.

    Callable-class form (actor-friendly): the plugin loads once per
    worker in __init__; __call__ packs the batch per tag and flushes.
    Passes the batch through unchanged so it composes mid-pipeline or as
    a consumed sink."""

    def __init__(self, script_path: str, properties: Optional[dict] = None,
                 record_cols: Optional[list[str]] = None):
        self.plugin = ProxyPlugin(script_path, properties)
        self.record_cols = record_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.base import ENGINE_COLS

        rc = self.record_cols or [
            c for c in batch.column_names if c not in ENGINE_COLS
        ]
        for tag, payload in pack_proxy_events(batch, rc).items():
            self.plugin.flush(payload, tag)
        return batch
