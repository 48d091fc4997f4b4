"""msgpack wire-format codec + fluentd forward-protocol ingestion.

The reference's native on-the-wire format (in_forward) frames records as

    [tag, time, record, option?]              Message mode
    [tag, [[time, record], ...]]              Forward mode
    [tag, bin|str of packed [time, record]s]  PackedForward mode

(plugins/in_forward/fw_prot.c:83-270 — studied, not copied), with event
time either a positive integer (seconds), a float, or the fluentd
EventTime extension: fixext8, 4-byte big-endian seconds + 4-byte
big-endian nanoseconds (src/flb_time.c:93-177).

The codec below implements the PUBLIC msgpack spec (msgpack.org format
definition) in pure Python, and the stream decode takes a C fast path
through the `msgpack` wheel when importable (it is in this container;
the pure-Python decoder remains the fallback and the parity reference —
`tests/test_msgpack_forward.py` cross-checks the two). The Ray-side
plumbing is the part designed for scale: one file per read task
(`read_binary_files`), frame decode inside map_batches, Arrow batch
output with per-record `_tag`/`_time`.

The encoder exists to build deterministic test fixtures and to emit
forward-compatible dumps (out_forward's file-format analog).
"""

from __future__ import annotations

import struct
from typing import Any, Iterable, Iterator, NamedTuple

import pyarrow as pa


class ExtType(NamedTuple):
    code: int
    data: bytes


try:  # optional C-accelerated stream decode (public msgpack wheel)
    import msgpack as _msgpack
except ImportError:  # pragma: no cover - wheel present in this container
    _msgpack = None


def iter_msgpack_stream(buf: bytes) -> Iterator[Any]:
    """Yield every top-level msgpack object in `buf`, decoded with the same
    conventions as msgpack_unpack (str via surrogateescape, ExtType for
    extensions): C `msgpack.Unpacker` when the wheel exists, pure-Python
    fallback otherwise."""
    if _msgpack is not None and buf:
        unp = _msgpack.Unpacker(
            raw=False,
            unicode_errors="surrogateescape",
            strict_map_key=False,
            ext_hook=ExtType,
            max_buffer_size=0,
        )
        unp.feed(buf)
        yield from unp
    else:
        off, n = 0, len(buf)
        while off < n:
            obj, off = msgpack_unpack(buf, off)
            yield obj


# --------------------------------------------------------------- decoder

def msgpack_unpack(buf: bytes, off: int = 0) -> tuple[Any, int]:
    """Decode ONE msgpack object at `off`. Returns (obj, next_offset).

    Map keys are decoded like values (str keys arrive as str). Strings are
    UTF-8 with surrogateescape — LOSSLESS for arbitrary bytes (the
    reference treats str bytes opaquely; PackedForward payloads may arrive
    str-framed and must round-trip back to their exact bytes).
    """
    b = buf[off]
    off += 1
    if b <= 0x7F:  # positive fixint
        return b, off
    if b >= 0xE0:  # negative fixint
        return b - 0x100, off
    if 0x80 <= b <= 0x8F:  # fixmap
        return _unpack_map(buf, off, b & 0x0F)
    if 0x90 <= b <= 0x9F:  # fixarray
        return _unpack_array(buf, off, b & 0x0F)
    if 0xA0 <= b <= 0xBF:  # fixstr
        n = b & 0x1F
        return buf[off : off + n].decode("utf-8", "surrogateescape"), off + n
    if b == 0xC0:
        return None, off
    if b == 0xC2:
        return False, off
    if b == 0xC3:
        return True, off
    if b == 0xC4 or b == 0xC5 or b == 0xC6:  # bin 8/16/32
        w = 1 << (b - 0xC4)
        n = int.from_bytes(buf[off : off + w], "big")
        off += w
        return bytes(buf[off : off + n]), off + n
    if b == 0xC7 or b == 0xC8 or b == 0xC9:  # ext 8/16/32
        w = 1 << (b - 0xC7)
        n = int.from_bytes(buf[off : off + w], "big")
        off += w
        code = struct.unpack_from("b", buf, off)[0]
        off += 1
        return ExtType(code, bytes(buf[off : off + n])), off + n
    if b == 0xCA:
        return struct.unpack_from(">f", buf, off)[0], off + 4
    if b == 0xCB:
        return struct.unpack_from(">d", buf, off)[0], off + 8
    if 0xCC <= b <= 0xCF:  # uint 8/16/32/64
        w = 1 << (b - 0xCC)
        return int.from_bytes(buf[off : off + w], "big"), off + w
    if 0xD0 <= b <= 0xD3:  # int 8/16/32/64
        w = 1 << (b - 0xD0)
        return int.from_bytes(buf[off : off + w], "big", signed=True), off + w
    if 0xD4 <= b <= 0xD8:  # fixext 1/2/4/8/16
        n = 1 << (b - 0xD4)
        code = struct.unpack_from("b", buf, off)[0]
        off += 1
        return ExtType(code, bytes(buf[off : off + n])), off + n
    if b == 0xD9 or b == 0xDA or b == 0xDB:  # str 8/16/32
        w = 1 << (b - 0xD9)
        n = int.from_bytes(buf[off : off + w], "big")
        off += w
        return buf[off : off + n].decode("utf-8", "surrogateescape"), off + n
    if b == 0xDC or b == 0xDD:  # array 16/32
        w = 2 << (b - 0xDC)
        n = int.from_bytes(buf[off : off + w], "big")
        return _unpack_array(buf, off + w, n)
    if b == 0xDE or b == 0xDF:  # map 16/32
        w = 2 << (b - 0xDE)
        n = int.from_bytes(buf[off : off + w], "big")
        return _unpack_map(buf, off + w, n)
    raise ValueError(f"invalid msgpack type byte 0x{b:02x} at {off - 1}")


def _unpack_array(buf: bytes, off: int, n: int) -> tuple[list, int]:
    out = []
    for _ in range(n):
        v, off = msgpack_unpack(buf, off)
        out.append(v)
    return out, off


def _unpack_map(buf: bytes, off: int, n: int) -> tuple[dict, int]:
    out = {}
    for _ in range(n):
        k, off = msgpack_unpack(buf, off)
        v, off = msgpack_unpack(buf, off)
        out[k] = v
    return out, off


# --------------------------------------------------------------- encoder

def msgpack_pack(obj: Any) -> bytes:
    out = bytearray()
    _pack_into(out, obj)
    return bytes(out)


def _pack_into(out: bytearray, obj: Any) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        if 0 <= obj <= 0x7F:
            out.append(obj)
        elif -32 <= obj < 0:
            out.append(obj & 0xFF)
        elif 0 <= obj <= 0xFF:
            out += bytes((0xCC, obj))
        elif 0 <= obj <= 0xFFFF:
            out.append(0xCD)
            out += obj.to_bytes(2, "big")
        elif 0 <= obj <= 0xFFFFFFFF:
            out.append(0xCE)
            out += obj.to_bytes(4, "big")
        elif 0 <= obj:
            out.append(0xCF)
            out += obj.to_bytes(8, "big")
        elif obj >= -(1 << 31):
            out.append(0xD2)
            out += obj.to_bytes(4, "big", signed=True)
        else:
            out.append(0xD3)
            out += obj.to_bytes(8, "big", signed=True)
    elif isinstance(obj, float):
        out.append(0xCB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, str):
        data = obj.encode("utf-8", "surrogateescape")
        n = len(data)
        if n <= 0x1F:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += bytes((0xD9, n))
        elif n <= 0xFFFF:
            out.append(0xDA)
            out += n.to_bytes(2, "big")
        else:
            out.append(0xDB)
            out += n.to_bytes(4, "big")
        out += data
    elif isinstance(obj, bytes):
        n = len(obj)
        if n <= 0xFF:
            out += bytes((0xC4, n))
        elif n <= 0xFFFF:
            out.append(0xC5)
            out += n.to_bytes(2, "big")
        else:
            out.append(0xC6)
            out += n.to_bytes(4, "big")
        out += obj
    elif isinstance(obj, ExtType):
        n = len(obj.data)
        fix = {1: 0xD4, 2: 0xD5, 4: 0xD6, 8: 0xD7, 16: 0xD8}.get(n)
        if fix is not None:
            out.append(fix)
        elif n <= 0xFF:
            out += bytes((0xC7, n))
        elif n <= 0xFFFF:
            out.append(0xC8)
            out += n.to_bytes(2, "big")
        else:
            out.append(0xC9)
            out += n.to_bytes(4, "big")
        out += struct.pack("b", obj.code)
        out += obj.data
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n <= 0x0F:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out.append(0xDC)
            out += n.to_bytes(2, "big")
        else:
            out.append(0xDD)
            out += n.to_bytes(4, "big")
        for v in obj:
            _pack_into(out, v)
    elif isinstance(obj, dict):
        n = len(obj)
        if n <= 0x0F:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out.append(0xDE)
            out += n.to_bytes(2, "big")
        else:
            out.append(0xDF)
            out += n.to_bytes(4, "big")
        for k, v in obj.items():
            _pack_into(out, k)
            _pack_into(out, v)
    else:
        raise TypeError(f"cannot msgpack-encode {type(obj).__name__}")


# ------------------------------------------------------------ event time

def decode_event_time(obj: Any) -> int:
    """Time object -> epoch nanoseconds (flb_time_pop_from_msgpack:145-177):
    positive int = seconds; float = seconds with fraction; ext payload =
    fixext8 big-endian (u32 sec, u32 nsec)."""
    if isinstance(obj, int):
        return obj * 1_000_000_000
    if isinstance(obj, float):
        sec = int(obj)
        return sec * 1_000_000_000 + int((obj - sec) * 1_000_000_000)
    if isinstance(obj, ExtType):
        if len(obj.data) != 8:
            raise ValueError(f"EventTime ext payload must be 8 bytes, got {len(obj.data)}")
        sec, nsec = struct.unpack(">II", obj.data)
        return sec * 1_000_000_000 + nsec
    raise ValueError(f"unknown time object {obj!r}")


def pack_event_time(ns: int) -> ExtType:
    """Epoch ns -> EventTime fixext8 (flb_time_append_to_msgpack:126-137)."""
    sec, nsec = divmod(ns, 1_000_000_000)
    return ExtType(0, struct.pack(">II", sec & 0xFFFFFFFF, nsec))


# ---------------------------------------------------------------- frames

def iter_forward_frames(buf: bytes) -> Iterator[tuple[str, list[tuple[int, dict]]]]:
    """Yield (tag, [(time_ns, record), ...]) per forward frame in `buf`.

    Handles Message, Forward, and PackedForward modes (fw_prot.c:170-256).
    Invalid frames raise ValueError (the reference closes the connection).
    """
    for root in iter_msgpack_stream(buf):
        if not isinstance(root, list) or len(root) < 2:
            raise ValueError("forward frame must be an array of size >= 2")
        tag = root[0]
        if isinstance(tag, bytes):
            tag = tag.decode("utf-8", "replace")
        if not isinstance(tag, str):
            raise ValueError("forward frame tag must be a string")
        entry = root[1]
        if isinstance(entry, list):
            # Forward mode: [[time, record], ...]
            out = []
            for e in entry:
                if not isinstance(e, list) or len(e) < 2 or not isinstance(e[1], dict):
                    raise ValueError("forward entry must be [time, map]")
                out.append((decode_event_time(e[0]), e[1]))
            yield tag, out
        elif isinstance(entry, (int, float, ExtType)):
            # Message mode: [tag, time, record, option?]
            if len(root) < 3 or not isinstance(root[2], dict):
                raise ValueError("message mode needs a record map")
            yield tag, [(decode_event_time(entry), root[2])]
        elif isinstance(entry, (bytes, str)):
            # PackedForward: concatenated [time, record] entries
            data = entry.encode("utf-8", "surrogateescape") if isinstance(entry, str) else entry
            out = []
            for e in iter_msgpack_stream(data):
                if not isinstance(e, list) or len(e) < 2 or not isinstance(e[1], dict):
                    raise ValueError("packed entry must be [time, map]")
                out.append((decode_event_time(e[0]), e[1]))
            yield tag, out
        else:
            raise ValueError(f"invalid forward entry type {type(entry).__name__}")


def frames_to_table(buf: bytes) -> pa.Table:
    """One file's frames -> Arrow table (_tag, _time, record columns).

    Record values go to records_to_table UNSCRUBBED — its per-column
    fallback applies the surrogate scrub only to columns that actually
    fail Arrow conversion, so the clean-data hot path pays no per-value
    recursion (was the dominant decode cost)."""
    from ..functions.records import arrow_safe, records_to_table

    tags: list[str] = []
    times: list[int] = []
    recs: list[dict] = []
    for tag, entries in iter_forward_frames(buf):
        tag = arrow_safe(tag)
        for tns, rec in entries:
            tags.append(tag)
            times.append(tns)
            recs.append(rec)
    if not recs:
        return pa.table({"_tag": pa.array([], pa.string()),
                         "_time": pa.array([], pa.int64())})
    t = records_to_table(recs)
    return (
        t.append_column("_tag", pa.array(tags, pa.string()))
        .append_column("_time", pa.array(times, pa.int64()))
    )


def forward_file_dataset(paths: list[str]):
    """Forward dump files -> Ray Dataset; one read task per file, frame
    decode inside map_batches (the per-record Python loop is the msgpack
    boundary cost — see module docstring)."""
    import ray.data

    ds = ray.data.read_binary_files(paths)

    def decode(batch: pa.Table) -> pa.Table:
        parts = [frames_to_table(bts.as_py()) for bts in batch["bytes"]]
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return pa.table({"_tag": pa.array([], pa.string()),
                             "_time": pa.array([], pa.int64())})
        return pa.concat_tables(parts, promote_options="default")

    return ds.map_batches(decode, batch_format="pyarrow")


def write_forward_file(
    path: str,
    frames: Iterable[tuple[str, list[tuple[int, dict]], str]],
) -> None:
    """Write (tag, [(time_ns, record)...], mode) frames; mode in
    {"forward", "message", "packed"}."""
    with open(path, "wb") as f:
        for tag, entries, mode in frames:
            if mode == "message":
                for tns, rec in entries:
                    f.write(msgpack_pack([tag, pack_event_time(tns), rec]))
            elif mode == "packed":
                blob = b"".join(
                    msgpack_pack([pack_event_time(tns), rec])
                    for tns, rec in entries
                )
                f.write(msgpack_pack([tag, blob]))
            else:
                f.write(
                    msgpack_pack(
                        [tag, [[pack_event_time(tns), rec] for tns, rec in entries]]
                    )
                )
