"""Multi-sink routed writers — out_file formats + partitioned parquet.

Reference parity (studied, not copied): plugins/out_file/file.c —
- JSON (default): one line per record, ``{tag}: [{time:%f}, {json}]``
  (file.c:216-222), record JSON escaped per src/flb_utils.c:491-626;
- CSV: ``{time:%f}{d}val{d}val…`` — time then VALUES only (file.c:117-138),
  strings printed quoted like msgpack_object_print;
- LTSV: ``"time":{time:%f}\t"key":"val"…`` (file.c:140-168);
- parquet: the columnar-native sink (no reference analog; the engine's
  primary output format).

Routing fan-out: a row is written to EVERY sink whose Match pattern hits its
tag (reference flb_task_create route list, src/flb_task.c:234-278) — a row
can appear in several sinks; rows matching no sink are dropped.

Scale notes: the write stage runs inside `map_batches` — each task writes
its own files named ``{partition}__{task-uuid}.{ext}`` (idempotent restarts
delete partials by partition prefix, see state/checkpoint.py). Output is one
directory per sink; never one giant file. The stage RETURNS per-batch
partial-aggregate rows (sink × src × lang × host × minute-bucket), so the
wide aggregation shuffles only pre-combined rows, not records
(partial/combiner pattern, SURVEY §7.3).
"""

from __future__ import annotations

import hashlib
import io
import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.escape import flb_json_escape
from ..router import Router, Route
from ..stages.grep import GrepFilter

# ---------------------------------------------------------------- formatting


def _json_value(v) -> str:
    """flb_msgpack_to_json-style value serialization."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, str):
        return '"' + flb_json_escape(v) + '"'
    if isinstance(v, bytes):
        return '"' + flb_json_escape(v.decode("utf-8", "replace")) + '"'
    if isinstance(v, dict):
        return "{" + ",".join(
            '"' + flb_json_escape(str(k)) + '":' + _json_value(x)
            for k, x in v.items()
            if x is not None
        ) + "}"
    if isinstance(v, list):
        if v and isinstance(v[0], tuple):  # arrow map -> object
            return _json_value(dict(v))
        return "[" + ",".join(_json_value(x) for x in v) + "]"
    return '"' + flb_json_escape(str(v)) + '"'


def record_to_json(rec: dict) -> str:
    """Record map -> JSON object string, insertion order, nulls skipped."""
    return "{" + ",".join(
        '"' + flb_json_escape(k) + '":' + _json_value(v)
        for k, v in rec.items()
        if v is not None
    ) + "}"


def _print_value(v) -> str:
    """msgpack_object_print-style scalar for csv/ltsv (strings quoted raw)."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, str):
        return '"' + v + '"'
    if isinstance(v, (dict, list)):
        return _json_value(v)  # nested maps/arrays print as JSON, not repr
    return '"' + str(v) + '"'


def _row_iter(table: pa.Table, record_cols: list[str]):
    data = [table[c].to_pylist() for c in record_cols]
    for i in range(table.num_rows):
        yield {c: col[i] for c, col in zip(record_cols, data) if col[i] is not None}


def _json_column(col) -> list:
    """Serialize one column's values with a single type dispatch (the json
    sink hot path); None stays None (absent key)."""
    vals = col.to_pylist()
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        esc = flb_json_escape
        return [None if v is None else f'"{esc(v)}"' for v in vals]
    if pa.types.is_integer(t):
        return [None if v is None else str(v) for v in vals]
    if pa.types.is_boolean(t):
        return [None if v is None else ("true" if v else "false") for v in vals]
    if pa.types.is_floating(t):
        return [None if v is None else repr(v) for v in vals]
    if (
        pa.types.is_map(t)
        and pa.types.is_string(t.key_type)
        and pa.types.is_string(t.item_type)
    ):
        # string->string maps (labels-style): direct pair assembly, no
        # per-cell generic dispatch or dict conversion
        esc = flb_json_escape
        return [
            None
            if v is None
            else "{" + ",".join(f'"{esc(k)}":"{esc(x)}"' for k, x in v if x is not None) + "}"
            for v in vals
        ]
    return [None if v is None else _json_value(v) for v in vals]


def _print_column(col) -> list:
    """Per-column print-mode (csv/ltsv) Python fallback: msgpack_object_print
    semantics. None stays None (absent key)."""
    vals = col.to_pylist()
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return [None if v is None else f'"{v}"' for v in vals]
    if pa.types.is_integer(t):
        return [None if v is None else str(v) for v in vals]
    if pa.types.is_boolean(t):
        return [None if v is None else ("true" if v else "false") for v in vals]
    if pa.types.is_floating(t):
        return [None if v is None else repr(v) for v in vals]
    return [None if v is None else _print_value(v) for v in vals]


# ---------------------------------------------------- vectorized assembly
#
# The text sinks' dominant cost at scale was per-row Python string assembly.
# Each column is serialized ONCE with Arrow kernels (escape-scan regex,
# casts, strftime, list joins) and rows are assembled with
# binary_join_element_wise — the only per-row Python work left is the %.6f
# time prefix (one listcomp) and the final "\n".join. Types Arrow can't
# render byte-identically (floats: Arrow's shortest-repr cast differs from
# Python repr, e.g. 2.0 -> "2") fall back to the per-column Python path.
#
# pyarrow 16.1 gotcha: binary_join_element_wise(null_handling="skip")
# DROPS rows whose inputs are ALL null (output is shorter, not ""), so
# every skip-join leads with a non-null sentinel that is sliced back off
# (or a non-null line prefix that doubles as one).

_RE2_NEEDS_ESCAPE = r"[^ !#-\[\]-~]"  # outside printable ASCII minus `"` `\`
_SENT = "\x00"


def _combined(col):
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.offset != 0:  # compact slices so child/offset views align
        col = col.take(pa.array(np.arange(len(col)), pa.int64()))
    return col


def _escape_strings(col: pa.Array) -> pa.Array:
    """flb_json_escape, vectorized: one C-level regex scan finds the values
    that need escaping (rare in real logs); only those pay the Python
    translate-table call."""
    needs = pc.fill_null(pc.match_substring_regex(col, _RE2_NEEDS_ESCAPE), False)
    if not pc.any(needs).as_py():
        return col
    idx = np.flatnonzero(needs.to_numpy(zero_copy_only=False))
    fixed = pa.array(
        [flb_json_escape(v) for v in col.take(pa.array(idx, pa.int64())).to_pylist()],
        type=pa.string(),
    )
    return pc.replace_with_mask(col, needs, fixed)


def _quote(col) -> pa.Array:
    return pc.binary_join_element_wise('"', col, '"', "")


def _skip_join(frags: list, sep: str, n: int) -> pa.Array:
    """Join fragment columns per row with `sep`, skipping nulls; never
    returns null (all-null rows -> "") and never drops rows (sentinel)."""
    if not frags:
        return pa.array([""] * n, pa.string())
    joined = pc.binary_join_element_wise(
        _SENT, *frags, sep, null_handling="skip"
    )
    return pc.utf8_slice_codeunits(joined, len(_SENT) + len(sep))


def _ts_strings(col: pa.Array):
    """str(datetime.datetime) parity for timestamp columns (s/ms/us unit,
    naive or UTC): `YYYY-MM-DD HH:MM:SS[.ffffff][+00:00]`, fraction only
    when nonzero — exactly what the per-row Python path printed via
    to_pylist + str(). Returns None for units/zones needing the fallback."""
    t = col.type
    if t.unit not in ("s", "ms", "us"):
        return None
    if t.tz not in (None, "UTC", "utc", "+00:00"):
        return None
    suffix = "+00:00" if t.tz else ""
    scale = {"s": 1_000_000, "ms": 1_000, "us": 1}[t.unit]
    us = pc.multiply(pc.cast(col, pa.int64()), scale) if scale != 1 else pc.cast(col, pa.int64())
    floored = pc.floor_temporal(col, unit="second")
    sec_s = pc.cast(floored, pa.timestamp("s", tz=t.tz))
    base = pc.strftime(sec_s, format="%Y-%m-%d %H:%M:%S")
    frac = pc.subtract(us, pc.multiply(pc.cast(pc.cast(sec_s, pa.int64()), pa.int64()), 1_000_000))
    has_frac = pc.fill_null(pc.not_equal(frac, 0), False)
    if pc.any(has_frac).as_py():
        fracstr = pc.binary_join_element_wise(
            ".", pc.utf8_lpad(pc.cast(frac, pa.string()), 6, "0"), ""
        )
        mid = pc.if_else(has_frac, fracstr, "")
        return pc.binary_join_element_wise(base, mid, suffix, "")
    return pc.binary_join_element_wise(base, suffix, "")


def _json_arrow(col):
    """Vectorized flb JSON serialization of one column; None when the type
    needs the Python `_json_column` fallback. Null in -> null out (absent)."""
    col = _combined(col)
    t = col.type
    if pa.types.is_large_string(t):
        col = pc.cast(col, pa.string())
        t = col.type
    if pa.types.is_string(t):
        return _quote(_escape_strings(col))
    if pa.types.is_boolean(t) or pa.types.is_integer(t):
        return pc.cast(col, pa.string())
    if pa.types.is_timestamp(t):
        s = _ts_strings(col)
        return None if s is None else _quote(s)  # str() form has no escapables
    if pa.types.is_struct(t):
        frags = []
        for i in range(t.num_fields):
            child = _json_arrow(col.field(i))
            if child is None:
                return None
            frags.append(
                pc.binary_join_element_wise(
                    '"' + flb_json_escape(t.field(i).name) + '":', child, ""
                )
            )
        body = _skip_join(frags, ",", len(col))
        wrapped = pc.binary_join_element_wise("{", body, "}", "")
        return pc.if_else(pc.is_valid(col), wrapped, pa.scalar(None, pa.string()))
    if pa.types.is_map(t) and pa.types.is_string(t.key_type):
        # {"k":<v>,...} per row; entries with nil value are skipped (the
        # reference's object printer skips nil map values)
        items_ser = _json_arrow(col.items)
        if items_ser is None:
            return None
        keys_q = _quote(_escape_strings(pc.cast(_combined(col.keys), pa.string())))
        entries = pc.binary_join_element_wise(keys_q, ":", items_ser, "")
        entries = pc.if_else(pc.is_valid(items_ser), entries, pa.scalar(None, pa.string()))
        valid = pc.is_valid(entries).to_numpy(zero_copy_only=False)
        offsets = np.asarray(col.offsets)
        new_off = np.concatenate([[0], np.cumsum(valid)])[offsets]
        lst = pa.ListArray.from_arrays(
            pa.array(new_off, pa.int32()), entries.filter(pa.array(valid))
        )
        body = pc.fill_null(pc.binary_join(lst, ","), "")
        wrapped = pc.binary_join_element_wise("{", body, "}", "")
        return pc.if_else(pc.is_valid(col), wrapped, pa.scalar(None, pa.string()))
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        elem = _json_arrow(pc.list_flatten(col))
        if elem is None:
            return None
        elem = pc.fill_null(elem, "null")  # null elements print as JSON null
        lens = pc.fill_null(pc.list_value_length(col), 0).to_numpy(zero_copy_only=False)
        off = np.concatenate([[0], np.cumsum(lens, dtype=np.int64)])
        lst = pa.LargeListArray.from_arrays(pa.array(off, pa.int64()), elem)
        body = pc.fill_null(pc.binary_join(lst, ","), "")
        wrapped = pc.binary_join_element_wise("[", body, "]", "")
        return pc.if_else(pc.is_valid(col), wrapped, pa.scalar(None, pa.string()))
    return None  # floats (repr mismatch) and exotic types: Python fallback


def _print_arrow(col):
    """Vectorized msgpack_object_print serialization (csv/ltsv): strings are
    raw-quoted (NO escaping), nested values print as JSON."""
    col = _combined(col)
    t = col.type
    if pa.types.is_large_string(t):
        col = pc.cast(col, pa.string())
        t = col.type
    if pa.types.is_string(t):
        return _quote(col)
    if pa.types.is_boolean(t) or pa.types.is_integer(t):
        return pc.cast(col, pa.string())
    if pa.types.is_timestamp(t):
        s = _ts_strings(col)
        return None if s is None else _quote(s)
    if pa.types.is_struct(t) or pa.types.is_map(t) or pa.types.is_list(t) or pa.types.is_large_list(t):
        return _json_arrow(col)  # _print_value renders nested values as JSON
    return None


def _serialized_columns(table: pa.Table, record_cols: list[str], json_mode: bool) -> list:
    out = []
    for c in record_cols:
        col = table[c]
        arr = _json_arrow(col) if json_mode else _print_arrow(col)
        if arr is None:
            vals = _json_column(col) if json_mode else _print_column(col)
            arr = pa.array(vals, type=pa.string())
        out.append(arr)
    return out


def _time_strings(times: np.ndarray) -> pa.Array:
    # %.6f of the float seconds — must match the historical f"{t:.6f}"
    # byte-for-byte, so this stays a (cheap) per-row format call
    return pa.array([f"{t:.6f}" for t in times], type=pa.string())


def _tag_strings(table: pa.Table) -> pa.Array:
    n = table.num_rows
    if "_tag" not in table.column_names:
        return pa.array([""] * n, pa.string())
    col = pc.cast(_combined(table["_tag"]), pa.string())
    # the row path printed Python None as "None" — preserved for parity
    return pc.fill_null(col, "None")


def format_json_lines(table: pa.Table, record_cols: list[str]) -> str:
    """Arrow-vectorized assembly: per-column serialization (escape-scan +
    casts), key fragments prepended column-wise, rows joined with a single
    null-skipping binary_join_element_wise."""
    n = table.num_rows
    if n == 0:
        return ""
    frags = [
        pc.binary_join_element_wise('"' + flb_json_escape(c) + '":', ser, "")
        for c, ser in zip(record_cols, _serialized_columns(table, record_cols, True))
    ]
    body = _skip_join(frags, ",", n)
    lines = pc.binary_join_element_wise(
        _tag_strings(table), ": [", _time_strings(_times_sec(table)), ", {", body, "}]", ""
    )
    return "\n".join(lines.to_pylist()) + "\n"


def format_csv(table: pa.Table, record_cols: list[str], delimiter: str = ",") -> str:
    n = table.num_rows
    if n == 0:
        return ""
    body = _skip_join(_serialized_columns(table, record_cols, False), delimiter, n)
    lines = pc.binary_join_element_wise(
        _time_strings(_times_sec(table)), delimiter, body, ""
    )
    return "\n".join(lines.to_pylist()) + "\n"


def format_ltsv(
    table: pa.Table, record_cols: list[str], delimiter: str = "\t", label_delimiter: str = ":"
) -> str:
    n = table.num_rows
    if n == 0:
        return ""
    times = _times_sec(table)
    tfrag = pa.array(
        [f'"time"{label_delimiter}{t:.6f}' for t in times], type=pa.string()
    )
    frags = [
        pc.binary_join_element_wise(f'"{c}"{label_delimiter}', ser, "")
        for c, ser in zip(record_cols, _serialized_columns(table, record_cols, False))
    ]
    # tfrag is always non-null, so it doubles as the skip-join sentinel
    lines = pc.binary_join_element_wise(
        tfrag, *frags, delimiter, null_handling="skip"
    )
    return "\n".join(lines.to_pylist()) + "\n"


_NAT_F = float(np.iinfo(np.int64).min)  # parsers emit int64-min as NaT sentinel


def _times_ns(table: pa.Table) -> np.ndarray:
    """Integer epoch-ns per row (0 where missing) — for formatters that
    need exact second/fraction splits without float rounding."""
    if "_time" not in table.column_names:
        return np.zeros(table.num_rows, dtype=np.int64)
    col = table["_time"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        ts = np.asarray(col.fill_null(0))
        return np.where(ts == np.iinfo(np.int64).min, 0, ts)
    t = col.to_numpy(zero_copy_only=False).astype("float64")
    t = np.where(np.isnan(t) | (t == _NAT_F), 0.0, t)
    return t.astype(np.int64)


def _times_sec(table: pa.Table) -> np.ndarray:
    if "_time" in table.column_names:
        t = table["_time"].to_numpy(zero_copy_only=False).astype("float64")
        # missing time arrives as a real null (NaN after the float cast) OR
        # as the NAT sentinel (int64 min) — treat both as "no time"
        t = np.where(np.isnan(t) | (t == _NAT_F), 0.0, t)
        return t / 1e9
    return np.zeros(table.num_rows)


def _chunk_token(chunk: pa.Table) -> str:
    """Deterministic content hash of a chunk (ipc-serialized)."""
    buf = io.BytesIO()
    with pa.ipc.new_stream(buf, chunk.schema) as w:
        w.write_table(chunk)
    return hashlib.blake2b(buf.getvalue(), digest_size=6).hexdigest()


# ------------------------------------------------------------------- sinks


@dataclass(frozen=True)
class SinkSpec:
    name: str
    patterns: tuple[str, ...]
    fmt: str = "parquet"  # parquet | json | csv | ltsv | es | plot | influxdb | kafka
    grep: Optional[tuple[tuple[str, str, str], ...]] = None  # extra rule chain
    columns: Optional[tuple[str, ...]] = None  # projection; None = record cols
    # format options: es -> (("index","fluentbit"),("type","flb_type")),
    # plot -> (("key","<numeric field>"),)
    fmt_options: tuple[tuple[str, str], ...] = ()
    # aggregate-only sinks (counter/flowcounter/null/stdout analogs) route
    # and count but never write files
    writes: bool = True

    def route(self) -> Route:
        return Route(self.name, self.patterns)

    def opt(self, key: str, default: Optional[str] = None) -> Optional[str]:
        for k, v in self.fmt_options:
            if k == key:
                return v
        return default


def format_es_bulk(table: pa.Table, record_cols: list[str],
                   index_prefix: str = "fluentbit", es_type: str = "flb_type",
                   logstash: bool = True, time_key: str = "@timestamp") -> str:
    """out_es bulk format (plugins/out_es/es.c:185-257): per record an action
    line `{"index":{"_index":i,"_type":t}}` then the source; Logstash_Format
    derives a daily index `prefix-YYYY.MM.DD` from EVENT time and injects the
    time under `Time_Key`.

    Vectorized like the other text sinks: the daily-index/timestamp strings
    come from Arrow strftime over second-floored event times (seconds are
    derived from datetime.fromtimestamp's microsecond rounding for parity
    with the historical per-row path), the source objects from the shared
    column serializer. A record column named `time_key` overrides the
    injected timestamp in place (first position), matching the old dict
    `{time_key: ..., **rec}` merge; a null override drops the key."""
    n = table.num_rows
    if n == 0:
        return ""
    times = _times_sec(table)
    frags = [
        pc.binary_join_element_wise('"' + flb_json_escape(c) + '":', ser, "")
        for c, ser in zip(record_cols, _serialized_columns(table, record_cols, True))
    ]
    if logstash:
        # fromtimestamp() rounds to the nearest microsecond before splitting
        # out the displayed second — replicate, then format with Arrow
        sec = np.floor_divide(np.round(times * 1e6).astype(np.int64), 1_000_000)
        sec_ts = pa.array(sec, pa.timestamp("s", tz="UTC"))
        day = pc.strftime(sec_ts, format="%Y.%m.%d")
        action = pc.binary_join_element_wise(
            '{"index":{"_index":"' + index_prefix + "-", day,
            '","_type":"' + flb_json_escape(es_type) + '"}}', "",
        )
        if time_key in record_cols:
            # record override wins but keeps FIRST position (dict-merge parity)
            i = record_cols.index(time_key)
            frags = [frags[i]] + frags[:i] + frags[i + 1:]
        else:
            ms = (np.mod(times, 1.0) * 1000).astype(np.int64)
            tsval = pc.binary_join_element_wise(
                '"' + flb_json_escape(time_key) + '":"',
                pc.strftime(sec_ts, format="%Y-%m-%dT%H:%M:%S."),
                pc.utf8_lpad(pc.cast(pa.array(ms), pa.string()), 3, "0"),
                'Z"', "",
            )
            frags = [tsval] + frags
    else:
        action = pa.array(
            ['{"index":{"_index":"%s","_type":"%s"}}' % (index_prefix, es_type)] * n,
            pa.string(),
        )
    body = _skip_join(frags, ",", n)
    lines = pc.binary_join_element_wise(action, "\n{", body, "}", "")
    return "\n".join(lines.to_pylist()) + "\n"


def format_influxdb(
    table: pa.Table,
    record_cols: list[str],
    seq_name: str = "_seq",
    seq_start: int = 0,
    auto_tags: bool = False,
    tag_keys: Optional[tuple[str, ...]] = None,
) -> str:
    """out_influxdb line protocol (plugins/out_influxdb/influxdb.c:48-317 +
    influxdb_bulk.c — studied, not copied): per record
    `{tag},{seq_name}={n}[,tagkey="val"...] key=val,... {timestamp_ns}`;
    bools print TRUE/FALSE, floats %f, strings quoted with the flb
    escaping; nil and nested values are skipped; a record whose fields are
    all tagged is dropped (the reference logs an error). The sequence
    counter restarts per formatted chunk (the reference's is per-process —
    a documented divergence of the stateless batch engine). At the wrap
    iteration (counter + 1 >= 100000) the emitted value is 1 and the
    counter stops incrementing, pinning every later record to 1 — the
    exact influxdb.c:129-135 behaviour.
    """
    n = table.num_rows
    if n == 0:
        return ""
    tag_key_set = set(tag_keys or ())

    # sequence values, vectorized with the freeze-at-wrap semantics: while
    # seq+1 < 100000 each record consumes the counter; from the wrap
    # iteration on, every record emits the pinned 1
    si = seq_start + np.arange(n, dtype=np.int64)
    emitted = np.where(si + 1 >= 100000, 1, si)
    head0 = pc.binary_join_element_wise(
        _tag_strings(table),
        "," + seq_name + "=",
        pc.cast(pa.array(emitted), pa.string()),
        "",
    )

    # per-column serialization (one type dispatch per COLUMN, no row loop);
    # quoted==True marks string-typed values (auto_tags promotes them)
    head_frags: list = []
    body_frags: list = []
    for c in record_cols:
        col = _combined(table[c])
        t = col.type
        quoted = False
        if pa.types.is_large_string(t):
            col = pc.cast(col, pa.string())
            t = col.type
        if pa.types.is_string(t):
            ser = _quote(_escape_strings(col))
            quoted = True
        elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
            esc = flb_json_escape
            ser = pa.array(
                [
                    None if v is None else '"' + esc(v.decode("utf-8", "replace")) + '"'
                    for v in col.to_pylist()
                ],
                pa.string(),
            )
            quoted = True
        elif pa.types.is_boolean(t):
            ser = pc.if_else(col, "TRUE", "FALSE")
        elif pa.types.is_integer(t):
            ser = pc.cast(col, pa.string())
        elif pa.types.is_floating(t):
            # %f has no Arrow kernel with byte-identical rounding; the
            # listcomp is per-FLOAT-COLUMN only
            ser = pa.array(
                [None if v is None else f"{v:f}" for v in col.to_pylist()],
                pa.string(),
            )
        else:
            continue  # nil / nested / timestamp values are skipped
        frag = pc.binary_join_element_wise(c + "=", ser, "")
        tagged = (quoted and auto_tags) or c in tag_key_set
        (head_frags if tagged else body_frags).append(frag)

    # head0 is always non-null, so it doubles as the skip-join sentinel
    head = pc.binary_join_element_wise(
        head0, *head_frags, ",", null_handling="skip"
    )
    body = _skip_join(body_frags, ",", n)
    ts = _times_ns(table)
    lines = pc.binary_join_element_wise(
        head, " ", body, " ", pc.cast(pa.array(ts), pa.string()), ""
    )
    # all fields tagged -> record dropped (influxdb.c:269-272)
    keep = pc.not_equal(body, "")
    out = lines.filter(keep).to_pylist()
    return "\n".join(out) + ("\n" if out else "")


def _mp_columns(table: pa.Table, record_cols: list[str]) -> list:
    """Per-column serialization in flb_msgpack_to_json shape (the mp_json
    byte dialect: "%f" floats, ", " separators handled by the caller).
    One type dispatch per COLUMN; nested values fall back to a per-column
    mp_json_value listcomp. None stays None (absent key)."""
    from ..functions.mp_json import mp_json_value

    out = []
    for c in record_cols:
        col = _combined(table[c])
        t = col.type
        if pa.types.is_large_string(t):
            col = pc.cast(col, pa.string())
            t = col.type
        if pa.types.is_string(t):
            arr = _quote(_escape_strings(col))
        elif pa.types.is_boolean(t) or pa.types.is_integer(t):
            arr = pc.cast(col, pa.string())
        elif pa.types.is_floating(t):
            arr = pa.array(
                [None if v is None else f"{v:f}" for v in col.to_pylist()],
                pa.string(),
            )
        elif pa.types.is_timestamp(t):
            s = _ts_strings(col)
            arr = (
                _quote(s)
                if s is not None
                else pa.array(
                    [None if v is None else mp_json_value(v)
                     for v in col.to_pylist()],
                    pa.string(),
                )
            )
        else:  # nested / exotic: per-column mp_json fallback
            vals = col.to_pylist()
            arr = pa.array(
                [None if v is None
                 else mp_json_value(dict(v) if isinstance(v, list)
                                    and v and isinstance(v[0], tuple) else v)
                 for v in vals],
                pa.string(),
            )
        out.append(arr)
    return out


def _mp_key_frags(table: pa.Table, record_cols: list[str]) -> list:
    return [
        pc.binary_join_element_wise(
            '"' + flb_json_escape(c) + '":', ser, ""
        )
        for c, ser in zip(record_cols, _mp_columns(table, record_cols))
    ]


def format_kafka_json(
    table: pa.Table, record_cols: list[str], timestamp_key: str = "@timestamp"
) -> str:
    """out_kafka json message bodies (plugins/out_kafka/kafka.c:68-125):
    per record one JSON object with `{timestamp_key: <double time>}`
    prepended, serialized in flb_msgpack_to_json shape (functions/mp_json).
    One message per line (the transport is out of scope; the body format
    is the portable part). A record key equal to timestamp_key overwrites
    the injected one but keeps first position (dict-merge parity).
    Vectorized like the other text sinks: per-column mp-shape
    serialization, ", "-joined with null skipping."""
    n = table.num_rows
    if n == 0:
        return ""
    times = _times_sec(table)
    frags = _mp_key_frags(table, record_cols)
    tsfrag = pa.array(
        [f'"{flb_json_escape(timestamp_key)}":{t:f}' for t in times],
        pa.string(),
    )
    if timestamp_key in record_cols:
        # a non-null record value overwrites the injected time (dict-merge
        # parity, first position); null record values keep the injection
        i = record_cols.index(timestamp_key)
        tsfrag = pc.if_else(pc.is_valid(frags[i]), frags[i], tsfrag)
        frags = frags[:i] + frags[i + 1:]
    # tsfrag is non-null: doubles as the skip-join sentinel
    body = pc.binary_join_element_wise(
        tsfrag, *frags, ", ", null_handling="skip"
    )
    lines = pc.binary_join_element_wise("{", body, "}", "")
    return "\n".join(lines.to_pylist()) + "\n"


def format_splunk(
    table: pa.Table, record_cols: list[str], send_raw: bool = False
) -> str:
    """out_splunk HEC event payload (plugins/out_splunk/splunk.c:47-148 —
    studied, not copied): per record `{"time":<%f double>, "event":{...}}`,
    or with Splunk_Send_Raw the record's pairs flattened at the top level
    after "time" (splunk.c:92-96). Records are CONCATENATED with no
    separator — splunk.c:129 flb_sds_cat's the JSON objects back to back —
    and values render in flb_msgpack_to_json shape. The HTTP transport is
    out of scope; the event envelope is the portable format. Vectorized
    column-wise; a record key named "time" overwrites the injected time
    in the raw dict-merge, keeping first position (parity with the
    historical {"time": t, **rec})."""
    n = table.num_rows
    if n == 0:
        return ""
    times = _times_sec(table)
    frags = _mp_key_frags(table, record_cols)
    tfrag = pa.array([f'"time":{t:f}' for t in times], pa.string())
    if send_raw:
        if "time" in record_cols:
            i = record_cols.index("time")
            # record "time" replaces the injected value at first position
            tfrag = pc.if_else(pc.is_valid(frags[i]), frags[i], tfrag)
            frags = frags[:i] + frags[i + 1:]
        lines = pc.binary_join_element_wise(
            "{", pc.binary_join_element_wise(
                tfrag, *frags, ", ", null_handling="skip"
            ), "}", "",
        )
    else:
        body = _skip_join(frags, ", ", n)
        lines = pc.binary_join_element_wise(
            "{", tfrag, ', "event":{', body, "}}", ""
        )
    return "".join(lines.to_pylist())


def format_http(
    table: pa.Table,
    record_cols: list[str],
    date_key: str = "date",
    date_format: str = "double",  # double | iso8601
    out_format: str = "json",  # json | json_stream | json_lines
) -> str:
    """out_http body format (plugins/out_http/http.c:38-160 — studied, not
    copied): a JSON ARRAY of records with `{date_key: <double | iso8601
    us-precision UTC>}` injected first, serialized in flb_msgpack_to_json
    shape; json_stream/json_lines apply the reference's in-place character
    transform (top-level brackets blanked to spaces, top-level commas to
    the separator) — reproduced verbatim for byte parity, quirks included.
    """
    import datetime

    n = table.num_rows
    if n == 0:
        out = "[]"
        if out_format in ("json_stream", "json_lines"):
            out = _brackets_transform(
                out, "\n" if out_format == "json_lines" else " "
            )
        return out
    iso = date_format == "iso8601"
    keyesc = flb_json_escape(date_key)
    if iso:
        # exact integer split: float math could round the fraction to
        # 1000000 us (7-digit field) or go negative for pre-epoch times
        fromts = datetime.datetime.fromtimestamp
        utc = datetime.timezone.utc
        vals = []
        for tns in _times_ns(table):
            sec, rem = divmod(int(tns), 1_000_000_000)
            dt = fromts(sec, utc)
            vals.append(
                f'"{keyesc}":"'
                + dt.strftime("%Y-%m-%dT%H:%M:%S")
                + f'.{rem // 1000:06d}Z"'
            )
        datefrag = pa.array(vals, pa.string())
    else:
        datefrag = pa.array(
            [f'"{keyesc}":{t:f}' for t in _times_sec(table)], pa.string()
        )
    frags = _mp_key_frags(table, record_cols)
    if date_key in record_cols:
        # dict-merge parity: non-null record value overwrites in place
        i = record_cols.index(date_key)
        datefrag = pc.if_else(pc.is_valid(frags[i]), frags[i], datefrag)
        frags = frags[:i] + frags[i + 1:]
    body = pc.binary_join_element_wise(
        datefrag, *frags, ", ", null_handling="skip"
    )
    bodies = pc.binary_join_element_wise("{", body, "}", "").to_pylist()
    out = "[" + ", ".join(bodies) + "]"
    if out_format in ("json_stream", "json_lines"):
        out = _brackets_transform(out, "\n" if out_format == "json_lines" else " ")
    return out


def _brackets_transform(payload: str, sep: str) -> str:
    """The reference's in-place json_stream/json_lines character transform
    (top-level brackets blanked, top-level commas -> sep), vectorized: the
    sequential escape/string/level state machine becomes numpy prefix
    scans over the UTF-8 bytes (multi-byte sequences can never alias the
    ASCII structural bytes, so byte-level is safe).
    - escaped(i): char follows an ODD run of backslashes (run lengths via
      the cumsum-minus-running-reset idiom);
    - in_string(i): parity of unescaped quotes BEFORE i (exclusive);
    - level(i): exclusive prefix sum of out-of-string braces.
    Byte-identical to the historical per-char loop (parity-probed).
    """
    b = np.frombuffer(payload.encode("utf-8"), dtype=np.uint8).copy()
    is_bs = b == 92  # backslash
    t = is_bs.astype(np.int64)
    cs = np.cumsum(t)
    reset = np.where(~is_bs, cs, 0)
    runlen = cs - np.maximum.accumulate(reset)
    escaped = np.zeros(len(b), dtype=bool)
    if len(b) > 1:
        escaped[1:] = (runlen[:-1] & 1).astype(bool)
    q = (b == 34) & ~escaped  # unescaped quotes
    qs = np.cumsum(q.astype(np.int64))
    in_str = np.zeros(len(b), dtype=bool)
    if len(b) > 1:
        in_str[1:] = (qs[:-1] & 1).astype(bool)
    open_ = ((b == 123) & ~in_str & ~escaped).astype(np.int64)
    close = ((b == 125) & ~in_str & ~escaped).astype(np.int64)
    lvl = np.concatenate(([0], np.cumsum(open_ - close)[:-1]))
    top = ~in_str & ~escaped & (lvl == 0)
    b[((b == 91) | (b == 93)) & top] = 32  # [ ] -> space
    b[(b == 44) & top] = ord(sep)
    return b.tobytes().decode("utf-8")


def format_forward(table: pa.Table, record_cols: list[str]) -> bytes:
    """out_forward wire payload (plugins/out_forward/forward.c flush path):
    one Forward-mode frame per tag — `[tag, [[EventTime, record], ...]]`
    with fixext8 EventTime — msgpack-encoded. The transport is out of
    scope; the dump round-trips through `[INPUT] Name forward`."""
    from ..sources.msgpack_io import msgpack_pack, pack_event_time

    n = table.num_rows
    tags = table["_tag"].to_pylist() if "_tag" in table.column_names else [""] * n
    times_ns = _times_ns(table)
    # Arrow map columns surface as list-of-tuples in to_pylist; the wire
    # format (and the reference emitter) needs msgpack MAPS
    map_cols = [
        c for c in record_cols
        if pa.types.is_map(table.schema.field(c).type)
    ]
    by_tag: dict[str, list] = {}
    for i, rec in enumerate(_row_iter(table, record_cols)):
        for c in map_cols:
            v = rec.get(c)
            if isinstance(v, list):
                rec[c] = dict(v)
        by_tag.setdefault(tags[i], []).append(
            [pack_event_time(int(times_ns[i])), rec]
        )
    out = bytearray()
    for tag, entries in by_tag.items():
        out += msgpack_pack([tag, entries])
    return bytes(out)


def format_nats(table: pa.Table, record_cols: list[str]) -> bytes:
    """out_nats wire payload (plugins/out_nats/nats.c:75-215 — studied, not
    copied): per tag one NATS publish request ``PUB <tag> <len>\\r\\n`` +
    JSON body + ``\\r\\n``, where the body is the flush buffer re-encoded as
    ``[[<%f time>, {"tag": <tag>, ...record}], ...]`` (msgpack_to_json:
    every record of the flush in ONE array, tag injected as the first map
    key, flb_msgpack_raw_to_json_str dialect). The TCP transport and the
    initial CONNECT handshake are out of scope; the PUB framing + body is
    the portable part."""
    n = table.num_rows
    if n == 0:
        return b""
    tags = (
        table["_tag"].to_pylist() if "_tag" in table.column_names else [""] * n
    )
    times = _times_sec(table)
    frags = _mp_key_frags(table, record_cols)
    tagfrag = pa.array(
        ['"tag":"' + flb_json_escape(t or "") + '"' for t in tags], pa.string()
    )
    body = pc.binary_join_element_wise(
        tagfrag, *frags, ", ", null_handling="skip"
    )
    heads = pa.array([f"[{t:f}, {{" for t in times], pa.string())
    elems = pc.binary_join_element_wise(heads, body, "}]", "").to_pylist()
    by_tag: dict[str, list[str]] = {}
    for tag, elem in zip(tags, elems):
        by_tag.setdefault(tag or "", []).append(elem)
    out = bytearray()
    for tag, el in by_tag.items():
        payload = ("[" + ", ".join(el) + "]").encode("utf-8")
        out += f"PUB {tag} {len(payload)}\r\n".encode("utf-8")
        out += payload
        out += b"\r\n"
    return bytes(out)


def _gmtime_strings(secs: np.ndarray, fmt: str) -> list[str]:
    """strftime(gmtime(sec)) per row, computed once per UNIQUE second."""
    import time as _time

    uniq, inv = np.unique(secs, return_inverse=True)
    rendered = [_time.strftime(fmt, _time.gmtime(int(s))) for s in uniq]
    return [rendered[i] for i in inv]


def format_kafka_rest(
    table: pa.Table,
    record_cols: list[str],
    time_key: str = "@timestamp",
    time_key_format: str = "%Y-%m-%dT%H:%M:%S",
    include_tag_key: bool = False,
    tag_key: str = "_flb-key",
    partition: Optional[int] = None,
    message_key: Optional[str] = None,
) -> str:
    """out_kafka_rest proxy body (plugins/out_kafka_rest/kafka.c:34-168 —
    studied, not copied): ONE JSON object
    ``{"records": [{("partition": p)?, ("key": k)?, "value": {<time_key>:
    "<strftime>.<nsec>Z", (<tag_key>: tag)?, ...record}}, ...]}`` per flush.
    The time string is gmtime-formatted seconds + "." + the raw tv_nsec
    count + "Z" (kafka.c:130-138 — %%PRIu64, NOT zero-padded). Record keys
    are appended blindly after the injected ones, so a record field named
    like time_key yields a duplicate JSON key — reference parity. Defaults
    match kafka.h:23-25. The HTTP POST transport is out of scope."""
    n = table.num_rows
    if n == 0:
        return '{"records":[]}'
    ns = _times_ns(table)
    secs = ns // 1_000_000_000
    nsec = ns - secs * 1_000_000_000
    timestr = _gmtime_strings(secs, time_key_format)
    frags = _mp_key_frags(table, record_cols)
    head = f'"{flb_json_escape(time_key)}":'
    tsfrag = pa.array(
        [f'{head}"{t}.{nn}Z"' for t, nn in zip(timestr, nsec)], pa.string()
    )
    if include_tag_key:
        tags = (
            table["_tag"].to_pylist()
            if "_tag" in table.column_names else [""] * n
        )
        tagname = flb_json_escape(tag_key)
        tsfrag = pc.binary_join_element_wise(
            tsfrag,
            pa.array(
                [f'"{tagname}":"{flb_json_escape(t or "")}"' for t in tags],
                pa.string(),
            ),
            ", ",
        )
    body = pc.binary_join_element_wise(
        tsfrag, *frags, ", ", null_handling="skip"
    )
    entry_head = ""
    if partition is not None:
        entry_head += f'"partition":{int(partition)}, '
    if message_key is not None:
        entry_head += f'"key":"{flb_json_escape(message_key)}", '
    entries = pc.binary_join_element_wise(
        "{" + entry_head + '"value":{', body, "}}", ""
    ).to_pylist()
    return '{"records":[' + ", ".join(entries) + "]}"


def format_td(table: pa.Table, record_cols: list[str]) -> bytes:
    """out_td import payload (plugins/out_td/td.c:40-130 — studied, not
    copied): a bare msgpack stream of maps ``{"time": <int sec>, ...record}``
    — the ``[ts, record]`` event arrays flatten into the record map with the
    integer UNIX time injected under the fixed key "time" (td.c:113-124).
    The gzip container + PUT transport live in gzip_td_payload /
    td_request_headers."""
    from ..sources.msgpack_io import msgpack_pack

    secs = (_times_ns(table) // 1_000_000_000).tolist()
    map_cols = [
        c for c in record_cols
        if pa.types.is_map(table.schema.field(c).type)
    ]
    out = bytearray()
    for i, rec in enumerate(_row_iter(table, record_cols)):
        for c in map_cols:
            v = rec.get(c)
            if isinstance(v, list):
                rec[c] = dict(v)
        out += msgpack_pack({"time": int(secs[i]), **rec})
    return bytes(out)


def gzip_td_payload(data: bytes) -> bytes:
    """td_http gzip container (plugins/out_td/td_http.c:32-130): fixed
    10-byte gzip header ``1F 8B 08 00 <mtime=0> 00 FF`` (XFL=0, OS=0xFF),
    raw deflate body (windowBits=-15, memLevel=9), CRC32 + ISIZE trailer.
    Deterministic: no mtime, no filename."""
    import struct
    import zlib

    co = zlib.compressobj(zlib.Z_DEFAULT_COMPRESSION, zlib.DEFLATED, -15, 9)
    body = co.compress(data) + co.flush()
    header = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"
    trailer = struct.pack("<II", zlib.crc32(data) & 0xFFFFFFFF,
                          len(data) & 0xFFFFFFFF)
    return header + body + trailer


def td_request_headers(api_key: str, db_name: str, db_table: str) -> dict:
    """out_td HTTP envelope (td_http.c:140-196): PUT
    ``/v3/table/import/{db}/{table}/msgpack.gz`` with ``Authorization:
    TD1 <api key>`` and ``Content-Type: application/gzip``."""
    return {
        "method": "PUT",
        "uri": f"/v3/table/import/{db_name}/{db_table}/msgpack.gz",
        "Authorization": f"TD1 {api_key}",
        "Content-Type": "application/gzip",
    }


def format_azure(
    table: pa.Table, record_cols: list[str], time_key: str = "@timestamp"
) -> str:
    """out_azure Log Analytics body (plugins/out_azure/azure.c:42-135 —
    studied, not copied): JSON array ``[{<time_key>: <%f double>, ...record},
    ...]`` — per record the double epoch time injected under time_key
    (default azure.h:28 "@timestamp") followed by the original keys,
    rendered in flb_msgpack_raw_to_json dialect. Headers/signature live in
    azure_shared_key_headers."""
    n = table.num_rows
    if n == 0:
        return "[]"
    times = _times_sec(table)
    frags = _mp_key_frags(table, record_cols)
    head = f'"{flb_json_escape(time_key)}":'
    tsfrag = pa.array([f"{head}{t:f}" for t in times], pa.string())
    body = pc.binary_join_element_wise(
        tsfrag, *frags, ", ", null_handling="skip"
    )
    entries = pc.binary_join_element_wise("{", body, "}", "").to_pylist()
    return "[" + ", ".join(entries) + "]"


def azure_shared_key_headers(
    customer_id: str,
    shared_key_b64: str,
    content_length: int,
    rfc1123date: str,
    log_type: str = "fluentbit",
) -> dict:
    """out_azure SharedKey signing (azure.c:141-232 — studied, not copied):
    string-to-hash ``POST\\n{len}\\napplication/json\\nx-ms-date:{date}\\n
    /api/logs``, HMAC-SHA256 with the base64-DECODED workspace key,
    base64-encoded digest, header ``Authorization: SharedKey {id}:{sig}``.
    Deterministic given the date — the caller supplies rfc1123date (the
    reference formats ``%a, %d %b %Y %H:%M:%S GMT``)."""
    import base64
    import hmac as _hmac

    string_to_hash = (
        f"POST\n{content_length}\napplication/json\n"
        f"x-ms-date:{rfc1123date}\n/api/logs"
    )
    digest = _hmac.new(
        base64.b64decode(shared_key_b64),
        string_to_hash.encode("utf-8"),
        hashlib.sha256,
    ).digest()
    sig = base64.b64encode(digest).decode("ascii")
    return {
        "uri": (
            f"https://{customer_id}.ods.opinsights.azure.com"
            "/api/logs?api-version=2016-04-01"
        ),
        "Log-Type": log_type,
        "Content-Type": "application/json",
        "x-ms-date": rfc1123date,
        "Authorization": f"SharedKey {customer_id}:{sig}",
    }


def format_plot(table: pa.Table, key: str) -> str:
    """out_plot (plugins/out_plot/plot.c:51-123): `timestamp value` rows of
    one numeric field, gnuplot-ready."""
    times = _times_sec(table)
    vals = table[key].to_pylist() if key in table.column_names else [None] * table.num_rows
    out = []
    for t, v in zip(times, vals):
        if v is None:
            continue
        out.append(f"{t:.6f} {v}")
    return "\n".join(out) + ("\n" if out else "")


class SinkWriteStage:
    """map_batches stage: route → per-sink filter → write → partial aggregates.

    Emits one row per (src, sink, lang, host, bucket) partial aggregate with
    records / bytes / parse_failures — the flowcounter analog
    (plugins/out_flowcounter/out_flowcounter.c:36-111) computed as in-batch
    combiners so the global groupby shuffles tiny rows.

    bytes = octet length of the raw `text` payload (the reference counts the
    msgpack record bytes; the raw line is our deterministic analog).
    """

    AGG_SCHEMA = pa.schema(
        [
            ("src", pa.string()),
            ("sink", pa.string()),
            ("lang", pa.string()),
            ("host", pa.string()),
            ("bucket", pa.int64()),  # minute bucket of event time
            ("records", pa.int64()),
            ("bytes", pa.int64()),
            ("parse_failures", pa.int64()),
        ]
    )

    def __init__(
        self,
        sinks: list[SinkSpec],
        out_dir: Optional[str],
        bucket_sec: int = 60,
        bytes_col: str = "text",
        retry=None,
        input_name: Optional[str] = None,
        pre_chain: Optional[list] = None,
    ):
        from .retry import RetryPolicy

        self.sinks = sinks
        self.out_dir = out_dir  # None = aggregate-only (no file writes)
        self.bucket_sec = bucket_sec
        self.bytes_col = bytes_col
        # set = also emit a pre-route "_input::<title>" metrics partial per
        # batch (the flb_metrics input records/bytes counters). The
        # reference sums these BEFORE flb_filter_do runs
        # (flb_input.h:570-590), so config pipelines fuse their filter
        # chains in via `pre_chain` — applied here AFTER the input partial
        # — keeping ingestion-time counting single-pass.
        self.input_name = input_name
        self.pre_chain = list(pre_chain or [])
        # bounded in-task retry for transient sink I/O errors; exhaustion
        # re-raises and Ray task retry takes over (sinks/retry.py design)
        self.retry = retry if retry is not None else RetryPolicy()
        self.router = Router([s.route() for s in sinks])
        self._greps = {
            s.name: GrepFilter(list(s.grep)) if s.grep else None for s in sinks
        }
        if out_dir:
            from ..state import storage

            for s in sinks:
                if s.writes and s.fmt != "proxy":  # proxy writes no files
                    storage.makedirs(storage.join(out_dir, s.name))

    def _record_cols(self, table: pa.Table, spec: SinkSpec) -> list[str]:
        if spec.columns:
            return [c for c in spec.columns if c in table.column_names]
        from ..stages.base import ENGINE_COLS

        return [c for c in table.column_names if c not in ENGINE_COLS]

    def __call__(self, table: pa.Table) -> pa.Table:
        parts: list[pa.Table] = []
        if self.input_name is not None:
            # input-side metrics partial (flb_input.c:177-178 "records"/
            # "bytes"): one extra PRE-FILTER row per batch riding the same
            # reduce, keyed "_input::<instance title>"
            parts.append(
                self._partial_agg(table, f"_input::{self.input_name}")
            )
        for chain in self.pre_chain:
            table = chain.apply_batch(table)
        masks = self.router.masks(table["_tag"])
        for spec in self.sinks:
            sub = table.filter(masks[spec.name])
            g = self._greps[spec.name]
            if g is not None:
                sub = g.process_batch(sub)
            if sub.num_rows == 0:
                continue
            # proxy sinks deliver via FLBPluginFlush, not files: they must
            # flush even when no out_dir is configured
            if spec.writes and (self.out_dir or spec.fmt == "proxy"):
                self._write(sub, spec)
            parts.append(self._partial_agg(sub, spec.name))
        if not parts:
            return self.AGG_SCHEMA.empty_table()
        return pa.concat_tables(parts)

    # -------------------------------------------------------------- write
    def _proxy_flush(self, sub: pa.Table, spec: SinkSpec) -> None:
        """External-plugin sink (sinks/proxy.py): pack the routed chunk
        per tag and hand it to the plugin's FLBPluginFlush. The loaded
        plugin is a per-process cache — never pickled (lazily rebuilt on
        each worker from the script path in fmt_options)."""
        from .proxy import ProxyPlugin, pack_proxy_events

        cache = getattr(self, "_proxy_cache", None)
        if cache is None:
            cache = self._proxy_cache = {}
        plugin = cache.get(spec.name)
        if plugin is None:
            props = {k: v for k, v in spec.fmt_options if k != "script"}
            plugin = cache[spec.name] = ProxyPlugin(
                spec.opt("script"), props
            )
        rc = self._record_cols(sub, spec)
        for tag, payload in pack_proxy_events(sub, rc).items():
            plugin.flush(payload, tag)

    def __getstate__(self):
        state = dict(self.__dict__)
        state.pop("_proxy_cache", None)  # loaded modules are not picklable
        return state

    def _write(self, sub: pa.Table, spec: SinkSpec) -> None:
        if spec.fmt == "proxy":
            self._proxy_flush(sub, spec)
            return
        srcs = (
            sub["_src"].to_pylist() if "_src" in sub.column_names else [None] * sub.num_rows
        )
        order = pc.sort_indices(sub, sort_keys=[("url", "ascending")]) if "url" in sub.column_names else None
        if order is not None:
            sub = sub.take(order)
            srcs = [srcs[i.as_py()] for i in order]
        by_src: dict[str, list[int]] = {}
        for i, s in enumerate(srcs):
            by_src.setdefault(s or "all", []).append(i)
        rc = self._record_cols(sub, spec)
        for src, idxs in by_src.items():
            chunk = sub.take(pa.array(idxs, pa.int64()))
            # content-addressed file name (the reference names buffer chunks
            # SHA1(content), src/flb_task.c:299-304): Ray may RE-EXECUTE a
            # producing task (lineage reconstruction / retries), so the write
            # must be idempotent — same content -> same file, overwritten
            # with identical bytes instead of duplicated
            fname = f"{src}__{_chunk_token(chunk)}"
            from ..state import storage

            path = storage.join(self.out_dir, spec.name, fname)
            if spec.fmt == "parquet":
                cols = rc + [c for c in ("_tag", "_time") if c in chunk.column_names]
                self.retry.run(
                    lambda: storage.write_parquet(
                        chunk.select(cols), path + ".parquet"),
                    token=fname,
                )
            else:
                if spec.fmt == "json":
                    payload = format_json_lines(chunk, rc)
                    ext = ".jsonl"
                elif spec.fmt == "csv":
                    payload = format_csv(chunk, rc,
                                         delimiter=spec.opt("delimiter", ","))
                    ext = ".csv"
                elif spec.fmt == "es":
                    payload = format_es_bulk(
                        chunk, rc,
                        index_prefix=spec.opt("index", "fluentbit"),
                        es_type=spec.opt("type", "flb_type"),
                        logstash=spec.opt("logstash", "on") == "on",
                        time_key=spec.opt("time_key", "@timestamp"),
                    )
                    ext = ".bulk"
                elif spec.fmt == "influxdb":
                    tk = spec.opt("tag_keys")
                    payload = format_influxdb(
                        chunk, rc,
                        seq_name=spec.opt("sequence_tag", "_seq"),
                        auto_tags=spec.opt("auto_tags", "off") == "on",
                        tag_keys=tuple(tk.split()) if tk else None,
                    )
                    ext = ".influx"
                elif spec.fmt == "kafka":
                    payload = format_kafka_json(
                        chunk, rc,
                        timestamp_key=spec.opt("timestamp_key", "@timestamp"),
                    )
                    ext = ".ndjson"
                elif spec.fmt == "http":
                    payload = format_http(
                        chunk, rc,
                        date_key=spec.opt("json_date_key", "date"),
                        date_format=spec.opt("json_date_format", "double"),
                        out_format=spec.opt("http_format", "json"),
                    )
                    ext = ".json"
                elif spec.fmt == "splunk":
                    payload = format_splunk(
                        chunk, rc,
                        send_raw=spec.opt("splunk_send_raw", "off") == "on",
                    )
                    ext = ".splunk"
                elif spec.fmt == "forward":
                    payload = format_forward(chunk, rc)
                    ext = ".msgpack"
                elif spec.fmt == "nats":
                    payload = format_nats(chunk, rc)
                    ext = ".nats"
                elif spec.fmt == "kafka_rest":
                    part = spec.opt("partition")
                    payload = format_kafka_rest(
                        chunk, rc,
                        time_key=spec.opt("time_key", "@timestamp"),
                        time_key_format=spec.opt(
                            "time_key_format", "%Y-%m-%dT%H:%M:%S"),
                        include_tag_key=spec.opt(
                            "include_tag_key", "off") == "on",
                        tag_key=spec.opt("tag_key", "_flb-key"),
                        partition=int(part) if part is not None else None,
                        message_key=spec.opt("message_key"),
                    )
                    ext = ".json"
                elif spec.fmt == "td":
                    payload = gzip_td_payload(format_td(chunk, rc))
                    ext = ".msgpack.gz"
                elif spec.fmt == "azure":
                    payload = format_azure(
                        chunk, rc,
                        time_key=spec.opt("time_key", "@timestamp"),
                    )
                    ext = ".json"
                elif spec.fmt == "plot":
                    payload = format_plot(chunk, spec.opt("key", "value"))
                    ext = ".dat"
                else:
                    payload = format_ltsv(
                        chunk, rc,
                        delimiter=spec.opt("delimiter", "\t"),
                        label_delimiter=spec.opt("label_delimiter", ":"),
                    )
                    ext = ".ltsv"
                def _write_text(p=path + ext, body=payload):
                    mode = "wb" if isinstance(body, bytes) else "w"
                    with storage.open_file(p, mode) as f:
                        f.write(body)

                self.retry.run(_write_text, token=fname)

    # ---------------------------------------------------------- aggregate
    def _partial_agg(self, sub: pa.Table, sink: str) -> pa.Table:
        n = sub.num_rows
        src = sub["_src"] if "_src" in sub.column_names else pa.nulls(n, pa.string())
        lang = sub["lang"] if "lang" in sub.column_names else pa.nulls(n, pa.string())
        host = sub["host"] if "host" in sub.column_names else pa.nulls(n, pa.string())
        if "_time" in sub.column_names:
            col = sub["_time"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if pa.types.is_integer(col.type):
                # exact int64 ns arithmetic: float rounding near a minute
                # boundary could otherwise move a record one bucket off the
                # SQL oracle's integer division
                ts = np.asarray(col.fill_null(np.iinfo(np.int64).min))
                # pre-epoch event times clamp to bucket 0: -1 is reserved
                # for NULL event time, and DuckDB's integer `//` truncates
                # toward zero while numpy floors, so negative ns would
                # otherwise bucket differently on the two sides (ADVICE r4)
                bucket = np.where(
                    ts == np.iinfo(np.int64).min,
                    -1,
                    np.maximum(ts, 0) // (self.bucket_sec * 10**9),
                ).astype("int64")
            else:
                t = col.to_numpy(zero_copy_only=False).astype("float64")
                bucket = np.where(
                    np.isnan(t) | (t == _NAT_F),
                    -1,
                    (np.maximum(t, 0.0) / 1e9 // self.bucket_sec).astype("int64"),
                ).astype("int64")
        else:
            bucket = np.full(n, -1, dtype=np.int64)
        if self.bytes_col in sub.column_names:
            nbytes = pc.binary_length(
                pc.cast(sub[self.bytes_col], pa.string())
            )
            nbytes = pc.fill_null(pc.cast(nbytes, pa.int64()), 0)
        else:
            nbytes = pa.array(np.zeros(n, dtype=np.int64))
        if "_parse_ok" in sub.column_names:
            fail = pc.cast(pc.invert(pc.fill_null(sub["_parse_ok"], False)), pa.int64())
        else:
            fail = pa.array(np.zeros(n, dtype=np.int64))

        grouped = (
            pa.table(
                {
                    "src": pc.fill_null(pc.cast(src, pa.string()), ""),
                    "lang": pc.fill_null(pc.cast(lang, pa.string()), ""),
                    "host": pc.fill_null(pc.cast(host, pa.string()), ""),
                    "bucket": pa.array(bucket),
                    "records": pa.array(np.ones(n, dtype=np.int64)),
                    "bytes": nbytes,
                    "parse_failures": fail,
                }
            )
            .group_by(["src", "lang", "host", "bucket"])
            .aggregate([("records", "sum"), ("bytes", "sum"), ("parse_failures", "sum")])
        )
        out = pa.table(
            {
                "src": grouped["src"],
                "sink": pa.array([sink] * grouped.num_rows, pa.string()),
                "lang": grouped["lang"],
                "host": grouped["host"],
                "bucket": grouped["bucket"],
                "records": grouped["records_sum"],
                "bytes": grouped["bytes_sum"],
                "parse_failures": grouped["parse_failures_sum"],
            }
        )
        return out.cast(self.AGG_SCHEMA)
