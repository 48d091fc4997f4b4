"""Parser engine: regex / json / ltsv parsers + registry + conf loader.

Reference parity (studied, not copied):
- regex parser: src/flb_parser_regex.c:101-211 — Ruby-syntax named captures
  ``(?<name>...)`` over a line, searched (not anchored) like ``onig_search``;
  non-participating optional captures produce NO key; untyped captures are
  strings.
- json parser: src/flb_parser_json.c:28-191 — value must be a JSON object.
- time lookup: src/flb_parser.c:610-719 via functions.timeparse; the time
  field is removed from the record unless ``Time_Keep On``
  (flb_parser_regex.c:166-183 / flb_parser_json.c:161-178).
- typecast: src/flb_parser.c:750-843 via functions.typecast, applied to
  string values only.
- decoders applied after parse (src/flb_parser_decoder.c) via .decoders.
- conf loader: [PARSER] sections, src/flb_parser.c:356-527 (Name/Format/
  Regex/Time_Key/Time_Format/Time_Offset/Time_Keep/Types/Decode_Field*).
- ltsv: the reference only WRITES ltsv (out_file.c:140-168); ltsv parsing is
  an extension here (flagged in SURVEY §7.1).

Batch contract (the `map_batches` hot path): ``parse_batch(values)`` returns
a dict of equal-length columns — ``_time`` (int64 epoch-ns, NaT=int64-min),
``_parse_ok`` (bool), plus one column per output field (absent keys = None).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field as dc_field
from typing import Any, Optional, Sequence

import numpy as np
import pyarrow as pa

from ..functions.timeparse import TimeFormat, parse_time_column
from ..functions.typecast import cast_column, typecast_value
from .decoders import DecoderRule, apply_decoders, apply_decoders_columns

NAT = np.iinfo(np.int64).min


def _ruby_to_python_regex(pattern: str) -> str:
    """Convert Onigmo-style ``(?<name>`` to Python/RE2 ``(?P<name>``.

    Also strips an optional surrounding ``/.../`` (reference parsers.conf
    syslog-rfc3164 writes the pattern slash-wrapped; flb_parser.c:430-445
    strips it).
    """
    if len(pattern) > 1 and pattern[0] == "/" and pattern.rstrip().endswith("/"):
        pattern = pattern.strip()[1:-1]
    return re.sub(r"\(\?<([a-zA-Z_][a-zA-Z0-9_]*)>", r"(?P<\1>", pattern)


@dataclass
class Parser:
    name: str
    fmt: str  # regex | json | ltsv
    regex: Optional[str] = None
    time_key: str = "time"
    time_format: Optional[str] = None
    time_offset: int = 0  # seconds east of UTC
    time_keep: bool = False
    types: dict[str, str] = dc_field(default_factory=dict)
    decoders: list[DecoderRule] = dc_field(default_factory=list)
    # json/ltsv batch mode needs a declared field set for a stable Arrow
    # schema; regex derives it from the named groups.
    fields: Optional[list[str]] = None

    def __post_init__(self) -> None:
        if self.fmt not in ("regex", "json", "ltsv"):
            raise ValueError(f"unknown parser format {self.fmt!r}")
        self._re: Optional[re.Pattern] = None
        if self.fmt == "regex":
            if not self.regex:
                raise ValueError("regex parser needs a pattern")
            # Onigmo Ruby syntax: `^`/`$` are LINE anchors (multi-line
            # payloads still match their first line); Python needs re.M for
            # the same semantics
            self._re = re.compile(_ruby_to_python_regex(self.regex), re.MULTILINE)
            self.fields = [
                g for g in self._re.groupindex
            ]
        self._re2_ok: Optional[bool] = None
        self._tf = (
            TimeFormat(self.time_format, time_offset=self.time_offset)
            if self.time_format
            else None
        )

    # ------------------------------------------------------------------ row
    def parse_row(self, text: Optional[str], now_year: int = 2018) -> tuple[Optional[int], Optional[dict]]:
        """Exact row-at-a-time semantics (the test oracle's parse).

        Returns (epoch_ns | None, record | None); record None = parse failure.
        A record with an unparseable/missing time gets time None (the caller
        substitutes its injected "now", like in_tail does with wall clock).
        """
        if text is None:
            return None, None
        rec: Optional[dict] = None
        if self.fmt == "regex":
            m = self._re.search(text)
            if m is None:
                return None, None
            # non-participating captures emit EMPTY strings: onig_foreach_name
            # invokes the callback for every named group, and an unmatched
            # group's region is length 0 (src/flb_regex.c:29-58)
            rec = {k: (v if v is not None else "") for k, v in m.groupdict().items()}
        elif self.fmt == "json":
            try:
                obj = json.loads(text)
            except (ValueError, TypeError):
                return None, None
            if not isinstance(obj, dict):
                return None, None
            rec = obj
        else:  # ltsv
            rec = {}
            for part in text.split("\t"):
                if not part:
                    continue
                k, sep, v = part.partition(":")
                if not sep:
                    return None, None
                rec[k] = v

        ts: Optional[int] = None
        if self._tf is not None and self.time_key in rec:
            tv = rec[self.time_key]
            if isinstance(tv, str):
                ts = self._tf.parse(tv, now_year)
                if self.fmt == "regex":
                    # cb_results (flb_parser_regex.c:66-83) never packs the
                    # time capture once lookup ran: dropped on FAILURE
                    # (early return, even with Time_Keep On) and on success
                    # unless Time_Keep
                    if ts is None or not self.time_keep:
                        rec = {k: v for k, v in rec.items() if k != self.time_key}
                else:
                    # json (flb_parser_json.c:146-158): the record is returned
                    # UNCHANGED (time key KEPT) when lookup fails; the key is
                    # removed only on success with Time_Keep Off
                    if ts is not None and not self.time_keep:
                        rec = {k: v for k, v in rec.items() if k != self.time_key}
            # non-string time values: no lookup runs, key kept as-is
        if self.types:
            rec = {
                k: (typecast_value(v, self.types[k]) if k in self.types and isinstance(v, str) else v)
                for k, v in rec.items()
            }
        if self.decoders:
            rec = apply_decoders(self.decoders, rec)
        return ts, rec

    # ---------------------------------------------------------------- batch
    def output_fields(self) -> list[str]:
        """Stable output column order (declared fields, minus a dropped time key)."""
        if self.fields is None:
            raise ValueError(
                f"parser {self.name!r} ({self.fmt}) needs `fields` for batch mode"
            )
        fields = list(self.fields)
        # only the regex parser removes the time key unconditionally; for
        # json/ltsv the key can survive (kept for rows whose lookup failed
        # or whose value was non-string), so it stays a declared field
        if (
            self.fmt == "regex"
            and self._tf is not None
            and not self.time_keep
            and self.time_key in fields
        ):
            fields.remove(self.time_key)
        # decoders can only add keys for json-explode rules; callers relying
        # on exploded keys must declare them via `fields`.
        return fields

    def _regex_batch_python(self, values, ok, cols, idxs) -> None:
        """Reference path: one compiled Python `search` per row, scattering
        captures into `cols` at positions `idxs` (unmatched groups -> "",
        onig cb semantics — see parse_row)."""
        field_cols = [(self._re.groupindex[f], cols[f]) for f in cols]
        search = self._re.search
        for i in idxs:
            v = values[i]
            if v is None:
                continue
            m = search(v)
            if m is None:
                continue
            ok[i] = True
            g = m.group
            for gi, col in field_cols:
                gv = g(gi)
                col[i] = gv if gv is not None else ""

    def _regex_batch_arrow(self, values, ok):
        """RE2 fast path: ONE pc.extract_regex call for the whole batch
        (search semantics, named captures, "" for non-participating groups —
        verified identical to the Python engine). Two parity guards:
        patterns RE2 cannot compile fall back wholesale (returns None), and
        rows containing non-ASCII bytes re-run through the Python engine,
        because RE2's \\w/\\d/\\s/\\S classes are ASCII-only while Python's
        (and Onigmo's) are Unicode-aware."""
        import pyarrow.compute as _pc

        # the Python engine compiles with re.MULTILINE (Onigmo line-anchor
        # semantics); RE2 needs the inline (?m) flag for the same ^/$
        pattern = "(?m)" + self._re.pattern
        if self._re2_ok is None:
            try:
                _pc.extract_regex(pa.array([], pa.string()), pattern=pattern)
                self._re2_ok = True
            except pa.ArrowException:
                self._re2_ok = False
        if not self._re2_ok:
            return None
        arr = (
            values
            if isinstance(values, pa.Array)
            else pa.array(values, pa.string())
        )
        try:
            ex = _pc.extract_regex(arr, pattern=pattern)
        except pa.ArrowException:  # e.g. invalid UTF-8 slipped through
            return None
        hit = _pc.fill_null(_pc.is_valid(ex), False)
        np.copyto(ok, np.asarray(hit))
        # ex.field() reads the raw child arrays, which hold placeholder
        # values under null (no-match) parents — mask them to None. Columns
        # stay ARROW arrays end-to-end (ParserFilter merges with take);
        # nothing in the hot path materializes Python strings.
        null_s = pa.scalar(None, pa.string())
        cols = {
            f: _pc.if_else(hit, ex.field(f), null_s)
            for f in self._re.groupindex
        }
        non_ascii = _pc.fill_null(
            _pc.match_substring_regex(arr, r"[^\x00-\x7F]"), False
        )
        bad = np.flatnonzero(np.asarray(non_ascii))
        if len(bad):
            if not isinstance(values, list):
                values = arr.to_pylist()
            ok[bad] = False
            fixed = {f: [None] * len(bad) for f in cols}
            ok_bad = np.zeros(len(bad), dtype=bool)
            self._regex_batch_python(
                [values[i] for i in bad], ok_bad, fixed, range(len(bad))
            )
            ok[bad] = ok_bad
            # splice the python-engine rows back into the Arrow columns
            for f in list(cols):
                col = cols[f]
                repl = pa.array(fixed[f], pa.string())
                m = np.zeros(len(col), dtype=bool)
                m[bad] = True
                cols[f] = _pc.replace_with_mask(
                    col, pa.array(m), repl
                )
        return cols

    def parse_batch(self, values: Sequence[Optional[str]], now_year: int = 2018) -> dict[str, Any]:
        """Vectorized batch parse -> dict of columns (see module docstring).

        The regex path runs ONE Arrow RE2 extract for the batch (Python
        loop fallback for non-RE2 patterns and non-ASCII rows); time
        parsing and typecasts run columnar afterwards. This is the
        `map_batches` hot path — no per-row Python object churn beyond the
        capture lists.
        """
        n = len(values)
        ok = np.zeros(n, dtype=bool)
        if self.fmt == "regex":
            fields = list(self._re.groupindex)
            cols = self._regex_batch_arrow(values, ok)
            if cols is None:
                cols = {f: [None] * n for f in fields}
                self._regex_batch_python(values, ok, cols, range(n))
        elif self.fmt == "json":
            if self.fields is None:
                raise ValueError(
                    f"parser {self.name!r} (json) needs `fields` for batch "
                    "mode — without them every data column would be dropped"
                )
            fields = self.fields
            cols = {f: [None] * n for f in fields}
            loads = json.loads
            if isinstance(values, (pa.Array, pa.ChunkedArray)):
                # the regex path consumes Arrow natively; json decode is a
                # per-string Python loop either way, so normalize here
                values = values.to_pylist()
            for i, v in enumerate(values):
                if not v:
                    continue
                # a JSON OBJECT must start with optional whitespace + '{':
                # skip the (costly) loads attempt for everything else —
                # same accept set, since non-objects are rejected below
                c = v[0]
                if c != "{" and not (
                    c in " \t\r\n" and v.lstrip().startswith("{")
                ):
                    continue
                try:
                    obj = loads(v)
                except (ValueError, TypeError):
                    continue
                if not isinstance(obj, dict):
                    continue
                ok[i] = True
                for f in fields:
                    if f in obj:
                        cols[f][i] = obj[f]
        else:  # ltsv
            if self.fields is None:
                raise ValueError(
                    f"parser {self.name!r} (ltsv) needs `fields` for batch mode"
                )
            fields = self.fields
            cols = {f: [None] * n for f in fields}
            if isinstance(values, (pa.Array, pa.ChunkedArray)):
                values = values.to_pylist()
            for i, v in enumerate(values):
                if v is None:
                    continue
                rec: dict = {}
                bad = False
                for part in v.split("\t"):
                    if not part:
                        continue
                    k, sep, val = part.partition(":")
                    if not sep:
                        bad = True
                        break
                    rec[k] = val
                if bad:
                    continue
                ok[i] = True
                for f in fields:
                    if f in rec:
                        cols[f][i] = rec[f]

        # --- time lookup (columnar over the captured time strings)
        if self._tf is not None and self.time_key in cols:
            raw = cols[self.time_key]
            if isinstance(raw, pa.Array):
                raw = raw.to_pylist()  # one column; the lookup needs strings
                cols[self.time_key] = raw
            tcol = [v if isinstance(v, str) else None for v in raw]
            ts = parse_time_column(tcol, self._tf, now_year)
            failed = ts == NAT  # lookup failed OR value was non-string/None
            if self.fmt == "regex":
                if self.time_keep:
                    # reference drops the capture on failed lookup even with
                    # Time_Keep On (cb_results early return)
                    if failed.any():
                        cols[self.time_key] = [
                            None if failed[i] else raw[i] for i in range(n)
                        ]
                else:
                    del cols[self.time_key]
            elif not self.time_keep:
                # json/ltsv: keep the original value for rows whose lookup
                # failed or whose value was non-string; drop it (None) only
                # where lookup succeeded (mirrors the row path above)
                cols[self.time_key] = [
                    raw[i] if (failed[i] and raw[i] is not None) else None
                    for i in range(n)
                ]
        else:
            ts = np.full(n, NAT, dtype=np.int64)

        # --- decoders (columnar; escaped fast path) — need list columns
        if self.decoders:
            cols = {
                f: (c.to_pylist() if isinstance(c, pa.Array) else c)
                for f, c in cols.items()
            }
            cols = apply_decoders_columns(self.decoders, cols)

        out: dict[str, Any] = {"_time": ts, "_parse_ok": ok}
        for f, col in cols.items():
            if isinstance(col, pa.Array):
                # regex fast path: columns are Arrow strings already
                out[f] = cast_column(col, self.types[f]) if f in self.types else col
                continue
            if f in self.types:
                # Types cast applies to STRING values only (reference
                # flb_parser_typecast packs non-str values untouched); json
                # can deliver already-typed values, even mixed with strings.
                if all(v is None or isinstance(v, str) for v in col):
                    out[f] = cast_column(pa.array(col, pa.string()), self.types[f])
                else:
                    out[f] = [
                        typecast_value(v, self.types[f]) if isinstance(v, str) else v
                        for v in col
                    ]
            else:
                out[f] = col
        return out


# --------------------------------------------------------------- registry
class ParserRegistry:
    """Named-parser registry (reference flb_parser_create/get)."""

    def __init__(self) -> None:
        self._parsers: dict[str, Parser] = {}

    def add(self, parser: Parser) -> Parser:
        self._parsers[parser.name] = parser
        return parser

    def get(self, name: str) -> Parser:
        return self._parsers[name]

    def __contains__(self, name: str) -> bool:
        return name in self._parsers

    def names(self) -> list[str]:
        return list(self._parsers)

    def load_conf(self, text: str) -> list[Parser]:
        """Load [PARSER] sections in fluent-bit parsers.conf syntax."""
        added = []
        for section in _iter_sections(text):
            if section["__name__"].lower() != "parser":
                continue
            opts = section
            types = {}
            for spec in opts.get("types", "").split():
                k, _, t = spec.partition(":")
                if t:
                    types[k] = {"integer": "integer", "int": "integer"}.get(t, t)
            decoders = []
            for mode_key, mode in (("decode_field", "field"), ("decode_field_as", "field_as")):
                for line in opts.get("__multi__", {}).get(mode_key, []):
                    parts = line.split()
                    decoders.append(
                        DecoderRule(
                            mode=mode,
                            backend=parts[0],
                            field=parts[1],
                            action=parts[2] if len(parts) > 2 else None,
                        )
                    )
            offset = 0
            if "time_offset" in opts:
                raw = opts["time_offset"].strip()
                sign = -1 if raw.startswith("-") else 1
                digits = raw.lstrip("+-").replace(":", "")
                offset = sign * (int(digits[:2]) * 3600 + int(digits[2:4] or 0) * 60)
            p = Parser(
                name=opts["name"],
                fmt=opts.get("format", "regex"),
                regex=opts.get("regex"),
                time_key=opts.get("time_key", "time"),
                time_format=opts.get("time_format"),
                time_offset=offset,
                time_keep=opts.get("time_keep", "off").lower() == "on",
                types=types,
            )
            p.decoders = decoders
            added.append(self.add(p))
        return added


def _iter_sections(text: str):
    """Parse fluent-bit classic-mode INI-ish config into section dicts.

    Keys are lower-cased; repeatable keys (Decode_Field*) are collected under
    ``__multi__``. Multiple ``Time_Format`` lines keep the FIRST (the
    reference overrides to the last-parsed but its shipped configs rely on
    the first matching; we take the first and document it).
    """
    section: Optional[dict] = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("[") and line.endswith("]"):
            if section:
                yield section
            section = {"__name__": line[1:-1], "__multi__": {}}
            continue
        if section is None:
            continue
        key, _, value = line.partition(" ")
        key = key.lower()
        value = value.strip()
        if key in ("decode_field", "decode_field_as"):
            section["__multi__"].setdefault(key, []).append(value)
        elif key not in section:
            section[key] = value
    if section:
        yield section


DEFAULT_REGISTRY = ParserRegistry()

# The stock parsers a fluent-bit user expects (patterns equivalent to the
# shipped conf/parsers.conf:1-80 — apache, apache2, apache_error, nginx,
# json, docker, syslog variants).
_STOCK_CONF = r"""
[PARSER]
    Name   apache
    Format regex
    Regex  ^(?<host>[^ ]*) [^ ]* (?<user>[^ ]*) \[(?<time>[^\]]*)\] "(?<method>\S+)(?: +(?<path>[^\"]*?)(?: +\S*)?)?" (?<code>[^ ]*) (?<size>[^ ]*)(?: "(?<referer>[^\"]*)" "(?<agent>[^\"]*)")?$
    Time_Key time
    Time_Format %d/%b/%Y:%H:%M:%S %z

[PARSER]
    Name   apache_error
    Format regex
    Regex  ^\[[^ ]* (?<time>[^\]]*)\] \[(?<level>[^\]]*)\](?: \[pid (?<pid>[^\]]*)\])?( \[client (?<client>[^\]]*)\])? (?<message>.*)$

[PARSER]
    Name   nginx
    Format regex
    Regex  ^(?<remote>[^ ]*) (?<host>[^ ]*) (?<user>[^ ]*) \[(?<time>[^\]]*)\] "(?<method>\S+)(?: +(?<path>[^\"]*?)(?: +\S*)?)?" (?<code>[^ ]*) (?<size>[^ ]*)(?: "(?<referer>[^\"]*)" "(?<agent>[^\"]*)")?$
    Time_Key time
    Time_Format %d/%b/%Y:%H:%M:%S %z

[PARSER]
    Name   json
    Format json
    Time_Key time
    Time_Format %d/%b/%Y:%H:%M:%S %z

[PARSER]
    Name         docker
    Format       json
    Time_Key     time
    Time_Format  %Y-%m-%dT%H:%M:%S.%L
    Time_Keep    On
    Decode_Field_As escaped log

[PARSER]
    Name        syslog-rfc3164
    Format      regex
    Regex       /^\<(?<pri>[0-9]+)\>(?<time>[^ ]* {1,2}[^ ]* [^ ]*) (?<host>[^ ]*) (?<ident>[a-zA-Z0-9_\/\.\-]*)(?:\[(?<pid>[0-9]+)\])?(?:[^\:]*\:)? *(?<message>.*)$/
    Time_Key    time
    Time_Format %b %d %H:%M:%S
    Time_Keep   On

[PARSER]
    Name        syslog-rfc5424
    Format      regex
    Regex       ^\<(?<pri>[0-9]{1,5})\>1 (?<time>[^ ]+) (?<host>[^ ]+) (?<ident>[^ ]+) (?<pid>[-0-9]+) (?<msgid>[^ ]+) (?<extradata>(\[(.*)\]|-)) (?<message>.+)$
    Time_Key    time
    Time_Format %Y-%m-%dT%H:%M:%S.%L
    Time_Keep   On
"""
DEFAULT_REGISTRY.load_conf(_STOCK_CONF)
# docker parser needs declared fields for batch mode
DEFAULT_REGISTRY.get("docker").fields = ["log", "stream", "time"]
