"""Parser field decoders — `Decode_Field` / `Decode_Field_As` rule engine.

Reference parity (studied, not copied): src/flb_parser_decoder.c:364-689 —
- ``Decode_Field_As <backend> <key> [action]`` replaces the value of ``key``
  in place (string for escaped/escaped_utf8; a nested map for json).
- ``Decode_Field json <key> [action]`` decodes the value as JSON and appends
  the decoded map's keys at the END of the record (the original field keeps
  its original value). A string result for Decode_Field is an error and is
  dropped (reference :651-653).
- Rules for one key run in config order. Actions: ``try_next`` retries the
  next rule on failure; ``do_next`` continues to the next rule on success,
  feeding it the decoded value; default stops after the first terminal rule.
- Only one successful Decode_Field and one Decode_Field_As per key.
- json decode first UNESCAPES the value (reference decode_json:232-243) and
  requires the result to be a JSON object.

Divergence: duplicate keys can't exist in a Python dict; a decoded extra key
that already exists overwrites the earlier value in place (msgpack maps would
carry both, with consumers seeing the last).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Optional

from ..functions.escape import unescape_string, unescape_string_utf8

_BACKENDS = ("json", "escaped", "escaped_utf8")
_ACTIONS = (None, "try_next", "do_next")


@dataclass(frozen=True)
class DecoderRule:
    mode: str  # "field" (Decode_Field) | "field_as" (Decode_Field_As)
    backend: str  # json | escaped | escaped_utf8
    field: str
    action: Optional[str] = None  # None | try_next | do_next

    def __post_init__(self) -> None:
        if self.backend not in _BACKENDS:
            raise ValueError(f"unknown decoder backend {self.backend!r}")
        if self.action not in _ACTIONS:
            raise ValueError(f"unknown decoder action {self.action!r}")
        if self.mode not in ("field", "field_as"):
            raise ValueError(f"unknown decoder mode {self.mode!r}")


def _decode(backend: str, value: str) -> tuple[Optional[Any], str]:
    """Run one backend. Returns (result | None, out_type)."""
    if backend == "escaped":
        return unescape_string(value), "string"
    if backend == "escaped_utf8":
        return unescape_string_utf8(value), "string"
    # json: unescape first, then must parse to an object
    unescaped = unescape_string(value)
    stripped = unescaped.lstrip()
    if not stripped.startswith("{"):
        return None, "object"
    try:
        obj = json.loads(unescaped)
    except (ValueError, TypeError):
        return None, "object"
    if not isinstance(obj, dict):
        return None, "object"
    return obj, "object"


def apply_decoders(rules: list[DecoderRule], record: dict) -> dict:
    """Row-level decoder application (oracle twin of the column path).

    ``record`` values are only decoded when they are strings (reference
    :468-471 packs non-str values untouched).
    """
    fields_with_rules = {r.field for r in rules}
    if not fields_with_rules.intersection(record):
        return record

    out: dict = {}
    extra: dict = {}
    for key, value in record.items():
        if key not in fields_with_rules or not isinstance(value, str):
            out[key] = value
            continue

        data = value  # chained input (data_sds)
        replaced: Optional[Any] = None
        replaced_type = "string"
        is_decoded = False
        is_decoded_as = False
        for rule in (r for r in rules if r.field == key):
            if rule.mode == "field" and rule.action == "do_next" and is_decoded:
                continue
            if is_decoded_as and replaced_type != "string":
                continue
            result, out_type = _decode(rule.backend, data)
            if result is None:
                if rule.action in ("try_next", "do_next"):
                    continue
                break
            if rule.mode == "field_as":
                replaced = result
                replaced_type = out_type
                is_decoded_as = True
                if out_type == "string":
                    data = result
            else:  # Decode_Field
                if out_type == "object":
                    extra.update(result)
                    is_decoded = True
                # string result for Decode_Field is an error -> ignored
            if rule.action == "do_next":
                continue
            break

        out[key] = replaced if is_decoded_as else value

    # extra keys appended at the end (reference merge_record_and_extra_keys)
    for k, v in extra.items():
        out[k] = v
    return out


def apply_decoders_columns(rules: list[DecoderRule], columns: dict[str, list]) -> dict[str, list]:
    """Column-wise decoder application used inside `map_batches`.

    Fast path: pure string decoders (`escaped`/`escaped_utf8` Decode_Field_As)
    map a column through the unescape kernel, skipping rows without a
    backslash. Anything involving json-explode falls back to row assembly for
    the affected rows only.
    """
    simple = all(
        r.mode == "field_as" and r.backend in ("escaped", "escaped_utf8")
        for r in rules
    )
    if simple:
        for rule in rules:
            col = columns.get(rule.field)
            if col is None:
                continue
            fn = unescape_string if rule.backend == "escaped" else unescape_string_utf8
            columns[rule.field] = [
                fn(v) if isinstance(v, str) and "\\" in v else v for v in col
            ]
        return columns

    # general path: assemble rows for fields under decode, then re-split
    if not columns:
        return columns
    n = max(len(c) for c in columns.values())
    keys = list(columns)
    rows = [
        apply_decoders(rules, {k: columns[k][i] for k in keys}) for i in range(n)
    ]
    out_keys: list[str] = list(keys)
    for r in rows:
        for k in r:
            if k not in out_keys:
                out_keys.append(k)
    return {k: [r.get(k) for r in rows] for k in out_keys}
