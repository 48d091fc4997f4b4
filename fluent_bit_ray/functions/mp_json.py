"""flb_msgpack_to_json-style serializer (src/flb_pack.c:354-480 — studied,
not copied): pairs and array elements join with ", " (comma-space), keys and
values with ":" (no space), floats print as C "%f" (6 decimals), strings
escape via the byte-exact flb_utils_write_str port (functions/escape.py).

This is the out_lib `format json` byte shape the reference's runtime golden
corpus (.out files) was captured in.
"""

from __future__ import annotations

from .escape import flb_json_escape


def mp_json_value(v) -> str:
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return f"{v:f}"
    if isinstance(v, str):
        return '"' + flb_json_escape(v) + '"'
    if isinstance(v, bytes):
        return '"' + flb_json_escape(v.decode("utf-8", "replace")) + '"'
    if isinstance(v, dict):
        return (
            "{"
            + ", ".join(
                f'"{flb_json_escape(str(k))}":{mp_json_value(x)}'
                for k, x in v.items()
            )
            + "}"
        )
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(mp_json_value(x) for x in v) + "]"
    return '"' + flb_json_escape(str(v)) + '"'


def mp_json_event(time_sec: float, record: dict) -> str:
    """One event in out_lib json shape: `[<%f time>, {record}]`."""
    return f"[{time_sec:f}, {mp_json_value(record)}]"
