"""Incremental multi-document JSON — flb_pack_json_state analog.

Reference parity (studied, not copied): src/flb_pack.c:261-322 — a buffer
may carry SEVERAL concatenated JSON maps (`{"a":1}{"b":2}` or with
whitespace between them, no newline framing required); the tokenizer
consumes complete maps one at a time and reports how many bytes were used,
leaving an incomplete trailing document pending for the next read.

Python's json.JSONDecoder.raw_decode gives exactly those semantics: parse
one document, return its end offset. `consume_json_stream` wraps it into
(records, bytes_consumed) so callers can buffer partial tails across
reads, like the reference's packer state.
"""

from __future__ import annotations

import json
from typing import Any

_DECODER = json.JSONDecoder()


def consume_json_stream(buf: str) -> tuple[list[Any], int]:
    """Parse as many complete JSON documents as `buf` contains.

    Returns (documents, bytes_consumed): an incomplete or invalid tail is
    NOT consumed (the caller keeps it buffered — FLB_ERR_JSON_PART analog;
    a tail that can never parse is the caller's FLB_ERR_JSON_INVAL to
    drop). Documents of any JSON type are returned; map-only filtering is
    the caller's policy (flb_pack_json rejects non-map roots at the
    packing layer, not the tokenizer).
    """
    docs: list[Any] = []
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-document whitespace
        while pos < n and buf[pos] in " \t\r\n":
            pos += 1
        if pos >= n:
            break
        try:
            obj, end = _DECODER.raw_decode(buf, pos)
        except ValueError:
            break  # incomplete/invalid tail stays unconsumed
        docs.append(obj)
        pos = end
    return docs, pos


def concat_json_records(buf: str) -> list[dict]:
    """All complete JSON MAPS in the buffer (non-map documents skipped,
    like flb_pack_json's map-only contract)."""
    docs, _ = consume_json_stream(buf)
    return [d for d in docs if isinstance(d, dict)]
